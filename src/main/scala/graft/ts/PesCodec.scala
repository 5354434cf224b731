package graft.ts

/** PES packet-header decode (ISO/IEC 13818-1 §2.4.3.6-7) — the
  * elementary-stream layer under the reference's program processor
  * (`app_prog_proc.c` ES pipeline; `time_stamp_stats` surface in
  * `assets/html/js/es_proc.js:87-108`). PTS/DTS are 33-bit 90 kHz values
  * packed as 5 bytes with marker bits.
  */
object PesCodec {

  case class PesHeader(
      streamId: Int,
      pesPacketLength: Int,
      pts: Option[Long], // 90 kHz ticks
      dts: Option[Long],
      headerDataLength: Int)

  /** Parse a PES header at the start of a PUSI packet's payload; None if
    * the payload doesn't begin with the 00 00 01 start code. */
  def parseHeader(pay: Array[Byte]): Option[PesHeader] = {
    if (pay.length < 9 ||
      pay(0) != 0 || pay(1) != 0 || pay(2) != 1) return None
    val streamId = pay(3) & 0xFF
    val pesLen = ((pay(4) & 0xFF) << 8) | (pay(5) & 0xFF)
    val flags = pay(7) & 0xFF
    val hdrLen = pay(8) & 0xFF
    var pts: Option[Long] = None
    var dts: Option[Long] = None
    if ((flags & 0x80) != 0 && pay.length >= 14)
      pts = Some(read33(pay, 9))
    if ((flags & 0xC0) == 0xC0 && pay.length >= 19)
      dts = Some(read33(pay, 14))
    Some(PesHeader(streamId, pesLen, pts, dts, hdrLen))
  }

  /** 5-byte marker-bit packing: 0010|PTS32..30|1 PTS29..22 PTS21..15|1
    * PTS14..7 PTS6..0|1. */
  private def read33(b: Array[Byte], p: Int): Long =
    (((b(p) >> 1) & 0x7L) << 30) |
      ((b(p + 1) & 0xFFL) << 22) |
      (((b(p + 2) & 0xFFL) >> 1) << 15) |
      ((b(p + 3) & 0xFFL) << 7) |
      ((b(p + 4) & 0xFFL) >> 1)

  /** Inverse: write a 33-bit value with marker bits; `prefix` is the
    * 4-bit code (0b0010 PTS-only, 0b0011 PTS-of-pair, 0b0001 DTS). */
  def write33(v: Long, prefix: Int): Array[Byte] = Array(
    (((prefix & 0xF) << 4) | (((v >> 30) & 0x7L) << 1) | 1L).toByte,
    ((v >> 22) & 0xFF).toByte,
    ((((v >> 15) & 0x7F) << 1) | 1).toByte,
    ((v >> 7) & 0xFF).toByte,
    ((((v & 0x7F) << 1) | 1) & 0xFF).toByte)
}
