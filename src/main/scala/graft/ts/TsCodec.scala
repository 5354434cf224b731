package graft.ts

/** Byte-level TS packet decode/encode (SURVEY §2.3 P1–P3, §2.11 E1–E5).
  * Layouts per ISO/IEC 13818-1 §2.4.3 as implemented by the reference
  * (`ts_dec.c:257-419` decode, `ts_enc.c:41-159` encode) — re-implemented
  * from the spec, not translated.
  */
object TsCodec {
  val PacketSize = 188
  val SyncByte: Byte = 0x47
  val MaxPid = 0x1FFF
  val NullPid = 0x1FFF

  /** Decode one 188-byte packet. Returns None on hard framing errors
    * (wrong size / sync) — the packet-sanity filter F1
    * (`mpeg2_sp.c:1369-1382`) drops those rows upstream. */
  def decode(buf: Array[Byte], seq: Long): Option[TsPacket] = {
    if (buf.length != PacketSize || buf(0) != SyncByte) return None
    val b1 = buf(1) & 0xFF
    val b3 = buf(3) & 0xFF
    val pid = ((b1 & 0x1F) << 8) | (buf(2) & 0xFF)
    val hasAf = (b3 & 0x20) != 0
    val hasPayload = (b3 & 0x10) != 0
    var off = 4
    var af: Option[AdaptationField] = None
    if (hasAf) {
      val afLen = buf(4) & 0xFF
      if (5 + afLen > PacketSize) return None // AF length compliance
      af = Some(decodeAf(buf, 5, afLen))
      off = 5 + afLen
    }
    val payload =
      if (hasPayload && off < PacketSize)
        java.util.Arrays.copyOfRange(buf, off, PacketSize)
      else Array.emptyByteArray
    Some(TsPacket(
      seq = seq,
      pid = pid,
      tei = (b1 & 0x80) != 0,
      pusi = (b1 & 0x40) != 0,
      priority = (b1 & 0x20) != 0,
      scrambling = (b3 >> 6) & 0x3,
      hasAf = hasAf,
      hasPayload = hasPayload,
      cc = b3 & 0x0F,
      af = af,
      payload = payload))
  }

  /** Adaptation-field decode (`ts_dec.c:183-255`): flags + optional
    * PCR/OPCR (33-bit base ×300 + 9-bit ext) + splice countdown; the
    * rest is kept opaque. */
  private def decodeAf(buf: Array[Byte], start: Int, afLen: Int)
      : AdaptationField = {
    if (afLen == 0)
      return AdaptationField(0, discontinuity = false, randomAccess = false,
        esPriority = false, None, None, None, privateData = false,
        extension = false, Array.emptyByteArray)
    val flags = buf(start) & 0xFF
    var p = start + 1
    val end = start + afLen
    var pcr: Option[Long] = None
    var opcr: Option[Long] = None
    var splice: Option[Int] = None
    if ((flags & 0x10) != 0 && p + 6 <= end) { // PCR_flag
      pcr = Some(readPcr(buf, p)); p += 6
    }
    if ((flags & 0x08) != 0 && p + 6 <= end) { // OPCR_flag
      opcr = Some(readPcr(buf, p)); p += 6
    }
    if ((flags & 0x04) != 0 && p + 1 <= end) { // splicing_point_flag
      splice = Some(buf(p).toInt); p += 1
    }
    val rem =
      if (p < end) java.util.Arrays.copyOfRange(buf, p, end)
      else Array.emptyByteArray
    AdaptationField(afLen,
      discontinuity = (flags & 0x80) != 0,
      randomAccess = (flags & 0x40) != 0,
      esPriority = (flags & 0x20) != 0,
      pcr = pcr, opcr = opcr, spliceCountdown = splice,
      privateData = (flags & 0x02) != 0,
      extension = (flags & 0x01) != 0,
      remainder = rem)
  }

  /** 48 bits → base(33) ‖ reserved(6) ‖ ext(9); value = base*300+ext
    * (27 MHz ticks, `ts_dec.h:38-57`). */
  private def readPcr(b: Array[Byte], p: Int): Long = {
    val base =
      ((b(p) & 0xFFL) << 25) | ((b(p + 1) & 0xFFL) << 17) |
        ((b(p + 2) & 0xFFL) << 9) | ((b(p + 3) & 0xFFL) << 1) |
        ((b(p + 4) & 0xFF) >>> 7)
    val ext = ((b(p + 4) & 0x01L) << 8) | (b(p + 5) & 0xFFL)
    base * 300L + ext
  }

  private def writePcr(b: Array[Byte], p: Int, pcr: Long): Unit = {
    val base = pcr / 300L
    val ext = pcr % 300L
    b(p) = ((base >>> 25) & 0xFF).toByte
    b(p + 1) = ((base >>> 17) & 0xFF).toByte
    b(p + 2) = ((base >>> 9) & 0xFF).toByte
    b(p + 3) = ((base >>> 1) & 0xFF).toByte
    b(p + 4) = ((((base & 1L) << 7) | 0x7E | (ext >>> 8)) & 0xFF).toByte
    b(p + 5) = (ext & 0xFF).toByte
  }

  /** E1: struct → 188-byte buffer. AF is re-laid-out from the decoded
    * fields (inverse of decode); payload is stuffed as-is and must fit. */
  def encode(pkt: TsPacket): Array[Byte] = {
    val out = new Array[Byte](PacketSize)
    out(0) = SyncByte
    out(1) = (((if (pkt.tei) 0x80 else 0) | (if (pkt.pusi) 0x40 else 0) |
      (if (pkt.priority) 0x20 else 0) | ((pkt.pid >> 8) & 0x1F)) & 0xFF)
      .toByte
    out(2) = (pkt.pid & 0xFF).toByte
    out(3) = (((pkt.scrambling & 0x3) << 6) |
      (if (pkt.hasAf) 0x20 else 0) | (if (pkt.hasPayload) 0x10 else 0) |
      (pkt.cc & 0x0F)).toByte
    var off = 4
    pkt.af.foreach { af =>
      out(4) = (af.length & 0xFF).toByte
      if (af.length > 0) {
        var flags = 0
        if (af.discontinuity) flags |= 0x80
        if (af.randomAccess) flags |= 0x40
        if (af.esPriority) flags |= 0x20
        if (af.pcr.isDefined) flags |= 0x10
        if (af.opcr.isDefined) flags |= 0x08
        if (af.spliceCountdown.isDefined) flags |= 0x04
        if (af.privateData) flags |= 0x02
        if (af.extension) flags |= 0x01
        out(5) = flags.toByte
        var p = 6
        af.pcr.foreach { v => writePcr(out, p, v); p += 6 }
        af.opcr.foreach { v => writePcr(out, p, v); p += 6 }
        af.spliceCountdown.foreach { v => out(p) = v.toByte; p += 1 }
        System.arraycopy(af.remainder, 0, out, p, af.remainder.length)
        p += af.remainder.length
        // stuff the declared AF length with 0xFF
        while (p < 5 + af.length) { out(p) = 0xFF.toByte; p += 1 }
      }
      off = 5 + af.length
    }
    if (pkt.hasPayload) {
      val n = math.min(pkt.payload.length, PacketSize - off)
      System.arraycopy(pkt.payload, 0, out, off, n)
      var p = off + n
      while (p < PacketSize) { out(p) = 0xFF.toByte; p += 1 }
    } else {
      var p = off
      while (p < PacketSize) { out(p) = 0xFF.toByte; p += 1 }
    }
    out
  }

  /** E2: AF-only packet carrying just a PCR, stuffed to 188 B
    * (`ts_enc.c:161-221`). */
  def encodePcrOnly(pid: Int, cc: Int, pcr: Long): Array[Byte] = {
    val afLen = PacketSize - 5 // fill the whole packet
    val af = AdaptationField(afLen, discontinuity = false,
      randomAccess = false, esPriority = false, pcr = Some(pcr), None, None,
      privateData = false, extension = false, Array.emptyByteArray)
    encode(TsPacket(0L, pid, tei = false, pusi = false, priority = false,
      scrambling = 0, hasAf = true, hasPayload = false, cc = cc,
      af = Some(af), payload = Array.emptyByteArray))
  }

  /** E3: null stuffing packet. */
  def encodeStuffing(cc: Int): Array[Byte] =
    encode(TsPacket(0L, NullPid, tei = false, pusi = false,
      priority = false, scrambling = 0, hasAf = false, hasPayload = true,
      cc = cc, af = None,
      payload = Array.fill[Byte](PacketSize - 4)(0xFF.toByte)))

  /** E4: in-place PCR restamp of an encoded packet (`ts_enc.c:274-301`). */
  def restampPcr(pkt: Array[Byte], pcr: Long): Array[Byte] = {
    val out = pkt.clone()
    val hasAf = (out(3) & 0x20) != 0
    require(hasAf && (out(4) & 0xFF) > 0 && (out(5) & 0x10) != 0,
      "packet carries no PCR")
    writePcr(out, 6, pcr)
    out
  }
}
