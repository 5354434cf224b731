package graft.ts

import scala.collection.mutable.ArrayBuffer

/** R2 — PSI section reassembly (SURVEY §2.5): per-PID, order-sensitive
  * accumulation of packet payloads into complete sections, honoring PUSI +
  * pointer_field (mid-packet section splits), multi-section payloads,
  * 0xFF stuffing, the 4096-byte cap, and CRC verification. Semantics per
  * ISO 13818-1 §2.4.4.1/2 as implemented by `psi_dec.c:238-499`.
  *
  * The core is a pure fold `(State, TsPacket) → (State, emitted)` so the
  * exact same logic runs in batch (`flatMapGroups` over a seq-sorted
  * group) and in Structured Streaming (`flatMapGroupsWithState`).
  */
object SectionAssembler {

  /** Per-PID reassembly buffer. `synced=false` until the first PUSI —
    * payload before a section start can't be framed. */
  case class State(
      buf: Array[Byte], synced: Boolean, firstSeq: Long) {
    def isEmpty: Boolean = buf.isEmpty
  }
  val initialState: State = State(Array.emptyByteArray, synced = false, -1L)

  /** Feed one packet; returns the new state and any completed sections.
    * Packets must arrive in `seq` order per PID. */
  def step(state: State, pkt: TsPacket): (State, Seq[PsiSection]) = {
    // F3: no payload / null PID packets don't advance section state
    if (!pkt.hasPayload || pkt.pid == TsCodec.NullPid ||
      pkt.payload.isEmpty)
      return (state, Nil)
    val out = ArrayBuffer.empty[PsiSection]
    var st = state
    val pay = pkt.payload
    if (pkt.pusi) {
      val ptr = pay(0) & 0xFF
      if (1 + ptr > pay.length) return (st, Nil) // bogus pointer, resync
      // bytes before the pointer close the in-flight section
      if (st.synced && ptr > 0) {
        val closed = st.buf ++ java.util.Arrays.copyOfRange(pay, 1, 1 + ptr)
        emitComplete(closed, pkt.pid, st.firstSeq, out)
      }
      val rest = java.util.Arrays.copyOfRange(pay, 1 + ptr, pay.length)
      val remainder = emitComplete(rest, pkt.pid, pkt.seq, out)
      st = State(remainder, synced = true, pkt.seq)
    } else if (st.synced) {
      val grown = st.buf ++ pay
      if (grown.length > PsiCodec.MaxSectionLen + 3 + 188) {
        // runaway buffer (corrupt length): drop and wait for next PUSI
        st = initialState
      } else {
        val remainder = emitComplete(grown, pkt.pid,
          if (st.isEmpty) pkt.seq else st.firstSeq, out)
        st = State(remainder,
          synced = true,
          if (st.isEmpty) pkt.seq else st.firstSeq)
      }
    }
    (st, out.toSeq)
  }

  /** Emit every complete section at the head of `buf`; stop at stuffing
    * (0xFF table_id ⇒ rest of payload is padding, `psi_dec.c:444-474`).
    * Returns the unconsumed tail. */
  private def emitComplete(buf0: Array[Byte], pid: Int, firstSeq: Long,
      out: ArrayBuffer[PsiSection]): Array[Byte] = {
    var buf = buf0
    var continue = true
    while (continue && buf.length >= 3) {
      if ((buf(0) & 0xFF) == 0xFF) { // stuffing: discard remainder
        buf = Array.emptyByteArray
        continue = false
      } else {
        val secLen = ((buf(1) & 0x0F) << 8) | (buf(2) & 0xFF)
        if (buf.length >= secLen + 3) {
          PsiCodec.decodeSection(pid, firstSeq, buf).foreach(out += _)
          buf = java.util.Arrays.copyOfRange(buf, secLen + 3, buf.length)
        } else continue = false
      }
    }
    buf
  }

  /** Run a seq-ordered packet iterator through the assembler. */
  def assemble(pid: Int, packets: Iterator[TsPacket])
      : Iterator[PsiSection] = {
    var st = initialState
    packets.flatMap { p =>
      val (next, emitted) = step(st, p)
      st = next
      emitted
    }
  }
}
