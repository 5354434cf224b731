package graft.ts

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Crc32Mpeg2

class TsCodecSpec extends AnyFunSuite {

  /** Minimal deterministic property runner (scalatestplus bridge isn't on
    * the classpath; Gen sampling with a fixed seed is enough here). */
  private def forAll[A](gen: Gen[A], n: Int = 100)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .foreach(a => body(a))
    }

  test("crc32/mpeg2 matches known vectors") {
    // catalogue check value: crc("123456789") = 0x0376E6E7
    assert(Crc32Mpeg2.compute("123456789".getBytes("ASCII")) == 0x0376E6E7L)
    // a stamped section verifies to residue 0
    val sec = PsiCodec.encodePat(Seq(PatRow(1, 66)), tsId = 7, version = 3)
    assert(Crc32Mpeg2.check(sec))
  }

  val genAf: Gen[AdaptationField] = for {
    pcr <- Gen.option(Gen.choose(0L, (1L << 33) * 300 - 1))
    opcr <- Gen.option(Gen.choose(0L, (1L << 33) * 300 - 1))
    splice <- Gen.option(Gen.choose(-128, 127))
    disc <- Gen.oneOf(true, false)
    ra <- Gen.oneOf(true, false)
    remLen <- Gen.choose(0, 20)
    rem <- Gen.listOfN(remLen, Gen.choose(0, 255).map(_.toByte))
  } yield {
    val contentLen = 1 + pcr.fold(0)(_ => 6) + opcr.fold(0)(_ => 6) +
      splice.fold(0)(_ => 1) + rem.length
    AdaptationField(contentLen, disc, ra, esPriority = false, pcr, opcr,
      splice.map(_.toInt), privateData = false, extension = false,
      rem.toArray)
  }

  val genPacket: Gen[TsPacket] = for {
    pid <- Gen.choose(0, 0x1FFE)
    pusi <- Gen.oneOf(true, false)
    cc <- Gen.choose(0, 15)
    scram <- Gen.oneOf(0, 2, 3)
    af <- Gen.option(genAf)
    payLen <- Gen.choose(1, 184 - af.fold(0)(_.length + 1))
    pay <- Gen.listOfN(payLen, Gen.choose(0, 255).map(_.toByte))
  } yield TsPacket(0L, pid, tei = false, pusi = pusi, priority = false,
    scrambling = scram, hasAf = af.isDefined, hasPayload = true, cc = cc,
    af = af, payload = pay.toArray)

  test("TS packet encode→decode round-trips header and AF fields") {
    forAll(genPacket) { pkt =>
      val bytes = TsCodec.encode(pkt)
      assert(bytes.length == 188)
      val dec = TsCodec.decode(bytes, 0L).get
      assert(dec.pid == pkt.pid)
      assert(dec.pusi == pkt.pusi)
      assert(dec.cc == pkt.cc)
      assert(dec.scrambling == pkt.scrambling)
      assert(dec.hasAf == pkt.hasAf)
      assert(dec.af.flatMap(_.pcr) == pkt.af.flatMap(_.pcr))
      assert(dec.af.flatMap(_.opcr) == pkt.af.flatMap(_.opcr))
      assert(dec.af.flatMap(_.spliceCountdown) ==
        pkt.af.flatMap(_.spliceCountdown))
      assert(dec.af.map(_.discontinuity) == pkt.af.map(_.discontinuity))
      // payload round-trips up to 0xFF stuffing
      assert(dec.payload.take(pkt.payload.length)
        .sameElements(pkt.payload))
    }
  }

  test("PCR-only and stuffing builders are framed correctly") {
    val pcrPkt = TsCodec.decode(TsCodec.encodePcrOnly(69, 5, 123456789L), 0L)
      .get
    assert(pcrPkt.af.get.pcr.contains(123456789L))
    assert(!pcrPkt.hasPayload)
    val restamped = TsCodec.decode(
      TsCodec.restampPcr(TsCodec.encodePcrOnly(69, 5, 1L), 987654321L), 0L)
      .get
    assert(restamped.af.get.pcr.contains(987654321L))
    val stuff = TsCodec.decode(TsCodec.encodeStuffing(0), 0L).get
    assert(stuff.pid == TsCodec.NullPid)
  }

  test("PAT encode→decode round-trips") {
    forAll(Gen.listOfN(5,
      Gen.zip(Gen.choose(0, 65535), Gen.choose(16, 0x1FFE)))) { rows =>
      val pat = rows.map { case (pn, pid) => PatRow(pn, pid) }
      val sec = PsiCodec.decodeSection(0, 0L,
        PsiCodec.encodePat(pat, tsId = 1, version = 9)).get
      assert(sec.crcOk && sec.tableId == 0)
      assert(sec.versionNumber == 9)
      assert(PsiCodec.decodePat(sec) == pat)
    }
  }

  test("PMT with descriptors encode→decode round-trips") {
    val pmt = PmtProgram(
      programNumber = 1,
      pcrPid = 69,
      programDescriptors = Nil,
      es = Seq(
        EsEntry(0x1B, 69, Nil),
        EsEntry(0x06, 70, Seq(Descriptor(0x59, Array.emptyByteArray, None,
          None, None, Some(Seq(SubtitlingEntry("eng", 0x10, 1, 2)))))),
        EsEntry(0x81, 68, Seq(Descriptor(0x0A,
          Array[Byte]('e', 'n', 'g', 0), None, None, None, None)))))
    val sec = PsiCodec.decodeSection(66, 0L,
      PsiCodec.encodePmt(pmt, version = 27)).get
    assert(sec.crcOk && sec.tableId == 2 && sec.versionNumber == 27)
    val dec = PsiCodec.decodePmt(sec).get
    assert(dec.programNumber == 1 && dec.pcrPid == 69)
    assert(dec.es.map(e => (e.streamType, e.elementaryPid)) ==
      Seq((0x1B, 69), (0x06, 70), (0x81, 68)))
    val sub = dec.es(1).descriptors.head
    assert(sub.subtitling.get ==
      Seq(SubtitlingEntry("eng", 0x10, 1, 2)))
    // unknown descriptor stays opaque
    assert(dec.es(2).descriptors.head.body
      .sameElements(Array[Byte]('e', 'n', 'g', 0)))
  }

  test("service descriptor 0x48 and SDT body round-trip") {
    val desc = Descriptor(0x48, Array.emptyByteArray, Some(1),
      Some("GraftProv"), Some("Graft TV"), None)
    val bytes = PsiCodec.encodeDescriptors(Seq(desc))
    val dec = PsiCodec.decodeDescriptors(bytes, 0, bytes.length).head
    assert(dec.serviceType.contains(1))
    assert(dec.serviceProvider.contains("GraftProv"))
    assert(dec.serviceName.contains("Graft TV"))
  }

  test("section assembler handles mid-packet splits and multi-section payloads") {
    // two sections packed back-to-back across packets with a pointer split
    val s1 = PsiCodec.encodePat(Seq(PatRow(1, 66), PatRow(2, 67)), 1, 1)
    val s2 = PsiCodec.encodePat(Seq(PatRow(3, 68)), 1, 2)
    val stream = s1 ++ s2
    // packetize at 20-byte payload chunks: first packet PUSI ptr=0,
    // subsequent continuation packets
    val chunks = stream.grouped(20).toArray
    val pkts = chunks.zipWithIndex.map { case (chunk, i) =>
      val payload =
        if (i == 0) Array[Byte](0) ++ chunk else chunk
      TsPacket(i.toLong, 0, tei = false, pusi = i == 0, priority = false,
        scrambling = 0, hasAf = false, hasPayload = true, cc = i % 16,
        af = None, payload = payload)
    }
    val sections = SectionAssembler.assemble(0, pkts.iterator).toList
    assert(sections.length == 2)
    assert(sections.map(_.versionNumber) == List(1, 2))
    assert(sections.forall(_.crcOk))
    assert(PsiCodec.decodePat(sections.head) ==
      Seq(PatRow(1, 66), PatRow(2, 67)))

    // pointer-field split: tail of s1 + start of s2 in one PUSI packet
    val cut = s1.length - 7
    val p0 = TsPacket(0, 0, tei = false, pusi = true, priority = false,
      scrambling = 0, hasAf = false, hasPayload = true, cc = 0, af = None,
      payload = Array[Byte](0) ++ s1.take(cut))
    val p1 = TsPacket(1, 0, tei = false, pusi = true, priority = false,
      scrambling = 0, hasAf = false, hasPayload = true, cc = 1, af = None,
      payload = Array[Byte]((s1.length - cut).toByte) ++
        s1.drop(cut) ++ s2)
    val secs2 = SectionAssembler.assemble(0, Iterator(p0, p1)).toList
    assert(secs2.length == 2)
    assert(secs2.forall(_.crcOk))
    assert(PsiCodec.decodePat(secs2(1)) == Seq(PatRow(3, 68)))
  }

  test("assembler discards unsynced payload and recovers on next PUSI") {
    val s1 = PsiCodec.encodePat(Seq(PatRow(1, 66)), 1, 1)
    val junk = TsPacket(0, 0, tei = false, pusi = false, priority = false,
      scrambling = 0, hasAf = false, hasPayload = true, cc = 0, af = None,
      payload = Array.fill[Byte](20)(0x55))
    val good = TsPacket(1, 0, tei = false, pusi = true, priority = false,
      scrambling = 0, hasAf = false, hasPayload = true, cc = 1, af = None,
      payload = Array[Byte](0) ++ s1 ++
        Array.fill[Byte](10)(0xFF.toByte))
    val secs = SectionAssembler.assemble(0, Iterator(junk, good)).toList
    assert(secs.length == 1 && secs.head.crcOk)
  }
}
