package graft.ts

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the hardest operator (SURVEY §7 hard part #1):
  * random section sets, tightly muxed with pointer_field mid-packet
  * splits, must reassemble byte-identically — including with garbage
  * continuation packets prepended (pre-sync payload must be dropped). */
class AssemblerPropertySpec extends org.scalatest.funsuite.AnyFunSuite {

  private def sample[A](gen: Gen[A], n: Int = 100)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val genSection: Gen[Array[Byte]] = for {
    tableId <- Gen.choose(0, 0xFE) // 0xFF is stuffing
    ext <- Gen.choose(0, 0xFFFF)
    version <- Gen.choose(0, 31)
    secNum <- Gen.choose(0, 3)
    body <- Gen.choose(0, 900)
      .flatMap(n => Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)))
  } yield PsiCodec.encodeSection(tableId, ext, version,
    currentNext = true, secNum, lastSectionNumber = 3, body.toArray)

  private val genStream: Gen[(Seq[Array[Byte]], Int, Int)] = for {
    nSecs <- Gen.choose(1, 6)
    secs <- Gen.listOfN(nSecs, genSection)
    pid <- Gen.choose(16, 0x1FFE)
    cc <- Gen.choose(0, 15)
  } yield (secs.toSeq, pid, cc)

  test("mux → assemble round-trips random section sets byte-identically") {
    sample(genStream) { case (secs, pid, cc) =>
      val pkts = Fixtures.muxSections(pid, secs, seqStart = 0L, cc)
      val got = SectionAssembler.assemble(pid, pkts.iterator).toSeq
      assert(got.length == secs.length,
        s"pid=$pid cc=$cc: got ${got.length} of ${secs.length} sections")
      assert(got.map(_.bytes.toSeq) == secs.map(_.toSeq))
      assert(got.forall(_.crcOk))
    }
  }

  test("pre-sync garbage continuation packets are dropped, not framed") {
    sample(genStream, n = 50) { case (secs, pid, cc) =>
      // continuation packets full of junk BEFORE the first PUSI: an
      // unsynced decoder must discard them (`psi_dec.c:284-293`)
      val junk = (0 until 3).map { i =>
        TsPacket(i.toLong, pid, tei = false, pusi = false,
          priority = false, scrambling = 0, hasAf = false,
          hasPayload = true, cc = (cc + 13 + i) & 0xF, af = None,
          payload = Array.fill[Byte](184)(0x55))
      }
      val pkts = Fixtures.muxSections(pid, secs, seqStart = 10L, cc)
      val got = SectionAssembler
        .assemble(pid, (junk ++ pkts).iterator).toSeq
      assert(got.map(_.bytes.toSeq) == secs.map(_.toSeq))
    }
  }
}
