package graft.ts

import graft.SparkSuite

/** BASELINE.md engineering target: lossless 15 029-packet replay — every
  * packet of the reference capture must decode→encode to the exact
  * original 188 bytes (E1 is a true inverse of P1/P2 on real data). */
class LosslessReplaySpec extends SparkSuite {

  test("decode->encode is byte-identical for all 15029 capture packets") {
    import spark.implicits._
    val mismatches = TsPipeline.packets(spark)
      .map { p =>
        val bytes = TsCodec.encode(p)
        // recover the original record from the source for comparison
        (p.seq, bytes)
      }
      .collect()
      .sortBy(_._1)
    val raw = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(TsPipeline.DefaultCapture))
    assert(mismatches.length == 15029)
    var bad = 0
    mismatches.foreach { case (seq, enc) =>
      val off = seq.toInt * 188
      if (!java.util.Arrays.equals(enc,
        java.util.Arrays.copyOfRange(raw, off, off + 188))) bad += 1
    }
    assert(bad == 0, s"$bad packets failed lossless round-trip")
  }
}
