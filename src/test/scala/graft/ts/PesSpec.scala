package graft.ts

import graft.SparkSuite

/** PES layer vs independently-computed capture ground truth:
  * PID 68: 2863 PES, PTS 16..8971510 (99.68 s span), 0 with DTS;
  * PID 69: 698 PES, PTS 12857..8961428 (99.43 s span), 697 with DTS. */
class PesSpec extends SparkSuite {

  test("pts/dts 33-bit pack round-trips") {
    val vs = Seq(0L, 1L, 12857L, 8961428L, (1L << 33) - 1)
    vs.foreach { v =>
      val b = PesCodec.write33(v, 0x2)
      val h = PesCodec.parseHeader(
        Array[Byte](0, 0, 1, 0xE0.toByte, 0, 0, 0x80.toByte, 0x80.toByte,
          5) ++ b)
      assert(h.get.pts.contains(v), s"pts $v")
    }
  }

  test("capture PES stats match ground truth") {
    val rows = TsPipeline.pesTimestampStats(TsPipeline.packets(spark))
      .collect()
      .map(r => r.getAs[Int]("pid") -> (
        r.getAs[Long]("n_pes"), r.getAs[Long]("min_pts"),
        r.getAs[Long]("max_pts"), r.getAs[Long]("n_with_dts"))).toMap
    assert(rows(68) == ((2863L, 16L, 8971510L, 0L)))
    assert(rows(69) == ((698L, 12857L, 8961428L, 697L)))
  }
}
