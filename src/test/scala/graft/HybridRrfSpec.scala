package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** e18 RRF fusion: score arithmetic + ranking contract. */
class HybridRrfSpec extends SparkSuite {

  test("e18 rrf: fixed-point scores recompute from the source ranks") {
    val out = Similarity.e18HybridRrf(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lex = Option(r.getAs[Integer]("lex_rank")).map(_.toInt)
      val den = Option(r.getAs[Integer]("dense_rank")).map(_.toInt)
      assert(lex.isDefined || den.isDefined,
        "a fused row came from neither ranking")
      val expected = lex.map(x => 1000000000L / (60 + x)).getOrElse(0L) +
        den.map(x => 1000000000L / (60 + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_fp") == expected)
    }
    // per-query: dense ranks 1..k, non-increasing scores
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("fused_rank"))
      assert(sorted.map(_.getAs[Int]("fused_rank")).toSeq ==
        (1 to sorted.length))
      val fps = sorted.map(_.getAs[Long]("rrf_fp"))
      assert(fps.zip(fps.tail).forall { case (a, b) => a >= b },
        s"q$q fused scores not non-increasing")
    }
    // fusion must actually mix systems: somewhere a doc carries both
    // a lexical and a dense rank, or the two rankers are disjoint —
    // either way both systems contribute rows overall
    assert(rows.exists(r => r.getAs[Integer]("lex_rank") != null))
    assert(rows.exists(r => r.getAs[Integer]("dense_rank") != null))
  }
}
