package graft

import graft.operators.{Relational, TextOps}

/** Closed-form invariants of the round-7 stress probes (the sf0.1
  * wall-times live in COVERAGE.md; these pin the EXACT math at test
  * scale, so the probes can't silently drift). */
class StressProbesSpec extends SparkSuite {

  test("z30: 20x doc clones multiply cum_tokens exactly 20x and leave " +
    "the final vocabulary unchanged; grid stays <= 128 rows") {
    val base = TextOps.t68HeapsLaw(spark, sf).collect()
      .maxBy(_.getAs[Long]("chunk"))
    val z = TextOps.diag("z30_t68_20x")(spark, sf).collect()
    assert(z.length <= 128)
    val last = z.maxBy(_.getAs[Long]("chunk"))
    assert(last.getAs[Long]("cum_docs") ==
      20L * base.getAs[Long]("cum_docs"))
    assert(last.getAs[Long]("cum_tokens") ==
      20L * base.getAs[Long]("cum_tokens"))
    assert(last.getAs[Long]("cum_vocab") ==
      base.getAs[Long]("cum_vocab"))
  }

  test("z34: 10-year-calendar Theil-Sen — exact 6 659 425 pairs per " +
    "type, median slope pinned to the planted trend") {
    val t0 = System.nanoTime()
    val rows = Relational.diag("z34_a45_3650d")(spark, sf).collect()
    System.err.println(f"[z34] 5 types x 3650 days (33.3M pairs): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") == 3650L)
      assert(r.getAs[Long]("n_pairs") == 3650L * 3649 / 2)
      // planted 1000 cents/day trend = 10^9 micro-cents/day; bounded
      // noise (<997 cents) over a median pair gap (~1200 days) moves
      // the median by well under 0.5%
      val slope = r.getAs[Long]("ts_slope_micro")
      assert(math.abs(slope - 1000000000L) < 5000000L,
        s"${r.getAs[String]("event_type")}: slope $slope")
    }
  }

  test("z31: 20x event replication scales every lead-lag covariance " +
    "numerator by exactly 400 (20^2) with identical day counts") {
    def toMap(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getAs[String]("et_a"), r.getAs[String]("et_b"),
        r.getAs[Long]("lag_days")) ->
        (r.getAs[Long]("n_days"), BigInt(r.getAs[String]("cov_n2")))
    }.toMap
    val base = toMap(Relational.a57LeadLag(spark, sf).collect())
    val z = toMap(Relational.diag("z31_a57_20x")(spark, sf).collect())
    assert(z.keySet == base.keySet)
    base.foreach { case (k, (n, cov)) =>
      assert(z(k) == ((n, cov * 400)), s"$k")
    }
  }
}
