package graft

import graft.operators.Relational

/** Round-7 batch 30: a56 Shewhart 3-sigma control chart, a57 lead-lag
  * cross-covariance table. */
class Batch30Spec extends SparkSuite {

  private def dayOf(micros: Long): Long = Math.floorDiv(micros, 86400000000L)

  private def dailyCents(): Map[String, Seq[(Long, Long)]] =
    Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) as us",
        "cast(floor(value * 100 + 0.5) as bigint) as cents")
      .collect()
      .groupBy(r => (r.getAs[String]("event_type"),
        dayOf(r.getAs[Long]("us"))))
      .map { case ((et, day), rs) =>
        (et, day, rs.map(_.getAs[Long]("cents")).sum) }
      .toSeq.groupBy(_._1)
      .map { case (et, rs) =>
        et -> rs.map(r => (r._2, r._3)).sortBy(_._1) }

  test("a56 SPC chart: signal days match the exact integer 3-sigma " +
    "test and the first-signal day recounts") {
    val out = Relational.a56SpcChart(spark, sf).collect()
    val daily = dailyCents()
    assert(out.length == daily.size)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val xs = daily(et)
      val n = BigInt(xs.size)
      val sx = BigInt(xs.map(_._2).sum)
      val qx = xs.map(x => BigInt(x._2) * x._2).sum
      def sig(x: Long): Boolean = {
        val d = BigInt(x) * n - sx
        d * d > 9 * (n * qx - sx * sx)
      }
      val sigDays = xs.filter(x => sig(x._2)).map(_._1)
      assert(r.getAs[Long]("n_days") == xs.size.toLong)
      assert(BigInt(r.getAs[Long]("mean_cents")) == sx / n, s"$et mean")
      assert(r.getAs[Long]("n_signals") == sigDays.size.toLong, s"$et")
      assert(r.getAs[Long]("first_signal_day") ==
        sigDays.headOption.getOrElse(-1L), s"$et first")
    }
  }

  test("a57 lead-lag: the full (pair, lag) grid recounts, diagonal " +
    "pairs excluded, and lag-0 is symmetric across the pair flip") {
    val out = Relational.a57LeadLag(spark, sf).collect()
      .map(r => (r.getAs[String]("et_a"), r.getAs[String]("et_b"),
        r.getAs[Long]("lag_days")) ->
        (r.getAs[Long]("n_days"), BigInt(r.getAs[String]("cov_n2"))))
      .toMap
    assert(out.nonEmpty)
    assert(out.keys.forall { case (a, b, l) => a != b && l >= 0 && l <= 7 })
    val daily = dailyCents().map { case (et, rs) => et -> rs.toMap }
    val types = daily.keys.toSeq.sorted
    for (a <- types; b <- types if a != b; l <- 0L to 7L) {
      val aligned = daily(a).toSeq.flatMap { case (day, xa) =>
        daily(b).get(day + l).map(yb => (xa, yb)) }
      if (aligned.isEmpty) assert(!out.contains((a, b, l)))
      else {
        val n = BigInt(aligned.size)
        val cov = n * aligned.map(p => BigInt(p._1) * p._2).sum -
          aligned.map(p => BigInt(p._1)).sum *
            aligned.map(p => BigInt(p._2)).sum
        assert(out((a, b, l)) == ((aligned.size.toLong, cov)),
          s"($a,$b,$l)")
      }
    }
    // lag 0 is plain covariance: flipping the pair must not change it
    for (a <- types; b <- types if a < b) {
      (out.get((a, b, 0L)), out.get((b, a, 0L))) match {
        case (Some(x), Some(y)) => assert(x == y, s"($a,$b) lag0")
        case (x, y) => assert(x == y)
      }
    }
  }
}
