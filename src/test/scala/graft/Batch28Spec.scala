package graft

import graft.operators.Relational

/** Round-7 batch 28: a52 Page-Hinkley drift report, a53 streaming
  * Page-Hinkley (13th stream≡batch parity row), a54 seasonal
  * Mann-Kendall. */
class Batch28Spec extends SparkSuite {

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

  /** The sequential fold both a52/a53 implement: per day (t, S, m,
    * minm) with term = x·1e6 − floor(S·1e6/t) − delta. */
  private def phFold(series: Seq[Long], delta: Long)
      : Seq[(Long, Long)] = {
    var (t, sSum, m, minm) = (0L, 0L, 0L, Long.MaxValue)
    series.map { x =>
      t += 1; sSum += x
      m += x * 1000000L - sSum * 1000000L / t - delta
      minm = math.min(minm, m)
      (m, m - minm)
    }
  }

  test("a52 Page-Hinkley: report matches the driver-side sequential " +
    "fold with the data-derived delta/lambda") {
    val out = Relational.a52PageHinkley(spark, sf).collect()
    val daily = dailyCents()
    assert(out.length == daily.size)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val series = daily(et)
      val n = series.size.toLong
      val stot = BigInt(series.map(_._2).sum)
      val mean = (stot * 1000000 / n).toLong
      assert(r.getAs[Long]("n_days") == n)
      assert(r.getAs[Long]("delta_micro") == mean / 20, s"$et delta")
      assert(r.getAs[Long]("lambda_micro") == mean / 2, s"$et lambda")
      val ph = phFold(series.map(_._2), mean / 20)
      assert(r.getAs[Long]("max_ph_micro") == ph.map(_._2).max, s"$et")
      val alarm = series.map(_._1).zip(ph)
        .collectFirst { case (day, (_, p)) if p >= mean / 2 => day }
        .getOrElse(-1L)
      assert(r.getAs[Long]("alarm_day") == alarm, s"$et alarm")
    }
  }

  test("a53 stream Page-Hinkley: replay emissions equal the batch " +
    "delta=0 series across micro-batch seams") {
    val stream = streaming.TwsOps.phReplay(spark, sf, batches = 3)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("cents"), r.getAs[Long]("m_micro"),
          r.getAs[Long]("ph_micro"))).toMap
    val batch = Relational.a53PhSeries(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("cents"), r.getAs[Long]("m_micro"),
          r.getAs[Long]("ph_micro"))).toMap
    assert(stream == batch,
      s"stream ${stream.size} rows vs batch ${batch.size}")
    // and both equal the driver-side fold
    dailyCents().foreach { case (et, series) =>
      series.map(_._1).zip(phFold(series.map(_._2), 0L)).foreach {
        case (day, (m, p)) =>
          assert(batch((et, day))._2 == m && batch((et, day))._3 == p,
            s"($et, $day)")
      }
    }
  }

  test("a54 seasonal MK: per-season S/var18 sums match a brute " +
    "recount and pairs never cross seasons") {
    val out = Relational.a54SeasonalMk(spark, sf).collect()
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) as us",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) as cents")
      .collect()
      .groupBy(r => (r.getAs[String]("event_type"),
        dayOf(r.getAs[Long]("us"))))
      .map { case ((et, day), rs) =>
        (et, day, rs.map(_.getAs[Long]("cents")).sum) }
      .toSeq.groupBy(_._1)
    assert(out.length == daily.size)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val byDow = daily(et).groupBy(x => (x._2 + 3) % 7)
      var s = 0L
      var var18 = 0L
      byDow.values.foreach { g =>
        val series = g.sortBy(_._2).map(_._3)
        for (i <- series.indices; j <- (i + 1) until series.size)
          s += java.lang.Long.signum(series(j) - series(i))
        val ns = series.size.toLong
        val tie18 = series.groupBy(identity).values
          .map(x => { val t = x.size.toLong; t * (t - 1) * (2 * t + 5) })
          .sum
        var18 += ns * (ns - 1) * (2 * ns + 5) - tie18
      }
      assert(r.getAs[Long]("n_seasons") == byDow.size.toLong, s"$et")
      assert(r.getAs[Long]("n_days") == daily(et).size.toLong, s"$et")
      assert(r.getAs[Long]("s_total") == s, s"$et s_total")
      assert(r.getAs[Long]("var18_total") == var18, s"$et var18")
      val sig = s != 0 &&
        180000L * (math.abs(s) - 1) * (math.abs(s) - 1) >= 38416L * var18
      val want = if (sig && s > 0) "increasing"
        else if (sig && s < 0) "decreasing" else "none"
      assert(r.getAs[String]("trend") == want, s"$et trend")
    }
  }
}
