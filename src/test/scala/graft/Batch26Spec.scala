package graft

import org.apache.spark.sql.functions.expr

import graft.operators.{Relational, TsQueries, Validation}

/** Round-7 batch 26: ts25 TR 101 290 P2 rollup, a49 day-of-week
  * seasonality, v7 median/MAD robust outlier screen. */
class Batch26Spec extends SparkSuite {

  test("ts25 P2 rollup: three checks, counts bounded, and the PCR " +
    "legs agree with a driver-side walk of the packet lake") {
    val out = TsQueries.ts25Tr101290P2(spark, sf).collect()
      .map(r => r.getAs[String]("check_id") ->
        (r.getAs[Long]("n_bad"), r.getAs[Long]("n_obs"))).toMap
    assert(out.keySet == Set("p2_3a_pcr_repetition",
      "p2_3b_pcr_discontinuity", "p2_5_pts_repetition"))
    out.values.foreach { case (bad, obs) =>
      assert(bad >= 0 && bad <= obs && obs > 0)
    }
    // driver-side replay of both PCR checks
    val pcrs = graft.ts.TsLake.packets(spark).toDF()
      .filter("af.pcr is not null")
      .selectExpr("pid", "seq", "af.pcr as pcr",
        "coalesce(af.discontinuity, false) as disc")
      .collect()
      .groupBy(_.getAs[Number]("pid").longValue)
    var (rep, disc, obs) = (0L, 0L, 0L)
    pcrs.values.foreach { rows =>
      rows.sortBy(_.getAs[Number]("seq").longValue).sliding(2).foreach {
        case Array(a, b) =>
          val delta = b.getAs[Long]("pcr") - a.getAs[Long]("pcr")
          val d = b.getAs[Boolean]("disc")
          if (delta > 0) {
            obs += 1
            if (delta > 1080000L && !d) rep += 1
            if (delta > 2700000L && !d) disc += 1
          }
        case _ =>
      }
    }
    assert(out("p2_3a_pcr_repetition") == ((rep, obs)))
    assert(out("p2_3b_pcr_discontinuity") == ((disc, obs)))
  }

  test("a49 seasonality: indices weighted-average to unity and the " +
    "mean leg recounts exactly") {
    val out = Relational.a49DowSeasonality(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[String]("event_type")).foreach {
      case (et, rows) =>
        // Σ n_days·index = tot_days·1e6 up to one floor per dow row
        val totDays = rows.map(_.getAs[Long]("n_days")).sum
        val wsum = rows.map(r =>
          r.getAs[Long]("n_days") * r.getAs[Long]("index_ppm")).sum
        assert(wsum <= totDays * 1000000L &&
          wsum > totDays * (1000000L - rows.length), s"$et $wsum")
    }
    // exact recount of one (type, dow) cell
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type",
        "unix_micros(ts) div 86400000000 as day",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .groupBy("event_type", "day").agg(expr("sum(cents) as c"))
      .withColumn("dow", expr("(day + 3) % 7"))
      .collect()
    val r0 = out.head
    val cell = daily.filter(r =>
      r.getAs[String]("event_type") == r0.getAs[String]("event_type")
        && r.getAs[Long]("dow") == r0.getAs[Long]("dow"))
    assert(r0.getAs[Long]("n_days") == cell.length.toLong)
    assert(r0.getAs[Long]("mean_cents") ==
      cell.map(_.getAs[Long]("c")).sum / cell.length)
  }

  test("v7 robust outliers: exact lower medians match a driver-side " +
    "sort and the outlier census recounts") {
    val out = Validation.v7RobustOutliers(spark, sf).collect()
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type",
        "unix_micros(ts) div 86400000000 as day",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .groupBy("event_type", "day").agg(expr("sum(cents) as c"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(_.getAs[Long]("c")).sorted).toMap
    out.foreach { r =>
      val xs = daily(r.getAs[String]("event_type"))
      val med = xs(((xs.length + 1) / 2) - 1)
      val devs = xs.map(x => math.abs(x - med)).sorted
      val mad = devs(((devs.length + 1) / 2) - 1)
      assert(r.getAs[Long]("n_days") == xs.length.toLong)
      assert(r.getAs[Long]("median_cents") == med)
      assert(r.getAs[Long]("mad_cents") == mad)
      assert(r.getAs[Long]("n_outliers") ==
        devs.count(_ > 3 * mad).toLong)
    }
  }
}
