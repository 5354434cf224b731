package graft

import graft.operators.{Graph, Relational}

/** Round-7 batch 24: rank statistics (a47 Mann–Whitney, a48 Kendall),
  * the w37 survival ledger, and g9 local clustering coefficients. */
class Batch24Spec extends SparkSuite {

  test("a47 Mann-Whitney: U identities hold and one type matches a " +
    "brute-force recount of the exact midrank definition") {
    val out = Relational.a47MannWhitney(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nWe, nWd) = (r.getAs[Long]("n_we"), r.getAs[Long]("n_wd"))
      val (u2We, u2Wd) = (r.getAs[Long]("u2_we"), r.getAs[Long]("u2_wd"))
      // U1 + U2 = n1*n2 (x2 scale doubles the right side)
      assert(u2We + u2Wd == 2 * nWe * nWd)
      assert(u2We >= 0 && u2Wd >= 0)
      val rb = r.getAs[Long]("rb_ppm")
      assert(rb >= -1000000L && rb <= 1000000L)
    }
    // brute-force one event type: count (weekend, weekday) pairs won +
    // half-ties — the U definition the midrank formula must equal
    val et = out.head.getAs[String]("event_type")
    val ev = Tables.events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === et)
      .selectExpr(
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents",
        "((unix_micros(ts) div 86400000000) + 3) % 7 >= 5 as weekend")
      .collect()
    val we = ev.filter(_.getAs[Boolean]("weekend")).map(_.getLong(0))
    val wd = ev.filter(!_.getAs[Boolean]("weekend")).map(_.getLong(0))
    val u2Brute = we.iterator.map { a =>
      wd.count(a > _).toLong * 2 + wd.count(a == _).toLong
    }.sum
    val row = out.find(_.getAs[String]("event_type") == et).get
    assert(row.getAs[Long]("u2_we") == u2Brute,
      s"$et: midrank U ${row.getAs[Long]("u2_we")} != brute $u2Brute")
  }

  test("a48 Kendall tau: pair partition is exact and tau matches a " +
    "brute-force concordance recount for every event type") {
    val out = Relational.a48KendallTau(spark, sf).collect()
    assert(out.nonEmpty)
    val pts = Tables.events(spark, sf)
      .selectExpr("event_type",
        "unix_micros(ts) div 86400000000 as day",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.expr("sum(cents) as c"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val series = pts(et)
        .sortBy(_.getAs[Long]("day")).map(_.getAs[Long]("c"))
      val pairs = for {
        i <- series.indices; j <- (i + 1) until series.length
      } yield math.signum(series(j).compare(series(i)))
      val nc = pairs.count(_ > 0).toLong
      val nd = pairs.count(_ < 0).toLong
      assert(r.getAs[Long]("n_pairs") == pairs.length.toLong)
      assert(r.getAs[Long]("nc") == nc, s"$et nc")
      assert(r.getAs[Long]("nd") == nd, s"$et nd")
      assert(r.getAs[Long]("n_ties") == pairs.length - nc - nd)
      assert(r.getAs[Long]("tau_ppm") ==
        Math.floorDiv((nc - nd) * 1000000L, pairs.length.toLong))
    }
  }

  test("w37 survival ledger: risk set telescopes, populations " +
    "reconcile with the user universe, hazards are exact") {
    val out = Relational.w37Survival(spark, sf).collect()
      .sortBy(_.getAs[Long]("week"))
    assert(out.nonEmpty)
    val nUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    // week-0 risk set is everyone; each later risk set is the prior
    // one minus the prior week's exits (the KM telescoping identity)
    assert(out.head.getAs[Long]("n_risk") == nUsers)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("week") + 1 <= b.getAs[Long]("week"))
        if (a.getAs[Long]("week") + 1 == b.getAs[Long]("week"))
          assert(b.getAs[Long]("n_risk") == a.getAs[Long]("n_risk")
            - a.getAs[Long]("n_churn") - a.getAs[Long]("n_censored"))
      case _ =>
    }
    val exits = out.map(r =>
      r.getAs[Long]("n_churn") + r.getAs[Long]("n_censored")).sum
    assert(exits == nUsers)
    out.foreach(r => assert(r.getAs[Long]("hazard_ppm") ==
      r.getAs[Long]("n_churn") * 1000000L / r.getAs[Long]("n_risk")))
  }

  test("g9 local clustering: per-node triangles sum to 3x the g4 " +
    "census and every lcc is a valid exact ratio") {
    val g4 = Graph.g4Triangles(spark, sf).collect().head
    val out = Graph.g9LocalClustering(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_tri")).sum ==
      3 * g4.getAs[Long]("n_triangles"))
    out.foreach { r =>
      val (deg, tri) = (r.getAs[Long]("deg"), r.getAs[Long]("n_tri"))
      assert(deg >= 2)
      // a node's triangles are a subset of its wedges
      assert(tri <= deg * (deg - 1) / 2)
      assert(r.getAs[Long]("lcc_ppm") ==
        2000000L * tri / (deg * (deg - 1)))
      assert(r.getAs[Long]("lcc_ppm") <= 1000000L)
    }
  }
}
