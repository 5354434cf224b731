package graft

import org.apache.spark.sql.functions._

import graft.operators.{Changelog, Relational, Validation}

/** Round-7 batch 1: v3 k-anonymity, v4 FK sweep, j19 bitemporal,
  * a44 Cramér's V, w35 concurrency percentiles. */
class Batch21Spec extends SparkSuite {

  test("j19 bitemporal: late counts and snapshots recompute exactly") {
    val out = Changelog.j19Bitemporal(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("v_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val tCut = ev.map(_._4).max
    val byUser = ev.groupBy(_._1)
    out.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val mine = byUser(u)
      val nowRow = mine.maxBy(e => (e._4, e._2))
      assert(r.getAs[String]("attr_now") == nowRow._3)
      assert(r.getAs[Long]("valid_us_now") == nowRow._4)
      val known = mine.filter(e => e._4 + (e._2 % 5) * 86400000000L <= tCut)
      val atT = if (known.nonEmpty)
        Some(known.maxBy(e => (e._4, e._2))) else None
      assert(Option(r.getAs[String]("attr_at_t")) == atT.map(_._3))
      assert(r.getAs[Long]("n_late") ==
        mine.count(e => e._4 + (e._2 % 5) * 86400000000L > tCut).toLong)
      assert(r.getAs[Boolean]("restated") ==
        (atT.map(_._3) != Option(r.getAs[String]("attr_now"))))
    }
    // the delay simulation must actually produce late records
    assert(out.map(_.getAs[Long]("n_late")).sum > 0)
    assert(out.exists(_.getAs[Boolean]("restated")))
  }

  test("a44 cramers v: chi2 recomputes from the brute-force grid, " +
    "V in [0, 1]") {
    val r = Relational.a44CramersV(spark, sf).collect().head
    val ev = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000) % 7").as("dow"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val n = ev.length.toLong
    val cells = ev.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong }
    val rt = ev.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val ct = ev.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val chi2 = (for { (et, rr) <- rt; (dw, cc) <- ct } yield {
      val o = BigInt(cells.getOrElse((et, dw), 0L))
      val diff = o * n - BigInt(rr) * cc
      diff * diff * 1000000 / (BigInt(rr) * cc * n)
    }).sum
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("chi2_ppm") == chi2.toLong)
    assert(r.getAs[Long]("dof") ==
      (rt.size - 1L) * (ct.size - 1L))
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
  }

  test("w35 concurrency percentiles: order and bounds vs a36 peak") {
    val r = Relational.w35ConcurrencyPctile(spark, sf).collect().head
    val p50 = r.getAs[Long]("p50_concurrency")
    val p95 = r.getAs[Long]("p95_concurrency")
    val mx = r.getAs[Long]("max_concurrency")
    assert(p50 >= 1L && p50 <= p95 && p95 <= mx)
    val peak = Relational.a36PeakConcurrency(spark, sf)
      .collect().head.getAs[Long]("peak_concurrency")
    assert(mx == peak)
    assert(r.getAs[Long]("busy_us") > 0L)
  }

  test("v3 k-anonymity: group sizes partition the table, verdicts " +
    "match the threshold") {
    val out = Validation.v3Kanonymity(spark, sf).collect()
    assert(out.nonEmpty)
    val total = Tables.customer(spark, sf).count()
    assert(out.map(_.getAs[Long]("group_n")).sum == total)
    out.foreach { r =>
      assert(r.getAs[Boolean]("meets_k") ==
        (r.getAs[Long]("group_n") >= 10L))
      assert(r.getAs[Long]("share_ppm") ==
        r.getAs[Long]("group_n") * 1000000L / total)
    }
    // QI grid is bounded: |segments| x |nations|
    val segs = Tables.customer(spark, sf)
      .select("c_mktsegment").distinct().count()
    val nats = Tables.customer(spark, sf)
      .select("c_nationkey").distinct().count()
    assert(out.length <= segs * nats)
  }

  test("v4 referential integrity: all 7 edges reported; an orphan " +
    "plant is counted") {
    val out = Validation.v4RefIntegrity(spark, sf).collect()
    assert(out.length == 7)
    // clean generated data: every edge intact, row counts match
    val li = Tables.lineitem(spark, sf).count()
    out.foreach { r =>
      assert(r.getAs[Boolean]("intact"),
        s"edge ${r.getAs[String]("fk_edge")} not intact")
      assert(r.getAs[Long]("n_orphans") == 0L)
    }
    assert(out.filter(_.getAs[String]("fk_edge").startsWith("lineitem"))
      .forall(_.getAs[Long]("n_rows") == li))
    // planted orphan: drop one referenced order, orphans must count
    import org.apache.spark.sql.SaveMode
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_v4").toString
    val someKey = Tables.lineitem(spark, sf)
      .select("l_orderkey").head().getLong(0)
    Seq("lineitem", "part", "supplier", "customer", "nation", "region")
      .foreach(t => Tables.load(spark, sf, t).write
        .mode(SaveMode.Overwrite).parquet(s"$tmp/$t.parquet"))
    Tables.orders(spark, sf).filter(col("o_orderkey") =!= someKey)
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/orders.parquet")
    val planted = Validation.v4RefIntegrity(spark, tmp).collect()
      .find(_.getAs[String]("fk_edge") == "lineitem.orderkey->orders").get
    val expect = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === someKey).count()
    assert(planted.getAs[Long]("n_orphans") == expect && expect > 0)
    assert(!planted.getAs[Boolean]("intact"))
  }
}
