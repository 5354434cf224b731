package graft

import graft.operators.{Relational, TextOps}

/** Round-7 batch 29: w40 Holt linear-trend backtest, a55
  * Benjamini-Hochberg step-up over the a50 p-values, t68 Heaps-law
  * vocabulary growth checkpoints. */
class Batch29Spec extends SparkSuite {

  private def dayOf(micros: Long): Long = Math.floorDiv(micros, 86400000000L)

  test("w40 Holt backtest: the emitted series equals a driver-side " +
    "integer fold with floor halving") {
    val out = Relational.w40HoltBacktest(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("cents"), r.getAs[Long]("forecast_cents"),
          r.getAs[Long]("abs_err_cents"))).toMap
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) as us",
        "cast(floor(value * 100 + 0.5) as bigint) as cents")
      .collect()
      .groupBy(r => (r.getAs[String]("event_type"),
        dayOf(r.getAs[Long]("us"))))
      .map { case ((et, day), rs) =>
        (et, day, rs.map(_.getAs[Long]("cents")).sum) }
      .toSeq.groupBy(_._1)
    var checked = 0
    daily.foreach { case (et, rows) =>
      val series = rows.sortBy(_._2).map(r => (r._2, r._3))
      var l = series.head._2
      var b = 0L
      series.tail.foreach { case (day, x) =>
        val f = l + b
        val nl = Math.floorDiv(x + l + b, 2)
        b = Math.floorDiv(b + nl - l, 2)
        l = nl
        assert(out((et, day)) == ((x, f, math.abs(x - f))),
          s"($et, $day)")
        checked += 1
      }
    }
    assert(checked == out.size && checked > 0)
  }

  test("a55 BH step-up: thresholds, ranks and the rejection front " +
    "recompute from the a50 p-values") {
    val ps = Relational.a50PermutationTest(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("p_ppm"))
    val out = Relational.a55BhFdr(spark, sf).collect()
    assert(out.length == ps.length)
    val m = ps.length.toLong
    val ranked = ps.sortBy(p => (p._2, p._1)).zipWithIndex
      .map { case ((et, p), i) => (et, p, i + 1L) }
    val kmax = ranked.filter(r => r._2 * m <= 50000L * r._3)
      .map(_._3).maxOption.getOrElse(0L)
    val byType = out.map(r => r.getAs[String]("event_type") -> r).toMap
    ranked.foreach { case (et, p, k) =>
      val r = byType(et)
      assert(r.getAs[Long]("p_ppm") == p, s"$et p")
      assert(r.getAs[Long]("k") == k, s"$et k")
      assert(r.getAs[Long]("m") == m, s"$et m")
      assert(r.getAs[Long]("bh_threshold_ppm") == 50000L * k / m)
      assert(r.getAs[Boolean]("rejected") == (k <= kmax), s"$et rej")
    }
  }

  test("t68 Heaps law: checkpoints are monotone, the grid is bounded, " +
    "and the final row recounts the whole corpus") {
    val rows = TextOps.t68HeapsLaw(spark, sf).collect()
      .sortBy(_.getAs[Long]("chunk"))
    assert(rows.nonEmpty && rows.length <= 128)
    // monotone non-decreasing in every cumulative column
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("cum_docs") < b.getAs[Long]("cum_docs"))
        assert(a.getAs[Long]("cum_tokens") <= b.getAs[Long]("cum_tokens"))
        assert(a.getAs[Long]("cum_vocab") <= b.getAs[Long]("cum_vocab"))
      case _ =>
    }
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("\\s+").toSeq)
    val last = rows.last
    assert(last.getAs[Long]("cum_docs") == docs.length.toLong)
    assert(last.getAs[Long]("cum_tokens") ==
      docs.map(_._2.size.toLong).sum)
    assert(last.getAs[Long]("cum_vocab") ==
      docs.flatMap(_._2).distinct.size.toLong)
    // one interior checkpoint recounts exactly
    val width = docs.map(_._1).max / 128 + 1
    val mid = rows(rows.length / 2)
    val c = mid.getAs[Long]("chunk")
    val in = docs.filter(_._1 / width <= c)
    assert(mid.getAs[Long]("cum_docs") == in.length.toLong)
    assert(mid.getAs[Long]("cum_tokens") == in.map(_._2.size.toLong).sum)
    assert(mid.getAs[Long]("cum_vocab") ==
      in.flatMap(_._2).distinct.size.toLong)
  }
}
