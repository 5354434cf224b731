package graft

import graft.operators.Relational

/** Round-7 batch 32: w41 pinball-loss forecast eval (Holt vs naive). */
class Batch32Spec extends SparkSuite {

  test("w41 pinball eval: both loss legs recount from the w40 series " +
    "and the lag baseline; the skill flag is the p50 comparison") {
    val out = Relational.w41PinballEval(spark, sf).collect()
    assert(out.nonEmpty)
    def pin(q10: Long, e: Long): Long =
      math.max(q10 * e, (q10 - 10) * e)
    val holt = Relational.w40HoltBacktest(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("cents") - r.getAs[Long]("forecast_cents")))
      .toMap
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) as us",
        "cast(floor(value * 100 + 0.5) as bigint) as cents")
      .collect()
      .groupBy(r => (r.getAs[String]("event_type"),
        Math.floorDiv(r.getAs[Long]("us"), 86400000000L)))
      .map { case ((et, day), rs) =>
        (et, day, rs.map(_.getAs[Long]("cents")).sum) }
      .toSeq.groupBy(_._1)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val series = daily(et).sortBy(_._2).map(x => (x._2, x._3))
      val naiveErr = series.sliding(2).collect {
        case Seq((_, p), (day, x)) => day -> (x - p) }.toMap
      val scored = naiveErr.keySet.intersect(
        holt.keySet.filter(_._1 == et).map(_._2))
      assert(r.getAs[Long]("n_days_scored") == scored.size.toLong)
      assert(r.getAs[Long]("holt_p50_x10") ==
        scored.toSeq.map(d => pin(5, holt((et, d)))).sum, s"$et h50")
      assert(r.getAs[Long]("holt_p90_x10") ==
        scored.toSeq.map(d => pin(9, holt((et, d)))).sum, s"$et h90")
      assert(r.getAs[Long]("naive_p50_x10") ==
        scored.toSeq.map(d => pin(5, naiveErr(d))).sum, s"$et n50")
      assert(r.getAs[Long]("naive_p90_x10") ==
        scored.toSeq.map(d => pin(9, naiveErr(d))).sum, s"$et n90")
      assert(r.getAs[Boolean]("holt_beats_naive") ==
        (r.getAs[Long]("holt_p50_x10") < r.getAs[Long]("naive_p50_x10")))
    }
  }
}
