package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Round-6 batch 18: w28 growth accounting, a37 Benford audit. */
class Batch17Spec extends SparkSuite {

  test("w28 growth accounting: the MAU identity holds every week") {
    val out = Relational.w28GrowthAccounting(spark, sf).collect()
      .sortBy(_.getAs[Long]("week"))
    assert(out.nonEmpty)
    var prevActive = 0L
    var prevWeek = Long.MinValue
    out.foreach { r =>
      val active = r.getAs[Long]("n_active")
      assert(active == r.getAs[Long]("n_new") +
        r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"))
      val expectPrev =
        if (r.getAs[Long]("week") == prevWeek + 1) prevActive else 0L
      assert(r.getAs[Long]("n_churned") ==
        expectPrev - r.getAs[Long]("n_retained"))
      prevActive = active
      prevWeek = r.getAs[Long]("week")
    }
    // total new across all weeks = distinct users ever active
    val users = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).first().getLong(0)
    assert(out.map(_.getAs[Long]("n_new")).sum == users)
  }

  test("a37 benford: digit census matches brute force, shares sum") {
    val out = Relational.a37Benford(spark, sf).collect()
      .map(r => r.getAs[Int]("digit") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("share_ppm"),
          r.getAs[Long]("dev_ppm"))).toMap
    val cents = Tables.orders(spark, sf).select(col("o_totalprice"))
      .collect().map(r => math.floor(r.getDouble(0) * 100 + 0.5).toLong)
    val n = cents.length.toLong
    val byDigit = cents.groupBy(_.toString.head.asDigit)
    assert(out.keySet == byDigit.keySet)
    byDigit.foreach { case (d, vs) =>
      val (got, share, dev) = out(d)
      assert(got == vs.length.toLong)
      assert(share == vs.length * 1000000L / n)
      assert(dev >= 0L)
    }
    val shareSum = out.values.map(_._2).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - 9)
  }
}
