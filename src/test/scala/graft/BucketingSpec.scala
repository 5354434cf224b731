package graft

import org.apache.spark.sql.functions._

import graft.operators.Bucketing

/** Bucketed co-located join: same results as the shuffled join, with NO
  * Exchange in the physical plan. */
class BucketingSpec extends SparkSuite {

  test("bucketed lineitem⋈orders joins shuffle-free and matches") {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val or = Tables.orders(spark, d)
      .select("o_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 8)
    Bucketing.writeBucketed(or, "or_b", "o_orderkey", 8)
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_b", "or_b",
        "l_orderkey", "o_orderkey")
      // AQE keeps the no-exchange property; assert on the executed plan
      joined.collect()
      assert(Bucketing.shuffleFree(joined),
        "bucketed join planned a shuffle:\n" +
          joined.queryExecution.executedPlan.toString)
      // same aggregate result as the plain (shuffled) join
      def rollup(df: org.apache.spark.sql.DataFrame) = df
        .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(18,2)")),
          sum(col("o_totalprice").cast("decimal(18,2)"))).collect().head
      val shuffled = li.join(or, col("l_orderkey") === col("o_orderkey"))
      assert(rollup(joined) == rollup(shuffled))
      // grouped agg on the bucket key also needs no exchange
      val agg = spark.table("li_b").groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("q"))
      agg.collect()
      assert(Bucketing.shuffleFree(agg),
        "bucketed groupBy planned a shuffle")
      // the detector must see THROUGH AQE: a plain shuffled join is the
      // negative control (this was vacuously true before the unwrap)
      val control = li.join(or, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)))
      control.collect()
      assert(!Bucketing.shuffleFree(control),
        "shuffleFree failed to detect a real shuffle under AQE")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS or_b")
    }
  }

  test("l5: the declared query's JOIN stage is exchange-free; only " +
    "the priority rollup shuffles") {
    val df = Bucketing.l5BucketedJoin(spark, sf)
    df.collect()
    // exactly ONE exchange in the whole plan — the 5-row rollup; the
    // fact-fact join itself must ride the bucketed layout
    def countShuffles(
        p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        countShuffles(q.plan)
      case s: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeLike =>
        1 + s.children.map(countShuffles).sum
      case other => other.children.map(countShuffles).sum
    }
    val n = countShuffles(df.queryExecution.executedPlan)
    assert(n == 1,
      s"expected exactly 1 exchange (the rollup), got $n:\n" +
        df.queryExecution.executedPlan)
    // and the values equal the plain shuffled join
    val li = Tables.lineitem(spark, sf)
    val or = Tables.orders(spark, sf)
    val plain = li.join(or, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)"))
          .as("rev_cents"))
    assert(df.exceptAll(plain).count() == 0 &&
      plain.exceptAll(df).count() == 0)
  }
}
