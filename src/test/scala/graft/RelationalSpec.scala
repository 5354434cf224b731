package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSuite {

  test("every declared query runs and returns a stable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // force execution
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("f1 range filter matches an independent count") {
    val rows = Relational.f1RangeFilter(spark, sf)
    val expected = Tables.lineitem(spark, sf)
      .filter(
        col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01"
          && col("l_discount") > 0.05)
      .count()
    assert(rows.count() == expected && expected > 0)
  }

  test("j2 left join keeps all customers") {
    val n = Relational.j2LeftJoinNullFill(spark, sf).count()
    assert(n == Tables.customer(spark, sf).count())
  }

  test("j3 semi + j4 anti partition orders/customers consistently") {
    val semi = Relational.j3SemiJoin(spark, sf).count()
    val totalOrders = Tables.orders(spark, sf).count()
    assert(semi <= totalOrders)
    val anti = Relational.j4AntiJoin(spark, sf).count()
    assert(anti <= Tables.customer(spark, sf).count())
  }

  test("a1 grouped agg: sums positive, group count small") {
    val df = Relational.a1GroupedAgg(spark, sf).collect()
    assert(df.length <= 9) // |returnflag| x |linestatus|
    df.foreach(r => assert(r.getAs[Double]("sum_qty") > 0))
  }

  test("a4 sliding window: every event is in exactly 2 windows") {
    val windows = Relational.a4SlidingWindow(spark, sf)
      .agg(sum("n")).first().getLong(0)
    val evts = Tables.events(spark, sf).count()
    assert(windows == 2 * evts)
  }

  test("w1 row_number picks one row per customer") {
    val df = Relational.w1RowNumber(spark, sf)
    assert(df.groupBy("o_custkey").count().filter(col("count") > 1)
      .count() == 0)
  }

  test("r2 latest per key matches max event_id") {
    val got = Relational.r2LatestPerKey(spark, sf)
      .select(col("user_id"), col("event_id"))
    val want = Tables.events(spark, sf).groupBy("user_id")
      .agg(max("event_id").as("event_id"))
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("r3 group completeness discriminates (both classes present)") {
    // synthetic linenumbers have gaps/dupes, so the completeness detector
    // must find both complete and incomplete groups — a constant answer
    // would mean the check is broken
    val df = Relational.r3GroupComplete(spark, sf).cache()
    try {
      assert(df.filter(col("complete")).count() > 0)
      assert(df.filter(!col("complete")).count() > 0)
    } finally df.unpersist()
  }

  test("s1 topk is ordered and bounded") {
    val rows = Relational.s1TopK(spark, sf)
      .select("o_totalprice").collect().map(_.getDouble(0))
    assert(rows.length <= 100)
    assert(rows.sameElements(rows.sorted(Ordering[Double].reverse)))
  }

  test("s4 union all preserves counts") {
    val n = Relational.s4UnionAll(spark, sf).count()
    assert(n == Tables.customer(spark, sf).count() +
      Tables.supplier(spark, sf).count())
  }
}
