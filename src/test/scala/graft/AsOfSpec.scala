package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOf

class AsOfSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks latest right at-or-before, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 10:00:00"), 200L)) // key 2 has no right rows
      .toDF("k", "t", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 7L),
      (1L, ts("2024-01-01 11:00:00"), 8L),
      (1L, ts("2024-01-01 13:00:00"), 9L))
      .toDF("k", "t", "rid")
    val out = AsOf.join(left, "k", "t", "lid", right, "k", "t", "rid")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out == Map(100L -> 7L, 101L -> 8L, 200L -> -1L))
  }

  test("simultaneous right row matches; max rightId wins ties") {
    import spark.implicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), 100L))
      .toDF("k", "t", "lid")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L),
      (1L, ts("2024-01-01 10:00:00"), 9L))
      .toDF("k", "t", "rid")
    val out = AsOf.join(left, "k", "t", "lid", right, "k", "t", "rid")
      .first()
    assert(out.getLong(2) == 9L)
  }

  test("w6 query matches an independent per-user max-order computation") {
    // all orders precede all events, so asof = user's max-key order
    // among those with the latest orderdate
    val got = AsOf.w6AsofJoin(spark, sf)
    val perUser = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("user_id"),
        col("o_orderkey").as("expected"))
    val joined = got.join(perUser, Seq("user_id"), "left")
    assert(joined.filter(
      col("asof_orderkey") =!= col("expected")).count() == 0)
  }
}
