package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** As-of (point-in-time) join — the canonical "operator Spark lacks"
  * (builder prompt §custom operators). Implemented by composition, the
  * scalable way: tag both sides, union, ONE sort per key, and carry the
  * right side forward with `last(ignoreNulls)` over an unbounded-
  * preceding frame. No per-row candidate explosion, no range cross
  * join — wall-clock is a single shuffle+sort of |L|+|R|, which is the
  * plan you want at 100 TB.
  *
  * Tie policy (deterministic): right rows sort before left rows at equal
  * timestamps (an exactly-simultaneous right row matches), and among
  * simultaneous right rows the largest `rightId` wins.
  */
object AsOf {

  /** For each left row, the id of the latest right row with
    * rightTs ≤ leftTs on the same key. Output: leftId, key, asof_right.
    */
  def join(left: DataFrame, leftKey: String, leftTs: String,
      leftId: String, right: DataFrame, rightKey: String, rightTs: String,
      rightId: String): DataFrame = {
    val l = left.select(
      col(leftKey).as("k"), col(leftTs).as("t"),
      col(leftId).as("left_id"), lit(null).cast("long").as("right_id"),
      lit(1).as("side"))
    val r = right.select(
      col(rightKey).as("k"), col(rightTs).as("t"),
      lit(null).cast("long").as("left_id"),
      col(rightId).cast("long").as("right_id"), lit(0).as("side"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("side"), col("right_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof_right",
        last(col("right_id"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("left_id"), col("k"), col("asof_right"))
  }

  /** Driver query: for each event, the user's latest order at or before
    * the event time (events.user_id ↔ orders.o_custkey). */
  def w6AsofJoin(s: SparkSession, d: String): DataFrame =
    join(
      events(s, d), "user_id", "ts", "event_id",
      orders(s, d), "o_custkey", "o_orderdate", "o_orderkey")
      .select(
        col("left_id").as("event_id"),
        col("k").as("user_id"),
        col("asof_right").as("asof_orderkey"))
}
