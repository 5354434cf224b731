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

  /** NEAREST-direction as-of join with tolerance — pandas
    * `merge_asof(direction='nearest', tolerance=T)` semantics, still
    * by composition: the SAME union+window pass run twice (backward,
    * and forward on the reversed ordering), then a per-row pick of
    * the nearer candidate. Two sorts of |L|+|R| — still no candidate
    * explosion, no range cross join.
    *
    * Tie policy (deterministic): equal distances prefer the BACKWARD
    * match; among simultaneous right rows the largest `rightId` wins
    * on both sides. A right row at exactly the left timestamp is a
    * backward match with distance 0 (so the forward pass deliberately
    * excludes equal timestamps — sorting left before right in the
    * reversed ordering is what enforces that). */
  def joinNearest(left: DataFrame, leftKey: String, leftTs: String,
      leftId: String, right: DataFrame, rightKey: String, rightTs: String,
      rightId: String, tolUs: Long): DataFrame = {
    val l = left.select(
      col(leftKey).as("k"), col(leftTs).as("t"),
      col(leftId).as("left_id"),
      lit(null).cast("long").as("right_id"),
      lit(null).cast("long").as("rt"), lit(1).as("side"))
    val r = right.select(
      col(rightKey).as("k"), col(rightTs).as("t"),
      lit(null).cast("long").as("left_id"),
      col(rightId).cast("long").as("right_id"),
      col(rightTs).as("rt"), lit(0).as("side"))
    val u = l.unionByName(r)
    val back = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("side"), col("right_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // reversed ordering; left (side 1) before right at equal t, so a
    // simultaneous right row is invisible forward; right_id ASC makes
    // last() pick the max id at the nearest forward timestamp
    val fwd = Window.partitionBy(col("k"))
      .orderBy(col("t").desc, col("side").desc, col("right_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // must be NULL (not a struct of nulls) on left rows, or
    // last(ignoreNulls) would pick the left rows themselves
    val cand = when(col("side") === 0, struct(col("rt"), col("right_id")))
    u.withColumn("b", last(cand, ignoreNulls = true).over(back))
      .withColumn("f", last(cand, ignoreNulls = true).over(fwd))
      .filter(col("side") === 1)
      .withColumn("b_dt", col("t") - col("b.rt"))
      .withColumn("f_dt", col("f.rt") - col("t"))
      .withColumn("b_ok", col("b").isNotNull && col("b_dt") <= tolUs)
      .withColumn("f_ok", col("f").isNotNull && col("f_dt") <= tolUs)
      .select(col("left_id"), col("k"),
        when(col("b_ok") && (!col("f_ok") || col("b_dt") <= col("f_dt")),
          col("b.right_id"))
          .when(col("f_ok"), col("f.right_id"))
          .as("nearest_right"),
        when(col("b_ok") && (!col("f_ok") || col("b_dt") <= col("f_dt")),
          col("b_dt"))
          .when(col("f_ok"), col("f_dt"))
          .as("dt_us"),
        when(col("b_ok") && (!col("f_ok") || col("b_dt") <= col("f_dt")),
          lit("backward"))
          .when(col("f_ok"), lit("forward"))
          .otherwise(lit("none")).as("matched"))
  }

  /** Driver query j15: for each event, the user's NEAREST order within
    * ±30 days (either direction) — the tolerance-bounded enrichment
    * join a feature pipeline uses when "latest before" is too strict.
    * Timestamps are compared in epoch micros. */
  def j15AsofNearest(s: SparkSession, d: String): DataFrame =
    joinNearest(
      events(s, d).withColumn("tsus", expr("unix_micros(ts)")),
      "user_id", "tsus", "event_id",
      orders(s, d).withColumn("ots",
        expr("unix_micros(cast(o_orderdate as timestamp))")),
      "o_custkey", "ots", "o_orderkey",
      30L * 86400000000L)
      .select(col("left_id").as("event_id"), col("k").as("user_id"),
        col("nearest_right").as("nearest_orderkey"),
        coalesce(col("dt_us"), lit(-1L)).as("dt_us"), col("matched"))

  /** w42 — GAP-FILL + LINEAR INTERPOLATION: the missing-day values a
    * forward-fill (ts18) or zero-fill (w21) can't provide — each gap
    * day gets the straight line between its bracketing samples, the
    * resampling pass that precedes any fixed-step time-series model.
    *
    * Per user: the last event value of each active day (deterministic
    * winner by (ts, event_id)) is the sample series; the day spine is
    * the per-user `sequence()` generator (fans a user's span across
    * tasks, no global calendar); bracketing samples come from two
    * frame-bounded `last/first(ignoreNulls)` windows partitioned by
    * user — so the whole op is two key-partitioned window passes, no
    * self-join, no global sort, the same plan at any user count.
    * Interpolation is exact integer math: value in cents, true FLOOR
    * division via the repo's positive-mod form on both engines (the
    * slope numerator goes negative on falling segments, where
    * truncating `div` would round the other way). Spine endpoints are
    * sample days, so every filled row has both brackets by
    * construction. */
  def w42Interpolate(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(
      col("user_id"),
      expr("unix_micros(ts) div 86400000000").as("day"),
      expr("unix_micros(ts)").as("tsus"),
      col("event_id"),
      expr("cast(cast(value as decimal(18,2)) * 100 as long)")
        .as("cents"))
    val daily = ev.groupBy("user_id", "day")
      .agg(max_by(col("cents"), struct(col("tsus"), col("event_id")))
        .as("x"))
    val spine = daily.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("day"))
    val back = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val num = "((nv - pv) * (day - pd))"
    val den = "(nd - pd)"
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("pv", last(col("x"), ignoreNulls = true).over(back))
      .withColumn("pd", last(when(col("x").isNotNull, col("day")),
        ignoreNulls = true).over(back))
      .withColumn("nv", first(col("x"), ignoreNulls = true).over(fwd))
      .withColumn("nd", first(when(col("x").isNotNull, col("day")),
        ignoreNulls = true).over(fwd))
      .select(col("user_id"), col("day"),
        when(col("x").isNotNull, col("x"))
          .otherwise(expr(
            s"pv + ($num - ((($num % $den) + $den) % $den)) div $den"))
          .as("cents"),
        col("x").isNull.as("is_interp"))
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
