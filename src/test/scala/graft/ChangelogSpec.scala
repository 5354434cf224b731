package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Changelog

/** j10 SCD2 / j11 CDC merge: interval and merge-semantics invariants. */
class ChangelogSpec extends SparkSuite {

  test("j10 scd2: versions tile the timeline, one current row per user") {
    val out = Changelog.j10Scd2(spark, sf)

    // exactly one open-ended (current) version per user
    val badCurrent = out.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n"))
      .filter(col("n") =!= 1).count()
    assert(badCurrent == 0)

    // versions are contiguous from 1 and adjacent intervals abut:
    // valid_to(v) == valid_from(v+1); no gaps, no overlaps
    val w = Window.partitionBy("user_id").orderBy("version")
    val chained = out
      .withColumn("next_ver", lead(col("version"), 1).over(w))
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
    assert(chained.filter(col("next_ver").isNotNull &&
      col("next_ver") =!= col("version") + 1).count() == 0)
    assert(chained.filter(col("next_from").isNotNull &&
      col("valid_to_us") =!= col("next_from")).count() == 0)

    // adjacent versions really changed value (runs were collapsed)
    val sameNeighbor = out
      .withColumn("next_val", lead(col("attr_value"), 1).over(w))
      .filter(col("next_val").isNotNull &&
        col("next_val") === col("attr_value")).count()
    assert(sameNeighbor == 0, "two adjacent versions share a value")

    // conservation: every source event lands in exactly one version
    val total = Tables.events(spark, sf).count()
    val dimmed = out.agg(sum("n_events")).collect().head.getLong(0)
    assert(dimmed == total)
  }

  test("j11 cdc merge: last-writer-wins with delete semantics") {
    val out = Changelog.j11CdcMerge(spark, sf)

    // independently derive each user's final op; D keys must be absent
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val last = Tables.events(spark, sf)
      .withColumn("op", when(col("event_id") % 7 === 0, "D")
        .when(col("event_id") % 7 < 3, "I").otherwise("U"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val live = last.filter(col("op") =!= "D")
      .select("user_id").collect().map(_.getLong(0)).toSet
    val got = out.select("user_id").collect().map(_.getLong(0)).toSet
    assert(got == live)
    assert(out.filter(col("last_op") === "D").count() == 0)

    // op accounting matches the raw stream
    val nOps = out.agg(sum("n_ops")).collect().head.getLong(0)
    val expected = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .join(out.select("user_id"), "user_id")
      .agg(sum("c")).collect().head.getLong(0)
    assert(nOps == expected)
  }
}
