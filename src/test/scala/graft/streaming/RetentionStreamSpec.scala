package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Relational

/** Stream≡batch parity for cohort retention: the per-user online state
  * machine (first event fixes the cohort, each first-seen day emits
  * once) replayed over ts-ordered micro-batches must aggregate into
  * exactly batch w15's retention matrix. Same closure the w16 driver
  * row checks through the OpLake dump. */
class RetentionStreamSpec extends SparkSuite {

  test("streaming retention over a 5-batch replay equals batch w15") {
    val streamed = TwsOps.retentionReplay(spark, sf)
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users")).cache()
    val batch = Relational.w15Retention(spark, sf).cache()
    try {
      assert(streamed.count() > 0, "retention must emit for someone")
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
    } finally { streamed.unpersist(); batch.unpersist() }
  }
}
