package graft.streaming

import graft.SparkSuite
import graft.operators.Changelog

/** Stream≡batch parity for the SCD2 dimension build: closed intervals
  * emitted by the online maintainer must equal batch j10's non-current
  * rows exactly. Same closure the j13 driver row checks via OpLake. */
class Scd2StreamSpec extends SparkSuite {

  test("streaming scd2 closed rows over a 5-batch replay equal batch j10") {
    import org.apache.spark.sql.functions._
    val streamed = TwsOps.scd2Replay(spark, sf).cache()
    val batch = Changelog.j10Scd2(spark, sf)
      .filter(!col("is_current"))
      .select("user_id", "attr_value", "version", "valid_from_us",
        "valid_to_us", "n_events")
      .cache()
    try {
      assert(streamed.count() > 0)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
    } finally { streamed.unpersist(); batch.unpersist() }
  }
}
