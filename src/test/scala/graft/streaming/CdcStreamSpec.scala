package graft.streaming

import graft.SparkSuite
import graft.operators.Changelog

/** Stream≡batch parity for the CDC merge: the per-user last-writer
  * state machine replayed over ts-ordered micro-batches must land on
  * exactly the batch j11 snapshot (delete semantics included). Same
  * closure the j12 driver row checks through the OpLake dump. */
class CdcStreamSpec extends SparkSuite {

  test("streaming cdc merge over a 5-batch replay equals batch j11") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val emissions = TwsOps.cdcReplay(spark, sf)
    // latest snapshot per user, final deletes dropped — the oracle rule
    val streamed = emissions
      .withColumn("rn", row_number().over(Window.partitionBy("user_id")
        .orderBy(col("seq").desc)))
      .filter(col("rn") === 1 && col("last_op") =!= "D")
      .drop("rn", "seq")
      .cache()
    val batch = Changelog.j11CdcMerge(spark, sf).cache()
    try {
      assert(streamed.count() > 0)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
      // every touched user emits ≥1 snapshot, seq strictly increases
      val users = graft.Tables.events(spark, sf)
        .select("user_id").distinct().count()
      assert(emissions.select("user_id").distinct().count() == users)
      val nonMono = emissions
        .withColumn("prev", lag(col("seq"), 1).over(
          Window.partitionBy("user_id").orderBy("seq")))
        .filter(col("prev").isNotNull && col("seq") =!= col("prev") + 1)
        .count()
      assert(nonMono == 0, "per-user seq is not dense-monotone")
    } finally { streamed.unpersist(); batch.unpersist() }
  }
}
