package graft.streaming

import graft.SparkSuite
import graft.operators.Relational

/** Stream≡batch parity for funnel matching: the per-user greedy state
  * machine replayed over ts-ordered micro-batches must produce exactly
  * the batch stepwise-minima rows of w12 (greedy first-match in event-
  * time order ≡ min over each stage's strict-after candidates). Same
  * closure the w13 driver row checks through the OpLake dump. */
class FunnelStreamSpec extends SparkSuite {

  test("streaming funnel over a 5-batch replay equals batch w12") {
    val streamed = TwsOps.funnelReplay(spark, sf).cache()
    val batch = Relational.w12Funnel(spark, sf).cache()
    try {
      assert(streamed.count() == batch.count())
      assert(streamed.count() > 0, "funnel must complete for someone")
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
    } finally { streamed.unpersist(); batch.unpersist() }
  }
}
