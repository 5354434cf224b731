package graft.streaming

import graft.SparkSuite
import graft.operators.TextOps

/** Stream≡batch parity for sequence packing: the transformWithState
  * packer replayed over 5 ordered micro-batches must reproduce the
  * batch prefix-sum packing row-for-row (offsets carried across batch
  * boundaries by the per-shard ValueState). This is the same closure
  * the t29 driver row checks through the OpLake dump. */
class PackStreamSpec extends SparkSuite {

  test("streaming packer over a 5-batch replay equals batch t26") {
    val streamed = TwsOps.packReplay(spark, sf).cache()
    val batch = TextOps.t26Pack(spark, sf).cache()
    try {
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
    } finally { streamed.unpersist(); batch.unpersist() }
  }
}
