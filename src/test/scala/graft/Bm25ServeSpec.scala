package graft

import graft.operators.TextOps

/** t50b: serving from the persisted inverted index must reproduce the
  * inline t50 ranking exactly, and the postings read must prune to the
  * query-term buckets. */
class Bm25ServeSpec extends SparkSuite {

  test("t50b persisted-index serve equals inline t50") {
    val inline = TextOps.t50Bm25(spark, sf)
    val served = TextOps.t50bBm25Serve(spark, sf)
    assert(served.count() == inline.count())
    assert(served.exceptAll(inline).count() == 0)
    assert(inline.exceptAll(served).count() == 0)
  }

  test("t50b serve plan prunes postings partitions") {
    val served = TextOps.t50bBm25Serve(spark, sf)
    served.collect()
    val plan = served.queryExecution.executedPlan.toString
    // the postings scan must carry a literal partition filter on bkt
    // (static pruning from the bounded query-bucket list)
    val pruned = "PartitionFilters: \\[bkt#\\d+ IN".r
      .findFirstIn(plan).isDefined ||
      "PartitionFilters: \\[bkt#\\d+ INSET".r.findFirstIn(plan).isDefined
    assert(pruned, s"no partition pruning on the postings scan:\n$plan")
  }
}
