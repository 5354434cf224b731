package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** e19: append-only index update ≡ full rebuild under fixed centroids,
  * and the appended batch actually serves. */
class IvfIncrementalSpec extends SparkSuite {

  test("e19 incremental serve sees appended vectors and ranks them") {
    val out = Similarity.e19IvfIncremental(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // queries 0 and 5 have exact clones in the arrival batch
    // (vec_id % 5 == 0 re-keyed +1e6): the clone has cosine 1.0 and
    // must rank first for its source query
    Seq(0L, 5L).foreach { q =>
      val top = rows.filter(_.getAs[Long]("query_id") == q)
        .minBy(_.getAs[Int]("rnk"))
      assert(top.getAs[Long]("cand_id") == q + 1000000L,
        s"query $q top candidate is not its appended clone: $top")
    }
    // appended ids appear only where deserved, and base ids remain
    assert(rows.exists(_.getAs[Long]("cand_id") < 1000000L))
  }
}
