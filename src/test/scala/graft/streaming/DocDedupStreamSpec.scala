package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

/** Streaming corpus-ingest dedup: first arrival of each content wins,
  * cross-micro-batch duplicates inside the watermark are suppressed. */
class DocDedupStreamSpec extends SparkSuite {

  test("doc stream dedup suppresses cross-batch content duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def doc(id: Long, text: String, sec: Int) =
      (id, text, new Timestamp(1700000000000L + sec * 1000L))
    val mem = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingOps.dedupDocsStream(
        mem.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("docdedup")
      .outputMode("append").start()
    try {
      // batch 1: two distinct texts + an in-batch duplicate of the first
      mem.addData(doc(1, "alpha beta", 0), doc(2, "gamma", 1),
        doc(3, "alpha beta", 2))
      q.processAllAvailable()
      // batch 2: a cross-batch duplicate (must be suppressed by carried
      // state) + one genuinely new text
      mem.addData(doc(4, "alpha beta", 3), doc(5, "delta", 4))
      q.processAllAvailable()
      val out = spark.table("docdedup")
        .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
      assert(out.map(_._2).toSeq.sorted == Seq("alpha beta", "delta",
        "gamma"))
      // first arrival won for the duplicated content
      assert(out.find(_._2 == "alpha beta").get._1 == 1L)
    } finally q.stop()
  }

  test("streaming near-dup replay emits exactly the batch candidate " +
    "pair set (the t25 parity the driver gate hash-checks at sf0.01)") {
    val streamed = TwsOps.nearDupReplay(spark, sf, batches = 3)
    val batch = graft.operators.TextOps.t25StreamNearDup(spark, sf)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    assert(streamed.count() > 0)
  }
}
