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

  test("exact-dedup replay emits one winner per distinct content and " +
    "every winner is a real member of its copy group (t42 parity)") {
    import org.apache.spark.sql.functions._
    val streamed = TwsOps.dedupReplay(spark, sf, batches = 3).cache()
    try {
      val batchHashes = graft.operators.TextOps
        .t42StreamDedup(spark, sf)
      // multiset equality on the hash column = one emission per content
      assert(streamed.select("text_hash").exceptAll(batchHashes)
        .count() == 0)
      assert(batchHashes.exceptAll(streamed.select("text_hash"))
        .count() == 0)
      // the winner doc really carries the content it won for
      val docs = graft.Tables.documents(spark, sf)
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("real_hash"))
      val bad = streamed.join(docs, Seq("doc_id"))
        .filter(col("text_hash") =!= col("real_hash"))
      assert(bad.count() == 0)
    } finally streamed.unpersist()
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
