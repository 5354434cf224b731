package graft.streaming

import java.sql.Timestamp
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.operators.TextOps

/** The COMPOSED continuous training-corpus ingest pipeline — the
  * streaming shape a 100 TB corpus build runs live: quality gate
  * (t22's Gopher rules, stateless codegen filter — cheapest first) →
  * content-hash exact dedup (watermark-bounded state, first arrival
  * wins) → idempotent parquet append per micro-batch. Each stage is
  * individually proven elsewhere (TextOpsSpec, DocDedupStreamSpec,
  * SinksAndSourcesSpec); this spec pins their composition: late clones
  * suppressed ACROSS micro-batches, low-quality docs never reach the
  * sink, output equals the batch run of the same gate+dedup. */
class CorpusIngestSpec extends SparkSuite {

  test("gate → dedup → sink composition: only good, first-arrival docs land") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good =
      Iterator.continually("the quick brown fox jumps over a lazy dog again")
        .take(6).mkString(" ") // 60 words, stopword-rich, mean len ~4
    val goodB = good.replace("dog", "cat")
    val bad = "tiny doc" // fails the >= 50 words rule
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(min: Long) = new Timestamp(t0 + min * 60 * 1000)

    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDS().toDF("doc_id", "text", "ts")
    val outDir = Files.createTempDirectory("graft-ingest").toString + "/out"
    // the gate is a row-local predicate, so it filters the live stream
    // directly — no stream-stream join, no state
    val gated = docs.filter(TextOps.gopherKeep)
    val q = StreamingOps.dedupDocsStream(gated)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("doc_id", "text")
          .write.mode("append").parquet(outDir)
      }
      .start()
    try {
      mem.addData((1L, good, ts(0)), (2L, bad, ts(1)))
      q.processAllAvailable()
      mem.addData((3L, good, ts(2)), (4L, goodB, ts(3))) // 3 = late clone of 1
      q.processAllAvailable()
      val got = spark.read.parquet(outDir)
      // doc 1 (good, first), doc 4 (good, novel); 2 gated out, 3 deduped
      assert(got.count() == 2)
      assert(got.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
      // composition equals the batch run of gate + first-arrival dedup
      val all = Seq((1L, good, ts(0)), (2L, bad, ts(1)),
        (3L, good, ts(2)), (4L, goodB, ts(3))).toDF("doc_id", "text", "ts")
      val batchRun = TextOps.gopherFilterOf(all).filter(col("keep"))
        .join(all, Seq("doc_id"))
        .withColumn("h", md5(col("text").cast("binary")))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("h").orderBy("ts", "doc_id")))
        .filter(col("rn") === 1)
      assert(batchRun.select("doc_id").as[Long].collect().toSet ==
        got.select("doc_id").as[Long].collect().toSet)
    } finally q.stop()
  }

  test("AvailableNow backfill: drain the backlog, stop, resume " +
    "incrementally on the same checkpoint") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val base = Files.createTempDirectory("graft-backfill").toString
    val (in, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def writeBatch(ids: Seq[Long]): Unit =
      ids.map(i => (i, s"backfill doc $i", t0)).toDF("doc_id", "text", "ts")
        .coalesce(1).write.mode("append").parquet(in)
    def drain(): Unit = {
      val docs = spark.readStream
        .schema("doc_id LONG, text STRING, ts TIMESTAMP").parquet(in)
      val q = StreamingOps.dedupDocsStream(docs)
        .writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("doc_id").write.mode("append").parquet(out)
        }
        .start()
      q.awaitTermination()
    }
    // a 2-file backlog (with a cross-file duplicate) drains in one run
    writeBatch(Seq(1L, 2L))
    writeBatch(Seq(2L, 3L)) // doc 2 is an exact re-ingest → suppressed
    drain()
    val first = spark.read.parquet(out).as[Long].collect().toSet
    assert(first == Set(1L, 2L, 3L))
    // resume on the SAME checkpoint: only the new file is processed
    writeBatch(Seq(4L))
    drain()
    val second = spark.read.parquet(out).as[Long].collect().toSet
    assert(second == Set(1L, 2L, 3L, 4L))
  }
}
