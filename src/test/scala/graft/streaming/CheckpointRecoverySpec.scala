package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import graft.ts.{TsPacket, TsPipeline}

/** Exactly-once across restarts (SURVEY §2.13): a checkpointed streaming
  * query stopped mid-stream and restarted must produce the SAME sections
  * as batch, no loss and no duplicates — strictly stronger than the
  * reference's at-most-once UDP regime. */
class CheckpointRecoverySpec extends SparkSuite {

  test("section assembly survives a stop/restart via checkpoint") {
    import spark.implicits._
    val pkts = TsPipeline.packets(spark)
      .filter((p: TsPacket) => p.pid == 0 || p.pid == 66)
      .collect().sortBy(_.seq)
    val batchSecs = TsPipeline.psiSections(spark,
      spark.createDataset(pkts.toIndexedSeq)).collect()

    val root = Files.createTempDirectory("graft-ckpt").toString
    val inDir = s"$root/in"
    val outDir = s"$root/out"
    val ckpt = s"$root/ckpt"
    val chunks = pkts.grouped(pkts.length / 6 + 1).toSeq
    def addChunk(i: Int): Unit =
      spark.createDataset(chunks(i).toIndexedSeq)
        .repartition(1)
        .write.mode("append").parquet(inDir)
    def runUntilDrained(): Unit = {
      val q = spark.readStream
        .schema(spark.createDataset(Seq.empty[TsPacket]).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir)
        .as[TsPacket]
        .transform(StreamingOps.sectionsStream)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // first run sees only half the stream — sections split across the
    // boundary stay buffered in state
    (0 until 3).foreach(addChunk)
    runUntilDrained()
    // "crash", deliver the rest, restart from the checkpoint
    (3 until 6).foreach(addChunk)
    runUntilDrained()

    val streamed = spark.read.parquet(outDir)
      .as[graft.ts.PsiSection].collect()
    assert(streamed.length == batchSecs.length,
      s"got ${streamed.length}, want ${batchSecs.length}")
    assert(streamed.map(s => (s.pid, s.versionNumber, s.sectionNumber,
        s.bytes.toSeq)).sortBy(_.toString).toSeq ==
      batchSecs.map(s => (s.pid, s.versionNumber, s.sectionNumber,
        s.bytes.toSeq)).sortBy(_.toString).toSeq)
  }
}
