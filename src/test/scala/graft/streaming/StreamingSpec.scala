package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ts.{TsPipeline, TsPacket}

/** Streaming ≡ batch equivalence: the same state machine must produce the
  * same sections whether fed all-at-once or in micro-batches that split
  * sections across batch boundaries. */
class StreamingSpec extends SparkSuite {

  test("streaming section assembly == batch over the capture PSI PIDs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pkts = TsPipeline.packets(spark)
      .filter(p => p.pid == 0 || p.pid == 66)
      .collect()
      .sortBy(_.seq)
    val batchSecs = TsPipeline.psiSections(spark,
      spark.createDataset(pkts)).collect()

    val mem = MemoryStream[TsPacket]
    val q = StreamingOps.sectionsStream(mem.toDS())
      .writeStream.format("memory").queryName("secs")
      .outputMode("append").start()
    try {
      // feed in 3 uneven chunks so sections straddle micro-batches
      val chunks = pkts.grouped(pkts.length / 3 + 1).toSeq
      chunks.foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
      val streamed = spark.table("secs").as[graft.ts.PsiSection].collect()
      assert(streamed.length == batchSecs.length)
      assert(
        streamed.map(s => (s.pid, s.tableId, s.versionNumber,
          s.sectionNumber, s.bytes.toSeq)).sortBy(_.toString).toSeq ==
        batchSecs.map(s => (s.pid, s.tableId, s.versionNumber,
          s.sectionNumber, s.bytes.toSeq)).sortBy(_.toString).toSeq)
    } finally q.stop()
  }

  test("streaming CC audit flags an injected discontinuity across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def pkt(seq: Long, cc: Int) = TsPacket(seq, 100, tei = false,
      pusi = false, priority = false, scrambling = 0, hasAf = false,
      hasPayload = true, cc = cc, af = None, payload = Array[Byte](1))
    val mem = MemoryStream[TsPacket]
    val q = StreamingOps.ccAuditStream(mem.toDS())
      .writeStream.format("memory").queryName("ccerrs")
      .outputMode("append").start()
    try {
      mem.addData(pkt(0, 0), pkt(1, 1))
      q.processAllAvailable()
      // batch 2 starts at cc=5: gap 2,3,4 → one error (state carried over)
      mem.addData(pkt(2, 5), pkt(3, 6))
      q.processAllAvailable()
      val errs = spark.table("ccerrs").as[StreamingOps.CcError].collect()
      assert(errs.length == 1)
      assert(errs.head.expected == 2 && errs.head.got == 5)
    } finally q.stop()
  }

  test("1s bitrate windows sum to the stream total") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // synthetic: 10 packets per second for 5 seconds on one PID
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = for (s <- 0 until 5; i <- 0 until 10)
      yield (new java.sql.Timestamp(base.getTime + s * 1000L + i * 50L), 33)
    val df = rows.toDF("ts", "pid")
    val out = StreamingOps.bitrateWindows(df) // batch mode: same plan
    val got = out.collect()
    assert(got.length == 5)
    assert(got.forall(_.getAs[Long]("bits") == 10L * 188 * 8))
  }
}
