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

  test("streaming dedup suppresses re-broadcast sections across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def sec(pid: Int, ver: Int, num: Int, offMs: Long) =
      (new java.sql.Timestamp(t0.getTime + offMs), pid, 0, ver, num)
    val mem = MemoryStream[(java.sql.Timestamp, Int, Int, Int, Int)]
    val df = mem.toDS()
      .toDF("ts", "pid", "tableId", "versionNumber", "sectionNumber")
    val q = StreamingOps.dedupSections(df)
      .writeStream.format("memory").queryName("dedup_secs")
      .outputMode("append").start()
    try {
      // PAT v14 sec 0 broadcast twice in batch 1 + once in batch 2 (the
      // reference re-broadcasts tables continuously) → must emit once
      mem.addData(sec(0, 14, 0, 0), sec(0, 14, 0, 100), sec(66, 27, 0, 0))
      q.processAllAvailable()
      mem.addData(sec(0, 14, 0, 200))
      q.processAllAvailable()
      assert(spark.table("dedup_secs").count() == 2)
      // a NEW version is not a duplicate
      mem.addData(sec(0, 15, 0, 300))
      q.processAllAvailable()
      assert(spark.table("dedup_secs").count() == 3)
    } finally q.stop()
  }

  test("observe() metrics ride the stream: per-batch packet stats") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Int, Long)]
    val df = mem.toDS().toDF("pid", "seq")
    val q = StreamingOps.observedPacketStats(df)
      .writeStream.format("memory").queryName("obs_pkts")
      .outputMode("append").start()
    try {
      mem.addData((33, 0L), (33, 1L), (0x1FFF, 2L))
      q.processAllAvailable()
      val m = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("packet_stats")))
        .lastOption
      assert(m.isDefined, "no observed metrics surfaced")
      assert(m.get.getAs[Long]("n_packets") == 3L)
      assert(m.get.getAs[Long]("n_null") == 1L)
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
