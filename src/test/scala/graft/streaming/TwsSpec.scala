package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ts.{TsPacket, TsPipeline}

/** transformWithState hosts produce the same results as the
  * flatMapGroupsWithState hosts (and batch). Needs RocksDB state store,
  * so they run on a dedicated session. */
class TwsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def withRocksSession(f: SparkSession => Unit): Unit = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .getOrCreate()
    try f(spark)
    finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("tws CC audit flags an injected discontinuity across batches") {
    withRocksSession { spark =>
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      def pkt(seq: Long, cc: Int) = TsPacket(seq, 100, tei = false,
        pusi = false, priority = false, scrambling = 0, hasAf = false,
        hasPayload = true, cc = cc, af = None, payload = Array[Byte](1))
      val mem = MemoryStream[TsPacket]
      val q = TwsOps.ccAuditTws(mem.toDS())
        .writeStream.format("memory").queryName("tws_ccerrs")
        .outputMode("append").start()
      try {
        mem.addData(pkt(0, 0), pkt(1, 1))
        q.processAllAvailable()
        mem.addData(pkt(2, 5), pkt(3, 6))
        q.processAllAvailable()
        val errs = spark.table("tws_ccerrs")
          .as[StreamingOps.CcError].collect()
        assert(errs.length == 1)
        assert(errs.head.expected == 2 && errs.head.got == 5)
      } finally q.stop()
    }
  }

  test("tws table assembly == batch latest tables on the capture") {
    withRocksSession { spark =>
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val pkts = TsPipeline.packets(spark)
        .filter((p: TsPacket) => p.pid == 0 || p.pid == 66)
        .collect().sortBy(_.seq)
      val secs = TsPipeline.psiSections(spark,
        spark.createDataset(pkts.toIndexedSeq)).collect().sortBy(_.firstSeq)
      val mem = MemoryStream[graft.ts.PsiSection]
      val q = TwsOps.latestTablesTws(mem.toDS())
        .writeStream.format("memory").queryName("tws_tables")
        .outputMode("append").start()
      try {
        secs.grouped(secs.length / 3 + 1)
          .foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
        val got = spark.table("tws_tables")
          .as[TableState.CompleteTable].collect()
        // the capture carries PAT v14 on PID 0 and PMT v27 on PID 66 —
        // one completed table per distinct (key, version)
        assert(got.map(t => (t.pid, t.tableId, t.versionNumber)).toSet ==
          Set((0, 0, 14), (66, 2, 27)))
      } finally q.stop()
    }
  }

  test("tws event-time timers close sessions when the watermark passes") {
    withRocksSession { spark =>
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, java.sql.Timestamp)]
      val df = mem.toDS().toDF("user_id", "ts")
      val q = TwsOps.sessionizeTws(df, gapMs = 30 * 60 * 1000L)
        .writeStream.format("memory").queryName("tws_sessions")
        .outputMode("append").start()
      try {
        val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
        mem.addData((8L, new java.sql.Timestamp(t0)),
          (8L, new java.sql.Timestamp(t0 + 5 * 60 * 1000)))
        q.processAllAvailable()
        assert(spark.table("tws_sessions").count() == 0) // still open
        mem.addData((9L, new java.sql.Timestamp(t0 + 3 * 60 * 60 * 1000)))
        q.processAllAvailable()
        mem.addData((9L, new java.sql.Timestamp(t0 + 4 * 60 * 60 * 1000)))
        q.processAllAvailable()
        val closed = spark.table("tws_sessions")
          .as[StreamingOps.ClosedSession].collect()
        assert(closed.length == 1)
        assert(closed.head.userId == 8L)
        assert(closed.head.nEvents == 2)
        assert(closed.head.endMicros - closed.head.startMicros ==
          5L * 60 * 1000 * 1000)
      } finally q.stop()
    }
  }

  test("transformWithState section assembly == batch on the capture") {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .getOrCreate()
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val pkts = TsPipeline.packets(spark)
        .filter((p: TsPacket) => p.pid == 0 || p.pid == 66)
        .collect().sortBy(_.seq)
      val batchSecs = TsPipeline.psiSections(spark,
        spark.createDataset(pkts.toIndexedSeq)).collect()
      val mem = MemoryStream[TsPacket]
      val q = TwsOps.sectionsTws(mem.toDS())
        .writeStream.format("memory").queryName("tws_secs")
        .outputMode("append").start()
      try {
        pkts.grouped(pkts.length / 4 + 1)
          .foreach { c => mem.addData(c.toSeq); q.processAllAvailable() }
        val streamed = spark.table("tws_secs")
          .as[graft.ts.PsiSection].collect()
        assert(streamed.length == batchSecs.length)
        assert(streamed.map(s => (s.pid, s.versionNumber, s.sectionNumber,
            s.bytes.toSeq)).sortBy(_.toString).toSeq ==
          batchSecs.map(s => (s.pid, s.versionNumber, s.sectionNumber,
            s.bytes.toSeq)).sortBy(_.toString).toSeq)
      } finally q.stop()
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("tws streaming near-dup pairs a late-arriving clone across " +
    "batches, ignores distinct docs") {
    withRocksSession { spark =>
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      def at(sec: Int) =
        new java.sql.Timestamp(1704067200000L + sec * 1000L)
      val textA = "the quick brown fox jumps over the lazy sleeping dog " +
        "while seventeen silver airships drift slowly across the calm " +
        "evening sky carrying boxes of rare books toward the harbor town"
      val textB = "completely different words about spark shuffle " +
        "partitions and broadcast joins at scale"
      val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
      val q = TwsOps.nearDupDocsStream(
          mem.toDS().toDF("doc_id", "text", "ts"))
        .toDF("doc_a", "doc_b", "ts")
        .writeStream.format("memory").queryName("tws_neardup")
        .outputMode("append").start()
      try {
        // batch 1: two distinct docs — no pairs
        mem.addData((1L, textA, at(0)), (2L, textB, at(1)))
        q.processAllAvailable()
        assert(spark.table("tws_neardup").count() == 0)
        // batch 2: an exact clone of doc 1 arrives — every band hits,
        // so the CROSS-BATCH bucket state must pair it with doc 1
        mem.addData((3L, textA, at(5)))
        q.processAllAvailable()
        val pairs = spark.table("tws_neardup")
          .select("doc_a", "doc_b").distinct().collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(pairs == Set((1L, 3L)), s"got $pairs")
        // a near-clone (LAST word changed → one shingle of nine lost,
        // jaccard ≈ 0.9) still lands in shared bands with BOTH copies
        mem.addData((4L, textA.replace("dog", "cat"), at(9)))
        q.processAllAvailable()
        val pairs2 = spark.table("tws_neardup")
          .select("doc_a", "doc_b").distinct().collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(pairs2.contains((1L, 4L)) && pairs2.contains((3L, 4L)),
          s"got $pairs2")
      } finally q.stop()
    }
  }
}
