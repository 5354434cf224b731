package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ts.{TsPacket, TsPipeline}

/** transformWithState host produces the same sections as the
  * flatMapGroupsWithState host (and batch). Needs RocksDB state store,
  * so it runs on a dedicated session. */
class TwsSpec extends org.scalatest.funsuite.AnyFunSuite {

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
}
