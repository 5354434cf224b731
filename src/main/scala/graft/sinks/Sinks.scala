package graft.sinks

import java.net.{DatagramPacket, DatagramSocket, InetAddress}

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._

/** Sinks (SURVEY §2.2).
  *
  * Scale notes: both sinks are `foreachBatch`-shaped — idempotent per
  * micro-batch, so Structured Streaming checkpointing upgrades the
  * reference's at-most-once UDP + fork-retried Mongo write to
  * effectively-once.
  */
object Sinks {

  /** K2 — keyed upsert (`dbdriver_apps_procs_docs.c:186-350`): the
    * reference deletes-then-inserts the document for `sys_id` and
    * verifies by readback; the Spark shape is replace-by-key into a
    * key-partitioned parquet table (dynamic partition overwrite touches
    * only the keys present in the batch — other keys' partitions stay). */
  def upsertByKey(df: DataFrame, keyCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption(
      "spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      df.write
        .mode(SaveMode.Overwrite)
        .partitionBy(keyCol)
        .parquet(path)
    finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None =>
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** K2 readback verification (`bson_compare` step,
    * `dbdriver_apps_procs_docs.c:313-336`): after the write, the stored
    * rows for the batch's keys must equal the batch. Returns mismatch
    * count (0 = verified). */
  def verifyUpsert(df: DataFrame, keyCol: String, path: String): Long = {
    val stored = df.sparkSession.read.parquet(path)
      .join(df.select(keyCol).distinct(), Seq(keyCol), "left_semi")
    val cols = df.columns.sorted.map(col).toSeq
    stored.select(cols: _*).exceptAll(df.select(cols: _*)).count() +
      df.select(cols: _*).exceptAll(stored.select(cols: _*)).count()
  }

  /** Training-corpus layout writer — the output side of the corpus
    * pipeline: write documents as parquet partitioned by
    * (lang, split), the layout that makes every downstream
    * per-language / per-split read a PARTITION-PRUNED scan instead of a
    * filter over 100 TB. `maxRecordsPerFile` bounds file size so a hot
    * partition (English) fans into many splittable files rather than
    * one giant one; `sortWithinPartitions(doc_id)` gives each file a
    * monotone doc_id range for min/max-stat row-group skipping. The
    * split column derives from the t12 content-hash bucketing, so the
    * layout is reproducible from content alone. */
  def writeCorpus(docs: DataFrame, path: String,
      maxRecordsPerFile: Int = 1000000): Unit =
    docs
      .withColumn("split",
        when((conv(substring(md5(col("text").cast("binary")), 1, 6), 16, 10)
          .cast("long") % 100) < 90, "train")
          .when((conv(substring(md5(col("text").cast("binary")), 1, 6), 16, 10)
            .cast("long") % 100) < 95, "val")
          .otherwise("test"))
      .repartition(col("lang"), col("split"))
      .sortWithinPartitions(col("doc_id"))
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .partitionBy("lang", "split")
      .parquet(path)

  /** K1 — UDP re-emission (`app_prog_proc.c:626-643` output_url): each
    * partition opens one socket and sends its rows' binary payloads as
    * datagrams (7×188 B batching like the reference's "legacy UDP" is the
    * caller's concern via the `bytes` column). Executor-side, no driver
    * collect. */
  def udpEmit(df: DataFrame, bytesCol: String, host: String, port: Int)
      : Unit =
    df.select(col(bytesCol)).foreachPartition { (it: Iterator[Row]) =>
      val socket = new DatagramSocket()
      val addr = InetAddress.getByName(host)
      try it.foreach { r =>
        val b = r.getAs[Array[Byte]](0)
        socket.send(new DatagramPacket(b, b.length, addr, port))
      } finally socket.close()
    }

  /** S2 paced replay — the reference test harness's `tsudpsend <file>
    * <host> <port> <bps>` (`utests_mpeg2_sp.cpp:56-66`): stream a `.ts`
    * capture onto UDP at a target bit rate, 7×188-B packets per datagram
    * ("legacy UDP", `ts.h:38`). A single-socket utility for driving the
    * UDP source in tests/demos; cluster-scale re-emission is `udpEmit`
    * over a partitioned dataset. Returns datagrams sent. */
  def tsudpsend(path: String, host: String, port: Int, bps: Long): Long = {
    val data = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    val chunk = 7 * 188
    val socket = new DatagramSocket()
    val addr = InetAddress.getByName(host)
    val nsPerChunk =
      if (bps <= 0) 0L else (chunk * 8L * 1000000000L) / bps
    val t0 = System.nanoTime()
    var sent = 0L
    try {
      var off = 0
      while (off < data.length) {
        val n = math.min(chunk, data.length - off)
        socket.send(new DatagramPacket(data, off, n, addr, port))
        sent += 1
        off += n
        val due = t0 + sent * nsPerChunk
        var now = System.nanoTime()
        while (now < due) {
          Thread.sleep(math.max(0L, (due - now) / 1000000L))
          now = System.nanoTime()
        }
      }
    } finally socket.close()
    sent
  }
}
