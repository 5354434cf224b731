package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

/** §2.13 — event-time windows + watermark: append mode finalizes windows
  * once the watermark passes, and data later than the watermark is
  * dropped (the engine's bounded-state policy replacing the reference's
  * unbounded processing-time rings). */
class WatermarkSpec extends SparkSuite {

  test("stream-stream interval join matches sections to announcements " +
    "within the bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(sec: Int) = new Timestamp(t0 + sec * 1000L)
    val ann = MemoryStream[(Int, Timestamp)]
    val sect = MemoryStream[(Int, Timestamp, Int)]
    val joined = StreamingOps.announceSectionJoin(
      ann.toDS().toDF("pid", "ts"),
      sect.toDS().toDF("pid", "ts", "version"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      ann.addData((256, at(0)))
      sect.addData(
        (256, at(2), 7),   // in-bound -> matches
        (256, at(9), 8),   // same pid, beyond ann_ts+5s -> no match
        (257, at(3), 9))   // no announcement for pid 257 -> no match
      q.processAllAvailable()
      // advance both watermarks so the in-bound match finalizes in
      // append mode (inner interval joins emit once state can't change)
      ann.addData((999, at(60)))
      sect.addData((998, at(60), 0))
      q.processAllAvailable()
      val rows = spark.table("ssj")
        .select("pid", "version").collect().map(r =>
          (r.getInt(0), r.getInt(1))).toSet
      assert(rows == Set((256, 7)), s"got $rows")
    } finally q.stop()
  }

  test("bitrate windows finalize on watermark; late data is dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def at(sec: Int) = new Timestamp(t0 + sec * 1000L)
    val mem = MemoryStream[(Timestamp, Int)]
    val q = StreamingOps.bitrateWindows(mem.toDS().toDF("ts", "pid"))
      .writeStream.format("memory").queryName("rates")
      .outputMode("append").start()
    try {
      // 3 packets in second 0, 2 in second 1
      mem.addData((at(0), 33), (at(0), 33), (at(0), 33),
        (at(1), 33), (at(1), 33))
      q.processAllAvailable()
      assert(spark.table("rates").count() == 0) // nothing finalized yet
      // jump to second 60: watermark (60-10) passes seconds 0 and 1
      mem.addData((at(60), 33))
      q.processAllAvailable()
      val emitted = spark.table("rates").collect()
        .map(r => r.getTimestamp(0).getTime -> r.getAs[Long]("bits"))
        .toMap
      assert(emitted == Map(
        t0 -> 3L * 188 * 8,
        (t0 + 1000) -> 2L * 188 * 8))
      // a packet behind the watermark must not resurrect its window
      mem.addData((at(1), 33))
      q.processAllAvailable()
      mem.addData((at(120), 33))
      q.processAllAvailable()
      val after = spark.table("rates").collect()
        .map(r => r.getTimestamp(0).getTime -> r.getAs[Long]("bits"))
        .toMap
      assert(after.get(t0 + 1000).contains(2L * 188 * 8)) // unchanged
    } finally q.stop()
  }
}
