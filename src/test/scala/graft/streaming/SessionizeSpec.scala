package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite

class SessionizeSpec extends SparkSuite {

  test("event-time TTL closes sessions once the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDS().toDF("user_id", "ts")
    val q = StreamingOps.sessionize(df, gapMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      mem.addData((8L, new Timestamp(t0)),
        (8L, new Timestamp(t0 + 5 * 60 * 1000)))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // still open
      // a much later event (other user) advances the watermark far past
      // user 8's lastSeen + 30 min → user 8's session times out
      mem.addData((9L, new Timestamp(t0 + 3 * 60 * 60 * 1000)))
      q.processAllAvailable()
      mem.addData((9L, new Timestamp(t0 + 4 * 60 * 60 * 1000)))
      q.processAllAvailable()
      val closed = spark.table("sessions")
        .as[StreamingOps.ClosedSession].collect()
      assert(closed.length == 1)
      assert(closed.head.userId == 8L)
      assert(closed.head.nEvents == 2)
      assert(closed.head.endMicros - closed.head.startMicros ==
        5L * 60 * 1000 * 1000)
    } finally q.stop()
  }

  test("native session_window: streaming closes the same sessions as the " +
    "batch run of the identical aggregation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(min: Long) = new Timestamp(t0 + min * 60 * 1000)
    // user 1: two sessions (gap 50 min > 30); user 2: one session
    val data = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 2.0),
      (1L, ts(60), 4.0),
      (2L, ts(5), 8.0))
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val df = mem.toDS().toDF("user_id", "ts", "value")
    val q = StreamingOps.sessionWindowAgg(df)
      .writeStream.format("memory").queryName("swagg")
      .outputMode("append").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      // two watermark advances: first sets wm from the far-future event,
      // second lets the closed sessions flush in append mode
      mem.addData((99L, ts(600), 0.0))
      q.processAllAvailable()
      mem.addData((99L, ts(1200), 0.0))
      q.processAllAvailable()
      val got = spark.table("swagg").filter(col("user_id") =!= 99L)
      val batch = StreamingOps
        .sessionWindowAgg(data.toDF("user_id", "ts", "value"))
      assert(got.count() == 3)
      assert(got.except(batch).count() == 0 &&
        batch.except(got).count() == 0)
      // session_end is last event + gap per the session_window contract
      val u1a = got.filter(col("user_id") === 1L &&
        col("n_events") === 2).collect()(0)
      assert(u1a.getAs[java.sql.Timestamp]("session_end").getTime ==
        ts(40).getTime)
      assert(u1a.getAs[Double]("session_value") == 3.0)
    } finally q.stop()
  }
}
