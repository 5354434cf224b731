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
}
