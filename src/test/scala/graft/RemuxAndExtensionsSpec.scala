package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ts.{Remux, TsCodec, TsPipeline}

class RemuxAndExtensionsSpec extends SparkSuite {

  test("pcr restamp shifts every PCR by the offset (mod 33-bit wrap)") {
    import spark.implicits._
    val pkts = TsPipeline.packets(spark).filter(_.af.exists(_.pcr.isDefined))
      .limit(50)
    val before = pkts.collect().map(p => p.seq -> p.af.get.pcr.get).toMap
    val after = Remux.pcrRestamp(pkts, 27000000L).collect()
    assert(after.nonEmpty)
    after.foreach { p =>
      assert(p.af.get.pcr.get ==
        (before(p.seq) + 27000000L) % ((1L << 33) * 300L))
    }
  }

  test("cbr plan tops every bucket up to the target rate") {
    val target = 400000L // 2x the capture's ~200 kbps
    val plan = Remux.cbrPlan(TsPipeline.packets(spark), target).collect()
    val perSec = (target / 8 / TsCodec.PacketSize).toInt
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val n = r.getAs[Long]("n_packets")
      val s = r.getAs[Long]("n_stuffing")
      assert(s == math.max(0L, perSec - n))
    }
    // materialized output parses and null-PID stuffing is present
    val out = Remux.cbrStuff(spark, TsPipeline.packets(spark), target)
    val decoded = out.limit(100000).collect().map(r =>
      TsCodec.decode(r.getAs[Array[Byte]]("bytes"), 0L).get)
    assert(decoded.exists(_.pid == TsCodec.NullPid))
    assert(decoded.forall(p => p.pid <= TsCodec.MaxPid))
  }

  test("partitioned cbr fill == global-window reference; plan has no " +
      "unpartitioned window") {
    import org.apache.spark.sql.expressions.{Window => W}
    // reference semantics: one global seq-ordered last-fill per stream
    def reference(tl: org.apache.spark.sql.DataFrame) = tl
      .withColumn("bucket",
        last(col("pcr_sec"), ignoreNulls = true).over(
          W.partitionBy("stream_id").orderBy("seq")
            .rowsBetween(W.unboundedPreceding, W.currentRow)))
      .filter(col("bucket").isNotNull)
      .groupBy("stream_id", "bucket")
      .agg(count(lit(1)).as("n_packets"))
    // capture timeline (single stream)
    val cap = TsPipeline.packets(spark).toDF().select(
      lit(0L).as("stream_id"), col("seq"),
      (col("af.pcr") / Remux.TicksPerSec).cast("long").as("pcr_sec"))
    // synthetic 3-stream timeline with sparse PCRs and leading gaps
    import spark.implicits._
    val synth = (0 until 3).flatMap { sid =>
      (0L until 5000L).map { i =>
        val pcr = if (i % 37 == sid * 5 + 7)
          Some(i * 27000000L / 50) else None
        (sid.toLong, i, pcr)
      }
    }.toDF("stream_id", "seq", "pcr_sec")
    for (tl <- Seq(cap, synth)) {
      val got = Remux.cbrPlanStreams(tl, 400000L)
        .select("stream_id", "bucket", "n_packets")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val want = reference(tl)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == want)
    }
    // the scalability property itself: no Window without a partitionSpec
    // anywhere in the optimized plan
    val plan = Remux.cbrPlan(TsPipeline.packets(spark), 400000L)
      .queryExecution.optimizedPlan
    val globals = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty, "cbrPlan still contains a global window")
  }

  test("GraftExtensions registers SQL functions on a fresh session") {
    val prior = spark // ensure shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val crc = s2.sql(
        "SELECT crc32_mpeg2(cast('123456789' as binary)) AS c")
        .first().getLong(0)
      assert(crc == 0x0376E6E7L)
      val dot = s2.sql(
        "SELECT vec_dot(array(cast(1.0 as double), cast(2.0 as double))," +
          " array(cast(3.0 as double), cast(4.0 as double))) AS d")
        .first().getDouble(0)
      assert(dot == 11.0)
      val sh = s2.sql(
        "SELECT simhash(array(7L, 7L, 7L), 8) AS s").first().getLong(0)
      assert(sh == 7L) // unanimous bit votes reproduce the input
      val hp = s2.sql(
        "SELECT hyperplane_sig(array(cast(1.0 as float)," +
          " cast(-1.0 as float)), 12) AS b").first().getInt(0)
      assert(hp >= 0 && hp < (1 << 12))
      // bloom build + probe end-to-end in SQL: members hit, a
      // non-member (overwhelmingly) misses at this sizing
      s2.range(100).selectExpr("xxhash64(id) AS h")
        .createOrReplaceTempView("bloom_in")
      val hits = s2.sql(
        """SELECT sum(CASE WHEN bloom_might_contain(
          |  (SELECT bloom_agg(h, 100L, 8192L) FROM bloom_in), h)
          |  THEN 1 ELSE 0 END) AS n
          |FROM bloom_in""".stripMargin).first().getLong(0)
      assert(hits == 100L) // no false negatives, ever
      val miss = s2.sql(
        """SELECT bloom_might_contain(
          |  (SELECT bloom_agg(h, 100L, 8192L) FROM bloom_in),
          |  xxhash64(987654321098765432L)) AS m""".stripMargin)
        .first().getBoolean(0)
      assert(!miss)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
