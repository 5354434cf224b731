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
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }
}
