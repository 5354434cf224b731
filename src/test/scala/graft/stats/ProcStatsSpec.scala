package graft.stats

import graft.SparkSuite

/** A3/A4 real samplers: deterministic parse/delta tests on fixture text
  * plus a live smoke read of this host's /proc. */
class ProcStatsSpec extends SparkSuite {

  private val statFixtureA =
    """cpu  100 10 50 1000 20 5 15 0 0 0
      |cpu0 40 5 20 400 10 2 8 0 0 0
      |cpu1 60 5 30 600 10 3 7 0 0 0
      |intr 12345
      |ctxt 999""".stripMargin
  private val statFixtureB =
    """cpu  160 10 80 1100 30 5 25 0 0 0
      |cpu0 70 5 35 450 15 2 13 0 0 0
      |cpu1 90 5 45 650 15 3 12 0 0 0
      |intr 12400
      |ctxt 1200""".stripMargin

  test("cpu parse + delta utilization matches hand computation") {
    val a = ProcStats.parseCpu(statFixtureA)
    val b = ProcStats.parseCpu(statFixtureB)
    assert(a.map(_.cpu) == Seq("cpu", "cpu0", "cpu1"))
    val agg = a.head
    assert(agg.busy == 100 + 10 + 50 + 5 + 15)
    assert(agg.total == agg.busy + 1000 + 20)
    // deltas: busy 180->280 (+100), total 1200->1410 (+210)
    val pct = ProcStats.busyPct(a.head, b.head)
    assert(math.abs(pct - 100.0 * 100 / 210) < 1e-9)
  }

  test("net parse extracts rx/tx byte counters") {
    val fixture =
      """Inter-|   Receive                                                |  Transmit
        | face |bytes    packets errs drop fifo frame compressed multicast|bytes    packets errs drop fifo colls carrier compressed
        |    lo: 1000      10    0    0    0     0          0         0     1000      10    0    0    0     0       0          0
        |  eth0: 5000      50    0    0    0     0          0         0     7000      70    0    0    0     0       0          0""".stripMargin
    val n = ProcStats.parseNet(fixture)
    assert(n == Seq(
      ProcStats.NetDev("lo", 1000L, 1000L),
      ProcStats.NetDev("eth0", 5000L, 7000L)))
  }

  test("live gauges: /proc sampling executor-side returns sane rows") {
    val cpu = ProcStats.cpuGauges(spark, intervalMs = 50).collect()
    assert(cpu.nonEmpty)
    cpu.foreach { r =>
      val pct = r.getAs[Double]("busy_pct")
      assert(pct >= 0.0 && pct <= 100.0, s"busy_pct out of range: $pct")
      assert(r.getAs[String]("cpu").startsWith("cpu"))
    }
    val net = ProcStats.netGauges(spark, intervalMs = 50).collect()
    assert(net.nonEmpty)
    net.foreach { r =>
      assert(r.getAs[Double]("rx_bps") >= 0.0)
      assert(r.getAs[Double]("tx_bps") >= 0.0)
    }
  }
}
