package graft.stats

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Real system-stats samplers (SURVEY §2.7 A3/A4 sources): the
  * reference's CPU and NIC gauges read `/proc/stat` and `/proc/net/dev`
  * on a timer (`stats/src/proc_stat_cpu.c:75-140`,
  * `proc_net_dev.c`-style field split). The sampling runs EXECUTOR-side
  * inside `mapPartitions`, fanned out as one task per parallelism slot
  * and deduplicated to one sample per host — so on a cluster every
  * executor host that receives a task reports its own gauges (the host
  * column carries the origin); local mode samples this machine once.
  * Downstream, the samples feed the same windowed-aggregation shapes as
  * `a3_tumbling_window` / `a4_sliding_window`.
  */
object ProcStats {

  /** One `/proc/stat` cpu line (jiffies since boot). */
  case class CpuTimes(cpu: String, user: Long, nice: Long, system: Long,
      idle: Long, iowait: Long, irq: Long, softirq: Long) {
    def busy: Long = user + nice + system + irq + softirq
    def total: Long = busy + idle + iowait
  }

  def parseCpu(text: String): Seq[CpuTimes] =
    text.linesIterator
      .filter(_.startsWith("cpu"))
      .map { l =>
        val p = l.trim.split("\\s+")
        def at(i: Int) = if (p.length > i) p(i).toLong else 0L
        CpuTimes(p(0), at(1), at(2), at(3), at(4), at(5), at(6), at(7))
      }
      .toSeq

  /** One `/proc/net/dev` interface line (cumulative byte counters). */
  case class NetDev(iface: String, rxBytes: Long, txBytes: Long)

  def parseNet(text: String): Seq[NetDev] =
    text.linesIterator.drop(2).flatMap { l =>
      val p = l.trim.split("[:\\s]+")
      // fields: iface rx_bytes rx_pkts ... (8 rx cols) tx_bytes ...
      if (p.length >= 10 && p(1).forall(_.isDigit))
        Some(NetDev(p(0), p(1).toLong, p(9).toLong))
      else None
    }.toSeq

  private def read(path: String): String =
    Files.readString(Paths.get(path))

  def readCpu(): Seq[CpuTimes] = parseCpu(read("/proc/stat"))
  def readNet(): Seq[NetDev] = parseNet(read("/proc/net/dev"))

  /** Utilization from two samples — the reference's delta-busy over
    * delta-total (`proc_stat_cpu.c:118-140`). */
  def busyPct(a: CpuTimes, b: CpuTimes): Double =
    100.0 * (b.busy - a.busy).toDouble /
      math.max(1L, b.total - a.total).toDouble

  /** One task per parallelism slot — the fan-out that puts at least one
    * sampling task on every executor that holds slots; tasks landing on
    * the same host produce duplicate samples, removed downstream by a
    * per-host dedup. */
  private def fanout(spark: SparkSession) = {
    val n = math.max(1, spark.sparkContext.defaultParallelism)
    spark.range(n.toLong).repartition(n)
  }

  /** A3 live gauge: per-(host, cpu) busy% over a `intervalMs` window. */
  def cpuGauges(spark: SparkSession, intervalMs: Int = 100): DataFrame = {
    import spark.implicits._
    fanout(spark).mapPartitions { _ =>
      val host = java.net.InetAddress.getLocalHost.getHostName
      val a = readCpu()
      Thread.sleep(intervalMs.toLong)
      val b = readCpu()
      val byCpu = b.map(t => t.cpu -> t).toMap
      a.iterator.flatMap(x =>
        byCpu.get(x.cpu).map(y => (host, x.cpu, busyPct(x, y))))
    }.toDF("host", "cpu", "busy_pct")
      .dropDuplicates("host", "cpu")
  }

  /** A4 live gauge: per-(host, iface) rx/tx bits-per-second over a
    * `intervalMs` window. */
  def netGauges(spark: SparkSession, intervalMs: Int = 100): DataFrame = {
    import spark.implicits._
    fanout(spark).mapPartitions { _ =>
      val host = java.net.InetAddress.getLocalHost.getHostName
      val a = readNet()
      Thread.sleep(intervalMs.toLong)
      val b = readNet()
      val byIf = b.map(t => t.iface -> t).toMap
      val secs = intervalMs / 1000.0
      a.iterator.flatMap(x => byIf.get(x.iface).map { y =>
        (host, x.iface,
          8.0 * (y.rxBytes - x.rxBytes).toDouble / secs,
          8.0 * (y.txBytes - x.txBytes).toDouble / secs)
      })
    }.toDF("host", "iface", "rx_bps", "tx_bps")
      .dropDuplicates("host", "iface")
  }
}
