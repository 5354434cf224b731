package graft

import org.apache.spark.sql.SparkSession

/** Time a single query from [[SparkEntry.queries]] under the Bench
  * session config — the per-query tuning loop without the full sweep.
  * Usage: runMain graft.TimeOne <sfDir> <name> [reps]. Prints one
  * line per rep: wall + process-CPU seconds (rep 1 includes any
  * session warm-up the sweep would amortize; later reps are the
  * steady state).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[timeone] $name rep $i: " +
        f"wall ${(System.nanoTime() - t0) / 1e9}%.3f s  " +
        f"cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%.2f s  " +
        f"rows $n")
    }
    spark.stop()
  }
}
