package graft

import org.apache.spark.sql.SparkSession

/** Time one or more queries from [[SparkEntry.queries]] under the Bench
  * session config — the per-query tuning loop without the full sweep.
  * Usage: runMain graft.TimeOne <sfDir> <name>[,<name>...] [reps].
  * Prints one line per (query, rep): wall + process-CPU seconds (rep 1
  * includes any session warm-up the sweep would amortize; later reps
  * are the steady state). Extra session conf via
  * SPARK_GRAFT_CONF="k=v;k=v" for A/B experiments (Profile's idiom).
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => builder.config(k.trim, v.trim)
        case _ => ()
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    names.foreach { name =>
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
    }
    spark.stop()
  }
}
