package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage CPU/time accounting for one query — the "which stage burns
  * the CPU" lens TimeOne lacks. Usage:
  * runMain graft.DiagStages <sfDir> <name> [reps]. Prints, per stage:
  * tasks, executorRunTime, executorCpuTime, shuffle read/write bytes,
  * and the stage name (callsite). Reps > 1 show the warm profile.
  */
object DiagStages {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
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
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val tm = si.taskMetrics
        if (tm != null) rows.add(
          f"stage ${si.stageId}%4d tasks ${si.numTasks}%4d " +
            f"run ${tm.executorRunTime / 1e3}%8.2f s " +
            f"cpu ${tm.executorCpuTime / 1e9}%8.2f s " +
            f"gc ${tm.jvmGCTime / 1e3}%6.2f s " +
            f"sr ${tm.shuffleReadMetrics.totalBytesRead / 1e6}%8.1f MB " +
            f"sw ${tm.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f MB " +
            f"| ${si.name.take(90)}")
      }
    }
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      if (i == reps) spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[diag] $name rep $i: wall ${(System.nanoTime() - t0) / 1e9}%.3f s rows $n")
    }
    // drain the listener bus DETERMINISTICALLY — a fixed sleep could
    // truncate per-stage rows for slow-finishing stages (round-9
    // advice); ListenerBus.waitUntilEmpty is test-visible API, reached
    // via reflection because it is package-private to o.a.spark
    try {
      val m = spark.sparkContext.getClass.getMethods
        .find(_.getName == "listenerBus").get
      val bus = m.invoke(spark.sparkContext)
      bus.getClass.getMethods.find(m =>
          m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .orElse(bus.getClass.getMethods.find(m =>
          m.getName == "waitUntilEmpty" && m.getParameterCount == 1))
        .foreach { wm =>
          if (wm.getParameterCount == 0) wm.invoke(bus)
          else wm.invoke(bus, java.lang.Long.valueOf(10000L))
        }
    } catch { case _: Throwable => Thread.sleep(1000) }
    rows.forEach(println)
    spark.stop()
  }
}
