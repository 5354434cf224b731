package graft

import org.apache.spark.sql.SparkSession

/** Hotspot diagnostics: times the named queries (default: all, in bench
  * order) in one bench-shaped session, printing per-query seconds and row
  * counts. Pass a query name twice to see warm-cache cost. Usage:
  * runMain graft.Profile <sfDir> [names...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val catalog = SparkEntry.queries ++ graft.operators.TextOps.diag ++
      graft.operators.Similarity.diag ++ graft.operators.Graph.diag ++
      graft.operators.Relational.diag ++ graft.operators.Skew.diag ++
      graft.operators.Multimodal.diag
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // extra conf via SPARK_GRAFT_CONF="k=v;k=v" for A/B plan experiments
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => builder.config(k.trim, v.trim)
        case _ => ()
      }
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // SPARK_GRAFT_SHOW=1 prints the first rows instead of just the
    // count — for diag probes whose payload IS a one-row aggregate
    val show = sys.env.get("SPARK_GRAFT_SHOW").contains("1")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows =
        try {
          val df = catalog(n)(spark, sfDir)
          if (show) { df.show(20, truncate = false); df.count() }
          else df.count()
        } catch { case e: Throwable => println(s"$n FAILED: $e"); -1L }
      println(f"PROFILE $n%-22s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$rows")
    }
    spark.stop()
  }
}
