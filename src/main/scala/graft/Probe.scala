package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc hotspot probe: times individual queries (twice each — cold and
  * warm) after the same warmup Bench does. Not part of the driver
  * surface; `runMain graft.Probe q1 q2 ...`. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      SparkEntry.entry(spark).count()
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
        .foreach(t => Tables.load(spark, sfDir, t).count())
      Tables.events(spark, sfDir).count()
      graft.ts.TsLake.sections(spark).count()
    } catch { case e: Throwable => println(s"[probe] warmup: $e") }
    // the diag (z-probe) maps are probeable too — scale stresses are
    // exactly what this tool exists to time
    val qs = SparkEntry.queries ++
      graft.operators.TextOps.diag ++ graft.operators.Relational.diag ++
      graft.operators.Graph.diag ++ graft.operators.Multimodal.diag ++
      graft.operators.Similarity.diag ++ graft.operators.Skew.diag
    args.foreach { name =>
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        try {
          val df = qs(name)(spark, sfDir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan // force analysis + physical plan
          val t2 = System.nanoTime()
          val n = df.count()
          val t3 = System.nanoTime()
          println(f"[probe] $name pass$pass build=${(t1 - t0) / 1e9}%.2f " +
            f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f " +
            f"($n rows)")
        } catch { case e: Throwable => println(s"[probe] $name: $e") }
      }
    }
    spark.stop()
  }
}
