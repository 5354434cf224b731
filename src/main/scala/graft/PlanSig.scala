package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan shape signatures for every declared query: the
  * regression net that catches a broadcast silently flipping to a
  * sort-merge join, a lost partial aggregate, or an extra exchange —
  * the plan properties a 100× scale-up depends on — without pinning
  * volatile details (expr ids, statistics, AQE runtime state).
  *
  * A signature is the multiset of physical node names of the
  * PRE-ADAPTIVE plan (`queryExecution.sparkPlan`) at sf0.001 under the
  * test-session conf — deterministic for a fixed Spark version and
  * fixed test data. `runMain graft.PlanSig` regenerates
  * `PLAN_SIGS.json` after an INTENTIONAL plan change;
  * `PlanSigSpec` diffs current plans against the committed file. */
object PlanSig {
  val SigFile = "PLAN_SIGS.json"
  val SfDir = "/root/testdata/sf0.001"

  def signature(df: DataFrame): String = {
    val counts = scala.collection.mutable.TreeMap[String, Int]()
    def walk(p: SparkPlan): Unit = {
      val n = p.nodeName.trim
      counts.update(n, counts.getOrElse(n, 0) + 1)
      p.children.foreach(walk)
    }
    walk(df.queryExecution.sparkPlan)
    counts.map { case (k, v) => s"$k:$v" }.mkString("|")
  }

  /** Current signatures for every query, sorted by name. Queries whose
    * builders are iterative (driver-side fixpoint loops) still yield a
    * deterministic FINAL plan, which is what gets signed. */
  def all(spark: SparkSession): Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> signature(fn(spark, SfDir))
    }

  def render(sigs: Seq[(String, String)]): String =
    sigs.map { case (k, v) => s"""  "$k": "$v"""" }
      .mkString("{\n", ",\n", "\n}\n")

  def parse(json: String): Map[String, String] =
    """"([^"]+)":\s*"([^"]*)"""".r
      .findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2)).toMap

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = render(all(spark))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(SigFile), out.getBytes("UTF-8"))
    println(s"wrote ${SparkEntry.queries.size} signatures to $SigFile")
    spark.stop()
  }
}
