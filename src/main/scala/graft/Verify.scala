package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional third arg: comma-separated query-name filter for fast
    // local iteration (the driver always passes exactly two args)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // a clean run must not inherit a previous run's failure marker
    Files.deleteIfExists(Paths.get(s"$outDir/_FAILED.txt"))
    // Dump failures must be LOUD: a silently-missing artifact shows up
    // downstream as a mystery "No files found" oracle row (round-5
    // w13/w16). Record every failure with its full stack in
    // $outDir/_FAILED.txt so one glance pinpoints the crash site.
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    def loud(tag: String)(body: => Unit): Unit =
      try body
      catch { case e: Throwable =>
        val sw = new java.io.StringWriter()
        e.printStackTrace(new java.io.PrintWriter(sw))
        System.err.println(s"[verify] $tag FAILED: ${e.getMessage}")
        failures += s"== $tag ==\n$sw"
      }
    // materialize the decoded TS layers the ts-family oracles read
    loud("tsdump")(graft.ts.TsLake.ensureDumped(spark))
    // …and the engine-specific artifacts (simhash signatures, LSH
    // buckets, trained centroids, HLL estimates) their oracles read
    loud("opdump")(OpLake.ensureDumped(spark, sfDir))
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name))
        loud(name)(fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name"))
    }
    if (failures.nonEmpty) {
      Files.writeString(Paths.get(s"$outDir/_FAILED.txt"),
        failures.mkString("\n"))
      System.err.println(
        s"[verify] ${failures.size} dump(s) FAILED — see $outDir/_FAILED.txt")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    SessionMemo.clearAll()
    spark.stop()
  }
}
