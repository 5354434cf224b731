package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned) storage for shuffle-free co-located joins —
  * the 100 TB path for the engine's recurring fact⋈fact joins
  * (lineitem⋈orders here; the reference's analog is its PID-indexed
  * processor arrays, `mpeg2_sp.c:410-423`: data pre-placed by key so
  * lookup needs no redistribution).
  *
  * Writing both sides bucketed by the join key into the session catalog
  * lets Catalyst plan a SortMergeJoin with NO Exchange on either side:
  * at cluster scale that removes the two largest shuffles of the
  * pipeline entirely — each task joins bucket i of A against bucket i
  * of B straight off storage. Re-used across every downstream query that
  * joins or aggregates on the same key (bucket pruning + partial-agg
  * reuse).
  */
object Bucketing {

  /** Write `df` bucketed by `keyCol` into the session catalog as
    * `table` (sorted within buckets, so SMJ needs no sort either). */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans with zero
    * Exchange when both sides share the bucket count. The join condition
    * binds the two Dataset instances being joined (building it from
    * fresh `spark.table` calls only resolves while the catalog's
    * relation cache returns identical attribute ids — fragile across a
    * REFRESH TABLE). */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  private val bucketedWritten =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  /** Write-once bucketed layout of (lineitem, orders) on the join key
    * — the batch LAYOUT job; l5 measures the co-located JOIN that
    * reads it (the build ≠ serve split ivfIndexPath follows). Only
    * the columns the join consumes are written — at 100 TB the
    * bucketed copy is a projection, not a second corpus. Keyed by an
    * MD5 of the data-dir string (the ivfIndexPath discipline). */
  private[graft] def bucketedTables(s: SparkSession, d: String)
      : (String, String) =
    bucketedWritten.computeIfAbsent(
      System.identityHashCode(s) + "#" + d, { _ =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .take(12)
      val (liT, orT) = (s"li_bkt_$md5", s"or_bkt_$md5")
      // a previous JVM leaves the warehouse DIRECTORY without the
      // catalog entry — saveAsTable then refuses the location; drop
      // both forms before the write so the build is idempotent
      def reset(t: String): Unit = {
        s.sql(s"DROP TABLE IF EXISTS $t")
        val wh = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), t)
        val fs = wh.getFileSystem(
          s.sparkContext.hadoopConfiguration)
        if (fs.exists(wh)) fs.delete(wh, true)
      }
      reset(liT); reset(orT)
      writeBucketed(graft.Tables.lineitem(s, d)
        .select("l_orderkey", "l_extendedprice"), liT, "l_orderkey", 16)
      writeBucketed(graft.Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority"), orT, "o_orderkey", 16)
      (liT, orT)
    })

  /** l5 — CO-LOCATED FACT⋈FACT JOIN off the bucketed layout: revenue
    * by order priority where the lineitem⋈orders join runs with ZERO
    * exchange on either side (bucket i ⋈ bucket i straight off
    * storage, pre-sorted so SMJ needs no sort either) — the committed
    * plan signature pins the exchange-free shape, so a regression
    * that re-introduces the two corpus shuffles fails PlanSigSpec.
    * The only exchange left in the plan is the 5-row priority rollup.
    * The oracle runs the SAME join over the RAW parquet — values are
    * layout-independent, which is exactly the point. */
  def l5BucketedJoin(s: SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val (liT, orT) = bucketedTables(s, d)
    val l = s.table(liT)
    // MERGE pin: at tiny oracle SFs the stats would broadcast the
    // orders side, which hides exactly the property this query
    // exists to pin (and at 100 TB neither side broadcasts anyway);
    // with the pin, both bucketed sides sort-merge with NO exchange
    // and NO sort — the committed signature proves it
    val r = s.table(orT).hint("MERGE")
    l.join(r, l("l_orderkey") === r("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)"))
          .as("rev_cents"))
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketing is meant to buy. AQE (on by default) wraps
    * the plan in AdaptiveSparkPlanExec, a LEAF node whose children a
    * plain traversal never sees — unwrap it (and materialized query
    * stages) recursively, or the check is vacuously true. */
  def shuffleFree(df: DataFrame): Boolean =
    !hasShuffle(df.queryExecution.executedPlan)

  private def hasShuffle(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean =
    p.exists {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
        true
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        hasShuffle(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        hasShuffle(q.plan)
      case _ => false
    }
}
