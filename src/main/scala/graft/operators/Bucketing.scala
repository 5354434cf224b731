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
