package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering and the
  * data-skipping statistics it buys — what Delta/Iceberg `OPTIMIZE
  * ZORDER BY` does for selective scans over two correlated filter
  * columns. At 100 TB the win is structural: rewriting files in
  * z-value order makes per-file min/max ranges TIGHT on every
  * interleaved dimension at once, so a predicate on either column
  * prunes most files at planning time instead of scanning them.
  *
  * Everything here is integer bit arithmetic (shift/mask interleave),
  * so the DuckDB oracle re-derives the exact same z-values, bucket
  * stats and skip decisions bit-for-bit. The bucket id is a fixed
  * z-prefix (`z >> 14`), not a sampled range split — deterministic
  * regardless of partition count or data order.
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions — the
    * classic Morton magic-number ladder; codegen-friendly (pure
    * shift/and/or column math, no UDF). */
  private[graft] def spread16(x: Column): Column = {
    val a = bitwise_and(x.bitwiseOR(shiftleft(x, 8)), lit(0x00FF00FFL))
    val b = bitwise_and(a.bitwiseOR(shiftleft(a, 4)), lit(0x0F0F0F0FL))
    val c = bitwise_and(b.bitwiseOR(shiftleft(b, 2)), lit(0x33333333L))
    bitwise_and(c.bitwiseOR(shiftleft(c, 1)), lit(0x55555555L))
  }

  private def bitwise_and(l: Column, r: Column): Column = l.bitwiseAND(r)

  /** z-value of (l_partkey, l_suppkey): bit-interleaved 16+16. */
  private[graft] def zval(part: Column, supp: Column): Column =
    spread16(part.bitwiseAND(lit(0xFFFFL)))
      .bitwiseOR(shiftleft(spread16(supp.bitwiseAND(lit(0xFFFFL))), 1))

  /** l1 — Z-order layout audit on lineitem(l_partkey, l_suppkey):
    * cluster rows by z-prefix bucket (the file grain a table
    * optimizer would write), then report per-bucket min/max envelopes
    * on BOTH dimensions plus whether a representative probe predicate
    * (l_partkey in [500, 599]) could skip the bucket entirely. The
    * share of skippable buckets is the layout's pruning power — on a
    * z-ordered layout both envelopes are tight; on insert order the
    * partkey envelope would span the domain and nothing skips. */
  def l1Zorder(s: SparkSession, d: String): DataFrame =
    graft.Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        zval(col("l_partkey"), col("l_suppkey")).as("z"))
      .withColumn("bucket", expr("z div 16384")) // z >> 14: file grain
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"),
        min("l_suppkey").as("min_supp"), max("l_suppkey").as("max_supp"))
      .withColumn("skips_probe",
        col("max_part") < 500 || col("min_part") > 599)

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l1_zorder" -> l1Zorder _)
}
