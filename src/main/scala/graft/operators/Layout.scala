package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** l2 — COMPACTION PLANNER: the small-files half of `OPTIMIZE`.
    * Documents are packed into target-sized output files per source
    * partition by prefix-sum byte accounting: a doc's file is
    * `floor(bytes_before_it / target)` in (source, doc_id) order —
    * the deterministic greedy packing a table optimizer applies to a
    * directory of small files. The prefix sum is TWO-LEVEL (per-chunk
    * local sums + chunk offsets joined back), the k5 partitioned
    * prefix-sum discipline, so no per-source window ever holds a
    * whole 100 TB partition in one task; the chunk-offset relation is
    * docs/64 rows and recurses the same way at the next scale. Output
    * is the compaction manifest: per planned file, its doc count,
    * byte size and doc-id range. Integer-exact; the oracle re-derives
    * the packing with a SINGLE direct window, so the hash match
    * proves two-level ≡ direct prefix sum. */
  def l2Compaction(s: SparkSession, d: String): DataFrame = {
    val target = 2048L // bytes per planned file (PLANS.md: scaled const)
    val docs = graft.Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        octet_length(col("text")).cast("long").as("bytes"),
        expr("doc_id div 64").as("chunk"))
    val localW = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "chunk").orderBy("doc_id")
      .rowsBetween(Long.MinValue, -1)
    val chunkW = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("chunk")
      .rowsBetween(Long.MinValue, -1)
    val offsets = docs.groupBy("source", "chunk")
      .agg(sum(col("bytes")).as("ctot"))
      .withColumn("coff", coalesce(sum(col("ctot")).over(chunkW), lit(0L)))
      .select("source", "chunk", "coff")
    docs
      .withColumn("lprev",
        coalesce(sum(col("bytes")).over(localW), lit(0L)))
      .join(offsets, Seq("source", "chunk"))
      .withColumn("file_id", expr(s"(coff + lprev) div $target"))
      .groupBy("source", "file_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("bytes")).as("bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }

  /** l3 — LAYOUT A/B SKIP AUDIT: the quantified WIN of l1's z-order.
    * The same probe predicate (l_partkey ∈ [500, 599]) is evaluated
    * against per-file min/max envelopes under TWO layouts — z-prefix
    * buckets vs the natural insert-order grain (l_orderkey ranges) —
    * and the report is one row of skip rates. This is the number a
    * table optimizer shows to justify an OPTIMIZE ZORDER rewrite: on
    * the clustered layout most envelopes exclude the probe; on
    * insert order the partkey envelope spans the domain and nothing
    * skips. Pure integer bucket math on both engines. */
  def l3LayoutAb(s: SparkSession, d: String): DataFrame = {
    val li = graft.Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_orderkey"),
        zval(col("l_partkey"), col("l_suppkey")).as("z"))
    def audit(bucket: org.apache.spark.sql.Column, name: String) =
      li.groupBy(bucket.as("bucket"))
        .agg(min("l_partkey").as("min_p"), max("l_partkey").as("max_p"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(when(col("max_p") < 500 || col("min_p") > 599, 1L)
            .otherwise(0L)).as("n_skipped"))
        .select(lit(name).as("layout"), col("n_buckets"),
          col("n_skipped"),
          expr("n_skipped * 1000000 div n_buckets").as("skip_ppm"))
    audit(expr("z div 16384"), "zorder")
      .unionByName(audit(expr("l_orderkey div 2048"), "natural"))
  }

  /** l4 — CLUSTERING-DEPTH METRIC: l3 scores one probe predicate;
    * this scores the LAYOUT itself — the expected number of file
    * envelopes a random partkey point-query must open, i.e.
    * Σ envelope_width / key_domain (the overlap/clustering-depth
    * statistic Iceberg/Delta print after OPTIMIZE to justify the
    * rewrite). On the z-ordered grain the envelopes tile the domain
    * almost disjointly (depth → small); on insert order every
    * envelope spans most of the domain (depth → n_buckets). Pure
    * integer width accounting, bit-exact across engines. */
  def l4ClusterDepth(s: SparkSession, d: String): DataFrame = {
    val li = graft.Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_orderkey"),
        zval(col("l_partkey"), col("l_suppkey")).as("z"))
    val dom = li.agg((max(col("l_partkey")) - min(col("l_partkey")) + 1)
      .as("key_domain"))
    def audit(bucket: Column, name: String) =
      li.groupBy(bucket.as("bucket"))
        .agg(min("l_partkey").as("min_p"), max("l_partkey").as("max_p"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(col("max_p") - col("min_p") + 1).as("total_width"))
        .crossJoin(broadcast(dom))
        .select(lit(name).as("layout"), col("n_buckets"),
          col("total_width"), col("key_domain"),
          expr("total_width * 1000 div key_domain")
            .as("depth_milli"))
    audit(expr("z div 16384"), "zorder")
      .unionByName(audit(expr("l_orderkey div 2048"), "natural"))
  }

  /** Hilbert index of the 16-bit pair (x, y) — the textbook xy→d
    * conversion (Hamilton's curve; the public-domain per-level
    * rotate/reflect recipe) unrolled into 16 chained projections of
    * integer CASE arithmetic, so the whole derivation runs in
    * whole-stage codegen. Chained `withColumn`s keep the expression
    * tree LINEAR: each level reads the previous level's named columns
    * (CollapseProject does not inline multiply-referenced non-cheap
    * CASEs), where a single nested Column expression would double in
    * size per level. */
  private[graft] def withHilbert(df: DataFrame, xn: String, yn: String,
      out: String): DataFrame = {
    var cur = df
      .withColumn("hx", col(xn).bitwiseAND(lit(65535L)))
      .withColumn("hy", col(yn).bitwiseAND(lit(65535L)))
      .withColumn(out, lit(0L))
    var s = 32768L
    while (s >= 1L) {
      val rx = col("hx").bitwiseAND(lit(s)) > 0
      val ry = col("hy").bitwiseAND(lit(s)) > 0
      cur = cur
        .withColumn(out, col(out) + lit(s * s) *
          when(rx && ry, 2L).when(rx, 3L).when(ry, 1L).otherwise(0L))
        .withColumn("hnx",
          when(!ry && rx, lit(65535L) - col("hy"))
            .when(!ry, col("hy")).otherwise(col("hx")))
        .withColumn("hny",
          when(!ry && rx, lit(65535L) - col("hx"))
            .when(!ry, col("hx")).otherwise(col("hy")))
        .withColumn("hx", col("hnx"))
        .withColumn("hy", col("hny"))
      s /= 2L
    }
    cur.drop("hnx", "hny", "hx", "hy")
  }

  /** l6 — HILBERT vs Z-ORDER A/B. Two measurements per layout:
    * (1) the l4 envelope audit at an aligned file grain — included to
    * DOCUMENT that it ties: any quadrant-recursive curve's aligned
    * 4096-position block is the same subsquare, so aligned-block
    * envelopes cannot distinguish the curves; (2) the measurement that
    * CAN — range-query clustering (Moon et al., the published Hilbert
    * advantage): for a rectangular probe, the number of contiguous
    * curve-index runs a scan must seek across. Hilbert's
    * no-diagonal-jump walk needs fewer runs than Morton's Z jumps.
    * The run count sorts only the probe region's distinct curve
    * positions (value-grid bounded — region area, not corpus rows).
    * Everything is integer bit arithmetic; the oracle re-derives the
    * full 16-level rotate/reflect chain in SQL. */
  def l6HilbertAb(s: SparkSession, d: String): DataFrame = {
    val li = graft.Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"),
        zval(col("l_partkey"), col("l_suppkey")).as("z"))
    val h = withHilbert(li, "l_partkey", "l_suppkey", "hv")
    val dom = li.agg(
      (max(col("l_partkey")) - min(col("l_partkey")) + 1)
        .as("part_domain"),
      (max(col("l_suppkey")) - min(col("l_suppkey")) + 1)
        .as("supp_domain"))
    // both dimensions' envelopes: at a grain where dim-1 buckets are
    // already tight on either curve, the SECOND dimension's envelope
    // width is where Hilbert's no-diagonal-jumps locality shows
    def audit(df: DataFrame, bucket: Column, name: String) =
      df.groupBy(bucket.as("bucket"))
        .agg(min("l_partkey").as("min_p"), max("l_partkey").as("max_p"),
          min("l_suppkey").as("min_s"), max("l_suppkey").as("max_s"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(col("max_p") - col("min_p") + 1).as("width_part"),
          sum(col("max_s") - col("min_s") + 1).as("width_supp"))
        .crossJoin(broadcast(dom))
        .select(lit(name).as("layout"), col("n_buckets"),
          col("width_part"), col("width_supp"),
          col("part_domain"), col("supp_domain"),
          expr("width_part * 1000 div part_domain")
            .as("depth_part_milli"),
          expr("width_supp * 1000 div supp_domain")
            .as("depth_supp_milli"))
    def runs(df: DataFrame, idx: Column, name: String) = {
      val cells = df
        .filter(col("l_partkey").between(50, 149) &&
          col("l_suppkey").between(2, 7))
        .select(idx.as("v")).distinct()
      val w = Window.orderBy("v")
      cells.withColumn("jump",
          when(col("v") - lag(col("v"), 1).over(w) > 1, 1L)
            .otherwise(0L))
        .agg(count(lit(1)).as("n_cells"), sum(col("jump")).as("j"))
        .select(lit(name).as("layout"), col("n_cells"),
          when(col("n_cells") === 0, 0L).otherwise(col("j") + 1)
            .as("n_runs"))
    }
    audit(h, expr("hv div 4096"), "hilbert")
      .join(runs(h, col("hv"), "hilbert"), Seq("layout"))
      .unionByName(
        audit(li, expr("z div 4096"), "zorder")
          .join(runs(li, col("z"), "zorder"), Seq("layout")))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "l1_zorder" -> l1Zorder _,
    "l2_compaction" -> l2Compaction _,
    "l3_layout_ab" -> l3LayoutAb _,
    "l4_cluster_depth" -> l4ClusterDepth _,
    "l5_bucketed_join" -> Bucketing.l5BucketedJoin _,
    "l6_hilbert_ab" -> l6HilbertAb _)
}
