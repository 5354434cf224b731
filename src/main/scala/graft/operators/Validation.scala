package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Data-quality expectations — the Deequ/Great-Expectations-style
  * constraint report every production ingest runs before promoting a
  * batch: null checks, domain-range checks, referential integrity and
  * key uniqueness, emitted as one (check, n_checked, n_violations,
  * passed) relation a gate can assert on.
  *
  * Scale design: all COLUMN checks on one table fold into a SINGLE
  * scan (one aggregate emitting one counter per check, unpivoted with
  * `stack`) — adding a check costs one conditional sum, not one pass.
  * Referential checks ride the same scan via a left join on the key
  * (shuffle on the fact's own join key; the dimension side is
  * data-scaled, so no broadcast pin). Uniqueness is a two-level
  * aggregate on the key — map-side combining, never a global window.
  * Everything is integer counting — bit-exact oracle. */
object Validation {

  /** v1 — EXPECTATIONS REPORT over the order pipeline: 7 constraints
    * across lineitem / orders in 3 scans + 1 key rollup. */
  def v1Expectations(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val o = orders(s, d)
    val c = customer(s, d)
    val liChecks = li
      .join(o.select(col("o_orderkey").as("l_orderkey"),
        lit(1).as("ok")), Seq("l_orderkey"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
          .otherwise(0L)).as("v_qty"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
          .otherwise(0L)).as("v_disc"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L))
          .as("v_null"),
        sum(when(col("ok").isNull, 1L).otherwise(0L)).as("v_orphan"))
      .select(expr(
        """stack(4,
          |  'lineitem.quantity_in_1_50',   n, v_qty,
          |  'lineitem.discount_in_0_0.1',  n, v_disc,
          |  'lineitem.shipdate_not_null',  n, v_null,
          |  'lineitem.orderkey_in_orders', n, v_orphan)
          |AS (check_name, n_checked, n_violations)""".stripMargin))
    val oChecks = o
      .join(c.select(col("c_custkey").as("o_custkey"),
        lit(1).as("ok")), Seq("o_custkey"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
          .as("v_price"),
        sum(when(col("ok").isNull, 1L).otherwise(0L)).as("v_ref"))
      .select(expr(
        """stack(2,
          |  'orders.totalprice_positive',  n, v_price,
          |  'orders.custkey_in_customer',  n, v_ref)
          |AS (check_name, n_checked, n_violations)""".stripMargin))
    val uniq = o.groupBy("o_orderkey").agg(count(lit(1)).as("cnt"))
      .agg(count(lit(1)).as("n_checked"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_violations"))
      .select(lit("orders.orderkey_unique").as("check_name"),
        col("n_checked"), col("n_violations"))
    liChecks.unionByName(oChecks).unionByName(uniq)
      .withColumn("passed", col("n_violations") === 0)
  }

  /** v2 — QUARANTINE ROWS: the write side of v1 — the offending rows
    * themselves, each with the sorted list of the checks it failed,
    * ready to divert to a quarantine table while the clean partition
    * promotes. Same single-scan discipline: every check is a boolean
    * column computed in one pass over the fact + its reference left
    * join; the reason array is a codegen'd filter over a literal
    * array of (name, flag) structs; only flagged rows survive the
    * final filter. Hard constraints never fire on clean data (the
    * spec's clean-path assertion); the soft `review_high_discount`
    * rule keeps the quarantine exercised on real data, and the
    * planted-violation path pins the hard reasons. */
  def v2Quarantine(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val o = orders(s, d)
    li.join(o.select(col("o_orderkey").as("l_orderkey"),
        lit(1).as("ok")), Seq("l_orderkey"), "left")
      .select(col("l_orderkey"), col("l_linenumber"),
        // the sorted reason list flattens to one comma-joined STRING:
        // a scalar output column every downstream (and the harness)
        // can hash/sort, with the same information content
        expr(
          """array_join(sort_array(transform(filter(array(
            |  named_struct('name', 'quantity_out_of_range',
            |    'bad', l_quantity < 1 or l_quantity > 50),
            |  named_struct('name', 'discount_out_of_range',
            |    'bad', l_discount < 0 or l_discount > 0.1),
            |  named_struct('name', 'shipdate_null',
            |    'bad', l_shipdate is null),
            |  named_struct('name', 'orphan_orderkey',
            |    'bad', ok is null),
            |  named_struct('name', 'review_high_discount',
            |    'bad', l_discount >= 0.09)), x -> x.bad), x -> x.name)),
            |  ',')""".stripMargin).as("reasons"))
      .filter(length(col("reasons")) > 0)
  }

  /** v3 — K-ANONYMITY AUDIT over the quasi-identifier pair
    * (mktsegment, nationkey): the privacy gate a training-data release
    * runs before shipping user-derived rows — any QI group smaller
    * than k re-identifies its members and must be suppressed or
    * generalized. Output is one row per QI group with its size and
    * the k=10 verdict, plus each group's share in ppm (integer-exact).
    * Scale: a single map-side-combining aggregate whose output is
    * bounded by QI-domain cardinality (|segments| × |nations|), never
    * row-scaled — the audit costs one scan at any corpus size. */
  def v3Kanonymity(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val c = customer(s, d)
    val groups = c.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("group_n"))
    val tot = groups.agg(sum(col("group_n")).as("n_total"))
    groups.crossJoin(broadcast(tot))
      .select(col("c_mktsegment"), col("c_nationkey"), col("group_n"),
        (col("group_n") >= k).as("meets_k"),
        expr("group_n * 1000000 div n_total").as("share_ppm"))
  }

  /** v4 — REFERENTIAL-INTEGRITY SWEEP of the full FK graph (the 7
    * TPC-H-ish edges): per edge, child rows and orphan rows — the
    * whole-warehouse integrity report v1 samples two edges of. Each
    * edge is the v1 discipline: left join on the child's OWN key (the
    * shuffle the child needs anyway), count nulls in one aggregate;
    * dimension-side distincts are key-scaled. Edges union into one
    * (fk_edge, n_rows, n_orphans, intact) relation a promote gate
    * asserts on. Integer counting throughout — bit-exact oracle. */
  def v4RefIntegrity(s: SparkSession, d: String): DataFrame = {
    def edge(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String): DataFrame =
      child.select(col(childKey).as("ck"))
        .join(parent.select(col(parentKey).as("ck")).distinct()
          .withColumn("ok", lit(1)), Seq("ck"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("ok").isNull, 1L).otherwise(0L)).as("n_orphans"))
        .select(lit(name).as("fk_edge"), col("n_rows"), col("n_orphans"))
    val li = lineitem(s, d)
    edge("lineitem.orderkey->orders", li, "l_orderkey",
        orders(s, d), "o_orderkey")
      .unionByName(edge("lineitem.partkey->part", li, "l_partkey",
        part(s, d), "p_partkey"))
      .unionByName(edge("lineitem.suppkey->supplier", li, "l_suppkey",
        supplier(s, d), "s_suppkey"))
      .unionByName(edge("orders.custkey->customer", orders(s, d),
        "o_custkey", customer(s, d), "c_custkey"))
      .unionByName(edge("customer.nationkey->nation", customer(s, d),
        "c_nationkey", nation(s, d), "n_nationkey"))
      .unionByName(edge("supplier.nationkey->nation", supplier(s, d),
        "s_nationkey", nation(s, d), "n_nationkey"))
      .unionByName(edge("nation.regionkey->region", nation(s, d),
        "n_regionkey", region(s, d), "r_regionkey"))
      .withColumn("intact", col("n_orphans") === 0)
  }

  /** v5 — FUNCTIONAL-DEPENDENCY AUDIT (the Metanome-style profiling
    * check, run as validation): for each declared candidate FD
    * lhs → rhs, does every lhs value map to exactly one rhs value?
    * The candidate list mixes true FDs (key FDs; the discovered
    * name → nationkey dependency, which holds because customer names
    * are unique in this corpus) with expected-false ones, so the
    * report exercises both verdicts on real data. Per candidate: one countDistinct-per-key aggregate
    * (the shuffle is on the lhs the check needs anyway; outputs are
    * key-scaled) then a one-row rollup — corpus size only affects the
    * scan. A promote gate asserts `holds` on the FDs the schema
    * declares. */
  def v5FdAudit(s: SparkSession, d: String): DataFrame = {
    def fd(name: String, df: DataFrame, lhs: String, rhs: String)
        : DataFrame =
      df.groupBy(col(lhs))
        .agg(countDistinct(col(rhs)).as("nd"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("nd") > 1, 1L).otherwise(0L))
            .as("n_violating_keys"),
          max(col("nd")).as("max_rhs_distinct"))
        .select(lit(name).as("fd"), col("n_keys"),
          col("n_violating_keys"), col("max_rhs_distinct"),
          (col("n_violating_keys") === 0).as("holds"))
    fd("customer.name->nationkey", customer(s, d),
        "c_name", "c_nationkey")
      .unionByName(fd("customer.mktsegment->nationkey",
        customer(s, d), "c_mktsegment", "c_nationkey"))
      .unionByName(fd("orders.custkey->orderpriority",
        orders(s, d), "o_custkey", "o_orderpriority"))
      .unionByName(fd("customer.custkey->nationkey",
        customer(s, d), "c_custkey", "c_nationkey"))
      .unionByName(fd("lineitem.partkey->suppkey",
        lineitem(s, d), "l_partkey", "l_suppkey"))
      .unionByName(fd("nation.nationkey->regionkey",
        nation(s, d), "n_nationkey", "n_regionkey"))
  }

  /** v6 — CATEGORICAL PROFILE DRIFT between the early and late halves
    * of the order history (split at the midpoint day of the observed
    * range — a pure integer function of min/max, no quantile pass):
    * per tracked categorical column and category, the count and share
    * ppm in each period and the signed share delta. This is the
    * schema-profile diff a governance layer alerts on ("priority mix
    * shifted 3 points since backfill") — the categorical complement to
    * a32's numeric KS drift. Shares are non-negative (plain div);
    * the delta is a subtraction of two ppm integers, never a signed
    * division, so no floor-semantics reconciliation is needed. One
    * scan of orders unpivoted into (column, category) pairs; the
    * per-column totals join is category-bounded → broadcast. */
  def v6CategoryDrift(s: SparkSession, d: String): DataFrame = {
    val base = orders(s, d).select(
      expr("unix_micros(cast(o_orderdate as timestamp)) " +
        "div 86400000000").as("day"),
      col("o_orderstatus"), col("o_orderpriority"))
    val thr = base.agg(
      expr("(min(day) + max(day)) div 2").as("thr"))
    val cat = base
      .select(col("day"), explode(array(
        struct(lit("orderstatus").as("col_name"),
          col("o_orderstatus").as("category")),
        struct(lit("orderpriority").as("col_name"),
          col("o_orderpriority").as("category")))).as("c"))
      .select(col("day"), col("c.col_name"), col("c.category"))
      .crossJoin(broadcast(thr))
      .select(col("col_name"), col("category"),
        (col("day") <= col("thr")).as("early"))
    val counts = cat.groupBy("col_name", "category")
      .agg(sum(when(col("early"), 1L).otherwise(0L)).as("n_early"),
        sum(when(!col("early"), 1L).otherwise(0L)).as("n_late"))
    val totals = counts.groupBy("col_name")
      .agg(sum(col("n_early")).as("tot_early"),
        sum(col("n_late")).as("tot_late"))
    counts.join(broadcast(totals), Seq("col_name"))
      .select(col("col_name"), col("category"),
        col("n_early"), col("n_late"),
        expr("n_early * 1000000 div tot_early").as("share_early_ppm"),
        expr("n_late * 1000000 div tot_late").as("share_late_ppm"),
        expr("n_late * 1000000 div tot_late" +
          " - n_early * 1000000 div tot_early").as("delta_ppm"))
  }

  /** v7 — ROBUST OUTLIER SCREEN over daily revenue per event type:
    * the median/MAD (median absolute deviation) gate that replaces the
    * mean/stddev z-score when the series itself may contain the
    * outliers being hunted (a single corrupt backfill day inflates a
    * stddev enough to hide itself — the classic masking failure; the
    * MAD's 50% breakdown point doesn't care). Flags days where
    * |x − median| > 3·MAD and reports per type: day count, exact
    * lower-median cents, exact MAD cents, outlier count. Both medians
    * are exact lower-median rank selections (the a45/a46 pattern —
    * row_number against (n+1) div 2), so every value is an integer
    * and the oracle agrees bit-for-bit; deviations are absolute
    * values, so no signed-division reconciliation anywhere. Two
    * windows over the calendar-bounded daily grid. */
  def v7RobustOutliers(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d).select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        (col("value").cast("decimal(18,2)") * lit(100)).cast("long")
          .as("cents"))
      .groupBy("event_type", "day").agg(sum(col("cents")).as("c"))
    val n = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    val wMed = Window.partitionBy("event_type").orderBy("c")
    val med = daily.withColumn("rk", row_number().over(wMed))
      .join(broadcast(n), Seq("event_type"))
      .filter(expr("rk = (n_days + 1) div 2"))
      .select(col("event_type"), col("c").as("median_cents"))
    val dev = daily.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("c") - col("median_cents")))
    val wMad = Window.partitionBy("event_type").orderBy("dev")
    val mad = dev.withColumn("rk", row_number().over(wMad))
      .join(broadcast(n), Seq("event_type"))
      .filter(expr("rk = (n_days + 1) div 2"))
      .select(col("event_type"), col("dev").as("mad_cents"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        max(col("median_cents")).as("median_cents"),
        max(col("mad_cents")).as("mad_cents"),
        sum(when(col("dev") > lit(3) * col("mad_cents"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** v8 — PII AUDIT + REDACTION census: the scrubbing stage every
    * training-data pipeline runs before release — detect emails, IPv4
    * addresses and SSN-shaped ids per document, redact them, and
    * report per-source exposure (docs affected, hits per class, bytes
    * removed by redaction). The corpus is synthetic-clean, so the
    * operator plants PII DERIVATIONALLY first: docs with doc_id%7=0
    * gain a doc_id-derived email + IPv4, docs with doc_id%11=0 an
    * SSN-shaped id — both sides (engine and DuckDB oracle) compute the
    * identical augmented text from doc_id, so the detect→redact→census
    * mechanics are what the hash gate checks, with non-trivial counts.
    *
    * Regex parity: simple character-class patterns only (no
    * backreferences/lookaround), identical leftmost-first,
    * non-overlapping semantics in Java regex (engine) and RE2
    * (DuckDB); redaction applies the three classes in a fixed order
    * on both sides. Scale shape: one scan, per-row regex work inside
    * codegen, one partial-aggregated rollup to 5 source rows —
    * nothing but (source, 5 ints) ever shuffles. */
  def v8PiiAudit(s: SparkSession, d: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
    val ssn = "\\d{3}-\\d{2}-\\d{4}"
    val aug = documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
      .withColumn("aug", concat(
        col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com or 10.0."),
            (col("doc_id") % 200).cast("string"), lit(".99")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" ref "),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
            lit("-"),
            lpad((col("doc_id") % 100).cast("string"), 2, "0"),
            lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit(""))))
    val per = aug.select(col("source"),
      size(regexp_extract_all(col("aug"), lit(email), lit(0))).as("ne"),
      size(regexp_extract_all(col("aug"), lit(ip), lit(0))).as("ni"),
      size(regexp_extract_all(col("aug"), lit(ssn), lit(0))).as("nd"),
      (length(col("aug")) - length(
        regexp_replace(regexp_replace(regexp_replace(col("aug"),
          email, "<EMAIL>"), ip, "<IP>"), ssn, "<ID>"))).as("delta"))
    per.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("ne") + col("ni") + col("nd") > 0, 1L).otherwise(0L))
        .as("docs_with_pii"),
      sum(col("ne").cast("long")).as("n_emails"),
      sum(col("ni").cast("long")).as("n_ips"),
      sum(col("nd").cast("long")).as("n_ids"),
      sum(col("delta").cast("long")).as("redact_delta_chars"))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v8_pii_audit" -> v8PiiAudit _,
    "v7_robust_outliers" -> v7RobustOutliers _,
    "v6_category_drift" -> v6CategoryDrift _,
    "v1_expectations" -> v1Expectations _,
    "v2_quarantine" -> v2Quarantine _,
    "v3_kanonymity" -> ((s: SparkSession, d: String) =>
      v3Kanonymity(s, d)),
    "v4_ref_integrity" -> v4RefIntegrity _,
    "v5_fd_audit" -> v5FdAudit _)
}
