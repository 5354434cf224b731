package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_expectations" -> v1Expectations _,
    "v2_quarantine" -> v2Quarantine _)
}
