package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: the warehouse-side maintenance passes
  * every long-lived training-data lake runs against its metadata and
  * dimension tables. Both operators treat `events` as the change
  * stream (key = user_id, change order = (ts, event_id) — a total
  * order, so results are replay-deterministic).
  *
  * Scale design: both are ONE hash shuffle on the key followed by
  * per-key window/aggregate work — the minimum any keyed merge can do.
  * No global windows, no driver-side state; a 100 TB changelog
  * partitions by key exactly like the sf0.01 one.
  */
object Changelog {

  private def ordered(s: SparkSession, d: String): DataFrame =
    graft.Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))

  /** j10 — SCD TYPE-2 dimension build: collapse each user's
    * event_type change stream into versioned validity intervals
    * [valid_from, valid_to), open-ended for the current row. The
    * version counter increments exactly on value change (runs of the
    * same value collapse), so the output is the canonical
    * slowly-changing-dimension table a MERGE-based warehouse
    * maintains incrementally. */
  def j10Scd2(s: SparkSession, d: String): DataFrame =
    scd2Of(ordered(s, d))

  private[graft] def scd2Of(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val runs = ev
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("event_type"), 1)
          .otherwise(0))
      .withColumn("version", sum(col("chg")).over(w))
    val byVer = Window.partitionBy("user_id").orderBy("version")
    runs
      .groupBy(col("user_id"), col("event_type").as("attr_value"),
        col("version"))
      .agg(min(unix_micros(col("ts"))).as("valid_from_us"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(byVer))
      .select(col("user_id"), col("attr_value"),
        col("version").cast("int").as("version"),
        col("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"), col("n_events"))
  }

  /** j11 — CDC changelog MERGE: apply an insert/update/delete stream
    * to a keyed snapshot with last-writer-wins semantics (op derived
    * deterministically from event_id: %7==0 → D, <3 → I, else U). A
    * key whose final op is D is absent from the snapshot — the MERGE
    * INTO semantics of every lakehouse table format, expressed as one
    * window + filter. Money stays integer (cents via floor(x*100+0.5),
    * identical on both engines). */
  def j11CdcMerge(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    ordered(s, d)
      .withColumn("op",
        when(col("event_id") % 7 === 0, "D")
          .when(col("event_id") % 7 < 3, "I").otherwise("U"))
      .withColumn("value_cents",
        floor(col("value") * 100 + 0.5).cast("long"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(
        Window.partitionBy("user_id")))
      .withColumn("n_deletes", sum(when(col("op") === "D", 1L)
        .otherwise(0L)).over(Window.partitionBy("user_id")))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("user_id"), col("op").as("last_op"),
        col("event_type").as("cur_event_type"),
        col("value_cents").as("cur_value_cents"),
        unix_micros(col("ts")).as("last_ts_us"),
        col("n_ops"), col("n_deletes"))
  }

  /** j18 — TEMPORAL DIMENSION LOOKUP: join each purchase fact to the
    * SCD2 profile version (built from the user's NON-purchase events,
    * [[scd2Of]]) valid at the purchase instant — the lakehouse
    * "dimension as of event time" pattern that follows every SCD2
    * build. Not a point-in-interval join at all on the engine side:
    * version starts and facts merge into ONE per-user ordered stream
    * (version rows sort before facts at the same microsecond —
    * valid_from is inclusive) and a forward-fill window resolves the
    * lookup in a single pass, no interval explosion, no range-join
    * fan-out. Facts before the first version keep NULLs (left-join
    * semantics). The oracle runs the actual point-in-interval LEFT
    * JOIN on [valid_from, valid_to) — an independent algorithm, so
    * the hash match proves merge-fill ≡ interval join (including the
    * same-instant boundary and the exclusive upper bound). */
  def j18TemporalLookup(s: SparkSession, d: String): DataFrame = {
    val dim = scd2Of(ordered(s, d)
        .filter(col("event_type") =!= "purchase"))
      .select(col("user_id"), col("valid_from_us").as("t"),
        lit(0).as("kind"), lit(null).cast("long").as("event_id"),
        col("attr_value"), col("version"))
    val facts = ordered(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("t"),
        lit(1).as("kind"), col("event_id"),
        lit(null).cast("string").as("attr_value"),
        lit(null).cast("int").as("version"))
    // version joins the sort key so two SCD2 versions sharing the
    // same valid_from microsecond order deterministically (newest
    // LAST → last(..ignoreNulls) resolves facts to the newest, which
    // is exactly what the oracle's empty-[t,t)-interval exclusion
    // does for the superseded version); facts carry a NULL version,
    // already sorted after dims by `kind`
    val w = Window.partitionBy("user_id")
      .orderBy(col("t"), col("kind"), col("version").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dim.unionByName(facts)
      .withColumn("attr_at",
        last(col("attr_value"), ignoreNulls = true).over(w))
      .withColumn("ver_at",
        last(col("version"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("t"),
        col("attr_at").as("attr_value"), col("ver_at").as("version"))
  }

  /** j19 — BITEMPORAL RESTATEMENT REPORT: the two-axis time query the
    * SCD2/CDC family (valid time only) cannot answer — "what did the
    * warehouse BELIEVE about each user at transaction time T, and
    * what does it believe now that late records have landed?".
    * Transaction time is the load time of each change: valid time
    * plus a deterministic ingest delay ((event_id mod 5) days — the
    * late-arrival simulation every bitemporal design doc draws), and
    * T is the corpus max valid instant, so precisely the
    * still-in-flight records are invisible at T. Per user: the
    * attribute as-known-at-T vs as-known-now, the restatement flag,
    * and the late-record count — the correction audit a bitemporal
    * warehouse publishes after each backfill.
    *
    * Scale: ONE hash aggregate over the change stream (the lexical
    * struct-max picks the latest version under each knowledge cutoff
    * map-side, no window, no second scan); the anchor is a broadcast
    * scalar. The oracle re-derives both snapshots with ROW_NUMBER
    * windows — independent algorithm, same rows. */
  def j19Bitemporal(s: SparkSession, d: String): DataFrame = {
    val ev = ordered(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("v_us"))
      .withColumn("tx_us",
        col("v_us") + (col("event_id") % 5) * lit(86400000000L))
    val anchor = ev.agg(max(col("v_us")).as("t_cut"))
    ev.crossJoin(broadcast(anchor))
      .groupBy("user_id")
      .agg(
        max(struct(col("v_us"), col("event_id"), col("event_type")))
          .as("nw"),
        max(when(col("tx_us") <= col("t_cut"),
          struct(col("v_us"), col("event_id"), col("event_type"))))
          .as("att"),
        sum(when(col("tx_us") > col("t_cut"), 1L).otherwise(0L))
          .as("n_late"))
      .select(col("user_id"),
        col("att.event_type").as("attr_at_t"),
        col("nw.event_type").as("attr_now"),
        (!(col("att.event_type") <=> col("nw.event_type")))
          .as("restated"),
        col("n_late"),
        col("att.v_us").as("valid_us_at_t"),
        col("nw.v_us").as("valid_us_now"))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j19_bitemporal" -> j19Bitemporal _,
    "j18_temporal_lookup" -> j18TemporalLookup _,
    "j10_scd2" -> j10Scd2 _,
    "j11_cdc_merge" -> j11CdcMerge _,
    // j12: the SPARK side is batch j11; the oracle side is the
    // streaming CDC replay dump — hash match = stream≡batch MERGE
    // parity (the t29/w13/w16 convention)
    "j12_stream_cdc" -> j11CdcMerge _,
    // j13: batch j10's CLOSED intervals vs the streaming SCD2 replay
    // dump — hash match = stream≡batch dimension-build parity
    "j13_stream_scd2" -> ((s: SparkSession, d: String) =>
      j10Scd2(s, d).filter(!col("is_current"))
        .select(col("user_id"), col("attr_value"), col("version"),
          col("valid_from_us"), col("valid_to_us"), col("n_events"))))
}
