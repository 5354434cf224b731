package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables._

/** Settings-document parsing and JSON projections (SURVEY §2.3 P9/P10,
  * §2.11 E8, §2.12 K3): the reference's REST layer accepts every PUT as
  * JSON *or* URL-query-string (`mpeg2_sp.c:715-717`), carries a base64
  * PMT in settings (`app_prog_proc.c:714-757`), and serializes all GET
  * projections as JSON (`mpeg2_sp.c:877-1027`). All pure column
  * expressions — parse/serialize happens inside codegen, no UDFs. */
object Settings {

  /** The reference settings document schema (`app_prog_proc.c:95-139`). */
  val settingsSchema: StructType = StructType(Seq(
    StructField("tag", StringType),
    StructField("input_url", StringType),
    StructField("output_url", StringType),
    StructField("cbr", LongType),
    StructField("max_ts_pcr_guard_msec", LongType),
    StructField("min_stc_delay_output_msec", LongType),
    StructField("flag_clear_logs", BooleanType)))

  /** P9: dual-format parse — `{...}` bodies go through from_json, query
    * strings through a map → JSON → struct bridge (detection by braces,
    * `mpeg2_sp.c:715-717`). */
  def parseSettings(body: Column): Column = {
    val m = map_from_entries(transform(
      split(body, "&"),
      kv => struct(
        split(kv, "=").getItem(0),
        // values may themselves contain '=' — rejoin the tail
        array_join(slice(split(kv, "="), 2, 64), "="))))
    val qsStruct = struct(
      element_at(m, "tag").as("tag"),
      element_at(m, "input_url").as("input_url"),
      element_at(m, "output_url").as("output_url"),
      element_at(m, "cbr").cast(LongType).as("cbr"),
      element_at(m, "max_ts_pcr_guard_msec").cast(LongType)
        .as("max_ts_pcr_guard_msec"),
      element_at(m, "min_stc_delay_output_msec").cast(LongType)
        .as("min_stc_delay_output_msec"),
      element_at(m, "flag_clear_logs").cast(BooleanType)
        .as("flag_clear_logs"))
    when(trim(body).startsWith("{"), from_json(body, settingsSchema))
      .otherwise(qsStruct)
  }

  /** sc6/P9 as a driver-checkable query: synthesize both encodings from
    * `events.props` (a JSON column) and show they parse identically. */
  def p9DualParse(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("event_id"), col("props"),
        // query-string twin of the {"k": N} JSON document
        concat(lit("k="), get_json_object(col("props"), "$.k"))
          .as("qs"))
    e.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast(IntegerType)
        .as("k_from_json"),
      expr("cast(str_to_map(qs, '&', '=')['k'] as int)").as("k_from_qs"))
  }

  /** P10: base64-wrapped binary payload → decode → parse. Demonstrated
    * over part names: base64 round-trip inside the engine. */
  def p10Base64Roundtrip(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(
        col("p_partkey"),
        base64(col("p_name").cast("binary")).as("b64"))
      .select(
        col("p_partkey"), col("b64"),
        unbase64(col("b64")).cast("string").as("decoded"))

  /** E8/K3 — the programs-summary JSON projection (`mpeg2_sp.c:1042-1101`
    * shape): one JSON document per group, built with to_json(struct(...)).
    * Exercised over the relational analog (orders per customer). */
  def k3JsonProjection(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_custkey")
      .agg(
        count(lit(1)).as("n_orders"),
        max(col("o_orderdate")).as("latest"))
      .select(
        col("o_custkey"),
        to_json(struct(
          col("o_custkey").as("id"),
          col("n_orders"),
          date_format(col("latest"), "yyyy-MM-dd").as("latest_date")))
          .as("doc"))

  /** A6/K4 — the log-trace register projection (`mpeg2_sp.c:961-991`):
    * deduplicated (code, desc) with count and last date, serialized. */
  def k4LogRegister(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(col("event_type").as("code"))
      .agg(
        count(lit(1)).as("log_trace_counter"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("date"))

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p9_dual_parse" -> p9DualParse _,
    "p10_base64_roundtrip" -> p10Base64Roundtrip _,
    "k3_json_projection" -> k3JsonProjection _,
    "k4_log_register" -> k4LogRegister _,
  )
}
