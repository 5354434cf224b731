package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ts.{TsLake, TsPipeline}

/** The TS-domain operator surface as driver-checkable queries. All run
  * over the reference's own capture fixture, independent of the sf dir.
  * Every query reads the session-cached decode/assembly (`TsLake`) — one
  * scan + one PSI pass for the whole family; the DuckDB oracle recomputes
  * each query from the parquet dumps of the same decoded layers. */
object TsQueries {

  private def pkts(s: SparkSession) = TsLake.packets(s)
  private def secs(s: SparkSession) = TsLake.sections(s)

  /** F1/F2 + P1: PID histogram of the demuxed stream. */
  def ts1PidStats(s: SparkSession, d: String): DataFrame =
    TsPipeline.pidStats(pkts(s)).orderBy(col("pid"))

  /** R1: continuity audit per PID. */
  def ts2CcAudit(s: SparkSession, d: String): DataFrame =
    TsPipeline.ccAudit(pkts(s)).orderBy(col("pid"))

  /** R2: reassembled section inventory (counts + CRC health). */
  def ts3SectionStats(s: SparkSession, d: String): DataFrame =
    secs(s).toDF()
      .groupBy("pid", "tableId")
      .agg(
        count(lit(1)).as("n_sections"),
        sum(col("crcOk").cast("long")).as("n_crc_ok"),
        countDistinct(col("versionNumber")).as("n_versions"))
      .select(col("pid"), col("tableId").as("table_id"),
        col("n_sections"), col("n_crc_ok"), col("n_versions"))
      .orderBy(col("pid"))

  /** R3/R4 + P5: the current PAT. */
  def ts4Pat(s: SparkSession, d: String): DataFrame =
    TsPipeline.patTable(s, secs(s))
      .orderBy(col("program_number"))

  /** P6 + J2: current PMT exploded to ES rows. */
  def ts5PmtEs(s: SparkSession, d: String): DataFrame =
    TsPipeline.pmtTable(s, secs(s))
      .orderBy(col("program_number"), col("elementary_pid"))

  /** §3.2: the programs-summary join (PAT ⋈ PMT ⋈ SDT). */
  def ts6ProgramsSummary(s: SparkSession, d: String): DataFrame =
    TsPipeline.programsSummaryFrom(s, secs(s))

  /** ES layer: PES header parse + PTS/DTS stats (time_stamp_stats). */
  def ts7PesStats(s: SparkSession, d: String): DataFrame =
    TsPipeline.pesTimestampStats(pkts(s)).orderBy(col("pid"))

  /** P3 expression route: PID histogram off the raw bytes via the
    * codegen'd `TsPeek` byte-peek (`TS_BUF_GET_PID` macro analog,
    * `ts.h:51-74`) — no typed decode, no struct build; independently
    * cross-checked by the oracle against the typed-decode dump. */
  def ts8PeekPidStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val raw = s.sparkContext
      .binaryRecords(TsPipeline.DefaultCapture, 188)
      .map(Tuple1(_)).toDF("bytes")
    raw
      .select(graft.plans.TsColumns.ts_peek(col("bytes"), "pid").as("pid"),
        graft.plans.TsColumns.ts_peek(col("bytes"), "pusi").as("pusi"))
      .groupBy("pid")
      .agg(count(lit(1)).as("n_packets"),
        sum(col("pusi").cast("long")).as("n_pusi"))
      .orderBy(col("pid"))
  }

  /** §2.12 program-processor detail document (UI shape
    * `program_proc.js:82-93`): per program, input bitrate + running peak
    * over PCR-derived seconds, output bitrate (= input: bypass parity,
    * `app_prog_proc.c:236-239`), and the settings sub-document with the
    * reference's defaults (`app_prog_proc.c:95-139`). Event time comes
    * from the stream's own 27 MHz PCR span — no wall clock.
    *
    * Numeric fields are rendered as integer tenths (`%d.%d`) so the JSON
    * text is bit-identical across engines — no float formatting. The
    * stream duration sums sane PCR deltas (≤1 s; larger = discontinuity,
    * skipped, `ts_enc.c:274+`) PER PCR PID and takes the max, so a
    * multi-program mux with several PCR timelines isn't double-counted.
    */
  def ts9ProgramProcDoc(s: SparkSession, d: String): DataFrame = {
    val pk = pkts(s).toDF()
    val pmt = TsPipeline.pmtTable(s, secs(s))
    val progPids = pmt
      .select(col("program_number"),
        explode(array(col("pmt_pid"), col("pcr_pid"),
          col("elementary_pid"))).as("pid"))
      .distinct()
    val wd = Window.partitionBy("pid").orderBy("seq")
    val spanS = pk.filter(col("af.pcr").isNotNull)
      .select(col("pid"), col("seq"), col("af.pcr").as("pcr"))
      .withColumn("delta", col("pcr") - lag(col("pcr"), 1).over(wd))
      .filter(col("delta") > 0 && col("delta") <= 27000000L)
      .groupBy("pid")
      .agg(sum(col("delta")).as("pid_ticks"))
      .agg((max(col("pid_ticks")) / 27000000.0).as("span_s"))
    val span = pk
      .agg(count(lit(1)).cast("double").as("total"),
        min(col("seq")).as("seq0"))
      .crossJoin(spanS)
    val perSec = pk.join(broadcast(progPids), Seq("pid"))
      .crossJoin(broadcast(span))
      .withColumn("sec",
        floor((col("seq") - col("seq0")) * col("span_s") / col("total")))
      .groupBy("program_number", "sec")
      .agg((count(lit(1)) * 188 * 8).as("bits"))
    val br = perSec.groupBy("program_number")
      .agg(
        floor((sum(col("bits")).cast("double") /
          count(lit(1)).cast("double")) / 100.0 + 0.5)
          .cast("long").as("t_avg"),
        floor(max(col("bits")).cast("double") / 100.0 + 0.5)
          .cast("long").as("t_peak"))
    br.select(
        col("program_number"),
        format_string(
          "{\"input_bitrate\":%d.%d,\"input_bitrate_peak\":%d.%d," +
            "\"output_bitrate\":%d.%d,\"settings\":{" +
            "\"selected_brctrl_type_value\":\"CBR\",\"cbr\":0," +
            "\"output_url\":\"\",\"max_ts_pcr_guard_msec\":200," +
            "\"min_stc_delay_output_msec\":300}}",
          expr("t_avg div 10"), pmod(col("t_avg"), lit(10L)),
          expr("t_peak div 10"), pmod(col("t_peak"), lit(10L)),
          expr("t_avg div 10"), pmod(col("t_avg"), lit(10L)))
          .as("doc"))
      .orderBy(col("program_number"))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts8_peek_pid_stats" -> ts8PeekPidStats _,
    "ts9_program_proc_doc" -> ts9ProgramProcDoc _,
    "ts7_pes_stats" -> ts7PesStats _,
    "ts1_pid_stats" -> ts1PidStats _,
    "ts2_cc_audit" -> ts2CcAudit _,
    "ts3_section_stats" -> ts3SectionStats _,
    "ts4_pat" -> ts4Pat _,
    "ts5_pmt_es" -> ts5PmtEs _,
    "ts6_programs_summary" -> ts6ProgramsSummary _,
  )
}
