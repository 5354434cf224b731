package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ts.TsPipeline

/** The TS-domain operator surface as driver-checkable queries (rows-only:
  * binary stream parsing has no ANSI-SQL oracle). All run over the
  * reference's own capture fixture, independent of the sf dir. */
object TsQueries {

  private def pkts(s: SparkSession) = TsPipeline.packets(s)

  /** F1/F2 + P1: PID histogram of the demuxed stream. */
  def ts1PidStats(s: SparkSession, d: String): DataFrame =
    TsPipeline.pidStats(pkts(s)).orderBy(col("pid"))

  /** R1: continuity audit per PID. */
  def ts2CcAudit(s: SparkSession, d: String): DataFrame =
    TsPipeline.ccAudit(pkts(s)).orderBy(col("pid"))

  /** R2: reassembled section inventory (counts + CRC health). */
  def ts3SectionStats(s: SparkSession, d: String): DataFrame =
    TsPipeline.psiSections(s, pkts(s)).toDF()
      .groupBy("pid", "tableId")
      .agg(
        count(lit(1)).as("n_sections"),
        sum(col("crcOk").cast("long")).as("n_crc_ok"),
        countDistinct(col("versionNumber")).as("n_versions"))
      .orderBy(col("pid"))

  /** R3/R4 + P5: the current PAT. */
  def ts4Pat(s: SparkSession, d: String): DataFrame =
    TsPipeline.patTable(s, TsPipeline.psiSections(s, pkts(s)))
      .orderBy(col("program_number"))

  /** P6 + J2: current PMT exploded to ES rows. */
  def ts5PmtEs(s: SparkSession, d: String): DataFrame =
    TsPipeline.pmtTable(s, TsPipeline.psiSections(s, pkts(s)))
      .orderBy(col("program_number"), col("elementary_pid"))

  /** §3.2: the programs-summary join (PAT ⋈ PMT ⋈ SDT). */
  def ts6ProgramsSummary(s: SparkSession, d: String): DataFrame =
    TsPipeline.programsSummary(s, pkts(s))

  /** ES layer: PES header parse + PTS/DTS stats (time_stamp_stats). */
  def ts7PesStats(s: SparkSession, d: String): DataFrame =
    TsPipeline.pesTimestampStats(pkts(s)).orderBy(col("pid"))

  /** P3 expression route: PID histogram off the raw bytes via the
    * codegen'd `TsPeek` byte-peek (`TS_BUF_GET_PID` macro analog,
    * `ts.h:51-74`) — no typed decode, no struct build. */
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
    * from the stream's own 27 MHz PCR span — no wall clock. */
  def ts9ProgramProcDoc(s: SparkSession, d: String): DataFrame = {
    val pk = pkts(s).toDF()
    val pmt = TsPipeline.pmtTable(s, TsPipeline.psiSections(s, pkts(s)))
    val progPids = pmt
      .select(col("program_number"),
        explode(array(col("pmt_pid"), col("pcr_pid"),
          col("elementary_pid"))).as("pid"))
      .distinct()
    // stream duration from the PCR timeline (27 MHz ticks), summed over
    // sane positive deltas only — a raw max-min is wrong whenever the
    // stream carries a PCR discontinuity (this capture does: its first
    // PCRs belong to a stale pre-loop timeline); ISO mandates PCRs every
    // ≤100 ms, so deltas above 1 s are discontinuities and are skipped,
    // exactly the decoder's restamping posture (`ts_enc.c:274+`)
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy("seq")
    val spanS = pk.filter(col("af.pcr").isNotNull)
      .select(col("pid"), col("seq"), col("af.pcr").as("pcr"))
      .withColumn("delta", col("pcr") - lag(col("pcr"), 1).over(wd))
      .filter(col("delta") > 0 && col("delta") <= 27000000L)
      .agg((sum(col("delta")) / 27000000.0).as("span_s"))
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
    perSec.groupBy("program_number")
      .agg(
        round(avg(col("bits")) / 1000.0, 1).as("input_bitrate"),
        round(max(col("bits")) / 1000.0, 1).as("input_bitrate_peak"))
      .select(
        col("program_number"),
        to_json(struct(
          col("input_bitrate"),
          col("input_bitrate_peak"),
          col("input_bitrate").as("output_bitrate"),
          struct(
            lit("CBR").as("selected_brctrl_type_value"),
            lit(0L).as("cbr"),
            lit("").as("output_url"),
            lit(200L).as("max_ts_pcr_guard_msec"),
            lit(300L).as("min_stc_delay_output_msec")).as("settings")))
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
