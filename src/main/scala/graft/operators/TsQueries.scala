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

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts8_peek_pid_stats" -> ts8PeekPidStats _,
    "ts7_pes_stats" -> ts7PesStats _,
    "ts1_pid_stats" -> ts1PidStats _,
    "ts2_cc_audit" -> ts2CcAudit _,
    "ts3_section_stats" -> ts3SectionStats _,
    "ts4_pat" -> ts4Pat _,
    "ts5_pmt_es" -> ts5PmtEs _,
    "ts6_programs_summary" -> ts6ProgramsSummary _,
  )
}
