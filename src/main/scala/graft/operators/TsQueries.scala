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

  // tiny PSI dimension tables (a handful of rows each) shared by
  // ts4/ts5/ts6/ts9/ts10/ts11 — winner-version selection runs ONCE per
  // session (memoized latest-tables relation), not once per query
  private def latest(s: SparkSession) =
    memoized(s, "latest") { TsPipeline.latestTables(secs(s)) }
  private def pat(s: SparkSession) =
    memoized(s, "pat") { TsPipeline.patFromLatest(s, latest(s)) }
  private def pmt(s: SparkSession) =
    memoized(s, "pmt") { TsPipeline.pmtFromLatest(s, latest(s)) }
  private def sdt(s: SparkSession) =
    memoized(s, "sdt") { TsPipeline.sdtFromLatest(s, latest(s)) }
  private def summary(s: SparkSession) =
    memoized(s, "summary") {
      TsPipeline.programsSummaryFromTables(pat(s), pmt(s), sdt(s))
    }

  /** Materialize the session's PSI/timing state up front — the analog of
    * the reference daemon's `psi_thr` (1 s periodic PSI refresh,
    * `mpeg2_sp.c:78-81`; SURVEY §3.3): in the reference a GET never pays
    * PSI assembly, it reads the continuously-maintained tables. Bench
    * warmup calls this so sweep timings measure each query's own
    * projection work, not which query alphabetically runs first. */
  def warmPsiState(s: SparkSession): Unit = {
    latest(s).count(); summary(s).count()
    spanSeconds(s).count(); progProcTenths(s).count(); pesStats(s).count()
  }

  /** Same rationale for the MPTS fixture's decoded state (ts14/ts15):
    * the reference daemon's psi_thr maintains per-instance table state
    * continuously — a stats GET reads it, it never re-decodes the
    * stream. Billed once at session start, like [[warmPsiState]]. */
  def warmMptsState(s: SparkSession): Unit = {
    mptsPackets(s).count(); mptsPmt(s).count(); mptsPat(s).count()
  }

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
    pat(s).orderBy(col("program_number"))

  /** P6 + J2: current PMT exploded to ES rows. */
  def ts5PmtEs(s: SparkSession, d: String): DataFrame =
    pmt(s).orderBy(col("program_number"), col("elementary_pid"))

  /** §3.2: the programs-summary join (PAT ⋈ PMT ⋈ SDT). */
  def ts6ProgramsSummary(s: SparkSession, d: String): DataFrame =
    summary(s)

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

  /** Program-processor JSON body (shared by ts9 and ts10): the
    * reference's defaults (`app_prog_proc.c:95-139`), numerics rendered
    * as integer tenths (`%d.%d`) so the text is bit-identical across
    * engines — no float formatting. */
  private[graft] val procBodyFmt =
    "\"input_bitrate\":%d.%d,\"input_bitrate_peak\":%d.%d," +
      "\"output_bitrate\":%d.%d,\"settings\":{" +
      "\"selected_brctrl_type_value\":\"CBR\",\"cbr\":0," +
      "\"output_url\":\"\",\"max_ts_pcr_guard_msec\":200," +
      "\"min_stc_delay_output_msec\":300}"

  /** Shared printf/format_string templates for the composed documents —
    * the oracle SQL interpolates the SAME constants, so the JSON text is
    * definitionally identical on both sides. */
  private[graft] val progFragFmt =
    "{\"program_number\":%d,\"service_name\":\"%s\"," +
      "\"processor_associated\":%s,\"links\":[{\"rel\":\"self\"," +
      "\"href\":\"mpeg2_sp-0/programs/%d.json\"}]}"
  private[graft] val procFragFmt =
    "{\"program_number\":%d," + procBodyFmt + "}"
  private[graft] val instanceDocFmt =
    "{\"id_str\":\"mpeg2_sp-0\",\"input_bitrate\":%d.%d," +
      "\"log_traces\":[%s],\"settings\":{\"tag\":\"\"," +
      "\"input_url\":\"%s\",\"flag_clear_logs\":false," +
      "\"flag_purge_disassociated_processors\":false}," +
      "\"programs\":[%s],\"program_processors\":[%s]," +
      "\"links\":[{\"rel\":\"self\",\"href\":\"mpeg2_sp-0.json\"}]}"
  /** One deduplicated log-register row (`mpeg2_sp.c:961-991`:
    * code/desc/date/counter per distinct trace). */
  private[graft] val logTraceFragFmt =
    "{\"log_trace_code\":\"%s\",\"log_trace_desc\":\"%s\"," +
      "\"log_trace_date\":\"%s\",\"log_trace_counter\":%d}"
  private[graft] val svcFragFmt =
    "{\"lang\":\"%s\",\"subtitling_type\":%d," +
      "\"composition_page_id\":%d,\"ancillary_page_id\":%d}"
  private[graft] val esDocFmt =
    "{\"extension_type\":\"%s\",\"input_bitrate\":%d.%d," +
      "\"output_bitrate\":%d.%d,\"output_buf_level\":0," +
      "\"time_stamp_stats\":{\"n_pes\":%d,\"min_pts\":%d," +
      "\"max_pts\":%d},\"settings\":{" +
      "\"flag_enable_interl_output\":true," +
      "\"time_shift_offset_msec\":0,\"ts_pcr_guard_msec\":200," +
      "\"restamping\":false},\"services\":[%s]}"

  /** Tiny shared sub-relations (1–2 rows each), memoized + cached per
    * session: ts9/ts10/ts11 all read the PCR span and the per-program
    * bitrate tenths. Eviction (stopped sessions, clearAll hook) lives in
    * [[graft.SessionMemo]]. */
  private val memo = graft.SessionMemo.forCachedDataFrames()
  private def memoized(s: SparkSession, key: String)(
      build: => DataFrame): DataFrame = memo(s, key)(build)

  /** Stream duration (one row: span_s) from the PCR timelines: sane
    * positive deltas (≤1 s; larger = discontinuity, skipped —
    * `ts_enc.c:274+`) summed PER PCR PID, max across PIDs, so a
    * multi-program mux with several PCR timelines isn't double-counted. */
  private def spanSecondsOf(pk: DataFrame): DataFrame = {
    val wd = Window.partitionBy("pid").orderBy("seq")
    pk.filter(col("af.pcr").isNotNull)
      .select(col("pid"), col("seq"), col("af.pcr").as("pcr"))
      .withColumn("delta", col("pcr") - lag(col("pcr"), 1).over(wd))
      .filter(col("delta") > 0 && col("delta") <= 27000000L)
      .groupBy("pid")
      .agg(sum(col("delta")).as("pid_ticks"))
      .agg((max(col("pid_ticks")) / 27000000.0).as("span_s"))
  }

  /** Per-program avg/peak input bitrate as integer tenths of kbps over
    * PCR-derived seconds (event time from the stream's own 27 MHz
    * timeline — no wall clock), over any (packets, PMT) pair. */
  /** The capture's 1-row PCR span, computed ONCE per session: ts9/ts10
    * (twice, via progProcTenths + the instance total) and ts11 all
    * consume it — without the memo the window+agg over the full packet
    * relation re-runs per consumer. */
  private def spanSeconds(s: SparkSession): DataFrame =
    memoized(s, "span_s") { spanSecondsOf(pkts(s).toDF()) }

  /** PES timestamp stats shared by ts7 and ts11 — one PES header pass. */
  private def pesStats(s: SparkSession): DataFrame =
    memoized(s, "pes_stats") { TsPipeline.pesTimestampStats(pkts(s)) }

  private def progProcTenthsOf(pk: DataFrame, pmtT: DataFrame,
      span_s: DataFrame): DataFrame = {
    val progPids = pmtT
      .select(col("program_number"),
        explode(array(col("pmt_pid"), col("pcr_pid"),
          col("elementary_pid"))).as("pid"))
      .distinct()
    val span = pk
      .agg(count(lit(1)).cast("double").as("total"),
        min(col("seq")).as("seq0"))
      .crossJoin(span_s)
    val perSec = pk.join(broadcast(progPids), Seq("pid"))
      .crossJoin(broadcast(span))
      .withColumn("sec",
        floor((col("seq") - col("seq0")) * col("span_s") / col("total")))
      .groupBy("program_number", "sec")
      .agg((count(lit(1)) * 188 * 8).as("bits"))
    perSec.groupBy("program_number")
      .agg(
        floor((sum(col("bits")).cast("double") /
          count(lit(1)).cast("double")) / 100.0 + 0.5)
          .cast("long").as("t_avg"),
        floor(max(col("bits")).cast("double") / 100.0 + 0.5)
          .cast("long").as("t_peak"))
  }

  private def progProcTenths(s: SparkSession): DataFrame =
    memoized(s, "prog_proc_tenths") {
      progProcTenthsOf(pkts(s).toDF(), pmt(s), spanSeconds(s))
    }

  /** §2.12 program-processor detail document (UI shape
    * `program_proc.js:82-93`): per program, input bitrate + running peak
    * over PCR-derived seconds, output bitrate (= input: bypass parity,
    * `app_prog_proc.c:236-239`), and the settings sub-document with the
    * reference's defaults. */
  def ts9ProgramProcDoc(s: SparkSession, d: String): DataFrame =
    progProcTenths(s).select(
        col("program_number"),
        format_string("{" + procBodyFmt + "}",
          expr("t_avg div 10"), pmod(col("t_avg"), lit(10L)),
          expr("t_peak div 10"), pmod(col("t_peak"), lit(10L)),
          expr("t_avg div 10"), pmod(col("t_avg"), lit(10L)))
          .as("doc"))
      .orderBy(col("program_number"))

  /** §2.12 the composed instance REST document (`GET /stream_procs/<id>`
    * shape, `mpeg2_sp.c:828-876`): id_str + input_bitrate + log_traces +
    * settings + programs[] + program_processors[] + links in ONE JSON
    * doc — the reference's main GET, assembled from the same shared
    * relations as ts1–ts9. */
  def ts10InstanceDoc(s: SparkSession, d: String): DataFrame = {
    val pk = pkts(s).toDF()
    def joined(c: org.apache.spark.sql.Column) =
      array_join(transform(array_sort(collect_list(c)),
        e => e.getField("frag")), ",")
    val progFrags = summary(s).select(
        struct(col("program_number"),
          format_string(progFragFmt,
            col("program_number"), col("service_name"),
            when(col("n_es") > 0, lit("true")).otherwise(lit("false")),
            col("program_number")).as("frag")).as("x"))
      .agg(joined(col("x")).as("programs_json"))
    val procFrags = progProcTenths(s).select(
        struct(col("program_number"),
          format_string(procFragFmt,
            col("program_number"),
            expr("t_avg div 10"), pmod(col("t_avg"), lit(10L)),
            expr("t_peak div 10"), pmod(col("t_peak"), lit(10L)),
            expr("t_avg div 10"), pmod(col("t_avg"), lit(10L)))
            .as("frag")).as("x"))
      .agg(joined(col("x")).as("procs_json"))
    // the deduplicated log register (A6/k4 shape) composed into the
    // document — the reference walks its log_get() register the same way
    // (`mpeg2_sp.c:961-991`); the register source here is the events
    // table, collapsed to (code, last-seen, count) per distinct trace
    val logFrags = graft.Tables.events(s, d)
      .groupBy(col("event_type").as("code"))
      .agg(
        count(lit(1)).as("cnt"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("dt"))
      .select(struct(col("code"),
        format_string(logTraceFragFmt,
          col("code"), concat(lit("trace: "), col("code")),
          col("dt"), col("cnt")).as("frag")).as("x"))
      .agg(joined(col("x")).as("logs_json"))
    val total = pk.agg(count(lit(1)).as("n"))
      .crossJoin(spanSeconds(s))
      .select(floor(((col("n") * 188 * 8).cast("double") / col("span_s"))
        / 100.0 + 0.5).cast("long").as("t_tot"))
    total.crossJoin(progFrags).crossJoin(procFrags).crossJoin(logFrags)
      .select(
        lit("mpeg2_sp-0").as("id_str"),
        format_string(instanceDocFmt,
          expr("t_tot div 10"), pmod(col("t_tot"), lit(10L)),
          col("logs_json"),
          lit(TsPipeline.DefaultCapture),
          col("programs_json"), col("procs_json")).as("doc"))
  }

  /** ES-processor detail/settings document (`es_proc.js:87-108`): per
    * elementary stream, extension type, PCR-span bitrate,
    * time_stamp_stats, the settings defaults, and the editable 0x59
    * dvb-subtitling service rows. */
  def ts11EsProcDoc(s: SparkSession, d: String): DataFrame = {
    val pk = pkts(s).toDF()
    val subs = TsPipeline.pmtSubtitlingFromLatest(s, latest(s))
    val pes = TsPipeline.pesTimestampStats(pkts(s))
      .select(col("pid").as("elementary_pid"), col("n_pes"),
        col("min_pts"), col("max_pts"))
    val pidBits = pk.groupBy("pid")
      .agg((count(lit(1)) * 188 * 8).as("bits"))
      .withColumnRenamed("pid", "elementary_pid")
    val svc = subs.select(col("elementary_pid"),
        struct(col("lang"),
          format_string(svcFragFmt,
            col("lang"), col("subtitling_type"),
            col("composition_page_id"), col("ancillary_page_id"))
            .as("frag")).as("x"))
      .groupBy("elementary_pid")
      .agg(array_join(transform(array_sort(collect_list(col("x"))),
        e => e.getField("frag")), ",").as("services_json"))
    pmt(s)
      .join(pidBits, Seq("elementary_pid"), "left")
      .join(broadcast(pes), Seq("elementary_pid"), "left")
      .join(broadcast(svc), Seq("elementary_pid"), "left")
      .crossJoin(broadcast(spanSeconds(s)))
      .withColumn("t_in",
        floor((coalesce(col("bits"), lit(0L)).cast("double") /
          col("span_s")) / 100.0 + 0.5).cast("long"))
      .withColumn("extension_type",
        when(col("stream_type") === 0x06 &&
          col("services_json").isNotNull, "dvb_subt")
          .when(col("stream_type").isin(0x01, 0x02, 0x1B, 0x24), "video")
          .when(col("stream_type").isin(0x03, 0x04, 0x0F, 0x11, 0x81),
            "audio")
          .otherwise("bypass"))
      .select(
        col("program_number"), col("elementary_pid"), col("stream_type"),
        format_string(esDocFmt,
          col("extension_type"),
          expr("t_in div 10"), pmod(col("t_in"), lit(10L)),
          expr("t_in div 10"), pmod(col("t_in"), lit(10L)),
          coalesce(col("n_pes"), lit(0L)),
          coalesce(col("min_pts"), lit(-1L)),
          coalesce(col("max_pts"), lit(-1L)),
          coalesce(col("services_json"), lit(""))).as("doc"))
      .orderBy(col("elementary_pid"))
  }

  /** The MPTS fixture's decoded relations, memoized per session: packet
    * layer + the PMT dimension derived through the full PSI pipeline
    * (Verify dumps both so the ts14 oracle re-derives the bitrate math
    * independently). */
  private[graft] def mptsPackets(s: SparkSession): DataFrame =
    memoized(s, "mpts_pk") { graft.ts.Fixtures.mptsWithPcr(s).toDF() }
  /** The MPTS fixture's PSI sections, assembled ONCE per session and
    * shared by the PAT/PMT/SDT builders below — three separate
    * psiSections calls each re-cached an identical packet plan (the
    * bench log's duplicate-cache warnings traced here). */
  private val secMemo =
    new graft.SessionMemo[org.apache.spark.sql.Dataset[
      graft.ts.PsiSection]](_.unpersist(blocking = false))
  private def mptsSections(s: SparkSession)
      : org.apache.spark.sql.Dataset[graft.ts.PsiSection] =
    secMemo(s, "mpts_secs")(TsPipeline.psiSections(s,
      graft.ts.Fixtures.mptsWithPcr(s), pin = false).cache())

  private[graft] def mptsPmt(s: SparkSession): DataFrame =
    memoized(s, "mpts_pmt") {
      TsPipeline.pmtTable(s, mptsSections(s))
    }
  private[graft] def mptsPat(s: SparkSession): DataFrame =
    memoized(s, "mpts_pat") {
      TsPipeline.patTable(s, mptsSections(s))
    }
  private[graft] def mptsSdt(s: SparkSession): DataFrame =
    memoized(s, "mpts_sdt") {
      TsPipeline.sdtTable(s, mptsSections(s))
    }

  /** §3.2's programs summary on the MULTI-program fixture WITH a real
    * SDT: the capture has no SDT, so ts6 only ever exercises the
    * null-fill branch of the J3 left join — here every program resolves
    * an actual service name ("Service N", 0x48 descriptors built with
    * the engine's own encoders), proving the match path of F7/J3 under
    * the oracle too. */
  def ts15MptsSummary(s: SparkSession, d: String): DataFrame =
    TsPipeline.programsSummaryFromTables(mptsPat(s), mptsPmt(s),
        mptsSdt(s))
      .orderBy(col("program_number"))

  /** A1 on a MULTI-timeline mux: per-program avg/peak bitrate where the
    * stream duration is the max of per-PCR-PID sane-delta sums — two
    * independent PCR timelines (one with a discontinuity jump, one PID
    * with no PCR at all) exercise the span semantic (`ts_enc.c:274+`)
    * that the single-program capture can't. */
  def ts14MptsBitrate(s: SparkSession, d: String): DataFrame =
    progProcTenthsOf(mptsPackets(s), mptsPmt(s),
        spanSecondsOf(mptsPackets(s)))
      .select(
        col("program_number"),
        format_string("%d.%d",
          expr("t_avg div 10"), pmod(col("t_avg"), lit(10L)))
          .as("input_bitrate"),
        format_string("%d.%d",
          expr("t_peak div 10"), pmod(col("t_peak"), lit(10L)))
          .as("input_bitrate_peak"))
      .orderBy(col("program_number"))

  /** ts16: the CBR rate-shape plan (E3/E5, `app_prog_proc.c:110-128`) as
    * an oracle-checked query: bucket the capture by forward-filled PCR
    * second, count payload packets, and compute the stuffing each bucket
    * needs to hit 300 kbps (199 pkt/s). The partitioned two-pass fill in
    * `Remux.cbrPlanStreams` (slice-local windows + broadcast boundary
    * anchors, no global window) must agree with the oracle's single
    * `last_value IGNORE NULLS` forward fill — the plan-shape vs
    * semantics split this whole suite is built on. */
  def ts16CbrPlan(s: SparkSession, d: String): DataFrame =
    graft.ts.Remux.cbrPlan(graft.ts.TsLake.packets(s), 300000L)

  /** ts17: the PCR restamp (E4, `ts_enc.c:274-301`) oracle-checked —
    * every PCR shifted by a fixed offset modulo the 33+9-bit wrap
    * (2^33·300 ticks). The Spark side runs the typed Dataset map the
    * remux path uses in production; the oracle re-derives the shift as
    * pure integer arithmetic over the dumped packet layer. */
  def ts17PcrRestamp(s: SparkSession, d: String): DataFrame =
    graft.ts.Remux.pcrRestamp(graft.ts.TsLake.packets(s), 1234567L)
      .toDF()
      .filter(col("af.pcr").isNotNull)
      .select(col("seq"), col("af.pcr").as("pcr"))

  /** ts18: per-PID PCR clock tracking through the CUSTOM PHYSICAL
    * OPERATOR (`plans.ForwardFillExec` — §2.14(c): LogicalPlan +
    * Strategy + SparkPlan): every packet annotated with the latest PCR
    * of its PID, the `ts_enc.c:203-205` clock-inherit semantic. The
    * oracle re-derives the same relation with a windowed
    * `last_value IGNORE NULLS`, so the one-pass exec node's semantics
    * are independently pinned by the hash gate. */
  def ts18FillForward(s: SparkSession, d: String): DataFrame =
    graft.plans.ForwardFill(
      graft.ts.TsLake.packets(s).toDF()
        .select(col("seq"), col("pid"), col("af.pcr").as("pcr")),
      Seq("pid"), "seq", "pcr", "last_pcr")

  /** ts19: F1's log-and-continue reject accounting
    * (`mpeg2_sp.c:1369-1382` counts and logs bad frames instead of
    * dying) — per-disposition record counts over a capture with PLANTED
    * framing errors (sync loss + oversize AF length,
    * `TsPipeline.ensureCorruptedCapture`). Oracle: the per-record
    * disposition log is dumped (TsLake `reject_log`) and the
    * aggregation re-derived in SQL; the planted error POSITIONS are
    * pinned exactly by TsPipelineSpec. */
  def ts19RejectStats(s: SparkSession, d: String): DataFrame = {
    val (ok, rej) = graft.ts.TsPipeline.packetsWithRejects(
      s, graft.ts.TsPipeline.ensureCorruptedCapture())
    ok.toDF().select(lit("ok").as("reason"))
      .unionByName(rej.toDF().select(col("reason")))
      .groupBy("reason").agg(count(lit(1)).as("n"))
  }

  /** ts20 — PCR JITTER HISTOGRAM: per PCR PID, the distribution of
    * consecutive-PCR intervals in millisecond buckets (plus the exact
    * tick extremes per bucket) — the DVB PCR-accuracy health check a
    * mux operator watches (nominal interval ≤ 40 ms; a drifting or
    * bimodal histogram means an upstream remux is mis-pacing).
    * Discontinuity deltas (> 1 s or ≤ 0, the spanSecondsOf rule) are
    * excluded. The window partitions by PID over the PCR-carrying
    * subset only; the histogram is a map-side-combining rollup on the
    * (pid, ms-bucket) grid. Oracle: lag + the same integer bucketing
    * over the dumped packet layer. */
  def ts20PcrJitter(s: SparkSession, d: String): DataFrame = {
    val wd = Window.partitionBy("pid").orderBy("seq")
    pkts(s).toDF()
      .filter(col("af.pcr").isNotNull)
      .select(col("pid"), col("seq"), col("af.pcr").as("pcr"))
      .withColumn("delta", col("pcr") - lag(col("pcr"), 1).over(wd))
      .filter(col("delta").isNotNull && col("delta") > 0 &&
        col("delta") <= 27000000L)
      .withColumn("bucket_ms", expr("delta div 27000"))
      .groupBy("pid", "bucket_ms")
      .agg(count(lit(1)).as("n"), min(col("delta")).as("min_ticks"),
        max(col("delta")).as("max_ticks"))
  }

  /** ts21 — PSI CADENCE: per (PID, table_id), the packet-distance
    * between consecutive SECTION STARTS — the TR 101 290 repetition
    * check in stream-native units (PAT must repeat ≤ 0.5 s, i.e.
    * ≤ rate/2 packets; a growing max gap is a mux starving its PSI
    * scheduler). Duplicate first_seq values (two sections chained in
    * one packet via pointer_field) yield gap 0 under any tie order,
    * so the gap multiset is deterministic. avg is guarded integer
    * division on both engines (single-section tables report NULLs). */
  def ts21PsiCadence(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("pid", "table_id").orderBy("first_seq")
    graft.ts.TsLake.sections(s).toDF()
      .select(col("pid"), col("tableId").as("table_id"),
        col("firstSeq").as("first_seq"))
      .withColumn("gap",
        col("first_seq") - lag(col("first_seq"), 1).over(w))
      .groupBy("pid", "table_id")
      .agg(count(lit(1)).as("n_sections"),
        min(col("gap")).as("min_gap"), max(col("gap")).as("max_gap"),
        when(count(col("gap")) > 0,
          expr("sum(gap) div count(gap)")).as("avg_gap"))
  }

  /** ts22 — PCR↔PTS SYNC AUDIT: for every PES presentation stamp,
    * its lead over the mux clock — PTS minus the last PCR at-or-
    * before that packet (the decoder-buffer headroom a mux QC pass
    * watches; a negative lead is an undecodable stamp, a huge one is
    * wasted buffer). The as-of resolution is the j18 merge-fill shape
    * over the PCR+PES event stream with the w35 TWO-LEVEL seam (per
    * seq-chunk forward fill + chunk-grid carry-in, bounded grid — no
    * global row window over a 100 TB capture timeline); all units are
    * integer 90 kHz ticks (PCR ticks div 300). The oracle re-derives
    * the lookup with DuckDB's native ASOF JOIN over the packet/PES
    * dumps — an independent algorithm, so the hash match proves
    * merge-fill ≡ as-of join on the real mux. */
  def ts22PtsPcrLead(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pcrRows = pkts(s).toDF()
      .filter(col("af.pcr").isNotNull)
      .select(col("seq"), lit(0).as("kind"),
        expr("af.pcr div 300").as("pcr90"),
        lit(null).cast("int").as("pid"),
        lit(null).cast("long").as("pts"))
    val pesRows = pkts(s)
      .filter(p => p.pusi && p.hasPayload)
      .flatMap { p =>
        graft.ts.PesCodec.parseHeader(p.payload)
          .flatMap(h => h.pts.map(t => (p.seq, p.pid, t)))
      }.toDF("seq", "pid", "pts")
      .select(col("seq"), lit(1).as("kind"),
        lit(null).cast("long").as("pcr90"), col("pid"), col("pts"))
    val evs = pcrRows.unionByName(pesRows)
      .withColumn("chunk", expr("seq div 4096"))
    val wloc = Window.partitionBy("chunk").orderBy("seq", "kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wgrid = Window.orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = evs.groupBy("chunk")
      .agg(max(when(col("pcr90").isNotNull,
        struct(col("seq"), col("pcr90")))).as("m"))
      .withColumn("carry_pcr90",
        last(col("m.pcr90"), ignoreNulls = true).over(wgrid))
      .select(col("chunk"), col("carry_pcr90"))
    evs
      .withColumn("loc_pcr90",
        last(col("pcr90"), ignoreNulls = true).over(wloc))
      .join(broadcast(carry), Seq("chunk"))
      .filter(col("kind") === 1)
      .select(col("pid"), col("pts"),
        coalesce(col("loc_pcr90"), col("carry_pcr90")).as("pcr90"))
      .filter(col("pcr90").isNotNull)
      .groupBy("pid")
      .agg(count(lit(1)).as("n_stamps"),
        min(col("pts") - col("pcr90")).as("min_lead_90k"),
        max(col("pts") - col("pcr90")).as("max_lead_90k"),
        expr("sum(pts - pcr90) div count(1)").as("avg_lead_90k"))
  }

  /** ts23 — TR 101 290 PRIORITY-1 ROLLUP: the DVB broadcast-monitoring
    * first-table report (ETSI TR 101 290 §5.2.1, the check classes the
    * reference's compliance rules feed — `mpeg2ts/ts.h` header rules +
    * the PSI cadence/CRC gates) as one row per check with violation and
    * observation counts. Framing faults (1.2) audit the planted-
    * corruption capture — the only fixture with hard sync errors;
    * PAT/PMT repetition beyond 0.5 s (1.3.a/1.5.a) thresholds section-
    * start gaps in STREAM time: gap_packets/total_packets vs
    * 0.5s/span_s, cross-multiplied in decimal(38,0) ticks so the
    * boundary is exact integer arithmetic in both engines (no float
    * at the decision point); continuity (1.4) is the R1 audit summed;
    * referenced-PID presence (1.6) left-joins the current PMT's ES
    * PIDs against observed packet PIDs; the CRC gate (2.2) counts
    * failed sections. Every branch is a one-row aggregate over a
    * relation the lake already shares (packets, sections, current
    * PMT), so the report costs a union of map-side-combined scans —
    * nothing row-scaled shuffles beyond what the shared layers paid. */
  def ts23Tr101290(s: SparkSession, d: String): DataFrame = {
    val pk = pkts(s).toDF()
    val sc = secs(s).toDF()

    def one(check: String, bad: org.apache.spark.sql.Column,
        obs: org.apache.spark.sql.Column)(df: DataFrame) =
      df.agg(coalesce(bad, lit(0L)).cast("long").as("n_bad"),
          coalesce(obs, lit(0L)).cast("long").as("n_obs"))
        .select(lit(check).as("check_id"), col("n_bad"), col("n_obs"))

    // 1.2: disposition of the corrupted capture (ok + rejects)
    val (okC, rejC) = TsPipeline.packetsWithRejects(
      s, TsPipeline.ensureCorruptedCapture())
    val framing = okC.toDF().select(lit("ok").as("reason"))
      .unionByName(rejC.toDF().select(col("reason")))
    val sync = one("p1_2_sync_byte",
      sum(when(col("reason") =!= "ok", 1L).otherwise(0L)),
      count(lit(1)))(framing)

    // 1.4: continuity errors over the clean capture (R1 audit)
    val cc = one("p1_4_continuity",
      sum(col("cc_errors")), sum(col("n_packets")))(
      TsPipeline.ccAudit(pkts(s)))

    // packets-per-0.5 s threshold pieces: PCR span ticks + packet count
    val wd = Window.partitionBy("pid").orderBy("seq")
    val spanNpk = pk.filter(col("af.pcr").isNotNull)
      .select(col("pid"), col("seq"), col("af.pcr").as("pcr"))
      .withColumn("delta", col("pcr") - lag(col("pcr"), 1).over(wd))
      .filter(col("delta") > 0 && col("delta") <= 27000000L)
      .groupBy("pid").agg(sum(col("delta")).as("pid_ticks"))
      .agg(max(col("pid_ticks")).as("span_ticks"))
      .crossJoin(pk.agg(count(lit(1)).as("n_pk")))

    // 1.3.a / 1.5.a: PAT/PMT section-start cadence vs the threshold
    val wgap = Window.partitionBy("pid", "table_id").orderBy("first_seq")
    val gaps = sc.filter(col("tableId").isin(0, 2))
      .select(col("pid"), col("tableId").as("table_id"),
        col("firstSeq").as("first_seq"))
      .withColumn("gap",
        col("first_seq") - lag(col("first_seq"), 1).over(wgap))
      .filter(col("gap").isNotNull)
      .crossJoin(broadcast(spanNpk))
      .withColumn("late", expr(
        "cast(gap as decimal(38,0)) * span_ticks > " +
          "cast(n_pk as decimal(38,0)) * 13500000"))
    val patC = one("p1_3a_pat_cadence",
      sum(when(col("late") && col("table_id") === 0, 1L).otherwise(0L)),
      sum(when(col("table_id") === 0, 1L).otherwise(0L)))(gaps)
    val pmtC = one("p1_5a_pmt_cadence",
      sum(when(col("late") && col("table_id") === 2, 1L).otherwise(0L)),
      sum(when(col("table_id") === 2, 1L).otherwise(0L)))(gaps)

    // 1.6: every ES PID the current PMT references must carry packets
    val esPids = pmt(s).select(col("elementary_pid")).distinct()
    val seen = pk.select(col("pid")).distinct()
    val pidRow = one("p1_6_pid_missing",
      sum(when(col("pid").isNull, 1L).otherwise(0L)), count(lit(1)))(
      esPids.join(seen, esPids("elementary_pid") === seen("pid"), "left"))

    // 2.2: section CRC gate
    val crc = one("p2_2_crc",
      sum(when(!col("crcOk"), 1L).otherwise(0L)), count(lit(1)))(sc)

    sync.unionByName(cc).unionByName(patC).unionByName(pmtC)
      .unionByName(pidRow).unionByName(crc)
  }

  /** ts24 — PTS MONOTONICITY AUDIT: per ES PID, presentation stamps
    * that step BACKWARD in arrival order (decoder-confusing unless
    * B-frame reordering explains them), excluding legitimate 33-bit
    * wraparound (a backward step of nearly 2^33 is the counter
    * wrapping, not a regression — the standard guard). Complements
    * ts7's range stats and ts22's PCR-lead audit with the ordering
    * check itself. One window per PID over the PES layer only. */
  def ts24PtsMonotonic(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pes = pkts(s)
      .filter(p => p.pusi && p.hasPayload)
      .flatMap { p =>
        graft.ts.PesCodec.parseHeader(p.payload)
          .flatMap(h => h.pts.map(t => (p.seq, p.pid, t)))
      }.toDF("seq", "pid", "pts")
    val w = Window.partitionBy("pid").orderBy("seq")
    pes.withColumn("prev", lag(col("pts"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy("pid")
      .agg(count(lit(1)).as("n_steps"),
        sum(when(col("pts") < col("prev") &&
          col("prev") - col("pts") < 4294967296L, 1L).otherwise(0L))
          .as("n_backward"),
        max(when(col("pts") < col("prev") &&
          col("prev") - col("pts") < 4294967296L,
          col("prev") - col("pts"))).as("max_backstep_90k"))
  }

  /** ts25 — TR 101 290 PRIORITY-2 TIMING ROLLUP, completing ts23's P1
    * table with the clock-side checks a monitoring probe reports next:
    * 2.3a PCR repetition (consecutive PCRs of a PID more than 40 ms
    * apart — 1 080 000 ticks at 27 MHz — without a signalled
    * discontinuity), 2.3b PCR discontinuity (a jump past 100 ms with
    * the AF discontinuity_indicator unset — the flagged-jump fixture
    * case is the legal one), and 2.5 PTS repetition (consecutive PTSs
    * of an ES more than 700 ms — 63 000 ticks at 90 kHz — apart).
    * PCR-accuracy (2.4, ±500 ns vs a reference clock) needs a clock
    * model a passive file probe doesn't have — out of scope, like the
    * reference's probe. Same (check_id, n_bad, n_obs) contract as
    * ts23; both walks are one lag window per PID over layers the lake
    * already shares, wrap-guarded the same way as ts20/ts24. */
  def ts25Tr101290P2(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def one(check: String, bad: org.apache.spark.sql.Column,
        obs: org.apache.spark.sql.Column)(df: DataFrame) =
      df.agg(coalesce(bad, lit(0L)).cast("long").as("n_bad"),
          coalesce(obs, lit(0L)).cast("long").as("n_obs"))
        .select(lit(check).as("check_id"), col("n_bad"), col("n_obs"))

    val wd = Window.partitionBy("pid").orderBy("seq")
    val pcr = pkts(s).toDF().filter(col("af.pcr").isNotNull)
      .select(col("pid"), col("seq"), col("af.pcr").as("pcr"),
        coalesce(col("af.discontinuity"), lit(false)).as("disc"))
      .withColumn("delta", col("pcr") - lag(col("pcr"), 1).over(wd))
      .filter(col("delta") > 0)
    val rep = one("p2_3a_pcr_repetition",
      sum(when(col("delta") > 1080000L && !col("disc"), 1L)
        .otherwise(0L)), count(lit(1)))(pcr)
    val disc = one("p2_3b_pcr_discontinuity",
      sum(when(col("delta") > 2700000L && !col("disc"), 1L)
        .otherwise(0L)), count(lit(1)))(pcr)
    val pes = pkts(s)
      .filter(p => p.pusi && p.hasPayload)
      .flatMap { p =>
        graft.ts.PesCodec.parseHeader(p.payload)
          .flatMap(h => h.pts.map(t => (p.seq, p.pid, t)))
      }.toDF("seq", "pid", "pts")
      .withColumn("delta", col("pts") - lag(col("pts"), 1).over(wd))
      .filter(col("delta") > 0 && col("delta") < 4294967296L)
    val ptsRep = one("p2_5_pts_repetition",
      sum(when(col("delta") > 63000L, 1L).otherwise(0L)),
      count(lit(1)))(pes)
    rep.unionByName(disc).unionByName(ptsRep)
  }

  /** ts26 — MUX BANDWIDTH BUDGET per PID: packets, total bytes
    * (n·188), payload bytes, overhead bytes (header + AF + AF
    * stuffing = 188·n − 4·n − payload) and the mux share in ppm, with
    * the null PID (8191) flagged — the "where does my multiplex
    * bandwidth go" report a remux (E5/ts16) is sized from. One
    * partial-aggregated rollup over the shared packet lake plus a
    * 1-row broadcast total; the oracle re-derives every column from
    * the dumped per-packet payload lengths. */
  def ts26MuxBudget(s: SparkSession, d: String): DataFrame = {
    val per = pkts(s).toDF()
      .select(col("pid"),
        coalesce(length(col("payload")), lit(0)).cast("long")
          .as("plen"))
      .groupBy("pid")
      .agg(count(lit(1)).as("n_packets"),
        sum(col("plen")).as("payload_bytes"))
    val tot = per.agg(sum(col("n_packets")).as("tot_packets"))
    per.crossJoin(broadcast(tot))
      .select(col("pid"), col("n_packets"),
        (col("n_packets") * 188L).as("bytes"),
        col("payload_bytes"),
        (col("n_packets") * 184L - col("payload_bytes"))
          .as("overhead_bytes"),
        expr("n_packets * 1000000 div tot_packets").as("share_ppm"),
        (col("pid") === 8191).as("is_null_pid"))
      .orderBy(col("pid"))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts25_tr101290_p2" -> ts25Tr101290P2 _,
    "ts26_mux_budget" -> ts26MuxBudget _,
    "ts24_pts_monotonic" -> ts24PtsMonotonic _,
    "ts23_tr101290" -> ts23Tr101290 _,
    "ts22_pts_pcr_lead" -> ts22PtsPcrLead _,
    "ts21_psi_cadence" -> ts21PsiCadence _,
    "ts20_pcr_jitter" -> ts20PcrJitter _,
    "ts19_reject_stats" -> ts19RejectStats _,
    "ts16_cbr_plan" -> ts16CbrPlan _,
    "ts18_fill_forward" -> ts18FillForward _,
    "ts17_pcr_restamp" -> ts17PcrRestamp _,
    "ts8_peek_pid_stats" -> ts8PeekPidStats _,
    "ts9_program_proc_doc" -> ts9ProgramProcDoc _,
    "ts10_instance_doc" -> ts10InstanceDoc _,
    "ts11_es_proc_doc" -> ts11EsProcDoc _,
    "ts7_pes_stats" -> ts7PesStats _,
    "ts1_pid_stats" -> ts1PidStats _,
    "ts2_cc_audit" -> ts2CcAudit _,
    "ts3_section_stats" -> ts3SectionStats _,
    "ts4_pat" -> ts4Pat _,
    "ts5_pmt_es" -> ts5PmtEs _,
    "ts6_programs_summary" -> ts6ProgramsSummary _,
    "ts14_mpts_bitrate" -> ts14MptsBitrate _,
    "ts15_mpts_summary" -> ts15MptsSummary _,
  )
}
