package graft.ts

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** End-to-end over the reference's own capture
  * (`mpeg2ts/utests/assets/san_diego_200kbps.ts`, 15 029 packets).
  * Expected values derived independently with a Python ISO-13818-1 parser:
  * PAT v14 {program 1 → PID 66}; PMT v27 {pcr_pid 69,
  * ES = (0x81,68),(0x1B,69)}; 349 PAT + 349 PMT sections, all CRC-valid;
  * 0 CC errors; 1252 PCR-bearing packets.
  */
class CaptureE2ESpec extends SparkSuite {

  private lazy val pkts = TsPipeline.packets(spark).cache()

  test("packet scan: 15029 packets, PID histogram matches") {
    assert(pkts.count() == 15029)
    val hist = TsPipeline.pidStats(pkts).collect()
      .map(r => r.getAs[Int]("pid") -> r.getAs[Long]("n_packets")).toMap
    assert(hist == Map(0 -> 349L, 66 -> 349L, 68 -> 5726L, 69 -> 8605L))
    val pcrs = TsPipeline.pidStats(pkts)
      .agg(sum("n_pcr")).first().getLong(0)
    assert(pcrs == 1252L)
  }

  test("continuity audit: zero errors on the clean capture") {
    val errs = TsPipeline.ccAudit(pkts)
      .agg(sum("cc_errors")).first().getLong(0)
    assert(errs == 0L)
  }

  test("section reassembly: 349+349 sections, all CRC ok") {
    val secs = TsPipeline.psiSections(spark, pkts).collect()
    val byPid = secs.groupBy(_.pid).view.mapValues(_.length).toMap
    assert(byPid == Map(0 -> 349, 66 -> 349))
    assert(secs.forall(_.crcOk))
  }

  test("PAT state: version 14, program 1 -> PID 66") {
    val pat = TsPipeline.patTable(spark, TsPipeline.psiSections(spark, pkts))
      .collect()
    assert(pat.map(r => (r.getInt(0), r.getInt(1))).toSet == Set((1, 66)))
  }

  test("PMT state: program 1, pcr 69, ES {(0x81,68),(0x1B,69)}") {
    val pmt = TsPipeline.pmtTable(spark, TsPipeline.psiSections(spark, pkts))
      .collect()
      .map(r => (r.getAs[Int]("program_number"), r.getAs[Int]("pcr_pid"),
        r.getAs[Int]("stream_type"), r.getAs[Int]("elementary_pid")))
    assert(pmt.toSet == Set((1, 69, 0x81, 68), (1, 69, 0x1B, 69)))
  }

  test("programs summary: joined view (no SDT in this mux -> empty name)") {
    val rows = TsPipeline.programsSummary(spark, pkts).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Int]("program_number") == 1)
    assert(r.getAs[Int]("reference_pid") == 66)
    assert(r.getAs[String]("service_name") == "")
    assert(r.getAs[Int]("pcr_pid") == 69)
    assert(r.getAs[Long]("n_es") == 2L)
  }

  test("sections on the FULL mux (hot ES PIDs included) stays bounded " +
    "and agrees with the PSI-routed path on PSI PIDs") {
    // misuse case the operator must survive: no PSI routing — the two hot
    // ES PIDs (14 331 of 15 029 packets) flow through the assembler too.
    // The sort-within-partitions + streaming-run design makes this
    // wasted CPU, not an executor OOM; PES payloads mostly fail to frame
    // as sections, and whatever does frame must not pollute PSI PIDs.
    val full = TsPipeline.sections(pkts).collect()
    val psiOnly = TsPipeline.psiSections(spark, pkts).collect()
    def key(s: PsiSection) =
      (s.pid, s.tableId, s.versionNumber, s.sectionNumber, s.firstSeq)
    assert(full.filter(s => s.pid == 0 || s.pid == 66).map(key).sorted
      .sameElements(psiOnly.map(key).sorted))
  }

  test("version churn: a new PAT version supersedes the old one") {
    import spark.implicits._
    // synthesize: 2 sections of v1, then v2 arrives → latest = v2
    def patPkt(seq: Long, ver: Int, rows: Seq[PatRow]) = {
      val sec = PsiCodec.encodePat(rows, 1, ver)
      TsPacket(seq, 0, tei = false, pusi = true, priority = false,
        scrambling = 0, hasAf = false, hasPayload = true,
        cc = (seq % 16).toInt, af = None,
        payload = Array[Byte](0) ++ sec ++
          Array.fill[Byte](184 - 1 - sec.length)(0xFF.toByte))
    }
    val stream = Seq(
      patPkt(0, 1, Seq(PatRow(1, 100))),
      patPkt(1, 1, Seq(PatRow(1, 100))),
      patPkt(2, 2, Seq(PatRow(1, 200), PatRow(2, 300))))
    val pat = TsPipeline.patTable(spark,
      TsPipeline.sections(stream.toDS())).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(pat == Set((1, 200), (2, 300)))
  }

  test("ts9 program-proc document: PCR-derived bitrate in mux range") {
    val rows = graft.operators.TsQueries
      .ts9ProgramProcDoc(spark, "").collect()
    assert(rows.length == 1) // single-program capture
    val doc = rows.head.getString(1)
    assert(rows.head.getInt(0) == 1)
    val parsed = spark.read.json(
      spark.createDataset(Seq(doc))(org.apache.spark.sql.Encoders.STRING))
    val r = parsed.collect().head
    val rate = r.getAs[Double]("input_bitrate")
    val peak = r.getAs[Double]("input_bitrate_peak")
    // the capture mux is ≈228 kbps (15 029 × 188 B over the ≈99 s PCR
    // timeline); the program (ES+PMT+PCR PIDs) is most of it
    assert(rate > 180 && rate < 240, s"rate=$rate")
    assert(peak >= rate && peak < 400, s"peak=$peak")
    assert(r.getAs[org.apache.spark.sql.Row]("settings")
      .getAs[String]("selected_brctrl_type_value") == "CBR")
  }

  test("F1 rejects channel: corrupted frames land in the errors side") {
    // copy the first 100 capture packets, break sync on 3 of them
    val data = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(TsPipeline.DefaultCapture))
    val buf = java.util.Arrays.copyOfRange(data, 0, 100 * 188)
    Seq(7, 42, 99).foreach(i => buf(i * 188) = 0x00)
    val tmp = java.nio.file.Files.createTempFile("graft-corrupt", ".ts")
    java.nio.file.Files.write(tmp, buf)
    try {
      val (good, bad) = TsPipeline.packetsWithRejects(spark, tmp.toString)
      assert(good.count() == 97)
      val rejects = bad.collect()
      assert(rejects.length == 3)
      assert(rejects.map(_.seq).toSet == Set(7L, 42L, 99L))
      assert(rejects.forall(_.reason == "bad_sync"))
    } finally java.nio.file.Files.delete(tmp)
  }

  test("ts19 fixture: planted corruption counts and positions are exact") {
    val (good, bad) = TsPipeline.packetsWithRejects(
      spark, TsPipeline.ensureCorruptedCapture())
    val n = 15029L
    // ceil-count of i < n with i % 97 == r, r in {13, 50}: both 155
    val expectPer = (0L until n).count(i => i % 97 == 13).toLong
    val rejects = bad.collect()
    assert(good.count() + rejects.length == n)
    val byReason = rejects.groupBy(_.reason).view.mapValues(_.length.toLong)
    assert(byReason("bad_sync") == expectPer)
    assert(byReason("bad_af_length") == expectPer)
    assert(rejects.filter(_.reason == "bad_sync")
      .forall(_.seq % 97 == 13))
    assert(rejects.filter(_.reason == "bad_af_length")
      .forall(_.seq % 97 == 50))
    // and the driver-facing ts19 aggregation mirrors the same numbers
    val agg = graft.operators.TsQueries.ts19RejectStats(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg == Map("ok" -> (n - 2 * expectPer),
      "bad_sync" -> expectPer, "bad_af_length" -> expectPer))
  }
}
