package graft.ts

import graft.SparkSuite
import graft.operators.TsQueries

/** The composed REST documents (ts10 instance doc, ts11 ES-proc doc) and
  * the 0x59 subtitling-descriptor edit round-trip
  * (`mpeg2_sp.c:828-876`, `es_proc.js:87-108`, `psi_desc.c:251-392`). */
class DocQueriesSpec extends SparkSuite {

  private def parseDoc(doc: String) = {
    import spark.implicits._
    spark.read.json(Seq(doc).toDS)
  }

  test("ts10 instance doc carries the reference GET's field set") {
    val row = TsQueries.ts10InstanceDoc(spark, sf).collect()
    assert(row.length == 1)
    val doc = row.head.getAs[String]("doc")
    val parsed = parseDoc(doc)
    // the reference rest_get shape (mpeg2_sp.c doc block)
    assert(parsed.columns.toSet == Set("id_str", "input_bitrate",
      "log_traces", "settings", "programs", "program_processors", "links"))
    val r = parsed.selectExpr(
      "id_str",
      "settings.input_url", "settings.tag",
      "settings.flag_clear_logs",
      "settings.flag_purge_disassociated_processors",
      "programs[0].program_number", "programs[0].service_name",
      "programs[0].processor_associated",
      "programs[0].links[0].rel",
      "program_processors[0].program_number",
      "program_processors[0].input_bitrate",
      "program_processors[0].settings.selected_brctrl_type_value",
      "links[0].href").first()
    assert(r.getString(0) == "mpeg2_sp-0")
    assert(r.getString(1) == TsPipeline.DefaultCapture)
    assert(r.getLong(5) == 1L) // the capture's single program
    assert(r.getBoolean(7)) // PMT present => processor associated
    assert(r.getString(8) == "self")
    assert(r.getLong(9) == 1L)
    assert(r.getDouble(10) > 0.0) // bitrate present and positive
    assert(r.getString(11) == "CBR")
    assert(r.getString(12) == "mpeg2_sp-0.json")
  }

  test("ts11 es-proc docs: one per ES with typed extension + defaults") {
    val rows = TsQueries.ts11EsProcDoc(spark, sf).collect()
    // capture PMT: (0x81 AC-3, pid 68), (0x1B H.264, pid 69)
    assert(rows.map(_.getAs[Int]("elementary_pid")).toSeq == Seq(68, 69))
    val byPid = rows.map(r =>
      r.getAs[Int]("elementary_pid") -> r.getAs[String]("doc")).toMap
    val audio = parseDoc(byPid(68)).selectExpr("extension_type",
      "time_stamp_stats.n_pes", "settings.restamping",
      "settings.ts_pcr_guard_msec", "input_bitrate").first()
    assert(audio.getString(0) == "audio")
    assert(audio.getLong(1) > 0)
    assert(!audio.getBoolean(2))
    assert(audio.getLong(3) == 200L)
    assert(audio.getDouble(4) > 0.0)
    val video = parseDoc(byPid(69)).selectExpr("extension_type",
      "time_stamp_stats.max_pts").first()
    assert(video.getString(0) == "video")
    assert(video.getLong(1) > 0)
  }

  test("0x59 subtitling descriptor: parse -> edit -> re-encode -> " +
      "re-parse round-trip") {
    val original = Descriptor(0x59, Array.emptyByteArray, None, None, None,
      Some(Seq(
        SubtitlingEntry("spa", 0x10, 0x0001, 0x0002),
        SubtitlingEntry("eng", 0x20, 0x0003, 0x0004))))
    val prog = PmtProgram(3, 200, Nil,
      Seq(EsEntry(0x06, 201, Seq(original))))
    // encode -> decode restores every field
    val sec = PsiCodec.decodeSection(300, 0L,
      PsiCodec.encodePmt(prog, version = 5)).get
    assert(sec.crcOk && sec.versionNumber == 5)
    val parsed = PsiCodec.decodePmt(sec).get
    val d0 = parsed.es.head.descriptors.head
    assert(d0.tag == 0x59)
    assert(d0.subtitling.get == original.subtitling.get)
    // edit one page id (the UI's editable field), re-encode, re-parse
    val edited = parsed.copy(es = parsed.es.map(e => e.copy(
      descriptors = e.descriptors.map(dsc => dsc.copy(
        subtitling = dsc.subtitling.map(_.map(t =>
          if (t.lang == "spa") t.copy(compositionPageId = 0x0042)
          else t)))))))
    val parsed2 = PsiCodec.decodePmt(
      PsiCodec.decodeSection(300, 1L,
        PsiCodec.encodePmt(edited, version = 6)).get).get
    val subs2 = parsed2.es.head.descriptors.head.subtitling.get
    assert(subs2.find(_.lang == "spa").get.compositionPageId == 0x0042)
    assert(subs2.find(_.lang == "eng").get ==
      original.subtitling.get.find(_.lang == "eng").get)
    // and the edited table flows through the distributed subtitling view
    import spark.implicits._
    val secs = spark.createDataset(Seq(
      PsiCodec.decodeSection(300, 1L,
        PsiCodec.encodePmt(edited, version = 6)).get))
    val rows = TsPipeline.pmtSubtitling(spark, secs)
      .orderBy("lang").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("lang")).toSeq == Seq("eng", "spa"))
    assert(rows.find(_.getAs[String]("lang") == "spa").get
      .getAs[Int]("composition_page_id") == 0x42)
  }
}
