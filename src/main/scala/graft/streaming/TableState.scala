package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ts.PsiSection

/** R3+R4 as a streaming operator (`psi_table_dec.c:59-205`,
  * `psi_proc.c:329-397`): per (pid, tableId, extension), collect sections
  * of one version into positions 0..last_section_number; a section of a
  * *different* version discards the in-flight collection ("parsing new
  * version", `psi_table_dec.c:164`); `current_next=0` sections are
  * skipped (`psi_dec.c:180-185`); a complete table is emitted once per
  * distinct version. */
object TableState {

  case class TableKey(pid: Int, tableId: Int, tableIdExtension: Int)

  case class Buf(version: Int, last: Int,
      sections: Map[Int, Array[Byte]])

  case class CompleteTable(
      pid: Int, tableId: Int, tableIdExtension: Int, versionNumber: Int,
      sectionBytes: Seq[Array[Byte]])

  /** Pure fold, shared by batch and streaming hosts. */
  def step(buf: Option[Buf], sec: PsiSection)
      : (Option[Buf], Option[CompleteTable]) = {
    if (!sec.crcOk || !sec.currentNext) return (buf, None)
    val b0 = buf match {
      case Some(b) if b.version == sec.versionNumber => b
      case _ => Buf(sec.versionNumber, sec.lastSectionNumber, Map.empty)
    }
    val b1 = b0.copy(sections =
      b0.sections.updated(sec.sectionNumber, sec.bytes))
    if (b1.sections.size == b1.last + 1 &&
      (0 to b1.last).forall(b1.sections.contains)) {
      val table = CompleteTable(sec.pid, sec.tableId,
        sec.tableIdExtension, b1.version,
        (0 to b1.last).map(b1.sections))
      // keep the buffer: duplicates of the same version won't re-emit
      // because we only emit on the transition to complete
      (Some(b1.copy(sections = b1.sections)), Some(table))
    } else (Some(b1), None)
  }

  /** R5 streaming — the reference's 1 Hz `compose_pat_and_pmt`
    * (`mpeg2_sp.c:1484-1558`) as a snapshot composer: each micro-batch of
    * newly-completed tables updates a keyed register (foreachBatch +
    * idempotent upsert), and the programs-summary join runs over the
    * register — state composition OUTSIDE the stream, exactly like the
    * psi_thr register swap. Returns the query; read summaries from
    * `registerPath` with `summarizeRegister`. `onUpdate` fires after
    * every non-empty batch lands — the hook a serving layer uses to
    * drop its document memo, so a GET one trigger after a version
    * bump reads the new table (the reference's `psi_thr` ~1 s
    * convergence contract, `mpeg2_sp.c:78-81`). */
  def composeToRegister(tables: Dataset[CompleteTable],
      registerPath: String, onUpdate: () => Unit = () => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    tables.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[CompleteTable], _: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions._
          // replace-by-key: one row per (pid, tableId, ext) — the latest
          // version wins inside the batch; cross-batch wins by overwrite
          val latest = batch.toDF()
            .withColumn("rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("pid", "tableId", "tableIdExtension")
                .orderBy(col("versionNumber").desc)))
            .filter(col("rn") === 1).drop("rn")
            .withColumn("table_key",
              concat_ws("_", col("pid"), col("tableId"),
                col("tableIdExtension")))
          graft.sinks.Sinks.upsertByKey(latest, "table_key", registerPath)
          onUpdate()
        }
        ()
      }
      .start()

  /** Programs-summary join over the register written by
    * `composeToRegister` (PAT rows ⋈ PMT ES counts). */
  def summarizeRegister(spark: org.apache.spark.sql.SparkSession,
      registerPath: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val reg = spark.read.parquet(registerPath)
      .select(col("pid"), col("tableId"), col("tableIdExtension"),
        col("versionNumber"), col("sectionBytes"))
      .as[(Int, Int, Int, Int, Seq[Array[Byte]])]
    val pats = reg.filter(_._2 == 0).flatMap { case (pid, _, _, _, secs) =>
      secs.flatMap(b => graft.ts.PsiCodec.decodeSection(pid, 0, b).toSeq
        .flatMap(graft.ts.PsiCodec.decodePat))
    }.toDF("program_number", "reference_pid")
    val pmts = reg.filter(_._2 == 2).flatMap { case (pid, _, _, _, secs) =>
      secs.flatMap(b => graft.ts.PsiCodec.decodeSection(pid, 0, b).toSeq
        .flatMap(s => graft.ts.PsiCodec.decodePmt(s).toSeq))
        .map(p => (p.programNumber, p.pcrPid, p.es.length.toLong))
    }.toDF("program_number", "pcr_pid", "n_es")
    pats.filter(col("program_number") =!= 0)
      .join(pmts, Seq("program_number"), "left")
  }

  /** [[summarizeRegister]] plus the PMT VERSION each program currently
    * serves — the live-serving document shape: a version bump in the
    * stream must be visible in the next GET, so the version is part of
    * the document, not just the state key. */
  def programsWithVersions(spark: org.apache.spark.sql.SparkSession,
      registerPath: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val reg = spark.read.parquet(registerPath)
      .select(col("pid"), col("tableId"), col("tableIdExtension"),
        col("versionNumber"), col("sectionBytes"))
      .as[(Int, Int, Int, Int, Seq[Array[Byte]])]
    val pats = reg.filter(_._2 == 0).flatMap { case (pid, _, _, v, secs) =>
      secs.flatMap(b => graft.ts.PsiCodec.decodeSection(pid, 0, b).toSeq
        .flatMap(graft.ts.PsiCodec.decodePat))
        .map(p => (p.programNumber, p.referencePid, v))
    }.toDF("program_number", "reference_pid", "pat_version")
    val pmts = reg.filter(_._2 == 2).flatMap { case (pid, _, _, v, secs) =>
      secs.flatMap(b => graft.ts.PsiCodec.decodeSection(pid, 0, b).toSeq
        .flatMap(s => graft.ts.PsiCodec.decodePmt(s).toSeq))
        .map(p => (p.programNumber, p.pcrPid, p.es.length.toLong, v))
    }.toDF("program_number", "pcr_pid", "n_es", "pmt_version")
    pats.filter(col("program_number") =!= 0)
      .join(pmts, Seq("program_number"), "left")
  }

  def latestTablesStream(secs: Dataset[PsiSection])
      : Dataset[CompleteTable] = {
    import secs.sparkSession.implicits._
    secs
      .groupByKey(s => TableKey(s.pid, s.tableId, s.tableIdExtension))
      .flatMapGroupsWithState[Buf, CompleteTable](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: TableKey, it: Iterator[PsiSection], state: GroupState[Buf]) =>
          var buf = state.getOption
          var emittedVersions = Set.empty[Int]
          val out = Vector.newBuilder[CompleteTable]
          it.toArray.sortBy(_.firstSeq).foreach { sec =>
            val wasComplete = buf.exists(b =>
              b.version == sec.versionNumber &&
                b.sections.size == b.last + 1)
            val (next, emitted) = step(buf, sec)
            buf = next
            emitted.foreach { t =>
              if (!wasComplete && !emittedVersions.contains(t.versionNumber)) {
                out += t
                emittedVersions += t.versionNumber
              }
            }
          }
          buf.foreach(state.update)
          out.result().iterator
      }
  }
}
