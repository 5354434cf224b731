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
