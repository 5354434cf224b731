package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.ts.{PsiSection, SectionAssembler, TsPacket}

/** R2 hosted on `transformWithState` (Spark 4's successor to
  * `flatMapGroupsWithState`): the identical pure state machine, with
  * state in a typed `ValueState` — this is the API the engine migrates
  * to as `flatMapGroupsWithState` ages out, and it requires the RocksDB
  * state store (`spark.sql.streaming.stateStore.providerClass`). */
object TwsOps {

  class SectionProcessor
      extends StatefulProcessor[Int, TsPacket, PsiSection] {
    @transient private var state: ValueState[SectionAssembler.State] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SectionAssembler.State](
        "asm", Encoders.product[SectionAssembler.State],
        TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[TsPacket],
        timerValues: TimerValues): Iterator[PsiSection] = {
      var st = Option(state.get()).getOrElse(SectionAssembler.initialState)
      val out = Vector.newBuilder[PsiSection]
      rows.toArray.sortBy(_.seq).foreach { p =>
        val (next, emitted) = SectionAssembler.step(st, p)
        st = next
        out ++= emitted
      }
      state.update(st)
      out.result().iterator
    }
  }

  def sectionsTws(pkts: Dataset[TsPacket]): Dataset[PsiSection] = {
    import pkts.sparkSession.implicits._
    pkts
      .groupByKey(_.pid)
      .transformWithState(new SectionProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
