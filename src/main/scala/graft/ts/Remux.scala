package graft.ts

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Program-processor output surface (SURVEY §2.11 E2–E5,
  * `app_prog_proc.c:95-139`): re-multiplexing with bit-rate control,
  * PCR restamping, and stuffing insertion. The reference's ES pipeline
  * body is a bypass; the rate/PCR machinery is the real semantics and is
  * implemented here as distributed DataFrame/Dataset transforms.
  */
object Remux {

  val TicksPerSec = 27000000L // 27 MHz PCR clock (`ts.h:122-133`)

  /** E4 over a stream: shift every PCR/OPCR by `offsetTicks` (the
    * restamp that re-bases the output clock,
    * `ts_enc.c:274-301`). Model-level map; `TsCodec.encode` serializes.
    */
  def pcrRestamp(pkts: Dataset[TsPacket], offsetTicks: Long)
      : Dataset[TsPacket] = {
    import pkts.sparkSession.implicits._
    val wrap = (1L << 33) * 300L
    pkts.map { p =>
      p.copy(af = p.af.map(af => af.copy(
        pcr = af.pcr.map(v => (v + offsetTicks) % wrap),
        opcr = af.opcr.map(v => (v + offsetTicks) % wrap))))
    }
  }

  /** CBR padding plan (E3/E5, `app_prog_proc.c:110-128` cbr setting):
    * bucket the stream into 1-second PCR windows, count payload packets,
    * and compute how many stuffing packets each bucket needs to hit the
    * target rate. Returns (bucket, n_packets, n_stuffing). */
  def cbrPlan(pkts: Dataset[TsPacket], targetBps: Long): DataFrame =
    cbrPlanStreams(
      pkts.toDF().select(
        lit(0L).as("stream_id"), col("seq"),
        (col("af.pcr") / TicksPerSec).cast("long").as("pcr_sec")),
      targetBps)
      .drop("stream_id")

  /** The multi-stream, partition-parallel fill behind `cbrPlan`. Input:
    * (stream_id, seq, pcr_sec nullable); non-PCR packets inherit the
    * bucket of the latest PCR ≤ their seq WITHIN their stream.
    *
    * A naive `last(ignoreNulls) over (ORDER BY seq)` collapses the whole
    * stream into one task. Instead: deterministic seq-range slices
    * (`pnum = seq div step`) make every window partition-local and
    * parallel; rows before a slice's first PCR resolve through a
    * broadcast of per-slice boundary anchors (the last PCR second of any
    * earlier slice of the same stream) — two passes, no global window,
    * scales with executors × streams. */
  def cbrPlanStreams(tl: DataFrame, targetBps: Long): DataFrame = {
    val targetPktsPerSec = (targetBps / 8 / TsCodec.PacketSize).toInt
    val nSlices =
      math.max(1, tl.sparkSession.sparkContext.defaultParallelism)
    // one scalar job for the slice width (count-scale, like the seq
    // assignment in TsPipeline.packets)
    val mxRow = tl.agg(max(col("seq"))).head()
    val step =
      if (mxRow.isNullAt(0)) 1L
      else math.max(1L, mxRow.getLong(0) / nSlices + 1)
    val sliced = tl.withColumn("pnum", floor(col("seq") / step))
    // pass 1 (tiny): last PCR second per (stream, slice), carried
    // forward to later slices — slice grid × streams rows, broadcast
    val anchors = sliced.filter(col("pcr_sec").isNotNull)
      .groupBy("stream_id", "pnum")
      .agg(max_by(col("pcr_sec"), col("seq")).as("anchor"))
    // carry for a slice = anchor of the latest earlier slice of the same
    // stream — a theta-join on the slice grid (slices × streams rows,
    // nothing data-sized), no window needed
    val carry = sliced.select("stream_id", "pnum").distinct().as("g")
      .join(anchors.as("a"),
        col("g.stream_id") === col("a.stream_id") &&
          col("a.pnum") < col("g.pnum"))
      .groupBy(col("g.stream_id"), col("g.pnum"))
      .agg(max_by(col("a.anchor"), col("a.pnum")).as("carry"))
      .toDF("stream_id", "pnum", "carry")
    // pass 2: slice-local forward fill (parallel windows), leading
    // nulls resolved from the broadcast carry
    val wLocal = Window.partitionBy("stream_id", "pnum").orderBy("seq")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliced
      .withColumn("local_fill",
        last(col("pcr_sec"), ignoreNulls = true).over(wLocal))
      .join(broadcast(carry), Seq("stream_id", "pnum"), "left")
      .withColumn("bucket", coalesce(col("local_fill"), col("carry")))
      .filter(col("bucket").isNotNull)
      .groupBy("stream_id", "bucket")
      .agg(count(lit(1)).as("n_packets"))
      .withColumn("n_stuffing",
        greatest(lit(0), lit(targetPktsPerSec) - col("n_packets")))
  }

  /** Materialize the CBR plan: emit the original packets plus the
    * required number of encoded stuffing packets per bucket
    * (`ts_enc.c:223-273`). Output rows are encoded 188-B buffers ready
    * for the K1 UDP sink. */
  def cbrStuff(spark: SparkSession, pkts: Dataset[TsPacket],
      targetBps: Long): DataFrame = {
    import spark.implicits._
    val plan = cbrPlan(pkts, targetBps)
    val stuffing = plan
      .select(col("bucket"),
        explode(sequence(lit(1), col("n_stuffing").cast("int")))
          .as("i"))
      .as[(Long, Int)]
      .map { case (bucket, i) =>
        (bucket, TsCodec.encodeStuffing(i % 16))
      }
      .toDF("bucket", "bytes")
    val original = pkts.map(p => (p.seq, TsCodec.encode(p)))(
        Encoders.tuple(Encoders.scalaLong,
          Encoders.BINARY))
      .toDF("seq", "bytes")
      .select(col("bytes"))
    original.unionByName(stuffing.select(col("bytes")))
  }
}
