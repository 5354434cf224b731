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
    * target rate. Returns (bucket, n_packets, n_stuffing). Packets
    * without a PCR timeline inherit the bucket of their seq position via
    * the per-PID monotone interpolation done upstream; here buckets come
    * from the PCR-bearing reference PID. */
  def cbrPlan(pkts: Dataset[TsPacket], targetBps: Long): DataFrame = {
    val targetPktsPerSec = (targetBps / 8 / TsCodec.PacketSize).toInt
    val df = pkts.toDF()
    // per-second bucket from the PCR timeline; non-PCR packets count
    // into the bucket of the latest PCR ≤ their seq (window fill)
    // single-stream timeline ⇒ one ordered window (the reference's
    // per-instance regime); a multi-stream deployment partitions this
    // window by the stream id so each stream fills independently
    val withPcrSec = df
      .withColumn("pcr_sec",
        (col("af.pcr") / TicksPerSec).cast("long"))
      .withColumn("bucket",
        last(col("pcr_sec"), ignoreNulls = true).over(
          Window.orderBy("seq")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("bucket").isNotNull)
    withPcrSec
      .groupBy("bucket")
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
