package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A2 — `input_bitrate_peak` with clear flag (`app_prog_proc.c:110-115`,
  * `670-684`): a running maximum that restarts whenever a reset marker is
  * seen. Implemented as a typed `Aggregator` (SURVEY §2.14 maps the
  * reference's stateful gauges to Aggregator[IN, BUF, OUT]).
  *
  * Input rows are (value, reset); the merge keeps the max observed since
  * the latest reset in *sequence* order only when used over ordered
  * groups — in unordered aggregation the semantics are "max of values
  * not superseded by a reset in the same partition fold", so feed it
  * sorted streams (flatMapGroups) or per-window groups.
  */
object PeakWithReset extends Aggregator[(Double, Boolean), Double, Double] {
  override def zero: Double = Double.NegativeInfinity
  override def reduce(buf: Double, in: (Double, Boolean)): Double =
    if (in._2) in._1 else math.max(buf, in._1)
  override def merge(a: Double, b: Double): Double = math.max(a, b)
  override def finish(buf: Double): Double =
    if (buf == Double.NegativeInfinity) 0.0 else buf
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
