package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** `SparkSessionExtensions` entry point: registers the engine's custom
  * expressions as SQL functions so `spark.sql("SELECT crc32_mpeg2(x)…")`
  * works next to the Scala Column API. Activate with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("crc32_mpeg2"),
      info("crc32_mpeg2", "crc32_mpeg2(binary) - CRC-32/MPEG2 checksum"),
      (args: Seq[Expression]) => Crc32Mpeg2Expr(args.head)))
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - float/double array dot product"),
      (args: Seq[Expression]) => VecDotExpr(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - L2 norm of a float/double array"),
      (args: Seq[Expression]) => VecNormExpr(args.head)))
    e.injectFunction((
      FunctionIdentifier("simhash"),
      info("simhash",
        "simhash(hashes, bits) - SimHash signature over an array<bigint>"),
      (args: Seq[Expression]) =>
        SimHashExpr(args(0), args(1).eval().asInstanceOf[Int])))
    e.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      info("hyperplane_sig",
        "hyperplane_sig(vec, bits) - random-hyperplane LSH signature"),
      (args: Seq[Expression]) =>
        HyperplaneSigExpr(args(0), args(1).eval().asInstanceOf[Int])))
    // Spark's internal runtime-filter bloom kernels, exposed to SQL —
    // bloom_agg builds the filter image (one aggregate pass), and
    // bloom_might_contain probes it (bloom side must be a constant or
    // scalar subquery, exactly as InjectRuntimeFilter uses them)
    e.injectFunction((
      FunctionIdentifier("bloom_agg"),
      info("bloom_agg",
        "bloom_agg(xxhash64_col, items, bits) - bloom filter image"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(args(0), args(1), args(2))))
    e.injectFunction((
      FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain",
        "bloom_might_contain(bloom, xxhash64_value) - membership probe"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("parse_ts"),
      info("parse_ts",
        "parse_ts(binary) - MPEG-TS header struct (ISO 13818-1)"),
      (args: Seq[Expression]) => graft.plans.ParseTsHeader(args.head)))
    // parse_ts(b).field → direct byte peek (the TS_BUF_GET_PID macro
    // fast path as an optimizer rewrite)
    e.injectOptimizerRule(_ => graft.plans.TsHeaderFieldPushdown)
    // the custom forward-fill physical operator (§2.14(c)) — sessions
    // without the extensions get it via ForwardFill.register at the
    // Column-API entry point
    e.injectPlannerStrategy(_ => graft.plans.ForwardFillStrategy)
  }
}
