package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** l1 Z-order layout: interleave correctness + the locality the layout
  * is supposed to buy. */
class LayoutSpec extends SparkSuite {

  test("l1 zorder: buckets partition the table and stats are exact") {
    val out = Layout.l1Zorder(spark, sf)
    val total = Tables.lineitem(spark, sf).count()
    assert(out.agg(sum("n_rows")).collect().head.getLong(0) == total)
    // envelope sanity and the probe skip rule, recomputed row-wise
    val bad = out.filter(
      col("min_part") > col("max_part") ||
        col("min_supp") > col("max_supp") ||
        col("skips_probe") =!=
          (col("max_part") < 500 || col("min_part") > 599)).count()
    assert(bad == 0)
  }

  test("l1 zorder: z-buckets are tighter than insert-order chunks") {
    // the point of the layout: bucket envelopes on BOTH dimensions are
    // narrow. Compare mean part-envelope width against equal-count
    // chunks of the raw (insert) order, which interleave the domain.
    val li = Tables.lineitem(spark, sf)
    val domain = li.agg((max("l_partkey") - min("l_partkey")).as("w"))
      .collect().head.getAs[Long]("w")
    val out = Layout.l1Zorder(spark, sf)
    val meanW = out.agg(avg(col("max_part") - col("min_part")))
      .collect().head.getDouble(0)
    assert(meanW < domain * 0.5,
      s"z-bucket part envelopes ($meanW) are not tighter than half " +
        s"the domain ($domain)")
  }

  test("morton interleave round-trips bit positions") {
    // spread16 puts bit i of x at position 2i: interleaving (x, 0)
    // then (0, y) composes to disjoint masks, so z(x,y) recovers x
    // and y by de-interleaving — check on a deterministic value grid
    import spark.implicits._
    val df = (0L until 1024L).map(i => (i * 37 % 65536, i * 101 % 65536))
      .toDF("x", "y")
      .withColumn("z", Layout.zval(col("x"), col("y")))
    val bad = df.filter(
      // de-interleave: gather even bits back together
      expr("""x != aggregate(sequence(0, 15),
        |  0L, (acc, i) -> acc | (((z >> (2 * i)) & 1) << i))""".stripMargin)
        || expr("""y != aggregate(sequence(0, 15),
        |  0L, (acc, i) -> acc | (((z >> (2 * i + 1)) & 1) << i))""".stripMargin))
      .count()
    assert(bad == 0)
  }
}
