package graft

import org.apache.spark.sql.functions.col

import graft.operators.Multimodal

/** The m2 contract: the codegen'd expression histogram and the batch-UDF
  * slot (the `mapInPandas`-shaped extension point a real codec plugs
  * into) must produce identical (doc_id, h0..h15) relations — swapping a
  * real decoder into the slot changes the VALUES, never the plumbing. */
class MultimodalSpec extends SparkSuite {

  test("m2 batch-UDF slot == expression histogram, row for row") {
    val expr = Multimodal.m2FeatureExtract(spark, sf)
    val batch = Multimodal.m2FeatureExtractBatch(spark, sf)
    assert(expr.count() == batch.count())
    assert(expr.exceptAll(batch).isEmpty && batch.exceptAll(expr).isEmpty)
  }

  test("m4 resize: 2x stride decimation on a known payload") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 96 bytes = 3 full 32-byte rows -> out_h = 1, out_w = 16; the
    // sampled bytes are row 0's even columns: payload(0,2,...,30)
    val payload = (0 until 96).map(i => ('A' + i % 26).toChar).mkString
    val one = Seq((7L, payload)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("media"),
        length(col("text")).as("n_bytes"))
    val row = Multimodal.resizeOf(one).collect()(0)
    assert(row.getAs[Int]("out_w") == 16 && row.getAs[Int]("out_h") == 1)
    assert(row.getAs[Int]("n_out_bytes") == 16)
    val expectedHex = (0 until 32 by 2)
      .map(i => f"${payload(i).toInt}%02X").mkString
    val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expectedHex.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(row.getAs[String]("resized_hash") == expectedMd5)
    // corpus run: dims are consistent on every row
    val df = Multimodal.m4Resize(spark, sf)
    assert(df.filter(col("n_out_bytes") =!=
      col("out_w") * col("out_h")).count() == 0)
  }

  test("m5 segment stats: segments conserve bytes, nibble sums bounded") {
    val df = Multimodal.m5SegmentStats(spark, sf).cache()
    // per-doc byte conservation: segment lengths re-sum to the payload
    val perDoc = df.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sum("seg_bytes").as("tot"))
    val meta = Multimodal.media(spark, sf).select("doc_id", "n_bytes")
    assert(perDoc.join(meta, Seq("doc_id"))
      .filter(col("tot") =!= col("n_bytes")).count() == 0)
    // every segment but a doc's last is exactly 256 B
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val notLast = df.withColumn("mx",
      org.apache.spark.sql.functions.max("seg").over(w))
      .filter(col("seg") < col("mx"))
    assert(notLast.filter(col("seg_bytes") =!= 256).count() == 0)
    // nibble sum within [0, 15 * 2 * seg_bytes]
    assert(df.filter(col("nibble_sum") < 0 ||
      col("nibble_sum") > col("seg_bytes") * 30).count() == 0)
    df.unpersist()
  }

  test("m7 segment near-dup: aligned copied footage pairs at the " +
    "shared-segment count, sub-threshold overlap filtered") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def chunk(c: Char) = c.toString * 256
    val planted = Seq(
      (1L, chunk('a') + chunk('b') + chunk('c')),
      (2L, chunk('a') + chunk('b') + chunk('d')),  // shares a, b with 1
      (3L, chunk('c'))                             // shares only c with 1
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("media"),
        length(col("text").cast("binary")).as("n_bytes"))
    val pairs = graft.operators.Multimodal.m7Of(planted).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("doc_a") == 1L &&
      pairs.head.getAs[Long]("doc_b") == 2L &&
      pairs.head.getAs[Long]("n_shared_segs") == 2L)
    // corpus run: ordered pairs, threshold respected
    val df = graft.operators.Multimodal.m7SegmentNearDup(spark, sf)
    assert(df.filter(col("doc_a") >= col("doc_b") ||
      col("n_shared_segs") < 2).count() == 0)
  }
}
