package graft

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
}
