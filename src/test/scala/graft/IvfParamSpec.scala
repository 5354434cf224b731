package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.Tables.embeddings

/** The IVF/PQ/SemDeDup scale knobs at NON-default settings — the oracle
  * rows pin the default configuration; these pin that the parameters
  * actually steer the operators and preserve their invariants. */
class IvfParamSpec extends SparkSuite {

  test("ivfAnn with nprobe = k (probe every list) equals brute-force e1") {
    // the recall dial's endpoint: scoring inside ALL inverted lists is
    // exactly the full-corpus scan, same kernel, same tie order
    val ivf = Similarity.ivfAnn(spark, sf, k = 8, nprobe = 8)
    val exact = Similarity.e1CosineTopK(spark, sf)
    assert(ivf.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(ivf).count() == 0)
  }

  test("ivfAnn at non-default k still yields 5 ranked rows per query") {
    val df = Similarity.ivfAnn(spark, sf, k = 32, nprobe = 8)
    val counts = df.groupBy("query_id").count().collect()
    assert(counts.length == 10 && counts.forall(_.getLong(1) == 5))
  }

  test("ivfPqOf at non-default m/ks keeps the rank contract") {
    // m=4 → 16-dim subspaces; ks=8 codes — coarser codebooks, same shape
    val df = Similarity.ivfPqOf(embeddings(spark, sf),
      k = 16, nprobe = 4, m = 4, ks = 8)
    val counts = df.groupBy("query_id").count().collect()
    assert(counts.length == 10 && counts.forall(_.getLong(1) == 5))
    assert(df.filter(col("rnk") < 1 || col("rnk") > 5).count() == 0)
  }

  test("ivfPqOf rejects m that does not divide dim") {
    intercept[IllegalArgumentException] {
      Similarity.ivfPqOf(embeddings(spark, sf), m = 7)
    }
  }

  test("semDedupOf is fanout-invariant (salted pair-gen, same result)") {
    val assigned = Similarity.e9Assigned(spark, sf)
    val plain = Similarity.semDedupOf(assigned, fanout = 1)
    val salted = Similarity.semDedupOf(assigned, fanout = 4)
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("semDedupK grows with the corpus, floors at the oracle default") {
    assert(Similarity.semDedupK(500) == 16)
    assert(Similarity.semDedupK(2000) == 16)
    assert(Similarity.semDedupK(1000000) == 1953)
  }

  test("e12 with shortlist >= corpus equals brute-force e1 (the binary " +
    "prefilter's recall endpoint); default shortlist keeps the shape") {
    // same contract as nprobe = k above: when the Hamming shortlist
    // admits every candidate, the exact rerank IS e1's scan — kernel,
    // tie order and all
    val open = Similarity.e12SignTopK(spark, sf, shortlist = 1000)
      .select("query_id", "cand_id", "rnk")
    val exact = Similarity.e1CosineTopK(spark, sf)
    assert(open.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(open).count() == 0)
    val df = Similarity.e12SignTopK(spark, sf).cache()
    try {
      val counts = df.groupBy("query_id").count().collect()
      assert(counts.length == 10 && counts.forall(_.getLong(1) == 5))
      assert(df.filter(col("hamming") < 0 || col("hamming") > 64)
        .count() == 0)
    } finally df.unpersist()
  }

  test("z13: in-cluster pair space at k=64 tracks N^2/k, not N^2") {
    // the diag query the 20x stress runs; at test SF the property is
    // identical — quadrupling k must shrink the candidate-pair space
    // decisively (clusters are data-dependent, so assert a 2x floor
    // rather than the ideal 4x)
    val rows = Similarity.diag("z13_e9_k64")(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows(16) > 0 && rows(64) > 0)
    assert(rows(64) * 2 < rows(16),
      s"k=64 pair space ${rows(64)} not well under k=16 ${rows(16)}")
  }
}
