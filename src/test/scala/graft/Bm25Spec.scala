package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** t50 BM25 top-k search: ranking contract + scoring invariants. */
class Bm25Spec extends SparkSuite {

  test("t50 bm25: per-query ranking is dense, ordered and bounded") {
    val out = TextOps.t50Bm25(spark, sf)
    val qs = out.select("q_id").distinct().count()
    assert(qs == 5, s"expected 5 queries, got $qs")

    // ranks are 1..k (k ≤ 10), scores non-increasing in rank
    val rows = out.orderBy("q_id", "rank").collect()
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).toSeq
      assert(ranks == (1 to ranks.size), s"q$q ranks not dense: $ranks")
      val scores = rs.map(_.getAs[Double]("score")).toSeq
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"q$q scores not non-increasing")
      assert(rs.forall { r =>
        val h = r.getAs[Long]("n_hit_terms"); h >= 1 && h <= 3 })
      assert(rs.forall(_.getAs[Double]("score") > 0))
    }
  }

  test("t50 idf model: positive, df-monotone") {
    val m = TextOps.t50Idf(spark, sf)
    assert(m.filter(col("idf") <= 0).count() == 0)
    // higher df ⇒ lower idf (strictly monotone in df)
    val byDf = m.select("df", "idf").distinct()
      .orderBy(col("df")).collect()
    val pairs = byDf.map(r => (r.getAs[Long]("df"), r.getAs[Double]("idf")))
    pairs.groupBy(_._1).foreach { case (df, vs) =>
      assert(vs.map(_._2).distinct.length == 1,
        s"same df=$df produced different idf values") }
    val uniq = pairs.distinct.sortBy(_._1)
    assert(uniq.zip(uniq.tail).forall { case ((_, i1), (_, i2)) => i1 > i2 },
      "idf is not strictly decreasing in df")
  }
}
