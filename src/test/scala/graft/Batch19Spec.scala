package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, Similarity}

/** Round-6 batch 21: e22 hard-negative mining, w30 LTV triangle. */
class Batch19Spec extends SparkSuite {

  test("e22 hard negatives: never same-label, subset check vs brute") {
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Similarity.e22HardNegatives(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Int]("rnk")))
    assert(out.nonEmpty)
    val byQ = out.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
      rows.foreach { case (_, c, _) =>
        assert(labels(c) != labels(q), s"same-label negative $q -> $c")
      }
    }
    // brute-force check on one query: its rank-1 negative is the
    // true different-label argmax cosine
    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val q0 = byQ.keys.min
    val best = embs.keys.filter(c => labels(c) != labels(q0)).toSeq
      .map(c => (cos(embs(q0), embs(c)), -c))
      .max
    assert(byQ(q0).find(_._3 == 1).get._2 == -best._2)
  }

  test("w30 ltv triangle: cohort accounting invariants hold") {
    val out = Relational.w30LtvTriangle(spark, sf).collect()
    assert(out.nonEmpty)
    val p = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        expr("unix_micros(ts) div 604800000000").as("week"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cohort = p.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    // age-0 row per cohort exists and n_buyers(age 0) = cohort size
    val byCohort = out.groupBy(_.getAs[Long]("cohort_week"))
    assert(byCohort.keySet == cohort.values.toSet)
    byCohort.foreach { case (cw, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("age"))
      assert(sorted.head.getAs[Long]("age") == 0L)
      val cohortUsers = cohort.filter(_._2 == cw).keySet
      assert(sorted.head.getAs[Long]("n_buyers") == cohortUsers.size)
      rows.foreach(r =>
        assert(r.getAs[Long]("n_users") == cohortUsers.size))
      // cumulative is the running sum and ends at the cohort's total
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getAs[Long]("cents")
        assert(r.getAs[Long]("cum_cents") == cum)
      }
      val total = p.filter(r => cohortUsers(r._1)).map(_._3).sum
      assert(cum == total)
    }
  }

  test("e23 recall curve: monotone in nprobe, endpoint sanity") {
    val out = Similarity.e23RecallCurve(spark, sf).collect()
      .sortBy(_.getAs[Int]("nprobe"))
    assert(out.map(_.getAs[Int]("nprobe")).toSeq == Seq(1, 2, 4))
    val recalls = out.map(_.getAs[Long]("recall_ppm"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not decrease with nprobe: ${recalls.toSeq}")
    out.foreach { r =>
      assert(r.getAs[Long]("n_exact") > 0)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("recall_ppm") ==
        r.getAs[Long]("n_hit") * 1000000L / r.getAs[Long]("n_exact"))
    }
  }

  test("e24 list balance: census conserves and bounds hold") {
    val row = Similarity.e24ListBalance(spark, sf).collect().head
    val n = Tables.embeddings(spark, sf).count()
    assert(row.getAs[Long]("n_vectors") == n)
    assert(row.getAs[Long]("n_lists") <= 16L)
    assert(row.getAs[Long]("min_size") <= row.getAs[Long]("avg_size"))
    assert(row.getAs[Long]("avg_size") <= row.getAs[Long]("max_size"))
    assert(row.getAs[Long]("imbalance_ppm") >= 1000000L)
    assert(row.getAs[Long]("imbalance_ppm") ==
      row.getAs[Long]("max_size") * 1000000L /
        (n / row.getAs[Long]("n_lists")))
  }
}
