package graft

import org.apache.spark.sql.functions.col

import graft.operators.{Relational, Similarity, TextOps, Validation}

/** Round-7 batch 25: e28 nDCG audit, w38 seasonal-naive backtest,
  * t66 split-leakage audit, v6 categorical profile drift. */
class Batch25Spec extends SparkSuite {

  test("e28 nDCG: the exact-rerank method scores perfect nDCG iff its " +
    "top-5 equals the exact top-5, and all values are bounded ratios") {
    val out = Similarity.e28Ndcg(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[String]("method")).toSet ==
      Set("e5_ivf", "e8_pq", "e14_rerank"))
    out.foreach { r =>
      val dcg = r.getAs[Long]("dcg_milli")
      assert(dcg >= 0 && dcg <= 10273)
      assert(r.getAs[Long]("ndcg_ppm") == dcg * 1000000L / 10273)
    }
    // cross-check one (method, query) against a from-first-principles
    // recount off the two top-5 relations
    val exact = Similarity.e1CosineTopK(spark, sf)
      .select("query_id", "cand_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val disc = Map(1 -> 1000, 2 -> 631, 3 -> 500, 4 -> 431, 5 -> 387)
    val ivf = Similarity.e5IvfAnn(spark, sf)
      .select("query_id", "cand_id", "rnk").collect()
    val want = ivf.groupBy(_.getLong(0)).map { case (q, rows) =>
      q -> rows.map(r => disc(r.getInt(2)) *
        exact.get((q, r.getLong(1))).map(6 - _).getOrElse(0)).sum.toLong
    }
    out.filter(_.getAs[String]("method") == "e5_ivf").foreach { r =>
      assert(r.getAs[Long]("dcg_milli") ==
        want(r.getAs[Long]("query_id")))
    }
  }

  test("w38 seasonal backtest: scorecard matches a driver-side replay " +
    "of the t-7 naive forecast") {
    val out = Relational.w38SeasonalBacktest(spark, sf).collect()
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type",
        "unix_micros(ts) div 86400000000 as day",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.expr("sum(cents) as c"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (et, rows) =>
        et -> rows.map(r => r.getAs[Long]("day") -> r.getAs[Long]("c"))
          .toMap
      }
    out.foreach { r =>
      val m = daily(r.getAs[String]("event_type"))
      val scored = m.toSeq.flatMap { case (day, a) =>
        m.get(day - 7).map(f => (a, f))
      }
      assert(r.getAs[Long]("n_scored") == scored.size)
      val sumAe = scored.map { case (a, f) => math.abs(a - f) }.sum
      assert(r.getAs[Long]("mae_cents") == sumAe / scored.size)
      assert(r.getAs[Long]("bias_cents") ==
        scored.map { case (a, f) => a - f }.sum)
      val sumSm = scored.map { case (a, f) =>
        val den = math.abs(a) + math.abs(f)
        if (den > 0) math.abs(a - f) * 2000000L / den else 0L
      }.sum
      assert(r.getAs[Long]("smape_ppm") == sumSm / scored.size)
    }
  }

  test("t66 split leakage: counts reconcile with a direct recount off " +
    "the split and pair relations, and exact dups cannot leak") {
    val out = TextOps.t66SplitLeakage(spark, sf).collect()
    assert(out.map(_.getAs[String]("split")).toSet == Set("val", "test"))
    val split = TextOps.t12HashSplit(spark, sf)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = TextOps.t7MinHashLsh(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val contam = (pairs ++ pairs.map(_.swap))
      .filter { case (a, b) =>
        Set("val", "test")(split(a)) && split(b) == "train" }
      .map { case (a, _) => (split(a), a) }.distinct
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      val sp = r.getAs[String]("split")
      val nDocs = split.values.count(_ == sp).toLong
      assert(r.getAs[Long]("n_docs") == nDocs)
      assert(r.getAs[Long]("n_contaminated") ==
        contam.getOrElse(sp, 0L), sp)
      assert(r.getAs[Long]("leakage_ppm") ==
        contam.getOrElse(sp, 0L) * 1000000L / nDocs)
    }
  }

  test("v6 category drift: shares sum to ~1e6 per column-period and " +
    "deltas telescope to ~0") {
    val out = Validation.v6CategoryDrift(spark, sf).collect()
    assert(out.map(_.getAs[String]("col_name")).toSet ==
      Set("orderstatus", "orderpriority"))
    out.groupBy(_.getAs[String]("col_name")).foreach { case (cn, rows) =>
      val k = rows.length
      val se = rows.map(_.getAs[Long]("share_early_ppm")).sum
      val sl = rows.map(_.getAs[Long]("share_late_ppm")).sum
      assert(se > 1000000L - k && se <= 1000000L, s"$cn early $se")
      assert(sl > 1000000L - k && sl <= 1000000L, s"$cn late $sl")
      // deltas are a difference of two near-partitions of unity
      assert(math.abs(rows.map(_.getAs[Long]("delta_ppm")).sum) < k)
      rows.foreach(r => assert(r.getAs[Long]("delta_ppm") ==
        r.getAs[Long]("share_late_ppm")
          - r.getAs[Long]("share_early_ppm")))
    }
    // both periods are populated (midpoint split of a continuous range)
    assert(out.map(_.getAs[Long]("n_early")).sum > 0)
    assert(out.map(_.getAs[Long]("n_late")).sum > 0)
  }
}
