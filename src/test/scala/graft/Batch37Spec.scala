package graft

import graft.operators.{Relational, Similarity}

/** Round-9 batch: multi-probe LSH and the exact rank-sum test against
  * scalar replays. */
class Batch37Spec extends SparkSuite {

  test("e32: multi-probe top-5 matches a scalar replay over the " +
    "flip-1 probe union, and candidates strictly contain the " +
    "single-bucket set") {
    val buckets = Similarity.e2Buckets(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("bucket")).toMap
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").toArray)).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var k = 0
      while (k < a.length) { acc += a(k).toDouble * b(k).toDouble; k += 1 }
      acc
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val queries = buckets.keys.filter(_ < 10)
    var anyWider = false
    val expected = queries.flatMap { qid =>
      val pbs = (Set(buckets(qid)) ++
        (0 until 12).map(b => buckets(qid) ^ (1 << b))).toSet
      val cands = buckets.collect {
        case (cid, bk) if cid != qid && pbs.contains(bk) => cid
      }.toSeq
      val single = buckets.count {
        case (cid, bk) => cid != qid && bk == buckets(qid)
      }
      if (cands.size > single) anyWider = true
      cands.map(c => (c, cos(emb(qid), emb(c))))
        .sortBy { case (cid, s) => (-s, cid) }.take(5).zipWithIndex
        .map { case ((cid, _), k) => (qid, cid, k + 1) }
    }.toSet
    val got = Similarity.e32Multiprobe(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Int]("rnk"))).toSet
    assert(got == expected)
    assert(anyWider,
      "at least one query's probe union must beat its own bucket")
  }

  test("a63: doubled rank sums match the scalar tie-averaged replay " +
    "and the U identity holds") {
    val vals = Tables.events(spark, sf)
      .selectExpr("event_type",
        "(unix_micros(ts) div 86400000000) % 2 = 0 as is_x",
        "cast(cast(value as decimal(18,2)) * 100 as long) as v")
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Boolean]("is_x"), r.getAs[Long]("v")))
    val out = Relational.a63MannWhitney(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    vals.groupBy(_._1).foreach { case (et, rows) =>
      val sorted = rows.map(r => (r._3, r._2)).sortBy(_._1)
      // 2·avgrank per row via the tie-group closed form
      val r2 = sorted.map { case (v, _) =>
        val lt = sorted.count(_._1 < v)
        val eq = sorted.count(_._1 == v)
        (v, 2L * lt + eq + 1L)
      }
      val nx = rows.count(_._2).toLong
      val ny = rows.length - nx
      val sum2rX = sorted.zip(r2).collect {
        case ((_, true), (_, rr)) => rr
      }.sum
      val u2x = sum2rX - nx * (nx + 1)
      val r = out(et)
      assert(r.getAs[Long]("nx") == nx, s"$et nx")
      assert(r.getAs[Long]("ny") == ny, s"$et ny")
      assert(r.getAs[Long]("u2_x") == u2x, s"$et u2x")
      assert(r.getAs[Long]("u2_y") == 2 * nx * ny - u2x, s"$et u2y")
      assert(r.getAs[Long]("u2_x") + r.getAs[Long]("u2_y") ==
        2 * nx * ny, s"$et identity")
    }
  }
}
