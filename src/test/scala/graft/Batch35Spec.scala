package graft

import graft.operators.{AsOf, Linkage, Similarity}

/** Round-9 batch: MaxSim late-interaction retrieval, Fellegi–Sunter
  * record linkage and linear-interpolation gap fill, each against an
  * independent scalar replay. */
class Batch35Spec extends SparkSuite {

  test("e30: MaxSim top-5 matches a scalar replay of the 4x16 slice " +
    "scoring (same IEEE fold order)") {
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").toArray))
    def dot(a: Array[Float], ao: Int, b: Array[Float], bo: Int): Double = {
      var acc = 0.0; var k = 0
      while (k < 16) {
        acc += a(ao + k).toDouble * b(bo + k).toDouble; k += 1
      }
      acc
    }
    def score(q: Array[Float], c: Array[Float]): Double =
      (0 until 4).map { i =>
        (0 until 4).map { j =>
          dot(q, 16 * i, c, 16 * j) /
            (math.sqrt(dot(q, 16 * i, q, 16 * i)) *
              math.sqrt(dot(c, 16 * j, c, 16 * j)))
        }.reduceLeft(math.max)
      }.reduceLeft(_ + _)
    val expected = emb.filter(_._1 < 8).flatMap { case (qid, qv) =>
      emb.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, score(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(5).zipWithIndex
        .map { case ((cid, _), k) => (qid, cid, k + 1) }
    }.toSet
    val got = Similarity.e30Maxsim(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Int]("rnk"))).toSet
    assert(got == expected)
  }

  test("j20: band counts match a scalar replay of the " +
    "perturbation/blocking/scoring rules") {
    val cust = Tables.customer(spark, sf)
      .selectExpr("c_custkey", "cast(c_nationkey as long) as nation",
        "cast(cast(c_acctbal as decimal(18,2)) * 100 as long) as cents",
        "c_mktsegment").collect()
      .map(r => (r.getAs[Long]("c_custkey"), r.getAs[Long]("nation"),
        r.getAs[Long]("cents"), r.getAs[String]("c_mktsegment")))
    val byNation = cust.groupBy(_._2)
    val pairs = cust.filter(_._1 % 3 == 0).flatMap {
      case (src, nation, cents, seg) =>
        val dDigits = src + (if (src % 13 == 0) 500000L else 0L)
        val dCents = cents + (if (src % 5 == 0) 1L else 0L)
        val dSeg = if (src % 11 == 0) "SMUDGED" else seg
        byNation(nation).map { case (key, _, cCents, cSeg) =>
          val s = (if (dDigits == key) 30L else -5L) +
            (if (math.abs(dCents - cCents) <= 1) 15L else -8L) +
            (if (dSeg == cSeg) 5L else -5L)
          (s, src == key)
        }
    }
    def band(s: Long) =
      if (s >= 35) "match" else if (s >= 10) "possible" else "non_match"
    val expected = pairs.groupBy(p => band(p._1)).map { case (b, ps) =>
      b -> (ps.length.toLong, ps.count(_._2).toLong,
        ps.map(_._1).min, ps.map(_._1).max)
    }
    val got = Linkage.j20RecordLinkage(spark, sf).collect()
      .map(r => r.getAs[String]("band") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_true"),
          r.getAs[Long]("min_score"), r.getAs[Long]("max_score"))).toMap
    assert(got == expected)
    // the designed classification edges all occur: clean true pairs in
    // "match", name-corrupted ones in the "possible" review pile
    assert(expected("match")._2 > 0)
    assert(expected("possible")._2 > 0)
  }

  test("e31: MMR picks match a scalar replay of the greedy " +
    "relevance-minus-redundancy recurrence") {
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[Seq[Float]]("embedding").toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var k = 0
      while (k < a.length) { acc += a(k).toDouble * b(k).toDouble; k += 1 }
      acc
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val expected = emb.filter(_._1 < 8).flatMap { case (qid, qv) =>
      val cands = emb.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, cv, cos(qv, cv)) }
        .sortBy { case (cid, _, s) => (-s, cid) }.take(20)
      var picked = Vector(cands.maxBy(c => (c._3, -c._1)))
      while (picked.length < 5) {
        val next = cands.filterNot(c => picked.exists(_._1 == c._1))
          .map { c =>
            val red = picked.map(p => cos(c._2, p._2)).max
            (c, 0.7 * c._3 - 0.3 * red)
          }.maxBy { case (c, s) => (s, -c._1) }._1
        picked :+= next
      }
      picked.zipWithIndex.map { case (c, i) => (qid, i + 1, c._1) }
    }.toSet
    val got = Similarity.e31Mmr(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("pick"),
        r.getAs[Long]("cand_id"))).toSet
    assert(got == expected)
    // diversification really engages: at least one query's MMR list
    // differs from its plain top-5 cosine order
    val plain = emb.filter(_._1 < 8).flatMap { case (qid, qv) =>
      emb.filter(_._1 != qid).map { case (cid, cv) => (cid, cos(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }.take(5).zipWithIndex
        .map { case ((cid, _), i) => (qid, i + 1, cid) }
    }.toSet
    assert(got != plain, "MMR should reorder at least one list")
  }

  test("w43: the streaming interpolation replay emits exactly the " +
    "batch w42 rows (stream == batch across micro-batch seams)") {
    val stream = graft.streaming.TwsOps.interpReplay(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day"),
        r.getAs[Long]("cents"), r.getAs[Boolean]("is_interp")))
    val batch = operators.AsOf.w42Interpolate(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day"),
        r.getAs[Long]("cents"), r.getAs[Boolean]("is_interp")))
    assert(stream.length == batch.length)
    assert(stream.toSet == batch.toSet)
    assert(stream.exists(_._4), "parity must cover interpolated rows")
  }

  test("w42: interpolated series matches a scalar replay — observed " +
    "days pass through, gap days sit on the integer floor line") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) div 86400000000 as day",
        "unix_micros(ts) as tsus", "event_id",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day"),
        r.getAs[Long]("tsus"), r.getAs[Long]("event_id"),
        r.getAs[Long]("cents")))
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val daily = rows.groupBy(_._2).map { case (day, g) =>
        day -> g.maxBy(r => (r._3, r._4))._5
      }
      val d0 = daily.keys.min; val d1 = daily.keys.max
      val days = (d0 to d1).toArray
      days.map { day =>
        daily.get(day) match {
          case Some(x) => (uid, day) -> (x, false)
          case None =>
            val pd = daily.keys.filter(_ < day).max
            val nd = daily.keys.filter(_ > day).min
            val pv = daily(pd); val nv = daily(nd)
            val x = pv + Math.floorDiv((nv - pv) * (day - pd), nd - pd)
            (uid, day) -> (x, true)
        }
      }
    }.toMap
    val got = AsOf.w42Interpolate(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("cents"), r.getAs[Boolean]("is_interp"))).toMap
    assert(got == expected)
    assert(got.values.exists(_._2), "fixture has at least one gap day")
  }
}
