package graft

import graft.operators.{Relational, Similarity}

/** Round-7 batch 31: a58 brand association rules, e29 embedding-drift
  * monitor over ingest batches. */
class Batch31Spec extends SparkSuite {

  test("a58 association rules: counts, confidence and lift recount " +
    "from driver-side baskets; symmetric support") {
    val out = Relational.a58AssocRules(spark, sf).collect()
    assert(out.nonEmpty)
    val baskets = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "part"),
        org.apache.spark.sql.functions.expr("l_partkey = p_partkey"))
      .selectExpr("l_orderkey as ok", "p_brand as brand")
      .distinct().collect()
      .map(r => (r.getAs[Long]("ok"), r.getAs[String]("brand")))
    val nOrders = baskets.map(_._1).distinct.size.toLong
    val nBrand = baskets.groupBy(_._2).map { case (b, g) =>
      b -> g.size.toLong }
    val byOrder = baskets.groupBy(_._1).map { case (_, g) =>
      g.map(_._2).toSet }
    val got = out.map(r => (r.getAs[String]("brand_a"),
      r.getAs[String]("brand_b")) -> r).toMap
    // recount every rule above the floor
    val pairCnt = scala.collection.mutable.Map
      .empty[(String, String), Long].withDefaultValue(0L)
    byOrder.foreach { bs =>
      for (a <- bs; b <- bs if a != b) pairCnt((a, b)) += 1
    }
    val expect = pairCnt.filter(_._2 >= 5)
    assert(got.keySet == expect.keySet)
    expect.foreach { case ((a, b), nAb) =>
      val r = got((a, b))
      assert(r.getAs[Long]("n_ab") == nAb)
      assert(r.getAs[Long]("n_a") == nBrand(a))
      assert(r.getAs[Long]("n_b") == nBrand(b))
      assert(r.getAs[Long]("n_orders") == nOrders)
      assert(r.getAs[Long]("conf_ppm") == nAb * 1000000L / nBrand(a))
      assert(BigInt(r.getAs[Long]("lift_ppm")) ==
        BigInt(nAb) * nOrders * 1000000 / (BigInt(nBrand(a)) * nBrand(b)))
      // support is symmetric even though confidence is not
      assert(got.get((b, a)).forall(_.getAs[Long]("n_ab") == nAb))
    }
  }

  test("e29 embedding drift: quantized means, dot sign and cos^2 " +
    "recount from a driver-side fold; batches are consecutive") {
    val out = Similarity.e29EmbeddingDrift(spark, sf).collect()
      .map(r => r.getAs[Long]("batch_a") -> r).toMap
    val vecs = Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding"))
    val width = vecs.map(_._1).max / 16 + 1
    val byBatch = vecs.groupBy(_._1 / width)
    def meanVec(b: Long): Option[Array[Long]] = byBatch.get(b).map { g =>
      val dims = g.head._2.size
      val n = g.size.toLong
      Array.tabulate(dims) { d =>
        val sq = g.map(v =>
          math.floor(v._2(d).toDouble * 1000 + 0.5).toLong).sum
        Math.floorDiv(sq, n)
      }
    }
    val batches = byBatch.keys.toSeq.sorted
    var pairsChecked = 0
    batches.foreach { b =>
      (meanVec(b), meanVec(b + 1)) match {
        case (Some(ma), Some(mb)) =>
          val r = out(b)
          assert(r.getAs[Long]("batch_b") == b + 1)
          assert(r.getAs[Long]("n_a") == byBatch(b).size.toLong)
          assert(r.getAs[Long]("n_b") == byBatch(b + 1).size.toLong)
          val dot = ma.zip(mb).map { case (x, y) => BigInt(x) * y }.sum
          val na2 = ma.map(x => BigInt(x) * x).sum
          val nb2 = mb.map(x => BigInt(x) * x).sum
          assert(r.getAs[Int]("dot_sign") == dot.signum)
          assert(BigInt(r.getAs[Long]("cos2_ppm")) ==
            dot * dot * 1000000 / (na2.max(1) * nb2.max(1)), s"batch $b")
          pairsChecked += 1
        case _ => assert(!out.contains(b) || byBatch.contains(b + 1))
      }
    }
    assert(pairsChecked == out.size && pairsChecked > 0)
  }
}
