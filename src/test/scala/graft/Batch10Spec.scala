package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Multimodal, Relational, Similarity, TextOps}

/** Round-6 batch 10: e20 exact pruned radius search, g6 RA link
  * prediction, t54 corpus novelty curve, j16 interval coverage,
  * m9 content-defined keyframes. */
class Batch10Spec extends SparkSuite {

  test("e20 range search: equals brute force on the sf corpus") {
    val pruned = Similarity.e20RangeSearch(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same query set / threshold
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = (for {
      (qi, qv) <- emb if qi < 50
      (ci, cv) <- emb if ci != qi && cos(qv, cv) >= 0.4
    } yield (qi, ci)).toSet
    assert(pruned == brute,
      s"pruned=${pruned.size} brute=${brute.size}")
  }

  test("e20 pruning: skips far cells on a clustered corpus, stays exact") {
    import spark.implicits._
    // 4 tight clusters on orthogonal axes, centroids = first 4 ids —
    // the regime the IVF family exists for (real embedding corpora
    // cluster; isotropic random vectors provably defeat ANY exact
    // metric pruning, which the sf-data test above tolerates)
    val dim = 8
    val rows = (0 until 64).map { i =>
      val c = i % 4
      val v = Array.fill(dim)(0.0f)
      v(c) = 1.0f
      if (i >= 4) v(c + 4) = 0.05f * ((i % 7) + 1)
      (i.toLong, v.toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val scanned = Similarity.survivorCellsOf(emb, 4, 0.4, 4).count()
    // each axis query must scan ONLY its own cell: 4 of 16 pairs
    assert(scanned == 4L, s"scanned=$scanned, want 4 of 16")
    val got = Similarity.rangeSearchOf(emb, 4, 0.4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val brute = (for {
      (qi, qv) <- rows if qi < 4
      (ci, cv) <- rows if ci != qi && cos(qv, cv) >= 0.4
    } yield (qi.toLong, ci.toLong)).toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("g6 resource allocation: hand-checked RA scores on the sf graph") {
    val out = Graph.g6ResourceAlloc(spark, sf).collect()
    assert(out.length == 30)
    // recompute RA exactly from the same edge relation
    val ps = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pdeg = ps.groupBy(_._1).map { case (p, v) => p -> v.length }
      .filter(_._2 <= 64)
    val scores = ps.groupBy(_._1).toSeq
      .filter(g => pdeg.contains(g._1))
      .flatMap { case (p, mem) =>
        val sups = mem.map(_._2).sorted
        for (i <- sups.indices; j <- (i + 1) until sups.length
             if sups(i) != sups(j))
          yield ((sups(i), sups(j)), 1000000L / pdeg(p))
      }
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum, v.size) }
    val expected = scores.toSeq
      .sortBy { case ((a, b), ra, _) => (-ra, a, b) }.take(30)
    out.zip(expected).foreach { case (r, ((a, b), ra, n)) =>
      assert(r.getAs[Long]("s_a") == a && r.getAs[Long]("s_b") == b)
      assert(r.getAs[Long]("ra_micro") == ra)
      assert(r.getAs[Long]("n_shared") == n.toLong)
    }
  }

  test("t54 novelty: first bucket is maximally novel, totals conserve") {
    val out = TextOps.t54NgramNovelty(spark, sf).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_shingles"); val v = r.getAs[Long]("n_novel")
      assert(v >= 0 && v <= n)
      assert(r.getAs[Long]("novelty_ppm") == v * 1000000L / n)
    }
    // doc_id 0 lives in bucket 0 and every one of its shingles is
    // first-seen there, so bucket 0 can never be fully stale
    assert(out.head.getAs[Long]("bucket") == 0L)
    assert(out.head.getAs[Long]("n_novel") > 0)
    // global conservation: every distinct shingle is novel exactly once
    val totalNovel = out.map(_.getAs[Long]("n_novel")).sum
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val allShingles = docs.flatMap { case (_, t) =>
      val toks = t.trim.split("\\s+")
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set.empty[String]
    }.toSet
    assert(totalNovel == allShingles.size.toLong)
  }

  test("j16 interval coverage: hand-built islands on a tiny fixture") {
    import spark.implicits._
    val L = 1800L * 1000000L
    // user 1: three events, first two chain (gap < L), third isolated;
    // user 2: duplicate timestamp collapses; exact-L gap still chains
    val ev = Seq(
      (1L, 0L), (1L, L - 1), (1L, 3 * L),
      (2L, 0L), (2L, 0L), (2L, L)).toDF("user_id", "t")
      .select(col("user_id"),
        expr("timestamp_micros(t)").as("ts"))
    // route through the same micros path the operator uses
    val out = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("t")
      ev.select(col("user_id"), expr("unix_micros(ts)").as("t"))
        .distinct()
        .withColumn("head",
          when(col("t") - coalesce(lag(col("t"), 1).over(w),
            lit(Long.MinValue / 2)) > L, 1L).otherwise(0L))
        .withColumn("island", sum(col("head"))
          .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
        .groupBy("user_id", "island")
        .agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          sum(col("t1") - col("t0") + lit(L)).as("covered_us"),
          max(col("t1") - col("t0") + lit(L)).as("max_island_us"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    }
    // user 1: island [0, L-1+L] and [3L, 4L] → covered (2L-1) + L
    assert(out(1L) == ((2L, (2 * L - 1) + L, 2 * L - 1)))
    // user 2: one island [0, L] → covered 2L
    assert(out(2L) == ((1L, 2 * L, 2 * L)))
    // and the real operator runs green on the sf events table
    val real = Relational.j16IntervalCoverage(spark, sf).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getAs[Long]("covered_us") >= r.getAs[Long]("max_island_us"))
      assert(r.getAs[Long]("covered_us") >= r.getAs[Long]("n_islands") * L)
    }
  }

  test("m9 keyframes: census consistent with the m3 frame relation") {
    val frames = Multimodal.m3FrameSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val out = Multimodal.m9Keyframes(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.size == frames.map(_._1).distinct.length)
    frames.groupBy(_._1).foreach { case (doc, fs) =>
      val keys = fs.filter(f => f._3.startsWith("0") || f._3.startsWith("8"))
      val r = out(doc)
      assert(r.getAs[Long]("n_frames") == fs.length.toLong)
      assert(r.getAs[Long]("n_keyframes") == keys.length.toLong)
      if (keys.nonEmpty) {
        assert(r.getAs[Int]("first_key") == keys.map(_._2).min)
        assert(r.getAs[Int]("last_key") == keys.map(_._2).max)
      } else {
        assert(r.getAs[Int]("first_key") == -1)
        assert(r.getAs[Int]("last_key") == -1)
      }
      assert(r.getAs[Long]("key_permille") ==
        keys.length.toLong * 1000 / fs.length)
    }
  }
}
