package graft

import org.apache.spark.sql.functions.col

import graft.operators.{Relational, TextOps}

/** Round-7 batch 27: a50 deterministic permutation test, a51
  * Mann-Kendall trend test, w39 difference-in-differences, t67
  * BLEU-style clipped n-gram precision over the near-dup pairs. */
class Batch27Spec extends SparkSuite {

  private def dayOf(micros: Long): Long = Math.floorDiv(micros, 86400000000L)

  test("a50 permutation test: p in (0, 1], sizes preserved, and the " +
    "observed leg recounts exactly") {
    val out = Relational.a50PermutationTest(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) as us",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) as cents")
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        (dayOf(r.getAs[Long]("us")) + 3) % 7 >= 5,
        r.getAs[Long]("cents")))
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val rows = ev.filter(_._1 == et)
      val nWe = rows.count(_._2).toLong
      val nWd = rows.size - nWe
      assert(r.getAs[Long]("n_we") == nWe, s"$et n_we")
      assert(r.getAs[Long]("n_wd") == nWd, s"$et n_wd")
      assert(r.getAs[Long]("n_reps") == 100L)
      val nGe = r.getAs[Long]("n_ge")
      assert(nGe >= 0 && nGe <= 100)
      val p = r.getAs[Long]("p_ppm")
      // p = (n_ge+1)/(R+1): never 0, at most 1
      assert(p == (nGe + 1) * 1000000L / 101L && p > 0 && p <= 1000000L)
      // observed statistic recount: sign and floored micro mean gap
      val sWe = rows.filter(_._2).map(_._3).sum
      val sWd = rows.filterNot(_._2).map(_._3).sum
      val num = (BigInt(sWe) * nWd - BigInt(sWd) * nWe).abs * 1000000
      assert(BigInt(r.getAs[Long]("obs_absdiff_micro")) ==
        num / (BigInt(nWe) * nWd), s"$et absdiff")
      assert(r.getAs[Int]("obs_sign") ==
        (BigInt(sWe) * nWd - BigInt(sWd) * nWe).signum, s"$et sign")
    }
  }

  test("a51 Mann-Kendall: S and tie-corrected var18 match a brute " +
    "recount, trend label consistent with the integer z^2 test") {
    val out = Relational.a51MannKendall(spark, sf).collect()
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) as us",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) as cents")
      .collect()
      .groupBy(r => (r.getAs[String]("event_type"),
        dayOf(r.getAs[Long]("us"))))
      .map { case ((et, day), rs) =>
        (et, day, rs.map(_.getAs[Long]("cents")).sum) }
      .toSeq
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val series = daily.filter(_._1 == et).sortBy(_._2).map(_._3)
      val n = series.size.toLong
      var s = 0L
      for (i <- series.indices; j <- (i + 1) until series.size)
        s += java.lang.Long.signum(series(j) - series(i))
      val tie18 = series.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) })
        .sum
      val var18 = n * (n - 1) * (2 * n + 5) - tie18
      assert(r.getAs[Long]("n_days") == n, s"$et n_days")
      assert(r.getAs[Long]("s_stat") == s, s"$et s_stat")
      assert(r.getAs[Long]("var18") == var18, s"$et var18")
      val sig = s != 0 &&
        180000L * (math.abs(s) - 1) * (math.abs(s) - 1) >= 38416L * var18
      val want = if (sig && s > 0) "increasing"
        else if (sig && s < 0) "decreasing" else "none"
      assert(r.getAs[String]("trend") == want, s"$et trend")
    }
  }

  test("w39 DiD: the four cells recount exactly and the estimate is " +
    "the integer combination of the floored means") {
    val out = Relational.w39DiffInDiff(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val pe = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .selectExpr("user_id", "unix_micros(ts) as us",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) as cents")
      .collect()
      .map(x => (x.getAs[Long]("user_id"), dayOf(x.getAs[Long]("us")),
        x.getAs[Long]("cents")))
    val minD = pe.map(_._2).min
    val maxD = pe.map(_._2).max
    val cutoff = minD + (maxD - minD + 1) / 2
    def cell(t: Boolean, p: Boolean) =
      pe.filter(x => (x._1 % 2 == 1) == t && (x._2 >= cutoff) == p)
    def mMicro(t: Boolean, p: Boolean): Long = {
      val c = cell(t, p)
      ((BigInt(c.map(_._3).sum) * 1000000) / c.size).toLong
    }
    assert(r.getAs[Long]("n_t_pre") == cell(t = true, p = false).size)
    assert(r.getAs[Long]("n_t_post") == cell(t = true, p = true).size)
    assert(r.getAs[Long]("n_c_pre") == cell(t = false, p = false).size)
    assert(r.getAs[Long]("n_c_post") == cell(t = false, p = true).size)
    assert(r.getAs[Long]("m_t_pre_micro") == mMicro(t = true, p = false))
    assert(r.getAs[Long]("m_c_post_micro") == mMicro(t = false, p = true))
    assert(r.getAs[Long]("did_micro") ==
      (mMicro(t = true, p = true) - mMicro(t = true, p = false)) -
        (mMicro(t = false, p = true) - mMicro(t = false, p = false)))
  }

  test("t67 n-gram precision: identical-text pairs score exactly 1e6 " +
    "on both gram orders, and one pair recounts by hand") {
    val out = TextOps.t67NgramPrecision(spark, sf).collect()
    assert(out.nonEmpty)
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    def grams(t: String, n: Int): Seq[String] =
      t.trim.split("\\s+").toSeq.sliding(n).map(_.mkString(" ")).toSeq
    out.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val p1 = r.getAs[Long]("p1_ppm")
      val p2 = r.getAs[Long]("p2_ppm")
      assert(p1 >= 0 && p1 <= 1000000L && p2 >= 0 && p2 <= 1000000L)
      if (texts(a) == texts(b))
        assert(p1 == 1000000L && p2 == 1000000L, s"pair $a-$b")
      // full recount for every pair: clipped gram overlap
      def clip(n: Int): Long = {
        val ca = grams(texts(a), n).groupBy(identity).map {
          case (g, gs) => g -> gs.size.toLong }
        val cb = grams(texts(b), n).groupBy(identity).map {
          case (g, gs) => g -> gs.size.toLong }
        ca.map { case (g, c) => math.min(c, cb.getOrElse(g, 0L)) }.sum
      }
      val n1 = grams(texts(a), 1).size.toLong
      assert(r.getAs[Long]("clip1") == clip(1), s"pair $a-$b clip1")
      assert(p1 == clip(1) * 1000000L / n1, s"pair $a-$b p1")
      assert(p2 == clip(2) * 1000000L / math.max(n1 - 1, 1),
        s"pair $a-$b p2")
    }
    // every identical-text pair in the corpus MUST surface as an LSH
    // pair (jaccard 1) and score exactly 1e6 — checked above; here we
    // pin that none were silently dropped from the pair set
    val ids = texts.toSeq.groupBy(_._2).values.filter(_.size > 1)
      .flatMap { g =>
        val s = g.map(_._1).sorted
        for (i <- s.indices; j <- (i + 1) until s.size)
          yield (s(i), s(j))
      }.toSet
    val got = out.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(ids.subsetOf(got),
      s"identical-text pairs missing from LSH set: ${ids -- got}")
  }
}
