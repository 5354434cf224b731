package graft

import graft.operators.{Linkage, Relational}

/** Round-9 batch: bootstrap CI, split-conformal interval, and the
  * 20× block-disjoint linkage probe, each against closed-form
  * replays. */
class Batch36Spec extends SparkSuite {

  private def dailyCents(): Map[String, Seq[(Long, Long)]] =
    Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 as day",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"),
        r.getAs[Long]("cents")))
      .groupBy(_._1)
      .map { case (et, rows) =>
        et -> rows.groupBy(_._2).map { case (d, g) =>
          (d, g.map(_._3).sum)
        }.toSeq.sortBy(_._1)
      }

  test("a61: bootstrap interval matches a scalar replay of every " +
    "md5-lottery draw and both order statistics") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(key: String, n: Int): Int = {
      val hex = md.digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      (java.lang.Long.parseLong(hex, 16) % n).toInt
    }
    val out = Relational.a61BootstrapCi(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    dailyCents().foreach { case (et, ser) =>
      val xs = ser.map(_._2)
      val n = xs.length
      val boots = (0 until 200).map { b =>
        val s = (0 until n)
          .map(i => xs(draw(s"boot:$et:$b:$i", n))).sum
        (s, b.toLong)
      }.sorted
      val r = out(et)
      assert(r.getAs[Long]("total_cents") == xs.sum, s"$et total")
      assert(r.getAs[Long]("n_days") == n.toLong, s"$et n")
      assert(r.getAs[Long]("lo_sum_cents") == boots(4)._1, s"$et lo")
      assert(r.getAs[Long]("hi_sum_cents") == boots(194)._1, s"$et hi")
      assert(r.getAs[Long]("lo_sum_cents") <=
        r.getAs[Long]("hi_sum_cents"), s"$et order")
    }
  }

  test("a62: conformal quantile and held-out coverage match the " +
    "rank-based scalar replay") {
    val out = Relational.a62Conformal(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    dailyCents().foreach { case (et, ser) =>
      val cal = ser.filter(_._1 % 2 == 0)
      val test = ser.filter(_._1 % 2 == 1)
      val nc = cal.length
      val pred = cal.map(_._2).sum / nc
      val k = (9 * (nc + 1) + 9) / 10
      val q = cal.map { case (d, x) => (math.abs(x - pred), d) }
        .sorted.apply(k - 1)._1
      val covered = test.count { case (_, x) => math.abs(x - pred) <= q }
      val r = out(et)
      assert(r.getAs[Long]("pred_cents") == pred, s"$et pred")
      assert(r.getAs[Long]("q_cents") == q, s"$et q")
      assert(r.getAs[Long]("n_cal") == nc.toLong, s"$et ncal")
      assert(r.getAs[Long]("n_test") == test.length.toLong, s"$et nt")
      assert(r.getAs[Long]("n_covered") == covered.toLong, s"$et cov")
      // the conformal guarantee itself on the held-out days:
      // coverage ≥ 90% − finite-sample slack (1/(n_test+1) relaxed to
      // one day at these series lengths)
      assert(covered >= (9 * test.length) / 10 - 1, s"$et guarantee")
    }
  }

  test("z38: the 20x block-disjoint replication lands exactly 20x " +
    "the base band rows (min/max scores unchanged)") {
    val base = Linkage.j20RecordLinkage(spark, sf).collect()
      .map(r => r.getAs[String]("band") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_true"),
          r.getAs[Long]("min_score"), r.getAs[Long]("max_score"))).toMap
    val big = Linkage.z38J20_20x(spark, sf).collect()
      .map(r => r.getAs[String]("band") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_true"),
          r.getAs[Long]("min_score"), r.getAs[Long]("max_score"))).toMap
    assert(big.keySet == base.keySet)
    base.foreach { case (band, (np, nt, mn, mx)) =>
      val (bp, bt, bn, bx) = big(band)
      assert(bp == 20L * np, s"$band pairs")
      assert(bt == 20L * nt, s"$band true")
      assert(bn == mn && bx == mx, s"$band score range")
    }
  }
}
