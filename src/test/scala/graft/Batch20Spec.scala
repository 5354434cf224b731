package graft

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, Relational}

/** Round-6 batch 23: a38 chi-square cells, w31 stickiness, m10 CAS
  * savings. */
class Batch20Spec extends SparkSuite {

  test("a38 chi2: full grid, marginal identities, brute contribution") {
    val out = Relational.a38Chi2(spark, sf).collect()
    val types = out.map(_.getAs[String]("event_type")).distinct
    assert(out.length == types.length * 7)
    val obs = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000) % 7").as("dow"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = obs.length.toLong
    val rt = obs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ct = obs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val oMap = obs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("dow"))
      val o = oMap.getOrElse(key, 0L)
      val ef = (BigInt(rt(key._1)) * ct(key._2) / n).toLong
      assert(r.getAs[Long]("o") == o)
      assert(r.getAs[Long]("e_floor") == ef)
      val contrib =
        (BigInt(o - ef) * (o - ef) * 1000000 / math.max(ef, 1L)).toLong
      assert(r.getAs[Long]("contrib_ppm") == contrib)
    }
    // marginals: sum of o per row = row total
    types.foreach { t =>
      assert(out.filter(_.getAs[String]("event_type") == t)
        .map(_.getAs[Long]("o")).sum == rt(t))
    }
  }

  test("w31 stickiness: DAU <= MAU, brute-force window check") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = ud.map(_._2).distinct
    val out = Relational.w31Stickiness(spark, sf).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("dau"), r.getAs[Long]("mau"),
          r.getAs[Long]("stickiness_ppm"))).toMap
    assert(out.keySet == days.toSet)
    days.foreach { d =>
      val dau = ud.count(_._2 == d).toLong
      val mau = ud.filter(u => u._2 <= d && u._2 > d - 28)
        .map(_._1).distinct.length.toLong
      val (gd, gm, gp) = out(d)
      assert(gd == dau && gm == mau, s"day $d: ($gd,$gm) vs ($dau,$mau)")
      assert(gp == dau * 1000000L / mau)
      assert(dau <= mau)
    }
  }

  test("m10 cas savings: per-format byte accounting conserves") {
    val out = Multimodal.m10CasSavings(spark, sf).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    out.foreach { r =>
      val fmt = r.getAs[String]("format")
      val mine = docs.filter(_._1 == fmt)
      val uniq = mine.map(_._2).distinct
      assert(r.getAs[Long]("n_assets") == mine.length.toLong)
      assert(r.getAs[Long]("n_unique") == uniq.length.toLong)
      assert(r.getAs[Long]("dup_assets") ==
        (mine.length - uniq.length).toLong)
      val total = mine.map(_._2.getBytes("UTF-8").length.toLong).sum
      assert(r.getAs[Long]("bytes_total") == total)
      val kept = uniq.map(_.getBytes("UTF-8").length.toLong).sum
      assert(r.getAs[Long]("bytes_saved") == total - kept)
    }
  }

  test("a39 winsorized mean: matches the brute-force clamp") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val out = Relational.a39WinsorizedMean(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("n"), r.getAs[Long]("lo_cents"),
          r.getAs[Long]("hi_cents"),
          r.getAs[Long]("winsor_mean_micros"))).toMap
    li.groupBy(_._1).foreach { case (flag, rows) =>
      val xs = rows.map(_._2).sorted
      val n = xs.length
      val k = n / 20
      val lo = xs(k)          // rank k+1, 1-indexed
      val hi = xs(n - k - 1)  // rank n-k
      val wsum = xs.map(x => math.max(lo, math.min(hi, x)))
        .map(BigInt(_)).sum
      val (gn, glo, ghi, gm) = out(flag)
      assert(gn == n.toLong && glo == lo && ghi == hi)
      assert(gm == (wsum * 1000000 / n).toLong, flag)
    }
  }

  test("ts20 pcr jitter: buckets partition the sane deltas exactly") {
    graft.ts.TsLake.ensureDumped(spark)
    val out = graft.operators.TsQueries.ts20PcrJitter(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val pcrs = graft.ts.TsLake.packets(spark).toDF()
      .filter(col("af.pcr").isNotNull)
      .select(col("pid"), col("seq"), col("af.pcr").as("pcr"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val deltas = pcrs.groupBy(_._1).toSeq.flatMap { case (pid, rows) =>
      rows.sortBy(_._2).map(_._3).toSeq.sliding(2).collect {
        case Seq(a, b) if b - a > 0 && b - a <= 27000000L =>
          (pid, b - a)
      }
    }
    assert(out.map(_.getAs[Long]("n")).sum == deltas.length.toLong)
    out.foreach { r =>
      val inBucket = deltas.filter(dd => dd._1 == r.getAs[Int]("pid") &&
        dd._2 / 27000L == r.getAs[Long]("bucket_ms")).map(_._2)
      assert(inBucket.length.toLong == r.getAs[Long]("n"))
      assert(inBucket.min == r.getAs[Long]("min_ticks"))
      assert(inBucket.max == r.getAs[Long]("max_ticks"))
    }
  }

  test("a40 autocorr: matches the brute-force scaled-deviation form") {
    val out = Relational.a40Autocorr(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("r1_ppm"))).toMap
    val daily = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100 + 0.5).toLong))
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum).toSeq
      .map { case ((et, day), x) => (et, day, x) }
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val nd = xs.length.toLong
      val s = xs.sum
      val dv = xs.map(x => BigInt(x) * nd - s)
      val den = dv.map(d => d * d).sum
      val num = dv.zip(dv.tail).map { case (a, b) => a * b }.sum
      val (gn, gr) = out(et)
      assert(gn == nd)
      assert(gr == (num * 1000000 / den).toLong, et)
    }
  }

  test("w32 purchase gap: matches brute-force global lower median") {
    val p = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("t"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = p.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ts = rows.sortBy(r => (r._2, r._3)).map(_._2)
      ts.zip(ts.tail).map { case (a, b) => b - a }
    }.sorted
    val row = Relational.w32PurchaseGap(spark, sf).collect().head
    assert(row.getAs[Long]("n_gaps") == gaps.length.toLong)
    assert(row.getAs[Long]("median_gap_us") ==
      gaps((gaps.length + 1) / 2 - 1))
  }

  test("a41 exact percentiles: all five ranks match brute force") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val out = Relational.a41ExactPercentiles(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    li.groupBy(_._1).foreach { case (flag, rows) =>
      val xs = rows.map(_._2).sorted
      val n = xs.length.toLong
      val r = out(flag)
      assert(r.getAs[Long]("n") == n)
      Seq(25, 50, 75, 95, 99).foreach { p =>
        val k = (n * p + 99) / 100
        assert(r.getAs[Long](s"p${p}_cents") == xs((k - 1).toInt),
          s"$flag p$p")
      }
    }
  }

  test("w34 conversion lag: matches brute-force first-to-first") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("t")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val lags = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val fv = rows.filter(_._2 == "view").map(_._3).minOption
      val fp = rows.filter(_._2 == "purchase").map(_._3).minOption
      (fv, fp) match {
        case (Some(v), Some(pp)) if pp >= v =>
          Some((pp - v) / 3600000000L)
        case _ => None
      }
    }
    val expect = lags.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = Relational.w34ConversionLag(spark, sf).collect()
      .map(r => r.getAs[Long]("lag_hours") -> r.getAs[Long]("n_users"))
      .toMap
    assert(got == expect, s"${got.size} buckets vs ${expect.size}")
  }

  test("s13 snapshot diff: counts partition the key universe") {
    val row = Relational.s13SnapshotDiff(spark, sf).collect().head
    val keys = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getLong(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong))
    val removed = keys.count(_._1 % 101 == 0).toLong
    val changed = keys.count(k => k._1 % 101 != 0 && k._1 % 97 == 0 &&
      k._2 / 100 > 0).toLong
    assert(row.getAs[Long]("n_added") == 0L)
    assert(row.getAs[Long]("n_removed") == removed)
    assert(row.getAs[Long]("n_changed") == changed)
    assert(row.getAs[Long]("n_unchanged") ==
      keys.length - removed - changed)
    val delta = keys.filter(k => k._1 % 101 != 0 && k._1 % 97 == 0)
      .map(k => k._2 / 100).sum -
      keys.filter(_._1 % 101 == 0).map(_._2).sum
    assert(row.getAs[Long]("delta_cents") == delta)
  }

  test("a42 abandonment: viewer accounting matches brute force") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("unix_micros(ts) div 604800000000").as("week"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expect = ev.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((_, w), rows) =>
        (w, rows.exists(_._3 == "view"), rows.exists(_._3 == "purchase"))
      }
      .filter(_._2)
      .groupBy(_._1).view.mapValues { g =>
        (g.size.toLong, g.count(_._3).toLong)
      }.toMap
    val out = Relational.a42Abandonment(spark, sf).collect()
    assert(out.length == expect.size)
    out.foreach { r =>
      val (nv, nc) = expect(r.getAs[Long]("week"))
      assert(r.getAs[Long]("n_viewers") == nv)
      assert(r.getAs[Long]("n_converters") == nc)
      assert(r.getAs[Long]("abandonment_ppm") ==
        (nv - nc) * 1000000L / nv)
    }
  }

  test("s14 grouped skyline: per-brand brute-force dominance scan") {
    val parts = Tables.part(spark, sf)
      .select(col("p_brand"), col("p_partkey"), col("p_size"),
        col("p_retailprice")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        math.floor(r.getDouble(3) * 100 + 0.5).toLong))
    val expect = parts.filter { a =>
      !parts.exists(b => b._1 == a._1 && b._4 <= a._4 && b._3 >= a._3 &&
        (b._4 < a._4 || b._3 > a._3))
    }.map(_._2).toSet
    val got = graft.operators.Relational.s14GroupedSkyline(spark, sf)
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    assert(got == expect, s"got ${got.size} expected ${expect.size}")
    // group containment: each brand's frontier is a superset-free
    // antichain and every brand with parts is represented
    assert(got.nonEmpty)
  }

  test("ts21 psi cadence: gaps match a brute-force per-table scan") {
    graft.ts.TsLake.ensureDumped(spark)
    val secs = graft.ts.TsLake.sections(spark).toDF()
      .select(col("pid"), col("tableId"), col("firstSeq")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val out = graft.operators.TsQueries.ts21PsiCadence(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val byTable = secs.groupBy(r => (r._1, r._2))
    assert(out.length == byTable.size)
    out.foreach { r =>
      val key = (r.getAs[Int]("pid"), r.getAs[Int]("table_id"))
      val seqs = byTable(key).map(_._3).sorted
      val gaps = seqs.zip(seqs.tail).map { case (a, b) => b - a }
      assert(r.getAs[Long]("n_sections") == seqs.length.toLong)
      if (gaps.nonEmpty) {
        assert(r.getAs[Long]("min_gap") == gaps.min)
        assert(r.getAs[Long]("max_gap") == gaps.max)
        assert(r.getAs[Long]("avg_gap") == gaps.sum / gaps.length)
      } else assert(r.isNullAt(r.fieldIndex("avg_gap")))
    }
  }

  test("t58 langid eval: matrix conserves, shares sum per language") {
    val out = graft.operators.TextOps.t58LangidEval(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs)
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val s = rows.map(_.getAs[Long]("share_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - rows.length)
    }
    out.foreach { r =>
      assert(r.getAs[Boolean]("correct") ==
        (r.getAs[String]("lang") == r.getAs[String]("pred_lang")))
    }
  }

  test("a43 runs test: matches a brute-force run count") {
    val daily = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        col("value")).collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100 + 0.5)
        .toLong))
      .groupBy(_._1).toSeq.map { case (d, rows) =>
        (d, rows.map(_._2).sum)
      }
    val sortedVals = daily.sortBy(r => (r._2, r._1)).map(_._2)
    val med = sortedVals((sortedVals.length + 1) / 2 - 1)
    val signs = daily.sortBy(_._1).filter(_._2 != med)
      .map(_._2 > med)
    val nRuns = 1 + signs.zip(signs.tail).count { case (a, b) => a != b }
    val row = Relational.a43RunsTest(spark, sf).collect().head
    assert(row.getAs[Long]("n_above") == signs.count(identity).toLong)
    assert(row.getAs[Long]("n_below") == signs.count(!_).toLong)
    assert(row.getAs[Long]("n_runs") == nRuns.toLong)
    val na = signs.count(identity).toLong
    val nb = signs.count(!_).toLong
    assert(row.getAs[Long]("expected_runs_milli") ==
      1000L + 2000L * na * nb / (na + nb))
  }
}
