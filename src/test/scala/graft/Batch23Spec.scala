package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, TextOps, TsQueries}

/** Round-7 batch 3: ts23 TR 101 290 priority-1 rollup, t61 LSH cost
  * planner, a45 Theil–Sen robust trend. */
class Batch23Spec extends SparkSuite {

  test("t61 LSH cost: 12 bands, every doc in every band, pair mass " +
    "equals the band join's per-band row count") {
    val out = TextOps.t61LshCost(spark, sf).collect()
      .map(r => r.getAs[Int]("band") -> r).toMap
    assert(out.keySet == (0 until 12).toSet)
    val nDocs = spark.read
      .parquet(s"$sf/documents.parquet").count()
    out.values.foreach { r =>
      assert(r.getAs[Long]("n_docs") == nDocs)
      assert(r.getAs[Long]("n_buckets") <= nDocs)
      val mx = r.getAs[Long]("max_bucket")
      assert(r.getAs[Long]("cand_pairs") >= mx * (mx - 1) / 2)
      assert(r.getAs[Long]("n_singletons") <= r.getAs[Long]("n_buckets"))
    }
    // pair mass audit: band 0's C(sz,2) sum equals a direct self-join
    // count over the band relation
    val bands = TextOps.t61Bands(spark, sf).filter(col("band") === 0)
    val direct = bands.as("x").join(bands.as("y"),
      col("x.band_key") === col("y.band_key") &&
        col("x.doc_id") < col("y.doc_id")).count()
    assert(out(0).getAs[Long]("cand_pairs") == direct)
  }

  test("a45 Theil–Sen: engine median slope equals a brute-force " +
    "recomputation, pair count is C(days,2)") {
    val out = Relational.a45TheilSen(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out.nonEmpty)
    // brute-force one group in driver code off the same day grid
    val pts = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 as day",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .groupBy("event_type", "day")
      .agg(sum("cents").as("c")).collect()
      .groupBy(_.getAs[String]("event_type"))
    out.foreach { case (et, row) =>
      val ps = pts(et).map(r =>
        r.getAs[Long]("day") -> r.getAs[Long]("c")).sortBy(_._1)
      val slopes = (for {
        i <- ps.indices; j <- (i + 1) until ps.length
      } yield {
        val num = (ps(j)._2 - ps(i)._2) * 1000000L
        val den = ps(j)._1 - ps(i)._1
        Math.floorDiv(num, den)
      }).sorted
      assert(row.getAs[Long]("n_days") == ps.length.toLong)
      assert(row.getAs[Long]("n_pairs") == slopes.length.toLong)
      assert(row.getAs[Long]("ts_slope_micro") ==
        slopes((slopes.length + 1) / 2 - 1))
    }
  }

  test("a46 Hodges–Lehmann: engine pseudo-median equals brute-force " +
    "Walsh-average median; ts24 sees ordered PTS on the clean capture") {
    val out = Relational.a46HodgesLehmann(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val pts = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 as day",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .groupBy("event_type", "day")
      .agg(sum("cents").as("c")).collect()
      .groupBy(_.getAs[String]("event_type"))
    out.foreach { case (et, row) =>
      val cs = pts(et).map(_.getAs[Long]("c")).sorted
      val walsh = (for {
        i <- cs.indices; j <- i until cs.length
      } yield cs(i) + cs(j)).sorted
      assert(row.getAs[Long]("n_pairs") == walsh.length.toLong)
      assert(row.getAs[Long]("pseudo_median_x2_cents") ==
        walsh((walsh.length + 1) / 2 - 1))
    }
    // the reference capture's PES stamps are monotone per PID
    val ts24 = TsQueries.ts24PtsMonotonic(spark, sf).collect()
    assert(ts24.nonEmpty)
    ts24.foreach(r => assert(r.getAs[Long]("n_backward") == 0L))
  }

  test("t62 fertility: language totals reconcile with t4 and t9, " +
    "ratios sit on the integer grid") {
    val out = TextOps.t62Fertility(spark, sf).collect()
    val langs = TextOps.t4LangId(spark, sf).groupBy("pred_lang")
      .count().collect()
      .map(r => r.getAs[String]("pred_lang") -> r.getAs[Long]("count"))
      .toMap
    assert(out.map(_.getAs[String]("pred_lang")).toSet == langs.keySet)
    out.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        langs(r.getAs[String]("pred_lang")))
      val f = r.getAs[Long]("fertility_ppm")
      assert(f == r.getAs[Long]("n_tokens") * 1000000L /
        r.getAs[Long]("n_words"))
      assert(f > 0)
    }
    val totTok = out.map(_.getAs[Long]("n_tokens")).sum
    val t9 = TextOps.t9BpeTokens(spark, sf)
      .agg(sum(col("n_bpe_tokens"))).collect()(0).getLong(0)
    assert(totTok == t9)
  }

  test("t64 calibration: buckets partition the corpus, keep counts " +
    "reconcile with t22's verdicts") {
    val out = TextOps.t64Calibration(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n_docs")).sum
    val nDocs = Tables.documents(spark, sf).count()
    assert(total == nDocs)
    val keepTotal = out.map(_.getAs[Long]("n_keep")).sum
    val t22Keep = TextOps.t22GopherFilter(spark, sf)
      .filter(col("keep")).count()
    assert(keepTotal == t22Keep)
    out.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 9)
      assert(r.getAs[Long]("n_keep") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("keep_ppm") ==
        r.getAs[Long]("n_keep") * 1000000L / r.getAs[Long]("n_docs"))
    }
  }

  test("e26 MRR: rerank places the exact top-1 at rank 1 for every " +
    "query it retrieves; values live on the x60 reciprocal grid") {
    import graft.operators.Similarity
    val out = Similarity.e26Mrr(spark, sf).collect()
    val nQ = out.map(_.getAs[Long]("query_id")).distinct.length
    assert(out.length == 3 * nQ)
    val legal = Set(60L, 30L, 20L, 15L, 12L, 0L)
    assert(out.forall(r => legal(r.getAs[Long]("rr_x60"))))
    // e14 reranks its candidates EXACTLY, so whenever the true top-1
    // is in its candidate set it must sit at rank 1 (rr = 60)
    out.filter(_.getAs[String]("method") == "e14_rerank")
      .foreach(r => assert(Set(60L, 0L)(r.getAs[Long]("rr_x60"))))
    // full-recall methods at this SF should mostly find the top-1
    assert(out.count(_.getAs[Long]("rr_x60") == 60L) > nQ)
  }

  test("v5 FD audit: key and name->nationkey FDs hold, known-false " +
    "FDs report violations consistently") {
    import graft.operators.Validation
    val out = Validation.v5FdAudit(spark, sf).collect()
      .map(r => r.getAs[String]("fd") -> r).toMap
    assert(out.size == 6)
    // true FDs: key FDs + the discovered name->nationkey dependency
    Seq("customer.name->nationkey", "customer.custkey->nationkey",
      "nation.nationkey->regionkey").foreach { f =>
      assert(out(f).getAs[Boolean]("holds"), s"$f should hold")
      assert(out(f).getAs[Long]("max_rhs_distinct") == 1L)
    }
    // expected-false FDs on this corpus
    Seq("customer.mktsegment->nationkey",
      "orders.custkey->orderpriority").foreach { f =>
      assert(!out(f).getAs[Boolean]("holds"), s"$f should fail")
      assert(out(f).getAs[Long]("n_violating_keys") > 0L)
    }
    out.values.foreach(r => assert(r.getAs[Long]("n_violating_keys")
      <= r.getAs[Long]("n_keys")))
  }

  test("e27 semantic decontam: hits only off-benchmark vectors, " +
    "agrees with e3's all-pairs relation on the benchmark columns") {
    import graft.operators.Similarity
    val out = Similarity.e27SemanticDecontam(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("vec_id") % 50 != 0))
    assert(out.forall(_.getAs[Long]("first_bench_id") % 50 == 0))
    // cross-check against e3's all-pairs near-dup pairs restricted to
    // (benchmark, corpus) pairs at the SAME threshold
    val e3 = Similarity.e3CosineNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    val benchPairs = e3.flatMap { case (a, b) =>
      if (a % 50 == 0 && b % 50 != 0) Some(b -> a)
      else if (b % 50 == 0 && a % 50 != 0) Some(a -> b)
      else None
    }
    val wantHits = benchPairs.groupBy(_._1).map { case (v, ps) =>
      v -> (ps.length.toLong, ps.map(_._2).min)
    }
    val gotHits = out.map(r => r.getAs[Long]("vec_id") ->
      (r.getAs[Long]("n_bench_hits"), r.getAs[Long]("first_bench_id")))
      .toMap
    assert(gotHits == wantHits)
  }

  test("t65 mix planner: shares sum to ~1e6, allocation respects the " +
    "half-corpus budget and the temperature smoothing flattens shares") {
    val out = TextOps.t65MixPlanner(spark, sf).collect()
    assert(out.nonEmpty)
    val shareSum = out.map(_.getAs[Long]("target_share_ppm")).sum
    assert(shareSum > 1000000L - out.length && shareSum <= 1000000L)
    val totTok = out.map(_.getAs[Long]("n_tokens")).sum
    val planned = out.map(_.getAs[Long]("planned_tokens")).sum
    assert(planned <= totTok / 2 && planned > totTok / 2 - out.length)
    out.foreach(r => assert(r.getAs[Long]("sample_rate_ppm") <= 1000000L))
    // alpha = 0.5 smoothing guarantees ORDER PRESERVATION and RATIO
    // COMPRESSION (share_i/share_j = sqrt(n_i/n_j) <= n_i/n_j), not
    // per-source betweenness vs uniform — a source between the
    // arithmetic and quadratic mean of sqrt(n) legitimately exceeds
    // both its proportional and the uniform share.
    val byTok = out.sortBy(_.getAs[Long]("n_tokens"))
    val shares = byTok.map(_.getAs[Long]("target_share_ppm"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    val (nMin, nMax) =
      (byTok.head.getAs[Long]("n_tokens"), byTok.last.getAs[Long]("n_tokens"))
    val ratioSm = shares.last.toDouble / shares.head
    val ratioPr = nMax.toDouble / nMin
    assert(ratioSm <= ratioPr + 1e-9 &&
      math.abs(ratioSm - math.sqrt(ratioPr)) / math.sqrt(ratioPr) < 0.01,
      s"smoothed extreme-ratio $ratioSm vs proportional $ratioPr")
  }

  test("w36 late audit: two-level frontier equals a sequential " +
    "driver-side replay") {
    val got = Relational.w36LateAudit(spark, sf).collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_late_1m"),
          r.getAs[Long]("n_late_10m"), r.getAs[Long]("n_late_60m")))
      .toMap
    val rows = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "unix_micros(ts) as tsu")
      .collect().map(r => ((r.getAs[Long]("user_id"),
        r.getAs[Long]("event_id")), r.getAs[Long]("tsu")))
      .sortBy(_._1)
    var frontier = Long.MinValue
    val agg = scala.collection.mutable.Map.empty[Long, Array[Long]]
    rows.foreach { case (_, tsu) =>
      val late = if (frontier > tsu) frontier - tsu else 0L
      val a = agg.getOrElseUpdate(tsu / 86400000000L, Array(0L, 0, 0, 0))
      a(0) += 1
      if (late > 60000000L) a(1) += 1
      if (late > 600000000L) a(2) += 1
      if (late > 3600000000L) a(3) += 1
      frontier = math.max(frontier, tsu)
    }
    assert(got == agg.map { case (d, a) =>
      d -> ((a(0), a(1), a(2), a(3)))
    }.toMap)
    // the synthetic log has real out-of-order arrivals to audit
    assert(got.values.map(_._2).sum > 0)
  }

  test("g8 spanning forest: Borůvka equals a driver-side Kruskal " +
    "with union-find over the same backbone") {
    import graft.operators.Graph
    val got = Graph.g8SpanningForest(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    // independent algorithm: Kruskal + union-find on the collected
    // backbone, same (1M - n_shared, a, b) ascending key order
    val edges = graft.operators.Graph
      .g8Backbone(spark, sf).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("a"),
        r.getAs[Long]("b")))
      .sortBy(_._1)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val want = edges.flatMap { case (_, a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(ra) = rb; Some((a, b)) } else None
    }.toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("l6 Hilbert: engine index inverts through the textbook d2xy " +
    "transform; audit rows cover both layouts consistently") {
    import graft.operators.Layout
    // textbook inverse (d2xy with per-level rot) — validating the
    // engine's forward transform against the INVERSE catches a shared
    // per-level mistake a mirrored forward reimplementation would not
    def d2xy(dIn: Long): (Long, Long) = {
      var (x, y, t) = (0L, 0L, dIn)
      var s = 1L
      while (s < 65536L) {
        val rx = 1L & (t / 2)
        val ry = 1L & (t ^ rx)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val tmp = x; x = y; y = tmp
        }
        x += s * rx
        y += s * ry
        t /= 4
        s *= 2
      }
      (x, y)
    }
    val pts = Tables.lineitem(spark, sf)
      .selectExpr("l_partkey & 65535 as x", "l_suppkey & 65535 as y")
      .distinct().limit(500)
    val hv = Layout.withHilbert(pts, "x", "y", "hv").collect()
    assert(hv.length > 100)
    hv.foreach { r =>
      val (x, y) = (r.getAs[Long]("x"), r.getAs[Long]("y"))
      assert(d2xy(r.getAs[Long]("hv")) == ((x, y)),
        s"d2xy(hv) != ($x, $y)")
    }
    // distinct points -> distinct indexes (injectivity on the sample)
    assert(hv.map(_.getAs[Long]("hv")).distinct.length == hv.length)

    val out = Layout.l6HilbertAb(spark, sf).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    assert(out.keySet == Set("hilbert", "zorder"))
    out.values.foreach { r =>
      assert(r.getAs[Long]("width_part") >= r.getAs[Long]("n_buckets"))
      assert(r.getAs[Long]("width_supp") >= r.getAs[Long]("n_buckets"))
      assert(r.getAs[Long]("depth_part_milli") ==
        r.getAs[Long]("width_part") * 1000L /
          r.getAs[Long]("part_domain"))
      assert(r.getAs[Long]("depth_supp_milli") ==
        r.getAs[Long]("width_supp") * 1000L /
          r.getAs[Long]("supp_domain"))
    }
    // aligned-block envelopes TIE by construction (any
    // quadrant-recursive curve's aligned block is the same subsquare);
    // the clustering metric is where Hilbert wins (Moon et al.)
    assert(out("hilbert").getAs[Long]("width_part") ==
      out("zorder").getAs[Long]("width_part"))
    val hRuns = out("hilbert").getAs[Long]("n_runs")
    val zRuns = out("zorder").getAs[Long]("n_runs")
    assert(out("hilbert").getAs[Long]("n_cells") ==
      out("zorder").getAs[Long]("n_cells"))
    assert(hRuns > 0 && zRuns > 0)
    assert(hRuns < zRuns,
      s"hilbert runs $hRuns should beat zorder runs $zRuns")
  }

  test("ts23 P1 rollup: six checks, framing faults counted, healthy " +
    "capture clean on continuity/PID/CRC, cadence observed") {
    val rows = TsQueries.ts23Tr101290(spark, sf).collect()
      .map(r => r.getAs[String]("check_id") ->
        (r.getAs[Long]("n_bad"), r.getAs[Long]("n_obs"))).toMap
    assert(rows.keySet == Set("p1_2_sync_byte", "p1_4_continuity",
      "p1_3a_pat_cadence", "p1_5a_pmt_cadence", "p1_6_pid_missing",
      "p2_2_crc"))
    // the planted-corruption capture loses sync on 2 of every 97
    // records (bad_sync + bad_af_length) — framing MUST fire
    val (syncBad, syncObs) = rows("p1_2_sync_byte")
    assert(syncBad > 0 && syncBad < syncObs)
    // the clean reference capture: no CC errors, every PMT-referenced
    // ES PID carries packets, every section passes CRC
    assert(rows("p1_4_continuity")._1 == 0L)
    assert(rows("p1_6_pid_missing")._1 == 0L)
    assert(rows("p1_6_pid_missing")._2 > 0L)
    assert(rows("p2_2_crc")._1 == 0L)
    // PSI repeats throughout the capture: many observed gaps
    assert(rows("p1_3a_pat_cadence")._2 > 10L)
    assert(rows("p1_5a_pmt_cadence")._2 > 10L)
    // continuity audit agrees with the R1 per-PID audit's totals
    val r1 = TsQueries.ts2CcAudit(spark, sf)
      .agg(sum("n_packets"), sum("cc_errors")).collect()(0)
    assert(rows("p1_4_continuity")._2 == r1.getLong(0))
    assert(rows("p1_4_continuity")._1 == r1.getLong(1))
  }
}
