package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Layout, Relational, TextOps}

/** Round-6 batch 6: w22 attribution, j14 sweep-line concurrency,
  * l2 compaction planner, g4 triangle census, t51 Stupid Backoff LM.
  * Each operator is cross-checked against an INDEPENDENT in-test
  * re-derivation (driver-side brute force on sf0.001, or a
  * single-window Spark recompute), the same discipline the DuckDB
  * oracles apply at sf0.01. */
class Batch6Spec extends SparkSuite {

  test("w22 attribution: window-max equals brute-force latest-touch") {
    val out = Relational.w22Attribution(spark, sf).collect()
    assert(out.nonEmpty)
    val chans = out.map(_.getAs[String]("channel")).toSet
    assert(chans.subsetOf(Set("click", "view", "unattributed")))

    // brute force on the collected events (sf0.001 is small)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts)").as("tsus"), col("event_id"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val week = 7L * 86400000000L
    val expected = ev.filter(_._2 == "purchase").map { c =>
      val touches = ev.filter(t =>
        t._1 == c._1 && Set("click", "view").contains(t._2) &&
          t._3 >= c._3 - week && t._3 <= c._3 - 1)
      if (touches.isEmpty) ("unattributed", c._5, 0L, false)
      else {
        val best = touches.maxBy(t => (t._3, t._4))
        (best._2, c._5, c._3 - best._3, true)
      }
    }.groupBy(_._1).map { case (ch, rows) =>
      ch -> ((rows.length.toLong, rows.map(_._2).sum,
        if (rows.exists(_._4)) rows.map(_._3).sum else -1L))
    }
    assert(out.length == expected.size)
    out.foreach { r =>
      val (n, cents, lag) = expected(r.getAs[String]("channel"))
      assert(r.getAs[Long]("n_conversions") == n)
      assert(r.getAs[Long]("attributed_cents") == cents)
      val gotLag = Option(r.getAs[Any]("sum_lag_us"))
        .map(_.asInstanceOf[Long]).getOrElse(-1L)
      assert(gotLag == lag)
    }
  }

  test("j14 concurrency: sweep peak equals brute-force interval overlap") {
    val out = Relational.j14Concurrency(spark, sf).collect()
    assert(out.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_suppkey"),
        expr("unix_micros(cast(l_shipdate as timestamp))"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_.getAs[Long]("n_shipments")).sum == li.length)
    val week = 7L * 86400000000L
    // brute force one supplier: concurrency at time t = open intervals
    val supp = out.head.getAs[Long]("supp")
    val ts = li.filter(_._1 == supp).map(_._2)
    val peak = ts.map(t => ts.count(t0 => t0 <= t && t < t0 + week)).max
    val row = out.find(_.getAs[Long]("supp") == supp).get
    assert(row.getAs[Long]("max_concurrent") == peak)
    // the first peak time is an interval start where peak is attained
    val fp = row.getAs[Long]("first_peak_us")
    assert(ts.count(t0 => t0 <= fp && fp < t0 + week) == peak)
  }

  test("l2 compaction: two-level prefix sum equals direct; totals add up") {
    val out = Layout.l2Compaction(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // totals per source match the raw relation
    val raw = Tables.documents(spark, sf)
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(octet_length(col("text")).cast("long")).as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, fs) =>
      assert(fs.map(_.getAs[Long]("n_docs")).sum == raw(src)._1)
      assert(fs.map(_.getAs[Long]("bytes")).sum == raw(src)._2)
      // file ids start at 0 and are non-decreasing in doc order
      val ids = fs.sortBy(_.getAs[Long]("first_doc"))
        .map(_.getAs[Long]("file_id"))
      assert(ids.head == 0L)
      assert(ids.zip(ids.tail).forall { case (a, b) => a < b })
    }
    // independent recompute: ONE direct window (the oracle's algorithm)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(Long.MinValue, -1)
    val direct = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        octet_length(col("text")).cast("long").as("bytes"))
      .withColumn("prev", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("file_id", expr("prev div 2048"))
      .groupBy("source", "file_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("bytes")).as("bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
    assert(out.exceptAll(direct).isEmpty && direct.exceptAll(out).isEmpty)
  }

  test("g4 triangles: census equals brute-force count on the backbone") {
    val row = Graph.g4Triangles(spark, sf).collect() match {
      case Array(r) => r
      case other => fail(s"expected 1 row, got ${other.length}")
    }
    val nTri = row.getAs[Long]("n_triangles")
    val nEdges = row.getAs[Long]("n_edges")
    val nWedges = row.getAs[Long]("n_wedges")
    assert(row.getAs[Long]("clustering_ppm") ==
      (if (nWedges == 0) 0L else 3L * nTri * 1000000L / nWedges))
    // brute force: rebuild the same backbone edge set and count
    // triangles by subset enumeration over the adjacency sets
    val ps = Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = ps.groupBy(_._1).values.flatMap { g =>
      val ss = g.map(_._2).distinct.sorted
      for (i <- ss.indices; j <- i + 1 until ss.length)
        yield (ss(i), ss(j))
    }.groupBy(identity).map { case (k, v) => (k, v.size) }
    val edges = pairs.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(2000).map(_._1)
    assert(nEdges == edges.length)
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val eset = edges.toSet
    val brute = eset.toSeq.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => a < c && b < c &&
        eset.contains((math.min(a, c), math.max(a, c))) &&
        eset.contains((math.min(b, c), math.max(b, c)))): Long
    }.sum
    assert(nTri == brute, s"spark=$nTri brute=$brute")
  }

  test("t51 backoff: probabilities sane, backoff branch exercised") {
    // model invariants: c(bigram) <= c(w1) so every bigram logp <= 0
    val bg = TextOps.t51BigramModel(spark, sf)
    assert(bg.filter(col("logp") > 0).count() == 0)
    val out = TextOps.t51BackoffLm(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_backoff") <= r.getAs[Long]("n_pairs"))
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_backoff"))
      assert(r.getAs[Double]("mean_logp") < 0)
    }
    // the held-out split actually exercises the backoff branch — if it
    // didn't, the operator would be t21 with extra steps
    assert(out.map(_.getAs[Long]("n_backoff")).sum > 0)
    // scored docs = eval-split docs with >= 2 tokens
    val evalDocs = TextOps.t51Toks(spark, sf)
      .filter(!col("is_train") && size(col("t")) >= 2).count()
    assert(out.length.toLong == evalDocs)
  }
}
