package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Multimodal, Relational, TextOps}

/** Round-6 batch 8: j15 nearest-asof, t53 token-budget selection,
  * a28 trimmed mean, m8 asset dedup clusters. */
class Batch8Spec extends SparkSuite {

  test("j15 nearest-asof: equals brute force on every event") {
    val out = AsOf.j15AsofNearest(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[Any]("nearest_orderkey")), r.getAs[Long]("dt_us"),
          r.getAs[String]("matched")))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), expr("unix_micros(ts)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(cast(o_orderdate as timestamp))"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.size == ev.length)
    val tol = 30L * 86400000000L
    ev.foreach { case (eid, uid, t) =>
      val cands = ord.filter(o => o._2 == uid && math.abs(o._3 - t) <= tol)
      val (gotKey, gotDt, gotSide) = out(eid)
      if (cands.isEmpty) {
        assert(gotKey.isEmpty && gotDt == -1L && gotSide == "none")
      } else {
        // min (absdist, forward-flag, -orderkey)
        val best = cands.minBy(o =>
          (math.abs(o._3 - t), if (o._3 <= t) 0 else 1, -o._1))
        assert(gotKey.map(_.asInstanceOf[Long]).contains(best._1),
          s"event $eid: got $gotKey want ${best._1}")
        assert(gotDt == math.abs(best._3 - t))
        assert(gotSide == (if (best._3 <= t) "backward" else "forward"))
      }
    }
  }

  test("t53 token budget: greedy quality prefix, two-level ≡ direct") {
    val rows = TextOps.t53TokenBudget(spark, sf).collect()
    assert(rows.nonEmpty)
    val budget = rows.map(_.getAs[Long]("n_tokens")).sum / 2
    val sorted = rows.sortBy(r =>
      (-r.getAs[Long]("score"), r.getAs[Long]("doc_id")))
    // kept = exactly the selection-order prefix whose offset < budget
    var cum = 0L
    sorted.foreach { r =>
      assert(r.getAs[Long]("sel_offset") == cum,
        s"doc ${r.getAs[Long]("doc_id")}: offset")
      assert(r.getAs[Boolean]("kept") == (cum < budget))
      cum += r.getAs[Long]("n_tokens")
    }
    // the kept set stops within one doc of the budget
    val keptTok = rows.filter(_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("n_tokens")).sum
    val maxDoc = rows.map(_.getAs[Long]("n_tokens")).max
    assert(keptTok >= budget && keptTok < budget + maxDoc)
  }

  test("a28 trimmed mean: equals brute-force sort-and-trim per group") {
    val out = Relational.a28TrimmedMean(spark, sf).collect()
    assert(out.nonEmpty)
    val cents = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, v) => g -> v.map(_._2).sorted }
    assert(out.length == cents.size)
    out.foreach { r =>
      val g = r.getAs[String]("l_returnflag")
      val vs = cents(g)
      val k = (vs.length * 5 / 100).toInt
      val kept = vs.slice(k, vs.length - k)
      assert(r.getAs[Long]("n") == vs.length)
      assert(r.getAs[Long]("k") == k)
      assert(r.getAs[Long]("n_kept") == kept.length)
      assert(r.getAs[Long]("sum_kept_cents") == kept.sum)
      assert(r.getAs[Long]("lo_kept") == kept.min)
      assert(r.getAs[Long]("hi_kept") == kept.max)
      assert(r.getAs[Long]("mean_kept_micros") ==
        kept.sum * 1000000L / kept.length)
    }
  }

  test("m8 asset clusters: closure consistent with the m6 pair set") {
    val pairs = Multimodal.m6MediaNearDup(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assume(pairs.nonEmpty)
    val clusters = Multimodal.m8AssetClusters(spark, sf).collect()
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    assert(clusters.map(_.getAs[Long]("n_assets")).sum == nodes.length)
    // brute-force union-find closure
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val brute = nodes.groupBy(find).map { case (_, m) =>
      (m.min, m.length.toLong)
    }.toSet
    val got = clusters.map(c =>
      (c.getAs[Long]("keep_id"), c.getAs[Long]("n_assets"))).toSet
    assert(got == brute, s"got ${got.size} vs brute ${brute.size}")
  }
}
