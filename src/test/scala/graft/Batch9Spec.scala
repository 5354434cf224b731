package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Layout, Relational}

/** Round-6 batch 9: w24 RFM segmentation, a29 exact MAD, g5 bounded
  * multi-source BFS, l3 layout A/B skip audit. */
class Batch9Spec extends SparkSuite {

  test("w24 rfm: quintile scores match brute-force below-counts") {
    val out = Relational.w24Rfm(spark, sf).collect()
    assert(out.nonEmpty)
    val n = out.length
    def q(vs: Array[Long], v: Long): Long = vs.count(_ < v) * 5L / n
    val rec = out.map(_.getAs[Long]("recency_days"))
    val fre = out.map(_.getAs[Long]("frequency"))
    val mon = out.map(_.getAs[Long]("monetary"))
    out.foreach { r =>
      assert(r.getAs[Long]("r_score") ==
        5L - q(rec, r.getAs[Long]("recency_days")))
      assert(r.getAs[Long]("f_score") ==
        1L + q(fre, r.getAs[Long]("frequency")))
      assert(r.getAs[Long]("m_score") ==
        1L + q(mon, r.getAs[Long]("monetary")))
      val rfm = r.getAs[Long]("rfm")
      assert(rfm == r.getAs[Long]("r_score") * 100 +
        r.getAs[Long]("f_score") * 10 + r.getAs[Long]("m_score"))
      (1L to 5L).foreach { _ => () }
      assert(r.getAs[Long]("r_score") >= 1 && r.getAs[Long]("r_score") <= 5)
    }
    // every purchasing user appears exactly once
    val nUsers = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(out.length.toLong == nUsers)
  }

  test("a29 mad: equals brute-force lower medians") {
    val out = Relational.a29Mad(spark, sf).collect()
    assert(out.nonEmpty)
    val cents = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (g, v) => g -> v.map(_._2).sorted }
    assert(out.length == cents.size)
    out.foreach { r =>
      val vs = cents(r.getAs[String]("l_returnflag"))
      val med = vs(((vs.length + 1) / 2) - 1)
      val devs = vs.map(v => math.abs(v - med)).sorted
      val mad = devs(((devs.length + 1) / 2) - 1)
      assert(r.getAs[Long]("n") == vs.length)
      assert(r.getAs[Long]("median_cents") == med)
      assert(r.getAs[Long]("mad_cents") == mad)
    }
  }

  test("g5 bfs: hop histogram equals brute-force BFS capped at 4") {
    val rows = Graph.g5BfsHops(spark, sf).collect()
      .map(r => r.getAs[Long]("dist") -> r.getAs[Long]("n_nodes")).toMap
    assert(rows.nonEmpty)
    val edges = Tables.lineitem(spark, sf)
      .select(col("l_partkey") * 2, col("l_suppkey") * 2 + 1)
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val dist = scala.collection.mutable.Map[Long, Long]()
    var frontier = adj.keys.filter(n => n % 2 == 1 && n / 2 < 5).toSeq
    frontier.foreach(dist(_) = 0L)
    for (hop <- 1L to 4L) {
      frontier = frontier.flatMap(adj(_)).distinct
        .filterNot(dist.contains)
      frontier.foreach(dist(_) = hop)
    }
    val brute = dist.values.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val unreached = adj.keys.count(!dist.contains(_)).toLong
    brute.foreach { case (h, c) => assert(rows(h) == c, s"hop $h") }
    if (unreached > 0) assert(rows(-1L) == unreached)
    assert(rows.values.sum == adj.keys.size.toLong)
  }

  test("l3 layout ab: z-order skips strictly more than natural order") {
    val rows = Layout.l3LayoutAb(spark, sf).collect()
      .map(r => r.getAs[String]("layout") ->
        ((r.getAs[Long]("n_buckets"), r.getAs[Long]("n_skipped"),
          r.getAs[Long]("skip_ppm")))).toMap
    assert(rows.keySet == Set("zorder", "natural"))
    rows.values.foreach { case (nb, ns, ppm) =>
      assert(nb > 0 && ns >= 0 && ns <= nb)
      assert(ppm == ns * 1000000L / nb)
    }
    // the point of the operator: the clustered layout prunes at least
    // as well always, and STRICTLY better whenever the probe range is
    // actually populated (at sf0.001 partkeys stop below 500, so both
    // layouts trivially skip everything)
    assert(rows("zorder")._3 >= rows("natural")._3,
      s"z=${rows("zorder")} nat=${rows("natural")}")
    val probed = Tables.lineitem(spark, sf)
      .filter(col("l_partkey").between(500, 599)).count()
    if (probed > 0)
      assert(rows("zorder")._3 > rows("natural")._3,
        s"z=${rows("zorder")} nat=${rows("natural")}")
  }
}
