package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, Relational}

/** Round-6 batch 15: g7 k-core peeling, s11 skyline. */
class Batch14Spec extends SparkSuite {

  test("g7 k-core: every member has core degree >= k, peel is maximal") {
    val out = Graph.g7Kcore(spark, sf).collect()
      .map(r => r.getAs[Long]("supplier") -> r.getAs[Long]("core_deg"))
      .toMap
    // brute-force peel on the collected strong-tie pair set
    val pairs = Graph.coPairs(spark, sf)
      .filter(col("n_shared") >= 2).select("s_a", "s_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = (pairs ++ pairs.map(p => (p._2, p._1))).toSet
    var changed = true
    while (changed) {
      val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size }
      val bad = deg.filter(_._2 < 3).keySet
      changed = bad.nonEmpty
      edges = edges.filterNot(e => bad(e._1) || bad(e._2))
    }
    val expect = edges.groupBy(_._1)
      .map { case (n, es) => n -> es.size.toLong }
    assert(out == expect, s"${out.size} core nodes vs ${expect.size}")
    out.values.foreach(d => assert(d >= 3L))
  }

  test("s11 skyline: equals the brute-force dominance scan") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_size"),
        expr("cast(floor(p_retailprice * 100 + 0.5) as bigint)")
          .as("c")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expect = parts.filter { a =>
      !parts.exists(b => b._3 <= a._3 && b._2 >= a._2 &&
        (b._3 < a._3 || b._2 > a._2))
    }.map(_._1).toSet
    val got = Relational.s11Skyline(spark, sf).collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    assert(got == expect, s"got ${got.size} expected ${expect.size}")
    // frontier sanity: it is an antichain — sizes strictly increase
    // as prices decrease when walking the distinct frontier points
    val pts = Relational.s11Skyline(spark, sf).collect()
      .map(r => (r.getAs[Int]("p_size"), r.getAs[Long]("price_cents")))
      .distinct.sortBy(_._1)
    pts.sliding(2).foreach {
      case Array((s1, p1), (s2, p2)) =>
        assert(s1 < s2 && p1 < p2, "frontier must be strictly monotone")
      case _ => ()
    }
  }
}
