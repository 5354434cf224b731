package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** g2 components / g3 co-supplier: structural invariants. */
class GraphFamilySpec extends SparkSuite {

  test("g2 components: labels partition the strong-edge node set") {
    val out = Graph.g2Components(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // component census adds up: every node is a part xor a supplier
    assert(rows.forall(r => r.getAs[Long]("n_parts") +
      r.getAs[Long]("n_suppliers") == r.getAs[Long]("n_nodes")))
    // every component contains at least one edge endpoint of each side
    // (an edge-connected bipartite component has both kinds)
    assert(rows.forall(r => r.getAs[Long]("n_parts") >= 1 &&
      r.getAs[Long]("n_suppliers") >= 1))
    // comp labels are min node ids — even (a part) or odd (supplier),
    // but always ≤ every member, so distinct across components
    assert(rows.map(_.getAs[Long]("comp")).distinct.length == rows.length)
  }

  test("g3 co-supplier: overlap bounded by either degree") {
    val out = Graph.g3CoSupplier(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val sh = r.getAs[Long]("n_shared")
      assert(sh <= r.getAs[Long]("n_a") && sh <= r.getAs[Long]("n_b"))
      val expected = sh * 1000000L /
        (r.getAs[Long]("n_a") + r.getAs[Long]("n_b") - sh)
      assert(r.getAs[Long]("jaccard_ppm") == expected)
      assert(r.getAs[Long]("s_a") < r.getAs[Long]("s_b"))
    }
    // descending by n_shared
    val ns = rows.map(_.getAs[Long]("n_shared"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }
}
