package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Validation}

/** Round-6 batch 16: v1 expectations report, e21 embedding OOD audit. */
class Batch15Spec extends SparkSuite {

  test("v1 expectations: 7 checks, clean TPC-H data passes all") {
    val out = Validation.v1Expectations(spark, sf).collect()
    assert(out.length == 7)
    val li = Tables.lineitem(spark, sf).count()
    val o = Tables.orders(spark, sf).count()
    out.foreach { r =>
      val name = r.getAs[String]("check_name")
      val n = r.getAs[Long]("n_checked")
      if (name.startsWith("lineitem.")) assert(n == li, name)
      else assert(n == o, name)
      assert(r.getAs[Long]("n_violations") == 0L, name)
      assert(r.getAs[Boolean]("passed"), name)
    }
  }

  test("v1 expectations: planted violations are counted") {
    // corrupt a copy of the inputs through a temp dir with planted
    // violations: an orphan lineitem row and an out-of-range quantity
    import org.apache.spark.sql.SaveMode
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_v1").toString
    val li = Tables.lineitem(spark, sf)
    val bad = li.limit(2)
      .withColumn("l_orderkey", lit(-999L))
      .withColumn("l_quantity", lit(9999.0))
    li.unionByName(bad).write.mode(SaveMode.Overwrite)
      .parquet(s"$tmp/lineitem.parquet")
    Seq("orders", "customer").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$tmp/$t.parquet")
    }
    val rep = Validation.v1Expectations(spark, tmp).collect()
      .map(r => r.getAs[String]("check_name") ->
        r.getAs[Long]("n_violations")).toMap
    assert(rep("lineitem.quantity_in_1_50") == 2L)
    assert(rep("lineitem.orderkey_in_orders") == 2L)
    assert(rep("lineitem.shipdate_not_null") == 0L)
  }

  test("e21 ood audit: totals and bounds against the raw assignment") {
    val rel = Similarity.e21AssignRel(spark, sf).collect()
      .map(r => (r.getAs[Long]("centroid_id"), r.getAs[Long]("sim_fp")))
    val out = Similarity.e21OodAudit(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_vecs")).sum == rel.length.toLong)
    val byList = rel.groupBy(_._1)
    assert(out.length == byList.size)
    out.foreach { r =>
      val sims = byList(r.getAs[Long]("centroid_id")).map(_._2)
      val mean = sims.sum / sims.length
      assert(r.getAs[Long]("mean_sim_fp") == mean)
      assert(r.getAs[Long]("worst_sim_fp") == sims.min)
      assert(r.getAs[Long]("n_ood") ==
        sims.count(_ < mean - 200000L).toLong)
    }
  }

  test("v2 quarantine: clean data only trips the soft review rule") {
    val out = Validation.v2Quarantine(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[String]("reasons") == "review_high_discount")
    }
    val expect = Tables.lineitem(spark, sf)
      .filter(col("l_discount") >= 0.09).count()
    assert(out.length.toLong == expect)
  }

  test("v2 quarantine: planted rows carry sorted hard reasons") {
    import org.apache.spark.sql.SaveMode
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_v2").toString
    val li = Tables.lineitem(spark, sf)
    val bad = li.limit(1)
      .withColumn("l_orderkey", lit(-1L))
      .withColumn("l_quantity", lit(99.0))
      .withColumn("l_discount", lit(0.0))
    li.unionByName(bad).write.mode(SaveMode.Overwrite)
      .parquet(s"$tmp/lineitem.parquet")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/orders.parquet")
    val rows = Validation.v2Quarantine(spark, tmp).collect()
      .filter(_.getAs[Long]("l_orderkey") == -1L)
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("reasons") ==
      "orphan_orderkey,quantity_out_of_range")
  }
}
