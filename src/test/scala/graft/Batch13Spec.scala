package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, TextOps}

/** Round-6 batch 14: a34 integer EWMA fold, a35 streaming EWMA
  * parity, t57 dedup survivorship election. */
class Batch13Spec extends SparkSuite {

  private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  test("a34 ewma: matches the sequential integer recurrence") {
    val out = Relational.a34Ewma(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("cents"), r.getAs[Long]("ewma_cents"))).toMap
    val daily = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), cents(r.getDouble(2))))
      .groupBy(r => (r._1, r._2)).toSeq
      .map { case ((et, day), rows) => (et, day, rows.map(_._3).sum) }
    assert(out.size == daily.size)
    daily.groupBy(_._1).foreach { case (et, rows) =>
      var ewma = Long.MinValue
      rows.sortBy(_._2).foreach { case (_, day, x) =>
        ewma = if (ewma == Long.MinValue) x else (x + 3 * ewma) / 4
        val (gc, ge) = out((et, day))
        assert(gc == x && ge == ewma, s"($et, $day): $ge vs $ewma")
      }
    }
  }

  test("a35 stream ewma: replay emissions equal the batch fold") {
    val stream = streaming.TwsOps.ewmaReplay(spark, sf, batches = 3)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("cents"), r.getAs[Long]("ewma_cents"))).toMap
    val batch = Relational.a34Ewma(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
        (r.getAs[Long]("cents"), r.getAs[Long]("ewma_cents"))).toMap
    assert(stream == batch,
      s"stream ${stream.size} rows vs batch ${batch.size}")
  }

  test("t57 survivorship: election and accounting against t17 + docs") {
    val comp = TextOps.t17DupComponents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("comp")).toMap
    val chars = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = TextOps.t57Survivorship(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_members")).sum == comp.size.toLong)
    val byComp = comp.toSeq.groupBy(_._2)
    assert(out.length == byComp.size)
    out.foreach { r =>
      val members = byComp(r.getAs[Long]("comp")).map(_._1)
      val best = members.map(id => (chars(id), id))
        .sortBy(t => (-t._1, t._2)).head
      assert(r.getAs[Long]("survivor_id") == best._2)
      assert(r.getAs[Long]("survivor_chars") == best._1)
      assert(r.getAs[Long]("n_dropped") == members.size - 1L)
      assert(r.getAs[Long]("total_chars") == members.map(chars).sum)
    }
  }

  test("w33 stream median: replay emissions equal batch w25") {
    val stream = streaming.TwsOps.medianReplay(spark, sf, batches = 3)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Int]("n_win"), r.getAs[Long]("med_cents"))).toMap
    val batch = Relational.w25SlidingMedian(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Int]("n_win"), r.getAs[Long]("med_cents"))).toMap
    assert(stream == batch,
      s"stream ${stream.size} rows vs batch ${batch.size}")
  }
}
