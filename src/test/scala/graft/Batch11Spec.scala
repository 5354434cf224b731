package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, TextOps}

/** Round-6 batch 11 (relational tail): a30 k-anonymity rollup,
  * w25 bounded-window sliding median, t56 dataset datasheet. */
class Batch11Spec extends SparkSuite {

  test("a30 kanon: no thin slice escapes, totals conserve") {
    val out = Relational.a30KanonRollup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      // a named (non-suppressed) slice must meet the k threshold;
      // the suppressed bucket may be any size (it absorbs the tails)
      if (et != "suppressed") assert(r.getAs[Long]("n_events") >= 20L)
    }
    val total = out.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sf).count())
  }

  test("w25 sliding median: equals brute force over ordered purchases") {
    val out = Relational.w25SlidingMedian(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Int]("n_win"), r.getAs[Long]("med_cents"))).toMap
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts)").as("t"),
        col("event_id"),
        expr("cast(floor(value * 100 + 0.5) as bigint)").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.size == purchases.length)
    purchases.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      ordered.indices.foreach { i =>
        val win = ordered.slice(math.max(0, i - 4), i + 1)
          .map(_._4).sorted
        val (nWin, med) = out(ordered(i)._3)
        assert(nWin == win.length)
        assert(med == win((win.length + 1) / 2 - 1),
          s"event ${ordered(i)._3}: $med vs ${win.mkString(",")}")
      }
    }
  }

  test("t56 datasheet: shares sum to ~1e6, volumes conserve") {
    val out = TextOps.t56Datasheet(spark, sf).collect()
    assert(out.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val shareSum = out.map(_.getAs[Long]("share_ppm")).sum
    // floor division: the sum can fall short by at most one per slice
    assert(shareSum <= 1000000L && shareSum > 1000000L - out.length)
    out.foreach { r =>
      val dup = r.getAs[Long]("dup_ppm")
      assert(dup >= 0L && dup < 1000000L)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_docs"))
    }
  }
}
