package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Round-6 batch 13 (drift/inequality analytics): a31 gini
  * concentration, a32 two-sample KS drift, a33 CUSUM changepoint,
  * w26 week-over-week change. Each op is verified against an
  * independent brute-force recomputation on the collected rows. */
class Batch12Spec extends SparkSuite {

  private def cents(v: Double): Long = math.floor(v * 100 + 0.5).toLong

  test("a31 gini: matches the brute-force rank formula per segment") {
    val out = Relational.a31Gini(spark, sf).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[Long]("n_customers"), r.getAs[Long]("total_cents"),
          r.getAs[Long]("gini_ppm"))).toMap
    assert(out.nonEmpty)
    val spend = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_custkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), cents(r.getDouble(2))))
      .groupBy(r => (r._1, r._2)).toSeq.map { case ((seg, _), rows) =>
        (seg, rows.map(_._3).sum)
      }
    spend.groupBy(_._1).foreach { case (seg, rows) =>
      val xs = rows.map(_._2).sorted
      val n = xs.length.toLong
      val stot = xs.sum
      val s1 = xs.zipWithIndex.map { case (x, i) =>
        BigInt(x) * (i + 1)
      }.sum
      val gini = (BigInt(2) * s1 - BigInt(n + 1) * stot) * 1000000 /
        (BigInt(n) * stot)
      val (gn, gs, gp) = out(seg)
      assert(gn == n && gs == stot && gp == gini.toLong,
        s"$seg: got $gp expected $gini")
    }
  }

  test("a32 KS drift: matches brute-force empirical-CDF max distance") {
    val row = Relational.a32KsDrift(spark, sf).collect().head
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), cents(r.getDouble(1))))
    val s1 = ev.filter(_._1 == "purchase").map(_._2).sorted
    val s2 = ev.filter(_._1 == "click").map(_._2).sorted
    val grid = (s1 ++ s2).distinct.sorted
    val diffs = grid.map { v =>
      val c1 = s1.count(_ <= v).toLong
      val c2 = s2.count(_ <= v).toLong
      (v, (BigInt(c1) * s2.length - BigInt(c2) * s1.length).abs)
    }
    val mx = diffs.map(_._2).max
    val atV = diffs.filter(_._2 == mx).map(_._1).min
    assert(row.getAs[Long]("n1") == s1.length.toLong)
    assert(row.getAs[Long]("n2") == s2.length.toLong)
    assert(row.getAs[Long]("d_ppm") ==
      (mx * 1000000 / (BigInt(s1.length) * s2.length)).toLong)
    assert(row.getAs[Long]("at_cents") == atV)
  }

  test("a33 cusum: deviations sum to zero and the peak day is right") {
    val out = Relational.a33Cusum(spark, sf).collect()
    assert(out.nonEmpty)
    val daily = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), cents(r.getDouble(2))))
      .groupBy(r => (r._1, r._2))
      .map { case ((et, day), rows) => (et, day, rows.map(_._3).sum) }
      .toSeq
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val series = daily.filter(_._1 == et).sortBy(_._2)
      val nd = series.length.toLong
      val stot = series.map(_._3).sum
      var cu = BigInt(0)
      val cusums = series.map { case (_, day, x) =>
        cu += BigInt(x) * nd - stot
        (day, cu.abs)
      }
      assert(cu == 0, s"$et: scaled deviations must telescope to zero")
      val mx = cusums.map(_._2).max
      assert(r.getAs[Long]("n_days") == nd)
      assert(r.getAs[Long]("max_abs_cusum") == mx.toLong)
      assert(r.getAs[Long]("change_day") ==
        cusums.filter(_._2 == mx).map(_._1).min)
    }
  }

  test("w26 wow: first week dropped, ppm matches truncating division") {
    val out = Relational.w26WowChange(spark, sf).collect()
    assert(out.nonEmpty)
    val wk = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("unix_micros(ts) div 604800000000").as("week"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), cents(r.getDouble(2))))
      .groupBy(r => (r._1, r._2))
      .map { case ((et, w), rows) =>
        (et, w, rows.map(_._3).sum, rows.length.toLong)
      }.toSeq
    val expected = wk.groupBy(_._1).flatMap { case (et, rows) =>
      val ordered = rows.sortBy(_._2)
      ordered.sliding(2).collect { case Seq(prev, cur) =>
        (et, cur._2) -> (cur._4, cur._3,
          ((BigInt(cur._3) - prev._3) * 1000000 / prev._3).toLong)
      }
    }.toMap
    assert(out.length == expected.size)
    out.foreach { r =>
      val key = (r.getAs[String]("event_type"), r.getAs[Long]("week"))
      val (n, c, ppm) = expected(key)
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("cents") == c)
      assert(r.getAs[Long]("wow_ppm") == ppm, s"$key")
    }
  }
}
