package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Round-6 batch 7: w23 streaming attribution parity, a27 decayed
  * engagement, s10 equi-depth histogram, sc8 URL canonicalization. */
class Batch7Spec extends SparkSuite {

  test("w23: streaming last-touch state machine ≡ batch window-max") {
    val stream = streaming.TwsOps.attributionReplay(spark, sf)
    val batch = Relational.w23AttributionDetail(spark, sf)
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).isEmpty &&
      batch.exceptAll(stream).isEmpty)
    // every purchase emits exactly once
    val nPurch = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(stream.count() == nPurch)
  }

  test("a27: decay weights monotone, per-user sums recompute exactly") {
    val w = Relational.a27DecayWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    // 0 < w <= 1, strictly decreasing in age
    w.toSeq.sortBy(_._1).sliding(2).foreach {
      case Seq((a1, w1), (a2, w2)) =>
        assert(a1 < a2 && w1.compareTo(w2) > 0)
      case _ => ()
    }
    assert(w(0L).compareTo(java.math.BigDecimal.ONE) == 0)
    val out = Relational.a27DecayedEngagement(spark, sf).collect()
    val users = out.map(_.getAs[Long]("user_id"))
    assert(users.distinct.length == users.length && out.nonEmpty)
    // exact recompute for one user from the dumped weights
    val u = users.min
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000"),
        expr("cast(floor(value * 100 + 0.5) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val anchor = ev.map(_._2).max
    val mine = ev.filter(_._1 == u)
    val expCount = mine.map(e => w(anchor - e._2)).reduce(_ add _)
    val expCents = mine.map(e =>
      w(anchor - e._2).multiply(java.math.BigDecimal.valueOf(e._3)))
      .reduce(_ add _)
    val row = out.find(_.getAs[Long]("user_id") == u).get
    assert(row.getAs[Long]("n_events") == mine.length)
    // output contract is DOUBLE (one final cast of the exact decimal
    // sum) — the expected value takes the identical single rounding
    assert(row.getAs[Double]("decayed_count") == expCount.doubleValue)
    assert(row.getAs[Double]("decayed_cents") == expCents.doubleValue)
  }

  test("s10: deciles partition the value domain in order") {
    val rows = Relational.s10Equidepth(spark, sf).collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(rows.nonEmpty && rows.length <= 10)
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    rows.foreach(r =>
      assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents")))
    // bins tile the domain: ranges strictly increase, never overlap
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_cents") < b.getAs[Long]("lo_cents"))
      case _ => ()
    }
    // equi-depth up to tie granularity: every bin is within one tie
    // group of n/10 — with near-unique cents each holds ~10% of rows
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") >= total / 20,
        s"bin ${r.getAs[Long]("bin")} too thin: ${r.getAs[Long]("n_rows")}")
    }
  }

  test("sc8: canonical forms are clean and census adds up") {
    val out = Relational.sc8UrlCanonical(spark, sf).collect()
    assert(out.nonEmpty)
    val total = Tables.events(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_hits")).sum == total)
    out.foreach { r =>
      val c = r.getAs[String]("canonical_url")
      assert(!c.contains("#") && !c.contains("utm_"))
      assert(!c.contains("CDN") && !c.contains("Example"))
      assert(!c.split("\\?")(0).endsWith("/"))
      assert(r.getAs[Long]("n_variants") >= 1 &&
        r.getAs[Long]("n_variants") <= r.getAs[Long]("n_hits"))
      // the example really is one of the variants of this canonical
      val ex = r.getAs[String]("example_url")
      val nofrag = ex.split("#")(0)
      val base = nofrag.split("\\?")(0).toLowerCase
        .replaceAll("/+$", "")
      val q = nofrag.split("\\?")(1).split("&")
        .filterNot(_.startsWith("utm_")).mkString("&")
      assert(c == (if (q.isEmpty) base else s"$base?$q"))
    }
  }
}
