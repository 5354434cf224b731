package graft

import graft.operators.{Relational, Validation}

/** Round-8 batch: v8 PII audit and a60 CUSUM against closed-form
  * recomputes. */
class Batch34Spec extends SparkSuite {

  test("a60: two-sided CUSUM matches an independent scalar replay " +
    "of the recurrence, baseline and thresholds") {
    val daily = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 86400000000 as day",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.sum("cents").as("x"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"),
        r.getAs[Long]("x")))
    def fd(n: Long, d: Long): Long = (n - (((n % d) + d) % d)) / d
    val out = Relational.a60Cusum(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val ser = rows.sortBy(_._2).map(r => (r._2, r._3))
      val mu = fd(ser.take(14).map(_._2).sum, math.min(ser.length, 14))
      val k = fd(mu, 20)
      val h = fd(mu, 2)
      var sp = 0L; var sn = 0L
      var mxp = 0L; var mxn = 0L; var nal = 0L; var first = -1L
      ser.foreach { case (day, x) =>
        sp = math.max(0L, sp + x - mu - k)
        sn = math.max(0L, sn + mu - x - k)
        mxp = math.max(mxp, sp); mxn = math.max(mxn, sn)
        if (sp > h || sn > h) {
          nal += 1
          if (first < 0) first = day
        }
      }
      val r = out(et)
      assert(r.getAs[Long]("n_days") == ser.length.toLong, s"$et n")
      assert(r.getAs[Long]("target_cents") == mu, s"$et mu")
      assert(r.getAs[Long]("max_cusum_pos") == mxp, s"$et mxp")
      assert(r.getAs[Long]("max_cusum_neg") == mxn, s"$et mxn")
      assert(r.getAs[Long]("n_alarm_days") == nal, s"$et nal")
      assert(r.getAs[Long]("first_alarm_day") == first, s"$et first")
    }
  }

  test("v8: per-source PII census matches the doc_id-grid closed form " +
    "and redaction removes exactly the planted spans") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val out = Validation.v8PiiAudit(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(out.keySet == docs.map(_._2).toSet)
    docs.groupBy(_._2).foreach { case (src, grp) =>
      val ids = grp.map(_._1)
      val emails = ids.count(_ % 7 == 0)
      val ssns = ids.count(_ % 11 == 0)
      val withPii = ids.count(i => i % 7 == 0 || i % 11 == 0)
      val r = out(src)
      assert(r.getAs[Long]("n_docs") == ids.length.toLong, s"$src docs")
      // one planted email + one planted IPv4 per %7 doc; one planted
      // SSN-shaped id per %11 doc; the corpus itself is digit-free so
      // nothing else can match
      assert(r.getAs[Long]("n_emails") == emails.toLong, s"$src emails")
      assert(r.getAs[Long]("n_ips") == emails.toLong, s"$src ips")
      assert(r.getAs[Long]("n_ids") == ssns.toLong, s"$src ids")
      assert(r.getAs[Long]("docs_with_pii") == withPii.toLong, s"$src")
      // redaction delta: planted spans minus the fixed-width tags —
      // email "user<id>@mail.example.com" (21 + digits) -> "<EMAIL>"
      // (7), ip "10.0.<id%200>.99" (8 + digits) -> "<IP>" (4),
      // ssn "ddd-dd-dddd" (11) -> "<ID>" (4)
      val delta = ids.map { i =>
        val e =
          if (i % 7 == 0)
            (21 + i.toString.length - 7) +
              (8 + (i % 200).toString.length - 4)
          else 0
        val s = if (i % 11 == 0) 11 - 4 else 0
        e + s
      }.sum
      assert(r.getAs[Long]("redact_delta_chars") == delta.toLong,
        s"$src delta")
    }
  }
}
