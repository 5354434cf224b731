package graft

import graft.operators.Validation

/** Round-8 batch: the v8 PII audit against a closed-form recompute. */
class Batch34Spec extends SparkSuite {

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
