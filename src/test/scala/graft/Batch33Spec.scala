package graft

import graft.operators.{Relational, TsQueries}

/** Round-7 batch 33: ts26 mux bandwidth budget, a59 Cohen's d effect
  * size. */
class Batch33Spec extends SparkSuite {

  test("ts26 mux budget: bytes reconcile (188 = 4 + payload + " +
    "overhead per packet), shares sum to ~1e6, null PID flagged") {
    val out = TsQueries.ts26MuxBudget(spark, sf).collect()
    assert(out.nonEmpty)
    val pk = graft.ts.TsLake.packets(spark).collect()
    val byPid = pk.groupBy(_.pid)
    assert(out.length == byPid.size)
    out.foreach { r =>
      val pid = r.getAs[Int]("pid")
      val g = byPid(pid)
      val payload = g.map(p =>
        Option(p.payload).map(_.length.toLong).getOrElse(0L)).sum
      assert(r.getAs[Long]("n_packets") == g.length.toLong)
      assert(r.getAs[Long]("bytes") == 188L * g.length)
      assert(r.getAs[Long]("payload_bytes") == payload, s"pid $pid")
      assert(r.getAs[Long]("overhead_bytes") ==
        184L * g.length - payload)
      assert(r.getAs[Boolean]("is_null_pid") == (pid == 8191))
      assert(r.getAs[Long]("share_ppm") ==
        g.length.toLong * 1000000L / pk.length)
    }
    val shares = out.map(_.getAs[Long]("share_ppm")).sum
    assert(shares <= 1000000L && shares > 1000000L - out.length)
  }

  test("a59 effect size: d^2 ppm matches the exact cross-multiplied " +
    "ratio against a driver-side recount") {
    val out = Relational.a59EffectSize(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) as us",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) as cents")
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        (Math.floorDiv(r.getAs[Long]("us"), 86400000000L) + 3) % 7 >= 5,
        r.getAs[Long]("cents")))
      .groupBy(_._1)
    out.foreach { r =>
      val et = r.getAs[String]("event_type")
      val g = ev(et)
      val we = g.filter(_._2).map(_._3)
      val wd = g.filterNot(_._2).map(_._3)
      val (n1, n0) = (BigInt(we.size), BigInt(wd.size))
      val s1 = BigInt(we.sum)
      val s0 = BigInt(wd.sum)
      val q1 = we.map(c => BigInt(c) * c).sum
      val q0 = wd.map(c => BigInt(c) * c).sum
      assert(r.getAs[Long]("n1") == we.size.toLong)
      assert(r.getAs[Long]("n0") == wd.size.toLong)
      assert(r.getAs[Int]("gap_sign") == (s1 * n0 - s0 * n1).signum)
      val num = (s1 * n0 - s0 * n1).pow(2) * (n1 + n0 - 2) * 1000000
      val den = n1 * n0 *
        (n0 * (n1 * q1 - s1 * s1) + n1 * (n0 * q0 - s0 * s0))
      assert(BigInt(r.getAs[Long]("d2_ppm")) == num / den, s"$et d2")
    }
  }
}
