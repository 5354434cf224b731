package graft

import graft.operators.Relational

/** Round-6 batch 17: a36 peak concurrency sweep line. */
class Batch16Spec extends SparkSuite {

  test("a36 peak concurrency: equals brute-force sweep, tie rule held") {
    def micros(ts: java.sql.Timestamp): Long =
      math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L
    val sess = Relational.w8SessionAgg(spark, sf).collect()
      .map(r => (micros(r.getAs[java.sql.Timestamp]("session_start")),
        micros(r.getAs[java.sql.Timestamp]("session_end"))))
    val deltas = sess.flatMap { case (a, b) =>
      Seq((a, 1L), (b, -1L))
    }.groupBy(identity).toSeq
      .map { case ((t, d), g) => (t, d, d * g.size) }
      .sortBy(e => (e._1, e._2))
    var run = 0L
    var peak = Long.MinValue
    var at = 0L
    deltas.foreach { case (t, _, d) =>
      run += d
      if (run > peak) { peak = run; at = t }
    }
    val row = Relational.a36PeakConcurrency(spark, sf).collect().head
    assert(row.getAs[Long]("peak_concurrency") == peak)
    assert(row.getAs[Long]("at_us") == at)
    assert(row.getAs[Long]("n_sessions") == sess.length.toLong)
    assert(peak >= 1L && peak <= sess.length.toLong)
  }

  test("z25 stress: 20 aligned replicas multiply the peak exactly") {
    val base = Relational.a36PeakConcurrency(spark, sf).collect().head
    val stress = Relational.diag("z25_a36_20x")(spark, sf)
      .collect().head
    assert(stress.getAs[Long]("peak_concurrency") ==
      graft.operators.TextOps.stressReps *
        base.getAs[Long]("peak_concurrency"))
    assert(stress.getAs[Long]("at_us") == base.getAs[Long]("at_us"))
  }
}
