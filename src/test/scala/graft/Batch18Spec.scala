package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Round-6 batch 19: w29 top session paths. */
class Batch18Spec extends SparkSuite {

  test("w29 top paths: matches the brute-force path census") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("t"),
        col("event_id"), col("event_type"),
        expr("unix_timestamp(ts)").as("sec"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      // sessionize on the same second-granularity 1800s gap rule
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[String]]
      var lastSec = Long.MinValue
      ordered.foreach { r =>
        if (lastSec == Long.MinValue || r._5 - lastSec > 1800)
          sessions += scala.collection.mutable.ArrayBuffer.empty[String]
        sessions.last += r._4
        lastSec = r._5
      }
      sessions.map(s => s.take(5).mkString(">"))
    }
    val counts = paths.groupBy(identity).map { case (p, g) =>
      p -> g.size.toLong
    }
    val expect = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    val got = Relational.w29TopPaths(spark, sf).collect()
      .sortBy(_.getAs[Int]("rnk"))
      .map(r => r.getAs[String]("path") -> r.getAs[Long]("n_sessions"))
    assert(got.toSeq == expect, s"got ${got.toSeq}\nexp $expect")
  }

  test("j18 temporal lookup: equals the brute-force interval scan") {
    val out = operators.Changelog.j18TemporalLookup(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[String]("attr_value")),
          Option(r.get(r.fieldIndex("version"))))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("t"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1)
    var checked = 0
    byUser.foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val dims = ordered.filter(_._4 != "purchase")
      // runs of equal consecutive event_type = versions
      val runs = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, Int)] // (start, attr, version)
      var ver = 0
      dims.foreach { r =>
        if (runs.isEmpty || runs.last._2 != r._4) {
          ver += 1; runs += ((r._2, r._4, ver))
        }
      }
      ordered.filter(_._4 == "purchase").foreach { f =>
        val at = runs.takeWhile(_._1 <= f._2).lastOption
        val (gAttr, gVer) = out(f._3)
        assert(gAttr == at.map(_._2), s"event ${f._3}")
        assert(gVer.map(_.asInstanceOf[Int]) == at.map(_._3))
        checked += 1
      }
    }
    assert(checked > 0 && checked == out.size)
  }
}
