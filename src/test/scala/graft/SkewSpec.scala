package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSuite {

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = (0 until 10000)
      .map(i => (if (i % 10 == 0) i % 7 else 99, i.toLong))
      .toDF("k", "v")
    val dim = (0 until 100).map(i => (i, s"name_$i")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).select("k", "v", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salted join preserves left-outer null rows") {
    import spark.implicits._
    val fact = Seq((1, 10L), (2, 20L), (777, 30L)).toDF("k", "v")
    val dim = Seq((1, "a"), (2, "b")).toDF("k", "name")
    val out = Skew.saltedJoin(fact, dim, "k", salts = 4, "left")
    assert(out.count() == 3)
    assert(out.filter(col("k") === 777 && col("name").isNull).count() == 1)
  }

  test("salted count equals plain count") {
    import spark.implicits._
    val df = (0 until 5000)
      .map(i => (if (i % 100 == 0) i else 42, i)).toDF("k", "v")
    val got = Skew.saltedCount(df, col("k"), 16)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = df.groupBy("k").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
