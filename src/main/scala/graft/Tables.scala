package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver test schema (TESTDATA.md).
  *
  * All queries take the scale-factor directory at call time so the same
  * code runs sf0.001 (smoke) → sf0.1 (bench) → a real cluster at 100 TB:
  * nothing below ever collects to the driver or assumes a row count.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations and TIMESTAMP(MICROS, no-tz) in others; normalize both to
    * session-UTC TimestampType so every downstream query sees one type.
    *  - NANOS: Spark's vectorized reader rejects it — read nanos as Long
    *    and integer-divide to micros (plain `/` would go through Double
    *    and lose precision above 2^53; epoch-nanos are ~1.7e18).
    *  - MICROS no-tz: arrives as TIMESTAMP_NTZ; with the session timezone
    *    pinned to UTC the cast to TimestampType is wall-clock-identical
    *    to what DuckDB's `epoch_us(ts)` sees on the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
}
