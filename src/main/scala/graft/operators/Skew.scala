package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot-key joins (builder-prompt scale list:
  * "salting for skew"). AQE's skew-join handles sort-merge spills
  * automatically; explicit salting is the tool when a broadcast is too
  * big and a handful of keys dominate (a 100 TB PID-69-style key).
  *
  * `saltedJoin(fact, dim, key, salts)`: the fact side gets a uniform
  * random-free salt derived from a row hash (deterministic — repeatable
  * runs); the dim side is replicated `salts` times, so the join key
  * (key, salt) splits each hot key into `salts` partitions.
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // deterministic per-row salt: stable hash of all fact columns
    val factSalted = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(salts)))
    val dimReplicated = dim
      .withColumn("__salt",
        explode(sequence(lit(0), lit(salts - 1))))
    val out = factSalted.join(dimReplicated,
      Seq(key, "__salt"), joinType)
    out.drop("__salt")
  }

  /** Two-stage aggregation for skewed group keys: partial per (key,
    * salt), then final per key. For algebraic aggregates Spark's
    * map-side partials already do this; the explicit form is for
    * order-insensitive but non-algebraic buffers (e.g. HLL merge) or
    * when a single reducer key would overflow. */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame =
    df
      // salt from the whole row, NOT the key — same-key rows must spread
      .groupBy(key.as("k"),
        pmod(hash(df.columns.map(col).toSeq: _*), lit(salts)).as("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("cnt"))
}
