package graft.sinks

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** K2 over a REAL wire-level SQL store (`dbdriver_apps_procs_docs.c:
  * 186-350`): the reference's delete-by-key → insert → readback-verify
  * document cycle, executed through JDBC. The parquet K2 mapping
  * ([[Sinks.upsertByKey]]) carries the semantics; this carries the
  * actual connector mechanics — per-partition connections, batched
  * DELETE+INSERT inside one transaction per partition, and a
  * `spark.read.jdbc` readback for the verify step.
  *
  * Scale shape: the driver never sees a row. Each partition opens ONE
  * connection, deletes its keys and re-inserts its rows in one
  * transaction (the delete-then-insert pair IS the reference's upsert,
  * `:227-268`), so parallelism = partitions, and a re-run of the same
  * batch is idempotent. Tested against embedded Derby (the JDBC engine
  * Spark already ships for its metastore) — swapping in a server-mode
  * URL is a connection string, not a code change. */
object JdbcSink {

  /** DDL helper: create the target table if absent (long key + string
    * payload columns — the document-store shape K2 uses). */
  def ensureTable(url: String, table: String, schema: StructType): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val cols = schema.fields.map { f =>
        val t = f.dataType match {
          case LongType => "BIGINT"
          case IntegerType => "INT"
          case DoubleType => "DOUBLE"
          case BooleanType => "BOOLEAN"
          case _ => "VARCHAR(4096)"
        }
        s"${f.name} $t"
      }.mkString(", ")
      val st = conn.createStatement()
      try st.executeUpdate(s"CREATE TABLE $table ($cols)")
      catch {
        // Derby: X0Y32 = table exists — the one create-race we accept
        case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
      } finally st.close()
    } finally conn.close()
  }

  /** Delete-then-insert by key, one transaction per partition. */
  def upsertByKey(df: DataFrame, keyCol: String, url: String,
      table: String): Unit = {
    val schema = df.schema
    val names = schema.fieldNames
    val keyIdx = schema.fieldIndex(keyCol)
    val insertSql = s"INSERT INTO $table (${names.mkString(", ")}) " +
      s"VALUES (${names.map(_ => "?").mkString(", ")})"
    val deleteSql = s"DELETE FROM $table WHERE $keyCol = ?"
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.nonEmpty) {
        val conn = DriverManager.getConnection(url)
        conn.setAutoCommit(false)
        val del = conn.prepareStatement(deleteSql)
        val ins = conn.prepareStatement(insertSql)
        try {
          it.foreach { r =>
            del.setObject(1, r.get(keyIdx)); del.addBatch()
            var i = 0
            while (i < names.length) {
              ins.setObject(i + 1, r.get(i)); i += 1
            }
            ins.addBatch()
          }
          del.executeBatch()
          ins.executeBatch()
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally { del.close(); ins.close(); conn.close() }
      }
    }
  }

  /** The EXACTLY-ONCE streaming leg (§2.13): the `foreachBatch` body a
    * `writeStream` uses against this store. Two layers compose the
    * guarantee: the keyed delete+insert is idempotent (a re-run of the
    * same rows converges), and an epoch LEDGER (`<table>_epochs`)
    * makes a retried epoch a structural no-op — covering even the
    * window where a crash landed the data but not the ledger row (the
    * retry re-upserts idempotently, then records). This is the
    * standard exactly-once-to-JDBC recipe for Structured Streaming,
    * whose own guarantee stops at at-least-once delivery of each
    * (epochId, data) pair to foreachBatch. Returns true when the
    * epoch was applied, false when the ledger skipped it.
    *
    * The ledger's `epoch_id` is a PRIMARY KEY and the INSERT is the
    * commit point: two racing appliers of the same epoch can both
    * pass the pre-check and both (idempotently) upsert, but exactly
    * one wins the ledger insert — the loser's duplicate-key error is
    * the skip signal, not a failure.
    *
    * SINGLE-WRITER NOTE: the ledger makes the epoch RECORDED exactly
    * once, and sequential retries (Structured Streaming's actual
    * failure mode — one query, one applier at a time) are fully
    * idempotent. The DATA table itself carries no uniqueness
    * constraint, so two appliers of the same epoch running
    * CONCURRENTLY rely on the store's row locking to serialize the
    * per-key delete+insert (row-locking engines like Derby/Postgres
    * do; an eventually-consistent store would not). A deployment with
    * genuinely concurrent writers to one table should add a PRIMARY
    * KEY on the key column or serialize appliers externally. Also:
    * the ledger is per TABLE and Structured Streaming epoch ids
    * restart at 0 per checkpoint location, so two DIFFERENT queries
    * must not share one target table — their unrelated epoch 0s would
    * collide in the ledger. */
  def exactlyOnceBatch(df: DataFrame, keyCol: String, url: String,
      table: String, epochId: Long): Boolean = {
    ensureTable(url, table, df.schema)
    val conn0 = DriverManager.getConnection(url)
    try {
      val st = conn0.createStatement()
      try st.executeUpdate(
        s"CREATE TABLE ${table}_epochs (epoch_id BIGINT PRIMARY KEY)")
      catch {
        case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
      } finally st.close()
    } finally conn0.close()
    val conn = DriverManager.getConnection(url)
    val seen =
      try {
        val st = conn.prepareStatement(
          s"SELECT count(*) FROM ${table}_epochs WHERE epoch_id = ?")
        st.setLong(1, epochId)
        val rs = st.executeQuery()
        rs.next()
        val n = rs.getLong(1)
        st.close()
        n > 0
      } finally conn.close()
    if (!seen) {
      upsertByKey(df, keyCol, url, table)
      val c2 = DriverManager.getConnection(url)
      try {
        val st = c2.prepareStatement(
          s"INSERT INTO ${table}_epochs VALUES (?)")
        st.setLong(1, epochId)
        try { st.executeUpdate(); st.close(); true }
        catch {
          // 23505 = duplicate key: a concurrent applier committed this
          // epoch between our check and our insert — a skip, not an
          // error (the double upsert above was idempotent)
          case e: java.sql.SQLException if e.getSQLState == "23505" =>
            st.close(); false
        }
      } finally c2.close()
    } else false
  }

  /** The `bson_compare` readback step (`:313-336`): re-read the batch's
    * keys over JDBC and count symmetric differences (0 = verified). */
  def verifyUpsert(df: DataFrame, keyCol: String, url: String,
      table: String): Long = {
    val stored = df.sparkSession.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .load()
      .join(df.select(keyCol).distinct(), Seq(keyCol), "left_semi")
    val cols = df.columns.sorted.map(col).toSeq
    stored.select(cols: _*).exceptAll(df.select(cols: _*)).count() +
      df.select(cols: _*).exceptAll(stored.select(cols: _*)).count()
  }
}
