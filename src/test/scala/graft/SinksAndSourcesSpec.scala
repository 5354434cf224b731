package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.PeakWithReset
import graft.operators.Settings
import graft.sinks.{JdbcSink, Sinks}

class SinksAndSourcesSpec extends SparkSuite {

  test("K2 upsert: replace-by-key keeps other keys, readback verifies") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-upsert").toString + "/t"
    val v1 = Seq(("a", 1L), ("b", 2L)).toDF("sys_id", "v")
    Sinks.upsertByKey(v1, "sys_id", dir)
    assert(Sinks.verifyUpsert(v1, "sys_id", dir) == 0)
    // update only key "a"; "b" must survive untouched
    val v2 = Seq(("a", 10L)).toDF("sys_id", "v")
    Sinks.upsertByKey(v2, "sys_id", dir)
    assert(Sinks.verifyUpsert(v2, "sys_id", dir) == 0)
    val all = spark.read.parquet(dir).collect()
      .map(r => r.getAs[String]("sys_id") -> r.getAs[Long]("v")).toMap
    assert(all == Map("a" -> 10L, "b" -> 2L))
  }

  test("K2 wire-level: JDBC delete+insert+verify round-trip against a " +
    "real SQL store (embedded Derby), idempotent and key-replacing") {
    import spark.implicits._
    val db = Files.createTempDirectory("graft-jdbc").toString + "/k2db"
    val url = s"jdbc:derby:$db;create=true"
    val v1 = Seq((1L, "doc-a", 10L), (2L, "doc-b", 20L))
      .toDF("sys_id", "doc", "v")
    JdbcSink.ensureTable(url, "procs_docs", v1.schema)
    JdbcSink.upsertByKey(v1, "sys_id", url, "procs_docs")
    assert(JdbcSink.verifyUpsert(v1, "sys_id", url, "procs_docs") == 0)
    // re-running the same batch must not duplicate rows (delete-first)
    JdbcSink.upsertByKey(v1, "sys_id", url, "procs_docs")
    assert(JdbcSink.verifyUpsert(v1, "sys_id", url, "procs_docs") == 0)
    // update key 1 only; key 2 must survive untouched
    val v2 = Seq((1L, "doc-a2", 11L)).toDF("sys_id", "doc", "v")
    JdbcSink.upsertByKey(v2, "sys_id", url, "procs_docs")
    assert(JdbcSink.verifyUpsert(v2, "sys_id", url, "procs_docs") == 0)
    val all = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "procs_docs").load()
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(all == Map(1L -> ("doc-a2", 11L), 2L -> ("doc-b", 20L)))
    // the real K2 payload: the k5 registry document rows themselves
    val reg = graft.operators.Settings.k5InstanceCreate(spark, sf)
      .filter(col("proc_id").isNotNull)
      .select(col("proc_id"), col("proc_name"), col("envelope"))
    JdbcSink.ensureTable(url, "registry", reg.schema)
    JdbcSink.upsertByKey(reg, "proc_id", url, "registry")
    assert(JdbcSink.verifyUpsert(reg, "proc_id", url, "registry") == 0)
    assert(reg.count() > 0)
  }

  test("exactly-once streaming to JDBC: a real foreachBatch stream " +
    "lands each epoch once; a replayed epoch is a ledger no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val db = Files.createTempDirectory("graft-jdbc-eo").toString + "/eo"
    val url = s"jdbc:derby:$db;create=true"
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("sys_id", "doc")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
          epochId: Long) =>
        JdbcSink.exactlyOnceBatch(batch, "sys_id", url, "docs", epochId)
        ()
      }
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b")); q.processAllAvailable()
      mem.addData((2L, "b2"), (3L, "c")); q.processAllAvailable()
    } finally q.stop()
    def stored(): Map[Long, String] = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "docs").load()
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stored() == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // simulate the at-least-once failure mode: epoch 0 is delivered
    // AGAIN (Spark's retry contract re-sends the same epoch's data) —
    // the ledger must make it a no-op, even stale data cannot regress
    val replay = Seq((1L, "a"), (2L, "b")).toDF("sys_id", "doc")
    val applied = JdbcSink.exactlyOnceBatch(
      replay, "sys_id", url, "docs", epochId = 0L)
    assert(!applied)
    assert(stored() == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // a genuinely new epoch still applies
    val next = Seq((4L, "d")).toDF("sys_id", "doc")
    assert(JdbcSink.exactlyOnceBatch(next, "sys_id", url, "docs", 99L))
    assert(stored() ==
      Map(1L -> "a", 2L -> "b2", 3L -> "c", 4L -> "d"))
  }

  test("corpus writer: partition-pruned layout, lossless readback, " +
    "bounded files") {
    val dir = Files.createTempDirectory("graft-corpus").toString + "/c"
    val docs = Tables.documents(spark, sf)
    Sinks.writeCorpus(docs, dir, maxRecordsPerFile = 50)
    // hive-style partition dirs exist for every (lang, split) present
    val root = new java.io.File(dir)
    val langDirs = root.listFiles().filter(_.isDirectory).map(_.getName)
    assert(langDirs.forall(_.startsWith("lang=")) && langDirs.length >= 2)
    // readback is lossless on the data columns
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.select("doc_id", "text").exceptAll(
      docs.select("doc_id", "text")).count() == 0)
    // a per-lang read prunes partitions: only that lang's files scanned
    val pruned = back.filter(org.apache.spark.sql.functions.col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(pruned.count() ==
      docs.filter(org.apache.spark.sql.functions.col("lang") === "en").count())
    // maxRecordsPerFile honored: no file exceeds 50 rows
    val files = spark.read.parquet(dir)
      .select(org.apache.spark.sql.functions
        .input_file_name().as("f")).groupBy("f").count()
    assert(files.filter(org.apache.spark.sql.functions.col("count") > 50)
      .count() == 0)
    assert(scan != null)
  }

  test("K1 udp emit: rows arrive as datagrams on a loopback socket") {
    import spark.implicits._
    val recv = new DatagramSocket(0)
    recv.setSoTimeout(5000)
    val port = recv.getLocalPort
    val payloads = (0 until 20).map(i => Array.fill[Byte](188)(i.toByte))
    val df = payloads.zipWithIndex.map { case (b, i) => (i, b) }
      .toDF("i", "bytes")
    val got = scala.collection.mutable.Set[Int]()
    val t = new Thread {
      override def run(): Unit = {
        val buf = new Array[Byte](4096)
        try while (got.size < 20) {
          val p = new DatagramPacket(buf, buf.length)
          recv.receive(p)
          assert(p.getLength == 188)
          got.synchronized { got += (p.getData()(0) & 0xFF) }
        } catch { case _: Exception => }
      }
    }
    t.start()
    Sinks.udpEmit(df, "bytes", "127.0.0.1", port)
    t.join(6000)
    recv.close()
    assert(got.synchronized(got.toSet) == (0 until 20).toSet)
  }

  test("A2 peak-with-reset aggregator") {
    import spark.implicits._
    val in = Seq(
      (1.0, false), (5.0, false), (3.0, false)).toDS()
    val peak = in.select(PeakWithReset.toColumn).first()
    assert(peak == 5.0)
    // reset mid-fold (single partition → deterministic order)
    val in2 = Seq((9.0, false), (0.0, true), (4.0, false)).toDS()
      .coalesce(1)
    assert(in2.select(PeakWithReset.toColumn).first() == 4.0)
  }

  test("P9 dual parse: JSON and query-string agree on every row") {
    val df = Settings.p9DualParse(spark, sf)
    assert(df.filter(col("k_from_json") =!= col("k_from_qs")).count() == 0)
    assert(df.filter(col("k_from_json").isNull).count() == 0)
  }

  test("P9 parseSettings handles both encodings") {
    import spark.implicits._
    val rows = Seq(
      """{"tag":"x","input_url":"udp://1.2.3.4:2000","cbr":300}""",
      "tag=x&input_url=udp://1.2.3.4:2000&cbr=300").toDF("body")
    val parsed = rows.select(Settings.parseSettings(col("body")).as("s"))
      .select("s.tag", "s.input_url", "s.cbr").collect()
    assert(parsed.length == 2)
    assert(parsed.forall(r => r.getString(0) == "x" &&
      r.getString(1) == "udp://1.2.3.4:2000" && r.getLong(2) == 300L))
  }

  test("k5 instance create: malformed POSTs rejected, ids dense") {
    val df = Settings.k5InstanceCreate(spark, sf).cache()
    val rejected = df.filter(col("proc_name").isNull)
    val accepted = df.filter(col("proc_name").isNotNull)
    // the sf0.001 events table has 'error'-typed first events → both
    // branches of the mandatory-proc_name check are exercised
    assert(accepted.count() > 0)
    assert(rejected.filter(col("http_code") =!= 404).count() == 0)
    assert(rejected.filter(col("proc_id").isNotNull).count() == 0)
    // accepted proc_ids are dense 0..n-1 in arrival order (the
    // reference's next-free-slot allocation under creation-only load)
    val ids = accepted.select("proc_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until ids.length).toSeq)
    assert(accepted.filter(col("http_code") =!= 201).count() == 0)
    assert(accepted.filter(!col("envelope").contains("\"Created\""))
      .count() == 0)
    df.unpersist()
  }

  test("k6 instance list: one doc, every accepted instance present") {
    val doc = Settings.k6InstanceList(spark, sf).collect()
    assert(doc.length == 1)
    val json = doc(0).getString(0)
    assert(json.startsWith("{\"stream_procs\":[") && json.endsWith("]}"))
    val n = Settings.k5InstanceCreate(spark, sf)
      .filter(col("proc_id").isNotNull).count()
    assert("\\{\"proc_id\":".r.findAllIn(json).length == n)
  }

  test("p11 scte offsets: int32 clamp exercised both directions") {
    val df = Settings.p11ScteOffsets(spark, sf).cache()
    assert(df.filter(col("duration_offset_msec") > 2147483647L ||
      col("duration_offset_msec") < -2147483648L).count() == 0)
    assert(df.filter(col("vpos_offset_pels") > 2147483647L ||
      col("vpos_offset_pels") < -2147483648L).count() == 0)
    // sf0.001 raw values overflow int32 low (duration: (id-5000)*1e6
    // reaches -5e9) — the clamp actually fires
    assert(df.filter(col("duration_offset_msec") === -2147483648L)
      .count() > 0)
    assert(df.filter(col("settings_doc").contains("-2147483648"))
      .count() > 0)
    df.unpersist()
  }

  test("S1 udp source: capture packets stream through and parse") {
    import graft.ts.TsCodec
    val stream = spark.readStream
      .format("graft.sources.UdpSource")
      .option("port", "0")
      .option("recordLength", "188")
      .load()
    val q = stream.writeStream.format("memory").queryName("udp_in")
      .outputMode("append").start()
    try {
      // wait for the receiver to bind, then learn the ephemeral port
      var bound = 0
      val deadline = System.currentTimeMillis() + 5000
      while (bound == 0 && System.currentTimeMillis() < deadline) {
        val p = graft.sources.UdpSource.boundPorts.get(0)
        if (p != null) bound = p else Thread.sleep(50)
      }
      assert(bound != 0, "udp source did not bind")
      // send 70 packets as 10 × 1316 B legacy-UDP datagrams
      val data = Files.readAllBytes(java.nio.file.Paths.get(
        graft.ts.TsPipeline.DefaultCapture))
      val sender = new DatagramSocket()
      val addr = InetAddress.getByName("127.0.0.1")
      (0 until 10).foreach { i =>
        val dgram = java.util.Arrays.copyOfRange(
          data, i * 1316, (i + 1) * 1316)
        sender.send(new DatagramPacket(dgram, dgram.length, addr, bound))
      }
      sender.close()
      val recvDeadline = System.currentTimeMillis() + 10000
      var n = 0L
      while (n < 70 && System.currentTimeMillis() < recvDeadline) {
        q.processAllAvailable()
        n = spark.table("udp_in").count()
      }
      assert(n == 70, s"got $n packets")
      // every received record must parse as a TS packet
      val parsed = spark.table("udp_in").collect().map { r =>
        TsCodec.decode(r.getAs[Array[Byte]]("bytes"),
          r.getAs[Long]("seq"))
      }
      assert(parsed.forall(_.isDefined))
    } finally q.stop()
  }

  test("S2 tsudpsend: paced capture replay arrives as 1316B datagrams") {
    val recv = new DatagramSocket(0)
    recv.setSoTimeout(5000)
    val port = recv.getLocalPort
    val got = new java.util.concurrent.atomic.AtomicLong(0)
    val firstOk = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      val buf = new Array[Byte](2048)
      try {
        while (true) {
          val p = new DatagramPacket(buf, buf.length)
          recv.receive(p)
          if (got.getAndIncrement() == 0)
            firstOk.set(p.getLength == 1316 && buf(0) == 0x47)
        }
      } catch { case _: Exception => () }
    })
    reader.start()
    // clip the capture to 20 datagrams worth, pace at 1 Mbps (~210 ms)
    val data = Files.readAllBytes(java.nio.file.Paths.get(
      graft.ts.TsPipeline.DefaultCapture))
    val tmp = Files.createTempFile("graft-replay", ".ts")
    Files.write(tmp, java.util.Arrays.copyOfRange(data, 0, 20 * 1316))
    try {
      val t0 = System.nanoTime()
      val sent = graft.sinks.Sinks.tsudpsend(
        tmp.toString, "127.0.0.1", port, bps = 1000000L)
      val elapsedMs = (System.nanoTime() - t0) / 1000000L
      assert(sent == 20)
      // pacing: 20 × 1316 B × 8 at 1 Mbps ≈ 210 ms — not a burst
      assert(elapsedMs >= 150, s"sent too fast: ${elapsedMs}ms")
      val deadline = System.currentTimeMillis() + 3000
      while (got.get() < 20 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      assert(got.get() == 20)
      assert(firstOk.get(), "first datagram malformed")
    } finally {
      recv.close()
      Files.delete(tmp)
    }
  }

  test("S1 reconfigure: input_url PUT rebinds the socket, query swaps") {
    import graft.sources.{ReconfigurableIngest, UdpSource}
    var nq = 0
    val ingest = ReconfigurableIngest.udpIngest(spark) { df =>
      nq += 1
      df.writeStream.format("memory").queryName(s"recfg_$nq")
        .outputMode("append").start()
    }
    def awaitBind(not: Int): Int = {
      val deadline = System.currentTimeMillis() + 5000
      var p = 0
      while ((p == 0 || p == not) &&
          System.currentTimeMillis() < deadline) {
        val b = UdpSource.boundPorts.get(0)
        if (b != null) p = b
        if (p == 0 || p == not) Thread.sleep(50)
      }
      assert(p != 0 && p != not, "udp source did not (re)bind")
      p
    }
    def send(port: Int, n: Int): Unit = {
      val sender = new DatagramSocket()
      val addr = InetAddress.getByName("127.0.0.1")
      val payload = Array.fill[Byte](188)(0x47)
      (0 until n).foreach { _ =>
        sender.send(new DatagramPacket(payload, 188, addr, port))
      }
      sender.close()
    }
    val q1 = ingest.start("udp://127.0.0.1:0")
    try {
      val p1 = awaitBind(not = 0)
      send(p1, 5)
      val d1 = System.currentTimeMillis() + 10000
      while (spark.table("recfg_1").count() < 5 &&
        System.currentTimeMillis() < d1) q1.processAllAvailable()
      assert(spark.table("recfg_1").count() == 5)

      // PUT input_url → old query stops (socket released), new one binds
      val q2 = ingest.reconfigure("udp://127.0.0.1:0")
      assert(!q1.isActive && q2.isActive)
      assert(ingest.inputUrl.contains("udp://127.0.0.1:0"))
      val p2 = awaitBind(not = p1)
      send(p2, 3)
      val d2 = System.currentTimeMillis() + 10000
      while (spark.table("recfg_2").count() < 3 &&
        System.currentTimeMillis() < d2) q2.processAllAvailable()
      assert(spark.table("recfg_2").count() == 3)
    } finally ingest.stop()
  }
}
