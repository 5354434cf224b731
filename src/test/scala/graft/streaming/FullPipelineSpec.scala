package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.file.{Files, Paths}

import graft.SparkSuite
import graft.ts.{PsiCodec, TsCodec, TsPipeline}

/** The reference's whole main dataflow (SURVEY §3.1) as one streaming
  * job: UDP wire → 188-B records → typed parse → per-PID section
  * reassembly → versioned table state — asserting the same PAT/PMT
  * content the batch pipeline (and the C daemon) produces. */
class FullPipelineSpec extends SparkSuite {

  test("udp -> parse -> sections -> tables end-to-end") {
    import spark.implicits._
    val stream = spark.readStream
      .format("graft.sources.UdpSource")
      .option("port", "0")
      .option("recordLength", "188")
      .load()
    val pkts = stream.as[(Long, Array[Byte])]
      .flatMap { case (seq, bytes) => TsCodec.decode(bytes, seq) }
      // PSI PIDs for this mux (static config stands in for the dynamic
      // PAT-driven routing, which needs two passes in a pure stream)
      .filter(p => p.pid == 0 || p.pid == 66)
    val tables = TableState.latestTablesStream(
      StreamingOps.sectionsStream(pkts))
    val q = tables.writeStream.format("memory").queryName("live_tables")
      .outputMode("append").start()
    try {
      var bound = 0
      val deadline = System.currentTimeMillis() + 5000
      while (bound == 0 && System.currentTimeMillis() < deadline) {
        val p = graft.sources.UdpSource.boundPorts.get(0)
        if (p != null) bound = p else Thread.sleep(50)
      }
      assert(bound != 0)
      val raw = Files.readAllBytes(Paths.get(TsPipeline.DefaultCapture))
      val sender = new DatagramSocket()
      val addr = InetAddress.getByName("127.0.0.1")
      // first ~2000 packets in legacy-UDP datagrams, 3 bursts
      val nDatagrams = 286 // ≈ 2000 packets
      (0 until nDatagrams).foreach { i =>
        sender.send(new DatagramPacket(
          java.util.Arrays.copyOfRange(raw, i * 1316, (i + 1) * 1316),
          1316, addr, bound))
        if (i % 100 == 99) { q.processAllAvailable() }
      }
      sender.close()
      val recvDeadline = System.currentTimeMillis() + 15000
      var done = false
      while (!done && System.currentTimeMillis() < recvDeadline) {
        q.processAllAvailable()
        done = spark.table("live_tables").count() >= 2
        if (!done) Thread.sleep(100)
      }
      val got = spark.table("live_tables")
        .as[TableState.CompleteTable].collect()
      // exactly one PAT version and one PMT version in this capture
      val pat = got.filter(_.tableId == 0)
      val pmt = got.filter(_.tableId == 2)
      assert(pat.length == 1 && pmt.length == 1, s"got $got")
      assert(pat.head.versionNumber == 14)
      val patRows = PsiCodec.decodeSection(0, 0,
        pat.head.sectionBytes.head).map(PsiCodec.decodePat).get
      assert(patRows == Seq(graft.ts.PatRow(1, 66)))
      assert(pmt.head.versionNumber == 27)
      val prog = PsiCodec.decodeSection(66, 0, pmt.head.sectionBytes.head)
        .flatMap(PsiCodec.decodePmt).get
      assert(prog.pcrPid == 69)
      assert(prog.es.map(e => (e.streamType, e.elementaryPid)) ==
        Seq((0x81, 68), (0x1B, 69)))
    } finally q.stop()
  }
}
