package graft.sources

import org.apache.spark.sql.streaming.StreamingQuery

/** S1 runtime reconfiguration — the reference's `PUT input_url` settings
  * path (`mpeg2_sp.c:692-826`) calls `comm_reset_external`
  * (`mpeg2_sp.c:722-736`) to tear down and reopen the UDP socket while
  * the processor instance stays alive. In Spark the socket lives inside a
  * `StreamingQuery`, so the same semantics are: stop the query, start a
  * new one against the new address. Keyed streaming state survives the
  * retune when the caller's `build` uses a fixed checkpointLocation —
  * state is keyed by group key, not by source address, which is exactly
  * the reference behavior (PSI registers persist across an input retune;
  * cleared only by processor delete).
  *
  * Thread-safe: REST-style setters may race, as in the reference's
  * settings mutex.
  */
final class ReconfigurableIngest(build: String => StreamingQuery) {
  @volatile private var current: Option[(String, StreamingQuery)] = None

  /** The active input URL, if started. */
  def inputUrl: Option[String] = current.map(_._1)

  /** The active query, if started. */
  def query: Option[StreamingQuery] = current.map(_._2)

  /** Open the ingest on `url` (no-op restart if already on `url`). */
  def start(url: String): StreamingQuery = synchronized {
    current match {
      case Some((u, q)) if u == url && q.isActive => q
      case _ =>
        current.foreach(_._2.stop())
        val q = build(url)
        current = Some((url, q))
        q
    }
  }

  /** `PUT input_url`: swap the source address. Stops the running query
    * (releasing its socket) before binding the new one. */
  def reconfigure(url: String): StreamingQuery = synchronized {
    current.foreach(_._2.stop())
    current = None
    start(url)
  }

  /** Processor close (`mpeg2_sp_close`): stop and release. */
  def stop(): Unit = synchronized {
    current.foreach(_._2.stop())
    current = None
  }
}

object ReconfigurableIngest {
  private val UdpUrl = "udp://([^:/]+):([0-9]+)".r

  /** Parse the reference's `input_url` shape, e.g. `udp://234.5.5.5:2000`
    * (`mpeg2_sp.c:722-736`, test value `utests_mpeg2_sp.cpp`). */
  def parseUdpUrl(url: String): (String, Int) = url match {
    case UdpUrl(host, port) => (host, port.toInt)
    case _ => throw new IllegalArgumentException(s"not a udp url: $url")
  }

  /** Convenience builder for the graft UDP source. */
  def udpIngest(spark: org.apache.spark.sql.SparkSession)(
      sink: org.apache.spark.sql.DataFrame => StreamingQuery)
      : ReconfigurableIngest =
    new ReconfigurableIngest(url => {
      val (_, port) = parseUdpUrl(url)
      sink(spark.readStream
        .format("graft.sources.UdpSource")
        .option("port", port.toString)
        .option("recordLength", "188")
        .load())
    })
}
