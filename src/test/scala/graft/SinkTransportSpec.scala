package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sinks.{FanOut, Formatters, Transport}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S7/S8 transport against in-JVM backends: a TCP sink for Graphite, an
  * HTTP server for OpenTSDB/Influx — asserting both the exact bytes that
  * land on the wire and the reference's error contracts (partial-failure
  * counts from OpenTSDB's 400 body, whole-batch failure on refused dial,
  * per-sink isolation through FanOut).
  */
class SinkTransportSpec extends SparkSpec {
  import spark.implicits._

  private def samples: DataFrame = Seq(
    ("m1", Map("__name__" -> "m1", "job" -> "a"), 1.5, 1000L),
    ("m1", Map("__name__" -> "m1", "job" -> "b"), 2.5, 2000L),
    ("m2", Map("__name__" -> "m2", "job" -> "a"), 3.5, 3000L),
    ("m2", Map("__name__" -> "m2", "job" -> "b"), 4.5, 4000L),
    ("m3", Map("__name__" -> "m3", "job" -> "a"), 5.5, 5000L)
  ).toDF("name", "labels", "value", "timestampMs")

  /** Accepts TCP connections and records each connection's full payload. */
  private class TcpSink {
    private val server = new java.net.ServerSocket(0)
    val received = new ConcurrentLinkedQueue[String]()
    val port: Int = server.getLocalPort
    private val t = new Thread(() =>
      try while (true) {
        val sock = server.accept()
        val bytes = sock.getInputStream.readAllBytes()
        received.add(new String(bytes, UTF_8))
        sock.close()
      } catch { case _: java.net.SocketException => () })
    t.setDaemon(true); t.start()
    def close(): Unit = server.close()
  }

  /** One-route HTTP server returning a canned (status, body). */
  private def httpSink(status: Int, body: String,
                       log: ConcurrentLinkedQueue[String]): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      log.add(ex.getRequestURI.toString + "\u0000" +
        new String(ex.getRequestBody.readAllBytes(), UTF_8))
      val b = body.getBytes(UTF_8)
      ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length.toLong)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    server
  }

  test("S8 transport: graphite lines arrive as exact TCP bytes") {
    val sink = new TcpSink
    try {
      val lines = Formatters.graphiteLines(samples, "prefix.")
      val stats = Transport.totals(
        Transport.graphitePush(lines.coalesce(1), "127.0.0.1", sink.port))
      assert(stats == Transport.WriteStats(5, 0, None))
      // the single partition produced one connection whose payload is the
      // concatenated newline-terminated lines
      val eventually = (1 to 50).exists { _ =>
        if (sink.received.size >= 1) true else { Thread.sleep(100); false }
      }
      assert(eventually, "TCP sink never received the payload")
      val payload = sink.received.poll()
      val want = lines.as[String].collect().sorted.mkString
      assert(payload.split("\n").sorted.mkString("", "\n", "\n") == want)
    } finally sink.close()
  }

  test("S8 transport: refused dial fails the whole partition batch") {
    val deadPort = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    val lines = Formatters.graphiteLines(samples, "prefix.")
    val stats = Transport.totals(
      Transport.graphitePush(lines.coalesce(1), "127.0.0.1", deadPort))
    assert(stats.sent == 0 && stats.failed == 5 && stats.error.nonEmpty)
  }

  test("S7 transport: 204 stores all; request is one JSON array at /api/put") {
    val log = new ConcurrentLinkedQueue[String]()
    val server = httpSink(204, "", log)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val stats = Transport.totals(
        Transport.opentsdbPut(Formatters.opentsdbJson(samples).coalesce(1), url))
      assert(stats == Transport.WriteStats(5, 0, None))
      assert(log.size == 1)
      val Array(uri, body) = log.poll().split("\u0000", 2)
      assert(uri == "/api/put")
      assert(body.startsWith("[{\"metric\":") && body.endsWith("}]"))
      assert(body.count(_ == '{') == 10) // 5 requests x (object + tags object)
    } finally server.stop(0)
  }

  test("S7 transport: 400 body's failed/success split is honored (partial failure)") {
    val log = new ConcurrentLinkedQueue[String]()
    val server = httpSink(400, """{"failed":2,"success":3,"errors":[]}""", log)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val stats = Transport.totals(
        Transport.opentsdbPut(Formatters.opentsdbJson(samples).coalesce(1), url))
      assert(stats.sent == 3 && stats.failed == 2)
      assert(stats.error.exists(_.contains("failed to write 2 samples to OpenTSDB, 3 succeeded")))
    } finally server.stop(0)
  }

  test("S6 transport: influx line-protocol POST with db/precision params") {
    val log = new ConcurrentLinkedQueue[String]()
    val server = httpSink(204, "", log)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val stats = Transport.totals(Transport.influxPush(
        Formatters.influxLines(samples).coalesce(1), url, "prometheus", "autogen"))
      assert(stats == Transport.WriteStats(5, 0, None))
      val Array(uri, body) = log.poll().split("\u0000", 2)
      assert(uri == "/write?db=prometheus&rp=autogen&precision=ms")
      assert(body.linesIterator.size == 5 && body.contains(" value=1.5 1000"))
    } finally server.stop(0)
  }

  test("S3+S7/S8: fan-out over real transports isolates the dead sink") {
    val log = new ConcurrentLinkedQueue[String]()
    val server = httpSink(204, "", log)
    val deadPort = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val outcomes = FanOut.fanOut(samples, Seq(
        "opentsdb" -> { df =>
          val st = Transport.totals(Transport.opentsdbPut(Formatters.opentsdbJson(df).coalesce(1), url))
          st.error.foreach(e => throw new RuntimeException(e))
          st.sent
        },
        "graphite" -> { df =>
          val st = Transport.totals(
            Transport.graphitePush(Formatters.graphiteLines(df, "p.").coalesce(1), "127.0.0.1", deadPort))
          st.error.foreach(e => throw new RuntimeException(e))
          st.sent
        })).sortBy(_.sink)
      assert(outcomes.map(o => (o.sink, o.sent, o.failed)) ==
        Seq(("graphite", 0L, 5L), ("opentsdb", 5L, 0L)))
      assert(outcomes.head.error.nonEmpty)
    } finally server.stop(0)
  }

  test("S8 transport: udp sends the partition batch as one exact datagram") {
    val sock = new java.net.DatagramSocket(0)
    val received = new ConcurrentLinkedQueue[String]()
    val t = new Thread(() =>
      try while (true) {
        val pkt = new java.net.DatagramPacket(new Array[Byte](65536), 65536)
        sock.receive(pkt)
        received.add(new String(pkt.getData, pkt.getOffset, pkt.getLength, UTF_8))
      } catch { case _: java.net.SocketException => () })
    t.setDaemon(true); t.start()
    try {
      val lines = Formatters.graphiteLines(samples, "prefix.")
      val stats = Transport.totals(Transport.graphitePush(
        lines.coalesce(1), "127.0.0.1", sock.getLocalPort, transport = "udp"))
      assert(stats == Transport.WriteStats(5, 0, None))
      val eventually = (1 to 50).exists { _ =>
        if (received.size >= 1) true else { Thread.sleep(100); false }
      }
      assert(eventually, "UDP sink never received the datagram")
      // ONE datagram carrying the whole batch, like the reference's
      // single conn.Write of the batch buffer over a UDP conn
      assert(received.size == 1)
      val payload = received.poll()
      val want = lines.as[String].collect().sorted.mkString
      assert(payload.split("\n").sorted.mkString("", "\n", "\n") == want)
    } finally sock.close()
  }

  test("S8 transport: udp dial failure fails the whole partition batch") {
    val lines = Formatters.graphiteLines(samples, "prefix.")
    val stats = Transport.totals(Transport.graphitePush(
      lines.coalesce(1), "graft-no-such-host.invalid", 2003, transport = "udp"))
    assert(stats.sent == 0 && stats.failed == 5 && stats.error.nonEmpty)
  }

  test("transport rejects unknown graphite transports, cli accepts udp") {
    intercept[IllegalArgumentException] {
      Transport.graphitePush(Formatters.graphiteLines(samples, ""),
        "127.0.0.1", 2003, transport = "unix")
    }
  }

  test("non-positive send timeouts fall back to the connect bound, never infinite") {
    assert(Transport.effectiveTimeoutMs(30000) == 30000)
    assert(Transport.effectiveTimeoutMs(0) == 5000)    // 0 = infinite in the JDK
    assert(Transport.effectiveTimeoutMs(-7) == 5000)   // negative would throw
  }

  test("jsonIntField parses flat int fields and rejects absent ones") {
    assert(Transport.jsonIntField("""{"failed":2,"success":13}""", "success") == Some(13L))
    assert(Transport.jsonIntField("""{"failed": 2 }""", "failed") == Some(2L))
    assert(Transport.jsonIntField("""{"failed":2}""", "success") == None)
  }

  test("remote-write sink: proto+snappy with the RW headers, series " +
      "grouped and ts-sorted; non-2xx fails the partition") {
    val bodies = new ConcurrentLinkedQueue[Array[Byte]]()
    val headers = new ConcurrentLinkedQueue[String]()
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/write", (ex: HttpExchange) => {
      bodies.add(ex.getRequestBody.readAllBytes())
      headers.add(ex.getRequestHeaders.getFirst("Content-Encoding") + "|" +
        ex.getRequestHeaders.getFirst("X-Prometheus-Remote-Write-Version") +
        "|" + ex.getRequestHeaders.getFirst("Content-Type"))
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/write"
      val stats = Transport.totals(
        Transport.remoteWritePush(samples.coalesce(1), url))
      assert(stats == Transport.WriteStats(5, 0, None))
      assert(bodies.size == 1)
      assert(headers.poll() ==
        "snappy|0.1.0|application/x-protobuf")
      val wr = graft.codec.Prompb.decodeWriteRequest(
        graft.codec.Prompb.snappyUncompress(bodies.poll()))
      // 5 samples over 5 distinct label sets → 5 series, labels sorted
      assert(wr.timeseries.size == 5)
      assert(wr.timeseries.forall(ts =>
        ts.labels.map(_.name) == ts.labels.map(_.name).sorted))
      val bySeries = wr.timeseries.map(ts =>
        ts.labels.map(l => s"${l.name}=${l.value}").mkString(",") ->
          ts.samples).toMap
      assert(bySeries("__name__=m1,job=a") ==
        Seq(graft.codec.Prompb.PSample(1.5, 1000L)))
      // a 500 downstream fails the partition batch
      val dead = HttpServer.create(new InetSocketAddress(0), 0)
      dead.createContext("/write", (ex: HttpExchange) => {
        ex.sendResponseHeaders(500, -1); ex.close()
      })
      dead.start()
      try {
        val bad = Transport.totals(Transport.remoteWritePush(
          samples.coalesce(1),
          s"http://127.0.0.1:${dead.getAddress.getPort}/write"))
        assert(bad.sent == 0 && bad.failed == 5 && bad.error.nonEmpty)
      } finally dead.stop(0)
    } finally server.stop(0)
  }
}
