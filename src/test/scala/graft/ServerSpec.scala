package graft

import graft.codec.Prompb
import graft.codec.Prompb._
import graft.serve.Server
import java.net.HttpURLConnection
import java.nio.file.Files

/** The HTTP front door end-to-end: POST /write → stored table →
  * POST /read → decoded series; /metrics counters.
  */
class ServerSpec extends SparkSpec {

  private def post(url: String, body: Array[Byte]): (Int, Array[Byte]) = {
    val conn = new java.net.URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.getOutputStream.write(body)
    val code = conn.getResponseCode
    val in = if (code < 400) conn.getInputStream else conn.getErrorStream
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = if (in == null) -1 else in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    conn.disconnect()
    (code, out.toByteArray)
  }

  private def get(url: String): (Int, String) = {
    val conn = new java.net.URL(url).openConnection().asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, body)
  }

  test("serve: write → read → metrics round-trip over real HTTP") {
    val table = Files.createTempDirectory("graft_srv").toString + "/metrics"
    val server = new Server(spark, table).start()
    val base = s"http://localhost:${server.boundPort}"
    try {
      val wr = PWriteRequest(Seq(
        PTimeSeries(
          Seq(PLabel("__name__", "testmetric"), PLabel("job", "demo")),
          Seq(PSample(1.23, 123456789123L), PSample(Double.NaN, 123456789123L))),
        PTimeSeries(
          Seq(PLabel("__name__", "other")),
          Seq(PSample(9.0, 123456789123L)))))
      val (wc, _) = post(s"$base/write",
        Prompb.snappyCompress(Prompb.encodeWriteRequest(wr)))
      assert(wc == 200)

      // stored: NaN dropped, 2 rows persisted
      assert(spark.read.parquet(table).count() == 2)

      val rr = PReadRequest(Seq(PQuery(
        123456789123L - 60000, 123456789123L + 60000,
        Seq(PLabelMatcher(MatchType.EQ, "__name__", "testmetric")))))
      val (rc, body) = post(s"$base/read",
        Prompb.snappyCompress(Prompb.encodeReadRequest(rr)))
      assert(rc == 200)
      val resp = Prompb.decodeReadResponse(Prompb.snappyUncompress(body))
      assert(resp.results.length == 1)
      val ts = resp.results.head.timeseries
      assert(ts.length == 1)
      assert(ts.head.labels.contains(PLabel("__name__", "testmetric")))
      assert(ts.head.labels.contains(PLabel("job", "demo")))
      assert(ts.head.samples.map(_.value) == Seq(1.23))

      // bad payload → 400, not a crash
      val (bc, _) = post(s"$base/write", Array[Byte](1, 2, 3))
      assert(bc == 400)

      val (mc, metrics) = get(s"$base/metrics")
      assert(mc == 200)
      assert(metrics.contains("received_samples_total 3"))
      assert(metrics.contains("""sent_samples_total{remote="parquet"} 3"""))
    } finally server.stop()
  }
}
