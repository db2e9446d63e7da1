package graft.sinks

import java.io.IOException
import java.net.{DatagramPacket, DatagramSocket, HttpURLConnection, InetSocketAddress, Socket, URI}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S7/S8 (+S6) real sink transport: the formatters (Formatters.scala)
  * produce exact wire strings; this layer puts them on the wire from the
  * EXECUTORS — one connection per partition, never collecting to the
  * driver (the Spark analogue of the reference's per-batch client Write:
  * graphite/client.go:83-104, opentsdb/client.go:77-141,
  * influxdb/client.go:82-113).
  *
  * Each partition's writer returns one `WriteStats` row; `totals` reduces
  * them to the per-remote sent/failed counters the reference exports
  * (main.go:396-406). Failure isolation is per PARTITION: a refused
  * connection marks that partition's samples failed and leaves other
  * partitions (and other sinks, via FanOut) untouched — at cluster scale
  * each executor dials the backend directly, which is exactly how a
  * distributed remote-write tier fans into a storage backend.
  *
  * Error-count semantics per backend, mirroring the reference:
  *  - Graphite: plaintext over TCP or UDP; any dial/write error fails the
  *    whole partition batch (graphite/client.go: `conn.Write` error
  *    returns — sendSamples then counts every sample failed).
  *  - OpenTSDB: HTTP POST to /api/put; 204 = all stored; 400 carries a
  *    JSON body whose `failed`/`success` counts are the PARTIAL-failure
  *    contract (opentsdb/client.go:124-141) — we honor the split rather
  *    than failing the batch.
  *  - InfluxDB: HTTP POST of line-protocol to /write; 204 = stored, any
  *    other status fails the partition batch.
  */
object Transport {

  /** One partition's write outcome; `totals` folds these into the
    * per-remote counters. */
  case class WriteStats(sent: Long, failed: Long, error: Option[String])

  private val ConnectTimeoutMs = 5000

  /** HttpURLConnection/Socket treat timeout 0 as INFINITE — a caller
    * passing 0 (or negative, which would throw inside the executor task)
    * to mean "no preference" must not silently disable the bound. Any
    * non-positive timeout falls back to the short fixed connect bound.
    */
  private[graft] def effectiveTimeoutMs(timeoutMs: Int): Int =
    if (timeoutMs > 0) timeoutMs else ConnectTimeoutMs

  /** S8: Graphite plaintext over TCP or UDP — the reference dials either
    * per config (graphite/client.go:84, flag main.go:149-151) and writes
    * the whole batch buffer in ONE conn.Write. Input: the `line` column
    * from Formatters.graphiteLines (each line newline-terminated, so a
    * partition's concatenation is the exact wire payload). Over UDP the
    * batch goes as a single datagram, exactly like the reference's
    * conn.Write on a UDP conn — a partition payload above the ~64 KiB
    * datagram limit fails that partition's batch (IOException), the same
    * error the Go Write returns; size partitions accordingly.
    */
  def graphitePush(lines: DataFrame, host: String, port: Int,
                   timeoutMs: Int = 30000,
                   transport: String = "tcp"): Dataset[WriteStats] = {
    require(transport == "tcp" || transport == "udp",
      s"graphite transport must be tcp or udp, got '$transport'")
    val spark = lines.sparkSession
    import spark.implicits._
    lines.select(col("line")).as[String].mapPartitions { it =>
      val batch = it.toArray
      if (batch.isEmpty) Iterator.empty
      else Iterator.single(
        try {
          val payload = batch.mkString.getBytes(UTF_8)
          if (transport == "udp") {
            val sock = new DatagramSocket()
            try {
              // connect() resolves + pins the peer: unresolvable hosts
              // fail here, and later ICMP port-unreachable surfaces as
              // an IOException on send instead of being dropped.
              sock.connect(new InetSocketAddress(host, port))
              sock.setSoTimeout(effectiveTimeoutMs(timeoutMs))
              sock.send(new DatagramPacket(payload, payload.length))
              WriteStats(batch.length.toLong, 0L, None)
            } finally sock.close()
          } else {
            val sock = new Socket()
            try {
              sock.connect(new InetSocketAddress(host, port), ConnectTimeoutMs)
              sock.setSoTimeout(effectiveTimeoutMs(timeoutMs))
              sock.getOutputStream.write(payload)
              sock.getOutputStream.flush()
              WriteStats(batch.length.toLong, 0L, None)
            } finally sock.close()
          }
        } catch {
          case e: IOException => WriteStats(0L, batch.length.toLong, errMsg(e))
        })
    }
  }

  /** S7: OpenTSDB HTTP /api/put. Input: the `json` column from
    * Formatters.opentsdbJson; a partition POSTs one JSON array (the
    * reference marshals the whole batch into one array the same way).
    * 204 → all stored; 400 → split by the response body's
    * {"failed":N,"success":M} exactly like opentsdb/client.go:130-141.
    */
  def opentsdbPut(json: DataFrame, baseUrl: String,
                  timeoutMs: Int = 30000): Dataset[WriteStats] = {
    val spark = json.sparkSession
    import spark.implicits._
    val putUrl = s"${baseUrl.stripSuffix("/")}/api/put"
    json.select(col("json")).as[String].mapPartitions { it =>
      val batch = it.toArray
      if (batch.isEmpty) Iterator.empty
      else Iterator.single(
        post(putUrl, batch.mkString("[", ",", "]"), "application/json",
          timeoutMs) match {
          case Right((204, _)) => WriteStats(batch.length.toLong, 0L, None)
          case Right((400, body)) =>
            val failed = jsonIntField(body, "failed").getOrElse(batch.length.toLong)
            val success = jsonIntField(body, "success").getOrElse(0L)
            WriteStats(success, failed,
              Some(s"failed to write $failed samples to OpenTSDB, $success succeeded"))
          case Right((code, body)) =>
            WriteStats(0L, batch.length.toLong, Some(s"http $code: ${body.take(200)}"))
          case Left(err) => WriteStats(0L, batch.length.toLong, Some(err))
        })
    }
  }

  /** S6: InfluxDB HTTP /write (line protocol, ms precision — the params
    * the reference's BatchPointsConfig sets, influxdb/client.go:103-107).
    */
  def influxPush(lines: DataFrame, baseUrl: String, database: String,
                 retentionPolicy: String = "", timeoutMs: Int = 30000): Dataset[WriteStats] = {
    val spark = lines.sparkSession
    import spark.implicits._
    val rp = if (retentionPolicy.isEmpty) "" else s"&rp=$retentionPolicy"
    val writeUrl = s"${baseUrl.stripSuffix("/")}/write?db=$database$rp&precision=ms"
    lines.select(col("line")).as[String].mapPartitions { it =>
      val batch = it.toArray
      if (batch.isEmpty) Iterator.empty
      else Iterator.single(
        post(writeUrl, batch.mkString("\n"), "text/plain; charset=utf-8",
          timeoutMs) match {
          case Right((204, _)) => WriteStats(batch.length.toLong, 0L, None)
          case Right((code, body)) =>
            WriteStats(0L, batch.length.toLong, Some(s"http $code: ${body.take(200)}"))
          case Left(err) => WriteStats(0L, batch.length.toLong, Some(err))
        })
    }
  }

  /** Prometheus remote-write FORWARDING sink: re-encode flat samples
    * as a v1 WriteRequest (proto + snappy) and POST them downstream —
    * the sink that lets one adapter chain into another (or into a real
    * Prometheus remote-write receiver). Input is the flatten shape
    * (name, labels map, value, timestampMs); each partition groups its
    * rows back into series, encodes ONE WriteRequest, and sends ONE
    * request with the remote-write headers — partition count = request
    * fan-out, exactly like the other HTTP sinks.
    */
  def remoteWritePush(samples: DataFrame, url: String,
                      timeoutMs: Int = 30000,
                      protocol: String = "v1"): Dataset[WriteStats] = {
    require(protocol == "v1" || protocol == "v2",
      s"remote-write protocol must be v1 or v2, got '$protocol'")
    val spark = samples.sparkSession
    import spark.implicits._
    samples.select(col("labels"), col("value"), col("timestampMs"))
      .as[(Map[String, String], Double, Long)]
      .mapPartitions { it =>
        val batch = it.toArray
        if (batch.isEmpty) Iterator.empty
        else Iterator.single(
          try {
            val series = batch.groupBy(_._1).toSeq
              .map { case (labels, rows) =>
                graft.codec.Prompb.PTimeSeries(
                  labels.toSeq.sortBy(_._1).map { case (k, v) =>
                    graft.codec.Prompb.PLabel(k, v) },
                  rows.sortBy(_._3).toSeq.map(r =>
                    graft.codec.Prompb.PSample(r._2, r._3)))
              }
            // v2 interns the partition's labels into one symbol table
            // (ref 0 = "", the spec's reserved empty string)
            val (wire, ctype, ver) =
              if (protocol == "v2") {
                val idx = scala.collection.mutable
                  .LinkedHashMap[String, Int]("" -> 0)
                def ref(x: String): Int = idx.getOrElseUpdate(x, idx.size)
                val tss = series.map(ts => graft.codec.Prompb2.P2TimeSeries(
                  ts.labels.flatMap(l => Seq(ref(l.name), ref(l.value))),
                  ts.samples))
                (graft.codec.Prompb.snappyCompress(
                  graft.codec.Prompb2.encodeRequest(
                    graft.codec.Prompb2.P2Request(idx.keys.toSeq, tss))),
                  "application/x-protobuf;proto=io.prometheus.write.v2.Request",
                  "2.0.0")
              } else
                (graft.codec.Prompb.snappyCompress(
                  graft.codec.Prompb.encodeWriteRequest(
                    graft.codec.Prompb.PWriteRequest(series))),
                  "application/x-protobuf", "0.1.0")
            postBytes(url, wire, ctype,
              Seq("Content-Encoding" -> "snappy",
                "X-Prometheus-Remote-Write-Version" -> ver),
              timeoutMs) match {
              case Right((code, _)) if code / 100 == 2 =>
                WriteStats(batch.length.toLong, 0L, None)
              case Right((code, body)) =>
                WriteStats(0L, batch.length.toLong,
                  Some(s"http $code: ${body.take(200)}"))
              case Left(err) => WriteStats(0L, batch.length.toLong, Some(err))
            }
          } catch {
            case e: IOException =>
              WriteStats(0L, batch.length.toLong, errMsg(e))
          })
      }
  }

  /** Reduce per-partition stats to the per-remote counter pair
    * (sent_samples_total / failed_samples_total, main.go:86-103). Runs as
    * one tiny Spark agg so the whole write is a single distributed action.
    */
  def totals(stats: Dataset[WriteStats]): WriteStats = {
    val row = stats.agg(
      coalesce(sum(col("sent")), lit(0L)).as("sent"),
      coalesce(sum(col("failed")), lit(0L)).as("failed"),
      max(col("error")).as("error")).head()
    WriteStats(row.getLong(0), row.getLong(1), Option(row.getString(2)))
  }

  // ---- executor-side plumbing (plain JDK, nothing to serialize) ----

  private def errMsg(e: Throwable): Option[String] =
    Some(Option(e.getMessage).getOrElse(e.getClass.getName))

  /** POST a body, return Right(status, responseBody) or Left(error).
    * `timeoutMs` is the caller's send timeout (≙ the reference's
    * --send-timeout flag, main.go:134) applied to the read; the connect
    * timeout stays a short fixed bound like the reference's dialer.
    * Non-positive timeouts fall back to the fixed bound (0 would mean
    * INFINITE to HttpURLConnection, negative would throw mid-task).
    */
  /** Binary-body POST with extra headers — the remote-write sink's
    * transport (proto + snappy payloads never round-trip through a
    * String). Same timeout discipline as [[post]].
    */
  private def postBytes(url: String, body: Array[Byte],
                        contentType: String,
                        headers: Seq[(String, String)],
                        timeoutMs: Int): Either[String, (Int, String)] =
    try {
      val conn = URI.create(url).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      try {
        val readTimeout = effectiveTimeoutMs(timeoutMs)
        conn.setConnectTimeout(math.min(ConnectTimeoutMs, readTimeout))
        conn.setReadTimeout(readTimeout)
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", contentType)
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        conn.setDoOutput(true)
        conn.setFixedLengthStreamingMode(body.length)
        conn.getOutputStream.write(body)
        conn.getOutputStream.close()
        val code = conn.getResponseCode
        val in = Option(if (code >= 400) conn.getErrorStream else conn.getInputStream)
        val resp = in.map(s => try new String(s.readAllBytes(), UTF_8) finally s.close())
          .getOrElse("")
        Right((code, resp))
      } finally conn.disconnect()
    } catch { case e: IOException => Left(errMsg(e).get) }

  private def post(url: String, body: String, contentType: String,
                   timeoutMs: Int): Either[String, (Int, String)] =
    try {
      val conn = URI.create(url).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      try {
        val readTimeout = effectiveTimeoutMs(timeoutMs)
        conn.setConnectTimeout(math.min(ConnectTimeoutMs, readTimeout))
        conn.setReadTimeout(readTimeout)
        conn.setRequestMethod("POST")
        conn.setRequestProperty("Content-Type", contentType)
        conn.setDoOutput(true)
        val bytes = body.getBytes(UTF_8)
        conn.setFixedLengthStreamingMode(bytes.length)
        conn.getOutputStream.write(bytes)
        conn.getOutputStream.close()
        val code = conn.getResponseCode
        val in = Option(if (code >= 400) conn.getErrorStream else conn.getInputStream)
        val resp = in.map(s => try new String(s.readAllBytes(), UTF_8) finally s.close())
          .getOrElse("")
        Right((code, resp))
      } finally conn.disconnect()
    } catch { case e: IOException => Left(errMsg(e).get) }

  /** Pull an integer field out of a flat JSON object — the only JSON the
    * transport ever reads is OpenTSDB's {"failed":N,"success":M} error
    * body, not worth a parser dependency.
    */
  private[graft] def jsonIntField(body: String, field: String): Option[Long] = {
    val m = java.util.regex.Pattern
      .compile("\"" + java.util.regex.Pattern.quote(field) + "\"\\s*:\\s*(-?\\d+)")
      .matcher(body)
    if (m.find()) Some(m.group(1).toLong) else None
  }
}
