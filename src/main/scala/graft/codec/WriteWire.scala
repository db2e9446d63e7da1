package graft.codec

/** ONE walk over a v1 `prompb.WriteRequest` decoding everything the
  * serve edge consumes: scalar samples (TimeSeries field 2), exemplars
  * (field 3), native histograms (field 4), and request-level metric
  * metadata (WriteRequest field 3). Replaces the former double parse of
  * every /write body (Prompb.decodeWriteRequest for scalars THEN
  * NativeHist.decodeWriteRequest over the same bytes for histograms) —
  * one pass, one allocation per decoded message.
  *
  * Wire layout (public prometheus/prompb/remote.proto + types.proto):
  *   WriteRequest { repeated TimeSeries timeseries = 1;
  *                  repeated MetricMetadata metadata = 3 }
  *   TimeSeries   { labels = 1; samples = 2; exemplars = 3;
  *                  histograms = 4 }
  *   Exemplar     { repeated Label labels = 1; double value = 2;
  *                  int64 timestamp = 3 }
  *   MetricMetadata { MetricType type = 1;
  *                    string metric_family_name = 2;
  *                    string help = 4; string unit = 5 }
  * (MetricType: UNKNOWN=0 COUNTER=1 GAUGE=2 HISTOGRAM=3 GAUGEHISTOGRAM=4
  *  SUMMARY=5 INFO=6 STATESET=7 — remote-write 2.0 shares the numbering.)
  *
  * The reference never sees exemplars or metadata — its vendored prompb
  * predates both (reference: main.go:377-394 walks labels+samples only);
  * this is modern-surface extension in the same spirit as the RW2/OTLP
  * edges.
  */
object WriteWire {

  /** One exemplar: its own label set (trace_id et al.), value, ts. */
  case class PExemplar(labels: Seq[Prompb.PLabel], value: Double,
                       timestampMs: Long)

  /** Exemplars grouped under the SERIES labels they arrived on. */
  case class PExemplarSeries(seriesLabels: Seq[Prompb.PLabel],
                             exemplars: Seq[PExemplar])

  /** Metric-family metadata, type already resolved to the API's
    * lowercase string form ("counter", "gauge", …).
    */
  case class PMetadata(familyName: String, metricType: String,
                       help: String, unit: String)

  /** MetricType enum → the /api/v1/metadata string form. */
  def typeName(t: Int): String = t match {
    case 1 => "counter"
    case 2 => "gauge"
    case 3 => "histogram"
    case 4 => "gaugehistogram"
    case 5 => "summary"
    case 6 => "info"
    case 7 => "stateset"
    case _ => "unknown"
  }

  /** Inverse of [[typeName]] (fixture encode). */
  def typeCode(s: String): Int = s match {
    case "counter" => 1
    case "gauge" => 2
    case "histogram" => 3
    case "gaugehistogram" => 4
    case "summary" => 5
    case "info" => 6
    case "stateset" => 7
    case _ => 0
  }

  case class DecodedWrite(scalars: Prompb.PWriteRequest,
                          histograms: Seq[NativeHist.PHistSeries],
                          exemplars: Seq[PExemplarSeries],
                          metadata: Seq[PMetadata])

  // ---------------------------------------------------------------- decode

  private def decLabel(buf: Array[Byte], s: Int, e: Int): Prompb.PLabel = {
    val r = new Prompb.Reader(buf, s, e)
    var n = ""; var v = ""
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) => n = r.utf8()
        case (2, 2) => v = r.utf8()
        case (_, w) => r.skip(w)
      }
    }
    Prompb.PLabel(n, v)
  }

  private def decExemplar(buf: Array[Byte], s: Int, e: Int): PExemplar = {
    val r = new Prompb.Reader(buf, s, e)
    val labels = Seq.newBuilder[Prompb.PLabel]
    var v = 0.0; var ts = 0L
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) =>
          val (a, b) = r.lenDelimited(); labels += decLabel(buf, a, b)
        case (2, 1) => v = java.lang.Double.longBitsToDouble(r.fixed64())
        case (3, 0) => ts = r.varint()
        case (_, w) => r.skip(w)
      }
    }
    PExemplar(labels.result(), v, ts)
  }

  private def decMetadata(buf: Array[Byte], s: Int, e: Int): PMetadata = {
    val r = new Prompb.Reader(buf, s, e)
    var t = 0; var name = ""; var help = ""; var unit = ""
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 0) => t = r.varint().toInt
        case (2, 2) => name = r.utf8()
        case (4, 2) => help = r.utf8()
        case (5, 2) => unit = r.utf8()
        case (_, w) => r.skip(w)
      }
    }
    PMetadata(name, typeName(t), help, unit)
  }

  private def decSample(buf: Array[Byte], s: Int, e: Int): Prompb.PSample = {
    val r = new Prompb.Reader(buf, s, e)
    var v = 0.0; var ts = 0L
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 1) => v = java.lang.Double.longBitsToDouble(r.fixed64())
        case (2, 0) => ts = r.varint()
        case (_, w) => r.skip(w)
      }
    }
    Prompb.PSample(v, ts)
  }

  /** The single-walk decode. Series with no samples contribute no scalar
    * entry (and likewise per facet) — empty facets cost nothing.
    */
  def decode(buf: Array[Byte]): DecodedWrite = {
    val r = new Prompb.Reader(buf, 0, buf.length)
    val scalars = Seq.newBuilder[Prompb.PTimeSeries]
    val hists = Seq.newBuilder[NativeHist.PHistSeries]
    val exemplars = Seq.newBuilder[PExemplarSeries]
    val meta = Seq.newBuilder[PMetadata]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) =>
          val (a, b) = r.lenDelimited()
          val tr = new Prompb.Reader(buf, a, b)
          val labels = Seq.newBuilder[Prompb.PLabel]
          val samples = Seq.newBuilder[Prompb.PSample]
          val hh = Seq.newBuilder[NativeHist.PHistogram]
          val ee = Seq.newBuilder[PExemplar]
          while (tr.hasMore) {
            val tk = tr.varint(); (tk >> 3, (tk & 7).toInt) match {
              case (1, 2) =>
                val (la, lb) = tr.lenDelimited()
                labels += decLabel(buf, la, lb)
              case (2, 2) =>
                val (sa, sb) = tr.lenDelimited()
                samples += decSample(buf, sa, sb)
              case (3, 2) =>
                val (ea, eb) = tr.lenDelimited()
                ee += decExemplar(buf, ea, eb)
              case (4, 2) =>
                val (ha, hb) = tr.lenDelimited()
                hh += NativeHist.decodeHistogram(buf, ha, hb)
              case (_, w) => tr.skip(w)
            }
          }
          val ls = labels.result()
          val ss = samples.result()
          val hs = hh.result()
          val es = ee.result()
          if (ss.nonEmpty) scalars += Prompb.PTimeSeries(ls, ss)
          if (hs.nonEmpty) hists += NativeHist.PHistSeries(ls, hs)
          if (es.nonEmpty) exemplars += PExemplarSeries(ls, es)
        case (3, 2) =>
          val (a, b) = r.lenDelimited(); meta += decMetadata(buf, a, b)
        case (_, w) => r.skip(w)
      }
    }
    DecodedWrite(Prompb.PWriteRequest(scalars.result()), hists.result(),
      exemplars.result(), meta.result())
  }

  // ---------------------------------------------------------------- encode
  // (fixture marshalling: a store RECEIVES exemplars/metadata; the
  // encoders exist so entries and specs can build real wire bytes)

  private def encLabel(l: Prompb.PLabel): Array[Byte] = {
    val w = new Prompb.Writer
    w.string(1, l.name); w.string(2, l.value)
    w.toBytes
  }

  def encodeExemplar(e: PExemplar): Array[Byte] = {
    val w = new Prompb.Writer
    e.labels.foreach(l => w.message(1, encLabel(l)))
    w.double(2, e.value)
    w.int64(3, e.timestampMs)
    w.toBytes
  }

  def encodeMetadata(m: PMetadata): Array[Byte] = {
    val w = new Prompb.Writer
    w.int64(1, typeCode(m.metricType).toLong)
    w.string(2, m.familyName)
    w.string(4, m.help)
    w.string(5, m.unit)
    w.toBytes
  }

  /** A full v1 WriteRequest with per-series samples AND exemplars, plus
    * request-level metadata — the payload a Prometheus server sends with
    * `send_exemplars: true` and metadata forwarding on.
    */
  def encodeWriteRequest(
      series: Seq[(Seq[Prompb.PLabel], Seq[Prompb.PSample], Seq[PExemplar])],
      metadata: Seq[PMetadata] = Nil): Array[Byte] = {
    val w = new Prompb.Writer
    series.foreach { case (labels, samples, exemplars) =>
      val tsw = new Prompb.Writer
      labels.foreach(l => tsw.message(1, encLabel(l)))
      samples.foreach { s =>
        val sw = new Prompb.Writer
        sw.double(1, s.value); sw.int64(2, s.timestampMs)
        tsw.message(2, sw.toBytes)
      }
      exemplars.foreach(e => tsw.message(3, encodeExemplar(e)))
      w.message(1, tsw.toBytes)
    }
    metadata.foreach(m => w.message(3, encodeMetadata(m)))
    w.toBytes
  }
}
