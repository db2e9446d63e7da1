package graft.codec

import graft.codec.Prompb.{PLabel, PSample, PTimeSeries, PWriteRequest}

/** Minimal OTLP metrics ingest — `opentelemetry.proto.collector.metrics
  * .v1.ExportMetricsServiceRequest` (the OTLP/HTTP protobuf body), the
  * OTHER wire protocol production fleets feed a metrics store with. The
  * decoder covers what a Prometheus-shaped store can represent losslessly:
  * Gauge and Sum metrics with NumberDataPoints (double or int values),
  * data-point attributes and resource attributes flattened into labels
  * (point attributes win on key collision, the OTel→Prom mapping rule),
  * metric name as `__name__`. Histogram/Summary/ExponentialHistogram
  * metrics and non-scalar attribute values are SKIPPED structurally —
  * the store's canonical row is a scalar sample; a deployment wanting
  * OTel histograms maps them to `_bucket` counter series upstream
  * (exactly the shape [[graft.operators.TimeSeriesOps.histogramQuantile]]
  * then reads).
  *
  * Field layout (trimmed to the decoded subset):
  *   ExportMetricsServiceRequest { repeated ResourceMetrics = 1 }
  *   ResourceMetrics { Resource resource = 1; repeated ScopeMetrics = 2 }
  *   Resource { repeated KeyValue attributes = 1 }
  *   ScopeMetrics { repeated Metric metrics = 2 }
  *   Metric { string name = 1; Gauge gauge = 5; Sum sum = 7 }
  *   Gauge/Sum { repeated NumberDataPoint data_points = 1 }
  *   NumberDataPoint { fixed64 time_unix_nano = 3; double as_double = 4;
  *                     sfixed64 as_int = 6; repeated KeyValue attrs = 7 }
  *   KeyValue { string key = 1; AnyValue value = 2 }
  *   AnyValue { string = 1 | bool = 2 | int = 3 | double = 4 } (scalars)
  *
  * Timestamps narrow from nanos to the engine's milliseconds (floor
  * division — OTLP nano precision below the ms is sub-scrape noise).
  * The output is the canonical [[Prompb.PWriteRequest]] shape, so OTLP
  * is a third interchangeable edge beside remote-write v1/v2.
  */
object Otlp {

  // ---------------------------------------------------------------- decode

  private def decAnyValue(buf: Array[Byte], s: Int, e: Int): Option[String] = {
    val r = new Prompb.Reader(buf, s, e)
    var out: Option[String] = None
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) => out = Some(r.utf8())
        case (2, 0) => out = Some(if (r.varint() != 0) "true" else "false")
        case (3, 0) => out = Some(String.valueOf(r.varint())) // int64: plain varint
        case (4, 1) => out = Some(String.valueOf(
          java.lang.Double.longBitsToDouble(r.fixed64())))
        case (_, w) => r.skip(w) // arrays/kvlists/bytes: not label-shaped
      }
    }
    out
  }

  private def decKeyValue(buf: Array[Byte], s: Int,
                          e: Int): Option[(String, String)] = {
    val r = new Prompb.Reader(buf, s, e)
    var key = ""; var value: Option[String] = None
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) => key = r.utf8()
        case (2, 2) =>
          val (a, b) = r.lenDelimited(); value = decAnyValue(buf, a, b)
        case (_, w) => r.skip(w)
      }
    }
    value.map(key -> _)
  }

  private case class Point(tsNano: Long, value: Double,
                           attrs: Seq[(String, String)])

  private def decPoint(buf: Array[Byte], s: Int, e: Int): Point = {
    val r = new Prompb.Reader(buf, s, e)
    var ts = 0L; var v = 0.0
    val attrs = Seq.newBuilder[(String, String)]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (3, 1) => ts = r.fixed64()
        case (4, 1) => v = java.lang.Double.longBitsToDouble(r.fixed64())
        case (6, 1) => v = r.fixed64().toDouble // sfixed64 as_int
        case (7, 2) =>
          val (a, b) = r.lenDelimited()
          decKeyValue(buf, a, b).foreach(attrs += _)
        case (_, w) => r.skip(w)
      }
    }
    Point(ts, v, attrs.result())
  }

  private def decPoints(buf: Array[Byte], s: Int, e: Int): Seq[Point] = {
    val r = new Prompb.Reader(buf, s, e)
    val pts = Seq.newBuilder[Point]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) => val (a, b) = r.lenDelimited(); pts += decPoint(buf, a, b)
        case (_, w) => r.skip(w)
      }
    }
    pts.result()
  }

  private def decMetric(buf: Array[Byte], s: Int, e: Int,
                        resourceAttrs: Seq[(String, String)])
      : Seq[PTimeSeries] = {
    val r = new Prompb.Reader(buf, s, e)
    var name = ""
    val pts = Seq.newBuilder[Point]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) => name = r.utf8()
        case (5, 2) | (7, 2) => // gauge | sum
          val (a, b) = r.lenDelimited(); pts ++= decPoints(buf, a, b)
        case (_, w) => r.skip(w) // histogram/summary/exp-histogram skipped
      }
    }
    pts.result().map { p =>
      // point attrs win over resource attrs on collision (OTel→Prom rule)
      val labels = (resourceAttrs.toMap ++ p.attrs.toMap) +
        ("__name__" -> name)
      PTimeSeries(
        labels.toSeq.sortBy(_._1).map { case (k, v) => PLabel(k, v) },
        Seq(PSample(p.value, Math.floorDiv(p.tsNano, 1000000L))))
    }
  }

  private def decScopeMetrics(buf: Array[Byte], s: Int, e: Int,
                              resourceAttrs: Seq[(String, String)])
      : Seq[PTimeSeries] = {
    val r = new Prompb.Reader(buf, s, e)
    val out = Seq.newBuilder[PTimeSeries]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (2, 2) =>
          val (a, b) = r.lenDelimited()
          out ++= decMetric(buf, a, b, resourceAttrs)
        case (_, w) => r.skip(w)
      }
    }
    out.result()
  }

  private def decResource(buf: Array[Byte], s: Int,
                          e: Int): Seq[(String, String)] = {
    val r = new Prompb.Reader(buf, s, e)
    val attrs = Seq.newBuilder[(String, String)]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) =>
          val (a, b) = r.lenDelimited()
          decKeyValue(buf, a, b).foreach(attrs += _)
        case (_, w) => r.skip(w)
      }
    }
    attrs.result()
  }

  private def decResourceMetrics(buf: Array[Byte], s: Int,
                                 e: Int): Seq[PTimeSeries] = {
    val r = new Prompb.Reader(buf, s, e)
    var resourceAttrs = Seq.empty[(String, String)]
    val scopes = Seq.newBuilder[(Int, Int)]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) =>
          val (a, b) = r.lenDelimited(); resourceAttrs = decResource(buf, a, b)
        case (2, 2) => scopes += r.lenDelimited()
        case (_, w) => r.skip(w)
      }
    }
    // resource may arrive after scope_metrics in the stream: resolve last
    scopes.result().flatMap { case (a, b) =>
      decScopeMetrics(buf, a, b, resourceAttrs)
    }
  }

  /** ExportMetricsServiceRequest bytes → canonical write request. */
  def decodeToV1(buf: Array[Byte]): PWriteRequest = {
    val r = new Prompb.Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[PTimeSeries]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) =>
          val (a, b) = r.lenDelimited(); out ++= decResourceMetrics(buf, a, b)
        case (_, w) => r.skip(w)
      }
    }
    PWriteRequest(out.result())
  }

  // ---------------------------------------------------------------- encode
  // (test/fixture marshalling — a store is an OTLP RECEIVER; the encoder
  // exists so round-trip entries can build real wire bytes)

  private def encKeyValue(k: String, v: String): Array[Byte] = {
    val any = new Prompb.Writer
    any.string(1, v)
    val w = new Prompb.Writer
    w.string(1, k); w.message(2, any.toBytes)
    w.toBytes
  }

  private def encPoint(tsNano: Long, value: Double,
                       attrs: Seq[(String, String)]): Array[Byte] = {
    val w = new Prompb.Writer
    w.fixed64(3, tsNano)
    w.double(4, value)
    attrs.foreach { case (k, v) => w.message(7, encKeyValue(k, v)) }
    w.toBytes
  }

  /** One request: a single resource (with `resourceAttrs`) carrying one
    * gauge metric per (name, attrs) group of `points`.
    */
  def encodeGaugeRequest(resourceAttrs: Seq[(String, String)],
                         points: Seq[(String, Seq[(String, String)], Long, Double)])
      : Array[Byte] = {
    val metrics = points.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (name, pts) =>
        val gauge = new Prompb.Writer
        pts.foreach { case (_, attrs, tsNano, v) =>
          gauge.message(1, encPoint(tsNano, v, attrs))
        }
        val m = new Prompb.Writer
        m.string(1, name)
        m.message(5, gauge.toBytes)
        m.toBytes
    }
    val scope = new Prompb.Writer
    metrics.foreach(m => scope.message(2, m))
    val resource = new Prompb.Writer
    resourceAttrs.foreach { case (k, v) =>
      resource.message(1, encKeyValue(k, v))
    }
    val rm = new Prompb.Writer
    rm.message(1, resource.toBytes)
    rm.message(2, scope.toBytes)
    val req = new Prompb.Writer
    req.message(1, rm.toBytes)
    req.toBytes
  }
}
