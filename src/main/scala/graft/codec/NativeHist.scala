package graft.codec

/** Prometheus NATIVE HISTOGRAM wire codec — the `prompb.Histogram`
  * message carried in `TimeSeries.histograms` (v1 field 4 — field 3 is
  * exemplars; remote-write 2.0 moved histograms to field 3), the
  * sparse-exponential-bucket representation remote-write 1.0 (feature
  * flag) and 2.0 both ship. The reference predates native histograms
  * entirely (its prompb vendored copy has only labels+samples,
  * reference: main.go:377-394), so this is modern-surface extension in
  * the same spirit as the OTLP and remote-write-2.0 edges.
  *
  * Wire layout (public prometheus/prompb/types.proto, Histogram):
  *   1  count_int       uint64 varint   (oneof count)
  *   3  sum             double
  *   4  schema          sint32 zigzag   (bucket width = 2^(2^-schema))
  *   5  zero_threshold  double
  *   6  zero_count_int  uint64 varint   (oneof zero_count)
  *   8  negative_spans  repeated BucketSpan
  *   9  negative_deltas repeated sint64, packed zigzag
  *   11 positive_spans  repeated BucketSpan
  *   12 positive_deltas repeated sint64, packed zigzag
  *   15 timestamp       int64 ms
  * (float-histogram fields 2/7/10/13 and reset_hint 14 are skipped
  * structurally on decode — integer histograms are what SDK exporters
  * emit; a float histogram decodes as empty and is dropped upstream.)
  *
  * BucketSpan: 1 offset sint32 zigzag, 2 length uint32. Span decode
  * walks an absolute index: `idx += span.offset` then `length`
  * consecutive buckets, `idx` advancing past them — the first span's
  * offset is therefore the absolute index of the first bucket. Bucket
  * counts are DELTA-encoded: each value is the difference from the
  * previous bucket's count (first delta = first count), zigzag sint64.
  */
object NativeHist {

  case class BucketSpan(offset: Int, length: Int)

  /** One native histogram sample (integer form). `customValues`
    * (wire field 16, packed doubles) is non-empty exactly for NHCB —
    * native histograms with CUSTOM BUCKETS, schema −53: bucket idx i
    * covers (customValues(i−1), customValues(i)] with the literal
    * upper bounds replacing the exponential 2^(idx·2^−schema) grid
    * (how Prometheus 3.x carries a scraped CLASSIC histogram in native
    * form); an idx == customValues.length bucket is the +Inf overflow.
    */
  case class PHistogram(count: Long, sum: Double, schema: Int,
                        zeroThreshold: Double, zeroCount: Long,
                        positiveSpans: Seq[BucketSpan],
                        positiveDeltas: Seq[Long],
                        negativeSpans: Seq[BucketSpan],
                        negativeDeltas: Seq[Long],
                        timestampMs: Long,
                        customValues: Seq[Double] = Nil)

  /** The NHCB schema marker (prometheus/model/histogram). */
  val CustomBucketsSchema: Int = -53

  /** One series of native-histogram samples. */
  case class PHistSeries(labels: Seq[Prompb.PLabel],
                         histograms: Seq[PHistogram])

  /** Expand spans+deltas to sparse (absolute bucket index, count). */
  def expandBuckets(spans: Seq[BucketSpan],
                    deltas: Seq[Long]): Seq[(Int, Long)] = {
    require(spans.map(_.length.toLong).sum == deltas.length,
      "span lengths must cover exactly the delta list")
    val out = Seq.newBuilder[(Int, Long)]
    var idx = 0
    var count = 0L
    var d = 0
    spans.foreach { sp =>
      idx += sp.offset
      var i = 0
      while (i < sp.length) {
        count += deltas(d)
        require(count >= 0, s"negative bucket count at index $idx")
        out += ((idx, count))
        idx += 1; d += 1; i += 1
      }
    }
    out.result()
  }

  /** Inverse of [[expandBuckets]]: sparse sorted (index, count) pairs →
    * spans + deltas. Every gap starts a new span (valid wire form;
    * Prometheus additionally merges small gaps as a size optimization —
    * a decoder cannot tell the difference).
    */
  def toSpans(buckets: Seq[(Int, Long)])
      : (Seq[BucketSpan], Seq[Long]) = {
    require(buckets.map(_._1) == buckets.map(_._1).sorted.distinct,
      "bucket indexes must be strictly increasing")
    val spans = Seq.newBuilder[BucketSpan]
    val deltas = Seq.newBuilder[Long]
    var prevIdx = 0 // decode walks from 0
    var prevCount = 0L
    var spanStart = -1
    var spanLen = 0
    def flush(): Unit =
      if (spanLen > 0) { spans += BucketSpan(spanStart, spanLen) }
    buckets.foreach { case (idx, cnt) =>
      if (spanLen > 0 && idx == prevIdx + 1) spanLen += 1
      else {
        flush()
        spanStart = idx - (if (spanLen > 0) prevIdx + 1 else prevIdx)
        spanLen = 1
      }
      deltas += cnt - prevCount
      prevCount = cnt
      prevIdx = idx
    }
    flush()
    (spans.result(), deltas.result())
  }

  /** CLASSIC VIEW of a native-histogram series — the le-bucket series
    * set the scalar store can hold (what Prometheus itself exposes when
    * a classic-only consumer reads a native histogram): per histogram
    * sample, cumulative `<name>_bucket{le=…}` counters over the
    * populated buckets' upper bounds (zero-bucket count included in
    * every cumulative), `le="+Inf"` = total count, plus `<name>_count`
    * / `<name>_sum` companions. Bucket idx's upper VALUE bound is
    * base^idx with base = 2^(2^-schema); the label prints it quantized
    * to the store's 1e-6 grid with minimal decimals — schema 0 takes a
    * pure-integer path (no doubles anywhere), so oracles reproduce the
    * strings exactly; other schemas quantize one pow() (sub-grid ulp
    * possible, spec-tested engine-side).
    */
  def toClassicSeries(hs: PHistSeries): Seq[Prompb.PTimeSeries] = {
    val name = hs.labels.find(_.name == Schema_MetricName).map(_.value)
      .getOrElse("")
    val rest = hs.labels.filterNot(_.name == Schema_MetricName)
    def mk(metric: String, extra: Seq[Prompb.PLabel], v: Double,
           tsMs: Long): Prompb.PTimeSeries =
      Prompb.PTimeSeries(
        ((rest ++ extra) :+ Prompb.PLabel(Schema_MetricName, metric))
          .sortBy(l => (l.name, l.value)),
        Seq(Prompb.PSample(v, tsMs)))
    hs.histograms.flatMap { h =>
      var cum = h.zeroCount
      val buckets = expandBuckets(h.positiveSpans, h.positiveDeltas)
        .flatMap { case (idx, cnt) =>
          cum += cnt
          // NHCB: literal custom bounds; the idx == customValues.length
          // overflow bucket is +Inf — it contributes to the cumulative
          // (and to the +Inf/total series below) but emits no own le
          if (h.schema == CustomBucketsSchema &&
              idx >= h.customValues.length) None
          else Some(mk(name + "_bucket",
            Seq(Prompb.PLabel("le",
              if (h.schema == CustomBucketsSchema)
                fpLabel(Math.round(h.customValues(idx) * 1000000.0))
              else boundLabel(idx, h.schema))),
            cum.toDouble, h.timestampMs))
        }
      buckets ++ Seq(
        mk(name + "_bucket", Seq(Prompb.PLabel("le", "+Inf")),
          h.count.toDouble, h.timestampMs),
        mk(name + "_count", Nil, h.count.toDouble, h.timestampMs),
        mk(name + "_sum", Nil, h.sum, h.timestampMs))
    }
  }

  private val Schema_MetricName = "__name__"

  /** Upper value bound of bucket `idx`, printed on the 1e-6 grid with
    * trailing zeros trimmed. Schema 0 (base 2) computes the fixed-point
    * bound as exact integer arithmetic.
    */
  def boundLabel(idx: Int, schema: Int): String = {
    val fp: Long =
      if (schema == 0 && idx >= 0 && idx <= 42) (1L << idx) * 1000000L
      else Math.round(
        math.pow(2.0, idx * math.pow(2.0, -schema)) * 1000000.0)
    fpLabel(fp)
  }

  /** A 1e-6 fixed-point value printed with minimal decimals. */
  def fpLabel(fp: Long): String = {
    val i = fp / 1000000L
    val f = fp % 1000000L
    if (f == 0L) i.toString
    else i.toString + "." +
      f"$f%06d".reverse.dropWhile(_ == '0').reverse
  }

  // ------------------------------------------------------------- encode

  private def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  private def encSpan(sp: BucketSpan): Array[Byte] = {
    val w = new Prompb.Writer
    if (sp.offset != 0) { w.key(1, 0); w.varint(zigzag(sp.offset.toLong)) }
    w.int64(2, sp.length.toLong)
    w.toBytes
  }

  private def encPacked(deltas: Seq[Long]): Array[Byte] = {
    val w = new Prompb.Writer
    deltas.foreach(d => w.varint(zigzag(d)))
    w.toBytes
  }

  def encodeHistogram(h: PHistogram): Array[Byte] = {
    val w = new Prompb.Writer
    w.int64(1, h.count)
    w.double(3, h.sum)
    if (h.schema != 0) { w.key(4, 0); w.varint(zigzag(h.schema.toLong)) }
    if (h.zeroThreshold != 0.0) w.double(5, h.zeroThreshold)
    w.int64(6, h.zeroCount)
    h.negativeSpans.foreach(sp => w.message(8, encSpan(sp)))
    if (h.negativeDeltas.nonEmpty) w.bytes(9, encPacked(h.negativeDeltas))
    h.positiveSpans.foreach(sp => w.message(11, encSpan(sp)))
    if (h.positiveDeltas.nonEmpty) w.bytes(12, encPacked(h.positiveDeltas))
    w.int64(15, h.timestampMs)
    // NHCB custom bounds: repeated double, packed (field 16)
    if (h.customValues.nonEmpty) {
      val cw = new Prompb.Writer
      h.customValues.foreach(v =>
        cw.rawFixed64(java.lang.Double.doubleToRawLongBits(v)))
      w.bytes(16, cw.toBytes)
    }
    w.toBytes
  }

  /** A WriteRequest whose series carry native histograms (v1 field 4)
    * — labels in field 1 exactly as the scalar path writes them.
    */
  def encodeWriteRequest(series: Seq[PHistSeries]): Array[Byte] = {
    val w = new Prompb.Writer
    series.foreach { s =>
      val tsw = new Prompb.Writer
      s.labels.foreach { l =>
        val lw = new Prompb.Writer
        lw.string(1, l.name); lw.string(2, l.value)
        tsw.message(1, lw.toBytes)
      }
      s.histograms.foreach(h => tsw.message(4, encodeHistogram(h)))
      w.message(1, tsw.toBytes)
    }
    w.toBytes
  }

  // ------------------------------------------------------------- decode

  private def decSpan(buf: Array[Byte], s: Int, e: Int): BucketSpan = {
    val r = new Prompb.Reader(buf, s, e)
    var offset = 0
    var length = 0
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 0) => offset = unzigzag(r.varint()).toInt
        case (2, 0) => length = r.varint().toInt
        case (_, w) => r.skip(w)
      }
    }
    BucketSpan(offset, length)
  }

  private def decPacked(buf: Array[Byte], s: Int, e: Int): Seq[Long] = {
    val r = new Prompb.Reader(buf, s, e)
    val out = Seq.newBuilder[Long]
    while (r.hasMore) out += unzigzag(r.varint())
    out.result()
  }

  def decodeHistogram(buf: Array[Byte], s: Int, e: Int): PHistogram = {
    val r = new Prompb.Reader(buf, s, e)
    var count = 0L; var sum = 0.0; var schema = 0
    var zeroThreshold = 0.0; var zeroCount = 0L; var ts = 0L
    val pSpans = Seq.newBuilder[BucketSpan]
    val nSpans = Seq.newBuilder[BucketSpan]
    var pDeltas: Seq[Long] = Nil
    var nDeltas: Seq[Long] = Nil
    val customValues = Seq.newBuilder[Double]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 0) => count = r.varint()
        case (3, 1) => sum = java.lang.Double.longBitsToDouble(r.fixed64())
        case (4, 0) => schema = unzigzag(r.varint()).toInt
        case (5, 1) =>
          zeroThreshold = java.lang.Double.longBitsToDouble(r.fixed64())
        case (6, 0) => zeroCount = r.varint()
        case (8, 2) => val (a, b) = r.lenDelimited(); nSpans += decSpan(buf, a, b)
        case (9, 2) => val (a, b) = r.lenDelimited(); nDeltas = decPacked(buf, a, b)
        case (11, 2) => val (a, b) = r.lenDelimited(); pSpans += decSpan(buf, a, b)
        case (12, 2) => val (a, b) = r.lenDelimited(); pDeltas = decPacked(buf, a, b)
        case (15, 0) => ts = r.varint()
        case (16, 2) => // NHCB custom bounds, packed doubles
          val (a, b) = r.lenDelimited()
          val pr = new Prompb.Reader(buf, a, b)
          while (pr.hasMore)
            customValues += java.lang.Double.longBitsToDouble(pr.fixed64())
        case (16, 1) =>
          customValues += java.lang.Double.longBitsToDouble(r.fixed64())
        case (_, w) => r.skip(w) // float-hist fields, reset_hint
      }
    }
    PHistogram(count, sum, schema, zeroThreshold, zeroCount,
      pSpans.result(), pDeltas, nSpans.result(), nDeltas, ts,
      customValues.result())
  }

  /** Decode a WriteRequest's native-histogram series (labels + field-3
    * histograms). Scalar samples in the same payload are untouched —
    * the caller routes them through the existing decode.
    */
  def decodeWriteRequest(buf: Array[Byte]): Seq[PHistSeries] = {
    val r = new Prompb.Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[PHistSeries]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) =>
          val (a, b) = r.lenDelimited()
          val tr = new Prompb.Reader(buf, a, b)
          val labels = Seq.newBuilder[Prompb.PLabel]
          val hists = Seq.newBuilder[PHistogram]
          while (tr.hasMore) {
            val tk = tr.varint(); (tk >> 3, (tk & 7).toInt) match {
              case (1, 2) =>
                val (la, lb) = tr.lenDelimited()
                val lr = new Prompb.Reader(buf, la, lb)
                var n = ""; var v = ""
                while (lr.hasMore) {
                  val lk = lr.varint(); (lk >> 3, (lk & 7).toInt) match {
                    case (1, 2) => n = lr.utf8()
                    case (2, 2) => v = lr.utf8()
                    case (_, w) => lr.skip(w)
                  }
                }
                labels += Prompb.PLabel(n, v)
              case (4, 2) =>
                val (ha, hb) = tr.lenDelimited()
                hists += decodeHistogram(buf, ha, hb)
              // field 3 = exemplars: structurally skipped — decoding
              // one as a histogram would fabricate junk empty series
              case (_, w) => tr.skip(w)
            }
          }
          val hs = hists.result()
          if (hs.nonEmpty) out += PHistSeries(labels.result(), hs)
        case (_, w) => r.skip(w)
      }
    }
    out.result()
  }
}
