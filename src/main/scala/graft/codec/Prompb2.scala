package graft.codec

import graft.codec.Prompb.{PLabel, PSample, PTimeSeries, PWriteRequest}

/** Prometheus Remote-Write 2.0 wire codec — `io.prometheus.write.v2
  * .Request`, the protocol Prometheus 3.x senders speak (spec:
  * prometheus.io/docs/specs/remote_write_spec_2_0): a request-level
  * SYMBOL TABLE of interned strings, and per-series label REF PAIRS
  * (name_ref, value_ref) indexing into it — the dedup that makes
  * high-cardinality payloads ~2-4x smaller on the wire than v1's
  * repeated full strings.
  *
  * Field layout (v2 Request):
  *   4: repeated string symbols    — symbols[0] MUST be ""
  *   5: repeated TimeSeries
  * TimeSeries:
  *   1: repeated uint32 labels_refs (packed) — even count, pairwise
  *   2: repeated Sample (value=1 double, timestamp=2 int64 — v1 shape)
  *   3: repeated Histogram (native histograms — decoded, see below)
  *   4: repeated Exemplar (labels_refs=1 packed, value=2, timestamp=3)
  *   5: Metadata (type=1, help_ref=3, unit_ref=4)
  *   6: created_timestamp
  * created_timestamp decodes into [[P2TimeSeries.createdTimestampMs]];
  * with the receiver's opt-in CT-zero ingestion ([[ctZeroSeries]]) a
  * young counter gets a synthetic 0 sample at its creation instant, so
  * rate()/increase() count the ramp from zero instead of losing the
  * first interval (Prometheus 3.x's created-timestamp-zero-ingestion
  * feature). Exemplars and metadata resolve through [[exemplarsToV1]]
  * / [[metadataToV1]] for the serve edge's exemplar store and
  * /api/v1/metadata.
  *
  * The decoded request resolves to the SAME canonical v1 shape
  * ([[Prompb.PWriteRequest]]) so everything downstream — flatten, F1
  * filter, relabeling, partitioned append — is protocol-agnostic: v2 is
  * an edge codec, not a second pipeline.
  *
  * Reference anchor: the v1 ingest edge this extends is
  * reference main.go:286-320 (decode) + main.go:377-394 (flatten).
  */
object Prompb2 {

  /** RW2 exemplar: label REF pairs into the symbol table (unlike v1's
    * inline strings), value, timestamp.
    */
  case class P2Exemplar(labelsRefs: Seq[Int], value: Double,
                        timestampMs: Long)

  /** RW2 per-series metadata: type enum (shared numbering with v1) and
    * help/unit as symbol refs.
    */
  case class P2Metadata(metricType: Int, helpRef: Int, unitRef: Int)

  case class P2TimeSeries(labelsRefs: Seq[Int], samples: Seq[PSample],
                          histograms: Seq[NativeHist.PHistogram] = Nil,
                          exemplars: Seq[P2Exemplar] = Nil,
                          metadata: Option[P2Metadata] = None,
                          createdTimestampMs: Long = 0L)
  case class P2Request(symbols: Seq[String], timeseries: Seq[P2TimeSeries])

  // --------------------------------------------------------------- write

  private def encSample(s: PSample): Array[Byte] = {
    val w = new Prompb.Writer
    w.double(1, s.value); w.int64(2, s.timestampMs)
    w.toBytes
  }

  private def packedRefs(refs: Seq[Int]): Array[Byte] = {
    val packed = new Prompb.Writer
    refs.foreach(r => packed.varint(r.toLong))
    packed.toBytes
  }

  private def encExemplar(e: P2Exemplar): Array[Byte] = {
    val w = new Prompb.Writer
    w.bytes(1, packedRefs(e.labelsRefs))
    w.double(2, e.value)
    w.int64(3, e.timestampMs)
    w.toBytes
  }

  private def encMetadata(m: P2Metadata): Array[Byte] = {
    val w = new Prompb.Writer
    w.int64(1, m.metricType.toLong)
    w.int64(3, m.helpRef.toLong)
    w.int64(4, m.unitRef.toLong)
    w.toBytes
  }

  private def encTimeSeries(ts: P2TimeSeries): Array[Byte] = {
    val w = new Prompb.Writer
    // packed uint32 refs: one length-delimited field of varints
    w.bytes(1, packedRefs(ts.labelsRefs))
    ts.samples.foreach(s => w.message(2, encSample(s)))
    ts.histograms.foreach(h => w.message(3, NativeHist.encodeHistogram(h)))
    ts.exemplars.foreach(e => w.message(4, encExemplar(e)))
    ts.metadata.foreach(m => w.message(5, encMetadata(m)))
    if (ts.createdTimestampMs > 0L) w.int64(6, ts.createdTimestampMs)
    w.toBytes
  }

  def encodeRequest(r: P2Request): Array[Byte] = {
    val w = new Prompb.Writer
    // REPEATED strings always emit — the proto3 default-value skip only
    // applies to singular fields, and symbols[0] is the empty string by
    // spec (Writer.string would silently drop it)
    r.symbols.foreach(s => w.bytes(4, s.getBytes("UTF-8")))
    r.timeseries.foreach(ts => w.message(5, encTimeSeries(ts)))
    w.toBytes
  }

  /** Build a v2 request from the canonical v1 shape, interning every
    * distinct label name/value once (first occurrence order after the
    * mandatory leading "").
    */
  def fromV1(r: PWriteRequest): P2Request = {
    val idx = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def ref(s: String): Int = idx.getOrElseUpdate(s, idx.size)
    val tss = r.timeseries.map { ts =>
      P2TimeSeries(
        ts.labels.flatMap(l => Seq(ref(l.name), ref(l.value))),
        ts.samples)
    }
    P2Request(idx.keys.toSeq, tss)
  }

  // ---------------------------------------------------------------- read

  private def decSample(buf: Array[Byte], s: Int, e: Int): PSample = {
    val r = new Prompb.Reader(buf, s, e)
    var v = 0.0; var ts = 0L
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 1) => v = java.lang.Double.longBitsToDouble(r.fixed64())
        case (2, 0) => ts = r.varint()
        case (_, w) => r.skip(w)
      }
    }
    PSample(v, ts)
  }

  private def decPackedRefs(buf: Array[Byte], s: Int, e: Int): Seq[Int] = {
    val pr = new Prompb.Reader(buf, s, e)
    val refs = Seq.newBuilder[Int]
    while (pr.hasMore) refs += pr.varint().toInt
    refs.result()
  }

  private def decExemplar(buf: Array[Byte], s: Int, e: Int): P2Exemplar = {
    val r = new Prompb.Reader(buf, s, e)
    val refs = Seq.newBuilder[Int]
    var v = 0.0; var ts = 0L
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) =>
          val (a, b) = r.lenDelimited(); refs ++= decPackedRefs(buf, a, b)
        case (1, 0) => refs += r.varint().toInt
        case (2, 1) => v = java.lang.Double.longBitsToDouble(r.fixed64())
        case (3, 0) => ts = r.varint()
        case (_, w) => r.skip(w)
      }
    }
    P2Exemplar(refs.result(), v, ts)
  }

  private def decMetadata(buf: Array[Byte], s: Int, e: Int): P2Metadata = {
    val r = new Prompb.Reader(buf, s, e)
    var t = 0; var help = 0; var unit = 0
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 0) => t = r.varint().toInt
        case (3, 0) => help = r.varint().toInt
        case (4, 0) => unit = r.varint().toInt
        case (_, w) => r.skip(w)
      }
    }
    P2Metadata(t, help, unit)
  }

  private def decTimeSeries(buf: Array[Byte], s: Int, e: Int): P2TimeSeries = {
    val r = new Prompb.Reader(buf, s, e)
    val refs = Seq.newBuilder[Int]
    val samples = Seq.newBuilder[PSample]
    val hists = Seq.newBuilder[NativeHist.PHistogram]
    val exemplars = Seq.newBuilder[P2Exemplar]
    var metadata: Option[P2Metadata] = None
    var createdTs = 0L
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) => // packed
          val (a, b) = r.lenDelimited()
          refs ++= decPackedRefs(buf, a, b)
        case (1, 0) => // tolerated unpacked spelling
          refs += r.varint().toInt
        case (2, 2) =>
          val (a, b) = r.lenDelimited(); samples += decSample(buf, a, b)
        case (3, 2) => // native histograms — same message as v1
          val (a, b) = r.lenDelimited()
          hists += NativeHist.decodeHistogram(buf, a, b)
        case (4, 2) =>
          val (a, b) = r.lenDelimited(); exemplars += decExemplar(buf, a, b)
        case (5, 2) =>
          val (a, b) = r.lenDelimited(); metadata = Some(decMetadata(buf, a, b))
        case (6, 0) => createdTs = r.varint()
        case (_, w) => r.skip(w)
      }
    }
    P2TimeSeries(refs.result(), samples.result(), hists.result(),
      exemplars.result(), metadata, createdTs)
  }

  def decodeRequest(buf: Array[Byte]): P2Request = {
    val r = new Prompb.Reader(buf, 0, buf.length)
    val symbols = Seq.newBuilder[String]
    val tss = Seq.newBuilder[P2TimeSeries]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (4, 2) => symbols += r.utf8()
        case (5, 2) =>
          val (a, b) = r.lenDelimited(); tss += decTimeSeries(buf, a, b)
        case (_, w) => r.skip(w)
      }
    }
    P2Request(symbols.result(), tss.result())
  }

  /** Resolve a v2 request's symbol refs into the canonical v1 shape.
    * Enforces the spec's structural rules — symbols[0] = "", even ref
    * count, refs in range — loudly: a malformed payload fails ITS
    * request (the per-payload decode-failure isolation the streaming
    * ingest already provides), never silently mislabels samples.
    */
  def toV1(r: P2Request): PWriteRequest = {
    val syms = r.symbols.toIndexedSeq
    require(syms.nonEmpty && syms(0).isEmpty,
      "prw2: symbols[0] must be the empty string")
    val tss = r.timeseries.map { ts =>
      require(ts.labelsRefs.size % 2 == 0,
        s"prw2: odd labels_refs count ${ts.labelsRefs.size}")
      val labels = ts.labelsRefs.grouped(2).map { case Seq(n, v) =>
        require(n >= 0 && n < syms.size && v >= 0 && v < syms.size,
          s"prw2: label ref out of range (n=$n, v=$v, symbols=${syms.size})")
        PLabel(syms(n), syms(v))
      }.toSeq
      PTimeSeries(labels, ts.samples)
    }
    PWriteRequest(tss)
  }

  /** Full v2 ingest edge: bytes → symbols resolved → canonical v1. */
  def decodeToV1(buf: Array[Byte]): PWriteRequest = toV1(decodeRequest(buf))

  /** CT-ZERO candidates: for every series carrying a created_timestamp
    * strictly before its first sample, a synthetic series holding ONE
    * zero sample at the creation instant. The RECEIVER decides which
    * candidates actually ingest (only when no earlier sample for the
    * series is known — injecting behind existing data would fabricate a
    * counter reset); this helper just derives the spec shape.
    */
  def ctZeroSeries(r: P2Request): Seq[PTimeSeries] = {
    val syms = r.symbols.toIndexedSeq
    r.timeseries.flatMap { ts =>
      val firstTs = ts.samples.map(_.timestampMs) ++
        ts.histograms.map(_.timestampMs) match {
        case scala.collection.Seq() => None
        case all => Some(all.min)
      }
      firstTs match {
        case Some(f) if ts.createdTimestampMs > 0L &&
            ts.createdTimestampMs < f =>
          Some(PTimeSeries(resolve(syms, ts.labelsRefs),
            Seq(PSample(0.0, ts.createdTimestampMs))))
        case _ => None
      }
    }
  }

  /** The v2 request's native-histogram series with their symbol refs
    * resolved — the v2 spelling of [[NativeHist.decodeWriteRequest]];
    * callers flatten via [[NativeHist.toClassicSeries]].
    */
  def histogramsToV1(r: P2Request): Seq[NativeHist.PHistSeries] = {
    val syms = r.symbols.toIndexedSeq
    r.timeseries.filter(_.histograms.nonEmpty).map { ts =>
      val labels = ts.labelsRefs.grouped(2).map { case Seq(n, v) =>
        PLabel(syms(n), syms(v))
      }.toSeq
      NativeHist.PHistSeries(labels, ts.histograms)
    }
  }

  private def resolve(syms: IndexedSeq[String], refs: Seq[Int]): Seq[PLabel] =
    refs.grouped(2).map { case Seq(n, v) => PLabel(syms(n), syms(v)) }.toSeq

  /** The v2 request's exemplars with their symbol refs resolved — the v2
    * spelling of the [[WriteWire]] exemplar walk; same downstream store.
    */
  def exemplarsToV1(r: P2Request): Seq[WriteWire.PExemplarSeries] = {
    val syms = r.symbols.toIndexedSeq
    r.timeseries.filter(_.exemplars.nonEmpty).map { ts =>
      WriteWire.PExemplarSeries(resolve(syms, ts.labelsRefs),
        ts.exemplars.map(e =>
          WriteWire.PExemplar(resolve(syms, e.labelsRefs), e.value,
            e.timestampMs)))
    }
  }

  /** The v2 request's per-series metadata resolved to metric families:
    * RW2 attaches metadata to each series, so the family name is the
    * series' `__name__` (the RW2 spec's own rule — senders put the
    * family there); help/unit resolve through the symbol table. One
    * entry per distinct family, last write wins (the receiver rule).
    */
  def metadataToV1(r: P2Request): Seq[WriteWire.PMetadata] = {
    val syms = r.symbols.toIndexedSeq
    val out = scala.collection.mutable.LinkedHashMap[String, WriteWire.PMetadata]()
    r.timeseries.foreach { ts =>
      ts.metadata.foreach { m =>
        val labels = resolve(syms, ts.labelsRefs)
        val fam = labels.find(_.name == "__name__").map(_.value).getOrElse("")
        if (fam.nonEmpty)
          out(fam) = WriteWire.PMetadata(fam, WriteWire.typeName(m.metricType),
            syms(m.helpRef), syms(m.unitRef))
      }
    }
    out.values.toSeq
  }
}
