package graft.codec

import java.io.ByteArrayOutputStream

/** Minimal hand-rolled protobuf wire codec for the Prometheus remote
  * storage messages (`prompb`), plus snappy framing — the byte-level front
  * door of the reference (`main.go:286-302` decode, `main.go:359-371`
  * encode).
  *
  * Message/field layout is the public Prometheus `prompb` definition
  * (prometheus/prompb/remote.proto + types.proto):
  *
  *   WriteRequest { repeated TimeSeries timeseries = 1 }
  *   ReadRequest  { repeated Query queries = 1 }
  *   Query        { int64 start_timestamp_ms = 1; int64 end_timestamp_ms = 2;
  *                  repeated LabelMatcher matchers = 3 }
  *   LabelMatcher { Type type = 1 (EQ=0 NEQ=1 RE=2 NRE=3);
  *                  string name = 2; string value = 3 }
  *   ReadResponse { repeated QueryResult results = 1 }
  *   QueryResult  { repeated TimeSeries timeseries = 1 }
  *   TimeSeries   { repeated Label labels = 1; repeated Sample samples = 2 }
  *   Label        { string name = 1; string value = 2 }
  *   Sample       { double value = 1; int64 timestamp = 2 }
  *
  * Hand-rolled because no protobuf runtime ships in this environment; the
  * wire format (varint / fixed64 / length-delimited, unknown fields
  * skipped) is small enough that a direct implementation is simpler and
  * dependency-free. Decoders tolerate unknown fields so payloads from
  * newer Prometheus versions (e.g. WriteRequest.metadata = 3) still parse.
  */
object Prompb {

  case class PLabel(name: String, value: String)
  case class PSample(value: Double, timestampMs: Long)
  case class PTimeSeries(labels: Seq[PLabel], samples: Seq[PSample])
  case class PWriteRequest(timeseries: Seq[PTimeSeries])
  case class PLabelMatcher(matchType: Int, name: String, value: String)

  /** prompb.ReadHints (types.proto): Prometheus tells the remote end its
    * evaluation step, the outer function, grouping labels, and the
    * selector's range — enough for the server to route a downsampled
    * tier without any out-of-band parameter.
    */
  case class PReadHints(stepMs: Long = 0L, func: String = "",
                        startMs: Long = 0L, endMs: Long = 0L,
                        grouping: Seq[String] = Nil, by: Boolean = false,
                        rangeMs: Long = 0L)

  case class PQuery(startMs: Long, endMs: Long, matchers: Seq[PLabelMatcher],
                    hints: Option[PReadHints] = None)

  /** ReadRequest.accepted_response_types (remote.proto field 2): the
    * response encodings the client can consume, in preference order —
    * SAMPLES(0) / STREAMED_XOR_CHUNKS(1). An empty list means the legacy
    * client contract: SAMPLES only.
    */
  case class PReadRequest(queries: Seq[PQuery],
                          acceptedResponseTypes: Seq[Int] = Nil)

  object ResponseType {
    val SAMPLES = 0; val STREAMED_XOR_CHUNKS = 1
  }
  case class PQueryResult(timeseries: Seq[PTimeSeries])
  case class PReadResponse(results: Seq[PQueryResult])

  object MatchType {
    val EQ = 0; val NEQ = 1; val RE = 2; val NRE = 3
  }

  // ---------------------------------------------------------------- write

  private[codec] class Writer {
    private val out = new ByteArrayOutputStream()

    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0) {
        out.write(((x & 0x7F) | 0x80).toInt)
        x >>>= 7
      }
      out.write(x.toInt)
    }

    def key(field: Int, wire: Int): Unit = varint((field << 3) | wire)

    def int64(field: Int, v: Long): Unit =
      if (v != 0) { key(field, 0); varint(v) }

    def double(field: Int, v: Double): Unit = {
      // proto3 default-skips 0.0, but a 0.0 sample value is meaningful in
      // metrics: always emit (matches gogoproto non-nullable emission for
      // values inside packed structs being explicit in practice — and a
      // decoder treats absent as 0.0 anyway, so this is purely about byte
      // stability of golden tests). RAW bits: doubleToLongBits collapses
      // every NaN to the canonical quiet NaN, which would destroy the
      // Prometheus stale-marker payload (0x7ff0000000000002) in transit.
      key(field, 1)
      val bits = java.lang.Double.doubleToRawLongBits(v)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }

    def fixed64(field: Int, v: Long): Unit = {
      key(field, 1)
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }

    def bytes(field: Int, b: Array[Byte]): Unit = {
      key(field, 2); varint(b.length.toLong); out.write(b)
    }

    def string(field: Int, s: String): Unit =
      if (s.nonEmpty) bytes(field, s.getBytes("UTF-8"))

    def message(field: Int, body: Array[Byte]): Unit = bytes(field, body)

    /** Bare little-endian fixed64 with no key — packed repeated fields. */
    def rawFixed64(v: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
    }

    def toBytes: Array[Byte] = out.toByteArray
  }

  private def encLabel(l: PLabel): Array[Byte] = {
    val w = new Writer; w.string(1, l.name); w.string(2, l.value); w.toBytes
  }

  private def encSample(s: PSample): Array[Byte] = {
    val w = new Writer; w.double(1, s.value); w.int64(2, s.timestampMs); w.toBytes
  }

  private def encTimeSeries(ts: PTimeSeries): Array[Byte] = {
    val w = new Writer
    ts.labels.foreach(l => w.message(1, encLabel(l)))
    ts.samples.foreach(s => w.message(2, encSample(s)))
    w.toBytes
  }

  def encodeWriteRequest(r: PWriteRequest): Array[Byte] = {
    val w = new Writer
    r.timeseries.foreach(ts => w.message(1, encTimeSeries(ts)))
    w.toBytes
  }

  private def encMatcher(m: PLabelMatcher): Array[Byte] = {
    val w = new Writer
    w.int64(1, m.matchType.toLong); w.string(2, m.name); w.string(3, m.value)
    w.toBytes
  }

  private def encHints(h: PReadHints): Array[Byte] = {
    val w = new Writer
    w.int64(1, h.stepMs); w.string(2, h.func)
    w.int64(3, h.startMs); w.int64(4, h.endMs)
    h.grouping.foreach(g => w.bytes(5, g.getBytes("UTF-8")))
    if (h.by) { w.key(6, 0); w.varint(1L) }
    w.int64(7, h.rangeMs)
    w.toBytes
  }

  private def encQuery(q: PQuery): Array[Byte] = {
    val w = new Writer
    w.int64(1, q.startMs); w.int64(2, q.endMs)
    q.matchers.foreach(m => w.message(3, encMatcher(m)))
    q.hints.foreach(h => w.message(4, encHints(h)))
    w.toBytes
  }

  def encodeReadRequest(r: PReadRequest): Array[Byte] = {
    val w = new Writer
    r.queries.foreach(q => w.message(1, encQuery(q)))
    // repeated enum — packed, as proto3 (and Prometheus's gogoproto
    // codegen) emits it
    if (r.acceptedResponseTypes.nonEmpty) {
      val packed = new Writer
      r.acceptedResponseTypes.foreach(t => packed.varint(t.toLong))
      w.bytes(2, packed.toBytes)
    }
    w.toBytes
  }

  def encodeReadResponse(r: PReadResponse): Array[Byte] = {
    val w = new Writer
    r.results.foreach { qr =>
      val inner = new Writer
      qr.timeseries.foreach(ts => inner.message(1, encTimeSeries(ts)))
      w.message(1, inner.toBytes)
    }
    w.toBytes
  }

  // ----------------------------------------------------------------- read

  private[codec] class Reader(buf: Array[Byte], start: Int, end: Int) {
    var pos: Int = start

    def hasMore: Boolean = pos < end

    def varint(): Long = {
      var shift = 0; var result = 0L
      while (true) {
        val b = buf(pos); pos += 1
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
        if (shift > 63) throw new IllegalArgumentException("varint too long")
      }
      result
    }

    def fixed64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8
      v
    }

    def lenDelimited(): (Int, Int) = {
      val len = varint().toInt
      val s = pos
      pos += len
      if (pos > end) throw new IllegalArgumentException("truncated message")
      (s, s + len)
    }

    def utf8(): String = {
      val (s, e) = lenDelimited()
      new String(buf, s, e - s, "UTF-8")
    }

    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => lenDelimited()
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def decLabel(buf: Array[Byte], s: Int, e: Int): PLabel = {
    val r = new Reader(buf, s, e)
    var name = ""; var value = ""
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) => name = r.utf8()
        case (2, 2) => value = r.utf8()
        case (_, w) => r.skip(w)
      }
    }
    PLabel(name, value)
  }

  private def decSample(buf: Array[Byte], s: Int, e: Int): PSample = {
    val r = new Reader(buf, s, e)
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

  private def decTimeSeries(buf: Array[Byte], s: Int, e: Int): PTimeSeries = {
    val r = new Reader(buf, s, e)
    val labels = Seq.newBuilder[PLabel]
    val samples = Seq.newBuilder[PSample]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) => val (a, b) = r.lenDelimited(); labels += decLabel(buf, a, b)
        case (2, 2) => val (a, b) = r.lenDelimited(); samples += decSample(buf, a, b)
        case (_, w) => r.skip(w)
      }
    }
    PTimeSeries(labels.result(), samples.result())
  }

  def decodeWriteRequest(buf: Array[Byte]): PWriteRequest = {
    val r = new Reader(buf, 0, buf.length)
    val tss = Seq.newBuilder[PTimeSeries]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) => val (a, b) = r.lenDelimited(); tss += decTimeSeries(buf, a, b)
        case (_, w) => r.skip(w)
      }
    }
    PWriteRequest(tss.result())
  }

  private def decMatcher(buf: Array[Byte], s: Int, e: Int): PLabelMatcher = {
    val r = new Reader(buf, s, e)
    var t = 0; var name = ""; var value = ""
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 0) => t = r.varint().toInt
        case (2, 2) => name = r.utf8()
        case (3, 2) => value = r.utf8()
        case (_, w) => r.skip(w)
      }
    }
    PLabelMatcher(t, name, value)
  }

  private def decQuery(buf: Array[Byte], s: Int, e: Int): PQuery = {
    val r = new Reader(buf, s, e)
    var st = 0L; var en = 0L
    val ms = Seq.newBuilder[PLabelMatcher]
    var hints: Option[PReadHints] = None
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 0) => st = r.varint()
        case (2, 0) => en = r.varint()
        case (3, 2) => val (a, b) = r.lenDelimited(); ms += decMatcher(buf, a, b)
        case (4, 2) =>
          val (a, b) = r.lenDelimited(); hints = Some(decHints(buf, a, b))
        case (_, w) => r.skip(w)
      }
    }
    PQuery(st, en, ms.result(), hints)
  }

  private def decHints(buf: Array[Byte], start: Int, end: Int): PReadHints = {
    val r = new Reader(buf, start, end)
    var h = PReadHints()
    val grouping = Seq.newBuilder[String]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 0) => h = h.copy(stepMs = r.varint())
        case (2, 2) =>
          val (a, b) = r.lenDelimited()
          h = h.copy(func = new String(buf, a, b - a, "UTF-8"))
        case (3, 0) => h = h.copy(startMs = r.varint())
        case (4, 0) => h = h.copy(endMs = r.varint())
        case (5, 2) =>
          val (a, b) = r.lenDelimited()
          grouping += new String(buf, a, b - a, "UTF-8")
        case (6, 0) => h = h.copy(by = r.varint() != 0)
        case (7, 0) => h = h.copy(rangeMs = r.varint())
        case (_, w) => r.skip(w)
      }
    }
    h.copy(grouping = grouping.result())
  }

  def decodeReadRequest(buf: Array[Byte]): PReadRequest = {
    val r = new Reader(buf, 0, buf.length)
    val qs = Seq.newBuilder[PQuery]
    val accepted = Seq.newBuilder[Int]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) => val (a, b) = r.lenDelimited(); qs += decQuery(buf, a, b)
        // repeated enum arrives PACKED from proto3 emitters but the wire
        // spec also allows the unpacked form — accept both
        case (2, 2) =>
          val (a, b) = r.lenDelimited()
          val rr = new Reader(buf, a, b)
          while (rr.hasMore) accepted += rr.varint().toInt
        case (2, 0) => accepted += r.varint().toInt
        case (_, w) => r.skip(w)
      }
    }
    PReadRequest(qs.result(), accepted.result())
  }

  def decodeReadResponse(buf: Array[Byte]): PReadResponse = {
    val r = new Reader(buf, 0, buf.length)
    val results = Seq.newBuilder[PQueryResult]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) =>
          val (a, b) = r.lenDelimited()
          val rr = new Reader(buf, a, b)
          val tss = Seq.newBuilder[PTimeSeries]
          while (rr.hasMore) {
            val kk = rr.varint(); (kk >> 3, (kk & 7).toInt) match {
              case (1, 2) => val (x, y) = rr.lenDelimited(); tss += decTimeSeries(buf, x, y)
              case (_, w) => rr.skip(w)
            }
          }
          results += PQueryResult(tss.result())
        case (_, w) => r.skip(w)
      }
    }
    PReadResponse(results.result())
  }

  // --------------------------------------------------------------- snappy

  /** Snappy block framing as on the Prometheus remote wire
    * (reference: main.go:294, snappy.Decode / snappy.Encode block format —
    * NOT the streaming/framed format).
    */
  def snappyCompress(b: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.compress(b)

  def snappyUncompress(b: Array[Byte]): Array[Byte] =
    org.xerial.snappy.Snappy.uncompress(b)
}
