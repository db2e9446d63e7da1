package graft.codec

import graft.codec.Prompb.PLabel

/** Remote-read STREAMED_XOR_CHUNKS response codec — the response type
  * Prometheus negotiates whenever the store supports it (remote-read
  * spec; prompb/remote.proto `ChunkedReadResponse`): instead of one
  * giant SAMPLES proto materialized in memory (the reference's only
  * mode, main.go:322-374), series stream out as framed messages whose
  * samples ride Gorilla-compressed [[XorChunk]]s — constant server
  * memory per frame and ~8-10x fewer bytes on the wire.
  *
  * Messages:
  *   ChunkedReadResponse { repeated ChunkedSeries chunked_series = 1;
  *                         int64 query_index = 2 }
  *   ChunkedSeries { repeated Label labels = 1; repeated Chunk chunks = 2 }
  *   Chunk { int64 min_time_ms = 1; int64 max_time_ms = 2;
  *           Encoding type = 3 (XOR = 1); bytes data = 4 }
  *
  * Framing (prometheus/util/httputil ChunkedWriter): every marshaled
  * ChunkedReadResponse is preceded by its uvarint length and a 4-byte
  * big-endian CRC32-Castagnoli of the payload. Uncompressed on the wire
  * (Content-Type application/x-streamed-protobuf; the chunk data inside
  * is already Gorilla-compressed — snappy over it would be wasted work,
  * which is why the spec drops the outer compression for this type).
  */
object ChunkedRead {

  val EncodingXor = 1
  // prompb chunk Encoding enum: HISTOGRAM = 2 (integer), FLOAT_HISTOGRAM
  // = 3 — native-histogram series ride the float form at this edge
  val EncodingHistogram = 2
  val EncodingFloatHistogram = 3

  case class PChunk(minTimeMs: Long, maxTimeMs: Long, typ: Int,
                    data: Array[Byte])
  case class PChunkedSeries(labels: Seq[PLabel], chunks: Seq[PChunk])

  // --------------------------------------------------------------- write

  private def encLabel(l: PLabel): Array[Byte] = {
    val w = new Prompb.Writer
    w.string(1, l.name); w.string(2, l.value)
    w.toBytes
  }

  private def encChunk(c: PChunk): Array[Byte] = {
    val w = new Prompb.Writer
    w.int64(1, c.minTimeMs); w.int64(2, c.maxTimeMs)
    if (c.typ != 0) { w.key(3, 0); w.varint(c.typ.toLong) }
    w.bytes(4, c.data)
    w.toBytes
  }

  private def encSeries(s: PChunkedSeries): Array[Byte] = {
    val w = new Prompb.Writer
    s.labels.foreach(l => w.message(1, encLabel(l)))
    s.chunks.foreach(c => w.message(2, encChunk(c)))
    w.toBytes
  }

  def encodeResponse(series: Seq[PChunkedSeries],
                     queryIndex: Long): Array[Byte] = {
    val w = new Prompb.Writer
    series.foreach(s => w.message(1, encSeries(s)))
    w.int64(2, queryIndex)
    w.toBytes
  }

  /** One wire frame: uvarint length + big-endian CRC32C + payload. */
  def frame(msg: Array[Byte]): Array[Byte] = {
    val w = new Prompb.Writer
    w.varint(msg.length.toLong)
    val crc = new java.util.zip.CRC32C
    crc.update(msg)
    val c = crc.getValue
    val out = new java.io.ByteArrayOutputStream()
    out.write(w.toBytes)
    out.write(((c >>> 24) & 0xFF).toInt); out.write(((c >>> 16) & 0xFF).toInt)
    out.write(((c >>> 8) & 0xFF).toInt); out.write((c & 0xFF).toInt)
    out.write(msg)
    out.toByteArray
  }

  // ---------------------------------------------------------------- read

  /** Split a framed stream back into verified payloads (CRC enforced). */
  def readFrames(buf: Array[Byte]): Seq[Array[Byte]] = {
    val frames = Seq.newBuilder[Array[Byte]]
    var pos = 0
    def uvarint(): Long = {
      var shift = 0; var result = 0L
      while (true) {
        val b = buf(pos); pos += 1
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
        if (shift > 63) throw new IllegalArgumentException("uvarint too long")
      }
      result
    }
    while (pos < buf.length) {
      val len = uvarint().toInt
      val want = ((buf(pos) & 0xFFL) << 24) | ((buf(pos + 1) & 0xFFL) << 16) |
        ((buf(pos + 2) & 0xFFL) << 8) | (buf(pos + 3) & 0xFFL)
      pos += 4
      val payload = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      val crc = new java.util.zip.CRC32C
      crc.update(payload)
      require(crc.getValue == want,
        f"chunked frame CRC mismatch: want $want%08x got ${crc.getValue}%08x")
      frames += payload
    }
    frames.result()
  }

  private def decLabel(buf: Array[Byte], s: Int, e: Int): PLabel = {
    val r = new Prompb.Reader(buf, s, e)
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

  private def decChunk(buf: Array[Byte], s: Int, e: Int): PChunk = {
    val r = new Prompb.Reader(buf, s, e)
    var mn = 0L; var mx = 0L; var typ = 0; var data = Array.empty[Byte]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 0) => mn = r.varint()
        case (2, 0) => mx = r.varint()
        case (3, 0) => typ = r.varint().toInt
        case (4, 2) =>
          val (a, b) = r.lenDelimited()
          data = java.util.Arrays.copyOfRange(buf, a, b)
        case (_, w) => r.skip(w)
      }
    }
    PChunk(mn, mx, typ, data)
  }

  private def decSeries(buf: Array[Byte], s: Int, e: Int): PChunkedSeries = {
    val r = new Prompb.Reader(buf, s, e)
    val labels = Seq.newBuilder[PLabel]
    val chunks = Seq.newBuilder[PChunk]
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) => val (a, b) = r.lenDelimited(); labels += decLabel(buf, a, b)
        case (2, 2) => val (a, b) = r.lenDelimited(); chunks += decChunk(buf, a, b)
        case (_, w) => r.skip(w)
      }
    }
    PChunkedSeries(labels.result(), chunks.result())
  }

  def decodeResponse(buf: Array[Byte]): (Seq[PChunkedSeries], Long) = {
    val r = new Prompb.Reader(buf, 0, buf.length)
    val series = Seq.newBuilder[PChunkedSeries]
    var qi = 0L
    while (r.hasMore) {
      val k = r.varint(); (k >> 3, (k & 7).toInt) match {
        case (1, 2) => val (a, b) = r.lenDelimited(); series += decSeries(buf, a, b)
        case (2, 0) => qi = r.varint()
        case (_, w) => r.skip(w)
      }
    }
    (series.result(), qi)
  }
}
