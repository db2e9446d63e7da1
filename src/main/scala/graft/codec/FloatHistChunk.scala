package graft.codec

/** FLOAT_HISTOGRAM chunk codec for the chunked remote-read edge — the
  * native-histogram sibling of [[XorChunk]], built from the same
  * techniques Prometheus's chunkenc histogram chunks use
  * (prometheus/tsdb/chunkenc/floathistogram.go): one bucket LAYOUT per
  * chunk (spans of consecutive bucket indexes; a sample whose buckets
  * don't fit the layout forces a chunk cut — here the encoder derives
  * the union layout up front, the recode-on-append equivalent),
  * delta-of-delta varbit timestamps shared with the XOR chunk, and
  * per-FIELD Gorilla XOR value compression: count, zero count, sum and
  * every layout bucket each carry their own leading/trailing window,
  * because a counter-ish count column and a noisy sum column compress
  * on different bit patterns.
  *
  * Chunk layout:
  *   uint16 big-endian sample count
  *   uvarint zigzag schema (0 = this engine's base-2 bit-length grid)
  *   uvarint span count, then per span: zigzag varint offset (gap from
  *     the previous span's end; first span from index 0), uvarint length
  *   bitstream:
  *     sample 0: zigzag varint ts ms; count, zero, sum, then every
  *       layout bucket as raw 64-bit doubles
  *     sample n: ts delta-of-delta varbit (the [[XorChunk]] tree), then
  *       count, zero, sum, every layout bucket XOR-encoded against the
  *       previous sample's SAME field
  *
  * Values are doubles end to end (the FLOAT_HISTOGRAM semantic):
  * integer counts < 2^53 round-trip exactly. Absent buckets encode as
  * 0.0 and decode drops zero-count buckets, so sparse in = sparse out.
  * Positive buckets + the zero bucket, the engine-wide convention.
  */
object FloatHistChunk {

  /** One native-histogram sample at the read edge. */
  case class HPoint(tsMs: Long, count: Double, sum: Double, zero: Double,
                    buckets: Seq[(Int, Double)])

  /** (offset-from-previous-span-end, length) runs over the sorted union
    * of bucket indexes — the chunk's single layout. */
  private def spansOf(idxs: Seq[Int]): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var prevEnd = 0 // first span offsets from index 0
    var i = 0
    while (i < idxs.length) {
      val start = idxs(i)
      var end = start
      while (i + 1 < idxs.length && idxs(i + 1) == end + 1) {
        end += 1; i += 1
      }
      out += ((start - prevEnd, end - start + 1))
      prevEnd = end + 1
      i += 1
    }
    out.result()
  }

  /** Per-field Gorilla window state (xor.go's writeVDelta). */
  private final class VState {
    var prev = 0L
    var leading = -1
    var trailing = 0
  }

  private def writeV(w: XorChunk.BitWriter, st: VState, v: Double): Unit = {
    val bits = java.lang.Double.doubleToRawLongBits(v)
    val xor = bits ^ st.prev
    if (xor == 0) w.writeBit(0)
    else {
      w.writeBit(1)
      var lead = java.lang.Long.numberOfLeadingZeros(xor)
      val trail = java.lang.Long.numberOfTrailingZeros(xor)
      if (lead >= 32) lead = 31
      if (st.leading != -1 && lead >= st.leading && trail >= st.trailing) {
        w.writeBit(0)
        w.writeBits(xor >>> st.trailing, 64 - st.leading - st.trailing)
      } else {
        st.leading = lead; st.trailing = trail
        w.writeBit(1)
        w.writeBits(lead.toLong, 5)
        val sigbits = 64 - lead - trail
        w.writeBits(sigbits.toLong & 0x3F, 6)
        w.writeBits(xor >>> trail, sigbits)
      }
    }
    st.prev = bits
  }

  private def readV(r: XorChunk.BitReader, st: VState): Double = {
    if (r.readBit() == 1) {
      if (r.readBit() == 1) {
        st.leading = r.readBits(5).toInt
        var sig = r.readBits(6).toInt
        if (sig == 0) sig = 64
        st.trailing = 64 - st.leading - sig
      }
      val sigbits = 64 - st.leading - st.trailing
      st.prev ^= r.readBits(sigbits) << st.trailing
    }
    java.lang.Double.longBitsToDouble(st.prev)
  }

  def encode(points: Seq[HPoint], schema: Int = 0): Array[Byte] = {
    require(points.size <= 0xFFFF, "chunk sample count exceeds uint16")
    val layout = points.flatMap(_.buckets.map(_._1)).distinct.sorted
    val w = new XorChunk.BitWriter
    w.writeByte((points.size >> 8) & 0xFF)
    w.writeByte(points.size & 0xFF)
    w.varint(schema.toLong)
    val spans = spansOf(layout)
    w.uvarint(spans.size.toLong)
    spans.foreach { case (off, len) =>
      w.varint(off.toLong); w.uvarint(len.toLong)
    }
    val fields = Array.fill(3 + layout.size)(new VState)
    var prevT = 0L; var prevDelta = 0L
    points.zipWithIndex.foreach { case (p, i) =>
      val bmap = p.buckets.toMap
      val vals = Array(p.count, p.zero, p.sum) ++
        layout.map(ix => bmap.getOrElse(ix, 0.0))
      if (i == 0) {
        w.varint(p.tsMs)
        vals.zip(fields).foreach { case (v, st) =>
          val bits = java.lang.Double.doubleToRawLongBits(v)
          w.writeBits(bits, 64); st.prev = bits
        }
        prevT = p.tsMs
      } else {
        val delta = p.tsMs - prevT
        require(delta >= 0, "timestamps must be non-decreasing")
        if (i == 1) w.uvarint(delta)
        else {
          val dod = delta - prevDelta
          if (dod == 0) w.writeBit(0)
          else if (fits(dod, 14)) { w.writeBits(0x2, 2); w.writeBits(dod & 0x3FFF, 14) }
          else if (fits(dod, 17)) { w.writeBits(0x6, 3); w.writeBits(dod & 0x1FFFF, 17) }
          else if (fits(dod, 20)) { w.writeBits(0xE, 4); w.writeBits(dod & 0xFFFFF, 20) }
          else { w.writeBits(0xF, 4); w.writeBits(dod, 64) }
        }
        vals.zip(fields).foreach { case (v, st) => writeV(w, st, v) }
        prevDelta = delta; prevT = p.tsMs
      }
    }
    w.toBytes
  }

  private def fits(x: Long, nbits: Int): Boolean =
    -((1L << (nbits - 1)) - 1) <= x && x <= (1L << (nbits - 1))

  /** Decoded points with zero-count buckets dropped (sparse out); the
    * second element is the chunk's schema. */
  def decode(chunk: Array[Byte]): (Seq[HPoint], Int) = {
    val n = ((chunk(0) & 0xFF) << 8) | (chunk(1) & 0xFF)
    val r = new XorChunk.BitReader(chunk, 2)
    val schema = r.varint().toInt
    val nspans = r.uvarint().toInt
    val layout = Seq.newBuilder[Int]
    var at = 0
    (0 until nspans).foreach { _ =>
      val off = r.varint().toInt
      val len = r.uvarint().toInt
      at += off
      (0 until len).foreach { _ => layout += at; at += 1 }
    }
    val idxs = layout.result()
    val fields = Array.fill(3 + idxs.size)(new VState)
    val out = Seq.newBuilder[HPoint]
    var t = 0L; var delta = 0L
    var i = 0
    while (i < n) {
      val vals = new Array[Double](3 + idxs.size)
      if (i == 0) {
        t = r.varint()
        fields.indices.foreach { j =>
          fields(j).prev = r.readBits(64)
          vals(j) = java.lang.Double.longBitsToDouble(fields(j).prev)
        }
      } else {
        if (i == 1) delta = r.uvarint()
        else {
          val dod =
            if (r.readBit() == 0) 0L
            else if (r.readBit() == 0) undoDod(r.readBits(14), 14)
            else if (r.readBit() == 0) undoDod(r.readBits(17), 17)
            else if (r.readBit() == 0) undoDod(r.readBits(20), 20)
            else r.readBits(64)
          delta += dod
        }
        t += delta
        fields.indices.foreach(j => vals(j) = readV(r, fields(j)))
      }
      out += HPoint(t, vals(0), vals(2), vals(1),
        idxs.zipWithIndex.collect {
          case (ix, j) if vals(3 + j) != 0.0 => (ix, vals(3 + j))
        })
      i += 1
    }
    (out.result(), schema)
  }

  private def undoDod(v: Long, nbits: Int): Long =
    if (v > (1L << (nbits - 1))) v - (1L << nbits) else v
}
