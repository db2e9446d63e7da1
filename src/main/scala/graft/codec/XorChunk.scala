package graft.codec

/** Gorilla XOR chunk codec — the Prometheus TSDB `chunkenc.XOR` sample
  * encoding (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time
  * Series Database", VLDB 2015; layout per prometheus/tsdb/chunkenc
  * xor.go): delta-of-delta varbit timestamps + XOR'd float values with a
  * reusable leading/trailing-zero window. ~1.37 bytes/sample on typical
  * scrape data vs 16 raw — the reason remote-read's streamed response
  * type ships chunks, not samples, and the compression this engine's
  * response edge offers beyond the reference's SAMPLES-only reads
  * (reference: main.go:322-374 always re-encodes full samples).
  *
  * Chunk layout (matches the TSDB on-disk data payload):
  *   uint16 big-endian sample count,
  *   then a bitstream:
  *     sample 0: timestamp as zigzag varint, value as raw 64 bits
  *     sample 1: timestamp delta as uvarint, value XOR-encoded
  *     sample n: delta-of-delta varbit —
  *       '0'                 dod = 0
  *       '10'  + 14 bits     dod in [-8191, 8192]
  *       '110' + 17 bits     dod in [-65535, 65536]
  *       '1110'+ 20 bits     dod in [-524287, 524288]
  *       '1111'+ 64 bits     anything else
  *     value XOR:
  *       '0'                  xor = 0 (repeat)
  *       '10'  + sig bits     xor fits the previous leading/trailing window
  *       '11'  + 5-bit leading + 6-bit sigbit count (64 encodes as 0)
  *             + sig bits
  *
  * Timestamps must be non-decreasing (the TSDB appender contract — this
  * engine's series assembly emits time-sorted samples). Encoding is a
  * pure function of the sample sequence, so chunk bytes are
  * reproducible across runs and engines.
  */
object XorChunk {

  // ------------------------------------------------------------ bitstream

  private[codec] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0 // filled bits in cur (from MSB)

    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nbits += 1
      if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
    }

    def writeBits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }

    def writeByte(b: Int): Unit = writeBits(b.toLong & 0xFF, 8)

    def uvarint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7FL) != 0) { writeByte(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
      writeByte(x.toInt)
    }

    def varint(v: Long): Unit = uvarint((v << 1) ^ (v >> 63)) // zigzag

    def toBytes: Array[Byte] = {
      if (nbits == 0) out.toByteArray
      else {
        val padded = out.toByteArray
        val res = java.util.Arrays.copyOf(padded, padded.length + 1)
        res(padded.length) = (cur << (8 - nbits)).toByte
        res
      }
    }
  }

  private[codec] final class BitReader(buf: Array[Byte], startByte: Int) {
    private var pos = startByte * 8L

    def readBit(): Int = {
      val byteIdx = (pos >>> 3).toInt
      val bitIdx = (pos & 7).toInt
      pos += 1
      (buf(byteIdx) >> (7 - bitIdx)) & 1
    }

    def readBits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def readByte(): Int = readBits(8).toInt

    def uvarint(): Long = {
      var shift = 0; var result = 0L
      while (true) {
        val b = readByte()
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
        if (shift > 63) throw new IllegalArgumentException("uvarint too long")
      }
      result
    }

    def varint(): Long = { val u = uvarint(); (u >>> 1) ^ -(u & 1L) }
  }

  // --------------------------------------------------------------- encode

  def encode(samples: Seq[(Long, Double)]): Array[Byte] = {
    require(samples.size <= 0xFFFF, "chunk sample count exceeds uint16")
    val w = new BitWriter
    w.writeByte((samples.size >> 8) & 0xFF)
    w.writeByte(samples.size & 0xFF)
    var prevT = 0L; var prevDelta = 0L; var prevV = 0L
    var leading = -1; var trailing = 0

    def writeVDelta(bits: Long): Unit = {
      val xor = bits ^ prevV
      if (xor == 0) w.writeBit(0)
      else {
        w.writeBit(1)
        var lead = java.lang.Long.numberOfLeadingZeros(xor)
        val trail = java.lang.Long.numberOfTrailingZeros(xor)
        if (lead >= 32) lead = 31 // 5-bit cap (the xor.go clamp)
        if (leading != -1 && lead >= leading && trail >= trailing) {
          // reuse the previous window
          w.writeBit(0)
          w.writeBits(xor >>> trailing, 64 - leading - trailing)
        } else {
          leading = lead; trailing = trail
          w.writeBit(1)
          w.writeBits(lead.toLong, 5)
          val sigbits = 64 - lead - trail
          w.writeBits(sigbits.toLong & 0x3F, 6) // 64 encodes as 0
          w.writeBits(xor >>> trail, sigbits)
        }
      }
      prevV = bits
    }

    samples.zipWithIndex.foreach { case ((t, v), i) =>
      val bits = java.lang.Double.doubleToRawLongBits(v)
      if (i == 0) {
        w.varint(t)
        w.writeBits(bits, 64)
        prevV = bits
        prevT = t
      } else if (i == 1) {
        val delta = t - prevT
        require(delta >= 0, "timestamps must be non-decreasing")
        w.uvarint(delta)
        writeVDelta(bits)
        prevDelta = delta; prevT = t
      } else {
        val delta = t - prevT
        require(delta >= 0, "timestamps must be non-decreasing")
        val dod = delta - prevDelta
        if (dod == 0) w.writeBit(0)
        else if (bitRange(dod, 14)) { w.writeBits(0x2, 2); w.writeBits(dod & 0x3FFF, 14) }
        else if (bitRange(dod, 17)) { w.writeBits(0x6, 3); w.writeBits(dod & 0x1FFFF, 17) }
        else if (bitRange(dod, 20)) { w.writeBits(0xE, 4); w.writeBits(dod & 0xFFFFF, 20) }
        else { w.writeBits(0xF, 4); w.writeBits(dod, 64) }
        writeVDelta(bits)
        prevDelta = delta; prevT = t
      }
    }
    w.toBytes
  }

  /** dod fits n-bit two's complement per xor.go bitRange:
    * -((1<<(n-1))-1) <= dod <= 1<<(n-1).
    */
  private def bitRange(x: Long, nbits: Int): Boolean =
    -((1L << (nbits - 1)) - 1) <= x && x <= (1L << (nbits - 1))

  // --------------------------------------------------------------- decode

  def decode(chunk: Array[Byte]): Seq[(Long, Double)] = {
    val n = ((chunk(0) & 0xFF) << 8) | (chunk(1) & 0xFF)
    val r = new BitReader(chunk, 2)
    val out = Seq.newBuilder[(Long, Double)]
    var t = 0L; var delta = 0L; var vbits = 0L
    var leading = 0; var trailing = 0

    def readVDelta(): Unit = {
      if (r.readBit() == 1) {
        if (r.readBit() == 1) {
          leading = r.readBits(5).toInt
          var sig = r.readBits(6).toInt
          if (sig == 0) sig = 64
          trailing = 64 - leading - sig
        }
        val sigbits = 64 - leading - trailing
        val xor = r.readBits(sigbits) << trailing
        vbits ^= xor
      }
    }

    var i = 0
    while (i < n) {
      if (i == 0) {
        t = r.varint()
        vbits = r.readBits(64)
      } else if (i == 1) {
        delta = r.uvarint()
        t += delta
        readVDelta()
      } else {
        val dod =
          if (r.readBit() == 0) 0L
          else if (r.readBit() == 0) decodeDod(r.readBits(14), 14)
          else if (r.readBit() == 0) decodeDod(r.readBits(17), 17)
          else if (r.readBit() == 0) decodeDod(r.readBits(20), 20)
          else r.readBits(64)
        delta += dod
        t += delta
        readVDelta()
      }
      out += ((t, java.lang.Double.longBitsToDouble(vbits)))
      i += 1
    }
    out.result()
  }

  /** n-bit dod field → long, matching prometheus chunkenc xor.go's
    * asymmetric range: encode admits dod in [-(2^(n-1)-1), +2^(n-1)], so
    * the all-but-sign-bit pattern 2^(n-1) decodes as POSITIVE 2^(n-1),
    * not two's-complement -2^(n-1). xor.go: `if v > (1 << (nbits-1))
    * { v = v - (1 << nbits) }`.
    */
  private def decodeDod(v: Long, nbits: Int): Long =
    if (v > (1L << (nbits - 1))) v - (1L << nbits) else v
}
