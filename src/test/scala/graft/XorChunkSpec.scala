package graft

import graft.codec.XorChunk
import org.scalatest.funsuite.AnyFunSuite

/** Bit-level specs for the Gorilla XOR chunk codec (chunkenc.XOR). */
class XorChunkSpec extends AnyFunSuite {

  private def rt(s: Seq[(Long, Double)]): Unit = {
    val back = XorChunk.decode(XorChunk.encode(s))
    assert(back.map(_._1) == s.map(_._1))
    // compare value BITS so NaN payloads and -0.0 survive exactly
    assert(back.map(x => java.lang.Double.doubleToRawLongBits(x._2)) ==
      s.map(x => java.lang.Double.doubleToRawLongBits(x._2)))
  }

  test("round-trip: empty, single, pair, and every dod branch") {
    rt(Seq.empty)
    rt(Seq((1234567890123L, 42.5)))
    rt(Seq((1000L, 1.0), (2000L, 2.0)))
    // deltas: 10, 10 (dod 0), +5000 (14-bit), +60000 (17-bit),
    // +500000 (20-bit), +10^9 (64-bit), then shrinking (negative dods)
    val ts = Seq(0L, 10L, 20L, 5020L, 65020L, 565020L, 1000565020L,
      1000565030L)
    rt(ts.zipWithIndex.map { case (t, i) => (t, i * 1.5 - 2.0) })
  }

  test("round-trip: dod exactly at each varbit range boundary — " +
       "+8192/+65536/+524288 decode POSITIVE (asymmetric xor.go range), " +
       "and the negative extremes -8191/-65535/-524287 survive too") {
    // dod = +2^(n-1) is admitted by encode's bitRange but is the
    // two's-complement sign-bit pattern; xor.go decodes it as positive.
    // delta sequence: 10, then 10+8192=8202 (dod +8192), etc.
    rt(Seq((0L, 1.0), (10L, 1.0), (8212L, 1.0)))           // dod +8192 (14-bit)
    rt(Seq((0L, 1.0), (10L, 1.0), (65556L, 1.0)))          // dod +65536 (17-bit)
    rt(Seq((0L, 1.0), (10L, 1.0), (524308L, 1.0)))         // dod +524288 (20-bit)
    // negative extremes of each branch
    rt(Seq((0L, 1.0), (9000L, 1.0), (9809L, 1.0)))         // dod -8191
    rt(Seq((0L, 1.0), (66000L, 1.0), (66465L, 1.0)))       // dod -65535
    rt(Seq((0L, 1.0), (525000L, 1.0), (525713L, 1.0)))     // dod -524287
    // chain: a boundary dod followed by more samples keeps delta state right
    rt(Seq((0L, 1.0), (10L, 2.0), (8212L, 3.0), (16414L, 4.0), (24616L, 5.0)))
  }

  test("round-trip: value edge cases — NaN, infinities, -0.0, repeats, " +
       "denormals") {
    rt(Seq((0L, Double.NaN), (10L, Double.PositiveInfinity),
      (20L, Double.NegativeInfinity), (30L, -0.0), (40L, 0.0),
      (50L, java.lang.Double.MIN_VALUE), (60L, -1.7e308),
      (70L, -1.7e308), (80L, -1.7e308)))
  }

  test("round-trip: duplicate timestamps (delta 0) are legal") {
    rt(Seq((100L, 1.0), (100L, 2.0), (100L, 2.0), (150L, 3.0)))
  }

  test("compression: a constant regular-interval series costs ~2 bits " +
       "per sample") {
    val s = (0 until 1000).map(i => (i * 15000L, 98.6))
    val bytes = XorChunk.encode(s)
    // steady state: 1 dod bit + 1 xor bit per sample → ~250 bytes for
    // 1000 samples (+ header/first-sample overhead) vs 16,000 raw
    assert(bytes.length < 300,
      s"constant series should compress to <300 bytes, got ${bytes.length}")
    assert(XorChunk.decode(bytes).size == 1000)
  }

  test("seeded randomized round-trip (200 chunks, irregular gaps, " +
       "scrape-like values)") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      var t = rnd.nextLong(1700000000000L)
      val n = rnd.nextInt(300)
      val s = (0 until n).map { _ =>
        t += (if (rnd.nextInt(10) == 0) rnd.nextLong(10000000L)
              else 15000L + rnd.nextInt(200) - 100)
        (t, if (rnd.nextInt(4) == 0) rnd.nextDouble() * 1e9
            else rnd.nextInt(100).toDouble)
      }
      rt(s)
    }
  }

  test("non-decreasing timestamp contract is enforced") {
    intercept[IllegalArgumentException] {
      XorChunk.encode(Seq((100L, 1.0), (50L, 2.0)))
    }
  }

  test("chunked-read framing: multi-frame round-trip with CRC32C, " +
       "corruption detected") {
    import graft.codec.ChunkedRead
    import graft.codec.ChunkedRead._
    import graft.codec.Prompb.PLabel
    val s1 = PChunkedSeries(
      Seq(PLabel("__name__", "up"), PLabel("job", "api")),
      Seq(PChunk(1000L, 5000L, EncodingXor,
        XorChunk.encode(Seq((1000L, 1.0), (5000L, 0.0))))))
    val s2 = PChunkedSeries(Seq(PLabel("__name__", "down")), Seq())
    val wire = frame(encodeResponse(Seq(s1), 0L)) ++
      frame(encodeResponse(Seq(s2), 1L))
    val frames = readFrames(wire)
    assert(frames.size == 2)
    val (ser1, qi1) = decodeResponse(frames(0))
    val (ser2, qi2) = decodeResponse(frames(1))
    assert(qi1 == 0L && qi2 == 1L)
    assert(ser1.head.labels == s1.labels)
    assert(XorChunk.decode(ser1.head.chunks.head.data) ==
      Seq((1000L, 1.0), (5000L, 0.0)))
    assert(ser1.head.chunks.head.minTimeMs == 1000L)
    assert(ser1.head.chunks.head.maxTimeMs == 5000L)
    assert(ser2.head.labels == s2.labels)
    // flip one payload byte → CRC must refuse the stream
    val corrupted = wire.clone()
    corrupted(corrupted.length - 1) = (corrupted.last ^ 0x01).toByte
    intercept[IllegalArgumentException] { readFrames(corrupted) }
  }

  test("FloatHistChunk: sparse native-histogram samples round-trip " +
      "exactly — union layout, per-field xor, zero-bucket drop") {
    import graft.codec.FloatHistChunk
    import graft.codec.FloatHistChunk.HPoint
    // three samples with DIFFERENT sparse layouts (union spans
    // {1..2},{5},{9}), counter-ish count/zero, noisy sum
    val pts = Seq(
      HPoint(1000L, 10.0, 3.25, 2.0, Seq((1, 3.0), (5, 5.0))),
      HPoint(2000L, 16.0, 7.5, 3.0, Seq((1, 4.0), (2, 1.0), (5, 7.0))),
      HPoint(3500L, 21.0, 11.125, 3.0, Seq((2, 2.0), (5, 9.0), (9, 4.0))))
    val chunk = FloatHistChunk.encode(pts)
    val (back, schema) = FloatHistChunk.decode(chunk)
    assert(schema == 0)
    // absent buckets encoded as 0.0 must DECODE AWAY: sparse in =
    // sparse out, exactly
    assert(back == pts)
    // single sample; empty buckets; large/negative dod paths
    assert(FloatHistChunk.decode(FloatHistChunk.encode(
      Seq(HPoint(99L, 1.0, -2.5, 0.0, Nil))))._1 ==
      Seq(HPoint(99L, 1.0, -2.5, 0.0, Nil)))
    val irregular = Seq(
      HPoint(0L, 1.0, 1.0, 0.0, Seq((0, 1.0))),
      HPoint(10L, 2.0, 2.0, 0.0, Seq((0, 2.0))),
      HPoint(2000000L, 3.0, 3.0, 0.0, Seq((0, 3.0))),
      HPoint(2000001L, 4.0, 4.0, 0.0, Seq((0, 4.0))))
    assert(FloatHistChunk.decode(
      FloatHistChunk.encode(irregular))._1 == irregular)
    // integer counts < 2^53 are exact through the double path
    val big = Seq(
      HPoint(1L, 4503599627370495.0, 0.5, 1.0, Seq((3, 4503599627370495.0))),
      HPoint(2L, 4503599627370496.0, 1.5, 2.0, Seq((3, 4503599627370496.0))))
    assert(FloatHistChunk.decode(FloatHistChunk.encode(big))._1 == big)
    // timestamps must be non-decreasing, the appender contract
    intercept[IllegalArgumentException] {
      FloatHistChunk.encode(Seq(
        HPoint(10L, 1.0, 1.0, 0.0, Nil), HPoint(5L, 1.0, 1.0, 0.0, Nil)))
    }
  }
}
