package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads travel as opaque `binary`
  * columns with a typed metadata struct beside them — the standard layout
  * for image/audio/video in a parquet-backed training-data lake (the bytes
  * stay out of every shuffle that doesn't need them; metadata predicates
  * prune without touching payloads).
  *
  * Header decode is REAL for BMP / PNG / WAV payloads ([[decodeMeta]]
  * sniffs magic bytes and parses the spec's actual geometry fields, all
  * composed builtin expressions); unrecognized payloads fall back to
  * [[fakeDecodeMeta]], the honest stub that derives deterministic pseudo
  * dimensions from a content hash (full pixel/sample codecs aren't in
  * this environment). The surrounding plumbing — schema, binary columns,
  * column pruning, batch shape — is what a production pixel decoder
  * (mapPartitions over a JNI codec, or mapInArrow into a Python worker)
  * would slot into, AFTER the metadata prune this header pass provides.
  */
object Multimodal {

  /** Wrap a text column as a binary payload (UTF-8), standing in for image
    * bytes in the testdata, which ships no true media blobs.
    */
  def asBinaryPayload(text: Column): Column = encode(text, "UTF-8")

  /** STUB DECODER — deterministic fake. A real pipeline replaces this with
    * an actual codec over the payload bytes; the fake keeps the exact
    * schema and derives "dimensions" from the payload's md5 so results are
    * reproducible and oracle-checkable:
    *   width  = first  md5 byte (hex 1-2)  as int, +1
    *   height = second md5 byte (hex 3-4)  as int, +1
    *   n_bytes, fingerprint = md5 prefix.
    */
  def fakeDecodeMeta(payload: Column): Column = {
    val h = md5(payload)
    struct(
      length(payload).as("n_bytes"),
      (conv(substring(h, 1, 2), 16, 10).cast("int") + 1).as("width"),
      (conv(substring(h, 3, 2), 16, 10).cast("int") + 1).as("height"),
      substring(h, 1, 8).as("fingerprint"))
  }

  /** Big-endian hex of an int expression, padded to `bytes` bytes. */
  private def beHex(v: Column, bytes: Int): Column =
    lpad(hex(v), bytes * 2, "0")

  /** Little-endian hex: the BE byte pairs in reverse order. */
  private def leHex(v: Column, bytes: Int): Column = {
    val be = beHex(v, bytes)
    concat((0 until bytes).reverse.map(i => substring(be, i * 2 + 1, 2)): _*)
  }

  /** hex chars [off, off+n) of the payload (1-based byte offset). */
  private def hexAt(payload: Column, off: Int, n: Int): Column =
    hex(substring(payload, off, n))

  /** Unsigned little-endian integer at a byte offset. */
  private def leInt(payload: Column, off: Int, n: Int): Column = {
    val h = hexAt(payload, off, n)
    conv(concat((0 until n).reverse.map(i => substring(h, i * 2 + 1, 2)): _*),
      16, 10).cast("long")
  }

  /** Unsigned big-endian integer at a byte offset. */
  private def beInt(payload: Column, off: Int, n: Int): Column =
    conv(hexAt(payload, off, n), 16, 10).cast("long")

  /** A REAL BMP payload: the 54-byte BITMAPFILEHEADER+BITMAPINFOHEADER
    * per the format spec (magic 'BM', little-endian geometry, 24 bpp,
    * pixel data offset 54), with `body` standing in for the pixel array.
    * Any BMP reader accepts the header. Pure hex assembly + one unhex —
    * map-side, codegen'd, no UDF.
    */
  def bmpPayload(w: Column, h: Column, body: Column): Column =
    concat(unhex(concat(
      lit("424D"),                       // 'BM'
      leHex(length(body) + 54, 4),       // file size
      lit("00000000"),                   // reserved
      leHex(lit(54), 4),                 // pixel data offset
      leHex(lit(40), 4),                 // BITMAPINFOHEADER size
      leHex(w, 4), leHex(h, 4),          // width, height (LE int32)
      leHex(lit(1), 2), leHex(lit(24), 2), // planes, bpp
      lit("0" * 48))),                   // compression..clrImportant = 0
      body)

  /** A REAL PNG prefix: 8-byte signature + the IHDR chunk (big-endian
    * geometry, 8-bit truecolor) — the part every PNG decoder reads first.
    * CRC is zeroed (geometry parsing does not validate it).
    */
  def pngPayload(w: Column, h: Column, body: Column): Column =
    concat(unhex(concat(
      lit("89504E470D0A1A0A"),           // signature
      lit("0000000D"),                   // IHDR length = 13
      lit("49484452"),                   // 'IHDR'
      beHex(w, 4), beHex(h, 4),          // width, height (BE int32)
      lit("0802000000"),                 // depth 8, color 2, comp/filter/interlace 0
      lit("00000000"))),                 // CRC (zeroed)
      body)

  /** A REAL WAV (RIFF) payload: canonical 44-byte PCM header — channels
    * and sample rate little-endian in the fmt chunk, `body` as the data
    * chunk.
    */
  def wavPayload(channels: Column, rate: Column, body: Column): Column =
    concat(unhex(concat(
      lit("52494646"),                   // 'RIFF'
      leHex(length(body) + 36, 4),       // riff size
      lit("57415645"), lit("666D7420"),  // 'WAVE' 'fmt '
      leHex(lit(16), 4),                 // fmt chunk size
      leHex(lit(1), 2),                  // PCM
      leHex(channels, 2),
      leHex(rate, 4),
      leHex(rate * channels * lit(2), 4), // byte rate (16-bit samples)
      leHex(channels * lit(2), 2),       // block align
      leHex(lit(16), 2),                 // bits per sample
      lit("64617461"),                   // 'data'
      leHex(length(body), 4))),          // data size
      body)

  /** Unsigned big-endian integer at a DYNAMIC (Column) byte offset —
    * the JPEG marker walk needs offsets computed per row.
    */
  private def beIntAt(payload: Column, off: Column, n: Int): Column =
    conv(hex(payload.substr(off, lit(n))), 16, 10).cast("long")

  /** A REAL JPEG prefix: SOI + APP0/JFIF + a baseline SOF0 frame header
    * (big-endian geometry, 8-bit, 3 components 4:2:0) — the segments
    * every baseline decoder reads before scan data; `body` stands in for
    * the entropy-coded stream.
    */
  def jpegPayload(w: Column, h: Column, body: Column): Column =
    concat(unhex(concat(
      lit("FFD8"),                       // SOI
      lit("FFE00010"),                   // APP0, length 16
      lit("4A46494600"),                 // 'JFIF\0'
      lit("0101"),                       // version 1.1
      lit("00"), lit("00010001"),        // units 0, density 1×1
      lit("0000"),                       // no thumbnail
      lit("FFC00011"),                   // SOF0, length 17
      lit("08"),                         // precision 8
      beHex(h, 2), beHex(w, 2),          // height, width (BE int16)
      lit("03"),                         // 3 components
      lit("012200"), lit("021101"), lit("031101"))), // Y 2x2, Cb, Cr
      body)

  /** MJPEG concatenated-frame split (native codegen'd kernel): one
    * (frame_no, off, len) row per complete SOI…EOI image in the stream.
    * Per-frame decode composes with [[decodeMeta]] on the substring —
    * multi-frame media reuses the whole single-image pipeline.
    */
  def mjpegFrames(payload: Column): Column =
    graft.GraftExtensions.mjpegFrames(payload)

  /** Deterministic MJPEG test clip: `frames` complete JPEGs back to
    * back, frame f carrying real [[jpegPayload]] headers with geometry
    * (w0+f) × (h0+f), then a real baseline SOS segment (FF DA, 3
    * components, 14 bytes — entropy data may only follow an SOS in a
    * well-formed stream, and the container walk relies on that), a
    * `bodyLen`-byte entropy body whose bytes follow
    * (seed·13 + f·31 + i·7) mod 0xF0 — never 0xFF, so no fake EOI can
    * appear inside a body — and a real EOI marker. Every frame's offset
    * and length are closed-form (headers are a fixed 39 + 14 = 53
    * bytes), so the container walk and the per-frame geometry decode
    * are both pinned against arithmetic, not against the builder's own
    * bytes.
    */
  def patternMjpeg(seed: Column, frames: Int, w0: Int, h0: Int,
                   bodyLen: Int): Column = {
    require(frames >= 1 && bodyLen >= 1)
    // SOS, length 12: 3 components (1,2,3) with table selectors, then
    // spectral selection 0..63, successive approximation 0.
    val sosHex = "FFDA000C03010002110311003F00"
    concat((0 until frames).flatMap { f =>
      val bodyHex = array_join(
        transform(sequence(lit(0), lit(bodyLen - 1)),
          i => lpad(hex(pmod(seed * 13 + f * 31 + i * 7, lit(0xF0))), 2, "0")),
        "")
      Seq(jpegPayload(lit(w0 + f), lit(h0 + f),
          unhex(concat(lit(sosHex), bodyHex))),
        unhex(lit("FFD9")))
    }: _*)
  }

  /** Offset (1-based) of the SOF0 marker, found by walking the segment
    * chain from just past SOI: each header segment is FF <marker>
    * <len16 including itself>, so the walk is a BOUNDED fold (`maxSeg`
    * steps — APP/COM/DQT/DHT headers come well before the frame header
    * in any real file) advancing pos → pos + 2 + len. 0 when absent;
    * the walk halts (−1) at SOS/EOI, a non-FF byte (corrupt chain), or
    * past-end offsets, so arbitrary binary can never yield garbage
    * geometry. Pure composed builtins — no UDF.
    */
  private def sof0Offset(payload: Column, maxSeg: Int = 12): Column = {
    val init = struct(lit(3L).as("pos"), lit(0L).as("sof"))
    val walked = aggregate(
      sequence(lit(1), lit(maxSeg)), init,
      (acc, _) => {
        val pos = acc.getField("pos")
        val mk = hex(payload.substr(pos, lit(2)))
        val halted = acc.getField("sof") > 0 || pos < 0
        val badChain = mk === "FFDA" || mk === "FFD9" ||
          !mk.startsWith("FF") || pos + 4 > length(payload)
        when(halted, acc)
          .when(mk === "FFC0",
            struct(pos.as("pos"), pos.as("sof")))
          .when(badChain,
            struct(lit(-1L).as("pos"), lit(0L).as("sof")))
          .otherwise(struct(
            (pos + 2 + beIntAt(payload, pos + 2, 2)).as("pos"),
            lit(0L).as("sof")))
      })
    walked.getField("sof")
  }

  /** REAL header decode — the engine's one former stub made honest for
    * genuine payloads: sniffs the magic bytes and parses the actual
    * format geometry (BMP: LE int32 at 19/23, height sign-extended per
    * spec; PNG: BE int32 in IHDR at 17/21; WAV: channels/sample-rate LE
    * in the fmt chunk — mapped to the width/height slots as the format's
    * two principal dimensions). Unrecognized payloads keep the
    * documented md5-derived stub dimensions, tagged 'unknown', so mixed
    * corpora degrade loudly rather than failing the scan.
    *
    * All of it is composed builtin expressions (substring/hex/conv) —
    * whole-stage-codegen'd map work, the same scan-speed shape as the
    * stub it upgrades; a full pixel decode would slot in AFTER this
    * prune (scan metadata first, decode only survivors).
    *
    * @return struct(format, width, height, n_bytes)
    */
  def decodeMeta(payload: Column): Column = {
    // 'BM' alone is two ASCII letters any text can start with — demand
    // the fixed header fields too (reserved bytes zero, plausible
    // pixel-data offset, plausible bpp) before taking the bmp branch, so
    // a raw text payload starting with "BMW ..." stays 'unknown'. The
    // offset is ≥ 54 and within the payload, not exactly 54: palettized
    // formats (bpp 1/4/8) carry a color table between the headers and
    // the pixel array, so their offset is 54 + table size.
    val isBmp = length(payload) >= 54 && hexAt(payload, 1, 2) === "424D" &&
      hexAt(payload, 7, 4) === "00000000" &&
      leInt(payload, 11, 4) >= 54 &&
      leInt(payload, 11, 4) <= length(payload) &&
      leInt(payload, 29, 2).isin(1L, 4L, 8L, 16L, 24L, 32L)
    val isPng = length(payload) >= 33 &&
      hexAt(payload, 1, 8) === "89504E470D0A1A0A" &&
      hexAt(payload, 13, 4) === "49484452"
    val isWav = length(payload) >= 44 &&
      hexAt(payload, 1, 4) === "52494646" &&
      hexAt(payload, 9, 4) === "57415645"
    val isJpeg = length(payload) >= 4 &&
      hexAt(payload, 1, 2) === "FFD8" && hexAt(payload, 3, 1) === "FF"
    val sof = sof0Offset(payload)
    // BMP height is SIGNED (negative = top-down row order): sign-extend
    // and report the magnitude-with-sign the spec means
    def signed32(v: Column): Column =
      when(v > 2147483647L, v - 4294967296L).otherwise(v)
    val fake = fakeDecodeMeta(payload)
    val meta = when(isBmp, struct(
        lit("bmp").as("format"),
        leInt(payload, 19, 4).as("width"),
        signed32(leInt(payload, 23, 4)).as("height")))
      .when(isPng, struct(
        lit("png").as("format"),
        beInt(payload, 17, 4).as("width"),
        beInt(payload, 21, 4).as("height")))
      .when(isWav, struct(
        lit("wav").as("format"),
        leInt(payload, 25, 4).as("width"),   // sample rate
        leInt(payload, 23, 2).as("height"))) // channels
      // SOF0 layout: FF C0 len16 precision8 height16 width16 ...
      .when(isJpeg && sof > 0, struct(
        lit("jpeg").as("format"),
        beIntAt(payload, sof + 7, 2).as("width"),
        beIntAt(payload, sof + 5, 2).as("height")))
      .otherwise(struct(
        lit("unknown").as("format"),
        fake.getField("width").cast("long").as("width"),
        fake.getField("height").cast("long").as("height")))
    struct(
      meta.getField("format").as("format"),
      meta.getField("width").as("width"),
      meta.getField("height").as("height"),
      length(payload).cast("long").as("n_bytes"))
  }

  /** Perceptual difference hash (dHash) over a 24-bpp BMP payload — REAL
    * pixel math on real bytes: geometry comes from the header (LE width/
    * height at 19/23, spec row stride = ceil(3w/4)·4, bottom-up row
    * order), a 9×8 grayscale grid is nearest-neighbor sampled from the
    * pixel array, and each of the 64 bits records whether gray(x,y) >
    * gray(x+1,y). Returned as a 16-hex string (row bytes MSB-first, top
    * row first).
    *
    * This is the canonical image near-dup key: invariant to uniform
    * brightness shifts (all comparisons preserved) and robust to small
    * local edits, while byte-level hashes (md5/crc) break under either.
    * Pure composed builtins over the payload — map-side, no UDF; at
    * corpus scale only the 16-char hash ever shuffles, exactly the
    * repeatedPassages contract. A full decoder pipeline would swap the
    * sampling arithmetic for a codec call with the SAME output column.
    *
    * Null for payloads that don't pass the BMP sniff, claim implausible
    * geometry (non-positive or > 2^24 px per side), or whose pixel array
    * is shorter than the header geometry claims (truncated file) — a
    * garbage-geometry hash must never enter a dedup key space.
    *
    * One fused native kernel per row ([[graft.expressions.Kernels
    * .dHashBmp]], codegen'd) — the composed-builtin spelling evaluated
    * ~500 interpreted HOF lambdas per row (the CdcChunks lesson); the
    * closed-form pixel-formula oracle pins that the kernel's byte
    * arithmetic (stride, row order, grid, bit order) is unchanged.
    */
  def dHashBmp(payload: Column): Column =
    graft.GraftExtensions.dhashBmp(payload)

  /** Perceptual dHash over a PNG payload — the same 9×8 grid / 64-bit /
    * 16-hex contract as [[dHashBmp]] on REAL decoded PNG pixels: chunk
    * walk, IDAT concatenation, zlib INFLATE, and per-scanline UNFILTER
    * (all five spec filter types) fused into one native codegen'd kernel
    * ([[graft.expressions.Kernels.dHashPng]]). PNG stores rows top-down
    * where BMP is bottom-up, so the same image in both containers hashes
    * identically — pinned by spec. Null on anything that fails the sniff,
    * claims unsupported depth/color/interlace, exceeds the 2^26 decode
    * budget (inflate-bomb guard — crawled corpora contain hostile
    * payloads), or carries truncated/corrupt chunks or zlib data.
    */
  def dHashPng(payload: Column): Column =
    graft.GraftExtensions.dhashPng(payload)

  /** Deterministic 24-bpp test image as a REAL compressed PNG: the same
    * closed-form pixel field as [[patternBmp]] (byte(x,y,ch) =
    * (seed·7 + y·29 + x·13 + ch·5) mod 192 + shift), rows stored
    * TOP-DOWN per the PNG spec, each scanline FILTERED with type
    * y mod 5 — an image with h ≥ 5 exercises all five spec filters
    * (None/Sub/Up/Average/Paeth), not just the type-0 copy. The
    * filtered stream rides a REAL zlib stream (0x78 0x01 header, one
    * final STORED deflate block, closed-form adler32 over the filtered
    * bytes — stored blocks are valid deflate, any inflater accepts
    * them) in a single IDAT chunk (CRC zeroed, the [[pngPayload]] IHDR
    * convention) followed by IEND. Pure hex assembly + one unhex.
    * Because the pixel field is shared with patternBmp, the SAME image
    * exists in both container formats and [[dHashBmp]]/[[dHashPng]]
    * must agree bit-for-bit.
    */
  def patternPng(seed: Column, w: Int, h: Int, shift: Int): Column = {
    require(shift >= 0 && shift <= 64,
      s"brightness shift $shift outside [0, 64] would overflow a byte")
    val rowLen = 3 * w + 1
    val n = h * rowLen
    require(n <= 65535, "fixture must fit one stored deflate block")
    // the raw pixel field once per image (each byte is pure closed-form
    // arithmetic), bound ONCE as a transform() lambda variable (the
    // boilerplateStrip let-binding idiom) so the filter pass reads
    // neighbors via O(1) element_at instead of re-deriving the formula
    // 4× per byte — the builder runs per corpus row, so per-byte
    // expression weight is the whole cost
    val rawArr = transform(sequence(lit(0), lit(3 * w * h - 1)), j => {
      val y = floor(j / (3 * w))
      val i = j % (3 * w)
      pmod(seed * 7 + y * 29 + floor(i / 3) * 13 + (i % 3) * 5,
        lit(192)) + shift
    })
    element_at(transform(array(rawArr), raw => {
      // element_at is 1-based
      def px(idx: Column): Column = element_at(raw, (idx + 1).cast("int"))
      // filtered byte at stream position k (scanline = filter byte +
      // 3w pixel bytes)
      val valsExpr = transform(sequence(lit(0), lit(n - 1)), k => {
        val y = floor(k / rowLen)
        val c = k % rowLen
        val i = c - 1
        val j = y * (3 * w) + i // raw index of the current byte
        val ftype = y % 5
        val cur = px(j)
        val left = when(i >= 3, px(j - 3)).otherwise(lit(0L))
        val up = when(y > 0, px(j - 3 * w)).otherwise(lit(0L))
        val ul = when(y > 0 && i >= 3, px(j - 3 * w - 3)).otherwise(lit(0L))
        val p = left + up - ul
        val pa = abs(p - left)
        val pb = abs(p - up)
        val pc = abs(p - ul)
        val paeth = when(pa <= pb && pa <= pc, left)
          .when(pb <= pc, up).otherwise(ul)
        val pred = when(ftype === 0, lit(0L))
          .when(ftype === 1, left)
          .when(ftype === 2, up)
          .when(ftype === 3, floor((left + up) / 2))
          .otherwise(paeth)
        when(c === 0, ftype).otherwise(pmod(cur - pred, lit(256)))
      })
      element_at(transform(array(valsExpr), vals => {
        val bodyHex = array_join(
          transform(vals, v => lpad(hex(v), 2, "0")), "")
        // adler32 of the filtered stream as ONE fold: per byte a += d,
        // b += a (a starts at 1); sums stay far below 2^63
        val ab = aggregate(vals,
          struct(lit(1L).as("a"), lit(0L).as("b")),
          (acc, v) => {
            val a2 = acc.getField("a") + v
            struct(a2.as("a"), (acc.getField("b") + a2).as("b"))
          })
        val a = pmod(ab.getField("a"), lit(65521L))
        val b = pmod(ab.getField("b"), lit(65521L))
        val zlibHex = concat(
          lit("7801"),          // zlib header (deflate, default window)
          lit("01"),            // BFINAL=1, BTYPE=00 (stored)
          leHex(lit(n), 2), leHex(lit(65535 - n), 2), // LEN, ~LEN
          bodyHex,
          beHex(b * 65536L + a, 4))
        val idatIendHex = concat(
          beHex(lit(n + 11), 4), // zlib stream length: 2+5+n+4
          lit("49444154"),       // 'IDAT'
          zlibHex,
          lit("00000000"),       // IDAT CRC (zeroed, not validated)
          lit("0000000049454E44AE426082")) // IEND (spec CRC constant)
        pngPayload(lit(w), lit(h), unhex(idatIendHex))
      }), 1)
    }), 1)
  }

  /** Deterministic 24-bpp test image: pixel channel bytes follow
    * byte(x, y, ch) = (seed·7 + y·29 + x·13 + ch·5) mod 192 (+ an
    * optional uniform `shift`, the brightness-invariance probe), rows
    * padded to the spec stride and stored bottom-up, wrapped in the real
    * [[bmpPayload]] header. Hex assembly + one unhex — the established
    * payload-builder shape; every byte position (padding included) is
    * pinned, so header-driven consumers like [[dHashBmp]] are exercised
    * against known ground truth.
    */
  def patternBmp(seed: Column, w: Int, h: Int, shift: Int): Column = {
    // pattern bytes live in [0, 191]; a shift outside [0, 64] would push
    // a byte out of [0, 255] and lpad(hex(b), 2) would silently TRUNCATE
    // the hex — corrupt pixels defeating the pinned-ground-truth contract
    require(shift >= 0 && shift <= 64,
      s"brightness shift $shift outside [0, 64] would overflow a byte")
    val stride = ((3 * w + 3) / 4) * 4
    val bodyHex = array_join(
      transform(sequence(lit(0), lit(h * stride - 1)), k => {
        val r = floor(k / stride)            // file row (bottom-up)
        val c = k % stride
        val y = lit(h - 1) - r               // image row
        val x = floor(c / 3)
        val b = pmod(seed * 7 + y * 29 + x * 13 + (c % 3) * 5, lit(192)) + shift
        when(c < 3 * w, lpad(hex(b), 2, "0")).otherwise(lit("00"))
      }), "")
    bmpPayload(lit(w), lit(h), unhex(bodyHex))
  }

  /** Deterministic 16-bit mono PCM test clip: sample k is
    * v(k) = ((seed·31 + k·17) mod 4001) − 2000, stored as little-endian
    * int16 in the data chunk of a real [[wavPayload]] RIFF container.
    * Hex assembly + one unhex (the [[patternBmp]] shape); every sample
    * byte is pinned by the closed form, so byte-level consumers like
    * [[pcmFrameFeatures]] are exercised against independent ground truth
    * (an endianness or sign slip in the parser cannot cancel against the
    * builder — the oracle recomputes features from the formula, not the
    * bytes).
    */
  def patternWav(seed: Column, nSamples: Int, rate: Column): Column = {
    val bodyHex = array_join(
      transform(sequence(lit(0), lit(nSamples - 1)), k => {
        val v = pmod(seed * 31 + k * 17, lit(4001)) - 2000
        leHex(pmod(v, lit(65536)), 2) // two's-complement LE int16
      }), "")
    wavPayload(lit(1), rate, unhex(bodyHex))
  }

  /** [[patternWav]] with an amplitude burst pattern: sample k is quiet
    * (v = ((seed·31 + k·17) mod 41) − 20) when its 64-sample frame index
    * satisfies (k div 64) mod 4 ∈ {1, 2}, loud (the patternWav formula)
    * otherwise — so frames alternate loud/quiet in runs of two, giving
    * silence-trim consumers real multi-frame spans to merge. Same
    * closed-form-pinned contract as patternWav: the oracle recomputes
    * everything from the formula, never the bytes.
    */
  def patternWavBursts(seed: Column, nSamples: Int, rate: Column): Column = {
    val bodyHex = array_join(
      transform(sequence(lit(0), lit(nSamples - 1)), k => {
        val quiet = pmod(floor(k / 64), lit(4)).isin(1, 2)
        val v = when(quiet, pmod(seed * 31 + k * 17, lit(41)) - 20)
          .otherwise(pmod(seed * 31 + k * 17, lit(4001)) - 2000)
        leHex(pmod(v, lit(65536)), 2) // two's-complement LE int16
      }), "")
    wavPayload(lit(1), rate, unhex(bodyHex))
  }

  /** Per-frame PCM features (RMS / peak / zero-crossing count) over a WAV
    * payload — REAL audio feature extraction on real bytes, the audio
    * counterpart of [[dHashBmp]]: the RIFF chunk chain is walked, mono
    * PCM16 is demanded, and consecutive non-overlapping `frameLen`-sample
    * frames each yield the three features every audio curation pipeline
    * filters on (silence ⇔ low RMS, clipping ⇔ peak at full scale,
    * noisiness ⇔ zero-crossing rate). One fused native kernel per row
    * ([[graft.expressions.Kernels.pcmFeatures]], codegen'd); null for
    * payloads that fail the WAV/PCM16 sniff. Map-side — at corpus scale
    * only the small feature rows ever shuffle, never payload bytes.
    *
    * @return array of struct(frame_no, rms, peak, zcr), 0-based frames
    */
  def pcmFrameFeatures(payload: Column, frameLen: Int): Column =
    graft.GraftExtensions.pcmFeatures(payload, frameLen)

  /** Feature-extraction stub over a decoded payload: byte-level stats a
    * real extractor would compute post-decode. Deterministic, map-side.
    */
  def payloadStats(payload: Column): Column =
    struct(
      length(payload).as("n_bytes"),
      crc32(payload).as("crc"),
      (length(payload) % 256).as("sample_byte_mod"))

  /** Frame sampling over a media payload — the video-style access pattern:
    * fixed-length frames at a fixed stride, each independently
    * fingerprinted. The slicing grid is computed per row from the payload
    * length (no shuffle, no UDF); a real video pipeline swaps the
    * fingerprint for a decoder call with the SAME offsets/batch shape.
    *
    * Frames are sliced from the source text and encoded to bytes per
    * frame (md5 over the frame's UTF-8 bytes ≙ md5 over a binary slice;
    * char-grid slicing keeps the DuckDB oracle expressible, which has no
    * blob substring).
    *
    * @return struct(n_frames, offsets array<int> 1-based, fingerprints
    *         array<string> 8-hex per frame)
    */
  def sampleFrames(text: Column, frameLen: Int, stride: Int): Column = {
    val n = length(text)
    val nFrames = when(n < frameLen, lit(0L))
      .otherwise(floor((n - frameLen) / stride) + 1)
    val offsets = when(nFrames > 0,
        transform(sequence(lit(0L), nFrames - 1), i => (i * stride + 1).cast("int")))
      .otherwise(array().cast("array<int>"))
    val fps = transform(offsets,
      off => substring(md5(encode(text.substr(off, lit(frameLen)), "UTF-8")), 1, 8))
    struct(nFrames.as("n_frames"), offsets.as("offsets"), fps.as("fingerprints"))
  }

  /** Resize planning stub: fit (w, h) into a square `box` preserving
    * aspect ratio, with centered letterbox padding — the geometry pass of
    * an image-resize stage, computed purely from metadata (a real decoder
    * consumes these numbers; the payload is never touched, so a resize
    * planning scan reads only the metadata columns). Round-half-up
    * spelled as floor(x + 0.5) so every engine agrees.
    */
  def resizeStub(w: Column, h: Column, box: Int): Column = {
    val s = lit(box.toDouble) / greatest(w, h).cast("double")
    val w2 = greatest(lit(1L), floor(w * s + 0.5))
    val h2 = greatest(lit(1L), floor(h * s + 0.5))
    struct(
      w2.as("w"), h2.as("h"),
      floor((lit(box) - w2) / lit(2)).as("pad_x"),
      floor((lit(box) - h2) / lit(2)).as("pad_y"),
      s.as("scale"))
  }

  /** Assemble the canonical multimodal row: id, payload, typed metadata.
    * Partition-friendly: metadata is a separate struct column so scans
    * that only filter on metadata never deserialize payload bytes (parquet
    * column pruning).
    */
  def toMultimodalRows(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val payload = asBinaryPayload(col(textCol))
    docs.select(
      col(idCol).as("media_id"),
      payload.as("payload"),
      fakeDecodeMeta(payload).as("meta"))
  }
}
