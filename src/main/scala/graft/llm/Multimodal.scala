package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads travel as opaque `binary`
  * columns with a typed metadata struct beside them — the standard layout
  * for image/audio/video in a parquet-backed training-data lake (the bytes
  * stay out of every shuffle that doesn't need them; metadata predicates
  * prune without touching payloads).
  *
  * The decode step is a STUB by design: real image/audio codecs aren't in
  * this environment, so `fakeDecodeMeta` derives deterministic pseudo
  * dimensions from a content hash. Everything around it — the schema, the
  * binary column plumbing, column pruning, the batch shape — is real and
  * is what a production decoder (mapPartitions over a JNI codec, or
  * mapInArrow into a Python worker) would slot into.
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
