package org.apache.spark.sql.graft

import graft.expressions.Kernels
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-pipeline expressions (same placement rationale as
  * `CodecExpressions`).
  */

/** Content-defined chunking as ONE codegen'd expression: the whole
  * rolling-window pass (window md5s, boundary test, cut, chunk md5s)
  * runs in a single kernel eval per document with one reused
  * MessageDigest. The composed higher-order-function spelling evaluated
  * its lambda per window INTERPRETED — a fresh digest instance and
  * UTF8String per window — and was the most expensive entry in the
  * whole bench (~6× this kernel). Semantics unchanged; the DuckDB
  * oracle still pins them.
  */
case class CdcChunks(child: Expression, w: Int, divisor: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1 && divisor >= 1)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = CdcChunks.Schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.cdcChunks(input.asInstanceOf[UTF8String], w, divisor)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Kernels.cdcChunks($c, $w, $divisor)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("chunk_no", IntegerType, nullable = false),
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", StringType, nullable = false))),
    containsNull = false)
}

/** Perceptual BMP dHash as a native codegen'd expression — one fused
  * byte-loop kernel per row instead of ~500 interpreted higher-order-
  * function lambda evaluations (the CdcChunks rationale). Nullable:
  * non-BMP, implausible-geometry, and truncated payloads hash to null
  * (a garbage hash must never enter a dedup key space), so codegen goes
  * through `nullSafeCodeGen` like the vector kernels.
  */
case class DHashBmp(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dhash_bmp"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.dHashBmp(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("res")
      s"""
         |UTF8String $r = graft.expressions.Kernels.dHashBmp($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): DHashBmp =
    copy(child = newChild)
}

/** Perceptual PNG dHash as a native codegen'd expression — the PNG
  * sibling of [[DHashBmp]]: chunk walk, zlib inflate, per-scanline
  * unfilter (all five spec filter types), and the shared 9×8 gray-grid
  * hash fuse into one kernel eval per row. Same nullability contract:
  * non-PNG, unsupported-format, bomb-sized, truncated, and corrupt
  * payloads hash to null.
  */
case class DHashPng(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dhash_png"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.dHashPng(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("res")
      s"""
         |UTF8String $r = graft.expressions.Kernels.dHashPng($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): DHashPng =
    copy(child = newChild)
}

/** Raw-deflate compressed length as a native codegen'd expression — the
  * primitive under the compression-ratio text-quality signal. A Scala
  * UDF would break whole-stage codegen at a site that runs once per
  * document over the full corpus; the kernel allocates one Deflater per
  * eval and nothing else.
  */
case class DeflateLen(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_len"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.deflateLen(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.deflateLen($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

/** Per-frame PCM audio features (RMS / peak / zero-crossings) over a WAV
  * payload as ONE codegen'd kernel eval per row — the audio sibling of
  * [[DHashBmp]]: the RIFF chunk walk, sample decode, and the three
  * per-frame folds fuse into a single byte loop instead of thousands of
  * interpreted higher-order-function lambdas per payload. Nullable:
  * non-WAV and non-PCM16 payloads yield null (the DHashBmp rationale —
  * garbage features must never enter a filter threshold).
  */
case class PcmFrameFeatures(child: Expression, frameLen: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(frameLen >= 1)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = PcmFrameFeatures.Schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pcm_features"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.pcmFeatures(input.asInstanceOf[Array[Byte]], frameLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.Kernels.pcmFeatures($c, $frameLen);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): PcmFrameFeatures =
    copy(child = newChild)
}

object PcmFrameFeatures {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("frame_no", IntegerType, nullable = false),
    StructField("rms", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("zcr", IntegerType, nullable = false))),
    containsNull = false)
}

/** MJPEG concatenated-frame split as a native codegen'd expression —
  * the video sibling of [[PcmFrameFeatures]]: one byte walk per row
  * yields (frame_no, off, len) rows; per-frame decode then reuses the
  * single-image path on the substring. Null for streams that don't
  * start at SOI or whose EOI chain is broken.
  */
case class MjpegFrames(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = MjpegFrames.Schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mjpeg_frames"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.mjpegFrames(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.Kernels.mjpegFrames($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): MjpegFrames =
    copy(child = newChild)
}

object MjpegFrames {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("frame_no", IntegerType, nullable = false),
    StructField("off", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false))),
    containsNull = false)
}

/** WARC container split as a native codegen'd expression — the crawl
  * sibling of [[MjpegFrames]]: one byte walk per archive yields
  * (rec_no, off, len, content_off, content_len, warc_type, target_uri)
  * rows; per-record extraction then substrings the content out of the
  * archive payload. Null for payloads that aren't well-formed WARC.
  */
case class WarcRecords(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = WarcRecords.Schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "warc_records"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.warcRecords(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.Kernels.warcRecords($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

object WarcRecords {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("rec_no", IntegerType, nullable = false),
    StructField("off", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("content_off", IntegerType, nullable = false),
    StructField("content_len", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("payload_digest", StringType, nullable = true),
    StructField("profile", StringType, nullable = true))),
    containsNull = false)
}

/** HTTP payload normalization as a native codegen'd expression —
  * header strip + `Content-Encoding` reversal (gzip, zlib/raw
  * deflate) + declared-charset transcode to UTF-8 bytes; the stage
  * between the WARC record substring and [[HtmlText]] that real
  * (mostly compressed, mixed-charset) archives need. Lenient: a body
  * that fails to decode passes through unchanged.
  */
case class HttpBody(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "http_body"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.httpBodyUtf8(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Kernels.httpBodyUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): HttpBody =
    copy(child = newChild)
}

/** Multi-member gzip inflate as a native codegen'd expression — the
  * decompression front of the `.warc.gz` ingest path (each record its
  * own gzip member, back to back). Null for corrupt or non-gzip
  * payloads.
  */
case class GunzipAll(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gunzip_all"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.gunzipAll(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("res")
      s"""
         |byte[] $r = graft.expressions.Kernels.gunzipAll($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): GunzipAll =
    copy(child = newChild)
}

/** HTML→text extraction as a native codegen'd expression: HTTP-header
  * strip, script/style/comment removal, tag→line-break replacement,
  * entity decode, line trim — the crawl funnel's first text stage,
  * lenient by design (best-effort text, never a refusal).
  */
case class HtmlText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_text"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.htmlText(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Kernels.htmlText($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

/** Outbound-link extraction as a native codegen'd expression — the
  * link-graph sibling of [[HtmlText]]: one markup walk per response
  * record yields the anchor hrefs in document order (raw, entity-
  * decoded; resolution and policy filtering live in
  * `CrawlOps.resolveUrl`). Always an array (possibly empty) for
  * non-null input, so it composes with `posexplode` without a null
  * guard.
  */
case class HtmlLinks(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_links"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.htmlLinks(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Kernels.htmlLinks($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlLinks =
    copy(child = newChild)
}

/** robots.txt group selection + rule extraction (RFC 9309) as a native
  * codegen'd expression — the crawl-compliance front of the frontier:
  * one parse per (host, robots.txt) row yields the (allow, pattern)
  * rules applying to the crawler's product token (a plan-time
  * constant, the [[CdcChunks]] parameter convention). Nullable: a
  * null fetch refuses — the FETCH-ERROR policy belongs to the caller,
  * not the parser.
  */
case class RobotsRules(child: Expression, agent: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(agent.nonEmpty, "need a crawler product token")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = RobotsRules.Schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "robots_rules"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.robotsRules(input.asInstanceOf[UTF8String], agent)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.Kernels.robotsRules($c, $a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): RobotsRules =
    copy(child = newChild)
}

object RobotsRules {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("allow", org.apache.spark.sql.types.BooleanType,
      nullable = false),
    StructField("pattern", StringType, nullable = false))),
    containsNull = false)
}

/** `Crawl-delay` seconds under [[RobotsRules]]' group selection (−1 =
  * none declared; the de-facto politeness field), as a native
  * codegen'd expression — one parse per (host, robots.txt) row.
  */
case class RobotsCrawlDelay(child: Expression, agent: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(agent.nonEmpty, "need a crawler product token")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "robots_crawl_delay"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.robotsCrawlDelay(input.asInstanceOf[UTF8String], agent)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Kernels.robotsCrawlDelay($c, $a)")
  }
  override protected def withNewChildInternal(newChild: Expression): RobotsCrawlDelay =
    copy(child = newChild)
}

/** RFC 9309 path-pattern match length (`*` wildcards, terminal `$`
  * anchor; −1 = no match, else the pattern's length = the rule's
  * longest-match specificity) as a native codegen'd expression — one
  * eval per (frontier URL, rule) pair, the hot cell of the compliance
  * join.
  */
case class RobotsMatchLen(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "robots_match_len"
  override protected def nullSafeEval(path: Any, pattern: Any): Any =
    Kernels.robotsMatchLen(path.asInstanceOf[UTF8String],
      pattern.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, q) => s"graft.expressions.Kernels.robotsMatchLen($p, $q)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsMatchLen =
    copy(left = newLeft, right = newRight)
}

/** Unigram-LM E-step (forward-backward expected piece counts +
  * log-likelihood) for one word as a native codegen'd expression. The
  * model (piece inventory + log-probs) is a plan-time constant: it
  * rides to executors via the codegen references array
  * (`addReferenceObj`) — the Catalyst idiom for model-sized state a
  * kernel needs per row, the same role the centroid literals play in
  * the k-means expressions but without re-parsing an array literal per
  * row. Fixed-point output makes the distributed M-step sum exact (see
  * the kernel doc).
  */
case class UnigramExpected(child: Expression, pieces: Seq[String],
    logps: Seq[Double], scale: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(pieces.length == logps.length && pieces.nonEmpty && scale >= 1)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = UnigramExpected.Schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_expected"
  @transient private lazy val model =
    new graft.expressions.UnigramModel(pieces.toArray, logps.toArray)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.unigramExpected(input.asInstanceOf[UTF8String], model, scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model,
      classOf[graft.expressions.UnigramModel].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Kernels.unigramExpected($c, $m, ${scale}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramExpected =
    copy(child = newChild)
}

object UnigramExpected {
  val Schema: DataType = StructType(Seq(
    StructField("ll", org.apache.spark.sql.types.DoubleType, nullable = false),
    StructField("exp", ArrayType(StructType(Seq(
      StructField("idx", IntegerType, nullable = false),
      StructField("fx", org.apache.spark.sql.types.LongType, nullable = false))),
      containsNull = false), nullable = false)))
}

/** Viterbi unigram-LM segmentation for one word (model via the same
  * references-array mechanism as [[UnigramExpected]]). Nullable: a word
  * with no path through the vocabulary refuses rather than mangles.
  */
case class UnigramSegment(child: Expression, pieces: Seq[String],
    logps: Seq[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(pieces.length == logps.length && pieces.nonEmpty)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_segment"
  @transient private lazy val model =
    new graft.expressions.UnigramModel(pieces.toArray, logps.toArray)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.unigramViterbi(input.asInstanceOf[UTF8String], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("unigramModel", model,
      classOf[graft.expressions.UnigramModel].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.expressions.Kernels.unigramViterbi($c, $m);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

/** Unicode NFC normalization as a native codegen'd expression. Spark has
  * no normalization builtin; the alternative — a Scala UDF around
  * `java.text.Normalizer` — would break whole-stage codegen at every
  * call site of the text-cleanup pipeline's first pass. The kernel keeps
  * the JDK's `isNormalized` fast path, so already-clean (notably
  * all-ASCII) rows pay one scan and zero allocations.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.nfcNormalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Kernels.nfcNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Multi-pattern substring count via a frozen Aho–Corasick automaton —
  * the blocklist screen at blocklist scale. The automaton is built once
  * on the driver from the literal pattern list and ships to executors
  * through the codegen references array (the [[UnigramExpected]] model
  * mechanism); each row then pays one O(len) pass counting every
  * occurrence of every pattern, where a regex alternation or
  * per-pattern contains() is O(len × patterns). Case-sensitive, counts
  * overlapping matches (classic AC semantics).
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "need non-empty patterns")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "multi_pattern_count"
  @transient private lazy val ac =
    graft.expressions.AhoCorasick.build(patterns)
  override protected def nullSafeEval(input: Any): Any =
    Kernels.acCount(input.asInstanceOf[UTF8String], ac)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = ctx.addReferenceObj("acAutomaton", ac,
      classOf[graft.expressions.AhoCorasick].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Kernels.acCount($c, $a)")
  }
  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

/** Winnowing fingerprint selection as ONE codegen'd kernel eval per row
  * (hash + window-minimum + dedup fused; see [[Kernels.winnow]]). The
  * HOF spelling it replaces paid thousands of interpreted lambda
  * evaluations per document — k-gram md5s through string slicing and an
  * O(nk·w) aggregate() window fold; the kernel hashes each k-gram as a
  * raw byte range of the text and runs the monotonic-deque window in
  * O(nk). k and w are compile-time plan parameters (the pcm_features
  * convention).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = WinnowFingerprints.Schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"
  override protected def nullSafeEval(input: Any): Any =
    Kernels.winnow(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Kernels.winnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  val Schema: DataType = ArrayType(StructType(Seq(
    StructField("h", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
}
