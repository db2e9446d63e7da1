package graft.codec

/** Prometheus text exposition format (version 0.0.4) — the scrape/push
  * wire: `name{label="value",…} value [timestamp_ms]` plus `# HELP` /
  * `# TYPE` comments. This is the INGEST side (the serve layer's
  * /federate implements the render side): a pushed or federated page
  * decodes to the same canonical WriteRequest both remote-write
  * generations resolve to, so the entire pipeline tail is shared.
  *
  * Hand-rolled line scanner, no regex in the hot path, loud
  * line-numbered errors (the repo's parser discipline). Reference for
  * the format rules: the Prometheus exposition-format spec — label
  * values escape `\\`, `\"`, `\n`; HELP text escapes `\\`, `\n`; values
  * are Go floats incl. `+Inf`/`-Inf`/`NaN`; the timestamp is optional
  * ms (absent → the receiver's time, `defaultTsMs`).
  */
object TextExposition {

  case class Decoded(request: Prompb.PWriteRequest,
                     metadata: Seq[WriteWire.PMetadata])

  /** OpenMetrics decode result — the classic pair plus the inline
    * exemplars the format carries on sample lines.
    */
  case class DecodedOm(request: Prompb.PWriteRequest,
                       metadata: Seq[WriteWire.PMetadata],
                       exemplars: Seq[WriteWire.PExemplarSeries])

  private def fail(lineNo: Int, msg: String): Nothing =
    throw new IllegalArgumentException(s"text format line $lineNo: $msg")

  /** The decimal float shape Go's exposition tokenizer admits (the
    * special Inf/NaN tokens are matched before this): optional sign,
    * digits with an optional fraction or a bare leading dot, optional
    * exponent. Notably EXCLUDES Java-isms `1d`/`1f`, hex floats,
    * `Infinity`, and whitespace-padded forms.
    */
  private val GoFloat =
    java.util.regex.Pattern.compile("""[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?""")

  private def isNameStart(c: Char) =
    c.isLetter || c == '_' || c == ':'
  private def isNameChar(c: Char) =
    c.isLetterOrDigit || c == '_' || c == ':'

  def decode(text: String, defaultTsMs: Long): Decoded = {
    val d = decodeAny(text, defaultTsMs, om = false)
    Decoded(d.request, d.metadata)
  }

  /** OpenMetrics 1.0 decode — the ecosystem's OTHER text wire, three
    * rules apart from 0.0.4: timestamps are SECONDS (a Go float,
    * converted to ms with the upstream parser's `int64(ts * 1000)`
    * truncation), the page MUST terminate with `# EOF` (a truncated
    * scrape is an error, not a short page), `# UNIT` metadata joins
    * HELP/TYPE, and a sample line may carry an inline exemplar:
    * `name{…} value [ts] # {exemplar_labels} exemplar_value [ts]`.
    */
  def decodeOpenMetrics(text: String, defaultTsMs: Long): DecodedOm =
    decodeAny(text, defaultTsMs, om = true)

  /** Is this series an OpenMetrics `_created` companion? (the creation
    * timestamp of its counter/histogram/summary family, exposed as a
    * sample whose VALUE is unix seconds) */
  def isCreatedSeries(ts: Prompb.PTimeSeries): Boolean =
    ts.labels.find(_.name == "__name__").exists(_.value.endsWith("_created"))

  /** CT-ZERO candidates from an OpenMetrics page — the text twin of
    * [[Prompb2.ctZeroSeries]]: for every `<family>_created` sample, a
    * synthetic zero at the creation instant for each matching
    * component series of the family present on the page
    * (`_total`/`_count`/`_sum`/`_bucket`/bare gauge-histogram name;
    * labels equal after dropping `le`/`quantile`) whose first sample
    * is strictly later. The RECEIVER still gates candidates through
    * its no-earlier-sample rule — this derives the spec shape only.
    */
  def ctZeroSeries(req: Prompb.PWriteRequest): Seq[Prompb.PTimeSeries] = {
    def name(ts: Prompb.PTimeSeries): String =
      ts.labels.find(_.name == "__name__").map(_.value).getOrElse("")
    def ident(ts: Prompb.PTimeSeries): Seq[(String, String)] =
      ts.labels.filterNot(l => l.name == "__name__" || l.name == "le" ||
        l.name == "quantile").map(l => l.name -> l.value).sortBy(_._1)
    req.timeseries.filter(ts => isCreatedSeries(ts) && ts.samples.nonEmpty)
      .flatMap { c =>
        val base = name(c).stripSuffix("_created")
        val ctMs = (c.samples.head.value * 1000.0).toLong
        val cId = ident(c)
        req.timeseries.filter { ts =>
          val n = name(ts)
          (n == base + "_total" || n == base + "_count" ||
            n == base + "_sum" || n == base + "_bucket" || n == base) &&
            ts.samples.nonEmpty && ident(ts) == cId
        }.flatMap { ts =>
          if (ctMs > 0L && ctMs < ts.samples.map(_.timestampMs).min)
            Some(Prompb.PTimeSeries(ts.labels,
              Seq(Prompb.PSample(0.0, ctMs))))
          else None
        }
      }
  }

  private def decodeAny(text: String, defaultTsMs: Long,
                        om: Boolean): DecodedOm = {
    val series = scala.collection.mutable.LinkedHashMap
      .empty[Seq[Prompb.PLabel], scala.collection.mutable.ArrayBuffer[Prompb.PSample]]
    val exemplars = scala.collection.mutable.LinkedHashMap
      .empty[Seq[Prompb.PLabel], scala.collection.mutable.ArrayBuffer[WriteWire.PExemplar]]
    // family → (type, help, unit); any third may arrive first
    val meta = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, String, String)]
    var lineNo = 0
    var sawEof = false
    text.split("\n", -1).foreach { rawLine =>
      lineNo += 1
      val line = rawLine.stripSuffix("\r")
      // whitespace-only lines are as empty as empty ones (real
      // exporters emit both)
      if (line.exists(c => c != ' ' && c != '\t')) {
        if (sawEof) fail(lineNo, "content after # EOF")
        if (line.startsWith("#")) {
          if (om && line == "# EOF") sawEof = true
          else parseComment(line, lineNo, om, meta)
        } else {
          val (labels, value, tsMs, ex) =
            parseSample(line, lineNo, defaultTsMs, om)
          series.getOrElseUpdate(labels,
            scala.collection.mutable.ArrayBuffer.empty) +=
            Prompb.PSample(value, tsMs)
          ex.foreach(e => exemplars.getOrElseUpdate(labels,
            scala.collection.mutable.ArrayBuffer.empty) += e)
        }
      }
    }
    if (om && !sawEof) fail(lineNo, "missing # EOF terminator")
    DecodedOm(
      Prompb.PWriteRequest(series.toSeq.map { case (ls, ss) =>
        Prompb.PTimeSeries(ls, ss.toSeq)
      }),
      meta.toSeq.map { case (fam, (typ, help, unit)) =>
        WriteWire.PMetadata(fam, typ, help, unit)
      },
      exemplars.toSeq.map { case (ls, es) =>
        WriteWire.PExemplarSeries(ls, es.toSeq)
      })
  }

  /** `# HELP <name> <text>` / `# TYPE <name> <type>` (+ `# UNIT <name>
    * <unit>` in OpenMetrics); any other comment is ignored (the spec's
    * contract). */
  private def parseComment(line: String, lineNo: Int, om: Boolean,
      meta: scala.collection.mutable.LinkedHashMap[String, (String, String, String)])
      : Unit = {
    val body = line.drop(1).dropWhile(_ == ' ')
    val kw = body.takeWhile(_ != ' ')
    if (kw == "HELP" || kw == "TYPE" || (om && kw == "UNIT")) {
      val rest = body.drop(kw.length).dropWhile(_ == ' ')
      val name = rest.takeWhile(_ != ' ')
      if (name.isEmpty) fail(lineNo, s"# $kw needs a metric name")
      val payload = rest.drop(name.length).dropWhile(_ == ' ')
      val cur = meta.getOrElse(name, ("", "", ""))
      kw match {
        case "TYPE" => meta(name) = (payload, cur._2, cur._3)
        case "HELP" => meta(name) = (cur._1, unescapeHelp(payload), cur._3)
        case _ => meta(name) = (cur._1, cur._2, payload)
      }
    }
  }

  private def unescapeHelp(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => out += '\n'; i += 2
          case '\\' => out += '\\'; i += 2
          case other => out += '\\'; out += other; i += 2
        }
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** A double-quoted string starting at `start` (which must index the
    * opening quote) with the exposition escapes; returns (decoded,
    * index past the closing quote). */
  private def parseQuoted(line: String, lineNo: Int,
                          start: Int): (String, Int) = {
    var i = start + 1
    val v = new StringBuilder
    var closed = false
    while (!closed) {
      if (i >= line.length) fail(lineNo, "unterminated quoted string")
      line(i) match {
        case '"' => closed = true; i += 1
        case '\\' =>
          if (i + 1 >= line.length)
            fail(lineNo, "dangling escape in quoted string")
          line(i + 1) match {
            case 'n' => v += '\n'
            case '"' => v += '"'
            case '\\' => v += '\\'
            case other => fail(lineNo, s"bad escape '\\$other'")
          }
          i += 2
        case c => v += c; i += 1
      }
    }
    (v.result(), i)
  }

  /** `{label="v",…}` starting at `start` (which must index the `{`):
    * appends decoded labels to `labels` (duplicate names refused) and
    * returns the index just past the closing brace.
    *
    * Prometheus 3 UTF-8 syntax rides the same block: a QUOTED label
    * name (`{"my.label"="v"}`), and a bare quoted string as the metric
    * name itself (`{"my.metric", job="x"}` ⇒ __name__) — the text
    * forms of the PromQL quoted-selector syntax, so what the exposition
    * ingests the query language can select.
    */
  private def parseLabelBlock(line: String, lineNo: Int, start: Int,
      labels: scala.collection.mutable.ArrayBuffer[Prompb.PLabel]): Int = {
    var i = start + 1
    def skipSpace(): Unit =
      while (i < line.length && (line(i) == ' ' || line(i) == '\t')) i += 1
    def addLabel(lname: String, value: String): Unit = {
      if (labels.exists(_.name == lname))
        fail(lineNo, s"duplicate label name '$lname'")
      labels += Prompb.PLabel(lname, value)
    }
    var first = true
    var open = true
    while (open) {
      skipSpace()
      if (i >= line.length) fail(lineNo, "unterminated label set")
      if (line(i) == '}') { i += 1; open = false }
      else {
        if (!first) {
          if (line(i) != ',') fail(lineNo, "',' expected between labels")
          i += 1; skipSpace()
          // trailing comma before the brace is legal
          if (i < line.length && line(i) == '}') { i += 1; open = false }
        }
        if (open) {
          val lname =
            if (i < line.length && line(i) == '"') {
              val (str, ni) = parseQuoted(line, lineNo, i)
              i = ni; skipSpace()
              if (i >= line.length || line(i) != '=') {
                // bare quoted string = the metric name (UTF-8 form)
                addLabel("__name__", str)
                first = false
                null
              } else str
            } else {
              val ks = i
              if (i >= line.length || !isNameStart(line(i)))
                fail(lineNo, "label name expected")
              while (i < line.length && isNameChar(line(i))) i += 1
              line.substring(ks, i)
            }
          if (lname != null) {
            skipSpace()
            if (i >= line.length || line(i) != '=')
              fail(lineNo, s"'=' expected after label '$lname'")
            i += 1; skipSpace()
            if (i >= line.length || line(i) != '"')
              fail(lineNo, s"quoted value expected for label '$lname'")
            val (value, ni) = parseQuoted(line, lineNo, i)
            i = ni
            addLabel(lname, value)
            first = false
          }
        }
      }
    }
    i
  }

  private def parseValue(tok: String, lineNo: Int): Double = tok match {
    case "+Inf" | "Inf" => Double.PositiveInfinity
    case "-Inf" => Double.NegativeInfinity
    case "NaN" => Double.NaN
    case t =>
      // Go's strconv float shape only: Java's parseDouble additionally
      // accepts 'd'/'f' suffixes, hex floats, 'Infinity', and padded
      // forms — all of which the exposition format rejects, and a
      // malformed page must fail with a line number, not ingest
      if (!GoFloat.matcher(t).matches())
        fail(lineNo, s"malformed value '$t'")
      try t.toDouble
      catch { case _: NumberFormatException =>
        fail(lineNo, s"malformed value '$t'") }
  }

  /** One sample line → (sorted labels incl. __name__, value, ts ms,
    * inline exemplar). Classic mode: the timestamp is integer ms, no
    * exemplar. OpenMetrics mode: the timestamp is float SECONDS
    * (truncated to ms the way the upstream parser does), and a ` # `
    * separator may introduce an exemplar. */
  private def parseSample(line: String, lineNo: Int, defaultTsMs: Long,
                          om: Boolean)
      : (Seq[Prompb.PLabel], Double, Long, Option[WriteWire.PExemplar]) = {
    var i = 0
    def skipSpace(): Unit =
      while (i < line.length && (line(i) == ' ' || line(i) == '\t')) i += 1
    def token(): String = {
      val s = i
      while (i < line.length && line(i) != ' ' && line(i) != '\t') i += 1
      line.substring(s, i)
    }
    def omTsMs(tok: String): Long = {
      val sec = parseValue(tok, lineNo)
      // the upstream OM parser rejects non-finite timestamps — reusing
      // the value parser would otherwise silently turn 'NaN'/'±Inf'
      // into 0 / Long.MaxValue / Long.MinValue samples
      if (java.lang.Double.isNaN(sec) ||
          java.lang.Double.isInfinite(sec))
        fail(lineNo, s"invalid timestamp $tok")
      // and bound the seconds so the ms truncation below cannot wrap:
      // ±2^53 s is already ~285 My past any representable scrape time
      if (math.abs(sec) > 9.007199254740992e15)
        fail(lineNo, s"timestamp out of range $tok")
      // upstream openmetrics parser: int64(ts * 1000) — truncation
      (sec * 1000.0).toLong
    }
    val labels = scala.collection.mutable.ArrayBuffer.empty[Prompb.PLabel]
    if (line(0) == '{') {
      // Prometheus 3 UTF-8 form: the metric name rides INSIDE the
      // braces as a bare quoted string
      i = parseLabelBlock(line, lineNo, 0, labels)
      if (!labels.exists(_.name == "__name__"))
        fail(lineNo, "metric name expected")
      skipSpace()
    } else {
      if (!isNameStart(line(0))) fail(lineNo, "metric name expected")
      while (i < line.length && isNameChar(line(i))) i += 1
      labels += Prompb.PLabel("__name__", line.substring(0, i))
      skipSpace()
      if (i < line.length && line(i) == '{') {
        i = parseLabelBlock(line, lineNo, i, labels)
        skipSpace()
      }
    }
    if (i >= line.length) fail(lineNo, "sample value expected")
    val value = parseValue(token(), lineNo)
    skipSpace()
    if (!om) {
      val tsMs =
        if (i >= line.length) defaultTsMs
        else {
          val ts = token()
          try ts.toLong
          catch { case _: NumberFormatException =>
            fail(lineNo, s"malformed timestamp '$ts'") }
        }
      (labels.toSeq.sortBy(_.name), value, tsMs, None)
    } else {
      val tsMs =
        if (i >= line.length || line(i) == '#') defaultTsMs
        else omTsMs(token())
      skipSpace()
      val exemplar =
        if (i >= line.length) None
        else {
          if (line(i) != '#') fail(lineNo, "'#' or line end expected")
          i += 1; skipSpace()
          if (i >= line.length || line(i) != '{')
            fail(lineNo, "exemplar label set expected after '#'")
          val exLabels = scala.collection.mutable.ArrayBuffer
            .empty[Prompb.PLabel]
          i = parseLabelBlock(line, lineNo, i, exLabels)
          skipSpace()
          if (i >= line.length) fail(lineNo, "exemplar value expected")
          val exValue = parseValue(token(), lineNo)
          skipSpace()
          val exTsMs = if (i >= line.length) tsMs else omTsMs(token())
          Some(WriteWire.PExemplar(exLabels.toSeq.sortBy(_.name),
            exValue, exTsMs))
        }
      (labels.toSeq.sortBy(_.name), value, tsMs, exemplar)
    }
  }
}
