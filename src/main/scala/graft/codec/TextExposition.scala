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
    val series = scala.collection.mutable.LinkedHashMap
      .empty[Seq[Prompb.PLabel], scala.collection.mutable.ArrayBuffer[Prompb.PSample]]
    // family → (type, help); either half may arrive first
    val meta = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, String)]
    var lineNo = 0
    text.split("\n", -1).foreach { rawLine =>
      lineNo += 1
      val line = rawLine.stripSuffix("\r")
      // whitespace-only lines are as empty as empty ones (real
      // exporters emit both)
      if (line.exists(c => c != ' ' && c != '\t')) {
        if (line.startsWith("#")) parseComment(line, lineNo, meta)
        else {
          val (labels, value, tsMs) = parseSample(line, lineNo, defaultTsMs)
          series.getOrElseUpdate(labels,
            scala.collection.mutable.ArrayBuffer.empty) +=
            Prompb.PSample(value, tsMs)
        }
      }
    }
    Decoded(
      Prompb.PWriteRequest(series.toSeq.map { case (ls, ss) =>
        Prompb.PTimeSeries(ls, ss.toSeq)
      }),
      meta.toSeq.map { case (fam, (typ, help)) =>
        WriteWire.PMetadata(fam, typ, help, "")
      })
  }

  /** `# HELP <name> <text>` / `# TYPE <name> <type>`; any other comment
    * is ignored (the spec's contract). */
  private def parseComment(line: String, lineNo: Int,
      meta: scala.collection.mutable.LinkedHashMap[String, (String, String)])
      : Unit = {
    val body = line.drop(1).dropWhile(_ == ' ')
    val kw = body.takeWhile(_ != ' ')
    if (kw == "HELP" || kw == "TYPE") {
      val rest = body.drop(kw.length).dropWhile(_ == ' ')
      val name = rest.takeWhile(_ != ' ')
      if (name.isEmpty) fail(lineNo, s"# $kw needs a metric name")
      val payload = rest.drop(name.length).dropWhile(_ == ' ')
      val cur = meta.getOrElse(name, ("", ""))
      if (kw == "TYPE") meta(name) = (payload, cur._2)
      else meta(name) = (cur._1, unescapeHelp(payload))
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

  /** One sample line → (sorted labels incl. __name__, value, ts ms). */
  private def parseSample(line: String, lineNo: Int,
                          defaultTsMs: Long)
      : (Seq[Prompb.PLabel], Double, Long) = {
    var i = 0
    def skipSpace(): Unit =
      while (i < line.length && (line(i) == ' ' || line(i) == '\t')) i += 1
    if (!isNameStart(line(0))) fail(lineNo, "metric name expected")
    while (i < line.length && isNameChar(line(i))) i += 1
    val name = line.substring(0, i)
    val labels = scala.collection.mutable.ArrayBuffer(
      Prompb.PLabel("__name__", name))
    skipSpace()
    if (i < line.length && line(i) == '{') {
      i += 1
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
            val ks = i
            if (i >= line.length || !isNameStart(line(i)))
              fail(lineNo, "label name expected")
            while (i < line.length && isNameChar(line(i))) i += 1
            val lname = line.substring(ks, i)
            skipSpace()
            if (i >= line.length || line(i) != '=')
              fail(lineNo, s"'=' expected after label '$lname'")
            i += 1; skipSpace()
            if (i >= line.length || line(i) != '"')
              fail(lineNo, s"quoted value expected for label '$lname'")
            i += 1
            val v = new StringBuilder
            var closed = false
            while (!closed) {
              if (i >= line.length) fail(lineNo, "unterminated label value")
              line(i) match {
                case '"' => closed = true; i += 1
                case '\\' =>
                  if (i + 1 >= line.length)
                    fail(lineNo, "dangling escape in label value")
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
            if (labels.exists(_.name == lname))
              fail(lineNo, s"duplicate label name '$lname'")
            labels += Prompb.PLabel(lname, v.result())
            first = false
          }
        }
      }
      skipSpace()
    }
    if (i >= line.length) fail(lineNo, "sample value expected")
    val vs = i
    while (i < line.length && line(i) != ' ' && line(i) != '\t') i += 1
    val valueTok = line.substring(vs, i)
    val value = valueTok match {
      case "+Inf" | "Inf" => Double.PositiveInfinity
      case "-Inf" => Double.NegativeInfinity
      case "NaN" => Double.NaN
      case tok =>
        // Go's strconv float shape only: Java's parseDouble additionally
        // accepts 'd'/'f' suffixes, hex floats, 'Infinity', and padded
        // forms — all of which the exposition format rejects, and a
        // malformed page must fail with a line number, not ingest
        if (!GoFloat.matcher(tok).matches())
          fail(lineNo, s"malformed value '$tok'")
        try tok.toDouble
        catch { case _: NumberFormatException =>
          fail(lineNo, s"malformed value '$tok'") }
    }
    skipSpace()
    val tsMs =
      if (i >= line.length) defaultTsMs
      else {
        val ts = line.substring(i).takeWhile(c => c != ' ' && c != '\t')
        try ts.toLong
        catch { case _: NumberFormatException =>
          fail(lineNo, s"malformed timestamp '$ts'") }
      }
    (labels.toSeq.sortBy(_.name), value, tsMs)
  }
}
