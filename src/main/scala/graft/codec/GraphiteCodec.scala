package graft.codec

import org.apache.spark.sql.Column

/** E7/E8: Graphite metric-path encoding
  * (reference: graphite/escape.go:82-103, graphite/client.go:53-80).
  *
  * Byte-level percent-encoding — no Spark built-in walks UTF-8 bytes.
  * The Scala functions here are the canonical semantics (golden-tested
  * against the reference's own test vectors); the Column API plans them
  * as native codegen'd Catalyst expressions (graft.expressions) rather
  * than UDFs, so the encode stays inside whole-stage codegen.
  */
object GraphiteCodec {

  private val Symbols = "(){},='\".\\"

  /** escape: reserved bytes (`. % / =`) and non-printables percent-encode
    * as %X (uppercase, unpadded — exactly the reference's `%%%X` verb);
    * Graphite grammar symbols get a backslash prefix; printable ASCII
    * passes through. Operates on UTF-8 BYTES: multi-byte runes become one
    * %XX per byte (reference: graphite/escape.go:82-103).
    */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.getBytes("UTF-8").foreach { byte =>
      val b = byte & 0xFF
      if (b == '.' || b == '%' || b == '/' || b == '=')
        sb.append('%').append(Integer.toHexString(b).toUpperCase)
      else if (b < 0x80 && Symbols.indexOf(b.toChar) >= 0)
        sb.append('\\').append(b.toChar)
      else if (b >= 0x21 && b <= 0x7E)
        sb.append(b.toChar)
      else
        sb.append('%').append(Integer.toHexString(b).toUpperCase)
    }
    sb.toString
  }

  /** pathFromMetric: `prefix + escape(name) + ".label.escape(value)"...`
    * with labels sorted by name; `__name__` and empty label names are
    * skipped, and label NAMES are written raw (Prometheus already forbids
    * '.' in them) (reference: graphite/client.go:53-80).
    */
  def pathFromMetric(labels: Map[String, String], prefix: String): String = {
    val name = labels.getOrElse("__name__", "")
    val sb = new StringBuilder(prefix).append(escape(name))
    labels.toSeq.sortBy(_._1).foreach { case (l, v) =>
      if (l != "__name__" && l.nonEmpty)
        sb.append('.').append(l).append('.').append(escape(v))
    }
    sb.toString
  }

  def escapeCol(s: Column): Column = graft.GraftExtensions.graphiteEscape(s)

  def path(labels: Column, prefix: Column): Column =
    graft.GraftExtensions.graphitePath(labels, prefix)
}
