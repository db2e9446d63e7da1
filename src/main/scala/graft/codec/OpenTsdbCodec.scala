package graft.codec

import org.apache.spark.sql.Column

/** E9/E10: OpenTSDB TagValue escaping — `_`-escape state machine and its
  * exact inverse (reference: opentsdb/tagvalue.go:65-158). Golden-tested
  * against the reference's vectors and round-trip property-tested; the
  * Column API plans the codegen'd expressions in graft.expressions.
  */
object OpenTsdbCodec {

  /** marshal: `[-./0-9A-Za-z]` verbatim, `_` → `__`, `:` → `_.`, anything
    * else (per UTF-8 byte) → `_X`/`_XX` uppercase unpadded hex — the
    * reference's `_%X` verb (reference: opentsdb/tagvalue.go:65-87).
    */
  def marshal(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    s.getBytes("UTF-8").foreach { byte =>
      val b = byte & 0xFF
      if ((b >= '-' && b <= '9') || (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z'))
        sb.append(b.toChar)
      else if (b == '_') sb.append("__")
      else if (b == ':') sb.append("_.")
      else sb.append('_').append(Integer.toHexString(b).toUpperCase)
    }
    sb.toString
  }

  /** unmarshal: exact inverse state machine, escape levels 0/1/2
    * (reference: opentsdb/tagvalue.go:91-158). Throws on illegal escape
    * sequences like the reference errors.
    */
  def unmarshal(s: String): String = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var escapeLevel = 0
    var parsed = 0
    s.getBytes("UTF-8").zipWithIndex.foreach { case (byte, i) =>
      val b = byte & 0xFF
      escapeLevel match {
        case 0 =>
          if (b == '_') escapeLevel = 1
          else out.write(b)
        case 1 =>
          if (b == '_') { out.write('_'); escapeLevel = 0 }
          else if (b == '.') { out.write(':'); escapeLevel = 0 }
          else if (b >= '0' && b <= '9') { parsed = (b - 48) << 4; escapeLevel = 2 }
          else if (b >= 'A' && b <= 'F') { parsed = (b - 55) << 4; escapeLevel = 2 }
          else throw new IllegalArgumentException(
            s"illegal escape sequence at byte $i (${b.toChar})")
        case 2 =>
          if (b >= '0' && b <= '9') parsed += b - 48
          else if (b >= 'A' && b <= 'F') parsed += b - 55
          else throw new IllegalArgumentException(
            s"illegal escape sequence at byte $i (${b.toChar})")
          out.write(parsed)
          escapeLevel = 0
      }
    }
    new String(out.toByteArray, "UTF-8")
  }

  def marshalCol(s: Column): Column = graft.GraftExtensions.opentsdbMarshal(s)
  def unmarshalCol(s: Column): Column = graft.GraftExtensions.opentsdbUnmarshal(s)
}
