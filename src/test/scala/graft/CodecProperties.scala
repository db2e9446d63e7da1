package graft

import graft.codec.{GraphiteCodec, OpenTsdbCodec, Prompb}
import graft.codec.Prompb._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the pure codecs (no SparkSession needed). */
object CodecProperties extends Properties("codecs") {

  // printable ASCII + a few multi-byte/utf-8 and escape-relevant chars;
  // excludes control bytes (< 0x10 hits the reference's unpadded-%X
  // marshal quirk, which is faithfully ported and breaks round-trips
  // exactly like the original does)
  private val charPool: Gen[Char] = Gen.frequency(
    8 -> Gen.choose(33.toChar, 126.toChar),
    2 -> Gen.oneOf('ä', 'ö', 'ü', '日', '本', ' ', ':', '_', '.', '/', '%', '='))
  private val str: Gen[String] = Gen.listOf(charPool).map(_.mkString)

  property("opentsdb marshal/unmarshal round-trip") = forAll(str) { s =>
    OpenTsdbCodec.unmarshal(OpenTsdbCodec.marshal(s)) == s
  }

  property("opentsdb marshal emits only legal opentsdb runes") = forAll(str) { s =>
    OpenTsdbCodec.marshal(s).forall(c =>
      (c >= '-' && c <= '9') || (c >= 'A' && c <= 'Z') ||
        (c >= 'a' && c <= 'z') || c == '_')
  }

  property("graphite escape never leaks reserved bytes") = forAll(str) { s =>
    val e = GraphiteCodec.escape(s)
    // '.' '/' '=' are reserved (path structure); they must only survive
    // percent-encoded. '%' may appear, but only as an escape lead.
    !e.contains('.') && !e.contains('/') && !e.contains('=')
  }

  private val label: Gen[PLabel] = for {
    n <- str; v <- str
  } yield PLabel(n, v)

  private val sample: Gen[PSample] = for {
    v <- Gen.choose(-1e9, 1e9) // finite; NaN breaks == (tested separately)
    t <- Gen.choose(0L, Long.MaxValue / 2)
  } yield PSample(v, t)

  private val timeSeries: Gen[PTimeSeries] = for {
    ls <- Gen.listOfN(3, label); ss <- Gen.listOf(sample)
  } yield PTimeSeries(ls, ss)

  private val writeRequest: Gen[PWriteRequest] =
    Gen.listOf(timeSeries).map(PWriteRequest(_))

  property("prompb WriteRequest wire round-trip") = forAll(writeRequest) { wr =>
    Prompb.decodeWriteRequest(Prompb.encodeWriteRequest(wr)) == wr
  }

  property("prompb + snappy full stack round-trip") = forAll(writeRequest) { wr =>
    Prompb.decodeWriteRequest(Prompb.snappyUncompress(
      Prompb.snappyCompress(Prompb.encodeWriteRequest(wr)))) == wr
  }

  private val matcher: Gen[PLabelMatcher] = for {
    t <- Gen.choose(0, 3); n <- str; v <- str
  } yield PLabelMatcher(t, n, v)

  private val readRequest: Gen[PReadRequest] = Gen.listOf(for {
    s <- Gen.choose(0L, 1L << 40); e <- Gen.choose(0L, 1L << 40)
    ms <- Gen.listOf(matcher)
  } yield PQuery(s, e, ms)).map(PReadRequest(_))

  property("prompb ReadRequest wire round-trip") = forAll(readRequest) { rr =>
    Prompb.decodeReadRequest(Prompb.encodeReadRequest(rr)) == rr
  }
}
