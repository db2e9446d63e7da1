package graft

import graft.codec.{Prompb, TextExposition, WriteWire}
import graft.codec.Prompb._
import org.scalatest.funsuite.AnyFunSuite

/** The text exposition parser (ingest side of /federate's render). */
class TextExpositionSpec extends AnyFunSuite {

  test("samples: labels, escapes, special values, optional timestamp") {
    val page =
      """# HELP up Whether the target is up.\n Second line \\ here.
        |# TYPE up gauge
        |up{job="api",instance="a\"b\\c\nd"} 1 1700000000000
        |up{job="api",instance="x",} 0.5 1700000060000
        |up 3 1700000000000
        |inf_metric +Inf 1000
        |ninf_metric -Inf 1000
        |nan_metric NaN 1000
        |nots_metric 42
        |""".stripMargin
    val dec = TextExposition.decode(page, defaultTsMs = 777L)
    val byName = dec.request.timeseries.groupBy(
      _.labels.find(_.name == "__name__").get.value)
    // escaped label value round-trips
    val esc = byName("up").find(_.labels.exists(_.value == "a\"b\\c\nd"))
    assert(esc.nonEmpty)
    assert(esc.get.samples == Seq(PSample(1.0, 1700000000000L)))
    // trailing comma inside the brace is legal
    assert(byName("up").exists(_.labels.contains(PLabel("instance", "x"))))
    // bare name (no label set)
    assert(byName("up").exists(_.labels.map(_.name) == Seq("__name__")))
    // Go special floats
    assert(byName("inf_metric").head.samples.head.value.isPosInfinity)
    assert(byName("ninf_metric").head.samples.head.value.isNegInfinity)
    assert(byName("nan_metric").head.samples.head.value.isNaN)
    // missing timestamp takes the receiver's default
    assert(byName("nots_metric").head.samples == Seq(PSample(42.0, 777L)))
    // HELP unescapes \n and \\; TYPE lands beside it
    assert(dec.metadata == Seq(WriteWire.PMetadata("up", "gauge",
      "Whether the target is up.\n Second line \\ here.", "")))
  }

  test("two samples of one series merge into one timeseries in order") {
    val dec = TextExposition.decode(
      "m{a=\"1\"} 1 100\nm{a=\"1\"} 2 200\n", 0L)
    assert(dec.request.timeseries.size == 1)
    assert(dec.request.timeseries.head.samples ==
      Seq(PSample(1.0, 100L), PSample(2.0, 200L)))
  }

  test("malformed lines fail loudly with the line number") {
    def err(page: String): String =
      intercept[IllegalArgumentException](
        TextExposition.decode(page, 0L)).getMessage
    assert(err("ok 1 1\nbad{x= 1\n").contains("line 2"))
    assert(err("m{a=\"unterminated} 1\n").contains("unterminated"))
    assert(err("m notanumber\n").contains("malformed value"))
    assert(err("m 1 notats\n").contains("malformed timestamp"))
    assert(err("m{a=\"v\"\n").contains("unterminated label set"))
    assert(err("{} 1\n").contains("metric name"))
    // Java-isms parseDouble would take but the exposition format rejects
    assert(err("m 1d\n").contains("malformed value"))
    assert(err("m 1f\n").contains("malformed value"))
    assert(err("m 0x1p3\n").contains("malformed value"))
    assert(err("m Infinity\n").contains("malformed value"))
    // duplicate label names on one line
    assert(err("m{a=\"1\",a=\"2\"} 1\n").contains("duplicate label"))
  }

  test("go float shapes still parse: exponents, bare fractions, signs") {
    def one(page: String): Double =
      TextExposition.decode(page, 0L).request.timeseries.head.samples
        .head.value
    assert(one("m 1e3\n") == 1000.0)
    assert(one("m -2.5E-1\n") == -0.25)
    assert(one("m .5\n") == 0.5)
    assert(one("m 3.\n") == 3.0)
    assert(one("m +Inf\n").isPosInfinity)
  }

  test("round trip: a federate-shaped page decodes to the values and " +
      "timestamps that were printed") {
    val page = "# TYPE x counter\n" +
      (0 until 50).map(i => s"""x{i="$i"} $i.5 ${1000 + i}""")
        .mkString("", "\n", "\n")
    val dec = TextExposition.decode(page, 0L)
    assert(dec.request.timeseries.size == 50)
    assert(dec.request.timeseries.map(_.samples.head.value).sum ==
      (0 until 50).map(_ + 0.5).sum)
  }

  test("openmetrics: seconds timestamps, UNIT metadata, inline " +
      "exemplars, EOF discipline") {
    val page =
      """# HELP rq Requests.
        |# TYPE rq counter
        |# UNIT rq seconds
        |rq_total{job="api"} 5 1700000000.25 # {trace_id="abc"} 1 1700000000.5
        |rq_total{job="db"} 2 1700000060
        |rq_total{job="ws"} 3
        |# EOF
        |""".stripMargin
    val dec = TextExposition.decodeOpenMetrics(page, 99L)
    // float seconds truncate to ms the upstream way: int64(ts * 1000)
    val byJob = dec.request.timeseries
      .map(ts => ts.labels.find(_.name == "job").get.value ->
        ts.samples.head).toMap
    assert(byJob("api").timestampMs == 1700000000250L)
    assert(byJob("db").timestampMs == 1700000060000L)
    assert(byJob("ws").timestampMs == 99L) // no ts → receiver default
    // the exemplar rides its series, labels sorted, its own seconds ts
    val ex = dec.exemplars
    assert(ex.size == 1)
    assert(ex.head.seriesLabels.find(_.name == "job").get.value == "api")
    assert(ex.head.exemplars ==
      Seq(WriteWire.PExemplar(Seq(PLabel("trace_id", "abc")),
        1.0, 1700000000500L)))
    // an exemplar with no own timestamp inherits the sample's
    val inherit = TextExposition.decodeOpenMetrics(
      "m 1 100 # {t=\"x\"} 2\n# EOF\n", 0L)
    assert(inherit.exemplars.head.exemplars.head.timestampMs == 100000L)
    // UNIT joins TYPE/HELP in family metadata
    assert(dec.metadata ==
      Seq(WriteWire.PMetadata("rq", "counter", "Requests.", "seconds")))
    // EOF is mandatory, terminal, and exact
    intercept[IllegalArgumentException](
      TextExposition.decodeOpenMetrics("m 1 1\n", 0L))
    intercept[IllegalArgumentException](
      TextExposition.decodeOpenMetrics("# EOF\nm 1 1\n", 0L))
    // non-finite timestamps are a parse ERROR (upstream OM parser),
    // never 0 / Long.MaxValue / Long.MinValue samples
    for (bad <- Seq("NaN", "+Inf", "-Inf", "1e300"))
      intercept[IllegalArgumentException](
        TextExposition.decodeOpenMetrics(s"m 1 $bad\n# EOF\n", 0L))
    // non-finite sample VALUES stay legal (staleness markers etc.)
    assert(TextExposition.decodeOpenMetrics("m NaN 1\n# EOF\n", 0L)
      .request.timeseries.head.samples.head.value.isNaN)
    // Prometheus 3 UTF-8 quoted names ride BOTH text wires: a bare
    // quoted string inside the braces is the metric name, a quoted
    // label name carries dots — and the bare-name form still takes
    // ordinary labels beside it
    val u8 = TextExposition.decode(
      """{"my.metric", "dotted.label"="x", job="api"} 4 1700000000000""" +
        "\n", 0L)
    assert(u8.request.timeseries.head.labels == Seq(
      PLabel("__name__", "my.metric"), PLabel("dotted.label", "x"),
      PLabel("job", "api")))
    assert(u8.request.timeseries.head.samples == Seq(PSample(4.0, 1700000000000L)))
    // a braces-form line without a name refuses
    intercept[IllegalArgumentException](
      TextExposition.decode("""{job="api"} 1 1""" + "\n", 0L))
    // classic mode is unchanged by the refactor: the ms timestamp is
    // the token after the value and anything beyond is ignored (the
    // historical leniency) — an exemplar suffix never ingests as data
    val classic = TextExposition.decode("m 1 100 # {t=\"x\"} 2\n", 0L)
    assert(classic.request.timeseries.head.samples ==
      Seq(PSample(1.0, 100L)))
  }

  test("openmetrics: _created companions derive CT-zero candidates " +
      "for every matching component series") {
    val page =
      """# TYPE rq counter
        |rq_total{job="api"} 5 100
        |rq_created{job="api"} 40.5
        |rq_total{job="db"} 2 100
        |# TYPE lat histogram
        |lat_bucket{job="api",le="1"} 3 100
        |lat_bucket{job="api",le="+Inf"} 4 100
        |lat_count{job="api"} 4 100
        |lat_sum{job="api"} 9 100
        |lat_created{job="api"} 60
        |# EOF
        |""".stripMargin
    val req = TextExposition.decodeOpenMetrics(page, 0L).request
    def key(ts: Prompb.PTimeSeries): String =
      ts.labels.map(l => s"${l.name}=${l.value}").mkString(",")
    val zeros = TextExposition.ctZeroSeries(req)
      .map(ts => key(ts) -> ts.samples.head).toMap
    // counter: one zero at value*1000 ms, ONLY for the labeled match
    assert(zeros("__name__=rq_total,job=api") == PSample(0.0, 40500L))
    assert(!zeros.contains("__name__=rq_total,job=db"))
    // histogram: every component series, le dropped for matching
    assert(zeros("__name__=lat_count,job=api") == PSample(0.0, 60000L))
    assert(zeros("__name__=lat_sum,job=api") == PSample(0.0, 60000L))
    assert(zeros.count { case (k, smp) =>
      k.contains("lat_bucket") && smp == PSample(0.0, 60000L) } == 2)
    assert(zeros.size == 5)
    // a CT at/after the first sample derives nothing
    val late = TextExposition.decodeOpenMetrics(
      "c_total 1 100\nc_created 100\n# EOF\n", 0L).request
    assert(TextExposition.ctZeroSeries(late).isEmpty)
    // the companion detector
    assert(req.timeseries.count(TextExposition.isCreatedSeries) == 2)
  }
}
