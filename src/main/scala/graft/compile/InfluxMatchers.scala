package graft.compile

import graft.compile.Matchers._
import graft.model.Schema
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F7: the InfluxQL matcher dialect — the reference's second, semantically
  * DIFFERENT compile of the same prompb matchers
  * (reference: influxdb/client.go:148-184).
  *
  * Divergences from the ClickHouse dialect (Matchers.scala), preserved
  * deliberately:
  *  - regexes are ANCHORED BOTH ENDS: `=~ /^v$/` (ClickHouse `match` is
  *    unanchored; F6 re-anchors only the start);
  *  - a name EQ matcher selects the measurement (FROM clause); name
  *    NEQ/NRE are UNSUPPORTED and error out (influxdb/client.go:161-163);
  *  - tag EQ/NEQ compare the single value — NO `|`-alternation splitting
  *    (that's a ClickHouse-dialect convention, query.go:103-107);
  *  - no matcher on the name means FROM /.+/ — all measurements.
  */
object InfluxMatchers {

  def compileMatcher(m: LabelMatcher): Column =
    if (m.name == Schema.MetricNameLabel) m.mtype match {
      case EQ => col("name") === m.value
      case RE => col("name").rlike("^" + m.value + "$")
      case NEQ | NRE => throw new IllegalArgumentException(
        "non-equal or regex-non-equal matchers are not supported on the metric name yet")
    } else m.mtype match {
      case EQ  => array_contains(col("tags"), s"${m.name}=${m.value}")
      case NEQ => !array_contains(col("tags"), s"${m.name}=${m.value}")
      case RE  => exists(col("tags"), x => x.rlike("^" + m.name + "=" + m.value + "$"))
      case NRE => !exists(col("tags"), x => x.rlike("^" + m.name + "=" + m.value + "$"))
    }

  /** Full predicate: time range AND matchers, Influx semantics
    * (`time >= s AND time <= e`, influxdb/client.go:180-181).
    */
  def compile(q: PromQuery): Column =
    q.matchers.map(compileMatcher).foldLeft(Matchers.timeRange(q))(_ && _)

  /** The Influx raw read: `SELECT value ... GROUP BY *` returns RAW
    * samples per series — no bucketing, no quantile (the aggregation
    * difference between the two read backends is part of the surface;
    * reference: influxdb/client.go:183). Output one row per stored
    * sample: (name, tags, t [epoch ms], value), merge-ready for A6.
    */
  def rawRead(metrics: DataFrame, q: PromQuery): DataFrame =
    metrics.filter(compile(q))
      .select(col("name"), col("tags"),
        (unix_timestamp(col("ts")) * 1000).as("t"),
        col("val").as("value"))
}
