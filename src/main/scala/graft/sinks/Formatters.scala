package graft.sinks

import graft.codec.{GraphiteCodec, OpenTsdbCodec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S6-S8 / E12: per-backend wire formatters as DataFrame transforms.
  *
  * Input is always the flat sample stream (name, labels, value,
  * timestampMs); output is one string column `line` (or `json`) whose
  * bytes are what the reference's client would put on the wire. Keeping
  * the formatters as column expressions means the encode work distributes
  * with the data and whole batches can stream to a sink via
  * foreachPartition without ever collecting.
  *
  * Value rendering: `valueRepr` defaults to Spark's shortest round-trip
  * double string (matches Go's strconv shortest formatting on the golden
  * fixtures). Callers needing a fixed-width decimal (e.g. the oracle
  * harness) pass their own representation column.
  */
object Formatters {

  private def defaultRepr(value: Column): Column = value.cast("string")

  /** Tags minus `__name__`, sorted by key — every backend writes labels
    * in sorted order (Go map-marshal sorts; graphite sorts explicitly).
    */
  private def sortedTagEntries(labels: Column): Column =
    array_sort(filter(map_entries(labels), e => e.getField("key") =!= "__name__"))

  /** S6: InfluxDB line protocol
    * `measurement,tag=val value=<v> <ts_ms>`
    * (reference: influxdb/client.go:91-107 — measurement = metric name,
    * tags = labels minus __name__, single field `value`, ms precision).
    * Influx escaping: `, = space` in tag keys/values; `, space` in the
    * measurement.
    */
  def influxLines(samples: DataFrame, valueRepr: Column => Column = defaultRepr): DataFrame = {
    def escTag(c: Column): Column =
      regexp_replace(c, "([,= ])", "\\\\$1")
    val measurement = regexp_replace(col("name"), "([, ])", "\\\\$1")
    val tagsPart = array_join(transform(sortedTagEntries(col("labels")),
      e => concat(lit(","), escTag(e.getField("key")), lit("="),
        escTag(e.getField("value")))), "")
    samples.select(concat(
      measurement, tagsPart,
      lit(" value="), valueRepr(col("value")),
      lit(" "), col("timestampMs").cast("string")).as("line"))
  }

  /** S7: OpenTSDB StoreSamplesRequest JSON, built explicitly (not
    * to_json) so tag keys are emitted in sorted order exactly like Go's
    * json.Marshal of a map (reference: opentsdb/client.go:57-62,101;
    * golden: opentsdb/client_test.go:51). Metric and tag VALUES run
    * through the TagValue escape (E9); tag keys are plain strings in the
    * reference (`map[string]TagValue`) and Prometheus label names are
    * JSON-safe `[a-zA-Z_][a-zA-Z0-9_]*`, so they pass through raw.
    */
  def opentsdbJson(samples: DataFrame, valueRepr: Column => Column = defaultRepr): DataFrame = {
    val tagsPart = array_join(transform(sortedTagEntries(col("labels")),
      e => concat(lit("\""), e.getField("key"),
        lit("\":\""), OpenTsdbCodec.marshalCol(e.getField("value")), lit("\""))), ",")
    samples.select(concat(
      lit("{\"metric\":\""), OpenTsdbCodec.marshalCol(col("name")),
      lit("\",\"timestamp\":"), floor(col("timestampMs") / 1000).cast("long").cast("string"),
      lit(",\"value\":"), valueRepr(col("value")),
      lit(",\"tags\":{"), tagsPart, lit("}}")).as("json"))
  }

  /** S8: Graphite plaintext `path value ts\n` with `%f`-style fixed
    * 6-decimal rendering of value and float seconds — the reference's
    * `fmt.Fprintf("%s %f %f\n", ...)` (reference: graphite/client.go:93-99).
    * The trailing newline is part of the wire format and kept in the
    * column so `concat` of a partition's lines is the exact TCP payload.
    */
  def graphiteLines(samples: DataFrame, prefix: String): DataFrame =
    samples.select(concat(
      GraphiteCodec.path(col("labels"), lit(prefix)),
      lit(" "), format_string("%f", col("value")),
      lit(" "), format_string("%f", col("timestampMs").cast("double") / 1000.0),
      lit("\n")).as("line"))
}
