package graft.model

import org.apache.spark.sql.types._

/** Canonical data model of the engine.
  *
  * Mirrors the reference's persistent schema
  * (reference: clickhouse/sqlscripts/0001-create-table.sql:1-13): a flat
  * time-series sample table partitioned by `date`, with series identity
  * encoded as a sorted `"k=v"` tag array that includes `__name__=<name>`
  * (reference: clickhouse/tagvalue.go:22-30).
  *
  * At 100 TB the layout choice is: parquet partitioned by `date` (day) —
  * Catalyst prunes partitions from the `ts` range predicates — and sorted
  * within files by (name, tags, ts) so parquet min/max row-group stats act
  * like the MergeTree primary index.
  */
object Schema {

  /** In-flight sample, the unit of ingest (reference: main.go:377-394). */
  case class Sample(
      name: String,
      labels: Map[String, String],
      value: Double,
      /** epoch milliseconds, as on the Prometheus wire (reference: main.go:389). */
      timestampMs: Long
  )

  /** One stored row (reference schema §1.2). `ts` is truncated to whole
    * seconds (reference: clickhouse/client.go:135) — bucket math assumes it.
    */
  case class MetricRow(
      date: java.sql.Date,
      name: String,
      tags: Seq[String],
      `val`: Double,
      ts: java.sql.Timestamp,
      updated: java.sql.Timestamp
  )

  val metricsSchema: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("updated", TimestampType, nullable = false)
  ))

  /** Prometheus magic label holding the metric name. */
  val MetricNameLabel = "__name__"

  /** prompb.WriteRequest as a nested Spark schema — the wire shape of
    * remote-write after protobuf decode (reference: main.go:301-302).
    */
  val writeRequestSchema: StructType = StructType(Seq(
    StructField("timeseries", ArrayType(StructType(Seq(
      StructField("labels", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("value", StringType)
      ))), nullable = false),
      StructField("samples", ArrayType(StructType(Seq(
        StructField("value", DoubleType),
        StructField("timestamp", LongType)
      ))), nullable = false)
    ))), nullable = false)
  ))
}
