package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical tag-array codec (SURVEY §2.5 E1-E4).
  *
  * Series identity in the engine is the *sorted* `"k=v"` string array,
  * including `"__name__=<metric>"` — byte-comparable, so groupBy-on-array
  * equals group-by-series (reference: clickhouse/tagvalue.go:22-30).
  *
  * Everything here is built-in Catalyst expressions (codegen'd) — no UDFs.
  */
object Tags {

  /** E1 `tagsFromMetric`: label map → sorted "k=v" array
    * (reference: clickhouse/tagvalue.go:22-30).
    */
  def tagsFromLabels(labels: Column): Column =
    sort_array(transform(map_entries(labels),
      e => concat(e.getField("key"), lit("="), e.getField("value"))))

  /** E2 `metricName`: extract `__name__`, "" if absent
    * (reference: clickhouse/tagvalue.go:14-19).
    */
  def metricName(labels: Column): Column =
    coalesce(element_at(labels, Schema.MetricNameLabel), lit(""))

  /** E3 `makeLabels`: inverse of E1 — "k=v" array → label map. Malformed
    * entries (no '=') and empty values are dropped: an empty label value is
    * semantically a nonexistent label
    * (reference: clickhouse/tagvalue.go:32-49, influxdb/client.go:231-239).
    */
  def labelsFromTags(tags: Column): Column =
    map_from_entries(
      transform(
        filter(tags, t => size(split(t, "=", 2)) === 2 &&
          element_at(split(t, "=", 2), 2) =!= ""),
        t => struct(
          element_at(split(t, "=", 2), 1).as("key"),
          element_at(split(t, "=", 2), 2).as("value"))))

  /** E4 series key ≙ the reference's `strings.Join(tags, "\xff")`
    * (reference: clickhouse/client.go:197, influxdb/client.go:217-226).
    *
    * CAVEAT: the reference's separator is the raw BYTE 0xFF, which cannot
    * occur in valid UTF-8; the nearest string equivalent here is the
    * CHARACTER U+00FF ('ÿ'), which is a legal label-value character — so
    * this scalar key is NOT collision-free and must never be a grouping
    * key. Engine paths group on the tags array itself (element-wise
    * hashing, no separator); this function exists only for response-edge /
    * display parity with the reference.
    */
  def seriesKey(tags: Column): Column = array_join(tags, "ÿ")
}
