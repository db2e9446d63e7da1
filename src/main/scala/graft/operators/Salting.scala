package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation for skewed keys.
  *
  * A groupBy on a low-cardinality hot column (e.g. 5 metric names over
  * 100 TB) hash-partitions every row to ≤5 reducers no matter how many
  * executors exist. Salting splits each hot key into `buckets` synthetic
  * sub-keys for the first (wide) aggregation, then combines the ≤
  * keys×buckets partials in a second (tiny) aggregation — the shuffle
  * fans out to keys×buckets reducers and the result is EXACTLY the
  * unsalted aggregate, independent of how rows landed in salt buckets.
  *
  * (Spark's map-side partial aggregation often hides this for simple
  * aggs; explicit salting is the tool for when it can't — high-cardinality
  * intermediate state, or AQE skew handling unavailable on the agg path.)
  */
object Salting {

  /** Deterministic row salt in [0, buckets) derived from any column (the
    * salt value itself never affects results — only the fan-out).
    */
  def salt(seedCol: Column, buckets: Int): Column =
    pmod(crc32(seedCol.cast("string")), lit(buckets.toLong))

  /** Salted sum+count per key: phase 1 aggregates (key, salt), phase 2
    * combines per key. Returns (keyCols..., cnt, total).
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltSeed: String, buckets: Int): DataFrame = {
    val keys = keyCols.map(col)
    df
      .withColumn("_salt", salt(col(saltSeed), buckets))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(count(lit(1)).as("_cnt"), sum(col(valueCol)).as("_sum"))
      .groupBy(keys: _*)
      .agg(sum(col("_cnt")).as("cnt"), sum(col("_sum")).as("total"))
  }
}
