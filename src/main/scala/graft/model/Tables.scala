package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables, plus the mapping of the
  * generic `events` stream onto the engine's canonical metrics schema.
  */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` stores TIMESTAMP(NANOS) which Spark refuses by
    * default; read it as long nanos and convert with integer division
    * (ns epoch does not fit double precision). DuckDB likewise truncates
    * ns → µs, so both engines see identical microsecond timestamps.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, dir, "events")
    val converted = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
    // Same single-small-file / one-input-split concern as documents
    // below: spread the scan so per-row work (tag codecs, escape UDFs,
    // formatters, partial aggregation) parallelizes on local[32]. Filters
    // still push below the exchange to the parquet scan.
    converted.repartition(spark.sparkContext.defaultParallelism)
  }
  /** documents/embeddings feed map-heavy per-row pipelines (md5 shingles,
    * signature folds) but arrive as ONE tiny parquet file → one input
    * split → one core does all the work on local[32]. On a production
    * cluster the scan parallelizes by file split automatically; this
    * explicit spread exists so local runs exercise the same parallelism.
    * The shuffled payload is the raw table (small), far cheaper than
    * serializing the downstream compute.
    */
  def documents(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism)
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")

  /** Map the `events` table onto the canonical metrics schema (§1.2):
    * metric name = event_type, one label `user_id`, value, and `ts`
    * truncated to whole seconds as the reference stores it
    * (reference: clickhouse/client.go:135 binds DateTime = second precision).
    *
    * Tag array is ["__name__=<name>", "user_id=<id>"] — already in sorted
    * order ('_' < 'u'); `sort_array` kept for the invariant.
    */
  def metricsFromEvents(events: DataFrame): DataFrame =
    events.select(
      to_date(col("ts")).as("date"),
      col("event_type").as("name"),
      sort_array(array(
        concat(lit(Schema.MetricNameLabel + "="), col("event_type")),
        concat(lit("user_id="), col("user_id")))).as("tags"),
      col("value").as("val"),
      date_trunc("second", col("ts")).as("ts"),
      date_trunc("second", col("ts")).as("updated")
    )

  def metrics(spark: SparkSession, dir: String): DataFrame =
    metricsFromEvents(events(spark, dir))
}
