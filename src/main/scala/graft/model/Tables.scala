package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated testdata tables, plus the mapping of the
  * generic `events` stream onto the engine's canonical metrics schema.
  */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** LOCAL-MODE-ONLY scan spread for map-heavy consumers. The testdata
    * tables arrive as ONE tiny parquet file → one input split → one core
    * does all per-row work (md5 shingles, signature folds, escape UDFs)
    * on local[32]. On a real cluster the scan parallelizes by file/
    * row-group split automatically, so there the repartition would be a
    * pure pessimization — a full round-robin shuffle of every scan baked
    * into every consumer — hence the isLocal gate: at cluster scale this
    * is the identity. Cheap consumers (pushed filters, immediate
    * re-shuffles) pass spread=false and skip it even locally.
    */
  def spreadLocal(spark: SparkSession, df: DataFrame,
                  spread: Boolean = true): DataFrame =
    if (spread && spark.sparkContext.isLocal)
      df.repartition(spark.sparkContext.defaultParallelism)
    else df

  /** `events.parquet` has shipped with two physical `ts` encodings
    * across driver testdata generations, both normalized here to a
    * session-UTC TimestampType:
    *  - TIMESTAMP(NANOS): Spark refuses it by default; read as long
    *    nanos (`nanosAsLong`) and convert with integer division (a ns
    *    epoch does not fit double precision);
    *  - TIMESTAMP(µs, isAdjustedToUTC=false): arrives as TIMESTAMP_NTZ;
    *    cast interprets the wall-clock in the session zone (pinned UTC),
    *    which is exactly how DuckDB reads the same naive values.
    * Either way both engines see identical microsecond timestamps.
    *
    * spread defaults to FALSE: most events consumers are pushed-down
    * filters or immediate groupBys where an up-front shuffle only adds
    * latency; codec-heavy consumers (escape UDFs, line formatters) opt in.
    */
  def events(spark: SparkSession, dir: String,
             spread: Boolean = false): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, dir, "events")
    val converted = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
    spreadLocal(spark, converted, spread)
  }
  /** documents/embeddings default to spread=true — nearly every consumer
    * runs a heavy per-row pipeline (shingling, vector folds) where local
    * single-split execution is the bottleneck.
    */
  def documents(spark: SparkSession, dir: String,
                spread: Boolean = true): DataFrame =
    spreadLocal(spark, read(spark, dir, "documents"), spread)
  def embeddings(spark: SparkSession, dir: String,
                 spread: Boolean = true): DataFrame =
    spreadLocal(spark, read(spark, dir, "embeddings"), spread)
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

  def metrics(spark: SparkSession, dir: String,
              spread: Boolean = false): DataFrame =
    metricsFromEvents(events(spark, dir, spread))
}
