package graft

import graft.engine.{Rollup, WritePipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-level profiler for the slow bench queries (not part of
  * the library surface; deleted once the plans are tuned).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val flat = graft.model.Tables.events(spark, sfDir).select(
      col("event_type").as("name"),
      map(lit("__name__"), col("event_type"),
        lit("user_id"), col("user_id").cast("string")).as("labels"),
      col("value"),
      unix_millis(col("ts")).as("timestampMs"))
    flat.write.format("noop").mode("overwrite").save() // warm-up

    val tmp = java.nio.file.Files.createTempDirectory("graft_prof").toString + "/metrics"
    time("a7c: append")(WritePipeline.append(
      WritePipeline.toMetricRows(WritePipeline.dropNonFinite(flat)), tmp))
    time("a7c: compact")(Rollup.compact(spark, tmp, 1706659200L))
    time("a7c: final read+sort")(
      spark.read.parquet(tmp)
        .select(col("name"), array_join(col("tags"), ",").as("tags"),
          unix_timestamp(col("ts")).as("bucket_ts"),
          round(col("val"), 4).as("val"))
        .orderBy(col("tags"), col("bucket_ts"), col("val"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
