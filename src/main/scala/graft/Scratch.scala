package graft

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

    // warm-up
    graft.model.Tables.documents(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    for (name <- args) {
      time(name)(SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
