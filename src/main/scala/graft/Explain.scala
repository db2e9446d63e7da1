package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints `explain("formatted")` for representative
  * queries so scan pushdown (PushedFilters/ReadSchema), broadcast choices,
  * and exchange counts can be inspected per round. Not part of the driver
  * contract — a development tool.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("a1_bucket_quantile", "llm_ann_cosine", "llm_dedup_minhash",
        "s4_write_roundtrip", "llm_text_stats", "llm_sem_dedup",
        "llm_ann_pq", "llm_bigram_lm")
    // the shared engine definition — the audited plans are the plans
    // Bench/Verify actually execute (including any SPARK_GRAFT_MIN_PART
    // override, which previously diverged here)
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
