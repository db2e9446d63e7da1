package graft

import org.apache.spark.sql.SparkSession

/** THE engine session definition, in one place (r17 verdict item 9: the
  * plan-affecting settings were duplicated across the Bench / Verify /
  * Explain / Prof session builders, so a fourth entry point could
  * silently run a different engine than the one verified and benched).
  * The four mains differ only in master / shuffle width / log level —
  * everything that changes a PLAN comes from [[engineConfs]], and
  * `GraftSessionSpec` pins that list.
  */
object GraftSession {

  /** Every plan-affecting engine setting. Rationale:
    *
    *  - `extensions=graft.GraftExtensions`: native codec/vector
    *    expressions as SQL functions, plus the [[FoldSizeOfCreateArray]]
    *    optimizer rule (the per-expression fix that replaced round 17's
    *    session-wide `excludedRules=InferFiltersFromGenerate`).
    *  - `codegen.cache.maxEntries=5000` (static conf, default 100): a
    *    100-entry generated-class cache thrashes under a 300+-query
    *    suite — late entries then RECOMPILE their codegen on every
    *    trial, which read as phantom 4-5x regressions on unchanged code
    *    (r9's llm_dedup_cluster, r11's minhash/incremental).
    *  - AQE `coalescePartitions.minPartitionSize=256k` (default 1m): AQE
    *    sizes post-shuffle partitions by BYTES, which starves
    *    compute-heavy small-byte stages — a per-series window over a few
    *    MB of shuffle coalesced to ONE partition runs its whole O(rows)
    *    compute serially (measured r17: promql_rate_sum's rate window 1
    *    task / 2.3 s; entry 3.5 s → 1.8 s once split). 256k measured
    *    best across a 5-point sweep (64k/128k/256k/512k/1m). The floor
    *    only binds in the tiny-partition regime — at production shuffle
    *    sizes (≥ MBs per partition) it is inert and parallelismFirst
    *    (default true) still targets full parallelism. Env-overridable
    *    (SPARK_GRAFT_MIN_PART) for sweeps.
    *  - the status-store retention caps: the stores retain per-execution
    *    PLAN GRAPHS (default 1000 executions) and per-task rows even
    *    with the UI disabled; this suite's plans are enormous.
    */
  def engineConfs: Seq[(String, String)] = Seq(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.extensions" -> "graft.GraftExtensions",
    "spark.sql.codegen.cache.maxEntries" -> "5000",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" ->
      sys.env.getOrElse("SPARK_GRAFT_MIN_PART", "256k"),
    "spark.sql.ui.retainedExecutions" -> "8",
    "spark.ui.retainedJobs" -> "100",
    "spark.ui.retainedStages" -> "100",
    "spark.ui.retainedTasks" -> "2000")

  /** A builder carrying the full engine definition; callers add only
    * deployment-shape settings (master is the caller's because the
    * driver benches at more than one core count via SPARK_GRAFT_CPUS).
    */
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    engineConfs.foldLeft(
      SparkSession.builder()
        .master(master)
        .config("spark.sql.shuffle.partitions", shufflePartitions)
        .config("spark.ui.enabled", "false")) {
      case (b, (k, v)) => b.config(k, v)
    }
}
