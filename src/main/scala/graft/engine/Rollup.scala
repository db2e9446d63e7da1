package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A7: the storage-level behaviors the reference delegates to
  * GraphiteMergeTree — tiered rollup retention and version dedup
  * (reference: README.md:64-87, clickhouse/sqlscripts/0001-create-table.sql:8-13).
  *
  * In Spark these are explicit batch jobs over the partitioned metrics
  * table. Both are per-`date`-partition recomputations — idempotent, so a
  * replayed batch (at-least-once ingest) converges to the same state.
  */
object Rollup {

  /** Retention tiers from the reference's graphite_rollup policy
    * (reference: README.md:71-85): (maxAgeSeconds-exclusive, precision).
    */
  val Tiers: Seq[(Long, Long)] = Seq((86400L, 10L), (172800L, 30L))
  val OldestPrecision: Long = 300L

  /** Bucket precision for a row's age relative to `nowSec`:
    * avg @ 10 s (< 1 d), 30 s (< 2 d), 300 s (older).
    */
  def precisionFor(nowSec: Long): org.apache.spark.sql.Column = {
    val age = lit(nowSec) - unix_timestamp(col("ts"))
    Tiers.foldRight(lit(OldestPrecision)) { case ((maxAge, prec), rest) =>
      when(age < maxAge, lit(prec)).otherwise(rest)
    }
  }

  /** Tiered compaction: avg per (name, tags, tier-aligned bucket).
    * The shuffle key is the series id × bucket — the same partitioning the
    * read path uses, so compacted data stays co-located.
    */
  def rollup(metrics: DataFrame, nowSec: Long): DataFrame = {
    val prec = precisionFor(nowSec)
    val bucket = (floor(unix_timestamp(col("ts")) / prec) * prec).cast("long")
    metrics
      .groupBy(col("name"), col("tags"),
        bucket.as("bucket_ts"), prec.as("precision"))
      .agg(avg(col("val")).as("val"), count(lit(1)).as("cnt"),
        max(col("updated")).as("updated"))
  }

  /** Storage compaction job: version-dedup then tier-rollup the stored
    * table and REWRITE it — the explicit-batch-job form of what
    * GraphiteMergeTree does during background merges. Writes to a staging
    * directory and swaps, so a crash mid-compact leaves the original
    * table intact (the job is idempotent and can simply rerun).
    *
    * Compacted rows return to the canonical 6-column schema with
    * `ts` = bucket start; per-date partitioning and in-partition
    * (name, tags, ts) ordering are preserved so reads keep pruning.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, tablePath: String,
              nowSec: Long): Unit = {
    val rolled = rollup(dedupLatest(spark.read.parquet(tablePath)), nowSec)
      .select(
        to_date(timestamp_seconds(col("bucket_ts"))).as("date"),
        col("name"), col("tags"), col("val"),
        timestamp_seconds(col("bucket_ts")).as("ts"),
        col("updated"))
    val staging = tablePath + ".compacting"
    // Range split over (date, name, tags), not hash-on-date: compaction
    // rewrites the WHOLE store, and a per-date hash funnel would sort
    // each day on one task — see WritePipeline.append for the full
    // rationale; files per date hold disjoint (name, tags) ranges so
    // row-group skipping survives.
    rolled
      .repartitionByRange(col("date"), col("name"), col("tags"))
      .sortWithinPartitions(col("name"), col("tags"), col("ts"))
      .write.mode("overwrite").partitionBy("date").parquet(staging)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(tablePath).getFileSystem(conf)
    val dst = new org.apache.hadoop.fs.Path(tablePath)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
    ()
  }

  /** Incremental compaction: version-dedup + tier-rollup ONLY the given
    * `date` partitions and overwrite just those directories (dynamic
    * partition overwrite) — the per-partition merge MergeTree actually
    * performs, and the only form that survives 100 TB: the rollup tier a
    * row belongs to is a function of its age, so each day a date
    * partition crosses a tier boundary exactly once and only boundary-
    * crossing partitions (plus freshly written ones) need rework; the
    * rest of the table is untouched — no full-table read, no full
    * rewrite, no staging swap.
    */
  def compactDates(spark: org.apache.spark.sql.SparkSession, tablePath: String,
                   dates: Seq[String], nowSec: Long): Unit = {
    val selected = spark.read.parquet(tablePath)
      .filter(col("date").isin(dates: _*)) // prunes to the named partitions
    val rolled = rollup(dedupLatest(selected), nowSec)
      .select(
        to_date(timestamp_seconds(col("bucket_ts"))).as("date"),
        col("name"), col("tags"), col("val"),
        timestamp_seconds(col("bucket_ts")).as("ts"),
        col("updated"))
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      rolled
        .repartitionByRange(col("date"), col("name"), col("tags"))
        .sortWithinPartitions(col("name"), col("tags"), col("ts"))
        .write.mode("overwrite").partitionBy("date").parquet(tablePath)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Version dedup ≙ MergeTree `updated` version column: for each
    * (name, tags, ts) keep the newest `updated` (last write wins across
    * at-least-once replays), `val` descending as a deterministic tiebreak
    * for identical versions — i.e. the row with the lexicographic-max
    * (updated, val).
    *
    * Implemented as max_by over a groupBy rather than a row_number
    * window: an aggregation gets map-side partial combine (replay
    * duplicates collapse before the shuffle) and needs no per-group sort,
    * where the window form shuffles every raw row and sorts each
    * partition. Same keys, same winner, strictly less work — the
    * difference compounds at compaction scale.
    */
  def dedupLatest(metrics: DataFrame): DataFrame = {
    val keyCols = Seq("name", "tags", "ts")
    val others = metrics.columns.filterNot(keyCols.contains).toSeq
    metrics
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(others.map(col): _*),
        struct(col("updated"), col("val"))).as("_w"))
      .select(keyCols.map(col) ++ others.map(c => col(s"_w.$c").as(c)): _*)
  }
}
