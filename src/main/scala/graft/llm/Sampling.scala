package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Hash-based so the assignment is a pure function of the record id:
  * stable across runs, engines, partitionings, and cluster sizes — the
  * property that makes a train/val/test split reproducible at 100 TB
  * without any global coordination (no shuffles, no random state). md5 is
  * used as the hash so the DuckDB oracle reproduces it verbatim.
  */
object Sampling {

  /** Uniform [0, 100) bucket from the record id: first 8 md5 hex digits
    * as an integer, mod 100.
    */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Stratify a record into train/val/test by hash bucket:
    * [0,trainPct) → train, [trainPct,trainPct+valPct) → val, rest → test.
    */
  def split(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(id)
    when(b < trainPct, lit("train"))
      .when(b < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }
}
