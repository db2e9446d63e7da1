package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Sequence packing: assign documents to fixed token-budget bins (the
    * context-window packing pass of LLM pretraining dataloaders), as the
    * deterministic parallel approximation — documents are taken in a
    * canonical order per group and each is assigned to the bin its START
    * offset falls in (start-offset binning over a running token cumsum;
    * one window shuffle per group key, no sequential driver loop).
    *
    * Semantics to note: a bin can exceed `budget` by the overhang of its
    * last document (dataloaders truncate or spill the overhang at
    * materialization), and an oversized document occupies its start bin
    * and implicitly spans the following ones — this is offset bookkeeping
    * for the packer, not a capacity guarantee.
    *
    * Adds `bin` (0-based per group) and `bin_offset` (the document's
    * start offset within its group's token stream).
    */
  def packBins(docs: DataFrame, groupCol: String, orderCol: String,
               tokenCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(col(tokenCol)).over(w)
    docs
      .withColumn("bin_offset", cum - col(tokenCol))
      .withColumn("bin", floor(col("bin_offset") / budget).cast("long"))
  }

  /** Deterministic stratified sample: keep the `n` hash-lowest records of
    * each stratum — the corpus-balancing step that caps every language /
    * source / quality bucket at a fixed size without a random generator.
    *
    * The per-stratum rank orders by (md5(id), id): a pure function of the
    * record, so the selected set is stable across runs, engines and
    * partitionings, and statistically uniform within the stratum (md5 is
    * equidistributed). Spark 4 plans the rank-≤-n filter as
    * WindowGroupLimit: each task keeps a size-n heap per stratum before
    * the one shuffle on the stratum key, so the exchange carries
    * O(strata × n), not the corpus.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: Column, idCol: String,
                       n: Int): DataFrame = {
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("sample_key"), col(idCol))
    docs
      .withColumn("stratum", stratumCol)
      .withColumn("sample_key", md5(col(idCol).cast("string")))
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
      .drop("sample_key")
  }
}
