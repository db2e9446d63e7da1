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

  /** Pretraining SEQUENCE PACKING — the pass that turns a curated corpus
    * into fixed-length training sequences: documents are concatenated in
    * deterministic id order within each shard and the token stream is
    * cut into windows of exactly `seqLen` tokens, documents SPANNING
    * window boundaries (the GPT-style pack; [[packBins]] is the
    * no-split bin variant). Emits one row per (shard, window): how many
    * documents touch it, the first/last document id, and its fill
    * (= seqLen everywhere except each shard's final window).
    *
    * Shape — the gapFill span-explode pattern at token granularity: one
    * shuffle on the shard key, a per-shard prefix-sum window gives each
    * document its [start, end) offsets in the shard stream, a map-side
    * sequence()+explode fans each document to the ceil(n/seqLen)+1
    * windows it overlaps, and a partial-combined agg keyed on
    * (shard, window) builds the output. Nothing is ever materialized at
    * token scale; per-window fill is the exact integer overlap sum.
    *
    * Empty documents (0 tokens) occupy no window and are dropped —
    * sequence() would otherwise count DOWN from start/L to (start-1)/L.
    */
  def seqPack(docs: DataFrame, idCol: String, nTokensCol: String,
              seqLen: Long, shards: Int): DataFrame = {
    require(seqLen > 0 && shards > 0)
    val id = col(idCol)
    val shard = pmod(conv(substring(md5(concat(id.cast("string"),
      lit(":sp"))), 1, 8), 16, 10).cast("long"), lit(shards))
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withOff = docs
      .select(id.as("id"), col(nTokensCol).cast("long").as("n"),
        shard.as("shard"))
      .filter(col("n") > 0)
      .withColumn("end", sum(col("n")).over(w))
      .withColumn("start", col("end") - col("n"))
    withOff
      .select(col("shard"), col("id"), col("start"), col("end"),
        explode(sequence(floor(col("start") / seqLen),
          floor((col("end") - 1) / seqLen))).as("win"))
      .groupBy(col("shard"), col("win"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("id")).as("first_doc"), max(col("id")).as("last_doc"),
        sum(least(col("end"), (col("win") + 1) * seqLen) -
          greatest(col("start"), col("win") * seqLen)).as("n_tokens"))
  }

  /** Uniform [0, 1) double from the record id under a named salt: first
    * 15 md5 hex digits (60 bits) over 2^60. Integer-to-double division of
    * a value < 2^60 is a single correctly-rounded IEEE op, so any engine
    * with md5 reproduces the draw bit-for-bit.
    */
  def hashUniform(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long").cast("double") / 1152921504606846976.0d

  /** Deterministic corpus shuffle + sharding: the write-side pass that
    * turns a curated corpus into N training shards with a reproducible
    * pseudo-random document order (dataloaders then read shards
    * sequentially — the shuffle must happen here, at write time).
    *
    * shard = 32-bit md5 slice of the id mod numShards; within-shard
    * position = rank by a second, independent md5 slice (salted
    * differently, so shard choice and order are uncorrelated). Both are
    * pure functions of the id: stable across runs, engines and cluster
    * sizes, no RNG state.
    *
    * Scale shape: exactly Spark's shard-write pattern — one shuffle on
    * `shard` (the repartition a sharded write performs anyway), then a
    * per-shard sort for rank. Spark plans the row_number as sort + running
    * count within each shard's partition; nothing global. At 100 TB with
    * numShards sized to ~1-4 GB each this is the standard corpus
    * materialization plan.
    */
  def shuffleShard(docs: DataFrame, idCol: String, numShards: Int): DataFrame = {
    val id = col(idCol)
    val shard = conv(substring(md5(concat(id.cast("string"), lit(":shard"))),
      1, 8), 16, 10).cast("long") % numShards
    val w = Window.partitionBy(col("shard")).orderBy(col("ord_key"), id)
    docs
      .withColumn("shard", shard)
      .withColumn("ord_key", md5(concat(id.cast("string"), lit(":ord"))))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .drop("ord_key")
  }

  /** Domain-mixture subsampling at temperature alpha = 0.5 — the
    * source-rebalancing pass of pretraining mixes (flatten the source
    * distribution p_s toward p_s^alpha by subsampling overrepresented
    * sources; the rarest source keeps everything, a source k× larger
    * keeps sqrt(1/k) of its docs). Acceptance is a deterministic
    * per-record hash draw, so the sampled corpus is reproducible with no
    * RNG state and no coordination.
    *
    * alpha is fixed at 0.5 because its rate sqrt(c_min/c_s) is built
    * from two correctly-rounded IEEE ops (long/long divide, sqrt) —
    * bit-identical on every engine, unlike a general pow whose last ulp
    * is library-dependent (and would make accept/reject flip on the
    * u < rate boundary between engines).
    *
    * Scale shape: per-source counts is a tiny two-level agg (sources are
    * a bounded vocabulary); the rate table broadcasts; acceptance is a
    * map-side filter. The corpus itself never shuffles.
    */
  def mixtureSampleSqrt(docs: DataFrame, sourceCol: String,
                        idCol: String): DataFrame = {
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("src_cnt"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("src_cnt")).as("min_cnt"))))
      .select(col(sourceCol),
        sqrt(col("min_cnt").cast("double") / col("src_cnt")).as("accept_rate"))
    docs.join(broadcast(rates), Seq(sourceCol))
      .filter(hashUniform(col(idCol), ":mix") < col("accept_rate"))
      .drop("accept_rate")
  }

  /** Token-budget selection: keep the highest-quality documents whose
    * running token total stays within `budget` — the "best N tokens"
    * curation pass (quality-ranked corpus truncation). Semantics are the
    * global rule: order by (score desc, id), accept while the inclusive
    * token cumsum ≤ budget.
    *
    * A naive global-order running sum is a single-partition window — the
    * one Spark shape that cannot scale. Instead: quantize the score into
    * `score/granularity` buckets, aggregate per-bucket token sums (bounded
    * by maxScore/granularity rows — driver-safe like seedCentroids),
    * walk the prefix on the driver to find the boundary bucket, then
    * (a) accept every doc in buckets strictly above the boundary with a
    * map-side filter — no shuffle, no sort — and (b) run the exact
    * windowed cumsum ONLY inside the boundary bucket (~1/granularity of
    * the corpus). Because the bucket is monotone in the score, the result
    * is identical to the global rule; only the boundary slice ever sorts.
    *
    * `scoreIntCol` must be an integer score (exact cross-engine ordering;
    * float scores can flip order in the last ulp between engines).
    */
  def budgetSelect(docs: DataFrame, idCol: String, scoreIntCol: String,
                   tokenCol: String, budget: Long,
                   granularity: Long = 1024L): DataFrame = {
    val bucket = (col(scoreIntCol).cast("long") / granularity)
      .cast("long").as("score_bucket")
    val withB = docs.withColumn("score_bucket", bucket)
    val sums = withB.groupBy(col("score_bucket"))
      .agg(sum(col(tokenCol)).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(-_._1)
    var running = 0L
    var boundary = Option.empty[(Long, Long)] // (bucket, remaining budget)
    sums.foreach { case (b, t) =>
      if (boundary.isEmpty) {
        if (running + t <= budget) running += t
        else boundary = Some(b -> (budget - running))
      }
    }
    val full = withB.filter(boundary match {
      case Some((b, _)) => col("score_bucket") > b
      case None         => lit(true)
    })
    val edge = boundary match {
      case None => full.limit(0)
      case Some((b, remaining)) =>
        val w = Window.partitionBy(col("score_bucket"))
          .orderBy(col(scoreIntCol).desc, col(idCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        withB.filter(col("score_bucket") === b)
          .withColumn("cum", sum(col(tokenCol)).over(w))
          .filter(col("cum") <= remaining)
          .drop("cum")
    }
    full.unionByName(edge).drop("score_bucket")
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

  /** The aggregate form of [[stratifiedSample]]: the k hash-smallest
    * records per group through the native bounded-heap
    * [[org.apache.spark.sql.graft.BottomK]] typed imperative aggregate
    * instead of a rank window. Same deterministic-sample semantics
    * (md5-of-id order, 60-bit long key); different physical shape:
    * ObjectHashAggregate with size-k per-group state and MAP-SIDE
    * partial combine — no sort anywhere in the plan, and at most k rows
    * per (task, group) ever reach the exchange, where the window form
    * shuffles whole groups and sorts them (WindowGroupLimit trims per
    * task but losers still flow). At 100 TB with a handful of strata,
    * bounded aggregate state is the difference between a metadata-sized
    * shuffle and a corpus-sized one.
    *
    * @return one row per group: (group, sample array<struct(ord,
    *         id, payload...)> ascending by ord)
    */
  def groupSample(docs: DataFrame, groupCol: Column, idCol: String,
                  k: Int, payloadCols: Seq[String]): DataFrame = {
    val ord = conv(substring(md5(col(idCol).cast("string")), 1, 15),
      16, 10).cast("long")
    docs.groupBy(groupCol.as("group"))
      .agg(graft.GraftExtensions.bottomK(
        struct((ord.as("ord") +: col(idCol).as("id") +:
          payloadCols.map(col)): _*), k).as("sample"))
  }

  /** Explicit-target-weights mixture subsampling — the Pile-style
    * mixture spec: the caller states each source's intended SHARE of a
    * `budget`-document corpus as an integer numerator over `weightDen`
    * (integers, not floats, so the spec itself is engine-exact), and
    * each source keeps rate_s = min(1, (w_s · budget) / (weightDen · c_s))
    * of its documents. Sources absent from the spec are dropped — an
    * explicit mixture is a whitelist. Under-represented sources clamp at
    * rate 1 (subsampling cannot invent data; upsampling is the
    * dataloader's job at read time).
    *
    * The acceptance draw is the [[hashUniform]] md5 construction; the
    * rate is two exact long→double conversions, one multiply each side,
    * one divide — a fixed rounding sequence both engines reproduce.
    *
    * Scale shape: identical to [[mixtureSampleSqrt]] — a tiny per-source
    * count agg, a broadcast rate table, and a map-side filter; the
    * corpus never shuffles.
    */
  def mixtureSampleTarget(docs: DataFrame, sourceCol: String, idCol: String,
                          weights: Seq[(String, Int)], weightDen: Int,
                          budget: Long): DataFrame = {
    require(weights.nonEmpty && weightDen > 0 && budget > 0)
    // a duplicated source row would fan the rate join out and emit every
    // surviving doc of that source TWICE — duplicate doc_ids are exactly
    // what a dedup'd training mixture must never produce
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate source in mixture spec: ${weights.map(_._1).diff(weights.map(_._1).distinct).distinct.mkString(", ")}")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weights.toDF(sourceCol, "w_num")
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("src_cnt"))
    val rates = counts.join(w, Seq(sourceCol))
      .select(col(sourceCol),
        least(lit(1.0),
          (col("w_num").cast("double") * budget) /
            (lit(weightDen).cast("double") * col("src_cnt"))).as("accept_rate"))
    docs.join(broadcast(rates), Seq(sourceCol))
      .filter(hashUniform(col(idCol), ":mixt") < col("accept_rate"))
      .drop("accept_rate")
  }

  /** Deterministic weighted sampling WITHOUT replacement, n per stratum —
    * the quality-weighted corpus subsampling pass (keep n docs per
    * language/source, preferring high-weight docs, but with randomized
    * diversity rather than a hard top-n-by-weight cutoff).
    *
    * Algorithm A-ES (Efraimidis & Spirakis 2006): each record draws
    * u ~ U(0,1) and gets key u^(1/w); the top-n keys per stratum are an
    * exact weighted sample without replacement. Ordering by u^(1/w) is
    * equivalent to ordering by ln(u)/w (ln is monotone, w > 0), which
    * avoids the engine-dependent last-ulp of a general pow. The draw is
    * the [[hashUniform]] md5 construction — a pure function of the record
    * id, so the sample is reproducible across runs, engines, and cluster
    * sizes with no RNG state. The key is floored onto the 2^20 fixed-point
    * grid with id as the final tie-break (the trigramLmScore / dsirWeights
    * determinism contract: comparisons happen on exact longs, never on
    * engine-rounded doubles).
    *
    * Scale shape: identical to [[stratifiedSample]] — Spark plans the
    * rank-≤-n filter as WindowGroupLimit, so each task keeps a size-n heap
    * per stratum before the one shuffle on the stratum key; the exchange
    * carries O(strata × n) rows, not the corpus.
    *
    * `weightCol` must be strictly positive (rows with w ≤ 0 are dropped —
    * they have zero selection probability in the A-ES model).
    */
  def weightedSample(docs: DataFrame, stratumCol: Column, idCol: String,
                     weightCol: Column, n: Int): DataFrame = {
    val u = hashUniform(col(idCol), ":wsamp")
    val keyFp = floor(log(u) / weightCol.cast("double") * lit(1048576.0))
      .cast("long")
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("sample_key").desc, col(idCol))
    docs
      .filter(weightCol > 0)
      .withColumn("stratum", stratumCol)
      .withColumn("sample_key", keyFp)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every RAW
    * document by how much it resembles a small TARGET domain (the
    * canonical use: pick web text that looks like Wikipedia), using
    * hashed n-gram features.
    *
    * Model: features are unigrams + adjacent bigrams, hashed into
    * `buckets` slots (the paper's 10⁴-bucket hashed n-gram model).
    * Target distribution p and raw distribution q are add-1-smoothed
    * bucket frequencies; a document's log importance weight is
    *   log w(doc) = Σ_features [ln p(b(f)) − ln q(b(f))]
    * Selection is then top-k by weight (the zero-temperature limit of
    * the paper's Gumbel resampling — deterministic, so the selected set
    * is reproducible across runs and engines with no RNG state).
    *
    * Determinism: each bucket's log-ratio is floored onto the 2^20
    * fixed-point grid ONCE (on the `buckets`-row table), and the per-doc
    * weight is an exact integer SUM of those longs — order-free across
    * partitions, retries, and engines (the trigramLmScore contract).
    *
    * Scale shape — why hashed features matter at 100 TB: the corpus-wide
    * state is exactly `buckets` rows regardless of corpus size (a vocab
    * or bigram table grows near-linearly and stops broadcasting; the
    * hashed model never does). One explode, one `buckets`-row broadcast
    * join, one partially-combined groupBy(doc_id) — the only shuffle is
    * on doc_id, carrying one row per (doc, feature). The target slice is
    * typically a separate small corpus; here it is carved from `docs` by
    * the `isTarget` predicate so both distributions come off one scan.
    *
    * @return one row per RAW (non-target) document:
    *         (doc_id, n_feats, weight_fp) — weight_fp is the 2^20
    *         fixed-point log importance weight, 0 for featureless docs
    */
  def dsirWeights(docs: DataFrame, isTarget: Column, buckets: Int = 64,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val wsArr = filter(TextAnalysis.words(col(textCol)), w => length(w) > 0)
    val featArr = concat(wsArr, TextAnalysis.wordShingles(wsArr, 2))
    val stream = docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_t"),
        explode(featArr).as("f"))
      .withColumn("b",
        conv(substring(md5(col("f")), 1, 8), 16, 10).cast("long") % buckets)
    val counts = stream.groupBy(col("b")).agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("tc"),
      sum(when(!col("is_t"), 1L).otherwise(0L)).as("rc"))
    val totals = counts.agg(sum(col("tc")).as("t_tot"),
      sum(col("rc")).as("r_tot"))
    // log-ratio per bucket, fixed-pointed once on the tiny table; empty
    // buckets never appear in any document either, so they need no row
    val lam = counts.crossJoin(broadcast(totals)).select(col("b"),
      floor((log((col("tc") + 1).cast("double") /
               (col("t_tot") + lit(buckets)).cast("double"))
           - log((col("rc") + 1).cast("double") /
               (col("r_tot") + lit(buckets)).cast("double")))
        * lit(1048576.0)).cast("long").as("lam_fp"))
    val weights = stream.filter(!col("is_t"))
      .join(broadcast(lam), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lam_fp")).as("weight_fp"))
    docs.filter(!isTarget).select(col(idCol).as("doc_id"))
      .join(weights, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("weight_fp"), lit(0L)).as("weight_fp"))
  }

  /** Exact equal-frequency score buckets (CCNet-style head/middle/tail
    * corpus partitioning, Wenzek et al. 2020): rank every record by an
    * INTEGER score (fixed-point grids only — a float rank key reintroduces
    * the cross-engine ulp wobble everywhere else in this engine avoids),
    * then bucket by rank so each bucket holds an equal share.
    *
    * Scale design — the whole point of this operator: the naive spelling
    * is `ntile(n) OVER (ORDER BY score)`, and an ORDER BY window with no
    * PARTITION BY moves the ENTIRE corpus into one task — the single
    * worst scale killer Spark offers. Instead the global rank is computed
    * the distributed way: range-repartition on (score, id) (Spark's sort
    * machinery — sampled range boundaries, each partition gets a disjoint
    * key range), sort within partitions, then zipWithIndex, which runs
    * one small job to count per-partition sizes and assigns each row
    * `partition offset + local index` map-side. Every stage is
    * distributed; the only global state is the partition-count array on
    * the driver. Determinism: (score, id) is a total order (id unique),
    * so ranks — and buckets — are identical regardless of how the range
    * boundaries fall.
    *
    * bucket = rank·n / count + 1 in EXACT integer math (the float
    * spelling `cast(rank*n/count as long)` can misround at the boundary
    * for counts past 2^26). Bucket 1 = lowest scores; remainder rows
    * spread one-per-bucket from the front, the ntile convention.
    *
    * @return (id, score, rank 1-based, bucket 1..n), one row per input
    */
  def rankBuckets(scored: DataFrame, nBuckets: Int,
                  scoreCol: String, idCol: String): DataFrame = {
    require(nBuckets >= 1, "need at least one bucket")
    val spark = scored.sparkSession
    // (id, score) is the LIGHTWEIGHT PROXY of the scoring pipeline above
    // (16 bytes/row — guide §8's decide-on-small-rows shape): persist it,
    // because THREE jobs consume it — the total count, zipWithIndex's
    // partition-size job, and the ranked result itself. Unpersisted,
    // each re-ran the entire upstream scorer (measured: the ccnet entry
    // evaluated its trigram pipeline 3×). Lifecycle: the returned frame
    // reads this cache, so it cannot be unpersisted here — the harnesses
    // release all persistent RDDs per entry; long-lived embeddings own
    // the same duty after materializing (see TextAnalysis.ngramCounts).
    val proj = scored
      .select(col(idCol).cast("long"), col(scoreCol).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = proj.count()
    val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (total / 1000 + 1).toInt))
    val sorted = proj
      .repartitionByRange(parts, col(scoreCol), col(idCol))
      .sortWithinPartitions(col(scoreCol), col(idCol))
    val nb = nBuckets.toLong
    val ranked = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.getLong(0), r.getLong(1), i + 1L,
        // ntile: the first (total % nb) buckets get the extra row, i.e.
        // bucket b covers ranks in [b·total/nb, (b+1)·total/nb)
        i * nb / total + 1L)
    }
    spark.createDataFrame(ranked,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
