package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-memory corpus sketches. The common thread: corpus-scale
  * statistics whose STATE is a constant-size table no matter how big the
  * corpus is — the thing that lets a 100 TB pass keep one bounded
  * aggregation where the exact computation would shuffle the whole
  * vocabulary.
  *
  * Determinism: all bucket hashes are md5-derived (`int(md5(term+'#'+j)
  * [0,8)) mod width`) — the proven cross-engine hash used by the LSH and
  * Bloom paths — so sketch contents and every estimate are bit-exact
  * reproducible in any engine.
  */
object Sketches {

  /** Row-`j` count-min bucket of a term. */
  private def cmsBucket(term: Column, j: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(term, lit(s"#$j"))), 1, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build a count-min sketch (Cormode & Muthukrishnan) of the corpus
    * word stream: `depth` independent hash rows × `width` buckets, cell =
    * number of word occurrences hashing there. ONE aggregation whose
    * result is depth·width rows REGARDLESS of corpus size — the
    * fixed-memory substitute for the full vocabulary groupBy (whose key
    * count grows with the corpus). Map-side partial combine does the
    * heavy lifting: each task emits at most depth·width partial cells.
    *
    * @return (j, bucket, cnt) — absent cells are zero
    */
  def cmsBuild(docs: DataFrame, depth: Int = 3, width: Int = 1024,
               textCol: String = "text"): DataFrame =
    docs.select(explode(TextAnalysis.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), cmsBucket(col("w"), j, width).as("bucket"))
      ): _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate the counts of `candidates` (a small table with a
    * `term` column) against a built sketch: est = min over rows of the
    * bucket cell. The sketch side is depth·width rows — broadcast by
    * size, so estimation is a map-side join over the candidate stream.
    * CMS guarantee (pinned by the entry's oracle): est ≥ exact always;
    * overshoot is bounded by collisions with the rest of the stream.
    *
    * @return (term, est_cnt)
    */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame,
                  depth: Int = 3, width: Int = 1024,
                  termCol: String = "term"): DataFrame = {
    val probes = candidates
      .select(col(termCol).as("term"), explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), cmsBucket(col(termCol), j, width).as("bucket"))
      ): _*)).as("jb"))
      .select(col("term"), col("jb.j").as("j"), col("jb.bucket").as("bucket"))
    // LEFT join + zero-fill: an absent cell IS a zero count, and it must
    // participate in the min — an inner join would silently drop empty
    // cells, inflating a cold term that collides with one hot bucket to
    // that bucket's count (the exact overestimate the k-row min exists
    // to kill) and dropping all-cold terms from the output entirely
    probes.join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Fixed-point alpha for the m=256 HyperLogLog estimator:
    * floor(10^6 · 0.7213/(1 + 1.079/256)). The estimate is defined by
    * THIS rational, in THIS division order — both the Spark plan and the
    * oracle compute `(ALPHA_FP·m²·2^25 div S') div 10^6` in exact long
    * arithmetic, so the estimate is engine-identical to the last digit.
    */
  private val HllAlphaFp = 718272L

  /** HyperLogLog distinct-count estimate (Flajolet et al. 2007) over an
    * item column, in ALL-INTEGER register arithmetic: md5 32-bit hash,
    * b=8 → m=256 registers (bucket = h mod 256, remaining 24 bits), rank
    * ρ = 25 − bitlength(v) (v=0 → 25), register = max ρ. Instead of the
    * float Σ2^−Mj, the plan sums S' = Σ 2^(25−Mj) as a long (≤ 2^33) and
    * divides the fixed-point alpha rational once at the end — no float
    * ever exists, so the estimate is bit-exact across engines, which a
    * textbook double implementation is not (float sum order varies).
    *
    * Raw-regime estimator only (no small/large-range correction): valid
    * when n ≳ 5/2·m ≈ 640 — corpus-cardinality territory, which is the
    * use case. Scale shape: one partial-combined 256-row max
    * aggregation; the register table is CONSTANT-size state mergeable
    * across shards/streams (max per register), the reason HLL is the
    * production cardinality operator.
    *
    * @return one row: (n_est)
    */
  def hllDistinct(items: DataFrame, itemCol: String = "item"): DataFrame = {
    val m = 256L
    val width1 = 25 // 24 remaining hash bits + 1
    val h = conv(substring(md5(col(itemCol)), 1, 8), 16, 10).cast("long")
    val v = floor(h / lit(m)).cast("long")
    val rho = when(v === 0L, lit(width1))
      .otherwise(lit(width1) - length(ltrim(bin(v), "0")))
    val regs = items
      .select(pmod(h, lit(m)).as("j"), rho.cast("long").as("rho"))
      .groupBy(col("j")).agg(max(col("rho")).as("mj"))
    val spark = items.sparkSession
    val all = spark.range(m).select(col("id").as("j"))
      .join(regs, Seq("j"), "left")
      .select(coalesce(col("mj"), lit(0L)).as("mj"))
    // `div` = IntegralDivide: exact long division (floor(a/b) via double
    // would corrupt the ~2^60 numerator past double's 53-bit mantissa)
    all.agg(sum(call_function("shiftleft", lit(1L),
        (lit(width1) - col("mj")).cast("int"))).as("sp"))
      .select(call_function("div",
        call_function("div",
          lit(HllAlphaFp * m * m) * lit(1L << width1), col("sp")),
        lit(1000000L)).cast("long").as("n_est"))
  }

  private val HllM = 256L
  private val HllWidth1 = 25 // 24 remaining hash bits + 1

  /** Sparse HLL register table of an item stream: (j, mj) for the
    * registers at least one item hashed into (absent registers are mj=0
    * by definition). One partial-combined max aggregation, ≤ 256 output
    * rows regardless of corpus size — the mergeable sketch state: union
    * of two corpora = per-register MAX of their tables, which is what
    * makes HLL the production cardinality operator across shards,
    * streams, and time windows.
    */
  def hllRegisters(items: DataFrame, itemCol: String = "item"): DataFrame = {
    val h = conv(substring(md5(col(itemCol)), 1, 8), 16, 10).cast("long")
    val v = floor(h / lit(HllM)).cast("long")
    val rho = when(v === 0L, lit(HllWidth1))
      .otherwise(lit(HllWidth1) - length(ltrim(bin(v), "0")))
    items.select(pmod(h, lit(HllM)).as("j"), rho.cast("long").as("rho"))
      .groupBy(col("j")).agg(max(col("rho")).as("mj"))
  }

  /** Estimate from a sparse register table WITHOUT densifying: an absent
    * register contributes 2^25 to S', so S' = Σ_present 2^(25−mj) +
    * (m − n_present)·2^25 — same exact-integer rational as
    * [[hllDistinct]], minus its range join. One row: (n_est).
    */
  def hllEstimate(regs: DataFrame): DataFrame =
    regs.agg(
        // empty register table (empty corpus): sum over zero rows is
        // NULL, which would propagate NULL estimates through hllOverlap —
        // zero-fill so an empty sketch estimates like an all-zero one
        coalesce(sum(call_function("shiftleft", lit(1L),
          (lit(HllWidth1) - col("mj")).cast("int"))), lit(0L)).as("spp"),
        count(lit(1)).as("npres"))
      .select(call_function("div",
        call_function("div",
          lit(HllAlphaFp * HllM * HllM) * lit(1L << HllWidth1),
          col("spp") + (lit(HllM) - col("npres")) * lit(1L << HllWidth1)),
        lit(1000000L)).cast("long").as("n_est"))

  /** Corpus-overlap cardinality estimate by HLL inclusion–exclusion:
    * |A∩B| ≈ E(A) + E(B) − E(A∪B), where the union sketch is the
    * per-register max of the two register tables — the merge identity,
    * no third pass over either corpus. This is how "how much of crawl B
    * is already in corpus A" is answered at 100 TB without a join:
    * three constant-size sketches, one subtraction. The estimate can go
    * ≤ 0 when the true overlap is small relative to the ±1.04/√m noise
    * of the three estimates — clamped at 0, and that behavior is part of
    * the contract (inclusion–exclusion differences are noisier than the
    * individual estimates).
    *
    * @return one row: (n_est_a, n_est_b, n_est_union, n_est_overlap)
    */
  def hllOverlap(a: DataFrame, b: DataFrame,
                 itemCol: String = "item"): DataFrame = {
    val ra = hllRegisters(a, itemCol)
    val rb = hllRegisters(b, itemCol)
    val ru = ra.unionByName(rb).groupBy(col("j")).agg(max(col("mj")).as("mj"))
    hllEstimate(ra).withColumnRenamed("n_est", "n_est_a")
      .crossJoin(hllEstimate(rb).withColumnRenamed("n_est", "n_est_b"))
      .crossJoin(hllEstimate(ru).withColumnRenamed("n_est", "n_est_union"))
      .withColumn("n_est_overlap",
        greatest(lit(0L), col("n_est_a") + col("n_est_b") - col("n_est_union")))
  }

  /** Per-group HLL distinct: one register table per group key — the
    * "distinct URLs per domain" / "distinct shingles per source" shape.
    * State is ≤ 256 rows PER GROUP however large the group's item stream
    * is, and the (group, j) max aggregation partial-combines map-side,
    * so the shuffle carries at most 256 rows per group per task — the
    * fixed-memory replacement for count(DISTINCT) per group, whose
    * per-group key sets grow with the corpus.
    *
    * @return one row per group: (group, n_est)
    */
  def hllDistinctBy(items: DataFrame, groupCol: String,
                    itemCol: String = "item"): DataFrame = {
    val h = conv(substring(md5(col(itemCol)), 1, 8), 16, 10).cast("long")
    val v = floor(h / lit(HllM)).cast("long")
    val rho = when(v === 0L, lit(HllWidth1))
      .otherwise(lit(HllWidth1) - length(ltrim(bin(v), "0")))
    items
      .select(col(groupCol).as("grp"), pmod(h, lit(HllM)).as("j"),
        rho.cast("long").as("rho"))
      .groupBy(col("grp"), col("j")).agg(max(col("rho")).as("mj"))
      .groupBy(col("grp"))
      .agg(
        sum(call_function("shiftleft", lit(1L),
          (lit(HllWidth1) - col("mj")).cast("int"))).as("spp"),
        count(lit(1)).as("npres"))
      .select(col("grp"),
        call_function("div",
          call_function("div",
            lit(HllAlphaFp * HllM * HllM) * lit(1L << HllWidth1),
            col("spp") + (lit(HllM) - col("npres")) * lit(1L << HllWidth1)),
          lit(1000000L)).cast("long").as("n_est"))
  }

  /** EXACT heavy hitters in two passes and O(k) memory — every item whose
    * frequency strictly exceeds total/`denom`, over a stream whose full
    * groupBy would be vocabulary-scale:
    *
    *  1. sketch pass: the native mergeable [[graft.GraftExtensions
    *     .misraGries]] aggregate (capacity `k`, partial→final merge via
    *     the Agarwal et al. mergeable-summaries combine) yields ≤ k
    *     CANDIDATES with the no-false-negative guarantee for any item
    *     above total/(k+1);
    *  2. confirm pass: the candidate items (bounded, model-sized — the
    *     codebook-collect convention) become a plan literal; only rows
    *     matching a candidate enter a k-key exact count.
    *
    * Because the candidate set provably contains every true heavy
    * hitter (k ≥ denom makes total/(k+1) < total/denom) and the final
    * filter uses EXACT counts, the output is the true heavy-hitter set
    * — deterministic under any row order, partitioning, or merge
    * schedule, even though the sketch's internal estimates are not.
    *
    * @param items single string column of stream items
    * @param k     sketch capacity (counters); must be ≥ `denom`
    * @param denom threshold denominator: keep freq·denom > total
    * @return (item, freq) for every item with freq·denom > total
    */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int,
                   denom: Long): DataFrame = {
    require(k >= denom, s"capacity $k must be >= threshold denominator " +
      s"$denom or the no-false-negative guarantee breaks")
    val st = items.agg(
      graft.GraftExtensions.misraGries(col(itemCol), k).as("cand"),
      count(col(itemCol)).as("total")).head()
    val total = st.getLong(1)
    val cand = st.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    if (cand.isEmpty) return items.sparkSession.emptyDataFrame
      .select(lit("").as("item"), lit(0L).as("freq"))
    items
      .filter(col(itemCol).isin(cand: _*))
      .groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") * denom > total)
  }
}
