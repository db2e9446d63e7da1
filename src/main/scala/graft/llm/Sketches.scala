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
    probes.join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy(col("term")).agg(min(col("cnt")).as("est_cnt"))
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
}
