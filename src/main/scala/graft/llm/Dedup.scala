package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for LLM training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH banding, SimHash blocking, and exact n-gram
  * Jaccard verification.
  *
  * Scale design (the part that matters at 100 TB):
  *  - signatures are computed map-side per document (no shuffle);
  *  - candidate generation is a shuffle JOIN on (band index, band
  *    signature) — documents only ever meet inside a band bucket, never
  *    all-pairs; bucket sizes are bounded by band selectivity, and a hot
  *    bucket degrades to a skewed join that AQE splits;
  *  - exact Jaccard verification runs only on the candidate pairs (a tiny
  *    fraction of n²).
  */
object Dedup {

  /** Exact dedup: group documents by content hash, keep the smallest id as
    * the canonical copy. One shuffle on the hash (map-side partial min).
    * Output: one row per content group with the keeper and copy count.
    */
  def exactGroups(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Modulus for the derived minhash permutation family. */
  val MinhashMod = 1000000007L

  /** Per-shingle hash pair (h1, h2): two independent 60-bit values from
    * one md5 — the standard "one hash, k derived permutations" trick, so
    * signature width k costs ONE digest per shingle instead of k.
    */
  def shingleHashes(shingles: org.apache.spark.sql.Column) =
    transform(array_distinct(shingles), s => {
      val h = md5(s)
      struct(
        conv(substring(h, 1, 15), 16, 10).cast("long").as("h1"),
        conv(substring(h, 17, 15), 16, 10).cast("long").as("h2"))
    })

  /** MinHash signature over precomputed (h1, h2) pairs: permutation j is
    * (h1 + j·h2) mod p; the signature entry is its min over the document's
    * shingles. Pure integer arithmetic — cheap per j, and reproducible
    * verbatim in the DuckDB oracle.
    */
  def minhashSignature(hashes: org.apache.spark.sql.Column, k: Int) =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(hashes,
        b => ((b.getField("h1") % MinhashMod) +
          j.cast("long") * (b.getField("h2") % MinhashMod)) % MinhashMod)))

  /** LSH bands: split the k-entry signature into `bands` contiguous groups
    * of rows and join each group into one bucket key. Two documents are
    * candidates iff they agree on ALL rows of at least one band.
    */
  def lshBands(signature: org.apache.spark.sql.Column, bands: Int, rowsPerBand: Int) =
    transform(sequence(lit(0), lit(bands - 1)),
      b => array_join(
        transform(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")), "|"))

  /** Exact Jaccard over two shingle arrays (deduplicated set semantics). */
  def jaccard(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    size(array_intersect(da, db)).cast("double") / size(array_union(da, db))
  }

  /** Full MinHash/LSH near-dup pipeline: shingle → sign → band → bucket
    * join → exact-Jaccard verify. Returns confirmed pairs
    * (id_a < id_b, jaccard ≥ threshold).
    *
    * The self-join on (band, bucket) is the only O(candidates) shuffle;
    * `distinct` collapses pairs that collide in several bands before the
    * (more expensive) verification join runs.
    */
  def minhashNearDups(docs: DataFrame, textCol: String, idCol: String,
                      shingleWords: Int = 3, k: Int = 12, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    require(k % bands == 0, "k must divide evenly into bands")
    val rows = k / bands
    // Persisted on purpose: `sh` is read by the band join (twice, as both
    // sides) AND by the verification joins — without materialization every
    // consumer would re-run the shingle + md5 signature pipeline from
    // the source. The persisted artifacts are O(docs × k) — tiny relative
    // to the corpus text they summarize.
    // hv lives INSIDE the persisted projection: the cache is a plan
    // barrier, so the 12 permutation expressions read the one materialized
    // md5 pair per shingle instead of CollapseProject inlining the digest
    // into every j.
    val shingleExpr = array_distinct(TextAnalysis.wordShingles(
      TextAnalysis.words(col(textCol)), shingleWords))
    val sh = docs.select(
      col(idCol).as("id"),
      shingleExpr.as("shingles"),
      shingleHashes(shingleExpr).as("hv"))
      .persist()
    val banded = sh
      .select(col("id"),
        posexplode(lshBands(minhashSignature(col("hv"), k), bands, rows))
          .as(Seq("band", "bucket")))
      .persist()
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(sh.select(col("id"), col("shingles").as("sh_a")), col("id_a") === col("id"))
      .drop("id")
      .join(sh.select(col("id"), col("shingles").as("sh_b")), col("id_b") === col("id"))
      .drop("id")
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 16-bit SimHash over the document's word stream. Bit p is the sign of
    * the sum over words of ±1, where the vote of word w is the high bit of
    * the p-th hex nibble of md5(w) — word frequency acts as the classic
    * SimHash weight because the words array keeps duplicates. Emitted as a
    * 16-char '0'/'1' string (comparable and oracle-friendly).
    */
  def simhash16(ws: org.apache.spark.sql.Column) = {
    val hashes = transform(ws, w => md5(w))
    concat_ws("",
      (1 to 16).map { p =>
        val vote = aggregate(hashes, lit(0),
          (acc, h) => acc + when(substring(h, p, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
        when(vote > 0, lit("1")).otherwise(lit("0"))
      }: _*)
  }

  /** Hamming distance between two equal-length bit strings. */
  def hammingBits(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column, n: Int) =
    size(filter(sequence(lit(1), lit(n)),
      p => a.substr(p, lit(1)) =!= b.substr(p, lit(1))))

  /** 16-bit SimHash as an integer (bit p of 16..1 set iff the vote sum is
    * positive — the same bits simhash16 renders as '1' chars). Integer
    * form so pair hamming is one codegen'd `bit_count(xor)` instead of 16
    * substring compares — the difference between streaming millions of
    * skewed candidate pairs through a filter and shuffling them.
    */
  def simhash16Int(hashes: org.apache.spark.sql.Column) =
    (1 to 16).map { p =>
      val vote = aggregate(hashes, lit(0),
        (acc, h) => acc + when(h.substr(p, 1)
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1).otherwise(-1))
      when(vote > 0, lit(1 << (16 - p))).otherwise(lit(0))
    }.reduce(_ + _)

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, found by
    * 4-block pigeonhole candidate generation: split the 16 bits into 4
    * nibbles; any pair within distance 3 must agree on at least one whole
    * nibble, so candidates are pairs sharing (block index, block value) —
    * a bucket join, never all-pairs.
    *
    * Skew-hardened: the hamming filter runs map-side DIRECTLY on the join
    * output (ints only, bit_count(xor)), so a degenerate hot bucket costs
    * a streamed codegen scan of its pairs, never a wide shuffle; the
    * distinct that collapses multi-block collisions only sees pairs that
    * already passed the distance cut.
    */
  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String,
                      maxDist: Int = 3): DataFrame = {
    require(maxDist < 4, "4-block pigeonhole only covers distance <= 3")
    // Two persisted steps so the md5-per-word array is computed once and
    // the 16 vote aggregates reuse it (HOF aggregates defeat expression
    // CSE), and the band join reads tiny (id, sig) ints on both sides.
    val hs = docs.select(col(idCol).as("id"),
      transform(TextAnalysis.words(col(textCol)), w => md5(w)).as("hs"))
    val sigs = hs.select(col("id"), simhash16Int(col("hs")).as("sig")).persist()
    val blocked = sigs.select(col("id"), col("sig"),
      posexplode(array((0 to 3).map(b =>
        shiftright(col("sig"), b * 4).bitwiseAND(lit(15))): _*))
        .as(Seq("block", "bval")))
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.block") === col("b.block") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }
}
