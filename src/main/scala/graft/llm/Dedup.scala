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

  /** MinHash signature: k independent hash functions simulated as
    * md5(j + ":" + shingle); the signature entry j is the lexicographic min
    * over the document's distinct shingles. Hex strings of a uniform hash
    * compare like the underlying 128-bit numbers, so min-of-hex ≙
    * min-of-hash without any integer parsing (and stays expressible in the
    * DuckDB oracle).
    */
  def minhashSignature(shingles: org.apache.spark.sql.Column, k: Int) = {
    val sh = array_distinct(shingles)
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(sh, s => md5(concat(j.cast("string"), lit(":"), s)))))
  }

  /** LSH bands: split the k-entry signature into `bands` contiguous groups
    * of rows and join each group into one bucket key. Two documents are
    * candidates iff they agree on ALL rows of at least one band.
    */
  def lshBands(signature: org.apache.spark.sql.Column, bands: Int, rowsPerBand: Int) =
    transform(sequence(lit(0), lit(bands - 1)),
      b => array_join(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)), "|"))

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
    val sh = docs.select(
      col(idCol).as("id"),
      array_distinct(TextAnalysis.wordShingles(
        TextAnalysis.words(col(textCol)), shingleWords)).as("shingles"))
    val banded = sh.select(
      col("id"), col("shingles"),
      posexplode(lshBands(minhashSignature(col("shingles"), k), bands, rows))
        .as(Seq("band", "bucket")))
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

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, found by
    * 4-block pigeonhole candidate generation: split the 16 bits into 4
    * blocks of 4; any pair within distance 3 must agree on at least one
    * whole block, so candidates are pairs sharing (block index, block
    * value) — a bucket join, never all-pairs.
    */
  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String,
                      maxDist: Int = 3): DataFrame = {
    require(maxDist < 4, "4-block pigeonhole only covers distance <= 3")
    val sigs = docs.select(col(idCol).as("id"),
      simhash16(TextAnalysis.words(col(textCol))).as("sig"))
    val blocked = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => col("sig").substr(b * 4 + 1, lit(4)))).as(Seq("block", "bval")))
    blocked.as("a")
      .join(blocked.as("b"),
        col("a.block") === col("b.block") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        hammingBits(col("sig_a"), col("sig_b"), 16).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }
}
