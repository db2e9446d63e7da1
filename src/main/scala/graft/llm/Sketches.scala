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
}
