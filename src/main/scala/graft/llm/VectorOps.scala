package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector/embedding operators: norms, cosine similarity, brute-force and
  * LSH-bucketed approximate nearest neighbors over an `Array[Float]`
  * embedding column.
  *
  * Determinism contract: every reduction over vector components is an
  * explicit LEFT FOLD in component order (functions.aggregate), never an
  * unordered sum — IEEE doubles folded in the same order are bit-identical
  * across engines, which is what lets the DuckDB oracle reproduce cosines
  * exactly instead of within-epsilon.
  *
  * Scale design: embeddings are cast to array<double> once at the edge;
  * per-vector ops are map-side; brute-force top-k uses a two-phase
  * (per-partition, then global) rank so the final shuffle carries only
  * k rows per (query, partition) instead of the full corpus; the LSH
  * variant prunes to same-bucket candidates before any exact math.
  */
object VectorOps {

  /** Ordered-fold dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, p) => acc + p)

  /** L2 norm (ordered fold of squares). */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Unit-normalize a vector (zero vectors pass through as zeros). */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, a).otherwise(transform(a, x => x / n))
  }

  /** Brute-force exact top-k cosine neighbors of each query vector.
    *
    * @param corpus  (id, vec) — vec already array<double>
    * @param queries (qid, qvec) — SMALL (broadcast); e.g. the probe set
    * @return (qid, rank, id, cos) with rank 1..k, self-match excluded when
    *         ids coincide
    *
    * Two-phase rank: phase 1 keeps the top-k of each corpus partition for
    * each query (window over (qid, partition)), phase 2 ranks the
    * ≤ k·partitions survivors globally per query. At 100 TB the phase-2
    * input is tiny no matter how big the corpus is.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries), col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        cosine(col("vec"), col("qvec")).as("cos"),
        spark_partition_id().as("part"))
    val local = Window.partitionBy(col("qid"), col("part"))
      .orderBy(col("cos").desc, col("id"))
    val global = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id"))
    scored
      .withColumn("lr", row_number().over(local)).filter(col("lr") <= k)
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("cos"))
  }

  /** Deterministic random hyperplanes for sign-LSH, seeded so the exact
    * same literals can be embedded in the oracle SQL. java.util.Random's
    * stream is specified by the JDK (LCG), so this is stable everywhere.
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
  }

  /** Sign-LSH bucket id: one bit per hyperplane — '1' iff the ordered-fold
    * dot product with the plane is ≥ 0. Nearby vectors agree on most signs,
    * so same-bucket grouping is a cosine-ANN prefilter.
    */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    concat_ws("", planes.map { p =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) >= 0.0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** LSH-bucketed ANN: exact cosine ranking restricted to candidates in the
    * SAME bucket as the query. The bucket equi-join replaces the cross
    * join — at scale this is the difference between scanning the corpus
    * per query and scanning one bucket per query. Recall is tunable via
    * plane count (fewer planes → bigger buckets → higher recall).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, planes: Seq[Seq[Double]],
              k: Int): DataFrame = {
    val cb = corpus.withColumn("bucket", lshBucket(col("vec"), planes))
    val qb = queries.withColumn("bucket", lshBucket(col("qvec"), planes))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), cosine(col("vec"), col("qvec")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("cos"))
  }
}
