package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector/embedding operators: norms, cosine similarity, brute-force and
  * LSH-bucketed approximate nearest neighbors over an `Array[Float]`
  * embedding column.
  *
  * Determinism contract: every reduction over vector components is a
  * LEFT FOLD in component index order, never an unordered sum — IEEE
  * doubles folded in the same order are bit-identical across engines,
  * which is what lets the DuckDB oracle reproduce cosines exactly instead
  * of within-epsilon. dot/norm/cosine plan as native codegen'd Catalyst
  * expressions (graft.expressions.VecDot/VecL2Norm/VecCosine) whose
  * kernels run that same fold in one fused loop — bit-identical to the
  * `aggregate(zip_with(...))` HOF spelling they replaced, but without
  * the interpreted per-element lambda or the intermediate products
  * array (equivalence asserted by ExpressionSpec).
  *
  * Scale design: embeddings are cast to array<double> once at the edge;
  * per-vector ops are map-side; brute-force top-k uses a two-phase
  * (per-partition, then global) rank so the final shuffle carries only
  * k rows per (query, partition) instead of the full corpus; the LSH
  * variant prunes to same-bucket candidates before any exact math.
  */
object VectorOps {

  /** Ordered-fold dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column = graft.GraftExtensions.vecDot(a, b)

  /** L2 norm (ordered fold of squares). */
  def l2Norm(a: Column): Column = graft.GraftExtensions.vecL2Norm(a)

  /** Cosine similarity. NULL when either vector has zero norm (undefined
    * angle) — the kernel returns null on a zero denominator, the same
    * contract as the try_divide spelling (ANSI mode, Spark 4 default,
    * would turn a plain division into a query-killing DIVIDE_BY_ZERO
    * for one degenerate row).
    */
  def cosine(a: Column, b: Column): Column = graft.GraftExtensions.vecCosine(a, b)

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

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    * standard hybrid-retrieval combiner: each input ranking contributes
    * 1/(k+rank) per item, summed across rankings; items surfaced by
    * several retrievers (lexical BM25, dense ANN, …) rise without any
    * score calibration between them — RRF only reads RANKS, which is why
    * it beats score interpolation across incomparable scorers.
    *
    * Integer form: the contribution is the EXACT integral division
    * 2^20 div (k + rank) — no float exists anywhere, so fused scores and
    * the fused order are engine-exact (the trigramLmScore contract).
    * Ties break on id.
    *
    * Scale shape: input rankings are already top-k-bounded by their
    * retrievers, so this is a union of tiny tables + one
    * partial-combined groupBy(id) — negligible next to the retrieval
    * stages it fuses.
    *
    * @param rankings each (id, rank) with rank 1-based
    * @return (rank, id, rrf_fp, n_lists) ordered by fused rank
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60): DataFrame = {
    require(rankings.nonEmpty)
    val points = rankings.map(_.select(col("id"),
        call_function("div", lit(1048576L), lit(k.toLong) + col("rank"))
          .as("p")))
      .reduce(_ unionByName _)
    val fused = points.groupBy(col("id"))
      .agg(sum(col("p")).as("rrf_fp"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(pmod(col("id"), lit(1)))
      .orderBy(col("rrf_fp").desc, col("id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("id"), col("rrf_fp"), col("n_lists"))
  }

  /** Per-rank nDCG discount table, fixed-point: disc(i) = floor(scale /
    * log2(i + 1)) for i = 1..maxRank. Computed ONCE driver-side with JDK
    * math and embedded as literals in both the plan and the oracle SQL,
    * so no engine ever evaluates a log — the metric is exact-integer by
    * construction (the trigramLmScore contract).
    */
  def ndcgDiscounts(maxRank: Int, scale: Long = 1000000000L): Seq[Long] =
    (1 to maxRank).map(i =>
      math.floor(scale / (math.log(i + 1.0) / math.log(2.0))).toLong)

  /** Ranked-retrieval evaluation: precision@k, recall@k, nDCG@k and MRR
    * for a single ranked list against binary relevance labels — the
    * offline quality harness every retrieval stack (BM25, dense ANN,
    * hybrid RRF) is tuned with.
    *
    * All metrics are integer: ppm ratios via floor division, and DCG uses
    * the [[ndcgDiscounts]] literal table (ideal DCG is its prefix sum at
    * min(k, total_relevant)), so results hash-match across engines.
    *
    * Scale shape: `ranked` is top-k-bounded by its retriever, so it
    * BROADCASTs onto the full-corpus label scan (one map-side pass —
    * labels never shuffle); everything after the two scalar aggregates
    * (total relevant, first relevant rank) is arithmetic over |ks| rows.
    *
    * @param ranked (id, rank) with rank 1-based, at most maxRank rows
    * @param rel    (id, rel) binary labels for the WHOLE corpus
    * @param ks     cutoffs to evaluate, each ≤ maxRank
    * @return (k, rel_at_k, prec_ppm, recall_ppm, dcg_fp, ndcg_ppm,
    *         mrr_ppm) one row per cutoff
    */
  def rankedEval(ranked: DataFrame, rel: DataFrame, ks: Seq[Int],
                 maxRank: Int): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= maxRank))
    val disc = ndcgDiscounts(maxRank)
    val discArr = array(disc.map(lit): _*)
    // prefix[0] = 0 so element_at(prefix, least(k, totalRel) + 1) is the
    // ideal DCG even when the corpus has no relevant docs at all
    val idcgArr = array(disc.scanLeft(0L)(_ + _).map(lit): _*)

    val labeled = rel.join(broadcast(ranked), Seq("id"))
      .select(col("rank").cast("int").as("rank"), col("rel"))
    val totals = rel.agg(sum(col("rel")).cast("long").as("total_rel"))
    val firstRel = labeled.agg(
      min(when(col("rel") === 1, col("rank"))).as("first_rank"))

    val kdf = ranked.sparkSession.range(1)
      .select(explode(array(ks.map(k => lit(k.toLong)): _*)).as("k"))
    // aggregate then LEFT-join back onto the cutoff list: an empty
    // ranked list (or one sharing no ids with rel) must still yield one
    // all-zero row per cutoff, not an empty frame
    val agg = labeled.crossJoin(kdf).groupBy(col("k")).agg(
      sum(when(col("rank") <= col("k") && col("rel") === 1, 1L)
        .otherwise(0L)).as("rel_at_k"),
      sum(when(col("rank") <= col("k") && col("rel") === 1,
          element_at(discArr, col("rank"))).otherwise(0L)).as("dcg_fp"))
    val perK = kdf.join(agg, Seq("k"), "left")
      .select(col("k"),
        coalesce(col("rel_at_k"), lit(0L)).as("rel_at_k"),
        coalesce(col("dcg_fp"), lit(0L)).as("dcg_fp"))

    val M = lit(1000000L)
    perK.crossJoin(broadcast(totals)).crossJoin(broadcast(firstRel))
      .select(col("k"), col("rel_at_k"),
        call_function("div", col("rel_at_k") * M, col("k")).as("prec_ppm"),
        when(col("total_rel") === 0, 0L)
          .otherwise(call_function("div", col("rel_at_k") * M,
            col("total_rel"))).as("recall_ppm"),
        col("dcg_fp"),
        when(col("total_rel") === 0, 0L)
          .otherwise(call_function("div", col("dcg_fp") * M,
            element_at(idcgArr,
              (least(col("k"), col("total_rel")) + 1).cast("int"))))
          .as("ndcg_ppm"),
        coalesce(call_function("div", M, col("first_rank").cast("long")),
          lit(0L)).as("mrr_ppm"))
  }

  /** MMR (maximal marginal relevance, Carbonell & Goldstein 1998)
    * diversified re-ranking: greedily pick k candidates maximizing
    * λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s) — the standard fix for
    * retrieval stacks returning k near-copies of the same passage
    * (dense ANN is a similarity engine; near-dups rank together by
    * construction).
    *
    * Shape: the greedy loop is SEQUENTIAL per query but embarrassingly
    * parallel ACROSS queries, so it runs as one array fold per query
    * row — candidates (already top-n-bounded by the retriever) are
    * collected into an array column and the k selection rounds are an
    * `aggregate` over that array; no shuffle, no driver loop, O(k·n·d)
    * work per query row.
    *
    * Integer contract: rel_fp arrives on the 2⁻²⁰ grid; pairwise sims
    * are floored onto the same grid inside the fold; the objective is
    * the integer λnum·rel_fp − (λden−λnum)·max_sim_fp (a λden-scaled
    * MMR — argmax is scale-invariant), ties to the lowest id, so the
    * selection is engine-exact.
    *
    * @param cands (qid, id, rel_fp, vec) — the per-query candidate pool
    * @param k     picks per query (pools smaller than k yield all rows)
    * @return (qid, rank, id, mmr_fp) — rank 1-based in pick order
    */
  def mmrRerank(cands: DataFrame, k: Int, lambdaNum: Int = 7,
                lambdaDen: Int = 10): DataFrame = {
    require(k >= 1 && lambdaNum >= 0 && lambdaNum <= lambdaDen)
    val lam = lit(lambdaNum.toLong)
    val lamC = lit((lambdaDen - lambdaNum).toLong)
    val selType =
      "array<struct<score:bigint,id:bigint,rel_fp:bigint,vec:array<double>>>"
    val cs = col("cs")
    def simFp(a: Column, b: Column): Column =
      floor(cosine(a, b) * lit(1048576.0)).cast("long")
    // one greedy round: scan the pool, keep the best not-yet-selected
    // candidate by (score desc, id asc)
    // the unfilled-pick sentinel carries a NULL id (an explicit validity
    // flag — a legitimate candidate whose id happens to be Long.MaxValue
    // must not be conflated with "no pick"); sentinels only arise once
    // every candidate is selected, so the null id never meets the
    // exists() check with an unselected candidate outstanding
    def pick(acc: Column): Column = aggregate(cs,
      struct(lit(Long.MinValue).as("score"),
        lit(null).cast("bigint").as("id"), lit(0L).as("rel_fp"),
        lit(null).cast("array<double>").as("vec")),
      (best, c) => {
        val already = coalesce(exists(acc,
          x => x.getField("id") === c.getField("id")), lit(false))
        // greatest() skips nulls, so a zero-norm candidate (null cosine
        // vs every selected item) would leave the fold at the MinValue
        // sentinel and lamC·MinValue would WRAP — collapse the
        // nothing-comparable case to 0, exactly the oracle's
        // coalesce(max(...), 0)
        val rawMax = aggregate(acc, lit(Long.MinValue),
          (m, x) => greatest(m, simFp(c.getField("vec"), x.getField("vec"))))
        val maxSim = when(size(acc) === 0 || rawMax === Long.MinValue,
          lit(0L)).otherwise(rawMax)
        val score = lam * c.getField("rel_fp") - lamC * maxSim
        when(!already && (score > best.getField("score") ||
            (score === best.getField("score") &&
              c.getField("id") < best.getField("id"))),
          struct(score.as("score"), c.getField("id").as("id"),
            c.getField("rel_fp").as("rel_fp"),
            c.getField("vec").as("vec")))
          .otherwise(best)
      })
    val rounds = aggregate(sequence(lit(1), lit(k)),
      array().cast(selType),
      (acc, _) => concat(acc, array(pick(acc))))
    cands
      .groupBy(col("qid"))
      .agg(collect_list(
        struct(col("id"), col("rel_fp"), col("vec"))).as("cs"))
      .select(col("qid"), posexplode(rounds).as(Seq("p", "s")))
      // a pool smaller than k leaves sentinel picks — drop them
      .filter(col("s.id").isNotNull)
      .select(col("qid"), (col("p") + 1).cast("long").as("rank"),
        col("s.id").as("id"), col("s.score").as("mmr_fp"))
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

  /** k-NN GRAPH construction — every node's k most-cosine-similar
    * neighbors among its multi-band LSH candidates: the backbone of
    * graph-based dedup walks, label propagation, and kNN-graph ANN
    * indexes (NN-Descent seeds, HNSW base layers). Corpus-scale shape:
    *
    *  1. each band buckets every vector by its sign pattern (map-side);
    *  2. candidate pairs exist only WITHIN a (band, bucket) — the
    *     equi-self-join that replaces the all-pairs cross product;
    *  3. the cosine runs immediately after the join, so only
    *     (a, b, cos_fp) triples — never vectors — reach the band-dedup
    *     exchange (a pair surfacing in two bands costs one extra row,
    *     collapsed by a partial-combined max of its bit-identical score);
    *  4. per-node top-k goes through the bounded-heap [[graft.GraftExtensions.bottomK]]
    *     aggregate, NOT a rank window: each task ships at most k
    *     neighbors per node into the final exchange, and no sort appears
    *     anywhere in the plan.
    *
    * Determinism: scores are floor'd to the 2^-20 grid; the heap's
    * ordering key packs (2^21 − cos_fp) over the neighbor id, so ranking
    * is cos DESC then id ASC, exactly — ids must fit 33 bits.
    *
    * @param bands independent hyperplane sets; more bands → higher
    *              recall, more candidate volume (the LSH OR-construction)
    * @return one row per node that has candidates: (id, nn:
    *         array<struct(ord, nbr, cos_fp)> ascending = best first)
    */
  def knnGraph(corpus: DataFrame, bands: Seq[Seq[Seq[Double]]],
               k: Int): DataFrame = {
    val bucketed = bands.zipWithIndex.map { case (planes, i) =>
      corpus.select(col("id"), col("vec"),
        concat(lit(s"$i:"), lshBucket(col("vec"), planes)).as("bucket"))
    }.reduce(_.unionAll(_))
    val pairs = bucketed.select(col("bucket"), col("id").as("a"),
        col("vec").as("va"))
      .join(bucketed.select(col("bucket"), col("id").as("b"),
        col("vec").as("vb")), Seq("bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        floor(cosine(col("va"), col("vb")) * (1L << 20)).as("cos_fp"))
      .groupBy(col("a"), col("b")).agg(max(col("cos_fp")).as("cos_fp"))
    val edges = pairs.select(col("a").as("id"), col("b").as("nbr"),
        col("cos_fp"))
      .unionAll(pairs.select(col("b").as("id"), col("a").as("nbr"),
        col("cos_fp")))
    val ord = (lit(1L << 21) - col("cos_fp")) * lit(1L << 33) + col("nbr")
    edges
      .select(col("id"), ord.as("ord"), col("nbr"), col("cos_fp"))
      .groupBy(col("id"))
      .agg(graft.GraftExtensions.bottomK(
        struct(col("ord"), col("nbr"), col("cos_fp")), k).as("nn"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019 — the LASER
    * parallel-corpus miner): for each source-side vector a, score every
    * target candidate b by margin(a,b) = cos(a,b) normalized by the two
    * sides' neighborhood densities — absolute cosine thresholds fail
    * because hub vectors sit close to EVERYTHING; dividing by the
    * average of a's forward k-NN and b's backward k-NN cosines cancels
    * the hubness, and the mined pair is the per-source argmax above a
    * ratio threshold.
    *
    * Integer contract: cosines floor to the 2^-20 grid; each side keeps
    * its k-NN SUM (no early division) and
    * margin_ppm = cos_fp · 2k · 10^6 div (fwd_sum + bwd_sum), ties to
    * the lowest target id — mining is engine-exact.
    *
    * Shape: the per-side k-NN sums ride the bounded-heap bottom_k
    * aggregate (map-side partial combine, never a sort). This exact
    * entry point enumerates source × target — the oracle baseline,
    * bounded-fixture-only; the corpus-scale path is the overload below
    * that reads its candidate pairs from a bucketed LSH stage (margin
    * scoring is agnostic to candidate generation — the SAME arithmetic
    * runs over whatever pair stream arrives).
    *
    * Ids must be non-negative and fit 33 bits (same packing contract as
    * [[knnGraph]]): the tie-break key is (2^21 − cos_fp)·2^33 + id, so
    * an id ≥ 2^33 or < 0 would corrupt the heap order and the k-NN sums.
    *
    * @return (a_id, b_id, cos_fp, margin_ppm) — at most one row per
    *         source vector, only above `minMarginPpm`
    */
  def marginMine(src: DataFrame, tgt: DataFrame, k: Int,
                 minMarginPpm: Long): DataFrame = {
    val pairs = src.select(col("id").as("a_id"), col("vec").as("va"))
      .crossJoin(tgt.select(col("id").as("b_id"), col("vec").as("vb")))
      .select(col("a_id"), col("b_id"),
        floor(cosine(col("va"), col("vb")) * (1L << 20)).as("cos_fp"))
    marginScore(pairs, k, minMarginPpm)
  }

  /** Corpus-scale margin mining over a PRE-GENERATED candidate-pair
    * stream — the overload the [[marginMine]] docstring promises: feed
    * it the (a_id, b_id) pairs from a bucketed sign-LSH stage (the
    * [[knnGraph]] candidate generator run across the two corpora) and
    * the identical margin arithmetic scores only those pairs; the cross
    * product never exists. Neighborhood sums are then candidate-
    * restricted — the standard LSH approximation, whose recall is what
    * the `llm_bitext_mine_lsh` entry pins against the exact form.
    *
    * @param candidates (a_id, b_id) pairs, duplicates tolerated (the
    *                   vectors join re-scores each distinct pair once
    *                   after an id-level dedup)
    */
  def marginMine(src: DataFrame, tgt: DataFrame, k: Int,
                 minMarginPpm: Long, candidates: DataFrame): DataFrame = {
    val pairs = candidates.select(col("a_id"), col("b_id")).distinct()
      .join(src.select(col("id").as("a_id"), col("vec").as("va")),
        Seq("a_id"))
      .join(tgt.select(col("id").as("b_id"), col("vec").as("vb")),
        Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        floor(cosine(col("va"), col("vb")) * (1L << 20)).as("cos_fp"))
    marginScore(pairs, k, minMarginPpm)
  }

  /** Cross-corpus LSH candidate pairs for [[marginMine]]: both sides
    * bucket by the same hyperplane sign pattern per band (the
    * [[knnGraph]] construction, but across src × tgt instead of self),
    * so candidates exist only within a (band, bucket) equi-join and
    * only (a_id, b_id) id pairs reach the dedup exchange — vectors stay
    * map-side. */
  def bitextCandidates(src: DataFrame, tgt: DataFrame,
                       bands: Seq[Seq[Seq[Double]]]): DataFrame = {
    val a = bands.zipWithIndex.map { case (planes, i) =>
      src.select(col("id").as("a_id"),
        concat(lit(s"$i:"), lshBucket(col("vec"), planes)).as("bucket"))
    }.reduce(_.unionAll(_))
    val b = bands.zipWithIndex.map { case (planes, i) =>
      tgt.select(col("id").as("b_id"),
        concat(lit(s"$i:"), lshBucket(col("vec"), planes)).as("bucket"))
    }.reduce(_.unionAll(_))
    a.join(b, Seq("bucket")).select(col("a_id"), col("b_id")).distinct()
  }

  /** The margin arithmetic shared by both [[marginMine]] entry points:
    * scores a (a_id, b_id, cos_fp) pair stream. Ids must fit 33 bits
    * non-negative (packing contract, see [[marginMine]]). */
  private def marginScore(pairStream: DataFrame, k: Int,
                          minMarginPpm: Long): DataFrame = {
    require(k >= 1)
    val pairs = pairStream.persist()
    def knnSum(key: String, other: String, out: String) = {
      val ord = (lit(1L << 21) - col("cos_fp")) * lit(1L << 33) + col(other)
      pairs.select(col(key), ord.as("ord"), col("cos_fp"))
        .groupBy(col(key))
        .agg(graft.GraftExtensions.bottomK(
          struct(col("ord"), col("cos_fp")), k).as("nn"))
        .select(col(key),
          aggregate(col("nn"), lit(0L),
            (s, x) => s + x.getField("cos_fp")).as(out))
    }
    val fwd = knnSum("a_id", "b_id", "fwd_sum")
    val bwd = knnSum("b_id", "a_id", "bwd_sum")
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("margin_ppm").desc, col("b_id"))
    val out = pairs
      .join(fwd, Seq("a_id"))
      .join(bwd, Seq("b_id"))
      // an all-negative neighborhood cannot normalize meaningfully (and
      // would flip the division's sign) — such pairs are unminable
      .filter(col("fwd_sum") + col("bwd_sum") > 0)
      .select(col("a_id"), col("b_id"), col("cos_fp"),
        call_function("div",
          col("cos_fp") * lit(2L * k) * lit(1000000L),
          col("fwd_sum") + col("bwd_sum")).as("margin_ppm"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("margin_ppm") > minMarginPpm)
      .select(col("a_id"), col("b_id"), col("cos_fp"), col("margin_ppm"))
      .localCheckpoint(true)
    pairs.unpersist()
    out
  }

  /** One NN-Descent refinement round (Dong et al., WWW'11) over a
    * [[knnGraph]]: "a neighbor of my neighbor is probably my neighbor".
    * Each node's candidate set is its current neighbors, its REVERSE
    * neighbors (if b lists a, a should consider b — the asymmetry fix
    * the original paper insists on), and its neighbors' neighbors; exact
    * cosine re-scores the candidates and the bounded heap keeps the new
    * top-k. Iterating this a few rounds converges to near-exact kNN from
    * a rough LSH seed — the standard way production graph-ANN indexes
    * (NN-Descent, NSG, HNSW base layers) are built at corpus scale,
    * because every step is bounded: candidate volume per node is
    * ≤ k + k + k², all joins are id-keyed equi-joins, and vectors are
    * touched only by the two point-lookup joins that score candidates.
    */
  def nnDescentRound(graph: DataFrame, corpus: DataFrame,
                     k: Int): DataFrame = {
    val fwd = graph.select(col("id"), explode(col("nn.nbr")).as("cand"))
    val rev = fwd.select(col("cand").as("id"), col("id").as("cand"))
    val hop2 = fwd.as("x")
      .join(fwd.select(col("id").as("mid"), col("cand").as("cand2")).as("y"),
        col("x.cand") === col("y.mid"))
      .select(col("x.id").as("id"), col("cand2").as("cand"))
    val cands = fwd.unionByName(rev).unionByName(hop2)
      .filter(col("id") =!= col("cand")).distinct()
    val scored = cands
      .join(corpus.select(col("id"), col("vec")), Seq("id"))
      .join(corpus.select(col("id").as("cand"), col("vec").as("cvec")),
        Seq("cand"))
      .select(col("id"), col("cand").as("nbr"),
        floor(cosine(col("vec"), col("cvec")) * (1L << 20)).as("cos_fp"))
    val ord = (lit(1L << 21) - col("cos_fp")) * lit(1L << 33) + col("nbr")
    scored.select(col("id"), ord.as("ord"), col("nbr"), col("cos_fp"))
      .groupBy(col("id"))
      .agg(graft.GraftExtensions.bottomK(
        struct(col("ord"), col("nbr"), col("cos_fp")), k).as("nn"))
  }

  /** Ordered-fold squared L2 distance between two equal-length arrays —
    * the same left-fold spelling as [[pqReconError]]'s per-subspace error,
    * bit-identical cross-engine.
    */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, e) => acc + e)

  /** Map-side nearest-centroid assignment: cosine argmax over a LITERAL
    * centroid list, evaluated as a fold per row — no shuffle, no window.
    * This is the 100 TB-critical half of IVF: assigning a trillion corpus
    * vectors must not cost a per-vector window shuffle; a fold over ≤ a
    * few thousand broadcast centroid literals is pure map work. Ties break
    * to the lowest centroid id (strict > keeps the earlier winner).
    */
  def nearestCentroid(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column = {
    // Walk ascending cid so the strict-improvement fold honors the
    // documented tie-break for ANY caller's centroid order, not just
    // kmeansTrain's (which happens to return cid-sorted output).
    val centLit = array(centroids.sortBy(_._1).map { case (cid, cvec) =>
      struct(lit(cid).as("cid"), array(cvec.map(lit): _*).as("cvec"))
    }: _*)
    val best = aggregate(centLit,
      struct(lit(-1).as("cid"), lit(-3.0).as("cos")),
      (acc, c) => {
        // NULL cosine (zero-norm vector or centroid) coalesces to a
        // below-everything sentinel so degenerate vectors still land on
        // the first centroid (the ORDER BY cos DESC, cid tie-break a
        // SQL row_number assignment would produce) instead of escaping
        // to a nonexistent cluster.
        val cs = coalesce(cosine(vec, c.getField("cvec")), lit(-2.0))
        when(cs > acc.getField("cos"),
          struct(c.getField("cid").as("cid"), cs.as("cos"))).otherwise(acc)
      }).getField("cid")
    // The fold is total (the -1/-3.0 seed always yields a row), but the
    // aggregate() HOF is NULLABLE to Catalyst — so every equi-join on
    // cid inferred an isnotnull(cid) constraint whose alias-substituted
    // form (the ENTIRE centroid fold) was pushed below the local-mode
    // spread repartition onto the single-split scan: the fold ran twice
    // per row, once of that serially in an interpreted Filter (profiled:
    // a 2.5 s one-task stage under llm_ann_ivfpq_res). coalesce with a
    // dead literal makes the column provably non-nullable, so the
    // inferred filter constant-folds away — same values, no duplicate
    // evaluation (guide §4.4's duplicated-evaluation trap, Catalyst-
    // expression form).
    coalesce(best, lit(-1))
  }

  /** The TOP-2 nearest centroids (by cosine) as a 2-element cid array —
    * the multi-probe assignment for boundary-recall SemDeDup: the same
    * single map-side fold as [[nearestCentroid]], tracking best and
    * second-best, never a per-vector window shuffle. Tie order matches
    * `row_number() OVER (ORDER BY cos DESC, cid)`: an equal-cosine later
    * centroid ranks second, because the fold only displaces on a STRICT
    * improvement and the centroid list is walked in ascending cid order.
    * With a single-centroid model the second slot stays the −1 sentinel —
    * callers must drop cid < 0 before any equi-join (a shared sentinel
    * would otherwise pair everything with everything).
    */
  def nearest2Centroids(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column = {
    val folded = top2Fold(vec, centroids)
    array(folded.getField("b1").getField("cid"),
      folded.getField("b2").getField("cid"))
  }

  /** The shared best/second-best fold behind [[nearest2Centroids]] and
    * [[simplifiedSilhouette]]: a struct of (b1, b2), each (cid, cos),
    * walked in ascending cid order with strict-improvement displacement
    * (the `ORDER BY cos DESC, cid` tie contract).
    */
  private def top2Fold(vec: Column,
                       centroids: Seq[(Int, Seq[Double])]): Column = {
    val centLit = array(centroids.sortBy(_._1).map { case (cid, cvec) =>
      struct(lit(cid).as("cid"), array(cvec.map(lit): _*).as("cvec"))
    }: _*)
    val empty = struct(lit(-1).as("cid"), lit(-3.0).as("cos"))
    aggregate(centLit,
      struct(empty.as("b1"), empty.as("b2")),
      (acc, c) => {
        val cs = coalesce(cosine(vec, c.getField("cvec")), lit(-2.0))
        val cand = struct(c.getField("cid").as("cid"), cs.as("cos"))
        when(cs > acc.getField("b1").getField("cos"),
          struct(cand.as("b1"), acc.getField("b1").as("b2")))
          .when(cs > acc.getField("b2").getField("cos"),
            struct(acc.getField("b1").as("b1"), cand.as("b2")))
          .otherwise(acc)
      })
  }

  /** Simplified silhouette (Hruschka et al.): per point, a = cosine
    * distance to its OWN (nearest) centroid, b = distance to the
    * second-nearest, s = (b − a) / max(a, b) — the O(n·k) stand-in for
    * the O(n²) exact silhouette, and the standard clustering-quality
    * report next to [[clusterPurity]] when no ground-truth labels exist.
    * With nearest-centroid assignment a ≤ b always, so s ∈ [0, 1]:
    * 1 = far from every other cluster, 0 = on the boundary.
    *
    * Integer contract: both distances land on the 2⁻²⁰ fixed-point grid
    * BEFORE the ratio, and the ratio is ppm floor division, so per-point
    * scores — and the per-cluster means — hash-match across engines.
    * The degenerate max(a, b) = 0 point (exactly on a doubled centroid)
    * scores 0, not a division error.
    *
    * Scale shape: one map-side fold over the centroid literal per point
    * (no shuffle), then one partial-combined groupBy(cid) of k rows.
    *
    * @param points (id, vec)
    * @return (cid, n, sil_sum_ppm, sil_mean_ppm) one row per non-empty
    *         cluster, means floor-divided
    */
  def simplifiedSilhouette(points: DataFrame,
                           centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    // with one centroid b2 would be the -3.0 fold sentinel, not a distance
    require(centroids.size >= 2, "silhouette needs at least two clusters")
    val folded = top2Fold(col("vec"), centroids)
    val aFp = floor((lit(1.0) - folded.getField("b1").getField("cos")) *
      lit(1048576.0)).cast("long")
    val bFp = floor((lit(1.0) - folded.getField("b2").getField("cos")) *
      lit(1048576.0)).cast("long")
    val mx = greatest(col("a_fp"), col("b_fp"))
    points
      .select(folded.getField("b1").getField("cid").cast("long").as("cid"),
        aFp.as("a_fp"), bFp.as("b_fp"))
      .select(col("cid"),
        when(mx === 0, lit(0L))
          .otherwise(call_function("div",
            (col("b_fp") - col("a_fp")) * lit(1000000L), mx)).as("s_ppm"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), sum(col("s_ppm")).as("sil_sum_ppm"))
      .select(col("cid"), col("n"), col("sil_sum_ppm"),
        call_function("div", col("sil_sum_ppm"), col("n"))
          .as("sil_mean_ppm"))
  }

  /** [[nearestCentroid]]'s squared-L2 twin: argMIN of the ordered-fold
    * squared distance — the textbook Lloyd objective, the assignment to
    * pair with L2-trained codebooks. Ties break to the lowest centroid id
    * (strict < keeps the earlier winner), mirroring the cosine fold.
    */
  def nearestCentroidL2(vec: Column, centroids: Seq[(Int, Seq[Double])]): Column = {
    // Ascending-cid walk for caller-order-independent tie-breaks, as in
    // [[nearestCentroid]].
    val centLit = array(centroids.sortBy(_._1).map { case (cid, cvec) =>
      struct(lit(cid).as("cid"), array(cvec.map(lit): _*).as("cvec"))
    }: _*)
    val best = aggregate(centLit,
      struct(lit(-1).as("cid"), lit(Double.MaxValue).as("dist")),
      (acc, c) => {
        val d = sqDist(vec, c.getField("cvec"))
        when(d < acc.getField("dist"),
          struct(c.getField("cid").as("cid"), d.as("dist"))).otherwise(acc)
      }).getField("cid")
    // non-nullable wrap — see nearestCentroid
    coalesce(best, lit(-1))
  }

  /** Metric dispatch for the assignment fold. */
  private def assign(vec: Column, centroids: Seq[(Int, Seq[Double])],
                     l2: Boolean): Column =
    if (l2) nearestCentroidL2(vec, centroids) else nearestCentroid(vec, centroids)

  /** IVF (inverted-file) ANN — the production-scale pattern: partition the
    * corpus by nearest centroid, then search only the `nprobe` clusters
    * nearest to each query.
    *
    * Scale design: corpus assignment is the map-side fold above (at rest,
    * an IVF index is simply the table PARTITIONED BY cluster id, so the
    * probe join prunes partitions); the query side ranks centroids with a
    * window over (tiny queries × centroids) and probes `nprobe` clusters;
    * the candidate join is an equi-join on cluster id — the corpus never
    * meets a query it doesn't share a cluster with.
    *
    * @param centroids (cid, cvec) seed centroids, small (broadcast as
    *                  literals); production would k-means these — seeding
    *                  is orthogonal to the search plumbing
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              centroids: Seq[(Int, Seq[Double])], nprobe: Int, k: Int): DataFrame = {
    val assigned = corpus
      .withColumn("cid", nearestCentroid(col("vec"), centroids))
    val centDf = broadcast(queries.sparkSession.createDataFrame(
      centroids.map { case (cid, cvec) => (cid, cvec) })
      .toDF("cid", "cvec"))
    val cw = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid"))
    val probes = queries.crossJoin(centDf)
      .select(col("qid"), col("qvec"), col("cid"),
        cosine(col("qvec"), col("cvec")).as("ccos"))
      .withColumn("crank", row_number().over(cw)).filter(col("crank") <= nprobe)
      .select(col("qid"), col("qvec"), col("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), cosine(col("vec"), col("qvec")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("cos"))
  }

  /** Fixed-point grid for the k-means mean: 2^20 steps per unit. */
  private val MeanGrid = 1048576.0 // 2^20

  /** One Lloyd iteration of k-means over the embedding corpus — the
    * clustering pass behind semantic dedup / diversity curation of
    * training data (and the centroid trainer for the IVF index above).
    *
    * Scale shape: assignment is the map-side literal fold (no shuffle);
    * the centroid update posexplodes to (cluster, component) and
    * aggregates — map-side partial combine collapses each task's stream
    * to ≤ k·dim partial sums before the one shuffle, so the exploded
    * volume never crosses the wire. Returns one row per (cid, pos) with
    * the member count and new centroid component.
    *
    * Determinism: the per-cluster mean is computed on a 2^-20 fixed-point
    * grid — floor(x·2^20) is exact IEEE arithmetic (power-of-two scale,
    * then an exact floor), and the per-cluster reduction is an exact
    * integer sum (order-independent across partitionings, retries, and
    * engines), exposed as `msum`. Quantization error is < 2^-20 per
    * component, far below any k-means convergence tolerance, and in
    * exchange the step is bit-reproducible — a float avg() depends on
    * reduction order. `mean` = msum/(n·2^20) is derived for consumers;
    * anything that must compare ACROSS engines should compare the
    * integers (even round(mean, 4) is not portable: Spark rounds via the
    * shortest decimal repr half-up, other engines round the binary value,
    * and quotients near a 4-decimal boundary diverge).
    */
  def kmeansStep(corpus: DataFrame,
                 centroids: Seq[(Int, Seq[Double])],
                 l2: Boolean = false): DataFrame =
    corpus
      .withColumn("cid", assign(col("vec"), centroids, l2))
      .select(col("cid"), posexplode(col("vec")).as(Seq("pos0", "x")))
      .groupBy(col("cid"), (col("pos0") + 1).as("pos"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("x") * MeanGrid)).cast("long").as("msum"))
      .withColumn("mean", col("msum") / (col("n") * MeanGrid))

  /** Lloyd-iteration driver loop around [[kmeansStep]] — the centroid
    * trainer for the IVF index (feed the result to [[ivfTopK]]) and for
    * embedding-based corpus curation.
    *
    * Scale shape: each iteration is ONE distributed step (map-side
    * assignment fold + partial-combined update agg); the only driver
    * traffic is the k·dim centroid collect per iteration — the centroid
    * set IS the model, orders of magnitude smaller than the corpus, and
    * it must round-trip through the driver anyway to become the next
    * iteration's plan literals. maxIter bounds the loop; `tol` stops it
    * early once no centroid component moved more than tol (assignments
    * have stabilized).
    *
    * Empty clusters keep their previous position (the standard Lloyd
    * convention) instead of vanishing from the model.
    *
    * Determinism: means are the fixed-point-grid quotients of exact
    * integer sums (see [[kmeansStep]]), so the trained centroids — and
    * therefore every downstream assignment — are bit-reproducible across
    * partitionings, retries, and engines.
    *
    * @return (trained centroids sorted by cid, iterations run, last max
    *         component shift)
    */
  def kmeansTrain(corpus: DataFrame, seeds: Seq[(Int, Seq[Double])],
                  maxIter: Int, tol: Double = 0.0, l2: Boolean = false)
      : (Seq[(Int, Seq[Double])], Int, Double) = {
    require(maxIter >= 1, "maxIter must be at least 1")
    var cents = seeds.sortBy(_._1)
    var iters = 0
    var shift = Double.MaxValue
    while (iters < maxIter && shift > tol) {
      val updated = kmeansStep(corpus, cents, l2)
        .select(col("cid"), col("pos"), col("mean"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      val next = cents.map { case (cid, old) =>
        (cid, updated.getOrElse(cid, old))
      }
      shift = cents.zip(next).iterator.map { case ((_, a), (_, b)) =>
        a.iterator.zip(b.iterator).map { case (x, y) => math.abs(x - y) }.max
      }.max
      cents = next
      iters += 1
    }
    (cents, iters, shift)
  }

  /** Random-projection (Johnson–Lindenstrauss) dimensionality reduction:
    * y_j = <vec, plane_j> for a seeded literal plane set — the cheap
    * train-free projection that shrinks an embedding corpus before
    * indexing/clustering (or decorrelates it for sign-LSH).
    *
    * Scale shape: the planes are literals (broadcast with the plan), each
    * output component is an ordered-fold dot — pure map work, no shuffle,
    * no UDF; at 100 TB this runs at scan speed. Determinism: the fold is
    * bit-exact cross-engine, so downstream fixed-point grids stay exact.
    */
  def randomProjection(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val planeLits = planes.map(p => array(p.map(lit): _*))
    array(planeLits.map(p => dot(vec, p)): _*)
  }

  /** Seeded random ORTHOGONAL matrix (rows orthonormal) via modified
    * Gram-Schmidt over a deterministic Gaussian draw — the rotation for
    * OPQ-style preprocessing: rotating the space before product
    * quantization decorrelates and re-balances variance across the
    * subspace split, while preserving every dot product and L2 distance
    * (so ADC rankings in rotated space approximate the ORIGINAL-space
    * inner products exactly as well as the quantization allows).
    *
    * Driver-side double math, bit-deterministic for a given seed
    * (java.util.Random's stream is JDK-specified; the fold orders are
    * fixed); the rows become plan literals, the same distribution
    * mechanism as [[hyperplanes]].
    */
  def orthogonalMatrix(dim: Int, seed: Long = 1234L): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    val m = Array.fill(dim, dim)(rnd.nextGaussian())
    for (j <- 0 until dim) {
      for (k <- 0 until j) {
        var d = 0.0
        var i = 0
        while (i < dim) { d += m(j)(i) * m(k)(i); i += 1 }
        i = 0
        while (i < dim) { m(j)(i) -= d * m(k)(i); i += 1 }
      }
      var n2 = 0.0
      var i = 0
      while (i < dim) { n2 += m(j)(i) * m(j)(i); i += 1 }
      val n = math.sqrt(n2)
      i = 0
      while (i < dim) { m(j)(i) /= n; i += 1 }
    }
    m.map(_.toIndexedSeq).toIndexedSeq
  }

  /** Contrastive hard-negative mining: for each query (anchor), the top-k
    * corpus vectors by cosine INSIDE a band [lo, hi) — similar enough to
    * be confusable, excluded near the top so positives/duplicates don't
    * leak into the negative set. The standard retrieval/embedding-training
    * data op (in-batch negatives are easy; these are the hard ones).
    *
    * Same two-phase rank as [[bruteForceTopK]] — the band filter runs
    * map-side on the scored stream BEFORE either window, so only in-band
    * candidates are ever ranked, and phase 2 sees ≤ k rows per (query,
    * partition) no matter the corpus size. An LSH/IVF prefilter composes
    * upstream when the corpus is indexed (the band's upper bound makes
    * bucket recall less critical than for true-NN search).
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    lo: Double, hi: Double): DataFrame = {
    val scored = corpus
      .join(broadcast(queries), col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        cosine(col("vec"), col("qvec")).as("cos"),
        spark_partition_id().as("part"))
      .filter(col("cos") >= lo && col("cos") < hi)
    val local = Window.partitionBy(col("qid"), col("part"))
      .orderBy(col("cos").desc, col("id"))
    val global = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("id"))
    scored
      .withColumn("lr", row_number().over(local)).filter(col("lr") <= k)
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("cos"))
  }

  /** Product-quantization codebook training: one independent spherical
    * k-means (the engine's cosine-assignment Lloyd loop) per contiguous
    * subspace of the embedding. PQ is the compression half of the
    * production IVF-PQ index: m codebooks of k centroids encode a
    * d-dim vector in m·log₂k bits — 64 floats become 4 bytes at
    * m=4, k=256.
    *
    * Scale shape: each subspace trains on a SLICE projection of the same
    * scan (no data duplication), and training cost is the Lloyd loop's —
    * the corpus-side work per iteration is one map-side assignment fold
    * plus a partial-combined aggregation, m times. Determinism: inherits
    * [[kmeansTrain]]'s fixed-point bit-reproducible centroids.
    *
    * `l2 = true` trains with the squared-L2 Lloyd objective instead of
    * the spherical (cosine) one — the textbook PQ form, whose centroids
    * are true subspace means; pair with `l2 = true` in [[pqEncode]] /
    * [[pqReconError]] (the llm_ann_pq_l2 entry reports the recall and
    * reconstruction-error comparison between the two objectives).
    *
    * @return per subspace, the trained (cid, cvec) codebook
    */
  def pqTrain(corpus: DataFrame, m: Int, k: Int,
              maxIter: Int, l2: Boolean = false): Seq[Seq[(Int, Seq[Double])]] = {
    val dim = corpus.select(size(col("vec"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    // the m subspace trainings are independent — submit their Lloyd-loop
    // jobs CONCURRENTLY (Spark's scheduler interleaves them across the
    // cluster) instead of serializing m × maxIter driver round-trips;
    // results are per-subspace deterministic, so concurrency cannot
    // change a single centroid. The futures run on a DEDICATED
    // fixed-size pool, not the global fork-join pool: each future
    // blocks on collect()s for its whole lifetime, and m parked
    // threads would starve every other user of the shared pool. The
    // await is finite — a wedged Lloyd job must surface as a timeout,
    // not hang the driver forever.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(m)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val trained = (0 until m).map { s =>
        Future {
          val sc = corpus.select(col("id"),
            slice(col("vec"), s * sub + 1, sub).as("vec"))
          val seeds = sc.filter(col("id") < k).orderBy(col("id")).collect()
            .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
          kmeansTrain(sc, seeds, maxIter, l2 = l2)._1
        }
      }
      val out = trained.map(Await.result(_, 1.hour))
      pool.shutdown()
      out
    } catch {
      case t: Throwable =>
        // a timeout/failure must TEAR DOWN the in-flight work: orderly
        // shutdown() would leave the other futures parked on collect()s,
        // holding driver threads and cluster resources behind a dead
        // caller — interrupt them so their Spark jobs abort too
        pool.shutdownNow()
        throw t
    }
  }

  /** PQ encoding: per subspace, the nearest-codebook-centroid id — pure
    * map work (m literal-centroid folds per row), the same scan-speed
    * shape as [[nearestCentroid]]. Output (id, codes array<int>).
    */
  def pqEncode(corpus: DataFrame,
               codebooks: Seq[Seq[(Int, Seq[Double])]],
               l2: Boolean = false): DataFrame = {
    val sub = codebooks.head.head._2.size
    val codeCols = codebooks.zipWithIndex.map { case (cb, s) =>
      assign(slice(col("vec"), s * sub + 1, sub), cb, l2)
    }
    corpus.select(col("id"), array(codeCols: _*).as("codes"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: each query computes
    * one m·k lookup table of subspace dot products against the
    * codebooks; a candidate's score is the FIXED-ORDER sum of its m
    * table entries — dot is additive over subspaces (cosine is not), so
    * this ranks by approximate inner product, the MIPS convention.
    *
    * Scale shape: the lookup table is (queries × m × k) rows — tiny, a
    * broadcast — while the corpus side only ever ships (id, sub, code)
    * triples into the join and partial-combined per-(query, candidate)
    * aggregation; the original vectors are never touched at search time,
    * which is the entire point of PQ. Determinism: each table entry is
    * an ordered-fold dot, the per-candidate sum is re-assembled in
    * subspace order (one single-row conditional sum per subspace, added
    * left-to-right), so scores are bit-identical cross-engine.
    */
  def pqAdcTopK(encoded: DataFrame, queries: DataFrame,
                codebooks: Seq[Seq[(Int, Seq[Double])]], k: Int): DataFrame = {
    val spark = queries.sparkSession
    val m = codebooks.size
    val sub = codebooks.head.head._2.size
    val lutDf = spark.createDataFrame(
      codebooks.zipWithIndex.flatMap { case (cb, s) =>
        cb.map { case (cid, cvec) => (s, cid, cvec) }
      }).toDF("sub", "cid", "cvec")
    val qlut = queries.crossJoin(broadcast(lutDf))
      .select(col("qid"), col("sub"), col("cid"),
        dot(slice(col("qvec"), col("sub") * sub + 1, lit(sub)),
          col("cvec")).as("p"))
    val parts = (0 until m).map(s =>
      sum(when(col("sub") === s, col("p"))).as(s"p$s"))
    val score = (0 until m).map(s => col(s"p$s")).reduce(_ + _)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    encoded
      .select(col("id"), posexplode(col("codes")).as(Seq("esub", "code")))
      .join(broadcast(qlut),
        col("code") === col("cid") && col("esub") === col("sub"))
      .filter(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("id"))
      .agg(parts.head, parts.tail: _*)
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** Scalar-quantization (SQ8) training: per-dimension (min, max) over
    * the corpus — FAISS's ScalarQuantizer model. The model is 2·dim
    * doubles (model-sized, the kmeansTrain collect contract), computed
    * in ONE aggregation pass: 2·dim partially-combined min/max aggs, so
    * the corpus is scanned exactly once and nothing shuffles but the
    * per-partition partial rows.
    */
  def sqTrain(corpus: DataFrame): Seq[(Double, Double)] = {
    val dim = corpus.select(size(col("vec"))).head().getInt(0)
    val aggs = (1 to dim).flatMap(d => Seq(
      min(element_at(col("vec"), d)).as(s"mn$d"),
      max(element_at(col("vec"), d)).as(s"mx$d")))
    val r = corpus.agg(aggs.head, aggs.tail: _*).head()
    (0 until dim).map(i => (r.getDouble(2 * i), r.getDouble(2 * i + 1)))
  }

  /** SQ8 encoding: per dimension, the vector's position in the trained
    * [min, max] range on a 256-step grid —
    * `clamp(floor((v−mn)/(mx−mn)·255), 0, 255)`, 0 where the range is
    * degenerate. 4 bytes/dim of float become 1 (8 with int32 physical
    * storage here; a binary packing pass would take it to 1) — pure map
    * work over literal bounds, the same scan-speed shape as
    * [[pqEncode]]. Output (id, codes array<int>).
    */
  def sqEncode(corpus: DataFrame, bounds: Seq[(Double, Double)]): DataFrame = {
    val codes = bounds.zipWithIndex.map { case ((mn, mx), i) =>
      val v = element_at(col("vec"), i + 1)
      if (mx == mn) lit(0)
      else least(lit(255), greatest(lit(0),
        floor((v - lit(mn)) / lit(mx - mn) * 255).cast("int")))
    }
    corpus.select(col("id"), array(codes.map(_.cast("int")): _*).as("codes"))
  }

  /** Dequantized vector from SQ8 codes: `v̂_d = mn_d + code_d·Δ_d` with
    * Δ_d = (mx_d−mn_d)/255 baked as plan literals. Every step is a
    * single IEEE op in a fixed spelling, so reconstruction is
    * bit-identical cross-engine.
    */
  def sqReconstruct(codes: Column, bounds: Seq[(Double, Double)]): Column = {
    val mns = array(bounds.map(b => lit(b._1)): _*)
    val deltas = array(bounds.map { case (mn, mx) =>
      lit((mx - mn) / 255.0) }: _*)
    transform(sequence(lit(1), lit(bounds.size)),
      i => element_at(mns, i) +
        element_at(codes, i).cast("double") * element_at(deltas, i))
  }

  /** Asymmetric SQ8 top-k (MIPS, the [[pqAdcTopK]] convention): rank by
    * the ordered-fold dot of the full-precision query against the
    * DEQUANTIZED candidate — raw corpus vectors are never touched at
    * search time, which is the point of the quantized index. Same
    * two-phase rank as [[bruteForceTopK]]: per-partition top-k heaps,
    * then a global rank over ≤ k·partitions survivors per query.
    */
  def sqTopK(encoded: DataFrame, queries: DataFrame,
             bounds: Seq[(Double, Double)], k: Int): DataFrame = {
    val scored = encoded
      .join(broadcast(queries), col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        dot(col("qvec"), sqReconstruct(col("codes"), bounds)).as("score"),
        spark_partition_id().as("part"))
    val local = Window.partitionBy(col("qid"), col("part"))
      .orderBy(col("score").desc, col("id"))
    val global = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id"))
    scored
      .withColumn("lr", row_number().over(local)).filter(col("lr") <= k)
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** The IVF-PQ index rows — (id, coarse cid, PQ codes) — computed in ONE
    * map-side pass over the corpus: the coarse assignment fold and the m
    * per-subspace code folds are sibling projections of the same row, so
    * building the index costs exactly one scan, no join, no shuffle.
    *
    * `l2` selects the CODE-assignment objective and must match the
    * objective the codebooks were trained under ([[pqTrain]]'s flag) —
    * encoding L2-trained codebooks with the cosine fold would silently
    * degrade ADC quality. The coarse assignment stays cosine: it is the
    * probe-side metric ([[probeClusters]]), independent of how the
    * subspace codebooks quantize.
    */
  def ivfPqIndex(corpus: DataFrame, coarse: Seq[(Int, Seq[Double])],
                 codebooks: Seq[Seq[(Int, Seq[Double])]],
                 l2: Boolean = false): DataFrame = {
    val sub = codebooks.head.head._2.size
    val codeCols = codebooks.zipWithIndex.map { case (cb, s) =>
      assign(slice(col("vec"), s * sub + 1, sub), cb, l2)
    }
    corpus.select(col("id"),
      nearestCentroid(col("vec"), coarse).as("cid"),
      array(codeCols: _*).as("codes"))
  }

  /** Persist the IVF-PQ index at rest: parquet PARTITIONED BY the coarse
    * cluster id, so a probe-time `cid` predicate prunes whole directories
    * at file-listing time — the corpus is never re-assigned or re-encoded
    * per query. `repartition(cid)` first so each cluster directory holds
    * one file instead of one-per-writing-task (at 100 TB the alternative
    * is nClusters × nTasks small files).
    */
  def writeIvfPqIndex(corpus: DataFrame, coarse: Seq[(Int, Seq[Double])],
                      codebooks: Seq[Seq[(Int, Seq[Double])]],
                      path: String, l2: Boolean = false): Unit =
    ivfPqIndex(corpus, coarse, codebooks, l2)
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(path)

  /** Incremental index maintenance — APPEND a new batch into an existing
    * [[writeIvfPqIndex]] layout: the batch is assigned and encoded under
    * the SAME frozen model (coarse + codebooks are the index's contract;
    * re-training would silently re-key the existing partitions) and its
    * rows land as new files inside the existing cid directories. At
    * 100 TB this is the only viable maintenance mode: per-batch cost is
    * one map-side pass over the batch — the at-rest corpus is never
    * rewritten, and compaction of many small per-batch files is an
    * orthogonal background rewrite (the same story as the rollup tier's
    * compactor).
    */
  def appendIvfPqIndex(batch: DataFrame, coarse: Seq[(Int, Seq[Double])],
                       codebooks: Seq[Seq[(Int, Seq[Double])]],
                       path: String, l2: Boolean = false): Unit =
    ivfPqIndex(batch, coarse, codebooks, l2)
      .repartition(col("cid"))
      .write.mode("append").partitionBy("cid").parquet(path)

  /** DELETE ids from a persisted index — tombstones, not rewrites: the
    * batch of dead ids lands as a small parquet file under
    * `<path>/_tombstones` (the underscore prefix keeps the directory
    * invisible to the data scan's file listing, so the index stays one
    * self-contained path). At 100 TB a delete — takedown, re-crawl
    * retraction — cannot rewrite cid directories synchronously; the
    * tombstone write is O(batch), reads mask at query time
    * ([[readIvfPqIndex]]), and the next [[compactIvfPqIndex]] makes the
    * drop physical. The same mechanics as every log-structured store.
    */
  def deleteFromIvfPqIndex(ids: DataFrame, path: String): Unit =
    ids.select(col("id")).distinct()
      .coalesce(1) // tombstone batches are tiny; one file per delete
      .write.mode("append").parquet(path + "/_tombstones")

  /** Read a persisted index with tombstones applied: the dead-id set is
    * model-sized (it shrinks to nothing at every compaction), so masking
    * is a BROADCAST anti-join layered above the scan — cid partition
    * pruning underneath is untouched, and no shuffle is added.
    */
  def readIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String): DataFrame = {
    val idx = spark.read.parquet(path)
    val tombs = new org.apache.hadoop.fs.Path(path + "/_tombstones")
    val fs = tombs.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tombs)) idx
    else idx.join(
      broadcast(spark.read.parquet(tombs.toString).select(col("id")).distinct()),
      Seq("id"), "left_anti")
  }

  /** Compact an appended index: rewrite the accumulated small per-batch
    * files back to one file per cluster directory, then swap the staging
    * dir in via rename-aside (rename live → `.old`, staging → live,
    * delete `.old`). The swap is NOT atomic — a reader can hit a brief
    * window where the live path is missing between the two renames — but
    * every crash point leaves a full index on disk: before the first
    * rename the live dir is untouched; between renames both complete
    * copies exist (`.old` and `.compacting`); after the second only the
    * `.old` cleanup remains. On HDFS each rename is itself atomic; a
    * production deployment wanting zero-gap reads would swap a pointer
    * (manifest / view) instead of the directory. Model-free — codes are
    * already encoded; this is pure file-count hygiene, the background
    * pass that keeps probe-time listing cost flat while
    * [[appendIvfPqIndex]] keeps ingest cost flat.
    */
  def compactIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                        path: String): Unit = {
    val staging = path + ".compacting"
    // tombstoned rows are dropped in the rewrite (readIvfPqIndex masks
    // them) and the directory swap discards the applied tombstone files
    // with the old layout — compaction is where deletes become physical
    readIvfPqIndex(spark, path)
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(staging)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    fs.delete(old, true) // leftover from a prior crashed compaction
    fs.rename(dst, old)
    fs.rename(new org.apache.hadoop.fs.Path(staging), dst)
    fs.delete(old, true)
    ()
  }

  /** The probe set: each query's `nprobe` nearest coarse clusters —
    * (queries × centroids) is tiny, windowed per query. Shared by the
    * in-memory and at-rest IVF-PQ search paths.
    */
  private def probeClusters(queries: DataFrame,
                            coarse: Seq[(Int, Seq[Double])],
                            nprobe: Int): DataFrame = {
    val centDf = broadcast(queries.sparkSession.createDataFrame(
      coarse.map { case (cid, cvec) => (cid, cvec) }).toDF("cid", "cvec"))
    val cw = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid"))
    queries.crossJoin(centDf)
      .select(col("qid"), col("cid"),
        cosine(col("qvec"), col("cvec")).as("ccos"))
      .withColumn("crank", row_number().over(cw))
      .filter(col("crank") <= nprobe)
      .select(col("qid"), col("cid"))
  }

  /** ADC ranking over probed candidates — the shared back half of both
    * IVF-PQ search paths. `cand` is (qid, id, codes) after IVF pruning;
    * scoring is the same broadcast-LUT + fixed-order reassembly as
    * [[pqAdcTopK]]: the per-query lookup tables broadcast (queries × m ×
    * k rows), the corpus side ships only (qid, id, sub, code), and the
    * score is re-assembled in subspace order so it is bit-identical
    * cross-engine.
    */
  private def adcRank(cand: DataFrame, queries: DataFrame,
                      codebooks: Seq[Seq[(Int, Seq[Double])]],
                      k: Int): DataFrame = {
    val spark = queries.sparkSession
    val m = codebooks.size
    val sub = codebooks.head.head._2.size
    val lutDf = spark.createDataFrame(
      codebooks.zipWithIndex.flatMap { case (cb, s) =>
        cb.map { case (cid, cvec) => (s, cid, cvec) }
      }).toDF("sub", "code_cid", "cvec")
    val qlut = queries.crossJoin(broadcast(lutDf))
      .select(col("qid").as("lqid"), col("sub"), col("code_cid"),
        dot(slice(col("qvec"), col("sub") * sub + 1, lit(sub)),
          col("cvec")).as("p"))
    val parts = (0 until m).map(s =>
      sum(when(col("sub") === s, col("p"))).as(s"p$s"))
    val score = (0 until m).map(s => col(s"p$s")).reduce(_ + _)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    cand
      .select(col("qid"), col("id"),
        posexplode(col("codes")).as(Seq("esub", "code")))
      .join(broadcast(qlut),
        col("lqid") === col("qid") && col("esub") === col("sub") &&
          col("code") === col("code_cid"))
      // (Deliberately NOT pre-partitioned by qid to share one exchange
      // with the rank window: that would move the exchange BELOW the
      // partial aggregation and ship m rows per (qid, id) instead of
      // one — guide §2.3's aggregate-before-shuffle outweighs the saved
      // stage at any real scale.)
      .groupBy(col("qid"), col("id"))
      .agg(parts.head, parts.tail: _*)
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** IVF+PQ — the two halves composed into the production ANN index
    * (FAISS's IVFPQ): a coarse quantizer prunes the corpus to `nprobe`
    * clusters per query, then ADC ranks ONLY the probed candidates by
    * their PQ codes. At rest the index is (id, coarse cid, codes) — see
    * [[writeIvfPqIndex]]/[[ivfPqSearchStored]] for the persisted form;
    * this overload builds the index frame inline (one map-side pass) for
    * ad-hoc search. The original vectors appear in no search plan.
    *
    * Scale shape: candidate generation is an equi-join on the coarse
    * cluster id (the IVF pruning), the per-query lookup tables broadcast
    * (queries × m × k rows), and the ADC sum is the same fixed-order
    * exact reassembly as [[pqAdcTopK]] — nothing about the composition
    * adds a shuffle the parts didn't already have.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                coarse: Seq[(Int, Seq[Double])],
                codebooks: Seq[Seq[(Int, Seq[Double])]],
                nprobe: Int, k: Int): DataFrame = {
    val probes = probeClusters(queries, coarse, nprobe)
    val cand = ivfPqIndex(corpus, coarse, codebooks)
      .join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("codes"))
    adcRank(cand, queries, codebooks, k)
  }

  /** ADC-then-refine — FAISS's IndexRefine pattern: [[ivfPqTopK]]
    * proposes `rcand` candidates per query from the compressed codes
    * alone, then ONLY those rows are re-scored against their original
    * vectors (exact ordered-fold cosine) and the final top-k re-ranked.
    * This buys back the PQ quantization error at the output: ADC error
    * now affects only WHICH rcand candidates surface, never their final
    * order or score — so refined recall ≥ plain ADC recall at the same
    * m/k whenever rcand > k gives the true neighbors room to surface
    * (pinned by `LlmOpsSpec`).
    *
    * Scale shape: the refine join touches queries × rcand rows of the
    * raw-vector table — a point-lookup equi-join on id (broadcast the
    * candidate list, or partition-prune a stored raw index via
    * [[ivfVecSearchStored]]'s layout), NOT a scan. The full-precision
    * corpus is read for ~dozens of ids per query; everything corpus-wide
    * still happens over codes.
    */
  def ivfPqRefineTopK(corpus: DataFrame, queries: DataFrame,
                      coarse: Seq[(Int, Seq[Double])],
                      codebooks: Seq[Seq[(Int, Seq[Double])]],
                      nprobe: Int, rcand: Int, k: Int): DataFrame = {
    val cand = ivfPqTopK(corpus, queries, coarse, codebooks, nprobe, rcand)
      .select(col("qid"), col("id"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id"))
    cand
      .join(corpus.select(col("id"), col("vec")), Seq("id"))
      .join(broadcast(queries.select(col("qid"), col("qvec"))), Seq("qid"))
      .select(col("qid"), col("id"),
        cosine(col("qvec"), col("vec")).as("score"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** The corpus re-expressed as RESIDUALS from the coarse quantizer —
    * (id, cid, vec − coarse_centroid[cid]) — the transform under FAISS
    * IVFPQ's encoding: PQ quantizes the (small, centered) displacement
    * from the cluster centroid rather than the raw vector, so the same
    * m/k codebook budget spends its resolution on the part of the vector
    * the coarse quantizer didn't already explain. Pure map work: the
    * assignment fold plus a zip_with subtract against a literal cid →
    * centroid map — no join, no shuffle, same scan-speed shape as
    * [[nearestCentroid]].
    */
  def residualCorpus(corpus: DataFrame,
                     coarse: Seq[(Int, Seq[Double])]): DataFrame = {
    val sorted = coarse.sortBy(_._1)
    val centMap = map_from_arrays(
      array(sorted.map { case (cid, _) => lit(cid) }: _*),
      array(sorted.map { case (_, cvec) => array(cvec.map(lit): _*) }: _*))
    corpus
      .select(col("id"), col("vec"),
        nearestCentroid(col("vec"), coarse).as("cid"))
      .select(col("id"), col("cid"),
        zip_with(col("vec"), element_at(centMap, col("cid")),
          (x, y) => x - y).as("vec"))
  }

  /** Train PQ codebooks on the coarse residuals — [[pqTrain]] over
    * [[residualCorpus]]. Residuals are centered displacements, not
    * unit-sphere directions, so the squared-L2 objective is the right
    * default (`l2 = true`), matching FAISS (whose k-means is always L2).
    */
  def pqTrainResidual(corpus: DataFrame, coarse: Seq[(Int, Seq[Double])],
                      m: Int, k: Int, maxIter: Int,
                      l2: Boolean = true): Seq[Seq[(Int, Seq[Double])]] =
    pqTrain(residualCorpus(corpus, coarse).select(col("id"), col("vec")),
      m, k, maxIter, l2 = l2)

  /** The residual-encoded IVF-PQ index rows — (id, coarse cid, codes of
    * vec − coarse_centroid[cid]) — still ONE map-side pass: assignment
    * fold, literal-map centroid subtract, m code folds, staged as sibling
    * projections of the same scan. `codebooks` must come from
    * [[pqTrainResidual]] under the same `coarse` model and `l2` flag.
    */
  def ivfPqResidualIndex(corpus: DataFrame, coarse: Seq[(Int, Seq[Double])],
                         codebooks: Seq[Seq[(Int, Seq[Double])]],
                         l2: Boolean = true): DataFrame = {
    val sub = codebooks.head.head._2.size
    val codeCols = codebooks.zipWithIndex.map { case (cb, s) =>
      assign(slice(col("vec"), s * sub + 1, sub), cb, l2)
    }
    residualCorpus(corpus, coarse)
      .select(col("id"), col("cid"), array(codeCols: _*).as("codes"))
  }

  /** IVF-PQ search over RESIDUAL codes — the ADC identity that makes
    * residual encoding searchable at the same cost as plain codes:
    *
    *   dot(q, vec) ≈ dot(q, centroid[cid] + recon(residual))
    *               = dot(q, centroid[cid]) + Σ_s dot(q_s, codebook_s[code_s])
    *
    * so a candidate's score is the plain per-subspace LUT sum plus ONE
    * extra per-(query, probed-cluster) constant — and (queries × nprobe)
    * constants are model-sized, a broadcast. Candidate generation is the
    * same coarse-cid equi-join as [[ivfPqTopK]]; nothing about residuals
    * adds a shuffle. Score assembly is fixed-order (constant first, then
    * subspaces left-to-right) so it is bit-identical cross-engine.
    */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame,
                        coarse: Seq[(Int, Seq[Double])],
                        codebooks: Seq[Seq[(Int, Seq[Double])]],
                        nprobe: Int, k: Int,
                        l2: Boolean = true): DataFrame = {
    val spark = queries.sparkSession
    val m = codebooks.size
    val sub = codebooks.head.head._2.size
    val probes = probeClusters(queries, coarse, nprobe)
    // per-(qid, probed cid) constant: dot(query, coarse centroid)
    val centDf = broadcast(spark.createDataFrame(
      coarse.map { case (cid, cvec) => (cid, cvec) }).toDF("cid", "ccvec"))
    val qconst = probes
      .join(queries, Seq("qid")).join(centDf, Seq("cid"))
      .select(col("qid"), col("cid"),
        dot(col("qvec"), col("ccvec")).as("cconst"))
    val cand = ivfPqResidualIndex(corpus, coarse, codebooks, l2)
      .join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("cid"), col("id"), col("codes"))
    // ADC over residual codes: the same broadcast-LUT reassembly as
    // adcRank, plus the coarse constant folded in FIRST.
    val lutDf = spark.createDataFrame(
      codebooks.zipWithIndex.flatMap { case (cb, s) =>
        cb.map { case (cid, cvec) => (s, cid, cvec) }
      }).toDF("sub", "code_cid", "cvec")
    val qlut = queries.crossJoin(broadcast(lutDf))
      .select(col("qid").as("lqid"), col("sub"), col("code_cid"),
        dot(slice(col("qvec"), col("sub") * sub + 1, lit(sub)),
          col("cvec")).as("p"))
    val parts = (0 until m).map(s =>
      sum(when(col("sub") === s, col("p"))).as(s"p$s"))
    val score = (0 until m).map(s => col(s"p$s"))
      .foldLeft(col("cconst"))(_ + _)
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    cand
      .select(col("qid"), col("cid"), col("id"),
        posexplode(col("codes")).as(Seq("esub", "code")))
      .join(broadcast(qlut),
        col("lqid") === col("qid") && col("esub") === col("sub") &&
          col("code") === col("code_cid"))
      .groupBy(col("qid"), col("cid"), col("id"))
      .agg(parts.head, parts.tail: _*)
      .join(broadcast(qconst), Seq("qid", "cid"))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** Persist a PLAIN IVF index — raw vectors at rest, cid-partitioned:
    * the no-quantization operating point of the at-rest family. Same
    * layout contract as [[writeIvfPqIndex]] (one file per cluster
    * directory, probe-time literal cid predicate prunes at file-listing
    * time), but rows keep the full `vec` instead of PQ codes: ~16–32×
    * more bytes per row, zero quantization loss — the right trade when
    * the corpus is merely large (not huge) or recall tolerances are
    * tight. The maintenance verbs are layout-generic and shared:
    * [[deleteFromIvfPqIndex]] / [[readIvfPqIndex]] / [[compactIvfPqIndex]]
    * operate on any cid-partitioned layout with an `id` column, this one
    * included.
    */
  def writeIvfIndex(corpus: DataFrame, coarse: Seq[(Int, Seq[Double])],
                    path: String, l2: Boolean = false): Unit =
    corpus.select(col("id"), col("vec"),
        assign(col("vec"), coarse, l2).as("cid"))
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(path)

  /** Search a [[writeIvfIndex]] layout: literal cid partition predicate
    * (static pruning, same as [[ivfPqSearchStored]]), then EXACT cosine
    * inside the probed cells — no ADC approximation; the scan reads the
    * probed directories' full vectors, which is the price of exactness.
    */
  def ivfSearchStored(index: DataFrame, queries: DataFrame,
                      coarse: Seq[(Int, Seq[Double])],
                      nprobe: Int, k: Int): DataFrame = {
    val probes = probeClusters(queries, coarse, nprobe)
    val probeCids = probes.select(col("cid")).distinct()
      .collect().map(_.getInt(0)).sorted
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id"))
    index.filter(col("cid").isin(probeCids.toIndexedSeq: _*))
      .join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("id"), cosine(col("vec"), col("qvec")).as("cos"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("cos"))
  }

  /** Search a PERSISTED IVF-PQ index (written by [[writeIvfPqIndex]]) —
    * the at-rest half of the production pattern: the probe set's cluster
    * ids become a LITERAL partition predicate on the cid-partitioned
    * parquet, so the scan lists and reads ONLY the probed cluster
    * directories; assignment and encoding never re-run at query time.
    *
    * The probe-cid collect is (nqueries × nprobe) ints — driver-side
    * model metadata, the same traffic class as the centroids themselves —
    * and it is what makes the pruning STATIC: the predicate is resolved
    * at file-listing time, visible in the scan's PartitionFilters, rather
    * than relying on runtime dynamic-pruning heuristics to fire.
    */
  /** The probe set COLLECTED (model-sized: queries × nprobe rows).
    * Index-maintenance flows search the same query set against several
    * physical states of one stored index (pre-delete, masked, compacted);
    * the probe set depends only on (queries, coarse, nprobe), so
    * re-deriving it inside every search schedules pure duplicate probe
    * jobs — collect it once and let each search join a LocalRelation.
    */
  def collectedProbes(queries: DataFrame, coarse: Seq[(Int, Seq[Double])],
                      nprobe: Int): Seq[(Long, Int)] =
    probeClusters(queries, coarse, nprobe).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq

  def ivfPqSearchStored(index: DataFrame, queries: DataFrame,
                        coarse: Seq[(Int, Seq[Double])],
                        codebooks: Seq[Seq[(Int, Seq[Double])]],
                        nprobe: Int, k: Int): DataFrame =
    ivfPqSearchStored(index, queries,
      collectedProbes(queries, coarse, nprobe), codebooks, k)

  /** Search against a PRE-COLLECTED probe set (see [[collectedProbes]]):
    * the probe side becomes a broadcast LocalRelation, so the only
    * cluster work per search is the pruned index scan + ADC ranking.
    */
  def ivfPqSearchStored(index: DataFrame, queries: DataFrame,
                        probes: Seq[(Long, Int)],
                        codebooks: Seq[Seq[(Int, Seq[Double])]],
                        k: Int): DataFrame = {
    val spark = queries.sparkSession
    val probeCids = probes.map(_._2).distinct.sorted
    val probesDf = spark.createDataFrame(probes).toDF("qid", "cid")
    val cand = index
      .filter(col("cid").isin(probeCids.toIndexedSeq: _*))
      .join(broadcast(probesDf), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), col("codes"))
    adcRank(cand, queries, codebooks, k)
  }

  /** Decoded (reconstructed) vectors under the codebooks — each
    * subspace's assigned centroid, concatenated. The decode half of
    * [[pqEncode]]; shared by [[pqReconError]]-style evaluation and the
    * OPQ rotation update, which needs the reconstruction itself.
    */
  def pqReconstruct(corpus: DataFrame,
                    codebooks: Seq[Seq[(Int, Seq[Double])]],
                    l2: Boolean = false): DataFrame = {
    val sub = codebooks.head.head._2.size
    val parts = codebooks.zipWithIndex.map { case (cb, s) =>
      val sl = slice(col("vec"), s * sub + 1, sub)
      val sorted = cb.sortBy(_._1)
      require(sorted.map(_._1) == sorted.indices.toSeq,
        "codebook cids must be contiguous from 0 for the decode lookup")
      val cvecs = array(sorted.map { case (_, cvec) =>
        array(cvec.map(lit): _*)
      }: _*)
      element_at(cvecs, assign(sl, cb, l2) + 1)
    }
    corpus.select(col("id"), concat(parts: _*).as("y"))
  }

  /** TRAINED OPQ rotation (Ge et al., CVPR'13, the non-parametric
    * alternating form) — instead of a fixed random rotation, alternate:
    * (1) fix R, train PQ codebooks on the rotated corpus; (2) fix the
    * codes' reconstructions Y, solve the orthogonal Procrustes problem
    * min_R Σ‖R·x − y‖² whose closed form is R = V·Uᵀ from the SVD of
    * the d×d correlation M = Σ x·yᵀ. Each step is non-increasing in
    * reconstruction error (Lloyd under a fixed R; Procrustes under
    * fixed Y), which is the property the entry pins.
    *
    * Scale shape: the only corpus-wide state is M — d² doubles — so
    * step (2) is one map-side pass: per-partition imperative
    * accumulation (the classic treeAggregate shape; this is the rare
    * spot where RDD mapPartitions IS the right tool — a d×d dense fold
    * has no columnar form that avoids a d²-wide row explosion), reduced
    * as FIXED-POINT longs on the 2^20 grid so the sum is exact-integer
    * and order-free across partitions, retries, and cluster sizes —
    * the same determinism contract as every score in this engine. The
    * SVD is driver-side on d×d (model-sized, breeze/LAPACK).
    *
    * @return (rotation rows, codebooks) — a CONSISTENT pair: training
    *         ends on a codebook pass under the final rotation
    */
  def opqTrain(corpus: DataFrame, m: Int, k: Int, opqIters: Int,
               kmeansIters: Int, seedRot: Seq[Seq[Double]]):
      (Seq[Seq[Double]], Seq[Seq[(Int, Seq[Double])]]) = {
    val d = seedRot.size
    var rot = seedRot
    var cbs: Seq[Seq[(Int, Seq[Double])]] = null
    for (it <- 0 until opqIters) {
      val rotated = corpus.select(col("id"),
        randomProjection(col("vec"), rot).as("vec")).localCheckpoint(true)
      cbs = pqTrain(rotated, m, k, kmeansIters, l2 = true)
      if (it < opqIters - 1) {
        val xy = corpus.select(col("id"), col("vec").as("x"))
          .join(pqReconstruct(rotated, cbs, l2 = true), Seq("id"))
          .select(col("x"), col("y"))
        val mFp = xy.rdd.mapPartitions { rows =>
          val acc = new Array[Long](d * d)
          rows.foreach { r =>
            val x = r.getSeq[Double](0)
            val y = r.getSeq[Double](1)
            var a = 0
            while (a < d) {
              val xa = x(a)
              var b = 0
              while (b < d) {
                acc(a * d + b) += math.floor(xa * y(b) * 1048576.0).toLong
                b += 1
              }
              a += 1
            }
          }
          Iterator.single(acc)
        }.reduce { (p, q) =>
          var i = 0
          while (i < p.length) { p(i) += q(i); i += 1 }
          p
        }
        // M(a,b) = Σ x(a)·y(b); maximize tr(R·M) over orthogonal R:
        // M = U·S·Vᵀ → R = V·Uᵀ (breeze is column-major — transpose in)
        val mMat = new breeze.linalg.DenseMatrix(d, d,
          mFp.map(_ / 1048576.0)).t
        val breeze.linalg.svd.SVD(u, _, vt) = breeze.linalg.svd(mMat)
        val r = vt.t * u.t
        rot = (0 until d).map(j => (0 until d).map(i => r(j, i)))
      }
      // ALL iterations release their corpus-sized checkpoint, including
      // the last (codebooks are already collected driver-side literals;
      // leaking the final copy would cost one corpus of block storage
      // per opqTrain call in a library caller)
      rotated.unpersist()
    }
    (rot, cbs)
  }

  /** PQ reconstruction error — the "how lossy is my index" evaluation
    * that decides m and k: decode every vector's codes back to their
    * centroids and report the squared L2 error between the original and
    * its reconstruction. Pure map work (assignment fold + literal-array
    * centroid lookup + one diff fold per subspace per row).
    *
    * Determinism: each subspace's squared error is an ordered fold,
    * floored onto the 2^20 grid; the total is a sum of longs — order-free
    * and bit-exact cross-engine, like every other score in this engine.
    *
    * @return (id, err_fp) with err_fp = Σ_s floor(sqerr_s · 2^20)
    */
  def pqReconError(corpus: DataFrame,
                   codebooks: Seq[Seq[(Int, Seq[Double])]],
                   l2: Boolean = false): DataFrame = {
    val sub = codebooks.head.head._2.size
    val errCols = codebooks.zipWithIndex.map { case (cb, s) =>
      val sl = slice(col("vec"), s * sub + 1, sub)
      val sorted = cb.sortBy(_._1)
      require(sorted.map(_._1) == sorted.indices.toSeq,
        "codebook cids must be contiguous from 0 for the decode lookup")
      val cvecs = array(sorted.map { case (_, cvec) =>
        array(cvec.map(lit): _*)
      }: _*)
      val cvec = element_at(cvecs, assign(sl, cb, l2) + 1)
      floor(sqDist(sl, cvec) * MeanGrid).cast("long")
    }
    corpus.select(col("id"),
      errCols.reduce(_ + _).as("err_fp"))
  }

  /** Cluster-quality evaluation against ground-truth labels: per cluster,
    * member count, the majority label, and its count — the purity report
    * that decides whether a trained clustering is good enough to drive
    * semantic dedup / balanced sampling. Ties break to the LOWEST label
    * (max over struct(count, −label): lexicographic max takes the higher
    * count first, then the higher negated label = lower label) so the
    * verdict is deterministic, not hash-order luck.
    *
    * Scale shape: two partial-combined aggregations — (cid, label) then
    * cid — shuffling only counts; purity = top_n/n stays derivable from
    * the exact integers so nothing floats across an engine boundary.
    *
    * @param assigned (id, cid) cluster assignment
    * @param labels   (id, label) ground truth
    */
  def clusterPurity(assigned: DataFrame, labels: DataFrame): DataFrame =
    assigned.join(labels, Seq("id"))
      .groupBy(col("cid"), col("label"))
      .agg(count(lit(1)).as("n_lab"))
      .groupBy(col("cid"))
      .agg(sum(col("n_lab")).as("n"),
        max(struct(col("n_lab"), (-col("label")).as("neg_label"))).as("top"))
      .select(col("cid"), col("n"),
        (-col("top.neg_label")).as("top_label"),
        col("top.n_lab").as("top_n"))

  /** Symmetric int8 scalar quantization of an embedding column — the
    * standard 4× compression step before an embedding corpus is indexed.
    * scale = max|x| / 127; q_i = floor(x_i/scale + 0.5) (round-half-up
    * spelled as floor so every engine agrees); zero vectors quantize to
    * zeros. Returns struct(scale, q array<long>). Map-side only.
    */
  def quantizeInt8(vec: Column): Column = {
    val scale = array_max(transform(vec, x => abs(x))) / 127.0
    val q = when(scale === 0.0,
        transform(vec, _ => lit(0L)))
      .otherwise(transform(vec, x => floor(x / scale + 0.5).cast("long")))
    struct(scale.as("scale"), q.as("q"))
  }

  /** Max absolute reconstruction error of a quantization (ordered fold). */
  def dequantMaxErr(vec: Column, q: Column, scale: Column): Column =
    aggregate(zip_with(vec, q, (x, qq) => abs(x - qq * scale)),
      lit(0.0), (acc, e) => greatest(acc, e))
}
