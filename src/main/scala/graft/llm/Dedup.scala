package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Quality-aware exact dedup — the keeper is the BEST copy, not the
    * first: within each identical-content group (keyed on a caller-chosen
    * canonical form, e.g. case-folded text) keep the copy with the
    * highest quality score, ties to the lowest id. This is what
    * production pipelines actually do with crawl duplicates: the same
    * content arrives shouted, truncated, or clean, and a min-id keeper
    * preserves whichever crawl happened first rather than the
    * best-formatted copy.
    *
    * Scale shape: identical to [[exactGroups]] — ONE shuffle on the
    * content key; the argmax is a struct max with map-side partial
    * combine (the lexicographic (score, −id) trick, as in clusterPurity),
    * so no window and no second pass.
    */
  def bestCopyGroups(docs: DataFrame, score: Column, key: Column,
                     idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol).as("id0"), key.as("content_key"), score.as("score0"))
      .groupBy(col("content_key"))
      .agg(
        max(struct(col("score0").as("score"), (-col("id0")).as("neg_id")))
          .as("best"),
        count(lit(1)).as("n_copies"))
      .select((-col("best.neg_id")).as("keeper_id"),
        col("best.score").as("keeper_score"),
        col("n_copies"), col("content_key"))

  /** Modulus for the derived minhash permutation family. */
  val MinhashMod = 1000000007L

  /** Full signature in ONE pass over the shingle array, for use inline in
    * a projection (no cached hash columns needed). Structured so each
    * cost tier is evaluated exactly once per shingle: md5 in an inner
    * transform, the two 60-bit slices in an outer transform, and only the
    * k cheap modular multiplications inside the per-permutation lambda.
    * (Naively parameterizing minhashSignature with inline hash expressions
    * makes Catalyst re-inline the md5 into every permutation — HOF lambdas
    * get no subexpression elimination — for a k× hashing bill.)
    * The fold's element-wise-min accumulator starts at MinhashMod ≙ +inf
    * (permutation values are < MinhashMod).
    */
  def minhashSignatureFromShingles(shingles: org.apache.spark.sql.Column, k: Int) = {
    val hv = transform(transform(shingles, s => md5(s)), d => struct(
      conv(substring(d, 1, 15), 16, 10).cast("long").as("h1"),
      conv(substring(d, 17, 15), 16, 10).cast("long").as("h2")))
    aggregate(hv,
      array_repeat(lit(MinhashMod), k),
      (acc, b) => zip_with(acc,
        transform(sequence(lit(0), lit(k - 1)),
          j => ((b.getField("h1") % MinhashMod) +
            j.cast("long") * (b.getField("h2") % MinhashMod)) % MinhashMod),
        (x, y) => least(x, y)))
  }

  /** LSH bands: split the k-entry signature into `bands` contiguous groups
    * of rows and join each group into one bucket key. Two documents are
    * candidates iff they agree on ALL rows of at least one band.
    */
  def lshBands(signature: org.apache.spark.sql.Column, bands: Int, rowsPerBand: Int) =
    transform(sequence(lit(0), lit(bands - 1)),
      b => array_join(
        transform(slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")), "|"))

  /** Exact Jaccard over two shingle arrays (deduplicated set semantics).
    * try_divide: two sub-shingle-length docs both have EMPTY shingle sets
    * (and identical all-MinhashMod signatures, so they always become LSH
    * candidates) — the 0/0 must yield NULL, not a query-killing
    * DIVIDE_BY_ZERO under ANSI mode (Spark 4 default). NULL then fails
    * every `>= threshold` filter, which is the right call: two docs with
    * no shingles have no evidence of similarity.
    */
  def jaccard(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    try_divide(size(array_intersect(da, db)).cast("double"),
      size(array_union(da, db)))
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
    require(k % bands == 0, "bands must divide k evenly")
    val rows = k / bands
    // ONE persist, of (id, shingles) only. The shingle array is the sole
    // expensive per-doc artifact every downstream consumer needs (band
    // join both sides + verify joins both sides); caching exactly it means
    // (a) the shingle HOF pipeline runs once — projecting derived hash
    // columns in the same select would make CollapseProject inline the
    // shingle expression into each of them, and HOF lambdas get no
    // subexpression elimination — and (b) the cache stores a FLAT
    // array<string>, which Spark's columnar store encodes ~4× faster than
    // the equivalent array<struct> of hash pairs (measured at sf0.1).
    val shingleExpr = array_distinct(TextAnalysis.wordShingles(
      TextAnalysis.words(col(textCol)), shingleWords))
    val sh = docs.select(
      col(idCol).as("id"),
      shingleExpr.as("shingles"))
      .persist()
    val banded = sh
      .select(col("id"),
        posexplode(lshBands(
          minhashSignatureFromShingles(col("shingles"), k), bands, rows))
          .as(Seq("band", "bucket")))
    // NOT persisted: the self-join's two sides build identical shuffle
    // exchanges over `banded`, so ReusedExchange computes the signature
    // pipeline once.
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .persist()
    // SIZE-GATED verify plan. The candidate set is usually orders of
    // magnitude smaller than the corpus (LSH's whole point), but on a
    // crawl-scale corpus with a 30-50% dup rate it is billions of rows —
    // an unconditional broadcast hint there is a driver/executor OOM, so
    // the hint is gated on an actual count (the count also materializes
    // the persisted pairs the two verify joins reuse).
    //  - Gate passes: broadcast ONLY the bare id pairs (never rows
    //    carrying shingle arrays — pairs × shingle-array payload is the
    //    real OOM, not the pair count). The cached shingle table streams
    //    map-side through the first join; the second join shuffles only
    //    candidate-implicated rows: the pair side semi-filters `sh`
    //    map-side (broadcast semi on id_b) so the full corpus never
    //    shuffles — total shuffle volume is O(candidates), not O(corpus).
    //  - Gate fails (crawl scale): plain equi-joins; AQE picks the
    //    strategy. The corpus shuffling on id is the correct cost then.
    val nPairs = candidates.count()
    val verified =
      if (nPairs <= MaxBroadcastPairs) {
        val candB = broadcast(candidates)
        val withA = sh.select(col("id"), col("shingles").as("sh_a"))
          .join(candB, col("id_a") === col("id")).drop("id")
        val shB = sh.select(col("id").as("idb"), col("shingles").as("sh_b"))
          .join(broadcast(candidates.select(col("id_b"))),
            col("idb") === col("id_b"), "left_semi")
        withA.join(shB, col("id_b") === col("idb")).drop("idb")
      } else {
        candidates
          .join(sh.select(col("id"), col("shingles").as("sh_a")),
            col("id_a") === col("id")).drop("id")
          .join(sh.select(col("id"), col("shingles").as("sh_b")),
            col("id_b") === col("id")).drop("id")
      }
    // Materialize the confirmed pairs (orders of magnitude smaller than
    // the corpus) so the shingle/candidate caches can be released NOW —
    // a long-lived session (the serve path, repeated pipeline cycles)
    // would otherwise accumulate cached blocks until LRU eviction.
    val confirmed = verified
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .localCheckpoint(true)
    sh.unpersist()
    candidates.unpersist()
    confirmed
  }

  /** Broadcast gate for the minhash verify joins: bare (long, long) pairs
    * at ~32 bytes/row keep the broadcast ≤ ~32 MB.
    */
  val MaxBroadcastPairs: Long = 1000000L

  /** Edit-distance-verified near-dup pairs: the same banded MinHash
    * candidate generation as [[minhashNearDups]], but the verify stage
    * is bounded LEVENSHTEIN over the raw text — the character-level
    * verifier a dedup pipeline reaches for when token-set Jaccard is
    * too coarse (it is blind to word-internal typos, inflection, and
    * ordering, all of which edit distance prices per character).
    *
    * Scale shape, same contract as the Jaccard verify: candidates exist
    * only inside a (band, bucket); under the broadcast gate the bare id
    * pairs broadcast and the corpus text streams map-side through the
    * first join while a broadcast semi-filter keeps non-implicated text
    * out of the second join's exchange — total shuffle volume is
    * O(candidate texts), never O(corpus). The distance itself runs ONCE
    * per candidate pair with Spark's threshold variant, which abandons
    * a pair the moment its DP band exceeds `maxDist` — O(len·maxDist)
    * per pair, not O(len²).
    *
    * @return (id_a, id_b, dist) for candidate pairs with edit distance
    *         ≤ `maxDist`
    */
  def editDistNearDups(docs: DataFrame, textCol: String, idCol: String,
                       maxDist: Int, shingleWords: Int = 3, k: Int = 12,
                       bands: Int = 4): DataFrame = {
    require(k % bands == 0, "bands must divide k evenly")
    require(maxDist >= 0)
    val rows = k / bands
    val shingleExpr = array_distinct(TextAnalysis.wordShingles(
      TextAnalysis.words(col(textCol)), shingleWords))
    val sh = docs.select(col(idCol).as("id"), shingleExpr.as("shingles"))
      .persist()
    val banded = sh
      .select(col("id"),
        posexplode(lshBands(
          minhashSignatureFromShingles(col("shingles"), k), bands, rows))
          .as(Seq("band", "bucket")))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .persist()
    val nPairs = candidates.count()
    val txt = docs.select(col(idCol).as("id"), col(textCol).as("t"))
    val paired =
      if (nPairs <= MaxBroadcastPairs) {
        val withA = txt.select(col("id"), col("t").as("t_a"))
          .join(broadcast(candidates), col("id_a") === col("id")).drop("id")
        val txtB = txt.select(col("id").as("idb"), col("t").as("t_b"))
          .join(broadcast(candidates.select(col("id_b"))),
            col("idb") === col("id_b"), "left_semi")
        withA.join(txtB, col("id_b") === col("idb")).drop("idb")
      } else {
        candidates
          .join(txt.select(col("id"), col("t").as("t_a")),
            col("id_a") === col("id")).drop("id")
          .join(txt.select(col("id"), col("t").as("t_b")),
            col("id_b") === col("id")).drop("id")
      }
    val confirmed = paired
      .select(col("id_a"), col("id_b"),
        levenshtein(col("t_a"), col("t_b"), maxDist).cast("long").as("dist"))
      // the threshold variant reports -1 for over-budget pairs
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .localCheckpoint(true)
    sh.unpersist()
    candidates.unpersist()
    confirmed
  }

  /** MinHash/LSH candidate-recall harness: compare the banded candidate
    * pairs against EXACT ground truth (every pair with Jaccard ≥ t, from
    * an inverted-index pair stream) at several thresholds — the tuning
    * curve for (k, bands): rows-per-band trades recall at low similarity
    * against candidate volume, and this measures it instead of trusting
    * the 1−(1−j^r)^b formula. The dedup twin of the ANN recall@k sweep.
    *
    * Scale: the TRUTH pass costs Σ df² over shingle postings — exact
    * ground truth is an EVAL-corpus operation (the same position the
    * brute-force pass holds in the ANN recall sweep), not a production
    * pass; the candidate side is the usual banded join. All metrics are
    * exact integers (Jaccard ≥ t tested as inter·100 ≥ t·union, ppm by
    * floor division).
    *
    * @return one row per threshold: (thresh_pct, n_truth, n_caught,
    *         recall_ppm, n_candidates, precision_ppm)
    */
  def minhashRecall(docs: DataFrame, textCol: String, idCol: String,
                    shingleWords: Int = 3, k: Int = 12, bands: Int = 4,
                    threshPcts: Seq[Int] = Seq(50, 70, 90)): DataFrame = {
    require(k % bands == 0, "bands must divide k evenly")
    // t = 0 would claim "every pair with Jaccard >= 0" but the truth
    // stream only carries pairs sharing >= 1 shingle — reject instead of
    // silently computing recall over the wrong denominator
    require(threshPcts.nonEmpty && threshPcts.forall(t => t >= 1 && t <= 100),
      "thresholds must be percentages in [1, 100]")
    val rows = k / bands
    val sh = docs.select(col(idCol).as("id"),
      array_distinct(TextAnalysis.wordShingles(
        TextAnalysis.words(col(textCol)), shingleWords)).as("shingles"))
      .persist()
    val banded = sh.select(col("id"),
      posexplode(lshBands(minhashSignatureFromShingles(col("shingles"), k),
        bands, rows)).as(Seq("band", "bucket")))
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val sizes = sh.select(col("id"), size(col("shingles")).as("n"))
    val post = sh.select(col("id"), explode(col("shingles")).as("g"))
    val inter = post.as("a").join(post.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    val truth = inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")),
        Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("inter").cast("long").as("inter"),
        (col("na") + col("nb") - col("inter")).cast("long").as("uni"))
    val flagged = truth.join(cands.withColumn("cand", lit(1L)),
        Seq("id_a", "id_b"), "left")
      .select(col("inter"), col("uni"),
        coalesce(col("cand"), lit(0L)).as("cand"))
    val nCand = cands.agg(count(lit(1)).as("n_candidates"))
    val tdf = docs.sparkSession.range(1).select(
      explode(array(threshPcts.map(p => lit(p.toLong)): _*)).as("thresh_pct"))
    val M = lit(1000000L)
    val agg = flagged.crossJoin(broadcast(tdf))
      .filter(col("inter") * 100 >= col("thresh_pct") * col("uni"))
      .groupBy(col("thresh_pct"))
      .agg(count(lit(1)).as("n_truth"), sum(col("cand")).as("n_caught"))
    // left-join back onto the threshold list: a threshold with ZERO
    // qualifying truth pairs must still yield its row (all-zero metrics),
    // not silently vanish from the sweep
    val out = tdf.join(agg, Seq("thresh_pct"), "left")
      .crossJoin(broadcast(nCand))
      .select(col("thresh_pct"),
        coalesce(col("n_truth"), lit(0L)).as("n_truth"),
        coalesce(col("n_caught"), lit(0L)).as("n_caught"),
        col("n_candidates"))
      .select(col("thresh_pct"), col("n_truth"), col("n_caught"),
        when(col("n_truth") === 0, 0L)
          .otherwise(call_function("div", col("n_caught") * M,
            col("n_truth"))).as("recall_ppm"),
        col("n_candidates"),
        when(col("n_candidates") === 0, 0L)
          .otherwise(call_function("div", col("n_caught") * M,
            col("n_candidates"))).as("precision_ppm"))
      .localCheckpoint(true)
    sh.unpersist()
    out
  }

  /** Incremental corpus admission — dedup a NEW batch of documents against
    * an EXISTING kept corpus, the every-crawl-cycle operation of a training
    * -data pipeline. Returns one verdict row per batch document:
    * `exact_dup` (byte-identical to a corpus doc, or to a smaller-id batch
    * doc), `near_dup` (MinHash-confirmed Jaccard ≥ threshold against a
    * corpus doc or a smaller-id batch doc), else `admitted`.
    *
    * Within-batch ties are resolved greedily BY ID against the raw batch
    * (a doc is rejected if it matches any smaller-id batch doc, whether or
    * not that doc is itself admitted) — deterministic, one-pass, and free
    * of the sequential admit-then-compare dependency a streaming dedup
    * would impose; corpus membership always rejects.
    *
    * Scale design — the reason this exists as its own operator: NO
    * corpus × corpus pairs are ever generated. Corpus work is one
    * map-side pass (content hash, shingles, band signatures) producing
    * the side-tagged index table; the banded join's batch side carries
    * only batch rows (the side predicate pushes below the exchange), so
    * candidate volume is O(batch × band selectivity) regardless of
    * corpus size. A production pipeline keeps the corpus half of that
    * index precomputed, stored bucketed by (band, bucket), making each
    * crawl cycle's admission a bucket-pruned equi-join driven by the
    * batch. Exactness rides the same join (identical texts share every
    * band, so exact dups are always LSH candidates — `h_b = h_c` on the
    * pair replaces a whole content-hash membership pass). Verification
    * reuses the size-gated broadcast machinery of [[minhashNearDups]].
    */
  def incrementalVerdicts(corpus: DataFrame, batch: DataFrame,
                          textCol: String, idCol: String,
                          shingleWords: Int = 3, k: Int = 12, bands: Int = 4,
                          threshold: Double = 0.5): DataFrame = {
    require(k % bands == 0, "k must divide evenly into bands")
    val rows = k / bands
    val shingleExpr = array_distinct(TextAnalysis.wordShingles(
      TextAnalysis.words(col(textCol)), shingleWords))

    // There is NO separate exact tier: two identical texts have identical
    // MinHash signatures, hence share every band bucket, hence ALWAYS
    // surface as LSH candidates — so exactness is just `h_b = h_c` on the
    // candidate pair, and the whole content-hash membership pass (a
    // second corpus scan + shuffle) collapses into one carried column.
    //
    // Both sides flow through ONE side-tagged shingle table and ONE
    // banded table: the expensive shingle/md5 and signature HOF
    // pipelines each appear in exactly one stage (ReusedExchange serves
    // the self-join's two sides), which matters twice over — the work
    // runs once, and whole-stage codegen COMPILES once (these generated
    // classes are huge; a plan that re-states them across four stages
    // pays multiple sub-second janino compiles before any row moves).
    // Every downstream consumer (bands, both verify sides, the final
    // verdict frame) reads this one cache; at scale it IS the persistent
    // dedup index, materialized bucketed by (band, bucket). The one
    // spreadLocal repartition is a local-mode identity (see Tables).
    val sh = graft.model.Tables.spreadLocal(corpus.sparkSession,
      batch.select(col(idCol).as("id"), lit("b").as("side"),
        col(textCol).as("text"))
        .unionByName(corpus.select(col(idCol).as("id"), lit("c").as("side"),
          col(textCol).as("text"))))
      .select(col("id"), col("side"), md5(col("text")).as("h"),
        shingleExpr.as("shingles"))
      .persist()
    val banded = sh.select(col("id"), col("side"),
      posexplode(lshBands(
        minhashSignatureFromShingles(col("shingles"), k), bands, rows))
        .as(Seq("band", "bucket")))
    // One candidate set from one self-join: the left row must be a batch
    // doc; the right row is either a corpus doc (any band agreement) or
    // a smaller-id batch doc (greedy within-batch order). The side tag
    // keeps overlapping batch/corpus id spaces unambiguous.
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.side") === "b" &&
          (col("y.side") === "c" || col("x.id") > col("y.id")))
      .select(col("x.id").as("id_b"),
        col("y.id").as("id_c"), col("y.side").as("side"))
      .persist()
    // NOT distinct'ed: multi-band collisions only repeat a (cheap,
    // broadcast-side) verification, and the verdict aggregation below
    // dedupes ids anyway — a distinct here is a whole extra shuffle
    // stage on the hot path.
    //
    // size-gated verify, same contract as minhashNearDups: broadcast only
    // bare id/side pairs, semi-filter the shingle side map-side; past the
    // gate, plain equi-joins and AQE's own strategy choice.
    val verified =
      if (candidates.count() <= MaxBroadcastPairs) {
        val withB = sh.filter(col("side") === "b")
          .select(col("id"), col("h").as("h_b"), col("shingles").as("sh_b"))
          .join(broadcast(candidates), col("id_b") === col("id")).drop("id")
        val otherSide = sh
          .select(col("id").as("idc"), col("side").as("oside"),
            col("h").as("h_c"), col("shingles").as("sh_c"))
          .join(
            broadcast(candidates.select(col("id_c").as("sid"), col("side").as("sside"))),
            col("idc") === col("sid") && col("oside") === col("sside"), "left_semi")
        withB.join(otherSide,
          col("id_c") === col("idc") && col("side") === col("oside"))
      } else {
        candidates
          .join(sh.filter(col("side") === "b")
              .select(col("id"), col("h").as("h_b"), col("shingles").as("sh_b")),
            col("id_b") === col("id")).drop("id")
          .join(sh.select(col("id").as("idc"), col("side").as("oside"),
              col("h").as("h_c"), col("shingles").as("sh_c")),
            col("id_c") === col("idc") && col("side") === col("oside"))
      }

    // ---- verdicts (exact wins over near) ----
    // Per-pair severity (2 = byte-identical, 1 = Jaccard-confirmed near
    // dup, NULL = band collision that failed verification), max-reduced
    // per batch doc in one aggregation — the agg IS the dedup of
    // multi-band / multi-partner collisions — then one left join back.
    val severity = verified
      .select(col("id_b").as("id"),
        when(col("h_b") === col("h_c"), 2)
          .when(jaccard(col("sh_b"), col("sh_c")) >= threshold, 1).as("sev"))
      .groupBy(col("id")).agg(max(col("sev")).as("sev"))
    // One row per batch doc — tiny; materialize and release the
    // side-tagged shingle cache and candidate pairs (same leak contract
    // as minhashNearDups).
    val verdicts = sh.filter(col("side") === "b").select(col("id"))
      .join(severity, Seq("id"), "left")
      .select(col("id"),
        when(col("sev") === 2, "exact_dup")
          .when(col("sev") === 1, "near_dup")
          .otherwise("admitted").as("verdict"))
      .localCheckpoint(true)
    sh.unpersist()
    candidates.unpersist()
    verdicts
  }

  /** Seed the at-rest exact-dedup index: one row per DISTINCT content
    * hash of the kept corpus. This is the persistent state the streaming
    * admission loop joins against and appends to — hash-only (no text,
    * no ids), so at 100 TB it is ~1/1000th the corpus bytes; a real
    * deployment would additionally partition it by a hash prefix so the
    * per-batch membership join prunes, exactly like the ANN index's cid
    * directories.
    */
  def writeHashIndex(corpus: DataFrame, textCol: String,
                     path: String): Unit =
    corpus.select(md5(col(textCol)).as("h")).distinct()
      .write.mode("overwrite").parquet(path)

  /** STREAMING exact-dedup admission — the continuous-crawl form of the
    * batch-vs-corpus admission above: micro-batches of new documents
    * arrive, each is deduped against the at-rest hash index AND
    * against itself, verdicts land in `outPath`, and admitted hashes
    * are APPENDED to the index so later batches dedup against earlier
    * admissions. Arrival order is semantic: the first copy of a text to
    * ARRIVE is the one admitted (within a batch, the smallest id), so a
    * global min-id dedup over the pooled stream is NOT equivalent — the
    * keeper is decided by the sequence of index states, the same
    * contract every production admission queue has.
    *
    * Per-batch mechanics (inside foreachBatch, all batch-sized):
    * hash map-side, window rank within the batch per hash, one
    * left membership join against the index (shuffle on `h` at scale;
    * prunable if the index is hash-prefix-partitioned), verdicts
    * materialized with localCheckpoint BEFORE the index append so the
    * batch never sees its own admissions as duplicates, then two
    * appends (verdicts, admitted hashes). The index re-read per batch
    * picks up every prior batch's appends — state lives entirely at
    * rest; nothing accumulates on the driver or in stream state.
    */
  def runStreamingAdmission(stream: DataFrame, indexPath: String,
                            outPath: String, checkpointDir: String,
                            idCol: String = "doc_id",
                            textCol: String = "text",
                            batchCol: String = "batch_no"): Unit = {
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val idx = s.read.parquet(indexPath)
          .select(col("h")).withColumn("in_idx", lit(1))
        val w = Window.partitionBy(col("h")).orderBy(col(idCol))
        val verdicts = batch
          .select(col(batchCol), col(idCol), md5(col(textCol)).as("h"))
          .withColumn("rn", row_number().over(w))
          .join(idx, Seq("h"), "left")
          .select(col(batchCol), col(idCol), col("h"),
            when(col("in_idx").isNotNull || col("rn") > 1, "exact_dup")
              .otherwise("admitted").as("verdict"))
          .localCheckpoint(true)
        verdicts.select(col(batchCol), col(idCol), col("verdict"))
          .write.mode("append").parquet(outPath)
        verdicts.filter(col("verdict") === "admitted")
          .select(col("h")).distinct()
          .write.mode("append").parquet(indexPath)
        verdicts.unpersist()
        ()
      }
      .start()
    q.awaitTermination()
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

  /** Connected components over an undirected edge list by iterative
    * min-label propagation — the cluster-resolution step that turns
    * near-dup PAIRS into dedup GROUPS (pick one keeper per component).
    *
    * Pregel-style fixpoint: each iteration every node takes the min of
    * its own label and its neighbors' labels (one equi-join + one
    * aggregation per iteration, both with map-side partial combine);
    * convergence when no label changes. Iteration count is bounded by
    * the component diameter — near-dup graphs are shallow (dup clusters
    * are quasi-cliques), so a handful of rounds suffice at any corpus
    * size; `maxIter` caps pathological chains. This driver-side loop is
    * control flow only — all data stays distributed.
    *
    * Each iteration the new label frame is `localCheckpoint`ed — the
    * iterative plan would otherwise GROW per round (persist truncates
    * compute, not the logical plan, so analysis/optimization cost climbs
    * every iteration and dominates wall time long before the data does).
    * The checkpoint both materializes the round and resets the plan to a
    * leaf scan. localCheckpoint is executor-local (not fault-tolerant to
    * executor loss); a long-lived production job should point
    * `sparkContext.setCheckpointDir` at durable storage and use
    * `checkpoint()` instead — same shape, same truncation.
    *
    * @param nodes (id); singletons keep their own id as label
    * @param edges (id_a, id_b) undirected
    * @return (id, label) with label = min id of the component
    * @throws IllegalStateException if maxIter rounds pass without a
    *         fixpoint — returning unconverged labels would silently split
    *         clusters, so a diameter > maxIter graph must be loud
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = nodes.select(col("id"), col("id").as("label"))
      .localCheckpoint(true)
    // one min-label propagation hop, carrying the round-start label in
    // `old` so convergence is a cheap filter-count over the checkpointed
    // round itself, not an extra join job
    def propagate(ls: DataFrame): DataFrame = {
      val neighborMin = sym
        .join(ls.select(col("id"), col("label")), col("src") === col("id"))
        .groupBy(col("dst")).agg(min(col("label")).as("nl"))
      ls.as("l").join(neighborMin, col("l.id") === col("dst"), "left")
        .select(col("l.id").as("id"), col("l.old").as("old"),
          least(col("l.label"), coalesce(col("nl"), col("l.label"))).as("label"))
    }
    // One hop per checkpoint round. (Measured alternative: composing two
    // hops into one materialized plan halves the round count but the
    // second hop re-derives the first on BOTH sides of its join — the
    // extra AQE stages cost ~2× more than the saved round overhead.)
    // The convergence check rides the checkpoint job as an observe()
    // metric instead of a separate filter-count job: one job per round,
    // not two. The loop's wall time is pure per-job round-trip latency
    // (the data per round is tiny), so halving the job count halves its
    // exposure to scheduler noise — this entry benched 3.2× slower on
    // unchanged code under ambient host load, precisely because many
    // short sequential jobs amplify per-job scheduling delays.
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // metrics must be read from the PRE-checkpoint Dataset: the
      // checkpointed frame is a fresh LogicalRDD plan that no longer
      // contains the CollectMetrics node
      val observed = propagate(
        labels.select(col("id"), col("label").as("old"), col("label")))
        .observe("cc_round",
          sum(when(col("label") =!= col("old"), 1L).otherwise(0L))
            .as("changed"))
      val updated = observed.localCheckpoint(true)
      val changed = observed.queryExecution.observedMetrics
        .get("cc_round")
        // sum over zero rows is NULL — an empty node set is converged
        .map(r => if (r.isNullAt(0)) 0L else r.getLong(0)).getOrElse(
          // defensive: if the metric didn't surface (never expected —
          // eager localCheckpoint fully executes the observed plan),
          // fall back to the explicit count rather than mis-converge
          updated.filter(col("label") =!= col("old")).count())
      labels = updated.select(col("id"), col("label"))
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: no fixpoint after $maxIter iterations " +
          "(component diameter exceeds maxIter); raise maxIter")
    labels
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR edge
    * rewriting (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14) — same contract as [[connectedComponents]]
    * ((id, label) with label = component min id), different convergence
    * class: O(log n)-ish ROUNDS regardless of diameter, where min-label
    * propagation needs O(diameter) rounds. Near-dup graphs are shallow
    * quasi-cliques, so propagation wins there (fewer shuffles per
    * round); this variant is for HIGH-DIAMETER graphs — link chains,
    * citation paths, re-crawl lineage — where a 10⁴-long chain would
    * mean 10⁴ propagation rounds but ~15 star rounds.
    *
    * Mechanics: edges are kept in canonical orientation (src > dst, no
    * self-loops, set semantics). Large-star connects every neighbor
    * v > u to m = min(Γ(u) ∪ {u}); small-star (over larger→smaller
    * oriented edges) connects the smaller neighbors and u itself to
    * their min. Both are one groupBy + one equi-join on edge-sized
    * data — everything stays distributed; the driver sees only per-round
    * metric scalars. The fixpoint is a star forest: every non-root
    * points straight at its component's min id.
    *
    * Each phase is `localCheckpoint`ed (same plan-truncation reasoning
    * as [[connectedComponents]] — the iterative plan would grow per
    * round) and carries an `observe` metric (edge count + xxhash64
    * hash-sum of the edge set): convergence = NEITHER phase changed the
    * edge set, detected as both phases' (count, hash-sum) matching
    * their input's — set equality w.h.p. (a 64-bit hash-sum collision
    * at equal counts), with zero extra jobs. Two jobs per round ×
    * O(log n) rounds vs propagation's one × O(diameter).
    *
    * @param nodes (id); singletons keep their own id as label
    * @param edges (id_a, id_b) undirected
    * @return (id, label) with label = min id of the component
    * @throws IllegalStateException if maxIter rounds pass without a
    *         fixpoint — unconverged star edges would silently mislabel,
    *         so failure must be loud (same contract as propagation)
    */
  def connectedComponentsStar(nodes: DataFrame, edges: DataFrame,
                              maxIter: Int = 25): DataFrame = {
    // materialize one phase: eager checkpoint + (edge count, hash-sum)
    // read from the PRE-checkpoint plan (the checkpointed frame is a
    // fresh LogicalRDD that no longer contains the CollectMetrics node).
    // The hash-sum accumulates 64-bit hashes in decimal(38,0) — a long
    // sum would ANSI-overflow after a handful of large hashes
    def materialize(df: DataFrame, name: String): (DataFrame, Long, BigDecimal) = {
      val observed = df.observe(name, count(lit(1)).as("n"),
        sum(xxhash64(col("src"), col("dst"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("hs"))
      val cp = observed.localCheckpoint(true)
      val row = observed.queryExecution.observedMetrics(name)
      (cp, row.getLong(0),
        if (row.isNullAt(1)) BigDecimal(0) else BigDecimal(row.getDecimal(1)))
    }
    var (ee, n0, h0) = materialize(
      edges.select(greatest(col("id_a"), col("id_b")).as("src"),
          least(col("id_a"), col("id_b")).as("dst"))
        .filter(col("src") =!= col("dst")).distinct(), "cc_star_init")
    var iter = 0
    var converged = n0 == 0L // no edges: every node is its own star
    while (!converged && iter < maxIter) {
      // LARGE-STAR over the symmetrized view: m = min(Γ(u) ∪ {u}),
      // emit (v, m) for v ∈ Γ(u), v > u — output stays canonical
      // (m ≤ u < v) with no self-loops by construction
      val sym = ee.unionByName(
        ee.select(col("dst").as("src"), col("src").as("dst")))
      val lsMin = sym.groupBy(col("src"))
        .agg(min(col("dst")).as("mn"))
        .select(col("src").as("u"), least(col("src"), col("mn")).as("m"))
      val (ls, n1, h1) = materialize(
        sym.join(lsMin, col("src") === col("u"))
          .filter(col("dst") > col("src"))
          .select(col("dst").as("src"), col("m").as("dst"))
          .distinct(), "cc_star_ls")
      // SMALL-STAR over larger→smaller edges as-is: m = min(Γ(u) ∪ {u})
      // = min(dst), emit (v, m) for the other smaller neighbors plus
      // (u, m) itself — again canonical by construction
      val ssMin = ls.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val (ss, n2, h2) = materialize(
        ls.join(ssMin, Seq("src"))
          .filter(col("dst") =!= col("m"))
          .select(col("dst").as("src"), col("m").as("dst"))
          .unionByName(ssMin.select(col("src"), col("m").as("dst")))
          .distinct(), "cc_star_ss")
      converged = n1 == n0 && h1 == h0 && n2 == n1 && h2 == h1
      ee = ss; n0 = n2; h0 = h2
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar: no fixpoint after $maxIter rounds; " +
          "raise maxIter")
    // star-forest fixpoint: each non-root appears exactly once as src
    // with its root as dst (min() is a no-cost belt under that
    // invariant); singletons and roots label themselves
    nodes.select(col("id"))
      .join(ee.groupBy(col("src").as("id")).agg(min(col("dst")).as("root")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("label"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, found by
    * 4-block pigeonhole candidate generation: split the 16 bits into 4
    * nibbles; any pair within distance 3 must agree on at least one whole
    * nibble, so candidates are pairs sharing (block index, block value) —
    * a bucket join, never all-pairs.
    *
    * Skew-hardened, shuffle-free after the block join: the hamming filter
    * runs map-side DIRECTLY on the join output (ints only,
    * bit_count(xor)), and multi-block collisions are collapsed by the
    * MIN-AGREEING-BLOCK rule — a pair is emitted only from the first
    * block on which the two signatures agree, evaluated as a map-side
    * predicate over the sigs already present in the join row. The output
    * is distinct by construction, so the (at small-vocab skew: millions
    * of rows) pair stream never needs a distinct() shuffle.
    */
  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String,
                      maxDist: Int = 3): DataFrame = {
    require(maxDist < 4, "4-block pigeonhole only covers distance <= 3")
    // NOT persisted and NOT checkpointed: the block self-join's two sides
    // are the identical subtree, so ReusedExchange computes the
    // md5-per-word array + 16 vote aggregates exactly once (same pattern
    // as the banded table in minhashNearDups) — and unlike minhash there
    // is no SECOND consumer after the join, so a cache would only leak.
    // The pair stream itself is left LAZY: at small-vocab skew it is
    // millions of rows, and materializing it (cache or checkpoint) costs
    // more than the downstream aggregation it feeds.
    val hs = docs.select(col(idCol).as("id"),
      transform(TextAnalysis.words(col(textCol)), w => md5(w)).as("hs"))
    val sigs = hs.select(col("id"), simhash16Int(col("hs")).as("sig"))
    def nib(sig: org.apache.spark.sql.Column, b: Int) =
      shiftright(sig, b * 4).bitwiseAND(lit(15))
    val blocked = sigs.select(col("id"), col("sig"),
      posexplode(array((0 to 3).map(b => nib(col("sig"), b)): _*))
        .as(Seq("block", "bval")))
    val firstAgreeingBlock = (0 to 2).map(bp =>
      col("a.block") <= bp ||
        nib(col("a.sig"), bp) =!= nib(col("b.sig"), bp)).reduce(_ && _)
    // The merge hint pins a SHUFFLE join: both sides then shuffle on the
    // identical (block, bval) keys from the identical subtree, and
    // exchange reuse computes the signatures ONCE. Without it a
    // stats-driven broadcast join (small corpus, or a future threshold
    // bump) would silently run the signature aggregation twice — and at
    // 100 TB the self-join's sides could never broadcast anyway, so the
    // hint only pins what the big-data plan already does.
    blocked.as("a").hint("merge")
      .join(blocked.as("b"),
        col("a.block") === col("b.block") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .filter(firstAgreeingBlock)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Repeated-passage mining: find fixed-size word spans (chunks at a
    * stride) that occur in MORE THAN ONE document — the exact-substring
    * duplication signal (boilerplate, licenses, templated pages) that
    * document-level dedup misses because the surrounding text differs.
    *
    * Scale shape: chunks are hashed map-side immediately after the
    * explode, so only (hash, id) pairs ever shuffle — never chunk text.
    * Two-level aggregation: the (hash, doc) pre-agg collapses within-doc
    * repeats with map-side partial combine, then the per-hash agg counts
    * documents. Both shuffles are keyed on the hash — uniform by
    * construction, no skew. Output is bounded by the duplicated-passage
    * count, a small fraction of the corpus.
    *
    * Detection is stride-aligned: a shared span is found when it starts
    * at chunk boundaries in both documents (always true for templated/
    * boilerplate text, which repeats from the same page offset; stride=1
    * makes it fully shift-invariant at stride× cost). For arbitrary-
    * offset robustness see the shift-resistant minhash path.
    *
    * @return one row per passage seen in >1 doc: (chunk_hash, n_docs,
    *         n_occurrences, first_doc)
    */
  def repeatedPassages(docs: DataFrame, chunkWords: Int, stride: Int,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val perDoc = docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.wordChunks(
          TextAnalysis.words(col(textCol)), chunkWords, stride)).as("c"))
      .select(col("id"), md5(col("c.text")).as("chunk_hash"))
      .groupBy(col("chunk_hash"), col("id"))
      .agg(count(lit(1)).as("n_in_doc"))
    perDoc.groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("n_docs"), // rows are distinct (hash, doc)
        sum(col("n_in_doc")).as("n_occurrences"),
        min(col("id")).as("first_doc"))
      .filter(col("n_docs") > 1)
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 —
    * the MOSS algorithm): hash every word k-gram, slide a w-hash window,
    * and select each window's minimum hash (rightmost on ties, the
    * paper's rule — re-selecting the same minimum across overlapping
    * windows is what makes the fingerprint set SMALL). Guarantee: any
    * match of length ≥ w + k − 1 words shares at least one fingerprint,
    * so it's the local-fingerprint dedup that catches partial overlap
    * with a bounded, position-diverse signature — the code-plagiarism /
    * quote-mining complement to MinHash (whole-doc similarity) and
    * repeatedPassages (fixed-stride chunks, which a one-word shift
    * defeats; winnowing is shift-invariant).
    *
    * Scale shape: selection is ONE map-side kernel eval per document
    * (the native [[org.apache.spark.sql.graft.WinnowFingerprints]]
    * expression — 60-bit k-gram md5s over raw byte ranges plus an
    * O(nk) monotonic-deque window minimum, fused in one codegen'd
    * loop; the HOF spelling this replaced paid O(nk·w) interpreted
    * lambda comparisons and a string slice+join per gram). Only the
    * selected (doc_id, pos, hash) fingerprints — a ~2/(w+1) fraction
    * of the k-grams — ever leave the scan; no shuffle.
    *
    * @return (doc_id, pos, fp_hash) — pos is the 1-based k-gram start,
    *         one row per distinct selected fingerprint
    */
  def winnowFingerprints(docs: DataFrame, k: Int, w: Int,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    require(k >= 1 && w >= 1)
    docs
      .select(col(idCol).as("doc_id"),
        explode(graft.GraftExtensions.winnowFingerprints(
          col(textCol), k, w)).as("fp"))
      .select(col("doc_id"), col("fp.pos").cast("long").as("pos"),
        col("fp.h").as("fp_hash"))
  }

  /** MOSS-style document-pair matching over winnowing fingerprints
    * (Schleimer et al. §5 — the step after selection that MOSS actually
    * ships): two documents match when they SHARE selected fingerprints,
    * scored by each side's containment (shared / own distinct
    * fingerprints, exact-integer ppm). Winnowing's guarantee makes the
    * candidate generation sound: any common substring of length
    * ≥ w+k−1 contributes at least one shared fingerprint, so partial
    * overlaps (quotes, excerpts, plagiarized sections) surface even
    * when whole-document similarity is negligible.
    *
    * Scale shape — the inverted-index pair join with a df CAP: only the
    * ~2/(w+1) selected (doc, hash) rows leave the scan, fingerprints
    * appearing in more than `maxDf` documents are dropped before the
    * self-join (a boilerplate fingerprint in s docs would cost s² pair
    * rows — the Σdf² bound, same rule as the containment op), and only
    * pairs sharing ≥ `minShared` fingerprints survive to the scoring
    * join against the per-doc totals.
    *
    * @return (id_a, id_b, n_shared, cont_a_ppm, cont_b_ppm)
    */
  def winnowPairs(docs: DataFrame, k: Int, w: Int, maxDf: Int,
                  minShared: Long, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    require(maxDf >= 2 && minShared >= 1)
    val fp = winnowFingerprints(docs, k, w, textCol, idCol)
      .select(col("doc_id"), col("fp_hash")).distinct()
      .persist()
    val sizes = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    val rare = fp.join(
      fp.groupBy(col("fp_hash")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select(col("fp_hash")),
      Seq("fp_hash"), "left_semi")
    val pairs = rare.select(col("fp_hash"), col("doc_id").as("id_a"))
      .join(rare.select(col("fp_hash"), col("doc_id").as("id_b")),
        Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    val M = lit(1000000L)
    val out = pairs
      .join(sizes.select(col("doc_id").as("id_a"), col("n_fp").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n_fp").as("n_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        call_function("div", col("n_shared") * M, col("n_a"))
          .as("cont_a_ppm"),
        call_function("div", col("n_shared") * M, col("n_b"))
          .as("cont_b_ppm"))
      .localCheckpoint(true)
    fp.unpersist()
    out
  }

  /** Cross-source contamination matrix: for every source pair, the count
    * of distinct word n-grams they SHARE, plus each side's containment
    * ppm (shared / own distinct grams) — the corpus-audit view that
    * surfaces mirror sites, wholesale scrapes and benchmark bleed
    * BETWEEN ingest feeds, where per-document dedup only shows
    * individual collisions.
    *
    * Scale shape: one distinct over (source, gram-hash) — text never
    * shuffles, only 60-bit hashes; the self-join keys on the hash, so a
    * gram in s sources costs s² pair rows (bounded by n_sources², and
    * n_sources is small by definition); totals are one tiny agg that
    * broadcasts back onto the pair rows.
    *
    * @return (src_a, src_b, n_shared, n_a, n_b, cont_a_ppm, cont_b_ppm)
    *         for pairs sharing ≥ 1 gram, src_a < src_b
    */
  def sourceOverlap(docs: DataFrame, n: Int, textCol: String = "text",
                    srcCol: String = "source"): DataFrame = {
    require(n >= 1)
    val grams = docs
      .select(col(srcCol).as("source"),
        explode(TextAnalysis.wordShingles(
          TextAnalysis.words(col(textCol)), n)).as("g"))
      .select(col("source"),
        // 60-bit hash (the minhash width): 32 bits would collide two
        // disjoint sources into a false "shared gram" at ~10⁵ grams
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct()
    val tot = grams.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val shared = grams.select(col("source").as("src_a"), col("h"))
      .join(grams.select(col("source").as("src_b"), col("h")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    val M = lit(1000000L)
    shared
      .join(broadcast(tot.select(col("source").as("src_a"),
        col("n").as("n_a"))), Seq("src_a"))
      .join(broadcast(tot.select(col("source").as("src_b"),
        col("n").as("n_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        call_function("div", col("n_shared") * M, col("n_a"))
          .as("cont_a_ppm"),
        call_function("div", col("n_shared") * M, col("n_b"))
          .as("cont_b_ppm"))
  }

  /** C4-style corpus LINE dedup (Raffel et al. 2020: "we discarded any
    * line that occurred more than [k] times in the dataset"): count every
    * line's corpus-wide occurrences, drop ALL occurrences of lines over
    * the threshold from every document, and reassemble the documents —
    * the boilerplate killer (nav bars, cookie banners, license footers)
    * that document- and passage-level dedup both miss because the
    * surrounding text differs everywhere.
    *
    * Scale shape — the document text NEVER shuffles: lines are hashed
    * map-side right after the posexplode and the text column is dropped,
    * so the counting agg and the bad-line join move only (hash, id, pos)
    * triples. The bad-line set (hashes over the threshold) is a small
    * fraction of line types by construction (most lines are unique);
    * per-doc bad POSITIONS aggregate to one bounded int-array row per
    * affected doc, and the final join back to `docs` is keyed on the doc
    * id with that tiny side — AQE broadcasts it when it fits. Documents
    * with no bad line take the left-join null fast path: text passes
    * through untouched, no per-line work at all. Reconstruction re-splits
    * the original text map-side and drops the flagged positions — exact,
    * order-preserving, and the only place full text is touched.
    */
  def lineDedup(docs: DataFrame, maxOccurrences: Long,
                delim: String = "\n", textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val pat = java.util.regex.Pattern.quote(delim)
    val lines = docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), pat)).as(Seq("pos", "line")))
      .select(col("id"), col("pos"), md5(col("line")).as("lhash"))
    val bad = lines.groupBy(col("lhash"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > maxOccurrences)
      .select(col("lhash"))
    val badPos = lines.join(bad, Seq("lhash"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("pos"))).as("bad_pos"))
    val ws = split(col(textCol), pat)
    val kept = filter(
      transform(sequence(lit(0), size(ws) - 1),
        i => struct(i.as("i"), element_at(ws, i + 1).as("line"))),
      s => !array_contains(col("bad_pos"), s.getField("i")))
    docs.join(badPos, docs(idCol) === badPos("id"), "left")
      .select(col(idCol),
        when(col("bad_pos").isNull, col(textCol))
          .otherwise(array_join(transform(kept, s => s.getField("line")), delim))
          .as(textCol),
        size(ws).cast("long").as("n_lines"),
        coalesce(size(col("bad_pos")), lit(0)).cast("long").as("n_dropped"))
  }

  /** WITHIN-document line dedup — keep each line's FIRST occurrence,
    * preserving order: the self-repetition trim that kills templated
    * documents repeating their own boilerplate (nav blocks pasted
    * between sections, chat transcripts quoting themselves).
    * [[lineDedup]] is the CORPUS-level occurrence rule and must
    * shuffle; this one is pure map work at scan speed because the
    * duplicate evidence is entirely local to the row — the cheap pass
    * that runs FIRST at 100 TB, shrinking what the corpus-level pass
    * sees. The line array is bound once as a transform() lambda
    * variable (the boilerplateStrip let-binding idiom — every keep test
    * slices it, where CSE can't reach inside HOF lambdas).
    *
    * @return (idCol, textCol cleaned, n_lines, n_kept, n_dropped)
    */
  def selfLineDedup(docs: DataFrame, delim: String = "\n",
                    textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    val pat = java.util.regex.Pattern.quote(delim)
    val out = element_at(transform(array(split(col(textCol), pat)), la => {
      val keepIdx = filter(sequence(lit(1), size(la)),
        i => !exists(slice(la, lit(1), i - 1),
          x => x === element_at(la, i)))
      struct(
        array_join(transform(keepIdx, i => element_at(la, i)), delim)
          .as("clean"),
        size(la).cast("long").as("n_lines"),
        size(keepIdx).cast("long").as("n_kept"))
    }), 1)
    docs.select(col(idCol), out.as("sd"))
      .select(col(idCol), col("sd.clean").as(textCol),
        col("sd.n_lines"), col("sd.n_kept"),
        (col("sd.n_lines") - col("sd.n_kept")).as("n_dropped"))
  }

  /** Benchmark decontamination: flag every training document that shares
    * at least one contiguous word n-gram with an evaluation corpus — the
    * GPT-3-style overlap scrub (13-gram there; n is a parameter) that
    * keeps test-set text out of the training mix.
    *
    * Scale shape: the eval side is a benchmark suite — bounded small BY
    * CONTRACT (thousands of documents, not a crawl), so its distinct
    * n-gram set broadcasts; that is the point of the algorithm, not an
    * optimism about data size. The training corpus (the 100 TB side)
    * explodes to (id, ngram) map-side, hits the broadcast hash join
    * without shuffling, and only the surviving (id, hit) pairs reach the
    * per-doc count aggregation (partial→final, bounded by hit count).
    * No train×train or train×eval pair stream ever exists — candidates
    * are exact n-gram equality. If the eval side ever outgrows broadcast
    * (it shouldn't), drop the hint and the same plan degrades to a
    * shuffle semi-join keyed on the n-gram.
    *
    * @return one row per training doc: (id, n_hits = distinct overlapping
    *         n-grams, contaminated 0/1)
    */
  def decontaminate(train: DataFrame, evalSet: DataFrame, n: Int = 13,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def ngrams(c: org.apache.spark.sql.Column) =
      array_distinct(TextAnalysis.wordShingles(TextAnalysis.words(c), n))
    val evalNg = evalSet.select(explode(ngrams(col(textCol))).as("ng")).distinct()
    val hits = train
      .select(col(idCol).as("id"), explode(ngrams(col(textCol))).as("ng"))
      .join(broadcast(evalNg), Seq("ng"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    train.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).cast("long").as("contaminated"))
  }

  /** Bloom-filter decontamination — [[decontaminate]]'s verdict with the
    * eval-side n-gram set compressed into an `mBits`-bit Bloom filter
    * baked into the plan as a literal long array. Same screen the
    * join-based form implements, but the train side never joins at all:
    * membership is a k-probe bit test folded into the scan, so the 100 TB
    * side is one map-only pass with a CONSTANT-size model (mBits/8 bytes,
    * independent of eval corpus size) instead of a broadcast hash table
    * proportional to the eval n-gram count. One-sided error by
    * construction: no false negatives (every true overlap is flagged),
    * false positives at the classic (1-e^(-kN/m))^k rate — acceptable for
    * decontamination, where over-dropping a few clean docs is cheap and
    * missing a contaminated one is not.
    *
    * Determinism: bit positions are md5-derived (`pos_j(ng) =
    * int(md5(ng+'#'+j)[0,8)) mod mBits`) — the proven cross-engine hash
    * (same as the hashed-feature and LSH paths), so the filter and every
    * probe are bit-exact reproducible in any engine.
    *
    * @return one row per training doc: (id, n_maybe = n-grams the filter
    *         admits, flagged 0/1); n_maybe ≥ [[decontaminate]]'s n_hits
    */
  def decontaminateBloom(train: DataFrame, evalSet: DataFrame, n: Int = 13,
                         mBits: Int = 1 << 17, k: Int = 3,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    def ngrams(c: Column) =
      array_distinct(TextAnalysis.wordShingles(TextAnalysis.words(c), n))
    def pos(ng: Column, j: Int): Column =
      pmod(conv(substring(md5(concat(ng, lit(s"#$j"))), 1, 8), 16, 10)
        .cast("long"), lit(mBits.toLong))
    // build: distinct set-bit positions of the eval n-grams — bounded by
    // mBits rows, i.e. the size of the filter itself (model-sized by
    // definition; the kmeansTrain collect contract)
    val setBits = evalSet
      .select(explode(ngrams(col(textCol))).as("ng")).distinct()
      .select(explode(array((0 until k).map(j => pos(col("ng"), j)): _*))
        .as("p"))
      .distinct().collect().map(_.getLong(0))
    val words = Array.fill(mBits / 64)(0L)
    setBits.foreach(p => words(p.toInt >> 6) |= 1L << (p.toInt & 63))
    val bitsLit = array(words.map(lit).toIndexedSeq: _*)
    def maybe(ng: Column): Column = (0 until k).map { j =>
      val p = pos(ng, j)
      call_function("shiftright",
        element_at(bitsLit, (p / 64 + 1).cast("int")), (p % 64).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
    // verdict: pure scan-speed map work — explode, bit-test, count.
    val hits = train
      .select(col(idCol).as("id"), explode(ngrams(col(textCol))).as("ng"))
      .filter(maybe(col("ng")))
      .groupBy(col("id")).agg(count(lit(1)).as("n_maybe"))
    train.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_maybe"), lit(0L)).as("n_maybe"),
        (coalesce(col("n_maybe"), lit(0L)) > 0).cast("long").as("flagged"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    * embedding corpus, then drop any vector whose cosine to a LOWER-id
    * vector in the SAME cluster reaches `tau` — near-duplicates in
    * meaning, not in surface form, which MinHash/SimHash cannot see.
    *
    * Scale design: this is THE reason the clustering exists — exact
    * pairwise cosine over a corpus is O(n²) and impossible at 100 TB,
    * but pairwise inside k balanced clusters is n²/k per cluster and the
    * pair stream only ever materializes per-bucket (the same banding
    * argument as MinHash LSH, with k-means cells as the buckets).
    * Assignment is the map-side literal-centroid fold (no shuffle); the
    * candidate join is a self-equi-join on cluster id; `assigned` is
    * persisted so the two sides of the self-join and the final verdict
    * join reuse ONE assignment computation instead of recomputing the
    * k·dim cosine fold three times (the simhash ReusedExchange lesson —
    * pinned by a test, not by optimizer luck).
    *
    * Recall caveat (inherent to SemDeDup, not this implementation): a
    * near-dup pair straddling a cluster boundary is missed; production
    * runs mitigate with more iterations / nprobe>1 assignment, trading
    * compute for recall. Determinism: assignment ties break to the
    * lowest cid (see [[VectorOps.nearestCentroid]]), cosine is the
    * ordered fold, and the keep verdict depends only on id order.
    *
    * Skew: a pathologically hot cluster (bad training, or a corpus that
    * really is one semantic blob) makes the self-join's hot cid key both
    * QUADRATIC in pairs and, naively, single-task (one shuffle key = one
    * task doing all h²/2 comparisons). The per-task half is handled by
    * AQE's skew-join split — the join is a plain shuffle equi-join
    *  exactly so OptimizeSkewedJoin can cut the hot partition into
    * bounded chunks (pinned by the hot-cluster test in LlmOpsSpec, not
    * assumed); the quadratic half is a MODEL problem: h²/k only beats n²
    * if the clustering is balanced, so cluster-size stats (one groupBy
    * count) must gate any production run, and a blown-up cluster means
    * retrain with larger k — re-bucketing inside this operator would
    * silently change which duplicates are visible.
    *
    * Cache contract: the assignment is persisted only for the duration
    * of the pair materialization (the self-join's two sides reuse ONE
    * assignment computation), then RELEASED — the dropped-id set is
    * orders of magnitude smaller than the corpus and is localCheckpointed
    * eagerly, and the returned verdict recomputes the (id, cid) fold once
    * more rather than pinning corpus-sized blocks into a long-lived
    * session (the same release-early contract as every other operator in
    * this file).
    *
    * @param corpus    (id, vec) with vec array<double>
    * @param centroids trained (cid, cvec) list — feed from
    *                  [[VectorOps.kmeansTrain]]
    * @param tau       cosine threshold; identical vectors score 1.0
    * @return one row per corpus vector: (id, cid, keep 0/1)
    */
  /** Multi-probe SemDeDup — [[semanticGroups]] with the documented recall
    * caveat closed: each vector participates in pair generation under its
    * TOP-2 clusters (one map-side fold, [[VectorOps.nearest2Centroids]]),
    * so a near-duplicate pair straddling a cluster boundary is still
    * compared as long as the two probe sets overlap — the standard
    * compute-for-recall trade (the pair stream is ≤ 4× the single-probe
    * one: 2 probes per side).
    *
    * The verdict row still reports the PRIMARY (top-1) cluster, and the
    * keep rule is unchanged: drop iff some lower-id vector within any
    * shared probed cluster reaches `tau`. Cache contract and skew story
    * are [[semanticGroups]]'s (the self-join stays a plain shuffle
    * equi-join on the probed cid for AQE's skew split).
    *
    * @return one row per corpus vector: (id, cid primary, keep 0/1)
    */
  def semanticGroupsMultiProbe(corpus: DataFrame,
                               centroids: Seq[(Int, Seq[Double])],
                               tau: Double): DataFrame = {
    val probed = corpus
      .select(col("id"), col("vec"),
        explode(VectorOps.nearest2Centroids(col("vec"), centroids)).as("cid"))
      .filter(col("cid") >= 0) // single-centroid models leave a −1 slot
      .persist()
    val dropped = probed.as("a")
      .join(probed.as("b"),
        col("a.cid") === col("b.cid") && col("a.id") > col("b.id"))
      .filter(VectorOps.cosine(col("a.vec"), col("b.vec")) >= tau)
      .select(col("a.id").as("id"))
      .distinct()
      .localCheckpoint(true)
    probed.unpersist()
    corpus
      .withColumn("cid", VectorOps.nearestCentroid(col("vec"), centroids))
      .join(dropped.withColumn("is_dup", lit(1L)), Seq("id"), "left")
      .select(col("id"), col("cid").cast("long").as("cid"),
        when(col("is_dup").isNull, 1L).otherwise(0L).as("keep"))
  }

  /** Exact-substring duplicated-span extraction — the dedup semantics of
    * Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better", the ExactSubstr pass): find every maximal token span all of
    * whose length-k windows occur at least twice in the corpus — the text
    * a suffix-array dedup would cut out of each document. The suffix
    * array itself is a single-machine structure; the Spark-native
    * equivalent is the stride-1 k-gram window stream: equality of a
    * length-k window IS a suffix match of length ≥ k, and the maximal
    * duplicated spans are exactly the unions of overlapping duplicated
    * windows (touching spans merge — their token union is contiguous, so
    * the cut text is identical either way).
    *
    * Scale shape: the window stream is one row per corpus token — the
    * same cardinality a suffix array indexes. Duplicated windows are
    * marked by [[duplicatedWindows]]' partial-combined hash count +
    * skew-splittable join; only the survivors (a tiny fraction at crawl
    * scale) re-shuffle on doc id for the per-doc interval merge
    * (classic gaps-and-islands over the per-doc pos sort).
    *
    * @return one row per maximal duplicated span: (doc_id, span_start,
    *         span_end) inclusive 0-based token positions, span_tokens its
    *         length, n_windows the duplicated k-windows merged into it
    */
  /** The duplicated length-k windows of the corpus: (id, pos) for every
    * stride-1 window whose hash occurs ≥ 2 times corpus-wide. Shared by
    * [[duplicatedSpans]] (interval merge) and [[cutDuplicatedSpans]]
    * (token removal).
    *
    * Deliberately a partial-combined groupBy + equi-join rather than a
    * `count over (partition by whash)` window: the window form shuffles
    * the FULL token-scale row stream once but then must SORT every
    * partition, gets no map-side combine, and — decisive at 100 TB — a
    * pathologically hot window hash lands one unsplittable partition
    * (AQE's skew handling applies to joins, not window sorts). The
    * groupBy's shuffle carries only per-task distinct-hash partial
    * counts, and the join back onto the window stream is a plain
    * shuffle join AQE CAN skew-split.
    */
  private def duplicatedWindows(docs: DataFrame, k: Int, textCol: String,
                                idCol: String): DataFrame = {
    val win = docs
      .select(col(idCol).as("id"),
        posexplode(TextAnalysis.wordShingles(
          TextAnalysis.words(col(textCol)), k)).as(Seq("pos", "sh")))
      .select(col("id"), col("pos"), md5(col("sh")).as("whash"))
    val dupHashes = win.groupBy(col("whash"))
      .agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
      .select(col("whash"))
    win.join(dupHashes, Seq("whash"))
      .select(col("id"), col("pos"))
  }

  def duplicatedSpans(docs: DataFrame, k: Int, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val dup = duplicatedWindows(docs, k, textCol, idCol)
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val prev = byDoc.rowsBetween(Window.unboundedPreceding, -1)
    val islands = dup
      .withColumn("prev_end", max(col("pos") + (k - 1)).over(prev))
      .withColumn("brk",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(byDoc))
    islands.groupBy(col("id").as("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select(col("doc_id"),
        col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("long")
          .as("span_tokens"),
        col("n_windows"))
  }

  /** The cut itself — ExactSubstr's OUTPUT: every token covered by a
    * duplicated window removed from every document, the remainder
    * re-joined in order. (This is the aggressive cut-everywhere variant:
    * no occurrence is privileged, so two copies of a passage both lose
    * it — the conservative keep-one policy is [[duplicatedSpans]] plus a
    * keeper rule on the span groups.)
    *
    * Scale shape: [[duplicatedWindows]] finds the dups, then
    * the rare duplicated windows fan out to their k covered positions
    * (k× the SMALL side, map-side) and anti-join the token stream on
    * (id, pos); the survivors re-shuffle on the doc id for the ordered
    * rebuild. Three token-scale exchanges end to end — a document
    * rewrite pass cannot avoid re-gathering the token stream per doc,
    * and the anti join stays a linear hash probe even for a
    * pathological fully-duplicated mega-doc (an (id, covered-set)
    * array join would go quadratic there).
    *
    * @return one row per input doc: (doc_id, clean_text, n_kept, n_cut)
    */
  def cutDuplicatedSpans(docs: DataFrame, k: Int, textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val covered = duplicatedWindows(docs, k, textCol, idCol)
      .select(col("id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tp"))
      .distinct()
    val toks = docs.select(col(idCol).as("id"),
      posexplode(TextAnalysis.words(col(textCol))).as(Seq("tp", "w")))
    val kept = toks.join(covered, Seq("id", "tp"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("tp"), col("w")))),
          x => x.getField("w"))).as("clean_text"))
    docs
      .select(col(idCol).as("id"),
        size(TextAnalysis.words(col(textCol))).cast("long").as("n_total"))
      .join(kept, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_cut"))
  }

  /** Asymmetric n-gram CONTAINMENT pairs — quote/excerpt detection:
    * containment(A in B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|.
    * Jaccard structurally misses a short document quoted inside a long
    * one (the union denominator is dominated by the long side);
    * containment normalizes by the QUOTED side only, which is how
    * "this crawl page embeds that reference document" is actually
    * asked. Returns both directions of every qualifying ordered pair.
    *
    * Scale shape: the inverted-index candidate join — distinct doc
    * shingles self-joined on the shingle — with the df-CAP that makes
    * it tractable: a shingle appearing in more than `dfCap` documents
    * is boilerplate, not evidence of quoting, and is dropped BEFORE the
    * join (same posting-list capping as the tf-idf retrieval join), so
    * the pair stream is bounded by Σ df² over capped shingles, never
    * n². Containment is then computed over the capped shingle space on
    * BOTH sides (count and denominator from the same filtered stream —
    * self-consistent semantics, exact integers).
    *
    * @return (id_a, id_b, n_shared, n_a, cont_ppm) with containment of
    *         A in B as parts-per-million, cont_ppm ≥ tauPpm
    */
  def containmentPairs(docs: DataFrame, shingleWords: Int = 3,
                       dfCap: Int = 50, tauPpm: Long = 800000L,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(array_distinct(TextAnalysis.wordShingles(
        TextAnalysis.words(col(textCol)), shingleWords))).as("sh"))
    val df = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap)
      .select(col("sh"))
    val capped = sh.join(df, Seq("sh")).persist()
    val na = capped.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val pairs = capped.as("a")
      .join(capped.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    val out = pairs
      .join(na.withColumnRenamed("id", "id_a"), Seq("id_a"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        col("n").as("n_a"),
        call_function("div", col("n_shared") * lit(1000000L), col("n"))
          .as("cont_ppm"))
      .filter(col("cont_ppm") >= tauPpm)
    // materialize before releasing the shared shingle cache (the
    // release-early contract the other candidate-join ops follow)
    val ck = out.localCheckpoint(true)
    capped.unpersist()
    ck
  }

  def semanticGroups(corpus: DataFrame,
                     centroids: Seq[(Int, Seq[Double])],
                     tau: Double): DataFrame = {
    val assigned = corpus
      .withColumn("cid", VectorOps.nearestCentroid(col("vec"), centroids))
      .persist()
    val dropped = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cid") === col("b.cid") && col("a.id") > col("b.id"))
      .filter(VectorOps.cosine(col("a.vec"), col("b.vec")) >= tau)
      .select(col("a.id").as("id"))
      .distinct()
      .localCheckpoint(true)
    assigned.unpersist()
    corpus
      .withColumn("cid", VectorOps.nearestCentroid(col("vec"), centroids))
      .join(dropped.withColumn("is_dup", lit(1L)), Seq("id"), "left")
      .select(col("id"), col("cid").cast("long").as("cid"),
        when(col("is_dup").isNull, 1L).otherwise(0L).as("keep"))
  }
}
