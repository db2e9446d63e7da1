package graft

import graft.llm.{Dedup, LinkGraph, Multimodal, Sampling, Sketches, TextAnalysis, VectorOps}
import graft.sources.CorpusIO
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit specs for the LLM-data-pipeline operator families (dedup,
  * similarity search, multimodal columns, text analysis).
  */
class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  private def seqOf[T](r: Row, field: String): Seq[T] =
    r.getAs[scala.collection.Seq[T]](field).toSeq

  test("text: shingles, tokens, langId, fingerprint determinism") {
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "der hund und die katze und der vogel"),
      (3L, "xx yy")).toDF("doc_id", "text")
    val out = df.select(
      col("doc_id"),
      TextAnalysis.wordShingles(TextAnalysis.words(col("text")), 3).as("sh"),
      TextAnalysis.regexTokens(lit("ab 12 c!d")).as("toks"),
      TextAnalysis.langId(TextAnalysis.words(col("text"))).as("lang"),
      TextAnalysis.fingerprint(TextAnalysis.words(col("text"))).as("fp")
    ).orderBy("doc_id").collect()
    assert(seqOf[String](out(0), "sh") ==
      Seq("the quick brown", "quick brown fox", "brown fox jumps"))
    assert(seqOf[String](out(0), "toks") == Seq("ab", "12", "c", "!", "d"))
    assert(out(0).getAs[String]("lang") == "en")
    assert(out(1).getAs[String]("lang") == "de")
    assert(out(2).getAs[String]("lang") == "und")
    // shorter than n -> empty, not a descending sequence() artifact
    assert(seqOf[String](out(2), "sh").isEmpty)
    // fingerprint is stable across evaluations
    val fp1 = out(0).getAs[Long]("fp")
    val fp2 = df.select(TextAnalysis.fingerprint(TextAnalysis.words(col("text"))).as("fp"))
      .orderBy("fp").collect().map(_.getLong(0))
    assert(fp2.contains(fp1))
  }

  test("dedup: exact groups keep min id and count copies") {
    val docs = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (10L, "aaa"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactGroups(docs).orderBy("keeper_id").collect()
    assert(groups.length == 2)
    assert(groups(0).getAs[Long]("keeper_id") == 1L)
    assert(groups(0).getAs[Long]("n_copies") == 3L)
  }

  test("dedup: quality-aware keeper picks the best-scoring copy over the " +
       "lowest id, singletons pass through") {
    val docs = Seq(
      (1L, "THE A OF AND TO SOME MORE WORDS HERE NOW"), // shouted, low id
      (2L, "the a of and to some more words here now"), // clean → keeper
      (3L, "entirely unrelated content")).toDF("doc_id", "text")
    val qf = TextAnalysis.qualityFilter(col("text"))
    val out = Dedup.bestCopyGroups(docs, qf.getField("logit_fp"),
        md5(lower(col("text"))))
      .orderBy("keeper_id").collect()
      .map(r => (r.getAs[Long]("keeper_id"), r.getAs[Long]("n_copies")))
    // uppercase kills the stopword hits → lower logit → id 2 wins its
    // group despite the higher id; the singleton keeps itself
    assert(out.toSeq == Seq((2L, 2L), (3L, 1L)))
  }

  test("dedup: minhash finds the injected near-duplicate, not the stranger") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base + " lambda"), // near-dup of 1
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id").collect()
    assert(pairs.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet ==
      Set((1L, 2L)))
    assert(pairs.head.getAs[Double]("jaccard") > 0.5)
  }

  test("dedup: editDistNearDups verifies candidates with bounded " +
       "levenshtein — in-budget edit kept with its exact distance, " +
       "over-budget candidate dropped, stranger never a candidate") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base + " ok"),      // distance 3: kept
      (3L, base + " abcdefghijklmnop"), // distance 17 > 16: candidate, dropped
      (4L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val pairs = Dedup.editDistNearDups(docs, "text", "doc_id", maxDist = 16)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("dist")))
    // (1,3) shares almost all shingles with 1 → a candidate, but its
    // 17-char appended edit is over the 16 budget and must be dropped
    assert(pairs.toSet.contains((1L, 2L, 3L)))
    assert(!pairs.exists { case (a, b, _) => (a, b) == ((1L, 3L)) })
    assert(!pairs.exists { case (a, b, _) => a == 4L || b == 4L })
  }

  test("dedup: selfLineDedup keeps first occurrences in order, map-side") {
    val docs = Seq((1L, "a\nb\na\nc\nb"), (2L, "x")).toDF("doc_id", "text")
    val out = Dedup.selfLineDedup(docs).orderBy("doc_id").collect()
      .map(r => (r.getString(1), r.getAs[Long]("n_lines"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_dropped")))
    assert(out(0) == (("a\nb\nc", 5L, 3L, 2L)))
    assert(out(1) == (("x", 1L, 1L, 0L)))
  }

  test("dedup: winnowPairs — identical docs share every fingerprint " +
       "(containment 1e6 both sides); unrelated docs never pair") {
    val t = "alpha beta gamma delta epsilon zeta eta theta iota"
    val docs = Seq((1L, t), (2L, t),
      (3L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, 4, 4, maxDf = 6, minShared = 1)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("cont_a_ppm"), r.getAs[Long]("cont_b_ppm")))
    assert(pairs.toSeq == Seq((1L, 2L, 1000000L, 1000000L)))
  }

  test("vectors: marginMine normalizes by both sides' k-NN sums — " +
       "hand-computed integer margins, per-source argmax") {
    // unit vectors: cosines are exact (0.6,0.8) norms are exactly 1
    val src = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))).toDF("id", "vec")
    val tgt = Seq((10L, Seq(1.0, 0.0)), (11L, Seq(0.6, 0.8)),
      (12L, Seq(0.0, 1.0))).toDF("id", "vec")
    val out = VectorOps.marginMine(src, tgt, k = 2, minMarginPpm = 1200000L)
      .orderBy("a_id").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("margin_ppm")))
    // a=1: cos_fp {10→1048576, 11→629145, 12→0}; fwd = 1677721;
    // bwd(10) = 1048576 + 0 = 1048576 →
    // margin = 1048576·4e6 div 2726297 = 1538461
    assert(out.toSeq == Seq((1L, 10L, 1538461L), (2L, 12L, 1428571L)))
  }

  test("graph: randomWalks are edge-respecting, fixed-length, and " +
       "partitioning-invariant") {
    import spark.implicits._
    val seeds = Seq(1L, 2L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L),
      (3L, 2L)).toDF("src", "dst")
    def run(parts: Int) =
      LinkGraph.randomWalks(seeds, edges.repartition(parts), 3)
        .collect().map(r => (r.getAs[Long]("walk_id"),
          r.getAs[Long]("step"), r.getAs[Long]("node"))).toSet
    val a = run(1)
    assert(a == run(5), "walks must not depend on partitioning")
    assert(a.size == 8) // 2 walks × (seed + 3 hops)
    val byWalk = a.groupBy(_._1).view.mapValues(
      _.toSeq.sortBy(_._2).map(_._3)).toMap
    val edgeSet = Set((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L),
      (3L, 2L))
    byWalk.values.foreach { path =>
      path.sliding(2).foreach { case Seq(u, v) =>
        assert(edgeSet((u, v)), s"hop $u->$v is not an edge")
      }
    }
    assert(byWalk(1L).head == 1L && byWalk(2L).head == 2L)
  }

  test("multimodal: audio silence spans merge consecutive quiet frames") {
    import spark.implicits._
    // 512 samples = 8 frames; bursts make frames 1,2,5,6 quiet
    val quiet = Seq(5L).toDF("seed").select(
      Multimodal.pcmFrameFeatures(
        Multimodal.patternWavBursts(col("seed"), 512, lit(16000)), 64)
        .as("f"))
      .select(explode(col("f")).as("x"))
      .select(col("x.frame_no"), col("x.peak"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(Seq(1, 2, 5, 6).forall(quiet(_) < 100))
    assert(Seq(0, 3, 4, 7).forall(quiet(_) >= 100))
  }

  test("dedup: jaccard is exact set semantics") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y")).as("j")).head.getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("dedup: simhash of identical docs is identical; blocking finds them") {
    val docs = Seq(
      (1L, "spark flink beam storm heron samza"),
      (2L, "spark flink beam storm heron samza"),
      (3L, "totally different words here now ok")).toDF("doc_id", "text")
    val sigs = docs.select(Dedup.simhash16(TextAnalysis.words(col("text"))).as("s"))
      .collect().map(_.getString(0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0).length == 16 && sigs(0).forall(c => c == '0' || c == '1'))
    val pairs = Dedup.simhashNearDups(docs, "text", "doc_id").collect()
    assert(pairs.exists(r => r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L
      && r.getAs[Int]("hamming") == 0))
  }

  test("dedup: connected components resolve chains and keep singletons") {
    // chain 1-2-3-4 (diameter forces multiple propagation rounds),
    // pair 10-11, singleton 99
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
    // star variant: identical labels from the same inputs
    val star = Dedup.connectedComponentsStar(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == cc)
  }

  test("dedup: star CC converges in O(log n) rounds on a chain where " +
       "min-label propagation needs O(diameter)") {
    // one 64-node chain (diameter 63) plus a singleton: propagation
    // capped at 8 rounds must fail LOUDLY, the star variant capped at
    // the same 8 rounds must finish — the round-count contrast is
    // asserted through each loop's own maxIter contract
    val nodes = (1L to 64L).toDF("id").union(Seq(99L).toDF("id"))
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val star = Dedup.connectedComponentsStar(nodes, edges, maxIter = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == ((1L to 64L).map(_ -> 1L) :+ (99L -> 99L)).toMap)
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(nodes, edges, maxIter = 8).collect()
    }
  }

  test("dedup: streaming admission dedups each batch against the at-rest " +
       "index and earlier batches' admissions, in arrival order") {
    import java.nio.file.{Files => JF, Paths, StandardOpenOption}
    val base = JF.createTempDirectory("graft_sa_spec").toString
    JF.createDirectories(Paths.get(s"$base/in"))
    val corpus = Seq((0L, "base text")).toDF("doc_id", "text")
    Dedup.writeHashIndex(corpus, "text", s"$base/idx")
    def writeBatch(name: String, mtime: Long, lines: Seq[String]): Unit = {
      val p = Paths.get(s"$base/in/$name")
      JF.write(p, lines.mkString("\n").getBytes("UTF-8"),
        StandardOpenOption.CREATE)
      JF.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    writeBatch("b1.jsonl", t0, Seq(
      """{"doc_id":10,"text":"base text","batch_no":1}""",
      """{"doc_id":12,"text":"fresh","batch_no":1}""",
      """{"doc_id":11,"text":"fresh","batch_no":1}"""))
    writeBatch("b2.jsonl", t0 + 5000, Seq(
      """{"doc_id":20,"text":"fresh","batch_no":2}""",
      """{"doc_id":21,"text":"other","batch_no":2}"""))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("batch_no",
        org.apache.spark.sql.types.LongType)))
    val stream = CorpusIO.readJsonlStream(spark, s"$base/in", schema,
        maxFilesPerTrigger = 1)
      .filter(col(CorpusIO.CorruptCol).isNull)
      .select(col("doc_id"), col("text"), col("batch_no"))
    Dedup.runStreamingAdmission(stream, s"$base/idx", s"$base/out",
      s"$base/cp")
    val got = spark.read.parquet(s"$base/out")
      .orderBy("batch_no", "doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("verdict")))
    assert(got.toSeq == Seq(
      (10L, "exact_dup"),  // corpus dup
      (11L, "admitted"),   // smaller id wins in-batch
      (12L, "exact_dup"),
      (20L, "exact_dup"),  // dup of batch-1 admission via the index
      (21L, "admitted")))
    // the index grew by exactly the two admitted hashes
    assert(spark.read.parquet(s"$base/idx").count() == 3L)
  }

  test("dedup: repeated-passage mining finds cross-doc spans, skips unique text") {
    val shared = (1 to 8).map(i => s"w$i").mkString(" ") // an 8-word passage
    val docs = Seq(
      (1L, s"$shared unique tail one"),
      (2L, s"other head $shared"), // same passage at a stride-aligned offset
      (3L, "completely unrelated words here")).toDF("doc_id", "text")
    val out = Dedup.repeatedPassages(docs, 4, 2).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_docs") == 2L))
    assert(out.forall(r => r.getAs[Long]("first_doc") == 1L))
  }

  test("dedup: decontamination flags docs quoting eval text, spares the rest") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (3L, "nine ten eleven twelve thirteen fourteen")).toDF("doc_id", "text")
    // eval corpus quotes a 5-gram from doc 1 verbatim; nothing from 2 or 3
    val evalSet = Seq("xx beta gamma delta epsilon zeta yy").toDF("text")
    val out = Dedup.decontaminate(train, evalSet, n = 5).orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 1L), (2L, 0L), (3L, 0L)))
    assert(out(0).getAs[Long]("n_hits") >= 1L)
  }

  test("dedup: Bloom decontamination has no false negatives vs the exact " +
       "screen and is bit-reproducible") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight"),
      (3L, "nine ten eleven twelve thirteen fourteen")).toDF("doc_id", "text")
    val evalSet = Seq("xx beta gamma delta epsilon zeta yy").toDF("text")
    val exact = Dedup.decontaminate(train, evalSet, n = 5)
      .select(col("id"), col("contaminated")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Dedup.decontaminateBloom(train, evalSet, n = 5,
      mBits = 1 << 10, k = 3).orderBy("id").collect()
    // one-sided error: every exact hit is flagged (FN = 0); doc 1 must be
    bloom.foreach { r =>
      if (exact(r.getLong(0)) == 1L) assert(r.getAs[Long]("flagged") == 1L)
    }
    assert(bloom.find(_.getLong(0) == 1L).get.getAs[Long]("n_maybe") >= 1L)
    // deterministic: a rebuild probes to the identical verdict rows
    val again = Dedup.decontaminateBloom(train, evalSet, n = 5,
      mBits = 1 << 10, k = 3).orderBy("id").collect()
    assert(bloom.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("text: CDC chunk boundaries are content-defined — chunks cover the " +
       "text exactly and survive an offset shift") {
    val base = (1 to 120).map(i => f"tok$i%03d").mkString(" ")
    val docs = Seq((1L, base), (2L, "PREFIX SHIFT " + base), (3L, ""))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        explode(TextAnalysis.cdcChunks(col("text"), 8, 16)).as("ck"))
      .select(col("doc_id"), col("ck.chunk_no"), col("ck.start"),
        col("ck.len"), col("ck.hash"))
      .collect()
    // coverage: per doc, chunks tile [1, len] with no gaps or overlap
    val byDoc = out.groupBy(_.getLong(0))
    assert(!byDoc.contains(3L)) // empty text → no chunks
    for ((id, rows) <- byDoc) {
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.head.getInt(2) == 1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getInt(2) == a.getInt(2) + a.getInt(3))
        case _ =>
      }
    }
    // offset robustness: every base-doc chunk hash after the shifted
    // doc's first boundary reappears verbatim in the shifted doc
    val h1 = byDoc(1L).map(_.getString(4)).toSet
    val h2 = byDoc(2L).map(_.getString(4)).toSet
    assert((h1 intersect h2).size >= h1.size - 2,
      s"expected near-total hash overlap, got ${(h1 intersect h2).size}/${h1.size}")
  }

  test("sketch: count-min estimates never undercount and are exact when " +
       "no collision exists") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa aa bb"), (2L, "aa bb cc"), (3L, "cc dd")).toDF("doc_id", "text")
    val sketch = Sketches.cmsBuild(docs, depth = 3, width = 1024)
    // total mass per row equals the stream length (9 words)
    val rowMass = sketch.groupBy("j").agg(sum("cnt").as("m")).collect()
    assert(rowMass.length == 3 && rowMass.forall(_.getAs[Long]("m") == 9L))
    val cand = Seq("aa", "bb", "cc", "dd", "zz").toDF("term")
    val est = Sketches.cmsEstimate(sketch, cand, depth = 3, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("aa" -> 4L, "bb" -> 2L, "cc" -> 2L, "dd" -> 1L)
    // CMS guarantee: est >= exact; with 4 terms in 1024 buckets × 3 rows
    // a full 3-row collision is (4/1024)^3-improbable — expect exact
    exact.foreach { case (t, n) => assert(est(t) == n) }
    // a term absent from the stream estimates 0 — empty cells are zero
    // and PARTICIPATE in the min (left join + zero-fill); dropping them
    // would inflate a cold term colliding with one hot bucket to that
    // bucket's whole count
    assert(est("zz") == 0L)
  }

  test("sketch: empty HLL register table estimates without NULLs") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("item")
    val row = Sketches.hllEstimate(Sketches.hllRegisters(empty)).collect()(0)
    assert(!row.isNullAt(0))
    val ov = Sketches.hllOverlap(empty, Seq("x", "y").toDF("item")).collect()(0)
    assert((0 until 4).forall(i => !ov.isNullAt(i)))
  }

  test("sampling: seqPack cuts the concatenated token stream into exact " +
       "windows — boundary-spanning docs, short final window, empty doc " +
       "dropped") {
    import spark.implicits._
    // one shard (shards = 1): offsets d1 [0,3) d2 [3,8) d3 [8,12) d4 [12,14)
    val d = Seq((1L, 3L), (2L, 5L), (3L, 4L), (4L, 2L), (5L, 0L))
      .toDF("doc_id", "n_tokens")
    val out = Sampling.seqPack(d, "doc_id", "n_tokens", seqLen = 4L, shards = 1)
      .orderBy("win").collect()
      .map(r => (r.getAs[Long]("win"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"),
        r.getAs[Long]("n_tokens")))
    assert(out.toSeq == Seq(
      (0L, 2L, 1L, 2L, 4L),  // d1 whole + d2's first token
      (1L, 1L, 2L, 2L, 4L),  // d2 spans the boundary into w1
      (2L, 1L, 3L, 3L, 4L),
      (3L, 1L, 4L, 4L, 2L))) // shard-final short window; d5 (0 tokens) gone
  }

  test("sketch: heavyHitters is exact and partitioning-invariant — the " +
       "Misra-Gries candidates confirm to the true heavy-hitter set") {
    import spark.implicits._
    // 10×a + 9×b + 8 singletons, n = 27; threshold freq·3 > 27 keeps
    // only a (30 > 27; b's 27 is not strictly over) — and b is exactly
    // the marginal candidate whose sketch estimate is order-dependent,
    // so determinism here proves the confirm pass, not luck
    val items = Seq.fill(10)("a") ++ Seq.fill(9)("b") ++
      (1 to 8).map(i => s"s$i")
    for (parts <- Seq(1, 3, 7)) {
      val df = items.toDF("w").repartition(parts)
      val got = Sketches.heavyHitters(df, "w", k = 4, denom = 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == Set(("a", 10L)), s"parts=$parts got $got")
    }
    // guarantee at capacity floor: k = denom still catches the giant
    val skew = (Seq.fill(60)("hot") ++ (1 to 40).map(i => s"t$i")).toDF("w")
    val g = Sketches.heavyHitters(skew.repartition(5), "w", k = 3, denom = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(g == Set(("hot", 60L)))
  }

  test("sketch: integer HLL estimates 5000 distincts within the m=256 " +
       "error envelope, ignores duplicates, and reproduces exactly") {
    import spark.implicits._
    val items = (1 to 5000).map(i => s"item-$i")
    // duplicates must not move the registers (max is idempotent)
    val est1 = Sketches.hllDistinct(items.toDF("item")).collect()(0).getLong(0)
    val est2 = Sketches.hllDistinct((items ++ items.take(2000)).toDF("item"))
      .collect()(0).getLong(0)
    assert(est1 == est2)
    // 1.04/sqrt(256) = 6.5% typical; assert a loose 20% envelope
    assert(math.abs(est1 - 5000L) <= 1000L, s"est $est1 off >20%")
    val est3 = Sketches.hllDistinct(items.toDF("item")).collect()(0).getLong(0)
    assert(est1 == est3)
  }

  test("sketch: HLL register merge estimates union/overlap, grouped " +
       "registers agree with the sparse estimator, sparse equals dense") {
    import spark.implicits._
    val a = (1 to 3000).map(i => s"it-$i").toDF("item")
    val b = (2001 to 5000).map(i => s"it-$i").toDF("item") // true overlap 1000
    // the sparse-register identity must reproduce the dense (range-join)
    // estimator EXACTLY — same rational, same division order
    val dense = Sketches.hllDistinct(a).collect()(0).getLong(0)
    val sparse = Sketches.hllEstimate(Sketches.hllRegisters(a))
      .collect()(0).getLong(0)
    assert(dense == sparse, s"sparse $sparse != dense $dense")
    val r = Sketches.hllOverlap(a, b).collect()(0)
    val (ea, eb, eu, eo) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert(math.abs(ea - 3000) <= 600, s"est_a $ea")
    assert(math.abs(eb - 3000) <= 600, s"est_b $eb")
    assert(math.abs(eu - 5000) <= 1000, s"est_union $eu")
    // inclusion–exclusion differences compound the noise: loose envelope
    assert(math.abs(eo - 1000) <= 700, s"est_overlap $eo")
    // grouped: two tagged groups reproduce the per-corpus sparse estimates
    val tagged = a.withColumn("grp", lit("ga"))
      .unionByName(b.withColumn("grp", lit("gb")))
    val byG = Sketches.hllDistinctBy(tagged, "grp").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byG("ga") == sparse)
    assert(byG("gb") ==
      Sketches.hllEstimate(Sketches.hllRegisters(b)).collect()(0).getLong(0))
  }

  test("dedup: exact-substring spans merge overlapping duplicated windows, " +
       "touching spans coalesce, unique docs yield nothing") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $shared z1 z2"),   // duplicated wholesale by doc 4
      (2L, s"b1 b2 b3 $shared"),      // shares only the s-block
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8"), // unique
      (4L, s"a1 a2 $shared z1 z2")).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(!spans.contains(3L), "unique doc must yield no spans")
    // docs 1/4: every length-4 window duplicated → one whole-doc span
    // (14 tokens, 11 windows)
    assert(spans(1L) == (0L, 13L, 14L, 11L))
    assert(spans(4L) == (0L, 13L, 14L, 11L))
    // doc 2: only windows fully inside the shared block (positions 3..9)
    // → span 3..12, 10 tokens, 7 windows
    assert(spans(2L) == (3L, 12L, 10L, 7L))
  }

  test("dedup: the span cut removes covered tokens from every copy and " +
       "rebuilds the remainder in order") {
    import spark.implicits._
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 $shared z1 z2"),
      (2L, s"b1 b2 b3 $shared"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8"),
      (4L, s"a1 a2 $shared z1 z2")).toDF("doc_id", "text")
    val cut = Dedup.cutDuplicatedSpans(docs, 4).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    // unique doc passes through untouched, in original order
    assert(cut(3L) == ("u1 u2 u3 u4 u5 u6 u7 u8", 8L, 0L))
    // wholesale duplicates are cut to nothing — BOTH copies (the
    // aggressive cut-everywhere contract)
    assert(cut(1L) == ("", 0L, 14L))
    assert(cut(4L) == ("", 0L, 14L))
    // partial overlap keeps the unique prefix only
    assert(cut(2L) == ("b1 b2 b3", 3L, 10L))
  }

  test("vectors: ADC-then-refine re-ranks candidates by exact cosine — " +
       "refined order equals the exact order over the probed cluster") {
    // blob A (ids 0,2,4,6) degrades toward the query; blob B mirrors it.
    val corpus = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 1.0)),
      (1L, Seq(0.0, 1.0, 1.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.1, 0.9)),
      (3L, Seq(0.1, 0.9, 0.9, 0.1)),
      (4L, Seq(0.8, 0.2, 0.2, 0.8)),
      (5L, Seq(0.2, 0.8, 0.8, 0.2)),
      (6L, Seq(0.7, 0.3, 0.3, 0.7))).toDF("id", "vec")
    val seeds = corpus.filter(col("id") < 2).orderBy("id").collect()
      .map(r => (r.getLong(0).toInt,
        r.getAs[scala.collection.Seq[Double]](1).toSeq)).toSeq
    val (coarse, _, _) = VectorOps.kmeansTrain(corpus, seeds, maxIter = 2)
    val cbs = VectorOps.pqTrain(corpus, m = 2, k = 2, maxIter = 2)
    val q = corpus.filter(col("id") === 0L)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val refined = VectorOps.ivfPqRefineTopK(corpus, q, coarse, cbs,
      nprobe = 1, rcand = 5, k = 3).orderBy("rank").collect()
    // nprobe=1 keeps the search inside blob A; with rcand covering the
    // whole cluster, refine = exact cosine rank over {2,4,6}: the PQ
    // codes (m=2,k=2 — heavily collapsed) no longer affect the order
    assert(refined.map(_.getAs[Long]("id")).toSeq == Seq(2L, 4L, 6L))
    // scores are the EXACT cosines, not ADC approximations
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val exp = cos(Seq(1.0, 0.0, 0.0, 1.0), Seq(0.9, 0.1, 0.1, 0.9))
    assert(math.abs(refined.head.getAs[Double]("score") - exp) < 1e-12)
  }

  test("dedup: containment flags the quoted excerpt Jaccard misses, and " +
       "the df-cap drops boilerplate shingles before the join") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val quote = (8 to 19).map(i => s"w$i").mkString(" ") // fully inside base
    val docs = Seq((1L, base), (2L, quote), (3L, "x1 x2 x3 x4 x5"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, 3, 50, 800000L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // quote ⊂ base: all 10 of the quote's shingles shared → 100%
    assert(got((2L, 1L)) == (10L, 10L, 1000000L))
    // the reverse direction (base in quote) is 10/28 — filtered; for
    // the record that pair's JACCARD is also 10/28 ≈ 0.36, under any
    // dedup threshold: this is exactly the pair Jaccard misses
    assert(got.size == 1)
    // boilerplate: one shingle shared across three docs, nothing else
    val bp = Seq((10L, "c1 c2 c3 a1 a2"), (11L, "c1 c2 c3 b1 b2"),
      (12L, "c1 c2 c3 d1 d2")).toDF("doc_id", "text")
    // df-cap 2 drops the df=3 shingle pre-join → no candidate pairs
    assert(Dedup.containmentPairs(bp, 3, 2, 1L).count() == 0)
    // df-cap 5 keeps it → all 6 ordered pairs surface
    assert(Dedup.containmentPairs(bp, 3, 5, 1L).count() == 6)
  }

  test("text: blocklist screen counts occurrences (not types) and keeps " +
       "only hit-free docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "good text only"),
      (2L, "bad bad words here"),
      (3L, "one bad word")).toDF("doc_id", "text")
    val got = TextAnalysis.blocklistScreen(docs, Seq("bad", "worse"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (0L, 1L))
    assert(got(2L) == (2L, 0L)) // two OCCURRENCES of one type
    assert(got(3L) == (1L, 0L))
  }

  test("graph: fixed-point PageRank reproduces the hand-computed " +
       "trajectory, leaks dangling mass, bases no-inlink nodes") {
    import spark.implicits._
    import graft.llm.LinkGraph
    // chain 0→1→2 with a dangling tail: node 2 has no out-edges
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = LinkGraph.pageRank(nodes, edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replay the exact integer recurrence
    val scale = LinkGraph.Scale
    val base = (100L - 85L) * scale / 100L / 3L
    val pr0 = scale / 3L
    def next(inflow: Long): Long = base + 85L * inflow / 100L
    val p1 = Map(0L -> next(0L), 1L -> next(pr0), 2L -> next(pr0))
    val p2 = Map(0L -> next(0L), 1L -> next(p1(0L)), 2L -> next(p1(1L)))
    assert(got == p2, s"got $got expected $p2")
    // no-inlink node 0 sits at the damping base; mass is NOT conserved
    // (node 2 dangles by contract)
    assert(got(0L) == base)
    assert(got.values.sum < scale)
  }

  test("operators: zValue16 interleaves bits (x even, y odd) and its " +
       "range tiles are squares of the plane") {
    import spark.implicits._
    import graft.operators.ZOrder
    val rows = Seq((10L, 5L), (64L, 0L), (0L, 64L), (192L, 192L), (0L, 0L))
      .toDF("x", "y")
      .select(ZOrder.zValue16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    // x=1010b, y=0101b: z interleaves to 01100110b = 102
    assert(rows(0) == 102L)
    // bit 6 of x lands at even position 12; of y at odd position 13
    assert(rows(1) == 4096L && rows(2) == 8192L)
    // top-2 bits of both dims fill the top nibble: tile 15
    assert(rows(3) / 4096L == 15L && rows(4) == 0L)
    // every point of a 64×64 tile shares one zg: corners of tile (1,1)
    val corners = Seq((64L, 64L), (127L, 64L), (64L, 127L), (127L, 127L))
      .toDF("x", "y")
      .select((ZOrder.zValue16(col("x"), col("y")) / 4096).cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(corners.size == 1)
  }

  test("graph: personalized PageRank concentrates restart mass on the " +
       "seeds and scores unreachable nodes exactly 0") {
    import spark.implicits._
    import graft.llm.LinkGraph
    // 1→2→3 reachable from seed 1; node 4 is disconnected
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = LinkGraph.personalizedPageRank(nodes, edges, seeds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replay the exact integer recurrence with |S| = 1
    val scale = LinkGraph.Scale
    val base = (100L - 85L) * scale / 100L / 1L
    def nxt(isSeed: Boolean, inflow: Long): Long =
      (if (isSeed) base else 0L) + 85L * inflow / 100L
    var p = Map(1L -> scale, 2L -> 0L, 3L -> 0L, 4L -> 0L)
    for (_ <- 1 to 3)
      p = Map(1L -> nxt(true, 0L), 2L -> nxt(false, p(1L)),
        3L -> nxt(false, p(2L)), 4L -> nxt(false, 0L))
    assert(got == p, s"got $got expected $p")
    // unreachable-from-seeds is a value, not an absence
    assert(got(4L) == 0L)
    // proximity ordering: seed > one hop > two hops
    assert(got(1L) > got(2L) && got(2L) > got(3L) && got(3L) > 0L)
    // a stray seed outside the node set must not deflate |S|
    val gotStray = LinkGraph.personalizedPageRank(nodes, edges,
        Seq(1L, 99L).toDF("id"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotStray == got)
  }

  test("dedup: incremental admission rejects corpus dups, keeps novel docs") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq((1L, base), (2L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (101L, base),                       // exact dup of corpus 1
      (102L, base + " tail words"),       // near dup of corpus 1
      (103L, "totally different fresh content with no shingle overlap at all"),
      (104L, "cloned inside the batch only once twice thrice repeated here"),
      (105L, "cloned inside the batch only once twice thrice repeated here"))
      .toDF("doc_id", "text")
    val v = Dedup.incrementalVerdicts(corpus, batch, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v == Map(101L -> "exact_dup", 102L -> "near_dup",
      103L -> "admitted", 104L -> "admitted", 105L -> "exact_dup"))
  }

  test("text: bm25 ranks the term-dense doc first, excludes non-matches") {
    val docs = Seq(
      (1L, "spark query spark table spark"),    // dense in all terms
      (2L, "spark runs somewhere in here with many other filler words"),
      (3L, "nothing relevant at all here")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Scores(docs, Seq("spark", "table", "query"))
      .collect().map(r => r.getLong(0) -> r.getDouble(r.length - 1)).toMap
    assert(out.keySet == Set(1L, 2L), "doc 3 matches no term")
    assert(out(1L) > out(2L), "denser doc scores higher")
    assert(out.values.forall(_ > 0))
  }

  test("text: bm25 plans TakeOrdered for top-k and never explodes") {
    // range-derived source: a Seq-backed LocalRelation would let the
    // optimizer fold the whole sort+limit at plan time, hiding the
    // TakeOrdered this test is about
    val docs = spark.range(30).select(col("id").as("doc_id"),
      concat(lit("spark table filler word"),
        when(col("id") % 2 === 0, " spark").otherwise(" other")).as("text"))
    val scored = TextAnalysis.bm25Scores(docs, Seq("spark", "table"))
      .orderBy(col("score").desc, col("id")).limit(5)
    scored.collect() // finalize the adaptive plan before inspecting it
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Generate"), s"explode leaked into bm25 plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dedup: incremental admission verdict invariants") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    // disjoint batch -> everything admitted
    val fresh = Seq((10L, "completely different words in this one"),
      (11L, "and yet another unrelated document text")).toDF("doc_id", "text")
    val v1 = Dedup.incrementalVerdicts(corpus, fresh, "text", "doc_id")
      .collect().map(_.getString(1))
    assert(v1.forall(_ == "admitted"))
    // batch == corpus (new ids) -> everything exact_dup
    val clone = corpus.withColumn("doc_id", col("doc_id") + 100)
    val v2 = Dedup.incrementalVerdicts(corpus, clone, "text", "doc_id")
      .collect().map(_.getString(1))
    assert(v2.forall(_ == "exact_dup"))
  }

  test("sampling: shuffle-shard covers 0..n-1 positions per shard, deterministically") {
    val docs = (0L until 64L).toDF("doc_id")
    val a = Sampling.shuffleShard(docs, "doc_id", 4).collect()
    val b = Sampling.shuffleShard(docs, "doc_id", 4).collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet) // pure function of id
    val byShard = a.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet.subsetOf((0L until 4L).toSet))
    byShard.foreach { case (_, rows) =>
      val pos = rows.map(_.getAs[Long]("pos")).sorted.toSeq
      assert(pos == (0L until rows.length).toSeq) // dense rank within shard
    }
    // order within a shard is NOT id order (it actually shuffled)
    assert(byShard.values.exists(rows =>
      rows.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("doc_id")).toSeq !=
        rows.map(_.getAs[Long]("doc_id")).sorted.toSeq))
  }

  test("sampling: sqrt mixture keeps the rarest domain whole, thins the rest") {
    val docs = ((0L until 400L).map(i => (i, "big")) ++
      (400L until 416L).map(i => (i, "small"))).toDF("doc_id", "src")
    val kept = Sampling.mixtureSampleSqrt(docs, "src", "doc_id")
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("small") == 16L) // rate 1.0: rarest source never loses docs
    // big keeps ~sqrt(16/400) = 20% — allow wide deterministic-hash slack
    assert(kept("big") > 40L && kept("big") < 160L)
  }

  test("sampling: budget-select equals the naive global cumsum rule") {
    val r = new scala.util.Random(7)
    val docs = (0L until 300L)
      .map(i => (i, r.nextInt(2048).toLong, 10L + r.nextInt(90)))
      .toDF("id", "score_int", "toks")
    for (budget <- Seq(0L, 500L, 7000L, 1000000L)) {
      val got = Sampling.budgetSelect(docs, "id", "score_int", "toks", budget,
          granularity = 256L)
        .select("id").collect().map(_.getLong(0)).toSet
      val naive = docs.withColumn("cum", sum(col("toks")).over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score_int").desc, col("id"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .filter(col("cum") <= budget)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == naive, s"budget=$budget")
    }
  }

  test("sampling: stratified sample caps strata, is deterministic, " +
       "plans WindowGroupLimit") {
    val docs = spark.range(200).select(col("id").as("doc_id"),
      (col("id") % 4).as("bucket"))
    def run() = Sampling.stratifiedSample(docs, col("bucket"), "doc_id", 7)
    val rows = run().collect()
    val byStratum = rows.groupBy(_.getAs[Long]("stratum"))
    assert(byStratum.keySet == Set(0L, 1L, 2L, 3L))
    assert(byStratum.values.forall(_.length == 7))
    assert(rows.map(r => (r.getAs[Long]("stratum"), r.getAs[Long]("doc_id")))
      .toSet == run().collect()
      .map(r => (r.getAs[Long]("stratum"), r.getAs[Long]("doc_id"))).toSet)
    val df = run()
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("vectors: dot/norm/cosine/normalize") {
    val df = Seq((Seq(3.0, 4.0), Seq(4.0, 3.0))).toDF("a", "b")
    val r = df.select(
      VectorOps.dot(col("a"), col("b")).as("d"),
      VectorOps.l2Norm(col("a")).as("n"),
      VectorOps.cosine(col("a"), col("b")).as("c"),
      VectorOps.normalize(col("a")).as("u")).head
    assert(r.getAs[Double]("d") == 24.0)
    assert(r.getAs[Double]("n") == 5.0)
    assert(math.abs(r.getAs[Double]("c") - 24.0 / 25.0) < 1e-12)
    assert(seqOf[Double](r, "u") == Seq(0.6, 0.8))
  }

  test("vectors: brute-force top-k ranks by cosine, excludes self") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, Seq(0.0, 1.0)))
      .toDF("id", "vec")
    val queries = Seq((1L, Seq(1.0, 0.0))).toDF("qid", "qvec")
    val top = VectorOps.bruteForceTopK(corpus, queries, 2)
      .orderBy("rank").collect()
    assert(top.map(_.getAs[Long]("id")).toSeq == Seq(2L, 3L))
    assert(top.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
  }

  test("vectors: lsh bucket agreement for near vectors, pruning for far ones") {
    val planes = VectorOps.hyperplanes(8, 2)
    assert(planes == VectorOps.hyperplanes(8, 2)) // seed-deterministic
    val corpus = Seq(
      (1L, Seq(1.0, 0.01)), (2L, Seq(1.0, 0.02)), (3L, Seq(-1.0, -0.02)))
      .toDF("id", "vec")
    val queries = Seq((1L, Seq(1.0, 0.01))).toDF("qid", "qvec")
    val hits = VectorOps.lshTopK(corpus, queries, planes, 5).collect()
    assert(hits.map(_.getAs[Long]("id")).contains(2L)) // same bucket
    assert(!hits.map(_.getAs[Long]("id")).contains(3L)) // opposite signs pruned
  }

  test("vectors: ivf assigns to nearest centroid and probes prune") {
    // Two obvious clusters around the axes; centroids = the axes.
    val cents = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))
    val corpus = Seq(
      (10L, Seq(0.9, 0.1)), (11L, Seq(0.8, 0.2)),   // cluster 0
      (20L, Seq(0.1, 0.9)), (21L, Seq(0.2, 0.8)))   // cluster 1
      .toDF("id", "vec")
    val assigned = corpus
      .select(col("id"), VectorOps.nearestCentroid(col("vec"), cents).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned == Map(10L -> 0, 11L -> 0, 20L -> 1, 21L -> 1))
    // a zero-norm vector (NULL cosine everywhere) still lands on the
    // first centroid — the SQL row_number tie-break — never cid=-1
    val zero = Seq((99L, Seq(0.0, 0.0))).toDF("id", "vec")
      .select(VectorOps.nearestCentroid(col("vec"), cents).as("cid"))
    assert(zero.head.getInt(0) == 0)
    // nprobe=1: the query near cluster 0 must only see cluster-0 vectors.
    val queries = Seq((10L, Seq(0.9, 0.1))).toDF("qid", "qvec")
    val hits = VectorOps.ivfTopK(corpus, queries, cents, nprobe = 1, k = 10)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(hits == Set(11L))
    // nprobe=2 searches everything.
    val all = VectorOps.ivfTopK(corpus, queries, cents, nprobe = 2, k = 10)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(all == Set(11L, 20L, 21L))
  }

  test("vectors: one kmeans step moves centroids toward cluster means") {
    val cents = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))
    val corpus = Seq(
      (1L, Seq(2.0, 0.0)), (2L, Seq(4.0, 0.0)),   // cluster 0, mean (3, 0)
      (3L, Seq(0.0, 6.0)))                        // cluster 1, mean (0, 6)
      .toDF("id", "vec")
    val step = VectorOps.kmeansStep(corpus, cents).collect()
      .map(r => (r.getAs[Int]("cid"), r.getAs[Int]("pos")) ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean")))).toMap
    assert(step((0, 1)) == ((2L, 3.0)) && step((0, 2)) == ((2L, 0.0)))
    assert(step((1, 1)) == ((1L, 0.0)) && step((1, 2)) == ((1L, 6.0)))
  }

  test("text: pii scrub redacts emails and phones and counts them") {
    val df = Seq((1L, "mail a.b@x.org or call 555-123-4567 twice 555-000-1111"),
      (2L, "clean text")).toDF("doc_id", "text")
    val sc = TextAnalysis.scrubPii(col("text"))
    val r = df.select(col("doc_id"), sc.getField("clean").as("clean"),
      sc.getField("n_emails").as("ne"), sc.getField("n_phones").as("np"))
      .orderBy("doc_id").collect()
    assert(r(0).getAs[String]("clean") ==
      "mail <EMAIL> or call <PHONE> twice <PHONE>")
    assert(r(0).getAs[Int]("ne") == 1 && r(0).getAs[Int]("np") == 2)
    assert(r(1).getAs[String]("clean") == "clean text")
    assert(r(1).getAs[Int]("ne") == 0 && r(1).getAs[Int]("np") == 0)
  }

  test("text: vocabulary counts tf and df with map-side pre-aggregation") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "a")).toDF("doc_id", "text")
    val v = TextAnalysis.vocabulary(docs).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("tf"), r.getAs[Long]("df")))).toMap
    assert(v == Map("a" -> ((3L, 2L)), "b" -> ((2L, 2L)), "c" -> ((1L, 1L))))
  }

  test("vectors: int8 quantization bounds reconstruction error by scale/2") {
    val df = Seq((1L, Seq(0.5, -1.25, 3.81)), (2L, Seq(0.0, 0.0))).toDF("id", "vec")
    val qz = VectorOps.quantizeInt8(col("vec"))
    val r = df.select(col("id"), qz.getField("scale").as("scale"),
      qz.getField("q").as("q"),
      VectorOps.dequantMaxErr(col("vec"), qz.getField("q"), qz.getField("scale")).as("err"))
      .orderBy("id").collect()
    val scale = r(0).getAs[Double]("scale")
    assert(math.abs(scale - 3.81 / 127.0) < 1e-12)
    assert(seqOf[Long](r(0), "q").last == 127L)
    assert(r(0).getAs[Double]("err") <= scale / 2 + 1e-12)
    // zero vector -> zero scale, all-zero codes, zero error
    assert(r(1).getAs[Double]("scale") == 0.0)
    assert(seqOf[Long](r(1), "q") == Seq(0L, 0L))
    assert(r(1).getAs[Double]("err") == 0.0)
  }

  test("multimodal: frame grid covers the payload at the declared stride") {
    val text = "x" * 300 // (300-48)//96+1 = 3 frames at 1, 97, 193
    val docs = Seq((1L, text), (2L, "short")).toDF("doc_id", "text")
    val fr = Multimodal.sampleFrames(col("text"), 48, 96)
    val r = docs.select(col("doc_id"), fr.getField("n_frames").as("nf"),
      fr.getField("offsets").as("off"), fr.getField("fingerprints").as("fps"))
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("nf") == 3L)
    assert(seqOf[Int](r(0), "off") == Seq(1, 97, 193))
    val fps = seqOf[String](r(0), "fps")
    assert(fps.length == 3 && fps.forall(_.length == 8))
    assert(fps.distinct.length == 1) // identical frames of 'x'*48 hash alike
    assert(r(1).getAs[Long]("nf") == 0L && seqOf[Int](r(1), "off").isEmpty)
  }

  test("multimodal: resize geometry invariants hold over the whole dim range") {
    val dims = for { w <- 1 to 256; h <- Seq(1, 7, 97, 128, 255, 256) }
      yield (w.toLong, h.toLong)
    val df = dims.toDF("w", "h")
    val r = Multimodal.resizeStub(col("w"), col("h"), 224)
    val bad = df.select(r.getField("w").as("w2"), r.getField("h").as("h2"),
      r.getField("pad_x").as("px"), r.getField("pad_y").as("py"))
      .filter(col("w2") < 1 || col("w2") > 224 || col("h2") < 1 || col("h2") > 224 ||
        col("px") < 0 || col("py") < 0 ||
        greatest(col("w2"), col("h2")) =!= 224)  // long edge fills the box
      .count()
    assert(bad == 0)
  }

  test("multimodal: decodeMeta parses hand-written spec-example BMP/PNG/WAV " +
       "headers, sign-extends BMP height, falls back to the stub on raw bytes") {
    // byte-for-byte from the format specs, NOT from our own builders —
    // a builder/parser endianness slip cannot cancel out here
    val bmp1x2 = "424D360000000000000036000000280000000100000002000000" +
      "01001800" + "0" * 48                               // BM, 1×2, 24bpp
    val bmpTopDown = "424D3600000000000000360000002800000001000000FEFFFFFF" +
      "01001800" + "0" * 48                               // height = -2 (top-down)
    val png3x5 = "89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000003" + "00000005" + "0802000000" + "00000000" // IHDR 3×5
    val wav44k = "52494646" + "24000000" + "57415645" + "666D7420" +
      "10000000" + "0100" + "0200" + "44AC0000" + "10B10200" +
      "0400" + "1000" + "64617461" + "00000000"           // 2ch, 44100Hz
    val rows = Seq(
      (1L, bmp1x2), (2L, bmpTopDown), (3L, png3x5), (4L, wav44k))
      .toDF("id", "hx")
      .select(col("id"), unhex(col("hx")).as("payload"))
    val m = Multimodal.decodeMeta(col("payload"))
    val got = rows.select(col("id"), m.getField("format"),
      m.getField("width"), m.getField("height"), m.getField("n_bytes"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "bmp", 1L, 2L, 54L),
      (2L, "bmp", 1L, -2L, 54L),
      (3L, "png", 3L, 5L, 33L),
      (4L, "wav", 44100L, 2L, 44L)))
    // builders round-trip through the parser with planted geometry, and
    // raw (headerless) payloads keep the documented md5 stub dims
    val txt = Seq((10L, "some pixel-ish text body")).toDF("id", "t")
    val body = Multimodal.asBinaryPayload(col("t"))
    val built = txt.select(col("id"),
      Multimodal.decodeMeta(Multimodal.bmpPayload(lit(640L), lit(480L), body))
        .as("b"),
      Multimodal.decodeMeta(Multimodal.pngPayload(lit(33L), lit(7L), body))
        .as("p"),
      Multimodal.decodeMeta(Multimodal.wavPayload(lit(1L), lit(16000L), body))
        .as("w"),
      Multimodal.decodeMeta(body).as("raw"),
      Multimodal.fakeDecodeMeta(body).as("fake")).head()
    val b = built.getStruct(1); val p = built.getStruct(2)
    val w = built.getStruct(3); val raw = built.getStruct(4)
    val fake = built.getStruct(5)
    assert((b.getString(0), b.getLong(1), b.getLong(2)) == ("bmp", 640L, 480L))
    assert((p.getString(0), p.getLong(1), p.getLong(2)) == ("png", 33L, 7L))
    assert((w.getString(0), w.getLong(1), w.getLong(2)) == ("wav", 16000L, 1L))
    assert(raw.getString(0) == "unknown")
    assert(raw.getLong(1) == fake.getAs[Int]("width").toLong)
    assert(raw.getLong(2) == fake.getAs[Int]("height").toLong)
  }

  test("multimodal: decodeMeta walks the JPEG segment chain to SOF0 and " +
       "the tightened BMP sniff rejects text that merely starts with 'BM'") {
    // hand-written per the JPEG spec (NOT via jpegPayload): SOI, APP0,
    // a DQT segment the walk must step over, then SOF0 with height=2,
    // width=3 — total 2+18+69+19 = 108 bytes
    val jpeg3x2 = "FFD8" +
      "FFE000104A4649460001010000010001" + "0000" +
      "FFDB" + "0043" + "00" + "00" * 64 +
      "FFC0" + "0011" + "08" + "0002" + "0003" +
      "03" + "012200" + "021101" + "031101"
    // SOI + APP0 then EOI — a truncated file with no frame header
    val jpegNoSof = "FFD8" + "FFE000104A4649460001010000010001" + "0000" +
      "FFD9"
    val rows = Seq((1L, jpeg3x2), (2L, jpegNoSof)).toDF("id", "hx")
      .select(col("id"), unhex(col("hx")).as("payload"))
    val m = Multimodal.decodeMeta(col("payload"))
    val got = rows.select(col("id"), m.getField("format"),
      m.getField("width"), m.getField("height"), m.getField("n_bytes"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, "jpeg", 3L, 2L, 108L),
      (2L, "unknown", got(1)._3, got(1)._4, 22L)))
    // builder round-trip + the ADVICE regression: a ≥54-byte text payload
    // starting with the letters 'BM' must NOT parse as bmp
    val txt = Seq((10L,
      "BMW makes cars, not bitmaps - this is plainly prose and it is " +
        "definitely longer than fifty-four bytes.")).toDF("id", "t")
    val body = Multimodal.asBinaryPayload(col("t"))
    val built = txt.select(
      Multimodal.decodeMeta(Multimodal.jpegPayload(lit(1280L), lit(720L), body))
        .as("j"),
      Multimodal.decodeMeta(body).as("raw")).head()
    val j = built.getStruct(0); val raw = built.getStruct(1)
    assert((j.getString(0), j.getLong(1), j.getLong(2)) == ("jpeg", 1280L, 720L))
    assert(raw.getString(0) == "unknown")
  }

  test("multimodal: payload metadata is deterministic and schema-typed") {
    val docs = Seq((7L, "hello world")).toDF("doc_id", "text")
    val r1 = Multimodal.toMultimodalRows(docs).select("meta.*").head
    val r2 = Multimodal.toMultimodalRows(docs).select("meta.*").head
    assert(r1 == r2)
    assert(r1.getAs[Int]("n_bytes") == 11)
    assert(r1.getAs[Int]("width") >= 1 && r1.getAs[Int]("width") <= 256)
    assert(r1.getAs[String]("fingerprint").length == 8)
  }

  test("dedup: simhash self-join reuses ONE signature exchange, never broadcasts") {
    // range-derived source so stats don't fold the join away at plan time
    val docs = spark.range(60).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma delta "),
        when(col("id") % 3 === 0, "epsilon zeta").otherwise("eta theta"),
        lit(" iota"), (col("id") % 7).cast("string")).as("text"))
    val df = Dedup.simhashNearDups(docs, "text", "doc_id")
    df.collect() // finalize the adaptive plan before inspecting it
    val plan = df.queryExecution.executedPlan.toString
    // the pinned shuffle join makes the two identical sides share one
    // exchange — the signature aggregation runs once, not twice
    assert(plan.contains("ReusedExchange"), plan)
    assert(!plan.contains("BroadcastHashJoin"),
      s"broadcast join would compute the simhash signatures twice:\n$plan")
  }

  test("text: quality filter keeps good prose, rejects repetition, " +
       "defines the zero-word doc") {
    val good = ((1 to 60).map(i => s"word$i") ++ Seq("the", "and", "of"))
      .mkString(" ")
    val spammy = Seq.fill(60)("spam").mkString(" ")
    val docs = Seq((1L, good), (2L, spammy), (3L, "  "), (4L, "short text"))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        TextAnalysis.qualityFilter(col("text")).as("q"))
      .select(col("doc_id"), col("q.n_words"), col("q.gopher_pass"),
        col("q.logit_fp"), col("q.keep"))
      .orderBy("doc_id").collect()
    // good: passes the rule gate AND the classifier
    assert(out(0).getAs[Long]("n_words") == 63L)
    assert(out(0).getAs[Long]("gopher_pass") == 1L)
    assert(out(0).getAs[Long]("keep") == 1L)
    // spammy: long enough, but dup-3gram ratio ~1 fails the Gopher gate
    assert(out(1).getAs[Long]("gopher_pass") == 0L)
    assert(out(1).getAs[Long]("keep") == 0L)
    // whitespace-only: nWords = 0, every ratio defined 0.0, logit = bias
    assert(out(2).getAs[Long]("n_words") == 0L)
    assert(out(2).getAs[Long]("gopher_pass") == 0L)
    assert(out(2).getAs[Long]("logit_fp") ==
      math.floor(TextAnalysis.QualityBias * 1048576.0).toLong)
    assert(out(2).getAs[Long]("keep") == 0L)
    // short: well-formed but under the 50-word floor
    assert(out(3).getAs[Long]("gopher_pass") == 0L)
  }

  test("vectors: kmeans trainer stabilizes assignments, keeps empty clusters, " +
       "re-seeds IVF") {
    // two well-separated direction blobs (cosine assignment)
    val pts = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(1.1, -0.1)),
      (3L, Seq(0.0, 1.0)), (4L, Seq(0.1, 0.9)), (5L, Seq(-0.1, 1.1)))
      .toDF("id", "vec")
    val seeds = Seq(0 -> Seq(0.9, 0.1), 1 -> Seq(0.1, 0.9))
    val (cents, iters, shift) =
      VectorOps.kmeansTrain(pts, seeds, maxIter = 10, tol = 1e-9)
    // assignments stabilize: the loop exits on tol well before maxIter
    assert(iters < 10, s"did not converge: iters=$iters shift=$shift")
    assert(shift <= 1e-9)
    // trained centroids sit on the blob means (fixed-point grid ≈ exact)
    val c0 = cents.find(_._1 == 0).get._2
    val c1 = cents.find(_._1 == 1).get._2
    assert(math.abs(c0.head - 1.0) < 1e-4 && math.abs(c0(1)) < 1e-4)
    assert(math.abs(c1.head) < 1e-4 && math.abs(c1(1) - 1.0) < 1e-4)
    // training twice from the trained centroids is a fixed point (1 iter)
    val (cents2, _, shift2) = VectorOps.kmeansTrain(pts, cents, maxIter = 1)
    assert(cents2 == cents && shift2 == 0.0)
    // a cluster that attracts no members keeps its seed position
    val lonely = Seq(0 -> Seq(1.0, 1.0), 1 -> Seq(-1.0, -1.0))
    val (cents3, _, _) = VectorOps.kmeansTrain(pts, lonely, maxIter = 2)
    assert(cents3.find(_._1 == 1).get._2 == Seq(-1.0, -1.0))
    // trained centroids re-seed the IVF index: a probe near blob A
    // searches only cluster A and finds exactly its members
    val q = Seq((100L, Seq(0.95, 0.05))).toDF("qid", "qvec")
    val nn = VectorOps.ivfTopK(pts, q, cents, nprobe = 1, k = 3).collect()
    assert(nn.map(_.getAs[Long]("id")).toSet == Set(0L, 1L, 2L))
  }

  test("vectors: random projection is the exact per-plane dot") {
    val df = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 2.0)), (3L, Seq(3.0, -1.0)))
      .toDF("id", "vec")
    val planes = Seq(Seq(1.0, 1.0), Seq(1.0, -1.0))
    val out = df.select(col("id"),
        VectorOps.randomProjection(col("vec"), planes).as("y"))
      .orderBy("id").collect()
    assert(seqOf[Double](out(0), "y") == Seq(1.0, 1.0))
    assert(seqOf[Double](out(1), "y") == Seq(2.0, -2.0))
    assert(seqOf[Double](out(2), "y") == Seq(2.0, 4.0))
  }

  test("vectors: hard negatives stay inside the band, exclude self and dups") {
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)),   // the query itself
      (1L, Seq(2.0, 0.0)),   // cos 1.0 — a duplicate, above the band
      (2L, Seq(1.0, 1.0)),   // cos ~0.707 — the hard negative
      (3L, Seq(1.0, 0.2)),   // cos ~0.981 — above the band (near-dup)
      (4L, Seq(0.0, 1.0)),   // cos 0 — easy negative, below the band
      (5L, Seq(-1.0, 0.0))). // cos -1
      toDF("id", "vec")
    val q = corpus.filter(col("id") === 0L)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val out = VectorOps.hardNegatives(corpus, q, 3, 0.5, 0.95)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(2L))
    assert(out.head.getAs[Int]("rank") == 1)
    val c = out.head.getAs[Double]("cos")
    assert(c >= 0.5 && c < 0.95)
  }

  test("dedup: semantic groups drop within-cluster near-dups, keep the " +
       "lowest id, and release the assignment cache before returning") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)),    // cluster 0 anchor
      (2L, Seq(10.0, 0.0)),   // cos 1.0 with id 1 → dropped
      (3L, Seq(0.0, 1.0)),    // cluster 1 anchor
      (4L, Seq(0.1, 1.0)),    // cos ≈0.995 with id 3 → dropped
      (5L, Seq(0.7, 0.7)))    // exact tie → cluster 0; cos ≈0.707 → kept
      .toDF("id", "vec")
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    val df = Dedup.semanticGroups(corpus, cents, tau = 0.95)
    // release-early contract: the pair set was materialized eagerly and
    // the corpus-sized assignment cache is ALREADY gone — no cached
    // blocks left behind for a long-lived session to accumulate
    assert(corpus.sparkSession.sharedState.cacheManager.isEmpty,
      "semanticGroups left a persisted assignment behind")
    val out = df.orderBy("id").collect()
    assert(out.map(r => (r.getAs[Long]("id"), r.getAs[Long]("cid"),
      r.getAs[Long]("keep"))).toSeq ==
      Seq((1L, 0L, 1L), (2L, 0L, 0L), (3L, 1L, 1L), (4L, 1L, 0L),
        (5L, 0L, 1L)))
    // the dropped-id side of the verdict join reads the eager checkpoint
    // (ExistingRDD), not a re-derived self-join
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), plan)
  }

  test("dedup: multi-probe semantic groups catch the boundary-straddling " +
       "near-dup that single-probe misses") {
    // v1/v2 are a near-dup pair (cos ≈ 0.942) landing in DIFFERENT
    // primary clusters; v3/v4 anchor the two clusters
    val corpus = Seq(
      (1L, Seq(0.85, 0.60)), (2L, Seq(0.60, 0.85)),
      (3L, Seq(1.0, 0.0)), (4L, Seq(0.0, 1.0))).toDF("id", "vec")
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    val single = Dedup.semanticGroups(corpus, cents, tau = 0.9)
      .orderBy("id").collect().map(r => r.getAs[Long]("keep"))
    assert(single.toSeq == Seq(1L, 1L, 1L, 1L)) // pair straddles → missed
    val multi = Dedup.semanticGroupsMultiProbe(corpus, cents, tau = 0.9)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("cid"), r.getAs[Long]("keep")))
    // probe sets overlap → pair compared → higher id dropped; primary
    // cluster reported unchanged
    assert(multi.toSeq == Seq((1L, 0L, 1L), (2L, 1L, 0L),
      (3L, 0L, 1L), (4L, 1L, 1L)))
    assert(corpus.sparkSession.sharedState.cacheManager.isEmpty)
    // top-2 fold order matches ORDER BY cos DESC, cid (exact tie → both
    // slots in ascending cid order)
    val t2 = corpus.filter(col("id") === 3L)
      .select(VectorOps.nearest2Centroids(col("vec"), cents)).head().getSeq[Int](0)
    assert(t2 == Seq(0, 1))
    val tie = Seq((9L, Seq(0.7, 0.7))).toDF("id", "vec")
      .select(VectorOps.nearest2Centroids(col("vec"), cents)).head().getSeq[Int](0)
    assert(tie == Seq(0, 1))
  }

  test("dedup: semantic groups survive a 90%-hot cluster — AQE splits " +
       "the skewed self-join partition and the verdict stays exact") {
    val spark0 = spark
    val conf = spark0.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force the self-join onto the shuffle path at unit-test scale and
      // lower the skew thresholds so the hot cid triggers the same
      // OptimizeSkewedJoin a multi-GB hot cluster would at defaults
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
      // 90% of the corpus in one semantic blob: 3 distinct hot bases
      // (mutual cos ≈ 0.92 < tau) copied 300× each (copies cos 1.0 ≥
      // tau), plus a cold cluster of one base copied 100×
      val bases = Seq(Seq(1.0, 0.0), Seq(0.92, 0.39), Seq(0.98, 0.2))
      val hot = (0L until 900L).map(i => (i, bases((i % 3).toInt)))
      val cold = (900L until 1000L).map(i => (i, Seq(0.0, 1.0)))
      val corpus = (hot ++ cold).toDF("id", "vec").repartition(8)
      val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
      val out = Dedup.semanticGroups(corpus, cents, tau = 0.99)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("keep")).toMap
      assert(out.size == 1000)
      val keepers = out.filter(_._2 == 1L).keys.toSet
      assert(keepers == Set(0L, 1L, 2L, 900L), keepers.toSeq.sorted.take(10))
      // plan evidence: the same hot-key self-join, run standalone, gets
      // its skewed partition SPLIT by AQE instead of one task computing
      // all ~405k hot-cluster pairs
      val assigned = corpus.withColumn("cid",
        VectorOps.nearestCentroid(col("vec"), cents))
      val pairs = assigned.as("a")
        .join(assigned.as("b"),
          col("a.cid") === col("b.cid") && col("a.id") > col("b.id"))
        .filter(VectorOps.cosine(col("a.vec"), col("b.vec")) >= 0.99)
        .select(col("a.id").as("id")).distinct()
      pairs.collect()
      val plan = pairs.queryExecution.executedPlan.toString
      assert("skew=true|skewed".r.findFirstIn(plan).nonEmpty, plan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("text: bigram LM score matches hand-computed smoothed conditionals, " +
       "zero-bigram docs take the defined-empty branch") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs).orderBy("doc_id").collect()
    // corpus: c(a b)=3, c(b a)=1, c(b c)=1; c(a·)=3, c(b·)=2; V=4
    val pAB = 4.0 / 7.0; val pBA = 2.0 / 6.0; val pBC = 2.0 / 6.0
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    assert(out(0).getAs[Long]("n_bigrams") == 3L)
    assert(close(out(0).getAs[Double]("bigram_score"),
      -(math.log(pAB) + math.log(pBA) + math.log(pAB)) / 3))
    assert(out(1).getAs[Long]("n_bigrams") == 2L)
    assert(close(out(1).getAs[Double]("bigram_score"),
      -(math.log(pAB) + math.log(pBC)) / 2))
    assert(out(2).getAs[Long]("n_bigrams") == 0L)
    assert(out(2).getAs[Double]("bigram_score") == 0.0)
  }

  test("text: Kneser-Ney bigram LM matches a hand-rolled reference and " +
       "its conditionals sum to 1 per context") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    // types: (a b)=3, (b a)=1, (b c)=1; contexts: a->(c=3,n1p=1),
    // b->(c=2,n1p=2); continuations: a=1, b=1, c=1; n_types=3
    val d = 0.75
    def pkn(c: Long, cW1: Long, n1pW1: Long, n1pW2: Long): Double =
      math.max(c - d, 0.0) / cW1 + (d * n1pW1 / cW1) * (n1pW2.toDouble / 3)
    val pAB = pkn(3, 3, 1, 1); val pBA = pkn(1, 2, 2, 1); val pBC = pkn(1, 2, 2, 1)
    // context b gives up mass 2*(1-d)/2 and redistributes d*2/2 over the
    // continuation distribution (which sums to 1): total probability 1
    assert(math.abs((1 - d) / 2 * 2 + d * 2 / 2 * 1.0 - 1.0) < 1e-12)
    def fp(p: Double) = math.floor(-math.log(p) * 1048576.0).toLong
    val out = TextAnalysis.knBigramLmScore(docs).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("score_fp_sum")))
    assert(out.toSeq == Seq(
      (1L, 3L, 2 * fp(pAB) + fp(pBA)),
      (2L, 2L, fp(pAB) + fp(pBC)),
      (3L, 0L, 0L)))
  }

  test("text: trigram LM matches a hand-rolled interpolated reference, " +
       "short docs take the defined-empty branch") {
    val docsSeq = Seq((1L, "a b a b a"), (2L, "a b c"), (3L, "x y"))
    val docs = docsSeq.toDF("doc_id", "text")
    val out = TextAnalysis.trigramLmScore(docs).orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_trigrams"),
        r.getAs[Long]("score_fp_sum")))
    // reference: same counts and same IEEE order, computed locally
    val wordsOf = docsSeq.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    def grams(ws: Seq[String], n: Int) = ws.sliding(n).filter(_.size == n)
      .map(_.mkString(" ")).toSeq
    val allWs = wordsOf.values.toSeq
    val cT = allWs.flatMap(grams(_, 3)).groupBy(identity).map { case (g, x) => g -> x.size }
    val cB = allWs.flatMap(grams(_, 2)).groupBy(identity).map { case (g, x) => g -> x.size }
    val cU = allWs.flatten.groupBy(identity).map { case (w, x) => w -> x.size }
    val cX2 = cT.groupBy(_._1.split(" ").take(2).mkString(" "))
      .map { case (p, m) => p -> m.values.sum }
    val cX1 = cB.groupBy(_._1.split(" ").head).map { case (p, m) => p -> m.values.sum }
    val ntok = allWs.map(_.size).sum
    val vsz = cU.size
    def fp(tg: String): Long = {
      val p = tg.split(" ")
      val kv = 1.0 * vsz
      val p3 = (cT(tg) + 1.0) / (cX2(p.take(2).mkString(" ")) + kv)
      val p2 = (cB(p.drop(1).mkString(" ")) + 1.0) / (cX1(p(1)) + kv)
      val p1 = (cU(p(2)) + 1.0) / (ntok + kv)
      math.floor(-math.log(0.6 * p3 + 0.3 * p2 + 0.1 * p1) * 1048576.0).toLong
    }
    val expected = docsSeq.map { case (id, _) =>
      val tgs = grams(wordsOf(id), 3)
      (id, tgs.size.toLong, tgs.map(fp).sum)
    }
    assert(out.toSeq == expected)
    assert(out(2) == ((3L, 0L, 0L))) // < 3 words → defined-empty
  }

  test("text: tfidf neighbors rank by shared rare terms and respect the " +
       "df cap") {
    val docs = Seq(
      (0L, "zebra quark common common"),
      (1L, "zebra quark common"),      // shares both rare terms with 0
      (2L, "zebra common common"),     // shares one
      (3L, "common common common"),    // only the capped/common term
      (4L, "unrelated words entirely"))
      .toDF("doc_id", "text")
    // maxDf = 3 prunes "common" (df 4); zebra df 3 stays, quark df 2 stays
    val out = TextAnalysis.tfidfNeighbors(docs, nQueries = 1, k = 3, maxDf = 3)
      .orderBy("rank").collect()
    // candidates of query 0: doc1 (zebra+quark), doc2 (zebra); doc3
    // survives ONLY via common, which is pruned → absent; doc4 disjoint
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    assert(out.map(_.getAs[Long]("score_fp")).forall(_ > 0))
    assert(out(0).getAs[Long]("score_fp") > out(1).getAs[Long]("score_fp"))
  }

  test("vectors: PQ round-trip — codes address the nearest subspace " +
       "centroid and ADC recovers the true neighbor on separable data") {
    // two blobs in each 2-dim subspace; ids 0,1 double as the k=2 seeds
    val corpus = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 1.0)),
      (1L, Seq(0.0, 1.0, 1.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.1, 0.9)),   // same blobs as 0
      (3L, Seq(0.1, 0.9, 0.9, 0.1)))   // same blobs as 1
      .toDF("id", "vec")
    val cbs = VectorOps.pqTrain(corpus, m = 2, k = 2, maxIter = 2)
    assert(cbs.size == 2 && cbs.forall(_.size == 2))
    val enc = VectorOps.pqEncode(corpus, cbs)
    val codes = enc.orderBy("id").collect()
      .map(r => seqOf[Int](r, "codes"))
    // 0 and 2 share every subspace code; 1 and 3 likewise; the blobs differ
    assert(codes(0) == codes(2) && codes(1) == codes(3))
    assert(codes(0) != codes(1))
    // ADC: query 0's best approximate-dot neighbor is its blob-mate 2
    val q = corpus.filter(col("id") === 0L)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val nn = VectorOps.pqAdcTopK(enc, q, cbs, 1).collect()
    assert(nn.length == 1 && nn.head.getAs[Long]("id") == 2L)
  }

  test("vectors: IVF+PQ probes prune to the query's blob and ADC ranks " +
       "its members") {
    // blob A near (1,0,0,1), blob B near (0,1,1,0); coarse k=2 separates
    val corpus = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 1.0)),
      (1L, Seq(0.0, 1.0, 1.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.1, 0.9)),
      (3L, Seq(0.1, 0.9, 0.9, 0.1)),
      (4L, Seq(0.8, 0.2, 0.2, 0.8))).toDF("id", "vec")
    val seeds = corpus.filter(col("id") < 2).orderBy("id").collect()
      .map(r => (r.getLong(0).toInt, r.getAs[scala.collection.Seq[Double]](1).toSeq)).toSeq
    val (coarse, _, _) = VectorOps.kmeansTrain(corpus, seeds, maxIter = 2)
    val cbs = VectorOps.pqTrain(corpus, m = 2, k = 2, maxIter = 2)
    val q = corpus.filter(col("id") === 0L)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val nn = VectorOps.ivfPqTopK(corpus, q, coarse, cbs, nprobe = 1, k = 5)
      .orderBy("rank").collect()
    // nprobe=1 → only blob A's cluster is searched: ids 2 and 4, never 1/3
    assert(nn.map(_.getAs[Long]("id")).toSet == Set(2L, 4L))
  }

  test("vectors: L2 assignment separates by magnitude where cosine cannot, " +
       "and the L2 Lloyd step takes exact fixed-point cluster means") {
    // all four vectors share ONE direction — cosine ties everything to
    // cid 0; squared-L2 splits small from large magnitudes
    val corpus = Seq(
      (0L, Seq(0.1, 0.0)), (1L, Seq(10.0, 0.0)),
      (2L, Seq(0.2, 0.0)), (3L, Seq(9.0, 0.0))).toDF("id", "vec")
    val cents = Seq((0, Seq(0.1, 0.0)), (1, Seq(10.0, 0.0)))
    val a = corpus.select(col("id"),
        VectorOps.nearestCentroidL2(col("vec"), cents).as("l2"),
        VectorOps.nearestCentroid(col("vec"), cents).as("cos"))
      .orderBy("id").collect()
    assert(a.map(_.getAs[Int]("l2")).toSeq == Seq(0, 1, 0, 1))
    assert(a.map(_.getAs[Int]("cos")).toSeq == Seq(0, 0, 0, 0))
    // one L2 Lloyd step: exact integer component sums per cluster
    val step = VectorOps.kmeansStep(corpus, cents, l2 = true)
      .orderBy("cid", "pos").collect()
      .map(r => (r.getAs[Int]("cid"), r.getAs[Int]("pos"),
        r.getAs[Long]("n"), r.getAs[Long]("msum")))
    assert(step.toSeq == Seq(
      (0, 1, 2L, 104857L + 209715L),   // {0.1, 0.2} on the 2^20 grid
      (0, 2, 2L, 0L),
      (1, 1, 2L, 10485760L + 9437184L), // {10.0, 9.0}
      (1, 2, 2L, 0L)))
  }

  test("vectors: the OPQ rotation is orthonormal and preserves dot " +
       "products through randomProjection") {
    val r = VectorOps.orthogonalMatrix(8, seed = 99L)
    for (i <- 0 until 8; j <- 0 until 8) {
      val d = r(i).zip(r(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-12, s"($i,$j)=$d")
    }
    val v = Seq((1L, Seq(1.0, 2.0, -3.0, 0.5, 4.0, -1.0, 0.0, 2.5)),
      (2L, Seq(0.5, -2.0, 1.0, 3.0, -0.5, 1.5, 2.0, -1.0))).toDF("id", "vec")
    val rot = v.select(col("id"),
      VectorOps.randomProjection(col("vec"), r).as("vec"))
    val dot0 = v.agg(sum(VectorOps.dot(col("vec"), col("vec")))).head().getDouble(0)
    val dotR = rot.agg(sum(VectorOps.dot(col("vec"), col("vec")))).head().getDouble(0)
    assert(math.abs(dot0 - dotR) < 1e-9, s"$dot0 vs $dotR")
  }

  test("vectors: stored IVF+PQ index searches identically to the inline " +
       "path and physically prunes unprobed cluster directories") {
    val corpus = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 1.0)),
      (1L, Seq(0.0, 1.0, 1.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.1, 0.9)),
      (3L, Seq(0.1, 0.9, 0.9, 0.1)),
      (4L, Seq(0.8, 0.2, 0.2, 0.8))).toDF("id", "vec")
    val seeds = corpus.filter(col("id") < 2).orderBy("id").collect()
      .map(r => (r.getLong(0).toInt, r.getAs[scala.collection.Seq[Double]](1).toSeq)).toSeq
    val (coarse, _, _) = VectorOps.kmeansTrain(corpus, seeds, maxIter = 2)
    val cbs = VectorOps.pqTrain(corpus, m = 2, k = 2, maxIter = 2)
    val q = corpus.filter(col("id") === 0L)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val path = java.nio.file.Files.createTempDirectory("graft_idx_spec")
      .toString + "/index"
    VectorOps.writeIvfPqIndex(corpus, coarse, cbs, path)
    val index = spark.read.parquet(path)
    val stored = VectorOps.ivfPqSearchStored(index, q, coarse, cbs,
      nprobe = 1, k = 5)
    val inline = VectorOps.ivfPqTopK(corpus, q, coarse, cbs, nprobe = 1, k = 5)
    assert(stored.orderBy("rank").collect().toSeq ==
      inline.orderBy("rank").collect().toSeq)
    // physical pruning: the scan carries a static cid partition predicate
    // selecting 1 of the 2 cluster directories on disk
    val phys = stored.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scan = phys.collectLeaves().collectFirst {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.partitionFilters.exists(_.references.exists(_.name == "cid")) => sc
    }.getOrElse(fail("no cid-filtered index scan in the stored-search plan"))
    val staticPf = scan.partitionFilters.filterNot(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]))
    assert(staticPf.nonEmpty, scan.partitionFilters.toString)
    assert(scan.relation.location.listFiles(staticPf, Nil).length == 1)
    assert(scan.relation.location.listFiles(Nil, Nil).length == 2)
  }

  test("vectors: PQ reconstruction error is zero exactly when every " +
       "vector sits on its centroid") {
    // two distinct vectors, duplicated: k=2 training lands centroids ON
    // them (grid means of identical values are exact), so decode is lossless
    val clean = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0))).toDF("id", "vec")
    val cbs = VectorOps.pqTrain(clean, m = 1, k = 2, maxIter = 2)
    val errs = VectorOps.pqReconError(clean, cbs)
      .collect().map(_.getAs[Long]("err_fp"))
    assert(errs.forall(_ == 0L), errs.toSeq)
    // an off-centroid vector reconstructs with positive loss
    val noisy = clean.unionByName(
      Seq((4L, Seq(0.6, 0.4))).toDF("id", "vec"))
    val cbs2 = VectorOps.pqTrain(clean, m = 1, k = 2, maxIter = 2)
    val e4 = VectorOps.pqReconError(noisy, cbs2)
      .filter(col("id") === 4L).head().getAs[Long]("err_fp")
    assert(e4 > 0L)
  }

  test("vectors: cluster purity reports majority label with lowest-label " +
       "tie break and exact counts") {
    val assigned = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1), (5L, 1))
      .toDF("id", "cid")
    val labels = Seq((1L, 7L), (2L, 7L), (3L, 2L), (4L, 9L), (5L, 3L))
      .toDF("id", "label")
    val out = VectorOps.clusterPurity(assigned, labels)
      .orderBy("cid").collect()
    // cluster 0: label 7 ×2 beats 2 ×1; cluster 1: 1-1 tie → lower label 3
    assert(out(0).getAs[Long]("n") == 3L)
    assert(out(0).getAs[Long]("top_label") == 7L)
    assert(out(0).getAs[Long]("top_n") == 2L)
    assert(out(1).getAs[Long]("n") == 2L)
    assert(out(1).getAs[Long]("top_label") == 3L)
    assert(out(1).getAs[Long]("top_n") == 1L)
  }

  test("sampling: rank buckets equal the single-node ntile on a total order") {
    // duplicate scores force the id tie-break; 10 rows / 3 buckets → 4,3,3
    val scored = Seq((7L, 30L), (1L, 10L), (2L, 10L), (3L, 20L), (4L, 5L),
      (5L, 30L), (6L, 20L), (8L, 1L), (9L, 40L), (10L, 2L))
      .toDF("doc_id", "score_fp")
    val out = Sampling.rankBuckets(scored, 3, "score_fp", "doc_id")
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank"),
        r.getAs[Long]("bucket")))
    val expectOrder = Seq(8L, 10L, 4L, 1L, 2L, 3L, 6L, 5L, 7L, 9L)
    assert(out.map(_._1).toSeq == expectOrder)
    assert(out.map(_._2).toSeq == (1L to 10L))
    assert(out.map(_._3).toSeq ==
      Seq(1L, 1L, 1L, 1L, 2L, 2L, 2L, 3L, 3L, 3L))
    // one bucket degenerates to a pure rank
    val one = Sampling.rankBuckets(scored, 1, "score_fp", "doc_id")
      .select("bucket").distinct().collect()
    assert(one.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("sampling: rank buckets on empty input return an empty frame with " +
       "the right schema, not a division error") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "score_fp")
    val out = Sampling.rankBuckets(empty, 3, "score_fp", "doc_id")
    assert(out.columns.toSeq == Seq("id", "score", "rank", "bucket"))
    assert(out.count() == 0)
  }

  test("dedup: semantic groups with no near-dups keep everything") {
    // other operators (the LM scorers) legitimately leave persisted type
    // tables behind for the harness to clear between entries — empty the
    // cache first so the emptiness assertion pins semanticGroups' OWN
    // release-early contract, not suite ordering
    spark.sharedState.cacheManager.clearCache()
    val corpus = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("id", "vec")
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    val out = Dedup.semanticGroups(corpus, cents, tau = 0.95)
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("keep")).toSeq == Seq(1L, 1L))
    assert(corpus.sparkSession.sharedState.cacheManager.isEmpty)
  }

  test("sampling: rank buckets match a local reference on seeded random " +
       "data across bucket counts") {
    val rnd = new scala.util.Random(7)
    // heavy score duplication to stress the id tie-break across partitions
    val rows = (1L to 257L).map(i => (i, rnd.nextInt(12).toLong))
    val df = rows.toDF("doc_id", "score_fp").repartition(7)
    for (nb <- Seq(2, 3, 5)) {
      val got = Sampling.rankBuckets(df, nb, "score_fp", "doc_id")
        .orderBy("rank").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank"),
          r.getAs[Long]("bucket")))
      val ref = rows.sortBy { case (id, s) => (s, id) }.zipWithIndex
        .map { case ((id, _), i) => (id, i + 1L, i * nb / rows.size + 1L) }
      assert(got.toSeq == ref, s"nb=$nb")
    }
  }

  test("vectors: plain vec-at-rest IVF search equals in-memory IVF at " +
       "the same knobs") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 1.0)),
      (1L, Seq(0.0, 1.0, 1.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.1, 0.9)),
      (3L, Seq(0.1, 0.9, 0.9, 0.1)),
      (4L, Seq(0.8, 0.2, 0.2, 0.8))).toDF("id", "vec")
    val seeds = corpus.filter(col("id") < 2).orderBy("id").collect()
      .map(r => (r.getLong(0).toInt,
        r.getAs[scala.collection.Seq[Double]](1).toSeq)).toSeq
    val q = corpus.filter(col("id") === 0L)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val path = java.nio.file.Files.createTempDirectory("graft_ivfvec_spec")
      .toString + "/index"
    VectorOps.writeIvfIndex(corpus, seeds, path)
    val stored = VectorOps.ivfSearchStored(spark.read.parquet(path), q,
        seeds, nprobe = 1, k = 5)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("id"), r.getAs[Double]("cos")))
    val mem = VectorOps.ivfTopK(corpus, q, seeds, nprobe = 1, k = 5)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank"),
        r.getAs[Long]("id"), r.getAs[Double]("cos")))
    assert(stored.nonEmpty && stored.sameElements(mem))
  }

  test("vectors: index tombstones mask deleted ids at search and " +
       "compaction removes their bytes and the tombstone files") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 1.0)),
      (1L, Seq(0.0, 1.0, 1.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.1, 0.9)),
      (3L, Seq(0.1, 0.9, 0.9, 0.1)),
      (4L, Seq(0.8, 0.2, 0.2, 0.8))).toDF("id", "vec")
    val seeds = corpus.filter(col("id") < 2).orderBy("id").collect()
      .map(r => (r.getLong(0).toInt, r.getAs[scala.collection.Seq[Double]](1).toSeq)).toSeq
    val (coarse, _, _) = VectorOps.kmeansTrain(corpus, seeds, maxIter = 2)
    val cbs = VectorOps.pqTrain(corpus, m = 2, k = 2, maxIter = 2)
    val q = corpus.filter(col("id") === 0L)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val path = java.nio.file.Files.createTempDirectory("graft_del_spec")
      .toString + "/index"
    VectorOps.writeIvfPqIndex(corpus, coarse, cbs, path)
    def ids() = VectorOps.ivfPqSearchStored(
        VectorOps.readIvfPqIndex(spark, path), q, coarse, cbs,
        nprobe = 1, k = 5)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(ids() == Set(2L, 4L))
    VectorOps.deleteFromIvfPqIndex(Seq(2L).toDF("id"), path)
    // masked immediately, while the bytes are still on disk
    assert(ids() == Set(4L))
    assert(spark.read.parquet(path).filter(col("id") === 2L).count() == 1)
    VectorOps.compactIvfPqIndex(spark, path)
    // physically gone, tombstone dir swapped away, search unchanged
    assert(spark.read.parquet(path).filter(col("id") === 2L).count() == 0)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "/_tombstones")))
    assert(ids() == Set(4L))
  }

  test("vectors: trained OPQ rotation stays orthogonal and does not " +
       "increase reconstruction error vs the seed rotation") {
    import spark.implicits._
    // anisotropic 4-d corpus (strong cross-subspace correlation) so the
    // rotation update has signal to exploit
    val corpus = (0 until 40).map { i =>
      val t = i * 0.37
      (i.toLong, Seq(math.sin(t), 2.0 * math.sin(t) + 0.1 * math.cos(3 * t),
        math.cos(t), 2.0 * math.cos(t) + 0.1 * math.sin(2 * t)))
    }.toDF("id", "vec")
    val seed = VectorOps.orthogonalMatrix(4, seed = 7L)
    val (rot, cbs) = VectorOps.opqTrain(corpus, m = 2, k = 4,
      opqIters = 2, kmeansIters = 3, seedRot = seed)
    // orthogonality: R·Rᵀ = I
    val dev = (for (a <- 0 until 4; b <- 0 until 4) yield {
      val dotRow = (0 until 4).map(i => rot(a)(i) * rot(b)(i)).sum
      math.abs(dotRow - (if (a == b) 1.0 else 0.0))
    }).max
    assert(dev < 1e-9, s"rotation not orthogonal, max dev $dev")
    def reconFp(r: Seq[Seq[Double]], c: Seq[Seq[(Int, Seq[Double])]]) = {
      val rotated = corpus.select(col("id"),
        VectorOps.randomProjection(col("vec"), r).as("vec"))
      VectorOps.pqReconError(rotated, c, l2 = true)
        .agg(sum(col("err_fp"))).head().getLong(0)
    }
    val seedCbs = VectorOps.pqTrain(
      corpus.select(col("id"),
        VectorOps.randomProjection(col("vec"), seed).as("vec")),
      m = 2, k = 4, maxIter = 3, l2 = true)
    assert(reconFp(rot, cbs) <= reconFp(seed, seedCbs))
  }

  test("vectors: residualCorpus subtracts the assigned coarse centroid " +
       "element-wise") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),
      (2L, Seq(0.8, 0.2))).toDF("id", "vec")
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    val res = VectorOps.residualCorpus(corpus, cents)
      .orderBy("id").collect()
    // id 2 lands on centroid 0; its residual is (0.8-1.0, 0.2-0.0)
    assert(res(2).getAs[Int]("cid") == 0)
    assert(seqOf[Double](res(2), "vec") == Seq(0.8 - 1.0, 0.2 - 0.0))
    // exact-centroid rows have zero residual
    assert(seqOf[Double](res(0), "vec") == Seq(0.0, 0.0))
    assert(seqOf[Double](res(1), "vec") == Seq(0.0, 0.0))
  }

  test("vectors: residual IVF+PQ prunes to the probed blob and scores " +
       "dot(q, centroid) + residual LUT sum") {
    import spark.implicits._
    // blob A near (1,0,0,1), blob B near (0,1,1,0)
    val corpus = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 1.0)),
      (1L, Seq(0.0, 1.0, 1.0, 0.0)),
      (2L, Seq(0.9, 0.1, 0.1, 0.9)),
      (3L, Seq(0.1, 0.9, 0.9, 0.1)),
      (4L, Seq(0.8, 0.2, 0.2, 0.8))).toDF("id", "vec")
    val seeds = corpus.filter(col("id") < 2).orderBy("id").collect()
      .map(r => (r.getLong(0).toInt, r.getAs[scala.collection.Seq[Double]](1).toSeq)).toSeq
    val (coarse, _, _) = VectorOps.kmeansTrain(corpus, seeds, maxIter = 2)
    val rcbs = VectorOps.pqTrainResidual(corpus, coarse, m = 2, k = 2,
      maxIter = 2)
    val q = corpus.filter(col("id") === 0L)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val nn = VectorOps.ivfPqResidualTopK(corpus, q, coarse, rcbs,
      nprobe = 1, k = 5).orderBy("rank").collect()
    // nprobe=1 → only blob A's cluster is searched: ids 2 and 4, never 1/3
    assert(nn.map(_.getAs[Long]("id")).toSet == Set(2L, 4L))
    // every candidate in the probed cluster shares the coarse constant,
    // so scores differ only by the residual LUT sums — and a candidate
    // whose residual is closer to the query's must rank first
    assert(nn.head.getAs[Long]("id") == 2L)
  }

  test("vectors: nearestCentroid tie-breaks to the lowest cid regardless " +
       "of caller centroid order") {
    import spark.implicits._
    val corpus = Seq((0L, Seq(1.0, 0.0))).toDF("id", "vec")
    // two identical centroids handed over in DESCENDING cid order: the
    // documented contract (ties → lowest cid) must still hold
    val cents = Seq((7, Seq(1.0, 0.0)), (3, Seq(1.0, 0.0)))
    val cos = corpus.select(
      VectorOps.nearestCentroid(col("vec"), cents).as("c")).head().getInt(0)
    val l2c = corpus.select(
      VectorOps.nearestCentroidL2(col("vec"), cents).as("c")).head().getInt(0)
    assert(cos == 3 && l2c == 3)
  }

  test("vectors: SQ8 codes stay on the 256-grid, degenerate dims encode " +
       "to zero, and grid-representable corpora search exactly") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(0.0, 255.0, 7.0)),
      (1L, Seq(255.0, 0.0, 7.0)),
      (2L, Seq(128.0, 64.0, 7.0))).toDF("id", "vec")
    val bounds = VectorOps.sqTrain(corpus)
    assert(bounds == Seq((0.0, 255.0), (0.0, 255.0), (7.0, 7.0)))
    val enc = VectorOps.sqEncode(corpus, bounds).orderBy("id").collect()
    // values on the grid encode losslessly; the constant dim → code 0
    assert(seqOf[Int](enc(2), "codes") == Seq(128, 64, 0))
    // dequantization is exact here (grid values + degenerate dim back to
    // its constant), so asymmetric search must equal exact dot ranking:
    // q=(0,255,7): dot(1)=7·7=49, dot(2)=255·64+49=16369
    val q = corpus.filter(col("id") === 0L)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val nn = VectorOps.sqTopK(VectorOps.sqEncode(corpus, bounds), q,
      bounds, 2).orderBy("rank").collect()
    assert(nn.map(r => (r.getInt(1), r.getLong(2))).toSeq ==
      Seq((1, 2L), (2, 1L)))
    assert(math.abs(nn(0).getDouble(3) - 16369.0) < 1e-9)
  }

  test("text: BPE learns the Sennrich-example merges in order") {
    import spark.implicits._
    // word types: low:3 lower:2 newest:4 widest:1 — by hand, the first
    // merge is (w,e) at weighted count 6; after applying it, three pairs
    // tie at 5 and (l,o) wins on the ASCII encoded-pair order
    val docs = Seq((1L,
      "low low low lower lower newest newest newest newest widest"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, 2).orderBy("step").collect()
    assert(m.map(r => (r.getLong(0), r.getString(1), r.getString(2),
      r.getLong(3))).toSeq == Seq(
      (1L, "<w> <e>", "<we>", 6L),
      (2L, "<l> <o>", "<lo>", 5L)))
  }

  test("text: BPE replace-all equals the greedy left-to-right pass on " +
       "runs, and self-pairs do not cascade") {
    import spark.implicits._
    // 'aaaa' → <a> <a> <a> <a> <_>: pair (a,a) counts 3 per occurrence;
    // replace-all merges positions 1-2 and 3-4 (never the overlapping
    // middle), leaving <aa> <aa> <_> — then '<aa> <_>' beats '<aa> <aa>'
    // on ASCII order at equal count
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, 2).orderBy("step").collect()
    assert(m.map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
      == Seq(("<a> <a>", "<aa>", 6L), ("<aa> <_>", "<aa_>", 2L)))
  }

  test("text: BPE apply tokenizes with the learned merges at the " +
       "hand-computed subword counts, skipping non-alpha tokens") {
    import spark.implicits._
    val docs = Seq((1L,
      "low low low lower lower newest newest newest newest widest x9 !"))
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, 2).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // after (w,e) then (l,o): low→3, lower→4, newest→6, widest→7
    // subword symbols; 'x9' and '!' are not alphabetic words
    val out = TextAnalysis.bpeSubwordCounts(docs, merges).head()
    assert(out.getLong(1) == 10L)
    assert(out.getLong(2) == 3 * 3 + 2 * 4 + 4 * 6 + 7L)
  }

  test("text: perceptron distillation epoch 1 is the summed y*x batch " +
       "update (all-zero weights misclassify everything), reproducibly") {
    import spark.implicits._
    // good doc: 62 distinct words, 2 stop hits, mean len ~3.95, no dup
    // 3-grams → gopher passes and the logit is positive → y = +1.
    // Fixed-point features by hand —
    //   good: [10000, 10000, (10000·245) div 62 = 39516,
    //          (10000·2) div 62 = 322, 6200, 0]
    //   bad ("tiny doc"): [10000, 10000, 35000, 0, 200, 0]
    // w1 = (+1)·good + (−1)·bad = [0, 0, 4516, 322, 6000, 0]
    val good = "the of " + (1 to 60).map(i => f"wd$i%02d").mkString(" ")
    val docs = Seq((1L, good), (2L, "tiny doc")).toDF("doc_id", "text")
    val w1 = TextAnalysis.distillPerceptron(docs, epochs = 1)
      .orderBy("b").collect()
    assert(w1.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 0L), (1L, 0L), (2L, 4516L), (3L, 322L), (4L, 6000L),
        (5L, 0L)))
    // integer trajectory: a re-run is bit-identical
    val w1b = TextAnalysis.distillPerceptron(docs, epochs = 1)
      .orderBy("b").collect()
    assert(w1.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      w1b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // deployment half: margins are the exact integer dot products
    // w1·good = 4516·39516 + 322·322 + 6000·6200 and
    // w1·bad = 4516·35000 + 6000·200
    val preds = TextAnalysis.perceptronScore(docs,
      w1.map(_.getLong(1)).toSeq).orderBy("doc_id").collect()
    assert(preds.map(_.getLong(1)).toSeq == Seq(215757940L, 159260000L))
  }

  test("sampling: DSIR weights rank target-resembling raw docs first " +
       "and define featureless docs as zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta alpha beta", "t"),  // target domain
      (2L, "alpha beta gamma", "t"),       // target domain
      (3L, "alpha beta", "r"),             // raw, resembles target
      (4L, "zeta yota kappa", "r"),        // raw, does not
      (5L, "", "r")                        // raw, featureless
    ).toDF("doc_id", "text", "slice")
    val w = Sampling.dsirWeights(docs, col("slice") === "t", buckets = 32)
      .orderBy("doc_id").collect()
    assert(w.map(_.getLong(0)).toSeq == Seq(3L, 4L, 5L))
    val byId = w.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    // doc 3: 2 unigrams + 1 bigram; doc 5: no features, weight defined 0
    assert(byId(3L)._1 == 3L && byId(4L)._1 == 5L && byId(5L) == ((0L, 0L)))
    // the target-resembling doc must outweigh the disjoint-vocab doc
    assert(byId(3L)._2 > byId(4L)._2)
  }

  test("vectors: rrfFuse sums exact-integer reciprocal ranks and " +
       "promotes items surfaced by both retrievers") {
    import spark.implicits._
    val lexical = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rank")
    val dense = Seq((12L, 1L), (13L, 2L)).toDF("id", "rank")
    val out = VectorOps.rrfFuse(Seq(lexical, dense))
      .collect().map(r => r.getLong(1) -> (r.getLong(0), r.getLong(2), r.getLong(3))).toMap
    def pts(rank: Long) = 1048576L / (60L + rank)
    // 12 appears in both lists: rank-3 + rank-1 beats 10's solo rank-1
    assert(out(12L)._2 == pts(3) + pts(1) && out(12L)._3 == 2L)
    assert(out(10L)._2 == pts(1) && out(10L)._3 == 1L)
    assert(out(12L)._1 == 1L && out(10L)._1 == 2L)
    // remaining order: 11 (rank2 solo) vs 13 (rank2 solo) tie on points
    // → id tie-break
    assert(out(11L)._2 == out(13L)._2 && out(11L)._1 < out(13L)._1)
  }

  test("graph: HITS separates hubs from authorities and zeroes " +
       "disconnected nodes") {
    import spark.implicits._
    // pure hubs {1,2,3} point at authorities {4,5}; 6 is isolated
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val edges = Seq((1L, 4L), (1L, 5L), (2L, 4L), (2L, 5L), (3L, 4L))
      .toDF("src", "dst")
    val out = graft.llm.LinkGraph.hits(nodes, edges, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 4 has 3 in-links from hubs, 5 has 2: auth(4) > auth(5) > 0
    assert(out(4L)._1 > out(5L)._1 && out(5L)._1 > 0)
    // hubs have zero authority; authorities have zero hub score
    assert(Seq(1L, 2L, 3L).forall(out(_)._1 == 0L))
    assert(Seq(4L, 5L).forall(out(_)._2 == 0L))
    // 1 and 2 point at both authorities, 3 only at the stronger one:
    // hub(1) = hub(2) > hub(3) > 0
    assert(out(1L)._2 == out(2L)._2 && out(2L)._2 > out(3L)._2)
    assert(out(3L)._2 > 0)
    // disconnected node: present, both scores zero
    assert(out(6L) == ((0L, 0L)))
  }

  test("multimodal: dHashBmp is brightness-invariant, seed-sensitive, " +
       "and refuses non-BMP or truncated payloads") {
    import spark.implicits._
    val rows = Seq(1L, 2L).toDF("seed").select(col("seed"),
      Multimodal.dHashBmp(Multimodal.patternBmp(col("seed"), 10, 8, 0)).as("h0"),
      Multimodal.dHashBmp(Multimodal.patternBmp(col("seed"), 10, 8, 32)).as("h32"),
      Multimodal.dHashBmp(Multimodal.patternBmp(col("seed"), 16, 8, 0)).as("h16w"))
    // truncated: header claims 10×8 but the body is chopped
    val p = Seq(3L).toDF("seed").select(
      Multimodal.patternBmp(col("seed"), 10, 8, 0).as("payload"))
    val trunc = p.select(
      Multimodal.dHashBmp(expr("substring(payload, 1, 60)")).as("t"),
      Multimodal.dHashBmp(encode(lit("just some text"), "UTF-8")).as("nb"),
      Multimodal.dHashBmp(col("payload")).as("full")).collect()(0)
    assert(trunc.isNullAt(0) && trunc.isNullAt(1))
    assert(trunc.getString(2).length == 16)
    val r = rows.collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getString(2), x.getString(3))).toMap
    // brightness shift: identical hash; different seed or geometry: differs
    assert(r(1L)._1 == r(1L)._2 && r(2L)._1 == r(2L)._2)
    assert(r(1L)._1 != r(2L)._1)
    assert(r(1L)._1 != r(1L)._3)
  }

  test("multimodal: dHashPng decodes a real compressed PNG (inflate + all " +
       "five unfilter types) and agrees with dHashBmp on the same image") {
    import spark.implicits._
    // h = 16 ≥ 5 → filter types 0-4 all appear (row y uses type y mod 5);
    // the pixel field is shared with patternBmp, so the BMP and PNG
    // containers hold the SAME image and the two independent decode
    // paths (stride/bottom-up vs inflate/unfilter/top-down) must agree
    val rows = Seq(1L, 2L).toDF("seed").select(col("seed"),
      Multimodal.dHashPng(Multimodal.patternPng(col("seed"), 16, 16, 0)).as("png0"),
      Multimodal.dHashPng(Multimodal.patternPng(col("seed"), 16, 16, 32)).as("png32"),
      Multimodal.dHashBmp(Multimodal.patternBmp(col("seed"), 16, 16, 0)).as("bmp0"))
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getString(2), x.getString(3))).toMap
    // cross-format agreement, brightness invariance, seed sensitivity
    assert(rows(1L)._1 == rows(1L)._3 && rows(2L)._1 == rows(2L)._3)
    assert(rows(1L)._1 == rows(1L)._2)
    assert(rows(1L)._1 != rows(2L)._1)
    assert(rows(1L)._1.length == 16)

    // refusal: truncated payload (chunk chain walks off the end), garbage
    // bytes, and corrupt zlib data (IDAT bytes zeroed) all hash to null
    val p = Seq(3L).toDF("seed").select(
      Multimodal.patternPng(col("seed"), 16, 16, 0).as("payload"))
    val bad = p.select(
      Multimodal.dHashPng(expr("substring(payload, 1, 80)")).as("t"),
      Multimodal.dHashPng(encode(lit("just some text"), "UTF-8")).as("nb"),
      Multimodal.dHashPng(expr(
        // keep signature+IHDR+IDAT framing, zero the zlib stream bytes
        "concat(substring(payload, 1, 43), " +
        "cast(repeat(chr(0), length(payload) - 43) as binary))")).as("z"),
      Multimodal.dHashPng(col("payload")).as("full")).collect()(0)
    assert(bad.isNullAt(0) && bad.isNullAt(1) && bad.isNullAt(2))
    assert(bad.getString(3).length == 16)

    // hostile zlib: an FDICT header (78 BB — valid check bits, preset-
    // dictionary flag set) makes inflate() return 0 with neither
    // needsInput nor finished; the kernel must refuse (null), not spin
    // the executor thread forever on the zero-progress loop
    val fdict = p.select(Multimodal.dHashPng(expr(
      "concat(substring(payload, 1, 41), X'78BB', " +
      "substring(payload, 44, length(payload) - 43))")).as("d")).collect()(0)
    assert(fdict.isNullAt(0))
  }

  test("multimodal: mjpegFrames splits concatenated JPEGs at real EOI " +
       "markers and refuses broken streams") {
    import spark.implicits._
    val clip = Seq(7L).toDF("seed").select(
      Multimodal.patternMjpeg(col("seed"), 3, 16, 9, 40).as("p"))
    val rows = clip.select(explode(Multimodal.mjpegFrames(col("p"))).as("f"))
      .select(col("f.frame_no"), col("f.off"), col("f.len"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(rows.toSeq == Seq((0, 0, 95), (1, 95, 95), (2, 190, 95)))
    // refusal: not starting at SOI; truncated final frame (EOI cut off)
    val bad = clip.select(
      Multimodal.mjpegFrames(expr("substring(p, 2, length(p) - 1)")).as("a"),
      Multimodal.mjpegFrames(expr("substring(p, 1, length(p) - 1)")).as("b"),
      Multimodal.mjpegFrames(encode(lit("not a jpeg"), "UTF-8")).as("c"))
      .collect()(0)
    assert(bad.isNullAt(0) && bad.isNullAt(1) && bad.isNullAt(2))
  }

  test("multimodal: mjpegFrames skips FF D9 inside an APP1 (EXIF " +
       "thumbnail) payload — segment lengths, not a naive EOI scan") {
    import spark.implicits._
    // SOI | APP1 whose raw payload embeds a fake inner SOI+EOI (the
    // EXIF-thumbnail case) | SOF0 9x16 | SOS | 3 body bytes | EOI
    val hex =
      "FFD8" +
      "FFE1000B" + "4578696600" + "FFD8FFD9" + // APP1 len 11, 'Exif\0' + inner jpeg markers
      "FFC00011" + "08" + "0009" + "0010" + "03" + "012200" + "021101" + "031101" +
      "FFDA000C03010002110311003F00" +
      "010203" +
      "FFD9"
    val rows = Seq(hex).toDF("h")
      .select(explode(Multimodal.mjpegFrames(unhex(col("h")))).as("f"))
      .select(col("f.frame_no"), col("f.off"), col("f.len"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(rows.toSeq == Seq((0, 0, hex.length / 2)))
  }

  test("multimodal: pcmFrameFeatures decodes real RIFF bytes (chunk walk, " +
       "LE int16 sign, word-aligned skip) and refuses non-PCM16 payloads") {
    import spark.implicits._

    // hand-assembled WAV: canonical header builder, little-endian fields
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    def wav(samples: Seq[Int], bits: Int = 16, fmt: Int = 1, nch: Int = 1,
            preChunk: Array[Byte] = Array.empty,
            dataLenOverride: Option[Int] = None): Array[Byte] = {
      val data = samples.flatMap(v => le(v.toLong & 0xffff, 2)).toArray
      val fmtCh = "fmt ".getBytes ++ le(16, 4) ++ le(fmt, 2) ++ le(nch, 2) ++
        le(16000, 4) ++ le(32000, 4) ++ le(2, 2) ++ le(bits, 2)
      val dataCh = "data".getBytes ++
        le(dataLenOverride.getOrElse(data.length).toLong, 4) ++ data
      val body = fmtCh ++ preChunk ++ dataCh
      "RIFF".getBytes ++ le(body.length + 4L, 4) ++ "WAVE".getBytes ++ body
    }

    val samples = Seq(100, -200, 300, -400, 0, 50, -50, 32767)
    // an odd-sized junk chunk between fmt and data exercises the RIFF
    // word-alignment rule (size 3 chunk occupies 4 bytes)
    val junk = "LIST".getBytes ++ le(3, 4) ++ Array[Byte](1, 2, 3, 0)
    val rows = Seq(
      (1L, wav(samples)),                           // plain
      (2L, wav(samples, preChunk = junk)),          // chunk walk
      (3L, wav(samples, bits = 8)),                 // non-16-bit → null
      (4L, wav(samples, fmt = 3)),                  // float PCM → null
      (5L, "just some text".getBytes("UTF-8")),     // not RIFF → null
      // header claims 8 samples but only 6 are present → 1 full frame
      (6L, wav(samples, dataLenOverride = Some(16)).dropRight(4)),
      // stereo: interleaved channels would corrupt zcr → refused
      (7L, wav(samples, nch = 2)),
      // corrupt unsigned chunk size (0xFFFFFFF8): the walk must run off
      // the end and return null, not loop forever or crash on a
      // truncated-int advance
      (8L, "RIFF".getBytes ++ le(100, 4) ++ "WAVE".getBytes ++
        "JUNK".getBytes ++ le(0xFFFFFFF8L, 4) ++ new Array[Byte](16)))
      .toDF("id", "payload")
      .select(col("id"), Multimodal.pcmFrameFeatures(col("payload"), 4).as("f"))
      .orderBy("id").collect()

    def frames(i: Int): Seq[Row] = seqOf[Row](rows(i), "f")
    // frame 0: sumSq = 100²+200²+300²+400² = 300000; all adjacent pairs flip
    val f0 = frames(0).head
    assert(f0.getInt(0) == 0)
    assert(math.abs(f0.getDouble(1) - math.sqrt(300000.0 / 4)) < 1e-12)
    assert(f0.getInt(2) == 400 && f0.getInt(3) == 3)
    // frame 1: peak at full scale, zcr counts only sign-bit changes
    val f1 = frames(0)(1)
    assert(f1.getInt(0) == 1)
    assert(math.abs(f1.getDouble(1) - math.sqrt(1073681289.0 / 4)) < 1e-12)
    assert(f1.getInt(2) == 32767 && f1.getInt(3) == 2)
    // junk chunk before data: identical features
    assert(frames(1) == frames(0))
    // non-PCM16 / non-RIFF: null, not garbage
    assert(rows(2).isNullAt(1) && rows(3).isNullAt(1) && rows(4).isNullAt(1))
    // truncated data chunk: only the frame its actual bytes cover
    assert(frames(5).size == 1 && frames(5).head == f0)
    // stereo and corrupt-chunk-size payloads: null, not garbage/crash
    assert(rows(6).isNullAt(1) && rows(7).isNullAt(1))
  }

  test("text: compressionRatio separates repetition from noise, nulls on " +
       "empty text, and the kernel is genuine raw deflate at level 6") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rep = ("spam " * 300).trim
    val noise = (0 until 20).map(i => md5hex(s"seed_$i")).mkString
    val out = Seq((1L, rep), (2L, noise), (3L, ""))
      .toDF("id", "text")
      .select(col("id"), TextAnalysis.compressionRatio(col("text")).as("r"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) < 0.1)
    assert(out(1).getDouble(1) > 0.3 && out(1).getDouble(1) < 0.9)
    assert(out(0).getDouble(1) < out(1).getDouble(1))
    assert(out(2).isNullAt(1))
    // the kernel is the real thing: exact agreement with an
    // independently-constructed raw Deflater at the documented settings
    val ref = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(noise.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      val n = d.deflate(buf); d.end(); n
    }
    val got = Seq(noise).toDF("t")
      .select(expr("deflate_len(encode(t, 'UTF-8'))")).collect()(0).getInt(0)
    assert(got == ref)
  }

  test("text: unigram tokenizer — Viterbi hand cases, EM non-decreasing " +
       "likelihood, lossless coverage, bit-identical retrain") {
    import spark.implicits._
    // hand model: exact path scores are checkable by hand
    val pp = Seq("a", "ab", "b", "bc", "c")
    val lp = Seq(-3.0, -1.0, -3.0, -2.5, -3.0)
    val probes = Seq("abc", "bab", "cabc", "axc").toDF("w")
      .select(col("w"), graft.GraftExtensions.unigramSegment(
        col("w"), pp, lp).as("seg"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else seqOf[String](r, "seg"))).toMap
    assert(probes("abc") == Seq("ab", "c"))   // -4 beats a|bc at -5.5
    assert(probes("bab") == Seq("b", "ab"))
    assert(probes("cabc") == Seq("c", "ab", "c"))
    assert(probes("axc") == null)             // 'x' not in vocab: refuse

    // EM on a corpus dominated by 'ab': the piece survives pruning and
    // outweighs its single-char decomposition
    val docs = Seq(
      (1L, "abab abab cd"), (2L, "abab ab cd"), (3L, "ab cd ab"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.unigramTrain(docs, vocabSize = 8, rounds = 4)
    val byPiece = m.pieces.zip(m.logps).toMap
    assert(byPiece.contains("ab"))
    assert(byPiece("ab") > byPiece("a"))
    // EM guarantee once the inventory freezes after round 1
    m.llByRound.drop(1).sliding(2).foreach {
      case scala.collection.Seq(a, b) =>
        assert(b >= a - 1e-6 * (1 + math.abs(a)), s"LL dropped: $a -> $b")
      case _ =>
    }
    // coverage: every corpus word round-trips losslessly
    val stats = TextAnalysis.unigramSegmentStats(docs, m.pieces, m.logps)
      .collect()
    assert(stats.forall(_.getAs[Boolean]("lossless")))
    assert(stats.forall(r =>
      r.getAs[Long]("n_pieces") >= r.getAs[Long]("n_alpha_words")))
    // fixed-point E-step sums are longs: retraining is bit-identical
    val m2 = TextAnalysis.unigramTrain(docs, vocabSize = 8, rounds = 4)
    assert(m2.pieces == m.pieces && m2.logps == m.logps &&
      m2.llByRound == m.llByRound)
  }

  test("dedup: lineDedup drops every occurrence of an over-threshold " +
       "line, keeps order, and passes untouched docs through verbatim") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cookie banner\nreal content one\ncookie banner"),
      (2L, "cookie banner\nreal content two"),
      (3L, "unique a\nunique b"),
      (4L, "cookie banner")
    ).toDF("doc_id", "text")
    // "cookie banner" occurs 4 times > 3 → dropped everywhere
    val out = Dedup.lineDedup(docs, maxOccurrences = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "real content one")
    assert(out(0).getLong(2) == 3L && out(0).getLong(3) == 2L)
    assert(out(1).getString(1) == "real content two")
    assert(out(2).getString(1) == "unique a\nunique b")
    assert(out(2).getLong(3) == 0L)
    assert(out(3).getString(1) == "" && out(3).getLong(3) == 1L)
    // threshold not reached → nothing dropped
    val none = Dedup.lineDedup(docs, maxOccurrences = 4)
      .agg(sum(col("n_dropped"))).collect()(0).getLong(0)
    assert(none == 0L)
  }

  test("text: normalizeText composes NFC, strips invisibles/controls, " +
       "canonicalizes line endings, and collapses horizontal whitespace") {
    import spark.implicits._
    // 'cafe' + COMBINING ACUTE (decomposed é), zero-width space, CRLF,
    // BEL, tab run, per-line edge spaces
    val messy = "  cafe\u0301\u200B menu\r\nline\u0007\ttwo  end "
    val out = Seq((1L, messy), (2L, "plain ascii"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.normalizeText(col("text")).as("n"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "café menu\nline two end")
    // ASCII fast path: byte-identical passthrough
    assert(out(1).getString(1) == "plain ascii")
    // composed and decomposed spellings hash together after normalization
    val both = Seq(("café", 1), ("café", 2)).toDF("t", "i")
      .select(TextAnalysis.normalizeText(col("t")).as("n")).distinct().count()
    assert(both == 1L)
  }

  test("crawl: canonicalizeUrl collapses case/www/default-port/tracking/" +
       "param-order/fragment/trailing-slash aliases and keeps real " +
       "distinctions") {
    import spark.implicits._
    val urls = Seq(
      (1L, "HTTPS://WWW.Example.COM:443/a/b/?utm_source=f&id=7#top"),
      (2L, "https://example.com/a/b?id=7&utm_campaign=x&ref=rss"),
      (3L, "https://example.com/a/b?id=7&z=2"),       // extra real param
      (4L, "https://example.com:8443/a/b?id=7"),      // non-default port
      (5L, "http://example.com:80/"),                 // default http port
      (6L, "https://example.com/a/b?z=2&id=7"),       // param order only
      (7L, "not a url at all")
    ).toDF("id", "url")
      .select(col("id"), graft.llm.CrawlOps.canonicalizeUrl(col("url")).as("c"))
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(urls(1L) == "https://example.com/a/b?id=7")
    assert(urls(2L) == urls(1L))                      // alias class collapses
    assert(urls(3L) == "https://example.com/a/b?id=7&z=2")
    assert(urls(6L) == urls(3L))                      // order-insensitive
    assert(urls(4L) == "https://example.com:8443/a/b?id=7") // port kept
    assert(urls(5L) == "http://example.com/")
    assert(urls(7L) == "not a url at all")            // passthrough
  }

  test("sampling: weightedSample is exact A-ES — matches the brute-force " +
       "u^(1/w) top-n per stratum and never exceeds n") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, if (i % 2 == 0) "a" else "b",
      (i % 7 + 1) * 100)).toDF("doc_id", "stratum_in", "w")
    val got = Sampling.weightedSample(docs, col("stratum_in"), "doc_id",
      col("w"), 5)
      .select(col("stratum"), col("sample_rank"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.count(_._1 == "a") == 5 && got.count(_._1 == "b") == 5)
    // brute-force reference: same md5 draw, key = ln(u)/w on the fp grid
    def u(id: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:wsamp".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16).toDouble / 1152921504606846976.0d
    }
    val want = (1L to 60L).map { i =>
      val w = (i % 7 + 1) * 100
      (if (i % 2 == 0) "a" else "b", i,
        math.floor(math.log(u(i)) / w * 1048576.0).toLong)
    }.groupBy(_._1).flatMap { case (s, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(5).zipWithIndex
        .map { case ((_, id, _), rk) => (s, rk + 1L, id) }
    }.toSet
    assert(got.toSet == want)
  }

  test("dedup: winnowFingerprints — selection is a window minimum, " +
       "shifted copies share fingerprints, short docs select nothing") {
    import spark.implicits._
    val base = "a b c d e f g h i j k l m n o p"
    // same 16 words with 3 junk words prepended: every k-gram of the
    // shared run has the same hash at a SHIFTED position
    val shifted = "x1 y2 z3 " + base
    val docs = Seq((1L, base), (2L, shifted), (3L, "too short"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, 4, 4)
    val byDoc = fps.collect().groupBy(_.getLong(0))
    assert(!byDoc.contains(3L)) // < k+w-1 words -> no windows
    // guarantee: a 16-word shared run >= w+k-1=7 must share >= 1 hash
    val h1 = byDoc(1L).map(_.getAs[Long]("fp_hash")).toSet
    val h2 = byDoc(2L).map(_.getAs[Long]("fp_hash")).toSet
    assert((h1 intersect h2).nonEmpty)
    // density: winnowing selects far fewer fingerprints than k-grams
    // (13 k-grams in doc 1, expected ~2/(w+1) selection fraction)
    assert(byDoc(1L).length < 13 && byDoc(1L).length >= 2)
    // rightmost-tie rule: all-identical words -> all k-gram hashes equal,
    // every window selects its RIGHTMOST position
    val same = Seq((9L, Seq.fill(10)("w").mkString(" "))).toDF("doc_id", "text")
    val sel = Dedup.winnowFingerprints(same, 4, 4)
      .select("pos").collect().map(_.getLong(0)).toSet
    // 7 k-grams, windows [1..4],[2..5],[3..6],[4..7] -> picks 4,5,6,7
    assert(sel == Set(4L, 5L, 6L, 7L))
  }

  test("graph: kCore — periphery peels off in cascades, the clique " +
       "survives with full degree, k above max degree empties the graph") {
    import spark.implicits._
    import graft.llm.LinkGraph
    // K4 clique {1,2,3,4} + a chain 4-5-6 hanging off it
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val core3 = LinkGraph.kCore(edges, 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // both chain nodes fall in round 1 (deg 2 and 1), their edges
    // vanish, and the clique stabilizes at degree 3 each
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k = 4 exceeds every degree after the chain peels -> empty
    assert(LinkGraph.kCore(edges, 4, 4).count() == 0L)
  }

  test("text: stupidBackoffScore — seen-certain trigram scores 0, tiers " +
       "order by penalty, short and unscored docs ride the zero path") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c x"),    // "a b c": tier 1 with S=1 -> fp 0; "b c x": OOV
      (2L, "a b c d"),    // the reference doc (even id)
      (3L, "x b c d"),    // "x b c": tier 2 via seen "b c"; "b c d": seen
      (5L, "zz yy")       // < 3 words -> 0 rows path
    ).toDF("doc_id", "text")
    val ref = docs.filter($"doc_id" % 2 === 0)
    val got = TextAnalysis.stupidBackoffScore(docs, ref)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got(5L) == ((0L, 0L)))
    assert(got(2L)._1 == 2L)
    // ref doc's own trigrams are certain under its counts: S = 1 -> 0
    assert(got(2L)._2 == 0L)
    // doc 1: fp("a b c") = 0, so the sum is exactly the OOV-tier cost
    val oov = got(1L)._2
    assert(got(1L)._1 == 2L && oov > 0L)
    // doc 3: tier-2 ("x b c" at 0.4) + tier-1 certain ("b c d" at 0) —
    // cheaper than doc 1's OOV tier
    val tier2 = got(3L)._2
    assert(got(3L)._1 == 2L && tier2 > 0L && tier2 < oov)
  }

  test("dedup: minhashRecall — identical pair always caught, truth " +
       "counts match hand Jaccard, precision reflects candidate purity") {
    import spark.implicits._
    val base = "a b c d e f g h i j k l"
    val docs = Seq(
      (1L, base), (2L, base),                 // j = 1.0 -> banded for sure
      (3L, "a b c d e f z1 z2 z3 z4 z5 z6"),  // j vs base = 4/16 = 0.25
      (4L, "q r s t u v w x y")               // disjoint
    ).toDF("doc_id", "text")
    val got = Dedup.minhashRecall(docs, "text", "doc_id",
        threshPcts = Seq(20, 90))
      .orderBy("thresh_pct").collect()
    val t20 = got(0)
    // truth at 20%: (1,2) j=1 and (1,3),(2,3) j=0.25
    assert(t20.getAs[Long]("n_truth") == 3L)
    val t90 = got(1)
    // truth at 90%: only the identical pair, and minhash MUST catch it
    assert(t90.getAs[Long]("n_truth") == 1L)
    assert(t90.getAs[Long]("n_caught") == 1L)
    assert(t90.getAs[Long]("recall_ppm") == 1000000L)
  }

  test("dedup: sourceOverlap — hand-counted shared grams, containment " +
       "ppm both ways, disjoint sources absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "A", "a b c d e f g h i j"),   // grams: a..h, b..i, c..j
      (2L, "B", "a b c d e f g h i X"),   // shares a..h, b..i
      (3L, "C", "q r s t u v w x y z")    // disjoint
    ).toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(docs, 8).collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[String]("src_a") == "A" && r.getAs[String]("src_b") == "B")
    assert(r.getAs[Long]("n_shared") == 2L)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Long]("cont_a_ppm") == 666666L)
    assert(r.getAs[Long]("cont_b_ppm") == 666666L)
  }

  test("graph: triangleCounts — hand graph, direction/parallel/self-loop " +
       "insensitive, triangle-free star counts nothing") {
    import spark.implicits._
    import graft.llm.LinkGraph
    // triangles {1,2,3} and {2,3,4}; (2,1) duplicates (1,2) reversed,
    // (1,1) is a self-loop — both must not change any count
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (2L, 4L),
      (2L, 1L), (1L, 1L)).toDF("src", "dst")
    val got = LinkGraph.triangleCounts(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    // star around 0: wedges exist, no triangle closes
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    assert(LinkGraph.triangleCounts(star).count() == 0L)
  }

  test("vectors: simplifiedSilhouette — tight clusters score high, a " +
       "boundary point scores 0, on-centroid duplicates divide safely") {
    import spark.implicits._
    // two orthogonal centroids; points hugging each + one equidistant
    val cents = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))
    val pts = Seq(
      (1L, Seq(1.0, 0.0)),   // exactly centroid 0: a=0 -> s=1e6
      (2L, Seq(0.9, 0.1)),   // near centroid 0
      (3L, Seq(0.0, 2.0)),   // colinear with centroid 1: a=0 -> s=1e6
      (4L, Seq(1.0, 1.0))    // equidistant: a=b -> s=0 (ties to cid 0)
    ).toDF("id", "vec")
    val got = VectorOps.simplifiedSilhouette(pts, cents)
      .orderBy("cid").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    val c0 = got(0)
    assert(c0.getAs[Long]("n") == 3L)
    // per-point: 1e6 (exact), high (0.9,0.1), 0 (boundary)
    val c0sum = c0.getAs[Long]("sil_sum_ppm")
    assert(c0sum > 1500000L && c0sum < 2000000L)
    assert(c0.getAs[Long]("sil_mean_ppm") == c0sum / 3)
    val c1 = got(1)
    assert(c1.getAs[Long]("n") == 1L)
    assert(c1.getAs[Long]("sil_sum_ppm") == 1000000L)
    // degenerate: duplicate centroids -> max(a,b)=0 scores 0, no error
    val dup = VectorOps.simplifiedSilhouette(
      Seq((9L, Seq(1.0, 0.0))).toDF("id", "vec"),
      Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(1.0, 0.0))).collect()
    assert(dup.length == 1 && dup(0).getAs[Long]("sil_sum_ppm") == 0L)
  }

  test("vectors: mmrRerank — near-dup of the top pick is demoted below " +
       "a diverse candidate, rank 1 is pure relevance, small pools") {
    import spark.implicits._
    // q: three candidates — a (most relevant), a2 (a's near-copy,
    // 2nd most relevant), b (orthogonal, least relevant)
    val cands = Seq(
      (0L, 10L, 1000000L, Seq(1.0, 0.0)),        // a
      (0L, 11L, 990000L, Seq(1.0, 0.01)),        // a2 ~ a
      (0L, 12L, 800000L, Seq(0.0, 1.0))          // b orthogonal
    ).toDF("qid", "id", "rel_fp", "vec")
    val got = VectorOps.mmrRerank(cands, 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("id")))
    // pure-relevance order would be 10, 11, 12; MMR must demote the
    // near-dup 11 below the diverse 12
    assert(got.toSeq == Seq((1L, 10L), (2L, 12L), (3L, 11L)))
    // pool smaller than k: no sentinel rows, all rows ranked
    val small = Seq((1L, 20L, 500000L, Seq(1.0, 0.0))).toDF(
      "qid", "id", "rel_fp", "vec")
    val sm = VectorOps.mmrRerank(small, 3).collect()
    assert(sm.length == 1 && sm(0).getAs[Long]("rank") == 1L)
  }

  test("vectors: rankedEval — perfect prefix scores ndcg 1e6, metrics " +
       "match hand arithmetic, no-relevant corpus zeroes the ratios") {
    import spark.implicits._
    // corpus of 10, relevant = {1, 2, 7}; ranked list = 1,2,3,4,5
    val rel = (1L to 10L).map(i =>
      (i, if (Set(1L, 2L, 7L)(i)) 1L else 0L)).toDF("id", "rel")
    val ranked = (1L to 5L).map(i => (i, i)).toDF("id", "rank")
    val got = VectorOps.rankedEval(ranked, rel, Seq(2, 5), 5)
      .orderBy("k").collect()
    val d = VectorOps.ndcgDiscounts(5)
    // k=2: both hits are the ideal prefix -> ndcg exactly 1e6; rel_at_k=2
    val k2 = got(0)
    assert(k2.getAs[Long]("rel_at_k") == 2L)
    assert(k2.getAs[Long]("prec_ppm") == 1000000L)
    assert(k2.getAs[Long]("recall_ppm") == 2000000L / 3L)
    assert(k2.getAs[Long]("dcg_fp") == d(0) + d(1))
    assert(k2.getAs[Long]("ndcg_ppm") == 1000000L)
    assert(k2.getAs[Long]("mrr_ppm") == 1000000L)
    // k=5: dcg unchanged (doc 7 unranked), ideal now includes rank 3
    val k5 = got(1)
    assert(k5.getAs[Long]("rel_at_k") == 2L)
    assert(k5.getAs[Long]("prec_ppm") == 2000000L / 5L)
    assert(k5.getAs[Long]("dcg_fp") == d(0) + d(1))
    assert(k5.getAs[Long]("ndcg_ppm") ==
      (d(0) + d(1)) * 1000000L / (d(0) + d(1) + d(2)))
    // no relevant docs anywhere: ppm ratios all 0, nothing divides by 0
    val relNone = (1L to 10L).map(i => (i, 0L)).toDF("id", "rel")
    val z = VectorOps.rankedEval(ranked, relNone, Seq(5), 5).collect()(0)
    assert(z.getAs[Long]("rel_at_k") == 0L)
    assert(z.getAs[Long]("recall_ppm") == 0L)
    assert(z.getAs[Long]("ndcg_ppm") == 0L)
    assert(z.getAs[Long]("mrr_ppm") == 0L)
  }

  test("text: boilerplateStrip — nav/footer lines die, a short line " +
       "between two content lines is rescued, edges are not") {
    import spark.implicits._
    val content1 = "the quick brown fox jumps over a lazy dog today"
    val content2 = "a second paragraph of real prose continues the story here"
    val docs = Seq(
      // header + content + short sandwiched + content + footer
      (1L, Seq("Home | About | Contact", content1, "click here now",
        content2, "© 2024 SiteCorp All rights reserved").mkString("\n")),
      // short line at the EDGE (no following content line) → dropped
      (2L, Seq(content1, "click here now").mkString("\n")),
      // all boilerplate → everything dropped, clean text is empty
      (3L, Seq("Buy Now", "Subscribe Today", "Cookie Policy")
        .mkString("\n")),
      // 5+ words but zero stopwords (nav bar) → dropped; the rescue
      // needs BOTH neighbors good, one good neighbor is not enough
      (4L, Seq(content1, "Products Services Pricing Support Blog",
        "tiny line", content2).mkString("\n"))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateStrip(docs)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) ==
      Seq(content1, "click here now", content2).mkString("\n"))
    assert(out(0).getAs[Long]("n_lines") == 5L)
    assert(out(0).getAs[Long]("n_kept") == 3L)
    assert(out(0).getAs[Long]("n_dropped") == 2L)
    assert(out(1).getString(1) == content1)
    assert(out(2).getString(1) == "")
    assert(out(2).getAs[Long]("n_dropped") == 3L)
    // nav line has 5 words but no stopword → dropped; "tiny line" has
    // a bad left neighbor → not rescued despite good right neighbor
    assert(out(3).getString(1) == Seq(content1, content2).mkString("\n"))
  }

  test("text: encodingQuality — mojibake/control/replacement planted " +
       "counts, legitimate accents stay clean") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain ascii text"),
      (2L, "café naïve résumé"), // real accents: clean
      (3L, "naÃ¯ve quote â€™here â€œopen"),           // mojibake ×3
      (4L, "bin\u0007ary\u0001junk"),                // control ×2
      (5L, "lost�char")                         // replacement ×1
    ).toDF("doc_id", "text")
    val out = docs
      .select(col("doc_id"),
        TextAnalysis.encodingQuality(col("text")).as("eq"))
      .select(col("doc_id"), col("eq.n_repl"), col("eq.n_ctrl"),
        col("eq.n_moji"), col("eq.keep"))
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("keep") == 1L)
    assert(out(1).getAs[Long]("keep") == 1L &&
      out(1).getAs[Long]("n_moji") == 0L)
    assert(out(2).getAs[Long]("n_moji") == 3L &&
      out(2).getAs[Long]("keep") == 0L)
    assert(out(3).getAs[Long]("n_ctrl") == 2L &&
      out(3).getAs[Long]("keep") == 0L)
    assert(out(4).getAs[Long]("n_repl") == 1L &&
      out(4).getAs[Long]("keep") == 0L)
    // tab/newline/CR are legitimate whitespace, not control noise
    val ws = Seq((1L, "a\tb\nc\rd")).toDF("doc_id", "text")
      .select(TextAnalysis.encodingQuality(col("text")).as("eq"))
      .select(col("eq.n_ctrl")).collect()(0).getLong(0)
    assert(ws == 0L)
  }

  test("knnGraph: within-bucket candidates only, cross-band dedup, " +
       "cos-desc ranking through the bounded heap, sort-free plan") {
    // 2-D fixture with axis-aligned planes so bucket membership is
    // readable: band 0 splits on sign(x), band 1 on sign(y).
    val vecs = Seq(
      (1L, Seq(1.0, 0.1)), (2L, Seq(1.0, 0.2)),
      (3L, Seq(-1.0, 0.5)), (4L, Seq(-1.0, -0.5))
    ).toDF("id", "vec")
    val bands = Seq(Seq(Seq(1.0, 0.0)), Seq(Seq(0.0, 1.0)))
    val g = VectorOps.knnGraph(vecs, bands, 2)
    val nn = g.collect().map { r =>
      r.getLong(0) -> r.getAs[scala.collection.Seq[Row]]("nn")
        .map(_.getAs[Long]("nbr")).toSeq
    }.toMap
    // candidate pairs: (1,2) via BOTH bands — deduped; (3,4) via band 0;
    // (1,3), (2,3) via band 1. (1,4)/(2,4) never share a bucket.
    assert(nn(1L) == Seq(2L, 3L))
    assert(nn(2L) == Seq(1L, 3L))
    // node 3 has three candidates; top-2 by cosine: 4 (0.6) then 2
    // (-0.79, beating 1's -0.85)
    assert(nn(3L) == Seq(4L, 2L))
    assert(nn(4L) == Seq(3L))
    // bounded-heap shape: object-hash aggregation, no window/sort op
    val plan = g.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.toLowerCase.contains("window"), plan)
  }

  test("crawl: warcRecords — record walk, angle-bracket URI unwrap, " +
      "case-insensitive headers, garbage refusal") {
    import graft.expressions.Kernels
    def rec(t: String, uri: String, content: String,
            uriHdr: String = "WARC-Target-URI"): String =
      s"WARC/1.0\r\nWARC-Type: $t\r\n" +
        (if (uri == null) "" else s"$uriHdr: $uri\r\n") +
        s"content-length: ${content.length}\r\n\r\n$content\r\n\r\n"
    val bytes = (rec("warcinfo", null, "software: x") +
      rec("response", "<https://a.example/p>", "HTTP/1.1 200 OK\r\n\r\nhi") +
      rec("request", "https://a.example/p", "GET /p")).getBytes("UTF-8")
    val rows = Kernels.warcRecords(bytes)
    assert(rows != null && rows.numElements() == 3)
    val r1 = rows.getStruct(1, 9)
    assert(r1.getString(5) == "response")
    // angle-bracket form unwraps
    assert(r1.getString(6) == "https://a.example/p")
    val r0 = rows.getStruct(0, 9)
    assert(r0.isNullAt(6)) // warcinfo has no target URI
    // records without revisit headers leave digest/profile null
    assert(r1.isNullAt(7) && r1.isNullAt(8))
    // offsets tile the payload exactly
    val r2 = rows.getStruct(2, 9)
    assert(r2.getInt(1) + r2.getInt(2) == bytes.length)
    // content substring matches
    assert(new String(bytes, r2.getInt(3), r2.getInt(4), "UTF-8")
      == "GET /p")
    // .warc.gz: per-record gzip members concatenate and inflate back to
    // the identical record stream; corrupt/non-gzip payloads refuse
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val rec1 = rec("warcinfo", null, "software: x").getBytes("UTF-8")
    val rec2 = rec("request", "https://a.example/p", "GET /p")
      .getBytes("UTF-8")
    assert(Kernels.gunzipAll(gz(rec1) ++ gz(rec2)).toSeq
      == (rec1 ++ rec2).toSeq)
    assert(Kernels.gunzipAll("not gzip".getBytes) == null)
    assert(Kernels.gunzipAll(gz(rec1).dropRight(3)) == null)
    // refusals: wrong magic, truncated content, missing separator
    assert(Kernels.warcRecords("HTTP/1.1 200\r\n\r\n".getBytes) == null)
    assert(Kernels.warcRecords(
      "WARC/1.0\r\nContent-Length: 99\r\n\r\nshort".getBytes) == null)
    assert(Kernels.warcRecords(
      "WARC/1.0\r\nContent-Length: 2\r\n\r\nhiXX".getBytes) == null)
    // revisit records surface WARC-Payload-Digest + WARC-Profile
    val rv = ("WARC/1.0\r\nWARC-Type: revisit\r\n" +
      "WARC-Target-URI: https://a.example/p\r\n" +
      "WARC-Payload-Digest: sha1:ABC234\r\n" +
      "WARC-Profile: http://netpreserve.org/warc/1.0/revisit/" +
      "identical-payload-digest\r\n" +
      "Content-Length: 15\r\n\r\nHTTP/1.1 200 OK\r\n\r\n")
      .getBytes("UTF-8")
    val rvRows = Kernels.warcRecords(rv)
    assert(rvRows != null && rvRows.numElements() == 1)
    val rr = rvRows.getStruct(0, 9)
    assert(rr.getString(5) == "revisit")
    assert(rr.getString(7) == "sha1:ABC234")
    assert(rr.getString(8).endsWith("identical-payload-digest"))
  }

  test("crawl: httpBodyUtf8 — header strip, gzip/zlib/raw-deflate " +
      "reversal, charset transcode (header param and meta tag)") {
    import graft.expressions.Kernels
    val crlf = "\r\n"
    def out(b: Array[Byte]): String =
      new String(Kernels.httpBodyUtf8(b), "UTF-8")
    def http(header: String, body: Array[Byte]): Array[Byte] =
      (header + crlf + crlf).getBytes("UTF-8") ++ body
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    def defl(b: Array[Byte], raw: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(-1, raw)
      d.setInput(b); d.finish()
      val o = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end(); o.toByteArray
    }
    val page = "<p>café</p>"
    // identity, gzip, zlib deflate, raw deflate — identical recovery
    assert(out(http("HTTP/1.1 200 OK", page.getBytes("UTF-8"))) == page)
    assert(out(http("HTTP/1.1 200 OK" + crlf + "Content-Encoding: gzip",
      gz(page.getBytes("UTF-8")))) == page)
    assert(out(http("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: deflate",
      defl(page.getBytes("UTF-8"), raw = false))) == page)
    assert(out(http("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: deflate",
      defl(page.getBytes("UTF-8"), raw = true))) == page)
    // charset via Content-Type param
    assert(out(http("HTTP/1.1 200 OK" + crlf +
      "Content-Type: text/html; charset=ISO-8859-1",
      page.getBytes("ISO-8859-1"))) == page)
    // charset via meta tag only; compression composes with transcode
    val meta = "<meta charset='windows-1252'><p>café</p>"
    assert(out(http("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: gzip",
      gz(meta.getBytes("windows-1252")))) == meta)
    // lenient: corrupt gzip passes the raw body through; no HTTP
    // prefix means the whole content is the body
    val corrupt = http("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: gzip", "junk".getBytes("UTF-8"))
    assert(out(corrupt) == "junk")
    assert(out(page.getBytes("UTF-8")) == page)
  }

  test("crawl: htmlText — header strip, script/style/comment removal, " +
      "entity decode, line discipline") {
    import graft.expressions.Kernels
    def x(s: String): String = Kernels.htmlText(s.getBytes("UTF-8")).toString
    assert(x("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><body><p>hello &amp; goodbye</p></body></html>")
      == "hello & goodbye")
    // script/style bodies die entirely, tags become line breaks
    assert(x("<head><style>p{x}</style><SCRIPT>var a='<p>';</SCRIPT>" +
      "</head><h1> A </h1><p>B</p>") == "A\nB")
    // double-escaped entity stays escaped once
    assert(x("<p>&amp;lt;tag&amp;gt;</p>") == "&lt;tag&gt;")
    // no HTTP prefix → treated as raw HTML; unterminated comment
    // swallows the rest (lenient)
    assert(x("line<!-- never closed <p>gone") == "line")
  }

  test("crawl: htmlLinks — anchor hrefs in document order, quote " +
      "styles, entity decode, non-anchor tags ignored") {
    import graft.expressions.Kernels
    def links(s: String): Seq[String] = {
      val a = Kernels.htmlLinks(s.getBytes("UTF-8"))
      (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
    }
    // double/single/unquoted values; attribute case; header strip
    assert(links("HTTP/1.1 200 OK\r\nX: y\r\n\r\n" +
      """<a href="/a">1</a><A HREF='/b'>2</A><a href=/c>3</a>""")
      == Seq("/a", "/b", "/c"))
    // entity-decoded value; other attributes before href; self-closing
    assert(links("""<a rel="nofollow" href="/e?x=1&amp;y=2"/>""")
      == Seq("/e?x=1&y=2"))
    // <abbr>/<area> are not anchors; anchors without href contribute
    // nothing; raw fragment/javascript hrefs come through (the
    // RESOLVER drops them, not the extractor)
    assert(links("""<abbr href="/no">x</abbr><a name="t">y</a>""" +
      """<a href="#f">z</a><a href="javascript:void(0)">w</a>""")
      == Seq("#f", "javascript:void(0)"))
    // unterminated quote → dropped; no anchors → empty, not null
    assert(links("""<a href="/unclosed>t</a>""").isEmpty)
    assert(links("<p>plain</p>").isEmpty)
  }

  test("crawl: robotsRules — group selection, case-insensitivity, " +
      "comments, empty Disallow, pre-group rules dropped") {
    import graft.expressions.Kernels
    def rules(txt: String, agent: String): Seq[(Boolean, String)] = {
      val a = Kernels.robotsRules(
        org.apache.spark.unsafe.types.UTF8String.fromString(txt), agent)
      (0 until a.numElements()).map { i =>
        val r = a.getStruct(i, 2)
        (r.getBoolean(0), r.getUTF8String(1).toString)
      }
    }
    val txt = "Disallow: /orphan\n" + // before any group: invalid, dropped
      "User-Agent: GraftBot\nUser-agent: other-bot\n" + // shared group
      "Disallow: /a # trailing comment\nAllow: /a/b\nDisallow:\n" +
      "User-agent: *\nDisallow: /\n"
    // exact product token (case-insensitive) beats *; the agent-run
    // shares its rules across both named bots
    assert(rules(txt, "graftbot") == Seq((false, "/a"), (true, "/a/b")))
    assert(rules(txt, "OTHER-BOT") == Seq((false, "/a"), (true, "/a/b")))
    // unknown agent falls back to the * group
    assert(rules(txt, "stranger") == Seq((false, "/")))
    // no groups at all → empty (allow everything), not null
    assert(rules("# only comments\n", "graftbot").isEmpty)
    // null fetch refuses
    assert(Kernels.robotsRules(null, "graftbot") == null)
  }

  test("crawl: sitemapUrls — loc extraction, whitespace trim, entity " +
      "decode, sitemapindex shape") {
    val s = spark
    import s.implicits._
    val xml = """<?xml version="1.0"?><urlset>
      |<url><loc>
      |  https://a.org/p?x=1&amp;y=2
      |</loc></url>
      |<url><loc>https://a.org/q</loc><lastmod>2026-01-05</lastmod></url>
      |</urlset>""".stripMargin
    val out = Seq(xml).toDF("x")
      .select(graft.llm.CrawlOps.sitemapUrls(org.apache.spark.sql.functions.col("x")).as("u"))
      .collect().head.getAs[scala.collection.Seq[String]]("u").toSeq
    assert(out == Seq("https://a.org/p?x=1&y=2", "https://a.org/q"))
    // a sitemapindex uses the same <loc> element — child sitemap URLs
    // extract identically
    val idx = "<sitemapindex><sitemap><loc>https://a.org/s1.xml</loc>" +
      "</sitemap></sitemapindex>"
    val out2 = Seq(idx).toDF("x")
      .select(graft.llm.CrawlOps.sitemapUrls(org.apache.spark.sql.functions.col("x")).as("u"))
      .collect().head.getAs[scala.collection.Seq[String]]("u").toSeq
    assert(out2 == Seq("https://a.org/s1.xml"))
  }

  test("crawl: sitemapExpand — index recursion through fetched " +
      "(gzip) children, lastmod surfacing, priority scheduling") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val tops = Seq(
      // index host: two children, one gzipped
      ("a.org", "<sitemapindex>" +
        "<sitemap><loc>https://a.org/s1.xml</loc></sitemap>" +
        "<sitemap><loc> https://a.org/s2.xml.gz </loc></sitemap>" +
        "</sitemapindex>"),
      // plain-urlset host expands directly, no fetch needed
      ("b.org", "<urlset><url><loc>https://b.org/only</loc>" +
        "<lastmod>2026-02-01</lastmod></url></urlset>"))
      .toDF("host", "sitemap_xml")
    val fetched = Seq(
      ("https://a.org/s1.xml",
        ("<urlset><url><loc>https://a.org/p1</loc>" +
          "<lastmod>2026-01-10</lastmod></url>" +
          "<url><loc>https://a.org/p2</loc></url></urlset>")
          .getBytes("UTF-8")),
      ("https://a.org/s2.xml.gz",
        gz(("<urlset><url><loc>https://a.org/p3</loc>" +
          "<lastmod>2026-01-20</lastmod></url></urlset>")
          .getBytes("UTF-8"))))
      .toDF("url", "content")
    val pages = graft.llm.CrawlOps.sitemapExpand(tops, fetched)
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.getString(2)))).toSeq.sortBy(_._2)
    assert(pages == Seq(
      ("a.org", "https://a.org/p1", Some("2026-01-10")),
      ("a.org", "https://a.org/p2", None),
      ("a.org", "https://a.org/p3", Some("2026-01-20")),
      ("b.org", "https://b.org/only", Some("2026-02-01"))))
    // freshness priority: p3 (newest) slot 0, p1 slot 1, lastmod-less
    // p2 last — within a.org's lane; b.org lanes independently
    val sched = graft.llm.CrawlOps.crawlSchedule(
        graft.llm.CrawlOps.sitemapExpand(tops, fetched), "url",
        Seq.empty[(String, String)].toDF("host", "robots_txt"),
        "bot", defaultDelaySec = 7, priorityCol = Some("lastmod"))
      .select(col("url"), col("slot"), col("fetch_at_sec"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(sched == Seq(
      ("https://a.org/p1", 1L, 7L),
      ("https://a.org/p2", 2L, 14L),
      ("https://a.org/p3", 0L, 0L),
      ("https://b.org/only", 0L, 0L)))
  }

  test("crawl: crawlSchedule — per-host lanes, declared vs default " +
      "delay, lexicographic slots") {
    val s = spark
    import s.implicits._
    val frontier = Seq(
      "https://a.org/2", "https://a.org/1", "https://b.org/x")
      .toDF("url")
    val robots = Seq(("a.org", "User-agent: *\nCrawl-delay: 10\n"))
      .toDF("host", "robots_txt")
    val out = graft.llm.CrawlOps.crawlSchedule(
      frontier, "url", robots, "graftbot", defaultDelaySec = 3)
      .orderBy(org.apache.spark.sql.functions.col("url"))
      .collect().map(r => (r.getString(0), r.getInt(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(
      ("https://a.org/1", 10, 0L, 0L),   // first slot on its host
      ("https://a.org/2", 10, 1L, 10L),  // second: one delay later
      ("https://b.org/x", 3, 0L, 0L)))   // no robots → default lane
  }

  test("crawl: robotsCrawlDelay — group selection shared with rules, " +
      "first declared wins, -1 when absent") {
    import graft.expressions.Kernels
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val txt = "User-agent: GraftBot\nCrawl-delay: 4\nCrawl-delay: 9\n" +
      "Disallow: /x\nUser-agent: *\nCrawl-delay: 99\n"
    assert(Kernels.robotsCrawlDelay(u(txt), "graftbot") == 4)
    assert(Kernels.robotsCrawlDelay(u(txt), "stranger") == 99)
    assert(Kernels.robotsCrawlDelay(u("User-agent: *\nDisallow: /\n"),
      "graftbot") == -1)
    // a malformed or negative delay is ignored, not zeroed
    assert(Kernels.robotsCrawlDelay(
      u("User-agent: *\nCrawl-delay: soon\nCrawl-delay: -2\n"),
      "graftbot") == -1)
    // crawl-delay ENDS an agent run: the next User-agent starts a new
    // group (rules stay with the right group)
    val split = "User-agent: a\nCrawl-delay: 1\nUser-agent: b\nDisallow: /q\n"
    assert(Kernels.robotsCrawlDelay(u(split), "b") == -1)
    val rb = Kernels.robotsRules(u(split), "b")
    assert(rb.numElements() == 1)
  }

  test("crawl: robotsMatchLen — prefix semantics, * wildcard, $ " +
      "anchor, specificity = pattern length") {
    import graft.expressions.Kernels
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def m(path: String, pat: String): Int =
      Kernels.robotsMatchLen(u(path), u(pat))
    assert(m("/a/b/c", "/a") == 2)          // plain prefix
    assert(m("/a/b/c", "/a/b/c/d") == -1)   // longer than path
    assert(m("/x/file.pdf", "/*.pdf$") == 7)
    assert(m("/x/file.pdfx", "/*.pdf$") == -1) // anchor must bind the end
    assert(m("/x/file.pdf.html", "/*.pdf") == 6) // unanchored mid-match
    assert(m("/ab", "/a*b*") == 5)          // trailing star matches empty
    assert(m("/p/q", "/") == 1)
    assert(m("/search?q=1", "/search?q=") == 10) // query is matchable
  }

  test("crawl: resolveUrl — RFC 3986 reference cases against a messy " +
      "base, null policy for unfetchable hrefs") {
    val s = spark
    import s.implicits._
    val base = "https://www.h1.example.org:443/a/7/page.html?b=2&a=1"
    val hrefs = Seq("https://x.org/abs", "//y.org/sr", "/root", "sub/p.html",
      "../up.html", "#sec", "javascript:void(0)", "mailto:a@b", "")
    val out = hrefs.toDF("href")
      .select(graft.llm.CrawlOps.resolveUrl(lit(base), col("href")).as("r"))
      .collect().map(r => Option(r.getString(0)).orNull).toSeq
    assert(out == Seq(
      "https://x.org/abs",
      "https://y.org/sr",
      "https://www.h1.example.org:443/root",
      "https://www.h1.example.org:443/a/7/sub/p.html",
      "https://www.h1.example.org:443/a/up.html",
      null, null, null, null))
    // two dot-dot levels collapse; a link's own fragment is dropped
    val two = Seq(("x", "../../deep.html"), ("y", "/p#frag")).toDF("k", "href")
      .select(graft.llm.CrawlOps.resolveUrl(
        lit("https://h.org/a/b/c/page.html"), col("href")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(two == Seq("https://h.org/a/deep.html", "https://h.org/p"))
  }
}
