package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph scoring for web-corpus curation. PageRank-family
  * centrality is the classic crawl-side quality signal (Common Crawl
  * publishes rank files; CCNet-era pipelines bucket documents by the
  * host graph's centrality before anything looks at the text), so a
  * training-data engine needs it next to the content-side scores.
  *
  * All arithmetic is FIXED-POINT INTEGER: scores are scaled by 10^12,
  * every division is an exact integral floor, and each iteration's sums
  * are integer (order-independent) — so the trajectory and the final
  * ranks are bit-reproducible in any engine, which a float PageRank is
  * not (float sum order varies per partitioning).
  */
object LinkGraph {

  /** Score scale: pr values live in [0, 10^12]. Large enough that the
    * per-iteration floor error (≤ outdeg per node) never moves a rank at
    * corpus cardinalities; small enough that N · SCALE · 85 stays far
    * inside long range.
    */
  val Scale = 1000000000000L

  /** HITS scale: hub/auth values live near [0, 10^6] after each
    * normalization (see [[hits]] — normalization is overflow-safe at any
    * node count, unlike a multiply-then-divide spelling which would
    * overflow long at ~10^7 nodes).
    */
  val HitsScale = 1000000L

  /** Deterministic random-walk corpus generation (the DeepWalk /
    * node2vec data pass, Perozzi et al. 2014): one walk per seed node,
    * `steps` hops, where the hop from node u at step t goes to the
    * out-neighbor v minimizing the md5-derived draw h(u, v, t) — a
    * stateless pseudo-random choice that is a pure function of
    * (u, v, t), so walks are bit-reproducible on any engine, cluster
    * layout, or retry (an RNG-seeded walker is not: its draw order
    * depends on task scheduling). Walks feed skip-gram embedding
    * trainers; the walk table IS the training corpus.
    *
    * Scale shape: Pregel-shaped — each step is one frontier⋈edges join
    * (keyed on the current node) plus a partial-combined per-walk
    * struct-min (the arg-min rides a (draw, dst) struct, ties to the
    * lowest dst); frontier cardinality stays exactly one row per walk,
    * so step cost is bounded by walks × out-degree. Walks whose node
    * has no out-edge simply end (the join drops them) — dangling-node
    * semantics.
    *
    * @return (walk_id = seed id, step 0..steps, node) — step 0 is the
    *         seed itself
    */
  def randomWalks(seeds: DataFrame, edges: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1)
    var frontier = seeds
      .select(col("id").as("walk_id"), col("id").as("node"),
        lit(0L).as("step"))
    var acc = frontier
    for (t <- 1 to steps) {
      val draw = conv(substring(md5(concat(
        col("node").cast("string"), lit(":"),
        col("dst").cast("string"), lit(s":$t"))), 1, 15), 16, 10)
        .cast("long")
      val nxt = frontier.join(edges, col("node") === col("src"))
        .select(col("walk_id"), struct(draw.as("h"), col("dst")).as("hd"))
        .groupBy(col("walk_id"))
        .agg(min(col("hd")).as("m"))
        .select(col("walk_id"), col("m.dst").as("node"),
          lit(t.toLong).as("step"))
      frontier = nxt
      acc = acc.unionByName(nxt)
    }
    acc
  }

  /** Fixed-iteration HITS (Kleinberg 1999): authorities are pages good
    * hubs point TO, hubs are pages that point to good authorities — the
    * complementary centrality pair to PageRank for link-directory-heavy
    * web graphs (a hub score identifies link farms and navigation pages;
    * an authority score identifies canonical content).
    *
    *   auth_{t+1}(v) = normalize(Σ_{u→v} hub_t(u))
    *   hub_{t+1}(u)  = normalize(Σ_{u→v} auth_{t+1}(v))
    *
    * All-integer like [[pageRank]]: the normalize step divides raw sums
    * by `max(total div HitsScale, 1)` — a two-step integral division
    * (never a multiply-then-divide, whose `raw·SCALE` intermediate
    * overflows long once n·SCALE exceeds 2^63 ≈ 9·10^18, i.e. at ~10^7
    * nodes) — so values return to ≈ HitsScale magnitude each half-step
    * and the whole trajectory is bit-reproducible cross-engine. For
    * graphs whose raw total is still under HitsScale the divisor clamps
    * to 1 (values stay small; ordering unaffected).
    *
    * Scale shape per iteration: two shuffle joins of a one-row-per-node
    * score table onto the edge list (keyed src then dst) + two
    * partial-combined groupBy sums + two single-row total aggs that
    * broadcast back — the same Pregel shape as [[pageRank]] at exactly
    * 2× the work, localCheckpoint-truncated per half-step. Nodes with no
    * in/out links stay in the output at score 0.
    *
    * @return (id, auth, hub) on the ≈10^6 fixed-point scale
    */
  def hits(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1)
    def normalized(raw: DataFrame, outCol: String): DataFrame = {
      // the raw table is referenced twice (total agg + projection) —
      // checkpoint it first or the edge join + aggregation behind it
      // would be planned and EXECUTED twice per half-step, doubling the
      // per-iteration work the scale-shape contract advertises
      val pinned = raw.localCheckpoint(true)
      val tot = pinned.agg(sum(col("raw")).as("tot"))
      val out = pinned.crossJoin(broadcast(tot))
        .select(col("id"),
          call_function("div", col("raw"),
            greatest(call_function("div", col("tot"), lit(HitsScale)), lit(1L)))
            .as(outCol))
        .localCheckpoint(true)
      pinned.unpersist()
      out
    }
    def halfStep(scores: DataFrame, inCol: String, joinKey: String,
                 groupKey: String, outCol: String): DataFrame = {
      val summed = edges
        .join(scores.select(col("id").as(joinKey), col(inCol)), Seq(joinKey))
        .groupBy(col(groupKey).as("id"))
        .agg(sum(col(inCol)).as("raw"))
      val full = nodes.select(col("id")).join(summed, Seq("id"), "left")
        .select(col("id"), coalesce(col("raw"), lit(0L)).as("raw"))
      normalized(full, outCol)
    }
    var hub = nodes.select(col("id"), lit(HitsScale).as("hub"))
      .localCheckpoint(true)
    var auth = hub.select(col("id"), lit(0L).as("auth"))
    for (_ <- 1 to iters) {
      val nextAuth = halfStep(hub, "hub", "src", "dst", "auth")
      val nextHub = halfStep(nextAuth, "auth", "dst", "src", "hub")
      hub.unpersist(); auth.unpersist()
      auth = nextAuth; hub = nextHub
    }
    auth.join(hub, Seq("id"))
  }

  /** Fixed-iteration PageRank over (src, dst) edges with uniform
    * out-degree split and damping d = dampNum/100.
    *
    * pr_0(v)     = SCALE div n
    * pr_{t+1}(v) = ((100−dampNum)·SCALE div 100) div n
    *             + dampNum · (Σ_{u→v} pr_t(u) div outdeg(u)) div 100
    *
    * Scale shape: per iteration, ONE shuffle join of the rank table onto
    * the edge list (keyed on src — co-partition both on the node id and
    * the exchange reuses across iterations) and ONE partial-combined
    * groupBy(dst) sum; the rank table is one row per node. This is the
    * Pregel message-passing shape — iterations × (join + agg), nothing
    * driver-side but the loop counter. Each round localCheckpoints to
    * truncate the otherwise per-round-growing iterative plan (same
    * reasoning as [[Dedup.connectedComponents]]).
    *
    * Dangling nodes (outdeg 0) contribute nothing — their mass leaks,
    * matching the contract that callers wanting strict mass conservation
    * pre-drop or self-loop them. Nodes appear in the output even with no
    * in-links (base term only).
    *
    * @param nodes one row per vertex: (id)
    * @param edges (src, dst), parallel edges count separately
    * @return (id, pr) — pr on the 10^12 fixed-point scale
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int,
               dampNum: Int = 85): DataFrame = {
    require(iters >= 1 && dampNum >= 0 && dampNum <= 100)
    val n = nodes.count()
    require(n > 0, "pageRank over an empty node set")
    val base = (100L - dampNum) * Scale / 100L / n
    prLoop(nodes.select(col("id"),
        lit(Scale / n).as("pr0"), lit(base).as("base")),
      edges, iters, dampNum)
  }

  /** Personalized PageRank: identical recurrence, but the restart mass
    * (the base term AND the initial distribution) concentrates on a
    * SEED set instead of spreading uniformly — random walks teleport
    * back to the seeds, so rank measures proximity to them. This is the
    * seed-based trust/quality propagation of web curation (TrustRank:
    * start from hand-vetted hosts, let the link structure extend the
    * judgment; also the standard seed-expansion primitive for growing a
    * topical corpus from a curated nucleus).
    *
    *   ppr_0(v)     = [v ∈ S] · SCALE div |S|
    *   ppr_{t+1}(v) = [v ∈ S] · ((100−d)·SCALE div 100) div |S|
    *                + d · (Σ_{u→v} ppr_t(u) div outdeg(u)) div 100
    *
    * Same all-integer fixed point and Pregel scale shape as
    * [[pageRank]] (one extra broadcast-sized seed join at init only);
    * non-seed nodes with no inbound paths from S stay at exactly 0 —
    * "unreachable from the trusted set" is a value, not an absence.
    */
  def personalizedPageRank(nodes: DataFrame, edges: DataFrame,
                           seeds: DataFrame, iters: Int,
                           dampNum: Int = 85): DataFrame = {
    require(iters >= 1 && dampNum >= 0 && dampNum <= 100)
    // strays outside the node set would still count toward |S|, silently
    // deflating every real seed's restart share — intersect first so the
    // documented ppr_0(v) = [v∈S]·SCALE div |S| distribution holds
    val seedIds = seeds.select(col("id")).distinct()
      .join(nodes.select(col("id")).distinct(), Seq("id"), "left_semi")
    val nS = seedIds.count()
    require(nS > 0, "personalizedPageRank with an empty seed set")
    val baseSeed = (100L - dampNum) * Scale / 100L / nS
    val marked = nodes.select(col("id"))
      .join(seedIds.select(col("id"), lit(1L).as("s")), Seq("id"), "left")
      .select(col("id"),
        when(col("s").isNotNull, lit(Scale / nS)).otherwise(lit(0L))
          .as("pr0"),
        when(col("s").isNotNull, lit(baseSeed)).otherwise(lit(0L))
          .as("base"))
    prLoop(marked, edges, iters, dampNum)
  }

  /** Per-node triangle counts over the UNDIRECTED simple graph induced
    * by `edges` — the local-clustering signal of link-spam detection
    * (organic neighborhoods close triangles; link farms are near-
    * bipartite star bursts with almost none, so authority-looking pages
    * with zero triangles are prime spam candidates).
    *
    * Algorithm: degree-ordered node-iterator (Schank & Wagner 2005 /
    * Suri & Vassilvitskii's MapReduce form). Each undirected edge is
    * oriented from the (degree, id)-SMALLER endpoint to the larger; all
    * wedges are built at the smaller endpoint and closed against the
    * canonical edge set. The orientation bounds every node's out-degree
    * by O(√m), so wedge volume — the shuffle that kills the naive
    * node-iterator on skewed web graphs (one hub of degree d emits d²/2
    * wedges) — is O(m^1.5) worst case and near-linear on power-law
    * graphs. Every triangle is generated exactly once, at its smallest-
    * rank vertex.
    *
    * Scale shape: canonicalize (1 shuffle: distinct), degree (1
    * partial-combined agg), two degree-attach joins, the wedge self-join
    * (keyed on the low vertex), the closing equi-join on (a, b), one
    * explode + groupBy — all key-partitioned joins/aggs; nothing driver-
    * side, no candidate set beyond the degree-bounded wedges.
    *
    * @param edges (src, dst) in any direction; self-loops and parallel
    *              edges are dropped
    * @return (id, n_triangles) for nodes in ≥1 triangle
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    // orient toward the (degree, id)-larger endpoint; id breaks ties
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    // e1.v < e2.v keeps one of each wedge's two spellings AND makes the
    // (a, b) pair id-canonical, matching `und`'s a < b for the close join
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("u"), col("e1.v").as("a"), col("e2.v").as("b"))
    val tris = wedges.join(und, Seq("a", "b"))
      .select(col("u"), col("a"), col("b"))
    tris.select(explode(array(col("u"), col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))
  }

  /** k-core decomposition by iterative peeling (Seidman 1983; the
    * Batagelj-Zaveršnik distributed form): repeatedly drop nodes whose
    * degree in the SURVIVING graph is < k — the maximal-subgraph
    * density signal of web curation (a page kept only by low-degree
    * neighbors is periphery; the k-core is the organically-linked
    * nucleus, and spam rings that survive PageRank often fall out of
    * modest cores).
    *
    * Runs a FIXED `rounds` peels so the result is a well-defined
    * deterministic object whether or not the fixpoint was reached (any
    * peel schedule converges to THE k-core, and a fixed-round unroll is
    * oracle-replayable — callers size `rounds` to their graph's
    * peel depth; the entry's fixture converges within its bound).
    *
    * Scale shape per round: one partial-combined degree agg + two
    * semi-joins of the edge list against the (smaller) surviving node
    * set, localCheckpoint-truncated like every iterative loop here.
    *
    * @param edges (src, dst) any direction; self-loops/parallels dropped
    * @return (id, core_deg) — nodes incident to the surviving edge set
    *         with their in-core degree (all ≥ k once converged)
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    var live = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val keep = live.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("v"))
      val next = live
        .join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
        .localCheckpoint(true)
      live.unpersist()
      live = next
    }
    val out = live.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("core_deg"))
      .localCheckpoint(true)
    live.unpersist()
    out
  }

  /** The shared power-iteration loop: `init` carries one row per node
    * with its starting rank (pr0) and per-node restart term (base).
    */
  private def prLoop(init: DataFrame, edges: DataFrame, iters: Int,
                     dampNum: Int): DataFrame = {
    val deg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg"))
    // outdeg rides WITH the rank table so the per-iteration join is the
    // one edge join only (degrees don't change; attach them once)
    var pr = init
      .join(deg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        col("base"), col("pr0").as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.filter(col("outdeg") > 0)
          .select(col("id").as("src"),
            call_function("div", col("pr"), col("outdeg")).as("share")),
          Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("share")).as("inflow"))
      val next = pr.select(col("id"), col("outdeg"), col("base"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"), col("outdeg"), col("base"),
          (col("base") + call_function("div",
            lit(dampNum.toLong) * coalesce(col("inflow"), lit(0L)),
            lit(100L))).as("pr"))
        .localCheckpoint(true)
      pr.unpersist()
      pr = next
    }
    pr.select(col("id"), col("pr"))
  }
}
