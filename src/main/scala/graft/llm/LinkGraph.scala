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
    val deg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg"))
    // outdeg rides WITH the rank table so the per-iteration join is the
    // one edge join only (degrees don't change; attach them once)
    var pr = nodes.select(col("id"))
      .join(deg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        lit(Scale / n).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.filter(col("outdeg") > 0)
          .select(col("id").as("src"),
            call_function("div", col("pr"), col("outdeg")).as("share")),
          Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("share")).as("inflow"))
      val next = pr.select(col("id"), col("outdeg"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"), col("outdeg"),
          (lit(base) + call_function("div",
            lit(dampNum.toLong) * coalesce(col("inflow"), lit(0L)),
            lit(100L))).as("pr"))
        .localCheckpoint(true)
      pr.unpersist()
      pr = next
    }
    pr.select(col("id"), col("pr"))
  }
}
