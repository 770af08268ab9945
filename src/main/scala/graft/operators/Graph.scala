package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality for source/domain authority scoring — the
  * web-graph quality signal a Common-Crawl-style curation pipeline
  * attaches to every document (harmonic/PageRank domain ranks are the
  * standard upstream weight for URL-level filtering).
  *
  * PageRank here is exact integer arithmetic in parts-per-million, so
  * the DuckDB oracle reproduces every iteration bit-for-bit:
  *
  *   r_0(v)     = S div n
  *   r_{t+1}(v) = (S - d) div n  +  (d * sum_{u->v} (r_t(u) div out(u))) div S
  *
  * with S = 1e6, d = 850000 ppm. Two deliberate, documented choices:
  *
  *   - NO dangling-mass redistribution: the caller passes a SYMMETRIZED
  *     edge set (overlap graphs are undirected), so a dangler is exactly
  *     an isolated node, which keeps the teleport-only rank (S-d) div n.
  *     This removes the per-iteration global dangling-sum scalar that
  *     would otherwise serialize every round at 100 TB.
  *   - Fixed iteration count instead of an epsilon test: convergence
  *     checks cost one extra action per round; a fixed budget (default
  *     10 — web-scale ranks are usually run 10-20 rounds) makes cost
  *     predictable and the result a pure function of the input.
  *
  * Scale shape: each iteration is one equi-join of the edge table with
  * the rank table (broadcastable when nodes ≪ edges) plus one
  * map-side-combined sum keyed by dst — the textbook distributed
  * PageRank step. `localCheckpoint` per round keeps the plan shallow,
  * the same discipline as [[Dedup.duplicateClusters]]'s star
  * contraction. The node count is collected ONCE driver-side (a single
  * scalar of model state, the same adjudicated shape as DSIR's
  * threshold fold).
  */
object Graph {
  val Scale = 1000000L
  val DampPpm = 850000L
  val DefaultIters = 10

  /** `nodes`: one column `node`; `edges`: columns `src`, `dst` (already
    * symmetrized for undirected graphs). Returns (node, out_deg,
    * rank_ppm) — out_deg 0 for isolated nodes.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int = DefaultIters): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty node set")
    val base = (Scale - DampPpm) / n
    val ew = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outd")), Seq("src"))
      .localCheckpoint(true)
    var ranks = nodes.select(col("node"), lit(Scale / n).as("r"))
    for (_ <- 1 to iters) {
      val in = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst"), expr("r div outd").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("acc"))
      ranks = nodes.join(in, nodes("node") === in("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"$DampPpm * coalesce(acc, 0L) div $Scale")).as("r"))
        .localCheckpoint(true)
    }
    ranks
      .join(ew.select("src", "outd").distinct(), ranks("node") === col("src"), "left")
      .select(col("node"), coalesce(col("outd"), lit(0L)).as("out_deg"),
        col("r").as("rank_ppm"))
  }

  /** DuckDB twin: unrolled iteration CTEs generated from the SAME
    * constants (fixed iteration counts make the recursion a plain CTE
    * chain — no RECURSIVE needed). Callers provide `nodes` (one column
    * `node`) and `e` (`src`, `dst`, symmetrized) CTEs; this emits the
    * chain from `ew`/`nn`/`r0` through `r{iters}` plus the final
    * projection, to be appended after those input CTEs.
    */
  def pageRankSql(iters: Int = DefaultIters, nodeAs: String = "node"): String = {
    val steps = (1 to iters).map { t =>
      s"""r$t AS (SELECT n.node,
         |  (($Scale - $DampPpm) // (SELECT n FROM nn)) + ($DampPpm * coalesce(s.acc, 0)) // $Scale AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT dst, sum(r // outd) AS acc FROM ew JOIN r${t - 1} ON ew.src = r${t - 1}.node GROUP BY 1
         |  ) s ON n.node = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""od AS (SELECT src, count(*) AS outd FROM e GROUP BY 1),
       |ew AS (SELECT e.src, e.dst, od.outd FROM e JOIN od USING (src)),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, $Scale // (SELECT n FROM nn) AS r FROM nodes),
       |$steps
       |SELECT n.node AS $nodeAs, coalesce(od.outd, 0) AS out_deg, r$iters.r AS rank_ppm
       |FROM nodes n JOIN r$iters ON n.node = r$iters.node
       |LEFT JOIN od ON n.node = od.src""".stripMargin
  }
}
