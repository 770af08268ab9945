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
    // pin the node list once: `nodes` is typically a distinct() over the
    // full corpus, and every iteration left-joins it — without this the
    // corpus scan would re-execute per round (10 scans at 100 TB)
    val nd = nodes.select("node").localCheckpoint(true)
    val n = nd.count()
    require(n > 0, "pageRank needs a non-empty node set")
    val base = (Scale - DampPpm) / n
    val ew = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outd")), Seq("src"))
      .localCheckpoint(true)
    var ranks = nd.select(col("node"), lit(Scale / n).as("r"))
    for (_ <- 1 to iters) {
      val in = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst"), expr("r div outd").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("acc"))
      ranks = nd.join(in, nd("node") === in("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"$DampPpm * coalesce(acc, 0L) div $Scale")).as("r"))
        .localCheckpoint(true)
    }
    ranks
      .join(ew.select("src", "outd").distinct(), ranks("node") === col("src"), "left")
      .select(col("node"), coalesce(col("outd"), lit(0L)).as("out_deg"),
        col("r").as("rank_ppm"))
  }

  /** Per-node triangle counts + local clustering coefficient over a
    * CANONICAL undirected edge set (`u < v` per row) — the other core
    * graph statistic of a domain-mirroring audit: a source whose
    * neighbors also mirror EACH OTHER (high clustering) sits in a
    * copy-ring; a hub with low clustering syndicates to unrelated
    * sources. The enumeration is the classic oriented triangle join —
    * e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) with a<b<c finds each triangle
    * exactly once via two equi-joins, O(m^1.5) with the orientation
    * bounding the join fan-out by out-degree in the ordering (the
    * standard distributed formulation; no node ever sees more than its
    * ordered neighborhood squared). Coefficient in exact ppm:
    * 2·tri·10⁶ div (deg·(deg−1)), zero for degree < 2.
    */
  def triangleStats(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val e = edges.select(col("u"), col("v"))
    val deg = e.select(col("u").as("node")).union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"), col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    nodes.join(deg, Seq("node"), "left").join(perNode, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(coalesce(col("deg"), lit(0L)) >= 2,
          expr(s"(2L * coalesce(n_tri, 0L) * $Scale) div (deg * (deg - 1L))"))
          .otherwise(0L).as("clust_ppm"))
  }

  /** DuckDB twin over caller-provided `nodes` (node) and `edgeCte`
    * (u, v canonical) CTEs.
    */
  def triangleStatsSql(edgeCte: String = "e", nodeAs: String = "node"): String =
    s"""deg AS (SELECT node, count(*) AS deg FROM (
       |  SELECT u AS node FROM $edgeCte UNION ALL SELECT v FROM $edgeCte) GROUP BY 1),
       |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |        FROM $edgeCte e1 JOIN $edgeCte e2 ON e1.v = e2.u
       |        JOIN $edgeCte e3 ON e3.u = e1.u AND e3.v = e2.v),
       |pn AS (SELECT node, count(*) AS n_tri FROM (
       |  SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) GROUP BY 1)
       |SELECT n.node AS $nodeAs, coalesce(d.deg, 0) AS deg, coalesce(p.n_tri, 0) AS n_tri,
       |       CASE WHEN coalesce(d.deg, 0) >= 2
       |            THEN (2 * coalesce(p.n_tri, 0) * $Scale) // (d.deg * (d.deg - 1))
       |            ELSE 0 END AS clust_ppm
       |FROM nodes n LEFT JOIN deg d ON n.node = d.node
       |LEFT JOIN pn p ON n.node = p.node""".stripMargin

  /** DuckDB twin: unrolled iteration CTEs generated from the SAME
    * constants (fixed iteration counts make the recursion a plain CTE
    * chain — no RECURSIVE needed). Callers provide `nodes` (one column
    * `node`) and `e` (`src`, `dst`, symmetrized) CTEs; this emits the
    * chain from `ew`/`nn`/`r0` through `r{iters}` plus the final
    * projection, to be appended after those input CTEs.
    */
  /** The iteration CTE block `od, ew, nn, r0 … r{iters}`. */
  def pageRankCtes(iters: Int = DefaultIters): String = {
    val steps = (1 to iters).map { t =>
      s"""r$t AS (SELECT n.node,
         |  CAST((($Scale - $DampPpm) // (SELECT n FROM nn)) + ($DampPpm * coalesce(s.acc, 0)) // $Scale AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT dst, sum(r // outd) AS acc FROM ew JOIN r${t - 1} ON ew.src = r${t - 1}.node GROUP BY 1
         |  ) s ON n.node = s.dst)""".stripMargin
    }.mkString(",\n")
    s"""od AS (SELECT src, count(*) AS outd FROM e GROUP BY 1),
       |ew AS (SELECT e.src, e.dst, od.outd FROM e JOIN od USING (src)),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, $Scale // (SELECT n FROM nn) AS r FROM nodes),
       |$steps""".stripMargin
  }

  /** The final (node, out_deg, rank_ppm) projection over the CTE block
    * — bare, so callers can use it as a query tail or wrap it as a CTE
    * for composition.
    */
  def pageRankSelect(iters: Int = DefaultIters, nodeAs: String = "node"): String =
    s"""SELECT n.node AS $nodeAs, coalesce(od.outd, 0) AS out_deg, r$iters.r AS rank_ppm
       |FROM nodes n JOIN r$iters ON n.node = r$iters.node
       |LEFT JOIN od ON n.node = od.src""".stripMargin

  def pageRankSql(iters: Int = DefaultIters, nodeAs: String = "node"): String =
    s"${pageRankCtes(iters)}\n${pageRankSelect(iters, nodeAs)}"
}
