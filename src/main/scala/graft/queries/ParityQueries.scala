package graft.queries

import graft.Tables
import graft.functions.Normalize.norm
import graft.functions.StringOps
import graft.operators.Picks
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Parity queries: each SURVEY.md §2 operator as a named query over the
  * driver test tables, with an ANSI-SQL oracle for the DuckDB compare.
  *
  * Determinism rules (the driver hash-compares values):
  *   - every window has a total order (unique tie-breaker column);
  *   - no floating-point *aggregation*: double sums go through an exact
  *     integer cents-scaling (`round(x*100)::bigint`) so Spark's
  *     partition-order-dependent summation can't drift from DuckDB's;
  *   - aggregate output columns are aliased identically on both sides.
  */
object ParityQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- W1/W2/W3/W5
  // Top-1-per-group "pick latest file" (reference Leyton_depot.py:291-295):
  // latest lineitem per order by shipdate. One shuffle on l_orderkey; at
  // 100 TB this is the grain of the data so groups stay tiny and AQE
  // handles any skew.
  val pickLatest: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    Picks.pickTop1(li, Seq(col("l_orderkey")), Seq(col("l_shipdate").desc, col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_shipdate")
  }
  val pickLatestSql: String =
    """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_shipdate
      |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate DESC, l_linenumber, l_partkey, l_suppkey) AS rn
      |      FROM lineitem) WHERE rn = 1""".stripMargin

  val pickFirst: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    Picks.pickTop1(li, Seq(col("l_orderkey")), Seq(col("l_shipdate").asc, col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "l_shipdate")
  }
  val pickFirstSql: String =
    """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_shipdate
      |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate ASC, l_linenumber, l_partkey, l_suppkey) AS rn
      |      FROM lineitem) WHERE rn = 1""".stripMargin

  val pickAllMax: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    Picks.pickTopK(li, Seq(col("l_orderkey")), Seq(col("l_shipdate").desc, col("l_linenumber"), col("l_partkey"), col("l_suppkey")), 3)
      .select("l_orderkey", "l_linenumber", "l_shipdate")
  }
  val pickAllMaxSql: String =
    """SELECT l_orderkey, l_linenumber, l_shipdate
      |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate DESC, l_linenumber, l_partkey, l_suppkey) AS rn
      |      FROM lineitem) WHERE rn <= 3""".stripMargin

  // W5 oldest-wins dedup (find_or_create race collapse, Leyton_depot.py:439-441)
  val dedupOldest: Q = (s, d) => {
    val o = Tables.orders(s, d)
    Picks.pickTop1(o, Seq(col("o_custkey")), Seq(col("o_orderdate").asc, col("o_orderkey")))
      .select("o_custkey", "o_orderkey", "o_orderdate")
  }
  val dedupOldestSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey) AS rn
      |      FROM orders) WHERE rn = 1""".stripMargin

  // ---------------------------------------------------------------- S1-S3
  // Point lookup with id pushdown + name fallback (Leyton_depot.py:156-167).
  val pointLookup: Q = (s, d) =>
    Tables.customer(s, d)
      .filter(col("c_custkey").isin(1L, 5L, 10L, 42L, 999999L))
      .select(col("c_custkey"),
        StringOps.itemNameOr(col("c_name"), col("c_custkey")).as("display_name"),
        col("c_mktsegment"))
  val pointLookupSql: String =
    """SELECT c_custkey,
      |       coalesce(c_name, 'ITEM_' || CAST(c_custkey AS VARCHAR)) AS display_name,
      |       c_mktsegment
      |FROM customer WHERE c_custkey IN (1, 5, 10, 42, 999999)""".stripMargin

  // S6/F5/F6 coalesce-fallback chain (formula display_value ?? text).
  val coalesceFallback: Q = (s, d) =>
    Tables.customer(s, d).select(
      col("c_custkey"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), upper(col("c_name"))).as("segment_or_name"))
  val coalesceFallbackSql: String =
    """SELECT c_custkey,
      |       coalesce(nullif(c_mktsegment, 'BUILDING'), upper(c_name)) AS segment_or_name
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- P1/F9
  // JSON payload decode (Leyton_depot.py:147-153): props is a JSON string.
  //
  // The JSON must be parsed ONCE per row. A plain select+filter on the
  // alias does not guarantee that: PushPredicateThroughNonJoin
  // substitutes the alias into the pushed condition, leaving
  // `get_json_object` evaluated in the null check, the parity check AND
  // the projection (three parses per row — the round-4 bench outlier).
  // `explode` of a 1-element array is a Generate the filter CANNOT push
  // through (the predicate references the generator's output), so the
  // parse is materialized exactly once and the whole plan stays in
  // whole-stage codegen. PushdownSpec asserts the single evaluation.
  val jsonExtract: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        explode(array(get_json_object(col("props"), "$.k").cast("long"))).as("k"))
      .filter(col("k").isNotNull && col("k") % 2 === 0)
  val jsonExtractSql: String =
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
      |  AND CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0""".stripMargin

  // P1: explode a files[] payload, keep PDFs, rename (fixed_signature_utils.py:292-306).
  val fileExplode: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    docs.select(col("doc_id"), explode(array(
      struct((col("doc_id") * 10 + 1).as("asset_id"), concat(col("source"), lit("_a.pdf")).as("name")),
      struct((col("doc_id") * 10 + 2).as("asset_id"), concat(col("source"), lit("_b.jpg")).as("name")),
      struct((col("doc_id") * 10 + 3).as("asset_id"), concat(col("source"), lit("_c.PDF")).as("name"))
    )).as("f"))
      .select(col("doc_id"), col("f.asset_id").as("asset_id"), col("f.name").as("name"))
      .filter(lower(col("name")).endsWith(".pdf"))
      .select(col("doc_id"), col("asset_id"), concat(col("name"), lit("_SCANNE")).as("out_name"))
  }
  val fileExplodeSql: String =
    """SELECT doc_id, asset_id, name || '_SCANNE' AS out_name
      |FROM (
      |  SELECT doc_id, unnest([
      |    {'asset_id': doc_id*10+1, 'name': source || '_a.pdf'},
      |    {'asset_id': doc_id*10+2, 'name': source || '_b.jpg'},
      |    {'asset_id': doc_id*10+3, 'name': source || '_c.PDF'}], recursive := true)
      |  FROM documents)
      |WHERE lower(name) LIKE '%.pdf'""".stripMargin

  // ---------------------------------------------------------------- P2/F2
  val extFilter: Q = (s, d) => {
    val named = Tables.documents(s, d).select(
      col("doc_id"),
      concat(col("source"),
        when(col("doc_id") % 3 === 0, ".pdf")
          .when(col("doc_id") % 3 === 1, ".XLSX")
          .otherwise(".txt")).as("name"))
    named.select(col("doc_id"), col("name"), StringOps.fileExt(col("name")).as("ext"))
      .filter(col("ext").isin("pdf", "xlsx"))
  }
  val extFilterSql: String =
    """SELECT doc_id, name,
      |       CASE WHEN lower(name) LIKE '%.pdf' THEN 'pdf'
      |            WHEN lower(name) LIKE '%.xlsx' THEN 'xlsx' END AS ext
      |FROM (SELECT doc_id, source || CASE CAST(doc_id % 3 AS INTEGER)
      |        WHEN 0 THEN '.pdf' WHEN 1 THEN '.XLSX' ELSE '.txt' END AS name
      |      FROM documents)
      |WHERE lower(name) LIKE '%.pdf' OR lower(name) LIKE '%.xlsx'""".stripMargin

  // ---------------------------------------------------------------- P3/F1
  // include-any/exclude-any keyword predicate on normalized names
  // (Leyton_depot.py:278-286 over _norm, :133-138).
  val normKeywordFilter: Q = (s, d) => {
    val includes = array(lit("widget"), lit("bolt"))
    val excludes = array(lit("large"))
    val n = norm(col("p_name"))
    Tables.part(s, d)
      .filter(exists(includes, k => n.contains(k)) && !exists(excludes, k => n.contains(k)))
      .select("p_partkey", "p_name", "p_type")
  }
  val normKeywordFilterSql: String =
    """SELECT p_partkey, p_name, p_type FROM part
      |WHERE (trim(regexp_replace(lower(strip_accents(p_name)), '\s+', ' ', 'g')) LIKE '%widget%'
      |   OR  trim(regexp_replace(lower(strip_accents(p_name)), '\s+', ' ', 'g')) LIKE '%bolt%')
      |  AND trim(regexp_replace(lower(strip_accents(p_name)), '\s+', ' ', 'g')) NOT LIKE '%large%'""".stripMargin

  // ---------------------------------------------------------------- J1-J5
  // Lookup-join enrichment chain; small dims are broadcast (SURVEY §2.4 J1).
  val lookupJoin: Q = (s, d) => {
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 100000.0)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    o.join(c, col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("o_orderkey"), col("c_name"), col("n_name"), col("r_name"))
  }
  val lookupJoinSql: String =
    """SELECT o_orderkey, c_name, n_name, r_name
      |FROM orders
      |LEFT JOIN customer ON o_custkey = c_custkey
      |LEFT JOIN nation   ON c_nationkey = n_nationkey
      |LEFT JOIN region   ON n_regionkey = r_regionkey
      |WHERE o_totalprice > 100000.0""".stripMargin

  // Anti join: customers with no HIGH-VALUE order (SURVEY §2.4 "absent but
  // exposed"). The filter on the right side matters twice over: it makes the
  // result non-vacuous (every sf customer has *some* order, so the unfiltered
  // anti join is the empty set and proves nothing), and it is the shape the
  // reference's existence gates take — "no attachment matching the rule" is an
  // anti join against a *filtered* pool, never the raw table.
  private val HighValue = 300000.0
  val antiJoin: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > HighValue),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  val antiJoinSql: String =
    s"""SELECT c_custkey, c_name FROM customer
       |WHERE NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey AND o_totalprice > $HighValue)""".stripMargin

  val semiJoin: Q = (s, d) =>
    Tables.supplier(s, d)
      .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 45),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
  val semiJoinSql: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 45)""".stripMargin

  // ---------------------------------------------------------------- A1/F10
  // max+1 auto-increment over ACT_{n}_ names (Leyton_depot.py:517-545).
  val autoincrement: Q = (s, d) => {
    val named = Tables.supplier(s, d).select(
      when(col("s_suppkey") % 2 === 0,
        concat(lit("ACT_"), (col("s_suppkey") * 3).cast("string"), lit("_X")))
        .otherwise(col("s_name")).as("name"))
    named.agg((coalesce(max(StringOps.actId(col("name"))), lit(0L)) + 1L).as("next_id"))
  }
  val autoincrementSql: String =
    """SELECT CAST(coalesce(max(CAST(nullif(regexp_extract(name, '^ACT_(\d+)_', 1), '') AS BIGINT)), 0) + 1 AS BIGINT) AS next_id
      |FROM (SELECT CASE WHEN s_suppkey % 2 = 0
      |             THEN 'ACT_' || CAST(s_suppkey * 3 AS VARCHAR) || '_X'
      |             ELSE s_name END AS name FROM supplier)""".stripMargin

  // ---------------------------------------------------------------- A2-A4
  // Conditional aggregation + existence gate (Leyton_depot.py:635-645, :688-694).
  // Exact cents-scaled sum keeps double aggregation deterministic cross-engine.
  val conditionalAgg: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("event_type") === "error", 1)).as("n_error"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
      .filter(col("n_error") > 0)
  val conditionalAggSql: String =
    """SELECT user_id,
      |       count(*) AS n_total,
      |       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
      |FROM events GROUP BY user_id HAVING count(*) FILTER (WHERE event_type = 'error') > 0""".stripMargin

  // ---------------------------------------------------------------- P7/F12
  val thresholdCase: Q = (s, d) =>
    Tables.events(s, d).select(col("event_id"),
      when(col("value") > 25.0, "RES010").otherwise("RES020").as("res_code"))
  val thresholdCaseSql: String =
    """SELECT event_id, CASE WHEN value > 25.0 THEN 'RES010' ELSE 'RES020' END AS res_code
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- F7/F4/F3
  val nameTemplate: Q = (s, d) =>
    Tables.customer(s, d).select(
      col("c_custkey"),
      StringOps.actFolderName(col("c_custkey"), col("c_name")).as("act_folder"),
      StringOps.lotName(col("c_custkey") % 12 + 1).as("lot_name"),
      StringOps.sanitizeName(concat(col("c_name"), lit(" a/b:c*d"))).as("sanitized"),
      StringOps.signedFilename(concat(col("c_name"), lit(".pdf"))).as("signed_name"))
  val nameTemplateSql: String =
    """SELECT c_custkey,
      |       'ACT_' || CAST(c_custkey AS VARCHAR) || '_' || regexp_replace(upper(trim(c_name)), '\s+', '_', 'g') AS act_folder,
      |       'CLM_GE_' || lpad(CAST(c_custkey % 12 + 1 AS VARCHAR), 2, '0') AS lot_name,
      |       trim(regexp_replace(regexp_replace(c_name || ' a/b:c*d', '[\\/:*?"<>|]', '-', 'g'), '\s+', ' ', 'g')) AS sanitized,
      |       c_name || ' SIGNÉ.pdf' AS signed_name
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- F5/F6
  val mimeMap: Q = (s, d) => {
    val named = Tables.documents(s, d).select(
      col("doc_id"),
      concat(col("source"), when(col("doc_id") % 4 === 0, ".pdf")
        .when(col("doc_id") % 4 === 1, ".jpg")
        .when(col("doc_id") % 4 === 2, ".xlsx")
        .otherwise("")).as("name"),
      when(col("doc_id") % 5 === 0, "image/png").otherwise(lit(null).cast("string")).as("content_type"))
    named.select(col("doc_id"),
      StringOps.inferMime(col("name"), col("content_type")).as("mime"),
      StringOps.extFromNameOrMime(col("name"), col("content_type")).as("ext"))
  }
  val mimeMapSql: String =
    """SELECT doc_id,
      |  coalesce(content_type,
      |           CASE WHEN lower(name) LIKE '%.pdf' THEN 'application/pdf'
      |                WHEN lower(name) LIKE '%.jpg' THEN 'image/jpeg'
      |                WHEN lower(name) LIKE '%.xlsx' THEN 'application/vnd.openxmlformats-officedocument.spreadsheetml.sheet'
      |           END,
      |           'application/octet-stream') AS mime,
      |  coalesce(CASE WHEN lower(name) LIKE '%.pdf' THEN '.pdf'
      |                WHEN lower(name) LIKE '%.jpg' THEN '.jpg'
      |                WHEN lower(name) LIKE '%.xlsx' THEN '.xlsx' END,
      |           CASE WHEN content_type = 'image/png' THEN '.png' END,
      |           '.bin') AS ext
      |FROM (SELECT doc_id,
      |        source || CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN '.pdf' WHEN 1 THEN '.jpg' WHEN 2 THEN '.xlsx' ELSE '' END AS name,
      |        CASE WHEN doc_id % 5 = 0 THEN 'image/png' END AS content_type
      |      FROM documents)""".stripMargin

  // ---------------------------------------------------------------- D1/D2/S5
  // distinct + chunked batching (Leyton_depot.py:344-350, :190-205).
  val distinctBatch: Q = (s, d) =>
    Picks.withChunkId(
      Tables.lineitem(s, d).select(col("l_partkey")).distinct(),
      col("l_partkey"), 50)
  val distinctBatchSql: String =
    """SELECT l_partkey,
      |       bkt + 32 * CAST((row_number() OVER (PARTITION BY bkt ORDER BY l_partkey) - 1) // 50 AS BIGINT) AS chunk_id
      |FROM (SELECT l_partkey,
      |             CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT) % 32 AS bkt
      |      FROM (SELECT DISTINCT l_partkey FROM lineitem))""".stripMargin

  // ---------------------------------------------------------------- rollup/quantiles
  // SURVEY §2.5 marks grouping sets/cube/rollup and quantiles ABSENT in
  // the reference but covered by Spark built-ins — these two queries
  // prove the claim against the oracle.
  val rollupAgg: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("l_quantity") * 100).cast("long")) / 100.0).as("sum_qty"))
  val rollupAggSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Exact grouped quantiles, DISTRIBUTED, TWO-PASS. Spark's built-in
    * `percentile` is a TypedImperativeAggregate that buffers every
    * (value, count) of a group in ONE in-memory map — with a 5-value
    * group key each final task holds its group's whole column, the
    * textbook plan that cannot survive a 100× scale-up. The previous
    * rank-window formulation fixed the memory blowup (the external
    * sorter spills) but still SORTED each group in one task — serial
    * wall-clock at 100×. This one never sorts a full group:
    *
    *   pass 1 — histogram-grid counts per (group, bin) (one map-side-
    *     combined hash agg, the `q_quantile_hist` shape); a running sum
    *     over the ≤`bins` count rows locates, for each needed rank
    *     r ∈ {1, n, floor/ceil(p·(n-1))+1}, the bin that contains it
    *     and its LOCAL rank inside that bin (r − cum_before);
    *   pass 2 — re-scan restricted (broadcast semi-join) to the ≤6
    *     needed bins per group, row_number ONLY inside those bins
    *     (partition = (group, bin) — a bin's slice, never the group),
    *     keep the rows matching a local rank, one tiny hash-agg.
    *
    * Exactness: the bin index is monotone in the value (values outside
    * the grid clamp into the edge bins, which keeps the order), so
    * global sort order == (bin, value-within-bin) order and
    * `cum_before(bin) + local rank` IS the global rank; equal values
    * always share a bin, so tie order never crosses a bin boundary.
    * The interpolation reproduces percentile's exact fold —
    * `(higher-pos)*lo + (pos-lower)*hi` on `pos = p*(n-1)` — so the
    * result is bit-identical (QuantilesSpec + QuantileProps assert raw
    * bits vs `percentile`) and the DuckDB `quantile_cont` oracle is
    * unchanged. Worst case (every value of a group in ONE bin) degrades
    * to the per-group sort of the old formulation — for a measured
    * distribution, pick the grid to spread it. Nulls: dropped here
    * where `percentile` skips them in the buffer — same result for any
    * group with at least one non-null value.
    */
  val quantiles: Q = (s, d) => quantilesOver(Tables.events(s, d))

  /** The two-pass formulation over any (event_type, value) frame —
    * split out so tests can drive it with edge-case groups. The grid
    * only steers WHERE the exact selection happens; any values land
    * correctly via edge-bin clamping.
    */
  def quantilesOver(events: DataFrame, gridLo: Double = 0.0, gridHi: Double = 500.0,
                    gridBins: Int = 50): DataFrame = {
    val width = (gridHi - gridLo) / gridBins
    val vals = events
      .select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .withColumn("bin",
        least(greatest(floor((col("value") - lit(gridLo)) / lit(width)), lit(0.0)),
          lit((gridBins - 1).toDouble)).cast("long"))
    // pass 1: (group, bin) counts; cum + n over the tiny count rows.
    // The two windows share one partitioning (the n-window needs no
    // sort), and the branches below reuse this subtree's exchange
    // (ReusedExchange — asserted in PushdownSpec).
    val byType = Window.partitionBy(col("event_type"))
    val counts = vals.groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(byType.orderBy(col("bin"))))
      .withColumn("n", sum("c").over(byType))
    // 0-based fractional position of quantile p in a sorted n-row group
    def pos(p: Double) = lit(p) * (col("n") - lit(1)).cast("double")
    def rkLo(p: Double) = floor(pos(p)) + lit(1L) // 1-based straddling ranks
    def rkHi(p: Double) = ceil(pos(p)) + lit(1L)
    val targets = counts.groupBy("event_type").agg(max("n").as("n"))
      .select(col("event_type"), col("n"), explode(array(
        struct(lit("l50").as("tag"), rkLo(0.5).as("r")),
        struct(lit("h50").as("tag"), rkHi(0.5).as("r")),
        struct(lit("l95").as("tag"), rkLo(0.95).as("r")),
        struct(lit("h95").as("tag"), rkHi(0.95).as("r")),
        struct(lit("min").as("tag"), lit(1L).as("r")),
        struct(lit("max").as("tag"), col("n").as("r")))).as("t"))
      .select(col("event_type"), col("n"), col("t.tag").as("tag"), col("t.r").as("r"))
    // rank r lives in the bin with cum_before < r <= cum. The eager
    // localCheckpoint runs pass 1 ONCE and pins its (tiny: ≤6 rows per
    // group) result — without it every downstream use re-plans the
    // whole counts subtree and the "two passes" silently become five
    // scans (PushdownSpec asserts the scan count).
    val located = targets.join(counts.select("event_type", "bin", "c", "cum"), Seq("event_type"))
      .filter(col("cum") - col("c") < col("r") && col("r") <= col("cum"))
      .select(col("event_type"), col("bin"), col("tag"), col("n"),
        (col("r") - (col("cum") - col("c"))).as("local_r"))
      .localCheckpoint(true)
    // pass 2: order statistics ONLY inside the needed bins
    val ranked = vals
      .join(broadcast(located.select("event_type", "bin").distinct()),
        Seq("event_type", "bin"), "left_semi")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"), col("bin")).orderBy(col("value"))))
    val picked = ranked.join(broadcast(located), Seq("event_type", "bin"))
      .filter(col("rn") === col("local_r"))
    def pick(t: String) = max(when(col("tag") === t, col("value")))
    def interp(p: Double, l: Column, h: Column) = {
      val x = pos(p)
      when(ceil(x) === floor(x), l)
        .otherwise((ceil(x) - x) * l + (x - floor(x)) * h)
    }
    picked.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        pick("l50").as("_l50"), pick("h50").as("_h50"),
        pick("l95").as("_l95"), pick("h95").as("_h95"),
        pick("min").as("v_min"), pick("max").as("v_max"))
      .select(col("event_type"),
        interp(0.5, col("_l50"), col("_h50")).as("p50"),
        interp(0.95, col("_l95"), col("_h95")).as("p95"),
        col("v_min"), col("v_max"))
  }
  val quantilesSql: String =
    """SELECT event_type,
      |       quantile_cont(value, 0.5) AS p50,
      |       quantile_cont(value, 0.95) AS p95,
      |       min(value) AS v_min,
      |       max(value) AS v_max
      |FROM events GROUP BY event_type""".stripMargin

  /** The sketch-shaped scale path next to the exact rank-window
    * quantiles: one hash aggregate over a fixed 50-bin grid, no
    * per-group sort — see [[graft.operators.HistogramQuantiles]].
    * Deterministic, so even the "approximate" operator hash-gates.
    */
  private val HistLo = 0.0
  private val HistHi = 500.0
  private val HistBins = 50
  private val HistPs = Seq("p50_est" -> 0.5, "p95_est" -> 0.95, "p99_est" -> 0.99)
  val quantileHist: Q = (s, d) =>
    graft.operators.HistogramQuantiles.quantiles(
      Tables.events(s, d), "event_type", "value", HistLo, HistHi, HistBins, HistPs)
  val quantileHistSql: String =
    graft.operators.HistogramQuantiles.quantilesSql(
      "events", "event_type", "value", HistLo, HistHi, HistBins, HistPs)

  // ---------------------------------------------------------------- §2.11
  // Tumbling-window event counts (batch analog of the streaming pipeline).
  val windowEvents: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "5 minutes").getField("start").as("bucket_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
  val windowEventsSql: String =
    """SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket_start, event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Gap-filled dense hourly series per event type: sparse counts
    * densified onto each type's own [min, max] hour span with explicit
    * zeros — the sparse→dense resample every dashboard / anomaly
    * detector needs (a quiet hour must be a 0 row, not an absent one).
    * Shape: keyed agg → per-type bounds agg → `explode(sequence(...))`
    * generator → keyed left join. No cross join anywhere: each series
    * carries its own grid, so the plan stays keyed end-to-end at any
    * number of series.
    */
  val tsFill: Q = (s, d) => {
    val counts = Tables.events(s, d)
      .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .agg(count(lit(1)).as("n"))
    val grid = counts.groupBy("event_type")
      .agg(min("hr").as("mn"), max("hr").as("mx"))
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("hr"))
    grid.join(counts, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"), coalesce(col("n"), lit(0L)).as("n"))
  }
  val tsFillSql: String =
    """WITH c AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |b AS (SELECT event_type, min(hr) AS mn, max(hr) AS mx FROM c GROUP BY 1),
      |g AS (SELECT event_type, unnest(range(mn, mx + 1)) AS hr FROM b)
      |SELECT g.event_type, g.hr, coalesce(n, 0) AS n
      |FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hr = c.hr""".stripMargin

  /** Rolling z-score anomalies over the gap-filled hourly series: each
    * hour scored against the trailing 24-hour baseline (current point
    * excluded), |z| ≥ 3 flagged. Composes [[tsFill]] — the zeros the
    * fill inserts are exactly what makes a dead hour scorable.
    */
  val tsAnomaly: Q = (s, d) =>
    graft.operators.TimeSeries.rollingZScore(
      tsFill(s, d), "event_type", "hr", "n", lookback = 24, minPoints = 12, zThreshold = 3.0)
  val tsAnomalySql: String =
    """WITH c AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hr,
      |                  count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |b AS (SELECT event_type, min(hr) AS mn, max(hr) AS mx FROM c GROUP BY 1),
      |g AS (SELECT event_type, unnest(range(mn, mx + 1)) AS hr FROM b),
      |f AS (SELECT g.event_type, g.hr, coalesce(n, 0) AS n
      |      FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hr = c.hr),
      |wz AS (SELECT event_type, hr, n,
      |              CAST(sum(n) OVER w AS BIGINT) AS s,
      |              CAST(sum(n * n) OVER w AS BIGINT) AS q,
      |              CAST(count(n) OVER w AS BIGINT) AS c
      |       FROM f
      |       WINDOW w AS (PARTITION BY event_type ORDER BY hr
      |                    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
      |z AS (SELECT event_type, hr, n,
      |             CAST(n * c - s AS DOUBLE) /
      |               (CAST(c AS DOUBLE) *
      |                sqrt(CAST(c * q - s * s AS DOUBLE) / CAST(c * (c - 1) AS DOUBLE))) AS z
      |      FROM wz WHERE c >= 12 AND c * q - s * s > 0)
      |SELECT event_type, hr, n, z,
      |       CASE WHEN abs(z) >= 3.0 THEN 1 ELSE 0 END AS is_anomaly
      |FROM z""".stripMargin

  // ---------------------------------------------------------------- warehouse maintenance
  /** SCD2 dimension build from the events feed: entity = user, tracked
    * attribute = event_type — the history-preserving fold of the
    * reference's last-write-wins column updates.
    */
  val scd2: Q = (s, d) =>
    graft.operators.Scd2.build(Tables.events(s, d), "user_id", "event_type", "ts", "event_id")
  val scd2Sql: String =
    graft.operators.Scd2.buildSql("events", "user_id", "event_type", "ts", "event_id")

  /** Compaction plan over the documents listing (source = directory,
    * n_chars = bytes, 512-byte target — the corpus-scaled stand-in for
    * a 512 MB production target; both branches of the planner are
    * exercised at this threshold).
    */
  private val CompactionTarget = 512L
  val compactionPlan: Q = (s, d) =>
    graft.sources.Layout.compactionPlan(
      Tables.documents(s, d).select(col("source"), col("doc_id"), col("n_chars")),
      "source", "doc_id", "n_chars", CompactionTarget)
  val compactionPlanSql: String =
    graft.sources.Layout.compactionPlanSql("documents", "source", "doc_id", "n_chars", CompactionTarget)

  // ---------------------------------------------------------------- OLAP joins
  /** TPC-H Q3 shape (shipping priority): segment-filtered customers ⋈
    * date-filtered orders ⋈ date-filtered lineitems, revenue per open
    * order. Revenue in exact integer micro-units
    * (`round(price*100) * round((1-disc)*100)`) so partition-order
    * summation cannot drift from DuckDB. Filters sit ON the scans
    * (pushdown), the join keys are the natural shuffle keys, and the
    * customer side reduces to a key list before joining — the plan
    * Catalyst should pick at 100 TB, stated declaratively.
    */
  val tpchQ3: Q = (s, d) => {
    val cutoff = lit("1998-01-01").cast("timestamp_ntz")
    val c = Tables.customer(s, d)
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.orders(s, d).where(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = Tables.lineitem(s, d).where(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
          expr("CAST(round((1 - l_discount) * 100) AS BIGINT)")).as("rev_micro"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum("rev_micro").as("revenue_micro"))
  }
  val tpchQ3Sql: String =
    """SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
      |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
      |                 * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_micro
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l.l_shipdate > TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q5 shape (local supplier volume): the six-table star —
    * customer ⋈ orders ⋈ lineitem ⋈ supplier (with the local-supplier
    * twist `c_nationkey = s_nationkey`) ⋈ nation ⋈ region — revenue per
    * nation in one year and one region. `nation`/`region` are
    * explicitly broadcast (25/5 rows — never worth a shuffle at any
    * scale); the fact-side joins shuffle on their natural keys.
    */
  val tpchQ5: Q = (s, d) => {
    val lo = lit("1996-01-01").cast("timestamp_ntz")
    val hi = lit("1997-01-01").cast("timestamp_ntz")
    val r = Tables.region(s, d).where(col("r_name") === "ASIA").select("r_regionkey")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
    val asiaNations = broadcast(n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name"))
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_custkey")
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
          expr("CAST(round((1 - l_discount) * 100) AS BIGINT)")).as("rev_micro"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum("rev_micro").as("revenue_micro"))
  }
  val tpchQ5Sql: String =
    """SELECT n.n_name,
      |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
      |                 * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_micro
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1""".stripMargin

  /** TPC-H Q6 shape (forecast revenue change): the pure scan-side
    * aggregate — one table, three pushed filters, no join, no window.
    * The discount band compares on `round(disc*100)` integers so the
    * predicate can't straddle a float ulp differently in the two
    * engines; revenue = Σ price_cents × disc_cents in exact integer
    * micro-units. At 100 TB this is the query that proves the scan
    * path: every filter lands in PushedFilters, the projection reads
    * three columns, and the aggregate is a two-phase partial/final.
    */
  val tpchQ6: Q = (s, d) => {
    val lo = lit("1996-01-01").cast("timestamp_ntz")
    val hi = lit("1997-01-01").cast("timestamp_ntz")
    Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
        col("l_quantity") < 24)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("_price_c"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("_disc_c"))
      .where(col("_disc_c") >= 5 && col("_disc_c") <= 7)
      .agg(sum(col("_price_c") * col("_disc_c")).as("revenue_micro"))
  }
  val tpchQ6Sql: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_micro
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_quantity < 24
      |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7""".stripMargin

  /** TPC-H Q4 shape (order-priority checking): orders in a quarter
    * with AT LEAST ONE late lineitem, counted per priority — the
    * EXISTS correlated subquery, which must plan as a LEFT SEMI join
    * (one probe per order, no fan-out from multi-line matches), not an
    * inner join + distinct. The late-line predicate pushes to the
    * lineitem scan.
    */
  val tpchQ4: Q = (s, d) => {
    val lo = lit("1996-01-01").cast("timestamp_ntz")
    val hi = lit("1996-04-01").cast("timestamp_ntz")
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_orderpriority")
    // fixture lineitem has no commitdate/receiptdate; "late" = shipped
    // after the quarter closed, the same exists-one-line shape
    val late = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= hi).select("l_orderkey")
    o.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }
  val tpchQ4Sql: String =
    """SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey
      |                AND l.l_shipdate >= TIMESTAMP '1996-04-01')
      |GROUP BY 1""".stripMargin

  /** TPC-H Q10 shape (returned-item reporting): customers who returned
    * goods in a quarter, ranked by lost revenue — lineitem(returnflag)
    * ⋈ date-windowed orders ⋈ customer ⋈ broadcast nation, grouped at
    * customer grain. The fixture's customer table carries no
    * address/phone/comment, so the output is the key/name/acctbal/
    * nation/revenue core of the Q10 row. Same integer micro-unit
    * revenue; nation broadcast (25 rows); fact joins shuffle on their
    * natural keys.
    */
  val tpchQ10: Q = (s, d) => {
    val lo = lit("1996-01-01").cast("timestamp_ntz")
    val hi = lit("1996-04-01").cast("timestamp_ntz")
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
          expr("CAST(round((1 - l_discount) * 100) AS BIGINT)")).as("rev_micro"))
    // acctbal rides as exact integer cents like every other money
    // column in the parity suite — a raw DOUBLE group key would hang
    // the hash gate on cross-engine float formatting.
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_name"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("acctbal_c"), col("c_nationkey"))
    val n = broadcast(Tables.nation(s, d).select("n_nationkey", "n_name"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("acctbal_c"), col("n_name"))
      .agg(sum("rev_micro").as("revenue_micro"))
  }
  val tpchQ10Sql: String =
    """SELECT c.c_custkey, c.c_name,
      |       CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c, n.n_name,
      |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
      |                 * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_micro
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE l.l_returnflag = 'R'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1996-04-01'
      |GROUP BY 1, 2, 3, 4""".stripMargin

  /** TPC-H Q12 shape (shipping-mode priority): lineitem date-windowed
    * and bucketed, orders joined at fact grain, HIGH (1-URGENT/2-HIGH)
    * vs lower priority counted per bucket — the classic conditional
    * two-way count over a fact⋈fact join. The fixture lineitem has no
    * shipmode column; `l_returnflag` plays the mode (same substitution
    * posture as Q4's shipdate-for-commitdate). Date predicate pushes
    * to the lineitem scan; the join shuffles on the order key.
    */
  val tpchQ12: Q = (s, d) => {
    val lo = lit("1996-01-01").cast("timestamp_ntz")
    val hi = lit("1997-01-01").cast("timestamp_ntz")
    val l = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
        col("l_returnflag").isin("A", "R"))
      .select("l_orderkey", "l_returnflag")
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)).as("low_line_count"))
  }
  val tpchQ12Sql: String =
    """SELECT l.l_returnflag,
      |       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l.l_returnflag IN ('A', 'R')
      |GROUP BY 1""".stripMargin

  /** TPC-H Q14 shape (promotion effect): lineitem ⋈ broadcast-able
    * part dimension, promo revenue vs total in one pass. Emitted as
    * exact integer micro-unit NUMERATOR and DENOMINATOR (the suite's
    * float-free discipline — the percentage division is the consumer's
    * one cheap op, not a hash-gate hazard). `p_type LIKE 'ECO%'`
    * stands in for `PROMO%` on the fixture's type vocabulary.
    */
  val tpchQ14: Q = (s, d) => {
    val lo = lit("1996-01-01").cast("timestamp_ntz")
    val hi = lit("1996-02-01").cast("timestamp_ntz")
    val l = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_partkey"),
        (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
          expr("CAST(round((1 - l_discount) * 100) AS BIGINT)")).as("rev_micro"))
    val p = broadcast(Tables.part(s, d).select(col("p_partkey"),
      col("p_type").startsWith("ECO").as("is_promo")))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("is_promo"), col("rev_micro")).otherwise(0L)).as("promo_micro"),
        sum(col("rev_micro")).as("total_micro"))
  }
  val tpchQ14Sql: String =
    """SELECT CAST(sum(CASE WHEN p.p_type LIKE 'ECO%'
      |                     THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
      |                          * CAST(round((1 - l.l_discount) * 100) AS BIGINT)
      |                     ELSE 0 END) AS BIGINT) AS promo_micro,
      |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
      |                * CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_micro
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1996-02-01'""".stripMargin

  /** TPC-H Q1 — the canonical pure-scan aggregate (no join, no
    * window): one pass over lineitem below the ship-date cutoff,
    * grouped by the two flag columns, every money measure in the
    * integer-exact discipline of Q10/Q12/Q14 (cents; cent×percent
    * "micro" for the discounted price; cent×percent×percent for the
    * charge) and the three averages as floor divisions both engines
    * compute identically. Plan shape: scan with the shipdate filter
    * PUSHED, partial hash agg map-side, one exchange on a 6-ish-row
    * key space — the plan every engine comparison quotes.
    */
  val tpchQ1: Q = (s, d) => {
    val cutoff = lit("1998-09-02").cast("timestamp_ntz")
    Tables.lineitem(s, d)
      .where(col("l_shipdate") <= cutoff)
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qty_c"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("disc_pct"),
        expr("CAST(round(l_tax * 100) AS BIGINT)").as("tax_pct"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qty_c")).as("sum_qty_c"),
        sum(col("price_c")).as("sum_base_c"),
        sum(col("price_c") * (lit(100L) - col("disc_pct"))).as("sum_disc_micro"),
        sum(col("price_c") * (lit(100L) - col("disc_pct")) *
          (lit(100L) + col("tax_pct"))).as("sum_charge_pp"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty_c"), col("sum_base_c"), col("sum_disc_micro"), col("sum_charge_pp"),
        (col("sum_qty_c") / col("count_order")).cast("long").as("avg_qty_c"),
        (col("sum_base_c") / col("count_order")).cast("long").as("avg_price_c"),
        col("count_order"))
  }
  val tpchQ1Sql: String =
    """WITH t AS (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
      |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
      |         CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
      |         CAST(round(l_tax * 100) AS BIGINT) AS tax_pct
      |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'),
      |g AS (
      |  SELECT l_returnflag, l_linestatus,
      |         CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
      |         CAST(sum(price_c) AS BIGINT) AS sum_base_c,
      |         CAST(sum(price_c * (100 - disc_pct)) AS BIGINT) AS sum_disc_micro,
      |         CAST(sum(price_c * (100 - disc_pct) * (100 + tax_pct)) AS BIGINT) AS sum_charge_pp,
      |         CAST(count(*) AS BIGINT) AS count_order
      |  FROM t GROUP BY 1, 2)
      |SELECT l_returnflag, l_linestatus, sum_qty_c, sum_base_c, sum_disc_micro,
      |       sum_charge_pp,
      |       CAST(sum_qty_c // count_order AS BIGINT) AS avg_qty_c,
      |       CAST(sum_base_c // count_order AS BIGINT) AS avg_price_c,
      |       count_order
      |FROM g""".stripMargin

  /** TPC-H Q19's plan shape over the synthetic schema (no
    * p_container/l_shipmode columns here, so the three disjunct arms
    * use brand × size-range × quantity-range): a fact⋈dim join whose
    * predicate is an OR of per-arm conjunctions — the classic
    * disjunctive-pushdown test. The join key conjunct is common to
    * all arms, so Catalyst plans ONE join (broadcast on part) with the
    * disjunction as a post-join filter, and the arm-level single-table
    * conjuncts (brand/size on part, quantity on lineitem) are pushed
    * below the join as an OR-derived prefilter on each side. Revenue
    * in the Q14 integer-micro discipline.
    */
  val tpchQ19: Q = (s, d) => {
    val l = Tables.lineitem(s, d).select(col("l_partkey"), col("l_quantity"),
      (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
        (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)"))).as("rev_micro"))
    val p = broadcast(Tables.part(s, d).select("p_partkey", "p_brand", "p_size"))
    val arm1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1, 11)
    val arm2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10, 20)
    val arm3 = col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
      col("l_quantity").between(20, 30)
    l.join(p, col("l_partkey") === col("p_partkey"))
      .where(arm1 || arm2 || arm3)
      .agg(sum(col("rev_micro")).as("revenue_micro"),
        count(lit(1)).as("n_items"))
  }
  val tpchQ19Sql: String =
    """SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
      |                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
      |         AS revenue_micro,
      |       CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
      |       AND l.l_quantity BETWEEN 1 AND 11)
      |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
      |       AND l.l_quantity BETWEEN 10 AND 20)
      |   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
      |       AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** TPC-H Q13's plan shape (customer order-count distribution): a
    * LEFT OUTER fact join with a pushed right-side predicate (the
    * synthetic schema has no o_comment, so the non-urgent-priority
    * filter stands in), then TWO aggregation levels — per-customer
    * count, then the histogram of counts. Customers with no surviving
    * orders land in the c_count=0 bucket through the outer join, the
    * part a naive inner-join rewrite silently loses.
    */
  val tpchQ13: Q = (s, d) => {
    val c = Tables.customer(s, d).select("c_custkey")
    val o = Tables.orders(s, d)
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }
  val tpchQ13Sql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      |      FROM customer c LEFT OUTER JOIN orders o
      |        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |      GROUP BY c.c_custkey)
      |GROUP BY c_count""".stripMargin

  /** TPC-H Q18 (large-volume orders): the HAVING-driven semi join —
    * per-order quantity sums filtered by a threshold feed back as the
    * keep-set for the customer⋈orders⋈lineitem detail aggregation.
    * Quantity rides as exact integer cents; no LIMIT (the classic
    * top-100 is tie-nondeterministic, and the gate hashes every row).
    */
  val tpchQ18: Q = (s, d) => {
    val l = Tables.lineitem(s, d).select(col("l_orderkey"),
      expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qty_c"))
    val big = l.groupBy("l_orderkey").agg(sum(col("qty_c")).as("sum_qty_c"))
      .where(col("sum_qty_c") > 25000L)
      .select(col("l_orderkey").as("big_orderkey"), col("sum_qty_c"))
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate",
      "o_totalprice")
    val c = Tables.customer(s, d).select("c_custkey", "c_name")
    big.join(o, col("big_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("totalprice_c"),
        col("sum_qty_c"))
  }
  val tpchQ18Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey, CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 25000)
      |SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
      |       CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_c,
      |       big.sum_qty_c
      |FROM big JOIN orders o ON big.l_orderkey = o.o_orderkey
      |         JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin

  /** TPC-H Q22's plan shape (global sales opportunity): a scalar
    * aggregate subquery (the positive-balance average, in exact
    * integer cents with floor division so both engines agree at the
    * boundary), an ANTI join against RECENT orders (the "no orders in
    * N years" clause — without the date filter the synthetic data's
    * dense order coverage leaves the result empty), and a final group
    * on the country-code stand-in (c_nationkey — the synthetic schema
    * has no c_phone).
    */
  val tpchQ22: Q = (s, d) => {
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("acctbal_c"))
    val avgRow = c.where(col("acctbal_c") > 0L)
      .agg((sum(col("acctbal_c")) / count(lit(1))).cast("long").as("avg_c"))
    val rich = c.join(broadcast(avgRow)).where(col("acctbal_c") > col("avg_c"))
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lit("2001-01-01").cast("timestamp_ntz"))
      .select(col("o_custkey"))
    rich.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), sum(col("acctbal_c")).as("totacctbal_c"))
  }
  val tpchQ22Sql: String =
    """WITH c AS (SELECT c_custkey, c_nationkey,
      |                  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c
      |           FROM customer),
      |a AS (SELECT CAST(sum(acctbal_c) // count(*) AS BIGINT) AS avg_c
      |      FROM c WHERE acctbal_c > 0)
      |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
      |       CAST(sum(acctbal_c) AS BIGINT) AS totacctbal_c
      |FROM c, a
      |WHERE acctbal_c > avg_c
      |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |                  AND o.o_orderdate >= TIMESTAMP '2001-01-01')
      |GROUP BY c_nationkey""".stripMargin

  /** TPC-H Q7 (volume shipping between two nations): the classic
    * double-dimension join — lineitem⋈orders⋈supplier⋈customer with
    * TWO broadcast copies of nation under the symmetric country-pair
    * disjunction, revenue by ship year in the integer-micro
    * discipline. The plan wants both nation copies broadcast and the
    * pair predicate applied post-join — the shape engine comparisons
    * use to check self-join aliasing.
    */
  val tpchQ7: Q = (s, d) => {
    val lo = lit("1996-01-01").cast("timestamp_ntz")
    val hi = lit("1998-01-01").cast("timestamp_ntz")
    val l = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .select(col("l_orderkey"), col("l_suppkey"), year(col("l_shipdate")).as("l_year"),
        (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
          (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)"))).as("volume_micro"))
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val n1 = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation")))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("n1_key"))
      .join(n2, col("c_nationkey") === col("n2_key"))
      .where((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("volume_micro")).as("revenue_micro"),
        count(lit(1)).as("n_items"))
  }
  val tpchQ7Sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
      |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
      |                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
      |         AS revenue_micro,
      |       CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      |WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
      |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q17 (small-quantity-order revenue): the correlated
    * per-part average subquery, DIVISION-FREE — the classic
    * `l_quantity < 0.2 * avg(l_quantity per part)` becomes
    * `5 · qty · n_part < sum_qty_part` in exact integers, so both
    * engines agree at the boundary with no float threshold at all.
    * Plan shape: a per-part aggregate re-joined to the fact on the
    * part key (the decorrelated form every optimizer rewrites to),
    * with the Brand#23 broadcast semi-joined into the aggregate INPUT
    * so only qualifying parts' lineitems shuffle (r15).
    */
  val tpchQ17: Q = (s, d) => {
    val l = Tables.lineitem(s, d).select(col("l_partkey"),
      expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qty_c"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"))
    val p = broadcast(Tables.part(s, d)
      .where(col("p_brand") === "Brand#23").select("p_partkey"))
    // semi-join the Brand#23 broadcast BEFORE the per-part aggregate:
    // the aggregate is per-part, so pre-filtering to qualifying parts
    // computes identical sums while shuffling ~1/25 of lineitem on
    // l_partkey instead of all of it (the r14 plan-audit nit — at
    // 100× this exchange was doing 25× the needed work)
    val lq = l.join(p, col("l_partkey") === col("p_partkey"), "left_semi")
    val perPart = lq.groupBy("l_partkey")
      .agg(sum(col("qty_c")).as("sum_qty_c"), count(lit(1)).as("n_part"))
      .withColumnRenamed("l_partkey", "a_partkey")
    lq.join(perPart, col("l_partkey") === col("a_partkey"))
      .where(col("qty_c") * 5L * col("n_part") < col("sum_qty_c"))
      .agg(sum(col("price_c")).as("sum_price_c"), count(lit(1)).as("n_items"))
  }
  val tpchQ17Sql: String =
    """WITH l AS (SELECT l_partkey,
      |                  CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
      |                  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
      |           FROM lineitem),
      |a AS (SELECT l_partkey AS a_partkey,
      |             CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
      |             CAST(count(*) AS BIGINT) AS n_part
      |      FROM l GROUP BY 1)
      |SELECT CAST(sum(l.price_c) AS BIGINT) AS sum_price_c,
      |       CAST(count(*) AS BIGINT) AS n_items
      |FROM l
      |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#23'
      |JOIN a ON l.l_partkey = a.a_partkey
      |WHERE l.qty_c * 5 * a.n_part < a.sum_qty_c""".stripMargin

  /** TPC-H Q21 (suppliers who kept orders waiting) — the hardest
    * classic join shape in the suite: an EXISTS plus a NOT EXISTS,
    * both self-joins on the fact table. Here decorrelated the way a
    * 100 TB plan wants it: ONE pass over status-F lineitems computes
    * per-order `countDistinct(supplier)` and
    * `countDistinct(supplier WHERE late)`, and a late line qualifies
    * iff the order has >1 supplier and EXACTLY one late one (itself) —
    * two aggregates replacing two correlated sub-scans. The oracle SQL
    * keeps the classic EXISTS/NOT-EXISTS form, so the gate proves the
    * rewrite. The fixture has no commit/receipt dates; "late" = shipped
    * more than 60 days after the order date (the q_tpch_q4 adaptation).
    */
  val tpchQ21: Q = (s, d) => {
    val o = Tables.orders(s, d).where(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
    val lo = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", datediff(col("l_shipdate"), col("o_orderdate")) > 60)
      .select("l_orderkey", "l_suppkey", "late")
    val ord = lo.groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
      .where(col("n_supp") > 1 && col("n_late_supp") === 1)
      .select(col("l_orderkey").as("q_orderkey"))
    val sup = broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")
      .join(Tables.nation(s, d).where(col("n_name") === "NATION_3").select("n_nationkey"),
        col("s_nationkey") === col("n_nationkey"), "left_semi"))
    lo.where(col("late"))
      .join(ord, col("l_orderkey") === col("q_orderkey"), "left_semi")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
  }
  val tpchQ21Sql: String =
    """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier s
      |JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
      |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
      |WHERE datediff('day', o.o_orderdate, l1.l_shipdate) > 60
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND datediff('day', o.o_orderdate, l3.l_shipdate) > 60)
      |GROUP BY 1""".stripMargin

  /** TPC-H Q8 (national market share), DIVISION-FREE: the classic
    * `sum(case nation) / sum(volume)` ratio is reported as the exact
    * integer (numerator, denominator) pair in micro-units — the same
    * no-float-threshold discipline as Q17. Join shape: the full
    * 8-table star — part-filtered lineitem ⋈ orders(date window) ⋈
    * customer ⋈ nation ⋈ region(broadcast, filtered) on the demand
    * side, supplier ⋈ nation(broadcast) on the supply side.
    */
  val tpchQ8: Q = (s, d) => {
    val lo = lit("1996-01-01").cast("timestamp_ntz")
    val hi = lit("1998-01-01").cast("timestamp_ntz")
    val p = broadcast(Tables.part(s, d)
      .where(col("p_type") === "PROMO").select("p_partkey"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"),
      col("l_suppkey"),
      (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
        (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)"))).as("volume_micro"))
    val o = Tables.orders(s, d)
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val nCust = broadcast(Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).where(col("r_name") === "AMERICA")
        .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"), "left_semi")
      .select(col("n_nationkey").as("cn_key")))
    val sup = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    val nSupp = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    l.join(p, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nCust, col("c_nationkey") === col("cn_key"), "left_semi")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(nSupp, col("s_nationkey") === col("sn_key"))
      .groupBy(col("o_year"))
      .agg(sum(when(col("supp_nation") === "NATION_3", col("volume_micro"))
        .otherwise(0L)).as("nation_volume_micro"),
        sum(col("volume_micro")).as("total_volume_micro"))
  }
  val tpchQ8Sql: String =
    """SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
      |       CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
      |                     THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
      |                          * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
      |                     ELSE 0 END) AS BIGINT) AS nation_volume_micro,
      |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
      |                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
      |         AS total_volume_micro
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      |JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
      |JOIN supplier sp ON l.l_suppkey = sp.s_suppkey
      |JOIN nation n2 ON sp.s_nationkey = n2.n_nationkey
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1""".stripMargin

  /** TPC-H Q15 (top supplier): the view-plus-scalar-max shape — a
    * quarter's per-supplier revenue, then the supplier(s) achieving
    * the global maximum. The max is ONE row broadcast into the
    * revenue relation (the sanctioned 1-row-broadcast NLJ, same as
    * Q22's average); revenue rides exact integer micro-units so a tie
    * at the max is exact on both engines.
    */
  val tpchQ15: Q = (s, d) => {
    val lo = lit("1996-01-01").cast("timestamp_ntz")
    val hi = lit("1996-04-01").cast("timestamp_ntz")
    val rev = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .groupBy(col("l_suppkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
        (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
        .as("total_revenue_micro"))
    val maxRev = rev.agg(max(col("total_revenue_micro")).as("max_rev"))
    rev.join(broadcast(maxRev))
      .where(col("total_revenue_micro") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_micro"))
  }
  val tpchQ15Sql: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |                  * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
      |           AS total_revenue_micro
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s.s_suppkey, s.s_name, r.total_revenue_micro
      |FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
      |WHERE r.total_revenue_micro = (SELECT max(total_revenue_micro) FROM revenue)""".stripMargin

  /** The oracle-side twin of [[graft.Tables.partsupp]] — the SAME
    * dbgen-shaped derivation as a DuckDB CTE prefix, so the five
    * partsupp queries compare Spark's derived relation against an
    * independently-derived one (the formula is the contract; neither
    * engine sees the other's rows). Prepend as
    * `s"WITH $partsuppCte, ..."`.
    */
  val partsuppCte: String =
    """st AS (SELECT count(*) AS s FROM supplier),
      |ps0 AS (
      |  SELECT p_partkey, i, s,
      |         (p_partkey + i * (s//4 + ((p_partkey // s) % (s//4)))) % s AS ps_suppkey
      |  FROM part, st, (SELECT unnest([0,1,2,3]) AS i)),
      |partsupp AS (
      |  SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
      |         CAST(ps_suppkey AS BIGINT) AS ps_suppkey,
      |         CAST((p_partkey*(i+1)*7 + 11) % 9999 + 1 AS BIGINT) AS ps_availqty,
      |         CAST((p_partkey*73 + ps_suppkey*179 + i*7919) % 99901 + 100 AS BIGINT) AS ps_supplycost_c
      |  FROM ps0)""".stripMargin

  /** TPC-H Q2 (minimum-cost supplier): for each qualifying part, the
    * EUROPE supplier(s) offering the global-minimum supply cost — the
    * correlated MIN subquery. The oracle keeps the correlated form;
    * Spark runs the decorrelated one with the part filter PUSHED INTO
    * the aggregate input (the Q17 trick: the min is per-part, so
    * restricting the agg to qualifying parts computes identical mins
    * while aggregating ~1/20 of the offers). Fixture adaptation: no
    * p_mfgr / s_address / s_phone / s_comment columns, so the output
    * is the acctbal/name/nation/part/cost core of the Q2 row;
    * `p_type = 'STANDARD' AND p_size <= 15` stands in for
    * `%BRASS`+size (reference picks queries/SURVEY §2 J-family).
    */
  val tpchQ2: Q = (s, d) => {
    val euroNations = broadcast(Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).where(col("r_name") === "EUROPE")
        .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"), "left_semi")
      .select("n_nationkey", "n_name"))
    val euroSup = broadcast(Tables.supplier(s, d)
      .join(euroNations, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"),
        expr("CAST(round(s_acctbal * 100) AS BIGINT)").as("s_acctbal_c"), col("n_name")))
    val p = broadcast(Tables.part(s, d)
      .where(col("p_type") === "STANDARD" && col("p_size") <= 15).select("p_partkey"))
    val offers = Tables.partsupp(s, d)
      .join(p, col("ps_partkey") === col("p_partkey"), "left_semi")
      .join(euroSup, col("ps_suppkey") === col("s_suppkey"))
      .select("ps_partkey", "ps_supplycost_c", "s_name", "s_acctbal_c", "n_name")
    val minCost = offers.groupBy(col("ps_partkey").as("m_partkey"))
      .agg(min(col("ps_supplycost_c")).as("min_cost_c"))
    offers.join(minCost, col("ps_partkey") === col("m_partkey") &&
        col("ps_supplycost_c") === col("min_cost_c"))
      .select(col("s_acctbal_c"), col("s_name"), col("n_name"),
        col("ps_partkey").as("p_partkey"), col("ps_supplycost_c"))
  }
  val tpchQ2Sql: String =
    s"""WITH $partsuppCte,
      |euro_sup AS (
      |  SELECT s.s_suppkey, s.s_name, CAST(round(s.s_acctbal*100) AS BIGINT) AS s_acctbal_c, n.n_name
      |  FROM supplier s
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'),
      |offers AS (
      |  SELECT ps.ps_partkey, ps.ps_supplycost_c, e.s_suppkey, e.s_name, e.s_acctbal_c, e.n_name
      |  FROM partsupp ps JOIN euro_sup e ON ps.ps_suppkey = e.s_suppkey)
      |SELECT o.s_acctbal_c, o.s_name, o.n_name, p.p_partkey, o.ps_supplycost_c
      |FROM part p JOIN offers o ON p.p_partkey = o.ps_partkey
      |WHERE p.p_type = 'STANDARD' AND p.p_size <= 15
      |  AND o.ps_supplycost_c = (SELECT min(o2.ps_supplycost_c) FROM offers o2
      |                           WHERE o2.ps_partkey = p.p_partkey)""".stripMargin

  /** TPC-H Q9 (product type profit): profit per supplier-nation per
    * order-year over one part family, where profit nets the supply
    * cost — the query that NEEDS partsupp (ps_supplycost joins on the
    * composite (partkey, suppkey) pair). Exact integer micro-units
    * end-to-end: price_c·(100−disc_c) − supplycost_c·qty_c, both
    * 10^-4 currency units. Join shape: lineitem semi-filtered by the
    * broadcast part family, then the PAIR join against partsupp
    * (broadcast — 4×|part| rows, dimension-scale), supplier+nation
    * broadcast, one shuffle against orders on the order key.
    */
  val tpchQ9: Q = (s, d) => {
    val redParts = broadcast(Tables.part(s, d)
      .where(col("p_name").like("red%")).select("p_partkey"))
    val ps = broadcast(Tables.partsupp(s, d)
      .join(redParts, col("ps_partkey") === col("p_partkey"), "left_semi")
      .select("ps_partkey", "ps_suppkey", "ps_supplycost_c"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"),
      col("l_suppkey"),
      expr("CAST(round(l_quantity * 100) AS BIGINT)").as("qty_c"),
      (expr("CAST(round(l_extendedprice * 100) AS BIGINT)") *
        (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)"))).as("gross_micro"))
    val sup = broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"))
    val n = broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name").as("nation")))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    l.join(ps, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("gross_micro") - col("ps_supplycost_c") * col("qty_c"))
        .as("profit_micro"))
  }
  val tpchQ9Sql: String =
    s"""WITH $partsuppCte
      |SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
      |       CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
      |                  * (100 - CAST(round(l.l_discount*100) AS BIGINT))
      |                - ps.ps_supplycost_c * CAST(round(l.l_quantity*100) AS BIGINT)) AS BIGINT)
      |         AS profit_micro
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE 'red%'
      |JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY 1, 2""".stripMargin

  /** TPC-H Q11 (important stock): per-part stock value within one
    * region's suppliers, keeping parts above a global threshold — the
    * group-HAVING-over-a-global-scalar shape (1-row broadcast, like
    * Q15's max and Q22's average). Classic Q11's fraction scales as
    * 0.0001/SF; here the threshold is per-part-relative (value >
    * 1.5× the average per-part share, cross-multiplied so the
    * comparison is exact-integer) which is scale-stable by
    * construction — the fixed-fraction form returned 0 rows at sf0.1.
    */
  val tpchQ11: Q = (s, d) => {
    val euroSup = broadcast(Tables.supplier(s, d)
      .join(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).where(col("r_name") === "EUROPE")
          .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"), "left_semi")
        .select("n_nationkey"), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select("s_suppkey"))
    val natps = Tables.partsupp(s, d)
      .join(euroSup, col("ps_suppkey") === col("s_suppkey"), "left_semi")
      .select(col("ps_partkey"), (col("ps_supplycost_c") * col("ps_availqty")).as("value_c"))
    val perPart = natps.groupBy("ps_partkey").agg(sum("value_c").as("value_c"))
    val total = broadcast(natps.agg(sum("value_c").as("total_c")))
    val nParts = broadcast(Tables.part(s, d).agg(count(lit(1)).as("n_parts")))
    perPart.crossJoin(total).crossJoin(nParts)
      .where(col("value_c") * col("n_parts") * 2 > col("total_c") * 3)
      .select("ps_partkey", "value_c")
  }
  val tpchQ11Sql: String =
    s"""WITH $partsuppCte,
      |natps AS (
      |  SELECT ps.ps_partkey, ps.ps_supplycost_c * ps.ps_availqty AS value_c
      |  FROM partsupp ps
      |  JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      |  JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE')
      |SELECT ps_partkey, CAST(sum(value_c) AS BIGINT) AS value_c
      |FROM natps GROUP BY 1
      |HAVING sum(value_c) * (SELECT count(*) FROM part) * 2 > (SELECT sum(value_c) FROM natps) * 3""".stripMargin

  /** TPC-H Q16 (parts/supplier relationship): distinct supplier count
    * per (brand, type, size) bucket, excluding one brand/type and the
    * "complaint" suppliers — the distinct-count-plus-anti-join shape.
    * The NOT IN is a broadcast anti-join (the exclusion list is tiny
    * and contains no NULLs — s_suppkey is the PK). Fixture
    * adaptation: no s_comment, so `s_acctbal < 0` stands in for the
    * complaints predicate (empty at sf0.001, 6 suppliers at sf0.01,
    * 81 at sf0.1 — an empty exclusion set just makes the anti-join a
    * no-op, which is well-defined on both engines).
    */
  val tpchQ16: Q = (s, d) => {
    val sizes = Seq(1, 4, 9, 14, 19, 23, 36, 45)
    val p = broadcast(Tables.part(s, d)
      .where(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size"))
    val complaints = broadcast(Tables.supplier(s, d)
      .where(col("s_acctbal") < 0).select("s_suppkey"))
    Tables.partsupp(s, d)
      .join(p, col("ps_partkey") === col("p_partkey"))
      .join(complaints, col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
  }
  val tpchQ16Sql: String =
    s"""WITH $partsuppCte
      |SELECT p.p_brand, p.p_type, p.p_size,
      |       CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
      |FROM partsupp ps JOIN part p ON p.p_partkey = ps.ps_partkey
      |WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      |  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin

  /** TPC-H Q20 (potential part promotion): suppliers in one region
    * holding excess stock of one part family — the NESTED SEMI-JOIN
    * CHAIN (supplier IN partsupp IN part, with a correlated lineitem
    * aggregate inside). The oracle keeps the nested-IN form with the
    * correlated per-(part,supplier) sum; Spark decorrelates it to a
    * pair-grain aggregate inner-joined back (the inner join drops
    * pairs with no shipped lines, matching NULL-comparison semantics
    * of the correlated form). Quantities sum as exact integer cents
    * BEFORE the comparison so the threshold can't straddle a float
    * ulp. Fixture adaptation: availqty is ~uniform 1..9999 while a
    * year's shipped qty_c per pair is ~2500, so the spec's 0.5×
    * threshold is rescaled (`ps_availqty*2 > sum_qty_c`, i.e. stock >
    * 50× shipped quantity) to keep the predicate binding both ways.
    */
  val tpchQ20: Q = (s, d) => {
    val lo = lit("1996-01-01").cast("timestamp_ntz")
    val hi = lit("1997-01-01").cast("timestamp_ntz")
    val blueParts = broadcast(Tables.part(s, d)
      .where(col("p_name").like("blue%")).select("p_partkey"))
    val bluePs = Tables.partsupp(s, d)
      .join(blueParts, col("ps_partkey") === col("p_partkey"), "left_semi")
    val shipped = Tables.lineitem(s, d)
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(blueParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("sum_qty_c"))
    val excess = bluePs.join(shipped,
        col("ps_partkey") === col("l_partkey") && col("ps_suppkey") === col("l_suppkey"))
      .where(col("ps_availqty") * 2 > col("sum_qty_c"))
      .select("ps_suppkey")
    Tables.supplier(s, d)
      .join(Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).where(col("r_name") === "EUROPE")
          .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"), "left_semi")
        .select("n_nationkey"), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
  }
  val tpchQ20Sql: String =
    s"""WITH $partsuppCte
      |SELECT s.s_suppkey, s.s_name
      |FROM supplier s
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
      |WHERE s.s_suppkey IN (
      |  SELECT ps_suppkey FROM partsupp
      |  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%')
      |    AND ps_availqty * 2 > (SELECT sum(CAST(round(l_quantity*100) AS BIGINT))
      |                           FROM lineitem
      |                           WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      |                             AND l_shipdate >= TIMESTAMP '1996-01-01'
      |                             AND l_shipdate < TIMESTAMP '1997-01-01'))""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_tpch_q2" -> tpchQ2,
    "q_tpch_q9" -> tpchQ9,
    "q_tpch_q11" -> tpchQ11,
    "q_tpch_q16" -> tpchQ16,
    "q_tpch_q20" -> tpchQ20,
    "q_tpch_q1" -> tpchQ1,
    "q_tpch_q8" -> tpchQ8,
    "q_tpch_q15" -> tpchQ15,
    "q_tpch_q21" -> tpchQ21,
    "q_tpch_q7" -> tpchQ7,
    "q_tpch_q17" -> tpchQ17,
    "q_tpch_q13" -> tpchQ13,
    "q_tpch_q18" -> tpchQ18,
    "q_tpch_q22" -> tpchQ22,
    "q_tpch_q19" -> tpchQ19,
    "q_tpch_q12" -> tpchQ12,
    "q_tpch_q14" -> tpchQ14,
    "q_tpch_q3" -> tpchQ3,
    "q_tpch_q4" -> tpchQ4,
    "q_tpch_q6" -> tpchQ6,
    "q_tpch_q10" -> tpchQ10,
    "q_tpch_q5" -> tpchQ5,
    "q_scd2" -> scd2,
    "q_compaction_plan" -> compactionPlan,
    "q_pick_latest" -> pickLatest,
    "q_pick_first" -> pickFirst,
    "q_pick_all_max" -> pickAllMax,
    "q_dedup_oldest" -> dedupOldest,
    "q_point_lookup" -> pointLookup,
    "q_coalesce_fallback" -> coalesceFallback,
    "q_json_extract" -> jsonExtract,
    "q_file_explode" -> fileExplode,
    "q_ext_filter" -> extFilter,
    "q_norm_keyword_filter" -> normKeywordFilter,
    "q_lookup_join" -> lookupJoin,
    "q_anti_join" -> antiJoin,
    "q_semi_join" -> semiJoin,
    "q_autoincrement" -> autoincrement,
    "q_conditional_agg" -> conditionalAgg,
    "q_threshold_case" -> thresholdCase,
    "q_name_template" -> nameTemplate,
    "q_mime_map" -> mimeMap,
    "q_distinct_batch" -> distinctBatch,
    "q_rollup_agg" -> rollupAgg,
    "q_quantiles" -> quantiles,
    "q_quantile_hist" -> quantileHist,
    "q_window_events" -> windowEvents,
    "q_ts_fill" -> tsFill,
    "q_ts_anomaly" -> tsAnomaly)

  val oracleSql: Map[String, String] = Map(
    "q_tpch_q2" -> tpchQ2Sql,
    "q_tpch_q9" -> tpchQ9Sql,
    "q_tpch_q11" -> tpchQ11Sql,
    "q_tpch_q16" -> tpchQ16Sql,
    "q_tpch_q20" -> tpchQ20Sql,
    "q_tpch_q1" -> tpchQ1Sql,
    "q_tpch_q8" -> tpchQ8Sql,
    "q_tpch_q15" -> tpchQ15Sql,
    "q_tpch_q21" -> tpchQ21Sql,
    "q_tpch_q7" -> tpchQ7Sql,
    "q_tpch_q17" -> tpchQ17Sql,
    "q_tpch_q13" -> tpchQ13Sql,
    "q_tpch_q18" -> tpchQ18Sql,
    "q_tpch_q22" -> tpchQ22Sql,
    "q_tpch_q19" -> tpchQ19Sql,
    "q_tpch_q12" -> tpchQ12Sql,
    "q_tpch_q14" -> tpchQ14Sql,
    "q_tpch_q3" -> tpchQ3Sql,
    "q_tpch_q4" -> tpchQ4Sql,
    "q_tpch_q6" -> tpchQ6Sql,
    "q_tpch_q10" -> tpchQ10Sql,
    "q_tpch_q5" -> tpchQ5Sql,
    "q_scd2" -> scd2Sql,
    "q_compaction_plan" -> compactionPlanSql,
    "q_pick_latest" -> pickLatestSql,
    "q_pick_first" -> pickFirstSql,
    "q_pick_all_max" -> pickAllMaxSql,
    "q_dedup_oldest" -> dedupOldestSql,
    "q_point_lookup" -> pointLookupSql,
    "q_coalesce_fallback" -> coalesceFallbackSql,
    "q_json_extract" -> jsonExtractSql,
    "q_file_explode" -> fileExplodeSql,
    "q_ext_filter" -> extFilterSql,
    "q_norm_keyword_filter" -> normKeywordFilterSql,
    "q_lookup_join" -> lookupJoinSql,
    "q_anti_join" -> antiJoinSql,
    "q_semi_join" -> semiJoinSql,
    "q_autoincrement" -> autoincrementSql,
    "q_conditional_agg" -> conditionalAggSql,
    "q_threshold_case" -> thresholdCaseSql,
    "q_name_template" -> nameTemplateSql,
    "q_mime_map" -> mimeMapSql,
    "q_distinct_batch" -> distinctBatchSql,
    "q_rollup_agg" -> rollupAggSql,
    "q_quantiles" -> quantilesSql,
    "q_quantile_hist" -> quantileHistSql,
    "q_window_events" -> windowEventsSql,
    "q_ts_fill" -> tsFillSql,
    "q_ts_anomaly" -> tsAnomalySql)
}
