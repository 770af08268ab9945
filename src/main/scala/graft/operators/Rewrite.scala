package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus REWRITING: operators that edit document text, not just flag
  * or drop whole documents — the C4 "remove any repeated three-sentence
  * span" and RefinedWeb "strip boilerplate lines" family. The existing
  * passage operators ([[Dedup]] spans/CDC/containment) REPORT overlap;
  * these reconstruct each document from its surviving segments, which
  * is what a cleaning pipeline actually ships.
  *
  * Segmentation: fixed k-word windows (the fixture corpus has no
  * sentence or line boundaries; on real data the same operators take a
  * sentence/line splitter — only the chunk expression changes). Chunk
  * text is the join of its words, so equality is exact-match, not
  * hashed: no collision caveat in the rewrite path.
  *
  * Determinism / scale shape (both hash-gate against DuckDB):
  *   - first-owner attribution is ONE chunk-keyed min(struct)
  *     AGGREGATE (lexicographic: min doc, then min position) — never
  *     a window over occurrences, so a boilerplate chunk owned by
  *     millions of docs costs one map-side-combined groupBy, not one
  *     giant task;
  *   - reassembly is a per-doc sort of that doc's own ≤⌈len/k⌉ chunks
  *     (collect_list + sort_array — bounded by document length, the
  *     same bound as parsing the document in the first place);
  *   - every join is a chunk- or doc-keyed equi-join.
  */
object Rewrite {

  /** `(idCol, _g, _chunk)`: consecutive k-word windows per document,
    * `_g` the 0-based window index (last window may be short).
    */
  private def chunks(docs: DataFrame, idCol: String, textCol: String, k: Int,
                     extra: Seq[String] = Nil): DataFrame = {
    val keys = (idCol +: extra).map(col)
    docs
      .select(keys :+ filter(Hashing.words(col(textCol)), w => length(w) > 0).as("_w"): _*)
      .filter(size(col("_w")) > 0)
      .select(keys :+ posexplode(expr(
        s"transform(sequence(0, (size(_w) + ${k - 1}) div $k - 1), g -> array_join(slice(_w, g * $k + 1, $k), ' '))")): _*)
      .withColumnRenamed("pos", "_g").withColumnRenamed("col", "_chunk")
  }

  /** SQL twin of [[chunks]] ending in CTE `c(idCol, extras..., g, chunk)`. */
  private def chunksCtes(table: String, idCol: String, textCol: String, k: Int,
                         extra: Seq[String] = Nil): String = {
    val keys = (idCol +: extra).mkString(", ")
    s"""t AS (SELECT $keys, list_filter(${Hashing.wordsSql(textCol)}, x -> length(x) > 0) AS w
       |      FROM $table),
       |cg AS (SELECT $keys, unnest(range(0, CAST((len(w) + ${k - 1}) // $k AS BIGINT))) AS g, w
       |       FROM t WHERE len(w) > 0),
       |c AS (SELECT $keys, g, list_aggregate(w[g * $k + 1 : g * $k + $k], 'string_agg', ' ') AS chunk
       |      FROM cg)""".stripMargin
  }

  /** First-owner table of a corpus' chunks: `(_chunk, _od, _og)` — the
    * smallest doc id holding each distinct chunk and the smallest
    * position there — ONE chunk-keyed min(struct) aggregate
    * (lexicographic min = min doc, then min position; the
    * ProcessedLedger.canonicalPerKey pattern); these rows are
    * the rewrite family's persistable sufficient statistics
    * ([[graft.operators.Artifacts]] saves them, deltas append, and
    * re-minning the union IS the merge — min is associative per
    * dimension when applied hierarchically: global min doc = min of
    * part-min docs, and the winning doc's min position survives in
    * whichever part carried that doc).
    */
  def chunkOwners(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val c = chunks(docs, idCol, textCol, k)
    ownersOf(c, idCol)
  }

  private def ownersOf(c: DataFrame, idCol: String): DataFrame =
    c.groupBy("_chunk")
      .agg(min(struct(col(idCol), col("_g"))).as("_own"))
      .select(col("_chunk"), col("_own").getField(idCol).as("_od"),
        col("_own").getField("_g").as("_og"))

  /** Merge owner tables (base + deltas) back to one first owner per
    * chunk — the same lexicographic min as [[chunkOwners]], over
    * candidate rows instead of occurrences.
    */
  def mergeOwners(owners: DataFrame): DataFrame =
    owners.groupBy("_chunk")
      .agg(min(struct(col("_od"), col("_og"))).as("_own"))
      .select(col("_chunk"), col("_own").getField("_od").as("_od"),
        col("_own").getField("_og").as("_og"))

  /** Rewrite `docs` against a FROZEN owner table: a chunk survives in
    * doc d at position g iff the owner table says (d, g) owns it.
    * CONTRACT: the owner table must COVER `docs`' chunks (append the
    * docs' own part-owners before scrubbing, as q_scrub_delta and
    * startLedgeredSpanScrub do) — a chunk absent from the table is
    * DROPPED, so scrubbing against a stale artifact destroys novel
    * text instead of keeping it. Under that contract artifact-fed
    * scrubbing of a delta equals the full-corpus scrub restricted to
    * the delta (q_scrub_delta proves it cross-engine).
    */
  def scrubWithOwners(docs: DataFrame, idCol: String, textCol: String, k: Int,
                      owners: DataFrame): DataFrame = {
    val c = chunks(docs, idCol, textCol, k)
    rebuild(c, idCol,
      c.join(owners, Seq("_chunk"))
        .filter(col(idCol) === col("_od") && col("_g") === col("_og")))
  }

  private def rebuild(c: DataFrame, idCol: String, kept: DataFrame): DataFrame = {
    val rebuilt = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(expr("transform(sort_array(collect_list(struct(_g, _chunk))), x -> x._chunk)"),
        " ").as("text_clean"))
    c.groupBy(col(idCol)).agg(count(lit(1)).as("n_chunks"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** C4-style repeated-span scrub: every k-word chunk that occurs more
    * than once in the corpus survives ONLY at its first owner
    * (smallest doc id, then smallest position there); all other
    * occurrences are cut and each document is reassembled from its
    * surviving chunks in order.
    *
    * Output: `idCol`, `n_chunks`, `n_kept`, `text_clean` (empty string
    * when every chunk of a document is owned elsewhere).
    */
  def scrubRepeatedSpans(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val c = chunks(docs, idCol, textCol, k)
    val kept = c.join(ownersOf(c, idCol), Seq("_chunk"))
      .filter(col(idCol) === col("_od") && col("_g") === col("_og"))
    rebuild(c, idCol, kept)
  }

  /** Oracle twin of [[scrubRepeatedSpans]]. */
  def scrubRepeatedSpansSql(table: String, idCol: String, textCol: String, k: Int): String =
    s"""WITH ${chunksCtes(table, idCol, textCol, k)},
       |od AS (SELECT chunk, min($idCol) AS od FROM c GROUP BY 1),
       |op AS (SELECT c.chunk, od, min(g) AS og
       |       FROM c JOIN od ON c.chunk = od.chunk AND c.$idCol = od.od
       |       GROUP BY 1, 2),
       |kept AS (SELECT c.$idCol, c.g, c.chunk
       |         FROM c JOIN op ON c.chunk = op.chunk AND c.$idCol = op.od AND c.g = op.og),
       |rebuilt AS (SELECT $idCol, count(*) AS n_kept,
       |                   string_agg(chunk, ' ' ORDER BY g) AS text_clean
       |            FROM kept GROUP BY 1),
       |tot AS (SELECT $idCol, count(*) AS n_chunks FROM c GROUP BY 1)
       |SELECT t.$idCol, t.n_chunks,
       |       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       |       coalesce(r.text_clean, '') AS text_clean
       |FROM tot t LEFT JOIN rebuilt r USING ($idCol)""".stripMargin

  /** RefinedWeb-style boilerplate strip: a chunk appearing in ≥ minDf
    * DISTINCT documents of the same group (site/source) is boilerplate
    * for that group — navigation, footers, licence blurbs — and is cut
    * from EVERY document there; documents are reassembled from what
    * remains. Unlike [[scrubRepeatedSpans]] no copy survives: the
    * template text is noise, not content.
    *
    * Output: `idCol`, `groupCol`, `n_chunks`, `n_kept`, `text_clean`.
    */
  def stripBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                       groupCol: String, k: Int, minDf: Int): DataFrame = {
    val c = chunks(docs, idCol, textCol, k, Seq(groupCol))
    // distinct first: a chunk repeated WITHIN one doc counts once
    val df_ = c.select(col(groupCol), col("_chunk"), col(idCol)).distinct()
      .groupBy(col(groupCol), col("_chunk")).agg(count(lit(1)).as("_df"))
    val boiler = df_.filter(col("_df") >= minDf).drop("_df")
    val kept = c.join(boiler.withColumn("_boiler", lit(true)),
        Seq(groupCol, "_chunk"), "left")
      .filter(col("_boiler").isNull)
    val rebuilt = kept.groupBy(col(idCol), col(groupCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(expr("transform(sort_array(collect_list(struct(_g, _chunk))), x -> x._chunk)"),
        " ").as("text_clean"))
    c.groupBy(col(idCol), col(groupCol)).agg(count(lit(1)).as("n_chunks"))
      .join(rebuilt, Seq(idCol, groupCol), "left")
      .select(col(idCol), col(groupCol), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Oracle twin of [[stripBoilerplate]]. */
  def stripBoilerplateSql(table: String, idCol: String, textCol: String,
                          groupCol: String, k: Int, minDf: Int): String =
    s"""WITH ${chunksCtes(table, idCol, textCol, k, Seq(groupCol))},
       |bdf AS (SELECT $groupCol, chunk, count(*) AS df
       |        FROM (SELECT DISTINCT $groupCol, chunk, $idCol FROM c) GROUP BY 1, 2),
       |boiler AS (SELECT $groupCol, chunk FROM bdf WHERE df >= $minDf),
       |kept AS (SELECT c.$idCol, c.$groupCol, c.g, c.chunk
       |         FROM c LEFT JOIN boiler b ON c.$groupCol = b.$groupCol AND c.chunk = b.chunk
       |         WHERE b.chunk IS NULL),
       |rebuilt AS (SELECT $idCol, $groupCol, count(*) AS n_kept,
       |                   string_agg(chunk, ' ' ORDER BY g) AS text_clean
       |            FROM kept GROUP BY 1, 2),
       |tot AS (SELECT $idCol, $groupCol, count(*) AS n_chunks FROM c GROUP BY 1, 2)
       |SELECT t.$idCol, t.$groupCol, t.n_chunks,
       |       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
       |       coalesce(r.text_clean, '') AS text_clean
       |FROM tot t LEFT JOIN rebuilt r USING ($idCol, $groupCol)""".stripMargin
}
