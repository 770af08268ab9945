package graft.operators

import graft.functions.Normalize.norm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's declarative file-matching engine (SURVEY.md §2.6 W1-W4,
  * §2.3 P2-P3, §2.4 J3): per (item, column) pick the right file(s) from a
  * candidate pool using prioritized rules with include/exclude keyword
  * predicates (on unaccent-normalized names), extension whitelists and a
  * latest/first/all-with-max pick mode; lower-priority fallback rules only
  * apply when every higher-priority rule matched nothing
  * (reference `Leyton_depot.py:259-339`).
  *
  * Distributed formulation — a *prioritized coalesce*, one pass, two
  * shuffles (the rules join is broadcast; the two windows share one
  * partitioning on (item_id, column_id)):
  *
  *   1. broadcast-join pool × rules on column_id (rules are config-sized);
  *      columns with no rule get the `defaultRule` rows instead.
  *   2. filter to rule matches (type/include/exclude predicates).
  *   3. winning rule per (item, column) = min priority among matches
  *      (`dense_rank() == 1`) — this is exactly "first non-empty rule
  *      in fallback order wins".
  *   4. apply the winning rule's pick mode with a row_number window.
  *
  * Fallback rows intentionally don't inherit the main rule's includes —
  * the reference resets them (`Leyton_depot.py:314-321`); callers encode
  * each fallback as its own row with its own (usually empty) includes.
  *
  * The reference's `pick="first"` actually returns the *latest* element
  * (a 1-element slice of the desc-sorted list, reversed —
  * `Leyton_depot.py:296-297`). `firstMeansLatest=true` (the default)
  * reproduces that observed behavior; pass false for the evidently
  * intended earliest-first semantics.
  *
  * Expected schemas:
  *   pool:  item_id, column_id, asset_id, name, created_at (long millis)
  *   rules: column_id, priority (unique per column), include_any_of
  *          array<string> (empty = match-all), exclude_any_of
  *          array<string>, file_types array<string> of DOTLESS
  *          extensions e.g. ["pdf"] ("any" wildcard) — the reference's
  *          `_file_ext` format (`Leyton_depot.py:271-275`, `:140-145`),
  *          pick ('latest'|'first'|'all'), max (int, null = unlimited)
  */
object RuleCascade {

  /** Files whose normalized name passes a rule's predicates. Operates on
    * PRE-NORMALIZED attributes (`_nname`, `_ext`, `include_norm`,
    * `exclude_norm`) — norm/fileExt computed once per row (pool side) /
    * once per rule (broadcast side). Keyword scans run through the
    * native [[graft.functions.ContainsAnyExpr]] (identical three-valued
    * `exists` semantics, spec-asserted) instead of an `exists` HOF,
    * whose interpreted per-needle lambda ran twice per
    * (pool row × rule) candidate.
    */
  private def matches = {
    import graft.functions.ContainsAnyCol.containsAny
    val typeOk = array_contains(col("file_types"), "any") ||
      array_contains(col("file_types"), col("_ext"))
    val inclOk = size(col("include_norm")) === 0 ||
      containsAny(col("_nname"), col("include_norm"))
    val exclOk = !containsAny(col("_nname"), col("exclude_norm"))
    typeOk && inclOk && exclOk
  }

  def apply(pool: DataFrame, rules: DataFrame, defaultRule: DataFrame,
            firstMeansLatest: Boolean = true): DataFrame = {
    // Columns present in the pool but with no configured rule fall back to
    // the default rule (the reference's `MATCH_RULES.get(cid, DEFAULT)`).
    val ruleCols = rules.select("column_id").distinct()
    val defaulted = pool.select("column_id").distinct()
      .join(ruleCols, Seq("column_id"), "left_anti")
      .crossJoin(defaultRule.drop("column_id"))
    val allRules = rules.unionByName(defaulted.select(rules.columns.map(col).toSeq: _*))
      // Keyword lists normalized once per rule, on the (tiny) broadcast side.
      .withColumn("include_norm", transform(col("include_any_of"), k => norm(k)))
      .withColumn("exclude_norm", transform(col("exclude_any_of"), k => norm(k)))

    val candidates = pool
      .withColumn("_nname", norm(col("name")))
      .withColumn("_ext", graft.functions.StringOps.fileExt(col("name")))
      .join(broadcast(allRules), Seq("column_id"))
      .filter(matches)
      .drop("_nname", "_ext", "include_norm", "exclude_norm")

    val grp = Window.partitionBy(col("item_id"), col("column_id"))
    // W2: with firstMeansLatest (reference-observed), every pick mode
    // sorts latest-first; otherwise 'first' = earliest createdAt.
    val orderKey =
      if (firstMeansLatest) -col("created_at")
      else when(col("pick") === "first", col("created_at")).otherwise(-col("created_at"))

    // Single-sort formulation: priority leads the sort, so the winning
    // rule's rows occupy positions 1..m of the partition ordering — a
    // row's row_number IS its within-rule rank once losers are filtered
    // out (priority is unique per column, so "winner" is one rule). The
    // sortless min-priority window shares the same exchange and is
    // satisfied by the row_number sort; the old dense_rank + second
    // row_number needed a second sort per partition (measured: 2.88 s →
    // 2.54 s at sf0.1 for q_rule_fallback).
    val fullOrder = grp.orderBy(col("priority"), orderKey, col("asset_id"))
    candidates
      .withColumn("_wprio", min(col("priority")).over(grp))
      .withColumn("_rn", row_number().over(fullOrder))
      .filter(col("priority") === col("_wprio"))
      .filter(
        when(col("pick").isin("latest", "first"), col("_rn") === 1)
          .otherwise(col("_rn") <= coalesce(col("max"), lit(Int.MaxValue))))
      .drop("_wprio", "_rn")
  }
}
