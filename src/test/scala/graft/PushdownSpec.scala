package graft

/** Scan-hygiene assertions: predicate pushdown and column pruning must
  * reach the parquet reader — a regression here multiplies every scan
  * at 100 TB.
  */
class PushdownSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("point lookup pushes the id filter into the parquet scan") {
    val plan = queries.ParityQueries.pointLookup(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(c_custkey"), plan.take(500))
  }

  test("point lookup prunes unused columns from the scan") {
    val plan = queries.ParityQueries.pointLookup(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("c_acctbal") && !plan.contains("c_nationkey"))
  }

  test("lookup join broadcasts every dimension (no shuffle of the fact side)") {
    val plan = queries.ParityQueries.lookupJoin(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.split("BroadcastHashJoin").length - 1 === 3)
    assert(!plan.contains("SortMergeJoin"))
  }

  test("pick queries use the WindowGroupLimit partial top-k pushdown") {
    val plan = queries.ParityQueries.pickLatest(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("q_json_extract parses the JSON exactly once (generator barrier holds)") {
    import org.apache.spark.sql.catalyst.expressions.GetJsonObject
    val plan = queries.ParityQueries.jsonExtract(spark, d).queryExecution.optimizedPlan
    val parses = plan.flatMap(_.expressions.flatMap(_.collect { case g: GetJsonObject => g }))
    assert(parses.size === 1,
      s"expected ONE get_json_object in the optimized plan, found ${parses.size}:\n$plan")
  }

  test("q_quantiles plans no single-buffer percentile aggregate") {
    val plan = queries.ParityQueries.quantiles(spark, d)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"), plan.take(800))
  }

  test("q_quantiles is two-pass: one re-scan in the plan, no full-group sort") {
    // pass 1 (grid counts → quantile locator) materializes eagerly at
    // build; the REGISTERED plan is pass 2 alone — exactly one events
    // scan joined against the checkpointed locator
    val plan = queries.ParityQueries.quantiles(spark, d)
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllMatchIn(plan).size
    assert(scans === 1, s"expected 1 event scan in pass 2, got $scans:\n${plan.take(1200)}")
    // the rank-select window is per (group, bin) — a bin slice, never a
    // whole group
    assert("hashpartitioning\\(event_type#\\d+L?, bin#".r.findAllMatchIn(plan).nonEmpty,
      plan.take(1200))
  }

  test("q_tfidf_topk cuts the per-doc top-k map-side (WindowGroupLimit)") {
    val plan = queries.PipelineQueries.tfdfTopk(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(500))
  }

  test("q_tpch_q9 keeps the fact side broadcast-joined: one shuffle shape at most") {
    // lineitem semi-filters by the broadcast part family, pair-joins
    // the broadcast derived partsupp, and broadcast-joins supplier and
    // nation — the ONLY join that may shuffle the fact is the
    // lineitem ⋈ orders equi-join (both fact-scale); nothing else in
    // the plan is allowed to sort-merge, and the part filter must be
    // a LeftSemi (no fan-out from the dimension).
    val plan = queries.ParityQueries.tpchQ9(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(1500))
    assert(plan.split("SortMergeJoin").length - 1 <= 1, plan.take(1500))
    assert(plan.split("BroadcastHashJoin").length - 1 >= 3, plan.take(1500))
  }

  test("q_tpch_q17 semi-joins the brand broadcast BEFORE the per-part aggregate") {
    // the r14 plan nit: the aggregate input must contain the part join
    // so only qualifying parts' lineitems shuffle (1/25 of the fact) —
    // in the optimized plan the HashAggregate's child subtree includes
    // a broadcast join against part, not a bare lineitem scan
    val plan = queries.ParityQueries.tpchQ17(spark, d)
      .queryExecution.executedPlan.toString
    // both branches (aggregate input AND probe) carry the semi join —
    // two LeftSemi broadcast joins in the plan, zero sort-merge
    assert(plan.split("LeftSemi").length - 1 >= 2, plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
  }

  test("q_tpch_q20 realizes the nested IN chain as semi joins with no fact sort-merge") {
    // the nested supplier IN (partsupp IN (part) AND correlated
    // lineitem sum) chain must plan as LEFT SEMI joins end to end —
    // an inner-join realization would fan suppliers out by their
    // qualifying pair count and a SortMergeJoin would shuffle the
    // dimension-scale chain for no reason. The one inner join in the
    // plan is the pair-grain aggregate attach (the decorrelated
    // correlated-sum), which is pair-unique on both sides.
    val plan = queries.ParityQueries.tpchQ20(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.split("LeftSemi").length - 1 >= 3, plan.take(1500))
    assert(!plan.contains("SortMergeJoin"), plan.take(1500))
  }

  test("q_tpch_q2 pushes the part filter below the per-part min (decorrelated Q17-style)") {
    // the min is per-part, so the STANDARD/size filter must restrict
    // the aggregate's input (a LeftSemi against part inside the agg
    // subtree), not just the output — at scale the difference is
    // aggregating 1/20 of the offers. The ONE sort-merge join allowed
    // is the min-attach (offers ⋈ per-part-min on the part key): both
    // sides are derived relations whose static size estimate is
    // inflated by the generator, a partkey-keyed shuffle is the right
    // shape at scale anyway, and AQE demotes it to broadcast at
    // runtime when the min side is small.
    val plan = queries.ParityQueries.tpchQ2(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.split("LeftSemi").length - 1 >= 2, plan.take(1500))
    assert(plan.split("SortMergeJoin").length - 1 <= 1, plan.take(1500))
  }

  test("q_skew_join broadcasts the exploded dim (no sort-merge of the hot side)") {
    val plan = queries.DomainQueries.skewJoin(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"), plan.take(500))
  }

  test("funnel shuffles the event log exactly once regardless of stage count") {
    // the join-per-stage formulation re-shuffled the filtered log once
    // per stage; the fold formulation's plan has ONE exchange whether
    // the funnel is 3 stages or 5.
    Seq(Seq("view", "click", "purchase"),
      Seq("view", "click", "purchase", "signup", "refund")).foreach { stages =>
      val plan = operators.Funnel.funnel(
        Tables.events(spark, d), "user_id", "event_type", "ts", stages)
        .queryExecution.executedPlan.toString
      assert("Exchange".r.findAllMatchIn(plan).size === 1, plan.take(800))
    }
  }

  test("no registered query plans a CartesianProduct or an undocumented nested-loop join") {
    // Sweep EVERY registered query: a cartesian product or a
    // broadcast-nested-loop join that sneaks into a plan multiplies at
    // 100 TB. The only sanctioned NLJs are joins whose BOTH sides are
    // bounded by design (config-sized or sublinear in the input):
    //   - q_fuzzy_keyword: distinct-vocab × broadcast config dictionary
    //     under a length-band + levenshtein condition;
    //   - q_ann_topk / q_ann_topk_agg: the brute-force ANN BASELINE —
    //     queries × broadcast corpus is the definition of brute force
    //     (q_ann_lsh / q_ann_ivf are the scale paths);
    //   - q_rule_fallback: cross of the distinct rule column_ids with
    //     the single default-rule row (both LocalTableScans of config);
    //   - q_structure_lot / q_upload_plan: Structure.withSeqId's
    //     triangle self-join over COARSE bucket totals — bounded at
    //     (B/width)² rows, the documented price of a global sequential
    //     id without a global window (Structure.scala:56-66);
    //   - q_pq_adc (and q_pq_rerank, which embeds it as its shortlist
    //     stage): the PQ-compressed scan — corpus CODES (M ints/row)
    //     stream against the broadcast query LUTs; the whole point is
    //     that the per-pair work is M lookups, so the "nested loop" is
    //     the designed O(M)-per-pair scan, not a dim-wide blowup
    //     (q_ivfadc is the equi-join shape that drops even this).
    //   - q_ann_sq: same compressed-scan shape with int8 scalar codes —
    //     the corpus streams dim-byte reconstructions against the
    //     broadcast query set; list pruning composes exactly as for PQ
    //     when needed (q_ivfadc shows the equi-join variant).
    //   - q_ann_recall: embeds the brute-force scan as its ground-truth
    //     side (recall is BY DEFINITION measured against exact search);
    //     the approx side under eval is the equi-join LSH plan.
    //   - q_probe_auc: the binned-AUC triangle — the ≤256-row score
    //     histogram joined against its own broadcast under bin_a >=
    //     bin_b; both sides bounded by the fixed grid regardless of
    //     data size (same shape as Structure.withSeqId's triangle).
    //   - q_heavy_hitters: the distinct-vocab rows meet the single
    //     broadcast threshold row (k×1) before the candidate filter —
    //     same bounded shape as the mix/curation totals joins below.
    //   - q_mix_temperature / q_mix_plan: the per-source weight rows
    //     (k = distinct sources) meet the single normalizing-totals
    //     row — a k×1 join of two aggregate outputs, both sides
    //     bounded by construction.
    //   - q_lm_quality / q_lm_artifact / q_lm_bigram / q_ccnet_bucket /
    //     q_weighted_sample / q_curation_funnel (embeds the bucket
    //     stage): the same k×1 shape — vocab (or bigram) rows meet the
    //     single broadcast total / min-max row (Curation.referenceRel,
    //     Artifacts.loadLmRel, bigramScoreWithBackoff,
    //     qualityWeightedSample); the corpus-sized joins in those plans
    //     are all equi-joins on the word/pair key.
    //   - q_simhash_selectivity: each scheme's 1-row bucket-stats
    //     aggregate meets the single broadcast truth-count row (1×1
    //     scalar attach) — both sides aggregate outputs by construction.
    //   - q_tpch_q22: the classic scalar-subquery attach — customers
    //     meet the single broadcast positive-balance-average row (n×1,
    //     the broadcast side is a 1-row aggregate by construction)
    //     before the anti join on orders.
    //   - q_tpch_q2 / q_tpch_q9 / q_tpch_q11 / q_tpch_q16 / q_tpch_q20:
    //     the derived partsupp relation (Tables.partsupp) attaches the
    //     1-row supplier-count aggregate to the part-key projection
    //     (n×1, the broadcast side is a count() by construction); Q11
    //     additionally attaches its 1-row global total and part count
    //     (the same scalar-subquery shape as q_tpch_q22's average).
    val nljAllowed = Set("q_fuzzy_keyword", "q_ann_topk", "q_ann_topk_agg",
      "q_simhash_selectivity",
      "q_rule_fallback", "q_structure_lot", "q_upload_plan", "q_pq_adc",
      "q_pq_rerank", "q_ann_sq", "q_ann_recall", "q_mix_temperature",
      "q_lm_quality", "q_lm_artifact", "q_lm_bigram", "q_ccnet_bucket",
      "q_weighted_sample", "q_curation_funnel", "q_mix_plan", "q_source_quality",
      "q_probe_auc", "q_heavy_hitters", "q_tpch_q22",
      "q_tpch_q2", "q_tpch_q9", "q_tpch_q11", "q_tpch_q16", "q_tpch_q20")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, d).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val nlj = plan.contains("BroadcastNestedLoopJoin") && !nljAllowed(name)
      if (cartesian || nlj)
        Some(s"$name${if (cartesian) " [cartesian]" else ""}${if (nlj) " [nlj]" else ""}")
      else None
    }
    assert(offenders.isEmpty, s"scale-hostile joins in: ${offenders.mkString(", ")}")
  }

  test("no query plans a window without a partition spec (single-task funnel)") {
    // the optimized LOGICAL plan is audited (AQE wraps the physical one);
    // a foldable partition key is as global as an empty one.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val bad = fn(spark, d).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty ||
          w.partitionSpec.forall(_.foldable) => w
      }
      if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"global windows in: ${offenders.mkString(", ")}")
  }
}
