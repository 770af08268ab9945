package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer TRAINING — the
  * vocabulary-learning step of an LLM data pipeline, run the way
  * industrial trainers run it: the corpus is collapsed ONCE into a
  * (word, count) table (one map-side-combined aggregate — the only
  * corpus-sized pass), and every merge iteration then works on the
  * vocabulary table alone, which is orders of magnitude smaller than
  * the corpus at any scale. 100 TB of text with a 10 M-type vocabulary
  * costs one corpus aggregate plus `steps` vocabulary-sized jobs.
  *
  * Words are represented as symbol sequences in a SINGLE STRING with a
  * two-space separator invariant (two spaces between symbols AND at both
  * ends). A merge of pair (a, b) is then literally
  * `replace(sym, " a  b ", " ab ")`: each match consumes one of the two
  * boundary spaces on each side, so back-to-back occurrences
  * (`a b a b`, even `a a a`) merge greedily left-to-right exactly like a
  * reference BPE trainer, single-pass, with no overlap bugs — and the
  * same `replace` runs identically in DuckDB, which makes the whole
  * training loop oracle-checkable bit-for-bit. Symbols never contain
  * spaces (the tokenizer splits on them), so pattern boundaries cannot
  * false-match inside a longer symbol.
  *
  * The per-step argmax pair is collected driver-side (one row of model
  * state per step — the merge TABLE is the model, the same adjudicated
  * shape as k-means centroids). Ties break on total pair-string order
  * (count DESC, then "lhs rhs" ASC — identical to the tuple order
  * because the space separator sorts below every symbol character).
  */
object Bpe {
  val DefaultSteps = 8

  /** One learned merge rule. */
  final case class Merge(step: Long, lhs: String, rhs: String, pairCnt: Long)

  private def filteredWords(textCol: Column): Column =
    filter(Hashing.words(textCol), w => length(w) > 0)

  /** Corpus → (word, cnt): the single corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(filteredWords(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial symbolization: every char its own symbol, double-space
    * separated with double-space ends (the merge invariant).
    */
  private def spaced(word: Column): Column =
    concat(lit("  "),
      array_join(transform(sequence(lit(1), length(word)),
        i => word.substr(i, lit(1))), "  "),
      lit("  "))

  /** Adjacent symbol pairs of a spaced string as "lhs rhs" keys (null —
    * dropped by explode — for single-symbol words, where an unguarded
    * `sequence(1, 0)` would count DOWN).
    */
  private def pairKeys(t: Column): Column =
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))

  /** Train `steps` merges. Returns the learned merge table and the final
    * vocabulary (word, cnt, sym). Each iteration: ONE vocabulary-sized
    * aggregate (pair counts), one driver-collected argmax row, one
    * `replace` projection, `localCheckpoint` to keep the plan shallow
    * (same discipline as the other iterative operators).
    */
  def train(docs: DataFrame, textCol: String,
            steps: Int = DefaultSteps): (Seq[Merge], DataFrame) = {
    require(steps >= 1, s"need steps >= 1, got $steps")
    var vocab = wordCounts(docs, textCol)
      .withColumn("sym", spaced(col("word")))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    for (k <- 1 to steps) {
      val pairs = vocab
        .select(col("cnt"), split(trim(col("sym")), "  ").as("t"))
        .select(col("cnt"), explode(pairKeys(col("t"))).as("pr"))
        .groupBy("pr").agg(sum(col("cnt")).as("c"))
      val top = pairs.orderBy(col("c").desc, col("pr")).limit(1).collect()
      require(top.nonEmpty,
        s"BPE step $k found no adjacent pairs — every word is fully merged; lower steps")
      val (pr, c) = (top(0).getString(0), top(0).getLong(1))
      val Array(l, r) = pr.split(" ", 2)
      merges += Merge(k.toLong, l, r, c)
      vocab = vocab
        .withColumn("sym", replace(col("sym"), lit(s" $l  $r "), lit(s" $l$r ")))
        .localCheckpoint(true)
    }
    (merges.result(), vocab)
  }

  /** Segment a corpus with a trained vocabulary: per-doc whitespace-word
    * and BPE-token counts. The vocab side is dictionary-sized (broadcast
    * at scale); the corpus side is one explode + equi-join + aggregate.
    * Inner join is exact when the vocabulary was trained on the same
    * corpus (every word is present by construction).
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               vocab: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(filteredWords(col(textCol))).as("word"))
    val v = vocab.select(col("word"),
      size(split(trim(col("sym")), "  ")).as("n_sym"))
    toks.join(v, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe"))
  }

  /** Corpus token frequencies under the final segmentation (the vocab
    * report a tokenizer build ships with).
    */
  def tokenFrequencies(vocab: DataFrame): DataFrame =
    vocab.select(col("cnt"), explode(split(trim(col("sym")), "  ")).as("tok"))
      .groupBy("tok").agg(sum(col("cnt")).as("freq"))

  /** Segment ANY word column with a trained merge list — tokenizer
    * INFERENCE, no vocabulary join, so it applies to words never seen
    * in training (the deployment path: the model is the merge table).
    * Each rule is one greedy left-to-right `replace` pass, applied in
    * rank order; a rule's symbols are by construction composed only of
    * earlier merges, so in-order single application reproduces the
    * training segmentation exactly for in-corpus words (asserted by
    * q_bpe_artifact's oracle, which recomputes via the training chain).
    * The whole chain is `steps` chained literal replaces in ONE
    * codegen'd projection. Returns the token ARRAY.
    */
  def segmentExpr(word: Column, merges: Seq[Merge]): Column = {
    val merged = merges.foldLeft(spaced(word)) { (c, m) =>
      replace(c, lit(s" ${m.lhs}  ${m.rhs} "), lit(s" ${m.lhs}${m.rhs} "))
    }
    split(trim(merged), "  ")
  }

  /** DuckDB twin of [[segmentExpr]]: the nested replace chain reading
    * each learned pair from [[trainCtes]]'s `b1..b{steps}` via scalar
    * subqueries — the oracle re-learns the merges, then applies them
    * the same way. `sym` must be a spaced-representation expression.
    */
  def segmentSql(sym: String, steps: Int = DefaultSteps): String =
    (1 to steps).foldLeft(sym) { (e, k) =>
      s"replace($e, (SELECT ' ' || replace(pr, ' ', '  ') || ' ' FROM b$k), (SELECT ' ' || replace(pr, ' ', '') || ' ' FROM b$k))"
    }

  /** Spaced-representation SQL for a word expression (chars joined by
    * the two-space invariant).
    */
  def spacedSql(word: String): String =
    s"'  ' || array_to_string(list_transform(range(1, length($word) + 1), i -> substring($word, i, 1)), '  ') || '  '"

  // ------------------------------------------------------------------ DuckDB twins

  /** CTE chain `wc, w0, p1, b1, w1, …, w{steps}` mirroring [[train]].
    * MATERIALIZED is load-bearing: each step references its predecessor
    * three times (pair scan + two scalar subqueries), so un-materialized
    * CTE inlining would re-evaluate the chain 3^steps times.
    */
  def trainCtes(table: String, textCol: String, steps: Int = DefaultSteps): String = {
    val w = s"list_filter(${Hashing.wordsSql(textCol)}, x -> length(x) > 0)"
    val init =
      s"""wc AS MATERIALIZED (SELECT w AS word, count(*) AS cnt
         |  FROM (SELECT unnest($w) AS w FROM $table) GROUP BY 1),
         |w0 AS MATERIALIZED (SELECT word, cnt, ${spacedSql("word")} AS sym
         |  FROM wc)""".stripMargin
    val stepCtes = (1 to steps).map { k =>
      val p = k - 1
      s"""p$k AS MATERIALIZED (SELECT pr, sum(cnt) AS c FROM (
         |  SELECT cnt, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS pr
         |  FROM (SELECT cnt, string_split(trim(sym), '  ') AS t FROM w$p)) GROUP BY 1),
         |b$k AS MATERIALIZED (SELECT pr, c FROM p$k ORDER BY c DESC, pr LIMIT 1),
         |w$k AS MATERIALIZED (SELECT word, cnt,
         |  replace(sym, (SELECT ' ' || replace(pr, ' ', '  ') || ' ' FROM b$k),
         |               (SELECT ' ' || replace(pr, ' ', '') || ' ' FROM b$k)) AS sym
         |  FROM w$p)""".stripMargin
    }
    (init +: stepCtes).mkString(",\n")
  }

  /** The merge-table projection over [[trainCtes]]'s `b1..b{steps}`. */
  def mergesSql(steps: Int = DefaultSteps): String =
    (1 to steps).map { k =>
      s"SELECT CAST($k AS BIGINT) AS step, split_part(pr, ' ', 1) AS lhs, split_part(pr, ' ', 2) AS rhs, CAST(c AS BIGINT) AS pair_cnt FROM b$k"
    }.mkString("\nUNION ALL ")
}
