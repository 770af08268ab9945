package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM (SentencePiece-style) tokenizer — the other
  * subword family next to [[Bpe]]: T5/Llama-lineage pipelines tokenize
  * with a unigram language model, segmenting each word into the
  * maximum-likelihood sequence of vocabulary pieces (Kudo 2018,
  * arXiv:1804.10959). Shape at 100 TB mirrors [[Bpe]]: ONE corpus-
  * sized pass collapses text to a (word, cnt) table; seeding, EM and
  * scoring then run on vocabulary-sized tables, and the learned model
  * (≤ `vocabSize` rows) is bounded driver state, same class as
  * k-means centroids or the BPE merge table.
  *
  * Determinism contract (both queries hash-gate against DuckDB):
  *   - piece probabilities are scored through a FIXED-POINT base-2
  *     logarithm computed by integer repeated squaring ([[fplog2]]) —
  *     bit-identical on any engine, where libm `ln`/`log2` is not
  *     (the q_bm25_topk discipline: keep hash-gated arithmetic inside
  *     exactly-reproducible operations; log is monotone, and a FIXED
  *     quantization of it preserves cross-engine equality outright);
  *   - Viterbi compares (cost, piece-count, path) lexicographically —
  *     integer cost first, then fewer pieces, then the
  *     space-joined path string (ASCII corpora; byte order and UTF-16
  *     order agree there), so ties cannot flip between engines;
  *   - EM is hard-EM (Viterbi counts), all integers: re-segment the
  *     word VOCABULARY under current costs, re-count piece usage
  *     weighted by word count, drop multi-char pieces that won zero
  *     words, floor single-char pieces at count 1 (segmentability),
  *     recompute costs. No floats anywhere in the loop.
  *
  * Subset bounds (documented, spec-pinned): pieces up to
  * [[MaxPieceLen]] chars; Viterbi DP up to [[MaxWordLen]]-char words,
  * beyond which a word falls back to per-character segmentation;
  * characters unseen in training cost [[UnkCost]] each (inference
  * totality — the training corpus never hits it).
  */
object Unigram {
  /** Fractional bits of the fixed-point mantissa during squaring. */
  val MantBits = 20
  /** Fractional bits of the log output (cost micro-units). */
  val FracBits = 16
  val MaxPieceLen = 3
  val MaxWordLen = 16
  val DefaultVocab = 40
  val DefaultRounds = 2
  /** Cost of an out-of-vocabulary single character at inference. */
  val UnkCost: Long = 1L << 24

  /** One vocabulary piece: corpus frequency and integer cost
    * `fplog2(total) - fplog2(freq)` in 2^-16 units.
    */
  final case class Piece(piece: String, freq: Long, cost: Long)

  // ------------------------------------------------------------------
  // fixed-point log2
  // ------------------------------------------------------------------

  /** floor-ish fixed-point log2: integer part from the bit length,
    * [[FracBits]] fractional bits by repeated squaring of the
    * [[MantBits]]-bit mantissa — the classic shift-and-square
    * algorithm, all integer ops, so DuckDB replays it bit-for-bit
    * ([[fplogExprs]]). Requires 1 <= v < 2^(63 - MantBits).
    */
  def fplog2(v: Long): Long = {
    require(v >= 1 && v < (1L << (63 - MantBits)), s"fplog2: $v out of range")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
    var m = (v << MantBits) >> e // mantissa in [2^MantBits, 2^(MantBits+1))
    var acc = 0L
    var i = 0
    while (i < FracBits) {
      m = (m * m) >> MantBits
      acc <<= 1
      if (m >= (1L << (MantBits + 1))) { m >>= 1; acc |= 1L }
      i += 1
    }
    (e.toLong << FracBits) | acc
  }

  // ------------------------------------------------------------------
  // Viterbi
  // ------------------------------------------------------------------

  /** Maximum-likelihood segmentation of one word under integer piece
    * costs: returns (cost, n_pieces, space-joined path). The DP
    * minimizes (cost, k, path) lexicographically; unknown single
    * chars cost [[UnkCost]]; words beyond [[MaxWordLen]] fall back to
    * per-character pieces.
    */
  def viterbi(word: String, cost: java.util.HashMap[String, java.lang.Long]): (Long, Long, String) = {
    val n = word.length
    def costOf(p: String): java.lang.Long = cost.get(p)
    if (n > MaxWordLen) {
      var c = 0L
      var i = 0
      val sb = new StringBuilder
      while (i < n) {
        val ch = word.substring(i, i + 1)
        val pc = costOf(ch)
        c += (if (pc == null) UnkCost else pc.longValue())
        if (i > 0) sb.append(' ')
        sb.append(ch)
        i += 1
      }
      return (c, n.toLong, sb.toString)
    }
    val dpC = Array.fill(n + 1)(Long.MaxValue)
    val dpK = new Array[Long](n + 1)
    val dpP = new Array[String](n + 1)
    dpC(0) = 0L
    dpP(0) = ""
    var j = 1
    while (j <= n) {
      var l = 1
      while (l <= math.min(MaxPieceLen, j)) {
        val i = j - l
        if (dpC(i) != Long.MaxValue) {
          val piece = word.substring(i, j)
          val pc0 = costOf(piece)
          val pc: java.lang.Long =
            if (pc0 != null) pc0 else if (l == 1) java.lang.Long.valueOf(UnkCost) else null
          if (pc != null) {
            val nc = dpC(i) + pc.longValue()
            val nk = dpK(i) + 1
            val np = if (dpP(i).isEmpty) piece else dpP(i) + " " + piece
            val better = nc < dpC(j) ||
              (nc == dpC(j) && (nk < dpK(j) ||
                (nk == dpK(j) && np.compareTo(dpP(j)) < 0)))
            if (better) { dpC(j) = nc; dpK(j) = nk; dpP(j) = np }
          }
        }
        l += 1
      }
      j += 1
    }
    (dpC(n), dpK(n), dpP(n))
  }

  // ------------------------------------------------------------------
  // training (Spark side)
  // ------------------------------------------------------------------

  /** All substring pieces (lengths 1..MaxPieceLen) of the word column,
    * one array — every occurrence position counts once (overlaps
    * included), exactly like the SQL twin's unnest.
    */
  private def subPieces(word: Column): Column =
    flatten(array((1 to MaxPieceLen).map { l =>
      when(length(word) >= l,
        transform(sequence(lit(1), length(word) - l + 1), i => word.substr(i, lit(l))))
        .otherwise(array())
    }: _*))

  /** Seed + EM training. Returns the final model, ≤ `vocabSize` rows
    * of bounded driver state (the adjudicated model-state class). All
    * heavy lifting is DataFrame aggregates: one corpus pass for word
    * counts, vocabulary-sized jobs for seeding and each EM round.
    */
  def train(docs: DataFrame, textCol: String,
            vocabSize: Int = DefaultVocab, rounds: Int = DefaultRounds): Seq[Piece] = {
    require(vocabSize >= 2 && rounds >= 0, s"bad vocabSize=$vocabSize rounds=$rounds")
    val spark = docs.sparkSession
    val wc = Bpe.wordCounts(docs, textCol).localCheckpoint(true)
    val cand = wc.select(col("cnt"), explode(subPieces(col("word"))).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("freq"))
      .localCheckpoint(true)
    // chars are always kept (segmentability); multi-char pieces fill
    // the remaining slots by (freq DESC, piece ASC)
    val chars = cand.filter(length(col("piece")) === 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val room = math.max(0, vocabSize - chars.length)
    val multi = cand.filter(length(col("piece")) > 1)
      .orderBy(col("freq").desc, col("piece")).limit(room)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var vocab: Seq[(String, Long)] = (chars ++ multi).toSeq
    var model = withCosts(vocab)
    for (_ <- 1 to rounds) {
      // hard-EM: re-segment the word vocabulary under current costs
      // (the codegen'd per-row fold), re-count piece usage weighted by
      // word count — one vocabulary-sized aggregate per round
      val counts = wc
        .select(col("cnt"), segmentExpr(col("word"), model).getField("p").as("path"))
        .select(col("cnt"), explode(split(col("path"), " ")).as("piece"))
        .groupBy("piece").agg(sum("cnt").as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      vocab = vocab.flatMap { case (p, _) =>
        val c = counts.getOrElse(p, 0L)
        if (p.length == 1) Some((p, math.max(c, 1L)))
        else if (c > 0) Some((p, c)) else None
      }
      model = withCosts(vocab)
    }
    model
  }

  private def withCosts(vocab: Seq[(String, Long)]): Seq[Piece] = {
    val total = vocab.map(_._2).sum
    val lgTot = fplog2(total)
    vocab.map { case (p, f) => Piece(p, f, lgTot - fplog2(f)) }
      .sortBy(p => (p.piece.length > 1, p.piece)) // stable, cosmetic
  }

  /** Model as the lookup the expression evaluates against. */
  def modelMap(model: Seq[Piece]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](model.size * 2)
    model.foreach(p => m.put(p.piece, java.lang.Long.valueOf(p.cost)))
    m
  }

  /** Segment a word column under a trained model: struct(c, k, p) —
    * integer cost, piece count, space-joined pieces. One codegen'd
    * per-row fold; the model rides along as a broadcast-style
    * reference object.
    */
  def segmentExpr(word: Column, model: Seq[Piece]): Column =
    graft.functions.GraftExpr.toColumn(
      graft.functions.UnigramSegmentExpr(
        graft.functions.GraftExpr.toExpr(word), model.map(p => (p.piece, p.cost))))

  // ------------------------------------------------------------------
  // DuckDB twins
  // ------------------------------------------------------------------

  /** CTE chain computing costs for a raw (piece, freq) CTE `src` →
    * `out` with (piece, freq, cost). Mirrors [[fplog2]] step for
    * step: e from the binary-string bit length, one MATERIALIZED CTE
    * per squaring iteration (lateral-alias or inlined-subquery
    * chaining would expand the expression tree exponentially — both
    * engines' planners inline single-use projections), MSB-first bit
    * accumulation. The total rides as a sentinel NULL-piece row so
    * the whole chain runs once.
    */
  private def costCtes(src: String, out: String): String = {
    val two = 1L << (MantBits + 1)
    val sb = new StringBuilder
    sb.append(
      s"""${out}_l0 AS MATERIALIZED (
         |  SELECT piece, freq, length(printf('%b', freq)) - 1 AS e,
         |         (freq << $MantBits) >> (length(printf('%b', freq)) - 1) AS m,
         |         CAST(0 AS BIGINT) AS acc
         |  FROM (SELECT piece, freq FROM $src UNION ALL
         |        SELECT NULL AS piece, (SELECT CAST(sum(freq) AS BIGINT) FROM $src) AS freq)),\n""".stripMargin)
    for (i <- 1 to FracBits) {
      sb.append(
        s"""${out}_l$i AS MATERIALIZED (
           |  SELECT piece, freq, e,
           |         CASE WHEN t >= $two THEN t >> 1 ELSE t END AS m,
           |         acc * 2 + CASE WHEN t >= $two THEN 1 ELSE 0 END AS acc
           |  FROM (SELECT piece, freq, e, acc, (m * m) >> $MantBits AS t FROM ${out}_l${i - 1})),\n""".stripMargin)
    }
    sb.append(
      s"""$out AS MATERIALIZED (
         |  SELECT piece, freq,
         |         (SELECT (e << $FracBits) + acc FROM ${out}_l$FracBits WHERE piece IS NULL)
         |           - ((e << $FracBits) + acc) AS cost
         |  FROM ${out}_l$FracBits WHERE piece IS NOT NULL)""".stripMargin)
    sb.toString
  }

  /** The Viterbi DP chain for one segmentation pass: CTEs
    * `$tag0..$tag$MaxWordLen` over `wordsCte` (word, cnt, wlen, dp0)
    * against vocabulary CTE `vocabCte`, then `$tag` with the final
    * per-word struct `dp` (c, k, p). Stage j left-joins the ≤3
    * candidate pieces ending at j and takes the lexicographic min of
    * the extended states — [[viterbi]] replayed in SQL.
    */
  private def dpCtes(tag: String, wordsCte: String, vocabCte: String): String = {
    val sb = new StringBuilder
    sb.append(s"""${tag}0 AS (SELECT word, cnt, length(word) AS wlen,
                 |  {'c': CAST(0 AS BIGINT), 'k': CAST(0 AS BIGINT), 'p': ''} AS dp0
                 |  FROM $wordsCte),\n""".stripMargin)
    for (j <- 1 to MaxWordLen) {
      val carried = (0 until j).map(i => s"dp$i").mkString(", ")
      val ls = (1 to math.min(MaxPieceLen, j))
      val joins = ls.map { l =>
        s"LEFT JOIN $vocabCte v$l ON v$l.piece = substr(b.word, ${j - l + 1}, $l)"
      }.mkString("\n    ")
      val cands = ls.map { l =>
        val prev = s"dp${j - l}"
        if (l == 1)
          // single chars always segment: unknown ones cost UnkCost
          // with the char itself as the piece — [[viterbi]]'s
          // fallback, so inference over words with characters the
          // training corpus never saw agrees between engines
          s"""CASE WHEN b.$prev IS NOT NULL THEN
             |      {'c': CAST(b.$prev.c + coalesce(v1.cost, $UnkCost) AS BIGINT),
             |       'k': CAST(b.$prev.k + 1 AS BIGINT),
             |       'p': CASE WHEN b.$prev.p = '' THEN substr(b.word, $j, 1)
             |                 ELSE b.$prev.p || ' ' || substr(b.word, $j, 1) END}
             |      END AS cand$l""".stripMargin
        else
          s"""CASE WHEN v$l.piece IS NOT NULL AND b.$prev IS NOT NULL THEN
             |      {'c': CAST(b.$prev.c + v$l.cost AS BIGINT),
             |       'k': CAST(b.$prev.k + 1 AS BIGINT),
             |       'p': CASE WHEN b.$prev.p = '' THEN v$l.piece
             |                 ELSE b.$prev.p || ' ' || v$l.piece END}
             |      END AS cand$l""".stripMargin
      }.mkString(",\n      ")
      // lexicographic min of the nullable candidate structs
      val minExpr = ls.map(l => s"cand$l").reduceLeft { (a, b) =>
        s"(CASE WHEN $a IS NULL THEN $b WHEN $b IS NULL THEN $a WHEN $b < $a THEN $b ELSE $a END)"
      }
      // MATERIALIZED is load-bearing: dp_j references dp_{j-1..j-3},
      // so un-materialized inlining would expand the chain 3^16-fold
      // in the planner (the Bpe.trainCtes lesson, worse fanout)
      sb.append(
        s"""$tag$j AS MATERIALIZED (
           |  SELECT word, cnt, wlen, $carried, $minExpr AS dp$j FROM (
           |    SELECT b.word, b.cnt, b.wlen, ${(0 until j).map(i => s"b.dp$i").mkString(", ")},
           |      $cands
           |    FROM $tag${j - 1} b
           |    $joins
           |  )
           |),\n""".stripMargin)
    }
    val dps = (1 to MaxWordLen).map(j => s"dp$j").mkString(", ")
    sb.append(s"$tag AS MATERIALIZED (SELECT word, cnt, list_value($dps)[wlen] AS dp FROM $tag$MaxWordLen)")
    sb.toString
  }

  /** Inference DP over an ARBITRARY words CTE under the trained final
    * vocabulary `uv$rounds` — compose after [[trainCtes]] to segment a
    * table the model never saw (the deployment shape, mirroring
    * [[graft.operators.Bpe.segmentSql]]'s role for BPE). `wordsCte`
    * must provide (word, cnt); the result CTE `tag` yields
    * (word, cnt, dp struct(c, k, p)).
    */
  def inferCtes(tag: String, wordsCte: String, rounds: Int = DefaultRounds): String =
    dpCtes(tag, wordsCte, s"uv$rounds")

  /** Full training CTE chain mirroring [[train]]: `uwc` word counts,
    * `cand` seed pieces, `v0..v$rounds` vocabularies with integer
    * costs, `useg$r` segmentation passes. The final model is
    * `v$rounds`; the final corpus segmentation joins words against
    * `useg_final` (built from `v$rounds`).
    */
  def trainCtes(table: String, textCol: String,
                vocabSize: Int = DefaultVocab, rounds: Int = DefaultRounds): String = {
    val subLists = (1 to MaxPieceLen).map { l =>
      val r = s"list_transform(range(1, length(word) - ${l - 1} + 1), i -> substr(word, i, $l))"
      if (l == 1) r else s"CASE WHEN length(word) >= $l THEN $r ELSE [] END"
    }.mkString(",\n      ")
    val sb = new StringBuilder
    sb.append(
      s"""uwc AS MATERIALIZED (SELECT w AS word, count(*) AS cnt
         |  FROM (SELECT unnest(list_filter(${graft.functions.Hashing.wordsSql(textCol)}, x -> length(x) > 0)) AS w
         |        FROM $table) GROUP BY 1),
         |ucand AS MATERIALIZED (SELECT piece, CAST(sum(cnt) AS BIGINT) AS freq FROM (
         |  SELECT cnt, unnest(flatten([
         |      $subLists])) AS piece
         |  FROM uwc) GROUP BY 1),
         |uchars AS (SELECT piece, freq FROM ucand WHERE length(piece) = 1),
         |umulti AS (SELECT piece, freq FROM (
         |  SELECT piece, freq, row_number() OVER (ORDER BY freq DESC, piece) AS rn
         |  FROM ucand WHERE length(piece) > 1)
         |  WHERE rn <= $vocabSize - (SELECT count(*) FROM uchars)),
         |uv0raw AS (SELECT * FROM uchars UNION ALL SELECT * FROM umulti),
         |${costCtes("uv0raw", "uv0")},\n""".stripMargin)
    for (r <- 1 to rounds) {
      sb.append(dpCtes(s"useg$r", "uwc", s"uv${r - 1}"))
      sb.append(",\n")
      sb.append(
        s"""ucnt$r AS MATERIALIZED (SELECT piece, CAST(sum(cnt) AS BIGINT) AS c FROM (
           |  SELECT cnt, unnest(string_split(dp.p, ' ')) AS piece FROM useg$r) GROUP BY 1),
           |uv${r}raw AS (
           |  SELECT v.piece, greatest(coalesce(c.c, 0), 1) AS freq
           |  FROM uv${r - 1} v LEFT JOIN ucnt$r c USING (piece) WHERE length(v.piece) = 1
           |  UNION ALL
           |  SELECT v.piece, c.c AS freq
           |  FROM uv${r - 1} v JOIN ucnt$r c USING (piece) WHERE length(v.piece) > 1 AND c.c > 0),
           |${costCtes(s"uv${r}raw", s"uv$r")},\n""".stripMargin)
    }
    sb.append(dpCtes("useg_final", "uwc", s"uv$rounds"))
    sb.toString
  }
}
