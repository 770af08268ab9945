package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A TRAINED linear quality probe over embedding features — the
  * fastText-style binary filter a curation pipeline trains to score
  * documents (here: embedding rows) for keep/drop decisions, plus its
  * ROC-AUC evaluation. Unlike the counting classifiers
  * ([[Classify]]/[[Curation]]), this is honest gradient descent:
  * full-batch least-squares GD, T fixed steps, every quantity in exact
  * integer units so the DuckDB oracle replays the entire optimization
  * bit-for-bit:
  *
  *   x_dj   = trunc(e_dj · 256)          (exact: ·256 is an exponent
  *                                        shift, float→double lossless)
  *   resid  = Σ_j x_dj·w_j − y_d·10⁶
  *   grad_j = Σ_d resid_d · x_dj
  *   w_j   ← w_j − grad_j div (n · LrDiv)
  *
  * Integer `div` truncates toward zero in BOTH engines (asserted in
  * ProbeSpec), so no floor/truncate divergence on negative gradients.
  * LrDiv = 32768 sits inside the stability bound for this feature
  * scale (|x| ≲ 2⁸, 65 dims → row norm² ≈ 2¹⁷); 16384 measurably
  * diverges. Each GD step is the textbook distributed shape: one
  * broadcast join of the (dim+1)-row weight table against the feature
  * table + two map-side-combined aggregates — corpus-sized work per
  * step, bounded model state (the weight table) collected nowhere.
  *
  * AUC is computed on a FIXED 256-bin score histogram (binned
  * Mann-Whitney: concordant cross-bin pairs count 2, same-bin pairs 1,
  * over 2·P·N): deterministic, one aggregate plus a triangle join of
  * the ≤256-row grid against itself — the same sanctioned
  * bounded-grid-join shape as Structure.withSeqId. Counts enter the
  * final ratio as 2·P·N·10⁶, so the eval set must stay below ~2 M rows
  * per class — an AUC eval at 100 TB runs on a sample by construction.
  */
object Probe {
  val Dim = 64
  val Scale = 1000000L
  val LrDiv = 32768L
  val DefaultSteps = 12

  /** (vec_id, y, j, x): one row per (vector, dimension) plus a bias row
    * j = Dim with x = 256 for every vector. `y` = 1 when `labelCol`
    * equals `posLabel`.
    */
  def features(emb: DataFrame, idCol: String, vecCol: String,
               labelCol: String, posLabel: Int): DataFrame = {
    val y = when(col(labelCol) === posLabel, 1L).otherwise(0L).as("y")
    val base = emb.select(col(idCol).as("vec_id"), y, posexplode(col(vecCol)))
      .select(col("vec_id"), col("y"), col("pos").cast("long").as("j"),
        (col("col").cast("double") * 256).cast("long").as("x"))
    val bias = emb.select(col(idCol).as("vec_id"), y,
      lit(Dim.toLong).as("j"), lit(256L).as("x"))
    base.unionByName(bias)
  }

  /** T steps of full-batch GD; returns the (Dim+1)-row weight table
    * (j, w). `feat` must be [[features]] output (checkpointed by the
    * caller if reused). The row count is collected once driver-side
    * (one scalar of model state, DSIR-threshold shape).
    */
  def train(feat: DataFrame, steps: Int = DefaultSteps,
            init: Option[DataFrame] = None): DataFrame = {
    require(steps >= 1, s"need steps >= 1, got $steps")
    val spark = feat.sparkSession
    val n = feat.select(countDistinct(col("vec_id"))).head().getLong(0)
    require(n > 0, "probe training needs a non-empty feature set")
    // warm start: continue GD from a persisted weight table (the
    // incremental-training path — new data arrives, the model resumes
    // instead of retraining from zero)
    var w = init.getOrElse(
      spark.range(Dim + 1).select(col("id").as("j"), lit(0L).as("w")))
    for (_ <- 1 to steps) {
      val resid = feat.join(w, Seq("j"))
        .groupBy("vec_id")
        .agg((sum(col("x") * col("w")) - max(col("y")) * Scale).as("r"))
      val grad = feat.join(resid, Seq("vec_id"))
        .groupBy("j").agg(sum(col("r") * col("x")).as("g"))
      w = w.join(grad, Seq("j"))
        .select(col("j"), (col("w") - expr(s"g div (${n}L * $LrDiv)")).as("w"))
        .localCheckpoint(true)
    }
    w
  }

  /** Scores under a weight table: (vec_id, y, score). */
  def score(feat: DataFrame, weights: DataFrame): DataFrame =
    feat.join(weights, Seq("j"))
      .groupBy("vec_id")
      .agg(max(col("y")).as("y"), sum(col("x") * col("w")).as("score"))

  val AucLo = -524288L
  val AucBins = 256L
  val AucWidth = 4096L // (hi - lo) / bins with hi = +524288

  /** Binned ROC-AUC of (y, score) rows → one row
    * (auc_ppm, n_pos, n_neg). Scores clamp into the fixed grid, so the
    * estimate is a pure integer function of the bin counts.
    */
  def binnedAuc(scored: DataFrame): DataFrame = {
    val hi = AucLo + AucBins * AucWidth
    val clamped = least(greatest(col("score"), lit(AucLo)), lit(hi - 1))
    val h = scored
      .select(((clamped - AucLo) / AucWidth).cast("long").as("bin"), col("y"))
      .groupBy("bin")
      .agg(sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
    val a = h.select(col("bin").as("bin_a"), col("np").as("np_a"), col("nn").as("nn_a"))
    val b = h.select(col("bin").as("bin_b"), col("np").as("np_b"), col("nn").as("nn_b"))
    a.join(broadcast(b), col("bin_a") >= col("bin_b"))
      .agg(
        sum(when(col("bin_a") > col("bin_b"), lit(2L) * col("np_a") * col("nn_b"))
          .when(col("bin_a") === col("bin_b"), col("np_a") * col("nn_a"))
          .otherwise(0L)).as("num"),
        sum(when(col("bin_a") === col("bin_b"), col("np_a")).otherwise(0L)).as("n_pos"),
        sum(when(col("bin_a") === col("bin_b"), col("nn_a")).otherwise(0L)).as("n_neg"))
      .select(expr(s"(num * $Scale) div (2L * n_pos * n_neg)").as("auc_ppm"),
        col("n_pos"), col("n_neg"))
  }

  // ------------------------------------------------------------------ DuckDB twins

  /** The raw-embedding CTE `e` (vec_id, y, v) for a table. */
  def embedCte(table: String, idCol: String, vecCol: String,
               labelCol: String, posLabel: Int): String =
    s"""e AS MATERIALIZED (SELECT $idCol AS vec_id,
       |  CASE WHEN $labelCol = $posLabel THEN 1 ELSE 0 END AS y,
       |  list_transform($vecCol, x -> CAST(x AS DOUBLE)) AS v FROM $table)""".stripMargin

  /** A feature set + its row-count scalar over `e`, optionally filtered
    * (`where` without the WHERE keyword) — one per training phase.
    */
  def featSetCtes(featName: String, nnName: String, where: String = ""): String = {
    val w = if (where.isEmpty) "" else s" WHERE $where"
    s"""$featName AS MATERIALIZED (
       |  SELECT vec_id, y, unnest(range(0, $Dim)) AS j,
       |         unnest(list_transform(range(0, $Dim), i -> CAST(trunc(v[i+1] * 256) AS BIGINT))) AS x FROM e$w
       |  UNION ALL SELECT vec_id, y, $Dim AS j, 256 AS x FROM e$w),
       |$nnName AS (SELECT count(*) AS n FROM e$w)""".stripMargin
  }

  /** GD steps `g{from}..w{to}` over a feature set, continuing from
    * `w{from-1}` — phases chain by numbering. MATERIALIZED: each step
    * reads its predecessor through two different joins.
    */
  def gdStepCtes(featName: String, nnName: String, fromStep: Int, toStep: Int): String =
    (fromStep to toStep).map { k =>
      val p = k - 1
      s"""g$k AS MATERIALIZED (
         |  SELECT f.j, sum(sc.r * f.x) AS g FROM $featName f JOIN (
         |    SELECT f2.vec_id, sum(f2.x * w.w) - max(f2.y) * $Scale AS r
         |    FROM $featName f2 JOIN w$p w ON f2.j = w.j GROUP BY 1) sc ON f.vec_id = sc.vec_id
         |  GROUP BY 1),
         |w$k AS MATERIALIZED (
         |  SELECT w.j, CAST(w.w - g.g // ((SELECT n FROM $nnName) * $LrDiv) AS BIGINT) AS w
         |  FROM w$p w JOIN g$k g ON w.j = g.j)""".stripMargin
    }.mkString(",\n")

  /** CTE chain `e, feat, nn, w0, g1, w1, …, w{steps}` mirroring
    * [[features]] + [[train]] from zero weights.
    */
  def trainCtes(table: String, idCol: String, vecCol: String,
                labelCol: String, posLabel: Int,
                steps: Int = DefaultSteps): String =
    Seq(embedCte(table, idCol, vecCol, labelCol, posLabel),
      featSetCtes("feat", "nn"),
      s"w0 AS MATERIALIZED (SELECT unnest(range(0, ${Dim + 1})) AS j, CAST(0 AS BIGINT) AS w)",
      gdStepCtes("feat", "nn", 1, steps)).mkString(",\n")

  /** Score + binned-AUC tail over [[trainCtes]]'s final `w{steps}`. */
  def aucSql(steps: Int = DefaultSteps): String = {
    val hi = AucLo + AucBins * AucWidth
    s"""sc AS (SELECT f.vec_id, max(f.y) AS y, sum(f.x * w.w) AS score
       |       FROM feat f JOIN w$steps w ON f.j = w.j GROUP BY 1),
       |h AS (SELECT (LEAST(GREATEST(score, $AucLo), ${hi - 1}) - ($AucLo)) // $AucWidth AS bin,
       |             sum(y) AS np, sum(1 - y) AS nn
       |      FROM sc GROUP BY 1),
       |agg AS (SELECT
       |  CAST(sum(CASE WHEN a.bin > b.bin THEN 2 * a.np * b.nn
       |           WHEN a.bin = b.bin THEN a.np * a.nn ELSE 0 END) AS BIGINT) AS num,
       |  CAST(sum(CASE WHEN a.bin = b.bin THEN a.np ELSE 0 END) AS BIGINT) AS n_pos,
       |  CAST(sum(CASE WHEN a.bin = b.bin THEN a.nn ELSE 0 END) AS BIGINT) AS n_neg
       |  FROM h a JOIN h b ON a.bin >= b.bin)
       |SELECT CAST((num * $Scale) // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm, n_pos, n_neg FROM agg""".stripMargin
  }
}
