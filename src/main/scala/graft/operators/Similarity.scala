package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - brute force: broadcast the (small) query set against the corpus,
  *     exact cosine, top-k. The corpus side streams — no shuffle of the
  *     big table at all, so this scales to any corpus size as long as
  *     the query set broadcasts (the 100 TB-corpus / 1k-query shape).
  *   - sign-LSH: bucket both sides by random-hyperplane sign bits and
  *     only score within a bucket; the bucket join keys the shuffle, so
  *     cost drops from |Q|×|C| to sum of bucket products. Recall is
  *     tunable via the plane count (here 8 planes → 256 buckets).
  *
  * Scale details:
  *   - each row's L2 norm is computed ONCE before the pair join (a
  *     per-pair `sqrt(dot(v,v))` would redo two dim-wide folds for every
  *     candidate);
  *   - top-k is two windows: a local one partitioned by
  *     (query, hash-bucket of the neighbor id) that cuts each query's
  *     candidate stream to `k` per bucket in parallel, then the global
  *     per-query window over at most buckets×k survivors — so no single
  *     task ever reduces a query's full candidate set.
  *
  * Embeddings are cast to array<double> once; dot products are left
  * folds (bit-deterministic, see Hashing.dotFold) so the DuckDB oracle
  * reproduces the doubles exactly.
  */
object Similarity {
  import Hashing._

  /** Hash buckets for the local top-k pre-reduction. */
  val LocalTopKBuckets = 64

  def withDoubleVec(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("v", col(vecCol).cast("array<double>"))

  /** Two-stage top-k: local per (query, neighbor-hash-bucket), then
    * global per query. Output identical to a single global window (the
    * global top-k is a subset of the union of local top-ks); the bucket
    * hash never reaches the output so it needs no oracle mirror.
    */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val order = Seq(col("cosine").desc, col("nn_id"))
    val localW = Window
      .partitionBy(col("query_id"), pmod(hash(col("nn_id")), lit(LocalTopKBuckets)))
      .orderBy(order: _*)
    val globalW = Window.partitionBy(col("query_id")).orderBy(order: _*)
    scored
      .withColumn("_lrk", row_number().over(localW)).filter(col("_lrk") <= k).drop("_lrk")
      .withColumn("rk", row_number().over(globalW)).filter(col("rk") <= k)
      .select(col("query_id"), col("nn_id"), col("cosine"), col("rk"))
  }

  private def norm2(v: Column, dim: Int): Column = sqrt(dotFold(v, v, dim))

  /** Top-k via the bounded [[graft.functions.TopKAgg]] aggregate
    * instead of windows: the k-element buffer partial-aggregates
    * map-side, so a query's candidates never co-locate unreduced.
    * Output identical to [[topK]] (same ordering and tie-breaks).
    */
  def topKViaAgg(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKAgg(k))
    scored.groupBy("query_id")
      .agg(topk(col("cosine"), col("nn_id")).as("_topk"))
      .select(col("query_id"), posexplode(col("_topk")).as(Seq("_i", "_x")))
      .select(col("query_id"), col("_x.id").as("nn_id"), col("_x.score").as("cosine"),
        (col("_i") + 1).cast("int").as("rk"))
  }

  /** bruteForceTopK with the aggregate-based reduction. */
  def bruteForceTopKAgg(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, dim: Int, k: Int): DataFrame = {
    val c = withDoubleVec(corpus, vecCol)
      .select(col(idCol).as("nn_id"), col("v").as("cv"), norm2(col("v"), dim).as("cnrm"))
    val q = withDoubleVec(queries, vecCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"), norm2(col("v"), dim).as("qnrm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cosine", dotFold(col("qv"), col("cv"), dim) / (col("qnrm") * col("cnrm")))
    topKViaAgg(scored, k)
  }

  /** Exact top-k neighbors for each query row (excluding self-matches). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, dim: Int, k: Int): DataFrame = {
    val c = withDoubleVec(corpus, vecCol)
      .select(col(idCol).as("nn_id"), col("v").as("cv"), norm2(col("v"), dim).as("cnrm"))
    val q = withDoubleVec(queries, vecCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"), norm2(col("v"), dim).as("qnrm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cosine", dotFold(col("qv"), col("cv"), dim) / (col("qnrm") * col("cnrm")))
    topK(scored, k)
  }

  /** Sign-LSH bucketed top-k: only candidates sharing a bucket with the
    * query are scored. Returns the same shape as bruteForceTopK
    * (possibly fewer than k rows per query when buckets are small).
    *
    * `tables` > 1 is the recall knob that doesn't fatten buckets:
    * standard multi-table LSH — `tables` independent plane families,
    * candidates = union of per-table bucket matches, deduped BEFORE
    * scoring (a pair found by two tables must not be scored or ranked
    * twice). Measured recall@10 on the 64-dim fixture: 1 table × 4
    * planes = 0.156; 4 tables = 0.448; 8 tables = 0.668 (RecallSpec /
    * PERF.md). Cost is `tables`× the bucket-join shuffle, still never
    * |Q|×|C|.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int, planes: Int = 8,
              tables: Int = 1): DataFrame = {
    val c = withDoubleVec(corpus, vecCol)
      .select(col(idCol).as("nn_id"), col("v").as("cv"), norm2(col("v"), dim).as("cnrm"))
    val q = withDoubleVec(queries, vecCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"), norm2(col("v"), dim).as("qnrm"))
    val scored =
      if (tables <= 1) {
        // single-table: bucket columns ride the rows, one equi-join
        val cb = c.withColumn("bucket", signBucket(col("cv"), dim, planes))
        val qb = q.withColumn("bucket", signBucket(col("qv"), dim, planes))
        cb.join(broadcast(qb), Seq("bucket"))
      } else {
        // multi-table: explode each side onto its (table, bucket) keys,
        // join per table, then dedup candidate PAIRS before scoring
        def banded(df: DataFrame, vc: String) = df.select(col("*"), posexplode(
          array((0 until tables).map(t =>
            signBucket(col(vc), dim, planes, planeOffset = t * planes)): _*))
          .as(Seq("tbl", "bucket")))
        banded(c, "cv").join(broadcast(banded(q, "qv")), Seq("tbl", "bucket"))
          .select("query_id", "qv", "qnrm", "nn_id", "cv", "cnrm")
          .dropDuplicates("query_id", "nn_id")
      }
    val out = scored
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cosine", dotFold(col("qv"), col("cv"), dim) / (col("qnrm") * col("cnrm")))
    topK(out, k)
  }

  /** Embedding near-duplicate pairs within a blocking key (e.g. label):
    * all same-block pairs (a < b) with cosine >= threshold. The block key
    * bounds the quadratic blow-up; at scale the block is an LSH bucket.
    */
  def blockedNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                          blockCol: String, dim: Int, threshold: Double): DataFrame = {
    val e = withDoubleVec(df, vecCol)
      .select(col(idCol).as("id"), col(blockCol).as("blk"), col("v"),
        norm2(col("v"), dim).as("nrm"))
    pairsWithinBlocks(e, dim, threshold)
  }

  /** The scale path for embedding near-dup: the block is a sign-LSH
    * bucket derived from the data itself — no label needed. High-cosine
    * pairs agree on most hyperplane signs, so they usually share the
    * bucket; recall is tuned via `planes` (fewer planes → bigger
    * buckets → higher recall and cost). Shuffle is keyed by the bucket:
    * quadratic only within buckets, never across the corpus.
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                      dim: Int, threshold: Double, planes: Int = 8): DataFrame = {
    val e = withDoubleVec(df, vecCol)
      .select(col(idCol).as("id"), signBucket(col("v"), dim, planes).as("blk"),
        col("v"), norm2(col("v"), dim).as("nrm"))
    pairsWithinBlocks(e, dim, threshold)
  }

  /** Pair scoring runs as a typed mapPartitions (the deliberate
    * "last resort"): at pair grain the dot product dominates and the
    * `aggregate` HOF is interpreted per element — the compiled
    * while-loop below performs the IDENTICAL left-to-right 0.0-seeded
    * fold, so doubles are bit-equal to the expression form (and the
    * DuckDB oracle), just ~2× faster end-to-end.
    */
  private def pairsWithinBlocks(e: DataFrame, dim: Int, threshold: Double): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.as("a").join(e.as("b"), col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.v").as("va"), col("b.v").as("vb"), col("a.nrm").as("na"), col("b.nrm").as("nb"))
      .as[(Long, Long, Array[Double], Array[Double], Double, Double)]
    pairs.mapPartitions { it =>
      it.flatMap { case (ia, ib, va, vb, na, nb) =>
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += va(i) * vb(i); i += 1 }
        val cos = dot / (na * nb)
        if (cos >= threshold) Iterator.single((ia, ib, cos)) else Iterator.empty
      }
    }.toDF("id_a", "id_b", "cosine")
  }

  /** SemDedup (Abbas et al. 2023): semantic deduplication = cluster the
    * embedding space with the IVF coarse quantizer, score cosine pairs
    * ONLY within a cluster, and drop the higher-id member of every pair
    * at or above `threshold`. Returns the survivors as (id, list_id).
    *
    * The cluster assignment is the SAME row-local argmax as
    * [[withIvfList]] and the pair scan the same compiled within-block
    * fold as [[lshNearDupPairs]] — so the shuffle is keyed by the
    * cluster id and the pair count is quadratic only within a cluster,
    * never across the corpus. Keep-lowest-id is decided per PAIR (a
    * doc survives unless some lower-id cluster-mate sits within the
    * threshold), which needs no iteration: one anti-join of the corpus
    * against the dropped-id set.
    */
  /** Cluster-count sizing for [[semDedupAuto]]: nlist ∝ N (rows/250,
    * floored) keeps the expected within-cluster pair count LINEAR in
    * the corpus — the deployment shape. SemdedupScaleLab measured the
    * difference at ×10 rows: nlist pinned = 43× wall / 100× pairs;
    * nlist ∝ N = 7.5× wall / 10.4× pairs (r16, min-of-3).
    */
  def autoNlist(rows: Long, rowsPerList: Int = 250, minList: Int = 8): Int =
    math.max(minList, math.min(1 << 20, rows / math.max(1, rowsPerList)).toInt)

  /** Deployment entry for [[semDedup]]: counts the corpus once,
    * auto-sizes the cluster count via [[autoNlist]] (nlist ∝ N), and
    * generates the deterministic hyperplane centroid set (in
    * production the centroids would be a k-means artifact; any
    * deterministic spread works for the coarse quantizer here). The
    * explicit-centroids overload below stays for pinned/fixture use —
    * the oracle fixtures pass their pin explicitly so the enumerable
    * cluster set is unchanged.
    */
  def semDedupAuto(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                   threshold: Double, rowsPerList: Int = 250): DataFrame = {
    val nlist = autoNlist(df.count(), rowsPerList)
    val centroids = (0 until nlist).map(i =>
      (1 to dim).map(d => graft.functions.Hashing.hyperplane(100 + i, d)).toSeq)
    semDedup(df, idCol, vecCol, dim, centroids, threshold)
  }

  def semDedup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
               centroids: Seq[Seq[Double]], threshold: Double): DataFrame = {
    val e = withIvfList(df, vecCol, dim, centroids)
      .select(col(idCol).as("id"), col("ivf_list").as("blk"), col("v"),
        col("_nrm").as("nrm"))
    val dropped = pairsWithinBlocks(e, dim, threshold)
      .select(col("id_b").as("id")).distinct()
    e.select(col("id"), col("blk").as("list_id"))
      .join(dropped, Seq("id"), "left_anti")
  }

  // ------------------------------------------------------------------ recall
  /** Recall@k of an approximate top-k result against the exact one:
    * per-query |approx ∩ exact| / |exact| on (query_id, nn_id)
    * membership. This is the tuning loop for `planes`/`nProbe` — run it
    * on a sampled query set whenever the index parameters or the data
    * distribution change; distributed (semi-join + one agg), so the
    * sample can be large.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = exact.select("query_id", "nn_id")
      .join(approx.select("query_id", "nn_id"), Seq("query_id", "nn_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("_n_hit"))
    exact.groupBy("query_id").agg(count(lit(1)).as("_n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("_n_hit"), lit(0L)).cast("double") / col("_n_exact")).as("recall"))
  }

  /** Mean recall over all queries (the single tuning number). */
  def meanRecall(approx: DataFrame, exact: DataFrame): Double =
    recallAtK(approx, exact).agg(avg(col("recall"))).head.getDouble(0)

  // ------------------------------------------------------------------ IVF
  /** The centroid set as ONE literal column:
    * `array<struct<id:int, cv:array<double>, cn:double>>` (cn = L2 norm,
    * precomputed driver-side). All centroid scoring folds over this
    * single array value, so the centroid COUNT scales the literal's
    * data, never the generated code — the previous per-centroid inlined
    * fold columns made k a plan-size multiplier and (together with the
    * expanded signBucket) blew janino's 64 KB method limit, silently
    * dropping the ANN probe stage to interpreted execution.
    */
  private def centroidLit(centroids: Seq[Seq[Double]]): Column =
    typedlit(centroids.zipWithIndex.map { case (c, i) =>
      (i, c, math.sqrt(c.map(x => x * x).sum))
    })

  /** Deterministic IVF list assignment: `centroids` are fixed vectors
    * (in production: k-means output; here any deterministic pick — the
    * structure, not the training, is the operator). Each row gets the
    * arg-max-cosine centroid id; ties break to the lower id.
    *
    * Shape: ONE `transform` over the centroid literal scores every
    * centroid exactly once, then `array_max` on (sim, -id) structs
    * picks the winner — struct ordering is (sim, then -id), so equal
    * sims resolve to the LOWEST id, matching the oracle's
    * `ORDER BY sim DESC, list_id` row_number. An `aggregate`-fold
    * argmax was measured 4× slower: its `when(sim > acc.sim,
    * struct(sim, ..))` re-evaluates the dim-wide sim fold on every
    * improving step (visible as two aggregate() copies in the plan).
    * No shuffle: assignment is row-local.
    */
  def withIvfList(df: DataFrame, vecCol: String, dim: Int,
                  centroids: Seq[Seq[Double]]): DataFrame = {
    val e = withDoubleVec(df, vecCol).withColumn("_nrm", norm2(col("v"), dim))
    val best = array_max(transform(centroidLit(centroids), c => struct(
      (dotFold(col("v"), c.getField("_2"), dim) / (col("_nrm") * c.getField("_3"))).as("sim"),
      (-c.getField("_1")).as("nid"))))
    // coalesce is load-bearing, not defensive: array_max is NULLABLE (it
    // can't see the literal is non-empty), so joining on ivf_list makes
    // InferFiltersFromConstraints add isnotnull(ivf_list) — which
    // pushdown substitutes into a pre-projection Filter that re-runs
    // the whole k×dim assignment (with the norm fold re-inlined PER
    // CENTROID) on every corpus row. Non-nullable coalesce lets
    // NullPropagation fold that inferred filter away (measured: the
    // filter was 2.5 s of q_ann_ivf's 4 s at sf0.1; plan-asserted in
    // CodegenSpec).
    e.withColumn("ivf_list", coalesce(-best.getField("nid"), lit(-1)))
  }

  /** [[withIvfList]] variant that also keeps the winning cosine — the
    * input to index-health reporting (how tight each inverted list is).
    * Same argmax, same tie-break, same non-nullable coalesce on the
    * list id; the sim is exact-chain IEEE arithmetic, so downstream
    * consumers quantize it to integer micro-units before any
    * reassociating aggregate.
    */
  def withIvfAssignment(df: DataFrame, vecCol: String, dim: Int,
                        centroids: Seq[Seq[Double]]): DataFrame = {
    val e = withDoubleVec(df, vecCol).withColumn("_nrm", norm2(col("v"), dim))
    val best = array_max(transform(centroidLit(centroids), c => struct(
      (dotFold(col("v"), c.getField("_2"), dim) / (col("_nrm") * c.getField("_3"))).as("sim"),
      (-c.getField("_1")).as("nid"))))
    e.withColumn("_best", best)
      .withColumn("ivf_list", coalesce(-col("_best").getField("nid"), lit(-1)))
      .withColumn("ivf_sim", col("_best").getField("sim"))
      .drop("_best")
  }

  /** Deterministic Lloyd k-means for the IVF coarse quantizer: init =
    * the k lowest-id vectors, then `iters` rounds of
    * assign-via-argmax-cosine + per-list mean. Each round is ONE
    * hash-aggregate over the corpus (the 64 per-dimension sums run as
    * columnar aggregates); only the k×dim centroid matrix — model
    * state, not data — ever reaches the driver, exactly like Spark
    * MLlib's own k-means. Empty lists keep their previous centroid.
    * Output feeds [[withIvfList]]/[[ivfTopK]] unchanged.
    *
    * Determinism note: double addition is reassociated across
    * partitions, so centroid bits may differ across cluster layouts —
    * fine for an index (assignment ties are broken by list id), which
    * is why the ORACLE-checked q_ann_ivf uses fixed centroids while
    * training is exercised by recall tests.
    */
  def trainIvfCentroids(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                        k: Int, iters: Int): Seq[Seq[Double]] = {
    val e = withDoubleVec(df, vecCol).select(col(idCol).as("id"), col("v"))
    var cents: Seq[Seq[Double]] = e.orderBy("id").limit(k)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    for (_ <- 0 until iters) {
      val aggs = count(lit(1)).as("_n") +:
        (0 until dim).map(i => sum(col("v")(i)).as(s"_s$i"))
      val sums = withIvfList(e, "v", dim, cents)
        .groupBy("ivf_list")
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> (r.getLong(1), (0 until dim).map(i => r.getDouble(2 + i))))
        .toMap
      cents = cents.zipWithIndex.map { case (old, i) =>
        sums.get(i).filter(_._1 > 0)
          .map { case (n, s) => s.map(_ / n).toSeq }
          .getOrElse(old)
      }
    }
    cents
  }

  // ------------------------------------------------------------------ PQ
  /** One subspace's product-quantization codebook as a single literal
    * column `array<struct<code:int, cv:array<double>, cvv:double>>`
    * (cvv = ‖c‖², precomputed driver-side with the same 0.0-seeded
    * left fold as [[Hashing.dotFoldSql]]'s list_reduce so the oracle
    * reproduces it bit-for-bit). Same one-literal design as
    * [[centroidLit]]: codebook size scales data, never generated code.
    */
  private def pqCentLit(cents: Seq[Seq[Double]], subDim: Int): Column =
    typedlit(cents.zipWithIndex.map { case (c, i) =>
      (i, c, c.foldLeft(0.0)((a, x) => a + x * x))
    })

  /** Product-quantization encode: the `dim`-wide vector is split into
    * `centroids.size` contiguous subspaces of `dim / M` dims, and each
    * subvector is replaced by the id of its nearest (squared-L2)
    * codebook centroid — 64 floats become M small ints, the memory-
    * compression path that lets a 100 TB embedding corpus hold its
    * whole index in RAM (Jégou et al. 2011; an IVF list + PQ code is
    * the classic IVFADC layout, composable with [[withIvfList]]).
    *
    * Adds `code0..codeM-1` (int) and `qerr_u` — total quantization
    * error Σ_m d²(sv_m, c_code_m) in integer micro-units (the
    * fixed-order 4-term double sum is deterministic, the round-to-long
    * makes the column engine-portable; same scaling trick as
    * q_ivf_assign).
    *
    * Determinism: d² = svv − 2·⟨sv,c⟩ + cvv with every operand and the
    * operation order mirrored in the SQL twin; argmin ties break to the
    * lower code via the same array_max-over-(−d², −code) structs as
    * [[withIvfList]]. Row-local — no shuffle; subvectors and their
    * norms are projected ONCE per row, so the per-row cost is M·K
    * subDim-wide compiled folds.
    */
  def withPqCodes(df: DataFrame, vecCol: String, dim: Int,
                  centroids: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = centroids.size
    require(m > 0 && dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val subDim = dim / m
    centroids.foreach(cs => require(cs.forall(_.size == subDim), "centroid/subspace dim mismatch"))
    val withSv = withDoubleVec(df, vecCol)
      .select(col("*") +: (0 until m).map(s =>
        slice(col("v"), s * subDim + 1, subDim).as(s"_sv$s")): _*)
    val withSvv = withSv
      .select(col("*") +: (0 until m).map(s =>
        dotFold(col(s"_sv$s"), col(s"_sv$s"), subDim).as(s"_svv$s")): _*)
    val coded = (0 until m).foldLeft(withSvv) { (acc, s) =>
      val best = array_max(transform(pqCentLit(centroids(s), subDim), c => struct(
        (-(col(s"_svv$s") - lit(2.0) * dotFold(col(s"_sv$s"), c.getField("_2"), subDim)
          + c.getField("_3"))).as("s"),
        (-c.getField("_1")).as("nid"))))
      acc.withColumn(s"_best$s", best)
    }
    val errSum = (0 until m).map(s => -col(s"_best$s").getField("s")).reduce(_ + _)
    coded
      .select(col("*") +:
        (0 until m).map(s => (-col(s"_best$s").getField("nid")).as(s"code$s")) :+
        round(errSum * lit(1000000.0)).cast("long").as("qerr_u"): _*)
      .drop((0 until m).flatMap(s => Seq(s"_sv$s", s"_svv$s", s"_best$s")): _*)
  }

  /** Deterministic per-subspace Lloyd k-means for the PQ codebooks:
    * init = the k lowest-id vectors' subvectors, then `iters` rounds of
    * encode + per-(subspace, code) mean. Each round is one encode pass
    * plus M hash-aggregates over the corpus (subDim columnar sums);
    * only the M×k×subDim codebook — model state — reaches the driver,
    * exactly like [[trainIvfCentroids]]. Empty cells keep their
    * previous centroid.
    *
    * Same determinism caveat as the IVF trainer: cross-partition double
    * sums reassociate, so trained codebook bits can vary with cluster
    * layout — fine for an index; the ORACLE-gated q_pq_* queries use
    * fixed codebooks while training quality is exercised by PqSpec's
    * recall tests (untrained uniform-random codebooks measured 0.048
    * recall@5 on the fixture vs ~0.7 trained — the codebook IS the
    * index quality).
    */
  def trainPqCodebooks(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                       m: Int, k: Int, iters: Int): Seq[Seq[Seq[Double]]] = {
    val subDim = dim / m
    val e = withDoubleVec(df, vecCol).select(col(idCol).as("id"), col("v"))
    var books: Seq[Seq[Seq[Double]]] = {
      val seed = e.orderBy("id").limit(k).collect().map(_.getSeq[Double](1).toSeq)
      (0 until m).map(s => seed.map(v => v.slice(s * subDim, (s + 1) * subDim)).toSeq)
    }
    for (_ <- 0 until iters) {
      val coded = withPqCodes(e, "v", dim, books).localCheckpoint(true)
      books = (0 until m).map { s =>
        val aggs = count(lit(1)).as("_n") +: (0 until subDim).map(i =>
          sum(col("v")(s * subDim + i)).as(s"_s$i"))
        val sums = coded.groupBy(col(s"code$s"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map(r => r.getInt(0) -> ((r.getLong(1), (0 until subDim).map(i => r.getDouble(2 + i)))))
          .toMap
        books(s).zipWithIndex.map { case (old, c) =>
          sums.get(c).filter(_._1 > 0)
            .map { case (n, ss) => ss.map(_ / n).toSeq }
            .getOrElse(old)
        }
      }
    }
    books
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: each query
    * precomputes its M×K lookup table of exact subspace distances, and
    * a corpus row's approximate distance is M table lookups and a
    * fixed-order M-term add — no per-pair dim-wide arithmetic at all.
    * This is the scan that makes brute-force over a PQ-compressed
    * corpus feasible: the corpus side streams (codes only, no
    * vectors), the query side broadcasts, cost per pair is O(M).
    * Smaller adc = closer; per-query top-k ties break to the lower
    * nn_id. Exact-rerank of the survivors against the raw vectors is
    * the standard follow-up ([[bruteForceTopK]] on the top-k ids).
    */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                dim: Int, centroids: Seq[Seq[Seq[Double]]], k: Int): DataFrame = {
    val m = centroids.size
    val subDim = dim / m
    val coded = withPqCodes(corpus, vecCol, dim, centroids)
      .select(col(idCol).as("nn_id") +: (0 until m).map(s => col(s"code$s")): _*)
    val q0 = withDoubleVec(queries, vecCol)
      .select(col(idCol).as("query_id") +: (0 until m).map(s =>
        slice(col("v"), s * subDim + 1, subDim).as(s"_qs$s")): _*)
    val q1 = q0.select((col("query_id") +: (0 until m).map(s => col(s"_qs$s"))) ++
      (0 until m).map(s => dotFold(col(s"_qs$s"), col(s"_qs$s"), subDim).as(s"_qvv$s")): _*)
    val withLut = q1.select(col("query_id") +: (0 until m).map(s =>
      transform(pqCentLit(centroids(s), subDim), c =>
        col(s"_qvv$s") - lit(2.0) * dotFold(col(s"_qs$s"), c.getField("_2"), subDim)
          + c.getField("_3")).as(s"_lut$s")): _*)
    val scored = coded.crossJoin(broadcast(withLut))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("adc",
        (0 until m).map(s => element_at(col(s"_lut$s"), col(s"code$s") + 1)).reduce(_ + _))
    // Two-stage top-k (same shape as [[topK]], ascending-distance order).
    val order = Seq(col("adc").asc, col("nn_id"))
    val localW = Window
      .partitionBy(col("query_id"), pmod(hash(col("nn_id")), lit(LocalTopKBuckets)))
      .orderBy(order: _*)
    val globalW = Window.partitionBy(col("query_id")).orderBy(order: _*)
    scored
      .withColumn("_lrk", row_number().over(localW)).filter(col("_lrk") <= k).drop("_lrk")
      .withColumn("rk", row_number().over(globalW)).filter(col("rk") <= k)
      .select(col("query_id"), col("nn_id"), col("adc"), col("rk"))
  }

  /** IVFADC: the canonical compressed-index layout (Jégou et al. 2011)
    * — IVF list pruning composed with ADC scoring over PQ codes. The
    * corpus side carries (id, list_id, M codes): ~20 bytes/vector
    * instead of dim×4, and the scan touches only the query's `nProbe`
    * lists. Unlike the flat [[pqAdcTopK]] scan (a documented
    * broadcast-NLJ), the probe join here is a plain equi-join on
    * list_id — at 100 TB this is the shape that keeps both the bytes
    * (PQ) and the candidate count (IVF) sublinear. Exact re-rank of
    * the shortlist against raw vectors is the standard follow-up, as
    * with pqAdcTopK.
    */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                 dim: Int, k: Int, centroids: Seq[Seq[Double]], nProbe: Int,
                 books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val m = books.size
    val subDim = dim / m
    val c = withPqCodes(withIvfList(corpus, vecCol, dim, centroids), "v", dim, books)
      .select(col(idCol).as("nn_id") +: col("ivf_list").as("list_id") +:
        (0 until m).map(s => col(s"code$s")): _*)
    // probe-list selection: identical ranking to ivfTopK (sim desc,
    // list_id desc on exact ties)
    val qSims = withDoubleVec(queries, vecCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"), norm2(col("v"), dim).as("qnrm"))
    val probes = transform(centroidLit(centroids), c0 => struct(
      (dotFold(col("qv"), c0.getField("_2"), dim) / (col("qnrm") * c0.getField("_3"))).as("sim"),
      c0.getField("_1").as("list_id")))
    val qp = qSims.withColumn("_probe", slice(reverse(array_sort(probes)), 1, nProbe))
      .select(col("query_id"), col("qv"), explode(col("_probe.list_id")).as("list_id"))
    // per-(query, probed list) lookup tables, same arithmetic as pqAdcTopK
    val qs = qp.select(col("query_id") +: col("list_id") +: (0 until m).map(s =>
      slice(col("qv"), s * subDim + 1, subDim).as(s"_qs$s")): _*)
    val qv = qs.select((col("query_id") +: col("list_id") +:
      (0 until m).map(s => col(s"_qs$s"))) ++
      (0 until m).map(s => dotFold(col(s"_qs$s"), col(s"_qs$s"), subDim).as(s"_qvv$s")): _*)
    val luts = qv.select(col("query_id") +: col("list_id") +: (0 until m).map(s =>
      transform(pqCentLit(books(s), subDim), c0 =>
        col(s"_qvv$s") - lit(2.0) * dotFold(col(s"_qs$s"), c0.getField("_2"), subDim)
          + c0.getField("_3")).as(s"_lut$s")): _*)
    val scored = c.join(broadcast(luts), Seq("list_id"))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("adc",
        (0 until m).map(s => element_at(col(s"_lut$s"), col(s"code$s") + 1)).reduce(_ + _))
    val order = Seq(col("adc").asc, col("nn_id"))
    val localW = Window
      .partitionBy(col("query_id"), pmod(hash(col("nn_id")), lit(LocalTopKBuckets)))
      .orderBy(order: _*)
    val globalW = Window.partitionBy(col("query_id")).orderBy(order: _*)
    scored
      .withColumn("_lrk", row_number().over(localW)).filter(col("_lrk") <= k).drop("_lrk")
      .withColumn("rk", row_number().over(globalW)).filter(col("rk") <= k)
      .select(col("query_id"), col("nn_id"), col("adc"), col("rk"))
  }

  /** ADC shortlist → exact re-rank: the production PQ retrieval
    * pipeline in one operator. The compressed scan winnows the corpus
    * to `shortlistK` candidates per query (O(M) per pair, codes-only),
    * then ONLY those rows' raw vectors are fetched and scored with
    * exact squared-L2 — measured on the fixture this lifts recall@5
    * from 0.232 (ADC-only, trained 32-bit codes) to 0.752 (PqSpec).
    * The vector fetch is a broadcast of the (queries × shortlistK)
    * id list against the corpus — the big side streams, nothing
    * shuffles. Output ranks by exact d2 (ties → lower nn_id).
    */
  def pqRerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                   dim: Int, books: Seq[Seq[Seq[Double]]],
                   shortlistK: Int, k: Int): DataFrame = {
    val shortlist = pqAdcTopK(corpus, queries, idCol, vecCol, dim, books, shortlistK)
      .select("query_id", "nn_id")
    val c = withDoubleVec(corpus, vecCol).select(col(idCol).as("nn_id"), col("v").as("cv"))
    val q = withDoubleVec(queries, vecCol).select(col(idCol).as("query_id"), col("v").as("qv"))
    val d2 = dotFold(col("qv"), col("qv"), dim) -
      lit(2.0) * dotFold(col("qv"), col("cv"), dim) +
      dotFold(col("cv"), col("cv"), dim)
    val w = Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("nn_id"))
    c.join(broadcast(shortlist), Seq("nn_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("d2", d2)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("nn_id"), col("d2"), col("rk"))
  }

  // ------------------------------------------------------------ scalar quantization
  /** Per-dimension (min, max) ranges for int8 scalar quantization —
    * the 2×dim-double model state (like the IVF centroids / PQ
    * codebooks, a driver-side collect of bounded size). min/max are
    * order-insensitive exact aggregates, so unlike a trained k-means
    * codebook the ranges are bit-identical on any cluster layout —
    * which is what lets the SQ queries run under the oracle hash gate
    * with ranges trained inside the query itself.
    */
  def trainSqRanges(df: DataFrame, vecCol: String, dim: Int): Seq[(Double, Double)] = {
    val e = withDoubleVec(df, vecCol)
    val aggs = (0 until dim).flatMap(i =>
      Seq(min(col("v")(i)).as(s"_mn$i"), max(col("v")(i)).as(s"_mx$i")))
    val r = e.agg(aggs.head, aggs.tail: _*).collect()(0)
    (0 until dim).map(i => (r.getDouble(2 * i), r.getDouble(2 * i + 1)))
  }

  /** Int8 scalar-quantization encode: each dimension maps to
    * round((v−min)/scale) with scale = (max−min)/255 — 4-byte floats
    * become 1-byte codes, the simplest of the embedding-compression
    * ladder (SQ → PQ → IVFADC). Unlike PQ the code is per-DIMENSION,
    * so reconstruction min+code·scale is exact to half a step and
    * 8-bit recall stays ≈1 where 32-bit PQ codes trade much more.
    *
    * Adds `_c0.._cN` (int codes), `_r0.._rN` (reconstructed doubles)
    * and `qerr_u` (Σ (v−recon)², integer micro-units, fixed fold
    * order). Row-local, no shuffle; constant-range dims (scale 0)
    * encode as 0 and reconstruct the constant exactly.
    */
  def withSqCodes(df: DataFrame, vecCol: String, dim: Int,
                  ranges: Seq[(Double, Double)]): DataFrame = {
    require(ranges.size == dim, "one (min,max) range per dimension")
    val e = withDoubleVec(df, vecCol)
    val coded = e.select(col("*") +: ranges.zipWithIndex.map { case ((mn, mx), i) =>
      val scale = (mx - mn) / 255.0
      val c = if (scale == 0.0) lit(0)
        else round((col("v")(i) - lit(mn)) / lit(scale)).cast("int")
      c.as(s"_c$i")
    }: _*)
    val recon = coded.select(col("*") +: ranges.zipWithIndex.map { case ((mn, mx), i) =>
      val scale = (mx - mn) / 255.0
      (lit(mn) + col(s"_c$i").cast("double") * lit(scale)).as(s"_r$i")
    }: _*)
    val errTerms = (0 until dim).map { i =>
      val d = col("v")(i) - col(s"_r$i")
      d * d
    }
    recon.withColumn("qerr_u", round(errTerms.reduce(_ + _) * lit(1000000.0)).cast("long"))
  }

  /** ADC top-k over the SQ-compressed corpus: the corpus side streams
    * codes only (dim bytes/vector), each pair scores as the exact
    * query vector against the reconstruction — per-pair cost is one
    * dim-wide compiled fold, with NO raw corpus vectors read past the
    * encode. Same broadcast-query scan shape as [[pqAdcTopK]]; smaller
    * d2 = closer, ties to the lower nn_id.
    */
  def sqAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                dim: Int, ranges: Seq[(Double, Double)], k: Int): DataFrame = {
    val coded = withSqCodes(corpus, vecCol, dim, ranges)
      .select(col(idCol).as("nn_id") +: (0 until dim).map(i => col(s"_r$i")): _*)
    val q = withDoubleVec(queries, vecCol).select(col(idCol).as("query_id"), col("v").as("qv"))
    val d2 = (0 until dim).map { i =>
      val d = col("qv")(i) - col(s"_r$i")
      d * d
    }.reduce(_ + _)
    val scored = coded.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("d2", d2)
    val order = Seq(col("d2").asc, col("nn_id"))
    val localW = Window
      .partitionBy(col("query_id"), pmod(hash(col("nn_id")), lit(LocalTopKBuckets)))
      .orderBy(order: _*)
    val globalW = Window.partitionBy(col("query_id")).orderBy(order: _*)
    scored
      .withColumn("_lrk", row_number().over(localW)).filter(col("_lrk") <= k).drop("_lrk")
      .withColumn("rk", row_number().over(globalW)).filter(col("rk") <= k)
      .select(col("query_id"), col("nn_id"), col("d2"), col("rk"))
  }

  /** IVF top-k: corpus rows are searched only in the query's `nProbe`
    * closest lists. The coarse quantizer bounds the shuffle exactly like
    * the LSH bucket join; recall is tuned via nProbe.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              dim: Int, k: Int, centroids: Seq[Seq[Double]], nProbe: Int): DataFrame = {
    val c = withIvfList(corpus, vecCol, dim, centroids)
      .select(col(idCol).as("nn_id"), col("v").as("cv"), col("_nrm").as("cnrm"),
        col("ivf_list").as("list_id"))
    // Queries probe their nProbe closest lists: rank centroid cosines.
    // One `transform` over the centroid literal (not k inlined structs):
    // struct order (sim, list_id) makes array_sort+reverse rank by
    // cosine desc then list_id desc, exactly as before.
    val qSims = withDoubleVec(queries, vecCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"), norm2(col("v"), dim).as("qnrm"))
    val probes = transform(centroidLit(centroids), c => struct(
      (dotFold(col("qv"), c.getField("_2"), dim) / (col("qnrm") * c.getField("_3"))).as("sim"),
      c.getField("_1").as("list_id")))
    val q = qSims.withColumn("_probe",
        slice(reverse(array_sort(probes)), 1, nProbe))
      .select(col("query_id"), col("qv"), col("qnrm"),
        explode(col("_probe.list_id")).as("list_id"))
    val scored = c.join(broadcast(q), Seq("list_id"))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cosine", dotFold(col("qv"), col("cv"), dim) / (col("qnrm") * col("cnrm")))
    topK(scored, k)
  }
}
