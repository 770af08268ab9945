package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization: encode invariants and ADC retrieval quality
  * on the real embeddings fixture (500 × 64-dim).
  */
class PqSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private val dim = 64
  private val m = 4
  private val kc = 8
  private val subDim = dim / m

  private lazy val cents: Seq[Seq[Seq[Double]]] =
    (0 until m).map(s => (0 until kc).map(c =>
      (1 to subDim).map(dd => Hashing.hyperplane(300 + s * kc + c, dd)).toSeq).toSeq)

  private lazy val emb: DataFrame = Tables.embeddings(spark, d)

  test("encode: codes are in range, qerr is non-negative, every subspace discriminates") {
    val coded = Similarity.withPqCodes(emb, "embedding", dim, cents).localCheckpoint(true)
    (0 until m).foreach { s =>
      assert(coded.filter(col(s"code$s") < 0 || col(s"code$s") >= kc).isEmpty)
      // a codebook where every vector collapses onto one centroid is
      // degenerate — the fixture must spread over >1 code per subspace
      assert(coded.select(s"code$s").distinct().count() > 1)
    }
    assert(coded.filter(col("qerr_u") < 0).isEmpty)
  }

  test("encode picks the argmin centroid: no other code has smaller subspace distance") {
    // Recompute every (vector, subspace, code) distance the slow way and
    // check the chosen code's distance is the minimum (ties -> lower code).
    val coded = Similarity.withPqCodes(emb, "embedding", dim, cents)
    val v = coded.select(col("vec_id"), col("v"),
      array((0 until m).map(s => col(s"code$s")): _*).as("codes")).collect()
    v.take(50).foreach { r =>
      val vec = r.getSeq[Double](1)
      val codes = r.getSeq[Int](2)
      (0 until m).foreach { s =>
        val sv = vec.slice(s * subDim, (s + 1) * subDim)
        val dists = (0 until kc).map { c =>
          val cv = cents(s)(c)
          c -> sv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
        }
        val best = dists.minBy { case (c, d2) => (d2, c) }._1
        assert(codes(s) === best, s"vec ${r.getLong(0)} subspace $s")
      }
    }
  }

  test("adc: top-k is dense-ranked, self-free, and distances are non-decreasing in rank") {
    val queries = emb.filter(col("vec_id") < 8)
    val top = Similarity.pqAdcTopK(emb, queries, "vec_id", "embedding", dim, cents, 5)
      .localCheckpoint(true)
    assert(top.filter(col("nn_id") === col("query_id")).isEmpty)
    assert(top.groupBy("query_id").count().filter(col("count") =!= 5).isEmpty)
    val w = Window.partitionBy("query_id").orderBy("rk")
    val bad = top.withColumn("_prev", lag("adc", 1).over(w))
      .filter(col("_prev").isNotNull && col("adc") < col("_prev"))
    assert(bad.isEmpty)
  }

  private def exactL2TopK(queries: DataFrame, k: Int): DataFrame = {
    val e = Similarity.withDoubleVec(emb, "embedding")
    val c = e.select(col("vec_id").as("nn_id"), col("v").as("cv"))
    val q = Similarity.withDoubleVec(queries, "embedding")
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val d2 = Hashing.dotFold(col("qv"), col("qv"), dim) -
      lit(2.0) * Hashing.dotFold(col("qv"), col("cv"), dim) +
      Hashing.dotFold(col("cv"), col("cv"), dim)
    val w = Window.partitionBy("query_id").orderBy(col("d2").asc, col("nn_id"))
    c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("d2", d2)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select("query_id", "nn_id", "rk")
  }

  test("adc recall vs exact L2: rises with codebook bits, trained beats untrained") {
    val queries = emb.filter(col("vec_id") < 25)
    val exact = exactL2TopK(queries, 5).localCheckpoint(true)
    def recall(mm: Int, kk: Int, iters: Int): Double = {
      val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", dim, mm, kk, iters)
      Similarity.meanRecall(
        Similarity.pqAdcTopK(emb, queries, "vec_id", "embedding", dim, books, 5), exact)
    }
    val rFixed = Similarity.meanRecall(
      Similarity.pqAdcTopK(emb, queries, "vec_id", "embedding", dim, cents, 5), exact)
    val r12 = recall(4, 8, 2) // 12-bit code
    val r32 = recall(8, 16, 2) // 32-bit code
    info(f"recall@5: fixed 4x8 = $rFixed%.3f, trained 4x8 = $r12%.3f, trained 8x16 = $r32%.3f")
    assert(r12 >= 2 * rFixed,
      f"training must dominate uniform-random codebooks: $r12%.3f vs $rFixed%.3f")
    assert(r32 > r12, f"more codebook bits must raise recall: $r32%.3f vs $r12%.3f")
  }

  test("adc shortlist + exact re-rank: the standard IVFADC-style pipeline recovers recall") {
    // ADC is a SHORTLIST generator: scan the compressed corpus for a
    // wide top-N, then exact-score only those N raw vectors. recall@5
    // of the re-ranked result equals ADC's recall@N — the cheap scan
    // does the winnowing, the expensive exact pass touches only N rows.
    val queries = emb.filter(col("vec_id") < 25)
    val exact = exactL2TopK(queries, 5).localCheckpoint(true)
    val books = Similarity.trainPqCodebooks(emb, "vec_id", "embedding", dim, 8, 16, iters = 2)
    val shortlist = Similarity.pqAdcTopK(emb, queries, "vec_id", "embedding", dim, books, 50)
      .select("query_id", "nn_id")
    val c = Similarity.withDoubleVec(emb, "embedding")
      .select(col("vec_id").as("nn_id"), col("v").as("cv"))
    val q = Similarity.withDoubleVec(queries, "embedding")
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val d2 = Hashing.dotFold(col("qv"), col("qv"), dim) -
      lit(2.0) * Hashing.dotFold(col("qv"), col("cv"), dim) +
      Hashing.dotFold(col("cv"), col("cv"), dim)
    val w = Window.partitionBy("query_id").orderBy(col("d2").asc, col("nn_id"))
    val reranked = shortlist.join(c, "nn_id").join(broadcast(q), "query_id")
      .withColumn("d2", d2)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("query_id", "nn_id")
    val rShort = Similarity.meanRecall(
      Similarity.pqAdcTopK(emb, queries, "vec_id", "embedding", dim, books, 5), exact)
    val rReranked = Similarity.meanRecall(reranked, exact)
    info(f"recall@5: adc-only = $rShort%.3f, adc top-50 + exact re-rank = $rReranked%.3f")
    assert(rReranked >= 0.7, f"reranked recall@5 = $rReranked%.3f")
    assert(rReranked > rShort, "re-ranking a 10x shortlist must beat raw ADC top-5")
  }

  private lazy val ivfCents: Seq[Seq[Double]] =
    (0 until 8).map(i => (1 to dim).map(dd => Hashing.hyperplane(100 + i, dd)).toSeq)

  test("ivfadc probing every list equals the flat ADC scan exactly") {
    // with nProbe = #lists the candidate set is the whole corpus, so
    // IVFADC must reproduce pqAdcTopK bit-for-bit (same codes, same
    // luts, same tie-breaks) — the list pruning is the ONLY difference.
    val queries = emb.filter(col("vec_id") < 8)
    val full = Similarity.ivfAdcTopK(emb, queries, "vec_id", "embedding", dim, 5,
      ivfCents, nProbe = 8, books = cents)
    val flat = Similarity.pqAdcTopK(emb, queries, "vec_id", "embedding", dim, cents, 5)
    assert(rows(full.orderBy("query_id", "rk")) === rows(flat.orderBy("query_id", "rk")))
  }

  test("ivfadc at nProbe=2 returns a subset of candidates scored identically to the flat scan") {
    val queries = emb.filter(col("vec_id") < 8)
    val pruned = Similarity.ivfAdcTopK(emb, queries, "vec_id", "embedding", dim, 3,
      ivfCents, nProbe = 2, books = cents)
      .select(col("query_id"), col("nn_id"), col("adc").as("adc_ivf"))
    // every returned pair's ADC must equal the flat scan's ADC for that
    // pair — pruning changes WHICH pairs are scored, never the score
    val flatAll = Similarity.pqAdcTopK(emb, queries, "vec_id", "embedding", dim, cents, 500)
      .select(col("query_id"), col("nn_id"), col("adc"))
    val joined = pruned.join(flatAll, Seq("query_id", "nn_id"), "left")
    assert(joined.filter(col("adc").isNull || col("adc") =!= col("adc_ivf")).isEmpty)
  }

  test("rerank with a corpus-wide shortlist degenerates to exact L2 top-k") {
    // shortlistK >= |corpus| means ADC prunes nothing, so the re-rank
    // stage IS the exact search — the two ends of the pipeline meet.
    val queries = emb.filter(col("vec_id") < 8)
    val reranked = Similarity.pqRerankTopK(emb, queries, "vec_id", "embedding",
      dim, cents, shortlistK = 1000, k = 5)
    val exact = exactL2TopK(queries, 5)
    assert(rows(reranked.select("query_id", "nn_id", "rk").orderBy("query_id", "rk"))
      === rows(exact.orderBy("query_id", "rk")))
  }

  test("adc on an exact-duplicate query returns the duplicate first at its own quantization error") {
    // corpus = fixture plus a copy of vector 0 under id -1: the copy
    // shares vector 0's codes, so ADC(query 0 -> copy) = qerr(query 0),
    // which is the MINIMUM possible ADC (every other cell's distance is
    // >= the per-subspace minima by construction); the id -1 wins any
    // same-cell tie, so the duplicate must be rank 1 exactly.
    val dup = emb.filter(col("vec_id") === 0).withColumn("vec_id", lit(-1L))
    val corpus = emb.unionByName(dup)
    val top1 = Similarity.pqAdcTopK(corpus, emb.filter(col("vec_id") === 0),
      "vec_id", "embedding", dim, cents, 1).collect().head
    assert(top1.getAs[Long]("nn_id") === -1L)
    // and that minimal ADC is the query's own quantization error: the
    // encode-side qerr_u is round(adc * 1e6) of the same fold.
    val qerrU = Similarity.withPqCodes(emb.filter(col("vec_id") === 0), "embedding", dim, cents)
      .select("qerr_u").collect().head.getLong(0)
    assert(math.abs(top1.getAs[Double]("adc") * 1e6 - qerrU) <= 0.5)
  }
}
