package graft.operators

import graft.SparkSpec

/** ANN and near-dup invariants on tiny hand-built embeddings. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f), "a"),
    (2L, Array(0.9f, 0.1f, 0.0f, 0.0f), "a"),   // near 1
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f), "a"),   // orthogonal to 1
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f), "b")   // opposite of 1
  ).toDF("vec_id", "embedding", "label")

  test("bruteForceTopK ranks by exact cosine, excludes self, respects k") {
    val out = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === 1L),
        "vec_id", "embedding", dim = 4, k = 2)
      .select("nn_id", "rk").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.toSeq === Seq((2L, 1), (3L, 2))) // 2 closest, then orthogonal; self and opposite excluded/below
  }

  test("two-stage top-k equals a single global ranking") {
    val corpus = (1 to 200).map(i => (i.toLong, Array(i.toFloat, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val topk = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 4, 5)
      .select("nn_id", "rk").as[(Long, Int)].collect().sortBy(_._2)
    // cosine grows with i for this family: top-5 are the 5 largest ids
    assert(topk.map(_._1).toSeq === Seq(200L, 199L, 198L, 197L, 196L))
  }

  test("aggregate-based top-k equals the window-based top-k exactly") {
    val corpus = (1 to 300).map(i => (i.toLong, Array(i.toFloat, 7.0f, 3.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = (301 to 305).map(i => (i.toLong, Array(1.0f, i.toFloat, 0.5f, 0.0f))).toDF("vec_id", "embedding")
    val win = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", 4, 7)
      .select("query_id", "nn_id", "cosine", "rk").collect().map(_.toSeq).toSet
    val agg = Similarity.bruteForceTopKAgg(corpus, q, "vec_id", "embedding", 4, 7)
      .select("query_id", "nn_id", "cosine", "rk").collect().map(_.toSeq).toSet
    assert(agg === win)
  }

  test("trained IVF centroids separate clustered data into pure lists") {
    // three direction families in 4-dim with deterministic per-vector
    // noise; ids interleave clusters so the lowest-id init spans them
    val rows = (0 until 90).map { i =>
      val c = i % 3
      val n = 0.05f * ((i / 3) % 5)
      val base = Array(0f, 0f, 0f, 0f); base(c) = 1f; base((c + 1) % 3) += n
      (i.toLong, base)
    }
    val df = rows.toDF("vec_id", "embedding")
    val cents = Similarity.trainIvfCentroids(df, "vec_id", "embedding", dim = 4, k = 3, iters = 3)
    assert(cents.length === 3)
    val assigned = Similarity.withIvfList(df, "embedding", 4, cents)
      .select($"vec_id", $"ivf_list").as[(Long, Int)].collect()
    val byCluster = assigned.groupBy(_._1 % 3).view.mapValues(_.map(_._2).distinct.toSeq).toMap
    // each true cluster lands in exactly one list, and lists are distinct
    assert(byCluster.values.forall(_.size === 1), byCluster.toString)
    assert(byCluster.values.flatten.toSet.size === 3)
  }

  test("topKViaAgg drops NaN scores instead of ranking them first") {
    val scored = Seq(
      (1L, 10L, 0.9), (1L, 11L, Double.NaN), (1L, 12L, 0.5)
    ).toDF("query_id", "nn_id", "cosine")
    val out = Similarity.topKViaAgg(scored, 2)
      .select("nn_id", "rk").as[(Long, Int)].collect().sortBy(_._2)
    assert(out.toSeq === Seq((10L, 1), (12L, 2))) // NaN candidate never enters the buffer
  }

  test("blockedNearDupPairs only pairs within a block and applies the threshold") {
    val out = Similarity.blockedNearDupPairs(emb, "vec_id", "embedding", "label", 4, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 2L))) // 3 is orthogonal (cos 0); 4 in another block
  }

  test("semDedup drops the higher-id member of each within-cluster near-dup pair") {
    // centroids on the x and y axes → two clusters. 1 and 2 land in
    // cluster 0 at cosine ≈ 0.994 → 2 drops; 3 and 5 land in cluster 1
    // likewise → 5 drops; 4 (opposite of x) lands in cluster 1 at
    // cosine 0 to both members → survives (below threshold).
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val data = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
      (5L, Array(0.1f, 0.9f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(data, "vec_id", "embedding", 4, cents, 0.9)
      .as[(Long, Int)].collect().toMap
    assert(out === Map(1L -> 0, 3L -> 1, 4L -> 1))
  }

  test("semDedupAuto sizes nlist to the corpus (nlist ∝ N) and dedups exact duplicates") {
    // sizing law: rows/250 floored at the minimum, capped
    assert(Similarity.autoNlist(0) === 8)
    assert(Similarity.autoNlist(2000) === 8)
    assert(Similarity.autoNlist(25000) === 100)
    assert(Similarity.autoNlist(250L * (1 << 20) * 2) === (1 << 20))
    assert(Similarity.autoNlist(25000, rowsPerList = 2500) === 10)
    // deployment entry end-to-end: identical vectors collapse to the
    // lowest id regardless of which auto cluster they land in
    val data = (1L to 40L).map { i =>
      val base = (i % 5).toInt
      (i, Array.tabulate(4)(d => if (d == base % 4) 1.0f else 0.05f * base))
    }.toDF("vec_id", "embedding")
    val out = Similarity.semDedupAuto(data, "vec_id", "embedding", 4, 0.999)
      .as[(Long, Int)].collect()
    // 5 distinct vector values → exactly 5 survivors, each the lowest id of its value class
    assert(out.map(_._1).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("LSH top-1 recall is perfect on clustered data (perturbation can't flip sign buckets)") {
    // corpus: 100 distinct ±1-valued vectors; queries: 8 of them nudged
    // by 0.1 — every dim keeps its sign, so query and base share the
    // LSH bucket by construction and the base must rank first.
    def baseVec(i: Int): Array[Float] =
      Array.tabulate(16)(d => if (((i >> (d % 7)) & 1) == 1) 1.0f else -1.0f)
    val corpus = (0 until 100).map(i => (i.toLong, baseVec(i))).toDF("vec_id", "embedding")
    val queries = (0 until 8).map(i => (1000L + i,
      baseVec(i).map(x => x + 0.1f * math.signum(x)))).toDF("vec_id", "embedding")
    val top1 = Similarity.lshTopK(corpus, queries, "vec_id", "embedding", 16, 1, planes = 8)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toMap
    (0 until 8).foreach { i =>
      assert(top1(1000L + i) === i.toLong, s"query $i")
    }
  }

  test("lshNearDupPairs finds the same high-cosine pair label-free") {
    val out = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 4, 0.5, planes = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(out.contains((1L, 2L))) // near-identical vectors share all sign bits
    assert(!out.contains((1L, 4L))) // opposite vectors land in different buckets
  }

  test("withIvfAssignment agrees with withIvfList and keeps a sane winning cosine") {
    val dim = 4
    val cents = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val vecs = Seq(
      (1L, Array(0.9f, 0.1f, 0f, 0f)),
      (2L, Array(0.1f, 0.8f, 0.1f, 0f)),
      (3L, Array(0.5f, 0.5f, 0f, 0f))) // exact tie -> lowest list id
      .toDF("vec_id", "embedding")
    val a = Similarity.withIvfAssignment(vecs, "embedding", dim, cents)
      .select("vec_id", "ivf_list", "ivf_sim")
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    val l = Similarity.withIvfList(vecs, "embedding", dim, cents)
      .select("vec_id", "ivf_list").as[(Long, Int)].collect().sortBy(_._1)
    assert(a.map(t => (t._1, t._2)).toSeq === l.toSeq)
    assert(a.map(_._2).toSeq === Seq(0, 1, 0)) // tie broke to list 0
    // the winning cosine is the max over centroids, in (0, 1]
    assert(a.forall(t => t._3 > 0.0 && t._3 <= 1.0 + 1e-12))
  }
}
