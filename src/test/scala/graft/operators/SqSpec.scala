package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SqSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8

  /** Deterministic pseudo-random corpus: 64 vectors in 8 dims from a
    * fixed LCG, plus one constant dimension (index 7) to exercise the
    * scale-0 path.
    */
  private def corpus = {
    var x = 12345L
    def next(): Float = { x = x * 6364136223846793005L + 1442695040888963407L; ((x >>> 33) % 1000L).toFloat / 500.0f - 1.0f }
    (0 until 64).map { i =>
      (i.toLong, Array.tabulate(Dim)(d => if (d == 7) 0.25f else next()))
    }.toDF("vec_id", "embedding")
  }

  test("reconstruction error is within half a quantization step per dim") {
    val ranges = Similarity.trainSqRanges(corpus, "embedding", Dim)
    val out = Similarity.withSqCodes(corpus, "embedding", Dim, ranges)
    // max per-dim error = scale/2; qerr <= sum of (scale/2)^2
    val bound = ranges.map { case (mn, mx) => val s = (mx - mn) / 255.0; (s / 2) * (s / 2) }.sum
    val maxErr = out.agg(max(col("qerr_u"))).collect()(0).getLong(0) / 1e6
    assert(maxErr <= bound + 1e-9, s"qerr $maxErr exceeds bound $bound")
  }

  test("constant dimension encodes as 0 and reconstructs exactly") {
    val ranges = Similarity.trainSqRanges(corpus, "embedding", Dim)
    assert(ranges(7)._1 == ranges(7)._2)
    val out = Similarity.withSqCodes(corpus, "embedding", Dim, ranges)
      .select(col("_c7"), col("_r7")).distinct().collect()
    assert(out.length == 1)
    assert(out(0).getInt(0) == 0)
    assert(math.abs(out(0).getDouble(1) - 0.25f.toDouble) < 1e-9)
  }

  test("codes stay in the int8 range [0, 255]") {
    val ranges = Similarity.trainSqRanges(corpus, "embedding", Dim)
    val out = Similarity.withSqCodes(corpus, "embedding", Dim, ranges)
    val bad = (0 until Dim).map(i => s"_c$i < 0 OR _c$i > 255").mkString(" OR ")
    assert(out.filter(expr(bad)).count() == 0)
  }

  test("8-bit ADC recall@5 vs exact L2 is near-perfect") {
    val q = corpus.filter($"vec_id" < 8)
    val ranges = Similarity.trainSqRanges(corpus, "embedding", Dim)
    val sq = Similarity.sqAdcTopK(corpus, q, "vec_id", "embedding", Dim, ranges, 5)
      .select("query_id", "nn_id").as[(Long, Long)].collect().groupBy(_._1)
    // exact L2 ground truth from first principles on the driver (64×8 fixture)
    val vecs = corpus.as[(Long, Array[Float])].collect().toMap
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val recalls = (0L until 8L).map { qid =>
      val truth = vecs.keys.filter(_ != qid).toSeq
        .sortBy(c => (d2(vecs(qid), vecs(c)), c)).take(5).toSet
      val got = sq(qid).map(_._2).toSet
      truth.intersect(got).size / 5.0
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.95, s"mean recall@5 $meanRecall below 0.95: $recalls")
  }
}
