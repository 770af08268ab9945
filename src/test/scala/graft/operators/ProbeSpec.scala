package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProbeSpec extends SparkSpec {
  import spark.implicits._

  test("integer div truncates toward zero (the cross-engine contract the GD relies on)") {
    val r = spark.range(1).select(
      expr("-7L div 2L"), expr("7L div 2L"), expr("-7L div -2L")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((-3L, 3L, 3L)))
  }

  private def emb(rows: Seq[(Long, Seq[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  test("a separable toy problem trains to a perfect binned AUC") {
    // ±0.1 dense vectors: inside the GD stability region for the
    // production LrDiv (a single huge feature would oscillate — the lr
    // is tuned for realistic dense-embedding row norms)
    val data = emb(Seq.tabulate(8) { i =>
      val v = if (i % 2 == 0) 0.1f else -0.1f
      (i.toLong, Seq.fill(Probe.Dim)(v), i % 2)
    })
    val feat = Probe.features(data, "vec_id", "embedding", "label", 0).localCheckpoint(true)
    val auc = Probe.binnedAuc(Probe.score(feat, Probe.train(feat))).head()
    assert(auc.getLong(0) === Probe.Scale)
    assert(auc.getLong(1) === 4L && auc.getLong(2) === 4L)
  }

  test("binned AUC scores known histograms exactly (cross-bin 1.0, same-bin ties 0.5)") {
    // scores far apart -> distinct bins -> exact Mann-Whitney
    val sep = Seq((1L, 1L, 100000L), (2L, 1L, 90000L), (3L, 0L, -100000L), (4L, 0L, -90000L))
      .toDF("vec_id", "y", "score")
    assert(Probe.binnedAuc(sep).head().getLong(0) === Probe.Scale)
    // all four scores in ONE bin -> every pair is a tie -> 0.5
    val tied = Seq((1L, 1L, 10L), (2L, 1L, 20L), (3L, 0L, 30L), (4L, 0L, 40L))
      .toDF("vec_id", "y", "score")
    assert(Probe.binnedAuc(tied).head().getLong(0) === Probe.Scale / 2)
  }

  test("training is deterministic and yields the fixed-size weight table") {
    val d = "/root/testdata/sf0.001"
    val feat = graft.queries.PipelineQueries.linearProbe(spark, d)
    val w1 = feat.orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    val w2 = graft.queries.PipelineQueries.linearProbe(spark, d)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(w1.length === Probe.Dim + 1)
    assert(w1 === w2)
    assert(w1.exists(_._2 != 0L), "training must move at least one weight")
  }

  test("warm-start training through the weight artifact is bit-identical to one run") {
    val data = emb(Seq.tabulate(10) { i =>
      (i.toLong, Seq.tabulate(Probe.Dim)(j => ((i * 7 + j) % 13 - 6) / 50f), i % 3)
    })
    val feat = Probe.features(data, "vec_id", "embedding", "label", 0).localCheckpoint(true)
    val oneRun = Probe.train(feat, 6).orderBy("j").collect().toSeq
    val path = java.nio.file.Files.createTempDirectory("probe_rt").toFile.getAbsolutePath
    graft.operators.Artifacts.saveProbeWeights(Probe.train(feat, 4), path)
    val resumed = Probe.train(feat, 2,
      init = Some(graft.operators.Artifacts.loadProbeWeights(spark, path)))
      .orderBy("j").collect().toSeq
    assert(resumed === oneRun)
  }

  test("the probe beats random on the fixture (q_probe_auc)") {
    val auc = graft.queries.PipelineQueries.probeAuc(spark, "/root/testdata/sf0.001").head()
    assert(auc.getLong(0) > 600000L,
      s"AUC ${auc.getLong(0)} ppm should clearly beat the 500000 ppm random floor")
    assert(auc.getLong(1) + auc.getLong(2) === 500L)
  }
}
