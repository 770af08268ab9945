package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted model artifacts: artifact-fed scoring must be
  * bit-identical to recompute, the incremental append must equal
  * one-shot indexing, and a retried tf delta append must fold away.
  */
class ArtifactsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox"),
    (3L, "lorem ipsum dolor sit amet the"),
    (4L, "a completely different document about spark engines"),
    (5L, "the lazy dog sleeps"),
    (6L, "spark engines process the corpus")).toDF("doc_id", "text")

  private def probes = Seq(
    (100L, "quick fox"), (101L, "spark corpus engines")).toDF("doc_id", "text")

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("BM25 from saved+delta artifact equals recompute over the full corpus") {
    val path = tmp("bm25_art")
    Artifacts.saveBm25Index(corpus.filter($"doc_id" <= 4), "doc_id", "text", path)
    Artifacts.appendBm25Delta(corpus.filter($"doc_id" > 4), "doc_id", "text", path)
    val fromIdx = Artifacts.bm25TopKFromIndex(spark, path, probes, "doc_id", "text", k = 3)
      .orderBy("probe_id", "rk").collect().map(_.toSeq)
    val recomputed = Retrieval.bm25TopK(corpus, "doc_id", "text", probes, "doc_id", "text", k = 3)
      .orderBy("probe_id", "rk").collect().map(_.toSeq)
    assert(fromIdx.toSeq === recomputed.toSeq)
    assert(fromIdx.nonEmpty)
  }

  test("a retried (duplicate) tf delta append folds away via the max merge") {
    val path = tmp("bm25_retry")
    Artifacts.saveBm25Index(corpus.filter($"doc_id" <= 4), "doc_id", "text", path)
    Artifacts.appendBm25Delta(corpus.filter($"doc_id" > 4), "doc_id", "text", path)
    Artifacts.appendBm25Delta(corpus.filter($"doc_id" > 4), "doc_id", "text", path) // retry
    val fromIdx = Artifacts.bm25TopKFromIndex(spark, path, probes, "doc_id", "text", k = 3)
      .orderBy("probe_id", "rk").collect().map(_.toSeq)
    val recomputed = Retrieval.bm25TopK(corpus, "doc_id", "text", probes, "doc_id", "text", k = 3)
      .orderBy("probe_id", "rk").collect().map(_.toSeq)
    assert(fromIdx.toSeq === recomputed.toSeq)
  }

  test("LM reference from saved+delta counts equals referenceRel over the full corpus") {
    val path = tmp("lm_art")
    Artifacts.saveLmCounts(corpus.filter($"doc_id" % 2 === 0), "text", path)
    Artifacts.appendLmCounts(corpus.filter($"doc_id" % 2 === 1), "text", path)
    val fromArt = Artifacts.loadLmRel(spark, path)
      .orderBy("_word").as[(String, Long)].collect()
    val recomputed = Curation.referenceRel(corpus, "text")
      .orderBy("_word").as[(String, Long)].collect()
    assert(fromArt.toSeq === recomputed.toSeq)
    assert(fromArt.nonEmpty)
  }

  test("artifact-fed document scoring is bit-identical to unigramQuality") {
    val path = tmp("lm_score")
    Artifacts.saveLmCounts(corpus, "text", path)
    val viaArtifact = Curation
      .scoreWithReference(corpus, "doc_id", "text", Artifacts.loadLmRel(spark, path))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    val direct = Curation.unigramQuality(corpus, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(viaArtifact.toSeq === direct.toSeq)
  }

  test("centroids from saved+delta counts equal classCentroids over the full corpus") {
    val labeled = corpus.withColumn("cls",
      when($"doc_id" <= 3, "news").otherwise("tech"))
    val path = tmp("cen_art")
    Artifacts.saveCentroidCounts(labeled.filter($"doc_id" % 2 === 0), "cls", "text", path)
    Artifacts.appendCentroidCounts(labeled.filter($"doc_id" % 2 === 1), "cls", "text", path)
    val fromArt = Artifacts.loadCentroids(spark, path)
      .orderBy("_cls", "_word").as[(String, String, Long)].collect()
    val recomputed = Classify.classCentroids(labeled, "cls", "text")
      .orderBy("_cls", "_word").as[(String, String, Long)].collect()
    assert(fromArt.toSeq === recomputed.toSeq)
    assert(fromArt.nonEmpty)
    // and the classification fed from the artifact matches end-to-end
    val viaArt = Classify.centroidClassify(corpus, "doc_id", "text",
        Artifacts.loadCentroids(spark, path))
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    val direct = Classify.centroidClassify(corpus, "doc_id", "text",
        Classify.classCentroids(labeled, "cls", "text"))
      .orderBy("doc_id").as[(Long, String, Long)].collect()
    assert(viaArt.toSeq === direct.toSeq)
  }

  test("chunk owners from saved+delta (and a retried delta) equal one-shot owners") {
    val path = tmp("owners_art")
    Artifacts.saveChunkOwners(corpus.filter($"doc_id" <= 4), "doc_id", "text", 2, path)
    Artifacts.appendChunkOwnersDelta(corpus.filter($"doc_id" > 4), "doc_id", "text", 2, path)
    Artifacts.appendChunkOwnersDelta(corpus.filter($"doc_id" > 4), "doc_id", "text", 2, path) // retry
    val merged = Artifacts.loadChunkOwners(spark, path)
      .orderBy("_chunk").as[(String, Long, Long)].collect()
    val oneShot = Rewrite.chunkOwners(corpus, "doc_id", "text", 2)
      .orderBy("_chunk").as[(String, Long, Long)].collect()
    assert(merged.toSeq === oneShot.toSeq)
    // artifact-fed delta scrub == full recompute restricted to the delta
    val delta = corpus.filter($"doc_id" > 4)
    val viaArt = Rewrite.scrubWithOwners(delta, "doc_id", "text", 2,
        Artifacts.loadChunkOwners(spark, path))
      .orderBy("doc_id").collect().map(_.toSeq)
    val full = Rewrite.scrubRepeatedSpans(corpus, "doc_id", "text", 2)
      .filter($"doc_id" > 4).orderBy("doc_id").collect().map(_.toSeq)
    assert(viaArt.toSeq === full.toSeq)
  }
}
