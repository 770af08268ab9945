package graft.operators

import graft.functions.Hashing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - brute force: broadcast the (small) query set against the corpus,
  *     exact cosine, window top-k. The corpus side streams — no shuffle
  *     of the big table at all, so this scales to any corpus size as long
  *     as the query set broadcasts (the 100 TB-corpus / 1k-query shape).
  *   - sign-LSH: bucket both sides by random-hyperplane sign bits and
  *     only score within a bucket; the bucket join keys the shuffle, so
  *     cost drops from |Q|×|C| to sum of bucket products. Recall is
  *     tunable via the plane count (here 8 planes → 256 buckets).
  *
  * Embeddings are cast to array<double> once; cosine is a left-fold dot
  * product (bit-deterministic, see Hashing.dotFold).
  */
object Similarity {
  import Hashing._

  def withDoubleVec(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn("v", col(vecCol).cast("array<double>"))

  /** Exact top-k neighbors for each query row (excluding self-matches). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, dim: Int, k: Int): DataFrame = {
    val c = withDoubleVec(corpus, vecCol).select(col(idCol).as("nn_id"), col("v").as("cv"))
    val q = withDoubleVec(queries, vecCol).select(col(idCol).as("query_id"), col("v").as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv"), dim))
    scored.withColumn("rk",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("nn_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("nn_id"), col("cosine"), col("rk"))
  }

  /** Sign-LSH bucketed top-k: only candidates in the query's bucket are
    * scored. Returns the same shape as bruteForceTopK (possibly fewer
    * than k rows per query when a bucket is small).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, k: Int, planes: Int = 8): DataFrame = {
    val c = withDoubleVec(corpus, vecCol)
      .select(col(idCol).as("nn_id"), col("v").as("cv"),
        signBucket(col("v"), dim, planes).as("bucket"))
    val q = withDoubleVec(queries, vecCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"),
        signBucket(col("v"), dim, planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv"), dim))
    scored.withColumn("rk",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("nn_id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("nn_id"), col("cosine"), col("rk"))
  }

  /** Embedding near-duplicate pairs within a blocking key (e.g. label):
    * all same-block pairs (a < b) with cosine >= threshold. The block key
    * bounds the quadratic blow-up; at scale the block is an LSH bucket.
    */
  def blockedNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                          blockCol: String, dim: Int, threshold: Double): DataFrame = {
    val e = withDoubleVec(df, vecCol)
      .select(col(idCol).as("id"), col(blockCol).as("blk"), col("v"))
    e.as("a").join(e.as("b"), col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("cosine", cosine(col("a.v"), col("b.v"), dim))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
