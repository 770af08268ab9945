package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deliberate skew mitigation for hot join/aggregation keys.
  *
  * AQE's skew-join split (on in [[graft.GraftSession]]) repairs
  * sort-merge joins at runtime; these operators are for the cases AQE
  * can't fix: a broadcast-ineligible dimension joined on a hot key, or
  * a hash aggregation where one key dominates (the classic hot-user /
  * stop-shingle shapes).
  *
  *   - saltedJoin: the big side's shuffle key is extended with a
  *     deterministic row-hash salt in [0, salt); the small side is
  *     exploded over every salt value, so one hot key spreads across
  *     `salt` tasks at the cost of `salt`× the small side (still tiny).
  *   - saltedAgg: two-phase decomposable aggregation — partial
  *     aggregate on (key, salt), final on key. Same trick map-side
  *     combine does, but effective even when the upstream partitioning
  *     already clusters the hot key.
  */
object Skew {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    // Hash of the full row: deterministic (safe under task retry),
    // spreads a hot key's rows across salts unless rows are identical.
    val bigS = big.withColumn("_salt", pmod(hash(big.columns.toIndexedSeq.map(col): _*), lit(salt)))
    val smallS = small.withColumn("_salt", explode(array((0 until salt).map(lit): _*)))
    bigS.join(smallS, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Skew-safe count+sum per key (decomposable aggregates only). */
  def saltedAgg(df: DataFrame, keys: Seq[String], valueCol: String, salt: Int): DataFrame = {
    require(salt > 0)
    df.withColumn("_salt", pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(salt)))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum_value"))
  }
}
