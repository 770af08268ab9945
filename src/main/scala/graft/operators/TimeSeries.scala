package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series scoring over a dense (gap-filled) series — the batch
  * anomaly pass a monitoring pipeline runs after the sparse→dense
  * resample (q_ts_fill): a quiet hour must be a 0 ROW to be scorable,
  * which is why the fill and the score are separate operators.
  */
object TimeSeries {
  /** Rolling z-score per key: each point scored against the mean/stddev
    * of the `lookback` points strictly BEFORE it (the trailing baseline
    * — excluding the current point so a spike cannot mask itself).
    * Emits (key, ord, value, z, is_anomaly); warm-up rows with fewer
    * than `minPoints` baseline points and zero-variance baselines are
    * dropped (z is undefined there).
    *
    * Engine-portable by construction: the baseline moments are INTEGER
    * window sums (s, q = Σx, Σx²; c = row count) over a frame fixed by
    * the key ordering, and z is assembled from them with one fixed
    * chain of correctly-rounded double ops:
    * z = (x·c − s) / (c · √((c·q − s²) / (c·(c−1)))). No stddev_samp
    * (implementations differ: Welford vs naïve), no reassociated double
    * sums. Windows are partitioned per key — never global; state is the
    * `lookback`-row frame.
    */
  def rollingZScore(series: DataFrame, keyCol: String, ordCol: String,
                    valCol: String, lookback: Int, minPoints: Int,
                    zThreshold: Double): DataFrame = {
    require(lookback >= minPoints && minPoints >= 2,
      s"need lookback >= minPoints >= 2, got $lookback/$minPoints")
    val w = Window.partitionBy(keyCol).orderBy(ordCol).rowsBetween(-lookback, -1)
    val x = col(valCol).cast("long")
    series
      .withColumn("_s", sum(x).over(w))
      .withColumn("_q", sum(x * x).over(w))
      .withColumn("_c", count(x).over(w))
      .filter(col("_c") >= minPoints)
      .withColumn("_a", col("_c") * col("_q") - col("_s") * col("_s"))
      .filter(col("_a") > 0)
      .withColumn("z",
        (x * col("_c") - col("_s")).cast("double") /
          (col("_c").cast("double") *
            sqrt(col("_a").cast("double") / (col("_c") * (col("_c") - 1)).cast("double"))))
      .withColumn("is_anomaly", (abs(col("z")) >= zThreshold).cast("int"))
      .select(col(keyCol), col(ordCol), col(valCol), col("z"), col("is_anomaly"))
  }
}
