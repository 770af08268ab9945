package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-log analytics: ordered conversion funnels and cohort
  * retention — the two aggregation shapes every product-events pipeline
  * ends up needing (the reference's webhook log is exactly such a
  * stream; `app.py:95-117` reacts to single events, these operators are
  * the corpus-level rollups of the same log).
  *
  * Both are built from keyed aggregates and co-partitioned joins: after
  * the first exchange on `user_id`, every later stage join and rollup
  * reuses that partitioning, so the funnel length adds map-side work
  * but no new full shuffles of the event log. All arithmetic is on
  * epoch integers — bit-exact on any engine, no timestamp formatting
  * or timezone drift in the oracle compare.
  */
object Funnel {
  /** Ordered funnel: per user, the FIRST occurrence of stage k strictly
    * after the user's stage-(k-1) time; users enter at the first stage
    * (no first-stage event → not in the output). Output:
    * `user_id, t1..tN (epoch micros, null once the funnel broke),
    * stage_reached`.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val base = events.select(col(userCol).as("user_id"), col(typeCol).as("_t"),
      unix_micros(col(tsCol)).as("_ts"))
    val entry = base.filter(col("_t") === stages.head)
      .groupBy("user_id").agg(min("_ts").as("t1"))
    val full = stages.tail.zipWithIndex.foldLeft(entry) { case (acc, (stage, i)) =>
      val prev = s"t${i + 1}"
      val cur = s"t${i + 2}"
      val nxt = base.filter(col("_t") === stage)
        .join(acc.select("user_id", prev), Seq("user_id"))
        .filter(col("_ts") > col(prev))
        .groupBy("user_id").agg(min("_ts").as(cur))
      acc.join(nxt, Seq("user_id"), "left")
    }
    val reached = stages.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    full.withColumn("stage_reached", reached)
  }

  /** DuckDB twin generated from the same stage list. */
  def funnelSql(stages: Seq[String]): String = {
    val ctes = stages.zipWithIndex.map { case (stage, i) =>
      if (i == 0)
        s"s1 AS (SELECT user_id, min(ts_us) AS t1 FROM ev WHERE t = '$stage' GROUP BY user_id)"
      else
        s"s${i + 1} AS (SELECT ev.user_id, min(ts_us) AS t${i + 1} FROM ev JOIN s$i USING (user_id) " +
          s"WHERE t = '$stage' AND ts_us > t$i GROUP BY ev.user_id)"
    }.mkString(",\n")
    val joins = (2 to stages.size).map(i => s"LEFT JOIN s$i USING (user_id)").mkString(" ")
    val reached = (2 to stages.size)
      .map(i => s"CASE WHEN t$i IS NULL THEN 0 ELSE 1 END").mkString(" + ")
    val reachedExpr = if (stages.size == 1) "1" else s"1 + $reached"
    val ts = (1 to stages.size).map(i => s"t$i").mkString(", ")
    s"""WITH ev AS (SELECT user_id, event_type AS t, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
       |$ctes
       |SELECT s1.user_id, $ts, $reachedExpr AS stage_reached
       |FROM s1 $joins""".stripMargin
  }

  /** Cohort retention: users bucketed by the EPOCH WEEK (`epoch_day div
    * 7` — a fixed 7-day grid, engine-neutral) of their first event;
    * output counts active users per (cohort_week, week_offset). The
    * activity set is pre-deduped to (user, week), so the final rollup
    * is a plain count — no distinct aggregate at the wide grain.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = events.select(col(userCol).as("user_id"),
      unix_date(col(tsCol).cast("date")).as("_day"))
    val firstWk = days.groupBy("user_id").agg(expr("min(_day) div 7").as("cohort_week"))
    days.select(col("user_id"), expr("_day div 7").as("_wk")).distinct()
      .join(firstWk, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("_wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  def cohortRetentionSql: String =
    """WITH d AS (SELECT user_id, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day FROM events),
      |f AS (SELECT user_id, min(day) // 7 AS cohort_week FROM d GROUP BY user_id),
      |a AS (SELECT DISTINCT user_id, day // 7 AS wk FROM d)
      |SELECT cohort_week, wk - cohort_week AS week_offset, count(*) AS n_users
      |FROM a JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin
}
