package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Event-log analytics: ordered conversion funnels and cohort
  * retention — the two aggregation shapes every product-events pipeline
  * ends up needing (the reference's webhook log is exactly such a
  * stream; `app.py:95-117` reacts to single events, these operators are
  * the corpus-level rollups of the same log).
  *
  * The funnel is SINGLE-PASS: the event log is filtered to funnel
  * stages, shuffled ONCE on `user_id`, and each user's (small) stage
  * history is folded in timestamp order with O(stages) state — the
  * batch twin of the streaming funnel's FunnelProgress, and the shape
  * that survives a 10-stage funnel at 100 TB (the previous
  * join-per-stage formulation re-shuffled the filtered log k times;
  * PushdownSpec now asserts the one-exchange plan). All arithmetic is
  * on epoch integers — bit-exact on any engine, no timestamp
  * formatting or timezone drift in the oracle compare.
  */
object Funnel {
  /** Ordered funnel: per user, the FIRST occurrence of stage k strictly
    * after the user's stage-(k-1) time; users enter at the first stage
    * (no first-stage event → not in the output). Output:
    * `user_id, t1..tN (epoch micros, null once the funnel broke),
    * stage_reached`.
    *
    * Shape: map events to (stage index, epoch micros), drop non-stage
    * noise BEFORE the shuffle, then ONE exchange on `user_id`, a
    * within-partition sort on (user, ts, stage), and a streaming
    * per-user fold with O(stages) state. No per-user event list is
    * ever materialized — a bot user with millions of stage events
    * flows through the iterator row by row instead of becoming one
    * giant `collect_list` row in a single task (the previous
    * formulation's only unbounded state; a count-cap per (user, stage)
    * was considered and rejected — spam of EARLY stage-k events can
    * push the true conversion event arbitrarily deep in per-stage
    * order, so any cap is silently wrong). Within-tie event order
    * cannot matter: slot k fills only when the event's time is
    * STRICTLY greater than slot k-1, so an event tied with the
    * previous stage's time is rejected whichever side of the tie the
    * sort puts it on (FunnelProps exercises duplicate timestamps and a
    * hot user). The fold is plain JVM code over already-projected
    * integers; filter, projection, shuffle and sort stay codegen'd.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, "funnel stages must be distinct")
    val n = stages.size
    val toIdx = stages.zipWithIndex.tail
      .foldLeft(when(col("_t") === stages.head, 0)) { case (acc, (s, i)) =>
        acc.when(col("_t") === s, i)
      }
    val base = events
      .select(col(userCol).as("user_id"), col(typeCol).as("_t"),
        unix_micros(col(tsCol)).as("_ts"))
      .withColumn("_s", toIdx)
      .filter(col("_s").isNotNull && col("_ts").isNotNull)
      .select("user_id", "_ts", "_s")
    val sorted = base
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("_ts"), col("_s"))
    val outSchema = StructType(
      StructField("user_id", base.schema("user_id").dataType, nullable = true) +:
        (1 to n).map(i => StructField(s"t$i", LongType, nullable = true)) :+
        StructField("stage_reached", IntegerType, nullable = false))
    sorted.mapPartitions { it =>
      new Iterator[Row] {
        private val rows = it.buffered
        private var nextRow: Row = _
        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && rows.hasNext) {
            val user = rows.head.get(0)
            val acc = new Array[java.lang.Long](n)
            // consume this user's whole sorted run with O(n) state
            while (rows.hasNext && rows.head.get(0) == user) {
              val e = rows.next()
              val ts = e.getLong(1)
              val s = e.getInt(2)
              if (acc(s) == null &&
                (s == 0 || (acc(s - 1) != null && ts > acc(s - 1)))) {
                acc(s) = ts
              }
            }
            if (acc(0) != null) {
              var reached = 0
              var i = 0
              while (i < n && acc(i) != null) { reached += 1; i += 1 }
              nextRow = Row.fromSeq(user +: acc.toSeq :+ reached)
            } // no entry-stage event → user not in the output; keep scanning
          }
        }
        advance()
        override def hasNext: Boolean = nextRow != null
        override def next(): Row = { val r = nextRow; advance(); r }
      }
    }(Encoders.row(outSchema))
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
