package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-analytics operators (funnel conversion, cohort retention,
 * time-series gap fill) — the product-analytics surface a training-data /
 * telemetry warehouse serves alongside the corpus pipeline. All outputs are
 * engine-exact (timestamp ordering + integer arithmetic only), so every
 * operator is DuckDB-oracle-checkable.
 */
object Analytics {

  /**
   * Ordered three-stage funnel: how many users performed `s1`, then `s2`
   * strictly after their first `s1`, then `s3` strictly after that first
   * qualifying `s2`.
   *
   * Single-scan design: one hash exchange on `userCol`, then two chained
   * running-min window computations over the same (user, ts) sort — Spark
   * plans ONE Exchange + ONE Sort feeding both Window ops, and the final
   * per-user aggregate reuses the window's hash partitioning (no second
   * shuffle). The naive formulation (one aggregate + one join-back per
   * stage) costs 3 shuffles and re-reads the events table three times; this
   * shape reads it once, which is the difference at 100 TB of events.
   *
   * `sig_t` at a row = earliest `s1` ts seen so far for this user (RANGE
   * frame, ties included); a stage-2 event qualifies only when `sig_t < ts`
   * (strictly after). Same for stage 3 over the first qualifying stage-2 ts.
   */
  def funnel(events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      s1: String, s2: String, s3: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    val ts = col(tsCol); val tpe = col(typeCol)
    events
      .withColumn("sig_t", min(when(tpe === s1, ts)).over(w))
      .withColumn("mid_t", min(when(tpe === s2 && col("sig_t") < ts, ts)).over(w))
      .groupBy(col(userCol))
      .agg(
        min(when(tpe === s1, ts)).as("t1"),
        min(when(tpe === s2 && col("sig_t") < ts, ts)).as("t2"),
        min(when(tpe === s3 && col("mid_t") < ts, ts)).as("t3"))
      .agg(
        count(col("t1")).as("n_stage1"),
        count(col("t2")).as("n_stage2"),
        count(col("t3")).as("n_stage3"))
  }

  /**
   * Weekly cohort retention: users bucketed by the ISO week of their first
   * event; for every (cohort week, whole weeks since cohort) cell, the
   * number of distinct cohort members active in that week.
   *
   * Scale shape: per-user first-event week is a hash aggregate on the user
   * key; activity is `DISTINCT (user, week)` (collapses each user's events
   * within a week BEFORE the join, so the join input is bounded by
   * users x weeks, not by raw events); both sides are partitioned on the
   * user key so the join is co-partitioned. Week offset is integer day
   * arithmetic — no float, engine-exact.
   */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstWeek = events.groupBy(userCol)
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
    val active = events
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("wk"))
      .distinct()
    active.join(firstWeek, userCol)
      .withColumn("week_offset", (datediff(col("wk"), col("cohort_week")) / 7).cast("int"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * Daily gap fill + forward fill: one row per (user, calendar day) spanning
   * each user's own [first, last] activity range; days with no events carry
   * the most recent prior day's last observed `valueCol` forward
   * (`last(..., ignoreNulls)` over the dense spine).
   *
   * Scale shape: the spine is generated per user with `sequence()` +
   * `explode` — sized by each user's own active range, never the global
   * min/max (a user active for a week contributes 7 rows even if the table
   * spans years). One exchange for the per-user range aggregate, one
   * outer join back on (user, day) — both hash-partitioned on the user
   * key — and one window pass for the fill. Day-level values are made
   * deterministic before the fill by taking the LAST event per (user, day)
   * in (ts, id) order via max_by on an engine-exact struct ordering.
   */
  def gapFillForwardFill(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val day = to_date(col(tsCol))
    // last observed value per (user, day): order by (ts, id) — engine-exact
    val perDay = events
      .groupBy(col(userCol), day.as("day"))
      .agg(max(struct(col(tsCol), col(idCol), col(valueCol))).getField(valueCol)
        .as("day_value"))
    val spine = events
      .groupBy(userCol)
      .agg(min(day).as("d0"), max(day).as("d1"))
      .select(col(userCol),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val filled = spine.join(perDay, Seq(userCol, "day"), "left")
    val w = Window.partitionBy(userCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled.withColumn("filled_value", last(col("day_value"), ignoreNulls = true).over(w))
      .select(col(userCol), col("day"), col("day_value"), col("filled_value"))
  }
}
