package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
      s1: String, s2: String, s3: String): DataFrame =
    funnelBy(events, Seq(col(userCol)), tsCol, typeCol, s1, s2, s3)

  /** [[funnel]] at SESSION granularity: the ordered-step question asked per
    * (user, day) instead of per user lifetime — "how many daily sessions
    * signed up, then clicked, then purchased WITHIN the session". Same
    * single-exchange shape; the partition key just gains the day. */
  def sessionFunnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, s1: String, s2: String, s3: String): DataFrame =
    funnelBy(events, Seq(col(userCol), to_date(col(tsCol))), tsCol, typeCol,
      s1, s2, s3)

  /**
   * TIMED funnel — [[funnel]] with a per-step deadline: each stage must
   * land within `maxGapSeconds` of the PREVIOUS stage's first completion
   * ("clicked within a day of signing up, purchased within a day of
   * that"), the form product funnels actually ship (an unbounded funnel
   * counts a purchase two years later as conversion). Same
   * chained-running-min construction as [[funnel]] — the deadline is an
   * extra upper bound on each window's CASE, so the single-exchange
   * shape (two windows + the per-key aggregate on one user partitioning)
   * is unchanged.
   */
  def timedFunnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, s1: String, s2: String, s3: String,
      maxGapSeconds: Long): DataFrame = {
    require(maxGapSeconds >= 1, "maxGapSeconds must be positive")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    val ts = col(tsCol); val tpe = col(typeCol)
    val gap = expr(s"INTERVAL $maxGapSeconds SECONDS")
    val inS2 = tpe === s2 && col("sig_t") < ts && ts <= col("sig_t") + gap
    events
      .withColumn("sig_t", min(when(tpe === s1, ts)).over(w))
      .withColumn("mid_t", min(when(inS2, ts)).over(w))
      .groupBy(col(userCol))
      .agg(
        min(when(tpe === s1, ts)).as("t1"),
        min(when(inS2, ts)).as("t2"),
        min(when(tpe === s3 && col("mid_t") < ts &&
          ts <= col("mid_t") + gap, ts)).as("t3"))
      .agg(
        count(col("t1")).as("n_stage1"),
        count(col("t2")).as("n_stage2"),
        count(col("t3")).as("n_stage3"))
  }

  /**
   * LEVEL-SHIFT scan (single change-point detection, AMOC): over the
   * daily event-count series, find the split day maximizing the absolute
   * difference between the mean BEFORE (inclusive) and AFTER, with both
   * means in exact events-per-day ppm (`cum·1e6 DIV k`) — "when did the
   * traffic regime change", answered deterministically (max shift, ties →
   * earliest day) instead of by an RNG-seeded changepoint library. The
   * prefix-sum formulation makes every candidate split O(1): no
   * per-split re-aggregation, no quadratic scan.
   *
   * Scale shape: one map-side-combined day collapse, then cumulative
   * windows over the |days| frame only (spine-bounded — the accepted
   * x169 shape), a 1-row totals broadcast, and a 1-row TakeOrdered pick.
   */
  def levelShiftScan(events: DataFrame, tsCol: String): DataFrame = {
    val days = events.filter(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day")).agg(count(lit(1)).as("__n"))
    val byDay = BoundedGlobalWindow.orderBy("day")
    val cum = days
      .withColumn("__ck", sum(col("__n")).over(byDay))
      .withColumn("__rk", row_number().over(byDay).cast("long"))
    // `__tot`/`__days`, not `__N`: Spark resolves identifiers
    // case-insensitively, so `__N` would clash with the day frame's `__n`
    val tot = days.agg(sum(col("__n")).as("__tot"), count(lit(1)).as("__days"))
    cum.crossJoin(broadcast(tot))
      .filter(col("__rk") < col("__days")) // a split needs a non-empty "after"
      .select(col("day").as("split_day"),
        expr("__ck * 1000000 DIV __rk").as("mean_before_ppm"),
        expr("(__tot - __ck) * 1000000 DIV (__days - __rk)").as("mean_after_ppm"))
      .withColumn("shift_ppm",
        abs(col("mean_after_ppm") - col("mean_before_ppm")))
      .orderBy(col("shift_ppm").desc, col("split_day"))
      .limit(1)
  }

  /**
   * NEAREST-EVENT match — the BIDIRECTIONAL as-of join: each `probeType`
   * event matched to the nearest `matchType` event of the SAME user in
   * EITHER time direction within `maxGapSeconds` (ties → the earlier
   * match) — "which purchase does this error sit closest to", where a
   * one-sided as-of join silently picks the wrong neighbor half the
   * time. Unmatched probes survive with NULL match columns (visible, not
   * dropped).
   *
   * Scale shape: NO join at all — one exchange on the user key feeds
   * carried-forward/backward IGNORE-NULLS window navigation (the b54
   * surface) over the interleaved event stream; both directions and the
   * final pick share that single partitioning. Ordering ties break on
   * the event id, so the chosen neighbor is engine-exact.
   */
  def nearestEventMatch(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, probeType: String, matchType: String,
      maxGapSeconds: Long): DataFrame = {
    require(maxGapSeconds >= 0, "maxGapSeconds must be non-negative")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val prevW = w.rowsBetween(Window.unboundedPreceding, -1)
    val nextW = w.rowsBetween(1, Window.unboundedFollowing)
    val mTs = when(col(typeCol) === matchType, col(tsCol))
    val mId = when(col(typeCol) === matchType, col(idCol))
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__pts", last(mTs, ignoreNulls = true).over(prevW))
      .withColumn("__pid", last(mId, ignoreNulls = true).over(prevW))
      .withColumn("__nts", first(mTs, ignoreNulls = true).over(nextW))
      .withColumn("__nid", first(mId, ignoreNulls = true).over(nextW))
      .filter(col(typeCol) === probeType)
      .withColumn("__pgap", unix_timestamp(col(tsCol)) - unix_timestamp(col("__pts")))
      .withColumn("__ngap", unix_timestamp(col("__nts")) - unix_timestamp(col(tsCol)))
      .withColumn("__cp", col("__pgap").isNotNull && col("__pgap") <= maxGapSeconds)
      .withColumn("__cn", col("__ngap").isNotNull && col("__ngap") <= maxGapSeconds)
      .select(col(idCol).as("event_id"), col(userCol),
        when(col("__cp") && (!col("__cn") || col("__pgap") <= col("__ngap")),
            col("__pid"))
          .when(col("__cn"), col("__nid")).as("matched_id"),
        when(col("__cp") && (!col("__cn") || col("__pgap") <= col("__ngap")),
            lit("before"))
          .when(col("__cn"), lit("after")).as("direction"),
        when(col("__cp") && (!col("__cn") || col("__pgap") <= col("__ngap")),
            col("__pgap"))
          .when(col("__cn"), col("__ngap")).as("gap_s"))
  }

  /** Shared ordered-funnel core over arbitrary partition keys: the windows
    * and the per-key aggregate use the SAME partitioning, so Spark plans
    * one exchange for all three passes. */
  private def funnelBy(events: DataFrame, keys: Seq[Column], tsCol: String,
      typeCol: String, s1: String, s2: String, s3: String): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(col(tsCol))
    val ts = col(tsCol); val tpe = col(typeCol)
    events
      .withColumn("sig_t", min(when(tpe === s1, ts)).over(w))
      .withColumn("mid_t", min(when(tpe === s2 && col("sig_t") < ts, ts)).over(w))
      .groupBy(keys: _*)
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
    val filled = daySpineJoin(events, userCol, tsCol, idCol, valueCol, "day_value")
    val w = Window.partitionBy(userCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled.withColumn("filled_value", last(col("day_value"), ignoreNulls = true).over(w))
      .select(col(userCol), col("day"), col("day_value"), col("filled_value"))
  }

  /** Shared gap-fill scaffolding: deterministic per-(user, day) collapse
    * (LAST event in (ts, id) order via max-of-struct — engine-exact), the
    * per-user min..max calendar spine, and the (user, day) left join. Both
    * fill variants diverge only in how they fill the NULL days. */
  private def daySpineJoin(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, valueCol: String, outName: String): DataFrame = {
    val day = to_date(col(tsCol))
    val perDay = events
      .groupBy(col(userCol), day.as("day"))
      .agg(max(struct(col(tsCol), col(idCol), col(valueCol))).getField(valueCol)
        .as(outName))
    val spine = events
      .groupBy(userCol)
      .agg(min(day).as("d0"), max(day).as("d1"))
      .select(col(userCol),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    spine.join(perDay, Seq(userCol, "day"), "left")
  }

  /**
   * Gap fill by LINEAR INTERPOLATION between the surrounding observations —
   * the interior-gap complement to [[gapFillForwardFill]] (which carries the
   * last value): a missing day between two observed days gets
   * `(prev·(L−g) + next·g) DIV L` where `g`/`L` are day offsets — the
   * weighted-sum form keeps the numerator NON-NEGATIVE for non-negative
   * values, so Spark's truncating DIV and an oracle's flooring `//` agree
   * (a `prev + (next−prev)·g DIV L` form would diverge between engines on
   * every downward slope). Values must be integral non-negative (cents);
   * the product stages through DECIMAL(38,0) so value·span cannot overflow
   * BIGINT at scale. Day values are made deterministic by taking the LAST
   * event per (user, day) in (ts, id) order. Spine endpoints are observed
   * days, so every spine day has both neighbors — no extrapolation branch.
   *
   * Scale shape: identical to forward fill — one hash exchange on the user
   * key shared by the per-day collapse, the spine join, and BOTH window
   * passes (asc + desc carries); the desc pass reuses the partitioning.
   */
  def gapFillInterpolate(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, valueCentsCol: String): DataFrame = {
    val filled = daySpineJoin(events, userCol, tsCol, idCol, valueCentsCol, "day_cents")
    val wAsc = Window.partitionBy(userCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(userCol).orderBy(col("day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsDay = when(col("day_cents").isNotNull, col("day"))
    filled
      .withColumn("prev_c", last(col("day_cents"), ignoreNulls = true).over(wAsc))
      .withColumn("prev_day", last(obsDay, ignoreNulls = true).over(wAsc))
      .withColumn("next_c", last(col("day_cents"), ignoreNulls = true).over(wDesc))
      .withColumn("next_day", last(obsDay, ignoreNulls = true).over(wDesc))
      .select(col(userCol), col("day"), col("day_cents"),
        when(col("day_cents").isNotNull, col("day_cents"))
          .otherwise(expr(
            "CAST((CAST(prev_c AS DECIMAL(38,0)) * datediff(next_day, day)" +
              " + CAST(next_c AS DECIMAL(38,0)) * datediff(day, prev_day))" +
              " DIV datediff(next_day, prev_day) AS BIGINT)"))
          .as("interp_cents"))
  }

  /**
   * Gap-based batch sessionization with session-level stats: events within
   * `gapMinutes` of the previous event (per user) share a session; emits
   * one row per session with event count, span in seconds, and whether the
   * session CONVERTED (contains `convType`) — the session-level funnel
   * question ("how many sessions end in a purchase") that event-level
   * counts can't answer.
   *
   * Scale shape: one hash exchange on the user key; the lag, the
   * cumulative session counter, and the final per-session aggregate all
   * run over the same (user, ts) sort — Spark plans one Exchange + one
   * Sort for the two window passes, and the session aggregate reuses the
   * user partitioning. All outputs integer/exact (span in whole seconds
   * via unix timestamps). Complements the streaming sessionizers (x15/x27
   * event-at-a-time state, x56 native session_window) with the batch
   * replay shape used for backfills.
   */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convType: String, gapMinutes: Int = 30): DataFrame = {
    val byTs = Window.partitionBy(userCol).orderBy(tsCol)
    val ts = col(tsCol)
    events
      .withColumn("prev_ts", lag(ts, 1).over(byTs))
      .withColumn("new_sess",
        (col("prev_ts").isNull ||
          unix_timestamp(ts) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L)
          .cast("int"))
      .withColumn("session_id", sum(col("new_sess")).over(byTs))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(ts)) - unix_timestamp(min(ts))).as("span_secs"),
        max((col(typeCol) === convType).cast("int")).as("converted"))
  }

  /**
   * Trending items: top-`k` event types per tumbling day window, ranked by
   * count (ties broken alphabetically — deterministic).
   *
   * Scale shape: the aggregate collapses raw events to (window × type)
   * BEFORE any window function — the rank runs over a frame bounded by the
   * type cardinality, never the event count; one exchange for the agg, one
   * for the per-window rank. (Ranking raw events directly would sort the
   * corpus inside each day — the anti-pattern.)
   */
  def trendingTopK(events: DataFrame, tsCol: String, typeCol: String,
      k: Int = 3): DataFrame = {
    val counted = events
      .groupBy(window(col(tsCol), "1 day").as("w"), col(typeCol))
      .agg(count(lit(1)).as("n"))
    val rankW = Window.partitionBy("w").orderBy(desc("n"), col(typeCol))
    counted.withColumn("rnk", row_number().over(rankW))
      .filter(col("rnk") <= k)
      .select(col("w.start").as("win_start"), col(typeCol), col("n"), col("rnk"))
  }

  /**
   * Market-basket co-occurrence with INTEGER-EXACT lift: for every pair of
   * event types, the number of users who did both, and
   * `lift ≈ P(a,b) / (P(a)·P(b))` scaled to an integer
   * (`n_both · n_users · scale DIV (n_a · n_b)`) — no float division, so
   * the association ranking is engine- and partitioning-identical.
   *
   * Scale shape: events collapse to DISTINCT (user, type) first, so the
   * per-user self-join emits at most `types²/2` rows PER USER — bounded by
   * the type-dimension cardinality, not the event count. Type totals and
   * the user count are tiny aggregates joined back by broadcast.
   */
  def coOccurrenceLift(events: DataFrame, userCol: String, typeCol: String,
      scale: Int = 1000): DataFrame = {
    // cached: three consumers (user count, type totals, self-join) share it
    // within the returned plan. Lifecycle is caller-managed — the entry goes
    // unreferenced when the returned frame is collected and Spark's
    // ContextCleaner reclaims it; long-lived callers needing deterministic
    // release should `spark.catalog.clearCache()` between operator runs.
    val ut = events.select(col(userCol).as("u"), col(typeCol).as("t")).distinct().cache()
    val nUsers = ut.agg(countDistinct(col("u")).as("n_users"))
    val typeCounts = ut.groupBy("t").agg(count(lit(1)).as("n_t"))
    ut.as("a").join(ut.as("b"),
        col("a.u") === col("b.u") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("t1"), col("b.t").as("t2"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(typeCounts).as("c1"), col("t1") === col("c1.t"))
      .join(broadcast(typeCounts).as("c2"), col("t2") === col("c2.t"))
      .crossJoin(broadcast(nUsers))
      // staged through DECIMAL(38,0): the raw BIGINT product n_both·n_users·scale
      // wraps past 2^63 near 10^8 users — on exactly the strongest pairs
      .select(col("t1"), col("t2"), col("n_both"),
        expr(s"CAST(CAST(n_both AS DECIMAL(38,0)) * n_users * $scale" +
          s" DIV (CAST(c1.n_t AS DECIMAL(38,0)) * c2.n_t) AS BIGINT)")
          .as("lift_scaled"))
  }

  /**
   * RFM segmentation — the classic user-value feature build: per user,
   * Recency (days since last event, anchored to the corpus max — data-
   * relative, so reruns are reproducible), Frequency (event count), and
   * Monetary (decimal-exact value sum); each banded by fixed thresholds
   * and reported as segment counts.
   *
   * Scale shape: one hash aggregate on the user key computes all three
   * features in a single pass; the anchor timestamp is a 1-row broadcast;
   * banding is map-side; the final segment rollup is an aggregate over
   * user-count rows. Decimal summation makes the monetary threshold
   * comparisons engine-exact (float partial-sum order would flip rows at
   * band boundaries).
   */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String,
      rDays: (Int, Int) = (0, 1), fCounts: (Long, Long) = (70L, 60L),
      mTotals: (Double, Double) = (4000.0, 2500.0)): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val anchor = events.agg(max(to_date(col(tsCol))).as("anchor_day"))
    events.groupBy(userCol)
      .agg(
        max(to_date(col(tsCol))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(col(valueCol).cast(DecimalType(18, 2))).cast("double").as("monetary"))
      .crossJoin(broadcast(anchor))
      .select(
        when(datediff(col("anchor_day"), col("last_day")) <= rDays._1, "r_hot")
          .when(datediff(col("anchor_day"), col("last_day")) <= rDays._2, "r_warm")
          .otherwise("r_cold").as("r_band"),
        when(col("freq") >= fCounts._1, "f_high").when(col("freq") >= fCounts._2, "f_mid")
          .otherwise("f_low").as("f_band"),
        when(col("monetary") >= mTotals._1, "m_high").when(col("monetary") >= mTotals._2, "m_mid")
          .otherwise("m_low").as("m_band"))
      .groupBy("r_band", "f_band", "m_band")
      .agg(count(lit(1)).as("n_users"))
  }

  /**
   * LAST-TOUCH attribution: every conversion is credited to the user's
   * most recent preceding marketing touch (conversions with no prior
   * touch land in the 'none' bucket), reported per touch type with
   * conversion count, exact attributed value in cents, and the integer
   * mean touch-to-conversion lag — the marketing-analytics join-free
   * answer to "which channel closes".
   *
   * Scale shape: the carried-forward touch is `last(..., ignoreNulls)`
   * over the (user, time) window — ONE hash exchange, no self-join of
   * conversions against touches (the naive formulation is a per-row
   * range join). The final per-touch aggregate is a 5-row frame.
   */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, valueCol: String, idCol: String,
      touchTypes: Seq[String], convType: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val touch = when(col(typeCol).isInCollection(touchTypes), col(typeCol))
    events
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .withColumn("lag_us", unix_micros(col(tsCol)) -
        last(when(touch.isNotNull, unix_micros(col(tsCol))), ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType)
      .groupBy(coalesce(col("last_touch"), lit("none")).as("touch"))
      .agg(count(lit(1)).as("n_conversions"),
        sum((col(valueCol).cast("decimal(18,2)") * 100).cast("long"))
          .as("attributed_cents"),
        sum(col("lag_us")).as("lag_sum"), count(col("lag_us")).as("lag_n"))
      .select(col("touch"), col("n_conversions"), col("attributed_cents"),
        when(col("lag_n") > 0, expr("lag_sum DIV (1000000 * lag_n)"))
          .as("avg_lag_secs"))
  }

  /**
   * Per-key TIME-WEIGHTED average of a value stream: each reading is
   * weighted by how long it was the current state (microseconds until the
   * key's next event); the last reading of a key has no duration and is
   * excluded. The honest mean for irregularly-sampled state (sensor
   * readings, price ticks, session quality) — the unweighted mean
   * over-counts bursts.
   *
   * Engine-exact: value is staged to integer cents, durations are exact
   * `unix_micros` deltas, the weighted sum rides DECIMAL(38,0) (cents ×
   * micros overflows BIGINT at ~week-long gaps), and the final average is
   * one integral division back to cents. Ties on the timestamp are broken
   * by `idCol` so the lead() neighbor is deterministic cross-engine.
   *
   * Scale shape: ONE hash exchange on the key — the lead() window and the
   * per-key aggregate share the same partitioning (same single-exchange
   * pattern as [[sessionize]]); no join, no second scan.
   */
  def timeWeightedAvg(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("dur_us", unix_micros(lead(col(tsCol), 1).over(w)) -
        unix_micros(col(tsCol)))
      .filter(col("dur_us").isNotNull)
      .withColumn("v_cents",
        (col(valueCol).cast("decimal(18,2)") * 100).cast("decimal(38,0)"))
      .groupBy(userCol)
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_us")).as("active_us"),
        sum(col("v_cents") * col("dur_us")).cast("decimal(38,0)").as("vt_sum"))
      // a key whose retained intervals are ALL zero-duration (every event
      // at one timestamp) has no time-weighted mean — drop it like the
      // single-event case rather than emit a NULL-average row
      .filter(col("active_us") > 0)
      .select(col(userCol), col("n_intervals"), col("active_us"),
        expr("vt_sum DIV active_us").as("twa_cents"))
  }

  /**
   * Quantiles from a fixed-width histogram sketch with a CERTIFIED rank
   * error — the single-pass scale path beside exact percentiles (which
   * sort-shuffle the corpus): one tiny min/max/count aggregate, one
   * map-side-combined bin-count aggregate (the only corpus shuffle,
   * bounded by `nBins` partial states per task), then all quantile
   * arithmetic runs on the ≤`nBins`-row bin table. For each requested
   * percentile the reported value is the upper edge of the first bin
   * whose cumulative count reaches the target rank, so the achieved rank
   * is EXACT (the cumulative count itself — no second corpus scan) and
   * `achieved − target < bin_count` is a per-query certificate, reported
   * as `rank_err ≤ bound`. Max possible bound ≈ N/nBins for uniform-ish
   * data: 1024 bins certify ~0.1% rank error.
   *
   * Integer-exact throughout: values enter as BIGINT (cents), bin index
   * `(v−vmin)·nBins DIV (vmax−vmin+1)` and edge arithmetic stage through
   * DECIMAL(38,0) (the product overflows BIGINT once value-range × nBins
   * exceeds ~9·10^18). The bin-table window runs single-partition — over
   * `nBins` rows, not data.
   */
  def histogramQuantiles(df: DataFrame, valueCents: Column, nBins: Int,
      probsPct: Seq[Int]): DataFrame = {
    val (stats, binned) = histogramBinned(df, valueCents, nBins, probsPct)
    quantilesFromBins(stats, binned.groupBy("b").agg(count(lit(1)).as("cnt")),
      nBins, probsPct)
  }

  /**
   * The MERGEABLE form of [[histogramQuantiles]]: per-`shardCol` partial
   * sketches (shard × bin counts over the SHARED corpus-wide bin domain —
   * fixing the domain first is exactly what makes the partials mergeable)
   * are reduced by an associative `SUM` per bin, then the same certified
   * quantile arithmetic runs on the merged bin table. The merge is the
   * x83/x95 partial-state pattern applied to quantiles: per-shard sketch
   * tables can be persisted and re-merged later (new shards, incremental
   * appends) without rescanning the corpus, and the result is IDENTICAL to
   * the direct single-pass sketch — spec-asserted, and the SQL oracle is
   * the direct computation.
   */
  def histogramQuantilesSharded(df: DataFrame, valueCents: Column, nBins: Int,
      probsPct: Seq[Int], shardCol: String): DataFrame = {
    val (stats, binned) = histogramBinned(df, valueCents, nBins, probsPct,
      carryCols = Seq(shardCol))
    val partials = binned.groupBy(col(shardCol), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val merged = partials.groupBy("b").agg(sum(col("cnt")).as("cnt"))
    quantilesFromBins(stats, merged, nBins, probsPct)
  }

  /**
   * 2-D Pareto frontier (skyline, maximize both dims): the docs no other
   * doc weakly dominates (`x' ≥ x ∧ y' ≥ y` with one strict). The naive
   * formulation is a quadratic dominance self-join; this runs in ONE
   * corpus aggregate + one window over the per-x-group maxima table
   * (bounded by |distinct x|, the x118 bin-table pattern — the
   * unpartitioned window never sees data): group q survives iff its
   * `ymax` strictly exceeds the running max over all strictly-greater x
   * groups, and within a surviving group exactly the `y = ymax` docs are
   * undominated (anything lower loses to its own group's max; equal
   * points don't dominate each other, so ties all survive). Joining the
   * tiny frontier-group table back is the only other corpus touch (the
   * frontier is corpus-sized only for perfectly anti-correlated
   * all-distinct dims — drop the broadcast hint for such inputs).
   * The declared query's oracle is the INDEPENDENT quadratic NOT EXISTS —
   * algorithm-level cross-validation, not a re-derivation.
   */
  def paretoFrontier2D(df: DataFrame, idCol: String, xCol: String,
      yCol: String): DataFrame = {
    val gx = df.groupBy(xCol).agg(max(col(yCol)).as("ymax"))
    val strictGreater = BoundedGlobalWindow.orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierGroups = gx
      .withColumn("gmax", max(col("ymax")).over(strictGreater))
      .filter(col("gmax").isNull || col("ymax") > col("gmax"))
      .select(col(xCol).as("fx"), col("ymax")) // renamed: joins back onto df
    df.join(broadcast(frontierGroups),
        col(xCol) === col("fx") && col(yCol) === col("ymax"))
      .select(col(idCol), col(xCol), col(yCol))
  }

  /** Shared first phase: global (vmin, vmax, n) stats + per-row bin ids over
    * that fixed domain (`carryCols` ride along for sharded variants). */
  private def histogramBinned(df: DataFrame, valueCents: Column, nBins: Int,
      probsPct: Seq[Int], carryCols: Seq[String] = Nil): (DataFrame, DataFrame) = {
    require(nBins >= 2 && probsPct.nonEmpty &&
      probsPct.forall(p => p >= 1 && p <= 100), "invalid histogram spec")
    val v = valueCents.cast("long")
    val stats = df.agg(min(v).as("vmin"), max(v).as("vmax"),
      count(lit(1)).as("n"))
    val binned = df.select(carryCols.map(col) :+ v.as("v"): _*)
      .crossJoin(broadcast(stats))
      .select(carryCols.map(col) :+
        expr(s"CAST(CAST(v - vmin AS DECIMAL(38,0)) * $nBins" +
          " DIV (vmax - vmin + 1) AS BIGINT)").as("b"): _*)
    (stats, binned)
  }

  /** Shared second phase: certified quantiles from a (b, cnt) bin table —
    * all windows/joins here run over ≤nBins rows, never data. Visible to
    * the streaming leg ([[graft.streaming.EventStream]]), which maintains
    * the bin table incrementally and finishes with this same arithmetic. */
  private[graft] def quantilesFromBins(stats: DataFrame, counts: DataFrame,
      nBins: Int, probsPct: Seq[Int]): DataFrame = {
    val spark = stats.sparkSession
    import spark.implicits._
    val cum = counts
      .withColumn("crank", sum(col("cnt")).over(BoundedGlobalWindow.orderBy("b")))
    val targets = probsPct.toDF("p_pct").crossJoin(broadcast(stats))
      .withColumn("target_rank", expr("(p_pct * n + 99) DIV 100"))
    targets.join(cum, col("crank") >= col("target_rank"))
      .groupBy("p_pct", "vmin", "vmax", "n", "target_rank")
      .agg(min(col("b")).as("b"))
      .join(cum, "b")
      .select(col("p_pct").cast("int").as("p_pct"), col("n"),
        col("target_rank"),
        expr(s"vmin + (CAST(b + 1 AS DECIMAL(38,0)) * (vmax - vmin + 1)" +
          s" + $nBins - 1) DIV $nBins - 1").cast("long").as("approx_cents"),
        col("crank").as("achieved_rank"),
        (col("crank") - col("target_rank")).as("rank_err"),
        col("cnt").as("bound"))
  }

  /**
   * Per-group inter-arrival-gap percentiles, EXACT (rank formula over the
   * sorted gaps — no t-digest approximation): the latency/SLO question
   * "p50/p90/p99 seconds between consecutive events of each type". Gaps
   * are whole seconds (truncate-then-subtract on both engines — identical
   * floor); the reported percentile value is the element at rank
   * `ceil(p·n/100)` of the sorted gap multiset, which is deterministic
   * even when ties permute row identities. Two window passes, both on the
   * SAME group partitioning (one exchange); the rank pick is a filter,
   * not a second aggregate.
   */
  def interArrivalPercentiles(events: DataFrame, typeCol: String,
      tsCol: String, idCol: String, probsPct: Seq[Int]): DataFrame = {
    require(probsPct.nonEmpty && probsPct.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1, 100]")
    val spark = events.sparkSession
    import spark.implicits._
    val byTs = Window.partitionBy(typeCol).orderBy(col(tsCol), col(idCol))
    // NULL ts excluded (see slaAttainment): gaps need an order, and NULLS
    // FIRST (Spark) vs LAST (SQL) would diverge if NULL ts appeared
    val gaps = events
      .filter(col(tsCol).isNotNull)
      .withColumn("__prev", lag(col(tsCol), 1).over(byTs))
      .filter(col("__prev").isNotNull)
      .select(col(typeCol),
        (unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev"))).as("gap_s"))
    val byGap = Window.partitionBy(typeCol).orderBy("gap_s")
    gaps
      .withColumn("__rk", row_number().over(byGap).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(typeCol)))
      .crossJoin(broadcast(probsPct.toDF("p_pct")))
      .filter(col("__rk") === expr("(p_pct * __n + 99) DIV 100"))
      .select(col(typeCol), col("p_pct"), col("__n").as("n"),
        col("gap_s").as("pctl_gap_s"))
  }

  /**
   * EXACT weighted QUANTILES per group — [[weightedMedian]] generalized
   * to arbitrary percentiles: for each requested p, the smallest value
   * whose cumulative weight reaches `p%` of the group total
   * (`100·cum ≥ p·total`, all integers — the weighted analogue of the
   * rank formula, no interpolation). One collapse + two windows + a tiny
   * broadcast percentile spine; ties collapse first exactly as in the
   * median, so the cumulative axis is unambiguous.
   */
  def weightedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, probsPct: Seq[Int]): DataFrame = {
    require(probsPct.nonEmpty && probsPct.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1, 100]")
    val spark = df.sparkSession
    import spark.implicits._
    val gv = df.filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(groupCol, valueCol).agg(sum(col(weightCol)).as("w"))
    val cum = gv
      .withColumn("cw", sum(col("w")).over(
        Window.partitionBy(groupCol).orderBy(valueCol)))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy(groupCol)))
    cum.crossJoin(broadcast(probsPct.toDF("p_pct")))
      .filter(col("cw") * 100 >= col("p_pct") * col("tw"))
      .groupBy(groupCol, "p_pct")
      .agg(min(col(valueCol)).as("q_value"), max(col("tw")).as("total_weight"))
  }

  /**
   * DIFFERENCE-IN-DIFFERENCES readout over a hash-assigned experiment and
   * a rank-derived time cutoff: per (arm, period) user-conversion cells in
   * exact ppm, folded to one row with the DiD estimate
   * `(post_B − pre_B) − (post_A − pre_A)` — the causal-analytics summary
   * an A/B readout ([[abExperiment]]) can't give when both arms drift
   * over time. The cutoff day is the `cutoffPct`-ranked DISTINCT day (the
   * x144 temporal-split pick); a user's period cell is judged by the
   * events they emitted IN that period, so one user can appear in both
   * periods (panel semantics, stated not hidden).
   *
   * Scale shape: one exchange on (user) for the per-(user, period)
   * collapse (map-side partial max), a 4-row cell aggregate, one output
   * row. The cutoff derivation windows over the |days| frame only.
   */
  def diffInDiff(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convType: String, cutoffPct: Int = 50): DataFrame = {
    require(cutoffPct >= 1 && cutoffPct <= 99, s"cutoffPct $cutoffPct not in [1,99]")
    val days = events.select(to_date(col(tsCol)).as("day"))
      .filter(col("day").isNotNull).distinct()
    val cutoff = days
      .withColumn("__rk", row_number().over(BoundedGlobalWindow.orderBy("day")).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(lit(1))))
      .filter(col("__rk") === expr(s"($cutoffPct * __n + 99) DIV 100"))
      .select(col("day").as("__cut"))
    val cells = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .crossJoin(broadcast(cutoff))
      .withColumn("__period",
        when(to_date(col(tsCol)) <= col("__cut"), "pre").otherwise("post"))
      .groupBy(col(userCol), col("__period"))
      .agg(max(when(col(typeCol) === convType, 1L).otherwise(0L)).as("__conv"))
      .withColumn("__arm", pmod(PortableHash.hash60(col(userCol)), lit(2)))
    def cell(arm: Int, period: String, what: Column): Column =
      sum(when(col("__arm") === arm && col("__period") === period, what)
        .otherwise(0L))
    val agg = cells.agg(
      cell(0, "pre", lit(1L)).as("n_a_pre"), cell(0, "pre", col("__conv")).as("c_a_pre"),
      cell(0, "post", lit(1L)).as("n_a_post"), cell(0, "post", col("__conv")).as("c_a_post"),
      cell(1, "pre", lit(1L)).as("n_b_pre"), cell(1, "pre", col("__conv")).as("c_b_pre"),
      cell(1, "post", lit(1L)).as("n_b_post"), cell(1, "post", col("__conv")).as("c_b_post"))
    // empty-cell guard on every rate (see abExperiment): a degenerate
    // input with an unpopulated (arm, period) cell reads as NULL, not a
    // cross-engine crash-vs-NULL divergence
    agg.select(col("n_a_pre"), col("n_a_post"), col("n_b_pre"), col("n_b_post"),
      expr("CASE WHEN n_a_pre > 0 THEN c_a_pre * 1000000 DIV n_a_pre END")
        .as("rate_a_pre_ppm"),
      expr("CASE WHEN n_a_post > 0 THEN c_a_post * 1000000 DIV n_a_post END")
        .as("rate_a_post_ppm"),
      expr("CASE WHEN n_b_pre > 0 THEN c_b_pre * 1000000 DIV n_b_pre END")
        .as("rate_b_pre_ppm"),
      expr("CASE WHEN n_b_post > 0 THEN c_b_post * 1000000 DIV n_b_post END")
        .as("rate_b_post_ppm"),
      expr("CASE WHEN n_a_pre > 0 AND n_a_post > 0 AND n_b_pre > 0 AND n_b_post > 0" +
        " THEN (c_b_post * 1000000 DIV n_b_post - c_b_pre * 1000000 DIV n_b_pre)" +
        " - (c_a_post * 1000000 DIV n_a_post - c_a_pre * 1000000 DIV n_a_pre) END")
        .as("did_ppm"))
  }

  /**
   * EXACT weighted median per group: the smallest value whose cumulative
   * weight reaches half the group total — "median document length weighted
   * by token count" and kin. Ties collapse FIRST (one aggregate per
   * (group, value)), so the cumulative window runs over distinct values
   * with no ordering ambiguity, and `2·cum ≥ total` stays in integers —
   * no ordering-dependent float accumulation anywhere.
   * One exchange on (group, value) for the collapse; the two windows and
   * the final min reuse the group partitioning.
   */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String): DataFrame = {
    // NULL values/weights are excluded up front (standard median
    // semantics) — leaving them in would also diverge between engines:
    // Spark's cumulative window sorts NULLS FIRST (the NULL bucket's
    // weight would count as if it were the smallest value), SQL engines
    // default to NULLS LAST
    val gv = df.filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(groupCol, valueCol).agg(sum(col(weightCol)).as("w"))
    val cum = gv
      .withColumn("cw", sum(col("w")).over(
        Window.partitionBy(groupCol).orderBy(valueCol)))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy(groupCol)))
    cum.filter(col("cw") * 2 >= col("tw"))
      .groupBy(groupCol)
      .agg(min(col(valueCol)).as("weighted_median"),
        max(col("tw")).as("total_weight"))
  }

  /**
   * Per-group MODE (most frequent value) with a DETERMINISTIC tie-break
   * (highest count, then smallest value): "dominant language per source".
   * One count aggregate on (group, value) — bounded by distinct values,
   * not rows — then a rank over each group's value-count table.
   */
  def groupMode(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    // mode is over NON-NULL values: a NULL "dominant value" is never what
    // callers want, and NULL tie-break order differs between engines
    // (Spark NULLS FIRST vs SQL NULLS LAST on the value tiebreaker)
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCol, valueCol).agg(count(lit(1)).as("n"))
    val byFreq = Window.partitionBy(groupCol)
      .orderBy(col("n").desc, col(valueCol))
    counts.withColumn("__rk", row_number().over(byFreq))
      .filter(col("__rk") === 1)
      .select(col(groupCol), col(valueCol).as("mode_value"), col("n"))
  }

  /**
   * MULTI-touch (linear) attribution in EXACT integer basis points — the
   * fractional-credit complement to last-touch attribution: every
   * non-conversion touch in the `windowDays` before a conversion shares
   * the conversion's 10000 bps equally, `10000 DIV n` each with the
   * remainder `10000 mod n` assigned to the LAST touch (deterministic
   * policy — credit always sums to exactly 10000 per conversion, no float
   * drift, engine-portable). Emits per-touch-type totals.
   *
   * Scale shape: conversions join their user's preceding touches with an
   * equi key + time-band residual (per-user event lists are small — the
   * x130 temporal-join argument); the per-conversion count and the
   * last-touch rank share ONE window partitioning on the conversion id.
   */
  def multiTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, convType: String,
      windowDays: Int = 7): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"), col(userCol).as("cu"), col(tsCol).as("cts"))
    // LEFT join: conversions with zero in-window touches survive as one
    // null-extended row and land in an explicit "(unattributed)" bucket
    // with the full 10000 bps — conservation (Σbps = 10000 · conversions)
    // holds GLOBALLY, and unattributed volume is visible, never silent
    val touches = conv.join(events.filter(col(typeCol) =!= convType),
        col("cu") === col(userCol) &&
          col(tsCol) >= col("cts") - expr(s"INTERVAL $windowDays DAYS") &&
          col(tsCol) < col("cts"),
        "left")
      .select(col("conv_id"), col(idCol), col(typeCol), col(tsCol))
    val byConv = Window.partitionBy("conv_id")
    val lastFirst = Window.partitionBy("conv_id")
      .orderBy(col(tsCol).desc, col(idCol).desc)
    touches
      .withColumn("nt", count(col(idCol)).over(byConv))
      .withColumn("rd", row_number().over(lastFirst))
      .withColumn("touch_type", coalesce(col(typeCol), lit("(unattributed)")))
      .withColumn("bps", when(col(idCol).isNull, lit(10000L))
        .otherwise(expr("10000 DIV nt") +
          when(col("rd") === 1, expr("10000 % nt")).otherwise(lit(0L))))
      .groupBy("touch_type")
      .agg(count(col(idCol)).as("n_touches"), sum(col("bps")).as("bps_total"))
  }

  /**
   * Per-group OLS trend line from EXACT decimal moment sums in ONE scan —
   * [[correlationMatrix]]'s moments pattern applied to regression: the five
   * sufficient statistics (n, Σx, Σy, Σx², Σxy) accumulate as exact
   * DECIMAL(18,4) sums inside a single map-side-combined aggregate (no
   * per-group second pass, no merge-order dependence — the built-in
   * streaming `regr_slope` is a running update whose float error depends on
   * partition order), and only the FINAL slope/intercept division happens
   * in double (rounded to 6dp; an engine-portable single operation).
   * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`; NULL when x is constant
   * within the group (zero variance — no trend is defined).
   */
  def trendSlope(df: DataFrame, groupCol: String, x: Column, y: Column): DataFrame = {
    val dx = x.cast("decimal(18,4)")
    val dy = y.cast("decimal(18,4)")
    // listwise complete pairs only (regr_slope semantics): a NULL in either
    // coordinate would otherwise poison the moment set — n counting rows the
    // sums skipped yields a wrong slope, not a degraded one
    val clean = df.filter(x.isNotNull && y.isNotNull)
    val agg = clean.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(dx).as("_sx"), sum(dy).as("_sy"),
      sum(dx * dx).as("_sxx"), sum(dx * dy).as("_sxy"))
    val n = col("n").cast("double")
    val (sx, sy, sxx, sxy) = (col("_sx").cast("double"), col("_sy").cast("double"),
      col("_sxx").cast("double"), col("_sxy").cast("double"))
    // the zero-variance guard runs in EXACT decimal arithmetic: cast-to-
    // double first and constant-x groups can leak through on rounding noise
    // (den ≈ 2e-16 > 0) and emit noise/noise garbage instead of NULL
    val denExact = col("n") * col("_sxx") - col("_sx") * col("_sx")
    val den = n * sxx - sx * sx
    val slope = (n * sxy - sx * sy) / den
    agg.select(col(groupCol), col("n"),
      when(denExact > 0, round(slope, 6)).as("slope"),
      when(denExact > 0, round((sy - slope * sx) / n, 6)).as("intercept"))
  }

  /**
   * Pairwise Pearson correlation matrix over `cols` in ONE scan: every
   * moment (Σx, Σx², Σxy for all pairs) is an EXACT decimal sum inside a
   * single aggregate, and each coefficient is assembled from those exact
   * sums with one fixed double expression — so the result is
   * engine-identical (the built-in `corr` streams float partial states
   * whose merge order varies run to run; b24's determinism argument,
   * applied to the full matrix). NULL policy: listwise deletion — rows
   * containing a NULL in ANY of `cols` are excluded up front (one shared
   * n for every pair, the textbook correlation-matrix convention), and
   * the report carries the surviving row count so the exclusion is
   * visible.
   *
   * Scale shape: one corpus scan, one map-side-combined aggregate carrying
   * `2k + k(k−1)/2 + 1` decimal buffers (k = |cols|, 15 buffers for k=4);
   * the k(k−1)/2 output rows are `inline`d from the single aggregated row.
   * Zero-variance columns yield NULL coefficients, never ±Inf/NaN.
   */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val d4 = (c: String) => col(c).cast("decimal(18,4)")
    val clean = df.na.drop(cols)
    val aggs =
      cols.flatMap(c => Seq(sum(d4(c)).as(s"_s_$c"),
        sum(d4(c) * d4(c)).as(s"_q_$c"))) ++
        pairs.map { case (a, b) => sum(d4(a) * d4(b)).as(s"_p_${a}_$b") }
    val one = clean.agg(count(lit(1)).as("_n"), aggs: _*)
    val n = col("_n").cast("double")
    def s(c: String) = col(s"_s_$c").cast("double")
    def q(c: String) = col(s"_q_$c").cast("double")
    val entries = pairs.map { case (a, b) =>
      val cov = n * col(s"_p_${a}_$b").cast("double") - s(a) * s(b)
      val va = n * q(a) - s(a) * s(a)
      val vb = n * q(b) - s(b) * s(b)
      struct(lit(a).as("col_x"), lit(b).as("col_y"), col("_n").as("n"),
        when(va > 0 && vb > 0, round(cov / sqrt(va * vb), 6)).as("corr"))
    }
    one.select(inline(array(entries: _*)))
  }

  /**
   * First-order Markov TRANSITION MATRIX over per-key event sequences:
   * for every (prev_type → next_type) bigram of consecutive events within
   * a key (user), the transition count and its row-conditional probability
   * in EXACT integer ppm (`n · 1e6 DIV row_total` — truncating integer
   * division, so Σppm per row ≤ 1e6 with the deficit visible, never a
   * float that pretends to sum to 1.0). The sequence-statistics complement
   * to co-occurrence lift: ORDER matters here.
   *
   * Scale shape: ONE exchange on the key for the lag window (consecutive
   * pairs never leave their partition), then an aggregate bounded by
   * |types|² — the output is type-square-bounded regardless of corpus
   * size, and the row-total join is a broadcast of that same tiny frame.
   * NULL keys form one partition (SQL window semantics on both engines);
   * ties inside a key break on `idCol` so the bigram set is deterministic.
   */
  def transitionMatrix(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    // NULL timestamps are excluded up front: an unordered event has no
    // place in a SEQUENCE, and Spark windows sort NULLs first while SQL
    // engines sort them last — the bigram sets would silently diverge
    val bigrams = events
      .filter(col(tsCol).isNotNull)
      .withColumn("__prev", lag(col(typeCol), 1).over(byKey))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = bigrams.groupBy("prev_type").agg(sum("n").as("__tot"))
    bigrams.join(broadcast(totals), "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("n * 1000000 DIV __tot").as("p_ppm"))
  }

  /**
   * Daily BOUNCE RATE over (user, day) sessions: the share of sessions
   * with exactly one event, in exact ppm — the engagement-quality
   * counterpart to session length averages, which single-event sessions
   * silently drag. Session = (user, day) here (the x137 day-session
   * convention); NULL users are excluded (not a session owner).
   *
   * Scale shape: one exchange on (user, day) for the session collapse
   * (map-side partial counts) — the day rollup afterward is satisfied by
   * the same clustering, so the corpus shuffles once; output is
   * |days|-bounded.
   */
  def bounceRate(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val sessions = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("__len"))
    sessions.groupBy("day")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("__len") === 1, 1L).otherwise(0L)).as("n_bounced"))
      .select(col("day"), col("n_sessions"), col("n_bounced"),
        expr("n_bounced * 1000000 DIV n_sessions").as("bounce_ppm"))
  }

  /**
   * TOP USER JOURNEYS: the most frequent first-`steps` event-type paths
   * per (user, day) session — the "what do sessions actually look like"
   * question product analytics asks after transitions ([[transitionMatrix]]
   * answers single hops; this answers whole openings). Path strings
   * assemble deterministically: events rank by (ts, id) inside the
   * session, and the concatenation orders by that rank via a sorted
   * struct array — never `collect_list` order, which Spark does not
   * define.
   *
   * Scale shape: one exchange on (user, day) for the rank window; the
   * path aggregate reuses it; the journey rollup is bounded by distinct
   * paths (≤ |types|^steps) and finishes with TakeOrderedAndProject —
   * the top-k never sorts the corpus.
   */
  def topJourneys(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, steps: Int = 3, k: Int = 10): DataFrame = {
    require(steps >= 1 && k >= 1, "steps and k must be positive")
    val bySession = Window.partitionBy(col(userCol), to_date(col(tsCol)))
      .orderBy(col(tsCol), col(idCol))
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__rk", row_number().over(bySession))
      .filter(col("__rk") <= steps)
      .groupBy(col(userCol), to_date(col(tsCol)).as("__day"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__rk"), col(typeCol).as("t")))),
        p => p.getField("t")), ">").as("journey"))
      .groupBy("journey")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), col("journey"))
      .limit(k)
  }

  /**
   * TRAFFIC ANOMALY days: each day's event count against its TRAILING
   * `windowDays`-day mean in exact integer ratio ppm
   * (`count·trail_n·1e6 DIV trail_sum` — 1e6 = exactly at trend), with
   * spike/drop flags at ±(threshold). The volume monitor that catches a
   * broken producer or a bot flood without a single float. Days without
   * a full trailing window emit NULL ratio and no flag (insufficient
   * baseline is not an anomaly — stated, not guessed).
   *
   * Scale shape: the corpus collapses to |days| rows in one map-side-
   * combined aggregate; the trailing window runs over that tiny frame
   * only (a global ROWS window over ≤ years of days, not over events).
   */
  def trafficAnomalyDays(events: DataFrame, tsCol: String,
      windowDays: Int = 7, thresholdPct: Int = 50): DataFrame = {
    require(windowDays >= 1 && thresholdPct >= 1 && thresholdPct <= 99,
      "invalid parameters")
    val daily = events.select(to_date(col(tsCol)).as("day"))
      .filter(col("day").isNotNull)
      .groupBy("day").agg(count(lit(1)).as("n_events"))
    val trail = BoundedGlobalWindow.orderBy("day").rowsBetween(-windowDays, -1)
    val band = thresholdPct * 10000L // symmetric ±thresholdPct% around 1e6
    daily
      .withColumn("__tsum", sum("n_events").over(trail))
      .withColumn("__tn", count(lit(1)).over(trail))
      .withColumn("ratio_ppm",
        when(col("__tn") === windowDays,
          // staged: daily count × window × 1e6 wraps BIGINT from ~1.3e12
          // events/day — inside the 100 TB envelope's order of magnitude
          expr("CAST(CAST(n_events AS DECIMAL(38,0)) * __tn * 1000000" +
            " DIV __tsum AS BIGINT)")))
      .select(col("day"), col("n_events"),
        coalesce(col("__tsum"), lit(0L)).as("trail_sum"), col("ratio_ppm"),
        when(col("ratio_ppm") > 1000000L + band, "spike")
          .when(col("ratio_ppm") < 1000000L - band, "drop")
          .as("flag"))
  }

  /**
   * SLA ATTAINMENT per group: the share of inter-arrival gaps at or under
   * a threshold, in exact ppm — the operational complement to
   * [[interArrivalPercentiles]]: "p99 ≤ 60s" asks for a quantile,
   * "what fraction met 60s" asks for attainment, and ops dashboards want
   * both. Same single-exchange lag-window shape; the attainment is a
   * map-side-combined aggregate over the gap stream.
   */
  def slaAttainment(events: DataFrame, typeCol: String, tsCol: String,
      idCol: String, thresholdSeconds: Long): DataFrame = {
    require(thresholdSeconds >= 0, "threshold must be non-negative")
    val byTs = Window.partitionBy(typeCol).orderBy(col(tsCol), col(idCol))
    // NULL ts excluded: no gap is defined against an unknown time, and
    // NULLS FIRST (Spark) vs LAST (SQL) window order would diverge
    events
      .filter(col(tsCol).isNotNull)
      .withColumn("__prev", lag(col(tsCol), 1).over(byTs))
      .filter(col("__prev").isNotNull)
      .select(col(typeCol),
        (unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev"))).as("__gap"))
      .groupBy(typeCol)
      .agg(count(lit(1)).as("n_gaps"),
        sum(when(col("__gap") <= thresholdSeconds, 1L).otherwise(0L))
          .as("n_within"))
      .withColumn("attain_ppm", expr("n_within * 1000000 DIV n_gaps"))
  }

  /**
   * SEASONALITY PROFILE: the (day-of-week × hour-of-day) event-count
   * matrix with each cell's share of the week in exact ppm — the load
   * fingerprint capacity planning and anomaly baselines start from.
   * Engine-exact because both sides compute dow/hour from the same UTC
   * instants (ISO numbering pinned explicitly — Spark's `dayofweek` is
   * Sunday=1, so we derive ISO Monday=1 arithmetic both sides).
   *
   * Scale shape: ONE map-side-combined aggregate to the ≤168-cell grain;
   * the share join is a 1-row broadcast. Nothing else.
   */
  def seasonalityProfile(events: DataFrame, tsCol: String): DataFrame = {
    val cells = events.filter(col(tsCol).isNotNull)
      .groupBy(
        // ISO dow (Mon=1..Sun=7) from Spark's Sunday=1 dayofweek
        expr(s"(dayofweek($tsCol) + 5) % 7 + 1").as("iso_dow"),
        hour(col(tsCol)).as("hod"))
      .agg(count(lit(1)).as("n_events"))
    val total = cells.agg(sum("n_events").as("__tot"))
    cells.crossJoin(broadcast(total))
      .select(col("iso_dow"), col("hod"), col("n_events"),
        expr("n_events * 1000000 DIV __tot").as("share_ppm"))
  }

  /**
   * REVENUE CONCENTRATION report: exact-rank deciles of a value column
   * with each decile's share in ppm, plus the exact GINI coefficient in
   * ppm from the closed form `G = (2·Σ i·xᵢ)/(n·Σx) − (n+1)/n` over
   * ascending-sorted values — the inequality audit ("does the top decile
   * carry half the revenue?") behind mixture capping and anomaly review.
   * Values are integer cents (decimal-staged by callers); Σ i·xᵢ stages
   * through DECIMAL(38,0) (rank×cents×rows overflows BIGINT at warehouse
   * scale), and both Gini terms are scaled to ppm BEFORE the subtraction
   * so the arithmetic never leaves integers.
   *
   * Scale shape: ranks come from [[Sampling.globalRankByValue]]'s
   * two-phase construction — a cumulative window over the DISTINCT-value
   * frame (vocabulary-bounded, never a row-bounded global sort) plus an
   * intra-value local rank, offsets broadcast back; decile cells and the
   * Gini moments are then map-side-combined aggregates; the report is
   * ≤10 rows + the 1-row Gini broadcast onto each. Tie permutations
   * cannot change any output (equal values contribute identically
   * wherever their contiguous ranks land).
   */
  def revenueConcentration(df: DataFrame, idCol: String,
      valueCents: Column): DataFrame = {
    val vals = df.select(col(idCol).as("__i"), valueCents.as("__v"))
      .filter(col("__v").isNotNull)
    val counts = vals.groupBy("__v").agg(count(lit(1)).as("__cnt"))
    val offsets = counts
      .withColumn("__before",
        sum(col("__cnt")).over(BoundedGlobalWindow.orderBy("__v")) - col("__cnt"))
      .withColumn("__n", sum(col("__cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__v").as("__ov"), col("__before"), col("__n"))
    val ranked = vals
      .withColumn("__lr", row_number().over(
        Window.partitionBy("__v").orderBy("__i")).cast("long"))
      .join(broadcast(offsets), col("__v") === col("__ov"))
      .withColumn("__rk", col("__before") + col("__lr"))
    val gini = ranked.agg(
        max(col("__n")).as("__n"), sum("__v").as("__sx"),
        sum(expr("CAST(__rk AS DECIMAL(38,0)) * __v")).as("__six"))
      .select(expr(
        "CAST(2 * __six * 1000000 DIV (CAST(__n AS DECIMAL(38,0)) * __sx)" +
          " - (__n + 1) * 1000000 DIV __n AS BIGINT)").as("gini_ppm"))
    ranked
      .withColumn("decile", expr("((__rk - 1) * 10 DIV __n) + 1"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_rows"), sum("__v").as("sum_cents"))
      .withColumn("__tot", sum("sum_cents").over(Window.partitionBy(lit(1))))
      .crossJoin(broadcast(gini))
      .select(col("decile"), col("n_rows"), col("sum_cents"),
        expr("sum_cents * 1000000 DIV __tot").as("share_ppm"),
        col("gini_ppm"))
  }

  /**
   * Per-user DAILY STREAKS (gaps-and-islands): for each user, the number
   * of maximal runs of consecutive active days, the longest run, and the
   * active-day total — the engagement statistic behind "N-day streak"
   * features. The island key is `day − rank(day)` (consecutive days share
   * it, any gap breaks it) — pure date arithmetic, engine-exact.
   *
   * Scale shape: ONE exchange on the user key; the distinct-day collapse,
   * the rank window, and both aggregates all reuse that partitioning
   * (island key = f(user rows only)), so the whole operator is a single
   * shuffle regardless of corpus size. Output is |users|-bounded.
   */
  def dailyStreaks(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    // partition by the USER alone before the distinct: hash(user) clusters
    // (user, day) too, so the day-collapse, the rank window, and both
    // aggregates all satisfy their distribution from this ONE exchange — a
    // plain distinct() would shuffle on (user, day) and force a second
    // user-only exchange for the window
    val days = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), to_date(col(tsCol)).as("__day"))
      .repartition(col(userCol))
      .distinct()
    val byDay = Window.partitionBy(userCol).orderBy("__day")
    days
      .withColumn("__anchor", date_sub(col("__day"),
        row_number().over(byDay)))
      .groupBy(userCol, "__anchor").agg(count(lit(1)).as("__len"))
      .groupBy(userCol)
      .agg(count(lit(1)).as("n_streaks"),
        max("__len").as("longest_streak"),
        sum("__len").as("n_active_days"))
  }

  /**
   * Deterministic A/B EXPERIMENT readout: users assigned to two arms by a
   * portable keyed hash (`hash60(user) mod 2` — reproducible across
   * engines and reruns; no RNG, the repo-wide sampling rule), conversion
   * = "did the user ever emit `convType`", rates and the arm delta in
   * EXACT integer ppm. One row out, every figure oracle-checkable.
   *
   * Scale shape: one exchange on the user key for the per-user collapse
   * (map-side partial max), then a 2-row aggregate folded to one row —
   * the arm split never reshuffles the corpus. NULL users are excluded
   * (they are not assignable experiment units).
   */
  def abExperiment(events: DataFrame, userCol: String, typeCol: String,
      convType: String): DataFrame = {
    val perUser = events.filter(col(userCol).isNotNull)
      .groupBy(userCol)
      .agg(max(when(col(typeCol) === convType, 1L).otherwise(0L)).as("__conv"))
      .withColumn("__arm", pmod(PortableHash.hash60(col(userCol)), lit(2)))
    perUser.agg(
        sum(when(col("__arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("__arm") === 0, col("__conv")).otherwise(0L)).as("conv_a"),
        sum(when(col("__arm") === 1, col("__conv")).otherwise(0L)).as("conv_b"))
      .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        // empty-arm guard: Spark's DIV-by-zero yields NULL but a SQL
        // oracle's integer division raises — make "no data" an explicit
        // NULL on both engines (columnDrift's changed_ppm pattern)
        expr("CASE WHEN n_a > 0 THEN conv_a * 1000000 DIV n_a END").as("rate_a_ppm"),
        expr("CASE WHEN n_b > 0 THEN conv_b * 1000000 DIV n_b END").as("rate_b_ppm"),
        expr("CASE WHEN n_a > 0 AND n_b > 0 THEN" +
          " conv_b * 1000000 DIV n_b - conv_a * 1000000 DIV n_a END")
          .as("diff_ppm"))
  }

  /**
   * ROLLING 7-day DISTINCT users per day (WAU-style) — the windowed
   * COUNT(DISTINCT) SQL windows cannot express (no DISTINCT over RANGE
   * frames in any engine): collapse to distinct (user, day) pairs, then
   * each observed day counts the distinct users of its trailing window
   * via a range join against the DAY SPINE.
   *
   * Scale shape: the pair frame is |users×days|-bounded (day-grain, not
   * event-grain) and the spine is |days| rows — the range join BROADCASTS
   * the spine over the pairs (each pair lands in ≤`windowDays` windows,
   * so the blow-up is a constant factor, never quadratic), and one
   * count-distinct aggregate per day finishes it. The corpus is scanned
   * once.
   */
  def rollingDistinctUsers(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays $windowDays must be positive")
    val pairs = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), to_date(col(tsCol)).as("__day"))
      .distinct()
    val spine = pairs.select(col("__day").as("day")).distinct()
    pairs.join(broadcast(spine),
        col("__day") > date_sub(col("day"), windowDays) &&
          col("__day") <= col("day"))
      .groupBy("day")
      .agg(countDistinct(col(userCol)).as("n_active_users"))
  }

  /**
   * Rank-exact LOWER MEDIAN (the element at rank `(n+1) DIV 2`) computed
   * over the VALUE-COLLAPSED frame: collapse to (parts, value, count)
   * first — one map-side-combined aggregate bounded by DISTINCT values —
   * then pick the smallest value whose cumulative count reaches half the
   * total (`2·cum ≥ n`, the [[weightedMedian]] integer-rank identity;
   * for odd n, `2·cum` is even so `≥ n` and `≥ n+1` coincide — one
   * predicate serves both parities). Row-identical to ranking raw rows
   * (equal values collapse, so a row-id tiebreak is vacuous), but the
   * cumulative window runs over the distinct-value frame, never the
   * corpus: a global median costs one collapse plus a vocabulary-bounded
   * window instead of funneling every row through a single-task sort.
   *
   * Output: one row per `parts` group with `__v` = median and `__n` =
   * non-null row count. With `parts = Nil` the cumulative window is
   * unpartitioned BUT value-bounded — the accepted spine/vocabulary
   * shape, not the row-sized funnel this helper exists to avoid.
   */
  def lowerMedianByValue(d: DataFrame, parts: Seq[String],
      valueCol: String): DataFrame = {
    val gcols = parts.map(col)
    val gv = d.groupBy((gcols :+ col(valueCol)): _*).agg(count(lit(1)).as("__c"))
    val (w, cnt) =
      if (parts.isEmpty)
        (BoundedGlobalWindow.orderBy(valueCol), Window.partitionBy(lit(1)))
      else
        (Window.partitionBy(gcols: _*).orderBy(valueCol),
          Window.partitionBy(gcols: _*))
    val qualifying = gv
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(cnt))
      .filter(col("__cum") * 2 >= col("__n"))
    val agg = Seq(min(col(valueCol)).as("__v"), max(col("__n")).as("__n"))
    if (parts.isEmpty) qualifying.agg(agg.head, agg.tail: _*)
    else qualifying.groupBy(gcols: _*).agg(agg.head, agg.tail: _*)
  }

  /**
   * FEDERATED-MEDIAN divergence audit: the exact global median versus the
   * "median of per-shard medians" shortcut every federated/streaming
   * system is tempted by — reported side by side with the error in ppm,
   * so the shortcut's bias is MEASURED, not assumed. Medians are
   * rank-exact lower medians (element at rank `(n+1) DIV 2` — no
   * interpolation, defined for any ordered type); shards are assigned by
   * the portable hash so the audit reproduces anywhere.
   *
   * Scale shape: every median is [[lowerMedianByValue]] — a
   * map-side-combined value collapse, then cumulative counts over the
   * DISTINCT-VALUE frame only (never a row-sized window); the per-shard
   * variant partitions the same shape by shard, and the S-row
   * shard-medians frame folds through the same collapsed path. Nothing
   * quadratic, nothing collected, nothing corpus-sized in one task.
   */
  def federatedMedianAudit(df: DataFrame, idCol: String, valueCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards $nShards must be positive")
    val clean = df.filter(col(valueCol).isNotNull)
      .select(col(idCol).as("__id"), col(valueCol).cast("long").as("__v"))
      .withColumn("__shard", pmod(PortableHash.hash60(col("__id")), lit(nShards)))
    val truth = lowerMedianByValue(clean, Nil, "__v")
      .select(col("__n").as("n"), col("__v").as("true_median"))
    val fed = lowerMedianByValue(
      lowerMedianByValue(clean, Seq("__shard"), "__v").select(col("__v")),
      Nil, "__v").select(col("__v").as("federated_median"))
    truth.crossJoin(broadcast(fed))
      .select(col("n"), col("true_median"), col("federated_median"),
        expr("abs(federated_median - true_median) * 1000000" +
          " DIV greatest(abs(true_median), 1)").as("err_ppm"))
  }

  /**
   * GROWTH ACCOUNTING (new / retained / resurrected / churned) at week
   * grain — the startup-metrics matrix, engine-exact because week
   * boundaries are ISO Mondays in both Spark and DuckDB and every status
   * is pure date arithmetic over the per-user active-week sequence:
   * `new` = first active week, `retained` = active the week before,
   * `resurrected` = returned after a gap ≥ 2 weeks, and `churned(w)` =
   * active in `w−7d` but not `w`. Churn is only reported for weeks
   * OBSERVED in the data (a week nobody touched the product cannot carry
   * a row — documented convention; beyond-horizon churn is unknowable).
   *
   * Scale shape: one exchange on the user key — the week collapse, the
   * lag/lead windows, and the status derivation all share it; the
   * per-week rollups are |weeks|-bounded aggregates and the spine join
   * broadcasts. Event grain never reshuffles.
   */
  def growthAccounting(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val uw = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), to_date(date_trunc("week", col(tsCol))).as("__wk"))
      .repartition(col(userCol)) // one exchange serves collapse + windows
      .distinct()
    val byWk = Window.partitionBy(userCol).orderBy("__wk")
    val seq = uw
      .withColumn("__prev", lag(col("__wk"), 1).over(byWk))
      .withColumn("__next", lead(col("__wk"), 1).over(byWk))
    val statuses = seq.groupBy(col("__wk").as("week"))
      .agg(
        sum(when(col("__prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("__prev") === date_sub(col("__wk"), 7), 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("__prev").isNotNull &&
          col("__prev") < date_sub(col("__wk"), 7), 1L).otherwise(0L))
          .as("n_resurrected"))
    val churn = seq
      .filter(col("__next").isNull || col("__next") > date_add(col("__wk"), 7))
      .groupBy(date_add(col("__wk"), 7).as("week"))
      .agg(count(lit(1)).as("__churned"))
    statuses.join(churn, Seq("week"), "left")
      .select(col("week"), col("n_new"), col("n_retained"),
        col("n_resurrected"),
        coalesce(col("__churned"), lit(0L)).as("n_churned"))
  }

  /**
   * CONVERSION LIFE TABLE (discrete survival analysis numerators and
   * denominators): for each whole-day lag k since a user's first
   * `startType` event — n_at_risk (users still unconverted and still
   * observable at day k), n_converted (first `convType` lands exactly at
   * lag k), n_censored (observation window ends at lag k without
   * conversion; the window closes at the GLOBAL max event date, the
   * standard administrative-censoring cutoff). Pure integer day
   * arithmetic — the Kaplan-Meier PRODUCT estimate is deliberately left
   * to the caller (it is float; these exact counts are what any engine
   * must agree on).
   *
   * Scale shape: one exchange on the user key collapses each user to a
   * single (conv_lag | censor_lag) row; the lag-grain rollup is bounded
   * by |days of history|, and n_at_risk is a REVERSE cumulative window
   * over that tiny frame (at-risk(k) = Σ_{j≥k} converted(j)+censored(j)).
   * Only lags that actually occur carry rows (documented — empty lags
   * are absent, not zero).
   */
  def conversionLifeTable(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, startType: String, convType: String): DataFrame = {
    val perUser = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(userCol)
      .agg(min(when(col(typeCol) === startType, to_date(col(tsCol))))
          .as("__start"),
        min(when(col(typeCol) === convType, to_date(col(tsCol))))
          .as("__convd"))
      .filter(col("__start").isNotNull)
    val horizon = events.agg(max(to_date(col(tsCol))).as("__end"))
    val lagged = perUser.crossJoin(broadcast(horizon))
      // conversions BEFORE the first start are not conversions OF it
      .withColumn("__conv_lag",
        when(col("__convd") >= col("__start"),
          datediff(col("__convd"), col("__start")).cast("long")))
      .withColumn("__cens_lag",
        datediff(col("__end"), col("__start")).cast("long"))
    val perLag = lagged
      .withColumn("lag_days",
        coalesce(col("__conv_lag"), col("__cens_lag")))
      .groupBy("lag_days")
      .agg(sum(when(col("__conv_lag").isNotNull, 1L).otherwise(0L))
          .as("n_converted"),
        sum(when(col("__conv_lag").isNull, 1L).otherwise(0L))
          .as("n_censored"))
    perLag
      .withColumn("n_at_risk",
        sum(col("n_converted") + col("n_censored")).over(
          BoundedGlobalWindow.orderBy(col("lag_days").desc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("lag_days"), col("n_at_risk"), col("n_converted"),
        col("n_censored"))
  }

  /**
   * Per-group WINSORIZED mean, EXACT: values are clamped to the group's
   * [p-lo, p-hi] rank-percentile bounds (the element at sorted rank
   * `ceil(p·n/100)` — the same deterministic rank pick as
   * [[interArrivalPercentiles]], no interpolation, no sketch), then
   * averaged in integer centi-units (`SUM·100 DIV n`). The robust-mean
   * a quality pipeline reports when a handful of giant documents would
   * otherwise dominate a plain mean.
   *
   * Scale shape: one exchange on the group for the rank window; the two
   * bounds per group collapse to a |groups|-row frame that BROADCASTS back
   * onto the ranked rows (clamp is map-side), and the final aggregate
   * reuses the group partitioning. NULL values are excluded up front
   * (rank semantics over NULLs diverge between engines).
   */
  def winsorizedMean(df: DataFrame, groupCol: String, valueCol: String,
      loPct: Int, hiPct: Int): DataFrame = {
    require(1 <= loPct && loPct < hiPct && hiPct <= 100,
      s"need 1 <= loPct < hiPct <= 100, got ($loPct, $hiPct)")
    val clean = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).cast("long").as("__v"))
    val byV = Window.partitionBy(groupCol).orderBy("__v")
    val ranked = clean
      .withColumn("__rk", row_number().over(byV).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    val bounds = ranked
      .filter(col("__rk") === expr(s"($loPct * __n + 99) DIV 100") ||
        col("__rk") === expr(s"($hiPct * __n + 99) DIV 100"))
      .groupBy(groupCol)
      .agg(min("__v").as("__lo"), max("__v").as("__hi"))
    ranked.join(broadcast(bounds), Seq(groupCol))
      .select(col(groupCol),
        greatest(col("__lo"), least(col("__hi"), col("__v"))).as("__w"),
        col("__lo"), col("__hi"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        expr("SUM(__w) * 100 DIV COUNT(1)").as("wins_mean_centi"),
        min("__lo").as("lo_bound"), min("__hi").as("hi_bound"))
  }

  /**
   * BURST detection — the bot/abuse heuristic every event pipeline runs
   * before trusting per-user statistics: each user's maximum event count
   * inside ANY trailing `windowSeconds` window, found exactly by a
   * RANGE frame over epoch seconds (every event anchors a window ending
   * at itself; a burst's peak is always anchored at its last event, so
   * the per-event frame maximum IS the true sliding-window maximum).
   * Top `topK` burstiest users emitted (burst desc, volume desc, user) —
   * the review queue, not a corpus-sized report.
   *
   * Scale shape: ONE exchange on the user key — the range-frame count
   * and the per-user aggregate share it — then TakeOrdered for the
   * top-k (per-partition heaps, no global sort). Integer epoch-second
   * arithmetic; NULL users/ts excluded (not attributable to an actor).
   */
  def burstDetection(events: DataFrame, userCol: String, tsCol: String,
      windowSeconds: Int = 60, topK: Int = 50): DataFrame = {
    require(windowSeconds >= 1 && topK >= 1, "windowSeconds and topK must be positive")
    val w = Window.partitionBy(userCol).orderBy("__es")
      .rangeBetween(-(windowSeconds - 1L), 0L)
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), floor(unix_timestamp(col(tsCol))).as("__es"))
      .withColumn("__burst", count(lit(1)).over(w))
      .groupBy(userCol)
      .agg(count(lit(1)).as("n_events"), max(col("__burst")).as("max_burst"))
      .orderBy(col("max_burst").desc, col("n_events").desc, col(userCol))
      .limit(topK)
  }

  /**
   * TRANSITION DIVERSITY per antecedent — the Simpson concentration
   * index λ = Σ nᵢ(nᵢ−1) / N(N−1) over each prev_type's next-type
   * distribution, in exact integer ppm (the probability two random
   * successors of the same antecedent coincide — 1e6 = a deterministic
   * funnel, → 0 = anything-can-follow). The integer-exact alternative to
   * Shannon entropy (whose logs never hash-match across engines), asked
   * of the same bigram stream as [[transitionMatrix]].
   *
   * Scale shape: identical to transitionMatrix — one exchange on the key
   * for the lag window, a |types|²-bounded bigram aggregate, then a
   * |types|-row rollup. The Σnᵢ(nᵢ−1) sum stages through DECIMAL(38,0):
   * at claimed scale nᵢ·(nᵢ−1)·1e6 overflows BIGINT long before the
   * answer does.
   */
  def transitionDiversity(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val bigrams = events
      .filter(col(tsCol).isNotNull)
      .withColumn("__prev", lag(col(typeCol), 1).over(byKey))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    bigrams.groupBy("prev_type")
      .agg(count(lit(1)).as("n_next_types"),
        sum(col("n")).as("n_total"),
        sum(expr("CAST(n AS DECIMAL(38,0)) * (n - 1)")).as("__coin"))
      .select(col("prev_type"), col("n_next_types"), col("n_total"),
        expr("CASE WHEN n_total > 1 THEN CAST(__coin * 1000000" +
          " DIV (CAST(n_total AS DECIMAL(38,0)) * (n_total - 1)) AS BIGINT) END")
          .as("simpson_ppm"))
  }

  /**
   * POSITIONAL (U-shaped) attribution in EXACT integer basis points —
   * the third attribution policy next to last-touch and linear: the
   * FIRST and LAST in-window touches before a conversion earn 4000 bps
   * each, the middles split the remaining 2000 (`2000 DIV m` each, the
   * remainder `2000 mod m` to the EARLIEST middle — deterministic;
   * credit sums to exactly 10000 per conversion). Degenerate paths keep
   * conservation: one touch → 10000, two touches → 5000/5000, zero
   * in-window touches → the explicit "(unattributed)" bucket takes the
   * full 10000 (the [[multiTouchAttribution]] LEFT-join convention).
   *
   * Scale shape: identical to linear attribution — a per-user time-band
   * equi-join feeds ONE window partitioning on the conversion id for
   * both the touch count and the ascending position rank.
   */
  def positionalAttribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, convType: String,
      windowDays: Int = 7): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"), col(userCol).as("cu"), col(tsCol).as("cts"))
    val touches = conv.join(events.filter(col(typeCol) =!= convType),
        col("cu") === col(userCol) &&
          col(tsCol) >= col("cts") - expr(s"INTERVAL $windowDays DAYS") &&
          col(tsCol) < col("cts"),
        "left")
      .select(col("conv_id"), col(idCol), col(typeCol), col(tsCol))
    val byConv = Window.partitionBy("conv_id")
    val firstFirst = Window.partitionBy("conv_id")
      .orderBy(col(tsCol).asc, col(idCol).asc)
    touches
      .withColumn("nt", count(col(idCol)).over(byConv))
      .withColumn("rp", row_number().over(firstFirst))
      .withColumn("touch_type", coalesce(col(typeCol), lit("(unattributed)")))
      .withColumn("bps", when(col(idCol).isNull, lit(10000L))
        .otherwise(expr(
          """CASE WHEN nt = 1 THEN 10000
            |     WHEN nt = 2 THEN 5000
            |     WHEN rp = 1 OR rp = nt THEN 4000
            |     ELSE 2000 DIV (nt - 2) +
            |          CASE WHEN rp = 2 THEN 2000 % (nt - 2) ELSE 0 END
            |END""".stripMargin.replace("\n", " "))))
      .groupBy("touch_type")
      .agg(count(col(idCol)).as("n_touches"), sum(col("bps")).as("bps_total"))
  }

  /**
   * Score-DECILE LIFT table — the model-evaluation readout for any
   * per-user score against a conversion outcome: rank users by (score,
   * user), cut into 10 equal-depth deciles (`(rank−1)·10 DIV n` — exact
   * ±1-row depth, no NTILE engine quirks), and report each decile's
   * conversion rate plus its LIFT versus the overall rate, all in exact
   * integer ppm (`lift = n_conv·N·1e6 DIV (n_users·C)`, staged through
   * DECIMAL(38,0) — three chained counts overflow BIGINT at scale).
   *
   * Scale shape: the user rank is [[Sampling.globalRankRange]] — the
   * two-phase range-partitioned prefix sum, never a single-task window
   * over the user frame; the decile rollup is 10 rows and the overall
   * totals come from a window over that 10-row frame.
   */
  def decileLift(users: DataFrame, userCol: String, scoreCol: String,
      convCol: String): DataFrame = {
    val ranked = Sampling.globalRankRange(
        users.select(col(userCol), col(scoreCol)), userCol, scoreCol)
      .join(users.select(col(userCol), col(convCol)), Seq(userCol))
    // totals ride a 1-row broadcast — NEVER an unpartitioned window over
    // the user frame (the single-task funnel this operator's rank already
    // avoids via the two-phase prefix sum)
    val tot = users.agg(count(lit(1)).as("__N"), sum(col(convCol)).as("__C"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("decile", expr("(global_rank - 1) * 10 DIV __N"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum(col(convCol)).as("n_conv"),
        max(col("__N")).as("__N"), max(col("__C")).as("__C"))
      .select(col("decile"), col("n_users"), col("n_conv"),
        expr("CASE WHEN n_users > 0 THEN n_conv * 1000000 DIV n_users END")
          .as("conv_rate_ppm"),
        expr("CASE WHEN __C > 0 THEN CAST(CAST(n_conv AS DECIMAL(38,0))" +
          " * __N * 1000000 DIV (CAST(n_users AS DECIMAL(38,0)) * __C)" +
          " AS BIGINT) END").as("lift_ppm"))
  }

  /**
   * Daily-count AUTOCORRELATION at lags 1..`maxLag` — the periodicity
   * detector: a weekly-cyclic workload shows the lag-7 spike
   * [[seasonalityProfile]]'s bucket means can only hint at, and the lag-1
   * coefficient is the burstiness gauge. Exact Pearson over the ZERO-FILLED
   * calendar series (a silent day is a 0 observation, not a missing row —
   * pairing only observed days would bias every lag toward quiet-period
   * survivorship).
   *
   * Determinism: [[correlationMatrix]]'s moments discipline — per-lag
   * sufficient statistics accumulate as EXACT decimal sums, each
   * coefficient is ONE fixed double expression over them (round 6dp), and
   * the zero-variance guard runs on the exact decimals so a constant
   * series yields NULL, never noise/noise garbage.
   *
   * Scale shape: the corpus collapses to the |days| spine in one
   * map-side-combined aggregate; everything after — zero-fill, the
   * per-lag alignment equi-join on `day + lag`, the moment aggregate —
   * is |days|·maxLag-bounded. The lag frame broadcasts; output is
   * `maxLag` rows.
   */
  def autocorrelation(events: DataFrame, tsCol: String, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 366, s"maxLag $maxLag not in [1,366]")
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day")).agg(count(lit(1)).as("__n"))
    val bounds = daily.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val spine = bounds
      .select(explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
    val filled = spine.join(daily, Seq("day"), "left")
      // cached: both alignment sides of every lag re-read the filled
      // series. Caller-managed lifecycle — see pageRank's contract.
      .select(col("day"), coalesce(col("__n"), lit(0L)).as("__x"))
      .cache()
    val lags = filled.sparkSession.range(1, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    val pairs = filled.as("a")
      .crossJoin(broadcast(lags))
      .join(filled.as("b"), expr("b.day = date_add(a.day, lag)"))
    val dx = col("a.__x").cast("decimal(19,0)")
    val dy = col("b.__x").cast("decimal(19,0)")
    val agg = pairs.groupBy("lag").agg(
      count(lit(1)).as("n_pairs"),
      sum(dx).as("_sx"), sum(dy).as("_sy"),
      sum(dx * dx).as("_sxx"), sum(dy * dy).as("_syy"), sum(dx * dy).as("_sxy"))
    val n = col("n_pairs").cast("double")
    def d(c: String) = col(c).cast("double")
    val va = n * d("_sxx") - d("_sx") * d("_sx")
    val vb = n * d("_syy") - d("_sy") * d("_sy")
    val vaExact = col("n_pairs") * col("_sxx") - col("_sx") * col("_sx")
    val vbExact = col("n_pairs") * col("_syy") - col("_sy") * col("_sy")
    agg.select(col("lag"), col("n_pairs"),
      when(vaExact > 0 && vbExact > 0,
        round((n * d("_sxy") - d("_sx") * d("_sy")) / sqrt(va * vb), 6)).as("acf"))
      .orderBy("lag")
  }

  /**
   * BUSINESS-DAY lag distribution — fulfillment SLA in working days, not
   * calendar days (a Friday order shipped Monday is 1 business day, not
   * 3): per group, the count/min/max/mean of business days from `startCol`
   * to `endCol`, where the lag counts weekdays in the half-open interval
   * (start, end] (ship ON the order day = 0; weekend endpoints contribute
   * nothing).
   *
   * The DATE-DIMENSION pattern, not per-row modular arithmetic: a
   * calendar spine from global min(start) to max(end) carries a
   * cumulative business-day index (one |days|-bounded window over the
   * SPINE, never the fact rows), the dimension broadcasts, and each fact
   * row's lag is two index lookups — `bd(end) − bd(start)`. Closed-form
   * weekday counting is O(1) per row but unreadable and engine-divergent
   * at the mod-7 corners; the dimension join is the warehouse-standard
   * form and holds any calendar refinement (holidays = one more spine
   * predicate) without touching fact-side code.
   *
   * Rows with NULL endpoints or end < start are excluded (no SLA defined);
   * mean is exact integer ppm.
   */
  def businessDayLag(df: DataFrame, startCol: String, endCol: String,
      groupCol: String): DataFrame = {
    val clean = df
      .select(col(groupCol), to_date(col(startCol)).as("__s"),
        to_date(col(endCol)).as("__e"))
      .filter(col("__s").isNotNull && col("__e").isNotNull && col("__e") >= col("__s"))
    val bounds = clean.agg(min(col("__s")).as("__d0"), max(col("__e")).as("__d1"))
    val dim = bounds
      .select(explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
      // weekday(): 0=Mon..6=Sun; the cumulative index is a window over the
      // CALENDAR spine — |days|-bounded by construction
      .withColumn("__bd", sum(when(expr("weekday(day)") < 5, 1L).otherwise(0L))
        .over(BoundedGlobalWindow.orderBy("day")))
    clean
      .join(broadcast(dim.select(col("day").as("__s"), col("__bd").as("__bs"))), "__s")
      .join(broadcast(dim.select(col("day").as("__e"), col("__bd").as("__be"))), "__e")
      .withColumn("__lag", col("__be") - col("__bs"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"),
        min(col("__lag")).as("min_bd"), max(col("__lag")).as("max_bd"),
        sum(col("__lag")).as("__sum"))
      .select(col(groupCol), col("n"), col("min_bd"), col("max_bd"),
        expr("__sum * 1000000 DIV n").as("mean_bd_ppm"))
  }

  /**
   * RANK-AGREEMENT audit between two scorings of the same item vocabulary
   * — "did this quarter's brand ranking actually change?": Kendall
   * concordant/discordant pair counts plus top-`topK` set overlap. Both
   * sides rank by (score DESC, item) — the item tiebreak makes the
   * permutation total and engine-exact, so concordant + discordant =
   * C(n,2) always (no tie bucket to reconcile). Counts are returned raw,
   * NOT folded into a tau ratio: tau's sign makes truncating integer
   * division engine-divergent (Spark DIV truncates toward zero, SQL `//`
   * floors), and the counts are what an audit diffs anyway.
   *
   * PRECONDITION (stated, like the dedup caps): the item set must be a
   * bounded vocabulary (brands, categories, sources) — Kendall's tau IS
   * a pairwise statistic, the C(n,2) pair frame is its definition. The
   * ranking windows run over that same bounded frame. For unbounded item
   * sets use top-k overlap alone ([[Sampling.globalRankRange]] feeds it
   * scale-safely).
   */
  def rankAgreement(left: DataFrame, right: DataFrame, itemCol: String,
      scoreCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK $topK must be positive")
    def ranked(df: DataFrame, rk: String) = df
      .select(col(itemCol).as("item"), col(scoreCol).as("__s"))
      .withColumn(rk,
        row_number().over(BoundedGlobalWindow.orderBy(col("__s").desc, col("item"))).cast("long"))
      .select(col("item"), col(rk))
    val j = ranked(left, "ra").join(ranked(right, "rb"), "item")
      // cached: consumed by both pair sides and the overlap aggregate.
      // Caller-managed lifecycle — see pageRank's contract.
      .cache()
    // the inequality-only condition gives the planner no equi-key, and the
    // cached frame's pre-materialization size estimate is unknown — without
    // the explicit hint Spark degrades this to CartesianProduct (caught by
    // the fleet-wide WindowGuardSpec rule). The frame is the bounded item
    // vocabulary (the operator's stated precondition), so broadcast it.
    val pairs = j.as("x").join(broadcast(j.as("y")), col("x.item") < col("y.item"))
      .select(((col("x.ra") - col("y.ra")) * (col("x.rb") - col("y.rb"))).as("__p"))
      .agg(sum(when(col("__p") > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(col("__p") < 0, 1L).otherwise(0L)).as("discordant"))
    val tops = j.agg(count(lit(1)).as("n_common"),
      sum(when(col("ra") <= topK && col("rb") <= topK, 1L).otherwise(0L))
        .as(s"overlap_top$topK"))
    // both frames are 1 row — the cross join broadcasts
    tops.crossJoin(pairs)
      .select(col("n_common"), coalesce(col("concordant"), lit(0L)).as("concordant"),
        coalesce(col("discordant"), lit(0L)).as("discordant"),
        coalesce(col(s"overlap_top$topK"), lit(0L)).as(s"overlap_top$topK"))
  }

  /**
   * EXACT geometric smoothing of the daily event series — the EWMA shape
   * without the float recurrence: `smooth(t) = Σ_{k<W} x(t−k)·2^(W−1−k)`,
   * reported as the weighted mean in exact integer ppm (denominator
   * `2^W − 1`). A true EWMA is an infinite recurrence whose float state
   * depends on where the stream started; the W-day geometric window is
   * its bounded, engine-exact twin — identical ordering behavior, and
   * every value is reproducible arithmetic over the zero-filled calendar
   * series ([[autocorrelation]]'s zero-fill argument).
   *
   * Scale shape: the corpus collapses to the |days| spine first; each
   * spine day then fans out to its W target days via a broadcast offset
   * frame (W rows) and one |days|·W-bounded aggregate — no window over
   * anything row-sized, no recurrence. Days before the series start
   * contribute zero (the series is zero-extended backward).
   */
  def geometricSmoothing(events: DataFrame, tsCol: String,
      windowDays: Int = 14): DataFrame = {
    require(windowDays >= 1 && windowDays <= 62,
      s"windowDays $windowDays not in [1,62] (2^63 weight overflow above)")
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day")).agg(count(lit(1)).as("__x"))
      // cached: bounds, zero-fill, and the final end-of-series filter all
      // derive from it — one corpus aggregate, not three. Caller-managed
      // lifecycle — see pageRank's contract.
      .cache()
    val bounds = daily.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val filled = bounds
      .select(explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("__x"), lit(0L)).as("__x"))
    val offsets = events.sparkSession.range(0, windowDays)
      .select(col("id").cast("int").as("k"),
        expr(s"shiftleft(1L, ${windowDays - 1} - cast(id AS int))").as("w"))
    val denom = (1L << windowDays) - 1L
    filled.crossJoin(broadcast(offsets))
      .select(expr("date_add(day, k)").as("day"), (col("__x") * col("w")).as("__c"),
        when(col("k") === 0, col("__x")).as("__raw"))
      .groupBy("day")
      .agg(max(col("__raw")).as("n_events"), sum(col("__c")).as("__s"))
      // targets past the series end receive only PARTIAL windows — drop
      // them (they are future days); in-range early days keep the
      // zero-extended semantics
      .join(broadcast(bounds), col("day") <= col("__d1"))
      .select(col("day"), col("n_events"),
        expr(s"__s * 1000000 DIV $denom").as("smooth_ppm"))
      .orderBy("day")
  }

  /**
   * Two-sided-free, one-sided CUSUM drift scan over the daily event
   * series — the SEQUENTIAL drift detector: where [[levelShiftScan]]
   * finds the single best retrospective split and x169 flags individual
   * outlier days, CUSUM accumulates small same-direction deviations until
   * their SUM is undeniable, catching slow upward drifts neither sees.
   * Recurrence-free formulation: `S⁺(t) = max(0, S⁺(t−1) + y_t)` is
   * identically `cum(t) − min(0, min_{j≤t} cum(j))` — a prefix sum and a
   * prefix min over the |days| spine, both bounded windows, no sequential
   * state. All arithmetic in exact ppm of the global mean (`y_t =
   * x_t·1e6 − mean_ppm − slack_ppm`); slack = mean/100, alert threshold =
   * mean/10 (stated tuning constants, the standard "small persistent
   * shift" configuration).
   *
   * Output is EVERY day with its running statistic and an alert flag —
   * never just the alerts, so a quiet series still produces a non-vacuous,
   * oracle-checkable frame.
   */
  def cusumDrift(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day")).agg(count(lit(1)).as("__x"))
    val tot = daily.agg(sum(col("__x")).as("__tot"), count(lit(1)).as("__days"))
    val byDay = BoundedGlobalWindow.orderBy("day")
    daily.crossJoin(broadcast(tot))
      .withColumn("__mean", expr("__tot * 1000000 DIV __days"))
      .withColumn("__y",
        col("__x") * 1000000L - col("__mean") - expr("__mean DIV 100"))
      .withColumn("__cum", sum(col("__y")).over(byDay))
      .withColumn("__rmin", min(col("__cum")).over(byDay))
      .select(col("day"), col("__x").as("n_events"),
        (col("__cum") - least(lit(0L), col("__rmin"))).as("s_pos_ppm"),
        when(col("__cum") - least(lit(0L), col("__rmin")) > expr("__mean DIV 10"),
          1).otherwise(0).as("alert"))
      .orderBy("day")
  }

  /**
   * REVENUE WATERFALL decomposition between two periods, per group — the
   * finance-analytics bridge: Δrevenue split into a VOLUME effect
   * (quantity change at old unit economics, `(q2−q1)·rev1 DIV q1`) and a
   * PRICE/MIX effect (the remainder, `Δrev − volume`), which reconciles
   * EXACTLY by construction — no residual bucket, because price/mix is
   * defined as what volume doesn't explain. Sign-split integral division
   * (`sign · (|q2−q1|·rev1 DIV q1)`) keeps the truncation direction
   * engine-identical — Spark DIV truncates toward zero while SQL `//`
   * floors, and q2 < q1 is routine.
   *
   * Exactness: revenues ride decimal cents end to end; the volume product
   * is staged through DECIMAL(38,0) (qty-delta × period revenue overflows
   * BIGINT at claimed scale). Groups present in only one period
   * contribute with the other side at 0 (full outer join — a vanished
   * brand IS the story).
   */
  def revenueWaterfall(df: DataFrame, groupCol: String, qtyCol: Column,
      revenueCents: Column, periodTwo: Column): DataFrame = {
    def side(p: Boolean, q: String, r: String) = df
      .filter(if (p) periodTwo else !periodTwo)
      .groupBy(col(groupCol))
      .agg(sum(qtyCol.cast("long")).as(q),
        sum(revenueCents.cast("decimal(18,0)")).cast("long").as(r))
    side(false, "q1", "rev1").join(side(true, "q2", "rev2"), Seq(groupCol), "full")
      .select(col(groupCol),
        coalesce(col("q1"), lit(0L)).as("q1"), coalesce(col("q2"), lit(0L)).as("q2"),
        coalesce(col("rev1"), lit(0L)).as("rev1_cents"),
        coalesce(col("rev2"), lit(0L)).as("rev2_cents"))
      .withColumn("delta_cents", col("rev2_cents") - col("rev1_cents"))
      .withColumn("volume_cents", when(col("q1") === 0, lit(0L)).otherwise(
        expr("""CASE WHEN q2 >= q1
          THEN CAST(CAST(q2 - q1 AS DECIMAL(38,0)) * rev1_cents DIV q1 AS BIGINT)
          ELSE -CAST(CAST(q1 - q2 AS DECIMAL(38,0)) * rev1_cents DIV q1 AS BIGINT)
          END""")))
      .withColumn("price_mix_cents", col("delta_cents") - col("volume_cents"))
  }

  /**
   * CROSS-CORRELATION between two event-type daily series at lags
   * −`maxLag`..+`maxLag` — the lead/lag question ("do clicks LEAD
   * purchases, and by how many days?") that [[autocorrelation]] answers
   * only for a series against itself. ccf(L) = Pearson(a(t), b(t+L)) over
   * the SHARED zero-filled calendar (one spine for both series — a day
   * silent in either contributes a 0, not a dropped pair); positive-lag
   * peaks mean `a` leads `b`.
   *
   * Determinism and scale shape inherited verbatim from
   * [[autocorrelation]]: exact decimal moment sums per lag, one fixed
   * double expression per coefficient, exact zero-variance guard → NULL;
   * corpus → |days| spine collapse first, broadcast lag frame, alignment
   * equi-join on `day + lag`, |days|·(2·maxLag+1)-bounded throughout.
   */
  def crossCorrelation(events: DataFrame, tsCol: String, typeCol: String,
      typeA: String, typeB: String, maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 366, s"maxLag $maxLag not in [1,366]")
    val daily = events
      .filter(col(tsCol).isNotNull &&
        (col(typeCol) === typeA || col(typeCol) === typeB))
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(when(col(typeCol) === typeA, 1L).otherwise(0L)).as("__a"),
        sum(when(col(typeCol) === typeB, 1L).otherwise(0L)).as("__b"))
      // cached: bounds + both alignment sides re-read it. Caller-managed
      // lifecycle — see pageRank's contract.
      .cache()
    val bounds = daily.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val filled = bounds
      .select(explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("__a"), lit(0L)).as("__a"),
        coalesce(col("__b"), lit(0L)).as("__b"))
    val lags = events.sparkSession.range(-maxLag, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    val pairs = filled.select(col("day"), col("__a")).as("x")
      .crossJoin(broadcast(lags))
      .join(filled.select(col("day").as("__bd"), col("__b")).as("y"),
        expr("__bd = date_add(day, lag)"))
    val dx = col("__a").cast("decimal(19,0)")
    val dy = col("__b").cast("decimal(19,0)")
    val agg = pairs.groupBy("lag").agg(
      count(lit(1)).as("n_pairs"),
      sum(dx).as("_sx"), sum(dy).as("_sy"),
      sum(dx * dx).as("_sxx"), sum(dy * dy).as("_syy"), sum(dx * dy).as("_sxy"))
    val n = col("n_pairs").cast("double")
    def d(c: String) = col(c).cast("double")
    val va = n * d("_sxx") - d("_sx") * d("_sx")
    val vb = n * d("_syy") - d("_sy") * d("_sy")
    val vaExact = col("n_pairs") * col("_sxx") - col("_sx") * col("_sx")
    val vbExact = col("n_pairs") * col("_syy") - col("_sy") * col("_sy")
    agg.select(col("lag"), col("n_pairs"),
      when(vaExact > 0 && vbExact > 0,
        round((n * d("_sxy") - d("_sx") * d("_sy")) / sqrt(va * vb), 6)).as("ccf"))
      .orderBy("lag")
  }

  /**
   * Month-over-month REVENUE BRIDGE per customer cohort movement — the
   * recurring-revenue decomposition every finance review opens with: this
   * month's revenue change split into NEW (customer absent last month),
   * EXPANSION (spent more), CONTRACTION (spent less, negative), and
   * CHURN (absent this month, negative last-month revenue), reconciling
   * exactly: `Σ effects = revenue(m) − revenue(m−1)` for every month.
   * The revenue counterpart of user-grain growth accounting (x155).
   *
   * Exactness: cents end to end; classification joins current
   * customer-months against last month's shifted by `add_months` (a full
   * outer join — churned customers exist only on the shifted side).
   *
   * Scale shape: one exchange to (customer, month) totals with map-side
   * partials, one hash join on the same key pair, a |months|-bounded
   * rollup. The first observed month reports everything as NEW by
   * construction.
   */
  def revenueBridge(df: DataFrame, custCol: String, tsCol: String,
      amountCents: Column): DataFrame = {
    val cm = df.filter(col(custCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(custCol).as("__c"), trunc(col(tsCol), "month").as("__m"))
      .agg(sum(amountCents.cast("decimal(18,0)")).cast("long").as("__r"))
      // cached: both bridge sides read it. Caller-managed lifecycle — see
      // pageRank's contract.
      .cache()
    val prev = cm.select(col("__c"), expr("add_months(__m, 1)").as("__m"),
      col("__r").as("__rp"))
    // the shift manufactures a phantom month AFTER the horizon where every
    // customer "churns" — clip the bridge to observed months
    val lastM = cm.agg(max(col("__m")).as("__last"))
    cm.join(prev, Seq("__c", "__m"), "full")
      .crossJoin(broadcast(lastM))
      .filter(col("__m") <= col("__last"))
      .groupBy(col("__m").as("month"))
      .agg(
        sum(when(col("__rp").isNull, col("__r")).otherwise(0L)).as("new_cents"),
        sum(when(col("__r").isNotNull && col("__rp").isNotNull &&
          col("__r") > col("__rp"), col("__r") - col("__rp")).otherwise(0L))
          .as("expansion_cents"),
        sum(when(col("__r").isNotNull && col("__rp").isNotNull &&
          col("__r") < col("__rp"), col("__r") - col("__rp")).otherwise(0L))
          .as("contraction_cents"),
        sum(when(col("__r").isNull, -col("__rp")).otherwise(0L)).as("churn_cents"))
      .withColumn("net_change_cents",
        col("new_cents") + col("expansion_cents") + col("contraction_cents") +
          col("churn_cents"))
      .orderBy("month")
  }

  /**
   * OPEN-ORDER BACKLOG curve — how many orders were placed but not yet
   * fully shipped on each calendar day: the operations metric behind
   * "are we falling behind?". An order is open from its placement day
   * through the day its LAST line ships (inclusive); the curve is the
   * running sum of `+1 at placement, −1 the day after completion` over
   * the zero-filled day spine.
   *
   * Scale shape: one exchange collapses lines to per-order
   * (placed, completed) bounds with map-side partials; the delta frame is
   * 2 rows per order, immediately re-collapsed to per-DAY net deltas
   * (|days|-bounded); the cumulative window rides the calendar spine,
   * never an order-sized frame. Orders with any unshipped NULL line are
   * excluded (no completion day exists — stated; an inventory variant
   * would carry them as permanently open).
   */
  def backlogCurve(df: DataFrame, orderCol: String, placedCol: String,
      shippedCol: String): DataFrame = {
    val orders = df
      .filter(col(orderCol).isNotNull && col(placedCol).isNotNull &&
        col(shippedCol).isNotNull)
      .groupBy(col(orderCol))
      .agg(min(to_date(col(placedCol))).as("__p"),
        max(to_date(col(shippedCol))).as("__s"))
      .filter(col("__s") >= col("__p"))
    val deltas = orders.select(col("__p").as("day"), lit(1L).as("__d"))
      .unionAll(orders.select(expr("date_add(__s, 1)").as("day"),
        lit(-1L).as("__d")))
      .groupBy("day").agg(sum(col("__d")).as("__net"))
      // cached: spine bounds + the zero-fill join both read it.
      // Caller-managed lifecycle — see pageRank's contract.
      .cache()
    val bounds = deltas.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    bounds
      .select(explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
      .join(deltas, Seq("day"), "left")
      .withColumn("backlog",
        sum(coalesce(col("__net"), lit(0L))).over(BoundedGlobalWindow.orderBy("day")))
      .select(col("day"), col("backlog"))
      .orderBy("day")
  }

  /**
   * BACKFILL PLANNER — which days' row counts collapsed relative to their
   * own recent history and need regeneration? Each day is compared to the
   * EXACT lower median of its trailing week (the 7 prior days, current
   * day excluded — a failing day must not drag its own baseline), flagged
   * when it delivers under half the expected volume. The data-ops
   * counterpart of [[cusumDrift]]: CUSUM finds slow drifts, this finds
   * the sharp single-day holes a backfill job can actually fix.
   *
   * Exactness: the trailing median is `array_sort(collect_list(...))`
   * over the |days| spine window with the lower-median element picked by
   * index — sorting makes the nondeterministic collect order irrelevant,
   * and the same construction runs verbatim in SQL. Days with fewer than
   * `minHistory` trailing observations report NULL (no baseline, no
   * flag). Ratio in exact ppm.
   */
  def backfillPlan(events: DataFrame, tsCol: String,
      minHistory: Int = 3): DataFrame = {
    require(minHistory >= 1 && minHistory <= 7, s"minHistory $minHistory not in [1,7]")
    val observed = events.filter(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day")).agg(count(lit(1)).as("__n"))
      // cached: bounds + zero-fill both read it. Caller-managed lifecycle
      // — see pageRank's contract.
      .cache()
    val bounds = observed.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    // zero-filled: a day with NO rows at all is the prime backfill
    // candidate — dropping it would hide exactly the hole being hunted
    val daily = bounds
      .select(explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
      .join(observed, Seq("day"), "left")
      .select(col("day"), coalesce(col("__n"), lit(0L)).as("n"))
    val trailing = BoundedGlobalWindow.orderBy("day").rowsBetween(-7, -1)
    daily
      .withColumn("__hist", array_sort(collect_list(col("n")).over(trailing)))
      .withColumn("trailing_median",
        when(size(col("__hist")) >= minHistory,
          expr("element_at(__hist, CAST((size(__hist) + 1) DIV 2 AS INT))")))
      .withColumn("ratio_ppm",
        when(col("trailing_median") > 0,
          expr("n * 1000000 DIV trailing_median")))
      .select(col("day"), col("n"), col("trailing_median"), col("ratio_ppm"),
        when(col("ratio_ppm") < 500000, 1).otherwise(0).as("backfill_flag"))
      .orderBy("day")
  }

  /**
   * RATE-LIMIT violation audit — per hour, how many users exceeded the
   * per-user hourly event quota, and how hard: the abuse/quota census a
   * batch pipeline runs over ingest logs before anyone trusts per-user
   * counts downstream. NULL users are excluded (no quota identity).
   *
   * Scale shape: ONE exchange to (user, hour) counts with map-side
   * partials; the hourly rollup reuses the hour component of the same
   * clustering; output is |hours|-bounded. The quota check is a
   * row-local comparison on the collapsed frame — the corpus is never
   * scanned twice.
   */
  def rateLimitAudit(events: DataFrame, userCol: String, tsCol: String,
      hourlyLimit: Long): DataFrame = {
    require(hourlyLimit >= 1, s"hourlyLimit $hourlyLimit must be positive")
    events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("__n"))
      .groupBy("hour")
      .agg(count(lit(1)).as("n_active_users"),
        sum(when(col("__n") > hourlyLimit, 1L).otherwise(0L)).as("n_violators"),
        sum(when(col("__n") > hourlyLimit, col("__n") - hourlyLimit)
          .otherwise(0L)).as("excess_events"),
        max(col("__n")).as("max_events"))
      .orderBy("hour")
  }

  /**
   * TOP-K CHURN between two scorings of the same bounded item vocabulary
   * — who ENTERED the top k, who EXITED, who STAYED (and how their ranks
   * moved): the leaderboard diff a weekly business review actually reads,
   * where [[rankAgreement]] reports only the aggregate correlation.
   * Ranks are (score DESC, item) row_numbers on each side; items outside
   * a side's top k carry a NULL rank there.
   *
   * PRECONDITION (stated, as in [[rankAgreement]]): bounded vocabulary —
   * the ranking windows run over the item frame. For unbounded item sets
   * feed ranks from [[Sampling.globalRankRange]] instead.
   */
  def topkChurn(prev: DataFrame, cur: DataFrame, itemCol: String,
      scoreCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k $k must be positive")
    def topRanks(df: DataFrame, rk: String) = df
      .select(col(itemCol).as("item"), col(scoreCol).as("__s"))
      .withColumn(rk,
        row_number().over(BoundedGlobalWindow.orderBy(col("__s").desc, col("item"))).cast("long"))
      .filter(col(rk) <= k)
      .select(col("item"), col(rk))
    topRanks(prev, "prev_rank")
      .join(topRanks(cur, "cur_rank"), Seq("item"), "full")
      .select(col("item"),
        when(col("prev_rank").isNull, lit("entered"))
          .when(col("cur_rank").isNull, lit("exited"))
          .otherwise(lit("stayed")).as("status"),
        col("prev_rank"), col("cur_rank"))
      .orderBy(col("status"), coalesce(col("cur_rank"), col("prev_rank")),
        col("item"))
  }

  /**
   * WEEKLY USER CONTINUITY — of each week's active users, how many were
   * already active the PREVIOUS week (ppm): the week-over-week engagement
   * pulse, finer than monthly growth accounting (x155) and blind to
   * volume (a doubling corpus with the same returning share reads flat —
   * by design; continuity is a RATE).
   *
   * Weeks are Monday-started `date_trunc('week')`. Scale shape: one
   * exchange to DISTINCT (user, week), one self-join on
   * (user, week − 7 days) — both sides key-collapsed — and a
   * |weeks|-bounded rollup. The first observed week reports NULL
   * continuity (no previous week exists), never a fake 0.
   */
  def weeklyContinuity(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val uw = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        date_trunc("week", col(tsCol)).cast("date").as("__w"))
      .distinct()
      // cached: both join sides + the first-week bound read it.
      // Caller-managed lifecycle — see pageRank's contract.
      .cache()
    val prev = uw.select(col("__u"), expr("date_add(__w, 7)").as("__w"),
      lit(1L).as("__ret"))
    val firstW = uw.agg(min(col("__w")).as("__w0"))
    uw.join(prev, Seq("__u", "__w"), "left")
      .groupBy(col("__w").as("week"))
      .agg(count(lit(1)).as("n_active"),
        sum(coalesce(col("__ret"), lit(0L))).as("n_returning"))
      .crossJoin(broadcast(firstW))
      .select(col("week"), col("n_active"), col("n_returning"),
        when(col("week") > col("__w0"),
          expr("n_returning * 1000000 DIV n_active")).as("continuity_ppm"))
      .orderBy("week")
  }

  /**
   * SEASONAL-NAIVE FORECAST BACKTEST — the honesty baseline every
   * forecasting effort must beat: predict each day's event count with the
   * count from 7 days earlier, then score the prediction on the days
   * where both exist. Reported per day (actual, forecast, abs error) plus
   * the error in exact ppm of the actual; a model that can't beat
   * last-week-same-day has learned nothing but the calendar.
   *
   * Scale shape: corpus → |days| spine collapse (zero-filled — a silent
   * day is a 0 the forecast must also predict), one self-join on
   * `day − 7`, |days|-bounded output. The first 7 days have no forecast
   * and are excluded (not scored as free zeros).
   */
  def seasonalNaiveBacktest(events: DataFrame, tsCol: String,
      period: Int = 7): DataFrame = {
    require(period >= 1 && period <= 366, s"period $period not in [1,366]")
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day")).agg(count(lit(1)).as("__x"))
      // cached: bounds + zero-fill + both join sides. Caller-managed
      // lifecycle — see pageRank's contract.
      .cache()
    val bounds = daily.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val filled = bounds
      .select(explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("__x"), lit(0L)).as("actual"))
    filled.as("a")
      .join(filled.select(expr(s"date_add(day, $period)").as("day"),
        col("actual").as("forecast")), Seq("day"))
      .select(col("day"), col("actual"), col("forecast"),
        abs(col("actual") - col("forecast")).as("abs_err"),
        when(col("actual") > 0,
          expr("abs(actual - forecast) * 1000000 DIV actual")).as("err_ppm"))
      .orderBy("day")
  }

  /**
   * SHARE-OF-PARENT hierarchical rollup — each leaf's share of its parent
   * AND the parent's share of the grand total, in exact ppm, one row per
   * leaf: the two-level "who carries whom" BI readout (nation within
   * region, region within world) that a flat GROUP BY forces analysts to
   * recompute by hand. Truncating integer division, so per-parent shares
   * sum to ≤ 1e6 with the deficit visible.
   *
   * Scale shape: one exchange to (parent, leaf) sums with map-side
   * partials; parent totals are a parent-bounded re-aggregate joined back
   * by broadcast; the grand total rides a 1-row broadcast. No windows.
   */
  def shareOfParent(df: DataFrame, parentCol: String, leafCol: String,
      measureCents: Column): DataFrame = {
    val leaf = df.filter(col(parentCol).isNotNull && col(leafCol).isNotNull)
      .groupBy(col(parentCol), col(leafCol))
      .agg(sum(measureCents.cast("decimal(18,0)")).cast("long").as("cents"))
    val parents = leaf.groupBy(parentCol)
      .agg(sum(col("cents")).as("__ptot"))
    val total = leaf.agg(sum(col("cents")).as("__gtot"))
    leaf.join(broadcast(parents), Seq(parentCol))
      .crossJoin(broadcast(total))
      .select(col(parentCol), col(leafCol), col("cents"),
        expr("cents * 1000000 DIV __ptot").as("share_of_parent_ppm"),
        expr("__ptot * 1000000 DIV __gtot").as("parent_share_ppm"))
  }

  /**
   * ORDER FILL-RATE bands — service-level census: per order, the share of
   * lines shipped within `slaDays` of placement (in basis points), rolled
   * into five fixed bands (0–25%, …, 75–<100%, exactly-100%) — the
   * "how many orders do we fully serve on time" distribution, readable at
   * a glance where a raw percentile list is not. The 100% band is its own
   * bucket: a fully-served order is a categorically different outcome
   * from a 99% one.
   *
   * Scale shape: one exchange to per-order (total, on-time) counts with
   * map-side partials; banding is row-local; the census is a ≤5-row
   * aggregate.
   */
  def fillRateBands(df: DataFrame, orderCol: String, placedCol: String,
      shippedCol: String, slaDays: Int = 30): DataFrame = {
    require(slaDays >= 0, s"slaDays $slaDays must be non-negative")
    val perOrder = df
      .filter(col(orderCol).isNotNull && col(placedCol).isNotNull &&
        col(shippedCol).isNotNull)
      .groupBy(col(orderCol))
      .agg(count(lit(1)).as("__total"),
        sum(when(to_date(col(shippedCol)) <=
          date_add(to_date(col(placedCol)), slaDays), 1L).otherwise(0L))
          .as("__ontime"))
    perOrder
      .withColumn("__bps", expr("__ontime * 10000 DIV __total"))
      .withColumn("band",
        when(col("__bps") === 10000, lit(4))
          .otherwise(expr("CAST(__bps DIV 2500 AS INT)")))
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"), min(col("__bps")).as("min_bps"),
        max(col("__bps")).as("max_bps"))
      .orderBy("band")
  }

  /**
   * DAILY VWAP deviation scan — the volume-weighted average price per
   * shipping day versus the global VWAP, with days drifting beyond
   * `flagPpm` flagged: the pricing-drift monitor (a mix shift toward
   * premium items and a price change look identical in raw revenue;
   * VWAP separates them from volume). All arithmetic exact:
   * `Σ cents DIV Σ qty` per day and globally, deviation in ppm of the
   * global.
   *
   * Scale shape: one exchange to |days| (cents, qty) sums with map-side
   * partials; the global rides a 1-row broadcast; output |days| rows.
   */
  def vwapDeviation(df: DataFrame, tsCol: String, qty: Column,
      amountCents: Column, flagPpm: Long = 50000L): DataFrame = {
    val daily = df.filter(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(amountCents.cast("decimal(18,0)")).cast("long").as("__c"),
        sum(qty.cast("long")).as("__q"))
      .filter(col("__q") > 0)
      // cached: the global total re-reads it. Caller-managed lifecycle —
      // see pageRank's contract.
      .cache()
    val global = daily.agg(sum(col("__c")).as("__gc"), sum(col("__q")).as("__gq"))
    daily.crossJoin(broadcast(global))
      .select(col("day"), expr("__c DIV __q").as("vwap_cents"),
        expr("__gc DIV __gq").as("global_vwap_cents"),
        expr("abs(__c DIV __q - __gc DIV __gq) * 1000000 DIV (__gc DIV __gq)")
          .as("deviation_ppm"))
      .withColumn("flag", when(col("deviation_ppm") > flagPpm, 1).otherwise(0))
      .orderBy("day")
  }

  /**
   * WEEKDAY-ADJUSTED outlier scan — each day's event count versus the
   * exact lower median of ITS OWN WEEKDAY: the seasonality-aware anomaly
   * gate ("quiet Sunday" is normal; "quiet Tuesday" is an incident) that
   * global z-scores (x169) and trailing windows (x213) both misread on
   * weekly-cyclic traffic. Medians are rank-exact from value-collapsed
   * cumulative counts (the x139/x161 pattern — never a row-sorted
   * window); deviation in exact ppm of the weekday median, days beyond
   * `flagPpm` flagged.
   *
   * Scale shape: corpus → zero-filled |days| spine; the (weekday, value)
   * collapse is ≤ |days| rows with 7-partition windows; the median joins
   * back by broadcast. Output is |days| rows.
   */
  def weekdayAdjustedOutliers(events: DataFrame, tsCol: String,
      flagPpm: Long = 200000L): DataFrame = {
    val daily = events.filter(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day")).agg(count(lit(1)).as("n"))
      // cached: bounds + fill + the weekday median all read it.
      // Caller-managed lifecycle — see pageRank's contract.
      .cache()
    val bounds = daily.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val filled = bounds
      .select(explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"),
        expr("weekday(day)").as("__wd"))
    val collapsed = filled.groupBy("__wd", "n").agg(count(lit(1)).as("__c"))
    val byVal = Window.partitionBy("__wd").orderBy("n")
    val med = collapsed
      .withColumn("__cum", sum(col("__c")).over(byVal))
      .withColumn("__tot", sum(col("__c")).over(Window.partitionBy("__wd")))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy("__wd").agg(min(col("n")).as("wd_median"))
    filled.join(broadcast(med), Seq("__wd"))
      .select(col("day"), col("n"), col("wd_median"),
        when(col("wd_median") > 0,
          expr("abs(n - wd_median) * 1000000 DIV wd_median")).as("dev_ppm"))
      .withColumn("flag",
        when(col("dev_ppm") > flagPpm, 1).otherwise(0))
      .orderBy("day")
  }

  /**
   * TOUCH-DEPTH histogram — how many touches precede a conversion? The
   * distribution behind every attribution model's denominator: depth 0 is
   * the unattributed bucket (conversion with no in-window touches), and a
   * heavy tail means multi-touch models and last-touch will disagree
   * badly — worth knowing BEFORE arguing about credit. Uses the same
   * conversion×touch interval join as x134/x207, collapsed to a
   * per-conversion count and then a depth census.
   *
   * Scale shape: one user-keyed interval join, one per-conversion count
   * (map-side partials), one depth-bounded histogram aggregate.
   */
  def touchDepthHistogram(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, convType: String,
      windowDays: Int = 7): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"), col(userCol).as("cu"), col(tsCol).as("cts"))
    conv.join(events.filter(col(typeCol) =!= convType),
        col("cu") === col(userCol) &&
          col(tsCol) >= col("cts") - expr(s"INTERVAL $windowDays DAYS") &&
          col(tsCol) < col("cts"),
        "left")
      .groupBy("conv_id").agg(count(col(idCol)).as("depth"))
      .groupBy("depth").agg(count(lit(1)).as("n_conversions"))
      .orderBy("depth")
  }

  /**
   * REORDER-ETA projection — for each repeat customer, when is the next
   * order DUE? last order day + the exact lower median of the customer's
   * own inter-order gaps: the replenishment baseline behind churn-risk
   * lists ("14 days past their personal cadence") and inventory
   * forecasts. Median, not mean — one vacation gap would poison a mean
   * cadence for a year.
   *
   * Only customers with at least `minOrders` distinct order DAYS qualify
   * (below that a "cadence" is numerology). The per-customer gap list is
   * bounded by the customer's own order count, so the
   * `array_sort(collect_list(...))` median is per-key-bounded work (the
   * x168 journey-assembly argument), and ties/order sensitivity vanish
   * under the sort.
   *
   * Scale shape: one exchange to distinct (customer, day); the lag
   * window and the gap-list aggregate share that customer partitioning;
   * output ≤ |customers| rows.
   */
  def reorderEta(orders: DataFrame, custCol: String, tsCol: String,
      minOrders: Int = 3): DataFrame = {
    require(minOrders >= 2, s"minOrders $minOrders must be >= 2 (gaps need pairs)")
    val days = orders.filter(col(custCol).isNotNull && col(tsCol).isNotNull)
      .select(col(custCol), to_date(col(tsCol)).as("__d"))
      .distinct()
    val byCust = Window.partitionBy(custCol).orderBy("__d")
    days
      .withColumn("__gap", datediff(col("__d"), lag(col("__d"), 1).over(byCust)))
      .groupBy(col(custCol))
      .agg(count(lit(1)).as("n_order_days"),
        max(col("__d")).as("last_order_day"),
        array_sort(collect_list(col("__gap"))).as("__gaps"))
      .filter(col("n_order_days") >= minOrders)
      .withColumn("median_gap_days",
        expr("CAST(element_at(__gaps, CAST((size(__gaps) + 1) DIV 2 AS INT)) AS BIGINT)"))
      .select(col(custCol), col("n_order_days"), col("last_order_day"),
        col("median_gap_days"),
        expr("date_add(last_order_day, CAST(median_gap_days AS INT))")
          .as("eta_day"))
  }

  /**
   * HHI CONCENTRATION trend — the Herfindahl-Hirschman index of brand
   * revenue share per quarter, in exact ppm-of-ppm units (Σ share_ppm²
   * DIV 1e6; monopoly = 1e6, n equal brands = 1e6/n): the standard
   * concentration metric, tracked over time — x173's top-share answers
   * "how big is the head", HHI answers "how concentrated is the WHOLE
   * distribution", and regulators read the latter.
   *
   * Scale shape: one exchange to (quarter, brand) cents with map-side
   * partials; quarter totals re-aggregate the brand-bounded frame and
   * broadcast; shares and their squares are row-local; output
   * |quarters| rows. Share squares stay ≤ 1e12·|brands| — inside BIGINT.
   */
  def hhiTrend(df: DataFrame, tsCol: String, groupCol: String,
      amountCents: Column): DataFrame = {
    val qb = df.filter(col(tsCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(trunc(col(tsCol), "quarter").as("quarter"), col(groupCol))
      .agg(sum(amountCents.cast("decimal(18,0)")).cast("long").as("__c"))
    val qt = qb.groupBy("quarter").agg(sum(col("__c")).as("__qt"))
    qb.join(broadcast(qt), "quarter")
      .withColumn("__share", expr("__c * 1000000 DIV __qt"))
      .groupBy("quarter")
      .agg(count(lit(1)).as("n_groups"),
        expr("SUM(__share * __share) DIV 1000000").as("hhi_ppm"))
      .orderBy("quarter")
  }

  /**
   * LOG2 (HDR-style) HISTOGRAM of a positive integer measure — the
   * observability workhorse: exponentially-widening buckets cover nine
   * orders of magnitude in ~30 rows with bounded relative error, which is
   * why latency/size/amount telemetry ships as log2 buckets and not
   * equi-width ones. Bucket index = floor(log2(v)), computed EXACTLY as
   * `length(bin(v)) − 1` (the bit length of the value) — never a float
   * log whose boundary behavior differs per engine at exact powers of
   * two. Reports per-bucket count, true min/max, and the closed bucket
   * bounds `[2^b, 2^{b+1})`.
   *
   * Scale shape: one scan, one aggregate bounded by 63 possible buckets;
   * entirely map-side work before the tiny exchange. Non-positive values
   * have no log bucket and are EXCLUDED by contract (count them upstream
   * if they can occur; this corpus's measure is strictly positive).
   */
  def log2Histogram(df: DataFrame, units: Column): DataFrame = {
    val v = units.cast("long")
    df.select(v.as("__v")).filter(col("__v") >= 1)
      .withColumn("bucket", (length(bin(col("__v"))) - 1).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("__v")).as("min_v"),
        max(col("__v")).as("max_v"))
      .select(col("bucket"), expr("shiftleft(1L, bucket)").as("bucket_lo"),
        expr("shiftleft(1L, bucket + 1) - 1").as("bucket_hi"),
        col("n"), col("min_v"), col("max_v"))
      .orderBy("bucket")
  }

  /**
   * OUT-OF-ORDER ARRIVAL audit — how late do events arrive relative to
   * the stream's high-water mark? THE input to choosing a streaming
   * watermark: lateness(e) = max(0, hwm_before(e) − ts(e)) in whole
   * seconds, where hwm_before is the maximum EVENT time over everything
   * that ARRIVED earlier (arrival order = `arrivalCol`, ties broken by
   * `idCol`). Reported as log2 lateness buckets (bucket −1 = on time),
   * so the tail that decides the watermark is visible at any magnitude.
   *
   * Scale shape: the running maximum is the TWO-PHASE range-partitioned
   * prefix MAX ([[peakConcurrency]]'s shape with MAX for SUM):
   * range-exchange on arrival order, pid-local prefix max over rows
   * `(unbounded preceding, 1 preceding)`, plus the exclusive prefix max
   * of per-partition maxima (one row per partition). The bucket rollup
   * is ≤ 64 rows. Never a single-task ORDER BY window.
   */
  def latenessAudit(events: DataFrame, tsCol: String, arrivalCol: String,
      idCol: String): DataFrame = {
    val clean = events
      .filter(col(tsCol).isNotNull && col(arrivalCol).isNotNull && col(idCol).isNotNull)
      // whole seconds since epoch; post-1970 data so DIV == floor
      .select(col(arrivalCol).as("__a"), col(idCol).as("__id"),
        expr(s"unix_micros($tsCol) DIV 1000000").as("__s"))
    val parted = clean.repartitionByRange(col("__a").asc, col("__id").asc)
      .withColumn("pid", spark_partition_id())
    val byArrival = Window.partitionBy("pid").orderBy("__a", "__id")
    val local = parted.withColumn("__lprev",
      max(col("__s")).over(byArrival.rowsBetween(Window.unboundedPreceding, -1)))
    val offsets = local.groupBy("pid").agg(max(col("__s")).as("pmax"))
      .withColumn("omax",
        max(col("pmax")).over(BoundedGlobalWindow.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("pid").as("_off_pid"), col("omax"))
    local.join(broadcast(offsets), col("pid") === col("_off_pid"))
      // unknown hwm (first arrival) coalesces to the row's own ts — a
      // MinValue sentinel would overflow the ANSI subtraction
      .withColumn("__late",
        greatest(lit(0L), greatest(coalesce(col("__lprev"), col("__s")),
          coalesce(col("omax"), col("__s"))) - col("__s")))
      .withColumn("bucket",
        when(col("__late") <= 0, lit(-1))
          .otherwise((length(bin(col("__late"))) - 1).cast("int")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), max(col("__late")).as("max_lateness_s"))
      .orderBy("bucket")
  }

  /**
   * TIME-DECAY multi-touch attribution — the fourth classic credit model
   * (after last-touch x92, linear x134, positional x178): each in-window
   * touch earns weight `1e6 >> min(age_days, 19)` — a power-of-two decay
   * with one-day half-life, EXACT integers, no float exponentials — and
   * every conversion distributes exactly 10000 basis points of credit in
   * proportion (`w·10000 DIV Σw`, integral-division deficit assigned to
   * the MOST RECENT touch, where time-decay's own logic puts it).
   * Conservation `Σbps = 10000 · conversions` holds globally;
   * conversions with no in-window touches land in an explicit
   * "(unattributed)" bucket ([[multiTouchAttribution]]'s contract).
   *
   * Scale shape: identical to x134 — one conversion×touch interval join
   * keyed on the user, per-conversion windows over in-window touches
   * (bounded by the lookback), |types|-bounded rollup.
   */
  def timeDecayAttribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, convType: String,
      windowDays: Int = 7): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"), col(userCol).as("cu"), col(tsCol).as("cts"))
    val touches = conv.join(events.filter(col(typeCol) =!= convType),
        col("cu") === col(userCol) &&
          col(tsCol) >= col("cts") - expr(s"INTERVAL $windowDays DAYS") &&
          col(tsCol) < col("cts"),
        "left")
      .select(col("conv_id"), col(idCol), col(typeCol), col(tsCol), col("cts"))
    val byConv = Window.partitionBy("conv_id")
    val lastFirst = Window.partitionBy("conv_id")
      .orderBy(col(tsCol).desc, col(idCol).desc)
    touches
      .withColumn("__w", when(col(idCol).isNotNull,
        expr(s"shiftright(1000000L, CAST(least(datediff(cts, $tsCol), 19) AS INT))")))
      .withColumn("__sw", sum(col("__w")).over(byConv))
      .withColumn("__fl", expr("__w * 10000 DIV __sw"))
      .withColumn("__sfl", sum(col("__fl")).over(byConv))
      .withColumn("rd", row_number().over(lastFirst))
      .withColumn("touch_type", coalesce(col(typeCol), lit("(unattributed)")))
      .withColumn("bps", when(col(idCol).isNull, lit(10000L))
        .otherwise(col("__fl") +
          when(col("rd") === 1, lit(10000L) - col("__sfl")).otherwise(lit(0L))))
      .groupBy("touch_type")
      .agg(count(col(idCol)).as("n_touches"), sum(col("bps")).as("bps_total"))
  }

  /**
   * PEAK CONCURRENCY per day — the capacity-planning sweep line: model
   * each event as an active interval `[t, t+duration)`, and report, for
   * each day, the maximum number of simultaneously active intervals at
   * any instant (evaluated at interval STARTS, where every peak occurs;
   * the day is the day of the peak's arriving event). Boundary rows are
   * `(+1 at t, −1 at t+duration)`; at an exact tie the −1 sorts first
   * (half-open intervals: a session ending at t has already released its
   * slot), and remaining ties break on the boundary's event id, so the
   * running count is engine-exact.
   *
   * Scale shape: the global running sum is the TWO-PHASE range-partitioned
   * prefix sum ([[Sampling.globalRankRange]]'s shape with SUM of deltas):
   * range-exchange on the sweep order, pid-local cumulative window, plus
   * the exclusive prefix of per-partition delta totals (a
   * one-row-per-partition frame — the only single-partition hop). A naive
   * `SUM OVER (ORDER BY t)` funnels every boundary through one task; this
   * never does.
   */
  def peakConcurrency(events: DataFrame, tsCol: String, idCol: String,
      durationSeconds: Long): DataFrame = {
    require(durationSeconds >= 1, s"durationSeconds $durationSeconds must be positive")
    val clean = events.filter(col(tsCol).isNotNull && col(idCol).isNotNull)
      .select(col(tsCol).as("__ts"), col(idCol).as("__id"))
    val b = clean
      .select(col("__ts").as("t"), lit(1L).as("delta"), col("__id").as("bid"))
      .unionAll(clean.select(
        (col("__ts") + expr(s"interval $durationSeconds seconds")).as("t"),
        lit(-1L).as("delta"), col("__id").as("bid")))
    val keys = Seq(col("t").asc, col("delta").asc, col("bid").asc)
    val parted = b.repartitionByRange(keys: _*).withColumn("pid", spark_partition_id())
    val local = parted.withColumn("lcum",
      sum(col("delta")).over(Window.partitionBy("pid").orderBy(keys: _*)))
    val offsets = local.groupBy("pid").agg(sum(col("delta")).as("ptot"))
      .withColumn("offset", sum(col("ptot")).over(BoundedGlobalWindow.orderBy("pid")) - col("ptot"))
      .select(col("pid").as("_off_pid"), col("offset"))
    local.join(broadcast(offsets), col("pid") === col("_off_pid"))
      .filter(col("delta") === 1)
      .groupBy(to_date(col("t")).as("day"))
      .agg(max(col("offset") + col("lcum")).as("peak_concurrent"))
      .orderBy("day")
  }

  /**
   * COHORT VALUE curve — x65's retention triangle with MONEY in the
   * cells: per (first-active week, week offset), the exact decimal sum
   * of purchase value those cohort members generated that week. The LTV
   * accumulation read ("how much is a January user worth by week 6?")
   * that user-count retention cannot answer — two cohorts can retain
   * identically and monetize completely differently.
   *
   * Scale shape: the first-week frame is one user-keyed MIN; value rows
   * join it on the user key (hash join, both sides user-collapsed or
   * raw-but-keyed); the rollup is |cohorts|·|offsets| rows. Sums ride
   * DECIMAL(18,2) (the dsum determinism argument).
   */
  def cohortValueCurve(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, purchaseType: Column): DataFrame = {
    val clean = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
    val firstWeek = clean.groupBy(userCol)
      .agg(date_trunc("week", min(col(tsCol))).cast("date").as("cohort_week"))
    clean.filter(purchaseType && col(valueCol).isNotNull)
      .select(col(userCol), col(tsCol), col(valueCol))
      .join(firstWeek, userCol)
      .withColumn("week_offset",
        (datediff(date_trunc("week", col(tsCol)).cast("date"),
          col("cohort_week")) / 7).cast("int"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_purchases"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("value_total"))
      .orderBy("cohort_week", "week_offset")
  }

  /**
   * RHYTHM SIMILARITY — pairwise cosine between event types' hourly
   * activity profiles (24 exact integer counts per type): "which
   * behaviors share a daily rhythm" — types that co-move hourly belong
   * to the same user journey; a type whose rhythm matches nothing is
   * batch traffic wearing an event name. Profiles are exact counts, so
   * the only floating point is the final dot/(|a||b|) on integers
   * (the x291 construction on a 24-dim clock).
   *
   * Scale shape: one (type, hour) collapse — map-side partials into a
   * |types|·24 frame; the pair join runs on that bounded frame. Output
   * |types|² / 2 rows.
   */
  def rhythmSimilarity(events: DataFrame, tsCol: String,
      typeCol: String): DataFrame = {
    val prof = events.filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .groupBy(col(typeCol).as("__t"), hour(col(tsCol)).as("__h"))
      .agg(count(lit(1)).as("__n"))
    val norms = prof.groupBy("__t")
      .agg(sum(col("__n").cast("decimal(38,0)") * col("__n")).as("__n2"))
    prof.as("a")
      .join(prof.as("b"),
        col("a.__h") === col("b.__h") && col("a.__t") < col("b.__t"))
      .groupBy(col("a.__t").as("type_1"), col("b.__t").as("type_2"))
      .agg(sum(col("a.__n").cast("decimal(38,0)") * col("b.__n")).as("__dot"))
      .join(norms.select(col("__t").as("type_1"), col("__n2").as("__na")),
        "type_1")
      .join(norms.select(col("__t").as("type_2"), col("__n2").as("__nb")),
        "type_2")
      .select(col("type_1"), col("type_2"),
        round(col("__dot").cast("double")
          / (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))), 6)
          .as("rhythm_cosine"))
      .orderBy("type_1", "type_2")
  }

  /**
   * CONVERSION LATENCY by channel — per first-touch event type: how many
   * users arrived through it, how many ever purchased, and the
   * rank-exact median days from first touch to first purchase. The
   * channel-quality table x250's arrival counts only hint at — a channel
   * can deliver volume that never converts, or few users who convert
   * same-day, and only latency + rate together rank the spend.
   *
   * Scale shape: first touch = one keyed `min(struct)` (the x250 shape);
   * first purchase = one keyed MIN; the join is user-keyed; medians run
   * value-collapsed per |channels|-bounded group
   * ([[lowerMedianByValue]]).
   */
  def conversionLatencyByChannel(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String,
      purchaseType: String): DataFrame = {
    val clean = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull
      && col(idCol).isNotNull && col(typeCol).isNotNull)
    val firstTouch = clean.groupBy(col(userCol))
      .agg(min(struct(col(tsCol).as("ts"), col(idCol).as("id"),
        col(typeCol).as("t"))).as("f"))
      .select(col(userCol), to_date(col("f.ts")).as("__fd"),
        col("f.t").as("channel"))
    val firstPurchase = clean.filter(col(typeCol) === purchaseType)
      .groupBy(col(userCol)).agg(min(to_date(col(tsCol))).as("__pd"))
    val joined = firstTouch.join(firstPurchase, Seq(userCol.toString), "left")
      .withColumn("__gap", datediff(col("__pd"), col("__fd")).cast("long"))
    val meds = lowerMedianByValue(
      joined.filter(col("__gap").isNotNull)
        .select(col("channel"), col("__gap")),
      Seq("channel"), "__gap")
      .select(col("channel"), col("__v").as("median_days_to_purchase"))
    joined.groupBy("channel")
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("__gap").isNotNull, 1L).otherwise(0L)).as("n_converted"))
      .join(meds, Seq("channel"), "left")
      .select(col("channel"), col("n_users"), col("n_converted"),
        expr("n_converted * 1000000 DIV n_users").as("conversion_ppm"),
        coalesce(col("median_days_to_purchase"), lit(-1L))
          .as("median_days_to_purchase"))
      .orderBy("channel")
  }

  /**
   * TIME-TO-SECOND-PURCHASE — whole-day gaps between each buyer's first
   * and second purchase, as a log2-band histogram plus the rank-exact
   * median: the repeat-purchase activation lever ("get them back within
   * N days or lose them") — x159's life table tracks first conversion,
   * this tracks the habit forming AFTER it. One-time buyers are counted
   * separately (they're the population the lever acts on), never mixed
   * into the gap distribution.
   *
   * Scale shape: per-user first/second purchase via one keyed aggregate
   * of (min ts, min-above-min ts) — two MIN structs, no window; the
   * histogram is a ≤16-band rollup and the median runs value-collapsed
   * ([[lowerMedianByValue]]).
   */
  def timeToSecondPurchase(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, purchaseType: String): DataFrame = {
    val p = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull
        && col(typeCol) === purchaseType)
      .select(col(userCol), to_date(col(tsCol)).as("__d"))
    val firsts = p.groupBy(col(userCol)).agg(min(col("__d")).as("__f"))
    val seconds = p.join(firsts, Seq(userCol.toString))
      .filter(col("__d") > col("__f"))
      .groupBy(col(userCol)).agg(min(col("__d")).as("__s"),
        first(col("__f")).as("__f2"))
    val gaps = seconds
      .select(datediff(col("__s"), col("__f2")).cast("long").as("__g"))
    val counts = firsts.agg(count(lit(1)).as("__buyers"))
      .crossJoin(gaps.agg(count(lit(1)).as("__repeat")))
    val med = lowerMedianByValue(gaps, Nil, "__g")
    gaps
      .withColumn("gap_band", (length(bin(col("__g"))) - 1).cast("int"))
      .groupBy("gap_band")
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(counts))
      .crossJoin(broadcast(med.select(col("__v").as("__med"))))
      .select(col("gap_band"), col("n_users"),
        col("__buyers").as("n_buyers_total"),
        col("__repeat").as("n_repeat_buyers"),
        col("__med").as("median_gap_days"))
      .orderBy("gap_band")
  }

  /**
   * CADENCE DISPERSION census — users classified by the dispersion
   * index of their inter-event gaps (D = σ²/μ; Poisson arrivals sit at
   * D ≈ 1): `bursty` (D > 2 — sessions and silences), `poisson_like`,
   * and `metronomic` (D < ½ — schedulers and bots; a TOO-regular "user"
   * is the strongest automation tell). Entirely exact integers by
   * cross-multiplication: with S = Σgap, Q = Σgap², the tests
   * `D > 2 ⟺ n·Q − S² > 2·n·S` and `D < ½ ⟺ 2·(n·Q − S²) < n·S`
   * clear every denominator (the x272 second-moment trick on gaps).
   *
   * Scale shape: one user-partitioned lag (per-key bounded), one
   * user-keyed moment collapse, one 3-row census. Q rides
   * DECIMAL(38,0) (squared second-gaps outrun BIGINT on long
   * histories).
   */
  def cadenceDispersionCensus(events: DataFrame, userCol: String,
      tsCol: String, minEvents: Int = 5): DataFrame = {
    require(minEvents >= 3, s"minEvents $minEvents must be >= 3 (need gaps)")
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol))
    val gaps = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), col(tsCol))
      .withColumn("__g",
        unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(byUser)))
      .filter(col("__g").isNotNull)
    val moments = gaps.groupBy(col(userCol))
      .agg(count(lit(1)).as("__n"),
        sum(col("__g").cast("decimal(38,0)")).as("__s"),
        sum(col("__g").cast("decimal(38,0)") * col("__g")).as("__q"))
      .filter(col("__n") >= minEvents - 1)
      .withColumn("__vn", expr("CAST(__n AS DECIMAL(38,0)) * __q - __s * __s"))
      .withColumn("cadence",
        when(expr("__vn > 2 * CAST(__n AS DECIMAL(38,0)) * __s"), "1_bursty")
          .when(expr("2 * __vn < CAST(__n AS DECIMAL(38,0)) * __s"),
            "3_metronomic")
          .otherwise("2_poisson_like"))
    val tot = moments.agg(count(lit(1)).as("__t"))
    moments.groupBy("cadence")
      .agg(count(lit(1)).as("n_users"), sum(col("__n")).as("n_gaps"))
      .crossJoin(broadcast(tot))
      .select(col("cadence"), col("n_users"), col("n_gaps"),
        expr("n_users * 1000000 DIV __t").as("user_share_ppm"))
      .orderBy("cadence")
  }

  /**
   * OUTAGE STREAK report — per event type: dark days (calendar days with
   * ZERO events inside the stream's own [min, max] span) and the LONGEST
   * consecutive dark run, via the gaps-and-islands identity (day index
   * minus dark-row rank is constant within a run). x202's completeness
   * grid counts the missing cells; the MAX STREAK is the on-call number
   * — one dark day is a blip, nine in a row is an incident, and only
   * the run length distinguishes them.
   *
   * Scale shape: the grid is |types|·|days| (calendar-bounded spine,
   * the b45 shape); all windows partition by type over that bounded
   * frame; daily counts collapse map-side before joining the spine.
   */
  def outageStreaks(events: DataFrame, tsCol: String,
      typeCol: String): DataFrame = {
    val clean = events.filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
    val span = clean.agg(min(to_date(col(tsCol))).as("__lo"),
      max(to_date(col(tsCol))).as("__hi"))
    val spine = span.select(
      explode(expr("sequence(__lo, __hi, interval 1 day)")).as("__d"))
    val types = clean.select(col(typeCol).as("__t")).distinct()
    val daily = clean
      .groupBy(col(typeCol).as("__t"), to_date(col(tsCol)).as("__d"))
      .agg(count(lit(1)).as("__n"))
    val grid = types.crossJoin(spine)
      .join(daily, Seq("__t", "__d"), "left")
      .withColumn("__dark", col("__n").isNull)
    val byType = Window.partitionBy("__t").orderBy("__d")
    val darkRank = Window.partitionBy("__t", "__dark").orderBy("__d")
    val runs = grid
      .withColumn("__i", row_number().over(byType))
      .withColumn("__j", row_number().over(darkRank))
      .filter(col("__dark"))
      .groupBy(col("__t"), (col("__i") - col("__j")).as("__grp"))
      .agg(count(lit(1)).as("__len"))
      .groupBy("__t")
      .agg(sum(col("__len")).as("n_dark_days"),
        max(col("__len")).as("max_dark_streak"))
    types
      .join(runs, Seq("__t"), "left")
      .crossJoin(broadcast(span))
      .select(col("__t").as(typeCol),
        (datediff(col("__hi"), col("__lo")) + 1).cast("long").as("n_days"),
        coalesce(col("n_dark_days"), lit(0L)).as("n_dark_days"),
        coalesce(col("max_dark_streak"), lit(0L)).as("max_dark_streak"))
      .orderBy(typeCol)
  }

  /**
   * SPLIT-SHIPMENT census — orders bucketed by how many DISTINCT ship
   * dates their lines left on, with each bucket's mean fulfillment span
   * in exact milli-days: the logistics fragmentation read ("what share
   * of orders ship whole vs dribble out over a week"), and the cost
   * driver behind per-shipment handling fees. One-date orders define
   * the clean baseline; the span column shows whether multi-date orders
   * split across days or weeks.
   *
   * Scale shape: one order-keyed collapse (distinct dates, min, max
   * with map-side partials), then a small bucket rollup (distinct-date
   * counts are bounded by lines per order). No windows, no joins.
   */
  def splitShipmentCensus(df: DataFrame, orderCol: String,
      shipDateCol: String): DataFrame = {
    val per = df.filter(col(orderCol).isNotNull && col(shipDateCol).isNotNull)
      .groupBy(col(orderCol))
      .agg(countDistinct(to_date(col(shipDateCol))).as("__nd"),
        datediff(max(to_date(col(shipDateCol))), min(to_date(col(shipDateCol))))
          .cast("long").as("__span"))
    val tot = per.agg(count(lit(1)).as("__t"))
    per.groupBy(col("__nd").as("n_ship_dates"))
      .agg(count(lit(1)).as("n_orders"), sum(col("__span")).as("__sumspan"))
      .crossJoin(broadcast(tot))
      .select(col("n_ship_dates"), col("n_orders"),
        expr("__sumspan * 1000 DIV n_orders").as("avg_span_millidays"),
        expr("n_orders * 1000000 DIV __t").as("order_share_ppm"))
      .orderBy("n_ship_dates")
  }

  /**
   * LIFETIME SPAN histogram — users bucketed by the whole-day span
   * between their first and last event (log2 bands; band −1 =
   * single-day users): the engagement-duration distribution, anchored
   * to each user's OWN clock where x65's retention triangle anchors to
   * the calendar. The single-day band is the drive-by share; the tail
   * bands are the durable base — the two numbers a "how sticky is this
   * product really" conversation starts with.
   *
   * Scale shape: one user-keyed (min, max) collapse, then a ≤16-row
   * band rollup. Exact bit-length bands, never a float log.
   */
  def lifetimeSpanHistogram(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val per = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(datediff(max(to_date(col(tsCol))), min(to_date(col(tsCol))))
        .cast("long").as("__span"))
    val tot = per.agg(count(lit(1)).as("__u"))
    per
      .withColumn("span_band",
        when(col("__span") === 0, lit(-1))
          .otherwise(length(bin(col("__span"))) - 1).cast("int"))
      .groupBy("span_band")
      .agg(count(lit(1)).as("n_users"),
        min(col("__span")).as("min_days"), max(col("__span")).as("max_days"))
      .crossJoin(broadcast(tot))
      .select(col("span_band"), col("n_users"), col("min_days"),
        col("max_days"), expr("n_users * 1000000 DIV __u").as("user_share_ppm"))
      .orderBy("span_band")
  }

  /** KEYED two-phase cumulative counts over (__k, __v, __c) rows: the
    * [[cumByValue]] shape with a group key — range-exchange on (key,
    * value) keeps each key's values contiguous and ordered across
    * partitions, pid-local windows partition by (pid, key), and the
    * exclusive prefix runs per key over the |partitions|·|keys|-bounded
    * offsets frame. Per-key CDFs at corpus scale without a per-key
    * single-task sort. */
  private def keyedCumByValue(vals: DataFrame): DataFrame = {
    val parted = vals.repartitionByRange(col("__k"), col("__v"))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid", "__k").orderBy("__v")
    val local = parted.withColumn("__l", sum(col("__c")).over(w))
    val offsets = local.groupBy("__pid", "__k").agg(sum(col("__c")).as("__p"))
      .withColumn("__off",
        sum(col("__p")).over(Window.partitionBy("__k").orderBy("__pid"))
          - col("__p"))
      .select(col("__pid").as("_o_pid"), col("__k").as("_o_k"), col("__off"))
    local.join(broadcast(offsets),
        col("__pid") === col("_o_pid") && col("__k") === col("_o_k"))
      .select(col("__k"), col("__v"), col("__c"),
        (col("__off") + col("__l")).as("__cum"))
  }

  /**
   * TOP-DECILE RETENTION — of each quarter's top-decile spenders, what
   * share are STILL top-decile next quarter? The whale-churn number
   * revenue concentration (x173) makes urgent: if 10 % of customers
   * carry half the revenue, their quarter-over-quarter retention IS the
   * business. The decile cut is rank-exact per quarter
   * (`min{v : 10·cum ≥ 9·n}`, ties included above the cut, stated) via
   * the KEYED two-phase prefix — never a per-quarter single-task sort.
   *
   * Scale shape: one (quarter, customer) spend collapse; per-quarter
   * CDFs ride [[keyedCumByValue]]; membership joins are hash joins on
   * the collapsed frames; output |quarters|−1 rows.
   */
  def topDecileRetention(orders: DataFrame, custCol: String, tsCol: String,
      amountCents: Column): DataFrame = {
    val spend = orders
      .filter(col(custCol).isNotNull && col(tsCol).isNotNull)
      .select(trunc(col(tsCol), "quarter").as("__q"), col(custCol).as("__cust"),
        amountCents.cast("long").as("__a"))
      .filter(col("__a").isNotNull)
      .groupBy("__q", "__cust")
      .agg(sum(col("__a")).as("__v"))
    val vals = spend.groupBy(col("__q").as("__k"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val n = vals.groupBy("__k").agg(sum(col("__c")).as("__n"))
    val cut = keyedCumByValue(vals)
      .join(broadcast(n), "__k")
      .filter(col("__cum") * 10 >= col("__n") * 9)
      .groupBy(col("__k")).agg(min(col("__v")).as("__cut"))
    val top = spend.join(broadcast(cut), col("__q") === col("__k"))
      .filter(col("__v") >= col("__cut"))
      .select(col("__q"), col("__cust"))
    // membership in NEXT quarter's top set, shifted back so the semi-join
    // key is this quarter: (q, cust) ∈ shiftedBack ⟺ cust is top in q+3mo
    val shiftedBack = top.select(add_months(col("__q"), -3).as("__q"),
      col("__cust"))
    val retained = top.join(shiftedBack, Seq("__q", "__cust"), "left_semi")
      .groupBy(col("__q")).agg(count(lit(1)).as("n_retained"))
    val prevCount = top.groupBy(col("__q")).agg(count(lit(1)).as("__ntop"))
    // only quarters whose NEXT quarter is observed get a retention row —
    // the last quarter has nothing to retain into yet
    val observed = top.select(col("__q")).distinct()
    prevCount
      .join(observed.select(add_months(col("__q"), -3).as("__q")).distinct(),
        "__q")
      .join(retained, Seq("__q"), "left")
      .select(col("__q").as("quarter"), col("__ntop").as("n_top_decile"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        expr("coalesce(n_retained, 0L) * 1000000 DIV __ntop")
          .as("retention_ppm"))
      .orderBy("quarter")
  }

  /** Two-phase cumulative counts over (value, count) rows — the x284/
    * peakConcurrency shape factored out: range-exchange on value,
    * pid-local running sums, exclusive prefix of per-partition totals.
    * Returns (__v, __cum) plus the passthrough count column. */
  private def cumByValue(vals: DataFrame): DataFrame = {
    val parted = vals.repartitionByRange(col("__v"))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy("__v")
    val local = parted.withColumn("__l", sum(col("__c")).over(w))
    val offsets = local.groupBy("__pid").agg(sum(col("__c")).as("__p"))
      .withColumn("__off",
        sum(col("__p")).over(BoundedGlobalWindow.orderBy("__pid")) - col("__p"))
      .select(col("__pid").as("_o_pid"), col("__off"))
    local.join(broadcast(offsets), col("__pid") === col("_o_pid"))
      .select(col("__v"), col("__c"), (col("__off") + col("__l")).as("__cum"))
  }

  /**
   * QQ DECILE table — the exact d1…d9 decile values of BOTH arms side by
   * side with their gaps in cents: the whole-curve companion to x284's
   * single KS number ("treatment lifts the median but compresses the
   * top decile" is invisible to both a mean and a max-gap). Decile d =
   * `min{v : 10·cum(v) ≥ d·n}` — the rank-exact lower quantile (the
   * x139 identity at every tenth), no interpolation, defined for any
   * ordered type. Gaps are subtractions, never divisions.
   *
   * Scale shape: per arm, one value collapse + the [[cumByValue]]
   * two-phase prefix; the decile extraction is a constant 9× map-side
   * fan-out filtered and collapsed to 9 rows per arm. Never a
   * single-task value sort.
   */
  def qqDecileTable(df: DataFrame, arm: Column, valueCents: Column): DataFrame = {
    val base = df
      .select(arm.cast("int").as("__a"), valueCents.cast("long").as("__v"))
      .filter(col("__a").isNotNull && col("__v").isNotNull)
    def deciles(a: Int, outCol: String): DataFrame = {
      val vals = base.filter(col("__a") === a)
        .groupBy("__v").agg(count(lit(1)).as("__c"))
      val n = vals.agg(sum(col("__c")).as("__n"))
      cumByValue(vals)
        .crossJoin(broadcast(n))
        .select(col("__v"), col("__cum"), col("__n"),
          explode(expr("sequence(1, 9)")).as("decile"))
        .filter(col("__cum") * 10 >= col("decile") * col("__n"))
        .groupBy("decile").agg(min(col("__v")).as(outCol))
    }
    deciles(0, "v_control").join(deciles(1, "v_treatment"), "decile")
      .select(col("decile"), col("v_control"), col("v_treatment"),
        (col("v_treatment") - col("v_control")).as("gap_cents"))
      .orderBy("decile")
  }

  /**
   * TWO-SAMPLE KS DISTANCE — the exact Kolmogorov-Smirnov statistic
   * between two arms' value distributions: `max_v |F_a(v) − F_b(v)|` in
   * ppm, with the value where the gap peaks. The DISTRIBUTION-level
   * companion to x268's mean CI — two arms can share a mean and differ
   * wildly in shape, and KS is the standard test that sees it. Exact by
   * cross-multiplication: `|cumA·nB − cumB·nA| · 1e6 DIV (nA·nB)` — abs
   * BEFORE the single division, so operands stay positive.
   *
   * Scale shape: one (arm, value) collapse pivoted to per-value arm
   * counts; the cumulative counts ride the TWO-PHASE range-partitioned
   * prefix sum ([[peakConcurrency]]'s shape) — cent-precision values
   * collapse barely below the row count, so a bare value-ordered window
   * would be the single-task funnel this inventory bans; the max is one
   * aggregate row.
   */
  def ksDistance(df: DataFrame, arm: Column, valueCents: Column): DataFrame = {
    val vals = df
      .select(arm.cast("int").as("__a"), valueCents.cast("long").as("__v"))
      .filter(col("__a").isNotNull && col("__v").isNotNull)
      .groupBy("__v")
      .agg(sum(when(col("__a") === 0, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__a") === 1, 1L).otherwise(0L)).as("__cb"))
    val tot = vals.agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"))
    val parted = vals.repartitionByRange(col("__v"))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy("__v")
    val local = parted
      .withColumn("__la", sum(col("__ca")).over(w))
      .withColumn("__lb", sum(col("__cb")).over(w))
    val offsets = local.groupBy("__pid")
      .agg(sum(col("__ca")).as("__pa"), sum(col("__cb")).as("__pb"))
      .withColumn("__offa",
        sum(col("__pa")).over(BoundedGlobalWindow.orderBy("__pid")) - col("__pa"))
      .withColumn("__offb",
        sum(col("__pb")).over(BoundedGlobalWindow.orderBy("__pid")) - col("__pb"))
      .select(col("__pid").as("_o_pid"), col("__offa"), col("__offb"))
    val gaps = local.join(broadcast(offsets), col("__pid") === col("_o_pid"))
      .withColumn("__cuma", col("__offa") + col("__la"))
      .withColumn("__cumb", col("__offb") + col("__lb"))
      .crossJoin(broadcast(tot))
      .withColumn("__gap",
        expr("""CAST(abs(CAST(__cuma AS DECIMAL(38,0)) * __nb
              - CAST(__cumb AS DECIMAL(38,0)) * __na) * 1000000
              DIV (CAST(__na AS DECIMAL(38,0)) * __nb) AS BIGINT)"""))
    gaps.agg(max(col("__na")).as("n_control"),
        max(col("__nb")).as("n_treatment"),
        max(struct(col("__gap").as("g"), (-col("__v")).as("nv"))).as("__best"))
      .select(col("n_control"), col("n_treatment"),
        col("__best.g").as("ks_ppm"), (-col("__best.nv")).as("ks_at_value"))
  }

  /**
   * SPEND TRAJECTORY census — customers classified rising / flat /
   * falling by the SIGN of their own OLS slope over (order index, order
   * cents), rolled into a census with each class's order volume. The
   * sign needs only the slope NUMERATOR `n·Σxy − Σx·Σy` — exact
   * integers, zero divisions (x131 computes full slopes; the census
   * question is cheaper and the sign is division-free by construction).
   * Order index = rank of the order day within the customer (per-key
   * bounded window), so calendars with gaps don't tilt the fit.
   *
   * Scale shape: one customer-partitioned rank window (per-key
   * bounded), one customer-keyed moment collapse, one ≤3-row census.
   * Moments ride DECIMAL(38,0).
   */
  def spendTrajectoryCensus(orders: DataFrame, custCol: String, tsCol: String,
      amountCents: Column, minOrders: Int = 3): DataFrame = {
    require(minOrders >= 2, s"minOrders $minOrders must be >= 2")
    val byCust = Window.partitionBy(custCol)
      .orderBy(col(tsCol), col("__c"))
    val seq0 = orders.filter(col(custCol).isNotNull && col(tsCol).isNotNull)
      .select(col(custCol), col(tsCol), amountCents.cast("long").as("__c"))
      .filter(col("__c").isNotNull)
      .withColumn("__x", row_number().over(byCust).cast("long"))
    val moments = seq0.groupBy(col(custCol))
      .agg(count(lit(1)).as("__n"),
        sum(col("__x")).as("__sx"),
        sum(col("__c").cast("decimal(38,0)")).as("__sy"),
        sum(col("__x").cast("decimal(38,0)") * col("__c")).as("__sxy"))
      .filter(col("__n") >= minOrders)
      .withColumn("__num",
        expr("CAST(__n AS DECIMAL(38,0)) * __sxy - CAST(__sx AS DECIMAL(38,0)) * __sy"))
      .withColumn("trajectory",
        when(col("__num") > 0, "1_rising")
          .when(col("__num") < 0, "2_falling")
          .otherwise("3_flat"))
    val tot = moments.agg(count(lit(1)).as("__t"))
    moments.groupBy("trajectory")
      .agg(count(lit(1)).as("n_customers"), sum(col("__n")).as("n_orders"))
      .crossJoin(broadcast(tot))
      .select(col("trajectory"), col("n_customers"), col("n_orders"),
        expr("n_customers * 1000000 DIV __t").as("share_ppm"))
      .orderBy("trajectory")
  }

  /**
   * ORDER COLLISION census — groups of orders sharing the SAME day and
   * the SAME exact amount but placed by DIFFERENT customers, rolled up
   * by collision size: the shared-identity / split-account / generated-
   * data smell. One customer re-ordering the same amount is normal
   * (x264's territory); three DIFFERENT customers paying an identical
   * odd amount on one day is either a price point (big groups, stable
   * across days) or an integrity problem (sporadic exact collisions) —
   * the census separates the two by shape.
   *
   * Scale shape: one (day, cents) collapse carrying count + distinct
   * customers, then a collision-size rollup — bounded by the largest
   * collision. No joins, no windows.
   */
  def orderCollisionCensus(orders: DataFrame, custCol: String, tsCol: String,
      amountCents: Column): DataFrame = {
    val groups = orders
      .filter(col(custCol).isNotNull && col(tsCol).isNotNull)
      .select(to_date(col(tsCol)).as("__d"),
        amountCents.cast("long").as("__c"), col(custCol))
      .filter(col("__c").isNotNull)
      .groupBy("__d", "__c")
      .agg(count(lit(1)).as("__n"), countDistinct(col(custCol)).as("__nc"))
      .filter(col("__nc") > 1)
    groups.groupBy(col("__nc").as("n_customers"))
      .agg(count(lit(1)).as("n_collision_groups"),
        sum(col("__n")).as("n_orders"))
      .orderBy("n_customers")
  }

  /**
   * DISCOUNT LIFT — per discount level: order-line volume, exact mean
   * quantity in milli units, and the lift versus the zero-discount
   * baseline in ppm: the "does discounting actually move volume" read,
   * computed from the observational table (stated: this is correlation
   * — the causal version is x147/x162's job; this is the curve buyers
   * look at first). Discounts land in exact basis points
   * (`ROUND(d·10000)` — one deterministic float rounding).
   *
   * Scale shape: one collapse to the ≤|distinct discounts| frame with
   * map-side partials; the baseline joins back as a broadcast 1-row
   * frame. Division happens ONCE per band on positive operands.
   */
  def discountLift(df: DataFrame, discountCol: String,
      qtyCol: String): DataFrame = {
    val bands = df
      .filter(col(discountCol).isNotNull && col(qtyCol).isNotNull)
      .select(
        expr(s"CAST(ROUND(CAST($discountCol AS DOUBLE) * 10000) AS BIGINT)")
          .as("discount_bp"),
        expr(s"CAST(ROUND(CAST($qtyCol AS DOUBLE) * 1000) AS BIGINT)")
          .as("__qm"))
      .groupBy("discount_bp")
      .agg(count(lit(1)).as("n_lines"), sum(col("__qm")).as("__sq"))
      .withColumn("avg_qty_milli", expr("__sq DIV n_lines"))
    val base = bands.filter(col("discount_bp") === 0)
      .select(col("avg_qty_milli").as("__base"))
    bands.crossJoin(broadcast(base))
      .select(col("discount_bp"), col("n_lines"), col("avg_qty_milli"),
        // positive-operand division FIRST, subtraction after — a negative
        // numerator would hit Spark-trunc vs DuckDB-floor divergence
        expr("avg_qty_milli * 1000000 DIV __base - 1000000").as("lift_ppm"))
      .orderBy("discount_bp")
  }

  /**
   * TRANSITION DWELL-TIME — for each (from → to) event-type transition:
   * how many happened and the rank-exact MEDIAN seconds between them.
   * x141's transition matrix says WHERE journeys go; this says HOW LONG
   * each hop takes — the timing layer of the journey map ("browse→
   * purchase takes 40 s, error→purchase takes 20 min"), robust to the
   * long-tail gaps a mean would absorb.
   *
   * Scale shape: one user-partitioned lag window builds the hop stream;
   * medians are [[lowerMedianByValue]] partitioned by the
   * |types|²-bounded transition pair — cumulative counts over each
   * pair's DISTINCT gap values (gap seconds are horizon-bounded), never
   * a row-sized sort. Ties in ts order by the id column, so the hop
   * stream is a total order and the answer is exact.
   */
  def transitionDwellMedian(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val hops = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull
        && col(idCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(byUser))
      .withColumn("gap_sec",
        unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(byUser)))
      .filter(col("from_type").isNotNull)
      .select(col("from_type"), col("to_type"), col("gap_sec"))
    lowerMedianByValue(hops, Seq("from_type", "to_type"), "gap_sec")
      .select(col("from_type"), col("to_type"), col("__n").as("n_transitions"),
        col("__v").as("median_gap_sec"))
      .orderBy("from_type", "to_type")
  }

  /**
   * DOUBLE-CHARGE audit — per user, pairs of SAME-AMOUNT purchases
   * within `windowSeconds` of each other: the retry-bug / double-click /
   * double-charge incident detector every payments team runs after a
   * deploy. Consecutive-pair semantics (each purchase pairs with its
   * predecessor in the same (user, amount) stream), so a burst of k
   * rapid retries reports k−1 pairs, not k·(k−1)/2 — the count tracks
   * incidents, not combinatorics. Amounts compare in exact cents
   * (`ROUND(value·100)` — one deterministic float rounding, then pure
   * integers).
   *
   * Scale shape: one lag window partitioned by (user, cents) — per-key
   * bounded — then a user rollup and a top-k that plans as
   * TakeOrderedAndProject. No self-join, nothing pairwise.
   */
  def doubleChargeAudit(events: DataFrame, userCol: String, tsCol: String,
      amount: Column, windowSeconds: Long = 300L, topK: Int = 10): DataFrame = {
    require(windowSeconds >= 1 && topK >= 1, "positive window and topK required")
    val cents = round(amount.cast("double") * 100).cast("long")
    val stream = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), col(tsCol), cents.as("__c"))
      .filter(col("__c").isNotNull)
    val byKey = Window.partitionBy(col(userCol), col("__c")).orderBy(col(tsCol))
    stream
      .withColumn("__gap",
        unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(byKey)))
      .filter(col("__gap").isNotNull && col("__gap") <= windowSeconds)
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_suspect_pairs"),
        countDistinct(col("__c")).as("n_amounts"))
      .orderBy(col("n_suspect_pairs").desc, col(userCol))
      .limit(topK)
  }

  /**
   * POPULARITY AFFINITY by breadth — do broad buyers buy popular items,
   * or do they explore the tail? Customers grouped by how many DISTINCT
   * items they purchase; each group reports the exact mean popularity
   * (distinct buyers) of the items its members buy, in milli units. The
   * degree-degree correlation of the bipartite purchase graph, read as
   * a table instead of one assortativity coefficient — recommender and
   * assortment decisions hang on the shape.
   *
   * Scale shape: one (customer, item) distinct collapse feeds BOTH
   * per-item popularity and per-customer breadth; the popularity joins
   * back on the item key (hash join, both sides collapsed frames); the
   * report is bounded by distinct breadth values. No windows.
   */
  def popularityAffinity(df: DataFrame, custCol: String,
      itemCol: String): DataFrame = {
    val ci = df.filter(col(custCol).isNotNull && col(itemCol).isNotNull)
      .select(col(custCol), col(itemCol)).distinct()
    val pop = ci.groupBy(col(itemCol)).agg(count(lit(1)).as("__pop"))
    val per = ci.join(pop, itemCol)
      .groupBy(col(custCol))
      .agg(count(lit(1)).as("__breadth"), sum(col("__pop")).as("__sp"))
    per.groupBy(col("__breadth").as("n_distinct_items"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("__sp")).as("__tsp"), sum(col("__breadth")).as("__tb"))
      .select(col("n_distinct_items"), col("n_customers"),
        expr("CAST(CAST(__tsp AS DECIMAL(38,0)) * 1000 DIV __tb AS BIGINT)")
          .as("avg_item_popularity_milli"))
      .orderBy("n_distinct_items")
  }

  /**
   * ABC CLASSIFICATION — entities ranked by revenue and split at the
   * classic cumulative-share cuts (A ≤ 80 %, B ≤ 95 %, C the tail),
   * reported as a per-class census: the inventory-management workhorse
   * ("count A-parts, they get daily attention") and the
   * which-fraction-of-keys-carries-the-load question every cache/tier
   * decision asks. An entity straddling a boundary lands in the LATER
   * class (classification by its own inclusive cumulative share) —
   * stated, deterministic, engine-identical.
   *
   * Scale shape: one entity-keyed revenue collapse, then the cumulative
   * share rides the TWO-PHASE range-partitioned prefix sum
   * ([[Sampling.globalRankRange]]'s shape): range-exchange on
   * (revenue desc, key), pid-local running sums, exclusive prefix of
   * per-partition totals — never a single-task `SUM OVER (ORDER BY)`
   * over the entity frame. Share numerators ride DECIMAL(38,0).
   */
  def abcClassification(df: DataFrame, keyCol: String,
      amountCents: Column): DataFrame = {
    val per = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sum(amountCents.cast("decimal(18,0)")).cast("long").as("__rev"))
    val keys = Seq(col("__rev").desc, col(keyCol).asc)
    val parted = per.repartitionByRange(keys: _*)
      .withColumn("__pid", spark_partition_id())
    val local = parted.withColumn("__lcum",
      sum(col("__rev")).over(Window.partitionBy("__pid").orderBy(keys: _*)))
    val offsets = local.groupBy("__pid").agg(sum(col("__rev")).as("__ptot"))
      .withColumn("__off",
        sum(col("__ptot")).over(BoundedGlobalWindow.orderBy("__pid")) - col("__ptot"))
      .select(col("__pid").as("_o_pid"), col("__off"))
    val tot = per.agg(sum(col("__rev")).as("__tot"))
    local.join(broadcast(offsets), col("__pid") === col("_o_pid"))
      .crossJoin(broadcast(tot))
      .withColumn("__cum_ppm",
        expr("CAST(CAST(__off + __lcum AS DECIMAL(38,0)) * 1000000 DIV __tot AS BIGINT)"))
      .withColumn("abc_class",
        when(col("__cum_ppm") <= 800000, "A")
          .when(col("__cum_ppm") <= 950000, "B")
          .otherwise("C"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_entities"), sum(col("__rev")).as("class_revenue"))
      .crossJoin(broadcast(tot))
      .select(col("abc_class"), col("n_entities"), col("class_revenue"),
        expr("CAST(CAST(class_revenue AS DECIMAL(38,0)) * 1000000 DIV __tot AS BIGINT)")
          .as("revenue_share_ppm"))
      .orderBy("abc_class")
  }

  /**
   * MEDIAN DAILY-DELTA trend — per event type, the median of day-over-day
   * count changes between consecutive OBSERVED days: the robust trend
   * read. One viral day wrecks an OLS slope (x131) and a mean delta; the
   * median delta shrugs it off and answers "is this stream structurally
   * growing, flat, or decaying". Median = lower median of the sorted
   * per-type delta list (per-key bounded by the calendar, the x238
   * convention).
   *
   * Scale shape: one (type, day) count collapse; the lag window
   * partitions by type over the calendar-bounded daily frame; the median
   * sorts a per-type array bounded by |days|. Nothing row-sized is
   * windowed or sorted.
   */
  def medianDeltaTrend(events: DataFrame, tsCol: String,
      typeCol: String): DataFrame = {
    val daily = events.filter(col(tsCol).isNotNull && col(typeCol).isNotNull)
      .groupBy(col(typeCol), to_date(col(tsCol)).as("__d"))
      .agg(count(lit(1)).as("__n"))
    val byType = Window.partitionBy(typeCol).orderBy("__d")
    daily
      .withColumn("__delta", col("__n") - lag(col("__n"), 1).over(byType))
      .groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_days"),
        array_sort(collect_list(col("__delta"))).as("__ds"))
      .filter(size(col("__ds")) > 0)
      .select(col(typeCol), col("n_days"),
        expr("CAST(element_at(__ds, CAST((size(__ds) + 1) DIV 2 AS INT)) AS BIGINT)")
          .as("median_daily_delta"))
      .orderBy(typeCol)
  }

  /**
   * PRICE-ENDING census — the top-k cents endings (amount mod 100) with
   * exact ppm share: charm-pricing / hand-keyed-amount fingerprinting.
   * Organic machine-generated amounts spread endings near-uniformly
   * (~10 000 ppm each); a spike at .99/.00/.95 is human price-setting,
   * and a spike at an arbitrary ending is a duplicated transaction or a
   * unit bug. Complements x143: Benford reads the LEADING digit's
   * natural-growth law, this reads the TRAILING digits' human
   * fingerprint.
   *
   * Scale shape: one map-side mod + a ≤100-row aggregate, a broadcast
   * 1-row total, and a top-k that plans as TakeOrderedAndProject.
   */
  def priceEndingCensus(df: DataFrame, amountCents: Column,
      topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK $topK must be positive")
    val e = df.select(pmod(amountCents.cast("long"), lit(100L)).as("ending"))
      .filter(col("ending").isNotNull)
      .groupBy("ending").agg(count(lit(1)).as("n"))
    val tot = e.agg(sum(col("n")).as("__t"))
    e.crossJoin(broadcast(tot))
      .select(col("ending"), col("n"),
        expr("n * 1000000 DIV __t").as("share_ppm"))
      .orderBy(col("n").desc, col("ending"))
      .limit(topK)
  }

  /**
   * RETENTION HALF-LIFE — per weekly cohort: its size and the first week
   * offset where retention falls BELOW half the cohort (−1 = never did
   * within the observed horizon). The one-number-per-cohort compression
   * of the x65 retention triangle that product teams actually track
   * ("is half-life improving release over release?"), computed exactly:
   * `min{offset > 0 : 2·retained < size}`.
   *
   * Scale shape: reuses [[cohortRetention]] (two user-keyed collapses);
   * the half-life MIN is a filtered aggregate over the |cohorts|·|offsets|
   * retention frame joined back to the offset-0 spine. No windows.
   */
  def retentionHalfLife(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val cr = cohortRetention(
      events.filter(col(userCol).isNotNull && col(tsCol).isNotNull),
      userCol, tsCol)
    val size = cr.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    val hl = cr.join(size, "cohort_week")
      .filter(col("week_offset") > 0 && col("n_users") * 2 < col("cohort_size"))
      .groupBy("cohort_week")
      .agg(min(col("week_offset")).as("__hl"))
    size.join(hl, Seq("cohort_week"), "left")
      .select(col("cohort_week"), col("cohort_size"),
        coalesce(col("__hl"), lit(-1)).cast("int").as("half_life_weeks"))
      .orderBy("cohort_week")
  }

  /**
   * DAU/MAU STICKINESS — per month: monthly actives, the exact mean
   * daily actives, and stickiness = avg DAU / MAU in ppm, floored ONCE
   * (`Σdau · 1e6 DIV (n_days · mau)` — a single integer division, not a
   * div-of-divs that compounds floors). The canonical product-health
   * ratio: 1e6 = everyone active every active day; ~33k = monthly users
   * touch the product one day in thirty.
   *
   * Scale shape: one (day, user) distinct collapse; DAU is a |days|-row
   * count over it, MAU a second distinct over the already-collapsed
   * frame; the rollup is |months| rows. Never a row-sized window.
   */
  def stickiness(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val dayUser = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(to_date(col(tsCol)).as("__d"), col(userCol).as("__u"))
      .distinct()
    val dau = dayUser.groupBy("__d").agg(count(lit(1)).as("__dau"))
      .groupBy(trunc(col("__d"), "month").as("month"))
      .agg(count(lit(1)).as("n_active_days"), sum(col("__dau")).as("__sum_dau"))
    val mau = dayUser
      .select(trunc(col("__d"), "month").as("month"), col("__u"))
      .distinct()
      .groupBy("month").agg(count(lit(1)).as("mau"))
    dau.join(mau, "month")
      .select(col("month"), col("n_active_days"), col("mau"),
        expr("__sum_dau DIV n_active_days").as("avg_dau"),
        expr("CAST(CAST(__sum_dau AS DECIMAL(38,0)) * 1000000" +
          " DIV (CAST(n_active_days AS DECIMAL(38,0)) * mau) AS BIGINT)")
          .as("stickiness_ppm"))
      .orderBy("month")
  }

  /**
   * SINGLE-SOURCE DEPENDENCY census — how concentrated is each part's
   * supply on its top supplier? Parts roll into top-supplier-share bands
   * (≤25 % = well diversified … >90 % = effectively single-sourced): the
   * supply-chain risk histogram, and the same shape as a data-pipeline's
   * "is this entity's evidence all from one source?" check. Exact
   * integer shares; the top supplier is a MAX over per-supplier counts
   * (value-only, so ties need no break).
   *
   * Scale shape: one (part, supplier) count collapse, one part-keyed
   * re-aggregate of that collapsed frame (both with map-side partials),
   * then a ≤5-row band rollup. No windows, no joins.
   */
  def singleSourceCensus(df: DataFrame, entityCol: String,
      sourceCol: String): DataFrame = {
    val ps = df.filter(col(entityCol).isNotNull && col(sourceCol).isNotNull)
      .groupBy(col(entityCol), col(sourceCol))
      .agg(count(lit(1)).as("__n"))
    val per = ps.groupBy(col(entityCol))
      .agg(count(lit(1)).as("__nsrc"), sum(col("__n")).as("__tot"),
        max(col("__n")).as("__top"))
      .withColumn("__share", expr("__top * 1000000 DIV __tot"))
    per
      .withColumn("band",
        when(col("__share") <= 250000, "1_under_25pct")
          .when(col("__share") <= 500000, "2_under_50pct")
          .when(col("__share") <= 750000, "3_under_75pct")
          .when(col("__share") <= 900000, "4_under_90pct")
          .otherwise("5_over_90pct"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_entities"),
        min(col("__share")).as("min_share_ppm"),
        max(col("__share")).as("max_share_ppm"),
        sum(col("__nsrc")).as("total_sources"))
      .orderBy("band")
  }

  /**
   * FIRST-TOUCH ACQUISITION MIX — per month, how many users had their
   * FIRST-EVER event in each event type, with the month's share in ppm:
   * the acquisition-channel trend ("are this quarter's new users arriving
   * through search or checkout?"). First event = minimum (ts, event id)
   * — the id breaks timestamp ties so the answer is exact, not
   * first-row-wins.
   *
   * Scale shape: ONE user-keyed aggregate — `min(struct(ts, id, type))`
   * resolves the first event map-side with no window and no second scan
   * (the id is unique per event, so `type` never participates in the
   * comparison); the month×type rollup and broadcast month totals are
   * |months|·|types| rows.
   */
  def firstTouchMix(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val firsts = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull
        && col(idCol).isNotNull && col(typeCol).isNotNull)
      .groupBy(col(userCol))
      .agg(min(struct(col(tsCol).as("ts"), col(idCol).as("id"),
        col(typeCol).as("t"))).as("f"))
      .select(to_date(date_trunc("month", col("f.ts"))).as("month"),
        col("f.t").as(typeCol))
    val m = firsts.groupBy("month", typeCol)
      .agg(count(lit(1)).as("n_new_users"))
    val tot = m.groupBy("month").agg(sum(col("n_new_users")).as("__tot"))
    m.join(broadcast(tot), "month")
      .select(col("month"), col(typeCol), col("n_new_users"),
        expr("n_new_users * 1000000 DIV __tot").as("share_ppm"))
      .orderBy("month", typeCol)
  }

  /**
   * ORDER-COUNT SURVIVAL curve — for each observed per-customer order
   * count k: customers with EXACTLY k and with AT LEAST k orders, plus
   * the at-least share in ppm. The engagement-depth distribution behind
   * "what fraction of the base are repeat customers?" — a survival curve
   * over counts, where x159's life table follows conversion over TIME.
   *
   * Scale shape: one customer-keyed count, collapsed to (count, freq) —
   * the survival cumulative runs over the DISTINCT-COUNT frame, bounded
   * by the maximum orders any single customer has (per-key cardinality,
   * not corpus size — the x139/x161 value-collapse discipline), so the
   * unpartitioned window is bin-bounded by construction.
   */
  def orderCountSurvival(orders: DataFrame, custCol: String): DataFrame = {
    val perCust = orders.filter(col(custCol).isNotNull)
      .groupBy(col(custCol)).agg(count(lit(1)).as("__n"))
    val dist = perCust.groupBy(col("__n").as("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
    val cum = BoundedGlobalWindow.orderBy(col("n_orders").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = dist.agg(sum(col("n_customers")).as("__tot"))
    dist.withColumn("n_at_least", sum(col("n_customers")).over(cum))
      .crossJoin(broadcast(tot))
      .select(col("n_orders"), col("n_customers"), col("n_at_least"),
        expr("n_at_least * 1000000 DIV __tot").as("at_least_ppm"))
      .orderBy("n_orders")
  }

  /**
   * CHI-SQUARE INDEPENDENCE audit of two categorical columns — the
   * per-cell contingency table with exact-integer expected counts and χ²
   * contributions: `contrib = (O·N − RT·CT)² DIV (N·RT·CT)` in micro
   * units, which is algebraically `(O−E)²/E` with E = RT·CT/N cleared of
   * fractions. Large contributions point at the cells DRIVING the
   * association ("which segment over-orders which priority"), which a
   * single global p-value hides. Everything is integer: `expected_milli`
   * is `RT·CT·1000 DIV N` and contributions floor per cell (documented —
   * both engines floor identically).
   *
   * Scale shape: one exchange to the (a, b) contingency cells with
   * map-side partials; marginals re-aggregate the cell-bounded frame and
   * broadcast back; output |a|·|b| rows. The numerator `(O·N − RT·CT)²`
   * reaches N⁴ at corpus scale, so it rides DECIMAL(38,0) (exact to
   * 10^38 — N up to ~3·10^9 rows) rather than BIGINT (overflows at
   * N ≈ 55k).
   */
  def chiSquareAudit(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("observed"))
    val aTot = cells.groupBy(aCol).agg(sum(col("observed")).as("__rt"))
    val bTot = cells.groupBy(bCol).agg(sum(col("observed")).as("__ct"))
    val nTot = cells.agg(sum(col("observed")).as("__n"))
    cells
      .join(broadcast(aTot), aCol).join(broadcast(bTot), bCol)
      .crossJoin(broadcast(nTot))
      .select(col(aCol), col(bCol), col("observed"),
        expr("CAST(CAST(__rt AS DECIMAL(38,0)) * __ct * 1000 DIV __n AS BIGINT)")
          .as("expected_milli"),
        expr("""CAST(
            (CAST(observed AS DECIMAL(38,0)) * __n - CAST(__rt AS DECIMAL(38,0)) * __ct)
          * (CAST(observed AS DECIMAL(38,0)) * __n - CAST(__rt AS DECIMAL(38,0)) * __ct)
          * 1000000
          DIV (CAST(__n AS DECIMAL(38,0)) * __rt * __ct) AS BIGINT)""")
          .as("contrib_micro"))
      .orderBy(aCol, bCol)
  }

  /**
   * SESSION GAP-THRESHOLD sweep — session counts and mean session depth
   * at several inactivity thresholds in ONE pass over the per-user gap
   * sequence: `n_sessions(τ) = |users| + |gaps > τ|`, because every user
   * opens one session and each over-threshold gap opens exactly one
   * more. This is the τ-choosing curve for sessionization (x81 fixes one
   * τ; picking it blind is how "sessions" become noise) — the elbow
   * where n_sessions stops falling is the natural gap.
   *
   * Scale shape: one user-partitioned lag window (per-key bounded), one
   * aggregate computing every threshold's conditional count
   * simultaneously (map-side partials), then a |thresholds|-row unpivot.
   * The sweep adds NO second scan over the corpus — cost is identical
   * to sessionizing once.
   */
  def sessionGapSweep(events: DataFrame, userCol: String, tsCol: String,
      thresholdsSec: Seq[Long]): DataFrame = {
    require(thresholdsSec.nonEmpty, "sessionGapSweep needs at least one threshold")
    // lag over ts alone is safe: among tied timestamps every ordering
    // yields the same gap MULTISET (ties chain as zero gaps), and only
    // the multiset feeds the threshold counts.
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol))
    val gaps = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), col(tsCol))
      .withColumn("__gap",
        unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(byUser)))
    val sums = thresholdsSec.sorted.map { t =>
      sum(when(col("__gap") > t, 1L).otherwise(0L)).as(s"__x$t")
    }
    val aggs = count(lit(1)).as("__events") +: sums
    val base = gaps.agg(countDistinct(col(userCol)).as("__u"), aggs: _*)
    val stacked = thresholdsSec.sorted
      .map(t => s"${t}L, __x$t").mkString(", ")
    base.select(expr(
        s"stack(${thresholdsSec.size}, $stacked) AS (threshold_sec, __extra)"),
        col("__u"), col("__events"))
      .select(col("threshold_sec"),
        (col("__u") + col("__extra")).as("n_sessions"),
        expr("__events * 1000 DIV (__u + __extra)").as("events_per_session_milli"))
      .orderBy("threshold_sec")
  }

  /**
   * CATEGORICAL MIX DRIFT — period-over-period L1 distance between a
   * categorical column's share vectors (exact integer ppm): the
   * distribution-drift monitor for LABELS (x157 watches schema, x247
   * watches embeddings; this watches a category mix). A period×category
   * SPINE zero-fills absent cells so a category that vanishes counts its
   * full share as drift; the lag is against the previous OBSERVED
   * period. Output: (periodCol, l1_drift_ppm, n_categories), one row per
   * period after the first.
   *
   * Scale shape: one exchange for the (period, category) collapse (map-
   * side partial counts); everything after is |periods × categories|-
   * bounded — the spine cross-join broadcasts the category side and the
   * lag window partitions by CATEGORY (category-bounded frames, never
   * row-sized).
   */
  def categoricalMixDrift(df: DataFrame, periodCol: String,
      catCol: String): DataFrame = {
    val cell = df
      .filter(col(periodCol).isNotNull && col(catCol).isNotNull)
      .groupBy(col(periodCol), col(catCol).as("__p"))
      .agg(count(lit(1)).as("__n"))
    val perTot = cell.groupBy(periodCol).agg(sum(col("__n")).as("__t"))
    val share = cell.join(perTot, periodCol)
      .select(col(periodCol), col("__p"),
        expr("__n * 1000000 DIV __t").as("__s"))
    val spine = perTot.select(periodCol)
      .crossJoin(broadcast(cell.select("__p").distinct()))
    val w = Window.partitionBy("__p").orderBy(periodCol)
    spine.join(share, Seq(periodCol, "__p"), "left")
      .select(col(periodCol), col("__p"),
        coalesce(col("__s"), lit(0L)).as("__s"))
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(periodCol)
      .agg(sum(abs(col("__s") - col("__prev"))).as("l1_drift_ppm"),
        count(lit(1)).as("n_categories"))
      .orderBy(periodCol)
  }

  /**
   * SPEND-DECILE MIGRATION — the year-over-year customer-value
   * transition matrix: each customer's annual spend decile vs their
   * decile the NEXT year, counted over every adjacent year pair — the
   * revenue-planning answer to "do whales stay whales?" that a scalar
   * retention rate ([[topDecileRetention]]) compresses away.
   *
   * Deciles come from the keyed two-phase CDF ([[keyedCumByValue]]):
   * collapse to (year, value, count), range-partitioned prefix sums,
   * decile = `(cum−1)·10 DIV n + 1` — max-rank ties share a decile, so
   * both engines agree and no year ever funnels through a single-task
   * sort. The matrix itself is ≤ 100 cells.
   *
   * Output: (from_decile, to_decile, n_customers, share_ppm) with share
   * of the from-decile row total; only customers present in both years
   * of a pair are counted (stated, not hidden).
   */
  def decileMigration(orders: DataFrame, custCol: String, tsCol: String,
      amountCents: Column): DataFrame = {
    val spend = orders
      .filter(col(custCol).isNotNull && col(tsCol).isNotNull)
      .select(year(to_date(col(tsCol))).as("__k"), col(custCol).as("__cust"),
        amountCents.cast("long").as("__a"))
      .filter(col("__a").isNotNull)
      .groupBy("__k", "__cust").agg(sum(col("__a")).as("__v"))
    val vals = spend.groupBy("__k", "__v").agg(count(lit(1)).as("__c"))
    val n = vals.groupBy("__k").agg(sum(col("__c")).as("__n"))
    val dec = keyedCumByValue(vals)
      .join(broadcast(n), "__k")
      .select(col("__k"), col("__v"),
        (expr("(__cum - 1) * 10 DIV __n") + 1).cast("int").as("__d"))
    val labeled = spend.join(dec, Seq("__k", "__v"))
      .select(col("__k"), col("__cust"), col("__d"))
    val next = labeled.select((col("__k") - 1).as("__k"), col("__cust"),
      col("__d").as("__d2"))
    val trans = labeled.join(next, Seq("__k", "__cust"))
      .groupBy(col("__d").as("from_decile"), col("__d2").as("to_decile"))
      .agg(count(lit(1)).as("n_customers"))
    val fromTot = trans.groupBy("from_decile")
      .agg(sum(col("n_customers")).as("__t"))
    trans.join(fromTot, "from_decile")
      .select(col("from_decile"), col("to_decile"), col("n_customers"),
        expr("n_customers * 1000000 DIV __t").as("share_ppm"))
      .orderBy("from_decile", "to_decile")
  }

  /**
   * ISOTONIC REGRESSION of a binary rate over an ordered band axis — the
   * monotone calibration fit (pool-adjacent-violators semantics) every
   * score-calibration stage needs: the fitted curve is the closest
   * non-decreasing rate to the observed per-band rates under squared
   * error. Computed via the exact min-max closed form (Barlow et al.
   * '72, public): fit(t) = max_{i≤t} min_{j≥t} mean(i..j) — equivalent
   * to PAV, but expressible as bounded windows instead of a sequential
   * pool merge, which is what makes it a Spark plan.
   *
   * `bands` must be a BOUNDED frame (one row per band: ordinal band
   * key, successes, trials) — the pair frame is bands², never
   * corpus-sized; corpus size enters only through the upstream
   * aggregation that produced the band frame. Determinism contract:
   * segment means are floored to ppm BEFORE the min/max lattice (the
   * micro-rounding discipline of x43) — max-of-min preserves
   * monotonicity regardless of rounding, so the fit is still a valid
   * isotonic curve and bit-exact in any engine.
   */
  def isotonicRateFit(bands: DataFrame, bandCol: String, successCol: String,
      trialCol: String): DataFrame = {
    val b = bands.select(col(bandCol).cast("long").as("__b"),
      col(successCol).cast("long").as("__s"), col(trialCol).cast("long").as("__n"))
    val csum = b
      .withColumn("__cs", sum(col("__s")).over(BoundedGlobalWindow.orderBy("__b")))
      .withColumn("__cn", sum(col("__n")).over(BoundedGlobalWindow.orderBy("__b")))
    val lo = csum.select(col("__b").as("__i"),
      (col("__cs") - col("__s")).as("__ps"), (col("__cn") - col("__n")).as("__pn"))
    val hi = csum.select(col("__b").as("__j"), col("__cs"), col("__cn"))
    val pairs = lo.join(hi, col("__i") <= col("__j"))
      .select(col("__i"), col("__j"),
        expr("(__cs - __ps) * 1000000 DIV (__cn - __pn)").as("__mean"))
    // suffix min over j within each i: min_{j' >= j} mean(i..j')
    val sm = pairs.withColumn("__sm", min(col("__mean")).over(
      Window.partitionBy("__i").orderBy(col("__j").desc)
        .rowsBetween(Window.unboundedPreceding, 0)))
    val fit = sm.groupBy(col("__j").as("__b"))
      .agg(max(col("__sm")).as("isotonic_rate_ppm"))
    b.join(fit, "__b")
      .select(col("__b").as("band"), col("__n").as("n_trials"),
        col("__s").as("n_successes"),
        expr("__s * 1000000 DIV __n").as("raw_rate_ppm"),
        col("isotonic_rate_ppm"))
      .orderBy("band")
  }

  /**
   * MANN-KENDALL trend test over a bounded keyed series — the
   * distribution-free monotone-trend statistic (Mann '45, Kendall '75,
   * public): S = Σ_{i<j} sign(x_j − x_i) over time order, with the
   * tie-corrected variance numerator 18·Var(S) = n(n−1)(2n+5) −
   * Σ_t t(t−1)(2t+5). The trend verdict compares |S|−1 (continuity
   * correction) against z·sqrt(Var) at z = 1.96, evaluated as the
   * engine-exact integer inequality (|S|−1)²·18·100 > 384·varNum
   * (1.96² = 3.8416 → ·10⁴ scaling kept integral) — no IEEE sqrt in
   * the verdict at all.
   *
   * Scale shape: the series must be period-collapsed upstream (months,
   * weeks) so the pair self-join is periods² per key — bounded by the
   * calendar, never by rows; the sign pairs collapse to one row per key.
   */
  def mannKendallTrend(series: DataFrame, keyCol: String, tCol: String,
      valueCol: String): DataFrame = {
    val s = series.select(col(keyCol).as("__k"), col(tCol).as("__t"),
      col(valueCol).cast("long").as("__x"))
    val pairs = s.as("a").join(s.as("b"),
        col("a.__k") === col("b.__k") && col("a.__t") < col("b.__t"))
      .select(col("a.__k").as("__k"),
        signum(col("b.__x") - col("a.__x")).cast("long").as("__sgn"))
    val sStat = pairs.groupBy("__k").agg(sum(col("__sgn")).as("s_stat"),
      count(lit(1)).as("__np"))
    val ties = s.groupBy("__k", "__x").agg(count(lit(1)).as("__tc"))
      .groupBy("__k").agg(count(lit(1)).as("__nv"), sum(col("__tc")).as("__n"),
        sum(expr("__tc * (__tc - 1) * (2 * __tc + 5)")).as("__tieSum"))
    sStat.join(ties, "__k")
      .select(col("__k").as(keyCol), col("__n").as("n_periods"),
        col("s_stat"),
        expr("__n * (__n - 1) * (2 * __n + 5) - __tieSum").as("var18_num"))
      .withColumn("trend",
        when(col("s_stat") === 0, lit("none"))
          .when(expr("(abs(s_stat) - 1) * (abs(s_stat) - 1) * 180000") >
              expr("38416 * var18_num"),
            when(col("s_stat") > 0, lit("increasing")).otherwise(lit("decreasing")))
          .otherwise(lit("none")))
      .orderBy(keyCol)
  }

  /**
   * THEIL–SEN robust slope over a period-collapsed series — the median
   * of all pairwise slopes (Theil '50, Sen '68, public), immune to the
   * outlier days that bend an OLS fit. Slopes are exact micro-units per
   * day via floor division toward −∞ (FLOOR semantics stated: Spark's
   * DIV truncates toward zero, so negatives route through the explicit
   * floor form to match the oracle's //); the median is the lower
   * median by value collapse, never a row sort. Reported next to the
   * OLS slope (division-free cross-moment form, micro/day) so the
   * robustness gap is a measured number.
   *
   * Scale shape: series is period-collapsed upstream (n periods → n²/2
   * pair rows, calendar-bounded); the slope median collapses by value.
   */
  def theilSenSlope(series: DataFrame, dayCol: String, valueCol: String)
      : DataFrame = {
    val s = series.select(col(dayCol).cast("date").as("__d"),
      col(valueCol).cast("long").as("__y"))
      .withColumn("__t", datediff(col("__d"), lit("1992-01-01").cast("date"))
        .cast("long"))
    val pairs = s.as("a").join(s.as("b"), col("a.__t") < col("b.__t"))
      .select(((col("b.__y") - col("a.__y")) * 1000000L).as("__dy"),
        (col("b.__t") - col("a.__t")).as("__dt"))
      // floor division (round toward -inf) so negative slopes match the
      // oracle's // exactly: floor(a/b) = (a - pmod(a,b)) DIV b for b > 0
      // (the numerator is an exact multiple of b, so DIV's truncation
      // never engages and the result stays integer-exact)
      .select(expr("(__dy - pmod(__dy, __dt)) DIV __dt").as("__slope"))
    val vals = pairs.groupBy("__slope").agg(count(lit(1)).as("__c"))
    val tot = vals.agg(sum(col("__c")).as("__n"))
    val med = vals
      .withColumn("__cum", sum(col("__c")).over(BoundedGlobalWindow.orderBy("__slope")))
      .crossJoin(broadcast(tot))
      .agg(max(col("__n")).as("n_pairs"),
        min(when(col("__cum") * 2 >= col("__n"), col("__slope")))
          .as("theil_sen_slope_micro"))
    val mom = s.agg(count(lit(1)).as("n_periods"),
      sum(col("__t")).as("__st"), sum(col("__y").cast("decimal(38,0)")).as("__sy"),
      sum((col("__t") * col("__t")).cast("decimal(38,0)")).as("__stt"),
      sum((col("__t").cast("decimal(38,0)") * col("__y"))).as("__sty"))
    // sign-split: the slope numerator may be negative, and Spark's DIV
    // truncates where DuckDB's // floors — they agree only on positive
    // operands (the x268 discipline)
    val ols = mom.select(col("n_periods"),
      expr("""CAST(CASE WHEN (n_periods * __sty - __st * __sy) < 0
           THEN -((__st * __sy - n_periods * __sty) * 1000000
             DIV (n_periods * __stt - CAST(__st AS DECIMAL(38,0)) * __st))
           ELSE (n_periods * __sty - __st * __sy) * 1000000
             DIV (n_periods * __stt - CAST(__st AS DECIMAL(38,0)) * __st)
           END AS BIGINT)""").as("ols_slope_micro"))
    ols.crossJoin(broadcast(med))
      .select(col("n_periods"), col("n_pairs"), col("theil_sen_slope_micro"),
        col("ols_slope_micro"))
  }

  /**
   * CUPED variance reduction (Deng et al. 2013, public) — the standard
   * pre-experiment-covariate adjustment: θ = cov(X,Y)/var(X) from the
   * pooled arms, adjusted metric Yᵢ − θ·Xᵢ, and the readout is how much
   * of Y's variance the covariate removed. All moments ride
   * DECIMAL(38,0) cross-sums; θ and the variance-reduction share are
   * floor-divided to ppm — engine-exact, no floats anywhere. The
   * adjusted-difference column is the experiment's debiased effect
   * estimate (identical expectation to the raw difference because
   * E[X|arm] is arm-independent by randomization).
   *
   * Scale shape: one groupBy over units (the only corpus-sized
   * exchange), then constant-size moment frames; every join below the
   * unit collapse is broadcast.
   */
  def cupedAdjustment(units: DataFrame, armCol: Column, preCol: Column,
      postCol: Column): DataFrame = {
    val u = units.select(armCol.cast("int").as("__a"),
        preCol.cast("long").as("__x"), postCol.cast("long").as("__y"))
      .filter(col("__a").isNotNull && col("__x").isNotNull && col("__y").isNotNull)
    val mom = u.agg(count(lit(1)).as("__n"),
      sum(col("__x").cast("decimal(38,0)")).as("__sx"),
      sum(col("__y").cast("decimal(38,0)")).as("__sy"),
      sum((col("__x").cast("decimal(38,0)") * col("__x"))).as("__sxx"),
      sum((col("__x").cast("decimal(38,0)") * col("__y"))).as("__sxy"),
      sum((col("__y").cast("decimal(38,0)") * col("__y"))).as("__syy"))
    // sign-split floor-safe division: Spark's DIV truncates toward zero,
    // DuckDB's // floors — they agree only on positive operands, so every
    // possibly-negative quotient routes sign and magnitude separately
    // (the x268 discipline).
    val theta = mom.select(col("__n"), col("__sx"), col("__sy"),
      expr("""CAST(CASE WHEN (__n * __sxy - __sx * __sy) < 0
           THEN -((__sx * __sy - __n * __sxy) * 1000000
                DIV (__n * __sxx - __sx * __sx))
           ELSE (__n * __sxy - __sx * __sy) * 1000000
                DIV (__n * __sxx - __sx * __sx) END AS BIGINT)""")
        .as("theta_ppm"),
      expr("__n * __syy - __sy * __sy").as("__varYnum"),
      expr("__n * __sxx - __sx * __sx").as("__varXnum"),
      expr("__n * __sxy - __sx * __sy").as("__covNum"))
    // adjusted values in ppm units: y·1e6 − θ_ppm·x (exact integers)
    val adj = u.crossJoin(broadcast(theta.select("theta_ppm")))
      .select(col("__a"),
        (col("__y").cast("decimal(38,0)") * 1000000L -
          col("theta_ppm").cast("decimal(38,0)") * col("__x")).as("__z"))
    val arms = adj.groupBy("__a")
      .agg(count(lit(1)).as("__an"), sum(col("__z")).as("__sz"))
      .groupBy()
      .agg(max(when(col("__a") === 0, col("__an"))).as("n_control"),
        max(when(col("__a") === 1, col("__an"))).as("n_treatment"),
        max(when(col("__a") === 0,
          expr("""CAST(CASE WHEN __sz < 0 THEN -((-__sz) DIV __an)
               ELSE __sz DIV __an END AS BIGINT)"""))).as("__z0"),
        max(when(col("__a") === 1,
          expr("""CAST(CASE WHEN __sz < 0 THEN -((-__sz) DIV __an)
               ELSE __sz DIV __an END AS BIGINT)"""))).as("__z1"))
    arms.crossJoin(broadcast(theta))
      .select(col("n_control"), col("n_treatment"), col("theta_ppm"),
        expr("""CAST(CASE WHEN (__z1 - __z0) < 0
             THEN -((__z0 - __z1) DIV 1000000)
             ELSE (__z1 - __z0) DIV 1000000 END AS BIGINT)""")
          .as("adjusted_diff_cents"),
        // variance-reduction share: 1 − var(Y−θX)/var(Y), from moment
        // numerators (identical n scaling, ppm-floored θ by contract):
        // varZnum = varY·1e12 − 2θ_ppm·cov·1e6 + θ_ppm²·varX ≥ 0
        expr("""CAST(1000000 - (__varYnum * 1000000000000
             - 2 * theta_ppm * __covNum * 1000000
             + theta_ppm * theta_ppm * __varXnum)
             DIV (__varYnum * 1000000) AS BIGINT)""")
          .as("variance_reduction_ppm"))
  }

  /**
   * ROLLING 7-ish-day EXACT MEDIAN over a daily series — the smoother a
   * noisy operational metric gets in place of the mean (x131's slope and
   * x234's weekday outliers both want a robust center line). The input is
   * the DAY-COLLAPSED series (one row per day, the calendar-bounded frame
   * every x-tier daily operator produces); each output day reports the
   * lower median of the values present in the trailing `windowDays`
   * window. Exact by tiny-array order statistics: the per-day window holds
   * ≤ `windowDays` values, so sort_array + element_at is the whole median
   * — no row-frame window function, no value-collapse machinery needed at
   * this cardinality.
   *
   * Scale shape: a range self-join on the day spine (days × windowDays
   * rows — calendar-bounded at any corpus size); the array sort is
   * per-output-day over ≤ windowDays elements.
   */
  def rollingMedianByDay(daily: DataFrame, dayCol: String, valueCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1 && windowDays <= 60, "window must be 1..60 days")
    val d = daily.select(col(dayCol).cast("date").as("__d"),
      col(valueCol).cast("long").as("__v"))
    d.as("o").join(d.as("w"),
        datediff(col("o.__d"), col("w.__d")).between(0, windowDays - 1))
      .groupBy(col("o.__d").as("day"))
      .agg(count(lit(1)).as("n_days_in_window"),
        sort_array(collect_list(col("w.__v"))).as("__vs"))
      .select(col("day"), col("n_days_in_window"),
        expr("element_at(__vs, CAST((n_days_in_window + 1) DIV 2 AS INT))")
          .as("rolling_median"))
      .orderBy("day")
  }

  /**
   * KAPLAN–MEIER product-limit curve in exact ppm — the survival
   * estimate [[conversionLifeTable]] deliberately stops short of: from
   * the life table's (lag, at-risk, converted) rows, S(k) = Π_{j≤k}
   * (n_j − d_j)/n_j with the product FLOORED to ppm after every factor
   * (the x505 frozen-arithmetic discipline applied to a running product
   * — order is the lag order, stated, so both engines fold identically).
   * The censoring machinery is already in the life table; this is the
   * curve a retention/conversion readout plots.
   *
   * Scale shape: the life table is |lags|-bounded by contract (whole-day
   * lags over the corpus calendar), so the collect + per-row prefix fold
   * is O(|lags|²) on ONE row's array — survival analysis at 100 TB is
   * bounded by the life-table aggregation upstream, not this step.
   */
  def kaplanMeier(lifeTable: DataFrame, lagCol: String, atRiskCol: String,
      convCol: String): DataFrame = {
    val steps = lifeTable.select(col(lagCol).cast("long").as("__lag"),
      col(atRiskCol).cast("long").as("__n"), col(convCol).cast("long").as("__d"))
    val one = steps
      .agg(array_sort(collect_list(struct(col("__lag"), col("__n"), col("__d"))))
        .as("__ss"))
    one.select(posexplode(col("__ss")).as(Seq("__i", "__s")), col("__ss"))
      .select(col("__s.__lag").as("lag_days"), col("__s.__n").as("n_at_risk"),
        col("__s.__d").as("n_converted"),
        expr("""aggregate(slice(__ss, 1, __i + 1), 1000000L,
             (acc, s) -> acc * (s.__n - s.__d) DIV s.__n)""")
          .as("survival_ppm"))
      .orderBy("lag_days")
  }

  /**
   * SPEARMAN rank correlation between two keyed metric frames — the
   * monotone-association companion of x193's Kendall counts: average
   * competition ranks (tie groups share the mean position, carried as
   * the INTEGER doubled rank 2·rank + ties − 1 so no fraction ever
   * exists), then the exact Pearson moments over the doubled ranks.
   * ρ_ppm floor-divides the covariance by the exact integer sqrt of the
   * variance product (the x568 isqrt discipline — floor(IEEE sqrt)
   * corrected, never trusted raw; here the double seed is refined by one
   * decimal Newton step before the ±1 correction, because at the top of
   * the supported range the raw double is off by ~10³, not 1), sign-split
   * for the negative branch. Keys present in only one frame are excluded
   * (stated).
   *
   * Overflow bound: with doubled ranks ≤ 2n the variance product is
   * ≤ 16n⁸, so every moment product is staged through DECIMAL(38,0)
   * (n*saa, cov ~ 4n⁴ and vp ~ 16n⁸ silently wrap BIGINT past ~300
   * common keys — the r8 bug). Exact up to `n_keys ≤ 3.9·10⁴` (vp <
   * 8.5·10³⁷ keeps the isqrt seed inside BIGINT and vp inside 38
   * digits) — a hard documented bound, comfortably above the
   * group-collapsed vocabulary contract below.
   *
   * Scale shape: both inputs are group-collapsed frames by contract
   * (brand/source vocabularies); everything here is value-collapse,
   * broadcast joins and one-row moment frames.
   */
  def spearmanRho(a: DataFrame, b: DataFrame, keyCol: String,
      valCol: String): DataFrame = {
    def ranked(df: DataFrame, out: String): DataFrame = {
      val v = df.select(col(keyCol).as("__k"), col(valCol).as("__v"))
        .filter(col("__k").isNotNull && col("__v").isNotNull)
      val grp = v.groupBy("__v").agg(count(lit(1)).as("__c"))
        .withColumn("__cum", sum(col("__c")).over(BoundedGlobalWindow.orderBy("__v")))
        // doubled average rank of a tie group spanning [cum-c+1, cum]
        .select(col("__v"), (col("__cum") * 2 - col("__c") + 1).as(out))
      v.join(grp, "__v").select(col("__k"), col(out))
    }
    val j = ranked(a, "__ra").join(ranked(b, "__rb"), "__k")
    // moments staged through DECIMAL(38,0): doubled-rank squares fit BIGINT
    // (≤ 4n², summed before any cross product), but every product of two
    // moments does not — see the overflow bound in the doc above
    val mom = j.agg(count(lit(1)).as("n_keys"),
      sum(col("__ra").cast("decimal(38,0)")).as("__sa"),
      sum(col("__rb").cast("decimal(38,0)")).as("__sb"),
      sum((col("__ra") * col("__ra")).cast("decimal(38,0)")).as("__saa"),
      sum((col("__rb") * col("__rb")).cast("decimal(38,0)")).as("__sbb"),
      sum((col("__ra") * col("__rb")).cast("decimal(38,0)")).as("__sab"))
    mom.select(col("n_keys"),
        expr("CAST(n_keys AS DECIMAL(38,0)) * __sab - __sa * __sb").as("__cov"),
        expr("""(CAST(n_keys AS DECIMAL(38,0)) * __saa - __sa * __sa)
             * (CAST(n_keys AS DECIMAL(38,0)) * __sbb - __sb * __sb)""")
          .as("__vp"))
      // isqrt: double seed (error ~10³ at the 10¹⁹ top of range) → one
      // decimal Newton step (error² / 2s ⇒ within 1) → exact ±1 correction
      .withColumn("__s0", floor(sqrt(col("__vp").cast("double"))).cast("long"))
      .withColumn("__s1", expr("""CASE WHEN __vp <= 0 OR __s0 <= 0 THEN 0
           ELSE (CAST(__s0 AS DECIMAL(38,0)) + (__vp DIV __s0)) DIV 2 END"""))
      .withColumn("__sq", expr("""CASE
           WHEN (CAST(__s1 AS DECIMAL(38,0)) + 1) * (CAST(__s1 AS DECIMAL(38,0)) + 1) <= __vp
             THEN __s1 + 1
           WHEN CAST(__s1 AS DECIMAL(38,0)) * CAST(__s1 AS DECIMAL(38,0)) > __vp
             THEN __s1 - 1
           ELSE __s1 END"""))
      .select(col("n_keys"),
        expr("""CAST(CASE WHEN __sq = 0 THEN 0
             WHEN __cov < 0 THEN -(CAST(-__cov AS DECIMAL(38,0)) * 1000000 DIV __sq)
             ELSE CAST(__cov AS DECIMAL(38,0)) * 1000000 DIV __sq END AS BIGINT)""")
          .as("rho_ppm"))
  }

  /**
   * MARKOV STATIONARY distribution by integer power iteration — where
   * does a user's event stream settle if the observed one-step dynamics
   * ([[transitionMatrix]]) run forever? `rounds` fixed iterations of
   * v′(t) = ⌊Σ_s v(s)·p(s→t) / 10⁶⌋ from the uniform start (the x66/x104
   * integer-iteration discipline: floor once per component per round, so
   * the vector after R rounds is THE deterministic cross-engine value;
   * convergence is the caller's judgment, measured not asserted — mass
   * leaks to floors and to states with no outgoing edges, visible in the
   * reported sum).
   *
   * Scale shape: the transition matrix is |types|²-bounded; each round
   * is one broadcast join + aggregate on that tiny frame. The corpus is
   * touched exactly once (the lag window inside transitionMatrix).
   */
  def markovStationary(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String, rounds: Int = 4): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds $rounds outside 1..16")
    val tm = transitionMatrix(events, keyCol, tsCol, idCol, typeCol)
      .select(col("prev_type").as("__from"), col("next_type").as("__to"),
        col("p_ppm"))
    val states = tm.select(col("__from").as("state"))
      .union(tm.select(col("__to"))).distinct()
    var v = states.crossJoin(broadcast(states.agg(count(lit(1)).as("__ns"))))
      .select(col("state"), expr("CAST(1000000 DIV __ns AS BIGINT)").as("w_ppm"))
    for (_ <- 1 to rounds) {
      v = v.join(tm, col("state") === col("__from"))
        .groupBy(col("__to").as("state"))
        .agg(expr("CAST(SUM(w_ppm * p_ppm) DIV 1000000 AS BIGINT)").as("w_ppm"))
    }
    v.select(col("state").as("event_type"), col("w_ppm").as("stationary_ppm"),
        lit(rounds).as("n_rounds"))
      .orderBy("event_type")
  }

  /**
   * COCHRAN–MANTEL–HAENSZEL stratified risk ratio — the
   * confounding-proof comparison (public epidemiology methodology) the
   * crude rate ratio silently gets wrong when exposure and outcome both
   * correlate with a stratum (Simpson's paradox): RR_MH =
   * Σᵢ aᵢ·n0ᵢ/nᵢ over Σᵢ bᵢ·n1ᵢ/nᵢ. Per-stratum terms floor ONCE to
   * micro units through DECIMAL(38,0) staging (the three-count-product
   * overflow rule), and the crude ratio is reported next to it so the
   * confounding gap is a measured number. Strata missing either
   * exposure arm are excluded (standard — they carry no comparison).
   *
   * Scale shape: one corpus exchange on the stratum key; everything
   * after is |strata|-bounded arithmetic on one row.
   */
  def cmhStratifiedRatio(df: DataFrame, stratum: Column, exposed: Column,
      outcome: Column): DataFrame = {
    val base = df.select(stratum.as("__st"), exposed.cast("int").as("__e"),
        outcome.cast("int").as("__y"))
      .filter(col("__st").isNotNull && col("__e").isNotNull
        && col("__y").isNotNull)
    val s = base.groupBy("__st").agg(
        sum(when(col("__e") === 1 && col("__y") === 1, 1L).otherwise(0L))
          .as("__a"),
        sum(when(col("__e") === 0 && col("__y") === 1, 1L).otherwise(0L))
          .as("__b"),
        sum(when(col("__e") === 1, 1L).otherwise(0L)).as("__n1"),
        sum(when(col("__e") === 0, 1L).otherwise(0L)).as("__n0"))
      .withColumn("__n", col("__n1") + col("__n0"))
      .filter(col("__n1") > 0 && col("__n0") > 0)
    s.agg(count(lit(1)).as("n_strata"),
        sum(col("__a")).as("__A"), sum(col("__b")).as("__B"),
        sum(col("__n1")).as("__N1"), sum(col("__n0")).as("__N0"),
        sum(expr("CAST(__a AS DECIMAL(38,0)) * __n0 * 1000000 DIV __n"))
          .as("__num"),
        sum(expr("CAST(__b AS DECIMAL(38,0)) * __n1 * 1000000 DIV __n"))
          .as("__den"))
      .select(col("n_strata"),
        expr("__A * 1000000 DIV __N1").as("exposed_rate_ppm"),
        expr("__B * 1000000 DIV __N0").as("unexposed_rate_ppm"),
        expr("""CAST(CASE WHEN __B = 0 THEN 0
             ELSE CAST(__A AS DECIMAL(38,0)) * __N0 * 1000000
              DIV (CAST(__B AS DECIMAL(38,0)) * __N1) END AS BIGINT)""")
          .as("crude_rr_ppm"),
        expr("""CAST(CASE WHEN __den = 0 THEN 0
             ELSE __num * 1000000 DIV __den END AS BIGINT)""")
          .as("mh_rr_ppm"))
  }

  /**
   * QUANTILE TREATMENT EFFECT — the distributional A/B readout the mean
   * difference (x147/x268) flattens: at each requested percentile, the
   * exact lower quantile of each arm (value-collapsed cumulative rank,
   * the x161 convention: the first value whose cumulative count covers
   * ⌈p·n/100⌉) and their difference. A treatment that helps the median
   * but hurts the tail shows here and nowhere else.
   *
   * Scale shape: one exchange collapses each arm to (value, count); the
   * rank window partitions BY ARM over the collapsed frame; the
   * percentile probe is a broadcast of |pcts| constants.
   */
  def quantileTreatmentEffect(df: DataFrame, arm: Column, valueCents: Column,
      pcts: Seq[Int] = Seq(10, 20, 30, 40, 50, 60, 70, 80, 90)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be in 1..100")
    val base = df.select(arm.cast("int").as("__a"),
        valueCents.cast("long").as("__v"))
      .filter(col("__a").isNotNull && col("__v").isNotNull)
    val coll = base.groupBy("__a", "__v").agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy("__a").orderBy("__v")))
    val tot = base.groupBy("__a").agg(count(lit(1)).as("__n"))
    val q = coll.join(broadcast(tot), "__a")
      .select(col("__a"), col("__v"), col("__cum"), col("__n"),
        explode(expr(s"array(${pcts.mkString(",")})")).as("__p"))
      .groupBy("__a", "__p")
      .agg(min(when(col("__cum") * 100 >= col("__p") * col("__n"), col("__v")))
        .as("__q"))
    q.groupBy(col("__p").as("p_pct"))
      .agg(max(when(col("__a") === 0, col("__q"))).as("q_control_cents"),
        max(when(col("__a") === 1, col("__q"))).as("q_treatment_cents"))
      .select(col("p_pct"), col("q_control_cents"), col("q_treatment_cents"),
        (col("q_treatment_cents") - col("q_control_cents")).as("qte_cents"))
      .orderBy("p_pct")
  }

  /**
   * LOG-RANK numerators for a two-arm survival comparison — the
   * hypothesis-test layer over [[kaplanMeier]]'s curves (public: the
   * Mantel–Cox test): at every event lag, observed arm-1 conversions O₁
   * against the expectation E₁ = n₁·d/n under the no-difference null,
   * plus the hypergeometric variance numerator. All terms are exact
   * integers in milli/micro units through DECIMAL(38,0) staging; the
   * caller compares (O₁−E₁)²/V to a χ² cut — the engine's job is the
   * three sums, bit-exact.
   *
   * Scale shape: one corpus exchange collapses users to (arm, lag)
   * rows; the lag spine is calendar-bounded, at-risk counts are prefix
   * sums over it (bounded global window), and the output is one row.
   */
  def logrankNumerators(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, startType: String, convType: String,
      arm: Column): DataFrame = {
    val perUser = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(min(when(col(typeCol) === startType, to_date(col(tsCol))))
          .as("__start"),
        min(when(col(typeCol) === convType, to_date(col(tsCol))))
          .as("__convd"),
        first(arm.cast("int"), ignoreNulls = true).as("__arm"))
      .filter(col("__start").isNotNull && col("__arm").isNotNull)
    val horizon = events.agg(max(to_date(col(tsCol))).as("__end"))
    val lagged = perUser.crossJoin(broadcast(horizon))
      .withColumn("__convLag",
        when(col("__convd") >= col("__start"),
          datediff(col("__convd"), col("__start")).cast("long")))
      .withColumn("__censLag",
        datediff(col("__end"), col("__start")).cast("long"))
      .select(col("__arm"),
        coalesce(col("__convLag"), col("__censLag")).as("__lag"),
        when(col("__convLag").isNotNull, 1L).otherwise(0L).as("__d"))
    val perLag = lagged.groupBy("__lag")
      .agg(sum(when(col("__arm") === 1, 1L).otherwise(0L)).as("__c1"),
        sum(when(col("__arm") === 0, 1L).otherwise(0L)).as("__c0"),
        sum(when(col("__arm") === 1, col("__d")).otherwise(0L)).as("__d1"),
        sum(when(col("__arm") === 0, col("__d")).otherwise(0L)).as("__d0"))
      .withColumn("__n1", sum(col("__c1")).over(
        BoundedGlobalWindow.orderBy(col("__lag").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n0", sum(col("__c0")).over(
        BoundedGlobalWindow.orderBy(col("__lag").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__d", col("__d1") + col("__d0"))
      .withColumn("__n", col("__n1") + col("__n0"))
      .filter(col("__d") > 0)
    perLag.agg(count(lit(1)).as("n_event_lags"),
        sum(col("__d1")).as("observed_1"),
        sum(expr("CAST(__n1 AS DECIMAL(38,0)) * __d * 1000 DIV __n"))
          .as("__e1"),
        sum(expr("""CASE WHEN __n > 1
             THEN CAST(__n1 AS DECIMAL(38,0)) * __n0 * __d * (__n - __d)
              * 1000000 DIV (CAST(__n AS DECIMAL(38,0)) * __n * (__n - 1))
             ELSE CAST(0 AS DECIMAL(38,0)) END""")).as("__v"))
      .select(col("n_event_lags"), col("observed_1"),
        expr("CAST(__e1 AS BIGINT)").as("expected_1_milli"),
        expr("CAST(observed_1 * 1000 - __e1 AS BIGINT)")
          .as("logrank_diff_milli"),
        expr("CAST(__v AS BIGINT)").as("variance_micro"))
  }

  /**
   * MARKOV REMOVAL-EFFECT attribution (Anderl et al. 2014, public
   * methodology) — the data-driven alternative to the positional rules
   * (x92 last-touch, x134 linear, x178 position, x207 time-decay): model
   * journeys as START → channel → … → CONV/NULL transitions (truncated
   * at the first conversion), compute the absorption probability into
   * CONV by `rounds` integer power-iteration steps, and credit each
   * channel by how much that probability DROPS when the channel is
   * removed (its transitions lost to NULL). All ppm arithmetic floors
   * once per state per round (the x66/x104 discipline), so base,
   * removal effects, and credit shares are engine-exact.
   *
   * The channel list is collected once from the transition frame — a
   * BOUNDED-DOMAIN collect (event-type vocabulary, the x141/EventStream
   * registration precedent), never row-scale. Scale shape: ONE corpus
   * exchange builds the per-user ordered transitions; every absorption
   * scenario then iterates joins over the localCheckpointed
   * |states|²-bounded matrix.
   */
  def markovRemovalAttribution(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String, convType: String,
      rounds: Int = 6): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds $rounds outside 1..16")
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val ordered = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__rn", row_number().over(byUser))
    val firstConv = ordered.filter(col(typeCol) === convType)
      .groupBy(userCol).agg(min(col("__rn")).as("__pr"))
    val kept = ordered.join(firstConv, Seq(userCol), "left")
      .filter(col("__pr").isNull || col("__rn") <= col("__pr"))
    val labeled = kept.select(col(userCol).as("__u"), col("__rn"),
      when(col(typeCol) === convType, "CONV").otherwise(col(typeCol))
        .as("__st"))
    val withNext = labeled.withColumn("__next",
      lead(col("__st"), 1).over(Window.partitionBy("__u").orderBy("__rn")))
    val starts = withNext.filter(col("__rn") === 1)
      .select(lit("START").as("__f"), col("__st").as("__t"))
    val body = withNext.filter(col("__st") =!= "CONV")
      .select(col("__st").as("__f"),
        coalesce(col("__next"), lit("NULL")).as("__t"))
    val tm = starts.union(body).groupBy("__f", "__t")
      .agg(count(lit(1)).as("__n"))
      .withColumn("__tot", sum(col("__n")).over(Window.partitionBy("__f")))
      .select(col("__f"), col("__t"), expr("__n * 1000000 DIV __tot").as("__p"))
      .localCheckpoint()
    // bounded-collect: event-type-vocab (the channel vocabulary, never rows)
    val channels = tm.select(col("__f")).filter(col("__f") =!= "START")
      .distinct().collect().map(_.getString(0)).sorted
    def absorption(removed: Option[String]): DataFrame = {
      val m = removed.map(c => tm.filter(col("__f") =!= c && col("__t") =!= c))
        .getOrElse(tm)
      val direct = m.filter(col("__t") === "CONV")
        .select(col("__f").as("__s"), col("__p").as("__d"))
      val states = m.select(col("__f").as("__s")).distinct()
        .join(direct, Seq("__s"), "left")
        .select(col("__s"), coalesce(col("__d"), lit(0L)).as("__d"))
      var pconv = states.select(col("__s"), col("__d").as("__pc"))
      for (_ <- 1 to rounds) {
        val flow = m.filter(col("__t") =!= "CONV" && col("__t") =!= "NULL")
          .join(pconv.select(col("__s").as("__t"), col("__pc")), "__t")
          .groupBy(col("__f").as("__s"))
          .agg(expr("CAST(SUM(__p * __pc) DIV 1000000 AS BIGINT)").as("__fl"))
        pconv = states.join(flow, Seq("__s"), "left")
          .select(col("__s"), col("__d"),
            (col("__d") + coalesce(col("__fl"), lit(0L))).as("__pc"))
      }
      pconv.filter(col("__s") === "START")
        .select(col("__pc").as("conv_ppm"))
    }
    val base = absorption(None)
    val effects = channels.map { c =>
      absorption(Some(c)).crossJoin(broadcast(base.select(col("conv_ppm")
          .as("__base"))))
        .select(lit(c).as("channel"),
          (col("__base") - col("conv_ppm")).as("removal_effect_ppm"))
    }.reduce(_ unionAll _)
    val tot = effects.agg(sum(col("removal_effect_ppm")).as("__re"))
    effects.crossJoin(broadcast(tot)).crossJoin(broadcast(base))
      .select(col("channel"), col("conv_ppm").as("base_conv_ppm"),
        col("removal_effect_ppm"),
        expr("""CAST(CASE WHEN __re <= 0 THEN 0
             ELSE removal_effect_ppm * 1000000 DIV __re END AS BIGINT)""")
          .as("credit_ppm"))
      .orderBy("channel")
  }

  /**
   * COHEN'S KAPPA — chance-corrected agreement between two categorical
   * labelings (Cohen '60, public): κ = (p_o − p_e) / (1 − p_e) with
   * p_o the observed agreement and p_e the expected agreement from the
   * marginals. The standard readout for "is the cheap classifier actually
   * agreeing with the stored label beyond what the class skew guarantees"
   * — raw accuracy (x08's confusion diagonal) flatters any skewed corpus.
   * Exact integers end-to-end: κ_ppm = (N·agree − Σ rᵢcᵢ)·10⁶ over
   * (N² − Σ rᵢcᵢ), sign-split so Spark's truncating DIV matches the
   * oracle's floor on the (possible) negative-κ branch. Every product of
   * two corpus-sized counts (N², Σ rᵢcᵢ, the ·10⁶ numerators) is staged
   * through DECIMAL(38,0) — the three-count-product rule; in BIGINT they
   * wrap silently from N ≈ 3·10⁹ (the r8 bug). The DEGENERATE corpus
   * (single class on both sides ⇒ p_e = 1 ⇒ zero denominator) reports
   * κ_ppm = 0 explicitly — chance explains everything, no skill signal —
   * instead of a NULL-vs-error cross-engine divergence.
   *
   * Scale shape: one corpus-sized groupBy on the label pair (|A|·|B|
   * rows), marginals and the cross-moment ride |A|+|B|-bounded frames.
   */
  def cohensKappa(df: DataFrame, actual: Column, predicted: Column): DataFrame = {
    val pairs = df.select(actual.cast("string").as("__t"),
        predicted.cast("string").as("__p"))
      .filter(col("__t").isNotNull && col("__p").isNotNull)
      .groupBy("__t", "__p").agg(count(lit(1)).as("__c"))
    val n = pairs.agg(sum(col("__c")).as("__n"),
      sum(when(col("__t") === col("__p"), col("__c")).otherwise(0L)).as("__agree"))
    val rowM = pairs.groupBy("__t").agg(sum(col("__c")).as("__r"))
    val colM = pairs.groupBy("__p").agg(sum(col("__c")).as("__k"))
    val pe = rowM.join(colM, col("__t") === col("__p"))
      .agg(coalesce(sum(col("__r").cast("decimal(38,0)") * col("__k")),
        lit(0).cast("decimal(38,0)")).as("__peNum"))
    n.crossJoin(broadcast(pe))
      .select(col("__n").as("n_rows"), col("__agree").as("n_agree"),
        expr("CAST(CAST(__agree AS DECIMAL(38,0)) * 1000000 DIV __n AS BIGINT)")
          .as("observed_agree_ppm"),
        expr("""CAST(__peNum * 1000000
             DIV (CAST(__n AS DECIMAL(38,0)) * __n) AS BIGINT)""")
          .as("expected_agree_ppm"),
        expr("""CAST(CASE
             WHEN CAST(__n AS DECIMAL(38,0)) * __n = __peNum THEN 0
             WHEN (CAST(__n AS DECIMAL(38,0)) * __agree - __peNum) < 0
             THEN -((__peNum - CAST(__n AS DECIMAL(38,0)) * __agree) * 1000000
                  DIV (CAST(__n AS DECIMAL(38,0)) * __n - __peNum))
             ELSE (CAST(__n AS DECIMAL(38,0)) * __agree - __peNum) * 1000000
                  DIV (CAST(__n AS DECIMAL(38,0)) * __n - __peNum)
             END AS BIGINT)""").as("kappa_ppm"))
  }

  /**
   * McNEMAR's paired test (McNemar '47, public) — do two classifiers have
   * DIFFERENT error rates on the SAME examples? The unpaired accuracy gap
   * ignores that both see identical inputs; McNemar reads only the
   * discordant cells b01 (A right, B wrong) and b10 (A wrong, B right):
   * χ² = (b01−b10)²/(b01+b10). Exact integers end-to-end — the statistic
   * in milli, the 5% verdict via the integer inequality
   * (b01−b10)²·10⁴ > 38415·(b01+b10) (χ²₍₁,.05₎ = 3.8415, ·10⁴ kept
   * integral) — and every count product staged through DECIMAL(38,0)
   * (the three-count-product rule: (b01−b10)² wraps BIGINT past ~3·10⁹
   * discordant rows). A discordance-free corpus (b01+b10 = 0) reports
   * χ² = 0 / 'same' explicitly, not a NULL.
   *
   * Scale shape: one corpus scan, map-side CASE flags, one 1-row
   * aggregate — nothing keyed, nothing joined.
   */
  def mcnemarPaired(df: DataFrame, truth: Column, predA: Column,
      predB: Column): DataFrame = {
    val flags = df.filter(truth.isNotNull)
      .select(when(predA === truth, 1L).otherwise(0L).as("__a"),
        when(predB === truth, 1L).otherwise(0L).as("__b"))
    flags.agg(count(lit(1)).as("n_rows"),
        sum(col("__a")).as("a_correct"),
        sum(col("__b")).as("b_correct"),
        sum(when(col("__a") === 1 && col("__b") === 0, 1L).otherwise(0L))
          .as("a_only_correct"),
        sum(when(col("__a") === 0 && col("__b") === 1, 1L).otherwise(0L))
          .as("b_only_correct"))
      .select(col("n_rows"), col("a_correct"), col("b_correct"),
        col("a_only_correct"), col("b_only_correct"),
        expr("""CAST(CASE WHEN a_only_correct + b_only_correct = 0 THEN 0
             ELSE CAST(a_only_correct - b_only_correct AS DECIMAL(38,0))
                  * (a_only_correct - b_only_correct) * 1000
                  DIV (a_only_correct + b_only_correct)
             END AS BIGINT)""").as("chi2_milli"),
        expr("""CASE WHEN CAST(a_only_correct - b_only_correct AS DECIMAL(38,0))
                  * (a_only_correct - b_only_correct) * 10000
                  > CAST(38415 AS DECIMAL(38,0))
                    * (a_only_correct + b_only_correct)
             THEN 'different' ELSE 'same' END""").as("verdict"))
  }

  /**
   * FLEISS' kappa (Fleiss '71, public) — chance-corrected agreement for
   * n ≥ 2 raters per item, the multi-rater generalization of
   * [[cohensKappa]]. The per-item agreement Σⱼn_ij² − n equals
   * n + 2·(agreeing unordered rater pairs) − n, so P̄'s numerator is a
   * MAP-SIDE pair count — no per-(item, category) frame ever exists; the
   * category marginals Cⱼ ride one |categories|-bounded aggregate.
   * κ = (2·pairs·n·N − (n−1)·ΣCⱼ²) / ((n−1)·(n²N² − ΣCⱼ²)), reported
   * sign-split in ppm with P̄ and P̄ₑ beside it; every product of two
   * corpus-scale counts is staged through DECIMAL(38,0). The degenerate
   * single-category corpus (ΣCⱼ² = n²N² ⇒ P̄ₑ = 1) reports κ = 0 by the
   * [[cohensKappa]] convention.
   *
   * Scale shape: one corpus scan for (N, agree-pairs) + one explode into
   * the |categories|-bounded marginal aggregate; the report is one row.
   */
  def fleissKappa(df: DataFrame, raters: Seq[Column]): DataFrame = {
    val n = raters.size
    require(n >= 2 && n <= 16, s"rater count $n outside 2..16")
    val rated = df.select(raters.zipWithIndex.map { case (c, i) =>
      c.cast("string").as(s"__r$i") }: _*)
      .filter((0 until n).map(i => col(s"__r$i").isNotNull).reduce(_ && _))
    val agreePairs = (for (i <- 0 until n; j <- (i + 1) until n)
      yield when(col(s"__r$i") === col(s"__r$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    val withP = rated.withColumn("__ap", agreePairs)
    val base = withP.agg(count(lit(1)).as("__N"), sum(col("__ap")).as("__pairs"))
    val cats = withP
      .select(explode(array((0 until n).map(i => col(s"__r$i")): _*)).as("__c"))
      .groupBy("__c").agg(count(lit(1)).as("__cnt"))
      .agg(count(lit(1)).as("n_categories"),
        coalesce(sum(col("__cnt").cast("decimal(38,0)") * col("__cnt")),
          lit(0).cast("decimal(38,0)")).as("__sumC2"))
    base.crossJoin(broadcast(cats))
      .select(col("__N").as("n_items"), lit(n.toLong).as("n_raters"),
        col("n_categories"),
        expr(s"""CAST(CASE WHEN __N = 0 THEN 0
             ELSE CAST(__pairs AS DECIMAL(38,0)) * 2000000
                  DIV (CAST(__N AS DECIMAL(38,0)) * ${n * (n - 1)})
             END AS BIGINT)""").as("p_bar_ppm"),
        expr(s"""CAST(CASE WHEN __N = 0 THEN 0
             ELSE __sumC2 * 1000000
                  DIV (CAST(__N AS DECIMAL(38,0)) * __N * ${n * n})
             END AS BIGINT)""").as("p_e_ppm"),
        expr(s"""CAST(CASE
             WHEN __N = 0 THEN 0
             WHEN CAST(__N AS DECIMAL(38,0)) * __N * ${n * n} = __sumC2 THEN 0
             WHEN CAST(__pairs AS DECIMAL(38,0)) * __N * ${2 * n}
                  - ${n - 1} * __sumC2 < 0
             THEN -((${n - 1} * __sumC2
                     - CAST(__pairs AS DECIMAL(38,0)) * __N * ${2 * n}) * 1000000
                  DIV (${n - 1} * (CAST(__N AS DECIMAL(38,0)) * __N * ${n * n}
                       - __sumC2)))
             ELSE (CAST(__pairs AS DECIMAL(38,0)) * __N * ${2 * n}
                   - ${n - 1} * __sumC2) * 1000000
                  DIV (${n - 1} * (CAST(__N AS DECIMAL(38,0)) * __N * ${n * n}
                       - __sumC2))
             END AS BIGINT)""").as("fleiss_kappa_ppm"))
  }

  /**
   * KRIPPENDORFF's alpha, INTERVAL metric (Krippendorff '70/'04, public)
   * — the agreement coefficient for the annotation tables [[fleissKappa]]
   * cannot handle: MISSING ratings (raters skip units) and ORDINAL/
   * interval distance (a 2-vs-3 disagreement is smaller than 1-vs-5).
   * α = 1 − D_o/D_e over the squared-difference metric δ(c,k) = (c−k)².
   * The within-unit pair sum COLLAPSES algebraically —
   * Σ_{c,k} n_c·n_k·(c−k)² = 2(m·Q − P²) with P = Σn_c·c, Q = Σn_c·c² —
   * so the whole operator is aggregation: no within-unit join, no
   * coincidence-matrix frame. Rater identity never enters the interval-α
   * math (only WHICH ratings exist per unit), so the input is the
   * (unit, value) rating list; one rating per (unit, rater) is the
   * CALLER's precondition, exactly as in the published formulation.
   *
   * Exact arithmetic: α = 1 − (n−1)·Σ_u S_u/(m_u−1) / E with
   * S_u = 2(m_u·Q_u − P_u²), E = 2(n·Q − P²), n = Σ m_u over PAIRABLE
   * units (m_u ≥ 2). The per-unit rational 1/(m_u−1) is cleared by the
   * constant 720720 = lcm(1..16): `720720 DIV (m_u−1)` is EXACT for
   * units with ≤ 17 ratings (documented precondition — an annotation
   * panel, not a crowd; beyond 17 the weight floors and α carries a
   * sub-ppm bias). α_ppm is sign-split before the floor division
   * ([[fleissKappa]]'s convention) because Spark DIV truncates toward
   * zero while the oracle's `//` floors — on the shared non-negative
   * operands they agree. Degenerates report 0: n ≤ 1, or E = 0 (all
   * pairable ratings share one value — agreement is vacuous). DECIMAL
   * (38,0) staging bounds validity at ~10⁷ ratings for |value| ≤ 10³
   * (ordinal scales); the oracle errors (HUGEINT) rather than guards
   * beyond it, per the [[jonckheereTerpstra]] note.
   *
   * Scale shape: one (unit, value) collapse, one unit-bounded aggregate,
   * one 1-row report. No join anywhere.
   */
  def krippendorffAlphaInterval(df: DataFrame, unit: Column,
      value: Column): DataFrame = {
    val uv = df
      .select(unit.cast("long").as("__u"), value.cast("long").as("__v"))
      .filter(col("__u").isNotNull && col("__v").isNotNull)
      .groupBy("__u", "__v").agg(count(lit(1)).as("__c"))
    val perUnit = uv.groupBy("__u")
      .agg(sum(col("__c")).as("__m"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * __v")).as("__p"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * __v * __v")).as("__q"))
      .filter(col("__m") >= 2L)
    perUnit
      .agg(count(lit(1)).as("n_units"),
        coalesce(sum(col("__m")), lit(0L)).as("n_ratings"),
        coalesce(sum(col("__p")), lit(0).cast("decimal(38,0)")).as("__gp"),
        coalesce(sum(col("__q")), lit(0).cast("decimal(38,0)")).as("__gq"),
        coalesce(sum(expr(
          """2 * (CAST(__m AS DECIMAL(38,0)) * __q - __p * __p)
             * (720720 DIV (__m - 1))""")),
          lit(0).cast("decimal(38,0)")).as("__t"))
      .select(col("n_units"), col("n_ratings"),
        expr("""CAST(2 * (CAST(n_ratings AS DECIMAL(38,0)) * __gq
             - __gp * __gp) AS DECIMAL(38,0))""").as("__e"),
        col("__t"))
      .select(col("n_units"), col("n_ratings"),
        expr("""CAST(CASE
             WHEN n_ratings <= 1 OR __e = 0 THEN 0
             WHEN 720720 * __e - (n_ratings - 1) * __t < 0
             THEN -(((n_ratings - 1) * __t - 720720 * __e) * 1000000
                  DIV (720720 * __e))
             ELSE (720720 * __e - (n_ratings - 1) * __t) * 1000000
                  DIV (720720 * __e)
             END AS BIGINT)""").as("alpha_ppm"))
  }

  /**
   * COCHRAN's Q (Cochran '50, public) — do k ≥ 3 classifiers have
   * different error rates on the SAME examples? The k-way generalization
   * of [[mcnemarPaired]] (Q reduces to McNemar's χ² at k = 2): with
   * x_ij = classifier j correct on item i, column totals C_j and row
   * totals R_i, `Q = (k−1)·(k·ΣC_j² − S²) / (k·S − ΣR_i²)` where
   * S = ΣC = ΣR, distributed χ²_{k−1} under "no difference". Exact
   * integers: Q in milli with every count product staged through
   * DECIMAL(38,0), the 5% verdict via the cross-multiplied inequality
   * (k−1)·num·10³ > χ²crit_milli·den (the caller passes the critical
   * value for df = k−1 — no CDF anywhere). The degenerate corpus where
   * every item is all-correct or all-wrong (den = 0: classifiers are
   * indistinguishable item-wise) reports Q = 0 / 'same' explicitly.
   *
   * Scale shape: one corpus scan — R_i is a map-side sum of the k
   * correctness flags, the k column totals and the three moments ride
   * ONE 1-row aggregate. Nothing keyed, nothing joined.
   */
  def cochranQ(df: DataFrame, outcomes: Seq[Column],
      chi2CritMilli: Long): DataFrame = {
    val k = outcomes.size
    require(k >= 2 && k <= 16, s"classifier count $k outside 2..16")
    require(chi2CritMilli > 0, s"chi2CritMilli $chi2CritMilli must be positive")
    val flagged = df.select(outcomes.zipWithIndex.map { case (c, j) =>
      when(c, 1L).otherwise(0L).as(s"__x$j") }: _*)
      .withColumn("__r", (0 until k).map(j => col(s"__x$j")).reduce(_ + _))
    val aggCols = (0 until k).map(j => sum(col(s"__x$j")).as(s"__c$j")) ++
      Seq(sum(col("__r")).as("__s"),
        sum((col("__r") * col("__r")).cast("decimal(38,0)")).as("__rr"))
    val agg = flagged.agg(count(lit(1)).as("n_items"), aggCols: _*)
    val sumC2 = (0 until k).map(j =>
      expr(s"CAST(__c$j AS DECIMAL(38,0)) * __c$j"): Column).reduce(_ + _)
    agg
      .withColumn("__num",
        sumC2 * k - expr("CAST(__s AS DECIMAL(38,0)) * __s"))
      .withColumn("__den",
        expr(s"CAST($k AS DECIMAL(38,0)) * __s - __rr"))
      .select((col("n_items") +:
        (0 until k).map(j => col(s"__c$j").as(s"n_correct_${('a' + j).toChar}")) ++:
        Seq(
          expr(s"""CAST(CASE WHEN __den = 0 THEN 0
               ELSE ${k - 1} * __num * 1000 DIV __den END AS BIGINT)""")
            .as("q_milli"),
          expr(s"""CASE WHEN __den > 0
                AND ${k - 1} * __num * 1000 > $chi2CritMilli * __den
               THEN 'different' ELSE 'same' END""").as("verdict"))): _*)
  }

  /**
   * BENJAMINI–HOCHBERG step-up FDR control (BH '95, public) — the
   * multiple-testing gate a pipeline needs the moment it screens MANY
   * metrics at once (per-brand trends, per-segment gaps): sort the m
   * p-values ascending, find the largest rank k with p₍ᵢ₎ ≤ i·α/m, and
   * reject ranks 1..k (the step-up: EVERY smaller rank rejects, even
   * where its own inequality fails). The comparison is the exact integer
   * cross-multiplication p_ppm·m ≤ i·α_ppm — no division, no float.
   * Reports per test: p, rank, the rank's own BH bar (i·α/m, floored
   * ppm), and the reject flag.
   *
   * Scale shape: the input is a TEST-FAMILY frame (one row per screened
   * metric — a vocabulary, never row-scale), so the rank window rides
   * [[BoundedGlobalWindow]] and k* is a 1-row broadcast.
   */
  def benjaminiHochberg(tests: DataFrame, keyCol: String, pPpmCol: String,
      alphaPpm: Long = 50000L, carryCols: Seq[String] = Nil): DataFrame = {
    require(alphaPpm > 0 && alphaPpm < 1000000L, s"alphaPpm $alphaPpm outside (0, 1e6)")
    // carryCols ride through untouched (e.g. Dunn's z²), so a caller
    // never needs a second pass over `tests` to re-attach context.
    val t = tests.select(col(keyCol).cast("string").as("__k") +:
        col(pPpmCol).cast("long").as("__p") +:
        carryCols.map(col): _*)
      .filter(col("__k").isNotNull && col("__p").isNotNull)
    val ranked = t.withColumn("__i",
        row_number().over(BoundedGlobalWindow.orderBy(col("__p"), col("__k")))
          .cast("long"))
      .crossJoin(broadcast(t.agg(count(lit(1)).as("__m"))))
    val kstar = ranked
      .agg(coalesce(max(when(col("__p") * col("__m") <= col("__i") * alphaPpm,
        col("__i"))), lit(0L)).as("__kstar"))
    ranked.crossJoin(broadcast(kstar))
      .select(col("__k").as(keyCol) +: carryCols.map(col) :+
        col("__p").as("p_ppm") :+
        col("__i").as("p_rank") :+ col("__m").as("n_tests") :+
        expr(s"__i * $alphaPpm DIV __m").as("bh_bar_ppm") :+
        (col("__i") <= col("__kstar")).cast("int").as("rejected"): _*)
      .orderBy("p_rank", keyCol)
  }

  /**
   * Frozen 5% upper-tail χ² critical values in milli (public table,
   * truncated), df 1..24 — shared by every chi-square-family verdict so
   * the Spark operator and its DuckDB oracle compare against the SAME
   * constants. df 1 (3841) and df 2 (5991) match the values already
   * frozen into [[mcnemarPaired]] / [[cochranQ]].
   */
  val chi2Crit05Milli: Vector[Long] = Vector(
    3841L, 5991L, 7814L, 9487L, 11070L, 12591L, 14067L, 15507L,
    16919L, 18307L, 19675L, 21026L, 22362L, 23684L, 24995L, 26296L,
    27587L, 28869L, 30143L, 31410L, 32670L, 33924L, 35172L, 36415L)

  /** SQL CASE string mapping a df column to [[chi2Crit05Milli]]; built
    * once here so operator and oracle embed IDENTICAL constants. df
    * outside 1..24 gets critical value −1 (verdict 'untested'). */
  def chi2CritCaseSql(dfCol: String): String =
    chi2Crit05Milli.zipWithIndex
      .map { case (c, i) => s"WHEN $dfCol = ${i + 1} THEN $c" }
      .mkString("CASE ", " ", " ELSE -1 END")

  /**
   * Two-phase prefix count over a VALUE-COLLAPSED frame: given per-value
   * tie counts `__t` keyed by `__v`, append `__cb` = number of rows with
   * a strictly smaller value (the midrank base: the doubled midrank of a
   * value's tie block is `2·__cb + __t + 1`). Range-repartition by value
   * + per-partition running sum + a partition-count-bounded offset
   * window — [[ksDistance]]'s shape, never a single global sort task.
   */
  private def withCumBefore(vals: DataFrame): DataFrame = {
    val parted = vals.repartitionByRange(col("__v"))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy("__v")
    val local = parted.withColumn("__lt", sum(col("__t")).over(w))
    val offsets = local.groupBy("__pid")
      .agg(sum(col("__t")).as("__pt"))
      .withColumn("__off",
        sum(col("__pt")).over(BoundedGlobalWindow.orderBy("__pid")) - col("__pt"))
      .select(col("__pid").as("_o_pid"), col("__off"))
    local.join(broadcast(offsets), col("__pid") === col("_o_pid"))
      .withColumn("__cb", col("__off") + col("__lt") - col("__t"))
      .drop("__pid", "__lt", "_o_pid", "__off")
  }

  /**
   * MANN–WHITNEY U (Wilcoxon rank-sum, public '47) — does arm B's value
   * distribution sit to the right of arm A's? The LOCATION complement of
   * [[ksDistance]]'s shape test, and the nonparametric replacement for a
   * t-test when the distribution is unknown. Midranks over the
   * value-collapsed pooled sample keep everything integral when DOUBLED:
   * `2R_A = Σ_v c_Av·(2·below_v + t_v + 1)`, `2U_A = 2R_A − n_A(n_A+1)`.
   * Reported: `auc_ppm = U_A/(n_A·n_B)` — the probability a random A
   * value exceeds a random B value (the U↔AUC identity), and the
   * tie-corrected normal-approximation z² in milli with the 5% verdict
   * via the EXACT integer inequality `30000·D² > 38415·n_A·n_B·vpart`
   * (D = 2U_A − n_A·n_B; vpart = ((n³−n) − Σ(t³−t)) DIV (n(n−1)), the
   * staged tie-corrected variance factor — truncated identically by both
   * engines). Products ride DECIMAL(38,0); D² terms bound validity at
   * ~10⁸ rows per test (documented; past that z² saturates anyway).
   *
   * Scale shape: one value-collapse exchange, the two-phase prefix sum,
   * one 1-row aggregate. No global sort, no join.
   */
  def mannWhitneyU(df: DataFrame, armB: Column, value: Column): DataFrame = {
    val vals = df
      .select(armB.cast("boolean").as("__b"), value.cast("long").as("__v"))
      .filter(col("__b").isNotNull && col("__v").isNotNull)
      .groupBy("__v")
      .agg(sum(when(!col("__b"), 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("__cb0"))
      .withColumn("__t", col("__ca") + col("__cb0"))
    withCumBefore(vals)
      .agg(coalesce(sum(col("__ca")), lit(0L)).as("__na"),
        coalesce(sum(col("__cb0")), lit(0L)).as("__nb"),
        coalesce(sum(expr("CAST(__ca AS DECIMAL(38,0)) * (2 * __cb + __t + 1)")),
          lit(0).cast("decimal(38,0)")).as("__r2a"),
        coalesce(sum(expr("CAST(__t AS DECIMAL(38,0)) * (__t - 1) * (__t + 1)")),
          lit(0).cast("decimal(38,0)")).as("__ties"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        expr("CAST(__r2a - CAST(__na AS DECIMAL(38,0)) * (__na + 1) AS BIGINT)")
          .as("u2_a"),
        expr("""CAST(CASE WHEN __na = 0 OR __nb = 0 THEN 0
             ELSE (__r2a - CAST(__na AS DECIMAL(38,0)) * (__na + 1)) * 1000000
                  DIV (2 * CAST(__na AS DECIMAL(38,0)) * __nb)
             END AS BIGINT)""").as("auc_ppm"),
        expr("""CAST(CASE WHEN __na = 0 OR __nb = 0 THEN 0 ELSE
             CAST((CAST(__na + __nb AS DECIMAL(38,0)) * (__na + __nb) * (__na + __nb)
                   - (__na + __nb) - __ties)
                  DIV (CAST(__na + __nb AS DECIMAL(38,0)) * (__na + __nb - 1))
                  AS BIGINT) END AS BIGINT)""").as("__vpart"),
        expr("""CAST(__r2a - CAST(__na AS DECIMAL(38,0)) * (__na + 1)
             - CAST(__na AS DECIMAL(38,0)) * __nb AS DECIMAL(38,0))""").as("__d"))
      .select(col("n_a"), col("n_b"), col("u2_a"), col("auc_ppm"),
        expr("""CAST(CASE WHEN n_a = 0 OR n_b = 0 OR __vpart <= 0 THEN 0
             ELSE __d * __d * 3000
                  DIV (CAST(n_a AS DECIMAL(38,0)) * n_b * __vpart)
             END AS BIGINT)""").as("z2_milli"),
        expr("""CASE WHEN n_a > 0 AND n_b > 0 AND __vpart > 0
               AND __d * __d * 30000
                   > CAST(38415 AS DECIMAL(38,0)) * n_a * n_b * __vpart
             THEN 'different' ELSE 'same' END""").as("verdict"))
  }

  /**
   * ANSARI–BRADLEY scale test (public '60) — the DISPERSION complement
   * of [[mannWhitneyU]]'s location test: do two groups' values have the
   * same SPREAD around the common median? Scores rise toward the middle
   * of the pooled ordering (`a = min(rank, N+1−rank)`), so a group whose
   * mass sits in the tails under-collects score. Doubled midrank scores
   * stay integral under ties (`s2_v = min(m2_v, 2(N+1) − m2_v)` with
   * `m2_v = 2·below_v + t_v + 1`; the tied convention scores the tie
   * block's MIDRANK — documented choice, identical in both engines).
   * The verdict uses the exact PERMUTATION moments of a linear rank
   * statistic under simple random sampling: with S1 = Σ t_v·s2_v,
   * S2 = Σ t_v·s2_v², A2 = Σ ca_v·s2_v,
   * `z² = (N−1)·(N·A2 − n_a·S1)² / (n_a·n_b·(N·S2 − S1²))`, reported in
   * milli with the 5% χ²₁ verdict by exact cross-multiplication.
   * DECIMAL(38,0) staging of the ~N⁷ numerator bounds validity at ~10⁴
   * pooled rows (documented — scale tests at corpus size run on a
   * sample; beyond, the decimal stage nulls and the verdict guards to
   * 'same'/0). All-tied corpora (zero score variance) report 0/'same'.
   *
   * Scale shape: one value collapse, the [[withCumBefore]] two-phase
   * prefix sum, a broadcast 1-row totals join, one 1-row aggregate.
   */
  def ansariBradleyScale(df: DataFrame, armB: Column, value: Column): DataFrame = {
    val vals = df
      .select(armB.cast("boolean").as("__b"), value.cast("long").as("__v"))
      .filter(col("__b").isNotNull && col("__v").isNotNull)
      .groupBy("__v")
      .agg(sum(when(!col("__b"), 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("__cb0"))
      .withColumn("__t", col("__ca") + col("__cb0"))
    val ranked = withCumBefore(vals)
    val tot = ranked.agg(coalesce(sum(col("__ca")), lit(0L)).as("__tna"),
      coalesce(sum(col("__cb0")), lit(0L)).as("__tnb"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("__s2", expr(
        "least(2 * __cb + __t + 1, 2 * (__tna + __tnb + 1) - (2 * __cb + __t + 1))"))
      .agg(max(col("__tna")).as("n_a"), max(col("__tnb")).as("n_b"),
        coalesce(sum(expr("CAST(__ca AS DECIMAL(38,0)) * __s2")),
          lit(0).cast("decimal(38,0)")).as("__a2"),
        coalesce(sum(expr("CAST(__t AS DECIMAL(38,0)) * __s2")),
          lit(0).cast("decimal(38,0)")).as("__s1"),
        coalesce(sum(expr("CAST(__t AS DECIMAL(38,0)) * __s2 * __s2")),
          lit(0).cast("decimal(38,0)")).as("__ss"))
      .select(coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        expr("CAST(__a2 AS BIGINT)").as("ab2_a"),
        expr("""CAST((CAST(n_a AS DECIMAL(38,0)) + n_b) * __a2
             - CAST(n_a AS DECIMAL(38,0)) * __s1 AS DECIMAL(38,0))""")
          .as("__num"),
        expr("""CAST(CAST(n_a AS DECIMAL(38,0)) * n_b
             * ((CAST(n_a AS DECIMAL(38,0)) + n_b) * __ss - __s1 * __s1)
             AS DECIMAL(38,0))""").as("__den"))
      .select(col("n_a"), col("n_b"), col("ab2_a"),
        expr("""CAST(CASE WHEN __den IS NULL OR __den <= 0
               OR n_a + n_b < 2 THEN 0
             ELSE __num * __num * 1000 * (n_a + n_b - 1) DIV __den
             END AS BIGINT)""").as("z2_milli"),
        expr("""CASE WHEN __den IS NULL OR __den <= 0 OR n_a + n_b < 2
             THEN 'same'
             WHEN __num * __num * 10000 * (n_a + n_b - 1)
                  > CAST(38415 AS DECIMAL(38,0)) * __den
             THEN 'different' ELSE 'same' END""").as("verdict"))
  }

  /**
   * Shared pooled-midrank staging for the k-group rank tests
   * ([[kruskalWallisH]], [[dunnPosthoc]]): value-collapse per (group,
   * value), pool per value, two-phase prefix sum, then per-group doubled
   * rank sums `R2_g = Σ_v c_gv·(2·below_v + t_v + 1)` and the pooled tie
   * term `Σ(t³−t)` as a 1-row frame to broadcast.
   */
  private def pooledGroupRankSums(df: DataFrame, group: Column,
      value: Column): (DataFrame, DataFrame) = {
    // NOTE on reuse: the bounded frames here feed several downstream
    // branches; Spark's ReusedExchange dedupes the corpus collapse
    // across them, and measured at sf0.1 adding .cache() barriers COST
    // ~1.4 s (broken codegen pipelines) — so no caching here.
    val gv = df
      .select(group.cast("string").as("__g"), value.cast("long").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
      .groupBy("__g", "__v").agg(count(lit(1)).as("__c"))
    val vals = gv.groupBy("__v").agg(sum(col("__c")).as("__t"))
    val ranked = withCumBefore(vals)
    val perGroup = gv.join(ranked, "__v")
      .groupBy("__g")
      .agg(sum(col("__c")).as("__ng"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * (2 * __cb + __t + 1)"))
          .as("__r2g"))
    val ties = ranked.agg(
      coalesce(sum(expr("CAST(__t AS DECIMAL(38,0)) * (__t - 1) * (__t + 1)")),
        lit(0).cast("decimal(38,0)")).as("__ties"))
    (perGroup, ties)
  }

  /**
   * KRUSKAL–WALLIS H (public '52) — the k-group generalization of
   * [[mannWhitneyU]]: do the groups' value distributions share a
   * location? Doubled midranks keep rank sums integral
   * (`R2_g = Σ_v c_gv·(2·below_v + t_v + 1)`); each group's `R2_g² DIV n_g`
   * truncates ≤1 identically in both engines (k-bounded total error on a
   * ~n³ quantity). Tie-corrected H folds the correction into ONE staged
   * division: `H_c = (3·Σterm − 3n(n+1)²)·(n−1) / ((n³−n) − Σ(t³−t))`,
   * reported in milli with the 5% verdict against the FROZEN
   * [[chi2Crit05Milli]] table at df = k−1. All-tied corpora
   * (denominator 0) report 0/'same'; df > 24 reports 'untested'.
   * DECIMAL(38,0) staging bounds validity at ~10⁸ rows (documented).
   *
   * Scale shape: one (group, value) collapse, one value collapse + the
   * two-phase prefix sum, one value-keyed equi-join of the two bounded
   * frames, one k-bounded group aggregate, 1-row report.
   */
  def kruskalWallisH(df: DataFrame, group: Column, value: Column): DataFrame = {
    val (perGroup, ties) = pooledGroupRankSums(df, group, value)
    perGroup
      .agg(count(lit(1)).as("n_groups"),
        coalesce(sum(col("__ng")), lit(0L)).as("n_rows"),
        // per-group truncated term, floored ENTIRELY in decimal: Spark's
        // DIV returns BIGINT even on DECIMAL operands, so a quotient
        // ~4n²·n_g would silently wrap past ~10⁶ pooled rows. Subtracting
        // pmod first makes the decimal `/` exact (no remainder → no
        // rounding at the result scale), holding to the operator's 10⁸
        // bound; __r2g ≥ 0 so floor == truncate, matching DuckDB's `//`.
        coalesce(sum(expr(
          """CAST((__r2g * __r2g - pmod(__r2g * __r2g,
                 CAST(__ng AS DECIMAL(38,0))))
               / CAST(__ng AS DECIMAL(38,0)) AS DECIMAL(38,0))""")),
          lit(0).cast("decimal(38,0)")).as("__term"))
      .crossJoin(broadcast(ties))
      .select(col("n_rows"), col("n_groups"),
        // truncation in Σterm can push the numerator a hair NEGATIVE when
        // H ≈ 0; clamp BEFORE dividing — Spark DIV truncates toward zero
        // while DuckDB // floors, so a negative numerator would diverge.
        expr("""CAST(CASE WHEN CAST(n_rows AS DECIMAL(38,0)) * n_rows * n_rows
                  - n_rows - __ties <= 0 THEN 0
             WHEN 3000 * __term
                  <= CAST(3000 AS DECIMAL(38,0)) * n_rows * (n_rows + 1) * (n_rows + 1)
             THEN 0
             ELSE (3000 * __term
                   - CAST(3000 AS DECIMAL(38,0)) * n_rows * (n_rows + 1) * (n_rows + 1))
                  * (n_rows - 1)
                  DIV (CAST(n_rows AS DECIMAL(38,0)) * n_rows * n_rows
                       - n_rows - __ties)
             END AS BIGINT)""").as("h_milli"),
        expr(Analytics.chi2CritCaseSql("(n_groups - 1)")).as("__crit"))
      .select(col("n_rows"), col("n_groups"), col("h_milli"),
        expr("""CASE WHEN __crit < 0 THEN 'untested'
             WHEN h_milli > __crit THEN 'different' ELSE 'same' END""")
          .as("verdict"))
  }

  /**
   * WILCOXON SIGNED-RANK (public '45) — the PAIRED location test: over
   * per-unit differences d, are positives systematically larger-ranked
   * than negatives? Zero differences drop (the standard reduced-sample
   * convention, documented); midranks over the value-collapsed |d| keep
   * the positive rank sum integral when doubled
   * (`W2⁺ = Σ_v cpos_v·(2·below_v + t_v + 1)`). The tie-corrected
   * normal-approximation z² = 3·D²/Var48 with D = 2·W2⁺ − n(n+1) and
   * Var48 = 2n(n+1)(2n+1) − Σ(t³−t), reported in milli, 5% verdict via
   * the exact inequality `30000·D² > 38415·Var48`. DECIMAL(38,0)
   * staging; ~10⁸-pair validity bound (documented).
   *
   * Scale shape: one |d| collapse, the two-phase prefix sum, one 1-row
   * aggregate.
   */
  def wilcoxonSignedRank(df: DataFrame, left: Column, right: Column): DataFrame = {
    val vals = df
      .select((left.cast("long") - right.cast("long")).as("__d"))
      .filter(col("__d").isNotNull && col("__d") =!= 0L)
      .select(abs(col("__d")).as("__v"), (col("__d") > 0L).as("__pos"))
      .groupBy("__v")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("__cp"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("__cn"))
      .withColumn("__t", col("__cp") + col("__cn"))
    withCumBefore(vals)
      .agg(coalesce(sum(col("__cp")), lit(0L)).as("n_pos"),
        coalesce(sum(col("__cn")), lit(0L)).as("n_neg"),
        sum(expr("CAST(__cp AS DECIMAL(38,0)) * (2 * __cb + __t + 1)"))
          .as("__w2p"),
        sum(expr("CAST(__t AS DECIMAL(38,0)) * (__t - 1) * (__t + 1)"))
          .as("__ties"))
      .select((col("n_pos") + col("n_neg")).as("n_nonzero"),
        col("n_pos"), col("n_neg"),
        expr("CAST(coalesce(__w2p, CAST(0 AS DECIMAL(38,0))) AS BIGINT)")
          .as("w2_pos"),
        expr("""CAST(2 * coalesce(__w2p, CAST(0 AS DECIMAL(38,0)))
             - CAST(n_pos + n_neg AS DECIMAL(38,0)) * (n_pos + n_neg + 1)
             AS DECIMAL(38,0))""").as("__dd"),
        expr("""CAST(2 * CAST(n_pos + n_neg AS DECIMAL(38,0))
               * (n_pos + n_neg + 1) * (2 * (n_pos + n_neg) + 1)
             - coalesce(__ties, CAST(0 AS DECIMAL(38,0)))
             AS DECIMAL(38,0))""").as("__var48"))
      .select(col("n_nonzero"), col("n_pos"), col("n_neg"), col("w2_pos"),
        expr("""CAST(CASE WHEN n_nonzero = 0 OR __var48 <= 0 THEN 0
             ELSE __dd * __dd * 3000 DIV __var48 END AS BIGINT)""")
          .as("z2_milli"),
        expr("""CASE WHEN n_nonzero > 0 AND __var48 > 0
               AND __dd * __dd * 30000 > 38415 * __var48
             THEN 'different' ELSE 'same' END""").as("verdict"))
  }

  /**
   * CRAMÉR's V effect size (public '46) — the 1-row companion of
   * [[chiSquareAudit]]: HOW STRONG is the association the per-cell audit
   * localizes? `φ² = χ²/N`, `V² = φ²/min(r−1, c−1)` — reported SQUARED in
   * ppm (monotone in V; avoids a cross-engine sqrt), with χ² in milli
   * and the 5% independence verdict against [[chi2Crit05Milli]] at
   * df = (r−1)(c−1) (df > 24 → 'untested'). Observed cells contribute
   * the audit's exact floored terms; cells ABSENT from the contingency
   * frame (O = 0, which a groupBy never materializes) contribute their
   * full expected mass via the closed form Σ_absent E = (N² − Σ_obs
   * RT·CT)/N — so χ² is exact for SPARSE tables too, where the audit
   * alone would understate it.
   *
   * Scale shape: one contingency collapse, broadcast marginals, a
   * cell-bounded 1-row aggregate.
   */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("observed"))
    val aTot = cells.groupBy(aCol).agg(sum(col("observed")).as("__rt"))
    val bTot = cells.groupBy(bCol).agg(sum(col("observed")).as("__ct"))
    val nTot = cells.agg(coalesce(sum(col("observed")), lit(0L)).as("__n"))
    cells
      .join(broadcast(aTot), aCol).join(broadcast(bTot), bCol)
      .crossJoin(broadcast(nTot))
      .agg(countDistinct(col(aCol)).as("n_a_levels"),
        countDistinct(col(bCol)).as("n_b_levels"),
        max(col("__n")).as("n_rows"),
        coalesce(sum(expr("""CAST(
            (CAST(observed AS DECIMAL(38,0)) * __n - CAST(__rt AS DECIMAL(38,0)) * __ct)
          * (CAST(observed AS DECIMAL(38,0)) * __n - CAST(__rt AS DECIMAL(38,0)) * __ct)
          * 1000000
          DIV (CAST(__n AS DECIMAL(38,0)) * __rt * __ct) AS DECIMAL(38,0))""")),
          lit(0).cast("decimal(38,0)")).as("__chiobs"),
        coalesce(sum(expr("CAST(__rt AS DECIMAL(38,0)) * __ct")),
          lit(0).cast("decimal(38,0)")).as("__sume"))
      .select(coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        col("n_a_levels"), col("n_b_levels"),
        expr("""__chiobs + CASE WHEN n_rows IS NULL OR n_rows = 0
             THEN CAST(0 AS DECIMAL(38,0))
             ELSE (CAST(n_rows AS DECIMAL(38,0)) * n_rows - __sume) * 1000000
                  DIV n_rows END""").as("__chi2micro"))
      .select(col("n_rows"), col("n_a_levels"), col("n_b_levels"),
        expr("__chi2micro DIV 1000").as("chi2_milli"),
        expr("""CAST(CASE WHEN n_rows = 0 THEN 0
             ELSE __chi2micro DIV n_rows END AS BIGINT)""").as("phi2_ppm"),
        expr("""CAST(CASE WHEN n_rows = 0
                  OR least(n_a_levels, n_b_levels) <= 1 THEN 0
             ELSE __chi2micro DIV n_rows
                  DIV least(n_a_levels - 1, n_b_levels - 1)
             END AS BIGINT)""").as("v2_ppm"),
        expr(Analytics.chi2CritCaseSql(
          "((n_a_levels - 1) * (n_b_levels - 1))")).as("__crit"))
      .select(col("n_rows"), col("n_a_levels"), col("n_b_levels"),
        col("chi2_milli"), col("phi2_ppm"), col("v2_ppm"),
        expr("""CASE WHEN __crit < 0 THEN 'untested'
             WHEN chi2_milli > __crit THEN 'associated' ELSE 'independent' END""")
          .as("verdict"))
  }

  /**
   * FRIEDMAN test (public '37) + Kendall's W — do k treatments rank
   * consistently across b blocks? The within-block design removes the
   * block effect the pooled [[kruskalWallisH]] would confound. Input is
   * one CELL per (block, treatment); incomplete blocks (any treatment
   * missing or duplicated) drop — the standard complete-block
   * requirement, enforced exactly. Within-block doubled midranks come
   * from two k-BOUNDED windows (`2r = 2·min_rank + ties − 1`); the
   * tie-corrected statistic is all-integer by the doubled-rank identity
   * `χ²_F = (k−1)·Σ_j(R2_j − b(k+1))² / (A4 − C4)` with
   * `A4 = Σ(2r)²`, `C4 = b·k·(k+1)²` (at full within-block ties
   * A4 = C4 → 0/'same'); Kendall's concordance W = χ²_F/(b(k−1)) =
   * Σd²/((A4−C4)·b), reported in ppm. 5% verdict against the frozen
   * [[chi2Crit05Milli]] table at df = k−1.
   *
   * Scale shape: one (block, treatment) cell frame, two per-block
   * bounded windows, one k-bounded treatment aggregate, 1-row report.
   * Moments ride DECIMAL(38,0).
   */
  def friedmanTest(cells: DataFrame, blockCol: String, treatCol: String,
      value: Column): DataFrame = {
    val base = cells.select(col(blockCol).cast("string").as("__b"),
        col(treatCol).cast("string").as("__t"), value.cast("long").as("__v"))
      .filter(col("__b").isNotNull && col("__t").isNotNull
        && col("__v").isNotNull)
    val kTot = base.agg(countDistinct(col("__t")).as("__k"))
    val blockSize = base.groupBy("__b")
      .agg(count(lit(1)).as("__bn"), countDistinct(col("__t")).as("__bk"))
    // blockSize is |blocks|-bounded but post-aggregation (no size stats),
    // so Spark would fall back to a sort-merge join — broadcast it.
    val complete = base
      .join(broadcast(blockSize), "__b")
      .crossJoin(broadcast(kTot))
      .filter(col("__bn") === col("__k") && col("__bk") === col("__k"))
    val wB = Window.partitionBy("__b").orderBy("__v")
    val ranked = complete
      .withColumn("__minrk", rank().over(wB).cast("long"))
      .withColumn("__tie",
        count(lit(1)).over(Window.partitionBy("__b", "__v")).cast("long"))
      .withColumn("__r2", lit(2L) * col("__minrk") + col("__tie") - 1L)
    val a4 = ranked.agg(
      coalesce(sum(expr("CAST(__r2 AS DECIMAL(38,0)) * __r2")),
        lit(0).cast("decimal(38,0)")).as("__a4"))
    ranked.groupBy("__t")
      .agg(sum(col("__r2")).as("__r2j"), count(lit(1)).as("__bj"))
      .agg(count(lit(1)).as("n_treatments"),
        coalesce(max(col("__bj")), lit(0L)).as("n_blocks"),
        coalesce(sum(expr("CAST(__r2j AS DECIMAL(38,0)) * __r2j")),
          lit(0).cast("decimal(38,0)")).as("__s2"))
      .crossJoin(broadcast(a4))
      .select(col("n_blocks"), col("n_treatments"),
        // Σd² = ΣR2j² − k·(b(k+1))² since ΣR2j = b·k·(k+1) exactly on
        // complete blocks; den = A4 − C4
        expr("""CAST(__s2 - CAST(n_treatments AS DECIMAL(38,0))
             * (CAST(n_blocks AS DECIMAL(38,0)) * (n_treatments + 1))
             * (CAST(n_blocks AS DECIMAL(38,0)) * (n_treatments + 1))
             AS DECIMAL(38,0))""").as("__sumd2"),
        expr("""CAST(__a4 - CAST(n_blocks AS DECIMAL(38,0)) * n_treatments
             * (n_treatments + 1) * (n_treatments + 1)
             AS DECIMAL(38,0))""").as("__den"))
      .select(col("n_blocks"), col("n_treatments"),
        expr("""CAST(CASE WHEN __den <= 0 OR __sumd2 <= 0 THEN 0
             ELSE 1000 * (n_treatments - 1) * __sumd2 DIV __den
             END AS BIGINT)""").as("chi2_milli"),
        expr("""CAST(CASE WHEN __den <= 0 OR __sumd2 <= 0 OR n_blocks = 0
             THEN 0
             ELSE 1000000 * __sumd2 DIV (__den * n_blocks)
             END AS BIGINT)""").as("kendall_w_ppm"),
        expr(Analytics.chi2CritCaseSql("(n_treatments - 1)")).as("__crit"))
      .select(col("n_blocks"), col("n_treatments"), col("chi2_milli"),
        col("kendall_w_ppm"),
        expr("""CASE WHEN n_treatments <= 1 OR __crit < 0 THEN 'untested'
             WHEN chi2_milli > __crit THEN 'different' ELSE 'same' END""")
          .as("verdict"))
  }

  /**
   * JONCKHEERE–TERPSTRA ordered trend test (public '54) — completes the
   * rank-trend 2×2: {independent, blocked} × {any-alternative, ordered}
   * = {[[kruskalWallisH]], [[friedmanTest]], this, [[pageTrendTest]]}.
   * For k INDEPENDENT groups carrying an a-priori order, do values rise
   * (or fall) with the order? KW fires on any location disagreement;
   * JT pools the Σ_{g<h} pairwise Mann–Whitney counts so only a
   * consistent ordering accumulates signal. Doubled pair counts stay
   * integral under ties (`JT2 = Σ_{g<h} (2·#{a<b} + #{a=b})`), assembled
   * WITHOUT any pairwise join: a dense (group × value) grid of collapsed
   * counts, one per-group prefix window over values (pairs with smaller
   * values), one per-value prefix window over the group order (pairs
   * from earlier groups), one aggregate. Mean `E2 = (N² − Σn_g²)/2`; the
   * exact tie-corrected permutation variance is the classic three-term
   * form over the common denominator `D = 72·N(N−1)(N−2)`:
   * `VarNum = A·N(N−1)(N−2) + 2·B + 9·C·(N−2)` with
   * A = N(N−1)(2N+5) − Σ_g n(n−1)(2n+5) − Σ_v t(t−1)(2t+5),
   * B = Σ_g n(n−1)(n−2) · Σ_v t(t−1)(t−2), C = Σ_g n(n−1) · Σ_v t(t−1)
   * (all-tied corpora cancel to VarNum = 0 exactly → 'none').
   * `z² = (JT2−E2)²·D / (4·VarNum)`, milli, 5% χ²₁ verdict by exact
   * cross-multiplication, direction in sign(JT2−E2). DECIMAL(38,0)
   * staging of the ~72·N⁷ product bounds validity at ~10⁴–10⁵ pooled
   * rows (documented — ordered-trend screens at corpus scale run on
   * samples; beyond, the decimal stage nulls and the verdict guards).
   * NOTE the guard is Spark-side only: a DuckDB oracle staging the same
   * product in HUGEINT RAISES on overflow rather than returning NULL, so
   * past the bound the oracle errors where this operator degrades to
   * 'none' — the bound is where engine/oracle agreement is certified,
   * not merely where the verdict loses power. The same asymmetry applies
   * to every DECIMAL(38,0)-staged verdict in this file.
   *
   * Scale shape: one (group, value) collapse; the grid is k·|values|
   * rows of already-collapsed data (k-row spine broadcast under the
   * value list); two partitioned prefix windows (group-, then
   * value-keyed — never global); 1-row moments.
   */
  def jonckheereTerpstra(df: DataFrame, groupOrder: Column,
      value: Column): DataFrame = {
    val gv = df
      .select(groupOrder.cast("long").as("__j"), value.cast("long").as("__v"))
      .filter(col("__j").isNotNull && col("__v").isNotNull)
      .groupBy("__j", "__v").agg(count(lit(1)).as("__c"))
    val js = gv.select("__j").distinct()
    val vs = gv.groupBy("__v").agg(sum(col("__c")).as("__t"))
    val grid = broadcast(js).crossJoin(vs.select("__v"))
      .join(gv.select("__j", "__v", "__c"), Seq("__j", "__v"), "left")
      .withColumn("__c0", coalesce(col("__c"), lit(0L)))
    val wJ = Window.partitionBy("__j").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wV = Window.partitionBy("__v").orderBy("__j")
      .rowsBetween(Window.unboundedPreceding, -1)
    val jt = grid
      .withColumn("__cb", coalesce(sum(col("__c0")).over(wJ), lit(0L)))
      .withColumn("__less2", coalesce(sum(col("__cb")).over(wV), lit(0L)))
      .withColumn("__tie", coalesce(sum(col("__c0")).over(wV), lit(0L)))
      .agg(coalesce(sum(expr(
        "CAST(__c0 AS DECIMAL(38,0)) * (2 * __less2 + __tie)")),
        lit(0).cast("decimal(38,0)")).as("__jt2"))
    val gm = gv.groupBy("__j").agg(sum(col("__c")).as("__ng"))
      .agg(count(lit(1)).as("n_groups"),
        coalesce(sum(col("__ng")), lit(0L)).as("n_rows"),
        coalesce(sum(expr("CAST(__ng AS DECIMAL(38,0)) * __ng")),
          lit(0).cast("decimal(38,0)")).as("__sn2"),
        coalesce(sum(expr(
          "CAST(__ng AS DECIMAL(38,0)) * (__ng - 1) * (2 * __ng + 5)")),
          lit(0).cast("decimal(38,0)")).as("__ga"),
        coalesce(sum(expr(
          "CAST(__ng AS DECIMAL(38,0)) * (__ng - 1) * (__ng - 2)")),
          lit(0).cast("decimal(38,0)")).as("__gb"),
        coalesce(sum(expr("CAST(__ng AS DECIMAL(38,0)) * (__ng - 1)")),
          lit(0).cast("decimal(38,0)")).as("__gc2"))
    val tm = vs.agg(
      coalesce(sum(expr(
        "CAST(__t AS DECIMAL(38,0)) * (__t - 1) * (2 * __t + 5)")),
        lit(0).cast("decimal(38,0)")).as("__ta"),
      coalesce(sum(expr(
        "CAST(__t AS DECIMAL(38,0)) * (__t - 1) * (__t - 2)")),
        lit(0).cast("decimal(38,0)")).as("__tb"),
      coalesce(sum(expr("CAST(__t AS DECIMAL(38,0)) * (__t - 1)")),
        lit(0).cast("decimal(38,0)")).as("__tc2"))
    gm.crossJoin(broadcast(jt)).crossJoin(broadcast(tm))
      .select(col("n_rows"), col("n_groups"),
        expr("CAST(__jt2 AS BIGINT)").as("jt2_stat"),
        expr("""CAST(__jt2 - (CAST(n_rows AS DECIMAL(38,0)) * n_rows - __sn2)
             / 2 AS DECIMAL(38,0))""").as("__num"),
        expr("""CAST((CAST(n_rows AS DECIMAL(38,0)) * (n_rows - 1)
               * (2 * n_rows + 5) - __ga - __ta)
             * (CAST(n_rows AS DECIMAL(38,0)) * (n_rows - 1) * (n_rows - 2))
             + 2 * __gb * __tb
             + 9 * __gc2 * __tc2 * (n_rows - 2)
             AS DECIMAL(38,0))""").as("__varnum"),
        expr("""CAST(72 * CAST(n_rows AS DECIMAL(38,0)) * (n_rows - 1)
             * (n_rows - 2) AS DECIMAL(38,0))""").as("__dd"))
      .select(col("n_rows"), col("n_groups"), col("jt2_stat"),
        expr("""CAST(CASE WHEN n_rows < 3 OR __varnum IS NULL
               OR __varnum <= 0 THEN 0
             ELSE __num * __num * 250 * __dd DIV __varnum
             END AS BIGINT)""").as("z2_milli"),
        expr("""CASE WHEN n_rows < 3 OR __varnum IS NULL OR __varnum <= 0
             THEN 'none'
             WHEN __num * __num * 2500 * __dd
                  > CAST(38415 AS DECIMAL(38,0)) * __varnum
             THEN CASE WHEN __num > 0 THEN 'rising' ELSE 'falling' END
             ELSE 'none' END""").as("verdict"))
  }

  /**
   * MURPHY DECOMPOSITION of the Brier score (public '73) — the
   * calibration table's one-row summary: BS = RELIABILITY − RESOLUTION +
   * UNCERTAINTY over the prediction bins. Reliability is the
   * calibration error a temperature rescale could remove; resolution is
   * the discrimination the score actually carries (how far bin outcome
   * rates sit from the base rate); uncertainty is the data's intrinsic
   * E(N−E)/N² floor no model can beat. A low Brier score alone cannot
   * distinguish "well calibrated" from "predicting the base rate
   * everywhere" — this table can.
   *
   * Exact integer arithmetic in micro (1e-6 of probability²):
   * predictions are milli-probabilities in [0, 1000] (rows outside drop,
   * counted nowhere), per-bin terms floor once per bin with the floor
   * MIRRORED in the oracle; the resolution term `(e_k·N − n_k·E)² / n_k`
   * floors through DECIMAL pmod subtraction (quotient ≤ N³ silently
   * wraps a plain DIV past ~10⁶ rows — the x594 lesson). The exact
   * identity holds only pre-floor, so the residual `identity_gap_micro`
   * (|gap| ≤ a few micro, bin-count bounded) is REPORTED rather than
   * hidden.
   *
   * Scale shape: one corpus collapse to the ≤1001-bin table, one 1-row
   * aggregate. Nothing joined, nothing windowed.
   */
  def brierDecomposition(df: DataFrame, pMilli: Column,
      positive: Column): DataFrame = {
    val bins = df
      .select(pMilli.cast("long").as("__p"),
        positive.cast("boolean").cast("long").as("__y"))
      .filter(col("__p").isNotNull && col("__y").isNotNull
        && col("__p") >= 0L && col("__p") <= 1000L)
      .groupBy("__p")
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__e"))
    val tot = bins.agg(coalesce(sum(col("__n")), lit(0L)).as("__tn"),
      coalesce(sum(col("__e")), lit(0L)).as("__te"))
    bins.crossJoin(broadcast(tot))
      .agg(max(col("__tn")).as("n_docs"), max(col("__te")).as("__E"),
        coalesce(sum(expr(
          """CAST(__n AS DECIMAL(38,0)) * __p * __p
             - 2000 * CAST(__p AS DECIMAL(38,0)) * __e
             + 1000000 * CAST(__e AS DECIMAL(38,0))""")),
          lit(0).cast("decimal(38,0)")).as("__bs"),
        coalesce(sum(expr(
          """(CAST(__n AS DECIMAL(38,0)) * __p - 1000 * __e)
             * (CAST(__n AS DECIMAL(38,0)) * __p - 1000 * __e)
             DIV __n""")), lit(0).cast("decimal(38,0)")).as("__rel"),
        coalesce(sum(expr(
          """CAST(((CAST(__e AS DECIMAL(38,0)) * __tn
                 - CAST(__n AS DECIMAL(38,0)) * __te)
               * (CAST(__e AS DECIMAL(38,0)) * __tn
                 - CAST(__n AS DECIMAL(38,0)) * __te)
             - pmod((CAST(__e AS DECIMAL(38,0)) * __tn
                 - CAST(__n AS DECIMAL(38,0)) * __te)
               * (CAST(__e AS DECIMAL(38,0)) * __tn
                 - CAST(__n AS DECIMAL(38,0)) * __te),
               CAST(__n AS DECIMAL(38,0))))
             / CAST(__n AS DECIMAL(38,0)) AS DECIMAL(38,0))""")),
          lit(0).cast("decimal(38,0)")).as("__res"))
      // The CASE guards resolve against the PRE-coalesce aggregate column
      // (max(__tn) = NULL on an empty frame), so each needs the explicit
      // IS NULL arm — without it the ELSE branch divides by NULL and the
      // whole report comes back NULL where the oracle reports 0s.
      .select(coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        expr("""CAST(CASE WHEN n_docs IS NULL OR n_docs = 0 THEN 0
             ELSE __bs DIV CAST(n_docs AS DECIMAL(38,0)) END AS BIGINT)""")
          .as("brier_micro"),
        expr("""CAST(CASE WHEN n_docs IS NULL OR n_docs = 0 THEN 0
             ELSE __rel DIV CAST(n_docs AS DECIMAL(38,0)) END AS BIGINT)""")
          .as("reliability_micro"),
        expr("""CAST(CASE WHEN n_docs IS NULL OR n_docs = 0 THEN 0
             ELSE __res * 1000000
                  DIV (CAST(n_docs AS DECIMAL(38,0)) * n_docs * n_docs)
             END AS BIGINT)""").as("resolution_micro"),
        expr("""CAST(CASE WHEN n_docs IS NULL OR n_docs = 0 THEN 0
             ELSE CAST(__E AS DECIMAL(38,0)) * (n_docs - __E) * 1000000
                  DIV (CAST(n_docs AS DECIMAL(38,0)) * n_docs)
             END AS BIGINT)""").as("uncertainty_micro"))
      .withColumn("identity_gap_micro",
        expr("""brier_micro
             - (reliability_micro - resolution_micro + uncertainty_micro)"""))
  }

  /**
   * PAGE's trend test (public '63, generalized to arbitrary integer dose
   * spacings) — the ORDERED-alternative complement of [[friedmanTest]]:
   * Friedman fires on ANY rank disagreement across treatments; this
   * fires only when within-block ranks rise (or fall) WITH a given
   * treatment order, with the direction in the sign. Same complete-block
   * staging and doubled within-block midranks as Friedman; the statistic
   * is the dose–rank cross product `L2 = Σ_b Σ_j j·r2_bj`, and the
   * verdict uses the EXACT permutation moments of a linear rank
   * statistic under within-block rank permutation (blocks independent):
   * with J1 = Σj, J2 = Σj² over the k ordered treatments,
   * Jpart = k·J2 − J1², per-block tie term q_b = k·Σ_j r2² − k²(k+1)²
   * (Σ_j r2 = k(k+1) exactly on a complete block), Q = Σ_b q_b,
   * E[L2] = b·(k+1)·J1 and `z² = (L2−E)²·k²·(k−1) / (Jpart·Q)` — milli,
   * 5% χ²₁ verdict by exact cross-multiplication, 'rising'/'falling' by
   * sign(L2−E). Dose shifts cancel exactly (L2 and E shift together), so
   * `j = year` and `j = year − 1991` verdict identically. All-tied
   * blocks (Q = 0) or k < 2 report 0/'none'.
   *
   * Scale shape: identical to [[friedmanTest]] — block-partitioned rank
   * windows (never global), per-block collapse, 1-row moments; the
   * treatment-list moments ride the k-row distinct frame.
   */
  def pageTrendTest(cells: DataFrame, blockCol: String, treatOrder: Column,
      value: Column): DataFrame = {
    val base = cells.select(col(blockCol).cast("string").as("__b"),
        treatOrder.cast("long").as("__j"), value.cast("long").as("__v"))
      .filter(col("__b").isNotNull && col("__j").isNotNull
        && col("__v").isNotNull)
    val kTot = base.agg(countDistinct(col("__j")).as("__k"))
    val blockSize = base.groupBy("__b")
      .agg(count(lit(1)).as("__bn"), countDistinct(col("__j")).as("__bk"))
    // complete blocks only (the Friedman rule): a block with every one of
    // the k global treatments exactly once. Post-aggregation frames carry
    // no size stats — broadcast explicitly.
    val complete = base
      .join(broadcast(blockSize), "__b")
      .crossJoin(broadcast(kTot))
      .filter(col("__bn") === col("__k") && col("__bk") === col("__k"))
    val wB = Window.partitionBy("__b").orderBy("__v")
    val ranked = complete
      .withColumn("__minrk", rank().over(wB).cast("long"))
      .withColumn("__tie",
        count(lit(1)).over(Window.partitionBy("__b", "__v")).cast("long"))
      .withColumn("__r2", lit(2L) * col("__minrk") + col("__tie") - 1L)
    val jm = complete.select("__j").distinct()
      .agg(coalesce(sum(col("__j")), lit(0L)).as("__j1"),
        coalesce(sum(expr("CAST(__j AS DECIMAL(38,0)) * __j")),
          lit(0).cast("decimal(38,0)")).as("__j2"))
    val perBlock = ranked.groupBy("__b")
      .agg(sum(expr("CAST(__j AS DECIMAL(38,0)) * __r2")).as("__l2b"),
        sum(expr("CAST(__r2 AS DECIMAL(38,0)) * __r2")).as("__s2b"))
    perBlock
      .agg(count(lit(1)).as("n_blocks"),
        coalesce(sum(col("__l2b")), lit(0).cast("decimal(38,0)")).as("__l2"),
        coalesce(sum(col("__s2b")), lit(0).cast("decimal(38,0)")).as("__ss"))
      .crossJoin(broadcast(jm))
      .crossJoin(broadcast(kTot))
      .select(col("n_blocks"), col("__k").as("n_treatments"),
        expr("CAST(__l2 AS BIGINT)").as("l2_stat"),
        expr("""CAST(__l2 - CAST(n_blocks AS DECIMAL(38,0)) * (__k + 1) * __j1
             AS DECIMAL(38,0))""").as("__num"),
        expr("""CAST((CAST(__k AS DECIMAL(38,0)) * __j2
               - CAST(__j1 AS DECIMAL(38,0)) * __j1)
             * (CAST(__k AS DECIMAL(38,0)) * __ss
               - CAST(n_blocks AS DECIMAL(38,0)) * __k * __k
                 * (__k + 1) * (__k + 1))
             AS DECIMAL(38,0))""").as("__den"))
      .select(col("n_blocks"), col("n_treatments"), col("l2_stat"),
        expr("""CAST(CASE WHEN __den IS NULL OR __den <= 0
               OR n_treatments < 2 THEN 0
             ELSE __num * __num * 1000 * n_treatments * n_treatments
                  * (n_treatments - 1) DIV __den
             END AS BIGINT)""").as("z2_milli"),
        expr("""CASE WHEN __den IS NULL OR __den <= 0 OR n_treatments < 2
             THEN 'none'
             WHEN __num * __num * 10000 * n_treatments * n_treatments
                  * (n_treatments - 1) > CAST(38415 AS DECIMAL(38,0)) * __den
             THEN CASE WHEN __num > 0 THEN 'rising' ELSE 'falling' END
             ELSE 'none' END""").as("verdict"))
  }

  /**
   * COCHRAN–ARMITAGE trend test (public '54/'55) — do the positive-class
   * proportions RISE (or fall) monotonically with an ordered integer
   * score? The dose–response complement of [[chiSquareAudit]]'s
   * any-association view: a chi-square can fire on a zig-zag, this fires
   * only on a trend, with the trend DIRECTION in the sign of the
   * statistic. All map-side integer moments — n, R = Σy, W₁ = Σw,
   * W₂ = Σw², T = Σw·y — then the classic
   * `z² = (n·T − R·W₁)²·(n−1) / (R·(n−R)·(n·W₂ − W₁²))` in milli with
   * the 5% χ²₁ verdict by exact cross-multiplied inequality. Degenerate
   * inputs (all/no positives, single score level) report 0/'none'
   * explicitly. DECIMAL(38,0) staging; numerator ~w²·n⁵ bounds validity
   * at ~10⁶ rows per test for w ≤ ~10 (documented; beyond, the verdict
   * saturates).
   *
   * Scale shape: one corpus scan collapsing to a 1-row moment aggregate
   * — nothing keyed, nothing joined.
   */
  def cochranArmitageTrend(df: DataFrame, weight: Column,
      positive: Column): DataFrame = {
    val flags = df
      .select(weight.cast("long").as("__w"),
        positive.cast("boolean").cast("long").as("__y"))
      .filter(col("__w").isNotNull && col("__y").isNotNull)
    trendFromMoments(flags
      .agg(count(lit(1)).as("n_rows"), sum(col("__y")).as("n_pos"),
        countDistinct(col("__w")).as("n_levels"),
        sum(col("__w")).as("__w1"),
        sum(expr("CAST(__w AS DECIMAL(38,0)) * __w")).as("__w2"),
        sum(expr("CAST(__w AS DECIMAL(38,0)) * __y")).as("__t")))
  }

  /**
   * Value-collapsed form of [[cochranArmitageTrend]]: when a per-bin
   * table (distinct weight, row count, positive count — one row per
   * weight level, the [[Curation.qualityGatedCuration]]-style staging) already
   * exists, the trend moments are IDENTICAL by exact integer arithmetic
   * (Σ over rows of wᵏ·y = Σ over bins of wᵏ·count), so the corpus scan
   * the row form would spend is saved. Same output schema and verdict.
   */
  def cochranArmitageTrendFromBins(bins: DataFrame, weight: Column,
      n: Column, nPos: Column): DataFrame = {
    val b = bins
      .select(weight.cast("long").as("__w"), n.cast("long").as("__nb"),
        nPos.cast("long").as("__eb"))
      .filter(col("__w").isNotNull && col("__nb").isNotNull
        && col("__eb").isNotNull)
    trendFromMoments(b
      .agg(coalesce(sum(col("__nb")), lit(0L)).as("n_rows"),
        sum(col("__eb")).as("n_pos"),
        count(lit(1)).as("n_levels"),
        sum(col("__w") * col("__nb")).as("__w1"),
        sum(expr("CAST(__w AS DECIMAL(38,0)) * __w * __nb")).as("__w2"),
        sum(expr("CAST(__w AS DECIMAL(38,0)) * __eb")).as("__t")))
  }

  /** Shared verdict tail of the two [[cochranArmitageTrend]] forms: the
    * 1-row moment frame (n_rows, n_pos, n_levels, __w1, __w2, __t) →
    * z²_milli + the exact cross-multiplied 5% verdict. */
  private def trendFromMoments(moments: DataFrame): DataFrame =
    moments
      .select(col("n_rows"), coalesce(col("n_pos"), lit(0L)).as("n_pos"),
        col("n_levels"),
        expr("""CAST(CAST(n_rows AS DECIMAL(38,0)) * __t
             - CAST(n_pos AS DECIMAL(38,0)) * __w1 AS DECIMAL(38,0))""")
          .as("__num"),
        expr("""CAST(CAST(n_pos AS DECIMAL(38,0)) * (n_rows - n_pos)
             * (CAST(n_rows AS DECIMAL(38,0)) * __w2
                - CAST(__w1 AS DECIMAL(38,0)) * __w1)
             AS DECIMAL(38,0))""").as("__den"))
      .select(col("n_rows"), col("n_pos"), col("n_levels"),
        expr("CAST(coalesce(__num, CAST(0 AS DECIMAL(38,0))) AS BIGINT)")
          .as("trend_num"),
        expr("""CAST(CASE WHEN __den IS NULL OR __den <= 0 OR n_rows < 2
             THEN 0
             ELSE __num * __num * 1000 * (n_rows - 1) DIV __den
             END AS BIGINT)""").as("z2_milli"),
        expr("""CASE
             WHEN __den IS NULL OR __den <= 0 OR n_rows < 2 THEN 'none'
             WHEN __num * __num * 10000 * (n_rows - 1)
                  > CAST(38415 AS DECIMAL(38,0)) * __den
             THEN CASE WHEN __num > 0 THEN 'rising' ELSE 'falling' END
             ELSE 'none' END""").as("verdict"))

  /**
   * DUNN's post-hoc pairwise test (public '64) with a Benjamini–Hochberg
   * gate — [[kruskalWallisH]] says the groups differ; this says WHICH
   * pairs, from the SAME pooled midranks (never re-ranking per pair, the
   * textbook requirement). Per pair: truncated doubled mean ranks
   * `m2_g = R2_g DIV n_g` (≤½-rank deterministic truncation, identical
   * in both engines), the tie-corrected
   * `z²_ij = 3(n−1)·(m2_i−m2_j)²·n_i·n_j / ((n_i+n_j)·((n³−n)−Σ(t³−t)))`
   * in milli, the distribution-free Chebyshev bound p ≤ 1/z² (ppm,
   * capped — conservative by construction, so a rejection is a
   * certificate), then [[benjaminiHochberg]] across all k(k−1)/2 pairs.
   * DECIMAL(38,0) staging; ~10⁶-row validity bound per the z² numerator
   * (documented — past it the Chebyshev p floors at 0 anyway).
   *
   * Scale shape: the pooled-rank staging (one corpus collapse), a
   * broadcast k²-bounded pair join, a |pairs|-bounded BH window.
   */
  def dunnPosthoc(df: DataFrame, group: Column, value: Column,
      alphaPpm: Long = 50000L): DataFrame = {
    // the k-ROW aggregated frame is consumed by three branches (means,
    // broadcast pair side, totals); caching it keeps the corpus-scale
    // pooled-rank staging to one pass while costing one tiny
    // materialization (KW's single-consumer path stays uncached).
    val (perGroup0, ties) = pooledGroupRankSums(df, group, value)
    val perGroup = perGroup0.cache()
    val means = perGroup.select(col("__g"), col("__ng"),
      expr("__r2g DIV CAST(__ng AS DECIMAL(38,0))").as("__m2"))
    val tot = perGroup.agg(coalesce(sum(col("__ng")), lit(0L)).as("__n"))
      .crossJoin(broadcast(ties))
    val pairs = means
      .join(broadcast(means.select(col("__g").as("__g2"),
        col("__ng").as("__ng2"), col("__m2").as("__m22"))),
        col("__g") < col("__g2"))
      .crossJoin(broadcast(tot))
      .select(concat(col("__g"), lit("|"), col("__g2")).as("pair"),
        expr("""CAST(CASE WHEN __n < 2
               OR CAST(__n AS DECIMAL(38,0)) * __n * __n - __n - __ties <= 0
             THEN 0
             ELSE 3000 * (__n - 1)
               * (CAST(__m2 - __m22 AS DECIMAL(38,0)) * (__m2 - __m22))
               * __ng * __ng2
               DIV (CAST(__ng + __ng2 AS DECIMAL(38,0))
                    * (CAST(__n AS DECIMAL(38,0)) * __n * __n - __n - __ties))
             END AS BIGINT)""").as("z2_milli"))
      .select(col("pair"), col("z2_milli"),
        expr("""CASE WHEN z2_milli <= 0 THEN 1000000
             ELSE LEAST(1000000, 1000000000 DIV z2_milli) END""")
          .as("p_ppm"))
    benjaminiHochberg(pairs, "pair", "p_ppm", alphaPpm,
        carryCols = Seq("z2_milli"))
      .orderBy("p_rank", "pair")
  }
}
