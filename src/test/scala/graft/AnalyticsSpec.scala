package graft

import org.apache.spark.sql.functions.{col, lit, pmod}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Analytics

class AnalyticsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: stages must occur strictly after the previous stage") {
    val events = Seq(
      // u1 completes the full ordered funnel
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2 clicked BEFORE signup — click doesn't count; purchase needs a
      // qualifying click so it doesn't count either
      (2L, ts("2024-01-02 09:00:00"), "click"),
      (2L, ts("2024-01-02 10:00:00"), "signup"),
      (2L, ts("2024-01-02 11:00:00"), "purchase"),
      // u3 purchase before click: stage2 yes, stage3 no
      (3L, ts("2024-01-03 10:00:00"), "signup"),
      (3L, ts("2024-01-03 10:30:00"), "purchase"),
      (3L, ts("2024-01-03 11:00:00"), "click"),
      // u4 never signed up
      (4L, ts("2024-01-04 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val r = Analytics.funnel(events, "user_id", "ts", "event_type",
      "signup", "click", "purchase").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("funnel: same-timestamp stage event is NOT after the previous stage") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val r = Analytics.funnel(events, "user_id", "ts", "event_type",
      "signup", "click", "purchase").collect().head
    assert((r.getLong(0), r.getLong(1)) == ((1L, 0L)))
  }

  test("cohort retention: offsets are whole weeks from the first-event week") {
    val events = Seq(
      // u1 first active Mon 2024-01-01 week; active again 2 weeks later
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-16 10:00:00")),
      // u2 same cohort week, active only in week 0 (two events, one row)
      (2L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-04 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Analytics.cohortRetention(events, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSet
    assert(out == Set(("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L)))
  }

  test("trendingTopK: per-window rank by count with alphabetical tie-break") {
    val events = Seq(
      (ts("2024-01-01 01:00:00"), "b"), (ts("2024-01-01 02:00:00"), "b"),
      (ts("2024-01-01 03:00:00"), "a"), (ts("2024-01-01 04:00:00"), "c"),
      (ts("2024-01-02 01:00:00"), "c")
    ).toDF("ts", "event_type")
    val out = Analytics.trendingTopK(events, "ts", "event_type", k = 2)
      .collect().map(r => (r.getTimestamp(0).toString.take(10), r.getString(1), r.getLong(2), r.getInt(3)))
      .toList.sortBy(x => (x._1, x._4))
    // day 1: b(2) then a(1) — 'a' beats 'c' on the tie; day 2: c(1)
    assert(out == List(
      ("2024-01-01", "b", 2L, 1), ("2024-01-01", "a", 1L, 2),
      ("2024-01-02", "c", 1L, 1)))
  }

  test("coOccurrenceLift: counts users with both types; lift is integer-exact") {
    val events = Seq(
      (1L, "x"), (1L, "y"), (1L, "x"), // dup event collapses
      (2L, "x"), (2L, "y"),
      (3L, "x"),
      (4L, "z")
    ).toDF("user_id", "event_type")
    val out = Analytics.coOccurrenceLift(events, "user_id", "event_type")
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    // n_users=4; x:3 users, y:2, z:1; (x,y) both:2 → lift = 2*4*1000 / (3*2) = 1333
    assert(out(("x", "y")) == ((2L, 1333L)))
    assert(!out.contains(("x", "z"))) // no shared user
  }

  test("rfmSegments: bands split on the configured thresholds") {
    val events = Seq(
      // u1: 3 events, last on anchor day, total 120 → r_hot, f_high, m_high
      (1L, ts("2024-01-10 10:00:00"), 50.0), (1L, ts("2024-01-11 10:00:00"), 50.0),
      (1L, ts("2024-01-12 10:00:00"), 20.0),
      // u2: 1 event 5 days before anchor, total 10 → r_cold, f_low, m_low
      (2L, ts("2024-01-07 10:00:00"), 10.0)
    ).toDF("user_id", "ts", "value")
    val out = Analytics.rfmSegments(events, "user_id", "ts", "value",
        rDays = (0, 1), fCounts = (3L, 2L), mTotals = (100.0, 50.0))
      .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toMap
    assert(out == Map(
      ("r_hot", "f_high", "m_high") -> 1L,
      ("r_cold", "f_low", "m_low") -> 1L))
  }

  test("sessionize: gap splits sessions; conversion and span are per session") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"), // same session (10 min)
      (1L, ts("2024-01-01 12:00:00"), "view"),     // > 30 min gap → session 2
      (2L, ts("2024-01-01 09:00:00"), "view")
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.sessionize(events, "user_id", "ts", "event_type", "purchase")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(out((1L, 1L)) == ((2L, 600L, 1))) // 2 events, 600 s span, converted
    assert(out((1L, 2L)) == ((1L, 0L, 0)))
    assert(out((2L, 1L)) == ((1L, 0L, 0)))
  }

  test("sessionize: an event exactly at the gap boundary stays in the session") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:30:00"), "view") // exactly 1800 s: NOT > gap
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.sessionize(events, "user_id", "ts", "event_type", "purchase")
      .collect()
    assert(out.length == 1 && out.head.getLong(2) == 2L)
  }

  test("gap fill: every day in the user's range appears; values carry forward") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10L, 1.0),
      (1L, ts("2024-01-01 11:00:00"), 11L, 2.0), // later event wins the day
      (1L, ts("2024-01-04 10:00:00"), 12L, 9.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Analytics.gapFillForwardFill(events, "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getDate(1).toString, Option(r.get(2)), r.getDouble(3))).toList
      .sortBy(_._1)
    assert(out == List(
      ("2024-01-01", Some(2.0), 2.0),
      ("2024-01-02", None, 2.0), // gap day forward-filled
      ("2024-01-03", None, 2.0),
      ("2024-01-04", Some(9.0), 9.0)))
  }

  test("lastTouchAttribution: most recent touch wins; no-touch lands in 'none'") {
    val events = Seq(
      // u1: click → purchase(10.00, 60s later) → view → purchase(5.00, 30s later)
      (1L, ts("2024-01-01 10:00:00"), "click", 0.0, 1L),
      (1L, ts("2024-01-01 10:01:00"), "purchase", 10.0, 2L),
      (1L, ts("2024-01-01 10:02:00"), "view", 0.0, 3L),
      (1L, ts("2024-01-01 10:02:30"), "purchase", 5.0, 4L),
      // u2: purchase with no preceding touch ever
      (2L, ts("2024-01-01 09:00:00"), "purchase", 7.0, 5L),
      // u1's click must not leak into u2
      (2L, ts("2024-01-01 09:30:00"), "error", 0.0, 6L)
    ).toDF("user_id", "ts", "event_type", "value", "event_id")
    val out = Analytics.lastTouchAttribution(events, "user_id", "ts",
      "event_type", "value", "event_id", Seq("click", "view"), "purchase")
      .orderBy("touch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(out.toSeq == Seq(
      ("click", 1L, 1000L, 60L),
      ("none", 1L, 700L, -1L),
      ("view", 1L, 500L, 30L)))
  }

  test("gapFillInterpolate: interior gaps get the exact weighted mean, hand-computed") {
    // user 1: day 1 = 100c, day 4 = 400c → day 2 = (100·2+400·1) DIV 3 = 200,
    // day 3 = (100·1+400·2) DIV 3 = 300. Downward slope user 2:
    // day 1 = 400c, day 3 = 100c → day 2 = (400·1+100·1) DIV 2 = 250.
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 100L, 1L),
      (2L, "2024-01-04 10:00:00", 400L, 1L),
      (3L, "2024-01-01 10:00:00", 400L, 2L),
      (4L, "2024-01-03 10:00:00", 100L, 2L)
    ).toDF("event_id", "ts_s", "cents", "user_id")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts_s").cast("timestamp"))
    val out = Analytics.gapFillInterpolate(df, "user_id", "ts", "event_id", "cents")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) -> r.getLong(3)).toMap
    assert(out((1L, "2024-01-02")) == 200L)
    assert(out((1L, "2024-01-03")) == 300L)
    assert(out((2L, "2024-01-02")) == 250L)
    assert(out((1L, "2024-01-01")) == 100L) // observed days pass through
  }

  test("gapFillInterpolate: truncation is exact division floor on non-negative cents") {
    // day 1 = 0c, day 3 = 1c → day 2 = (0·1+1·1) DIV 2 = 0 (floor, not round)
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 0L, 9L),
      (2L, "2024-01-03 00:00:00", 1L, 9L)
    ).toDF("event_id", "ts_s", "cents", "user_id")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts_s").cast("timestamp"))
    val out = Analytics.gapFillInterpolate(df, "user_id", "ts", "event_id", "cents")
      .collect().map(r => r.getDate(1).toString -> r.getLong(3)).toMap
    assert(out("2024-01-02") == 0L)
  }

  test("weightedMedian: hand-computed, half-total boundary inclusive") {
    // group g: values 1 (w=3), 2 (w=1), 5 (w=4) → total 8, cum(1)=3, cum(2)=4;
    // 2·4 ≥ 8 so the median is 2, not 5 (boundary is inclusive)
    val df = Seq((1L, 3L, "g"), (2L, 1L, "g"), (5L, 4L, "g"),
      (7L, 9L, "h")).toDF("v", "w", "grp")
    val out = Analytics.weightedMedian(df, "grp", "v", "w")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("g") == ((2L, 8L)))
    assert(out("h") == ((7L, 9L)))
  }

  test("groupMode: deterministic tie-break by (count desc, value asc)") {
    val df = Seq(("s", "en"), ("s", "en"), ("s", "fr"), ("s", "fr"), ("s", "de"))
      .toDF("src", "lang")
    val r = Analytics.groupMode(df, "src", "lang").collect().head
    assert((r.getString(1), r.getLong(2)) == (("en", 2L))) // en before fr on tie
  }

  test("groupMode ignores NULL values; weightedMedian excludes NULL value/weight rows") {
    val gm = Seq(("s", Some("en")), ("s", None), ("s", None), ("s", None))
      .toDF("src", "lang")
    val r = Analytics.groupMode(gm, "src", "lang").collect().head
    assert(r.getString(1) == "en") // 3 NULLs must not out-vote the real value
    // NULL value's weight must not count as the smallest value's mass
    val wm = Seq((Option.empty[Long], Some(10L), "g"), (Some(1L), Some(1L), "g"),
      (Some(2L), Some(9L), "g")).toDF("v", "w", "grp")
    val m = Analytics.weightedMedian(wm, "grp", "v", "w").collect().head
    assert((m.getLong(1), m.getLong(2)) == ((2L, 10L))) // cum(1)=1 < 5, median 2
  }

  test("interArrivalPercentiles: exact rank pick on hand-computed gaps") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // type A events at 0, 10, 30, 100s → gaps 10, 20, 70 (n=3):
    // p50 target rank ceil(1.5)=2 → 20; p90 ceil(2.7)=3 → 70; p99 → 70
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "A"), (2L, ts("2024-01-01 00:00:10"), "A"),
      (3L, ts("2024-01-01 00:00:30"), "A"), (4L, ts("2024-01-01 00:01:40"), "A"),
      (5L, ts("2024-01-01 00:00:00"), "B") // single event: no gaps, no rows
    ).toDF("event_id", "ts", "event_type")
    val out = Analytics.interArrivalPercentiles(ev, "event_type", "ts", "event_id",
        probsPct = Seq(50, 90, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    assert(out == Map(("A", 50) -> 20L, ("A", 90) -> 70L, ("A", 99) -> 70L))
  }

  test("sessionFunnel: order enforced WITHIN the day; cross-day sequences don't count") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1, day 1: full ordered funnel in-session
      (1L, ts("2024-01-01 09:00:00"), 1L, "signup"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (3L, ts("2024-01-01 11:00:00"), 1L, "purchase"),
      // user 2: signup day 1, click+purchase day 2 — day 2 session lacks signup
      (4L, ts("2024-01-01 09:00:00"), 2L, "signup"),
      (5L, ts("2024-01-02 10:00:00"), 2L, "click"),
      (6L, ts("2024-01-02 11:00:00"), 2L, "purchase"),
      // user 3, day 1: purchase BEFORE click — stage 3 not reached
      (7L, ts("2024-01-01 09:00:00"), 3L, "signup"),
      (8L, ts("2024-01-01 09:30:00"), 3L, "purchase"),
      (9L, ts("2024-01-01 10:00:00"), 3L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val r = Analytics.sessionFunnel(ev, "user_id", "ts", "event_type",
      "signup", "click", "purchase").collect().head
    // sessions with signup: u1d1, u2d1, u3d1 = 3; +click after: u1, u3 = 2;
    // +purchase after click: u1 only = 1
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("multiTouchAttribution: exact bps split, remainder to last touch, sums to 10000") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // purchase at Jan 10 with 3 prior touches (2 clicks + 1 view):
    // each 3333 bps, last touch (view, latest ts) gets +1 → 3334
    val ev = Seq(
      (1L, ts("2024-01-08 10:00:00"), 5L, "click"),
      (2L, ts("2024-01-09 10:00:00"), 5L, "click"),
      (3L, ts("2024-01-09 18:00:00"), 5L, "view"),
      (4L, ts("2024-01-10 10:00:00"), 5L, "purchase"),
      (5L, ts("2023-12-01 10:00:00"), 5L, "click"),   // outside 7-day window
      (6L, ts("2024-01-20 10:00:00"), 9L, "purchase") // zero-touch conversion
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Analytics.multiTouchAttribution(ev, "user_id", "ts", "event_id",
        "event_type", convType = "purchase")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("click") == ((2L, 6666L)))
    assert(out("view") == ((1L, 3334L)))
    assert(out("(unattributed)") == ((0L, 10000L))) // visible, not silent
    assert(out.values.map(_._2).sum == 20000L) // 10000 per conversion, globally
  }

  test("trendSlope: exact on a perfect line; NULL slope for constant x") {
    // group a: y = 3x + 2 exactly; group b: constant x (no trend defined)
    val df = (Seq((1.0, 5.0, "a"), (2.0, 8.0, "a"), (3.0, 11.0, "a"), (4.0, 14.0, "a")) ++
      Seq((2.0, 1.0, "b"), (2.0, 9.0, "b"))).toDF("x", "y", "g")
    val out = Analytics.trendSlope(df, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out("a") == ((4L, Some(3.0), Some(2.0))))
    assert(out("b") == ((2L, None, None)))
  }

  test("trendSlope: constant non-integer x stays NULL (exact guard, no FP leak-through)") {
    // x constant 0.7: a double-cast guard sees den ≈ 2e-16 > 0 and emits
    // noise/noise garbage; the exact decimal guard must return NULL
    val df = Seq((0.7, 1.0, "c"), (0.7, 2.0, "c"), (0.7, 3.0, "c")).toDF("x", "y", "g")
    val r = Analytics.trendSlope(df, "g", col("x"), col("y")).collect().head
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("trendSlope: NULL coordinates drop the whole pair (listwise), not one sum") {
    // only complete pairs: (1,2) and (3,6) -> slope 2, intercept 0;
    // the (NULL, 100) row must not poison sy
    val df = Seq((Some(1.0), Some(2.0)), (None, Some(100.0)), (Some(3.0), Some(6.0)))
      .toDF("x", "y").withColumn("g", org.apache.spark.sql.functions.lit("z"))
    val r = Analytics.trendSlope(df, "g", col("x"), col("y")).collect().head
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 0.0)
  }

  test("paretoFrontier2D: hand-computed frontier, ties kept, interior dominated") {
    // points: (1,9) frontier; (3,7) frontier; (3,5) dominated by (3,7);
    // (2,7) dominated by (3,7); (5,2)×2 identical — both frontier;
    // (4,2) dominated by (5,2)
    val df = Seq((1L, 1L, 9L), (2L, 3L, 7L), (3L, 3L, 5L), (4L, 2L, 7L),
      (5L, 5L, 2L), (6L, 5L, 2L), (7L, 4L, 2L)).toDF("id", "x", "y")
    val out = Analytics.paretoFrontier2D(df, "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 5L, 6L))
  }

  test("paretoFrontier2D equals the quadratic dominance filter on random data") {
    val rnd = new scala.util.Random(41)
    val pts = (1L to 300L).map(i => (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val df = pts.toDF("id", "x", "y")
    val got = Analytics.paretoFrontier2D(df, "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    val expect = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) => x2 >= x && y2 >= y && (x2 > x || y2 > y) }
    }.map(_._1).toSet
    assert(got == expect)
    assert(expect.nonEmpty)
  }

  test("histogramQuantiles: exact on bin-aligned data; certificate always holds") {
    // values 1..100 cents, 10 bins of width 10: p50 target rank 50 →
    // first bin with crank ≥ 50 is b=4 (crank 50), upper edge 50
    val df = (1L to 100L).toDF("cents")
    val out = Analytics.histogramQuantiles(df, col("cents"), nBins = 10,
        probsPct = Seq(50, 90, 99))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(3), r.getLong(5), r.getLong(6)))).toMap
    assert(out(50) == ((50L, 0L, 10L)))
    assert(out(90) == ((90L, 0L, 10L)))
    assert(out(99) == ((100L, 1L, 10L))) // target 99, edge 100 covers rank 100
    out.values.foreach { case (_, err, bound) => assert(err >= 0 && err < bound) }
  }

  test("histogramQuantiles certificate holds on random data; achieved rank is exact") {
    val rnd = new scala.util.Random(59)
    val vals = (1 to 2000).map(_ => rnd.nextInt(100000).toLong)
    val df = vals.toDF("cents")
    val rows = Analytics.histogramQuantiles(df, col("cents"), nBins = 64,
      probsPct = Seq(10, 50, 90, 99)).collect()
    val sorted = vals.sorted
    rows.foreach { r =>
      val (n, target, approx, achieved, err, bound) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(n == 2000L)
      assert(err >= 0 && err < bound, s"certificate violated: err=$err bound=$bound")
      assert(achieved == target + err)
      // the reported achieved rank IS the exact rank of the reported value:
      // #values <= approx (the bin's upper edge) equals the cumulative count
      assert(sorted.count(_ <= approx) == achieved)
    }
  }

  test("histogramQuantiles: skewed data keeps rank_err under the reported bound") {
    // heavy cluster at 5, long tail: bins are unequal-mass, certificate must hold
    val df = ((1L to 900L).map(_ => 5L) ++ (1L to 100L).map(i => 1000L + i)).toDF("c")
    val rows = Analytics.histogramQuantiles(df, col("c"), nBins = 16,
      probsPct = Seq(50, 95)).collect()
    rows.foreach { r =>
      assert(r.getLong(5) >= 0 && r.getLong(5) < r.getLong(6))
      assert(r.getLong(4) >= r.getLong(2)) // achieved ≥ target
    }
    // p50 sits in the heavy first bin
    assert(rows.find(_.getInt(0) == 50).get.getLong(6) == 900L)
  }

  test("correlationMatrix: known coefficients, one pair per unordered column pair") {
    // y = 2x (corr +1), w = -x (corr -1 with x), z hand-computed:
    // n=4 Σx=10 Σx²=30 Σz=11 Σz²=39 Σxz=33 → 22/√(20·35) = 0.831522
    val df = Seq(
      (1.0, 2.0, 1.0, -1.0),
      (2.0, 4.0, 3.0, -2.0),
      (3.0, 6.0, 2.0, -3.0),
      (4.0, 8.0, 5.0, -4.0)
    ).toDF("x", "y", "z", "w")
    val out = Analytics.correlationMatrix(df, Seq("x", "y", "z", "w"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out.size == 6)
    assert(out(("x", "y")) == ((4L, 1.0)))
    assert(out(("x", "w")) == ((4L, -1.0)))
    assert(out(("x", "z")) == ((4L, 0.831522)))
    assert(out(("y", "w")) == ((4L, -1.0)))
  }

  test("correlationMatrix: zero-variance column yields NULL, never NaN/Inf") {
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "c")
    val r = Analytics.correlationMatrix(df, Seq("x", "c")).collect().head
    assert(r.isNullAt(3))
    assert(r.getLong(2) == 3L)
  }

  test("correlationMatrix: listwise NULL deletion shares one n across all pairs") {
    // row 3 has NULL in z only, but is dropped for EVERY pair (listwise)
    val df = Seq(
      (Some(1.0), Some(2.0), Some(1.0)),
      (Some(2.0), Some(4.0), Some(3.0)),
      (Some(3.0), Some(6.0), None),
      (Some(4.0), Some(8.0), Some(5.0))
    ).toDF("x", "y", "z")
    val out = Analytics.correlationMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out.values.toSet == Set(3L))
    assert(out(("x", "y")) == 3L)
  }

  test("transitionMatrix: ordered bigrams per key, truncating ppm") {
    // u1: a→b→b, u2: a→c; transitions from a: b(1) c(1) → 500000 ppm each;
    // from b: b(1) → 1000000 ppm. Cross-user bigram (u1.b → u2.a) must NOT
    // appear — sequences are per-key.
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "b"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "b"),
      (4L, ts("2024-01-02 10:00:00"), 2L, "a"),
      (5L, ts("2024-01-02 11:00:00"), 2L, "c")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Analytics.transitionMatrix(df, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out == Map(
      ("a", "b") -> ((1L, 500000L)), ("a", "c") -> ((1L, 500000L)),
      ("b", "b") -> ((1L, 1000000L))))
  }

  test("transitionMatrix: same-timestamp ties break on idCol deterministically") {
    val t = ts("2024-01-01 10:00:00")
    val df = Seq((2L, t, 1L, "y"), (1L, t, 1L, "x"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Analytics.transitionMatrix(df, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("x", "y"))) // id order, not insertion order
  }

  test("winsorizedMean: clamps at the rank-picked bounds, exact centi mean") {
    // g: 1..10; p10 rank = (10*10+99) DIV 100 = 1 → lo=1;
    // p90 rank = (90*10+99) DIV 100 = 9 → hi=9; clamped sum = 1+..+9+9 = 54
    // → mean_centi = 5400 DIV 10 = 540
    val df = (1L to 10L).map(v => ("g", v)).toDF("grp", "v")
    val r = Analytics.winsorizedMean(df, "grp", "v", 10, 90).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((10L, 540L, 1L, 9L)))
  }

  test("dailyStreaks: islands split on gaps; multiple events per day collapse") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 23:00:00")), // same day
      (1L, ts("2024-01-02 09:00:00")), (1L, ts("2024-01-03 09:00:00")),
      (1L, ts("2024-01-05 09:00:00")),                                  // gap → new island
      (2L, ts("2024-02-01 00:00:00"))
    ).toDF("user_id", "ts")
    val out = Analytics.dailyStreaks(df, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 3L, 4L))) // streaks {1-3}, {5}: longest 3, 4 active days
    assert(out(2L) == ((1L, 1L, 1L)))
  }

  test("abExperiment: arm counts partition users; conversion sums conserve") {
    val df = (1L to 40L).flatMap(u => Seq(
      (u, "click"), (u, if (u % 4 == 0) "purchase" else "view")
    )).toDF("user_id", "event_type")
    val r = Analytics.abExperiment(df, "user_id", "event_type", "purchase")
      .collect().head
    val (na, nb, ca, cb) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na + nb == 40L)     // every user lands in exactly one arm
    assert(ca + cb == 10L)     // u % 4 == 0 converters, split across arms
    assert(r.getLong(4) == ca * 1000000L / na)
    assert(r.getLong(6) == r.getLong(5) - r.getLong(4))
  }

  test("rollingDistinctUsers: trailing window counts distinct, not events") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 12:00:00")), // same user+day
      (2L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
      (3L, ts("2024-01-09 10:00:00"))  // far gap: window holds only u3
    ).toDF("user_id", "ts")
    val out = Analytics.rollingDistinctUsers(df, "user_id", "ts", windowDays = 3)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(out == Map(
      "2024-01-01" -> 1L,   // {1}
      "2024-01-02" -> 2L,   // {1,2}
      "2024-01-03" -> 2L,   // {1,2} — u1 twice in window counts once
      "2024-01-09" -> 1L))  // {3}
  }

  test("federatedMedianAudit: one shard equals the truth; multi-shard matches brute force") {
    val one = Analytics.federatedMedianAudit(
      (1L to 9L).map(i => (i, i * 10L)).toDF("id", "v"), "id", "v", nShards = 1)
      .collect().head
    assert((one.getLong(1), one.getLong(2), one.getLong(3)) == ((50L, 50L, 0L)))
    // brute-force the 4-shard path with the same portable hash
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(15), 16)
    }
    val rows = (1L to 100L).map(i => (i, i)) // value = id: median 50
    def lowerMedian(vs: Seq[Long]): Long = vs.sorted.apply((vs.size + 1) / 2 - 1)
    val fedExp = lowerMedian(rows.groupBy { case (id, _) => h60(id.toString) % 4 }
      .toSeq.map { case (_, g) => lowerMedian(g.map(_._2)) })
    val r = Analytics.federatedMedianAudit(rows.toDF("id", "v"), "id", "v", 4)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((100L, 50L, fedExp)))
    assert(r.getLong(3) == math.abs(fedExp - 50L) * 1000000L / 50L)
  }

  test("growthAccounting: new/retained/resurrected/churned classified by week gaps") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), // wk1 (Mon Jan 1): new
      (1L, ts("2024-01-08 10:00:00")), // wk2: retained
      (2L, ts("2024-01-01 11:00:00")), // wk1: new, then absent wk2 → churned wk2
      (3L, ts("2024-01-01 12:00:00")), // wk1: new
      (3L, ts("2024-01-15 10:00:00"))  // wk3: resurrected (skipped wk2)
    ).toDF("user_id", "ts")
    val out = Analytics.growthAccounting(df, "user_id", "ts")
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("2024-01-01") == ((3L, 0L, 0L, 0L)))
    // wk2: u1 retained; u2 and u3 churn out of wk1 (u3 returns later — churn
    // still happened in wk2, resurrection is a separate wk3 event)
    assert(out("2024-01-08") == ((0L, 1L, 0L, 2L)))
    assert(out("2024-01-15") == ((0L, 0L, 1L, 1L))) // u1 churns wk3 too
  }

  test("conversionLifeTable: converted/censored lags and reverse-cumulative risk") {
    // horizon = 2024-01-10 (global max). u1 signs up d0, converts d2;
    // u2 signs up 01-05, never converts → censored at lag 5;
    // u3 purchase BEFORE signup → not a conversion of it, censored lag 2;
    // u4 never signs up → excluded entirely
    val df = Seq(
      (1L, ts("2024-01-01 08:00:00"), "signup"),
      (1L, ts("2024-01-03 09:00:00"), "purchase"),
      (2L, ts("2024-01-05 08:00:00"), "signup"),
      (3L, ts("2024-01-07 08:00:00"), "purchase"),
      (3L, ts("2024-01-08 08:00:00"), "signup"),
      (4L, ts("2024-01-10 08:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.conversionLifeTable(df, "user_id", "ts", "event_type",
        "signup", "purchase")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(2L) == ((3L, 1L, 1L))) // at lag2: all 3 at risk; u1 converts, u3 censors
    assert(out(5L) == ((1L, 0L, 1L))) // u2 censored at 5; only u2 still at risk
  }

  test("weightedQuantiles: threshold inclusive, degenerates to the weighted median at p50") {
    // g: 1(w3), 2(w1), 5(w4); total 8. cum: 3, 4, 8.
    // p25: 100·cum ≥ 25·8=200 → cum 3 qualifies → 1
    // p50: 100·cum ≥ 400 → cum 4 → 2 (matches weightedMedian's answer)
    // p75: 100·cum ≥ 600 → cum 8 → 5
    val df = Seq((1L, 3L, "g"), (2L, 1L, "g"), (5L, 4L, "g")).toDF("v", "w", "grp")
    val out = Analytics.weightedQuantiles(df, "grp", "v", "w", Seq(25, 50, 75))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out == Map(25 -> 1L, 50 -> 2L, 75 -> 5L))
  }

  test("diffInDiff: cells partition user-periods; DiD assembles from the cells") {
    val df = (1L to 30L).flatMap { u =>
      val pre = Seq((u, ts("2024-01-01 10:00:00"), "click"))
      val post = Seq((u, ts("2024-01-09 10:00:00"),
        if (u % 3 == 0) "purchase" else "view"))
      pre ++ post
    }.toDF("user_id", "ts", "event_type")
    // 2 distinct days; cutoff at rank (50·2+99) DIV 100 = 1 → day 1 = pre
    val r = Analytics.diffInDiff(df, "user_id", "ts", "event_type",
      "purchase", cutoffPct = 50).collect().head
    val (naPre, naPost, nbPre, nbPost) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(naPre + nbPre == 30L && naPost + nbPost == 30L)
    val (raPre, raPost, rbPre, rbPost) =
      (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    assert(raPre == 0L && rbPre == 0L) // nobody converts pre-cutoff
    assert(r.getLong(8) == (rbPost - rbPre) - (raPost - raPre))
  }

  test("bounceRate: single-event sessions counted, exact ppm") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 11:00:00")), // 2-event
      (2L, ts("2024-01-01 10:00:00")),                                  // bounce
      (3L, ts("2024-01-02 10:00:00"))                                   // bounce
    ).toDF("user_id", "ts")
    val out = Analytics.bounceRate(df, "user_id", "ts")
      .collect().map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("2024-01-01") == ((2L, 1L, 500000L)))
    assert(out("2024-01-02") == ((1L, 1L, 1000000L)))
  }

  test("topJourneys: path order is event order, ties on id; only first steps count") {
    val t0 = ts("2024-01-01 10:00:00")
    val df = Seq(
      (2L, t0, 1L, "b"), (1L, t0, 1L, "a"),           // same ts → id order: a>b
      (3L, ts("2024-01-01 11:00:00"), 1L, "c"),
      (4L, ts("2024-01-01 12:00:00"), 1L, "d"),       // beyond steps=3, ignored
      (5L, ts("2024-01-02 09:00:00"), 2L, "a")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = Analytics.topJourneys(df, "user_id", "ts", "event_id",
        "event_type", steps = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a>b>c" -> 1L, "a" -> 1L))
  }

  test("trafficAnomalyDays: ratio vs trailing mean; short baseline gives NULL") {
    val days = Seq(
      ("2024-01-01", 10), ("2024-01-02", 10), ("2024-01-03", 10),
      ("2024-01-04", 40) // 4x the trailing mean of 10 → spike
    ).flatMap { case (d, n) => (1 to n).map(_ => ts(s"$d 10:00:00")) }
    val df = days.map(Tuple1(_)).toDF("ts")
    val out = Analytics.trafficAnomalyDays(df, "ts", windowDays = 2,
        thresholdPct = 50)
      .collect().map(r => r.getDate(0).toString ->
        ((if (r.isNullAt(3)) -1L else r.getLong(3)),
          if (r.isNullAt(4)) "" else r.getString(4))).toMap
    assert(out("2024-01-01") == ((-1L, ""))) // no baseline
    assert(out("2024-01-02") == ((-1L, ""))) // 1 < windowDays days of history
    assert(out("2024-01-03") == ((1000000L, ""))) // exactly at trend
    assert(out("2024-01-04") == ((4000000L, "spike")))
  }

  test("slaAttainment: gaps at the threshold count as within") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (2L, ts("2024-01-01 10:00:30"), "a"), // gap 30 ≤ 30 → within
      (3L, ts("2024-01-01 10:02:00"), "a"), // gap 90 → miss
      (4L, ts("2024-01-01 10:00:00"), "b")  // no gap (first event)
    ).toDF("event_id", "ts", "event_type")
    val out = Analytics.slaAttainment(df, "event_type", "ts", "event_id", 30L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") == ((2L, 1L, 500000L)))
    assert(!out.contains("b")) // a single event has no inter-arrival gap
  }

  test("seasonalityProfile: ISO Monday=1; shares sum within truncation of 1e6") {
    // 2024-01-01 is a Monday; 2024-01-07 a Sunday
    val df = Seq(
      ts("2024-01-01 09:00:00"), ts("2024-01-01 09:30:00"),
      ts("2024-01-07 23:00:00"), ts("2024-01-03 00:00:00")
    ).map(Tuple1(_)).toDF("ts")
    val out = Analytics.seasonalityProfile(df, "ts")
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out((1, 9)) == ((2L, 500000L)))  // Monday 9h
    assert(out((7, 23)) == ((1L, 250000L))) // Sunday 23h
    assert(out((3, 0))._1 == 1L)            // Wednesday 0h
    assert(out.values.map(_._2).sum <= 1000000L)
  }

  test("revenueConcentration: deciles of 1..10 and the exact Gini 0.3") {
    // values 1..10 cents: decile d holds exactly value d; Gini closed form:
    // 2·Σi·i/(n·Σ) − (n+1)/n = 2·385/550 − 1.1 = 0.3 → 300000 ppm exact
    val df = (1L to 10L).map(i => (i, i)).toDF("id", "cents")
    val out = Analytics.revenueConcentration(df, "id", col("cents"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.size == 10)
    assert(out(1L) == ((1L, 1L, 1000000L / 55L, 300000L))) // 1/55 share, floor
    assert(out(10L)._2 == 10L)
    assert(out(10L)._3 == 10L * 1000000L / 55L)
    assert(out.values.map(_._4).toSet == Set(300000L))
  }

  test("winsorizedMean: outlier cannot drag the mean; NULLs excluded") {
    // 1,2,3,1000000 with p25/p75: n=4 → lo rank (25*4+99)/100=1 → lo=1,
    // hi rank (75*4+99)/100=3 → hi=3; clamped 1,2,3,3 → 900 DIV 4 = 225
    val df = Seq(Some(1L), Some(2L), Some(3L), Some(1000000L), None)
      .map(v => ("g", v)).toDF("grp", "v")
    val r = Analytics.winsorizedMean(df, "grp", "v", 25, 75).collect().head
    assert((r.getLong(1), r.getLong(2)) == ((4L, 225L)))
  }

  test("autocorrelation: alternating series has acf(1) = -1, acf(2) = +1; silent days zero-fill") {
    // events only on even days 0,2,4,6,8 — odd days must enter as ZEROS,
    // making the series 1,0,1,0,1,0,1,0,1 (period 2)
    val events = (0 to 8 by 2)
      .map(d => ts(f"2024-03-${d + 1}%02d 12:00:00"))
      .toDF("ts")
    val r = Analytics.autocorrelation(events, "ts", maxLag = 2).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r(1) == ((8L, -1.0)))
    assert(r(2) == ((7L, 1.0)))
  }

  test("autocorrelation: constant series yields NULL acf, never 0/0 noise") {
    val events = (1 to 5).map(d => ts(f"2024-03-0$d 09:00:00")).toDF("ts")
    val rows = Analytics.autocorrelation(events, "ts", maxLag = 3).collect()
    assert(rows.length == 3 && rows.forall(_.isNullAt(2)))
  }

  test("businessDayLag: weekends in (start, end] contribute nothing") {
    // 2024-03-01 is a Friday; 2024-03-04 the following Monday
    val df = Seq(
      ("fri_to_mon", ts("2024-03-01 10:00:00"), ts("2024-03-04 10:00:00")), // Sat,Sun,Mon -> 1
      ("same_day",   ts("2024-03-01 10:00:00"), ts("2024-03-01 18:00:00")), // () -> 0
      ("fri_to_sun", ts("2024-03-01 10:00:00"), ts("2024-03-03 10:00:00")), // Sat,Sun -> 0
      ("mon_to_fri", ts("2024-03-04 10:00:00"), ts("2024-03-08 10:00:00")), // Tue..Fri -> 4
      ("backwards",  ts("2024-03-08 10:00:00"), ts("2024-03-04 10:00:00"))) // excluded
      .toDF("grp", "start", "end")
    val r = Analytics.businessDayLag(df, "start", "end", "grp").collect()
      .map(x => x.getString(0) -> x.getLong(4)).toMap
    assert(r == Map("fri_to_mon" -> 1000000L, "same_day" -> 0L,
      "fri_to_sun" -> 0L, "mon_to_fri" -> 4000000L))
  }

  test("geometricSmoothing: power-of-two weights, zero-extended start, exact ppm") {
    // day1: 1 event, day2: 2 events; W=2 -> weights [2,1], denom 3
    val events = Seq(ts("2024-03-01 10:00:00"), ts("2024-03-02 10:00:00"),
      ts("2024-03-02 11:00:00")).toDF("ts")
    val r = Analytics.geometricSmoothing(events, "ts", windowDays = 2).collect()
      .map(x => (x.getDate(0).toString, x.getLong(1), x.getLong(2)))
    // day1: 1*2 + 0*1 = 2 -> 666666 ppm; day2: 2*2 + 1*1 = 5 -> 1666666 ppm
    assert(r.toSeq == Seq(("2024-03-01", 1L, 666666L), ("2024-03-02", 2L, 1666666L)))
  }

  test("peakConcurrency: overlap counted at arrivals; half-open intervals release first") {
    val events = Seq(
      (1L, ts("2024-03-01 10:00:00")),
      (2L, ts("2024-03-01 10:02:00")), // overlaps event 1 -> peak 2
      (3L, ts("2024-03-01 10:10:00")), // isolated
      (4L, ts("2024-03-02 09:00:00")),
      (5L, ts("2024-03-02 09:05:00"))) // event 4 expires EXACTLY here -> no overlap
      .toDF("event_id", "ts")
    val r = Analytics.peakConcurrency(events, "ts", "event_id", 300L).collect()
      .map(x => x.getDate(0).toString -> x.getLong(1)).toMap
    assert(r == Map("2024-03-01" -> 2L, "2024-03-02" -> 1L))
  }

  test("log2Histogram: bit-length buckets, exact power-of-two boundaries, non-positives excluded") {
    val df = Seq(1L, 1L, 2L, 3L, 8L, 0L, -4L).toDF("v")
    val r = Analytics.log2Histogram(df, col("v")).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), x.getLong(5)))).toMap
    assert(r == Map(
      0 -> ((1L, 1L, 2L, 1L, 1L)),
      1 -> ((2L, 3L, 2L, 2L, 3L)),
      3 -> ((8L, 15L, 1L, 8L, 8L))))
  }

  test("cusumDrift: accumulation resets at zero and fires on a sustained jump") {
    // counts 10,10,10,30: mean 15 -> S+ stays 0 through the low days,
    // jumps to 14.85e6 ppm on day 4 (> mean/10 = 1.5e6) -> alert
    val events = (Seq.fill(10)("2024-03-01") ++ Seq.fill(10)("2024-03-02") ++
      Seq.fill(10)("2024-03-03") ++ Seq.fill(30)("2024-03-04"))
      .map(d => ts(s"$d 09:00:00")).toDF("ts")
    val r = Analytics.cusumDrift(events, "ts").collect()
      .map(x => (x.getDate(0).toString, x.getLong(2), x.getInt(3)))
    assert(r.toSeq == Seq(
      ("2024-03-01", 0L, 0), ("2024-03-02", 0L, 0), ("2024-03-03", 0L, 0),
      ("2024-03-04", 14850000L, 1)))
  }

  test("revenueWaterfall: volume at old economics, price/mix reconciles, one-sided brands survive") {
    val p2 = col("period") === 2
    val df = Seq(
      ("A", 1, 2L, 20000L), ("A", 2, 3L, 33000L),  // vol = 1*20000/2 = 10000
      ("B", 1, 5L, 50000L),                         // vanishes in p2
      ("C", 2, 4L, 8000L))                          // appears in p2
      .toDF("brand", "period", "q", "cents")
    val r = Analytics.revenueWaterfall(df, "brand", col("q"), col("cents"), p2)
      .collect().map(x => x.getString(0) ->
        ((x.getLong(5), x.getLong(6), x.getLong(7)))).toMap
    assert(r("A") == ((13000L, 10000L, 3000L)))
    assert(r("B") == ((-50000L, -50000L, 0L)))   // all volume, by definition
    assert(r("C") == ((8000L, 0L, 8000L)))       // q1=0 -> no volume base
  }

  test("latenessAudit: out-of-order arrival shows up in log2 buckets; in-order is on time") {
    val df = Seq(
      (1L, ts("2024-03-01 10:01:40"), ts("2024-03-01 10:02:00")), // arrives first
      (2L, ts("2024-03-01 10:00:00"), ts("2024-03-01 10:02:01"))) // 100 s late
      .toDF("event_id", "ts", "arrival")
    val r = Analytics.latenessAudit(df, "ts", "arrival", "event_id").collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(-1 -> ((1L, 0L)), 6 -> ((1L, 100L)))) // 100 in [64,128)
  }

  test("timeDecayAttribution: half-life weights, deficit to the most recent touch, conservation") {
    val events = Seq(
      (1L, 7L, ts("2024-03-01 10:00:00"), "view"),
      (2L, 7L, ts("2024-03-02 10:00:00"), "click"),
      (3L, 7L, ts("2024-03-03 10:00:00"), "purchase"),
      (4L, 8L, ts("2024-03-03 12:00:00"), "purchase")) // no touches
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = Analytics.timeDecayAttribution(events, "user_id", "ts", "event_id",
      "event_type", "purchase").collect()
      .map(x => x.getString(0) -> x.getLong(2)).toMap
    // weights: view (age 2) 250000, click (age 1) 500000; floors 3333/6666,
    // deficit 1 bps -> click (most recent)
    assert(r == Map("view" -> 3333L, "click" -> 6667L, "(unattributed)" -> 10000L))
    assert(r.values.sum == 2 * 10000L) // global conservation
  }

  test("crossCorrelation: a series leading by one day peaks at lag +1") {
    // A fires on days 1,3,5; B fires on days 2,4 (B = A shifted +1 day)
    val events = (Seq(1, 3, 5).map(d => (s"2024-03-0$d", "A")) ++
      Seq(2, 4).map(d => (s"2024-03-0$d", "B")))
      .map { case (d, t) => (ts(s"$d 09:00:00"), t) }.toDF("ts", "event_type")
    val r = Analytics.crossCorrelation(events, "ts", "event_type", "A", "B",
      maxLag = 1).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r(1) == ((4L, 1.0)))  // a(t) == b(t+1) exactly
    assert(r(0) == ((5L, -1.0))) // perfectly anti-aligned at lag 0
  }

  test("revenueBridge: new/expansion/churn reconcile to the net change; phantom month clipped") {
    val orders = Seq(
      (1L, ts("2024-01-05 00:00:00"), 10000L), // cust 1 Jan 100.00
      (1L, ts("2024-02-10 00:00:00"), 15000L), // cust 1 Feb 150.00 -> +50 exp
      (2L, ts("2024-01-20 00:00:00"), 8000L),  // cust 2 Jan only -> Feb churn
      (3L, ts("2024-02-25 00:00:00"), 6000L))  // cust 3 Feb only -> new
      .toDF("cust", "ts", "cents")
    val r = Analytics.revenueBridge(orders, "cust", "ts", col("cents")).collect()
      .map(x => x.getDate(0).toString ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5))))
    assert(r.toSeq == Seq(
      ("2024-01-01", (18000L, 0L, 0L, 0L, 18000L)),
      ("2024-02-01", (6000L, 5000L, 0L, -8000L, 3000L))))
    // no 2024-03 row: the post-horizon churn month is clipped
  }

  test("backlogCurve: open through the last ship day, zero after; quiet days carried") {
    val df = Seq(
      (1L, ts("2024-03-01 09:00:00"), ts("2024-03-02 09:00:00")),
      (1L, ts("2024-03-01 09:00:00"), ts("2024-03-03 09:00:00")), // o1 completes day3
      (2L, ts("2024-03-02 09:00:00"), ts("2024-03-02 09:00:00"))) // o2 same-day
      .toDF("ok", "placed", "shipped")
    val r = Analytics.backlogCurve(df, "ok", "placed", "shipped").collect()
      .map(x => x.getDate(0).toString -> x.getLong(1))
    assert(r.toSeq == Seq("2024-03-01" -> 1L, "2024-03-02" -> 2L,
      "2024-03-03" -> 1L, "2024-03-04" -> 0L))
  }

  test("backfillPlan: trailing lower median excludes the day itself; short history -> NULL") {
    val events = (Seq.fill(10)("01") ++ Seq.fill(10)("02") ++ Seq.fill(10)("03") ++
      Seq.fill(10)("04") ++ Seq.fill(2)("05"))
      .map(d => ts(s"2024-03-$d 09:00:00")).toDF("ts")
    val r = Analytics.backfillPlan(events, "ts").collect()
      .map(x => (x.getDate(0).toString, x.getLong(1),
        if (x.isNullAt(2)) -1L else x.getLong(2), x.getInt(4)))
    assert(r.toSeq == Seq(
      ("2024-03-01", 10L, -1L, 0), ("2024-03-02", 10L, -1L, 0),
      ("2024-03-03", 10L, -1L, 0), ("2024-03-04", 10L, 10L, 0),
      ("2024-03-05", 2L, 10L, 1))) // 200000 ppm < half -> backfill
  }

  test("rateLimitAudit: per-hour violator census with excess volume") {
    val events = (Seq.fill(3)(1L) ++ Seq(2L)).zipWithIndex
      .map { case (u, i) => (u, ts(s"2024-03-01 10:0$i:00")) }
      .toDF("user_id", "ts")
    val r = Analytics.rateLimitAudit(events, "user_id", "ts", 2L).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((2L, 1L, 1L, 3L))) // user 1 fired 3 times: 1 violator, 1 excess
  }

  test("topkChurn: entered/exited/stayed with rank movement") {
    val prev = Seq(("a", 3.0), ("b", 2.0), ("c", 1.0)).toDF("item", "s")
    val cur = Seq(("b", 3.0), ("d", 2.0), ("a", 1.0)).toDF("item", "s")
    val r = Analytics.topkChurn(prev, cur, "item", "s", k = 2).collect()
      .map(x => (x.getString(0), x.getString(1),
        if (x.isNullAt(2)) -1L else x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
    assert(r == Set(("a", "exited", 1L, -1L), ("b", "stayed", 2L, 1L),
      ("d", "entered", -1L, 2L)))
  }

  test("weeklyContinuity: returning share per week; first week NULL, not zero") {
    // 2024-03-04 and 2024-03-11 are Mondays
    val events = Seq((1L, "2024-03-05"), (1L, "2024-03-12"),
      (2L, "2024-03-06"), (3L, "2024-03-13"))
      .map { case (u, d) => (u, ts(s"$d 10:00:00")) }.toDF("user_id", "ts")
    val r = Analytics.weeklyContinuity(events, "user_id", "ts").collect()
      .map(x => x.getDate(0).toString ->
        ((x.getLong(1), x.getLong(2), if (x.isNullAt(3)) -1L else x.getLong(3))))
    assert(r.toSeq == Seq("2024-03-04" -> ((2L, 0L, -1L)),
      "2024-03-11" -> ((2L, 1L, 500000L))))
  }

  test("seasonalNaiveBacktest: last-week-same-day forecast, first period unscored") {
    val events = ((1 to 7).map(d => Seq(ts(f"2024-03-0$d 09:00:00"))) :+
      Seq.fill(3)(ts("2024-03-08 09:00:00"))).flatten.toDF("ts")
    val r = Analytics.seasonalNaiveBacktest(events, "ts", 7).collect()
    assert(r.length == 1) // only day 8 has a day-minus-7 forecast
    val x = r.head
    assert((x.getDate(0).toString, x.getLong(1), x.getLong(2), x.getLong(3),
      x.getLong(4)) == (("2024-03-08", 3L, 1L, 2L, 666666L)))
  }

  test("shareOfParent: leaf-of-parent and parent-of-total ppm in one row") {
    val df = Seq(("R1", "N1", 100L), ("R1", "N2", 300L), ("R2", "N3", 600L))
      .toDF("r", "n", "cents")
    val r = Analytics.shareOfParent(df, "r", "n", col("cents")).collect()
      .map(x => x.getString(1) -> ((x.getLong(3), x.getLong(4)))).toMap
    assert(r == Map("N1" -> ((250000L, 400000L)), "N2" -> ((750000L, 400000L)),
      "N3" -> ((1000000L, 600000L))))
  }

  test("fillRateBands: exactly-100% is its own band; partial orders band by quartile") {
    val df = Seq(
      (1L, "2024-03-01", "2024-03-10"), (1L, "2024-03-01", "2024-03-20"),
      (2L, "2024-03-01", "2024-03-15"), (2L, "2024-03-01", "2024-06-01"),
      (3L, "2024-03-01", "2024-06-01"), (3L, "2024-03-01", "2024-07-01"),
      (3L, "2024-03-01", "2024-08-01"))
      .map { case (o, p, s) => (o, ts(s"$p 00:00:00"), ts(s"$s 00:00:00")) }
      .toDF("ok", "placed", "shipped")
    val r = Analytics.fillRateBands(df, "ok", "placed", "shipped", 30).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r == Map(4 -> 1L, 2 -> 1L, 0 -> 1L))
  }

  test("vwapDeviation: price moves separate from volume moves, exact cents") {
    val df = Seq((ts("2024-03-01 09:00:00"), 2L, 200L),
      (ts("2024-03-02 09:00:00"), 1L, 400L)).toDF("ts", "q", "cents")
    val r = Analytics.vwapDeviation(df, "ts", col("q"), col("cents")).collect()
      .map(x => x.getDate(0).toString ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getInt(4)))).toMap
    // global vwap = 600/3 = 200
    assert(r("2024-03-01") == ((100L, 200L, 500000L, 1)))
    assert(r("2024-03-02") == ((400L, 200L, 1000000L, 1)))
  }

  test("weekdayAdjustedOutliers: a loud Tuesday flags against its own weekday median") {
    // 14 days from Mon 2024-03-04; all 10 events except Tue 2024-03-12 = 30
    val events = (0 until 14).flatMap { i =>
      val d = java.time.LocalDate.of(2024, 3, 4).plusDays(i)
      val k = if (d.toString == "2024-03-12") 30 else 10
      Seq.fill(k)(ts(s"$d 09:00:00"))
    }.toDF("ts")
    val r = Analytics.weekdayAdjustedOutliers(events, "ts").collect()
      .map(x => x.getDate(0).toString -> ((x.getLong(2), x.getLong(3), x.getInt(4))))
      .toMap
    assert(r("2024-03-12") == ((10L, 2000000L, 1)))
    assert(r("2024-03-11") == ((10L, 0L, 0)))
  }

  test("touchDepthHistogram: depth census with the unattributed zero bucket") {
    val events = Seq(
      (1L, 7L, ts("2024-03-01 10:00:00"), "view"),
      (2L, 7L, ts("2024-03-02 10:00:00"), "click"),
      (3L, 7L, ts("2024-03-03 10:00:00"), "purchase"),
      (4L, 8L, ts("2024-03-03 12:00:00"), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = Analytics.touchDepthHistogram(events, "user_id", "ts", "event_id",
      "event_type", "purchase").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(0L -> 1L, 2L -> 1L))
  }

  test("reorderEta: personal median cadence, one outlier gap shrugged off") {
    // cust 7: orders on days 1, 8, 15, 50 -> gaps [7,7,35], median 7
    val orders = Seq("2024-03-01", "2024-03-08", "2024-03-15", "2024-04-19")
      .map(d => (7L, ts(s"$d 10:00:00"))) :+ ((8L, ts("2024-03-01 10:00:00")))
    val r = Analytics.reorderEta(orders.toDF("o_custkey", "ts"), "o_custkey",
      "ts", minOrders = 3).collect()
    assert(r.length == 1) // cust 8 has one order: no cadence
    val x = r.head
    assert((x.getLong(0), x.getLong(1), x.getLong(3), x.getDate(4).toString)
      == ((7L, 4L, 7L, "2024-04-26")))
  }

  test("hhiTrend: monopoly scores 1e6; two equal groups score half") {
    val df = Seq(("2024-01-05", "A", 100L), ("2024-04-05", "A", 50L),
      ("2024-04-10", "B", 50L))
      .map { case (d, g, c) => (ts(s"$d 00:00:00"), g, c) }
      .toDF("ts", "g", "cents")
    val r = Analytics.hhiTrend(df, "ts", "g", col("cents")).collect()
      .map(x => x.getDate(0).toString -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r("2024-01-01") == ((1L, 1000000L)))
    assert(r("2024-04-01") == ((2L, 500000L)))
  }

  test("rankAgreement: hand-computed Kendall counts and top-k overlap") {
    val left = Seq(("a", 3.0), ("b", 2.0), ("c", 1.0)).toDF("item", "s")
    val right = Seq(("a", 1.0), ("b", 3.0), ("c", 2.0)).toDF("item", "s")
    // left ranks a=1,b=2,c=3; right ranks b=1,c=2,a=3
    // (a,b) discordant, (a,c) discordant, (b,c) concordant
    val r = Analytics.rankAgreement(left, right, "item", "s", topK = 2)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((3L, 1L, 2L, 1L))) // top-2 sets {a,b} vs {b,c} share only b
  }

  test("firstTouchMix: timestamp ties break by event id; months partition new users") {
    val events = Seq(
      // u1: two events at the SAME ts -> event_id 10 wins -> "search"
      (1L, ts("2024-01-05 10:00:00"), 10L, "search"),
      (1L, ts("2024-01-05 10:00:00"), 11L, "checkout"),
      // u2 first touches in February
      (2L, ts("2024-02-01 09:00:00"), 20L, "browse"),
      (2L, ts("2024-02-02 09:00:00"), 21L, "search"),
      // u3 also January, via browse
      (3L, ts("2024-01-20 09:00:00"), 30L, "browse")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Analytics.firstTouchMix(events, "user_id", "ts", "event_id",
      "event_type").collect()
      .map(x => (x.getDate(0).toString, x.getString(1)) ->
        ((x.getLong(2), x.getLong(3)))).toMap
    assert(r == Map(
      ("2024-01-01", "search") -> ((1L, 500000L)),
      ("2024-01-01", "browse") -> ((1L, 500000L)),
      ("2024-02-01", "browse") -> ((1L, 1000000L))))
  }

  test("orderCountSurvival: at-least column is the descending cumulative") {
    val orders = Seq(1L, 1L, 1L, 2L, 2L, 3L).map(c => Tuple1(c))
      .toDF("o_custkey")
    val r = Analytics.orderCountSurvival(orders, "o_custkey").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r == Map(
      1L -> ((1L, 3L, 1000000L)),  // all 3 customers have >= 1 order
      2L -> ((1L, 2L, 666666L)),
      3L -> ((1L, 1L, 333333L))))
  }

  test("layout runCounts: exact runs across range-partition boundaries, null-safe") {
    import graft.operators.LayoutAdvisor
    // 8 rows over 4 shuffle partitions -> boundary pairs are exercised
    val df = Seq(
      (1L, Some("a"), 10L), (2L, Some("a"), 10L), (3L, None, 10L),
      (4L, None, 20L), (5L, Some("b"), 20L), (6L, Some("b"), 20L),
      (7L, Some("b"), 30L), (8L, Some("c"), 30L)
    ).toDF("k", "v", "g")
    val r = LayoutAdvisor.runCounts(df, Seq("k"), Seq("v", "g"), "by_k")
      .collect().map(x => x.getString(1) -> ((x.getLong(2), x.getLong(3))))
      .toMap
    // v: a,a,null,null,b,b,b,c -> 4 runs; g: 10,10,10,20,20,20,30,30 -> 3
    assert(r("v") == ((8L, 4L)))
    assert(r("g") == ((8L, 3L)))
  }

  test("layout runCounts: empty input reports zero runs") {
    import graft.operators.LayoutAdvisor
    val df = Seq.empty[(Long, String)].toDF("k", "v")
    val r = LayoutAdvisor.runCounts(df, Seq("k"), Seq("v"), "e").collect()
    assert(r.map(x => (x.getLong(2), x.getLong(3))).toSeq == Seq((0L, 0L)))
  }

  test("geo blockNeighborPairs: boundary-distance pair kept; cross-cell pair found exactly once") {
    import graft.operators.Geo
    val pts = Seq(
      (1L, 0L, 0L),
      (2L, 300000L, 400000L),      // d2 = 2.5e11 = r^2 exactly -> kept
      (3L, 999999L, 999999L),      // cell (0,0) corner
      (4L, 1000001L, 1000001L),    // cell (1,1): pairs with 3 across cells
      (5L, 5000000L, 5000000L)     // far away: no pairs
    ).toDF("id", "ulat", "ulon")
    val r = Geo.blockNeighborPairs(pts, cellMicroDeg = 1000000L,
      radiusMicroDeg = 500000L).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // pair (1,2): d2 = 2.5e11 -> band 25; pair (3,4): d2 = 8 -> band 0
    assert(r == Map(0L -> 1L, 25L -> 1L))
  }

  test("hashBootstrapMeanCI: a constant column collapses the interval onto the mean") {
    import graft.operators.Sampling
    val df = (1L to 200L).map(i => (i, 700L)).toDF("id", "cents")
    val r = Sampling.hashBootstrapMeanCI(df, "id", col("cents")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
      == ((200L, 700L, 700L, 700L, 32)))
  }

  test("hashBootstrapMedianCI: a constant column collapses the interval onto the median") {
    import graft.operators.Sampling
    val df = (1L to 200L).map(i => (i, 900L)).toDF("id", "cents")
    val r = Sampling.hashBootstrapMedianCI(df, "id", col("cents")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
      == ((200L, 900L, 900L, 900L, 32)))
  }

  test("hashBootstrap: odd resample counts are rejected (paired-draw contract)") {
    import graft.operators.Sampling
    val df = (1L to 10L).map(i => (i, 1L)).toDF("id", "cents")
    intercept[IllegalArgumentException](
      Sampling.hashBootstrapMedianCI(df, "id", col("cents"), nResamples = 5))
    intercept[IllegalArgumentException](
      Sampling.hashBootstrapMeanCI(df, "id", col("cents"), nResamples = 7))
  }

  test("lifetimeSpanHistogram: single-day users band at -1; spans band by bit length") {
    val events = Seq(
      (1L, ts("2024-01-01 09:00:00")), (1L, ts("2024-01-01 18:00:00")), // span 0
      (2L, ts("2024-01-01 09:00:00")), (2L, ts("2024-01-04 09:00:00")), // span 3 -> band 1
      (3L, ts("2024-01-01 09:00:00")), (3L, ts("2024-01-09 09:00:00"))  // span 8 -> band 3
    ).toDF("user_id", "ts")
    val r = Analytics.lifetimeSpanHistogram(events, "user_id", "ts")
      .collect().map(x => x.getInt(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r == Map(
      -1 -> ((1L, 0L, 0L, 333333L)),
      1 -> ((1L, 3L, 3L, 333333L)),
      3 -> ((1L, 8L, 8L, 333333L))))
  }

  test("topDecileRetention: only customers top in BOTH quarters count as retained") {
    // Q1 spends: custs 1..10 spend 1..10 -> top decile cut = v with
    // 10*cum >= 9*10 -> v=9 -> top = {9, 10}
    val q1 = (1L to 10L).map(c => (c, ts("2024-01-15 00:00:00"), c * 100L))
    // Q2: cust 10 stays huge, cust 9 collapses; others small
    val q2 = Seq((10L, ts("2024-04-15 00:00:00"), 1000L),
      (9L, ts("2024-04-15 00:00:00"), 1L)) ++
      (1L to 8L).map(c => (c, ts("2024-04-15 00:00:00"), 2L))
    val orders = (q1 ++ q2).toDF("cust", "ts", "cents")
    val r = Analytics.topDecileRetention(orders, "cust", "ts", col("cents"))
      .collect().map(x => x.getDate(0).toString ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // Q1 top {9,10}; of those only 10 is top in Q2 -> 1 of 2 retained.
    // Q2 has no observed next quarter -> no row.
    assert(r == Map("2024-01-01" -> ((2L, 1L, 500000L))))
  }

  test("cadenceDispersionCensus: metronomic, bursty, and poisson-ish users classified exactly") {
    def series(u: Long, gaps: Seq[Long]): Seq[(Long, java.sql.Timestamp)] = {
      var t = 0L
      (u, ts("2024-01-01 00:00:00")) +: gaps.map { g =>
        t += g; (u, new java.sql.Timestamp(
          ts("2024-01-01 00:00:00").getTime + t * 1000))
      }
    }
    val events = (
      series(1L, Seq(60, 60, 60, 60)) ++          // constant gaps: D=0 -> metronomic
      series(2L, Seq(1, 1, 1, 1, 996)) ++         // one huge gap: bursty
      series(3L, Seq(30, 90, 60, 45, 75))         // moderate spread
    ).toDF("user_id", "ts")
    val r = Analytics.cadenceDispersionCensus(events, "user_id", "ts")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("3_metronomic") >= 1L)
    assert(r("1_bursty") >= 1L)
    assert(r.values.sum == 3L)
  }

  test("outageStreaks: gaps-and-islands finds the longest dark run per type") {
    val events = Seq(
      // type a: active days 1, 5 -> dark 2,3,4 = streak 3 within span 1..5
      ("a", "2024-01-01"), ("a", "2024-01-05"),
      // type b: active every day of the span -> 0 dark
      ("b", "2024-01-01"), ("b", "2024-01-02"), ("b", "2024-01-03"),
      ("b", "2024-01-04"), ("b", "2024-01-05")
    ).map { case (t, d) => (t, ts(s"$d 10:00:00")) }
      .toDF("event_type", "ts")
    val r = Analytics.outageStreaks(events, "ts", "event_type").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r("a") == ((5L, 3L, 3L)))
    assert(r("b") == ((5L, 0L, 0L)))
  }

  test("qqDecileTable: rank-exact lower deciles per arm; gaps are plain differences") {
    // arm 0: values 1..10 -> decile d = d; arm 1: values 11..20 -> d+10
    val df = ((1L to 10L).map(v => (0, v)) ++ (11L to 20L).map(v => (1, v)))
      .toDF("a", "v")
    val r = Analytics.qqDecileTable(df, col("a"), col("v")).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r.size == 9)
    (1 to 9).foreach { d =>
      assert(r(d) == ((d.toLong, d + 10L, 10L)), s"decile $d: ${r(d)}")
    }
  }

  test("ksDistance: disjoint supports give KS 1e6 at the smaller arm's top value") {
    // arm 0 all values <= 10, arm 1 all values > 10: F gap hits 1 at v=10
    val df = Seq((0, 5L), (0, 10L), (1, 20L), (1, 30L)).toDF("a", "v")
    val r = Analytics.ksDistance(df, col("a"), col("v")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 2L, 1000000L, 10L)))
  }

  test("ksDistance: identical distributions score zero") {
    val df = Seq((0, 5L), (0, 9L), (1, 5L), (1, 9L)).toDF("a", "v")
    val r = Analytics.ksDistance(df, col("a"), col("v")).collect().head
    assert(r.getLong(2) == 0L)
  }

  test("neymanAllocationPlan: zero-variance strata get nothing; allocations conserve the budget") {
    import graft.operators.Sampling
    val df = Seq(
      // stratum A: constant values -> sigma 0 -> weight 0
      ("A", 100L), ("A", 100L), ("A", 100L),
      // stratum B: spread values -> positive weight takes the whole budget
      ("B", 0L), ("B", 200L), ("B", 400L)
    ).toDF("s", "v")
    val r = Sampling.neymanAllocationPlan(df, "s", col("v"), budget = 10L)
      .collect().map(x => x.getString(0) -> ((x.getLong(2), x.getLong(3))))
      .toMap
    assert(r("A")._1 == 0L && r("A")._2 == 0L)
    assert(r("B")._2 == 10L)
    assert(r.values.map(_._2).sum == 10L)
  }

  test("spendTrajectoryCensus: slope sign classifies; short histories excluded") {
    val orders = Seq(
      // rising: 100, 200, 300
      (1L, "2024-01-01", 100L), (1L, "2024-01-02", 200L), (1L, "2024-01-03", 300L),
      // falling: 300, 200, 100
      (2L, "2024-01-01", 300L), (2L, "2024-01-02", 200L), (2L, "2024-01-03", 100L),
      // flat: 150 x3
      (3L, "2024-01-01", 150L), (3L, "2024-01-02", 150L), (3L, "2024-01-03", 150L),
      // only two orders: excluded
      (4L, "2024-01-01", 1L), (4L, "2024-01-02", 2L)
    ).map { case (c, d, v) => (c, ts(s"$d 00:00:00"), v) }
      .toDF("cust", "ts", "cents")
    val r = Analytics.spendTrajectoryCensus(orders, "cust", "ts", col("cents"))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r == Map(
      "1_rising" -> ((1L, 3L, 333333L)),
      "2_falling" -> ((1L, 3L, 333333L)),
      "3_flat" -> ((1L, 3L, 333333L))))
  }

  test("cohortValueCurve: purchase value lands in the buyer's cohort-week offset cell") {
    val events = Seq(
      // u1 first active week of Jan 1 (browse); buys in week 0 and week 2
      (1L, ts("2024-01-02 10:00:00"), "browse", 0.0),
      (1L, ts("2024-01-03 10:00:00"), "purchase", 10.5),
      (1L, ts("2024-01-16 10:00:00"), "purchase", 4.5),
      // u2 same cohort week, never buys
      (2L, ts("2024-01-04 10:00:00"), "browse", 0.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val r = Analytics.cohortValueCurve(events, "user_id", "ts", "value",
      col("event_type") === "purchase").collect()
      .map(x => (x.getDate(0).toString, x.getInt(1)) ->
        ((x.getLong(2), x.getDouble(3)))).toMap
    assert(r == Map(
      ("2024-01-01", 0) -> ((1L, 10.5)),
      ("2024-01-01", 2) -> ((1L, 4.5))))
  }

  test("orderCollisionCensus: same-customer repeats don't collide; cross-customer ones do") {
    val orders = Seq(
      // 3 different customers, same day+amount -> group of 3
      (1L, ts("2024-01-01 00:00:00"), 999L),
      (2L, ts("2024-01-01 00:00:00"), 999L),
      (3L, ts("2024-01-01 00:00:00"), 999L),
      // same customer twice -> NOT a collision (nc = 1)
      (4L, ts("2024-01-02 00:00:00"), 500L),
      (4L, ts("2024-01-02 00:00:00"), 500L),
      // pairwise collision on another day
      (5L, ts("2024-01-03 00:00:00"), 777L),
      (6L, ts("2024-01-03 00:00:00"), 777L)
    ).toDF("cust", "ts", "cents")
    val r = Analytics.orderCollisionCensus(orders, "cust", "ts", col("cents"))
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(2L -> ((1L, 2L)), 3L -> ((1L, 3L))))
  }

  test("discountLift: lift is relative to the zero-discount band, division before subtraction") {
    val df = Seq((0.0, 10.0), (0.0, 10.0), (0.05, 15.0), (0.10, 5.0))
      .toDF("d", "q")
    val r = Analytics.discountLift(df, "d", "q").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r(0L) == ((2L, 10000L, 0L)))
    assert(r(500L) == ((1L, 15000L, 500000L)))   // +50%
    assert(r(1000L) == ((1L, 5000L, -500000L)))  // -50%
  }

  test("transitionDwellMedian: per-pair lower medians; ts ties ordered by event id") {
    val events = Seq(
      // u1: a -10s-> b, a -30s-> b (via second visit), a -20s-> b
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:00:10"), 2L, "b"),
      (2L, ts("2024-01-01 10:00:00"), 3L, "a"),
      (2L, ts("2024-01-01 10:00:30"), 4L, "b"),
      (3L, ts("2024-01-01 10:00:00"), 5L, "a"),
      (3L, ts("2024-01-01 10:00:20"), 6L, "b"),
      // u4: tied timestamps -> id order decides a->c (not c->a)
      (4L, ts("2024-01-01 09:00:00"), 7L, "a"),
      (4L, ts("2024-01-01 09:00:00"), 8L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Analytics.transitionDwellMedian(events, "user_id", "ts",
      "event_id", "event_type").collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3)))).toMap
    // a->b gaps {10, 30, 20}: lower median 20
    assert(r(("a", "b")) == ((3L, 20L)))
    assert(r(("a", "c")) == ((1L, 0L)))
    assert(!r.contains(("c", "a")))
  }

  test("hashBootstrapDiffCI: constant arm offset is detected as significant with a degenerate interval") {
    import graft.operators.Sampling
    // arm 0 pays 500, arm 1 pays 900: every resample diff is exactly 400
    val df = (1L to 400L).map(i => (i, (i % 2).toInt, if (i % 2 == 1) 900L else 500L))
      .toDF("id", "arm", "cents")
    val r = Sampling.hashBootstrapDiffCI(df, "id", col("arm"), col("cents"))
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((200L, 200L)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))
      == ((400L, 400L, 400L, 1)))
  }

  test("doubleChargeAudit: consecutive same-amount pairs inside the window; k retries -> k-1 pairs") {
    val events = Seq(
      // u1: 3 rapid retries of 9.99 -> 2 pairs; a different amount nearby
      (1L, ts("2024-01-01 10:00:00"), 9.99),
      (1L, ts("2024-01-01 10:01:00"), 9.99),
      (1L, ts("2024-01-01 10:02:00"), 9.99),
      (1L, ts("2024-01-01 10:01:30"), 5.00),
      // u2: same amount but 10 minutes apart -> no pair
      (2L, ts("2024-01-01 10:00:00"), 7.50),
      (2L, ts("2024-01-01 10:10:00"), 7.50)
    ).toDF("user_id", "ts", "value")
    val r = Analytics.doubleChargeAudit(events, "user_id", "ts", col("value"))
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map(1L -> ((2L, 1L))))
  }

  test("popularityAffinity: exact mean popularity per breadth group") {
    // items: A bought by 3 customers, B by 1
    val df = Seq(
      (1L, "A"), (2L, "A"), (3L, "A"), (3L, "B"), (3L, "B") // dup row collapses
    ).toDF("c", "i")
    val r = Analytics.popularityAffinity(df, "c", "i").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // breadth 1: customers 1,2 each buy A (pop 3) -> mean 3000 milli
    // breadth 2: customer 3 buys A(3) + B(1) -> mean 2000 milli
    assert(r == Map(1L -> ((2L, 3000L)), 2L -> ((1L, 2000L))))
  }

  test("abcClassification: boundary entity lands in the later class") {
    // revenues 80, 15, 5: cum shares 80% (A, exactly at the cut), 95% (B,
    // exactly at the cut), 100% (C)
    val df = Seq((1L, 8000L), (2L, 1500L), (3L, 500L))
      .toDF("k", "cents")
    val r = Analytics.abcClassification(df, "k", col("cents")).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r("A") == ((1L, 8000L, 800000L)))
    assert(r("B") == ((1L, 1500L, 150000L)))
    assert(r("C") == ((1L, 500L, 50000L)))
  }

  test("medianDeltaTrend: lower median of consecutive-day deltas; single-day types drop") {
    val events = Seq(
      // type a: days with counts 1, 3, 2, 6 -> deltas [2, -1, 4] -> median 2... sorted [-1,2,4] -> lower median 2
      ("a", "2024-01-01", 1), ("a", "2024-01-02", 3),
      ("a", "2024-01-03", 2), ("a", "2024-01-04", 6),
      ("b", "2024-01-01", 1)  // single day: no deltas -> dropped
    ).flatMap { case (t, d, n) =>
      (1 to n).map(i => (t, ts(s"$d 0$i:00:00")))
    }.toDF("event_type", "ts")
    val r = Analytics.medianDeltaTrend(events, "ts", "event_type").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r == Map("a" -> ((4L, 2L))))
  }

  test("priceEndingCensus: endings counted mod 100 with exact shares, count-desc order") {
    val df = Seq(1099L, 2099L, 399L, 500L).map(Tuple1(_)).toDF("cents")
    val r = Analytics.priceEndingCensus(df, col("cents"), topK = 2).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((99L, 3L, 750000L), (0L, 1L, 250000L)))
  }

  test("retentionHalfLife: first sub-half week found; fully-retained cohort reports -1") {
    val events = Seq(
      // cohort of week 2024-01-01: users 1,2 both active week 0;
      // only u1 in week 1 (2*1 < 2 false -> not below half);
      // nobody in week 2... absent weeks don't emit rows, so the half-life
      // must come from an OBSERVED below-half week: u1 returns week 3 alone
      (1L, ts("2024-01-02 10:00:00")), (2L, ts("2024-01-03 10:00:00")),
      (1L, ts("2024-01-09 10:00:00")), (2L, ts("2024-01-09 11:00:00")),
      (1L, ts("2024-01-23 10:00:00"))   // week 3: 1 of 2 -> 2*1<2 false
    ).toDF("user_id", "ts")
    val r = Analytics.retentionHalfLife(events, "user_id", "ts").collect()
      .map(x => x.getDate(0).toString -> ((x.getLong(1), x.getInt(2)))).toMap
    // week 3 retains exactly half (1 of 2): 2*1 < 2 is FALSE -> never below
    assert(r("2024-01-01") == ((2L, -1)))
  }

  test("retentionHalfLife: a genuinely sub-half week is picked as the minimum offset") {
    val events = Seq(
      (1L, ts("2024-01-02 10:00:00")), (2L, ts("2024-01-03 10:00:00")),
      (3L, ts("2024-01-03 11:00:00")),
      (1L, ts("2024-01-16 10:00:00"))   // week 2: 1 of 3 -> 2*1 < 3 -> below
    ).toDF("user_id", "ts")
    val r = Analytics.retentionHalfLife(events, "user_id", "ts").collect()
      .map(x => x.getDate(0).toString -> ((x.getLong(1), x.getInt(2)))).toMap
    assert(r("2024-01-01") == ((3L, 2)))
  }

  test("stickiness: everyone active every day scores 1e6; the ratio floors once") {
    val events = Seq(
      (1L, ts("2024-03-01 10:00:00")), (2L, ts("2024-03-01 11:00:00")),
      (1L, ts("2024-03-02 10:00:00")), (2L, ts("2024-03-02 11:00:00")),
      // second event same user same day: no extra DAU
      (1L, ts("2024-03-02 12:00:00")),
      // April: u1 active 1 of 2 active days, u3 the other
      (1L, ts("2024-04-01 10:00:00")), (3L, ts("2024-04-05 10:00:00"))
    ).toDF("user_id", "ts")
    val r = Analytics.stickiness(events, "user_id", "ts").collect()
      .map(x => x.getDate(0).toString ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r("2024-03-01") == ((2L, 2L, 2L, 1000000L)))
    // April: sum_dau 2 over 2 days, mau 2 -> 2*1e6/(2*2) = 500000
    assert(r("2024-04-01") == ((2L, 2L, 1L, 500000L)))
  }

  test("singleSourceCensus: bands split on exact share boundaries") {
    val li = Seq(
      // part 1: 4 rows from supplier A -> 100% single-sourced
      (1L, "A"), (1L, "A"), (1L, "A"), (1L, "A"),
      // part 2: 1 of 4 from the top supplier... all equal at 25% -> band 1
      (2L, "A"), (2L, "B"), (2L, "C"), (2L, "D"),
      // part 3: 3 of 4 from A -> 75% -> band 3 boundary (<= 750000)
      (3L, "A"), (3L, "A"), (3L, "A"), (3L, "B")
    ).toDF("l_partkey", "l_suppkey")
    val r = Analytics.singleSourceCensus(li, "l_partkey", "l_suppkey")
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))).toMap
    assert(r("1_under_25pct") == ((1L, 250000L, 250000L, 4L)))
    assert(r("3_under_75pct") == ((1L, 750000L, 750000L, 2L)))
    assert(r("5_over_90pct") == ((1L, 1000000L, 1000000L, 1L)))
  }

  test("chiSquareAudit: independent 2x2 table has zero contributions") {
    // perfectly independent: every cell observed == expected
    val df = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("g", "h")
    val r = Analytics.chiSquareAudit(df, "g", "h").collect()
    assert(r.length == 4)
    r.foreach { x =>
      assert(x.getLong(2) == 1L)        // observed
      assert(x.getLong(3) == 1000L)     // expected_milli = 2*2*1000/4
      assert(x.getLong(4) == 0L)        // contrib_micro
    }
  }

  test("chiSquareAudit: fully dependent cells carry the whole statistic") {
    // g determines h: O=2,E=1 on the diagonal -> contrib (2*4-2*2)^2*1e6
    // / (4*2*2) = 16e6/16 = 1e6 micro each
    val df = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("g", "h")
    val r = Analytics.chiSquareAudit(df, "g", "h").collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(4)).toMap
    assert(r == Map(("a", "x") -> 1000000L, ("b", "y") -> 1000000L))
  }

  test("sessionGapSweep: session counts fall as the threshold widens") {
    // u1: gaps 600s and 2000s; u2: single event (no gaps)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 10:43:20")),
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")
    val r = Analytics.sessionGapSweep(events, "user_id", "ts",
      Seq(300L, 1800L, 3600L)).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // tau=300: both gaps split -> 2 + 2 = 4 sessions, 4 events -> 1000 milli
    // tau=1800: only the 2000s gap splits -> 3 sessions
    // tau=3600: nothing splits -> 2 sessions, 4*1000 DIV 2 = 2000
    assert(r(300L) == ((4L, 1000L)))
    assert(r(1800L) == ((3L, 1333L)))
    assert(r(3600L) == ((2L, 2000L)))
  }

  test("categoricalMixDrift: vanished category counts its full share; spine zero-fills") {
    // p1: a=2/4, b=2/4; p2: a=4/4, b absent -> |1e6-5e5| + |0-5e5| = 1e6
    // p3: a=1/2, c=1/2 (new cat; c was 0 in p1/p2 via the spine)
    val df = Seq(
      (1, "a"), (1, "a"), (1, "b"), (1, "b"),
      (2, "a"), (2, "a"), (2, "a"), (2, "a"),
      (3, "a"), (3, "c")
    ).toDF("p", "cat")
    val r = Analytics.categoricalMixDrift(df, "p", "cat").collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r.keySet == Set(2, 3))
    assert(r(2) == ((1000000L, 3L)))
    // p2 -> p3: a 1e6->5e5 (5e5), b 0->0 (0), c 0->5e5 (5e5) = 1e6
    assert(r(3) == ((1000000L, 3L)))
  }

  test("categoricalMixDrift: single period emits no rows; NULL categories excluded") {
    val df = Seq((1, "a"), (1, null.asInstanceOf[String])).toDF("p", "cat")
    assert(Analytics.categoricalMixDrift(df, "p", "cat").count() == 0L)
  }

  test("decileMigration: reversed values flip deciles; shares are per-from-row") {
    // 10 customers; year 2 reverses the spend order -> decile d maps to 11-d
    val df = ((1 to 10).map(i => (i.toLong, "2023-01-15", i * 100L)) ++
      (1 to 10).map(i => (i.toLong, "2024-01-15", (11 - i) * 100L)))
      .toDF("cust", "d", "cents")
    val rows = Analytics.decileMigration(df, "cust", "d", col("cents")).collect()
    val m = rows.map(x => (x.getInt(0), x.getInt(1)) -> x.getLong(2)).toMap
    assert(m == (1 to 10).map(i => (i, 11 - i) -> 1L).toMap)
    assert(rows.forall(_.getLong(3) == 1000000L), "single-cell rows own their from-share")
  }

  test("isotonicRateFit: pools the adjacent violator, leaves the monotone tail") {
    // raw rates 750000, 250000, 500000, 1000000 -> PAV pools bands 1-2
    // to (3+1)/(4+4) = 500000; band 3 already level; band 4 stands alone.
    val bands = Seq((1L, 3L, 4L), (2L, 1L, 4L), (3L, 2L, 4L), (4L, 4L, 4L))
      .toDF("band", "succ", "trials")
    val r = Analytics.isotonicRateFit(bands, "band", "succ", "trials")
      .collect().map(x => (x.getLong(0), x.getLong(4)))
    assert(r.toSeq == Seq((1L, 500000L), (2L, 500000L), (3L, 500000L),
      (4L, 1000000L)))
    val fits = r.map(_._2)
    assert(fits.sliding(2).forall(p => p.head <= p.last), "fit must be non-decreasing")
  }

  test("mannKendallTrend: tie-corrected S and variance match the hand computation") {
    // values 1,2,2,3,4: S = 9; tie group of 2 -> tieSum = 18;
    // var18 = 5*4*15 - 18 = 282; (9-1)^2*180000 = 11_520_000 > 38416*282
    val df = (Seq(("k", 1, 1L), ("k", 2, 2L), ("k", 3, 2L), ("k", 4, 3L),
      ("k", 5, 4L)) ++ Seq(("f", 1, 7L), ("f", 2, 7L), ("f", 3, 7L)))
      .toDF("key", "t", "v")
    val rows = Analytics.mannKendallTrend(df, "key", "t", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    assert(rows("k") == ((5L, 9L, 282L, "increasing")))
    // constant series: S = 0, all values tied -> verdict "none"
    assert(rows("f")._2 == 0L && rows("f")._4 == "none")
  }

  test("theilSenSlope: pair-slope median resists the outlier OLS chases") {
    val d0 = java.sql.Date.valueOf("1992-01-01")
    def day(i: Int) = new java.sql.Date(d0.getTime + i * 86400000L)
    val df = Seq((day(0), 0L), (day(1), 10L), (day(2), 20L), (day(3), 1000L))
      .toDF("d", "y")
    val r = Analytics.theilSenSlope(df, "d", "y").collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 6L)
    assert(r.getLong(2) == 10000000L, "median slope ignores the outlier")
    assert(r.getLong(3) == 301000000L, "OLS slope is dragged by it")
  }

  test("theilSenSlope: negative slope floors toward -inf like the oracle's //") {
    val d0 = java.sql.Date.valueOf("1992-01-01")
    def day(i: Int) = new java.sql.Date(d0.getTime + i * 86400000L)
    // one pair: dy = -1000e6 over dt = 3 -> floor = -333333334 (not -333333333)
    val df = Seq((day(0), 1000L), (day(3), 0L)).toDF("d", "y")
    val r = Analytics.theilSenSlope(df, "d", "y").collect().head
    assert(r.getLong(2) == -333333334L)
  }

  test("rollingMedianByDay: calendar window, not row window — gaps shrink it") {
    def day(i: Int) = java.sql.Date.valueOf(s"2024-01-0$i")
    // days 1,2,3,6: day 6's trailing 3-day window covers days 4-6 -> itself only
    val df = Seq((day(1), 10L), (day(2), 50L), (day(3), 20L), (day(6), 40L))
      .toDF("d", "v")
    val r = Analytics.rollingMedianByDay(df, "d", "v", windowDays = 3)
      .collect().map(x => (x.getDate(0).toString, x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(
      ("2024-01-01", 1L, 10L), ("2024-01-02", 2L, 10L),
      ("2024-01-03", 3L, 20L), ("2024-01-06", 1L, 40L)))
  }

  test("kaplanMeier: ppm-floored product over the lag-ordered life table") {
    val lt = Seq((0L, 4L, 1L), (1L, 3L, 1L), (2L, 2L, 0L))
      .toDF("lag_days", "n_at_risk", "n_converted")
    val r = Analytics.kaplanMeier(lt, "lag_days", "n_at_risk", "n_converted")
      .collect().map(x => (x.getLong(0), x.getLong(3)))
    // S(0)=1e6*3/4=750000; S(1)=750000*2/3=500000; S(2) unchanged (d=0)
    assert(r.toSeq == Seq((0L, 750000L), (1L, 500000L), (2L, 500000L)))
  }

  test("spearmanRho: +-1e6 at the monotone extremes; ties use doubled avg ranks") {
    val a = Seq(("x", 1L), ("y", 2L), ("z", 3L)).toDF("k", "v")
    val up = Seq(("x", 10L), ("y", 20L), ("z", 30L)).toDF("k", "v")
    val dn = Seq(("x", 30L), ("y", 20L), ("z", 10L)).toDF("k", "v")
    assert(Analytics.spearmanRho(a, up, "k", "v").collect().head.getLong(1)
      == 1000000L)
    assert(Analytics.spearmanRho(a, dn, "k", "v").collect().head.getLong(1)
      == -1000000L)
    // tie in a: ranks2 a = [3,3,6], b = [2,4,6] -> cov 18, vp 432,
    // isqrt 20 -> 900000
    val tied = Seq(("x", 1L), ("y", 1L), ("z", 2L)).toDF("k", "v")
    val r = Analytics.spearmanRho(tied, up, "k", "v").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 900000L)
  }

  test("spearmanRho: 400 common keys survive (vp ~ 7e19 wrapped BIGINT before r9)") {
    // 16n^8-scale variance product: the pre-decimal-staging form silently
    // wrapped past ~300 keys (sqrt of a negative -> null rho); perfectly
    // monotone data keeps the expected value exactly +-1e6 at any n
    val big = (1 to 400).map(i => (s"k$i", i.toLong)).toDF("k", "v")
    val bigDn = (1 to 400).map(i => (s"k$i", 1000L - i)).toDF("k", "v")
    val up = Analytics.spearmanRho(big, big, "k", "v").collect().head
    assert(up.getLong(0) == 400L && up.getLong(1) == 1000000L)
    assert(Analytics.spearmanRho(big, bigDn, "k", "v").collect().head.getLong(1)
      == -1000000L)
  }

  test("markovStationary: 4 floor-per-round power iterations, hand-traced") {
    // a -> b always; b -> a / b -> b half each
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 12:00:00"), 3L, "b"),
      (2L, ts("2024-01-02 10:00:00"), 4L, "b"),
      (2L, ts("2024-01-02 11:00:00"), 5L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Analytics.markovStationary(events, "user_id", "ts", "event_id",
      "event_type", rounds = 4).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // v0=(5e5,5e5); r1=(25e4,75e4); r2=(375e3,625e3); r3=(3125e2,6875e2);
    // r4=(343750,656250)
    assert(r == Map("a" -> 343750L, "b" -> 656250L))
  }

  test("cmhStratifiedRatio: MH ratio recovers the common RR where crude inflates") {
    // both strata have RR = 2; exposure concentrates in the high-rate
    // stratum, so the crude ratio balloons to 7.625
    def rows(st: Int, e: Int, y: Int, n: Int) = Seq.fill(n)((st, e, y))
    val df = (rows(1, 1, 1, 1) ++ rows(1, 1, 0, 9) ++
      rows(1, 0, 1, 5) ++ rows(1, 0, 0, 95) ++
      rows(2, 1, 1, 60) ++ rows(2, 1, 0, 40) ++
      rows(2, 0, 1, 3) ++ rows(2, 0, 0, 7)).toDF("st", "e", "y")
    val r = Analytics.cmhStratifiedRatio(df, col("st"), col("e"), col("y"))
      .collect().head
    assert(r.getLong(0) == 2L)
    assert((r.getLong(1), r.getLong(2)) == ((554545L, 72727L)))
    assert(r.getLong(3) == 7625000L, "crude ratio is confounded")
    assert(r.getLong(4) == 2000000L, "MH recovers the within-stratum RR of 2")
  }

  test("quantileTreatmentEffect: exact per-arm rank quantiles and their shift") {
    val df = ((1 to 10).map(i => (0, i * 1L)) ++ (1 to 10).map(i => (1, i + 5L)))
      .toDF("arm", "v")
    val r = Analytics.quantileTreatmentEffect(df, col("arm"), col("v"),
      pcts = Seq(10, 50, 90)).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r(10) == ((1L, 6L, 5L)))
    assert(r(50) == ((5L, 10L, 5L)))
    assert(r(90) == ((9L, 14L, 5L)))
  }

  test("logrankNumerators: O, E, and variance match the hand hypergeometrics") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), "signup"),
      (1L, ts("2024-01-01 11:00:00"), "purchase"),   // arm1, conv lag 0
      (2L, ts("2024-01-01 10:00:00"), "signup"),
      (2L, ts("2024-01-02 10:00:00"), "purchase"),   // arm0, conv lag 1
      (3L, ts("2024-01-01 10:00:00"), "signup"),     // arm1, censored lag 2
      (3L, ts("2024-01-03 10:00:00"), "view")        // sets the horizon
    ).toDF("user_id", "ts", "event_type")
    val r = Analytics.logrankNumerators(events, "user_id", "ts",
      "event_type", "signup", "purchase", pmod(col("user_id"), lit(2)))
      .collect().head
    // lag0: n1=2 n0=1 d=1 -> E1 += 666, V += 222222
    // lag1: n1=1 n0=1 d=1 -> E1 += 500, V += 250000
    assert((r.getLong(0), r.getLong(1)) == ((2L, 1L)))
    assert(r.getLong(2) == 1166L)
    assert(r.getLong(3) == -166L)
    assert(r.getLong(4) == 472222L)
  }

  test("markovRemovalAttribution: hand-traced absorption and removal effects") {
    // u1: click->CONV; u2: view->NULL; u3: click->view->CONV; u4: view->NULL
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click"),
      (1L, ts("2024-01-01 11:00:00"), 2L, "purchase"),
      (2L, ts("2024-01-02 10:00:00"), 3L, "view"),
      (3L, ts("2024-01-03 10:00:00"), 4L, "click"),
      (3L, ts("2024-01-03 11:00:00"), 5L, "view"),
      (3L, ts("2024-01-03 12:00:00"), 6L, "purchase"),
      (4L, ts("2024-01-04 10:00:00"), 7L, "view")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val r = Analytics.markovRemovalAttribution(events, "user_id", "ts",
      "event_id", "event_type", "purchase", rounds = 6).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    // base absorption from START converges to 499999 ppm (floors);
    // removing click leaves only START->view (166666), removing view
    // leaves START->click->CONV (250000)
    val (reClick, reView) = (499999L - 166666L, 499999L - 250000L)
    val tot = reClick + reView
    assert(r("click") == ((499999L, reClick, reClick * 1000000L / tot)))
    assert(r("view") == ((499999L, reView, reView * 1000000L / tot)))
  }

  test("cohensKappa: hand 2x2 table and the exact negative-branch floor") {
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
      .toDF("truth", "pred")
    val r = Analytics.cohensKappa(df, col("truth"), col("pred")).collect().head
    // n=4, agree=3, pe_num = r(a)k(a)+r(b)k(b) = 3*2+1*2 = 8
    // kappa = (12-8)e6/(16-8) = 500000
    assert((r.getLong(0), r.getLong(1)) == ((4L, 3L)))
    assert(r.getLong(2) == 750000L && r.getLong(3) == 500000L)
    assert(r.getLong(4) == 500000L)
    val neg = Analytics.cohensKappa(
      Seq(("a", "b"), ("b", "a")).toDF("t", "p"), col("t"), col("p"))
      .collect().head
    assert(neg.getLong(4) == -1000000L, "perfect disagreement is kappa -1")
    // degenerate single-class corpus: p_e = 1 zeroes the denominator —
    // kappa reports 0 by convention instead of NULL (r9 ADVICE guard)
    val degen = Analytics.cohensKappa(
      Seq(("a", "a"), ("a", "a")).toDF("t", "p"), col("t"), col("p"))
      .collect().head
    assert(degen.getLong(3) == 1000000L && degen.getLong(4) == 0L)
  }

  test("mcnemarPaired: discordant cells only; exact chi2 and the 5% verdict") {
    // truth all 't'; A right on 5 of 10, B right on 2 — discordants a_only=4, b_only=1
    val rows = Seq(
      ("t", "t", "t"), ("t", "t", "x"), ("t", "t", "x"), ("t", "t", "x"),
      ("t", "t", "x"), ("t", "x", "t"), ("t", "x", "x"), ("t", "x", "x"),
      ("t", "x", "x"), ("t", "x", "x")).toDF("truth", "pa", "pb")
    val r = Analytics.mcnemarPaired(rows, col("truth"), col("pa"), col("pb"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((10L, 5L, 2L)))
    assert((r.getLong(3), r.getLong(4)) == ((4L, 1L)))
    // chi2 = (4-1)^2 * 1000 / 5 = 1800 milli; 9e4 < 38415*5 -> same
    assert(r.getLong(5) == 1800L && r.getString(6) == "same")
    // 10 vs 0 discordants: (10)^2*1e4 = 1e6 > 38415*10 -> different
    val strong = (1 to 10).map(_ => ("t", "t", "x")).toDF("truth", "pa", "pb")
    val s = Analytics.mcnemarPaired(strong, col("truth"), col("pa"), col("pb"))
      .collect().head
    assert(s.getString(6) == "different")
    // no discordance: chi2 0 / same, not NULL
    val none = Seq(("t", "t", "t"), ("t", "x", "x")).toDF("truth", "pa", "pb")
    val z = Analytics.mcnemarPaired(none, col("truth"), col("pa"), col("pb"))
      .collect().head
    assert(z.getLong(5) == 0L && z.getString(6) == "same")
  }

  test("fleissKappa: hand-computed 3-rater cases including both degenerate edges") {
    // perfect within-item agreement across two categories: kappa = 1e6
    val perfect = Seq(("x", "x", "x"), ("y", "y", "y")).toDF("r1", "r2", "r3")
    val p = Analytics.fleissKappa(perfect, Seq(col("r1"), col("r2"), col("r3")))
      .collect().head
    assert((p.getLong(0), p.getLong(1), p.getLong(2)) == ((2L, 3L, 2L)))
    assert(p.getLong(3) == 1000000L && p.getLong(4) == 500000L
      && p.getLong(5) == 1000000L)
    // agreement exactly at chance: P_bar = P_e = 0.5 -> kappa 0
    val chance = Seq(("x", "x", "x"), ("x", "y", "z")).toDF("r1", "r2", "r3")
    val c = Analytics.fleissKappa(chance, Seq(col("r1"), col("r2"), col("r3")))
      .collect().head
    assert(c.getLong(3) == 500000L && c.getLong(4) == 500000L
      && c.getLong(5) == 0L)
    // single-category corpus: P_e = 1 denominator zero -> kappa 0 convention
    val degen = Seq(("x", "x", "x"), ("x", "x", "x")).toDF("r1", "r2", "r3")
    val d = Analytics.fleissKappa(degen, Seq(col("r1"), col("r2"), col("r3")))
      .collect().head
    assert(d.getLong(4) == 1000000L && d.getLong(5) == 0L)
  }

  test("cochranQ: hand-computed k=3 table, strong difference, degenerate denominator") {
    // C = (3,2,1), S = 6, sumC2 = 14 -> num = 3*14-36 = 6; R = (3,1,2,0),
    // sumR2 = 14 -> den = 18-14 = 4; Q = 2*6/4 = 3.0 < 5.991 -> same
    val t = Seq((true, true, true), (true, false, false),
      (true, true, false), (false, false, false)).toDF("a", "b", "c")
    val r = Analytics.cochranQ(t, Seq(col("a"), col("b"), col("c")), 5991L)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((4L, 3L, 2L, 1L)))
    assert(r.getLong(4) == 3000L && r.getString(5) == "same")
    // A always right, B/C always wrong: Q = 20 > 5.991 -> different
    val strong = (1 to 10).map(_ => (true, false, false)).toDF("a", "b", "c")
    val s = Analytics.cochranQ(strong, Seq(col("a"), col("b"), col("c")), 5991L)
      .collect().head
    assert(s.getLong(4) == 20000L && s.getString(5) == "different")
    // every item all-correct: den = 0 -> Q = 0 / same, not NULL
    val degen = (1 to 3).map(_ => (true, true, true)).toDF("a", "b", "c")
    val d = Analytics.cochranQ(degen, Seq(col("a"), col("b"), col("c")), 5991L)
      .collect().head
    assert(d.getLong(4) == 0L && d.getString(5) == "same")
  }

  test("benjaminiHochberg: step-up rejects every rank below k*, not just passing ones") {
    // rank 1 fails its own bar (80000 > 50000) but rank 3 passes; the
    // step-up rescues ranks 1..3, rejects rank 4
    val t = Seq(("a", 20000L), ("b", 24000L), ("c", 26000L), ("d", 900000L))
      .toDF("k", "p")
    val r = Analytics.benjaminiHochberg(t, "k", "p", alphaPpm = 50000L)
      .collect().map(x => x.getString(0) -> (x.getLong(2), x.getInt(5))).toMap
    assert(r == Map("a" -> (1L, 1), "b" -> (2L, 1), "c" -> (3L, 1),
      "d" -> (4L, 0)))
    // only the smallest p passes anywhere: k* = 1
    val t2 = Seq(("a", 10000L), ("b", 30000L), ("c", 200000L), ("d", 900000L))
      .toDF("k", "p")
    val r2 = Analytics.benjaminiHochberg(t2, "k", "p", alphaPpm = 50000L)
      .collect().map(x => x.getString(0) -> x.getInt(5)).toMap
    assert(r2 == Map("a" -> 1, "b" -> 0, "c" -> 0, "d" -> 0))
  }

  test("cupedAdjustment: y = x removes all variance and the adjusted diff is 0") {
    val df = Seq((0, 1L, 1L), (0, 3L, 3L), (1, 2L, 2L), (1, 4L, 4L))
      .toDF("arm", "x", "y")
    val r = Analytics.cupedAdjustment(df, col("arm"), col("x"), col("y"))
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 2L)))
    assert(r.getLong(2) == 1000000L, "theta = cov/var = 1")
    assert(r.getLong(3) == 0L, "adjusted difference vanishes when y = x")
    assert(r.getLong(4) == 1000000L, "covariate removes 100% of the variance")
  }

  test("mannWhitneyU: hand-computed midranks with a tie, separated samples, all-tied") {
    // A={1,2,3}, B={2,4,5}: midranks 1,2.5,4 -> R_A=7.5, 2U_A=3, U=1.5
    val t = Seq((false, 1L), (false, 2L), (false, 3L),
      (true, 2L), (true, 4L), (true, 5L)).toDF("b", "v")
    val r = Analytics.mannWhitneyU(t, col("b"), col("v")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 3L)))
    assert(r.getLong(3) == 166666L, "auc = 2U*1e6/(2*9)")
    // T=6, vpart=(216-6-6) DIV 30 = 6; D=-6; z2 = 3000*36/(9*6) = 2000
    assert(r.getLong(4) == 2000L && r.getString(5) == "same")
    // fully separated: A=1..10 < B=11..20 -> U_A=0, AUC=0, different
    val sep = ((1 to 10).map(v => (false, v.toLong))
      ++ (11 to 20).map(v => (true, v.toLong))).toDF("b", "v")
    val s = Analytics.mannWhitneyU(sep, col("b"), col("v")).collect().head
    assert(s.getLong(2) == 0L && s.getLong(3) == 0L)
    assert(s.getLong(4) == 14285L && s.getString(5) == "different")
    // every value tied: vpart = 0 -> z2 = 0 / same, U = n1*n2/2
    val tied = Seq((false, 5L), (false, 5L), (true, 5L), (true, 5L))
      .toDF("b", "v")
    val z = Analytics.mannWhitneyU(tied, col("b"), col("v")).collect().head
    assert(z.getLong(2) == 4L, "2U = n1*n2 at full tie")
    assert(z.getLong(3) == 500000L && z.getLong(4) == 0L
      && z.getString(5) == "same")
  }

  test("ansariBradleyScale: hand-computed tails-vs-middle, identical groups, all-tied") {
    // A={5,5,6,6} (middle), B={1,1,10,10} (tails): pooled N=8, doubled
    // midranks 3,7,11,15 → doubled AB scores min(m2, 18−m2) = 3,7,7,3.
    // A2=28, S1=40, SS=232 → num = 8·28−4·40 = 64, den = 16·(8·232−1600)
    // = 4096, z² = 7·64²/4096 = 7 → 7000 milli > 3841.5 → different
    val t = Seq(("a", 5L), ("a", 5L), ("a", 6L), ("a", 6L),
      ("b", 1L), ("b", 1L), ("b", 10L), ("b", 10L)).toDF("g", "v")
    val r = Analytics.ansariBradleyScale(t, col("g") === "b", col("v"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 4L, 28L)))
    assert(r.getLong(3) == 7000L && r.getString(4) == "different")
    // identical samples: statistic sits exactly at its null mean → 0/same
    val eq = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 1L), ("b", 2L), ("b", 3L)).toDF("g", "v")
    val e = Analytics.ansariBradleyScale(eq, col("g") === "b", col("v"))
      .collect().head
    assert(e.getLong(2) == 13L, "A2 = 3+7+3 over doubled scores 3,7,3")
    assert(e.getLong(3) == 0L && e.getString(4) == "same")
    // every value tied: score variance 0 → guarded 0/same
    val tied = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    val z = Analytics.ansariBradleyScale(tied, col("g") === "b", col("v"))
      .collect().head
    assert(z.getLong(3) == 0L && z.getString(4) == "same")
  }

  test("jonckheereTerpstra: hand-computed separated groups, ties, direction, degeneracy") {
    // three separated rising groups {1,2},{3,4},{5,6}: JT2 = 2·12 = 24,
    // E2 = (36−12)/2 = 12, A = 510−54 = 456, Var·D: VarNum = 456·120 =
    // 54720, D = 8640 → z² = 144·8640/(4·54720) = 5.684 → 'rising'
    val up = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (3L, 5L), (3L, 6L))
      .toDF("j", "v")
    val r = Analytics.jonckheereTerpstra(up, col("j"), col("v"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((6L, 3L, 24L)))
    assert(r.getLong(3) == 5684L && r.getString(4) == "rising")
    // reversed order flips the sign, same magnitude
    val down = Analytics.jonckheereTerpstra(up, -col("j"), col("v"))
      .collect().head
    assert(down.getLong(3) == 5684L && down.getString(4) == "falling")
    // two tiny separated groups: z² = 2.4 — perfectly ordered but NOT
    // significant (the classic small-sample honesty check)
    val tiny = Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L)).toDF("j", "v")
    val t = Analytics.jonckheereTerpstra(tiny, col("j"), col("v"))
      .collect().head
    assert(t.getLong(3) == 2400L && t.getString(4) == "none")
    // tie handling: g1={1,1}, g2={1,2} → JT2 = 2·2+2 = 6, Var = 1 → z² = 1
    val tied = Seq((1L, 1L), (1L, 1L), (2L, 1L), (2L, 2L)).toDF("j", "v")
    val z = Analytics.jonckheereTerpstra(tied, col("j"), col("v"))
      .collect().head
    assert(z.getLong(2) == 6L && z.getLong(3) == 1000L && z.getString(4) == "none")
    // all values tied: the three-term variance cancels to exactly 0
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("j", "v")
    val c = Analytics.jonckheereTerpstra(const, col("j"), col("v"))
      .collect().head
    assert(c.getLong(3) == 0L && c.getString(4) == "none")
  }

  test("brierDecomposition: perfect calibration, base-rate predictor, out-of-range drop") {
    // bins 250 (1 of 4 positive) and 750 (3 of 4 positive): perfectly
    // calibrated → reliability 0; BS = resolution-adjusted:
    // bs per row: bin 250 → 3·250² + 750² = 750000 over 4 → avg 187500
    //             bin 750 → 250² + 3·... symmetric → BS = 187500
    // base rate 4/8 → uncertainty 250000; resolution = Σ(e·N−n·E)²/(n·N³)
    // = 2·(2·8−4·4)²... e=1,n=4,N=8,E=4: (8−16)²/4 = 16; e=3: (24−16)²/4
    // = 16 → 32·1e6/512 = 62500; identity 187500 = 0 − 62500 + 250000 ✓
    val cal = Seq((250L, false), (250L, false), (250L, false), (250L, true),
      (750L, true), (750L, true), (750L, true), (750L, false))
      .toDF("p", "y")
    val r = Analytics.brierDecomposition(cal, col("p"), col("y"))
      .collect().head
    assert(r.getLong(0) == 8L)
    assert(r.getLong(1) == 187500L, s"brier ${r.getLong(1)}")
    assert(r.getLong(2) == 0L, "perfect calibration → zero reliability")
    assert(r.getLong(3) == 62500L && r.getLong(4) == 250000L)
    assert(r.getLong(5) == 0L, "identity holds exactly on divisible bins")
    // base-rate predictor (everyone 500, half positive): resolution 0,
    // reliability 0, BS = uncertainty = 250000
    val flat = Seq((500L, true), (500L, false)).toDF("p", "y")
    val f = Analytics.brierDecomposition(flat, col("p"), col("y"))
      .collect().head
    assert((f.getLong(1), f.getLong(2), f.getLong(3), f.getLong(4)) ==
      ((250000L, 0L, 0L, 250000L)))
    // out-of-range predictions drop entirely (counted nowhere)
    val oor = Seq((1500L, true), (500L, true), (500L, false), (-5L, false))
      .toDF("p", "y")
    assert(Analytics.brierDecomposition(oor, col("p"), col("y"))
      .collect().head.getLong(0) == 2L)
  }

  test("pageTrendTest: hand-computed perfect trend, cancelling blocks, dose-shift invariance") {
    // two blocks, k=3, both perfectly rising: r2 = 2,4,6 per block;
    // L2 = 2·(1·2+2·4+3·6) = 56, E = 2·4·6 = 48, Jpart = 3·14−36 = 6,
    // Q = 3·112 − 2·9·16 = 48 → z² = 8²·9·2/(6·48) = 4 → 4000 > 3841.5
    val up = Seq(("b1", 1L, 10L), ("b1", 2L, 20L), ("b1", 3L, 30L),
      ("b2", 1L, 5L), ("b2", 2L, 6L), ("b2", 3L, 7L)).toDF("b", "j", "v")
    val r = Analytics.pageTrendTest(up, "b", col("j"), col("v"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 3L, 56L)))
    assert(r.getLong(3) == 4000L && r.getString(4) == "rising")
    // dose-shift invariance: j → j + 1991 leaves num/den exactly alone
    val shifted = Analytics.pageTrendTest(
      up.withColumn("j", col("j") + 1991L), "b", col("j"), col("v"))
      .collect().head
    assert(shifted.getLong(3) == 4000L && shifted.getString(4) == "rising")
    // one rising + one falling block cancel: L2 = E → 0/'none'
    val mixed = Seq(("b1", 1L, 10L), ("b1", 2L, 20L), ("b1", 3L, 30L),
      ("b2", 1L, 30L), ("b2", 2L, 20L), ("b2", 3L, 10L)).toDF("b", "j", "v")
    val m = Analytics.pageTrendTest(mixed, "b", col("j"), col("v"))
      .collect().head
    assert(m.getLong(3) == 0L && m.getString(4) == "none")
    // descending blocks flip the sign → 'falling'
    val down = Seq(("b1", 1L, 30L), ("b1", 2L, 20L), ("b1", 3L, 10L),
      ("b2", 1L, 7L), ("b2", 2L, 6L), ("b2", 3L, 5L)).toDF("b", "j", "v")
    val d = Analytics.pageTrendTest(down, "b", col("j"), col("v"))
      .collect().head
    assert(d.getLong(3) == 4000L && d.getString(4) == "falling")
    // incomplete block dropped: b2 missing j=3 → only b1 contributes,
    // and a single 3-treatment block cannot reach the 5% bar
    val inc = Seq(("b1", 1L, 10L), ("b1", 2L, 20L), ("b1", 3L, 30L),
      ("b2", 1L, 5L), ("b2", 2L, 6L)).toDF("b", "j", "v")
    val i = Analytics.pageTrendTest(inc, "b", col("j"), col("v"))
      .collect().head
    assert(i.getLong(0) == 1L && i.getString(4) == "none")
    // all values tied within every block: Q = 0 → guarded 'none'
    val tied = Seq(("b1", 1L, 5L), ("b1", 2L, 5L), ("b1", 3L, 5L))
      .toDF("b", "j", "v")
    val z = Analytics.pageTrendTest(tied, "b", col("j"), col("v"))
      .collect().head
    assert(z.getLong(3) == 0L && z.getString(4) == "none")
  }

  test("kruskalWallisH: hand-computed 3-group H, strong separation, tie-degenerate, df>24") {
    // a={1,2} b={3,4} c={5,6}: H = 4.571...; df=2 crit 5991 -> same
    val t = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L), ("c", 5L),
      ("c", 6L)).toDF("g", "v")
    val r = Analytics.kruskalWallisH(t, col("g"), col("v")).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((6L, 3L)))
    assert(r.getLong(2) == 4571L && r.getString(3) == "same")
    // 5 per group, fully separated: H = 12.5 > 5.991 -> different
    val sep = ((1 to 5).map(v => ("a", v.toLong))
      ++ (101 to 105).map(v => ("b", v.toLong))
      ++ (201 to 205).map(v => ("c", v.toLong))).toDF("g", "v")
    val s = Analytics.kruskalWallisH(sep, col("g"), col("v")).collect().head
    assert(s.getLong(2) == 12500L && s.getString(3) == "different")
    // all values identical: tie term swallows the variance -> 0 / same
    val tied = Seq(("a", 7L), ("a", 7L), ("b", 7L), ("b", 7L)).toDF("g", "v")
    val z = Analytics.kruskalWallisH(tied, col("g"), col("v")).collect().head
    assert(z.getLong(2) == 0L && z.getString(3) == "same")
    // 26 groups: df 25 outside the frozen table -> 'untested'
    val many = (0 until 26).map(i => (s"g$i", i.toLong)).toDF("g", "v")
    val m = Analytics.kruskalWallisH(many, col("g"), col("v")).collect().head
    assert(m.getLong(1) == 26L && m.getString(3) == "untested")
  }

  test("wilcoxonSignedRank: hand-computed signed midranks, strong positive run, zero-only") {
    // d = {+2,-1,+3,-1,+2}: |d| midranks (1.5,1.5),(3.5,3.5),(5);
    // W+ = 12 -> W2+=24, D=18, Var48=648, z2 = 3000*324/648 = 1500
    val t = Seq((3L, 1L), (1L, 2L), (4L, 1L), (2L, 3L), (5L, 3L))
      .toDF("l", "r")
    val r = Analytics.wilcoxonSignedRank(t, col("l"), col("r")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 3L, 2L)))
    assert(r.getLong(3) == 24L)
    assert(r.getLong(4) == 1500L && r.getString(5) == "same")
    // 12 strictly positive distinct d: z2 = 9360 -> different
    val pos = (1 to 12).map(i => (100L + i, 100L)).toDF("l", "r")
    val p = Analytics.wilcoxonSignedRank(pos, col("l"), col("r"))
      .collect().head
    assert((p.getLong(1), p.getLong(2)) == ((12L, 0L)))
    assert(p.getLong(4) == 9360L && p.getString(5) == "different")
    // all-zero differences drop: explicit 0 / same, not NULL
    val zero = Seq((5L, 5L), (7L, 7L)).toDF("l", "r")
    val z = Analytics.wilcoxonSignedRank(zero, col("l"), col("r"))
      .collect().head
    assert(z.getLong(0) == 0L && z.getLong(4) == 0L
      && z.getString(5) == "same")
  }

  test("cramersV: perfect sparse 2x2 includes absent-cell mass; independent table reads 0") {
    // (a,x)*5, (b,y)*5: observed cells give chi2=5, the two ABSENT cells
    // carry (0-2.5)^2/2.5 = 2.5 each -> chi2 = N = 10, V^2 = 1
    val t = ((1 to 5).map(_ => ("a", "x")) ++ (1 to 5).map(_ => ("b", "y")))
      .toDF("u", "w")
    val r = Analytics.cramersV(t, "u", "w").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((10L, 2L, 2L)))
    assert(r.getLong(3) == 10000L, "chi2 = N for a perfect 2x2")
    assert(r.getLong(4) == 1000000L && r.getLong(5) == 1000000L)
    assert(r.getString(6) == "associated", "10 > 3.841 at df 1")
    // perfectly independent dense 2x2 (equal cells): chi2 = 0
    val ind = (for { u <- Seq("a", "b"); w <- Seq("x", "y"); _ <- 1 to 3 }
      yield (u, w)).toDF("u", "w")
    val i = Analytics.cramersV(ind, "u", "w").collect().head
    assert(i.getLong(3) == 0L && i.getLong(5) == 0L)
    assert(i.getString(6) == "independent")
  }

  test("friedmanTest: perfect concordance, a reversal, within-block ties, incomplete blocks drop") {
    // 3 blocks all ranking t1<t2<t3: chi2 = b(k-1) = 6 (> 5.991), W = 1
    val perfect = (for { b <- 1 to 3; (t, v) <- Seq(("t1", 1L), ("t2", 2L),
      ("t3", 3L)) } yield (s"b$b", t, v)).toDF("b", "t", "v")
    val p = Analytics.friedmanTest(perfect, "b", "t", col("v")).collect().head
    assert((p.getLong(0), p.getLong(1)) == ((3L, 3L)))
    assert(p.getLong(2) == 6000L && p.getLong(3) == 1000000L)
    assert(p.getString(4) == "different")
    // one block reverses: sumd2 = 8, den = 24 -> chi2 0.666, W = 8/72
    val mixed = (Seq(("b1", "t1", 1L), ("b1", "t2", 2L), ("b1", "t3", 3L),
      ("b2", "t1", 3L), ("b2", "t2", 2L), ("b2", "t3", 1L),
      ("b3", "t1", 1L), ("b3", "t2", 2L), ("b3", "t3", 3L)))
      .toDF("b", "t", "v")
    val m = Analytics.friedmanTest(mixed, "b", "t", col("v")).collect().head
    assert(m.getLong(2) == 666L && m.getLong(3) == 111111L)
    assert(m.getString(4) == "same")
    // an incomplete block (missing t3) must drop, leaving `perfect`
    val extra = perfect.union(Seq(("b4", "t1", 9L), ("b4", "t2", 1L))
      .toDF("b", "t", "v"))
    val e = Analytics.friedmanTest(extra, "b", "t", col("v")).collect().head
    assert(e.getLong(0) == 3L && e.getLong(2) == 6000L)
    // fully tied within every block: den = 0 -> explicit 0 / same
    val tied = (for { b <- 1 to 2; t <- Seq("t1", "t2", "t3") }
      yield (s"b$b", t, 5L)).toDF("b", "t", "v")
    val z = Analytics.friedmanTest(tied, "b", "t", col("v")).collect().head
    assert(z.getLong(2) == 0L && z.getLong(3) == 0L && z.getString(4) == "same")
  }

  test("dunnPosthoc: pooled-midrank pairwise z2, Chebyshev p, BH ordering") {
    // a={1,2}, b={3,4}: m2 = 3 vs 7, vd = 60 -> z2 = 2400 milli,
    // p = 1e9 DIV 2400 = 416666 > alpha -> not rejected
    val two = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val r = Analytics.dunnPosthoc(two, col("g"), col("v")).collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "a|b" && r.head.getLong(1) == 2400L)
    assert(r.head.getLong(2) == 416666L && r.head.getInt(6) == 0)
    // three groups: widest rank gap (a|c) ranks first; the tied pair
    // p-values order alphabetically (a|b before b|c)
    val three = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L),
      ("c", 100L), ("c", 200L)).toDF("g", "v")
    val r3 = Analytics.dunnPosthoc(three, col("g"), col("v")).collect()
    assert(r3.map(_.getString(0)).toSeq == Seq("a|c", "a|b", "b|c"))
    assert(r3.head.getLong(1) == 4571L)
    assert(r3.map(_.getLong(4)).toSet == Set(3L), "n_tests = 3 pairs")
  }

  test("cochranArmitageTrend: rising/falling/flat hand cases and degenerate single level") {
    // rates 1/10, 5/10, 9/10 over w = 0,1,2: num = 240, den = 135000,
    // z2 = 240^2*1000*29/135000 = 12373 -> rising
    def bin(w: Long, pos: Int, neg: Int) =
      Seq.fill(pos)((w, true)) ++ Seq.fill(neg)((w, false))
    val rising = (bin(0L, 1, 9) ++ bin(1L, 5, 5) ++ bin(2L, 9, 1))
      .toDF("w", "y")
    val r = Analytics.cochranArmitageTrend(rising, col("w"), col("y"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((30L, 15L, 3L)))
    assert(r.getLong(3) == 240L && r.getLong(4) == 12373L)
    assert(r.getString(5) == "rising")
    val falling = (bin(0L, 9, 1) ++ bin(1L, 5, 5) ++ bin(2L, 1, 9))
      .toDF("w", "y")
    val f = Analytics.cochranArmitageTrend(falling, col("w"), col("y"))
      .collect().head
    assert(f.getLong(3) == -240L && f.getString(5) == "falling")
    // flat rates: numerator exactly 0 -> 'none'
    val flat = (bin(0L, 5, 5) ++ bin(1L, 5, 5) ++ bin(2L, 5, 5)).toDF("w", "y")
    val z = Analytics.cochranArmitageTrend(flat, col("w"), col("y"))
      .collect().head
    assert(z.getLong(3) == 0L && z.getLong(4) == 0L && z.getString(5) == "none")
    // one score level: den = 0 -> explicit 'none', not NULL
    val one = bin(3L, 4, 4).toDF("w", "y")
    val o = Analytics.cochranArmitageTrend(one, col("w"), col("y"))
      .collect().head
    assert(o.getLong(4) == 0L && o.getString(5) == "none")
  }
}
