package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Curation}

class CurationSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("filterFunnel: sequential semantics — a rule only sees prior survivors") {
    val docs = Seq(
      (1L, "good doc", 100L, "en"),   // passes both
      (2L, "short", 10L, "en"),       // fails r1; r2 must NOT count it
      (3L, "good doc zh", 100L, "zh") // passes r1, fails r2
    ).toDF("doc_id", "text", "n_chars", "lang")
    val r = Curation.filterFunnel(docs, Seq(
      "len" -> (col("n_chars") >= 50),
      "lang" -> (col("lang") === "en")))
      .orderBy("stage").collect()
    assert(r.map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getLong(3),
      x.getLong(4))).toSeq ==
      Seq((1, "len", 3L, 1L, 2L), (2, "lang", 2L, 1L, 1L)))
  }

  test("filterFunnel: stage outputs chain (n_out(i) == n_in(i+1)) and are monotone") {
    val docs = spark.range(100).select(col("id").as("doc_id"),
      (col("id") % 7).as("a"), (col("id") % 3).as("b"))
    val rows = Curation.filterFunnel(docs, Seq(
      "r1" -> (col("a") =!= 0), "r2" -> (col("b") =!= 0),
      "r3" -> (col("doc_id") < 50))).orderBy("stage").collect()
    rows.sliding(2).foreach { case Array(p, n) =>
      assert(p.getLong(4) == n.getLong(2), "n_out must chain into next n_in")
    }
    rows.foreach { x =>
      assert(x.getLong(2) - x.getLong(3) == x.getLong(4), "n_in - dropped = n_out")
      assert(x.getLong(3) >= 0L)
    }
  }

  test("leakageSafeSplit: every group lands in exactly one split") {
    val docs = spark.range(500).select(col("id").as("doc_id"),
      concat(lit("dom"), col("id") % 37).as("source"), lit(10L).as("n_chars"))
    val manifest = Curation.leakageSafeSplit(docs, "source", "n_chars").collect()
    assert(manifest.map(_.getLong(1)).sum == 37L, "each group in exactly one split")
    assert(manifest.map(_.getLong(2)).sum == 500L)
    // group-level determinism: rerunning yields the identical manifest
    val again = Curation.leakageSafeSplit(docs, "source", "n_chars").collect()
    assert(manifest.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("robustOutlierReport: a planted giant batch is fenced, inliers keep their range") {
    val normal = spark.range(100).select(col("id").as("doc_id"),
      lit("a").as("source"), (lit(100L) + col("id") % 21).as("n_chars"))
    val giants = spark.range(5).select((col("id") + 1000L).as("doc_id"),
      lit("b").as("source"), lit(100000L).as("n_chars"))
    val r = Curation.robustOutlierReport(normal.union(giants), "n_chars", "source")
      .orderBy("source").collect()
    val a = r(0); val b = r(1)
    assert(a.getLong(1) == 100L && a.getLong(2) == 0L)
    assert(a.getLong(3) == 100L && a.getLong(4) == 120L)
    assert(b.getLong(1) == 5L && b.getLong(2) == 5L, "all giants are outliers")
    assert(b.isNullAt(3) && b.isNullAt(4), "no inliers retained in the giant batch")
  }

  test("standardizeByGroup: hand-computed z; singleton and constant groups yield NULL") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), // mean 20, std 10
      (4L, "solo", 7L),                               // n=1 → NULL z
      (5L, "flat", 5L), (6L, "flat", 5L)              // std 0 → NULL z
    ).toDF("doc_id", "source", "n_chars")
    val r = Curation.standardizeByGroup(df, "doc_id", "n_chars", "source")
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(3)) None else Some(x.getDouble(3))))
    assert(r.toSeq == Seq(
      (1L, Some(-1.0)), (2L, Some(0.0)), (3L, Some(1.0)),
      (4L, None), (5L, None), (6L, None)))
  }

  test("timeWeightedAvg: burst does not over-count; last reading excluded") {
    // u1 holds value 1.00 for 90s, then a 10s burst at 100.00, last excluded:
    // twa = (100*90s + 10000*10s) / 100s = 1090 cents
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.00, 1L),
      (2L, ts("2024-01-01 00:01:30"), 100.00, 1L),
      (3L, ts("2024-01-01 00:01:40"), 999.99, 1L)
    ).toDF("event_id", "ts", "value", "user_id")
    val r = Analytics.timeWeightedAvg(events, "user_id", "ts", "value", "event_id")
      .collect().head
    assert(r.getLong(1) == 2L)
    assert(r.getLong(2) == 100L * 1000000L)
    assert(r.getLong(3) == 1090L)
  }

  test("timeWeightedAvg: ties on ts are broken by id (zero-duration interval)") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 5.00, 1L),
      (2L, ts("2024-01-01 00:00:00"), 7.00, 1L), // tie: 0-duration after id 1
      (3L, ts("2024-01-01 00:00:10"), 9.00, 1L)
    ).toDF("event_id", "ts", "value", "user_id")
    val r = Analytics.timeWeightedAvg(events, "user_id", "ts", "value", "event_id")
      .collect().head
    // intervals: (id1→id2)=0s at 500c, (id2→id3)=10s at 700c → twa=700c
    assert(r.getLong(1) == 2L && r.getLong(3) == 700L)
  }

  test("fkConformance: orphans counted exactly, clean relations report zero") {
    import graft.operators.Integrity
    val parent = spark.range(10).select(col("id").as("k"))
    val clean = spark.range(20).select((col("id") % 10).as("k"))
    val dirty = spark.range(20).select(
      when(col("id") >= 17, col("id") + 100).otherwise(col("id") % 10).as("k"))
    val r = Integrity.fkConformance(Seq(
      ("clean", clean, parent), ("dirty", dirty, parent)))
      .orderBy("relation").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("clean", 20L, 0L), ("dirty", 20L, 3L)))
  }

  test("profileWide: per-column null and exact distinct counts in one frame") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None), (4L, Some("b")))
      .toDF("id", "tag")
    val r = Curation.profileWide(df).orderBy("col_name").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq(("id", 0L, 4L), ("tag", 1L, 2L)))
  }

  test("fkConformance: NULL child keys count as children but never as orphans") {
    import graft.operators.Integrity
    val parent = spark.range(5).select(col("id").as("k"))
    val child = Seq(Some(1L), Some(2L), None, Some(99L), None)
      .toDF("k")
    val r = Integrity.fkConformance(Seq(("rel", child, parent))).collect().head
    assert((r.getLong(1), r.getLong(2)) == ((5L, 1L)),
      "5 children, only the non-null unmatched key is an orphan")
  }

  test("filterFunnel: refuses input columns that collide with staging names") {
    val df = spark.range(3).select(col("id"), lit(true).as("_r0"))
    val e = intercept[IllegalArgumentException] {
      Curation.filterFunnel(df, Seq("r" -> (col("id") > 0)))
    }
    assert(e.getMessage.contains("_r0"))
  }

  test("timeWeightedAvg: all-ties user (zero active time) is dropped, not NULL") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 5.0, 1L),
      (2L, ts("2024-01-01 00:00:00"), 7.0, 1L),
      (3L, ts("2024-01-01 00:00:00"), 9.0, 1L)
    ).toDF("event_id", "ts", "value", "user_id")
    assert(Analytics.timeWeightedAvg(events, "user_id", "ts", "value", "event_id")
      .count() == 0L)
  }

  test("timeWeightedAvg: single-event users emit nothing") {
    val events = Seq((1L, ts("2024-01-01 00:00:00"), 5.00, 42L))
      .toDF("event_id", "ts", "value", "user_id")
    assert(Analytics.timeWeightedAvg(events, "user_id", "ts", "value", "event_id")
      .count() == 0L)
  }

  // supplies (a:5, b:5, c:10) — hand-computed waterlines:
  //   budget 12 → cap 4 (3·4 ≤ 12 < 3·5);  budget 16 → cap 6 (5+5+6 = 16);
  //   budget ≥ 20 → nothing capped, cap = max supply
  private val supplies = Seq(("a", 2L), ("a", 3L), ("b", 5L), ("c", 10L))
    .toDF("source", "n_tok")

  test("waterFillAllocation: cap below the smallest supply") {
    val r = Curation.waterFillAllocation(supplies, "source", "n_tok", 12L)
      .orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(("a", 5L, 4L, 4L), ("b", 5L, 4L, 4L), ("c", 10L, 4L, 4L)))
  }

  test("waterFillAllocation: cap between supplies saturates the small sources") {
    val r = Curation.waterFillAllocation(supplies, "source", "n_tok", 16L)
      .orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(("a", 5L, 5L, 6L), ("b", 5L, 5L, 6L), ("c", 10L, 6L, 6L)))
  }

  test("waterFillAllocation: budget covering the total supply caps nothing") {
    val r = Curation.waterFillAllocation(supplies, "source", "n_tok", 25L)
      .orderBy("source").collect()
      .map(x => (x.getString(0), x.getLong(2)))
    assert(r.toSeq == Seq(("a", 5L), ("b", 5L), ("c", 10L)))
  }

  test("waterFillAllocation: allocations never exceed the budget and fill it maximally") {
    for (budget <- Seq(0L, 3L, 7L, 11L, 14L, 19L, 20L, 100L)) {
      val rows = Curation.waterFillAllocation(supplies, "source", "n_tok", budget)
        .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3)))
      val used = rows.map(_._2).sum
      assert(used <= budget, s"budget $budget overspent: $used")
      val cap = rows.head._3
      if (budget < 20L) // below total supply the integer cap must be maximal
        assert(rows.map { case (t, _, c) => math.min(t, c + 1) }.sum > budget,
          s"budget $budget: cap $cap not maximal")
    }
  }

  test("percentileCalibration: ties share a percentile; single-row group is 0") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 20L), (4L, "a", 30L), (5L, "a", 40L),
      (6L, "b", 99L)
    ).toDF("id", "grp", "score")
    val out = Curation.percentileCalibration(df, "id", "grp", "score")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // group a (n=5): ranks 1,2,2,4,5 -> bps 0, 2500, 2500, 7500, 10000
    assert(out == Map(1L -> 0L, 2L -> 2500L, 3L -> 2500L, 4L -> 7500L,
      5L -> 10000L, 6L -> 0L))
  }

  test("temporalSplit: cutoff at the ranked day; overlap counts both-side users") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 5 distinct days; trainPct=60 → cutoff rank (60*5+99) DIV 100 = 3 →
    // day 3. u1 has events on both sides (shared); u2 train-only; u3 test-only
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-05 10:00:00")),
      (2L, ts("2024-01-02 10:00:00")), (3L, ts("2024-01-04 10:00:00")),
      (2L, ts("2024-01-03 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Curation.temporalSplit(df, "user_id", "ts", trainPct = 60)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("train") == ((3L, 2L, 1L))) // 3 events, users {1,2}, 1 shared
    assert(out("test") == ((2L, 2L, 1L)))  // 2 events, users {1,3}
  }

  test("boundedContribution: caps each user at the first maxPerUser by (ts, id)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1 emits 4 events (cap 2 → first two by time survive: a, b);
    // u2 emits 1; NULL user rows are excluded entirely
    val df = Seq(
      (Some(1L), ts("2024-01-01 10:00:00"), 1L, "a"),
      (Some(1L), ts("2024-01-01 11:00:00"), 2L, "b"),
      (Some(1L), ts("2024-01-01 12:00:00"), 3L, "a"),
      (Some(1L), ts("2024-01-01 13:00:00"), 4L, "c"),
      (Some(2L), ts("2024-01-01 10:00:00"), 5L, "a"),
      (None,     ts("2024-01-01 10:00:00"), 6L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Curation.boundedContribution(df, "user_id", "ts", "event_id",
        "event_type", maxPerUser = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") == ((3L, 2L, 1L))) // u1's 3rd 'a' clamped, u2's kept
    assert(out("b") == ((1L, 1L, 0L)))
    assert(out("c") == ((1L, 0L, 1L))) // entirely beyond u1's cap
  }

  test("medianImpute: fills with the group median, flags rows, all-NULL group stays NULL") {
    val df = Seq(
      (1L, "a", Some(10L)), (2L, "a", Some(20L)), (3L, "a", Some(30L)),
      (4L, "a", None),                       // → filled with 20
      (5L, "b", None)                        // group b has no observations
    ).toDF("id", "grp", "v")
    val out = Curation.medianImpute(df, "id", "grp", "v")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(2)) -1L else r.getLong(2)), r.getLong(3))).toMap
    assert(out(4L) == ((20L, 1L)))
    assert(out(5L) == ((-1L, 0L))) // stays NULL, not invented, not flagged
    assert(out(1L) == ((10L, 0L)))
  }

  test("mixtureDrift: shares are truncating ppm; delta vs the prior snapshot") {
    val df = Seq(
      (0L, "s1", 30L), (0L, "s2", 70L),
      (1L, "s1", 60L), (1L, "s2", 40L)
    ).toDF("snap", "source", "tok")
    val out = Curation.mixtureDrift(df, "source", col("snap"), col("tok"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(3), if (r.isNullAt(4)) Long.MinValue else r.getLong(4)))).toMap
    assert(out((0L, "s1")) == ((300000L, Long.MinValue))) // no prior snapshot
    assert(out((1L, "s1")) == ((600000L, 300000L)))
    assert(out((1L, "s2")) == ((400000L, -300000L)))
  }

  test("quantileParityAudit: per-group lower medians vs the global median") {
    // a: {10,20,30} → median 20; b: {40,50} → lower median 40;
    // global {10,20,30,40,50} → 30
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 40L), (5L, "b", 50L)).toDF("id", "grp", "s")
    val out = Curation.quantileParityAudit(df, "id", "grp", "s")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") == ((3L, 20L, 30L, -10L)))
    assert(out("b") == ((2L, 40L, 30L, 10L)))
  }

  test("kAnonymityAudit: class sizes vs k; NULL quasi-values form a class") {
    // classes: (en,s1)=3 rows, (fr,s1)=1, (NULL,s2)=2 → 3 classes
    val df = Seq(
      (Some("en"), "s1"), (Some("en"), "s1"), (Some("en"), "s1"),
      (Some("fr"), "s1"),
      (None, "s2"), (None, "s2")
    ).toDF("lang", "source")
    val out = Curation.kAnonymityAudit(df, Seq("lang", "source"), ks = Seq(2, 4))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(2) == ((3L, 1L, 1L, 1L))) // only (fr,s1) below 2
    assert(out(4) == ((3L, 3L, 6L, 1L))) // every class below 4 — all rows at risk
  }

  test("benfordAudit: digit from integer string; absent digits report zero") {
    import graft.operators.Integrity
    // amounts: 10,11,19 (d=1 ×3), 25 (d=2), 90,95,99,91 (d=9 ×4); 0 and
    // negative are excluded; digit 3..8 rows must still appear with n=0
    val df = Seq(10L, 11L, 19L, 25L, 90L, 95L, 99L, 91L, 0L, -7L).toDF("amt")
    val out = Integrity.benfordAudit(df, col("amt"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    assert(out.keySet == (1 to 9).toSet)
    assert(out(1) == ((3L, 375000L, 375000L - 301029L)))
    assert(out(2)._1 == 1L)
    assert(out(9) == ((4L, 500000L, 500000L - 45757L)))
    assert(out(3) == ((0L, 0L, -124938L))) // spine row, full negative deviation
  }

  test("cellSuppression: small cells merge into the bucket; per-dim totals preserved") {
    val sp = SparkTestSession.spark
    import sp.implicits._
    val df = (Seq.fill(12)("A") ++ Seq.fill(3)("B") ++ Seq.fill(4)("C"))
      .map(g => (g, "seg1")).toDF("grp", "seg")
    val r = graft.operators.Curation.cellSuppression(df, "grp", "seg", 10L)
      .collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(r == Map("A" -> 12L, "(suppressed)" -> 7L))
    assert(r.values.sum == 19L) // conservation: nothing deleted
  }

  test("temperatureMixtureWeights: exact isqrt at the perfect-square boundary") {
    val sp = SparkTestSession.spark
    import sp.implicits._
    // counts 15/16/17 straddle the square 16: isqrt = 3/4/4 — an off-by-one
    // in the IEEE-sqrt correction would flip one of the edge groups
    val df = Seq(("a", 16L), ("b", 15L), ("c", 17L)).toDF("grp", "w")
    val out = graft.operators.Curation
      .temperatureMixtureWeights(df, "grp", col("w"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // totals: 48 tokens, 11 sqrt units
    assert(out("a") == ((16L, 333333L, 4000000L / 11, 4000000L / 11 * 1000 / 333333)))
    assert(out("b") == ((15L, 312500L, 3000000L / 11, 3000000L / 11 * 1000 / 312500)))
    assert(out("c") == ((17L, 354166L, 4000000L / 11, 4000000L / 11 * 1000 / 354166)))
    // the isqrt step function is visible at this granularity: b (15 tokens,
    // isqrt 3) lands below the 16/17 groups' shared sqrt unit of 4
    assert(out("b")._4 < 1000L && out("a")._4 > 1000L)
  }

  test("temperatureMixtureWeights: a sub-ppm group reports boost 0, not NULL") {
    val sp = SparkTestSession.spark
    import sp.implicits._
    // group b holds < 1 ppm of total tokens: natural_ppm floors to 0 and
    // the boost ratio is undefined — the guard reports 0 (r9 ADVICE fix)
    val df = Seq(("a", 3000000L), ("b", 1L)).toDF("grp", "w")
    val out = graft.operators.Curation
      .temperatureMixtureWeights(df, "grp", col("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(out("b")._1 == 0L && out("b")._2 == 0L)
    assert(out("a")._2 > 0L)
  }

  test("paddingWasteByBucket: doubling boundaries are inclusive; out-of-range drops") {
    val sp = SparkTestSession.spark
    import sp.implicits._
    // 16 stays in the 16-bucket (inclusive), 17 spills to 32; 0 and 200 drop
    val df = Seq(10L, 16L, 17L, 33L, 100L, 0L, 200L).toDF("len")
    val out = graft.operators.Curation
      .paddingWasteByBucket(df, col("len"), minBucket = 16, maxBucket = 128)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(
      16L -> ((2L, 26L, 32L, 187500L)),
      32L -> ((1L, 17L, 32L, 468750L)),
      64L -> ((1L, 33L, 64L, 484375L)),
      128L -> ((1L, 100L, 128L, 218750L))))
  }

  test("importanceWeightEss: matched source 1e6, concentrated source collapses, uncovered mass reported") {
    // source mirrors the target distribution exactly → ESS = source size
    val matched = Seq((0L, true), (1L, true), (0L, false), (1L, false))
      .toDF("s", "src")
    val m = Curation.importanceWeightEss(matched, col("s"), col("src"))
      .collect().head
    assert((m.getLong(0), m.getLong(1), m.getLong(3), m.getLong(4)) ==
      ((2L, 4L, 0L, 1000000L)))
    // source covers stratum 0 only while the target is 50/50: half the
    // target mass is unreachable; over the covered half the source IS the
    // target → ESS = 1e6·covt²/(n_src·Σt²/n) = 1e6·4/(2·(4/2)) = 1e6
    val conc = Seq((0L, true), (0L, true), (0L, false), (0L, false),
      (1L, false), (1L, false), (1L, false), (1L, false))
      .toDF("s", "src")
    val c = Curation.importanceWeightEss(conc, col("s"), col("src"))
      .collect().head
    assert(c.getLong(2) == 1L && c.getLong(3) == 500000L)
    assert(c.getLong(4) == 1000000L, "covered-mass ESS is perfect here")
    // skewed coverage: source 3:1 where target is 1:1 → weights 2/3 and 2
    // per row... ESS = covt²·1e6/(nsrc·(t0²/n0 + t1²/n1))
    //             = 64e6/(4·(16/3 + 16)) = 64e6/(4·21) = 761904 (floored
    //             per stratum: 16/3 → 5, so 64e6/(4·21) with term 5+16=21)
    val skew = Seq.fill(3)((0L, true)) ++ Seq((1L, true)) ++
      Seq.fill(5)((0L, false)) ++ Seq.fill(7)((1L, false))
    val k = Curation.importanceWeightEss(skew.toDF("s", "src"),
      col("s"), col("src")).collect().head
    // strata: s0 n=3 t=8, s1 n=1 t=8; term = 64/3→21 + 64/1=64 → 85;
    // ess = 16²·1e6/(4·85) = 752941
    assert((k.getLong(0), k.getLong(1), k.getLong(4)) ==
      ((4L, 16L, 752941L)))
  }

  test("batchPaddingStrategies: sorted batching eliminates mixed-length padding") {
    // lengths 1,100,1,100 at B=2: sorted batches {1,1},{100,100} → zero
    // waste; any order mixing the lengths pads a 1 up to 100
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "x")
      .withColumn("len", when(col("doc_id") % 2 === 0, 100L).otherwise(1L))
    val r = Curation.batchPaddingStrategies(df, "doc_id", col("len"), 2)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))).toMap
    assert(r("sorted") == ((2L, 202L, 202L, 0L)))
    assert(r("hash")._1 == 2L && r("hash")._2 == 202L)
    assert(r("hash")._3 >= r("sorted")._3,
      "sorted batching never pads more than the shuffled order")
    // trailing partial batch pads at its ACTUAL size (5 docs, B=2 → the
    // last batch holds 1 doc and contributes exactly its own length)
    val odd = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 10L))
      .toDF("doc_id", "len")
    val o = Curation.batchPaddingStrategies(odd, "doc_id", col("len"), 2)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(3)))
    assert(o.forall(t => t._2 == 3L && t._3 == 50L),
      "equal lengths → zero waste and 3 batches under both orders")
  }

  test("groupKFold: groups are atomic across folds; shares sum to ~1e6; nulls travel together") {
    val df = (1 to 100).map(i => (s"g${i % 10}", i.toLong)).toDF("g", "sz")
    val r = Curation.groupKFold(df, "g", "sz", k = 3).collect()
    assert(r.map(_.getLong(2)).sum == 100L, "every doc lands in exactly one fold")
    assert(r.map(_.getLong(1)).sum == 10L, "every group lands in exactly one fold")
    // atomicity: re-deriving the fold per group gives one fold per group
    val folds = df.withColumn("f",
        graft.operators.PortableHash.hash60(col("g")) % 3)
      .groupBy("g").agg(countDistinct(col("f")).as("nf"))
      .collect().map(_.getLong(1))
    assert(folds.forall(_ == 1L))
    val shares = r.map(_.getLong(4)).sum
    assert(shares >= 999998L && shares <= 1000000L, s"ppm shares sum $shares")
    // null groups coalesce into ONE pseudo-group
    val withNull = df.union(Seq((null.asInstanceOf[String], 1L),
      (null.asInstanceOf[String], 2L)).toDF("g", "sz"))
    val rn = Curation.groupKFold(withNull, "g", "sz", k = 3).collect()
    assert(rn.map(_.getLong(1)).sum == 11L, "nulls form exactly one extra group")
  }

  test("tClosenessAudit: exact EMD — matching class 0, degenerate class known value") {
    // global sensitive distribution: values 0 and 1 at 50/50 (8 rows).
    // class 'a' mirrors it exactly → EMD 0; class 'b' is all-zeros →
    // cumulative gaps |P−Q| at the two values are 1/2 and 0, so
    // EMD = (1/2 + 0)/(m−1) = 1/2 → 500000 ppm
    val df = Seq(
      ("a", 0L), ("a", 0L), ("a", 1L), ("a", 1L),
      ("b", 0L), ("b", 0L), ("b", 0L), ("b", 0L),
      ("c", 1L), ("c", 1L), ("c", 1L), ("c", 1L))
      .toDF("q", "s")
    val r = Curation.tClosenessAudit(df, Seq("q"), "s",
        tsPpm = Seq(400000L, 600000L))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSeq
    // global: 6 zeros, 6 ones. class a matches (EMD 0); classes b and c
    // are degenerate single-value → EMD 500000 each
    assert(r == Seq(
      (400000L, 3L, 2L, 8L, 500000L),
      (600000L, 3L, 0L, 0L, 500000L)))
  }

  test("tClosenessAudit: single sensitive value reports zero EMD everywhere") {
    val df = Seq(("a", 7L), ("a", 7L), ("b", 7L)).toDF("q", "s")
    val r = Curation.tClosenessAudit(df, Seq("q"), "s", tsPpm = Seq(0L))
      .collect().map(x => (x.getLong(2), x.getLong(4))).toSeq
    assert(r == Seq((0L, 0L)), "m = 1 ⇒ nothing to leak, EMD 0")
  }

  test("qualityGatedCuration: a monotone classifier decides τ* and the funnel chains") {
    // bins 0..3, positive rate rising 0% → 0% → 100% → 100% with 50 rows
    // per bin: bins 2,3 are enriched and BH-rejected, bins 0,1 depleted →
    // τ* = 2; the trend is unambiguous ('rising')
    val df = spark.range(200).select(col("id"),
      (col("id") % 4).as("w"),
      (col("id") % 4 >= 2).as("y"),
      (col("id") % 5 =!= 0).as("f"))
    val r = Curation.qualityGatedCuration(df, col("w"), col("y"), col("f"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getString(4)))
    assert(r.forall(_._5 == "rising"))
    assert(r.forall(_._4 == 2L), s"tau should be 2, got ${r.head._4}")
    assert(r(0) == (("s1_labeled", 200L, 200L, 2L, "rising")))
    assert(r(1) == (("s2_score_gate", 200L, 100L, 2L, "rising")))
    // stage 3: of the 100 gated rows (w ∈ {2,3}), those with id % 5 == 0
    // drop — ids ≡ 2,3 mod 4 and ≡ 0 mod 5: 10 of each residue class per
    // lcm(4,5)=20 block → 200/20 = 10 blocks × 2 drops = 20
    assert(r(2) == (("s3_final", 100L, 80L, 2L, "rising")))
    // funnel chains: n_out(i) == n_in(i+1)
    assert(r(0)._3 == r(1)._2 && r(1)._3 == r(2)._2)
  }

  test("qualityGatedCuration: a classifier that fails its trend gate is NOT applied") {
    // positive independent of the bin (flat 50%) → trend 'none' → gate
    // disabled: tau_bin = −1 and the score-gate stage passes everything
    val df = spark.range(400).select(col("id"),
      (col("id") % 4).as("w"),
      (col("id") % 2 === 0).as("y"),
      lit(true).as("f"))
    val r = Curation.qualityGatedCuration(df, col("w"), col("y"), col("f"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getString(4)))
    assert(r.forall(_._4 == -1L), s"gate must disable, got tau ${r.head._4}")
    assert(r(1) == (("s2_score_gate", 400L, 400L, -1L, r(1)._5)))
    assert(r(1)._5 != "rising")
  }

  test("qualityGatedCuration: null score bins and labels are excluded at s1 only") {
    val df = spark.range(100).select(col("id"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id") % 4).as("w"),
      when(col("id") % 10 === 1, lit(null))
        .otherwise(col("id") % 4 >= 2).as("y"),
      lit(true).as("f"))
    val r = Curation.qualityGatedCuration(df, col("w"), col("y"), col("f"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r(0)._2 == 100L, "stage 1 sees every input row")
    assert(r(0)._3 == 80L, "20 rows lack a bin or a label")
  }
}
