package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Skew}

class AsOfSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof join: latest right row at or before left ts; nulls when none") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "L1"), (1L, ts("2024-01-01 09:00:00"), "L0"),
      (2L, ts("2024-01-01 10:00:00"), "L2"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, ts("2024-01-01 09:30:00"), 7.0), (1L, ts("2024-01-01 11:00:00"), 9.0))
      .toDF("k", "t", "rv")
    val out = AsOf.asofJoin(left, right, "k", "t", Seq("rv"))
      .collect().map(r => (r.getString(2), Option(r.get(3)))).toMap
    assert(out("L1") == Some(7.0)) // 09:30 row is the latest <= 10:00
    assert(out("L0") == None) // no right row at or before 09:00
    assert(out("L2") == None) // no right rows for key 2
  }

  test("asof join: a matched right row with a NULL value yields null, not a stale value") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "L")).toDF("k", "t", "lv")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), Some(7.0)),
      (1L, ts("2024-01-01 11:00:00"), None)) // later matched row has null value
      .toDF("k", "t", "rv")
    val out = AsOf.asofJoin(left, right, "k", "t", Seq("rv")).collect().head
    assert(out.isNullAt(3), "must carry the matched row's null, not resurrect 7.0")
  }

  test("asof join: right row at exactly the left ts is matched (>= semantics)") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "L")).toDF("k", "t", "lv")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 5.0)).toDF("k", "t", "rv")
    val out = AsOf.asofJoin(left, right, "k", "t", Seq("rv")).collect().head
    assert(out.getDouble(3) == 5.0)
  }
}

class SkewSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join equals plain join; identical hot-key rows spread over salts") {
    val large = (0 until 1000).map(_ => (42L, "same-payload")) // one hot key, identical rows
      .toDF("k", "payload")
    val small = Seq((42L, "dim")).toDF("k", "name")
    val salted = Skew.saltedJoin(large, small, "k", salts = 8)
    assert(salted.count() == 1000)
    assert(salted.columns.toSet == Set("k", "payload", "name"))
    // the salt itself must distribute identical rows across buckets
    val nSalts = large
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(nSalts > 1, "identical rows must not all share one salt")
  }

  test("keySkewReport: hot key ranked first with exact integer skew ratio") {
    // key 1: 60 rows, keys 2..5: 10 each → total 100, n_keys 5, mean 20
    val rows = (1 to 60).map(_ => 1L) ++ (2L to 5L).flatMap(k => Seq.fill(10)(k))
    val df = rows.map((_, "x")).toDF("k", "v")
    val out = Skew.keySkewReport(df, "k", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // skew_scaled = n * 5 * 1000 / 100 → hot key 3000, others 500
    assert(out.head == ((1L, 60L, 3000L)))
    assert(out.length == 3 && out(1) == ((2L, 10L, 500L)))
  }

  test("skewAwarePartitionPlan: snake placement pairs heavy with light") {
    // counts desc: a=40, b=30, c=20, d=10; P=2 → ranks 0,1,2,3; band 0
    // ascends (a→p0, b→p1), band 1 REVERSES (c→p1, d→p0):
    // p0 = {a,d} load 50, p1 = {b,c} load 50 — perfectly balanced, where
    // plain round-robin would give {a,c}=60 vs {b,d}=40
    val rows = Seq.fill(40)("a") ++ Seq.fill(30)("b") ++
      Seq.fill(20)("c") ++ Seq.fill(10)("d")
    val out = Skew.skewAwarePartitionPlan(rows.toDF("k"), "k", nParts = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(0L) == ((2L, 50L, 0L)))
    assert(out(1L) == ((2L, 50L, 0L)))
  }

  test("skewAwarePartitionPlan: imbalance ppm is signed and exact") {
    // a=3, b=1 into P=2: p0={a}=3, p1={b}=1, ideal 2 →
    // p0: 3·2·1e6/4 − 1e6 = +500000; p1: 1·2·1e6/4 − 1e6 = −500000
    val df = (Seq.fill(3)("a") ++ Seq("b")).toDF("k")
    val out = Skew.skewAwarePartitionPlan(df, "k", nParts = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(0L -> 500000L, 1L -> -500000L))
  }
}
