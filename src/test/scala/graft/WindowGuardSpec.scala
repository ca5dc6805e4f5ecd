package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/**
 * Source-level guard: an UNPARTITIONED `Window.orderBy` concentrates every
 * input row on one task, and the library's benign ones (value-collapsed
 * frames, calendar spines, per-partition offset rows) would bury a new
 * accidental row-sized one in identical WindowExec log warnings. So the
 * bare spelling is banned from src/main: every global window must go
 * through [[graft.operators.BoundedGlobalWindow]], whose call is the
 * caller's greppable assertion that the input frame is bounded by a domain
 * constant. This spec turns a new bare site into a test failure instead of
 * one more warning in the wall.
 */
class WindowGuardSpec extends AnyFunSuite {

  private def mainSources: Seq[Path] = {
    val root = Paths.get("src/main/scala")
    assert(Files.isDirectory(root), s"expected to run from the repo root, missing $root")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq
  }

  test("no bare unpartitioned Window.orderBy outside BoundedGlobalWindow") {
    val offenders = mainSources
      .filterNot(_.getFileName.toString == "BoundedGlobalWindow.scala")
      .flatMap { p =>
        Files.readAllLines(p).asScala.zipWithIndex.collect {
          // Window.partitionBy(...).orderBy(...) is fine; the banned form is
          // the receiver being the Window OBJECT itself.
          case (line, i) if line.contains("Window.orderBy") &&
            !line.contains("BoundedGlobalWindow.orderBy") => s"$p:${i + 1}: ${line.trim}"
        }
      }
    assert(offenders.isEmpty,
      "bare global windows found — route through BoundedGlobalWindow.orderBy " +
        "(and document the bounded-frame contract at the call site):\n" +
        offenders.mkString("\n"))
  }

  test("BoundedGlobalWindow is behaviorally identical to Window.orderBy") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("k", "v")
    val viaHelper = df.withColumn("rn",
      row_number().over(graft.operators.BoundedGlobalWindow.orderBy("k")))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(viaHelper.toSeq == Seq((1L, 1), (2L, 2), (3L, 3)))
  }

  // ---- runtime enforcement of the BoundedGlobalWindow contract ------------
  // The source ban above makes call sites greppable but cannot see the frame
  // a call site actually routes through the helper. This walks the OPTIMIZED
  // plan of every declared query: an unpartitioned Window is legal only if
  // every path from it to a leaf passes a row-collapsing node (Aggregate —
  // value collapses, per-partition offset rows, calendar-spine seeds — or a
  // GlobalLimit / literal relation). A corpus-sized frame routed through the
  // helper reaches a file scan with no collapse in between and fails here.

  private def ridesCollapsedFrame(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    p match {
      case _: Aggregate => true
      case _: GlobalLimit => true
      case _: LocalRelation => true // bounded literal spine
      case _: OneRowRelation => true
      case r: Range => r.numElements.isValidInt // a literal-bounded spine
      // a cached frame substituted by plan-match hides its collapse behind
      // a leaf — look through to the cached PHYSICAL plan for one (this is
      // what flags x204/x506/x600 spuriously when an earlier query in the
      // walk has warmed the shared staging cache)
      case imr: InMemoryRelation =>
        val cp = imr.cachedPlan.toString
        cp.contains("Aggregate") || cp.contains("Limit") ||
          cp.contains("TakeOrdered")
      case l if l.children.isEmpty => false // file scan / checkpointed RDD
      case other => other.children.forall(ridesCollapsedFrame)
    }
  }

  /** Queries whose global-window input IS collapsed but not provably so
    * from the plan — each with the reason the bound holds anyway. */
  private val exemptQueries: Map[String, String] = Map(
    "x128_streaming_histogram" ->
      ("re-reads its own foreachBatch sink parquet, which holds one row " +
        "per histogram BUCKET (|buckets|-bounded by construction)"))

  private def rowSizedGlobalWindows(
      df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    df.queryExecution.optimizedPlan.collect {
      case w: Window if w.partitionSpec.isEmpty
          && !ridesCollapsedFrame(w.child) =>
        w.simpleString(2)
    }
  }

  // ---- driver-materialization guard ----------------------------------------
  // The library's standing claim (README "Scale design") is that the only
  // driver materializations are bounded, documented sites. This pins the
  // census: a NEW `.collect()` fails here until its bound is documented at
  // the call site and the allowlist below names it with the reason.

  private val collectAllowlist: Map[String, (Int, String)] = Map(
    "Profiler.scala" -> (1, "limit(5) head sample — reference semantics"),
    "Preference.scala" -> (1,
      "Bradley-Terry win matrix — |items|² catalogue-bounded, guarded at 2e6"),
    "Analytics.scala" -> (1,
      "channel vocabulary (distinct event types) — bounded domain, never rows"),
    "SkippingIndex.scala" -> (1,
      "file manifest paths — bounded by file count, the operator's output"))

  test("every .collect() in src/main is an allowlisted documented bounded site") {
    val counts = mainSources.flatMap { p =>
      val n = Files.readAllLines(p).asScala.count { line =>
        val t = line.trim
        t.contains(".collect()") && !t.startsWith("*") && !t.startsWith("//")
      }
      if (n > 0) Some(p.getFileName.toString -> n) else None
    }.toMap
    val offenders = counts.collect {
      case (f, n) if collectAllowlist.get(f).forall(_._1 != n) =>
        s"$f has $n .collect() call(s), allowlist says ${collectAllowlist.get(f).map(_._1).getOrElse(0)}"
    }
    assert(offenders.isEmpty,
      "undocumented driver materialization — document the bound at the call " +
        "site and extend the allowlist:\n  " + offenders.mkString("\n  "))
    // the corpus-risk spellings with no bounded variant are banned outright
    val banned = mainSources.flatMap { p =>
      Files.readAllLines(p).asScala.zipWithIndex.collect {
        case (line, i) if line.contains("collectAsList")
            || line.contains("toLocalIterator") => s"$p:${i + 1}"
      }
    }
    assert(banned.isEmpty, s"banned driver-materialization spellings: $banned")
  }

  test("the checker itself flags a row-sized frame routed through BoundedGlobalWindow") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    // a raw parquet scan through the helper = exactly the misuse the
    // convention exists to prevent — the walker must refuse it
    val bad = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("rn", row_number().over(
        graft.operators.BoundedGlobalWindow.orderBy("doc_id")))
    assert(rowSizedGlobalWindows(bad).nonEmpty,
      "the negative control must be detected, or this guard is vacuous")
    // and a post-aggregation frame through the helper must pass
    val ok = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        graft.operators.BoundedGlobalWindow.orderBy("source")))
    assert(rowSizedGlobalWindows(ok).isEmpty)
  }

  test("every unpartitioned window rides a collapsed frame; no query plans a CartesianProduct") {
    val spark = SparkTestSession.spark
    val sf = "/root/testdata/sf0.001"
    val windowOffenders = collection.mutable.ArrayBuffer.empty[String]
    val cartesianOffenders = collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
      val df = q(spark, sf)
      if (!exemptQueries.contains(name))
        windowOffenders ++= rowSizedGlobalWindows(df).map(w => s"$name: $w")
      // A CartesianProduct exec is an UNBROADCAST all-pairs join — the one
      // join shape with no scale story. Every intentional small-frame cross
      // in this library broadcasts (BroadcastNestedLoopJoin), which this
      // rule permits; a size misestimate or a lost broadcast hint that
      // degrades a cross to CartesianProduct fails the fleet here.
      if (df.queryExecution.executedPlan.toString.contains("CartesianProduct"))
        cartesianOffenders += name
    }
    assert(windowOffenders.isEmpty,
      "global windows over frames not provably collapsed (add the missing " +
        "aggregate/limit, or partition the window):\n  " +
        windowOffenders.mkString("\n  "))
    assert(cartesianOffenders.isEmpty,
      s"queries planning a CartesianProduct: $cartesianOffenders")
  }
}
