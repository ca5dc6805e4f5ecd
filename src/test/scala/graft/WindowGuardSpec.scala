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
}
