package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.CsvSource
import java.time.LocalDateTime

/** End-to-end over the reference-parity CSV fixtures (FIXTURES.md): CSV scan
  * with inference → profile → NL question → validated SQL → result. */
class CsvEngineSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def res(name: String): String =
    getClass.getResource(s"/$name").getPath

  test("incidents.csv: flagship README-style question end to end") {
    val df = CsvSource.read(spark, res("incidents.csv"))
    val cols = Profiler.profile(df)
    assert(cols.find(_.name == "City").get.semanticType == "city")
    assert(cols.find(_.name == "Date").get.semanticType == "date")
    val r = Engine.answer(spark, df, "Which service had incidents in mumbai last month?",
      cols, LocalDateTime.of(2024, 3, 5, 9, 0))
    val rows = r.result.collect().map(x => (x.getString(0), x.getLong(1))).toMap
    // Feb 2024 Mumbai rows: Checkout ×2, Search ×1 (Delhi/Pune/Nov excluded)
    assert(rows == Map("Checkout" -> 2L, "Search" -> 1L))
  }

  test("profiler_types.csv: one column per profiler branch") {
    val df = CsvSource.read(spark, res("profiler_types.csv"))
    // pin string handling regardless of Spark's date inference settings
    val p = Profiler.profile(df).map(c => c.name -> (c.tpe, c.semanticType)).toMap
    assert(p("city_name")._2 == "city")
    assert(p("product_type")._2 == "service")
    assert(p("created_at") == ("date", "date")) // keyword AND parsable content
    assert(p("datestr") == ("date", "date")) // content only
    assert(p("plainstr") == ("string", "other"))
    assert(p("intcol") == ("numeric", "date")) // epoch quirk
    assert(p("floatcol") == ("numeric", "date"))
  }

  test("dupes.csv: SELECT * collapses duplicates with counts sorted desc") {
    val df = CsvSource.read(spark, res("dupes.csv"))
    val r = Engine.answer(spark, df, "show everything",
      Profiler.profile(df), LocalDateTime.of(2024, 1, 1, 0, 0))
    val rows = r.result.collect().map(x => (x.getString(0), x.getString(1), x.getLong(2)))
    assert(rows.head == ("open", "a", 3L))
    assert(rows.toSet == Set(("open", "a", 3L), ("closed", "b", 2L), ("open", "c", 1L)))
  }

  test("quoting.csv: column names with spaces survive quoting + dialect normalization") {
    val df = CsvSource.read(spark, res("quoting.csv"))
    val cols = Profiler.profile(df)
    val r = Engine.answer(spark, df, "incidents in mumbai",
      cols, LocalDateTime.of(2024, 3, 5, 9, 0))
    assert(r.sql.contains("\"City Name\" = 'Mumbai'"))
    assert(r.result.count() == 2)
  }

  test("CSV sink: write + re-read round-trips values (RFC-4180 quoting)") {
    import spark.implicits._
    val df = Seq(("a,b", "say \"hi\"", 1.25), ("plain", "x", -3.5))
      .toDF("with_comma", "with_quote", "v")
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv_spec").toString
    CsvSource.write(df, s"$tmp/out")
    val back = CsvSource.read(spark, s"$tmp/out").orderBy(desc("v"))
    val rows = back.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("a,b", "say \"hi\"", 1.25), ("plain", "x", -3.5)))
  }
}
