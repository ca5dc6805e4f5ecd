package graft

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDateTime
import Profiler.ColumnInfo

class RuleSqlGeneratorSpec extends AnyFunSuite {
  private val clock = LocalDateTime.of(2024, 3, 15, 10, 30, 0)
  private val incidentCols = Seq(
    ColumnInfo("Service", "string", "service"),
    ColumnInfo("City", "string", "city"),
    ColumnInfo("Date", "date", "date"),
    ColumnInfo("Severity", "string", "other"))

  test("README flagship question → full template") {
    val sql = RuleSqlGenerator.generate(
      "Which services were affected by incidents in Mumbai last month?", incidentCols, clock)
    // 'services' != column 'Service' → no group-by fires (exact word match only)
    assert(sql ==
      """SELECT * FROM df WHERE "City" = 'Mumbai' AND "Date" >= '2024-02-01T00:00:00' AND "Date" <= '2024-02-29T23:59:59'""")
  }

  test("which <exact column> fires group-by with COUNT(*)") {
    val sql = RuleSqlGenerator.generate("Which service is worst?",
      incidentCols.map(c => if (c.name == "Service") c.copy(name = "service") else c), clock)
    assert(sql == """SELECT "service", COUNT(*) as count FROM df GROUP BY "service"""")
  }

  test("column match is case-insensitive and preserves actual casing") {
    val sql = RuleSqlGenerator.generate("which SERVICE?", incidentCols, clock)
    assert(sql == """SELECT "Service", COUNT(*) as count FROM df GROUP BY "Service"""")
  }

  test("city capitalization and first-match-wins") {
    val sql = RuleSqlGenerator.generate("incidents in HYDERABAD or pune", incidentCols, clock)
    // list order wins, not question order: hyderabad precedes pune in the list
    assert(sql.contains(""""City" = 'Hyderabad'"""))
    assert(!sql.contains("Pune"))
  }

  test("no city column → no city filter even when a city is mentioned") {
    val cols = incidentCols.filterNot(_.semanticType == "city")
    val sql = RuleSqlGenerator.generate("delhi incidents", cols, clock)
    assert(sql == "SELECT * FROM df")
  }

  test("last-month boundary math (python datetime parity incl. leap year)") {
    // clock = 2024-03-15 → last month is February 2024 (leap): 02-01 .. 02-29 23:59:59
    val (s, e) = RuleSqlGenerator.lastMonthRange(clock)
    assert(s == LocalDateTime.of(2024, 2, 1, 0, 0, 0))
    assert(e == LocalDateTime.of(2024, 2, 29, 23, 59, 59))
    // january rollover: 2024-01-10 → December 2023
    val (s2, e2) = RuleSqlGenerator.lastMonthRange(LocalDateTime.of(2024, 1, 10, 5, 0))
    assert(s2 == LocalDateTime.of(2023, 12, 1, 0, 0, 0))
    assert(e2 == LocalDateTime.of(2023, 12, 31, 23, 59, 59))
  }

  test("date filter only fires with both a date column and the phrase 'last month'") {
    assert(!RuleSqlGenerator.generate("incidents last week", incidentCols, clock).contains("Date"))
    val noDate = incidentCols.filterNot(_.semanticType == "date")
    assert(RuleSqlGenerator.generate("last month", noDate, clock) == "SELECT * FROM df")
  }

  test("conjunctive AND of city + date clauses") {
    val sql = RuleSqlGenerator.generate("chennai last month", incidentCols, clock)
    assert(sql ==
      """SELECT * FROM df WHERE "City" = 'Chennai' AND "Date" >= '2024-02-01T00:00:00' AND "Date" <= '2024-02-29T23:59:59'""")
  }
}
