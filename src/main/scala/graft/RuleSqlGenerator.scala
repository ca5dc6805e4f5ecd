package graft

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import scala.collection.mutable.ListBuffer

/**
 * Rule-based NL→SQL generator — port of `generate_sql_rule_based`
 * (`/root/reference/app/utils/sql_generator.py:42-78`) plus its helpers
 * `quote_identifier` (`:8-10`) and `get_last_month_range` (`:12-17`).
 *
 * The produced "plan" is, as in the reference, a SQL string over a single
 * table named `df`:
 * `SELECT {cols} FROM df [WHERE c1 AND c2] [GROUP BY g]` — no ORDER BY, no
 * LIMIT (the LIMIT guard is [[SqlValidator]]'s job, `sql_generator.py:124`).
 *
 * The clock is injected (reference calls `datetime.now()` at `:13`) so query
 * bodies stay reproducible for the verify/bench harness.
 */
object RuleSqlGenerator {

  /** Hard-coded city list, verbatim from `sql_generator.py:61`. */
  val Cities: Seq[String] =
    Seq("mumbai", "delhi", "bangalore", "chennai", "kolkata", "hyderabad", "pune", "ahmedabad")

  /** `quote_identifier` (`sql_generator.py:8-10`): double quotes. */
  def quoteIdentifier(name: String): String = "\"" + name + "\""

  // Python `datetime.isoformat()` with zero microseconds: 2026-07-01T00:00:00
  private val IsoFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")

  /** `get_last_month_range` (`sql_generator.py:12-17`). */
  def lastMonthRange(now: LocalDateTime): (LocalDateTime, LocalDateTime) = {
    val startOfThisMonth = now.withDayOfMonth(1).withHour(0).withMinute(0).withSecond(0).withNano(0)
    val startOfLastMonth = startOfThisMonth.minusDays(1).withDayOfMonth(1)
    val endOfLastMonth = startOfThisMonth.minusSeconds(1)
    (startOfLastMonth, endOfLastMonth)
  }

  /** `_find_semantic_column` (`sql_generator.py:19-23`): first match wins. */
  def findSemanticColumn(columnsInfo: Seq[Profiler.ColumnInfo], semanticType: String): Option[String] =
    columnsInfo.find(_.semanticType == semanticType).map(_.name)

  /** `generate_sql_rule_based` (`sql_generator.py:42-78`). */
  def generate(question: String, columnsInfo: Seq[Profiler.ColumnInfo], now: LocalDateTime): String = {
    val questionLower = question.toLowerCase
    var selectCols = "*"
    var groupBy: Option[String] = None
    val columns = columnsInfo.map(_.name).filter(_.nonEmpty)

    // "which X" → GROUP BY X with COUNT(*) (sql_generator.py:50-56)
    val whichMatch = "which (\\w+)".r.findFirstMatchIn(questionLower)
    whichMatch.foreach { m =>
      val col = m.group(1)
      columns.find(_.toLowerCase == col).foreach { actual =>
        groupBy = Some(quoteIdentifier(actual))
        selectCols = s"${quoteIdentifier(actual)}, COUNT(*) as count"
      }
    }

    val whereClauses = ListBuffer.empty[String]

    // City equality filter (sql_generator.py:59-65); python str.capitalize ==
    // Scala .capitalize here since the list is all-lowercase ASCII.
    findSemanticColumn(columnsInfo, "city").foreach { cityCol =>
      Cities.find(questionLower.contains).foreach { city =>
        whereClauses += s"${quoteIdentifier(cityCol)} = '${city.capitalize}'"
      }
    }

    // "last month" date-range filter (sql_generator.py:68-71)
    findSemanticColumn(columnsInfo, "date").foreach { dateCol =>
      if (questionLower.contains("last month")) {
        val (start, end) = lastMonthRange(now)
        whereClauses += s"${quoteIdentifier(dateCol)} >= '${IsoFmt.format(start)}' " +
          s"AND ${quoteIdentifier(dateCol)} <= '${IsoFmt.format(end)}'"
      }
    }

    // Template assembly (sql_generator.py:73-78)
    var sql = s"SELECT $selectCols FROM df"
    if (whereClauses.nonEmpty) sql += " WHERE " + whereClauses.mkString(" AND ")
    groupBy.foreach(g => sql += s" GROUP BY $g")
    sql
  }
}
