package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDateTime

/**
 * Query executor — Spark replacement for the reference's execution path
 * (`/root/reference/app/routes/query.py:42-57`): where the reference
 * registers a pandas frame into an embedded DuckDB connection and fetches the
 * whole result back, we register the DataFrame as a temp view named `df`
 * (`query.py:43`) and let Catalyst + whole-stage codegen run the SQL
 * distributed. The NL question path is generate → validate → execute →
 * duplicate-collapse, exactly the reference pipeline (`query.py:33-57`).
 */
object Engine {

  /** Mirrors `QueryResult` (`/root/reference/app/schemas/models.py:24-26`),
    * keeping the result distributed instead of `rows: List[Dict]`. */
  case class QueryResult(sql: String, result: DataFrame)

  /**
   * The generator emits double-quoted identifiers (`sql_generator.py:8-10`,
   * DuckDB dialect); Spark SQL wants backticks unless
   * `spark.sql.ansi.doubleQuotedIdentifiers` is on. The rewrite is
   * quote-aware: double-quoted spans inside single-quoted string literals
   * (reachable via the arbitrary-SQL path) are left untouched, including
   * doubled-'' escapes.
   */
  def toSparkSql(sql: String): String = {
    val out = new StringBuilder(sql.length)
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '\'' => // copy the single-quoted literal verbatim ('' = escape)
          out.append('\'')
          i += 1
          var done = false
          while (i < sql.length && !done) {
            val c = sql.charAt(i)
            out.append(c)
            i += 1
            if (c == '\'') {
              if (i < sql.length && sql.charAt(i) == '\'') { out.append('\''); i += 1 }
              else done = true
            }
          }
        case '"' => // identifier span → backticks ("" = escaped quote)
          val start = i
          i += 1
          val ident = new StringBuilder
          var closed = false
          while (i < sql.length && !closed) {
            val c = sql.charAt(i)
            if (c == '"') {
              // Doubled "" inside the span is an escaped literal " in the
              // identifier (SQL standard); emit it as-is in the backtick span
              // and double any backticks (Spark's own escape) so `a"b` and
              // `a\`b` both round-trip.
              if (i + 1 < sql.length && sql.charAt(i + 1) == '"') { ident.append('"'); i += 2 }
              else { closed = true; i += 1 }
            } else { ident.append(c); i += 1 }
          }
          if (!closed) out.append(sql.substring(start)) // unterminated: verbatim
          else out.append('`').append(ident.toString.replace("`", "``")).append('`')
        case c =>
          out.append(c)
          i += 1
      }
    }
    out.toString
  }

  /** Raised for the reference's HTTP-400 upload rejections
    * (`/root/reference/app/routes/upload.py:20-22`). */
  final class UploadException(msg: String) extends IllegalArgumentException(msg)

  /**
   * Composed ingest entry point — port of `POST /upload`
   * (`/root/reference/app/routes/upload.py:16-30`): extension gate (`.csv`
   * else the reference's 400 "Only CSV files allowed") → CSV read with
   * schema inference (`pd.read_csv`) → column profiling (`profile_csv`).
   * Read errors surface as the reference's catch-all 400
   * ("Error reading CSV: …", `upload.py:31-33`).
   */
  def load(spark: SparkSession, path: String): (DataFrame, Seq[Profiler.ColumnInfo]) = {
    if (!path.endsWith(".csv"))
      throw new UploadException("Only CSV files allowed")
    try {
      val df = graft.sources.CsvSource.read(spark, path)
      (df, Profiler.profile(df))
    } catch {
      case e: Exception => throw new UploadException(s"Error reading CSV: ${e.getMessage}")
    }
  }

  /** Register + execute one validated SELECT over the session table `df`
    * (`query.py:42-45`), then apply the duplicate collapse (`query.py:49-57`). */
  def execute(spark: SparkSession, df: DataFrame, validatedSql: String): DataFrame = {
    df.createOrReplaceTempView("df")
    collapseDuplicates(spark.sql(toSparkSql(validatedSql)))
  }

  /**
   * Duplicate-row collapse, port of `query.py:49-57`: if the result contains
   * any fully-duplicated row, group by ALL columns with a `count` and sort by
   * count descending; otherwise pass through.
   *
   * Scale notes: the pandas original does `duplicated().any()` plus a
   * groupby; here one hash aggregation computes the groups and a cheap
   * `filter(count>1).limit(1)` probe on it decides the branch — two jobs over
   * one shuffle, no driver materialization. Pandas `groupby` drops rows with
   * null group keys (`dropna=True` default); we replicate by dropping
   * fully-null-keyed rows in the collapse branch only.
   */
  def collapseDuplicates(res: DataFrame): DataFrame = {
    val cols = res.columns
    if (cols.isEmpty) return res
    // Temp name so the probe never collides with a user column named `count`
    // (pandas only errors on that collision when duplicates actually exist).
    val tmpCnt = "__graft_count"
    // The duplicate PROBE runs on the FULL frame: pandas `duplicated()`
    // treats NaN == NaN, and Spark's groupBy is likewise null-safe — a pair
    // of identical null-keyed rows must trigger the collapse branch.
    val fullGrouped = res.groupBy(cols.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as(tmpCnt))
    val hasDuplicates = fullGrouped.filter(col(tmpCnt) > 1).limit(1).count() > 0
    if (hasDuplicates) {
      // pandas parity: reset_index(name='count') raises if `count` exists
      require(!cols.contains("count"), "cannot insert count, already exists")
      // ...but the GROUPING itself drops null-keyed rows (groupby dropna=True)
      res.na.drop(cols.toIndexedSeq)
        .groupBy(cols.map(col).toIndexedSeq: _*)
        .agg(count(lit(1)).as("count"))
        .orderBy(desc("count"))
    } else res
  }

  /**
   * Full NL pipeline (rule-based path of `query.py:33-45`): profile-provided
   * columns → rule SQL → validator → execute. The AI path (`query.py:34`,
   * network LLM) is out of engine scope; its contract — "execute an arbitrary
   * validated SELECT" — is [[executeSql]].
   */
  def answer(spark: SparkSession, df: DataFrame, question: String,
             columnsInfo: Seq[Profiler.ColumnInfo], now: LocalDateTime): QueryResult = {
    val sql = RuleSqlGenerator.generate(question, columnsInfo, now)
    val validated = SqlValidator.validate(sql, columnsInfo.map(_.name))
    QueryResult(validated, execute(spark, df, validated))
  }

  /** The AI-path contract: any externally produced SELECT, validated then
    * run. The validator keeps the reference's substring semantics for parity;
    * deployments wanting plan-level hardening (catching side-effecting
    * statements the blocklist misses, e.g. `CACHE TABLE … AS SELECT`) should
    * additionally call [[graft.plans.ReadOnlyGuard.assertReadOnly]] and set
    * `spark.graft.maxRows` for the optimizer-rule row cap
    * ([[graft.plans.EnforceMaxRows]]). */
  def executeSql(spark: SparkSession, df: DataFrame, sql: String): QueryResult = {
    val validated = SqlValidator.validate(sql, df.columns.toIndexedSeq)
    QueryResult(validated, execute(spark, df, validated))
  }
}
