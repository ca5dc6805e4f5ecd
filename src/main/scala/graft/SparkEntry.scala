package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{ATier, BTier, Extensions}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full NL pipeline: profile → rule SQL → validate → execute → collapse. */
  def entry(spark: SparkSession): DataFrame =
    ATier.queries("a04_rule_groupby_count")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ATier.queries ++ BTier.queries ++ Extensions.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ATier.oracles ++ BTier.oracles ++ Extensions.oracles
}
