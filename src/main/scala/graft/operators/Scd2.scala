package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension type-2 history build: turn a change-event log
 * into versioned validity intervals — the standard warehouse shape for
 * "what was this entity's state at time T" queries, and the batch half of a
 * CDC ingestion pipeline.
 */
object Scd2 {

  /** Sentinel `valid_to` for the current (open) version — string-typed so
    * the interval columns stay engine-portable formatted timestamps. */
  val OpenEnd = "9999-12-31 00:00:00"

  /**
   * For each key, order its change events by (`tsCol`, `tieCol`) and emit
   * one row per version: `version` (1-based), `valid_from`, `valid_to`
   * (= next version's start, or [[OpenEnd]]), `is_current`, plus the
   * carried attribute columns. `tieCol` breaks equal-timestamp updates
   * deterministically (CDC logs carry an offset/sequence for exactly this).
   *
   * Scale shape: one hash exchange on the key, then a single window pass
   * (row_number + lead share the same sort) — per-key history builds
   * independently per partition, no global sort, no self-join. At 100 TB
   * this is the shape that replaces the naive "join each row to its
   * successor" O(n²)-per-key formulation.
   */
  def buildHistory(changes: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    def fmt(c: Column) = date_format(c, "yyyy-MM-dd HH:mm:ss")
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("next_ts", lead(col(tsCol), 1).over(w))
      .select(Seq(
        col(keyCol), col("version"),
        fmt(col(tsCol)).as("valid_from"),
        coalesce(fmt(col("next_ts")), lit(OpenEnd)).as("valid_to"),
        col("next_ts").isNull.cast("int").as("is_current")) ++
        attrCols.map(col): _*)
  }

  /**
   * Point-in-time (time-travel) read over an SCD2 history: each key's state
   * AS OF `asOf` — the rows whose half-open validity interval
   * `[valid_from, valid_to)` contains the cutoff. ONE predicate, no window
   * or join: the interval encoding did the temporal work at build time, so
   * the as-of read is a plain filter that pushes down to the history scan
   * (at 100 TB: the history table is stored partitioned/z-ordered on
   * `valid_from`, and this predicate prunes files). Lexicographic
   * comparison on the `yyyy-MM-dd HH:mm:ss` strings equals timestamp
   * order, and the `9999-…` open-end sentinel needs no special case.
   * Keys whose first version starts after `asOf` are absent — they did
   * not exist yet.
   */
  def snapshotAsOf(history: DataFrame, asOf: String): DataFrame =
    history.filter(lit(asOf) >= col("valid_from") && lit(asOf) < col("valid_to"))

  /**
   * PER-ROW temporal enrichment: each probe row joins the history version
   * valid at ITS OWN timestamp — `[valid_from, valid_to)` contains
   * `probe.tsCol` — the event-time lookup a feature pipeline runs
   * ("customer's plan when the click happened"), where [[snapshotAsOf]] is
   * the single-cutoff special case. Probe rows before the key's first
   * version match nothing (the entity did not exist yet) — inner join.
   *
   * Scale shape: an EQUI join on the key carries the interval containment
   * as a join residual — each key's history is its version count, so the
   * residual scan per probe row is tiny; both sides hash-partition on the
   * key (broadcast the history when it is dim-sized). Half-open intervals
   * make the match unique by construction: a probe at exactly a version
   * boundary joins the STARTING version only.
   *
   * GRANULARITY CONTRACT: [[buildHistory]] formats interval bounds at whole
   * seconds, so this join resolves at SECOND granularity — a probe and a
   * version change within the same second resolve in favor of the newer
   * version regardless of sub-second order. Callers needing finer
   * resolution must build the history (and this probe format) with a
   * fractional-seconds pattern.
   */
  def temporalJoin(history: DataFrame, probe: DataFrame, keyCol: String,
      tsCol: String): DataFrame = {
    val pts = date_format(probe(tsCol), "yyyy-MM-dd HH:mm:ss")
    probe.as("p").join(history.as("h"),
      probe(keyCol) === history(keyCol) &&
        pts >= history("valid_from") && pts < history("valid_to"))
  }
}
