package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CDC MERGE / upsert apply: fold a keyed change batch (inserts, updates,
 * deletes) into a snapshot and emit the new snapshot — the write half of an
 * incremental lake pipeline ([[Scd2]] is the history half, the incremental
 * aggregate keeps derived state, the foreachBatch sink lands the batches).
 *
 * Semantics (Delta/Iceberg MERGE with "latest change wins"):
 *   - for each key, the winning row is the change with the greatest
 *     (`tsCol`, `tieCol`); absent any change, the snapshot row wins
 *   - a winning delete removes the key; a winning insert/update replaces
 *     (or creates) the key's attributes
 *   - deletes of absent keys and duplicate changes per key are legal; the
 *     tie column (a CDC log offset/sequence) makes the winner deterministic
 *
 * Scale shape: union → ONE hash exchange on the key → one window pass
 * (row_number over is_change/ts/tie). No per-row point lookups, no join
 * back to the snapshot, no second shuffle: at 100 TB this is a single
 * co-partitioned merge identical in cost to the SCD2 history build. With
 * both sides bucketed by key on disk even the one exchange disappears.
 */
object CdcMerge {

  /** Marker value in `opCol` meaning "remove this key". */
  val DeleteOp = "D"

  /**
   * Snapshot diff — the generator of the change batches [[applyChanges]]
   * consumes (table reconciliation / CDC bootstrap when no change log
   * exists): compare two keyed snapshots and emit one row per differing
   * key with `op` = I (key only in `newSnap`), U (attributes differ,
   * null-safely), or D (key only in `oldSnap`), plus the NEW attribute
   * values (null for deletes). Unchanged keys emit nothing.
   * `applyChanges(old, snapshotDiff(old, new))` reconstructs `new`
   * exactly (invariant-tested).
   *
   * Scale shape: one full outer join co-partitioned on the key — both
   * sides shuffle once, no window, no driver work; with both snapshots
   * bucketed by key on disk the exchanges disappear entirely.
   */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
      attrCols: Seq[String]): DataFrame = {
    val o = oldSnap.select(
      col(keyCol) +: lit(1).as("_in_old") +:
        attrCols.map(a => col(a).as(s"_old_$a")): _*)
    val n = newSnap.select(
      col(keyCol) +: lit(1).as("_in_new") +: attrCols.map(col): _*)
    val changed = attrCols
      .map(a => !(col(a) <=> col(s"_old_$a")))
      .reduce(_ || _)
    o.join(n, Seq(keyCol), "full_outer")
      .withColumn("op",
        when(col("_in_old").isNull, lit("I"))
          .when(col("_in_new").isNull, lit(DeleteOp))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .select(col(keyCol) +: col("op") +: attrCols.map(col): _*)
  }

  /**
   * COLUMN-level drift between two keyed snapshots — [[snapshotDiff]]'s
   * row-level I/U/D answer decomposed by ATTRIBUTE: for each tracked
   * column, how many co-present keys changed it (null-safe inequality)
   * and the change rate in exact ppm, plus the insert/delete row counts
   * once. "c_acctbal churned on 4% of customers, c_mktsegment on 0.1%"
   * is what decides incremental-refresh strategy per column; the row
   * verdict alone can't say it.
   *
   * Scale shape: ONE co-partitioned full outer join (same as
   * snapshotDiff), one aggregate producing every per-column counter in a
   * single pass (no per-column scans — the x94 single-Expand argument),
   * and an O(|cols|)-row `inline` fan-out of that one aggregated row.
   */
  def columnDrift(oldSnap: DataFrame, newSnap: DataFrame, keyCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "need at least one tracked column")
    val o = oldSnap.select(
      col(keyCol) +: lit(1).as("_in_old") +:
        attrCols.map(a => col(a).as(s"_old_$a")): _*)
    val n = newSnap.select(
      col(keyCol) +: lit(1).as("_in_new") +: attrCols.map(col): _*)
    val j = o.join(n, Seq(keyCol), "full_outer")
    val both = col("_in_old").isNotNull && col("_in_new").isNotNull
    val aggs =
      Seq(sum(when(both, 1L).otherwise(0L)).as("_n_both"),
        sum(when(col("_in_old").isNull, 1L).otherwise(0L)).as("_n_ins"),
        sum(when(col("_in_new").isNull, 1L).otherwise(0L)).as("_n_del")) ++
      attrCols.map(a => sum(when(both && !(col(a) <=> col(s"_old_$a")), 1L)
        .otherwise(0L)).as(s"_chg_$a"))
    val one = j.agg(aggs.head, aggs.tail: _*)
    val entries = attrCols.map(a => struct(lit(a).as("col_name"),
      col("_n_both").as("n_compared"), col(s"_chg_$a").as("n_changed"),
      when(col("_n_both") > 0, expr(s"_chg_$a * 1000000 DIV _n_both"))
        .otherwise(lit(0L)).as("changed_ppm"),
      col("_n_ins").as("n_inserted_rows"), col("_n_del").as("n_deleted_rows")))
    one.select(inline(array(entries: _*)))
  }

  /**
   * Apply `changes` to `snapshot`; both must carry `keyCol` ++ `attrCols`,
   * and `changes` additionally `tsCol`, `tieCol`, `opCol`. Returns the new
   * snapshot: one row per surviving key with the winning attributes.
   */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, opCol: String,
      attrCols: Seq[String]): DataFrame = {
    // snapshot rows sort below every change via is_change, so their null
    // ts/tie never compete with real change timestamps
    val base = snapshot.select(
      col(keyCol) +: lit(0).as("is_change") +:
        lit(null).cast(changes.schema(tsCol).dataType).as(tsCol) +:
        lit(null).cast(changes.schema(tieCol).dataType).as(tieCol) +:
        lit("U").as(opCol) +: attrCols.map(col): _*)
    val chg = changes.select(
      col(keyCol) +: lit(1).as("is_change") +: col(tsCol) +: col(tieCol) +:
        col(opCol) +: attrCols.map(col): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col("is_change").desc, col(tsCol).desc_nulls_last,
        col(tieCol).desc_nulls_last)
    base.unionByName(chg)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col(opCol) =!= DeleteOp)
      .select(col(keyCol) +: attrCols.map(col): _*)
  }

  /**
   * Incremental equi-join maintenance for APPEND-ONLY deltas — the join
   * analog of the x40 partial-state aggregate: with a previously
   * materialized `old ⋈ old` result, the updated join is
   * `old ∪ incrementalJoinDelta(...)`, where the delta is
   * `ΔL ⋈ (R ∪ ΔR)  ∪  L ⋈ ΔR` — every term joins a DELTA against a full
   * side, so the nightly maintenance cost is O(|Δ| · match rate), never a
   * re-join of two 100 TB tables. (Correctness is the distributivity of ⋈
   * over ∪; the decomposition assigns each new pair to exactly one term.)
   * Deltas small by construction ⇒ Spark broadcasts them; the big sides
   * are probed map-side without a shuffle.
   */
  def incrementalJoinDelta(oldLeft: DataFrame, deltaLeft: DataFrame,
      oldRight: DataFrame, deltaRight: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "incrementalJoinDelta needs join keys")
    deltaLeft.join(oldRight.unionByName(deltaRight), keys)
      .unionByName(oldLeft.join(deltaRight, keys))
  }
}
