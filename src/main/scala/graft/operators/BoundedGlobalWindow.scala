package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/**
 * The ONLY sanctioned spelling of an UNPARTITIONED window in this library.
 *
 * An unpartitioned `Window.orderBy` forces every input row through one
 * task — the classic silent scale-killer. Every global window in this
 * library therefore rides a frame that is BOUNDED BY A DOMAIN CONSTANT
 * before the window runs, never by corpus size:
 *
 *  - value-collapsed aggregates (distinct values of a bounded-cardinality
 *    column, e.g. cents, ranks, sizes),
 *  - calendar spines (days/weeks/hours of the data's date range),
 *  - one-row-per-partition offset frames (the two-phase prefix-sum shape:
 *    `repartitionByRange` → per-partition locals → ONE row per pid through
 *    the global window),
 *  - k-row cut lists / top-k frames already limited by a constant.
 *
 * Calling through this object is the caller's assertion that one of those
 * contracts holds — it makes intent greppable and reviewable. A bare
 * `Window.orderBy` anywhere in src/main is a test failure
 * (`WindowGuardSpec`): new global windows must either name their bound by
 * calling through here or partition.
 *
 * The runtime behavior is IDENTICAL to `Window.orderBy` — this is a
 * contract marker, not a wrapper that could drift.
 */
object BoundedGlobalWindow {
  def orderBy(cols: Column*): WindowSpec = Window.orderBy(cols: _*)
  def orderBy(colName: String, colNames: String*): WindowSpec =
    Window.orderBy(colName, colNames: _*)
}
