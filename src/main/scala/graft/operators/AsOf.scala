package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — an operator Spark SQL lacks natively,
 * composed from built-ins per the preference order (compose > custom plan):
 * tag-union both sides, then one window pass per key ordered by time carries
 * the latest right-side values forward (`last_value(..., ignoreNulls)`), and
 * a final filter keeps the left rows.
 *
 * Cost: ONE shuffle on the key (the window exchange) + a per-partition sort
 * — same exchange count as a plain equi-join, no range explosion, no
 * broadcast requirement. This is the classic distributed as-of formulation;
 * at 100 TB the key partitioning spreads state and AQE coalesces the
 * post-shuffle partitions.
 *
 * Tie semantics: right rows at ts equal to the left row's ts ARE matched
 * (sort places the right side first at equal timestamps), matching DuckDB's
 * `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`.
 */
object AsOf {

  /**
   * For each row of `left`, attach `rightCols` from the latest `right` row
   * with `right.ts <= left.ts` and equal `key` (nulls when none exists).
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The carried payload is ONE struct per right row (non-null even when
    // its fields are null): `last(..., ignoreNulls)` must distinguish "no
    // right row yet" from "matched right row whose value is null" — carrying
    // raw columns would skip genuine nulls and resurrect stale values.
    val payload = struct(rightCols.map(col): _*)
    val taggedRight = right.select(
      (Seq(col(key), col(ts), lit(0).as("__side"), payload.as("__r")) ++
        leftCols.filterNot(Set(key, ts)).map(c => lit(null).as(c))): _*)
    val taggedLeft = left
      .select((leftCols.map(col) :+ lit(1).as("__side")): _*)
      .withColumn("__r", lit(null).cast(taggedRight.schema("__r").dataType))

    val unioned = taggedLeft.unionByName(taggedRight)
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)

    unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightCols.map(c => col(s"__asof.$c").as(s"asof_$c"))): _*)
  }
}
