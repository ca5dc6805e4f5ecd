package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Storage-layout advisory: measure how well a candidate sort order
 * compresses each column BEFORE rewriting 100 TB into it.
 *
 * Parquet/ORC encode long runs of equal values almost for free (RLE +
 * dictionary), so the practical cost model for "which sort key should
 * this table be written in?" is the RUN COUNT of every hot column under
 * each candidate ordering — fewer runs = better RLE, tighter pages,
 * and more effective min/max pruning ([[SkippingIndex]] consumes the
 * same layout). This advisor computes exact run counts per column per
 * candidate order from ONE pass each, without ever globally sorting the
 * data on a single task.
 */
object LayoutAdvisor {

  /**
   * Exact per-column run counts under the total order `orderCols`
   * (caller includes a unique tiebreak — runs of `measureCols` are only
   * well-defined under a total order). A run count is
   * `#{rows that START a run}` = 1 + #{consecutive pairs that differ},
   * counted null-safely.
   *
   * Scale shape — the two-phase global-adjacency scan: range-exchange on
   * the order key, then a pid-local window (parallel) counts
   * within-partition run starts, and the per-partition FIRST/LAST rows
   * (via `min/max(struct(rn, measures))`, resolved map-side) form a
   * |partitions|-row boundary frame whose adjacent pairs contribute the
   * cross-partition changes. The only unpartitioned window ranks that
   * partition-count-bounded boundary frame. A naive
   * `LAG OVER (ORDER BY ...)` funnels the corpus through one task; this
   * never does — the same discipline as [[Analytics.peakConcurrency]].
   */
  def runCounts(df: DataFrame, orderCols: Seq[String],
      measureCols: Seq[String], orderLabel: String): DataFrame = {
    require(orderCols.nonEmpty && measureCols.nonEmpty,
      "runCounts needs order and measure columns")
    val keys = orderCols.map(col)
    val parted = df
      .select((orderCols ++ measureCols).distinct.map(col): _*)
      .repartitionByRange(keys: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(keys: _*)
    val withRn = parted.withColumn("__rn", row_number().over(w))
    val flagged = measureCols.foldLeft(withRn) { (d, c) =>
      d.withColumn(s"__chg_$c",
        when(col("__rn") > 1 && !(col(c) <=> lag(col(c), 1).over(w)), 1L)
          .otherwise(0L))
    }
    val boundStruct = (cs: Seq[String]) =>
      struct(col("__rn") +: cs.map(col): _*)
    // r12 (guide §1.2 "remove unnecessary passes"): the within-partition
    // change sums and the per-partition first/last boundary rows used to
    // be TWO consumers of `flagged`, so the range exchange + window +
    // lag pipeline over the full corpus executed twice (ReusedExchange
    // shares only the exchange, not the window above it). ONE
    // pid-grained aggregate now carries both — counts, per-measure
    // change sums, and the min/max boundary structs — and is
    // localCheckpoint'd at |partitions| rows, so the corpus pipeline
    // runs exactly once and every downstream branch reads the tiny
    // frame. Totals are re-derived by summing the per-pid rows
    // (coalesce(…, 0) keeps the documented empty-input behavior: 0 rows
    // → 0 runs → 0 ppm).
    val perPid = flagged.groupBy("__pid")
      .agg(count(lit(1)).as("__cnt"),
        (measureCols.map(c => sum(col(s"__chg_$c")).as(s"__w_$c")) ++
          Seq(min(boundStruct(measureCols)).as("__f"),
            max(boundStruct(measureCols)).as("__l"))): _*)
    // |partitions|-row frame: the unpartitioned rank is bounded by the
    // shuffle partition count, not the data. Checkpointed AFTER the rank
    // (the window provably rides the Aggregate) at |partitions| rows, so
    // the corpus pipeline above runs exactly once for the THREE readers
    // (totals + both sides of the boundary self-join).
    val ranked = perPid.withColumn("__rk",
        row_number().over(BoundedGlobalWindow.orderBy("__pid")))
      .localCheckpoint()
    val withinRow = ranked.agg(
      coalesce(sum(col("__cnt")), lit(0L)).as("__n"),
      measureCols.map(c => sum(col(s"__w_$c")).as(s"__w_$c")): _*)
    val boundaryRow = ranked.as("a")
      .join(ranked.as("b"), col("b.__rk") === col("a.__rk") + 1)
      .select(measureCols.map(c =>
        when(!(col(s"a.__l.$c") <=> col(s"b.__f.$c")), 1L).otherwise(0L)
          .as(s"__bc_$c")): _*)
      .agg(count(lit(1)).as("__pairs"),
        measureCols.map(c => sum(col(s"__bc_$c")).as(s"__b_$c")): _*)
    val stacked = measureCols
      .map(c => s"'$c', __w_$c + coalesce(__b_$c, 0L)").mkString(", ")
    withinRow.crossJoin(boundaryRow)
      .select(col("__n"), expr(
        s"stack(${measureCols.size}, $stacked) AS (column_name, __changes)"))
      .select(lit(orderLabel).as("order_label"), col("column_name"),
        col("__n").as("n_rows"),
        when(col("__n") > 0, col("__changes") + 1L).otherwise(0L).as("n_runs"))
      // empty-relation guard: ANSI DIV raises on /0, and an empty table
      // legitimately reports (0 rows, 0 runs, 0 ppm)
      .withColumn("runs_ppm",
        expr("CASE WHEN n_rows > 0 THEN n_runs * 1000000 DIV n_rows ELSE 0L END"))
  }
}
