package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-handling join utility. AQE's skew-join splitting covers sort-merge
 * joins at runtime; explicit salting remains the tool for extreme single-key
 * skew (one key ≫ a partition) or when the plan shape defeats AQE. The
 * result is identical to the plain join by construction — the salt only
 * redistributes rows.
 */
object Skew {

  /**
   * Salted equi-join of a skewed `large` side with a `small` side: large rows
   * get a deterministic salt in [0, salts); the small side is replicated
   * `salts` ways, so each (key, salt) bucket joins independently and a hot
   * key spreads over `salts` tasks instead of one.
   */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    // The salt must vary across IDENTICAL rows — a hot key often consists of
    // byte-equal rows, and any pure function of the row's columns would send
    // them all to one bucket. monotonically_increasing_id is unique per row
    // (partition-indexed), and the salt choice cannot affect the join result.
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(lit((0 until salts).toArray)))
    salted.join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /**
   * Key-skew diagnostics — the observability query run BEFORE choosing a
   * join strategy at scale: the top-`k` heaviest values of `keyCol` with an
   * integer-scaled ratio of each key's row count to the mean
   * (`count · n_keys · scale DIV total` — no float division, so reruns and
   * engines agree exactly). A skew_scaled ≫ scale key is the signal to
   * reach for [[saltedJoin]] / AQE skew splitting.
   *
   * Scale shape: one hash aggregate (map-side partials bound the exchange
   * by key cardinality), grand totals as a 1-row broadcast, top-k via
   * TakeOrderedAndProject — the key histogram is never globally sorted.
   *
   * The ratio is staged through DECIMAL(38,0) before the integral divide:
   * the raw BIGINT product `n · n_keys · scale` wraps past 2^63 at table
   * sizes this operator exists for (10^9-row hot key × 10^7 keys already
   * overflows), and it would wrap on exactly the hot keys being flagged.
   */
  def keySkewReport(df: DataFrame, keyCol: String, k: Int = 10,
      scale: Int = 1000): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("total"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col(keyCol), col("n"),
        expr(s"CAST(CAST(n AS DECIMAL(38,0)) * n_keys * $scale DIV total AS BIGINT)")
          .as("skew_scaled"))
      .orderBy(desc("n"), col(keyCol)).limit(k)
  }

  /**
   * Skew-safe EXACT distinct count per key: dedup on (key, value) FIRST —
   * hash-partitioned by the pair, so a hot key's rows spread over the whole
   * cluster — then count per key with map-side partial aggregation. The
   * naive `groupBy(key).agg(countDistinct(value))` hashes every row of the
   * hot key into ONE task's aggregation buffer (Expand + exchange on the
   * key alone): the straggler that salting exists to kill, solved here by
   * partitioning choice instead of salt bookkeeping. NULL values are
   * excluded before the pair dedup (COUNT DISTINCT semantics — a bare
   * pair-distinct would count NULL as a value) and every key keeps a row
   * via the key-spine left join, so the result equals `countDistinct` on
   * ALL inputs; PlanSpec pins the two-exchange shape.
   */
  def distinctCountSkewSafe(df: DataFrame, keyCol: String,
      valCol: String): DataFrame = {
    val counts = df.select(col(keyCol), col(valCol))
      .filter(col(valCol).isNotNull)
      .distinct()
      .groupBy(keyCol).agg(count(lit(1)).as("n_distinct"))
    df.select(col(keyCol)).distinct()
      .join(counts, Seq(keyCol), "left")
      .select(col(keyCol), coalesce(col("n_distinct"), lit(0L)).as("n_distinct"))
  }

  /**
   * SKEW-AWARE partition PLAN: assign keys to `nParts` partitions by
   * SNAKE placement over the count-desc key ranking (1..P, then P..1,
   * …) — the deterministic greedy-balancing layout a custom partitioner
   * ships when hash partitioning would let one hot key sink a task. The
   * report gives each planned partition's key count and row load plus
   * its imbalance vs the ideal `total/nParts` in exact ppm — the number
   * that says whether the layout is worth deploying. Snake (vs plain
   * round-robin) pairs the heaviest key in each band with the lightest
   * of the next, bounding adjacent-band imbalance.
   *
   * Scale shape: one map-side-combined count per key; the count-desc key
   * rank is the TWO-PHASE range-partitioned prefix sum
   * ([[graft.operators.Sampling.globalRankRange]]'s shape) — range-exchange
   * the |keys| frame on (count desc, key), rank locally, add the exclusive
   * prefix of per-partition counts (the only single-partition hop is the
   * one-row-per-partition offsets frame, never the key frame itself, which
   * grows with the corpus) — then a `nParts`-row rollup. The corpus is
   * scanned once; nothing about the plan computation is corpus-sized.
   */
  def skewAwarePartitionPlan(df: DataFrame, keyCol: String,
      nParts: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nParts >= 1, s"nParts $nParts must be positive")
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("__n"))
    val keys = Seq(col("__n").desc, col(keyCol).asc)
    val parted = counts.repartitionByRange(keys: _*)
      .withColumn("__pid", spark_partition_id())
    val local = parted.withColumn("__lr",
      row_number().over(Window.partitionBy("__pid").orderBy(keys: _*)).cast("long"))
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", sum(col("__cnt")).over(BoundedGlobalWindow.orderBy("__pid")) - col("__cnt"))
      .select(col("__pid").as("__opid"), col("__off"))
    val planned = local.join(broadcast(offsets), col("__pid") === col("__opid"))
      .withColumn("__rk", col("__off") + col("__lr") - 1L)
      .withColumn("part",
        expr(s"CASE WHEN (__rk DIV $nParts) % 2 = 0 THEN __rk % $nParts" +
          s" ELSE $nParts - 1 - (__rk % $nParts) END"))
    val loads = planned.groupBy("part")
      .agg(count(lit(1)).as("n_keys"), sum("__n").as("load"))
    val total = loads.agg(sum("load").as("__total"))
    loads.crossJoin(broadcast(total))
      .select(col("part"), col("n_keys"), col("load"),
        expr(s"CAST(CAST(load AS DECIMAL(38,0)) * $nParts * 1000000" +
          " DIV __total - 1000000 AS BIGINT)").as("imbalance_ppm"))
  }

  /**
   * JOIN-CARDINALITY estimate WITHOUT executing the join — the planner
   * arithmetic (`|A ⋈ B| = Σₖ aₖ·bₖ` over per-key counts, exact when the
   * histograms are exact) surfaced as an operator: run it before a big
   * join to learn the output size, the matched-key count, and the
   * hottest key's pair contribution (the number that says "salt this" —
   * [[skewAwarePartitionPlan]]'s trigger) for the cost of two count
   * aggregates instead of the join itself.
   *
   * Scale shape: one map-side-combined count per side, an equi-join of
   * the two KEY frames (key-bounded, never row-bounded), one final
   * 1-row fold. The pair sum rides DECIMAL(38,0): two hot keys of 1e7
   * rows each contribute 1e14 pairs — Σ overflows BIGINT at scale long
   * before any real join materializes. NULL keys never match in an
   * equi-join, so they are excluded from both histograms.
   */
  def joinCardinalityEstimate(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val a = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("__k")).agg(count(lit(1)).as("__na"))
    val b = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("__nb"))
    val matched = a.join(b, "__k")
      .agg(count(lit(1)).as("n_keys_matched"),
        sum(expr("CAST(__na AS DECIMAL(38,0)) * __nb")).as("__pairs"),
        max(expr("CAST(__na AS DECIMAL(38,0)) * __nb")).as("__hot"))
    val totals = a.agg(count(lit(1)).as("n_keys_left"))
      .crossJoin(b.agg(count(lit(1)).as("n_keys_right")))
    matched.crossJoin(broadcast(totals))
      .select(col("n_keys_left"), col("n_keys_right"), col("n_keys_matched"),
        expr("CAST(__pairs AS BIGINT)").as("est_rows"),
        expr("CAST(__hot AS BIGINT)").as("max_key_pairs"))
  }
}
