package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation audit operators: the bookkeeping layer of a training-data
 * pipeline. A production corpus build is a SEQUENCE of filters, and the
 * artifact reviewers actually read is the funnel report ("rule X dropped
 * N docs") plus the leakage-safe split manifest — not the filtered rows.
 * These operators produce those reports in one pass each, engine-exactly
 * (integer arithmetic + the portable md5 draw), so every number is
 * DuckDB-oracle-checkable.
 */
object Curation {

  /**
   * Sequential filter-funnel audit: apply `rules` IN ORDER and report, per
   * stage, how many documents entered, were dropped, and survived. A doc
   * is evaluated by rule i only if it passed rules 0..i-1 — the numbers a
   * curation report needs ("lang filter dropped 70 of the 463 length
   * survivors"), not independent per-rule counts.
   *
   * Scale shape: ONE pass — every rule becomes a boolean column, the
   * prefix-conjunction survivor counts are conditional sums in a single
   * global aggregate (map-side partials), and the per-stage rows are
   * `inline`d from that one aggregated row on the driver side of the plan.
   * No per-rule scan, no self-join; rules that need a window (e.g. exact-dup
   * rank) add their own exchange but still share the single scan. Cost at
   * 100 TB = one corpus read regardless of rule count.
   */
  def filterFunnel(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "filterFunnel needs at least one rule")
    // the staging columns below would silently SHADOW same-named input
    // columns inside later rule expressions — refuse instead
    val reserved = df.columns.filter(c =>
      c == "_total" || c.matches("_[rs]\\d+"))
    require(reserved.isEmpty,
      s"filterFunnel staging names collide with input columns: ${reserved.mkString(", ")}")
    val flagged = rules.zipWithIndex.foldLeft(df) { case (d, ((_, c), i)) =>
      d.withColumn(s"_r$i", c.cast("boolean"))
    }
    val survivors = rules.indices.map { i =>
      val prefix = (0 to i).map(j => col(s"_r$j")).reduce(_ && _)
      sum(when(prefix, 1L).otherwise(0L)).as(s"_s$i")
    }
    val one = flagged.agg(count(lit(1)).as("_total"), survivors: _*)
    val stages = rules.zipWithIndex.map { case ((name, _), i) =>
      val nIn = if (i == 0) col("_total") else col(s"_s${i - 1}")
      val nOut = col(s"_s$i")
      struct(lit(i + 1).as("stage"), lit(name).as("rule"), nIn.as("n_in"),
        (nIn - nOut).as("n_dropped"), nOut.as("n_out"))
    }
    one.select(inline(array(stages: _*)))
  }

  /**
   * Leakage-safe train/val/test split manifest: every GROUP (e.g. source
   * domain) — not every document — is assigned to exactly one split by the
   * portable 60-bit md5 draw, so near-duplicate documents within a domain
   * can never straddle the train/eval boundary (the standard web-corpus
   * leakage control; doc-level hashing does NOT give this property).
   * Returns the per-split manifest: group count, doc count, char volume.
   *
   * Split is a pure function of the group key — adding documents later
   * routes them to the SAME split with no repartitioning of history.
   * NULL group keys coalesce into one deterministic group (unknown
   * provenance travels together; the draw, not a silent fall-through,
   * decides its split).
   * Scale shape: map-side draw + one hash aggregate; the distinct-group
   * count rides the same exchange via partial distinct aggregation.
   */
  def leakageSafeSplit(df: DataFrame, groupCol: String, docSizeCol: String,
      trainPct: Int = 60, valPct: Int = 20): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      s"invalid split percents ($trainPct, $valPct)")
    // NULL group keys must not silently land in the eval split (they are
    // the docs whose provenance is UNKNOWN — exactly the ones that might
    // near-dup against anything): coalesce to one deterministic group, so
    // all unknown-provenance docs travel together and the draw decides
    val draw = PortableHash.hash60(coalesce(col(groupCol), lit(""))) % 100
    df.withColumn("split",
        when(draw < trainPct, "train")
          .when(draw < trainPct + valPct, "val")
          .otherwise("test"))
      .groupBy("split")
      // count groups on the SAME coalesced key the draw uses — otherwise
      // the NULL pseudo-group's docs appear in n_docs/total_size while
      // n_groups omits the group, an internally inconsistent manifest
      .agg(countDistinct(coalesce(col(groupCol), lit(""))).as("n_groups"),
        count(lit(1)).as("n_docs"),
        sum(col(docSizeCol)).as("total_size"))
  }

  /**
   * IMPORTANCE-WEIGHT effective-sample-size audit (Kish's ESS, public) —
   * the feasibility check BEFORE reweighting one corpus slice to match a
   * target distribution over a discrete feature: per stratum s the
   * weight is `w_s = (t_s/N_tgt)/(n_s/N_src)`, and Kish's
   * `ESS = (Σw)²/Σw² = N_tgt² / Σ_s t_s²/n_s` says how much effective
   * data the reweighted source actually carries — reweighting a slice
   * that lacks the target's mass concentrates weight on a few rows and
   * the ESS collapses, which this reports BEFORE a training run finds
   * out. Exact integers: per-stratum `t_s² DIV n_s` floors identically
   * in both engines (quotient ≤ N²_tgt, safely inside BIGINT at the
   * ~10⁸ documented bound); the final ratio stages through
   * DECIMAL(38,0). Target strata the source does not cover CANNOT be
   * reweighted into existence — they are excluded from the ESS and
   * reported as `uncovered_target_ppm` (the honest headline when it is
   * non-zero).
   *
   * Output (1 row): source/target row counts, covered stratum count,
   * uncovered target mass (ppm), and `ess_ppm` — the effective fraction
   * of the source that survives reweighting (1e6 = perfectly matched
   * already).
   *
   * Scale shape: two stratum collapses (vocabulary-bounded), one outer
   * join of the two bounded tables, one 1-row aggregate.
   */
  def importanceWeightEss(df: DataFrame, stratum: Column,
      inSource: Column): DataFrame = {
    val base = df.select(stratum.cast("long").as("__s"),
        inSource.cast("boolean").as("__src"))
      .filter(col("__s").isNotNull && col("__src").isNotNull)
      .groupBy("__s")
      .agg(sum(when(col("__src"), 1L).otherwise(0L)).as("__n"),
        count(lit(1)).as("__t"))
    val tot = base.agg(coalesce(sum(col("__n")), lit(0L)).as("__nsrc"),
      coalesce(sum(col("__t")), lit(0L)).as("__ntgt"))
    base.crossJoin(broadcast(tot))
      .agg(max(col("__nsrc")).as("n_source"), max(col("__ntgt")).as("n_target"),
        sum(when(col("__n") > 0L, 1L).otherwise(0L)).as("n_covered_strata"),
        sum(when(col("__n") === 0L, col("__t")).otherwise(0L)).as("__unc"),
        coalesce(sum(when(col("__n") > 0L,
          expr("CAST(__t AS DECIMAL(38,0)) * __t DIV __n").cast("decimal(38,0)"))),
          lit(0).cast("decimal(38,0)")).as("__term"),
        coalesce(sum(when(col("__n") > 0L, col("__t")).otherwise(0L)), lit(0L))
          .as("__covt"))
      .select(coalesce(col("n_source"), lit(0L)).as("n_source"),
        coalesce(col("n_target"), lit(0L)).as("n_target"),
        coalesce(col("n_covered_strata"), lit(0L)).as("n_covered_strata"),
        // n_target here is the PRE-coalesce max(__ntgt) — NULL on an empty
        // frame — so the guard needs the IS NULL arm to mirror the oracle's
        // `ntgt IS NULL OR ntgt = 0` and report 0 instead of NULL.
        expr("""CAST(CASE WHEN n_target IS NULL OR n_target = 0 THEN 0
             ELSE coalesce(__unc, 0) * 1000000 DIV n_target END AS BIGINT)""")
          .as("uncovered_target_ppm"),
        // ESS over the COVERED target mass: N_cov² / Σ t²/n, as a ppm
        // fraction of the source size
        expr("""CAST(CASE WHEN n_source IS NULL OR n_source = 0
                  OR __term <= 0 THEN 0
             ELSE CAST(__covt AS DECIMAL(38,0)) * __covt * 1000000
                  DIV (CAST(n_source AS DECIMAL(38,0)) * __term)
             END AS BIGINT)""").as("ess_ppm"))
  }

  /**
   * GROUP k-FOLD manifest — the cross-validation complement of
   * [[leakageSafeSplit]]: every provenance group lands WHOLLY in one of
   * the k folds (fold = portable 60-bit md5 of the group, mod k), so no
   * near-dup pair can straddle a train/holdout boundary under ANY fold
   * rotation. Reports per fold: groups, docs, total size, and the exact
   * doc share in ppm — the balance table a CV design reads before
   * trusting per-fold metric variance (a fold holding one giant group is
   * not an independent draw). Same NULL-group policy as
   * [[leakageSafeSplit]]: unknown provenance coalesces to ONE
   * deterministic pseudo-group that travels together.
   *
   * Scale shape: the fold is a map-side hash expression; one
   * k-bounded aggregate (countDistinct rides the same exchange), one
   * broadcast total. Folds with no groups simply do not appear — the
   * share column is why an absent fold is visible anyway.
   */
  def groupKFold(df: DataFrame, groupCol: String, docSizeCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 1000, s"fold count $k not in [2, 1000]")
    val fold = PortableHash.hash60(coalesce(col(groupCol), lit(""))) % k
    val per = df.withColumn("fold", fold.cast("int"))
      .groupBy("fold")
      .agg(countDistinct(coalesce(col(groupCol), lit(""))).as("n_groups"),
        count(lit(1)).as("n_docs"),
        sum(col(docSizeCol)).as("total_size"))
    per.crossJoin(broadcast(per.agg(sum(col("n_docs")).as("__tot"))))
      .select(col("fold"), col("n_groups"), col("n_docs"), col("total_size"),
        expr("n_docs * 1000000 DIV __tot").as("share_ppm"))
      .orderBy("fold")
  }

  /**
   * Wide single-pass column profile: per column, null count and EXACT
   * distinct count — the post-load data-quality summary for every column
   * of a table in ONE scan (the per-upload profiler's warehouse-scale
   * sibling). Spark plans the multi-column distinct as one Expand (+16×
   * the scan rows through the exchange for 16 columns) — the standard
   * single-pass trade; at 100 TB swap `countDistinct` for
   * `approx_count_distinct` with identical plumbing when exactness isn't
   * contractual (here it is: the counts are oracle-checked).
   */
  def profileWide(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = cols.flatMap(c => Seq(
      // coalesce: SUM over an empty table is NULL; the profile convention
      // is zeros (COUNT-based oracles emit 0 on empty input)
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
        .as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map(c => struct(lit(c).as("col_name"),
      col(s"${c}__nulls").as("n_nulls"), col(s"${c}__distinct").as("n_distinct")))
    row.select(inline(array(entries: _*)))
  }

  /**
   * Per-group feature standardization (z-score): each row's metric scaled
   * to (x − group mean)/group stddev — the classic ML feature-prep step,
   * per group so heterogeneous sources are comparable. Moments come from
   * EXACT decimal sums ((Σx² − (Σx)²/n)/(n−1), the b24 pattern) — never
   * the engines' streaming variance, whose merge order is
   * non-deterministic — then one broadcast join fans the ≤|groups| stats
   * back over the corpus map-side. Groups with fewer than 2 rows (or zero
   * variance) emit NULL z rather than ±Infinity.
   */
  def standardizeByGroup(df: DataFrame, idCol: String, metricCol: String,
      groupCol: String): DataFrame = {
    val x = col(metricCol)
    // decimal(28,6) keeps 6 fractional digits through the moment sums, so
    // non-integer metrics are not silently rounded (the z numerator uses
    // the raw x; rounding only the moments would skew z for fractional x).
    val stats = df.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      sum(x.cast("decimal(28,6)")).cast("double").as("s"),
      sum(x.cast("decimal(28,6)") * x).cast("double").as("sq"))
      .select(col(groupCol), (col("s") / col("n")).as("mean"),
        when(col("n") > 1,
          sqrt((col("sq") - col("s") * col("s") / col("n")) / (col("n") - 1)))
          .as("std"))
    df.join(broadcast(stats), groupCol)
      .select(col(idCol), col(groupCol), x.as("x"),
        round((x - col("mean")) / when(col("std") > 0, col("std")), 6).as("z"))
  }

  /**
   * Robust outlier report (median / MAD, the standard robust z-score): a
   * doc is an outlier when |x − median| > k·MAD, with MAD the median
   * absolute deviation — unlike mean/stddev, one corrupted batch of
   * giant documents cannot drag the threshold. Reports per-group doc,
   * outlier, and retained-range stats.
   *
   * Scale shape: two global aggregates over the metric column (median,
   * then MAD over |x − median|) broadcast into a final per-group
   * aggregate — three passes over ONE column (each a partial-agg
   * exchange of a few bytes), never a sort of the corpus. The interpolated
   * exact percentile is used at audit time; a production loop would swap
   * in `approx_percentile` partials with identical plumbing.
   */
  def robustOutlierReport(df: DataFrame, metricCol: String, groupCol: String,
      k: Int = 3): DataFrame = {
    val med = df.agg(expr(s"percentile($metricCol, 0.5)").as("med"))
    val stats = df.crossJoin(broadcast(med))
      .agg(expr(s"percentile(abs($metricCol - med), 0.5)").as("mad"),
        first(col("med")).as("med"))
    val isOut = abs(col(metricCol) - col("med")) > lit(k) * col("mad")
    df.crossJoin(broadcast(stats))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(isOut, 1L).otherwise(0L)).as("n_outliers"),
        min(when(!isOut, col(metricCol))).as("kept_min"),
        max(when(!isOut, col(metricCol))).as("kept_max"))
  }

  /**
   * Water-filling token-budget allocator — the data-mixture capping step:
   * given a per-source token supply and a global training budget, find the
   * integer cap `C` maximizing Σ min(tokens_s, C) without exceeding the
   * budget, and report each source's allocation. Sources below the
   * waterline keep everything; over-represented sources are cut to `C` —
   * how a corpus build stops one crawl domain from dominating the mixture
   * while using the budget exactly as far as integer caps allow.
   *
   * Closed form, all integer: with sources sorted by supply ascending and
   * `prefix_i` the tokens of the i smallest, candidate `C_i = (budget −
   * prefix_i) div (n − i)` is valid for exactly one i (the largest with
   * `t_i ≤ C_i`); budget ≥ total supply means nothing is capped (cap
   * reported as the max supply). Deterministic for any input — no search,
   * no floats.
   *
   * Scale shape: the corpus collapses to one row per source in a single
   * map-side-combined aggregate; the waterline math runs over that
   * |sources|-row frame (tiny by construction) with one window pass.
   */
  def waterFillAllocation(df: DataFrame, sourceCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budget >= 0, s"budget $budget must be non-negative")
    val supply = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokenCol)).as("n_tokens"))
    val byAsc = BoundedGlobalWindow.orderBy(col("n_tokens"), col("source"))
    val all = Window.partitionBy(lit(1))
    // At row i (ascending): sources 1..i−1 saturate, the n−i+1 others sit at
    // the cap; the regime's max cap is C_i = (budget − prefix_{i−1}) div
    // (n−i+1), and exactly one row satisfies t_{i−1} ≤ C_i < t_i when the
    // total supply exceeds the budget.
    val withCand = supply
      .withColumn("i", row_number().over(byAsc))
      .withColumn("prefix", sum(col("n_tokens")).over(
        byAsc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_src", count(lit(1)).over(all))
      .withColumn("total", sum(col("n_tokens")).over(all))
      .withColumn("cand",
        expr(s"($budget - prefix + n_tokens) DIV (n_src - i + 1)"))
      .withColumn("cand_valid",
        col("cand") >= lag(col("n_tokens"), 1, 0L).over(byAsc) &&
          col("cand") < col("n_tokens"))
    val cap = withCand
      .agg(max(col("total")).as("total"),
        max(col("n_tokens")).as("max_supply"),
        min(when(col("cand_valid"), col("cand"))).as("waterline"))
      .select(when(col("total") <= budget, col("max_supply"))
        .otherwise(col("waterline")).as("cap"))
    supply.crossJoin(broadcast(cap))
      .select(col("source"), col("n_tokens"),
        least(col("n_tokens"), col("cap")).as("allocated"), col("cap"))
  }

  /**
   * Within-group percentile calibration: each row's score mapped to its
   * group-relative percentile in integer basis points —
   * `(rank − 1)·10000 DIV (n − 1)` with RANK, so VALUE ties share a
   * percentile (calibration must not split equal scores by id) — making
   * scores from groups with different scales comparable before a global
   * cut (the x49 domain-cap / x133 budget-cut consumers). Single-row
   * groups calibrate to 0. One exchange on the group key; the rank window,
   * the count window, and nothing else — no joins.
   */
  def percentileCalibration(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String): DataFrame = {
    val byScore = Window.partitionBy(groupCol).orderBy(scoreCol)
    // reserved temp names: plain "rk"/"n" would clobber (and corrupt) a
    // same-named input column
    df.withColumn("__rk", rank().over(byScore).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
      .select(col(idCol), col(groupCol), col(scoreCol),
        expr("CASE WHEN __n > 1 THEN (__rk - 1) * 10000 DIV (__n - 1)" +
          " ELSE CAST(0 AS BIGINT) END").as("pct_bps"))
  }

  /**
   * TEMPORAL holdout split — the leakage-safe eval protocol for
   * time-ordered data (forecasting, recommendation, event modeling): pick
   * the cutoff DAY at the `trainPct` rank of the DISTINCT day spine (the
   * element at rank `ceil(p·n/100)` — data-driven, so the split tracks the
   * actual time range; rank over distinct days, not rows, so one hot day
   * cannot drag the cutoff) and assign rows ≤ cutoff to train, the rest to
   * test. Reports per-split event/user counts plus the count of users
   * seen on BOTH sides — the overlap a temporal split permits by design
   * but an entity-split forbids; surfacing it makes the protocol choice
   * auditable ([[leakageSafeSplit]] is the entity-split complement).
   *
   * Scale shape: the day spine is a |days|-row aggregate (map-side
   * combined), its rank pick is a 1-row broadcast; the split tag is then
   * MAP-SIDE over one corpus scan feeding a 2-row aggregate, and the
   * overlap count is a |users|-bounded aggregate — no corpus-sized joins
   * or windows anywhere.
   */
  def temporalSplit(events: DataFrame, userCol: String, tsCol: String,
      trainPct: Int = 80): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(trainPct >= 1 && trainPct <= 99, s"trainPct $trainPct not in [1,99]")
    val days = events.select(to_date(col(tsCol)).as("day"))
      .filter(col("day").isNotNull).distinct()
    val byDay = BoundedGlobalWindow.orderBy("day")
    // |days|-row frame: the global window is bounded and the pick is 1 row
    val cutoff = days
      .withColumn("__rk", row_number().over(byDay).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(lit(1))))
      .filter(col("__rk") === expr(s"($trainPct * __n + 99) DIV 100"))
      .select(col("day").as("__cut"))
    val tagged = events.filter(col(tsCol).isNotNull)
      .crossJoin(broadcast(cutoff))
      .withColumn("split",
        when(to_date(col(tsCol)) <= col("__cut"), "train").otherwise("test"))
    val perSplit = tagged.groupBy("split")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col(userCol)).as("n_users"))
    // NULL keys are not users: n_users (countDistinct) skips them, so the
    // overlap count must too or the report is internally inconsistent (the
    // leakageSafeSplit NULL-group lesson)
    val overlap = tagged.filter(col(userCol).isNotNull)
      .groupBy(col(userCol))
      .agg(countDistinct(col("split")).as("__ns"))
      .agg(sum(when(col("__ns") === 2, 1L).otherwise(0L)).as("n_shared_users"))
    perSplit.crossJoin(broadcast(overlap))
  }

  /**
   * GROUP-MEDIAN imputation with a visible audit trail: NULL metric
   * values are filled with their group's rank-exact lower median (the
   * x153 pick — deterministic, no interpolation) and every row carries
   * `was_imputed` so downstream consumers can weight or exclude filled
   * values — silent imputation is how a "clean" feature hides a biased
   * one. Rows in groups with NO observed values stay NULL with
   * `was_imputed = 0`: inventing a global fallback would cross group
   * distributions, the exact thing per-group imputation exists to avoid.
   *
   * Scale shape: one exchange on the group for the median window over
   * observed rows; the |groups|-row median frame broadcasts back onto
   * the corpus (fill is map-side); nothing corpus-sized shuffles twice.
   */
  def medianImpute(df: DataFrame, idCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val observed = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).cast("long").as("__v"),
        col(idCol).as("__i"))
    val medians = observed
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__g").orderBy("__v", "__i")).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("__g")))
      .filter(col("__rk") === expr("(__n + 1) DIV 2"))
      .select(col("__g"), col("__v").as("__med"))
    df.select(col(idCol), col(groupCol), col(valueCol).cast("long").as("__raw"))
      .join(broadcast(medians), col(groupCol) === col("__g"), "left")
      .select(col(idCol), col(groupCol),
        coalesce(col("__raw"), col("__med")).as("value_filled"),
        (col("__raw").isNull && col("__med").isNotNull).cast("long")
          .as("was_imputed"))
  }

  /**
   * MIXTURE-DRIFT time series: each source's token share per week in
   * exact ppm plus the week-over-week delta — the composition monitor a
   * training-data pipeline watches so one source can't quietly take over
   * the mix between snapshots ([[graft.operators.TextAnalysis
   * .distributionDivergence]] answers the pairwise-static question; this
   * answers "when did it move"). Truncating integer shares mean Σshare
   * per week ≤ 1e6 with the deficit visible, never a float that
   * pretends to sum to one.
   *
   * Scale shape: one map-side-combined aggregate to the (snapshot,
   * source) grain, then windows over that |snapshots|·|sources| frame
   * only; the corpus is scanned once. `snapshotCol` is any ordinal
   * snapshot axis — an ingest week, a crawl generation, a release id.
   */
  def mixtureDrift(docs: DataFrame, sourceCol: String, snapshotCol: Column,
      tokenCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grain = docs
      .filter(snapshotCol.isNotNull)
      .groupBy(snapshotCol.as("snapshot"), col(sourceCol).as("source"))
      .agg(sum(tokenCol).as("n_tokens"))
    grain
      .withColumn("__wtot", sum("n_tokens").over(Window.partitionBy("snapshot")))
      .withColumn("share_ppm", expr("n_tokens * 1000000 DIV __wtot"))
      .withColumn("delta_ppm",
        col("share_ppm") - lag(col("share_ppm"), 1).over(
          Window.partitionBy("source").orderBy("snapshot")))
      .select(col("snapshot"), col("source"), col("n_tokens"),
        col("share_ppm"), col("delta_ppm"))
  }

  /**
   * QUANTILE PARITY audit (group-fairness check for a scored corpus):
   * each group's rank-exact median score next to the GLOBAL median and
   * the signed gap — "is any source/language systematically scored
   * low?" asked before a quality cut silently erases a slice of the
   * corpus. Medians are lower medians at rank `(n+1) DIV 2` (the x153
   * pick), so every number is engine-exact; the gap is in raw score
   * units, interpretable against the scoring scale.
   *
   * Scale shape: both medians are [[Analytics.lowerMedianByValue]] — a
   * map-side-combined (group, score) collapse, then cumulative counts
   * over the DISTINCT-SCORE frame only; the global median runs the same
   * collapsed shape unpartitioned (value-bounded, never row-sized). No
   * joins beyond the 1-row global broadcast.
   */
  def quantileParityAudit(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String): DataFrame = {
    val clean = df.filter(col(scoreCol).isNotNull)
      .select(col(groupCol).as("grp"), col(scoreCol).cast("long").as("__s"))
    val perGroup = Analytics.lowerMedianByValue(clean, Seq("grp"), "__s")
      .select(col("grp"), col("__n").as("n_rows"), col("__v").as("group_median"))
    val global = Analytics.lowerMedianByValue(clean, Nil, "__s")
      .select(col("__v").as("global_median"))
    perGroup.crossJoin(broadcast(global))
      .select(col("grp"), col("n_rows"), col("group_median"),
        col("global_median"),
        (col("group_median") - col("global_median")).as("median_gap"))
  }

  /**
   * K-ANONYMITY audit over quasi-identifier columns: group rows into
   * equivalence classes by the quasi-identifier tuple and report, per
   * candidate k, how many classes fall below k and how many rows sit in
   * them (the re-identifiable population) plus the smallest class — the
   * release-gate numbers a privacy review asks for before a dataset
   * ships. NULL quasi-values form their own class (SQL GROUP BY
   * semantics, identical in both engines): an unknown attribute is still
   * an attribute an attacker can match on.
   *
   * Scale shape: ONE map-side-combined aggregate to the class table
   * (bounded by distinct quasi-tuples), then a |ks|-row broadcast cross
   * join over that tiny frame — the corpus is scanned once, and nothing
   * downstream is row-bounded.
   */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
      ks: Seq[Int]): DataFrame = {
    require(quasiCols.nonEmpty && ks.nonEmpty && ks.forall(_ >= 1),
      "need quasi-identifier columns and positive k values")
    val spark = df.sparkSession
    import spark.implicits._
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__sz"))
    classes.crossJoin(broadcast(ks.toDF("k")))
      .groupBy("k")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("__sz") < col("k"), 1L).otherwise(0L))
          .as("n_classes_below_k"),
        sum(when(col("__sz") < col("k"), col("__sz")).otherwise(0L))
          .as("n_rows_at_risk"),
        min("__sz").as("min_class_size"))
  }

  /**
   * L-DIVERSITY audit — the sensitive-attribute complement of
   * [[kAnonymityAudit]] (Machanavajjhala et al., public technique):
   * k-anonymity bounds how few PEOPLE share a quasi-identifier class, but
   * a class where everyone shares the same SENSITIVE value still leaks it
   * ("homogeneity attack"). Per l, the classes whose distinct sensitive
   * count is below l and the rows exposed in them — the table that
   * decides whether a release needs further generalization.
   *
   * Scale shape: one (quasi..., sensitive) collapse, one class collapse,
   * then the ≤|classes| frame crosses the broadcast l list — no
   * per-row work past the first exchange; `countDistinct` rides the
   * pre-collapsed pairs so it is exact without an expand.
   */
  def lDiversityAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, ls: Seq[Int]): DataFrame = {
    require(quasiCols.nonEmpty && ls.nonEmpty && ls.forall(_ >= 1),
      "need quasi-identifier columns and positive l values")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = df.groupBy((quasiCols.map(col) :+ col(sensitiveCol)): _*)
      .agg(count(lit(1)).as("__n"))
    val classes = pairs.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__n")).as("__sz"), count(lit(1)).as("__ldiv"))
    classes.crossJoin(broadcast(ls.toDF("l")))
      .groupBy("l")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("__ldiv") < col("l"), 1L).otherwise(0L))
          .as("n_classes_below_l"),
        sum(when(col("__ldiv") < col("l"), col("__sz")).otherwise(0L))
          .as("n_rows_at_risk"),
        min("__ldiv").as("min_diversity"))
  }

  /**
   * T-CLOSENESS audit — the DISTRIBUTION-level member of the release
   * triad ([[kAnonymityAudit]] bounds class size, [[lDiversityAudit]]
   * bounds distinct sensitive values; Li et al.'s t-closeness, public
   * technique, bounds how far a class's sensitive DISTRIBUTION may sit
   * from the global one): even a large, diverse class leaks when its
   * distribution is skewed ("skewness attack" — everyone in the class is
   * *probably* high-income). Distance is the ordered-attribute Earth
   * Mover's Distance of the paper, `EMD = Σ_j |P_j/sz − G_j/N| / (m−1)`
   * over cumulative counts at each of the m ordered sensitive values —
   * computed EXACTLY as `1e6·Σ_j |N·P_j − sz·G_j| DIV ((m−1)·sz·N)` ppm
   * (one integer division per class, decimal-staged). Per threshold t
   * (ppm): classes whose EMD exceeds t and the rows exposed in them,
   * plus the corpus-wide max EMD.
   *
   * Scale shape: one (quasi, sensitive) collapse and one sensitive
   * collapse; the dense (class × value) grid is |classes|·m rows of
   * ALREADY-COLLAPSED data (the broadcast value spine joined under each
   * class), cumulated by a class-partitioned window; the ≤|classes| EMD
   * frame crosses the broadcast t list. m = 1 (a constant sensitive
   * column) reports EMD 0 for every class — there is nothing to leak.
   */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, tsPpm: Seq[Long]): DataFrame = {
    require(quasiCols.nonEmpty && tsPpm.nonEmpty
      && tsPpm.forall(t => t >= 0 && t <= 1000000L),
      "need quasi-identifier columns and thresholds in [0, 1e6] ppm")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df
      .select(quasiCols.map(col) :+ col(sensitiveCol).cast("long").as("__v"): _*)
      .filter(col("__v").isNotNull)
    val pairs = base.groupBy((quasiCols.map(col) :+ col("__v")): _*)
      .agg(count(lit(1)).as("__c"))
    val vals = pairs.groupBy("__v").agg(sum(col("__c")).as("__g"))
      .withColumn("__gc", sum(col("__g")).over(BoundedGlobalWindow
        .orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(pairs.agg(sum(col("__c")).as("__N"),
        countDistinct(col("__v")).as("__m"))))
    val classes = pairs.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).as("__sz"))
    val byClass = Window.partitionBy(quasiCols.map(col): _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val emd = classes
      .crossJoin(broadcast(vals.select("__v", "__gc", "__N", "__m")))
      .join(pairs, quasiCols :+ "__v", "left")
      .withColumn("__pc", sum(coalesce(col("__c"), lit(0L))).over(byClass))
      .groupBy((quasiCols.map(col) :+ col("__sz") :+ col("__N")
        :+ col("__m")): _*)
      .agg(sum(expr("""CAST(abs(CAST(__N AS DECIMAL(38,0)) * __pc
        - CAST(__sz AS DECIMAL(38,0)) * __gc) AS DECIMAL(38,0))"""))
        .as("__num"))
      .select(col("__sz"),
        expr("""CAST(CASE WHEN __m <= 1 THEN 0
             ELSE __num * 1000000
                  DIV (CAST(__m - 1 AS DECIMAL(38,0)) * __sz * __N)
             END AS BIGINT)""").as("__emd"))
    emd.crossJoin(broadcast(tsPpm.toDF("t_ppm")))
      .groupBy("t_ppm")
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("__emd") > col("t_ppm"), 1L).otherwise(0L))
          .as("n_classes_above_t"),
        sum(when(col("__emd") > col("t_ppm"), col("__sz")).otherwise(0L))
          .as("n_rows_at_risk"),
        max(col("__emd")).as("max_emd_ppm"))
      .orderBy("t_ppm")
  }

  /**
   * CONTRIBUTION-BOUNDED aggregate — the user-level clamp every
   * differential-privacy (and abuse-robust analytics) pipeline applies
   * BEFORE aggregating: each user contributes at most `maxPerUser` events
   * (their first `maxPerUser` by (ts, id) — deterministic, not sampled),
   * so no single key can dominate a statistic. Emits per-type raw vs
   * bounded counts plus how many users were clamped — the sensitivity
   * readout that tells you what the bound cost.
   *
   * Scale shape: ONE exchange on the user key; the rank window and the
   * per-user clamp-flag aggregate share it, and the per-type rollups are
   * map-side-combined aggregates over the already-partitioned rows. NULL
   * users pass through UNBOUNDED by SQL-window accident in naive
   * implementations — here they are excluded explicitly (a NULL key is
   * not a user; bounding "them" as one pseudo-user would silently drop
   * real events).
   */
  def boundedContribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, maxPerUser: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxPerUser >= 1, s"maxPerUser $maxPerUser must be positive")
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val ranked = events.filter(col(userCol).isNotNull)
      .withColumn("__rk", row_number().over(byUser))
    ranked.groupBy(col(typeCol).as("event_type"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(col("__rk") <= maxPerUser, 1L).otherwise(0L)).as("n_bounded"),
        countDistinct(when(col("__rk") > maxPerUser, col(userCol)))
          .as("n_users_clamped"))
  }

  /**
   * IQR OUTLIER audit per group — the Tukey-fence data-quality gate in
   * exact integer arithmetic: rank-exact quartiles from the
   * VALUE-COLLAPSED cumulative counts (`4·cum ≥ n` / `4·cum ≥ 3n` — the
   * [[Analytics.lowerMedianByValue]] shape, so the quartile windows run
   * over distinct values, never rows), fences at `q ∓ (3·IQR) DIV 2`
   * (the 1.5×IQR rule kept integral), and per-group counts outside each
   * fence. Quarantine counts, not dropped rows — the release decision
   * stays with the caller, the audit just prices it.
   *
   * Scale shape: one map-side-combined (group, value) collapse, one
   * group-partitioned window pair over the collapsed frame, then ONE
   * corpus re-scan against the broadcast |groups|-row fence table.
   */
  def iqrOutlierAudit(df: DataFrame, groupCol: String,
      valueCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clean = df.filter(valueCol.isNotNull)
      .select(col(groupCol).as("grp"), valueCol.cast("long").as("__v"))
    val gv = clean.groupBy("grp", "__v").agg(count(lit(1)).as("__c"))
    val cum = gv
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy("grp").orderBy("__v")))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy("grp")))
    val fences = cum.groupBy("grp")
      .agg(max(col("__n")).as("n"),
        min(when(col("__cum") * 4 >= col("__n"), col("__v"))).as("q1"),
        min(when(col("__cum") * 4 >= col("__n") * 3, col("__v"))).as("q3"))
      .select(col("grp"), col("n"), col("q1"), col("q3"),
        expr("q1 - (3 * (q3 - q1)) DIV 2").as("lo_fence"),
        expr("q3 + (3 * (q3 - q1)) DIV 2").as("hi_fence"))
    clean.join(broadcast(fences), "grp")
      .groupBy("grp")
      .agg(max(col("n")).as("n"), max(col("q1")).as("q1"),
        max(col("q3")).as("q3"),
        max(col("lo_fence")).as("lo_fence"), max(col("hi_fence")).as("hi_fence"),
        sum(when(col("__v") < col("lo_fence"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("__v") > col("hi_fence"), 1L).otherwise(0L)).as("n_high"))
  }

  /**
   * MARKET-BASKET pair mining: support counts for item PAIRS co-occurring
   * in a basket (order), the frequent-itemset primitive behind
   * "bought together" — distinct from user-level co-occurrence lift
   * (x73), which pools a user's whole history; a basket is one checkout.
   *
   * Scale shape: collapse to DISTINCT (basket, item) first, CAP basket
   * width at `maxBasketItems` (an oversized basket contributes O(w²)
   * pairs — one pathological 1e4-item basket is 5e7 rows; the cap is the
   * df-cap discipline from the dedup joins, stated not silent), then the
   * per-basket self-join is bounded by cap² per basket. Support filter +
   * TakeOrdered top-k close it out.
   */
  /**
   * DIRECTIONAL basket confidence — for the top co-occurring item pairs,
   * BOTH conditional rates side by side: `conf(A→B) = n_AB·1e6 DIV n_A`
   * and `conf(B→A)`. Support (x185) is symmetric; recommendations are
   * not — 90 % of protector buyers own the phone, almost no phone
   * buyers add the protector, and only the directional pair shows which
   * way the recommendation should point.
   *
   * Scale shape: [[basketPairs]]'s bounded self-join for the pair
   * counts, plus one item-keyed basket count joined back (hash joins on
   * the collapsed item frame). Divisions are single and positive.
   */
  def basketConfidence(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasketItems: Int = 100,
      topK: Int = 20): DataFrame = {
    val items = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val itemCounts = items.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    basketPairs(df, basketCol, itemCol, minSupport, maxBasketItems, topK)
      .join(itemCounts.select(col("__i").as("item1"), col("__ni").as("__n1")),
        "item1")
      .join(itemCounts.select(col("__i").as("item2"), col("__ni").as("__n2")),
        "item2")
      .select(col("item1"), col("item2"), col("support"),
        expr("support * 1000000 DIV __n1").as("conf_1_to_2_ppm"),
        expr("support * 1000000 DIV __n2").as("conf_2_to_1_ppm"))
      .orderBy(col("support").desc, col("item1"), col("item2"))
  }

  def basketPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasketItems: Int = 100,
      topK: Int = 20): DataFrame = {
    require(minSupport >= 1 && maxBasketItems >= 2 && topK >= 1,
      "minSupport/maxBasketItems/topK must be positive (basket width >= 2)")
    val items = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val sized = items
      .withColumn("__w", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__b")))
      .filter(col("__w") <= maxBasketItems)
    sized.as("a")
      .join(sized.as("b"),
        col("a.__b") === col("b.__b") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item1"), col("b.__i").as("item2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .orderBy(col("support").desc, col("item1"), col("item2"))
      .limit(topK)
  }

  /**
   * FILTER-OVERLAP (leave-one-out) audit — before committing a curation
   * filter stack, which filters actually matter? For each named kill
   * predicate: how many docs it kills, and how many it kills UNIQUELY
   * (no other filter would catch them) — the filter whose unique-kill
   * count is ~0 is redundant and can be dropped without changing the
   * surviving corpus. The SET-ANALYSIS complement of the sequential
   * filter funnel (x84), which by construction hides overlap behind
   * application order.
   *
   * Scale shape: ONE corpus scan evaluates every predicate into a flag
   * vector (row-local; any predicate needing its own exchange — e.g. a
   * dup-family flag — is the caller's input column), then one
   * map-side-combined aggregate of 2·|filters|+2 counters. Output is
   * |filters|+1 rows (the "(any)" summary row carries total/killed).
   */
  def filterOverlap(df: DataFrame, filters: Seq[(String, Column)]): DataFrame = {
    require(filters.nonEmpty, "filterOverlap needs at least one filter")
    val flagged = df.select(filters.map { case (n, p) =>
      when(p, 1L).otherwise(0L).as(s"__f_$n")
    }: _*)
      .withColumn("__nkill",
        filters.map(f => col(s"__f_${f._1}")).reduce(_ + _))
    val aggs = filters.flatMap { case (n, _) =>
      Seq(sum(col(s"__f_$n")).as(s"__k_$n"),
        sum(when(col(s"__f_$n") === 1 && col("__nkill") === 1, 1L).otherwise(0L))
          .as(s"__u_$n"))
    } :+ sum(when(col("__nkill") > 0, 1L).otherwise(0L)).as("__any")
    val one = flagged.agg(count(lit(1)).as("__total"), aggs: _*)
    val rows = filters.map { case (n, _) =>
      struct(lit(n).as("filter"), col(s"__k_$n").as("n_killed"),
        col(s"__u_$n").as("n_unique_kill"),
        expr(s"__k_$n * 1000000 DIV __total").as("kill_ppm"))
    } :+ struct(lit("(any)").as("filter"), col("__any").as("n_killed"),
      col("__any").as("n_unique_kill"),
      expr("__any * 1000000 DIV __total").as("kill_ppm"))
    one.select(inline(array(rows: _*)))
  }

  /**
   * SMALL-CELL SUPPRESSION for publishable aggregates — the
   * disclosure-control step after a k-anonymity AUDIT (x154) says "these
   * cells are unsafe": every (group, dim) cell with fewer than
   * `minCellSize` members is merged into the dim's "(suppressed)" bucket,
   * so no published count identifies a small cohort while PER-DIM TOTALS
   * ARE PRESERVED EXACTLY (Σ published = Σ raw within each dim —
   * suppression relocates counts, never deletes them; invariant-tested).
   * A dim whose small cells sum to fewer than `minCellSize` members still
   * publishes the bucket — the bucket is categorical ("small cohorts
   * live here"), not a cell that must itself pass k.
   *
   * Scale shape: one exchange to (group, dim) counts with map-side
   * partials; the suppression rewrite is a row-local CASE; the re-merge
   * aggregate is bounded by the published cell count. Nothing row-scale
   * after the first collapse.
   */
  def cellSuppression(df: DataFrame, groupCol: String, dimCol: String,
      minCellSize: Long = 10L): DataFrame = {
    require(minCellSize >= 1, s"minCellSize $minCellSize must be positive")
    df.filter(col(groupCol).isNotNull && col(dimCol).isNotNull)
      .groupBy(col(groupCol), col(dimCol)).agg(count(lit(1)).as("__n"))
      .select(
        when(col("__n") < minCellSize, lit("(suppressed)"))
          .otherwise(col(groupCol).cast("string")).as(groupCol),
        col(dimCol), col("__n"))
      .groupBy(col(groupCol), col(dimCol))
      .agg(sum(col("__n")).as("n"))
  }

  /**
   * FREQUENT ITEM TRIPLES via the APRIORI candidate cut — the size-3
   * extension of [[basketPairs]] with the pruning that makes it feasible:
   * a triple can only be frequent if ALL THREE of its pairs are
   * (downward closure), so candidates are generated by joining frequent
   * pairs sharing their first item and semi-checking the third pair —
   * never by enumerating per-basket item triples, whose O(w³) fan-out is
   * the naive killer. Only candidate triples are then support-counted
   * against the (width-capped, frequent-item-restricted) basket rows.
   *
   * Scale shape: the pair census is [[basketPairs]]'s bounded join; the
   * candidate join runs on the FREQUENT-pair frame (support-floored,
   * orders of magnitude smaller than the pair stream); the final count
   * joins basket items three ways but each side is semi-filtered to
   * frequent items first and the triple stream is semi-filtered to
   * candidates before aggregation. Stated caps: basket width, support
   * floor, top-k.
   */
  def frequentTriples(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L, maxBasketItems: Int = 100,
      topK: Int = 20): DataFrame = {
    require(minSupport >= 1 && maxBasketItems >= 3 && topK >= 1,
      "minSupport/maxBasketItems/topK must be positive (basket width >= 3)")
    val items = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val sized = items
      .withColumn("__w", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__b")))
      .filter(col("__w") <= maxBasketItems)
      .select("__b", "__i")
      // cached: the pair census and all three legs of the triple count
      // read it. Caller-managed lifecycle — see coOccurrenceLift.
      .cache()
    val fpairs = sized.as("a")
      .join(sized.as("b"),
        col("a.__b") === col("b.__b") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("p"), col("b.__i").as("q"))
      .agg(count(lit(1)).as("__sup"))
      .filter(col("__sup") >= minSupport)
      .select("p", "q")
      // cached: candidate generation reads it three times. Same contract.
      .cache()
    // Apriori join: (a,b) ⋈ (a,c), b < c, require (b,c) frequent too
    val cands = fpairs.as("x")
      .join(fpairs.as("y"), col("x.p") === col("y.p") && col("x.q") < col("y.q"))
      .select(col("x.p").as("i1"), col("x.q").as("i2"), col("y.q").as("i3"))
      .join(fpairs.select(col("p").as("i2"), col("q").as("i3")),
        Seq("i2", "i3"), "left_semi")
    val fitems = fpairs.select(col("p").as("__i"))
      .unionAll(fpairs.select(col("q").as("__i"))).distinct()
    val fi = sized.join(fitems, Seq("__i"), "left_semi")
    fi.as("a")
      .join(fi.as("b"), col("a.__b") === col("b.__b") && col("a.__i") < col("b.__i"))
      .join(fi.as("c"), col("b.__b") === col("c.__b") && col("b.__i") < col("c.__i"))
      .select(col("a.__i").as("i1"), col("b.__i").as("i2"), col("c.__i").as("i3"))
      .join(broadcast(cands), Seq("i1", "i2", "i3"), "left_semi")
      .groupBy("i1", "i2", "i3")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .orderBy(col("support").desc, col("i1"), col("i2"), col("i3"))
      .limit(topK)
  }

  /**
   * "ALSO BOUGHT" recommendation table — for each of the `nAnchors`
   * highest-volume items, the `nRecs` items most often sharing a basket
   * with it: the item-item collaborative-filtering primitive served
   * behind every product page. Directed view of [[basketPairs]]'s
   * co-occurrence (an anchor's recommendations are ranked FROM the
   * anchor's perspective, so both directions of each pair matter).
   *
   * Scale shape: the anchor set is a TakeOrdered top-n (never a global
   * sort) broadcast as a semi-join filter BEFORE the pair join — so the
   * per-basket fan-out is anchors-only (≤ basket width · nAnchors per
   * basket), not the full O(w²) pair stream; the rank window partitions
   * by anchor, bounded frames throughout.
   */
  def alsoBought(df: DataFrame, basketCol: String, itemCol: String,
      nAnchors: Int = 5, nRecs: Int = 3): DataFrame = {
    require(nAnchors >= 1 && nRecs >= 1, "nAnchors and nRecs must be positive")
    val items = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
      // cached: anchor census + both sides of the pair join read it.
      // Caller-managed lifecycle — see coOccurrenceLift.
      .cache()
    val anchors = items.groupBy(col("__i").as("anchor"))
      .agg(count(lit(1)).as("anchor_baskets"))
      .orderBy(col("anchor_baskets").desc, col("anchor"))
      .limit(nAnchors)
    val anchorSide = items
      .join(broadcast(anchors.select(col("anchor").as("__i"))), Seq("__i"), "left_semi")
    val support = anchorSide.as("a")
      .join(items.as("o"),
        col("a.__b") === col("o.__b") && col("a.__i") =!= col("o.__i"))
      .groupBy(col("a.__i").as("anchor"), col("o.__i").as("rec"))
      .agg(count(lit(1)).as("support"))
    val byAnchor = org.apache.spark.sql.expressions.Window
      .partitionBy("anchor").orderBy(col("support").desc, col("rec"))
    support.withColumn("rank", row_number().over(byAnchor).cast("long"))
      .filter(col("rank") <= nRecs)
      .join(broadcast(anchors), "anchor")
      .select(col("anchor"), col("anchor_baskets"), col("rank"), col("rec"),
        col("support"))
  }

  /**
   * TEMPERATURE-SCALED mixture weights — the standard multilingual /
   * multi-source sampling correction (public: the p^α upweighting of
   * low-resource groups used since multilingual BERT's exponential
   * smoothing): sampling weight ∝ count^τ at τ = 1/2, computed as the
   * EXACT integer square root (largest s with s² ≤ count — floor(IEEE
   * sqrt) post-corrected by ±1, so no correctly-rounded-sqrt assumption
   * crosses engines; counts < 2⁵² keep the double representation exact).
   * Reports, per group: the natural share (ppm), the τ-tempered share
   * (ppm), and the sampling boost ratio (milli) — >1000 means the
   * group is oversampled relative to its natural frequency. A group so
   * small its natural share FLOORS to 0 ppm (< 1 ppm of total tokens —
   * exactly the low-resource case the operator targets) reports
   * boost_milli = 0 explicitly: the floored ratio is meaningless there,
   * and the guard replaces a NULL-vs-error cross-engine divergence
   * (Spark x/0 → NULL, DuckDB // 0 → error) with a stated convention.
   *
   * Scale shape: one corpus-sized groupBy; everything after rides the
   * |groups|-bounded frame with a broadcast total.
   */
  def temperatureMixtureWeights(docs: DataFrame, groupCol: String,
      weightCol: Column): DataFrame = {
    val g = docs.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(sum(weightCol.cast("long")).as("n_tokens"))
      // exact isqrt: floor(sqrt(x)) from IEEE sqrt, corrected so
      // s*s <= x < (s+1)*(s+1) holds exactly in integers
      .withColumn("__s0", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
      .withColumn("__sq",
        when((col("__s0") + 1) * (col("__s0") + 1) <= col("n_tokens"), col("__s0") + 1)
          .when(col("__s0") * col("__s0") > col("n_tokens"), col("__s0") - 1)
          .otherwise(col("__s0")))
    val tot = g.agg(sum(col("n_tokens")).as("__tn"), sum(col("__sq")).as("__ts"))
    g.crossJoin(broadcast(tot))
      .select(col("grp"), col("n_tokens"),
        expr("n_tokens * 1000000 DIV __tn").as("natural_ppm"),
        expr("__sq * 1000000 DIV __ts").as("tempered_ppm"))
      .withColumn("boost_milli",
        expr("CASE WHEN natural_ppm = 0 THEN 0 " +
          "ELSE tempered_ppm * 1000 DIV natural_ppm END"))
      .orderBy("grp")
  }

  /**
   * BATCH-PADDING strategy comparison — the measured answer to "is
   * length-sorted batching worth it on THIS corpus": fixed-count batches
   * of `batchSize` docs, each padded to its own max token length (the
   * trailing partial batch at its actual size), under two deterministic
   * orders — `hash` (the shuffled-dataloader baseline, portable md5
   * order) and `sorted` (ascending token length, the bucketed-batching
   * ideal). Per strategy: batches, real tokens, padded capacity, waste
   * ppm. [[paddingWasteByBucket]] reports waste against FIXED bucket
   * boundaries; this reports it against the batching policy itself.
   *
   * Scale shape: two [[Sampling.globalRankRange]] two-phase ranks (never
   * a single global sort task), two batch collapses, a 2-row report.
   * Ties in either order break by id, so both engines batch
   * identically.
   */
  def batchPaddingStrategies(df: DataFrame, idCol: String, tokenLen: Column,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    val base = df
      .select(col(idCol).as("__id"), tokenLen.cast("long").as("__len"))
      .filter(col("__id").isNotNull && col("__len").isNotNull
        && col("__len") > 0L)
    def wasteFor(name: String, ordered: DataFrame): DataFrame =
      ordered
        .withColumn("__b", expr(s"(global_rank - 1) DIV $batchSize"))
        .groupBy("__b")
        .agg(count(lit(1)).as("__n"), sum(col("__len")).as("__sum"),
          max(col("__len")).as("__max"))
        .agg(count(lit(1)).as("n_batches"),
          coalesce(sum(col("__sum")), lit(0L)).as("sum_tokens"),
          coalesce(sum(col("__n") * col("__max")), lit(0L)).as("padded_tokens"))
        .select(lit(name).as("strategy"), col("n_batches"),
          col("sum_tokens"), col("padded_tokens"),
          expr("""CAST(CASE WHEN padded_tokens = 0 THEN 0
               ELSE (padded_tokens - sum_tokens) * 1000000
                    DIV padded_tokens END AS BIGINT)""").as("waste_ppm"))
    val hashOrder = Sampling.globalRankRange(
        base.select(col("__id"), PortableHash.hash60(col("__id")).as("__o")),
        "__id", "__o")
      .select(col("__id"), col("global_rank")).join(base, "__id")
    val sortedOrder = Sampling.globalRankRange(
        base.select(col("__id"), col("__len").as("__o")), "__id", "__o")
      .select(col("__id"), col("global_rank")).join(base, "__id")
    wasteFor("hash", hashOrder).unionAll(wasteFor("sorted", sortedOrder))
      .orderBy("strategy")
  }

  /**
   * PADDING-WASTE census by power-of-two length bucket — the batching
   * efficiency table a training pipeline reads before fixing its bucket
   * boundaries: sequences padded to the next power of two ≥ their token
   * length (floored at `minBucket`), and per bucket the fraction of the
   * padded capacity that is padding. Waste above ~30% in a bucket says
   * split it; a near-empty bucket says merge it. The power-of-two ceiling
   * is exact integer doubling (no float log anywhere), so the oracle
   * reproduces the bucketing bit-for-bit.
   *
   * Scale shape: the bucket is a map-side expression (a ≤ 16-arm CASE
   * over doublings); one |buckets|-bounded aggregate ends the plan.
   */
  def paddingWasteByBucket(docs: DataFrame, tokenLen: Column,
      minBucket: Int = 16, maxBucket: Int = 65536): DataFrame = {
    require(minBucket >= 1 && Integer.bitCount(minBucket) == 1,
      "minBucket must be a power of two")
    require(maxBucket >= minBucket && Integer.bitCount(maxBucket) == 1,
      "maxBucket must be a power of two above minBucket")
    val caps = Iterator.iterate(minBucket.toLong)(_ * 2)
      .takeWhile(_ <= maxBucket.toLong).toSeq
    val bucket = caps.init.foldRight(lit(caps.last): Column) { (c, acc) =>
      when(col("__len") <= c, c).otherwise(acc)
    }
    docs.select(tokenLen.cast("long").as("__len"))
      .filter(col("__len").isNotNull && col("__len") > 0L
        && col("__len") <= maxBucket.toLong)
      .withColumn("__b", bucket)
      .groupBy(col("__b").as("bucket_cap"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__len")).as("sum_tokens"))
      .select(col("bucket_cap"), col("n_docs"), col("sum_tokens"),
        (col("bucket_cap") * col("n_docs")).as("padded_tokens"),
        expr("(bucket_cap * n_docs - sum_tokens) * 1000000" +
          " DIV (bucket_cap * n_docs)").as("waste_ppm"))
      .orderBy("bucket_cap")
  }

  /**
   * QUALITY-GATED curation run — the "is my classifier good enough to
   * gate on" loop a training-data pipeline runs BEFORE trusting its own
   * quality score as a filter, composed from the statistical gates:
   * (1) [[Analytics.cochranArmitageTrend]] over the score bins asks
   * whether the true-positive rate actually RISES with the score (a
   * calibration table shows per-bin gaps; this is the one-number
   * dose–response verdict); (2) per bin, a 2×2 χ² enrichment test
   * against the rest of the corpus, converted to the distribution-free
   * Chebyshev bound p ≤ 1/z² (the [[Analytics.dunnPosthoc]] convention —
   * conservative, so a rejection is a certificate); (3)
   * [[Analytics.benjaminiHochberg]] controls FDR across the bins; (4)
   * the filter threshold is DECIDED from the gated table — τ* = the
   * smallest bin from which EVERY bin upward is BH-rejected AND
   * enriched — and applied as the score-gate stage of a
   * [[filterFunnel]]-style report. When the trend verdict is not
   * 'rising' or no bin qualifies, the gate is DISABLED (τ* = −1, the
   * stage passes everything): a pipeline must not filter on a
   * classifier that failed its own validation.
   *
   * Returns 3 funnel rows (`stage`, `n_in`, `n_out`), each carrying the
   * decision (`tau_bin`, `trend_verdict`): s1_labeled (non-null score
   * bin + label), s2_score_gate (bin ≥ τ*), s3_final (`finalKeep`).
   *
   * Scale shape: ONE corpus scan builds the bin table
   * (vocabulary-bounded) and the trend verdict rides its moments
   * (the value-collapsed [[Analytics.cochranArmitageTrendFromBins]] —
   * exactly equal to the row form, no second scan); the BH rank and the
   * suffix-AND decision windows ride the ≤|bins| test-family frame
   * ([[BoundedGlobalWindow]]); ONE final corpus scan computes every
   * funnel count with the 1-row decision broadcast — never a per-stage
   * pass. DECIMAL(38,0) staging of the χ² (numerator 1000·N·diff²,
   * diff ≤ N²) bounds validity at ~10⁶ labeled rows — documented; at
   * 100 TB the calibration set is a labeled SAMPLE, not the corpus.
   */
  def qualityGatedCuration(df: DataFrame, scoreBin: Column, positive: Column,
      finalKeep: Column, alphaPpm: Long = 50000L): DataFrame = {
    val base = df.select(scoreBin.cast("long").as("__w"),
      positive.cast("boolean").as("__y"), finalKeep.cast("boolean").as("__f"))
    val labeled = base.filter(col("__w").isNotNull && col("__y").isNotNull)
    val bins = labeled.groupBy("__w")
      .agg(count(lit(1)).as("__nb"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__eb"))
    // the trend moments are exactly derivable from the bin table, so the
    // row-form's second corpus scan is saved ([[Analytics.cochranArmitageTrendFromBins]])
    val trend = Analytics
      .cochranArmitageTrendFromBins(bins, col("__w"), col("__nb"), col("__eb"))
      .select(col("verdict").as("__tv"))
    val tot = bins.agg(coalesce(sum(col("__nb")), lit(0L)).as("__tn"),
      coalesce(sum(col("__eb")), lit(0L)).as("__te"))
    // per-bin 2×2 vs the rest: diff = e_b·N − n_b·E carries the sign of
    // ad−bc, χ²_milli = 1000·N·diff² DIV (n_b·(N−n_b)·E·(N−E)); quotient
    // ≤ 1000·N so the BIGINT result of DIV cannot wrap under the bound
    val tests = bins.crossJoin(broadcast(tot))
      .withColumn("__diff", expr(
        "CAST(__eb AS DECIMAL(38,0)) * __tn - CAST(__nb AS DECIMAL(38,0)) * __te"))
      .withColumn("__den2", expr(
        """CAST(__nb AS DECIMAL(38,0)) * (__tn - __nb)
           * (CAST(__te AS DECIMAL(38,0)) * (__tn - __te))"""))
      .select(col("__w"), col("__w").cast("string").as("bin"),
        (col("__diff") > 0).cast("int").as("__enr"),
        expr("""CAST(CASE WHEN __den2 <= 0 THEN 0
             ELSE 1000 * CAST(__tn AS DECIMAL(38,0)) * __diff * __diff
                  DIV __den2 END AS BIGINT)""").as("__z2"))
      .withColumn("p_ppm", expr(
        """CASE WHEN __z2 <= 0 THEN 1000000
           ELSE LEAST(1000000, 1000000000 DIV __z2) END"""))
    val suffix = BoundedGlobalWindow.orderBy(col("__w"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val gated = Analytics
      .benjaminiHochberg(tests, "bin", "p_ppm", alphaPpm,
        carryCols = Seq("__w", "__enr"))
      .withColumn("__q", min(when(col("rejected") === 1 && col("__enr") === 1,
        lit(1)).otherwise(lit(0))).over(suffix))
    val tau = gated.agg(min(when(col("__q") === 1, col("__w"))).as("__tau"))
    val decision = tau.crossJoin(broadcast(trend))
      .select(when(col("__tv") === "rising" && col("__tau").isNotNull,
          col("__tau")).otherwise(lit(-1L)).as("tau_bin"),
        col("__tv").as("trend_verdict"))
    val counts = base.crossJoin(broadcast(decision))
      .agg(count(lit(1)).as("__n0"),
        sum(when(col("__w").isNotNull && col("__y").isNotNull, 1L)
          .otherwise(0L)).as("__n1"),
        sum(when(col("__w").isNotNull && col("__y").isNotNull
          && (col("tau_bin") < 0 || col("__w") >= col("tau_bin")), 1L)
          .otherwise(0L)).as("__n2"),
        sum(when(col("__w").isNotNull && col("__y").isNotNull
          && (col("tau_bin") < 0 || col("__w") >= col("tau_bin"))
          && col("__f"), 1L).otherwise(0L)).as("__n3"),
        first(col("tau_bin")).as("tau_bin"),
        first(col("trend_verdict")).as("trend_verdict"))
    counts.select(explode(array(
        struct(lit("s1_labeled").as("stage"),
          col("__n0").as("n_in"), col("__n1").as("n_out")),
        struct(lit("s2_score_gate").as("stage"),
          col("__n1").as("n_in"), col("__n2").as("n_out")),
        struct(lit("s3_final").as("stage"),
          col("__n2").as("n_in"), col("__n3").as("n_out")))).as("s"),
        col("tau_bin"), col("trend_verdict"))
      .select(col("s.stage").as("stage"), col("s.n_in").as("n_in"),
        col("s.n_out").as("n_out"), col("tau_bin"), col("trend_verdict"))
      .orderBy("stage")
  }
}
