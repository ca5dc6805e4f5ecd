package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling operators for training-data pipelines (extends the
 * key-modulo sample/shard of `Extensions` x20 with per-stratum control).
 */
object Sampling {

  /** Spread a narrower-than-parallelism input across the cluster before a
    * per-row FAN-OUT (resample/permutation explode + md5): the fan-out is
    * map-side, so with a one-split input (the test rig's single parquet
    * file) every hash of the nResamples× blow-up would otherwise be
    * computed on ONE core before the first exchange (the r9 x167 lesson
    * applied to the bootstrap family). One n-row exchange of the already
    * column-pruned frame, content-identical; skipped when the input
    * carries enough splits (any at-scale scan does). */
  private def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  /**
   * Exact stratified sampling: from every `stratumCol` group keep the same
   * fraction `num/den` of rows (ceiling), chosen by a deterministic
   * content-independent hash order (md5 of the id) — so the sample is
   * reproducible across runs AND engines, unbiased w.r.t. any data column,
   * and exactly proportional per stratum (unlike Bernoulli `sample()`,
   * whose per-stratum counts fluctuate).
   *
   * The fraction is a rational `num/den` and selection uses pure integer
   * arithmetic (`(rank-1) * den < n * num`  ⇔  rank ≤ ceil(n*num/den)) —
   * float `ceil(n * 0.1)` differs between engines when the product lands on
   * a representation boundary.
   *
   * Scale shape: one hash exchange on the stratum key, then two window
   * passes over each stratum partition (count + rank). No driver action,
   * no global sort; each stratum samples independently.
   */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"fraction $num/$den not in (0,1]")
    val byHash = Window.partitionBy(stratumCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val whole = Window.partitionBy(stratumCol)
    df.withColumn("rnk", row_number().over(byHash))
      .withColumn("n_stratum", count(lit(1)).over(whole))
      // rnk is IntegerType: widen before multiplying or (rnk-1)*den wraps
      // past ~Int.MaxValue/den rows per stratum and silently over-samples
      .filter((col("rnk").cast("long") - 1) * den < col("n_stratum") * num)
      .select(col(idCol), col(stratumCol))
  }

  /**
   * Percentile band trim: within every stratum keep only rows whose
   * `valueCol` rank falls in the (lowPct, highPct] percentile band —
   * outlier removal by exact rank (Gopher-style length filtering when the
   * value is a token count). Pure integer band edges
   * (`rn*100 > lowPct*n`, `rn*100 <= highPct*n`) are engine-identical;
   * ties order by (`valueCol`, `idCol`) deterministically.
   *
   * Scale shape: one stratum exchange + one window pass, like
   * [[stratifiedSample]].
   */
  /**
   * Per-group cap: keep the top `k` rows of every `groupCol` group ranked
   * by (`score` desc, `idCol` asc) — the web-corpus "at most K documents
   * per domain, best quality first" rule that stops a single crawled host
   * from dominating the training mix. The score is any deterministic
   * Column (typically a quality score), emitted as `score` alongside the
   * id and group.
   *
   * Scale shape: one hash exchange on the group key + one window pass.
   * row_number (not rank) caps a hot domain at exactly k regardless of
   * score ties, so no group can exceed its budget — the property that
   * bounds every downstream stage.
   */
  def topKPerGroup(df: DataFrame, idCol: String, groupCol: String,
      score: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be positive")
    val ranked = Window.partitionBy(groupCol)
      .orderBy(col("score").desc, col(idCol))
    df.withColumn("score", score)
      .withColumn("rnk", row_number().over(ranked))
      .filter(col("rnk") <= k)
      .select(col(idCol), col(groupCol), col("score"))
  }

  /**
   * Distributed global row numbering by (`valueCol`, `idCol`) — the
   * scale-safe form of `ROW_NUMBER() OVER (ORDER BY value, id)`. The naive
   * global window funnels the whole dataset through ONE task (Spark even
   * warns); this operator never globally sorts the data: it aggregates
   * per-VALUE counts (one exchange, map-side partials), prefix-sums them in
   * a single-partition window over the DISTINCT VALUES ONLY (tiny by the
   * operator's contract — lengths, scores, bucketed keys), broadcasts the
   * offsets back, and ranks within each value group locally
   * (rank = offset(value) + intra-value row_number).
   *
   * Contract: `valueCol` must be low-cardinality relative to the corpus
   * (a 100 TB corpus has ~10⁵ distinct lengths — KBs of offsets). For
   * high-cardinality keys use range partitioning + per-partition offsets
   * instead; this operator `require`s nothing at plan time because
   * cardinality is a data property, but the offset frame is broadcast, so
   * a contract violation fails loudly in the broadcast size check rather
   * than silently serializing the corpus through one task.
   *
   * NULL values rank first (Spark's default ascending null order), as one
   * group: the offsets join is NULL-SAFE (`<=>`), so null-valued rows get
   * ranks instead of silently dropping out of an inner equi-join.
   */
  def globalRankByValue(df: DataFrame, idCol: String, valueCol: String): DataFrame = {
    val counts = df.groupBy(valueCol).agg(count(lit(1)).as("cnt"))
    val offsets = counts
      .withColumn("cum_before",
        sum(col("cnt")).over(BoundedGlobalWindow.orderBy(valueCol)) - col("cnt"))
      .select(col(valueCol).as("_rank_value"), col("cum_before"))
    val intra = Window.partitionBy(valueCol).orderBy(idCol)
    df.select(col(idCol), col(valueCol))
      .withColumn("lr", row_number().over(intra).cast("long"))
      .join(broadcast(offsets), col(valueCol) <=> col("_rank_value"))
      .select(col(idCol), col(valueCol),
        (col("cum_before") + col("lr")).as("global_rank"))
  }

  /**
   * Distributed global row numbering for HIGH-cardinality keys — the
   * complement of [[globalRankByValue]] (whose offsets frame assumes few
   * distinct values): range-partition by (`valueCol`, `idCol`), rank
   * locally inside each range, and add the exclusive prefix sum of
   * per-partition counts. Range partitions are ordered and contiguous, so
   * offset(pid) + local_rank IS the global ROW_NUMBER — and the result is
   * independent of where the sampled range boundaries land, which is what
   * makes the operator deterministic even though `repartitionByRange`
   * picks boundaries by sampling.
   *
   * Scale shape: one range exchange of the corpus + one pid-local window;
   * the per-partition count frame (one row per partition) takes the only
   * single-partition hop. The corpus is never funneled through one task.
   */
  def globalRankRange(df: DataFrame, idCol: String, valueCol: String,
      partitions: Int = 0): DataFrame = {
    val keys = Seq(col(valueCol), col(idCol))
    val parted = (if (partitions > 0) df.repartitionByRange(partitions, keys: _*)
      else df.repartitionByRange(keys: _*))
      .select(col(idCol), col(valueCol))
      .withColumn("pid", spark_partition_id())
    val local = parted.withColumn("lr",
      row_number().over(Window.partitionBy("pid").orderBy(keys: _*)).cast("long"))
    val offsets = local.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .withColumn("offset", sum(col("cnt")).over(BoundedGlobalWindow.orderBy("pid")) - col("cnt"))
      .select(col("pid").as("_off_pid"), col("offset"))
    local.join(broadcast(offsets), col("pid") === col("_off_pid"))
      .select(col(idCol), col(valueCol), (col("offset") + col("lr")).as("global_rank"))
  }

  /**
   * Budget-constrained greedy selection via DISTRIBUTED PREFIX SUMS — keep
   * documents in (densityCol desc, id) order until the global running token
   * total passes `budget`: the knapsack-greedy "best quality per token
   * under a budget" corpus cut. The cumulative sum uses
   * [[globalRankRange]]'s two-phase shape with SUM in place of COUNT:
   * range-partition on the order keys, sum locally per partition, add the
   * exclusive prefix of per-partition totals (a one-row-per-partition
   * frame — the only single-partition hop). The kept set depends only on
   * the total order (unique — ties broken by id), NOT on where the sampled
   * range boundaries land, so the output is deterministic and
   * partitioning-independent. A naive global `SUM OVER (ORDER BY …)`
   * funnels the corpus through one task; this never does.
   */
  def budgetedSelection(df: DataFrame, idCol: String, tokenCol: String,
      densityCol: String, budget: Long, partitions: Int = 0): DataFrame = {
    val keys = Seq(col(densityCol).desc, col(idCol).asc)
    val parted = (if (partitions > 0) df.repartitionByRange(partitions, keys: _*)
      else df.repartitionByRange(keys: _*))
      .select(col(idCol), col(densityCol), col(tokenCol))
      .withColumn("pid", spark_partition_id())
    val local = parted.withColumn("lcum",
      sum(col(tokenCol)).over(Window.partitionBy("pid").orderBy(keys: _*)))
    val offsets = local.groupBy("pid").agg(sum(col(tokenCol)).as("ptot"))
      .withColumn("offset", sum(col("ptot")).over(BoundedGlobalWindow.orderBy("pid")) - col("ptot"))
      .select(col("pid").as("_off_pid"), col("offset"))
    local.join(broadcast(offsets), col("pid") === col("_off_pid"))
      .withColumn("cum_tokens", col("offset") + col("lcum"))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col(tokenCol), col(densityCol), col("cum_tokens"))
  }

  /**
   * Deterministic WEIGHTED Bernoulli sampling: row kept iff
   * `hash(id) mod den < weight`, where `weightCol` is an integer per-row
   * keep-weight in [0, den] — rows with weight w survive with probability
   * w/den, independently, reproducibly, and identically on every engine
   * (the "random" draw is the first 15 hex chars of md5(id) read as an
   * integer — content-independent, no RNG, no partition sensitivity; the
   * same construction [[stratifiedSample]] uses for its order).
   *
   * This is the quality-weighted corpus downsample (keep high-quality docs
   * at a higher rate) that `DataFrame.sample` cannot express (single global
   * fraction, nondeterministic under re-partitioning).
   *
   * Scale shape: pure map-side — a filter over codegen'd expressions; no
   * exchange at all.
   */
  def weightedBernoulli(id: Column, weight: Column, den: Int = 10): Column = {
    require(den > 0 && den <= 1000000, s"den $den not in [1,1e6]")
    val draw = PortableHash.hash60(id)
    pmod(draw, lit(den.toLong)) < weight
  }

  /**
   * Rebalance a corpus toward a UNIFORM group mixture: every group is
   * downsampled to (in expectation, exactly in rate) the size of the
   * smallest group — keep-rate `n_min / n_group`, drawn per row with the
   * same deterministic md5 draw as [[weightedBernoulli]] but with a
   * PER-GROUP modulus (`draw mod n_group < n_min`), so the rate is the
   * exact rational per group, not a rounded global fraction. The standard
   * final step of mixture construction after [[graft.queries.Extensions]]
   * x43's sqrt-damped weighting: cap the dominant sources, keep the tail.
   *
   * Returns the input rows with a `kept` flag (callers filter or audit).
   *
   * Scale shape: group sizes are one hash aggregate broadcast back (group
   * cardinality ≪ corpus); the draw + flag are pure map-side.
   */
  def rebalanceToUniform(df: DataFrame, idCol: String, groupCol: String): DataFrame = {
    val sizes = df.groupBy(groupCol).agg(count(lit(1)).as("n_group"))
    val minSize = sizes.agg(min(col("n_group")).as("n_min"))
    val draw = PortableHash.hash60(col(idCol))
    df.join(broadcast(sizes), groupCol)
      .crossJoin(broadcast(minSize))
      .withColumn("kept", pmod(draw, col("n_group")) < col("n_min"))
  }

  /**
   * Round-robin source interleave — the training-order schedule that caps
   * same-source runs: with S sources, position `(rank_in_source − 1)·S +
   * src_idx` is a CLOSED FORM, so while every source still has documents
   * no two consecutive positions share a source (run length 1 by
   * construction — arithmetic, not a property to hope for). Once a source
   * exhausts, its slots become holes and the survivors' relative
   * round-robin order is preserved. The closed form is the scale win: a
   * naive global `ROW_NUMBER() OVER (ORDER BY …)` serializes the corpus
   * through one partition, while this needs only the per-source rank
   * exchange plus a broadcast of the S-row source index — position is
   * computed map-side.
   */
  def roundRobinInterleave(df: DataFrame, idCol: String,
      sourceCol: String): DataFrame = {
    // S-row dim: dense source index + source count (the x118 bin-table
    // pattern — the unpartitioned window runs over S rows, never data)
    val srcIdx = df.select(col(sourceCol)).distinct()
      .withColumn("src_idx",
        row_number().over(BoundedGlobalWindow.orderBy(sourceCol)).cast("long") - 1L)
      .withColumn("ns", count(lit(1)).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val bySource = Window.partitionBy(sourceCol).orderBy(idCol)
    df.select(col(idCol), col(sourceCol))
      .withColumn("src_rank", row_number().over(bySource).cast("long"))
      .join(broadcast(srcIdx), sourceCol)
      .withColumn("pos", (col("src_rank") - 1L) * col("ns") + col("src_idx"))
      .select(col(idCol), col(sourceCol), col("src_rank"), col("pos"))
  }

  def percentileBandTrim(df: DataFrame, idCol: String, stratumCol: String,
      valueCol: String, lowPct: Int, highPct: Int): DataFrame = {
    require(0 <= lowPct && lowPct < highPct && highPct <= 100,
      s"band [$lowPct, $highPct] must satisfy 0 <= low < high <= 100")
    val byValue = Window.partitionBy(stratumCol).orderBy(col(valueCol), col(idCol))
    df.withColumn("rn", row_number().over(byValue).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(stratumCol)))
      .filter(col("rn") * 100 > col("n") * lowPct &&
        col("rn") * 100 <= col("n") * highPct)
      .select(col(idCol), col(stratumCol), col(valueCol))
  }

  /**
   * SYSTEMATIC PPS (probability-proportional-to-size) sample: walk the
   * cumulative-weight axis in fixed strides of `total DIV n` and keep
   * every row whose weight interval `(cum_before, cum_after]` crosses a
   * stride boundary — heavy rows are near-certain picks, light rows keep
   * proportional odds, and the pick count is deterministic (`≈ n`;
   * integer-exact, no RNG, reruns identical). The workhorse for "sample
   * ~n docs proportional to token count" without a weighted-reservoir
   * heap.
   *
   * Scale shape: the [[budgetedSelection]] DISTRIBUTED PREFIX SUM — range
   * partition on the walk order, local running sums, exclusive partition
   * offsets broadcast back — so no global single-partition window
   * anywhere; the boundary test is then map-side arithmetic. Non-positive
   * weights are EXCLUDED from selection (a zero-width interval cannot
   * cross a boundary), and a degenerate stride (total < n) selects
   * nothing rather than dividing by zero — both visible in the output
   * count, neither a crash.
   */
  def systematicPpsSample(df: DataFrame, idCol: String, weightCol: String,
      n: Long, partitions: Int = 0): DataFrame = {
    require(n >= 1, s"sample size $n must be positive")
    val keys = Seq(col(idCol).asc)
    val parted = (if (partitions > 0) df.repartitionByRange(partitions, keys: _*)
      else df.repartitionByRange(keys: _*))
      .select(col(idCol), col(weightCol).cast("long").as("__w"))
      // exclude BEFORE the prefix: a negative weight would make the
      // cumulative axis non-monotone and corrupt every later boundary test
      .filter(col("__w") > 0)
      .withColumn("pid", spark_partition_id())
    val local = parted.withColumn("lcum",
      sum(col("__w")).over(Window.partitionBy("pid").orderBy(keys: _*)))
    val offsets = local.groupBy("pid").agg(sum(col("__w")).as("ptot"))
      .withColumn("offset",
        sum(col("ptot")).over(BoundedGlobalWindow.orderBy("pid")) - col("ptot"))
      .withColumn("total", sum(col("ptot")).over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("pid").as("_off_pid"), col("offset"), col("total"))
    local.join(broadcast(offsets), col("pid") === col("_off_pid"))
      .withColumn("cum_after", col("offset") + col("lcum"))
      .withColumn("cum_before", col("cum_after") - col("__w"))
      .withColumn("__stride", expr(s"total DIV $n"))
      .filter(col("__stride") > 0 &&
        expr("cum_before DIV __stride") < expr("cum_after DIV __stride"))
      .select(col(idCol), col("__w").as("weight"), col("cum_after"))
  }

  /**
   * LARGEST-REMAINDER (Hamilton) apportionment of a fixed sample budget
   * `k` across strata, EXACT: stratum i gets `floor(nᵢ·k/N)` plus one of
   * the `k − Σfloor` remainder slots, awarded by largest fractional part
   * (`nᵢ·k mod N` desc, stratum asc — deterministic ties). Conservation
   * is exact by construction: Σalloc = k ALWAYS, which the proportional
   * round-half rules cannot promise — the property a sampling manifest
   * must state, not approximate.
   *
   * Scale shape: one map-side-combined count per stratum, then windows
   * over the |strata|-row frame (tiny) — the corpus is scanned once and
   * never reshuffled. The `nᵢ·k` products stage through DECIMAL(38,0):
   * at warehouse scale nᵢ·k exceeds BIGINT (10¹²·10⁷), the house
   * overflow rule.
   */
  def largestRemainderAllocation(df: DataFrame, stratumCol: String,
      k: Long): DataFrame = {
    require(k >= 0, s"budget k=$k must be non-negative")
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("n_rows"))
    val all = Window.partitionBy(lit(1))
    counts
      .withColumn("__N", sum("n_rows").over(all))
      .withColumn("__base",
        expr(s"CAST(CAST(n_rows AS DECIMAL(38,0)) * $k DIV __N AS BIGINT)"))
      .withColumn("__slots", lit(k) - sum("__base").over(all))
      .withColumn("__pri", row_number().over(BoundedGlobalWindow.orderBy(
        expr(s"CAST(n_rows AS DECIMAL(38,0)) * $k % __N").desc,
        col(stratumCol))).cast("long"))
      .select(col(stratumCol), col("n_rows"),
        (col("__base") + when(col("__pri") <= col("__slots"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /**
   * CONSISTENT-HASH ring vs mod-hash MIGRATION AUDIT: when a shard set
   * grows `nOld → nNew`, what fraction of keys move? Mod-hash reassigns
   * ~`1 − 1/nNew` of all keys (cache armageddon); a hash ring with
   * virtual nodes moves ~`1/nNew` (only keys adjacent to the new shard's
   * vnodes). Both assignments are computed from the portable hash —
   * ring position = first vnode hash ≥ key hash, wrapping to the ring's
   * minimum — so the audit is deterministic and oracle-checkable. Emits
   * one row: key count, moved counts, and exact-ppm movement rates.
   *
   * Scale shape: the vnode tables are |shards|·V-row literal frames that
   * BROADCAST; each key's ring lookup is `min(vnode ≥ h)` via a broadcast
   * range join + min aggregate on the key (never a corpus shuffle wider
   * than the key column), and the wrap fallback rides the same broadcast.
   * The final report is a 1-row aggregate.
   */
  def consistentHashMigration(df: DataFrame, idCol: String,
      nOld: Int, nNew: Int, vnodes: Int = 8): DataFrame = {
    require(nOld >= 1 && nNew >= 1 && nOld != nNew && vnodes >= 1,
      s"need distinct positive shard counts, got $nOld -> $nNew ($vnodes vnodes)")
    val spark = df.sparkSession
    import spark.implicits._
    def ring(n: Int, gen: String): DataFrame = {
      val rows = for { s <- 0 until n; v <- 0 until vnodes }
        yield (gen, s.toLong, s"$s:$v")
      rows.toDF("gen", "shard", "__vkey")
        .select(col("gen"), col("shard"),
          PortableHash.hash60(col("__vkey")).as("vh"))
    }
    val rings = ring(nOld, "old").union(ring(nNew, "new")) // (nOld+nNew)·V rows
    val wraps = rings.groupBy().agg(
      min(when(col("gen") === "old", col("vh"))).as("__wrap_old"),
      min(when(col("gen") === "new", col("vh"))).as("__wrap_new"))
    val keys = df.select(col(idCol).as("k"))
      .withColumn("kh", PortableHash.hash60(col("k")))
    // ONE broadcast range join covers both generations; the per-key
    // successor vnode for each gen falls out of the same aggregate, and a
    // key past a ring's last vnode wraps to that ring's minimum
    val succ = keys.join(broadcast(rings), col("vh") >= col("kh"), "left")
      .groupBy("k", "kh")
      .agg(min(when(col("gen") === "old", col("vh"))).as("__t_old"),
        min(when(col("gen") === "new", col("vh"))).as("__t_new"))
      .crossJoin(broadcast(wraps))
      .select(col("k"), col("kh"),
        coalesce(col("__t_old"), col("__wrap_old")).as("__t_old"),
        coalesce(col("__t_new"), col("__wrap_new")).as("__t_new"))
    // resolve target hash → shard per generation (vnode hashes are md5 of
    // distinct strings — collision-free in practice; equality join is exact)
    val oldRing = ring(nOld, "old")
      .select(col("vh").as("__t_old"), col("shard").as("s_old"))
    val newRing = ring(nNew, "new")
      .select(col("vh").as("__t_new"), col("shard").as("s_new"))
    succ.join(broadcast(oldRing), "__t_old")
      .join(broadcast(newRing), "__t_new")
      .agg(count(lit(1)).as("n_keys"),
        sum((pmod(col("kh"), lit(nOld.toLong)) =!=
          pmod(col("kh"), lit(nNew.toLong))).cast("long")).as("moved_mod"),
        sum((col("s_old") =!= col("s_new")).cast("long")).as("moved_ring"))
      .select(col("n_keys"), col("moved_mod"), col("moved_ring"),
        expr("moved_mod * 1000000 DIV n_keys").as("mod_ppm"),
        expr("moved_ring * 1000000 DIV n_keys").as("ring_ppm"))
  }

  /**
   * COORDINATED sampling across a parent/child table pair — the
   * referential-integrity-preserving downsample: both tables keep a row
   * iff `hash(join key) mod 100 < pct`, so a sampled child row's parent
   * is IN the sample by construction (same hash, same key, same
   * decision) — no join is needed to coordinate, which is the whole
   * point: independent uniform samples of two tables destroy their join
   * (E[matching pairs] shrinks by pct², and per-parent child counts
   * bias). The engine-portable md5-60 draw keeps the sample identical
   * across engines and runs.
   *
   * Output is the audit row, not the sample (the sample is one
   * `filter(keep)` away): totals, kept counts, the achieved rates in
   * exact ppm, and `orphan_child_rows` — kept children whose parent key
   * is NOT in the kept parent set. Zero certifies coordination; nonzero
   * measures pre-existing FK violations (the sample inherits, never
   * introduces, orphans).
   *
   * Scale shape: the keep decision is row-local on both tables; the
   * orphan check is one left-anti join of kept-child KEYS against
   * kept-parent KEYS (both already pct-shrunk and key-collapsed).
   */
  def coordinatedSample(parent: DataFrame, parentKey: String,
      child: DataFrame, childKey: String, pct: Int): DataFrame = {
    require(pct >= 1 && pct <= 99, s"pct $pct not in [1,99]")
    def keep(c: Column) = graft.operators.PortableHash.hash60(c) % 100 < pct
    val p = parent.select(col(parentKey).as("__k"))
    val c = child.select(col(childKey).as("__k"))
    val pKept = p.filter(keep(col("__k")))
    val cKept = c.filter(keep(col("__k")))
    val orphans = cKept.select(col("__k")).distinct()
      .join(pKept.select(col("__k")).distinct(), Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("orphan_child_keys"))
    val stats = p.agg(count(lit(1)).as("parent_total"))
      .crossJoin(pKept.agg(count(lit(1)).as("parent_kept")))
      .crossJoin(c.agg(count(lit(1)).as("child_total")))
      .crossJoin(cKept.agg(count(lit(1)).as("child_kept")))
    // all frames are 1 row — the cross joins broadcast
    stats.crossJoin(orphans)
      .select(col("parent_total"), col("parent_kept"),
        expr("parent_kept * 1000000 DIV parent_total").as("parent_ppm"),
        col("child_total"), col("child_kept"),
        expr("child_kept * 1000000 DIV child_total").as("child_ppm"),
        col("orphan_child_keys"))
  }

  /**
   * NEYMAN ALLOCATION plan — split a sampling budget across strata
   * ∝ Nh·σh (the allocation minimizing the estimator's variance;
   * Neyman 1934), with the fractional seats settled by the largest-
   * remainder rule ([[largestRemainderAllocation]]'s conservation
   * guarantee: allocations sum to EXACTLY the budget). The weight is
   * `floor(sqrt(Nh·Σv² − (Σv)²))` = floor(Nh·σh·√Nh·…) up to the common
   * constant that cancels in the shares — the one square root is a
   * single deterministic IEEE-double op both engines evaluate
   * identically (the ROUND precedent), everything else is exact
   * integers on DECIMAL(38,0).
   *
   * Scale shape: one stratum-keyed moment collapse; the seat-settling
   * windows run over the |strata|-bounded frame. Output |strata| rows.
   */
  def neymanAllocationPlan(df: DataFrame, stratumCol: String,
      valueCents: Column, budget: Long): DataFrame = {
    require(budget >= 0, s"budget $budget must be non-negative")
    val m = df.filter(col(stratumCol).isNotNull)
      .select(col(stratumCol), valueCents.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(stratumCol)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__v").cast("decimal(38,0)")).as("__s1"),
        sum(col("__v").cast("decimal(38,0)") * col("__v")).as("__s2"))
      .withColumn("weight", expr(
        """CAST(FLOOR(SQRT(CAST(CAST(n_rows AS DECIMAL(38,0)) * __s2
           - __s1 * __s1 AS DOUBLE))) AS BIGINT)"""))
    val all = Window.partitionBy(lit(1))
    m.withColumn("__W", sum(col("weight")).over(all))
      .withColumn("__base",
        expr(s"CAST(CAST(weight AS DECIMAL(38,0)) * $budget DIV __W AS BIGINT)"))
      .withColumn("__slots", lit(budget) - sum(col("__base")).over(all))
      .withColumn("__pri", row_number().over(BoundedGlobalWindow.orderBy(
        expr(s"CAST(weight AS DECIMAL(38,0)) * $budget % __W").desc,
        col(stratumCol))).cast("long"))
      .select(col(stratumCol), col("n_rows"), col("weight"),
        (col("__base") + when(col("__pri") <= col("__slots"), 1L).otherwise(0L))
          .as("alloc"))
      .orderBy(stratumCol)
  }

  /** Poisson(1) inverse-CDF thresholds scaled to the 60-bit hash range:
    * a draw `h < thresholds(k)` has multiplicity k. Computed once here
    * and interpolated VERBATIM into both the Spark expression and the
    * DuckDB oracle, so the construction cannot drift between engines.
    * Tail beyond k=7 (mass < 1e-5) collapses to multiplicity 8. */
  val PoissonThresholds: Seq[Long] = {
    val scale = math.pow(2, 60)
    val probs = (0 to 7).map { k =>
      math.exp(-1.0) / (1 to k).map(_.toDouble).product
    }
    probs.scanLeft(0.0)(_ + _).tail.map(c => math.floor(c * scale).toLong)
  }

  /**
   * HASH-BOOTSTRAP confidence interval for a mean — the Poisson
   * bootstrap (each row's multiplicity in resample b is an independent
   * Poisson(1) draw; Chamandy et al., "Estimating Uncertainty for
   * Massive Data Streams", Google 2012) with every draw replaced by the
   * portable 60-bit hash of (row id, resample id): fully deterministic,
   * engine-reproducible, single-pass. Reports the exact data mean plus
   * the 2nd-smallest / 2nd-largest of `nResamples` resample means
   * (≈ the 94 % interval at 32) — the error bar every point estimate
   * in this inventory deserves but RNG-based bootstraps can't give an
   * oracle for.
   *
   * Scale shape: the resample explode is a constant `nResamples`×
   * map-side fan-out collapsing immediately to (resample, sum, count)
   * partials — the shuffle carries nResamples rows, not the corpus.
   * Means ride DECIMAL(38,0); the order statistics sort an
   * nResamples-length array on one row.
   */
  /**
   * HASH-BOOTSTRAP difference-in-means CI — [[hashBootstrapMeanCI]]'s
   * Poisson-bootstrap machinery applied to a two-arm comparison: each
   * resample recomputes BOTH arm means from the same deterministic
   * multiplicities, and the 2nd-smallest / 2nd-largest resample
   * difference bound the effect. `significant = 1` iff the interval
   * excludes zero — the readout x147's exact rate table deliberately
   * stops short of, now with an error bar and still bit-reproducible in
   * the oracle. Subtlety stated: only the resample DIFFERENCES may be
   * negative, and they are never divided — every integer division in
   * the chain has positive operands, so Spark's truncation and DuckDB's
   * floor agree.
   *
   * Scale shape: identical to the mean CI — constant fan-out, partials
   * collapse to 2·nResamples rows, order stats on one row.
   */
  def hashBootstrapDiffCI(df: DataFrame, idCol: String, arm: Column,
      valueCents: Column, nResamples: Int = 32): DataFrame = {
    require(nResamples >= 4, s"nResamples $nResamples too small for order stats")
    require(nResamples % 2 == 0, s"nResamples $nResamples must be even (paired draws)")
    val multExpr = PoissonThresholds.zipWithIndex.reverse
      .foldLeft(lit(8L): Column) { case (acc, (t, k)) =>
        when(col("__h") < t, k.toLong).otherwise(acc)
      }
    val base = spread(df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("string").as("__id"), arm.cast("int").as("__a"),
        valueCents.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__a").isNotNull))
    val means = base
      .select(col("__id"), col("__a"), col("__v"),
        explode(expr(s"sequence(0, ${nResamples / 2 - 1})")).as("__g"))
      .withColumn("__hx", md5(concat(col("__id"), lit("|"), col("__g").cast("string"))))
      // one md5 feeds TWO 60-bit draws (hex chars 1-15 and 16-30): half the
      // hash and explode work per resample; md5's bit diffusion makes the
      // halves independent draws. Resample id b = 2g + half.
      .select(col("__a"), col("__v"), col("__g"),
        posexplode(array(
          conv(substring(col("__hx"), 1, 15), 16, 10).cast("long"),
          conv(substring(col("__hx"), 16, 15), 16, 10).cast("long"))).as(Seq("__j", "__h")))
      .withColumn("__b", col("__g") * 2 + col("__j"))
      .withColumn("__m", multExpr)
      .groupBy("__b", "__a")
      .agg(sum(col("__m").cast("decimal(38,0)") * col("__v")).as("__s"),
        sum(col("__m")).as("__n"))
      .filter(col("__n") > 0)
      .select(col("__b"), col("__a"), expr("CAST(__s DIV __n AS BIGINT)").as("__mean"))
    val diffs = means.groupBy("__b")
      .agg(max(when(col("__a") === 0, col("__mean"))).as("__m0"),
        max(when(col("__a") === 1, col("__mean"))).as("__m1"))
      .filter(col("__m0").isNotNull && col("__m1").isNotNull)
      .select((col("__m1") - col("__m0")).as("__d"))
    val boot = diffs.agg(array_sort(collect_list(col("__d"))).as("__ds"))
    val orig = base.groupBy("__a")
      .agg(count(lit(1)).as("__cnt"), sum(col("__v").cast("decimal(38,0)")).as("__sv"))
      .select(col("__a"), col("__cnt"), expr("CAST(__sv DIV __cnt AS BIGINT)").as("__mean"))
      .groupBy()
      .agg(max(when(col("__a") === 0, col("__cnt"))).as("n_control"),
        max(when(col("__a") === 1, col("__cnt"))).as("n_treatment"),
        max(when(col("__a") === 0, col("__mean"))).as("__om0"),
        max(when(col("__a") === 1, col("__mean"))).as("__om1"))
    orig.crossJoin(boot)
      .select(col("n_control"), col("n_treatment"),
        (col("__om1") - col("__om0")).as("mean_diff_cents"),
        expr("CAST(element_at(__ds, 2) AS BIGINT)").as("boot_lo_cents"),
        expr(s"CAST(element_at(__ds, ${nResamples - 1}) AS BIGINT)")
          .as("boot_hi_cents"))
      .withColumn("significant",
        (col("boot_lo_cents") > 0 || col("boot_hi_cents") < 0).cast("int"))
  }

  /**
   * HASH-BOOTSTRAP confidence interval for the MEDIAN — the same
   * deterministic Poisson-resample machinery as [[hashBootstrapMeanCI]],
   * but each resample's statistic is the EXACT lower median computed from
   * multiplicity-weighted distinct-value cumulative counts (never a row
   * sort): collapse each resample to (value, Σmultiplicity), rank the
   * collapsed frame per resample, take the first value crossing half the
   * weight. Medians need a bootstrap MORE than means do (no CLT plug-in),
   * and this one is bit-reproducible in the oracle.
   *
   * Scale shape: the fan-out collapses to (resample × distinct values)
   * rows before any window; the per-resample rank frame is value-bounded.
   */
  def hashBootstrapMedianCI(df: DataFrame, idCol: String, valueCents: Column,
      nResamples: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nResamples >= 4, s"nResamples $nResamples too small for order stats")
    require(nResamples % 2 == 0, s"nResamples $nResamples must be even (paired draws)")
    val multExpr = PoissonThresholds.zipWithIndex.reverse
      .foldLeft(lit(8L): Column) { case (acc, (t, k)) =>
        when(col("__h") < t, k.toLong).otherwise(acc)
      }
    val base = spread(df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("string").as("__id"),
        valueCents.cast("long").as("__v"))
      .filter(col("__v").isNotNull))
    val weighted = base
      .select(col("__id"), col("__v"),
        explode(expr(s"sequence(0, ${nResamples / 2 - 1})")).as("__g"))
      .withColumn("__hx", md5(concat(col("__id"), lit("|"), col("__g").cast("string"))))
      .select(col("__v"), col("__g"),
        posexplode(array(
          conv(substring(col("__hx"), 1, 15), 16, 10).cast("long"),
          conv(substring(col("__hx"), 16, 15), 16, 10).cast("long"))).as(Seq("__j", "__h")))
      .withColumn("__b", col("__g") * 2 + col("__j"))
      .withColumn("__m", multExpr)
      .groupBy("__b", "__v").agg(sum(col("__m")).as("__w"))
      .filter(col("__w") > 0)
    val tot = weighted.groupBy("__b").agg(sum(col("__w")).as("__t"))
    val medians = weighted
      .withColumn("__cum", sum(col("__w")).over(
        Window.partitionBy("__b").orderBy("__v")))
      .join(tot, "__b")
      .groupBy("__b")
      .agg(min(when(col("__cum") * 2 >= col("__t"), col("__v"))).as("__med"))
    val boot = medians.agg(array_sort(collect_list(col("__med"))).as("__ms"))
    // the point estimate: exact lower median of the ORIGINAL data
    val coll = base.groupBy("__v").agg(count(lit(1)).as("__c"))
    val n0 = base.agg(count(lit(1)).as("n_rows"))
    val orig = coll
      .withColumn("__cum", sum(col("__c")).over(BoundedGlobalWindow.orderBy("__v")))
      .crossJoin(broadcast(n0))
      .agg(max(col("n_rows")).as("n_rows"),
        min(when(col("__cum") * 2 >= col("n_rows"), col("__v"))).as("median_cents"))
    orig.crossJoin(boot)
      .select(col("n_rows"), col("median_cents"),
        expr("CAST(element_at(__ms, 2) AS BIGINT)").as("boot_lo_cents"),
        expr(s"CAST(element_at(__ms, ${nResamples - 1}) AS BIGINT)")
          .as("boot_hi_cents"),
        lit(nResamples).as("n_resamples"))
  }

  def hashBootstrapMeanCI(df: DataFrame, idCol: String, valueCents: Column,
      nResamples: Int = 32): DataFrame = {
    require(nResamples >= 4, s"nResamples $nResamples too small for order stats")
    require(nResamples % 2 == 0, s"nResamples $nResamples must be even (paired draws)")
    // reverse fold so the SMALLEST threshold is checked first:
    // when(h<t0, 0).otherwise(when(h<t1, 1).otherwise(... 8))
    val multExpr = PoissonThresholds.zipWithIndex.reverse
      .foldLeft(lit(8L): Column) { case (acc, (t, k)) =>
        when(col("__h") < t, k.toLong).otherwise(acc)
      }
    val base = spread(df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("string").as("__id"),
        valueCents.cast("long").as("__v"))
      .filter(col("__v").isNotNull))
    val resamples = base
      .select(col("__id"), col("__v"),
        explode(expr(s"sequence(0, ${nResamples / 2 - 1})")).as("__g"))
      .withColumn("__hx", md5(concat(col("__id"), lit("|"), col("__g").cast("string"))))
      // one md5 feeds TWO 60-bit draws (hex chars 1-15 and 16-30) — see
      // [[hashBootstrapDiffCI]]; halves the per-resample hash cost.
      .select(col("__v"), col("__g"),
        posexplode(array(
          conv(substring(col("__hx"), 1, 15), 16, 10).cast("long"),
          conv(substring(col("__hx"), 16, 15), 16, 10).cast("long"))).as(Seq("__j", "__h")))
      .withColumn("__b", col("__g") * 2 + col("__j"))
      .withColumn("__m", multExpr)
      .groupBy("__b")
      .agg(sum(col("__m").cast("decimal(38,0)") * col("__v")).as("__s"),
        sum(col("__m")).as("__n"))
      .filter(col("__n") > 0)
      .select(expr("CAST(__s DIV __n AS BIGINT)").as("__mean"))
    val boot = resamples.agg(
      array_sort(collect_list(col("__mean"))).as("__ms"))
    val orig = base.agg(count(lit(1)).as("n_rows"),
      sum(col("__v").cast("decimal(38,0)")).as("__sv"))
    orig.crossJoin(boot)
      .select(col("n_rows"),
        expr("CAST(__sv DIV n_rows AS BIGINT)").as("mean_cents"),
        expr("CAST(element_at(__ms, 2) AS BIGINT)").as("boot_lo_cents"),
        expr(s"CAST(element_at(__ms, ${nResamples - 1}) AS BIGINT)")
          .as("boot_hi_cents"),
        lit(nResamples).as("n_resamples"))
  }

  /**
   * HASH PERMUTATION TEST for a two-arm mean difference — the exact-style
   * randomization inference the bootstrap CIs ([[hashBootstrapDiffCI]])
   * approximate from the other side: re-randomize every unit's arm
   * `nPerms` times and ask how often the permuted difference is at least
   * as extreme as the observed one. Deterministic spelling: permutation r
   * assigns unit u to the arm in BIT r of the unit's portable 60-bit md5
   * hash — one hash per unit feeds all ≤ 60 permutations (the Bernoulli
   * re-randomization form of the permutation test: arm sizes vary
   * binomially around n/2, the standard massive-data variant since exact
   * n/2 partitions cannot be coordinated shuffle-free). p is the
   * add-one-smoothed (1 + #extreme) / (nPerms + 1) in ppm.
   *
   * Value contract: `valueCents` must be non-negative (arm SUMS stay
   * positive so every DIV has positive operands — the x268 discipline);
   * only the never-divided DIFFERENCES go negative.
   *
   * Scale shape: one corpus-sized select computes the hash, a constant
   * `nPerms`× map-side fan-out collapses immediately to (perm, arm)
   * partials — the shuffle carries 2·nPerms rows; the extreme count and
   * p-value ride a 1-row frame.
   */
  def hashPermutationTest(df: DataFrame, idCol: String, arm: Column,
      valueCents: Column, nPerms: Int = 60): DataFrame = {
    require(nPerms >= 1 && nPerms <= 60, s"nPerms $nPerms outside 1..60")
    val base = spread(df.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("string").as("__id"), arm.cast("int").as("__a"),
        valueCents.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__a").isNotNull))
    val obs = base.groupBy("__a")
      .agg(count(lit(1)).as("__n"), sum(col("__v").cast("decimal(38,0)")).as("__s"))
      .groupBy()
      .agg(max(when(col("__a") === 0, col("__n"))).as("n_control"),
        max(when(col("__a") === 1, col("__n"))).as("n_treatment"),
        max(when(col("__a") === 0, expr("CAST(__s DIV __n AS BIGINT)"))).as("__m0"),
        max(when(col("__a") === 1, expr("CAST(__s DIV __n AS BIGINT)"))).as("__m1"))
      .select(col("n_control"), col("n_treatment"),
        (col("__m1") - col("__m0")).as("obs_diff_cents"))
    val perms = base
      .withColumn("__h", PortableHash.hash60(col("__id")))
      .select(col("__v"), explode(expr(s"sequence(0, ${nPerms - 1})")).as("__r"),
        col("__h"))
      .select(col("__r"), expr("CAST((__h >> __r) & 1 AS INT)").as("__pa"),
        col("__v"))
      .groupBy("__r", "__pa")
      .agg(count(lit(1)).as("__n"), sum(col("__v").cast("decimal(38,0)")).as("__s"))
      .groupBy("__r")
      .agg(max(when(col("__pa") === 0, expr("CAST(__s DIV __n AS BIGINT)"))).as("__p0"),
        max(when(col("__pa") === 1, expr("CAST(__s DIV __n AS BIGINT)"))).as("__p1"))
      .filter(col("__p0").isNotNull && col("__p1").isNotNull)
      .select((col("__p1") - col("__p0")).as("__d"))
    perms.crossJoin(broadcast(obs))
      .agg(max(col("n_control")).as("n_control"),
        max(col("n_treatment")).as("n_treatment"),
        max(col("obs_diff_cents")).as("obs_diff_cents"),
        count(lit(1)).as("n_perms"),
        sum(when(abs(col("__d")) >= abs(col("obs_diff_cents")), 1L).otherwise(0L))
          .as("n_extreme"))
      .select(col("n_control"), col("n_treatment"), col("obs_diff_cents"),
        col("n_perms"), col("n_extreme"),
        expr("(1 + n_extreme) * 1000000 DIV (n_perms + 1)").as("p_value_ppm"))
  }

  /** Ring position of shard node j: the portable 60-bit md5 of the
    * literal `shard:j` — computed driver-side with `java.security`
    * MessageDigest, BIT-IDENTICAL to [[PortableHash.hash60]] (same
    * md5-hex → first 15 nibbles → long construction), so the oracle
    * recomputes the identical positions from `md5('shard:' || j)`. */
  private def ringNodePos(j: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"shard:$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Circular-successor POSITION of hash `h` among the first `k` ring
    * nodes: the smallest node position ≥ h, wrapping to the globally
    * smallest. A constant when-ladder over the k sorted positions —
    * map-side, no join. Comparing successor POSITIONS between two node
    * sets equals comparing assigned nodes (positions are distinct). */
  private def ringSuccessorPos(h: Column, k: Int): Column = {
    val ps = (0 until k).map(ringNodePos).sorted
    ps.reverse.foldLeft(lit(ps.head): Column)((acc, p) =>
      when(h <= p, lit(p)).otherwise(acc))
  }

  /**
   * SHARD-REBALANCE audit (consistent hashing's raison d'être, public) —
   * when a k-shard layout grows to k+1, how much data MOVES under each
   * assignment strategy? `mod` (shard = h mod k) remaps ~k/(k+1) of all
   * keys — nearly everything; `range` (shard = ⌊h·k / 2⁶⁰⌋, static
   * range-partitioning of the hash space) still moves ~half, because
   * EVERY range boundary shifts when k changes; `ring` (true consistent
   * hashing — each key goes to the circular successor among k md5-placed
   * node points) moves ONLY the keys the new node captures, ~1/(k+1) in
   * expectation. The three-row table is the measured certificate of that
   * hierarchy on the actual corpus — the one-look justification for ring
   * sharding before a 100 TB re-layout. The portable 60-bit md5 draw
   * keeps both engines bit-identical; node positions derive from
   * `md5('shard:' || j)` so the oracle re-places the ring itself; the
   * range product stages through DECIMAL (h·(k+1) overflows BIGINT from
   * k ≥ 8).
   *
   * Scale shape: one map-side hash + six shard expressions (the ring
   * ladders are k-constant CASE chains), one 1-row aggregate, a 3-row
   * report.
   */
  def shardRebalanceAudit(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 64, s"shard count $k not in [1, 64]")
    val two60 = 1152921504606846976L // 2^60, the hash60 range
    val agg = df.filter(col(idCol).isNotNull)
      .select(PortableHash.hash60(col(idCol)).as("__h"))
      .select((col("__h") % k).as("__m0"), (col("__h") % (k + 1)).as("__m1"),
        expr(s"CAST(CAST(__h AS DECIMAL(38,0)) * $k DIV $two60 AS BIGINT)")
          .as("__r0"),
        expr(s"CAST(CAST(__h AS DECIMAL(38,0)) * ${k + 1} DIV $two60 AS BIGINT)")
          .as("__r1"),
        ringSuccessorPos(col("__h"), k).as("__c0"),
        ringSuccessorPos(col("__h"), k + 1).as("__c1"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__m0") =!= col("__m1"), 1L).otherwise(0L)).as("__mm"),
        sum(when(col("__r0") =!= col("__r1"), 1L).otherwise(0L)).as("__rm"),
        sum(when(col("__c0") =!= col("__c1"), 1L).otherwise(0L)).as("__cm"))
    agg.select(explode(array(
        struct(lit("mod").as("strategy"), col("n_docs").as("n_docs"),
          col("__mm").as("n_moved")),
        struct(lit("range").as("strategy"), col("n_docs").as("n_docs"),
          col("__rm").as("n_moved")),
        struct(lit("ring").as("strategy"), col("n_docs").as("n_docs"),
          col("__cm").as("n_moved")))).as("s"))
      .select(col("s.strategy").as("strategy"), col("s.n_docs").as("n_docs"),
        col("s.n_moved").as("n_moved"))
      .select(col("strategy"), col("n_docs"), col("n_moved"),
        expr("""CAST(CASE WHEN n_docs = 0 THEN 0
             ELSE n_moved * 1000000 DIV n_docs END AS BIGINT)""")
          .as("moved_ppm"))
      .orderBy("strategy")
  }
}
