package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PREFERENCE / RLHF data-prep operators — the audit-and-fit toolkit a
 * pairwise human-preference dataset goes through before it trains a reward
 * model. The reference engine has no counterpart (its scope ends at SQL
 * over uploaded CSVs); these extend the LLM-pipeline brief the same way
 * the dedup/similarity families do. All three operators consume a generic
 * comparisons frame — one row per judgment: the two items compared, which
 * was shown first, who judged, and which won.
 *
 * Design rules shared with the rest of the library: exact integer /
 * fixed-point arithmetic end-to-end (bit-reproducible across engines and
 * partitionings — the [[Graph.pageRank]] discipline), iteration only over
 * item-bounded frames (never the comparison corpus), and every all-pairs
 * structure bounded by |items|², a catalogue-sized constant (models in an
 * arena, policies in a sweep), never by corpus size.
 */
object Preference {

  /**
   * BRADLEY–TERRY strength fit (Bradley & Terry '52, public; the
   * minorization–maximization update from Hunter '04) — the canonical
   * "pairwise wins → per-item strength" model behind arena leaderboards
   * and reward-model data audits: P(i beats j) = π_i/(π_i+π_j). The MM
   * fixed point `π_i ← W_i / Σ_j n_ij/(π_i+π_j)` runs a FIXED number of
   * rounds in micro fixed-point (π in 1e-6 units; each denominator term
   * is `n_ij·10¹² DIV (π_i+π_j)`, each update `W_i·10¹² DIV d_i`), then
   * renormalizes so Σπ = |items|·s0 — every round is floor-exact integer
   * arithmetic, so an unrolled SQL oracle replicates the fit bit-for-bit
   * and the result is invariant to partitioning and join order. Items
   * with zero wins (or an all-zero denominator) guard to strength 0
   * rather than dividing by zero.
   *
   * The comparison frame may carry (i,j) and (j,i) rows separately — the
   * MM update is linear in pair rows, so no canonicalization is needed.
   * Precondition: `winner` equals one of the two items on every row. A
   * row whose winner matches NEITHER item is credited as a win for
   * `itemB` (the aggregation counts every non-itemA winner toward B; the
   * SQL oracle shares the convention) — garbage in, documented.
   *
   * Scale shape: ONE distributed corpus collapse to the |items|²-bounded
   * pair-count frame, then a DOCUMENTED BOUNDED COLLECT — items are
   * CATALOGUE-scale (models in an arena, policies in a sweep: tens to
   * thousands), so the win matrix is at most ~10⁶ tiny rows no matter how
   * many billions of judgments produced it, and the MM rounds run on the
   * driver in exact BigInt arithmetic (guarded: a LIMIT planned below the
   * collect caps what can ever reach the driver at 2·10⁶ pairs + 1, and
   * the fit refuses past 2·10⁶). Iterating distributedly here would spend 2 broadcast
   * exchanges + 3 shuffle stages per round moving 13-row frames —
   * measured 4 s/fit at sf0.1 vs ~0.4 s for collapse + collect; the
   * corpus-scale work (the collapse) is the only distributed part either
   * way. Driver sums are over BigInt, so accumulation order cannot
   * matter — the result is partitioning-invariant and bit-identical to
   * the unrolled SQL oracle.
   */
  /** The distributed half of [[bradleyTerry]]: the ONE corpus collapse to
    * the |items|²-bounded directed pair frame (__a, __b, __n judgments,
    * __wa wins for __a). Exposed so plan tests can assert the collapse's
    * physical shape — the LocalRelation bradleyTerry returns after its
    * driver-side MM rounds has no plan left to inspect. */
  def pairWinCounts(comps: DataFrame, itemA: org.apache.spark.sql.Column,
      itemB: org.apache.spark.sql.Column,
      winner: org.apache.spark.sql.Column): DataFrame = comps
    .select(itemA.cast("long").as("__a"), itemB.cast("long").as("__b"),
      winner.cast("long").as("__w"))
    .filter(col("__a").isNotNull && col("__b").isNotNull
      && col("__w").isNotNull && col("__a") =!= col("__b"))
    .groupBy("__a", "__b")
    .agg(count(lit(1)).as("__n"),
      sum(when(col("__w") === col("__a"), 1L).otherwise(0L)).as("__wa"))

  def bradleyTerry(comps: DataFrame, itemA: org.apache.spark.sql.Column,
      itemB: org.apache.spark.sql.Column, winner: org.apache.spark.sql.Column,
      iterations: Int = 5, s0: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 12,
      s"iterations $iterations not in [1,12]")
    require(s0 >= 1000L, s"fixed-point unit $s0 too coarse")
    val spark = comps.sparkSession
    // LIMIT 2e6+1 is planned ABOVE the collect, so a corpus-scale misuse
    // materializes at most one row past the catalogue bound on the driver
    // (and then fails the require below) instead of OOMing it first
    // bounded-collect: bt-win-matrix
    val pairs = pairWinCounts(comps, itemA, itemB, winner)
      .limit(2000001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    require(pairs.length <= 2000000,
      s"item pairs exceed the catalogue bound (2e6) — " +
        "Bradley-Terry items must be catalogue-scale, not corpus-scale")
    val nComp = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val wins = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    pairs.foreach { case (a, b, n, wa) =>
      nComp(a) += n; nComp(b) += n; wins(a) += wa; wins(b) += n - wa
    }
    val items = nComp.keys.toSeq.sorted
    val trillion = BigInt(1000000000000L)
    var pi: Map[Long, BigInt] = items.map(_ -> BigInt(s0)).toMap
    for (_ <- 1 to iterations) {
      val d = collection.mutable.Map.empty[Long, BigInt]
        .withDefaultValue(BigInt(0))
      pairs.foreach { case (a, b, n, _) =>
        val s = pi(a) + pi(b)
        val den = if (s > 0) BigInt(n) * trillion / s else BigInt(0)
        d(a) += den; d(b) += den
      }
      val raw = items.map(i =>
        i -> (if (d(i) > 0) BigInt(wins(i)) * trillion / d(i) else BigInt(0)))
      val t = raw.map(_._2).sum
      pi = raw.map { case (i, p0) =>
        i -> (if (t > 0) p0 * items.size * s0 / t else BigInt(0))
      }.toMap
    }
    import spark.implicits._
    items.map(i => (i, nComp(i), wins(i), pi(i).toLong))
      .toDF("item", "n_comparisons", "wins", "strength_micro")
      .orderBy("item")
  }

  /**
   * PREFERENCE-CONSISTENCY audit: circular triads (Kendall & Babington
   * Smith '40, public) in the MAJORITY tournament — for every unordered
   * item pair the majority winner gets a dominance edge (exact ties get
   * none), then directed 3-cycles i→j→k→i are counted against the triads
   * whose three pairs all have an edge. A cyclic triad is a preference
   * the Bradley–Terry model CANNOT represent (no strength vector orders
   * it), so `cyclic_ppm` is the headline "how transitive are my raters"
   * number a preference dataset is gated on before reward-model training.
   *
   * Scale shape: one corpus collapse to |items|² pair counts; the
   * dominance edge list is ≤ C(|items|,2) rows, and both triangle joins
   * run on that constant-sized frame (the [[Graph]] wedge-join shape,
   * each cycle/triad counted exactly once by anchoring its minimum item).
   * The comparison corpus is touched once.
   */
  def circularTriads(comps: DataFrame, itemA: org.apache.spark.sql.Column,
      itemB: org.apache.spark.sql.Column,
      winner: org.apache.spark.sql.Column): DataFrame = {
    // Cache lifecycle: pc/dom are internal to the returned lazy frame, so
    // no caller can unpersist them — like the [[Dedup]] label rounds, the
    // ≤|items|² cached blocks are reclaimed by Spark's ContextCleaner once
    // the result frame is unreferenced (catalogue-sized by contract, so
    // the interim footprint is a few thousand tiny rows, not corpus data).
    val pc = comps
      .select(least(itemA.cast("long"), itemB.cast("long")).as("__u"),
        greatest(itemA.cast("long"), itemB.cast("long")).as("__v"),
        winner.cast("long").as("__w"))
      .filter(col("__u").isNotNull && col("__v").isNotNull
        && col("__w").isNotNull && col("__u") =!= col("__v"))
      .groupBy("__u", "__v")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__w") === col("__u"), 1L).otherwise(0L)).as("__wu"))
      .cache()
    val dom = pc
      .select(
        when(col("__wu") * 2 > col("__n"), col("__u"))
          .when(col("__wu") * 2 < col("__n"), col("__v")).as("__s"),
        when(col("__wu") * 2 > col("__n"), col("__v"))
          .when(col("__wu") * 2 < col("__n"), col("__u")).as("__d"))
      .filter(col("__s").isNotNull)
      .cache()
    // cycles anchored at their minimum vertex: s1 < d1, s1 < d2 fixes the
    // rotation, the edge directions fix the orientation — each directed
    // 3-cycle is counted exactly once.
    val cyc = dom.select(col("__s").as("x"), col("__d").as("y"))
      .join(dom.select(col("__s").as("y"), col("__d").as("z")), "y")
      .join(dom.select(col("__s").as("z"), col("__d").as("x2")), "z")
      .filter(col("x2") === col("x") && col("x") < col("y")
        && col("x") < col("z"))
      .agg(count(lit(1)).as("__ncyc"))
    // complete triads x<y<z with all three pairs decided (edge either way)
    val und = dom.select(least(col("__s"), col("__d")).as("u"),
      greatest(col("__s"), col("__d")).as("v"))
    val comp = und.select(col("u").as("x"), col("v").as("y"))
      .join(und.select(col("u").as("y"), col("v").as("z")), "y")
      .join(und.select(col("u").as("x"), col("v").as("z"))
        .withColumnRenamed("x", "x3").withColumnRenamed("z", "z3"),
        col("x3") === col("x") && col("z3") === col("z"))
      .agg(count(lit(1)).as("__ntri"))
    val items = pc.select(explode(array(col("__u"), col("__v"))).as("i"))
      .agg(countDistinct(col("i")).as("n_items"))
    val edges = dom.agg(count(lit(1)).as("n_dominance_edges"))
    val pairs = pc.agg(count(lit(1)).as("n_pairs_observed"))
    items.crossJoin(broadcast(pairs)).crossJoin(broadcast(edges))
      .crossJoin(broadcast(comp)).crossJoin(broadcast(cyc))
      .select(col("n_items"), col("n_pairs_observed"),
        col("n_dominance_edges"),
        coalesce(col("__ntri"), lit(0L)).as("n_complete_triads"),
        coalesce(col("__ncyc"), lit(0L)).as("n_cyclic_triads"),
        expr("""CAST(CASE WHEN coalesce(__ntri, 0) = 0 THEN 0
             ELSE coalesce(__ncyc, 0) * 1000000 DIV __ntri
             END AS BIGINT)""").as("cyclic_ppm"))
  }

  /**
   * UNDECIDED-PAIR detector — the ACTIVE-LABELING audit that closes the
   * preference-prep loop: which item pairs have the data already DECIDED
   * (the majority is statistically real) and which still need judgments?
   * Per canonical pair, the two-sided binomial test of p = 1/2 at the 5%
   * normal approximation, in exact cross-multiplied integers:
   * decided ⇔ 10000·(2w − n)² > 38416·n  (z² > 1.96², no float, no CDF —
   * the [[Analytics.mannWhitneyU]] 38415-convention, here with 1.96² =
   * 3.8416 exactly). Labeling budget goes to the 'undecided' rows; a
   * fleet-wide high undecided share says the items are too close for
   * pairwise preference to rank at this budget.
   *
   * Scale shape: ONE corpus collapse to the |items|²-bounded canonical
   * pair frame; the verdict is a map-side expression over it. Nothing
   * else — the judgment corpus is touched once.
   */
  def undecidedPairs(comps: DataFrame, itemA: org.apache.spark.sql.Column,
      itemB: org.apache.spark.sql.Column,
      winner: org.apache.spark.sql.Column): DataFrame =
    comps
      .select(least(itemA.cast("long"), itemB.cast("long")).as("item_a"),
        greatest(itemA.cast("long"), itemB.cast("long")).as("item_b"),
        winner.cast("long").as("__w"))
      .filter(col("item_a").isNotNull && col("item_b").isNotNull
        && col("__w").isNotNull && col("item_a") =!= col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_judgments"),
        sum(when(col("__w") === col("item_a"), 1L).otherwise(0L)).as("wins_a"))
      .select(col("item_a"), col("item_b"), col("n_judgments"), col("wins_a"),
        // (2w−n)² reaches n², which overflows BIGINT near 10^10 judgments
        // per pair — stage the square through DECIMAL(38,0)
        expr("""CASE WHEN CAST(2 * wins_a - n_judgments AS DECIMAL(38,0))
               * (2 * wins_a - n_judgments) * 10000
               > CAST(38416 AS DECIMAL(38,0)) * n_judgments
             THEN 'decided' ELSE 'undecided' END""").as("verdict"))
      .orderBy("item_a", "item_b")

  /**
   * ANNOTATOR POSITION-BIAS report — the per-rater audit a preference
   * dataset runs before trusting its labels: how often does each
   * annotator pick the item SHOWN FIRST, versus the pool? Human raters
   * (and LLM judges harder still) systematically over-pick the first
   * position; an annotator whose first-position win rate sits far from
   * the pool's is either misreading the task or rubber-stamping. Reports
   * per annotator: judgment count, first-position win rate (ppm), and
   * the signed gap to the pool rate — both floor-divided ppm, so the two
   * engines agree bit-for-bit.
   *
   * Scale shape: one |annotators|-bounded aggregate over the corpus, one
   * broadcast 1-row pool total. No window, no corpus join.
   */
  def positionBias(comps: DataFrame, annotator: org.apache.spark.sql.Column,
      firstShown: org.apache.spark.sql.Column,
      winner: org.apache.spark.sql.Column): DataFrame = {
    val per = comps
      .select(annotator.cast("long").as("annotator"),
        when(winner === firstShown, 1L).otherwise(0L).as("__fw"))
      .filter(col("annotator").isNotNull)
      .groupBy("annotator")
      .agg(count(lit(1)).as("n_judgments"), sum(col("__fw")).as("__f"))
    val tot = per.agg(coalesce(sum(col("n_judgments")), lit(0L)).as("__tn"),
      coalesce(sum(col("__f")), lit(0L)).as("__tf"))
    per.crossJoin(broadcast(tot))
      .select(col("annotator"), col("n_judgments"),
        expr("__f * 1000000 DIV n_judgments").as("first_win_ppm"),
        expr("""CAST(__f * 1000000 DIV n_judgments
             - CASE WHEN __tn = 0 THEN 0 ELSE __tf * 1000000 DIV __tn END
             AS BIGINT)""").as("bias_vs_pool_ppm"))
      .orderBy("annotator")
  }

  /**
   * ANNOTATOR-vs-MAJORITY agreement — the per-rater QUALITY split that
   * [[positionBias]] cannot see alone: a rater can be position-unbiased
   * yet pure noise, or biased yet informative. Each rater's judgments on
   * DECIDED pairs (pairs whose pooled majority is strict — exact ties
   * carry no verdict to agree with) are scored against the per-pair
   * majority winner; reported as agreement ppm plus the signed gap to the
   * pool rate. A rater far BELOW pool is noise (or adversarial); a rater
   * pinned at ~1e6 on a noisy pool is rubber-stamping the consensus item.
   * Note the rater's own votes are inside the majority they are scored
   * against — the standard leaderboard convention; at catalogue scale one
   * rater cannot move a pair's majority unless the pair is near-tied.
   *
   * Scale shape: the [[undecidedPairs]] collapse reused as staging — ONE
   * corpus collapse to the |items|²-bounded canonical pair frame, whose
   * strict-majority verdicts broadcast back onto the judgment stream for
   * one |annotators|-bounded aggregate. The corpus is scanned twice
   * (collapse + score) and never joined to itself; the majority frame is
   * catalogue-sized by contract.
   */
  def majorityAgreement(comps: DataFrame, itemA: org.apache.spark.sql.Column,
      itemB: org.apache.spark.sql.Column, winner: org.apache.spark.sql.Column,
      annotator: org.apache.spark.sql.Column): DataFrame = {
    val c = comps
      .select(least(itemA.cast("long"), itemB.cast("long")).as("__u"),
        greatest(itemA.cast("long"), itemB.cast("long")).as("__v"),
        winner.cast("long").as("__w"),
        annotator.cast("long").as("annotator"))
      .filter(col("__u").isNotNull && col("__v").isNotNull
        && col("__w").isNotNull && col("annotator").isNotNull
        && col("__u") =!= col("__v"))
    val maj = c.groupBy("__u", "__v")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__w") === col("__u"), 1L).otherwise(0L)).as("__wu"))
      .filter(col("__wu") * 2 =!= col("__n")) // strict majorities only
      .select(col("__u"), col("__v"),
        when(col("__wu") * 2 > col("__n"), col("__u"))
          .otherwise(col("__v")).as("__maj"))
    val per = c.join(broadcast(maj), Seq("__u", "__v"))
      .groupBy("annotator")
      .agg(count(lit(1)).as("n_on_decided"),
        sum(when(col("__w") === col("__maj"), 1L).otherwise(0L)).as("__agr"))
    val tot = per.agg(coalesce(sum("n_on_decided"), lit(0L)).as("__tn"),
      coalesce(sum("__agr"), lit(0L)).as("__ta"))
    per.crossJoin(broadcast(tot))
      .select(col("annotator"), col("n_on_decided"),
        expr("__agr * 1000000 DIV n_on_decided").as("agree_ppm"),
        expr("""CAST(__agr * 1000000 DIV n_on_decided
             - CASE WHEN __tn = 0 THEN 0 ELSE __ta * 1000000 DIV __tn END
             AS BIGINT)""").as("gap_vs_pool_ppm"))
      .orderBy("annotator")
  }
}
