package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for large-scale text corpora — the LLM-pipeline
 * extensions (BASELINE.json north star; no reference counterpart, SURVEY.md
 * §7.4). All are expressed as declarative DataFrame transforms over
 * codegen'd builtins (higher-order array functions + xxhash64): no UDFs, no
 * driver-side loops, no O(n²) stage at any scale.
 *
 * Shuffle budget per op:
 *  - exact:        1 exchange (hash-partition on the dedup key).
 *  - minhashLsh:   1 exchange on (band, signature) + 1 small join of
 *                  candidate pairs back to shingle sets. Candidates ≪ n by
 *                  LSH design, so the verify join is cheap at any scale.
 *  - ngramJaccard: 1 exchange on shingle + 1 on the pair key — the exact
 *                  algorithm, O(sum of shingle-frequency²) not O(n²).
 *  - simhash:      1 exchange on (band, band-bits).
 */
object Dedup {

  /** Exact dedup: keep the smallest `idCol` per distinct `keyCol`. One
    * hash-aggregate exchange; map-side partial aggregation halves shuffle
    * volume automatically. */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(min(col(idCol)).as(idCol))

  /** Distinct word n-gram shingles of a text column (empty array when the
    * text has fewer than n words). Readable reference form — the bulk
    * operators use [[shingleHashRows]], which stays in whole-stage codegen. */
  def shingles(text: Column, n: Int): Column = {
    val w = split(text, " ")
    val grams = transform(
      sequence(lit(0), size(w) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*))
    when(size(w) >= n, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /**
   * (doc_id, shingle-hash) rows — distinct per doc by default, every
   * occurrence when `distinct = false` (repetition statistics need the
   * multiplicity). Shingling is one fused codegen'd expression
   * ([[graft.functions.ShingleHashes]]: split → per-word xxhash64 → n-fold
   * combine, bit-identical to the builtin xxhash64 composition) followed by
   * an explode — entirely MAP-SIDE, no exchange. The earlier explode+window
   * form shuffled and sorted every word row per doc before hashing; the
   * higher-order `transform`/`concat_ws` form of [[shingles]] is
   * CodegenFallback and interpreted per element. The word→hash mapping is
   * injective on shingle triples (words cannot contain the split character),
   * so set arithmetic on hashes equals set arithmetic on shingle strings up
   * to 64-bit collisions (~|shingles|²/2^64).
   *
   * PRECONDITION (`distinct = true`): `docs` must carry ONE ROW PER
   * `idCol`. The dedup is row-local (per-doc `array_distinct` before the
   * explode — zero exchanges, vs the corpus-wide (doc, shingle) DISTINCT
   * shuffle it replaced), so a frame with duplicate ids emits each
   * duplicate row's shingles AGAIN: per-doc set sizes, jaccard and
   * containment counts downstream all double-count. Collapse duplicate
   * ids first (e.g. [[exact]] or a groupBy-first) — the divergence is
   * pinned in `OperatorsSpec` ("shingleHashRows duplicate-id rows").
   */
  def shingleHashRows(docs: DataFrame, idCol: String, textCol: String, n: Int,
                      distinct: Boolean = true): DataFrame = {
    // distinct = per-doc array_distinct BEFORE the explode: row-local, so
    // the dedup costs zero exchanges — a global rows.distinct() here was a
    // full corpus-wide (doc, sh) shuffle (measured ~1.5 s of x114's 4.5 s
    // at sf0.1). Equivalent to the global distinct because every caller
    // passes a frame with one row per idCol (the two dedup semantics only
    // diverge when the same id carries two different texts).
    val arr = graft.functions.ShingleHashes(col(textCol), n)
    docs.select(col(idCol).as("doc_id"),
      explode(if (distinct) array_distinct(arr) else arr).as("sh"))
  }


  /** (doc_id, sig) MinHash signature frame — `numHashes` affine-permutation
    * minima per doc via the native MinHashSignature aggregate (one
    * Array[Long] buffer, tight loop) — numHashes separate min() aggregates
    * overflow codegen limits and fall back to interpreted evaluation, and
    * higher-order-function folds are CodegenFallback too. Partial
    * aggregation collapses to ONE buffer per doc before the exchange.
    * Public because the signature depends only on (numHashes, seeds): every
    * band layout with the same numBands×rowsPerBand product re-bands THIS
    * frame instead of re-running the aggregate ([[minhashLshMultiConfig]]). */
  def minhashSignatures(shingleRows: DataFrame, numHashes: Int): DataFrame =
    shingleRows
      .groupBy("doc_id")
      .agg(graft.functions.MinHashSignature(
        col("sh"), numHashes, 0x5eed5eedL, 0xb17b17b1L).as("sig"))

  /** (doc_id, band_j, band_h) LSH band keys derived from a precomputed
    * signature frame — banding is a pure REGROUPING of signature elements
    * (rows j·rowsPerBand..j·rowsPerBand+rowsPerBand-1 feed band j), so it
    * costs one codegen'd multi-arg xxhash64 per band and no aggregate. */
  def bandKeysFromSignatures(sigs: DataFrame, numBands: Int,
      rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until numBands).map { j =>
      val rowCols = (0 until rowsPerBand).map(r => element_at(col("sig"), j * rowsPerBand + r + 1))
      struct(lit(j).as("j"), xxhash64(lit(j) +: rowCols: _*).as("h"))
    }
    sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.j").as("band_j"), col("band.h").as("band_h"))
  }

  /** Signature aggregate + banding in one call (the single-layout path). */
  private def bandKeys(shingleRows: DataFrame, numBands: Int,
      rowsPerBand: Int): DataFrame =
    bandKeysFromSignatures(
      minhashSignatures(shingleRows, numBands * rowsPerBand), numBands, rowsPerBand)

  /** Distinct unordered candidate pairs (d1 < d2) from a band-key frame:
    * buckets → pairs via a codegen'd self-equi-join on the band key (AQE
    * handles skewed buckets); a collect_set + lambda expansion would run
    * interpreted and concentrate giant buckets on single tasks. */
  def lshCandidatePairs(banded: DataFrame): DataFrame =
    banded.as("a")
      .join(banded.as("b"),
        col("a.band_j") === col("b.band_j") && col("a.band_h") === col("b.band_h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()

  /** Exact-jaccard verification of a candidate pair frame (d1, d2) against
    * shingle-hash rows: shingle sets are built ONLY for docs appearing in a
    * candidate pair (semi join), so the pass over the shingle rows collects
    * a tiny fraction of the corpus at scale. Returns (d1, d2, jaccard)
    * restricted to jaccard ≥ threshold — precision 1.0 by construction. */
  def verifiedJaccardPairs(shingleRows: DataFrame, candidates: DataFrame,
      threshold: Double): DataFrame = {
    val candidateDocs = candidates
      .select(explode(array(col("d1"), col("d2"))).as("doc_id")).distinct()
    val sets = candidateShingleSets(shingleRows, candidateDocs)
    candidates
      .join(sets.withColumnRenamed("doc_id", "d1").withColumnRenamed("sh", "sh1"), "d1")
      .join(sets.withColumnRenamed("doc_id", "d2").withColumnRenamed("sh", "sh2"), "d2")
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  /** Per-doc shingle-hash sets restricted (semi join) to candidate `ids` —
    * the verify-stage input shared by [[minhashLsh]] and
    * [[incrementalDedup]]: set construction stays linear in the candidate
    * count, not the corpus size. */
  private def candidateShingleSets(shingleRows: DataFrame, ids: DataFrame): DataFrame =
    shingleRows.join(ids, Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(collect_set(col("sh")).as("sh"))

  /** Exact jaccard between two shingle-hash set columns. */
  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /**
   * MinHash + LSH near-duplicate pairs (Broder '97 banding, public
   * technique): shingle → one xxhash64 per shingle → `numBands*rowsPerBand`
   * affine permutations g_i(h) = (a_i·h + b_i) mod M → per-band signature →
   * group by (band, signature) → candidate pairs within buckets → EXACT
   * jaccard verification on the candidates only.
   *
   * With rowsPerBand=4, numBands=48 the miss probability at jaccard ≥ 0.7 is
   * (1 − 0.7⁴)^48 ≈ 2e-6, so the output equals the exact O(n²) oracle with
   * overwhelming probability while doing linear work + one shuffle. r=4 (vs
   * the classic r=3 at this threshold) costs 1.5× more hashes but cuts the
   * false-candidate rate on low-jaccard background pairs by ~s·10×, which is
   * what bounds the verify stage on corpora with a small vocabulary.
   */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numBands: Int = 48, rowsPerBand: Int = 4,
                 threshold: Double = 0.7): DataFrame = {

    // Persisted because both the signature pass and the verify pass consume
    // it. distinct = false: MinHashSignature (a min) and the verify stage's
    // collect_set are both multiplicity-insensitive, so the per-doc dedup
    // exchange would be pure overhead.
    val shingleRows = shingleHashRows(docs, idCol, textCol, shingleN, distinct = false).cache()

    // candidates are ≪ n by LSH design; cached because both the verify
    // join and the candidate-doc semi-join inside verification consume them
    val candidates = lshCandidatePairs(bandKeys(shingleRows, numBands, rowsPerBand)).cache()

    verifiedJaccardPairs(shingleRows, candidates, threshold)
  }

  /**
   * Verified near-dup pair COUNTS for several band layouts sharing one
   * hash budget — the config-invariance audit ([[graft.queries]] x505)
   * without re-running the expensive stages per layout. All layouts must
   * satisfy numBands × rowsPerBand == the shared budget, so the
   * `MinHashSignature` aggregate (the dominant cost: one pass over every
   * shingle occurrence per doc) runs ONCE and each layout merely re-bands
   * the cached signature frame (a per-row regrouping + xxhash64). The
   * exact-jaccard verify stage is also shared: candidates are unioned
   * across layouts, verified once, and each layout's count is a semi join
   * of its own candidate set against the verified pairs. Returns one row
   * per layout: (num_bands, rows_per_band, n_pairs).
   *
   * At high-recall layouts the counts must COINCIDE (per-pair miss
   * probability ≤ ~1e-5 at τ=0.7 for 96×2 / 64×3 / 48×4) — which is what
   * licenses tuning bands for cost without re-validating correctness.
   */
  def minhashLshMultiConfig(docs: DataFrame, idCol: String, textCol: String,
      layouts: Seq[(Int, Int)], shingleN: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    require(layouts.nonEmpty, "at least one band layout")
    val budget = layouts.head._1 * layouts.head._2
    require(layouts.forall { case (b, r) => b * r == budget },
      s"all layouts must share the hash budget $budget")
    val spark = docs.sparkSession
    import spark.implicits._

    val shingleRows = shingleHashRows(docs, idCol, textCol, shingleN, distinct = false).cache()
    val sigs = minhashSignatures(shingleRows, budget).cache()

    // ONE self-join finds every layout's bucket collisions: each layout's
    // band indices are offset into a disjoint range, and the join key
    // includes band_j, so pairs can only form within one layout's bands.
    // (The band hash itself uses the layout-LOCAL index — identical to the
    // single-layout path, which the invariance spec relies on.)
    val offsets = layouts.scanLeft(0) { case (acc, (b, _)) => acc + b }
    val tagged = layouts.zip(offsets).zipWithIndex.map { case (((b, r), off), i) =>
      bandKeysFromSignatures(sigs, b, r)
        .select(col("doc_id"), lit(i).as("lay"),
          (col("band_j") + lit(off)).as("band_j"), col("band_h"))
    }.reduce(_ unionAll _)
    val taggedCands = tagged.as("a")
      .join(tagged.as("b"),
        col("a.band_j") === col("b.band_j") && col("a.band_h") === col("b.band_h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.lay").as("lay"), col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
      .cache()

    // Verify each distinct pair ONCE regardless of how many layouts
    // surfaced it; layout counts are an inner join back to the tags.
    val allCands = taggedCands.select("d1", "d2").distinct()
    val verified = verifiedJaccardPairs(shingleRows, allCands, threshold)
    val counts = taggedCands
      .join(verified.select("d1", "d2"), Seq("d1", "d2"))
      .groupBy("lay").agg(count(lit(1)).as("n_pairs"))
    val layoutDf = layouts.zipWithIndex
      .map { case ((b, r), i) => (i, b.toLong, r.toLong) }
      .toDF("lay", "num_bands", "rows_per_band")
    broadcast(layoutDf).join(counts, Seq("lay"), "left")
      .na.fill(0L, Seq("n_pairs"))
      .select("num_bands", "rows_per_band", "n_pairs")
      .orderBy("num_bands")
  }

  /**
   * Incremental (delta-vs-corpus) near-dup detection — the nightly-ingest
   * shape: score each NEW document against the EXISTING corpus without ever
   * self-joining the corpus. Both sides get the same MinHash band keys
   * ([[bandKeys]]); candidates come from a delta→corpus band equi-join, so
   * the corpus side is touched exactly once per band (in production its
   * signatures are precomputed and stored with the corpus — only the delta
   * is shingled per run) and the join cost scales with |delta|, not
   * |corpus|². Candidates are verified with exact jaccard.
   *
   * Returns one row per delta document: (doc_id, n_corpus_dups) — the
   * number of corpus documents with jaccard ≥ `threshold`. Rows with 0 are
   * the survivors safe to append; the count (not just a flag) makes the
   * ingest decision log auditable. Same banding parameters as
   * [[minhashLsh]] ⇒ same ~2e-6 per-pair miss probability vs the exact
   * oracle.
   */
  def incrementalDedup(corpus: DataFrame, delta: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3, numBands: Int = 48,
      rowsPerBand: Int = 4, threshold: Double = 0.7): DataFrame = {
    val dRows = shingleHashRows(delta, idCol, textCol, shingleN, distinct = false).cache()
    val cRows = shingleHashRows(corpus, idCol, textCol, shingleN, distinct = false).cache()
    val candidates = bandKeys(dRows, numBands, rowsPerBand).as("a")
      .join(bandKeys(cRows, numBands, rowsPerBand).as("b"),
        col("a.band_j") === col("b.band_j") && col("a.band_h") === col("b.band_h"))
      .select(col("a.doc_id").as("d"), col("b.doc_id").as("c"))
      .distinct()
      .cache()
    val dSets = candidateShingleSets(dRows,
      candidates.select(col("d").as("doc_id")).distinct())
    val cSets = candidateShingleSets(cRows,
      candidates.select(col("c").as("doc_id")).distinct())
    val dupCounts = candidates
      .join(dSets.withColumnRenamed("doc_id", "d").withColumnRenamed("sh", "sh1"), "d")
      .join(cSets.withColumnRenamed("doc_id", "c").withColumnRenamed("sh", "sh2"), "c")
      .filter(jaccard(col("sh1"), col("sh2")) >= threshold)
      .groupBy("d").agg(count(lit(1)).as("n_corpus_dups"))
    delta.select(col(idCol).as("doc_id"))
      .join(dupCounts.withColumnRenamed("d", "doc_id"), Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_corpus_dups"))
  }

  /**
   * Exact n-gram jaccard similarity for all pairs sharing at least one
   * shingle — the exact distributed algorithm (explode → join on shingle →
   * count per pair): work is Σ freq(shingle)², not O(n²), and every stage is
   * a plain shuffle the optimizer handles.
   *
   * The Σ freq² cost has a hot-key failure mode: one shingle appearing in
   * df documents contributes df² join rows, so a single high-frequency
   * trigram ("in the the") in a real corpus quadratically blows one task.
   * `maxDf` caps it (standard CCNet/SlimPajama practice): shingles with
   * document frequency > maxDf are dropped from the PAIR JOIN only — per-doc
   * set sizes stay exact, so the computed jaccard is a lower bound and the
   * capped output is a SUBSET of the uncapped output (never a false
   * positive; invariant-tested). A shingle in more than maxDf docs carries
   * ~no pair information anyway. The cap bounds the join at Σ min(df,
   * maxDf)² ≤ n·maxDf — linear in the corpus. [[minhashLsh]] remains the
   * primary scale path.
   */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, minJaccard: Double = 0.5,
                   maxDf: Int = 1000): DataFrame = {
    require(maxDf >= 1, "maxDf must be positive")
    // Shingle-hash rows (codegen'd, see shingleHashRows): the shuffled join
    // key is 8 bytes and comparison is a long equality; a cross-shingle hash
    // collision inside one doc pair would overcount by 1 with probability
    // ~(distinct shingles)²/2^64 — negligible at any SF.
    val tokens = shingleHashRows(docs, idCol, textCol, shingleN).cache()
    val sizes = tokens.groupBy("doc_id").agg(count(lit(1)).as("n"))

    // df cap: one partial-agged exchange on the 8-byte shingle key, then a
    // semi join that AQE broadcasts when the surviving vocabulary is small.
    val rare = tokens.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    val joinable = tokens.join(rare, Seq("sh"), "left_semi")

    val inter = joinable.as("a")
      .join(joinable.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))

    inter
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("d1", "d2", "jaccard")
  }

  /**
   * Exact n-gram CONTAINMENT pairs: overlap normalized by the SMALLER
   * shingle set — `|A∩B| / min(|A|,|B|)` — instead of the union. Catches
   * the asymmetric duplication jaccard structurally cannot: a short doc
   * quoted whole inside a long one scores containment ≈ 1 while its
   * jaccard ≈ |A|/|B| ≈ 0 (the quote-expansion / boilerplate-wrapping
   * case a web-corpus dedup pass must flag). Same scale shape as
   * [[ngramJaccard]]: hashed 8-byte shingle join with the same
   * document-frequency cap bounding the hot-key quadratic.
   */
  def ngramContainment(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int = 3, minContainment: Double = 0.6,
                       maxDf: Int = 1000): DataFrame = {
    require(maxDf >= 1, "maxDf must be positive")
    // cached: sizes, the df filter, and the pair join all consume it.
    // Caller-managed lifecycle (ContextCleaner reclaims it once the result
    // is materialized and dropped) — see Analytics.coOccurrenceLift.
    val tokens = shingleHashRows(docs, idCol, textCol, shingleN).cache()
    val sizes = tokens.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val rare = tokens.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("sh")
    val joinable = tokens.join(rare, Seq("sh"), "left_semi")
    val inter = joinable.as("a")
      .join(joinable.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
      .withColumn("containment",
        col("inter").cast("double") / least(col("n1"), col("n2")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select("d1", "d2", "containment")
  }

  /**
   * EXACT set-similarity self-join via PREFIX FILTERING (the AllPairs /
   * PPJoin family — public technique): for jaccard ≥ t, two shingle sets
   * MUST share an element within each set's first `|d| − ceil(t·|d|) + 1`
   * elements under a COMMON global order (proof: the smallest shared
   * element has ≥ o−1 shared elements after it in both sets, and
   * o ≥ t·max(|x|,|y|) forces its rank into both prefixes). Candidates
   * therefore come from a self-equi-join on PREFIX rows only; exact
   * jaccard verification removes false positives and the bound admits
   * ZERO false negatives — output equality with the full shingle join is
   * a theorem, not a probability (vs [[minhashLsh]]'s 2e-6 miss) and
   * loses nothing (vs [[ngramJaccard]]'s lossy `maxDf` cap).
   *
   * The global order is ascending document frequency (rarest first, ties
   * by hash): prefixes then hold each doc's RAREST shingles, so the
   * candidate join's per-key fan-out is minimal by construction — the
   * stopword-grade keys that explode a naive shingle join never enter it.
   *
   * On top of the prefix bound, candidates pass PPJoin's LENGTH and
   * POSITIONAL filters before any shingle set is fetched — both still
   * exact-by-theorem: jaccard ≥ t forces min(|x|,|y|) ≥ t·max(|x|,|y|),
   * and with r = the EARLIEST rarity rank (1-based) a shared prefix
   * shingle holds in a doc, every rank before r is unshared, so
   * overlap ≤ 1 + min(|x|−r_x, |y|−r_y); jaccard ≥ t needs
   * overlap·(1+t) ≥ t·(|x|+|y|). Both inequalities are evaluated with a
   * 1e-12 RELATIVE slack on the threshold side — float rounding can only
   * ADMIT a boundary pair (removed by exact verification), never drop one.
   *
   * Scale shape: one vocabulary-bounded df aggregate, one per-doc window
   * for the prefix cut, a self-join over ~(1−t) of the shingle volume
   * (the rare tail of it), the length+positional candidate cut, and set
   * verification restricted to surviving candidate docs. All exchanges
   * hash-partitioned; nothing quadratic in the corpus.
   */
  def prefixFilterJaccard(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.7): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold $threshold not in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    // cached: df-count, prefix derivation, and verification all re-read the
    // shingle rows. Caller-managed lifecycle (ContextCleaner reclaims once
    // the returned frame is materialized and dropped) — see coOccurrenceLift.
    val tokens = shingleHashRows(docs, idCol, textCol, shingleN).cache()
    val sizes = tokens.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val dfreq = tokens.groupBy("sh").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    val prefix = tokens.join(dfreq, "sh")
      .withColumn("rk", row_number().over(byRarity))
      .join(sizes, "doc_id")
      .filter(col("rk") <= col("n") - ceil(col("n") * threshold) + 1)
      .select("doc_id", "sh", "rk", "n")
    val candidates = prefix.as("a")
      .join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      // same (d1, d2) exchange the old distinct() paid; the aggregate also
      // carries the earliest shared prefix ranks + sizes for the cut below
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(min(col("a.rk")).as("__r1"), min(col("b.rk")).as("__r2"),
        first(col("a.n")).as("__n1"), first(col("b.n")).as("__n2"))
      .filter(
        least(col("__n1"), col("__n2")).cast("double")
          >= greatest(col("__n1"), col("__n2")) * threshold * (1 - 1e-12) &&
        (lit(1) + least(col("__n1") - col("__r1"), col("__n2") - col("__r2")))
          .cast("double") * (1 + threshold)
          >= (col("__n1") + col("__n2")) * threshold * (1 - 1e-12))
      .select("d1", "d2")
      // cached: consumed by the candidate-doc collapse AND the final
      // verification join. Same caller-managed lifecycle as tokens above.
      .cache()
    val candidateDocs = candidates
      .select(explode(array(col("d1"), col("d2"))).as("doc_id")).distinct()
    val sets = candidateShingleSets(tokens, candidateDocs)
    candidates
      .join(sets.withColumnRenamed("doc_id", "d1").withColumnRenamed("sh", "sh1"), "d1")
      .join(sets.withColumnRenamed("doc_id", "d2").withColumnRenamed("sh", "sh2"), "d2")
      .withColumn("jaccard", jaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  /**
   * Blocking-quality audit — the standard record-linkage evaluation pair
   * (pairs completeness + reduction ratio, Christen's framework; public
   * technique) for the exact prefix-filter blocking of
   * [[prefixFilterJaccard]]: candidates are pairs sharing ≥ 1 PREFIX
   * shingle (each doc's |s| − ⌈t·|s|⌉ + 1 rarest by (df, shingle) — the
   * AllPairs bound), truth is exact jaccard ≥ t on full shingle sets.
   * The prefix-filter theorem says completeness is EXACTLY 1e6 ppm; the
   * SQL oracle recomputes truth through an INDEPENDENT all-pairs
   * shared-shingle join, so a green row is a machine-checked certificate
   * of the zero-false-negative property next to the reduction ratio that
   * justifies running the filter at all. Reported `n_true_pairs` is the
   * verified-candidate count — equal to the independent truth count iff
   * no true pair was pruned.
   *
   * Scale shape: df collapse (vocabulary-bounded) → per-doc rarity window
   * (doc-partitioned) → candidate self-join on prefix shingles only →
   * verification restricted to candidates (the x114 shape); the
   * possible-pair denominator is arithmetic on one count. Shingles are
   * hashed with the PORTABLE 60-bit md5 ([[graft.operators.PortableHash]])
   * rather than xxhash64, so the (df, hash) rarity tie-break is
   * engine-portable and the oracle re-derives the candidate set, not just
   * the verified output.
   */
  def blockingQualityAudit(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.7): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold $threshold not in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    // Shingle STRINGS are hashed to the portable 60-bit md5 value right at
    // generation by the fused codegen'd
    // [[graft.functions.PortableShingleHashes]] (split → n-gram → md5 →
    // PER-DOC DISTINCT in one tight map-side loop — no interpreted HOF, no
    // per-occurrence md5 expression, and no (doc, sh) distinct exchange,
    // since the expression already dedupes within each document): the
    // (df, hash) rarity tie-break stays engine-portable (the oracle
    // recomputes the same md5), while every downstream join, window, and
    // set rides longs, not strings. Cached: df-count, prefix derivation,
    // and verification all re-read the rows. Caller-managed lifecycle
    // (ContextCleaner reclaims once the returned frame is materialized and
    // dropped) — see coOccurrenceLift.
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.PortableShingleHashes(col(textCol), shingleN)).as("sh"))
      .cache()
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val dfreq = toks.groupBy("sh").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))
    val prefix = toks.join(dfreq, "sh")
      .withColumn("rk", row_number().over(byRarity))
      .join(sizes, "doc_id")
      .filter(col("rk") <= col("n") - ceil(col("n") * threshold) + 1)
      .select("doc_id", "sh")
    val candidates = prefix.as("a")
      .join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
      .cache() // consumed by the count AND the verification join (same lifecycle)
    val candidateDocs = candidates
      .select(explode(array(col("d1"), col("d2"))).as("doc_id")).distinct()
    val sets = candidateShingleSets(toks, candidateDocs)
    val verified = candidates
      .join(sets.withColumnRenamed("doc_id", "d1").withColumnRenamed("sh", "sh1"), "d1")
      .join(sets.withColumnRenamed("doc_id", "d2").withColumnRenamed("sh", "sh2"), "d2")
      .filter(jaccard(col("sh1"), col("sh2")) >= threshold)
      .agg(count(lit(1)).as("n_true_pairs"))
    val nDocs = sizes.agg(count(lit(1)).as("n_docs"))
    val nCand = candidates.agg(count(lit(1)).as("n_candidate_pairs"))
    nDocs.crossJoin(broadcast(nCand)).crossJoin(broadcast(verified))
      .select(col("n_docs"),
        expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1) DIV 2 AS BIGINT)")
          .as("n_possible_pairs"),
        col("n_candidate_pairs"), col("n_true_pairs"))
      .select(col("n_docs"), col("n_possible_pairs"), col("n_candidate_pairs"),
        col("n_true_pairs"),
        // 1e6 by the prefix-filter theorem; the oracle computes
        // |truth ∩ candidates| / |independent truth| — red if a pair was lost
        lit(1000000L).as("completeness_ppm"),
        expr("""CAST(CASE WHEN n_possible_pairs > 0 THEN
              (n_possible_pairs - n_candidate_pairs) * 1000000
               DIV n_possible_pairs END AS BIGINT)""").as("reduction_ppm"))
  }

  /**
   * Sorted-neighborhood (SNM) blocking audit — the THIRD classic blocking
   * family next to LSH banding ([[minhashLsh]]) and prefix filtering
   * ([[blockingQualityAudit]]): sort by a key (here the text's first
   * `keyPrefixLen` chars), take every pair within `window` positions.
   * Unlike the prefix filter, SNM has NO completeness theorem — near-dups
   * whose sort keys diverge (a changed first word) land far apart — so
   * its pairs-completeness is an empirical number, measured here against
   * the exact prefix-filter truth. The table that shows WHY the
   * theorem-backed filter earns its extra df pass.
   *
   * Scale shape: the global rank is [[Sampling.globalRankRange]]'s
   * two-phase range rank (never a single-task sort); neighbor pairs come
   * from a width-`window` bucket equi-join (same + adjacent buckets — the
   * pigeonhole band argument, so every ≤`window` pair is found exactly
   * once and nothing wider joins); verification and the truth total ride
   * the existing candidate-restricted machinery.
   */
  def sortedNeighborhoodAudit(docs: DataFrame, idCol: String, textCol: String,
      truthPairs: Option[DataFrame] = None, window: Int = 10,
      keyPrefixLen: Int = 24, shingleN: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    require(window >= 1, "window must be positive")
    val keyed = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        substring(col(textCol), 1, keyPrefixLen).as("__k"))
    val ranked = graft.operators.Sampling
      .globalRankRange(keyed, "doc_id", "__k")
      .select(col("doc_id"), col("global_rank").as("__r"))
      .withColumn("__b", expr(s"(__r - 1) DIV $window"))
    val same = ranked.as("a").join(ranked.as("b"),
      col("a.__b") === col("b.__b") && col("a.__r") < col("b.__r"))
    val adj = ranked.as("a").join(ranked.as("b"),
      col("a.__b") + 1 === col("b.__b") &&
        col("b.__r") - col("a.__r") <= window)
    val candidates = same.unionAll(adj)
      .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("d2"))
      .cache() // counted AND verified (caller-managed lifecycle, see above)
    val shingleRows = shingleHashRows(docs, idCol, textCol, shingleN)
    val candidateDocs = candidates
      .select(explode(array(col("d1"), col("d2"))).as("doc_id")).distinct()
    val sets = candidateShingleSets(shingleRows, candidateDocs)
    val found = candidates
      .join(sets.withColumnRenamed("doc_id", "d1").withColumnRenamed("sh", "sh1"), "d1")
      .join(sets.withColumnRenamed("doc_id", "d2").withColumnRenamed("sh", "sh2"), "d2")
      .filter(jaccard(col("sh1"), col("sh2")) >= threshold)
      .agg(count(lit(1)).as("n_true_found"))
    // Truth total: caller-supplied exact pair set (e.g. the session's
    // verified LSH staging frame, restricted to these docs) or, by
    // default, a fresh theorem-exact prefix-filter pass.
    val truthTotal = truthPairs
      .getOrElse(prefixFilterJaccard(docs, idCol, textCol, shingleN, threshold))
      .agg(count(lit(1)).as("n_true_total"))
    val nDocs = keyed.agg(count(lit(1)).as("n_docs"))
    val nCand = candidates.agg(count(lit(1)).as("n_candidate_pairs"))
    nDocs.crossJoin(broadcast(nCand)).crossJoin(broadcast(found))
      .crossJoin(broadcast(truthTotal))
      .select(col("n_docs"),
        expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1) DIV 2 AS BIGINT)")
          .as("n_possible_pairs"),
        col("n_candidate_pairs"), col("n_true_found"), col("n_true_total"))
      .select(col("n_docs"), col("n_possible_pairs"), col("n_candidate_pairs"),
        col("n_true_found"), col("n_true_total"),
        expr("""CAST(CASE WHEN n_true_total > 0 THEN
              n_true_found * 1000000 DIV n_true_total END AS BIGINT)""")
          .as("completeness_ppm"),
        expr("""CAST(CASE WHEN n_possible_pairs > 0 THEN
              (n_possible_pairs - n_candidate_pairs) * 1000000
               DIV n_possible_pairs END AS BIGINT)""").as("reduction_ppm"))
  }

  /**
   * Prefix-corpus novelty: for each document — with the corpus ordered by
   * ingest id — how many distinct n-gram shingles it contains and how many
   * of them appear in NO earlier document. The content-growth signal a
   * crawl pipeline tracks ("is today's batch new text or re-crawl?") and
   * the greedy form of novelty-based curriculum selection; `n_novel = 0`
   * flags a document wholly assembled from previously-seen text even when
   * no single pair-level duplicate exists.
   *
   * Scale shape: NO pair join — one exchange on the shingle hash computes
   * each shingle's first-occurrence id (min over docs), one exchange on the
   * doc id folds per-doc totals; cost is linear in corpus shingle volume,
   * so it runs where the quadratic dedup passes cannot. Docs shorter than
   * `shingleN` tokens emit zero shingles and report (0, 0) via the
   * left join back to the corpus spine.
   */
  def prefixNovelty(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3): DataFrame = {
    val sh = shingleHashRows(docs, idCol, textCol, shingleN)
    val firstSeen = sh.groupBy("sh").agg(min(col("doc_id")).as("first_doc"))
    val perDoc = sh.join(firstSeen, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
  }

  /**
   * Duplicate clusters from a near-dup pair list: iterative min-label
   * propagation (the two-phase connected-components pattern) bounded to
   * `iterations` rounds — each round is one join + one aggregation, so the
   * cost is O(rounds) shuffles regardless of corpus size. Near-dup clusters
   * are dense (near-cliques), so their diameter is tiny and a small fixed
   * round count reaches the fixpoint; bounding the rounds keeps the operator
   * deterministic and lets an unrolled SQL oracle replicate it exactly.
   * Output: (doc_id, cluster) with cluster = min doc_id reachable within
   * `iterations` hops.
   */
  def dupClusters(pairs: DataFrame, iterations: Int = 3): DataFrame = {
    // Cache the edge list: every propagation round re-reads it, and without
    // the cache the (expensive) upstream pair pipeline re-executes per round.
    // Near-dup pair lists are tiny relative to the corpus, so this is safe
    // at any scale.
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .union(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .cache()
    // Each round references `labels` twice (neighbour lookup + outer join),
    // so an untruncated chain doubles per iteration — 2^rounds plan size and
    // recomputation at action time. `localCheckpoint()` (eager) materializes
    // each round AND truncates lineage to a scanned RDD, so plan depth and
    // per-round cost stay CONSTANT no matter how high `iterations` is raised
    // (PlanSpec pins the bounded plan). `cache()` alone is not enough: the
    // InMemoryRelation still embeds the doubled child plan, which the
    // analyzer/planner re-walks every round. Superseded round RDDs are
    // unpersisted by Spark's ContextCleaner once unreferenced; on clusters
    // where executor loss matters, swap for reliable `checkpoint()`.
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    for (_ <- 0 until iterations) {
      val nbr = edges
        .join(labels.select(col("node").as("bnode"), col("label").as("blabel")),
          col("b") === col("bnode"))
        .groupBy(col("a")).agg(min(col("blabel")).as("nl"))
      labels = labels.join(nbr, labels("node") === nbr("a"), "left")
        .select(col("node"), least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint()
    }
    labels.select(col("node").as("doc_id"), col("label").as("cluster"))
  }

  /**
   * CLUSTER DENSITY audit — per near-dup cluster size: how complete is
   * the direct-evidence graph? `density_ppm = 2·|direct pairs| · 1e6
   * DIV (n·(n−1))`: 1e6 means every member pair was independently
   * verified; low density means the cluster is held together by
   * TRANSITIVE chains, the classic over-merge smell (A~B~C where A and
   * C share nothing) that decides whether [[connectedComponents]]
   * families are safe to collapse to one representative.
   *
   * Scale shape: components come from the vote-to-halt CC; sizes and
   * per-cluster pair counts are two label-keyed collapses (the pair→
   * label map rides the d1 endpoint — both endpoints share a label by
   * construction); the report rolls up by cluster size. Density
   * numerators ride DECIMAL(38,0) (pairs·2e6 outruns BIGINT in the
   * pathological giant-cluster case this audit exists to catch).
   */
  def clusterDensityAudit(pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
      .select(col("doc_id").as("d1"), col("cluster").as("label"))
    val sizes = cc.groupBy("label").agg(count(lit(1)).as("n_nodes"))
    val pl = pairs.select(col("d1"))
      .join(cc, "d1")
      .groupBy("label").agg(count(lit(1)).as("n_pairs"))
    sizes.join(pl, Seq("label"), "left")
      .select(col("n_nodes"), coalesce(col("n_pairs"), lit(0L)).as("__p"))
      .withColumn("density_ppm",
        expr("""CAST(CAST(__p AS DECIMAL(38,0)) * 2000000
          DIV (CAST(n_nodes AS DECIMAL(38,0)) * (n_nodes - 1)) AS BIGINT)"""))
      .groupBy(col("n_nodes").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        min(col("density_ppm")).as("min_density_ppm"),
        max(col("density_ppm")).as("max_density_ppm"),
        sum(col("__p")).as("total_direct_pairs"))
      .orderBy("cluster_size")
  }

  /**
   * BOILERPLATE MASS per source — the share of a source's line-chunks
   * (and of its tokens) sitting in chunks that repeat across `minDocs`+
   * documents: headers, footers, nav bars, license blocks. [[lineDedup]]
   * answers it per document; this is the SOURCE procurement view — "is
   * this feed 5 % boilerplate or 60 %?" — which decides whether the
   * source gets line-filtered or dropped wholesale.
   *
   * Scale shape: the chunk stream is map-side ([[TextAnalysis.chunkDocs]]'s
   * md5 keys), document frequency is one chunk-keyed collapse joined
   * back by the 32-byte hash, and the report is |sources| rows.
   */
  def boilerplateMass(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, lineTokens: Int = 10, minDocs: Int = 3): DataFrame = {
    require(minDocs >= 2, s"minDocs $minDocs must be >= 2")
    // chunkDocs canonicalizes the id column to "doc_id"
    val chunks = TextAnalysis.chunkDocs(
        docs.filter(col(sourceCol).isNotNull), idCol, textCol,
        window = lineTokens, stride = lineTokens)
      .join(docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source")),
        "doc_id")
    val docFreq = chunks.groupBy("chunk_md5")
      .agg(countDistinct(col("doc_id")).as("__df"))
    chunks.join(docFreq, "chunk_md5")
      .groupBy("source")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens").cast("long")).as("n_tokens"),
        sum(when(col("__df") >= minDocs, 1L).otherwise(0L)).as("bp_chunks"),
        sum(when(col("__df") >= minDocs, col("n_tokens").cast("long"))
          .otherwise(0L)).as("bp_tokens"))
      .select(col("source"), col("n_chunks"), col("bp_chunks"),
        expr("bp_chunks * 1000000 DIV n_chunks").as("bp_chunk_ppm"),
        expr("bp_tokens * 1000000 DIV n_tokens").as("bp_token_ppm"))
      .orderBy("source")
  }

  /**
   * Connected components with a CONVERGENCE GUARANTEE — the scale path past
   * [[dupClusters]]'s fixed round count: the same min-label propagation
   * (one join + one aggregation per round, lineage truncated per round so
   * plan depth stays constant), iterated until a round changes ZERO labels.
   * The per-round convergence probe is a single count() over the two
   * checkpointed label frames — one scalar to the driver, the standard
   * Pregel-style voting-to-halt check, NOT a collect of the data.
   *
   * The fixpoint is the true component labeling (cluster = min doc_id in
   * the component) for ANY graph shape — long chains included — whereas a
   * fixed round count silently under-merges past its hop bound.
   * `maxIterations` is a fail-loud safety bound (label-min propagation
   * converges in O(diameter) rounds; a dup graph with diameter > 50 means
   * the threshold upstream is broken).
   */
  def connectedComponents(pairs: DataFrame, maxIterations: Int = 50): DataFrame = {
    val edges = pairs.select(col("d1").as("a"), col("d2").as("b"))
      .union(pairs.select(col("d2").as("a"), col("d1").as("b")))
      .cache()
    var labels = edges.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var it = 0
    var converged = false
    while (!converged && it < maxIterations) {
      val nbr = edges
        .join(labels.select(col("node").as("bnode"), col("label").as("blabel")),
          col("b") === col("bnode"))
        .groupBy(col("a")).agg(min(col("blabel")).as("nl"))
      val next = labels.join(nbr, labels("node") === nbr("a"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint()
      // round 1 always changes something (for any edge (a,b) the larger
      // endpoint adopts the smaller label), so its probe job is skipped
      val changed =
        if (it == 0 && maxIterations > 1) 1L
        else next.as("n")
          .join(labels.as("o"), col("n.node") === col("o.node"))
          .filter(col("n.label") =!= col("o.label"))
          .count()
      labels = next
      converged = changed == 0
      it += 1
    }
    require(converged, s"components did not converge within $maxIterations rounds")
    labels.select(col("node").as("doc_id"), col("label").as("cluster"))
  }

  /**
   * Line-level (chunk-hash) dedup — the boilerplate-removal pass (CCNet /
   * RefinedWeb line dedup re-expressed for an unlined corpus): documents
   * are cut into aligned non-overlapping `lineTokens`-token chunks
   * ([[TextAnalysis.chunkDocs]] with window = stride, map-side), a chunk
   * whose content hash appears in MORE THAN ONE document is boilerplate
   * and is dropped everywhere; per document the operator reports how much
   * survives: (doc_id, n_chunks, n_kept, kept_tokens).
   *
   * Scale shape: one exchange on the 16-byte chunk hash computes document
   * frequency (countDistinct partial-aggregates map-side); the join back
   * to chunks reuses that hash partitioning; one final exchange
   * re-aggregates per doc. No pairwise work at any point — cost is linear
   * in the chunk count regardless of how widespread the boilerplate is
   * (contrast: shingle pair joins are Σ df²).
   */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
      lineTokens: Int = 10): DataFrame = {
    val chunks = TextAnalysis.chunkDocs(docs, idCol, textCol,
      window = lineTokens, stride = lineTokens)
    val docFreq = chunks.groupBy("chunk_md5")
      .agg(countDistinct(col("doc_id")).as("docfreq"))
    chunks.join(docFreq, "chunk_md5")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("docfreq") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("docfreq") === 1, col("n_tokens").cast("long"))
          .otherwise(0L)).as("kept_tokens"))
  }

  /**
   * Representative selection after clustering — the final step of a corpus
   * dedup pipeline: keep exactly one doc per duplicate cluster, the one with
   * the highest `score` (ties → smallest doc_id); docs in no cluster keep
   * themselves. One broadcast-able join (cluster labels ≪ corpus) plus one
   * hash aggregation with map-side partial `max_by` — no window over the
   * full corpus, no shuffle of the document text.
   */
  def retainBest(docs: DataFrame, idCol: String, score: Column,
                 clusters: DataFrame): DataFrame =
    docs.select(col(idCol).as("doc_id"), score.as("score"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .groupBy("cluster")
      .agg(max_by(col("doc_id"),
        struct(col("score"), (-col("doc_id")).as("tie"))).as("doc_id"))
      .select("doc_id")

  /**
   * Cluster-CAPPED retention — [[retainBest]] generalized from keep-1 to
   * keep-top-m: near-dup clusters are capped at `m` members ranked by
   * `score` (ties → smallest doc_id) instead of collapsed to one. The
   * soft-dedup policy (keep a couple of high-quality variants, cap the
   * boilerplate flood) used when exact collapse is too aggressive for the
   * training mix. Docs in no cluster always survive.
   *
   * Scale shape: one broadcast-able cluster-label join, then a window
   * ranked WITHIN clusters only (rows in no cluster bypass the rank via
   * the coalesced singleton label — the window input is bounded by
   * clustered docs, which near-dup graphs keep ≪ corpus).
   */
  def retainTopM(docs: DataFrame, idCol: String, score: Column,
                 clusters: DataFrame, m: Int): DataFrame = {
    require(m >= 1, "m must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cluster").orderBy(desc("score"), col("doc_id"))
    docs.select(col(idCol).as("doc_id"), score.as("score"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= m)
      .select("doc_id")
  }

  /**
   * GOLDEN-RECORD survivorship per near-dup cluster — the MDM merge step
   * [[retainBest]] stops short of: instead of picking ONE winner, build
   * the cluster's merged record field-by-field under explicit,
   * deterministic rules (representative = min id; longest text's id with
   * min-id tie-break; best quality score; member count; pooled size).
   * Every rule is a plain aggregate, so the record is reproducible and
   * each field's provenance policy is visible in the output schema.
   *
   * Scale shape: one broadcast-able cluster-label join (unlabeled docs
   * become singleton clusters via the coalesced id — they survive as
   * their own golden record), then ONE map-side-combined aggregate per
   * cluster. The longest-text pick uses `max_by` over a (len, −id)
   * struct — an aggregate, not a window, so no per-cluster sort.
   */
  def goldenRecord(docs: DataFrame, idCol: String, textCol: String,
      scoreCentis: Column, clusters: DataFrame): DataFrame =
    docs.select(col(idCol).as("doc_id"), length(col(textCol)).cast("long")
        .as("__len"), scoreCentis.as("__q"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"),
        min(col("doc_id")).as("rep_doc"),
        max_by(col("doc_id"),
          struct(col("__len"), (-col("doc_id")).as("tie"))).as("longest_doc"),
        max(col("__len")).as("max_len"),
        max(col("__q")).as("best_quality_centi"),
        sum(col("__len")).as("total_chars"))

  /**
   * Per-document n-gram repetition statistics (the Gopher-style repetition
   * quality signal, public technique): total vs distinct n-gram occurrences
   * and the duplicate fraction. ZERO shuffles: a document's shingle hashes
   * are one in-row array ([[graft.functions.ShingleHashes]]), so total and
   * distinct counts are per-row expressions — no explode, no aggregation
   * (the groupBy+count_distinct formulation costs two exchanges for what is
   * row-local arithmetic). Docs shorter than n words emit no row.
   */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.ShingleHashes(col(textCol), n).as("shs"))
      .filter(size(col("shs")) > 0)
      .select(col("doc_id"),
        size(col("shs")).cast("long").as("n_grams"),
        size(array_distinct(col("shs"))).cast("long").as("n_unique"))
      .withColumn("dup_frac",
        lit(1.0) - col("n_unique").cast("double") / col("n_grams").cast("double"))

  /**
   * Eval-set decontamination: find training docs sharing at least one
   * word n-gram with a held-out benchmark/eval subset — the standard
   * n-gram-overlap contamination test applied before LLM training. `isEval`
   * partitions the corpus; the result is every NON-eval doc that shares ≥ 1
   * n-gram with ANY eval doc, with the count of distinct shared n-grams.
   *
   * Scale: both sides shingle map-side ([[shingleHashRows]], codegen'd, no
   * exchange); the eval side collapses to a DISTINCT 8-byte hash set that is
   * orders of magnitude smaller than the corpus, so the contamination join
   * is a hash semi-style equi-join on a long key (broadcastable when the
   * eval set is small, AQE decides), followed by one partial-aggregating
   * count per doc. No doc×doc pairwise work at any stage; set equality on
   * hashes equals set equality on n-grams up to 64-bit collisions.
   */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    isEval: Column, n: Int = 8): DataFrame = {
    val evalShingles = shingleHashRows(docs.filter(isEval), idCol, textCol, n)
      .select("sh").distinct()
    val trainShingles = shingleHashRows(docs.filter(!isEval), idCol, textCol, n)
    trainShingles.join(evalShingles, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Portable 60-bit word hash: first 15 hex chars of md5, parsed base-16.
    * Unlike xxhash64, md5 is computable in any SQL engine, which makes the
    * simhash pipeline built on it fully oracle-checkable; 15 hex chars keep
    * the value inside a signed 64-bit int on both sides. */
  val portableWordHash: Column => Column =
    w => PortableHash.hash60(w)

  /**
   * Edit-distance near-duplicate pairs: among documents whose token-set
   * jaccard is ≥ `minJaccard`, those whose Levenshtein distance over the
   * first `prefixLen` characters is ≤ `maxDist` — the character-level
   * refinement token sets can't see (in-word edits, word-order moves).
   *
   * Scale shape: CANDIDATE-RESTRICTED VERIFICATION — candidates come from
   * [[minhashLsh]] (banded, exact-jaccard-verified), and the
   * O(prefixLen²) levenshtein runs ONLY on that near-dup-sized pair set
   * after two hash joins pull in the prefixes (broadcast when the
   * candidate set is small; AQE decides). The tempting "exact" alternative
   * — self-join on prefix-LENGTH bands (strings within edit k differ ≤ k
   * in length) — silently collapses to ONE band the moment prefixes are
   * fixed-length (every long doc truncates to exactly `prefixLen` chars),
   * which funnels all O(n²) pairs through a single hot join key: the
   * Σ freq(key)² killer. Deleted in favor of this shape; measured: the
   * banded version ran minutes at sf0.1 where this runs in seconds.
   *
   * Truncating to `prefixLen` bounds per-pair cost (quadratic in prefix,
   * not doc length) — near-dup docs overwhelmingly agree in their head.
   */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 20, prefixLen: Int = 80, minJaccard: Double = 0.7): DataFrame = {
    val cands = minhashLsh(docs, idCol, textCol, threshold = minJaccard)
    val p = docs.select(col(idCol).as("pid"),
      substring(col(textCol), 1, prefixLen).as("pfx"))
    cands
      .join(p.as("p1"), col("d1") === col("p1.pid"))
      .join(p.as("p2"), col("d2") === col("p2.pid"))
      .select(col("d1"), col("d2"),
        levenshtein(col("p1.pfx"), col("p2.pfx")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /**
   * Splice-overlap detection: ordered pairs (d1, d2) where the LAST
   * `k` tokens of d1 equal the FIRST `k` tokens of d2 — the signal for
   * spliced/cyclically-duplicated content and for documents that were cut
   * at a shared boundary (a chunking artifact that inflates n-gram counts
   * and leaks across train/eval splits).
   *
   * Scale shape: LINEAR — each doc contributes one head key and one tail
   * key (md5 of the k-token affix); detection is a single hash equi-join
   * tail→head. No pairwise work, no shingle table: cost is one exchange on
   * the 16-byte affix hash regardless of corpus size (hot affixes — e.g. a
   * boilerplate footer — fan out exactly like the duplicate content they
   * represent, and AQE splits those buckets).
   */
  def spliceOverlapPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, s"affix length $k must be >= 1")
    val ws = split(col(textCol), " ")
    val ht = docs
      .filter(size(ws) >= k)
      .select(col(idCol).as("doc_id"),
        md5(concat_ws(" ", slice(ws, 1, k))).as("head"),
        md5(concat_ws(" ", slice(ws, -k, k))).as("tail"))
    ht.as("a").join(ht.as("b"),
        col("a.tail") === col("b.head") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
  }

  /**
   * SimHash near-duplicate pairs. Each distinct word contributes ±1 per bit
   * of its hash; the sign vector folds into a `numBits`-bit fingerprint.
   * Candidate generation blocks on `numBands` equal bit-slices — any pair
   * within hamming distance ≤ numBands−1 shares at least one identical
   * slice (pigeonhole), so candidates are COMPLETE for `maxHamming` when
   * `maxHamming < numBands`; the exact hamming distance then filters.
   * All bit math in codegen'd expressions.
   *
   * `wordHash` defaults to xxhash64 (fastest, one codegen'd op); pass
   * [[portableWordHash]] to make the whole output reproducible by an
   * external SQL oracle (md5-derived 60-bit hashes, `numBits = 60`).
   */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   wordHash: Column => Column = xxhash64(_),
                   numBits: Int = 64, numBands: Int = 4): DataFrame = {
    require(numBands > maxHamming, "pigeonhole completeness needs numBands > maxHamming")
    require(numBits % numBands == 0, "numBands must divide numBits")
    val bandBits = numBits / numBands
    // bandBits = 64 would make `1L << 64` wrap to 1 (mask 0 -> one bucket ->
    // O(n^2) candidates); the scale property must fail loudly, not silently.
    require(bandBits <= 63, s"band width $bandBits bits exceeds 63 (mask would overflow); use numBands >= 2")
    val bandMask = (1L << bandBits) - 1
    // bit i of the fingerprint = sign of Σ_words (2·bit_i(h) − 1), computed
    // by the native SimHashSignature aggregate (64 separate sum() aggregates
    // would exceed codegen limits, like the MinHash case); map-side partial
    // aggregation keeps the exchange at one 64-int buffer per doc.
    val words = docs
      .select(col(idCol).as("doc_id"), explode(array_distinct(split(col(textCol), " "))).as("w"))
    val fps = words.groupBy("doc_id")
      .agg(graft.functions.SimHashSignature(wordHash(col("w"))).as("fp"))

    val slices = array((0 until numBands).map { q =>
      struct(lit(q).as("q"), shiftright(col("fp"), q * bandBits).bitwiseAND(bandMask).as("bits"))
    }: _*)
    val banded = fps.select(col("doc_id"), col("fp"), explode(slices).as("b"))
      .select(col("doc_id"), col("fp"), col("b.q").as("q"), col("b.bits").as("bits"))

    banded.as("a")
      .join(banded.as("b"),
        col("a.q") === col("b.q") && col("a.bits") === col("b.bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * DUP-CLUSTER SIZE census — the shape of the duplication problem: how
   * many near-dup clusters exist at each size, plus the members the
   * largest family holds. A corpus of pairs (size-2 families) dedups
   * cheaply; one 10 000-member family means a template/boilerplate source
   * that sampling-based review would misread as diverse. Consumes a
   * precomputed pair frame (the shared LSH staging) and the min-label
   * clusters [[dupClusters]] already derives from it.
   *
   * Scale shape: labels → per-cluster size aggregate (bounded by cluster
   * count) → size histogram (bounded by the largest family); all
   * exchanges on collapsed frames, the corpus never reappears.
   */
  def clusterSizeCensus(pairs: DataFrame, iterations: Int = 3): DataFrame =
    clusterSizeCensusFromLabels(dupClusters(pairs, iterations))

  /** [[clusterSizeCensus]] over a PRECOMPUTED (doc_id, cluster) label frame
    * — the seam that lets a session-memoized cluster build feed the census
    * without re-running label propagation. */
  def clusterSizeCensusFromLabels(labels: DataFrame): DataFrame = {
    val sizes = labels
      .groupBy("cluster").agg(count(lit(1)).as("__sz"))
    sizes.groupBy(col("__sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("__sz")).as("n_docs"))
      .orderBy("cluster_size")
  }

  /**
   * DEDUP THRESHOLD-SENSITIVITY sweep — how many pairs (and docs) would
   * each candidate jaccard threshold mark as duplicates? The curve a team
   * reads to CHOOSE τ: a cliff between 0.6 and 0.7 means the corpus has a
   * crisp dup/non-dup boundary there; a smooth slope means τ is a policy
   * knob, not a discovery. Computed from ONE pair materialization at the
   * lowest threshold — each higher τ is a filter over the same frame,
   * never a re-run of candidate generation.
   *
   * Scale shape: the pair pipeline runs once ([[ngramJaccard]], df-capped);
   * the sweep crosses the (tiny) pair frame with a broadcast threshold
   * spine; doc counts collapse (threshold, doc) before counting.
   */
  def thresholdSweep(docs: DataFrame, idCol: String, textCol: String,
      thresholds: Seq[Int] = Seq(50, 60, 70, 80, 90)): DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(t => t >= 1 && t <= 100),
      "thresholds must be percentages in [1,100]")
    val base = thresholds.min / 100.0
    val pairs = ngramJaccard(docs, idCol, textCol, minJaccard = base)
      // cached: every threshold row filters it. Caller-managed lifecycle —
      // see coOccurrenceLift.
      .cache()
    val ts = docs.sparkSession.createDataFrame(
      thresholds.sorted.map(Tuple1(_))).toDF("threshold_pct")
    val qual = pairs.crossJoin(broadcast(ts))
      .filter(col("jaccard") * 100 >= col("threshold_pct"))
    val np = qual.groupBy("threshold_pct").agg(count(lit(1)).as("n_pairs"))
    val nd = qual.select(col("threshold_pct"),
        explode(array(col("d1"), col("d2"))).as("doc"))
      .distinct()
      .groupBy("threshold_pct").agg(count(lit(1)).as("n_docs"))
    ts.join(np, Seq("threshold_pct"), "left")
      .join(nd, Seq("threshold_pct"), "left")
      .select(col("threshold_pct"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy("threshold_pct")
  }

  /**
   * DEDUP TOKEN-SAVINGS report — what does near-dup removal actually buy,
   * in TOKENS, per source? Training budgets are token-denominated, so
   * "3% of docs are dups" understates the win when the dups are long:
   * this reports tokens before, tokens dropped (every cluster member
   * except the min-id representative — [[exact]]'s keep-min convention),
   * and the savings in exact ppm. Consumes the shared LSH pair staging
   * via [[dupClusters]].
   *
   * Scale shape: labels → per-cluster min (cluster-bounded) → the
   * dropped-id set semi-joins the (id, source, tokens) projection; the
   * rollup is |sources|-bounded. Token counts are row-local
   * `size(split(...))`.
   */
  def dedupTokenSavings(docs: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, sourceCol: String, iterations: Int = 3): DataFrame =
    dedupTokenSavingsFromLabels(docs, dupClusters(pairs, iterations),
      idCol, textCol, sourceCol)

  /** [[dedupTokenSavings]] over a PRECOMPUTED (doc_id, cluster) label frame
    * — the memoized-staging seam, like [[clusterSizeCensusFromLabels]]. */
  def dedupTokenSavingsFromLabels(docs: DataFrame, clusterLabels: DataFrame,
      idCol: String, textCol: String, sourceCol: String): DataFrame = {
    // dupClusters canonicalizes its output to (doc_id, cluster); rename the
    // id back to the caller's idCol so the join below resolves for any name.
    val labels = clusterLabels.withColumnRenamed("doc_id", idCol)
    val reps = labels.groupBy("cluster").agg(min(col(idCol)).as("__rep"))
    val dropped = labels.join(reps, "cluster")
      .filter(col(idCol) =!= col("__rep"))
      .select(col(idCol), lit(1L).as("__drop"))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(sourceCol).as("source"),
        size(split(col(textCol), " ")).cast("long").as("__tok"))
      .join(dropped, Seq(idCol), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("tokens_total"),
        sum(when(col("__drop").isNotNull, col("__tok")).otherwise(0L))
          .as("tokens_dropped"))
      .select(col("source"), col("n_docs"), col("tokens_total"),
        col("tokens_dropped"),
        expr("tokens_dropped * 1000000 DIV tokens_total").as("savings_ppm"))
      .orderBy("source")
  }

  /**
   * CROSS-SOURCE duplicate census — where does the duplication COME
   * from? Verified near-dup pairs bucketed by their endpoints' source
   * pair (unordered): the off-diagonal cells are syndication/mirroring
   * between feeds; the diagonal is within-source boilerplate. The
   * pair-grain complement of x126's n-gram contamination matrix —
   * these pairs passed FULL similarity verification, not just shared
   * n-grams.
   *
   * Scale shape: the pair frame joins the (id → source) projection
   * twice (hash joins on doc ids); the census is |sources|²-bounded.
   */
  def crossSourceDups(docs: DataFrame, pairs: DataFrame, idCol: String,
      sourceCol: String): DataFrame = {
    val src = docs.select(col(idCol), col(sourceCol).as("__s"))
    pairs
      .join(src.withColumnRenamed(idCol, "d1").withColumnRenamed("__s", "__s1"), "d1")
      .join(src.withColumnRenamed(idCol, "d2").withColumnRenamed("__s", "__s2"), "d2")
      .groupBy(least(col("__s1"), col("__s2")).as("source_1"),
        greatest(col("__s1"), col("__s2")).as("source_2"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_1", "source_2")
  }

  /**
   * NEAR-DUP pair EXPLANATIONS — the review artifact behind a dedup
   * decision: for the `nPairs` highest-similarity pairs, the
   * `nShingles` RAREST shingles the two documents share (rarest = lowest
   * corpus document frequency — the shared content that is least
   * explainable by chance, which is what a human reviewer needs to see
   * to trust the match; shared stopword shingles explain nothing).
   * Shingles here are the readable 3-gram STRINGS, not their hashes —
   * an explanation you can't read isn't one.
   *
   * Scale shape: the pair frame is collapsed to its top-`nPairs` via
   * TakeOrdered and broadcast; shingle rows are generated ONLY for the
   * ≤ 2·nPairs docs those pairs mention (semi join before the explode);
   * the df lookup joins the |vocab|-bounded frequency frame; the
   * rarest-k rank partitions by pair. Corpus-wide work is the one df
   * aggregate — everything else is pairs-bounded.
   */
  def nearDupExplanations(docs: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, nPairs: Int = 10, nShingles: Int = 3): DataFrame = {
    require(nPairs >= 1 && nShingles >= 1, "nPairs and nShingles must be positive")
    import org.apache.spark.sql.expressions.Window
    val top = pairs.orderBy(col("jaccard").desc, col("d1"), col("d2"))
      .limit(nPairs)
    val mentioned = top.select(explode(array(col("d1"), col("d2"))).as(idCol))
      .distinct()
    def shingles(src: DataFrame) = {
      val ws = split(col(textCol), " ")
      src.select(col(idCol), ws.as("__ws"))
        .filter(size(col("__ws")) >= 3)
        .select(col(idCol), explode(transform(
          sequence(lit(0), size(col("__ws")) - 3),
          i => concat(element_at(col("__ws"), i + 1), lit(" "),
            element_at(col("__ws"), i + 2), lit(" "),
            element_at(col("__ws"), i + 3)))).as("sh"))
        .distinct()
    }
    // df over the FULL corpus (rarity is a corpus property); shingle rows
    // for the mentioned docs only
    val dfreq = shingles(docs.filter(col(textCol).isNotNull))
      .groupBy("sh").agg(count(lit(1)).as("df"))
    val mdocs = shingles(
      docs.join(broadcast(mentioned), Seq(idCol), "left_semi"))
    val shared = broadcast(top).as("p")
      .join(mdocs.as("s1"), col("p.d1") === col(s"s1.$idCol"))
      .join(mdocs.as("s2"),
        col("p.d2") === col(s"s2.$idCol") && col("s1.sh") === col("s2.sh"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"),
        col("p.jaccard").as("jaccard"), col("s1.sh").as("sh"))
      .join(dfreq, "sh")
    val byPair = Window.partitionBy("d1", "d2")
      .orderBy(col("df"), col("sh"))
    shared.withColumn("rk", row_number().over(byPair).cast("long"))
      .filter(col("rk") <= nShingles)
      .select(col("d1"), col("d2"), col("jaccard"), col("rk"),
        col("sh").as("shared_shingle"), col("df"))
  }

  /**
   * DEDUPLICATION-RATE report by source — the corpus-health dashboard row:
   * per source, how many documents are exact duplicates (their full text
   * appears on ≥ 2 docs) and how many sit in at least one near-duplicate
   * pair, as counts and exact ppm rates. This is the STAGING-CONSUMER
   * pattern: `pairs` is a precomputed near-dup pair frame (d1, d2) — the
   * LSH staging table four other queries already share — so the report
   * never re-runs candidate generation.
   *
   * Scale shape: exact-dup flags ride ONE text-keyed exchange (a count
   * window over the text partition — each partition is one text's
   * duplicate family, never the corpus); near-dup membership is a
   * left-semi probe of the pair frame exploded to doc ids; the rollup is
   * |sources|-bounded.
   */
  def dedupRateBySource(docs: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, sourceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fam = Window.partitionBy(col(textCol))
    val flagged = docs
      .withColumn("__exact", when(count(lit(1)).over(fam) > 1, 1L).otherwise(0L))
    val nearIds = pairs
      .select(explode(array(col("d1"), col("d2"))).as(idCol)).distinct()
    flagged
      .join(nearIds.withColumn("__near", lit(1L)), Seq(idCol), "left")
      .groupBy(sourceCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__exact")).as("n_exact_dup"),
        sum(coalesce(col("__near"), lit(0L))).as("n_near_dup"))
      .select(col(sourceCol), col("n_docs"), col("n_exact_dup"), col("n_near_dup"),
        expr("n_exact_dup * 1000000 DIV n_docs").as("exact_ppm"),
        expr("n_near_dup * 1000000 DIV n_docs").as("near_ppm"))
  }

  /**
   * BLOCKED fuzzy NAME MATCHING — the entity-resolution primitive: which
   * distinct name strings in a corpus are within `maxDist` Damerau-
   * Levenshtein edits of each other, and how many record pairs does each
   * name pair represent? Catches the typo/variant families plain exact
   * dedup ([[exact]]) misses ("cold ring" vs "old ring") using a true
   * edit metric, transpositions included ([[graft.functions.DamerauLevenshtein]]).
   *
   * The two scale disciplines, in order:
   *  1. COLLAPSE TO VOCABULARY first — the corpus is aggregated to
   *     (distinct name, record count) before any pairing, so the O(|a|·|b|)
   *     DP runs on name-pair count, not record-pair count; the record
   *     multiplicity comes back as `pair_count = n1·n2` for free.
   *  2. BLOCK the vocabulary self-join on the last whitespace token (the
   *     entity's head noun / type) — candidate pairs share a block key, so
   *     the join is hash-partitioned and never all-pairs. The standard ER
   *     trade is stated: a typo IN the block key escapes the block (missed
   *     pair), the price of never comparing across types.
   *
   * Output: (name_1, name_2, dist, n_1, n_2, pair_count), name_1 < name_2.
   */
  def blockedNameMatch(df: DataFrame, nameCol: String, maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist $maxDist must be >= 1")
    val vocab = df.filter(col(nameCol).isNotNull)
      .groupBy(col(nameCol).as("__name"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__blk", regexp_extract(col("__name"), "(\\S+)$", 1))
    vocab.as("a")
      .join(vocab.as("b"),
        col("a.__blk") === col("b.__blk") && col("a.__name") < col("b.__name"))
      .withColumn("dist",
        graft.functions.DamerauLevenshtein(col("a.__name"), col("b.__name")))
      .filter(col("dist") <= maxDist)
      .select(col("a.__name").as("name_1"), col("b.__name").as("name_2"),
        col("dist"), col("a.__n").as("n_1"), col("b.__n").as("n_2"),
        (col("a.__n") * col("b.__n")).as("pair_count"))
  }

  /**
   * TOKEN-SET canonical dup census — per source, docs whose SORTED
   * DISTINCT token set collides with another doc's, split into exact
   * text dups ([[exact]]'s families) vs REORDER-ONLY dups: texts equal
   * as bags of words but not as strings (shuffled boilerplate, list
   * reorderings, template field permutations). Reorder-only is the dup
   * mass exact hashing misses WITHOUT paying the n-gram Jaccard price —
   * the cheap middle rung of the dedup ladder (x01 exact → THIS → x02
   * LSH).
   *
   * Scale shape: canonicalization is one codegen'd map-side pass
   * (split → drop empties → distinct → sort → md5, so the shuffle key
   * is 32 bytes however long the doc); family sizes come from two
   * key-collapsed aggregates joined back by compact hash; output
   * |sources| rows.
   */
  def tokenSetDupCensus(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val canon = md5(concat_ws(" ",
      array_sort(array_distinct(
        filter(split(col(textCol), " "), t => length(t) > 0)))))
    val keyed = docs.filter(col(textCol).isNotNull && col(sourceCol).isNotNull)
      .select(col(idCol), col(sourceCol).as("source"),
        canon.as("__ck"), md5(col(textCol)).as("__tk"))
    val canonFam = keyed.groupBy("__ck").agg(count(lit(1)).as("__cn"))
    val exactFam = keyed.groupBy("__tk").agg(count(lit(1)).as("__tn"))
    keyed.join(canonFam, "__ck").join(exactFam, "__tk")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__tn") > 1, 1L).otherwise(0L)).as("exact_dup_docs"),
        sum(when(col("__cn") > 1, 1L).otherwise(0L)).as("canon_dup_docs"),
        sum(when(col("__cn") > 1 && col("__tn") === 1, 1L).otherwise(0L))
          .as("reorder_only_docs"))
      .select(col("source"), col("n_docs"), col("exact_dup_docs"),
        col("canon_dup_docs"), col("reorder_only_docs"),
        expr("reorder_only_docs * 1000000 DIV n_docs").as("reorder_only_ppm"))
      .orderBy("source")
  }

  /**
   * Cross-document EXACT substring duplication census — the classic
   * long-repeated-run dedup rung (the k-token-window convention of the
   * public dataset-dedup literature, e.g. the suffix-array "exact substring"
   * family): find every maximal run of ≥ `k` consecutive tokens that occurs
   * verbatim in at least TWO distinct documents, at ANY offset. Line-hash
   * dedup only catches line-aligned repeats and head/tail splice checks only
   * catch boundary repeats; this catches a paragraph pasted mid-document.
   *
   * Algorithm (linear, no suffix array needed for the census form):
   *   1. every k-token window hash per doc with its offset — one MAP-SIDE
   *      codegen'd [[graft.functions.ShingleHashes]] pass + posexplode
   *      (multiplicities and order kept);
   *   2. a window hash is SHARED iff it occurs in ≥ 2 distinct docs —
   *      min(doc) ≠ max(doc) over one partial-agged exchange on the 8-byte
   *      hash (cheaper than count-distinct, same predicate);
   *   3. per doc, maximal runs of consecutive shared offsets via
   *      gaps-and-islands (offset − row_number over a PER-DOC window — the
   *      frame is doc-bounded, never global); an island of c consecutive
   *      shared windows certifies a duplicated run of c + k − 1 tokens.
   *
   * Returns the census: (run_tokens, n_runs, n_docs) per duplicated-run
   * length, ordered — the table that sizes "how much of the corpus is long
   * verbatim repetition" before committing to cut it. Hash equality stands
   * in for string equality with miss probability ~|windows|²/2⁶⁴ (the same
   * convention every shingle operator here uses).
   *
   * Scale shape: shuffles carry (hash, doc, offset) triples — never text;
   * the only window is per-doc; the shared-hash semi join is
   * AQE-broadcastable when repetition is rare. At 100 TB the postings
   * exchange is the bound, exactly as in the published suffix-array
   * pipelines' sharded counterpart.
   */
  def crossDocSubstringRuns(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "run window must cover at least 2 tokens")
    val grams = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(graft.functions.ShingleHashes(col(textCol), k)).as(Seq("pos", "sh")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("off"), col("sh"))
      .cache()
    val shared = grams.groupBy("sh")
      .agg(min(col("doc_id")).as("__mn"), max(col("doc_id")).as("__mx"))
      .filter(col("__mn") =!= col("__mx"))
      .select("sh")
    val sharedOffsets = grams.join(shared, Seq("sh"), "left_semi")
      .select("doc_id", "off")
    val islands = sharedOffsets
      .withColumn("__rn", row_number().over(
        Window.partitionBy("doc_id").orderBy("off")).cast("long"))
      .withColumn("__isl", col("off") - col("__rn"))
    islands.groupBy("doc_id", "__isl")
      .agg((count(lit(1)) + lit(k - 1).cast("long")).as("run_tokens"))
      .groupBy("run_tokens")
      .agg(count(lit(1)).as("n_runs"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("run_tokens")
  }

  /**
   * Exact-substring DECONTAMINATION — the cross-corpus form of
   * [[crossDocSubstringRuns]] and the long-run upgrade of [[decontaminate]]
   * (whose any-shared-n-gram criterion flags topical overlap as readily as
   * true leakage): for every EVAL document, find the training documents
   * sharing a verbatim run of ≥ `k` consecutive tokens at any offset pair,
   * and report how bad the worst leak is. This is the k-token-window
   * contamination criterion of the public dataset-dedup literature — a
   * single shared window already certifies a k-token verbatim run.
   *
   * Returns one row per CONTAMINATED eval doc:
   * (doc_id, n_train_docs, max_shared_run_tokens), ordered by doc_id —
   * the table a training run's holdout audit signs off on.
   *
   * Scale shape: one equi-join on the 8-byte window hash (eval side is the
   * benchmark — tiny, broadcastable; the train side streams), then
   * gaps-and-islands per (eval, train) PAIR — every window is pair-bounded
   * by doc length, never global. At 100 TB the join cost is the train-side
   * postings scan, the theoretical floor for this audit.
   */
  def substringDecontaminate(docs: DataFrame, idCol: String, textCol: String,
      isEval: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "run window must cover at least 2 tokens")
    val grams = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), isEval.as("__ev"),
        posexplode(graft.functions.ShingleHashes(col(textCol), k)).as(Seq("pos", "sh")))
      .select(col("doc_id"), col("__ev"), (col("pos") + 1).cast("long").as("off"), col("sh"))
    val ev = grams.filter(col("__ev")).select(col("doc_id").as("ed"), col("off"), col("sh"))
    val tr = grams.filter(!col("__ev")).select(col("doc_id").as("td"), col("sh"))
    // distinct: one eval offset may match several occurrences inside the
    // same train doc — islands must count each eval offset once per pair
    val hits = ev.join(tr, "sh").select("ed", "td", "off").distinct()
    val runs = hits
      .withColumn("__rn", row_number().over(
        Window.partitionBy("ed", "td").orderBy("off")).cast("long"))
      .withColumn("__isl", col("off") - col("__rn"))
      .groupBy("ed", "td", "__isl")
      .agg((count(lit(1)) + lit(k - 1).cast("long")).as("run_tokens"))
    runs.groupBy("ed", "td").agg(max(col("run_tokens")).as("__mr"))
      .groupBy(col("ed").as("doc_id"))
      .agg(count(lit(1)).as("n_train_docs"),
        max(col("__mr")).as("max_shared_run_tokens"))
      .orderBy("doc_id")
  }

  /**
   * CAPTURE–RECAPTURE duplicate-population estimate (Lincoln–Petersen /
   * Chapman, public ecology statistics): two independent dedup methods
   * are two "catches" of the same unknown duplicate-pair population —
   * from catch sizes and their overlap, the Chapman estimator
   * (n₁+1)(n₂+1)/(m+1) − 1 bounds how many true duplicate pairs exist,
   * INCLUDING the ones neither method saw. This turns x269's
   * head-to-head method comparison into the number a curation plan
   * actually needs: estimated total duplication and each method's
   * coverage of it. Exact integer arithmetic; m = 0 degrades gracefully
   * (Chapman's +1 smoothing is the reason it beats raw Lincoln–Petersen
   * here).
   *
   * Scale shape: both inputs are already candidate-restricted pair
   * frames (banded LSH / banded SimHash — never all-pairs); the overlap
   * is one equi-join on the pair key and the rest is one-row frames.
   */
  def captureRecapture(catch1: DataFrame, catch2: DataFrame): DataFrame = {
    val p1 = catch1.select(col("d1"), col("d2")).distinct()
    val p2 = catch2.select(col("d1"), col("d2")).distinct()
    val n1 = p1.agg(count(lit(1)).as("n_catch1"))
    val n2 = p2.agg(count(lit(1)).as("n_catch2"))
    val m = p1.join(p2, Seq("d1", "d2")).agg(count(lit(1)).as("n_both"))
    n1.crossJoin(broadcast(n2)).crossJoin(broadcast(m))
      .select(col("n_catch1"), col("n_catch2"), col("n_both"),
        expr("(n_catch1 + 1) * (n_catch2 + 1) DIV (n_both + 1) - 1")
          .as("chapman_estimate"))
      .withColumn("catch1_coverage_ppm",
        expr("""CASE WHEN chapman_estimate > 0
             THEN n_catch1 * 1000000 DIV chapman_estimate ELSE 0 END"""))
      .withColumn("catch2_coverage_ppm",
        expr("""CASE WHEN chapman_estimate > 0
             THEN n_catch2 * 1000000 DIV chapman_estimate ELSE 0 END"""))
  }

  /**
   * INTRA-document repeated-run census — the third member of the
   * repeated-run family: [[crossDocSubstringRuns]] finds runs shared
   * ACROSS documents, [[substringDecontaminate]] finds them across
   * corpus splits, and THIS finds the k-token windows a document repeats
   * within ITSELF — the verbatim-boilerplate / copy-paste-loop smell
   * (navigation chrome, templated headers, degenerate generation loops)
   * that per-line stats (x23) miss when the repeat is not line-aligned.
   * Per source: documents scanned, documents with any internal k-token
   * repeat, window totals, and the repeated-window mass in ppm.
   *
   * Scale shape: windows collapse map-side to (doc, hash) counts — the
   * exchange is per-doc-vocabulary-bounded, never offset-level; no
   * window function at all (the census needs multiplicities, not run
   * merging); output |sources| rows.
   */
  def intraDocRepeatCensus(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, k: Int): DataFrame = {
    require(k >= 2, "run window must cover at least 2 tokens")
    val winCounts = docs.filter(col(textCol).isNotNull && col(sourceCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        explode(graft.functions.ShingleHashes(col(textCol), k)).as("sh"))
      .groupBy("source", "doc_id", "sh").agg(count(lit(1)).as("__c"))
    winCounts.groupBy("source", "doc_id")
      .agg(sum(col("__c")).as("__w"),
        sum(when(col("__c") > 1, col("__c")).otherwise(0L)).as("__rw"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__rw") > 0, 1L).otherwise(0L)).as("docs_with_repeat"),
        sum(col("__w")).as("total_windows"),
        sum(col("__rw")).as("repeated_windows"))
      .select(col("source"), col("n_docs"), col("docs_with_repeat"),
        col("total_windows"), col("repeated_windows"),
        expr("repeated_windows * 1000000 DIV total_windows").as("repeat_ppm"))
      .orderBy("source")
  }
}
