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
    * text has fewer than n words). */
  def shingles(text: Column, n: Int): Column = {
    val w = split(text, " ")
    val grams = transform(
      sequence(lit(0), size(w) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*))
    when(size(w) >= n, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  // 2^31-1 (prime): the affine MinHash family works modulo M so the 64-bit
  // multiply can never overflow (ANSI mode would raise on long overflow).
  private val M = 2147483647L

  /** Deterministic affine-permutation coefficients (splitmix-style LCG). */
  private def coeffs(count: Int, seed: Long): Array[Long] = {
    var s = seed
    Array.fill(count) {
      s = s * 6364136223846793005L + 1442695040888963407L
      java.lang.Math.floorMod(s >>> 17, M - 1) + 1
    }
  }

  /**
   * MinHash + LSH near-duplicate pairs (Broder '97 banding, public
   * technique): shingle → one xxhash64 per shingle → `numBands*rowsPerBand`
   * affine permutations g_i(h) = (a_i·h + b_i) mod M → per-band signature →
   * group by (band, signature) → candidate pairs within buckets → EXACT
   * jaccard verification on the candidates only.
   *
   * With rowsPerBand=3, numBands=42 the miss probability at jaccard ≥ 0.7 is
   * (1 − 0.7³)^42 ≈ 2e-8, so the output equals the exact O(n²) oracle with
   * overwhelming probability while doing linear work + one shuffle.
   */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numBands: Int = 42, rowsPerBand: Int = 3,
                 threshold: Double = 0.7): DataFrame = {
    val numHashes = numBands * rowsPerBand
    val as = coeffs(numHashes, seed = 0x5eed5eedL)
    val bs = coeffs(numHashes, seed = 0xb17b17b1L)

    val withShingles = docs
      .select(col(idCol).as("doc_id"), shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)

    // One base hash per shingle, then cheap affine re-hashes per permutation.
    val withSigs = withShingles
      .withColumn("hs", transform(col("sh"), s => pmod(xxhash64(s), lit(M))))
      .withColumn("sig", transform(sequence(lit(0), lit(numHashes - 1)), i =>
        array_min(transform(col("hs"), h =>
          pmod(element_at(lit(as), i + 1) * h + element_at(lit(bs), i + 1), lit(M))))))

    // Band signatures: hash each row-group of the signature vector.
    val banded = withSigs
      .withColumn("band", explode(transform(sequence(lit(0), lit(numBands - 1)), j =>
        struct(j.as("j"),
          xxhash64(concat_ws(",", slice(col("sig"), j * rowsPerBand + 1, lit(rowsPerBand))), j)
            .as("h")))))
      .select(col("doc_id"), col("band.j").as("band_j"), col("band.h").as("band_h"))

    // Buckets → unique candidate pairs (sorted bucket, all i<j combinations).
    val candidates = banded
      .groupBy("band_j", "band_h").agg(array_sort(collect_set(col("doc_id"))).as("bucket"))
      .filter(size(col("bucket")) > 1)
      .select(explode(flatten(transform(col("bucket"), (x, i) =>
        // length = size(bucket): a large literal (e.g. Int.MaxValue) overflows
        // inside slice's start+length math and yields an EMPTY array
        transform(slice(col("bucket"), i + 2, size(col("bucket"))), y =>
          struct(x.as("d1"), y.as("d2")))))).as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()

    // Exact verification on candidates only (precision 1.0 by construction).
    val sets = withShingles.select(col("doc_id"), col("sh"))
    candidates
      .join(sets.withColumnRenamed("doc_id", "d1").withColumnRenamed("sh", "sh1"), "d1")
      .join(sets.withColumnRenamed("doc_id", "d2").withColumnRenamed("sh", "sh2"), "d2")
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("d1", "d2", "jaccard")
  }

  /**
   * Exact n-gram jaccard similarity for all pairs sharing at least one
   * shingle — the exact distributed algorithm (explode → join on shingle →
   * count per pair): work is Σ freq(shingle)², not O(n²), and every stage is
   * a plain shuffle the optimizer handles.
   */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, minJaccard: Double = 0.5): DataFrame = {
    val withShingles = docs
      .select(col(idCol).as("doc_id"), shingles(col(textCol), shingleN).as("sh"))
      .filter(size(col("sh")) > 0)
    val sizes = withShingles.select(col("doc_id"), size(col("sh")).as("n"))
    val tokens = withShingles.select(col("doc_id"), explode(col("sh")).as("shingle"))

    val inter = tokens.as("a")
      .join(tokens.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
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
   * 64-bit SimHash near-duplicate pairs. Each word contributes ±1 per bit of
   * its xxhash64; the sign vector folds into a 64-bit fingerprint. Candidate
   * generation blocks on 16-bit quarters (any pair within hamming distance ≤3
   * shares at least one identical quarter — pigeonhole), then the exact
   * hamming distance filters. All bit math in codegen'd expressions.
   */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val words = array_distinct(split(col(textCol), " "))
    // bit i of the fingerprint = sign of Σ_words (2·bit_i(h) − 1); the 64
    // per-bit folds are generated Scala-side (shift amounts must be literals)
    val fingerprint = (0 until 64).map { i =>
      when(
        aggregate(transform(words, w => xxhash64(w)), lit(0L),
          (s, h) => s + (shiftright(h, i).bitwiseAND(1L) * 2L - 1L)) > 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

    val fps = docs.select(col(idCol).as("doc_id"), fingerprint.as("fp"))

    val quarters = array((0 until 4).map { q =>
      struct(lit(q).as("q"), shiftright(col("fp"), q * 16).bitwiseAND(0xffffL).as("bits"))
    }: _*)
    val banded = fps.select(col("doc_id"), col("fp"), explode(quarters).as("b"))
      .select(col("doc_id"), col("fp"), col("b.q").as("q"), col("b.bits").as("bits"))

    banded.as("a")
      .join(banded.as("b"),
        col("a.q") === col("b.q") && col("a.bits") === col("b.bits") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
