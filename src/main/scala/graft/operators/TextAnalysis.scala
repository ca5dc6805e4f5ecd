package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators over the `documents` table — LLM-pipeline
 * extensions (SURVEY.md §7.4): whitespace/BPE-ish token counting, n-gram
 * language-ID heuristic, quality scoring, content fingerprinting. Everything
 * is codegen'd column expressions; per-row arithmetic is identical in Spark
 * and DuckDB so the oracles compare value-exact.
 */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** PII patterns, RE2-compatible so the same string drives Spark's Java
    * regex engine and an external SQL oracle identically: no backrefs, no
    * lookaround, explicit character classes only. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}[- ]\\d{3,4}([- ]\\d{4})?\\b"

  /** PII scrubbing: emails then phone-shaped digit runs replaced by typed
    * placeholder tokens (order fixed: the email pass must not see digits the
    * phone pass already consumed and vice versa). Pure codegen'd per-row
    * string rewrite — the scrub of a 100 TB corpus is one map-side pass. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")

  /** Occurrences of `pattern` in `text` (redaction audit counts). */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  /** BPE-ish token count: lowercase, split on non-alphanumeric runs, drop
    * empties (a cheap stand-in for a real BPE vocab — the regex boundary
    * behavior is what a tokenizer-shaped pipeline stage needs to prove). */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9]+"), t => t =!= ""))

  /**
   * Language-ID heuristic: marker-token sniff (the n-gram-class heuristic
   * restricted to whole-word markers so it is SQL-expressible for the
   * oracle). Deterministic; on the synthetic word-salad corpus most rows
   * fall through to 'en', which the confusion-matrix query makes visible.
   */
  def langIdHeuristic(text: Column): Column = {
    def hasWord(w: String): Column = instr(concat(lit(" "), text, lit(" ")), s" $w ") > 0
    when(hasWord("der") || hasWord("die") || hasWord("das") || hasWord("und"), "de")
      .when(hasWord("le") || hasWord("la") || hasWord("et") || hasWord("les"), "fr")
      .when(hasWord("el") || hasWord("los") || hasWord("una") || hasWord("es"), "es")
      .when(hasWord("de") || hasWord("shi") || hasWord("bu"), "zh")
      .otherwise("en")
  }

  /**
   * A second, deliberately DIFFERENT lang-id heuristic — fewer markers per
   * language and a different precedence order (es before fr, no bare-'de'
   * zh trap) — used as the paired competitor in the classifier-comparison
   * audits ([[graft.operators.Analytics.mcnemarPaired]] x589,
   * [[graft.operators.Analytics.fleissKappa]] x590): its errors differ
   * from [[langIdHeuristic]]'s on the SAME documents, which is exactly the
   * discordance a paired test measures. Same whole-word-marker scheme so
   * the oracle reproduces it verbatim.
   */
  def langIdHeuristicAlt(text: Column): Column = {
    def hasWord(w: String): Column = instr(concat(lit(" "), text, lit(" ")), s" $w ") > 0
    when(hasWord("und") || hasWord("nicht") || hasWord("das"), "de")
      .when(hasWord("los") || hasWord("una"), "es")
      .when(hasWord("les") || hasWord("vous") || hasWord("et"), "fr")
      .when(hasWord("shi") || hasWord("bu"), "zh")
      .otherwise("en")
  }

  /**
   * Quality score in [0,1]-ish from cheap surface statistics: token count
   * band, mean word length band, alnum ratio, stopword presence. The exact
   * formula matters less than its properties: deterministic, one scan,
   * SQL-expressible for the oracle.
   */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChars = length(text).cast("double")
    val meanWordLen = (nChars - nTok + lit(1.0)) / nTok
    val alnumRatio = (nChars - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))) / nChars
    val theCount = ((nChars - length(replace(text, lit("the"), lit("")))) / lit(3.0)) / nTok
    lit(0.25) * when(nTok.between(10, 500), 1.0).otherwise(0.2) +
      lit(0.25) * when(meanWordLen.between(3.0, 9.0), 1.0).otherwise(0.2) +
      lit(0.25) * (lit(1.0) - alnumRatio) +
      lit(0.25) * least(theCount * 10.0, lit(1.0))
  }

  /** Content fingerprint for exact-dup detection at scale: md5 of the text.
    * (Rolling/shingle fingerprints live in [[Dedup.minhashLsh]]; md5 is the
    * engine-portable exact-content key.) */
  def fingerprint(text: Column): Column = md5(text)

  /**
   * Integer-milli "P(English)" score: 50 + 150 per 'the'/'a' TOKEN
   * occurrence, capped at 950 — a deliberately imperfect probabilistic
   * classifier (both markers bleed into every language of this corpus)
   * whose miscalibration is exactly what the x597 reliability table and
   * x598 ROC-AUC exist to measure. Integer-exact, token-equality-based
   * (never substring — 'the' inside a longer word must not count), and
   * SQL-expressible for the oracle. Row-local; runs map-side at any
   * scale.
   */
  def enScoreMilli(text: Column): Column =
    least(lit(950L), lit(50L) + lit(150L) *
      size(filter(split(text, " ", -1),
        x => x === "the" || x === "a")).cast("long"))

  /**
   * Sliding-window document chunking — the training-data prep step that
   * splits long documents into fixed-token windows with overlap
   * (window − stride tokens shared between consecutive chunks). Pure
   * row-local work: one explode of the start offsets, no shuffle at all;
   * at 100 TB this runs entirely map-side.
   */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                window: Int = 40, stride: Int = 30): DataFrame = {
    require(stride > 0 && window >= stride, "window must cover the stride")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("ws"))
      .withColumn("start",
        explode(sequence(lit(0), size(col("ws")) - 1, lit(stride))))
      .select(col("doc_id"), (col("start") / stride).cast("int").as("chunk_id"),
        slice(col("ws"), col("start") + 1, lit(window)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).as("n_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
  }

  /**
   * Top-k terms by frequency per language — the vocabulary-inspection step
   * of corpus curation. The full-corpus explode collapses FIRST into
   * (lang, word) counts via one hash aggregation (map-side partial combine
   * shrinks the shuffle to |vocab|·|langs| rows); the ranking window then
   * runs over that tiny aggregate, never over the corpus. Ties break
   * alphabetically for determinism.
   */
  /**
   * TF-IDF term weighting: tf(term, doc) · ln(N / df(term)), top-k terms per
   * document. The corpus size N joins in as a broadcast 1-row aggregate (no
   * driver action), document frequencies partial-aggregate before their
   * shuffle, and the per-doc ranking window sees only the collapsed
   * (doc, term) counts — the same agg-then-rank shape as
   * [[topTermsPerLang]]. Ranking orders by the ROUNDED score: distinct
   * (tf, df) pairs can still produce exactly-tied exact scores (e.g.
   * 2·ln4 = ln16) that the two engines' libm may separate by an ulp in
   * opposite directions — rounding to the emitted precision before the
   * row_number makes tie-vs-not agree across engines, with the term as the
   * final tiebreak.
   */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(desc("tfidf"), col("word"))
    tf.join(dfreq, "word")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("word"), col("tfidf"), col("rank"))
  }

  /**
   * Token-budget sequence packing: assign documents to fixed-size training
   * shards by cumulative token count, in id order within each `groupCol`
   * partition — the "concatenate the stream, cut every `budget` tokens"
   * packing step of an LLM training pipeline (a doc whose tokens straddle a
   * boundary belongs to the shard where it starts).
   *
   * Scale shape: one hash exchange on `groupCol`, then a single running-sum
   * window per partition — no global sort. Greedy first-fit packing is
   * inherently sequential; the cumulative-cut formulation is its
   * parallelizable equivalent and what production packers use (each group —
   * source, language, date bucket — packs independently on its own
   * executor).
   */
  /**
   * Fixed-context window packing — the pretraining sequence layout:
   * within each group, documents (ordered by id) are conceptually
   * concatenated into one token stream which is cut into consecutive
   * windows of exactly `contextLen` tokens; documents SPAN window
   * boundaries (unlike [[packTokenShards]], which assigns whole docs to
   * shards). Emits one row per (group, window): the number of documents
   * contributing tokens and the window's token fill (= contextLen except
   * the group's final partial window) — the layout manifest a packed-
   * sequence writer needs.
   *
   * All arithmetic is integer (cumulative sums, integer DIV, least/
   * greatest), so the layout is engine-exact. Scale shape: one group
   * exchange + a window cumsum, then a MAP-SIDE explode of each doc's
   * spanned-window range (a doc adds ceil(n_tok/contextLen)+1 ≈ 1 rows,
   * so the explode does not amplify the corpus) and one hash aggregation.
   */
  def packContextWindows(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, contextLen: Long = 128): DataFrame = {
    require(contextLen >= 1, "contextLen must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(groupCol), col(idCol), tokenCount(col(textCol)).cast("long").as("n_tok"))
      .withColumn("cum_after", sum(col("n_tok")).over(w))
      .withColumn("cum_before", col("cum_after") - col("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("win", explode(sequence(
        expr(s"cum_before DIV $contextLen"),
        expr(s"(cum_after - 1) DIV $contextLen"))))
      .groupBy(col(groupCol), col("win"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("cum_after"), (col("win") + 1) * contextLen) -
          greatest(col("cum_before"), col("win") * contextLen)).as("n_tokens"))
  }

  def packTokenShards(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, budgetTokens: Long = 2048): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), col(groupCol), tokenCount(col(textCol)).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col(idCol), col(groupCol), col("n_tok"),
        // integer DIV, not double '/': cum overflows double's 2^53 exact
        // range long before a 100 TB corpus runs out of tokens
        expr(s"CAST((cum - n_tok) DIV $budgetTokens AS INT)").as("shard"))
  }

  def topTermsPerLang(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .groupBy("lang", "word")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(desc("n"), col("word"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /**
   * Deterministic masked-span (denoising) schedule: each token position is
   * masked iff `hash60(doc_id ":" pos) mod 100 < maskPct` — a pure function
   * of (doc, position), so the schedule is reproducible across runs,
   * engines, and partitionings (no RNG state to seed or checkpoint; the
   * same property the [[Sampling.weightedBernoulli]] draws use). Emits the
   * per-document manifest (token count, masked count, first masked
   * position; −1 when nothing masked) a span-corruption training job
   * shards by. One posexplode + one hash-partitioned aggregate on the doc
   * id — linear, no joins.
   */
  def maskSchedule(docs: DataFrame, idCol: String, textCol: String,
      maskPct: Int): DataFrame = {
    require(maskPct >= 1 && maskPct <= 99, s"maskPct $maskPct not in [1, 99]")
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val masked = PortableHash.hash60(
      concat(col("doc_id").cast("string"), lit(":"), col("pos").cast("string"))
    ) % 100 < maskPct
    toks.withColumn("m", masked)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("m").cast("long")).as("n_masked"),
        coalesce(min(when(col("m"), col("pos"))).cast("long"), lit(-1L))
          .as("first_masked"))
  }

  /**
   * Cross-source contamination matrix: for every ordered source pair
   * (a, b), how many of a's DISTINCT shingles also appear in b — reported
   * as integer parts-per-million of a's shingle vocabulary. The
   * source-granular "how much of A is inside B" governance question
   * (directional, unlike x116's symmetric distribution divergence), asked
   * before mixing corpora or auditing a vendor drop.
   *
   * Scale shape: shingles collapse to DISTINCT (source, shingle) FIRST —
   * the join input is vocabulary × S bounded, never corpus-sized — and the
   * self-join on the shingle key fans out at most S per shingle. The S×S
   * spine comes from a broadcast cross of the tiny per-source size frame,
   * so zero-overlap pairs report 0 instead of vanishing. The ppm ratio
   * stages through DECIMAL(38,0): `n_common · 10⁶` overflows BIGINT once
   * a source's shared vocabulary passes ~9·10¹².
   */
  def sourceContainment(docs: DataFrame, sourceCol: String, textCol: String,
      shingleN: Int = 3): DataFrame = {
    val ss = docs.select(col(sourceCol).as("src"),
        explode(graft.functions.ShingleHashes(col(textCol), shingleN)).as("sh"))
      .distinct()
    // spine sources come from the DOCS frame, not the shingle frame: a
    // source whose docs are all shorter than shingleN emits zero shingles
    // and would otherwise vanish from the matrix instead of reporting 0
    val sources = docs.select(col(sourceCol).as("src")).distinct()
    val sizes = sources.join(
        ss.groupBy("src").agg(count(lit(1)).as("n_sh")), Seq("src"), "left")
      .select(col("src"), coalesce(col("n_sh"), lit(0L)).as("n_sh"))
    val common = ss.as("a").join(ss.as("b"),
        col("a.sh") === col("b.sh") && col("a.src") =!= col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    val spine = sizes.select(col("src").as("src_a"), col("n_sh"))
      .crossJoin(broadcast(sizes.select(col("src").as("src_b"))))
      .filter(col("src_a") =!= col("src_b"))
    spine.join(common, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        expr("CASE WHEN n_sh = 0 THEN CAST(0 AS BIGINT) ELSE" +
          " CAST(CAST(COALESCE(n_common, 0) AS DECIMAL(38,0)) * 1000000" +
          " DIV n_sh AS BIGINT) END").as("containment_ppm"))
  }

  /**
   * Heavy hitters via per-partition Misra–Gries summaries with a
   * ZERO-FALSE-NEGATIVE certificate — the sketch path beside the exact
   * full-vocabulary groupBy when the vocabulary itself is too large to
   * shuffle. Phase 1 folds each partition's token stream through a local
   * MG(k) summary (≤ k entries, decrement-on-overflow) inside
   * `mapPartitions` — at most `k` (term, residual) rows leave each
   * partition, so the shuffle is partitions·k, never vocabulary-sized.
   * Merging summaries by summing residuals preserves the MG bound:
   * `true_count − Σresidual ≤ N/(k+1)` (per-partition bounds are additive),
   * so every term with `true_count > N/(k+1)` has a positive merged
   * residual and MUST appear in the candidate set — the certificate.
   * Phase 2 computes EXACT counts restricted to candidates (one semi-join
   * scan whose aggregate state is candidate-bounded) and keeps terms with
   * `cnt·(k+1) > n` — strict integer arithmetic, no division. The final
   * output is therefore partitioning-INDEPENDENT (exact counts over an
   * exact threshold; the sketch only proposes a certified superset), which
   * is what makes a deterministic SQL oracle possible. Overflow bound:
   * `cnt·(k+1)` stays in BIGINT for corpora up to ~9·10¹⁸/(k+1) tokens.
   */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val tokens = docs.select(explode(split(col(textCol), " ")).as("term"))
    // one pass emits BOTH the MG summary rows and a per-partition token
    // count (term = NULL sentinel) — the corpus total needs no extra scan.
    // Materialized eagerly (partitions·k + partitions rows) so its two
    // consumers don't each re-run the corpus scan.
    val summaries = tokens.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      var np = 0L
      it.foreach { t =>
        np += 1
        m.get(t) match {
          case Some(c) => m(t) = c + 1
          case None if m.size < k => m(t) = 1L
          case None =>
            // decrement-all: amortized O(1) per token (each decrement
            // cancels one prior increment); drop exhausted entries
            m.mapValuesInPlace((_, v) => v - 1)
            m.filterInPlace((_, v) => v > 0)
        }
      }
      m.iterator.map { case (t, c) => (Option(t), c) } ++
        Iterator((Option.empty[String], np))
    }.toDF("term", "residual")
      .localCheckpoint()
    // candidate set: ≤ partitions·k rows — every merged residual is ≥ 1
    // (entries enter at 1, exhausted entries are dropped immediately), so
    // no post-merge pruning exists or is needed. Broadcast to phase 2 (for
    // extreme partition counts swap for a shuffle semi-join; the
    // certificate is unchanged).
    val candidates = summaries.filter(col("term").isNotNull)
      .select("term").distinct()
    val total = summaries.filter(col("term").isNull)
      .agg(sum(col("residual")).as("n"))
    tokens.join(broadcast(candidates), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select(col("term"), col("cnt"), col("n"))
  }

  /**
   * Inverted-index build: term → document frequency + the first
   * `maxPostings` doc_ids (ascending) — the retrieval-side structure a
   * corpus search / decontamination service builds from the training set.
   *
   * Scale shape: distinct (term, doc) rows, ONE exchange on term, then a
   * window pass ranks postings and CAPS them BEFORE the collect — the
   * aggregation buffer for a stopword-grade term holds `maxPostings` ids,
   * not its full (possibly corpus-sized) posting list; `df` still counts
   * every doc. The groupBy reuses the window's hash partitioning, so the
   * cap costs no extra shuffle. Full posting lists at scale would instead
   * emit (term, doc_id) pairs sorted-bucketed by term — this operator is
   * the bounded-manifest variant.
   */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      maxPostings: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxPostings >= 1, "maxPostings must be positive")
    val byTerm = Window.partitionBy("term")
    docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("term"))
      .distinct()
      .withColumn("rn", row_number().over(byTerm.orderBy("doc_id")))
      .withColumn("df", count(lit(1)).over(byTerm))
      .filter(col("rn") <= maxPostings)
      .groupBy("term")
      .agg(max(col("df")).as("df"),
        sort_array(collect_list(col("doc_id"))).as("postings"))
  }

  /**
   * Incremental inverted-index maintenance: fold a DELTA index (built from
   * newly-ingested docs only) into an existing base index WITHOUT
   * rescanning the base corpus — the x40/x83 partial-state pattern applied
   * to text indexing. df adds; capped posting lists concatenate
   * base-then-delta and re-cap, which equals the full rebuild's first-k
   * EXACTLY when delta doc ids are strictly greater than base ids (the
   * append-only ingest invariant; `require`d cheaply by the caller).
   *
   * Scale shape: ONE full-outer join of two term-keyed manifests — cost is
   * O(vocabulary), not O(corpus); the 100 TB of already-indexed text is
   * never read again.
   */
  def mergeIndexDelta(base: DataFrame, delta: DataFrame,
      maxPostings: Int = 20): DataFrame = {
    require(maxPostings >= 1, "maxPostings must be positive")
    val b = base.select(col("term"), col("df").as("b_df"), col("postings").as("b_p"))
    val d = delta.select(col("term"), col("df").as("d_df"), col("postings").as("d_p"))
    b.join(d, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("b_df"), lit(0L)) + coalesce(col("d_df"), lit(0L))).as("df"),
        slice(concat(coalesce(col("b_p"), array().cast("array<long>")),
          coalesce(col("d_p"), array().cast("array<long>"))), 1, maxPostings)
          .as("postings"))
  }

  /**
   * Unigram rarity score — the LM-free stand-in for perplexity filtering
   * (CCNet-style: flag documents whose tokens are improbable under the
   * corpus unigram distribution). Per occurrence the contribution is
   * `total_tokens DIV corpus_count(word)` — the INTEGER inverse frequency —
   * and the doc score is the integer mean of its occurrences'
   * contributions. Rare-word-heavy docs score high, stopword soup scores
   * low; ranking correlates with -log p without a single float: float
   * `ln` is not bit-portable across engines, integer DIV is.
   *
   * Scale shape: one exchange builds the unigram table (map-side partial
   * counts); the word join broadcasts when the vocabulary ≪ corpus (AQE
   * decides — a 10M-type vocab is MBs) and falls back to a shuffle join
   * otherwise; one final exchange per doc. The corpus total rides along as
   * a 1-row broadcast cross join.
   */
  def rarityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // cached: three subtrees consume the tokenization (freq, total, probe)
    // and Spark does not share common subplans across DataFrame branches
    val words = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("word"))
      .cache()
    val freq = words.groupBy("word").agg(count(lit(1)).as("cnt"))
    val total = words.agg(count(lit(1)).as("total"))
    words.join(freq, "word")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(expr("total DIV cnt")).as("rsum"))
      .select(col("doc_id"), col("n_words"),
        expr("rsum DIV n_words").as("rarity"))
  }

  /**
   * Top-k adjacent word-pair (bigram) counts across the corpus — the
   * counting step of a BPE/WordPiece merge round (the highest-count pair
   * is the next merge) and the vocabulary-induction primitive generally.
   *
   * Scale shape: bigrams are materialized map-side with a single
   * `transform` over the token array (no self-join of a token table on
   * position, which would shuffle the corpus twice), then one hash
   * aggregate whose shuffle is bounded by the DISTINCT bigram vocabulary
   * (map-side partial counts), finished by TakeOrderedAndProject — the
   * top-k never sorts the full vocabulary.
   */
  def bigramCounts(docs: DataFrame, textCol: String, k: Int = 20): DataFrame = {
    val ws = split(col(textCol), " ")
    docs.select(ws.as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ws")) - 2),
        i => concat(element_at(col("ws"), i + 1), lit(" "),
          element_at(col("ws"), i + 2)))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("bigram")).limit(k)
  }

  /**
   * Collocation extraction by INTEGER-SCALED pointwise association: for
   * every adjacent word pair seen at least `minCount` times, the lift of
   * the pair over its parts' independent rates —
   * `score = c(ab) · N_bigrams · scale DIV (c(a) · c(b))`
   * (the PMI argument before the log; log is monotone, so the top-k
   * ORDERING equals PMI's while staying engine-exact — float log ulps and
   * partial-sum order cannot flip ranks). The vocabulary-induction
   * signal that count ranking ([[bigramCounts]]) misses: "of course" beats
   * "of the" on association even when it loses on raw count.
   *
   * Scale shape: one map-side bigram materialization (same no-self-join
   * trade as [[bigramCounts]]), one aggregate bounded by the bigram
   * vocabulary, unigram counts as a second vocabulary-bounded aggregate
   * broadcast back onto the ≥`minCount` pairs, top-k via
   * TakeOrderedAndProject. The three-factor product is staged through
   * DECIMAL(38,0) — `c(ab)·N₂·scale` overflows BIGINT at ~10^12 pair
   * occurrences, i.e. well inside a 100 TB corpus.
   */
  def bigramAssociation(docs: DataFrame, textCol: String, minCount: Long = 5L,
      k: Int = 20, scale: Long = 1000000L): DataFrame = {
    require(minCount >= 1 && k >= 1 && scale >= 1, "invalid parameters")
    val ws = split(col(textCol), " ")
    val tokens = docs.select(ws.as("ws")).filter(size(col("ws")) >= 2)
    val bigrams = tokens
      .select(explode(transform(sequence(lit(0), size(col("ws")) - 2),
        i => struct(element_at(col("ws"), i + 1).as("w1"),
          element_at(col("ws"), i + 2).as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val pairCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
    val leftCounts = bigrams.groupBy("w1").agg(count(lit(1)).as("n_a"))
    val rightCounts = bigrams.groupBy("w2").agg(count(lit(1)).as("n_b"))
    val totals = bigrams.agg(count(lit(1)).as("n2"))
    pairCounts.filter(col("n_ab") >= minCount)
      .join(leftCounts, "w1")
      .join(rightCounts, "w2")
      .crossJoin(broadcast(totals))
      .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"),
        col("n_ab"),
        expr(s"CAST(CAST(n_ab AS DECIMAL(38,0)) * n2 * $scale" +
          " DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("score"))
      .orderBy(desc("score"), col("bigram")).limit(k)
  }

  /**
   * Pairwise total-variation distance between the unigram distributions of
   * corpus slices (sources, languages, snapshot generations) — the
   * composition-drift audit a training-data pipeline runs before mixing
   * corpora: TVD = ½·Σ_t |p_t − q_t| ∈ [0, 1], reported as exact ppm.
   *
   * EXACT integer arithmetic throughout: with per-slice token totals
   * Nₐ, N_b, `TVD·2NₐN_b = Σ_t |cₜN_b − dₜNₐ|`, and the union-over-tokens
   * sum reduces to an INNER join because tokens absent from one side
   * contribute their full mass:
   * `Σ_union = 2NₐN_b + Σ_shared (|cN_b − dNₐ| − cN_b − dNₐ)`.
   * No floats, no log — identical in any engine.
   *
   * Scale shape: one corpus scan → per-(slice, token) counts (map-side
   * combine; the shuffle is bounded by slices × vocabulary, not corpus
   * size); the token self-join emits ≤ |slices|² rows per DISTINCT token —
   * never a corpus-sized pair blow-up (contrast a doc-level pair join);
   * per-slice totals are a tiny broadcast. The shared-token sum is staged
   * through DECIMAL(38,0): `cₜ·N_b` alone overflows BIGINT when
   * token-count × slice-tokens exceeds ~9·10^18, i.e. at 100 TB scale.
   * Pairs with NO shared vocabulary (TVD exactly 1) are restored by the
   * slice-spine left join.
   */
  def distributionDivergence(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val counts = docs
      .select(col(groupCol).as("g"), explode(split(col(textCol), " ")).as("w"))
      .groupBy("g", "w").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("g").agg(sum(col("c")).as("n"))
    val shared = counts.as("a").join(counts.as("b"),
        col("a.w") === col("b.w") && col("a.g") < col("b.g"))
      .join(broadcast(totals.as("na")), col("a.g") === col("na.g"))
      .join(broadcast(totals.as("nb")), col("b.g") === col("nb.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(sum(expr("abs(CAST(a.c AS DECIMAL(38,0)) * nb.n - CAST(b.c AS DECIMAL(38,0)) * na.n)" +
        " - CAST(a.c AS DECIMAL(38,0)) * nb.n - CAST(b.c AS DECIMAL(38,0)) * na.n"))
        .as("s"))
    totals.as("ta").crossJoin(broadcast(totals.as("tb")))
      .filter(col("ta.g") < col("tb.g"))
      .join(shared, col("ta.g") === col("g1") && col("tb.g") === col("g2"), "left")
      .select(col("ta.g").as("src_a"), col("tb.g").as("src_b"),
        col("ta.n").as("n_a"), col("tb.n").as("n_b"),
        expr("CAST((2 * CAST(ta.n AS DECIMAL(38,0)) * tb.n + coalesce(s, 0))" +
          " * 1000000 DIV (2 * CAST(ta.n AS DECIMAL(38,0)) * tb.n) AS BIGINT)")
          .as("tvd_ppm"))
  }

  /**
   * Index-accelerated SUBSTRING search (code-search style): find documents
   * containing literal `pattern` by intersecting character-TRIGRAM posting
   * lists, then exact-verifying only the candidates — the standard
   * trigram-index query plan (Google Code Search, PostgreSQL pg_trgm): a
   * doc can contain the pattern only if it contains EVERY trigram of the
   * pattern, so candidates = ∩ postings(t) over the pattern's trigrams,
   * and the expensive exact scan touches candidates alone. Emits matched
   * doc ids with the exact occurrence count (length-delta arithmetic —
   * identical in any engine).
   *
   * Scale shape: the trigram explode is map-side and the filter to the
   * pattern's ≤|pattern|−2 trigrams happens BEFORE any exchange, so the
   * shuffle carries only candidate postings (corpus-size-independent for
   * selective patterns); the candidate set semi-joins back to the corpus
   * (broadcast when small — AQE decides) and the verify reads candidates
   * only. At warehouse scale the posting lists are PREBUILT once
   * ([[invertedIndex]] shape) and this operator becomes a pure index
   * lookup; building them inline here keeps the query self-contained.
   */
  def trigramSearch(docs: DataFrame, idCol: String, textCol: String,
      pattern: String): DataFrame = {
    require(pattern.length >= 3, "trigram search needs a pattern of length >= 3")
    require(!pattern.contains("%") && !pattern.contains("_"),
      "literal patterns only (LIKE metacharacters would change oracle semantics)")
    val patTrigs = pattern.sliding(3).toSeq.distinct
    val k = patTrigs.size
    val trigs = docs
      .filter(length(col(textCol)) >= 3) // sequence(1,0) would reverse-step
      .select(col(idCol).as("doc_id"),
        explode(expr(s"transform(sequence(1, length($textCol) - 2)," +
          s" i -> substr($textCol, i, 3))")).as("trig"))
      .filter(col("trig").isin(patTrigs: _*))
    val cand = trigs.groupBy("doc_id")
      .agg(countDistinct(col("trig")).as("__kt"))
      .filter(col("__kt") === k)
      .select("doc_id")
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .join(cand, "doc_id", "left_semi")
      .filter(col("__t").contains(pattern))
      .select(col("doc_id"),
        ((length(col("__t")) - length(regexp_replace(col("__t"),
          java.util.regex.Pattern.quote(pattern), "")))
          .cast("long") / lit(pattern.length)).cast("long").as("n_occ"))
  }

  /**
   * TRENDING TERMS between two corpus snapshots: for every term above a
   * previous-snapshot support floor, the relative rate ratio
   * `cnt_cur·tot_prev·1e6 DIV (cnt_prev·tot_cur)` (1e6 = unchanged
   * rate) and the top-k risers — the vocabulary-drift monitor between
   * crawl generations ([[Curation]]'s mixtureDrift watches SOURCES move;
   * this watches WORDS move). The support floor keeps one-off terms from
   * topping the board with infinite-looking ratios; the three-factor
   * numerator stages through DECIMAL(38,0) (count × corpus-tokens × 1e6
   * passes BIGINT long before 100 TB).
   *
   * Scale shape: a map-side filter to the two snapshots, ONE
   * vocabulary-bounded aggregate (map-side combine), per-snapshot totals
   * as a tiny broadcast, TakeOrderedAndProject for the top-k.
   */
  def termTrends(docs: DataFrame, textCol: String, snapshotCol: Column,
      prevSnap: Long, curSnap: Long, minPrevCount: Long = 5L,
      k: Int = 15): DataFrame = {
    require(prevSnap != curSnap && minPrevCount >= 1 && k >= 1,
      "need two distinct snapshots, positive support floor and k")
    val words = docs
      .select(snapshotCol.as("__snap"), explode(split(col(textCol), " ")).as("term"))
      .filter(col("__snap").isin(prevSnap, curSnap))
    val counts = words.groupBy("term")
      .agg(sum(when(col("__snap") === prevSnap, 1L).otherwise(0L)).as("n_prev"),
        sum(when(col("__snap") === curSnap, 1L).otherwise(0L)).as("n_cur"))
    val totals = counts.agg(sum("n_prev").as("__tp"), sum("n_cur").as("__tc"))
    counts.filter(col("n_prev") >= minPrevCount)
      .crossJoin(broadcast(totals))
      .select(col("term"), col("n_prev"), col("n_cur"),
        expr("CAST(CAST(n_cur AS DECIMAL(38,0)) * __tp * 1000000" +
          " DIV (CAST(n_prev AS DECIMAL(38,0)) * __tc) AS BIGINT)")
          .as("rate_ratio_ppm"))
      .orderBy(desc("rate_ratio_ppm"), col("term")).limit(k)
  }

  /**
   * BPE MERGE-CANDIDATE scan — one iteration of the byte-pair-encoding
   * vocabulary build, distributed: the corpus-wide frequency of every
   * ADJACENT character pair inside a word, ranked; the top row is the
   * pair the next BPE merge would fuse. (Classic BPE then re-tokenizes
   * and repeats — each iteration is one run of this scan over the
   * current symbolization; the scan itself is the distributed primitive,
   * the merge loop is a driver-side schedule over tiny outputs.)
   *
   * Scale shape: pair generation is ROW-LOCAL map-side work (a
   * higher-order `transform` over character offsets — no explode-to-
   * chars-then-window shuffle of the corpus, the [[graft.functions.ShingleHashes]]
   * argument at character level), and the only exchange is the pair
   * aggregate, bounded by |alphabet|² regardless of corpus size;
   * TakeOrdered closes it out. Words shorter than 2 chars (and the
   * empty tokens a double space makes) contribute nothing.
   */
  def bpeMergeCandidates(docs: DataFrame, textCol: String, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK $topK must be positive")
    docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("__w"))
      .filter(length(col("__w")) >= 2)
      .select(explode(
        expr("transform(sequence(1, length(__w) - 1), i -> substring(__w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
  }

  /**
   * Per-document KEYWORD extraction — each document's most distinctive
   * term, scored `tf · 1e6 DIV df` in exact integers: term frequency
   * weighted by corpus-wide rarity (the integer-exact tf-idf stand-in;
   * a log-idf would be float and engine-divergent). The per-DOC complement
   * of [[tfidfTopTerms]] (corpus/language grain): this one labels every
   * document, e.g. as a routing key or a dedup-cluster name.
   *
   * Scale shape: one (doc, term) collapse with map-side partials, one
   * |vocab|-bounded df aggregate hash-joined back, then a DOC-partitioned
   * rank window — partitioned by the id key, so no single-task frame
   * anywhere. Ties break on the term string; output is |docs| rows.
   */
  def docKeywords(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .withColumn("score", expr("tf * 1000000 DIV df"))
      .withColumn("__rk", row_number().over(byDoc))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("term").as("keyword"), col("tf"), col("df"),
        col("score"))
  }

  /**
   * FEATURE-HASHING collision audit — before shipping hashed features
   * ("the hashing trick") at a chosen width, measure what the hash
   * actually destroys: distinct terms vs occupied buckets, how many
   * terms share a bucket with another (their signals merge
   * irrecoverably), and the worst bucket's load. Uses the engine-portable
   * 60-bit md5 hash ([[graft.operators.PortableHash]]) so the audit is
   * reproducible in any SQL engine — auditing a hash you can't reproduce
   * certifies nothing.
   *
   * Scale shape: corpus → distinct-term collapse (vocabulary-bounded),
   * row-local bucket assignment, one bucket aggregate + one 5-counter
   * rollup. Output is 1 row.
   */
  def featureHashAudit(docs: DataFrame, textCol: String,
      numBuckets: Int = 1 << 18): DataFrame = {
    require(numBuckets >= 2, s"numBuckets $numBuckets must be >= 2")
    val terms = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      .withColumn("bucket",
        graft.operators.PortableHash.hash60(col("term")) % numBuckets)
    terms.groupBy("bucket").agg(count(lit(1)).as("__load"))
      .agg(sum(col("__load")).as("n_terms"),
        count(lit(1)).as("n_buckets_used"),
        sum(when(col("__load") > 1, col("__load")).otherwise(0L))
          .as("n_collided_terms"),
        max(col("__load")).as("max_bucket_load"))
      .select(col("n_terms"), lit(numBuckets).as("n_buckets"),
        col("n_buckets_used"), col("n_collided_terms"), col("max_bucket_load"),
        expr("n_collided_terms * 1000000 DIV n_terms").as("collision_ppm"))
  }

  /**
   * STOPWORD-LIST induction — the top-`topK` terms by DOCUMENT frequency
   * with their corpus coverage: df share of docs (ppm), token share of
   * the corpus (ppm), and the CUMULATIVE token share down the ranked
   * list — the number a curation run reads to decide where to cut the
   * list ("the top 12 terms already cover 31% of all tokens"). Induced,
   * not curated: high-df terms ARE the corpus's own function words.
   *
   * Scale shape: one (doc, term) collapse for df + one term collapse for
   * tf, joined on the |vocab|-bounded frames; ranking and the cumulative
   * sum run AFTER the top-k cut (a k-row frame), so no unbounded
   * unpartitioned window exists.
   */
  def stopwordInduction(docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 50): DataFrame = {
    require(topK >= 1, s"topK $topK must be positive")
    val tokens = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      // cached: df, tf, and both totals derive from it. Caller-managed
      // lifecycle — see coOccurrenceLift.
      .cache()
    val df = tokens.select(col(idCol), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val tf = tokens.groupBy("term").agg(count(lit(1)).as("tf"))
    val totals = tokens.agg(countDistinct(col(idCol)).as("__nd"),
      count(lit(1)).as("__nt"))
    val top = df.join(tf, "term").crossJoin(broadcast(totals))
      .orderBy(col("df").desc, col("term"))
      .limit(topK)
    val byRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("df").desc, col("term"))
    top
      .withColumn("rank", row_number().over(byRank).cast("long"))
      .withColumn("cum_tf", sum(col("tf")).over(byRank))
      .select(col("rank"), col("term"), col("df"), col("tf"),
        expr("df * 1000000 DIV __nd").as("doc_share_ppm"),
        expr("tf * 1000000 DIV __nt").as("token_share_ppm"),
        expr("cum_tf * 1000000 DIV __nt").as("cum_token_share_ppm"))
      .orderBy("rank")
  }

  /**
   * VOCABULARY EXCLUSIVITY census — per source, how much of its
   * vocabulary appears NOWHERE else (count + ppm): the corpus-diversity
   * gauge that separates a source contributing genuinely new language
   * from one paraphrasing the rest — near-dup pair rates (x197) miss
   * this entirely, because novel vocabulary needs no duplicate to exist.
   *
   * Scale shape: one (source, term) distinct collapse; term →
   * source-count is a |vocab|-bounded aggregate joined back; the report
   * is |sources| rows.
   */
  def vocabExclusivity(docs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val st = docs.filter(col(textCol).isNotNull && col(sourceCol).isNotNull)
      .select(col(sourceCol).as("source"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      // cached: the per-term source count and the per-source rollup both
      // read it. Caller-managed lifecycle — see coOccurrenceLift.
      .cache()
    val spread = st.groupBy("term").agg(count(lit(1)).as("__ns"))
    st.join(spread, "term")
      .groupBy("source")
      .agg(count(lit(1)).as("n_terms"),
        sum(when(col("__ns") === 1, 1L).otherwise(0L)).as("n_exclusive"))
      .select(col("source"), col("n_terms"), col("n_exclusive"),
        expr("n_exclusive * 1000000 DIV n_terms").as("exclusive_ppm"))
      .orderBy("source")
  }

  /**
   * EFFECTIVE VOCABULARY size per source — the inverse-Simpson diversity
   * of the term distribution, `N² DIV Σn²` in exact integers: "this
   * source talks like it has K equally-common words". A source with a
   * million distinct terms but an effective vocabulary of 40 is template
   * spam; raw distinct counts (x07) cannot tell the difference. Exact
   * and log-free where Shannon entropy would be float (the x177
   * Simpson-over-entropy argument, applied to vocabulary).
   *
   * Scale shape: one (source, term) count collapse with map-side
   * partials; Σn² rides DECIMAL(38,0) (term counts square past BIGINT
   * at claimed scale); output |sources| rows.
   */
  def effectiveVocabulary(docs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val tc = docs.filter(col(textCol).isNotNull && col(sourceCol).isNotNull)
      .select(col(sourceCol).as("source"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("source", "term").agg(count(lit(1)).as("__n"))
    tc.groupBy("source")
      .agg(sum(col("__n")).as("n_tokens"),
        count(lit(1)).as("n_distinct_terms"),
        sum(col("__n").cast("decimal(38,0)") * col("__n")).as("__sq"))
      .select(col("source"), col("n_tokens"), col("n_distinct_terms"),
        expr("CAST(CAST(n_tokens AS DECIMAL(38,0)) * n_tokens DIV __sq AS BIGINT)")
          .as("effective_terms"))
      .orderBy("source")
  }

  /**
   * TERM FREQUENCY-SPECTRUM (Zipf) audit — per source, how many distinct
   * terms fall in each log2 frequency band `[2^k, 2^{k+1})`, with the
   * band's token mass. A natural-language source shows the Zipf
   * signature (band term-counts decaying smoothly from a huge hapax band
   * k=0); generated/template text shows a hollow spectrum — few hapaxes,
   * mass spiked in narrow mid bands. The spectrum is what x240's single
   * effective-vocabulary number integrates away; reading it per band
   * localizes WHERE the distribution is unnatural. Band index is the
   * exact bit length `length(bin(n)) − 1` — never a float log with
   * engine-divergent boundaries at powers of two.
   *
   * Scale shape: one (source, term) count collapse with map-side
   * partials, then a second collapse to ≤ 64 bands per source; the
   * vocabulary-sized frame is aggregated, never windowed or sorted.
   * Output |sources|·bands rows.
   */
  def frequencySpectrum(docs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val tc = docs.filter(col(textCol).isNotNull && col(sourceCol).isNotNull)
      .select(col(sourceCol).as("source"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("source", "term").agg(count(lit(1)).as("__n"))
    tc.withColumn("freq_band", (length(bin(col("__n"))) - 1).cast("int"))
      .groupBy("source", "freq_band")
      .agg(count(lit(1)).as("n_terms"), sum(col("__n")).as("n_tokens"))
      .select(col("source"), col("freq_band"),
        expr("shiftleft(1L, freq_band)").as("band_lo"),
        col("n_terms"), col("n_tokens"))
      .orderBy("source", "freq_band")
  }

  /**
   * VOCABULARY NOVELTY curve — ingest batches (fixed `batchSize` runs of
   * doc ids, the arrival-order proxy) scored by how much NEW vocabulary
   * they contribute: terms whose FIRST occurrence is in this batch, over
   * terms the batch uses, in ppm. The curve every dataset-growth
   * decision reads: when novelty flattens, more of the same source buys
   * nothing — and a late batch spiking novelty is either a genuinely
   * new domain or an encoding bug, both worth a look.
   *
   * Scale shape: one (term, batch) distinct collapse; first batch per
   * term is a term-keyed MIN over it; per-batch new/seen counts are two
   * aggregates of already-collapsed frames joined on the batch spine.
   * No cumulative window — the curve is per-batch, so nothing needs a
   * global prefix.
   */
  def vocabNoveltyCurve(docs: DataFrame, idCol: String, textCol: String,
      batchSize: Long): DataFrame = {
    require(batchSize >= 1, s"batchSize $batchSize must be positive")
    val tb = docs.filter(col(textCol).isNotNull && col(idCol).isNotNull)
      .select(expr(s"CAST($idCol AS BIGINT) DIV $batchSize").as("batch"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val firstBatch = tb.groupBy("term").agg(min(col("batch")).as("__fb"))
    val seen = tb.groupBy("batch").agg(count(lit(1)).as("n_terms_used"))
    val fresh = firstBatch.groupBy(col("__fb").as("batch"))
      .agg(count(lit(1)).as("n_new_terms"))
    seen.join(fresh, Seq("batch"), "left")
      .select(col("batch"), col("n_terms_used"),
        coalesce(col("n_new_terms"), lit(0L)).as("n_new_terms"))
      .withColumn("novelty_ppm", expr("n_new_terms * 1000000 DIV n_terms_used"))
      .orderBy("batch")
  }

  /**
   * EFFECTIVE BRANCHING FACTOR — per source, the token-weighted mean of
   * each word's inverse-Simpson successor diversity: "after a typical
   * word, how many successors does this source REALLY choose from?"
   * Natural text branches wide (high factor); templated/generated text
   * rails onto fixed continuations (low factor) even when its unigram
   * diversity (x240) looks healthy — this is the bigram-level
   * templatedness gauge, exact and log-free where conditional entropy
   * would be float. Per word w: `eff(w) = n_w² DIV Σ_v n_{wv}²`; source
   * score = `Σ_w n_w·eff(w) DIV Σ_w n_w` in milli units.
   *
   * Scale shape: one (source, w, v) bigram collapse, re-collapsed to
   * (source, w), then to |sources| rows — all map-side partials;
   * squares ride DECIMAL(38,0).
   */
  def effectiveBranchingFactor(docs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val toks = docs.filter(col(textCol).isNotNull && col(sourceCol).isNotNull)
      .select(col(sourceCol).as("source"),
        filter(split(col(textCol), " "), t => length(t) > 0).as("__ts"))
    val bigrams = toks
      .select(col("source"), posexplode(col("__ts")).as(Seq("__i", "__w")),
        col("__ts"))
      .filter(col("__i") < size(col("__ts")) - 1)
      .select(col("source"), col("__w"),
        element_at(col("__ts"), col("__i") + 2).as("__v"))
      .groupBy("source", "__w", "__v").agg(count(lit(1)).as("__n"))
    val perWord = bigrams.groupBy("source", "__w")
      .agg(sum(col("__n")).as("__nw"),
        sum(col("__n").cast("decimal(38,0)") * col("__n")).as("__sq"))
      .withColumn("__eff",
        expr("CAST(CAST(__nw AS DECIMAL(38,0)) * __nw * 1000 DIV __sq AS BIGINT)"))
    perWord.groupBy("source")
      .agg(count(lit(1)).as("n_prefix_words"),
        sum(col("__nw")).as("n_bigrams"),
        sum(col("__nw").cast("decimal(38,0)") * col("__eff")).as("__wsum"))
      .select(col("source"), col("n_prefix_words"), col("n_bigrams"),
        expr("CAST(__wsum DIV n_bigrams AS BIGINT)")
          .as("eff_branching_milli"))
      .orderBy("source")
  }

  /**
   * DISCRIMINATIVE TERMS — the vocabulary most over-represented in
   * high-quality documents, scored by the add-one-smoothed document-
   * frequency odds ratio `((a+1)·(N_lo+1)) DIV ((b+1)·(N_hi+1))` in
   * milli units: the curation miner that turns a scalar quality score
   * into an INSPECTABLE vocabulary ("docs scoring high say these
   * words"), which is how quality-classifier shortcuts and topic bias
   * get caught before training. Smoothing is stated (+1 on every
   * factor); all arithmetic is positive integers, single division.
   *
   * Scale shape: one (doc, term) distinct collapse carrying the class
   * flag; per-term class frequencies are one vocabulary-bounded
   * aggregate; class totals broadcast as one row; top-k plans as
   * TakeOrderedAndProject.
   */
  def discriminativeTerms(docs: DataFrame, idCol: String, textCol: String,
      isHigh: Column, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK $topK must be positive")
    val flagged = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol),
        when(isHigh, 1L).otherwise(0L).as("__hi"))
    val totals = flagged.agg(sum(col("__hi")).as("__nh"),
      sum(lit(1L) - col("__hi")).as("__nl"))
    val termDf = flagged
      .select(col(idCol), col("__hi"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
      .groupBy("term")
      .agg(sum(col("__hi")).as("df_high"),
        sum(lit(1L) - col("__hi")).as("df_low"))
    termDf.crossJoin(broadcast(totals))
      .select(col("term"), col("df_high"), col("df_low"),
        expr("""CAST(CAST(df_high + 1 AS DECIMAL(38,0)) * (__nl + 1) * 1000
              DIV (CAST(df_low + 1 AS DECIMAL(38,0)) * (__nh + 1)) AS BIGINT)""")
          .as("odds_milli"))
      .orderBy(col("odds_milli").desc, col("term"))
      .limit(topK)
  }

  /**
   * SENTENCE-LENGTH census per language — segments every document on the
   * literal '.' boundary, keeps non-blank segments, and reports per
   * language: document/sentence counts, mean tokens per sentence
   * (milli-scaled exact integer ratio), the longest sentence seen, and the
   * share of one-sentence documents (run-on/fragment smell; quality
   * filters key on it). Complements [[corpusStats]] (doc grain) and the
   * word-length histogram (token grain) at the SENTENCE grain — the unit
   * LLM context windows and readability scores actually consume.
   *
   * Scale shape: split + explode are row-local map-side work; the per-doc
   * collapse is doc-keyed, the census |langs|-bounded. Splitting on the
   * literal dot (not a sentence model) keeps the segmentation engine-
   * portable — the oracle reproduces it verbatim with string_split.
   */
  def sentenceLengthCensus(docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val sent = docs
      .filter(col(textCol).isNotNull && col(langCol).isNotNull)
      .select(col(idCol).as("__id"), col(langCol).as("lang"),
        explode(split(col(textCol), "\\.")).as("__seg"))
      .select(col("__id"), col("lang"), trim(col("__seg")).as("__t"))
      .filter(length(col("__t")) > 0)
      .select(col("__id"), col("lang"),
        size(split(col("__t"), " ")).cast("long").as("__tok"))
    val perDoc = sent.groupBy("lang", "__id")
      .agg(count(lit(1)).as("__ns"), sum(col("__tok")).as("__tk"),
        max(col("__tok")).as("__mx"))
    perDoc.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("__ns")).as("n_sentences"),
        sum(col("__tk")).as("__tks"), max(col("__mx")).as("max_sentence_tokens"),
        sum(when(col("__ns") === 1, 1L).otherwise(0L)).as("__single"))
      .select(col("lang"), col("n_docs"), col("n_sentences"),
        expr("__tks * 1000 DIV n_sentences").as("mean_tokens_milli"),
        col("max_sentence_tokens"),
        expr("__single * 1000000 DIV n_docs").as("single_sentence_ppm"))
      .orderBy("lang")
  }

  /**
   * COUNT-MIN sketch audit (Cormode & Muthukrishnan '05, public
   * technique) — the mergeable frequency sketch the Misra-Gries pass
   * ([[heavyHitters]]) complements: where MG certifies membership of
   * heavy terms, CM answers point queries for ANY term with a one-sided
   * error (estimate ≥ truth, always). The d×w counter matrix is exactly
   * a groupBy: row j of the sketch counts token occurrences by
   * `hash_j(term) mod w`, so the whole build is one explode + one
   * d-way posexplode + one (j, cell) aggregate — the matrix is d·w rows
   * regardless of corpus size, elementwise-addable across shards (the
   * mergeability that makes it the 100 TB distributed-counting sketch).
   * The audit queries the top-`k` EXACT terms back through the sketch
   * and reports estimate vs truth: the overestimate column is the
   * collision mass, non-negative by construction — a violated sign
   * would falsify the implementation, which is what the oracle checks.
   *
   * Determinism: hash_j(term) is the portable 60-bit md5 of "j|term"
   * ([[PortableHash]] construction), so the oracle rebuilds the matrix
   * verbatim. Scale shape: tokens never shuffle raw — the sketch
   * aggregate carries d·w cells, the exact-side top-k is a
   * vocabulary-collapsed TakeOrdered, and the probe joins broadcast
   * k·d rows against the d·w matrix.
   */
  def countMinAudit(docs: DataFrame, textCol: String, depth: Int = 4,
      width: Int = 256, k: Int = 10): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth $depth out of range")
    require(width >= 2, s"width $width too small")
    val tokens = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("term"))
    def cells(termCol: Column): Column = posexplode(array(
      (0 until depth).map { j =>
        pmod(PortableHash.hash60(concat(lit(s"$j|"), termCol)), lit(width.toLong))
      }: _*))
    // the sketch matrix: d·w rows, mergeable by cell-wise addition
    val matrix = tokens.select(cells(col("term")).as(Seq("j", "cell")))
      .groupBy("j", "cell").agg(count(lit(1)).as("cm"))
    val exact = tokens.groupBy("term").agg(count(lit(1)).as("exact_count"))
      .orderBy(desc("exact_count"), col("term")).limit(k)
    val probes = exact.select(col("term"), col("exact_count"),
      cells(col("term")).as(Seq("j", "cell")))
    probes.join(matrix, Seq("j", "cell"))
      .groupBy("term", "exact_count")
      .agg(min(col("cm")).as("cm_estimate"))
      .select(col("term"), col("exact_count"), col("cm_estimate"),
        (col("cm_estimate") - col("exact_count")).as("overestimate"))
      .orderBy(desc("exact_count"), col("term"))
  }

  /** Per-language corpus statistics in one pass. */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).as("total_tokens"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))

  /**
   * AMS / TUG-OF-WAR F2 sketch audit (Alon, Matias & Szegedy '96, public
   * technique) — the second-frequency-moment sketch that completes the
   * mergeable-sketch shelf (HLL=F0, CM/MG=point queries, THIS=F2, the
   * self-join size / skew functional): estimator row j sums a ±1 sign per
   * token occurrence (sign = bit j of the term's portable 60-bit md5
   * hash), and E[S_j²] = F2 exactly. The audit squares each of `depth`
   * independent rows, takes their lower MEDIAN (the AMS median trick —
   * robust where the mean is hijacked by one bad row), and reports it
   * against the exact F2 = Σ c_t² with the relative error in ppm — the
   * measured-not-assumed discipline every sketch in this inventory obeys.
   *
   * Scale shape: the sketch is `depth` counters — each row's S_j is one
   * map-side partial-agged sum (the token explode collapses to `depth`
   * rows before the exchange, and shards merge by plain addition, which
   * is what makes it THE distributed F2 sketch); the exact side is the
   * vocabulary-collapsed Σc², computed once for the audit and absent at
   * production scale.
   */
  def amsF2Audit(docs: DataFrame, textCol: String, depth: Int = 16): DataFrame = {
    require(depth >= 1 && depth <= 60, s"depth $depth outside 1..60")
    val tokens = docs.filter(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("term"))
      .withColumn("__h", PortableHash.hash60(col("term")))
    val rows = tokens
      .select(explode(expr(s"sequence(0, ${depth - 1})")).as("__j"), col("__h"))
      .select(col("__j"),
        expr("CAST(CASE WHEN (__h >> __j) & 1 = 1 THEN 1 ELSE -1 END AS BIGINT)")
          .as("__s"))
      .groupBy("__j").agg(sum(col("__s")).as("__sj"))
      .select((col("__sj") * col("__sj")).as("__est"))
    val med = rows.agg(sort_array(collect_list(col("__est"))).as("__es"),
        count(lit(1)).as("__d"))
      .select(expr("element_at(__es, CAST((__d + 1) DIV 2 AS INT))").as("ams_f2"))
    val exact = tokens.groupBy("term").agg(count(lit(1)).as("__c"))
      .agg(count(lit(1)).as("n_terms"), sum(col("__c")).as("n_tokens"),
        sum(col("__c") * col("__c")).as("exact_f2"))
    exact.crossJoin(broadcast(med))
      .select(col("n_tokens"), col("n_terms"), col("exact_f2"), col("ams_f2"),
        expr("""CAST(CASE WHEN ams_f2 >= exact_f2
             THEN (ams_f2 - exact_f2) * 1000000 DIV exact_f2
             ELSE (exact_f2 - ams_f2) * 1000000 DIV exact_f2
             END AS BIGINT)""").as("abs_rel_error_ppm"))
  }

  /**
   * UNSEEN-MASS / SPECIES-RICHNESS estimate — the two classical
   * frequency-of-frequencies estimators every corpus-growth decision
   * reads (public statistics): Good–Turing's missing mass P(unseen) ≈
   * N₁/N (Good '53) and Chao1's vocabulary-size floor D + N₁²/(2N₂)
   * (Chao '84; the N₂=0 degenerate case uses the standard
   * N₁(N₁−1)/2 correction). Per source: "how much of the next shard's
   * token stream will be words this source has never shown us, and how
   * big is its true vocabulary" — the quantified version of x255's
   * novelty curve, one number per source instead of a trajectory.
   *
   * Scale shape: one (source, term) aggregate (vocabulary-bounded
   * exchange), one frequency-of-frequencies collapse (≤ |counts| rows),
   * then per-source arithmetic on a |sources| frame.
   */
  def unseenMassEstimate(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val counts = docs.filter(col(textCol).isNotNull && col(sourceCol).isNotNull)
      .select(col(sourceCol).as("source"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("__c"))
    counts.groupBy("source")
      .agg(sum(col("__c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("__c") === 2, 1L).otherwise(0L)).as("n_doubletons"))
      .select(col("source"), col("n_tokens"), col("n_distinct"),
        col("n_hapax"), col("n_doubletons"),
        expr("n_hapax * 1000000 DIV n_tokens").as("unseen_mass_ppm"),
        expr("""n_distinct + CASE WHEN n_doubletons > 0
             THEN n_hapax * n_hapax DIV (2 * n_doubletons)
             ELSE n_hapax * (n_hapax - 1) DIV 2 END""").as("chao1_vocab_est"))
      .orderBy("source")
  }

  /**
   * QUALITY RULE-GATE census — the per-rule diagnosis table behind a
   * composite gate like [[qualityScore]] (which collapses everything to
   * one number): for each source, how many docs FAIL each of five
   * deterministic surface rules (the public Gopher/C4-style repertoire,
   * instantiated with integer thresholds): token count in [`minTokens`,
   * `maxTokens`]; mean word length in [3000, 6000] milli-chars;
   * top-word share ≤ 200 milli (the repetition smell); distinct-token
   * ratio ≥ 300 milli; ≥ 2 distinct stopwords present. A source whose
   * failures concentrate in ONE rule has a systematic defect; a composite
   * score can't say which.
   *
   * Scale shape: rules 1-2-5 are map-side expressions; rules 3-4 ride one
   * (doc, term) aggregate (the x240 vocabulary-collapse shape) joined
   * back by doc id; output is |sources| rows.
   */
  def ruleGateCensus(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, minTokens: Int = 30, maxTokens: Int = 80): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull && col(sourceCol).isNotNull)
      .select(col(idCol).as("__id"), col(sourceCol).as("source"),
        col(textCol).as("__t"))
      .withColumn("__nTok", tokenCount(col("__t")).cast("long"))
      .withColumn("__nChr", length(col("__t")).cast("long"))
    val perTerm = base
      .select(col("__id"), explode(split(col("__t"), " ")).as("__w"))
      .groupBy("__id", "__w").agg(count(lit(1)).as("__c"))
      .groupBy("__id")
      .agg(max(col("__c")).as("__topC"), count(lit(1)).as("__distinct"),
        sum(when(col("__w").isin("the", "a", "and", "of"), 1L).otherwise(0L))
          .as("__stops"))
    base.join(perTerm, "__id")
      .withColumn("__f1", (col("__nTok") < minTokens ||
        col("__nTok") > maxTokens).cast("long"))
      // mean word length: chars minus the nTok-1 separators, in milli
      .withColumn("__mwl",
        expr("(__nChr - __nTok + 1) * 1000 DIV __nTok"))
      .withColumn("__f2", (col("__mwl") < 3000L || col("__mwl") > 6000L).cast("long"))
      .withColumn("__f3", (expr("__topC * 1000 DIV __nTok") > 200L).cast("long"))
      .withColumn("__f4", (expr("__distinct * 1000 DIV __nTok") < 300L).cast("long"))
      .withColumn("__f5", (col("__stops") < 2L).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__f1")).as("fail_token_count"),
        sum(col("__f2")).as("fail_word_length"),
        sum(col("__f3")).as("fail_top_word_share"),
        sum(col("__f4")).as("fail_distinct_ratio"),
        sum(col("__f5")).as("fail_stopwords"),
        sum(when(col("__f1") + col("__f2") + col("__f3") + col("__f4")
          + col("__f5") === 0L, 1L).otherwise(0L)).as("pass_all"))
      .select(col("source"), col("n_docs"), col("fail_token_count"),
        col("fail_word_length"), col("fail_top_word_share"),
        col("fail_distinct_ratio"), col("fail_stopwords"), col("pass_all"),
        expr("pass_all * 1000000 DIV n_docs").as("pass_ppm"))
      .orderBy("source")
  }

  /**
   * VOCABULARY GROWTH curve (the Heaps-law table, public observation) —
   * distinct terms seen after the first m documents, at the given
   * checkpoints: the "is the corpus still teaching the tokenizer new
   * words" readout that decides whether to keep scaling a source, WITHOUT
   * fitting logs (the exact count table IS the evidence; a float Heaps
   * exponent would be engine-fragile and adds nothing a reader can't see
   * here). Document order is the deterministic ascending-id order
   * ([[Sampling.globalRankRange]]'s two-phase rank — never a single
   * global sort task); each term contributes at its FIRST-occurrence
   * rank only. Checkpoints past the corpus size simply saturate —
   * constant output shape at every SF.
   *
   * Per checkpoint: cumulative vocabulary, NEW terms since the previous
   * checkpoint, and new-terms-per-document ppm over the interval.
   *
   * Scale shape: one explode pass collapses to (term, first_rank) —
   * vocabulary-bounded from there; checkpoint banding is a map-side CASE
   * ladder over the constant list, the cumulative rides a
   * ≤|checkpoints| window ([[BoundedGlobalWindow]]).
   */
  def vocabGrowthCurve(docs: DataFrame, idCol: String, textCol: String,
      checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints.forall(_ >= 1)
      && checkpoints == checkpoints.sorted
      && checkpoints.distinct.size == checkpoints.size,
      "checkpoints must be distinct positive ascending")
    import org.apache.spark.sql.expressions.Window
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), col(textCol).as("__text"))
    val ranked = Sampling.globalRankRange(
        base.select(col("__id"), col("__id").as("__v")), "__id", "__v")
      .select(col("__id"), col("global_rank"))
      .join(base, "__id")
    val firstOcc = ranked
      .select(col("global_rank").as("__r"),
        explode(split(col("__text"), " ")).as("__term"))
      .groupBy("__term").agg(min(col("__r")).as("__fr"))
    // map-side band: the first checkpoint ≥ the term's first rank; terms
    // past the last checkpoint fall outside the curve
    val band = checkpoints.init.foldRight(
        when(col("__fr") <= checkpoints.last, checkpoints.last): Column) {
      (c, acc) => when(col("__fr") <= c, c).otherwise(acc)
    }
    val spine = docs.sparkSession.createDataFrame(
      checkpoints.map(Tuple1(_))).toDF("m_docs")
    val perBand = firstOcc.select(band.as("m_docs"))
      .filter(col("m_docs").isNotNull)
      .groupBy("m_docs").agg(count(lit(1)).as("__new"))
    spine.join(perBand, Seq("m_docs"), "left")
      .select(col("m_docs"), coalesce(col("__new"), lit(0L)).as("new_terms"))
      .withColumn("vocab_size", sum(col("new_terms")).over(
        BoundedGlobalWindow.orderBy("m_docs")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__prev", coalesce(lag(col("m_docs"), 1).over(
        BoundedGlobalWindow.orderBy("m_docs")), lit(0L)))
      .select(col("m_docs"), col("vocab_size"), col("new_terms"),
        expr("new_terms * 1000000 DIV (m_docs - __prev)")
          .as("new_per_doc_ppm"))
      .orderBy("m_docs")
  }
}
