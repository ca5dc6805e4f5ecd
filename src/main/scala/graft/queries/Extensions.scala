package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Analytics, AsOf, Bucketing, CdcMerge, Curation, Dedup, Geo, Graph, Integrity, LayoutAdvisor, Multimodal, RangeJoin, Sampling, Scd2, Similarity, Skew, SkippingIndex, TextAnalysis}
import graft.sources.Tables

/**
 * Tier X — LLM-data-pipeline extension operators (BASELINE.json north star;
 * SURVEY.md §7.4): dedup family, vector similarity search, text analysis,
 * multimodal plumbing, streaming. Each SQL-expressible op carries a DuckDB
 * oracle; hash-based ops (simhash) get rows-only entries plus unit tests.
 */
object Extensions {

  type Q = (SparkSession, String) => DataFrame

  private def docs(spark: SparkSession, sfDir: String) = Tables(spark, sfDir, "documents")
  private def emb(spark: SparkSession, sfDir: String) = Tables(spark, sfDir, "embeddings")

  /** events with deterministically planted NULL user keys (~0.5% of rows by
    * event-id modulus, mirrored in [[nullUserCte]]) — the clean testdata has
    * no NULL partition keys, which would leave the classic NULL-window-key
    * engine divergence vacuously untested (x93's planting pattern). */
  private def eventsNullUser(spark: SparkSession, sfDir: String) =
    Tables(spark, sfDir, "events").withColumn("user_id",
      when(col("event_id") % 211 === 0, lit(null).cast("long"))
        .otherwise(col("user_id")))

  /** Session-scoped memo of the MinHash-LSH candidate-pair STAGING frame —
    * the production "staging table" pattern: four downstream queries
    * (x18/x24/x53/x98) consume the same verified pair set, so it is
    * computed and materialized (`localCheckpoint`) ONCE per session+SF and
    * every consumer reads the tiny checkpointed frame instead of re-running
    * the corpus-wide LSH. x02 stays on the raw operator — it IS the pair
    * computation and PlanSpec pins its LSH plan shape. Keyed by
    * applicationId so a fresh session never reads a stale frame. */
  private val lshPairsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def lshPairs(spark: SparkSession, sfDir: String): DataFrame =
    lshPairsMemo.computeIfAbsent(s"${spark.sparkContext.applicationId}:$sfDir",
      _ => Dedup.minhashLsh(docs(spark, sfDir), "doc_id", "text", threshold = 0.7)
        .localCheckpoint())

  /** Session-scoped memo of the distinct customer→supplier purchase-graph
    * edge frame — the staging table both graph rankings (x66 PageRank,
    * x104 HITS) consume; built from orders⋈lineitem once per session+SF
    * and localCheckpoint'd (same contract as [[lshPairs]]). */
  private val edgesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def purchaseEdges(spark: SparkSession, sfDir: String): DataFrame =
    edgesMemo.computeIfAbsent(s"${spark.sparkContext.applicationId}:$sfDir",
      _ => {
        val o = Tables(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
        val l = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_suppkey")
        o.join(l, col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c"), col("o_custkey")).as("src"),
            concat(lit("s"), col("l_suppkey")).as("dst"))
          .distinct()
          .localCheckpoint()
      })

  /** Node frame of [[purchaseEdges]] (distinct endpoint set), checkpointed
    * once per session+SF — both graph rankings derive it otherwise. */
  private val nodesMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def purchaseNodes(spark: SparkSession, sfDir: String): DataFrame =
    nodesMemo.computeIfAbsent(s"${spark.sparkContext.applicationId}:$sfDir",
      _ => {
        val e = purchaseEdges(spark, sfDir)
        e.select(col("src").as("v")).union(e.select(col("dst").as("v")))
          .distinct()
          .localCheckpoint()
      })

  /** Session-scoped memo of the 1996–97 part co-purchase edge frame —
    * the staging table the closure analyses (x188 triangles, x450 local
    * clustering, x481 weight spectrum, x495 rich club) all consume;
    * built from the date-pruned lineitem scan once per session+SF and
    * localCheckpoint'd (same contract as [[lshPairs]]). */
  private val copurchaseMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def copurchaseEdges(spark: SparkSession, sfDir: String): DataFrame =
    copurchaseMemo.computeIfAbsent(s"${spark.sparkContext.applicationId}:$sfDir",
      _ => {
        val li = Tables(spark, sfDir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1998-01-01"))
          .select(col("l_orderkey").as("__o"), col("l_partkey").as("__p"))
          .distinct()
        li.as("a")
          .join(li.as("b"),
            col("a.__o") === col("b.__o") && col("a.__p") < col("b.__p"))
          .select(col("a.__p").as("src"), col("b.__p").as("dst"))
          .localCheckpoint()
      })

  /** Drop the staging memos (checkpointed frames are reclaimed by the
    * ContextCleaner once unreferenced). The bench calls this between timed
    * passes so each pass honestly pays the one-time staging builds —
    * `clearCache()` alone would not drop checkpointed RDD blocks. */
  def clearStagingMemo(): Unit = {
    lshPairsMemo.clear(); edgesMemo.clear(); nodesMemo.clear()
    copurchaseMemo.clear()
  }
  private def queryVec(spark: SparkSession, sfDir: String) =
    emb(spark, sfDir).filter(col("vec_id") === 0).select(col("embedding").as("qe"))

  /** x01 — exact dedup: representative (min id) per distinct text. */
  private val x01: Q = (spark, sfDir) =>
    Dedup.exact(docs(spark, sfDir), "text", "doc_id").select("doc_id").orderBy("doc_id")

  /** x02 — MinHash+LSH near-dup pairs, exact-verified; equals the exact
    * O(n²) oracle with P(miss) ≈ 2e-6 per true pair. */
  private val x02: Q = (spark, sfDir) =>
    Dedup.minhashLsh(docs(spark, sfDir), "doc_id", "text", threshold = 0.7)
      .orderBy("d1", "d2")

  /** x03 — SimHash near-dup pairs over md5-derived 60-bit word hashes: the
    * portable hash makes fingerprints, banding, and hamming distances all
    * reproducible in DuckDB, so the full operator output is oracle-checked
    * (the xxhash64 default stays the fast path for library users). */
  private val x03: Q = (spark, sfDir) =>
    Dedup.simhashPairs(docs(spark, sfDir), "doc_id", "text", maxHamming = 3,
      wordHash = Dedup.portableWordHash, numBits = 60, numBands = 4)
      .orderBy("d1", "d2")

  /** x04 — exact n-gram jaccard via distributed token join (threshold 0.5,
    * df cap 1000 — see [[Dedup.ngramJaccard]]; mirrored in the oracle). */
  private val x04: Q = (spark, sfDir) =>
    Dedup.ngramJaccard(docs(spark, sfDir), "doc_id", "text", minJaccard = 0.5)
      .orderBy("d1", "d2")

  /** x05 — brute-force cosine top-k (exact baseline). */
  private val x05: Q = (spark, sfDir) =>
    Similarity.bruteForceTopK(emb(spark, sfDir), queryVec(spark, sfDir), 20)

  /** x06 — bucketed ANN top-k (sign-code coarse quantizer, the scale path). */
  private val x06: Q = (spark, sfDir) =>
    Similarity.annTopK(emb(spark, sfDir), queryVec(spark, sfDir), 10)

  /** x07 — per-language corpus statistics. */
  private val x07: Q = (spark, sfDir) =>
    TextAnalysis.corpusStats(docs(spark, sfDir)).orderBy("lang")

  /** x08 — language-ID heuristic confusion matrix vs the labeled lang. */
  private val x08: Q = (spark, sfDir) =>
    docs(spark, sfDir)
      .withColumn("predicted", TextAnalysis.langIdHeuristic(col("text")))
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")

  /** x09 — quality scoring + filter. */
  private val x09: Q = (spark, sfDir) =>
    docs(spark, sfDir)
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tok"),
        TextAnalysis.qualityScore(col("text")).as("score"))
      .filter(col("score") >= 0.5)
      .orderBy("doc_id")

  /** x10 — BPE-ish token counting aggregated per source. */
  private val x10: Q = (spark, sfDir) =>
    docs(spark, sfDir)
      .groupBy("source")
      .agg(sum(TextAnalysis.bpeishTokenCount(col("text"))).as("total_tokens"))
      .orderBy("source")

  /** x11 — content fingerprinting (md5, engine-portable exact key). */
  private val x11: Q = (spark, sfDir) =>
    docs(spark, sfDir)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** x12 — multimodal image pipeline: per-doc deterministic PNG payloads →
    * mapPartitions batch feature extraction through a REAL `javax.imageio`
    * decode; the oracle recomputes each image's stats arithmetically from
    * the test-pattern formula, so the rows only match if the codec
    * round-trips every pixel. */
  private val x12: Q = (spark, sfDir) => {
    val media = Multimodal.renderImageTable(spark, docs(spark, sfDir))
    Multimodal.extractFeatures(spark, media).toDF()
      .orderBy("doc_id")
  }

  /** x117 — perceptual image near-dup ([[Multimodal.perceptualNearDupPairs]]):
    * REAL decode → 64-bit dHash → 4×16-bit banded Hamming join at t=3
    * (pigeonhole recall guarantee). Non-vacuous via planted one-pixel
    * variants (doc_id % 97), whose ≤3-bit flips are certified by dHash's
    * local-gradient structure. */
  private val x117: Q = (spark, sfDir) => {
    val media = Multimodal.renderImageTableWithVariants(spark, docs(spark, sfDir))
    Multimodal.perceptualNearDupPairs(
        Multimodal.perceptualHashes(spark, media).toDF())
      .orderBy("img_a", "img_b")
  }

  /** x13 — Structured Streaming tumbling-window counts, drained to a memory
    * sink in complete mode so the final state equals the batch oracle. */
  private val x13: Q = (spark, sfDir) =>
    graft.streaming.EventStream.windowedCounts(spark, sfDir)

  /** Offset that keeps planted vec_ids disjoint from the real id range. */
  private val PlantOffset = 1000000L

  /** `embeddings` unioned with deterministically perturbed copies of
    * vec_ids 1..20 (vec_id + [[PlantOffset]]): element i is scaled by
    * 1 + ((i·37 + vec_id) mod 7 − 3)/100 — ±3% multiplicative noise from
    * pure integer arithmetic, evaluated in double and cast back to float,
    * so DuckDB reproduces the planted vectors bit-for-bit (same IEEE ops).
    * cosine(v, planted(v)) ≈ 0.999 ≥ 0.95: the corpus then contains known
    * near-dup pairs, making x14's LSH + verify path non-vacuous. */
  private def plantedEmb(spark: SparkSession, sfDir: String): DataFrame = {
    val e = emb(spark, sfDir).select("vec_id", "embedding")
    // the noise term references the ORIGINAL vec_id: keep the id offset in a
    // separate select — in one select Spark resolves the lambda's `vec_id`
    // to the lateral alias (the offset id), DuckDB to the source column
    val perturbed = e.filter(col("vec_id").between(1, 20))
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          (element_at(col("embedding"), i + 1).cast("double") *
            (lit(1.0) + ((i * 37 + col("vec_id")) % 7 - 3).cast("double") / 100.0))
            .cast("float")).as("embedding"))
      .select((col("vec_id") + PlantOffset).as("vec_id"), col("embedding"))
    e.unionByName(perturbed)
  }

  /** x14 — embedding near-duplicate pairs: banded random-hyperplane LSH
    * candidates, exact cosine ≥ 0.95 verification. Runs over
    * [[plantedEmb]] (real corpus + 20 planted near-dups, reproduced
    * verbatim in the oracle) so the oracle-checked output is non-empty at
    * every SF — previously the generated data had no pair above 0.95 and
    * the green row proved only 0 == 0. */
  private val x14: Q = (spark, sfDir) =>
    Similarity.cosineNearDupPairs(plantedEmb(spark, sfDir), 0.95).orderBy("v1", "v2")

  /** x58 — label-centroid confusion matrix over the embeddings: nearest
    * label centroid by cosine vs the true label
    * ([[Similarity.labelCentroidConfusion]]; decimal-exact centroid sums,
    * shared fold order ⇒ cross-engine-identical argmax). */
  private val x58: Q = (spark, sfDir) =>
    Similarity.labelCentroidConfusion(emb(spark, sfDir))
      .orderBy("label", "pred_label")

  /** x61 — batch ANN retrieval: top-3 neighbours for each of the first 8
    * vectors as a query batch, one corpus pass + per-query window
    * ([[Similarity.batchTopK]]). */
  private val x61: Q = (spark, sfDir) => {
    val e = emb(spark, sfDir)
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    Similarity.batchTopK(e, queries, k = 3).orderBy("qid", "rn")
  }

  /** x22 — banded-LSH ANN top-k (OR-construction multi-probe; the scale
    * path past x06's single coarse bucket). */
  private val x22: Q = (spark, sfDir) =>
    Similarity.annBandedTopK(emb(spark, sfDir), queryVec(spark, sfDir), 10)

  /** x23 — per-doc n-gram repetition statistics (Gopher-style repetition
    * quality signal). */
  private val x23: Q = (spark, sfDir) =>
    Dedup.repetitionStats(docs(spark, sfDir), "doc_id", "text").orderBy("doc_id")

  /** x24 — full corpus-dedup composite: minhash pairs → clusters → keep the
    * highest-quality doc per cluster (ties → smallest id) + all singletons.
    * The end product of the dedup pipeline: the retained doc set. */
  private val x24: Q = (spark, sfDir) => {
    val d = docs(spark, sfDir)
    val clusters = Dedup.dupClusters(lshPairs(spark, sfDir), iterations = 3)
    Dedup.retainBest(d, "doc_id", TextAnalysis.qualityScore(col("text")), clusters)
      .orderBy("doc_id")
  }

  /** x25 — top-5 terms per language (vocabulary inspection; agg-then-rank). */
  private val x25: Q = (spark, sfDir) =>
    TextAnalysis.topTermsPerLang(docs(spark, sfDir), 5).orderBy("lang", "rank")

  /** x26 — production-shape streaming: watermark + APPEND mode over ordered
    * multi-batch replay; emits each finalized hour window exactly once. */
  private val x26: Q = (spark, sfDir) =>
    graft.streaming.EventStream.windowedCountsAppend(spark, sfDir)

  /** x27 — production-shape stateful streaming: flatMapGroupsWithState +
    * EventTimeTimeout emits each closed session exactly once; idle-user
    * state is dropped at timeout. */
  private val x27: Q = (spark, sfDir) =>
    graft.streaming.EventStream.closedSessions(spark, sfDir)

  /** x15 — stateful streaming sessionization (mapGroupsWithState). */
  private val x15: Q = (spark, sfDir) =>
    graft.streaming.EventStream.userSessions(spark, sfDir)

  /** x16 — as-of join: each error event picks up the user's latest prior
    * purchase (composed operator, DuckDB native ASOF JOIN as oracle). */
  private val x16: Q = (spark, sfDir) => {
    val ev = Tables(spark, sfDir, "events")
    val errors = ev.filter(col("event_type") === "error").select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    AsOf.asofJoin(errors, purchases, "user_id", "ts", Seq("event_id", "value"))
      .select(col("event_id"), col("user_id"),
        col("asof_event_id").as("purchase_id"), col("asof_value").as("purchase_value"))
      .orderBy("event_id")
  }

  /** x18 — duplicate clusters: minhash pairs → bounded min-label propagation
    * (3 rounds; near-dup clusters are near-cliques, diameter ≤ 3 here). */
  private val x18: Q = (spark, sfDir) =>
    Dedup.dupClusters(lshPairs(spark, sfDir), iterations = 3).orderBy("doc_id")

  /** x53 — convergence-checked connected components over the same minhash
    * pair graph as x18: min-label propagation iterated until no label
    * changes ([[Dedup.connectedComponents]]) — exact components for any
    * graph shape, where x18's fixed 3 rounds under-merge past 3 hops. The
    * oracle is a DuckDB RECURSIVE CTE computing true reachability. */
  private val x53: Q = (spark, sfDir) =>
    Dedup.connectedComponents(lshPairs(spark, sfDir)).orderBy("doc_id")

  /** x54 — line-level (chunk-hash) boilerplate dedup: aligned 10-token
    * chunks shared by >1 doc are dropped everywhere; per-doc survival
    * stats ([[Dedup.lineDedup]]). Linear in chunk count — no pair join. */
  private val x54: Q = (spark, sfDir) =>
    Dedup.lineDedup(docs(spark, sfDir), "doc_id", "text", lineTokens = 10)
      .orderBy("doc_id")

  /** x55 — distributed global ranking of docs by (n_chars, doc_id): no
    * corpus-wide sort — per-value counts + prefix-summed offsets over the
    * tiny distinct-value frame, broadcast back
    * ([[Sampling.globalRankByValue]]). */
  private val x55: Q = (spark, sfDir) =>
    Sampling.globalRankByValue(docs(spark, sfDir), "doc_id", "n_chars")
      .orderBy("doc_id")

  /** x56 — NATIVE session-window aggregation (`session_window`, Spark's
    * built-in merging-session operator) over events with a 30-minute gap —
    * the declarative complement of x15/x27's custom mapGroups state:
    * Catalyst plans partial session merges map-side before the user_id
    * exchange. Session end = last event + gap; a gap of exactly the
    * window starts a NEW session ([start, end) windows just touching do
    * not overlap) — the oracle's lag-islands rule uses >= accordingly. */
  private val x56: Q = (spark, sfDir) =>
    Tables(spark, sfDir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  /** x57 — unigram rarity scoring (perplexity-proxy quality filter) in
    * pure integer arithmetic ([[TextAnalysis.rarityScore]]). */
  private val x57: Q = (spark, sfDir) =>
    TextAnalysis.rarityScore(docs(spark, sfDir), "doc_id", "text")
      .orderBy("doc_id")

  /** x62 — deterministic corpus shuffle: each doc's position in a
    * reproducible pseudorandom training order (rank by md5 fingerprint —
    * high-cardinality, so the range-partitioned
    * [[Sampling.globalRankRange]] is the right rank operator; x55's
    * per-value offsets would build a corpus-sized offset table here). */
  private val x62: Q = (spark, sfDir) =>
    Sampling.globalRankRange(
      docs(spark, sfDir).withColumn("fp", TextAnalysis.fingerprint(col("text"))),
      "doc_id", "fp")
      .orderBy("doc_id")

  /** x63 — equi-depth histogram of order prices (16 buckets): the
    * statistics-collection shape a cost-based optimizer feeds on. Built on
    * [[Sampling.globalRankRange]] (prices are high-cardinality) with the
    * bucket from pure integer arithmetic `(rank-1)*B DIV n` — exact
    * equal-depth split, no approximate percentile sketch, engine-identical
    * boundaries. One range exchange + one hash agg. */
  private val x63: Q = (spark, sfDir) => {
    val o = Tables(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
    // row count as a 1-row broadcast, NOT a whole-frame window (which would
    // funnel the corpus through one task — the anti-pattern x55/x62 avoid)
    Sampling.globalRankRange(o, "o_orderkey", "o_totalprice")
      .crossJoin(broadcast(o.agg(count(lit(1)).as("total"))))
      .withColumn("bucket", expr("CAST(((global_rank - 1) * 16) DIV total AS INT)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      .orderBy("bucket")
  }

  /** x64 — ordered funnel conversion (signup → click → purchase): users
    * counted at each stage only when the stage event is strictly after
    * their first previous-stage event. NULL user keys are deterministically
    * planted (id-modulo, mirrored in the oracle) so the classic window-op
    * divergence — how engines partition NULL keys — is non-vacuously
    * checked. Single events scan: one exchange,
    * two chained running-min windows, user agg reusing the partitioning
    * ([[Analytics.funnel]] — vs 3 shuffles + 3 scans for the naive
    * aggregate-and-join-back-per-stage shape). */
  private val x64: Q = (spark, sfDir) =>
    Analytics.funnel(eventsNullUser(spark, sfDir),
      "user_id", "ts", "event_type", "signup", "click", "purchase")

  /** x65 — weekly cohort retention matrix: distinct active users per
    * (first-event cohort week, whole weeks since cohort). Activity is
    * collapsed to DISTINCT (user, week) before the co-partitioned join
    * ([[Analytics.cohortRetention]]), so join input is bounded by
    * users x weeks, not raw events. */
  private val x65: Q = (spark, sfDir) =>
    Analytics.cohortRetention(Tables(spark, sfDir, "events"), "user_id", "ts")
      .orderBy("cohort_week", "week_offset")

  /** x66 — integer-exact PageRank (3 iterations) over the customer→supplier
    * purchase graph (edges: distinct (o_custkey, l_suppkey) via orders ⋈
    * lineitem). All-BIGINT fixed-point arithmetic ([[Graph.pageRank]]) makes
    * the iterative ranking bit-reproducible across engines — the oracle is
    * the same three rounds unrolled as CTEs. Top-20 nodes by rank. */
  private val x66: Q = (spark, sfDir) =>
    Graph.pageRank(purchaseEdges(spark, sfDir), 3, assumeDistinct = true,
        precomputedNodes = Some(purchaseNodes(spark, sfDir)))
      .orderBy(desc("r"), col("v")).limit(20)

  /** x67 — edit-distance near-dup pairs (levenshtein ≤ 20 over 80-char
    * prefixes, restricted to jaccard ≥ 0.7 LSH candidates):
    * candidate-restricted character-level verification
    * ([[Dedup.editDistancePairs]]); the oracle is the exact O(n²) jaccard
    * pair set + the same levenshtein filter (equality argument = x02's:
    * P(LSH miss) ≈ 2e-6 per true pair). */
  private val x67: Q = (spark, sfDir) =>
    Dedup.editDistancePairs(docs(spark, sfDir), "doc_id", "text")
      .orderBy("d1", "d2")

  /** x69 — top-20 corpus bigram counts ([[TextAnalysis.bigramCounts]]):
    * the counting step of a BPE merge round. Map-side bigram
    * materialization, vocabulary-bounded shuffle, TakeOrdered top-k. */
  private val x69: Q = (spark, sfDir) =>
    TextAnalysis.bigramCounts(docs(spark, sfDir), "text", k = 20)

  /** x70 — CERTIFIED approximate percentiles (the b14 pattern applied to
    * quantile sketches): exact interpolated percentiles are the
    * oracle-checked columns; the `approx_percentile` sketch estimate rides
    * along as a within-tolerance boolean the oracle pins to TRUE — so the
    * row is fully checked AND certifies the sketch, even though a KLL/GK
    * sketch can never hash-match another engine's. At 100 TB the sketch is
    * the only affordable path (exact percentile sorts each group); this
    * query is the harness proving the sketch's error contract holds. */
  private val x70: Q = (spark, sfDir) =>
    Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("exact_p50"),
        expr("percentile(l_quantity, 0.9)").as("exact_p90"),
        expr("approx_percentile(l_quantity, 0.5, 1000)").as("a50"),
        expr("approx_percentile(l_quantity, 0.9, 1000)").as("a90"))
      .select(col("l_returnflag"), col("exact_p50"), col("exact_p90"),
        (abs(col("a50") - col("exact_p50")) <= 1.0 &&
          abs(col("a90") - col("exact_p90")) <= 1.0).as("approx_ok"))
      .orderBy("l_returnflag")

  /** x71 — deterministic QUALITY-WEIGHTED Bernoulli downsample
    * ([[Sampling.weightedBernoulli]]): longer (higher-quality-band) docs
    * keep at 8/10, mid at 5/10, short at 2/10 — md5 draw, zero exchanges
    * before the reporting aggregate; reproducible across engines. */
  private val x71: Q = (spark, sfDir) => {
    val w = when(col("n_chars") >= 400, 8).when(col("n_chars") >= 200, 5).otherwise(2)
    docs(spark, sfDir)
      .withColumn("kept", Sampling.weightedBernoulli(col("doc_id"), w).cast("int"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("n_kept"))
      .orderBy("source")
  }

  /** x68 — daily gap fill + forward fill per user: dense calendar spine
    * sized by each user's own active range, last observed `value` carried
    * across gap days ([[Analytics.gapFillForwardFill]] — spine join and
    * fill window all hash-partitioned on the user key). NULL user keys
    * planted (id-modulo): they spine/window as one pseudo-user but never
    * equi-join back to their day values — both engines must agree on BOTH
    * behaviors. */
  private val x68: Q = (spark, sfDir) =>
    Analytics.gapFillForwardFill(eventsNullUser(spark, sfDir),
      "user_id", "ts", "event_id", "value")
      .orderBy("user_id", "day")

  /** x72 — trending top-3 event types per day ([[Analytics.trendingTopK]]):
    * the rank runs over (window × type) aggregates, never raw events. */
  private val x72: Q = (spark, sfDir) =>
    Analytics.trendingTopK(Tables(spark, sfDir, "events"), "ts", "event_type", k = 3)
      .withColumn("win_start", col("win_start").cast("date"))
      .orderBy("win_start", "rnk")

  /** x73 — market-basket co-occurrence with integer-exact lift
    * ([[Analytics.coOccurrenceLift]]): users collapse to DISTINCT
    * (user, type) before the bounded per-user pair join. */
  private val x73: Q = (spark, sfDir) =>
    Analytics.coOccurrenceLift(Tables(spark, sfDir, "events"), "user_id", "event_type")
      .orderBy("t1", "t2")

  /** x74 — RFM segmentation ([[Analytics.rfmSegments]]): single-pass
    * recency/frequency/monetary features, decimal-exact monetary bands,
    * segment counts. */
  private val x74: Q = (spark, sfDir) =>
    Analytics.rfmSegments(Tables(spark, sfDir, "events"), "user_id", "ts", "value")
      .orderBy("r_band", "f_band", "m_band")

  /** x75 — STREAMING trending top-k ([[graft.streaming.EventStream
    * .trendingTopK]]): watermarked append-mode day-window counts over the
    * ordered replay, ranked over finalized windows only — the streaming
    * twin of x72 (which includes the in-progress final day; here it is
    * still in state, unemitted, exactly as on a live source). */
  private val x75: Q = (spark, sfDir) =>
    graft.streaming.EventStream.trendingTopK(spark, sfDir, k = 3)

  /** x76 — key-skew diagnostics on the lineitem supplier key
    * ([[Skew.keySkewReport]]): top-10 heaviest keys with integer-scaled
    * count/mean ratio — the pre-join observability query that decides
    * between plain, salted (x17), and AQE-split (x46) joins. */
  private val x76: Q = (spark, sfDir) =>
    Skew.keySkewReport(Tables(spark, sfDir, "lineitem"), "l_suppkey", k = 10)

  /** x77 — splice-overlap pairs ([[Dedup.spliceOverlapPairs]]): docs whose
    * 3-token tail equals another doc's 3-token head — chunking-artifact /
    * spliced-duplication detection; linear one-join shape. */
  private val x77: Q = (spark, sfDir) =>
    Dedup.spliceOverlapPairs(docs(spark, sfDir), "doc_id", "text", k = 3)
      .orderBy("d1", "d2")

  /** x78 — CO-LOCATED bucketed join ([[Bucketing.ensureBucketed]]): orders
    * and customer materialized as 8-bucket sorted parquet tables on their
    * join keys, then joined with ZERO exchanges and ZERO sorts before the
    * join (plan-asserted) — the write-once/join-many layout that removes
    * the fact-table shuffle from every downstream query. */
  private val x78: Q = (spark, sfDir) => {
    val tag = sfDir.replaceAll("[^0-9a-zA-Z]", "_")
    val o = Bucketing.ensureBucketed(spark, s"graft_bkt_orders_$tag",
      Tables(spark, sfDir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey", 8, s"${QueryUtil.scratchDir}/bkt_orders_$tag")
    val c = Bucketing.ensureBucketed(spark, s"graft_bkt_customer_$tag",
      Tables(spark, sfDir, "customer").select("c_custkey", "c_mktsegment"),
      "c_custkey", 8, s"${QueryUtil.scratchDir}/bkt_customer_$tag")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), QueryUtil.dsum(col("o_totalprice")).as("total"))
      .orderBy("c_mktsegment")
  }

  /** x79 — replica sync check ([[Integrity.syncCheck]]): customer vs a
    * deterministically-drifted copy (acctbal +1 where custkey % 397 = 0);
    * per-bucket counts + order-independent md5-sum checksums flag exactly
    * the drifted key ranges — the O(buckets) anti-entropy comparison that
    * makes cross-replica verification affordable at 100 TB. */
  private val x79: Q = (spark, sfDir) => {
    val src = Tables(spark, sfDir, "customer")
      .select("c_custkey", "c_acctbal", "c_mktsegment")
    val dst = src.withColumn("c_acctbal",
      col("c_acctbal") + when(pmod(col("c_custkey"), lit(397)) === 0, 1.0).otherwise(0.0))
    val fp = (df: DataFrame) => concat_ws("|",
      col("c_custkey"),
      col("c_acctbal").cast("decimal(18,2)").cast("string"),
      col("c_mktsegment"))
    Integrity.syncCheck(src, dst, "c_custkey", fp, buckets = 16)
      .orderBy("bucket")
  }

  /** x80 — uniform-mixture rebalance ([[Sampling.rebalanceToUniform]]):
    * every source downsampled to the smallest source's rate with an exact
    * per-group rational keep-rate (md5 draw mod n_group < n_min); reports
    * per-source before/after counts. */
  private val x80: Q = (spark, sfDir) =>
    Sampling.rebalanceToUniform(docs(spark, sfDir), "doc_id", "source")
      .groupBy("source")
      .agg(count(lit(1)).as("n_before"),
        sum(col("kept").cast("int")).as("n_kept"))
      .orderBy("source")

  /** x81 — gap-based batch sessionization ([[Analytics.sessionize]],
    * 30-min gap) rolled up to the session-level conversion report: the
    * backfill twin of the streaming sessionizers (x15/x27/x56), one user
    * exchange shared by lag, session counter, and session aggregate. */
  private val x81: Q = (spark, sfDir) =>
    Analytics.sessionize(Tables(spark, sfDir, "events"),
        "user_id", "ts", "event_type", "purchase", gapMinutes = 30)
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted").cast("long")).as("n_converted"),
        sum(col("n_events")).as("total_events"),
        max(col("n_events")).as("max_events"),
        max(col("span_secs")).as("max_span_secs"))

  /** x82 — multimodal frame sampling ([[Multimodal.sampleFrames]]): each
    * doc becomes a length-prefixed container of PNG frames; every 2nd frame
    * is demuxed, REALLY decoded (`javax.imageio`, like x12), and reduced to
    * per-frame stats — the stride cut happens at demux time, before any
    * decode or exchange. */
  private val x82: Q = (spark, sfDir) =>
    Multimodal.sampleFrames(spark, Multimodal.renderVideoTable(spark, docs(spark, sfDir)))
      .toDF()
      .orderBy("doc_id", "frame_idx")

  /** x83 — MERGEABLE distinct-count sketch maintenance (the x40 pattern
    * applied to cardinality): per-day Datasketches HLL sketches are the
    * stored partial states; the all-time distinct-user estimate merges the
    * day sketches (`hll_union_agg`) WITHOUT rescanning events — the only
    * way a 100 TB incremental pipeline answers "distinct users ever".
    * Certified b14-style: the exact count is the oracle-checked column,
    * the sketch estimate rides along as a pinned within-2% boolean. */
  private val x83: Q = (spark, sfDir) => {
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |  hll_sketch_agg(user_id) AS sk FROM events GROUP BY 1),
        |merged AS (SELECT COUNT(*) AS n_days,
        |  hll_sketch_estimate(hll_union_agg(sk)) AS est FROM daily),
        |exact AS (SELECT COUNT(DISTINCT user_id) AS exact_users FROM events)
        |SELECT n_days, exact_users,
        | (abs(est - exact_users) <= 0.02 * exact_users + 1) AS approx_ok
        |FROM merged CROSS JOIN exact""".stripMargin)
  }

  /** x84 — filter-funnel audit ([[Curation.filterFunnel]]): the curation
    * report for a four-rule cleaning pass (length floor, language
    * allowlist, integer-exact avg-word-length cap, exact-dup rank) —
    * per-stage entered/dropped/survived counts from ONE corpus scan.
    * The dup stage drops rows only where the corpus has exact dups
    * (sf0.1); its zero at smaller SFs is still an asserted value, and
    * the other stages drop >0 rows at every SF. */
  private val x84: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val nw = size(split(col("text"), " "))
    Curation.filterFunnel(docs(spark, sfDir), Seq(
      "min_chars" -> (col("n_chars") >= 100),
      "lang_allowed" -> col("lang").isInCollection(Seq("en", "de", "fr", "es")),
      "avg_word_len" -> (col("n_chars") * 10 <= nw * 56),
      "exact_dup" -> (row_number().over(
        Window.partitionBy("text").orderBy("doc_id")) === 1)))
      .orderBy("stage")
  }

  /** x85 — leakage-safe split manifest ([[Curation.leakageSafeSplit]]):
    * sources (not docs) hashed into train/val/test at 60/20/20 — no
    * near-dup can straddle the eval boundary. 20 sources land 9/3/8, so
    * every split is non-empty at every SF. */
  private val x85: Q = (spark, sfDir) =>
    Curation.leakageSafeSplit(docs(spark, sfDir), "source", "n_chars",
      trainPct = 60, valPct = 20)
      .orderBy("split")

  /** x86 — time-weighted average value per user
    * ([[Analytics.timeWeightedAvg]]): duration-weighted state mean over
    * irregular events; integer-cents × micros staged through
    * DECIMAL(38,0), one shared user exchange (plan-asserted). */
  private val x86: Q = (spark, sfDir) =>
    Analytics.timeWeightedAvg(Tables(spark, sfDir, "events"),
      "user_id", "ts", "value", "event_id")
      .orderBy("user_id")

  /** x87 — robust outlier report ([[Curation.robustOutlierReport]]):
    * median/MAD fence on n_chars (k=3), per-source outlier counts and
    * retained range — the audit that catches a corrupted ingest batch
    * without the mean/stddev masking problem. */
  private val x87: Q = (spark, sfDir) =>
    Curation.robustOutlierReport(docs(spark, sfDir), "n_chars", "source", k = 3)
      .orderBy("source")

  /** x88 — n-gram CONTAINMENT pairs ([[Dedup.ngramContainment]]):
    * overlap over the SMALLER shingle set — flags quote-expansion /
    * boilerplate-wrapping duplication that jaccard (x04) structurally
    * misses; same df-capped shingle join shape. */
  private val x88: Q = (spark, sfDir) =>
    Dedup.ngramContainment(docs(spark, sfDir), "doc_id", "text",
      minContainment = 0.6)
      .orderBy("d1", "d2")

  /** x89 — incremental inverted-index maintenance
    * ([[TextAnalysis.mergeIndexDelta]]): the base index (older half of the
    * corpus by id, data-driven cutoff) is folded with a delta index built
    * from ONLY the new docs — one O(vocabulary) manifest join, no base
    * rescan; oracle is the full rebuild over all documents. */
  private val x89: Q = (spark, sfDir) => {
    val d = docs(spark, sfDir)
    val cut = d.agg((max(col("doc_id")) / 2).cast("long").as("cut"))
    val tagged = d.crossJoin(broadcast(cut))
    val base = TextAnalysis.invertedIndex(
      tagged.filter(col("doc_id") < col("cut")), "doc_id", "text", maxPostings = 20)
    val delta = TextAnalysis.invertedIndex(
      tagged.filter(col("doc_id") >= col("cut")), "doc_id", "text", maxPostings = 20)
    TextAnalysis.mergeIndexDelta(base, delta, maxPostings = 20)
      .withColumn("postings", concat_ws(",", col("postings")))
      .orderBy("term")
  }

  /** x90 — budgeted context assembly ([[Similarity.assembleContext]]): the
    * RAG retrieval-to-prompt step — each of 8 query vectors' top-5
    * neighbours greedily packed into a 250-proxy-token budget in rank
    * order (typical doc ≈ 75 tokens, so budgets truncate at 3-4 docs —
    * non-vacuous at every SF). */
  private val x90: Q = (spark, sfDir) => {
    val e = emb(spark, sfDir)
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    Similarity.assembleContext(
      Similarity.batchTopK(e, queries, k = 5),
      docs(spark, sfDir), "doc_id", "n_chars", budgetTokens = 250L)
      .orderBy("qid", "rn")
  }

  /** x91 — int8-quantized retrieval with certified recall
    * ([[Similarity.int8QuantizedTopK]]): top-10 by exact integer dot
    * product over symmetric int8 vectors, each hit marked by whether the
    * float ranking agrees — the quantized-serving recall audit. */
  private val x91: Q = (spark, sfDir) =>
    Similarity.int8QuantizedTopK(emb(spark, sfDir), k = 10).orderBy("rnk")

  /** x92 — last-touch attribution ([[Analytics.lastTouchAttribution]]):
    * purchases credited to the most recent preceding click/view per user
    * via a carried-forward ignore-nulls window — join-free channel
    * report with exact cents and integer mean lag. NULL user keys planted
    * (id-modulo) so the NULL window partition is non-vacuously checked. */
  private val x92: Q = (spark, sfDir) =>
    Analytics.lastTouchAttribution(eventsNullUser(spark, sfDir),
      "user_id", "ts", "event_type", "value", "event_id",
      touchTypes = Seq("click", "view"), convType = "purchase")
      .orderBy("touch")

  /** x93 — referential-conformance audit ([[Integrity.fkConformance]]):
    * per-FK child counts and orphan counts as one report; two relations
    * carry deterministically planted orphans (negated keys on an id
    * modulus) so the orphan path is non-vacuously oracle-checked, one
    * relation is clean. */
  private val x93: Q = (spark, sfDir) => {
    val orders = Tables(spark, sfDir, "orders")
    val li = Tables(spark, sfDir, "lineitem")
    Integrity.fkConformance(Seq(
      ("orders_customer",
        orders.select(when(col("o_orderkey") % 97 === 0, -col("o_custkey"))
          .otherwise(col("o_custkey")).as("k")),
        Tables(spark, sfDir, "customer").select(col("c_custkey").as("k"))),
      ("lineitem_orders",
        li.select(when(col("l_orderkey") % 101 === 0, -col("l_orderkey"))
          .otherwise(col("l_orderkey")).as("k")),
        orders.select(col("o_orderkey").as("k"))),
      ("lineitem_part",
        li.select(col("l_partkey").as("k")),
        Tables(spark, sfDir, "part").select(col("p_partkey").as("k")))))
      .orderBy("relation")
  }

  /** x94 — wide single-pass column profile ([[Curation.profileWide]]):
    * null + exact distinct counts for every events column in one scan
    * (Expand plan); nulls planted on two columns by id modulus so the
    * null path is non-vacuous. */
  private val x94: Q = (spark, sfDir) => {
    val e = Tables(spark, sfDir, "events")
      .withColumn("value",
        when(col("event_id") % 37 === 0, lit(null)).otherwise(col("value")))
      .withColumn("props",
        when(col("event_id") % 53 === 0, lit(null)).otherwise(col("props")))
    Curation.profileWide(e).orderBy("col_name")
  }

  /** x95 — mergeable EXACT-distinct bitmap maintenance: x83's sibling
    * with bitmaps instead of HLL sketches — per-day
    * `bitmap_construct_agg` partial states merged via `bitmap_or_agg`
    * answer "distinct users ever" with NO event rescan AND no
    * approximation, so the oracle is the strong exact equality (vs
    * x83's 2%-bound certification). Bitmaps cost
    * O(id-range/8) bytes per bucket — the right trade for dense integer
    * key spaces; HLL (x83) remains the sparse/string-key path. */
  private val x95: Q = (spark, sfDir) => {
    Tables.registerAll(spark, sfDir)
    spark.sql(
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |  bitmap_bucket_number(user_id) AS bucket,
        |  bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
        | FROM events GROUP BY 1, 2),
        |merged AS (SELECT bucket, bitmap_or_agg(bm) AS bm
        | FROM daily GROUP BY bucket),
        |exact AS (SELECT CAST(SUM(bitmap_count(bm)) AS BIGINT)
        |  AS distinct_users FROM merged),
        |days AS (SELECT COUNT(DISTINCT d) AS n_days FROM daily)
        |SELECT n_days, distinct_users FROM days CROSS JOIN exact""".stripMargin)
  }

  /** x96 — JL projection distortion audit
    * ([[Similarity.jlProjectionDistortion]]): 64→16-dim ±1-sign
    * projection; for the query's exact top-20, original vs projected
    * cosine and the absolute gap as oracle-checked values — the
    * measured version of the "project first, rank later" trade. */
  private val x96: Q = (spark, sfDir) =>
    Similarity.jlProjectionDistortion(emb(spark, sfDir), projDims = 16, k = 20)

  /** x97 — STREAMING sliding windows
    * ([[graft.streaming.EventStream.slidingWindowCountsAppend]]): b52's
    * overlapping 2-day/1-day windows as a watermarked append-mode
    * stream — finalized windows only, each event counted in two live
    * state entries. */
  private val x97: Q = (spark, sfDir) =>
    graft.streaming.EventStream.slidingWindowCountsAppend(spark, sfDir)

  /** x98 — cluster-CAPPED retention ([[Dedup.retainTopM]]): x24's
    * composite with the soft-dedup policy — near-dup clusters keep their
    * top-2 docs by quality instead of collapsing to one (clusters of ≥3
    * exist at every SF, so the cap provably binds). */
  private val x98: Q = (spark, sfDir) => {
    val d = docs(spark, sfDir)
    val clusters = Dedup.dupClusters(lshPairs(spark, sfDir), iterations = 3)
    Dedup.retainTopM(d, "doc_id", TextAnalysis.qualityScore(col("text")),
      clusters, m = 2)
      .orderBy("doc_id")
  }

  /** x99 — per-source z-score standardization
    * ([[Curation.standardizeByGroup]]): n_chars scaled to each source's
    * exact-decimal mean/stddev — feature prep with b24's deterministic
    * moment arithmetic and a broadcast stats join. */
  private val x99: Q = (spark, sfDir) =>
    Curation.standardizeByGroup(docs(spark, sfDir), "doc_id", "n_chars", "source")
      .orderBy("doc_id")

  /** x100 — curated-corpus materialization summary: the pipeline capstone
    * composing x84's sequential rules with x85's leakage-safe split over
    * the SURVIVORS — per split: docs, whitespace tokens, chars. The
    * numbers a training run actually consumes ("how many train tokens
    * after cleaning"), produced by one scan + one dup-rank window + one
    * aggregate. */
  private val x100: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val nw = size(split(col("text"), " "))
    val survivors = docs(spark, sfDir)
      .withColumn("nw", nw.cast("long"))
      .withColumn("dup_rank",
        row_number().over(Window.partitionBy("text").orderBy("doc_id")))
      .filter(col("n_chars") >= 100 &&
        col("lang").isInCollection(Seq("en", "de", "fr", "es")) &&
        col("n_chars") * 10 <= col("nw") * 56 &&
        col("dup_rank") === 1)
    val draw = graft.operators.PortableHash.hash60(col("source")) % 100
    survivors
      .withColumn("split",
        when(draw < 60, "train").when(draw < 80, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("split")
  }

  /** x101 — binary-FILE image ingest: the lake-side multimodal source path.
    * One PNG file per doc is materialized under a scratch dir (layout-build
    * step, like x32's partitioned write), read back with Spark's
    * `binaryFile` source, doc ids recovered from filenames, and every
    * payload run through the REAL `javax.imageio` decode — x12's codec
    * check, but entering through the file-based source a production image
    * corpus actually arrives from. */
  private val x101: Q = (spark, sfDir) => {
    val dir = s"${QueryUtil.scratchDir}/png_lake_" +
      sfDir.replaceAll("[^0-9A-Za-z]", "_")
    Multimodal.writeImageFiles(spark, docs(spark, sfDir), dir)
    Multimodal.ingestImageDir(spark, dir).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("gray_sum"))
      .orderBy("doc_id")
  }

  /** x102 — prefix-corpus novelty ([[Dedup.prefixNovelty]]): per doc, its
    * distinct shingles and how many no EARLIER doc contains — the crawl
    * content-growth signal, linear (no pair join). */
  private val x102: Q = (spark, sfDir) =>
    Dedup.prefixNovelty(docs(spark, sfDir), "doc_id", "text").orderBy("doc_id")

  /** x103 — collocations by integer-scaled association
    * ([[TextAnalysis.bigramAssociation]]): top-20 adjacent pairs by
    * `c(ab)·N₂·10⁶ DIV (c(a)·c(b))` — the PMI ordering without the float
    * log; complements x69's raw-count ranking. */
  private val x103: Q = (spark, sfDir) =>
    TextAnalysis.bigramAssociation(docs(spark, sfDir), "text",
      minCount = 5L, k = 20)

  /** x104 — integer HITS hubs/authorities ([[Graph.hits]], 2 rounds) over
    * the x66 purchase graph (shared memoized edge frame): top-20 nodes by
    * authority. Mutual-reinforcement ranking where PageRank measures link
    * mass; the unnormalized integer form is bit-identical cross-engine. */
  private val x104: Q = (spark, sfDir) =>
    Graph.hits(purchaseEdges(spark, sfDir), iterations = 2,
        assumeDistinct = true,
        precomputedNodes = Some(purchaseNodes(spark, sfDir)))
      .orderBy(desc("a"), desc("h"), col("v")).limit(20)

  /** x105 — water-filling token-budget allocator
    * ([[Curation.waterFillAllocation]]): the mixture-capping step — the
    * integer waterline cap over per-source token supplies at a 60%-of-
    * corpus budget (binds at every SF), allocations reported per source. */
  private val x105: Q = (spark, sfDir) => {
    val toks = docs(spark, sfDir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val budget = toks.agg(sum(col("n_tok"))).head().getLong(0) * 6L / 10L
    Curation.waterFillAllocation(toks, "source", "n_tok", budget)
      .orderBy("source")
  }

  /** x106 — BOUNDED-STATE streaming dedup
    * ([[graft.streaming.EventStream.boundedDedupDaily]]):
    * `dropDuplicatesWithinWatermark` on (user, type, event-day) with a
    * 1-day delay — day-scoped key state is EVICTED as the watermark
    * passes, so state is bounded by keys-per-window, not all-time keys
    * (the production companion to x28's exact dropDuplicates). */
  private val x106: Q = (spark, sfDir) =>
    graft.streaming.EventStream.boundedDedupDaily(spark, sfDir)

  /** x107 — corrupt-record quarantine ingest: a JSONL lake file with
    * deterministically planted malformed lines (doc-id modulus), read in
    * PERMISSIVE mode with `_corrupt_record` — bad lines land in the
    * quarantine bucket instead of killing the job (b53's try_cast story at
    * the SOURCE layer), reported as per-lang parse counts. */
  private val x107: Q = (spark, sfDir) => {
    val dir = s"${QueryUtil.scratchDir}/jsonl_" +
      sfDir.replaceAll("[^0-9A-Za-z]", "_")
    docs(spark, sfDir).select(
      when(pmod(col("doc_id"), lit(13)) === 0,
        concat(lit("{\"doc_id\":"), col("doc_id"), lit(",")))
        .otherwise(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))))
        .as("value"))
      .write.mode("overwrite").text(dir)
    spark.read
      .schema("doc_id LONG, lang STRING, n_chars LONG, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .groupBy(when(col("_corrupt_record").isNotNull, "_corrupt")
        .otherwise(col("lang")).as("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("n_chars"), lit(0L))).as("total_chars"))
      .orderBy("lang")
  }

  /** x108 — targeted sync repair ([[Integrity.repairDiff]]): x79's
    * drifted-bucket narrowing taken to the key level — changed / only-src /
    * only-dst keys, with the key join restricted to drifted buckets so the
    * repair payload scales with the drift. Drift planted on three id
    * moduli (non-vacuous for all three statuses at every SF). */
  private val x108: Q = (spark, sfDir) => {
    val src = Tables(spark, sfDir, "customer")
      .select("c_custkey", "c_acctbal", "c_mktsegment")
    val dst = src.filter(pmod(col("c_custkey"), lit(31)) =!= 0)
      .withColumn("c_acctbal", col("c_acctbal") +
        when(pmod(col("c_custkey"), lit(29)) === 0, 1.0).otherwise(0.0))
      .unionByName(src.filter(pmod(col("c_custkey"), lit(37)) === 0)
        .withColumn("c_custkey", -col("c_custkey")))
    val fp = (df: DataFrame) => concat_ws("|",
      col("c_custkey"),
      col("c_acctbal").cast("decimal(18,2)").cast("string"),
      col("c_mktsegment"))
    Integrity.repairDiff(src, dst, "c_custkey", fp, buckets = 16)
      .orderBy("bucket", "k", "status")
  }

  /** x109 — skew-safe exact distinct count
    * ([[Skew.distinctCountSkewSafe]]): a planted hot key (a third of all
    * events remapped to one user) counted by pair-dedup-then-count — the
    * hot key's rows spread across the (key, value) hash space instead of
    * one countDistinct buffer. */
  private val x109: Q = (spark, sfDir) => {
    val ev = Tables(spark, sfDir, "events")
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(3)) === 0, 0L).otherwise(col("user_id")))
    Skew.distinctCountSkewSafe(ev, "user_id", "event_type").orderBy("user_id")
  }

  /** x110 — incremental JOIN maintenance
    * ([[CdcMerge.incrementalJoinDelta]]): the old orders⋈customer result
    * is materialized once (the previously-built table), then append-only
    * deltas on BOTH sides (id-modulo splits) are folded in as
    * `ΔL⋈(R∪ΔR) ∪ L⋈ΔR` — no re-join of the full sides. The oracle is the
    * full join of the full tables, so equality proves the decomposition. */
  private val x110: Q = (spark, sfDir) => {
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("custkey"), col("o_totalprice"))
    val c = Tables(spark, sfDir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    val oldO = o.filter(pmod(col("o_orderkey"), lit(10)) =!= 0)
    val dO = o.filter(pmod(col("o_orderkey"), lit(10)) === 0)
    val oldC = c.filter(pmod(col("custkey"), lit(17)) =!= 0)
    val dC = c.filter(pmod(col("custkey"), lit(17)) === 0)
    val path = s"${QueryUtil.scratchDir}/oldjoin_" +
      sfDir.replaceAll("[^0-9A-Za-z]", "_")
    oldO.join(oldC, "custkey").write.mode("overwrite").parquet(path)
    val oldJoin = spark.read.parquet(path)
    val updated = oldJoin.unionByName(
      CdcMerge.incrementalJoinDelta(oldO, dO, oldC, dC, Seq("custkey")))
    updated.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), QueryUtil.dsum(col("o_totalprice")).as("total"))
      .orderBy("c_mktsegment")
  }

  /** x111 — Spark 4 `transformWithState`
    * ([[graft.streaming.EventStream.purchaseMilestones]]): per-user
    * purchase counter in named ValueState (RocksDB-backed), emitting one
    * row per 5-purchase milestone crossed — the newest arbitrary-state
    * API beside the mapGroupsWithState/flatMapGroupsWithState pair. */
  private val x111: Q = (spark, sfDir) =>
    graft.streaming.EventStream.purchaseMilestones(spark, sfDir, step = 5)

  /** x112 — schema-drift tolerant lake read: half the corpus written with
    * the ORIGINAL 3-column schema, half with a LATER 4-column schema
    * (the `source` column added mid-stream — the classic producer
    * deployment drift), read back as one table with `mergeSchema` —
    * pre-drift rows surface the new column as NULL instead of failing the
    * read or silently dropping files. */
  private val x112: Q = (spark, sfDir) => {
    val base = s"${QueryUtil.scratchDir}/drift_lake_" +
      sfDir.replaceAll("[^0-9A-Za-z]", "_")
    val d = docs(spark, sfDir)
    d.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select("doc_id", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$base/v1")
    d.filter(pmod(col("doc_id"), lit(2)) =!= 0)
      .select("doc_id", "lang", "n_chars", "source")
      .write.mode("overwrite").parquet(s"$base/v2")
    spark.read.option("mergeSchema", "true").parquet(s"$base/v1", s"$base/v2")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(when(col("source").isNull, 1L).otherwise(0L)).as("n_pre_drift"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")
  }

  /** x113 — dynamic partition overwrite: initial partitioned load, then a
    * restatement batch covering ONLY one partition (1997 prices doubled)
    * written with `partitionOverwriteMode=dynamic` — exactly that
    * partition is replaced, every other year's data survives (static
    * overwrite mode would silently truncate the whole table; the oracle's
    * other-year totals catch that). */
  private val x113: Q = (spark, sfDir) => {
    val base = s"${QueryUtil.scratchDir}/dynpart_" +
      sfDir.replaceAll("[^0-9A-Za-z]", "_")
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      .withColumn("o_year", year(col("o_orderdate")))
    o.write.partitionBy("o_year").mode("overwrite").parquet(base)
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "dynamic")
    try
      o.filter(col("o_year") === 1997)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .write.partitionBy("o_year").mode("overwrite").parquet(base)
    finally spark.conf.set(key, prev)
    spark.read.parquet(base)
      .groupBy("o_year")
      .agg(count(lit(1)).as("n"), QueryUtil.dsum(col("o_totalprice")).as("total"))
      .orderBy("o_year")
  }

  /** x114 — EXACT similarity join via prefix filtering
    * ([[Dedup.prefixFilterJaccard]]): candidates only from each doc's
    * rarest `(1−t)·|d|+1` shingles under the global df order — zero false
    * negatives by the prefix theorem, so the oracle is the FULL exact
    * jaccard pair set (the third pair-join strategy beside x02's LSH and
    * x04's df-capped join, and the only one that is both exact and
    * pruned). */
  private val x114: Q = (spark, sfDir) =>
    Dedup.prefixFilterJaccard(docs(spark, sfDir), "doc_id", "text",
        threshold = 0.7)
      .orderBy("d1", "d2")

  /** x115 — single-scan correlation matrix
    * ([[Analytics.correlationMatrix]]): pairwise Pearson over four
    * lineitem measures from EXACT decimal moment sums in one aggregate —
    * the feature-selection screen, deterministic where the built-in
    * streaming `corr` is merge-order-dependent. */
  private val x115: Q = (spark, sfDir) =>
    Analytics.correlationMatrix(Tables(spark, sfDir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy("col_x", "col_y")

  /** x116 — pairwise total-variation distance between per-source unigram
    * distributions ([[TextAnalysis.distributionDivergence]]): the
    * composition-drift audit before mixing corpora, in EXACT integer
    * arithmetic (ppm; no floats, no logs). */
  private val x116: Q = (spark, sfDir) =>
    TextAnalysis.distributionDivergence(docs(spark, sfDir), "source", "text")
      .orderBy("src_a", "src_b")

  /** x118 — histogram-sketch quantiles with certified rank error
    * ([[Analytics.histogramQuantiles]]): p50/p90/p99 of lineitem price
    * cents from a 1024-bin single-pass sketch; the achieved rank is exact
    * (cumulative bin count) and `rank_err ≤ bound` is the per-query
    * certificate — the scale path beside b13's exact percentiles. */
  private val x118: Q = (spark, sfDir) =>
    Analytics.histogramQuantiles(Tables(spark, sfDir, "lineitem"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        nBins = 1024, probsPct = Seq(50, 90, 99))
      .orderBy("p_pct")

  /** x119 — real audio decode ([[Multimodal.extractAudioFeatures]]): one
    * deterministic 16-bit PCM WAV clip per document, encoded AND decoded by
    * the pure-JDK `javax.sound.sampled` codec inside `mapPartitions`; the
    * oracle recomputes sample count / Σ|amplitude| / peak arithmetically
    * from the pattern formula, so it matches only if the RIFF round-trip
    * was sample-exact (the x12/x101 audit style, audio modality). */
  private val x119: Q = (spark, sfDir) =>
    Multimodal.extractAudioFeatures(spark,
        Multimodal.renderAudioTable(spark, docs(spark, sfDir))).toDF()
      .orderBy("doc_id")

  /** x120 — certified heavy hitters ([[TextAnalysis.heavyHitters]]):
    * per-partition Misra–Gries summaries (≤k rows leave each partition)
    * merged algebraically, then EXACT counts restricted to the certified
    * candidate superset — terms with `cnt·(k+1) > n`, k=30. The output is
    * partitioning-independent (exact counts over an exact threshold), which
    * is what the deterministic oracle checks. */
  private val x120: Q = (spark, sfDir) =>
    TextAnalysis.heavyHitters(docs(spark, sfDir), "text", k = 30)
      .orderBy("term")

  /** x121 — linear-interpolation gap fill ([[Analytics.gapFillInterpolate]]):
    * interior missing days get the integer-exact weighted mean of their
    * surrounding observations in cents — the interpolating complement to
    * x68's forward fill, over the same NULL-key-planted events. */
  private val x121: Q = (spark, sfDir) =>
    Analytics.gapFillInterpolate(
        eventsNullUser(spark, sfDir).withColumn("value_cents",
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")),
        "user_id", "ts", "event_id", "value_cents")
      .orderBy("user_id", "day")

  /** x122 — round-robin source interleave ([[Sampling.roundRobinInterleave]]):
    * the closed-form training-order schedule — per-source rank exchange plus
    * a broadcast S-row source index, position computed map-side, no global
    * single-partition ROW_NUMBER. */
  private val x122: Q = (spark, sfDir) =>
    Sampling.roundRobinInterleave(docs(spark, sfDir), "doc_id", "source")
      .orderBy("pos")

  /** x123 — point-in-time (as-of) snapshot ([[Scd2.snapshotAsOf]]): each
    * user's purchase state as of Jan 15 — ONE pushdown-able interval filter
    * over the x38 history, no window or join at read time. */
  private val x123: Q = (spark, sfDir) =>
    Scd2.snapshotAsOf(
        Scd2.buildHistory(
          Tables(spark, sfDir, "events")
            .filter(col("event_type") === "purchase")
            .select("user_id", "ts", "event_id", "value"),
          keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
          attrCols = Seq("value")),
        "2024-01-15 00:00:00")
      .orderBy("user_id")

  /** x124 — mergeable histogram sketch ([[Analytics.histogramQuantilesSharded]]):
    * per-returnflag partial sketches over the shared corpus-wide bin domain,
    * merged by an associative per-bin SUM, then the x118 certified quantile
    * arithmetic — the x83/x95 partial-state pattern applied to quantiles;
    * the oracle is the direct computation (merge changes nothing). */
  private val x124: Q = (spark, sfDir) =>
    Analytics.histogramQuantilesSharded(Tables(spark, sfDir, "lineitem"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        nBins = 512, probsPct = Seq(25, 75, 95), shardCol = "l_returnflag")
      .orderBy("p_pct")

  /** x125 — deterministic masked-span schedule ([[TextAnalysis.maskSchedule]]):
    * 15% token masking as a pure hash of (doc, position) — reproducible
    * across runs/engines/partitionings; per-doc manifest for a
    * span-corruption training job. */
  private val x125: Q = (spark, sfDir) =>
    TextAnalysis.maskSchedule(docs(spark, sfDir), "doc_id", "text", maskPct = 15)
      .orderBy("doc_id")

  /** x126 — cross-source contamination matrix
    * ([[TextAnalysis.sourceContainment]]): directional shingle containment
    * in exact ppm for every ordered source pair, zero-overlap pairs kept by
    * the S×S spine. */
  private val x126: Q = (spark, sfDir) =>
    TextAnalysis.sourceContainment(docs(spark, sfDir), "source", "text")
      .orderBy("src_a", "src_b")

  /** x127 — Pareto curation frontier ([[Analytics.paretoFrontier2D]]):
    * docs undominated on (quality centi-score, length) via one window over
    * per-score maxima — the oracle is the INDEPENDENT quadratic NOT EXISTS
    * dominance query, so the single-pass algorithm is cross-validated
    * against the definition, not re-derived. FLOOR (not CAST) for the
    * centi-score: DuckDB's double→BIGINT cast rounds while Spark's
    * truncates. */
  private val x127: Q = (spark, sfDir) =>
    Analytics.paretoFrontier2D(
        docs(spark, sfDir).select(col("doc_id"),
          floor(TextAnalysis.qualityScore(col("text")) * 100).cast("long")
            .as("q_centi"),
          length(col("text")).cast("long").as("n_chars")),
        "doc_id", "q_centi", "n_chars")
      .orderBy("doc_id")

  /** x128 — streaming incremental quantile sketch
    * ([[graft.streaming.EventStream.streamingHistogramQuantiles]]): the
    * streaming leg of the x118/x124 histogram family — per-micro-batch bin
    * counts merged into ≤256-row persisted state, final certified quantiles
    * equal the batch computation (the oracle). */
  private val x128: Q = (spark, sfDir) =>
    graft.streaming.EventStream.streamingHistogramQuantiles(spark, sfDir)

  /** x129 — DYNAMIC partition pruning: the fact table is laid out
    * partitioned by day, and the restricting predicate lives on a DIM
    * attribute (`day(event_day) % 7`), not the partition key — static
    * pushdown cannot prune, so Spark inserts a runtime
    * `dynamicpruningexpression` on the fact scan fed by the broadcast dim
    * (plan-asserted): at 100 TB this is the difference between scanning
    * every daily partition and only the dim-selected ones. Complements
    * x32's STATIC partition-key pruning. */
  private val x129: Q = (spark, sfDir) => {
    val path = s"${QueryUtil.scratchDir}/events_by_day"
    Tables(spark, sfDir, "events")
      .withColumn("event_day", to_date(col("ts")))
      .write.partitionBy("event_day").mode("overwrite").parquet(path)
    val fact = spark.read.parquet(path)
    val dim = fact.select(col("event_day")).distinct()
      .withColumn("day_bucket", expr("day(event_day) % 7"))
    fact.join(dim.filter(col("day_bucket") === 3), "event_day")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), QueryUtil.dsum(col("value")).as("total"))
      .orderBy("event_type")
  }

  /** x130 — per-row temporal enrichment ([[Scd2.temporalJoin]]): each click
    * joined to the user's purchase-history version valid at the CLICK's own
    * timestamp — the event-time feature lookup; x123's snapshot is the
    * single-cutoff special case. */
  private val x130: Q = (spark, sfDir) => {
    val hist = Scd2.buildHistory(
      Tables(spark, sfDir, "events")
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id", "value"),
      keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
      attrCols = Seq("value"))
    val clicks = Tables(spark, sfDir, "events")
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    Scd2.temporalJoin(hist, clicks, "user_id", "ts")
      .select(clicks("event_id"), clicks("user_id"),
        date_format(clicks("ts"), "yyyy-MM-dd HH:mm:ss").as("ets"),
        hist("version"), hist("value").as("purchase_value"))
      .orderBy("event_id")
  }

  /** x131 — per-group OLS trend ([[Analytics.trendSlope]]): price-over-time
    * slope and intercept per return flag from exact decimal moments, the
    * x115 single-scan pattern applied to regression. */
  private val x131: Q = (spark, sfDir) =>
    Analytics.trendSlope(Tables(spark, sfDir, "lineitem"), "l_returnflag",
        expr("datediff(l_shipdate, DATE '1992-01-01')"), col("l_extendedprice"))
      .orderBy("l_returnflag")

  /** x132 — file-skipping manifest ([[SkippingIndex]]): events laid out
    * range-partitioned on ts (tight disjoint per-file ranges), a per-file
    * min/max manifest built in one scan, and a 5-day range query answered
    * by reading ONLY the overlapping files (the spec asserts strict
    * pruning). The lakehouse data-skipping pattern on plain parquet. */
  private val x132: Q = (spark, sfDir) => {
    val path = s"${QueryUtil.scratchDir}/events_ranged"
    Tables(spark, sfDir, "events")
      .repartitionByRange(8, col("ts"))
      .write.mode("overwrite").parquet(path)
    val manifest = SkippingIndex.buildManifest(spark, path, "ts")
    SkippingIndex.prunedRangeRead(spark, path, manifest, "ts",
        "2024-01-10 00:00:00", "2024-01-15 00:00:00")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), QueryUtil.dsum(col("value")).as("total"))
      .orderBy("event_type")
  }

  /** x133 — budgeted greedy selection ([[Sampling.budgetedSelection]]):
    * docs kept in quality-density order until the global 10k-token budget —
    * the distributed-prefix-sum cut (two-phase, never a single-partition
    * global window); output depends only on the unique total order. */
  private val x133: Q = (spark, sfDir) => {
    val d = docs(spark, sfDir).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"),
        floor(TextAnalysis.qualityScore(col("text")) * 100).cast("long").as("q_centi"))
      .withColumn("density", expr("q_centi * 1000 DIV n_tok"))
    Sampling.budgetedSelection(d, "doc_id", "n_tok", "density", budget = 10000L)
      .orderBy("doc_id")
  }

  /** x134 — multi-touch attribution ([[Analytics.multiTouchAttribution]]):
    * linear credit over the 7-day pre-purchase window in exact integer
    * basis points (10000 DIV n per touch, remainder to the last touch —
    * credit sums to exactly 10000 per conversion); the fractional-credit
    * complement to x92's last-touch. */
  private val x134: Q = (spark, sfDir) =>
    Analytics.multiTouchAttribution(Tables(spark, sfDir, "events"),
        "user_id", "ts", "event_id", "event_type", convType = "purchase")
      .orderBy("touch_type")

  /** x135 — contrastive negative sampling: k=3 deterministic hash-drawn
    * negatives per anchor (doc_id % 17 == 0), excluding the anchor itself
    * and any VERIFIED near-duplicate (the [[lshPairs]] staging set — a
    * near-dup "negative" teaches an embedding model to push duplicates
    * apart, the classic contrastive-training poisoning). Colliding slots
    * are DROPPED, not re-drawn — closed form, no iteration; the oracle
    * re-derives draws from the md5 formula and excludes via the exact
    * jaccard pair set. */
  private val x135: Q = (spark, sfDir) => {
    val nDocs = broadcast(docs(spark, sfDir).agg(count(lit(1)).as("n_docs")))
    val draws = docs(spark, sfDir).filter(col("doc_id") % 17 === 0)
      .select(col("doc_id").as("anchor"))
      .crossJoin(nDocs)
      .select(col("anchor"),
        explode(array(lit(0L), lit(1L), lit(2L))).as("slot"), col("n_docs"))
      .withColumn("neg_id", graft.operators.PortableHash.hash60(
        concat(col("anchor").cast("string"), lit(":"),
          col("slot").cast("string"))) % col("n_docs"))
      .filter(col("neg_id") =!= col("anchor"))
    val p = lshPairs(spark, sfDir).select("d1", "d2")
    val sym = p.union(p.select(col("d2"), col("d1"))).toDF("a", "b")
    draws.join(sym,
        col("anchor") === col("a") && col("neg_id") === col("b"), "left_anti")
      .select(col("anchor"), col("slot"), col("neg_id"))
      .orderBy("anchor", "slot")
  }

  /** x136 — within-source percentile calibration
    * ([[Curation.percentileCalibration]]): quality centi-scores mapped to
    * source-relative percentiles in integer bps (RANK — value ties share),
    * making cross-source scores comparable before a global cut. */
  private val x136: Q = (spark, sfDir) =>
    Curation.percentileCalibration(
        docs(spark, sfDir).select(col("doc_id"), col("source"),
          floor(TextAnalysis.qualityScore(col("text")) * 100).cast("long")
            .as("q_centi")),
        "doc_id", "source", "q_centi")
      .orderBy("doc_id")

  /** x137 — session-scoped ordered funnel ([[Analytics.sessionFunnel]]):
    * signup→click→purchase required IN ORDER within the same (user, day)
    * session — the session-granular variant of x64's lifetime funnel,
    * same single-exchange shape with the day in the partition key. */
  private val x137: Q = (spark, sfDir) =>
    Analytics.sessionFunnel(eventsNullUser(spark, sfDir),
      "user_id", "ts", "event_type", "signup", "click", "purchase")

  /** x138 — inter-arrival percentiles ([[Analytics.interArrivalPercentiles]]):
    * exact p50/p90/p99 whole-second gaps between consecutive events per
    * type via the rank formula over sorted gaps — the latency-SLO metric
    * without a sketch; deterministic under ties (the value at a sorted
    * rank is unique even when tie row-identities permute). */
  private val x138: Q = (spark, sfDir) =>
    Analytics.interArrivalPercentiles(Tables(spark, sfDir, "events"),
        "event_type", "ts", "event_id", probsPct = Seq(50, 90, 99))
      .orderBy("event_type", "p_pct")

  /** x139 — exact weighted median ([[Analytics.weightedMedian]]): per-source
    * median doc length weighted by token count — ties collapsed before the
    * cumulative window, integer `2·cum ≥ total` test, no float anywhere. */
  private val x139: Q = (spark, sfDir) =>
    Analytics.weightedMedian(
        docs(spark, sfDir).select(col("source"), col("n_chars"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok")),
        "source", "n_chars", "n_tok")
      .orderBy("source")

  /** x140 — per-group mode ([[Analytics.groupMode]]): dominant language per
    * source, deterministic tie-break (count desc, value asc); the aggregate
    * is bounded by distinct (source, lang), never rows. */
  private val x140: Q = (spark, sfDir) =>
    Analytics.groupMode(docs(spark, sfDir), "source", "lang")
      .orderBy("source")

  /** x141 — Markov transition matrix ([[Analytics.transitionMatrix]]):
    * per-user event-type bigram counts + row-conditional probability in
    * exact ppm; one user exchange, |types|²-bounded output. */
  private val x141: Q = (spark, sfDir) =>
    Analytics.transitionMatrix(Tables(spark, sfDir, "events"),
        "user_id", "ts", "event_id", "event_type")
      .orderBy("prev_type", "next_type")

  /** x142 — trigram-index substring search ([[TextAnalysis.trigramSearch]]):
    * posting-intersection candidates, exact verify on candidates only;
    * oracle = the full LIKE scan it accelerates. */
  private val x142: Q = (spark, sfDir) =>
    TextAnalysis.trigramSearch(docs(spark, sfDir), "doc_id", "text",
        "spark merge")
      .orderBy("doc_id")

  /** x143 — Benford first-digit audit ([[Integrity.benfordAudit]]) over
    * lineitem extended prices in exact cents (decimal-staged, the dsum
    * pattern); expected rates are hardcoded constants — no runtime log. */
  private val x143: Q = (spark, sfDir) =>
    Integrity.benfordAudit(Tables(spark, sfDir, "lineitem"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .orderBy("digit")

  /** x144 — temporal holdout split ([[Curation.temporalSplit]]): cutoff at
    * the p80-ranked distinct day, map-side split tag, shared-user overlap
    * audit (the quantity an entity split would force to zero). */
  private val x144: Q = (spark, sfDir) =>
    Curation.temporalSplit(Tables(spark, sfDir, "events"), "user_id", "ts",
        trainPct = 80)
      .orderBy("split")

  /** x145 — winsorized mean ([[Analytics.winsorizedMean]]): per-source mean
    * doc length with rank-exact [p5, p95] clamping, integer centi-units. */
  private val x145: Q = (spark, sfDir) =>
    Analytics.winsorizedMean(
        docs(spark, sfDir).select(col("source"), col("n_chars")),
        "source", "n_chars", loPct = 5, hiPct = 95)
      .orderBy("source")

  /** x146 — daily streaks ([[Analytics.dailyStreaks]]): gaps-and-islands
    * per user (n_streaks, longest, active days) in one user exchange. */
  private val x146: Q = (spark, sfDir) =>
    Analytics.dailyStreaks(Tables(spark, sfDir, "events"), "user_id", "ts")
      .orderBy("user_id")

  /** x147 — A/B experiment readout ([[Analytics.abExperiment]]): portable
    * hash-mod arm assignment, purchase conversion, exact-ppm rates + delta. */
  private val x147: Q = (spark, sfDir) =>
    Analytics.abExperiment(Tables(spark, sfDir, "events"),
      "user_id", "event_type", "purchase")

  /** x148 — consistent-hash migration audit
    * ([[Sampling.consistentHashMigration]]): ring-vs-mod movement when the
    * doc shard set grows 16 → 17, exact ppm, all hashes portable. */
  private val x148: Q = (spark, sfDir) =>
    Sampling.consistentHashMigration(docs(spark, sfDir), "doc_id",
      nOld = 16, nNew = 17, vnodes = 8)

  /** x149 — largest-remainder allocation
    * ([[Sampling.largestRemainderAllocation]]): Hamilton apportionment of a
    * 1000-doc sample budget across sources; Σalloc = 1000 exactly. */
  private val x149: Q = (spark, sfDir) =>
    Sampling.largestRemainderAllocation(docs(spark, sfDir), "source", k = 1000L)
      .orderBy("source")

  /** x150 — contribution-bounded aggregate
    * ([[Curation.boundedContribution]]): per-user cap of 5 events (first 5
    * by ts, id) before the per-type rollup — the DP-prep clamp. */
  private val x150: Q = (spark, sfDir) =>
    Curation.boundedContribution(Tables(spark, sfDir, "events"),
        "user_id", "ts", "event_id", "event_type", maxPerUser = 5)
      .orderBy("event_type")

  /** x151 — rolling 7-day distinct users ([[Analytics.rollingDistinctUsers]]):
    * the windowed COUNT DISTINCT no RANGE frame can express; day-grain
    * pairs × broadcast day spine. */
  private val x151: Q = (spark, sfDir) =>
    Analytics.rollingDistinctUsers(Tables(spark, sfDir, "events"),
        "user_id", "ts", windowDays = 7)
      .orderBy("day")

  /** x152 — skew-aware partition plan ([[Skew.skewAwarePartitionPlan]]):
    * snake placement of doc sources over 4 planned partitions, loads +
    * exact-ppm imbalance. */
  private val x152: Q = (spark, sfDir) =>
    Skew.skewAwarePartitionPlan(docs(spark, sfDir), "source", nParts = 4)
      .orderBy("part")

  /** x153 — federated-median divergence ([[Analytics.federatedMedianAudit]]):
    * exact global lower median vs median-of-8-shard-medians, error in ppm —
    * the federated shortcut's bias measured, not assumed. */
  private val x153: Q = (spark, sfDir) =>
    Analytics.federatedMedianAudit(
      docs(spark, sfDir).select(col("doc_id"), col("n_chars")),
      "doc_id", "n_chars", nShards = 8)

  /** x154 — k-anonymity audit ([[Curation.kAnonymityAudit]]) over the
    * (lang, source, 500-char length band) quasi-identifier at k ∈
    * {2,5,10,20}: classes below k and rows at risk. */
  private val x154: Q = (spark, sfDir) =>
    Curation.kAnonymityAudit(
        docs(spark, sfDir).withColumn("len_band", expr("n_chars DIV 500")),
        Seq("lang", "source", "len_band"), ks = Seq(2, 5, 10, 20))
      .orderBy("k")

  /** x155 — growth accounting ([[Analytics.growthAccounting]]): weekly
    * new/retained/resurrected/churned from the per-user active-week
    * sequence; ISO-Monday weeks on both engines. */
  private val x155: Q = (spark, sfDir) =>
    Analytics.growthAccounting(Tables(spark, sfDir, "events"), "user_id", "ts")
      .orderBy("week")

  /** x156 — systematic PPS sample ([[Sampling.systematicPpsSample]]):
    * ~50 docs proportional to n_chars via stride walks over distributed
    * prefix sums — deterministic, no RNG, no global window. */
  private val x156: Q = (spark, sfDir) =>
    Sampling.systematicPpsSample(
        docs(spark, sfDir).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", n = 50L)
      .orderBy("doc_id")

  /** x157 — column-level drift ([[CdcMerge.columnDrift]]) between the
    * customer snapshot and x48's merged result: per tracked column, the
    * changed-key count and ppm — x59's row verdict decomposed by attribute. */
  private val x157: Q = (spark, sfDir) =>
    CdcMerge.columnDrift(
        Tables(spark, sfDir, "customer")
          .select("c_custkey", "c_acctbal", "c_mktsegment"),
        x48(spark, sfDir),
        "c_custkey", Seq("c_acctbal", "c_mktsegment"))
      .orderBy("col_name")

  /** x158 — golden-record survivorship ([[Dedup.goldenRecord]]) per
    * near-dup cluster (same x18 cluster frame): field-by-field merged
    * record under deterministic rules, singletons survive as themselves. */
  private val x158: Q = (spark, sfDir) =>
    Dedup.goldenRecord(
        docs(spark, sfDir).filter(col("text").isNotNull),
        "doc_id", "text",
        floor(TextAnalysis.qualityScore(col("text")) * 100).cast("long"),
        Dedup.dupClusters(lshPairs(spark, sfDir), iterations = 3))
      .orderBy("cluster")

  /** x159 — conversion life table ([[Analytics.conversionLifeTable]]):
    * signup→purchase discrete survival counts by whole-day lag with
    * administrative censoring at the global max event date. */
  private val x159: Q = (spark, sfDir) =>
    Analytics.conversionLifeTable(Tables(spark, sfDir, "events"),
        "user_id", "ts", "event_type", "signup", "purchase")
      .orderBy("lag_days")

  /** x160 — audit hash chain ([[Integrity.auditHashChain]]): per-day
    * order-sensitive ledger checksum Σ rank·hash mod p — reorder/drop/edit
    * all change it, where x79's order-blind sum can't see reorders. */
  private val x160: Q = (spark, sfDir) =>
    Integrity.auditHashChain(Tables(spark, sfDir, "events"),
        to_date(col("ts")),
        concat_ws("|", col("event_id"), col("user_id"), col("event_type")),
        Seq(col("ts"), col("event_id")))
      .orderBy("part")

  /** x161 — exact weighted quantiles ([[Analytics.weightedQuantiles]]):
    * x139's weighted median generalized to p25/p50/p75 — token-weighted
    * length quartiles per source, all-integer threshold test. */
  private val x161: Q = (spark, sfDir) =>
    Analytics.weightedQuantiles(
        docs(spark, sfDir).select(col("source"), col("n_chars"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok")),
        "source", "n_chars", "n_tok", probsPct = Seq(25, 50, 75))
      .orderBy("source", "p_pct")

  /** x162 — difference-in-differences ([[Analytics.diffInDiff]]): hash
    * arms × rank-cutoff periods, per-cell conversion ppm and the DiD
    * estimate — the drift-robust reading x147 alone can't give. */
  private val x162: Q = (spark, sfDir) =>
    Analytics.diffInDiff(Tables(spark, sfDir, "events"),
      "user_id", "ts", "event_type", "purchase", cutoffPct = 50)

  /** x163 — degree concentration ([[Graph.degreeConcentration]]) of the
    * purchase graph (same memoized edge staging as x66/x104): top-1%
    * node cohort's edge share per side, exact ppm. */
  private val x163: Q = (spark, sfDir) =>
    Graph.degreeConcentration(purchaseEdges(spark, sfDir), topPct = 1)
      .orderBy("side")

  /** x164 — quantile parity audit ([[Curation.quantileParityAudit]]):
    * per-source median quality centi-score vs the global median — the
    * fairness gate before a quality cut erases a slice. */
  private val x164: Q = (spark, sfDir) =>
    Curation.quantileParityAudit(
        docs(spark, sfDir).select(col("doc_id"), col("source"),
          floor(TextAnalysis.qualityScore(col("text")) * 100).cast("long")
            .as("q_centi")),
        "doc_id", "source", "q_centi")
      .orderBy("grp")

  /** x165 — daily bounce rate ([[Analytics.bounceRate]]): share of
    * single-event (user, day) sessions in exact ppm; one session
    * exchange reused by the day rollup. */
  private val x165: Q = (spark, sfDir) =>
    Analytics.bounceRate(Tables(spark, sfDir, "events"), "user_id", "ts")
      .orderBy("day")

  /** x166 — group-median imputation ([[Curation.medianImpute]]) over
    * id-modulo-planted NULL n_chars: fill with the source's rank-exact
    * median, `was_imputed` audit flag on every row. */
  private val x166: Q = (spark, sfDir) =>
    Curation.medianImpute(
        docs(spark, sfDir).withColumn("n_chars",
          when(col("doc_id") % 17 === 0, lit(null).cast("long"))
            .otherwise(col("n_chars")))
          .select("doc_id", "source", "n_chars"),
        "doc_id", "source", "n_chars")
      .orderBy("doc_id")

  /** x167 — kNN label-noise audit ([[Similarity.labelNoiseAudit]]): vecs
    * whose 5 nearest neighbors majority-disagree with their label — the
    * mislabel detector; index-ordered cosine keeps it oracle-exact. */
  private val x167: Q = (spark, sfDir) =>
    Similarity.labelNoiseAudit(emb(spark, sfDir), k = 5)
      .orderBy("vec_id")

  /** x168 — top user journeys ([[Analytics.topJourneys]]): most frequent
    * first-3 event-type paths per (user, day) session, deterministic
    * rank-ordered path assembly, top-10. */
  private val x168: Q = (spark, sfDir) =>
    Analytics.topJourneys(Tables(spark, sfDir, "events"),
      "user_id", "ts", "event_id", "event_type", steps = 3, k = 10)

  /** x169 — traffic anomaly days ([[Analytics.trafficAnomalyDays]]):
    * each day vs its trailing-7-day mean in exact ratio ppm with
    * spike/drop flags; no baseline → NULL, not a guess. */
  private val x169: Q = (spark, sfDir) =>
    Analytics.trafficAnomalyDays(Tables(spark, sfDir, "events"), "ts",
        windowDays = 7, thresholdPct = 50)
      .orderBy("day")

  /** x170 — mixture drift ([[Curation.mixtureDrift]]): per-source token
    * share across id-modulo snapshot generations with WoW-style delta in
    * exact ppm — the composition monitor between corpus snapshots. */
  private val x170: Q = (spark, sfDir) =>
    Curation.mixtureDrift(docs(spark, sfDir), "source",
        pmod(col("doc_id"), lit(8L)),
        TextAnalysis.tokenCount(col("text")).cast("long"))
      .orderBy("snapshot", "source")

  /** x171 — SLA attainment ([[Analytics.slaAttainment]]): share of
    * inter-arrival gaps ≤ 1h per type in exact ppm — x138's quantile
    * question turned into the threshold question ops dashboards pair it
    * with. */
  private val x171: Q = (spark, sfDir) =>
    Analytics.slaAttainment(Tables(spark, sfDir, "events"),
        "event_type", "ts", "event_id", thresholdSeconds = 3600L)
      .orderBy("event_type")

  /** x172 — seasonality profile ([[Analytics.seasonalityProfile]]): the
    * ISO-dow × hour event matrix with exact-ppm shares — the load
    * fingerprint; ≤168 cells from one aggregate. */
  private val x172: Q = (spark, sfDir) =>
    Analytics.seasonalityProfile(Tables(spark, sfDir, "events"), "ts")
      .orderBy("iso_dow", "hod")

  /** x173 — revenue concentration ([[Analytics.revenueConcentration]]):
    * exact-rank deciles of order value in cents with share ppm and the
    * exact Gini in ppm; vocabulary-bounded rank construction. */
  private val x173: Q = (spark, sfDir) =>
    Analytics.revenueConcentration(
        Tables(spark, sfDir, "orders").filter(col("o_totalprice").isNotNull),
        "o_orderkey",
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .orderBy("decile")

  /** x174 — trending terms ([[TextAnalysis.termTrends]]) between snapshot
    * generations 6 → 7 (id-modulo): relative rate ratio in ppm over a
    * support floor, top-15 risers. */
  private val x174: Q = (spark, sfDir) =>
    TextAnalysis.termTrends(docs(spark, sfDir), "text",
      pmod(col("doc_id"), lit(8L)), prevSnap = 6L, curSnap = 7L,
      minPrevCount = 5L, k = 15)

  /** x175 — burst detection ([[Analytics.burstDetection]]): each user's
    * max event count in any trailing 60 s window via a RANGE frame over
    * epoch seconds; top-50 burstiest users (the bot review queue). */
  private val x175: Q = (spark, sfDir) =>
    Analytics.burstDetection(Tables(spark, sfDir, "events"),
      "user_id", "ts", windowSeconds = 60, topK = 50)

  /** x176 — join-cardinality estimate ([[Skew.joinCardinalityEstimate]]):
    * planner arithmetic Σₖ aₖ·bₖ for orders ⋈ lineitem from the two key
    * histograms — output size, matched keys, hottest key — without
    * executing the join. */
  private val x176: Q = (spark, sfDir) =>
    Skew.joinCardinalityEstimate(
      Tables(spark, sfDir, "orders"), "o_orderkey",
      Tables(spark, sfDir, "lineitem"), "l_orderkey")

  /** x177 — transition diversity ([[Analytics.transitionDiversity]]):
    * Simpson concentration λ in exact ppm per antecedent event type —
    * the integer-exact entropy stand-in over x141's bigram stream. */
  private val x177: Q = (spark, sfDir) =>
    Analytics.transitionDiversity(Tables(spark, sfDir, "events"),
        "user_id", "ts", "event_id", "event_type")
      .orderBy("prev_type")

  /** x178 — positional (U-shaped) attribution
    * ([[Analytics.positionalAttribution]]): first/last touches take
    * 4000 bps each, middles split 2000 with a deterministic remainder —
    * conservation Σbps = 10000·conversions is invariant-tested. */
  private val x178: Q = (spark, sfDir) =>
    Analytics.positionalAttribution(Tables(spark, sfDir, "events"),
        "user_id", "ts", "event_id", "event_type", convType = "purchase")
      .orderBy("touch_type")

  /** x179 — score-decile lift ([[Analytics.decileLift]]): users ranked by
    * event volume (two-phase prefix-sum rank), cut into exact equal-depth
    * deciles, per-decile conversion rate and lift vs overall in ppm. */
  private val x179: Q = (spark, sfDir) => {
    val perUser = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("score"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
    Analytics.decileLift(perUser, "user_id", "score", "conv").orderBy("decile")
  }

  /** x180 — audio framing features ([[Multimodal.audioFrameFeatures]]):
    * windowed frames (32/16) over the real-codec-decoded PCM stream,
    * per-frame integer energy + zero crossings folded per clip; the
    * oracle recomputes frame arithmetic from the pattern formula, so
    * green certifies decode AND framing. */
  private val x180: Q = (spark, sfDir) =>
    Multimodal.audioFrameFeatures(spark,
        Multimodal.renderAudioTable(spark, docs(spark, sfDir))).toDF()
      .orderBy("doc_id")

  /** x181 — bounded-round k-core ([[Graph.kCore]]): 3 pruning rounds at
    * k=3 over the memoized purchase graph; reports survivors plus the
    * fixed-point flag (the CC vote-to-halt honesty at fixed depth). */
  private val x181: Q = (spark, sfDir) =>
    Graph.kCore(purchaseEdges(spark, sfDir), k = 3, rounds = 3)

  /** x182 — timed funnel ([[Analytics.timedFunnel]]): signup → click →
    * purchase with each step within 1 day of the previous — the deadline
    * form product funnels ship; same single-exchange shape as x64. */
  private val x182: Q = (spark, sfDir) =>
    Analytics.timedFunnel(eventsNullUser(spark, sfDir),
      "user_id", "ts", "event_type", "signup", "click", "purchase",
      maxGapSeconds = 86400L)

  /** x183 — IVF cell balance ([[Similarity.ivfCellBalance]]): per-cell
    * occupancy / share / imbalance ppm of the x30 index, empty cells
    * reported via the centroid spine — the retrain-the-centroids gauge. */
  private val x183: Q = (spark, sfDir) =>
    Similarity.ivfCellBalance(emb(spark, sfDir), nCells = 16).orderBy("cell")

  /** x184 — IQR outlier audit ([[Curation.iqrOutlierAudit]]): Tukey
    * fences per order priority over totalprice cents — rank-exact
    * quartiles from value-collapsed cumulative counts, integral 1.5×IQR
    * fences, per-group quarantine counts. */
  private val x184: Q = (spark, sfDir) =>
    Curation.iqrOutlierAudit(Tables(spark, sfDir, "orders"),
        "o_orderpriority",
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .orderBy("grp")

  /** x185 — market-basket pairs ([[Curation.basketPairs]]): top-20 brand
    * pairs co-occurring in an order (checkout grain, vs x73's user-pooled
    * lift); basket width capped, support-filtered, TakeOrdered. */
  private val x185: Q = (spark, sfDir) => {
    val withBrand = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
    Curation.basketPairs(withBrand, "l_orderkey", "p_brand",
      minSupport = 2L, topK = 20)
  }

  /** x186 — level-shift scan ([[Analytics.levelShiftScan]]): the split
    * day maximizing |mean-before − mean-after| of daily event counts in
    * exact ppm — deterministic AMOC change-point via prefix sums over
    * the |days| spine. */
  private val x186: Q = (spark, sfDir) =>
    Analytics.levelShiftScan(Tables(spark, sfDir, "events"), "ts")

  /** x187 — nearest-event match ([[Analytics.nearestEventMatch]]): each
    * error matched to the nearest same-user purchase in EITHER direction
    * within 1 h (ties → earlier), join-free via IGNORE-NULLS window
    * navigation on one user exchange; unmatched errors kept visible. */
  private val x187: Q = (spark, sfDir) =>
    Analytics.nearestEventMatch(Tables(spark, sfDir, "events"),
        "user_id", "ts", "event_id", "event_type",
        probeType = "error", matchType = "purchase", maxGapSeconds = 3600L)
      .orderBy("event_id")

  /** x188 — triangle count ([[Graph.triangleCount]]): global closure
    * census of the part co-purchase graph (parts co-shipped in an order,
    * 1996–97 analysis window) — degree-ordered orientation bounds the
    * wedge join by O(√m) out-degree; the oracle counts the same triangles
    * via the independent ordered triple-join formulation, so green
    * cross-checks the orientation method itself. The date window is the
    * closure census's natural scoping (co-purchase structure drifts, so
    * production runs it per window) and it rides the pushed-down shipdate
    * scan filter; the FULL graph's wedge volume grows with avg-degree²,
    * which is a budget decision, not a correctness one. */
  private val x188: Q = (spark, sfDir) =>
    Graph.triangleCount(copurchaseEdges(spark, sfDir))

  /** x189 — blocked fuzzy name match ([[Dedup.blockedNameMatch]]): part-
    * name variants within 2 Damerau-Levenshtein edits, vocabulary-collapsed
    * then blocked on the head noun; the DL metric is the native codegen'd
    * expression, oracle-checked against DuckDB's damerau_levenshtein. */
  private val x189: Q = (spark, sfDir) =>
    Dedup.blockedNameMatch(Tables(spark, sfDir, "part"), "p_name", maxDist = 2)
      .orderBy("name_1", "name_2")

  /** x190 — daily autocorrelation ([[Analytics.autocorrelation]]): exact
    * Pearson at lags 1..7 over the zero-filled daily event counts — the
    * weekly-periodicity detector; moments are exact decimal sums, each
    * coefficient one fixed double expression (x115's discipline). */
  private val x190: Q = (spark, sfDir) =>
    Analytics.autocorrelation(Tables(spark, sfDir, "events"), "ts", maxLag = 7)

  /** x191 — BPE merge candidates ([[TextAnalysis.bpeMergeCandidates]]):
    * corpus-wide adjacent character-pair frequencies (the next BPE merge's
    * argmax and runners-up) — row-local pair generation, |alphabet|²-bounded
    * aggregate, TakeOrdered top-20. */
  private val x191: Q = (spark, sfDir) =>
    TextAnalysis.bpeMergeCandidates(docs(spark, sfDir), "text", topK = 20)

  /** x192 — business-day lag ([[Analytics.businessDayLag]]): order→ship
    * fulfillment lag in WORKING days per order priority — the
    * date-dimension pattern: cumulative business-day index on a broadcast
    * calendar spine, two index lookups per fact row, exact ppm mean. */
  private val x192: Q = (spark, sfDir) => {
    val f = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
    Analytics.businessDayLag(f, "o_orderdate", "l_shipdate", "o_orderpriority")
      .orderBy("o_orderpriority")
  }

  /** x193 — rank agreement ([[Analytics.rankAgreement]]): did the brand
    * revenue ranking change between the first and second half of the
    * corpus timeline? Kendall concordant/discordant counts + top-10
    * overlap over the bounded brand vocabulary (stated precondition);
    * revenue is the exact decimal sum cast once to double, so both
    * engines rank identical values. */
  private val x193: Q = (spark, sfDir) => {
    def rev(pred: Column) = Tables(spark, sfDir, "lineitem").filter(pred)
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(QueryUtil.dsum(col("l_extendedprice")).as("rev"))
    val mid = lit("1998-07-01").cast("timestamp")
    Analytics.rankAgreement(rev(col("l_shipdate") < mid),
      rev(col("l_shipdate") >= mid), "p_brand", "rev", topK = 10)
  }

  /** x194 — k-hop frontier ([[Graph.khopFrontier]]): BFS blast radius
    * from the highest-degree node of the purchase graph (tie → min id),
    * 3 hops over the undirected closure — per-hop sizes only, nodes never
    * reach the driver; reuses the checkpointed edge staging. */
  private val x194: Q = (spark, sfDir) => {
    val e = purchaseEdges(spark, sfDir)
    val und = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val seed = und.groupBy(col("src").as("v")).agg(count(lit(1)).as("__d"))
      .orderBy(col("__d").desc, col("v")).limit(1).select("v")
    Graph.khopFrontier(e, seed, hops = 3).orderBy("hop")
  }

  /** x195 — deletion-impact manifest ([[Integrity.forgetImpact]]): the
    * right-to-be-forgotten preflight — per-table affected-row counts for
    * a deterministic forget set (custkey % 101 = 7), reaching lineitem
    * through its order and events through the shared user-id domain;
    * broadcast semi-joins, one key-column scan per table. */
  private val x195: Q = (spark, sfDir) => {
    val forget = Tables(spark, sfDir, "customer")
      .filter(col("c_custkey") % 101 === 7)
    val liKeyed = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
    Integrity.forgetImpact(forget, "c_custkey", Seq(
      ("customer", Tables(spark, sfDir, "customer"), "c_custkey"),
      ("orders", Tables(spark, sfDir, "orders"), "o_custkey"),
      ("lineitem", liKeyed, "o_custkey"),
      ("events", Tables(spark, sfDir, "events"), "user_id")))
      .orderBy("entity")
  }

  /** x196 — per-doc keywords ([[TextAnalysis.docKeywords]]): each doc's
    * most distinctive term by exact-integer `tf·1e6 DIV df` — the per-doc
    * complement of x35's corpus-grain tf-idf; doc-partitioned rank, ties
    * on the term string. */
  private val x196: Q = (spark, sfDir) =>
    TextAnalysis.docKeywords(docs(spark, sfDir), "doc_id", "text")
      .orderBy("doc_id")

  /** x197 — dedup rate by source ([[Dedup.dedupRateBySource]]): the
    * corpus-health dashboard — per source, exact-dup and near-dup doc
    * counts + ppm rates, consuming the SHARED LSH pair staging (x18's
    * memo) instead of re-running candidate generation. */
  private val x197: Q = (spark, sfDir) =>
    Dedup.dedupRateBySource(docs(spark, sfDir), lshPairs(spark, sfDir),
      "doc_id", "text", "source")
      .orderBy("source")

  /** x198 — geometric smoothing ([[Analytics.geometricSmoothing]]): the
    * EWMA shape without the float recurrence — 14-day power-of-two
    * weighted daily mean in exact ppm over the zero-filled series. */
  private val x198: Q = (spark, sfDir) =>
    Analytics.geometricSmoothing(Tables(spark, sfDir, "events"), "ts",
      windowDays = 14)

  /** x199 — peak concurrency ([[Analytics.peakConcurrency]]): sweep-line
    * max of simultaneously active 5-minute event intervals per day — the
    * running count rides the two-phase range-partitioned prefix sum,
    * never a single-task ORDER BY window. */
  private val x199: Q = (spark, sfDir) =>
    Analytics.peakConcurrency(Tables(spark, sfDir, "events"), "ts",
      "event_id", durationSeconds = 300L)

  /** x200 — reciprocal-rank fusion ([[Similarity.rrfFusion]]): the hybrid-
    * search ensemble — brute-force top-20 and sign-bucket ANN top-10 for
    * the same query fused by exact-integer `1e9 DIV (60 + rank)`; no score
    * calibration, only ranks. */
  private val x200: Q = (spark, sfDir) =>
    Similarity.rrfFusion(Seq(
      Similarity.bruteForceTopK(emb(spark, sfDir), queryVec(spark, sfDir), 20),
      Similarity.annTopK(emb(spark, sfDir), queryVec(spark, sfDir), 10)),
      "vec_id", "sim")

  /** x201 — "also bought" table ([[Curation.alsoBought]]): top-3 co-basket
    * brands for each of the 5 highest-volume brands — the item-item CF
    * primitive; anchors semi-filter the pair join BEFORE fan-out. */
  private val x201: Q = (spark, sfDir) => {
    val withBrand = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
    Curation.alsoBought(withBrand, "l_orderkey", "p_brand",
      nAnchors = 5, nRecs = 3)
      .orderBy("anchor", "rank")
  }

  /** x202 — completeness grid ([[Integrity.completenessGrid]]): which
    * (hour × event_type) cells are silent? The ingestion-gap audit —
    * expected grid = hourly spine × observed types, missing = one anti
    * join, exact ppm coverage per type. */
  private val x202: Q = (spark, sfDir) =>
    Integrity.completenessGrid(Tables(spark, sfDir, "events"), "ts", "event_type")
      .orderBy("dim")

  /** x203 — log2 HDR histogram ([[Analytics.log2Histogram]]): event values
    * in cents bucketed by bit length (exact floor(log2), never a float
    * log) — the exponential-bucket telemetry shape, ≤ 63 rows. */
  private val x203: Q = (spark, sfDir) =>
    Analytics.log2Histogram(Tables(spark, sfDir, "events"),
      round(col("value") * 100))

  /** x204 — CUSUM drift scan ([[Analytics.cusumDrift]]): sequential
    * accumulation of small same-direction deviations of the daily count —
    * the slow-drift detector x186's single split and x169's per-day
    * outliers both miss; recurrence-free prefix-sum/prefix-min form,
    * every day reported with its running statistic + alert flag. */
  private val x204: Q = (spark, sfDir) =>
    Analytics.cusumDrift(Tables(spark, sfDir, "events"), "ts")

  /** x205 — revenue waterfall ([[Analytics.revenueWaterfall]]): per-brand
    * Δrevenue between the two timeline halves split into volume vs
    * price/mix effects, reconciling exactly; sign-split integral division
    * keeps truncation engine-identical. */
  private val x205: Q = (spark, sfDir) =>
    Analytics.revenueWaterfall(
      Tables(spark, sfDir, "lineitem")
        .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey")),
      "p_brand", col("l_quantity"),
      col("l_extendedprice").cast("decimal(18,2)") * 100,
      col("l_shipdate") >= lit("1998-07-01").cast("timestamp"))
      .orderBy("p_brand")

  /** x206 — out-of-order arrival audit ([[Analytics.latenessAudit]]):
    * log2 lateness-vs-high-water-mark buckets under a DETERMINISTIC
    * planted ingest delay (`event_id % 7` × 90 s — the clean testdata
    * arrives perfectly ordered, which would leave the audit vacuously
    * on-time; the plant is mirrored in the oracle, x93's pattern);
    * running max via the two-phase range-partitioned prefix MAX. */
  private val x206: Q = (spark, sfDir) =>
    Analytics.latenessAudit(
      Tables(spark, sfDir, "events")
        .withColumn("arrival_ts", expr("ts + (event_id % 7) * INTERVAL '90' SECOND")),
      "ts", "arrival_ts", "event_id")

  /** x207 — time-decay attribution ([[Analytics.timeDecayAttribution]]):
    * the fourth credit model beside x92/x134/x178 — power-of-two one-day
    * half-life weights, exact 10000-bps conservation per conversion,
    * division deficit to the most recent touch. */
  private val x207: Q = (spark, sfDir) =>
    Analytics.timeDecayAttribution(Tables(spark, sfDir, "events"),
      "user_id", "ts", "event_id", "event_type", "purchase", windowDays = 7)
      .orderBy("touch_type")

  /** x208 — cross-correlation ([[Analytics.crossCorrelation]]): do clicks
    * LEAD purchases? ccf at lags −7..+7 over the shared zero-filled daily
    * calendar — x190's exact-moment discipline for two series. */
  private val x208: Q = (spark, sfDir) =>
    Analytics.crossCorrelation(Tables(spark, sfDir, "events"), "ts",
      "event_type", "click", "purchase", maxLag = 7)

  /** x209 — small-cell suppression ([[Curation.cellSuppression]]): the
    * publishable (nation × segment) customer counts with sub-10 cells
    * merged into "(suppressed)" — totals preserved exactly per segment;
    * the disclosure-control STEP after x154's k-anonymity audit. */
  private val x209: Q = (spark, sfDir) =>
    Curation.cellSuppression(
      Tables(spark, sfDir, "customer")
        .join(Tables(spark, sfDir, "nation"),
          col("c_nationkey") === col("n_nationkey")),
      "n_name", "c_mktsegment", minCellSize = 10L)
      .orderBy("n_name", "c_mktsegment")

  /** x210 — revenue bridge ([[Analytics.revenueBridge]]): month-over-month
    * revenue change split into new / expansion / contraction / churn in
    * exact cents, reconciling to the net change — the revenue counterpart
    * of x155's user-grain growth accounting. */
  private val x210: Q = (spark, sfDir) =>
    Analytics.revenueBridge(Tables(spark, sfDir, "orders"), "o_custkey",
      "o_orderdate", col("o_totalprice").cast("decimal(18,2)") * 100)

  /** x211 — open-order backlog curve ([[Analytics.backlogCurve]]): orders
    * placed but not yet fully shipped, per day — ±1 deltas collapsed to
    * per-day nets, cumulative sum over the calendar spine only. */
  private val x211: Q = (spark, sfDir) =>
    Analytics.backlogCurve(
      Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey")),
      "o_orderkey", "o_orderdate", "l_shipdate")

  /** x212 — rate-limit audit ([[Analytics.rateLimitAudit]]): per hour,
    * users exceeding 2 events/hour with excess volume — the quota census
    * over ingest logs; one (user, hour) exchange. */
  private val x212: Q = (spark, sfDir) =>
    Analytics.rateLimitAudit(Tables(spark, sfDir, "events"), "user_id", "ts",
      hourlyLimit = 2L)

  /** x213 — backfill planner ([[Analytics.backfillPlan]]): days delivering
    * under half their trailing-week lower median (zero-filled — a fully
    * silent day is the prime candidate), exact array-sorted median. */
  private val x213: Q = (spark, sfDir) =>
    Analytics.backfillPlan(Tables(spark, sfDir, "events"), "ts")

  /** x214 — filter-overlap audit ([[Curation.filterOverlap]]): per kill
    * predicate, total and UNIQUE kills — the leave-one-out redundancy
    * check x84's sequential funnel hides; the dup flag rides its own
    * text exchange as an input column, every other flag is row-local. */
  private val x214: Q = (spark, sfDir) => {
    val byText = org.apache.spark.sql.expressions.Window.partitionBy("text")
    val d = docs(spark, sfDir).withColumn("__rep", min(col("doc_id")).over(byText))
    Curation.filterOverlap(d, Seq(
      "exact_dup" -> (col("doc_id") =!= col("__rep")),
      "non_english" -> (col("lang") =!= "en"),
      "oversize" -> (col("n_chars") > 400),
      "too_short" -> (col("n_chars") < 100)))
      .orderBy("filter")
  }

  /** x215 — feature-hash collision audit ([[TextAnalysis.featureHashAudit]]):
    * what the hashing trick destroys at 2^18 buckets — collided-term count
    * and worst bucket load over the distinct vocabulary, with the
    * engine-portable md5-60 hash so the audit reproduces anywhere. */
  private val x215: Q = (spark, sfDir) =>
    TextAnalysis.featureHashAudit(docs(spark, sfDir), "text", 1 << 18)

  /** x216 — stopword induction ([[TextAnalysis.stopwordInduction]]): the
    * top-50 document-frequency terms with doc/token shares and CUMULATIVE
    * token coverage — where to cut the induced stopword list. */
  private val x216: Q = (spark, sfDir) =>
    TextAnalysis.stopwordInduction(docs(spark, sfDir), "doc_id", "text", 50)

  /** x217 — ANN recall@10 eval ([[Similarity.recallEval]]): each
    * approximate index (sign-bucket, banded LSH, IVF) scored against the
    * brute-force ground truth — the table read before trading exactness
    * for speed; intersections are k-row semi joins. */
  private val x217: Q = (spark, sfDir) =>
    Similarity.recallEval(Seq(
      "banded_lsh" -> Similarity.annBandedTopK(emb(spark, sfDir), queryVec(spark, sfDir), 10),
      "ivf" -> Similarity.ivfTopK(emb(spark, sfDir), queryVec(spark, sfDir), 10),
      "sign_bucket" -> Similarity.annTopK(emb(spark, sfDir), queryVec(spark, sfDir), 10)),
      Similarity.bruteForceTopK(emb(spark, sfDir), queryVec(spark, sfDir), 10),
      "vec_id", 10)
      .orderBy("method")

  /** x218 — coordinated sample ([[Sampling.coordinatedSample]]): orders +
    * lineitem downsampled by the SAME key hash so the join survives —
    * audit row proves zero orphaned children; row-local keeps, one
    * key-collapsed anti join. */
  private val x218: Q = (spark, sfDir) =>
    Sampling.coordinatedSample(Tables(spark, sfDir, "orders"), "o_orderkey",
      Tables(spark, sfDir, "lineitem"), "l_orderkey", pct = 5)

  /** x219 — frequent triples ([[Curation.frequentTriples]]): size-3
    * basket itemsets via the Apriori downward-closure cut — candidates
    * only from frequent pairs; the oracle counts ALL triples directly,
    * so green certifies the pruning lost nothing. */
  private val x219: Q = (spark, sfDir) => {
    val withBrand = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
    Curation.frequentTriples(withBrand, "l_orderkey", "p_brand",
      minSupport = 2L, topK = 20)
  }

  /** x220 — domain overlap ([[Integrity.domainOverlap]]): do events.user_id
    * and customer.c_custkey actually join? Distinct-value census with
    * exclusive counts and Jaccard ppm — the join preflight. */
  private val x220: Q = (spark, sfDir) =>
    Integrity.domainOverlap(Tables(spark, sfDir, "events"), "user_id",
      Tables(spark, sfDir, "customer"), "c_custkey")

  /** x221 — top-k churn ([[Analytics.topkChurn]]): who entered/exited/
    * stayed in the brand revenue top-10 between the timeline halves —
    * the leaderboard diff behind x193's aggregate correlation. */
  private val x221: Q = (spark, sfDir) => {
    def rev(pred: Column) = Tables(spark, sfDir, "lineitem").filter(pred)
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(QueryUtil.dsum(col("l_extendedprice")).as("rev"))
    val mid = lit("1998-07-01").cast("timestamp")
    Analytics.topkChurn(rev(col("l_shipdate") < mid),
      rev(col("l_shipdate") >= mid), "p_brand", "rev", k = 10)
  }

  /** x222 — weekly continuity ([[Analytics.weeklyContinuity]]): share of
    * each week's actives already active the week before — the WoW
    * engagement pulse; first week reports NULL, never a fake zero. */
  private val x222: Q = (spark, sfDir) =>
    Analytics.weeklyContinuity(Tables(spark, sfDir, "events"), "user_id", "ts")

  /** x223 — seasonal-naive backtest ([[Analytics.seasonalNaiveBacktest]]):
    * predict each day with last-week-same-day and score it — the honesty
    * baseline any forecast must beat; zero-filled spine, exact ppm. */
  private val x223: Q = (spark, sfDir) =>
    Analytics.seasonalNaiveBacktest(Tables(spark, sfDir, "events"), "ts", 7)

  /** x224 — IVF label purity ([[Similarity.ivfLabelPurity]]): per cell,
    * the majority label's share — does the coarse quantizer respect the
    * labels? Same assignment x30 serves; majority via max-struct, no
    * window. */
  private val x224: Q = (spark, sfDir) =>
    Similarity.ivfLabelPurity(emb(spark, sfDir), "label", nCells = 16)

  /** x225 — dup-cluster size census ([[Dedup.clusterSizeCensus]]): how
    * many near-dup families exist at each size — the sixth consumer of
    * the shared LSH pair staging; template sources show up as one huge
    * family. */
  private val x225: Q = (spark, sfDir) =>
    Dedup.clusterSizeCensus(lshPairs(spark, sfDir), iterations = 3)

  /** x226 — share-of-parent rollup ([[Analytics.shareOfParent]]): each
    * nation's share of its region's revenue AND the region's share of
    * the total, exact ppm, one row per nation — two-level BI without
    * windows. */
  private val x226: Q = (spark, sfDir) => {
    val f = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(Tables(spark, sfDir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(Tables(spark, sfDir, "region"), col("n_regionkey") === col("r_regionkey"))
    Analytics.shareOfParent(f, "r_name", "n_name",
      col("l_extendedprice").cast("decimal(18,2)") * 100)
      .orderBy("r_name", "n_name")
  }

  /** x227 — fill-rate bands ([[Analytics.fillRateBands]]): per order, the
    * share of lines shipped within 30 days of placement, rolled into five
    * bands with exactly-100% its own bucket. */
  private val x227: Q = (spark, sfDir) =>
    Analytics.fillRateBands(
      Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey")),
      "o_orderkey", "o_orderdate", "l_shipdate", slaDays = 30)

  /** x228 — near-dup explanations ([[Dedup.nearDupExplanations]]): for the
    * top-10 LSH pairs, the 3 RAREST shared 3-gram strings — the review
    * artifact behind each dedup decision; shingles generated only for the
    * mentioned docs, df from one corpus aggregate. */
  private val x228: Q = (spark, sfDir) =>
    Dedup.nearDupExplanations(docs(spark, sfDir), lshPairs(spark, sfDir),
      "doc_id", "text", nPairs = 10, nShingles = 3)
      .orderBy("d1", "d2", "rk")

  /** x229 — VWAP deviation ([[Analytics.vwapDeviation]]): daily
    * volume-weighted average price vs the global, days beyond 5% flagged
    * — separates price moves from volume moves, exact integer cents. */
  private val x229: Q = (spark, sfDir) =>
    Analytics.vwapDeviation(Tables(spark, sfDir, "lineitem"), "l_shipdate",
      col("l_quantity"), col("l_extendedprice").cast("decimal(18,2)") * 100)

  /** x230 — dedup threshold sweep ([[Dedup.thresholdSweep]]): pair and
    * doc counts at τ ∈ {50..90}% from ONE pair materialization — the
    * curve that chooses the dedup threshold. */
  private val x230: Q = (spark, sfDir) =>
    Dedup.thresholdSweep(docs(spark, sfDir), "doc_id", "text")

  /** x231 — IVF cluster topics ([[Similarity.ivfClusterTopics]]): each
    * embedding cell named by its member docs' most distinctive terms —
    * the multimodal bridge (vec_id ↔ doc_id corpus contract); rarity
    * weighting at cluster grain. */
  private val x231: Q = (spark, sfDir) =>
    Similarity.ivfClusterTopics(emb(spark, sfDir), docs(spark, sfDir),
      "doc_id", "text", nCells = 16, topTerms = 3)

  /** x232 — freshness report ([[Integrity.freshnessReport]]): per event
    * type, lag behind the table's own high-water mark in whole seconds,
    * stale types flagged — the "is feed X behind?" dashboard. */
  private val x232: Q = (spark, sfDir) =>
    Integrity.freshnessReport(Tables(spark, sfDir, "events"), "ts",
      "event_type", maxLagSeconds = 3600L)

  /** x233 — reconciliation audit ([[Integrity.reconciliationAudit]]):
    * does o_totalprice equal its lines' sum? Per-order relative gap in
    * exact ppm rolled into bands — the denormalization invariant check. */
  private val x233: Q = (spark, sfDir) =>
    Integrity.reconciliationAudit(
      Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey")),
      "o_orderkey",
      col("o_totalprice").cast("decimal(18,2)") * 100,
      col("l_extendedprice").cast("decimal(18,2)") * 100)

  /** x234 — weekday-adjusted outliers ([[Analytics.weekdayAdjustedOutliers]]):
    * each day vs ITS weekday's rank-exact median — seasonality-aware
    * anomaly flags global z-scores misread; value-collapsed medians. */
  private val x234: Q = (spark, sfDir) =>
    Analytics.weekdayAdjustedOutliers(Tables(spark, sfDir, "events"), "ts")

  /** x235 — vocabulary exclusivity ([[TextAnalysis.vocabExclusivity]]):
    * per source, terms appearing nowhere else — the diversity gauge
    * near-dup rates can't see. */
  private val x235: Q = (spark, sfDir) =>
    TextAnalysis.vocabExclusivity(docs(spark, sfDir), "source", "text")

  /** x236 — touch-depth histogram ([[Analytics.touchDepthHistogram]]):
    * how many touches precede each purchase (depth 0 = unattributed) —
    * the distribution behind every attribution denominator. */
  private val x236: Q = (spark, sfDir) =>
    Analytics.touchDepthHistogram(Tables(spark, sfDir, "events"),
      "user_id", "ts", "event_id", "event_type", "purchase", windowDays = 7)

  /** x237 — cross-source dup census ([[Dedup.crossSourceDups]]): verified
    * near-dup pairs bucketed by source pair — syndication off-diagonal,
    * boilerplate on it; the EIGHTH consumer of the LSH pair staging. */
  private val x237: Q = (spark, sfDir) =>
    Dedup.crossSourceDups(docs(spark, sfDir), lshPairs(spark, sfDir),
      "doc_id", "source")

  /** x238 — reorder ETA ([[Analytics.reorderEta]]): next-order due date
    * per repeat customer = last order + their own median inter-order gap
    * — the replenishment baseline; per-key-bounded sorted gap lists. */
  private val x238: Q = (spark, sfDir) =>
    Analytics.reorderEta(Tables(spark, sfDir, "orders"), "o_custkey",
      "o_orderdate", minOrders = 3)
      .orderBy("o_custkey")

  /** x239 — HHI trend ([[Analytics.hhiTrend]]): Herfindahl concentration
    * of brand revenue per quarter in exact ppm units — "how concentrated
    * is the WHOLE distribution", beyond x173's top-share head. */
  private val x239: Q = (spark, sfDir) =>
    Analytics.hhiTrend(
      Tables(spark, sfDir, "lineitem")
        .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey")),
      "l_shipdate", "p_brand",
      col("l_extendedprice").cast("decimal(18,2)") * 100)

  /** x240 — effective vocabulary ([[TextAnalysis.effectiveVocabulary]]):
    * inverse-Simpson diversity of each source's term distribution in
    * exact integers — template spam reads as a tiny effective vocabulary
    * no matter how many distinct terms it technically has. */
  private val x240: Q = (spark, sfDir) =>
    TextAnalysis.effectiveVocabulary(docs(spark, sfDir), "source", "text")

  /** x241 — dedup token savings ([[Dedup.dedupTokenSavings]]): tokens the
    * near-dup pass actually frees per source (budgets are
    * token-denominated) — the NINTH consumer of the LSH pair staging. */
  private val x241: Q = (spark, sfDir) =>
    Dedup.dedupTokenSavings(docs(spark, sfDir), lshPairs(spark, sfDir),
      "doc_id", "text", "source")

  /** x242 — functional-dependency audit ([[Integrity.functionalDependencyAudit]]):
    * does p_name determine p_brand? does p_brand determine p_type? —
    * violation census per candidate FD, the normalize-or-not check. */
  private val x242: Q = (spark, sfDir) =>
    Integrity.functionalDependencyAudit(Tables(spark, sfDir, "part"),
      Seq(("p_name", "p_brand"), ("p_brand", "p_type"), ("p_type", "p_size")))
      .orderBy("determinant", "dependent")

  /** x243 — chi-square independence audit ([[Analytics.chiSquareAudit]]):
    * market segment × order priority contingency cells with exact-integer
    * expected counts and χ² contributions — which cells drive the
    * association. */
  private val x243: Q = (spark, sfDir) =>
    Analytics.chiSquareAudit(
      Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "customer"),
          col("o_custkey") === col("c_custkey")),
      "c_mktsegment", "o_orderpriority")

  /** x244 — session gap-threshold sweep ([[Analytics.sessionGapSweep]]):
    * session counts at τ ∈ {5, 15, 30, 60} min from ONE pass over the
    * per-user gap sequence — the τ-choosing curve for sessionization. */
  private val x244: Q = (spark, sfDir) =>
    Analytics.sessionGapSweep(Tables(spark, sfDir, "events"),
      "user_id", "ts", Seq(300L, 900L, 1800L, 3600L))

  /** x245 — term frequency-spectrum audit ([[TextAnalysis.frequencySpectrum]]):
    * distinct terms per log2 frequency band per source — the Zipf
    * signature x240's single diversity number integrates away. */
  private val x245: Q = (spark, sfDir) =>
    TextAnalysis.frequencySpectrum(docs(spark, sfDir), "source", "text")

  /** x246 — embedding norm audit ([[Similarity.embeddingNormAudit]]):
    * per label, zero-vector count and squared-norm range/mean — the
    * pre-flight gate before any cosine pipeline. */
  private val x246: Q = (spark, sfDir) =>
    Similarity.embeddingNormAudit(emb(spark, sfDir), "label")

  /** x247 — dimension drift audit ([[Similarity.dimensionDriftAudit]]):
    * per dimension, global mean component and worst per-label deviation
    * in micro units — label-leaking and dead dimensions. */
  private val x247: Q = (spark, sfDir) =>
    Similarity.dimensionDriftAudit(emb(spark, sfDir), "label")

  /** x248 — token-set dup census ([[Dedup.tokenSetDupCensus]]): docs equal
    * as bags of words but not as strings — the cheap middle rung of the
    * dedup ladder between x01 exact and x02 LSH. */
  private val x248: Q = (spark, sfDir) =>
    Dedup.tokenSetDupCensus(docs(spark, sfDir), "doc_id", "text", "source")

  /** x249 — product-quantization recall audit ([[Similarity.pqRecallAudit]]):
    * 4-byte PQ codes + asymmetric-distance top-k vs the exact brute-force
    * truth — the 64× compression/recall trade in one row. */
  private val x249: Q = (spark, sfDir) =>
    Similarity.pqRecallAudit(emb(spark, sfDir), queryVec(spark, sfDir), 10)

  /** x250 — first-touch acquisition mix ([[Analytics.firstTouchMix]]): new
    * users per month by their first-ever event type, share in ppm — the
    * acquisition-channel trend from one keyed aggregate. */
  private val x250: Q = (spark, sfDir) =>
    Analytics.firstTouchMix(Tables(spark, sfDir, "events"),
      "user_id", "ts", "event_id", "event_type")

  /** x251 — order-count survival curve ([[Analytics.orderCountSurvival]]):
    * customers with exactly / at least k orders — the engagement-depth
    * distribution over the value-collapsed count frame. */
  private val x251: Q = (spark, sfDir) =>
    Analytics.orderCountSurvival(Tables(spark, sfDir, "orders"), "o_custkey")

  /** x252 — sort-order layout advisor ([[LayoutAdvisor.runCounts]]): exact
    * per-column run counts under two candidate sort orders — the RLE
    * cost model for "which key should this table be written in",
    * computed by the two-phase global-adjacency scan. */
  private val x252: Q = (spark, sfDir) => {
    val li = Tables(spark, sfDir, "lineitem")
    val measures = Seq("l_shipdate", "l_returnflag", "l_linestatus",
      "l_partkey", "l_suppkey")
    LayoutAdvisor.runCounts(li,
        Seq("l_shipdate", "l_orderkey", "l_linenumber"), measures, "by_shipdate")
      .unionAll(LayoutAdvisor.runCounts(li,
        Seq("l_partkey", "l_orderkey", "l_linenumber"), measures, "by_partkey"))
      .orderBy("order_label", "column_name")
  }

  /** x253 — DAU/MAU stickiness ([[Analytics.stickiness]]): monthly
    * actives, exact mean daily actives, and the canonical stickiness
    * ratio in ppm — floored once, never a div-of-divs. */
  private val x253: Q = (spark, sfDir) =>
    Analytics.stickiness(Tables(spark, sfDir, "events"), "user_id", "ts")

  /** x254 — single-source dependency census ([[Analytics.singleSourceCensus]]):
    * parts banded by their top supplier's volume share — the
    * concentration-risk histogram in exact ppm. */
  private val x254: Q = (spark, sfDir) =>
    Analytics.singleSourceCensus(Tables(spark, sfDir, "lineitem"),
      "l_partkey", "l_suppkey")

  /** x255 — vocabulary novelty curve ([[TextAnalysis.vocabNoveltyCurve]]):
    * per ingest batch, terms first seen there over terms used, ppm —
    * when the curve flattens, more of the same source buys nothing. */
  private val x255: Q = (spark, sfDir) =>
    TextAnalysis.vocabNoveltyCurve(docs(spark, sfDir), "doc_id", "text",
      batchSize = 100L)

  /** x256 — cluster density audit ([[Dedup.clusterDensityAudit]]): direct
    * pair evidence over possible pairs per near-dup cluster — low
    * density = transitive over-merge; TENTH consumer of the LSH pair
    * staging. */
  private val x256: Q = (spark, sfDir) =>
    Dedup.clusterDensityAudit(lshPairs(spark, sfDir))

  /** x257 — integer headroom audit ([[Integrity.integerHeadroomAudit]]):
    * per key column, max abs value and exact bit length — the
    * downcast-safety check before a storage rewrite. */
  private val x257: Q = (spark, sfDir) =>
    Integrity.integerHeadroomAudit(Tables(spark, sfDir, "lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"))

  /** x258 — streaming LEFT OUTER interval join
    * ([[graft.streaming.EventStream.streamStreamLeftOuterPurchases]]):
    * purchases with their following-hour errors, NULL rows emitted by
    * watermark-driven state eviction — the outer-join state machine x34
    * never touches. */
  private val x258: Q = (spark, sfDir) =>
    graft.streaming.EventStream.streamStreamLeftOuterPurchases(spark, sfDir)

  /** x259 — price-ending census ([[Analytics.priceEndingCensus]]): top
    * cents endings with exact ppm share — the trailing-digit human
    * fingerprint, complementing x143's leading-digit Benford. */
  private val x259: Q = (spark, sfDir) =>
    Analytics.priceEndingCensus(Tables(spark, sfDir, "orders"),
      col("o_totalprice").cast("decimal(18,2)") * 100)

  /** x260 — retention half-life ([[Analytics.retentionHalfLife]]): first
    * week offset where a cohort retains below half of itself — the
    * one-number compression of the x65 retention triangle. */
  private val x260: Q = (spark, sfDir) =>
    Analytics.retentionHalfLife(Tables(spark, sfDir, "events"),
      "user_id", "ts")

  /** x261 — ABC classification ([[Analytics.abcClassification]]): parts
    * split at the 80/95 % cumulative revenue cuts via the TWO-PHASE
    * range-partitioned prefix sum — never a single-task running total. */
  private val x261: Q = (spark, sfDir) =>
    Analytics.abcClassification(Tables(spark, sfDir, "lineitem"),
      "l_partkey", col("l_extendedprice").cast("decimal(18,2)") * 100)

  /** x262 — missingness-pattern census ([[Integrity.missingnessPatterns]]):
    * the JOINT null distribution over deterministically-planted gaps —
    * block dropouts vs independent dropouts, which x94's per-column
    * rates cannot distinguish. */
  private val x262: Q = (spark, sfDir) =>
    Integrity.missingnessPatterns(
      Tables(spark, sfDir, "events").select(
        when(pmod(col("event_id"), lit(13)) === 0, lit(null).cast("long"))
          .otherwise(col("user_id")).as("user_id"),
        when(pmod(col("event_id"), lit(7)) === 0, lit(null).cast("double"))
          .otherwise(col("value")).as("value"),
        when(pmod(col("event_id"), lit(11)) === 0, lit(null).cast("string"))
          .otherwise(col("props")).as("props")),
      Seq("user_id", "value", "props"))

  /** x263 — median daily-delta trend ([[Analytics.medianDeltaTrend]]):
    * per event type, the median day-over-day change — the robust
    * growing/flat/decaying read one viral day can't wreck. */
  private val x263: Q = (spark, sfDir) =>
    Analytics.medianDeltaTrend(Tables(spark, sfDir, "events"),
      "ts", "event_type")

  /** x264 — double-charge audit ([[Analytics.doubleChargeAudit]]): top
    * users by same-amount purchase pairs within 5 minutes — the
    * payments retry-bug detector; consecutive pairs, exact cents. */
  private val x264: Q = (spark, sfDir) => {
    val p = Tables(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    // deterministic incident plant (organic data has no double-charges —
    // the x262 NULL-plant convention): every 5th purchase re-submits 60 s
    // later, so the audit provably surfaces k−1 pairs per retry burst
    val retries = p.filter(pmod(col("event_id"), lit(5)) === 0)
      .withColumn("ts", col("ts") + expr("INTERVAL 60 seconds"))
    Analytics.doubleChargeAudit(p.unionAll(retries), "user_id", "ts",
      col("value"))
  }

  /** x265 — popularity affinity ([[Analytics.popularityAffinity]]): mean
    * item popularity by customer breadth — the bipartite degree-degree
    * correlation read as a table. */
  private val x265: Q = (spark, sfDir) =>
    Analytics.popularityAffinity(
      Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey")),
      "o_custkey", "l_partkey")

  /** x266 — grid block spatial join ([[Geo.blockNeighborPairs]]): pairs
    * within radius via 3×3 neighbor-cell candidates over deterministic
    * synthetic coordinates — the geohash join shape, zero false
    * negatives by pigeonhole, never all-pairs. */
  private val x266: Q = (spark, sfDir) =>
    Geo.blockNeighborPairs(
      Geo.syntheticPoints(Tables(spark, sfDir, "customer"), "c_custkey",
        worldMicroDeg = 24000000L),
      cellMicroDeg = 1000000L, radiusMicroDeg = 500000L)

  /** x267 — hash-bootstrap CI ([[Sampling.hashBootstrapMeanCI]]): the
    * Poisson bootstrap with hash draws — a deterministic error bar for
    * the mean order value, oracle-reproducible unlike any RNG bootstrap. */
  private val x267: Q = (spark, sfDir) =>
    Sampling.hashBootstrapMeanCI(Tables(spark, sfDir, "orders"),
      "o_orderkey", expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))

  /** x268 — bootstrap A/B difference CI ([[Sampling.hashBootstrapDiffCI]]):
    * deterministic arms (custkey parity), resampled difference in mean
    * order value with a significance flag — the error bar x147 stops
    * short of. */
  private val x268: Q = (spark, sfDir) =>
    Sampling.hashBootstrapDiffCI(Tables(spark, sfDir, "orders"),
      "o_orderkey", pmod(col("o_custkey"), lit(2)),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))

  /** x270 — IVF-PQ recall audit ([[Similarity.ivfPqRecallAudit]]): coarse
    * cell pruning + asymmetric PQ ranking — the production ANN layout
    * (FAISS IVFx,PQy), reported as recall next to scan fraction. */
  private val x270: Q = (spark, sfDir) =>
    Similarity.ivfPqRecallAudit(emb(spark, sfDir), queryVec(spark, sfDir), 10)

  /** x271 — transition dwell-time ([[Analytics.transitionDwellMedian]]):
    * rank-exact median seconds per (from → to) hop — the timing layer of
    * x141's journey map; value-collapsed medians per pair. */
  private val x271: Q = (spark, sfDir) =>
    Analytics.transitionDwellMedian(Tables(spark, sfDir, "events"),
      "user_id", "ts", "event_id", "event_type")

  /** x272 — embedding outlier audit ([[Similarity.embeddingOutlierAudit]]):
    * top vectors by dims beyond 3σ of the corpus mean — exact integers
    * via cross-multiplication, no float variance. */
  private val x272: Q = (spark, sfDir) =>
    Similarity.embeddingOutlierAudit(emb(spark, sfDir), "label")

  /** x273 — id-continuity census ([[Integrity.idContinuityCensus]]):
    * key-space fill per id block in ppm bands — dropped ranges surface
    * even when total counts look plausible. */
  private val x273: Q = (spark, sfDir) =>
    Integrity.idContinuityCensus(Tables(spark, sfDir, "orders"),
      "o_orderkey")

  /** x274 — discount lift ([[Analytics.discountLift]]): mean quantity per
    * discount level with lift vs the zero-discount baseline — the
    * does-discounting-move-volume curve, stated observational. */
  private val x274: Q = (spark, sfDir) =>
    Analytics.discountLift(Tables(spark, sfDir, "lineitem"),
      "l_discount", "l_quantity")

  /** x275 — effective branching factor ([[TextAnalysis.effectiveBranchingFactor]]):
    * token-weighted inverse-Simpson successor diversity per source — the
    * bigram-level templatedness gauge x240's unigram view misses. */
  private val x275: Q = (spark, sfDir) =>
    TextAnalysis.effectiveBranchingFactor(docs(spark, sfDir), "source", "text")

  /** x276 — child-numbering audit ([[Integrity.childNumberingAudit]]):
    * are lineitem numbers the dense run 1..n per order? violations split
    * by root-cause kind. */
  private val x276: Q = (spark, sfDir) =>
    Integrity.childNumberingAudit(Tables(spark, sfDir, "lineitem"),
      "l_orderkey", "l_linenumber")

  /** x277 — order collision census ([[Analytics.orderCollisionCensus]]):
    * different customers, same day, same exact amount — integrity
    * smells by collision-size shape. Organic cent-precision amounts
    * never collide, so every 101st order is re-planted under the next
    * customer (the x264 incident-plant convention) — the audit provably
    * surfaces exactly those groups. */
  private val x277: Q = (spark, sfDir) => {
    val p = Tables(spark, sfDir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"),
        col("o_orderkey"))
    val clones = p.filter(pmod(col("o_orderkey"), lit(101)) === 0)
      .withColumn("o_custkey", col("o_custkey") + 1)
    Analytics.orderCollisionCensus(p.unionAll(clones),
      "o_custkey", "o_orderdate",
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
  }

  /** x278 — checkpoint-restart exactly-once
    * ([[graft.streaming.EventStream.checkpointRestartLakeSink]]): half
    * the files, a clean shutdown, a NEW query resuming from the same
    * checkpoint — the landed lake holds each event exactly once. */
  private val x278: Q = (spark, sfDir) =>
    graft.streaming.EventStream.checkpointRestartLakeSink(spark, sfDir)

  /** x279 — ANN ensemble fusion eval ([[Similarity.rrfFusion]] over the
    * x217 members): does rank fusion beat each individual index? recall
    * rows for all three members plus the fused list. */
  private val x279: Q = (spark, sfDir) => {
    val e = emb(spark, sfDir); val q = queryVec(spark, sfDir)
    val members = Seq(
      "banded_lsh" -> Similarity.annBandedTopK(e, q, 10),
      "ivf" -> Similarity.ivfTopK(e, q, 10),
      "sign_bucket" -> Similarity.annTopK(e, q, 10))
    val fused = Similarity.rrfFusion(members.map(_._2), "vec_id", "sim")
    Similarity.recallEval(members :+ ("rrf_fusion" -> fused),
      Similarity.bruteForceTopK(e, q, 10), "vec_id", 10)
      .orderBy("method")
  }

  /** x280 — diversity-constrained top-k ([[Similarity.diverseTopK]]):
    * exact cosine top-10 with at most 2 results per label — the
    * result-diversification quota every retrieval surface ships. */
  private val x280: Q = (spark, sfDir) =>
    Similarity.diverseTopK(emb(spark, sfDir), queryVec(spark, sfDir),
      "label", k = 10, perGroup = 2)

  /** x281 — cohort value curve ([[Analytics.cohortValueCurve]]): x65's
    * retention triangle with money in the cells — the LTV accumulation
    * read user counts can't answer. */
  private val x281: Q = (spark, sfDir) =>
    Analytics.cohortValueCurve(Tables(spark, sfDir, "events"),
      "user_id", "ts", "value", col("event_type") === "purchase")

  /** x282 — boilerplate mass ([[Dedup.boilerplateMass]]): share of each
    * source's line-chunks (and tokens) repeating across 3+ docs — the
    * filter-or-drop procurement view of x54's per-doc line dedup. */
  private val x282: Q = (spark, sfDir) =>
    Dedup.boilerplateMass(docs(spark, sfDir), "doc_id", "text", "source")

  /** x283 — spend trajectory census ([[Analytics.spendTrajectoryCensus]]):
    * customers rising/falling/flat by the SIGN of their own OLS slope —
    * division-free, exact. */
  private val x283: Q = (spark, sfDir) =>
    Analytics.spendTrajectoryCensus(Tables(spark, sfDir, "orders"),
      "o_custkey", "o_orderdate",
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))

  /** x284 — two-sample KS distance ([[Analytics.ksDistance]]): exact
    * max CDF gap between the parity arms' order values — the
    * distribution-level companion to x268's mean CI. */
  private val x284: Q = (spark, sfDir) =>
    Analytics.ksDistance(Tables(spark, sfDir, "orders"),
      pmod(col("o_custkey"), lit(2)),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))

  /** x285 — Neyman allocation plan ([[Sampling.neymanAllocationPlan]]):
    * sampling budget split ∝ Nh·σh with largest-remainder conservation
    * — the variance-optimal stratified design. */
  private val x285: Q = (spark, sfDir) =>
    Sampling.neymanAllocationPlan(
      Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "customer"),
          col("o_custkey") === col("c_custkey")),
      "c_mktsegment",
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
      budget = 1000L)

  /** x286 — discriminative terms ([[TextAnalysis.discriminativeTerms]]):
    * vocabulary most over-represented in high-quality docs by smoothed
    * df odds ratio — the inspectable face of a scalar quality score. */
  private val x286: Q = (spark, sfDir) =>
    TextAnalysis.discriminativeTerms(docs(spark, sfDir), "doc_id", "text",
      TextAnalysis.qualityScore(col("text")) >= 0.5)

  /** x287 — timestamp collision census ([[Integrity.timestampCollisionCensus]]):
    * events per exact ts in log2 size bands — the event-time vs
    * batch-stamp forensics every watermark depends on. */
  private val x287: Q = (spark, sfDir) =>
    Integrity.timestampCollisionCensus(Tables(spark, sfDir, "events"), "ts")

  /** x288 — lifetime span histogram ([[Analytics.lifetimeSpanHistogram]]):
    * users by first→last event span in log2 day bands — drive-by share
    * vs durable base, anchored to each user's own clock. */
  private val x288: Q = (spark, sfDir) =>
    Analytics.lifetimeSpanHistogram(Tables(spark, sfDir, "events"),
      "user_id", "ts")

  /** x289 — QQ decile table ([[Analytics.qqDecileTable]]): both arms'
    * exact d1..d9 values side by side — the whole-curve companion to
    * x284's single KS number. */
  private val x289: Q = (spark, sfDir) =>
    Analytics.qqDecileTable(Tables(spark, sfDir, "orders"),
      pmod(col("o_custkey"), lit(2)),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))

  /** x290 — split-shipment census ([[Analytics.splitShipmentCensus]]):
    * orders by distinct ship dates with mean span — whole vs dribbled
    * fulfillment, the per-shipment cost driver. */
  private val x290: Q = (spark, sfDir) =>
    Analytics.splitShipmentCensus(Tables(spark, sfDir, "lineitem"),
      "l_orderkey", "l_shipdate")

  /** x291 — source centroid similarity ([[Similarity.sourceCentroidSimilarity]]):
    * pairwise cosine between source centroids over the vec_id↔doc_id
    * bridge — semantic feed overlap where x237 sees only literal reuse. */
  private val x291: Q = (spark, sfDir) =>
    Similarity.sourceCentroidSimilarity(emb(spark, sfDir), docs(spark, sfDir),
      "doc_id", "source")

  /** x292 — outage streak report ([[Analytics.outageStreaks]]): longest
    * consecutive zero-event day run per type — one dark day is a blip,
    * nine in a row is an incident; gaps-and-islands over the spine. */
  private val x292: Q = (spark, sfDir) =>
    Analytics.outageStreaks(Tables(spark, sfDir, "events"), "ts", "event_type")

  /** x293 — cadence dispersion census ([[Analytics.cadenceDispersionCensus]]):
    * users classified bursty / poisson-like / metronomic by the exact
    * cross-multiplied dispersion index of their gaps — TOO-regular is
    * the strongest automation tell. */
  private val x293: Q = (spark, sfDir) =>
    Analytics.cadenceDispersionCensus(Tables(spark, sfDir, "events"),
      "user_id", "ts")

  /** x294 — feature propensity curve: events bucketed by props.k decile
    * with the purchase share per bucket in ppm — the simplest
    * feature-vs-outcome read, shred-at-read via get_json_object. */
  private val x294: Q = (spark, sfDir) =>
    Tables(spark, sfDir, "events")
      .filter(col("props").isNotNull)
      .select(expr("CAST(get_json_object(props, '$.k') AS INT)").as("__k"),
        col("event_type"))
      .filter(col("__k").isNotNull)
      .groupBy(expr("__k DIV 10").cast("int").as("k_band"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .select(col("k_band"), col("n_events"), col("n_purchases"),
        expr("n_purchases * 1000000 DIV n_events").as("purchase_ppm"))
      .orderBy("k_band")

  /** x295 — dedup quality uplift: mean quality score (milli) of the full
    * corpus vs the x24 retained set — the number that justifies the
    * dedup pass ("keep-best raised average quality by N points"). */
  private val x295: Q = (spark, sfDir) => {
    val d = docs(spark, sfDir)
    // ROUND before the integer cast: Spark's double→long cast truncates
    // while DuckDB's rounds — ROUND(×1000) makes both engines agree
    val scored = d.select(col("doc_id"),
      round(TextAnalysis.qualityScore(col("text")) * 1000).cast("long").as("__q"))
    val clusters = Dedup.dupClusters(lshPairs(spark, sfDir), iterations = 3)
    val kept = Dedup.retainBest(d, "doc_id",
      TextAnalysis.qualityScore(col("text")), clusters).select("doc_id")
    val full = scored.agg(count(lit(1)).as("n_docs"),
      sum(col("__q")).as("__s"))
      .select(col("n_docs"), expr("__s DIV n_docs").as("mean_quality_milli"))
    val retained = scored.join(kept, Seq("doc_id"), "left_semi")
      .agg(count(lit(1)).as("n_retained"), sum(col("__q")).as("__s"))
      .select(col("n_retained"), expr("__s DIV n_retained").as("retained_quality_milli"))
    full.crossJoin(retained)
      .withColumn("uplift_milli",
        col("retained_quality_milli") - col("mean_quality_milli"))
  }

  /** x296 — rhythm similarity ([[Analytics.rhythmSimilarity]]): pairwise
    * cosine of hourly activity profiles — behaviors sharing a daily
    * rhythm belong to the same journey; exact 24-dim integer profiles. */
  private val x296: Q = (spark, sfDir) =>
    Analytics.rhythmSimilarity(Tables(spark, sfDir, "events"),
      "ts", "event_type")

  /** x297 — temporal-order audit ([[Integrity.temporalOrderAudit]]):
    * lineitems shipping BEFORE their order date, banded by severity —
    * clock-skew/join-collision forensics. */
  private val x297: Q = (spark, sfDir) =>
    Integrity.temporalOrderAudit(
      Tables(spark, sfDir, "orders"), "o_orderkey", "o_orderdate",
      Tables(spark, sfDir, "lineitem"), "l_orderkey", "l_shipdate")

  /** x298 — directional basket confidence ([[Curation.basketConfidence]]):
    * conf(A→B) vs conf(B→A) for the top pairs — support is symmetric,
    * recommendations are not. */
  private val x298: Q = (spark, sfDir) =>
    Curation.basketConfidence(
      Tables(spark, sfDir, "lineitem")
        .join(Tables(spark, sfDir, "part"),
          col("l_partkey") === col("p_partkey")),
      "l_orderkey", "p_brand", minSupport = 2L, topK = 20)

  /** x299 — brand return-rate ranking: returned-line share per brand in
    * exact ppm, volume-filtered — the retail QA list of brands whose
    * returns run hot. */
  private val x299: Q = (spark, sfDir) =>
    Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull && col("l_returnflag").isNotNull)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"))
      .filter(col("n_lines") >= 100)
      .select(col("p_brand"), col("n_lines"), col("n_returned"),
        expr("n_returned * 1000000 DIV n_lines").as("return_ppm"))
      .orderBy(col("return_ppm").desc, col("p_brand"))
      .limit(15)

  /** x300 — IVF-PQ + exact re-rank ([[Similarity.ivfPqRerankAudit]]):
    * the complete three-tier retrieval stack — coarse cells, PQ codes,
    * exact re-rank of the pool — recall after the exact pass repaired
    * the PQ ranking noise. */
  private val x300: Q = (spark, sfDir) =>
    Similarity.ivfPqRerankAudit(emb(spark, sfDir), queryVec(spark, sfDir), 10)

  /** x301 — conversion by session depth: [[Analytics.sessionize]]'s
    * sessions rolled into log2 depth bands with the purchase rate per
    * band — "do longer sessions convert better" read off the same
    * machinery x81 aggregates globally. */
  private val x301: Q = (spark, sfDir) =>
    Analytics.sessionize(Tables(spark, sfDir, "events"),
        "user_id", "ts", "event_type", "purchase", gapMinutes = 30)
      .withColumn("depth_band", (length(bin(col("n_events"))) - 1).cast("int"))
      .groupBy("depth_band")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted").cast("long")).as("n_converted"))
      .select(col("depth_band"), col("n_sessions"), col("n_converted"),
        expr("n_converted * 1000000 DIV n_sessions").as("conversion_ppm"))
      .orderBy("depth_band")

  /** x302 — top-decile retention ([[Analytics.topDecileRetention]]): of
    * each quarter's top-decile spenders, the share still top-decile next
    * quarter — the whale-churn number x173's concentration makes urgent;
    * keyed two-phase prefix CDFs per quarter. */
  private val x302: Q = (spark, sfDir) =>
    Analytics.topDecileRetention(Tables(spark, sfDir, "orders"),
      "o_custkey", "o_orderdate",
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))

  /** x303 — token budget matrix: tokens per (lang × quality band) with
    * corpus share ppm — the mixture-planning grid a training-data budget
    * is written against. */
  private val x303: Q = (spark, sfDir) => {
    val base = docs(spark, sfDir)
      .filter(col("lang").isNotNull && col("text").isNotNull)
      .select(col("lang"),
        when(TextAnalysis.qualityScore(col("text")) >= 0.5, "hi")
          .otherwise("lo").as("quality_band"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("__tok"))
    val m = base.groupBy("lang", "quality_band")
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"))
    val tot = m.agg(sum(col("n_tokens")).as("__t"))
    m.crossJoin(broadcast(tot))
      .select(col("lang"), col("quality_band"), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 1000000 DIV __t").as("token_share_ppm"))
      .orderBy("lang", "quality_band")
  }

  /** x304 — embedding coverage audit: per source, docs WITH a vector
    * under the vec_id↔doc_id contract — the multimodal-bridge
    * completeness check every retrieval feature silently assumes. */
  private val x304: Q = (spark, sfDir) => {
    val vecIds = emb(spark, sfDir).select(col("vec_id").as("doc_id"))
    docs(spark, sfDir).filter(col("source").isNotNull)
      .join(vecIds.withColumn("__has", lit(1L)), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("__has"), lit(0L))).as("n_with_vec"))
      .select(col("source"), col("n_docs"), col("n_with_vec"),
        expr("n_with_vec * 1000000 DIV n_docs").as("coverage_ppm"))
      .orderBy("source")
  }

  /** x305 — ARPU trend: monthly purchase revenue over monthly actives in
    * exact milli-cents — the unit-economics line x253's stickiness sits
    * beside on every dashboard. */
  private val x305: Q = (spark, sfDir) => {
    val e = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val mau = e.select(trunc(col("ts"), "month").as("month"), col("user_id"))
      .distinct()
      .groupBy("month").agg(count(lit(1)).as("mau"))
    val rev = e.filter(col("event_type") === "purchase" && col("value").isNotNull)
      .groupBy(trunc(col("ts"), "month").as("month"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(expr("CAST(ROUND(CAST(value AS DOUBLE) * 100) AS BIGINT)"))
          .as("rev_cents"))
    mau.join(rev, Seq("month"), "left")
      .select(col("month"), col("mau"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        coalesce(col("rev_cents"), lit(0L)).as("rev_cents"),
        expr("coalesce(rev_cents, 0L) * 1000 DIV mau").as("arpu_millicents"))
      .orderBy("month")
  }

  /** x306 — new-vs-returning revenue split: each month's purchase revenue
    * split by whether the buyer's FIRST-EVER event falls in that month —
    * the money view of x155's user-count growth accounting. */
  private val x306: Q = (spark, sfDir) => {
    val e = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
    val firstMonth = e.groupBy("user_id")
      .agg(trunc(min(col("ts")), "month").as("__fm"))
    e.filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("user_id"), trunc(col("ts"), "month").as("month"),
        expr("CAST(ROUND(CAST(value AS DOUBLE) * 100) AS BIGINT)").as("__c"))
      .join(firstMonth, "user_id")
      .groupBy("month")
      .agg(sum(when(col("month") === col("__fm"), col("__c")).otherwise(0L))
          .as("new_rev_cents"),
        sum(when(col("month") =!= col("__fm"), col("__c")).otherwise(0L))
          .as("returning_rev_cents"))
      .select(col("month"), col("new_rev_cents"), col("returning_rev_cents"),
        expr("""CASE WHEN new_rev_cents + returning_rev_cents > 0
            THEN new_rev_cents * 1000000 DIV (new_rev_cents + returning_rev_cents)
            ELSE 0L END""").as("new_share_ppm"))
      .orderBy("month")
  }

  /** x307 — time-to-second-purchase ([[Analytics.timeToSecondPurchase]]):
    * whole-day first→second purchase gaps in log2 bands with the exact
    * median — the habit-forming lever x159's first-conversion table
    * stops short of. */
  private val x307: Q = (spark, sfDir) =>
    Analytics.timeToSecondPurchase(Tables(spark, sfDir, "events"),
      "user_id", "ts", "event_type", "purchase")

  /** x308 — conversion latency by channel
    * ([[Analytics.conversionLatencyByChannel]]): per first-touch type,
    * conversion rate AND median days to first purchase — volume, rate,
    * and latency together rank the spend. */
  private val x308: Q = (spark, sfDir) =>
    Analytics.conversionLatencyByChannel(Tables(spark, sfDir, "events"),
      "user_id", "ts", "event_id", "event_type", "purchase")

  /** x309 — fulfillment service-level sweep: share of orders fully
    * shipped within k days of first shipment for k ∈ {0, 7, 14, 30} —
    * the SLA curve from ONE pass over per-order spans (the x244
    * one-scan sweep discipline applied to x290's spans). */
  private val x309: Q = (spark, sfDir) => {
    val spans = Tables(spark, sfDir, "lineitem")
      .filter(col("l_orderkey").isNotNull && col("l_shipdate").isNotNull)
      .groupBy("l_orderkey")
      .agg(datediff(max(to_date(col("l_shipdate"))),
        min(to_date(col("l_shipdate")))).cast("long").as("__span"))
    val ks = Seq(0L, 7L, 14L, 30L)
    val aggs = count(lit(1)).as("__n") +:
      ks.map(k => sum(when(col("__span") <= k, 1L).otherwise(0L)).as(s"__w$k"))
    val row = spans.agg(aggs.head, aggs.tail: _*)
    val stacked = ks.map(k => s"${k}L, __w$k").mkString(", ")
    row.select(col("__n"),
        expr(s"stack(${ks.size}, $stacked) AS (within_days, n_within)"))
      .select(col("within_days"), col("n_within"), col("__n").as("n_orders"),
        expr("n_within * 1000000 DIV __n").as("service_ppm"))
      .orderBy("within_days")
  }

  /** x310 — repeat rate by first-basket size: do customers whose FIRST
    * order had more lines come back more? — the onboarding-breadth
    * hypothesis read exactly; first order via keyed min(struct), line
    * counts from the collapsed per-order frame. */
  private val x310: Q = (spark, sfDir) => {
    val orders = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
    val perCust = orders.groupBy("o_custkey")
      .agg(count(lit(1)).as("__n"),
        min(struct(col("o_orderdate").as("d"), col("o_orderkey").as("k")))
          .as("__f"))
      .select(col("o_custkey"), col("__n"), col("__f.k").as("__first_order"))
    val lines = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey").as("__first_order"))
      .agg(count(lit(1)).as("__lines"))
    perCust.join(lines, "__first_order")
      .groupBy(col("__lines").as("first_order_lines"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("__n") >= 2, 1L).otherwise(0L)).as("n_repeat"))
      .select(col("first_order_lines"), col("n_customers"), col("n_repeat"),
        expr("n_repeat * 1000000 DIV n_customers").as("repeat_ppm"))
      .orderBy("first_order_lines")
  }

  /** x311 — co-purchase degree census: brands by how many DISTINCT other
    * brands they share an order with, in log2 bands — hub brands anchor
    * cross-sell, isolated ones are category islands; basket-bounded
    * pair join, |brands| collapse. */
  private val x311: Q = (spark, sfDir) => {
    val ob = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("l_orderkey").isNotNull && col("p_brand").isNotNull)
      .select(col("l_orderkey").as("__o"), col("p_brand").as("__b"))
      .distinct()
    val deg = ob.as("a")
      .join(ob.as("b"),
        col("a.__o") === col("b.__o") && col("a.__b") =!= col("b.__b"))
      .select(col("a.__b").as("brand"), col("b.__b").as("partner"))
      .distinct()
      .groupBy("brand").agg(count(lit(1)).as("__deg"))
    deg.groupBy((length(bin(col("__deg"))) - 1).cast("int").as("degree_band"))
      .agg(count(lit(1)).as("n_brands"),
        min(col("__deg")).as("min_degree"), max(col("__deg")).as("max_degree"))
      .orderBy("degree_band")
  }

  /** x312 — hapax share per source: fraction of each source's DISTINCT
    * vocabulary that occurs exactly once corpus-wide — the classic
    * noisy-text signal (typos, serial numbers, and boilerplate IDs
    * inflate hapaxes; curated prose doesn't). Scale shape: per-
    * (source, word) collapse FIRST, corpus totals from the collapsed
    * frame, so every exchange after the first scan is |vocab|-bounded. */
  private val x312: Q = (spark, sfDir) => {
    val sw = docs(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("source", "__w").agg(count(lit(1)).as("__k"))
    val tot = sw.groupBy("__w").agg(sum(col("__k")).as("__n"))
    sw.join(tot, "__w")
      .groupBy("source")
      .agg(count(lit(1)).as("n_vocab"),
        sum(when(col("__n") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_vocab"), col("n_hapax"),
        expr("n_hapax * 1000000 DIV n_vocab").as("hapax_ppm"))
      .orderBy("source")
  }

  /** x313 — supplier return-rate census: per-supplier returned-line ppm
    * (l_returnflag = 'R') over a minimum-volume floor, banded in 10%
    * ppm bands — the vendor-scorecard DISTRIBUTION at a glance (x299
    * ranks brands; this profiles the whole supplier population).
    * Supplier frame is |suppliers|-bounded after the first groupBy; no
    * windows anywhere. */
  private val x313: Q = (spark, sfDir) => {
    val sup = Tables(spark, sfDir, "lineitem")
      .filter(col("l_suppkey").isNotNull && col("l_returnflag").isNotNull)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("__r"))
      .filter(col("__n") >= 3)
      .select(col("l_suppkey"), expr("__r * 1000000 DIV __n").as("__ppm"))
    sup.groupBy(expr("__ppm DIV 100000").cast("int").as("return_band"))
      .agg(count(lit(1)).as("n_suppliers"),
        min(col("__ppm")).as("min_ppm"), max(col("__ppm")).as("max_ppm"))
      .orderBy("return_band")
  }

  /** x314 — order-priority mix drift ([[Analytics.categoricalMixDrift]]):
    * year-over-year L1 distance between the priority share vectors in
    * exact integer ppm — the categorical data-drift monitor every ingest
    * pipeline wants; x330 points the same operator at the event-type mix
    * monthly. */
  private val x314: Q = (spark, sfDir) =>
    Analytics.categoricalMixDrift(
      Tables(spark, sfDir, "orders")
        .filter(col("o_orderdate").isNotNull)
        .select(year(to_date(col("o_orderdate"))).as("yr"),
          col("o_orderpriority")),
      "yr", "o_orderpriority")

  /** x315 — top converting paths: the most common within-session
    * event-type SEQUENCES (30-min gap sessionization, ≤ 8 events) that
    * contain a purchase — the path-to-conversion report funnels (x64)
    * and transition matrices (x141) both flatten away. Windows are
    * user-partitioned (user-bounded frames); per-session order is pinned
    * by (ts, event_id) so tie-broken paths agree across engines. */
  private val x315: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sess = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("__prev")) > 1800000000L,
        1L).otherwise(0L))
      .withColumn("__sess", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy("user_id", "__sess")
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
        col("event_type").as("et")))).as("__seq"))
      .select(expr("array_join(transform(__seq, s -> s.et), '>')").as("path"),
        expr("size(__seq)").as("__len"),
        expr("array_contains(transform(__seq, s -> s.et), 'purchase')").as("__hit"))
      .filter(col("__len") <= 8 && col("__hit"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  /** x316 — inter-order gap quartiles by market segment: exact p25/p50/
    * p75 of customer reorder gaps in days per segment via
    * [[Analytics.weightedQuantiles]] (unit weights) — the purchase-
    * cadence profile a retention model trains on, computed by the
    * distinct-value cumulative rule (`100·cum ≥ p·total`), never a
    * row-sized sort. Lag window is customer-partitioned. */
  private val x316: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("__d", "o_orderkey")
    val gaps = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("__d"),
        col("o_orderkey"))
      .withColumn("__prev", lag(col("__d"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("o_custkey"),
        datediff(col("__d"), col("__prev")).cast("long").as("gap_days"))
    val j = gaps.join(Tables(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("gap_days"))
      .withColumn("__w", lit(1L))
    Analytics.weightedQuantiles(j, "segment", "gap_days", "__w",
        probsPct = Seq(25, 50, 75))
      .select(col("segment"), col("p_pct"),
        col("q_value").as("gap_days_q"), col("total_weight").as("n_gaps"))
      .orderBy("segment", "p_pct")
  }

  /** x317 — character-class mix by source: corpus-level alpha/digit/
    * space ppm per source from ONE scan (per-doc x08 scores quality;
    * this profiles the population — a digit-heavy source is tables or
    * logs, not prose). Row-local regexp lengths, |sources|-bounded
    * aggregate. */
  private val x317: Q = (spark, sfDir) => {
    val t = docs(spark, sfDir).select(col("source"),
      length(col("text")).cast("long").as("__n"),
      length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("long").as("__a"),
      length(regexp_replace(col("text"), "[^0-9]", "")).cast("long").as("__d"),
      length(regexp_replace(col("text"), "[^ ]", "")).cast("long").as("__s"))
    t.groupBy("source")
      .agg(sum(col("__n")).as("n_chars"), sum(col("__a")).as("__an"),
        sum(col("__d")).as("__dn"), sum(col("__s")).as("__sn"))
      .filter(col("n_chars") > 0)
      .select(col("source"), col("n_chars"),
        expr("__an * 1000000 DIV n_chars").as("alpha_ppm"),
        expr("__dn * 1000000 DIV n_chars").as("digit_ppm"),
        expr("__sn * 1000000 DIV n_chars").as("space_ppm"))
      .orderBy("source")
  }

  /** x318 — exact deterministic MODE of order quantity per brand (tie →
    * smallest value): DuckDB/Spark `mode()` both leave ties engine-
    * defined, so the portable spelling is count-collapse then
    * max(struct(count, −value)) — two vocabulary-bounded aggregates, no
    * window, deterministic on every engine. */
  private val x318: Q = (spark, sfDir) => {
    val c = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull && col("l_quantity").isNotNull)
      .groupBy(col("p_brand").as("brand"),
        col("l_quantity").cast("long").as("__q"))
      .agg(count(lit(1)).as("__c"))
    c.groupBy("brand")
      .agg(max(struct(col("__c"), (-col("__q")).as("__nq"))).as("__m"),
        sum(col("__c")).as("n_lines"))
      .select(col("brand"), (-col("__m.__nq")).as("mode_qty"),
        col("__m.__c").as("n_mode"), col("n_lines"))
      .orderBy("brand")
  }

  /** x319 — nation trade balance: revenue netting between customer
    * nation and supplier nation over canonical unordered pairs — the
    * TPC-H Q7 volume-shipping shape folded to a NET balance sheet.
    * Exact integer cents; nation dims broadcast; the flow matrix is
    * |nations|²-bounded after one group-by. */
  private val x319: Q = (spark, sfDir) => {
    val nat = Tables(spark, sfDir, "nation")
    val flow = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sfDir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat.select(col("n_nationkey").as("__ck"),
        col("n_name").as("__cn"))), col("c_nationkey") === col("__ck"))
      .join(broadcast(nat.select(col("n_nationkey").as("__sk"),
        col("n_name").as("__sn"))), col("s_nationkey") === col("__sk"))
      .filter(col("__cn") =!= col("__sn"))
      .groupBy("__cn", "__sn")
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("__cents"))
    flow.select(
        least(col("__cn"), col("__sn")).as("nation_a"),
        greatest(col("__cn"), col("__sn")).as("nation_b"),
        when(col("__cn") < col("__sn"), col("__cents")).otherwise(lit(0L)).as("__ab"),
        when(col("__cn") < col("__sn"), lit(0L)).otherwise(col("__cents")).as("__ba"))
      .groupBy("nation_a", "nation_b")
      .agg(sum(col("__ab")).as("a_buys_cents"), sum(col("__ba")).as("b_buys_cents"))
      .select(col("nation_a"), col("nation_b"), col("a_buys_cents"),
        col("b_buys_cents"),
        (col("a_buys_cents") - col("b_buys_cents")).as("net_cents"))
      .orderBy("nation_a", "nation_b")
  }

  /** x320 — inactive-customer census by nation: customers with zero
    * orders as exact ppm per nation — the anti-join census behind every
    * "reachable but dormant" audience cut. Distinct active keys first
    * (|customers|-bounded), nation dim broadcast. */
  private val x320: Q = (spark, sfDir) => {
    val active = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull).select("o_custkey").distinct()
    Tables(spark, sfDir, "customer")
      .join(active, col("c_custkey") === col("o_custkey"), "left")
      .join(broadcast(Tables(spark, sfDir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_inactive"))
      .select(col("nation"), col("n_customers"), col("n_inactive"),
        expr("n_inactive * 1000000 DIV n_customers").as("inactive_ppm"))
      .orderBy("nation")
  }

  /** x321 — brand momentum: first-vs-last CALENDAR-year revenue per
    * brand with exact growth ppm — spelled `ratio − 1e6` so the integer
    * division only ever sees positive operands (DuckDB `//` floors,
    * Spark `DIV` truncates; they agree only on positives — the x103
    * lesson). The ratio stages through DECIMAL(38,0) on the Spark side
    * for the claimed-scale overflow bound. */
  private val x321: Q = (spark, sfDir) => {
    val rev = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull && col("o_orderdate").isNotNull)
      .select(col("p_brand").as("brand"),
        year(to_date(col("o_orderdate"))).as("__yr"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
    val span = rev.agg(min(col("__yr")).as("__y0"), max(col("__yr")).as("__y1"))
    rev.crossJoin(broadcast(span))
      .groupBy("brand")
      .agg(max(col("__y0")).as("first_year"), max(col("__y1")).as("last_year"),
        sum(when(col("__yr") === col("__y0"), col("__c")).otherwise(0L))
          .as("rev_first_cents"),
        sum(when(col("__yr") === col("__y1"), col("__c")).otherwise(0L))
          .as("rev_last_cents"))
      .select(col("brand"), col("first_year"), col("last_year"),
        col("rev_first_cents"), col("rev_last_cents"),
        when(col("rev_first_cents") > 0,
          expr("CAST(CAST(rev_last_cents AS DECIMAL(38,0)) * 1000000" +
            " DIV rev_first_cents AS BIGINT) - 1000000"))
          .otherwise(lit(null).cast("long")).as("growth_ppm"))
      .orderBy("brand")
  }

  /** x322 — month-end concentration: share of each month's order value
    * landing in the last 3 calendar days vs the uniform expectation
    * (3/days-in-month) — the quota-stuffing / batch-posting fingerprint.
    * One scan; month frame is |months|-bounded. `trunc(_, "month")`
    * stays DATE on both engines (the date_trunc TIMESTAMP trap). */
  private val x322: Q = (spark, sfDir) => {
    val o = Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(to_date(col("o_orderdate")).as("__d"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
      .withColumn("__m", trunc(col("__d"), "month"))
      .withColumn("__dim", dayofmonth(last_day(col("__d"))))
    o.groupBy(col("__m").as("month"), col("__dim").as("n_days"))
      .agg(sum(col("__c")).as("total_cents"),
        sum(when(dayofmonth(col("__d")) >= col("__dim") - 2, col("__c"))
          .otherwise(0L)).as("last3_cents"))
      .filter(col("total_cents") > 0)
      .select(col("month"), col("n_days"), col("total_cents"),
        col("last3_cents"),
        expr("last3_cents * 1000000 DIV total_cents").as("actual_ppm"),
        expr("CAST(3000000 DIV n_days AS BIGINT)").as("expected_ppm"))
      .withColumn("excess_ppm", col("actual_ppm") - col("expected_ppm"))
      .orderBy("month")
  }

  /** x323 — volume-discount curve: exact mean discount ppm per quantity
    * decade band with the step vs the previous band — does the pricing
    * ladder actually climb? Discounts go through DECIMAL(8,6) (a double
    * ×1e6 cast truncates into off-by-one ppm). The lag window rides the
    * band spine (≤ 6 rows), not row data. */
  private val x323: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val bands = Tables(spark, sfDir, "lineitem")
      .filter(col("l_quantity").isNotNull && col("l_discount").isNotNull)
      .select(expr("CAST(CAST(l_quantity AS BIGINT) DIV 10 AS INT)")
          .as("qty_band"),
        (col("l_discount").cast("decimal(8,6)") * 1000000).cast("long")
          .as("__dppm"))
      .groupBy("qty_band")
      .agg(count(lit(1)).as("n_lines"),
        expr("SUM(__dppm) DIV COUNT(1)").as("mean_discount_ppm"))
    bands
      .withColumn("delta_vs_prev", col("mean_discount_ppm") -
        lag(col("mean_discount_ppm"), 1).over(Window.orderBy("qty_band")))
      .orderBy("qty_band")
  }

  /** x324 — balance-band activity split: customer account-balance bands
    * (negative / low / high) vs their order activity — the credit-risk
    * read "do indebted customers still buy?". Left join against the
    * per-customer order rollup (customer-bounded), 3-row output. */
  private val x324: Q = (spark, sfDir) => {
    val po = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("__no"),
        sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("__rev"))
    Tables(spark, sfDir, "customer")
      .select(col("c_custkey"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("__b"))
      .join(po, col("c_custkey") === col("o_custkey"), "left")
      .select(
        when(col("__b") < 0, "1_negative")
          .when(col("__b") < 500000L, "2_low").otherwise("3_high")
          .as("bal_band"),
        coalesce(col("__no"), lit(0L)).as("__no"),
        coalesce(col("__rev"), lit(0L)).as("__rev"))
      .groupBy("bal_band")
      .agg(count(lit(1)).as("n_customers"), sum(col("__no")).as("n_orders"),
        sum(col("__rev")).as("rev_cents"))
      .select(col("bal_band"), col("n_customers"), col("n_orders"),
        col("rev_cents"),
        expr("n_orders * 1000 DIV n_customers").as("orders_per_k"))
      .orderBy("bal_band")
  }

  /** x325 — brand seasonal index: month-of-year revenue index per brand
    * in ppm of the uniform 1/12 share (1 000 000 = no seasonality) —
    * the demand-shape fingerprint feeding x223's seasonal-naive
    * baseline. |brands|×12 cells; the numerator stages through
    * DECIMAL(38,0) (cents × 12e6 outruns Long at claimed scale). */
  private val x325: Q = (spark, sfDir) => {
    val cell = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull && col("o_orderdate").isNotNull)
      .groupBy(col("p_brand").as("brand"),
        month(to_date(col("o_orderdate"))).as("mo"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("month_cents"))
    val tot = cell.groupBy("brand").agg(sum(col("month_cents")).as("__t"))
    cell.join(tot, "brand")
      .select(col("brand"), col("mo"), col("month_cents"),
        expr("CAST(CAST(month_cents AS DECIMAL(38,0)) * 12000000 DIV __t" +
          " AS BIGINT)").as("seasonal_index_ppm"))
      .orderBy("brand", "mo")
  }

  /** x326 — cross-LANGUAGE dup census ([[Dedup.crossSourceDups]] keyed
    * on lang): verified near-dup pairs bucketed by language pair —
    * off-diagonal mass is copied-untranslated contamination, the thing a
    * per-language dedup pass structurally cannot see. Ninth consumer of
    * the LSH pair staging. */
  private val x326: Q = (spark, sfDir) =>
    Dedup.crossSourceDups(docs(spark, sfDir), lshPairs(spark, sfDir),
        "doc_id", "lang")
      .select(col("source_1").as("lang_1"), col("source_2").as("lang_2"),
        col("n_pairs"))

  /** x327 — brand revenue volatility: max-to-min observed-month revenue
    * ratio per brand in ppm (range volatility — no square roots, exact
    * integers) — the planning-risk companion to x325's seasonal shape.
    * Month cells exist only where revenue exists, so the divisor is
    * structurally positive. */
  private val x327: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull && col("o_orderdate").isNotNull)
      .groupBy(col("p_brand").as("brand"),
        trunc(to_date(col("o_orderdate")), "month").as("__m"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("__mc"))
      .groupBy("brand")
      .agg(count(lit(1)).as("n_months"), min(col("__mc")).as("min_month_cents"),
        max(col("__mc")).as("max_month_cents"))
      .select(col("brand"), col("n_months"), col("min_month_cents"),
        col("max_month_cents"),
        expr("CAST(CAST(max_month_cents AS DECIMAL(38,0)) * 1000000" +
          " DIV min_month_cents AS BIGINT)").as("volatility_ppm"))
      .orderBy("brand")
  }

  /** x328 — word-length histogram by language: per-lang distribution of
    * token lengths (capped at 15+) in exact share ppm — the
    * tokenizer-sanity fingerprint (a lang whose mass sits at 1–2 chars
    * is fragmenting; at 15+ it's concatenating). One explode scan, then
    * |lang × 15| cells. */
  private val x328: Q = (spark, sfDir) => {
    val c = docs(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("lang"), least(length(col("__w")), lit(15)).as("wlen"))
      .agg(count(lit(1)).as("n_words"))
    val tot = c.groupBy("lang").agg(sum(col("n_words")).as("__t"))
    c.join(tot, "lang")
      .select(col("lang"), col("wlen"), col("n_words"),
        expr("CAST(CAST(n_words AS DECIMAL(38,0)) * 1000000 DIV __t" +
          " AS BIGINT)").as("share_ppm"))
      .orderBy("lang", "wlen")
  }

  /** x329 — dup-graph transitivity audit: closed-wedge rate of the
    * verified near-dup relation — low closure means the 0.7 threshold is
    * fragmenting clusters (a~b, b~c, a̸~c), the signal that decides
    * between pair-level and cluster-level retention. Wedge join is
    * bounded by the LSH pair frame (≪ corpus), tenth consumer of the
    * shared staging. */
  private val x329: Q = (spark, sfDir) => {
    val p = lshPairs(spark, sfDir).select(col("d1"), col("d2"))
    val adj = p.select(col("d1").as("__c"), col("d2").as("__nb"))
      .union(p.select(col("d2").as("__c"), col("d1").as("__nb")))
    val w = adj.as("x").join(adj.as("y"),
        col("x.__c") === col("y.__c") && col("x.__nb") < col("y.__nb"))
      .select(col("x.__nb").as("__a"), col("y.__nb").as("__b"))
    val nw = w.agg(count(lit(1)).as("n_wedges"))
    val nc = w.join(p, col("__a") === col("d1") && col("__b") === col("d2"),
        "left_semi")
      .agg(count(lit(1)).as("n_closed"))
    nw.crossJoin(nc).select(col("n_wedges"), col("n_closed"),
      expr("CASE WHEN n_wedges > 0 THEN n_closed * 1000000 DIV n_wedges" +
        " ELSE CAST(0 AS BIGINT) END").as("closure_ppm"))
  }

  /** x330 — event-type mix drift ([[Analytics.categoricalMixDrift]]):
    * day-over-day L1 distance of the event-type share vector — the
    * tracking-schema canary (an instrumentation change shows up here
    * before any metric moves). Second consumer of the drift operator. */
  private val x330: Q = (spark, sfDir) =>
    Analytics.categoricalMixDrift(
      Tables(spark, sfDir, "events")
        .filter(col("ts").isNotNull)
        .select(to_date(col("ts")).as("day"), col("event_type")),
      "day", "event_type")

  /** x331 — price realization by brand: actual line revenue vs
    * list-price value (quantity × retail) as exact ppm — the effective-
    * discount read that catches channel leakage a discount-column mean
    * (x323) can't (it misses price overrides). Per-row products fit
    * Long; only the final ratio stages through DECIMAL(38,0). */
  private val x331: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull && col("l_quantity").isNotNull &&
        col("l_extendedprice").isNotNull && col("p_retailprice").isNotNull)
      .select(col("p_brand").as("brand"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__act"),
        (col("l_quantity").cast("long") *
          expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("__list"))
      .groupBy("brand")
      .agg(sum(col("__act")).as("actual_cents"),
        sum(col("__list")).as("list_cents"))
      .select(col("brand"), col("actual_cents"), col("list_cents"),
        expr("CAST(CAST(actual_cents AS DECIMAL(38,0)) * 1000000" +
          " DIV list_cents AS BIGINT)").as("realization_ppm"))
      .orderBy("brand")
  }

  /** x332 — trailing-mean backtest: predict each order's value with the
    * customer's OWN prior-order mean, report MAE in exact cents by
    * market segment — the baseline every order-value model must beat,
    * computed with the no-leakage frame (UNBOUNDED PRECEDING .. 1
    * PRECEDING). Windows are customer-partitioned; the rollup is
    * |segments|-bounded. */
  private val x332: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("__d", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, -1)
    val scored = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("__d"),
        col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
      .withColumn("__ps", sum(col("__c")).over(w))
      .withColumn("__pn", count(lit(1)).over(w))
      .filter(col("__pn") > 0)
      .select(col("o_custkey"),
        abs(col("__c") - expr("__ps DIV __pn")).as("__err"))
    scored.join(Tables(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_orders"), sum(col("__err")).as("__se"))
      .select(col("segment"), col("n_orders"),
        expr("__se DIV n_orders").as("mae_cents"))
      .orderBy("segment")
  }

  /** x333 — dead-stock census: parts never ordered, as exact ppm per
    * brand — the catalog-rot read (x320 asks it of customers; the part
    * axis decides purge lists). Distinct ordered keys first, then one
    * anti-ish left join; |brands|-row output. */
  private val x333: Q = (spark, sfDir) => {
    val ordered = Tables(spark, sfDir, "lineitem")
      .filter(col("l_partkey").isNotNull).select("l_partkey").distinct()
    Tables(spark, sfDir, "part")
      .join(ordered, col("p_partkey") === col("l_partkey"), "left")
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("l_partkey").isNull, 1L).otherwise(0L))
          .as("n_never_ordered"))
      .select(col("brand"), col("n_parts"), col("n_never_ordered"),
        expr("n_never_ordered * 1000000 DIV n_parts").as("dead_ppm"))
      .orderBy("brand")
  }

  /** x334 — hourly load profile: event share ppm per (event_type × hour
    * of day) — the capacity-planning shape x202's completeness grid and
    * the dow seasonality profile both miss. One scan, 5×24 cells. */
  private val x334: Q = (spark, sfDir) => {
    val c = Tables(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"), hour(col("ts")).as("hh"))
      .agg(count(lit(1)).as("n_events"))
    val tot = c.groupBy("event_type").agg(sum(col("n_events")).as("__t"))
    c.join(tot, "event_type")
      .select(col("event_type"), col("hh"), col("n_events"),
        expr("n_events * 1000000 DIV __t").as("share_ppm"))
      .orderBy("event_type", "hh")
  }

  /** x335 — spend-decile migration ([[Analytics.decileMigration]]): the
    * year-over-year customer value transition matrix over keyed
    * two-phase CDF deciles. */
  private val x335: Q = (spark, sfDir) =>
    Analytics.decileMigration(Tables(spark, sfDir, "orders"),
      "o_custkey", "o_orderdate",
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))

  /** x336 — pre-exit degradation read: error ppm inside each user's
    * FINAL 3 active days vs all their earlier activity — "was the
    * experience degrading at the end?" as one 2-row comparison, the
    * churn post-mortem cut anchored to each user's OWN last-seen (no
    * calendar constant to go stale). Per-user last-seen rollup joins
    * back user-bounded; no windows. */
  private val x336: Q = (spark, sfDir) => {
    val e = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
    val per = e.groupBy("user_id").agg(max(col("ts")).as("__last"))
    e.join(per, "user_id")
      .withColumn("period",
        when(col("ts") >= col("__last") - expr("INTERVAL 3 DAYS"),
          "final3d").otherwise("earlier"))
      .groupBy("period")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"))
      .select(col("period"), col("n_users"), col("n_events"), col("n_errors"),
        expr("n_errors * 1000000 DIV n_events").as("error_ppm"))
      .orderBy("period")
  }

  /** x337 — supplier quadrant census ([[Analytics.lowerMedianByValue]]
    * ×2): suppliers split on the exact global medians of account balance
    * and shipped-line volume — the 4-cell "cash-rich but idle?" read.
    * Both medians come from value-collapsed cumulative counts (never a
    * row-sized sort) and broadcast back as 1-row frames. */
  private val x337: Q = (spark, sfDir) => {
    val vol = Tables(spark, sfDir, "lineitem")
      .filter(col("l_suppkey").isNotNull)
      .groupBy("l_suppkey").agg(count(lit(1)).as("__v0"))
    val sup = Tables(spark, sfDir, "supplier")
      .select(col("s_suppkey"),
        expr("CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__bal"))
      .join(vol, col("s_suppkey") === col("l_suppkey"), "left")
      .select(col("__bal"), coalesce(col("__v0"), lit(0L)).as("__vol"))
    val mb = Analytics.lowerMedianByValue(sup, Nil, "__bal")
      .select(col("__v").as("__mb"))
    val mv = Analytics.lowerMedianByValue(sup, Nil, "__vol")
      .select(col("__v").as("__mv"))
    sup.crossJoin(broadcast(mb)).crossJoin(broadcast(mv))
      .groupBy(
        when(col("__bal") > col("__mb"), "hi_bal").otherwise("lo_bal")
          .as("balance_side"),
        when(col("__vol") > col("__mv"), "hi_vol").otherwise("lo_vol")
          .as("volume_side"))
      .agg(count(lit(1)).as("n_suppliers"))
      .orderBy("balance_side", "volume_side")
  }

  /** x338 — cross-language vocabulary overlap: pairwise jaccard (exact
    * ppm) of the distinct-token sets per language — shared tokens across
    * langs are code, names, and leaked boilerplate; the matrix says
    * where language-ID will wobble. All joins are vocab-bounded with
    * per-word fanout ≤ |langs|. */
  private val x338: Q = (spark, sfDir) => {
    val lw = docs(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("__w"))
      .filter(col("__w") =!= "").distinct()
    val sz = lw.groupBy("lang").agg(count(lit(1)).as("__n"))
    lw.as("a").join(lw.as("b"),
        col("a.__w") === col("b.__w") && col("a.lang") < col("b.lang"))
      .groupBy(col("a.lang").as("lang_1"), col("b.lang").as("lang_2"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sz.select(col("lang").as("lang_1"), col("__n").as("n_vocab_1")),
        "lang_1")
      .join(sz.select(col("lang").as("lang_2"), col("__n").as("n_vocab_2")),
        "lang_2")
      .select(col("lang_1"), col("lang_2"), col("n_vocab_1"),
        col("n_vocab_2"), col("n_shared"),
        expr("n_shared * 1000000 DIV (n_vocab_1 + n_vocab_2 - n_shared)")
          .as("jaccard_ppm"))
      .orderBy("lang_1", "lang_2")
  }

  /** x339 — nation-brand affinity lift: observed brand share within each
    * nation vs the brand's global share, as exact ppm lift — x243's
    * association heatmap re-denominated in REVENUE. Two-step truncated
    * division (share then lift) keeps every intermediate inside Long on
    * both engines; cells are |nations × brands|-bounded. */
  private val x339: Q = (spark, sfDir) => {
    val cell = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, sfDir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull)
      .groupBy(col("n_name").as("nation"), col("p_brand").as("brand"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("rev_cents"))
    val nt = cell.groupBy("nation").agg(sum(col("rev_cents")).as("__nt"))
    val bt = cell.groupBy("brand").agg(sum(col("rev_cents")).as("__bt"))
    val tot = cell.agg(sum(col("rev_cents")).as("__tot"))
    cell.join(nt, "nation").join(bt, "brand").crossJoin(broadcast(tot))
      .select(col("nation"), col("brand"), col("rev_cents"),
        expr("CAST(CAST(rev_cents AS DECIMAL(38,0)) * 1000000 DIV __nt" +
          " AS BIGINT)").as("obs_share_ppm"),
        expr("CAST(CAST(__bt AS DECIMAL(38,0)) * 1000000 DIV __tot" +
          " AS BIGINT)").as("expected_ppm"))
      .withColumn("lift_ppm",
        expr("obs_share_ppm * 1000000 DIV expected_ppm"))
      .orderBy("nation", "brand")
  }

  /** x340 — bucket balance census: row load per hash bucket (portable
    * md5 hash, k = 32) with deviation from the uniform 1e6 — the check
    * that a bucketed layout (x78) will actually balance BEFORE writing
    * it. |k|-row output; one exchange. */
  private val x340: Q = (spark, sfDir) => {
    val b = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull)
      .select(pmod(graft.operators.PortableHash.hash60(col("o_custkey")),
        lit(32L)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_rows"))
    val tot = b.agg(sum(col("n_rows")).as("__t"))
    b.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_rows"),
        expr("CAST(CAST(n_rows AS DECIMAL(38,0)) * 32000000 DIV __t" +
          " AS BIGINT)").as("load_ppm"))
      .orderBy("bucket")
  }

  /** x341 — error–purchase proximity: share of error events landing
    * within ±1 h of a purchase by the SAME user — the checkout-breakage
    * signal. Banded time join (hour bucket ±1, then the exact µs
    * filter — the x21 pattern on the time axis), so no per-user
    * quadratic pair stream ever forms. */
  private val x341: Q = (spark, sfDir) => {
    val e = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("__t"),
        expr("unix_micros(ts) DIV 3600000000").as("__m"))
    val err = e.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("__t"),
        col("__m").as("__em"))
    val sh = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("__pu"), col("__t").as("__pt"),
        explode(array(col("__m") - 1, col("__m"), col("__m") + 1))
          .as("__pm"))
    val near = err.join(sh,
        col("user_id") === col("__pu") && col("__em") === col("__pm"))
      .filter(abs(col("__t") - col("__pt")) <= 3600000000L)
      .select("event_id").distinct()
    err.agg(count(lit(1)).as("n_errors"))
      .crossJoin(near.agg(count(lit(1)).as("n_near")))
      .select(col("n_errors"), col("n_near"),
        expr("CASE WHEN n_errors > 0 THEN n_near * 1000000 DIV n_errors" +
          " ELSE CAST(0 AS BIGINT) END").as("near_ppm"))
  }

  /** x342 — event-value quantiles by type ([[Analytics.weightedQuantiles]],
    * unit weights): exact p50/p90/p99 of value cents per event type via
    * the weighted cumulative rule — the SLO table for the value stream. */
  private val x342: Q = (spark, sfDir) => {
    val d = Tables(spark, sfDir, "events")
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__vc"))
      .withColumn("__w", lit(1L))
    Analytics.weightedQuantiles(d, "event_type", "__vc", "__w",
        probsPct = Seq(50, 90, 99))
      .select(col("event_type"), col("p_pct"),
        col("q_value").as("value_cents_q"), col("total_weight").as("n_events"))
      .orderBy("event_type", "p_pct")
  }

  /** x343 — region quarterly growth: QoQ revenue growth ppm per region
    * in the positive-ratio spelling (`ratio − 1e6`, so `DIV` and `//`
    * agree) — the planning matrix under x321's brand momentum. Lag
    * window partitions by region over the |quarters|-bounded frame. */
  private val x343: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val cell = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, sfDir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, sfDir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate").isNotNull)
      .groupBy(col("r_name").as("region"),
        trunc(to_date(col("o_orderdate")), "quarter").as("quarter"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("rev_cents"))
    val w = Window.partitionBy("region").orderBy("quarter")
    cell.withColumn("__prev", lag(col("rev_cents"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(col("region"), col("quarter"), col("rev_cents"),
        expr("CAST(CAST(rev_cents AS DECIMAL(38,0)) * 1000000 DIV __prev" +
          " AS BIGINT) - 1000000").as("growth_ppm"))
      .orderBy("region", "quarter")
  }

  /** x344 — dup-similarity histogram: verified near-dup pairs banded by
    * jaccard (5-point bands, FLOOR on both engines — cast-to-int would
    * round in DuckDB) — the threshold-diagnostics view that says whether
    * 0.7 sits in a valley or cuts a mode in half. Eleventh consumer of
    * the LSH pair staging. */
  private val x344: Q = (spark, sfDir) => {
    val b = lshPairs(spark, sfDir)
      .select((floor(col("jaccard") * 20) * 5).cast("int").as("band_pct"))
      .groupBy("band_pct").agg(count(lit(1)).as("n_pairs"))
    val tot = b.agg(sum(col("n_pairs")).as("__t"))
    b.crossJoin(broadcast(tot))
      .select(col("band_pct"), col("n_pairs"),
        expr("n_pairs * 1000000 DIV __t").as("share_ppm"))
      .orderBy("band_pct")
  }

  /** x345 — brand supply concentration: Herfindahl index of each
    * brand's shipped lines across suppliers, exact ppm (Σ share² over
    * ppm shares, floored once) — single-supplier brands read 1e6, the
    * supply-chain-risk companion to x333's dead stock. Supplier cells
    * are |brand × supplier|-bounded; shares broadcast back. */
  private val x345: Q = (spark, sfDir) => {
    val cell = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull && col("l_suppkey").isNotNull)
      .groupBy(col("p_brand").as("brand"), col("l_suppkey"))
      .agg(count(lit(1)).as("__c"))
    val tot = cell.groupBy("brand").agg(sum(col("__c")).as("__t"))
    cell.join(broadcast(tot), "brand")
      .withColumn("__share", expr("__c * 1000000 DIV __t"))
      .groupBy("brand")
      .agg(count(lit(1)).as("n_suppliers"),
        expr("SUM(__share * __share) DIV 1000000").as("hhi_ppm"))
      .orderBy("brand")
  }

  /** x346 — ingest-order composition drift: mean doc length and token
    * count per doc-id decile — "is the corpus we ingested LAST like the
    * one we started with?", the curation drift read that catches a
    * source mix change the per-source stats (x312/x317) average away.
    * One scan + a broadcast max; 10-row output. */
  private val x346: Q = (spark, sfDir) => {
    val mx = docs(spark, sfDir).agg(max(col("doc_id")).as("__mx"))
    docs(spark, sfDir).crossJoin(broadcast(mx))
      .select(least(expr("doc_id * 10 DIV (__mx + 1)"), lit(9L))
          .as("decile"),
        col("n_chars"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("__tok"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        expr("SUM(n_chars) DIV COUNT(1)").as("mean_chars"),
        expr("SUM(__tok) DIV COUNT(1)").as("mean_tokens"))
      .orderBy("decile")
  }

  /** x347 — first-session activation: share of users whose FIRST session
    * (30-min gap rule, x315's sessionizer) contains a purchase — the
    * onboarding north-star as one row. User-partitioned windows only. */
  private val x347: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sess = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("__prev")) > 1800000000L,
        1L).otherwise(0L))
      .withColumn("__sess", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.filter(col("__sess") === 1)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("__act"))
      .agg(count(lit(1)).as("n_users"), sum(col("__act")).as("n_activated"))
      .select(col("n_users"), col("n_activated"),
        expr("n_activated * 1000000 DIV n_users").as("activation_ppm"))
  }

  /** x348 — brand regional spread: each brand's share of regional
    * revenue, zero-filled over the region×brand spine, reduced to
    * min/max/spread ppm — "is this brand a global constant or a local
    * phenomenon?" in one |brands|-row table (x339 keeps nation-level
    * cells; this is the cross-region consistency fold). */
  private val x348: Q = (spark, sfDir) => {
    val cell = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, sfDir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, sfDir, "region")), col("n_regionkey") === col("r_regionkey"))
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull)
      .groupBy(col("r_name").as("region"), col("p_brand").as("brand"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("__c"))
    val rt = cell.groupBy("region").agg(sum(col("__c")).as("__rt"))
    val share = cell.join(rt, "region")
      .select(col("region"), col("brand"),
        expr("CAST(CAST(__c AS DECIMAL(38,0)) * 1000000 DIV __rt" +
          " AS BIGINT)").as("__s"))
    val spine = rt.select("region")
      .crossJoin(broadcast(cell.select("brand").distinct()))
    spine.join(share, Seq("region", "brand"), "left")
      .select(col("brand"), coalesce(col("__s"), lit(0L)).as("__s"))
      .groupBy("brand")
      .agg(count(lit(1)).as("n_regions"), min(col("__s")).as("min_share_ppm"),
        max(col("__s")).as("max_share_ppm"))
      .withColumn("spread_ppm", col("max_share_ppm") - col("min_share_ppm"))
      .orderBy("brand")
  }

  /** x349 — null co-occurrence audit: do two columns go missing
    * TOGETHER (pipeline fault) or independently (organic sparsity)?
    * Actual both-null ppm vs the independence expectation, one scan,
    * one row. Nulls planted by the x94 moduli (37/53) so the path is
    * non-vacuous; coprime moduli should read as independent — a
    * correlated reading here means the plant (or the pipeline) broke. */
  private val x349: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "events")
      .withColumn("value",
        when(col("event_id") % 37 === 0, lit(null)).otherwise(col("value")))
      .withColumn("props",
        when(col("event_id") % 53 === 0, lit(null)).otherwise(col("props")))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("n_null_props"),
        sum(when(col("value").isNull && col("props").isNull, 1L)
          .otherwise(0L)).as("n_null_both"))
      .select(col("n_rows"), col("n_null_value"), col("n_null_props"),
        col("n_null_both"),
        expr("n_null_both * 1000000 DIV n_rows").as("actual_both_ppm"),
        expr("CAST(CAST(n_null_value AS DECIMAL(38,0)) * n_null_props" +
          " * 1000000 DIV (CAST(n_rows AS DECIMAL(38,0)) * n_rows)" +
          " AS BIGINT)").as("expected_both_ppm"))
  }

  /** x350 — whale dependence by nation: revenue share held by customers
    * at or above their nation's exact p80 spend
    * ([[Analytics.weightedQuantiles]], unit weights) — the
    * concentration-risk read per market (x261 classifies items; this
    * measures exposure). Cutoffs broadcast back |nations|-bounded. */
  private val x350: Q = (spark, sfDir) => {
    val spend = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, sfDir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("c_custkey"))
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("__v"))
      .withColumn("__w", lit(1L))
    val cut = Analytics.weightedQuantiles(spend, "nation", "__v", "__w",
        probsPct = Seq(80))
      .select(col("nation"), col("q_value").as("__cut"))
    spend.join(broadcast(cut), "nation")
      .groupBy("nation")
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("__v") >= col("__cut"), 1L).otherwise(0L)).as("n_top"),
        sum(col("__v")).as("rev_cents"),
        sum(when(col("__v") >= col("__cut"), col("__v")).otherwise(0L))
          .as("top_rev_cents"))
      .select(col("nation"), col("n_customers"), col("n_top"),
        col("rev_cents"), col("top_rev_cents"),
        expr("CAST(CAST(top_rev_cents AS DECIMAL(38,0)) * 1000000" +
          " DIV rev_cents AS BIGINT)").as("top_share_ppm"))
      .orderBy("nation")
  }

  /** x351 — brand attach rate: average count of OTHER distinct brands
    * in baskets containing each brand (exact milli) — the bundle-
    * economics number x311's degree census can't give (degree counts
    * partners EVER; attach averages partners PER BASKET). Basket frame
    * collapses once; everything after is |orders × brands-per-order|. */
  private val x351: Q = (spark, sfDir) => {
    val ob = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("l_orderkey").isNotNull && col("p_brand").isNotNull)
      .select(col("l_orderkey").as("__o"), col("p_brand").as("brand"))
      .distinct()
    val bc = ob.groupBy("__o").agg(count(lit(1)).as("__bc"))
    ob.join(bc, "__o")
      .groupBy("brand")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("__bc") - 1).as("__others"))
      .select(col("brand"), col("n_orders"),
        expr("__others * 1000 DIV n_orders").as("attach_milli"))
      .orderBy("brand")
  }

  /** x352 — loyalty streak census: histogram of each customer's LONGEST
    * run of consecutive active months (gaps-and-islands on the month
    * index, x292's machinery at the customer grain) — the
    * habit-formation distribution behind x253's stickiness scalar.
    * Windows partition by customer; the histogram is |streak-lengths|-
    * bounded. */
  private val x352: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val cm = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_custkey"),
        (year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate")))).as("__mi"))
      .distinct()
    val w = Window.partitionBy("o_custkey").orderBy("__mi")
    cm.withColumn("__grp", col("__mi") - row_number().over(w))
      .groupBy("o_custkey", "__grp").agg(count(lit(1)).as("__len"))
      .groupBy("o_custkey").agg(max(col("__len")).as("streak_months"))
      .groupBy("streak_months").agg(count(lit(1)).as("n_customers"))
      .orderBy("streak_months")
  }

  /** x353 — template family census: docs grouped by their first-5-token
    * prefix; families with ≥ 2 members are templated/boilerplate
    * content the shingle dedup may keep (tails differ) — the histogram
    * says how much of the corpus opens from a mold. One scan, prefix
    * collapse, |family-sizes|-bounded output. */
  private val x353: Q = (spark, sfDir) => {
    val fam = docs(spark, sfDir)
      .select(expr("array_join(slice(split(text, ' '), 1, 5), ' ')")
        .as("__pfx"))
      .groupBy("__pfx").agg(count(lit(1)).as("fam_size"))
    fam.groupBy("fam_size")
      .agg(count(lit(1)).as("n_families"),
        sum(col("fam_size")).as("n_docs"))
      .orderBy("fam_size")
  }

  /** x354 — post-large-order gap: mean days to the NEXT order after a
    * top-quartile order vs after a regular one — "does a big purchase
    * satiate?" in two rows. The p75 cutoff is the exact weighted
    * quantile over value-collapsed counts (one broadcast row); gap
    * windows partition by customer. */
  private val x354: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val o = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("__d"),
        col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
    val cut = Analytics.weightedQuantiles(
        o.withColumn("__grp", lit("all")).withColumn("__w", lit(1L)),
        "__grp", "__c", "__w", probsPct = Seq(75))
      .select(col("q_value").as("__cut"))
    val w = Window.partitionBy("o_custkey").orderBy("__d", "o_orderkey")
    o.withColumn("__next", lead(col("__d"), 1).over(w))
      .filter(col("__next").isNotNull)
      .crossJoin(broadcast(cut))
      .select(
        when(col("__c") >= col("__cut"), "large").otherwise("regular")
          .as("order_class"),
        datediff(col("__next"), col("__d")).cast("long").as("__gap"))
      .groupBy("order_class")
      .agg(count(lit(1)).as("n_orders"),
        expr("SUM(__gap) * 1000 DIV COUNT(1)").as("mean_gap_milli_days"))
      .orderBy("order_class")
  }

  /** x355 — corpus sourcing independence ([[Analytics.chiSquareAudit]]
    * on lang × source): which (language, source) cells are over/under
    * represented vs independence — the corpus-balance companion to
    * x243's warehouse-side audit; a training mixture inherits every
    * residual shown here. */
  private val x355: Q = (spark, sfDir) =>
    Analytics.chiSquareAudit(docs(spark, sfDir), "lang", "source")

  /** x356 — ship-delay quantiles by priority
    * ([[Analytics.weightedQuantiles]], unit weights): exact p50/p90/p99
    * of order-to-ship days per priority — the distribution behind
    * x192's mean lag; the p99 is the promise the mean hides. */
  private val x356: Q = (spark, sfDir) => {
    val d = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderpriority").isNotNull && col("l_shipdate").isNotNull &&
        col("o_orderdate").isNotNull)
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("__dl"))
      .withColumn("__w", lit(1L))
    Analytics.weightedQuantiles(d, "o_orderpriority", "__dl", "__w",
        probsPct = Seq(50, 90, 99))
      .select(col("o_orderpriority"), col("p_pct"),
        col("q_value").as("delay_days_q"), col("total_weight").as("n_lines"))
      .orderBy("o_orderpriority", "p_pct")
  }

  /** x357 — event-type audience overlap: pairwise jaccard (exact ppm)
    * of the distinct-user sets per event type — "is the error audience
    * the purchase audience?" as a 10-cell matrix; x338's machinery
    * pointed at behavior instead of vocabulary. User-set joins fan by
    * ≤ |types| per user. */
  private val x357: Q = (spark, sfDir) => {
    val ut = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), col("user_id")).distinct()
    val sz = ut.groupBy("event_type").agg(count(lit(1)).as("__n"))
    ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_1"),
        col("b.event_type").as("type_2"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sz.select(col("event_type").as("type_1"), col("__n").as("n_users_1")),
        "type_1")
      .join(sz.select(col("event_type").as("type_2"), col("__n").as("n_users_2")),
        "type_2")
      .select(col("type_1"), col("type_2"), col("n_users_1"),
        col("n_users_2"), col("n_shared"),
        expr("n_shared * 1000000 DIV (n_users_1 + n_users_2 - n_shared)")
          .as("jaccard_ppm"))
      .orderBy("type_1", "type_2")
  }

  /** x358 — monthly return-rate trend: returned-line ppm per ship
    * month — the ops timeline behind x313's supplier census and x299's
    * brand ranking; a step here is a batch problem, a drift is a
    * quality problem. One scan, |months|-bounded. */
  private val x358: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate").isNotNull && col("l_returnflag").isNotNull)
      .groupBy(trunc(to_date(col("l_shipdate")), "month").as("month"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returns"))
      .select(col("month"), col("n_lines"), col("n_returns"),
        expr("n_returns * 1000000 DIV n_lines").as("return_ppm"))
      .orderBy("month")
  }

  /** x359 — reactivation order value: mean order cents for first orders,
    * reactivation orders (≥ 180 days since the previous), and regular
    * reorders — "do returners come back bigger?" in three rows; the
    * win-back economics behind x260's half-life. Customer-partitioned
    * lag only. */
  private val x359: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("__d", "o_orderkey")
    Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("__d"),
        col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
      .withColumn("__prev", lag(col("__d"), 1).over(w))
      .select(
        when(col("__prev").isNull, "1_first")
          .when(datediff(col("__d"), col("__prev")) >= 180, "2_reactivation")
          .otherwise("3_regular").as("order_class"),
        col("__c"))
      .groupBy("order_class")
      .agg(count(lit(1)).as("n_orders"),
        expr("SUM(__c) DIV COUNT(1)").as("mean_cents"))
      .orderBy("order_class")
  }

  /** x360 — vector sparsity census: share of near-zero components
    * (|x| < 0.01) per label — dead dimensions are free compression and
    * a training-signal warning; threshold counting keeps the float math
    * in exact comparisons (no FP accumulation to drift cross-engine).
    * Row-local lambda, |labels|-bounded aggregate. */
  private val x360: Q = (spark, sfDir) => {
    emb(spark, sfDir)
      .filter(col("label").isNotNull && col("embedding").isNotNull)
      .select(col("label"),
        size(col("embedding")).cast("long").as("__dim"),
        expr("size(filter(embedding, x -> abs(x) < 0.01))").cast("long")
          .as("__nz"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"), sum(col("__dim")).as("n_components"),
        sum(col("__nz")).as("n_near_zero"))
      .select(col("label"), col("n_vecs"), col("n_components"),
        col("n_near_zero"),
        expr("n_near_zero * 1000000 DIV n_components").as("sparsity_ppm"))
      .orderBy("label")
  }

  /** x361 — dimension sign agreement: ppm of vectors where dimension
    * pairs (of the first four) share a sign — the integer-safe
    * correlation proxy (a high-agreement pair is redundant capacity;
    * FP covariance would drift cross-engine, sign counting cannot).
    * One scan to a single row, stacked to 6 pair rows. */
  private val x361: Q = (spark, sfDir) => {
    val pairs = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    val e = emb(spark, sfDir)
      .filter(col("embedding").isNotNull && size(col("embedding")) >= 4)
      .select((1 to 4).map(i =>
        (element_at(col("embedding"), i) > 0d).cast("long").as(s"__s$i")): _*)
    val aggs = count(lit(1)).as("__n") +: pairs.map { case (i, j) =>
      sum((col(s"__s$i") === col(s"__s$j")).cast("long")).as(s"__a${i}_$j")
    }
    val stacked = pairs.map { case (i, j) => s"'${i}_$j', __a${i}_$j" }
      .mkString(", ")
    e.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"),
        expr(s"stack(${pairs.size}, $stacked) AS (dim_pair, n_agree)"))
      .select(col("dim_pair"), col("n_agree"), col("__n").as("n_vecs"),
        expr("n_agree * 1000000 DIV __n").as("agree_ppm"))
      .orderBy("dim_pair")
  }

  /** x362 — catalog hierarchy rollup: revenue ROLLUP over the
    * type → brand catalog hierarchy with grand/subtotal rows reading
    * 'ALL' — the merchandising pivot b09's rollup surface exists for. */
  private val x362: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem").createOrReplaceTempView("x362_lineitem")
    Tables(spark, sfDir, "part").createOrReplaceTempView("x362_part")
    spark.sql(
      """SELECT COALESCE(t1, 'ALL') AS type_1, COALESCE(t2, 'ALL') AS type_2,
        |  COUNT(*) AS n_lines, SUM(c) AS rev_cents
        |FROM (SELECT p_type AS t1, p_brand AS t2,
        |   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM x362_lineitem JOIN x362_part ON l_partkey = p_partkey
        |  WHERE p_type IS NOT NULL AND p_brand IS NOT NULL)
        |GROUP BY ROLLUP (t1, t2)
        |ORDER BY type_1, type_2""".stripMargin)
  }

  /** x363 — brand loyalty depth census: customers banded by the share
    * of their lines spent on their SINGLE favourite brand (10% ppm
    * bands) — the loyalty distribution x351's attach rate is the dual
    * of. Per-customer frames collapse to (customer, brand) counts;
    * everything after is customer-bounded. */
  private val x363: Q = (spark, sfDir) => {
    val cb = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("o_custkey").isNotNull && col("p_brand").isNotNull)
      .groupBy(col("o_custkey"), col("p_brand"))
      .agg(count(lit(1)).as("__c"))
    val per = cb.groupBy("o_custkey")
      .agg(sum(col("__c")).as("__t"), max(col("__c")).as("__m"))
      .select(expr("__m * 1000000 DIV __t").as("__ppm"))
    val b = per
      .groupBy(expr("__ppm DIV 100000").cast("int").as("loyalty_band"))
      .agg(count(lit(1)).as("n_customers"))
    val tot = b.agg(sum(col("n_customers")).as("__n"))
    b.crossJoin(broadcast(tot))
      .select(col("loyalty_band"), col("n_customers"),
        expr("n_customers * 1000000 DIV __n").as("share_ppm"))
      .orderBy("loyalty_band")
  }

  /** x364 — order consolidation census: orders by how many DISTINCT
    * suppliers fulfil them — the split-fulfilment histogram logistics
    * pays for (x290 counts split shipments in TIME; this counts them in
    * SOURCING). Distinct collapse then |orders|-bounded counts. */
  private val x364: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .filter(col("l_orderkey").isNotNull && col("l_suppkey").isNotNull)
      .select("l_orderkey", "l_suppkey").distinct()
      .groupBy("l_orderkey").agg(count(lit(1)).as("n_suppliers"))
      .groupBy("n_suppliers").agg(count(lit(1)).as("n_orders"))
      .orderBy("n_suppliers")
  }

  /** x365 — order line-concentration census: orders banded by the share
    * of order value sitting in their single LARGEST line (10% ppm
    * bands) — near-1e6 means "one real item plus trinkets", the basket
    * twin of x363's brand loyalty. Order-bounded aggregates only. */
  private val x365: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .filter(col("l_orderkey").isNotNull)
      .groupBy("l_orderkey")
      .agg(sum(expr(
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("__t"),
        max(expr(
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("__m"))
      .select(expr("CAST(CAST(__m AS DECIMAL(38,0)) * 1000000 DIV __t" +
        " AS BIGINT)").as("__ppm"))
      .groupBy(expr("__ppm DIV 100000").cast("int").as("concentration_band"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("concentration_band")
  }

  /** x366 — dup rate by length band: share of docs with a verified
    * near-dup, per log2(n_chars) band — "is duplication a long-doc or
    * short-doc disease?", the decision input for length-stratified
    * dedup. Bit-length banding (exact, no float log); twelfth consumer
    * of the LSH pair staging. */
  private val x366: Q = (spark, sfDir) => {
    val dup = lshPairs(spark, sfDir)
      .select(explode(array(col("d1"), col("d2"))).as("doc_id")).distinct()
      .withColumn("__isdup", lit(1L))
    docs(spark, sfDir)
      .filter(col("n_chars") > 0)
      .join(dup, Seq("doc_id"), "left")
      .select(expr("CAST(length(bin(n_chars)) - 1 AS INT)").as("len_band"),
        coalesce(col("__isdup"), lit(0L)).as("__d"))
      .groupBy("len_band")
      .agg(count(lit(1)).as("n_docs"), sum(col("__d")).as("n_dup"))
      .select(col("len_band"), col("n_docs"), col("n_dup"),
        expr("n_dup * 1000000 DIV n_docs").as("dup_ppm"))
      .orderBy("len_band")
  }

  /** x367 — digit-density outliers: the 20 most table-like documents
    * (highest digit ppm) — the review queue a text-quality gate
    * produces; x317 profiles sources, this NAMES the offenders.
    * TakeOrdered top-k, doc-id tie-break. */
  private val x367: Q = (spark, sfDir) => {
    docs(spark, sfDir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        length(regexp_replace(col("text"), "[^0-9]", "")).cast("long")
          .as("__d"))
      .select(col("doc_id"), col("n_chars"),
        expr("__d * 1000000 DIV n_chars").as("digit_ppm"))
      .orderBy(col("digit_ppm").desc, col("doc_id"))
      .limit(20)
  }

  /** x368 — shared-supplier exposure: pairwise jaccard of brand supplier
    * sets (exact ppm) — two brands with high overlap fail TOGETHER when
    * a supplier does; x345 scores one brand's concentration, this maps
    * the correlated risk. Supplier-set joins fan by ≤ |brands| per
    * supplier. */
  private val x368: Q = (spark, sfDir) => {
    val bs = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull && col("l_suppkey").isNotNull)
      .select(col("p_brand").as("brand"), col("l_suppkey")).distinct()
    val sz = bs.groupBy("brand").agg(count(lit(1)).as("__n"))
    bs.as("a").join(bs.as("b"),
        col("a.l_suppkey") === col("b.l_suppkey") &&
          col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("brand_1"), col("b.brand").as("brand_2"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sz.select(col("brand").as("brand_1"), col("__n").as("n_sup_1")),
        "brand_1")
      .join(sz.select(col("brand").as("brand_2"), col("__n").as("n_sup_2")),
        "brand_2")
      .select(col("brand_1"), col("brand_2"), col("n_sup_1"),
        col("n_sup_2"), col("n_shared"),
        expr("n_shared * 1000000 DIV (n_sup_1 + n_sup_2 - n_shared)")
          .as("jaccard_ppm"))
      .orderBy("brand_1", "brand_2")
  }

  /** x369 — basket-size mode by segment: the most COMMON order line
    * count per market segment (x318's portable count-collapse +
    * max(struct) mode, tie → smallest) — the "typical basket" a mean
    * would misstate on a skewed distribution. */
  private val x369: Q = (spark, sfDir) => {
    val sz = Tables(spark, sfDir, "lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("__sz"))
    val c = sz
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("__sz"))
      .agg(count(lit(1)).as("__c"))
    c.groupBy("segment")
      .agg(max(struct(col("__c"), (-col("__sz")).as("__ns"))).as("__m"),
        sum(col("__c")).as("n_orders"))
      .select(col("segment"), (-col("__m.__ns")).as("mode_basket_size"),
        col("__m.__c").as("n_mode"), col("n_orders"))
      .orderBy("segment")
  }

  /** x370 — basket-size economics: order value and value-per-line by
    * basket line count — is basket value superlinear (attach-driven) or
    * dilutive? Order frame collapses once; |sizes|-bounded output. */
  private val x370: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .filter(col("l_orderkey").isNotNull)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("__n"),
        sum(expr(
          "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("__t"))
      .groupBy(col("__n").as("basket_lines"))
      .agg(count(lit(1)).as("n_orders"), sum(col("__t")).as("__tc"),
        sum(col("__n")).as("__tl"))
      .select(col("basket_lines"), col("n_orders"),
        expr("__tc DIV n_orders").as("mean_order_cents"),
        expr("__tc DIV __tl").as("mean_line_cents"))
      .orderBy("basket_lines")
  }

  /** x371 — dup quality gap: mean quality score (exact floored milli)
    * for near-duplicated vs clean docs — "is duplication a low-quality
    * disease?", the second axis of x366's length cut. FLOOR before the
    * integer mean (a bare cast would round in DuckDB); thirteenth
    * consumer of the LSH pair staging. */
  private val x371: Q = (spark, sfDir) => {
    val dup = lshPairs(spark, sfDir)
      .select(explode(array(col("d1"), col("d2"))).as("doc_id")).distinct()
      .withColumn("__isdup", lit(1L))
    docs(spark, sfDir)
      .join(dup, Seq("doc_id"), "left")
      .select(
        when(col("__isdup").isNotNull, "dup").otherwise("clean").as("cohort"),
        floor(TextAnalysis.qualityScore(col("text")) * 1000).as("__q"))
      .groupBy("cohort")
      .agg(count(lit(1)).as("n_docs"),
        expr("SUM(__q) DIV COUNT(1)").as("mean_quality_milli"))
      .orderBy("cohort")
  }

  /** x372 — conversion by first touch: purchase-conversion ppm keyed by
    * each user's FIRST-ever event type — the acquisition-quality read
    * x250's mix and x308's latency bracket from either side. One keyed
    * min(struct) for the first touch, one flag aggregate. */
  private val x372: Q = (spark, sfDir) => {
    val e = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
    e.groupBy("user_id")
      .agg(min(struct(col("ts"), col("event_id"), col("event_type").as("et")))
          .as("__f"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("__conv"))
      .groupBy(col("__f.et").as("first_touch"))
      .agg(count(lit(1)).as("n_users"), sum(col("__conv")).as("n_converted"))
      .select(col("first_touch"), col("n_users"), col("n_converted"),
        expr("n_converted * 1000000 DIV n_users").as("conversion_ppm"))
      .orderBy("first_touch")
  }

  /** x373 — token position profile: mean token length (exact milli) by
    * token POSITION (first 20) — openings are headers/IDs in templated
    * corpora and ordinary prose in clean ones; the positional read
    * x353's prefix families aggregate away. One posexplode scan,
    * 20-row output. */
  private val x373: Q = (spark, sfDir) => {
    docs(spark, sfDir)
      .select(posexplode(split(col("text"), " ")).as(Seq("__p", "__t")))
      .filter(col("__t") =!= "" && col("__p") < 20)
      .groupBy((col("__p") + 1).as("position"))
      .agg(count(lit(1)).as("n_tokens"),
        expr("SUM(length(__t)) * 1000 DIV COUNT(1)").as("mean_len_milli"))
      .orderBy("position")
  }

  /** x374 — discount calendar: exact mean discount ppm per order month
    * — the promo-cadence timeline (x323 reads the quantity ladder; this
    * reads TIME). DECIMAL(8,6) staging as in x323. */
  private val x374: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_discount").isNotNull && col("o_orderdate").isNotNull)
      .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month"))
      .agg(count(lit(1)).as("n_lines"),
        expr("SUM(CAST(CAST(l_discount AS DECIMAL(8,6)) * 1000000" +
          " AS BIGINT)) DIV COUNT(1)").as("mean_discount_ppm"))
      .orderBy("month")
  }

  /** x375 — purchase value progression: mean purchase value by the
    * user's k-th purchase (k ≤ 10) — "do users spend MORE as they
    * mature?", the per-event dual of x335's yearly decile migration.
    * Row-number window partitions by user. */
  private val x375: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
      .withColumn("__k", row_number().over(w))
      .filter(col("__k") <= 10)
      .groupBy(col("__k").as("purchase_index"))
      .agg(count(lit(1)).as("n_purchases"),
        expr("SUM(__c) DIV COUNT(1)").as("mean_value_cents"))
      .orderBy("purchase_index")
  }

  /** x376 — language misfile queue: the first 20 documents whose
    * heuristic language ID disagrees with their label — x08 counts the
    * confusion; this NAMES rows for review (the queue a labeling fix
    * starts from). Deterministic doc-id order. */
  private val x376: Q = (spark, sfDir) => {
    docs(spark, sfDir)
      .withColumn("predicted", TextAnalysis.langIdHeuristic(col("text")))
      .filter(col("predicted") =!= col("lang"))
      .select(col("doc_id"), col("lang"), col("predicted"))
      .orderBy("doc_id")
      .limit(20)
  }

  /** x377 — source language purity: distinct languages per source and
    * the top-language share (ppm) — a "multilingual" source is often
    * two feeds glued together; the purity number says whether per-source
    * language models are safe. Vocabulary-bounded collapses only. */
  private val x377: Q = (spark, sfDir) => {
    val ls = docs(spark, sfDir)
      .filter(col("source").isNotNull && col("lang").isNotNull)
      .groupBy("source", "lang").agg(count(lit(1)).as("__c"))
    ls.groupBy("source")
      .agg(count(lit(1)).as("n_langs"), sum(col("__c")).as("n_docs"),
        max(col("__c")).as("__m"))
      .select(col("source"), col("n_langs"), col("n_docs"),
        expr("__m * 1000000 DIV n_docs").as("top_lang_ppm"))
      .orderBy("source")
  }

  /** x378 — customer value maturation: total FIRST-order vs LAST-order
    * cents across repeat customers, with the lift in the positive-ratio
    * spelling — "does the book grow its customers?" as one row (x375
    * reads the per-event curve; this is the orders-side bookend).
    * Keyed min/max(struct) — no windows at all. */
  private val x378: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("__d"),
        col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("__n"),
        min(struct(col("__d"), col("o_orderkey"), col("__c").as("c")))
          .as("__f"),
        max(struct(col("__d"), col("o_orderkey"), col("__c").as("c")))
          .as("__l"))
      .filter(col("__n") >= 2)
      .agg(count(lit(1)).as("n_repeat_customers"),
        sum(col("__f.c")).as("first_cents_total"),
        sum(col("__l.c")).as("last_cents_total"))
      .select(col("n_repeat_customers"), col("first_cents_total"),
        col("last_cents_total"),
        expr("CAST(CAST(last_cents_total AS DECIMAL(38,0)) * 1000000" +
          " DIV first_cents_total AS BIGINT) - 1000000").as("lift_ppm"))
  }

  /** x379 — label × language matrix: embedding cluster labels crossed
    * with document language over the vec_id↔doc_id bridge (x304's
    * contract) — label-language correlation means the "semantic"
    * clusters are really language clusters, the classic embedding-QA
    * trap. |labels × langs| cells with row shares. */
  private val x379: Q = (spark, sfDir) => {
    val cell = emb(spark, sfDir)
      .select(col("vec_id").as("doc_id"), col("label"))
      .join(docs(spark, sfDir).select(col("doc_id"), col("lang")), "doc_id")
      .filter(col("label").isNotNull && col("lang").isNotNull)
      .groupBy("lang", "label").agg(count(lit(1)).as("n_docs"))
    val rt = cell.groupBy("lang").agg(sum(col("n_docs")).as("__t"))
    cell.join(rt, "lang")
      .select(col("lang"), col("label"), col("n_docs"),
        expr("n_docs * 1000000 DIV __t").as("lang_share_ppm"))
      .orderBy("lang", "label")
  }

  /** x380 — whale leaderboard: top-5 customers by lifetime revenue with
    * nation context — the account-review shortlist; plans as TakeOrdered
    * over the customer rollup, never a global sort. */
  private val x380: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull)
      .groupBy("o_custkey")
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("rev_cents"), count(lit(1)).as("n_orders"))
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, sfDir, "nation")
        .select(col("n_nationkey"), col("n_name").as("nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("nation"),
        col("n_orders"), col("rev_cents"))
      .orderBy(col("rev_cents").desc, col("c_custkey"))
      .limit(5)
  }

  /** x381 — week-over-week volatility: mean |WoW| revenue change in ppm
    * over the ISO-week series (both engines truncate weeks to Monday) —
    * the one-number noise floor an anomaly alert must clear (x327 ranges
    * per brand; this is the global pulse). Lag rides the |weeks| spine. */
  private val x381: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val wk = Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .groupBy(trunc(to_date(col("o_orderdate")), "week").as("week"))
      .agg(sum(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("__c"))
    wk.withColumn("__prev", lag(col("__c"), 1).over(Window.orderBy("week")))
      .filter(col("__prev").isNotNull)
      .select(expr("CAST(CAST(abs(__c - __prev) AS DECIMAL(38,0))" +
        " * 1000000 DIV __prev AS BIGINT)").as("__chg"))
      .agg(count(lit(1)).as("n_weeks"),
        expr("SUM(__chg) DIV COUNT(1)").as("mean_abs_wow_ppm"))
  }

  /** x382 — token stutter census: docs by their LONGEST run of the same
    * consecutive token (gaps-and-islands over token positions) — the
    * degenerate-repetition detector (x23 measures global repetition;
    * loops are CONSECUTIVE and need the run view). Windows partition by
    * document. */
  private val x382: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("__p")
    val toks = docs(spark, sfDir)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("__p", "__t")))
      .filter(col("__t") =!= "")
    toks
      .withColumn("__new", when(lag(col("__t"), 1).over(w).isNull ||
        lag(col("__t"), 1).over(w) =!= col("__t"), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "__run").agg(count(lit(1)).as("__len"))
      .groupBy("doc_id").agg(max(col("__len")).as("max_run"))
      .groupBy("max_run").agg(count(lit(1)).as("n_docs"))
      .orderBy("max_run")
  }

  /** x383 — weekpart revenue split: weekday vs weekend order count and
    * revenue with mean order value — the staffing/capacity 2-row read;
    * ISO dow spelled portably ((dayofweek+5)%7+1 ↔ isodow). */
  private val x383: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(
        when(expr("(dayofweek(CAST(o_orderdate AS DATE)) + 5) % 7 + 1") >= 6,
          "weekend").otherwise("weekday").as("weekpart"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
      .groupBy("weekpart")
      .agg(count(lit(1)).as("n_orders"), sum(col("__c")).as("rev_cents"))
      .select(col("weekpart"), col("n_orders"), col("rev_cents"),
        expr("rev_cents DIV n_orders").as("mean_order_cents"))
      .orderBy("weekpart")
  }

  /** x384 — embedding sign balance by ingest decile: share of positive
    * components per vec-id decile — a drifting sign balance across
    * ingest order means the embedding model (or its normalization)
    * changed mid-corpus; x346's drift read for the vector side.
    * Integer counting only. */
  private val x384: Q = (spark, sfDir) => {
    val mx = emb(spark, sfDir).agg(max(col("vec_id")).as("__mx"))
    emb(spark, sfDir)
      .filter(col("embedding").isNotNull)
      .crossJoin(broadcast(mx))
      .select(least(expr("vec_id * 10 DIV (__mx + 1)"), lit(9L))
          .as("decile"),
        size(col("embedding")).cast("long").as("__dim"),
        expr("size(filter(embedding, x -> x > 0))").cast("long").as("__pos"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_vecs"), sum(col("__dim")).as("n_components"),
        sum(col("__pos")).as("n_positive"))
      .select(col("decile"), col("n_vecs"), col("n_components"),
        col("n_positive"),
        expr("n_positive * 1000000 DIV n_components").as("positive_ppm"))
      .orderBy("decile")
  }

  /** x385 — return rate by price band: returned-line ppm per log2 price
    * band — "are expensive items returned more?", the price axis of the
    * x358/x299/x313 return family. Bit-length banding, one scan. */
  private val x385: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .filter(col("l_extendedprice").isNotNull && col("l_returnflag").isNotNull)
      .select(expr("CAST(length(bin(CAST(CAST(l_extendedprice" +
          " AS DECIMAL(18,2)) * 100 AS BIGINT))) - 1 AS INT)")
          .as("price_band"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("__r"))
      .groupBy("price_band")
      .agg(count(lit(1)).as("n_lines"), sum(col("__r")).as("n_returns"))
      .select(col("price_band"), col("n_lines"), col("n_returns"),
        expr("n_returns * 1000000 DIV n_lines").as("return_ppm"))
      .orderBy("price_band")
  }

  /** x386 — attention concentration ([[Analytics.revenueConcentration]]
    * over per-user event counts): exact-rank deciles and Gini of user
    * activity — how much of the event stream a few power users own; the
    * behavioral twin of x173's revenue Gini. */
  private val x386: Q = (spark, sfDir) =>
    Analytics.revenueConcentration(
      Tables(spark, sfDir, "events")
        .filter(col("user_id").isNotNull)
        .groupBy("user_id").agg(count(lit(1)).as("__n")),
      "user_id", col("__n"))

  /** x387 — supplier activity census: suppliers by how many DISTINCT
    * ship months they were active — the consistency histogram behind
    * x313's quality bands (a 1-month supplier isn't a partner, it's a
    * spot buy). Distinct collapse, |suppliers|-bounded counts. */
  private val x387: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .filter(col("l_suppkey").isNotNull && col("l_shipdate").isNotNull)
      .select(col("l_suppkey"),
        trunc(to_date(col("l_shipdate")), "month").as("__m"))
      .distinct()
      .groupBy("l_suppkey").agg(count(lit(1)).as("active_months"))
      .groupBy("active_months").agg(count(lit(1)).as("n_suppliers"))
      .orderBy("active_months")
  }

  /** x388 — reliability by hour: error ppm per hour of day — "does the
    * system degrade under load?" (x334 shapes traffic; this shapes
    * FAILURE). One scan, 24 cells. */
  private val x388: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(hour(col("ts")).as("hh"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("n_errors"))
      .select(col("hh"), col("n_events"), col("n_errors"),
        expr("n_errors * 1000000 DIV n_events").as("error_ppm"))
      .orderBy("hh")
  }

  /** x389 — size-value curve: catalog count and mean retail cents per
    * part size — does the price ladder track the size ladder? One scan
    * of the part dim, |sizes|-bounded. */
  private val x389: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "part")
      .filter(col("p_size").isNotNull && col("p_retailprice").isNotNull)
      .groupBy(col("p_size"))
      .agg(count(lit(1)).as("n_parts"),
        expr("SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100" +
          " AS BIGINT)) DIV COUNT(1)").as("mean_retail_cents"))
      .orderBy("p_size")
  }

  /** x390 — market mix drift ([[Analytics.categoricalMixDrift]], third
    * consumer): year-over-year L1 distance of the customer-NATION order
    * mix — is the business quietly changing geography? Nation dim
    * broadcast before the drift collapse. */
  private val x390: Q = (spark, sfDir) =>
    Analytics.categoricalMixDrift(
      Tables(spark, sfDir, "orders")
        .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(spark, sfDir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .filter(col("o_orderdate").isNotNull)
        .select(year(to_date(col("o_orderdate"))).as("yr"), col("n_name")),
      "yr", "n_name")

  /** x391 — doc-length quantiles by source
    * ([[Analytics.weightedQuantiles]], unit weights): exact p50/p90 of
    * n_chars per source — the corpus shape sheet next to x317's
    * character mix. */
  private val x391: Q = (spark, sfDir) => {
    val d = docs(spark, sfDir)
      .filter(col("source").isNotNull && col("n_chars").isNotNull)
      .select(col("source"), col("n_chars"))
      .withColumn("__w", lit(1L))
    Analytics.weightedQuantiles(d, "source", "n_chars", "__w",
        probsPct = Seq(50, 90))
      .select(col("source"), col("p_pct"),
        col("q_value").as("n_chars_q"), col("total_weight").as("n_docs"))
      .orderBy("source", "p_pct")
  }

  /** x392 — reorder-gap spectrum ([[Analytics.log2Histogram]]): customer
    * inter-order gaps (days ≥ 1) in exponentially widening buckets — the
    * nine-orders-of-magnitude view behind x316's per-segment quartiles;
    * same-day reorders (gap 0) are excluded by the log2 domain, stated
    * not hidden. */
  private val x392: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("__d", "o_orderkey")
    val gaps = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("__d"),
        col("o_orderkey"))
      .withColumn("__prev", lag(col("__d"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(datediff(col("__d"), col("__prev")).cast("long").as("gap"))
    Analytics.log2Histogram(gaps, col("gap"))
  }

  /** x393 — balance-band repeat rate: does a negative account balance
    * predict one-and-done customers? Repeat ppm per balance band —
    * x324's bands re-scored on RETENTION instead of volume. */
  private val x393: Q = (spark, sfDir) => {
    val po = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull)
      .groupBy("o_custkey").agg(count(lit(1)).as("__no"))
    Tables(spark, sfDir, "customer")
      .select(col("c_custkey"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__b"))
      .join(po, col("c_custkey") === col("o_custkey"), "left")
      .select(
        when(col("__b") < 0, "1_negative")
          .when(col("__b") < 500000L, "2_low").otherwise("3_high")
          .as("bal_band"),
        coalesce(col("__no"), lit(0L)).as("__no"))
      .groupBy("bal_band")
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("__no") >= 2, 1L).otherwise(0L)).as("n_repeat"))
      .select(col("bal_band"), col("n_customers"), col("n_repeat"),
        expr("n_repeat * 1000000 DIV n_customers").as("repeat_ppm"))
      .orderBy("bal_band")
  }

  /** x394 — region assortment breadth: distinct parts sold per region
    * and the share of the whole catalog that represents — thin regional
    * assortments cap cross-sell before marketing ever could. Distinct
    * collapse, |regions|-row output, catalog total broadcast. */
  private val x394: Q = (spark, sfDir) => {
    val rp = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, sfDir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(spark, sfDir, "region")), col("n_regionkey") === col("r_regionkey"))
      .filter(col("l_partkey").isNotNull)
      .select(col("r_name").as("region"), col("l_partkey")).distinct()
    val cat = Tables(spark, sfDir, "part").agg(count(lit(1)).as("__cat"))
    rp.groupBy("region").agg(count(lit(1)).as("n_distinct_parts"))
      .crossJoin(broadcast(cat))
      .select(col("region"), col("n_distinct_parts"),
        expr("n_distinct_parts * 1000000 DIV __cat").as("catalog_ppm"))
      .orderBy("region")
  }

  /** x395 — weekday discount profile: exact mean discount ppm per ISO
    * weekday — a visible weekly pricing rhythm means a promo engine is
    * calendar-driven; flat means it's inventory-driven. Portable ISO dow
    * spelling; 7-row output. */
  private val x395: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_discount").isNotNull && col("o_orderdate").isNotNull)
      .groupBy(expr("(dayofweek(CAST(o_orderdate AS DATE)) + 5) % 7 + 1")
        .as("iso_dow"))
      .agg(count(lit(1)).as("n_lines"),
        expr("SUM(CAST(CAST(l_discount AS DECIMAL(8,6)) * 1000000" +
          " AS BIGINT)) DIV COUNT(1)").as("mean_discount_ppm"))
      .orderBy("iso_dow")
  }

  /** x396 — user engagement quadrants ([[Analytics.lowerMedianByValue]]
    * ×2): users split on the exact medians of lifespan (days between
    * first and last event) and event count — tourists, loyalists,
    * binge-and-churn, and slow-burn in one 4-cell census; x337's
    * quadrant read pointed at people. */
  private val x396: Q = (spark, sfDir) => {
    // NOTE: the count column must NOT be named __n — lowerMedianByValue
    // uses __n internally for the group total and would shadow the value.
    val per = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("__cnt"),
        datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
          .cast("long").as("__span"))
    val ms = Analytics.lowerMedianByValue(per, Nil, "__span")
      .select(col("__v").as("__ms"))
    val mn = Analytics.lowerMedianByValue(per, Nil, "__cnt")
      .select(col("__v").as("__mn"))
    per.crossJoin(broadcast(ms)).crossJoin(broadcast(mn))
      .groupBy(
        when(col("__span") > col("__ms"), "long_span").otherwise("short_span")
          .as("span_side"),
        when(col("__cnt") > col("__mn"), "hi_events").otherwise("lo_events")
          .as("volume_side"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("span_side", "volume_side")
  }

  /** x397 — brand premium index: mean line price per brand vs the
    * global mean line price, as exact ppm — who actually commands a
    * premium (x331 measures realization vs list; this positions brands
    * against each OTHER). Global mean broadcast as one row. */
  private val x397: Q = (spark, sfDir) => {
    val li = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull && col("l_extendedprice").isNotNull)
      .select(col("p_brand").as("brand"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
    val g = li.agg(expr("SUM(__c) DIV COUNT(1)").as("__gm"))
    li.groupBy("brand")
      .agg(count(lit(1)).as("n_lines"),
        expr("SUM(__c) DIV COUNT(1)").as("mean_line_cents"))
      .crossJoin(broadcast(g))
      .select(col("brand"), col("n_lines"), col("mean_line_cents"),
        expr("CAST(CAST(mean_line_cents AS DECIMAL(38,0)) * 1000000" +
          " DIV __gm AS BIGINT)").as("premium_ppm"))
      .orderBy("brand")
  }

  /** x398 — dup-degree census: near-duplicated docs by how many distinct
    * PARTNERS they pair with — degree 1 is a one-off copy, high degree
    * is a template hub the cluster representative must absorb (x225
    * sizes clusters; this profiles the nodes). Fourteenth consumer of
    * the LSH pair staging. */
  private val x398: Q = (spark, sfDir) => {
    val p = lshPairs(spark, sfDir)
    p.select(col("d1").as("doc"), col("d2").as("nb"))
      .union(p.select(col("d2").as("doc"), col("d1").as("nb")))
      .distinct()
      .groupBy("doc").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_docs"))
      .orderBy("degree")
  }

  /** x399 — value mass vs traffic share by event type: each type's
    * share of EVENTS next to its share of VALUE — the mismatch says
    * which instrumentation carries the business (a type with 20% of
    * traffic and 2% of value is telemetry, not commerce). One scan. */
  private val x399: Q = (spark, sfDir) => {
    val t = Tables(spark, sfDir, "events")
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .as("value_cents"))
    val tot = t.agg(sum(col("n_events")).as("__te"),
      sum(col("value_cents")).as("__tv"))
    t.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_events"), col("value_cents"),
        expr("n_events * 1000000 DIV __te").as("event_share_ppm"),
        expr("CAST(CAST(value_cents AS DECIMAL(38,0)) * 1000000 DIV __tv" +
          " AS BIGINT)").as("value_share_ppm"))
      .orderBy("event_type")
  }

  /** x400 — corpus master report: the one-row health sheet a curation
    * run signs off on — doc/lang/source counts, token total, mean
    * quality milli, and near-dup doc ppm — every number defined by an
    * operator already oracle-checked individually; this row is what a
    * pipeline dashboard actually reads. Three cheap scans + the shared
    * pair staging, folded by 1-row broadcasts. */
  private val x400: Q = (spark, sfDir) => {
    val base = docs(spark, sfDir).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"))
    val quality = docs(spark, sfDir)
      .select(floor(TextAnalysis.qualityScore(col("text")) * 1000).as("__q"))
      .agg(expr("SUM(__q) DIV COUNT(1)").as("mean_quality_milli"))
    val dup = lshPairs(spark, sfDir)
      .select(explode(array(col("d1"), col("d2"))).as("d")).distinct()
      .agg(count(lit(1)).as("__nd"))
    base
      .crossJoin(broadcast(quality)).crossJoin(broadcast(dup))
      .select(col("n_docs"), col("n_langs"), col("n_sources"),
        col("n_tokens"), col("mean_quality_milli"),
        expr("__nd * 1000000 DIV n_docs").as("dup_doc_ppm"))
  }

  /** x401 — chronic-supplier streaks: suppliers by their LONGEST run of
    * consecutive bad months (return ppm above the 1/3 line) — chronic
    * quality issues need a different fix than episodic ones; x352's
    * islands machinery pointed at vendor quality. */
  private val x401: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val sm = Tables(spark, sfDir, "lineitem")
      .filter(col("l_suppkey").isNotNull && col("l_shipdate").isNotNull &&
        col("l_returnflag").isNotNull)
      .groupBy(col("l_suppkey"),
        (year(to_date(col("l_shipdate"))) * 12 +
          month(to_date(col("l_shipdate")))).as("__mi"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("__r"))
      .filter(expr("__r * 3 > __n"))
    val w = Window.partitionBy("l_suppkey").orderBy("__mi")
    sm.withColumn("__grp", col("__mi") - row_number().over(w))
      .groupBy("l_suppkey", "__grp").agg(count(lit(1)).as("__len"))
      .groupBy("l_suppkey").agg(max(col("__len")).as("bad_streak_months"))
      .groupBy("bad_streak_months").agg(count(lit(1)).as("n_suppliers"))
      .orderBy("bad_streak_months")
  }

  /** x402 — price-ladder integrity: within each (type, size) shelf cell,
    * the retail-price spread in ppm (positive-ratio spelling) — wide
    * spread inside an "identical" cell means mispriced SKUs or a dirty
    * catalog. Cells are |types × sizes|-bounded. */
  private val x402: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "part")
      .filter(col("p_type").isNotNull && col("p_size").isNotNull &&
        col("p_retailprice").isNotNull)
      .groupBy(col("p_type"), col("p_size"))
      .agg(count(lit(1)).as("n_parts"),
        min(expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100" +
          " AS BIGINT)")).as("min_cents"),
        max(expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100" +
          " AS BIGINT)")).as("max_cents"))
      .select(col("p_type"), col("p_size"), col("n_parts"),
        col("min_cents"), col("max_cents"),
        expr("CAST(CAST(max_cents AS DECIMAL(38,0)) * 1000000" +
          " DIV min_cents AS BIGINT) - 1000000").as("spread_ppm"))
      .orderBy("p_type", "p_size")
  }

  /** x403 — nation-segment skew ([[Analytics.chiSquareAudit]], third
    * consumer): customer market segments crossed with nation vs
    * independence — a skewed cell means segment-targeted campaigns have
    * a geography they didn't plan for. */
  private val x403: Q = (spark, sfDir) =>
    Analytics.chiSquareAudit(
      Tables(spark, sfDir, "customer")
        .join(broadcast(Tables(spark, sfDir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey")),
      "n_name", "c_mktsegment")

  /** x404 — return rate by quantity band: returned-line ppm per
    * quantity decade — does bulk get returned more? The quantity axis
    * of the x385/x358 return family. One scan. */
  private val x404: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .filter(col("l_quantity").isNotNull && col("l_returnflag").isNotNull)
      .groupBy(expr("CAST(CAST(l_quantity AS BIGINT) DIV 10 AS INT)")
        .as("qty_band"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returns"))
      .select(col("qty_band"), col("n_lines"), col("n_returns"),
        expr("n_returns * 1000000 DIV n_lines").as("return_ppm"))
      .orderBy("qty_band")
  }

  /** x405 — vector collision census: embeddings that are bit-identical
    * to another vector, by family size — exact float-array equality is
    * deterministic on every engine, and collisions mean a broken
    * feature pipeline upstream (x01's exact dedup for the vector side).
    * The clean testdata has no collisions, so ~1% are deterministically
    * overwritten with a constant vector (vec-id modulus — the x93/x94
    * plant discipline) to keep the collision path non-vacuous.
    * Group-by-array collapse; atomic output only. */
  private val x405: Q = (spark, sfDir) => {
    emb(spark, sfDir)
      .filter(col("embedding").isNotNull)
      .withColumn("embedding",
        when(col("vec_id") % 97 === 0,
          expr("transform(embedding, x -> CAST(0.5 AS FLOAT))"))
          .otherwise(col("embedding")))
      .groupBy(col("embedding")).agg(count(lit(1)).as("family_size"))
      .groupBy("family_size")
      .agg(count(lit(1)).as("n_families"),
        sum(col("family_size")).as("n_vectors"))
      .orderBy("family_size")
  }

  /** x406 — brand assortment span: distinct types and sizes each brand
    * covers, with catalog-coverage ppm — a brand living in one type
    * cell is a label, not a line. One scan of the part dim. */
  private val x406: Q = (spark, sfDir) => {
    val p = Tables(spark, sfDir, "part")
      .filter(col("p_brand").isNotNull)
    val tot = p.agg(countDistinct(col("p_type")).as("__tt"),
      countDistinct(col("p_size")).as("__ts"))
    p.groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_parts"),
        countDistinct(col("p_type")).as("n_types"),
        countDistinct(col("p_size")).as("n_sizes"))
      .crossJoin(broadcast(tot))
      .select(col("brand"), col("n_parts"), col("n_types"), col("n_sizes"),
        expr("n_types * 1000000 DIV __tt").as("type_coverage_ppm"),
        expr("n_sizes * 1000000 DIV __ts").as("size_coverage_ppm"))
      .orderBy("brand")
  }

  /** x407 — value by tenure band: mean event value by the user's age in
    * days at the event (0 / 1–7 / 8–14 / 15+) — x375 indexes by
    * purchase COUNT; this indexes by TIME, which is what retention
    * economics discounts on. Per-user first-seen joins back
    * user-bounded. */
  private val x407: Q = (spark, sfDir) => {
    val e = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
    val first = e.groupBy("user_id").agg(min(col("ts")).as("__f"))
    e.join(first, "user_id")
      .select(
        when(datediff(to_date(col("ts")), to_date(col("__f"))) === 0, "1_day0")
          .when(datediff(to_date(col("ts")), to_date(col("__f"))) <= 7, "2_week1")
          .when(datediff(to_date(col("ts")), to_date(col("__f"))) <= 14, "3_week2")
          .otherwise("4_later").as("tenure_band"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
      .groupBy("tenure_band")
      .agg(count(lit(1)).as("n_events"),
        expr("SUM(__c) DIV COUNT(1)").as("mean_value_cents"))
      .orderBy("tenure_band")
  }

  /** x408 — orphan vector audit: embeddings with NO document behind
    * them, per label — the reverse direction of x304's coverage check;
    * orphans poison retrieval with undeletable results. The clean
    * bridge has none, so ~1% of vec ids are deterministically negated
    * (x93's planted-orphan convention) to keep the path non-vacuous.
    * Anti join then |labels|-bounded rollup. */
  private val x408: Q = (spark, sfDir) => {
    val d = docs(spark, sfDir).select(col("doc_id"))
    emb(spark, sfDir)
      .withColumn("vec_id",
        when(col("vec_id") % 89 === 0, -col("vec_id") - 1)
          .otherwise(col("vec_id")))
      .join(d.withColumn("__has", lit(1L)),
        col("vec_id") === col("doc_id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("__has").isNull, 1L).otherwise(0L)).as("n_orphans"))
      .select(col("label"), col("n_vectors"), col("n_orphans"),
        expr("n_orphans * 1000000 DIV n_vectors").as("orphan_ppm"))
      .orderBy("label")
  }

  /** x409 — cohort LTV triangle (orders side): revenue by (first-order
    * year cohort × order year) with cohort sizes — the money triangle
    * x65/x281 build from events, here on the transactional book. First
    * order via keyed min; matrix is |years|²-bounded. */
  private val x409: Q = (spark, sfDir) => {
    val o = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_custkey"), year(to_date(col("o_orderdate"))).as("__y"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
    val cohort = o.groupBy("o_custkey").agg(min(col("__y")).as("cohort_year"))
    val size = cohort.groupBy("cohort_year")
      .agg(count(lit(1)).as("cohort_customers"))
    o.join(cohort, "o_custkey")
      .groupBy(col("cohort_year"), col("__y").as("order_year"))
      .agg(count(lit(1)).as("n_orders"), sum(col("__c")).as("rev_cents"))
      .join(broadcast(size), "cohort_year")
      .select(col("cohort_year"), col("order_year"), col("cohort_customers"),
        col("n_orders"), col("rev_cents"))
      .orderBy("cohort_year", "order_year")
  }

  /** x410 — line-position value curve: mean line value by line number
    * within the order — "is the first line the anchor purchase?"; the
    * basket twin of x373's token-position profile. One scan,
    * |positions|-bounded. */
  private val x410: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .filter(col("l_linenumber").isNotNull && col("l_extendedprice").isNotNull)
      .groupBy(col("l_linenumber"))
      .agg(count(lit(1)).as("n_lines"),
        expr("SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100" +
          " AS BIGINT)) DIV COUNT(1)").as("mean_line_cents"))
      .orderBy("l_linenumber")
  }

  /** x411 — regional taste table: each nation's top part TYPE by
    * revenue with its share — the x318 max(struct) argmax, keyed on
    * revenue sums instead of counts (ties break to the
    * lexicographically-first type via the negated-rank trick's string
    * analogue: min on the tie side). */
  private val x411: Q = (spark, sfDir) => {
    val cell = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, sfDir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_type").isNotNull)
      .groupBy(col("n_name").as("nation"), col("p_type"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("__c"))
    // argmax by (revenue, then FIRST type name): max struct with the
    // type string inverted is not well-defined for strings, so rank the
    // tie by a second aggregate: max(revenue) then min(type) among maxima.
    val mx = cell.groupBy("nation").agg(max(col("__c")).as("__m"),
      sum(col("__c")).as("__t"))
    cell.join(mx, "nation")
      .filter(col("__c") === col("__m"))
      .groupBy("nation")
      .agg(min(col("p_type")).as("top_type"), max(col("__m")).as("top_rev_cents"),
        max(col("__t")).as("__tt"))
      .select(col("nation"), col("top_type"), col("top_rev_cents"),
        expr("CAST(CAST(top_rev_cents AS DECIMAL(38,0)) * 1000000" +
          " DIV __tt AS BIGINT)").as("top_share_ppm"))
      .orderBy("nation")
  }

  /** x412 — discount effectiveness: mean quantity (exact milli) per
    * discount percent band — x323 read quantity → discount (the pricing
    * ladder); this reads discount → quantity (did the promo move
    * units?). One scan, |bands|-bounded. */
  private val x412: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .filter(col("l_discount").isNotNull && col("l_quantity").isNotNull)
      .groupBy((col("l_discount").cast("decimal(8,6)") * 100).cast("int")
        .as("discount_pct"))
      .agg(count(lit(1)).as("n_lines"),
        expr("SUM(CAST(l_quantity AS BIGINT)) * 1000 DIV COUNT(1)")
          .as("mean_qty_milli"))
      .orderBy("discount_pct")
  }

  /** x413 — feature domain audit: the props.k integer field's coverage
    * in one row — rows carrying it, distinct values, range, and HOLES
    * in the range — the payload-contract check (a hole in an enum range
    * means a writer version is missing). JSON path extraction then one
    * aggregate. */
  private val x413: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "events")
      .select(expr("CAST(get_json_object(props, '$.k') AS INT)").as("__k"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__k").isNotNull, 1L).otherwise(0L)).as("n_with_k"),
        countDistinct(col("__k")).as("n_distinct_k"),
        min(col("__k")).cast("long").as("min_k"),
        max(col("__k")).cast("long").as("max_k"))
      .select(col("n_rows"), col("n_with_k"), col("n_distinct_k"),
        col("min_k"), col("max_k"),
        expr("max_k - min_k + 1 - n_distinct_k").as("n_holes"))
  }

  /** x414 — catalog name vocabulary: top-20 tokens across part names —
    * naming-convention drift shows up as a fragmented vocabulary here
    * long before search relevance complains. Vocab-bounded aggregate,
    * TakeOrdered top-k. */
  private val x414: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "part")
      .filter(col("p_name").isNotNull)
      .select(explode(split(col("p_name"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n_parts"))
      .orderBy(col("n_parts").desc, col("token"))
      .limit(20)
  }

  /** x415 — denormalized-name consistency: the id embedded in
    * `Customer#…`/`Supplier#…` display names audited against the key
    * column — denormalized fields rot silently, and x93's FK audit
    * can't see this class (the key itself is fine). try_cast on both
    * engines so an unparseable name counts, never crashes. */
  private val x415: Q = (spark, sfDir) => {
    def audit(df: DataFrame, rel: String, id: String, name: String) = df
      .select(lit(rel).as("relation"), col(id).as("__id"),
        expr(s"try_cast(regexp_extract($name, '#([0-9]+)', 1) AS BIGINT)")
          .as("__pid"))
      .groupBy("relation")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__pid").isNotNull, 1L).otherwise(0L))
          .as("n_parseable"),
        sum(when(col("__pid") === col("__id"), 1L).otherwise(0L))
          .as("n_match"))
    audit(Tables(spark, sfDir, "customer"), "customer", "c_custkey", "c_name")
      .union(audit(Tables(spark, sfDir, "supplier"), "supplier",
        "s_suppkey", "s_name"))
      .withColumn("n_mismatch", col("n_parseable") - col("n_match"))
      .orderBy("relation")
  }

  /** x416 — domain-constraint audit: one pass over lineitem counting
    * violations of the column contracts (price > 0, discount ∈ [0, .1],
    * tax ∈ [0, .08], quantity ∈ [1, 50]) — x94 profiles nulls; this
    * checks RANGES, the other half of a column contract. Single scan,
    * stacked to one row per constraint. */
  private val x416: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem").agg(
        count(lit(1)).as("__n"),
        sum(when(col("l_extendedprice") <= 0 ||
          col("l_extendedprice").isNull, 1L).otherwise(0L)).as("__v1"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 0.1 ||
          col("l_discount").isNull, 1L).otherwise(0L)).as("__v2"),
        sum(when(col("l_tax") < 0 || col("l_tax") > 0.08 ||
          col("l_tax").isNull, 1L).otherwise(0L)).as("__v3"),
        sum(when(col("l_quantity") < 1 || col("l_quantity") > 50 ||
          col("l_quantity").isNull, 1L).otherwise(0L)).as("__v4"))
      .select(expr("stack(4, 'price_positive', __v1," +
        " 'discount_0_to_10pct', __v2, 'tax_0_to_8pct', __v3," +
        " 'quantity_1_to_50', __v4) AS (check_name, n_violations)"),
        col("__n").as("n_checked"))
      .select(col("check_name"), col("n_checked"), col("n_violations"))
      .orderBy("check_name")
  }

  /** x417 — brand order penetration: share of orders containing each
    * brand (exact ppm) — the household-penetration KPI; x351's attach
    * rate says what joins a basket, this says how many baskets a brand
    * reaches at all. Basket frame collapses once. */
  private val x417: Q = (spark, sfDir) => {
    val ob = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("l_orderkey").isNotNull && col("p_brand").isNotNull)
      .select(col("l_orderkey").as("__o"), col("p_brand").as("brand"))
      .distinct()
    val tot = ob.select("__o").distinct().agg(count(lit(1)).as("__t"))
    ob.groupBy("brand").agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(tot))
      .select(col("brand"), col("n_orders"),
        expr("n_orders * 1000000 DIV __t").as("penetration_ppm"))
      .orderBy("brand")
  }

  /** x418 — quality by ingest decile: mean quality milli per doc-id
    * decile — the metric axis x346's length drift leaves out; a falling
    * tail means the crawler hit the low-quality frontier. FLOOR before
    * the integer mean. */
  private val x418: Q = (spark, sfDir) => {
    val mx = docs(spark, sfDir).agg(max(col("doc_id")).as("__mx"))
    docs(spark, sfDir).crossJoin(broadcast(mx))
      .select(least(expr("doc_id * 10 DIV (__mx + 1)"), lit(9L))
          .as("decile"),
        floor(TextAnalysis.qualityScore(col("text")) * 1000).as("__q"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        expr("SUM(__q) DIV COUNT(1)").as("mean_quality_milli"))
      .orderBy("decile")
  }

  /** x419 — transition asymmetry: for each unordered event-type pair,
    * the forward and backward adjacent-transition counts and the NET
    * flow — x141's matrix folded to direction-of-travel (view→purchase
    * should dominate purchase→view; if it doesn't, the funnel is a
    * loop). User-partitioned lead window only. */
  private val x419: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val tr = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .withColumn("__next", lead(col("event_type"), 1).over(w))
      .filter(col("__next").isNotNull && col("__next") =!= col("event_type"))
      .groupBy(col("event_type").as("__a"), col("__next").as("__b"))
      .agg(count(lit(1)).as("__n"))
    val fwd = tr.filter(col("__a") < col("__b"))
      .select(col("__a").as("type_1"), col("__b").as("type_2"),
        col("__n").as("n_forward"))
    val bwd = tr.filter(col("__a") > col("__b"))
      .select(col("__b").as("type_1"), col("__a").as("type_2"),
        col("__n").as("n_backward"))
    fwd.join(bwd, Seq("type_1", "type_2"), "full")
      .select(col("type_1"), col("type_2"),
        coalesce(col("n_forward"), lit(0L)).as("n_forward"),
        coalesce(col("n_backward"), lit(0L)).as("n_backward"))
      .withColumn("net_flow", col("n_forward") - col("n_backward"))
      .orderBy("type_1", "type_2")
  }

  /** x420 — seasonal peak alignment: do all brands peak in the SAME
    * month (systemic seasonality) or each in its own (idiosyncratic)?
    * Per-brand argmax month (max(struct), tie → earliest month), then
    * the modal peak and alignment share — x325's matrix folded to one
    * row. */
  private val x420: Q = (spark, sfDir) => {
    val cell = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull && col("o_orderdate").isNotNull)
      .groupBy(col("p_brand").as("brand"),
        month(to_date(col("o_orderdate"))).as("__mo"))
      .agg(sum(expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("__c"))
    val peaks = cell.groupBy("brand")
      .agg(max(struct(col("__c"), (-col("__mo")).as("__nm"))).as("__m"))
      .select((-col("__m.__nm")).as("__peak"))
    val byPeak = peaks.groupBy("__peak").agg(count(lit(1)).as("__cnt"))
    byPeak.agg(sum(col("__cnt")).as("n_brands"),
        max(struct(col("__cnt"), (-col("__peak")).as("__np"))).as("__mx"))
      .select(col("n_brands"), (-col("__mx.__np")).as("modal_peak_month"),
        col("__mx.__cnt").as("n_at_modal"))
      .withColumn("alignment_ppm",
        expr("n_at_modal * 1000000 DIV n_brands"))
  }

  /** x421 — corpus A/A audit: split docs by id parity and compare the
    * metric means — any split-system bias (a sharded crawler writing
    * different content to even/odd shards) shows here before an A/B
    * test inherits it. One scan, three stacked metric rows with exact
    * deltas. */
  private val x421: Q = (spark, sfDir) => {
    val m = docs(spark, sfDir).select(
      (col("doc_id") % 2 === 0).as("__a"),
      col("n_chars"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("__tok"),
      floor(TextAnalysis.qualityScore(col("text")) * 1000).as("__q"))
    def side(flag: Boolean, c: Column) =
      sum(when(col("__a") === flag, c).otherwise(0L))
    val agg = m.agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("__na"),
      sum(when(!col("__a"), 1L).otherwise(0L)).as("__nb"),
      side(flag = true, col("n_chars")).as("__ca"),
      side(flag = false, col("n_chars")).as("__cb"),
      side(flag = true, col("__tok")).as("__ta"),
      side(flag = false, col("__tok")).as("__tb"),
      side(flag = true, col("__q")).as("__qa"),
      side(flag = false, col("__q")).as("__qb"))
    agg.select(expr("stack(3," +
        " 'mean_chars', __ca DIV __na, __cb DIV __nb," +
        " 'mean_tokens', __ta DIV __na, __tb DIV __nb," +
        " 'mean_quality_milli', __qa DIV __na, __qb DIV __nb)" +
        " AS (metric, a_value, b_value)"),
        col("__na").as("n_a"), col("__nb").as("n_b"))
      .withColumn("delta", col("a_value") - col("b_value"))
      .select(col("metric"), col("n_a"), col("n_b"), col("a_value"),
        col("b_value"), col("delta"))
      .orderBy("metric")
  }

  /** x422 — events domain audit: the x416 stacked-constraint pass on
    * the event stream (value ≥ 0, ts inside the collection window,
    * event_type in the known enum) — the payload contract for
    * telemetry. */
  private val x422: Q = (spark, sfDir) => {
    val known = Seq("view", "click", "signup", "purchase", "error")
    Tables(spark, sfDir, "events").agg(
        count(lit(1)).as("__n"),
        sum(when(col("value") < 0 || col("value").isNull, 1L)
          .otherwise(0L)).as("__v1"),
        sum(when(col("ts").isNull ||
          col("ts") < lit("2024-01-01").cast("timestamp") ||
          col("ts") >= lit("2024-02-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("__v2"),
        sum(when(!col("event_type").isin(known: _*) ||
          col("event_type").isNull, 1L).otherwise(0L)).as("__v3"))
      .select(expr("stack(3, 'value_nonnegative', __v1," +
        " 'ts_in_window', __v2, 'type_in_enum', __v3)" +
        " AS (check_name, n_violations)"), col("__n").as("n_checked"))
      .select(col("check_name"), col("n_checked"), col("n_violations"))
      .orderBy("check_name")
  }

  /** x423 — language drift over ingest
    * ([[Analytics.categoricalMixDrift]], fourth consumer): L1 distance
    * of the language mix between consecutive doc-id deciles — the
    * mixture a model trains on is the mixture the LAST deciles carry,
    * not the average. */
  private val x423: Q = (spark, sfDir) => {
    val mx = docs(spark, sfDir).agg(max(col("doc_id")).as("__mx"))
    Analytics.categoricalMixDrift(
      docs(spark, sfDir).crossJoin(broadcast(mx))
        .select(least(expr("doc_id * 10 DIV (__mx + 1)"), lit(9L))
          .as("decile"), col("lang")),
      "decile", "lang")
  }

  /** x424 — token-hash balance: corpus tokens hashed (portable md5)
    * into 32 buckets with deviation from uniform — a skewed bucket here
    * means every hash-partitioned text stage (LSH bands, shard
    * assignment) inherits a hot partition; x340's audit for the TEXT
    * path. Vocab collapse first so the hash runs once per distinct
    * token. */
  private val x424: Q = (spark, sfDir) => {
    val b = docs(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .select(pmod(graft.operators.PortableHash.hash60(col("__w")),
        lit(32L)).as("bucket"), col("__c"))
      .groupBy("bucket").agg(sum(col("__c")).as("n_tokens"))
    val tot = b.agg(sum(col("n_tokens")).as("__t"))
    b.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_tokens"),
        expr("CAST(CAST(n_tokens AS DECIMAL(38,0)) * 32000000 DIV __t" +
          " AS BIGINT)").as("load_ppm"))
      .orderBy("bucket")
  }

  /** x425 — order-day coverage: share of calendar days carrying at
    * least one order, per month — a coverage dip is an outage or a
    * pipeline gap (x292 finds streaks on events; this is the
    * transactional continuity sheet). |months|-bounded. */
  private val x425: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(to_date(col("o_orderdate")).as("__d")).distinct()
      .groupBy(trunc(col("__d"), "month").as("month"),
        dayofmonth(last_day(col("__d"))).as("n_days"))
      .agg(count(lit(1)).as("n_active_days"))
      .select(col("month"), col("n_days"), col("n_active_days"),
        expr("n_active_days * 1000000 DIV n_days").as("coverage_ppm"))
      .orderBy("month")
  }

  /** x426 — dedup threshold margin: share of verified pairs inside
    * [0.70, 0.72) — the mass that flips if the threshold moves 2 points;
    * x344 draws the histogram, this is the one-number sensitivity a
    * threshold review asks for. Fifteenth consumer of the pair
    * staging. */
  private val x426: Q = (spark, sfDir) => {
    lshPairs(spark, sfDir)
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("jaccard") < 0.72, 1L).otherwise(0L))
          .as("n_borderline"))
      .select(col("n_pairs"), col("n_borderline"),
        expr("CASE WHEN n_pairs > 0 THEN n_borderline * 1000000" +
          " DIV n_pairs ELSE CAST(0 AS BIGINT) END")
          .as("borderline_ppm"))
  }

  /** x427 — catalog name-collision census: parts sharing an exact
    * display name, by family size — x405's collision audit for the
    * catalog dimension (two keys, one name = broken uniqueness
    * contract upstream). */
  private val x427: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "part")
      .filter(col("p_name").isNotNull)
      .groupBy(col("p_name")).agg(count(lit(1)).as("family_size"))
      .groupBy("family_size")
      .agg(count(lit(1)).as("n_names"), sum(col("family_size")).as("n_parts"))
      .orderBy("family_size")
  }

  /** x428 — sessions-per-user census: histogram of 30-min-gap session
    * counts per user — the visit-frequency distribution under x244's
    * threshold sweep (sweep picks τ; this shows the shape at the chosen
    * τ). Session count = 1 + over-threshold gaps, no run
    * reconstruction needed. */
  private val x428: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .select(col("user_id"),
        when(col("__prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__prev")) > 1800000000L,
          1L).otherwise(0L).as("__new"))
      .groupBy("user_id").agg(sum(col("__new")).as("n_sessions"))
      .groupBy("n_sessions").agg(count(lit(1)).as("n_users"))
      .orderBy("n_sessions")
  }

  /** x429 — brand price architecture: each brand's line mix across
    * log2 price bands in exact share ppm — a one-band brand is a
    * price point, a flat profile is a portfolio; x397 gives the mean,
    * this gives the SHAPE. |brands × bands| cells. */
  private val x429: Q = (spark, sfDir) => {
    val cell = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull && col("l_extendedprice").isNotNull)
      .groupBy(col("p_brand").as("brand"),
        expr("CAST(length(bin(CAST(CAST(l_extendedprice" +
          " AS DECIMAL(18,2)) * 100 AS BIGINT))) - 1 AS INT)")
          .as("price_band"))
      .agg(count(lit(1)).as("n_lines"))
    val bt = cell.groupBy("brand").agg(sum(col("n_lines")).as("__t"))
    cell.join(bt, "brand")
      .select(col("brand"), col("price_band"), col("n_lines"),
        expr("n_lines * 1000000 DIV __t").as("share_ppm"))
      .orderBy("brand", "price_band")
  }

  /** x430 — ship-delay trend: mean order-to-ship days (exact milli) per
    * order month — the fulfilment drift line under x356's per-priority
    * quantiles; a rising mean with flat p50 means the tail is rotting.
    * One scan, |months|-bounded. */
  private val x430: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate").isNotNull && col("o_orderdate").isNotNull)
      .groupBy(trunc(to_date(col("o_orderdate")), "month").as("month"))
      .agg(count(lit(1)).as("n_lines"),
        expr("SUM(CAST(datediff(to_date(l_shipdate)," +
          " to_date(o_orderdate)) AS BIGINT)) * 1000 DIV COUNT(1)")
          .as("mean_delay_milli_days"))
      .orderBy("month")
  }

  /** x431 — catalog price drift by id decile: mean retail cents per
    * part-id decile — the x346/x418/x423 ingest-drift family pointed at
    * the catalog dimension (a price step across deciles means a
    * repricing batch landed mid-load). */
  private val x431: Q = (spark, sfDir) => {
    val mx = Tables(spark, sfDir, "part").agg(max(col("p_partkey")).as("__mx"))
    Tables(spark, sfDir, "part")
      .filter(col("p_retailprice").isNotNull)
      .crossJoin(broadcast(mx))
      .select(least(expr("p_partkey * 10 DIV (__mx + 1)"), lit(9L))
          .as("decile"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_parts"),
        expr("SUM(__c) DIV COUNT(1)").as("mean_retail_cents"))
      .orderBy("decile")
  }

  /** x432 — value-weighted brand returns: returned REVENUE share per
    * brand in exact ppm — x299 counts returned lines; money-weighting
    * reorders the list when returns skew expensive, which is exactly
    * when it matters. */
  private val x432: Q = (spark, sfDir) => {
    Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull && col("l_returnflag").isNotNull &&
        col("l_extendedprice").isNotNull)
      .select(col("p_brand").as("brand"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("__r"))
      .groupBy("brand")
      .agg(sum(col("__c")).as("rev_cents"),
        sum(when(col("__r") === 1L, col("__c")).otherwise(0L))
          .as("returned_cents"))
      .select(col("brand"), col("rev_cents"), col("returned_cents"),
        expr("CAST(CAST(returned_cents AS DECIMAL(38,0)) * 1000000" +
          " DIV rev_cents AS BIGINT)").as("returned_value_ppm"))
      .orderBy("brand")
  }

  /** x433 — weekday habit census: repeat customers (≥ 4 orders) banded
    * by the share of orders on their SINGLE favourite weekday — near-1e6
    * is a standing order, near-1/7 is impulse; the scheduling signal
    * behind x238's ETA. Portable ISO dow; customer-bounded collapses. */
  private val x433: Q = (spark, sfDir) => {
    val cd = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .groupBy(col("o_custkey"),
        expr("(dayofweek(CAST(o_orderdate AS DATE)) + 5) % 7 + 1")
          .as("__dow"))
      .agg(count(lit(1)).as("__c"))
    cd.groupBy("o_custkey")
      .agg(sum(col("__c")).as("__t"), max(col("__c")).as("__m"))
      .filter(col("__t") >= 4)
      .select(expr("__m * 1000000 DIV __t").as("__ppm"))
      .groupBy(expr("__ppm DIV 100000").cast("int").as("habit_band"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("habit_band")
  }

  /** x434 — quality × length grid: doc counts over (quality band ×
    * log2-length band) — the 2D map that says whether a length filter
    * would silently delete the high-quality tail. One scan,
    * |bands²|-bounded. */
  private val x434: Q = (spark, sfDir) => {
    docs(spark, sfDir)
      .filter(col("n_chars") > 0)
      .select(
        when(TextAnalysis.qualityScore(col("text")) >= 0.5, "hi")
          .otherwise("lo").as("quality_band"),
        expr("CAST(length(bin(n_chars)) - 1 AS INT)").as("len_band"))
      .groupBy("quality_band", "len_band")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("quality_band", "len_band")
  }

  /** x435 — reorder cadence trend ([[Analytics.lowerMedianByValue]]
    * keyed by year): the exact median inter-order gap per order year —
    * is the customer base speeding up? x316 slices by segment; this
    * watches TIME. Gap window customer-partitioned; medians from
    * value-collapsed counts per year. */
  private val x435: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy("__d", "o_orderkey")
    val gaps = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("__d"),
        col("o_orderkey"))
      .withColumn("__prev", lag(col("__d"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select(year(col("__d")).as("yr"),
        datediff(col("__d"), col("__prev")).cast("long").as("__gap"))
    Analytics.lowerMedianByValue(gaps, Seq("yr"), "__gap")
      .select(col("yr"), col("__v").as("median_gap_days"),
        col("__n").as("n_gaps"))
      .orderBy("yr")
  }

  /** x436 — customer acquisition curve: NEW customers per quarter
    * (first-order quarter) with the running total — the top of every
    * growth model; cumulative rides the |quarters| spine only. */
  private val x436: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val firstQ = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .groupBy("o_custkey")
      .agg(min(trunc(to_date(col("o_orderdate")), "quarter")).as("quarter"))
    firstQ.groupBy("quarter").agg(count(lit(1)).as("n_new_customers"))
      .withColumn("cumulative_customers",
        sum(col("n_new_customers")).over(Window.orderBy("quarter")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("quarter")
  }

  /** x437 — dup-cluster source span ([[Dedup.dupClusters]]): clusters
    * by how many distinct SOURCES they straddle — single-source
    * clusters are internal re-posts (safe to collapse per source),
    * multi-source ones are syndication (collapse globally or leak).
    * Cluster labels from the shared pair staging. */
  private val x437: Q = (spark, sfDir) => {
    Dedup.dupClusters(lshPairs(spark, sfDir))
      .join(docs(spark, sfDir).select(col("doc_id"), col("source")),
        "doc_id")
      .select(col("cluster"), col("source")).distinct()
      .groupBy("cluster").agg(count(lit(1)).as("n_sources"))
      .groupBy("n_sources").agg(count(lit(1)).as("n_clusters"))
      .orderBy("n_sources")
  }

  /** x438 — supplier specialization census: suppliers banded by the
    * share of their lines on their SINGLE top brand — a specialized
    * supplier is a different risk than a generalist when that brand
    * turns (x363's loyalty lens rotated to the supply side). */
  private val x438: Q = (spark, sfDir) => {
    val sb = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("l_suppkey").isNotNull && col("p_brand").isNotNull)
      .groupBy(col("l_suppkey"), col("p_brand"))
      .agg(count(lit(1)).as("__c"))
    sb.groupBy("l_suppkey")
      .agg(sum(col("__c")).as("__t"), max(col("__c")).as("__m"))
      .select(expr("__m * 1000000 DIV __t").as("__ppm"))
      .groupBy(expr("__ppm DIV 100000").cast("int").as("spec_band"))
      .agg(count(lit(1)).as("n_suppliers"))
      .orderBy("spec_band")
  }

  /** x439 — brand customer reach: distinct buyers per brand and reach
    * ppm of the active customer base — with x417's order penetration
    * this completes the reach × frequency decomposition every brand
    * review runs. Distinct collapses only. */
  private val x439: Q = (spark, sfDir) => {
    val bc = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("o_custkey").isNotNull && col("p_brand").isNotNull)
      .select(col("p_brand").as("brand"), col("o_custkey")).distinct()
    val tot = bc.select("o_custkey").distinct().agg(count(lit(1)).as("__t"))
    bc.groupBy("brand").agg(count(lit(1)).as("n_customers"))
      .crossJoin(broadcast(tot))
      .select(col("brand"), col("n_customers"),
        expr("n_customers * 1000000 DIV __t").as("reach_ppm"))
      .orderBy("brand")
  }

  /** x440 — error concentration ([[Analytics.revenueConcentration]]
    * over per-user error counts): deciles and Gini of the error burden
    * — concentrated errors are one user's broken client, diffuse errors
    * are the platform; the triage decision in one table. */
  private val x440: Q = (spark, sfDir) =>
    Analytics.revenueConcentration(
      Tables(spark, sfDir, "events")
        .filter(col("user_id").isNotNull && col("event_type") === "error")
        .groupBy("user_id").agg(count(lit(1)).as("__n")),
      "user_id", col("__n"))

  /** x441 — supplier health vs throughput: account-balance bands ×
    * shipped-line volume (x324's credit-risk read on the supply side) —
    * a negative-balance supplier carrying high volume is the fragility
    * the quadrant census (x337) flags, quantified per band. */
  private val x441: Q = (spark, sfDir) => {
    val vol = Tables(spark, sfDir, "lineitem")
      .filter(col("l_suppkey").isNotNull)
      .groupBy("l_suppkey").agg(count(lit(1)).as("__v"))
    Tables(spark, sfDir, "supplier")
      .select(col("s_suppkey"),
        expr("CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__b"))
      .join(vol, col("s_suppkey") === col("l_suppkey"), "left")
      .select(
        when(col("__b") < 0, "1_negative")
          .when(col("__b") < 500000L, "2_low").otherwise("3_high")
          .as("bal_band"),
        coalesce(col("__v"), lit(0L)).as("__v"))
      .groupBy("bal_band")
      .agg(count(lit(1)).as("n_suppliers"), sum(col("__v")).as("n_lines"))
      .select(col("bal_band"), col("n_suppliers"), col("n_lines"),
        expr("n_lines * 1000 DIV n_suppliers").as("lines_per_k_suppliers"))
      .orderBy("bal_band")
  }

  /** x520 — watermark sizing: the exact lateness distribution of the
    * event stream (per event: how far behind the user's running
    * event-time MAX it arrived, in arrival order) — p50/p99/p999/max
    * seconds, i.e. the watermark delay that bounds state while keeping
    * 99.9 % of events. x504 counts inversions; this SIZES the fix.
    * Running max over arrival order per user; percentiles from
    * distinct-value ranks. */
  private val x520: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val byArr = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("__maxprev", max(unix_timestamp(col("ts"))).over(byArr))
      .filter(col("__maxprev").isNotNull)
      .select(greatest(col("__maxprev") - unix_timestamp(col("ts")), lit(0L))
        .as("__late"))
    val coll = late.groupBy("__late").agg(count(lit(1)).as("__c"))
    val tot = late.agg(count(lit(1)).as("__n"))
    coll.withColumn("__cum", sum(col("__c")).over(Window.orderBy("__late")))
      .crossJoin(broadcast(tot))
      .agg(max(col("__n")).as("n_events"),
        min(when(col("__cum") * 2 >= col("__n"), col("__late"))).as("p50_late_sec"),
        min(when(col("__cum") * 100 >= col("__n") * 99, col("__late")))
          .as("p99_late_sec"),
        min(when(col("__cum") * 1000 >= col("__n") * 999, col("__late")))
          .as("p999_late_sec"),
        max(col("__late")).as("max_late_sec"))
  }

  /** x521 — part-type mix drift ([[Analytics.categoricalMixDrift]] over
    * ship years × part type): year-over-year L1 drift of the TYPE
    * revenue-line mix — the assortment-composition drift x314 measures
    * for priorities and x330 for event types, at the catalog axis. */
  private val x521: Q = (spark, sfDir) =>
    Analytics.categoricalMixDrift(
      Tables(spark, sfDir, "lineitem")
        .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate").isNotNull)
        .select(year(to_date(col("l_shipdate"))).as("yr"), col("p_type")),
      "yr", "p_type")

  /** x522 — video motion proxy
    * ([[graft.operators.Multimodal.extractMotionFeatures]]): per packed
    * clip, the max adjacent-frame brightness delta through the REAL
    * demux + per-frame `javax.imageio` decode — the oracle recomputes
    * the frame sums from the pixel formula (17·frame term), so green
    * certifies the whole container round-trip frame by frame. */
  private val x522: Q = (spark, sfDir) => {
    val media = graft.operators.Multimodal.renderVideoTable(spark,
      docs(spark, sfDir).filter(col("doc_id") % 7 === 0))
    graft.operators.Multimodal.extractMotionFeatures(spark, media)
      .toDF().orderBy("doc_id")
  }

  /** x523 — Mann-Whitney rank-sum / AUC: does the AUTOMOBILE segment
    * place larger orders than BUILDING, WITHOUT assuming normality?
    * Exact midranks (×2 to stay integer) via the distinct-value
    * cumulative rank (the x139/x161 collapsed-frame pattern — never a
    * row-sized global sort), the U statistic, and U/(n₁·n₂) in ppm —
    * the probability-of-superiority AUC. The nonparametric complement
    * of x468's ANOVA, which tests means under distributional
    * assumptions this test drops. */
  private val x523: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val v = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING") &&
        col("o_totalprice").isNotNull)
      .select(when(col("c_mktsegment") === "AUTOMOBILE", 1L).otherwise(0L).as("__a"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("__v"))
    val coll = v.groupBy("__v")
      .agg(count(lit(1)).as("__c"), sum(col("__a")).as("__ca"))
    coll.withColumn("__before",
        coalesce(sum(col("__c")).over(
          Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .agg(sum(col("__ca")).as("n_auto"),
        sum(col("__c") - col("__ca")).as("n_build"),
        sum(col("__ca") * (col("__before") * 2 + col("__c") + 1))
          .as("rank_sum_auto_x2"))
      .select(col("n_auto"), col("n_build"), col("rank_sum_auto_x2"),
        (col("rank_sum_auto_x2") - col("n_auto") * (col("n_auto") + 1))
          .as("u_auto_x2"),
        expr("""(rank_sum_auto_x2 - n_auto * (n_auto + 1)) * 1000000
              DIV (2 * n_auto * n_build)""").as("auc_ppm"))
  }

  /** x524 — daily burstiness (Fano factor): per event type, the exact
    * variance-to-mean ratio of daily event counts over the zero-filled
    * global day spine — Poisson traffic sits at 1000 milli, campaign /
    * incident-driven types blow past it, sub-1000 is metronomic
    * (scheduled jobs). The dispersion complement of x190's daily
    * autocorrelation. Spine is date-bounded, the type list broadcasts,
    * moments are decimal-exact (the x468 pattern). */
  private val x524: Q = (spark, sfDir) => {
    val ev = Tables(spark, sfDir, "events")
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("__d"))
    val days = ev.select(col("__d")).distinct()
    val types = ev.select(col("event_type")).distinct()
    val cell = ev.groupBy("event_type", "__d").agg(count(lit(1)).as("__n"))
    days.crossJoin(broadcast(types))
      .join(cell, Seq("event_type", "__d"), "left")
      .select(col("event_type"), coalesce(col("__n"), lit(0L)).as("__x"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("__x").cast("decimal(38,0)")).as("__s"),
        sum(col("__x").cast("decimal(38,0)") * col("__x")).as("__q"))
      .select(col("event_type"), col("n_days"),
        expr("CAST(__s * 1000 DIV n_days AS BIGINT)").as("mean_daily_milli"),
        expr("""CAST(CASE WHEN n_days > 1 AND __s > 0 THEN
              (n_days * __q - __s * __s) * 1000 DIV ((n_days - 1) * __s)
              END AS BIGINT)""").as("fano_milli"))
      .orderBy("event_type")
  }

  /** x525 — image resize audit
    * ([[graft.operators.Multimodal.extractResizedFeatures]]): the
    * thumbnail/normalize stage — real `javax.imageio` decode →
    * nearest-neighbor 4×4 downsample with the floor index map
    * ⌊t·src/4⌋; the oracle recomputes the map from the pixel formula,
    * and the position-weighted checksum certifies WHICH source pixel
    * landed in WHICH cell (a plain sum would pass a transposed
    * resize). Completes the brief's multimodal quartet: decode (x12),
    * feature-extract (x491), frame-sample (x82), resize (this). */
  private val x525: Q = (spark, sfDir) => {
    val media = graft.operators.Multimodal.renderImageTable(spark,
      docs(spark, sfDir).filter(col("doc_id") % 5 === 3))
    graft.operators.Multimodal.extractResizedFeatures(spark, media)
      .toDF().orderBy("doc_id")
  }

  /** x526 — blocking-quality audit ([[Dedup.blockingQualityAudit]]): the
    * record-linkage eval pair for x114's prefix-filter blocking —
    * reduction ratio (pairs pruned from n(n−1)/2) and pairs completeness.
    * Spark declares completeness = 1e6 ppm by the prefix-filter theorem;
    * the oracle recomputes truth via an INDEPENDENT all-pairs
    * shared-shingle join, so green machine-checks the zero-false-negative
    * claim instead of assuming it. The dedup complement of x517's ANN
    * recall curve. Runs on the odd-id half corpus (x538 audits the even
    * half): the portable-md5 rarity pipeline costs ~2× the xxhash64 x114
    * pass, and the audit's metrics don't need the full corpus to be
    * meaningful — the full-corpus pass blew the 8 s bench budget. */
  private val x526: Q = (spark, sfDir) =>
    Dedup.blockingQualityAudit(
      docs(spark, sfDir).filter(col("doc_id") % 2 === 1), "doc_id", "text")

  /** x527 — audio decimation audit
    * ([[graft.operators.Multimodal.extractDecimatedAudio]]): real
    * `javax.sound` decode → every-2nd-sample resample; the
    * position-weighted checksum over the KEPT sequence certifies the
    * selection and order through the codec round-trip — the audio analog
    * of x525's resize, completing decode (x119) / frame (x180) /
    * sample-rate-reduce (this) for the audio pipeline. */
  private val x527: Q = (spark, sfDir) => {
    val media = graft.operators.Multimodal.renderAudioTable(spark,
      docs(spark, sfDir).filter(col("doc_id") % 3 === 1))
    graft.operators.Multimodal.extractDecimatedAudio(spark, media)
      .toDF().orderBy("doc_id")
  }

  /** x529 — KMV (k-minimum-values) sketch audit: estimate the cross-
    * snapshot shingle overlap (docs split by id parity = two crawl
    * snapshots) from two 128-value bottom-k sketches — Ĵ from the match
    * rate inside the union sketch, distinct-union from (k−1)·2⁶⁰/h_k —
    * next to the exact answers, err in ppm. The SET-INTERSECTION sketch
    * the HLL family (x83) cannot provide: KMV sketches are mergeable AND
    * intersectable, the 100 TB way to ask "how much does snapshot B
    * re-crawl of A?" without a corpus-wide join. Portable 60-bit md5
    * hash ⇒ the oracle rebuilds both sketches verbatim; sketch
    * construction is a vocabulary-bounded collapse + two TakeOrdered
    * top-k's — never a global sort. */
  private val x529: Q = (spark, sfDir) => {
    val k = 128
    val pres = docs(spark, sfDir).filter(col("text").isNotNull)
      .select((col("doc_id") % 2 === 0).as("__a"),
        explode(Dedup.shingles(col("text"), 3)).as("s"))
      .groupBy("s")
      .agg(max(when(col("__a"), 1L).otherwise(0L)).as("__ina"),
        max(when(!col("__a"), 1L).otherwise(0L)).as("__inb"))
    val exact = pres.agg(count(lit(1)).as("exact_union"),
      sum(expr("__ina * __inb")).as("exact_inter"))
    val hashed = pres.select(col("__ina"), col("__inb"),
      graft.operators.PortableHash.hash60(col("s")).as("h"))
    val aK = hashed.filter(col("__ina") === 1).orderBy("h").limit(k)
      .select(col("h"), lit(1L).as("__fa"))
    val bK = hashed.filter(col("__inb") === 1).orderBy("h").limit(k)
      .select(col("h"), lit(1L).as("__fb"))
    val uK = aK.select("h").unionAll(bK.select("h")).distinct()
      .orderBy("h").limit(k)
    val sketch = uK.join(aK, Seq("h"), "left").join(bK, Seq("h"), "left")
      .agg(count(lit(1)).as("__ku"), max(col("h")).as("__hk"),
        sum(when(col("__fa").isNotNull && col("__fb").isNotNull, 1L)
          .otherwise(0L)).as("__m"))
    sketch.crossJoin(broadcast(exact))
      .select(lit(k.toLong).as("k"),
        expr("__m * 1000000 DIV __ku").as("est_jaccard_ppm"),
        expr("exact_inter * 1000000 DIV exact_union").as("exact_jaccard_ppm"),
        expr(s"""CAST(CASE WHEN __ku < $k THEN __ku ELSE
              CAST(__ku - 1 AS DECIMAL(38,0)) * 1152921504606846976 DIV __hk
              END AS BIGINT)""").as("est_union"),
        col("exact_union"), col("exact_inter"))
      .select(col("k"), col("est_jaccard_ppm"), col("exact_jaccard_ppm"),
        col("est_union"), col("exact_union"), col("exact_inter"),
        expr("abs(est_union - exact_union) * 1000000 DIV exact_union")
          .as("union_err_ppm"))
  }

  /** x530 — revenue drawdown: the worst demand slump — per ship day,
    * exact revenue cents vs the running all-time peak; reports the max
    * peak-to-trough gap, its (earliest) trough day, and the slump depth
    * in ppm of the peak that preceded it. The level-series complement of
    * x131's trend slope: a positive trend can hide a one-month collapse,
    * and this is the number an ops review asks for. Day-collapsed frame,
    * date-bounded running-max window. */
  private val x530: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate").isNotNull && col("l_extendedprice").isNotNull)
      .groupBy(to_date(col("l_shipdate")).as("__d"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100" +
        " AS BIGINT)")).as("__rev"))
    val byDay = Window.orderBy("__d").rowsBetween(Window.unboundedPreceding, 0)
    val dd = daily
      .withColumn("__peak", max(col("__rev")).over(byDay))
      .withColumn("__dd", col("__peak") - col("__rev"))
    val mx = dd.agg(count(lit(1)).as("n_days"),
      max(col("__rev")).as("max_daily_rev_cents"),
      max(col("__dd")).as("max_drawdown_cents"))
    dd.crossJoin(broadcast(mx))
      .filter(col("__dd") === col("max_drawdown_cents"))
      .groupBy("n_days", "max_daily_rev_cents", "max_drawdown_cents")
      .agg(min(col("__d")).as("trough_day"),
        min_by(col("__peak"), col("__d")).as("__peak_at"))
      .select(col("n_days"), col("max_daily_rev_cents"),
        col("max_drawdown_cents"), col("trough_day"),
        expr("max_drawdown_cents * 1000000 DIV __peak_at")
          .as("drawdown_ppm_of_peak"))
  }

  /** x531 — order WIP depth: how many orders are OPEN (placed, not yet
    * fully shipped) on each day — the queueing view of the fulfillment
    * pipeline; per month, the max and mean depth. Interval counting via
    * the difference-array pattern: +1 at open, −1 after the last line
    * ships, one cumulative sum over the date-bounded day spine — never a
    * per-order-per-day blowup (the x121 gap-fill discipline applied to
    * interval overlap). */
  private val x531: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val closes = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("__close"))
    val o = Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .join(closes, col("o_orderkey") === col("l_orderkey"))
      .select(to_date(col("o_orderdate")).as("__open"), col("__close"))
      .filter(col("__close").isNotNull && col("__close") >= col("__open"))
    val deltas = o.select(col("__open").as("__d"), lit(1L).as("__delta"))
      .unionAll(o.select(date_add(col("__close"), 1).as("__d"),
        lit(-1L).as("__delta")))
      .groupBy("__d").agg(sum(col("__delta")).as("__dd"))
    val spine = deltas.agg(min(col("__d")).as("__lo"), max(col("__d")).as("__hi"))
      .select(explode(expr("sequence(__lo, __hi)")).as("__d"))
    spine.join(deltas, Seq("__d"), "left")
      .select(col("__d"), coalesce(col("__dd"), lit(0L)).as("__dd"))
      .withColumn("__depth", sum(col("__dd")).over(Window.orderBy("__d")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(trunc(col("__d"), "month").as("month"))
      .agg(max(col("__depth")).as("max_open_orders"),
        expr("SUM(__depth) DIV COUNT(1)").as("mean_open_orders"))
      .orderBy("month")
  }

  /** x535 — admission-control census: simulate a per-user rate limiter
    * (first 3 events per user per DAY admitted, by (ts, event_id) order)
    * and report what the policy WOULD drop, per
    * event type — drop share in ppm and how many distinct users get
    * throttled. The enforcement-simulation complement of x212's quota
    * audit and x498's burst census: those MEASURE behavior, this scores
    * a concrete policy before rollout. One (user, window)-partitioned
    * rank, type-bounded rollup. */
  private val x535: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        expr("unix_timestamp(ts) DIV 86400").as("__win"))
    val byArrival = Window.partitionBy("user_id", "__win")
      .orderBy("ts", "event_id")
    ev.withColumn("__rk", row_number().over(byArrival))
      .select(col("event_type"), col("user_id"),
        when(col("__rk") <= 3, 1L).otherwise(0L).as("__adm"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("__adm")).as("n_admitted"),
        countDistinct(when(col("__adm") === 0L, col("user_id")))
          .as("n_throttled_users"))
      .select(col("event_type"), col("n_events"), col("n_admitted"),
        col("n_throttled_users"),
        expr("(n_events - n_admitted) * 1000000 DIV n_events")
          .as("drop_ppm"))
      .orderBy("event_type")
  }

  /** x536 — l-diversity audit ([[Curation.lDiversityAudit]]): the
    * homogeneity-attack complement of x154's k-anonymity — a (nation,
    * segment) class where every customer sits in the SAME $1000 balance
    * band leaks the balance even when the class is k-large. Per
    * l ∈ {2,3,5}: violating classes and rows exposed. Bands offset by
    * +$100k before the DIV so negative balances band identically across
    * engines (truncation-vs-floor trap). */
  private val x536: Q = (spark, sfDir) =>
    Curation.lDiversityAudit(
      Tables(spark, sfDir, "customer")
        .filter(col("c_acctbal").isNotNull)
        .withColumn("bal_band",
          expr("(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)" +
            " + 10000000) DIV 100000")),
      Seq("c_nationkey", "c_mktsegment"), "bal_band", ls = Seq(2, 3, 5))
      .orderBy("l")

  /** x537 — join-order cost audit: EXACT intermediate cardinalities for
    * the two orders of lineitem ⋈ orders ⋈ customer(BUILDING) — fact
    * first (the naive left-deep order: the full fact join materializes
    * before the selective dim cuts it) vs dim first (the selective
    * customer filter shrinks orders BEFORE touching the fact). Both end
    * at the same final count; the step-1 gap is the shuffle the
    * optimizer's join reorder saves — the fourth optimizer-stats eval
    * (x499 selectivity, x512 build side, x532 partial agg). */
  private val x537: Q = (spark, sfDir) => {
    val li = Tables(spark, sfDir, "lineitem").select(col("l_orderkey"))
    val o = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val cSeg = Tables(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val lo = li.join(o, col("l_orderkey") === col("o_orderkey"))
    val oc = o.join(cSeg, col("o_custkey") === col("c_custkey"))
    def cnt(plan: String, step: Long, inter: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_rows"))
        .select(lit(plan).as("plan"), lit(step).as("step"),
          lit(inter).as("intermediate"), col("n_rows"))
    cnt("0_fact_first", 1L, "lineitem*orders", lo)
      .unionAll(cnt("0_fact_first", 2L, "then*customer_seg",
        lo.join(cSeg, col("o_custkey") === col("c_custkey"))))
      .unionAll(cnt("1_dim_first", 1L, "orders*customer_seg", oc))
      .unionAll(cnt("1_dim_first", 2L, "then*lineitem",
        li.join(oc, col("l_orderkey") === col("o_orderkey"))))
      .orderBy("plan", "step")
  }

  /** x538 — sorted-neighborhood blocking audit
    * ([[Dedup.sortedNeighborhoodAudit]] over the even-id half-corpus):
    * the THIRD blocking family scored with the same record-linkage
    * metrics as x526 — SNM has no completeness theorem, and this
    * measures what its sort-key locality actually catches against the
    * exact prefix-filter truth; the reduction/completeness trade-off
    * table for choosing a blocker at 100 TB. */
  private val x538: Q = (spark, sfDir) =>
    Dedup.sortedNeighborhoodAudit(
      docs(spark, sfDir).filter(col("doc_id") % 2 === 0), "doc_id", "text",
      // truth = the session's verified LSH staging pairs restricted to the
      // even half — amortized across the dedup family instead of a second
      // corpus pass (x02's 2e-6 per-pair miss bound applies)
      truthPairs = Some(lshPairs(spark, sfDir)
        .filter(col("d1") % 2 === 0 && col("d2") % 2 === 0)))

  /** x539 — MMR diversity re-ranking ([[Similarity.mmrRerank]]): the
    * RAG second stage — from the exact top-20 (x05's pool), greedily
    * select 5 maximizing 0.7·relevance − 0.3·max-similarity-to-selected,
    * so the final context is relevant and non-redundant. Integer
    * micro-unit scores make every greedy argmax engine-exact; the oracle
    * unrolls all five selection rounds. Completes the retrieval stack:
    * recall curve (x517), re-rank (this), context assembly (x90). */
  private val x539: Q = (spark, sfDir) =>
    Similarity.mmrRerank(emb(spark, sfDir), queryVec(spark, sfDir))
      .orderBy("rank")

  /** x540 — vector ingest guard census: the data-quality gate an
    * embedding pipeline runs before indexing — wrong-dimension vectors
    * (truncated writes), zero-norm vectors (failed encoder calls), clean
    * count vs the modal dimension. Defects are PLANTED deterministically
    * (vec_id % 97 → truncated to 32 dims, % 101 → zeroed, the x93 NULL-
    * plant pattern) because the clean synthetic table would leave the
    * guard vacuously green. Row-local array arithmetic; the dim mode is
    * a vocabulary-bounded collapse + TakeOrdered(1). */
  private val x540: Q = (spark, sfDir) => {
    val e = emb(spark, sfDir)
      .select(col("vec_id"),
        when(col("vec_id") % 97 === 0, expr("slice(embedding, 1, 32)"))
          .when(col("vec_id") % 101 === 0,
            expr("transform(embedding, x -> CAST(0.0 AS FLOAT))"))
          .otherwise(col("embedding")).as("embedding"))
    val sizes = e.select(size(col("embedding")).as("__d"),
      expr("aggregate(embedding, CAST(0.0 AS DOUBLE)," +
        " (a, x) -> a + CAST(x AS DOUBLE) * x)").as("__sq"))
    val mode = sizes.groupBy("__d").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__d")).limit(1)
      .select(col("__d").as("__dim"))
    sizes.crossJoin(broadcast(mode))
      .agg(count(lit(1)).as("n_vecs"), max(col("__dim")).as("expected_dim"),
        sum(when(col("__d") =!= col("__dim"), 1L).otherwise(0L))
          .as("n_wrong_dim"),
        sum(when(col("__sq") === 0.0, 1L).otherwise(0L)).as("n_zero_norm"),
        sum(when(col("__d") === col("__dim") && col("__sq") > 0.0, 1L)
          .otherwise(0L)).as("n_clean"))
  }

  /** x541 — stream-stream FULL OUTER interval join
    * ([[graft.streaming.EventStream.streamStreamFullOuterPurchases]]):
    * both unmatched sides emit from state eviction — purchases that
    * provably triggered no error AND errors with provably no preceding
    * purchase, in one feed. Exercises the both-sides eviction machinery
    * x34 (inner) and x258 (left outer) never touch; the oracle derives
    * the same rows from the final-watermark closure conditions. */
  private val x541: Q = (spark, sfDir) =>
    graft.streaming.EventStream.streamStreamFullOuterPurchases(spark, sfDir)

  /** x542 — changepoint localization: the single split of the daily
    * revenue series maximizing the between-segment sum of squares
    * (binary segmentation's first step, exact integer arithmetic via
    * decimal prefix sums — argmax of U_l²/n_l + U_r²/n_r with a day
    * tie-break, U in $100 units so the per-split objective stays inside
    * BIGINT after the division; coarser units can only merge adjacent
    * ties, which the day tie-break resolves identically in both
    * engines). x204's CUSUM DETECTS drift; this LOCALIZES the
    * level shift and sizes it (mean gap in cents). Day-collapsed frame,
    * one date-bounded cumulative window, TakeOrdered(1) argmax. */
  private val x542: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate").isNotNull && col("l_extendedprice").isNotNull)
      .groupBy(to_date(col("l_shipdate")).as("__d"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100" +
        " AS BIGINT)")).as("__rev"))
    val w = Window.orderBy("__d").rowsBetween(Window.unboundedPreceding, 0)
    val tot = daily.agg(count(lit(1)).as("__n"), sum(col("__rev")).as("__s"))
    daily
      .withColumn("__cum", sum(col("__rev")).over(w))
      .withColumn("__idx", row_number().over(Window.orderBy("__d")).cast("long"))
      .crossJoin(broadcast(tot))
      .filter(col("__idx") < col("__n"))
      .select(col("__d"), col("__idx"), col("__cum"), col("__n"), col("__s"),
        expr("""CAST(CAST(__cum DIV 10000 AS DECIMAL(38,0))
               * (__cum DIV 10000) DIV __idx AS BIGINT)
              + CAST(CAST((__s - __cum) DIV 10000 AS DECIMAL(38,0))
               * ((__s - __cum) DIV 10000) DIV (__n - __idx) AS BIGINT)""")
          .as("__obj"))
      .orderBy(col("__obj").desc, col("__d"))
      .limit(1)
      .select(col("__d").as("split_day"), col("__idx").as("n_left"),
        (col("__n") - col("__idx")).as("n_right"),
        expr("__cum DIV __idx").as("mean_left_cents"),
        expr("(__s - __cum) DIV (__n - __idx)").as("mean_right_cents"),
        expr("(__s - __cum) DIV (__n - __idx) - __cum DIV __idx")
          .as("shift_cents"))
  }

  /** x543 — relationship lifecycle census: per quarter, the
    * customer–supplier pair cohort flows — active pairs, first-time
    * pairs, pairs retained from the previous quarter, and pairs whose
    * LAST activity is this quarter (right-censored at the final
    * quarter). x515 counts quarters per pair; this tracks the EDGE
    * cohort transitions a B2B churn model trains on. Pair-keyed
    * collapses, quarter-bounded rollup, one pair-keyed self-join for
    * retention. */
  private val x543: Q = (spark, sfDir) => {
    val pq = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_custkey").isNotNull && col("l_suppkey").isNotNull &&
        col("o_orderdate").isNotNull)
      .select(col("o_custkey").as("__c"), col("l_suppkey").as("__s"),
        date_trunc("quarter", col("o_orderdate")).cast("date").as("__q"))
      .distinct()
      .localCheckpoint() // four consumers below
    val fl = pq.groupBy("__c", "__s")
      .agg(min(col("__q")).as("__first"), max(col("__q")).as("__last"))
    val active = pq.groupBy(col("__q").as("quarter"))
      .agg(count(lit(1)).as("n_active"))
    val fresh = fl.groupBy(col("__first").as("quarter"))
      .agg(count(lit(1)).as("n_new"))
    val ending = fl.groupBy(col("__last").as("quarter"))
      .agg(count(lit(1)).as("n_ending"))
    val retained = pq.as("a")
      .join(pq.as("b"), col("a.__c") === col("b.__c") &&
        col("a.__s") === col("b.__s") &&
        col("b.__q") === add_months(col("a.__q"), -3))
      .groupBy(col("a.__q").as("quarter"))
      .agg(count(lit(1)).as("n_retained"))
    active.join(fresh, Seq("quarter"), "left")
      .join(retained, Seq("quarter"), "left")
      .join(ending, Seq("quarter"), "left")
      .select(col("quarter"), col("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_ending"), lit(0L)).as("n_ending"))
      .orderBy("quarter")
  }

  /** x544 — aggregation-of-aggregates methodology guard: the exact
    * global median of order totals next to the MEAN of per-nation
    * medians and the MEDIAN of per-nation medians — the two shortcuts
    * every dashboard eventually takes, with their bias in ppm. Rollups
    * of medians are NOT medians; this query puts the size of that error
    * on the record (the same reason x70 certifies its approx
    * percentiles). All medians via the x139 distinct-value cumulative
    * rank; biases via positive-only division then an exact subtraction
    * (no negative DIV, whose truncation direction differs across
    * engines). */
  private val x544: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val v = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("o_totalprice").isNotNull && col("c_nationkey").isNotNull)
      .select(col("c_nationkey").as("__g"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__v"))
    def lowerMedian(df: DataFrame, part: Seq[String]): DataFrame = {
      val keys = part.map(col)
      val coll = df.groupBy((keys :+ col("__v")): _*).agg(count(lit(1)).as("__c"))
      val w = if (part.isEmpty) Window.orderBy("__v")
        else Window.partitionBy(part.map(col): _*).orderBy("__v")
      val tot = if (part.isEmpty) df.groupBy().agg(count(lit(1)).as("__n"))
        else df.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
      val cum = coll.withColumn("__cum", sum(col("__c")).over(w))
      val joined = if (part.isEmpty) cum.crossJoin(broadcast(tot))
        else cum.join(tot, part)
      joined.filter(col("__cum") * 2 >= col("__n"))
        .groupBy(keys: _*).agg(min(col("__v")).as("__med"))
    }
    val globalMed = lowerMedian(v, Nil).select(col("__med").as("g"))
    val perNation = lowerMedian(v, Seq("__g")).select(col("__med").as("__v"))
    val meanOf = perNation.agg(count(lit(1)).as("__k"), sum(col("__v")).as("__s"))
      .select(expr("__s DIV __k").as("m1"))
    val medOf = lowerMedian(perNation, Nil).select(col("__med").as("m2"))
    globalMed.crossJoin(broadcast(meanOf)).crossJoin(broadcast(medOf))
      .select(col("g").as("global_median_cents"),
        col("m1").as("mean_of_medians_cents"),
        col("m2").as("median_of_medians_cents"),
        expr("m1 * 1000000 DIV g - 1000000").as("mean_bias_ppm"),
        expr("m2 * 1000000 DIV g - 1000000").as("median_bias_ppm"))
  }

  /** x545 — seasonal index: per calendar month, the mean monthly
    * revenue across years indexed to the all-months mean (1e6 = no
    * seasonality) — the multiplicative seasonal profile a demand
    * forecaster divides out before trend fitting. x521 measures
    * year-over-year MIX drift; this measures the stable within-year
    * LEVEL cycle. (year, month)-collapsed cells, 12-row rollup, exact
    * integer means. */
  private val x545: Q = (spark, sfDir) => {
    val cells = Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate").isNotNull && col("l_extendedprice").isNotNull)
      .groupBy(year(to_date(col("l_shipdate"))).as("__y"),
        month(to_date(col("l_shipdate"))).as("month"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100" +
        " AS BIGINT)")).as("__rev"))
    val grand = cells.agg(count(lit(1)).as("__nc"), sum(col("__rev")).as("__t"))
      .select(expr("__t DIV __nc").as("__gm"))
    cells.groupBy("month")
      .agg(count(lit(1)).as("n_years"), sum(col("__rev")).as("__s"))
      .crossJoin(broadcast(grand))
      .select(col("month"), col("n_years"),
        expr("__s DIV n_years").as("month_mean_cents"),
        expr("(__s DIV n_years) * 1000000 DIV __gm").as("index_ppm"))
      .orderBy("month")
  }

  /** x546 — t-closeness audit: the third privacy lens after k-anonymity
    * (x154) and l-diversity (x536) — a class can be k-large and
    * l-diverse yet still leak when its sensitive DISTRIBUTION diverges
    * from the global one. Per (nation, segment) class: the exact 1-D
    * earth-mover's distance between the class's balance-band
    * distribution and the global one (unit band spacing ⇒ EMD =
    * Σ|CDF_class − CDF_global|, in ppm·bands), rolled into a census by
    * EMD band plus the max. Distinct-band collapse, class×band spine,
    * class-partitioned cumulative windows. */
  private val x546: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val b = Tables(spark, sfDir, "customer")
      .filter(col("c_acctbal").isNotNull)
      .select(col("c_nationkey").as("__n"), col("c_mktsegment").as("__m"),
        expr("(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          " + 10000000) DIV 100000").as("__v"))
    val cls = b.groupBy("__n", "__m", "__v").agg(count(lit(1)).as("__c"))
    val clsTot = b.groupBy("__n", "__m").agg(count(lit(1)).as("__nc"))
    val glob = b.groupBy("__v").agg(count(lit(1)).as("__gc"))
    val globTot = b.agg(count(lit(1)).as("__ng"))
    // spine: every class × every observed band (bands are spend-bounded)
    val spine = clsTot.crossJoin(glob.select(col("__v")))
    val wCls = Window.partitionBy("__n", "__m").orderBy("__v")
    val filled = spine
      .join(cls, Seq("__n", "__m", "__v"), "left")
      .join(glob, Seq("__v"))
      .crossJoin(broadcast(globTot))
      .select(col("__n"), col("__m"), col("__v"), col("__nc"),
        coalesce(col("__c"), lit(0L)).as("__c"), col("__gc"), col("__ng"))
      .withColumn("__cumc", sum(col("__c")).over(wCls))
      .withColumn("__cumg", sum(col("__gc")).over(wCls))
    val emd = filled
      .select(col("__n"), col("__m"),
        abs(expr("__cumc * 1000000 DIV __nc - __cumg * 1000000 DIV __ng"))
          .as("__gap"))
      .groupBy("__n", "__m").agg(sum(col("__gap")).as("__emd"))
    emd.select(when(col("__emd") < 100000L, "0_lt_0.1")
        .when(col("__emd") < 300000L, "1_lt_0.3")
        .when(col("__emd") < 1000000L, "2_lt_1.0")
        .otherwise("3_ge_1.0").as("emd_band"))
      .groupBy("emd_band").agg(count(lit(1)).as("n_classes"))
      .crossJoin(broadcast(emd.agg(max(col("__emd")).as("max_emd_ppm_bands"))))
      .orderBy("emd_band")
  }

  /** x547 — delta-varint layout advisor: how many bytes would
    * delta+varint encoding save on the SORTED o_orderkey column vs raw
    * 8-byte longs — the storage-engineering number behind "sort your
    * files before writing" (x47/x132's layout family). The first value
    * encodes as a varint of itself, each later one as a varint of its
    * gap. Adjacent gaps via the TWO-PHASE range-partitioned lag
    * (pid-local windows + a partition-count-bounded boundary frame —
    * never a single-task corpus sort); varint width via the 7-bit band
    * CASE both engines compute identically. */
  private val x547: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val keys = Tables(spark, sfDir, "orders")
      .select(col("o_orderkey").as("__k")).distinct()
      .repartitionByRange(col("__k"))
      .withColumn("__pid", spark_partition_id())
    val inner = keys
      .withColumn("__prev",
        lag(col("__k"), 1).over(Window.partitionBy("__pid").orderBy("__k")))
      .filter(col("__prev").isNotNull)
      .select((col("__k") - col("__prev")).as("__g"))
    // boundary gaps: one row per range partition (partition-count-bounded)
    val bounds = keys.groupBy("__pid")
      .agg(min(col("__k")).as("__mn"), max(col("__k")).as("__mx"))
      .withColumn("__pmx", lag(col("__mx"), 1).over(Window.orderBy("__pid")))
      .select(coalesce(col("__mn") - col("__pmx"), col("__mn")).as("__g"))
    val gaps = inner.unionAll(bounds)
    def varintBytes(g: Column): Column =
      when(g < (1L << 7), 1L).when(g < (1L << 14), 2L)
        .when(g < (1L << 21), 3L).when(g < (1L << 28), 4L)
        .when(g < (1L << 35), 5L).when(g < (1L << 42), 6L)
        .when(g < (1L << 49), 7L).when(g < (1L << 56), 8L).otherwise(9L)
    gaps.agg(count(lit(1)).as("n_values"),
        sum(varintBytes(col("__g"))).as("delta_varint_bytes"))
      .select(col("n_values"), (col("n_values") * 8L).as("raw_bytes"),
        col("delta_varint_bytes"),
        expr("""(n_values * 8 - delta_varint_bytes) * 1000000
              DIV (n_values * 8)""").as("savings_ppm"))
  }

  /** x548 — layout skipping comparison: the layout-decision number.
    * Assign orders to 64 simulated files under two layouts — (a) sorted
    * by month only, (b) clustered by the Morton cell of (custkey bucket
    * × month bucket) — build each file's (month, custkey) min/max
    * manifest, and count the files a BOTH-DIMS-SELECTIVE range probe
    * (one year × one custkey octile) must read. Single-axis sort cannot
    * skip on the second dim, so it reads every file of the probe year;
    * the z-layout bounds both dims per file and reads a fraction of
    * that. Flip the probe to a single wide dim and the verdict flips
    * too — which is exactly the decision this advisor quantifies (x42
    * proves the pruned read is CORRECT; this measures when it is
    * CHEAPER). File ranks via the two-phase range rank; manifests are
    * file-count-bounded. */
  private val x548: Q = (spark, sfDir) => {
    import graft.operators.{Sampling, ZOrder}
    val o = Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate").isNotNull && col("o_custkey").isNotNull)
      .select(col("o_orderkey").as("__k"), col("o_custkey").as("__c"),
        ((year(col("o_orderdate")) - 1992) * 12 +
          month(col("o_orderdate")) - 1).cast("long").as("__md"))
    val mx = o.agg(max(col("__c")).as("__mc"), count(lit(1)).as("__n"))
    val base = o.crossJoin(broadcast(mx))
      // month ids run 36..115 in this data; offset+width keeps the month
      // bucket inside the 3-bit cell domain (aliasing past 2^bits would
      // silently fold distant months into one cell)
      .withColumn("__zc", ZOrder.zcell(
        expr("CAST(__c DIV (__mc DIV 8 + 1) AS INT)"),
        expr("CAST(least(greatest(__md - 36, 0) DIV 10, 7) AS INT)"), 3)
        .cast("long"))
      .localCheckpoint() // consumed by both layout rankings
    def layout(label: String, valueCol: String): DataFrame = {
      val ranked = Sampling.globalRankRange(
        base.select(col("__k"), col(valueCol)), "__k", valueCol)
        .select(col("__k"), col("global_rank"))
      ranked.join(base.select("__k", "__c", "__md", "__mc", "__n"), "__k")
        .withColumn("__f", expr("(global_rank - 1) DIV ((__n + 63) DIV 64)"))
        .groupBy("__f")
        .agg(count(lit(1)).as("__rows"),
          min(col("__md")).as("__dlo"), max(col("__md")).as("__dhi"),
          min(col("__c")).as("__clo"), max(col("__c")).as("__chi"),
          max(col("__mc")).as("__mc"))
        .select(lit(label).as("layout"), col("__rows"),
          // probe box: months 48–59 (one year) × custkey [max/8, max/4]
          (col("__dlo") <= lit(59L) && col("__dhi") >= lit(48L) &&
            col("__clo") <= expr("__mc DIV 4") &&
            col("__chi") >= expr("__mc DIV 8")).as("__read"))
        .groupBy("layout")
        .agg(count(lit(1)).as("n_files"),
          sum(when(col("__read"), 1L).otherwise(0L)).as("n_files_read"),
          sum(when(col("__read"), col("__rows")).otherwise(0L))
            .as("rows_read"),
          sum(col("__rows")).as("__tot"))
        .select(col("layout"), col("n_files"), col("n_files_read"),
          expr("n_files_read * 1000000 DIV n_files").as("files_read_ppm"),
          col("rows_read"),
          expr("rows_read * 1000000 DIV __tot").as("rows_read_ppm"))
    }
    layout("0_sort_by_month", "__md")
      .unionAll(layout("1_zorder_cell", "__zc"))
      .orderBy("layout")
  }

  /** x532 — partial-agg effectiveness advisor: for each candidate
    * group-by key of lineitem, the map-side combine reduction factor
    * (1 − groups/rows, in ppm) and the verdict — the number that decides
    * whether partial aggregation pays at 100 TB (high-cardinality keys
    * make the combine a pure CPU tax; low-cardinality keys collapse the
    * exchange by orders of magnitude). The aggregation-side sibling of
    * x512's join build-side advisor and x499's selectivity catalog.
    * One key-collapsed count per candidate. */
  private val x532: Q = (spark, sfDir) => {
    val li = Tables(spark, sfDir, "lineitem")
    def eval(label: String, keys: Column*): DataFrame = {
      val g = li.groupBy(keys: _*).agg(count(lit(1)).as("__c"))
      g.agg(sum(col("__c")).as("n_rows"), count(lit(1)).as("n_groups"))
        .select(lit(label).as("key_candidate"), col("n_rows"), col("n_groups"),
          expr("(n_rows - n_groups) * 1000000 DIV n_rows").as("reduction_ppm"))
    }
    Seq(
      eval("l_returnflag", col("l_returnflag")),
      eval("l_suppkey", col("l_suppkey")),
      eval("l_partkey", col("l_partkey")),
      eval("l_partkey,l_suppkey", col("l_partkey"), col("l_suppkey")),
      eval("l_orderkey", col("l_orderkey")))
      .reduce(_.unionAll(_))
      .select(col("key_candidate"), col("n_rows"), col("n_groups"),
        col("reduction_ppm"),
        when(col("reduction_ppm") >= 900000L, "0_combine_wins")
          .when(col("reduction_ppm") >= 500000L, "1_combine_helps")
          .otherwise("2_skip_partial").as("verdict"))
      .orderBy("key_candidate")
  }

  /** x533 — bitemporal as-of audit: VALID time × TRANSACTION time over a
    * synthesized part-price history (every part has a 1992 base row;
    * key%10=0 parts get a 1996-recorded restatement valid from 1995;
    * key%10=5 parts get a 1997-recorded BACKDATED fix valid from 1994).
    * Two reads at the same valid date 1995-06-01 — one as-known-at
    * 1995-12-31, one as-known-now — show how restatements and
    * late-arriving facts change history: the two-axis generalization of
    * x123's single-axis snapshot and the audit SCD2 (x38) cannot answer
    * ("what did we BELIEVE the 1995 price was, before the 1996
    * restatement landed?"). Per-read: latest valid_from ≤ V among rows
    * with txn ≤ T, ties to latest txn — one part-partitioned window. */
  private val x533: Q = (spark, sfDir) => {
    val base = Tables(spark, sfDir, "part")
      .filter(col("p_retailprice").isNotNull)
      .select(col("p_partkey"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
    val versions = base.select(col("p_partkey"), col("__c").as("price_cents"),
        lit("1992-01-01").cast("date").as("valid_from"),
        lit("1992-06-01").cast("date").as("txn_at"))
      .unionAll(base.filter(col("p_partkey") % 10 === 0)
        .select(col("p_partkey"), (col("__c") + 100L).as("price_cents"),
          lit("1995-01-01").cast("date").as("valid_from"),
          lit("1996-06-01").cast("date").as("txn_at")))
      .unionAll(base.filter(col("p_partkey") % 10 === 5)
        .select(col("p_partkey"), (col("__c") - 50L).as("price_cents"),
          lit("1994-01-01").cast("date").as("valid_from"),
          lit("1997-06-01").cast("date").as("txn_at")))
    def readAsOf(label: String, txnAsOf: String): DataFrame =
      versions
        .filter(col("valid_from") <= lit("1995-06-01").cast("date") &&
          col("txn_at") <= lit(txnAsOf).cast("date"))
        .groupBy("p_partkey")
        .agg(max(struct(col("valid_from"), col("txn_at"), col("price_cents")))
          .as("__v"))
        .select(col("p_partkey"), col("__v.price_cents").as("__p"),
          col("__v.txn_at").as("__t"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("__p")).as("sum_price_cents"),
          sum(when(col("__t") > lit("1993-01-01").cast("date"), 1L)
            .otherwise(0L)).as("n_restated"))
        .select(lit(label).as("read_label"), col("n_parts"),
          col("sum_price_cents"), col("n_restated"))
    readAsOf("0_as_known_1995", "1995-12-31")
      .unionAll(readAsOf("1_as_known_now", "2026-01-01"))
      .orderBy("read_label")
  }

  /** x534 — image brightness-histogram census
    * ([[graft.operators.Multimodal.extractHistogramFeatures]]): per image
    * through the real decode, the 16-bin histogram's peak — bin index
    * (lowest on ties) and count, plus flatness in ppm of ideal (1e6 =
    * perfectly flat) — the exposure/banding triage that catches clipped
    * or synthetic-fill images before training. x12 certifies pixel MASS,
    * x491 adjacency, x525 the index map; this certifies the VALUE
    * DISTRIBUTION through the codec. */
  private val x534: Q = (spark, sfDir) => {
    val media = graft.operators.Multimodal.renderImageTable(spark,
      docs(spark, sfDir).filter(col("doc_id") % 4 === 2))
    graft.operators.Multimodal.extractHistogramFeatures(spark, media)
      .toDF().orderBy("doc_id")
  }

  /** x528 — join-cardinality estimator audit: the optimizer-statistics
    * eval next to x499's selectivity catalog and x512's build-side
    * advisor — estimate the self-equijoin cardinality of lineitem on
    * l_partkey from a 10-heavy-hitter histogram (exact top-10 counts +
    * uniform remainder, the classic end-biased histogram), against the
    * exact Σc². err_ppm is the price of the uniformity assumption — the
    * number that decides whether stats are fresh enough to trust a plan.
    * Key-collapsed frame; top-10 via TakeOrdered, never a global sort. */
  private val x528: Q = (spark, sfDir) => {
    val keys = Tables(spark, sfDir, "lineitem")
      .filter(col("l_partkey").isNotNull)
      .groupBy("l_partkey").agg(count(lit(1)).as("__c"))
    val top = keys.orderBy(col("__c").desc, col("l_partkey")).limit(10)
      .agg(count(lit(1)).as("__topk"), sum(col("__c")).as("__top_rows"),
        sum(col("__c").cast("decimal(38,0)") * col("__c")).as("__top_sq"))
    val all = keys.agg(count(lit(1)).as("n_keys"),
      sum(col("__c")).as("n_rows"),
      sum(col("__c").cast("decimal(38,0)") * col("__c")).as("__sq"))
    all.crossJoin(broadcast(top))
      .select(col("n_rows"), col("n_keys"),
        expr("CAST(__sq AS BIGINT)").as("exact_pairs"),
        expr("""CAST(__top_sq + CASE WHEN n_keys > __topk THEN
              CAST(n_rows - __top_rows AS DECIMAL(38,0)) * (n_rows - __top_rows)
               DIV (n_keys - __topk) ELSE 0 END AS BIGINT)""").as("est_pairs"))
      .select(col("n_rows"), col("n_keys"), col("exact_pairs"), col("est_pairs"),
        expr("abs(est_pairs - exact_pairs) * 1000000 DIV exact_pairs")
          .as("err_ppm"))
  }

  /** x517 — ANN recall-k curve: banded-LSH top-k overlap with the exact
    * brute-force top-k at k = 1/5/10/20 — x217 scores ONE k; retrieval
    * quality is a CURVE (head recall ≠ tail recall), and this is the
    * table an ANN rollout signs off on. Both sides reuse the
    * oracle-gated x05/x22 machinery. */
  private val x517: Q = (spark, sfDir) => {
    val e = emb(spark, sfDir)
    val q = queryVec(spark, sfDir)
    Seq(1, 5, 10, 20).map { k =>
      val truth = Similarity.bruteForceTopK(e, q, k).select(col("vec_id"))
      val approx = Similarity.annBandedTopK(e, q, k).select(col("vec_id"))
      truth.join(approx, "vec_id")
        .agg(count(lit(1)).as("overlap"))
        .select(lit(k.toLong).as("k"), col("overlap"),
          expr(s"overlap * 1000000 DIV $k").as("recall_ppm"))
    }.reduce(_.unionAll(_)).orderBy("k")
  }

  /** x518 — hub removal sweep: the share of co-purchase edges incident
    * to the top-1/5/10 degree hubs — the attack-surface curve behind
    * x163's concentration and x495's rich club (if removing one part
    * kills a third of the graph, the recommendation engine has a single
    * point of failure). Degree collapse + three semi-join counts. */
  private val x518: Q = (spark, sfDir) => {
    val canon = copurchaseEdges(spark, sfDir)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = canon.select(col("u").as("node"))
      .unionAll(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("__d"))
    val tot = canon.agg(count(lit(1)).as("__t"))
    Seq(1, 5, 10).map { k =>
      val hubs = deg.orderBy(col("__d").desc, col("node")).limit(k)
        .select(col("node"))
      val lost = canon
        .join(broadcast(hubs.select(col("node").as("u"))), Seq("u"), "left_semi")
        .unionAll(canon.join(broadcast(hubs.select(col("node").as("v"))),
          Seq("v"), "left_semi").select(col("u"), col("v")))
        .distinct()
        .agg(count(lit(1)).as("edges_lost"))
      lost.crossJoin(broadcast(tot))
        .select(lit(k.toLong).as("n_hubs_removed"), col("edges_lost"),
          expr("edges_lost * 1000000 DIV __t").as("edge_share_ppm"))
    }.reduce(_.unionAll(_)).orderBy("n_hubs_removed")
  }

  /** x519 — length tail ratio: per source, exact p99/p50 of document
    * length (milli ratio from distinct-value ranks) — tail-heaviness in
    * one number per feed (x391 gives the global quantiles; a fat tail
    * in ONE source is a scraping bug, not a corpus property). */
  private val x519: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val d = docs(spark, sfDir)
      .filter(col("source").isNotNull && col("n_chars").isNotNull)
      .select(col("source"), col("n_chars").as("__v"))
    val coll = d.groupBy("source", "__v").agg(count(lit(1)).as("__c"))
    val tot = d.groupBy("source").agg(count(lit(1)).as("n_docs"))
    coll
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy("source").orderBy("__v")))
      .join(tot, "source")
      .groupBy("source")
      .agg(max(col("n_docs")).as("n_docs"),
        min(when(col("__cum") * 2 >= col("n_docs"), col("__v"))).as("p50_chars"),
        min(when(col("__cum") * 100 >= col("n_docs") * 99, col("__v")))
          .as("p99_chars"))
      .select(col("source"), col("n_docs"), col("p50_chars"), col("p99_chars"),
        expr("1000 * p99_chars DIV p50_chars").as("tail_ratio_milli"))
      .orderBy("source")
  }

  /** x514 — product family census: bounded-round label propagation
    * (x18's 3-round [[Dedup.dupClusters]]) over co-purchase edges with
    * support ≥ 2 (pairs co-bought in ≥ 2 orders — one-off coincidences
    * pruned), then a family-size census — the merchandising "product
    * family" discovery readout. Fifth consumer of the co-purchase
    * staging memo; 3-round labels are deterministic by construction. */
  private val x514: Q = (spark, sfDir) => {
    val strong = copurchaseEdges(spark, sfDir)
      .groupBy(col("src").as("d1"), col("dst").as("d2"))
      .agg(count(lit(1)).as("__w"))
      .filter(col("__w") >= 2)
      .select(col("d1"), col("d2"))
    val sizes = Dedup.dupClusters(strong, 3)
      .groupBy("cluster").agg(count(lit(1)).as("__sz"))
    val tot = sizes.agg(count(lit(1)).as("__t"))
    sizes.groupBy(length(bin(col("__sz"))).cast("long").as("size_log2_band"))
      .agg(count(lit(1)).as("n_families"), sum(col("__sz")).as("n_parts"))
      .crossJoin(broadcast(tot))
      .select(col("size_log2_band"), col("n_families"), col("n_parts"),
        expr("n_families * 1000000 DIV __t").as("share_ppm"))
      .orderBy("size_log2_band")
  }

  /** x515 — relationship stickiness: distinct customer–supplier pairs
    * by the number of QUARTERS they transact in (1 / 2 / 3–5 / 6+) —
    * repeat B2B relationships are the moat; one-quarter pairs are spot
    * purchases. Pair-keyed distinct collapse, quarter-bounded. */
  private val x515: Q = (spark, sfDir) => {
    val pq = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_custkey").isNotNull && col("l_suppkey").isNotNull &&
        col("o_orderdate").isNotNull)
      .select(col("o_custkey").as("__c"), col("l_suppkey").as("__s"),
        date_trunc("quarter", col("o_orderdate")).cast("date").as("__q"))
      .distinct()
      .groupBy("__c", "__s").agg(count(lit(1)).as("__nq"))
    val tot = pq.agg(count(lit(1)).as("__t"))
    pq.select(when(col("__nq") === 1, "0_one_quarter")
        .when(col("__nq") === 2, "1_two_quarters")
        .when(col("__nq") <= 5, "2_three_to_five")
        .otherwise("3_six_plus").as("stickiness_band"))
      .groupBy("stickiness_band").agg(count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(tot))
      .select(col("stickiness_band"), col("n_pairs"),
        expr("n_pairs * 1000000 DIV __t").as("share_ppm"))
      .orderBy("stickiness_band")
  }

  /** x516 — buyer breadth quadrants: customers split at the exact
    * median order count × median distinct-brand breadth
    * (loyal-narrow / loyal-broad / casual-narrow / casual-broad) — the
    * commerce analog of x396's engagement quadrants, on purchase
    * frequency × assortment breadth instead of event mix. Medians via
    * distinct-value ranks; census is 4 cells. */
  private val x516: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val per = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("o_custkey").isNotNull && col("p_brand").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderkey")).as("__orders"),
        countDistinct(col("p_brand")).as("__brands"))
    def median(c: String) = per.groupBy(col(c).as("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(Window.orderBy("__v")))
      .crossJoin(broadcast(per.agg(count(lit(1)).as("__n"))))
      .agg(min(when(col("__cum") * 2 >= col("__n"), col("__v"))).as("med"))
    val mo = median("__orders").select(col("med").as("__mo"))
    val mb = median("__brands").select(col("med").as("__mb"))
    val tot = per.agg(count(lit(1)).as("__t"))
    per.crossJoin(broadcast(mo)).crossJoin(broadcast(mb))
      .select(
        concat(
          when(col("__orders") >= col("__mo"), lit("frequent")).otherwise(lit("casual")),
          lit("_"),
          when(col("__brands") >= col("__mb"), lit("broad")).otherwise(lit("narrow")))
          .as("quadrant"))
      .groupBy("quadrant").agg(count(lit(1)).as("n_customers"))
      .crossJoin(broadcast(tot))
      .select(col("quadrant"), col("n_customers"),
        expr("n_customers * 1000000 DIV __t").as("share_ppm"))
      .orderBy("quadrant")
  }

  /** x511 — domestic vs foreign delay: ship-delay level (exact median +
    * milli mean) for same-nation vs cross-nation customer–supplier
    * lines — the logistics-distance readout behind x470's homophily
    * scalar (if foreign lines aren't slower, nation-locality buys
    * nothing). Distinct-value medians per 2-row group. */
  private val x511: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sfDir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .filter(col("l_shipdate").isNotNull && col("o_orderdate").isNotNull)
      .select(
        when(col("c_nationkey") === col("s_nationkey"), "0_domestic")
          .otherwise("1_foreign").as("relationship"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("__x"))
      .filter(col("__x") >= 0)
    val coll = d.groupBy("relationship", "__x").agg(count(lit(1)).as("__c"))
    val tot = d.groupBy("relationship")
      .agg(count(lit(1)).as("n_lines"), sum(col("__x")).as("__sx"))
    coll
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy("relationship").orderBy("__x")))
      .join(tot, "relationship")
      .groupBy("relationship")
      .agg(max(col("n_lines")).as("n_lines"),
        min(when(col("__cum") * 2 >= col("n_lines"), col("__x")))
          .as("median_delay_days"),
        expr("CAST(MAX(1000 * __sx DIV n_lines) AS BIGINT)")
          .as("mean_delay_milli"))
      .orderBy("relationship")
  }

  /** x512 — build-side advisor: for the workload's four hot joins, both
    * sides' row and distinct-key counts plus the recommended build side
    * and a broadcast-eligibility flag (≤ 100k rows at this SF — the knob
    * scales with executor memory) — the planner-statistics table x176's
    * cardinality estimates feed into. One aggregate per side. */
  private val x512: Q = (spark, sfDir) => {
    import spark.implicits._
    def stats(t: String, k: String) = Tables(spark, sfDir, t)
      .agg(count(lit(1)).as("rows"), countDistinct(col(k)).as("keys"))
      .select(lit(t).as("t"), col("rows"), col("keys"))
    val joins = Seq(
      ("1_lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("2_orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("3_lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("4_lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"))
    joins.map { case (name, lt, lk, rt, rk) =>
      stats(lt, lk).crossJoin(
          stats(rt, rk).select(col("t").as("t2"), col("rows").as("rows2"),
            col("keys").as("keys2")))
        .select(lit(name).as("join_name"),
          col("rows").as("left_rows"), col("keys").as("left_keys"),
          col("rows2").as("right_rows"), col("keys2").as("right_keys"),
          when(col("rows2") <= col("rows"), col("t2")).otherwise(col("t"))
            .as("build_side"),
          (least(col("rows"), col("rows2")) <= 100000L).cast("int")
            .as("broadcast_ok"))
    }.reduce(_.unionAll(_)).orderBy("join_name")
  }

  /** x513 — cross-system value KS: exact Kolmogorov–Smirnov distance
    * between the event-stream purchase values and the order-ledger
    * totals (cents grid, cross-multiplied ppm) — the two systems claim
    * to describe the same commerce; this measures how far their value
    * DISTRIBUTIONS actually are (x233 reconciles totals; distributions
    * drift first). Distinct-value grids only. */
  private val x513: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val a = Tables(spark, sfDir, "events")
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("__v"))
    val b = Tables(spark, sfDir, "orders")
      .filter(col("o_totalprice").isNotNull)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("__v"))
    val grid = a.select("__v").union(b.select("__v")).distinct()
    def cum(df: org.apache.spark.sql.DataFrame) = grid
      .join(df.groupBy("__v").agg(count(lit(1)).as("__c")), Seq("__v"), "left")
      .select(col("__v"), coalesce(col("__c"), lit(0L)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(Window.orderBy("__v")))
      .select(col("__v"), col("__cum"))
    val na = a.agg(count(lit(1)).as("__na"))
    val nb = b.agg(count(lit(1)).as("__nb"))
    cum(a).withColumnRenamed("__cum", "__ca")
      .join(cum(b).withColumnRenamed("__cum", "__cb"), "__v")
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .select(col("__na"), col("__nb"),
        expr("""abs(__ca * __nb - __cb * __na) * 1000000
              DIV (CAST(__na AS DECIMAL(38,0)) * __nb)""").as("__d"))
      .groupBy()
      .agg(max(col("__na")).as("n_purchases"), max(col("__nb")).as("n_orders"),
        max(col("__d")).cast("long").as("ks_ppm"))
  }

  /** x508 — return by delay band: return-flag share by ship-delay band
    * (0–30 / 31–60 / 61–90 / 90+) — the "late shipments come back"
    * causal smell x385 (price) and x404 (quantity) don't test. One
    * scan, band census with exact ppm rates. */
  private val x508: Q = (spark, sfDir) => {
    val d = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate").isNotNull && col("o_orderdate").isNotNull &&
        col("l_returnflag").isNotNull)
      .select(
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("__d"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("__r"))
      .filter(col("__d") >= 0)
      .select(when(col("__d") <= 30, "0_0_30")
        .when(col("__d") <= 60, "1_31_60")
        .when(col("__d") <= 90, "2_61_90")
        .otherwise("3_over_90").as("delay_band"), col("__r"))
    d.groupBy("delay_band")
      .agg(count(lit(1)).as("n_lines"), sum(col("__r")).as("__ret"))
      .select(col("delay_band"), col("n_lines"),
        expr("__ret * 1000000 DIV n_lines").as("return_ppm"))
      .orderBy("delay_band")
  }

  /** x509 — order-total conformance: o_totalprice vs the line-derived
    * total `Σ ext·(100−disc%)·(100+tax%) DIV 10000` in exact cents,
    * banded by ppm deviation — the header-vs-detail ledger audit (x264
    * catches duplicate charges; this catches the arithmetic). Percent
    * factors round to integer percents so the reconstruction is
    * engine-exact. */
  private val x509: Q = (spark, sfDir) => {
    val lines = Tables(spark, sfDir, "lineitem")
      .filter(col("l_extendedprice").isNotNull && col("l_discount").isNotNull &&
        col("l_tax").isNotNull)
      .select(col("l_orderkey"),
        expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
              * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)) DIV 10000""")
          .as("__amt"))
      .groupBy("l_orderkey").agg(sum(col("__amt")).as("__derived"))
    val j = Tables(spark, sfDir, "orders")
      .filter(col("o_totalprice").isNotNull)
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__hdr"))
      .join(lines, col("o_orderkey") === col("l_orderkey"))
      .select(expr("abs(__hdr - __derived) * 1000000 DIV __hdr").as("__dev"))
    val tot = j.agg(count(lit(1)).as("__t"))
    j.select(when(col("__dev") === 0, "0_exact")
        .when(col("__dev") < 10000L, "1_under_1pct")
        .when(col("__dev") < 50000L, "2_under_5pct")
        .otherwise("3_material").as("deviation_band"))
      .groupBy("deviation_band").agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(tot))
      .select(col("deviation_band"), col("n_orders"),
        expr("n_orders * 1000000 DIV __t").as("share_ppm"))
      .orderBy("deviation_band")
  }

  /** x510 — degree mixing matrix: the log2-banded 2D census of
    * (customer-side degree × supplier-side degree) over purchase-graph
    * edges — the full table behind x442's single assortativity scalar
    * (which cells carry the edge mass: hub-hub, hub-leaf, leaf-leaf?).
    * Node-bounded degree collapses, edge-keyed joins, bands via exact
    * `length(bin(d))`. */
  private val x510: Q = (spark, sfDir) => {
    val e = purchaseEdges(spark, sfDir)
    val dc = e.groupBy("src").agg(count(lit(1)).as("__dc"))
    val ds = e.groupBy("dst").agg(count(lit(1)).as("__ds"))
    val m = e.join(dc, "src").join(ds, "dst")
      .select(length(bin(col("__dc"))).cast("long").as("cust_deg_band"),
        length(bin(col("__ds"))).cast("long").as("supp_deg_band"))
    val tot = m.agg(count(lit(1)).as("__t"))
    m.groupBy("cust_deg_band", "supp_deg_band")
      .agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(tot))
      .select(col("cust_deg_band"), col("supp_deg_band"), col("n_edges"),
        expr("n_edges * 1000000 DIV __t").as("share_ppm"))
      .orderBy("cust_deg_band", "supp_deg_band")
  }

  /** x505 — LSH config invariance: verified near-dup pair counts at
    * three high-recall band layouts (96×2, 64×3, 48×4) — because every
    * candidate passes EXACT verification, the final pair set must be
    * config-INDEPENDENT (each layout's per-pair miss probability is
    * ≤ ~1e-5 at τ = 0.7), and this certifies it against the exact
    * oracle. The table that licenses tuning bands for COST without
    * re-validating correctness. */
  private val x505: Q = (spark, sfDir) => {
    import spark.implicits._
    Seq((96, 2), (64, 3), (48, 4)).map { case (b, r) =>
      val n = Dedup.minhashLsh(docs(spark, sfDir), "doc_id", "text",
        numBands = b, rowsPerBand = r, threshold = 0.7)
        .agg(count(lit(1)).as("n_pairs"))
      n.select(lit(b.toLong).as("num_bands"), lit(r.toLong).as("rows_per_band"),
        col("n_pairs"))
    }.reduce(_.unionAll(_)).orderBy("num_bands")
  }

  /** x506 — probe-depth certificate: rank the IVF label-centroid cells
    * by query cosine and report how deep a probe must go to cover the
    * ENTIRE brute-force top-10 — the nProbe setting justified by
    * measurement instead of folklore (x30 assumes a probe count; x217
    * scores recall after the fact). Centroids are the x58 decimal-exact
    * construction; everything is |cells|-bounded. */
  private val x506: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val e = emb(spark, sfDir)
    val q = queryVec(spark, sfDir)
    val cent = e.select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy("label", "d")
      .agg(sum(col("v").cast(DecimalType(28, 9))).as("s"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("s")))),
        x => x.getField("s").cast("float")).as("cvec"))
    val cellRank = cent.crossJoin(broadcast(q))
      .select(col("label"),
        Similarity.cosine(col("cvec"), col("qe")).as("__sc"))
      .withColumn("cell_rank", row_number().over(
        Window.orderBy(col("__sc").desc, col("label"))).cast("long"))
    val top10 = Similarity.bruteForceTopK(e, q, 10)
      .join(e.select(col("vec_id"), col("label")), "vec_id")
      .select(col("label")).distinct()
    top10.join(cellRank, "label")
      .agg(count(lit(1)).as("n_cells_holding_top10"),
        max(col("cell_rank")).as("probe_depth"),
        min(col("cell_rank")).as("best_cell_rank"))
      .crossJoin(broadcast(cellRank.agg(count(lit(1)).as("n_cells"))))
      .select(lit(10L).as("k"), col("n_cells"), col("n_cells_holding_top10"),
        col("probe_depth"), col("best_cell_rank"))
  }

  /** x507 — failover coverage: per brand, the parts a single supplier
    * carries (no failover path) and the revenue share riding them — the
    * supply-chain fragility table (x473 prices the alternatives; this
    * counts where NONE exist). Part-keyed collapses. */
  private val x507: Q = (spark, sfDir) => {
    val lp = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull && col("l_suppkey").isNotNull)
      .select(col("p_brand").as("brand"), col("l_partkey").as("__pk"),
        col("l_suppkey").as("__sk"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
    val perPart = lp.groupBy("brand", "__pk")
      .agg(countDistinct(col("__sk")).as("__ns"), sum(col("__c")).as("__rev"))
    perPart.groupBy("brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("__ns") === 1, 1L).otherwise(0L)).as("single_supplier_parts"),
        sum(col("__rev")).as("__tot"),
        sum(when(col("__ns") === 1, col("__rev")).otherwise(0L)).as("__risk"))
      .select(col("brand"), col("n_parts"), col("single_supplier_parts"),
        expr("single_supplier_parts * 1000000 DIV n_parts").as("fragile_part_ppm"),
        expr("__risk * 1000000 DIV __tot").as("revenue_at_risk_ppm"))
      .orderBy("brand")
  }

  /** x502 — source vocabulary influence: for each source, how many of
    * the corpus top-20 terms survive when that source is REMOVED
    * (leave-one-out overlap@20) — the single-feed-dominance audit: a
    * source whose removal reshuffles the head vocabulary owns the
    * distribution. Term counts collapse once; per-source LOO ranks are
    * windows over the (terms × sources)-bounded candidate frame. */
  private val x502: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val words = docs(spark, sfDir)
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val global = words.groupBy("w").agg(count(lit(1)).as("__g"))
    val top20 = global.orderBy(col("__g").desc, col("w")).limit(20)
      .select(col("w"), lit(1).as("__top"))
    // candidates: global top-60 is a superset of every LOO top-20 only if
    // no source holds > the gap — use the full collapsed vocab instead:
    // (terms × sources) stays vocabulary-bounded
    val perSrc = words.groupBy("source", "w").agg(count(lit(1)).as("__c"))
    val loo = global.join(perSrc, Seq("w"))
      .select(col("source"), col("w"), (col("__g") - col("__c")).as("__rest"))
    // terms the source never uses keep their full global count in the LOO
    // ranking; union them in per source
    val sources = perSrc.select("source").distinct()
    val full = sources.crossJoin(global)
      .join(loo, Seq("source", "w"), "left")
      .select(col("source"), col("w"),
        coalesce(col("__rest"), col("__g")).as("__n"))
    val looTop = full.withColumn("__rk", row_number().over(
        Window.partitionBy("source").orderBy(col("__n").desc, col("w"))))
      .filter(col("__rk") <= 20)
    looTop.join(broadcast(top20), Seq("w"), "left")
      .groupBy("source")
      .agg(sum(when(col("__top").isNotNull, 1L).otherwise(0L)).as("overlap_at_20"))
      .select(col("source"), col("overlap_at_20"),
        expr("overlap_at_20 * 1000000 DIV 20").as("stability_ppm"))
      .orderBy("source")
  }

  /** x503 — weekday ANOVA: how much of the daily event-count variance do
    * weekday means explain (exact eta² ppm, the x468 truncated-division
    * identity over the zero-filled day spine)? High eta² = the weekly
    * rhythm IS the signal (gate x234's weekday adjustment on this);
    * low = bursts dominate. Day-spine-bounded everything. */
  private val x503: Q = (spark, sfDir) => {
    val ev = Tables(spark, sfDir, "events").filter(col("ts").isNotNull)
    val d = ev.groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("__x"))
    val spine = ev.agg(min(to_date(col("ts"))).as("__d0"),
        max(to_date(col("ts"))).as("__d1"))
      .select(explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
    val f = spine.join(d, Seq("day"), "left")
      .select(expr("datediff(day, DATE'1994-12-26') % 7").cast("long").as("__dow"),
        coalesce(col("__x"), lit(0L)).as("__x"))
    val g = f.groupBy("__dow")
      .agg(count(lit(1)).cast("decimal(38,0)").as("__ng"),
        sum(col("__x").cast("decimal(38,0)")).as("__sg"))
      .agg(count(lit(1)).as("n_weekdays"),
        sum(expr("CAST(__sg * __sg DIV __ng AS DECIMAL(38,0))")).as("__t1"))
    val m = f.agg(count(lit(1)).as("n_days"),
      sum(col("__x").cast("decimal(38,0)")).as("__s"),
      sum(col("__x").cast("decimal(38,0)") * col("__x")).as("__q"))
    m.crossJoin(g)
      .select(col("n_days"), col("n_weekdays"),
        expr("CAST(__s * __s DIV n_days AS DECIMAL(38,0))").as("__t2"),
        col("__t1"), col("__q"))
      .select(col("n_days"), col("n_weekdays"),
        expr("""CAST(CASE WHEN __q > __t2
              THEN (__t1 - __t2) * 1000000 DIV (__q - __t2) END AS BIGINT)""")
          .as("eta2_ppm"))
  }

  /** x504 — out-of-order delivery census: per event type, the share of
    * ARRIVAL-adjacent event pairs (event_id order, per user) whose
    * event TIMES run backwards, and the worst backstep — the
    * stream-disorder profile that sizes every watermark upstream (x206
    * audits lateness against ONE watermark; this measures the disorder
    * itself). User-partitioned lag over arrival order. */
  private val x504: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val byArrival = Window.partitionBy("user_id").orderBy("event_id")
    Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .withColumn("__prev_ts", lag(col("ts"), 1).over(byArrival))
      .filter(col("__prev_ts").isNotNull)
      .select(col("event_type"),
        (unix_timestamp(col("__prev_ts")) - unix_timestamp(col("ts")))
          .as("__back"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__back") > 0, 1L).otherwise(0L)).as("__inv"),
        max(greatest(col("__back"), lit(0L))).as("max_backstep_sec"))
      .select(col("event_type"), col("n_pairs"),
        expr("__inv * 1000000 DIV n_pairs").as("inverted_ppm"),
        col("max_backstep_sec"))
      .orderBy("event_type")
  }

  /** x499 — predicate selectivity catalog: one-scan ppm selectivities
    * for the workload's recurring filter battery (return flag, deep
    * discount, ship-year, bulk quantity, and their hot conjunctions) —
    * the statistics table an optimizer (or a z-order key choice, x42)
    * consumes; x176 estimates JOIN cardinality, this catalogs FILTERS. */
  private val x499: Q = (spark, sfDir) => {
    val li = Tables(spark, sfDir, "lineitem")
    val preds: Seq[(String, Column)] = Seq(
      ("1_returned", col("l_returnflag") === "R"),
      ("2_deep_discount", col("l_discount") >= 0.05),
      ("3_ship_1996", year(col("l_shipdate")) === 1996),
      ("4_bulk_qty", col("l_quantity") >= 30),
      ("5_returned_and_bulk",
        col("l_returnflag") === "R" && col("l_quantity") >= 30),
      ("6_deep_discount_1996",
        col("l_discount") >= 0.05 && year(col("l_shipdate")) === 1996))
    val aggs = preds.map { case (n, p) =>
      sum(when(p, 1L).otherwise(0L)).as(s"__$n")
    }
    val row = li.agg(count(lit(1)).as("__n"), aggs: _*)
    preds.map { case (n, _) =>
      row.select(lit(n).as("predicate"), col(s"__$n").as("n_rows"),
        expr(s"__$n * 1000000 DIV __n").as("selectivity_ppm"))
    }.reduce(_.unionAll(_)).orderBy("predicate")
  }

  /** x500 — majority-vote repair: three replicas of the order ledger
    * with deterministic hash-seeded corruption (per replica: value
    * flipped on one key stratum, row dropped on another), reconciled by
    * 2-of-3 vote — per replica, the rows it was outvoted on, the rows
    * it lost, and the certified repaired total. x79/x108 diff TWO
    * replicas; majority vote is the 3-way quorum pattern that repairs
    * WITHOUT a trusted master. Key-collapsed joins only. */
  private val x500: Q = (spark, sfDir) => {
    import spark.implicits._
    val base = Tables(spark, sfDir, "orders")
      .filter(col("o_orderkey").isNotNull && col("o_totalprice").isNotNull)
      .select(col("o_orderkey").as("k"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
    def replica(i: Int) = base
      .withColumn("__h", graft.operators.PortableHash.hash60(
        concat(col("k").cast("string"), lit(s"|r$i"))))
      .filter(pmod(col("__h"), lit(101L)) =!= 0L) // dropped rows
      .select(col("k"),
        when(pmod(col("__h"), lit(97L)) === 0L, col("v") + 1000000L)
          .otherwise(col("v")).as(s"v$i"))
    val joined = replica(0)
      .join(replica(1), Seq("k"), "full")
      .join(replica(2), Seq("k"), "full")
      .withColumn("maj",
        when(col("v0") === col("v1") || col("v0") === col("v2"), col("v0"))
          .when(col("v1") === col("v2"), col("v1")))
    val per = Seq(0, 1, 2).map { i =>
      joined.agg(
        count(lit(1)).as("n_keys"),
        sum(when(col(s"v$i").isNull, 1L).otherwise(0L)).as("rows_missing"),
        sum(when(col(s"v$i").isNotNull && col("maj").isNotNull &&
          col(s"v$i") =!= col("maj"), 1L).otherwise(0L)).as("rows_outvoted"),
        sum(col("maj").cast("decimal(38,0)")).cast("long")
          .as("repaired_total_cents"))
        .select(lit(s"replica_$i").as("replica"), col("n_keys"),
          col("rows_missing"), col("rows_outvoted"),
          col("repaired_total_cents"))
    }
    per.reduce(_.unionAll(_)).orderBy("replica")
  }

  /** x501 — protocol violation census: purchases and clicks landing in a
    * 30-minute session that contains NO view — the instrumentation-gap
    * (or API-traffic) audit every funnel number silently depends on
    * (x64/x476 assume the protocol holds; this counts where it
    * doesn't). Reuses the session assignment machinery. */
  private val x501: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ses = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("__new", when(col("__prev_ts").isNull ||
        col("ts") >= expr("__prev_ts + INTERVAL 30 MINUTES"), 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(byUser))
    val flags = ses.groupBy("user_id", "__sid")
      .agg(max(when(col("event_type") === "view", 1L).otherwise(0L)).as("__hasview"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("__p"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("__c"))
    flags.agg(count(lit(1)).as("n_sessions"),
        sum(lit(1L) - col("__hasview")).as("__nv"),
        sum(col("__p")).as("__tp"),
        sum(when(col("__hasview") === 0L, col("__p")).otherwise(0L)).as("__vp"),
        sum(col("__c")).as("__tc"),
        sum(when(col("__hasview") === 0L, col("__c")).otherwise(0L)).as("__vc"))
      .select(col("n_sessions"),
        expr("__nv * 1000000 DIV n_sessions").as("viewless_session_ppm"),
        col("__tp").as("n_purchases"),
        expr("CASE WHEN __tp > 0 THEN __vp * 1000000 DIV __tp END")
          .as("viewless_purchase_ppm"),
        col("__tc").as("n_clicks"),
        expr("CASE WHEN __tc > 0 THEN __vc * 1000000 DIV __tc END")
          .as("viewless_click_ppm"))
  }

  /** x496 — delisting blast radius: per brand, the orders it touches,
    * the orders it EXCLUSIVELY supplies (every line that brand — the
    * ones a delisting kills outright), their revenue, and the customers
    * left with no alternative in-order. x439 measures reach; this is
    * the removal impact table assortment decisions actually need.
    * Order-keyed collapses; the exclusivity test is `count = brand
    * count` per order. */
  private val x496: Q = (spark, sfDir) => {
    val lb = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull)
      .select(col("l_orderkey").as("__ok"), col("o_custkey").as("__ck"),
        col("p_brand").as("brand"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("__c"))
    val perOrder = lb.groupBy("__ok")
      .agg(count(lit(1)).as("__lines"), max(col("__ck")).as("__ck"))
    lb.groupBy("brand", "__ok")
      .agg(count(lit(1)).as("__blines"), sum(col("__c")).as("__bcents"))
      .join(perOrder, "__ok")
      .groupBy("brand")
      .agg(count(lit(1)).as("n_orders_touching"),
        sum(when(col("__blines") === col("__lines"), 1L).otherwise(0L))
          .as("n_orders_exclusive"),
        sum(when(col("__blines") === col("__lines"), col("__bcents"))
          .otherwise(0L)).as("revenue_exclusive_cents"),
        countDistinct(when(col("__blines") === col("__lines"), col("__ck")))
          .as("customers_exclusive"))
      .orderBy("brand")
  }

  /** x497 — quality cutoff curve: corpus survival (docs AND tokens, ppm)
    * at quality-score cutoffs 0.4–0.8 — x49 caps per source at a FIXED
    * rule; this is the tuning curve that picks the rule. The score is
    * x09's exact formula, reproduced verbatim in the oracle, so the
    * double comparisons agree bit-for-bit. */
  private val x497: Q = (spark, sfDir) => {
    import spark.implicits._
    val scored = docs(spark, sfDir).filter(col("text").isNotNull)
      .select(TextAnalysis.qualityScore(col("text")).as("__s"),
        size(split(col("text"), " ")).cast("long").as("__tok"))
    val cuts = Seq(400L, 500L, 600L, 700L, 800L).toDF("cutoff_milli")
    scored.crossJoin(broadcast(cuts))
      .groupBy("cutoff_milli")
      .agg(count(lit(1)).as("__n"), sum(col("__tok")).as("__tk"),
        sum(when(col("__s") >= col("cutoff_milli") / 1000.0, 1L).otherwise(0L))
          .as("__sd"),
        sum(when(col("__s") >= col("cutoff_milli") / 1000.0, col("__tok"))
          .otherwise(0L)).as("__st"))
      .select(col("cutoff_milli"), col("__sd").as("docs_surviving"),
        expr("__sd * 1000000 DIV __n").as("doc_survival_ppm"),
        expr("__st * 1000000 DIV __tk").as("token_survival_ppm"))
      .orderBy("cutoff_milli")
  }

  /** x498 — rapid-fire census: per user, the share of inter-event gaps
    * under 10 minutes (same-sitting bursts), banded (none / <10 % /
    * <50 % / ≥50 %) — burst-heavy accounts are scripts or power users,
    * and the census feeds the x212 rate-limit policy. User-partitioned
    * lag, user-keyed collapse. */
  private val x498: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .filter(col("__prev").isNotNull)
      .select(col("user_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("__prev"))).as("__gap"))
    val per = gaps.groupBy("user_id")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__gap") < 600L, 1L).otherwise(0L)).as("__fast"))
      .filter(col("__n") >= 5)
      .select(expr("__fast * 1000000 DIV __n").as("__fp"))
      .select(when(col("__fp") === 0, "0_none")
        .when(col("__fp") < 100000L, "1_under_10pct")
        .when(col("__fp") < 500000L, "2_under_50pct")
        .otherwise("3_bot_like").as("fast_band"))
    val tot = per.agg(count(lit(1)).as("__t"))
    per.groupBy("fast_band").agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("fast_band"), col("n_users"),
        expr("n_users * 1000000 DIV __t").as("share_ppm"))
      .orderBy("fast_band")
  }

  /** x493 — nowcast ratio table: per order month, revenue landed in the
    * first 10 days vs the full month (ppm), the cross-month exact median
    * ratio, and each month's deviation from it — the table that says
    * whether a partial month can nowcast its close (tight deviations =
    * yes). Month-bounded frames throughout. */
  private val x493: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val m = Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .cast("long").as("full_cents"),
        sum(when(dayofmonth(col("o_orderdate")) <= 10,
          expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .otherwise(0L)).cast("long").as("first10_cents"))
      .withColumn("ratio_ppm", expr("first10_cents * 1000000 DIV full_cents"))
    val med = m.groupBy("ratio_ppm").agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(Window.orderBy("ratio_ppm")))
      .crossJoin(broadcast(m.agg(count(lit(1)).as("__n"))))
      .agg(min(when(col("__cum") * 2 >= col("__n"), col("ratio_ppm")))
        .as("median_ratio_ppm"))
    m.crossJoin(broadcast(med))
      .select(col("month"), col("full_cents"), col("first10_cents"),
        col("ratio_ppm"), col("median_ratio_ppm"),
        abs(col("ratio_ppm") - col("median_ratio_ppm")).as("abs_dev_ppm"))
      .orderBy("month")
  }

  /** x494 — source KS conformance: exact Kolmogorov–Smirnov distance of
    * each source's doc-length (n_chars) distribution from the corpus
    * (max |F_s − F| over the corpus value grid, cross-multiplied ppm —
    * no float CDFs). x284 compares two fixed halves; this is the
    * per-source conformance TABLE procurement reads. Sources × values
    * spine is bounded. */
  private val x494: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val d = docs(spark, sfDir)
      .filter(col("source").isNotNull && col("n_chars").isNotNull)
      .select(col("source"), col("n_chars").as("__v"))
    val vals = d.select("__v").distinct()
    val srcCnt = d.groupBy("source", "__v").agg(count(lit(1)).as("__c"))
    val srcTot = d.groupBy("source").agg(count(lit(1)).as("__ns"))
    val allCum = d.groupBy("__v").agg(count(lit(1)).as("__ca"))
      .withColumn("__cuma", sum(col("__ca")).over(Window.orderBy("__v")))
    val tot = d.agg(count(lit(1)).as("__na"))
    srcTot.select("source").crossJoin(vals)
      .join(srcCnt, Seq("source", "__v"), "left")
      .select(col("source"), col("__v"), coalesce(col("__c"), lit(0L)).as("__c"))
      .withColumn("__cums",
        sum(col("__c")).over(Window.partitionBy("source").orderBy("__v")))
      .join(allCum.select("__v", "__cuma"), "__v")
      .join(srcTot, "source")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("__ns"),
        expr("""abs(__cums * __na - __cuma * __ns) * 1000000
              DIV (CAST(__ns AS DECIMAL(38,0)) * __na)""").as("__d"))
      .groupBy("source")
      .agg(max(col("__ns")).as("n_docs"),
        max(col("__d")).cast("long").as("ks_ppm"))
      .orderBy("source")
  }

  /** x495 — rich-club profile ([[Graph.richClubProfile]]) of the
    * co-purchase graph: club density at the p50/p75/p90 degree cuts —
    * do popular parts co-sell with each other (a dense core = one hot
    * partition at scale) or with the long tail? Fourth consumer of the
    * co-purchase staging memo. */
  private val x495: Q = (spark, sfDir) =>
    Graph.richClubProfile(copurchaseEdges(spark, sfDir))

  /** x490 — partition count sweep: hash-partition balance of the order
    * keys at 8/16/32/64 partitions (portable md5 keys, so the oracle
    * reproduces the assignment) — max/min partition load vs the ideal,
    * the shuffle-sizing table read before picking
    * `spark.sql.shuffle.partitions` for a join on this key. */
  private val x490: Q = (spark, sfDir) => {
    import spark.implicits._
    val keys = Tables(spark, sfDir, "orders")
      .filter(col("o_orderkey").isNotNull)
      .select(graft.operators.PortableHash.hash60(col("o_orderkey")).as("__h"))
    val parts = Seq(8L, 16L, 32L, 64L).toDF("n_partitions")
    keys.crossJoin(broadcast(parts))
      .groupBy(col("n_partitions"), pmod(col("__h"), col("n_partitions")).as("__p"))
      .agg(count(lit(1)).as("__c"))
      .groupBy("n_partitions")
      .agg(sum(col("__c")).as("n_rows"), max(col("__c")).as("__max"),
        min(col("__c")).as("__min"))
      .select(col("n_partitions"), col("n_rows"),
        expr("__max * n_partitions * 1000000 DIV n_rows").as("max_load_ppm"),
        expr("__min * n_partitions * 1000000 DIV n_rows").as("min_load_ppm"))
      .orderBy("n_partitions")
  }

  /** x491 — image gradient energy
    * ([[graft.operators.Multimodal.extractGradientFeatures]]): per-image
    * total-variation edge mass through the REAL `javax.imageio` decode —
    * the oracle recomputes the neighborhood arithmetic from the synthetic
    * pixel formula, so green certifies codec round-trip AND the gradient
    * math. x12 proves sums survive the decode; this proves PIXEL
    * ADJACENCY does. */
  private val x491: Q = (spark, sfDir) => {
    val media = graft.operators.Multimodal.renderImageTable(spark,
      docs(spark, sfDir).filter(col("doc_id") % 5 === 0))
    graft.operators.Multimodal.extractGradientFeatures(spark, media)
      .toDF().orderBy("doc_id")
  }

  /** x492 — payload-value interaction: the JSON `k` payload banded by
    * 25s crossed with event type — count and exact mean value
    * milli-cents per cell. x459 audits k's DOMAIN; this asks whether k
    * MEANS anything for value (flat rows = dead payload). */
  private val x492: Q = (spark, sfDir) =>
    Tables(spark, sfDir, "events")
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        expr("CAST(get_json_object(props, '$.k') AS BIGINT) DIV 25").as("k_band"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("__c"))
      .filter(col("k_band").isNotNull)
      .groupBy("event_type", "k_band")
      .agg(count(lit(1)).as("n_events"),
        expr("CAST(1000 * SUM(__c) DIV COUNT(*) AS BIGINT)")
          .as("mean_value_milli_cents"))
      .orderBy("event_type", "k_band")

  /** x487 — supplier demand-trend census: sign AND magnitude of each
    * supplier's quarterly LINE-VOLUME trend — exact integer
    * least-squares numerator/denominator (`n·Σxy − ΣxΣy`,
    * `n·Σx² − (Σx)²`), magnitude as `|num| DIV den` milli-items/quarter
    * (positive operands, so truncation is engine-exact). x387 censuses
    * supplier activity LEVELS; this is the direction-of-travel census
    * that says which side of the book is churning. */
  private val x487: Q = (spark, sfDir) => {
    val d = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_suppkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("l_suppkey").as("__s"),
        ((year(col("o_orderdate")) - 1995) * 4 + quarter(col("o_orderdate")) - 1)
          .cast("long").as("__x"))
    val qs = d.groupBy("__s", "__x")
      .agg((count(lit(1)) * 1000).as("__my"))
    val m = qs.groupBy("__s")
      .agg(count(lit(1)).as("__n"),
        sum(col("__x")).as("__sx"), sum(col("__my")).as("__smy"),
        sum(col("__x") * col("__x")).as("__qx"),
        sum(col("__x") * col("__my")).as("__pxy"))
      .filter(col("__n") >= 4)
      .select((col("__n") * col("__pxy") - col("__sx") * col("__smy")).as("__num"),
        (col("__n") * col("__qx") - col("__sx") * col("__sx")).as("__den"))
      // |slope| in milli-days per quarter, truncated on POSITIVE operands
      // so both engines agree; the sign rides the band label
      .select(col("__num"), expr("abs(__num) DIV __den").as("__mag"))
    val tot = m.agg(count(lit(1)).as("__t"))
    m.select(when(col("__num") < 0 && col("__mag") >= 150L, "0_declining_strong")
        .when(col("__num") < 0, "1_declining_mild")
        .when(col("__num") === 0, "2_flat")
        .when(col("__mag") < 150L, "3_growing_mild")
        .otherwise("4_growing_strong").as("trend_band"))
      .groupBy("trend_band").agg(count(lit(1)).as("n_suppliers"))
      .crossJoin(broadcast(tot))
      .select(col("trend_band"), col("n_suppliers"),
        expr("n_suppliers * 1000000 DIV __t").as("share_ppm"))
      .orderBy("trend_band")
  }

  /** x488 — quantizer bits sweep: sign-bucket cell occupancy at
    * bits = 2/4/6/8 — cells used, empty-cell share, and the hottest
    * cell's load ppm. The IVF tuning table (x183 audits ONE config;
    * this sweeps the knob): more bits cut cell size until cells go
    * empty and recall machinery starves. Cell collapses only. */
  private val x488: Q = (spark, sfDir) => {
    val e = emb(spark, sfDir)
    Seq(2, 4, 6, 8).map { bits =>
      val cells = e.select(Similarity.signBucket(col("embedding"), bits)
          .cast("long").as("__cell"))
        .groupBy("__cell").agg(count(lit(1)).as("__n"))
      cells.agg(count(lit(1)).as("cells_used"), sum(col("__n")).as("__tot"),
          max(col("__n")).as("__max"))
        .select(lit(bits.toLong).as("bits"), col("cells_used"),
          (lit(1L << bits) - col("cells_used")).as("cells_empty"),
          expr("__max * 1000000 DIV __tot").as("max_cell_ppm"))
    }.reduce(_.unionAll(_)).orderBy("bits")
  }

  /** x489 — priority escalation matrix: for successive orders of the
    * SAME customer, the (previous priority → priority) transition
    * counts with per-row shares — does dissatisfaction escalate
    * (x141's transition lens on the ORDER stream instead of events)?
    * Customer-partitioned lag, priority²-bounded census. */
  private val x489: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val byCust = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val t = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull &&
        col("o_orderpriority").isNotNull)
      .withColumn("__prev", lag(col("o_orderpriority"), 1).over(byCust))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_priority"),
        col("o_orderpriority").as("to_priority"))
      .agg(count(lit(1)).as("n_transitions"))
    t.withColumn("__rowtot",
        sum(col("n_transitions")).over(Window.partitionBy("from_priority")))
      .select(col("from_priority"), col("to_priority"), col("n_transitions"),
        expr("n_transitions * 1000000 DIV __rowtot").as("row_share_ppm"))
      .orderBy("from_priority", "to_priority")
  }

  /** x484 — representative-policy divergence: for every near-dup
    * cluster, does the cheap keep-min-id representative (x01/x241's
    * convention) pick the SAME doc as the keep-best-quality policy
    * (x24's)? The divergence ppm prices the shortcut — high divergence
    * means min-id silently keeps short/truncated variants. Twelfth
    * consumer of the LSH pair staging; cluster-bounded windows. */
  private val x484: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val j = Dedup.dupClusters(lshPairs(spark, sfDir), 3)
      .join(docs(spark, sfDir).select(col("doc_id"), col("n_chars")), "doc_id")
    val best = j.withColumn("__rn", row_number().over(
        Window.partitionBy("cluster").orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("__rn") === 1)
      .select(col("cluster"), col("doc_id").as("__bestrep"))
    j.groupBy("cluster")
      .agg(count(lit(1)).as("__sz"), min(col("doc_id")).as("__minrep"))
      .join(best, "cluster")
      .agg(count(lit(1)).as("n_clusters"),
        sum(when(col("__minrep") === col("__bestrep"), 1L).otherwise(0L))
          .as("n_same_rep"),
        sum(when(col("__minrep") =!= col("__bestrep"), 1L).otherwise(0L))
          .as("__diff"),
        sum(col("__sz")).as("__szs"))
      .select(col("n_clusters"), col("n_same_rep"),
        expr("__diff * 1000000 DIV n_clusters").as("divergence_ppm"),
        expr("__szs * 1000 DIV n_clusters").as("mean_size_milli"))
  }

  /** x485 — fingerprint bits sweep: collisions of the 60-bit portable
    * text fingerprint truncated to 20/24/28/32 bits, observed vs the
    * birthday-bound expectation (`n(n−1)/2^(b+1)`, milli) — how many
    * bits the dedup fingerprint actually needs (x11 assumes 60 is
    * enough; this prices the truncation). Distinct-text collapse, then
    * four modulus collapses. */
  private val x485: Q = (spark, sfDir) => {
    import spark.implicits._
    val h = docs(spark, sfDir).filter(col("text").isNotNull)
      .select(col("text")).distinct()
      .select(graft.operators.PortableHash.hash60(col("text")).as("__h"))
    val bits = Seq((20, 1L << 20), (24, 1L << 24), (28, 1L << 28),
      (32, 1L << 32)).toDF("bits", "__m")
    h.crossJoin(broadcast(bits))
      .select(col("bits"), col("__m"), pmod(col("__h"), col("__m")).as("__k"))
      .groupBy("bits", "__m")
      .agg(count(lit(1)).as("n_texts"), countDistinct(col("__k")).as("__dk"))
      .select(col("bits").cast("long").as("bits"), col("n_texts"),
        (col("n_texts") - col("__dk")).as("observed_collisions"),
        expr("""CAST(CAST(n_texts AS DECIMAL(38,0)) * (n_texts - 1) * 1000
              DIV (2 * CAST(__m AS DECIMAL(38,0))) AS BIGINT)""")
          .as("expected_milli"))
      .orderBy("bits")
  }

  /** x486 — embedding geometry census: cosine of adjacent-id vector
    * pairs (2k, 2k+1), banded 0.1-wide — the label-free "what does this
    * space look like" histogram (isotropy check: random embeddings mass
    * near 0, collapsed spaces near ±1). One equi-join on id, the x05
    * index-ordered cosine fold, band census. */
  private val x486: Q = (spark, sfDir) => {
    val e = emb(spark, sfDir).select(col("vec_id"), col("embedding"))
    val a = e.filter(pmod(col("vec_id"), lit(2)) === 0)
      .select(col("vec_id").as("__ia"), col("embedding").as("__ea"))
    val b = e.filter(pmod(col("vec_id"), lit(2)) === 1)
      .select(col("vec_id").as("__ib"), col("embedding").as("__eb"))
    val p = a.join(b, col("__ib") === col("__ia") + 1)
      .select(floor(Similarity.cosine(col("__ea"), col("__eb")) * 10)
        .cast("long").as("cos_band"))
    val tot = p.agg(count(lit(1)).as("__t"))
    p.groupBy("cos_band").agg(count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(tot))
      .select(col("cos_band"), col("n_pairs"),
        expr("n_pairs * 1000000 DIV __t").as("share_ppm"))
      .orderBy("cos_band")
  }

  /** x481 — co-purchase weight spectrum: how strong are co-purchase
    * ties — the log2-band census of pair weights over the 1996–97 part
    * co-purchase graph (x188/x450 analyze its TOPOLOGY; this is the
    * EDGE-WEIGHT distribution that says whether "also bought" signals
    * (x201) ride one-off coincidences or repeated pairs). Pair weights
    * collapse before banding; bands via exact digit-free log2
    * (`length(bin(w))`). */
  private val x481: Q = (spark, sfDir) => {
    val w = copurchaseEdges(spark, sfDir)
      .groupBy(col("src").as("u"), col("dst").as("v"))
      .agg(count(lit(1)).as("__w"))
    val tot = w.agg(count(lit(1)).as("__t"))
    w.select(length(bin(col("__w"))).cast("long").as("weight_log2_band"),
        col("__w"))
      .groupBy("weight_log2_band")
      .agg(count(lit(1)).as("n_pairs"), sum(col("__w")).as("co_occurrences"))
      .crossJoin(broadcast(tot))
      .select(col("weight_log2_band"), col("n_pairs"), col("co_occurrences"),
        expr("n_pairs * 1000000 DIV __t").as("share_ppm"))
      .orderBy("weight_log2_band")
  }

  /** x482 — join funnel audit: row retention through the
    * lineitem→orders→customer→nation→region enrichment chain, one join
    * at a time — where enrichment silently drops rows (x93 audits FK
    * conformance pairwise; this is the PIPELINE view, the first thing
    * checked when a dashboard undercounts). Left joins + null counts in
    * one pass each. */
  private val x482: Q = (spark, sfDir) => {
    import spark.implicits._
    val li = Tables(spark, sfDir, "lineitem").select(col("l_orderkey"))
    val step0 = li.count()
    val j1 = li.join(Tables(spark, sfDir, "orders"),
      col("l_orderkey") === col("o_orderkey"), "left")
    val step1 = j1.filter(col("o_orderkey").isNotNull).count()
    val j2 = j1.join(Tables(spark, sfDir, "customer"),
      col("o_custkey") === col("c_custkey"), "left")
    val step2 = j2.filter(col("c_custkey").isNotNull).count()
    val j3 = j2.join(Tables(spark, sfDir, "nation"),
      col("c_nationkey") === col("n_nationkey"), "left")
    val step3 = j3.filter(col("n_nationkey").isNotNull).count()
    val j4 = j3.join(Tables(spark, sfDir, "region"),
      col("n_regionkey") === col("r_regionkey"), "left")
    val step4 = j4.filter(col("r_regionkey").isNotNull).count()
    Seq(("0_lineitem", step0), ("1_orders", step1), ("2_customer", step2),
      ("3_nation", step3), ("4_region", step4))
      .toDF("join_step", "rows_surviving")
      .withColumn("retention_ppm",
        expr(s"rows_surviving * 1000000 DIV $step0"))
      .orderBy("join_step")
  }

  /** x483 — assortment discovery curve: per order month, the share of
    * orders containing at least one FIRST-EVER-SOLD part and the count
    * of parts debuting that month — x255's novelty curve at the
    * commerce grain (is the catalog still being explored or has demand
    * locked onto known parts?). Part first-sale dates are one
    * part-keyed collapse. */
  private val x483: Q = (spark, sfDir) => {
    val lo = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_partkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("l_orderkey").as("__ok"), col("l_partkey").as("__pk"),
        to_date(col("o_orderdate")).as("__d"))
    val firstSale = lo.groupBy("__pk").agg(min(col("__d")).as("__fd"))
    val monthly = lo.join(firstSale, "__pk")
      .select(date_trunc("month", col("__d")).cast("date").as("month"),
        col("__ok"), (col("__d") === col("__fd")).cast("long").as("__isnew"))
      .groupBy("month", "__ok")
      .agg(max(col("__isnew")).as("__hasnew"))
      .groupBy("month")
      .agg(count(lit(1)).as("n_orders"), sum(col("__hasnew")).as("__novel"))
    val debuts = firstSale
      .groupBy(date_trunc("month", col("__fd")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_new_parts"))
    monthly.join(debuts, Seq("month"), "left")
      .select(col("month"), col("n_orders"),
        expr("__novel * 1000000 DIV n_orders").as("novel_order_ppm"),
        coalesce(col("n_new_parts"), lit(0L)).as("n_new_parts"))
      .orderBy("month")
  }

  /** x478 — Horvitz-Thompson estimator audit: take x156's systematic
    * PPS sample (size-biased by order value) and reconstruct BOTH the
    * value total (`stride·k`) and the unweighted row count
    * (`Σ stride DIV w_i`, truncated per row), reporting exact ppm error
    * against the truth — the calibration certificate that says whether
    * dashboard estimates from the sample can be trusted. */
  private val x478: Q = (spark, sfDir) => {
    val o = Tables(spark, sfDir, "orders")
      .filter(col("o_orderkey").isNotNull && col("o_totalprice").isNotNull)
      .select(col("o_orderkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("__w"))
    val n = 1000L
    val truth = o.filter(col("__w") > 0)
      .agg(count(lit(1)).as("true_rows"), sum(col("__w")).as("true_total_cents"))
    val s = Sampling.systematicPpsSample(o, "o_orderkey", "__w", n)
    val est = s.crossJoin(broadcast(truth))
      .select(col("weight"), col("true_rows"), col("true_total_cents"),
        expr(s"true_total_cents DIV $n").as("__stride"))
      .agg(max(col("true_rows")).as("true_rows"),
        max(col("true_total_cents")).as("true_total_cents"),
        count(lit(1)).as("n_selected"),
        max(col("__stride")).as("__stride"),
        sum(expr("__stride DIV weight")).as("est_rows"))
      .select(col("true_rows"), col("true_total_cents"), col("n_selected"),
        (col("n_selected") * col("__stride")).as("est_total_cents"),
        col("est_rows"))
    est.select(col("true_rows"), col("est_rows"),
        expr("abs(est_rows - true_rows) * 1000000 DIV true_rows").as("err_rows_ppm"),
        col("true_total_cents"), col("est_total_cents"),
        expr("abs(est_total_cents - true_total_cents) * 1000000 DIV true_total_cents")
          .as("err_total_ppm"),
        col("n_selected"))
  }

  /** x479 — retention by first touch: per user, the FIRST event's type
    * (ts + event_id tiebreak) vs whether they were seen again ≥ 7 days
    * later — x372 measures first-touch CONVERSION; this measures
    * first-touch STICKINESS, the channel-quality readout. Two user-keyed
    * collapses. */
  private val x479: Q = (spark, sfDir) => {
    val ev = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
    val first = ev.groupBy("user_id")
      .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("__f"),
        max(to_date(col("ts"))).as("__last_day"))
      .select(col("user_id"), col("__f.event_type").as("first_type"),
        to_date(col("__f.ts")).as("__first_day"), col("__last_day"))
    first.groupBy("first_type")
      .agg(count(lit(1)).as("n_users"),
        sum(when(datediff(col("__last_day"), col("__first_day")) >= 7, 1L)
          .otherwise(0L)).as("__ret"))
      .select(col("first_type"), col("n_users"),
        expr("__ret * 1000000 DIV n_users").as("retained_ppm"))
      .orderBy("first_type")
  }

  /** x480 — approx-distinct calibration: per lineitem key column, the
    * exact distinct count plus a flag that Spark's HLL++
    * (`approx_count_distinct`, rsd 5 %) landed within 10 % — the x83
    * pattern widened to a per-column calibration table (the approx
    * VALUE is engine-specific and never leaves the flag). */
  private val x480: Q = (spark, sfDir) => {
    val li = Tables(spark, sfDir, "lineitem")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
    cols.map { c =>
      li.agg(countDistinct(col(c)).as("n_distinct"),
          approx_count_distinct(col(c), 0.05).as("__approx"))
        .select(lit(c).as("col_name"), col("n_distinct"),
          (abs(col("__approx") - col("n_distinct")) * 10 <= col("n_distinct"))
            .as("approx_ok"))
    }.reduce(_.unionAll(_)).orderBy("col_name")
  }

  /** x475 — sample fidelity audit: does the top-10 brand ranking survive
    * a 10 % deterministic hash sample of lineitem? Overlap@10 plus a
    * top-1-preserved flag — the QA gate that says whether downstream
    * dashboards can run on the sample. Hash draws are the portable md5
    * convention, so the sampled ranking is oracle-exact. */
  private val x475: Q = (spark, sfDir) => {
    val li = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand").isNotNull)
      .select(col("p_brand").as("brand"), col("l_orderkey"), col("l_linenumber"))
    def top10(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("brand").agg(count(lit(1)).as("__n"))
        .orderBy(col("__n").desc, col("brand")).limit(10)
    val full = top10(li)
    val sampled = top10(li.filter(
      pmod(graft.operators.PortableHash.hash60(
        concat(col("l_orderkey").cast("string"), lit("#"),
          col("l_linenumber").cast("string"))), lit(10L)) === 0L))
    val f = full.select(col("brand"), row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("__n").desc, col("brand")))
      .as("__rf"))
    val s = sampled.select(col("brand"), row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("__n").desc, col("brand")))
      .as("__rs"))
    f.join(s, Seq("brand"), "inner")
      .agg(count(lit(1)).as("overlap_at_10"),
        max(when(col("__rf") === 1 && col("__rs") === 1, 1).otherwise(0))
          .as("top1_preserved"))
      .select(lit(10L).as("k"), col("overlap_at_10"),
        expr("overlap_at_10 * 1000000 DIV 10").as("overlap_ppm"),
        col("top1_preserved"))
  }

  /** x476 — funnel parity by nation: view→click→purchase user conversion
    * per customer nation — x64's funnel split by the fairness axis (the
    * x164 parity lens on BEHAVIOUR instead of spend). Events join the
    * customer dimension once; everything else is user-keyed collapses. */
  private val x476: Q = (spark, sfDir) => {
    val per = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "view", 1L).otherwise(0L)).as("__v"),
        max(when(col("event_type") === "click", 1L).otherwise(0L)).as("__c"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("__p"))
      .filter(col("__v") === 1L)
    per
      .join(Tables(spark, sfDir, "customer"), col("user_id") === col("c_custkey"))
      .join(Tables(spark, sfDir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_viewers"), sum(col("__c")).as("__clicks"),
        sum(col("__p")).as("__purch"))
      .select(col("nation"), col("n_viewers"),
        expr("__clicks * 1000000 DIV n_viewers").as("click_ppm"),
        expr("__purch * 1000000 DIV n_viewers").as("purchase_ppm"))
      .orderBy("nation")
  }

  /** x477 — k-means step audit ([[Similarity.kmeansStepAudit]]): one
    * EXACT Lloyd iteration from the sign-bucket cells — SSE before/after
    * and the improvement ppm, every number bit-reproducible in the
    * oracle. The "is there clustering structure?" probe run before any
    * IVF build (x30/x183 assume the answer; this measures it). */
  private val x477: Q = (spark, sfDir) =>
    Similarity.kmeansStepAudit(emb(spark, sfDir), bits = 4)

  /** x472 — bootstrap median CI ([[Sampling.hashBootstrapMedianCI]]):
    * the deterministic Poisson bootstrap applied to the EXACT weighted
    * median per resample — medians have no CLT plug-in error bar, so
    * this is the only honest CI for x307/x139-style median readouts.
    * Resamples collapse to (b, value, weight) before any window.
    * 16 resamples (≈ 88 % interval from the 2nd/15th order stats): the
    * median resample costs a per-resample value-collapsed rank, so the
    * fan-out is half the mean CI's to stay inside the per-query time
    * budget — the operator takes any even count. */
  private val x472: Q = (spark, sfDir) =>
    Sampling.hashBootstrapMedianCI(Tables(spark, sfDir, "orders"),
      "o_orderkey", expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
      nResamples = 16)

  /** x473 — cross-supplier price spread: for parts sourced from ≥ 2
    * suppliers, the ppm spread between the cheapest and dearest
    * supplier's exact mean line price, banded — the procurement
    * arbitrage table (x402 audits the brand ladder; this audits the
    * SUPPLIER quotes for the same part). Two part-keyed collapses. */
  private val x473: Q = (spark, sfDir) => {
    val ps = Tables(spark, sfDir, "lineitem")
      .filter(col("l_partkey").isNotNull && col("l_suppkey").isNotNull &&
        col("l_extendedprice").isNotNull && col("l_quantity").isNotNull &&
        col("l_quantity") > 0)
      .select(col("l_partkey"), col("l_suppkey"),
        expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              DIV CAST(l_quantity AS BIGINT)""").as("__unit"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(count(lit(1)).as("__n"), sum(col("__unit")).as("__s"))
      .select(col("l_partkey"), expr("1000 * __s DIV __n").as("__mean_milli"))
    val spread = ps.groupBy("l_partkey")
      .agg(count(lit(1)).as("__nsupp"),
        min(col("__mean_milli")).as("__lo"), max(col("__mean_milli")).as("__hi"))
      .filter(col("__nsupp") >= 2 && col("__lo") > 0)
      .select(col("__nsupp"),
        expr("(__hi - __lo) * 1000000 DIV __lo").as("__spread_ppm"))
      .select(col("__nsupp"),
        when(col("__spread_ppm") < 100000000L, "0_under_100x")
          .when(col("__spread_ppm") < 250000000L, "1_under_250x")
          .when(col("__spread_ppm") < 500000000L, "2_under_500x")
          .otherwise("3_over_500x").as("spread_band"))
    val tot = spread.agg(count(lit(1)).as("__t"))
    spread.groupBy("spread_band")
      .agg(count(lit(1)).as("n_parts"),
        expr("CAST(SUM(__nsupp) * 1000 DIV COUNT(*) AS BIGINT)")
          .as("mean_suppliers_milli"))
      .crossJoin(broadcast(tot))
      .select(col("spread_band"), col("n_parts"), col("mean_suppliers_milli"),
        expr("n_parts * 1000000 DIV __t").as("share_ppm"))
      .orderBy("spread_band")
  }

  /** x474 — peak-day attribution: on the top-decile traffic days (exact
    * p90 cut over the daily counts), how concentrated is the load — mean
    * top-10-user share vs typical days? Concentrated peaks are one
    * broken client; diffuse ones are real demand. Per-day top-k via
    * day-partitioned rank; day-spine-bounded everything else. */
  private val x474: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val ud = Tables(spark, sfDir, "events")
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(count(lit(1)).as("__c"))
    val daily = ud.groupBy("day").agg(sum(col("__c")).as("__n"))
    val med = daily.groupBy("__n").agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(Window.orderBy("__n")))
      .crossJoin(broadcast(daily.agg(count(lit(1)).as("__days"))))
      .agg(min(when(col("__cum") * 10 >= col("__days") * 9, col("__n"))).as("__p90"))
    val top = ud
      .withColumn("__rk", row_number().over(
        Window.partitionBy("day").orderBy(col("__c").desc, col("user_id"))))
      .groupBy("day")
      .agg(sum(when(col("__rk") <= 10, col("__c")).otherwise(0L)).as("__top10"))
    daily.join(top, "day").crossJoin(broadcast(med))
      .select(
        when(col("__n") >= col("__p90"), "1_peak").otherwise("0_typical")
          .as("day_class"),
        col("__n"), expr("1000 * __top10 DIV __n").as("__share_milli"))
      .groupBy("day_class")
      .agg(count(lit(1)).as("n_days"), sum(col("__n")).as("n_events"),
        expr("CAST(SUM(__share_milli) DIV COUNT(*) AS BIGINT)")
          .as("mean_top10_share_milli"))
      .orderBy("day_class")
  }

  /** x469 — brand rank stability trend: Spearman-footrule distance
    * (exact integer Σ|rank shift|, ppm of the n²/2 maximum) between each
    * quarter's brand revenue ranking and the previous quarter's — x193
    * compares TWO rankings once; this is the stability TIME SERIES that
    * says whether the assortment order is settling or churning.
    * Brand-bounded per-quarter rank frames. */
  private val x469: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("o_orderdate").isNotNull && col("p_brand").isNotNull &&
        col("l_extendedprice").isNotNull)
      .groupBy(date_trunc("quarter", col("o_orderdate")).cast("date").as("q"),
        col("p_brand").as("brand"))
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .cast("decimal(38,0)").as("__v"))
    val ranked = rev.withColumn("__rk",
      row_number().over(Window.partitionBy("q")
        .orderBy(col("__v").desc, col("brand"))).cast("long"))
    ranked.as("a")
      .join(ranked.as("b"),
        col("a.brand") === col("b.brand") &&
          add_months(col("a.q"), 3) === col("b.q"))
      .select(col("b.q").as("quarter"),
        abs(col("a.__rk") - col("b.__rk")).as("__d"))
      .groupBy("quarter")
      .agg(count(lit(1)).as("n_common"), sum(col("__d")).as("__f"))
      .select(col("quarter"), col("n_common"),
        expr("CAST(__f * 2000000 DIV (n_common * n_common) AS BIGINT)")
          .as("footrule_ppm"))
      .orderBy("quarter")
  }

  /** x470 — trade homophily: do customers buy from SAME-NATION suppliers
    * more than independence predicts? Observed same-nation line share vs
    * `Σ_n L_cn·L_sn / T²`, lift in milli — the one-scalar homophily
    * readout behind x319's flow matrix. Nation-bounded collapses;
    * products stage through DECIMAL(38,0). */
  private val x470: Q = (spark, sfDir) => {
    val lines = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sfDir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("__cn"), col("s_nationkey").as("__sn"))
    val obs = lines.agg(count(lit(1)).as("n_lines"),
      sum(when(col("__cn") === col("__sn"), 1L).otherwise(0L)).as("__same"))
    val exp = lines.groupBy("__cn").agg(count(lit(1)).as("__lc"))
      .join(lines.groupBy("__sn").agg(count(lit(1)).as("__ls")),
        col("__cn") === col("__sn"))
      .agg(count(lit(1)).as("n_nations"),
        sum(col("__lc").cast("decimal(38,0)") * col("__ls")).as("__e"))
    obs.crossJoin(exp)
      .select(col("n_lines"), col("n_nations"),
        expr("__same * 1000000 DIV n_lines").as("same_ppm"),
        expr("""CAST(__e * 1000000
              DIV (CAST(n_lines AS DECIMAL(38,0)) * n_lines) AS BIGINT)""")
          .as("expected_ppm"))
      .withColumn("lift_milli",
        expr("CASE WHEN expected_ppm > 0 THEN same_ppm * 1000 DIV expected_ppm END"))
  }

  /** x471 — size-price slope by brand: exact-moment least-squares slope
    * (cents per size unit, the x115 decimal→double pattern, round 6) of
    * catalog price against part size within each brand — is a brand's
    * price ladder driven by size or flat (x402 audits MONOTONICITY;
    * this measures the GRADIENT)? One brand-keyed moment collapse. */
  private val x471: Q = (spark, sfDir) => {
    val m = Tables(spark, sfDir, "part")
      .filter(col("p_brand").isNotNull && col("p_size").isNotNull &&
        col("p_retailprice").isNotNull)
      .select(col("p_brand").as("brand"),
        col("p_size").cast("decimal(38,0)").as("x"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .cast("decimal(38,0)").as("y"))
      .groupBy("brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(col("x") * col("x")).as("__qx"),
        sum(col("x") * col("y")).as("__pxy"))
    val n = col("n_parts").cast("double")
    val (sx, sy) = (col("__sx").cast("double"), col("__sy").cast("double"))
    val qx = col("__qx").cast("double")
    val den = n * qx - sx * sx
    val num = n * col("__pxy").cast("double") - sx * sy
    m.select(col("brand"), col("n_parts"),
        when(den > 0, round(num / den, 6)).as("slope_cents_per_size"))
      .orderBy("brand")
  }

  /** x466 — weekday shift matrix: order weekday × ship weekday line
    * counts with per-order-weekday shares — does Friday demand ship
    * Monday (weekend pipeline freeze) or same-week? Weekdays via
    * epoch-day mod 7 anchored on a Monday BEFORE the data's first date
    * (1994-12-26 — negative diffs would carry the sign through %), so
    * the encoding is engine-exact (no locale-dependent dayofweek).
    * ≤49-row grid. */
  private val x466: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate").isNotNull && col("l_shipdate").isNotNull)
      .select(
        expr("datediff(to_date(o_orderdate), DATE'1994-12-26') % 7")
          .cast("long").as("order_dow"),
        expr("datediff(to_date(l_shipdate), DATE'1994-12-26') % 7")
          .cast("long").as("ship_dow"))
    d.groupBy("order_dow", "ship_dow").agg(count(lit(1)).as("n_lines"))
      .withColumn("__rowtot",
        sum(col("n_lines")).over(Window.partitionBy("order_dow")))
      .select(col("order_dow"), col("ship_dow"), col("n_lines"),
        expr("n_lines * 1000000 DIV __rowtot").as("row_share_ppm"))
      .orderBy("order_dow", "ship_dow")
  }

  /** x467 — serial returner census: per customer with ≥ 5 lines, the
    * return-flag share banded (none / <10 % / <30 % / ≥30 %) — x299/x432
    * profile returns by BRAND; this finds the CUSTOMERS who drive them,
    * the abuse-detection grain. One customer-keyed collapse + census. */
  private val x467: Q = (spark, sfDir) => {
    val pc = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_custkey").isNotNull && col("l_returnflag").isNotNull)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("__r"))
      .filter(col("__n") >= 5)
      .select(col("__n"),
        expr("__r * 1000000 DIV __n").as("__rr"))
      .select(col("__n"),
        when(col("__rr") === 0, "0_none")
          .when(col("__rr") < 100000L, "1_under_10pct")
          .when(col("__rr") < 300000L, "2_under_30pct")
          .otherwise("3_heavy").as("return_band"))
    val tot = pc.agg(count(lit(1)).as("__t"))
    pc.groupBy("return_band")
      .agg(count(lit(1)).as("n_customers"),
        expr("CAST(SUM(__n) * 1000 DIV COUNT(*) AS BIGINT)").as("mean_lines_milli"))
      .crossJoin(broadcast(tot))
      .select(col("return_band"), col("n_customers"), col("mean_lines_milli"),
        expr("n_customers * 1000000 DIV __t").as("share_ppm"))
      .orderBy("return_band")
  }

  /** x468 — brand price ANOVA: how much of catalog price variance does
    * BRAND explain? Exact integer sums-of-squares with per-group
    * truncated division (`Σ_g S_g² DIV n_g` — truncation is identical
    * across engines, bias ≪ 1 cent²), eta² in ppm. High eta² means
    * price IS brand positioning (x397's premium index is real); low
    * means within-brand spread dominates (x429's architecture view). */
  private val x468: Q = (spark, sfDir) => {
    val p = Tables(spark, sfDir, "part")
      .filter(col("p_brand").isNotNull && col("p_retailprice").isNotNull)
      .select(col("p_brand"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("__c"))
    val g = p.groupBy("p_brand")
      .agg(count(lit(1)).as("__ng"),
        sum(col("__c").cast("decimal(38,0)")).as("__sg"))
      .agg(count(lit(1)).as("n_brands"),
        sum(expr("CAST(__sg * __sg DIV __ng AS DECIMAL(38,0))")).as("__t1"))
    val m = p.agg(count(lit(1)).as("n_parts"),
      sum(col("__c").cast("decimal(38,0)")).as("__s"),
      sum(col("__c").cast("decimal(38,0)") * col("__c")).as("__q"))
    m.crossJoin(g)
      .select(col("n_parts"), col("n_brands"),
        expr("CAST(__s * __s DIV n_parts AS DECIMAL(38,0))").as("__t2"),
        col("__t1"), col("__q"))
      .select(col("n_parts"), col("n_brands"),
        expr("""CAST(CASE WHEN __q > __t2
              THEN (__t1 - __t2) * 1000000 DIV (__q - __t2) END AS BIGINT)""")
          .as("eta2_ppm"))
  }

  /** x463 — doc feature correlation matrix: x115's decimal-exact Pearson
    * pattern over per-document TEXT features (chars, tokens, distinct
    * tokens, longest token) — which quality signals are redundant and
    * which carry independent information, the feature-selection table
    * for the x09 quality score. One scan computes all features. */
  private val x463: Q = (spark, sfDir) => {
    val feats = docs(spark, sfDir).filter(col("text").isNotNull)
      .select(col("n_chars").cast("long").as("chars"),
        size(split(col("text"), " ")).cast("long").as("tokens"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("uniq"),
        aggregate(transform(split(col("text"), " "), w => length(w)),
          lit(0), (a, x) => greatest(a, x)).cast("long").as("longest"))
    val cols = Seq("chars", "tokens", "uniq", "longest")
    val aggs = cols.flatMap(c => Seq(
      sum(col(c).cast("decimal(38,0)")).as(s"s_$c"),
      sum(col(c).cast("decimal(38,0)") * col(c)).as(s"q_$c"))) ++
      (for { i <- cols.indices; j <- cols.indices if i < j } yield
        sum(col(cols(i)).cast("decimal(38,0)") * col(cols(j)))
          .as(s"p_${cols(i)}_${cols(j)}"))
    val m = feats.agg(count(lit(1)).as("n"), aggs: _*)
    val rows = (for { i <- cols.indices; j <- cols.indices if i < j } yield {
      val (a, b) = (cols(i), cols(j))
      val n = col("n").cast("double")
      val (sa, sb) = (col(s"s_$a").cast("double"), col(s"s_$b").cast("double"))
      val (qa, qb) = (col(s"q_$a").cast("double"), col(s"q_$b").cast("double"))
      val va = n * qa - sa * sa
      val vb = n * qb - sb * sb
      val cov = n * col(s"p_${a}_$b").cast("double") - sa * sb
      m.select(lit(a).as("col_x"), lit(b).as("col_y"), col("n"),
        when(va > 0 && vb > 0, round(cov / sqrt(va * vb), 6)).as("corr"))
    }).reduce(_.unionAll(_))
    rows.orderBy("col_x", "col_y")
  }

  /** x464 — state staleness at purchase: for every purchase event, how
    * old is the customer's latest prior ORDER ([[AsOf.asofJoin]] — one
    * key-partitioned window pass, no range explosion)? Year-banded
    * census ('0_no_prior' / 'yNN'); heavy old-band mass means decisions
    * fire on stale state — the feature-freshness readout for any online
    * model. */
  private val x464: Q = (spark, sfDir) => {
    val purch = Tables(spark, sfDir, "events")
      .filter(col("event_type") === "purchase" && col("user_id").isNotNull &&
        col("ts").isNotNull)
      .select(col("user_id").as("k"), col("ts"))
    val ord = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_orderdate").isNotNull)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("ts"),
        col("o_orderdate").as("ots"))
    val j = graft.operators.AsOf.asofJoin(purch, ord, "k", "ts", Seq("ots"))
    // year-grain bands: the synthetic order history predates the event
    // stream by decades, so day bands would collapse to one bucket
    val banded = j.select(
      when(col("asof_ots").isNull, "0_no_prior")
        .otherwise(concat(lit("y"),
          lpad(expr("CAST(datediff(to_date(ts), to_date(asof_ots)) DIV 365 AS BIGINT)")
            .cast("string"), 2, "0")))
        .as("staleness_band"))
    val tot = banded.agg(count(lit(1)).as("__t"))
    banded.groupBy("staleness_band")
      .agg(count(lit(1)).as("n_purchases"))
      .crossJoin(broadcast(tot))
      .select(col("staleness_band"), col("n_purchases"),
        expr("n_purchases * 1000000 DIV __t").as("share_ppm"))
      .orderBy("staleness_band")
  }

  /** x465 — transaction/catalog price ratio census: line extended price
    * over catalog `retail × qty`, ppm-banded — where the transaction
    * ledger and the catalog disagree and by how much (x331 measures the
    * DISCOUNT'S effect; this audits against the CATALOG). All-positive
    * integer ratios, so truncation agrees across engines. */
  private val x465: Q = (spark, sfDir) => {
    val r = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(col("l_extendedprice").isNotNull && col("p_retailprice").isNotNull &&
        col("l_quantity").isNotNull && col("l_quantity") > 0)
      .select(expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)""")
          .as("__ext"),
        (expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
          col("l_quantity").cast("long")).as("__exp"))
      .filter(col("__exp") > 0)
      .select(expr("__ext * 1000000 DIV __exp").as("__ratio"))
      .select(
        when(col("__ratio") < 900000L, "0_deep_below")
          .when(col("__ratio") < 1000000L, "1_below")
          .when(col("__ratio") === 1000000L, "2_exact")
          .when(col("__ratio") <= 1100000L, "3_above")
          .otherwise("4_far_above").as("ratio_band"),
        col("__ratio"))
    val tot = r.agg(count(lit(1)).as("__t"))
    r.groupBy("ratio_band")
      .agg(count(lit(1)).as("n_lines"),
        expr("CAST(SUM(__ratio) DIV COUNT(*) AS BIGINT)").as("mean_ratio_ppm"))
      .crossJoin(broadcast(tot))
      .select(col("ratio_band"), col("n_lines"),
        expr("n_lines * 1000000 DIV __t").as("share_ppm"), col("mean_ratio_ppm"))
      .orderBy("ratio_band")
  }

  /** x460 — priority inversion weeks: per order week, the exact median
    * ship delay of 1-URGENT vs 5-LOW lines and a flag when urgent is
    * SLOWER — the ops smell x171's attainment rates average away.
    * Medians via the distinct-value cumulative rank (value-collapsed,
    * never a row sort), pivoted per week. */
  private val x460: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val d = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate").isNotNull && col("l_shipdate").isNotNull &&
        col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(date_trunc("week", col("o_orderdate")).cast("date").as("week"),
        col("o_orderpriority").as("__p"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("__x"))
    val coll = d.groupBy("week", "__p", "__x").agg(count(lit(1)).as("__c"))
    val tot = d.groupBy("week", "__p").agg(count(lit(1)).as("__t"))
    coll
      .withColumn("__cum", sum(col("__c")).over(
        Window.partitionBy("week", "__p").orderBy("__x")))
      .join(tot, Seq("week", "__p"))
      .groupBy("week", "__p")
      .agg(min(when(col("__cum") * 2 >= col("__t"), col("__x"))).as("__med"))
      .groupBy("week")
      .agg(max(when(col("__p") === "1-URGENT", col("__med"))).as("med_urgent_days"),
        max(when(col("__p") === "5-LOW", col("__med"))).as("med_low_days"))
      .filter(col("med_urgent_days").isNotNull && col("med_low_days").isNotNull)
      .select(col("week"), col("med_urgent_days"), col("med_low_days"),
        (col("med_urgent_days") > col("med_low_days")).cast("int").as("inverted"))
      .orderBy("week")
  }

  /** x461 — region demand synchrony: exact Pearson correlation between
    * every region pair's ZERO-FILLED daily revenue series (x115's
    * decimal-exact moment pattern; the pair frame is |regions|²·days —
    * bounded). Synchronized regions share macro drivers; a decorrelated
    * one has local dynamics worth separate forecasting. */
  private val x461: Q = (spark, sfDir) => {
    val cents = expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
    val rev = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables(spark, sfDir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(Tables(spark, sfDir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .groupBy(col("r_name").as("reg"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents).as("__v"))
    val spine = Tables(spark, sfDir, "orders").filter(col("o_orderdate").isNotNull)
      .agg(min(to_date(col("o_orderdate"))).as("__d0"),
        max(to_date(col("o_orderdate"))).as("__d1"))
      .select(explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
    val f = Tables(spark, sfDir, "region").select(col("r_name").as("reg"))
      .crossJoin(broadcast(spine))
      .join(rev, Seq("reg", "day"), "left")
      .select(col("reg"), col("day"), coalesce(col("__v"), lit(0L)).as("__v"))
    val m = f.as("a").join(f.as("b"),
        col("a.day") === col("b.day") && col("a.reg") < col("b.reg"))
      .select(col("a.reg").as("region_a"), col("b.reg").as("region_b"),
        col("a.__v").cast("decimal(38,0)").as("x"),
        col("b.__v").cast("decimal(38,0)").as("y"))
      .groupBy("region_a", "region_b")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("__sx"), sum(col("y")).as("__sy"),
        sum(col("x") * col("x")).as("__qx"), sum(col("y") * col("y")).as("__qy"),
        sum(col("x") * col("y")).as("__pxy"))
    val n = col("n_days").cast("double")
    val (sx, sy) = (col("__sx").cast("double"), col("__sy").cast("double"))
    val (qx, qy) = (col("__qx").cast("double"), col("__qy").cast("double"))
    val vx = n * qx - sx * sx
    val vy = n * qy - sy * sy
    val cov = n * col("__pxy").cast("double") - sx * sy
    m.select(col("region_a"), col("region_b"), col("n_days"),
        when(vx > 0 && vy > 0, round(cov / sqrt(vx * vy), 6)).as("corr"))
      .orderBy("region_a", "region_b")
  }

  /** x462 — pack-length sweep: x51's layout arithmetic swept over
    * context lengths 64/128/256/512 — total windows, mean docs touching
    * each window (boundary-crossing pressure), and tail-window fill. The
    * context-length tuning table, computed without materializing a
    * single window: pure integer layout math over the per-source
    * cumulative frame crossed with a 4-row length spine. */
  private val x462: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val lens = Seq(64L, 128L, 256L, 512L).toDF("ctx_len")
    val cum = docs(spark, sfDir)
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("__tok"))
      .filter(col("__tok") > 0)
      .withColumn("__cum",
        sum(col("__tok")).over(Window.partitionBy("source").orderBy("doc_id")))
      .withColumn("__cumb", col("__cum") - col("__tok"))
    val perDoc = cum.crossJoin(broadcast(lens))
      .select(col("ctx_len"), col("source"),
        (expr("(__cum - 1) DIV ctx_len") - expr("__cumb DIV ctx_len") + 1)
          .as("__touched"))
      .groupBy("ctx_len", "source")
      .agg(sum(col("__touched")).as("__touch"))
    val perSrc = cum.groupBy("source").agg(max(col("__cum")).as("__tot"))
      .crossJoin(broadcast(lens))
      .select(col("ctx_len"), col("source"),
        expr("(__tot + ctx_len - 1) DIV ctx_len").as("__nwin"),
        expr("__tot - ((__tot + ctx_len - 1) DIV ctx_len - 1) * ctx_len")
          .as("__lastfill"))
    perDoc.join(perSrc, Seq("ctx_len", "source"))
      .groupBy("ctx_len")
      .agg(sum(col("__nwin")).as("n_windows"),
        expr("CAST(1000 * SUM(__touch) DIV SUM(__nwin) AS BIGINT)")
          .as("docs_per_window_milli"),
        expr("CAST(SUM(__lastfill) * 1000000 DIV (COUNT(*) * ctx_len) AS BIGINT)")
          .as("tail_fill_ppm"))
      .orderBy("ctx_len")
  }

  /** x457 — session handoff matrix: last event type of one 30-minute
    * session → first event type of the user's NEXT session. x141
    * transitions WITHIN the stream; this is intent carryover ACROSS the
    * session boundary (what users come back to after how they left).
    * Per-user windows; session endpoints via deterministic struct
    * min/max (ts, event_id tiebreak). */
  private val x457: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ses = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("__new", when(col("__prev_ts").isNull ||
        col("ts") >= expr("__prev_ts + INTERVAL 30 MINUTES"), 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(byUser))
      .groupBy("user_id", "__sid")
      .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("__f"),
        max(struct(col("ts"), col("event_id"), col("event_type"))).as("__l"))
      .select(col("user_id"), col("__sid"),
        col("__f.event_type").as("__ft"), col("__l.event_type").as("__lt"))
    ses
      .withColumn("__plast",
        lag(col("__lt"), 1).over(Window.partitionBy("user_id").orderBy("__sid")))
      .filter(col("__plast").isNotNull)
      .groupBy(col("__plast").as("from_type"), col("__ft").as("to_type"))
      .agg(count(lit(1)).as("n_handoffs"))
      .orderBy("from_type", "to_type")
  }

  /** x458 — fulfillment span census: per order, days between first and
    * last line shipment, banded (same-day / 1–3 / 4–7 / 8+). x290 counts
    * orders that SPLIT; this measures how LONG the split drags — the
    * warehouse consolidation-vs-latency readout. One order-keyed
    * collapse + a 4-row census. */
  private val x458: Q = (spark, sfDir) => {
    val spans = Tables(spark, sfDir, "lineitem")
      .filter(col("l_orderkey").isNotNull && col("l_shipdate").isNotNull)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("__lines"),
        datediff(max(to_date(col("l_shipdate"))), min(to_date(col("l_shipdate"))))
          .cast("long").as("__span"))
      .select(col("__lines"),
        when(col("__span") === 0, "0_same_day")
          .when(col("__span") <= 3, "1_1_3")
          .when(col("__span") <= 7, "2_4_7")
          .otherwise("3_8_plus").as("span_band"))
    val tot = spans.agg(count(lit(1)).as("__t"))
    spans.groupBy("span_band")
      .agg(count(lit(1)).as("n_orders"), sum(col("__lines")).as("__ln"))
      .crossJoin(broadcast(tot))
      .select(col("span_band"), col("n_orders"),
        expr("n_orders * 1000000 DIV __t").as("share_ppm"),
        expr("__ln * 1000 DIV n_orders").as("mean_lines_milli"))
      .orderBy("span_band")
  }

  /** x459 — props payload audit: per event type, presence and domain of
    * the JSON `k` field (count, min/max, distinct, exact milli mean) —
    * the payload-contract complement of x422's column-domain audit; b21
    * only sums k, this audits it. */
  private val x459: Q = (spark, sfDir) =>
    Tables(spark, sfDir, "events")
      .filter(col("event_type").isNotNull)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("__k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), count(col("__k")).as("n_with_k"),
        min(col("__k")).as("k_min"), max(col("__k")).as("k_max"),
        countDistinct(col("__k")).as("k_distinct"), sum(col("__k")).as("__ks"))
      .select(col("event_type"), col("n_events"), col("n_with_k"),
        col("k_min"), col("k_max"), col("k_distinct"),
        expr("CASE WHEN n_with_k > 0 THEN 1000 * __ks DIV n_with_k END")
          .as("k_mean_milli"))
      .orderBy("event_type")

  /** x454 — pack adjacency audit: under x51's per-source 128-token
    * packing, how often do CONSECUTIVE docs share a context window
    * (boundary not on a window edge: `cum % 128 ≠ 0`), and how often is
    * that co-packed neighbour the SAME language? Same-lang adjacency
    * inflates within-window correlation — the packing-contamination
    * readout x51's layout table stops short of. Pure integer layout
    * arithmetic over the same per-source cumulative frame. */
  private val x454: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val bySrc = Window.partitionBy("source").orderBy("doc_id")
    val c = docs(spark, sfDir)
      .filter(col("text").isNotNull && col("source").isNotNull &&
        col("lang").isNotNull)
      .select(col("source"), col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("__tok"))
      .filter(col("__tok") > 0)
      .withColumn("__cum", sum(col("__tok")).over(bySrc))
      .withColumn("__plang", lag(col("lang"), 1).over(bySrc))
      .withColumn("__pcum", lag(col("__cum"), 1).over(bySrc))
      .filter(col("__pcum").isNotNull)
    c.select(col("source"),
        (col("__pcum") % 128 =!= 0).cast("long").as("__cop"),
        when(col("__pcum") % 128 =!= 0 && col("lang") === col("__plang"), 1L)
          .otherwise(0L).as("__same"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_pairs"), sum(col("__cop")).as("n_copacked"),
        sum(col("__same")).as("__sl"))
      .select(col("source"), col("n_pairs"), col("n_copacked"),
        expr("n_copacked * 1000000 DIV n_pairs").as("copacked_ppm"),
        expr("CASE WHEN n_copacked > 0 THEN __sl * 1000000 DIV n_copacked END")
          .as("same_lang_ppm"))
      .orderBy("source")
  }

  /** x455 — daily-count overdispersion audit: per event type, the exact
    * integer variance-to-mean ratio of ZERO-FILLED daily counts
    * (`1000·(n·Σx² − S²) DIV ((n−1)·S)` milli — Poisson traffic scores
    * ≈ 1000, bursty/campaign-driven traffic far above). x190 detects
    * weekly PERIODICITY; this scores BURSTINESS, the retry-storm smell.
    * Spine × types is bounded; moments stage through DECIMAL(38,0). */
  private val x455: Q = (spark, sfDir) => {
    val ev = Tables(spark, sfDir, "events")
    val d = ev.filter(col("ts").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("__x"))
    val spine = ev.filter(col("ts").isNotNull)
      .agg(min(to_date(col("ts"))).as("__d0"), max(to_date(col("ts"))).as("__d1"))
      .select(explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
    d.select("event_type").distinct()
      .crossJoin(broadcast(spine))
      .join(d, Seq("event_type", "day"), "left")
      .select(col("event_type"), coalesce(col("__x"), lit(0L)).as("__x"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), sum(col("__x")).as("n_events"),
        sum(col("__x").cast("decimal(38,0)") * col("__x")).as("__q"))
      .select(col("event_type"), col("n_days"), col("n_events"),
        expr("""CAST(1000 * (n_days * __q
              - CAST(n_events AS DECIMAL(38,0)) * n_events)
              DIV ((n_days - 1) * CAST(n_events AS DECIMAL(38,0))) AS BIGINT)""")
          .as("vmr_milli"))
      .orderBy("event_type")
  }

  /** x456 — split-half centroid stability
    * ([[Similarity.centroidStabilityAudit]]): per-label cosine between
    * centroids built from the even and odd vector halves — the A/A test
    * that decides whether x58/x446's centroid-based audits can be
    * trusted per label. */
  private val x456: Q = (spark, sfDir) =>
    Similarity.centroidStabilityAudit(emb(spark, sfDir))

  /** x451 — event co-day lift: for each event-type pair, how often do
    * they land on the SAME user-day vs what independence predicts
    * (`lift = n_ab·N DIV (n_a·n_b)`, ppm)? x73 lifts basket items and
    * x141 orders transitions in time; this is the unordered same-day
    * behavioural affinity. Per-user-day distinct types bound the pair
    * fan-out by |types|²; products stage through DECIMAL(38,0). */
  private val x451: Q = (spark, sfDir) => {
    val ed = Tables(spark, sfDir, "events")
      .filter(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("ts").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("__day"),
        col("event_type").as("__et"))
      .distinct()
    val tot = ed.select("user_id", "__day").distinct()
      .agg(count(lit(1)).as("__N"))
    val single = ed.groupBy("__et").agg(count(lit(1)).as("__n"))
    ed.as("a")
      .join(ed.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.__day") === col("b.__day") && col("a.__et") < col("b.__et"))
      .groupBy(col("a.__et").as("type_a"), col("b.__et").as("type_b"))
      .agg(count(lit(1)).as("n_codays"))
      .join(broadcast(single.select(col("__et").as("type_a"), col("__n").as("__na"))), "type_a")
      .join(broadcast(single.select(col("__et").as("type_b"), col("__n").as("__nb"))), "type_b")
      .crossJoin(broadcast(tot))
      .select(col("type_a"), col("type_b"), col("n_codays"),
        expr("""CAST(CAST(n_codays AS DECIMAL(38,0)) * __N * 1000000
              DIV (CAST(__na AS DECIMAL(38,0)) * __nb) AS BIGINT)""")
          .as("lift_ppm"))
      .orderBy("type_a", "type_b")
  }

  /** x452 — dimension energy spectrum
    * ([[Similarity.dimensionEnergySpectrum]]): exact integer per-dim
    * variance ranked by energy with k50/k90/k99 — the intrinsic-dimension
    * one-rower that decides whether a JL projection (x96) pays. */
  private val x452: Q = (spark, sfDir) =>
    Similarity.dimensionEnergySpectrum(emb(spark, sfDir))

  /** x453 — peak-load headroom: per event type, exact p99 of hourly
    * event counts over the mean (milli-scaled) — the capacity-planning
    * ratio x334's hour-of-day profile doesn't give (a flat profile can
    * still hide 20× burst hours). p99 comes from the distinct-value
    * cumulative rank (value-collapsed, never a row sort). */
  private val x453: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val hc = Tables(spark, sfDir, "events")
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("__h"))
      .agg(count(lit(1)).as("__c"))
    val coll = hc.groupBy("event_type", "__c").agg(count(lit(1)).as("__cnt"))
    val tot = hc.groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"), sum(col("__c")).as("__tot"))
    val cum = coll.withColumn("__cum",
      sum(col("__cnt")).over(Window.partitionBy("event_type").orderBy("__c")))
    cum.join(tot, "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("n_hours")).as("n_hours"),
        expr("CAST(MAX(1000 * __tot DIV n_hours) AS BIGINT)").as("mean_milli"),
        min(when(col("__cum") * 100 >= col("n_hours") * 99, col("__c"))).as("p99"))
      .select(col("event_type"), col("n_hours"), col("mean_milli"), col("p99"),
        expr("CAST(1000000 * p99 DIV mean_milli AS BIGINT)").as("headroom_milli"))
      .orderBy("event_type")
  }

  /** x448 — syndication direction census: for every CROSS-source near-dup
    * pair, which side carries the longer text? Per unordered source pair:
    * pairs, longer-on-a, longer-on-b, equal — x237 counts the syndication
    * volume; this reports its DIRECTION (mirrors truncate, originators
    * carry the full text). Eleventh consumer of the LSH pair staging. */
  private val x448: Q = (spark, sfDir) => {
    val src = docs(spark, sfDir).select(col("doc_id"), col("source"), col("n_chars"))
    lshPairs(spark, sfDir)
      .join(src.select(col("doc_id").as("d1"), col("source").as("__s1"),
        col("n_chars").as("__n1")), "d1")
      .join(src.select(col("doc_id").as("d2"), col("source").as("__s2"),
        col("n_chars").as("__n2")), "d2")
      .filter(col("__s1") =!= col("__s2"))
      .select(least(col("__s1"), col("__s2")).as("source_a"),
        greatest(col("__s1"), col("__s2")).as("source_b"),
        when(col("__s1") < col("__s2"), col("__n1")).otherwise(col("__n2")).as("__la"),
        when(col("__s1") < col("__s2"), col("__n2")).otherwise(col("__n1")).as("__lb"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__la") > col("__lb"), 1L).otherwise(0L)).as("a_longer"),
        sum(when(col("__lb") > col("__la"), 1L).otherwise(0L)).as("b_longer"),
        sum(when(col("__la") === col("__lb"), 1L).otherwise(0L)).as("n_equal"))
      .orderBy("source_a", "source_b")
  }

  /** x449 — supplier reliability census: exact integer mean-absolute-
    * deviation of ship delay per supplier (`1000·Σ|n·x − Σx| DIV n²`
    * milli-days — no float moments, no sqrt), banded by whole MAD days.
    * x356/x430 profile the delay LEVEL; this is its CONSISTENCY — a
    * supplier late by a steady 30 days is plannable, one swinging ±20
    * is not. Two supplier-keyed collapses. */
  private val x449: Q = (spark, sfDir) => {
    val d = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_suppkey").isNotNull && col("l_shipdate").isNotNull &&
        col("o_orderdate").isNotNull)
      .select(col("l_suppkey").as("__s"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("__x"))
      .filter(col("__x") >= 0)
    val st = d.groupBy("__s")
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sum"))
      .filter(col("__n") >= 5)
    d.join(st, "__s")
      .select(col("__s"), col("__n"), col("__sum"),
        abs(col("__n") * col("__x") - col("__sum")).as("__a"))
      .groupBy("__s")
      .agg(max(col("__n")).as("__n"), max(col("__sum")).as("__sum"),
        sum(col("__a")).as("__A"))
      .select(expr("1000 * __A DIV (__n * __n)").as("__mad_milli"),
        expr("1000 * __sum DIV __n").as("__mean_milli"))
      .groupBy(expr("__mad_milli DIV 1000").as("mad_band_days"))
      .agg(count(lit(1)).as("n_suppliers"),
        expr("CAST(SUM(__mean_milli) DIV COUNT(*) AS BIGINT)").as("mean_delay_milli"))
      .orderBy("mad_band_days")
  }

  /** x450 — local clustering coefficient census
    * ([[Graph.localClusteringCensus]]) of the x188 co-purchase graph:
    * per-part triangle closure banded 0.1-wide — the distribution the
    * global clustering_ppm hides (cliques + sparse core average to a
    * meaningless middle). Same degree-ordered orientation bound. */
  private val x450: Q = (spark, sfDir) =>
    Graph.localClusteringCensus(copurchaseEdges(spark, sfDir))

  /** x445 — OOV rate by source: token share outside the global top-200
    * vocabulary (count-desc, word-asc deterministic cut) per source — the
    * procurement-grade "how weird is this feed's vocabulary" scalar; high
    * OOV flags OCR noise, code, or off-language content x57's per-doc
    * rarity averages away. Vocabulary collapse + rank-cut + broadcast
    * membership join; census is |sources|-bounded. */
  private val x445: Q = (spark, sfDir) => {
    val words = docs(spark, sfDir)
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val vocab = words.groupBy("w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("w")).limit(200)
      .select(col("w"), lit(1).as("__in"))
    words.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNotNull, 0L).otherwise(1L)).as("oov_tokens"))
      .select(col("source"), col("n_tokens"), col("oov_tokens"),
        expr("oov_tokens * 1000000 DIV n_tokens").as("oov_ppm"))
      .orderBy("source")
  }

  /** x446 — label-margin census ([[Similarity.labelMarginCensus]]):
    * own-centroid cosine minus best-other-centroid cosine per vector,
    * banded 0.1-wide per label — x58 says WHO each label is confused
    * with; this says HOW CONFIDENTLY the mass separates. */
  private val x446: Q = (spark, sfDir) =>
    Similarity.labelMarginCensus(emb(spark, sfDir))

  /** x447 — daily revenue max drawdown: the largest peak-to-date drop in
    * the daily revenue series (classic drawdown over the day spine's
    * running max), with its trough day and ppm depth — the one-row
    * severity scalar x186's level-shift scan and x169's anomaly days
    * don't report. Day-spine-bounded window. */
  private val x447: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate").isNotNull && col("o_totalprice").isNotNull)
      .groupBy(to_date(col("o_orderdate")).as("trough_day"))
      .agg(sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .cast("long").as("trough_cents"))
    daily
      .withColumn("peak_cents",
        max(col("trough_cents")).over(Window.orderBy("trough_day")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("trough_day"), col("peak_cents"), col("trough_cents"),
        (col("peak_cents") - col("trough_cents")).as("drawdown_cents"))
      .withColumn("drawdown_ppm",
        expr("drawdown_cents * 1000000 DIV peak_cents"))
      .orderBy(col("drawdown_cents").desc, col("trough_day"))
      .limit(1)
  }

  /** x442 — degree assortativity ([[Graph.degreeAssortativity]]) of the
    * customer↔supplier purchase graph: do high-degree customers
    * concentrate on high-degree suppliers (positive) or spread across the
    * long tail (negative)? The wiring-pattern scalar x163's per-node
    * concentration can't see. Consumes the shared edge staging memo. */
  private val x442: Q = (spark, sfDir) =>
    Graph.degreeAssortativity(purchaseEdges(spark, sfDir))

  /** x443 — sentence-length census
    * ([[TextAnalysis.sentenceLengthCensus]]): per-language sentence
    * counts, exact mean tokens per sentence, longest sentence, and the
    * one-sentence-document share — the sentence-grain quality view. */
  private val x443: Q = (spark, sfDir) =>
    TextAnalysis.sentenceLengthCensus(docs(spark, sfDir), "doc_id", "text", "lang")

  /** x444 — order-value spread census: per repeat customer, the cents
    * spread between their largest and smallest order, bucketed by digit
    * count (exact decade bands via string length — no float log): are
    * repeat buyers habitual same-size purchasers or volatile? Reports
    * customers, mean order count, and share per spread band. */
  private val x444: Q = (spark, sfDir) => {
    val spread = Tables(spark, sfDir, "orders")
      .filter(col("o_custkey").isNotNull && col("o_totalprice").isNotNull)
      .select(col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("__c"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("__n"), min(col("__c")).as("__lo"), max(col("__c")).as("__hi"))
      .filter(col("__n") >= 2)
      .select(col("__n"),
        length((col("__hi") - col("__lo")).cast("string")).cast("long")
          .as("spread_digits"))
    val tot = spread.agg(count(lit(1)).as("__t"))
    spread.groupBy("spread_digits")
      .agg(count(lit(1)).as("n_customers"), sum(col("__n")).as("__orders"))
      .crossJoin(broadcast(tot))
      .select(col("spread_digits"), col("n_customers"),
        expr("__orders * 1000 DIV n_customers").as("mean_orders_milli"),
        expr("n_customers * 1000000 DIV __t").as("share_ppm"))
      .orderBy("spread_digits")
  }

  /** x269 — dedup method eval ([[Dedup.simhashPairs]] vs
    * [[Dedup.ngramJaccard]]): SimHash candidate precision/recall against
    * the exact Jaccard truth — the method-comparison row that decides
    * which dedup tier a corpus gets. */
  private val x269: Q = (spark, sfDir) => {
    val cand = Dedup.simhashPairs(docs(spark, sfDir), "doc_id", "text",
      maxHamming = 3, wordHash = Dedup.portableWordHash, numBits = 60,
      numBands = 4).select("d1", "d2")
    val truth = Dedup.ngramJaccard(docs(spark, sfDir), "doc_id", "text")
      .select("d1", "d2")
    val nc = cand.agg(count(lit(1)).as("n_candidates"))
    val nt = truth.agg(count(lit(1)).as("n_truth"))
    val nh = cand.join(truth, Seq("d1", "d2"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    nc.crossJoin(nt).crossJoin(nh)
      .select(col("n_candidates"), col("n_truth"), col("n_hits"),
        expr("CASE WHEN n_candidates > 0 THEN n_hits * 1000000 DIV n_candidates ELSE 0L END")
          .as("precision_ppm"),
        expr("CASE WHEN n_truth > 0 THEN n_hits * 1000000 DIV n_truth ELSE 0L END")
          .as("recall_ppm"))
  }

  /** x19 — sliding-window chunking (40-token windows, stride 30). */
  private val x19: Q = (spark, sfDir) =>
    TextAnalysis.chunkDocs(docs(spark, sfDir), "doc_id", "text", window = 40, stride = 30)
      .orderBy("doc_id", "chunk_id")

  /** x20 — deterministic sampling + shard assignment: the reproducible
    * subset/shard step of a training-data pipeline (key-modulo, not RNG, so
    * reruns and engines agree). */
  private val x20: Q = (spark, sfDir) =>
    docs(spark, sfDir)
      .withColumn("shard", pmod(col("doc_id"), lit(8)).cast("int"))
      .withColumn("sampled", (pmod(col("doc_id"), lit(10)) === 0).cast("int"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("sampled")).as("n_sampled"))
      .orderBy("shard")

  /** x21 — bucketized range join: orders matched to deterministic promo
    * periods (equi-join on month buckets + residual filter — no
    * BroadcastNestedLoopJoin; oracle is the plain theta-join). */
  private val x21: Q = (spark, sfDir) => {
    val periods = spark.range(6).select(
      col("id").cast("int").as("p"),
      expr("timestampadd(MONTH, CAST(id * 13 AS INT), TIMESTAMP'1995-01-01 00:00:00')").as("pstart"))
      .withColumn("pend", expr("timestampadd(MONTH, 2, pstart)"))
    RangeJoin.pointInInterval(
      Tables(spark, sfDir, "orders"), "o_orderdate", periods, "pstart", "pend")
      .groupBy("p")
      .agg(count(lit(1)).as("n_orders"), QueryUtil.dsum(col("o_totalprice")).as("total"))
      .orderBy("p")
  }

  /** x28 — streaming deduplication: dropDuplicates keyed state across
    * ordered micro-batches; emitted set == batch DISTINCT. */
  private val x28: Q = (spark, sfDir) =>
    graft.streaming.EventStream.streamingDistinctPairs(spark, sfDir)

  /** x29 — stream-static enrichment join (stateless) + streaming agg:
    * events joined to the customer dimension per micro-batch. */
  private val x29: Q = (spark, sfDir) =>
    graft.streaming.EventStream.streamStaticSegmentCounts(spark, sfDir)

  /** x30 — IVF-Flat ANN: nearest-centroid cells (deterministic seeds),
    * probe the 4 best cells, exact cosine top-k within them. */
  private val x30: Q = (spark, sfDir) =>
    Similarity.ivfTopK(emb(spark, sfDir), queryVec(spark, sfDir), 10)

  /** x31 — PII scrubbing: deterministic synthetic PII (derived from doc_id,
    * same construction in the oracle) injected into each doc, then redacted
    * and audited — one codegen'd map-side pass, no shuffle before the final
    * sort. */
  private val x31: Q = (spark, sfDir) => {
    val dirty = concat(col("text"), lit(" contact doc"), col("doc_id").cast("string"),
      lit("@example.com or call 555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))
    docs(spark, sfDir)
      .select(col("doc_id"), dirty.as("dirty"))
      .select(col("doc_id"),
        md5(TextAnalysis.redactPii(col("dirty"))).as("redacted_md5"),
        TextAnalysis.piiCount(col("dirty"), TextAnalysis.EmailPattern).as("n_emails"),
        TextAnalysis.piiCount(col("dirty"), TextAnalysis.PhonePattern).as("n_phones"))
      .orderBy("doc_id")
  }

  /** x32 — partitioned lake layout: write orders partitioned by year, read
    * back with a partition-key filter — the scan must touch only the 1997
    * directory (PartitionFilters, plan-asserted in PlanSpec), the mechanism
    * that turns a 100 TB scan into a 1-partition read. */
  private val x32: Q = (spark, sfDir) => {
    val path = s"${QueryUtil.scratchDir}/orders_by_year"
    Tables(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(path)
    spark.read.parquet(path)
      .filter(col("o_year") === 1997)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), QueryUtil.dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderpriority")
  }

  /** x33 — eval-set decontamination: training docs sharing any n-gram with
    * the held-out subset (doc_id % 97 == 0), with shared-n-gram counts.
    * n = 4 here: the synthetic word-salad corpus has almost no ≥8-gram
    * collisions (real corpora use 8–13), and 4 keeps the output non-trivial
    * at every SF; n is the operator's parameter either way. */
  private val x33: Q = (spark, sfDir) =>
    Dedup.decontaminate(docs(spark, sfDir), "doc_id", "text",
      isEval = pmod(col("doc_id"), lit(97)) === 0, n = 4)
      .orderBy("doc_id")

  /** x34 — stream-stream interval join: errors ⨝ same-user purchases within
    * the preceding hour, two watermarked streams (bounded join state). */
  private val x34: Q = (spark, sfDir) =>
    graft.streaming.EventStream.streamStreamErrorPurchases(spark, sfDir)

  /** x35 — TF-IDF top-3 terms per document (classic relevance weighting;
    * agg-then-rank, broadcast corpus size). */
  private val x35: Q = (spark, sfDir) =>
    TextAnalysis.tfidfTopTerms(docs(spark, sfDir), "doc_id", "text", k = 3)
      .orderBy("doc_id", "rank")

  /** x36 — token-budget sequence packing: docs → fixed-2048-token training
    * shards per source (cumulative-cut packing; one exchange + one window). */
  private val x36: Q = (spark, sfDir) =>
    TextAnalysis.packTokenShards(docs(spark, sfDir), "doc_id", "text", "source", 2048)
      .orderBy("doc_id")

  /** x37 — exact stratified sample: 1/10 of every language, deterministic
    * md5-order selection (reproducible across runs and engines). */
  private val x37: Q = (spark, sfDir) =>
    Sampling.stratifiedSample(docs(spark, sfDir), "doc_id", "lang", num = 1, den = 10)
      .orderBy("doc_id")

  /** x38 — SCD2 history build: each user's event log → versioned validity
    * intervals (row_number + lead on one shared per-key sort). */
  private val x38: Q = (spark, sfDir) =>
    Scd2.buildHistory(
      Tables(spark, sfDir, "events")
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id", "value"),
      keyCol = "user_id", tsCol = "ts", tieCol = "event_id", attrCols = Seq("value"))
      .orderBy("user_id", "version")

  /** x39 — bloom-pruned semi join: orders probed against a bloom filter of
    * BUILDING customers before the exact semi join (runtime-filter shape,
    * stated explicitly; FPs removed ⇒ result == plain semi join oracle). */
  private val x39: Q = (spark, sfDir) => {
    val dim = Tables(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    graft.operators.BloomJoin.bloomSemiJoin(
      spark, Tables(spark, sfDir, "orders"), "o_custkey", dim, "c_custkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), QueryUtil.dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderpriority")
  }

  /** x40 — incremental aggregate maintenance: history rows pre-aggregated
    * once into a materialized partial-state table (count + DECIMAL sum —
    * both merge by addition), then merged with the fresh delta's partial
    * aggregate by re-aggregating the union of STATES. Only the delta is
    * scanned and shuffled at refresh; history participates as one row per
    * group — the 100 TB materialized-view refresh pattern. Decimal partials
    * make the merge exactly associative, so the merged result equals the
    * full recompute (the oracle) bit-for-bit. */
  private val x40: Q = (spark, sfDir) => {
    val ev = Tables(spark, sfDir, "events")
    // data-driven cutoff (no wall clock): delta = the last 7 days of events
    val mx = ev.agg(max(col("ts")).as("mx"))
    val tagged = ev.crossJoin(broadcast(mx))
      .withColumn("is_delta", col("ts") >= col("mx") - expr("INTERVAL 7 DAYS"))
    def partialAgg(df: DataFrame) = df.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("s"))
    val statePath = s"${QueryUtil.scratchDir}/mv_state"
    partialAgg(tagged.filter(!col("is_delta"))).write.mode("overwrite").parquet(statePath)
    partialAgg(tagged.filter(col("is_delta")))
      .unionByName(spark.read.parquet(statePath))
      .groupBy("event_type")
      .agg(sum(col("n")).as("n_events"), sum(col("s")).as("s_total"))
      .select(col("event_type"), col("n_events"),
        col("s_total").cast("double").as("total"))
      .orderBy("event_type")
  }

  /** x41 — time-granular dedup: keep each user's FIRST event per
    * (event_type, calendar day) — the event-pipeline "one signal per user
    * per day" collapse. One exchange on the composite key, one window pass;
    * ties on ts break by event_id (CDC-style determinism). */
  private val x41: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy(col("user_id"), col("event_type"), to_date(col("ts")))
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, sfDir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .orderBy("event_id")
  }

  /** x42 — z-order clustered lake layout: orders written partitioned by a
    * Morton cell interleaving (custkey bucket × year bucket), then a query
    * filtering RANGES OF BOTH dimensions reads only the overlapping cells
    * (partition pruning, plan-asserted) plus an exact residual filter — so
    * the result equals the plain two-range filter (the oracle). One
    * clustered key serving two range dims is what single-axis partitioning
    * (x32) cannot do. Bounds derive from MAX(o_custkey) in pure integer
    * arithmetic, so they are identical in both engines at every SF. */
  private val x42: Q = (spark, sfDir) => {
    import graft.operators.ZOrder
    val bits = 3 // 8 buckets per dim, 64 cells
    val o = Tables(spark, sfDir, "orders")
    // layout-build step (like x32's partitioned write): bucket each dim into
    // equal key ranges, cluster by the interleaved cell, one file per cell
    val maxCk = o.agg(max(col("o_custkey"))).head().getLong(0)
    val bucketW = maxCk / 8 + 1
    val clustered = o
      .withColumn("zcell", ZOrder.zcell(
        (col("o_custkey") / bucketW).cast("int"),
        (year(col("o_orderdate")) - 1992).cast("int"), bits))
    val path = s"${QueryUtil.scratchDir}/orders_zorder"
    clustered.repartition(col("zcell"))
      .write.partitionBy("zcell").mode("overwrite").parquet(path)
    // query: custkey in [max/4, 3*max/5] AND year in [1993, 1995]
    val (ckLo, ckHi) = (maxCk / 4, 3 * maxCk / 5)
    val cells = ZOrder.cellsForRanges(
      (ckLo / bucketW).toInt, (ckHi / bucketW).toInt, 1993 - 1992, 1995 - 1992, bits)
    spark.read.parquet(path)
      .filter(col("zcell").isin(cells: _*)) // prunes cell directories
      .filter(col("o_custkey").between(ckLo, ckHi) &&
        year(col("o_orderdate")).between(1993, 1995)) // exact residual
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), QueryUtil.dsum(col("o_totalprice")).as("total"))
      .orderBy("o_orderpriority")
  }

  /** x43 — corpus mixture weights: per-source token totals → sqrt-damped
    * sampling weights (the alpha=0.5 data-mixing rule: upweight small
    * sources without letting giants dominate). One partial-agged exchange
    * collapses the corpus to one row per source; the normalization window
    * runs over that handful of rows. sqrt is IEEE-correctly-rounded in both
    * engines; weights rounded for the cross-engine compare. */
  private val x43: Q = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    docs(spark, sfDir)
      .groupBy("source")
      .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("tokens"))
      .withColumn("w", sqrt(col("tokens").cast("double")))
      .withColumn("weight", round(col("w") / sum(col("w")).over(Window.partitionBy()), 6))
      .select(col("source"), col("tokens"), col("weight"))
      .orderBy("source")
  }

  /** x44 — percentile band trim: within each language drop the shortest 10%
    * and longest 10% of docs by token count (Gopher-style length outlier
    * removal; exact integer band edges — see [[Sampling.percentileBandTrim]]). */
  private val x44: Q = (spark, sfDir) =>
    Sampling.percentileBandTrim(
      docs(spark, sfDir)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok")),
      "doc_id", "lang", "n_tok", lowPct = 10, highPct = 90)
      .orderBy("doc_id")

  /** x45 — foreachBatch lake sink: micro-batches appended to parquet with
    * their batch id (the idempotent-retry key); landed content == source. */
  private val x45: Q = (spark, sfDir) =>
    graft.streaming.EventStream.foreachBatchLakeSink(spark, sfDir)

  /** x46 — AQE runtime skew-join split: a 70%-hot join key, broadcast
    * disabled so the shuffle join is skew-eligible, and AQE's skew
    * thresholds lowered to harness scale — Spark detects the hot partition
    * AT RUNTIME from shuffle statistics and splits it across tasks
    * (`skew=true` in the final plan, asserted in PlanSpec). The automatic
    * complement of x17's manual salting: same problem, zero query rewrite.
    * Confs are set and restored around the action; the result is the plain
    * join aggregate (the oracle) regardless of how AQE splits. */
  private val x46: Q = (spark, sfDir) => {
    val hotKey = (c: org.apache.spark.sql.Column) =>
      when(pmod(c, lit(10)) < 7, lit(0L)).otherwise(c)
    // repartition(8): the skew split divides a reduce partition by MAP
    // ranges, so the fact side needs multiple map tasks (a single parquet
    // file scans as one mapper at harness scale; real deployments have
    // thousands)
    val ev = Tables(spark, sfDir, "events")
      .select(hotKey(col("user_id")).as("k"), col("value"))
      .repartition(8)
    // the deduped dim is materialized (localCheckpoint) so the join reads
    // it straight through its exchange: OptimizeSkewedJoin only rewrites
    // SMJ(Sort(Shuffle), Sort(Shuffle)) — an agg between the dim's shuffle
    // and the join would mask the skew split
    val cust = Tables(spark, sfDir, "customer")
      .select(hotKey(col("c_custkey")).as("k"), col("c_mktsegment"))
      .groupBy("k").agg(min(col("c_mktsegment")).as("c_mktsegment"))
      .localCheckpoint()
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512b",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val out = ev.join(cust, "k")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), QueryUtil.dsum(col("value")).as("total"))
        .orderBy("c_mktsegment")
      out.count() // materialize under the skew confs (AQE decides at runtime)
      out
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** x47 — small-file compaction: events fragmented into 64 tiny files
    * (a streaming sink's natural drift), compacted to 4 right-sized ones;
    * the aggregate over the compacted table proves content preservation
    * (file-count drop is unit-tested in PipelineOpsSpec). */
  private val x47: Q = (spark, sfDir) => {
    val small = s"${QueryUtil.scratchDir}/events_small_files"
    val compacted = s"${QueryUtil.scratchDir}/events_compacted"
    Tables(spark, sfDir, "events")
      .select("event_id", "event_type", "value")
      .repartition(64).write.mode("overwrite").parquet(small)
    graft.operators.Compaction.compact(spark, small, compacted, targetFiles = 4)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), QueryUtil.dsum(col("value")).as("total"),
        max(col("event_id")).as("max_id"))
      .orderBy("event_type")
  }

  /** x48 — CDC MERGE/upsert apply: the `customer` snapshot merged with a
    * change batch derived deterministically from `orders` (every 13th
    * orderkey a delete, every 7th an insert under a fresh negative key,
    * the rest updates; the orderkey is the CDC sequence breaking same-day
    * ties). One exchange + one window pass — see [[CdcMerge.applyChanges]];
    * oracle is the same latest-row-per-key window SQL over the unioned log. */
  private val x48: Q = (spark, sfDir) => {
    val changes = Tables(spark, sfDir, "orders").select(
      when(pmod(col("o_orderkey"), lit(7)) === 0, -col("o_custkey"))
        .otherwise(col("o_custkey")).as("c_custkey"),
      col("o_orderdate").as("ts"),
      col("o_orderkey").as("seq"),
      when(pmod(col("o_orderkey"), lit(13)) === 0, lit(CdcMerge.DeleteOp))
        .otherwise(lit("U")).as("op"),
      col("o_totalprice").as("c_acctbal"),
      concat(lit("SEG"), pmod(col("o_orderkey"), lit(5)).cast("string"))
        .as("c_mktsegment"))
    CdcMerge.applyChanges(
      Tables(spark, sfDir, "customer").select("c_custkey", "c_acctbal", "c_mktsegment"),
      changes, keyCol = "c_custkey", tsCol = "ts", tieCol = "seq", opCol = "op",
      attrCols = Seq("c_acctbal", "c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** x49 — per-source document cap: at most 8 docs per source, best
    * quality first (the "max K pages per domain" web-corpus rule; ties by
    * doc_id). One group exchange + one window — [[Sampling.topKPerGroup]].
    * The score formula is bit-identical across engines (proven by x09), so
    * ranking and the emitted score hash-match without rounding. */
  private val x49: Q = (spark, sfDir) =>
    Sampling.topKPerGroup(docs(spark, sfDir), "doc_id", "source",
      TextAnalysis.qualityScore(col("text")), k = 8)
      .orderBy("doc_id")

  /** x50 — incremental (delta-vs-corpus) dedup: every 10th doc plays the
    * nightly delta, the rest the existing corpus; each delta doc gets its
    * count of corpus near-dups (jaccard ≥ 0.7 via delta→corpus band join +
    * exact verify, [[Dedup.incrementalDedup]]). 0 ⇒ safe to append. The
    * mod-10 split has real cross-split dup pairs at every SF (6–46 delta
    * docs rejected), so the oracle row is non-vacuous. */
  private val x50: Q = (spark, sfDir) => {
    val d = docs(spark, sfDir)
    Dedup.incrementalDedup(
      corpus = d.filter(pmod(col("doc_id"), lit(10)) =!= 0),
      delta = d.filter(pmod(col("doc_id"), lit(10)) === 0),
      "doc_id", "text")
      .orderBy("doc_id")
  }

  /** x51 — fixed-context window packing: per source, docs concatenated in
    * doc_id order and cut into 128-token windows (docs span boundaries);
    * emits each window's doc count and token fill. Pure integer layout
    * arithmetic — [[TextAnalysis.packContextWindows]]. */
  private val x51: Q = (spark, sfDir) =>
    TextAnalysis.packContextWindows(docs(spark, sfDir), "doc_id", "text",
      "source", contextLen = 128)
      .orderBy("source", "win")

  /** x52 — inverted-index manifest: term → df + first-20 postings
    * ([[TextAnalysis.invertedIndex]]; postings capped BEFORE the collect so
    * hot terms can't blow the aggregation buffer). Postings serialized to a
    * comma-joined string for the declared output (the driver's hasher can't
    * compare array-typed cells); the operator API keeps the typed array. */
  private val x52: Q = (spark, sfDir) =>
    TextAnalysis.invertedIndex(docs(spark, sfDir), "doc_id", "text", maxPostings = 20)
      .withColumn("postings", concat_ws(",", col("postings")))
      .orderBy("term")

  /** x59 — snapshot diff: the effective changes between the customer
    * snapshot and x48's merged result ([[CdcMerge.snapshotDiff]]; one
    * co-partitioned full outer join). Round-trip invariant with x48:
    * applying the diff to the old snapshot reconstructs the new one. */
  private val x59: Q = (spark, sfDir) =>
    CdcMerge.snapshotDiff(
      Tables(spark, sfDir, "customer").select("c_custkey", "c_acctbal", "c_mktsegment"),
      x48(spark, sfDir),
      "c_custkey", Seq("c_acctbal", "c_mktsegment"))
      .orderBy("c_custkey")

  /** x60 — streaming CDC snapshot sink: each replayed micro-batch MERGEd
    * into a ping-pong parquet snapshot via foreachBatch + [[CdcMerge]]
    * (errors delete, other events upsert). Final snapshot == "latest
    * event per user decides" ([[graft.streaming.EventStream.cdcSnapshotSink]]). */
  private val x60: Q = (spark, sfDir) =>
    graft.streaming.EventStream.cdcSnapshotSink(spark, sfDir)

  /** x17 — salted skew join (result ≡ plain join by construction). */
  private val x17: Q = (spark, sfDir) => {
    val li = Tables(spark, sfDir, "lineitem")
    val sup = Tables(spark, sfDir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
    Skew.saltedJoin(li, sup, "l_suppkey", salts = 8)
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_lines"),
        QueryUtil.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("s_name")
  }

  val queries: Map[String, Q] = Map(
    "x01_dedup_exact" -> x01,
    "x02_dedup_minhash_lsh" -> x02,
    "x03_dedup_simhash" -> x03,
    "x04_ngram_jaccard_exact" -> x04,
    "x05_cosine_topk_brute" -> x05,
    "x06_ann_bucket_topk" -> x06,
    "x07_corpus_stats" -> x07,
    "x08_lang_id_confusion" -> x08,
    "x09_quality_score" -> x09,
    "x10_token_count_bpe" -> x10,
    "x11_fingerprint_md5" -> x11,
    "x12_multimodal_features" -> x12,
    "x13_streaming_window_counts" -> x13,
    "x14_embedding_neardup" -> x14,
    "x15_streaming_sessions" -> x15,
    "x16_asof_join" -> x16,
    "x17_salted_skew_join" -> x17,
    "x18_dedup_clusters" -> x18,
    "x19_doc_chunking" -> x19,
    "x20_sample_shard" -> x20,
    "x21_range_join_bucketized" -> x21,
    "x22_ann_banded_topk" -> x22,
    "x23_repetition_stats" -> x23,
    "x24_dedup_retain_best" -> x24,
    "x25_top_terms_per_lang" -> x25,
    "x26_streaming_append_watermark" -> x26,
    "x27_streaming_closed_sessions" -> x27,
    "x28_streaming_dedup" -> x28,
    "x29_stream_static_join" -> x29,
    "x30_ivf_ann_topk" -> x30,
    "x31_pii_redaction" -> x31,
    "x32_partition_pruned_read" -> x32,
    "x33_decontaminate_ngram" -> x33,
    "x34_stream_stream_join" -> x34,
    "x35_tfidf_top_terms" -> x35,
    "x36_pack_token_shards" -> x36,
    "x37_stratified_sample" -> x37,
    "x38_scd2_history" -> x38,
    "x39_bloom_semi_join" -> x39,
    "x40_incremental_agg" -> x40,
    "x41_daily_first_event" -> x41,
    "x42_zorder_pruned_read" -> x42,
    "x43_mixture_weights" -> x43,
    "x44_length_band_trim" -> x44,
    "x45_foreachbatch_sink" -> x45,
    "x46_aqe_skew_join" -> x46,
    "x47_compact_small_files" -> x47,
    "x48_cdc_merge_apply" -> x48,
    "x49_domain_quality_cap" -> x49,
    "x50_incremental_dedup" -> x50,
    "x51_pack_context_windows" -> x51,
    "x52_inverted_index" -> x52,
    "x53_connected_components" -> x53,
    "x54_line_dedup" -> x54,
    "x55_global_rank" -> x55,
    "x56_session_window_native" -> x56,
    "x57_rarity_score" -> x57,
    "x58_label_centroid_confusion" -> x58,
    "x59_snapshot_diff" -> x59,
    "x60_streaming_cdc_snapshot" -> x60,
    "x61_batch_ann_topk" -> x61,
    "x62_corpus_shuffle_rank" -> x62,
    "x63_equidepth_histogram" -> x63,
    "x64_funnel_conversion" -> x64,
    "x65_cohort_retention" -> x65,
    "x66_pagerank_integer" -> x66,
    "x67_editdist_neardup" -> x67,
    "x68_gap_fill_forward" -> x68,
    "x69_bigram_vocab_topk" -> x69,
    "x70_certified_approx_pctl" -> x70,
    "x71_weighted_sample" -> x71,
    "x72_trending_topk" -> x72,
    "x73_cooccurrence_lift" -> x73,
    "x74_rfm_segments" -> x74,
    "x75_streaming_trending" -> x75,
    "x76_key_skew_report" -> x76,
    "x77_splice_overlap" -> x77,
    "x78_bucketed_join" -> x78,
    "x79_replica_sync_check" -> x79,
    "x80_uniform_rebalance" -> x80,
    "x81_sessionized_conversion" -> x81,
    "x82_frame_sampling" -> x82,
    "x83_hll_sketch_merge" -> x83,
    "x84_filter_funnel" -> x84,
    "x85_leakage_split" -> x85,
    "x86_time_weighted_avg" -> x86,
    "x87_robust_outliers" -> x87,
    "x88_containment_pairs" -> x88,
    "x89_index_delta_merge" -> x89,
    "x90_context_assembly" -> x90,
    "x91_int8_quantized_topk" -> x91,
    "x92_last_touch_attribution" -> x92,
    "x93_fk_conformance" -> x93,
    "x94_column_profile_wide" -> x94,
    "x95_bitmap_distinct_merge" -> x95,
    "x96_jl_projection_distortion" -> x96,
    "x97_streaming_sliding_window" -> x97,
    "x98_cluster_capped_retention" -> x98,
    "x99_zscore_by_group" -> x99,
    "x100_curated_corpus_summary" -> x100,
    "x101_binaryfile_ingest" -> x101,
    "x102_prefix_novelty" -> x102,
    "x103_bigram_association" -> x103,
    "x104_hits_integer" -> x104,
    "x105_waterfill_budget" -> x105,
    "x106_bounded_stream_dedup" -> x106,
    "x107_corrupt_quarantine" -> x107,
    "x108_sync_repair_diff" -> x108,
    "x109_skew_safe_distinct" -> x109,
    "x110_incremental_join" -> x110,
    "x111_transform_with_state" -> x111,
    "x112_schema_drift_read" -> x112,
    "x113_dynamic_partition_overwrite" -> x113,
    "x114_prefix_filter_join" -> x114,
    "x115_correlation_matrix" -> x115,
    "x116_source_divergence" -> x116,
    "x117_perceptual_image_dedup" -> x117,
    "x118_histogram_quantiles" -> x118,
    "x119_audio_decode_features" -> x119,
    "x120_heavy_hitters_mg" -> x120,
    "x121_gap_fill_interpolate" -> x121,
    "x122_round_robin_interleave" -> x122,
    "x123_snapshot_asof" -> x123,
    "x124_mergeable_histogram" -> x124,
    "x125_mask_schedule" -> x125,
    "x126_source_containment" -> x126,
    "x127_pareto_frontier" -> x127,
    "x128_streaming_histogram" -> x128,
    "x129_dynamic_partition_pruning" -> x129,
    "x130_temporal_history_join" -> x130,
    "x131_trend_slope" -> x131,
    "x132_file_skipping_index" -> x132,
    "x133_budgeted_selection" -> x133,
    "x134_multitouch_attribution" -> x134,
    "x135_negative_sampling" -> x135,
    "x136_percentile_calibration" -> x136,
    "x137_session_funnel" -> x137,
    "x138_interarrival_percentiles" -> x138,
    "x139_weighted_median" -> x139,
    "x140_group_mode" -> x140,
    "x141_transition_matrix" -> x141,
    "x142_trigram_search" -> x142,
    "x143_benford_audit" -> x143,
    "x144_temporal_split" -> x144,
    "x145_winsorized_mean" -> x145,
    "x146_daily_streaks" -> x146,
    "x147_ab_experiment" -> x147,
    "x148_consistent_hash_migration" -> x148,
    "x149_largest_remainder_alloc" -> x149,
    "x150_bounded_contribution" -> x150,
    "x151_rolling_distinct_users" -> x151,
    "x152_skew_partition_plan" -> x152,
    "x153_federated_median_audit" -> x153,
    "x154_k_anonymity_audit" -> x154,
    "x155_growth_accounting" -> x155,
    "x156_systematic_pps_sample" -> x156,
    "x157_column_drift" -> x157,
    "x158_golden_record" -> x158,
    "x159_conversion_life_table" -> x159,
    "x160_audit_hash_chain" -> x160,
    "x161_weighted_quantiles" -> x161,
    "x162_diff_in_diff" -> x162,
    "x163_degree_concentration" -> x163,
    "x164_quantile_parity" -> x164,
    "x165_bounce_rate" -> x165,
    "x166_median_impute" -> x166,
    "x167_label_noise_audit" -> x167,
    "x168_top_journeys" -> x168,
    "x169_traffic_anomaly_days" -> x169,
    "x170_mixture_drift" -> x170,
    "x171_sla_attainment" -> x171,
    "x172_seasonality_profile" -> x172,
    "x173_revenue_concentration" -> x173,
    "x174_term_trends" -> x174,
    "x175_burst_detection" -> x175,
    "x176_join_cardinality_estimate" -> x176,
    "x177_transition_diversity" -> x177,
    "x178_positional_attribution" -> x178,
    "x179_decile_lift" -> x179,
    "x180_audio_frame_features" -> x180,
    "x181_kcore_prune" -> x181,
    "x182_timed_funnel" -> x182,
    "x183_ivf_cell_balance" -> x183,
    "x184_iqr_outlier_audit" -> x184,
    "x185_basket_pairs" -> x185,
    "x186_level_shift_scan" -> x186,
    "x187_nearest_event_match" -> x187,
    "x188_triangle_count" -> x188,
    "x189_blocked_name_match" -> x189,
    "x190_autocorrelation" -> x190,
    "x191_bpe_merge_candidates" -> x191,
    "x192_business_day_lag" -> x192,
    "x193_rank_agreement" -> x193,
    "x194_khop_frontier" -> x194,
    "x195_forget_impact" -> x195,
    "x196_doc_keywords" -> x196,
    "x197_dedup_rate_by_source" -> x197,
    "x198_geometric_smoothing" -> x198,
    "x199_peak_concurrency" -> x199,
    "x200_rrf_fusion" -> x200,
    "x201_also_bought" -> x201,
    "x202_completeness_grid" -> x202,
    "x203_log2_histogram" -> x203,
    "x204_cusum_drift" -> x204,
    "x205_revenue_waterfall" -> x205,
    "x206_lateness_audit" -> x206,
    "x207_time_decay_attribution" -> x207,
    "x208_cross_correlation" -> x208,
    "x209_cell_suppression" -> x209,
    "x210_revenue_bridge" -> x210,
    "x211_backlog_curve" -> x211,
    "x212_rate_limit_audit" -> x212,
    "x213_backfill_plan" -> x213,
    "x214_filter_overlap" -> x214,
    "x215_feature_hash_audit" -> x215,
    "x216_stopword_induction" -> x216,
    "x217_ann_recall_eval" -> x217,
    "x218_coordinated_sample" -> x218,
    "x219_frequent_triples" -> x219,
    "x220_domain_overlap" -> x220,
    "x221_topk_churn" -> x221,
    "x222_weekly_continuity" -> x222,
    "x223_seasonal_naive_backtest" -> x223,
    "x224_ivf_label_purity" -> x224,
    "x225_cluster_size_census" -> x225,
    "x226_share_of_parent" -> x226,
    "x227_fill_rate_bands" -> x227,
    "x228_near_dup_explanations" -> x228,
    "x229_vwap_deviation" -> x229,
    "x230_threshold_sweep" -> x230,
    "x231_ivf_cluster_topics" -> x231,
    "x232_freshness_report" -> x232,
    "x233_reconciliation_audit" -> x233,
    "x234_weekday_adjusted_outliers" -> x234,
    "x235_vocab_exclusivity" -> x235,
    "x236_touch_depth_histogram" -> x236,
    "x237_cross_source_dups" -> x237,
    "x238_reorder_eta" -> x238,
    "x239_hhi_trend" -> x239,
    "x240_effective_vocabulary" -> x240,
    "x241_dedup_token_savings" -> x241,
    "x242_fd_audit" -> x242,
    "x243_chi_square_audit" -> x243,
    "x244_session_gap_sweep" -> x244,
    "x245_frequency_spectrum" -> x245,
    "x246_embedding_norm_audit" -> x246,
    "x247_dimension_drift_audit" -> x247,
    "x248_token_set_dup_census" -> x248,
    "x249_pq_recall_audit" -> x249,
    "x250_first_touch_mix" -> x250,
    "x251_order_count_survival" -> x251,
    "x252_layout_run_advisor" -> x252,
    "x253_stickiness" -> x253,
    "x254_single_source_census" -> x254,
    "x255_vocab_novelty_curve" -> x255,
    "x256_cluster_density_audit" -> x256,
    "x257_integer_headroom_audit" -> x257,
    "x258_streaming_outer_join" -> x258,
    "x259_price_ending_census" -> x259,
    "x260_retention_half_life" -> x260,
    "x261_abc_classification" -> x261,
    "x262_missingness_patterns" -> x262,
    "x263_median_delta_trend" -> x263,
    "x264_double_charge_audit" -> x264,
    "x265_popularity_affinity" -> x265,
    "x266_geo_block_join" -> x266,
    "x267_hash_bootstrap_ci" -> x267,
    "x268_bootstrap_ab_diff" -> x268,
    "x269_dedup_method_eval" -> x269,
    "x270_ivf_pq_recall" -> x270,
    "x271_transition_dwell_median" -> x271,
    "x272_embedding_outlier_audit" -> x272,
    "x273_id_continuity_census" -> x273,
    "x274_discount_lift" -> x274,
    "x275_effective_branching" -> x275,
    "x276_child_numbering_audit" -> x276,
    "x277_order_collision_census" -> x277,
    "x278_checkpoint_restart" -> x278,
    "x279_ann_fusion_eval" -> x279,
    "x280_diverse_topk" -> x280,
    "x281_cohort_value_curve" -> x281,
    "x282_boilerplate_mass" -> x282,
    "x283_spend_trajectory" -> x283,
    "x284_ks_distance" -> x284,
    "x285_neyman_allocation" -> x285,
    "x286_discriminative_terms" -> x286,
    "x287_ts_collision_census" -> x287,
    "x288_lifetime_span_histogram" -> x288,
    "x289_qq_decile_table" -> x289,
    "x290_split_shipment_census" -> x290,
    "x291_source_centroid_similarity" -> x291,
    "x292_outage_streaks" -> x292,
    "x293_cadence_dispersion" -> x293,
    "x294_feature_propensity" -> x294,
    "x295_dedup_quality_uplift" -> x295,
    "x296_rhythm_similarity" -> x296,
    "x297_temporal_order_audit" -> x297,
    "x298_basket_confidence" -> x298,
    "x299_brand_return_rate" -> x299,
    "x300_ivf_pq_rerank" -> x300,
    "x301_conversion_by_depth" -> x301,
    "x302_top_decile_retention" -> x302,
    "x303_token_budget_matrix" -> x303,
    "x304_embedding_coverage" -> x304,
    "x305_arpu_trend" -> x305,
    "x306_new_returning_revenue" -> x306,
    "x307_time_to_second_purchase" -> x307,
    "x308_conversion_latency" -> x308,
    "x309_service_level_sweep" -> x309,
    "x310_repeat_by_first_basket" -> x310,
    "x311_copurchase_degree_census" -> x311,
    "x312_hapax_share" -> x312,
    "x313_supplier_return_census" -> x313,
    "x314_priority_mix_drift" -> x314,
    "x315_top_conversion_paths" -> x315,
    "x316_reorder_gap_quartiles" -> x316,
    "x317_char_class_mix" -> x317,
    "x318_brand_quantity_mode" -> x318,
    "x319_nation_trade_balance" -> x319,
    "x320_inactive_customer_census" -> x320,
    "x321_brand_momentum" -> x321,
    "x322_month_end_concentration" -> x322,
    "x323_volume_discount_curve" -> x323,
    "x324_balance_band_activity" -> x324,
    "x325_brand_seasonal_index" -> x325,
    "x326_cross_lang_dups" -> x326,
    "x327_brand_volatility" -> x327,
    "x328_word_length_histogram" -> x328,
    "x329_dup_transitivity_audit" -> x329,
    "x330_event_mix_drift" -> x330,
    "x331_price_realization" -> x331,
    "x332_trailing_mean_backtest" -> x332,
    "x333_dead_stock_census" -> x333,
    "x334_hourly_load_profile" -> x334,
    "x335_decile_migration" -> x335,
    "x336_pre_exit_degradation" -> x336,
    "x337_supplier_quadrant_census" -> x337,
    "x338_cross_lang_vocab_overlap" -> x338,
    "x339_nation_brand_affinity" -> x339,
    "x340_bucket_balance_census" -> x340,
    "x341_error_purchase_proximity" -> x341,
    "x342_event_value_quantiles" -> x342,
    "x343_region_quarter_growth" -> x343,
    "x344_dup_similarity_histogram" -> x344,
    "x345_brand_supply_concentration" -> x345,
    "x346_ingest_composition_drift" -> x346,
    "x347_first_session_activation" -> x347,
    "x348_brand_regional_spread" -> x348,
    "x349_null_cooccurrence_audit" -> x349,
    "x350_whale_dependence" -> x350,
    "x351_brand_attach_rate" -> x351,
    "x352_loyalty_streak_census" -> x352,
    "x353_template_family_census" -> x353,
    "x354_post_large_order_gap" -> x354,
    "x355_corpus_sourcing_chi2" -> x355,
    "x356_ship_delay_quantiles" -> x356,
    "x357_event_audience_overlap" -> x357,
    "x358_return_rate_trend" -> x358,
    "x359_reactivation_value" -> x359,
    "x360_vector_sparsity_census" -> x360,
    "x361_dim_sign_agreement" -> x361,
    "x362_catalog_hierarchy_rollup" -> x362,
    "x363_brand_loyalty_depth" -> x363,
    "x364_order_consolidation_census" -> x364,
    "x365_line_concentration_census" -> x365,
    "x366_dup_rate_by_length" -> x366,
    "x367_digit_density_outliers" -> x367,
    "x368_shared_supplier_exposure" -> x368,
    "x369_basket_size_mode" -> x369,
    "x370_basket_size_economics" -> x370,
    "x371_dup_quality_gap" -> x371,
    "x372_conversion_by_first_touch" -> x372,
    "x373_token_position_profile" -> x373,
    "x374_discount_calendar" -> x374,
    "x375_purchase_value_progression" -> x375,
    "x376_lang_misfile_queue" -> x376,
    "x377_source_language_purity" -> x377,
    "x378_customer_value_maturation" -> x378,
    "x379_label_lang_matrix" -> x379,
    "x380_whale_leaderboard" -> x380,
    "x381_wow_volatility" -> x381,
    "x382_token_stutter_census" -> x382,
    "x383_weekpart_revenue" -> x383,
    "x384_embedding_sign_balance" -> x384,
    "x385_return_by_price_band" -> x385,
    "x386_attention_concentration" -> x386,
    "x387_supplier_activity_census" -> x387,
    "x388_hourly_error_rate" -> x388,
    "x389_size_value_curve" -> x389,
    "x390_market_mix_drift" -> x390,
    "x391_doc_length_quantiles" -> x391,
    "x392_reorder_gap_spectrum" -> x392,
    "x393_balance_band_repeat" -> x393,
    "x394_region_assortment_breadth" -> x394,
    "x395_weekday_discount_profile" -> x395,
    "x396_user_engagement_quadrants" -> x396,
    "x397_brand_premium_index" -> x397,
    "x398_dup_degree_census" -> x398,
    "x399_value_mass_vs_traffic" -> x399,
    "x400_corpus_master_report" -> x400,
    "x401_chronic_supplier_streaks" -> x401,
    "x402_price_ladder_integrity" -> x402,
    "x403_nation_segment_skew" -> x403,
    "x404_return_by_quantity" -> x404,
    "x405_vector_collision_census" -> x405,
    "x406_brand_assortment_span" -> x406,
    "x407_value_by_tenure" -> x407,
    "x408_orphan_vector_audit" -> x408,
    "x409_cohort_ltv_triangle" -> x409,
    "x410_line_position_curve" -> x410,
    "x411_regional_taste_table" -> x411,
    "x412_discount_effectiveness" -> x412,
    "x413_feature_domain_audit" -> x413,
    "x414_catalog_name_vocab" -> x414,
    "x415_denormalized_name_audit" -> x415,
    "x416_domain_constraint_audit" -> x416,
    "x417_brand_penetration" -> x417,
    "x418_quality_by_ingest_decile" -> x418,
    "x419_transition_asymmetry" -> x419,
    "x420_seasonal_peak_alignment" -> x420,
    "x421_corpus_aa_audit" -> x421,
    "x422_events_domain_audit" -> x422,
    "x423_language_ingest_drift" -> x423,
    "x424_token_hash_balance" -> x424,
    "x425_order_day_coverage" -> x425,
    "x426_dedup_threshold_margin" -> x426,
    "x427_catalog_name_collisions" -> x427,
    "x428_sessions_per_user_census" -> x428,
    "x429_brand_price_architecture" -> x429,
    "x430_ship_delay_trend" -> x430,
    "x431_catalog_price_drift" -> x431,
    "x432_value_weighted_returns" -> x432,
    "x433_weekday_habit_census" -> x433,
    "x434_quality_length_grid" -> x434,
    "x435_reorder_cadence_trend" -> x435,
    "x436_acquisition_curve" -> x436,
    "x437_cluster_source_span" -> x437,
    "x438_supplier_specialization" -> x438,
    "x439_brand_customer_reach" -> x439,
    "x440_error_concentration" -> x440,
    "x441_supplier_health_throughput" -> x441,
    "x442_degree_assortativity" -> x442,
    "x443_sentence_length_census" -> x443,
    "x444_value_spread_census" -> x444,
    "x445_oov_rate_by_source" -> x445,
    "x446_label_margin_census" -> x446,
    "x447_revenue_max_drawdown" -> x447,
    "x448_syndication_direction" -> x448,
    "x449_supplier_reliability" -> x449,
    "x450_clustering_coeff_census" -> x450,
    "x451_event_coday_lift" -> x451,
    "x452_dim_energy_spectrum" -> x452,
    "x453_peak_load_headroom" -> x453,
    "x454_pack_adjacency_audit" -> x454,
    "x455_overdispersion_audit" -> x455,
    "x456_centroid_stability" -> x456,
    "x457_session_handoff_matrix" -> x457,
    "x458_fulfillment_span_census" -> x458,
    "x459_props_payload_audit" -> x459,
    "x460_priority_inversion_weeks" -> x460,
    "x461_region_demand_synchrony" -> x461,
    "x462_pack_len_sweep" -> x462,
    "x463_doc_feature_corr" -> x463,
    "x464_state_staleness" -> x464,
    "x465_catalog_ratio_census" -> x465,
    "x466_weekday_shift_matrix" -> x466,
    "x467_serial_returner_census" -> x467,
    "x468_brand_price_anova" -> x468,
    "x469_brand_rank_stability" -> x469,
    "x470_trade_homophily" -> x470,
    "x471_size_price_slope" -> x471,
    "x472_bootstrap_median_ci" -> x472,
    "x473_supplier_price_spread" -> x473,
    "x474_anomaly_attribution" -> x474,
    "x475_sample_fidelity" -> x475,
    "x476_funnel_parity_nation" -> x476,
    "x477_kmeans_step_audit" -> x477,
    "x478_ht_estimator_audit" -> x478,
    "x479_retention_first_touch" -> x479,
    "x480_approx_distinct_calibration" -> x480,
    "x481_copurchase_weight_spectrum" -> x481,
    "x482_join_funnel_audit" -> x482,
    "x483_assortment_discovery" -> x483,
    "x484_rep_policy_divergence" -> x484,
    "x485_fingerprint_bits_sweep" -> x485,
    "x486_embedding_geometry_census" -> x486,
    "x487_supplier_trend_census" -> x487,
    "x488_quantizer_bits_sweep" -> x488,
    "x489_priority_escalation" -> x489,
    "x490_partition_count_sweep" -> x490,
    "x491_image_gradient_energy" -> x491,
    "x492_payload_value_interaction" -> x492,
    "x493_nowcast_ratio_table" -> x493,
    "x494_source_ks_conformance" -> x494,
    "x495_rich_club_profile" -> x495,
    "x496_delisting_blast_radius" -> x496,
    "x497_quality_cutoff_curve" -> x497,
    "x498_rapid_fire_census" -> x498,
    "x499_predicate_selectivity" -> x499,
    "x500_majority_vote_repair" -> x500,
    "x501_protocol_violation_census" -> x501,
    "x502_source_influence_vocab" -> x502,
    "x503_weekday_anova" -> x503,
    "x504_ooo_delivery_census" -> x504,
    "x505_lsh_config_invariance" -> x505,
    "x506_probe_depth_certificate" -> x506,
    "x507_failover_coverage" -> x507,
    "x508_return_by_delay" -> x508,
    "x509_order_total_conformance" -> x509,
    "x510_degree_mixing_matrix" -> x510,
    "x511_domestic_foreign_delay" -> x511,
    "x512_build_side_advisor" -> x512,
    "x513_cross_system_value_ks" -> x513,
    "x514_product_family_census" -> x514,
    "x515_relationship_stickiness" -> x515,
    "x516_buyer_breadth_quadrants" -> x516,
    "x517_recall_k_curve" -> x517,
    "x518_hub_removal_sweep" -> x518,
    "x519_length_tail_ratio" -> x519,
    "x520_watermark_sizing" -> x520,
    "x521_type_mix_drift" -> x521,
    "x522_video_motion_proxy" -> x522,
    "x523_mann_whitney_auc" -> x523,
    "x524_daily_burstiness" -> x524,
    "x525_image_resize_audit" -> x525,
    "x526_blocking_quality_audit" -> x526,
    "x527_audio_decimation_audit" -> x527,
    "x528_join_cardinality_estimate" -> x528,
    "x529_kmv_sketch_audit" -> x529,
    "x530_revenue_drawdown" -> x530,
    "x531_order_wip_depth" -> x531,
    "x532_partial_agg_advisor" -> x532,
    "x533_bitemporal_asof" -> x533,
    "x534_image_histogram_census" -> x534,
    "x535_admission_control_census" -> x535,
    "x536_l_diversity_audit" -> x536,
    "x537_join_order_audit" -> x537,
    "x538_sorted_neighborhood_audit" -> x538,
    "x539_mmr_rerank" -> x539,
    "x540_vector_ingest_guard" -> x540,
    "x541_stream_full_outer_join" -> x541,
    "x542_changepoint_localization" -> x542,
    "x543_relationship_lifecycle" -> x543,
    "x544_median_rollup_guard" -> x544,
    "x545_seasonal_index" -> x545,
    "x546_t_closeness_audit" -> x546,
    "x547_delta_varint_advisor" -> x547,
    "x548_layout_skipping_compare" -> x548)

  // ---- oracle SQL ----------------------------------------------------------

  /** Poisson(1) multiplicity CASE over the 60-bit hash `h`, built from
    * [[Sampling.PoissonThresholds]] so the Spark expression and the
    * oracle share ONE set of threshold literals (x267). */
  private val poissonCaseSql: String =
    Sampling.PoissonThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN h < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** Shared CTE chain: exact pairwise n-gram jaccard in DuckDB (shingle
    * join — same algorithm as [[Dedup.ngramJaccard]]); `jpairs` holds
    * (d1, d2, jaccard) filtered at `threshold`. `maxDf` mirrors the
    * operator's document-frequency cap: capped shingles leave the pair join
    * but per-doc sizes stay exact. */
  /** CTE chain reproducing x48's CDC merge (`news` holds the merged
    * snapshot) — shared by the x48 and x59 oracles. */
  private val cdcMergeCtes: String =
    """chg AS (SELECT
      |  CASE WHEN o_orderkey % 7 = 0 THEN -o_custkey ELSE o_custkey END AS c_custkey,
      |  1 AS is_change, o_orderdate AS ts, o_orderkey AS seq,
      |  CASE WHEN o_orderkey % 13 = 0 THEN 'D' ELSE 'U' END AS op,
      |  o_totalprice AS c_acctbal,
      |  'SEG' || CAST(o_orderkey % 5 AS VARCHAR) AS c_mktsegment
      | FROM orders),
      |base AS (SELECT c_custkey, 0 AS is_change, CAST(NULL AS TIMESTAMP) AS ts,
      |  CAST(NULL AS BIGINT) AS seq, 'U' AS op, c_acctbal, c_mktsegment FROM customer),
      |u AS (SELECT * FROM base UNION ALL SELECT * FROM chg),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
      |  ORDER BY is_change DESC, ts DESC NULLS LAST, seq DESC NULLS LAST) AS rn FROM u),
      |news AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM r
      |  WHERE rn = 1 AND op <> 'D')""".stripMargin.replace("\n", " ")

  /** Shared CTE prefix: distinct 3-gram shingles + per-doc set sizes over
    * `documents` (`sh` holds (doc_id, s), `sizes` holds (doc_id, n)). */
  private val shingleCtes: String =
    """w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |ix AS (SELECT doc_id, ws, unnest(range(len(ws)-2)) AS i FROM w WHERE len(ws) >= 3),
      |sh AS (SELECT DISTINCT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s FROM ix),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)"""
      .stripMargin.replace("\n", " ")

  private def jaccardCtes(threshold: Double, maxDf: Option[Int] = None): String = {
    val joinSrc = maxDf match {
      case Some(cap) =>
        s"""df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
           |shj AS (SELECT sh.doc_id, sh.s FROM sh JOIN df ON df.s = sh.s AND df.df <= $cap),"""
          .stripMargin.replace("\n", " ")
      case None => "shj AS (SELECT doc_id, s FROM sh),"
    }
    s"""$shingleCtes,
       |$joinSrc
       |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
       |  FROM shj a JOIN shj b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |jpairs AS (
       | SELECT d1, d2, CAST(inter AS DOUBLE)/CAST(s1.n + s2.n - inter AS DOUBLE) AS jaccard
       | FROM pairs JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
       | WHERE CAST(inter AS DOUBLE)/CAST(s1.n + s2.n - inter AS DOUBLE) >= $threshold)"""
      .stripMargin.replace("\n", " ")
  }

  private def jaccardOracle(threshold: Double, maxDf: Option[Int] = None): String =
    s"WITH ${jaccardCtes(threshold, maxDf)} SELECT d1, d2, jaccard FROM jpairs ORDER BY d1, d2"

  /** Unrolled 3-round min-label propagation over the jaccard-0.7 pair graph
    * (mirrors [[Dedup.dupClusters]] exactly); final labels in CTE `l3`. */
  private val clusterCtes: String = {
    def round(prev: String, cur: String): String =
      s"""$cur AS (SELECT l.node AS node, LEAST(l.label, COALESCE(MIN(r.label), l.label)) AS label
         | FROM $prev l LEFT JOIN edges e ON e.a = l.node LEFT JOIN $prev r ON r.node = e.b
         | GROUP BY l.node, l.label)""".stripMargin.replace("\n", " ")
    (s"${jaccardCtes(0.7)}, " +
      "edges AS (SELECT d1 AS a, d2 AS b FROM jpairs UNION ALL SELECT d2 AS a, d1 AS b FROM jpairs), " +
      "l0 AS (SELECT DISTINCT a AS node, a AS label FROM edges), " +
      round("l0", "l1") + ", " + round("l1", "l2") + ", " + round("l2", "l3"))
  }

  private val clustersOracle: String =
    s"WITH $clusterCtes SELECT node AS doc_id, label AS cluster FROM l3 ORDER BY doc_id"

  /** CTE chain computing [[TextAnalysis.qualityScore]] per doc (`qscore`
    * holds (doc_id, n_tok, score)) — shared by the x09 and x24 oracles. */
  private val qualityCtes: String =
    """qbase AS (SELECT doc_id, source,
      |  CAST(len(string_split(text,' ')) AS DOUBLE) AS ntok,
      |  CAST(length(text) AS DOUBLE) AS nchars,
      |  CAST(length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) AS nalnum,
      |  CAST(length(replace(text, 'the', '')) AS DOUBLE) AS nnothe
      | FROM documents),
      |qscore AS (SELECT doc_id, source, CAST(ntok AS INT) AS n_tok,
      |  0.25 * (CASE WHEN ntok BETWEEN 10 AND 500 THEN 1.0 ELSE 0.2 END)
      |  + 0.25 * (CASE WHEN (nchars - ntok + 1.0)/ntok BETWEEN 3.0 AND 9.0 THEN 1.0 ELSE 0.2 END)
      |  + 0.25 * (1.0 - (nchars - nalnum)/nchars)
      |  + 0.25 * least(((nchars - nnothe)/3.0)/ntok * 10.0, 1.0) AS score
      | FROM qbase)""".stripMargin.replace("\n", " ")

  /** Double-precision cosine in DuckDB, structurally identical to
    * [[Similarity.cosine]] (same fold order ⇒ bit-identical doubles;
    * the float32 builtins list_cosine_similarity/list_dot_product are NOT
    * usable here). */
  private val cosSql =
    """list_aggregate(list_transform(list_zip(embedding, qe), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
      | / (sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
      |  * sqrt(list_aggregate(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))"""
      .stripMargin.replace("\n", " ")

  /** Unrolled 5-round MMR greedy selection (mirrors
    * [[graft.operators.Similarity.mmrRerank]] exactly: integer micro-unit
    * scores, 7·rel − 3·maxsim, vec_id tie-break; round r's candidate set
    * excludes rounds 1..r−1 via NOT IN over the accumulated CTE). */
  private lazy val mmrOracle: String = {
    def round(r: Int): String = {
      val prevSel = s"e${r - 1}"
      s"""r$r AS (SELECT c.vec_id, 7 * c.rel - 3 * MAX(p.sim_u) AS score
         | FROM cv c JOIN pr p ON p.va = c.vec_id
         |  JOIN $prevSel ON p.vb = $prevSel.vec_id
         | WHERE c.vec_id NOT IN (SELECT vec_id FROM $prevSel)
         | GROUP BY c.vec_id, c.rel),
         |s$r AS (SELECT vec_id, score FROM r$r
         | ORDER BY score DESC, vec_id LIMIT 1),
         |e$r AS (SELECT vec_id FROM e${r - 1}
         | UNION ALL SELECT vec_id FROM s$r)""".stripMargin.replace("\n", " ")
    }
    val rounds = (2 to 5).map(round).mkString(", ")
    val fin = (1 to 5).map(r =>
      s"SELECT $r AS rank, vec_id, score FROM s$r").mkString(" UNION ALL ")
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |tk AS (SELECT vec_id, embedding, ROUND($cosSql, 6) AS sim
       | FROM embeddings, q ORDER BY sim DESC, vec_id LIMIT 20),
       |cv AS (SELECT vec_id, embedding,
       |  CAST(ROUND(sim * 1000000, 0) AS BIGINT) AS rel FROM tk),
       |pr AS (SELECT a.vec_id AS va, b.vec_id AS vb,
       |  CAST(ROUND(ROUND(${cos2Sql("a.embedding", "b.embedding")}, 6)
       |   * 1000000, 0) AS BIGINT) AS sim_u
       | FROM cv a JOIN cv b ON a.vec_id <> b.vec_id),
       |s1 AS (SELECT vec_id, 7 * rel AS score FROM cv
       | ORDER BY score DESC, vec_id LIMIT 1),
       |e1 AS (SELECT vec_id FROM s1),
       |$rounds,
       |fin AS ($fin)
       |SELECT CAST(fin.rank AS INT) AS rank, fin.vec_id,
       | cv.rel AS sim_micro, CAST(fin.score AS BIGINT) AS mmr_score_micro
       |FROM fin JOIN cv ON cv.vec_id = fin.vec_id ORDER BY rank"""
      .stripMargin.replace("\n", " ")
  }

  /** [[cosSql]] generalized to two named list columns. */
  private def cos2Sql(a: String, b: String): String =
    s"""list_aggregate(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
       | / (sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
       |  * sqrt(list_aggregate(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))"""
      .stripMargin.replace("\n", " ")

  /** CTE chain reproducing [[graft.functions.HyperplaneBandKeys]] exactly in
    * DuckDB: the ±1 masks are embedded as the SAME 64-bit literals the Spark
    * expression uses, the per-plane sum folds `embedding` in the same
    * ascending index order in double, and bits pack into band keys the same
    * way — so the LSH candidate set matches bit-for-bit across engines. */
  private def hyperplaneCtes(source: String = "embeddings",
      numBands: Int = Similarity.DefaultBands,
      rowsPerBand: Int = Similarity.DefaultRowsPerBand): String = {
    val r = rowsPerBand
    val masks = graft.functions.Hyperplanes.masks(numBands * r)
    val values = masks.zipWithIndex
      .map { case (m, p) => s"($p, CAST($m AS BIGINT))" }.mkString(", ")
    s"""planes AS (SELECT p, mask FROM (VALUES $values) t(p, mask)),
       |hpbits AS (SELECT e.vec_id, pl.p,
       |  CASE WHEN list_aggregate(list_transform(range(64), i ->
       |    CASE WHEN (pl.mask >> i) & 1 = 1 THEN CAST(e.embedding[i+1] AS DOUBLE)
       |         ELSE -CAST(e.embedding[i+1] AS DOUBLE) END), 'sum') > 0
       |   THEN 1 ELSE 0 END AS bit
       |  FROM $source e CROSS JOIN planes pl),
       |hpkeys AS (SELECT vec_id, p // $r AS band,
       |  CAST(SUM(CAST(bit AS BIGINT) << (p % $r)) AS BIGINT) AS bkey
       |  FROM hpbits GROUP BY 1, 2)""".stripMargin.replace("\n", " ")
  }

  /** DuckDB mirror of [[plantedEmb]]: embeddings plus perturbed copies of
    * vec_ids 1..20 — identical integer/double/float arithmetic, so the
    * planted vectors (and hence every downstream LSH key and cosine) match
    * Spark's bit-for-bit. */
  private val plantedEmbCte: String =
    s"""aug AS (SELECT vec_id, embedding FROM embeddings
       | UNION ALL
       | SELECT vec_id + $PlantOffset AS vec_id,
       |  list_transform(range(64), i -> CAST(CAST(embedding[i+1] AS DOUBLE)
       |    * (1.0 + CAST((i*37 + vec_id) % 7 - 3 AS DOUBLE)/100.0) AS FLOAT)) AS embedding
       | FROM embeddings WHERE vec_id BETWEEN 1 AND 20)""".stripMargin.replace("\n", " ")

  private def signBucketSql(v: String): String =
    (0 until 8).map(i => s"(CASE WHEN $v[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)").mkString(" + ")

  /** Oracle mirror of [[eventsNullUser]]: events with NULL user keys planted
    * on the same event-id modulus. */
  /** Parameterized histogram-quantile oracle (x118/x124/x128 share it):
    * the DIRECT single-pass computation over `sourceCte` (must yield a
    * BIGINT column `v`), matching `Analytics.quantilesFromBins`'s bin-edge
    * and target-rank arithmetic — one definition instead of three
    * hand-synced copies. */
  private def histogramOracle(sourceCte: String, nBins: Int,
      probs: Seq[Int]): String =
    s"""WITH c AS ($sourceCte),
       |st AS (SELECT MIN(v) AS vmin, MAX(v) AS vmax, COUNT(*) AS n FROM c),
       |bins AS (SELECT (v - vmin) * $nBins // (vmax - vmin + 1) AS b,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM c, st GROUP BY 1),
       |cum AS (SELECT b, cnt, CAST(SUM(cnt) OVER (ORDER BY b) AS BIGINT) AS crank
       |  FROM bins),
       |t AS (SELECT p_pct, n, (p_pct * n + 99) // 100 AS target_rank
       |  FROM (VALUES ${probs.map(p => s"($p)").mkString(", ")}) p(p_pct), st),
       |pick AS (SELECT t.p_pct, t.n, t.target_rank, MIN(cum.b) AS b
       |  FROM t JOIN cum ON cum.crank >= t.target_rank GROUP BY 1, 2, 3)
       |SELECT CAST(p.p_pct AS INT) AS p_pct, p.n, p.target_rank,
       |  st.vmin + ((p.b + 1) * (st.vmax - st.vmin + 1) + ${nBins - 1}) // $nBins - 1
       |    AS approx_cents,
       |  cum.crank AS achieved_rank, cum.crank - p.target_rank AS rank_err,
       |  cum.cnt AS bound
       |FROM pick p JOIN cum ON cum.b = p.b, st
       |ORDER BY p_pct""".stripMargin.replace("\n", " ")

  private val lineitemCentsCte: String =
    "SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v FROM lineitem"

  private val nullUserCte: String =
    """ne AS (SELECT event_id, ts,
      |  CASE WHEN event_id % 211 = 0 THEN NULL ELSE user_id END AS user_id,
      |  event_type, value FROM events)""".stripMargin


  /** Unrolled integer-PageRank oracle: `n` damped rounds as CTE pairs
    * (sK = incoming contribution sums, iK = damped ranks) — the exact
    * arithmetic of [[graft.operators.Graph.pageRank]]. */
  private def pageRankOracle(n: Int): String = {
    val rounds = (1 to n).map { k =>
      val prev = if (k == 1) "r0" else s"i${k - 1}"
      s"""s$k AS (SELECT e.dst, SUM(p.r // deg.d) AS s FROM e
         | JOIN deg ON e.src = deg.src JOIN $prev p ON p.v = e.src
         | GROUP BY e.dst),
         |i$k AS (SELECT n.v, 150000000000 + (85 * COALESCE(s$k.s, 0)) // 100 AS r
         | FROM nodes n LEFT JOIN s$k ON s$k.dst = n.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
       |  's' || CAST(l_suppkey AS VARCHAR) AS dst
       | FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src),
       |nodes AS (SELECT src AS v FROM e UNION SELECT dst AS v FROM e),
       |r0 AS (SELECT v, CAST(1000000000000 AS BIGINT) AS r FROM nodes),
       |$rounds
       |SELECT v, CAST(r AS BIGINT) AS r FROM i$n ORDER BY r DESC, v LIMIT 20""".stripMargin.replace("\n", " ")
  }

  /** Unrolled integer-HITS oracle: `n` rounds as (aK, hK) CTE pairs — the
    * exact arithmetic of [[graft.operators.Graph.hits]] (auth from previous
    * hubs, hubs from the NEW auths; every SUM cast back from HUGEINT). */
  private def hitsOracle(n: Int): String = {
    val rounds = (1 to n).map { k =>
      val prevH = if (k == 1) "h0" else s"h${k - 1}"
      s"""a$k AS (SELECT n.v, CAST(COALESCE(SUM(p.h), 0) AS BIGINT) AS a
         | FROM nodes n LEFT JOIN e ON e.dst = n.v
         | LEFT JOIN $prevH p ON p.v = e.src GROUP BY n.v),
         |h$k AS (SELECT n.v, CAST(COALESCE(SUM(a$k.a), 0) AS BIGINT) AS h
         | FROM nodes n LEFT JOIN e ON e.src = n.v
         | LEFT JOIN a$k ON a$k.v = e.dst GROUP BY n.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
       |  's' || CAST(l_suppkey AS VARCHAR) AS dst
       | FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |nodes AS (SELECT src AS v FROM e UNION SELECT dst AS v FROM e),
       |h0 AS (SELECT v, CAST(1000000 AS BIGINT) AS h FROM nodes),
       |$rounds
       |SELECT h$n.v, h$n.h, a$n.a FROM h$n JOIN a$n ON a$n.v = h$n.v
       |ORDER BY a$n.a DESC, h$n.h DESC, h$n.v LIMIT 20"""
      .stripMargin.replace("\n", " ")
  }

  /** x115 oracle: the same exact-decimal moment sums and the same fixed
    * double expression as [[graft.operators.Analytics.correlationMatrix]] —
    * identical inputs + identical IEEE operation order ⇒ identical
    * coefficients. DECIMAL(19,4) (not 18) on the DuckDB side: width ≤ 18
    * keeps DuckDB's multiply in int64, which overflows on extendedprice² —
    * 19 forces HUGEINT arithmetic. Same scale-4 values either way, so the
    * exact moment sums match Spark's decimal(18,4) products bit-for-bit. */
  private val corrMatrixOracle: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def d4(c: String) = s"CAST($c AS DECIMAL(19,4))"
    val moments = cols.flatMap(c =>
      Seq(s"SUM(${d4(c)}) AS s_$c", s"SUM(${d4(c)} * ${d4(c)}) AS q_$c")) ++
      (for { i <- cols.indices; j <- cols.indices if i < j } yield
        s"SUM(${d4(cols(i))} * ${d4(cols(j))}) AS p_${cols(i)}_${cols(j)}")
    def dbl(x: String) = s"CAST($x AS DOUBLE)"
    val branches = (for { i <- cols.indices; j <- cols.indices if i < j } yield {
      val (a, b) = (cols(i), cols(j))
      val va = s"(${dbl("n")} * ${dbl(s"q_$a")} - ${dbl(s"s_$a")} * ${dbl(s"s_$a")})"
      val vb = s"(${dbl("n")} * ${dbl(s"q_$b")} - ${dbl(s"s_$b")} * ${dbl(s"s_$b")})"
      val cov = s"(${dbl("n")} * ${dbl(s"p_${a}_$b")} - ${dbl(s"s_$a")} * ${dbl(s"s_$b")})"
      s"SELECT '$a' AS col_x, '$b' AS col_y, n, " +
        s"CASE WHEN $va > 0 AND $vb > 0 " +
        s"THEN ROUND($cov / sqrt($va * $vb), 6) END AS corr FROM m"
    }).mkString(" UNION ALL ")
    s"WITH m AS (SELECT COUNT(*) AS n, ${moments.mkString(", ")} FROM lineitem " +
      s"WHERE ${cols.map(c => s"$c IS NOT NULL").mkString(" AND ")}) " +
      s"$branches ORDER BY col_x, col_y"
  }

  /** x517 oracle: the banded-LSH candidate set from the same hyperplane
    * mask literals, exact top-k on both sides, one overlap branch per k. */
  private val recallKCurveOracle: String = {
    val branches = Seq(1, 5, 10, 20).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS k,
         | CAST((SELECT COUNT(*) FROM
         |  (SELECT vec_id FROM embeddings, qv
         |   ORDER BY ROUND($cosSql, 6) DESC, vec_id LIMIT $k) tr
         |  JOIN (SELECT e.vec_id FROM embeddings e
         |    JOIN cand ON cand.vec_id = e.vec_id, qv
         |   ORDER BY ROUND(${cos2Sql("e.embedding", "qe")}, 6) DESC,
         |    e.vec_id LIMIT $k) ap USING (vec_id)) AS BIGINT) AS overlap,
         | CAST((SELECT COUNT(*) FROM
         |  (SELECT vec_id FROM embeddings, qv
         |   ORDER BY ROUND($cosSql, 6) DESC, vec_id LIMIT $k) tr
         |  JOIN (SELECT e.vec_id FROM embeddings e
         |    JOIN cand ON cand.vec_id = e.vec_id, qv
         |   ORDER BY ROUND(${cos2Sql("e.embedding", "qe")}, 6) DESC,
         |    e.vec_id LIMIT $k) ap USING (vec_id)) * 1000000 // $k
         |  AS BIGINT) AS recall_ppm""".stripMargin.replace("\n", " ")
    }
    s"""WITH ${hyperplaneCtes()},
       |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |cand AS (SELECT DISTINCT a.vec_id
       | FROM hpkeys a JOIN hpkeys q ON a.band = q.band AND a.bkey = q.bkey
       | WHERE q.vec_id = 0)
       |SELECT * FROM (${branches.mkString(" UNION ALL ")}) ORDER BY k"""
      .stripMargin.replace("\n", " ")
  }

  /** x488 oracle: the sign-bucket occupancy sweep, one UNION ALL branch
    * per bits value with the same sign-bit cell key as
    * [[graft.operators.Similarity.signBucket]]. */
  private val quantizerSweepOracle: String = {
    val branches = Seq(2, 4, 6, 8).map { bits =>
      val cell = (0 until bits)
        .map(i => s"(CASE WHEN embedding[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)")
        .mkString(" + ")
      s"""SELECT CAST($bits AS BIGINT) AS bits,
         | CAST(COUNT(*) AS BIGINT) AS cells_used,
         | CAST(${1L << bits} - COUNT(*) AS BIGINT) AS cells_empty,
         | CAST(MAX(n) * 1000000 // SUM(n) AS BIGINT) AS max_cell_ppm
         |FROM (SELECT $cell AS cell, CAST(COUNT(*) AS BIGINT) AS n
         | FROM embeddings GROUP BY 1)""".stripMargin.replace("\n", " ")
    }
    branches.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY bits")
  }

  /** x477 oracle: one exact Lloyd step in DuckDB — identical micro
    * scaling, identical truncated-division SSE identity, identical
    * n²-scaled integer distance and (d2, cell) tie-break, so the
    * reassignment matches Spark's bit for bit. */
  private val kmeansStepOracle: String = {
    val bucket4 = (0 until 4)
      .map(i => s"(CASE WHEN e.embedding[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH dims AS (SELECT e.vec_id, dd.d, e.embedding[dd.d+1] AS v
       | FROM embeddings e CROSS JOIN (SELECT unnest(range(64)) AS d) dd),
       |b AS (SELECT vec_id, d,
       |  CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT) AS m FROM dims),
       |a0 AS (SELECT e.vec_id, CAST($bucket4 AS BIGINT) AS cell
       | FROM embeddings e),
       |q AS (SELECT SUM(CAST(m AS HUGEINT) * m) AS qq,
       |  CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_vectors FROM b),
       |g0 AS (SELECT a0.cell, b.d, SUM(CAST(b.m AS HUGEINT)) AS s,
       |  CAST(COUNT(*) AS HUGEINT) AS n
       | FROM b JOIN a0 USING (vec_id) GROUP BY 1, 2),
       |s0 AS (SELECT SUM(s * s // n) AS ssb,
       |  CAST(COUNT(DISTINCT cell) AS BIGINT) AS nc FROM g0),
       |di AS (SELECT b.vec_id, g0.cell, MAX(g0.n) AS n,
       |  SUM((g0.n * b.m - g0.s) * (g0.n * b.m - g0.s)) AS a
       | FROM b JOIN g0 ON b.d = g0.d GROUP BY 1, 2),
       |d2 AS (SELECT vec_id, cell, a // (n * n) AS d2 FROM di),
       |a1 AS (SELECT vec_id, cell FROM (SELECT vec_id, cell,
       |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rk
       |  FROM d2) WHERE rk = 1),
       |g1 AS (SELECT a1.cell, b.d, SUM(CAST(b.m AS HUGEINT)) AS s,
       |  CAST(COUNT(*) AS HUGEINT) AS n
       | FROM b JOIN a1 USING (vec_id) GROUP BY 1, 2),
       |s1 AS (SELECT SUM(s * s // n) AS ssb,
       |  CAST(COUNT(DISTINCT cell) AS BIGINT) AS nc FROM g1)
       |SELECT q.n_vectors, s0.nc AS n_cells_before, s1.nc AS n_cells_after,
       | CAST((q.qq - s0.ssb) // 1000000 AS BIGINT) AS sse_before_scaled,
       | CAST((q.qq - s1.ssb) // 1000000 AS BIGINT) AS sse_after_scaled,
       | CAST(CASE WHEN s1.ssb > s0.ssb
       |  THEN (s1.ssb - s0.ssb) * 1000000 // (q.qq - s0.ssb)
       |  ELSE 0 END AS BIGINT) AS improvement_ppm
       |FROM q CROSS JOIN s0 CROSS JOIN s1"""
      .stripMargin.replace("\n", " ")
  }

  /** x463 oracle: the [[corrMatrixOracle]] construction over per-document
    * text features computed in DuckDB (same exact integer moments, same
    * double ratio and rounding). */
  private val docFeatureCorrOracle: String = {
    val cols = Seq("chars", "tokens", "uniq", "longest")
    def dbl(x: String) = s"CAST($x AS DOUBLE)"
    val moments = cols.flatMap(c => Seq(
      s"SUM(CAST($c AS HUGEINT)) AS s_$c",
      s"SUM(CAST($c AS HUGEINT) * $c) AS q_$c")) ++
      (for { i <- cols.indices; j <- cols.indices if i < j } yield
        s"SUM(CAST(${cols(i)} AS HUGEINT) * ${cols(j)}) AS p_${cols(i)}_${cols(j)}")
    val branches = (for { i <- cols.indices; j <- cols.indices if i < j } yield {
      val (a, b) = (cols(i), cols(j))
      val va = s"(${dbl("n")} * ${dbl(s"q_$a")} - ${dbl(s"s_$a")} * ${dbl(s"s_$a")})"
      val vb = s"(${dbl("n")} * ${dbl(s"q_$b")} - ${dbl(s"s_$b")} * ${dbl(s"s_$b")})"
      val cov = s"(${dbl("n")} * ${dbl(s"p_${a}_$b")} - ${dbl(s"s_$a")} * ${dbl(s"s_$b")})"
      s"SELECT '$a' AS col_x, '$b' AS col_y, n, " +
        s"CASE WHEN $va > 0 AND $vb > 0 " +
        s"THEN ROUND($cov / sqrt($va * $vb), 6) END AS corr FROM m"
    }).mkString(" UNION ALL ")
    "WITH f AS (SELECT CAST(n_chars AS BIGINT) AS chars, " +
      "CAST(len(string_split(text, ' ')) AS BIGINT) AS tokens, " +
      "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS uniq, " +
      "CAST(list_max(list_transform(string_split(text, ' '), x -> len(x))) " +
      "AS BIGINT) AS longest FROM documents WHERE text IS NOT NULL), " +
      s"m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, ${moments.mkString(", ")} FROM f) " +
      s"$branches ORDER BY col_x, col_y"
  }

  /** x116 oracle: same inner-join reduction of the union-over-tokens sum
    * (`Σ_union = 2NₐN_b + Σ_shared(|cN_b − dNₐ| − cN_b − dNₐ)`), staged
    * through HUGEINT (DuckDB's checked BIGINT multiply would raise on the
    * same products Spark stages through DECIMAL(38,0)); `//` on HUGEINT
    * floors = truncates for positives = Spark DIV. */
  private val sourceDivergenceOracle: String =
    ("""WITH w AS (SELECT source AS g, unnest(string_split(text, ' ')) AS w FROM documents),
       |c AS (SELECT g, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
       |n AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY 1),
       |j AS (SELECT a.g AS g1, b.g AS g2,
       |  SUM(abs(CAST(a.c AS HUGEINT) * nb.n - CAST(b.c AS HUGEINT) * na.n)
       |      - CAST(a.c AS HUGEINT) * nb.n - CAST(b.c AS HUGEINT) * na.n) AS s
       |  FROM c a JOIN c b ON a.w = b.w AND a.g < b.g
       |  JOIN n na ON na.g = a.g JOIN n nb ON nb.g = b.g GROUP BY 1, 2)
       |SELECT ta.g AS src_a, tb.g AS src_b, ta.n AS n_a, tb.n AS n_b,
       |  CAST((2 * CAST(ta.n AS HUGEINT) * tb.n + COALESCE(j.s, 0)) * 1000000
       |    // (2 * CAST(ta.n AS HUGEINT) * tb.n) AS BIGINT) AS tvd_ppm
       |FROM n ta JOIN n tb ON ta.g < tb.g
       |LEFT JOIN j ON j.g1 = ta.g AND j.g2 = tb.g
       |ORDER BY src_a, src_b""".stripMargin.replace("\n", " "))

  /** x117 oracle: the dHash pipeline recomputed ARITHMETICALLY from the
    * test-pattern formula (pixel = (31d+7x+13y) mod 256, nearest-neighbor
    * 9×8 grid, the planted +128 shift at grid slot (4,3)) — it matches the
    * Spark side only if the real PNG encode∘decode reproduced every pixel
    * AND the band join found every pair. Bit packing stays in BIGINT `<<`
    * (the SUM is HUGEINT → cast); `xor()` not `^` (DuckDB `^` is power). */
  private val perceptualDedupOracle: String =
    ("""WITH ids AS (
       |  SELECT doc_id AS img_id, doc_id AS d, 0 AS pert FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000000, doc_id, 1 FROM documents WHERE doc_id % 97 = 0),
       |dim AS (SELECT img_id, d, pert, 8 + d % 9 AS w, 8 + d % 7 AS h FROM ids),
       |s0 AS (
       |  SELECT img_id, pert, j.j AS j, i.i AS i,
       |    (i.i * w) // 9 AS x, (j.j * h) // 8 AS y,
       |    (4 * w) // 9 AS px, (3 * h) // 8 AS py,
       |    (d % 251) * 131 + 31 * ((i.i * w) // 9) + 17 * ((j.j * h) // 8) AS sr
       |  FROM dim, generate_series(0, 8) AS i(i), generate_series(0, 7) AS j(j)),
       |s AS (
       |  SELECT img_id, j, i,
       |    CASE WHEN pert = 1 AND x = px AND y = py
       |      THEN ((sr * sr + sr) % 251 + 128) % 256
       |      ELSE (sr * sr + sr) % 251
       |    END AS v
       |  FROM s0),
       |b AS (
       |  SELECT img_id, j, i, bit FROM (
       |    SELECT img_id, j, i,
       |      CASE WHEN LEAD(v) OVER (PARTITION BY img_id, j ORDER BY i) > v
       |        THEN 1 ELSE 0 END AS bit
       |    FROM s) t WHERE i < 8),
       |hh AS (SELECT img_id,
       |  CAST(SUM(CASE WHEN j < 4
       |    THEN CAST(bit AS BIGINT) << ((3 - j) * 8 + (7 - i)) ELSE 0 END) AS BIGINT) AS h1,
       |  CAST(SUM(CASE WHEN j >= 4
       |    THEN CAST(bit AS BIGINT) << ((7 - j) * 8 + (7 - i)) ELSE 0 END) AS BIGINT) AS h2
       |  FROM b GROUP BY 1),
       |bands AS (
       |  SELECT img_id, h1, h2, 0 AS band, h1 // 65536 AS v FROM hh
       |  UNION ALL SELECT img_id, h1, h2, 1, h1 % 65536 FROM hh
       |  UNION ALL SELECT img_id, h1, h2, 2, h2 // 65536 FROM hh
       |  UNION ALL SELECT img_id, h1, h2, 3, h2 % 65536 FROM hh),
       |cand AS (SELECT DISTINCT a.img_id AS img_a, b.img_id AS img_b,
       |    CAST(bit_count(xor(a.h1, b.h1)) AS INT)
       |      + CAST(bit_count(xor(a.h2, b.h2)) AS INT) AS hamming
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.v = b.v AND a.img_id < b.img_id)
       |SELECT img_a, img_b, hamming FROM cand WHERE hamming <= 3
       |ORDER BY img_a, img_b""".stripMargin.replace("\n", " "))

  val oracles: Map[String, String] = Map(
    "x115_correlation_matrix" -> corrMatrixOracle,
    "x116_source_divergence" -> sourceDivergenceOracle,
    "x117_perceptual_image_dedup" -> perceptualDedupOracle,
    "x118_histogram_quantiles" ->
      histogramOracle(lineitemCentsCte, nBins = 1024, probs = Seq(50, 90, 99)),
    "x119_audio_decode_features" ->
      ("""WITH p AS (SELECT doc_id, 64 + doc_id % 37 AS n FROM documents),
         |s AS (SELECT doc_id, n,
         |    ABS((doc_id * 31 + 7 * unnest(range(n))) % 65536 - 32768) AS a
         |  FROM p)
         |SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
         |  CAST(n AS BIGINT) AS n_samples,
         |  CAST(SUM(a) AS BIGINT) AS sum_abs, CAST(MAX(a) AS INT) AS peak
         |FROM s GROUP BY doc_id, n ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")),
    "x120_heavy_hitters_mg" ->
      ("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
         |c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
         |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c)
         |SELECT c.term, c.cnt, tot.n FROM c, tot
         |WHERE c.cnt * 31 > tot.n ORDER BY term"""
        .stripMargin.replace("\n", " ")),
    "x121_gap_fill_interpolate" ->
      (s"""WITH $nullUserCte,
         |pd AS (SELECT user_id, CAST(ts AS DATE) AS day,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
         |  ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
         |   ORDER BY ts DESC, event_id DESC) AS rn FROM ne),
         |dv AS (SELECT user_id, day, vc AS day_cents FROM pd WHERE rn = 1),
         |rng AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0,
         |  MAX(CAST(ts AS DATE)) AS d1 FROM ne GROUP BY user_id),
         |spine AS (SELECT user_id,
         |  CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
         | FROM rng),
         |f AS (SELECT s.user_id, s.day, d.day_cents FROM spine s
         |  LEFT JOIN dv d ON s.user_id = d.user_id AND s.day = d.day),
         |i AS (SELECT user_id, day, day_cents,
         |  LAST_VALUE(day_cents IGNORE NULLS) OVER wa AS prev_c,
         |  LAST_VALUE(CASE WHEN day_cents IS NOT NULL THEN day END IGNORE NULLS)
         |    OVER wa AS prev_day,
         |  LAST_VALUE(day_cents IGNORE NULLS) OVER wd AS next_c,
         |  LAST_VALUE(CASE WHEN day_cents IS NOT NULL THEN day END IGNORE NULLS)
         |    OVER wd AS next_day
         | FROM f WINDOW
         |  wa AS (PARTITION BY user_id ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wd AS (PARTITION BY user_id ORDER BY day DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         |SELECT user_id, day, day_cents,
         | CASE WHEN day_cents IS NOT NULL THEN day_cents
         |  ELSE (prev_c * (next_day - day) + next_c * (day - prev_day))
         |    // (next_day - prev_day) END AS interp_cents
         |FROM i ORDER BY user_id, day""".stripMargin.replace("\n", " ")),
    "x122_round_robin_interleave" ->
      ("""WITH si AS (SELECT source,
         |    ROW_NUMBER() OVER (ORDER BY source) - 1 AS src_idx
         |  FROM (SELECT DISTINCT source FROM documents)),
         |ns AS (SELECT COUNT(*) AS ns FROM si),
         |r AS (SELECT doc_id, source,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS src_rank
         |  FROM documents)
         |SELECT r.doc_id, r.source, CAST(r.src_rank AS BIGINT) AS src_rank,
         |  CAST((r.src_rank - 1) * ns.ns + si.src_idx AS BIGINT) AS pos
         |FROM r JOIN si USING (source), ns ORDER BY pos"""
        .stripMargin.replace("\n", " ")),
    "x123_snapshot_asof" ->
      ("""WITH p AS (SELECT user_id, ts, event_id, value FROM events
         |  WHERE event_type = 'purchase'),
         |v AS (SELECT user_id, ts, event_id, value,
         |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
         |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
         | FROM p),
         |h AS (SELECT user_id, CAST(version AS INT) AS version,
         |  STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
         |  COALESCE(STRFTIME(next_ts, '%Y-%m-%d %H:%M:%S'),
         |    '9999-12-31 00:00:00') AS valid_to,
         |  CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS is_current, value
         | FROM v)
         |SELECT user_id, version, valid_from, valid_to, is_current, value
         |FROM h WHERE valid_from <= '2024-01-15 00:00:00'
         |  AND '2024-01-15 00:00:00' < valid_to
         |ORDER BY user_id""".stripMargin.replace("\n", " ")),
    "x124_mergeable_histogram" ->
      histogramOracle(lineitemCentsCte, nBins = 512, probs = Seq(25, 75, 95)),
    "x125_mask_schedule" ->
      ("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |t AS (SELECT doc_id, unnest(range(len(ws))) AS pos FROM w),
         |m AS (SELECT doc_id, pos,
         |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
         |    CAST(pos AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 15 AS msk
         | FROM t)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         | CAST(SUM(CASE WHEN msk THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
         | CAST(COALESCE(MIN(CASE WHEN msk THEN pos END), -1) AS BIGINT)
         |   AS first_masked
         |FROM m GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")),
    "x126_source_containment" ->
      ("""WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
         |ix AS (SELECT source, ws, unnest(range(len(ws)-2)) AS i
         |  FROM w WHERE len(ws) >= 3),
         |sh AS (SELECT DISTINCT source,
         |    ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s FROM ix),
         |srcs AS (SELECT DISTINCT source FROM documents),
         |szr AS (SELECT source, COUNT(*) AS n_sh FROM sh GROUP BY source),
         |sz AS (SELECT srcs.source, COALESCE(szr.n_sh, 0) AS n_sh
         |  FROM srcs LEFT JOIN szr ON srcs.source = szr.source),
         |pc AS (SELECT a.source AS src_a, b.source AS src_b,
         |    CAST(COUNT(*) AS BIGINT) AS n_common
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.source <> b.source
         |  GROUP BY 1, 2),
         |sp AS (SELECT a.source AS src_a, a.n_sh, b.source AS src_b
         |  FROM sz a, sz b WHERE a.source <> b.source)
         |SELECT sp.src_a, sp.src_b,
         | CAST(COALESCE(pc.n_common, 0) AS BIGINT) AS n_common,
         | CASE WHEN sp.n_sh = 0 THEN CAST(0 AS BIGINT)
         |  ELSE COALESCE(pc.n_common, 0) * 1000000 // sp.n_sh END
         |  AS containment_ppm
         |FROM sp LEFT JOIN pc ON sp.src_a = pc.src_a AND sp.src_b = pc.src_b
         |ORDER BY 1, 2""".stripMargin.replace("\n", " ")),
    "x127_pareto_frontier" ->
      (s"""WITH $qualityCtes,
         |q AS (SELECT doc_id, CAST(FLOOR(score * 100) AS BIGINT) AS q_centi,
         |    CAST(nchars AS BIGINT) AS n_chars
         |  FROM qscore JOIN qbase USING (doc_id))
         |SELECT doc_id, q_centi, n_chars FROM q a
         |WHERE NOT EXISTS (SELECT 1 FROM q b
         |  WHERE b.q_centi >= a.q_centi AND b.n_chars >= a.n_chars
         |    AND (b.q_centi > a.q_centi OR b.n_chars > a.n_chars))
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x128_streaming_histogram" ->
      histogramOracle(
        "SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v FROM events",
        nBins = 256, probs = Seq(50, 90, 99)),
    "x129_dynamic_partition_pruning" ->
      ("""SELECT event_type, COUNT(*) AS n,
         | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM events WHERE day(CAST(ts AS DATE)) % 7 = 3
         |GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),
    "x130_temporal_history_join" ->
      ("""WITH p AS (SELECT user_id, ts, event_id, value FROM events
         |  WHERE event_type = 'purchase'),
         |v AS (SELECT user_id, ts, event_id, value,
         |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
         |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
         | FROM p),
         |h AS (SELECT user_id, CAST(version AS INT) AS version,
         |  STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
         |  COALESCE(STRFTIME(next_ts, '%Y-%m-%d %H:%M:%S'),
         |    '9999-12-31 00:00:00') AS valid_to, value
         | FROM v),
         |c AS (SELECT event_id, user_id,
         |    STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ets
         |  FROM events WHERE event_type = 'click')
         |SELECT c.event_id, c.user_id, c.ets, h.version,
         |  h.value AS purchase_value
         |FROM c JOIN h ON c.user_id = h.user_id
         |  AND c.ets >= h.valid_from AND c.ets < h.valid_to
         |ORDER BY event_id""".stripMargin.replace("\n", " ")),
    "x131_trend_slope" ->
      ("""WITH m AS (SELECT l_returnflag,
         |  CAST(CAST(l_shipdate AS DATE) - DATE '1992-01-01' AS DECIMAL(18,4)) AS x,
         |  CAST(l_extendedprice AS DECIMAL(18,4)) AS y FROM lineitem
         | WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL),
         |a AS (SELECT l_returnflag, COUNT(*) AS n,
         |  SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx, SUM(x*y) AS sxy
         | FROM m GROUP BY l_returnflag)
         |SELECT l_returnflag, n,
         | CASE WHEN n * sxx - sx * sx > 0 THEN
         |  ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
         |    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
         |   / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
         |    - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 6) END AS slope,
         | CASE WHEN n * sxx - sx * sx > 0 THEN
         |  ROUND((CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
         |    - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
         |   / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
         |    - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
         |   * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) END AS intercept
         |FROM a ORDER BY l_returnflag""".stripMargin.replace("\n", " ")),
    "x132_file_skipping_index" ->
      ("""SELECT event_type, COUNT(*) AS n,
         | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM events
         |WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
         |  AND TIMESTAMP '2024-01-15 00:00:00'
         |GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),
    "x133_budgeted_selection" ->
      (s"""WITH $qualityCtes,
         |d AS (SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         |  CAST(FLOOR(score * 100) AS BIGINT) * 1000 // CAST(n_tok AS BIGINT)
         |    AS density
         | FROM qscore),
         |o AS (SELECT doc_id, n_tok, density,
         |  CAST(SUM(n_tok) OVER (ORDER BY density DESC, doc_id) AS BIGINT)
         |    AS cum_tokens
         | FROM d)
         |SELECT doc_id, n_tok, density, cum_tokens FROM o
         |WHERE cum_tokens <= 10000 ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")),
    "x134_multitouch_attribution" ->
      ("""WITH pur AS (SELECT event_id AS conv_id, user_id AS cu, ts AS cts
         |  FROM events WHERE event_type = 'purchase'),
         |t AS (SELECT p.conv_id, e.event_id, e.event_type, e.ts
         |  FROM pur p LEFT JOIN events e ON e.user_id = p.cu
         |   AND e.ts >= p.cts - INTERVAL 7 DAY AND e.ts < p.cts
         |   AND e.event_type <> 'purchase'),
         |w AS (SELECT conv_id, event_id,
         |  COALESCE(event_type, '(unattributed)') AS touch_type,
         |  COUNT(event_id) OVER (PARTITION BY conv_id) AS nt,
         |  ROW_NUMBER() OVER (PARTITION BY conv_id
         |    ORDER BY ts DESC, event_id DESC) AS rd
         | FROM t)
         |SELECT touch_type, CAST(COUNT(event_id) AS BIGINT) AS n_touches,
         | CAST(SUM(CASE WHEN event_id IS NULL THEN 10000
         |   ELSE 10000 // nt + CASE WHEN rd = 1 THEN 10000 % nt ELSE 0 END END)
         |   AS BIGINT) AS bps_total
         |FROM w GROUP BY touch_type ORDER BY touch_type"""
        .stripMargin.replace("\n", " ")),
    "x135_negative_sampling" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
         |an AS (SELECT doc_id AS anchor FROM documents WHERE doc_id % 17 = 0),
         |dr AS (SELECT anchor, CAST(s.slot AS BIGINT) AS slot,
         |  CAST(('0x' || substr(md5(CAST(anchor AS VARCHAR) || ':' ||
         |    CAST(s.slot AS VARCHAR)), 1, 15)) AS BIGINT) % n_docs AS neg_id
         | FROM an, (VALUES (0), (1), (2)) s(slot), nd),
         |f AS (SELECT * FROM dr WHERE neg_id <> anchor)
         |SELECT anchor, slot, neg_id FROM f
         |WHERE NOT EXISTS (SELECT 1 FROM jpairs j
         |  WHERE (j.d1 = f.anchor AND j.d2 = f.neg_id)
         |     OR (j.d2 = f.anchor AND j.d1 = f.neg_id))
         |ORDER BY anchor, slot""".stripMargin.replace("\n", " ")),
    "x136_percentile_calibration" ->
      (s"""WITH $qualityCtes,
         |q AS (SELECT doc_id, source, CAST(FLOOR(score * 100) AS BIGINT)
         |    AS q_centi FROM qscore),
         |r AS (SELECT doc_id, source, q_centi,
         |  CAST(RANK() OVER (PARTITION BY source ORDER BY q_centi) AS BIGINT) AS rk,
         |  COUNT(*) OVER (PARTITION BY source) AS n FROM q)
         |SELECT doc_id, source, q_centi,
         | CASE WHEN n > 1 THEN (rk - 1) * 10000 // (n - 1)
         |  ELSE CAST(0 AS BIGINT) END AS pct_bps
         |FROM r ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x137_session_funnel" ->
      (s"""WITH $nullUserCte,
         |w1 AS (SELECT user_id, CAST(ts AS DATE) AS day, ts, event_type,
         |  MIN(CASE WHEN event_type = 'signup' THEN ts END)
         |   OVER (PARTITION BY user_id, CAST(ts AS DATE) ORDER BY ts) AS sig_t
         | FROM ne),
         |w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND sig_t < ts THEN ts END)
         |   OVER (PARTITION BY user_id, day ORDER BY ts) AS mid_t FROM w1),
         |u AS (SELECT user_id, day,
         |  MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
         |  MIN(CASE WHEN event_type = 'click' AND sig_t < ts THEN ts END) AS t2,
         |  MIN(CASE WHEN event_type = 'purchase' AND mid_t < ts THEN ts END) AS t3
         | FROM w2 GROUP BY user_id, day)
         |SELECT COUNT(t1) AS n_stage1, COUNT(t2) AS n_stage2,
         | COUNT(t3) AS n_stage3 FROM u""".stripMargin.replace("\n", " ")),
    "x138_interarrival_percentiles" ->
      ("""WITH e AS (SELECT event_type, event_id, ts,
         |  CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events
         |  WHERE ts IS NOT NULL),
         |g AS (SELECT event_type,
         |  es - LAG(es) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_s
         | FROM e),
         |f AS (SELECT event_type, gap_s FROM g
         |  WHERE gap_s IS NOT NULL),
         |r AS (SELECT event_type, gap_s,
         |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap_s) AS rk,
         |  COUNT(*) OVER (PARTITION BY event_type) AS n FROM f)
         |SELECT event_type, CAST(p.p_pct AS INT) AS p_pct,
         |  CAST(n AS BIGINT) AS n, gap_s AS pctl_gap_s
         |FROM r, (VALUES (50), (90), (99)) p(p_pct)
         |WHERE rk = (p.p_pct * n + 99) // 100
         |ORDER BY event_type, p_pct""".stripMargin.replace("\n", " ")),
    "x139_weighted_median" ->
      ("""WITH d AS (SELECT source, n_chars,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents
         | WHERE n_chars IS NOT NULL AND text IS NOT NULL),
         |gv AS (SELECT source, n_chars, CAST(SUM(n_tok) AS BIGINT) AS w
         |  FROM d GROUP BY source, n_chars),
         |c AS (SELECT source, n_chars,
         |  CAST(SUM(w) OVER (PARTITION BY source ORDER BY n_chars) AS BIGINT) AS cw,
         |  CAST(SUM(w) OVER (PARTITION BY source) AS BIGINT) AS tw
         | FROM gv)
         |SELECT source, MIN(n_chars) AS weighted_median,
         |  CAST(MAX(tw) AS BIGINT) AS total_weight
         |FROM c WHERE cw * 2 >= tw GROUP BY source ORDER BY source"""
        .stripMargin.replace("\n", " ")),
    "x140_group_mode" ->
      ("""WITH c AS (SELECT source, lang, COUNT(*) AS n
         |  FROM documents WHERE lang IS NOT NULL GROUP BY source, lang),
         |r AS (SELECT source, lang, n, ROW_NUMBER() OVER
         |  (PARTITION BY source ORDER BY n DESC, lang) AS rk FROM c)
         |SELECT source, lang AS mode_value, CAST(n AS BIGINT) AS n
         |FROM r WHERE rk = 1 ORDER BY source""".stripMargin.replace("\n", " ")),
    "x141_transition_matrix" ->
      ("""WITH s AS (SELECT user_id, event_type,
         |  LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |    AS prev_t FROM events WHERE ts IS NOT NULL),
         |c AS (SELECT prev_t AS prev_type, event_type AS next_type,
         |  CAST(COUNT(*) AS BIGINT) AS n FROM s WHERE prev_t IS NOT NULL
         | GROUP BY 1, 2),
         |t AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS tot
         |  FROM c GROUP BY 1)
         |SELECT c.prev_type, c.next_type, c.n, c.n * 1000000 // t.tot AS p_ppm
         |FROM c JOIN t USING (prev_type)
         |ORDER BY prev_type, next_type""".stripMargin.replace("\n", " ")),
    "x142_trigram_search" ->
      ("""SELECT doc_id,
         | CAST((len(text) - len(replace(text, 'spark merge', '')))
         |   // len('spark merge') AS BIGINT) AS n_occ
         |FROM documents WHERE text LIKE '%spark merge%'
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x143_benford_audit" ->
      ("""WITH c AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT) AS amt FROM lineitem WHERE l_extendedprice IS NOT NULL),
         |d AS (SELECT CAST(substr(CAST(amt AS VARCHAR), 1, 1) AS INT) AS digit,
         |  CAST(COUNT(*) AS BIGINT) AS n FROM c WHERE amt > 0 GROUP BY 1),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM d),
         |e AS (SELECT * FROM (VALUES (1, 301029), (2, 176091), (3, 124938),
         |  (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152),
         |  (9, 45757)) v(digit, exp_ppm))
         |SELECT e.digit, CAST(COALESCE(d.n, 0) AS BIGINT) AS n,
         | CAST(COALESCE(d.n * 1000000 // t.tot, 0) AS BIGINT) AS obs_ppm,
         | CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
         | CAST(COALESCE(d.n * 1000000 // t.tot, 0) - e.exp_ppm AS BIGINT)
         |   AS dev_ppm
         |FROM e LEFT JOIN d USING (digit), t
         |ORDER BY digit""".stripMargin.replace("\n", " ")),
    "x144_temporal_split" ->
      ("""WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
         |  WHERE ts IS NOT NULL),
         |rk AS (SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS r,
         |  COUNT(*) OVER () AS n FROM days),
         |cut AS (SELECT day AS c FROM rk WHERE r = (80 * n + 99) // 100),
         |tag AS (SELECT CASE WHEN CAST(ts AS DATE) <= (SELECT c FROM cut)
         |    THEN 'train' ELSE 'test' END AS split, user_id
         |  FROM events WHERE ts IS NOT NULL),
         |ps AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         | FROM tag GROUP BY 1),
         |ov AS (SELECT CAST(COALESCE(SUM(CASE WHEN ns = 2 THEN 1 ELSE 0 END),
         |    0) AS BIGINT) AS n_shared_users
         |  FROM (SELECT user_id, COUNT(DISTINCT split) AS ns FROM tag
         |    WHERE user_id IS NOT NULL GROUP BY 1))
         |SELECT ps.split, ps.n_events, ps.n_users, ov.n_shared_users
         |FROM ps, ov ORDER BY split""".stripMargin.replace("\n", " ")),
    "x145_winsorized_mean" ->
      ("""WITH c AS (SELECT source, CAST(n_chars AS BIGINT) AS v
         |  FROM documents WHERE n_chars IS NOT NULL),
         |r AS (SELECT source, v,
         |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY v) AS rk,
         |  COUNT(*) OVER (PARTITION BY source) AS n FROM c),
         |b AS (SELECT source,
         |  MIN(CASE WHEN rk = (5 * n + 99) // 100 THEN v END) AS lo,
         |  MAX(CASE WHEN rk = (95 * n + 99) // 100 THEN v END) AS hi
         | FROM r GROUP BY 1)
         |SELECT r.source, CAST(COUNT(*) AS BIGINT) AS n,
         | CAST(SUM(GREATEST(b.lo, LEAST(b.hi, r.v))) * 100 // COUNT(*)
         |   AS BIGINT) AS wins_mean_centi,
         | CAST(MIN(b.lo) AS BIGINT) AS lo_bound,
         | CAST(MIN(b.hi) AS BIGINT) AS hi_bound
         |FROM r JOIN b USING (source) GROUP BY r.source
         |ORDER BY r.source""".stripMargin.replace("\n", " ")),
    "x146_daily_streaks" ->
      ("""WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |r AS (SELECT user_id, day,
         |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rk FROM d),
         |i AS (SELECT user_id, day - CAST(rk AS INTEGER) AS anchor,
         |  CAST(COUNT(*) AS BIGINT) AS len FROM r GROUP BY 1, 2)
         |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_streaks,
         | CAST(MAX(len) AS BIGINT) AS longest_streak,
         | CAST(SUM(len) AS BIGINT) AS n_active_days
         |FROM i GROUP BY 1 ORDER BY user_id""".stripMargin.replace("\n", " ")),
    "x147_ab_experiment" ->
      ("""WITH u AS (SELECT user_id,
         |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
         |  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
         |    AS BIGINT) % 2 AS arm
         | FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         |a AS (SELECT
         |  CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |  CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |  CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
         |  CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
         | FROM u)
         |SELECT n_a, n_b, conv_a, conv_b,
         | CASE WHEN n_a > 0 THEN conv_a * 1000000 // n_a END AS rate_a_ppm,
         | CASE WHEN n_b > 0 THEN conv_b * 1000000 // n_b END AS rate_b_ppm,
         | CASE WHEN n_a > 0 AND n_b > 0 THEN
         |  conv_b * 1000000 // n_b - conv_a * 1000000 // n_a END AS diff_ppm
         |FROM a""".stripMargin.replace("\n", " ")),
    "x148_consistent_hash_migration" ->
      ("""WITH vn AS (SELECT gen, s,
         |  CAST(('0x' || substr(md5(s || ':' || v), 1, 15)) AS BIGINT) AS vh
         | FROM (SELECT 'old' AS gen, o.range AS s, i.range AS v
         |    FROM range(16) o, range(8) i
         |   UNION ALL SELECT 'new', o.range, i.range
         |    FROM range(17) o, range(8) i)),
         |k AS (SELECT doc_id, CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
         |    1, 15)) AS BIGINT) AS kh FROM documents),
         |s AS (SELECT k.doc_id, k.kh,
         |  MIN(CASE WHEN vn.gen = 'old' AND vn.vh >= k.kh THEN vn.vh END) AS t_old,
         |  MIN(CASE WHEN vn.gen = 'new' AND vn.vh >= k.kh THEN vn.vh END) AS t_new
         | FROM k LEFT JOIN vn ON vn.vh >= k.kh GROUP BY 1, 2),
         |w AS (SELECT MIN(CASE WHEN gen = 'old' THEN vh END) AS w_old,
         |  MIN(CASE WHEN gen = 'new' THEN vh END) AS w_new FROM vn),
         |r AS (SELECT s.kh, COALESCE(s.t_old, w.w_old) AS t_old,
         |  COALESCE(s.t_new, w.w_new) AS t_new FROM s, w),
         |j AS (SELECT r.kh, ro.s AS s_old, rn.s AS s_new FROM r
         |  JOIN vn ro ON ro.gen = 'old' AND ro.vh = r.t_old
         |  JOIN vn rn ON rn.gen = 'new' AND rn.vh = r.t_new),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(SUM(CASE WHEN kh % 16 <> kh % 17 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS moved_mod,
         |  CAST(SUM(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END) AS BIGINT)
         |    AS moved_ring FROM j)
         |SELECT n_keys, moved_mod, moved_ring,
         | moved_mod * 1000000 // n_keys AS mod_ppm,
         | moved_ring * 1000000 // n_keys AS ring_ppm
         |FROM m""".stripMargin.replace("\n", " ")),
    "x149_largest_remainder_alloc" ->
      ("""WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows
         |  FROM documents GROUP BY 1),
         |t AS (SELECT c.*, CAST(SUM(n_rows) OVER () AS BIGINT) AS N FROM c),
         |b AS (SELECT source, n_rows, CAST(n_rows * 1000 // N AS BIGINT) AS base,
         |  CAST(n_rows * 1000 % N AS BIGINT) AS rem FROM t),
         |s AS (SELECT b.*, CAST(1000 - SUM(base) OVER () AS BIGINT) AS slots,
         |  ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS pri FROM b)
         |SELECT source, n_rows,
         | CAST(base + CASE WHEN pri <= slots THEN 1 ELSE 0 END AS BIGINT) AS alloc
         |FROM s ORDER BY source""".stripMargin.replace("\n", " ")),
    "x150_bounded_contribution" ->
      ("""WITH r AS (SELECT event_type, user_id,
         |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
         | FROM events WHERE user_id IS NOT NULL)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_raw,
         | CAST(SUM(CASE WHEN rk <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounded,
         | CAST(COUNT(DISTINCT CASE WHEN rk > 5 THEN user_id END) AS BIGINT)
         |   AS n_users_clamped
         |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin.replace("\n", " ")),
    "x151_rolling_distinct_users" ->
      ("""WITH p AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |s AS (SELECT DISTINCT d AS day FROM p)
         |SELECT s.day, CAST(COUNT(DISTINCT p.user_id) AS BIGINT)
         |  AS n_active_users
         |FROM s JOIN p ON p.d > s.day - 7 AND p.d <= s.day
         |GROUP BY s.day ORDER BY s.day""".stripMargin.replace("\n", " ")),
    "x152_skew_partition_plan" ->
      ("""WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM documents GROUP BY 1),
         |r AS (SELECT source, n,
         |  ROW_NUMBER() OVER (ORDER BY n DESC, source) - 1 AS rk FROM c),
         |p AS (SELECT *, CASE WHEN (rk // 4) % 2 = 0 THEN rk % 4
         |  ELSE 4 - 1 - (rk % 4) END AS part FROM r),
         |l AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(SUM(n) AS BIGINT) AS load FROM p GROUP BY 1),
         |t AS (SELECT CAST(SUM(load) AS BIGINT) AS total FROM l)
         |SELECT CAST(l.part AS BIGINT) AS part, l.n_keys, l.load,
         | l.load * 4 * 1000000 // t.total - 1000000 AS imbalance_ppm
         |FROM l, t ORDER BY part""".stripMargin.replace("\n", " ")),
    "x153_federated_median_audit" ->
      ("""WITH c AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS v,
         |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
         |    AS BIGINT) % 8 AS shard
         | FROM documents WHERE n_chars IS NOT NULL),
         |g AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, doc_id) AS rk,
         |  COUNT(*) OVER () AS n FROM c),
         |tm AS (SELECT CAST(n AS BIGINT) AS n, v AS true_median FROM g
         |  WHERE rk = (n + 1) // 2),
         |sm AS (SELECT shard, v,
         |  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY v, doc_id) AS rk,
         |  COUNT(*) OVER (PARTITION BY shard) AS sn FROM c),
         |sv AS (SELECT shard, v FROM sm WHERE rk = (sn + 1) // 2),
         |fm AS (SELECT v AS federated_median FROM
         |  (SELECT v, ROW_NUMBER() OVER (ORDER BY v, shard) AS rk,
         |    COUNT(*) OVER () AS n FROM sv) WHERE rk = (n + 1) // 2)
         |SELECT tm.n, tm.true_median, fm.federated_median,
         | abs(fm.federated_median - tm.true_median) * 1000000
         |   // greatest(abs(tm.true_median), 1) AS err_ppm
         |FROM tm, fm""".stripMargin.replace("\n", " ")),
    "x154_k_anonymity_audit" ->
      ("""WITH c AS (SELECT lang, source, n_chars // 500 AS len_band,
         |  CAST(COUNT(*) AS BIGINT) AS sz
         | FROM documents GROUP BY 1, 2, 3)
         |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_classes,
         | CAST(SUM(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_classes_below_k,
         | CAST(SUM(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
         |   AS n_rows_at_risk,
         | CAST(MIN(sz) AS BIGINT) AS min_class_size
         |FROM c, (VALUES (2), (5), (10), (20)) v(k)
         |GROUP BY k ORDER BY k""".stripMargin.replace("\n", " ")),
    "x155_growth_accounting" ->
      ("""WITH uw AS (SELECT DISTINCT user_id,
         |  CAST(date_trunc('week', ts) AS DATE) AS wk
         | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |s AS (SELECT user_id, wk,
         |  LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
         |  LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt FROM uw),
         |st AS (SELECT wk AS week,
         |  CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_new,
         |  CAST(SUM(CASE WHEN prev = wk - 7 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_retained,
         |  CAST(SUM(CASE WHEN prev IS NOT NULL AND prev < wk - 7 THEN 1
         |    ELSE 0 END) AS BIGINT) AS n_resurrected
         | FROM s GROUP BY 1),
         |ch AS (SELECT wk + 7 AS week, CAST(COUNT(*) AS BIGINT) AS churned
         | FROM s WHERE nxt IS NULL OR nxt > wk + 7 GROUP BY 1)
         |SELECT st.week, st.n_new, st.n_retained, st.n_resurrected,
         | CAST(COALESCE(ch.churned, 0) AS BIGINT) AS n_churned
         |FROM st LEFT JOIN ch USING (week)
         |ORDER BY st.week""".stripMargin.replace("\n", " ")),
    "x156_systematic_pps_sample" ->
      ("""WITH c AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w
         |  FROM documents WHERE n_chars > 0),
         |s AS (SELECT doc_id, w,
         |  CAST(SUM(w) OVER (ORDER BY doc_id) AS BIGINT) AS cum_after FROM c),
         |t AS (SELECT CAST(SUM(w) AS BIGINT) // 50 AS stride FROM c)
         |SELECT doc_id, w AS weight, cum_after FROM s, t
         |WHERE stride > 0 AND (cum_after - w) // stride < cum_after // stride
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x157_column_drift" ->
      (s"""WITH $cdcMergeCtes,
         |old AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
         |j AS (SELECT o.c_custkey IS NOT NULL AS in_old,
         |  n.c_custkey IS NOT NULL AS in_new,
         |  o.c_acctbal AS oa, o.c_mktsegment AS om,
         |  n.c_acctbal AS na, n.c_mktsegment AS nm
         | FROM old o FULL OUTER JOIN news n ON o.c_custkey = n.c_custkey),
         |a AS (SELECT
         |  CAST(SUM(CASE WHEN in_old AND in_new THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_both,
         |  CAST(SUM(CASE WHEN NOT in_old THEN 1 ELSE 0 END) AS BIGINT) AS n_ins,
         |  CAST(SUM(CASE WHEN NOT in_new THEN 1 ELSE 0 END) AS BIGINT) AS n_del,
         |  CAST(SUM(CASE WHEN in_old AND in_new AND (na IS DISTINCT FROM oa)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS chg_a,
         |  CAST(SUM(CASE WHEN in_old AND in_new AND (nm IS DISTINCT FROM om)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS chg_m FROM j)
         |SELECT v.col_name, a.n_both AS n_compared,
         | CASE v.col_name WHEN 'c_acctbal' THEN a.chg_a ELSE a.chg_m END
         |   AS n_changed,
         | CAST(CASE WHEN a.n_both > 0 THEN
         |   (CASE v.col_name WHEN 'c_acctbal' THEN a.chg_a ELSE a.chg_m END)
         |     * 1000000 // a.n_both ELSE 0 END AS BIGINT) AS changed_ppm,
         | a.n_ins AS n_inserted_rows, a.n_del AS n_deleted_rows
         |FROM a, (VALUES ('c_acctbal'), ('c_mktsegment')) v(col_name)
         |ORDER BY col_name""".stripMargin.replace("\n", " ")),
    "x158_golden_record" ->
      (s"""WITH $clusterCtes, $qualityCtes,
         |base AS (SELECT q.doc_id, COALESCE(l.label, q.doc_id) AS cluster,
         |  CAST(len(d.text) AS BIGINT) AS len,
         |  CAST(FLOOR(q.score * 100) AS BIGINT) AS qc
         | FROM qscore q LEFT JOIN l3 l ON l.node = q.doc_id
         | JOIN documents d ON d.doc_id = q.doc_id WHERE d.text IS NOT NULL),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
         |  ORDER BY len DESC, doc_id) AS rn FROM base)
         |SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
         | CAST(MIN(doc_id) AS BIGINT) AS rep_doc,
         | CAST(MIN(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS longest_doc,
         | CAST(MAX(len) AS BIGINT) AS max_len,
         | CAST(MAX(qc) AS BIGINT) AS best_quality_centi,
         | CAST(SUM(len) AS BIGINT) AS total_chars
         |FROM r GROUP BY cluster ORDER BY cluster""".stripMargin.replace("\n", " ")),
    "x159_conversion_life_table" ->
      ("""WITH pu AS (SELECT user_id,
         |  MIN(CASE WHEN event_type = 'signup' THEN CAST(ts AS DATE) END) AS sd,
         |  MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END) AS cd
         | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
         |h AS (SELECT MAX(CAST(ts AS DATE)) AS ed FROM events),
         |g AS (SELECT CASE WHEN cd >= sd THEN cd - sd END AS conv_lag,
         |  ed - sd AS cens_lag FROM pu, h WHERE sd IS NOT NULL),
         |p AS (SELECT CAST(COALESCE(conv_lag, cens_lag) AS BIGINT) AS lag_days,
         |  CAST(SUM(CASE WHEN conv_lag IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_converted,
         |  CAST(SUM(CASE WHEN conv_lag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_censored
         | FROM g GROUP BY 1)
         |SELECT lag_days,
         | CAST(SUM(n_converted + n_censored) OVER (ORDER BY lag_days DESC)
         |   AS BIGINT) AS n_at_risk,
         | n_converted, n_censored
         |FROM p ORDER BY lag_days""".stripMargin.replace("\n", " ")),
    "x160_audit_hash_chain" ->
      ("""WITH e AS (SELECT CAST(ts AS DATE) AS part, ts, event_id,
         |  CAST(('0x' || substr(md5(concat_ws('|', event_id, user_id,
         |    event_type)), 1, 15)) AS BIGINT) AS h
         | FROM events),
         |r AS (SELECT part, h,
         |  ROW_NUMBER() OVER (PARTITION BY part ORDER BY ts, event_id) AS rk
         | FROM e)
         |SELECT part, CAST(COUNT(*) AS BIGINT) AS n_rows,
         | CAST(SUM(((rk % 2147483647) * (h % 2147483647)) % 2147483647)
         |   % 2147483647 AS BIGINT) AS chain_mod
         |FROM r GROUP BY part ORDER BY part""".stripMargin.replace("\n", " ")),
    "x161_weighted_quantiles" ->
      ("""WITH d AS (SELECT source, n_chars,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents
         | WHERE n_chars IS NOT NULL AND text IS NOT NULL),
         |gv AS (SELECT source, n_chars, CAST(SUM(n_tok) AS BIGINT) AS w
         |  FROM d GROUP BY source, n_chars),
         |c AS (SELECT source, n_chars,
         |  CAST(SUM(w) OVER (PARTITION BY source ORDER BY n_chars) AS BIGINT) AS cw,
         |  CAST(SUM(w) OVER (PARTITION BY source) AS BIGINT) AS tw FROM gv)
         |SELECT source, p.p_pct, MIN(n_chars) AS q_value,
         | CAST(MAX(tw) AS BIGINT) AS total_weight
         |FROM c, (VALUES (25), (50), (75)) p(p_pct)
         |WHERE cw * 100 >= p.p_pct * tw
         |GROUP BY source, p.p_pct ORDER BY source, p_pct"""
        .stripMargin.replace("\n", " ")),
    "x162_diff_in_diff" ->
      ("""WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
         |  WHERE ts IS NOT NULL),
         |rk AS (SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS r,
         |  COUNT(*) OVER () AS n FROM days),
         |cut AS (SELECT day AS c FROM rk WHERE r = (50 * n + 99) // 100),
         |up AS (SELECT user_id,
         |  CASE WHEN CAST(ts AS DATE) <= (SELECT c FROM cut) THEN 'pre'
         |    ELSE 'post' END AS period,
         |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
         | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
         |ua AS (SELECT *, CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
         |  1, 15)) AS BIGINT) % 2 AS arm FROM up),
         |a AS (SELECT
         |  CAST(SUM(CASE WHEN arm = 0 AND period = 'pre' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_a_pre,
         |  CAST(SUM(CASE WHEN arm = 0 AND period = 'pre' THEN conv ELSE 0 END)
         |    AS BIGINT) AS c_a_pre,
         |  CAST(SUM(CASE WHEN arm = 0 AND period = 'post' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_a_post,
         |  CAST(SUM(CASE WHEN arm = 0 AND period = 'post' THEN conv ELSE 0 END)
         |    AS BIGINT) AS c_a_post,
         |  CAST(SUM(CASE WHEN arm = 1 AND period = 'pre' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_b_pre,
         |  CAST(SUM(CASE WHEN arm = 1 AND period = 'pre' THEN conv ELSE 0 END)
         |    AS BIGINT) AS c_b_pre,
         |  CAST(SUM(CASE WHEN arm = 1 AND period = 'post' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_b_post,
         |  CAST(SUM(CASE WHEN arm = 1 AND period = 'post' THEN conv ELSE 0 END)
         |    AS BIGINT) AS c_b_post FROM ua)
         |SELECT n_a_pre, n_a_post, n_b_pre, n_b_post,
         | CASE WHEN n_a_pre > 0 THEN c_a_pre * 1000000 // n_a_pre END
         |   AS rate_a_pre_ppm,
         | CASE WHEN n_a_post > 0 THEN c_a_post * 1000000 // n_a_post END
         |   AS rate_a_post_ppm,
         | CASE WHEN n_b_pre > 0 THEN c_b_pre * 1000000 // n_b_pre END
         |   AS rate_b_pre_ppm,
         | CASE WHEN n_b_post > 0 THEN c_b_post * 1000000 // n_b_post END
         |   AS rate_b_post_ppm,
         | CASE WHEN n_a_pre > 0 AND n_a_post > 0 AND n_b_pre > 0
         |   AND n_b_post > 0 THEN
         |  (c_b_post * 1000000 // n_b_post - c_b_pre * 1000000 // n_b_pre)
         |  - (c_a_post * 1000000 // n_a_post - c_a_pre * 1000000 // n_a_pre) END
         |  AS did_ppm
         |FROM a""".stripMargin.replace("\n", " ")),
    "x163_degree_concentration" ->
      ("""WITH e AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
         |  's' || CAST(l_suppkey AS VARCHAR) AS dst
         | FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |ds AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d FROM e
         |  GROUP BY 1),
         |dd AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS d FROM e
         |  GROUP BY 1),
         |rs AS (SELECT d, ROW_NUMBER() OVER (ORDER BY d DESC, node) AS rk,
         |  COUNT(*) OVER () AS n FROM ds),
         |rd AS (SELECT d, ROW_NUMBER() OVER (ORDER BY d DESC, node) AS rk,
         |  COUNT(*) OVER () AS n FROM dd),
         |agg AS (
         | SELECT 'src' AS side, CAST(MAX(n) AS BIGINT) AS n_nodes,
         |  CAST(SUM(d) AS BIGINT) AS n_edges,
         |  CAST(SUM(CASE WHEN rk <= (n * 1 + 99) // 100 THEN d ELSE 0 END)
         |    AS BIGINT) AS topdeg,
         |  CAST(MAX(CASE WHEN rk = 1 THEN d END) AS BIGINT) AS max_degree
         | FROM rs
         | UNION ALL
         | SELECT 'dst', CAST(MAX(n) AS BIGINT), CAST(SUM(d) AS BIGINT),
         |  CAST(SUM(CASE WHEN rk <= (n * 1 + 99) // 100 THEN d ELSE 0 END)
         |    AS BIGINT),
         |  CAST(MAX(CASE WHEN rk = 1 THEN d END) AS BIGINT)
         | FROM rd)
         |SELECT side, n_nodes, n_edges,
         | topdeg * 1000000 // n_edges AS top_share_ppm, max_degree
         |FROM agg ORDER BY side""".stripMargin.replace("\n", " ")),
    "x164_quantile_parity" ->
      (s"""WITH $qualityCtes,
         |c AS (SELECT doc_id, source AS grp,
         |  CAST(FLOOR(score * 100) AS BIGINT) AS s FROM qscore),
         |g AS (SELECT grp, s,
         |  ROW_NUMBER() OVER (PARTITION BY grp ORDER BY s, doc_id) AS rk,
         |  COUNT(*) OVER (PARTITION BY grp) AS n FROM c),
         |pg AS (SELECT grp, CAST(n AS BIGINT) AS n_rows, s AS group_median
         |  FROM g WHERE rk = (n + 1) // 2),
         |gl AS (SELECT s AS global_median FROM
         |  (SELECT s, ROW_NUMBER() OVER (ORDER BY s, doc_id) AS rk,
         |    COUNT(*) OVER () AS n FROM c) WHERE rk = (n + 1) // 2)
         |SELECT pg.grp, pg.n_rows, pg.group_median, gl.global_median,
         | pg.group_median - gl.global_median AS median_gap
         |FROM pg, gl ORDER BY grp""".stripMargin.replace("\n", " ")),
    "x165_bounce_rate" ->
      ("""WITH s AS (SELECT user_id, CAST(ts AS DATE) AS day,
         |  CAST(COUNT(*) AS BIGINT) AS len
         | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2)
         |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_sessions,
         | CAST(SUM(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounced,
         | CAST(SUM(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
         |   // COUNT(*) AS bounce_ppm
         |FROM s GROUP BY day ORDER BY day""".stripMargin.replace("\n", " ")),
    "x166_median_impute" ->
      ("""WITH d AS (SELECT doc_id, source,
         |  CASE WHEN doc_id % 17 = 0 THEN NULL
         |    ELSE CAST(n_chars AS BIGINT) END AS v FROM documents),
         |o AS (SELECT source, v, doc_id FROM d WHERE v IS NOT NULL),
         |m AS (SELECT source, v AS med FROM
         |  (SELECT source, v, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY v, doc_id) AS rk,
         |    COUNT(*) OVER (PARTITION BY source) AS n FROM o)
         |  WHERE rk = (n + 1) // 2)
         |SELECT d.doc_id, d.source,
         | CAST(COALESCE(d.v, m.med) AS BIGINT) AS value_filled,
         | CAST(CASE WHEN d.v IS NULL AND m.med IS NOT NULL THEN 1 ELSE 0 END
         |   AS BIGINT) AS was_imputed
         |FROM d LEFT JOIN m USING (source)
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x167_label_noise_audit" ->
      (s"""WITH ${hyperplaneCtes("embeddings", Similarity.VoteBands, Similarity.VoteRowsPerBand)},
         |cand AS (SELECT DISTINCT ka.vec_id, kb.vec_id AS vb
         | FROM hpkeys ka JOIN hpkeys kb
         |  ON ka.band = kb.band AND ka.bkey = kb.bkey AND ka.vec_id <> kb.vec_id),
         |p AS (SELECT a.vec_id, a.label, b.vec_id AS vb, b.label AS lb,
         |  ${cos2Sql("a.embedding", "b.embedding")} AS sim
         | FROM cand c JOIN embeddings a ON a.vec_id = c.vec_id
         |  JOIN embeddings b ON b.vec_id = c.vb),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
         |  ORDER BY sim DESC, vb) AS rk FROM p),
         |t AS (SELECT vec_id, label,
         |  CAST(SUM(CASE WHEN lb = label THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
         |  CAST(SUM(CASE WHEN lb <> label THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_disagree
         | FROM r WHERE rk <= 5 GROUP BY 1, 2)
         |SELECT vec_id, label, n_agree, n_disagree FROM t
         |WHERE n_disagree * 2 > 5 ORDER BY vec_id""".stripMargin.replace("\n", " ")),
    "x168_top_journeys" ->
      ("""WITH r AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         |  ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
         |    ORDER BY ts, event_id) AS rk
         | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |j AS (SELECT user_id, day,
         |  string_agg(event_type, '>' ORDER BY rk) AS journey
         | FROM r WHERE rk <= 3 GROUP BY 1, 2)
         |SELECT journey, CAST(COUNT(*) AS BIGINT) AS n_sessions
         |FROM j GROUP BY 1
         |ORDER BY n_sessions DESC, journey LIMIT 10""".stripMargin.replace("\n", " ")),
    "x169_traffic_anomaly_days" ->
      ("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
         |  CAST(COUNT(*) AS BIGINT) AS n_events FROM events
         | WHERE ts IS NOT NULL GROUP BY 1),
         |w AS (SELECT day, n_events,
         |  CAST(SUM(n_events) OVER (ORDER BY day
         |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS tsum,
         |  COUNT(*) OVER (ORDER BY day
         |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS tn FROM d),
         |v AS (SELECT day, n_events, tsum,
         |  CAST(CASE WHEN tn = 7 THEN n_events * tn * 1000000 // tsum END
         |    AS BIGINT) AS ratio_ppm FROM w)
         |SELECT day, n_events, CAST(COALESCE(tsum, 0) AS BIGINT) AS trail_sum,
         | ratio_ppm,
         | CASE WHEN ratio_ppm > 1500000 THEN 'spike'
         |   WHEN ratio_ppm < 500000 THEN 'drop' END AS flag
         |FROM v ORDER BY day""".stripMargin.replace("\n", " ")),
    "x170_mixture_drift" ->
      ("""WITH g AS (SELECT doc_id % 8 AS snapshot, source,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         | FROM documents GROUP BY 1, 2),
         |w AS (SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY snapshot)
         |  AS BIGINT) AS wt FROM g),
         |s AS (SELECT snapshot, source, n_tokens,
         |  n_tokens * 1000000 // wt AS share_ppm FROM w)
         |SELECT snapshot, source, n_tokens, share_ppm,
         | share_ppm - LAG(share_ppm) OVER (PARTITION BY source
         |   ORDER BY snapshot) AS delta_ppm
         |FROM s ORDER BY snapshot, source""".stripMargin.replace("\n", " ")),
    "x171_sla_attainment" ->
      ("""WITH e AS (SELECT event_type, event_id, ts,
         |  CAST(FLOOR(epoch(ts)) AS BIGINT) AS es FROM events
         |  WHERE ts IS NOT NULL),
         |g AS (SELECT event_type,
         |  es - LAG(es) OVER (PARTITION BY event_type ORDER BY ts, event_id)
         |    AS gap FROM e)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
         | CAST(SUM(CASE WHEN gap <= 3600 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_within,
         | CAST(SUM(CASE WHEN gap <= 3600 THEN 1 ELSE 0 END) AS BIGINT)
         |   * 1000000 // COUNT(*) AS attain_ppm
         |FROM g WHERE gap IS NOT NULL GROUP BY 1
         |ORDER BY event_type""".stripMargin.replace("\n", " ")),
    "x172_seasonality_profile" ->
      ("""WITH c AS (SELECT CAST(isodow(ts) AS INT) AS iso_dow,
         |  CAST(hour(ts) AS INT) AS hod, CAST(COUNT(*) AS BIGINT) AS n_events
         | FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
         |t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS tot FROM c)
         |SELECT iso_dow, hod, n_events,
         | n_events * 1000000 // t.tot AS share_ppm
         |FROM c, t ORDER BY iso_dow, hod""".stripMargin.replace("\n", " ")),
    "x173_revenue_concentration" ->
      ("""WITH v AS (SELECT o_orderkey AS i,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         | FROM orders WHERE o_totalprice IS NOT NULL),
         |c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
         |o AS (SELECT v, CAST(SUM(cnt) OVER (ORDER BY v) - cnt AS BIGINT)
         |  AS bef, CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM c),
         |r AS (SELECT v.v, o.bef + ROW_NUMBER() OVER (PARTITION BY v.v
         |  ORDER BY v.i) AS rk, o.n FROM v JOIN o USING (v)),
         |gin AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
         |  CAST(SUM(v) AS BIGINT) AS sx,
         |  SUM(CAST(rk AS HUGEINT) * v) AS six FROM r),
         |gp AS (SELECT CAST(2 * six * 1000000 // (CAST(n AS HUGEINT) * sx)
         |  - (n + 1) * 1000000 // n AS BIGINT) AS gini_ppm FROM gin),
         |d AS (SELECT ((rk - 1) * 10 // n) + 1 AS decile,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(v) AS BIGINT)
         |    AS sum_cents FROM r GROUP BY 1),
         |dt AS (SELECT CAST(SUM(sum_cents) AS BIGINT) AS tot FROM d)
         |SELECT CAST(d.decile AS BIGINT) AS decile, d.n_rows, d.sum_cents,
         | d.sum_cents * 1000000 // dt.tot AS share_ppm, gp.gini_ppm
         |FROM d, dt, gp ORDER BY decile""".stripMargin.replace("\n", " ")),
    "x174_term_trends" ->
      ("""WITH w AS (SELECT doc_id % 8 AS snap,
         |  unnest(string_split(text, ' ')) AS term FROM documents
         | WHERE doc_id % 8 IN (6, 7)),
         |c AS (SELECT term,
         |  CAST(SUM(CASE WHEN snap = 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_prev,
         |  CAST(SUM(CASE WHEN snap = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
         | FROM w GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_prev) AS BIGINT) AS tp,
         |  CAST(SUM(n_cur) AS BIGINT) AS tc FROM c)
         |SELECT term, n_prev, n_cur,
         | CAST(CAST(n_cur AS HUGEINT) * t.tp * 1000000
         |   // (CAST(n_prev AS HUGEINT) * t.tc) AS BIGINT) AS rate_ratio_ppm
         |FROM c, t WHERE n_prev >= 5
         |ORDER BY rate_ratio_ppm DESC, term LIMIT 15""".stripMargin.replace("\n", " ")),
    "x175_burst_detection" ->
      ("""WITH e AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |b AS (SELECT user_id, COUNT(*) OVER (PARTITION BY user_id
         |  ORDER BY es RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS burst
         | FROM e)
         |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         | CAST(MAX(burst) AS BIGINT) AS max_burst
         |FROM b GROUP BY 1
         |ORDER BY max_burst DESC, n_events DESC, user_id LIMIT 50"""
        .stripMargin.replace("\n", " ")),
    "x176_join_cardinality_estimate" ->
      ("""WITH a AS (SELECT o_orderkey AS k, COUNT(*) AS na FROM orders
         |  WHERE o_orderkey IS NOT NULL GROUP BY 1),
         |b AS (SELECT l_orderkey AS k, COUNT(*) AS nb FROM lineitem
         |  WHERE l_orderkey IS NOT NULL GROUP BY 1),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys_matched,
         |  CAST(SUM(na * nb) AS BIGINT) AS est_rows,
         |  CAST(MAX(na * nb) AS BIGINT) AS max_key_pairs FROM a JOIN b USING (k))
         |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_keys_left,
         | (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_keys_right,
         | n_keys_matched, est_rows, max_key_pairs FROM m"""
        .stripMargin.replace("\n", " ")),
    "x177_transition_diversity" ->
      ("""WITH s AS (SELECT user_id, event_type,
         |  LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |    AS prev_t FROM events WHERE ts IS NOT NULL),
         |c AS (SELECT prev_t AS prev_type, event_type AS next_type,
         |  CAST(COUNT(*) AS BIGINT) AS n FROM s WHERE prev_t IS NOT NULL
         | GROUP BY 1, 2),
         |g AS (SELECT prev_type, CAST(COUNT(*) AS BIGINT) AS n_next_types,
         |  CAST(SUM(n) AS BIGINT) AS n_total,
         |  CAST(SUM(n * (n - 1)) AS BIGINT) AS coin FROM c GROUP BY 1)
         |SELECT prev_type, n_next_types, n_total,
         | CASE WHEN n_total > 1
         |   THEN coin * 1000000 // (n_total * (n_total - 1)) END AS simpson_ppm
         |FROM g ORDER BY prev_type""".stripMargin.replace("\n", " ")),
    "x178_positional_attribution" ->
      ("""WITH pur AS (SELECT event_id AS conv_id, user_id AS cu, ts AS cts
         |  FROM events WHERE event_type = 'purchase'),
         |t AS (SELECT p.conv_id, e.event_id, e.event_type, e.ts
         |  FROM pur p LEFT JOIN events e ON e.user_id = p.cu
         |   AND e.ts >= p.cts - INTERVAL 7 DAY AND e.ts < p.cts
         |   AND e.event_type <> 'purchase'),
         |w AS (SELECT conv_id, event_id,
         |  COALESCE(event_type, '(unattributed)') AS touch_type,
         |  COUNT(event_id) OVER (PARTITION BY conv_id) AS nt,
         |  ROW_NUMBER() OVER (PARTITION BY conv_id
         |    ORDER BY ts ASC, event_id ASC) AS rp
         | FROM t)
         |SELECT touch_type, CAST(COUNT(event_id) AS BIGINT) AS n_touches,
         | CAST(SUM(CASE WHEN event_id IS NULL THEN 10000
         |   WHEN nt = 1 THEN 10000 WHEN nt = 2 THEN 5000
         |   WHEN rp = 1 OR rp = nt THEN 4000
         |   ELSE 2000 // (nt - 2) +
         |     CASE WHEN rp = 2 THEN 2000 % (nt - 2) ELSE 0 END END)
         |   AS BIGINT) AS bps_total
         |FROM w GROUP BY touch_type ORDER BY touch_type"""
        .stripMargin.replace("\n", " ")),
    "x179_decile_lift" ->
      ("""WITH u AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS score,
         |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
         | FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         |r AS (SELECT user_id, score, conv,
         |  ROW_NUMBER() OVER (ORDER BY score, user_id) AS rk,
         |  COUNT(*) OVER () AS n FROM u),
         |d AS (SELECT (rk - 1) * 10 // n AS decile,
         |  CAST(COUNT(*) AS BIGINT) AS n_users,
         |  CAST(SUM(conv) AS BIGINT) AS n_conv FROM r GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS nn,
         |  CAST(SUM(n_conv) AS BIGINT) AS cc FROM d)
         |SELECT CAST(decile AS BIGINT) AS decile, n_users, n_conv,
         | CASE WHEN n_users > 0 THEN n_conv * 1000000 // n_users END
         |   AS conv_rate_ppm,
         | CASE WHEN cc > 0 THEN CAST(CAST(n_conv AS HUGEINT) * nn * 1000000
         |   // (CAST(n_users AS HUGEINT) * cc) AS BIGINT) END AS lift_ppm
         |FROM d, t ORDER BY decile""".stripMargin.replace("\n", " ")),
    "x180_audio_frame_features" ->
      ("""WITH p AS (SELECT doc_id, 64 + doc_id % 37 AS n FROM documents),
         |f AS (SELECT doc_id, n, unnest(range((n - 32) // 16 + 1)) AS fi
         |  FROM p WHERE n >= 32),
         |s AS (SELECT doc_id, n, fi, fi * 16 + unnest(range(32)) AS t FROM f),
         |v AS (SELECT doc_id, n, fi, t,
         |  (doc_id * 31 + 7 * t) % 65536 - 32768 AS v FROM s),
         |w AS (SELECT doc_id, n, fi, v,
         |  LEAD(v) OVER (PARTITION BY doc_id, fi ORDER BY t) AS nv FROM v),
         |fr AS (SELECT doc_id, n, fi, SUM(CAST(v AS BIGINT) * v) AS energy,
         |  SUM(CASE WHEN nv IS NOT NULL AND CAST(v AS BIGINT) * nv < 0
         |    THEN 1 ELSE 0 END) AS zc
         | FROM w GROUP BY 1, 2, 3)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
         | CAST(COUNT(*) AS BIGINT) AS n_frames,
         | CAST(MAX(energy) AS BIGINT) AS max_frame_energy,
         | CAST(SUM(zc) AS BIGINT) AS total_zero_crossings
         |FROM fr GROUP BY doc_id, n ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")),
    "x181_kcore_prune" ->
      ("""WITH e0 AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
         |  's' || CAST(l_suppkey AS VARCHAR) AS dst
         | FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |d1 AS (SELECT v, COUNT(*) AS d FROM
         |  (SELECT src AS v FROM e0 UNION ALL SELECT dst FROM e0) GROUP BY 1),
         |k1 AS (SELECT v FROM d1 WHERE d >= 3),
         |e1 AS (SELECT src, dst FROM e0 WHERE src IN (SELECT v FROM k1)
         |  AND dst IN (SELECT v FROM k1)),
         |d2 AS (SELECT v, COUNT(*) AS d FROM
         |  (SELECT src AS v FROM e1 UNION ALL SELECT dst FROM e1) GROUP BY 1),
         |k2 AS (SELECT v FROM d2 WHERE d >= 3),
         |e2 AS (SELECT src, dst FROM e1 WHERE src IN (SELECT v FROM k2)
         |  AND dst IN (SELECT v FROM k2)),
         |d3 AS (SELECT v, COUNT(*) AS d FROM
         |  (SELECT src AS v FROM e2 UNION ALL SELECT dst FROM e2) GROUP BY 1),
         |k3 AS (SELECT v FROM d3 WHERE d >= 3),
         |e3 AS (SELECT src, dst FROM e2 WHERE src IN (SELECT v FROM k3)
         |  AND dst IN (SELECT v FROM k3))
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
         | CAST(COUNT(DISTINCT src) AS BIGINT) AS n_src,
         | CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_dst,
         | CAST(CASE WHEN (SELECT COUNT(*) FROM e2) = (SELECT COUNT(*) FROM e3)
         |   THEN 1 ELSE 0 END AS INT) AS converged
         |FROM e3""".stripMargin.replace("\n", " ")),
    "x182_timed_funnel" ->
      (s"""WITH $nullUserCte,
         |w1 AS (SELECT user_id, ts, event_type,
         |  MIN(CASE WHEN event_type = 'signup' THEN ts END)
         |   OVER (PARTITION BY user_id ORDER BY ts) AS sig_t FROM ne),
         |w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND sig_t < ts
         |   AND ts <= sig_t + INTERVAL 86400 SECOND THEN ts END)
         |   OVER (PARTITION BY user_id ORDER BY ts) AS mid_t FROM w1),
         |u AS (SELECT user_id,
         |  MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
         |  MIN(CASE WHEN event_type = 'click' AND sig_t < ts
         |    AND ts <= sig_t + INTERVAL 86400 SECOND THEN ts END) AS t2,
         |  MIN(CASE WHEN event_type = 'purchase' AND mid_t < ts
         |    AND ts <= mid_t + INTERVAL 86400 SECOND THEN ts END) AS t3
         | FROM w2 GROUP BY user_id)
         |SELECT COUNT(t1) AS n_stage1, COUNT(t2) AS n_stage2,
         | COUNT(t3) AS n_stage3 FROM u""".stripMargin.replace("\n", " ")),
    "x183_ivf_cell_balance" ->
      (s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
         |asg AS (SELECT vec_id, cid FROM (
         |  SELECT e.vec_id, c.cid,
         |   ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |     ORDER BY ${cos2Sql("e.embedding", "c.cemb")} DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
         |occ AS (SELECT cid AS cell, CAST(COUNT(*) AS BIGINT) AS n_vecs
         |  FROM asg GROUP BY 1),
         |cells AS (SELECT c.cid AS cell, COALESCE(o.n_vecs, 0) AS n_vecs
         |  FROM cent c LEFT JOIN occ o ON o.cell = c.cid),
         |t AS (SELECT CAST(SUM(n_vecs) AS BIGINT) AS n FROM cells)
         |SELECT cell, CAST(n_vecs AS BIGINT) AS n_vecs,
         | CASE WHEN n > 0 THEN n_vecs * 1000000 // n END AS share_ppm,
         | CASE WHEN n > 0 THEN n_vecs * 16 * 1000000 // n - 1000000 END
         |   AS imbalance_ppm
         |FROM cells, t ORDER BY cell""".stripMargin.replace("\n", " ")),
    "x184_iqr_outlier_audit" ->
      ("""WITH c AS (SELECT o_orderpriority AS grp,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         | FROM orders WHERE o_totalprice IS NOT NULL),
         |gv AS (SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM c GROUP BY 1, 2),
         |cum AS (SELECT grp, v, CAST(SUM(cnt) OVER (PARTITION BY grp
         |   ORDER BY v) AS BIGINT) AS cm,
         |  CAST(SUM(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n FROM gv),
         |q AS (SELECT grp, MAX(n) AS n,
         |  MIN(CASE WHEN cm * 4 >= n THEN v END) AS q1,
         |  MIN(CASE WHEN cm * 4 >= n * 3 THEN v END) AS q3
         | FROM cum GROUP BY 1),
         |f AS (SELECT grp, n, q1, q3,
         |  q1 - (3 * (q3 - q1)) // 2 AS lo_fence,
         |  q3 + (3 * (q3 - q1)) // 2 AS hi_fence FROM q)
         |SELECT grp, n, q1, q3, lo_fence, hi_fence,
         | CAST(SUM(CASE WHEN c.v < lo_fence THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_low,
         | CAST(SUM(CASE WHEN c.v > hi_fence THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_high
         |FROM c JOIN f USING (grp)
         |GROUP BY grp, n, q1, q3, lo_fence, hi_fence ORDER BY grp"""
        .stripMargin.replace("\n", " ")),
    "x185_basket_pairs" ->
      ("""WITH i AS (SELECT DISTINCT l_orderkey AS b, p_brand AS it
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |w AS (SELECT b, it, COUNT(*) OVER (PARTITION BY b) AS wdt FROM i),
         |f AS (SELECT b, it FROM w WHERE wdt <= 100),
         |pr AS (SELECT a.it AS item1, c.it AS item2 FROM f a JOIN f c
         |  ON a.b = c.b AND a.it < c.it)
         |SELECT item1, item2, CAST(COUNT(*) AS BIGINT) AS support
         |FROM pr GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |ORDER BY support DESC, item1, item2 LIMIT 20"""
        .stripMargin.replace("\n", " ")),
    "x186_level_shift_scan" ->
      ("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
         |  CAST(COUNT(*) AS BIGINT) AS n FROM events
         | WHERE ts IS NOT NULL GROUP BY 1),
         |c AS (SELECT day, CAST(SUM(n) OVER (ORDER BY day) AS BIGINT) AS ck,
         |  CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rk FROM d),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
         |  CAST(COUNT(*) AS BIGINT) AS dd FROM d),
         |s AS (SELECT day AS split_day,
         |  ck * 1000000 // rk AS mean_before_ppm,
         |  (nn - ck) * 1000000 // (dd - rk) AS mean_after_ppm
         | FROM c, t WHERE rk < dd)
         |SELECT split_day, mean_before_ppm, mean_after_ppm,
         | ABS(mean_after_ppm - mean_before_ppm) AS shift_ppm
         |FROM s ORDER BY shift_ppm DESC, split_day LIMIT 1"""
        .stripMargin.replace("\n", " ")),
    "x187_nearest_event_match" ->
      ("""WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |a AS (SELECT *,
         |  LAST_VALUE(CASE WHEN event_type = 'purchase' THEN ts END
         |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pts,
         |  LAST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END
         |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pid,
         |  FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN ts END
         |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nts,
         |  FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END
         |    IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nid
         | FROM e),
         |p AS (SELECT event_id, user_id, pid, nid,
         |  CAST(FLOOR(epoch(ts)) AS BIGINT)
         |    - CAST(FLOOR(epoch(pts)) AS BIGINT) AS pgap,
         |  CAST(FLOOR(epoch(nts)) AS BIGINT)
         |    - CAST(FLOOR(epoch(ts)) AS BIGINT) AS ngap
         | FROM a WHERE event_type = 'error'),
         |q AS (SELECT event_id, user_id, pid, nid, pgap, ngap,
         |  pgap IS NOT NULL AND pgap <= 3600 AS cp,
         |  ngap IS NOT NULL AND ngap <= 3600 AS cn FROM p)
         |SELECT event_id, user_id,
         | CASE WHEN cp AND (NOT cn OR pgap <= ngap) THEN pid
         |      WHEN cn THEN nid END AS matched_id,
         | CASE WHEN cp AND (NOT cn OR pgap <= ngap) THEN 'before'
         |      WHEN cn THEN 'after' END AS direction,
         | CASE WHEN cp AND (NOT cn OR pgap <= ngap) THEN pgap
         |      WHEN cn THEN ngap END AS gap_s
         |FROM q ORDER BY event_id""".stripMargin.replace("\n", " ")),
    // Deliberately NOT the orientation algorithm: the ordered triple join
    // counts each triangle {a<b<c} once via its canonical edge pattern, so
    // a green row certifies the degree-ordered orientation independently.
    "x188_triangle_count" ->
      ("""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
         |  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'),
         |e AS (SELECT DISTINCT a.p AS u, b.p AS v
         |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
         |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
         |  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
         |  GROUP BY 1),
         |tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
         |  FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
         |            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
         |sz AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |  CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
         |ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
         |SELECT n_nodes, n_edges, n_wedges, n_triangles,
         | CASE WHEN n_wedges > 0
         |      THEN 3 * n_triangles * 1000000 // n_wedges
         |      ELSE 0 END AS clustering_ppm
         |FROM sz, ec, tri""".stripMargin.replace("\n", " ")),
    "x189_blocked_name_match" ->
      ("""WITH g AS (SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM part WHERE p_name IS NOT NULL GROUP BY 1),
         |v AS (SELECT name, n, regexp_extract(name, '(\S+)$', 1) AS blk FROM g)
         |SELECT a.name AS name_1, b.name AS name_2,
         | damerau_levenshtein(a.name, b.name) AS dist,
         | a.n AS n_1, b.n AS n_2, a.n * b.n AS pair_count
         |FROM v a JOIN v b ON a.blk = b.blk AND a.name < b.name
         |WHERE damerau_levenshtein(a.name, b.name) <= 2
         |ORDER BY name_1, name_2""".stripMargin.replace("\n", " ")),
    // Exact sums stay HUGEINT internally; every coefficient is assembled
    // from DOUBLE casts of those sums in the same expression shape the
    // Spark side uses (x115's determinism argument).
    "x190_autocorrelation" ->
      ("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
         |  CAST(COUNT(*) AS BIGINT) AS n FROM events
         | WHERE ts IS NOT NULL GROUP BY 1),
         |bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
         |s AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
         |  AS day FROM bo),
         |f AS (SELECT s.day, COALESCE(d.n, 0) AS x
         |  FROM s LEFT JOIN d ON s.day = d.day),
         |l AS (SELECT CAST(unnest(range(1, 8)) AS INT) AS lag),
         |pr AS (SELECT l.lag AS lag, a.x AS x, b2.x AS y
         |  FROM f a CROSS JOIN l JOIN f b2 ON b2.day = a.day + l.lag),
         |m AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
         |  SUM(y * y) AS syy, SUM(x * y) AS sxy
         | FROM pr GROUP BY 1)
         |SELECT lag, n_pairs,
         | CASE WHEN n_pairs * sxx - sx * sx > 0
         |       AND n_pairs * syy - sy * sy > 0
         |  THEN ROUND((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
         |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |   / SQRT((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
         |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |    * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
         |     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         | END AS acf
         |FROM m ORDER BY lag""".stripMargin.replace("\n", " ")),
    "x191_bpe_merge_candidates" ->
      ("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
         |  FROM documents WHERE text IS NOT NULL),
         |p AS (SELECT w, unnest(range(1, length(w))) AS i
         |  FROM w WHERE length(w) >= 2)
         |SELECT substring(w, CAST(i AS INT), 2) AS pair,
         | CAST(COUNT(*) AS BIGINT) AS n
         |FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT 20"""
        .stripMargin.replace("\n", " ")),
    "x192_business_day_lag" ->
      ("""WITH f AS (SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS s,
         |  CAST(l_shipdate AS DATE) AS e
         | FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         | WHERE o_orderdate IS NOT NULL AND l_shipdate IS NOT NULL
         |  AND CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)),
         |bo AS (SELECT MIN(s) AS d0, MAX(e) AS d1 FROM f),
         |dim AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
         |  AS DATE) AS day FROM bo),
         |bd AS (SELECT day, SUM(CASE WHEN isodow(day) <= 5 THEN 1 ELSE 0 END)
         |  OVER (ORDER BY day) AS bdx FROM dim),
         |g AS (SELECT o_orderpriority, be.bdx - bs.bdx AS lag
         | FROM f JOIN bd bs ON f.s = bs.day JOIN bd be ON f.e = be.day)
         |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
         | CAST(MIN(lag) AS BIGINT) AS min_bd, CAST(MAX(lag) AS BIGINT) AS max_bd,
         | CAST(SUM(lag) * 1000000 // COUNT(*) AS BIGINT) AS mean_bd_ppm
         |FROM g GROUP BY 1 ORDER BY o_orderpriority"""
        .stripMargin.replace("\n", " ")),
    "x193_rank_agreement" ->
      ("""WITH h1 AS (SELECT p_brand AS item,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE l_shipdate < TIMESTAMP '1998-07-01' GROUP BY 1),
         |h2 AS (SELECT p_brand AS item,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE l_shipdate >= TIMESTAMP '1998-07-01' GROUP BY 1),
         |r1 AS (SELECT item, CAST(ROW_NUMBER() OVER (ORDER BY s DESC, item)
         |  AS BIGINT) AS ra FROM h1),
         |r2 AS (SELECT item, CAST(ROW_NUMBER() OVER (ORDER BY s DESC, item)
         |  AS BIGINT) AS rb FROM h2),
         |j AS (SELECT r1.item, ra, rb FROM r1 JOIN r2 USING (item)),
         |p AS (SELECT (x.ra - y.ra) * (x.rb - y.rb) AS pr
         | FROM j x JOIN j y ON x.item < y.item),
         |pc AS (SELECT CAST(SUM(CASE WHEN pr > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |  AS concordant,
         | CAST(SUM(CASE WHEN pr < 0 THEN 1 ELSE 0 END) AS BIGINT) AS discordant
         | FROM p),
         |tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_common,
         | CAST(SUM(CASE WHEN ra <= 10 AND rb <= 10 THEN 1 ELSE 0 END) AS BIGINT)
         |  AS overlap_top10 FROM j)
         |SELECT n_common, COALESCE(concordant, 0) AS concordant,
         | COALESCE(discordant, 0) AS discordant,
         | COALESCE(overlap_top10, 0) AS overlap_top10
         |FROM tc, pc""".stripMargin.replace("\n", " ")),
    "x194_khop_frontier" ->
      ("""WITH e0 AS (SELECT DISTINCT 'c' || o_custkey AS src,
         |  's' || l_suppkey AS dst
         | FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |und AS (SELECT src, dst FROM e0
         |  UNION SELECT dst AS src, src AS dst FROM e0),
         |deg AS (SELECT src AS v, COUNT(*) AS d FROM und GROUP BY 1),
         |sd AS (SELECT v FROM deg ORDER BY d DESC, v LIMIT 1),
         |f1 AS (SELECT DISTINCT u.dst AS v FROM und u JOIN sd ON u.src = sd.v
         | WHERE u.dst NOT IN (SELECT v FROM sd)),
         |v1 AS (SELECT v FROM sd UNION SELECT v FROM f1),
         |f2 AS (SELECT DISTINCT u.dst AS v FROM und u JOIN f1 ON u.src = f1.v
         | WHERE u.dst NOT IN (SELECT v FROM v1)),
         |v2 AS (SELECT v FROM v1 UNION SELECT v FROM f2),
         |f3 AS (SELECT DISTINCT u.dst AS v FROM und u JOIN f2 ON u.src = f2.v
         | WHERE u.dst NOT IN (SELECT v FROM v2))
         |SELECT CAST(0 AS INT) AS hop,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sd) AS frontier_size
         |UNION ALL SELECT 1, (SELECT CAST(COUNT(*) AS BIGINT) FROM f1)
         |UNION ALL SELECT 2, (SELECT CAST(COUNT(*) AS BIGINT) FROM f2)
         |UNION ALL SELECT 3, (SELECT CAST(COUNT(*) AS BIGINT) FROM f3)
         |ORDER BY hop""".stripMargin.replace("\n", " ")),
    "x195_forget_impact" ->
      ("""WITH fk AS (SELECT c_custkey AS k FROM customer
         |  WHERE c_custkey % 101 = 7)
         |SELECT 'customer' AS entity, CAST(COUNT(*) AS BIGINT) AS affected_rows
         | FROM customer WHERE c_custkey IN (SELECT k FROM fk)
         |UNION ALL SELECT 'events', CAST(COUNT(*) AS BIGINT)
         | FROM events WHERE user_id IN (SELECT k FROM fk)
         |UNION ALL SELECT 'lineitem', CAST(COUNT(*) AS BIGINT)
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | WHERE o_custkey IN (SELECT k FROM fk)
         |UNION ALL SELECT 'orders', CAST(COUNT(*) AS BIGINT)
         | FROM orders WHERE o_custkey IN (SELECT k FROM fk)
         |ORDER BY entity""".stripMargin.replace("\n", " ")),
    "x196_doc_keywords" ->
      ("""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents WHERE text IS NOT NULL),
         |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM t WHERE length(term) > 0 GROUP BY 1, 2),
         |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |s AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |  tf.tf * 1000000 // df.df AS score FROM tf JOIN df USING (term)),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |  ORDER BY score DESC, term) AS rk FROM s)
         |SELECT doc_id, term AS keyword, tf, df, score
         |FROM r WHERE rk = 1 ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")),
    "x197_dedup_rate_by_source" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |nd AS (SELECT DISTINCT doc_id FROM
         |  (SELECT d1 AS doc_id FROM jpairs UNION ALL SELECT d2 FROM jpairs)),
         |ex AS (SELECT doc_id, source,
         |  CASE WHEN COUNT(*) OVER (PARTITION BY text) > 1 THEN 1 ELSE 0 END AS e
         | FROM documents)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(e) AS BIGINT) AS n_exact_dup,
         | CAST(SUM(CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_near_dup,
         | CAST(SUM(e) * 1000000 // COUNT(*) AS BIGINT) AS exact_ppm,
         | CAST(SUM(CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |  * 1000000 // COUNT(*) AS BIGINT) AS near_ppm
         |FROM ex LEFT JOIN nd ON ex.doc_id = nd.doc_id
         |GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")),
    "x198_geometric_smoothing" ->
      ("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
         |  CAST(COUNT(*) AS BIGINT) AS x FROM events
         | WHERE ts IS NOT NULL GROUP BY 1),
         |bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
         |s AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
         |  AS DATE) AS day FROM bo),
         |f AS (SELECT s.day, COALESCE(d.x, 0) AS x
         |  FROM s LEFT JOIN d ON s.day = d.day),
         |o AS (SELECT CAST(unnest(range(0, 14)) AS INT) AS k),
         |c AS (SELECT f.day + o.k AS day,
         |  f.x * (CAST(1 AS BIGINT) << (13 - o.k)) AS contrib,
         |  CASE WHEN o.k = 0 THEN f.x END AS raw
         | FROM f CROSS JOIN o),
         |g AS (SELECT day, MAX(raw) AS n_events, SUM(contrib) AS sm
         | FROM c GROUP BY 1)
         |SELECT g.day, CAST(n_events AS BIGINT) AS n_events,
         | CAST(sm * 1000000 // 16383 AS BIGINT) AS smooth_ppm
         |FROM g, bo WHERE g.day <= bo.d1 ORDER BY g.day"""
        .stripMargin.replace("\n", " ")),
    "x199_peak_concurrency" ->
      ("""WITH c AS (SELECT ts, event_id FROM events
         |  WHERE ts IS NOT NULL AND event_id IS NOT NULL),
         |b AS (SELECT ts AS t, CAST(1 AS BIGINT) AS delta, event_id AS bid FROM c
         | UNION ALL
         | SELECT ts + INTERVAL 300 SECOND, CAST(-1 AS BIGINT), event_id FROM c),
         |r AS (SELECT t, delta, SUM(delta) OVER (ORDER BY t, delta, bid
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc FROM b)
         |SELECT CAST(t AS DATE) AS day, CAST(MAX(conc) AS BIGINT)
         |  AS peak_concurrent
         |FROM r WHERE delta = 1 GROUP BY 1 ORDER BY day"""
        .stripMargin.replace("\n", " ")),
    "x200_rrf_fusion" ->
      (s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |l1 AS (SELECT vec_id, ROUND($cosSql, 6) AS sim FROM embeddings, q
         | ORDER BY sim DESC, vec_id LIMIT 20),
         |l2 AS (SELECT vec_id, ROUND($cosSql, 6) AS sim FROM embeddings, q
         | WHERE ${signBucketSql("embedding")} = ${signBucketSql("qe")}
         | ORDER BY sim DESC, vec_id LIMIT 10),
         |r1 AS (SELECT vec_id, CAST(ROW_NUMBER() OVER
         |  (ORDER BY sim DESC, vec_id) AS BIGINT) AS rk FROM l1),
         |r2 AS (SELECT vec_id, CAST(ROW_NUMBER() OVER
         |  (ORDER BY sim DESC, vec_id) AS BIGINT) AS rk FROM l2),
         |u AS (SELECT vec_id, 1000000000 // (60 + rk) AS c FROM r1
         | UNION ALL SELECT vec_id, 1000000000 // (60 + rk) FROM r2)
         |SELECT vec_id, CAST(SUM(c) AS BIGINT) AS rrf_score,
         | CAST(COUNT(*) AS BIGINT) AS n_lists
         |FROM u GROUP BY 1 ORDER BY rrf_score DESC, vec_id"""
        .stripMargin.replace("\n", " ")),
    "x201_also_bought" ->
      ("""WITH it AS (SELECT DISTINCT l_orderkey AS b, p_brand AS i
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |an AS (SELECT i AS anchor, CAST(COUNT(*) AS BIGINT) AS anchor_baskets
         |  FROM it GROUP BY 1 ORDER BY anchor_baskets DESC, anchor LIMIT 5),
         |sup AS (SELECT a.i AS anchor, o.i AS rec,
         |  CAST(COUNT(*) AS BIGINT) AS support
         | FROM it a JOIN it o ON a.b = o.b AND a.i <> o.i
         | WHERE a.i IN (SELECT anchor FROM an) GROUP BY 1, 2),
         |r AS (SELECT anchor, rec, support, CAST(ROW_NUMBER() OVER
         |  (PARTITION BY anchor ORDER BY support DESC, rec) AS BIGINT) AS rank
         | FROM sup)
         |SELECT r.anchor, an.anchor_baskets, r.rank, r.rec, r.support
         |FROM r JOIN an ON an.anchor = r.anchor
         |WHERE r.rank <= 3 ORDER BY r.anchor, r.rank"""
        .stripMargin.replace("\n", " ")),
    "x202_completeness_grid" ->
      ("""WITH ob AS (SELECT DISTINCT date_trunc('hour', ts) AS slot,
         |  event_type AS dim FROM events
         | WHERE ts IS NOT NULL AND event_type IS NOT NULL),
         |bo AS (SELECT MIN(slot) AS t0, MAX(slot) AS t1 FROM ob),
         |sp AS (SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR))
         |  AS slot FROM bo),
         |dm AS (SELECT DISTINCT dim FROM ob),
         |grid AS (SELECT sp.slot, dm.dim FROM sp CROSS JOIN dm),
         |mi AS (SELECT g.dim, CAST(COUNT(*) AS BIGINT) AS n_missing
         |  FROM grid g LEFT JOIN ob ON ob.slot = g.slot AND ob.dim = g.dim
         |  WHERE ob.dim IS NULL GROUP BY 1),
         |ex AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_expected
         |  FROM grid GROUP BY 1)
         |SELECT ex.dim, ex.n_expected, COALESCE(mi.n_missing, 0) AS n_missing,
         | (ex.n_expected - COALESCE(mi.n_missing, 0)) * 1000000 // ex.n_expected
         |  AS coverage_ppm
         |FROM ex LEFT JOIN mi ON mi.dim = ex.dim ORDER BY ex.dim"""
        .stripMargin.replace("\n", " ")),
    "x203_log2_histogram" ->
      ("""WITH v AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS v
         |  FROM events),
         |b AS (SELECT v, CAST(length(bin(v)) - 1 AS INT) AS bucket
         |  FROM v WHERE v >= 1)
         |SELECT bucket, CAST(1 AS BIGINT) << bucket AS bucket_lo,
         | (CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS bucket_hi,
         | CAST(COUNT(*) AS BIGINT) AS n,
         | CAST(MIN(v) AS BIGINT) AS min_v, CAST(MAX(v) AS BIGINT) AS max_v
         |FROM b GROUP BY 1 ORDER BY bucket"""
        .stripMargin.replace("\n", " ")),
    "x204_cusum_drift" ->
      ("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
         |  CAST(COUNT(*) AS BIGINT) AS x FROM events
         | WHERE ts IS NOT NULL GROUP BY 1),
         |t AS (SELECT CAST(SUM(x) AS BIGINT) AS tot,
         |  CAST(COUNT(*) AS BIGINT) AS nd FROM d),
         |y AS (SELECT day, x, tot * 1000000 // nd AS mean,
         |  x * 1000000 - tot * 1000000 // nd
         |   - (tot * 1000000 // nd) // 100 AS yv FROM d, t),
         |c AS (SELECT day, x, mean,
         |  CAST(SUM(yv) OVER (ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         | FROM y),
         |m AS (SELECT day, x, mean, cum,
         |  CAST(MIN(cum) OVER (ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rmin
         | FROM c)
         |SELECT day, x AS n_events,
         | cum - LEAST(0, rmin) AS s_pos_ppm,
         | CASE WHEN cum - LEAST(0, rmin) > mean // 10 THEN 1 ELSE 0 END AS alert
         |FROM m ORDER BY day""".stripMargin.replace("\n", " ")),
    "x205_revenue_waterfall" ->
      ("""WITH f AS (SELECT p_brand, CAST(l_quantity AS BIGINT) AS q,
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS rc,
         |  l_shipdate >= TIMESTAMP '1998-07-01' AS p2
         | FROM lineitem JOIN part ON l_partkey = p_partkey),
         |s1 AS (SELECT p_brand, CAST(SUM(q) AS BIGINT) AS q1,
         |  CAST(SUM(rc) AS BIGINT) AS rev1 FROM f WHERE NOT p2 GROUP BY 1),
         |s2 AS (SELECT p_brand, CAST(SUM(q) AS BIGINT) AS q2,
         |  CAST(SUM(rc) AS BIGINT) AS rev2 FROM f WHERE p2 GROUP BY 1),
         |j AS (SELECT COALESCE(s1.p_brand, s2.p_brand) AS p_brand,
         |  COALESCE(q1, 0) AS q1, COALESCE(q2, 0) AS q2,
         |  COALESCE(rev1, 0) AS rev1_cents, COALESCE(rev2, 0) AS rev2_cents
         | FROM s1 FULL JOIN s2 ON s1.p_brand = s2.p_brand),
         |v AS (SELECT *, rev2_cents - rev1_cents AS delta_cents,
         |  CASE WHEN q1 = 0 THEN 0
         |       WHEN q2 >= q1 THEN CAST((q2 - q1) * rev1_cents // q1 AS BIGINT)
         |       ELSE -CAST((q1 - q2) * rev1_cents // q1 AS BIGINT) END
         |   AS volume_cents FROM j)
         |SELECT p_brand, q1, q2, rev1_cents, rev2_cents, delta_cents,
         | volume_cents, delta_cents - volume_cents AS price_mix_cents
         |FROM v ORDER BY p_brand""".stripMargin.replace("\n", " ")),
    "x206_lateness_audit" ->
      ("""WITH e AS (SELECT event_id, ts,
         |  ts + (event_id % 7) * INTERVAL 90 SECOND AS at
         | FROM events WHERE ts IS NOT NULL AND event_id IS NOT NULL),
         |h AS (SELECT event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS s,
         |  MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER (ORDER BY at, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm
         | FROM e),
         |l AS (SELECT GREATEST(0, COALESCE(hwm - s, 0)) AS late FROM h),
         |b AS (SELECT CASE WHEN late <= 0 THEN -1
         |  ELSE CAST(length(bin(late)) - 1 AS INT) END AS bucket, late FROM l)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
         | CAST(MAX(late) AS BIGINT) AS max_lateness_s
         |FROM b GROUP BY 1 ORDER BY bucket"""
        .stripMargin.replace("\n", " ")),
    "x207_time_decay_attribution" ->
      ("""WITH pur AS (SELECT event_id AS conv_id, user_id AS cu, ts AS cts
         |  FROM events WHERE event_type = 'purchase'),
         |t AS (SELECT p.conv_id, p.cts, e.event_id, e.event_type, e.ts
         |  FROM pur p LEFT JOIN events e ON e.user_id = p.cu
         |   AND e.ts >= p.cts - INTERVAL 7 DAY AND e.ts < p.cts
         |   AND e.event_type <> 'purchase'),
         |w AS (SELECT conv_id, event_id,
         |  COALESCE(event_type, '(unattributed)') AS touch_type,
         |  CASE WHEN event_id IS NOT NULL THEN CAST(1000000 AS BIGINT) >> LEAST(
         |    date_diff('day', CAST(ts AS DATE), CAST(cts AS DATE)), 19) END AS wt,
         |  ROW_NUMBER() OVER (PARTITION BY conv_id
         |    ORDER BY ts DESC, event_id DESC) AS rd
         | FROM t),
         |w2 AS (SELECT *, CAST(SUM(wt) OVER (PARTITION BY conv_id) AS BIGINT)
         |  AS sw FROM w),
         |w3 AS (SELECT *, wt * 10000 // sw AS fl FROM w2),
         |w4 AS (SELECT *, CAST(SUM(fl) OVER (PARTITION BY conv_id) AS BIGINT)
         |  AS sfl FROM w3)
         |SELECT touch_type, CAST(COUNT(event_id) AS BIGINT) AS n_touches,
         | CAST(SUM(CASE WHEN event_id IS NULL THEN 10000
         |   ELSE fl + CASE WHEN rd = 1 THEN 10000 - sfl ELSE 0 END END)
         |   AS BIGINT) AS bps_total
         |FROM w4 GROUP BY touch_type ORDER BY touch_type"""
        .stripMargin.replace("\n", " ")),
    "x208_cross_correlation" ->
      ("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
         |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS a,
         |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS b
         | FROM events WHERE ts IS NOT NULL
         |  AND event_type IN ('click', 'purchase') GROUP BY 1),
         |bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
         |s AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
         |  AS DATE) AS day FROM bo),
         |f AS (SELECT s.day, COALESCE(d.a, 0) AS a, COALESCE(d.b, 0) AS b
         |  FROM s LEFT JOIN d ON s.day = d.day),
         |l AS (SELECT CAST(unnest(range(-7, 8)) AS INT) AS lag),
         |pr AS (SELECT l.lag AS lag, x.a AS xa, y.b AS yb
         |  FROM f x CROSS JOIN l JOIN f y ON y.day = x.day + l.lag),
         |m AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  SUM(xa) AS sx, SUM(yb) AS sy, SUM(xa * xa) AS sxx,
         |  SUM(yb * yb) AS syy, SUM(xa * yb) AS sxy
         | FROM pr GROUP BY 1)
         |SELECT lag, n_pairs,
         | CASE WHEN n_pairs * sxx - sx * sx > 0
         |       AND n_pairs * syy - sy * sy > 0
         |  THEN ROUND((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
         |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |   / SQRT((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
         |     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |    * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
         |     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         | END AS ccf
         |FROM m ORDER BY lag""".stripMargin.replace("\n", " ")),
    "x209_cell_suppression" ->
      ("""WITH c AS (SELECT n_name, c_mktsegment,
         |  CAST(COUNT(*) AS BIGINT) AS n
         | FROM customer JOIN nation ON c_nationkey = n_nationkey
         | GROUP BY 1, 2),
         |s AS (SELECT CASE WHEN n < 10 THEN '(suppressed)' ELSE n_name END
         |  AS n_name, c_mktsegment, n FROM c)
         |SELECT n_name, c_mktsegment, CAST(SUM(n) AS BIGINT) AS n
         |FROM s GROUP BY 1, 2 ORDER BY n_name, c_mktsegment"""
        .stripMargin.replace("\n", " ")),
    "x210_revenue_bridge" ->
      ("""WITH cm AS (SELECT o_custkey AS c,
         |  CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
         |    AS BIGINT) AS r
         | FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
         | GROUP BY 1, 2),
         |pv AS (SELECT c, CAST(m + INTERVAL 1 MONTH AS DATE) AS m, r AS rp
         |  FROM cm),
         |lm AS (SELECT MAX(m) AS lastm FROM cm),
         |j AS (SELECT COALESCE(cm.c, pv.c) AS c, COALESCE(cm.m, pv.m) AS m,
         |  cm.r, pv.rp
         | FROM cm FULL JOIN pv ON cm.c = pv.c AND cm.m = pv.m),
         |g AS (SELECT m AS month,
         |  CAST(SUM(CASE WHEN rp IS NULL THEN r ELSE 0 END) AS BIGINT)
         |    AS new_cents,
         |  CAST(SUM(CASE WHEN r IS NOT NULL AND rp IS NOT NULL AND r > rp
         |    THEN r - rp ELSE 0 END) AS BIGINT) AS expansion_cents,
         |  CAST(SUM(CASE WHEN r IS NOT NULL AND rp IS NOT NULL AND r < rp
         |    THEN r - rp ELSE 0 END) AS BIGINT) AS contraction_cents,
         |  CAST(SUM(CASE WHEN r IS NULL THEN -rp ELSE 0 END) AS BIGINT)
         |    AS churn_cents
         | FROM j, lm WHERE m <= lastm GROUP BY 1)
         |SELECT month, new_cents, expansion_cents, contraction_cents,
         | churn_cents,
         | new_cents + expansion_cents + contraction_cents + churn_cents
         |  AS net_change_cents
         |FROM g ORDER BY month""".stripMargin.replace("\n", " ")),
    "x211_backlog_curve" ->
      ("""WITH o AS (SELECT o_orderkey,
         |  MIN(CAST(o_orderdate AS DATE)) AS p,
         |  MAX(CAST(l_shipdate AS DATE)) AS s
         | FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         | WHERE o_orderdate IS NOT NULL AND l_shipdate IS NOT NULL
         | GROUP BY 1
         | HAVING MAX(CAST(l_shipdate AS DATE)) >= MIN(CAST(o_orderdate AS DATE))),
         |d AS (SELECT p AS day, CAST(1 AS BIGINT) AS dl FROM o
         | UNION ALL SELECT s + 1, CAST(-1 AS BIGINT) FROM o),
         |nd AS (SELECT day, CAST(SUM(dl) AS BIGINT) AS net FROM d GROUP BY 1),
         |bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM nd),
         |sp AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
         |  AS DATE) AS day FROM bo)
         |SELECT sp.day, CAST(SUM(COALESCE(nd.net, 0)) OVER (ORDER BY sp.day
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |  AS backlog
         |FROM sp LEFT JOIN nd ON sp.day = nd.day ORDER BY sp.day"""
        .stripMargin.replace("\n", " ")),
    "x212_rate_limit_audit" ->
      ("""WITH uh AS (SELECT user_id, date_trunc('hour', ts) AS hour,
         |  CAST(COUNT(*) AS BIGINT) AS n
         | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
         | GROUP BY 1, 2)
         |SELECT hour, CAST(COUNT(*) AS BIGINT) AS n_active_users,
         | CAST(SUM(CASE WHEN n > 2 THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_violators,
         | CAST(SUM(CASE WHEN n > 2 THEN n - 2 ELSE 0 END) AS BIGINT)
         |  AS excess_events,
         | CAST(MAX(n) AS BIGINT) AS max_events
         |FROM uh GROUP BY 1 ORDER BY hour"""
        .stripMargin.replace("\n", " ")),
    "x213_backfill_plan" ->
      ("""WITH ob AS (SELECT CAST(ts AS DATE) AS day,
         |  CAST(COUNT(*) AS BIGINT) AS n FROM events
         | WHERE ts IS NOT NULL GROUP BY 1),
         |bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ob),
         |sp AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
         |  AS DATE) AS day FROM bo),
         |f AS (SELECT sp.day, COALESCE(ob.n, 0) AS n
         |  FROM sp LEFT JOIN ob ON sp.day = ob.day),
         |h AS (SELECT day, n, list_sort(list(n) OVER (ORDER BY day
         |  ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) AS hist FROM f),
         |m AS (SELECT day, n, CASE WHEN len(hist) >= 3
         |  THEN hist[(len(hist) + 1) // 2] END AS trailing_median FROM h),
         |r AS (SELECT day, n, trailing_median,
         |  CASE WHEN trailing_median > 0
         |   THEN n * 1000000 // trailing_median END AS ratio_ppm FROM m)
         |SELECT day, n, trailing_median, ratio_ppm,
         | CASE WHEN ratio_ppm < 500000 THEN 1 ELSE 0 END AS backfill_flag
         |FROM r ORDER BY day""".stripMargin.replace("\n", " ")),
    "x214_filter_overlap" ->
      ("""WITH d AS (SELECT doc_id, lang, n_chars,
         |  MIN(doc_id) OVER (PARTITION BY text) AS rep FROM documents),
         |f AS (SELECT
         |  CASE WHEN doc_id <> rep THEN 1 ELSE 0 END AS fd,
         |  CASE WHEN lang <> 'en' THEN 1 ELSE 0 END AS fe,
         |  CASE WHEN n_chars > 400 THEN 1 ELSE 0 END AS fo,
         |  CASE WHEN n_chars < 100 THEN 1 ELSE 0 END AS fs
         | FROM d),
         |g AS (SELECT *, fd + fe + fo + fs AS nk FROM f),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
         |  CAST(SUM(fd) AS BIGINT) AS kd,
         |  CAST(SUM(CASE WHEN fd = 1 AND nk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ud,
         |  CAST(SUM(fe) AS BIGINT) AS ke,
         |  CAST(SUM(CASE WHEN fe = 1 AND nk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ue,
         |  CAST(SUM(fo) AS BIGINT) AS ko,
         |  CAST(SUM(CASE WHEN fo = 1 AND nk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS uo,
         |  CAST(SUM(fs) AS BIGINT) AS ks,
         |  CAST(SUM(CASE WHEN fs = 1 AND nk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS us,
         |  CAST(SUM(CASE WHEN nk > 0 THEN 1 ELSE 0 END) AS BIGINT) AS kany
         | FROM g)
         |SELECT * FROM (
         | SELECT '(any)' AS filter, kany AS n_killed, kany AS n_unique_kill,
         |  kany * 1000000 // total AS kill_ppm FROM t
         | UNION ALL SELECT 'exact_dup', kd, ud, kd * 1000000 // total FROM t
         | UNION ALL SELECT 'non_english', ke, ue, ke * 1000000 // total FROM t
         | UNION ALL SELECT 'oversize', ko, uo, ko * 1000000 // total FROM t
         | UNION ALL SELECT 'too_short', ks, us, ks * 1000000 // total FROM t)
         |ORDER BY filter""".stripMargin.replace("\n", " ")),
    "x215_feature_hash_audit" ->
      ("""WITH t AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS term
         |  FROM documents WHERE text IS NOT NULL),
         |t2 AS (SELECT term FROM t WHERE length(term) > 0),
         |b AS (SELECT CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT)
         |  % 262144 AS bucket FROM t2),
         |l AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ld FROM b GROUP BY 1)
         |SELECT CAST(SUM(ld) AS BIGINT) AS n_terms,
         | CAST(262144 AS INT) AS n_buckets,
         | CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
         | CAST(SUM(CASE WHEN ld > 1 THEN ld ELSE 0 END) AS BIGINT)
         |  AS n_collided_terms,
         | CAST(MAX(ld) AS BIGINT) AS max_bucket_load,
         | CAST(CAST(SUM(CASE WHEN ld > 1 THEN ld ELSE 0 END) AS BIGINT)
         |  * 1000000 // CAST(SUM(ld) AS BIGINT) AS BIGINT) AS collision_ppm
         |FROM l""".stripMargin.replace("\n", " ")),
    "x216_stopword_induction" ->
      ("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents WHERE text IS NOT NULL),
         |tk AS (SELECT doc_id, term FROM tok WHERE length(term) > 0),
         |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM
         |  (SELECT DISTINCT doc_id, term FROM tk) GROUP BY 1),
         |tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS tf FROM tk GROUP BY 1),
         |tt AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd,
         |  CAST(COUNT(*) AS BIGINT) AS nt FROM tk),
         |top AS (SELECT d.term, d.df, tf.tf, nd, nt
         |  FROM df d JOIN tf USING (term), tt
         |  ORDER BY d.df DESC, d.term LIMIT 50),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term)
         |   AS BIGINT) AS rank,
         |  CAST(SUM(tf) OVER (ORDER BY df DESC, term
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |   AS cum_tf FROM top)
         |SELECT rank, term, df, tf,
         | df * 1000000 // nd AS doc_share_ppm,
         | tf * 1000000 // nt AS token_share_ppm,
         | cum_tf * 1000000 // nt AS cum_token_share_ppm
         |FROM r ORDER BY rank""".stripMargin.replace("\n", " ")),
    "x217_ann_recall_eval" ->
      (s"""WITH ${hyperplaneCtes()},
         |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |truth AS (SELECT vec_id FROM embeddings, qv
         |  ORDER BY ROUND($cosSql, 6) DESC, vec_id LIMIT 10),
         |m_sign AS (SELECT vec_id FROM embeddings, qv
         |  WHERE ${signBucketSql("embedding")} = ${signBucketSql("qe")}
         |  ORDER BY ROUND($cosSql, 6) DESC, vec_id LIMIT 10),
         |cand AS (SELECT DISTINCT a.vec_id
         |  FROM hpkeys a JOIN hpkeys q ON a.band = q.band AND a.bkey = q.bkey
         |  WHERE q.vec_id = 0),
         |m_band AS (SELECT e.vec_id
         |  FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id, qv
         |  ORDER BY ROUND(${cos2Sql("e.embedding", "qe")}, 6) DESC, e.vec_id
         |  LIMIT 10),
         |cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
         |asg AS (SELECT vec_id, embedding, cid FROM (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |   ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |     ORDER BY ${cos2Sql("e.embedding", "c.cemb")} DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
         |probe AS (SELECT cid FROM cent, qv
         |  ORDER BY ${cos2Sql("cemb", "qe")} DESC, cid LIMIT 4),
         |m_ivf AS (SELECT a.vec_id FROM asg a JOIN probe USING (cid), qv
         |  ORDER BY ROUND(${cos2Sql("a.embedding", "qe")}, 6) DESC, a.vec_id
         |  LIMIT 10)
         |SELECT * FROM (
         | SELECT 'banded_lsh' AS method, CAST(10 AS INT) AS k,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_band JOIN truth USING (vec_id))
         |   AS n_hits,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_band JOIN truth USING (vec_id))
         |   * 1000000 // 10 AS recall_ppm
         | UNION ALL SELECT 'ivf', 10,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_ivf JOIN truth USING (vec_id)),
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_ivf JOIN truth USING (vec_id))
         |   * 1000000 // 10
         | UNION ALL SELECT 'sign_bucket', 10,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_sign JOIN truth USING (vec_id)),
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_sign JOIN truth USING (vec_id))
         |   * 1000000 // 10)
         |ORDER BY method""".stripMargin.replace("\n", " ")),
    "x218_coordinated_sample" ->
      ("""WITH pk AS (SELECT o_orderkey AS k FROM orders),
         |ck AS (SELECT l_orderkey AS k FROM lineitem),
         |pkk AS (SELECT k FROM pk WHERE CAST(('0x' ||
         |  substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 5),
         |ckk AS (SELECT k FROM ck WHERE CAST(('0x' ||
         |  substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 5),
         |orp AS (SELECT CAST(COUNT(*) AS BIGINT) AS orphan_child_keys FROM
         |  (SELECT DISTINCT k FROM ckk) c LEFT JOIN
         |  (SELECT DISTINCT k FROM pkk) p ON c.k = p.k WHERE p.k IS NULL),
         |st AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pk) AS parent_total,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM pkk) AS parent_kept,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ck) AS child_total,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ckk) AS child_kept)
         |SELECT parent_total, parent_kept,
         | parent_kept * 1000000 // parent_total AS parent_ppm,
         | child_total, child_kept,
         | child_kept * 1000000 // child_total AS child_ppm,
         | orphan_child_keys
         |FROM st, orp""".stripMargin.replace("\n", " ")),
    // Deliberately NOT the Apriori algorithm: counting every width-capped
    // basket triple directly is feasible at oracle scale, so green
    // certifies the downward-closure pruning lost no frequent triple.
    "x219_frequent_triples" ->
      ("""WITH it AS (SELECT DISTINCT l_orderkey AS b, p_brand AS i
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |sz AS (SELECT b FROM it GROUP BY b HAVING COUNT(*) <= 100),
         |s AS (SELECT it.b, it.i FROM it JOIN sz ON it.b = sz.b),
         |tr AS (SELECT a.i AS i1, bb.i AS i2, c.i AS i3
         | FROM s a JOIN s bb ON a.b = bb.b AND a.i < bb.i
         |          JOIN s c ON bb.b = c.b AND bb.i < c.i)
         |SELECT i1, i2, i3, CAST(COUNT(*) AS BIGINT) AS support
         |FROM tr GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
         |ORDER BY support DESC, i1, i2, i3 LIMIT 20"""
        .stripMargin.replace("\n", " ")),
    "x220_domain_overlap" ->
      ("""WITH av AS (SELECT DISTINCT user_id AS v FROM events
         |  WHERE user_id IS NOT NULL),
         |bv AS (SELECT DISTINCT c_custkey AS v FROM customer
         |  WHERE c_custkey IS NOT NULL),
         |j AS (SELECT av.v AS va, bv.v AS vb
         |  FROM av FULL JOIN bv ON av.v = bv.v)
         |SELECT CAST(SUM(CASE WHEN va IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_a,
         | CAST(SUM(CASE WHEN vb IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_b,
         | CAST(SUM(CASE WHEN va IS NOT NULL AND vb IS NOT NULL THEN 1 ELSE 0
         |  END) AS BIGINT) AS both,
         | CAST(SUM(CASE WHEN va IS NOT NULL AND vb IS NULL THEN 1 ELSE 0 END)
         |  AS BIGINT) AS only_a,
         | CAST(SUM(CASE WHEN va IS NULL AND vb IS NOT NULL THEN 1 ELSE 0 END)
         |  AS BIGINT) AS only_b,
         | CAST(SUM(CASE WHEN va IS NOT NULL AND vb IS NOT NULL THEN 1 ELSE 0
         |   END) * 1000000 // COUNT(*) AS BIGINT) AS jaccard_ppm
         |FROM j""".stripMargin.replace("\n", " ")),
    "x221_topk_churn" ->
      ("""WITH h1 AS (SELECT p_brand AS item,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE l_shipdate < TIMESTAMP '1998-07-01' GROUP BY 1),
         |h2 AS (SELECT p_brand AS item,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE l_shipdate >= TIMESTAMP '1998-07-01' GROUP BY 1),
         |r1 AS (SELECT item, CAST(ROW_NUMBER() OVER (ORDER BY s DESC, item)
         |  AS BIGINT) AS prev_rank FROM h1),
         |r2 AS (SELECT item, CAST(ROW_NUMBER() OVER (ORDER BY s DESC, item)
         |  AS BIGINT) AS cur_rank FROM h2),
         |t1 AS (SELECT * FROM r1 WHERE prev_rank <= 10),
         |t2 AS (SELECT * FROM r2 WHERE cur_rank <= 10),
         |j AS (SELECT COALESCE(t1.item, t2.item) AS item, t1.prev_rank,
         |  t2.cur_rank FROM t1 FULL JOIN t2 ON t1.item = t2.item)
         |SELECT item,
         | CASE WHEN prev_rank IS NULL THEN 'entered'
         |      WHEN cur_rank IS NULL THEN 'exited'
         |      ELSE 'stayed' END AS status,
         | prev_rank, cur_rank
         |FROM j ORDER BY status, COALESCE(cur_rank, prev_rank), item"""
        .stripMargin.replace("\n", " ")),
    "x222_weekly_continuity" ->
      ("""WITH uw AS (SELECT DISTINCT user_id AS u,
         |  CAST(date_trunc('week', ts) AS DATE) AS w
         | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |pv AS (SELECT u, w + 7 AS w, 1 AS ret FROM uw),
         |f0 AS (SELECT MIN(w) AS w0 FROM uw),
         |j AS (SELECT uw.w, uw.u, pv.ret
         |  FROM uw LEFT JOIN pv ON uw.u = pv.u AND uw.w = pv.w)
         |SELECT w AS week, CAST(COUNT(*) AS BIGINT) AS n_active,
         | CAST(SUM(COALESCE(ret, 0)) AS BIGINT) AS n_returning,
         | CASE WHEN w > w0 THEN CAST(SUM(COALESCE(ret, 0)) AS BIGINT)
         |  * 1000000 // COUNT(*) END AS continuity_ppm
         |FROM j, f0 GROUP BY w, w0 ORDER BY week"""
        .stripMargin.replace("\n", " ")),
    "x223_seasonal_naive_backtest" ->
      ("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
         |  CAST(COUNT(*) AS BIGINT) AS x FROM events
         | WHERE ts IS NOT NULL GROUP BY 1),
         |bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
         |s AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
         |  AS DATE) AS day FROM bo),
         |f AS (SELECT s.day, COALESCE(d.x, 0) AS actual
         |  FROM s LEFT JOIN d ON s.day = d.day)
         |SELECT a.day, a.actual, p.actual AS forecast,
         | ABS(a.actual - p.actual) AS abs_err,
         | CASE WHEN a.actual > 0
         |  THEN ABS(a.actual - p.actual) * 1000000 // a.actual END AS err_ppm
         |FROM f a JOIN f p ON a.day = p.day + 7 ORDER BY a.day"""
        .stripMargin.replace("\n", " ")),
    "x224_ivf_label_purity" ->
      (s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
         |asg AS (SELECT vec_id, cid FROM (
         |  SELECT e.vec_id, c.cid,
         |   ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |     ORDER BY ${cos2Sql("e.embedding", "c.cemb")} DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
         |al AS (SELECT a.vec_id, a.cid AS cell, e.label
         |  FROM asg a JOIN embeddings e ON a.vec_id = e.vec_id),
         |cl AS (SELECT cell, label, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM al GROUP BY 1, 2),
         |r AS (SELECT cell, label, n, ROW_NUMBER() OVER (PARTITION BY cell
         |  ORDER BY n DESC, label) AS rk FROM cl),
         |t AS (SELECT cell, CAST(SUM(n) AS BIGINT) AS n_vectors,
         |  CAST(COUNT(*) AS BIGINT) AS n_labels FROM cl GROUP BY 1)
         |SELECT t.cell, t.n_vectors, t.n_labels, r.label AS majority_label,
         | r.n * 1000000 // t.n_vectors AS purity_ppm
         |FROM t JOIN r ON r.cell = t.cell AND r.rk = 1 ORDER BY t.cell"""
        .stripMargin.replace("\n", " ")),
    "x225_cluster_size_census" ->
      (s"""WITH $clusterCtes,
         |csizes AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS sz
         |  FROM l3 GROUP BY 1)
         |SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         | CAST(SUM(sz) AS BIGINT) AS n_docs
         |FROM csizes GROUP BY 1 ORDER BY cluster_size"""
        .stripMargin.replace("\n", " ")),
    "x226_share_of_parent" ->
      ("""WITH leaf AS (SELECT r_name, n_name,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT)) AS BIGINT) AS cents
         | FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         | GROUP BY 1, 2),
         |p AS (SELECT r_name, CAST(SUM(cents) AS BIGINT) AS ptot
         |  FROM leaf GROUP BY 1),
         |g AS (SELECT CAST(SUM(cents) AS BIGINT) AS gtot FROM leaf)
         |SELECT leaf.r_name, n_name, cents,
         | cents * 1000000 // ptot AS share_of_parent_ppm,
         | ptot * 1000000 // gtot AS parent_share_ppm
         |FROM leaf JOIN p ON leaf.r_name = p.r_name, g
         |ORDER BY leaf.r_name, n_name""".stripMargin.replace("\n", " ")),
    "x227_fill_rate_bands" ->
      ("""WITH po AS (SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS total,
         |  CAST(SUM(CASE WHEN CAST(l_shipdate AS DATE) <=
         |    CAST(o_orderdate AS DATE) + 30 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS ontime
         | FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         | WHERE o_orderdate IS NOT NULL AND l_shipdate IS NOT NULL
         | GROUP BY 1),
         |b AS (SELECT CASE WHEN ontime * 10000 // total = 10000 THEN 4
         |  ELSE CAST((ontime * 10000 // total) // 2500 AS INT) END AS band,
         | ontime * 10000 // total AS bps FROM po)
         |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_orders,
         | CAST(MIN(bps) AS BIGINT) AS min_bps,
         | CAST(MAX(bps) AS BIGINT) AS max_bps
         |FROM b GROUP BY 1 ORDER BY band""".stripMargin.replace("\n", " ")),
    "x228_near_dup_explanations" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |top AS (SELECT d1, d2, jaccard FROM jpairs
         |  ORDER BY jaccard DESC, d1, d2 LIMIT 10),
         |dfreq AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df
         |  FROM sh GROUP BY 1),
         |shr AS (SELECT t.d1, t.d2, t.jaccard, a.s FROM top t
         |  JOIN sh a ON a.doc_id = t.d1
         |  JOIN sh b ON b.doc_id = t.d2 AND a.s = b.s),
         |r AS (SELECT shr.d1, shr.d2, shr.jaccard, shr.s, dfreq.df,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY shr.d1, shr.d2
         |    ORDER BY dfreq.df, shr.s) AS BIGINT) AS rk
         | FROM shr JOIN dfreq ON shr.s = dfreq.s)
         |SELECT d1, d2, jaccard, rk, s AS shared_shingle, df
         |FROM r WHERE rk <= 3 ORDER BY d1, d2, rk"""
        .stripMargin.replace("\n", " ")),
    "x229_vwap_deviation" ->
      ("""WITH d AS (SELECT CAST(l_shipdate AS DATE) AS day,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT)) AS BIGINT) AS c,
         |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
         | FROM lineitem WHERE l_shipdate IS NOT NULL GROUP BY 1
         | HAVING SUM(CAST(l_quantity AS BIGINT)) > 0),
         |g AS (SELECT CAST(SUM(c) AS BIGINT) AS gc,
         |  CAST(SUM(q) AS BIGINT) AS gq FROM d)
         |SELECT day, c // q AS vwap_cents, gc // gq AS global_vwap_cents,
         | ABS(c // q - gc // gq) * 1000000 // (gc // gq) AS deviation_ppm,
         | CASE WHEN ABS(c // q - gc // gq) * 1000000 // (gc // gq) > 50000
         |  THEN 1 ELSE 0 END AS flag
         |FROM d, g ORDER BY day""".stripMargin.replace("\n", " ")),
    "x230_threshold_sweep" ->
      (s"""WITH ${jaccardCtes(0.5, Some(1000))},
         |ts AS (SELECT * FROM (VALUES (50), (60), (70), (80), (90))
         |  t(threshold_pct)),
         |q AS (SELECT ts.threshold_pct, d1, d2 FROM jpairs CROSS JOIN ts
         |  WHERE jaccard * 100 >= threshold_pct),
         |np AS (SELECT threshold_pct, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |  FROM q GROUP BY 1),
         |nd AS (SELECT threshold_pct, CAST(COUNT(*) AS BIGINT) AS n_docs FROM
         |  (SELECT DISTINCT threshold_pct, doc FROM
         |   (SELECT threshold_pct, d1 AS doc FROM q
         |    UNION ALL SELECT threshold_pct, d2 FROM q)) GROUP BY 1)
         |SELECT ts.threshold_pct, COALESCE(np.n_pairs, 0) AS n_pairs,
         | COALESCE(nd.n_docs, 0) AS n_docs
         |FROM ts LEFT JOIN np ON ts.threshold_pct = np.threshold_pct
         | LEFT JOIN nd ON ts.threshold_pct = nd.threshold_pct
         |ORDER BY ts.threshold_pct""".stripMargin.replace("\n", " ")),
    "x231_ivf_cluster_topics" ->
      (s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
         |asg AS (SELECT vec_id AS doc_id, cid AS cell FROM (
         |  SELECT e.vec_id, c.cid,
         |   ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |     ORDER BY ${cos2Sql("e.embedding", "c.cemb")} DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
         |tm AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents WHERE text IS NOT NULL),
         |tm2 AS (SELECT doc_id, term FROM tm WHERE length(term) > 0),
         |ct AS (SELECT a.cell, t.term, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM tm2 t JOIN asg a ON t.doc_id = a.doc_id GROUP BY 1, 2),
         |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM
         |  (SELECT DISTINCT doc_id, term FROM tm2) GROUP BY 1),
         |sc AS (SELECT ct.cell, ct.term, ct.n, dfq.df,
         |  ct.n * 1000000 // dfq.df AS score
         | FROM ct JOIN dfq ON ct.term = dfq.term),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY cell
         |  ORDER BY score DESC, term) AS BIGINT) AS rank FROM sc)
         |SELECT cell, rank, term, n, df, score
         |FROM r WHERE rank <= 3 ORDER BY cell, rank"""
        .stripMargin.replace("\n", " ")),
    "x232_freshness_report" ->
      ("""WITH dm AS (SELECT event_type AS dim,
         |  CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS m
         | FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
         | GROUP BY 1),
         |h AS (SELECT MAX(m) AS hw FROM dm)
         |SELECT dim, STRFTIME(CAST(to_timestamp(m) AS TIMESTAMP),
         |  '%Y-%m-%d %H:%M:%S') AS newest,
         | hw - m AS lag_seconds,
         | CASE WHEN hw - m > 3600 THEN 1 ELSE 0 END AS stale
         |FROM dm, h ORDER BY dim""".stripMargin.replace("\n", " ")),
    "x233_reconciliation_audit" ->
      ("""WITH per AS (SELECT o_orderkey,
         |  CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT)) AS BIGINT) AS h,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT)) AS BIGINT) AS l
         | FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         | GROUP BY 1 HAVING MAX(o_totalprice) > 0),
         |p2 AS (SELECT ABS(h - l) * 1000000 // h AS ppm FROM per),
         |b AS (SELECT CASE WHEN ppm = 0 THEN '0_exact'
         |  WHEN ppm < 10000 THEN '1_under_1pct'
         |  WHEN ppm < 50000 THEN '2_under_5pct'
         |  WHEN ppm < 200000 THEN '3_under_20pct'
         |  ELSE '4_over_20pct' END AS band, ppm FROM p2)
         |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_parents,
         | CAST(MAX(ppm) AS BIGINT) AS max_gap_ppm
         |FROM b GROUP BY 1 ORDER BY band""".stripMargin.replace("\n", " ")),
    "x234_weekday_adjusted_outliers" ->
      ("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
         |  CAST(COUNT(*) AS BIGINT) AS n FROM events
         | WHERE ts IS NOT NULL GROUP BY 1),
         |bo AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM d),
         |sp AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
         |  AS DATE) AS day FROM bo),
         |f AS (SELECT sp.day, COALESCE(d.n, 0) AS n,
         |  isodow(sp.day) - 1 AS wd FROM sp LEFT JOIN d ON sp.day = d.day),
         |cl AS (SELECT wd, n, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM f GROUP BY 1, 2),
         |cm AS (SELECT wd, n,
         |  CAST(SUM(c) OVER (PARTITION BY wd ORDER BY n
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |  CAST(SUM(c) OVER (PARTITION BY wd) AS BIGINT) AS tot FROM cl),
         |md AS (SELECT wd, CAST(MIN(n) AS BIGINT) AS wd_median
         |  FROM cm WHERE cum * 2 >= tot GROUP BY 1)
         |SELECT f.day, f.n, md.wd_median,
         | CASE WHEN wd_median > 0
         |  THEN ABS(f.n - wd_median) * 1000000 // wd_median END AS dev_ppm,
         | CASE WHEN (CASE WHEN wd_median > 0
         |  THEN ABS(f.n - wd_median) * 1000000 // wd_median END) > 200000
         |  THEN 1 ELSE 0 END AS flag
         |FROM f JOIN md ON f.wd = md.wd ORDER BY f.day"""
        .stripMargin.replace("\n", " ")),
    "x235_vocab_exclusivity" ->
      ("""WITH st AS (SELECT DISTINCT source,
         |  unnest(string_split(text, ' ')) AS term
         | FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |st2 AS (SELECT source, term FROM st WHERE length(term) > 0),
         |sp AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS ns
         |  FROM st2 GROUP BY 1)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_terms,
         | CAST(SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_exclusive,
         | CAST(SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END) * 1000000
         |  // COUNT(*) AS BIGINT) AS exclusive_ppm
         |FROM st2 JOIN sp ON st2.term = sp.term
         |GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")),
    "x236_touch_depth_histogram" ->
      ("""WITH pur AS (SELECT event_id AS conv_id, user_id AS cu, ts AS cts
         |  FROM events WHERE event_type = 'purchase'),
         |t AS (SELECT p.conv_id, e.event_id
         |  FROM pur p LEFT JOIN events e ON e.user_id = p.cu
         |   AND e.ts >= p.cts - INTERVAL 7 DAY AND e.ts < p.cts
         |   AND e.event_type <> 'purchase'),
         |d AS (SELECT conv_id, CAST(COUNT(event_id) AS BIGINT) AS depth
         |  FROM t GROUP BY 1)
         |SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_conversions
         |FROM d GROUP BY 1 ORDER BY depth""".stripMargin.replace("\n", " ")),
    "x237_cross_source_dups" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |src AS (SELECT doc_id, source FROM documents),
         |sp AS (SELECT LEAST(s1.source, s2.source) AS source_1,
         |  GREATEST(s1.source, s2.source) AS source_2
         | FROM jpairs j JOIN src s1 ON j.d1 = s1.doc_id
         |  JOIN src s2 ON j.d2 = s2.doc_id)
         |SELECT source_1, source_2, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM sp GROUP BY 1, 2 ORDER BY source_1, source_2"""
        .stripMargin.replace("\n", " ")),
    "x238_reorder_eta" ->
      ("""WITH dy AS (SELECT DISTINCT o_custkey AS c,
         |  CAST(o_orderdate AS DATE) AS d FROM orders
         | WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |g AS (SELECT c, d, date_diff('day',
         |  LAG(d) OVER (PARTITION BY c ORDER BY d), d) AS gap FROM dy),
         |a AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n_order_days,
         |  MAX(d) AS last_order_day,
         |  list_sort(list(gap) FILTER (WHERE gap IS NOT NULL)) AS gaps
         | FROM g GROUP BY 1),
         |b AS (SELECT c, n_order_days, last_order_day,
         |  CAST(gaps[(len(gaps) + 1) // 2] AS BIGINT) AS median_gap_days
         | FROM a WHERE n_order_days >= 3)
         |SELECT c AS o_custkey, n_order_days, last_order_day,
         | median_gap_days,
         | last_order_day + CAST(median_gap_days AS INT) AS eta_day
         |FROM b ORDER BY o_custkey""".stripMargin.replace("\n", " ")),
    "x239_hhi_trend" ->
      ("""WITH qb AS (SELECT CAST(date_trunc('quarter', l_shipdate) AS DATE)
         |  AS quarter, p_brand,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT)) AS BIGINT) AS c
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE l_shipdate IS NOT NULL GROUP BY 1, 2),
         |qt AS (SELECT quarter, CAST(SUM(c) AS BIGINT) AS t
         |  FROM qb GROUP BY 1),
         |sh AS (SELECT qb.quarter, c * 1000000 // t AS s
         |  FROM qb JOIN qt ON qb.quarter = qt.quarter)
         |SELECT quarter, CAST(COUNT(*) AS BIGINT) AS n_groups,
         | CAST(SUM(s * s) // 1000000 AS BIGINT) AS hhi_ppm
         |FROM sh GROUP BY 1 ORDER BY quarter"""
        .stripMargin.replace("\n", " ")),
    "x240_effective_vocabulary" ->
      ("""WITH tm AS (SELECT source, unnest(string_split(text, ' ')) AS term
         |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |tc AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM tm WHERE length(term) > 0 GROUP BY 1, 2)
         |SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens,
         | CAST(COUNT(*) AS BIGINT) AS n_distinct_terms,
         | CAST(CAST(SUM(n) AS HUGEINT) * CAST(SUM(n) AS HUGEINT)
         |  // SUM(CAST(n AS HUGEINT) * n) AS BIGINT) AS effective_terms
         |FROM tc GROUP BY 1 ORDER BY source"""
        .stripMargin.replace("\n", " ")),
    "x241_dedup_token_savings" ->
      (s"""WITH $clusterCtes,
         |reps AS (SELECT label, MIN(node) AS rep FROM l3 GROUP BY 1),
         |drp AS (SELECT l3.node AS doc_id FROM l3
         |  JOIN reps ON l3.label = reps.label WHERE l3.node <> reps.rep),
         |tk AS (SELECT doc_id, source,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
         | FROM documents WHERE text IS NOT NULL)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(tok) AS BIGINT) AS tokens_total,
         | CAST(SUM(CASE WHEN drp.doc_id IS NOT NULL THEN tok ELSE 0 END)
         |  AS BIGINT) AS tokens_dropped,
         | CAST(SUM(CASE WHEN drp.doc_id IS NOT NULL THEN tok ELSE 0 END)
         |  * 1000000 // SUM(tok) AS BIGINT) AS savings_ppm
         |FROM tk LEFT JOIN drp ON tk.doc_id = drp.doc_id
         |GROUP BY source ORDER BY source"""
        .stripMargin.replace("\n", " ")),
    "x242_fd_audit" ->
      ("""WITH f1 AS (SELECT p_name AS det, p_brand AS dep FROM part
         |  WHERE p_name IS NOT NULL AND p_brand IS NOT NULL),
         |a1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_det_values,
         |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
         | FROM (SELECT det, COUNT(DISTINCT dep) AS nd FROM f1 GROUP BY 1)),
         |f2 AS (SELECT p_brand AS det, p_type AS dep FROM part
         |  WHERE p_brand IS NOT NULL AND p_type IS NOT NULL),
         |a2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_det_values,
         |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
         | FROM (SELECT det, COUNT(DISTINCT dep) AS nd FROM f2 GROUP BY 1)),
         |f3 AS (SELECT p_type AS det, p_size AS dep FROM part
         |  WHERE p_type IS NOT NULL AND p_size IS NOT NULL),
         |a3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_det_values,
         |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
         | FROM (SELECT det, COUNT(DISTINCT dep) AS nd FROM f3 GROUP BY 1))
         |SELECT 'p_name' AS determinant, 'p_brand' AS dependent, n_det_values,
         |  n_violating,
         |  CAST(n_violating * 1000000 // n_det_values AS BIGINT) AS violation_ppm
         | FROM a1
         |UNION ALL SELECT 'p_brand', 'p_type', n_det_values, n_violating,
         |  CAST(n_violating * 1000000 // n_det_values AS BIGINT) FROM a2
         |UNION ALL SELECT 'p_type', 'p_size', n_det_values, n_violating,
         |  CAST(n_violating * 1000000 // n_det_values AS BIGINT) FROM a3
         |ORDER BY determinant, dependent""".stripMargin.replace("\n", " ")),
    "x243_chi_square_audit" ->
      ("""WITH j AS (SELECT c_mktsegment, o_orderpriority FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  WHERE c_mktsegment IS NOT NULL AND o_orderpriority IS NOT NULL),
         |cells AS (SELECT c_mktsegment, o_orderpriority,
         |  CAST(COUNT(*) AS BIGINT) AS observed FROM j GROUP BY 1, 2),
         |rt AS (SELECT c_mktsegment, CAST(SUM(observed) AS BIGINT) AS rt
         |  FROM cells GROUP BY 1),
         |ct AS (SELECT o_orderpriority, CAST(SUM(observed) AS BIGINT) AS ct
         |  FROM cells GROUP BY 1),
         |n AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM cells)
         |SELECT cells.c_mktsegment, cells.o_orderpriority, observed,
         | CAST(CAST(rt AS HUGEINT) * ct * 1000 // n AS BIGINT) AS expected_milli,
         | CAST((CAST(observed AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
         |   * (CAST(observed AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
         |   * 1000000 // (CAST(n AS HUGEINT) * rt * ct) AS BIGINT)
         |   AS contrib_micro
         |FROM cells JOIN rt USING (c_mktsegment)
         | JOIN ct USING (o_orderpriority) CROSS JOIN n
         |ORDER BY c_mktsegment, o_orderpriority"""
        .stripMargin.replace("\n", " ")),
    "x244_session_gap_sweep" ->
      ("""WITH e AS (SELECT user_id, ts FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |g AS (SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT)
         |  - CAST(FLOOR(epoch(LAG(ts) OVER
         |      (PARTITION BY user_id ORDER BY ts))) AS BIGINT) AS gap FROM e),
         |b AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS u,
         |  CAST(COUNT(*) AS BIGINT) AS ev,
         |  CAST(SUM(CASE WHEN gap > 300 THEN 1 ELSE 0 END) AS BIGINT) AS x300,
         |  CAST(SUM(CASE WHEN gap > 900 THEN 1 ELSE 0 END) AS BIGINT) AS x900,
         |  CAST(SUM(CASE WHEN gap > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS x1800,
         |  CAST(SUM(CASE WHEN gap > 3600 THEN 1 ELSE 0 END) AS BIGINT) AS x3600
         | FROM g)
         |SELECT CAST(300 AS BIGINT) AS threshold_sec, u + x300 AS n_sessions,
         |  CAST(ev * 1000 // (u + x300) AS BIGINT) AS events_per_session_milli
         | FROM b
         |UNION ALL SELECT 900, u + x900,
         |  CAST(ev * 1000 // (u + x900) AS BIGINT) FROM b
         |UNION ALL SELECT 1800, u + x1800,
         |  CAST(ev * 1000 // (u + x1800) AS BIGINT) FROM b
         |UNION ALL SELECT 3600, u + x3600,
         |  CAST(ev * 1000 // (u + x3600) AS BIGINT) FROM b
         |ORDER BY threshold_sec""".stripMargin.replace("\n", " ")),
    "x245_frequency_spectrum" ->
      ("""WITH tm AS (SELECT source, unnest(string_split(text, ' ')) AS term
         |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |tc AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM tm WHERE length(term) > 0 GROUP BY 1, 2)
         |SELECT source,
         | CAST(length(format('{:b}', n)) - 1 AS INT) AS freq_band,
         | CAST(CAST(1 AS BIGINT) << (length(format('{:b}', n)) - 1) AS BIGINT)
         |   AS band_lo,
         | CAST(COUNT(*) AS BIGINT) AS n_terms,
         | CAST(SUM(n) AS BIGINT) AS n_tokens
         |FROM tc GROUP BY 1, 2, 3 ORDER BY source, freq_band"""
        .stripMargin.replace("\n", " ")),
    "x246_embedding_norm_audit" ->
      ("""WITH v AS (SELECT label,
         |  round(list_aggregate(list_transform(embedding,
         |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS sq
         | FROM embeddings WHERE label IS NOT NULL AND embedding IS NOT NULL)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         | CAST(SUM(CASE WHEN sq = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         | MIN(sq) AS min_sq_norm, MAX(sq) AS max_sq_norm,
         | CAST(CAST(SUM(CAST(sq AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
         |   AS DOUBLE) AS avg_sq_norm
         |FROM v GROUP BY 1 ORDER BY label""".stripMargin.replace("\n", " ")),
    "x247_dimension_drift_audit" ->
      ("""WITH e AS (SELECT label, embedding FROM embeddings
         |  WHERE label IS NOT NULL AND embedding IS NOT NULL),
         |u AS (SELECT label, embedding,
         |  unnest(range(len(embedding))) AS i FROM e),
         |c AS (SELECT label, CAST(i + 1 AS INT) AS dim,
         |  CAST(ROUND(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
         |    * 1000000) AS BIGINT) AS m FROM u),
         |bl AS (SELECT label, dim, CAST(SUM(m) AS BIGINT) AS ls,
         |  CAST(COUNT(*) AS BIGINT) AS ln FROM c GROUP BY 1, 2),
         |g AS (SELECT dim, CAST(SUM(ls) AS BIGINT) AS gs,
         |  CAST(SUM(ln) AS BIGINT) AS gn FROM bl GROUP BY 1)
         |SELECT bl.dim AS dim, CAST(COUNT(*) AS BIGINT) AS n_labels,
         | MAX(CAST(gs AS DOUBLE) / gn) AS global_avg_micro,
         | MAX(ABS(CAST(ls AS DOUBLE) / ln - CAST(gs AS DOUBLE) / gn))
         |   AS max_label_dev_micro
         |FROM bl JOIN g USING (dim) GROUP BY 1 ORDER BY dim"""
        .stripMargin.replace("\n", " ")),
    "x248_token_set_dup_census" ->
      ("""WITH k AS (SELECT doc_id, source,
         |  md5(array_to_string(list_sort(list_distinct(list_filter(
         |    string_split(text, ' '), t -> length(t) > 0))), ' ')) AS ck,
         |  md5(text) AS tk
         | FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |cf AS (SELECT ck, CAST(COUNT(*) AS BIGINT) AS cn FROM k GROUP BY 1),
         |ef AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS tn FROM k GROUP BY 1)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(CASE WHEN tn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS exact_dup_docs,
         | CAST(SUM(CASE WHEN cn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS canon_dup_docs,
         | CAST(SUM(CASE WHEN cn > 1 AND tn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS reorder_only_docs,
         | CAST(SUM(CASE WHEN cn > 1 AND tn = 1 THEN 1 ELSE 0 END)
         |   * 1000000 // COUNT(*) AS BIGINT) AS reorder_only_ppm
         |FROM k JOIN cf USING (ck) JOIN ef USING (tk)
         |GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")),
    "x249_pq_recall_audit" ->
      (s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |sp AS (SELECT CAST(unnest(range(4)) AS INT) AS sub),
         |cw AS (SELECT CAST(vec_id AS INT) AS code, sub,
         |    embedding[sub * 16 + 1 : sub * 16 + 16] AS cvec
         |  FROM embeddings, sp WHERE vec_id BETWEEN 1 AND 8),
         |sv AS (SELECT vec_id, sub,
         |    embedding[sub * 16 + 1 : sub * 16 + 16] AS svec
         |  FROM embeddings, sp),
         |dist AS (SELECT vec_id, sv.sub AS sub, code,
         |    round(list_aggregate(list_transform(list_zip(svec, cvec),
         |      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         |         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum'), 9)
         |      AS d
         |  FROM sv JOIN cw ON sv.sub = cw.sub),
         |enc AS (SELECT vec_id, sub, code FROM dist
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |    ORDER BY d, code) = 1),
         |qt AS (SELECT cw.sub AS sub, code,
         |    list_aggregate(list_transform(
         |      list_zip(qe[cw.sub * 16 + 1 : cw.sub * 16 + 16], cvec),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS qdot
         |  FROM cw, q),
         |adc AS (SELECT vec_id,
         |    CAST(ROUND(CAST(SUM(CAST(qdot AS DECIMAL(28,12))) AS DOUBLE), 6)
         |      AS DOUBLE) AS adc
         |  FROM enc JOIN qt USING (sub, code) GROUP BY 1),
         |pq AS (SELECT vec_id FROM adc ORDER BY adc DESC, vec_id LIMIT 10),
         |tr AS (SELECT vec_id FROM embeddings, q
         |  ORDER BY ROUND($cosSql, 6) DESC, vec_id LIMIT 10),
         |h AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM pq JOIN tr USING (vec_id))
         |SELECT CAST(10 AS INT) AS k, n_hits,
         | CAST(n_hits * 1000000 // 10 AS BIGINT) AS recall_ppm,
         | CAST(256 AS BIGINT) AS raw_bytes_per_vec,
         | CAST(4 AS BIGINT) AS pq_bytes_per_vec
         |FROM h""".stripMargin.replace("\n", " ")),
    "x250_first_touch_mix" ->
      ("""WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |    AND event_id IS NOT NULL AND event_type IS NOT NULL),
         |f AS (SELECT user_id, MIN(ts) AS fts FROM e GROUP BY 1),
         |fi AS (SELECT e.user_id, e.ts, MIN(event_id) AS fid FROM e
         |  JOIN f ON e.user_id = f.user_id AND e.ts = f.fts GROUP BY 1, 2),
         |ft AS (SELECT CAST(date_trunc('month', e.ts) AS DATE) AS month,
         |    e.event_type
         |  FROM e JOIN fi ON e.user_id = fi.user_id AND e.ts = fi.ts
         |    AND e.event_id = fi.fid),
         |m AS (SELECT month, event_type,
         |  CAST(COUNT(*) AS BIGINT) AS n_new_users FROM ft GROUP BY 1, 2),
         |t AS (SELECT month, CAST(SUM(n_new_users) AS BIGINT) AS tot
         |  FROM m GROUP BY 1)
         |SELECT m.month, m.event_type, n_new_users,
         | CAST(n_new_users * 1000000 // tot AS BIGINT) AS share_ppm
         |FROM m JOIN t USING (month) ORDER BY month, event_type"""
        .stripMargin.replace("\n", " ")),
    "x251_order_count_survival" ->
      ("""WITH c AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
         |d AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS n_customers
         |  FROM c GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_customers) AS BIGINT) AS tot FROM d),
         |s AS (SELECT n, n_customers, CAST(SUM(n_customers) OVER
         |    (ORDER BY n DESC ROWS BETWEEN UNBOUNDED PRECEDING AND
         |     CURRENT ROW) AS BIGINT) AS n_at_least FROM d)
         |SELECT n AS n_orders, n_customers, n_at_least,
         | CAST(n_at_least * 1000000 // tot AS BIGINT) AS at_least_ppm
         |FROM s, t ORDER BY n_orders""".stripMargin.replace("\n", " ")),
    "x252_layout_run_advisor" ->
      ("""WITH o1 AS (SELECT ROW_NUMBER() OVER w AS rn,
         |  l_shipdate, l_returnflag, l_linestatus, l_partkey, l_suppkey,
         |  LAG(l_shipdate) OVER w AS p1, LAG(l_returnflag) OVER w AS p2,
         |  LAG(l_linestatus) OVER w AS p3, LAG(l_partkey) OVER w AS p4,
         |  LAG(l_suppkey) OVER w AS p5
         | FROM lineitem
         | WINDOW w AS (ORDER BY l_shipdate, l_orderkey, l_linenumber)),
         |a1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN rn = 1 OR p1 IS DISTINCT FROM l_shipdate
         |    THEN 1 ELSE 0 END) AS BIGINT) AS r1,
         |  CAST(SUM(CASE WHEN rn = 1 OR p2 IS DISTINCT FROM l_returnflag
         |    THEN 1 ELSE 0 END) AS BIGINT) AS r2,
         |  CAST(SUM(CASE WHEN rn = 1 OR p3 IS DISTINCT FROM l_linestatus
         |    THEN 1 ELSE 0 END) AS BIGINT) AS r3,
         |  CAST(SUM(CASE WHEN rn = 1 OR p4 IS DISTINCT FROM l_partkey
         |    THEN 1 ELSE 0 END) AS BIGINT) AS r4,
         |  CAST(SUM(CASE WHEN rn = 1 OR p5 IS DISTINCT FROM l_suppkey
         |    THEN 1 ELSE 0 END) AS BIGINT) AS r5 FROM o1),
         |o2 AS (SELECT ROW_NUMBER() OVER w AS rn,
         |  l_shipdate, l_returnflag, l_linestatus, l_partkey, l_suppkey,
         |  LAG(l_shipdate) OVER w AS p1, LAG(l_returnflag) OVER w AS p2,
         |  LAG(l_linestatus) OVER w AS p3, LAG(l_partkey) OVER w AS p4,
         |  LAG(l_suppkey) OVER w AS p5
         | FROM lineitem
         | WINDOW w AS (ORDER BY l_partkey, l_orderkey, l_linenumber)),
         |a2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN rn = 1 OR p1 IS DISTINCT FROM l_shipdate
         |    THEN 1 ELSE 0 END) AS BIGINT) AS r1,
         |  CAST(SUM(CASE WHEN rn = 1 OR p2 IS DISTINCT FROM l_returnflag
         |    THEN 1 ELSE 0 END) AS BIGINT) AS r2,
         |  CAST(SUM(CASE WHEN rn = 1 OR p3 IS DISTINCT FROM l_linestatus
         |    THEN 1 ELSE 0 END) AS BIGINT) AS r3,
         |  CAST(SUM(CASE WHEN rn = 1 OR p4 IS DISTINCT FROM l_partkey
         |    THEN 1 ELSE 0 END) AS BIGINT) AS r4,
         |  CAST(SUM(CASE WHEN rn = 1 OR p5 IS DISTINCT FROM l_suppkey
         |    THEN 1 ELSE 0 END) AS BIGINT) AS r5 FROM o2),
         |u AS (
         | SELECT 'by_shipdate' AS order_label, 'l_shipdate' AS column_name,
         |   n AS n_rows, r1 AS n_runs FROM a1
         | UNION ALL SELECT 'by_shipdate', 'l_returnflag', n, r2 FROM a1
         | UNION ALL SELECT 'by_shipdate', 'l_linestatus', n, r3 FROM a1
         | UNION ALL SELECT 'by_shipdate', 'l_partkey', n, r4 FROM a1
         | UNION ALL SELECT 'by_shipdate', 'l_suppkey', n, r5 FROM a1
         | UNION ALL SELECT 'by_partkey', 'l_shipdate', n, r1 FROM a2
         | UNION ALL SELECT 'by_partkey', 'l_returnflag', n, r2 FROM a2
         | UNION ALL SELECT 'by_partkey', 'l_linestatus', n, r3 FROM a2
         | UNION ALL SELECT 'by_partkey', 'l_partkey', n, r4 FROM a2
         | UNION ALL SELECT 'by_partkey', 'l_suppkey', n, r5 FROM a2)
         |SELECT order_label, column_name, n_rows, n_runs,
         | CAST(n_runs * 1000000 // n_rows AS BIGINT) AS runs_ppm
         |FROM u ORDER BY order_label, column_name"""
        .stripMargin.replace("\n", " ")),
    "x253_stickiness" ->
      ("""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id AS u
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau
         |  FROM du GROUP BY 1),
         |m1 AS (SELECT CAST(date_trunc('month', d) AS DATE) AS month,
         |  CAST(COUNT(*) AS BIGINT) AS n_active_days,
         |  CAST(SUM(dau) AS BIGINT) AS sum_dau FROM dau GROUP BY 1),
         |mu AS (SELECT CAST(date_trunc('month', d) AS DATE) AS month,
         |  CAST(COUNT(DISTINCT u) AS BIGINT) AS mau FROM du GROUP BY 1)
         |SELECT m1.month, n_active_days, mau,
         | CAST(sum_dau // n_active_days AS BIGINT) AS avg_dau,
         | CAST(sum_dau * 1000000 // (n_active_days * mau) AS BIGINT)
         |   AS stickiness_ppm
         |FROM m1 JOIN mu USING (month) ORDER BY month"""
        .stripMargin.replace("\n", " ")),
    "x254_single_source_census" ->
      ("""WITH ps AS (SELECT l_partkey, l_suppkey,
         |  CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
         |  WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
         |  GROUP BY 1, 2),
         |per AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS nsrc,
         |  CAST(SUM(n) AS BIGINT) AS tot, CAST(MAX(n) AS BIGINT) AS top
         | FROM ps GROUP BY 1),
         |sh AS (SELECT nsrc, top * 1000000 // tot AS share FROM per),
         |b AS (SELECT CASE WHEN share <= 250000 THEN '1_under_25pct'
         |    WHEN share <= 500000 THEN '2_under_50pct'
         |    WHEN share <= 750000 THEN '3_under_75pct'
         |    WHEN share <= 900000 THEN '4_under_90pct'
         |    ELSE '5_over_90pct' END AS band, share, nsrc FROM sh)
         |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_entities,
         | CAST(MIN(share) AS BIGINT) AS min_share_ppm,
         | CAST(MAX(share) AS BIGINT) AS max_share_ppm,
         | CAST(SUM(nsrc) AS BIGINT) AS total_sources
         |FROM b GROUP BY 1 ORDER BY band""".stripMargin.replace("\n", " ")),
    "x255_vocab_novelty_curve" ->
      ("""WITH tb AS (SELECT DISTINCT doc_id // 100 AS batch,
         |  unnest(string_split(text, ' ')) AS term FROM documents
         |  WHERE text IS NOT NULL AND doc_id IS NOT NULL),
         |tb2 AS (SELECT batch, term FROM tb WHERE length(term) > 0),
         |fb AS (SELECT term, CAST(MIN(batch) AS BIGINT) AS fbatch
         |  FROM tb2 GROUP BY 1),
         |seen AS (SELECT batch, CAST(COUNT(*) AS BIGINT) AS n_terms_used
         |  FROM tb2 GROUP BY 1),
         |fresh AS (SELECT fbatch AS batch, CAST(COUNT(*) AS BIGINT)
         |  AS n_new_terms FROM fb GROUP BY 1)
         |SELECT seen.batch AS batch, n_terms_used,
         | CAST(COALESCE(n_new_terms, 0) AS BIGINT) AS n_new_terms,
         | CAST(COALESCE(n_new_terms, 0) * 1000000 // n_terms_used AS BIGINT)
         |   AS novelty_ppm
         |FROM seen LEFT JOIN fresh ON seen.batch = fresh.batch
         |ORDER BY batch""".stripMargin.replace("\n", " ")),
    "x256_cluster_density_audit" ->
      (s"""WITH $clusterCtes,
         |csz AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes
         |  FROM l3 GROUP BY 1),
         |cpl AS (SELECT l3.label AS label, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |  FROM jpairs JOIN l3 ON jpairs.d1 = l3.node GROUP BY 1),
         |ccl AS (SELECT s.label, n_nodes,
         |  CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
         |  CAST(COALESCE(n_pairs, 0) * 2000000
         |    // (n_nodes * (n_nodes - 1)) AS BIGINT) AS density_ppm
         | FROM csz s LEFT JOIN cpl ON s.label = cpl.label)
         |SELECT n_nodes AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         | CAST(MIN(density_ppm) AS BIGINT) AS min_density_ppm,
         | CAST(MAX(density_ppm) AS BIGINT) AS max_density_ppm,
         | CAST(SUM(n_pairs) AS BIGINT) AS total_direct_pairs
         |FROM ccl GROUP BY 1 ORDER BY cluster_size"""
        .stripMargin.replace("\n", " ")),
    "x257_integer_headroom_audit" ->
      ("""WITH m AS (SELECT
         |  CAST(COALESCE(MAX(ABS(l_orderkey)), 0) AS BIGINT) AS m1,
         |  CAST(COALESCE(MAX(ABS(l_partkey)), 0) AS BIGINT) AS m2,
         |  CAST(COALESCE(MAX(ABS(l_suppkey)), 0) AS BIGINT) AS m3,
         |  CAST(COALESCE(MAX(ABS(l_linenumber)), 0) AS BIGINT) AS m4
         | FROM lineitem),
         |u AS (SELECT 'l_orderkey' AS column_name, m1 AS max_abs FROM m
         | UNION ALL SELECT 'l_partkey', m2 FROM m
         | UNION ALL SELECT 'l_suppkey', m3 FROM m
         | UNION ALL SELECT 'l_linenumber', m4 FROM m)
         |SELECT column_name, max_abs,
         | CAST(CASE WHEN max_abs > 0
         |   THEN length(format('{:b}', max_abs)) ELSE 0 END AS INT) AS bits_used,
         | CAST(CASE WHEN max_abs <= 32767 THEN 1 ELSE 0 END AS INT)
         |   AS fits_int16,
         | CAST(CASE WHEN max_abs <= 2147483647 THEN 1 ELSE 0 END AS INT)
         |   AS fits_int32
         |FROM u ORDER BY column_name""".stripMargin.replace("\n", " ")),
    "x258_streaming_outer_join" ->
      ("""WITH p AS (SELECT event_id AS pur_id, user_id, ts AS pur_ts, value
         |  FROM events WHERE event_type = 'purchase'),
         |e AS (SELECT event_id AS err_id, user_id, ts AS err_ts
         |  FROM events WHERE event_type = 'error'),
         |wm AS (SELECT LEAST((SELECT MAX(pur_ts) FROM p),
         |  (SELECT MAX(err_ts) FROM e)) AS w),
         |m AS (SELECT p.pur_id, e.err_id, p.user_id, p.value
         | FROM p JOIN e ON p.user_id = e.user_id
         |  AND e.err_ts >= p.pur_ts
         |  AND e.err_ts <= p.pur_ts + INTERVAL 1 HOUR),
         |um AS (SELECT p.pur_id, CAST(NULL AS BIGINT) AS err_id,
         |  p.user_id, p.value
         | FROM p, wm
         | WHERE p.pur_id NOT IN (SELECT pur_id FROM m)
         |  AND p.pur_ts + INTERVAL 1 HOUR < wm.w)
         |SELECT pur_id, err_id, user_id, value FROM m
         |UNION ALL SELECT pur_id, err_id, user_id, value FROM um
         |ORDER BY pur_id, err_id""".stripMargin.replace("\n", " ")),
    "x259_price_ending_census" ->
      ("""WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT) % 100 AS ending FROM orders),
         |e AS (SELECT ending, CAST(COUNT(*) AS BIGINT) AS n FROM c
         |  WHERE ending IS NOT NULL GROUP BY 1),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM e)
         |SELECT ending, n, CAST(n * 1000000 // tot AS BIGINT) AS share_ppm
         |FROM e, t ORDER BY n DESC, ending LIMIT 10"""
        .stripMargin.replace("\n", " ")),
    "x260_retention_half_life" ->
      ("""WITH ev AS (SELECT user_id, ts FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |fw AS (SELECT user_id,
         |  CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
         | FROM ev GROUP BY user_id),
         |act AS (SELECT DISTINCT user_id,
         |  CAST(date_trunc('week', ts) AS DATE) AS wk FROM ev),
         |cr AS (SELECT f.cohort_week,
         |  CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS INT)
         |    AS week_offset,
         |  CAST(COUNT(*) AS BIGINT) AS n_users
         | FROM act a JOIN fw f ON a.user_id = f.user_id GROUP BY 1, 2),
         |sz AS (SELECT cohort_week, n_users AS cohort_size FROM cr
         |  WHERE week_offset = 0),
         |hl AS (SELECT cr.cohort_week,
         |  CAST(MIN(week_offset) AS INT) AS hlw
         | FROM cr JOIN sz ON cr.cohort_week = sz.cohort_week
         | WHERE week_offset > 0 AND n_users * 2 < cohort_size
         | GROUP BY 1)
         |SELECT sz.cohort_week, cohort_size,
         | CAST(COALESCE(hlw, -1) AS INT) AS half_life_weeks
         |FROM sz LEFT JOIN hl ON sz.cohort_week = hl.cohort_week
         |ORDER BY sz.cohort_week""".stripMargin.replace("\n", " ")),
    "x261_abc_classification" ->
      ("""WITH per AS (SELECT l_partkey,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT)) AS BIGINT) AS rev
         | FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
         |t AS (SELECT CAST(SUM(rev) AS BIGINT) AS tot FROM per),
         |c AS (SELECT l_partkey, rev, CAST(SUM(rev) OVER
         |  (ORDER BY rev DESC, l_partkey
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |  AS cum FROM per),
         |cl AS (SELECT rev,
         |  CASE WHEN cum * 1000000 // tot <= 800000 THEN 'A'
         |    WHEN cum * 1000000 // tot <= 950000 THEN 'B'
         |    ELSE 'C' END AS abc_class FROM c, t)
         |SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_entities,
         | CAST(SUM(rev) AS BIGINT) AS class_revenue,
         | CAST(SUM(rev) * 1000000 // tot AS BIGINT) AS revenue_share_ppm
         |FROM cl, t GROUP BY abc_class, tot ORDER BY abc_class"""
        .stripMargin.replace("\n", " ")),
    "x262_missingness_patterns" ->
      ("""WITH e AS (SELECT
         |  CASE WHEN event_id % 13 = 0 THEN NULL ELSE user_id END AS u,
         |  CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v,
         |  CASE WHEN event_id % 11 = 0 THEN NULL ELSE props END AS p
         | FROM events),
         |k AS (SELECT concat_ws(',',
         |  CASE WHEN u IS NULL THEN 'user_id' END,
         |  CASE WHEN v IS NULL THEN 'value' END,
         |  CASE WHEN p IS NULL THEN 'props' END) AS missing_cols FROM e),
         |g AS (SELECT missing_cols, CAST(COUNT(*) AS BIGINT) AS n_rows
         |  FROM k GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS tot FROM g)
         |SELECT missing_cols, n_rows,
         | CAST(n_rows * 1000000 // tot AS BIGINT) AS share_ppm
         |FROM g, t ORDER BY missing_cols""".stripMargin.replace("\n", " ")),
    "x263_median_delta_trend" ->
      ("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS dy,
         |  CAST(COUNT(*) AS BIGINT) AS n FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
         |dl AS (SELECT event_type, n - LAG(n) OVER
         |  (PARTITION BY event_type ORDER BY dy) AS delta FROM d),
         |a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         |  list_sort(list(delta) FILTER (WHERE delta IS NOT NULL)) AS ds
         | FROM dl GROUP BY 1)
         |SELECT event_type, n_days,
         | CAST(ds[(len(ds) + 1) // 2] AS BIGINT) AS median_daily_delta
         |FROM a WHERE len(ds) > 0 ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),
    "x264_double_charge_audit" ->
      ("""WITH p0 AS (SELECT user_id, ts, value FROM events
         |  WHERE event_type = 'purchase'
         | UNION ALL
         | SELECT user_id, ts + INTERVAL 60 SECOND, value FROM events
         |  WHERE event_type = 'purchase' AND event_id % 5 = 0),
         |p AS (SELECT user_id, ts,
         |  CAST(ROUND(CAST(value AS DOUBLE) * 100) AS BIGINT) AS c
         | FROM p0 WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |  AND value IS NOT NULL),
         |g AS (SELECT user_id, c,
         |  CAST(FLOOR(epoch(ts)) AS BIGINT) - CAST(FLOOR(epoch(LAG(ts) OVER
         |   (PARTITION BY user_id, c ORDER BY ts))) AS BIGINT) AS gap FROM p),
         |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_suspect_pairs,
         |  CAST(COUNT(DISTINCT c) AS BIGINT) AS n_amounts
         | FROM g WHERE gap IS NOT NULL AND gap <= 300 GROUP BY 1)
         |SELECT user_id, n_suspect_pairs, n_amounts FROM a
         |ORDER BY n_suspect_pairs DESC, user_id LIMIT 10"""
        .stripMargin.replace("\n", " ")),
    "x265_popularity_affinity" ->
      ("""WITH ci AS (SELECT DISTINCT o_custkey AS c, l_partkey AS i
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  WHERE o_custkey IS NOT NULL AND l_partkey IS NOT NULL),
         |pop AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS pop
         |  FROM ci GROUP BY 1),
         |per AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS breadth,
         |  CAST(SUM(pop) AS BIGINT) AS sp FROM ci JOIN pop USING (i)
         |  GROUP BY 1)
         |SELECT breadth AS n_distinct_items,
         | CAST(COUNT(*) AS BIGINT) AS n_customers,
         | CAST(SUM(sp) * 1000 // SUM(breadth) AS BIGINT)
         |   AS avg_item_popularity_milli
         |FROM per GROUP BY 1 ORDER BY n_distinct_items"""
        .stripMargin.replace("\n", " ")),
    "x266_geo_block_join" ->
      ("""WITH pts AS (SELECT c_custkey AS id,
         |  (c_custkey * 48271) % 24000001 AS ulat,
         |  (c_custkey * 69621) % 24000001 AS ulon
         | FROM customer WHERE c_custkey IS NOT NULL),
         |cl AS (SELECT id, ulat, ulon, ulat // 1000000 AS cy,
         |  ulon // 1000000 AS cx FROM pts),
         |rep AS (SELECT id AS b_id, ulat AS b_ulat, ulon AS b_ulon,
         |  cy + dy.d AS cy, cx + dx.d AS cx
         | FROM cl, (SELECT unnest(range(-1, 2)) AS d) dy,
         |  (SELECT unnest(range(-1, 2)) AS d) dx),
         |pr AS (SELECT (a.ulat - r.b_ulat) * (a.ulat - r.b_ulat)
         |    + (a.ulon - r.b_ulon) * (a.ulon - r.b_ulon) AS d2
         | FROM cl a JOIN rep r ON a.cy = r.cy AND a.cx = r.cx
         |  AND a.id < r.b_id),
         |q AS (SELECT d2 FROM pr WHERE d2 <= 250000000000)
         |SELECT CAST(d2 // 10000000000 AS BIGINT) AS dist_band,
         | CAST(COUNT(*) AS BIGINT) AS n_pairs,
         | CAST(MIN(d2) AS BIGINT) AS min_d2, CAST(MAX(d2) AS BIGINT) AS max_d2
         |FROM q GROUP BY 1 ORDER BY dist_band"""
        .stripMargin.replace("\n", " ")),
    "x267_hash_bootstrap_ci" ->
      (s"""WITH v AS (SELECT CAST(o_orderkey AS VARCHAR) AS id,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         | FROM orders WHERE o_orderkey IS NOT NULL
         |  AND o_totalprice IS NOT NULL),
         |rs AS (SELECT id, v, unnest(range(16)) AS g FROM v),
         |hx AS (SELECT v, g, md5(id || '|' || CAST(g AS VARCHAR)) AS x
         |  FROM rs),
         |hh AS (SELECT v, g * 2 AS b,
         |  CAST(('0x' || substr(x, 1, 15)) AS BIGINT) AS h FROM hx
         | UNION ALL SELECT v, g * 2 + 1,
         |  CAST(('0x' || substr(x, 16, 15)) AS BIGINT) FROM hx),
         |mm AS (SELECT v, b, $poissonCaseSql AS m FROM hh),
         |agg AS (SELECT b, CAST(SUM(CAST(m AS HUGEINT) * v) AS HUGEINT) AS s,
         |  CAST(SUM(m) AS BIGINT) AS n FROM mm GROUP BY 1),
         |means AS (SELECT CAST(s // n AS BIGINT) AS mean FROM agg
         |  WHERE n > 0),
         |ms AS (SELECT list_sort(list(mean)) AS arr FROM means),
         |o AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS sv FROM v)
         |SELECT n_rows, CAST(sv // n_rows AS BIGINT) AS mean_cents,
         | CAST(arr[2] AS BIGINT) AS boot_lo_cents,
         | CAST(arr[31] AS BIGINT) AS boot_hi_cents,
         | CAST(32 AS INT) AS n_resamples
         |FROM o, ms""".stripMargin.replace("\n", " ")),
    "x268_bootstrap_ab_diff" ->
      (s"""WITH v AS (SELECT CAST(o_orderkey AS VARCHAR) AS id,
         |  o_custkey % 2 AS a,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         | FROM orders WHERE o_orderkey IS NOT NULL
         |  AND o_totalprice IS NOT NULL AND o_custkey IS NOT NULL),
         |rs AS (SELECT id, a, v, unnest(range(16)) AS g FROM v),
         |hx AS (SELECT a, v, g, md5(id || '|' || CAST(g AS VARCHAR)) AS x
         |  FROM rs),
         |hh AS (SELECT a, v, g * 2 AS b,
         |  CAST(('0x' || substr(x, 1, 15)) AS BIGINT) AS h FROM hx
         | UNION ALL SELECT a, v, g * 2 + 1,
         |  CAST(('0x' || substr(x, 16, 15)) AS BIGINT) FROM hx),
         |mm AS (SELECT a, v, b, $poissonCaseSql AS m FROM hh),
         |agg AS (SELECT b, a, CAST(SUM(CAST(m AS HUGEINT) * v) AS HUGEINT)
         |  AS s, CAST(SUM(m) AS BIGINT) AS n FROM mm GROUP BY 1, 2),
         |means AS (SELECT b, a, CAST(s // n AS BIGINT) AS mean FROM agg
         |  WHERE n > 0),
         |dd AS (SELECT b, MAX(CASE WHEN a = 1 THEN mean END)
         |    - MAX(CASE WHEN a = 0 THEN mean END) AS d
         |  FROM means GROUP BY 1
         |  HAVING MAX(CASE WHEN a = 0 THEN mean END) IS NOT NULL
         |   AND MAX(CASE WHEN a = 1 THEN mean END) IS NOT NULL),
         |ds AS (SELECT list_sort(list(d)) AS arr FROM dd),
         |og AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS cnt,
         |  CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS sv FROM v GROUP BY 1),
         |om AS (SELECT a, cnt, CAST(sv // cnt AS BIGINT) AS mean FROM og),
         |oo AS (SELECT MAX(CASE WHEN a = 0 THEN cnt END) AS n_control,
         |  MAX(CASE WHEN a = 1 THEN cnt END) AS n_treatment,
         |  MAX(CASE WHEN a = 1 THEN mean END)
         |    - MAX(CASE WHEN a = 0 THEN mean END) AS mean_diff_cents
         | FROM om)
         |SELECT CAST(n_control AS BIGINT) AS n_control,
         | CAST(n_treatment AS BIGINT) AS n_treatment,
         | CAST(mean_diff_cents AS BIGINT) AS mean_diff_cents,
         | CAST(arr[2] AS BIGINT) AS boot_lo_cents,
         | CAST(arr[31] AS BIGINT) AS boot_hi_cents,
         | CAST(CASE WHEN arr[2] > 0 OR arr[31] < 0 THEN 1 ELSE 0 END AS INT)
         |   AS significant
         |FROM oo, ds""".stripMargin.replace("\n", " ")),
    "x269_dedup_method_eval" ->
      (s"""WITH ${jaccardCtes(0.5, Some(1000))},
         |sm_w AS (SELECT DISTINCT doc_id, word FROM (SELECT doc_id,
         |  unnest(string_split(text, ' ')) AS word FROM documents) t),
         |sm_h AS (SELECT doc_id,
         |  CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS h FROM sm_w),
         |sm_bits AS (SELECT doc_id, i.i AS i,
         |  CASE WHEN SUM(CASE WHEN (h >> i.i) & 1 = 1 THEN 1 ELSE -1 END) > 0
         |   THEN 1 ELSE 0 END AS bit
         | FROM sm_h CROSS JOIN (SELECT unnest(range(60)) AS i) i
         | GROUP BY doc_id, i.i),
         |sm_fp AS (SELECT doc_id,
         |  CAST(SUM(CAST(bit AS BIGINT) << i) AS BIGINT) AS fp
         | FROM sm_bits GROUP BY doc_id),
         |sm_bands AS (SELECT doc_id, fp, q.q AS q,
         |  (fp >> (q.q * 15)) & 32767 AS slice
         | FROM sm_fp CROSS JOIN (SELECT unnest(range(4)) AS q) q),
         |sm_cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         | FROM sm_bands a JOIN sm_bands b ON a.q = b.q
         |  AND a.slice = b.slice AND a.doc_id < b.doc_id
         | WHERE bit_count(xor(a.fp, b.fp)) <= 3),
         |tr AS (SELECT d1, d2 FROM jpairs),
         |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM sm_cand),
         |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM tr),
         |nh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM sm_cand JOIN tr USING (d1, d2))
         |SELECT n_candidates, n_truth, n_hits,
         | CAST(CASE WHEN n_candidates > 0
         |   THEN n_hits * 1000000 // n_candidates ELSE 0 END AS BIGINT)
         |   AS precision_ppm,
         | CAST(CASE WHEN n_truth > 0 THEN n_hits * 1000000 // n_truth
         |   ELSE 0 END AS BIGINT) AS recall_ppm
         |FROM nc, nt, nh""".stripMargin.replace("\n", " ")),
    "x270_ivf_pq_recall" ->
      (s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
         |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |asg AS (SELECT vec_id, cid FROM (
         |  SELECT e.vec_id, c.cid,
         |   ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |     ORDER BY ${cos2Sql("e.embedding", "c.cemb")} DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
         |probe AS (SELECT cid FROM cent, qv
         |  ORDER BY ${cos2Sql("cemb", "qe")} DESC, cid LIMIT 4),
         |cand AS (SELECT a.vec_id FROM asg a JOIN probe USING (cid)),
         |sp AS (SELECT CAST(unnest(range(4)) AS INT) AS sub),
         |cw AS (SELECT CAST(vec_id AS INT) AS code, sub,
         |    embedding[sub * 16 + 1 : sub * 16 + 16] AS cvec
         |  FROM embeddings, sp WHERE vec_id BETWEEN 1 AND 8),
         |sv AS (SELECT vec_id, sub,
         |    embedding[sub * 16 + 1 : sub * 16 + 16] AS svec
         |  FROM embeddings, sp),
         |dist AS (SELECT vec_id, sv.sub AS sub, code,
         |    round(list_aggregate(list_transform(list_zip(svec, cvec),
         |      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         |         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum'), 9)
         |      AS d
         |  FROM sv JOIN cw ON sv.sub = cw.sub),
         |enc AS (SELECT vec_id, sub, code FROM dist
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |    ORDER BY d, code) = 1),
         |qt AS (SELECT cw.sub AS sub, code,
         |    list_aggregate(list_transform(
         |      list_zip(qe[cw.sub * 16 + 1 : cw.sub * 16 + 16], cvec),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS qdot
         |  FROM cw, qv),
         |adc AS (SELECT vec_id,
         |    CAST(ROUND(CAST(SUM(CAST(qdot AS DECIMAL(28,12))) AS DOUBLE), 6)
         |      AS DOUBLE) AS adc
         |  FROM enc JOIN qt USING (sub, code) JOIN cand USING (vec_id)
         |  GROUP BY vec_id),
         |tp AS (SELECT vec_id FROM adc ORDER BY adc DESC, vec_id LIMIT 10),
         |tr AS (SELECT vec_id FROM embeddings, qv
         |  ORDER BY ROUND($cosSql, 6) DESC, vec_id LIMIT 10),
         |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_scanned FROM cand),
         |ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM embeddings),
         |hh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM tp JOIN tr USING (vec_id))
         |SELECT CAST(10 AS INT) AS k, n_hits,
         | CAST(n_hits * 1000000 // 10 AS BIGINT) AS recall_ppm,
         | n_scanned, CAST(n_scanned * 1000000 // nt AS BIGINT)
         |   AS scan_fraction_ppm
         |FROM hh, ns, ntot""".stripMargin.replace("\n", " ")),
    "x271_transition_dwell_median" ->
      ("""WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |   AND event_id IS NOT NULL AND event_type IS NOT NULL),
         |hp AS (SELECT event_type AS to_type,
         |  LAG(event_type) OVER w AS from_type,
         |  CAST(FLOOR(epoch(ts)) AS BIGINT)
         |    - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) AS gap_sec
         | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |g AS (SELECT from_type, to_type, gap_sec FROM hp
         |  WHERE from_type IS NOT NULL),
         |gv AS (SELECT from_type, to_type, gap_sec,
         |  CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY 1, 2, 3),
         |cum AS (SELECT from_type, to_type, gap_sec,
         |  CAST(SUM(c) OVER (PARTITION BY from_type, to_type
         |    ORDER BY gap_sec) AS BIGINT) AS cw,
         |  CAST(SUM(c) OVER (PARTITION BY from_type, to_type) AS BIGINT)
         |    AS tw FROM gv)
         |SELECT from_type, to_type, CAST(MAX(tw) AS BIGINT) AS n_transitions,
         | CAST(MIN(gap_sec) AS BIGINT) AS median_gap_sec
         |FROM cum WHERE cw * 2 >= tw GROUP BY 1, 2
         |ORDER BY from_type, to_type""".stripMargin.replace("\n", " ")),
    "x272_embedding_outlier_audit" ->
      ("""WITH e AS (SELECT vec_id, label, embedding FROM embeddings
         |  WHERE label IS NOT NULL AND embedding IS NOT NULL),
         |u AS (SELECT vec_id, label, embedding,
         |  unnest(range(len(embedding))) AS i FROM e),
         |c AS (SELECT vec_id, label, CAST(i AS INT) AS dim,
         |  CAST(ROUND(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
         |    * 1000000) AS BIGINT) AS m FROM u),
         |mo AS (SELECT dim, CAST(SUM(CAST(m AS HUGEINT)) AS HUGEINT) AS s1,
         |  CAST(SUM(CAST(m AS HUGEINT) * m) AS HUGEINT) AS s2,
         |  CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY 1),
         |f AS (SELECT vec_id, label,
         |  CASE WHEN (CAST(m AS HUGEINT) * n - s1)
         |      * (CAST(m AS HUGEINT) * n - s1)
         |      > 9 * (s2 * n - s1 * s1) THEN 1 ELSE 0 END AS flag
         | FROM c JOIN mo USING (dim)),
         |a AS (SELECT vec_id, label,
         |  CAST(SUM(flag) AS BIGINT) AS n_flagged_dims
         | FROM f GROUP BY 1, 2)
         |SELECT vec_id, label, n_flagged_dims FROM a
         |WHERE n_flagged_dims > 0
         |ORDER BY n_flagged_dims DESC, vec_id LIMIT 20"""
        .stripMargin.replace("\n", " ")),
    "x273_id_continuity_census" ->
      ("""WITH k AS (SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS k
         |  FROM orders WHERE o_orderkey IS NOT NULL),
         |b AS (SELECT k // 1000 AS blk, CAST(COUNT(*) AS BIGINT) AS present,
         |  CAST(MIN(k) AS BIGINT) AS lo, CAST(MAX(k) AS BIGINT) AS hi
         | FROM k GROUP BY 1),
         |fl AS (SELECT present,
         |  CAST(present * 1000000 // (hi - lo + 1) AS BIGINT) AS fill FROM b),
         |bd AS (SELECT CASE WHEN fill <= 200000 THEN '1_under_20pct'
         |    WHEN fill <= 400000 THEN '2_under_40pct'
         |    WHEN fill <= 600000 THEN '3_under_60pct'
         |    WHEN fill <= 800000 THEN '4_under_80pct'
         |    ELSE '5_over_80pct' END AS band, present, fill FROM fl)
         |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         | CAST(SUM(present) AS BIGINT) AS ids_present,
         | CAST(MIN(fill) AS BIGINT) AS min_fill_ppm,
         | CAST(MAX(fill) AS BIGINT) AS max_fill_ppm
         |FROM bd GROUP BY 1 ORDER BY band""".stripMargin.replace("\n", " ")),
    "x274_discount_lift" ->
      ("""WITH b AS (SELECT
         |  CAST(ROUND(CAST(l_discount AS DOUBLE) * 10000) AS BIGINT)
         |    AS discount_bp,
         |  CAST(ROUND(CAST(l_quantity AS DOUBLE) * 1000) AS BIGINT) AS qm
         | FROM lineitem WHERE l_discount IS NOT NULL
         |  AND l_quantity IS NOT NULL),
         |g AS (SELECT discount_bp, CAST(COUNT(*) AS BIGINT) AS n_lines,
         |  CAST(SUM(qm) // COUNT(*) AS BIGINT) AS avg_qty_milli
         | FROM b GROUP BY 1),
         |z AS (SELECT avg_qty_milli AS base FROM g WHERE discount_bp = 0)
         |SELECT discount_bp, n_lines, avg_qty_milli,
         | CAST(avg_qty_milli * 1000000 // base - 1000000 AS BIGINT)
         |   AS lift_ppm
         |FROM g, z ORDER BY discount_bp""".stripMargin.replace("\n", " ")),
    "x275_effective_branching" ->
      ("""WITH tk AS (SELECT source, list_filter(string_split(text, ' '),
         |    t -> length(t) > 0) AS ts FROM documents
         |  WHERE text IS NOT NULL AND source IS NOT NULL),
         |ix AS (SELECT source, ts, unnest(range(len(ts) - 1)) AS i
         |  FROM tk WHERE len(ts) >= 2),
         |bg AS (SELECT source, ts[CAST(i AS INT) + 1] AS w,
         |  ts[CAST(i AS INT) + 2] AS v FROM ix),
         |bc AS (SELECT source, w, v, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM bg GROUP BY 1, 2, 3),
         |pw AS (SELECT source, w, CAST(SUM(n) AS BIGINT) AS nw,
         |  CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS sq
         | FROM bc GROUP BY 1, 2),
         |pe AS (SELECT source, nw,
         |  CAST(CAST(nw AS HUGEINT) * nw * 1000 // sq AS BIGINT) AS eff
         | FROM pw)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_prefix_words,
         | CAST(SUM(nw) AS BIGINT) AS n_bigrams,
         | CAST(SUM(CAST(nw AS HUGEINT) * eff) // SUM(nw) AS BIGINT)
         |   AS eff_branching_milli
         |FROM pe GROUP BY 1 ORDER BY source"""
        .stripMargin.replace("\n", " ")),
    "x276_child_numbering_audit" ->
      ("""WITH per AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(DISTINCT l_linenumber) AS BIGINT) AS nd,
         |  CAST(MIN(l_linenumber) AS BIGINT) AS mn,
         |  CAST(MAX(l_linenumber) AS BIGINT) AS mx
         | FROM lineitem WHERE l_orderkey IS NOT NULL
         |  AND l_linenumber IS NOT NULL GROUP BY 1),
         |k AS (SELECT CASE WHEN nd < n THEN '1_dup_seq'
         |    WHEN mn <> 1 THEN '2_bad_start'
         |    WHEN mx <> n THEN '3_gap'
         |    ELSE '0_dense' END AS kind, n FROM per),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM per)
         |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_parents,
         | CAST(SUM(n) AS BIGINT) AS n_children,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM k, t GROUP BY kind, tt ORDER BY kind"""
        .stripMargin.replace("\n", " ")),
    "x277_order_collision_census" ->
      ("""WITH orders2 AS (SELECT o_custkey, o_orderdate, o_totalprice
         |  FROM orders
         | UNION ALL
         | SELECT o_custkey + 1, o_orderdate, o_totalprice FROM orders
         |  WHERE o_orderkey % 101 = 0),
         |g AS (SELECT CAST(o_orderdate AS DATE) AS d,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nc
         | FROM orders2 WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
         |  AND o_totalprice IS NOT NULL
         | GROUP BY 1, 2 HAVING COUNT(DISTINCT o_custkey) > 1)
         |SELECT nc AS n_customers,
         | CAST(COUNT(*) AS BIGINT) AS n_collision_groups,
         | CAST(SUM(n) AS BIGINT) AS n_orders
         |FROM g GROUP BY 1 ORDER BY n_customers"""
        .stripMargin.replace("\n", " ")),
    "x278_checkpoint_restart" ->
      ("""SELECT event_type, COUNT(*) AS n,
         | CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
         | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),
    "x279_ann_fusion_eval" ->
      (s"""WITH ${hyperplaneCtes()},
         |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |truth AS (SELECT vec_id FROM embeddings, qv
         |  ORDER BY ROUND($cosSql, 6) DESC, vec_id LIMIT 10),
         |m_sign AS (SELECT vec_id, ROUND($cosSql, 6) AS sim
         |  FROM embeddings, qv
         |  WHERE ${signBucketSql("embedding")} = ${signBucketSql("qe")}
         |  ORDER BY sim DESC, vec_id LIMIT 10),
         |cand AS (SELECT DISTINCT a.vec_id
         |  FROM hpkeys a JOIN hpkeys q ON a.band = q.band AND a.bkey = q.bkey
         |  WHERE q.vec_id = 0),
         |m_band AS (SELECT e.vec_id,
         |  ROUND(${cos2Sql("e.embedding", "qe")}, 6) AS sim
         |  FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id, qv
         |  ORDER BY sim DESC, e.vec_id LIMIT 10),
         |cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
         |asg AS (SELECT vec_id, embedding, cid FROM (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |   ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |     ORDER BY ${cos2Sql("e.embedding", "c.cemb")} DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
         |probe AS (SELECT cid FROM cent, qv
         |  ORDER BY ${cos2Sql("cemb", "qe")} DESC, cid LIMIT 4),
         |m_ivf AS (SELECT a.vec_id,
         |  ROUND(${cos2Sql("a.embedding", "qe")}, 6) AS sim
         |  FROM asg a JOIN probe USING (cid), qv
         |  ORDER BY sim DESC, a.vec_id LIMIT 10),
         |r1 AS (SELECT vec_id, CAST(ROW_NUMBER() OVER
         |  (ORDER BY sim DESC, vec_id) AS BIGINT) AS rk FROM m_band),
         |r2 AS (SELECT vec_id, CAST(ROW_NUMBER() OVER
         |  (ORDER BY sim DESC, vec_id) AS BIGINT) AS rk FROM m_ivf),
         |r3 AS (SELECT vec_id, CAST(ROW_NUMBER() OVER
         |  (ORDER BY sim DESC, vec_id) AS BIGINT) AS rk FROM m_sign),
         |uf AS (SELECT vec_id, 1000000000 // (60 + rk) AS c FROM r1
         | UNION ALL SELECT vec_id, 1000000000 // (60 + rk) FROM r2
         | UNION ALL SELECT vec_id, 1000000000 // (60 + rk) FROM r3),
         |fs AS (SELECT vec_id, CAST(SUM(c) AS BIGINT) AS s FROM uf
         |  GROUP BY 1),
         |m_fus AS (SELECT vec_id FROM fs ORDER BY s DESC, vec_id LIMIT 10)
         |SELECT * FROM (
         | SELECT 'banded_lsh' AS method, CAST(10 AS INT) AS k,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_band JOIN truth USING (vec_id))
         |   AS n_hits,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_band JOIN truth USING (vec_id))
         |   * 1000000 // 10 AS recall_ppm
         | UNION ALL SELECT 'ivf', 10,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_ivf JOIN truth USING (vec_id)),
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_ivf JOIN truth USING (vec_id))
         |   * 1000000 // 10
         | UNION ALL SELECT 'sign_bucket', 10,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_sign JOIN truth USING (vec_id)),
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_sign JOIN truth USING (vec_id))
         |   * 1000000 // 10
         | UNION ALL SELECT 'rrf_fusion', 10,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_fus JOIN truth USING (vec_id)),
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM m_fus JOIN truth USING (vec_id))
         |   * 1000000 // 10)
         |ORDER BY method""".stripMargin.replace("\n", " ")),
    "x280_diverse_topk" ->
      (s"""WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |s AS (SELECT vec_id, label, ROUND($cosSql, 6) AS sim
         |  FROM embeddings, qv WHERE label IS NOT NULL),
         |r AS (SELECT vec_id, label, sim FROM s
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY label
         |    ORDER BY sim DESC, vec_id) <= 2)
         |SELECT vec_id, label, sim FROM r
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin.replace("\n", " ")),
    "x281_cohort_value_curve" ->
      ("""WITH e AS (SELECT user_id, ts, event_type, value FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |fw AS (SELECT user_id,
         |  CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
         | FROM e GROUP BY user_id),
         |p AS (SELECT e.user_id, e.ts, e.value, f.cohort_week
         |  FROM e JOIN fw f ON e.user_id = f.user_id
         |  WHERE e.event_type = 'purchase' AND e.value IS NOT NULL)
         |SELECT cohort_week,
         | CAST(date_diff('day', cohort_week,
         |   CAST(date_trunc('week', ts) AS DATE)) // 7 AS INT) AS week_offset,
         | CAST(COUNT(*) AS BIGINT) AS n_purchases,
         | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_total
         |FROM p GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""
        .stripMargin.replace("\n", " ")),
    "x282_boilerplate_mass" ->
      ("""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
         |  FROM documents WHERE source IS NOT NULL),
         |s AS (SELECT doc_id, source,
         |  unnest(range(0, len(ws), 10)) AS st, ws FROM w),
         |ch AS (SELECT doc_id, source,
         |  md5(array_to_string(ws[st+1 : st+10], ' ')) AS h,
         |  len(ws[st+1 : st+10]) AS n_tokens FROM s),
         |df AS (SELECT h, COUNT(DISTINCT doc_id) AS d FROM ch GROUP BY h)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         | CAST(SUM(CASE WHEN d >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS bp_chunks,
         | CAST(SUM(CASE WHEN d >= 3 THEN 1 ELSE 0 END) * 1000000
         |   // COUNT(*) AS BIGINT) AS bp_chunk_ppm,
         | CAST(SUM(CASE WHEN d >= 3 THEN n_tokens ELSE 0 END) * 1000000
         |   // SUM(n_tokens) AS BIGINT) AS bp_token_ppm
         |FROM ch JOIN df USING (h)
         |GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")),
    "x283_spend_trajectory" ->
      ("""WITH o AS (SELECT o_custkey AS c, o_orderdate AS d,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         | FROM orders WHERE o_custkey IS NOT NULL
         |  AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL),
         |r AS (SELECT c, v, CAST(ROW_NUMBER() OVER
         |  (PARTITION BY c ORDER BY d, v) AS BIGINT) AS x FROM o),
         |m AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(x) AS BIGINT) AS sx,
         |  CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS sy,
         |  CAST(SUM(CAST(x AS HUGEINT) * v) AS HUGEINT) AS sxy
         | FROM r GROUP BY 1 HAVING COUNT(*) >= 3),
         |k AS (SELECT CASE
         |   WHEN CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy > 0
         |     THEN '1_rising'
         |   WHEN CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy < 0
         |     THEN '2_falling'
         |   ELSE '3_flat' END AS trajectory, n FROM m),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM m)
         |SELECT trajectory, CAST(COUNT(*) AS BIGINT) AS n_customers,
         | CAST(SUM(n) AS BIGINT) AS n_orders,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM k, t GROUP BY trajectory, tt ORDER BY trajectory"""
        .stripMargin.replace("\n", " ")),
    "x284_ks_distance" ->
      ("""WITH v AS (SELECT o_custkey % 2 AS a,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         | FROM orders WHERE o_custkey IS NOT NULL
         |  AND o_totalprice IS NOT NULL),
         |g AS (SELECT v, CAST(SUM(CASE WHEN a = 0 THEN 1 ELSE 0 END)
         |   AS BIGINT) AS ca,
         |  CAST(SUM(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
         | FROM v GROUP BY 1),
         |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
         |  CAST(SUM(cb) AS BIGINT) AS nb FROM g),
         |c AS (SELECT v, CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
         |  CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cumb FROM g),
         |gp AS (SELECT v, CAST(abs(CAST(cuma AS HUGEINT) * nb
         |    - CAST(cumb AS HUGEINT) * na) * 1000000
         |    // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS gap
         |  FROM c, t),
         |mx AS (SELECT MAX(gap) AS ks FROM gp)
         |SELECT t.na AS n_control, t.nb AS n_treatment,
         | CAST(mx.ks AS BIGINT) AS ks_ppm,
         | (SELECT CAST(MIN(v) AS BIGINT) FROM gp, mx WHERE gap = mx.ks)
         |   AS ks_at_value
         |FROM t, mx""".stripMargin.replace("\n", " ")),
    "x285_neyman_allocation" ->
      ("""WITH s AS (SELECT c_mktsegment,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         | FROM orders JOIN customer ON o_custkey = c_custkey
         | WHERE c_mktsegment IS NOT NULL AND o_totalprice IS NOT NULL),
         |m AS (SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CAST(v AS HUGEINT)) AS HUGEINT) AS s1,
         |  CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS s2
         | FROM s GROUP BY 1),
         |w AS (SELECT c_mktsegment, n_rows,
         |  CAST(FLOOR(SQRT(CAST(CAST(n_rows AS HUGEINT) * s2 - s1 * s1
         |    AS DOUBLE))) AS BIGINT) AS weight FROM m),
         |tt AS (SELECT CAST(SUM(weight) AS BIGINT) AS tw FROM w),
         |b AS (SELECT c_mktsegment, n_rows, weight,
         |  CAST(CAST(weight AS HUGEINT) * 1000 // tw AS BIGINT) AS base,
         |  CAST(CAST(weight AS HUGEINT) * 1000 % tw AS BIGINT) AS rem
         | FROM w, tt),
         |sl AS (SELECT CAST(1000 - SUM(base) AS BIGINT) AS slots FROM b),
         |p AS (SELECT b.*, CAST(ROW_NUMBER() OVER
         |  (ORDER BY rem DESC, c_mktsegment) AS BIGINT) AS pri FROM b)
         |SELECT c_mktsegment, n_rows, weight,
         | CAST(base + CASE WHEN pri <= slots THEN 1 ELSE 0 END AS BIGINT)
         |   AS alloc
         |FROM p, sl ORDER BY c_mktsegment""".stripMargin.replace("\n", " ")),
    "x286_discriminative_terms" ->
      (s"""WITH $qualityCtes,
         |fl AS (SELECT d.doc_id, d.text,
         |  CASE WHEN q.score >= 0.5 THEN 1 ELSE 0 END AS hi
         | FROM documents d JOIN qscore q ON d.doc_id = q.doc_id
         | WHERE d.text IS NOT NULL),
         |n AS (SELECT CAST(SUM(hi) AS BIGINT) AS nh,
         |  CAST(SUM(1 - hi) AS BIGINT) AS nl FROM fl),
         |td AS (SELECT DISTINCT doc_id, hi, term FROM
         |  (SELECT doc_id, hi, unnest(string_split(text, ' ')) AS term
         |   FROM fl) t WHERE length(term) > 0),
         |tf AS (SELECT term, CAST(SUM(hi) AS BIGINT) AS df_high,
         |  CAST(SUM(1 - hi) AS BIGINT) AS df_low FROM td GROUP BY 1)
         |SELECT term, df_high, df_low,
         | CAST(CAST(df_high + 1 AS HUGEINT) * (nl + 1) * 1000
         |   // (CAST(df_low + 1 AS HUGEINT) * (nh + 1)) AS BIGINT)
         |   AS odds_milli
         |FROM tf, n ORDER BY odds_milli DESC, term LIMIT 20"""
        .stripMargin.replace("\n", " ")),
    "x287_ts_collision_census" ->
      ("""WITH per AS (SELECT ts, CAST(COUNT(*) AS BIGINT) AS n FROM events
         |  WHERE ts IS NOT NULL GROUP BY 1),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS rows_total FROM per),
         |b AS (SELECT CAST(length(format('{:b}', n)) - 1 AS INT) AS size_band,
         |  n FROM per)
         |SELECT size_band,
         | CAST(CAST(1 AS BIGINT) << size_band AS BIGINT) AS band_lo,
         | CAST(COUNT(*) AS BIGINT) AS n_timestamps,
         | CAST(SUM(n) AS BIGINT) AS n_events,
         | CAST(SUM(n) * 1000000 // rows_total AS BIGINT) AS event_share_ppm
         |FROM b, t GROUP BY size_band, rows_total ORDER BY size_band"""
        .stripMargin.replace("\n", " ")),
    "x288_lifetime_span_histogram" ->
      ("""WITH per AS (SELECT user_id,
         |  CAST(date_diff('day', MIN(CAST(ts AS DATE)),
         |    MAX(CAST(ts AS DATE))) AS BIGINT) AS span
         | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
         | GROUP BY 1),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS u FROM per),
         |b AS (SELECT CASE WHEN span = 0 THEN -1
         |  ELSE CAST(length(format('{:b}', span)) - 1 AS INT) END AS span_band,
         |  span FROM per)
         |SELECT CAST(span_band AS INT) AS span_band,
         | CAST(COUNT(*) AS BIGINT) AS n_users,
         | CAST(MIN(span) AS BIGINT) AS min_days,
         | CAST(MAX(span) AS BIGINT) AS max_days,
         | CAST(COUNT(*) * 1000000 // u AS BIGINT) AS user_share_ppm
         |FROM b, t GROUP BY span_band, u ORDER BY span_band"""
        .stripMargin.replace("\n", " ")),
    "x289_qq_decile_table" ->
      ("""WITH v AS (SELECT o_custkey % 2 AS a,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         | FROM orders WHERE o_custkey IS NOT NULL
         |  AND o_totalprice IS NOT NULL),
         |g AS (SELECT a, v, CAST(COUNT(*) AS BIGINT) AS c FROM v
         |  GROUP BY 1, 2),
         |cc AS (SELECT a, v, CAST(SUM(c) OVER
         |   (PARTITION BY a ORDER BY v) AS BIGINT) AS cum FROM g),
         |n AS (SELECT a, CAST(SUM(c) AS BIGINT) AS n FROM g GROUP BY 1),
         |d AS (SELECT cc.a, dd.d AS decile, MIN(cc.v) AS dv
         |  FROM cc JOIN n USING (a),
         |   (SELECT unnest(range(1, 10)) AS d) dd
         |  WHERE cc.cum * 10 >= dd.d * n.n GROUP BY 1, 2)
         |SELECT c.decile AS decile, CAST(c.dv AS BIGINT) AS v_control,
         | CAST(t.dv AS BIGINT) AS v_treatment,
         | CAST(t.dv - c.dv AS BIGINT) AS gap_cents
         |FROM (SELECT * FROM d WHERE a = 0) c
         | JOIN (SELECT * FROM d WHERE a = 1) t USING (decile)
         |ORDER BY decile""".stripMargin.replace("\n", " ")),
    "x290_split_shipment_census" ->
      ("""WITH per AS (SELECT l_orderkey,
         |  CAST(COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS BIGINT) AS nd,
         |  CAST(date_diff('day', MIN(CAST(l_shipdate AS DATE)),
         |    MAX(CAST(l_shipdate AS DATE))) AS BIGINT) AS span
         | FROM lineitem WHERE l_orderkey IS NOT NULL
         |  AND l_shipdate IS NOT NULL GROUP BY 1),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM per)
         |SELECT nd AS n_ship_dates, CAST(COUNT(*) AS BIGINT) AS n_orders,
         | CAST(SUM(span) * 1000 // COUNT(*) AS BIGINT) AS avg_span_millidays,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS order_share_ppm
         |FROM per, t GROUP BY nd, tt ORDER BY n_ship_dates"""
        .stripMargin.replace("\n", " ")),
    "x291_source_centroid_similarity" ->
      ("""WITH br AS (SELECT d.source, e.embedding FROM embeddings e
         |  JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE d.source IS NOT NULL AND e.embedding IS NOT NULL),
         |u AS (SELECT source, embedding,
         |  unnest(range(len(embedding))) AS i FROM br),
         |c AS (SELECT source, CAST(i AS INT) AS dim,
         |  CAST(ROUND(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE)
         |    * 1000000) AS BIGINT) AS m FROM u),
         |s AS (SELECT source, dim, CAST(SUM(m) AS BIGINT) AS sv
         |  FROM c GROUP BY 1, 2),
         |nr AS (SELECT source, CAST(SUM(CAST(sv AS HUGEINT) * sv) AS HUGEINT)
         |  AS n2 FROM s GROUP BY 1),
         |dt AS (SELECT a.source AS source_1, b.source AS source_2,
         |  CAST(SUM(CAST(a.sv AS HUGEINT) * b.sv) AS HUGEINT) AS dot
         | FROM s a JOIN s b ON a.dim = b.dim AND a.source < b.source
         | GROUP BY 1, 2)
         |SELECT source_1, source_2,
         | ROUND(CAST(dot AS DOUBLE)
         |   / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))), 6)
         |   AS centroid_cosine
         |FROM dt JOIN nr na ON dt.source_1 = na.source
         | JOIN nr nb ON dt.source_2 = nb.source
         |ORDER BY centroid_cosine DESC, source_1, source_2 LIMIT 20"""
        .stripMargin.replace("\n", " ")),
    "x292_outage_streaks" ->
      ("""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS d FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL),
         |sp AS (SELECT CAST(MIN(d) AS DATE) AS lo, CAST(MAX(d) AS DATE) AS hi
         |  FROM e),
         |days AS (SELECT CAST(unnest(generate_series(lo, hi,
         |  INTERVAL 1 DAY)) AS DATE) AS d FROM sp),
         |ty AS (SELECT DISTINCT event_type FROM e),
         |dc AS (SELECT event_type, d, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM e GROUP BY 1, 2),
         |grid AS (SELECT ty.event_type, days.d, dc.n IS NULL AS dark
         | FROM ty CROSS JOIN days
         |  LEFT JOIN dc ON dc.event_type = ty.event_type AND dc.d = days.d),
         |rk AS (SELECT event_type, d, dark,
         |  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS i,
         |  ROW_NUMBER() OVER (PARTITION BY event_type, dark ORDER BY d) AS j
         | FROM grid),
         |rn AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS len
         | FROM rk WHERE dark GROUP BY event_type, i - j),
         |agg AS (SELECT event_type, CAST(SUM(len) AS BIGINT) AS n_dark_days,
         |  CAST(MAX(len) AS BIGINT) AS max_dark_streak FROM rn GROUP BY 1)
         |SELECT ty.event_type,
         | CAST(date_diff('day', sp.lo, sp.hi) + 1 AS BIGINT) AS n_days,
         | CAST(COALESCE(agg.n_dark_days, 0) AS BIGINT) AS n_dark_days,
         | CAST(COALESCE(agg.max_dark_streak, 0) AS BIGINT) AS max_dark_streak
         |FROM ty LEFT JOIN agg ON ty.event_type = agg.event_type, sp
         |ORDER BY ty.event_type""".stripMargin.replace("\n", " ")),
    "x293_cadence_dispersion" ->
      ("""WITH g AS (SELECT user_id,
         |  CAST(FLOOR(epoch(ts)) AS BIGINT) - CAST(FLOOR(epoch(LAG(ts) OVER
         |   (PARTITION BY user_id ORDER BY ts))) AS BIGINT) AS gp
         | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |m AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CAST(gp AS HUGEINT)) AS HUGEINT) AS s,
         |  CAST(SUM(CAST(gp AS HUGEINT) * gp) AS HUGEINT) AS q
         | FROM g WHERE gp IS NOT NULL GROUP BY 1 HAVING COUNT(*) >= 4),
         |k AS (SELECT CASE
         |   WHEN CAST(n AS HUGEINT) * q - s * s
         |     > 2 * CAST(n AS HUGEINT) * s THEN '1_bursty'
         |   WHEN 2 * (CAST(n AS HUGEINT) * q - s * s)
         |     < CAST(n AS HUGEINT) * s THEN '3_metronomic'
         |   ELSE '2_poisson_like' END AS cadence, n FROM m),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM m)
         |SELECT cadence, CAST(COUNT(*) AS BIGINT) AS n_users,
         | CAST(SUM(n) AS BIGINT) AS n_gaps,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS user_share_ppm
         |FROM k, t GROUP BY cadence, tt ORDER BY cadence"""
        .stripMargin.replace("\n", " ")),
    "x294_feature_propensity" ->
      ("""WITH e AS (SELECT CAST(REGEXP_EXTRACT(props, '"k":\s*(-?\d+)', 1)
         |    AS INT) AS k, event_type
         | FROM events WHERE props IS NOT NULL),
         |b AS (SELECT k // 10 AS k_band, event_type FROM e
         |  WHERE k IS NOT NULL)
         |SELECT CAST(k_band AS INT) AS k_band,
         | CAST(COUNT(*) AS BIGINT) AS n_events,
         | CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_purchases,
         | CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |   * 1000000 // COUNT(*) AS BIGINT) AS purchase_ppm
         |FROM b GROUP BY 1 ORDER BY k_band""".stripMargin.replace("\n", " ")),
    "x295_dedup_quality_uplift" ->
      (s"""WITH $clusterCtes, $qualityCtes,
         |sc AS (SELECT doc_id, CAST(ROUND(score * 1000) AS BIGINT) AS q
         |  FROM qscore),
         |lab AS (SELECT q2.doc_id, COALESCE(l.label, q2.doc_id) AS cluster,
         |  q2.score FROM qscore q2 LEFT JOIN l3 l ON l.node = q2.doc_id),
         |r AS (SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY cluster
         |  ORDER BY score DESC, doc_id) AS rn FROM lab),
         |kept AS (SELECT doc_id FROM r WHERE rn = 1),
         |f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(q) // COUNT(*) AS BIGINT) AS mean_quality_milli FROM sc),
         |k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_retained,
         |  CAST(SUM(q) // COUNT(*) AS BIGINT) AS retained_quality_milli
         | FROM sc JOIN kept USING (doc_id))
         |SELECT n_docs, mean_quality_milli, n_retained,
         | retained_quality_milli,
         | CAST(retained_quality_milli - mean_quality_milli AS BIGINT)
         |   AS uplift_milli
         |FROM f, k""".stripMargin.replace("\n", " ")),
    "x296_rhythm_similarity" ->
      ("""WITH p AS (SELECT event_type AS t, CAST(hour(ts) AS INT) AS h,
         |  CAST(COUNT(*) AS BIGINT) AS n FROM events
         | WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
         |nr AS (SELECT t, CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT)
         |  AS n2 FROM p GROUP BY 1),
         |dt AS (SELECT a.t AS type_1, b.t AS type_2,
         |  CAST(SUM(CAST(a.n AS HUGEINT) * b.n) AS HUGEINT) AS dot
         | FROM p a JOIN p b ON a.h = b.h AND a.t < b.t GROUP BY 1, 2)
         |SELECT type_1, type_2,
         | ROUND(CAST(dot AS DOUBLE)
         |  / (SQRT(CAST(na.n2 AS DOUBLE)) * SQRT(CAST(nb.n2 AS DOUBLE))), 6)
         |  AS rhythm_cosine
         |FROM dt JOIN nr na ON dt.type_1 = na.t
         | JOIN nr nb ON dt.type_2 = nb.t
         |ORDER BY type_1, type_2""".stripMargin.replace("\n", " ")),
    "x297_temporal_order_audit" ->
      ("""WITH j AS (SELECT date_diff('day', CAST(l_shipdate AS DATE),
         |  CAST(o_orderdate AS DATE)) AS lead FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | WHERE l_orderkey IS NOT NULL AND l_shipdate IS NOT NULL
         |  AND o_orderkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM j),
         |b AS (SELECT CASE WHEN lead <= 0 THEN '0_ok'
         |   WHEN lead < 7 THEN '1_under_week_early'
         |   ELSE '2_week_plus_early' END AS band, lead FROM j)
         |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_children,
         | CAST(MAX(lead) AS BIGINT) AS worst_lead_days,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM b, t GROUP BY band, tt ORDER BY band"""
        .stripMargin.replace("\n", " ")),
    "x298_basket_confidence" ->
      ("""WITH i AS (SELECT DISTINCT l_orderkey AS b, p_brand AS it
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |w AS (SELECT b, it, COUNT(*) OVER (PARTITION BY b) AS wdt FROM i),
         |f AS (SELECT b, it FROM w WHERE wdt <= 100),
         |ic AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS ni FROM i GROUP BY 1),
         |pr AS (SELECT a.it AS item1, c.it AS item2 FROM f a JOIN f c
         |  ON a.b = c.b AND a.it < c.it),
         |tp AS (SELECT item1, item2, CAST(COUNT(*) AS BIGINT) AS support
         |  FROM pr GROUP BY 1, 2 HAVING COUNT(*) >= 2
         |  ORDER BY support DESC, item1, item2 LIMIT 20)
         |SELECT item1, item2, support,
         | CAST(support * 1000000 // n1.ni AS BIGINT) AS conf_1_to_2_ppm,
         | CAST(support * 1000000 // n2.ni AS BIGINT) AS conf_2_to_1_ppm
         |FROM tp JOIN ic n1 ON tp.item1 = n1.it
         | JOIN ic n2 ON tp.item2 = n2.it
         |ORDER BY support DESC, item1, item2"""
        .stripMargin.replace("\n", " ")),
    "x299_brand_return_rate" ->
      ("""SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
         | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_returned,
         | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |   * 1000000 // COUNT(*) AS BIGINT) AS return_ppm
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_brand IS NOT NULL AND l_returnflag IS NOT NULL
         |GROUP BY p_brand HAVING COUNT(*) >= 100
         |ORDER BY return_ppm DESC, p_brand LIMIT 15"""
        .stripMargin.replace("\n", " ")),
    "x300_ivf_pq_rerank" ->
      (s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
         |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |asg AS (SELECT vec_id, cid FROM (
         |  SELECT e.vec_id, c.cid,
         |   ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |     ORDER BY ${cos2Sql("e.embedding", "c.cemb")} DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
         |probe AS (SELECT cid FROM cent, qv
         |  ORDER BY ${cos2Sql("cemb", "qe")} DESC, cid LIMIT 4),
         |cand AS (SELECT a.vec_id FROM asg a JOIN probe USING (cid)),
         |sp AS (SELECT CAST(unnest(range(4)) AS INT) AS sub),
         |cw AS (SELECT CAST(vec_id AS INT) AS code, sub,
         |    embedding[sub * 16 + 1 : sub * 16 + 16] AS cvec
         |  FROM embeddings, sp WHERE vec_id BETWEEN 1 AND 8),
         |sv AS (SELECT vec_id, sub,
         |    embedding[sub * 16 + 1 : sub * 16 + 16] AS svec
         |  FROM embeddings, sp),
         |dist AS (SELECT vec_id, sv.sub AS sub, code,
         |    round(list_aggregate(list_transform(list_zip(svec, cvec),
         |      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         |         * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum'), 9)
         |      AS d
         |  FROM sv JOIN cw ON sv.sub = cw.sub),
         |enc AS (SELECT vec_id, sub, code FROM dist
         |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, sub
         |    ORDER BY d, code) = 1),
         |qt AS (SELECT cw.sub AS sub, code,
         |    list_aggregate(list_transform(
         |      list_zip(qe[cw.sub * 16 + 1 : cw.sub * 16 + 16], cvec),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS qdot
         |  FROM cw, qv),
         |adc AS (SELECT vec_id,
         |    CAST(ROUND(CAST(SUM(CAST(qdot AS DECIMAL(28,12))) AS DOUBLE), 6)
         |      AS DOUBLE) AS adc
         |  FROM enc JOIN qt USING (sub, code) JOIN cand USING (vec_id)
         |  GROUP BY vec_id),
         |pool AS (SELECT vec_id FROM adc ORDER BY adc DESC, vec_id LIMIT 50),
         |rr AS (SELECT e.vec_id
         |  FROM embeddings e JOIN pool USING (vec_id), qv
         |  ORDER BY ROUND(${cos2Sql("e.embedding", "qe")}, 6) DESC, e.vec_id
         |  LIMIT 10),
         |tr AS (SELECT vec_id FROM embeddings, qv
         |  ORDER BY ROUND($cosSql, 6) DESC, vec_id LIMIT 10),
         |hh AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM rr JOIN tr USING (vec_id))
         |SELECT CAST(10 AS INT) AS k, CAST(50 AS INT) AS rerank_pool,
         | n_hits, CAST(n_hits * 1000000 // 10 AS BIGINT) AS recall_ppm
         |FROM hh""".stripMargin.replace("\n", " ")),
    "x301_conversion_by_depth" ->
      ("""WITH o AS (SELECT user_id, ts, event_type,
         |  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
         | FROM events),
         |s AS (SELECT *, CASE WHEN prev_ts IS NULL
         |  OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END
         |  AS new_sess FROM o),
         |sid AS (SELECT *, SUM(new_sess) OVER
         |  (PARTITION BY user_id ORDER BY ts) AS session_id FROM s),
         |sess AS (SELECT user_id, session_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_events,
         |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
         | FROM sid GROUP BY user_id, session_id),
         |b AS (SELECT CAST(length(format('{:b}', n_events)) - 1 AS INT)
         |  AS depth_band, conv FROM sess)
         |SELECT depth_band, CAST(COUNT(*) AS BIGINT) AS n_sessions,
         | CAST(SUM(conv) AS BIGINT) AS n_converted,
         | CAST(SUM(conv) * 1000000 // COUNT(*) AS BIGINT) AS conversion_ppm
         |FROM b GROUP BY 1 ORDER BY depth_band"""
        .stripMargin.replace("\n", " ")),
    "x302_top_decile_retention" ->
      ("""WITH sp AS (SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE)
         |  AS q, o_custkey AS cust,
         |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT)) AS BIGINT) AS v
         | FROM orders WHERE o_custkey IS NOT NULL
         |  AND o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
         | GROUP BY 1, 2),
         |vals AS (SELECT q, v, CAST(COUNT(*) AS BIGINT) AS c FROM sp
         |  GROUP BY 1, 2),
         |nn AS (SELECT q, CAST(SUM(c) AS BIGINT) AS n FROM vals GROUP BY 1),
         |cc AS (SELECT q, v, CAST(SUM(c) OVER
         |  (PARTITION BY q ORDER BY v) AS BIGINT) AS cum FROM vals),
         |cut AS (SELECT cc.q, CAST(MIN(v) AS BIGINT) AS cutv
         |  FROM cc JOIN nn USING (q) WHERE cum * 10 >= n * 9 GROUP BY 1),
         |top AS (SELECT sp.q, sp.cust FROM sp
         |  JOIN cut ON sp.q = cut.q AND sp.v >= cut.cutv),
         |ret AS (SELECT t.q, CAST(COUNT(*) AS BIGINT) AS n_retained
         | FROM top t JOIN top t2
         |  ON t2.q = CAST(t.q + INTERVAL 3 MONTH AS DATE)
         |   AND t2.cust = t.cust GROUP BY 1),
         |pc AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS ntop FROM top
         |  GROUP BY 1),
         |nx AS (SELECT DISTINCT CAST(q - INTERVAL 3 MONTH AS DATE) AS q
         |  FROM top)
         |SELECT pc.q AS quarter, ntop AS n_top_decile,
         | CAST(COALESCE(n_retained, 0) AS BIGINT) AS n_retained,
         | CAST(COALESCE(n_retained, 0) * 1000000 // ntop AS BIGINT)
         |   AS retention_ppm
         |FROM pc JOIN nx ON pc.q = nx.q
         | LEFT JOIN ret ON pc.q = ret.q
         |ORDER BY quarter""".stripMargin.replace("\n", " ")),
    "x303_token_budget_matrix" ->
      (s"""WITH $qualityCtes,
         |b AS (SELECT d.lang,
         |  CASE WHEN q.score >= 0.5 THEN 'hi' ELSE 'lo' END AS quality_band,
         |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS tok
         | FROM documents d JOIN qscore q ON d.doc_id = q.doc_id
         | WHERE d.lang IS NOT NULL AND d.text IS NOT NULL),
         |m AS (SELECT lang, quality_band, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(tok) AS BIGINT) AS n_tokens FROM b GROUP BY 1, 2),
         |t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM m)
         |SELECT lang, quality_band, n_docs, n_tokens,
         | CAST(n_tokens * 1000000 // tt AS BIGINT) AS token_share_ppm
         |FROM m, t ORDER BY lang, quality_band"""
        .stripMargin.replace("\n", " ")),
    "x304_embedding_coverage" ->
      ("""SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_with_vec,
         | CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
         |   * 1000000 // COUNT(*) AS BIGINT) AS coverage_ppm
         |FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
         |WHERE d.source IS NOT NULL
         |GROUP BY d.source ORDER BY d.source"""
        .stripMargin.replace("\n", " ")),
    "x305_arpu_trend" ->
      ("""WITH e AS (SELECT user_id, ts, event_type, value FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |mau AS (SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau FROM e GROUP BY 1),
         |rev AS (SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
         |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
         |  CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE) * 100) AS BIGINT))
         |    AS BIGINT) AS rev_cents
         | FROM e WHERE event_type = 'purchase' AND value IS NOT NULL
         | GROUP BY 1)
         |SELECT mau.month, mau.mau,
         | CAST(COALESCE(n_purchases, 0) AS BIGINT) AS n_purchases,
         | CAST(COALESCE(rev_cents, 0) AS BIGINT) AS rev_cents,
         | CAST(COALESCE(rev_cents, 0) * 1000 // mau AS BIGINT)
         |   AS arpu_millicents
         |FROM mau LEFT JOIN rev ON mau.month = rev.month
         |ORDER BY mau.month""".stripMargin.replace("\n", " ")),
    "x306_new_returning_revenue" ->
      ("""WITH e AS (SELECT user_id, ts, event_type, value FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |fm AS (SELECT user_id, CAST(date_trunc('month', MIN(ts)) AS DATE)
         |  AS f FROM e GROUP BY 1),
         |p AS (SELECT e.user_id, CAST(date_trunc('month', e.ts) AS DATE)
         |  AS month,
         |  CAST(ROUND(CAST(e.value AS DOUBLE) * 100) AS BIGINT) AS c, fm.f
         | FROM e JOIN fm ON e.user_id = fm.user_id
         | WHERE e.event_type = 'purchase' AND e.value IS NOT NULL)
         |SELECT month,
         | CAST(SUM(CASE WHEN month = f THEN c ELSE 0 END) AS BIGINT)
         |   AS new_rev_cents,
         | CAST(SUM(CASE WHEN month <> f THEN c ELSE 0 END) AS BIGINT)
         |   AS returning_rev_cents,
         | CAST(CASE WHEN SUM(c) > 0
         |   THEN SUM(CASE WHEN month = f THEN c ELSE 0 END) * 1000000
         |     // SUM(c) ELSE 0 END AS BIGINT) AS new_share_ppm
         |FROM p GROUP BY 1 ORDER BY month"""
        .stripMargin.replace("\n", " ")),
    "x307_time_to_second_purchase" ->
      ("""WITH p AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |   AND event_type = 'purchase'),
         |f AS (SELECT user_id, MIN(d) AS fd FROM p GROUP BY 1),
         |s AS (SELECT p.user_id, MIN(p.d) AS sd, MIN(f.fd) AS fd
         |  FROM p JOIN f ON p.user_id = f.user_id AND p.d > f.fd
         |  GROUP BY 1),
         |g AS (SELECT CAST(date_diff('day', fd, sd) AS BIGINT) AS gp FROM s),
         |buyers AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM f),
         |rep AS (SELECT CAST(COUNT(*) AS BIGINT) AS r FROM g),
         |gv AS (SELECT gp, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY 1),
         |cum AS (SELECT gp, CAST(SUM(c) OVER (ORDER BY gp) AS BIGINT) AS cw,
         |  CAST(SUM(c) OVER () AS BIGINT) AS tw FROM gv),
         |med AS (SELECT CAST(MIN(gp) AS BIGINT) AS m FROM cum
         |  WHERE cw * 2 >= tw)
         |SELECT CAST(length(format('{:b}', gp)) - 1 AS INT) AS gap_band,
         | CAST(COUNT(*) AS BIGINT) AS n_users,
         | CAST(buyers.b AS BIGINT) AS n_buyers_total,
         | CAST(rep.r AS BIGINT) AS n_repeat_buyers,
         | CAST(med.m AS BIGINT) AS median_gap_days
         |FROM g, buyers, rep, med
         |GROUP BY 1, buyers.b, rep.r, med.m ORDER BY gap_band"""
        .stripMargin.replace("\n", " ")),
    "x308_conversion_latency" ->
      ("""WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |   AND event_id IS NOT NULL AND event_type IS NOT NULL),
         |ft0 AS (SELECT user_id, MIN(ts) AS fts FROM e GROUP BY 1),
         |ft1 AS (SELECT e.user_id, e.ts, MIN(event_id) AS fid FROM e
         |  JOIN ft0 ON e.user_id = ft0.user_id AND e.ts = ft0.fts
         |  GROUP BY 1, 2),
         |ft AS (SELECT e.user_id, CAST(e.ts AS DATE) AS fd,
         |  e.event_type AS channel
         | FROM e JOIN ft1 ON e.user_id = ft1.user_id AND e.ts = ft1.ts
         |  AND e.event_id = ft1.fid),
         |fp AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS pd FROM e
         |  WHERE event_type = 'purchase' GROUP BY 1),
         |j AS (SELECT ft.channel,
         |  CAST(date_diff('day', ft.fd, fp.pd) AS BIGINT) AS gap
         | FROM ft LEFT JOIN fp ON ft.user_id = fp.user_id),
         |gv AS (SELECT channel, gap, CAST(COUNT(*) AS BIGINT) AS c FROM j
         |  WHERE gap IS NOT NULL GROUP BY 1, 2),
         |cum AS (SELECT channel, gap,
         |  CAST(SUM(c) OVER (PARTITION BY channel ORDER BY gap) AS BIGINT)
         |    AS cw,
         |  CAST(SUM(c) OVER (PARTITION BY channel) AS BIGINT) AS tw FROM gv),
         |md AS (SELECT channel, CAST(MIN(gap) AS BIGINT) AS med FROM cum
         |  WHERE cw * 2 >= tw GROUP BY 1),
         |ag AS (SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_users,
         |  CAST(SUM(CASE WHEN gap IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_converted FROM j GROUP BY 1)
         |SELECT ag.channel, n_users, n_converted,
         | CAST(n_converted * 1000000 // n_users AS BIGINT) AS conversion_ppm,
         | CAST(COALESCE(md.med, -1) AS BIGINT) AS median_days_to_purchase
         |FROM ag LEFT JOIN md ON ag.channel = md.channel
         |ORDER BY ag.channel""".stripMargin.replace("\n", " ")),
    "x309_service_level_sweep" ->
      ("""WITH per AS (SELECT l_orderkey,
         |  CAST(date_diff('day', MIN(CAST(l_shipdate AS DATE)),
         |    MAX(CAST(l_shipdate AS DATE))) AS BIGINT) AS span
         | FROM lineitem WHERE l_orderkey IS NOT NULL
         |  AND l_shipdate IS NOT NULL GROUP BY 1),
         |b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN span <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS w0,
         |  CAST(SUM(CASE WHEN span <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS w7,
         |  CAST(SUM(CASE WHEN span <= 14 THEN 1 ELSE 0 END) AS BIGINT) AS w14,
         |  CAST(SUM(CASE WHEN span <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS w30
         | FROM per)
         |SELECT CAST(0 AS BIGINT) AS within_days, w0 AS n_within,
         |  n AS n_orders, CAST(w0 * 1000000 // n AS BIGINT) AS service_ppm
         | FROM b
         |UNION ALL SELECT 7, w7, n, CAST(w7 * 1000000 // n AS BIGINT) FROM b
         |UNION ALL SELECT 14, w14, n, CAST(w14 * 1000000 // n AS BIGINT) FROM b
         |UNION ALL SELECT 30, w30, n, CAST(w30 * 1000000 // n AS BIGINT) FROM b
         |ORDER BY within_days""".stripMargin.replace("\n", " ")),
    "x310_repeat_by_first_basket" ->
      ("""WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate FROM orders
         |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |pc0 AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
         |  MIN(o_orderdate) AS fd FROM o GROUP BY 1),
         |pc AS (SELECT o.o_custkey, pc0.n,
         |  MIN(o.o_orderkey) AS first_order
         | FROM o JOIN pc0 ON o.o_custkey = pc0.o_custkey
         |  AND o.o_orderdate = pc0.fd GROUP BY 1, 2),
         |ln AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS lines
         |  FROM lineitem GROUP BY 1)
         |SELECT ln.lines AS first_order_lines,
         | CAST(COUNT(*) AS BIGINT) AS n_customers,
         | CAST(SUM(CASE WHEN pc.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_repeat,
         | CAST(SUM(CASE WHEN pc.n >= 2 THEN 1 ELSE 0 END) * 1000000
         |   // COUNT(*) AS BIGINT) AS repeat_ppm
         |FROM pc JOIN ln ON pc.first_order = ln.l_orderkey
         |GROUP BY 1 ORDER BY first_order_lines"""
        .stripMargin.replace("\n", " ")),
    "x311_copurchase_degree_census" ->
      ("""WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS b
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_orderkey IS NOT NULL AND p_brand IS NOT NULL),
         |pr AS (SELECT DISTINCT a.b AS brand, c.b AS partner
         |  FROM ob a JOIN ob c ON a.o = c.o AND a.b <> c.b),
         |dg AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS deg FROM pr
         |  GROUP BY 1)
         |SELECT CAST(length(format('{:b}', deg)) - 1 AS INT) AS degree_band,
         | CAST(COUNT(*) AS BIGINT) AS n_brands,
         | CAST(MIN(deg) AS BIGINT) AS min_degree,
         | CAST(MAX(deg) AS BIGINT) AS max_degree
         |FROM dg GROUP BY 1 ORDER BY degree_band"""
        .stripMargin.replace("\n", " ")),
    "x312_hapax_share" ->
      ("""WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |sw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS k FROM w
         |  WHERE w <> '' GROUP BY 1, 2),
         |tt AS (SELECT w, SUM(k) AS n FROM sw GROUP BY 1)
         |SELECT sw.source, CAST(COUNT(*) AS BIGINT) AS n_vocab,
         | CAST(SUM(CASE WHEN tt.n = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_hapax,
         | CAST(SUM(CASE WHEN tt.n = 1 THEN 1 ELSE 0 END) * 1000000
         |   // COUNT(*) AS BIGINT) AS hapax_ppm
         |FROM sw JOIN tt ON tt.w = sw.w GROUP BY 1 ORDER BY source"""
        .stripMargin.replace("\n", " ")),
    "x313_supplier_return_census" ->
      ("""WITH s AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS r
         | FROM lineitem WHERE l_suppkey IS NOT NULL
         |  AND l_returnflag IS NOT NULL
         | GROUP BY 1 HAVING COUNT(*) >= 3),
         |p AS (SELECT l_suppkey, CAST(r * 1000000 // n AS BIGINT) AS ppm
         |  FROM s)
         |SELECT CAST(ppm // 100000 AS INT) AS return_band,
         | CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         | CAST(MIN(ppm) AS BIGINT) AS min_ppm,
         | CAST(MAX(ppm) AS BIGINT) AS max_ppm
         |FROM p GROUP BY 1 ORDER BY return_band"""
        .stripMargin.replace("\n", " ")),
    "x314_priority_mix_drift" ->
      ("""WITH cell AS (SELECT year(CAST(o_orderdate AS DATE)) AS yr,
         |  o_orderpriority AS p, COUNT(*) AS n FROM orders
         | WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
         | GROUP BY 1, 2),
         |yt AS (SELECT yr, SUM(n) AS t FROM cell GROUP BY 1),
         |sh AS (SELECT cell.yr, p, CAST(n * 1000000 // t AS BIGINT) AS s
         |  FROM cell JOIN yt ON yt.yr = cell.yr),
         |spine AS (SELECT yt.yr, pr.p FROM yt
         |  CROSS JOIN (SELECT DISTINCT p FROM cell) pr),
         |f AS (SELECT spine.yr, spine.p, COALESCE(sh.s, 0) AS s FROM spine
         |  LEFT JOIN sh ON sh.yr = spine.yr AND sh.p = spine.p),
         |lg AS (SELECT yr, p, s,
         |  LAG(s) OVER (PARTITION BY p ORDER BY yr) AS prev FROM f)
         |SELECT yr, CAST(SUM(ABS(s - prev)) AS BIGINT) AS l1_drift_ppm,
         | CAST(COUNT(*) AS BIGINT) AS n_categories
         |FROM lg WHERE prev IS NOT NULL GROUP BY 1 ORDER BY yr"""
        .stripMargin.replace("\n", " ")),
    "x315_top_conversion_paths" ->
      ("""WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |   AND event_type IS NOT NULL),
         |l AS (SELECT *, LAG(ts) OVER
         |  (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
         |s AS (SELECT *, SUM(CASE WHEN prev IS NULL
         |   OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0 END)
         |  OVER (PARTITION BY user_id ORDER BY ts, event_id
         |   ROWS UNBOUNDED PRECEDING) AS sess FROM l),
         |p AS (SELECT user_id, sess,
         |   string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
         |   COUNT(*) AS len,
         |   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
         |  FROM s GROUP BY 1, 2)
         |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
         |FROM p WHERE len <= 8 AND np > 0
         |GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20"""
        .stripMargin.replace("\n", " ")),
    "x316_reorder_gap_quartiles" ->
      ("""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         |  o_orderkey FROM orders
         | WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |g AS (SELECT o_custkey, d - LAG(d) OVER
         |  (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS gap FROM o),
         |j AS (SELECT c_mktsegment AS segment, CAST(gap AS BIGINT)
         |   AS gap_days
         |  FROM g JOIN customer ON c_custkey = o_custkey
         |  WHERE gap IS NOT NULL),
         |gv AS (SELECT segment, gap_days, COUNT(*) AS w FROM j GROUP BY 1, 2),
         |cum AS (SELECT segment, gap_days, w,
         |  SUM(w) OVER (PARTITION BY segment ORDER BY gap_days) AS cw,
         |  SUM(w) OVER (PARTITION BY segment) AS tw FROM gv)
         |SELECT segment, p.p_pct, CAST(MIN(gap_days) AS BIGINT)
         |  AS gap_days_q, CAST(MAX(tw) AS BIGINT) AS n_gaps
         |FROM cum CROSS JOIN (VALUES (25), (50), (75)) p(p_pct)
         |WHERE cw * 100 >= p.p_pct * tw
         |GROUP BY 1, 2 ORDER BY segment, p_pct"""
        .stripMargin.replace("\n", " ")),
    "x317_char_class_mix" ->
      ("""WITH t AS (SELECT source, length(text) AS n,
         |  length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS a,
         |  length(regexp_replace(text, '[^0-9]', '', 'g')) AS d,
         |  length(regexp_replace(text, '[^ ]', '', 'g')) AS s
         | FROM documents)
         |SELECT source, CAST(SUM(n) AS BIGINT) AS n_chars,
         | CAST(SUM(a) * 1000000 // SUM(n) AS BIGINT) AS alpha_ppm,
         | CAST(SUM(d) * 1000000 // SUM(n) AS BIGINT) AS digit_ppm,
         | CAST(SUM(s) * 1000000 // SUM(n) AS BIGINT) AS space_ppm
         |FROM t GROUP BY 1 HAVING SUM(n) > 0 ORDER BY source"""
        .stripMargin.replace("\n", " ")),
    "x318_brand_quantity_mode" ->
      ("""WITH c AS (SELECT p_brand AS brand, CAST(l_quantity AS BIGINT)
         |   AS q, COUNT(*) AS n
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand IS NOT NULL AND l_quantity IS NOT NULL
         |  GROUP BY 1, 2),
         |r AS (SELECT brand, q, n,
         |  ROW_NUMBER() OVER (PARTITION BY brand ORDER BY n DESC, q) AS rk,
         |  SUM(n) OVER (PARTITION BY brand) AS t FROM c)
         |SELECT brand, CAST(q AS BIGINT) AS mode_qty,
         | CAST(n AS BIGINT) AS n_mode, CAST(t AS BIGINT) AS n_lines
         |FROM r WHERE rk = 1 ORDER BY brand"""
        .stripMargin.replace("\n", " ")),
    "x319_nation_trade_balance" ->
      ("""WITH f AS (SELECT cn.n_name AS cust_nation, sn.n_name
         |   AS supp_nation,
         |  SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS cents
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation cn ON c_nationkey = cn.n_nationkey
         |  JOIN nation sn ON s_nationkey = sn.n_nationkey
         | WHERE cn.n_name <> sn.n_name GROUP BY 1, 2),
         |p AS (SELECT least(cust_nation, supp_nation) AS nation_a,
         |  greatest(cust_nation, supp_nation) AS nation_b,
         |  CASE WHEN cust_nation < supp_nation THEN cents ELSE 0 END AS ab,
         |  CASE WHEN cust_nation < supp_nation THEN 0 ELSE cents END AS ba
         | FROM f)
         |SELECT nation_a, nation_b, CAST(SUM(ab) AS BIGINT)
         |  AS a_buys_cents, CAST(SUM(ba) AS BIGINT) AS b_buys_cents,
         | CAST(SUM(ab) - SUM(ba) AS BIGINT) AS net_cents
         |FROM p GROUP BY 1, 2 ORDER BY nation_a, nation_b"""
        .stripMargin.replace("\n", " ")),
    "x320_inactive_customer_census" ->
      ("""WITH a AS (SELECT DISTINCT o_custkey FROM orders
         |  WHERE o_custkey IS NOT NULL)
         |SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers,
         | CAST(SUM(CASE WHEN a.o_custkey IS NULL THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_inactive,
         | CAST(SUM(CASE WHEN a.o_custkey IS NULL THEN 1 ELSE 0 END)
         |   * 1000000 // COUNT(*) AS BIGINT) AS inactive_ppm
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         | LEFT JOIN a ON c_custkey = a.o_custkey
         |GROUP BY 1 ORDER BY nation"""
        .stripMargin.replace("\n", " ")),
    "x321_brand_momentum" ->
      ("""WITH r AS (SELECT p_brand AS brand,
         |  year(CAST(o_orderdate AS DATE)) AS yr,
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   AS c
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN part ON l_partkey = p_partkey
         | WHERE p_brand IS NOT NULL AND o_orderdate IS NOT NULL),
         |s AS (SELECT MIN(yr) AS y0, MAX(yr) AS y1 FROM r),
         |b AS (SELECT brand, MAX(y0) AS first_year, MAX(y1) AS last_year,
         |  CAST(SUM(CASE WHEN yr = y0 THEN c ELSE 0 END) AS BIGINT)
         |   AS rev_first_cents,
         |  CAST(SUM(CASE WHEN yr = y1 THEN c ELSE 0 END) AS BIGINT)
         |   AS rev_last_cents
         | FROM r, s GROUP BY 1)
         |SELECT brand, first_year, last_year, rev_first_cents,
         | rev_last_cents,
         | CASE WHEN rev_first_cents > 0 THEN
         |   CAST(CAST(rev_last_cents AS HUGEINT) * 1000000
         |    // rev_first_cents AS BIGINT) - 1000000
         |  ELSE NULL END AS growth_ppm
         |FROM b ORDER BY brand""".stripMargin.replace("\n", " ")),
    "x322_month_end_concentration" ->
      ("""WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         | FROM orders WHERE o_orderdate IS NOT NULL),
         |g AS (SELECT CAST(date_trunc('month', d) AS DATE) AS month,
         |  date_part('day', last_day(d)) AS n_days,
         |  CAST(SUM(c) AS BIGINT) AS total_cents,
         |  CAST(SUM(CASE WHEN date_part('day', d) >=
         |    date_part('day', last_day(d)) - 2 THEN c ELSE 0 END)
         |   AS BIGINT) AS last3_cents
         | FROM o GROUP BY 1, 2 HAVING SUM(c) > 0)
         |SELECT month, n_days, total_cents, last3_cents,
         | CAST(last3_cents * 1000000 // total_cents AS BIGINT)
         |  AS actual_ppm,
         | CAST(3000000 // n_days AS BIGINT) AS expected_ppm,
         | CAST(last3_cents * 1000000 // total_cents AS BIGINT)
         |  - CAST(3000000 // n_days AS BIGINT) AS excess_ppm
         |FROM g ORDER BY month""".stripMargin.replace("\n", " ")),
    "x323_volume_discount_curve" ->
      ("""WITH b AS (SELECT
         |  CAST(CAST(l_quantity AS BIGINT) // 10 AS INT) AS qty_band,
         |  CAST(CAST(l_discount AS DECIMAL(8,6)) * 1000000 AS BIGINT)
         |   AS dppm
         | FROM lineitem
         | WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL),
         |g AS (SELECT qty_band, CAST(COUNT(*) AS BIGINT) AS n_lines,
         |  CAST(SUM(dppm) // COUNT(*) AS BIGINT) AS mean_discount_ppm
         | FROM b GROUP BY 1)
         |SELECT qty_band, n_lines, mean_discount_ppm,
         | mean_discount_ppm - LAG(mean_discount_ppm)
         |  OVER (ORDER BY qty_band) AS delta_vs_prev
         |FROM g ORDER BY qty_band""".stripMargin.replace("\n", " ")),
    "x324_balance_band_activity" ->
      ("""WITH po AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS no,
         |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS rev
         | FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
         |c AS (SELECT CASE
         |   WHEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    < 0 THEN '1_negative'
         |   WHEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    < 500000 THEN '2_low' ELSE '3_high' END AS bal_band,
         |  COALESCE(po.no, 0) AS no, COALESCE(po.rev, 0) AS rev
         | FROM customer LEFT JOIN po ON c_custkey = po.o_custkey)
         |SELECT bal_band, CAST(COUNT(*) AS BIGINT) AS n_customers,
         | CAST(SUM(no) AS BIGINT) AS n_orders,
         | CAST(SUM(rev) AS BIGINT) AS rev_cents,
         | CAST(SUM(no) * 1000 // COUNT(*) AS BIGINT) AS orders_per_k
         |FROM c GROUP BY 1 ORDER BY bal_band"""
        .stripMargin.replace("\n", " ")),
    "x325_brand_seasonal_index" ->
      ("""WITH cell AS (SELECT p_brand AS brand,
         |  month(CAST(o_orderdate AS DATE)) AS mo,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS month_cents
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN part ON l_partkey = p_partkey
         | WHERE p_brand IS NOT NULL AND o_orderdate IS NOT NULL
         | GROUP BY 1, 2),
         |t AS (SELECT brand, SUM(month_cents) AS tt FROM cell GROUP BY 1)
         |SELECT cell.brand, mo, month_cents,
         | CAST(CAST(month_cents AS HUGEINT) * 12000000 // tt AS BIGINT)
         |  AS seasonal_index_ppm
         |FROM cell JOIN t ON t.brand = cell.brand
         |ORDER BY cell.brand, mo""".stripMargin.replace("\n", " ")),
    "x326_cross_lang_dups" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |lg AS (SELECT doc_id, lang FROM documents),
         |lp AS (SELECT LEAST(s1.lang, s2.lang) AS lang_1,
         |  GREATEST(s1.lang, s2.lang) AS lang_2
         | FROM jpairs j JOIN lg s1 ON j.d1 = s1.doc_id
         |  JOIN lg s2 ON j.d2 = s2.doc_id)
         |SELECT lang_1, lang_2, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM lp GROUP BY 1, 2 ORDER BY lang_1, lang_2"""
        .stripMargin.replace("\n", " ")),
    "x327_brand_volatility" ->
      ("""WITH m AS (SELECT p_brand AS brand,
         |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
         |   AS mo,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS mc
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN part ON l_partkey = p_partkey
         | WHERE p_brand IS NOT NULL AND o_orderdate IS NOT NULL
         | GROUP BY 1, 2)
         |SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_months,
         | CAST(MIN(mc) AS BIGINT) AS min_month_cents,
         | CAST(MAX(mc) AS BIGINT) AS max_month_cents,
         | CAST(CAST(MAX(mc) AS HUGEINT) * 1000000 // MIN(mc) AS BIGINT)
         |  AS volatility_ppm
         |FROM m GROUP BY 1 ORDER BY brand"""
        .stripMargin.replace("\n", " ")),
    "x328_word_length_histogram" ->
      ("""WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |c AS (SELECT lang, LEAST(length(w), 15) AS wlen,
         |  CAST(COUNT(*) AS BIGINT) AS n_words
         | FROM w WHERE w <> '' GROUP BY 1, 2),
         |t AS (SELECT lang, SUM(n_words) AS tt FROM c GROUP BY 1)
         |SELECT c.lang, wlen, n_words,
         | CAST(CAST(n_words AS HUGEINT) * 1000000 // tt AS BIGINT)
         |  AS share_ppm
         |FROM c JOIN t ON t.lang = c.lang ORDER BY c.lang, wlen"""
        .stripMargin.replace("\n", " ")),
    "x329_dup_transitivity_audit" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |adj AS (SELECT d1 AS c, d2 AS nb FROM jpairs
         |        UNION ALL SELECT d2, d1 FROM jpairs),
         |wg AS (SELECT x.nb AS a, y.nb AS b2 FROM adj x JOIN adj y
         |      ON x.c = y.c AND x.nb < y.nb),
         |nw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_wedges FROM wg),
         |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_closed FROM wg
         |       WHERE EXISTS (SELECT 1 FROM jpairs p
         |         WHERE p.d1 = wg.a AND p.d2 = wg.b2))
         |SELECT n_wedges, n_closed,
         | CASE WHEN n_wedges > 0
         |  THEN CAST(n_closed * 1000000 // n_wedges AS BIGINT)
         |  ELSE CAST(0 AS BIGINT) END AS closure_ppm
         |FROM nw, nc""".stripMargin.replace("\n", " ")),
    "x330_event_mix_drift" ->
      ("""WITH cell AS (SELECT CAST(ts AS DATE)
         |   AS day, event_type AS p, COUNT(*) AS n FROM events
         | WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
         |yt AS (SELECT day, SUM(n) AS t FROM cell GROUP BY 1),
         |sh AS (SELECT cell.day, p, CAST(n * 1000000 // t AS BIGINT)
         |   AS s FROM cell JOIN yt ON yt.day = cell.day),
         |spine AS (SELECT yt.day, pr.p FROM yt
         |  CROSS JOIN (SELECT DISTINCT p FROM cell) pr),
         |f AS (SELECT spine.day, spine.p, COALESCE(sh.s, 0) AS s
         |  FROM spine LEFT JOIN sh
         |   ON sh.day = spine.day AND sh.p = spine.p),
         |lg AS (SELECT day, p, s,
         |  LAG(s) OVER (PARTITION BY p ORDER BY day) AS prev FROM f)
         |SELECT day, CAST(SUM(ABS(s - prev)) AS BIGINT) AS l1_drift_ppm,
         | CAST(COUNT(*) AS BIGINT) AS n_categories
         |FROM lg WHERE prev IS NOT NULL GROUP BY 1 ORDER BY day"""
        .stripMargin.replace("\n", " ")),
    "x331_price_realization" ->
      ("""WITH r AS (SELECT p_brand AS brand,
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   AS act,
         |  CAST(l_quantity AS BIGINT) *
         |   CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   AS list
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE p_brand IS NOT NULL AND l_quantity IS NOT NULL
         |  AND l_extendedprice IS NOT NULL AND p_retailprice IS NOT NULL)
         |SELECT brand, CAST(SUM(act) AS BIGINT) AS actual_cents,
         | CAST(SUM(list) AS BIGINT) AS list_cents,
         | CAST(CAST(SUM(act) AS HUGEINT) * 1000000 // SUM(list) AS BIGINT)
         |  AS realization_ppm
         |FROM r GROUP BY 1 ORDER BY brand"""
        .stripMargin.replace("\n", " ")),
    "x332_trailing_mean_backtest" ->
      ("""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         |  o_orderkey,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         | FROM orders
         | WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |s AS (SELECT o_custkey, c,
         |  SUM(c) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ps,
         |  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pn
         | FROM o),
         |e AS (SELECT o_custkey, ABS(c - ps // pn) AS err FROM s
         |  WHERE pn > 0)
         |SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT)
         |  AS n_orders,
         | CAST(SUM(err) // COUNT(*) AS BIGINT) AS mae_cents
         |FROM e JOIN customer ON c_custkey = o_custkey
         |GROUP BY 1 ORDER BY segment"""
        .stripMargin.replace("\n", " ")),
    "x333_dead_stock_census" ->
      ("""WITH od AS (SELECT DISTINCT l_partkey FROM lineitem
         |  WHERE l_partkey IS NOT NULL)
         |SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
         | CAST(SUM(CASE WHEN od.l_partkey IS NULL THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_never_ordered,
         | CAST(SUM(CASE WHEN od.l_partkey IS NULL THEN 1 ELSE 0 END)
         |   * 1000000 // COUNT(*) AS BIGINT) AS dead_ppm
         |FROM part LEFT JOIN od ON p_partkey = od.l_partkey
         |GROUP BY 1 ORDER BY brand"""
        .stripMargin.replace("\n", " ")),
    "x334_hourly_load_profile" ->
      ("""WITH c AS (SELECT event_type, date_part('hour', ts) AS hh,
         |  CAST(COUNT(*) AS BIGINT) AS n_events FROM events
         | WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
         |t AS (SELECT event_type, SUM(n_events) AS tt FROM c GROUP BY 1)
         |SELECT c.event_type, hh, n_events,
         | CAST(n_events * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM c JOIN t ON t.event_type = c.event_type
         |ORDER BY c.event_type, hh""".stripMargin.replace("\n", " ")),
    "x335_decile_migration" ->
      ("""WITH sp AS (SELECT year(CAST(o_orderdate AS DATE)) AS y,
         |  o_custkey AS cu,
         |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS v
         | FROM orders WHERE o_custkey IS NOT NULL
         |  AND o_orderdate IS NOT NULL GROUP BY 1, 2),
         |vl AS (SELECT y, v, COUNT(*) AS c FROM sp GROUP BY 1, 2),
         |cm AS (SELECT y, v, SUM(c) OVER (PARTITION BY y ORDER BY v)
         |   AS cum, SUM(c) OVER (PARTITION BY y) AS n FROM vl),
         |dc AS (SELECT y, v, CAST((cum - 1) * 10 // n + 1 AS INT) AS d
         |  FROM cm),
         |lb AS (SELECT sp.y, cu, d FROM sp
         |  JOIN dc ON dc.y = sp.y AND dc.v = sp.v),
         |tr AS (SELECT a.d AS from_decile, b.d AS to_decile,
         |  CAST(COUNT(*) AS BIGINT) AS n_customers
         | FROM lb a JOIN lb b ON a.cu = b.cu AND b.y = a.y + 1
         | GROUP BY 1, 2),
         |ft AS (SELECT from_decile, SUM(n_customers) AS t FROM tr
         |  GROUP BY 1)
         |SELECT tr.from_decile, to_decile, n_customers,
         | CAST(n_customers * 1000000 // t AS BIGINT) AS share_ppm
         |FROM tr JOIN ft ON ft.from_decile = tr.from_decile
         |ORDER BY tr.from_decile, to_decile"""
        .stripMargin.replace("\n", " ")),
    "x336_pre_exit_degradation" ->
      ("""WITH e AS (SELECT user_id, ts, event_type FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |   AND event_type IS NOT NULL),
         |per AS (SELECT user_id, MAX(ts) AS last FROM e GROUP BY 1),
         |j AS (SELECT e.user_id, e.event_type,
         |  CASE WHEN e.ts >= per.last - INTERVAL 3 DAY
         |   THEN 'final3d' ELSE 'earlier' END AS period
         | FROM e JOIN per ON per.user_id = e.user_id)
         |SELECT period, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         | CAST(COUNT(*) AS BIGINT) AS n_events,
         | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_errors,
         | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         |   * 1000000 // COUNT(*) AS BIGINT) AS error_ppm
         |FROM j GROUP BY 1 ORDER BY period"""
        .stripMargin.replace("\n", " ")),
    "x337_supplier_quadrant_census" ->
      ("""WITH vol AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS v
         |  FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1),
         |sup AS (SELECT
         |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal,
         |  COALESCE(vol.v, 0) AS vo
         | FROM supplier LEFT JOIN vol ON s_suppkey = vol.l_suppkey),
         |bv AS (SELECT bal AS v, COUNT(*) AS c FROM sup GROUP BY 1),
         |bc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
         |  SUM(c) OVER () AS n FROM bv),
         |mb AS (SELECT MIN(v) AS mb FROM bc WHERE cum * 2 >= n),
         |vv AS (SELECT vo AS v, COUNT(*) AS c FROM sup GROUP BY 1),
         |vc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
         |  SUM(c) OVER () AS n FROM vv),
         |mv AS (SELECT MIN(v) AS mv FROM vc WHERE cum * 2 >= n)
         |SELECT CASE WHEN bal > mb THEN 'hi_bal' ELSE 'lo_bal' END
         |  AS balance_side,
         | CASE WHEN vo > mv THEN 'hi_vol' ELSE 'lo_vol' END
         |  AS volume_side,
         | CAST(COUNT(*) AS BIGINT) AS n_suppliers
         |FROM sup, mb, mv GROUP BY 1, 2
         |ORDER BY balance_side, volume_side"""
        .stripMargin.replace("\n", " ")),
    "x338_cross_lang_vocab_overlap" ->
      ("""WITH lw AS (SELECT DISTINCT lang, w FROM (SELECT lang,
         |  unnest(string_split(text, ' ')) AS w FROM documents)
         | WHERE w <> ''),
         |sz AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM lw
         |  GROUP BY 1),
         |iv AS (SELECT a.lang AS lang_1, b.lang AS lang_2,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         | FROM lw a JOIN lw b ON a.w = b.w AND a.lang < b.lang
         | GROUP BY 1, 2)
         |SELECT lang_1, lang_2, s1.n AS n_vocab_1, s2.n AS n_vocab_2,
         | n_shared,
         | CAST(n_shared * 1000000 // (s1.n + s2.n - n_shared) AS BIGINT)
         |  AS jaccard_ppm
         |FROM iv JOIN sz s1 ON s1.lang = iv.lang_1
         | JOIN sz s2 ON s2.lang = iv.lang_2
         |ORDER BY lang_1, lang_2""".stripMargin.replace("\n", " ")),
    "x339_nation_brand_affinity" ->
      ("""WITH cell AS (SELECT n_name AS nation, p_brand AS brand,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS rev_cents
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN part ON l_partkey = p_partkey
         | WHERE p_brand IS NOT NULL GROUP BY 1, 2),
         |nt AS (SELECT nation, SUM(rev_cents) AS nt FROM cell GROUP BY 1),
         |bt AS (SELECT brand, SUM(rev_cents) AS bt FROM cell GROUP BY 1),
         |tt AS (SELECT SUM(rev_cents) AS tot FROM cell),
         |j AS (SELECT cell.nation, cell.brand, rev_cents,
         |  CAST(CAST(rev_cents AS HUGEINT) * 1000000 // nt AS BIGINT)
         |   AS obs_share_ppm,
         |  CAST(CAST(bt AS HUGEINT) * 1000000 // tot AS BIGINT)
         |   AS expected_ppm
         | FROM cell JOIN nt ON nt.nation = cell.nation
         |  JOIN bt ON bt.brand = cell.brand, tt)
         |SELECT nation, brand, rev_cents, obs_share_ppm, expected_ppm,
         | CAST(obs_share_ppm * 1000000 // expected_ppm AS BIGINT)
         |  AS lift_ppm
         |FROM j ORDER BY nation, brand"""
        .stripMargin.replace("\n", " ")),
    "x340_bucket_balance_census" ->
      ("""WITH b AS (SELECT
         |  CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
         |   AS BIGINT) % 32 AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows
         | FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
         |t AS (SELECT SUM(n_rows) AS tt FROM b)
         |SELECT bucket, n_rows,
         | CAST(CAST(n_rows AS HUGEINT) * 32000000 // tt AS BIGINT)
         |  AS load_ppm
         |FROM b, t ORDER BY bucket""".stripMargin.replace("\n", " ")),
    "x341_error_purchase_proximity" ->
      ("""WITH e AS (SELECT event_id, user_id, event_type,
         |  epoch_us(ts) AS t, epoch_us(ts) // 3600000000 AS m FROM events
         | WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |er AS (SELECT event_id, user_id, t, m FROM e
         |  WHERE event_type = 'error'),
         |sh AS (SELECT user_id, t AS pt, m + dd.d AS pm FROM e,
         |  (VALUES (-1), (0), (1)) AS dd(d)
         |  WHERE event_type = 'purchase'),
         |nr AS (SELECT DISTINCT er.event_id FROM er JOIN sh
         |  ON er.user_id = sh.user_id AND er.m = sh.pm
         |  WHERE ABS(er.t - sh.pt) <= 3600000000),
         |n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_errors FROM er),
         |n2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_near FROM nr)
         |SELECT n_errors, n_near,
         | CASE WHEN n_errors > 0
         |  THEN CAST(n_near * 1000000 // n_errors AS BIGINT)
         |  ELSE CAST(0 AS BIGINT) END AS near_ppm
         |FROM n1, n2""".stripMargin.replace("\n", " ")),
    "x342_event_value_quantiles" ->
      ("""WITH d AS (SELECT event_type,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
         | FROM events
         | WHERE event_type IS NOT NULL AND value IS NOT NULL),
         |gv AS (SELECT event_type, vc, COUNT(*) AS w FROM d GROUP BY 1, 2),
         |cum AS (SELECT event_type, vc, w,
         |  SUM(w) OVER (PARTITION BY event_type ORDER BY vc) AS cw,
         |  SUM(w) OVER (PARTITION BY event_type) AS tw FROM gv)
         |SELECT event_type, p.p_pct, CAST(MIN(vc) AS BIGINT)
         |  AS value_cents_q, CAST(MAX(tw) AS BIGINT) AS n_events
         |FROM cum CROSS JOIN (VALUES (50), (90), (99)) p(p_pct)
         |WHERE cw * 100 >= p.p_pct * tw
         |GROUP BY 1, 2 ORDER BY event_type, p_pct"""
        .stripMargin.replace("\n", " ")),
    "x343_region_quarter_growth" ->
      ("""WITH cell AS (SELECT r_name AS region,
         |  CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
         |   AS quarter,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS rev_cents
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         | WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
         |lg AS (SELECT region, quarter, rev_cents,
         |  LAG(rev_cents) OVER (PARTITION BY region ORDER BY quarter)
         |   AS prev FROM cell)
         |SELECT region, quarter, rev_cents,
         | CAST(CAST(rev_cents AS HUGEINT) * 1000000 // prev AS BIGINT)
         |  - 1000000 AS growth_ppm
         |FROM lg WHERE prev IS NOT NULL ORDER BY region, quarter"""
        .stripMargin.replace("\n", " ")),
    "x344_dup_similarity_histogram" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |b AS (SELECT CAST(FLOOR(jaccard * 20) * 5 AS INT) AS band_pct,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs FROM jpairs GROUP BY 1),
         |t AS (SELECT SUM(n_pairs) AS tt FROM b)
         |SELECT band_pct, n_pairs,
         | CAST(n_pairs * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM b, t ORDER BY band_pct""".stripMargin.replace("\n", " ")),
    "x345_brand_supply_concentration" ->
      ("""WITH cell AS (SELECT p_brand AS brand, l_suppkey,
         |  CAST(COUNT(*) AS BIGINT) AS c
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE p_brand IS NOT NULL AND l_suppkey IS NOT NULL
         | GROUP BY 1, 2),
         |t AS (SELECT brand, SUM(c) AS tt FROM cell GROUP BY 1),
         |sh AS (SELECT cell.brand, CAST(c * 1000000 // tt AS BIGINT) AS s
         |  FROM cell JOIN t ON t.brand = cell.brand)
         |SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         | CAST(SUM(s * s) // 1000000 AS BIGINT) AS hhi_ppm
         |FROM sh GROUP BY 1 ORDER BY brand"""
        .stripMargin.replace("\n", " ")),
    "x346_ingest_composition_drift" ->
      ("""WITH m AS (SELECT MAX(doc_id) AS mx FROM documents),
         |d AS (SELECT LEAST(doc_id * 10 // (mx + 1), 9) AS decile,
         |  n_chars, len(string_split(text, ' ')) AS tok
         | FROM documents, m)
         |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS mean_chars,
         | CAST(SUM(tok) // COUNT(*) AS BIGINT) AS mean_tokens
         |FROM d GROUP BY 1 ORDER BY decile"""
        .stripMargin.replace("\n", " ")),
    "x347_first_session_activation" ->
      ("""WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |   AND event_type IS NOT NULL),
         |l AS (SELECT *, LAG(ts) OVER
         |  (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
         |s AS (SELECT *, SUM(CASE WHEN prev IS NULL
         |   OR epoch_us(ts) - epoch_us(prev) > 1800000000 THEN 1 ELSE 0
         |   END) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |   ROWS UNBOUNDED PRECEDING) AS sess FROM l),
         |f AS (SELECT user_id, MAX(CASE WHEN event_type = 'purchase'
         |   THEN 1 ELSE 0 END) AS act
         | FROM s WHERE sess = 1 GROUP BY 1)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         | CAST(SUM(act) AS BIGINT) AS n_activated,
         | CAST(SUM(act) * 1000000 // COUNT(*) AS BIGINT)
         |  AS activation_ppm
         |FROM f""".stripMargin.replace("\n", " ")),
    "x348_brand_regional_spread" ->
      ("""WITH cell AS (SELECT r_name AS region, p_brand AS brand,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS c
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  JOIN part ON l_partkey = p_partkey
         | WHERE p_brand IS NOT NULL GROUP BY 1, 2),
         |rt AS (SELECT region, SUM(c) AS tt FROM cell GROUP BY 1),
         |sh AS (SELECT cell.region, brand,
         |  CAST(CAST(c AS HUGEINT) * 1000000 // tt AS BIGINT) AS s
         | FROM cell JOIN rt ON rt.region = cell.region),
         |spine AS (SELECT rt.region, b.brand FROM rt
         |  CROSS JOIN (SELECT DISTINCT brand FROM cell) b),
         |f AS (SELECT spine.brand, COALESCE(sh.s, 0) AS s FROM spine
         |  LEFT JOIN sh ON sh.region = spine.region
         |   AND sh.brand = spine.brand)
         |SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_regions,
         | CAST(MIN(s) AS BIGINT) AS min_share_ppm,
         | CAST(MAX(s) AS BIGINT) AS max_share_ppm,
         | CAST(MAX(s) - MIN(s) AS BIGINT) AS spread_ppm
         |FROM f GROUP BY 1 ORDER BY brand"""
        .stripMargin.replace("\n", " ")),
    "x349_null_cooccurrence_audit" ->
      ("""WITH e AS (SELECT
         |  CASE WHEN event_id % 37 = 0 THEN NULL ELSE value END AS v,
         |  CASE WHEN event_id % 53 = 0 THEN NULL ELSE props END AS p
         | FROM events)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         | CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_null_value,
         | CAST(SUM(CASE WHEN p IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_null_props,
         | CAST(SUM(CASE WHEN v IS NULL AND p IS NULL THEN 1 ELSE 0 END)
         |  AS BIGINT) AS n_null_both,
         | CAST(SUM(CASE WHEN v IS NULL AND p IS NULL THEN 1 ELSE 0 END)
         |  * 1000000 // COUNT(*) AS BIGINT) AS actual_both_ppm,
         | CAST(CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
         |   AS HUGEINT) * SUM(CASE WHEN p IS NULL THEN 1 ELSE 0 END)
         |   * 1000000 // (CAST(COUNT(*) AS HUGEINT) * COUNT(*))
         |  AS BIGINT) AS expected_both_ppm
         |FROM e""".stripMargin.replace("\n", " ")),
    "x350_whale_dependence" ->
      ("""WITH sp AS (SELECT n_name AS nation, c_custkey,
         |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS v
         | FROM orders JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey GROUP BY 1, 2),
         |gv AS (SELECT nation, v, COUNT(*) AS w FROM sp GROUP BY 1, 2),
         |cum AS (SELECT nation, v, w,
         |  SUM(w) OVER (PARTITION BY nation ORDER BY v) AS cw,
         |  SUM(w) OVER (PARTITION BY nation) AS tw FROM gv),
         |ct AS (SELECT nation, MIN(v) AS cut FROM cum
         |  WHERE cw * 100 >= 80 * tw GROUP BY 1)
         |SELECT sp.nation, CAST(COUNT(*) AS BIGINT) AS n_customers,
         | CAST(SUM(CASE WHEN v >= cut THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_top,
         | CAST(SUM(v) AS BIGINT) AS rev_cents,
         | CAST(SUM(CASE WHEN v >= cut THEN v ELSE 0 END) AS BIGINT)
         |  AS top_rev_cents,
         | CAST(CAST(SUM(CASE WHEN v >= cut THEN v ELSE 0 END) AS HUGEINT)
         |  * 1000000 // SUM(v) AS BIGINT) AS top_share_ppm
         |FROM sp JOIN ct ON ct.nation = sp.nation
         |GROUP BY 1 ORDER BY sp.nation"""
        .stripMargin.replace("\n", " ")),
    "x351_brand_attach_rate" ->
      ("""WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS brand
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_orderkey IS NOT NULL AND p_brand IS NOT NULL),
         |bc AS (SELECT o, COUNT(*) AS n FROM ob GROUP BY 1)
         |SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_orders,
         | CAST(SUM(bc.n - 1) * 1000 // COUNT(*) AS BIGINT)
         |  AS attach_milli
         |FROM ob JOIN bc ON bc.o = ob.o GROUP BY 1 ORDER BY brand"""
        .stripMargin.replace("\n", " ")),
    "x352_loyalty_streak_census" ->
      ("""WITH cm AS (SELECT DISTINCT o_custkey,
         |  year(CAST(o_orderdate AS DATE)) * 12 +
         |   month(CAST(o_orderdate AS DATE)) AS mi
         | FROM orders
         | WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |g AS (SELECT o_custkey, mi - ROW_NUMBER() OVER
         |  (PARTITION BY o_custkey ORDER BY mi) AS grp FROM cm),
         |st AS (SELECT o_custkey, grp, COUNT(*) AS len FROM g
         |  GROUP BY 1, 2),
         |mx AS (SELECT o_custkey, CAST(MAX(len) AS BIGINT)
         |   AS streak_months FROM st GROUP BY 1)
         |SELECT streak_months, CAST(COUNT(*) AS BIGINT) AS n_customers
         |FROM mx GROUP BY 1 ORDER BY streak_months"""
        .stripMargin.replace("\n", " ")),
    "x353_template_family_census" ->
      ("""WITH fam AS (SELECT
         |  array_to_string(string_split(text, ' ')[1:5], ' ') AS pfx,
         |  CAST(COUNT(*) AS BIGINT) AS fam_size
         | FROM documents GROUP BY 1)
         |SELECT fam_size, CAST(COUNT(*) AS BIGINT) AS n_families,
         | CAST(SUM(fam_size) AS BIGINT) AS n_docs
         |FROM fam GROUP BY 1 ORDER BY fam_size"""
        .stripMargin.replace("\n", " ")),
    "x354_post_large_order_gap" ->
      ("""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         |  o_orderkey,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         | FROM orders
         | WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |gv AS (SELECT c AS v, COUNT(*) AS w FROM o GROUP BY 1),
         |cum AS (SELECT v, SUM(w) OVER (ORDER BY v) AS cw,
         |  SUM(w) OVER () AS tw FROM gv),
         |ct AS (SELECT MIN(v) AS cut FROM cum WHERE cw * 100 >= 75 * tw),
         |nx AS (SELECT o_custkey, d, c, LEAD(d) OVER
         |  (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS nd FROM o),
         |cl AS (SELECT CASE WHEN c >= cut THEN 'large' ELSE 'regular' END
         |   AS order_class, CAST(nd - d AS BIGINT) AS gap
         | FROM nx, ct WHERE nd IS NOT NULL)
         |SELECT order_class, CAST(COUNT(*) AS BIGINT) AS n_orders,
         | CAST(SUM(gap) * 1000 // COUNT(*) AS BIGINT)
         |  AS mean_gap_milli_days
         |FROM cl GROUP BY 1 ORDER BY order_class"""
        .stripMargin.replace("\n", " ")),
    "x355_corpus_sourcing_chi2" ->
      ("""WITH cells AS (SELECT lang, source,
         |  CAST(COUNT(*) AS BIGINT) AS observed FROM documents
         | WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
         |rt AS (SELECT lang, CAST(SUM(observed) AS BIGINT) AS rt
         |  FROM cells GROUP BY 1),
         |ct AS (SELECT source, CAST(SUM(observed) AS BIGINT) AS ct
         |  FROM cells GROUP BY 1),
         |n AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM cells)
         |SELECT cells.lang, cells.source, observed,
         | CAST(CAST(rt AS HUGEINT) * ct * 1000 // n AS BIGINT)
         |  AS expected_milli,
         | CAST((CAST(observed AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
         |   * (CAST(observed AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
         |   * 1000000 // (CAST(n AS HUGEINT) * rt * ct) AS BIGINT)
         |   AS contrib_micro
         |FROM cells JOIN rt ON rt.lang = cells.lang
         | JOIN ct ON ct.source = cells.source, n
         |ORDER BY cells.lang, cells.source"""
        .stripMargin.replace("\n", " ")),
    "x356_ship_delay_quantiles" ->
      ("""WITH d AS (SELECT o_orderpriority,
         |  CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
         |   AS BIGINT) AS dl
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | WHERE o_orderpriority IS NOT NULL AND l_shipdate IS NOT NULL
         |  AND o_orderdate IS NOT NULL),
         |gv AS (SELECT o_orderpriority, dl, COUNT(*) AS w FROM d
         |  GROUP BY 1, 2),
         |cum AS (SELECT o_orderpriority, dl, w,
         |  SUM(w) OVER (PARTITION BY o_orderpriority ORDER BY dl) AS cw,
         |  SUM(w) OVER (PARTITION BY o_orderpriority) AS tw FROM gv)
         |SELECT o_orderpriority, p.p_pct, CAST(MIN(dl) AS BIGINT)
         |  AS delay_days_q, CAST(MAX(tw) AS BIGINT) AS n_lines
         |FROM cum CROSS JOIN (VALUES (50), (90), (99)) p(p_pct)
         |WHERE cw * 100 >= p.p_pct * tw
         |GROUP BY 1, 2 ORDER BY o_orderpriority, p_pct"""
        .stripMargin.replace("\n", " ")),
    "x357_event_audience_overlap" ->
      ("""WITH ut AS (SELECT DISTINCT event_type, user_id FROM events
         |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
         |sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut
         |  GROUP BY 1),
         |iv AS (SELECT a.event_type AS type_1, b.event_type AS type_2,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         | FROM ut a JOIN ut b ON a.user_id = b.user_id
         |  AND a.event_type < b.event_type GROUP BY 1, 2)
         |SELECT type_1, type_2, s1.n AS n_users_1, s2.n AS n_users_2,
         | n_shared,
         | CAST(n_shared * 1000000 // (s1.n + s2.n - n_shared) AS BIGINT)
         |  AS jaccard_ppm
         |FROM iv JOIN sz s1 ON s1.event_type = iv.type_1
         | JOIN sz s2 ON s2.event_type = iv.type_2
         |ORDER BY type_1, type_2""".stripMargin.replace("\n", " ")),
    "x358_return_rate_trend" ->
      ("""SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE))
         |  AS DATE) AS month,
         | CAST(COUNT(*) AS BIGINT) AS n_lines,
         | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |  AS BIGINT) AS n_returns,
         | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |  * 1000000 // COUNT(*) AS BIGINT) AS return_ppm
         |FROM lineitem
         |WHERE l_shipdate IS NOT NULL AND l_returnflag IS NOT NULL
         |GROUP BY 1 ORDER BY month""".stripMargin.replace("\n", " ")),
    "x359_reactivation_value" ->
      ("""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         |  o_orderkey,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         | FROM orders
         | WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |l AS (SELECT c, LAG(d) OVER
         |  (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS prev, d
         | FROM o),
         |cl AS (SELECT CASE WHEN prev IS NULL THEN '1_first'
         |   WHEN d - prev >= 180 THEN '2_reactivation'
         |   ELSE '3_regular' END AS order_class, c FROM l)
         |SELECT order_class, CAST(COUNT(*) AS BIGINT) AS n_orders,
         | CAST(SUM(c) // COUNT(*) AS BIGINT) AS mean_cents
         |FROM cl GROUP BY 1 ORDER BY order_class"""
        .stripMargin.replace("\n", " ")),
    "x360_vector_sparsity_census" ->
      ("""WITH v AS (SELECT label,
         |  CAST(len(embedding) AS BIGINT) AS dim,
         |  CAST(len(list_filter(embedding, x -> abs(x) < 0.01))
         |   AS BIGINT) AS nz
         | FROM embeddings
         | WHERE label IS NOT NULL AND embedding IS NOT NULL)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         | CAST(SUM(dim) AS BIGINT) AS n_components,
         | CAST(SUM(nz) AS BIGINT) AS n_near_zero,
         | CAST(SUM(nz) * 1000000 // SUM(dim) AS BIGINT) AS sparsity_ppm
         |FROM v GROUP BY 1 ORDER BY label"""
        .stripMargin.replace("\n", " ")),
    "x361_dim_sign_agreement" ->
      ("""WITH s AS (SELECT
         |  CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END AS s1,
         |  CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END AS s2,
         |  CASE WHEN embedding[3] > 0 THEN 1 ELSE 0 END AS s3,
         |  CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END AS s4
         | FROM embeddings
         | WHERE embedding IS NOT NULL AND len(embedding) >= 4),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN s1 = s2 THEN 1 ELSE 0 END) AS BIGINT) AS a12,
         |  CAST(SUM(CASE WHEN s1 = s3 THEN 1 ELSE 0 END) AS BIGINT) AS a13,
         |  CAST(SUM(CASE WHEN s1 = s4 THEN 1 ELSE 0 END) AS BIGINT) AS a14,
         |  CAST(SUM(CASE WHEN s2 = s3 THEN 1 ELSE 0 END) AS BIGINT) AS a23,
         |  CAST(SUM(CASE WHEN s2 = s4 THEN 1 ELSE 0 END) AS BIGINT) AS a24,
         |  CAST(SUM(CASE WHEN s3 = s4 THEN 1 ELSE 0 END) AS BIGINT) AS a34
         | FROM s)
         |SELECT p.dim_pair, p.n_agree, n AS n_vecs,
         | CAST(p.n_agree * 1000000 // n AS BIGINT) AS agree_ppm
         |FROM a, LATERAL (VALUES ('1_2', a12), ('1_3', a13), ('1_4', a14),
         |  ('2_3', a23), ('2_4', a24), ('3_4', a34)) p(dim_pair, n_agree)
         |ORDER BY dim_pair""".stripMargin.replace("\n", " ")),
    "x362_catalog_hierarchy_rollup" ->
      ("""WITH t AS (SELECT p_type AS t1, p_brand AS t2,
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   AS c
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE p_type IS NOT NULL AND p_brand IS NOT NULL)
         |SELECT COALESCE(t1, 'ALL') AS type_1,
         | COALESCE(t2, 'ALL') AS type_2,
         | CAST(COUNT(*) AS BIGINT) AS n_lines,
         | CAST(SUM(c) AS BIGINT) AS rev_cents
         |FROM t GROUP BY ROLLUP (t1, t2)
         |ORDER BY type_1, type_2""".stripMargin.replace("\n", " ")),
    "x363_brand_loyalty_depth" ->
      ("""WITH cb AS (SELECT o_custkey, p_brand,
         |  CAST(COUNT(*) AS BIGINT) AS c
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN part ON l_partkey = p_partkey
         | WHERE o_custkey IS NOT NULL AND p_brand IS NOT NULL
         | GROUP BY 1, 2),
         |per AS (SELECT CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT)
         |   AS ppm FROM cb GROUP BY o_custkey),
         |b AS (SELECT CAST(ppm // 100000 AS INT) AS loyalty_band,
         |  CAST(COUNT(*) AS BIGINT) AS n_customers FROM per GROUP BY 1),
         |t AS (SELECT SUM(n_customers) AS n FROM b)
         |SELECT loyalty_band, n_customers,
         | CAST(n_customers * 1000000 // n AS BIGINT) AS share_ppm
         |FROM b, t ORDER BY loyalty_band"""
        .stripMargin.replace("\n", " ")),
    "x364_order_consolidation_census" ->
      ("""WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
         |  WHERE l_orderkey IS NOT NULL AND l_suppkey IS NOT NULL),
         |oc AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT)
         |   AS n_suppliers FROM os GROUP BY 1)
         |SELECT n_suppliers, CAST(COUNT(*) AS BIGINT) AS n_orders
         |FROM oc GROUP BY 1 ORDER BY n_suppliers"""
        .stripMargin.replace("\n", " ")),
    "x365_line_concentration_census" ->
      ("""WITH o AS (SELECT l_orderkey,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS t,
         |  CAST(MAX(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS m
         | FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1),
         |p AS (SELECT CAST(CAST(m AS HUGEINT) * 1000000 // t AS BIGINT)
         |   AS ppm FROM o)
         |SELECT CAST(ppm // 100000 AS INT) AS concentration_band,
         | CAST(COUNT(*) AS BIGINT) AS n_orders
         |FROM p GROUP BY 1 ORDER BY concentration_band"""
        .stripMargin.replace("\n", " ")),
    "x366_dup_rate_by_length" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |dup AS (SELECT DISTINCT d FROM (SELECT d1 AS d FROM jpairs
         |  UNION ALL SELECT d2 FROM jpairs)),
         |b AS (SELECT CAST(length(format('{:b}', n_chars)) - 1 AS INT)
         |   AS len_band,
         |  CASE WHEN dup.d IS NULL THEN 0 ELSE 1 END AS isdup
         | FROM documents LEFT JOIN dup ON documents.doc_id = dup.d
         | WHERE n_chars > 0)
         |SELECT len_band, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(isdup) AS BIGINT) AS n_dup,
         | CAST(SUM(isdup) * 1000000 // COUNT(*) AS BIGINT) AS dup_ppm
         |FROM b GROUP BY 1 ORDER BY len_band"""
        .stripMargin.replace("\n", " ")),
    "x367_digit_density_outliers" ->
      ("""WITH d AS (SELECT doc_id, n_chars,
         |  CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
         |   * 1000000 // n_chars AS BIGINT) AS digit_ppm
         | FROM documents WHERE n_chars > 0)
         |SELECT doc_id, n_chars, digit_ppm FROM d
         |ORDER BY digit_ppm DESC, doc_id LIMIT 20"""
        .stripMargin.replace("\n", " ")),
    "x368_shared_supplier_exposure" ->
      ("""WITH bs AS (SELECT DISTINCT p_brand AS brand, l_suppkey
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand IS NOT NULL AND l_suppkey IS NOT NULL),
         |sz AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n FROM bs
         |  GROUP BY 1),
         |iv AS (SELECT a.brand AS brand_1, b.brand AS brand_2,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         | FROM bs a JOIN bs b ON a.l_suppkey = b.l_suppkey
         |  AND a.brand < b.brand GROUP BY 1, 2)
         |SELECT brand_1, brand_2, s1.n AS n_sup_1, s2.n AS n_sup_2,
         | n_shared,
         | CAST(n_shared * 1000000 // (s1.n + s2.n - n_shared) AS BIGINT)
         |  AS jaccard_ppm
         |FROM iv JOIN sz s1 ON s1.brand = iv.brand_1
         | JOIN sz s2 ON s2.brand = iv.brand_2
         |ORDER BY brand_1, brand_2""".stripMargin.replace("\n", " ")),
    "x369_basket_size_mode" ->
      ("""WITH sz AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS s
         |  FROM lineitem GROUP BY 1),
         |c AS (SELECT c_mktsegment AS segment, s, COUNT(*) AS n
         | FROM sz JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
         |r AS (SELECT segment, s, n, ROW_NUMBER() OVER
         |  (PARTITION BY segment ORDER BY n DESC, s) AS rk,
         |  SUM(n) OVER (PARTITION BY segment) AS t FROM c)
         |SELECT segment, CAST(s AS BIGINT) AS mode_basket_size,
         | CAST(n AS BIGINT) AS n_mode, CAST(t AS BIGINT) AS n_orders
         |FROM r WHERE rk = 1 ORDER BY segment"""
        .stripMargin.replace("\n", " ")),
    "x370_basket_size_economics" ->
      ("""WITH o AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS t
         | FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1)
         |SELECT n AS basket_lines, CAST(COUNT(*) AS BIGINT) AS n_orders,
         | CAST(SUM(t) // COUNT(*) AS BIGINT) AS mean_order_cents,
         | CAST(SUM(t) // SUM(n) AS BIGINT) AS mean_line_cents
         |FROM o GROUP BY 1 ORDER BY basket_lines"""
        .stripMargin.replace("\n", " ")),
    "x371_dup_quality_gap" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |$qualityCtes,
         |dup AS (SELECT DISTINCT d FROM (SELECT d1 AS d FROM jpairs
         |  UNION ALL SELECT d2 FROM jpairs)),
         |c AS (SELECT CASE WHEN dup.d IS NULL THEN 'clean' ELSE 'dup' END
         |   AS cohort, CAST(FLOOR(score * 1000) AS BIGINT) AS q
         | FROM qscore LEFT JOIN dup ON qscore.doc_id = dup.d)
         |SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(q) // COUNT(*) AS BIGINT) AS mean_quality_milli
         |FROM c GROUP BY 1 ORDER BY cohort"""
        .stripMargin.replace("\n", " ")),
    "x372_conversion_by_first_touch" ->
      ("""WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |   AND event_type IS NOT NULL),
         |f AS (SELECT user_id,
         |  MIN(struct_pack(ts := ts, eid := event_id, et := event_type))
         |   AS ft,
         |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |   AS conv
         | FROM e GROUP BY 1)
         |SELECT ft.et AS first_touch,
         | CAST(COUNT(*) AS BIGINT) AS n_users,
         | CAST(SUM(conv) AS BIGINT) AS n_converted,
         | CAST(SUM(conv) * 1000000 // COUNT(*) AS BIGINT)
         |  AS conversion_ppm
         |FROM f GROUP BY 1 ORDER BY first_touch"""
        .stripMargin.replace("\n", " ")),
    "x373_token_position_profile" ->
      ("""WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
         |ix AS (SELECT ws, unnest(range(least(len(ws), 20))) AS i FROM w),
         |t AS (SELECT CAST(i + 1 AS BIGINT) AS position, ws[i + 1] AS tok
         |  FROM ix)
         |SELECT position, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         | CAST(SUM(length(tok)) * 1000 // COUNT(*) AS BIGINT)
         |  AS mean_len_milli
         |FROM t WHERE tok <> '' GROUP BY 1 ORDER BY position"""
        .stripMargin.replace("\n", " ")),
    "x374_discount_calendar" ->
      ("""SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE))
         |  AS DATE) AS month,
         | CAST(COUNT(*) AS BIGINT) AS n_lines,
         | CAST(SUM(CAST(CAST(l_discount AS DECIMAL(8,6)) * 1000000
         |  AS BIGINT)) // COUNT(*) AS BIGINT) AS mean_discount_ppm
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_discount IS NOT NULL AND o_orderdate IS NOT NULL
         |GROUP BY 1 ORDER BY month""".stripMargin.replace("\n", " ")),
    "x375_purchase_value_progression" ->
      ("""WITH p AS (SELECT user_id, ts, event_id,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         | FROM events
         | WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |  AND event_type = 'purchase' AND value IS NOT NULL),
         |k AS (SELECT c, ROW_NUMBER() OVER
         |  (PARTITION BY user_id ORDER BY ts, event_id) AS ki FROM p)
         |SELECT CAST(ki AS BIGINT) AS purchase_index,
         | CAST(COUNT(*) AS BIGINT) AS n_purchases,
         | CAST(SUM(c) // COUNT(*) AS BIGINT) AS mean_value_cents
         |FROM k WHERE ki <= 10 GROUP BY 1 ORDER BY purchase_index"""
        .stripMargin.replace("\n", " ")),
    "x376_lang_misfile_queue" ->
      ("""WITH pr AS (SELECT doc_id, lang,
         | CASE
         |  WHEN strpos(' '||text||' ',' der ')>0 OR strpos(' '||text||' ',' die ')>0 OR strpos(' '||text||' ',' das ')>0 OR strpos(' '||text||' ',' und ')>0 THEN 'de'
         |  WHEN strpos(' '||text||' ',' le ')>0 OR strpos(' '||text||' ',' la ')>0 OR strpos(' '||text||' ',' et ')>0 OR strpos(' '||text||' ',' les ')>0 THEN 'fr'
         |  WHEN strpos(' '||text||' ',' el ')>0 OR strpos(' '||text||' ',' los ')>0 OR strpos(' '||text||' ',' una ')>0 OR strpos(' '||text||' ',' es ')>0 THEN 'es'
         |  WHEN strpos(' '||text||' ',' de ')>0 OR strpos(' '||text||' ',' shi ')>0 OR strpos(' '||text||' ',' bu ')>0 THEN 'zh'
         |  ELSE 'en' END AS predicted
         | FROM documents)
         |SELECT doc_id, lang, predicted FROM pr
         |WHERE predicted <> lang ORDER BY doc_id LIMIT 20"""
        .stripMargin.replace("\n", " ")),
    "x377_source_language_purity" ->
      ("""WITH ls AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
         | FROM documents
         | WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_langs,
         | CAST(SUM(c) AS BIGINT) AS n_docs,
         | CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT) AS top_lang_ppm
         |FROM ls GROUP BY 1 ORDER BY source"""
        .stripMargin.replace("\n", " ")),
    "x378_customer_value_maturation" ->
      ("""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         |  o_orderkey,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         | FROM orders
         | WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |per AS (SELECT o_custkey, COUNT(*) AS n,
         |  MIN(struct_pack(d := d, k := o_orderkey, c := c)) AS f,
         |  MAX(struct_pack(d := d, k := o_orderkey, c := c)) AS l
         | FROM o GROUP BY 1),
         |r AS (SELECT f.c AS fc, l.c AS lc FROM per WHERE n >= 2)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_repeat_customers,
         | CAST(SUM(fc) AS BIGINT) AS first_cents_total,
         | CAST(SUM(lc) AS BIGINT) AS last_cents_total,
         | CAST(CAST(SUM(lc) AS HUGEINT) * 1000000 // SUM(fc) AS BIGINT)
         |  - 1000000 AS lift_ppm
         |FROM r""".stripMargin.replace("\n", " ")),
    "x379_label_lang_matrix" ->
      ("""WITH cell AS (SELECT lang, label,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs
         | FROM embeddings JOIN documents ON vec_id = doc_id
         | WHERE label IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
         |rt AS (SELECT lang, SUM(n_docs) AS t FROM cell GROUP BY 1)
         |SELECT cell.lang, label, n_docs,
         | CAST(n_docs * 1000000 // t AS BIGINT) AS lang_share_ppm
         |FROM cell JOIN rt ON rt.lang = cell.lang
         |ORDER BY cell.lang, label""".stripMargin.replace("\n", " ")),
    "x380_whale_leaderboard" ->
      ("""WITH r AS (SELECT o_custkey,
         |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS rev_cents,
         |  CAST(COUNT(*) AS BIGINT) AS n_orders
         | FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1)
         |SELECT c_custkey, c_name, n_name AS nation, n_orders, rev_cents
         |FROM r JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         |ORDER BY rev_cents DESC, c_custkey LIMIT 5"""
        .stripMargin.replace("\n", " ")),
    "x381_wow_volatility" ->
      ("""WITH wk AS (SELECT
         |  CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE)
         |   AS week,
         |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS c
         | FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
         |l AS (SELECT c, LAG(c) OVER (ORDER BY week) AS prev FROM wk),
         |d AS (SELECT CAST(CAST(ABS(c - prev) AS HUGEINT) * 1000000
         |   // prev AS BIGINT) AS chg FROM l WHERE prev IS NOT NULL)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_weeks,
         | CAST(SUM(chg) // COUNT(*) AS BIGINT) AS mean_abs_wow_ppm
         |FROM d""".stripMargin.replace("\n", " ")),
    "x382_token_stutter_census" ->
      ("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents),
         |ix AS (SELECT doc_id, ws, unnest(range(len(ws))) AS i FROM w),
         |t AS (SELECT doc_id, i AS p, ws[i + 1] AS tok FROM ix
         |  WHERE ws[i + 1] <> ''),
         |n AS (SELECT doc_id, p, tok, CASE WHEN LAG(tok) OVER
         |  (PARTITION BY doc_id ORDER BY p) IS DISTINCT FROM tok
         |  THEN 1 ELSE 0 END AS nw FROM t),
         |r AS (SELECT doc_id, SUM(nw) OVER (PARTITION BY doc_id
         |  ORDER BY p ROWS UNBOUNDED PRECEDING) AS run FROM n),
         |rl AS (SELECT doc_id, run, COUNT(*) AS len FROM r GROUP BY 1, 2),
         |mx AS (SELECT doc_id, CAST(MAX(len) AS BIGINT) AS max_run
         |  FROM rl GROUP BY 1)
         |SELECT max_run, CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM mx GROUP BY 1 ORDER BY max_run"""
        .stripMargin.replace("\n", " ")),
    "x383_weekpart_revenue" ->
      ("""WITH o AS (SELECT CASE WHEN isodow(CAST(o_orderdate AS DATE))
         |   >= 6 THEN 'weekend' ELSE 'weekday' END AS weekpart,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         | FROM orders WHERE o_orderdate IS NOT NULL)
         |SELECT weekpart, CAST(COUNT(*) AS BIGINT) AS n_orders,
         | CAST(SUM(c) AS BIGINT) AS rev_cents,
         | CAST(SUM(c) // COUNT(*) AS BIGINT) AS mean_order_cents
         |FROM o GROUP BY 1 ORDER BY weekpart"""
        .stripMargin.replace("\n", " ")),
    "x384_embedding_sign_balance" ->
      ("""WITH m AS (SELECT MAX(vec_id) AS mx FROM embeddings),
         |v AS (SELECT LEAST(vec_id * 10 // (mx + 1), 9) AS decile,
         |  CAST(len(embedding) AS BIGINT) AS dim,
         |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS pos
         | FROM embeddings, m WHERE embedding IS NOT NULL)
         |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         | CAST(SUM(dim) AS BIGINT) AS n_components,
         | CAST(SUM(pos) AS BIGINT) AS n_positive,
         | CAST(SUM(pos) * 1000000 // SUM(dim) AS BIGINT) AS positive_ppm
         |FROM v GROUP BY 1 ORDER BY decile"""
        .stripMargin.replace("\n", " ")),
    "x385_return_by_price_band" ->
      ("""WITH b AS (SELECT CAST(length(format('{:b}',
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)))
         |   - 1 AS INT) AS price_band,
         |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
         | FROM lineitem WHERE l_extendedprice IS NOT NULL
         |  AND l_returnflag IS NOT NULL)
         |SELECT price_band, CAST(COUNT(*) AS BIGINT) AS n_lines,
         | CAST(SUM(r) AS BIGINT) AS n_returns,
         | CAST(SUM(r) * 1000000 // COUNT(*) AS BIGINT) AS return_ppm
         |FROM b GROUP BY 1 ORDER BY price_band"""
        .stripMargin.replace("\n", " ")),
    "x386_attention_concentration" ->
      ("""WITH v AS (SELECT user_id AS i, CAST(COUNT(*) AS BIGINT) AS v
         | FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         |c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
         |o AS (SELECT v, CAST(SUM(cnt) OVER (ORDER BY v) - cnt AS BIGINT)
         |  AS bef, CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM c),
         |r AS (SELECT v.v, o.bef + ROW_NUMBER() OVER (PARTITION BY v.v
         |  ORDER BY v.i) AS rk, o.n FROM v JOIN o USING (v)),
         |gin AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
         |  CAST(SUM(v) AS BIGINT) AS sx,
         |  SUM(CAST(rk AS HUGEINT) * v) AS six FROM r),
         |gp AS (SELECT CAST(2 * six * 1000000 // (CAST(n AS HUGEINT) * sx)
         |  - (n + 1) * 1000000 // n AS BIGINT) AS gini_ppm FROM gin),
         |d AS (SELECT ((rk - 1) * 10 // n) + 1 AS decile,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(v) AS BIGINT)
         |    AS sum_cents FROM r GROUP BY 1),
         |dt AS (SELECT CAST(SUM(sum_cents) AS BIGINT) AS tot FROM d)
         |SELECT CAST(d.decile AS BIGINT) AS decile, d.n_rows, d.sum_cents,
         | d.sum_cents * 1000000 // dt.tot AS share_ppm, gp.gini_ppm
         |FROM d, dt, gp ORDER BY decile""".stripMargin.replace("\n", " ")),
    "x387_supplier_activity_census" ->
      ("""WITH sm AS (SELECT DISTINCT l_suppkey,
         |  date_trunc('month', CAST(l_shipdate AS DATE)) AS m
         | FROM lineitem
         | WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL),
         |am AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT)
         |   AS active_months FROM sm GROUP BY 1)
         |SELECT active_months, CAST(COUNT(*) AS BIGINT) AS n_suppliers
         |FROM am GROUP BY 1 ORDER BY active_months"""
        .stripMargin.replace("\n", " ")),
    "x388_hourly_error_rate" ->
      ("""SELECT date_part('hour', ts) AS hh,
         | CAST(COUNT(*) AS BIGINT) AS n_events,
         | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         |  AS BIGINT) AS n_errors,
         | CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         |  * 1000000 // COUNT(*) AS BIGINT) AS error_ppm
         |FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
         |GROUP BY 1 ORDER BY hh""".stripMargin.replace("\n", " ")),
    "x389_size_value_curve" ->
      ("""SELECT p_size, CAST(COUNT(*) AS BIGINT) AS n_parts,
         | CAST(SUM(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
         |  AS BIGINT)) // COUNT(*) AS BIGINT) AS mean_retail_cents
         |FROM part
         |WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
         |GROUP BY 1 ORDER BY p_size""".stripMargin.replace("\n", " ")),
    "x390_market_mix_drift" ->
      ("""WITH cell AS (SELECT year(CAST(o_orderdate AS DATE)) AS yr,
         |  n_name AS p, COUNT(*) AS n
         | FROM orders JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         | WHERE o_orderdate IS NOT NULL GROUP BY 1, 2),
         |yt AS (SELECT yr, SUM(n) AS t FROM cell GROUP BY 1),
         |sh AS (SELECT cell.yr, p, CAST(n * 1000000 // t AS BIGINT) AS s
         |  FROM cell JOIN yt ON yt.yr = cell.yr),
         |spine AS (SELECT yt.yr, pr.p FROM yt
         |  CROSS JOIN (SELECT DISTINCT p FROM cell) pr),
         |f AS (SELECT spine.yr, spine.p, COALESCE(sh.s, 0) AS s
         |  FROM spine LEFT JOIN sh ON sh.yr = spine.yr
         |   AND sh.p = spine.p),
         |lg AS (SELECT yr, p, s,
         |  LAG(s) OVER (PARTITION BY p ORDER BY yr) AS prev FROM f)
         |SELECT yr, CAST(SUM(ABS(s - prev)) AS BIGINT) AS l1_drift_ppm,
         | CAST(COUNT(*) AS BIGINT) AS n_categories
         |FROM lg WHERE prev IS NOT NULL GROUP BY 1 ORDER BY yr"""
        .stripMargin.replace("\n", " ")),
    "x391_doc_length_quantiles" ->
      ("""WITH gv AS (SELECT source, n_chars, COUNT(*) AS w
         | FROM documents
         | WHERE source IS NOT NULL AND n_chars IS NOT NULL GROUP BY 1, 2),
         |cum AS (SELECT source, n_chars, w,
         |  SUM(w) OVER (PARTITION BY source ORDER BY n_chars) AS cw,
         |  SUM(w) OVER (PARTITION BY source) AS tw FROM gv)
         |SELECT source, p.p_pct, CAST(MIN(n_chars) AS BIGINT)
         |  AS n_chars_q, CAST(MAX(tw) AS BIGINT) AS n_docs
         |FROM cum CROSS JOIN (VALUES (50), (90)) p(p_pct)
         |WHERE cw * 100 >= p.p_pct * tw
         |GROUP BY 1, 2 ORDER BY source, p_pct"""
        .stripMargin.replace("\n", " ")),
    "x392_reorder_gap_spectrum" ->
      ("""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         |  o_orderkey FROM orders
         | WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |g AS (SELECT CAST(d - LAG(d) OVER
         |  (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS BIGINT)
         |   AS v FROM o),
         |b AS (SELECT v, CAST(length(bin(v)) - 1 AS INT) AS bucket
         |  FROM g WHERE v >= 1)
         |SELECT bucket, CAST(1 AS BIGINT) << bucket AS bucket_lo,
         | (CAST(1 AS BIGINT) << (bucket + 1)) - 1 AS bucket_hi,
         | CAST(COUNT(*) AS BIGINT) AS n,
         | CAST(MIN(v) AS BIGINT) AS min_v, CAST(MAX(v) AS BIGINT) AS max_v
         |FROM b GROUP BY 1 ORDER BY bucket"""
        .stripMargin.replace("\n", " ")),
    "x393_balance_band_repeat" ->
      ("""WITH po AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS no
         | FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
         |c AS (SELECT CASE
         |   WHEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    < 0 THEN '1_negative'
         |   WHEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    < 500000 THEN '2_low' ELSE '3_high' END AS bal_band,
         |  COALESCE(po.no, 0) AS no
         | FROM customer LEFT JOIN po ON c_custkey = po.o_custkey)
         |SELECT bal_band, CAST(COUNT(*) AS BIGINT) AS n_customers,
         | CAST(SUM(CASE WHEN no >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_repeat,
         | CAST(SUM(CASE WHEN no >= 2 THEN 1 ELSE 0 END) * 1000000
         |  // COUNT(*) AS BIGINT) AS repeat_ppm
         |FROM c GROUP BY 1 ORDER BY bal_band"""
        .stripMargin.replace("\n", " ")),
    "x394_region_assortment_breadth" ->
      ("""WITH rp AS (SELECT DISTINCT r_name AS region, l_partkey
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         | WHERE l_partkey IS NOT NULL),
         |cat AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM part)
         |SELECT region, CAST(COUNT(*) AS BIGINT) AS n_distinct_parts,
         | CAST(COUNT(*) * 1000000 // c AS BIGINT) AS catalog_ppm
         |FROM rp, cat GROUP BY region, c ORDER BY region"""
        .stripMargin.replace("\n", " ")),
    "x395_weekday_discount_profile" ->
      ("""SELECT CAST(isodow(CAST(o_orderdate AS DATE)) AS INT)
         |  AS iso_dow,
         | CAST(COUNT(*) AS BIGINT) AS n_lines,
         | CAST(SUM(CAST(CAST(l_discount AS DECIMAL(8,6)) * 1000000
         |  AS BIGINT)) // COUNT(*) AS BIGINT) AS mean_discount_ppm
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_discount IS NOT NULL AND o_orderdate IS NOT NULL
         |GROUP BY 1 ORDER BY iso_dow""".stripMargin.replace("\n", " ")),
    "x396_user_engagement_quadrants" ->
      ("""WITH per AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE)) AS BIGINT)
         |   AS span
         | FROM events
         | WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1),
         |sv AS (SELECT span AS v, COUNT(*) AS c FROM per GROUP BY 1),
         |sc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
         |  SUM(c) OVER () AS t FROM sv),
         |ms AS (SELECT MIN(v) AS ms FROM sc WHERE cum * 2 >= t),
         |nv AS (SELECT n AS v, COUNT(*) AS c FROM per GROUP BY 1),
         |nc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
         |  SUM(c) OVER () AS t FROM nv),
         |mn AS (SELECT MIN(v) AS mn FROM nc WHERE cum * 2 >= t)
         |SELECT CASE WHEN span > ms THEN 'long_span' ELSE 'short_span'
         |  END AS span_side,
         | CASE WHEN n > mn THEN 'hi_events' ELSE 'lo_events' END
         |  AS volume_side,
         | CAST(COUNT(*) AS BIGINT) AS n_users
         |FROM per, ms, mn GROUP BY 1, 2
         |ORDER BY span_side, volume_side"""
        .stripMargin.replace("\n", " ")),
    "x397_brand_premium_index" ->
      ("""WITH li AS (SELECT p_brand AS brand,
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   AS c
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE p_brand IS NOT NULL AND l_extendedprice IS NOT NULL),
         |g AS (SELECT CAST(SUM(c) // COUNT(*) AS BIGINT) AS gm FROM li)
         |SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
         | CAST(SUM(c) // COUNT(*) AS BIGINT) AS mean_line_cents,
         | CAST(CAST(SUM(c) // COUNT(*) AS HUGEINT) * 1000000 // gm
         |  AS BIGINT) AS premium_ppm
         |FROM li, g GROUP BY brand, gm ORDER BY brand"""
        .stripMargin.replace("\n", " ")),
    "x398_dup_degree_census" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |adj AS (SELECT DISTINCT doc, nb FROM (
         |  SELECT d1 AS doc, d2 AS nb FROM jpairs
         |  UNION ALL SELECT d2, d1 FROM jpairs)),
         |dg AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS degree FROM adj
         |  GROUP BY 1)
         |SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM dg GROUP BY 1 ORDER BY degree"""
        .stripMargin.replace("\n", " ")),
    "x399_value_mass_vs_traffic" ->
      ("""WITH t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT)
         |   AS n_events,
         |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
         |   AS BIGINT) AS value_cents
         | FROM events
         | WHERE event_type IS NOT NULL AND value IS NOT NULL GROUP BY 1),
         |tt AS (SELECT SUM(n_events) AS te, SUM(value_cents) AS tv FROM t)
         |SELECT event_type, n_events, value_cents,
         | CAST(n_events * 1000000 // te AS BIGINT) AS event_share_ppm,
         | CAST(CAST(value_cents AS HUGEINT) * 1000000 // tv AS BIGINT)
         |  AS value_share_ppm
         |FROM t, tt ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),
    "x400_corpus_master_report" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |$qualityCtes,
         |base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         | FROM documents),
         |q AS (SELECT CAST(SUM(CAST(FLOOR(score * 1000) AS BIGINT))
         |  // COUNT(*) AS BIGINT) AS mean_quality_milli FROM qscore),
         |dup AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM
         |  (SELECT DISTINCT d FROM (SELECT d1 AS d FROM jpairs
         |   UNION ALL SELECT d2 FROM jpairs)))
         |SELECT n_docs, n_langs, n_sources, n_tokens, mean_quality_milli,
         | CAST(nd * 1000000 // n_docs AS BIGINT) AS dup_doc_ppm
         |FROM base, q, dup""".stripMargin.replace("\n", " ")),
    "x401_chronic_supplier_streaks" ->
      ("""WITH sm AS (SELECT l_suppkey,
         |  year(CAST(l_shipdate AS DATE)) * 12 +
         |   month(CAST(l_shipdate AS DATE)) AS mi,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |   AS BIGINT) AS r
         | FROM lineitem WHERE l_suppkey IS NOT NULL
         |  AND l_shipdate IS NOT NULL AND l_returnflag IS NOT NULL
         | GROUP BY 1, 2 HAVING SUM(CASE WHEN l_returnflag = 'R' THEN 1
         |  ELSE 0 END) * 3 > COUNT(*)),
         |g AS (SELECT l_suppkey, mi - ROW_NUMBER() OVER
         |  (PARTITION BY l_suppkey ORDER BY mi) AS grp FROM sm),
         |st AS (SELECT l_suppkey, grp, COUNT(*) AS len FROM g
         |  GROUP BY 1, 2),
         |mx AS (SELECT l_suppkey, CAST(MAX(len) AS BIGINT)
         |   AS bad_streak_months FROM st GROUP BY 1)
         |SELECT bad_streak_months, CAST(COUNT(*) AS BIGINT)
         |  AS n_suppliers
         |FROM mx GROUP BY 1 ORDER BY bad_streak_months"""
        .stripMargin.replace("\n", " ")),
    "x402_price_ladder_integrity" ->
      ("""SELECT p_type, p_size, CAST(COUNT(*) AS BIGINT) AS n_parts,
         | CAST(MIN(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
         |  AS BIGINT)) AS BIGINT) AS min_cents,
         | CAST(MAX(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
         |  AS BIGINT)) AS BIGINT) AS max_cents,
         | CAST(CAST(MAX(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
         |  AS BIGINT)) AS HUGEINT) * 1000000
         |  // MIN(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100
         |  AS BIGINT)) AS BIGINT) - 1000000 AS spread_ppm
         |FROM part
         |WHERE p_type IS NOT NULL AND p_size IS NOT NULL
         | AND p_retailprice IS NOT NULL
         |GROUP BY 1, 2 ORDER BY p_type, p_size"""
        .stripMargin.replace("\n", " ")),
    "x403_nation_segment_skew" ->
      ("""WITH cells AS (SELECT n_name, c_mktsegment,
         |  CAST(COUNT(*) AS BIGINT) AS observed
         | FROM customer JOIN nation ON c_nationkey = n_nationkey
         | WHERE n_name IS NOT NULL AND c_mktsegment IS NOT NULL
         | GROUP BY 1, 2),
         |rt AS (SELECT n_name, CAST(SUM(observed) AS BIGINT) AS rt
         |  FROM cells GROUP BY 1),
         |ct AS (SELECT c_mktsegment, CAST(SUM(observed) AS BIGINT) AS ct
         |  FROM cells GROUP BY 1),
         |n AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM cells)
         |SELECT cells.n_name, cells.c_mktsegment, observed,
         | CAST(CAST(rt AS HUGEINT) * ct * 1000 // n AS BIGINT)
         |  AS expected_milli,
         | CAST((CAST(observed AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
         |   * (CAST(observed AS HUGEINT) * n - CAST(rt AS HUGEINT) * ct)
         |   * 1000000 // (CAST(n AS HUGEINT) * rt * ct) AS BIGINT)
         |   AS contrib_micro
         |FROM cells JOIN rt ON rt.n_name = cells.n_name
         | JOIN ct ON ct.c_mktsegment = cells.c_mktsegment, n
         |ORDER BY cells.n_name, cells.c_mktsegment"""
        .stripMargin.replace("\n", " ")),
    "x404_return_by_quantity" ->
      ("""SELECT CAST(CAST(l_quantity AS BIGINT) // 10 AS INT)
         |  AS qty_band,
         | CAST(COUNT(*) AS BIGINT) AS n_lines,
         | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |  AS BIGINT) AS n_returns,
         | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |  * 1000000 // COUNT(*) AS BIGINT) AS return_ppm
         |FROM lineitem
         |WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
         |GROUP BY 1 ORDER BY qty_band""".stripMargin.replace("\n", " ")),
    "x405_vector_collision_census" ->
      ("""WITH e AS (SELECT CASE WHEN vec_id % 97 = 0
         |   THEN list_transform(embedding, x -> CAST(0.5 AS FLOAT))
         |   ELSE embedding END AS embedding
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |fam AS (SELECT embedding, CAST(COUNT(*) AS BIGINT)
         |   AS family_size
         | FROM e GROUP BY 1)
         |SELECT family_size, CAST(COUNT(*) AS BIGINT) AS n_families,
         | CAST(SUM(family_size) AS BIGINT) AS n_vectors
         |FROM fam GROUP BY 1 ORDER BY family_size"""
        .stripMargin.replace("\n", " ")),
    "x406_brand_assortment_span" ->
      ("""WITH t AS (SELECT CAST(COUNT(DISTINCT p_type) AS BIGINT) AS tt,
         |  CAST(COUNT(DISTINCT p_size) AS BIGINT) AS ts FROM part
         | WHERE p_brand IS NOT NULL)
         |SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
         | CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types,
         | CAST(COUNT(DISTINCT p_size) AS BIGINT) AS n_sizes,
         | CAST(COUNT(DISTINCT p_type) * 1000000 // tt AS BIGINT)
         |  AS type_coverage_ppm,
         | CAST(COUNT(DISTINCT p_size) * 1000000 // ts AS BIGINT)
         |  AS size_coverage_ppm
         |FROM part, t WHERE p_brand IS NOT NULL
         |GROUP BY p_brand, tt, ts ORDER BY brand"""
        .stripMargin.replace("\n", " ")),
    "x407_value_by_tenure" ->
      ("""WITH e AS (SELECT user_id, ts,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |  AND value IS NOT NULL),
         |f AS (SELECT user_id, MIN(ts) AS ft FROM e GROUP BY 1),
         |b AS (SELECT CASE
         |   WHEN CAST(e.ts AS DATE) - CAST(f.ft AS DATE) = 0
         |    THEN '1_day0'
         |   WHEN CAST(e.ts AS DATE) - CAST(f.ft AS DATE) <= 7
         |    THEN '2_week1'
         |   WHEN CAST(e.ts AS DATE) - CAST(f.ft AS DATE) <= 14
         |    THEN '3_week2'
         |   ELSE '4_later' END AS tenure_band, c
         | FROM e JOIN f ON f.user_id = e.user_id)
         |SELECT tenure_band, CAST(COUNT(*) AS BIGINT) AS n_events,
         | CAST(SUM(c) // COUNT(*) AS BIGINT) AS mean_value_cents
         |FROM b GROUP BY 1 ORDER BY tenure_band"""
        .stripMargin.replace("\n", " ")),
    "x408_orphan_vector_audit" ->
      ("""WITH e AS (SELECT label, CASE WHEN vec_id % 89 = 0
         |   THEN -vec_id - 1 ELSE vec_id END AS vid FROM embeddings)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
         | CAST(SUM(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END)
         |  AS BIGINT) AS n_orphans,
         | CAST(SUM(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END)
         |  * 1000000 // COUNT(*) AS BIGINT) AS orphan_ppm
         |FROM e LEFT JOIN (SELECT doc_id FROM documents) d
         | ON vid = d.doc_id
         |GROUP BY 1 ORDER BY label""".stripMargin.replace("\n", " ")),
    "x409_cohort_ltv_triangle" ->
      ("""WITH o AS (SELECT o_custkey,
         |  year(CAST(o_orderdate AS DATE)) AS y,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         | FROM orders
         | WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |ch AS (SELECT o_custkey, MIN(y) AS cohort_year FROM o
         |  GROUP BY 1),
         |sz AS (SELECT cohort_year, CAST(COUNT(*) AS BIGINT)
         |   AS cohort_customers FROM ch GROUP BY 1),
         |m AS (SELECT ch.cohort_year, o.y AS order_year,
         |  CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  CAST(SUM(c) AS BIGINT) AS rev_cents
         | FROM o JOIN ch ON ch.o_custkey = o.o_custkey GROUP BY 1, 2)
         |SELECT m.cohort_year, order_year, cohort_customers, n_orders,
         | rev_cents
         |FROM m JOIN sz ON sz.cohort_year = m.cohort_year
         |ORDER BY m.cohort_year, order_year"""
        .stripMargin.replace("\n", " ")),
    "x410_line_position_curve" ->
      ("""SELECT l_linenumber, CAST(COUNT(*) AS BIGINT) AS n_lines,
         | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |  AS BIGINT)) // COUNT(*) AS BIGINT) AS mean_line_cents
         |FROM lineitem
         |WHERE l_linenumber IS NOT NULL AND l_extendedprice IS NOT NULL
         |GROUP BY 1 ORDER BY l_linenumber"""
        .stripMargin.replace("\n", " ")),
    "x411_regional_taste_table" ->
      ("""WITH cell AS (SELECT n_name AS nation, p_type,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS c
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN part ON l_partkey = p_partkey
         | WHERE p_type IS NOT NULL GROUP BY 1, 2),
         |mx AS (SELECT nation, MAX(c) AS m, SUM(c) AS t FROM cell
         |  GROUP BY 1)
         |SELECT cell.nation, MIN(p_type) AS top_type,
         | CAST(MAX(m) AS BIGINT) AS top_rev_cents,
         | CAST(CAST(MAX(m) AS HUGEINT) * 1000000 // MAX(t) AS BIGINT)
         |  AS top_share_ppm
         |FROM cell JOIN mx ON mx.nation = cell.nation AND cell.c = mx.m
         |GROUP BY 1 ORDER BY cell.nation"""
        .stripMargin.replace("\n", " ")),
    "x412_discount_effectiveness" ->
      ("""SELECT CAST(CAST(l_discount AS DECIMAL(8,6)) * 100 AS INT)
         |  AS discount_pct,
         | CAST(COUNT(*) AS BIGINT) AS n_lines,
         | CAST(SUM(CAST(l_quantity AS BIGINT)) * 1000 // COUNT(*)
         |  AS BIGINT) AS mean_qty_milli
         |FROM lineitem
         |WHERE l_discount IS NOT NULL AND l_quantity IS NOT NULL
         |GROUP BY 1 ORDER BY discount_pct"""
        .stripMargin.replace("\n", " ")),
    "x413_feature_domain_audit" ->
      ("""WITH e AS (SELECT CAST(REGEXP_EXTRACT(props,
         |   '"k":\s*(-?\d+)', 1) AS INT) AS k FROM events)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         | CAST(SUM(CASE WHEN k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_with_k,
         | CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k,
         | CAST(MIN(k) AS BIGINT) AS min_k,
         | CAST(MAX(k) AS BIGINT) AS max_k,
         | CAST(MAX(k) - MIN(k) + 1 - COUNT(DISTINCT k) AS BIGINT)
         |  AS n_holes
         |FROM e""".stripMargin.replace("\n", " ")),
    "x414_catalog_name_vocab" ->
      ("""WITH t AS (SELECT unnest(string_split(p_name, ' ')) AS token
         | FROM part WHERE p_name IS NOT NULL)
         |SELECT token, CAST(COUNT(*) AS BIGINT) AS n_parts
         |FROM t WHERE token <> ''
         |GROUP BY 1 ORDER BY n_parts DESC, token LIMIT 20"""
        .stripMargin.replace("\n", " ")),
    "x415_denormalized_name_audit" ->
      ("""WITH c AS (SELECT 'customer' AS relation,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN TRY_CAST(REGEXP_EXTRACT(c_name,
         |    '#([0-9]+)', 1) AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_parseable,
         |  CAST(SUM(CASE WHEN TRY_CAST(REGEXP_EXTRACT(c_name,
         |    '#([0-9]+)', 1) AS BIGINT) = c_custkey THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_match
         | FROM customer),
         |s AS (SELECT 'supplier' AS relation,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN TRY_CAST(REGEXP_EXTRACT(s_name,
         |    '#([0-9]+)', 1) AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_parseable,
         |  CAST(SUM(CASE WHEN TRY_CAST(REGEXP_EXTRACT(s_name,
         |    '#([0-9]+)', 1) AS BIGINT) = s_suppkey THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_match
         | FROM supplier),
         |u AS (SELECT * FROM c UNION ALL SELECT * FROM s)
         |SELECT relation, n_rows, n_parseable, n_match,
         | n_parseable - n_match AS n_mismatch
         |FROM u ORDER BY relation""".stripMargin.replace("\n", " ")),
    "x416_domain_constraint_audit" ->
      ("""WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN l_extendedprice <= 0
         |   OR l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   AS v1,
         |  CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
         |   OR l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         |  CAST(SUM(CASE WHEN l_tax < 0 OR l_tax > 0.08
         |   OR l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v3,
         |  CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
         |   OR l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v4
         | FROM lineitem)
         |SELECT p.check_name, n AS n_checked, p.n_violations
         |FROM a, LATERAL (VALUES ('price_positive', v1),
         |  ('discount_0_to_10pct', v2), ('tax_0_to_8pct', v3),
         |  ('quantity_1_to_50', v4)) p(check_name, n_violations)
         |ORDER BY p.check_name""".stripMargin.replace("\n", " ")),
    "x417_brand_penetration" ->
      ("""WITH ob AS (SELECT DISTINCT l_orderkey AS o, p_brand AS brand
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE l_orderkey IS NOT NULL AND p_brand IS NOT NULL),
         |t AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS tt FROM ob)
         |SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_orders,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS penetration_ppm
         |FROM ob, t GROUP BY brand, tt ORDER BY brand"""
        .stripMargin.replace("\n", " ")),
    "x418_quality_by_ingest_decile" ->
      (s"""WITH $qualityCtes,
         |m AS (SELECT MAX(doc_id) AS mx FROM documents),
         |d AS (SELECT LEAST(q.doc_id * 10 // (mx + 1), 9) AS decile,
         |  CAST(FLOOR(score * 1000) AS BIGINT) AS qm
         | FROM qscore q, m)
         |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(qm) // COUNT(*) AS BIGINT) AS mean_quality_milli
         |FROM d GROUP BY 1 ORDER BY decile"""
        .stripMargin.replace("\n", " ")),
    "x419_transition_asymmetry" ->
      ("""WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |   AND event_type IS NOT NULL),
         |tr0 AS (SELECT event_type AS a, LEAD(event_type) OVER
         |  (PARTITION BY user_id ORDER BY ts, event_id) AS b FROM e),
         |tr AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM tr0
         | WHERE b IS NOT NULL AND b <> a GROUP BY 1, 2),
         |fwd AS (SELECT a AS type_1, b AS type_2, n AS n_forward
         |  FROM tr WHERE a < b),
         |bwd AS (SELECT b AS type_1, a AS type_2, n AS n_backward
         |  FROM tr WHERE a > b)
         |SELECT COALESCE(fwd.type_1, bwd.type_1) AS type_1,
         | COALESCE(fwd.type_2, bwd.type_2) AS type_2,
         | COALESCE(n_forward, 0) AS n_forward,
         | COALESCE(n_backward, 0) AS n_backward,
         | COALESCE(n_forward, 0) - COALESCE(n_backward, 0) AS net_flow
         |FROM fwd FULL JOIN bwd ON fwd.type_1 = bwd.type_1
         | AND fwd.type_2 = bwd.type_2
         |ORDER BY type_1, type_2""".stripMargin.replace("\n", " ")),
    "x420_seasonal_peak_alignment" ->
      ("""WITH cell AS (SELECT p_brand AS brand,
         |  month(CAST(o_orderdate AS DATE)) AS mo,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS c
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN part ON l_partkey = p_partkey
         | WHERE p_brand IS NOT NULL AND o_orderdate IS NOT NULL
         | GROUP BY 1, 2),
         |pk AS (SELECT brand, MIN(mo) AS peak FROM cell
         |  JOIN (SELECT brand AS b2, MAX(c) AS m FROM cell GROUP BY 1) x
         |   ON x.b2 = cell.brand AND cell.c = x.m
         | GROUP BY 1),
         |bp AS (SELECT peak, CAST(COUNT(*) AS BIGINT) AS cnt FROM pk
         |  GROUP BY 1),
         |mx AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_brands FROM bp),
         |md AS (SELECT peak, cnt FROM bp
         |  ORDER BY cnt DESC, peak LIMIT 1)
         |SELECT n_brands, CAST(md.peak AS BIGINT) AS modal_peak_month,
         | md.cnt AS n_at_modal,
         | CAST(md.cnt * 1000000 // n_brands AS BIGINT) AS alignment_ppm
         |FROM mx, md""".stripMargin.replace("\n", " ")),
    "x421_corpus_aa_audit" ->
      (s"""WITH $qualityCtes,
         |m AS (SELECT d.doc_id % 2 = 0 AS a, d.n_chars,
         |  len(string_split(d.text, ' ')) AS tok,
         |  CAST(FLOOR(q.score * 1000) AS BIGINT) AS qm
         | FROM documents d JOIN qscore q ON q.doc_id = d.doc_id),
         |agg AS (SELECT
         |  CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na,
         |  CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS nb,
         |  CAST(SUM(CASE WHEN a THEN n_chars ELSE 0 END) AS BIGINT) AS ca,
         |  CAST(SUM(CASE WHEN a THEN 0 ELSE n_chars END) AS BIGINT) AS cb,
         |  CAST(SUM(CASE WHEN a THEN tok ELSE 0 END) AS BIGINT) AS ta,
         |  CAST(SUM(CASE WHEN a THEN 0 ELSE tok END) AS BIGINT) AS tb,
         |  CAST(SUM(CASE WHEN a THEN qm ELSE 0 END) AS BIGINT) AS qa,
         |  CAST(SUM(CASE WHEN a THEN 0 ELSE qm END) AS BIGINT) AS qb
         | FROM m)
         |SELECT p.metric, na AS n_a, nb AS n_b,
         | p.a_value, p.b_value, p.a_value - p.b_value AS delta
         |FROM agg, LATERAL (VALUES
         |  ('mean_chars', ca // na, cb // nb),
         |  ('mean_tokens', ta // na, tb // nb),
         |  ('mean_quality_milli', qa // na, qb // nb))
         |  p(metric, a_value, b_value)
         |ORDER BY p.metric""".stripMargin.replace("\n", " ")),
    "x422_events_domain_audit" ->
      ("""WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN value < 0 OR value IS NULL THEN 1 ELSE 0
         |   END) AS BIGINT) AS v1,
         |  CAST(SUM(CASE WHEN ts IS NULL
         |   OR ts < TIMESTAMP '2024-01-01 00:00:00'
         |   OR ts >= TIMESTAMP '2024-02-01 00:00:00' THEN 1 ELSE 0 END)
         |   AS BIGINT) AS v2,
         |  CAST(SUM(CASE WHEN event_type IS NULL OR event_type NOT IN
         |   ('view', 'click', 'signup', 'purchase', 'error')
         |   THEN 1 ELSE 0 END) AS BIGINT) AS v3
         | FROM events)
         |SELECT p.check_name, n AS n_checked, p.n_violations
         |FROM a, LATERAL (VALUES ('value_nonnegative', v1),
         |  ('ts_in_window', v2), ('type_in_enum', v3))
         |  p(check_name, n_violations)
         |ORDER BY p.check_name""".stripMargin.replace("\n", " ")),
    "x423_language_ingest_drift" ->
      ("""WITH m AS (SELECT MAX(doc_id) AS mx FROM documents),
         |cell AS (SELECT LEAST(doc_id * 10 // (mx + 1), 9) AS decile,
         |  lang AS p, COUNT(*) AS n FROM documents, m
         | WHERE lang IS NOT NULL GROUP BY 1, 2),
         |yt AS (SELECT decile, SUM(n) AS t FROM cell GROUP BY 1),
         |sh AS (SELECT cell.decile, p, CAST(n * 1000000 // t AS BIGINT)
         |   AS s FROM cell JOIN yt ON yt.decile = cell.decile),
         |spine AS (SELECT yt.decile, pr.p FROM yt
         |  CROSS JOIN (SELECT DISTINCT p FROM cell) pr),
         |f AS (SELECT spine.decile, spine.p, COALESCE(sh.s, 0) AS s
         |  FROM spine LEFT JOIN sh ON sh.decile = spine.decile
         |   AND sh.p = spine.p),
         |lg AS (SELECT decile, p, s,
         |  LAG(s) OVER (PARTITION BY p ORDER BY decile) AS prev FROM f)
         |SELECT decile, CAST(SUM(ABS(s - prev)) AS BIGINT)
         |  AS l1_drift_ppm,
         | CAST(COUNT(*) AS BIGINT) AS n_categories
         |FROM lg WHERE prev IS NOT NULL GROUP BY 1 ORDER BY decile"""
        .stripMargin.replace("\n", " ")),
    "x424_token_hash_balance" ->
      ("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |vc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w
         |  WHERE w <> '' GROUP BY 1),
         |b AS (SELECT CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT)
         |   % 32 AS bucket, CAST(SUM(c) AS BIGINT) AS n_tokens
         | FROM vc GROUP BY 1),
         |t AS (SELECT SUM(n_tokens) AS tt FROM b)
         |SELECT bucket, n_tokens,
         | CAST(CAST(n_tokens AS HUGEINT) * 32000000 // tt AS BIGINT)
         |  AS load_ppm
         |FROM b, t ORDER BY bucket""".stripMargin.replace("\n", " ")),
    "x425_order_day_coverage" ->
      ("""WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d
         | FROM orders WHERE o_orderdate IS NOT NULL),
         |g AS (SELECT CAST(date_trunc('month', d) AS DATE) AS month,
         |  date_part('day', last_day(d)) AS n_days,
         |  CAST(COUNT(*) AS BIGINT) AS n_active_days
         | FROM d GROUP BY 1, 2)
         |SELECT month, n_days, n_active_days,
         | CAST(n_active_days * 1000000 // n_days AS BIGINT)
         |  AS coverage_ppm
         |FROM g ORDER BY month""".stripMargin.replace("\n", " ")),
    "x426_dedup_threshold_margin" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(SUM(CASE WHEN jaccard < 0.72 THEN 1 ELSE 0 END)
         |   AS BIGINT) AS n_borderline
         | FROM jpairs)
         |SELECT n_pairs, n_borderline,
         | CASE WHEN n_pairs > 0
         |  THEN CAST(n_borderline * 1000000 // n_pairs AS BIGINT)
         |  ELSE CAST(0 AS BIGINT) END AS borderline_ppm
         |FROM a""".stripMargin.replace("\n", " ")),
    "x427_catalog_name_collisions" ->
      ("""WITH fam AS (SELECT p_name, CAST(COUNT(*) AS BIGINT)
         |   AS family_size
         | FROM part WHERE p_name IS NOT NULL GROUP BY 1)
         |SELECT family_size, CAST(COUNT(*) AS BIGINT) AS n_names,
         | CAST(SUM(family_size) AS BIGINT) AS n_parts
         |FROM fam GROUP BY 1 ORDER BY family_size"""
        .stripMargin.replace("\n", " ")),
    "x428_sessions_per_user_census" ->
      ("""WITH e AS (SELECT user_id, ts, event_id FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |l AS (SELECT user_id, CASE WHEN LAG(ts) OVER
         |  (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |  OR epoch_us(ts) - epoch_us(LAG(ts) OVER
         |   (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
         |  THEN 1 ELSE 0 END AS nw FROM e),
         |s AS (SELECT user_id, CAST(SUM(nw) AS BIGINT) AS n_sessions
         | FROM l GROUP BY 1)
         |SELECT n_sessions, CAST(COUNT(*) AS BIGINT) AS n_users
         |FROM s GROUP BY 1 ORDER BY n_sessions"""
        .stripMargin.replace("\n", " ")),
    "x429_brand_price_architecture" ->
      ("""WITH cell AS (SELECT p_brand AS brand,
         |  CAST(length(format('{:b}',
         |   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |    AS BIGINT))) - 1 AS INT) AS price_band,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE p_brand IS NOT NULL AND l_extendedprice IS NOT NULL
         | GROUP BY 1, 2),
         |bt AS (SELECT brand, SUM(n_lines) AS t FROM cell GROUP BY 1)
         |SELECT cell.brand, price_band, n_lines,
         | CAST(n_lines * 1000000 // t AS BIGINT) AS share_ppm
         |FROM cell JOIN bt ON bt.brand = cell.brand
         |ORDER BY cell.brand, price_band"""
        .stripMargin.replace("\n", " ")),
    "x430_ship_delay_trend" ->
      ("""SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE))
         |  AS DATE) AS month,
         | CAST(COUNT(*) AS BIGINT) AS n_lines,
         | CAST(SUM(CAST(CAST(l_shipdate AS DATE) -
         |  CAST(o_orderdate AS DATE) AS BIGINT)) * 1000 // COUNT(*)
         |  AS BIGINT) AS mean_delay_milli_days
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate IS NOT NULL AND o_orderdate IS NOT NULL
         |GROUP BY 1 ORDER BY month""".stripMargin.replace("\n", " ")),
    "x431_catalog_price_drift" ->
      ("""WITH m AS (SELECT MAX(p_partkey) AS mx FROM part),
         |d AS (SELECT LEAST(p_partkey * 10 // (mx + 1), 9) AS decile,
         |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   AS c
         | FROM part, m WHERE p_retailprice IS NOT NULL)
         |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_parts,
         | CAST(SUM(c) // COUNT(*) AS BIGINT) AS mean_retail_cents
         |FROM d GROUP BY 1 ORDER BY decile"""
        .stripMargin.replace("\n", " ")),
    "x432_value_weighted_returns" ->
      ("""SELECT p_brand AS brand,
         | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |  AS BIGINT)) AS BIGINT) AS rev_cents,
         | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |  ELSE 0 END) AS BIGINT) AS returned_cents,
         | CAST(CAST(SUM(CASE WHEN l_returnflag = 'R' THEN
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |  ELSE 0 END) AS HUGEINT) * 1000000
         |  // SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |  AS BIGINT)) AS BIGINT) AS returned_value_ppm
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_brand IS NOT NULL AND l_returnflag IS NOT NULL
         | AND l_extendedprice IS NOT NULL
         |GROUP BY 1 ORDER BY brand""".stripMargin.replace("\n", " ")),
    "x433_weekday_habit_census" ->
      ("""WITH cd AS (SELECT o_custkey,
         |  isodow(CAST(o_orderdate AS DATE)) AS dow,
         |  CAST(COUNT(*) AS BIGINT) AS c
         | FROM orders
         | WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
         | GROUP BY 1, 2),
         |per AS (SELECT CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT)
         |   AS ppm FROM cd GROUP BY o_custkey HAVING SUM(c) >= 4)
         |SELECT CAST(ppm // 100000 AS INT) AS habit_band,
         | CAST(COUNT(*) AS BIGINT) AS n_customers
         |FROM per GROUP BY 1 ORDER BY habit_band"""
        .stripMargin.replace("\n", " ")),
    "x434_quality_length_grid" ->
      (s"""WITH $qualityCtes,
         |g AS (SELECT CASE WHEN q.score >= 0.5 THEN 'hi' ELSE 'lo' END
         |   AS quality_band,
         |  CAST(length(format('{:b}', d.n_chars)) - 1 AS INT)
         |   AS len_band
         | FROM documents d JOIN qscore q ON q.doc_id = d.doc_id
         | WHERE d.n_chars > 0)
         |SELECT quality_band, len_band, CAST(COUNT(*) AS BIGINT)
         |  AS n_docs
         |FROM g GROUP BY 1, 2 ORDER BY quality_band, len_band"""
        .stripMargin.replace("\n", " ")),
    "x435_reorder_cadence_trend" ->
      ("""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         |  o_orderkey FROM orders
         | WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |g AS (SELECT year(d) AS yr, CAST(d - LAG(d) OVER
         |  (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS BIGINT)
         |   AS gap FROM o),
         |gv AS (SELECT yr, gap AS v, COUNT(*) AS c FROM g
         |  WHERE gap IS NOT NULL GROUP BY 1, 2),
         |cum AS (SELECT yr, v, SUM(c) OVER (PARTITION BY yr ORDER BY v)
         |   AS cw, SUM(c) OVER (PARTITION BY yr) AS tw FROM gv)
         |SELECT yr, CAST(MIN(v) AS BIGINT) AS median_gap_days,
         | CAST(MAX(tw) AS BIGINT) AS n_gaps
         |FROM cum WHERE cw * 2 >= tw GROUP BY 1 ORDER BY yr"""
        .stripMargin.replace("\n", " ")),
    "x436_acquisition_curve" ->
      ("""WITH fq AS (SELECT o_custkey,
         |  CAST(date_trunc('quarter', MIN(CAST(o_orderdate AS DATE)))
         |   AS DATE) AS quarter
         | FROM orders
         | WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
         | GROUP BY 1),
         |q AS (SELECT quarter, CAST(COUNT(*) AS BIGINT)
         |   AS n_new_customers FROM fq GROUP BY 1)
         |SELECT quarter, n_new_customers,
         | CAST(SUM(n_new_customers) OVER (ORDER BY quarter
         |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_customers
         |FROM q ORDER BY quarter""".stripMargin.replace("\n", " ")),
    "x437_cluster_source_span" ->
      (s"""WITH $clusterCtes,
         |ls AS (SELECT DISTINCT l3.label, d.source FROM l3
         |  JOIN documents d ON d.doc_id = l3.node),
         |cs AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_sources
         |  FROM ls GROUP BY 1)
         |SELECT n_sources, CAST(COUNT(*) AS BIGINT) AS n_clusters
         |FROM cs GROUP BY 1 ORDER BY n_sources"""
        .stripMargin.replace("\n", " ")),
    "x438_supplier_specialization" ->
      ("""WITH sb AS (SELECT l_suppkey, p_brand,
         |  CAST(COUNT(*) AS BIGINT) AS c
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE l_suppkey IS NOT NULL AND p_brand IS NOT NULL
         | GROUP BY 1, 2),
         |per AS (SELECT CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT)
         |   AS ppm FROM sb GROUP BY l_suppkey)
         |SELECT CAST(ppm // 100000 AS INT) AS spec_band,
         | CAST(COUNT(*) AS BIGINT) AS n_suppliers
         |FROM per GROUP BY 1 ORDER BY spec_band"""
        .stripMargin.replace("\n", " ")),
    "x439_brand_customer_reach" ->
      ("""WITH bc AS (SELECT DISTINCT p_brand AS brand, o_custkey
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN part ON l_partkey = p_partkey
         | WHERE o_custkey IS NOT NULL AND p_brand IS NOT NULL),
         |t AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS tt
         | FROM bc)
         |SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_customers,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS reach_ppm
         |FROM bc, t GROUP BY brand, tt ORDER BY brand"""
        .stripMargin.replace("\n", " ")),
    "x440_error_concentration" ->
      ("""WITH v AS (SELECT user_id AS i, CAST(COUNT(*) AS BIGINT) AS v
         | FROM events WHERE user_id IS NOT NULL
         |  AND event_type = 'error' GROUP BY 1),
         |c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM v GROUP BY 1),
         |o AS (SELECT v, CAST(SUM(cnt) OVER (ORDER BY v) - cnt AS BIGINT)
         |  AS bef, CAST(SUM(cnt) OVER () AS BIGINT) AS n FROM c),
         |r AS (SELECT v.v, o.bef + ROW_NUMBER() OVER (PARTITION BY v.v
         |  ORDER BY v.i) AS rk, o.n FROM v JOIN o USING (v)),
         |gin AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
         |  CAST(SUM(v) AS BIGINT) AS sx,
         |  SUM(CAST(rk AS HUGEINT) * v) AS six FROM r),
         |gp AS (SELECT CAST(2 * six * 1000000 // (CAST(n AS HUGEINT) * sx)
         |  - (n + 1) * 1000000 // n AS BIGINT) AS gini_ppm FROM gin),
         |d AS (SELECT ((rk - 1) * 10 // n) + 1 AS decile,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows, CAST(SUM(v) AS BIGINT)
         |    AS sum_cents FROM r GROUP BY 1),
         |dt AS (SELECT CAST(SUM(sum_cents) AS BIGINT) AS tot FROM d)
         |SELECT CAST(d.decile AS BIGINT) AS decile, d.n_rows, d.sum_cents,
         | d.sum_cents * 1000000 // dt.tot AS share_ppm, gp.gini_ppm
         |FROM d, dt, gp ORDER BY decile""".stripMargin.replace("\n", " ")),
    "x441_supplier_health_throughput" ->
      ("""WITH vol AS (SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS v
         | FROM lineitem WHERE l_suppkey IS NOT NULL GROUP BY 1),
         |s AS (SELECT CASE
         |   WHEN CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    < 0 THEN '1_negative'
         |   WHEN CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    < 500000 THEN '2_low' ELSE '3_high' END AS bal_band,
         |  COALESCE(vol.v, 0) AS v
         | FROM supplier LEFT JOIN vol ON s_suppkey = vol.l_suppkey)
         |SELECT bal_band, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         | CAST(SUM(v) AS BIGINT) AS n_lines,
         | CAST(SUM(v) * 1000 // COUNT(*) AS BIGINT)
         |  AS lines_per_k_suppliers
         |FROM s GROUP BY 1 ORDER BY bal_band"""
        .stripMargin.replace("\n", " ")),
    "x442_degree_assortativity" ->
      ("""WITH e AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
         |  's' || CAST(l_suppkey AS VARCHAR) AS dst
         | FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |s AS (SELECT src AS a, dst AS b FROM e
         | UNION ALL SELECT dst, src FROM e),
         |deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS d FROM s GROUP BY 1),
         |xy AS (SELECT du.d AS x, dv.d AS y FROM s
         | JOIN deg du ON s.a = du.a JOIN deg dv ON s.b = dv.a),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |  SUM(CAST(x AS HUGEINT) * x) AS qx,
         |  SUM(CAST(y AS HUGEINT) * y) AS qy,
         |  SUM(CAST(x AS HUGEINT) * y) AS pxy FROM xy)
         |SELECT CAST(n // 2 AS BIGINT) AS n_edges,
         | CASE WHEN (CAST(n AS DOUBLE) * CAST(qx AS DOUBLE)
         |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
         |   AND (CAST(n AS DOUBLE) * CAST(qy AS DOUBLE)
         |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
         |  THEN ROUND((CAST(n AS DOUBLE) * CAST(pxy AS DOUBLE)
         |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |   / sqrt((CAST(n AS DOUBLE) * CAST(qx AS DOUBLE)
         |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |   * (CAST(n AS DOUBLE) * CAST(qy AS DOUBLE)
         |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         | END AS assortativity
         |FROM m""".stripMargin.replace("\n", " ")),
    "x443_sentence_length_census" ->
      ("""WITH s0 AS (SELECT doc_id, lang, unnest(string_split(text, '.'))
         |  AS seg FROM documents
         | WHERE text IS NOT NULL AND lang IS NOT NULL),
         |s1 AS (SELECT doc_id, lang, trim(seg) AS t FROM s0),
         |s2 AS (SELECT doc_id, lang,
         |  CAST(len(string_split(t, ' ')) AS BIGINT) AS tok
         | FROM s1 WHERE len(t) > 0),
         |pd AS (SELECT lang, doc_id, CAST(COUNT(*) AS BIGINT) AS ns,
         |  CAST(SUM(tok) AS BIGINT) AS tk, CAST(MAX(tok) AS BIGINT) AS mx
         | FROM s2 GROUP BY 1, 2)
         |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         | CAST(SUM(ns) AS BIGINT) AS n_sentences,
         | CAST(SUM(tk) * 1000 // SUM(ns) AS BIGINT) AS mean_tokens_milli,
         | CAST(MAX(mx) AS BIGINT) AS max_sentence_tokens,
         | CAST(SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END) * 1000000
         |  // COUNT(*) AS BIGINT) AS single_sentence_ppm
         |FROM pd GROUP BY lang ORDER BY lang"""
        .stripMargin.replace("\n", " ")),
    "x444_value_spread_census" ->
      ("""WITH c AS (SELECT o_custkey,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         | FROM orders
         | WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL),
         |g AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
         |  MAX(v) - MIN(v) AS spread FROM c GROUP BY 1 HAVING COUNT(*) >= 2),
         |b AS (SELECT n, CAST(len(CAST(spread AS VARCHAR)) AS BIGINT)
         |  AS spread_digits FROM g),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM b)
         |SELECT spread_digits, CAST(COUNT(*) AS BIGINT) AS n_customers,
         | CAST(SUM(n) * 1000 // COUNT(*) AS BIGINT) AS mean_orders_milli,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM b, t GROUP BY spread_digits, tt ORDER BY spread_digits"""
        .stripMargin.replace("\n", " ")),
    "x445_oov_rate_by_source" ->
      ("""WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w
         | FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |v AS (SELECT w, COUNT(*) AS c FROM w GROUP BY 1
         | ORDER BY c DESC, w LIMIT 200)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         | CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |  AS oov_tokens,
         | CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) * 1000000
         |  // COUNT(*) AS BIGINT) AS oov_ppm
         |FROM w LEFT JOIN v ON w.w = v.w
         |GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")),
    "x446_label_margin_census" ->
      (s"""WITH dims AS (SELECT e.label, dd.d, e.embedding[dd.d+1] AS v
         |  FROM embeddings e CROSS JOIN (SELECT unnest(range(64)) AS d) dd),
         |cent0 AS (SELECT label, d,
         |  CAST(SUM(CAST(v AS DECIMAL(28,9))) AS FLOAT) AS s
         | FROM dims GROUP BY label, d),
         |cent AS (SELECT label AS clabel, list(s ORDER BY d) AS cvec
         | FROM cent0 GROUP BY label),
         |sc AS (SELECT e.vec_id, e.label, c.clabel,
         |  ${cos2Sql("e.embedding", "c.cvec")} AS score
         | FROM embeddings e CROSS JOIN cent c),
         |g AS (SELECT vec_id, label,
         |  MAX(CASE WHEN label = clabel THEN score END) AS own,
         |  MAX(CASE WHEN label <> clabel THEN score END) AS oth
         | FROM sc GROUP BY 1, 2),
         |b AS (SELECT label,
         |  CAST(FLOOR((own - oth) * 10) AS BIGINT) AS margin_band FROM g)
         |SELECT label, margin_band, CAST(COUNT(*) AS BIGINT) AS n_vecs
         |FROM b GROUP BY 1, 2 ORDER BY label, margin_band"""
        .stripMargin.replace("\n", " ")),
    "x447_revenue_max_drawdown" ->
      ("""WITH d AS (SELECT CAST(o_orderdate AS DATE) AS trough_day,
         |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS v
         | FROM orders
         | WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
         | GROUP BY 1),
         |p AS (SELECT trough_day, v,
         |  MAX(v) OVER (ORDER BY trough_day) AS pk FROM d)
         |SELECT trough_day, CAST(pk AS BIGINT) AS peak_cents,
         | CAST(v AS BIGINT) AS trough_cents,
         | CAST(pk - v AS BIGINT) AS drawdown_cents,
         | CAST((pk - v) * 1000000 // pk AS BIGINT) AS drawdown_ppm
         |FROM p ORDER BY pk - v DESC, trough_day LIMIT 1"""
        .stripMargin.replace("\n", " ")),
    "x448_syndication_direction" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |src AS (SELECT doc_id, source, n_chars FROM documents),
         |sp AS (SELECT LEAST(s1.source, s2.source) AS source_a,
         |  GREATEST(s1.source, s2.source) AS source_b,
         |  CASE WHEN s1.source < s2.source THEN s1.n_chars
         |   ELSE s2.n_chars END AS la,
         |  CASE WHEN s1.source < s2.source THEN s2.n_chars
         |   ELSE s1.n_chars END AS lb
         | FROM jpairs j JOIN src s1 ON j.d1 = s1.doc_id
         |  JOIN src s2 ON j.d2 = s2.doc_id
         | WHERE s1.source <> s2.source)
         |SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         | CAST(SUM(CASE WHEN la > lb THEN 1 ELSE 0 END) AS BIGINT)
         |  AS a_longer,
         | CAST(SUM(CASE WHEN lb > la THEN 1 ELSE 0 END) AS BIGINT)
         |  AS b_longer,
         | CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_equal
         |FROM sp GROUP BY 1, 2 ORDER BY source_a, source_b"""
        .stripMargin.replace("\n", " ")),
    "x449_supplier_reliability" ->
      ("""WITH d AS (SELECT l_suppkey AS s, date_diff('day',
         |  CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS x
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | WHERE l_suppkey IS NOT NULL AND l_shipdate IS NOT NULL
         |  AND o_orderdate IS NOT NULL
         |  AND date_diff('day', CAST(o_orderdate AS DATE),
         |   CAST(l_shipdate AS DATE)) >= 0),
         |st AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(x) AS BIGINT) AS sm FROM d GROUP BY 1
         | HAVING COUNT(*) >= 5),
         |m AS (SELECT d.s, MAX(st.n) AS n, MAX(st.sm) AS sm,
         |  CAST(SUM(ABS(st.n * d.x - st.sm)) AS BIGINT) AS a
         | FROM d JOIN st ON d.s = st.s GROUP BY 1),
         |r AS (SELECT 1000 * a // (n * n) AS mad_milli,
         |  1000 * sm // n AS mean_milli FROM m)
         |SELECT CAST(mad_milli // 1000 AS BIGINT) AS mad_band_days,
         | CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         | CAST(SUM(mean_milli) // COUNT(*) AS BIGINT) AS mean_delay_milli
         |FROM r GROUP BY 1 ORDER BY mad_band_days"""
        .stripMargin.replace("\n", " ")),
    "x450_clustering_coeff_census" ->
      ("""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
         | FROM lineitem WHERE l_shipdate >= DATE '1996-01-01'
         |  AND l_shipdate < DATE '1998-01-01'),
         |e AS (SELECT DISTINCT a.p AS u, b.p AS v
         | FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
         |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
         | FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
         | GROUP BY 1),
         |tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
         | FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
         |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
         |tn AS (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
         | UNION ALL SELECT z FROM tri),
         |tc AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM tn
         | GROUP BY 1),
         |cc AS (SELECT deg.node, deg.d, COALESCE(tc.t, 0) AS t
         | FROM deg LEFT JOIN tc USING (node) WHERE deg.d >= 2),
         |pp AS (SELECT 2000000 * t // (d * (d - 1)) AS ppm FROM cc)
         |SELECT CAST(ppm // 100000 AS BIGINT) AS coeff_band,
         | CAST(COUNT(*) AS BIGINT) AS n_nodes,
         | CAST(SUM(ppm) // COUNT(*) AS BIGINT) AS mean_coeff_ppm
         |FROM pp GROUP BY 1 ORDER BY coeff_band"""
        .stripMargin.replace("\n", " ")),
    "x451_event_coday_lift" ->
      ("""WITH ed AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
         |  event_type AS et FROM events
         | WHERE user_id IS NOT NULL AND event_type IS NOT NULL
         |  AND ts IS NOT NULL),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn
         | FROM (SELECT DISTINCT user_id, day FROM ed)),
         |s AS (SELECT et, CAST(COUNT(*) AS BIGINT) AS n FROM ed GROUP BY 1),
         |p AS (SELECT a.et AS type_a, b.et AS type_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_codays
         | FROM ed a JOIN ed b ON a.user_id = b.user_id AND a.day = b.day
         |  AND a.et < b.et GROUP BY 1, 2)
         |SELECT type_a, type_b, n_codays,
         | CAST(CAST(n_codays AS HUGEINT) * t.nn * 1000000
         |  // (CAST(sa.n AS HUGEINT) * sb.n) AS BIGINT) AS lift_ppm
         |FROM p CROSS JOIN t JOIN s sa ON p.type_a = sa.et
         | JOIN s sb ON p.type_b = sb.et
         |ORDER BY type_a, type_b""".stripMargin.replace("\n", " ")),
    "x452_dim_energy_spectrum" ->
      ("""WITH dims AS (SELECT dd.d, e.embedding[dd.d+1] AS v
         | FROM embeddings e CROSS JOIN (SELECT unnest(range(64)) AS d) dd),
         |m AS (SELECT d, CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT)
         |  AS mv FROM dims),
         |mo AS (SELECT d, CAST(COUNT(*) AS HUGEINT) AS n,
         |  SUM(CAST(mv AS HUGEINT)) AS s,
         |  SUM(CAST(mv AS HUGEINT) * mv) AS q FROM m GROUP BY 1),
         |vv AS (SELECT d, n * q - s * s AS vs FROM mo),
         |r AS (SELECT d, vs, ROW_NUMBER() OVER (ORDER BY vs DESC, d) AS rk,
         |  SUM(vs) OVER (ORDER BY vs DESC, d) AS cum FROM vv),
         |t AS (SELECT SUM(vs) AS tot, CAST(COUNT(*) AS BIGINT) AS n_dims
         | FROM vv)
         |SELECT MAX(n_dims) AS n_dims,
         | CAST(MAX(CASE WHEN rk = 1 THEN d END) AS BIGINT) AS top_dim,
         | CAST(MAX(CASE WHEN rk = 1 THEN vs * 1000000 // tot END) AS BIGINT)
         |  AS top_share_ppm,
         | CAST(MIN(CASE WHEN cum * 2 >= tot THEN rk END) AS BIGINT) AS k50,
         | CAST(MIN(CASE WHEN cum * 10 >= tot * 9 THEN rk END) AS BIGINT)
         |  AS k90,
         | CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN rk END) AS BIGINT)
         |  AS k99
         |FROM r CROSS JOIN t""".stripMargin.replace("\n", " ")),
    "x453_peak_load_headroom" ->
      ("""WITH hc AS (SELECT event_type, date_trunc('hour', ts) AS h,
         |  CAST(COUNT(*) AS BIGINT) AS c FROM events
         | WHERE event_type IS NOT NULL AND ts IS NOT NULL GROUP BY 1, 2),
         |coll AS (SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS cnt
         | FROM hc GROUP BY 1, 2),
         |t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
         |  CAST(SUM(c) AS BIGINT) AS tot FROM hc GROUP BY 1),
         |cu AS (SELECT event_type, c, SUM(cnt) OVER (PARTITION BY
         |  event_type ORDER BY c) AS cum FROM coll),
         |g AS (SELECT t.event_type, MAX(t.n_hours) AS n_hours,
         |  CAST(MAX(1000 * t.tot // t.n_hours) AS BIGINT) AS mean_milli,
         |  CAST(MIN(CASE WHEN cu.cum * 100 >= t.n_hours * 99 THEN cu.c END)
         |   AS BIGINT) AS p99
         | FROM cu JOIN t ON cu.event_type = t.event_type GROUP BY 1)
         |SELECT event_type, n_hours, mean_milli, p99,
         | CAST(1000000 * p99 // mean_milli AS BIGINT) AS headroom_milli
         |FROM g ORDER BY event_type""".stripMargin.replace("\n", " ")),
    "x454_pack_adjacency_audit" ->
      ("""WITH t AS (SELECT source, doc_id, lang,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
         | FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
         |  AND lang IS NOT NULL),
         |c0 AS (SELECT source, doc_id, lang,
         |  SUM(tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
         | FROM t WHERE tok > 0),
         |c AS (SELECT source, lang, cum,
         |  LAG(lang) OVER (PARTITION BY source ORDER BY doc_id) AS plang,
         |  LAG(cum) OVER (PARTITION BY source ORDER BY doc_id) AS pcum
         | FROM c0),
         |p AS (SELECT source,
         |  CASE WHEN pcum % 128 <> 0 THEN 1 ELSE 0 END AS cop,
         |  CASE WHEN pcum % 128 <> 0 AND lang = plang THEN 1 ELSE 0 END
         |   AS same FROM c WHERE pcum IS NOT NULL)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         | CAST(SUM(cop) AS BIGINT) AS n_copacked,
         | CAST(SUM(cop) * 1000000 // COUNT(*) AS BIGINT) AS copacked_ppm,
         | CASE WHEN SUM(cop) > 0
         |  THEN CAST(SUM(same) * 1000000 // SUM(cop) AS BIGINT)
         | END AS same_lang_ppm
         |FROM p GROUP BY source ORDER BY source"""
        .stripMargin.replace("\n", " ")),
    "x455_overdispersion_audit" ->
      ("""WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |  CAST(COUNT(*) AS BIGINT) AS x FROM events
         | WHERE ts IS NOT NULL AND event_type IS NOT NULL GROUP BY 1, 2),
         |bo AS (SELECT MIN(CAST(ts AS DATE)) AS d0,
         |  MAX(CAST(ts AS DATE)) AS d1 FROM events WHERE ts IS NOT NULL),
         |s AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
         |  AS DATE) AS day FROM bo),
         |ty AS (SELECT DISTINCT event_type FROM d),
         |f AS (SELECT ty.event_type, s.day, COALESCE(d.x, 0) AS x
         | FROM ty CROSS JOIN s LEFT JOIN d
         |  ON d.event_type = ty.event_type AND d.day = s.day),
         |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         |  CAST(SUM(x) AS BIGINT) AS sx,
         |  SUM(CAST(x AS HUGEINT) * x) AS q FROM f GROUP BY 1)
         |SELECT event_type, n_days, sx AS n_events,
         | CAST(1000 * (n_days * q - CAST(sx AS HUGEINT) * sx)
         |  // ((n_days - 1) * CAST(sx AS HUGEINT)) AS BIGINT) AS vmr_milli
         |FROM m ORDER BY event_type""".stripMargin.replace("\n", " ")),
    "x456_centroid_stability" ->
      (s"""WITH dims AS (SELECT e.label, e.vec_id % 2 AS h, dd.d,
         |  e.embedding[dd.d+1] AS v
         | FROM embeddings e CROSS JOIN (SELECT unnest(range(64)) AS d) dd),
         |c0 AS (SELECT label, h, d,
         |  CAST(SUM(CAST(v AS DECIMAL(28,9))) AS FLOAT) AS s
         | FROM dims GROUP BY 1, 2, 3),
         |ce AS (SELECT label, h, list(s ORDER BY d) AS cv
         | FROM c0 GROUP BY 1, 2),
         |cn AS (SELECT label, vec_id % 2 AS h, CAST(COUNT(*) AS BIGINT) AS n
         | FROM embeddings GROUP BY 1, 2),
         |a AS (SELECT ce.label, cv AS cva, n AS n_even FROM ce
         | JOIN cn ON ce.label = cn.label AND ce.h = cn.h WHERE ce.h = 0),
         |b AS (SELECT ce.label, cv AS cvb, n AS n_odd FROM ce
         | JOIN cn ON ce.label = cn.label AND ce.h = cn.h WHERE ce.h = 1)
         |SELECT a.label, n_even, n_odd,
         | ROUND(${cos2Sql("cva", "cvb")}, 6) AS stability_cos
         |FROM a JOIN b ON a.label = b.label ORDER BY a.label"""
        .stripMargin.replace("\n", " ")),
    "x457_session_handoff_matrix" ->
      ("""WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
         | WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |  AND event_type IS NOT NULL),
         |d AS (SELECT user_id, ts, event_id, event_type,
         |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id) IS NULL
         |   OR ts >= LAG(ts) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id) + INTERVAL 30 MINUTE
         |  THEN 1 ELSE 0 END AS news FROM e),
         |s AS (SELECT user_id, ts, event_id, event_type,
         |  SUM(news) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |   AS sid FROM d),
         |fr AS (SELECT user_id, sid, event_type AS ft, ROW_NUMBER() OVER
         |  (PARTITION BY user_id, sid ORDER BY ts, event_id) AS rn FROM s),
         |la AS (SELECT user_id, sid, event_type AS lt, ROW_NUMBER() OVER
         |  (PARTITION BY user_id, sid ORDER BY ts DESC, event_id DESC)
         |   AS rn FROM s),
         |ses AS (SELECT f.user_id, f.sid, f.ft, l.lt FROM fr f
         | JOIN la l ON f.user_id = l.user_id AND f.sid = l.sid
         |  AND f.rn = 1 AND l.rn = 1),
         |h AS (SELECT ft, LAG(lt) OVER (PARTITION BY user_id ORDER BY sid)
         |  AS plast FROM ses)
         |SELECT plast AS from_type, ft AS to_type,
         | CAST(COUNT(*) AS BIGINT) AS n_handoffs
         |FROM h WHERE plast IS NOT NULL
         |GROUP BY 1, 2 ORDER BY from_type, to_type"""
        .stripMargin.replace("\n", " ")),
    "x458_fulfillment_span_census" ->
      ("""WITH sp AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS lines,
         |  date_diff('day', MIN(CAST(l_shipdate AS DATE)),
         |   MAX(CAST(l_shipdate AS DATE))) AS span
         | FROM lineitem
         | WHERE l_orderkey IS NOT NULL AND l_shipdate IS NOT NULL
         | GROUP BY 1),
         |b AS (SELECT lines, CASE WHEN span = 0 THEN '0_same_day'
         |  WHEN span <= 3 THEN '1_1_3' WHEN span <= 7 THEN '2_4_7'
         |  ELSE '3_8_plus' END AS span_band FROM sp),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM b)
         |SELECT span_band, CAST(COUNT(*) AS BIGINT) AS n_orders,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm,
         | CAST(SUM(lines) * 1000 // COUNT(*) AS BIGINT) AS mean_lines_milli
         |FROM b, t GROUP BY span_band, tt ORDER BY span_band"""
        .stripMargin.replace("\n", " ")),
    "x459_props_payload_audit" ->
      ("""WITH k AS (SELECT event_type, CAST(NULLIF(REGEXP_EXTRACT(props,
         |  '"k":\s*(-?\d+)', 1), '') AS BIGINT) AS k FROM events
         | WHERE event_type IS NOT NULL)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         | CAST(COUNT(k) AS BIGINT) AS n_with_k,
         | CAST(MIN(k) AS BIGINT) AS k_min, CAST(MAX(k) AS BIGINT) AS k_max,
         | CAST(COUNT(DISTINCT k) AS BIGINT) AS k_distinct,
         | CASE WHEN COUNT(k) > 0
         |  THEN CAST(1000 * SUM(k) // COUNT(k) AS BIGINT) END
         |  AS k_mean_milli
         |FROM k GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),
    "x460_priority_inversion_weeks" ->
      ("""WITH d AS (SELECT CAST(date_trunc('week', CAST(o_orderdate AS
         |  DATE)) AS DATE) AS week, o_orderpriority AS p,
         |  date_diff('day', CAST(o_orderdate AS DATE),
         |   CAST(l_shipdate AS DATE)) AS x
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | WHERE o_orderdate IS NOT NULL AND l_shipdate IS NOT NULL
         |  AND o_orderpriority IN ('1-URGENT', '5-LOW')),
         |c AS (SELECT week, p, x, CAST(COUNT(*) AS BIGINT) AS c
         | FROM d GROUP BY 1, 2, 3),
         |t AS (SELECT week, p, CAST(COUNT(*) AS BIGINT) AS t
         | FROM d GROUP BY 1, 2),
         |cu AS (SELECT week, p, x, SUM(c) OVER (PARTITION BY week, p
         |  ORDER BY x) AS cum FROM c),
         |m AS (SELECT cu.week, cu.p,
         |  CAST(MIN(CASE WHEN cum * 2 >= t.t THEN x END) AS BIGINT) AS med
         | FROM cu JOIN t ON cu.week = t.week AND cu.p = t.p GROUP BY 1, 2),
         |w AS (SELECT week,
         |  MAX(CASE WHEN p = '1-URGENT' THEN med END) AS med_urgent_days,
         |  MAX(CASE WHEN p = '5-LOW' THEN med END) AS med_low_days
         | FROM m GROUP BY 1)
         |SELECT week, med_urgent_days, med_low_days,
         | CAST(CASE WHEN med_urgent_days > med_low_days THEN 1 ELSE 0 END
         |  AS INT) AS inverted
         |FROM w WHERE med_urgent_days IS NOT NULL
         | AND med_low_days IS NOT NULL ORDER BY week"""
        .stripMargin.replace("\n", " ")),
    "x461_region_demand_synchrony" ->
      ("""WITH rev AS (SELECT r_name AS reg, CAST(o_orderdate AS DATE)
         |  AS day, CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS v
         | FROM orders JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         | WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
         | GROUP BY 1, 2),
         |bo AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
         |  MAX(CAST(o_orderdate AS DATE)) AS d1 FROM orders
         | WHERE o_orderdate IS NOT NULL),
         |s AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
         |  AS DATE) AS day FROM bo),
         |f AS (SELECT r.r_name AS reg, s.day, COALESCE(rev.v, 0) AS v
         | FROM region r CROSS JOIN s LEFT JOIN rev
         |  ON rev.reg = r.r_name AND rev.day = s.day),
         |m AS (SELECT a.reg AS region_a, b.reg AS region_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_days,
         |  SUM(CAST(a.v AS HUGEINT)) AS sx, SUM(CAST(b.v AS HUGEINT)) AS sy,
         |  SUM(CAST(a.v AS HUGEINT) * a.v) AS qx,
         |  SUM(CAST(b.v AS HUGEINT) * b.v) AS qy,
         |  SUM(CAST(a.v AS HUGEINT) * b.v) AS pxy
         | FROM f a JOIN f b ON a.day = b.day AND a.reg < b.reg
         | GROUP BY 1, 2)
         |SELECT region_a, region_b, n_days,
         | CASE WHEN (CAST(n_days AS DOUBLE) * CAST(qx AS DOUBLE)
         |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
         |   AND (CAST(n_days AS DOUBLE) * CAST(qy AS DOUBLE)
         |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
         |  THEN ROUND((CAST(n_days AS DOUBLE) * CAST(pxy AS DOUBLE)
         |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |   / sqrt((CAST(n_days AS DOUBLE) * CAST(qx AS DOUBLE)
         |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         |   * (CAST(n_days AS DOUBLE) * CAST(qy AS DOUBLE)
         |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         | END AS corr
         |FROM m ORDER BY region_a, region_b"""
        .stripMargin.replace("\n", " ")),
    "x462_pack_len_sweep" ->
      ("""WITH t AS (SELECT source, doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
         | FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |c AS (SELECT source, doc_id, tok,
         |  SUM(tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
         | FROM t WHERE tok > 0),
         |ls AS (SELECT CAST(unnest([64, 128, 256, 512]) AS BIGINT)
         |  AS ctx_len),
         |pd AS (SELECT ls.ctx_len, c.source,
         |  CAST(SUM((c.cum - 1) // ls.ctx_len
         |   - (c.cum - c.tok) // ls.ctx_len + 1) AS BIGINT) AS touch
         | FROM c CROSS JOIN ls GROUP BY 1, 2),
         |ps AS (SELECT ls.ctx_len, g.source,
         |  (g.tot + ls.ctx_len - 1) // ls.ctx_len AS nwin,
         |  g.tot - ((g.tot + ls.ctx_len - 1) // ls.ctx_len - 1) * ls.ctx_len
         |   AS lastfill
         | FROM (SELECT source, MAX(cum) AS tot FROM c GROUP BY 1) g
         |  CROSS JOIN ls)
         |SELECT pd.ctx_len, CAST(SUM(ps.nwin) AS BIGINT) AS n_windows,
         | CAST(1000 * SUM(pd.touch) // SUM(ps.nwin) AS BIGINT)
         |  AS docs_per_window_milli,
         | CAST(SUM(ps.lastfill) * 1000000 // (COUNT(*) * pd.ctx_len)
         |  AS BIGINT) AS tail_fill_ppm
         |FROM pd JOIN ps ON pd.ctx_len = ps.ctx_len
         | AND pd.source = ps.source
         |GROUP BY pd.ctx_len ORDER BY pd.ctx_len"""
        .stripMargin.replace("\n", " ")),
    "x463_doc_feature_corr" -> docFeatureCorrOracle,
    "x464_state_staleness" ->
      ("""WITH p AS (SELECT user_id AS k, ts FROM events
         | WHERE event_type = 'purchase' AND user_id IS NOT NULL
         |  AND ts IS NOT NULL),
         |o AS (SELECT o_custkey AS k, o_orderdate AS ots FROM orders
         | WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |j AS (SELECT p.k, p.ts, o.ots FROM p ASOF LEFT JOIN o
         | ON p.k = o.k AND p.ts >= o.ots),
         |b AS (SELECT CASE WHEN ots IS NULL THEN '0_no_prior'
         |  ELSE 'y' || LPAD(CAST(date_diff('day', CAST(ots AS DATE),
         |   CAST(ts AS DATE)) // 365 AS VARCHAR), 2, '0')
         |  END AS staleness_band FROM j),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM b)
         |SELECT staleness_band, CAST(COUNT(*) AS BIGINT) AS n_purchases,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM b, t GROUP BY staleness_band, tt ORDER BY staleness_band"""
        .stripMargin.replace("\n", " ")),
    "x465_catalog_ratio_census" ->
      ("""WITH r AS (SELECT
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   AS ext,
         |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   * CAST(l_quantity AS BIGINT) AS expd
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE l_extendedprice IS NOT NULL AND p_retailprice IS NOT NULL
         |  AND l_quantity IS NOT NULL AND l_quantity > 0),
         |q AS (SELECT ext * 1000000 // expd AS ratio FROM r WHERE expd > 0),
         |b AS (SELECT CASE WHEN ratio < 900000 THEN '0_deep_below'
         |  WHEN ratio < 1000000 THEN '1_below'
         |  WHEN ratio = 1000000 THEN '2_exact'
         |  WHEN ratio <= 1100000 THEN '3_above'
         |  ELSE '4_far_above' END AS ratio_band, ratio FROM q),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM b)
         |SELECT ratio_band, CAST(COUNT(*) AS BIGINT) AS n_lines,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm,
         | CAST(SUM(ratio) // COUNT(*) AS BIGINT) AS mean_ratio_ppm
         |FROM b, t GROUP BY ratio_band, tt ORDER BY ratio_band"""
        .stripMargin.replace("\n", " ")),
    "x466_weekday_shift_matrix" ->
      ("""WITH d AS (SELECT
         |  date_diff('day', DATE '1994-12-26', CAST(o_orderdate AS DATE))
         |   % 7 AS order_dow,
         |  date_diff('day', DATE '1994-12-26', CAST(l_shipdate AS DATE))
         |   % 7 AS ship_dow
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | WHERE o_orderdate IS NOT NULL AND l_shipdate IS NOT NULL),
         |g AS (SELECT CAST(order_dow AS BIGINT) AS order_dow,
         |  CAST(ship_dow AS BIGINT) AS ship_dow,
         |  CAST(COUNT(*) AS BIGINT) AS n_lines FROM d GROUP BY 1, 2),
         |r AS (SELECT order_dow, CAST(SUM(n_lines) AS BIGINT) AS rt
         | FROM g GROUP BY 1)
         |SELECT g.order_dow, g.ship_dow, g.n_lines,
         | CAST(g.n_lines * 1000000 // r.rt AS BIGINT) AS row_share_ppm
         |FROM g JOIN r ON g.order_dow = r.order_dow
         |ORDER BY g.order_dow, g.ship_dow"""
        .stripMargin.replace("\n", " ")),
    "x467_serial_returner_census" ->
      ("""WITH pc AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |   AS BIGINT) AS r
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | WHERE o_custkey IS NOT NULL AND l_returnflag IS NOT NULL
         | GROUP BY 1 HAVING COUNT(*) >= 5),
         |b AS (SELECT n, CASE WHEN r * 1000000 // n = 0 THEN '0_none'
         |  WHEN r * 1000000 // n < 100000 THEN '1_under_10pct'
         |  WHEN r * 1000000 // n < 300000 THEN '2_under_30pct'
         |  ELSE '3_heavy' END AS return_band FROM pc),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM b)
         |SELECT return_band, CAST(COUNT(*) AS BIGINT) AS n_customers,
         | CAST(SUM(n) * 1000 // COUNT(*) AS BIGINT) AS mean_lines_milli,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM b, t GROUP BY return_band, tt ORDER BY return_band"""
        .stripMargin.replace("\n", " ")),
    "x468_brand_price_anova" ->
      ("""WITH p AS (SELECT p_brand,
         |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         | FROM part WHERE p_brand IS NOT NULL
         |  AND p_retailprice IS NOT NULL),
         |g AS (SELECT p_brand, CAST(COUNT(*) AS HUGEINT) AS ng,
         |  SUM(CAST(c AS HUGEINT)) AS sg FROM p GROUP BY 1),
         |gg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
         |  SUM(sg * sg // ng) AS t1 FROM g),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         |  SUM(CAST(c AS HUGEINT)) AS s, SUM(CAST(c AS HUGEINT) * c) AS q
         | FROM p)
         |SELECT n_parts, n_brands,
         | CAST(CASE WHEN q > s * s // n_parts
         |  THEN (t1 - s * s // n_parts) * 1000000
         |   // (q - s * s // n_parts) END AS BIGINT) AS eta2_ppm
         |FROM m CROSS JOIN gg""".stripMargin.replace("\n", " ")),
    "x469_brand_rank_stability" ->
      ("""WITH rev AS (SELECT CAST(date_trunc('quarter',
         |  CAST(o_orderdate AS DATE)) AS DATE) AS q, p_brand AS brand,
         |  SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS HUGEINT)) AS v
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN part ON l_partkey = p_partkey
         | WHERE o_orderdate IS NOT NULL AND p_brand IS NOT NULL
         |  AND l_extendedprice IS NOT NULL GROUP BY 1, 2),
         |r AS (SELECT q, brand, CAST(ROW_NUMBER() OVER (PARTITION BY q
         |  ORDER BY v DESC, brand) AS BIGINT) AS rk FROM rev),
         |pr AS (SELECT b.q AS quarter, ABS(a.rk - b.rk) AS d
         | FROM r a JOIN r b ON a.brand = b.brand
         |  AND a.q + INTERVAL 3 MONTH = b.q)
         |SELECT quarter, CAST(COUNT(*) AS BIGINT) AS n_common,
         | CAST(SUM(d) * 2000000 // (COUNT(*) * COUNT(*)) AS BIGINT)
         |  AS footrule_ppm
         |FROM pr GROUP BY 1 ORDER BY quarter"""
        .stripMargin.replace("\n", " ")),
    "x470_trade_homophily" ->
      ("""WITH li AS (SELECT c_nationkey AS cn, s_nationkey AS sn
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN supplier ON l_suppkey = s_suppkey),
         |o AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
         |  CAST(SUM(CASE WHEN cn = sn THEN 1 ELSE 0 END) AS BIGINT)
         |   AS same FROM li),
         |lc AS (SELECT cn, CAST(COUNT(*) AS BIGINT) AS c FROM li GROUP BY 1),
         |ls AS (SELECT sn, CAST(COUNT(*) AS BIGINT) AS s FROM li GROUP BY 1),
         |e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nations,
         |  SUM(CAST(lc.c AS HUGEINT) * ls.s) AS ee
         | FROM lc JOIN ls ON lc.cn = ls.sn),
         |x AS (SELECT o.n_lines, e.n_nations,
         |  CAST(o.same * 1000000 // o.n_lines AS BIGINT) AS same_ppm,
         |  CAST(e.ee * 1000000 // (CAST(o.n_lines AS HUGEINT) * o.n_lines)
         |   AS BIGINT) AS expected_ppm FROM o CROSS JOIN e)
         |SELECT n_lines, n_nations, same_ppm, expected_ppm,
         | CASE WHEN expected_ppm > 0
         |  THEN CAST(same_ppm * 1000 // expected_ppm AS BIGINT)
         | END AS lift_milli FROM x""".stripMargin.replace("\n", " ")),
    "x471_size_price_slope" ->
      ("""WITH p AS (SELECT p_brand AS brand, CAST(p_size AS BIGINT) AS x,
         |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
         | FROM part WHERE p_brand IS NOT NULL AND p_size IS NOT NULL
         |  AND p_retailprice IS NOT NULL),
         |m AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
         |  SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         |  SUM(CAST(x AS HUGEINT) * x) AS qx,
         |  SUM(CAST(x AS HUGEINT) * y) AS pxy FROM p GROUP BY 1)
         |SELECT brand, n_parts,
         | CASE WHEN (CAST(n_parts AS DOUBLE) * CAST(qx AS DOUBLE)
         |   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
         |  THEN ROUND((CAST(n_parts AS DOUBLE) * CAST(pxy AS DOUBLE)
         |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         |   / (CAST(n_parts AS DOUBLE) * CAST(qx AS DOUBLE)
         |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
         | END AS slope_cents_per_size
         |FROM m ORDER BY brand""".stripMargin.replace("\n", " ")),
    "x472_bootstrap_median_ci" ->
      (s"""WITH v AS (SELECT CAST(o_orderkey AS VARCHAR) AS id,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         | FROM orders WHERE o_orderkey IS NOT NULL
         |  AND o_totalprice IS NOT NULL),
         |rs AS (SELECT id, v, unnest(range(8)) AS g FROM v),
         |hx AS (SELECT v, g, md5(id || '|' || CAST(g AS VARCHAR)) AS x
         | FROM rs),
         |hh AS (SELECT v, g * 2 AS b,
         |  CAST(('0x' || substr(x, 1, 15)) AS BIGINT) AS h FROM hx
         | UNION ALL SELECT v, g * 2 + 1,
         |  CAST(('0x' || substr(x, 16, 15)) AS BIGINT) FROM hx),
         |mm AS (SELECT v, b, $poissonCaseSql AS m FROM hh),
         |w AS (SELECT b, v, CAST(SUM(m) AS BIGINT) AS w FROM mm
         | GROUP BY 1, 2 HAVING SUM(m) > 0),
         |t AS (SELECT b, CAST(SUM(w) AS BIGINT) AS t FROM w GROUP BY 1),
         |cu AS (SELECT b, v, SUM(w) OVER (PARTITION BY b ORDER BY v)
         |  AS cum FROM w),
         |md AS (SELECT cu.b,
         |  CAST(MIN(CASE WHEN cum * 2 >= t.t THEN v END) AS BIGINT) AS med
         | FROM cu JOIN t ON cu.b = t.b GROUP BY 1),
         |ms AS (SELECT list_sort(list(med)) AS arr FROM md),
         |oc AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1),
         |ot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
         |ocu AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM oc),
         |om AS (SELECT MAX(ot.n) AS n_rows,
         |  CAST(MIN(CASE WHEN ocu.cum * 2 >= ot.n THEN ocu.v END)
         |   AS BIGINT) AS median_cents FROM ocu CROSS JOIN ot)
         |SELECT n_rows, median_cents,
         | CAST(arr[2] AS BIGINT) AS boot_lo_cents,
         | CAST(arr[15] AS BIGINT) AS boot_hi_cents,
         | CAST(16 AS INT) AS n_resamples
         |FROM om, ms""".stripMargin.replace("\n", " ")),
    "x473_supplier_price_spread" ->
      ("""WITH u AS (SELECT l_partkey, l_suppkey,
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   // CAST(l_quantity AS BIGINT) AS unit
         | FROM lineitem WHERE l_partkey IS NOT NULL
         |  AND l_suppkey IS NOT NULL AND l_extendedprice IS NOT NULL
         |  AND l_quantity IS NOT NULL AND l_quantity > 0),
         |ps AS (SELECT l_partkey,
         |  1000 * SUM(unit) // COUNT(*) AS mean_milli
         | FROM u GROUP BY l_partkey, l_suppkey),
         |sp AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS nsupp,
         |  MIN(mean_milli) AS lo, MAX(mean_milli) AS hi
         | FROM ps GROUP BY 1 HAVING COUNT(*) >= 2 AND MIN(mean_milli) > 0),
         |b AS (SELECT nsupp, CASE
         |  WHEN (hi - lo) * 1000000 // lo < 100000000 THEN '0_under_100x'
         |  WHEN (hi - lo) * 1000000 // lo < 250000000 THEN '1_under_250x'
         |  WHEN (hi - lo) * 1000000 // lo < 500000000 THEN '2_under_500x'
         |  ELSE '3_over_500x' END AS spread_band FROM sp),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM b)
         |SELECT spread_band, CAST(COUNT(*) AS BIGINT) AS n_parts,
         | CAST(SUM(nsupp) * 1000 // COUNT(*) AS BIGINT)
         |  AS mean_suppliers_milli,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM b, t GROUP BY spread_band, tt ORDER BY spread_band"""
        .stripMargin.replace("\n", " ")),
    "x474_anomaly_attribution" ->
      ("""WITH ud AS (SELECT CAST(ts AS DATE) AS day, user_id,
         |  CAST(COUNT(*) AS BIGINT) AS c FROM events
         | WHERE ts IS NOT NULL AND user_id IS NOT NULL GROUP BY 1, 2),
         |d AS (SELECT day, CAST(SUM(c) AS BIGINT) AS n FROM ud GROUP BY 1),
         |dc AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY 1),
         |dd AS (SELECT CAST(COUNT(*) AS BIGINT) AS days FROM d),
         |cu AS (SELECT n, SUM(cnt) OVER (ORDER BY n) AS cum FROM dc),
         |md AS (SELECT CAST(MIN(CASE WHEN cu.cum * 10 >= dd.days * 9
         |  THEN cu.n END) AS BIGINT) AS p90 FROM cu CROSS JOIN dd),
         |tp AS (SELECT day, CAST(SUM(CASE WHEN rk <= 10 THEN c ELSE 0 END)
         |  AS BIGINT) AS top10
         | FROM (SELECT day, c, ROW_NUMBER() OVER (PARTITION BY day
         |  ORDER BY c DESC, user_id) AS rk FROM ud) GROUP BY 1),
         |cl AS (SELECT CASE WHEN d.n >= md.p90 THEN '1_peak'
         |  ELSE '0_typical' END AS day_class, d.n,
         |  1000 * tp.top10 // d.n AS share_milli
         | FROM d JOIN tp ON d.day = tp.day CROSS JOIN md)
         |SELECT day_class, CAST(COUNT(*) AS BIGINT) AS n_days,
         | CAST(SUM(n) AS BIGINT) AS n_events,
         | CAST(SUM(share_milli) // COUNT(*) AS BIGINT)
         |  AS mean_top10_share_milli
         |FROM cl GROUP BY 1 ORDER BY day_class"""
        .stripMargin.replace("\n", " ")),
    "x475_sample_fidelity" ->
      ("""WITH li AS (SELECT p_brand AS brand, l_orderkey, l_linenumber
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE p_brand IS NOT NULL),
         |f AS (SELECT brand, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC,
         |  brand) AS rf FROM li GROUP BY brand
         | ORDER BY COUNT(*) DESC, brand LIMIT 10),
         |sm AS (SELECT brand FROM li
         | WHERE CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)
         |  || '#' || CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)
         |  % 10 = 0),
         |s AS (SELECT brand, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC,
         |  brand) AS rs FROM sm GROUP BY brand
         | ORDER BY COUNT(*) DESC, brand LIMIT 10)
         |SELECT CAST(10 AS BIGINT) AS k,
         | CAST(COUNT(*) AS BIGINT) AS overlap_at_10,
         | CAST(COUNT(*) * 1000000 // 10 AS BIGINT) AS overlap_ppm,
         | MAX(CASE WHEN rf = 1 AND rs = 1 THEN 1 ELSE 0 END)
         |  AS top1_preserved
         |FROM f JOIN s USING (brand)"""
        .stripMargin.replace("\n", " ")),
    "x476_funnel_parity_nation" ->
      ("""WITH per AS (SELECT user_id,
         |  MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
         |  MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
         |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
         | FROM events WHERE user_id IS NOT NULL
         |  AND event_type IS NOT NULL GROUP BY 1 HAVING
         |  MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) = 1)
         |SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_viewers,
         | CAST(SUM(c) * 1000000 // COUNT(*) AS BIGINT) AS click_ppm,
         | CAST(SUM(p) * 1000000 // COUNT(*) AS BIGINT) AS purchase_ppm
         |FROM per JOIN customer ON user_id = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY nation"""
        .stripMargin.replace("\n", " ")),
    "x477_kmeans_step_audit" -> kmeansStepOracle,
    "x478_ht_estimator_audit" ->
      ("""WITH o AS (SELECT o_orderkey,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
         | FROM orders WHERE o_orderkey IS NOT NULL
         |  AND o_totalprice IS NOT NULL),
         |f AS (SELECT o_orderkey, w,
         |  SUM(w) OVER (ORDER BY o_orderkey) AS cum FROM o WHERE w > 0),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS true_rows,
         |  CAST(SUM(w) AS BIGINT) AS true_total FROM o WHERE w > 0),
         |sel AS (SELECT f.w FROM f CROSS JOIN t
         | WHERE t.true_total // 1000 > 0
         |  AND (f.cum - f.w) // (t.true_total // 1000)
         |    < f.cum // (t.true_total // 1000)),
         |e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_selected,
         |  CAST(SUM((SELECT true_total FROM t) // 1000 // w) AS BIGINT)
         |   AS est_rows FROM sel)
         |SELECT t.true_rows, e.est_rows,
         | CAST(ABS(e.est_rows - t.true_rows) * 1000000 // t.true_rows
         |  AS BIGINT) AS err_rows_ppm,
         | t.true_total AS true_total_cents,
         | CAST(e.n_selected * (t.true_total // 1000) AS BIGINT)
         |  AS est_total_cents,
         | CAST(ABS(e.n_selected * (t.true_total // 1000) - t.true_total)
         |  * 1000000 // t.true_total AS BIGINT) AS err_total_ppm,
         | e.n_selected
         |FROM t CROSS JOIN e""".stripMargin.replace("\n", " ")),
    "x479_retention_first_touch" ->
      ("""WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
         | WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |  AND event_type IS NOT NULL),
         |fr AS (SELECT user_id, event_type AS first_type,
         |  CAST(ts AS DATE) AS fd,
         |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |   AS rn FROM e),
         |ld AS (SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day
         | FROM e GROUP BY 1),
         |u AS (SELECT fr.user_id, fr.first_type, fr.fd, ld.last_day
         | FROM fr JOIN ld ON fr.user_id = ld.user_id WHERE fr.rn = 1)
         |SELECT first_type, CAST(COUNT(*) AS BIGINT) AS n_users,
         | CAST(SUM(CASE WHEN date_diff('day', fd, last_day) >= 7
         |  THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         |  AS retained_ppm
         |FROM u GROUP BY first_type ORDER BY first_type"""
        .stripMargin.replace("\n", " ")),
    "x480_approx_distinct_calibration" ->
      ("""SELECT col_name, n_distinct, TRUE AS approx_ok FROM (
         | SELECT 'l_orderkey' AS col_name,
         |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct
         | FROM lineitem
         | UNION ALL SELECT 'l_partkey',
         |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) FROM lineitem
         | UNION ALL SELECT 'l_suppkey',
         |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) FROM lineitem
         | UNION ALL SELECT 'l_returnflag',
         |  CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) FROM lineitem)
         |ORDER BY col_name""".stripMargin.replace("\n", " ")),
    "x481_copurchase_weight_spectrum" ->
      ("""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
         | FROM lineitem WHERE l_shipdate >= DATE '1996-01-01'
         |  AND l_shipdate < DATE '1998-01-01'),
         |w AS (SELECT a.p AS u, b.p AS v, CAST(COUNT(*) AS BIGINT) AS w
         | FROM li a JOIN li b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM w)
         |SELECT CAST(length(bin(w)) AS BIGINT) AS weight_log2_band,
         | CAST(COUNT(*) AS BIGINT) AS n_pairs,
         | CAST(SUM(w) AS BIGINT) AS co_occurrences,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM w, t GROUP BY weight_log2_band, tt
         |ORDER BY weight_log2_band""".stripMargin.replace("\n", " ")),
    "x482_join_funnel_audit" ->
      ("""WITH s0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem),
         |s1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey),
         |s2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey),
         |s3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey),
         |s4 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey),
         |u AS (SELECT '0_lineitem' AS join_step, s0.n FROM s0
         | UNION ALL SELECT '1_orders', s1.n FROM s1
         | UNION ALL SELECT '2_customer', s2.n FROM s2
         | UNION ALL SELECT '3_nation', s3.n FROM s3
         | UNION ALL SELECT '4_region', s4.n FROM s4)
         |SELECT join_step, n AS rows_surviving,
         | CAST(n * 1000000 // (SELECT n FROM s0) AS BIGINT)
         |  AS retention_ppm
         |FROM u ORDER BY join_step""".stripMargin.replace("\n", " ")),
    "x483_assortment_discovery" ->
      ("""WITH lo AS (SELECT l_orderkey AS ok, l_partkey AS pk,
         |  CAST(o_orderdate AS DATE) AS d
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | WHERE l_partkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |fs AS (SELECT pk, MIN(d) AS fd FROM lo GROUP BY 1),
         |po AS (SELECT CAST(date_trunc('month', lo.d) AS DATE) AS month,
         |  lo.ok, MAX(CASE WHEN lo.d = fs.fd THEN 1 ELSE 0 END) AS hasnew
         | FROM lo JOIN fs ON lo.pk = fs.pk GROUP BY 1, 2),
         |mo AS (SELECT month, CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  CAST(SUM(hasnew) AS BIGINT) AS novel FROM po GROUP BY 1),
         |de AS (SELECT CAST(date_trunc('month', fd) AS DATE) AS month,
         |  CAST(COUNT(*) AS BIGINT) AS n_new_parts FROM fs GROUP BY 1)
         |SELECT mo.month, mo.n_orders,
         | CAST(mo.novel * 1000000 // mo.n_orders AS BIGINT)
         |  AS novel_order_ppm,
         | COALESCE(de.n_new_parts, 0) AS n_new_parts
         |FROM mo LEFT JOIN de ON mo.month = de.month ORDER BY mo.month"""
        .stripMargin.replace("\n", " ")),
    "x484_rep_policy_divergence" ->
      (s"""WITH $clusterCtes,
         |j AS (SELECT l3.node, l3.label, d.n_chars FROM l3
         | JOIN documents d ON l3.node = d.doc_id),
         |br AS (SELECT label, node AS bestrep FROM (SELECT label, node,
         |  ROW_NUMBER() OVER (PARTITION BY label
         |   ORDER BY n_chars DESC, node) AS rn FROM j) WHERE rn = 1),
         |mr AS (SELECT label, CAST(MIN(node) AS BIGINT) AS minrep,
         |  CAST(COUNT(*) AS BIGINT) AS sz FROM j GROUP BY 1)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
         | CAST(SUM(CASE WHEN minrep = bestrep THEN 1 ELSE 0 END)
         |  AS BIGINT) AS n_same_rep,
         | CAST(SUM(CASE WHEN minrep <> bestrep THEN 1 ELSE 0 END)
         |  * 1000000 // COUNT(*) AS BIGINT) AS divergence_ppm,
         | CAST(SUM(sz) * 1000 // COUNT(*) AS BIGINT) AS mean_size_milli
         |FROM mr JOIN br USING (label)"""
        .stripMargin.replace("\n", " ")),
    "x485_fingerprint_bits_sweep" ->
      ("""WITH h AS (SELECT CAST(('0x' || substr(md5(text), 1, 15))
         |  AS BIGINT) AS h
         | FROM (SELECT DISTINCT text FROM documents
         |  WHERE text IS NOT NULL)),
         |bl AS (SELECT CAST(b AS BIGINT) AS bits, CAST(m AS BIGINT) AS m
         | FROM (VALUES (20, 1048576), (24, 16777216), (28, 268435456),
         |  (32, 4294967296)) t(b, m)),
         |g AS (SELECT bl.bits, bl.m, CAST(COUNT(*) AS BIGINT) AS n_texts,
         |  CAST(COUNT(DISTINCT h.h % bl.m) AS BIGINT) AS dk
         | FROM h CROSS JOIN bl GROUP BY 1, 2)
         |SELECT bits, n_texts, n_texts - dk AS observed_collisions,
         | CAST(CAST(n_texts AS HUGEINT) * (n_texts - 1) * 1000
         |  // (2 * CAST(m AS HUGEINT)) AS BIGINT) AS expected_milli
         |FROM g ORDER BY bits""".stripMargin.replace("\n", " ")),
    "x486_embedding_geometry_census" ->
      (s"""WITH p AS (SELECT FLOOR((${cos2Sql("a.embedding", "b.embedding")})
         |  * 10) AS cos_band
         | FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
         | WHERE a.vec_id % 2 = 0),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM p)
         |SELECT CAST(cos_band AS BIGINT) AS cos_band,
         | CAST(COUNT(*) AS BIGINT) AS n_pairs,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM p, t GROUP BY cos_band, tt ORDER BY cos_band"""
        .stripMargin.replace("\n", " ")),
    "x487_supplier_trend_census" ->
      ("""WITH d AS (SELECT l_suppkey AS s,
         |  CAST((EXTRACT(year FROM o_orderdate) - 1995) * 4
         |   + EXTRACT(quarter FROM o_orderdate) - 1 AS BIGINT) AS x
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | WHERE l_suppkey IS NOT NULL AND o_orderdate IS NOT NULL),
         |qs AS (SELECT s, x, 1000 * COUNT(*) AS my
         | FROM d GROUP BY 1, 2),
         |m AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(my) AS BIGINT) AS smy,
         |  CAST(SUM(x * x) AS BIGINT) AS qx,
         |  CAST(SUM(x * my) AS BIGINT) AS pxy
         | FROM qs GROUP BY 1 HAVING COUNT(*) >= 4),
         |nd AS (SELECT n * pxy - sx * smy AS num,
         |  ABS(n * pxy - sx * smy) // (n * qx - sx * sx) AS mag FROM m),
         |sg AS (SELECT CASE
         |  WHEN num < 0 AND mag >= 150 THEN '0_declining_strong'
         |  WHEN num < 0 THEN '1_declining_mild'
         |  WHEN num = 0 THEN '2_flat'
         |  WHEN mag < 150 THEN '3_growing_mild'
         |  ELSE '4_growing_strong' END AS trend_band FROM nd),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM sg)
         |SELECT trend_band, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM sg, t GROUP BY trend_band, tt ORDER BY trend_band"""
        .stripMargin.replace("\n", " ")),
    "x488_quantizer_bits_sweep" -> quantizerSweepOracle,
    "x489_priority_escalation" ->
      ("""WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey,
         |  o_orderpriority,
         |  LAG(o_orderpriority) OVER (PARTITION BY o_custkey
         |   ORDER BY o_orderdate, o_orderkey) AS prev
         | FROM orders WHERE o_custkey IS NOT NULL
         |  AND o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL),
         |g AS (SELECT prev AS from_priority, o_orderpriority AS to_priority,
         |  CAST(COUNT(*) AS BIGINT) AS n_transitions
         | FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
         |r AS (SELECT from_priority,
         |  CAST(SUM(n_transitions) AS BIGINT) AS rt FROM g GROUP BY 1)
         |SELECT g.from_priority, g.to_priority, g.n_transitions,
         | CAST(g.n_transitions * 1000000 // r.rt AS BIGINT)
         |  AS row_share_ppm
         |FROM g JOIN r ON g.from_priority = r.from_priority
         |ORDER BY g.from_priority, g.to_priority"""
        .stripMargin.replace("\n", " ")),
    "x490_partition_count_sweep" ->
      ("""WITH k AS (SELECT CAST(('0x' || substr(md5(CAST(o_orderkey
         |  AS VARCHAR)), 1, 15)) AS BIGINT) AS h FROM orders
         | WHERE o_orderkey IS NOT NULL),
         |np AS (SELECT CAST(unnest([8, 16, 32, 64]) AS BIGINT)
         |  AS n_partitions),
         |g AS (SELECT np.n_partitions, k.h % np.n_partitions AS p,
         |  CAST(COUNT(*) AS BIGINT) AS c
         | FROM k CROSS JOIN np GROUP BY 1, 2),
         |m AS (SELECT n_partitions, CAST(SUM(c) AS BIGINT) AS n_rows,
         |  MAX(c) AS mx, MIN(c) AS mn FROM g GROUP BY 1)
         |SELECT n_partitions, n_rows,
         | CAST(mx * n_partitions * 1000000 // n_rows AS BIGINT)
         |  AS max_load_ppm,
         | CAST(mn * n_partitions * 1000000 // n_rows AS BIGINT)
         |  AS min_load_ppm
         |FROM m ORDER BY n_partitions""".stripMargin.replace("\n", " ")),
    "x491_image_gradient_energy" ->
      ("""WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7
         |  AS h FROM documents WHERE doc_id % 5 = 0),
         |px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM p),
         |v AS (SELECT doc_id, w, h, i % w AS x, i // w AS y,
         |  (doc_id * 31 + 7 * (i % w) + 13 * (i // w)) % 256 AS g
         | FROM px),
         |hg AS (SELECT a.doc_id, CAST(SUM(ABS(b.g - a.g)) AS BIGINT) AS e
         | FROM v a JOIN v b ON a.doc_id = b.doc_id AND b.x = a.x + 1
         |  AND b.y = a.y GROUP BY 1),
         |vg AS (SELECT a.doc_id, CAST(SUM(ABS(b.g - a.g)) AS BIGINT) AS e
         | FROM v a JOIN v b ON a.doc_id = b.doc_id AND b.x = a.x
         |  AND b.y = a.y + 1 GROUP BY 1)
         |SELECT p.doc_id, CAST(p.w AS INT) AS width,
         | CAST(p.h AS INT) AS height,
         | CAST(COALESCE(hg.e, 0) + COALESCE(vg.e, 0) AS BIGINT)
         |  AS grad_energy
         |FROM p LEFT JOIN hg ON p.doc_id = hg.doc_id
         | LEFT JOIN vg ON p.doc_id = vg.doc_id ORDER BY p.doc_id"""
        .stripMargin.replace("\n", " ")),
    "x492_payload_value_interaction" ->
      ("""WITH k AS (SELECT event_type,
         |  CAST(NULLIF(REGEXP_EXTRACT(props, '"k":\s*(-?\d+)', 1), '')
         |   AS BIGINT) // 25 AS k_band,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
         | FROM events WHERE event_type IS NOT NULL
         |  AND value IS NOT NULL)
         |SELECT event_type, k_band, CAST(COUNT(*) AS BIGINT) AS n_events,
         | CAST(1000 * SUM(c) // COUNT(*) AS BIGINT)
         |  AS mean_value_milli_cents
         |FROM k WHERE k_band IS NOT NULL
         |GROUP BY 1, 2 ORDER BY event_type, k_band"""
        .stripMargin.replace("\n", " ")),
    "x493_nowcast_ratio_table" ->
      ("""WITH m AS (SELECT CAST(date_trunc('month', CAST(o_orderdate AS
         |  DATE)) AS DATE) AS month,
         |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS full_cents,
         |  CAST(SUM(CASE WHEN EXTRACT(day FROM o_orderdate) <= 10
         |   THEN CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   ELSE 0 END) AS BIGINT) AS first10_cents
         | FROM orders WHERE o_orderdate IS NOT NULL
         |  AND o_totalprice IS NOT NULL GROUP BY 1),
         |r AS (SELECT month, full_cents, first10_cents,
         |  first10_cents * 1000000 // full_cents AS ratio_ppm FROM m),
         |c AS (SELECT ratio_ppm, CAST(COUNT(*) AS BIGINT) AS c
         | FROM r GROUP BY 1),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
         |cu AS (SELECT ratio_ppm, SUM(c) OVER (ORDER BY ratio_ppm) AS cum
         | FROM c),
         |md AS (SELECT CAST(MIN(CASE WHEN cu.cum * 2 >= n.n
         |  THEN cu.ratio_ppm END) AS BIGINT) AS median_ratio_ppm
         | FROM cu CROSS JOIN n)
         |SELECT month, full_cents, first10_cents,
         | CAST(ratio_ppm AS BIGINT) AS ratio_ppm, md.median_ratio_ppm,
         | CAST(ABS(ratio_ppm - md.median_ratio_ppm) AS BIGINT)
         |  AS abs_dev_ppm
         |FROM r CROSS JOIN md ORDER BY month"""
        .stripMargin.replace("\n", " ")),
    "x494_source_ks_conformance" ->
      ("""WITH d AS (SELECT source, n_chars AS v FROM documents
         | WHERE source IS NOT NULL AND n_chars IS NOT NULL),
         |vals AS (SELECT DISTINCT v FROM d),
         |sc AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
         | FROM d GROUP BY 1, 2),
         |st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
         | FROM d GROUP BY 1),
         |ac AS (SELECT v, SUM(cc) OVER (ORDER BY v) AS cuma
         | FROM (SELECT v, CAST(COUNT(*) AS BIGINT) AS cc FROM d
         |  GROUP BY 1)),
         |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS na FROM d),
         |g AS (SELECT st.source, vals.v, COALESCE(sc.c, 0) AS c
         | FROM st CROSS JOIN vals LEFT JOIN sc
         |  ON sc.source = st.source AND sc.v = vals.v),
         |cs AS (SELECT source, v, SUM(c) OVER (PARTITION BY source
         |  ORDER BY v) AS cums FROM g),
         |k AS (SELECT cs.source, st.ns,
         |  ABS(cs.cums * na.na - ac.cuma * st.ns) * 1000000
         |   // (CAST(st.ns AS HUGEINT) * na.na) AS dd
         | FROM cs JOIN ac ON cs.v = ac.v
         |  JOIN st ON cs.source = st.source CROSS JOIN na)
         |SELECT source, MAX(ns) AS n_docs,
         | CAST(MAX(dd) AS BIGINT) AS ks_ppm
         |FROM k GROUP BY source ORDER BY source"""
        .stripMargin.replace("\n", " ")),
    "x495_rich_club_profile" ->
      ("""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
         | FROM lineitem WHERE l_shipdate >= DATE '1996-01-01'
         |  AND l_shipdate < DATE '1998-01-01'),
         |e AS (SELECT DISTINCT a.p AS u, b.p AS v
         | FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
         |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
         | FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
         | GROUP BY 1),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM deg),
         |dc AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt
         | FROM deg GROUP BY 1),
         |cu AS (SELECT d, SUM(cnt) OVER (ORDER BY d) AS cum FROM dc),
         |pc AS (SELECT CAST(unnest([50, 75, 90]) AS BIGINT) AS pct),
         |th AS (SELECT pc.pct, CAST(MIN(CASE WHEN cu.cum * 100
         |  >= pc.pct * t.tt THEN cu.d END) AS BIGINT)
         |  AS degree_threshold
         | FROM cu CROSS JOIN t CROSS JOIN pc GROUP BY 1),
         |mem AS (SELECT th.pct, th.degree_threshold, deg.node
         | FROM deg JOIN th ON deg.d >= th.degree_threshold),
         |sz AS (SELECT pct, MAX(degree_threshold) AS degree_threshold,
         |  CAST(COUNT(*) AS BIGINT) AS n_club_nodes FROM mem GROUP BY 1),
         |wi AS (SELECT mu.pct, CAST(COUNT(*) AS BIGINT) AS n_club_edges
         | FROM e JOIN mem mu ON e.u = mu.node
         |  JOIN mem mv ON e.v = mv.node AND mu.pct = mv.pct
         | GROUP BY 1)
         |SELECT sz.pct, sz.degree_threshold, sz.n_club_nodes,
         | COALESCE(wi.n_club_edges, 0) AS n_club_edges,
         | CAST(CASE WHEN sz.n_club_nodes >= 2
         |  THEN 2000000 * COALESCE(wi.n_club_edges, 0)
         |   // (sz.n_club_nodes * (sz.n_club_nodes - 1))
         |  ELSE 0 END AS BIGINT) AS density_ppm
         |FROM sz LEFT JOIN wi ON sz.pct = wi.pct ORDER BY sz.pct"""
        .stripMargin.replace("\n", " ")),
    "x496_delisting_blast_radius" ->
      ("""WITH lb AS (SELECT l_orderkey AS ok, o_custkey AS ck,
         |  p_brand AS brand,
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   AS c
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN part ON l_partkey = p_partkey WHERE p_brand IS NOT NULL),
         |po AS (SELECT ok, CAST(COUNT(*) AS BIGINT) AS lines,
         |  MAX(ck) AS ck FROM lb GROUP BY 1),
         |bo AS (SELECT brand, ok, CAST(COUNT(*) AS BIGINT) AS blines,
         |  CAST(SUM(c) AS BIGINT) AS bcents FROM lb GROUP BY 1, 2)
         |SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_orders_touching,
         | CAST(SUM(CASE WHEN blines = lines THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_orders_exclusive,
         | CAST(SUM(CASE WHEN blines = lines THEN bcents ELSE 0 END)
         |  AS BIGINT) AS revenue_exclusive_cents,
         | CAST(COUNT(DISTINCT CASE WHEN blines = lines THEN po.ck END)
         |  AS BIGINT) AS customers_exclusive
         |FROM bo JOIN po ON bo.ok = po.ok
         |GROUP BY brand ORDER BY brand""".stripMargin.replace("\n", " ")),
    "x497_quality_cutoff_curve" ->
      (s"""WITH $qualityCtes,
         |tk AS (SELECT q.score,
         |  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS tok
         | FROM qscore q JOIN documents d ON q.doc_id = d.doc_id
         | WHERE d.text IS NOT NULL),
         |cu AS (SELECT CAST(unnest([400, 500, 600, 700, 800]) AS BIGINT)
         |  AS cutoff_milli),
         |g AS (SELECT cu.cutoff_milli, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(tok) AS BIGINT) AS tks,
         |  CAST(SUM(CASE WHEN tk.score >= cu.cutoff_milli / 1000.0
         |   THEN 1 ELSE 0 END) AS BIGINT) AS sd,
         |  CAST(SUM(CASE WHEN tk.score >= cu.cutoff_milli / 1000.0
         |   THEN tok ELSE 0 END) AS BIGINT) AS st
         | FROM tk CROSS JOIN cu GROUP BY 1)
         |SELECT cutoff_milli, sd AS docs_surviving,
         | CAST(sd * 1000000 // n AS BIGINT) AS doc_survival_ppm,
         | CAST(st * 1000000 // tks AS BIGINT) AS token_survival_ppm
         |FROM g ORDER BY cutoff_milli""".stripMargin.replace("\n", " ")),
    "x498_rapid_fire_census" ->
      ("""WITH g AS (SELECT user_id,
         |  CAST(FLOOR(epoch(ts)) AS BIGINT)
         |   - CAST(FLOOR(epoch(LAG(ts) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id))) AS BIGINT) AS gap
         | FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |p AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(CASE WHEN gap < 600 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS fast
         | FROM g WHERE gap IS NOT NULL GROUP BY 1 HAVING COUNT(*) >= 5),
         |b AS (SELECT CASE WHEN fast * 1000000 // n = 0 THEN '0_none'
         |  WHEN fast * 1000000 // n < 100000 THEN '1_under_10pct'
         |  WHEN fast * 1000000 // n < 500000 THEN '2_under_50pct'
         |  ELSE '3_burst_heavy' END AS fast_band FROM p),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM b)
         |SELECT fast_band, CAST(COUNT(*) AS BIGINT) AS n_users,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM b, t GROUP BY fast_band, tt ORDER BY fast_band"""
        .stripMargin.replace("\n", " ")),
    "x499_predicate_selectivity" ->
      ("""WITH m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         | CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |  AS BIGINT) AS p1,
         | CAST(SUM(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)
         |  AS BIGINT) AS p2,
         | CAST(SUM(CASE WHEN EXTRACT(year FROM l_shipdate) = 1996
         |  THEN 1 ELSE 0 END) AS BIGINT) AS p3,
         | CAST(SUM(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END)
         |  AS BIGINT) AS p4,
         | CAST(SUM(CASE WHEN l_returnflag = 'R' AND l_quantity >= 30
         |  THEN 1 ELSE 0 END) AS BIGINT) AS p5,
         | CAST(SUM(CASE WHEN l_discount >= 0.05
         |  AND EXTRACT(year FROM l_shipdate) = 1996
         |  THEN 1 ELSE 0 END) AS BIGINT) AS p6
         | FROM lineitem)
         |SELECT * FROM (
         | SELECT '1_returned' AS predicate, p1 AS n_rows,
         |  CAST(p1 * 1000000 // n AS BIGINT) AS selectivity_ppm FROM m
         | UNION ALL SELECT '2_deep_discount', p2,
         |  CAST(p2 * 1000000 // n AS BIGINT) FROM m
         | UNION ALL SELECT '3_ship_1996', p3,
         |  CAST(p3 * 1000000 // n AS BIGINT) FROM m
         | UNION ALL SELECT '4_bulk_qty', p4,
         |  CAST(p4 * 1000000 // n AS BIGINT) FROM m
         | UNION ALL SELECT '5_returned_and_bulk', p5,
         |  CAST(p5 * 1000000 // n AS BIGINT) FROM m
         | UNION ALL SELECT '6_deep_discount_1996', p6,
         |  CAST(p6 * 1000000 // n AS BIGINT) FROM m)
         |ORDER BY predicate""".stripMargin.replace("\n", " ")),
    "x500_majority_vote_repair" ->
      ("""WITH base AS (SELECT o_orderkey AS k,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         | FROM orders WHERE o_orderkey IS NOT NULL
         |  AND o_totalprice IS NOT NULL),
         |r0 AS (SELECT k, CASE WHEN h % 97 = 0 THEN v + 1000000 ELSE v END
         |  AS v0 FROM (SELECT k, v, CAST(('0x' || substr(md5(CAST(k AS
         |  VARCHAR) || '|r0'), 1, 15)) AS BIGINT) AS h FROM base)
         | WHERE h % 101 <> 0),
         |r1 AS (SELECT k, CASE WHEN h % 97 = 0 THEN v + 1000000 ELSE v END
         |  AS v1 FROM (SELECT k, v, CAST(('0x' || substr(md5(CAST(k AS
         |  VARCHAR) || '|r1'), 1, 15)) AS BIGINT) AS h FROM base)
         | WHERE h % 101 <> 0),
         |r2 AS (SELECT k, CASE WHEN h % 97 = 0 THEN v + 1000000 ELSE v END
         |  AS v2 FROM (SELECT k, v, CAST(('0x' || substr(md5(CAST(k AS
         |  VARCHAR) || '|r2'), 1, 15)) AS BIGINT) AS h FROM base)
         | WHERE h % 101 <> 0),
         |j AS (SELECT k, v0, v1, v2,
         |  CASE WHEN v0 = v1 OR v0 = v2 THEN v0
         |   WHEN v1 = v2 THEN v1 END AS maj
         | FROM r0 FULL JOIN r1 USING (k) FULL JOIN r2 USING (k)),
         |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(SUM(CASE WHEN v0 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   AS m0,
         |  CAST(SUM(CASE WHEN v1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   AS m1,
         |  CAST(SUM(CASE WHEN v2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |   AS m2,
         |  CAST(SUM(CASE WHEN v0 IS NOT NULL AND maj IS NOT NULL
         |   AND v0 <> maj THEN 1 ELSE 0 END) AS BIGINT) AS o0,
         |  CAST(SUM(CASE WHEN v1 IS NOT NULL AND maj IS NOT NULL
         |   AND v1 <> maj THEN 1 ELSE 0 END) AS BIGINT) AS o1,
         |  CAST(SUM(CASE WHEN v2 IS NOT NULL AND maj IS NOT NULL
         |   AND v2 <> maj THEN 1 ELSE 0 END) AS BIGINT) AS o2,
         |  CAST(SUM(maj) AS BIGINT) AS rt FROM j)
         |SELECT * FROM (
         | SELECT 'replica_0' AS replica, n_keys, m0 AS rows_missing,
         |  o0 AS rows_outvoted, rt AS repaired_total_cents FROM s
         | UNION ALL SELECT 'replica_1', n_keys, m1, o1, rt FROM s
         | UNION ALL SELECT 'replica_2', n_keys, m2, o2, rt FROM s)
         |ORDER BY replica""".stripMargin.replace("\n", " ")),
    "x501_protocol_violation_census" ->
      ("""WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
         | WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |  AND event_type IS NOT NULL),
         |d AS (SELECT user_id, ts, event_id, event_type,
         |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id) IS NULL
         |   OR ts >= LAG(ts) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id) + INTERVAL 30 MINUTE
         |  THEN 1 ELSE 0 END AS news FROM e),
         |s AS (SELECT user_id, event_type,
         |  SUM(news) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |   AS sid FROM d),
         |f AS (SELECT user_id, sid,
         |  MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
         |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |   AS BIGINT) AS p,
         |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |   AS BIGINT) AS c
         | FROM s GROUP BY 1, 2)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
         | CAST(SUM(1 - hv) * 1000000 // COUNT(*) AS BIGINT)
         |  AS viewless_session_ppm,
         | CAST(SUM(p) AS BIGINT) AS n_purchases,
         | CASE WHEN SUM(p) > 0 THEN CAST(SUM(CASE WHEN hv = 0 THEN p
         |  ELSE 0 END) * 1000000 // SUM(p) AS BIGINT) END
         |  AS viewless_purchase_ppm,
         | CAST(SUM(c) AS BIGINT) AS n_clicks,
         | CASE WHEN SUM(c) > 0 THEN CAST(SUM(CASE WHEN hv = 0 THEN c
         |  ELSE 0 END) * 1000000 // SUM(c) AS BIGINT) END
         |  AS viewless_click_ppm
         |FROM f""".stripMargin.replace("\n", " ")),
    "x502_source_influence_vocab" ->
      ("""WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS w
         | FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
         |g AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS gc FROM w GROUP BY 1),
         |t20 AS (SELECT w FROM g ORDER BY gc DESC, w LIMIT 20),
         |ps AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
         | FROM w GROUP BY 1, 2),
         |src AS (SELECT DISTINCT source FROM ps),
         |full0 AS (SELECT src.source, g.w,
         |  g.gc - COALESCE(ps.c, 0) AS n
         | FROM src CROSS JOIN g LEFT JOIN ps
         |  ON ps.source = src.source AND ps.w = g.w),
         |lt AS (SELECT source, w FROM (SELECT source, w,
         |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, w)
         |   AS rk FROM full0) WHERE rk <= 20)
         |SELECT lt.source,
         | CAST(SUM(CASE WHEN t20.w IS NOT NULL THEN 1 ELSE 0 END)
         |  AS BIGINT) AS overlap_at_20,
         | CAST(SUM(CASE WHEN t20.w IS NOT NULL THEN 1 ELSE 0 END)
         |  * 1000000 // 20 AS BIGINT) AS stability_ppm
         |FROM lt LEFT JOIN t20 ON lt.w = t20.w
         |GROUP BY lt.source ORDER BY lt.source"""
        .stripMargin.replace("\n", " ")),
    "x503_weekday_anova" ->
      ("""WITH d AS (SELECT CAST(ts AS DATE) AS day,
         |  CAST(COUNT(*) AS BIGINT) AS x FROM events
         | WHERE ts IS NOT NULL GROUP BY 1),
         |bo AS (SELECT MIN(CAST(ts AS DATE)) AS d0,
         |  MAX(CAST(ts AS DATE)) AS d1 FROM events WHERE ts IS NOT NULL),
         |s AS (SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
         |  AS DATE) AS day FROM bo),
         |f AS (SELECT date_diff('day', DATE '1994-12-26', s.day) % 7
         |  AS dow, COALESCE(d.x, 0) AS x
         | FROM s LEFT JOIN d ON s.day = d.day),
         |g AS (SELECT dow, CAST(COUNT(*) AS HUGEINT) AS ng,
         |  SUM(CAST(x AS HUGEINT)) AS sg FROM f GROUP BY 1),
         |gg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_weekdays,
         |  SUM(sg * sg // ng) AS t1 FROM g),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         |  SUM(CAST(x AS HUGEINT)) AS sx,
         |  SUM(CAST(x AS HUGEINT) * x) AS q FROM f)
         |SELECT n_days, n_weekdays,
         | CAST(CASE WHEN q > sx * sx // n_days
         |  THEN (t1 - sx * sx // n_days) * 1000000
         |   // (q - sx * sx // n_days) END AS BIGINT) AS eta2_ppm
         |FROM m CROSS JOIN gg""".stripMargin.replace("\n", " ")),
    "x504_ooo_delivery_census" ->
      ("""WITH e AS (SELECT user_id, event_id, event_type,
         |  CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events
         | WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |  AND event_type IS NOT NULL),
         |p AS (SELECT event_type,
         |  LAG(sec) OVER (PARTITION BY user_id ORDER BY event_id) - sec
         |   AS back FROM e),
         |q AS (SELECT event_type, back FROM p WHERE back IS NOT NULL)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         | CAST(SUM(CASE WHEN back > 0 THEN 1 ELSE 0 END) * 1000000
         |  // COUNT(*) AS BIGINT) AS inverted_ppm,
         | CAST(MAX(CASE WHEN back > 0 THEN back ELSE 0 END) AS BIGINT)
         |  AS max_backstep_sec
         |FROM q GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),
    "x505_lsh_config_invariance" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM jpairs)
         |SELECT * FROM (
         | SELECT CAST(96 AS BIGINT) AS num_bands,
         |  CAST(2 AS BIGINT) AS rows_per_band, n AS n_pairs FROM c
         | UNION ALL SELECT 64, 3, n FROM c
         | UNION ALL SELECT 48, 4, n FROM c)
         |ORDER BY num_bands""".stripMargin.replace("\n", " ")),
    "x506_probe_depth_certificate" ->
      (s"""WITH q AS (SELECT embedding AS qe FROM embeddings
         |  WHERE vec_id = 0),
         |dims AS (SELECT e.label, dd.d, e.embedding[dd.d+1] AS v
         | FROM embeddings e CROSS JOIN (SELECT unnest(range(64)) AS d) dd),
         |cent0 AS (SELECT label, d,
         |  CAST(SUM(CAST(v AS DECIMAL(28,9))) AS FLOAT) AS s
         | FROM dims GROUP BY 1, 2),
         |cent AS (SELECT label, list(s ORDER BY d) AS cvec
         | FROM cent0 GROUP BY 1),
         |cr AS (SELECT label, CAST(ROW_NUMBER() OVER (ORDER BY
         |  ${cos2Sql("cvec", "qe")} DESC, label) AS BIGINT) AS cell_rank
         | FROM cent CROSS JOIN q),
         |t10 AS (SELECT DISTINCT e.label FROM embeddings e CROSS JOIN q
         | WHERE e.vec_id IN (SELECT vec_id FROM (SELECT vec_id,
         |  ROUND(${cos2Sql("e2.embedding", "qe")}, 6) AS sim
         |  FROM embeddings e2 CROSS JOIN q
         |  ORDER BY sim DESC, vec_id LIMIT 10))),
         |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells FROM cr)
         |SELECT CAST(10 AS BIGINT) AS k, nc.n_cells,
         | CAST(COUNT(*) AS BIGINT) AS n_cells_holding_top10,
         | CAST(MAX(cr.cell_rank) AS BIGINT) AS probe_depth,
         | CAST(MIN(cr.cell_rank) AS BIGINT) AS best_cell_rank
         |FROM t10 JOIN cr ON t10.label = cr.label CROSS JOIN nc
         |GROUP BY nc.n_cells""".stripMargin.replace("\n", " ")),
    "x507_failover_coverage" ->
      ("""WITH lp AS (SELECT p_brand AS brand, l_partkey AS pk,
         |  l_suppkey AS sk,
         |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   AS c
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE p_brand IS NOT NULL AND l_suppkey IS NOT NULL),
         |pp AS (SELECT brand, pk, CAST(COUNT(DISTINCT sk) AS BIGINT)
         |  AS ns, CAST(SUM(c) AS BIGINT) AS rev FROM lp GROUP BY 1, 2)
         |SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
         | CAST(SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |  AS single_supplier_parts,
         | CAST(SUM(CASE WHEN ns = 1 THEN 1 ELSE 0 END) * 1000000
         |  // COUNT(*) AS BIGINT) AS fragile_part_ppm,
         | CAST(SUM(CASE WHEN ns = 1 THEN rev ELSE 0 END) * 1000000
         |  // SUM(rev) AS BIGINT) AS revenue_at_risk_ppm
         |FROM pp GROUP BY brand ORDER BY brand"""
        .stripMargin.replace("\n", " ")),
    "x508_return_by_delay" ->
      ("""WITH d AS (SELECT date_diff('day', CAST(o_orderdate AS DATE),
         |  CAST(l_shipdate AS DATE)) AS dd,
         |  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | WHERE l_shipdate IS NOT NULL AND o_orderdate IS NOT NULL
         |  AND l_returnflag IS NOT NULL),
         |b AS (SELECT CASE WHEN dd <= 30 THEN '0_0_30'
         |  WHEN dd <= 60 THEN '1_31_60' WHEN dd <= 90 THEN '2_61_90'
         |  ELSE '3_over_90' END AS delay_band, r FROM d WHERE dd >= 0)
         |SELECT delay_band, CAST(COUNT(*) AS BIGINT) AS n_lines,
         | CAST(SUM(r) * 1000000 // COUNT(*) AS BIGINT) AS return_ppm
         |FROM b GROUP BY delay_band ORDER BY delay_band"""
        .stripMargin.replace("\n", " ")),
    "x509_order_total_conformance" ->
      ("""WITH li AS (SELECT l_orderkey,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)
         |   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
         |   * (100 + CAST(ROUND(l_tax * 100) AS BIGINT)) // 10000)
         |   AS BIGINT) AS derived
         | FROM lineitem WHERE l_extendedprice IS NOT NULL
         |  AND l_discount IS NOT NULL AND l_tax IS NOT NULL GROUP BY 1),
         |j AS (SELECT ABS(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |  AS BIGINT) - li.derived) * 1000000
         |  // CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |  AS dev
         | FROM orders JOIN li ON o_orderkey = l_orderkey
         | WHERE o_totalprice IS NOT NULL),
         |b AS (SELECT CASE WHEN dev = 0 THEN '0_exact'
         |  WHEN dev < 10000 THEN '1_under_1pct'
         |  WHEN dev < 50000 THEN '2_under_5pct'
         |  ELSE '3_material' END AS deviation_band FROM j),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM b)
         |SELECT deviation_band, CAST(COUNT(*) AS BIGINT) AS n_orders,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM b, t GROUP BY deviation_band, tt ORDER BY deviation_band"""
        .stripMargin.replace("\n", " ")),
    "x510_degree_mixing_matrix" ->
      ("""WITH e AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR)
         |  AS src, 's' || CAST(l_suppkey AS VARCHAR) AS dst
         | FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |dc AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
         | FROM e GROUP BY 1),
         |ds AS (SELECT dst, CAST(COUNT(*) AS BIGINT) AS d
         | FROM e GROUP BY 1),
         |m AS (SELECT CAST(length(bin(dc.d)) AS BIGINT) AS cust_deg_band,
         |  CAST(length(bin(ds.d)) AS BIGINT) AS supp_deg_band
         | FROM e JOIN dc ON e.src = dc.src JOIN ds ON e.dst = ds.dst),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM m)
         |SELECT cust_deg_band, supp_deg_band,
         | CAST(COUNT(*) AS BIGINT) AS n_edges,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM m, t GROUP BY cust_deg_band, supp_deg_band, tt
         |ORDER BY cust_deg_band, supp_deg_band"""
        .stripMargin.replace("\n", " ")),
    "x511_domestic_foreign_delay" ->
      ("""WITH d AS (SELECT CASE WHEN c_nationkey = s_nationkey
         |  THEN '0_domestic' ELSE '1_foreign' END AS relationship,
         |  date_diff('day', CAST(o_orderdate AS DATE),
         |   CAST(l_shipdate AS DATE)) AS x
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         | WHERE l_shipdate IS NOT NULL AND o_orderdate IS NOT NULL),
         |f AS (SELECT relationship, x FROM d WHERE x >= 0),
         |c AS (SELECT relationship, x, CAST(COUNT(*) AS BIGINT) AS c
         | FROM f GROUP BY 1, 2),
         |t AS (SELECT relationship, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(x) AS BIGINT) AS sx FROM f GROUP BY 1),
         |cu AS (SELECT relationship, x,
         |  SUM(c) OVER (PARTITION BY relationship ORDER BY x) AS cum
         | FROM c)
         |SELECT cu.relationship, MAX(t.n) AS n_lines,
         | CAST(MIN(CASE WHEN cu.cum * 2 >= t.n THEN cu.x END) AS BIGINT)
         |  AS median_delay_days,
         | CAST(MAX(1000 * t.sx // t.n) AS BIGINT) AS mean_delay_milli
         |FROM cu JOIN t ON cu.relationship = t.relationship
         |GROUP BY cu.relationship ORDER BY cu.relationship"""
        .stripMargin.replace("\n", " ")),
    "x512_build_side_advisor" ->
      ("""WITH li AS (SELECT CAST(COUNT(*) AS BIGINT) AS r,
         |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS ko,
         |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS kp,
         |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS ks
         | FROM lineitem),
         |o AS (SELECT CAST(COUNT(*) AS BIGINT) AS r,
         |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS kk,
         |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS kc FROM orders),
         |c AS (SELECT CAST(COUNT(*) AS BIGINT) AS r,
         |  CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS k FROM customer),
         |p AS (SELECT CAST(COUNT(*) AS BIGINT) AS r,
         |  CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS k FROM part),
         |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS r,
         |  CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS k FROM supplier)
         |SELECT * FROM (
         | SELECT '1_lineitem_orders' AS join_name, li.r AS left_rows,
         |  li.ko AS left_keys, o.r AS right_rows, o.kk AS right_keys,
         |  CASE WHEN o.r <= li.r THEN 'orders' ELSE 'lineitem' END
         |   AS build_side,
         |  CAST(CASE WHEN LEAST(li.r, o.r) <= 100000 THEN 1 ELSE 0 END
         |   AS INT) AS broadcast_ok FROM li CROSS JOIN o
         | UNION ALL SELECT '2_orders_customer', o.r, o.kc, c.r, c.k,
         |  CASE WHEN c.r <= o.r THEN 'customer' ELSE 'orders' END,
         |  CAST(CASE WHEN LEAST(o.r, c.r) <= 100000 THEN 1 ELSE 0 END
         |   AS INT) FROM o CROSS JOIN c
         | UNION ALL SELECT '3_lineitem_part', li.r, li.kp, p.r, p.k,
         |  CASE WHEN p.r <= li.r THEN 'part' ELSE 'lineitem' END,
         |  CAST(CASE WHEN LEAST(li.r, p.r) <= 100000 THEN 1 ELSE 0 END
         |   AS INT) FROM li CROSS JOIN p
         | UNION ALL SELECT '4_lineitem_supplier', li.r, li.ks, s.r, s.k,
         |  CASE WHEN s.r <= li.r THEN 'supplier' ELSE 'lineitem' END,
         |  CAST(CASE WHEN LEAST(li.r, s.r) <= 100000 THEN 1 ELSE 0 END
         |   AS INT) FROM li CROSS JOIN s)
         |ORDER BY join_name""".stripMargin.replace("\n", " ")),
    "x513_cross_system_value_ks" ->
      ("""WITH a AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100
         |  AS BIGINT) AS v FROM events
         | WHERE event_type = 'purchase' AND value IS NOT NULL),
         |b AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |  AS BIGINT) AS v FROM orders WHERE o_totalprice IS NOT NULL),
         |g AS (SELECT v FROM a UNION SELECT v FROM b),
         |ca AS (SELECT g.v, SUM(COALESCE(ac.c, 0))
         |  OVER (ORDER BY g.v) AS cum
         | FROM g LEFT JOIN (SELECT v, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM a GROUP BY 1) ac ON g.v = ac.v),
         |cb AS (SELECT g.v, SUM(COALESCE(bc.c, 0))
         |  OVER (ORDER BY g.v) AS cum
         | FROM g LEFT JOIN (SELECT v, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM b GROUP BY 1) bc ON g.v = bc.v),
         |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS na FROM a),
         |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb FROM b)
         |SELECT MAX(na.na) AS n_purchases, MAX(nb.nb) AS n_orders,
         | CAST(MAX(ABS(ca.cum * nb.nb - cb.cum * na.na) * 1000000
         |  // (CAST(na.na AS HUGEINT) * nb.nb)) AS BIGINT) AS ks_ppm
         |FROM ca JOIN cb ON ca.v = cb.v CROSS JOIN na CROSS JOIN nb"""
        .stripMargin.replace("\n", " ")),
    "x514_product_family_census" ->
      ("""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
         | FROM lineitem WHERE l_shipdate >= DATE '1996-01-01'
         |  AND l_shipdate < DATE '1998-01-01'),
         |pw AS (SELECT a.p AS d1, b.p AS d2, CAST(COUNT(*) AS BIGINT)
         |  AS w FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
         | GROUP BY 1, 2),
         |st AS (SELECT d1, d2 FROM pw WHERE w >= 2),
         |edges AS (SELECT d1 AS a, d2 AS b FROM st
         | UNION ALL SELECT d2, d1 FROM st),
         |l0 AS (SELECT DISTINCT a AS node, a AS label FROM edges),
         |l1 AS (SELECT l.node AS node, LEAST(l.label,
         |  COALESCE(MIN(r.label), l.label)) AS label
         | FROM l0 l LEFT JOIN edges e ON e.a = l.node
         |  LEFT JOIN l0 r ON r.node = e.b GROUP BY l.node, l.label),
         |l2 AS (SELECT l.node AS node, LEAST(l.label,
         |  COALESCE(MIN(r.label), l.label)) AS label
         | FROM l1 l LEFT JOIN edges e ON e.a = l.node
         |  LEFT JOIN l1 r ON r.node = e.b GROUP BY l.node, l.label),
         |l3 AS (SELECT l.node AS node, LEAST(l.label,
         |  COALESCE(MIN(r.label), l.label)) AS label
         | FROM l2 l LEFT JOIN edges e ON e.a = l.node
         |  LEFT JOIN l2 r ON r.node = e.b GROUP BY l.node, l.label),
         |sz AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS sz FROM l3
         | GROUP BY 1),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM sz)
         |SELECT CAST(length(bin(sz)) AS BIGINT) AS size_log2_band,
         | CAST(COUNT(*) AS BIGINT) AS n_families,
         | CAST(SUM(sz) AS BIGINT) AS n_parts,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM sz, t GROUP BY size_log2_band, tt
         |ORDER BY size_log2_band""".stripMargin.replace("\n", " ")),
    "x515_relationship_stickiness" ->
      ("""WITH pq AS (SELECT o_custkey AS c, l_suppkey AS s,
         |  CAST(COUNT(DISTINCT CAST(date_trunc('quarter',
         |   CAST(o_orderdate AS DATE)) AS DATE)) AS BIGINT) AS nq
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL
         |  AND o_orderdate IS NOT NULL GROUP BY 1, 2),
         |b AS (SELECT CASE WHEN nq = 1 THEN '0_one_quarter'
         |  WHEN nq = 2 THEN '1_two_quarters'
         |  WHEN nq <= 5 THEN '2_three_to_five'
         |  ELSE '3_six_plus' END AS stickiness_band FROM pq),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM b)
         |SELECT stickiness_band, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM b, t GROUP BY stickiness_band, tt
         |ORDER BY stickiness_band""".stripMargin.replace("\n", " ")),
    "x516_buyer_breadth_quadrants" ->
      ("""WITH per AS (SELECT o_custkey,
         |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS orders,
         |  CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS brands
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN part ON l_partkey = p_partkey
         | WHERE o_custkey IS NOT NULL AND p_brand IS NOT NULL
         | GROUP BY 1),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per),
         |mo AS (SELECT CAST(MIN(CASE WHEN cum * 2 >= n.n THEN v END)
         |  AS BIGINT) AS mo FROM (SELECT orders AS v,
         |   SUM(COUNT(*)) OVER (ORDER BY orders) AS cum
         |  FROM per GROUP BY orders) CROSS JOIN n),
         |mb AS (SELECT CAST(MIN(CASE WHEN cum * 2 >= n.n THEN v END)
         |  AS BIGINT) AS mb FROM (SELECT brands AS v,
         |   SUM(COUNT(*)) OVER (ORDER BY brands) AS cum
         |  FROM per GROUP BY brands) CROSS JOIN n),
         |q AS (SELECT (CASE WHEN orders >= mo.mo THEN 'frequent'
         |  ELSE 'casual' END) || '_' || (CASE WHEN brands >= mb.mb
         |  THEN 'broad' ELSE 'narrow' END) AS quadrant
         | FROM per CROSS JOIN mo CROSS JOIN mb),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM q)
         |SELECT quadrant, CAST(COUNT(*) AS BIGINT) AS n_customers,
         | CAST(COUNT(*) * 1000000 // tt AS BIGINT) AS share_ppm
         |FROM q, t GROUP BY quadrant, tt ORDER BY quadrant"""
        .stripMargin.replace("\n", " ")),
    "x517_recall_k_curve" -> recallKCurveOracle,
    "x518_hub_removal_sweep" ->
      ("""WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
         | FROM lineitem WHERE l_shipdate >= DATE '1996-01-01'
         |  AND l_shipdate < DATE '1998-01-01'),
         |e AS (SELECT DISTINCT a.p AS u, b.p AS v
         | FROM li a JOIN li b ON a.o = b.o AND a.p < b.p),
         |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
         | FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
         | GROUP BY 1),
         |rk AS (SELECT node, ROW_NUMBER() OVER (ORDER BY d DESC, node)
         |  AS r FROM deg),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tt FROM e),
         |ks AS (SELECT CAST(unnest([1, 5, 10]) AS BIGINT) AS k),
         |lost AS (SELECT ks.k, CAST(COUNT(*) AS BIGINT) AS edges_lost
         | FROM ks CROSS JOIN e
         | WHERE EXISTS (SELECT 1 FROM rk WHERE rk.r <= ks.k
         |   AND (rk.node = e.u OR rk.node = e.v))
         | GROUP BY 1)
         |SELECT ks.k AS n_hubs_removed, COALESCE(lost.edges_lost, 0)
         |  AS edges_lost,
         | CAST(COALESCE(lost.edges_lost, 0) * 1000000 // t.tt AS BIGINT)
         |  AS edge_share_ppm
         |FROM ks LEFT JOIN lost ON ks.k = lost.k CROSS JOIN t
         |ORDER BY n_hubs_removed""".stripMargin.replace("\n", " ")),
    "x519_length_tail_ratio" ->
      ("""WITH d AS (SELECT source, n_chars AS v FROM documents
         | WHERE source IS NOT NULL AND n_chars IS NOT NULL),
         |c AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS c
         | FROM d GROUP BY 1, 2),
         |t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
         | FROM d GROUP BY 1),
         |cu AS (SELECT source, v, SUM(c) OVER (PARTITION BY source
         |  ORDER BY v) AS cum FROM c),
         |g AS (SELECT cu.source, MAX(t.n) AS n_docs,
         |  CAST(MIN(CASE WHEN cum * 2 >= t.n THEN v END) AS BIGINT)
         |   AS p50_chars,
         |  CAST(MIN(CASE WHEN cum * 100 >= t.n * 99 THEN v END)
         |   AS BIGINT) AS p99_chars
         | FROM cu JOIN t ON cu.source = t.source GROUP BY 1)
         |SELECT source, n_docs, p50_chars, p99_chars,
         | CAST(1000 * p99_chars // p50_chars AS BIGINT)
         |  AS tail_ratio_milli
         |FROM g ORDER BY source""".stripMargin.replace("\n", " ")),
    "x520_watermark_sizing" ->
      ("""WITH e AS (SELECT user_id, event_id,
         |  CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec FROM events
         | WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |l AS (SELECT MAX(sec) OVER (PARTITION BY user_id
         |   ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
         |   AND 1 PRECEDING) AS mx, sec FROM e),
         |f AS (SELECT GREATEST(mx - sec, 0) AS late FROM l
         | WHERE mx IS NOT NULL),
         |c AS (SELECT late, CAST(COUNT(*) AS BIGINT) AS c
         | FROM f GROUP BY 1),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
         |cu AS (SELECT late, SUM(c) OVER (ORDER BY late) AS cum FROM c)
         |SELECT MAX(n.n) AS n_events,
         | CAST(MIN(CASE WHEN cum * 2 >= n.n THEN late END) AS BIGINT)
         |  AS p50_late_sec,
         | CAST(MIN(CASE WHEN cum * 100 >= n.n * 99 THEN late END)
         |  AS BIGINT) AS p99_late_sec,
         | CAST(MIN(CASE WHEN cum * 1000 >= n.n * 999 THEN late END)
         |  AS BIGINT) AS p999_late_sec,
         | CAST(MAX(late) AS BIGINT) AS max_late_sec
         |FROM cu CROSS JOIN n""".stripMargin.replace("\n", " ")),
    "x521_type_mix_drift" ->
      ("""WITH cell AS (SELECT year(CAST(l_shipdate AS DATE)) AS yr,
         |  p_type AS p, COUNT(*) AS n
         | FROM lineitem JOIN part ON l_partkey = p_partkey
         | WHERE l_shipdate IS NOT NULL AND p_type IS NOT NULL
         | GROUP BY 1, 2),
         |yt AS (SELECT yr, SUM(n) AS t FROM cell GROUP BY 1),
         |sh AS (SELECT cell.yr, p, CAST(n * 1000000 // t AS BIGINT) AS s
         | FROM cell JOIN yt ON yt.yr = cell.yr),
         |spine AS (SELECT yt.yr, pr.p FROM yt
         | CROSS JOIN (SELECT DISTINCT p FROM cell) pr),
         |f AS (SELECT spine.yr, spine.p, COALESCE(sh.s, 0) AS s
         | FROM spine LEFT JOIN sh ON sh.yr = spine.yr AND sh.p = spine.p),
         |lg AS (SELECT yr, p, s,
         |  LAG(s) OVER (PARTITION BY p ORDER BY yr) AS prev FROM f)
         |SELECT yr, CAST(SUM(ABS(s - prev)) AS BIGINT) AS l1_drift_ppm,
         | CAST(COUNT(*) AS BIGINT) AS n_categories
         |FROM lg WHERE prev IS NOT NULL GROUP BY 1 ORDER BY yr"""
        .stripMargin.replace("\n", " ")),
    "x522_video_motion_proxy" ->
      ("""WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w,
         |  8 + doc_id % 7 AS h, 1 + doc_id % 6 AS nf FROM documents
         | WHERE doc_id % 7 = 0),
         |fr AS (SELECT doc_id, w, h, unnest(range(nf)) AS f FROM d),
         |px AS (SELECT doc_id, f, w, h, unnest(range(w * h)) AS i
         | FROM fr),
         |fs AS (SELECT doc_id, f,
         |  CAST(SUM((doc_id * 31 + f * 17 + 7 * (i % w)
         |   + 13 * (i // w)) % 256) AS BIGINT) AS fsum
         | FROM px GROUP BY 1, 2),
         |dl AS (SELECT doc_id, ABS(fsum - LAG(fsum) OVER
         |  (PARTITION BY doc_id ORDER BY f)) AS delta FROM fs)
         |SELECT d.doc_id, CAST(d.nf AS INT) AS n_frames,
         | CAST(COALESCE(MAX(dl.delta), 0) AS BIGINT) AS max_frame_delta
         |FROM d LEFT JOIN dl ON d.doc_id = dl.doc_id
         |GROUP BY d.doc_id, d.nf ORDER BY d.doc_id"""
        .stripMargin.replace("\n", " ")),
    "x523_mann_whitney_auc" ->
      ("""WITH v AS (SELECT CASE WHEN c_mktsegment = 'AUTOMOBILE'
         |   THEN 1 ELSE 0 END AS a,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
         | FROM orders JOIN customer ON o_custkey = c_custkey
         | WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
         |  AND o_totalprice IS NOT NULL),
         |c AS (SELECT v, COUNT(*) AS c, SUM(a) AS ca FROM v GROUP BY 1),
         |cu AS (SELECT v, c, ca, COALESCE(SUM(c) OVER (ORDER BY v
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
         | FROM c),
         |g AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_auto,
         |  CAST(SUM(c - ca) AS BIGINT) AS n_build,
         |  CAST(SUM(ca * (bef * 2 + c + 1)) AS BIGINT)
         |   AS rank_sum_auto_x2 FROM cu)
         |SELECT n_auto, n_build, rank_sum_auto_x2,
         | CAST(rank_sum_auto_x2 - n_auto * (n_auto + 1) AS BIGINT)
         |  AS u_auto_x2,
         | CAST((rank_sum_auto_x2 - n_auto * (n_auto + 1)) * 1000000
         |  // (2 * n_auto * n_build) AS BIGINT) AS auc_ppm
         |FROM g""".stripMargin.replace("\n", " ")),
    "x524_daily_burstiness" ->
      ("""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS d FROM events
         | WHERE event_type IS NOT NULL AND ts IS NOT NULL),
         |days AS (SELECT DISTINCT d FROM e),
         |ty AS (SELECT DISTINCT event_type FROM e),
         |cell AS (SELECT event_type, d, COUNT(*) AS n FROM e
         | GROUP BY 1, 2),
         |f AS (SELECT ty.event_type, days.d, COALESCE(cell.n, 0) AS x
         | FROM days CROSS JOIN ty LEFT JOIN cell
         |  ON cell.event_type = ty.event_type AND cell.d = days.d),
         |g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
         |  SUM(CAST(x AS DECIMAL(38,0))) AS s,
         |  SUM(CAST(x AS DECIMAL(38,0)) * x) AS q FROM f GROUP BY 1)
         |SELECT event_type, n_days,
         | CAST(s AS BIGINT) * 1000 // n_days AS mean_daily_milli,
         | CASE WHEN n_days > 1 AND s > 0 THEN
         |  CAST(n_days * q - s * s AS BIGINT) * 1000
         |   // (CAST((n_days - 1) * s AS BIGINT))
         |  END AS fano_milli
         |FROM g ORDER BY event_type""".stripMargin.replace("\n", " ")),
    "x525_image_resize_audit" ->
      ("""WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7
         |  AS h FROM documents WHERE doc_id % 5 = 3),
         |t AS (SELECT doc_id, w, h, unnest(range(16)) AS i FROM p),
         |v AS (SELECT doc_id, w, h, i,
         |  (doc_id * 31 + 7 * ((i % 4) * w // 4)
         |   + 13 * ((i // 4) * h // 4)) % 256 AS g FROM t)
         |SELECT doc_id, CAST(MAX(w) AS INT) AS src_width,
         | CAST(MAX(h) AS INT) AS src_height, CAST(4 AS INT) AS tgt_width,
         | CAST(4 AS INT) AS tgt_height,
         | CAST(SUM(g) AS BIGINT) AS resized_sum,
         | CAST(SUM((i + 1) * g) AS BIGINT) AS resized_checksum
         |FROM v GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")),
    "x526_blocking_quality_audit" ->
      ("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
         |  FROM documents WHERE doc_id % 2 = 1),
         |ix AS (SELECT doc_id, ws, unnest(range(len(ws) - 2)) AS i
         | FROM w WHERE len(ws) >= 3),
         |sh AS (SELECT DISTINCT doc_id,
         |  ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s FROM ix),
         |hh AS (SELECT DISTINCT doc_id,
         |  CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM sh),
         |hsz AS (SELECT doc_id, COUNT(*) AS n FROM hh GROUP BY doc_id),
         |dfq AS (SELECT h, COUNT(*) AS df FROM hh GROUP BY h),
         |rk AS (SELECT hh.doc_id, hh.h, hsz.n,
         |  ROW_NUMBER() OVER (PARTITION BY hh.doc_id
         |   ORDER BY dfq.df, hh.h) AS rk
         | FROM hh JOIN dfq ON dfq.h = hh.h
         |  JOIN hsz ON hsz.doc_id = hh.doc_id),
         |pref AS (SELECT doc_id, h FROM rk
         | WHERE rk <= n - CEIL(n * 0.7) + 1),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         | FROM pref a JOIN pref b ON a.h = b.h
         |  AND a.doc_id < b.doc_id),
         |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
         |  COUNT(*) AS inter FROM hh a JOIN hh b ON a.h = b.h
         |  AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |truth AS (SELECT d1, d2 FROM pairs
         | JOIN hsz s1 ON s1.doc_id = d1 JOIN hsz s2 ON s2.doc_id = d2
         | WHERE CAST(inter AS DOUBLE)
         |  / CAST(s1.n + s2.n - inter AS DOUBLE) >= 0.7),
         |c AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM hsz)
         |   AS n_docs,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth
         |    JOIN cand USING (d1, d2)) AS matched)
         |SELECT n_docs, n_docs * (n_docs - 1) // 2 AS n_possible_pairs,
         | n_cand AS n_candidate_pairs, matched AS n_true_pairs,
         | CASE WHEN n_truth > 0 THEN matched * 1000000 // n_truth
         |  ELSE 1000000 END AS completeness_ppm,
         | CASE WHEN n_docs > 1 THEN (n_docs * (n_docs - 1) // 2 - n_cand)
         |  * 1000000 // (n_docs * (n_docs - 1) // 2) END AS reduction_ppm
         |FROM c""".stripMargin.replace("\n", " ")),
    "x527_audio_decimation_audit" ->
      ("""WITH d AS (SELECT doc_id, 64 + doc_id % 37 AS n FROM documents
         | WHERE doc_id % 3 = 1),
         |t AS (SELECT doc_id, n, unnest(range(n)) AS t FROM d),
         |k AS (SELECT doc_id, n, t, t // 2 + 1 AS j,
         |  (doc_id * 31 + 7 * t) % 65536 - 32768 AS v
         | FROM t WHERE t % 2 = 0)
         |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_samples,
         | CAST(COUNT(*) AS BIGINT) AS n_kept,
         | CAST(SUM(ABS(v)) AS BIGINT) AS kept_abs_sum,
         | CAST(SUM(j * v) AS BIGINT) AS kept_checksum
         |FROM k GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")),
    "x528_join_cardinality_estimate" ->
      ("""WITH k AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
         | FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
         |r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, l_partkey)
         |  AS rn FROM k),
         |tp AS (SELECT CAST(COUNT(*) AS BIGINT) AS topk,
         |  CAST(SUM(c) AS BIGINT) AS top_rows,
         |  CAST(SUM(c * c) AS BIGINT) AS top_sq FROM r WHERE rn <= 10),
         |al AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(SUM(c) AS BIGINT) AS n_rows,
         |  CAST(SUM(c * c) AS BIGINT) AS sq FROM k),
         |e AS (SELECT n_rows, n_keys, sq AS exact_pairs,
         |  top_sq + CASE WHEN n_keys > topk THEN
         |   (n_rows - top_rows) * (n_rows - top_rows) // (n_keys - topk)
         |   ELSE 0 END AS est_pairs FROM al CROSS JOIN tp)
         |SELECT n_rows, n_keys, exact_pairs, est_pairs,
         | ABS(est_pairs - exact_pairs) * 1000000 // exact_pairs AS err_ppm
         |FROM e""".stripMargin.replace("\n", " ")),
    "x529_kmv_sketch_audit" ->
      (s"""WITH $shingleCtes,
         |pres AS (SELECT s,
         |  MAX(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS ina,
         |  MAX(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS inb
         | FROM sh GROUP BY s),
         |ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_union,
         |  CAST(SUM(ina * inb) AS BIGINT) AS exact_inter FROM pres),
         |hh AS (SELECT ina, inb,
         |  CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM pres),
         |ak AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h)
         |  AS rn FROM hh WHERE ina = 1) WHERE rn <= 128),
         |bk AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h)
         |  AS rn FROM hh WHERE inb = 1) WHERE rn <= 128),
         |uk AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h)
         |  AS rn FROM (SELECT DISTINCT h FROM (SELECT h FROM ak
         |   UNION ALL SELECT h FROM bk))) WHERE rn <= 128),
         |sk AS (SELECT CAST(COUNT(*) AS BIGINT) AS ku,
         |  CAST(MAX(uk.h) AS BIGINT) AS hk,
         |  CAST(SUM(CASE WHEN ak.h IS NOT NULL AND bk.h IS NOT NULL
         |   THEN 1 ELSE 0 END) AS BIGINT) AS m
         | FROM uk LEFT JOIN ak ON ak.h = uk.h
         |  LEFT JOIN bk ON bk.h = uk.h),
         |f AS (SELECT 128 AS k, m * 1000000 // ku AS est_jaccard_ppm,
         |  exact_inter * 1000000 // exact_union AS exact_jaccard_ppm,
         |  CASE WHEN ku < 128 THEN ku ELSE CAST((ku - 1)
         |   * CAST(1152921504606846976 AS HUGEINT) // hk AS BIGINT)
         |   END AS est_union,
         |  exact_union, exact_inter FROM sk CROSS JOIN ex)
         |SELECT CAST(k AS BIGINT) AS k, est_jaccard_ppm,
         | exact_jaccard_ppm, est_union, exact_union, exact_inter,
         | ABS(est_union - exact_union) * 1000000 // exact_union
         |  AS union_err_ppm FROM f""".stripMargin.replace("\n", " ")),
    "x530_revenue_drawdown" ->
      ("""WITH d AS (SELECT CAST(l_shipdate AS DATE) AS d,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS rev
         | FROM lineitem WHERE l_shipdate IS NOT NULL
         |  AND l_extendedprice IS NOT NULL GROUP BY 1),
         |p AS (SELECT d, rev, MAX(rev) OVER (ORDER BY d
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
         | FROM d),
         |dd AS (SELECT d, rev, peak, peak - rev AS gap FROM p),
         |mx AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         |  CAST(MAX(rev) AS BIGINT) AS max_daily_rev_cents,
         |  CAST(MAX(gap) AS BIGINT) AS max_drawdown_cents FROM dd)
         |SELECT mx.n_days, mx.max_daily_rev_cents, mx.max_drawdown_cents,
         | MIN(dd.d) AS trough_day,
         | mx.max_drawdown_cents * 1000000 // MIN_BY(dd.peak, dd.d)
         |  AS drawdown_ppm_of_peak
         |FROM dd CROSS JOIN mx WHERE dd.gap = mx.max_drawdown_cents
         |GROUP BY 1, 2, 3""".stripMargin.replace("\n", " ")),
    "x531_order_wip_depth" ->
      ("""WITH cl AS (SELECT l_orderkey,
         |  MAX(CAST(l_shipdate AS DATE)) AS close FROM lineitem
         | GROUP BY 1),
         |o AS (SELECT CAST(o_orderdate AS DATE) AS open, close
         | FROM orders JOIN cl ON o_orderkey = l_orderkey
         | WHERE o_orderdate IS NOT NULL AND close IS NOT NULL
         |  AND close >= CAST(o_orderdate AS DATE)),
         |dl AS (SELECT open AS d, 1 AS delta FROM o
         | UNION ALL SELECT close + 1, -1 FROM o),
         |g AS (SELECT d, CAST(SUM(delta) AS BIGINT) AS dd FROM dl
         | GROUP BY 1),
         |span AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM g),
         |spine AS (SELECT CAST(unnest(generate_series(lo, hi,
         |  INTERVAL 1 DAY)) AS DATE) AS d FROM span),
         |dep AS (SELECT spine.d, SUM(COALESCE(g.dd, 0)) OVER
         |  (ORDER BY spine.d ROWS BETWEEN UNBOUNDED PRECEDING AND
         |   CURRENT ROW) AS depth
         | FROM spine LEFT JOIN g ON g.d = spine.d)
         |SELECT CAST(date_trunc('month', d) AS DATE) AS month,
         | CAST(MAX(depth) AS BIGINT) AS max_open_orders,
         | CAST(SUM(depth) AS BIGINT) // COUNT(*) AS mean_open_orders
         |FROM dep GROUP BY 1 ORDER BY 1"""
        .stripMargin.replace("\n", " ")),
    "x532_partial_agg_advisor" ->
      ("""WITH c AS (
         | SELECT 'l_returnflag' AS key_candidate, COUNT(*) AS n_rows,
         |  COUNT(DISTINCT l_returnflag) AS n_groups FROM lineitem
         | UNION ALL SELECT 'l_suppkey', COUNT(*),
         |  COUNT(DISTINCT l_suppkey) FROM lineitem
         | UNION ALL SELECT 'l_partkey', COUNT(*),
         |  COUNT(DISTINCT l_partkey) FROM lineitem
         | UNION ALL SELECT 'l_partkey,l_suppkey', COUNT(*),
         |  COUNT(DISTINCT (l_partkey, l_suppkey)) FROM lineitem
         | UNION ALL SELECT 'l_orderkey', COUNT(*),
         |  COUNT(DISTINCT l_orderkey) FROM lineitem),
         |r AS (SELECT key_candidate, CAST(n_rows AS BIGINT) AS n_rows,
         |  CAST(n_groups AS BIGINT) AS n_groups,
         |  CAST(n_rows - n_groups AS BIGINT) * 1000000
         |   // CAST(n_rows AS BIGINT) AS reduction_ppm FROM c)
         |SELECT key_candidate, n_rows, n_groups, reduction_ppm,
         | CASE WHEN reduction_ppm >= 900000 THEN '0_combine_wins'
         |  WHEN reduction_ppm >= 500000 THEN '1_combine_helps'
         |  ELSE '2_skip_partial' END AS verdict
         |FROM r ORDER BY key_candidate"""
        .stripMargin.replace("\n", " ")),
    "x533_bitemporal_asof" ->
      ("""WITH b AS (SELECT p_partkey,
         |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   AS c FROM part WHERE p_retailprice IS NOT NULL),
         |v AS (SELECT p_partkey, c AS price_cents,
         |  DATE '1992-01-01' AS valid_from, DATE '1992-06-01' AS txn_at
         | FROM b
         | UNION ALL SELECT p_partkey, c + 100, DATE '1995-01-01',
         |  DATE '1996-06-01' FROM b WHERE p_partkey % 10 = 0
         | UNION ALL SELECT p_partkey, c - 50, DATE '1994-01-01',
         |  DATE '1997-06-01' FROM b WHERE p_partkey % 10 = 5),
         |rd AS (SELECT '0_as_known_1995' AS read_label,
         |  DATE '1995-12-31' AS t
         | UNION ALL SELECT '1_as_known_now', DATE '2026-01-01'),
         |pick AS (SELECT rd.read_label, v.p_partkey, v.price_cents,
         |  v.txn_at, ROW_NUMBER() OVER (PARTITION BY rd.read_label,
         |   v.p_partkey ORDER BY v.valid_from DESC, v.txn_at DESC) AS rn
         | FROM rd JOIN v ON v.valid_from <= DATE '1995-06-01'
         |  AND v.txn_at <= rd.t)
         |SELECT read_label, CAST(COUNT(*) AS BIGINT) AS n_parts,
         | CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents,
         | CAST(SUM(CASE WHEN txn_at > DATE '1993-01-01' THEN 1 ELSE 0
         |  END) AS BIGINT) AS n_restated
         |FROM pick WHERE rn = 1 GROUP BY 1 ORDER BY 1"""
        .stripMargin.replace("\n", " ")),
    "x534_image_histogram_census" ->
      ("""WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7
         |  AS h FROM documents WHERE doc_id % 4 = 2),
         |px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM p),
         |v AS (SELECT doc_id, w, h,
         |  ((doc_id * 31 + 7 * (i % w) + 13 * (i // w)) % 256) // 16
         |   AS bin FROM px),
         |hist AS (SELECT doc_id, w, h, bin, COUNT(*) AS c FROM v
         | GROUP BY 1, 2, 3, 4),
         |pk AS (SELECT doc_id, w, h, bin, c, ROW_NUMBER() OVER
         |  (PARTITION BY doc_id ORDER BY c DESC, bin) AS rn FROM hist)
         |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         | CAST(bin AS INT) AS peak_bin, CAST(c AS BIGINT) AS peak_count,
         | CAST(w * h AS BIGINT) * 1000000 // (CAST(c AS BIGINT) * 16)
         |  AS flatness_ppm
         |FROM pk WHERE rn = 1 ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")),
    "x535_admission_control_census" ->
      ("""WITH e AS (SELECT user_id, event_type, ts, event_id,
         |  CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 AS win FROM events
         | WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |  AND event_type IS NOT NULL),
         |r AS (SELECT event_type, user_id,
         |  CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, win
         |   ORDER BY ts, event_id) <= 3 THEN 1 ELSE 0 END AS adm
         | FROM e)
         |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
         | CAST(SUM(adm) AS BIGINT) AS n_admitted,
         | CAST(COUNT(DISTINCT CASE WHEN adm = 0 THEN user_id END)
         |  AS BIGINT) AS n_throttled_users,
         | CAST(COUNT(*) - SUM(adm) AS BIGINT) * 1000000 // COUNT(*)
         |  AS drop_ppm
         |FROM r GROUP BY 1 ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),
    "x536_l_diversity_audit" ->
      ("""WITH b AS (SELECT c_nationkey, c_mktsegment,
         |  (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   + 10000000) // 100000 AS bal_band
         | FROM customer WHERE c_acctbal IS NOT NULL),
         |cls AS (SELECT c_nationkey, c_mktsegment,
         |  CAST(COUNT(*) AS BIGINT) AS sz,
         |  CAST(COUNT(DISTINCT bal_band) AS BIGINT) AS ld
         | FROM b GROUP BY 1, 2),
         |lv AS (SELECT l FROM (VALUES (2), (3), (5)) t(l))
         |SELECT l, CAST(COUNT(*) AS BIGINT) AS n_classes,
         | CAST(SUM(CASE WHEN ld < l THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_classes_below_l,
         | CAST(SUM(CASE WHEN ld < l THEN sz ELSE 0 END) AS BIGINT)
         |  AS n_rows_at_risk,
         | CAST(MIN(ld) AS BIGINT) AS min_diversity
         |FROM cls CROSS JOIN lv GROUP BY l ORDER BY l"""
        .stripMargin.replace("\n", " ")),
    "x537_join_order_audit" ->
      ("""WITH c AS (SELECT c_custkey FROM customer
         |  WHERE c_mktsegment = 'BUILDING')
         |SELECT '0_fact_first' AS plan, CAST(1 AS BIGINT) AS step,
         |  'lineitem*orders' AS intermediate, CAST(COUNT(*) AS BIGINT)
         |   AS n_rows
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |UNION ALL SELECT '0_fact_first', 2, 'then*customer_seg',
         |  CAST(COUNT(*) AS BIGINT)
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN c ON o_custkey = c_custkey
         |UNION ALL SELECT '1_dim_first', 1, 'orders*customer_seg',
         |  CAST(COUNT(*) AS BIGINT)
         | FROM orders JOIN c ON o_custkey = c_custkey
         |UNION ALL SELECT '1_dim_first', 2, 'then*lineitem',
         |  CAST(COUNT(*) AS BIGINT)
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN c ON o_custkey = c_custkey
         |ORDER BY plan, step""".stripMargin.replace("\n", " ")),
    "x538_sorted_neighborhood_audit" ->
      ("""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws
         |  FROM documents WHERE doc_id % 2 = 0 AND text IS NOT NULL),
         |k AS (SELECT doc_id, substr(text, 1, 24) AS k FROM w),
         |r AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k, doc_id)
         |  AS r FROM k),
         |cand AS (SELECT LEAST(a.doc_id, b.doc_id) AS d1,
         |  GREATEST(a.doc_id, b.doc_id) AS d2
         | FROM r a JOIN r b ON b.r > a.r AND b.r - a.r <= 10),
         |ix AS (SELECT doc_id, ws, unnest(range(len(ws) - 2)) AS i
         | FROM w WHERE len(ws) >= 3),
         |sh AS (SELECT DISTINCT doc_id,
         |  ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s FROM ix),
         |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*)
         |  AS inter FROM sh a JOIN sh b ON a.s = b.s
         |  AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |truth AS (SELECT d1, d2 FROM pairs
         | JOIN sizes s1 ON s1.doc_id = d1 JOIN sizes s2 ON s2.doc_id = d2
         | WHERE CAST(inter AS DOUBLE)
         |  / CAST(s1.n + s2.n - inter AS DOUBLE) >= 0.7),
         |f AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM k) AS n_docs,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth
         |    JOIN cand USING (d1, d2)) AS found,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS total)
         |SELECT n_docs, n_docs * (n_docs - 1) // 2 AS n_possible_pairs,
         | n_cand AS n_candidate_pairs, found AS n_true_found,
         | total AS n_true_total,
         | CASE WHEN total > 0 THEN found * 1000000 // total END
         |  AS completeness_ppm,
         | CASE WHEN n_docs > 1 THEN (n_docs * (n_docs - 1) // 2 - n_cand)
         |  * 1000000 // (n_docs * (n_docs - 1) // 2) END AS reduction_ppm
         |FROM f""".stripMargin.replace("\n", " ")),
    "x539_mmr_rerank" -> mmrOracle,
    "x542_changepoint_localization" ->
      ("""WITH d AS (SELECT CAST(l_shipdate AS DATE) AS d,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS rev
         | FROM lineitem WHERE l_shipdate IS NOT NULL
         |  AND l_extendedprice IS NOT NULL GROUP BY 1),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(rev) AS BIGINT) AS s FROM d),
         |c AS (SELECT d, SUM(rev) OVER (ORDER BY d ROWS BETWEEN
         |   UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS idx FROM d),
         |o AS (SELECT c.d, c.idx, CAST(c.cum AS BIGINT) AS cum, t.n, t.s,
         |  CAST(CAST(CAST(c.cum AS BIGINT) // 10000 AS HUGEINT)
         |    * (CAST(c.cum AS BIGINT) // 10000) // c.idx AS BIGINT)
         |   + CAST(CAST((t.s - CAST(c.cum AS BIGINT)) // 10000 AS HUGEINT)
         |    * ((t.s - CAST(c.cum AS BIGINT)) // 10000)
         |    // (t.n - c.idx) AS BIGINT) AS obj
         | FROM c CROSS JOIN t WHERE c.idx < t.n)
         |SELECT d AS split_day, idx AS n_left,
         | CAST(n - idx AS BIGINT) AS n_right,
         | CAST(cum // idx AS BIGINT) AS mean_left_cents,
         | CAST((s - cum) // (n - idx) AS BIGINT) AS mean_right_cents,
         | CAST((s - cum) // (n - idx) - cum // idx AS BIGINT)
         |  AS shift_cents
         |FROM o ORDER BY obj DESC, d LIMIT 1"""
        .stripMargin.replace("\n", " ")),
    "x543_relationship_lifecycle" ->
      ("""WITH pq AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS s,
         |  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         | WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL
         |  AND o_orderdate IS NOT NULL),
         |fl AS (SELECT c, s, MIN(q) AS fq, MAX(q) AS lq FROM pq
         | GROUP BY 1, 2),
         |act AS (SELECT q AS quarter, CAST(COUNT(*) AS BIGINT)
         |  AS n_active FROM pq GROUP BY 1),
         |fr AS (SELECT fq AS quarter, CAST(COUNT(*) AS BIGINT) AS n_new
         | FROM fl GROUP BY 1),
         |en AS (SELECT lq AS quarter, CAST(COUNT(*) AS BIGINT)
         |  AS n_ending FROM fl GROUP BY 1),
         |re AS (SELECT a.q AS quarter, CAST(COUNT(*) AS BIGINT)
         |  AS n_retained
         | FROM pq a JOIN pq b ON a.c = b.c AND a.s = b.s
         |  AND b.q = a.q - INTERVAL 3 MONTH GROUP BY 1)
         |SELECT act.quarter, act.n_active,
         | COALESCE(fr.n_new, 0) AS n_new,
         | COALESCE(re.n_retained, 0) AS n_retained,
         | COALESCE(en.n_ending, 0) AS n_ending
         |FROM act LEFT JOIN fr ON fr.quarter = act.quarter
         | LEFT JOIN re ON re.quarter = act.quarter
         | LEFT JOIN en ON en.quarter = act.quarter
         |ORDER BY act.quarter""".stripMargin.replace("\n", " ")),
    "x548_layout_skipping_compare" ->
      ("""WITH o AS (SELECT o_orderkey AS k, o_custkey AS c,
         |  (year(CAST(o_orderdate AS DATE)) - 1992) * 12
         |   + month(CAST(o_orderdate AS DATE)) - 1 AS md
         | FROM orders WHERE o_orderdate IS NOT NULL
         |  AND o_custkey IS NOT NULL),
         |mx AS (SELECT MAX(c) AS mc, CAST(COUNT(*) AS BIGINT) AS n
         | FROM o),
         |bb AS (SELECT o.k, o.c, o.md, mx.mc, mx.n,
         |  c // (mc // 8 + 1) AS cb,
         |  LEAST(GREATEST(md - 36, 0) // 10, 7) AS db
         | FROM o CROSS JOIN mx),
         |z AS (SELECT *, (((cb & 1) << 1) | (db & 1))
         |  | ((((cb >> 1) & 1) << 3) | (((db >> 1) & 1) << 2))
         |  | ((((cb >> 2) & 1) << 5) | (((db >> 2) & 1) << 4)) AS zc
         | FROM bb),
         |r AS (SELECT '0_sort_by_month' AS layout, k, c, md, mc, n,
         |   ROW_NUMBER() OVER (ORDER BY md, k) AS rk FROM z
         | UNION ALL SELECT '1_zorder_cell', k, c, md, mc, n,
         |   ROW_NUMBER() OVER (ORDER BY zc, k) FROM z),
         |f AS (SELECT layout, (rk - 1) // ((n + 63) // 64) AS fl,
         |  CAST(COUNT(*) AS BIGINT) AS rws, MIN(md) AS dlo,
         |  MAX(md) AS dhi, MIN(c) AS clo, MAX(c) AS chi, MAX(mc) AS mc
         | FROM r GROUP BY 1, 2),
         |rd AS (SELECT layout, rws, (dlo <= 59 AND dhi >= 48
         |  AND clo <= mc // 4 AND chi >= mc // 8) AS rd FROM f)
         |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
         | CAST(SUM(CASE WHEN rd THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_files_read,
         | CAST(SUM(CASE WHEN rd THEN 1 ELSE 0 END) AS BIGINT) * 1000000
         |  // CAST(COUNT(*) AS BIGINT) AS files_read_ppm,
         | CAST(SUM(CASE WHEN rd THEN rws ELSE 0 END) AS BIGINT)
         |  AS rows_read,
         | CAST(SUM(CASE WHEN rd THEN rws ELSE 0 END) AS BIGINT)
         |  * 1000000 // CAST(SUM(rws) AS BIGINT) AS rows_read_ppm
         |FROM rd GROUP BY layout ORDER BY layout"""
        .stripMargin.replace("\n", " ")),
    "x546_t_closeness_audit" ->
      ("""WITH b AS (SELECT c_nationkey AS n, c_mktsegment AS m,
         |  (CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   + 10000000) // 100000 AS v
         | FROM customer WHERE c_acctbal IS NOT NULL),
         |cls AS (SELECT n, m, v, CAST(COUNT(*) AS BIGINT) AS c FROM b
         | GROUP BY 1, 2, 3),
         |ct AS (SELECT n, m, CAST(COUNT(*) AS BIGINT) AS nc FROM b
         | GROUP BY 1, 2),
         |gl AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS gc FROM b
         | GROUP BY 1),
         |gt AS (SELECT CAST(COUNT(*) AS BIGINT) AS ng FROM b),
         |sp AS (SELECT ct.n, ct.m, ct.nc, gl.v, gl.gc
         | FROM ct CROSS JOIN gl),
         |f AS (SELECT sp.n, sp.m, sp.v, sp.nc, sp.gc,
         |  COALESCE(cls.c, 0) AS c
         | FROM sp LEFT JOIN cls ON cls.n = sp.n AND cls.m = sp.m
         |  AND cls.v = sp.v),
         |cum AS (SELECT n, m, nc,
         |  SUM(c) OVER (PARTITION BY n, m ORDER BY v) AS cumc,
         |  SUM(gc) OVER (PARTITION BY n, m ORDER BY v) AS cumg
         | FROM f),
         |emd AS (SELECT n, m, CAST(SUM(ABS(CAST(cumc AS BIGINT)
         |   * 1000000 // nc - CAST(cumg AS BIGINT) * 1000000
         |   // (SELECT ng FROM gt))) AS BIGINT) AS e
         | FROM cum GROUP BY 1, 2, nc),
         |mx AS (SELECT CAST(MAX(e) AS BIGINT) AS max_emd_ppm_bands
         | FROM emd)
         |SELECT CASE WHEN e < 100000 THEN '0_lt_0.1'
         |  WHEN e < 300000 THEN '1_lt_0.3'
         |  WHEN e < 1000000 THEN '2_lt_1.0'
         |  ELSE '3_ge_1.0' END AS emd_band,
         | CAST(COUNT(*) AS BIGINT) AS n_classes, mx.max_emd_ppm_bands
         |FROM emd CROSS JOIN mx GROUP BY 1, 3 ORDER BY emd_band"""
        .stripMargin.replace("\n", " ")),
    "x547_delta_varint_advisor" ->
      ("""WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
         |g AS (SELECT COALESCE(k - LAG(k) OVER (ORDER BY k), k) AS g
         | FROM k),
         |vb AS (SELECT CASE WHEN g < 128 THEN 1
         |  WHEN g < 16384 THEN 2 WHEN g < 2097152 THEN 3
         |  WHEN g < 268435456 THEN 4 WHEN g < 34359738368 THEN 5
         |  WHEN g < 4398046511104 THEN 6
         |  WHEN g < 562949953421312 THEN 7
         |  WHEN g < 72057594037927936 THEN 8 ELSE 9 END AS b FROM g)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
         | CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes,
         | CAST(SUM(b) AS BIGINT) AS delta_varint_bytes,
         | CAST(COUNT(*) * 8 - SUM(b) AS BIGINT) * 1000000
         |  // CAST(COUNT(*) * 8 AS BIGINT) AS savings_ppm
         |FROM vb""".stripMargin.replace("\n", " ")),
    "x544_median_rollup_guard" ->
      ("""WITH v AS (SELECT c_nationkey AS g,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |   AS val
         | FROM orders JOIN customer ON o_custkey = c_custkey
         | WHERE o_totalprice IS NOT NULL AND c_nationkey IS NOT NULL),
         |gc AS (SELECT val, COUNT(*) AS c FROM v GROUP BY 1),
         |gn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
         |gmed AS (SELECT MIN(val) AS g FROM (SELECT val,
         |  SUM(c) OVER (ORDER BY val) AS cum FROM gc) CROSS JOIN gn
         | WHERE cum * 2 >= n),
         |nc AS (SELECT g, val, COUNT(*) AS c FROM v GROUP BY 1, 2),
         |nn AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM v
         | GROUP BY 1),
         |nmed AS (SELECT x.g, MIN(x.val) AS med FROM (SELECT g, val,
         |  SUM(c) OVER (PARTITION BY g ORDER BY val) AS cum FROM nc) x
         | JOIN nn ON nn.g = x.g WHERE x.cum * 2 >= nn.n GROUP BY x.g),
         |m1 AS (SELECT CAST(SUM(med) AS BIGINT)
         |  // CAST(COUNT(*) AS BIGINT) AS m1 FROM nmed),
         |mc AS (SELECT med, COUNT(*) AS c FROM nmed GROUP BY 1),
         |mn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nmed),
         |m2 AS (SELECT MIN(med) AS m2 FROM (SELECT med,
         |  SUM(c) OVER (ORDER BY med) AS cum FROM mc) CROSS JOIN mn
         | WHERE cum * 2 >= n)
         |SELECT CAST(g AS BIGINT) AS global_median_cents,
         | CAST(m1 AS BIGINT) AS mean_of_medians_cents,
         | CAST(m2 AS BIGINT) AS median_of_medians_cents,
         | CAST(m1 AS BIGINT) * 1000000 // CAST(g AS BIGINT) - 1000000
         |  AS mean_bias_ppm,
         | CAST(m2 AS BIGINT) * 1000000 // CAST(g AS BIGINT) - 1000000
         |  AS median_bias_ppm
         |FROM gmed CROSS JOIN m1 CROSS JOIN m2"""
        .stripMargin.replace("\n", " ")),
    "x545_seasonal_index" ->
      ("""WITH cells AS (SELECT year(CAST(l_shipdate AS DATE)) AS y,
         |  month(CAST(l_shipdate AS DATE)) AS month,
         |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |   AS BIGINT)) AS BIGINT) AS rev
         | FROM lineitem WHERE l_shipdate IS NOT NULL
         |  AND l_extendedprice IS NOT NULL GROUP BY 1, 2),
         |g AS (SELECT CAST(SUM(rev) AS BIGINT)
         |  // CAST(COUNT(*) AS BIGINT) AS gm FROM cells)
         |SELECT CAST(month AS INT) AS month,
         | CAST(COUNT(*) AS BIGINT) AS n_years,
         | CAST(SUM(rev) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
         |  AS month_mean_cents,
         | (CAST(SUM(rev) AS BIGINT) // CAST(COUNT(*) AS BIGINT))
         |  * 1000000 // g.gm AS index_ppm
         |FROM cells CROSS JOIN g GROUP BY month, g.gm ORDER BY month"""
        .stripMargin.replace("\n", " ")),
    "x540_vector_ingest_guard" ->
      ("""WITH e AS (SELECT vec_id,
         |  CASE WHEN vec_id % 97 = 0 THEN embedding[1:32]
         |   WHEN vec_id % 101 = 0 THEN list_transform(embedding,
         |    x -> CAST(0.0 AS FLOAT))
         |   ELSE embedding END AS embedding FROM embeddings),
         |s AS (SELECT len(embedding) AS d,
         |  list_aggregate(list_transform(embedding,
         |   x -> CAST(x AS DOUBLE) * x), 'sum') AS sq FROM e),
         |m AS (SELECT d AS dim FROM (SELECT d, COUNT(*) AS c FROM s
         |  GROUP BY d ORDER BY c DESC, d LIMIT 1))
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
         | CAST(MAX(m.dim) AS INT) AS expected_dim,
         | CAST(SUM(CASE WHEN s.d <> m.dim THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_wrong_dim,
         | CAST(SUM(CASE WHEN s.sq = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_zero_norm,
         | CAST(SUM(CASE WHEN s.d = m.dim AND s.sq > 0.0 THEN 1 ELSE 0
         |  END) AS BIGINT) AS n_clean
         |FROM s CROSS JOIN m""".stripMargin.replace("\n", " ")),
    "x541_stream_full_outer_join" ->
      ("""WITH p AS (SELECT event_id AS pur_id, user_id, ts AS pur_ts,
         |  value FROM events WHERE event_type = 'purchase'),
         |e AS (SELECT event_id AS err_id, user_id, ts AS err_ts
         |  FROM events WHERE event_type = 'error'),
         |wm AS (SELECT LEAST((SELECT MAX(pur_ts) FROM p),
         |  (SELECT MAX(err_ts) FROM e)) AS w),
         |m AS (SELECT p.pur_id, e.err_id, p.user_id, p.value
         | FROM p JOIN e ON p.user_id = e.user_id
         |  AND e.err_ts >= p.pur_ts
         |  AND e.err_ts <= p.pur_ts + INTERVAL 1 HOUR),
         |up AS (SELECT p.pur_id, CAST(NULL AS BIGINT) AS err_id,
         |  p.user_id, p.value
         | FROM p, wm
         | WHERE p.pur_id NOT IN (SELECT pur_id FROM m)
         |  AND p.pur_ts + INTERVAL 1 HOUR < wm.w),
         |ue AS (SELECT CAST(NULL AS BIGINT) AS pur_id, e.err_id,
         |  e.user_id, CAST(NULL AS DOUBLE) AS value
         | FROM e, wm
         | WHERE e.err_id NOT IN (SELECT err_id FROM m)
         |  AND e.err_ts < wm.w)
         |SELECT pur_id, err_id, user_id, value FROM m
         |UNION ALL SELECT pur_id, err_id, user_id, value FROM up
         |UNION ALL SELECT pur_id, err_id, user_id, value FROM ue
         |ORDER BY pur_id, err_id""".stripMargin.replace("\n", " ")),
    "x101_binaryfile_ingest" ->
      ("""WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
         |  FROM documents),
         |px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM p)
         |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         | CAST(SUM((doc_id * 31 + 7 * (i % w) + 13 * (i // w)) % 256) AS BIGINT)
         |   AS gray_sum
         |FROM px GROUP BY doc_id, w, h ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")),
    "x102_prefix_novelty" ->
      (s"""WITH $shingleCtes,
         |f AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s),
         |pd AS (SELECT sh.doc_id, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_novel
         | FROM sh JOIN f ON f.s = sh.s GROUP BY sh.doc_id)
         |SELECT d.doc_id, CAST(COALESCE(pd.n_shingles, 0) AS BIGINT) AS n_shingles,
         | CAST(COALESCE(pd.n_novel, 0) AS BIGINT) AS n_novel
         |FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin.replace("\n", " ")),
    "x103_bigram_association" ->
      ("""WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
         |ix AS (SELECT ws, unnest(range(len(ws) - 1)) AS i FROM w
         |  WHERE len(ws) >= 2),
         |b AS (SELECT ws[i+1] AS w1, ws[i+2] AS w2 FROM ix),
         |pc AS (SELECT w1, w2, COUNT(*) AS n_ab FROM b GROUP BY 1, 2),
         |lc AS (SELECT w1, COUNT(*) AS n_a FROM b GROUP BY 1),
         |rc AS (SELECT w2, COUNT(*) AS n_b FROM b GROUP BY 1),
         |t AS (SELECT COUNT(*) AS n2 FROM b)
         |SELECT pc.w1 || ' ' || pc.w2 AS bigram, CAST(n_ab AS BIGINT) AS n_ab,
         | CAST(CAST(n_ab AS HUGEINT) * n2 * 1000000
         |   // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS score
         |FROM pc JOIN lc ON lc.w1 = pc.w1 JOIN rc ON rc.w2 = pc.w2, t
         |WHERE n_ab >= 5
         |ORDER BY score DESC, bigram LIMIT 20""".stripMargin.replace("\n", " ")),
    "x104_hits_integer" -> hitsOracle(2),
    "x106_bounded_stream_dedup" ->
      ("""SELECT DISTINCT user_id, event_type, CAST(ts AS DATE) AS day
         |FROM events ORDER BY user_id, event_type, day"""
        .stripMargin.replace("\n", " ")),
    "x107_corrupt_quarantine" ->
      ("""SELECT CASE WHEN doc_id % 13 = 0 THEN '_corrupt' ELSE lang END AS lang,
         | COUNT(*) AS n_docs,
         | CAST(SUM(CASE WHEN doc_id % 13 = 0 THEN 0 ELSE n_chars END) AS BIGINT)
         |   AS total_chars
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")),
    "x108_sync_repair_diff" ->
      ("""WITH src AS (SELECT c_custkey AS k,
         |  CAST(c_acctbal AS DECIMAL(18,2)) AS b FROM customer),
         |dst AS (SELECT k, CASE WHEN k % 29 = 0 THEN b + 1 ELSE b END AS b
         |  FROM src WHERE k % 31 <> 0
         | UNION ALL SELECT -k, b FROM src WHERE k % 37 = 0),
         |d AS (SELECT COALESCE(s.k, t.k) AS k,
         |  CASE WHEN t.k IS NULL THEN 'only_src'
         |       WHEN s.k IS NULL THEN 'only_dst'
         |       WHEN s.b <> t.b THEN 'changed' END AS status
         | FROM src s FULL OUTER JOIN dst t ON s.k = t.k)
         |SELECT CAST(((k % 16) + 16) % 16 AS INT) AS bucket, k, status
         |FROM d WHERE status IS NOT NULL ORDER BY bucket, k, status"""
        .stripMargin.replace("\n", " ")),
    "x109_skew_safe_distinct" ->
      ("""WITH e AS (SELECT CASE WHEN event_id % 3 = 0 THEN 0 ELSE user_id END
         |  AS user_id, event_type FROM events)
         |SELECT user_id, COUNT(DISTINCT event_type) AS n_distinct
         |FROM e GROUP BY user_id ORDER BY user_id"""
        .stripMargin.replace("\n", " ")),
    "x110_incremental_join" ->
      ("""SELECT c_mktsegment, COUNT(*) AS n,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment"""
        .stripMargin.replace("\n", " ")),
    "x111_transform_with_state" ->
      ("""WITH c AS (SELECT user_id, COUNT(*) AS n FROM events
         |  WHERE event_type = 'purchase' GROUP BY user_id),
         |m AS (SELECT user_id, unnest(range(1, n // 5 + 1)) * 5 AS milestone
         |  FROM c WHERE n >= 5)
         |SELECT user_id, CAST(milestone AS BIGINT) AS milestone
         |FROM m ORDER BY user_id, milestone""".stripMargin.replace("\n", " ")),
    "x112_schema_drift_read" ->
      ("""SELECT lang, COUNT(*) AS n,
         | CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |   AS n_pre_drift,
         | CAST(COUNT(DISTINCT CASE WHEN doc_id % 2 <> 0 THEN source END)
         |   AS BIGINT) AS n_sources
         |FROM documents GROUP BY lang ORDER BY lang"""
        .stripMargin.replace("\n", " ")),
    "x113_dynamic_partition_overwrite" ->
      ("""SELECT CAST(year(o_orderdate) AS INT) AS o_year, COUNT(*) AS n,
         | CAST(SUM(CAST(CASE WHEN year(o_orderdate) = 1997
         |   THEN o_totalprice * 2 ELSE o_totalprice END AS DECIMAL(18,2)))
         |   AS DOUBLE) AS total
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")),
    "x105_waterfill_budget" ->
      ("""WITH tk AS (SELECT source,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok FROM documents),
         |s AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
         | FROM tk GROUP BY source),
         |bd AS (SELECT CAST(SUM(n_tokens) * 6 // 10 AS BIGINT) AS budget FROM s),
         |r AS (SELECT source, n_tokens,
         |  ROW_NUMBER() OVER wa AS i,
         |  CAST(SUM(n_tokens) OVER (ORDER BY n_tokens, source
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS prefix,
         |  COUNT(*) OVER () AS n_src,
         |  CAST(SUM(n_tokens) OVER () AS BIGINT) AS total,
         |  LAG(n_tokens, 1, 0) OVER wa AS prev
         | FROM s WINDOW wa AS (ORDER BY n_tokens, source)),
         |c AS (SELECT r.*, bd.budget,
         |  CAST((bd.budget - prefix + n_tokens) // (n_src - i + 1) AS BIGINT) AS cand
         | FROM r, bd),
         |cap AS (SELECT CAST(CASE WHEN MAX(total) <= MAX(budget) THEN MAX(n_tokens)
         |  ELSE MIN(CASE WHEN cand >= prev AND cand < n_tokens THEN cand END)
         |  END AS BIGINT) AS cap FROM c)
         |SELECT s.source, s.n_tokens,
         | CAST(LEAST(s.n_tokens, cap.cap) AS BIGINT) AS allocated, cap.cap
         |FROM s, cap ORDER BY source""".stripMargin.replace("\n", " ")),
    "x66_pagerank_integer" -> pageRankOracle(3),
    "x69_bigram_vocab_topk" ->
      ("""WITH w AS (SELECT string_split(text, ' ') AS ws FROM documents),
         |ix AS (SELECT ws, unnest(range(len(ws) - 1)) AS i FROM w WHERE len(ws) >= 2),
         |b AS (SELECT ws[i+1] || ' ' || ws[i+2] AS bigram FROM ix)
         |SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram
         |ORDER BY n DESC, bigram LIMIT 20""".stripMargin.replace("\n", " ")),
    "x83_hll_sketch_merge" ->
      ("""SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
         | COUNT(DISTINCT user_id) AS exact_users, TRUE AS approx_ok
         |FROM events""".stripMargin.replace("\n", " ")),
    "x84_filter_funnel" ->
      ("""WITH f AS (SELECT n_chars, lang, len(string_split(text, ' ')) AS nw,
         |  ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM documents),
         |g AS (SELECT (n_chars >= 100) AS r1,
         |  (lang IN ('en','de','fr','es')) AS r2,
         |  (n_chars * 10 <= nw * 56) AS r3, (rn = 1) AS r4 FROM f),
         |a AS (SELECT COUNT(*) AS t,
         |  CAST(SUM(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         |  CAST(SUM(CASE WHEN r1 AND r2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         |  CAST(SUM(CASE WHEN r1 AND r2 AND r3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         |  CAST(SUM(CASE WHEN r1 AND r2 AND r3 AND r4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
         | FROM g)
         |SELECT CAST(1 AS INT) AS stage, 'min_chars' AS rule, t AS n_in,
         |  t - s1 AS n_dropped, s1 AS n_out FROM a
         |UNION ALL SELECT 2, 'lang_allowed', s1, s1 - s2, s2 FROM a
         |UNION ALL SELECT 3, 'avg_word_len', s2, s2 - s3, s3 FROM a
         |UNION ALL SELECT 4, 'exact_dup', s3, s3 - s4, s4 FROM a
         |ORDER BY stage""".stripMargin.replace("\n", " ")),
    "x85_leakage_split" ->
      ("""WITH d AS (SELECT COALESCE(source, '') AS source, n_chars,
         |  CAST(('0x' || substr(md5(COALESCE(source, '')), 1, 15)) AS BIGINT) % 100 AS draw
         | FROM documents),
         |s AS (SELECT CASE WHEN draw < 60 THEN 'train'
         |  WHEN draw < 80 THEN 'val' ELSE 'test' END AS split, source, n_chars FROM d)
         |SELECT split, CAST(COUNT(DISTINCT source) AS BIGINT) AS n_groups,
         | COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_size
         |FROM s GROUP BY split ORDER BY split""".stripMargin.replace("\n", " ")),
    "x86_time_weighted_avg" ->
      ("""WITH o AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS v_cents,
         |  LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id) AS nxt
         | FROM events),
         |d AS (SELECT user_id, v_cents, nxt - t_us AS dur_us FROM o
         | WHERE nxt IS NOT NULL)
         |SELECT user_id, COUNT(*) AS n_intervals,
         | CAST(SUM(dur_us) AS BIGINT) AS active_us,
         | CAST(SUM(v_cents * dur_us) // SUM(dur_us) AS BIGINT) AS twa_cents
         |FROM d GROUP BY user_id HAVING SUM(dur_us) > 0
         |ORDER BY user_id""".stripMargin.replace("\n", " ")),
    "x95_bitmap_distinct_merge" ->
      ("""SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
         | COUNT(DISTINCT user_id) AS distinct_users
         |FROM events""".stripMargin.replace("\n", " ")),
    "x97_streaming_sliding_window" ->
      ("""WITH mx AS (SELECT MAX(ts) AS m FROM events),
         |e AS (SELECT ts, event_type, unnest([0, 1]) AS i FROM events),
         |w AS (SELECT CAST(date_trunc('day', ts) - i * INTERVAL 1 DAY AS DATE)
         |  AS win_start, event_type FROM e),
         |c AS (SELECT win_start, event_type, COUNT(*) AS n FROM w GROUP BY 1, 2)
         |SELECT win_start, event_type, n FROM c CROSS JOIN mx
         |WHERE CAST(win_start AS TIMESTAMP) + INTERVAL 2 DAY <= mx.m
         |ORDER BY win_start, event_type""".stripMargin.replace("\n", " ")),
    "x96_jl_projection_distortion" -> {
      val cosDSql = (a: String, b: String) =>
        s"""list_aggregate(list_transform(list_zip($a, $b), p -> p[1] * p[2]), 'sum')
           | / (sqrt(list_aggregate(list_transform($a, x -> x * x), 'sum'))
           |  * sqrt(list_aggregate(list_transform($b, x -> x * x), 'sum')))"""
          .stripMargin.replace("\n", " ")
      s"""WITH hs AS (SELECT list(CAST(('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15))
         |    AS BIGINT) ORDER BY i) AS hl
         |  FROM (SELECT unnest(range(64)) AS i)),
         |pr AS (SELECT vec_id, embedding,
         |  list_transform(range(16), j ->
         |    list_aggregate(list_transform(list_zip(embedding, hs.hl),
         |      p -> CAST(p[1] AS DOUBLE) *
         |        CAST(1 - 2 * ((p[2] >> j) & 1) AS DOUBLE)), 'sum')) AS proj
         | FROM embeddings CROSS JOIN hs),
         |q AS (SELECT embedding AS qe, proj AS qp FROM pr WHERE vec_id = 0),
         |sc AS (SELECT pr.vec_id,
         |  ROUND(${cos2Sql("pr.embedding", "q.qe")}, 6) AS cos_orig,
         |  ROUND(${cosDSql("pr.proj", "q.qp")}, 6) AS cos_proj
         | FROM pr CROSS JOIN q WHERE pr.vec_id <> 0)
         |SELECT vec_id, cos_orig, cos_proj,
         | ROUND(abs(cos_orig - cos_proj), 6) AS abs_err
         |FROM sc ORDER BY cos_orig DESC, vec_id LIMIT 20"""
        .stripMargin.replace("\n", " ")
    },
    "x93_fk_conformance" ->
      ("""WITH oc AS (SELECT CASE WHEN o_orderkey % 97 = 0 THEN -o_custkey
         |  ELSE o_custkey END AS k FROM orders),
         |lo AS (SELECT CASE WHEN l_orderkey % 101 = 0 THEN -l_orderkey
         |  ELSE l_orderkey END AS k FROM lineitem)
         |SELECT 'orders_customer' AS relation,
         | (SELECT COUNT(*) FROM oc) AS n_child,
         | (SELECT COUNT(*) FROM oc
         |   WHERE k NOT IN (SELECT c_custkey FROM customer)) AS n_orphans
         |UNION ALL SELECT 'lineitem_orders',
         | (SELECT COUNT(*) FROM lo),
         | (SELECT COUNT(*) FROM lo
         |   WHERE k NOT IN (SELECT o_orderkey FROM orders))
         |UNION ALL SELECT 'lineitem_part',
         | (SELECT COUNT(*) FROM lineitem),
         | (SELECT COUNT(*) FROM lineitem
         |   WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
         |ORDER BY relation""".stripMargin.replace("\n", " ")),
    "x94_column_profile_wide" ->
      ("""WITH e AS (SELECT event_id, ts, user_id, event_type,
         |  CASE WHEN event_id % 37 = 0 THEN NULL ELSE value END AS value,
         |  CASE WHEN event_id % 53 = 0 THEN NULL ELSE props END AS props
         | FROM events)
         |SELECT 'event_id' AS col_name, COUNT(*) - COUNT(event_id) AS n_nulls,
         |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct FROM e
         |UNION ALL SELECT 'ts', COUNT(*) - COUNT(ts), COUNT(DISTINCT ts) FROM e
         |UNION ALL SELECT 'user_id', COUNT(*) - COUNT(user_id),
         |  COUNT(DISTINCT user_id) FROM e
         |UNION ALL SELECT 'event_type', COUNT(*) - COUNT(event_type),
         |  COUNT(DISTINCT event_type) FROM e
         |UNION ALL SELECT 'value', COUNT(*) - COUNT(value),
         |  COUNT(DISTINCT value) FROM e
         |UNION ALL SELECT 'props', COUNT(*) - COUNT(props),
         |  COUNT(DISTINCT props) FROM e
         |ORDER BY col_name""".stripMargin.replace("\n", " ")),
    "x92_last_touch_attribution" ->
      (s"""WITH $nullUserCte,
         |o AS (SELECT user_id, ts, event_id, event_type, value,
         |  LAST_VALUE(CASE WHEN event_type IN ('click','view')
         |    THEN event_type END IGNORE NULLS)
         |   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS last_touch,
         |  LAST_VALUE(CASE WHEN event_type IN ('click','view')
         |    THEN epoch_us(CAST(ts AS TIMESTAMP)) END IGNORE NULLS)
         |   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS touch_us
         | FROM ne),
         |p AS (SELECT COALESCE(last_touch, 'none') AS touch,
         |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         |  epoch_us(CAST(ts AS TIMESTAMP)) - touch_us AS lag_us
         | FROM o WHERE event_type = 'purchase')
         |SELECT touch, COUNT(*) AS n_conversions,
         | CAST(SUM(cents) AS BIGINT) AS attributed_cents,
         | CASE WHEN COUNT(lag_us) = 0 THEN NULL
         |  ELSE CAST(SUM(lag_us) // (1000000 * COUNT(lag_us)) AS BIGINT) END
         |  AS avg_lag_secs
         |FROM p GROUP BY touch ORDER BY touch""".stripMargin.replace("\n", " ")),
    "x91_int8_quantized_topk" ->
      (s"""WITH base AS (SELECT vec_id, embedding,
         |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 127.0 /
         |    greatest(list_aggregate(list_transform(embedding,
         |      y -> abs(CAST(y AS DOUBLE))), 'max'),
         |    CAST(1e-30 AS DOUBLE))) AS INT)) AS qv
         | FROM embeddings),
         |q AS (SELECT qv AS qqv, embedding AS qe FROM base WHERE vec_id = 0),
         |sc AS (SELECT b.vec_id, b.embedding, q.qe,
         |  CAST(list_aggregate(list_transform(list_zip(b.qv, q.qqv),
         |    p -> CAST(p[1] AS BIGINT) * CAST(p[2] AS BIGINT)), 'sum') AS BIGINT) AS qdot,
         |  CAST(list_aggregate(list_transform(b.qv,
         |    x -> CAST(x AS BIGINT) * CAST(x AS BIGINT)), 'sum') AS BIGINT) AS na,
         |  CAST(list_aggregate(list_transform(q.qqv,
         |    x -> CAST(x AS BIGINT) * CAST(x AS BIGINT)), 'sum') AS BIGINT) AS nb
         | FROM base b CROSS JOIN q WHERE b.vec_id <> 0),
         |s2 AS (SELECT vec_id, qdot,
         |  ROUND(CAST(qdot AS DOUBLE) / sqrt(CAST(na * nb AS DOUBLE)), 6) AS qscore,
         |  embedding, qe FROM sc),
         |topq AS (SELECT vec_id, qdot, qscore,
         |  ROW_NUMBER() OVER (ORDER BY qscore DESC, vec_id) AS rnk FROM s2),
         |tope AS (SELECT vec_id FROM
         |  (SELECT vec_id, ROUND(${cos2Sql("embedding", "qe")}, 6) AS sim
         |   FROM s2 ORDER BY sim DESC, vec_id LIMIT 10))
         |SELECT CAST(rnk AS INT) AS rnk, vec_id, qdot, qscore,
         | CAST(CASE WHEN vec_id IN (SELECT vec_id FROM tope)
         |   THEN 1 ELSE 0 END AS INT) AS in_exact
         |FROM topq WHERE rnk <= 10 ORDER BY rnk""".stripMargin.replace("\n", " ")),
    "x88_containment_pairs" ->
      (s"""WITH $shingleCtes,
         |df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
         |shj AS (SELECT sh.doc_id, sh.s FROM sh JOIN df
         |  ON df.s = sh.s AND df.df <= 1000),
         |pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
         |  FROM shj a JOIN shj b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |c AS (SELECT d1, d2,
         |  CAST(inter AS DOUBLE) / CAST(LEAST(s1.n, s2.n) AS DOUBLE)
         |    AS containment
         | FROM pairs JOIN sizes s1 ON s1.doc_id = d1
         |  JOIN sizes s2 ON s2.doc_id = d2)
         |SELECT d1, d2, containment FROM c WHERE containment >= 0.6
         |ORDER BY d1, d2""".stripMargin.replace("\n", " ")),
    "x89_index_delta_merge" ->
      ("""WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS term
         |  FROM documents),
         |r AS (SELECT term, doc_id,
         |  ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
         |  COUNT(*) OVER (PARTITION BY term) AS df FROM tok)
         |SELECT term, MAX(df) AS df,
         |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
         |FROM r WHERE rn <= 20 GROUP BY term ORDER BY term"""
        .stripMargin.replace("\n", " ")),
    "x90_context_assembly" ->
      (s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id < 8),
         |sc AS (SELECT q.qid, e.vec_id,
         |  ROUND(${cos2Sql("e.embedding", "q.qe")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id,
         |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
         |  FROM sc),
         |k AS (SELECT qid, vec_id, rn FROM r WHERE rn <= 5),
         |p AS (SELECT k.qid, CAST(k.rn AS INT) AS rn, k.vec_id,
         |  CAST((d.n_chars + 3) // 4 AS BIGINT) AS tok
         | FROM k JOIN documents d ON d.doc_id = k.vec_id),
         |c AS (SELECT *, CAST(SUM(tok) OVER (PARTITION BY qid ORDER BY rn)
         |  AS BIGINT) AS cum_tok FROM p)
         |SELECT qid, rn, vec_id, tok, cum_tok FROM c WHERE cum_tok <= 250
         |ORDER BY qid, rn""".stripMargin.replace("\n", " ")),
    "x87_robust_outliers" ->
      ("""WITH m AS (SELECT quantile_cont(n_chars, 0.5) AS med FROM documents),
         |s AS (SELECT quantile_cont(abs(n_chars - med), 0.5) AS mad, MIN(med) AS med
         | FROM documents CROSS JOIN m),
         |f AS (SELECT d.source, d.n_chars,
         |  abs(d.n_chars - s.med) > 3 * s.mad AS is_out
         | FROM documents d CROSS JOIN s)
         |SELECT source, COUNT(*) AS n_docs,
         | CAST(SUM(CASE WHEN is_out THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         | MIN(CASE WHEN NOT is_out THEN n_chars END) AS kept_min,
         | MAX(CASE WHEN NOT is_out THEN n_chars END) AS kept_max
         |FROM f GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")),
    "x82_frame_sampling" ->
      ("""WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
         |  1 + doc_id % 6 AS nf FROM documents),
         |f AS (SELECT doc_id, w, h, unnest(range(nf)) AS fi FROM p),
         |k AS (SELECT * FROM f WHERE fi % 2 = 0),
         |px AS (SELECT doc_id, fi, w, h, unnest(range(w * h)) AS i FROM k)
         |SELECT doc_id, CAST(fi AS INT) AS frame_idx, CAST(w AS INT) AS width,
         | CAST(h AS INT) AS height,
         | CAST(SUM((doc_id * 31 + fi * 17 + 7 * (i % w) + 13 * (i // w)) % 256)
         |   AS BIGINT) AS gray_sum
         |FROM px GROUP BY 1, 2, 3, 4 ORDER BY doc_id, frame_idx"""
        .stripMargin.replace("\n", " ")),
    "x81_sessionized_conversion" ->
      ("""WITH o AS (SELECT user_id, ts, event_type,
         |  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events),
         |s AS (SELECT *, CASE WHEN prev_ts IS NULL
         |  OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_sess
         | FROM o),
         |sid AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts)
         |  AS session_id FROM s),
         |sess AS (SELECT user_id, session_id, COUNT(*) AS n_events,
         |  CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS span_secs,
         |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
         | FROM sid GROUP BY user_id, session_id)
         |SELECT COUNT(*) AS n_sessions, CAST(SUM(conv) AS BIGINT) AS n_converted,
         | CAST(SUM(n_events) AS BIGINT) AS total_events, MAX(n_events) AS max_events,
         | MAX(span_secs) AS max_span_secs FROM sess"""
        .stripMargin.replace("\n", " ")),
    "x80_uniform_rebalance" ->
      ("""WITH c AS (SELECT source, COUNT(*) AS n_group FROM documents GROUP BY source),
         |m AS (SELECT MIN(n_group) AS n_min FROM c),
         |d AS (SELECT doc.source, c.n_group, m.n_min,
         |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS draw
         | FROM documents doc JOIN c ON doc.source = c.source CROSS JOIN m)
         |SELECT source, COUNT(*) AS n_before,
         | CAST(SUM(CASE WHEN draw % n_group < n_min THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM d GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")),
    "x79_replica_sync_check" -> {
      def cksum(rel: String, n: String, s: String) =
        s"""c$rel AS (SELECT CAST(c_custkey % 16 AS INT) AS bucket, COUNT(*) AS $n,
           | SUM(CAST(('0x' || substr(md5(c_custkey || '|' ||
           |   CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
           |   c_mktsegment), 1, 15)) AS BIGINT)) AS $s
           | FROM $rel GROUP BY 1)""".stripMargin
      s"""WITH src AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
         |dst AS (SELECT c_custkey, c_acctbal +
         |  CASE WHEN c_custkey % 397 = 0 THEN 1.0 ELSE 0.0 END AS c_acctbal,
         |  c_mktsegment FROM customer),
         |${cksum("src", "n_src", "sum_src")},
         |${cksum("dst", "n_dst", "sum_dst")}
         |SELECT csrc.bucket, n_src, n_dst,
         | (n_src = n_dst AND sum_src = sum_dst) AS in_sync
         |FROM csrc JOIN cdst ON csrc.bucket = cdst.bucket
         |ORDER BY csrc.bucket""".stripMargin.replace("\n", " ")
    },
    "x78_bucketed_join" ->
      ("""SELECT c_mktsegment, COUNT(*) AS n_orders,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment"""
        .stripMargin.replace("\n", " ")),
    "x76_key_skew_report" ->
      ("""WITH c AS (SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_keys FROM c)
         |SELECT l_suppkey, n,
         | CAST((n * t.n_keys * 1000) // t.total AS BIGINT) AS skew_scaled
         |FROM c CROSS JOIN t ORDER BY n DESC, l_suppkey LIMIT 10"""
        .stripMargin.replace("\n", " ")),
    "x77_splice_overlap" ->
      ("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |ht AS (SELECT doc_id, array_to_string(ws[1:3], ' ') AS head,
         |  array_to_string(ws[-3:], ' ') AS tail FROM w WHERE len(ws) >= 3)
         |SELECT a.doc_id AS d1, b.doc_id AS d2 FROM ht a
         |JOIN ht b ON a.tail = b.head AND a.doc_id <> b.doc_id
         |ORDER BY d1, d2""".stripMargin.replace("\n", " ")),
    "x75_streaming_trending" ->
      ("""WITH mx AS (SELECT MAX(ts) AS m FROM events),
         |c AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS win_start, event_type,
         |  COUNT(*) AS n FROM events GROUP BY 1, 2),
         |f AS (SELECT c.* FROM c CROSS JOIN mx
         |  WHERE CAST(win_start AS TIMESTAMP) + INTERVAL 1 DAY <= mx.m),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY win_start
         |  ORDER BY n DESC, event_type) AS rnk FROM f)
         |SELECT win_start, event_type, n, CAST(rnk AS INT) AS rnk FROM r
         |WHERE rnk <= 3 ORDER BY win_start, rnk""".stripMargin.replace("\n", " ")),
    "x72_trending_topk" ->
      ("""WITH c AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS win_start, event_type,
         |  COUNT(*) AS n FROM events GROUP BY 1, 2),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY win_start
         |  ORDER BY n DESC, event_type) AS rnk FROM c)
         |SELECT win_start, event_type, n, CAST(rnk AS INT) AS rnk FROM r
         |WHERE rnk <= 3 ORDER BY win_start, rnk""".stripMargin.replace("\n", " ")),
    "x73_cooccurrence_lift" ->
      ("""WITH ut AS (SELECT DISTINCT user_id AS u, event_type AS t FROM events),
         |nu AS (SELECT COUNT(DISTINCT u) AS n_users FROM ut),
         |tc AS (SELECT t, COUNT(*) AS n_t FROM ut GROUP BY t),
         |p AS (SELECT a.t AS t1, b.t AS t2, COUNT(*) AS n_both
         |  FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t GROUP BY 1, 2)
         |SELECT t1, t2, n_both,
         | (n_both * nu.n_users * 1000) // (c1.n_t * c2.n_t) AS lift_scaled
         |FROM p JOIN tc c1 ON p.t1 = c1.t JOIN tc c2 ON p.t2 = c2.t
         |CROSS JOIN nu ORDER BY t1, t2""".stripMargin.replace("\n", " ")),
    "x74_rfm_segments" ->
      ("""WITH a AS (SELECT MAX(CAST(ts AS DATE)) AS anchor_day FROM events),
         |per AS (SELECT user_id, MAX(CAST(ts AS DATE)) AS last_day,
         |  COUNT(*) AS freq,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
         | FROM events GROUP BY user_id),
         |b AS (SELECT
         |  CASE WHEN date_diff('day', last_day, anchor_day) <= 0 THEN 'r_hot'
         |   WHEN date_diff('day', last_day, anchor_day) <= 1 THEN 'r_warm'
         |   ELSE 'r_cold' END AS r_band,
         |  CASE WHEN freq >= 70 THEN 'f_high' WHEN freq >= 60 THEN 'f_mid'
         |   ELSE 'f_low' END AS f_band,
         |  CASE WHEN monetary >= 4000 THEN 'm_high' WHEN monetary >= 2500 THEN 'm_mid'
         |   ELSE 'm_low' END AS m_band
         | FROM per CROSS JOIN a)
         |SELECT r_band, f_band, m_band, COUNT(*) AS n_users FROM b
         |GROUP BY 1, 2, 3 ORDER BY r_band, f_band, m_band"""
        .stripMargin.replace("\n", " ")),
    "x70_certified_approx_pctl" ->
      ("""SELECT l_returnflag,
         | quantile_cont(l_quantity, 0.5) AS exact_p50,
         | quantile_cont(l_quantity, 0.9) AS exact_p90,
         | TRUE AS approx_ok
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
        .stripMargin.replace("\n", " ")),
    "x71_weighted_sample" ->
      ("""WITH d AS (SELECT source,
         |  CASE WHEN n_chars >= 400 THEN 8 WHEN n_chars >= 200 THEN 5 ELSE 2 END AS w,
         |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS draw
         | FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         | CAST(SUM(CASE WHEN draw % 10 < w THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM d GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")),
    "x67_editdist_neardup" ->
      (s"""WITH ${jaccardCtes(0.7)},
         |p AS (SELECT doc_id, substr(text, 1, 80) AS pfx FROM documents)
         |SELECT j.d1, j.d2, CAST(levenshtein(a.pfx, b.pfx) AS INT) AS dist
         |FROM jpairs j JOIN p a ON j.d1 = a.doc_id JOIN p b ON j.d2 = b.doc_id
         |WHERE levenshtein(a.pfx, b.pfx) <= 20
         |ORDER BY d1, d2""".stripMargin.replace("\n", " ")),
    "x68_gap_fill_forward" ->
      (s"""WITH $nullUserCte,
         |pd AS (SELECT user_id, CAST(ts AS DATE) AS day, value,
         |  ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
         |   ORDER BY ts DESC, event_id DESC) AS rn FROM ne),
         |dv AS (SELECT user_id, day, value AS day_value FROM pd WHERE rn = 1),
         |rng AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0,
         |  MAX(CAST(ts AS DATE)) AS d1 FROM ne GROUP BY user_id),
         |spine AS (SELECT user_id,
         |  CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
         | FROM rng),
         |f AS (SELECT s.user_id, s.day, d.day_value FROM spine s
         |  LEFT JOIN dv d ON s.user_id = d.user_id AND s.day = d.day)
         |SELECT user_id, day, day_value,
         | LAST_VALUE(day_value IGNORE NULLS) OVER (PARTITION BY user_id
         |  ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |  AS filled_value
         |FROM f ORDER BY user_id, day""".stripMargin.replace("\n", " ")),
    "x64_funnel_conversion" ->
      (s"""WITH $nullUserCte,
         |w1 AS (SELECT user_id, ts, event_type,
         |  MIN(CASE WHEN event_type = 'signup' THEN ts END)
         |   OVER (PARTITION BY user_id ORDER BY ts) AS sig_t FROM ne),
         |w2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND sig_t < ts THEN ts END)
         |   OVER (PARTITION BY user_id ORDER BY ts) AS mid_t FROM w1),
         |u AS (SELECT user_id,
         |  MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1,
         |  MIN(CASE WHEN event_type = 'click' AND sig_t < ts THEN ts END) AS t2,
         |  MIN(CASE WHEN event_type = 'purchase' AND mid_t < ts THEN ts END) AS t3
         | FROM w2 GROUP BY user_id)
         |SELECT COUNT(t1) AS n_stage1, COUNT(t2) AS n_stage2, COUNT(t3) AS n_stage3
         |FROM u""".stripMargin.replace("\n", " ")),
    "x65_cohort_retention" ->
      ("""WITH fw AS (SELECT user_id,
         |  CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
         | FROM events GROUP BY user_id),
         |act AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
         | FROM events)
         |SELECT f.cohort_week,
         | CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS INT) AS week_offset,
         | COUNT(*) AS n_users
         |FROM act a JOIN fw f ON a.user_id = f.user_id
         |GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""
        .stripMargin.replace("\n", " ")),
    "x01_dedup_exact" ->
      "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id",
    "x02_dedup_minhash_lsh" -> jaccardOracle(0.7),
    "x114_prefix_filter_join" -> jaccardOracle(0.7),
    "x03_dedup_simhash" ->
      ("""WITH w AS (SELECT DISTINCT doc_id, word FROM
         |  (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) t),
         |h AS (SELECT doc_id, CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS h FROM w),
         |bits AS (SELECT doc_id, i.i AS i,
         |  CASE WHEN SUM(CASE WHEN (h >> i.i) & 1 = 1 THEN 1 ELSE -1 END) > 0
         |   THEN 1 ELSE 0 END AS bit
         | FROM h CROSS JOIN (SELECT unnest(range(60)) AS i) i GROUP BY doc_id, i.i),
         |fp AS (SELECT doc_id, CAST(SUM(CAST(bit AS BIGINT) << i) AS BIGINT) AS fp
         | FROM bits GROUP BY doc_id),
         |bands AS (SELECT doc_id, fp, q.q AS q, (fp >> (q.q * 15)) & 32767 AS slice
         | FROM fp CROSS JOIN (SELECT unnest(range(4)) AS q) q),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.fp AS fp1, b.fp AS fp2
         | FROM bands a JOIN bands b ON a.q = b.q AND a.slice = b.slice AND a.doc_id < b.doc_id)
         |SELECT d1, d2, CAST(bit_count(xor(fp1, fp2)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(fp1, fp2)) <= 3
         |ORDER BY d1, d2""".stripMargin.replace("\n", " ")),
    "x04_ngram_jaccard_exact" -> jaccardOracle(0.5, maxDf = Some(1000)),
    "x05_cosine_topk_brute" ->
      (s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, ROUND($cosSql, 6) AS sim FROM embeddings, q
         |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin.replace("\n", " ")),
    "x06_ann_bucket_topk" ->
      (s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, ROUND($cosSql, 6) AS sim FROM embeddings, q
         |WHERE ${signBucketSql("embedding")} = ${signBucketSql("qe")}
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin.replace("\n", " ")),
    "x07_corpus_stats" ->
      ("""SELECT lang, COUNT(*) AS n_docs,
         | CAST(SUM(len(string_split(text,' '))) AS BIGINT) AS total_tokens,
         | CAST(SUM(n_chars) AS DOUBLE)/COUNT(*) AS avg_chars,
         | COUNT(DISTINCT source) AS n_sources
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin.replace("\n", " ")),
    "x08_lang_id_confusion" ->
      ("""SELECT lang,
         | CASE
         |  WHEN strpos(' '||text||' ',' der ')>0 OR strpos(' '||text||' ',' die ')>0 OR strpos(' '||text||' ',' das ')>0 OR strpos(' '||text||' ',' und ')>0 THEN 'de'
         |  WHEN strpos(' '||text||' ',' le ')>0 OR strpos(' '||text||' ',' la ')>0 OR strpos(' '||text||' ',' et ')>0 OR strpos(' '||text||' ',' les ')>0 THEN 'fr'
         |  WHEN strpos(' '||text||' ',' el ')>0 OR strpos(' '||text||' ',' los ')>0 OR strpos(' '||text||' ',' una ')>0 OR strpos(' '||text||' ',' es ')>0 THEN 'es'
         |  WHEN strpos(' '||text||' ',' de ')>0 OR strpos(' '||text||' ',' shi ')>0 OR strpos(' '||text||' ',' bu ')>0 THEN 'zh'
         |  ELSE 'en' END AS predicted,
         | COUNT(*) AS n
         |FROM documents GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin.replace("\n", " ")),
    "x09_quality_score" ->
      (s"""WITH $qualityCtes
         |SELECT doc_id, n_tok, score FROM qscore WHERE score >= 0.5
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x10_token_count_bpe" ->
      ("""SELECT source, CAST(SUM(len(list_filter(
         |  regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> ''))) AS BIGINT) AS total_tokens
         |FROM documents GROUP BY source ORDER BY source""".stripMargin.replace("\n", " ")),
    "x11_fingerprint_md5" ->
      "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id",
    "x12_multimodal_features" ->
      ("""WITH p AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
         |  FROM documents),
         |px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS i FROM p)
         |SELECT doc_id, 'png' AS format, CAST(w AS INT) AS width,
         | CAST(h AS INT) AS height,
         | CAST(SUM((doc_id * 31 + 7 * (i % w) + 13 * (i // w)) % 256) AS BIGINT)
         |   AS gray_sum
         |FROM px GROUP BY doc_id, w, h ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")),
    "x13_streaming_window_counts" ->
      ("""SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         | event_type, COUNT(*) AS n
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin.replace("\n", " ")),
    "x14_embedding_neardup" ->
      (s"""WITH $plantedEmbCte, ${hyperplaneCtes("aug")},
         |cand AS (SELECT DISTINCT a.vec_id AS v1, b.vec_id AS v2
         | FROM hpkeys a JOIN hpkeys b
         |  ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id)
         |SELECT v1, v2, ROUND(${cos2Sql("ea.embedding", "eb.embedding")}, 6) AS sim
         |FROM cand JOIN aug ea ON ea.vec_id = v1 JOIN aug eb ON eb.vec_id = v2
         |WHERE ROUND(${cos2Sql("ea.embedding", "eb.embedding")}, 6) >= 0.95
         |ORDER BY v1, v2""".stripMargin.replace("\n", " ")),
    "x22_ann_banded_topk" ->
      (s"""WITH ${hyperplaneCtes()},
         |cand AS (SELECT DISTINCT a.vec_id
         | FROM hpkeys a JOIN hpkeys q ON a.band = q.band AND a.bkey = q.bkey
         | WHERE q.vec_id = 0),
         |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, ROUND(${cos2Sql("e.embedding", "qe")}, 6) AS sim
         |FROM embeddings e JOIN cand ON cand.vec_id = e.vec_id, qv
         |ORDER BY sim DESC, e.vec_id LIMIT 10""".stripMargin.replace("\n", " ")),
    "x26_streaming_append_watermark" ->
      ("""WITH wm AS (SELECT MAX(ts) AS w FROM events),
         |agg AS (SELECT DATE_TRUNC('hour', ts) AS h, event_type, COUNT(*) AS n
         | FROM events GROUP BY 1, 2)
         |SELECT STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type, n
         |FROM agg, wm WHERE h + INTERVAL 1 HOUR <= w
         |ORDER BY hour, event_type""".stripMargin.replace("\n", " ")),
    "x27_streaming_closed_sessions" ->
      ("""WITH m AS (SELECT MAX(ts) AS mx FROM events),
         |t AS (SELECT user_id, ts,
         |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         |    OR DATE_DIFF('millisecond', LAG(ts) OVER (PARTITION BY user_id ORDER BY ts), ts) > 1800000
         |   THEN 1 ELSE 0 END AS new_s FROM events),
         |s AS (SELECT user_id, ts,
         |  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM t),
         |agg AS (SELECT user_id, sid, MIN(ts) AS st, MAX(ts) AS en, COUNT(*) AS n
         | FROM s GROUP BY 1, 2)
         |SELECT user_id, STRFTIME(st, '%Y-%m-%d %H:%M:%S') AS session_start,
         | STRFTIME(en, '%Y-%m-%d %H:%M:%S') AS session_end, CAST(n AS INT) AS n_events
         |FROM agg, m WHERE DATE_DIFF('millisecond', en, mx) > 1800000
         |ORDER BY user_id, session_start""".stripMargin.replace("\n", " ")),
    "x15_streaming_sessions" ->
      ("""WITH t AS (SELECT user_id, ts,
         |  LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events)
         |SELECT user_id,
         | CAST(SUM(CASE WHEN prev IS NULL
         |   OR DATE_DIFF('millisecond', prev, ts) > 1800000 THEN 1 ELSE 0 END) AS INT) AS n_sessions,
         | CAST(COUNT(*) AS INT) AS n_events
         |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin.replace("\n", " ")),
    "x16_asof_join" ->
      ("""SELECT l.event_id, l.user_id, r.event_id AS purchase_id, r.value AS purchase_value
         |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') l
         |ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') r
         | ON l.user_id = r.user_id AND l.ts >= r.ts
         |ORDER BY l.event_id""".stripMargin.replace("\n", " ")),
    "x17_salted_skew_join" ->
      ("""SELECT s_name, COUNT(*) AS n_lines,
         | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY s_name ORDER BY s_name""".stripMargin.replace("\n", " ")),
    "x18_dedup_clusters" -> clustersOracle,
    "x19_doc_chunking" ->
      ("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |st AS (SELECT doc_id, ws, unnest(range(0, len(ws), 30)) AS start FROM w)
         |SELECT doc_id, CAST(start // 30 AS INT) AS chunk_id,
         | CAST(len(ws[start+1:start+40]) AS INT) AS n_tokens,
         | md5(array_to_string(ws[start+1:start+40], ' ')) AS chunk_md5
         |FROM st ORDER BY doc_id, chunk_id""".stripMargin.replace("\n", " ")),
    "x23_repetition_stats" ->
      ("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
         |ix AS (SELECT doc_id, ws, unnest(range(len(ws)-2)) AS i FROM w WHERE len(ws) >= 3),
         |g AS (SELECT doc_id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s FROM ix)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         | CAST(COUNT(DISTINCT s) AS BIGINT) AS n_unique,
         | 1.0 - CAST(COUNT(DISTINCT s) AS DOUBLE)/CAST(COUNT(*) AS DOUBLE) AS dup_frac
         |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x24_dedup_retain_best" ->
      (s"""WITH $clusterCtes, $qualityCtes,
         |lab AS (SELECT q.doc_id, COALESCE(l.label, q.doc_id) AS cluster, q.score
         | FROM qscore q LEFT JOIN l3 l ON l.node = q.doc_id),
         |r AS (SELECT doc_id,
         |  ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY score DESC, doc_id) AS rn FROM lab)
         |SELECT doc_id FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x100_curated_corpus_summary" ->
      ("""WITH f AS (SELECT doc_id, source, n_chars, lang,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
         |  ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
         | FROM documents),
         |s AS (SELECT *, CAST(('0x' || substr(md5(source), 1, 15)) AS BIGINT) % 100
         |   AS draw
         | FROM f WHERE n_chars >= 100 AND lang IN ('en','de','fr','es')
         |  AND n_chars * 10 <= nw * 56 AND rn = 1),
         |sp AS (SELECT CASE WHEN draw < 60 THEN 'train'
         |  WHEN draw < 80 THEN 'val' ELSE 'test' END AS split, nw, n_chars FROM s)
         |SELECT split, COUNT(*) AS n_docs,
         | CAST(SUM(nw) AS BIGINT) AS total_tokens,
         | CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM sp GROUP BY split ORDER BY split""".stripMargin.replace("\n", " ")),
    "x99_zscore_by_group" ->
      ("""WITH st AS (SELECT source, COUNT(*) AS n,
         |  CAST(SUM(CAST(n_chars AS DECIMAL(19,0))) AS DOUBLE) AS s,
         |  CAST(SUM(CAST(n_chars AS DECIMAL(19,0)) * n_chars) AS DOUBLE) AS sq
         | FROM documents GROUP BY source),
         |m AS (SELECT source, s / n AS mean,
         |  CASE WHEN n > 1 THEN sqrt((sq - s * s / n) / (n - 1)) END AS std
         | FROM st)
         |SELECT d.doc_id, d.source, d.n_chars AS x,
         | ROUND((d.n_chars - m.mean) /
         |   (CASE WHEN m.std > 0 THEN m.std END), 6) AS z
         |FROM documents d JOIN m ON d.source = m.source
         |ORDER BY d.doc_id""".stripMargin.replace("\n", " ")),
    "x98_cluster_capped_retention" ->
      (s"""WITH $clusterCtes, $qualityCtes,
         |lab AS (SELECT q.doc_id, COALESCE(l.label, q.doc_id) AS cluster, q.score
         | FROM qscore q LEFT JOIN l3 l ON l.node = q.doc_id),
         |r AS (SELECT doc_id,
         |  ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY score DESC, doc_id) AS rn FROM lab)
         |SELECT doc_id FROM r WHERE rn <= 2 ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x25_top_terms_per_lang" ->
      ("""WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
         |c AS (SELECT lang, word, COUNT(*) AS n FROM w GROUP BY 1, 2),
         |r AS (SELECT lang, word, n,
         |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rank FROM c)
         |SELECT lang, word, CAST(n AS BIGINT) AS n, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= 5 ORDER BY lang, rank""".stripMargin.replace("\n", " ")),
    "x20_sample_shard" ->
      ("""SELECT CAST(doc_id % 8 AS INT) AS shard, COUNT(*) AS n_docs,
         | CAST(SUM(CASE WHEN doc_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
         |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin.replace("\n", " ")),
    "x28_streaming_dedup" ->
      ("SELECT DISTINCT user_id, event_type FROM events " +
        "ORDER BY user_id, event_type"),
    "x29_stream_static_join" ->
      ("""SELECT c_mktsegment, event_type, COUNT(*) AS n
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""".stripMargin.replace("\n", " ")),
    "x30_ivf_ann_topk" ->
      (s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
         |qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |asg AS (SELECT vec_id, embedding, cid FROM (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |   ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |     ORDER BY ${cos2Sql("e.embedding", "c.cemb")} DESC, c.cid) AS rn
         |  FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
         |probe AS (SELECT cid FROM cent, qv
         |  ORDER BY ${cos2Sql("cemb", "qe")} DESC, cid LIMIT 4)
         |SELECT a.vec_id, ROUND(${cos2Sql("a.embedding", "qe")}, 6) AS sim
         |FROM asg a JOIN probe USING (cid), qv
         |ORDER BY sim DESC, a.vec_id LIMIT 10""".stripMargin.replace("\n", " ")),
    "x31_pii_redaction" ->
      (s"""WITH d AS (SELECT doc_id,
         |  text || ' contact doc' || CAST(doc_id AS VARCHAR) || '@example.com or call 555-'
         |   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS dirty
         | FROM documents)
         |SELECT doc_id,
         | md5(regexp_replace(regexp_replace(dirty,
         |   '${graft.operators.TextAnalysis.EmailPattern}', '[EMAIL]', 'g'),
         |   '${graft.operators.TextAnalysis.PhonePattern}', '[PHONE]', 'g')) AS redacted_md5,
         | CAST(len(regexp_extract_all(dirty, '${graft.operators.TextAnalysis.EmailPattern}')) AS INT) AS n_emails,
         | CAST(len(regexp_extract_all(dirty, '${graft.operators.TextAnalysis.PhonePattern}')) AS INT) AS n_phones
         |FROM d ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x32_partition_pruned_read" ->
      ("""SELECT o_orderpriority, COUNT(*) AS n,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM orders WHERE CAST(YEAR(o_orderdate) AS INT) = 1997
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin.replace("\n", " ")),
    "x33_decontaminate_ngram" ->
      ("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |ix AS (SELECT doc_id, ws, unnest(range(len(ws)-3)) AS i FROM w WHERE len(ws) >= 4),
         |sh AS (SELECT DISTINCT doc_id,
         |  ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS s FROM ix),
         |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0)
         |SELECT doc_id, COUNT(*) AS n_shared
         |FROM tr JOIN ev USING (s) GROUP BY doc_id ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")),
    "x34_stream_stream_join" ->
      ("""SELECT e.event_id AS err_id, p.event_id AS pur_id, e.user_id, p.value
         |FROM events e JOIN events p ON e.user_id = p.user_id
         | AND e.event_type = 'error' AND p.event_type = 'purchase'
         | AND e.ts >= p.ts AND e.ts <= p.ts + INTERVAL 1 HOUR
         |ORDER BY err_id, pur_id""".stripMargin.replace("\n", " ")),
    "x35_tfidf_top_terms" ->
      ("""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
         |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |s AS (SELECT doc_id, tf.word AS word,
         |  ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf,
         |  ROW_NUMBER() OVER (PARTITION BY doc_id
         |    ORDER BY ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) DESC, tf.word) AS rank
         | FROM tf JOIN df ON tf.word = df.word, n)
         |SELECT doc_id, word, tfidf, CAST(rank AS INT) AS rank
         |FROM s WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin.replace("\n", " ")),
    "x36_pack_token_shards" ->
      ("""WITH t AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok FROM documents),
         |c AS (SELECT doc_id, source, n_tok,
         |  SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
         | FROM t)
         |SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
         | CAST((cum - n_tok) // 2048 AS INT) AS shard
         |FROM c ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x37_stratified_sample" ->
      ("""WITH r AS (SELECT doc_id, lang,
         |  ROW_NUMBER() OVER (PARTITION BY lang
         |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk,
         |  COUNT(*) OVER (PARTITION BY lang) AS n_stratum
         | FROM documents)
         |SELECT doc_id, lang FROM r
         |WHERE (rnk - 1) * 10 < n_stratum * 1 ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")),
    "x38_scd2_history" ->
      ("""WITH p AS (SELECT user_id, ts, event_id, value FROM events
         |  WHERE event_type = 'purchase'),
         |v AS (SELECT user_id, ts, event_id, value,
         |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
         |  LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
         | FROM p)
         |SELECT user_id, CAST(version AS INT) AS version,
         | STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
         | COALESCE(STRFTIME(next_ts, '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00') AS valid_to,
         | CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS is_current,
         | value
         |FROM v ORDER BY user_id, version""".stripMargin.replace("\n", " ")),
    "x39_bloom_semi_join" ->
      ("""SELECT o_orderpriority, COUNT(*) AS n,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM orders
         |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
         |GROUP BY o_orderpriority ORDER BY o_orderpriority"""
        .stripMargin.replace("\n", " ")),
    "x40_incremental_agg" ->
      ("""SELECT event_type, COUNT(*) AS n_events,
         | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),
    "x41_daily_first_event" ->
      ("""WITH r AS (SELECT event_id, user_id, event_type,
         |  STRFTIME(ts, '%Y-%m-%d') AS day,
         |  ROW_NUMBER() OVER (PARTITION BY user_id, event_type, DATE_TRUNC('day', ts)
         |    ORDER BY ts, event_id) AS rn
         | FROM events)
         |SELECT event_id, user_id, event_type, day FROM r
         |WHERE rn = 1 ORDER BY event_id""".stripMargin.replace("\n", " ")),
    "x42_zorder_pruned_read" ->
      ("""WITH m AS (SELECT MAX(o_custkey) AS mc FROM orders)
         |SELECT o_orderpriority, COUNT(*) AS n,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM orders, m
         |WHERE o_custkey BETWEEN mc // 4 AND (3 * mc) // 5
         | AND CAST(YEAR(o_orderdate) AS INT) BETWEEN 1993 AND 1995
         |GROUP BY o_orderpriority ORDER BY o_orderpriority"""
        .stripMargin.replace("\n", " ")),
    "x43_mixture_weights" ->
      ("""WITH t AS (SELECT source,
         |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
         | FROM documents GROUP BY source)
         |SELECT source, tokens,
         | ROUND(sqrt(CAST(tokens AS DOUBLE))
         |   / SUM(sqrt(CAST(tokens AS DOUBLE))) OVER (), 6) AS weight
         |FROM t ORDER BY source""".stripMargin.replace("\n", " ")),
    "x44_length_band_trim" ->
      ("""WITH t AS (SELECT doc_id, lang,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         | FROM documents),
         |r AS (SELECT doc_id, lang, n_tok,
         |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tok, doc_id) AS rn,
         |  COUNT(*) OVER (PARTITION BY lang) AS n
         | FROM t)
         |SELECT doc_id, lang, n_tok FROM r
         |WHERE rn * 10 > n AND rn * 10 <= n * 9 ORDER BY doc_id"""
        .stripMargin.replace("\n", " ")),
    "x45_foreachbatch_sink" ->
      ("""SELECT event_type, COUNT(*) AS n,
         | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),
    "x47_compact_small_files" ->
      ("""SELECT event_type, COUNT(*) AS n,
         | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
         | MAX(event_id) AS max_id
         |FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " ")),
    "x48_cdc_merge_apply" ->
      (s"""WITH $cdcMergeCtes
         |SELECT c_custkey, c_acctbal, c_mktsegment FROM news ORDER BY c_custkey"""
        .stripMargin.replace("\n", " ")),
    "x63_equidepth_histogram" ->
      ("""WITH r AS (SELECT o_totalprice,
         |  ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rk,
         |  COUNT(*) OVER () AS total FROM orders)
         |SELECT CAST(((rk - 1) * 16) // total AS INT) AS bucket,
         | COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
         |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin.replace("\n", " ")),
    "x62_corpus_shuffle_rank" ->
      ("""SELECT doc_id, md5(text) AS fp,
         | ROW_NUMBER() OVER (ORDER BY md5(text), doc_id) AS global_rank
         |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x61_batch_ann_topk" ->
      (s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id < 8),
         |sc AS (SELECT q.qid, e.vec_id,
         |  ROUND(${cos2Sql("e.embedding", "q.qe")}, 6) AS sim
         |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.qid),
         |r AS (SELECT qid, vec_id, sim,
         |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
         |  FROM sc)
         |SELECT qid, vec_id, sim, CAST(rn AS INT) AS rn FROM r WHERE rn <= 3
         |ORDER BY qid, rn""".stripMargin.replace("\n", " ")),
    "x60_streaming_cdc_snapshot" ->
      ("""WITH r AS (SELECT user_id, event_type, value,
         |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         | FROM events)
         |SELECT user_id, value FROM r WHERE rn = 1 AND event_type <> 'error'
         |ORDER BY user_id""".stripMargin.replace("\n", " ")),
    "x59_snapshot_diff" ->
      (s"""WITH $cdcMergeCtes,
         |old AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
         |j AS (SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
         |  o.c_custkey IS NOT NULL AS in_old, n.c_custkey IS NOT NULL AS in_new,
         |  o.c_acctbal AS oa, o.c_mktsegment AS om,
         |  n.c_acctbal AS c_acctbal, n.c_mktsegment AS c_mktsegment
         | FROM old o FULL OUTER JOIN news n ON o.c_custkey = n.c_custkey)
         |SELECT c_custkey,
         | CASE WHEN NOT in_old THEN 'I' WHEN NOT in_new THEN 'D' ELSE 'U' END AS op,
         | c_acctbal, c_mktsegment
         |FROM j
         |WHERE (NOT in_old) OR (NOT in_new)
         |  OR (c_acctbal IS DISTINCT FROM oa) OR (c_mktsegment IS DISTINCT FROM om)
         |ORDER BY c_custkey""".stripMargin.replace("\n", " ")),
    "x58_label_centroid_confusion" ->
      (s"""WITH dims AS (SELECT e.label, dd.d, e.embedding[dd.d+1] AS v
         |  FROM embeddings e CROSS JOIN (SELECT unnest(range(64)) AS d) dd),
         |cent0 AS (SELECT label, d, CAST(SUM(CAST(v AS DECIMAL(28,9))) AS FLOAT) AS s
         |  FROM dims GROUP BY label, d),
         |cent AS (SELECT label AS clabel, list(s ORDER BY d) AS cvec
         |  FROM cent0 GROUP BY label),
         |sc AS (SELECT e.vec_id, e.label, c.clabel,
         |  ${cos2Sql("e.embedding", "c.cvec")} AS score
         |  FROM embeddings e CROSS JOIN cent c),
         |r AS (SELECT vec_id, label, clabel,
         |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, clabel) AS rn
         |  FROM sc)
         |SELECT label, clabel AS pred_label, COUNT(*) AS n FROM r WHERE rn = 1
         |GROUP BY label, clabel ORDER BY label, pred_label"""
        .stripMargin.replace("\n", " ")),
    "x57_rarity_score" ->
      ("""WITH words AS (SELECT doc_id, unnest(string_split(text,' ')) AS word
         |  FROM documents),
         |freq AS (SELECT word, COUNT(*) AS cnt FROM words GROUP BY word),
         |tot AS (SELECT COUNT(*) AS total FROM words)
         |SELECT doc_id, COUNT(*) AS n_words,
         | CAST(SUM(total // cnt) // COUNT(*) AS BIGINT) AS rarity
         |FROM words JOIN freq USING (word) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x56_session_window_native" ->
      ("""WITH d AS (SELECT user_id, ts,
         |  CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         |    OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
         |  THEN 1 ELSE 0 END AS new_s FROM events),
         |s AS (SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
         |  ROWS UNBOUNDED PRECEDING) AS sid FROM d)
         |SELECT user_id,
         | STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         | STRFTIME(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
         | COUNT(*) AS n_events
         |FROM s GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin.replace("\n", " ")),
    "x55_global_rank" ->
      ("""SELECT doc_id, n_chars,
         | ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS global_rank
         |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x54_line_dedup" ->
      ("""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
         |s AS (SELECT doc_id, unnest(range(0, len(ws), 10)) AS st, ws FROM w),
         |ch AS (SELECT doc_id, array_to_string(ws[st+1:st+10], ' ') AS chunk,
         |  len(ws[st+1:st+10]) AS n_tokens FROM s),
         |df AS (SELECT chunk, COUNT(DISTINCT doc_id) AS d FROM ch GROUP BY chunk)
         |SELECT doc_id, COUNT(*) AS n_chunks,
         | CAST(SUM(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         | CAST(SUM(CASE WHEN d = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM ch JOIN df USING (chunk)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x53_connected_components" ->
      (s"""WITH RECURSIVE ${jaccardCtes(0.7)},
         |edges AS (SELECT d1 AS a, d2 AS b FROM jpairs
         |  UNION ALL SELECT d2, d1 FROM jpairs),
         |reach(node, label) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b)
         |SELECT node AS doc_id, MIN(label) AS cluster FROM reach
         |GROUP BY node ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x52_inverted_index" ->
      ("""WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS term
         |  FROM documents),
         |r AS (SELECT term, doc_id,
         |  ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn,
         |  COUNT(*) OVER (PARTITION BY term) AS df FROM tok)
         |SELECT term, MAX(df) AS df,
         |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
         |FROM r WHERE rn <= 20 GROUP BY term ORDER BY term"""
        .stripMargin.replace("\n", " ")),
    "x51_pack_context_windows" ->
      ("""WITH t AS (SELECT source, doc_id,
         |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok FROM documents),
         |c AS (SELECT source, doc_id, n_tok,
         |  CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT)
         |    AS cum_after FROM t),
         |e AS (SELECT source, n_tok, cum_after - n_tok AS cum_before, cum_after
         |  FROM c WHERE n_tok > 0),
         |x AS (SELECT source, cum_before, cum_after,
         |  unnest(range(cum_before // 128, (cum_after - 1) // 128 + 1)) AS win FROM e)
         |SELECT source, win, COUNT(*) AS n_docs,
         | CAST(SUM(LEAST(cum_after, (win+1)*128) - GREATEST(cum_before, win*128)) AS BIGINT) AS n_tokens
         |FROM x GROUP BY source, win ORDER BY source, win"""
        .stripMargin.replace("\n", " ")),
    "x50_incremental_dedup" ->
      (s"""WITH $shingleCtes,
         |cand AS (SELECT a.doc_id AS d, b.doc_id AS c, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s
         |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0 GROUP BY 1, 2),
         |dups AS (SELECT d, COUNT(*) AS n FROM cand
         |  JOIN sizes s1 ON s1.doc_id = d JOIN sizes s2 ON s2.doc_id = c
         |  WHERE CAST(inter AS DOUBLE)/CAST(s1.n + s2.n - inter AS DOUBLE) >= 0.7
         |  GROUP BY d)
         |SELECT doc_id, COALESCE(n, 0) AS n_corpus_dups
         |FROM documents LEFT JOIN dups ON dups.d = documents.doc_id
         |WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x49_domain_quality_cap" ->
      (s"""WITH $qualityCtes,
         |ranked AS (SELECT doc_id, source, score,
         |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rn
         | FROM qscore)
         |SELECT doc_id, source, score FROM ranked WHERE rn <= 8
         |ORDER BY doc_id""".stripMargin.replace("\n", " ")),
    "x46_aqe_skew_join" ->
      ("""WITH ev AS (SELECT CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id END AS k, value
         |  FROM events),
         |cust AS (SELECT k, MIN(c_mktsegment) AS c_mktsegment FROM
         |  (SELECT CASE WHEN c_custkey % 10 < 7 THEN 0 ELSE c_custkey END AS k, c_mktsegment
         |   FROM customer) t GROUP BY k)
         |SELECT c_mktsegment, COUNT(*) AS n,
         | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM ev JOIN cust USING (k)
         |GROUP BY c_mktsegment ORDER BY c_mktsegment"""
        .stripMargin.replace("\n", " ")),
    "x21_range_join_bucketized" ->
      ("""WITH periods AS (SELECT CAST(p AS INT) AS p,
         |  TIMESTAMP '1995-01-01' + INTERVAL (13 * p) MONTH AS pstart,
         |  TIMESTAMP '1995-01-01' + INTERVAL (13 * p + 2) MONTH AS pend
         | FROM range(6) t(p))
         |SELECT p, COUNT(*) AS n_orders,
         | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         |FROM periods JOIN orders ON o_orderdate >= pstart AND o_orderdate <= pend
         |GROUP BY p ORDER BY p""".stripMargin.replace("\n", " ")))
}
