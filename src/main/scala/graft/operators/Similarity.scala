package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Vector similarity search over an embedding column (`array<float>`) —
 * LLM-pipeline extension (SURVEY.md §7.4). Arithmetic is done in double via
 * higher-order functions (`zip_with` + `aggregate`, codegen'd, left-to-right
 * fold) so results are deterministic and bit-identical to a sequential
 * double-precision oracle.
 *
 * Scale: brute-force top-k is linear per query and plans as
 * `TakeOrderedAndProject` (per-partition heap + driver merge of k rows — no
 * global sort, no shuffle of the data). The bucketed variant prunes the
 * scanned fraction by a deterministic sign-code coarse quantizer (toy IVF):
 * at 100 TB the bucket column becomes the partition key so a query touches
 * one partition instead of all.
 */
object Similarity {

  /** Σ aᵢ·bᵢ in double, sequential fold order (composable reference form;
    * the hot path uses the fused native expression below). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass codegen'd cosine ([[graft.functions.CosineSimilarity]]);
    * bit-identical to `dot(a,b)/(norm(a)*norm(b))` by construction. */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSimilarity(a, b)

  /**
   * Exact brute-force top-k by cosine against one query vector (a one-row
   * DataFrame with column `qe`). The broadcast nested-loop join ships the
   * single query row to every partition; `orderBy(...).limit(k)` plans as a
   * per-partition top-k merge.
   */
  def bruteForceTopK(embeddings: DataFrame, query: DataFrame, k: Int): DataFrame =
    embeddings.crossJoin(broadcast(query))
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 6).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(k)

  /**
   * MMR (maximal marginal relevance) diversity re-ranking — the standard
   * second stage of retrieval (Carbonell & Goldstein '98, public
   * technique): from the exact top-`poolK` by query cosine, greedily pick
   * `selectK` items maximizing λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), so
   * the final context is relevant AND non-redundant — near-duplicate
   * passages burn the budget a RAG prompt can't spare.
   *
   * Determinism across engines: relevance and pairwise cosines are
   * rounded to 6 dp and scaled to INTEGER micro-units, and λ = 0.7 is
   * applied as (7·rel − 3·maxsim); every argmax compares integers with a
   * vec_id tie-break, so the selection order is bit-exact in any engine.
   *
   * Scale shape: the candidate pool is a constant-k frame (TakeOrdered
   * feeds it), the 19·20 pairwise-cosine frame and the `selectK`
   * selection rounds are all bounded by poolK² — corpus size only enters
   * through the first-stage top-k scan. Selection round 1 scores
   * 7·rel − 3·0 (empty selected set), so one formula covers every round.
   */
  def mmrRerank(embeddings: DataFrame, query: DataFrame,
      poolK: Int = 20, selectK: Int = 5): DataFrame = {
    require(selectK >= 1 && selectK <= poolK, "need 1 <= selectK <= poolK")
    val cands = bruteForceTopK(embeddings, query, poolK)
      .join(embeddings, "vec_id")
      .select(col("vec_id"), col("embedding"),
        expr("CAST(ROUND(sim * 1000000, 0) AS BIGINT)").as("rel"))
      .localCheckpoint() // constant-k frame; cuts the 2·selectK-round lineage
    val pairs = cands.as("a").join(cands.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
        // round-to-nearest BEFORE the cast: truncating 6dp·1e6 doubles
        // flips the last micro-unit on representation boundaries
        round(round(cosine(col("a.embedding"), col("b.embedding")), 6)
          * 1000000, 0).cast("long").as("sim_u"))
      .localCheckpoint()
    def pick(scored: DataFrame, rank: Int): DataFrame = scored
      .agg(max(struct(col("score"), (-col("vec_id")).as("nid"))).as("m"))
      .select(lit(rank).as("rank"), (-col("m.nid")).as("vec_id"),
        col("m.score").as("mmr_score_micro"))
    // r12 (guide §1.2/§3): each greedy round references the running
    // `selected` frame twice (max-sim lookup + anti join), so an
    // un-truncated chain DOUBLES per round — 2^selectK plan copies and
    // ~31 scheduled jobs for selectK=5. Each round's 1-row pick is
    // `localCheckpoint`'d (eager, one tiny job) so `selected` is a flat
    // union of materialized rows, and every per-round join BROADCASTS its
    // ≤poolK-row side explicitly — checkpointed frames lose size stats
    // (LogicalRDD defaults to "huge"), so without the hint the planner
    // shuffled both sides of every 20-row join.
    var selected = pick(cands.select(col("vec_id"),
      (col("rel") * 7).as("score")), 1).localCheckpoint()
    for (r <- 2 to selectK) {
      val sel = selected.select(col("vec_id"))
      val ms = pairs.join(broadcast(sel.withColumnRenamed("vec_id", "vb")), "vb")
        .groupBy("va").agg(max(col("sim_u")).as("maxsim"))
      val scored = cands.join(broadcast(sel), Seq("vec_id"), "left_anti")
        .join(broadcast(ms.withColumnRenamed("va", "vec_id")), Seq("vec_id"), "left")
        .select(col("vec_id"),
          (col("rel") * 7 - coalesce(col("maxsim"), lit(0L)) * 3).as("score"))
      selected = selected.unionAll(pick(scored, r).localCheckpoint())
    }
    selected.join(broadcast(cands.select(col("vec_id"), col("rel").as("sim_micro"))),
        "vec_id")
      .select(col("rank"), col("vec_id"), col("sim_micro"),
        col("mmr_score_micro"))
  }

  /** Deterministic coarse quantizer: sign bits of the first `bits` dims. */
  def signBucket(v: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1) > 0f, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /**
   * Bucketed ANN: scan only the query's sign bucket, then exact cosine top-k
   * within it. Recall < 1 by design (documented approximation); determinism
   * and the pruning structure are what the oracle checks.
   */
  def annTopK(embeddings: DataFrame, query: DataFrame, k: Int): DataFrame = {
    val bucketed = embeddings.withColumn("bucket", signBucket(col("embedding")))
    val q = query.withColumn("qbucket", signBucket(col("qe")))
    bucketed.join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 6).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(k)
  }

  /** Default banding for the hyperplane LSH paths: 16 bands × 12 bits.
    * At τ = 0.95 (p = 1 − arccos τ/π ≈ 0.899): recall = 1 − (1 − p¹²)¹⁶
    * ≈ 0.9945, while a random pair (p ≈ 0.5) collides in a band with
    * probability 2⁻¹² — candidate volume ≈ 16·n²/4096 ≈ 0.4% of pairs and
    * tunable by r, unlike the old fixed 256-bucket quantizer. */
  val DefaultBands = 16
  val DefaultRowsPerBand = 12

  /** Per-vector (band, key) rows from the banded hyperplane sketch
    * ([[graft.functions.HyperplaneBandKeys]], one fused codegen'd loop). */
  private def bandKeyRows(embeddings: DataFrame, masks: Seq[Long], rowsPerBand: Int): DataFrame = {
    // The band self-join is a BROADCAST probe, so it — and every stage
    // above it — inherits THIS frame's partitioning. A narrow input (the
    // test rig's one-split parquet) would otherwise run the whole
    // candidate pipeline on ONE core (r9 probe: x167's 8M-row band join
    // single-threaded at ~4 s). The n-row exchange is negligible next to
    // the n×bands explode it spreads, and is skipped when the input
    // already carries enough splits (any real at-scale scan does).
    val par = embeddings.sparkSession.sparkContext.defaultParallelism
    val spread = if (embeddings.rdd.getNumPartitions < par)
      embeddings.repartition(par) else embeddings
    spread.select(col("vec_id"),
      posexplode(graft.functions.HyperplaneBandKeys(col("embedding"), masks, rowsPerBand))
        .as(Seq("band", "bkey")))
  }

  /**
   * Embedding near-duplicate pairs via banded random-hyperplane LSH
   * (OR-construction, same band/verify shape as [[Dedup.minhashLsh]]):
   * sketch → explode to (band, key) → self-equi-join per band → distinct
   * candidate pairs → EXACT cosine verification ≥ τ on candidates only.
   *
   * Scale: every stage is linear in n — the only pairwise work happens
   * inside (band, key) buckets whose expected occupancy is n/2^r and is
   * tuned by `rowsPerBand`; recall at the target cosine is tuned
   * independently by `numBands`. The hyperplane masks are deterministic
   * 64-bit literals ([[graft.functions.Hyperplanes]]), so an external SQL
   * oracle reproduces the exact candidate set bit-for-bit.
   */
  def cosineNearDupPairs(embeddings: DataFrame, minCos: Double,
                         numBands: Int = DefaultBands,
                         rowsPerBand: Int = DefaultRowsPerBand): DataFrame = {
    val masks = graft.functions.Hyperplanes.masks(numBands * rowsPerBand)
    val keys = bandKeyRows(embeddings, masks.toSeq, rowsPerBand)
    val cand = keys.as("a")
      .join(keys.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
      .distinct()
    val e1 = embeddings.select(col("vec_id").as("v1"), col("embedding").as("emb1"))
    val e2 = embeddings.select(col("vec_id").as("v2"), col("embedding").as("emb2"))
    cand.join(e1, "v1").join(e2, "v2")
      .select(col("v1"), col("v2"),
        round(cosine(col("emb1"), col("emb2")), 6).as("sim"))
      .filter(col("sim") >= minCos)
  }

  /**
   * IVF (inverted-file) ANN: a coarse quantizer splits the corpus into
   * `nCells` cells; each vector joins its nearest centroid by cosine
   * (argmax; ties → lowest centroid id). A query probes the `nProbe` cells
   * whose centroids are most similar and runs exact cosine top-k on just
   * those cells — the classic IVF-Flat recall/cost dial.
   *
   * Centroids are the embeddings of deterministic seed rows (vec_id 1..n),
   * standing in for k-means training so the whole index is reproducible by
   * an external SQL oracle; Lloyd iterations would refine placement without
   * changing the query path. Scale: assignment is one map-side pass over a
   * broadcast of nCells rows (the standard N×K IVF assignment), the argmax
   * is a partial-aggregating `max(struct(...))` (no window shuffle), and at
   * rest `cell` becomes the storage partition key so a query reads
   * ~nProbe/nCells of the corpus instead of all of it.
   */
  def ivfTopK(embeddings: DataFrame, query: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = ivfCentroids(embeddings, nCells)
    val assigned = ivfAssign(embeddings, centroids)
    val probed = centroids.crossJoin(broadcast(query))
      .select(col("cid").as("cell"), cosine(col("cemb"), col("qe")).as("qsim"))
      .orderBy(desc("qsim"), col("cell"))
      .limit(nProbe)
      .select("cell")
    assigned.join(broadcast(probed), Seq("cell"), "left_semi")
      .crossJoin(broadcast(query))
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 6).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(k)
  }

  /** Deterministic IVF centroid seeds (vec_id 1..nCells — see [[ivfTopK]]). */
  private def ivfCentroids(embeddings: DataFrame, nCells: Int): DataFrame =
    embeddings
      .filter(col("vec_id") >= 1 && col("vec_id") <= nCells)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))

  /** Nearest-centroid cell per vector (argmax cosine; ties → lowest cid):
    * max over (sim, -cid) structs aggregates MAP-SIDE — no window shuffle;
    * first(embedding) is deterministic (constant per vec_id). */
  private def ivfAssign(embeddings: DataFrame, centroids: DataFrame): DataFrame =
    embeddings.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"),
        struct(cosine(col("embedding"), col("cemb")).as("csim"), (-col("cid")).as("ncid")).as("sc"))
      .groupBy("vec_id")
      .agg(first(col("embedding")).as("embedding"), max(col("sc")).as("best"))
      .select(col("vec_id"), col("embedding"), (-col("best.ncid")).as("cell"))

  /**
   * IVF INDEX BALANCE audit — the health check run after building (or
   * drifting) an IVF index: per-cell occupancy, its share of the corpus,
   * and the imbalance versus the ideal `n/nCells` in exact ppm. A cell at
   * +4e6 ppm holds 5× its share — queries probing it pay 5× the scan; a
   * near-empty cell wastes a probe. The same number that decides "retrain
   * the centroids" in every production vector store, computed from the
   * assignment [[ivfTopK]] already defines (so the audit measures the
   * index actually served).
   *
   * Scale shape: the assignment is the map-side broadcast argmax (no
   * window); the report is one |nCells|-row aggregate plus a 1-row total
   * broadcast. Empty cells still report (LEFT join from the centroid
   * spine) — an invisible empty cell is the failure mode.
   */
  def ivfCellBalance(embeddings: DataFrame, nCells: Int = 16): DataFrame = {
    val centroids = ivfCentroids(embeddings, nCells)
    val occ = ivfAssign(embeddings, centroids)
      .groupBy("cell").agg(count(lit(1)).as("n_vecs"))
    // occ is ≤ nCells rows but sits behind an aggregate whose size estimate
    // Spark inflates — hint the broadcast or the 16-row spine sort-merges
    val cells = centroids.select(col("cid").as("cell"))
      .join(broadcast(occ), Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n_vecs"), lit(0L)).as("n_vecs"))
    val tot = cells.agg(sum(col("n_vecs")).as("__n"))
    cells.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_vecs"),
        expr("CASE WHEN __n > 0 THEN n_vecs * 1000000 DIV __n END").as("share_ppm"),
        expr(s"CASE WHEN __n > 0 THEN CAST(CAST(n_vecs AS DECIMAL(38,0))" +
          s" * $nCells * 1000000 DIV __n - 1000000 AS BIGINT) END")
          .as("imbalance_ppm"))
  }

  /**
   * Banded-LSH ANN top-k: candidates = vectors sharing ≥ 1 (band, key) with
   * the query, exact cosine top-k among them. Unlike [[annTopK]]'s single
   * coarse bucket, the probed fraction shrinks as 2^−r while `numBands`
   * probes keep recall high — the per-query scan cost no longer degrades to
   * a fixed 1/256 of the corpus.
   */
  def annBandedTopK(embeddings: DataFrame, query: DataFrame, k: Int,
                    numBands: Int = DefaultBands,
                    rowsPerBand: Int = DefaultRowsPerBand): DataFrame = {
    val masks = graft.functions.Hyperplanes.masks(numBands * rowsPerBand)
    val keys = bandKeyRows(embeddings, masks.toSeq, rowsPerBand)
    val qKeys = query
      .select(col("qe"),
        posexplode(graft.functions.HyperplaneBandKeys(col("qe"), masks.toSeq, rowsPerBand))
          .as(Seq("band", "bkey")))
    val candIds = keys.join(broadcast(qKeys.select("band", "bkey")), Seq("band", "bkey"))
      .select("vec_id").distinct()
    embeddings.join(candIds, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(query))
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 6).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(k)
  }

  /**
   * Batch top-k retrieval: the k nearest neighbours for EVERY query in a
   * batch (`queries`: (qid, qe) rows) — the serving/eval shape, where
   * x05's single-query TakeOrdered would mean one pass per query. One
   * corpus pass scores all queries (broadcast cross join), then a window
   * partitioned BY QUERY ranks per query — per-query work distributes
   * across the cluster when the batch is large, which is exactly when
   * this operator replaces repeated single-query scans. Self-matches are
   * excluded so the output is the retrieval result, not the identity.
   */
  def batchTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be positive")
    val w = Window.partitionBy("qid").orderBy(desc("sim"), col("vec_id"))
    embeddings.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("embedding"), col("qe")), 6).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Deterministic sign source for the JL projection: the portable 60-bit
    * md5 hash of each dimension index (same construction as
    * [[PortableHash.hash60]], computed once at plan-build time — the
    * oracle recomputes the identical values in SQL); projection j uses
    * bit j of dimension i's hash as its ±1 sign. */
  private[operators] def jlHashes(dims: Int): Seq[Long] = (0 until dims).map { i =>
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /**
   * Johnson–Lindenstrauss random-projection sketch with CERTIFIED
   * distortion — x91's companion on the other compression axis: project
   * 64-dim float vectors to `projDims` dims with a deterministic ±1 sign
   * matrix (Achlioptas construction — integer signs, no gaussians), then
   * report, for the query's exact top-k, the original cosine, the
   * projected cosine, and their absolute gap. The distortion is an
   * oracle-checked VALUE per neighbour, so the 4×-fewer-dims pre-filter
   * trade is measured, not assumed.
   *
   * Engine-exact: signs are bits of the per-dimension portable md5 hash;
   * projections and cosines are ascending-index double folds (the same
   * fold the oracle's list_aggregate performs). Scale shape: projection
   * is map-side (the sign matrix is a plan literal, broadcast-free);
   * ranking is TakeOrdered top-k.
   */
  def jlProjectionDistortion(embeddings: DataFrame, projDims: Int = 16,
      k: Int = 20): DataFrame = {
    require(projDims >= 1 && projDims <= 60, "projDims must be in [1, 60]")
    val hArr = jlHashes(64).mkString("array(", "L, ", "L)")
    val projExpr = s"transform(sequence(0, ${projDims - 1}), j -> " +
      s"aggregate(zip_with(embedding, $hArr, (x, h) -> CAST(x AS DOUBLE) * " +
      "CAST(1 - 2 * (shiftright(h, j) % 2) AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (s, v) -> s + v))"
    def cosD(a: String, b: String): String =
      s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (s, v) -> s + v)" +
        s" / (sqrt(aggregate($a, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x))" +
        s" * sqrt(aggregate($b, CAST(0.0 AS DOUBLE), (s, x) -> s + x * x)))"
    val withProj = embeddings.withColumn("proj", expr(projExpr))
    val qrow = withProj.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("proj").as("qp"))
    withProj.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qrow))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("qe")), 6).as("cos_orig"),
        round(expr(cosD("proj", "qp")), 6).as("cos_proj"))
      .withColumn("abs_err", round(abs(col("cos_orig") - col("cos_proj")), 6))
      .orderBy(desc("cos_orig"), col("vec_id"))
      .limit(k)
  }

  /**
   * Int8-quantized retrieval with CERTIFIED recall — the serving-path
   * trade every vector store makes (4× smaller vectors, integer dot
   * products) made auditable: rank by the quantized score AND mark which
   * of the quantized top-k survive in the exact float top-k, so the
   * recall loss is a checked value in the result, not a hope.
   *
   * Symmetric per-vector int8 quantization (`round(x·127/max|x|)`, the
   * standard scheme); scores are EXACT integer dot products (engine- and
   * order-independent) normalized once in double — cosine is
   * scale-invariant, so per-vector scales cancel out of the ranking up to
   * quantization error, which is precisely what `in_exact` certifies.
   *
   * Scale shape: one corpus pass computes quantized and exact scores
   * side by side (cached — at production scale the quantized column is
   * the stored representation); both rankings are TakeOrdered top-k, the
   * final recall join is k×k rows.
   */
  def int8QuantizedTopK(embeddings: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be positive")
    val quant = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / " +
      "greatest(aggregate(embedding, CAST(0.0 AS DOUBLE), " +
      "(a, y) -> greatest(a, abs(CAST(y AS DOUBLE)))), CAST(1e-30 AS DOUBLE))) AS INT))"
    val qrow = embeddings.filter(col("vec_id") === 0)
      .select(expr(quant).as("qqv"), col("embedding").as("qe"))
    val scored = embeddings.filter(col("vec_id") =!= 0)
      .withColumn("qv", expr(quant))
      .crossJoin(broadcast(qrow))
      .select(col("vec_id"), col("embedding"), col("qe"),
        expr("aggregate(zip_with(qv, qqv, (a, b) -> CAST(a AS BIGINT) * CAST(b AS BIGINT)), " +
          "CAST(0 AS BIGINT), (s, x) -> s + x)").as("qdot"),
        expr("aggregate(qv, CAST(0 AS BIGINT), " +
          "(s, x) -> s + CAST(x AS BIGINT) * CAST(x AS BIGINT))").as("na"),
        expr("aggregate(qqv, CAST(0 AS BIGINT), " +
          "(s, x) -> s + CAST(x AS BIGINT) * CAST(x AS BIGINT))").as("nb"))
      .withColumn("qscore",
        round(col("qdot").cast("double") /
          sqrt((col("na") * col("nb")).cast("double")), 6))
      // cached: both the quantized and the exact top-k consume it. Caller-
      // managed lifecycle (ContextCleaner reclaims it once the returned
      // frame is materialized and dropped) — see coOccurrenceLift.
      .cache()
    val topQ = scored.orderBy(desc("qscore"), col("vec_id")).limit(k)
      .withColumn("rnk",
        row_number().over(BoundedGlobalWindow.orderBy(desc("qscore"), col("vec_id"))))
    val exactTop = scored
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 6).as("sim"))
      .orderBy(desc("sim"), col("vec_id")).limit(k)
      .select(col("vec_id"), lit(1).as("in_exact"))
    topQ.join(exactTop, Seq("vec_id"), "left")
      .select(col("rnk"), col("vec_id"), col("qdot"), col("qscore"),
        coalesce(col("in_exact"), lit(0)).as("in_exact"))
  }

  /**
   * Budgeted context assembly — the retrieval-to-prompt step of a RAG
   * pipeline: for each query, take its ranked neighbours ([[batchTopK]]),
   * price each doc at `ceil(n_chars / 4)` proxy tokens, and keep the
   * rank-ordered prefix that fits the token budget (greedy-by-rank, the
   * standard context packer). A doc that would overflow the budget drops
   * AND truncates the tail — rank order is the relevance order, so
   * skipping past an oversized doc would reorder relevance.
   *
   * Scale shape: the retrieval frame is |queries| × k rows — tiny — so the
   * doc-length join broadcasts it (AQE); the prefix cut is one window over
   * (qid, rank). Integer token math (`DIV`) keeps it engine-exact.
   */
  def assembleContext(retrieved: DataFrame, docs: DataFrame, idCol: String,
      sizeCol: String, budgetTokens: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetTokens >= 1, "budgetTokens must be positive")
    // LEFT join + raise_error: a retrieved id missing from `docs` (stale
    // retrieval index) must fail loudly — an inner join would silently
    // drop the rank and pack a DIFFERENT context than the true greedy cut
    val priced = retrieved
      .join(docs.select(col(idCol).as("vec_id"),
        expr(s"($sizeCol + 3) DIV 4").as("tok")), Seq("vec_id"), "left_outer")
      .withColumn("tok", coalesce(col("tok"),
        expr("raise_error('assembleContext: retrieved vec_id missing from docs')")
          .cast("long")))
    val w = Window.partitionBy("qid").orderBy("rn")
    priced
      .withColumn("cum_tok", sum(col("tok")).over(w))
      .filter(col("cum_tok") <= budgetTokens)
      .select(col("qid"), col("rn"), col("vec_id"), col("tok"), col("cum_tok"))
  }

  /**
   * Label-centroid assignment confusion — the embedding-space cluster-
   * quality report: each labeled vector is assigned to its nearest label
   * centroid by cosine, and the (true label, predicted label) counts come
   * back as a confusion matrix. The diagonal measures label cohesion in
   * embedding space; off-diagonal mass flags label noise — the check a
   * curated-dataset pipeline runs before training on the labels.
   *
   * Determinism across engines: centroids are per-dimension DECIMAL sums
   * (exact, order-independent — float/double addition in an unordered
   * aggregate is not reproducible) cast back to float; cosine then uses
   * the same ascending-index double fold as everywhere else
   * ([[cosine]] ↔ the oracle's list_transform chain), and the argmax
   * tie-breaks by centroid label. Cosine is scale-invariant, so the SUM
   * vector stands in for the mean — no division, one rounding.
   *
   * Scale shape: one (label, dim) exchange for the sums (map-side
   * partials), a ≤ |labels| × dims frame collapsed to |labels| centroid
   * rows, broadcast cross join (|labels| copies per vector), argmax via a
   * per-vector window, one final confusion aggregation.
   */
  def labelCentroidConfusion(embeddings: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val cent = embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy("label", "d")
      .agg(sum(col("v").cast(DecimalType(28, 9))).as("s"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("s")))),
        x => x.getField("s").cast("float")).as("cvec"))
      .select(col("label").as("clabel"), col("cvec"))
    val byVec = Window.partitionBy("vec_id")
      .orderBy(desc("score"), col("clabel"))
    embeddings.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"), col("clabel"),
        cosine(col("embedding"), col("cvec")).as("score"))
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") === 1)
      .groupBy(col("label"), col("clabel").as("pred_label"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * K-MEANS STEP AUDIT — one exact Lloyd iteration, oracle-checkable:
   * start from the deterministic [[signBucket]] coarse cells, reassign
   * every vector to its nearest cell MEAN, and report the sum-of-squared
   * error before and after. The improvement number is the "is clustering
   * structure even there?" probe run before any expensive IVF build.
   *
   * Exactness: vectors micro-scale to BIGINT (`ROUND(v·1e6)`); SSE uses
   * the ANOVA identity `Σm² − Σ_g S_g²/n_g` with per-(cell,dim) TRUNCATED
   * division (identical across engines, bias ≪ 1 micro²); distances
   * compare as `Σ_d (n·m − S)² DIV n²` — the n²-scaled exact integer form
   * of ||v − S/n||², truncated deterministically, ties to the lower cell
   * id. So the reassignment — and therefore both SSE numbers — is
   * bit-reproducible in DuckDB.
   *
   * Scale shape: moment collapses are (cells × dims)-bounded; the
   * distance stream is rows × cells (cells = 2^bits, a constant); one
   * vector-partitioned rank picks the argmin. Nothing quadratic.
   */
  def kmeansStepAudit(embeddings: DataFrame, bits: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("vec_id"), col("d"),
        expr("CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").as("__m"))
    val a0 = embeddings.select(col("vec_id"),
      signBucket(col("embedding"), bits).cast("long").as("cell"))
    def groupStats(assign: DataFrame) = base.join(assign, "vec_id")
      .groupBy("cell", "d")
      .agg(sum(col("__m").cast("decimal(38,0)")).as("__S"),
        count(lit(1)).as("__n"))
    def ssbOf(g: DataFrame) = g
      .agg(sum(expr("CAST(__S * __S DIV __n AS DECIMAL(38,0))")).as("__ssb"),
        countDistinct(col("cell")).as("__nc"))
    val g0 = groupStats(a0)
    val a1 = base.join(broadcast(g0), "d")
      .select(col("vec_id"), col("cell"), col("__n"),
        (col("__n") * col("__m").cast("decimal(38,0)") - col("__S")).as("__diff"))
      .groupBy("vec_id", "cell")
      .agg(max(col("__n")).as("__n"), sum(col("__diff") * col("__diff")).as("__a"))
      .select(col("vec_id"), col("cell"),
        expr("CAST(__a DIV (__n * __n) AS DECIMAL(38,0))").as("__d2"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("__d2"), col("cell"))))
      .filter(col("__rk") === 1)
      .select(col("vec_id"), col("cell"))
    val q = base.agg(
      sum(col("__m").cast("decimal(38,0)") * col("__m")).as("__Q"),
      countDistinct(col("vec_id")).as("n_vectors"))
    q.crossJoin(ssbOf(g0).select(col("__ssb").as("__ssb0"), col("__nc").as("n_cells_before")))
      .crossJoin(ssbOf(groupStats(a1))
        .select(col("__ssb").as("__ssb1"), col("__nc").as("n_cells_after")))
      .select(col("n_vectors"), col("n_cells_before"), col("n_cells_after"),
        expr("CAST((__Q - __ssb0) DIV 1000000 AS BIGINT)").as("sse_before_scaled"),
        expr("CAST((__Q - __ssb1) DIV 1000000 AS BIGINT)").as("sse_after_scaled"),
        expr("""CAST(CASE WHEN __ssb1 > __ssb0
              THEN (__ssb1 - __ssb0) * 1000000 DIV (__Q - __ssb0)
              ELSE 0 END AS BIGINT)""").as("improvement_ppm"))
  }

  /**
   * SPLIT-HALF CENTROID STABILITY — the embedding-space A/A test: vectors
   * split by id parity, per-label centroids computed independently on each
   * half, and the cosine between the two half-centroids reported per
   * label. A stable, well-populated label scores ≈ 1; a label whose
   * halves disagree is under-sampled or internally multi-modal — its
   * centroid (and every centroid-based audit: [[labelCentroidConfusion]],
   * [[labelMarginCensus]]) is not trustworthy. Same decimal-exact
   * centroid construction as x58, so the readout is engine-reproducible.
   *
   * Scale shape: one (label, half, dim)-keyed decimal collapse, a
   * label-keyed count, and a |labels|-bounded join — nothing pairwise.
   */
  def centroidStabilityAudit(embeddings: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val parts = embeddings.withColumn("__h", pmod(col("vec_id"), lit(2)))
    val cent = parts
      .select(col("label"), col("__h"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy("label", "__h", "d")
      .agg(sum(col("v").cast(DecimalType(28, 9))).as("s"))
      .groupBy("label", "__h")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("s")))),
        x => x.getField("s").cast("float")).as("cv"))
    val cnt = parts.groupBy("label", "__h").agg(count(lit(1)).as("n"))
    val a = cent.filter(col("__h") === 0).select(col("label"), col("cv").as("cva"))
      .join(cnt.filter(col("__h") === 0).select(col("label"), col("n").as("n_even")), "label")
    val b = cent.filter(col("__h") === 1).select(col("label"), col("cv").as("cvb"))
      .join(cnt.filter(col("__h") === 1).select(col("label"), col("n").as("n_odd")), "label")
    a.join(b, "label")
      .select(col("label"), col("n_even"), col("n_odd"),
        round(cosine(col("cva"), col("cvb")), 6).as("stability_cos"))
      .orderBy("label")
  }

  /**
   * DIMENSION ENERGY SPECTRUM — the PCA-free intrinsic-dimension audit:
   * per-dimension variance of the embedding space ranked by energy, plus
   * how many dimensions carry 50/90/99 % of the total (k50/k90/k99). A
   * 64-dim embedding with k90 = 7 is burning storage and ANN compute on
   * 57 dead axes — the one-row readout that decides whether a projection
   * ([[jlProjectionDistortion]]'s machinery) is worth running.
   *
   * Determinism: values are micro-scaled to BIGINT first (the shared
   * `ROUND(v·1e6)` convention), so variance is the EXACT integer
   * `n·Σm² − (Σm)²` in DECIMAL(38,0) — no float sum ever crosses a
   * shuffle. Scale shape: one dimension-keyed moment collapse (dims
   * rows), then rank/cumulate over the dims-bounded frame.
   */
  def dimensionEnergySpectrum(embeddings: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mom = embeddings
      .select(posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("d"),
        expr("CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT)").as("__m"))
      .groupBy("d")
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__m").cast("decimal(38,0)")).as("__s"),
        sum(col("__m").cast("decimal(38,0)") * col("__m")).as("__q"))
      .select(col("d"), (col("__n") * col("__q") - col("__s") * col("__s")).as("__vs"))
    // dims-bounded frame (|dims| rows): the unpartitioned window is fine
    val byEnergy = BoundedGlobalWindow.orderBy(col("__vs").desc, col("d"))
    val ranked = mom
      .withColumn("__rk", row_number().over(byEnergy).cast("long"))
      .withColumn("__cum", sum(col("__vs")).over(byEnergy))
    val tot = mom.agg(sum(col("__vs")).as("__tot"),
      count(lit(1)).as("n_dims"))
    ranked.crossJoin(broadcast(tot))
      .agg(max(col("n_dims")).as("n_dims"),
        max(when(col("__rk") === 1, col("d").cast("long"))).as("top_dim"),
        max(when(col("__rk") === 1,
          expr("CAST(__vs * 1000000 DIV __tot AS BIGINT)"))).as("top_share_ppm"),
        min(when(col("__cum") * 2 >= col("__tot"), col("__rk"))).as("k50"),
        min(when(col("__cum") * 10 >= col("__tot") * 9, col("__rk"))).as("k90"),
        min(when(col("__cum") * 100 >= col("__tot") * 99, col("__rk"))).as("k99"))
  }

  /**
   * LABEL-MARGIN census — the silhouette-lite follow-up to
   * [[labelCentroidConfusion]]: per vector, cosine to its OWN label
   * centroid minus the best cosine to any OTHER centroid, bucketed into
   * 0.1-wide margin bands per label. Negative bands are vectors sitting
   * closer to a foreign centroid (mislabeled or boundary mass); a label
   * whose mass hugs band 0 separates poorly — the confusion matrix says
   * WHO it's confused with, this says HOW CONFIDENTLY.
   *
   * Scale shape: centroids are one dimension-keyed decimal-exact collapse
   * (|labels|·dims rows), broadcast; per-vector scoring is map-side over
   * the |labels|-wide cross; the census is (labels × bands)-bounded.
   * Margins use only MAX over doubles (order-free), so the band census is
   * engine-exact — no float summation ever crosses a shuffle.
   */
  def labelMarginCensus(embeddings: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cent = embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy("label", "d")
      .agg(sum(col("v").cast(DecimalType(28, 9))).as("s"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("s")))),
        x => x.getField("s").cast("float")).as("cvec"))
      .select(col("label").as("clabel"), col("cvec"))
    embeddings.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"), col("clabel"),
        cosine(col("embedding"), col("cvec")).as("score"))
      .groupBy("vec_id", "label")
      .agg(max(when(col("label") === col("clabel"), col("score"))).as("__own"),
        max(when(col("label") =!= col("clabel"), col("score"))).as("__oth"))
      .select(col("label"),
        floor((col("__own") - col("__oth")) * 10).cast("long").as("margin_band"))
      .groupBy("label", "margin_band")
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("label", "margin_band")
  }

  /** Wide-recall banding for candidate generation that must capture the
    * exact top-k even at LOW cosine (the kNN-vote regime, where the kth
    * neighbor of a probe can sit near τ ≈ 0.3, p ≈ 0.6): 64 bands × 4
    * bits give per-neighbor miss probability (1 − p⁴)⁶⁴ ≈ 2e-4 at
    * p = 0.6 and ≪ 1e-9 for anything clustered — measured on all three
    * test corpora the candidate top-5 is EXACTLY the brute-force top-5
    * (zero misses; the flag-set spec pins it), while bucket occupancy
    * (2⁴ keys/band) bounds within-band pair work. Honest caveat: on the
    * structureless test vectors ~97% of pairs still collide somewhere —
    * no candidate generator cheaply separates cosine 0.29 from 0.31 —
    * so the win here is the SHAPE, not the constant: bucket-bounded
    * equi-join work that collapses to near-zero on real clustered
    * corpora, never an unconditional all-pairs stream. */
  val VoteBands = 64
  val VoteRowsPerBand = 4

  /**
   * kNN LABEL-NOISE audit: flag vectors whose `k` nearest neighbors (by
   * cosine) MAJORITY-disagree with their own label — the standard
   * neighbor-vote mislabel detector run before training on labeled
   * embeddings. Ordering ties break on neighbor id; the cosine fold is
   * index-ordered on both engines (the x05 determinism argument), so the
   * neighbor set — and therefore the flag set — is oracle-exact.
   *
   * Scale shape: candidate pairs come from the banded hyperplane LSH
   * ([[VoteBands]]×[[VoteRowsPerBand]], the x67 pattern — exact scoring
   * restricted to candidates): sketch → explode to (band, key) →
   * self-EQUI-join per band → distinct directed pairs → exact cosine on
   * candidates only. Pair work is bounded by bucket occupancy (tuned by
   * the band shape), NOT n² — no nested-loop join anywhere in the plan
   * (plan-asserted). The per-probe top-k is a window over the candidate
   * stream partitioned by probe id (WindowGroupLimit prunes below the
   * exchange); flagged rows only are emitted. [[labelNoiseAuditBrute]]
   * keeps the all-pairs reference for small-config cross-checks; the
   * spec asserts both paths produce the IDENTICAL flag set on the test
   * corpus.
   */
  def labelNoiseAudit(embeddings: DataFrame, k: Int = 5,
      numBands: Int = VoteBands, rowsPerBand: Int = VoteRowsPerBand): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k $k must be positive")
    val masks = graft.functions.Hyperplanes.masks(numBands * rowsPerBand)
    val keys = bandKeyRows(embeddings, masks.toSeq, rowsPerBand)
    // UNDIRECTED candidate pairs (v1 < v2): half the band-join and
    // distinct volume, and each pair's cosine is computed ONCE — the
    // directed stream both probes need is recovered by mirroring the
    // scored pair (cosine is symmetric)
    val cand = keys.as("a")
      .join(keys.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
      .distinct()
    val e1 = embeddings.select(col("vec_id").as("v1"), col("label").as("l1"),
      col("embedding").as("em1"))
    val e2 = embeddings.select(col("vec_id").as("v2"), col("label").as("l2"),
      col("embedding").as("em2"))
    val scored = cand.join(e1, Seq("v1")).join(e2, Seq("v2"))
      .select(col("v1"), col("l1"), col("v2"), col("l2"),
        cosine(col("em1"), col("em2")).as("sim"))
    // mirror each undirected scored pair into both probe directions with
    // ONE map-side explode — a self-union here would evaluate the whole
    // candidate+cosine lineage twice (the r9 probe measured that second
    // evaluation at ~3 s of the query's 8 s; exchange reuse does not
    // cover union branches)
    val directed = scored
      .select(explode(array(
        struct(col("v1").as("vec_id"), col("l1").as("label"),
          col("v2").as("vb"), col("l2").as("lb"), col("sim")),
        struct(col("v2").as("vec_id"), col("l2").as("label"),
          col("v1").as("vb"), col("l1").as("lb"), col("sim")))).as("__d"))
      .select(col("__d.vec_id"), col("__d.label"), col("__d.vb"),
        col("__d.lb"), col("__d.sim"))
    val byVec = Window.partitionBy("vec_id").orderBy(desc("sim"), col("vb"))
    directed
      .withColumn("__rk", row_number().over(byVec))
      .filter(col("__rk") <= k)
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(when(col("lb") === col("label"), 1L).otherwise(0L)).as("n_agree"),
        sum(when(col("lb") =!= col("label"), 1L).otherwise(0L)).as("n_disagree"))
      .filter(col("n_disagree") * 2 > k)
  }

  /**
   * All-pairs reference for [[labelNoiseAudit]] — the broadcast self-join
   * kNN vote, quadratic by construction. NOT the scale path: it exists as
   * the small-config cross-check that certifies the LSH-candidate feed
   * loses nothing (the spec asserts flag-set equality on the test
   * corpus), exactly as brute-force cosine top-k backstops the ANN
   * operators.
   */
  def labelNoiseAuditBrute(embeddings: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k $k must be positive")
    val b = embeddings.select(col("vec_id").as("vb"), col("label").as("lb"),
      col("embedding").as("eb"))
    val byVec = Window.partitionBy("vec_id").orderBy(desc("sim"), col("vb"))
    embeddings.join(broadcast(b), col("vec_id") =!= col("vb"))
      .select(col("vec_id"), col("label"), col("vb"), col("lb"),
        cosine(col("embedding"), col("eb")).as("sim"))
      .withColumn("__rk", row_number().over(byVec))
      .filter(col("__rk") <= k)
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(when(col("lb") === col("label"), 1L).otherwise(0L)).as("n_agree"),
        sum(when(col("lb") =!= col("label"), 1L).otherwise(0L)).as("n_disagree"))
      .filter(col("n_disagree") * 2 > k)
  }

  /**
   * RECIPROCAL-RANK FUSION of retrieval result lists — the standard
   * score-free ensemble for hybrid search (RRF, Cormack et al.): each
   * list contributes `1e9 DIV (rrfK + rank)` per item in EXACT integers
   * (the float 1/(k+r) scaled to fixed point — ranks are small, so the
   * scaled reciprocal is collision-free down to rank thousands), summed
   * across lists. Items missing from a list simply contribute nothing —
   * that asymmetry is the point of RRF: no score calibration between
   * systems is needed, only ranks.
   *
   * Each input list is re-ranked internally by (`scoreCol` DESC, id) so
   * fusion never trusts caller ordering (nondeterministic row order is
   * invisible until it flips a fused rank). Result lists are top-k
   * frames by contract — tiny — so the rank windows and the fusion
   * aggregate never see corpus-scale data; the heavy retrieval work
   * happened upstream (brute/banded/IVF operators).
   */
  /**
   * IVF CLUSTER-LABEL PURITY census — do the index's cells respect the
   * label structure? Per cell: occupancy, the majority label, and its
   * share in exact ppm, plus how many distinct labels landed there. High
   * purity means the coarse quantizer aligns with the labels (cell-level
   * routing or filtering is safe); purity near 1/|labels| means the
   * labels are invisible to the geometry and any label-filtered probe
   * must scan everything. Uses the SAME assignment [[ivfTopK]] serves.
   *
   * Scale shape: assignment is the map-side broadcast argmax; the census
   * is a (cell, label) aggregate (≤ nCells·|labels| rows) with the
   * majority picked by a max-struct aggregate per cell — no windows.
   */
  def ivfLabelPurity(embeddings: DataFrame, labelCol: String,
      nCells: Int = 16): DataFrame = {
    val assigned = ivfAssign(embeddings, ivfCentroids(embeddings, nCells))
      .select(col("vec_id"), col("cell"))
      .join(embeddings.select(col("vec_id"), col(labelCol).as("__lbl")), "vec_id")
    val cl = assigned.groupBy("cell", "__lbl").agg(count(lit(1)).as("__n"))
    cl.groupBy("cell")
      .agg(sum(col("__n")).as("n_vectors"),
        count(lit(1)).as("n_labels"),
        // majority label: max over (count, -label) structs — ties to the
        // LOWEST label id, deterministically, without a window
        max(struct(col("__n").as("c"), (-col("__lbl")).as("nl"))).as("__best"))
      .select(col("cell"), col("n_vectors"), col("n_labels"),
        (-col("__best.nl")).as("majority_label"),
        expr("__best.c * 1000000 DIV n_vectors").as("purity_ppm"))
      .orderBy("cell")
  }

  /**
   * IVF CLUSTER TOPIC labels — the multimodal bridge: each embedding
   * cell named by the most DISTINCTIVE terms of its member documents
   * (cell term count · 1e6 DIV corpus df — the rarity weighting of
   * per-doc keywords lifted to cluster grain). Embedding ids align 1:1
   * with document ids (the corpus contract); the output is what a human
   * reads to decide whether cluster 7 is "german legal boilerplate" or
   * noise.
   *
   * Scale shape: assignment is the broadcast map-side argmax; terms
   * collapse to (cell, term) with map-side partials; df is one
   * |vocab|-bounded aggregate joined in; the rank window partitions by
   * cell. Nothing unbounded, no cross join beyond the centroid broadcast.
   */
  def ivfClusterTopics(embeddings: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, nCells: Int = 16, topTerms: Int = 3): DataFrame = {
    require(topTerms >= 1, s"topTerms $topTerms must be positive")
    val assigned = ivfAssign(embeddings, ivfCentroids(embeddings, nCells))
      .select(col("vec_id").as(idCol), col("cell"))
    val terms = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val cellTerms = terms.join(assigned, idCol)
      .groupBy("cell", "term").agg(count(lit(1)).as("n"))
    val dfreq = terms.select(col(idCol), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val byCell = org.apache.spark.sql.expressions.Window
      .partitionBy("cell").orderBy(col("score").desc, col("term"))
    cellTerms.join(dfreq, "term")
      .withColumn("score", expr("n * 1000000 DIV df"))
      .withColumn("rank", row_number().over(byCell).cast("long"))
      .filter(col("rank") <= topTerms)
      .select(col("cell"), col("rank"), col("term"), col("n"), col("df"),
        col("score"))
      .orderBy("cell", "rank")
  }

  /**
   * ANN RECALL@k evaluation — the retrieval-quality harness: each
   * approximate method's top-k is scored against the brute-force ground
   * truth as `|approx ∩ truth| / k` in exact ppm. This is the table a
   * team reads before trading brute-force cost for ANN speed — an index
   * whose recall you haven't measured is a rumor. All frames are top-k
   * results by contract (tiny); each intersection is one semi join of
   * two k-row frames. The heavy work (the retrievals themselves)
   * happened upstream in the measured operators.
   */
  def recallEval(methods: Seq[(String, DataFrame)], truth: DataFrame,
      idCol: String, k: Int): DataFrame = {
    require(methods.nonEmpty && k >= 1, "need methods and positive k")
    val truthIds = truth.select(col(idCol)).limit(k)
    methods.map { case (name, m) =>
      m.select(col(idCol)).limit(k)
        .join(truthIds, Seq(idCol), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(name).as("method"), lit(k).as("k"), col("n_hits"),
          expr(s"n_hits * 1000000 DIV $k").as("recall_ppm"))
    }.reduce(_ unionAll _)
  }

  def rrfFusion(lists: Seq[DataFrame], idCol: String, scoreCol: String,
      rrfK: Int = 60): DataFrame = {
    require(lists.size >= 2, "rrfFusion needs at least two result lists")
    require(rrfK >= 1, s"rrfK $rrfK must be positive")
    import org.apache.spark.sql.expressions.Window
    val contributions = lists.map { df =>
      df.select(col(idCol), col(scoreCol).as("__s"))
        .withColumn("__rk",
          row_number().over(BoundedGlobalWindow.orderBy(col("__s").desc, col(idCol))).cast("long"))
        .select(col(idCol), expr(s"1000000000 DIV ($rrfK + __rk)").as("__c"))
    }.reduce(_ unionAll _)
    contributions.groupBy(idCol)
      .agg(sum(col("__c")).as("rrf_score"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol))
  }

  /** Σ (aᵢ−bᵢ)² in double, sequential fold order (same determinism
    * argument as [[dot]]). */
  private def sqL2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /**
   * PRODUCT-QUANTIZATION (PQ) recall audit — encode every vector as
   * `nSub` one-byte codes (nearest codeword per subspace, squared-L2,
   * ties → lowest code id; codebooks seeded deterministically from
   * vec_id 1..nCodes like [[ivfTopK]]'s centroids), score candidates by
   * ASYMMETRIC DISTANCE (the query's per-(subspace, code) dot-product
   * table, summed over the vector's codes — the ADC of Jégou et al.,
   * IEEE TPAMI 2011), and report PQ top-k recall against the exact
   * brute-force cosine top-k. THE scale path for 100 TB of embeddings:
   * a 64-dim float vector is 256 bytes, its PQ code is `nSub` bytes —
   * the audit prints that compression next to the recall it costs, which
   * is the whole engineering trade in one row.
   *
   * Scale shape: encoding is a map-side broadcast argmin per subspace
   * (codebook is nSub·nCodes rows); ADC scoring joins the
   * |vectors|·nSub code rows to the BROADCAST query table and collapses
   * by vec_id with map-side partials; both top-ks are
   * TakeOrderedAndProject. Nothing pairwise, nothing windowed.
   */
  /** Array of the `nSub` subvector slices of `v` (1-based slice API). */
  private def pqSubs(v: Column, nSub: Int, subDim: Int): Column =
    array((0 until nSub).map(s => slice(v, s * subDim + 1, subDim)): _*)

  /** Codebook: one codeword per (subspace, code), seeded from the first
    * `nCodes` vectors — deterministic, no RNG (the IVF seeding argument). */
  private def pqCodebook(embeddings: DataFrame, nSub: Int, subDim: Int,
      nCodes: Int): DataFrame =
    embeddings
      .filter(col("vec_id") >= 1 && col("vec_id") <= nCodes)
      .select(col("vec_id").cast("int").as("code"),
        posexplode(pqSubs(col("embedding"), nSub, subDim)).as(Seq("sub", "cvec")))

  /** Encode: nearest codeword per subspace (argmin sq-L2; tie → low code),
    * resolved map-side against the broadcast codebook. */
  private def pqEncode(embeddings: DataFrame, codebook: DataFrame,
      nSub: Int, subDim: Int): DataFrame =
    embeddings
      .select(col("vec_id"),
        posexplode(pqSubs(col("embedding"), nSub, subDim)).as(Seq("sub", "svec")))
      .join(broadcast(codebook), "sub")
      .select(col("vec_id"), col("sub"),
        struct((-round(sqL2(col("svec"), col("cvec")), 9)).as("nd"),
          (-col("code")).as("nc")).as("sc"))
      .groupBy("vec_id", "sub")
      .agg(max(col("sc")).as("best"))
      .select(col("vec_id"), col("sub"), (-col("best.nc")).as("code"))

  /** The query's ADC table: dot(query subvector, codeword) per (sub, code). */
  private def pqQueryTable(codebook: DataFrame, query: DataFrame,
      nSub: Int, subDim: Int): DataFrame =
    codebook.crossJoin(broadcast(query))
      .select(col("sub"), col("code"),
        dot(element_at(pqSubs(col("qe"), nSub, subDim), col("sub") + 1),
          col("cvec")).as("qdot"))

  /** ADC scores (rounded to 6 dp via exact decimal partial sums) for the
    * given encoded vectors against the broadcast query table. */
  private def adcScores(encoded: DataFrame, qtab: DataFrame): DataFrame =
    encoded.join(broadcast(qtab), Seq("sub", "code"))
      .groupBy("vec_id")
      .agg(round(sum(col("qdot").cast("decimal(28,12)")).cast("double"), 6).as("adc"))

  def pqRecallAudit(embeddings: DataFrame, query: DataFrame, k: Int,
      dim: Int = 64, nSub: Int = 4, nCodes: Int = 8): DataFrame = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    val subDim = dim / nSub
    val codebook = pqCodebook(embeddings, nSub, subDim, nCodes)
    val encoded = pqEncode(embeddings, codebook, nSub, subDim)
    val qtab = pqQueryTable(codebook, query, nSub, subDim)
    val pqTop = adcScores(encoded, qtab)
      .orderBy(desc("adc"), col("vec_id"))
      .limit(k)
    val truth = bruteForceTopK(embeddings, query, k).select("vec_id")
    pqTop.select("vec_id")
      .join(truth, Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
      .select(lit(k).as("k"), col("n_hits"),
        expr(s"n_hits * 1000000 DIV $k").as("recall_ppm"),
        lit(dim * 4L).as("raw_bytes_per_vec"),
        lit(nSub.toLong).as("pq_bytes_per_vec"))
  }

  /**
   * IVF-PQ recall audit — the production ANN index layout (FAISS's
   * `IVFx,PQy`; Jégou et al. TPAMI 2011 §V): a coarse IVF quantizer
   * prunes the corpus to `nProbe` cells, and ASYMMETRIC PQ distances
   * rank only those candidates — the query never touches a full vector.
   * Reported against the exact brute-force top-k, next to the scan
   * fraction the cell pruning bought: the two numbers an index tuning
   * session actually trades.
   *
   * Scale shape: composes the [[ivfTopK]] assignment (map-side broadcast
   * argmax) with the [[pqRecallAudit]] machinery (broadcast codebook
   * encode, broadcast ADC table); the candidate restriction is a
   * left-semi hash join on vec_id. Everything non-candidate-sized is
   * broadcast; nothing is pairwise.
   */
  def ivfPqRecallAudit(embeddings: DataFrame, query: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4, dim: Int = 64, nSub: Int = 4,
      nCodes: Int = 8): DataFrame = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    val subDim = dim / nSub
    val centroids = ivfCentroids(embeddings, nCells)
    val assigned = ivfAssign(embeddings, centroids)
    val probed = centroids.crossJoin(broadcast(query))
      .select(col("cid").as("cell"), cosine(col("cemb"), col("qe")).as("qsim"))
      .orderBy(desc("qsim"), col("cell"))
      .limit(nProbe)
      .select("cell")
    val candidates = assigned.join(broadcast(probed), Seq("cell"), "left_semi")
      .select("vec_id")
    val codebook = pqCodebook(embeddings, nSub, subDim, nCodes)
    val encoded = pqEncode(embeddings, codebook, nSub, subDim)
    val qtab = pqQueryTable(codebook, query, nSub, subDim)
    val top = adcScores(encoded.join(candidates, Seq("vec_id"), "left_semi"), qtab)
      .orderBy(desc("adc"), col("vec_id"))
      .limit(k)
    val truth = bruteForceTopK(embeddings, query, k).select("vec_id")
    val nScanned = candidates.agg(count(lit(1)).as("n_scanned"))
    val nTotal = embeddings.agg(count(lit(1)).as("__n_total"))
    top.select("vec_id")
      .join(truth, Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
      .crossJoin(broadcast(nScanned))
      .crossJoin(broadcast(nTotal))
      .select(lit(k).as("k"), col("n_hits"),
        expr(s"n_hits * 1000000 DIV $k").as("recall_ppm"),
        col("n_scanned"),
        expr("n_scanned * 1000000 DIV __n_total").as("scan_fraction_ppm"))
  }

  /**
   * DIVERSITY-CONSTRAINED top-k — exact cosine ranking with AT MOST
   * `perGroup` results per label: the result-diversification contract
   * every retrieval surface ships ("don't fill the page with one
   * cluster") in its deterministic quota form — rank within label,
   * keep ranks ≤ perGroup, then global top-k. Greedy MMR re-scoring is
   * order-dependent and float-fragile; the quota form is the
   * oracle-checkable spelling of the same product requirement.
   *
   * Scale shape: one broadcast query pass for scores; the per-label
   * rank is a label-partitioned window (per-key bounded); the final
   * top-k plans as TakeOrderedAndProject. `WindowGroupLimit` pushes the
   * quota below the exchange.
   */
  def diverseTopK(embeddings: DataFrame, query: DataFrame, labelCol: String,
      k: Int, perGroup: Int): DataFrame = {
    require(k >= 1 && perGroup >= 1, "positive k and perGroup required")
    import org.apache.spark.sql.expressions.Window
    val scored = embeddings.filter(col(labelCol).isNotNull)
      .crossJoin(broadcast(query))
      .select(col("vec_id"), col(labelCol).as("label"),
        round(cosine(col("embedding"), col("qe")), 6).as("sim"))
    val byLabel = Window.partitionBy("label")
      .orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("__r", row_number().over(byLabel))
      .filter(col("__r") <= perGroup)
      .select(col("vec_id"), col("label"), col("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /**
   * EMBEDDING OUTLIER audit — the top vectors by how many dimensions sit
   * more than 3σ from that dimension's corpus mean: the "is this vector
   * corrupt / from another model / adversarial" triage list. Entirely
   * exact integers via CROSS-MULTIPLICATION — with per-dim micro sums
   * s1 = Σm, s2 = Σm², the 3σ test `(x−μ)² > 9σ²` clears denominators to
   * `(m·n − s1)² > 9·(s2·n − s1²)`, so no division, no float variance,
   * no engine drift. (The same trick x147's rate guards use, applied to
   * second moments.)
   *
   * Scale shape: one map-side explode collapsing to dim-bounded (s1, s2,
   * n) broadcast back; the flag test is row-local; the report is a
   * top-k (TakeOrderedAndProject). Moments ride DECIMAL(38,0): s2 sums
   * squares of ±1e6-scale components — 1e12 per row, exact to 1e26 rows.
   */
  def embeddingOutlierAudit(embeddings: DataFrame, labelCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK $topK must be positive")
    val comps = embeddings
      .filter(col(labelCol).isNotNull && col("embedding").isNotNull)
      .select(col("vec_id"), col(labelCol).as("label"),
        posexplode(col("embedding")).as(Seq("dim", "__x")))
      .select(col("vec_id"), col("label"), col("dim"),
        expr("CAST(ROUND(CAST(__x AS DOUBLE) * 1000000) AS BIGINT)").as("__m"))
    val moments = comps.groupBy("dim")
      .agg(sum(col("__m").cast("decimal(38,0)")).as("__s1"),
        sum(col("__m").cast("decimal(38,0)") * col("__m")).as("__s2"),
        count(lit(1)).as("__n"))
    comps.join(broadcast(moments), "dim")
      .withColumn("__flag", when(
        expr("""(CAST(__m AS DECIMAL(38,0)) * __n - __s1)
              * (CAST(__m AS DECIMAL(38,0)) * __n - __s1)
              > 9 * (__s2 * __n - __s1 * __s1)"""), 1L).otherwise(0L))
      .groupBy("vec_id", "label")
      .agg(sum(col("__flag")).as("n_flagged_dims"))
      .filter(col("n_flagged_dims") > 0)
      .orderBy(col("n_flagged_dims").desc, col("vec_id"))
      .limit(topK)
  }

  /**
   * IVF-PQ + EXACT RE-RANK — the COMPLETE production retrieval stack
   * (FAISS's `index.refine` pattern): the coarse IVF quantizer prunes to
   * `nProbe` cells, ASYMMETRIC PQ distances cut the candidates to a
   * `rerankPool`, and only that pool's FULL vectors are read for an
   * exact cosine top-k. This is the three-tier memory hierarchy every
   * billion-vector deployment runs — centroids in L1, codes in RAM,
   * full vectors on flash touched `rerankPool` times per query — and
   * the recall row shows what the two approximations left on the table
   * AFTER the exact pass repaired the PQ ranking noise.
   *
   * Scale shape: [[ivfPqRecallAudit]]'s broadcast pipeline plus ONE
   * left-semi hash join to fetch the pool's full vectors; both top-ks
   * plan as TakeOrderedAndProject.
   */
  def ivfPqRerankAudit(embeddings: DataFrame, query: DataFrame, k: Int,
      rerankPool: Int = 50, nCells: Int = 16, nProbe: Int = 4,
      dim: Int = 64, nSub: Int = 4, nCodes: Int = 8): DataFrame = {
    require(dim % nSub == 0, s"dim $dim must divide into $nSub subspaces")
    require(rerankPool >= k, s"rerankPool $rerankPool must cover k=$k")
    val subDim = dim / nSub
    val centroids = ivfCentroids(embeddings, nCells)
    val assigned = ivfAssign(embeddings, centroids)
    val probed = centroids.crossJoin(broadcast(query))
      .select(col("cid").as("cell"), cosine(col("cemb"), col("qe")).as("qsim"))
      .orderBy(desc("qsim"), col("cell"))
      .limit(nProbe)
      .select("cell")
    val candidates = assigned.join(broadcast(probed), Seq("cell"), "left_semi")
      .select("vec_id")
    val codebook = pqCodebook(embeddings, nSub, subDim, nCodes)
    val encoded = pqEncode(embeddings, codebook, nSub, subDim)
    val qtab = pqQueryTable(codebook, query, nSub, subDim)
    val pool = adcScores(encoded.join(candidates, Seq("vec_id"), "left_semi"), qtab)
      .orderBy(desc("adc"), col("vec_id"))
      .limit(rerankPool)
      .select("vec_id")
    val reranked = embeddings.join(pool, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(query))
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 6).as("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(k)
    val truth = bruteForceTopK(embeddings, query, k).select("vec_id")
    reranked.select("vec_id")
      .join(truth, Seq("vec_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
      .select(lit(k).as("k"), lit(rerankPool).as("rerank_pool"), col("n_hits"),
        expr(s"n_hits * 1000000 DIV $k").as("recall_ppm"))
  }

  /**
   * SOURCE CENTROID similarity — pairwise cosine between each source's
   * centroid embedding, top pairs first: "which feeds say the same
   * things" at the SEMANTIC level, where x237's near-dup census sees
   * only literal text reuse. Cosine is scale-invariant, so the centroid
   * never needs the division: the per-source per-dim SUM of once-rounded
   * micro components is an exact integer vector with the same direction
   * as the mean, and the only floating point is the final
   * `dot/(|a||b|)` on those exact sums (three deterministic double ops,
   * rounded to 6 dp — the corpus cosine convention).
   *
   * Scale shape: one map-side explode collapsing to |sources|·dim exact
   * sums; the pair join runs on the |sources|-bounded frame (never the
   * corpus); dot products ride DECIMAL(38,0). Output ≤ topK rows.
   */
  def sourceCentroidSimilarity(embeddings: DataFrame, docs: DataFrame,
      docIdCol: String, sourceCol: String, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK $topK must be positive")
    val bridged = embeddings
      .join(docs.select(col(docIdCol).as("vec_id"), col(sourceCol).as("source")),
        "vec_id")
      .filter(col("source").isNotNull && col("embedding").isNotNull)
    val sums = bridged
      .select(col("source"), posexplode(col("embedding")).as(Seq("dim", "__x")))
      .select(col("source"), col("dim"),
        expr("CAST(ROUND(CAST(__x AS DOUBLE) * 1000000) AS BIGINT)").as("__m"))
      .groupBy("source", "dim")
      .agg(sum(col("__m")).as("__s"))
    val norms = sums.groupBy("source")
      .agg(sum(col("__s").cast("decimal(38,0)") * col("__s")).as("__n2"))
    val dots = sums.as("a")
      .join(sums.as("b"),
        col("a.dim") === col("b.dim") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_1"), col("b.source").as("source_2"))
      .agg(sum(col("a.__s").cast("decimal(38,0)") * col("b.__s")).as("__dot"))
    dots
      .join(norms.select(col("source").as("source_1"), col("__n2").as("__na")),
        "source_1")
      .join(norms.select(col("source").as("source_2"), col("__n2").as("__nb")),
        "source_2")
      .select(col("source_1"), col("source_2"),
        round(col("__dot").cast("double")
          / (sqrt(col("__na").cast("double")) * sqrt(col("__nb").cast("double"))), 6)
          .as("centroid_cosine"))
      .orderBy(col("centroid_cosine").desc, col("source_1"), col("source_2"))
      .limit(topK)
  }

  /**
   * EMBEDDING NORM audit — per label: vector count, zero (degenerate)
   * vectors, min/max squared norm (rounded to 6 dp, the corpus cosine
   * convention) and the exact decimal-summed mean. The pre-flight gate
   * before ANY cosine pipeline: a zero vector makes cosine undefined, a
   * norm range spanning orders of magnitude means the index was built
   * from unnormalized embeddings and every dot-product shortcut is
   * silently wrong.
   *
   * Scale shape: one map-side fused fold per vector
   * ([[graft.functions.CosineSimilarity]]'s argument applies — the
   * squared norm is the same sequential double fold both engines
   * reproduce bit-identically), then a |labels|-bounded aggregate.
   * Mean rides DECIMAL(18,6) so summation order cannot drift a ulp.
   */
  def embeddingNormAudit(embeddings: DataFrame, labelCol: String): DataFrame = {
    val sq = round(dot(col("embedding"), col("embedding")), 6)
    embeddings.filter(col(labelCol).isNotNull && col("embedding").isNotNull)
      .select(col(labelCol), sq.as("__sq"))
      .groupBy(labelCol)
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("__sq") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        min(col("__sq")).as("min_sq_norm"),
        max(col("__sq")).as("max_sq_norm"),
        (sum(col("__sq").cast("decimal(18,6)")).cast("double")
          / count(lit(1))).as("avg_sq_norm"))
      .orderBy(labelCol)
  }

  /**
   * DIMENSION DRIFT audit — per embedding dimension: the global mean
   * component and the worst per-label deviation from it, in exact micro
   * units (each float component rounds ONCE to an integer, so every sum
   * is exact BIGINT arithmetic; the only division is one double divide
   * per row at the very end — bit-identical cross-engine). High
   * deviation = the dimension leaks the label (a shortcut feature /
   * contamination smell); global mean ≈ 0 with tiny deviation = a dead
   * dimension paying storage for nothing.
   *
   * Scale shape: the explode is map-side and collapses immediately to
   * (label, dim) partial sums — |labels|·dim rows — then to dim rows;
   * nothing vector-count-sized survives the first exchange.
   */
  /** Micro-scaled NDCG discount table: disc(r) = ⌊10⁶ / log₂(r+1)⌋ for
    * ranks 1..k — irrational logs frozen into ONE literal table at
    * plan-build time (the PoissonThresholds discipline), interpolated
    * verbatim into both the Spark expression and the DuckDB oracle so
    * the graded-relevance arithmetic cannot drift between engines. */
  def ndcgDiscountsMicro(k: Int): Seq[Long] =
    (1 to k).map(r => math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /**
   * RETRIEVAL RANKING-QUALITY metrics — recall@k ([[recallEval]]) is a
   * set metric; serving quality is a RANK metric. For every query in an
   * eval batch this scores an approximate retriever (sign-bucket ANN,
   * the x06 index) against exact brute-force truth with the two
   * standard ranking measures (public IR methodology): MRR (reciprocal
   * rank of the TRUE nearest neighbour in the system list) and NDCG@k
   * with graded relevance (truth rank r ⇒ gain k+1−r, discount
   * 1/log₂(rank+1) via [[ndcgDiscountsMicro]]'s frozen integer table).
   * The readout is the mean over queries of each, plus set recall for
   * continuity with x217 — the three numbers an ANN rollout gate reads.
   *
   * Engine-exact: cosines round to 6 dp, relevance/discount arithmetic
   * is all integer micro-units, per-query NDCG floors to ppm of the
   * constant ideal DCG, and means floor-divide by the query count.
   *
   * Scale shape: one corpus pass scores all queries for truth and one
   * bucket-pruned pass for the system (both broadcast the bounded query
   * batch); per-query ranking windows partition BY QUERY; the metric
   * join carries ≤ 2·k rows per query.
   */
  def rankingMetricsEval(embeddings: DataFrame, queries: DataFrame,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be positive")
    val discArr = ndcgDiscountsMicro(k).mkString("array(", "L, ", "L)")
    val idcg = ndcgDiscountsMicro(k).zipWithIndex
      .map { case (d, i) => (k - i).toLong * d }.sum
    val truth = batchTopK(embeddings, queries, k)
      .select(col("qid"), col("vec_id"), col("rn").as("trank"))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), col("vec_id"))
    val bucketed = embeddings.withColumn("bucket", signBucket(col("embedding")))
    val qb = queries.withColumn("bucket", signBucket(col("qe")))
    val system = bucketed.join(broadcast(qb), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("embedding"), col("qe")), 6).as("sim"))
      .withColumn("srank", row_number().over(w))
      .filter(col("srank") <= k)
      .select("qid", "vec_id", "srank")
    val joined = system.join(truth, Seq("qid", "vec_id"))
      .select(col("qid"),
        expr(s"CAST(${k + 1} - trank AS BIGINT) * element_at($discArr, srank)")
          .as("__gain"),
        when(col("trank") === 1, expr("1000000 DIV srank")).otherwise(0L)
          .as("__rr"))
    val perQuery = queries.select(col("qid"))
      .join(joined.groupBy("qid")
          .agg(sum(col("__gain")).as("__dcg"), count(lit(1)).as("__hits"),
            max(col("__rr")).as("__rrm")),
        Seq("qid"), "left")
      .select(col("qid"),
        coalesce(expr(s"__dcg * 1000000 DIV ${idcg}L"), lit(0L)).as("__ndcg"),
        coalesce(col("__hits"), lit(0L)).as("__h"),
        coalesce(col("__rrm"), lit(0L)).as("__rr"))
    perQuery.agg(count(lit(1)).as("n_queries"),
        sum(col("__ndcg")).as("__sn"), sum(col("__rr")).as("__sr"),
        sum(col("__h")).as("__sh"))
      .select(col("n_queries"), lit(k).as("k"),
        expr("__sr DIV n_queries").as("mean_mrr_micro"),
        expr("__sn DIV n_queries").as("mean_ndcg_ppm"),
        expr(s"__sh * 1000000 DIV (n_queries * $k)").as("recall_at_k_ppm"))
  }

  /**
   * MATRYOSHKA / truncation recall sweep — the modern embedding-
   * compression eval (public: matryoshka representation learning, where
   * serving truncates vectors to a dim prefix): for each prefix width d,
   * the top-k by prefix-d cosine against the full-width truth top-k,
   * reported as recall. The third compression axis next to x91 (fewer
   * bits) and x96 (JL fewer dims by projection) — truncation is the
   * zero-compute variant serving actually deploys, and this table says
   * which width is safe.
   *
   * Engine-exact: prefix cosine is the same ascending-index double fold
   * over the SLICED array both engines perform, rounded once to 6 dp;
   * ties break by vec_id. Scale shape: one corpus pass per width (the
   * widths list is a constant), each a broadcast-query TakeOrdered —
   * never a pairwise join.
   */
  def matryoshkaRecall(embeddings: DataFrame, query: DataFrame, k: Int = 10,
      dims: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    require(k >= 1 && dims.nonEmpty, "need k >= 1 and at least one width")
    def topK(d: Option[Int]): DataFrame = {
      val (e, q) = d.map(w => (slice(col("embedding"), 1, w),
        slice(col("qe"), 1, w))).getOrElse((col("embedding"), col("qe")))
      embeddings.crossJoin(broadcast(query))
        .select(col("vec_id"), round(cosine(e, q), 6).as("sim"))
        .orderBy(desc("sim"), col("vec_id")).limit(k).select("vec_id")
    }
    val truth = topK(None)
    dims.map { d =>
      topK(Some(d)).join(truth, "vec_id")
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(d).as("dims"), col("n_hits"),
          expr(s"n_hits * 1000000 DIV $k").as("recall_ppm"))
    }.reduce(_ unionAll _).orderBy("dims")
  }

  def dimensionDriftAudit(embeddings: DataFrame, labelCol: String): DataFrame = {
    val comps = embeddings
      .filter(col(labelCol).isNotNull && col("embedding").isNotNull)
      .select(col(labelCol).as("label"),
        posexplode(col("embedding")).as(Seq("dim", "__x")))
      .select(col("label"), (col("dim") + 1).as("dim"),
        expr("CAST(ROUND(CAST(__x AS DOUBLE) * 1000000) AS BIGINT)").as("__m"))
    val byLabel = comps.groupBy("label", "dim")
      .agg(sum(col("__m")).as("__ls"), count(lit(1)).as("__ln"))
    val global = byLabel.groupBy("dim")
      .agg(sum(col("__ls")).as("__gs"), sum(col("__ln")).as("__gn"))
    byLabel.join(broadcast(global), "dim")
      .withColumn("__dev",
        abs(col("__ls").cast("double") / col("__ln")
          - col("__gs").cast("double") / col("__gn")))
      .groupBy("dim")
      .agg(count(lit(1)).as("n_labels"),
        max((col("__gs").cast("double") / col("__gn"))).as("global_avg_micro"),
        max(col("__dev")).as("max_label_dev_micro"))
      .orderBy("dim")
  }

  /**
   * PER-DIMENSION CLASS SEPARABILITY (correlation ratio η², public) — the
   * feature-selection table for an embedding-based classifier: per
   * component, what fraction of the component's variance does the label
   * explain? `η²_d = SSB/SST` from the one-way ANOVA decomposition.
   * [[dimensionDriftAudit]] reports how far label MEANS drift; η²
   * normalizes by the total variance, so a dimension with huge spread and
   * small mean gaps correctly reads as noise. Components quantize to
   * integer micro-units (the [[dimensionDriftAudit]] convention); the
   * per-class term `s_g² / n_g` and the grand term `S² / N` floor through
   * DECIMAL pmod subtraction (s² ≥ 0, so floor == truncate and Spark
   * matches DuckDB's `//`; a plain DIV would silently wrap the ~n·10¹²
   * quotient past ~10⁶ vectors — the x594 lesson). Truncation can push
   * SSB a hair negative; both engines clamp identically before the one
   * ppm division.
   *
   * Scale shape: one posexplode pass (64·n rows, map-side), a
   * (dim, label) collapse, a |dims·labels|-bounded dim collapse — no
   * joins, no windows, nothing driver-side.
   */
  def classSeparability(embeddings: DataFrame, labelCol: String): DataFrame = {
    val q = embeddings
      .filter(col(labelCol).isNotNull && col("embedding").isNotNull)
      .select(col(labelCol).cast("long").as("__g"),
        posexplode(col("embedding")).as(Seq("dim", "__x")))
      .select(col("__g"), (col("dim") + 1).as("dim"),
        expr("CAST(ROUND(CAST(__x AS DOUBLE) * 1000000) AS BIGINT)").as("__q"))
    val pg = q.groupBy("dim", "__g")
      .agg(count(lit(1)).as("__n"), sum(col("__q")).as("__s"),
        sum(expr("CAST(__q AS DECIMAL(38,0)) * __q")).as("__ss"))
    pg.groupBy("dim")
      .agg(count(lit(1)).as("n_labels"),
        sum(col("__n")).as("n_vectors"),
        sum(col("__s")).as("__gs"),
        sum(col("__ss")).as("__gss"),
        sum(expr("""(CAST(__s AS DECIMAL(38,0)) * __s
            - pmod(CAST(__s AS DECIMAL(38,0)) * __s,
                   CAST(__n AS DECIMAL(38,0))))
          / CAST(__n AS DECIMAL(38,0))""").cast("decimal(38,0)")).as("__b"))
      .select(col("dim"), col("n_labels"), col("n_vectors"),
        col("__gss"), col("__b"),
        expr("""CAST((CAST(__gs AS DECIMAL(38,0)) * __gs
            - pmod(CAST(__gs AS DECIMAL(38,0)) * __gs,
                   CAST(n_vectors AS DECIMAL(38,0))))
          / CAST(n_vectors AS DECIMAL(38,0)) AS DECIMAL(38,0))""").as("__c"))
      .select(col("dim"), col("n_labels"), col("n_vectors"),
        expr("""CAST(CASE WHEN __gss - __c <= 0 THEN 0
             WHEN __b <= __c THEN 0
             ELSE (__b - __c) * 1000000 DIV (__gss - __c)
             END AS BIGINT)""").as("eta2_ppm"))
      .orderBy("dim")
  }
}
