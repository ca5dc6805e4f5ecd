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

  /**
   * Embedding near-duplicate pairs: bucket by sign code (all `bits`-dim
   * agreement required), exact cosine within buckets, keep pairs ≥ τ.
   * Linear bucketing + within-bucket pairing — candidates ≪ n² when the
   * quantizer spreads vectors (64 dims → 256 buckets here).
   */
  def cosineNearDupPairs(embeddings: DataFrame, minCos: Double, bits: Int = 8): DataFrame = {
    val b = embeddings.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), bits).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        round(cosine(col("a.embedding"), col("b.embedding")), 6).as("sim"))
      .filter(col("sim") >= minCos)
  }
}
