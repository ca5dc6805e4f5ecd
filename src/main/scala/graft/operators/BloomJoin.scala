package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bloom-pruned semi join: build a bloom filter over the (small) build side's
 * join keys, pre-filter the (huge) probe side with `might_contain` at the
 * scan, then run the exact semi join on the survivors. The bloom probe is a
 * map-side predicate — at 100 TB it discards the overwhelming majority of
 * probe rows BEFORE the shuffle the semi join needs, which is the whole
 * cost of a large-fact join. False positives pass the bloom but are removed
 * by the exact semi join, so the result is identical to the plain semi join
 * (the oracle).
 *
 * This is exactly the shape of Spark's own runtime row-level filtering
 * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), which injects
 * might_contain(scalar-subquery(bloom_filter_agg(xxhash64(k))), xxhash64(k))
 * — but only above creation/application size thresholds that test-scale
 * data never meets. Stating it explicitly makes the plan deterministic at
 * every scale and the technique available to library users as an operator.
 */
object BloomJoin {

  /**
   * `fact` rows whose `factKey` appears in `dim.dimKey` (exact), with the
   * bloom pre-filter applied first. The bloom side must be expressed as a
   * scalar subquery — `BloomFilterMightContain` requires a constant or
   * scalar-subquery bloom (it is evaluated once, broadcast with the plan),
   * so the operator goes through SQL on temp views rather than a Column
   * (a joined bloom column would re-evaluate per comparison and fails
   * analysis).
   */
  def bloomSemiJoin(spark: SparkSession, fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      estNumItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    graft.GraftExtensions.register(spark)
    // per-call view names: fixed names would be silently replaced by a
    // concurrent or composed second call before this plan resolves
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val factView = s"graft_bloom_fact_$tag"
    val dimView = s"graft_bloom_dim_$tag"
    fact.createOrReplaceTempView(factView)
    dim.createOrReplaceTempView(dimView)
    spark.sql(
      s"""SELECT f.* FROM $factView f
         |WHERE bloom_might_contain(
         |    (SELECT bloom_filter_build(xxhash64($dimKey), ${estNumItems}L, ${numBits}L)
         |     FROM $dimView),
         |    xxhash64(f.$factKey))
         |  AND f.$factKey IN (SELECT $dimKey FROM $dimView)""".stripMargin)
  }
}
