package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The ONE engine-portable 60-bit hash used everywhere determinism across
 * engines matters: first 15 hex chars of md5, read base-16 into a BIGINT.
 * md5 is the overlap of Spark's and DuckDB's builtin hash vocabularies, so
 * any oracle can reproduce the value verbatim
 * (`CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`).
 *
 * Consumers: word hashing for SimHash ([[Dedup.portableWordHash]]),
 * sampling draws ([[Sampling.weightedBernoulli]],
 * [[Sampling.rebalanceToUniform]]), and row fingerprints
 * ([[Integrity.bucketChecksums]]) — one definition, so the
 * portability-critical construction cannot drift between modules.
 */
object PortableHash {
  /** 60-bit non-negative hash of an arbitrary column (cast to string). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
}
