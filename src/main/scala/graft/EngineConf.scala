package graft
import org.apache.spark.sql.SparkSession

/** Engine-level session tuning shared by every driver-contract main
  * (Bench/Verify/BenchOne/Debug/PhaseProfile/PlanDump) so measurements and
  * artifacts all run the same engine. Every value here is SCALE-HONEST:
  * none encodes the local core count or data size, and each is what a
  * production deployment of a ~700-query fleet would set (justifications
  * in OPTIMIZATION_r12.md).
  */
object EngineConf {
  /** Round-12 measured: one bench pass compiles 12,084 generated codegen
    * units (PhaseProfile) against the default 100-entry compiled-class
    * cache (`spark.sql.codegen.cache.maxEntries`), so the cache evicts
    * every entry long before any query repeats and the warm-up pass's
    * stated purpose ("JIT-compiles the generated code paths", Bench
    * scaladoc) is defeated — every timed pass re-runs Janino on the whole
    * fleet. 20,000 entries keeps the fleet's generated classes resident
    * (~12k distinct sources measured; compiled classes are KB-scale, the
    * cache is weak-value-free but bounded). A long-running SQL service
    * with a large distinct-plan fleet sizes this the same way at any data
    * scale — the knob is per-DRIVER and data-size-independent. */
  val CodegenCacheMaxEntries = "20000"

  def tuned(builder: SparkSession.Builder): SparkSession.Builder =
    builder.config("spark.sql.codegen.cache.maxEntries", CodegenCacheMaxEntries)
}
