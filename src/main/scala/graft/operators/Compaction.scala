package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Small-file compaction: rewrite a directory of many tiny files (the state
 * every incremental/streaming sink drifts into) as few right-sized ones.
 * At 100 TB the file count IS the problem — driver-side listing, scan task
 * scheduling, and footer reads all scale with it; compaction restores
 * scan efficiency without touching content. One shuffle (`repartition`)
 * sizes the output; content equality is the correctness contract.
 */
object Compaction {

  /** Rewrite `inDir` (parquet) as `targetFiles` files at `outDir` and
    * return the compacted table. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFiles: Int): DataFrame = {
    require(targetFiles > 0, "targetFiles must be positive")
    spark.read.parquet(inDir)
      .repartition(targetFiles)
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
  }

  /** Data files in a parquet dir (driver-side metadata listing). */
  def parquetFileCount(dir: String): Int =
    Option(new java.io.File(dir).listFiles())
      .map(_.count(f => f.getName.endsWith(".parquet"))).getOrElse(0)
}
