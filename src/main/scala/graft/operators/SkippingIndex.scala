package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * File-level data-skipping index — the manifest a lakehouse (Delta/Iceberg
 * style) maintains so range queries read only the files whose [min, max]
 * stats overlap the predicate, re-expressed on plain parquet: build the
 * per-file stats table with one aggregate over `input_file_name()`, then
 * answer range queries by reading ONLY the overlapping files.
 *
 * The payoff depends on layout: files written via `repartitionByRange` on
 * the indexed column have tight disjoint ranges, so a narrow range query
 * touches O(1) of them — at 100 TB the difference between a full scan and
 * reading a handful of files. The manifest itself is metadata-sized (one
 * row per FILE), so collecting the selected file list to the driver is the
 * same O(files) metadata operation every table format's planning phase
 * performs — not a data collect.
 */
object SkippingIndex {

  /** One manifest row per parquet file: [min, max] of `valueCol` + row
    * count. One scan builds it; a real deployment maintains it
    * incrementally on write (the x89/x124 delta-merge patterns apply). */
  def buildManifest(spark: SparkSession, dir: String, valueCol: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(valueCol)).as("min_v"), max(col(valueCol)).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** Files whose stats range overlaps [lo, hi] — the planning step. The
    * bound literals are cast to the MANIFEST's stat type (a hardcoded
    * timestamp cast would NULL out on a numeric index column and silently
    * select zero files). */
  def overlappingFiles(manifest: DataFrame, lo: String, hi: String): Array[String] = {
    val t = manifest.schema("min_v").dataType
    manifest
      .filter(col("max_v") >= lit(lo).cast(t) && col("min_v") <= lit(hi).cast(t))
      // bounded-collect: skipping-file-manifest
      .select("file").collect().map(_.getString(0))
  }

  /** Range read THROUGH the manifest: read only the overlapping files,
    * then apply the exact predicate (stats prune at file granularity; the
    * residual filter finishes the job — same contract as parquet row-group
    * skipping). Returns an empty frame of the right schema when no file
    * overlaps. */
  def prunedRangeRead(spark: SparkSession, dir: String, manifest: DataFrame,
      valueCol: String, lo: String, hi: String): DataFrame = {
    val files = overlappingFiles(manifest, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    val t = base.schema(valueCol).dataType
    base.filter(col(valueCol).between(lit(lo).cast(t), lit(hi).cast(t)))
  }
}
