package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (`TESTDATA.md`). Parquet
  * scans are columnar and Catalyst pushes filters/pruning into them — every
  * query should show `PushedFilters`/`ReadSchema` reaching these scans. */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (multi-table SQL surface). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
