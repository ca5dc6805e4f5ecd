package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (`TESTDATA.md`). Parquet
  * scans are columnar and Catalyst pushes filters/pruning into them — every
  * query should show `PushedFilters`/`ReadSchema` reaching these scans. */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read nanos as long (legacy conf) and convert to a proper
    * TimestampType column (µs, truncating — sub-µs precision is below every
    * query's granularity).
    *
    * The conf is session-scoped and must hold at BOTH schema inference and
    * scan execution, so it cannot be restored after the read — a documented
    * side effect (the conf has a registered default, so an explicit caller
    * "false" is indistinguishable from the default). Production alternative:
    * a dedicated session (`spark.newSession()`) per ingest of
    * nanos-timestamped data. */
  private[graft] def ensureNanosAsLong(spark: SparkSession): Unit =
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    ensureNanosAsLong(spark)
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register every table as a temp view (multi-table SQL surface). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
