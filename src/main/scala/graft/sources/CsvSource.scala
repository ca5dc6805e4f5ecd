package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * CSV scan + sink — Spark counterpart of the reference's ingest
 * (`/root/reference/app/routes/upload.py:24-26`: `pd.read_csv` with dtype
 * inference) and its client-side export
 * (`/root/reference/app/templates/index.html:400-430`: RFC-4180 quoting).
 *
 * `inferSchema=true` reproduces pandas' inference pass (one extra scan);
 * `mode=PERMISSIVE` (Spark default) matches pandas' tolerance of ragged rows.
 * Spark's CSV writer quotes values containing separators/quotes and doubles
 * embedded quotes — the same RFC-4180 rules as the reference's JS exporter
 * (`index.html:413-415`).
 *
 * At 100 TB: a headerful CSV directory splits by file; inference samples every
 * file, so production callers should pass an explicit schema — `read` accepts
 * one for that reason.
 */
object CsvSource {
  def read(spark: SparkSession, path: String,
           schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    schema match {
      case Some(s) => base.schema(s).csv(path)
      case None    => base.option("inferSchema", "true").csv(path)
    }
  }

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
