package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing — LLM-pipeline extension (SURVEY.md §7.4).
 *
 * Media (image/audio/video) is modeled as an opaque `binary` payload column
 * plus typed metadata, processed batch-at-a-time with `mapPartitions` over a
 * typed Dataset (the Scala analog of `mapInPandas`: one iterator per
 * partition, no per-row UDF dispatch, executor-local batching). The Spark
 * side — schema, partitioning, batch shape, feature extraction pipeline — is
 * real and oracle-tested; the codec itself is STUBBED (no image/audio
 * libraries in this environment) behind [[decodeStub]] with a deterministic
 * fake so the pipeline stays verifiable end-to-end.
 *
 * At 100 TB: payloads dominate I/O, so the media table should be stored with
 * the payload in its own parquet column (column pruning skips it when only
 * metadata is queried) and partitioned by a content-size band so decode
 * batches are balanced across executors.
 */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], format: String)
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int,
                           checksum: Long, width: Int, height: Int, gray_mean: Double)

  /**
   * STUB — a real implementation would hand `bytes` to an image/audio codec
   * (not available in this container). The fake is a pure deterministic
   * function of the payload so correctness of the surrounding distributed
   * pipeline is still fully testable.
   */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Double, Long) = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val width = 64 + (bytes.length % 576)
    val height = 64 + (sum % 416).toInt
    val grayMean = if (bytes.length == 0) 0.0 else sum.toDouble / bytes.length
    (width, height, grayMean, sum)
  }

  /** Wrap a text table as a media table: payload = UTF-8 bytes, format from
    * the source tag. (Stand-in for real media ingest; keeps the binary
    * column + metadata shape the pipeline contract needs.) */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      concat(lit("img/"), col("source")).as("format"))

  /** Batch feature extraction: one `mapPartitions` pass, iterator-to-iterator
    * (streaming within the partition, constant memory). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.payload
        val (w, h, gray, sum) = decodeStub(bytes)
        MediaFeatures(r.doc_id, r.format, bytes.length, sum % 997, w, h, gray)
      }
    }
  }
}
