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

  case class FrameRow(doc_id: Long, frame_idx: Int, n_bytes: Int, checksum: Long)

  /**
   * Frame sampling — the video-pipeline shape (demux → sample every k-th
   * frame → per-frame features): the payload is cut into fixed
   * `frameBytes` slices standing in for demuxed frames (a real container
   * parser is a codec concern, stubbed like [[decodeStub]]), every
   * `stride`-th slice is kept, and each kept frame emits its size and byte
   * checksum. Iterator-to-iterator `mapPartitions` over the typed Dataset:
   * one pass, constant memory, frames never materialized as a whole list
   * per row — the batch shape a real decoder plugs into unchanged.
   *
   * At 100 TB: sampling inside the same pass as the read means dropped
   * frames are never shuffled or spilled — the stride cut happens before
   * any exchange.
   */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 32, stride: Int = 4): Dataset[FrameRow] = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.payload.length
        val nFrames = (n + frameBytes - 1) / frameBytes
        Iterator.range(0, nFrames).filter(_ % stride == 0).map { i =>
          val start = i * frameBytes
          val end = math.min(start + frameBytes, n)
          var sum = 0L
          var j = start
          while (j < end) { sum += r.payload(j) & 0xff; j += 1 }
          FrameRow(r.doc_id, i, end - start, sum)
        }
      }
    }
  }
}
