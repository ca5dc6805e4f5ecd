package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Structured Streaming over the `events` table — SURVEY.md §7.4's streaming
 * demo. The batch parquet is replayed through a real streaming source
 * (`readStream`), aggregated with a tumbling event-time window, and drained
 * synchronously into a memory sink, so the streaming pipeline is verifiable
 * against a plain batch SQL oracle (complete output mode ⇒ final state ==
 * batch aggregation).
 *
 * At scale this same plan runs against a live source (Kafka/file stream) with
 * `withWatermark` bounding state: the aggregation state is hash-partitioned
 * by (window, event_type) across executors, and append mode + watermark emit
 * finalized windows incrementally.
 */
object EventStream {

  def windowedCounts(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema // ts arrives as long (nanos)

    // The streaming file source wants a directory; glob-filter to the one table.
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

    val agg = stream
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()

    val qname = "graft_stream_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val query = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qname)
      .start()
    try {
      query.processAllAvailable()
    } finally {
      query.stop()
    }

    spark.table(qname)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"),
        col("count").as("n"))
      .orderBy("hour", "event_type")
  }
}
