package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch main for interactive debugging (not part of the library API). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val docs = sources.Tables(spark, sf, "documents")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }

    val sh = Dedup.shingleHashRows(docs, "doc_id", "text", 3)
    time("shingleHashRows warm0")(println("  rows: " + sh.count()))
    time("shingleHashRows warm1")(println("  rows: " + sh.count()))
    val sigs = sh.groupBy("doc_id")
      .agg(functions.MinHashSignature(col("sh"), 192, 0x5eed5eedL, 0xb17b17b1L).as("sig"))
    time("signatures")(println("  sigs: " + sigs.count()))
    time("full minhashLsh run1")(println("  pairs: " + Dedup.minhashLsh(docs, "doc_id", "text").count()))
    time("full minhashLsh run2")(println("  pairs: " + Dedup.minhashLsh(docs, "doc_id", "text").count()))
    spark.stop()
  }
}
