package graft

import org.apache.spark.sql.SparkSession

/** Scratch main for interactive debugging (not part of the library API). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val pairs = operators.Dedup.minhashLsh(docs, "doc_id", "text")
    println("minhash pairs: " + pairs.count())
    pairs.orderBy("d1", "d2").show(30)
    spark.stop()
  }
}
