package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for interactive debugging (not part of the library API). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      sources.Tables(spark, s"/root/testdata/sf$sf", "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("exact"),
          approx_count_distinct(col("l_orderkey")).as("approx"))
        .select(col("l_returnflag"), col("exact"), col("approx"),
          (abs(col("approx") - col("exact")).cast("double") /
            col("exact").cast("double")).as("rel_err"))
        .collect().foreach(r => println(s"sf$sf $r"))
    }
    spark.stop()
  }
}
