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
    // drive the public registration surface the way a library user would
    GraftExtensions.register(spark)
    sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb")
    spark.sql(
      """SELECT a.vec_id, cosine_similarity(a.embedding, b.embedding) AS sim
        |FROM emb a JOIN emb b ON b.vec_id = 0
        |ORDER BY sim DESC, a.vec_id LIMIT 5""".stripMargin).show()
    spark.stop()
  }
}
