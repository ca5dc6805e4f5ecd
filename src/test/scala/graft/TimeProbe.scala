package graft

/** Throwaway local tool: time named queries at a given SF (not a test). */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkTestSession.spark
    val all = graft.queries.ATier.queries ++ graft.queries.BTier.queries ++
      graft.queries.Extensions.queries
    args.tail.foreach { name =>
      val fn = all(name)
      fn(spark, sfDir).count() // warm
      spark.catalog.clearCache()
      graft.queries.Extensions.clearStagingMemo()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"TIMED $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
