package graft

/** Throwaway local tool: print executed plans for named queries (not a test). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val sf = "/root/testdata/sf0.001"
    args.foreach { name =>
      val df = (graft.queries.ATier.queries ++ graft.queries.BTier.queries ++
        graft.queries.Extensions.queries)(name)(spark, sf)
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
