package graft.examples
/** Scratch: print executed plans of named gate queries for audit. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    args(0).split(",").foreach { q =>
      println(s"======== $q")
      println(graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString.take(3500))
    }
    spark.stop()
  }
}
