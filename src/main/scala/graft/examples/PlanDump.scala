package graft.examples

import java.nio.file.{Files, Paths}

/** Scratch: dump `.explain("formatted")` of named gate queries to files
  * (plans/r16/<query>_<tag>.txt) — the optimization-round evidence trail.
  * Usage: runMain graft.examples.PlanDump <q1,q2,...> <tag> [sfDir] [outDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val qs = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val tag = if (args.length > 1) args(1) else "before"
    val d = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val out = if (args.length > 3) args(3) else "plans/r16"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(out))
    qs.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, d)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$out/${q}_$tag.txt"), txt)
      val nEx = "Exchange".r.findAllIn(txt).size
      println(s"[plandump] $q -> $out/${q}_$tag.txt (Exchange nodes: $nEx)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
