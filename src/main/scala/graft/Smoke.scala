package graft

/** Local smoke runner mirroring the driver's t1 check: entry() on sf0.001
  * must return rows > 0. Optionally runs one named query from args. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val e = SparkEntry.entry(spark)
    val n = e.count()
    println(s"SMOKE entry rows=$n schema=${e.schema.map(_.name).mkString(",")}")
    require(n > 0, "entry() returned no rows")
    args.headOption.foreach { q =>
      val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
      val df = SparkEntry.queries(q)(spark, sf)
      df.show(5, truncate = false)
      println(s"SMOKE $q rows=${df.count()}")
      if (args.length > 2)
        df.coalesce(1).write.mode("overwrite").parquet(args(2))
    }
    spark.stop()
  }
}
