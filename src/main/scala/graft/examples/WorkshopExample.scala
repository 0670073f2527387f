package graft.examples

import graft.GraftSession
import graft.operators.GraftStream

/** The reference's workshop query (README.md:111-121) re-expressed on the
  * façade: scan parquet → map to (key, value) → most_distinct top-k —
  * exercising source, typed map, sketch Aggregator, and partial+final
  * merge in one query. Run:
  *   sbt "runMain graft.examples.WorkshopExample [sfDir]"
  */
object WorkshopExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get()
    import spark.implicits._

    // dynamic read, downcast to a typed stream (gradual typing)
    val orders = GraftStream
      .dynamicParquet(spark, s"$sfDir/orders.parquet")
      .select(org.apache.spark.sql.functions.col("o_orderpriority"),
        org.apache.spark.sql.functions.col("o_custkey"))
      .downcast[(String, Long)]

    // "which priorities have the most distinct customers?"
    val topByDistinct = orders
      .filter(_._2 > 0)
      .mostDistinct(5, 0.99, 0.002, 0.0808)(_._1, _._2)
    println("EXAMPLE most_distinct: " + topByDistinct.mkString(", "))

    // one-pass fork: count + mean of order count per priority via histogram
    val hist = orders.map(_._1).histogram()
    println("EXAMPLE histogram: " + hist.mkString(", "))

    require(topByDistinct.nonEmpty && hist.nonEmpty)
    spark.stop()
  }
}
