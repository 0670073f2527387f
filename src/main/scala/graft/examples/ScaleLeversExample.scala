package graft.examples

import graft.{GraftSession, Tables}
import graft.operators.{Bucketing, Skew}
import org.apache.spark.sql.functions._

/** Demonstrates the two explicit skew/shuffle levers on real tables:
  * salted join under a hot key, and bucketed co-located join (zero
  * shuffle). Run: sbt "runMain graft.examples.ScaleLeversExample [sfDir]"
  */
object ScaleLeversExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.builder()
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // salted join: events (hot user) x small user dim
    val events = Tables.events(spark, sfDir)
    val dim = events.select(col("user_id")).distinct()
      .withColumn("segment", pmod(col("user_id"), lit(5)))
    val salted = Skew.saltedJoin(events, dim, "user_id", "event_id", 8)
      .groupBy(col("segment")).agg(count(lit(1)).as("n"))
      .orderBy(col("segment"))
    println("SCALE salted-join:")
    salted.show()

    // bucketed join: zero-exchange plan
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir).select(col("l_orderkey").as("orderkey"), col("l_quantity")),
      "ex_li", "orderkey", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir).select(col("o_orderkey").as("orderkey"), col("o_totalprice")),
      "ex_ord", "orderkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = Bucketing.bucketedJoin(spark, "ex_li", "ex_ord", "orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    println(s"SCALE bucketed-join rows=${joined.count()} " +
      s"shuffleFree=${!plan.contains("Exchange")}")
    spark.sql("DROP TABLE IF EXISTS ex_li")
    spark.sql("DROP TABLE IF EXISTS ex_ord")
    spark.stop()
  }
}
