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

    // range-join rule: a plain SQL BETWEEN join, lowered from nested-loop
    // to a bucketed equi-join once the width hint is set
    events.createOrReplaceTempView("ex_events")
    events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("hi"))
      .limit(20).createOrReplaceTempView("ex_windows")
    val sql = """SELECT count(*) AS n FROM ex_events e JOIN ex_windows w
                 ON e.ts BETWEEN w.lo AND w.hi"""
    spark.conf.set(graft.plans.RangeJoinRule.WidthKey, "3600")
    val rj = spark.sql(sql)
    println(s"SCALE range-join rows=${rj.head().getLong(0)} " +
      s"nestedLoopFree=${!rj.queryExecution.executedPlan.toString.contains("NestedLoop")}")
    spark.conf.unset(graft.plans.RangeJoinRule.WidthKey)

    // compaction: 40 small files -> byte-sized outputs, narrow rewrite
    val tmp = java.nio.file.Files.createTempDirectory("ex_compact").toString
    Tables.lineitem(spark, sfDir).repartition(40)
      .write.mode("overwrite").parquet(s"$tmp/in")
    val stats = graft.operators.Maintenance.compactParquet(
      spark, s"$tmp/in", s"$tmp/out", targetFileMB = 128)
    println(s"SCALE compaction ${stats.inputFiles} files " +
      s"(${stats.inputBytes / 1024}KiB) -> ${stats.outputFiles} files, " +
      s"rows=${stats.rows}")
    spark.stop()
  }
}
