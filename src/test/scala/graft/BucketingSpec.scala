package graft

import graft.operators.Bucketing
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located join: correctness + the zero-shuffle plan shape. */
class BucketingSpec extends AnyFunSuite with CacheHygiene {

  // OWN session (shared SparkContext + extensions, isolated conf): this
  // suite toggles AQE/broadcast thresholds, and suites run in parallel —
  // mutating the shared session's conf races other suites' mid-flight
  // plans (observed: it flipped MaintenanceSpec's z-order shuffle layout)
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.newSession()
  }

  test("bucketed fact-fact join has no shuffle exchange and matches plain join") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_extendedprice")
        .withColumnRenamed("l_orderkey", "orderkey"),
      "li_bucketed", "orderkey", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "orderkey"),
      "ord_bucketed", "orderkey", 8)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "ord_bucketed", "orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      // correctness vs the plain (shuffling) join
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2)).head()
      val got = joined
        .agg(count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2)).head()
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
