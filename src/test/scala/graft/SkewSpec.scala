package graft

import graft.operators.Skew
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite with CacheHygiene {

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  import spark.implicits._

  test("saltedJoin equals plain join under extreme key skew") {
    // 90% of fact rows share one key
    val fact = (0 until 20000).map(i =>
      (i.toLong, if (i % 10 != 0) "hot" else s"k${i % 97}", i * 1.5))
      .toDF("row_id", "k", "v")
    val dim = (Seq("hot") ++ (0 until 97).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"name$i") }.toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).agg(
      count(lit(1)), sum(col("v")), countDistinct(col("name"))).head()
    val salted = Skew.saltedJoin(fact, dim, "k", "row_id", 8).agg(
      count(lit(1)), sum(col("v")), countDistinct(col("name"))).head()
    assert(plain == salted)
    // salt actually spreads the hot key over multiple sub-keys
    val spread = fact.withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8)))
      .filter(col("k") === "hot").select(countDistinct(col("__salt"))).head().getLong(0)
    assert(spread == 8L, s"hot key only spread over $spread salts")
  }

  test("saltedJoin works when dim derives from the same lineage (self-join)") {
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val dim = events.select(col("user_id")).distinct()
      .withColumn("segment", pmod(col("user_id"), lit(5)))
    val got = Skew.saltedJoin(events, dim, "user_id", "event_id", 8)
      .agg(count(lit(1))).head().getLong(0)
    assert(got == events.count(), s"salted self-lineage join lost rows: $got")
  }

  test("saltedJoin preserves left-outer semantics") {
    val fact = Seq((1L, "a", 1.0), (2L, "zzz", 2.0)).toDF("row_id", "k", "v")
    val dim = Seq(("a", "x")).toDF("k", "name")
    val got = Skew.saltedJoin(fact, dim, "k", "row_id", 4, "left_outer")
      .select("k", "name").as[(String, Option[String])].collect().toSet
    assert(got == Set(("a", Some("x")), ("zzz", None)))
  }

  test("AQE splits a skewed SMJ partition at runtime (skew=true in final plan)") {
    // GraftSession ships skewJoin.enabled=true as the first line of defense
    // (Skew.scala's Scaladoc) — prove the runtime re-plan actually fires,
    // not just that the conf is set. Scratch session: thresholds lowered so
    // a ~MB hot partition counts as skewed at test scale, broadcasts off so
    // the join stays an SMJ (AQE can only skew-split shuffle joins).
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    import s.implicits._
    val fact = (0 until 60000).map(i =>
      (i.toLong, if (i % 20 != 0) "hot" else s"k${i % 97}",
        s"padpadpadpadpadpadpadpad$i")).toDF("row_id", "k", "v")
    val dim = (Seq("hot") ++ (0 until 97).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, s"name$i") }.toDF("k", "name")
    val joined = fact.join(dim, Seq("k"))
    // execute THIS queryExecution (count() would plan its own) so the
    // adaptive plan finalizes before inspection
    assert(joined.collect().length == 60000)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"),
      s"AQE did not split the hot partition — no skew=true in final plan:\n$p")
  }
}
