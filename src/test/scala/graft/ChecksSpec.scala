package graft

import graft.operators.Checks
import graft.operators.Checks._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-quality checks: exact violation counts on known-dirty data, and
  * the one-pass plan claim (N checks = one scan + one aggregation). */
class ChecksSpec extends AnyFunSuite with CacheHygiene {

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  import spark.implicits._

  test("violation counts are exact on known-dirty data") {
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "ok"),
      (2L, -5.0, "ok"),      // range violation
      (null, 20.0, "ok"),    // null violation
      (4L, 999.0, "bad"),    // range + set violation
      (4L, 30.0, "ok"))      // duplicate key
      .toDF("k", "v", "s")
    val got = Checks.run(df,
        Seq(notNull("k"), inRange("v", 0.0, 100.0), inSet("s", Seq("ok"))),
        uniqueKeys = Seq("k"))
      .orderBy("check")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("k_not_null", 1L, 5L),
      // countDistinct ignores NULL (as does the SQL oracle), so the null
      // key counts toward the uniqueness tally: 5 rows - 3 distinct = 2.
      // Pair with notNull(k) to attribute the null separately.
      ("k_unique", 2L, 5L),
      ("s_in_set", 1L, 5L),
      ("v_in_range", 2L, 5L)))
  }

  test("N checks compile to one scan and one aggregation") {
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
    val checked = Checks.run(df, Seq(
      notNull("o_custkey"), inRange("o_totalprice", 0, 1e9),
      inSet("o_orderstatus", Seq("F", "O", "P")),
      matches("o_orderpriority", "^[0-9]-[A-Z ]+$"),
      maxLength("o_orderpriority", 20)), uniqueKeys = Seq("o_orderkey"))
    val plan = checked.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"expected exactly one scan:\n$plan")
    // partial + final of ONE aggregate (distinct adds its expand stage,
    // but no second scan and no join)
    assert(!plan.contains("Join"), s"checks must not join:\n$plan")
    assert(checked.count() == 6)
  }

  test("unique check counts duplicate keys, not duplicate rows") {
    val df = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "s")
    val got = Checks.run(df, Nil, uniqueKeys = Seq("k"))
      .as[(String, Long, Long)].collect().head
    assert(got == ("k_unique", 1L, 3L))
  }

  test("attrition funnel: cumulative chain on known data, one scan") {
    val df = Seq((1, "en"), (2, "en"), (3, "de"), (4, "en"), (5, "de"))
      .toDF("n", "lang")
    val funnel = Checks.attritionFunnel(df, Seq(
      "le4" -> (col("n") <= 4),
      "english" -> (col("lang") === "en"),
      "even" -> (col("n") % 2 === 0)))
    val rows = funnel.as[(Long, String, Long, Long)].collect().toSeq
    assert(rows == Seq(
      (1L, "le4", 5L, 4L),       // n<=4 keeps 1,2,3,4
      (2L, "english", 4L, 3L),   // of those, en keeps 1,2,4
      (3L, "even", 3L, 2L)))     // of those, even keeps 2,4
    // n_in chains from the previous stage's n_kept; survival is monotone
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 == a._4 && b._4 <= b._3)
    }
    val plan = funnel.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"funnel must not join:\n$plan")
  }

  test("attrition funnel: null predicate values count as dropped") {
    val df = Seq[(java.lang.Long, String)]((1L, "en"), (null, "en"), (3L, null))
      .toDF("n", "lang")
    val rows = Checks.attritionFunnel(df, Seq(
      "has_n" -> (col("n") > 0),          // null n -> null predicate
      "english" -> (col("lang") === "en")))
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, "has_n", 3L, 2L), (2L, "english", 2L, 1L)))
  }

  test("bootstrapMeanCI: deterministic, ordered bounds, constant collapses") {
    val df = (1 to 400).map(i =>
      (if (i % 2 == 0) "a" else "b", i.toLong,
        if (i % 2 == 0) (i % 50).toLong + 10 else 7L))
      .toDF("src", "id", "v")
    def run(parts: Int) = Checks.bootstrapMeanCI(df.repartition(parts),
        "src", "id", "v", replicas = 40)
      .as[(String, Long, Double, Double, Double)].collect()
      .sortBy(_._1).toSeq
    val got = run(3)
    // determinism incl. partitioning
    assert(got == run(11))
    val a = got.find(_._1 == "a").get
    assert(a._2 == 200L)
    assert(a._4 <= a._3 + 1e-9 && a._3 <= a._5 + 1e-9,
      s"CI [${a._4}, ${a._5}] must bracket mean ${a._3}")
    assert(a._5 - a._4 > 0, "varying data must give a nonzero-width CI")
    // constant column: every replica mean == the constant -> degenerate CI
    val b = got.find(_._1 == "b").get
    assert(b._3 == 7.0 && b._4 == 7.0 && b._5 == 7.0)
  }

  test("bootstrapMeanCI: Poisson(1) weights average to ~1 per replica slot") {
    val df = (1 to 500).map(i => ("g", i.toLong, 1L)).toDF("src", "id", "v")
    // with v=1, each replica mean is sum(w)/sum(w)=1; instead check the
    // point-vs-CI relation on real weights via a skewed value column
    val skew = (1 to 500).map(i => ("g", i.toLong, (i % 100).toLong))
      .toDF("src", "id", "v")
    val r = Checks.bootstrapMeanCI(skew, "src", "id", "v", replicas = 40)
      .as[(String, Long, Double, Double, Double)].head()
    // CLT sanity: sd of a replica mean ≈ sqrt(2)*sd(v)/sqrt(n) ≈ 1.8;
    // the 95% CI half-width should be within a loose [1, 10] band
    val half = (r._5 - r._4) / 2
    assert(half > 1.0 && half < 10.0, s"unreasonable CI half-width $half")
    assert(Checks.bootstrapMeanCI(df, "src", "id", "v").count() == 1)
  }

  test("benfordProfile: digit extraction, exclusions, conformity contrast") {
    import spark.implicits._
    // digit comes from cents: 123.45 -> 12345 -> '1'; 0.07 -> 7 -> '7';
    // zero and negatives are excluded
    val hand = Seq(123.45, 0.07, 900.0, 0.0, -5.0).toDF("v")
    val prof = Checks.benfordProfile(hand, "v").collect()
    assert(prof.map(r => (r.getInt(0), r.getLong(1))).toSeq ==
      Seq((1, 1L), (7, 1L), (9, 1L)))
    assert(prof.map(_.getDouble(3)).sameElements(
      Array(0.301, 0.058, 0.0458)), "Benford expectations at 4dp")
    // log-uniform magnitudes conform: chi2 total small; uniform values
    // (all same magnitude) concentrate digits and blow chi2 up
    val n = 20000
    val logu = spark.range(0, n)
      .selectExpr("exp(ln(10.0) * 4.0 * (CAST(conv(substr(md5(CAST(id AS STRING)), 1, 12), 16, 10) AS DOUBLE) / 281474976710656.0)) AS v")
    val chiConform = Checks.benfordProfile(logu, "v")
      .agg(org.apache.spark.sql.functions.sum("chi2_part")).head().getDouble(0)
    val uni = spark.range(0, n).selectExpr("1000.0 + CAST(id AS DOUBLE) / 100 AS v")
    val chiUniform = Checks.benfordProfile(uni, "v")
      .agg(org.apache.spark.sql.functions.sum("chi2_part")).head().getDouble(0)
    // chi2 with 8 dof: conforming ~O(10); the concentrated feed is
    // thousands of times larger
    assert(chiConform < 40.0, s"log-uniform chi2=$chiConform should conform")
    assert(chiUniform > 100 * chiConform,
      s"uniform chi2=$chiUniform vs conforming $chiConform")
  }
}
