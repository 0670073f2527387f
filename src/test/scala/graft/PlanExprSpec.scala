package graft

import graft.dedup.Dedup
import graft.plans.SimHash64Expression
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom Catalyst Expression checks: interpreted vs codegen parity, SQL
  * registration, null handling. */
class PlanExprSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  import spark.implicits._

  test("simhash64 expression equals the Scala reference implementation") {
    val texts = Seq(
      "the quick brown fox", "the quick brown fox", "a b c d e f g",
      "identical tokens identical tokens", "")
    val got = texts.toDF("t").select(Dedup.simhash(col("t"))).collect().map(_.getLong(0))
    val want = texts.map(t => Dedup.simhash64(t.split(" ").toSeq))
    assert(got.toSeq == want)
  }

  test("simhash64 runs inside whole-stage codegen (doGenCode path)") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      SimHash64Expression.register(spark)
      val df = spark.range(0, 1000)
        .selectExpr("simhash64(split(concat('tok', id % 50, ' tok', id % 7), ' ')) AS h")
      val cg = df.queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
      val n = "Found (\\d+) WholeStageCodegen".r.findFirstMatchIn(cg).map(_.group(1).toInt)
      assert(n.exists(_ >= 1), s"expression fell back to interpreted:\n${cg.take(300)}")
      // and the codegen'd result equals the interpreted eval
      val fromCodegen = df.collect().map(_.getLong(0))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interpreted = df.collect().map(_.getLong(0))
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      assert(fromCodegen.sameElements(interpreted))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("simhash64 via SQL after registration; null array -> null") {
    SimHash64Expression.register(spark)
    val r = spark.sql(
      "SELECT simhash64(split('a b c', ' ')), simhash64(CAST(NULL AS ARRAY<STRING>))").head()
    assert(!r.isNullAt(0))
    assert(r.isNullAt(1))
  }
}
