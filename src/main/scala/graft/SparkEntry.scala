package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the operator packs (one entry per implemented
  * operator from SURVEY.md §2); `oracleSql` carries the DuckDB-equivalent
  * SQL for every query that is ANSI-expressible. Column names are aliased
  * identically on both sides (driver hash-compares by sorted column name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Shape: the reference's cloudfront workshop query (README.md:111-121) —
    * scan → filter → map → group → top-n by aggregate.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.lineitem(spark, d)
      .filter(col("l_quantity") > 0)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("n").desc, col("l_partkey"))
      .limit(100)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.operators.CoreQueries.queries ++
      graft.operators.SketchQueries.queries ++
      graft.operators.PipelineQueries.queries ++
      graft.operators.SourceQueries.queries ++
      graft.operators.CurationQueries.queries ++
      graft.operators.AnalyticsQueries.queries

  def oracleSql: Map[String, String] =
    graft.operators.CoreQueries.oracles ++
      graft.operators.SketchQueries.oracles ++
      graft.operators.PipelineQueries.oracles ++
      graft.operators.SourceQueries.oracles ++
      graft.operators.CurationQueries.oracles ++
      graft.operators.AnalyticsQueries.oracles
}
