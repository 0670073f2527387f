package graft.examples

import java.nio.file.{Files, Paths}

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions
import graft.operators.{PipelineQueries, SortStage}
import org.apache.spark.sql.functions._

/** Scratch (r17): dump `.explain("formatted")` of the PRE-r17 query
  * forms — reconstructed from the code paths the r17 rewrites keep
  * around (htmlExtractRegex, mapSidePairs=false) — as the `_before`
  * halves of the plans/r17 evidence. The `_after` halves come from
  * graft.examples.PlanDump over the live queries. */
object PlanDumpOldForms {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "plans/r17"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(out))
    import org.apache.spark.sql.expressions.Window

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$out/${name}_before.txt"), txt)
      println(s"[plandump-old] $name -> $out/${name}_before.txt " +
        s"(Exchange nodes: ${"Exchange".r.findAllIn(txt).size})")
      spark.catalog.clearCache()
    }

    // t31 pre-r17: regex-battery extraction, same sort staging
    dump("t31_html_extract", {
      val content = TextFunctions.htmlExtractRegex(col("html"))
      SortStage.orderByStaged(Tables.documents(spark, d)
        .select(col("doc_id"), PipelineQueries.stagedHtml.as("html"))
        .select(col("doc_id"), content.as("content"))
        .select(col("doc_id"),
          when(col("content") === "", lit(0L))
            .otherwise(size(split(col("content"), "\n")).cast("long"))
            .as("n_kept"),
          length(col("content")).cast("long").as("content_len"),
          md5(col("content")).as("content_digest")),
        col("doc_id"))
    })

    // p01 pre-r17: regex-battery extraction feeding the curation chain
    dump("p01_curation_pipeline", {
      val docs = Tables.documents(spark, d)
      val extracted = docs
        .select(col("doc_id"), col("lang"), PipelineQueries.stagedHtml.as("html"))
        .select(col("doc_id"), col("lang"),
          TextFunctions.htmlExtractRegex(col("html")).as("content"))
        .filter(length(col("content")) > 0)
      val scored = extracted.select(col("doc_id"), col("lang"),
        TextFunctions.qualityScore(col("content")).as("q"),
        TextFunctions.tokenCount(col("content")).as("toks"),
        md5(col("content")).as("digest"))
        .filter(col("q") >= 0.5)
      val deduped = scored
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("digest")).orderBy(col("doc_id"))))
        .filter(col("rk") === 1)
      deduped.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("n_tokens"),
          round(avg(col("q")), 4).as("avg_quality"))
        .orderBy(col("lang"))
    })

    // d21 pre-r17: inverted-index self-join pair stage
    dump("d21_containment",
      graft.dedup.Dedup.containmentPairs(Tables.documents(spark, d),
          "doc_id", "text", shingleN = 3, minContainment = 0.5,
          maxGramDf = 50, hashGrams = true, mapSidePairs = false)
        .withColumn("containment", round(col("containment"), 4))
        .orderBy(col("containment").desc, col("a"), col("b")))

    spark.stop()
  }
}
