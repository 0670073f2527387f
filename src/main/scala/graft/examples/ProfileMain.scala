package graft.examples

import graft.{GraftSession, SparkEntry, Tables}
import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiler: times labeled sub-plans of the heavy pipeline
  * queries so optimization targets the measured stage, not a guess.
  * Not part of the driver contract. */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROFILE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val docs = Tables.documents(spark, sf)
    time("docs_scan")(docs.select(col("doc_id")))
    time("docs_text_scan")(docs.select(col("text")))
    time("quality_only")(docs.select(TextFunctions.qualityScore(col("text")).as("q")))
    time("tokencount_only")(docs.select(TextFunctions.tokenCount(col("text")).as("n")))
    time("stopword_only")(docs.select(TextFunctions.stopwordRatio(col("text")).as("r")))
    time("punct_only")(docs.select(TextFunctions.punctRatio(col("text")).as("p")))
    time("md5_window")({
      import org.apache.spark.sql.expressions.Window
      docs.select(col("doc_id"), col("text"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
        .filter(col("rk") === 1).select(col("doc_id"))
    })
    time("p01_full")(SparkEntry.queries("p01_curation_pipeline")(spark, sf))

    val d = Tables.documents(spark, sf)
    val sh = d.select(col("doc_id").as("id"),
      graft.dedup.Dedup.wordShingles(col("text"), 3).as("sh"))
    time("d02_shingles")(sh)
    time("d02_bands")(sh.select(col("id"),
      graft.plans.MinHashBandsExpression.minhashBands(col("sh"), 64, 16).as("bh")))
    time("d02_full")(SparkEntry.queries("d02_minhash_lsh")(spark, sf))

    // scale probe: 10x self-union (shifted ids) — near-dup structure per
    // copy is preserved, and every doc gains 9 exact twins, so candidate
    // volume stresses the LSH bucket join ~100x. A superlinear cliff
    // here means hot buckets; ~linear-ish growth means the bucket join
    // holds.
    if (args.length > 1 && args(1) == "scale10") {
      val docs10 = (0 until 10).map(i =>
        docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
        .reduce(_ unionAll _)
      println(s"PROFILE docs10 rows=${docs10.count()}")
      time("d02_scale10")(
        graft.dedup.Dedup.minhashLshPairs(docs10, "doc_id", "text",
          shingleN = 3, k = 64, bands = 16, threshold = 0.8))
    }
    spark.stop()
  }
}
