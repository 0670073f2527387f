package graft.examples

import graft.{GraftSession, Tables}
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Measures the bloom-decontamination confirm-join crossover: the SAME
  * oversized (doc_id % 2) benchmark set confirmed via broadcast vs via
  * the shuffle_hash regime, min-of-3 after warmup — the BASELINE.md d24
  * row. Usage: `runMain graft.examples.BloomRegimeBench <sfDir>`.
  */
object BloomRegimeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(confirm: String): Unit = {
      val docs = Tables.documents(spark, sfDir)
      val (out, h) = Dedup.bloomDecontaminate(
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id",
        docs.filter(col("doc_id") % 2 === 0), "text",
        n = 8, numBits = 1L << 21, confirm = confirm)
      out.write.format("noop").mode("overwrite").save()
      h.unpersist()
      spark.catalog.clearCache()
    }
    Seq("broadcast", "shuffle").foreach { c =>
      run(c) // warmup
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run(c); (System.nanoTime() - t0) / 1e9
      }
      println(f"BLOOMREGIME $c%-10s min=${times.min}%.3f s sf=$sfDir")
    }
    spark.stop()
  }
}
