package graft.examples

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Isolated maintenance-op pricing (round 16, verdict #7): the d26/d27
  * decade rows are COMPOSITE gates (build + one-shot verify + appends +
  * fold/rewrite), so the maintenance op's OWN slope was only inferred.
  * This bench builds the LSH segment store fresh per iteration
  * (untimed), then times `compactSegmentStore` alone and — on a second
  * fresh store — `removeFromLshIndex` alone, printing one JSON line per
  * scale point in the Bench contract shape.
  *
  * Run per scale dir (anchors come from a Bench subset run on the same
  * host window):
  * {{{
  *   SPARK_DRIVER_MEM=48g sbt -batch \
  *     "runMain graft.examples.FoldBench target/sf10"
  * }}}
  */
object FoldBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "target/qtmp/foldbench_idx"

    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    // the d26/d27 store shape: base = 3/4 of the corpus, two appends
    def build(): Unit = {
      rm(new java.io.File(dir))
      val docs = Tables.documents(spark, sfDir)
      graft.dedup.Dedup.buildLshIndex(
        docs.filter(col("doc_id") % 4 =!= 0), "doc_id", "text", dir)
      graft.dedup.Dedup.appendToLshIndex(spark, dir,
        docs.filter(col("doc_id") % 8 === 0), "doc_id", "text", "b1")
      graft.dedup.Dedup.appendToLshIndex(spark, dir,
        docs.filter(col("doc_id") % 8 === 4), "doc_id", "text", "b2")
      ()
    }
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val folds = (1 to iters).map { _ =>
      build()
      timed(graft.operators.SegmentStore
        .compactSegmentStore(spark, dir, upTo = "b2"))
    }
    val removes = (1 to iters).map { _ =>
      build()
      val ids = Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 8 === 1).select(col("doc_id"))
      timed(graft.dedup.Dedup.removeFromLshIndex(spark, dir, ids))
    }
    rm(new java.io.File(dir))
    def fmt(v: Double): String =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val line = s"""{"metric":"fold_only","value":${fmt(folds.min)},"unit":"sec","queries":{"fold_only":${fmt(folds.min)},"takedown_only":${fmt(removes.min)}},"iters":$iters,"sf":"$sfDir"}"""
    println(line)
    spark.stop()
    println(line)
  }
}
