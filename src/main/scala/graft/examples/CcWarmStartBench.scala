package graft.examples

import java.util.concurrent.atomic.AtomicLong

import graft.GraftSession
import graft.dedup.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Measures the CC dispatch ladder on dup graphs that defeat the
  * min-label probe (the p25 shape — MANY chain-shaped clusters whose
  * diameter exceeds the probe budget but not by orders of magnitude):
  *
  *  - round-14 FAST PATH (`auto` default): the pre-probe census sees a
  *    sparse pair table, collects it, and closes CC with driver-side
  *    union-find — one count + one collect, no scheduled rounds at all
  *    (measured: 5 jobs / 0.41 s vs 123 / 8.0 s for the loop);
  *  - round-13 WARM START (`fastPathMaxEdges = 0`): a failed probe
  *    contracts the pair table through its partial labels before star
  *    contraction instead of restarting cold — a k-round probe shrinks
  *    quotient diameters k-fold, saving ~log2(k) star alternations;
  *  - cold logD and the old probe-then-cold-restart path as context.
  *
  * Reports Spark JOB counts (the driver-paced-scheduling currency the
  * p25 audit identified as the long pole) and min-of-3 wall-clock.
  * Usage: `runMain graft.examples.CcWarmStartBench [nChains] [hops]`.
  */
object CcWarmStartBench {
  def main(args: Array[String]): Unit = {
    val nChains = if (args.length > 0) args(0).toLong else 640L
    val hops = if (args.length > 1) args(1).toLong else 31L
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // window-2 chains: cluster c occupies ids [c*1000, c*1000+hops],
    // diameter ~hops/2 — the quantized-fingerprint dup-graph shape that
    // made p25's hard-wired min-label fail at sf0.1
    val pairs = spark.range(0L, nChains * hops)
      .select(((col("id") / hops).cast("long") * 1000 +
        col("id") % hops).as("a"))
      .select(col("a"), (col("a") + 1).as("b"))
      .union(spark.range(0L, nChains * (hops - 1))
        .select(((col("id") / (hops - 1)).cast("long") * 1000 +
          col("id") % (hops - 1)).as("a"))
        .select(col("a"), (col("a") + 2).as("b")))
      .localCheckpoint()

    val jobs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def minOf3(name: String, f: () => Unit): Unit = {
      f() // warmup
      val runs = (1 to 3).map { _ =>
        val j0 = jobs.get(); val t0 = System.nanoTime()
        f()
        ((System.nanoTime() - t0) / 1e9, jobs.get() - j0)
      }
      val best = runs.minBy(_._1)
      println(f"${name}%-22s jobs=${best._2}%3d  sec=${best._1}%.2f")
    }
    minOf3("auto (fast path)", () =>
      Dedup.duplicateClustersAuto(pairs, maxIters = 40, probeIters = 8)
        .write.format("noop").mode("overwrite").save())
    minOf3("auto warm, no fastpath", () =>
      Dedup.duplicateClustersAuto(pairs, maxIters = 40, probeIters = 8,
          fastPathMaxEdges = 0L)
        .write.format("noop").mode("overwrite").save())
    minOf3("logd (cold)", () =>
      Dedup.duplicateClustersLogD(pairs, maxIters = 40)
        .write.format("noop").mode("overwrite").save())
    minOf3("old: probe+cold logd", { () =>
      // catch ONLY the dedicated budget signal: a genuine Spark failure
      // (stopped context, checkpoint error) must propagate, not be
      // misreported as a clean probe-then-restart measurement
      try { Dedup.duplicateClusters(pairs, maxIters = 8); () }
      catch { case _: Dedup.CcBudgetExceeded => }
      Dedup.duplicateClustersLogD(pairs, maxIters = 40)
        .write.format("noop").mode("overwrite").save()
    })
    spark.stop()
  }
}
