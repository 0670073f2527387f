package graft.examples

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch profiler for the round-16 optimization pass: times labeled
  * sub-plans of the heaviest sf0.1 headline rows so each change targets
  * the measured stage. Not part of the driver contract. */
object ProfileR16 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sections = if (args.isEmpty) Set("all") else args.toSet
    def on(s: String) = sections("all") || sections(s)

    def time(label: String)(df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      spark.catalog.clearCache()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(f"PROFILE $label ${times.min}%.3f s")
    }

    val docs = Tables.documents(spark, sf)

    if (on("d12")) {
      import graft.dedup.Dedup
      // d12 sub-stages
      val toks = docs.select(col("doc_id").as("id"), split(col("text"), " ").as("t"))
      val k = 8
      val grams0 = toks.select(col("id"),
        explode(when(size(col("t")) >= k,
          transform(sequence(lit(0), size(col("t")) - k),
            i => struct(i.as("pos"),
              concat_ws(" ", slice(col("t"), i + 1, lit(k))).as("gram"))))
          .otherwise(array())).as("pg"))
        .select(col("id"), col("pg.pos").as("pos"), col("pg.gram").as("gram"))
      val grams = grams0.withColumn("gram", xxhash64(col("gram")))
      time("d12_gramgen_only")(grams)
      val dupGrams = grams.groupBy(col("gram")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select(col("gram"))
      time("d12_dupgram_agg")(dupGrams)
      val dup = grams.join(dupGrams, Seq("gram"), "left_semi")
      time("d12_semijoin")(dup)
      time("d12_full")(SparkEntry.queries("d12_dup_spans")(spark, sf))
      time("d18_full")(SparkEntry.queries("d18_span_removal")(spark, sf))
    }

    if (on("t22")) {
      def key(c: org.apache.spark.sql.Column) = xxhash64(c)
      val toksT = docs.select(explode(split(col("text"), " ")).as("tok0"))
      time("t22_tok_explode")(toksT)
      time("t22_cu")(toksT.select(key(col("tok0")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cu")))
      time("t22_nv_current")(toksT.agg(count(lit(1)).as("n_tok"),
        countDistinct(key(col("tok0"))).as("v")))
      time("t11_full")(SparkEntry.queries("t11_lm_score")(spark, sf))
      time("t22_full")(SparkEntry.queries("t22_trigram_lm")(spark, sf))
    }

    if (on("t19")) {
      time("t19_full")(SparkEntry.queries("t19_ccnet_buckets")(spark, sf))
      time("t19b_full")(SparkEntry.queries("t19b_ccnet_buckets_scalable")(spark, sf))
    }

    if (on("q40")) {
      time("q40_perord_stage")(Tables.lineitem(spark, sf)
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(count(when(col("l_returnflag") === "R", 1)).as("n_fault_rows")))
      time("q40_full")(SparkEntry.queries("q40_tpch_q21_agg")(spark, sf))
      time("q38_full")(SparkEntry.queries("q38_tpch_q21")(spark, sf))
    }

    if (on("c03")) {
      time("c03_events_scan")(Tables.events(spark, sf).select(col("user_id"), col("value")))
      val ev = Tables.events(spark, sf)
      time("c03_ewma_all_rows")(graft.operators.Analytics.ewmaWindowed(ev,
        Seq("user_id"), Seq("ts", "event_id"), "value", alpha = 0.3, win = 20,
        quantized = true))
      time("c03_full")(SparkEntry.queries("c03_ewma")(spark, sf))
    }

    if (on("d21")) {
      import graft.dedup.Dedup
      val sh = docs.select(col("doc_id").as("doc_id"),
        Dedup.wordShingles(col("text"), 3).as("sh"))
      val expl = sh.select(col("doc_id"), explode(col("sh")).as("g0"))
      val inv0 = expl.select(col("doc_id"), xxhash64(col("g0")).as("g"))
      time("d21_inv0")(inv0)
      val hot = inv0.groupBy(col("g")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 50).select("g")
      val inv = inv0.join(hot, Seq("g"), "left_anti")
      time("d21_inv_antijoin")(inv)
      val pairs = inv.select(col("g"), col("doc_id").as("a"))
        .join(inv.select(col("g"), col("doc_id").as("b")), "g")
        .filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
      time("d21_pairs_agg")(pairs)
      time("d21_full")(SparkEntry.queries("d21_containment")(spark, sf))
    }

    if (on("p01")) {
      time("t31_full")(SparkEntry.queries("t31_html_extract")(spark, sf))
      time("p01_full")(SparkEntry.queries("p01_curation_pipeline")(spark, sf))
    }

    if (on("t20")) {
      time("t20_full")(SparkEntry.queries("t20_dsir")(spark, sf))
    }

    if (on("d24")) {
      time("d24_full")(SparkEntry.queries("d24_bloom_shuffle_confirm")(spark, sf))
      time("d09_full")(SparkEntry.queries("d09_bloom_decontaminate")(spark, sf))
    }

    if (on("g01")) {
      time("g01_full")(SparkEntry.queries("g01_pagerank")(spark, sf))
    }

    time("anchor_q01")(SparkEntry.queries("q01_tpch_agg")(spark, sf))
    spark.stop()
  }
}
