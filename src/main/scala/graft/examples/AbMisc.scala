package graft.examples

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch A/B: old vs new forms of round-16 optimization targets,
  * alternated in one JVM so host drift hits both arms equally.
  * Not part of the driver contract. */
object AbMisc {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val arms = scala.collection.mutable.LinkedHashMap.empty[String, () => DataFrame]
    val which = if (args.isEmpty) Set("q40") else args.toSet

    if (which("q40")) {
      // OLD q40: two back-to-back fact exchanges
      arms("old_q40") = () => {
        val perOrd = Tables.lineitem(spark, sf)
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(count(when(col("l_returnflag") === "R", 1)).as("n_fault_rows"))
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_supp"),
            sum((col("n_fault_rows") > 0).cast("long")).as("n_fault_supp"),
            max(when(col("n_fault_rows") > 0, col("l_suppkey"))).as("fault_suppkey"),
            max(when(col("n_fault_rows") > 0, col("n_fault_rows"))).as("fault_rows"))
        val o = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"))
        val sup = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_name"))
        perOrd
          .filter(col("n_supp") > 1 && col("n_fault_supp") === 1)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("fault_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(sum(col("fault_rows")).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      }
      arms("new_q40") = () =>
        graft.operators.CoreQueries.q21AggRewrite(spark, sf)
    }

    if (which("c03")) {
      import org.apache.spark.sql.expressions.Window
      arms("old_c03") = () => {
        val ev = Tables.events(spark, sf)
        val smoothed = graft.operators.Analytics.ewmaWindowed(ev, Seq("user_id"),
          Seq("ts", "event_id"), "value", alpha = 0.3, win = 20,
          quantized = true)
        val wAll = Window.partitionBy(col("user_id"))
        val wLast = wAll.orderBy(col("ts").desc, col("event_id").desc)
        smoothed
          .withColumn("n_events", count(lit(1)).over(wAll))
          .withColumn("_rk", row_number().over(wLast))
          .filter(col("_rk") === 1)
          .select(col("user_id"), col("n_events"), col("ewma"))
          .orderBy(col("user_id"))
      }
      arms("new_c03") = () =>
        graft.SparkEntry.queries("c03_ewma")(spark, sf)
    }

    if (which("d12")) {
      import org.apache.spark.sql.expressions.Window
      // OLD duplicateSpans: count-aggregate + semi-join (two gram gens)
      def oldSpans(hash: Boolean): DataFrame = {
        val k = 8
        val docs = Tables.documents(spark, sf)
        val toks = docs.select(col("doc_id").as("id"), split(col("text"), " ").as("t"))
        val grams0 = toks.select(col("id"),
          explode(when(size(col("t")) >= k,
            transform(sequence(lit(0), size(col("t")) - k),
              i => struct(i.as("pos"),
                concat_ws(" ", slice(col("t"), i + 1, lit(k))).as("gram"))))
            .otherwise(array())).as("pg"))
          .select(col("id"), col("pg.pos").as("pos"), col("pg.gram").as("gram"))
        val grams = if (hash) grams0.withColumn("gram", xxhash64(col("gram")))
          else grams0
        val dupGrams = grams.groupBy(col("gram")).agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2).select(col("gram"))
        val dup = grams.join(dupGrams, Seq("gram"), "left_semi")
        val wOrd = Window.partitionBy(col("id")).orderBy(col("pos"))
        val islands = dup
          .withColumn("ni",
            when(col("pos") - lag(col("pos"), 1).over(wOrd) <= k, 0L).otherwise(1L))
          .withColumn("isl", sum(col("ni")).over(wOrd))
        islands.groupBy(col("id"), col("isl"))
          .agg(min(col("pos")).cast("long").as("span_start"),
            (max(col("pos")) + k - 1).cast("long").as("span_end"))
          .select(col("id").as("doc_id"), col("span_start"), col("span_end"))
          .orderBy(col("doc_id"), col("span_start"))
      }
      arms("old_d12") = () => oldSpans(true)
      arms("new_d12") = () => graft.SparkEntry.queries("d12_dup_spans")(spark, sf)
      arms("new_d18") = () => graft.SparkEntry.queries("d18_span_removal")(spark, sf)
    }

    if (which("d21")) {
      // OLD containment pairs: inverted-index self-join
      arms("old_d21") = () => {
        val docs = Tables.documents(spark, sf)
        val sh = docs.select(col("doc_id"),
          graft.dedup.Dedup.wordShingles(col("text"), 3).as("sh"))
        val sizes = sh.select(col("doc_id"), size(col("sh")).as("sz"))
          .filter(col("sz") > 0)
        val expl = sh.select(col("doc_id"), explode(col("sh")).as("g0"))
        val inv0 = expl.select(col("doc_id"), xxhash64(col("g0")).as("g"))
        val hot = inv0.groupBy(col("g")).agg(count(lit(1)).as("df"))
          .filter(col("df") > 50).select("g")
        val inv = inv0.join(hot, Seq("g"), "left_anti")
        inv.select(col("g"), col("doc_id").as("a"))
          .join(inv.select(col("g"), col("doc_id").as("b")), "g")
          .filter(col("a") < col("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
          .join(sizes.select(col("doc_id").as("a"), col("sz").as("n_a")), "a")
          .join(sizes.select(col("doc_id").as("b"), col("sz").as("n_b")), "b")
          .withColumn("containment",
            col("common").cast("double") / least(col("n_a"), col("n_b")))
          .filter(col("containment") >= 0.5)
          .select(col("a"), col("b"), col("common"),
            round(col("containment"), 4).as("containment"))
          .orderBy(col("containment").desc, col("a"), col("b"))
      }
      arms("new_d21") = () => graft.SparkEntry.queries("d21_containment")(spark, sf)
    }

    if (which("d24")) {
      import graft.dedup.Dedup
      // OLD d24 final agg: countDistinct over already-unique (id, h8)
      arms("old_d24") = () => {
        val docs = Tables.documents(spark, sf)
        val bench = docs.filter(col("doc_id") % 2 === 0)
          .select(explode(Dedup.wordShingles(col("text"), 8)).as("g"))
          .select(xxhash64(col("g")).as("h8")).distinct().persist()
        val measured = bench.agg(count(lit(1)),
          graft.functions.BloomFunctions.bloomAgg(col("h8"),
            math.max((1L << 21) / 16L, 1L), 1L << 21).as("bf")).head()
        val bloom = measured.getAs[Array[Byte]](1)
        val pruned = docs.filter(col("doc_id") % 2 =!= 0)
          .select(col("doc_id"), explode(Dedup.wordShingles(col("text"), 8)).as("g"))
          .select(col("doc_id"), xxhash64(col("g")).as("h8"))
          .filter(graft.functions.BloomFunctions.mightContain(bloom, col("h8")))
        pruned.join(bench.hint("shuffle_hash"), "h8")
          .groupBy(col("doc_id"))
          .agg(countDistinct(col("h8")).as("n_overlap"))
          .orderBy(col("doc_id"))
      }
      arms("new_d24") = () =>
        graft.SparkEntry.queries("d24_bloom_shuffle_confirm")(spark, sf)
      arms("new_d09") = () =>
        graft.SparkEntry.queries("d09_bloom_decontaminate")(spark, sf)
      arms("new_d07") = () =>
        graft.SparkEntry.queries("d07_contamination")(spark, sf)
    }

    if (which("t31")) {
      import graft.functions.TextFunctions
      def staged: DataFrame = Tables.documents(spark, sf)
        .select(col("doc_id"),
          graft.operators.PipelineQueries.stagedHtml.as("html"))
      arms("t31_staged_only") = () =>
        staged.select(col("doc_id"), length(col("html")).as("n"))
      arms("t31_extract") = () =>
        staged.select(col("doc_id"),
          length(TextFunctions.htmlExtract(col("html"))).as("n"))
      arms("t31_full") = () =>
        graft.SparkEntry.queries("t31_html_extract")(spark, sf)
      def extracted: DataFrame = staged
        .select(col("doc_id"), TextFunctions.htmlExtract(col("html")).as("content"))
      arms("t31_md5_only") = () =>
        extracted.select(col("doc_id"), md5(col("content")).as("d"))
      arms("t31_nkept_only") = () =>
        extracted.select(col("doc_id"),
          when(col("content") === "", lit(0L))
            .otherwise(size(split(col("content"), "\n")).cast("long")).as("n"))
      arms("t31_all_noorder") = () =>
        extracted.select(col("doc_id"),
          when(col("content") === "", lit(0L))
            .otherwise(size(split(col("content"), "\n")).cast("long")).as("n_kept"),
          length(col("content")).cast("long").as("content_len"),
          md5(col("content")).as("content_digest"))
      def t31out: DataFrame = arms("t31_all_noorder")()
      arms("t31_ckpt_order") = () =>
        t31out.localCheckpoint(eager = false).orderBy(col("doc_id"))
      arms("t31_repart_order") = () =>
        t31out.repartition(col("doc_id")).orderBy(col("doc_id"))
    }

    if (which("d17")) {
      // OLD dropDuplicateParagraphs: count-aggregate + join-back
      arms("old_d17") = () => {
        val nChunks = ((size(col("tk")) + lit(9)) / lit(10)).cast("int")
        val chunked = Tables.documents(spark, sf)
          .select(col("doc_id"), split(col("text"), " ").as("tk"))
          .select(col("doc_id"),
            array_join(transform(sequence(lit(0), nChunks - 1),
              i => array_join(slice(col("tk"), i * lit(10) + lit(1), lit(10)), " ")),
              "\n").as("text"))
        val paras = chunked.select(col("doc_id"),
          posexplode(split(col("text"), java.util.regex.Pattern.quote("\n")))
            .as(Seq("pos", "para")))
        val keyed = paras.withColumn("__k", col("para"))
        val cnt = keyed.groupBy(col("__k")).agg(count(lit(1)).as("__n"))
        val kept = keyed.join(cnt, "__k").filter(col("__n") < 2)
        val rebuilt = kept.groupBy(col("doc_id")).agg(
          count(lit(1)).as("n_kept"),
          array_join(transform(array_sort(collect_list(struct(col("pos"),
            col("para")))), x => x.getField("para")), "\n").as("text_out"))
        chunked.select(col("doc_id")).join(rebuilt, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("text_out"), lit("")).as("text_out"))
          .orderBy(col("doc_id"))
      }
      arms("new_d17") = () =>
        graft.SparkEntry.queries("d17_paragraph_dedup")(spark, sf)
    }

    if (which("t19")) {
      import org.apache.spark.sql.expressions.Window
      // OLD t19: plain orderBy over the window output
      arms("old_t19") = () =>
        graft.operators.LanguageModel.perplexityBuckets(
            Tables.documents(spark, sf), "doc_id", "text", "lang",
            nBuckets = 3, hashTokens = true)
          .select(col("doc_id"), col("lang"), col("ll"),
            when(col("bucket") === 1, "head")
              .when(col("bucket") === 2, "middle")
              .otherwise("tail").as("bucket"))
          .orderBy(col("doc_id"))
      arms("new_t19") = () =>
        graft.SparkEntry.queries("t19_ccnet_buckets")(spark, sf)
      arms("new_t19b") = () =>
        graft.SparkEntry.queries("t19b_ccnet_buckets_scalable")(spark, sf)
      // OLD t19b: HEAD's scalable form — unstaged repartitionByRange +
      // plain final orderBy (copied verbatim minus the r16 staging)
      arms("old_t19b") = () => {
        import spark.implicits._
        val df = Tables.documents(spark, sf)
        val scored = graft.operators.LanguageModel
          .bigramLogLikelihood(df, "doc_id", "text", hashTokens = true)
          .join(df.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .select(col("doc_id").cast("long"), col("lang").cast("string"),
            col("ll").cast("double"))
          .as[(Long, String, Double)]
        val sorted = scored.toDF("__id", "__c", "__ll")
          .repartitionByRange(col("__c"), col("__ll").desc, col("__id"))
          .sortWithinPartitions(col("__c"), col("__ll").desc, col("__id"))
          .as[(Long, String, Double)]
          .persist()
        val census = sorted.rdd.mapPartitionsWithIndex { case (pid, it) =>
          val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
          it.foreach(t => m.update(t._2, m.getOrElse(t._2, 0L) + 1))
          m.iterator.map { case (c, n) => (pid, c, n) }
        }.collect()
        val totals: Map[String, Long] =
          census.groupBy(_._2).map { case (c, rows) => c -> rows.map(_._3).sum }
        val startOffsets: Map[(Int, String), Long] = {
          val m = scala.collection.mutable.HashMap.empty[(Int, String), Long]
          var runningClass: String = null
          var running = 0L
          census.sortBy { case (pid, c, _) => (c, pid) }.foreach { case (pid, c, n) =>
            if (c != runningClass) { runningClass = c; running = 0L }
            m.update((pid, c), running)
            running += n
          }
          m.toMap
        }
        val bTotals = spark.sparkContext.broadcast(totals)
        val bOffsets = spark.sparkContext.broadcast(startOffsets)
        def ntileBucket(rank: Long, cnt: Long, n: Int): Long = {
          val q = cnt / n
          val rem = cnt % n
          val thr = rem * (q + 1)
          if (rank <= thr) (rank - 1) / (q + 1) + 1
          else rem + (rank - 1 - thr) / q + 1
        }
        val out = sorted.mapPartitions { it =>
          var pid = org.apache.spark.TaskContext.getPartitionId()
          val running = scala.collection.mutable.HashMap.empty[String, Long]
          it.map { case (id, c, ll) =>
            val r = running.getOrElse(c, bOffsets.value.getOrElse((pid, c), 0L)) + 1
            running.update(c, r)
            (id, c, ll, ntileBucket(r, bTotals.value(c), 3))
          }
        }.toDF("doc_id", "lang", "ll", "bucket")
        out.select(col("doc_id"), col("lang"), col("ll"),
            when(col("bucket") === 1, "head")
              .when(col("bucket") === 2, "middle")
              .otherwise("tail").as("bucket"))
          .orderBy(col("doc_id"))
      }
    }

    if (which("d22")) {
      import graft.operators.EntityResolution
      arms("old_d22") = () =>
        EntityResolution.fuzzyPairs(Tables.part(spark, sf), "p_partkey",
            "p_name", "p_brand", threshold = 0.9, probeParallelism = 64)
          .filter(col("sim") < 1.0)
          .select(col("a"), col("b"), col("a_name"), col("b_name"),
            round(col("sim"), 4).as("sim"))
          .orderBy(col("sim").desc, col("a"), col("b"))
      arms("new_d22") = () =>
        graft.SparkEntry.queries("d22_entity_resolution")(spark, sf)
      arms("old_d23") = () =>
        EntityResolution.fuzzyPairs(Tables.part(spark, sf), "p_partkey",
            "p_name", "p_brand", threshold = 0.9, saltFactor = 8,
            forceShuffleJoin = true)
          .filter(col("sim") < 1.0)
          .select(col("a"), col("b"), col("a_name"), col("b_name"),
            round(col("sim"), 4).as("sim"))
          .orderBy(col("sim").desc, col("a"), col("b"))
      arms("new_d23") = () =>
        graft.SparkEntry.queries("d23_entity_resolution_smj")(spark, sf)
      arms("old_d21b") = () =>
        graft.dedup.Dedup.containmentPairs(Tables.documents(spark, sf),
            "doc_id", "text", shingleN = 3, minContainment = 0.5,
            maxGramDf = 50, hashGrams = true, mapSidePairs = false)
          .withColumn("containment", round(col("containment"), 4))
          .orderBy(col("containment").desc, col("a"), col("b"))
      arms("new_d21b") = () =>
        graft.SparkEntry.queries("d21_containment")(spark, sf)
    }

    if (which("d21")) {
      // r17: map-side pair emission vs the r16 self-join (r16 verdict #4)
      arms("old_d21") = () =>
        graft.dedup.Dedup.containmentPairs(Tables.documents(spark, sf),
            "doc_id", "text", shingleN = 3, minContainment = 0.5,
            maxGramDf = 50, hashGrams = true, mapSidePairs = false)
          .withColumn("containment", round(col("containment"), 4))
          .orderBy(col("containment").desc, col("a"), col("b"))
      arms("new_d21") = () =>
        graft.SparkEntry.queries("d21_containment")(spark, sf)
    }

    if (which("html")) {
      import graft.functions.TextFunctions
      import graft.operators.{PipelineQueries, SortStage}
      import org.apache.spark.sql.expressions.Window
      // OLD t31/p01: the regex-battery extraction (r16 shape, sort
      // staging kept identical so only the extraction differs)
      arms("old_t31") = () => {
        val content = TextFunctions.htmlExtractRegex(col("html"))
        SortStage.orderByStaged(Tables.documents(spark, sf)
          .select(col("doc_id"), PipelineQueries.stagedHtml.as("html"))
          .select(col("doc_id"), content.as("content"))
          .select(col("doc_id"),
            when(col("content") === "", lit(0L))
              .otherwise(size(split(col("content"), "\n")).cast("long"))
              .as("n_kept"),
            length(col("content")).cast("long").as("content_len"),
            md5(col("content")).as("content_digest")),
          col("doc_id"))
      }
      arms("new_t31") = () =>
        graft.SparkEntry.queries("t31_html_extract")(spark, sf)
      arms("old_p01") = () => {
        val docs = Tables.documents(spark, sf)
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
      }
      arms("new_p01") = () =>
        graft.SparkEntry.queries("p01_curation_pipeline")(spark, sf)
    }

    if (which("htmlx")) {
      // extraction stage ISOLATED: staged html -> extract -> filter -> noop
      import graft.functions.TextFunctions
      import graft.operators.PipelineQueries
      def xtr(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        () => Tables.documents(spark, sf)
          .select(col("doc_id"), col("lang"), PipelineQueries.stagedHtml.as("html"))
          .select(col("doc_id"), col("lang"), f(col("html")).as("content"))
          .filter(length(col("content")) > 0)
      arms("old_xtr") = xtr(c => TextFunctions.htmlExtractRegex(c))
      arms("new_xtr") = xtr(c => TextFunctions.htmlExtract(c))
      // scoring stage ISOLATED on a pre-extracted frame (same for both)
      arms("score_only") = () => {
        val pre = Tables.documents(spark, sf)
          .select(col("doc_id"), col("lang"), PipelineQueries.stagedHtml.as("html"))
          .select(col("doc_id"), col("lang"),
            TextFunctions.htmlExtract(col("html")).as("content"))
          .filter(length(col("content")) > 0)
        pre.select(col("doc_id"), col("lang"),
          TextFunctions.qualityScore(col("content")).as("q"),
          TextFunctions.tokenCount(col("content")).as("toks"),
          md5(col("content")).as("digest"))
          .filter(col("q") >= 0.5)
      }
    }

    if (which("d15")) {
      // r17: broadcast-hinted candidate semi-join vs the unhinted SMJ
      // (which shuffled the corpus by cid) — old form inlined
      import graft.dedup.Dedup
      arms("old_d15") = () => {
        val docs = Tables.documents(spark, sf)
        val bench = docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id").as("bid"), col("text").as("btxt"))
        val corpus = docs.filter(col("doc_id") % 10 =!= 0)
          .select(col("doc_id").as("cid"), col("text").as("ctxt"))
        def banded(src: DataFrame, id: String, txt: String) = src.select(col(id),
          posexplode(graft.plans.MinHashBandsExpression.minhashBands(
            Dedup.wordShingles(col(txt), 3), 64, 16)).as(Seq("band", "h")))
        val cand = banded(corpus, "cid", "ctxt")
          .join(broadcast(banded(bench, "bid", "btxt")), Seq("band", "h"))
          .select(col("cid"), col("bid"))
          .distinct()
        val needed = corpus.join(cand.select(col("cid")), Seq("cid"), "left_semi")
          .select(col("cid"), Dedup.wordShingles(col("ctxt"), 3).as("csh"))
        val bsh = bench.select(col("bid"), Dedup.wordShingles(col("btxt"), 3).as("bsh"))
        cand.join(needed, "cid").join(broadcast(bsh), "bid")
          .select(col("cid"), col("bid"), Dedup.jaccard(col("csh"), col("bsh")).as("jaccard"))
          .filter(col("jaccard") >= 0.8)
          .select(col("cid").as("doc_id"), col("bid").as("bench_id"),
            round(col("jaccard"), 4).as("j"))
          .orderBy(col("doc_id"), col("bench_id"))
      }
      arms("new_d15") = () =>
        graft.SparkEntry.queries("d15_fuzzy_decontaminate")(spark, sf)
    }

    if (which("lmp")) {
      // sf10 LM persist question (r16 verdict #6): persisted count
      // tables vs AQE stage reuse, at a scale where the tables stop
      // fitting page cache. Persist variant = current
      // trigramInterpolatedLL with c3/cb/cu persisted (the r16
      // experiment, re-run at sf10).
      def persistedTrigram(df: DataFrame): DataFrame = {
        val (l3, l2, l1) = (0.6, 0.3, 0.1)
        def key(c: org.apache.spark.sql.Column) = xxhash64(c)
        val tg = df.select(col("doc_id").as("id"), split(col("text"), " ").as("t"))
          .select(col("id"),
            explode(when(size(col("t")) >= 3,
              transform(sequence(lit(0), size(col("t")) - 3),
                i => struct(element_at(col("t"), i + 1).as("w1"),
                  element_at(col("t"), i + 2).as("w2"),
                  element_at(col("t"), i + 3).as("w3"))))
              .otherwise(array())).as("g"))
          .select(col("id"), key(col("g.w1")).as("w1"),
            key(col("g.w2")).as("w2"), key(col("g.w3")).as("w3"))
        val bg = df.select(col("doc_id").as("id"), split(col("text"), " ").as("t"))
          .select(col("id"),
            explode(when(size(col("t")) >= 2,
              transform(sequence(lit(0), size(col("t")) - 2),
                i => struct(element_at(col("t"), i + 1).as("w1"),
                  element_at(col("t"), i + 2).as("w2"))))
              .otherwise(array())).as("b"))
          .select(col("id"), key(col("b.w1")).as("w1"), key(col("b.w2")).as("w2"))
        val c3 = tg.groupBy(col("w1"), col("w2"), col("w3"))
          .agg(count(lit(1)).as("c3")).persist()
        val ch3 = c3.groupBy(col("w1"), col("w2")).agg(sum(col("c3")).as("ch3"))
        val cb = bg.groupBy(col("w1").as("b1"), col("w2").as("b2"))
          .agg(count(lit(1)).as("cb")).persist()
        val chb = cb.groupBy(col("b1")).agg(sum(col("cb")).as("chb"))
          .withColumnRenamed("b1", "h1")
        val toks = df.select(explode(split(col("text"), " ")).as("tok0"))
        val cu = toks.select(key(col("tok0")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("cu")).persist()
        val nv = cu.agg(coalesce(sum(col("cu")), lit(0L)).as("n_tok"),
          count(lit(1)).as("v"))
        val p3 = (col("c3") + lit(1.0)) / (col("ch3") + col("v"))
        val p2 = (col("cb") + lit(1.0)) / (col("chb") + col("v"))
        val p1 = (col("cu") + lit(1.0)) / (col("n_tok") + col("v"))
        tg.join(c3, Seq("w1", "w2", "w3")).join(ch3, Seq("w1", "w2"))
          .join(cb, col("w2") === col("b1") && col("w3") === col("b2"))
          .join(chb, col("w2") === col("h1"))
          .join(cu, col("w3") === cu("w"))
          .crossJoin(broadcast(nv))
          .groupBy(col("id"))
          .agg(count(lit(1)).as("n_trigrams"),
            (floor(avg(log(lit(l3) * p3 + lit(l2) * p2 + lit(l1) * p1))
              * 10000 + lit(0.5)) / 10000).as("ll"))
          .select(col("id").as("doc_id"), col("n_trigrams"), col("ll"))
          .orderBy(col("doc_id"))
      }
      arms("old_t22_reuse") = () =>
        graft.SparkEntry.queries("t22_trigram_lm")(spark, sf)
      arms("new_t22_persist") = () => persistedTrigram(Tables.documents(spark, sf))
    }

    // time CONSTRUCTION + write: operators like perplexityBucketsScalable
    // run jobs at construction (census collect), which a df-argument
    // timing would silently exclude (Bench times construction too)
    def run(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    arms.values.foreach(a => run(a)) // warm
    val reps = 5
    val results = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      arms.foreach { case (k, a) => results(k) ::= run(a) }
    }
    results.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"AB $k min=${v.min}%.3f med=${v.sorted.apply(v.size / 2)}%.3f")
    }
    spark.stop()
  }
}
