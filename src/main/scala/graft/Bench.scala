package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR at local[32] and prints ONE JSON line.
  *
  * Methodology: a warmup pass of every headline query absorbs JVM/codegen
  * warmup (first-query penalty is ~8s otherwise), then each query is timed
  * over several passes and the MINIMUM is reported, materialized through the
  * noop sink so the full plan executes (a bare count() can let Catalyst skip
  * work). Min-of-N makes the artifact load-proof: a transient CPU spike on
  * the host inflates one pass, not the reported number (round 3's one-pass
  * artifact read 3.4x worse than an idle rerun of the same binary).
  *
  * Load that spans ALL N passes defeats min-of-N silently, so the artifact
  * also carries per-query PASS DISPERSION (max/min across the timed passes)
  * and a p50/p90/max summary — "was this run clean" is a recorded number,
  * not a post-hoc judgment call. MEASURED floor on this virtualized host:
  * two back-to-back idle-host runs both read p50 ≈ 1.45 (even on >1s
  * rows), so inter-pass variance of ~1.3-1.5× is endemic VM jitter here,
  * which is exactly why min-of-N totals from different runs can disagree
  * ~1.1× at a flat anchor without any contamination. Read the number
  * COMPARATIVELY: same host, run-to-run — a spanning load shows as p50
  * well above that floor and max >> p90.
  */
object Bench {

  /** Headline set — the BASELINE.md table shapes + pipeline heavies. */
  val headline: Seq[String] = Seq(
    "q01_tpch_agg",          // scan + partial/final agg (SCAN anchor)
    "q66_shuffle_anchor",    // combine-defeating groupBy (EXCHANGE anchor)
    "q02_scan_filter_count", // pushed-filter scan
    "q03_histogram",         // groupBy + count + sort
    "q04_join_broadcast",    // broadcast inner join + agg
    "q05_topn",              // TakeOrderedAndProject
    "q09_stats",             // mean/stddev
    "sk03_most_frequent_sketch", // TopK sketch aggregator
    "sk04_most_distinct",    // Top[K, HLL] sketch aggregator
    "d02_minhash_lsh",       // MinHash+LSH dedup
    "a01_ann_bruteforce",    // cosine top-k
    "a02_ann_lsh",           // LSH ANN (native hyperplane signature)
    "m01_multimodal_features", // binary decode pipeline
    "q23_asof_join",         // one-shuffle as-of join (window form)
    "q27_asof_native",       // custom AsofJoinExec (vs q23's window form)
    "q62_asof_tolerance",    // as-of + staleness bound (same merge pass)
    "q63_asof_forward",      // forward as-of (peeked candidate)
    "q64_asof_nearest",      // nearest as-of (both candidates, one pass)
    "q24_range_join",        // bucketed range join
    "q33_tpch_q3",           // 3-way fact join, pushed filters, bounded top-n
    "q34_tpch_q5",           // 6-table join: broadcast dim chain + fact shuffles
    "q36_tpch_q18",          // agg-before-join: HAVING prunes facts pre-join
    "q37_tpch_q10",          // 4-table join, pushed flags/dates, top-20
    "q38_tpch_q21",          // fact self-semi/anti joins on shared partitioning
    "q40_tpch_q21_agg",      // Q21 aggregate rewrite: one fact shuffle (vs q38)
    "q65_tpch_q21_auto",     // Q21 auto dispatch: fact census picks the twin
    "q39_tpch_q17",          // agg-join-back, broadcast brand prune
    "q41_tpch_q13",          // outer-join count histogram, agg-below-join
    "q43_tpch_q7",           // two-nation volume: broadcast-folded dim pair
    "q48_tpch_q2",           // correlated min -> one window pass over fact
    "q53_tpch_q8",           // market share: two SF-scaled shuffles only
    "q54_tpch_q9",           // profit rollup: cost on the part broadcast
    "d07_contamination",     // exact decontamination (broadcast 8-gram set)
    "d09_bloom_decontaminate", // bloom-prefiltered twin (same oracle as d07)
    "d15_fuzzy_decontaminate", // MinHash-banded near-match decontamination
    "d24_bloom_shuffle_confirm", // bloom's true regime: no-broadcast confirm
    "d17_paragraph_dedup",   // CCNet paragraph dedup + ordered reassembly
    "d18_span_removal",      // ExactSubstr cut + stitch (action form of d12)
    "p12_temperature_mix",   // n^alpha class rebalancing, broadcast rates
    "d12_dup_spans",         // ExactSubstr duplicate spans (Lee et al. 2021)
    "t11_lm_score",          // corpus-trained bigram LM quality score
    "t17_gopher_rules",      // Gopher doc-level rule battery (narrow codegen)
    "t18_gopher_repetition", // top-n-gram char fractions (one gram shuffle)
    "t19_ccnet_buckets",     // LM score + per-lang ntile partition
    "t19b_ccnet_buckets_scalable", // t19 minus the 5-way window ceiling
    "d19_url_dedup",         // URL canonicalization + per-URL keep-one
    "t20_dsir",              // DSIR importance weights + Gumbel-top-k draw
    "g01_pagerank",          // 3 power iterations, checkpointed lineage
    "c01_chunking",          // token-window chunking (narrow posexplode)
    "r01_bm25_topk",         // BM25: query-term-pruned corpus scan
    "r02_rrf_hybrid",        // lexical+dense rank fusion
    "g03_triangles",         // wedge-join triangle counting
    "c02_cohort_retention",  // weekly cohort matrix (two user-keyed shuffles)
    "u02_cdc_apply",         // changelog latest-wins window, no join
    "m05_image_phash",       // real decode -> dHash -> bucket census
    "m10_png_ingest",        // real PNG codec (JDK) -> normalize -> features
    "m11_jpeg_ingest",       // real JPEG codec -> normalize -> tolerance gate
    "m12_mjpeg_ingest",      // MJPEG walk -> per-frame decode -> frame contract
    "m13_flac_ingest",       // FLAC stage -> lossless decode -> QC census
    "m14_video_dedup",       // frame-fingerprint inverted-index pair join
    "m15_image_neardup",     // banded-dHash near-dup clusters (hash-level CC)
    "m16_audio_neardup",     // window-fingerprint inverted-index pair join
    "m17_audio_neardup_hopped", // half-hop lattice (2x fingerprint mass)
    "m18_video_dup_clusters",   // video pairs -> CC -> cluster census
    "m19_audio_dup_clusters",   // audio pairs -> CC -> cluster census
    "p25_multimodal_curation", // both modality front doors -> QC -> dedup -> keep
    "t36_wordpiece_tokens",  // WordPiece train + greedy longest-match census
    "t38_bytebpe_tokens",    // byte-level BPE distributed train + census
    "t40_bytebpe_gpt2",      // byte-BPE under the GPT-2 pre-tokenizer
    "r03_ndcg_eval",         // BM25 ranking + nDCG evaluation
    "u03_incremental_agg",   // base+delta agg merge, no base rescan
    "t21_pmi_collocations",  // PMI over vocabulary-sized count tables
    "t22_trigram_lm",        // interpolated trigram LM (3 count tables)
    "c03_ewma",              // windowed EWMA per key (one keyed exchange)
    "c06_cooccurrence",      // vocab-capped within-doc pair join
    "d21_containment",       // inverted gram index containment pairs
    "g04_jaccard_nbrs",      // wedge-join neighbor similarity
    "p16_bootstrap_ci",      // 40-replica Poisson bootstrap (explode + agg)
    "c08_funnel",            // one-pass sorted-fold conversion funnel
    "m07_scene_cuts",        // frame-stream walk + decode (mapPartitions)
    "d22_entity_resolution", // blocked Jaro-Winkler record linkage (native expr)
    "u10b_pruned_scan",      // STEADY-STATE metadata-pruned scan (staging —
                             // an ingest-time 10x write — happens once in
                             // warmup; the skipping ratio is reported as
                             // u10_files in the JSON line)
    "t26_distribution_drift", // KL/JS corpus drift (pico-nat exact sum)
    "sk03b_most_frequent_skewed", // Top+CMS sketch regime (skewed stream)
    "sk04b_most_distinct_skewed", // Top[K,HLL] sketch regime (skewed stream)
    "sk20_hll_export",       // HLL build + byte export + re-estimate
    "d23_entity_resolution_smj", // d22's sort-merge regime (salt 8)
    "u14_fork_write",        // single-pass write + observed aggregates
    "t29_pii_census",        // PII detect counts + redaction chain
    "t30_unicode_nfc",       // native NFC normalization (ASCII fast path)
    "t31_html_extract",      // HTML main-content extraction (jusText core)
    "t32_nb_classifier",     // trained NB quality classifier, train+apply
    "t34_unigram_tokens",    // unigram-LM tokenizer: seed+EM train+encode
    "t33_html_links",        // outlink extraction -> edge-list census
    // st17 (streamed html pipeline) is gate-only like every st* row:
    // the staged-stream harness's ingest staging dominates its clock
    "sk21_hll_sketch_table", // sketch-table shard -> merge-bytes rollup
    "sk22_theta_export",     // theta build + canonical byte export
    "sk23_grid_export",      // grid-histogram build + byte export
    "sk24_theta_sketch_table", // theta shard -> merge-bytes rollup
    "sk25_topk_export",      // Top+CMS build + canonical byte export
    "sk26_topk_sketch_table", // heavy-hitter shard -> merge-bytes rollup
    "sk27_topdistinct_export", // Top<K,HLL> build + tracked-state export
    "sk28_gk_quantiles_contract", // GK quantile summary, merged bound
    "sk29_gk_quantiles_by_key", // per-key GK quantiles (t09's scale twin)
    "u18_snapshot_diff",     // keyed A/R/C diff via digest full-outer join
    "u15b_profile_approx",   // one-pass profile, HLL distincts (the
                             // scale form; exact u15 is gate-only — its
                             // Expand+sort is what exact multi-distinct
                             // costs in any engine)
    "p01_curation_pipeline") // quality -> dedup -> stats composition

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // one source of session truth: GraftSession (ANSI-off, UTC, AQE, ...)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // iteration aid: SPARK_GRAFT_BENCH_ONLY=q04,q05 times a subset with the
    // same warmup+noop methodology (driver runs without it → full
    // headline). Subset runs may name ANY gate, not just headline
    // members — that's how decade rows get measured for operators too
    // slow or too niche for the committed headline artifact.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val qs = only match {
      case None => headline.filter(SparkEntry.queries.contains)
      case Some(set) =>
        (headline ++ set.toSeq.sorted.filterNot(headline.contains))
          .filter(SparkEntry.queries.contains).filter(set.contains)
    }
    // the artifact path doubles as the PRIOR artifact for the mover
    // auto-recheck: a full run overwrites it, so its pre-run content IS
    // the last committed draw (BENCH_LOCAL.json for sf0.1 runs, the
    // SPARK_GRAFT_BENCH_OUT target — e.g. BENCH_SF10.json — for scale
    // runs). Resolved BEFORE any run so the prior survives.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", {
        var d = java.nio.file.Paths.get("").toAbsolutePath
        var root: java.nio.file.Path = null
        while (root == null && d != null) {
          if (java.nio.file.Files.exists(d.resolve("build.sbt"))) root = d
          else d = d.getParent
        }
        if (root == null) {
          System.err.println(
            "[bench] WARNING: no build.sbt found above cwd; writing " +
              "BENCH_LOCAL.json into the cwd")
          root = java.nio.file.Paths.get("").toAbsolutePath
        }
        root.resolve("BENCH_LOCAL.json").toString
      })).toAbsolutePath
    val priorQueries: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(outPath), "UTF-8")
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(txt).get("queries")
        if (node == null) Map.empty
        else {
          import scala.jdk.CollectionConverters._
          node.properties().asScala
            .map(e => e.getKey -> e.getValue.asDouble(-1.0)).toMap
        }
      } catch { case _: Throwable => Map.empty }
    qs.foreach { q =>
      try run(q) catch { case e: Throwable =>
        System.err.println(s"[bench-warmup] $q failed: ${e.getMessage}") }
      spark.catalog.clearCache()
    }
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    // wall-clock stamp of each query's LAST timed pass — the recheck
    // embeds the re-read's distance from it, so the artifact shows
    // whether a re-read actually left the contaminated window (a mover
    // measured near the end of the draw is re-read seconds later, which
    // adjudicates nothing; one from the head has had many minutes)
    val measuredAt = scala.collection.mutable.Map.empty[String, Long]
    val perPass = qs.map { q =>
      // min of `passes` timed runs: one noisy scheduling window on the host
      // inflates a single pass, not the reported figure
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { run(q); true } catch { case _: Throwable => false }
        val t = (System.nanoTime() - t0) / 1e9
        // queries are independent; drop persisted intermediates OUTSIDE the
        // timed region (same rationale as Verify: the dedup queries persist
        // plan-internal frames they cannot unpersist before their result
        // materializes, and ~40 accumulated cached plans made the LAST
        // headline query analyze 10x slower — measured 7.3s vs 0.77s clean)
        spark.catalog.clearCache()
        if (ok) t else -1.0
      }
      measuredAt(q) = System.nanoTime()
      q -> times.filter(_ >= 0)
    }
    val results = perPass.map { case (q, good) =>
      q -> (if (good.nonEmpty) good.min else -1.0)
    }
    // MOVER AUTO-RECHECK (round-15 verdict #3): two consecutive rounds
    // of judge/builder cycles were spent re-litigating host-noise drift
    // by hand (r13 sk29/t31, r14 m10/m12/as-of) — a full draw can be
    // contaminated for MINUTES, and a subset re-read a few minutes
    // later settles draw-vs-regression. Mechanize it: against the prior
    // committed artifact, take the top movers (ratio > 1.25, worst 5),
    // re-run JUST those queries minutes after their contaminated
    // window, alongside both anchors (q01 scan-path, q66
    // exchange-path), and embed the re-read next to the full-draw
    // number. The adjudication becomes a recorded artifact instead of a
    // manual protocol. Full runs only; SPARK_GRAFT_BENCH_RECHECK=0
    // disables.
    val recheckOn = only.isEmpty && priorQueries.nonEmpty &&
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RECHECK", "1") != "0"
    val resultMap = results.toMap
    val recheck: Seq[(String, (Double, Double, Double, Double))] =
      if (!recheckOn) Seq.empty
      else {
        val movers = results.collect {
          case (q, cur) if cur >= 0.05 &&
              priorQueries.getOrElse(q, -1.0) >= 0.05 &&
              cur / priorQueries(q) > 1.25 =>
            q -> cur / priorQueries(q)
        }.sortBy(-_._2).take(5).map(_._1)
        val targets =
          if (movers.isEmpty) Seq.empty
          else (movers ++ Seq("q01_tpch_agg", "q66_shuffle_anchor")
            .filter(a => !movers.contains(a) && resultMap.contains(a)))
        targets.map { q =>
          val since =
            measuredAt.get(q).map(t => (System.nanoTime() - t) / 1e9)
              .getOrElse(-1.0)
          val times = (1 to passes).flatMap { _ =>
            val t0 = System.nanoTime()
            val ok = try { run(q); true } catch { case _: Throwable => false }
            val t = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache()
            if (ok) Some(t) else None
          }
          val reread = if (times.nonEmpty) times.min else -1.0
          q -> ((resultMap(q), priorQueries.getOrElse(q, -1.0), reread, since))
        }
      }
    // Per-query PASS DISPERSION (max/min across the timed passes) + a
    // headline summary: "was this run clean" as a NUMBER. Min-of-N hides
    // transient load, but load that spans all N passes does not show in
    // the minima — it shows here: an idle host reads p50 ≈ 1.0-1.1 with a
    // thin tail, a contaminated run reads a fat dispersion tail. The
    // summary percentiles skip sub-50ms rows, where the scheduler's
    // ~ms-scale jitter makes max/min ratios meaningless noise.
    def fmt2(v: Double): String =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val disps = perPass.collect {
      case (q, good) if good.size >= 2 && good.min > 0 => q -> good.max / good.min
    }
    val meaningful = perPass.collect {
      case (q, good) if good.size >= 2 && good.min >= 0.05 => good.max / good.min
    }.sorted
    def pct(p: Double): Double =
      if (meaningful.isEmpty) -1.0
      else meaningful(math.min(meaningful.size - 1, (p * meaningful.size).toInt))
    val dispP50 = pct(0.50)
    val dispP90 = pct(0.90)
    val (dispMaxQ, dispMax) =
      if (disps.isEmpty) ("", -1.0) else disps.maxBy(_._2)
    val dispJson = disps.map { case (k, v) => "\"" + k + "\":" + fmt2(v) }
      .mkString("{", ",", "}")
    val dispSummary = s""","disp":{"p50":${fmt2(dispP50)},"p90":${fmt2(dispP90)},"max":${fmt2(dispMax)},"max_q":"$dispMaxQ","per_query":$dispJson}"""
    // 0.1 ms precision: full-precision doubles tripled the line length,
    // and the driver's bounded stdout-tail capture clipped the head of
    // the (single-line) JSON two rounds running — parsed:null artifacts.
    // Shorter line first; see the double-print below for the same reason.
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qJson = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // skipping ratio for the u10b row: time alone can't show that the
    // pruned scan opened 2 of 8 files — report the census explicitly
    val skipMeta =
      if (qs.contains("u10b_pruned_scan"))
        try {
          val (opened, onDisk) =
            graft.operators.CurationQueries.skipScanCensus(spark, sfDir)
          s""","u10_files":{"opened":$opened,"total":$onDisk}"""
        } catch { case e: Throwable =>
          // a broken census (the thing this field exists to prove) must be
          // VISIBLE, not indistinguishable from a deliberately absent one
          System.err.println(s"[bench] u10b skipping census failed: $e")
          ""","u10_files":null"""
        }
      else ""
    val recheckJson =
      if (recheck.isEmpty) ""
      else recheck.map { case (q, (full, prior, reread, since)) =>
        // since_sec = re-read start minus this query's full-draw
        // measurement: the adjudication is only as good as this gap
        "\"" + q + "\":{\"full\":" + fmt(full) + ",\"prior\":" +
          fmt(prior) + ",\"reread\":" + fmt(reread) +
          ",\"since_sec\":" + fmt2(since) + "}"
      }.mkString(""","recheck":{""", ",", "}")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qJson,"passes":$passes$skipMeta$dispSummary$recheckJson,"sf":"$sfDir"}"""
    // printed TWICE — immediately here and again as the very last stdout
    // after spark.stop(): the driver captures a bounded TAIL of stdout,
    // and in r6/r7 the capture window started mid-line, clipping the
    // first ~20 query rows (parsed:null). With the line both shortened
    // (fmt above) and repeated last-thing, the final occurrence sits at
    // the very end of stdout where a tail capture cannot miss its head
    // unless the window is smaller than one line.
    println(line)
    // ALSO persist the full per-query JSON to a repo file: a committed
    // BENCH_LOCAL.json survives any stdout clipping. SUBSET runs
    // (SPARK_GRAFT_BENCH_ONLY spot-checks) must NOT clobber the full
    // round artifact this file exists to preserve. The path is anchored
    // (env override, else the repo root), NOT cwd-relative: a run
    // launched from another directory would otherwise silently strand
    // the artifact, defeating the safeguard.
    if (only.isEmpty) {
      // outPath resolution (env override, else the nearest enclosing sbt
      // root) happened BEFORE the runs — its pre-run content fed the
      // mover recheck
      try {
        java.nio.file.Files.write(outPath, (line + "\n").getBytes("UTF-8"))
        System.err.println(s"[bench] wrote $outPath")
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $outPath: $e")
      }
    }
    spark.stop()
    // The driver captures only a bounded TAIL of stdout (~2 KB observed in
    // BENCH_r08.json): the full 88-query line is ~3.4 KB, so no amount of
    // positioning makes it parseable — three rounds of parsed:null. The
    // VERY LAST stdout line is therefore a COMPACT (<300 byte) summary in
    // the contract shape ({"metric","value","unit","queries",...}) whose
    // "queries" map carries only the q01 host anchor; the full per-query
    // breakdown lives in the committed BENCH_LOCAL.json and in the full
    // line printed above.
    // TWO anchors (r13 verdict #8): q01 is scan-bound, q66 is
    // exchange-bound — host drift on the shuffle path is separable
    // from scan-path drift by which anchor moved
    val anchor = results.toMap.getOrElse("q01_tpch_agg", -1.0)
    val anchorSh = results.toMap.getOrElse("q66_shuffle_anchor", -1.0)
    // r16 verdict #2 asked for the FULL per-query map here so PERF can
    // adjudicate more than the two anchors. Hard physical constraint:
    // BENCH_r08..r16 all carry an EXACTLY-2000-char stdout tail, and the
    // full 106-entry map is >=2.8 KB even at 2 decimals — a full-map
    // final line would have its head clipped outside the window and
    // parse null (that is precisely the r08 parsed:null failure). So
    // the final contract line keeps the anchors and packs as many
    // ADDITIONAL per-query entries as fit under a 1900-byte budget,
    // most expensive rows first — the rows that adjudicate a round.
    // Additions-only: q01/q66 and every scalar field are unchanged; the
    // complete map is in the full line above and in BENCH_LOCAL.json.
    val fixedTail = s"""},"n":${results.size},"passes":$passes,"anchor_q01":${fmt(anchor)},"anchor_q66":${fmt(anchorSh)},"disp_p50":${fmt2(dispP50)},"disp_max":${fmt2(dispMax)},"detail":"BENCH_LOCAL.json","sf":"$sfDir"}"""
    val sb = new StringBuilder
    sb.append(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":{""")
    sb.append("\"q01_tpch_agg\":" + fmt(anchor) +
      ",\"q66_shuffle_anchor\":" + fmt(anchorSh))
    var lineLen = sb.length + fixedTail.length
    results
      .filter(r => r._1 != "q01_tpch_agg" && r._1 != "q66_shuffle_anchor")
      .sortBy(-_._2)
      .foreach { case (k, v) =>
        val e = ",\"" + k + "\":" + fmt(v)
        if (lineLen + e.length <= 1900) { sb.append(e); lineLen += e.length }
      }
    sb.append(fixedTail)
    println(sb.toString)
  }
}
