package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 operator pack: retrieval (BM25, hybrid RRF), graph triangle
  * counting, cohort retention, CDC changelog apply, and PMI collocations.
  * Every query carries a DuckDB oracle (hash-verified by the driver).
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Fixed retrieval queries over the synthetic corpus vocabulary —
    * literal in both engines, broadcast on the Spark side. */
  private val bm25Queries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("hash", "join", "merge"),
    1L -> Seq("scan", "filter", "table"),
    2L -> Seq("stream", "window", "agg"))

  /** Same (prev_k -> k) transition edges as g01/g02. */
  private def transitionEdges(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val k = regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), k.as("dst"))
      .withColumn("src", lag(col("dst"), 1).over(w))
      .filter(col("src").isNotNull && col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
  }

  private def tmp(sfDir: String, name: String): String =
    s"target/qtmp/${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}/$name"

  /** Idempotent staging for the STEADY-STATE data-skipping path (u10b):
    * the 8-file range layout and its footer-stats table are written once
    * and reused — restaging is ingest-time work, and timing it inside
    * the scan benchmark hid the actual skipping win behind a 10× write
    * (the r5 verdict's u10 methodology note). u10 proper still restages
    * every run: the GATE verifies the whole ingest→stats→scan path. */
  /** u10b's pruned-scan predicate — ONE definition shared by the gate
    * query and [[skipScanCensus]], so the reported opened/total ratio
    * is always the ratio of the scan actually timed. */
  val SkipScanColumn = "l_orderkey"
  val SkipScanLo = 1000.0
  val SkipScanHi = 3000.0

  def stageSkipTable(s: SparkSession, d: String): (String, DataFrame) = {
    val dir = tmp(d, "skip_lineitem_staged")
    val statsDir = tmp(d, "skip_lineitem_stats")
    val conf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    // staleness guard: regenerated testdata at the same sfDir must
    // re-stage, or the bench would silently time an old copy. Row count
    // alone is not enough — regenerated data at the same scale factor
    // typically has an IDENTICAL count — so additionally require the
    // staging to be newer than the source parquet's latest modification
    // time (metadata-only reads; both checks are cheap)
    def maxMtime(path: String): Long = {
      val pp = new org.apache.hadoop.fs.Path(path)
      val pfs = pp.getFileSystem(conf)
      if (!pfs.exists(pp)) 0L
      else {
        val st = pfs.getFileStatus(pp)
        if (st.isFile) st.getModificationTime
        else pfs.listStatus(pp).map(_.getModificationTime).foldLeft(0L)(math.max)
      }
    }
    val stagedSuccess = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    val done = fs.exists(stagedSuccess) &&
      fs.exists(new org.apache.hadoop.fs.Path(statsDir, "_SUCCESS")) &&
      fs.getFileStatus(stagedSuccess).getModificationTime >
        maxMtime(s"$d/lineitem.parquet") &&
      s.read.parquet(dir).count() == Tables.lineitem(s, d).count()
    if (!done) {
      Tables.lineitem(s, d)
        .repartitionByRange(8, col(SkipScanColumn))
        .write.mode("overwrite").parquet(dir)
      DataSkipping.collectFileStats(s, dir,
          Seq(SkipScanColumn, "l_extendedprice"))
        .write.mode("overwrite").parquet(statsDir)
    }
    (dir, s.read.parquet(statsDir))
  }

  /** (files opened, files on disk) for u10b's pruned scan — the
    * skipping ratio Bench reports alongside the time. */
  def skipScanCensus(s: SparkSession, d: String): (Int, Int) = {
    val (dir, stats) = stageSkipTable(s, d)
    val (chosen, total) = DataSkipping.prunedFileSelection(
      s, dir, stats, SkipScanColumn, SkipScanLo, SkipScanHi)
    (chosen.size, total)
  }

  val queries: Map[String, Q] = Map(
    // -- FILE-LEVEL DATA SKIPPING: stats table + metadata-pruned scan ----
    // lineitem is staged as 8 range-partitioned files; a per-file
    // min/max/null stats table is built from parquet FOOTERS ONLY
    // (distributed, ~KB of I/O per file — the Delta/Iceberg ingest-time
    // pattern), and the query opens only files whose stats admit
    // l_orderkey ∈ [1000, 3000]. Pruning is performance, the re-applied
    // filter is correctness: result hash-matches the full-scan oracle;
    // the actual file-count reduction is pinned in MaintenanceSpec.
    "u10_data_skipping" -> ((s, d) => {
      val dir = tmp(d, "skip_lineitem")
      Tables.lineitem(s, d)
        .repartitionByRange(8, col("l_orderkey"))
        .write.mode("overwrite").parquet(dir)
      val stats = DataSkipping.collectFileStats(s, dir,
        Seq("l_orderkey", "l_extendedprice"))
      DataSkipping.prunedRead(s, dir, stats, "l_orderkey", 1000, 3000)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
        .orderBy(col("l_returnflag"))
    }),

    // -- u10b: the STEADY-STATE skipping path — staged layout + saved
    // stats table reused across runs (see stageSkipTable), so what this
    // measures is what a reader actually pays: a tiny stats read + a
    // scan that opens ~2/8 files. Same result and oracle as u10. -------
    "u10b_pruned_scan" -> ((s, d) => {
      val (dir, stats) = stageSkipTable(s, d)
      DataSkipping.prunedRead(s, dir, stats,
          SkipScanColumn, SkipScanLo, SkipScanHi)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
        .orderBy(col("l_returnflag"))
    }),

    // -- u16: stats maintenance under DELETES — the direction u10/u10b
    // never exercise. lineitem is staged as 8 EXPLICIT-width-range files
    // (bucket i holds l_orderkey ∈ (i·w, (i+1)·w], w = ceil(max/8) —
    // width-based so the oracle can replay the surviving row set in
    // SQL), a stats table is built, then two files are REMOVED from
    // disk out from under it. appendFileStats must drop the stale rows
    // (a stats table that still claims deleted files sends the scan
    // into FileNotFound), and the refreshed pruned read over a range
    // spanning kept AND deleted buckets must equal the full scan of
    // what remains. MaintenanceSpec pins the mechanics (6 stats rows,
    // exactly 2 files opened); this gate hash-verifies the VALUES. ----
    "u16_stats_after_delete" -> ((s, d) => {
      val dir = tmp(d, "skip_delete")
      val li = Tables.lineitem(s, d)
      val maxKey = li.agg(max(col("l_orderkey"))).head().getLong(0)
      val w = (maxKey + 7) / 8
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
      (0 until 8).foreach { i =>
        val stage = tmp(d, s"skip_delete_stage_$i")
        li.filter(col("l_orderkey") > i * w && col("l_orderkey") <= (i + 1) * w)
          .coalesce(1).write.mode("overwrite").parquet(stage)
        fs.listStatus(new org.apache.hadoop.fs.Path(stage))
          .filter(_.getPath.getName.endsWith(".parquet")).headOption
          .foreach(st => fs.rename(st.getPath,
            new org.apache.hadoop.fs.Path(dir, f"bucket_$i%02d.parquet")))
      }
      val cols = Seq("l_orderkey", "l_extendedprice")
      // MATERIALIZE before the delete: collectFileStats is lazy, and an
      // unmaterialized stats frame would re-open footers of files that
      // no longer exist when appendFileStats first evaluates it — the
      // ingest-time model is a stats table persisted at write time
      val stats0 = DataSkipping.collectFileStats(s, dir, cols)
        .localCheckpoint(true)
      // the delete: buckets 6 and 7 vanish from disk
      Seq(6, 7).foreach(i => fs.delete(
        new org.apache.hadoop.fs.Path(dir, f"bucket_$i%02d.parquet"), false))
      val stats = DataSkipping.appendFileStats(s, dir, cols, stats0)
      // query range spans kept buckets 4-5 AND the deleted 6-7
      DataSkipping.prunedRead(s, dir, stats, "l_orderkey",
          (4 * w + 1).toDouble, maxKey.toDouble)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_extendedprice")), 2).as("revenue"))
        .orderBy(col("l_returnflag"))
    }),

    // -- u18: SNAPSHOT DIFF — the regression-diff primitive: today's
    // pipeline output vs yesterday's, classified per key as
    // added/removed/changed. The mutation staging (deletes %13, price
    // bumps %5, inserts %17 with 1e9-offset keys (above sf10's 100-copy key space — diffSnapshots requires per-side key uniqueness)) is pure arithmetic both
    // engines replay; the oracle classifies by full-outer VALUE
    // comparison while the operator compares 8-byte row digests — a
    // hash match proves the digest plan classifies identically. --------
    "u18_snapshot_diff" -> ((s, d) => {
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
      val mutated = base.filter(col("o_orderkey") % 13 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      val inserted = base.filter(col("o_orderkey") % 17 === 0)
        .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
          col("o_custkey"), lit("N").as("o_orderstatus"), col("o_totalprice"))
      Maintenance.diffSnapshots(base, mutated.unionByName(inserted),
          Seq("o_orderkey"), Seq("o_custkey", "o_orderstatus", "o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // -- u14: non-aggregate FORK, single pass — the reference streams
    // each item to a write sink and an aggregation simultaneously
    // (amadeus-core par_sink/fork.rs:21-60); Spark-first form is
    // observe(): CollectMetrics folds the aggregates inside the write
    // job (ForkSpec asserts exactly ONE job). The gate proves the
    // observed metrics equal independent aggregates of the written
    // files — i.e. both forks saw every row of the single pass. -------
    "u14_fork_write" -> ((s, d) => {
      val dir = tmp(d, "fork_write")
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
      val m = DynStream(li).forkWrite(dir)(
        count(lit(1)).as("n"), sum(col("l_quantity")).as("s"))
      s.read.parquet(dir)
        .agg(count(lit(1)).as("n_file"), sum(col("l_quantity")).as("s_file"))
        .select(
          lit(m("n").asInstanceOf[Long]).as("n_obs"),
          round(lit(m("s").asInstanceOf[Double]), 2).as("sum_obs"),
          col("n_file"),
          round(col("s_file"), 2).as("sum_file"))
    }),

    // -- u15: one-pass TABLE PROFILE — per-column row/null/distinct
    // counts + value range in one aggregate over one scan (multi-column
    // distincts via Catalyst Expand, wide row unpivoted with stack; see
    // Profile.scaladoc for the approx scale form). A derived nullable
    // column proves the null accounting on this null-free corpus. ------
    "u15_table_profile" -> ((s, d) => {
      val t = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_quantity"), col("l_returnflag"),
        expr("nullif(l_returnflag, 'A')").as("flag_n"))
      Profile.profile(t,
          Seq("l_orderkey", "l_quantity", "l_returnflag", "flag_n"))
        .orderBy(col("col_name"))
    }),

    // -- u15b: the profile's SCALE form — HLL distinct estimates instead
    // of exact multi-distinct, which turns the Expand + 3M-row
    // SortAggregate into one HashAggregate pass (the exact form's sort
    // is what exact multi-column distinct costs in ANY engine; this is
    // what you run at 100 TB). rows-only: the HLL estimates are
    // engine-specific; u15 hash-verifies the exact twin and
    // MaintenanceSpec bounds approx-vs-exact at 3σ. --------------------
    "u15b_profile_approx" -> ((s, d) => {
      val t = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_quantity"), col("l_returnflag"),
        expr("nullif(l_returnflag, 'A')").as("flag_n"))
      Profile.profileApprox(t,
          Seq("l_orderkey", "l_quantity", "l_returnflag", "flag_n"))
        .orderBy(col("col_name"))
    }),

    // -- LAYOUT-INVARIANT CONTENT FINGERPRINT: "is the copy identical"
    // answered in ONE aggregate pass per side — per-row 48-bit md5 terms
    // summed mod 2³¹−1 (addition commutes ⇒ any partitioning/order/file
    // layout gives the same value; plain integer arithmetic ⇒ any engine
    // reproduces it). The gate fingerprints the same table under two
    // different physical layouts and hash-verifies the value itself. ----
    "u12_content_fingerprint" -> ((s, d) => {
      val cols = Seq("l_orderkey", "l_partkey", "l_linenumber",
        "l_quantity", "l_returnflag")
      val li = Tables.lineitem(s, d).select(cols.map(col): _*)
      val a = Maintenance.contentFingerprint(li, cols)
      val b = Maintenance.contentFingerprint(
        li.repartition(64).sortWithinPartitions(col("l_quantity")), cols)
      a.crossJoin(b.select(col("content_fp").as("fp2")))
        .select(col("content_fp"), col("n_rows"),
          (col("content_fp") === col("fp2")).as("layout_invariant"))
    }),

    // -- k-CORE of the user↔page engagement graph: iterative peeling to
    // the dense core (k=45 on the bipartite graph — one real peel round
    // at sf0.01 plus the fixpoint check). Peeling is idempotent at the
    // fixpoint, so the oracle replays 4 unrolled rounds and matches
    // whatever depth Spark actually needed. ------------------------------
    "g07_kcore" -> ((s, d) => {
      val k = regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
      val edges = Tables.events(s, d)
        .select(col("user_id").as("src"), (k + lit(1000000L)).as("dst"))
      GraphOps.kCore(edges, "src", "dst", k = 45)
        .select(
          when(col("node") < 1000000L, lit("user")).otherwise(lit("page"))
            .as("node_type"),
          when(col("node") < 1000000L, col("node"))
            .otherwise(col("node") - 1000000L).as("node_id"),
          col("degree"))
        .orderBy(col("node_type"), col("node_id"))
    }),

    // -- BM25 lexical retrieval: 3 fixed queries, top-10 docs each -------
    // Corpus scanned once; tokens filtered to query terms BEFORE any
    // shuffle, so the tf/df aggregates are query-vocabulary-sized.
    "r01_bm25_topk" -> ((s, d) =>
      Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text",
          bm25Queries, k = 10)
        .orderBy(col("query_id"), col("rk"))),

    // -- Hybrid retrieval: token-set Jaccard (lexical) + embedding cosine
    // (dense) fused by Reciprocal Rank Fusion; queries are docs 0-2.
    // Exact pairing here (oracle-replayable); at scale each ranker's
    // candidates come pre-pruned (LSH / IVF) and RRF sees only top lists.
    "r02_rrf_hybrid" -> ((s, d) => {
      val corpus = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .join(Tables.embeddings(s, d)
          .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
      Retrieval.rrfHybridTopK(corpus, "doc_id", "text", "embedding",
          querySelector = col("id") < 3, k = 10)
        .orderBy(col("query_id"), col("rk"))
    }),

    // -- Triangle participation per node on the k-transition graph ------
    // (edge direction dropped; canonical lo<hi wedge join — each
    // triangle enumerated exactly once)
    "g03_triangles" -> ((s, d) =>
      GraphOps.triangles(transitionEdges(s, d), "src", "dst")
        .orderBy(col("triangles").desc, col("node"))
        .limit(25)),

    // -- Neighbor-set Jaccard link prediction on the k-transition graph --
    // one wedge join keyed by the shared neighbor; denominators use true
    // degrees. Top-25 most-similar node pairs.
    "g04_jaccard_nbrs" -> ((s, d) =>
      GraphOps.neighborJaccard(transitionEdges(s, d), "src", "dst")
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("jaccard").desc, col("u"), col("v"))
        .limit(25)),

    // -- average neighbor degree (assortativity) on the k-transition
    // graph: two keyed aggregates + a degree join --------------------
    "g06_avg_nbr_degree" -> ((s, d) =>
      GraphOps.avgNeighborDegree(transitionEdges(s, d), "src", "dst")
        .orderBy(col("node"))),

    // -- per-document lexical diversity: type-token ratio + hapax (corpus
    // frequency 1) fraction — the vocabulary-richness quality signal;
    // one vocabulary-sized shuffle --------------------------------------
    "t25_lexical_diversity" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val cf = toks.groupBy(col("w")).agg(count(lit(1)).as("cf"))
      toks.join(cf, "w")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("w")).as("n_types"),
          sum((col("cf") === 1).cast("long")).as("n_hapax"))
        .withColumn("ttr",
          round(floor(col("n_types").cast("double") / col("n_tokens") *
            lit(1e12) + lit(0.5)) / lit(1e12), 6))
        .orderBy(col("doc_id"))
    }),

    // -- Within-document term co-occurrence (market-basket shape) --------
    // distinct terms per doc, restricted to the top-50 df vocabulary
    // (broadcast) BEFORE the doc-keyed pair self-join — the vocab cap
    // bounds pair fan-out at |V|²/2 per doc regardless of corpus size.
    "c06_cooccurrence" -> ((s, d) => {
      val toks = Tables.documents(s, d).select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      val topv = toks.groupBy(col("term")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("term")).limit(50).select("term")
      val f = toks.join(broadcast(topv), "term")
      val p1 = f.select(col("doc_id"), col("term").as("t1"))
      val p2 = f.select(col("doc_id"), col("term").as("t2"))
      p1.join(p2, "doc_id").filter(col("t1") < col("t2"))
        .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") >= 5)
        .orderBy(col("n_docs").desc, col("t1"), col("t2"))
        .limit(25)
    }),

    // -- Association rules over the c06 co-occurrence pairs: confidence
    // both directions + lift, all single divisions of exact integer
    // counts. Top-25 by lift — the "terms that predict each other"
    // market-basket signal. ---------------------------------------------
    "c10_assoc_rules" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      val nd = docs.agg(count(lit(1)).as("nd"))
      val dfc = toks.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val topv = dfc.orderBy(col("df").desc, col("term")).limit(50)
      val f = toks.join(broadcast(topv.select("term")), "term")
      val p1 = f.select(col("doc_id"), col("term").as("t1"))
      val p2 = f.select(col("doc_id"), col("term").as("t2"))
      p1.join(p2, "doc_id").filter(col("t1") < col("t2"))
        .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= 5)
        .join(broadcast(topv.select(col("term").as("t1"), col("df").as("df1"))), "t1")
        .join(broadcast(topv.select(col("term").as("t2"), col("df").as("df2"))), "t2")
        .crossJoin(broadcast(nd))
        .select(col("t1"), col("t2"), col("n_pair"),
          round(col("n_pair").cast("double") / col("df1"), 6).as("conf_12"),
          round(col("n_pair").cast("double") / col("df2"), 6).as("conf_21"),
          round((col("n_pair") * col("nd")).cast("double") /
            (col("df1") * col("df2")), 6).as("lift"))
        .orderBy(col("lift").desc, col("t1"), col("t2"))
        .limit(25)
    }),

    // -- Weekly cohort retention over the events stream ------------------
    // cohort = week of a user's first event; one row per (cohort week,
    // week offset) with distinct active users. Two user-keyed shuffles.
    "c02_cohort_retention" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      ev.join(cohort, "user_id")
        .withColumn("week_offset",
          (datediff(col("wk"), col("cohort_wk")) / 7).cast("bigint"))
        .groupBy(col("cohort_wk"), col("week_offset"))
        .agg(count_distinct(col("user_id")).as("active_users"))
        .orderBy(col("cohort_wk"), col("week_offset"))
    }),

    // -- CDC changelog apply: latest-wins upsert + delete ---------------
    // The orders table read as a per-customer changelog ordered by
    // (o_orderdate, o_orderkey); every 7th orderkey is a delete. ONE
    // key-partitioned window, no join.
    "u02_cdc_apply" -> ((s, d) => {
      val log = Tables.orders(s, d).select(
        col("o_custkey").as("custkey"),
        col("o_orderdate").as("seq_ts"), col("o_orderkey").as("seq_id"),
        when(col("o_orderkey") % 7 === 0, "D").otherwise("U").as("op"),
        col("o_orderstatus").as("status"), col("o_totalprice").as("price"))
      Maintenance.applyChangelog(log, Seq("custkey"),
          Seq("seq_ts", "seq_id"), "op")
        .select(col("custkey"), col("seq_id").as("last_orderkey"),
          col("status"), round(col("price"), 2).as("price"))
        .orderBy(col("custkey"))
    }),

    // -- Perceptual-hash image dedup: REAL P6 decode → integer grayscale
    // NN-resample → 64-bit dHash → bucket census. The hash is split into
    // two uint32 halves so the DuckDB replay stays in exact BIGINT math.
    // -- AUDIO QC census over the REAL WAV decode path: per-clip sample
    // count, peak |amplitude|, CLIPPING count (|s| ≥ 32767 — pinned 0 by
    // the synthetic signal, proving the zero path), and integer-exact
    // energy (Σs²) — the ingest quality gates an audio corpus runs
    // before feature extraction -----------------------------------------
    "m09_audio_quality" -> ((s, d) => {
      val media = graft.multimodal.Multimodal
        .mediaFromDocuments(Tables.documents(s, d))
        .filter(col("kind") === "audio")
      val qc = udf((b: Array[Byte]) =>
        graft.multimodal.Multimodal.decodeWavSamples(b) match {
          case Some(ss) =>
            var peak = 0L; var clip = 0L; var sq = 0L
            ss.foreach { v =>
              val a = math.abs(v.toLong)
              if (a > peak) peak = a
              if (a >= 32767) clip += 1
              sq += v.toLong * v
            }
            (ss.length.toLong, peak, clip, sq)
          case None => (-1L, -1L, -1L, -1L)
        })
      media.select(col("media_id"), qc(col("bytes")).as("q"))
        .select(col("media_id"), col("q._1").as("n_samples"),
          col("q._2").as("peak_abs"), col("q._3").as("n_clipped"),
          col("q._4").as("sum_sq"))
        .orderBy(col("media_id"))
    }),

    // -- SOBEL edge energy over the REAL P6 decode path: integer
    // grayscale, 3x3 kernels on interior pixels, Σ(|gx|+|gy|) — the
    // blur/quality proxy vision pipelines pre-filter on. Oracle replays
    // the convolution closed-form from the synthetic pixel formula
    // (no-interior images pin the 0 path). ------------------------------
    "m08_sobel_energy" -> ((s, d) => {
      val media = graft.multimodal.Multimodal
        .mediaFromDocuments(Tables.documents(s, d))
        .filter(col("kind") === "image")
      val sob = udf((b: Array[Byte]) =>
        graft.multimodal.Multimodal.sobelEnergyPpm(b).getOrElse(-1L))
      media.select(col("media_id"), col("meta.width").as("w"),
          col("meta.height").as("h"), sob(col("bytes")).as("edge_energy"))
        .orderBy(col("media_id"))
    }),

    // -- m10: REAL PNG codec ingestion (r8 verdict #5): the same pixels
    // staged as PNG (JDK ImageIO encode on the executors) ride the
    // production ingest path — normalizeImages' batched PNG->P6
    // transcode — then the SAME dHash + Sobel kernels. 8-bit RGB PNG
    // decode is bit-deterministic, so the gate hash-verifies the whole
    // real-codec path against the synthetic pixel formula (the PPM
    // oracle m05/m08 already replay). -----------------------------------
    "m10_png_ingest" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
        .filter(col("kind") === "image")
        .select(col("media_id"), col("bytes"))
      val staged = Multimodal.transcodeToPng(media)
      val normalized = Multimodal.normalizeImages(staged)
      val dh = udf((b: Array[Byte]) => Multimodal.dhashPpm(b).getOrElse(-1L))
      val so = udf((b: Array[Byte]) => Multimodal.sobelEnergyPpm(b).getOrElse(-1L))
      normalized.select(col("media_id"),
          dh(col("bytes")).as("phash"), so(col("bytes")).as("edge_energy"))
        .select(col("media_id"),
          expr("shiftrightunsigned(phash, 32)").as("phash_hi"),
          col("phash").bitwiseAND(lit(0xFFFFFFFFL)).as("phash_lo"),
          col("edge_energy"))
        .orderBy(col("media_id"))
    }),

    // -- m11: REAL JPEG codec ingestion (r9 verdict #5) — the format
    // every web corpus actually ships. JPEG decode is NOT bit-portable
    // (lossy + IDCT variants), so unlike m10 the gate is a per-image
    // TOLERANCE contract, not byte equality: the same pixels staged as
    // JPEG (batched executor-side encode, quality 0.95) ride
    // normalizeImages' front door back to P6, and per image the gate
    // pins (a) dims EXACT, (b) dHash Hamming <= 16, (c) per-channel
    // mean-RGB delta <= 24. The loose bounds are the MEASURED worst
    // case of the adversarial <=5x5 synthetic images (Hamming 12 /
    // delta 22.0 at sf0.01 — 4:2:0 chroma subsampling dominates when
    // the whole image is a fraction of one MCU block); PipelineSpec
    // pins real-sized images at Hamming <= 2 / delta <= 2. ---------------
    "m11_jpeg_ingest" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
        .filter(col("kind") === "image")
        .select(col("media_id"), col("bytes"))
      val staged = Multimodal.transcodeToJpeg(media)
      val normalized = Multimodal.normalizeImages(staged)
        .withColumnRenamed("bytes", "jbytes")
      val dh = udf((b: Array[Byte]) =>
        graft.multimodal.Multimodal.dhashPpm(b).getOrElse(-1L))
      val wOf = udf((b: Array[Byte]) =>
        graft.multimodal.Multimodal.ppmDims(b).map(_._1).getOrElse(-1))
      val hOf = udf((b: Array[Byte]) =>
        graft.multimodal.Multimodal.ppmDims(b).map(_._2).getOrElse(-1))
      val mr = udf((b: Array[Byte]) =>
        graft.multimodal.Multimodal.meanRgbPpm(b)
          .map(t => Seq(t._1, t._2, t._3)).getOrElse(Seq(-1.0, -1.0, -1.0)))
      media.join(normalized, Seq("media_id"))
        .select(col("media_id"),
          wOf(col("jbytes")).as("w"), hOf(col("jbytes")).as("h"),
          (bit_count(dh(col("bytes")).bitwiseXOR(dh(col("jbytes")))) <= 16)
            .as("dhash_ok"),
          aggregate(zip_with(mr(col("bytes")), mr(col("jbytes")),
              (a, b) => abs(a - b)),
            lit(0.0), (acc, x) => greatest(acc, x)).leq(24.0).as("mean_ok"))
        .orderBy(col("media_id"))
    }),

    // -- m14: VIDEO near-dup pairs by shared frame fingerprints — the
    // d02/d21 inverted-index discipline for the video modality: per-frame
    // dHash (real decode), distinct per video, hot-hash census cap, then
    // the hash-keyed self-join counts shared fingerprints per pair. The
    // synthetic streams PLANT real overlaps (video id's frames are
    // ppmFromId(id..id+n-1), so consecutive video ids share frames when
    // n ≥ 4) and the whole pipeline — hashes, census, pairs — replays
    // closed-form in SQL. ------------------------------------------------
    "m14_video_dedup" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
        .filter(col("kind") === "video")
        .select(col("media_id"), col("bytes"))
      Multimodal.videoDupPairs(media, minShared = 1, maxVideosPerHash = 64)
        .orderBy(col("a"), col("b"))
    }),

    // -- m15: image near-dup CLUSTERS by banded dHash — SimHash-banded
    // dedup (d03/d08) for the image modality, cluster-shaped because
    // near-dup images arrive in large groups (pair output would square).
    // Distinct-hash band join (4×16 bits: pigeonhole ⇒ full recall at
    // Hamming ≤ 3), exact Hamming filter, connected components over the
    // hash graph, census per cluster. Everything — hashes, bands,
    // Hamming, the reachability closure, the unsigned-min rep — replays
    // closed-form in SQL. ------------------------------------------------
    "m15_image_neardup" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
        .filter(col("kind") === "image")
        .select(col("media_id"), col("bytes"))
      Multimodal.imageDupClusters(media, maxHamming = 3)
        .orderBy(col("rep_hi"), col("rep_lo"))
    }),

    // -- m16: AUDIO near-dup pairs by shared window fingerprints — the
    // last cell of the modality×dedup matrix (d02 text, m15 image, m14
    // video, THIS audio). Planted overlaps at WINDOW granularity:
    // clip(id) = one silence window ++ seg(id) ++ seg(id+3), so
    // consecutive audio ids (stride 3) share seg(id+3) — and the
    // silence window appears in EVERY clip, making it the degenerate
    // hot key: the explicit cap (16) BINDS at gate scale and the oracle
    // replays the capped census (the requirement m14's >64-video hashes
    // also satisfy). Even ids stage as FLAC (lossless ⇒ identical
    // fingerprints), odd as WAV — the gate pins the codec dispatch too.
    "m16_audio_neardup" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val W = 64
      val mk = udf((id: Long) => Multimodal.overlapClipFromId(id, W))
      val media = Tables.documents(s, d).filter(col("doc_id") % 3 === 1)
        .select(col("doc_id").as("media_id"), mk(col("doc_id")).as("bytes"))
      Multimodal.audioDupPairs(media, windowLen = W, minShared = 1,
          maxClipsPerFingerprint = 16)
        .orderBy(col("a"), col("b"))
    }),

    // -- m17: HOPPED-window audio near-dup — the offset-recall lever
    // audioFingerprints grew in round 13. The planted corpus
    // (offsetClipFromId) shifts every shared segment by windowLen/2 in
    // exactly one side of each (id, id+3) dup pair (parity always
    // flips), so the grid lattice provably misses every PLANTED pair
    // (spec-pinned; what grid does report is 7-bit quantization
    // aliasing between unrelated segs — replayable, not the plant)
    // while hop = windowLen/2 recovers every planted pair at 2×
    // fingerprint mass. Cap 16 still BINDS (the full-silence opening
    // window is in every clip; the hopped lattice adds more silence
    // windows for odd ids); the oracle replays the whole hopped
    // lattice, fingerprints, capped census and pair counts
    // closed-form. ----------------------------------------------------
    "m17_audio_neardup_hopped" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val W = 64
      val mk = udf((id: Long) => Multimodal.offsetClipFromId(id, W))
      val media = Tables.documents(s, d).filter(col("doc_id") % 3 === 1)
        .select(col("doc_id").as("media_id"), mk(col("doc_id")).as("bytes"))
      Multimodal.audioDupPairs(media, windowLen = W, minShared = 1,
          maxClipsPerFingerprint = 16, hop = W / 2)
        .orderBy(col("a"), col("b"))
    }),

    // -- m18: video near-dup CLUSTER census — m14's pair graph carried
    // through regime-dispatched CC to the m15 cluster contract
    // (rep = min video id, n_members incl. singletons): all four
    // modalities now hand keepBestAssigned the same (id, rep) shape.
    // The oracle extends m14's closed-form pair replay with the d06
    // reachability closure; the result is CC-regime-independent. ------
    "m18_video_dup_clusters" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
        .filter(col("kind") === "video")
        .select(col("media_id"), col("bytes"))
      Multimodal.videoDupClusters(media, minShared = 1,
          maxVideosPerHash = 64)
        .orderBy(col("rep"))
    }),

    // -- m19: audio near-dup CLUSTER census — m16's pair graph through
    // the same CC seam (the last cell of the cluster-contract matrix).
    // Binding cap 16 as in m16; oracle = m16 pair replay + closure. ----
    "m19_audio_dup_clusters" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val W = 64
      val mk = udf((id: Long) => Multimodal.overlapClipFromId(id, W))
      val media = Tables.documents(s, d).filter(col("doc_id") % 3 === 1)
        .select(col("doc_id").as("media_id"), mk(col("doc_id")).as("bytes"))
      Multimodal.audioDupClusters(media, windowLen = W, minShared = 1,
          maxClipsPerFingerprint = 16)
        .orderBy(col("rep"))
    }),

    // -- m13: REAL FLAC audio ingestion — the LOSSLESS codec rung: each
    // clip's PCM16 samples are FLAC-encoded on the executors (pure-Scala
    // fixed-predictor profile, Rice residuals, CRC-8/16 per spec), then
    // the ingest front door (normalizeAudio) decodes the FLAC back to
    // canonical WAV and the m09 QC census runs unchanged. FLAC decode is
    // pure-integer and lossless, so unlike lossy JPEG (m11 tolerance)
    // this gate HASH-verifies the whole stage→decode→stats path against
    // the same closed-form sample formula that gates the WAV path. -----
    "m13_flac_ingest" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
        .filter(col("kind") === "audio")
        .select(col("media_id"), col("bytes"))
      val staged = Multimodal.transcodeToFlac(media, blockSize = 64)
      val normalized = Multimodal.normalizeAudio(staged)
      val qc = udf((b: Array[Byte]) =>
        Multimodal.decodeWavPcm(b) match {
          case Some((rate, ss)) =>
            var peak = 0L; var clip = 0L; var sq = 0L
            ss.foreach { v =>
              val a = math.abs(v.toLong)
              if (a > peak) peak = a
              if (a >= 32767) clip += 1
              sq += v.toLong * v
            }
            (rate.toLong, ss.length.toLong, peak, clip, sq)
          case None => (-1L, -1L, -1L, -1L, -1L)
        })
      normalized.select(col("media_id"), qc(col("bytes")).as("q"))
        .select(col("media_id"), col("q._1").as("sample_rate"),
          col("q._2").as("n_samples"), col("q._3").as("peak_abs"),
          col("q._4").as("n_clipped"), col("q._5").as("sum_sq"))
        .orderBy(col("media_id"))
    }),

    // -- m12: REAL MJPEG video ingestion — the codec ladder's video rung
    // (PNG → JPEG → MJPEG): each video's P6 frames are JPEG-encoded on
    // the executors and concatenated to the image2pipe MJPEG shape, then
    // the ingest path walks the JPEG stream with a real segment parser
    // (stuffed-byte-aware SOS skip — a naive FFD9 scan would split
    // inside entropy data) and decodes every frame back through the
    // batched JDK reader. Gated the m11 tolerance way per FRAME: frame
    // count and dims EXACT (sum_w hash-pins the decoded widths against
    // the closed-form synthetic formula), dHash Hamming <= 16 and
    // mean-RGB delta <= 24 per frame (the measured <=5x5 sub-MCU worst
    // case; MultimodalSpec pins real-sized frames at <= 2). -------------
    "m12_mjpeg_ingest" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
        .filter(col("kind") === "video")
        .select(col("media_id"), col("bytes"))
      val orig = Multimodal.frameStats(media)
      val mj = Multimodal.frameStats(Multimodal.transcodeToMjpeg(media))
        .select(col("media_id"), col("frame_idx"), col("w").as("jw"),
          col("h").as("jh"), col("dhash").as("jdhash"),
          col("mr_r").as("jmr_r"), col("mr_g").as("jmr_g"),
          col("mr_b").as("jmr_b"))
      orig.join(mj, Seq("media_id", "frame_idx"))
        .groupBy(col("media_id"))
        .agg(
          count(lit(1)).as("n_frames"),
          sum(col("jw").cast("long")).as("sum_w"),
          min(col("w") === col("jw") && col("h") === col("jh")).as("dims_ok"),
          min(bit_count(col("dhash").bitwiseXOR(col("jdhash"))) <= 16)
            .as("dhash_ok"),
          min(greatest(abs(col("mr_r") - col("jmr_r")),
            abs(col("mr_g") - col("jmr_g")),
            abs(col("mr_b") - col("jmr_b"))) <= 24.0).as("mean_ok"))
        .orderBy(col("media_id"))
    }),

    "m05_image_phash" -> ((s, d) => {
      val media = graft.multimodal.Multimodal
        .mediaFromDocuments(Tables.documents(s, d))
        .filter(col("kind") === "image")
      val dh = udf((b: Array[Byte]) =>
        graft.multimodal.Multimodal.dhashPpm(b).getOrElse(-1L))
      media.select(col("media_id"), dh(col("bytes")).as("phash"))
        .select(col("media_id"),
          expr("shiftrightunsigned(phash, 32)").as("phash_hi"),
          col("phash").bitwiseAND(lit(0xFFFFFFFFL)).as("phash_lo"))
        .groupBy(col("phash_hi"), col("phash_lo"))
        .agg(count(lit(1)).as("n"), min(col("media_id")).as("min_id"))
        .orderBy(col("n").desc, col("phash_hi"), col("phash_lo"))
    }),

    // -- Streaming CDC apply: the u02 changelog chopped into ascending
    // files and folded micro-batch by micro-batch into a per-key store
    // (winners + tombstones); latest-wins is a max, so the final store
    // must equal the one-shot batch apply — same oracle as u02.
    "st07_stream_cdc" -> ((s, d) => {
      val log = Tables.orders(s, d).select(
        col("o_custkey").as("custkey"),
        col("o_orderdate").as("ts"), col("o_orderkey").as("seq_id"),
        when(col("o_orderkey") % 7 === 0, "D").otherwise("U").as("op"),
        col("o_orderstatus").as("status"), col("o_totalprice").as("price"))
      graft.streaming.EventStreams.cdcApplyStreamed(s, log,
          s"target/qtmp/${d.replaceAll("[^a-zA-Z0-9]", "_")}/st07_stage",
          Seq("custkey"), Seq("ts", "seq_id"), "op")
        .select(col("custkey"), col("seq_id").as("last_orderkey"),
          col("status"), round(col("price"), 2).as("price"))
        .orderBy(col("custkey"))
    }),

    // -- Retrieval evaluation: nDCG@10 of the BM25 ranking against a
    // graded relevance (number of query terms present in the doc). The
    // ideal ordering scans the full pool, so missed high-relevance docs
    // are penalized — index → retrieve → EVALUATE, all replayable.
    "r03_ndcg_eval" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val ranked = Retrieval.bm25TopK(docs, "doc_id", "text", bm25Queries, 10)
        .select(col("query_id"), col("rk"), col("doc_id"))
      val q = bm25Queries.toDF("query_id", "terms")
      val rels = docs
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
        .crossJoin(broadcast(q))
        .select(col("query_id"), col("doc_id"),
          size(array_intersect(col("toks"), col("terms"))).as("rel"))
      Retrieval.ndcgAtK(ranked, rels, k = 10).orderBy(col("query_id"))
    }),

    // -- Retrieval evaluation MRR + recall@10: reciprocal rank of the
    // first relevant hit and fraction of the relevant pool retrieved —
    // r03's companions; eval cost scales with |queries|·k. -------------
    "r04_mrr_recall" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d)
      val ranked = Retrieval.bm25TopK(docs, "doc_id", "text", bm25Queries, 10)
        .select(col("query_id"), col("rk"), col("doc_id"))
      val q = bm25Queries.toDF("query_id", "terms")
      val rels = docs
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
        .crossJoin(broadcast(q))
        .select(col("query_id"), col("doc_id"),
          size(array_intersect(col("toks"), col("terms"))).as("rel"))
      Retrieval.rrAndRecallAtK(ranked, rels, k = 10).orderBy(col("query_id"))
    }),

    // -- Incremental aggregate maintenance: base agg (orders before the
    // cut) merged with the delta agg (after) must equal the full-scan
    // aggregate — the materialized-view refresh law. Integer cents keep
    // the merge exactly associative across engines.
    "u03_incremental_agg" -> ((s, d) => {
      val cut = lit("1998-01-01").cast("timestamp")
      val o = Tables.orders(s, d).select(
        col("o_custkey").as("custkey"), col("o_orderdate").as("dt"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      def aggOf(df: DataFrame): DataFrame = df.groupBy(col("custkey"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      Maintenance.mergeGroupedSums(
          aggOf(o.filter(col("dt") < cut)), aggOf(o.filter(col("dt") >= cut)),
          Seq("custkey"), Seq("n", "sum_cents"))
        .orderBy(col("custkey"))
    }),

    // -- Streaming incremental aggregation: order rows streamed in
    // micro-batches, each folded into a per-customer aggregate store —
    // u03's materialized-view refresh law driven by a real stream, so
    // the final store must equal the full-scan aggregate (same oracle).
    "st08_stream_agg" -> ((s, d) => {
      val rows = Tables.orders(s, d).select(
        col("o_custkey").as("custkey"), col("o_orderdate").as("ts"),
        lit(1L).as("n"),
        round(col("o_totalprice") * 100).cast("long").as("sum_cents"))
      graft.streaming.EventStreams.incrementalAggStreamed(s, rows,
          s"target/qtmp/${d.replaceAll("[^a-zA-Z0-9]", "_")}/st08_stage",
          Seq("custkey"), Seq("n", "sum_cents"))
        .orderBy(col("custkey"))
    }),

    // -- right-to-be-forgotten sweep: delete a key list across TABLES
    // (events + orders) via anti-joins, prove zero residue and exact
    // survivor counts in one output row -------------------------------
    "u08_forget_keys" -> ((s, d) => {
      val forget = Tables.events(s, d).select(col("user_id")).distinct()
        .filter(col("user_id") % 97 === 0)
      val evClean = Tables.events(s, d)
        .join(forget, Seq("user_id"), "left_anti")
      val ordClean = Tables.orders(s, d)
        .join(forget.withColumnRenamed("user_id", "o_custkey"),
          Seq("o_custkey"), "left_anti")
      val evStats = evClean.agg(count(lit(1)).as("ev_rows"),
        countDistinct(col("user_id")).as("ev_users"))
      val ordStats = ordClean.agg(count(lit(1)).as("ord_rows"))
      val evResidue = evClean.join(forget, Seq("user_id"), "left_semi")
        .agg(count(lit(1)).as("ev_residue"))
      val ordResidue = ordClean
        .join(forget.withColumnRenamed("user_id", "o_custkey"),
          Seq("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("ord_residue"))
      evStats.crossJoin(ordStats).crossJoin(evResidue).crossJoin(ordResidue)
    }),

    // -- snapshot-log TIME TRAVEL: the CDC store archived per epoch;
    // "VERSION AS OF k" must equal the one-shot apply of the changelog
    // prefix that had streamed in by epoch k (replayable because the
    // staging chop is an ntile over the UNIQUE orderkey-derived ts). ----
    "u07_time_travel" -> ((s, d) => {
      val stage = s"target/qtmp/${d.replaceAll("[^a-zA-Z0-9]", "_")}/u07_stage"
      val log = Tables.orders(s, d).select(
        timestamp_micros(col("o_orderkey")).as("ts"),
        col("o_custkey").as("custkey"), col("o_orderkey").as("seq_id"),
        when(col("o_orderkey") % 7 === 0, "D").otherwise("U").as("op"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      graft.streaming.EventStreams.cdcApplyVersioned(s, log, stage,
        Seq("custkey"), Seq("seq_id"), "op", nFiles = 3)
      (0 to 2).map { v =>
        graft.streaming.EventStreams.asOfVersion(s, stage, v.toLong)
          .filter(col("op") =!= "D")
          .agg(count(lit(1)).as("n_live"), sum(col("cents")).as("sum_cents"),
            sum(col("custkey")).as("key_checksum"))
          .select(lit(v.toLong).as("version"), col("n_live"),
            col("sum_cents"), col("key_checksum"))
      }.reduce(_ unionByName _).orderBy(col("version"))
    }),

    // -- PMI collocations: top-25 adjacent-bigram associations -----------
    // pmi = ln( (c_ab/Nb) / ((c_a/Nt)(c_b/Nt)) ), min bigram count 5.
    // All count tables are vocabulary-sized; scalars broadcast. The uni
    // and cb count tables each feed MULTIPLE consumers (scalar totals +
    // joins); localCheckpoint pins the vocabulary-sized results so the
    // corpus is exploded exactly twice, not once per consumer (measured
    // 2.5s -> ~1s at sf0.1; same lineage-truncation discipline as g01).
    "t21_pmi_collocations" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // materialize the split ONCE as a projected column: element_at on a
      // raw `split(...)` expression inside the transform lambda re-splits
      // the text per element (O(n^2) per doc — measured 3.6s -> 0.3s for
      // the bigram stage at sf0.1)
      val tk = docs.select(split(col("text"), " ").as("tk"))
      val uni = tk.select(explode(col("tk")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cu"))
        .localCheckpoint()
      val nt = uni.agg(sum(col("cu")).cast("double").as("n_tok"))
      val bg = tk.filter(size(col("tk")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("tk")) - 1),
          i => struct(element_at(col("tk"), i).as("w1"),
            element_at(col("tk"), i + 1).as("w2")))).as("p"))
        .select(col("p.w1"), col("p.w2"))
      val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
        .localCheckpoint()
      val nb = cb.agg(sum(col("cb")).cast("double").as("n_bg"))
      val pmi = log((col("cb") / col("n_bg")) /
        ((col("c1") / col("n_tok")) * (col("c2") / col("n_tok"))))
      cb.filter(col("cb") >= 5)
        .join(broadcast(uni.select(col("w").as("w1"), col("cu").as("c1"))), "w1")
        .join(broadcast(uni.select(col("w").as("w2"), col("cu").as("c2"))), "w2")
        .crossJoin(broadcast(nt)).crossJoin(broadcast(nb))
        .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"),
          col("cb").as("n"),
          round(floor(pmi * 1e12 + lit(0.5)) / 1e12, 4).as("pmi"))
        .orderBy(col("pmi").desc, col("bigram"))
        .limit(25)
    }))

  val oracles: Map[String, String] = Map(
    // u10: pruning must be invisible to results — the oracle is the plain
    // full-scan filter over the original table
    "u10_data_skipping" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 3000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // u16: the surviving row set is SQL-derivable because the staging is
    // width-based — buckets 6-7 (deleted) hold l_orderkey > 6·w, the
    // query range starts at 4·w+1, so what remains in range is
    // (4w, 6w]; w = ceil(max/8) in exact integer arithmetic
    "u16_stats_after_delete" ->
      """WITH par AS (SELECT (max(l_orderkey) + 7) // 8 AS w FROM lineitem)
        |SELECT l_returnflag, count(*) AS n,
        | round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem, par
        |WHERE l_orderkey > 4 * w AND l_orderkey <= 6 * w
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // u18: same mutation arithmetic, change classification by explicit
    // full-outer value comparison (vs the operator's digest plan)
    "u18_snapshot_diff" ->
      """WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_totalprice FROM orders),
        |nxt AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM base WHERE o_orderkey % 13 != 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_custkey, 'N', o_totalprice
        |  FROM base WHERE o_orderkey % 17 = 0),
        |d AS (SELECT coalesce(b.o_orderkey, n.o_orderkey) AS o_orderkey,
        |  CASE WHEN b.o_orderkey IS NULL THEN 'A'
        |       WHEN n.o_orderkey IS NULL THEN 'R'
        |       WHEN b.o_custkey IS DISTINCT FROM n.o_custkey
        |         OR b.o_orderstatus IS DISTINCT FROM n.o_orderstatus
        |         OR b.o_totalprice IS DISTINCT FROM n.o_totalprice
        |       THEN 'C' END AS change
        | FROM base b FULL OUTER JOIN nxt n ON b.o_orderkey = n.o_orderkey)
        |SELECT o_orderkey, change FROM d WHERE change IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    // u14: both forks of the single pass saw every row — the observed
    // metrics and the written files' aggregates are the same numbers
    "u14_fork_write" ->
      """SELECT count(*) AS n_obs, round(sum(l_quantity), 2) AS sum_obs,
        | count(*) AS n_file, round(sum(l_quantity), 2) AS sum_file
        |FROM lineitem""".stripMargin,
    // u15: per-column UNION ALL replay of the one-pass profile
    "u15_table_profile" ->
      """WITH t AS (SELECT l_orderkey, l_quantity, l_returnflag,
        |    nullif(l_returnflag, 'A') AS flag_n FROM lineitem),
        |n AS (SELECT count(*) AS n_rows FROM t)
        |SELECT * FROM (
        | SELECT 'flag_n' AS col_name, n.n_rows,
        |  n.n_rows - count(flag_n) AS n_null,
        |  count(DISTINCT flag_n) AS n_distinct,
        |  CAST(min(flag_n) AS VARCHAR) AS min_value,
        |  CAST(max(flag_n) AS VARCHAR) AS max_value
        | FROM t, n GROUP BY n.n_rows
        | UNION ALL
        | SELECT 'l_orderkey', n.n_rows, n.n_rows - count(l_orderkey),
        |  count(DISTINCT l_orderkey), CAST(min(l_orderkey) AS VARCHAR),
        |  CAST(max(l_orderkey) AS VARCHAR) FROM t, n GROUP BY n.n_rows
        | UNION ALL
        | SELECT 'l_quantity', n.n_rows, n.n_rows - count(l_quantity),
        |  count(DISTINCT l_quantity), CAST(min(l_quantity) AS VARCHAR),
        |  CAST(max(l_quantity) AS VARCHAR) FROM t, n GROUP BY n.n_rows
        | UNION ALL
        | SELECT 'l_returnflag', n.n_rows, n.n_rows - count(l_returnflag),
        |  count(DISTINCT l_returnflag), CAST(min(l_returnflag) AS VARCHAR),
        |  CAST(max(l_returnflag) AS VARCHAR) FROM t, n GROUP BY n.n_rows
        |) ORDER BY col_name""".stripMargin,
    // u10b: steady-state path, same invisibility contract as u10
    "u10b_pruned_scan" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 3000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // u12: same per-row term (48-bit md5 prefix of the |-joined values,
    // \N null sentinel) and the same mod-2³¹−1 sum
    "u12_content_fingerprint" ->
      """WITH t AS (SELECT ('0x'||substr(md5(
        |    coalesce(l_orderkey::VARCHAR, '\N') || '|' ||
        |    coalesce(l_partkey::VARCHAR, '\N') || '|' ||
        |    coalesce(l_linenumber::VARCHAR, '\N') || '|' ||
        |    coalesce(l_quantity::VARCHAR, '\N') || '|' ||
        |    coalesce(l_returnflag, '\N')), 1, 12))::BIGINT % 2147483647 AS v
        |  FROM lineitem)
        |SELECT CAST(sum(v) % 2147483647 AS BIGINT) AS content_fp,
        |  count(*) AS n_rows, TRUE AS layout_invariant FROM t""".stripMargin,
    // g07: 4 unrolled peel rounds (extra rounds are no-ops past the
    // fixpoint); bipartite ids never collide so least/greatest
    // canonicalization reduces to (user, page+1e6)
    "g07_kcore" ->
      """WITH e0 AS (SELECT DISTINCT user_id AS a,
        |    1000000 + CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)
        |      AS b
        |  FROM events),
        |d1 AS (SELECT n, count(*) AS d FROM
        |  (SELECT a AS n FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1),
        |x1 AS (SELECT n FROM d1 WHERE d < 45),
        |e1 AS (SELECT a, b FROM e0 WHERE a NOT IN (SELECT n FROM x1)
        |  AND b NOT IN (SELECT n FROM x1)),
        |d2 AS (SELECT n, count(*) AS d FROM
        |  (SELECT a AS n FROM e1 UNION ALL SELECT b FROM e1) GROUP BY 1),
        |x2 AS (SELECT n FROM d2 WHERE d < 45),
        |e2 AS (SELECT a, b FROM e1 WHERE a NOT IN (SELECT n FROM x2)
        |  AND b NOT IN (SELECT n FROM x2)),
        |d3 AS (SELECT n, count(*) AS d FROM
        |  (SELECT a AS n FROM e2 UNION ALL SELECT b FROM e2) GROUP BY 1),
        |x3 AS (SELECT n FROM d3 WHERE d < 45),
        |e3 AS (SELECT a, b FROM e2 WHERE a NOT IN (SELECT n FROM x3)
        |  AND b NOT IN (SELECT n FROM x3)),
        |d4 AS (SELECT n, count(*) AS d FROM
        |  (SELECT a AS n FROM e3 UNION ALL SELECT b FROM e3) GROUP BY 1),
        |x4 AS (SELECT n FROM d4 WHERE d < 45),
        |e4 AS (SELECT a, b FROM e3 WHERE a NOT IN (SELECT n FROM x4)
        |  AND b NOT IN (SELECT n FROM x4))
        |SELECT CASE WHEN node < 1000000 THEN 'user' ELSE 'page' END
        |    AS node_type,
        |  CASE WHEN node < 1000000 THEN node ELSE node - 1000000 END
        |    AS node_id,
        |  CAST(count(*) AS BIGINT) AS degree
        |FROM (SELECT a AS node FROM e4 UNION ALL SELECT b FROM e4)
        |GROUP BY 1, 2 ORDER BY node_type, node_id""".stripMargin,
    "g06_avg_nbr_degree" ->
      """WITH kx AS (SELECT user_id, ts, event_id,
        |    CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        |  FROM events),
        |seq AS (SELECT user_id, k AS dst,
        |    lag(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
        |  FROM kx),
        |e0 AS (SELECT DISTINCT src, dst FROM seq
        |       WHERE src IS NOT NULL AND src <> dst),
        |e AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
        |      FROM e0 WHERE src <> dst),
        |adj AS (SELECT lo AS node, hi AS nbr FROM e
        |        UNION ALL SELECT hi, lo FROM e),
        |deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY 1)
        |SELECT adj.node, CAST(count(*) AS BIGINT) AS deg,
        |  round(floor(CAST(sum(d2.deg) AS BIGINT)::DOUBLE / count(*) * 1e12
        |    + 0.5) / 1e12, 6) AS avg_nbr_deg
        |FROM adj JOIN deg d2 ON d2.node = adj.nbr
        |GROUP BY adj.node ORDER BY adj.node""".stripMargin,
    "t25_lexical_diversity" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |cf AS (SELECT w, count(*) AS cf FROM toks GROUP BY 1)
        |SELECT toks.doc_id, count(*) AS n_tokens,
        |  count(DISTINCT toks.w) AS n_types,
        |  CAST(sum(CASE WHEN cf.cf = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  round(floor(count(DISTINCT toks.w)::DOUBLE / count(*) * 1e12 + 0.5)
        |    / 1e12, 6) AS ttr
        |FROM toks JOIN cf USING (w)
        |GROUP BY toks.doc_id ORDER BY doc_id""".stripMargin,
    "g04_jaccard_nbrs" ->
      """WITH kx AS (SELECT user_id, ts, event_id,
        |    CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        |  FROM events),
        |seq AS (SELECT user_id, k AS dst,
        |    lag(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
        |  FROM kx),
        |e0 AS (SELECT DISTINCT src, dst FROM seq
        |       WHERE src IS NOT NULL AND src <> dst),
        |e AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
        |      FROM e0 WHERE src <> dst),
        |adj AS (SELECT lo AS node, hi AS nbr FROM e
        |        UNION ALL SELECT hi, lo FROM e),
        |deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY 1),
        |cm AS (SELECT a.node AS u, b.node AS v, count(*) AS common
        |  FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
        |  GROUP BY 1, 2)
        |SELECT cm.u, cm.v, cm.common,
        |  round(cm.common::DOUBLE / (du.deg + dv.deg - cm.common), 6) AS jaccard
        |FROM cm JOIN deg du ON du.node = cm.u JOIN deg dv ON dv.node = cm.v
        |ORDER BY jaccard DESC, u, v LIMIT 25""".stripMargin,
    "c10_assoc_rules" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_distinct(string_split(text, ' '))) AS term
        |  FROM documents),
        |nd AS (SELECT count(*) AS nd FROM documents),
        |dfx AS (SELECT term, count(*) AS df FROM toks GROUP BY 1),
        |topv AS (SELECT term, df FROM dfx ORDER BY df DESC, term LIMIT 50),
        |f AS (SELECT doc_id, term FROM toks
        |      WHERE term IN (SELECT term FROM topv)),
        |p AS (SELECT a.term AS t1, b.term AS t2, count(*) AS n_pair
        |  FROM f a JOIN f b ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY 1, 2)
        |SELECT p.t1, p.t2, p.n_pair,
        |  round(p.n_pair::DOUBLE / d1.df, 6) AS conf_12,
        |  round(p.n_pair::DOUBLE / d2.df, 6) AS conf_21,
        |  round((p.n_pair * nd.nd)::DOUBLE / (d1.df * d2.df), 6) AS lift
        |FROM p JOIN topv d1 ON d1.term = p.t1
        |  JOIN topv d2 ON d2.term = p.t2 CROSS JOIN nd
        |WHERE p.n_pair >= 5
        |ORDER BY lift DESC, t1, t2 LIMIT 25""".stripMargin,
    "c06_cooccurrence" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_distinct(string_split(text, ' '))) AS term
        |  FROM documents),
        |dfx AS (SELECT term, count(*) AS df FROM toks GROUP BY 1),
        |topv AS (SELECT term FROM dfx ORDER BY df DESC, term LIMIT 50),
        |f AS (SELECT doc_id, term FROM toks
        |      WHERE term IN (SELECT term FROM topv)),
        |p AS (SELECT a.term AS t1, b.term AS t2, count(*) AS n_docs
        |  FROM f a JOIN f b ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY 1, 2)
        |SELECT t1, t2, n_docs FROM p WHERE n_docs >= 5
        |ORDER BY n_docs DESC, t1, t2 LIMIT 25""".stripMargin,
    "r01_bm25_topk" ->
      """WITH q(query_id, term) AS (VALUES
        |  (0, 'hash'), (0, 'join'), (0, 'merge'),
        |  (1, 'scan'), (1, 'filter'), (1, 'table'),
        |  (2, 'stream'), (2, 'window'), (2, 'agg')),
        |t AS (SELECT doc_id AS id, len(string_split(text,' ')) AS dl,
        |        unnest(string_split(text,' ')) AS term FROM documents),
        |st AS (SELECT count(*)::DOUBLE AS n_docs,
        |         sum(len(string_split(text,' ')))::DOUBLE / count(*) AS avgdl
        |       FROM documents),
        |h AS (SELECT * FROM t WHERE term IN (SELECT term FROM q)),
        |tf AS (SELECT id, term, count(*) AS tf, min(dl) AS dl
        |       FROM h GROUP BY 1, 2),
        |df AS (SELECT term, count(DISTINCT id) AS df FROM h GROUP BY 1),
        |c AS (SELECT q.query_id, tf.id AS doc_id,
        |    floor(ln(1.0 + (st.n_docs - df.df + 0.5) / (df.df + 0.5))
        |      * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))
        |      * 1e12 + 0.5) / 1e12 AS contrib
        |  FROM tf JOIN df USING (term) JOIN q USING (term) CROSS JOIN st),
        |sc AS (SELECT query_id, doc_id,
        |         floor(sum(contrib) * 1e12 + 0.5) / 1e12 AS score
        |       FROM c GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, doc_id) AS rk FROM sc)
        |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rk AS INT) AS rk,
        |  doc_id, round(score, 4) AS score
        |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin,
    "r02_rrf_hybrid" ->
      """WITH base AS (
        |  SELECT d.doc_id AS id, list_distinct(string_split(d.text,' ')) AS toks,
        |         e.embedding AS vec
        |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id),
        |qs AS (SELECT id AS query_id, toks AS q_toks, vec AS q_vec
        |       FROM base WHERE id < 3),
        |sc AS (SELECT qs.query_id, b.id,
        |    len(list_intersect(b.toks, qs.q_toks))::DOUBLE /
        |      (len(b.toks) + len(qs.q_toks)
        |        - len(list_intersect(b.toks, qs.q_toks))) AS jacc,
        |    CAST(list_cosine_similarity(b.vec, qs.q_vec) AS DOUBLE) AS cos
        |  FROM base b JOIN qs ON b.id <> qs.query_id),
        |rk AS (SELECT *,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY jacc DESC, id) AS r_lex,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, id) AS r_dense
        |  FROM sc),
        |f AS (SELECT query_id, id,
        |    floor((1.0/(60 + r_lex) + 1.0/(60 + r_dense)) * 1e12 + 0.5) / 1e12
        |      AS rrf, r_lex, r_dense
        |  FROM rk),
        |t AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY rrf DESC, id) AS rk FROM f)
        |SELECT query_id, CAST(rk AS INT) AS rk, id AS doc_id,
        |  round(rrf, 6) AS rrf, CAST(r_lex AS INT) AS r_lex,
        |  CAST(r_dense AS INT) AS r_dense
        |FROM t WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin,
    "g03_triangles" ->
      """WITH kx AS (SELECT user_id, ts, event_id,
        |    CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
        |  FROM events),
        |seq AS (SELECT user_id, k AS dst,
        |    lag(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
        |  FROM kx),
        |e0 AS (SELECT DISTINCT src, dst FROM seq
        |       WHERE src IS NOT NULL AND src <> dst),
        |e AS (SELECT DISTINCT least(src, dst) AS lo, greatest(src, dst) AS hi
        |      FROM e0 WHERE src <> dst),
        |tri AS (SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
        |  FROM e ab JOIN e bc ON bc.lo = ab.hi
        |  JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi),
        |n AS (SELECT unnest([a, b, c]) AS node FROM tri)
        |SELECT node, count(*) AS triangles FROM n
        |GROUP BY node ORDER BY triangles DESC, node LIMIT 25""".stripMargin,
    "c02_cohort_retention" ->
      """WITH ev AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1)
        |SELECT c.cohort_wk,
        |  CAST(datediff('day', CAST(c.cohort_wk AS DATE), CAST(ev.wk AS DATE)) // 7
        |    AS BIGINT) AS week_offset,
        |  count(DISTINCT ev.user_id) AS active_users
        |FROM ev JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_wk, week_offset""".stripMargin,
    "u02_cdc_apply" ->
      """WITH log AS (SELECT o_custkey AS custkey, o_orderdate AS seq_ts,
        |    o_orderkey AS seq_id,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
        |    o_orderstatus AS status, o_totalprice AS price
        |  FROM orders),
        |r AS (SELECT *, row_number() OVER (PARTITION BY custkey
        |        ORDER BY seq_ts DESC, seq_id DESC, op DESC) AS rn FROM log)
        |SELECT custkey, seq_id AS last_orderkey, status,
        |  round(price, 2) AS price
        |FROM r WHERE rn = 1 AND op <> 'D' ORDER BY custkey""".stripMargin,
    // same BM25 pipeline as r01, then DCG/IDCG with the identical nested
    // 1e-12 floors; relevance = |query terms ∩ doc tokens|
    "r03_ndcg_eval" ->
      """WITH q(query_id, term) AS (VALUES
        |  (0, 'hash'), (0, 'join'), (0, 'merge'),
        |  (1, 'scan'), (1, 'filter'), (1, 'table'),
        |  (2, 'stream'), (2, 'window'), (2, 'agg')),
        |t AS (SELECT doc_id AS id, len(string_split(text,' ')) AS dl,
        |        unnest(string_split(text,' ')) AS term FROM documents),
        |st AS (SELECT count(*)::DOUBLE AS n_docs,
        |         sum(len(string_split(text,' ')))::DOUBLE / count(*) AS avgdl
        |       FROM documents),
        |h AS (SELECT * FROM t WHERE term IN (SELECT term FROM q)),
        |tf AS (SELECT id, term, count(*) AS tf, min(dl) AS dl
        |       FROM h GROUP BY 1, 2),
        |dfr AS (SELECT term, count(DISTINCT id) AS df FROM h GROUP BY 1),
        |c AS (SELECT q.query_id, tf.id AS doc_id,
        |    floor(ln(1.0 + (st.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
        |      * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))
        |      * 1e12 + 0.5) / 1e12 AS contrib
        |  FROM tf JOIN dfr USING (term) JOIN q USING (term) CROSS JOIN st),
        |sc AS (SELECT query_id, doc_id,
        |         floor(sum(contrib) * 1e12 + 0.5) / 1e12 AS score
        |       FROM c GROUP BY 1, 2),
        |rnk AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY
        |        query_id ORDER BY score DESC, doc_id) AS rk FROM sc),
        |ranked AS (SELECT query_id, rk, doc_id FROM rnk WHERE rk <= 10),
        |qa AS (SELECT query_id, list(term) AS terms FROM q GROUP BY 1),
        |rels AS (SELECT qa.query_id, d.doc_id,
        |    len(list_intersect(list_distinct(string_split(d.text,' ')),
        |        qa.terms)) AS rel
        |  FROM documents d CROSS JOIN qa),
        |dcg AS (SELECT ranked.query_id,
        |    floor(sum(floor(coalesce(rels.rel, 0)
        |      / (ln(CAST(ranked.rk + 1 AS DOUBLE)) / ln(2.0))
        |      * 1e12 + 0.5) / 1e12) * 1e12 + 0.5) / 1e12 AS dcg
        |  FROM ranked LEFT JOIN rels ON rels.query_id = ranked.query_id
        |    AND rels.doc_id = ranked.doc_id
        |  GROUP BY 1),
        |ir AS (SELECT query_id, doc_id, rel, row_number() OVER (PARTITION BY
        |        query_id ORDER BY rel DESC, doc_id) AS irk FROM rels),
        |idcg AS (SELECT query_id,
        |    floor(sum(floor(rel / (ln(CAST(irk + 1 AS DOUBLE)) / ln(2.0))
        |      * 1e12 + 0.5) / 1e12) * 1e12 + 0.5) / 1e12 AS idcg
        |  FROM ir WHERE irk <= 10 AND rel > 0 GROUP BY 1)
        |SELECT CAST(dcg.query_id AS BIGINT) AS query_id,
        |  round(CASE WHEN coalesce(idcg.idcg, 0) = 0 THEN 0.0
        |    ELSE floor(dcg.dcg / idcg.idcg * 1e12 + 0.5) / 1e12 END, 6) AS ndcg
        |FROM dcg LEFT JOIN idcg USING (query_id)
        |ORDER BY query_id""".stripMargin,
    // same BM25 CTEs as r01/r03; then first-relevant rank + pool recall
    "r04_mrr_recall" ->
      """WITH q(query_id, term) AS (VALUES
        |  (0, 'hash'), (0, 'join'), (0, 'merge'),
        |  (1, 'scan'), (1, 'filter'), (1, 'table'),
        |  (2, 'stream'), (2, 'window'), (2, 'agg')),
        |t AS (SELECT doc_id AS id, len(string_split(text,' ')) AS dl,
        |        unnest(string_split(text,' ')) AS term FROM documents),
        |st AS (SELECT count(*)::DOUBLE AS n_docs,
        |         sum(len(string_split(text,' ')))::DOUBLE / count(*) AS avgdl
        |       FROM documents),
        |h AS (SELECT * FROM t WHERE term IN (SELECT term FROM q)),
        |tf AS (SELECT id, term, count(*) AS tf, min(dl) AS dl
        |       FROM h GROUP BY 1, 2),
        |dfr AS (SELECT term, count(DISTINCT id) AS df FROM h GROUP BY 1),
        |c AS (SELECT q.query_id, tf.id AS doc_id,
        |    floor(ln(1.0 + (st.n_docs - dfr.df + 0.5) / (dfr.df + 0.5))
        |      * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / st.avgdl))
        |      * 1e12 + 0.5) / 1e12 AS contrib
        |  FROM tf JOIN dfr USING (term) JOIN q USING (term) CROSS JOIN st),
        |sc AS (SELECT query_id, doc_id,
        |         floor(sum(contrib) * 1e12 + 0.5) / 1e12 AS score
        |       FROM c GROUP BY 1, 2),
        |rnk AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY
        |        query_id ORDER BY score DESC, doc_id) AS rk FROM sc),
        |ranked AS (SELECT query_id, rk, doc_id FROM rnk WHERE rk <= 10),
        |qa AS (SELECT query_id, list(term) AS terms FROM q GROUP BY 1),
        |rels AS (SELECT qa.query_id, d.doc_id,
        |    len(list_intersect(list_distinct(string_split(d.text,' ')),
        |        qa.terms)) AS rel
        |  FROM documents d CROSS JOIN qa),
        |hits AS (SELECT ranked.query_id, min(ranked.rk) AS frk,
        |    count(*) AS nret
        |  FROM ranked JOIN rels ON rels.query_id = ranked.query_id
        |    AND rels.doc_id = ranked.doc_id AND rels.rel > 0
        |  GROUP BY 1),
        |pool AS (SELECT query_id, count(*) AS nrel FROM rels
        |  WHERE rel > 0 GROUP BY 1)
        |SELECT CAST(pool.query_id AS BIGINT) AS query_id,
        |  round(coalesce(1.0 / hits.frk, 0.0), 6) AS rr,
        |  round(coalesce(hits.nret, 0)::DOUBLE / pool.nrel, 6) AS recall_at_k
        |FROM pool LEFT JOIN hits USING (query_id)
        |ORDER BY query_id""".stripMargin,
    "u03_incremental_agg" ->
      """SELECT o_custkey AS custkey, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin,
    "st08_stream_agg" ->
      """SELECT o_custkey AS custkey, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders GROUP BY 1 ORDER BY custkey""".stripMargin,
    // dHash replay: grayscale at grid (x,y) is integer math on the
    // closed-form pixel bytes (id*31 + byteoffset) % 256; lead() compares
    // horizontal neighbors; the two uint32 halves are exact BIGINT sums
    // m09: sample i = ((id*37 + i*13) % 4001) - 2000, n = id%50+20 —
    // audio docs are doc_id % 3 = 1
    "m09_audio_quality" ->
      """WITH au AS (SELECT doc_id, (doc_id % 50 + 20)::INT AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |sm AS (SELECT doc_id, n,
        |    ((doc_id*37 + unnest(range(0, n))*13) % 4001) - 2000 AS s
        |  FROM au)
        |SELECT doc_id AS media_id, CAST(max(n) AS BIGINT) AS n_samples,
        | CAST(max(abs(s)) AS BIGINT) AS peak_abs,
        | CAST(sum(CASE WHEN abs(s) >= 32767 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_clipped,
        | CAST(sum(s * s) AS BIGINT) AS sum_sq
        |FROM sm GROUP BY doc_id ORDER BY media_id""".stripMargin,
    // m15: m05's per-image dHash CTE → hash census → band-join pairs
    // (the band predicate is pigeonhole-redundant at Hamming ≤ 3 but
    // kept so the oracle mirrors the operator) → reachability closure
    // (the d06 recursive idiom) over HUGEINT hash keys → unsigned-min
    // rep per cluster, split into uint32 halves
    "m15_image_neardup" ->
      """WITH RECURSIVE m AS (SELECT doc_id, (doc_id % 5) + 1 AS w,
        |    (doc_id % 4) + 2 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |g AS (SELECT m.doc_id, ys.y, xs.x,
        |    (((m.doc_id*31 + 3*(((ys.y*m.h)//8)*m.w + (xs.x*m.w)//9)) % 256)
        |     + ((m.doc_id*31 + 3*(((ys.y*m.h)//8)*m.w + (xs.x*m.w)//9) + 1) % 256)
        |     + ((m.doc_id*31 + 3*(((ys.y*m.h)//8)*m.w + (xs.x*m.w)//9) + 2) % 256)
        |    ) // 3 AS gv
        |  FROM m
        |  CROSS JOIN generate_series(0, 7) AS ys(y)
        |  CROSS JOIN generate_series(0, 8) AS xs(x)),
        |b AS (SELECT doc_id, y, x, gv,
        |    lead(gv) OVER (PARTITION BY doc_id, y ORDER BY x) AS nxt
        |  FROM g),
        |bits AS (SELECT doc_id, y*8 + x AS bit FROM b
        |         WHERE x < 8 AND nxt > gv),
        |hash AS (SELECT m.doc_id,
        |    CAST(coalesce(sum(CASE WHEN bit >= 32
        |      THEN (CAST(1 AS BIGINT) << (bit - 32)) END), 0) AS BIGINT) AS hi,
        |    CAST(coalesce(sum(CASE WHEN bit < 32
        |      THEN (CAST(1 AS BIGINT) << bit) END), 0) AS BIGINT) AS lo
        |  FROM m LEFT JOIN bits ON bits.doc_id = m.doc_id
        |  GROUP BY m.doc_id),
        |census AS (SELECT hi, lo,
        |    CAST(hi AS HUGEINT) * 4294967296 + lo AS k,
        |    count(*)::BIGINT AS n
        |  FROM hash GROUP BY hi, lo),
        |pairs AS (SELECT x.k AS a, y.k AS b
        |  FROM census x JOIN census y ON x.k < y.k
        |  WHERE (bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))) <= 3
        |    AND ((x.lo & 65535) = (y.lo & 65535)
        |      OR ((x.lo >> 16) & 65535) = ((y.lo >> 16) & 65535)
        |      OR (x.hi & 65535) = (y.hi & 65535)
        |      OR ((x.hi >> 16) & 65535) = ((y.hi >> 16) & 65535))),
        |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
        |reach(id, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
        |rep AS (SELECT id, min(r) AS rep FROM reach GROUP BY id),
        |cl AS (SELECT coalesce(rep.rep, c.k) AS repk, c.n
        |  FROM census c LEFT JOIN rep ON rep.id = c.k)
        |SELECT CAST(repk // 4294967296 AS BIGINT) AS rep_hi,
        |  CAST(repk % 4294967296 AS BIGINT) AS rep_lo,
        |  CAST(sum(n) AS BIGINT) AS n_images, count(*)::BIGINT AS n_hashes
        |FROM cl GROUP BY repk ORDER BY rep_hi, rep_lo""".stripMargin,
    // m14: per-(video, frame) dHash replayed closed-form (m05's hash CTE
    // with the frame image id fid = doc_id + j), split into two uint32
    // halves for exact BIGINT math; distinct-per-video, the 2..64 hash
    // census, and the pair count are plain relational algebra
    "m14_video_dedup" ->
      """WITH v AS (SELECT doc_id, ((doc_id % 4) + 2)::INT AS nf
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (SELECT doc_id, doc_id + unnest(range(0, nf)) AS fid FROM v),
        |fm AS (SELECT doc_id, fid, ((fid % 5) + 1)::BIGINT AS w,
        |    ((fid % 4) + 2)::BIGINT AS h FROM fr),
        |g AS (SELECT fm.doc_id, fm.fid, ys.y, xs.x,
        |    (((fm.fid*31 + 3*(((ys.y*fm.h)//8)*fm.w + (xs.x*fm.w)//9)) % 256)
        |     + ((fm.fid*31 + 3*(((ys.y*fm.h)//8)*fm.w + (xs.x*fm.w)//9) + 1) % 256)
        |     + ((fm.fid*31 + 3*(((ys.y*fm.h)//8)*fm.w + (xs.x*fm.w)//9) + 2) % 256)
        |    ) // 3 AS gv
        |  FROM fm
        |  CROSS JOIN generate_series(0, 7) AS ys(y)
        |  CROSS JOIN generate_series(0, 8) AS xs(x)),
        |b AS (SELECT doc_id, fid, y, x, gv,
        |    lead(gv) OVER (PARTITION BY doc_id, fid, y ORDER BY x) AS nxt
        |  FROM g),
        |bits AS (SELECT doc_id, fid, y*8 + x AS bit FROM b
        |         WHERE x < 8 AND nxt > gv),
        |hash AS (SELECT f.doc_id, f.fid,
        |    CAST(coalesce(sum(CASE WHEN bit >= 32
        |      THEN (CAST(1 AS BIGINT) << (bit - 32)) END), 0) AS BIGINT) AS hi,
        |    CAST(coalesce(sum(CASE WHEN bit < 32
        |      THEN (CAST(1 AS BIGINT) << bit) END), 0) AS BIGINT) AS lo
        |  FROM fm f LEFT JOIN bits ON bits.doc_id = f.doc_id
        |    AND bits.fid = f.fid
        |  GROUP BY f.doc_id, f.fid),
        |vh AS (SELECT DISTINCT doc_id, hi, lo FROM hash),
        |census AS (SELECT hi, lo FROM vh GROUP BY hi, lo
        |  HAVING count(*) BETWEEN 2 AND 64),
        |idx AS (SELECT vh.doc_id, vh.hi, vh.lo FROM vh
        |  JOIN census USING (hi, lo))
        |SELECT x.doc_id AS a, y.doc_id AS b,
        |  count(*)::BIGINT AS shared_frames
        |FROM idx x JOIN idx y ON x.hi = y.hi AND x.lo = y.lo
        |  AND x.doc_id < y.doc_id
        |GROUP BY 1, 2 ORDER BY a, b""".stripMargin,
    // m16: three 64-sample windows per clip (silence, seg(id),
    // seg(id+3)), the energy-band fingerprint (8 bands of 8 samples,
    // q = least(127, meanAbs >> 4), byte-packed), distinct per clip,
    // the BINDING 2..16 census (silence's fingerprint count == n_clips,
    // far over 16 — the cap sheds it), pair counts — FLAC staging is
    // lossless so the PCM formula replays for both containers
    "m16_audio_neardup" ->
      """WITH au AS (SELECT doc_id AS id FROM documents WHERE doc_id % 3 = 1),
        |w AS (SELECT id, unnest([0, 1, 2]) AS wi FROM au),
        |sm AS (SELECT id, wi, unnest(range(0, 64)) AS i FROM w),
        |sv AS (SELECT id, wi, (i // 8)::INT AS band,
        |    CASE WHEN wi = 0 THEN 0
        |      ELSE abs((((CASE WHEN wi = 1 THEN id ELSE id + 3 END) * 37
        |        + i * 13) % 4001) - 2000) END AS a
        |  FROM sm),
        |bd AS (SELECT id, wi, band,
        |    least(127, (sum(a) // 8) >> 4) AS q
        |  FROM sv GROUP BY 1, 2, 3),
        |fp AS (SELECT id, wi, CAST(sum(q << (8 * band)) AS BIGINT) AS fp
        |  FROM bd GROUP BY 1, 2),
        |cf AS (SELECT DISTINCT id, fp FROM fp),
        |census AS (SELECT fp FROM cf GROUP BY fp
        |  HAVING count(*) BETWEEN 2 AND 16),
        |idx AS (SELECT cf.id, cf.fp FROM cf JOIN census USING (fp))
        |SELECT x.id AS a, y.id AS b, count(*)::BIGINT AS shared_windows
        |FROM idx x JOIN idx y ON x.fp = y.fp AND x.id < y.id
        |GROUP BY 1, 2 ORDER BY a, b""".stripMargin,
    // m17: the HOPPED lattice replayed closed-form — window offsets
    // o = 0,32,…,len-64 over clip(id) = silence(64 + (id%2)*32) ++
    // seg(id) ++ seg(id+3); sample o+j is silence below the prefix,
    // else the seg formula at ((o+j-p) % 64) of seg(id) or seg(id+3);
    // same 8-band fingerprint, BINDING 2..16 census, pair counts. The
    // parity-flipping prefix means the grid lattice (o multiples of
    // 64 only) yields NO pairs — spec-pinned; this oracle pins that
    // hop=32 recovers every (id, id+3) pair exactly once
    "m17_audio_neardup_hopped" ->
      """WITH au AS (SELECT doc_id AS id, (64 + (doc_id % 2) * 32)::INT AS p
        |  FROM documents WHERE doc_id % 3 = 1),
        |w AS (SELECT id, p,
        |    (32 * unnest(range(0, (p + 64) // 32 + 1)))::INT AS o FROM au),
        |sm AS (SELECT id, p, o, unnest(range(0, 64))::INT AS j FROM w),
        |sv AS (SELECT id, o, (j // 8)::INT AS band,
        |    CASE WHEN o + j < p THEN 0
        |      ELSE abs((((CASE WHEN o + j - p < 64 THEN id ELSE id + 3 END)
        |        * 37 + ((o + j - p) % 64) * 13) % 4001) - 2000) END AS a
        |  FROM sm),
        |bd AS (SELECT id, o, band,
        |    least(127, (sum(a) // 8) >> 4) AS q
        |  FROM sv GROUP BY 1, 2, 3),
        |fp AS (SELECT id, o, CAST(sum(q << (8 * band)) AS BIGINT) AS fp
        |  FROM bd GROUP BY 1, 2),
        |cf AS (SELECT DISTINCT id, fp FROM fp),
        |census AS (SELECT fp FROM cf GROUP BY fp
        |  HAVING count(*) BETWEEN 2 AND 16),
        |idx AS (SELECT cf.id, cf.fp FROM cf JOIN census USING (fp))
        |SELECT x.id AS a, y.id AS b, count(*)::BIGINT AS shared_windows
        |FROM idx x JOIN idx y ON x.fp = y.fp AND x.id < y.id
        |GROUP BY 1, 2 ORDER BY a, b""".stripMargin,
    // m18: m14's closed-form pair replay + the d06 reachability closure
    // + the singleton-inclusive census — the cluster contract is
    // CC-regime-independent, so one oracle gates every regime
    "m18_video_dup_clusters" ->
      """WITH RECURSIVE v AS (SELECT doc_id, ((doc_id % 4) + 2)::INT AS nf
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (SELECT doc_id, doc_id + unnest(range(0, nf)) AS fid FROM v),
        |fm AS (SELECT doc_id, fid, ((fid % 5) + 1)::BIGINT AS w,
        |    ((fid % 4) + 2)::BIGINT AS h FROM fr),
        |g AS (SELECT fm.doc_id, fm.fid, ys.y, xs.x,
        |    (((fm.fid*31 + 3*(((ys.y*fm.h)//8)*fm.w + (xs.x*fm.w)//9)) % 256)
        |     + ((fm.fid*31 + 3*(((ys.y*fm.h)//8)*fm.w + (xs.x*fm.w)//9) + 1) % 256)
        |     + ((fm.fid*31 + 3*(((ys.y*fm.h)//8)*fm.w + (xs.x*fm.w)//9) + 2) % 256)
        |    ) // 3 AS gv
        |  FROM fm
        |  CROSS JOIN generate_series(0, 7) AS ys(y)
        |  CROSS JOIN generate_series(0, 8) AS xs(x)),
        |b AS (SELECT doc_id, fid, y, x, gv,
        |    lead(gv) OVER (PARTITION BY doc_id, fid, y ORDER BY x) AS nxt
        |  FROM g),
        |bits AS (SELECT doc_id, fid, y*8 + x AS bit FROM b
        |         WHERE x < 8 AND nxt > gv),
        |hash AS (SELECT f.doc_id, f.fid,
        |    CAST(coalesce(sum(CASE WHEN bit >= 32
        |      THEN (CAST(1 AS BIGINT) << (bit - 32)) END), 0) AS BIGINT) AS hi,
        |    CAST(coalesce(sum(CASE WHEN bit < 32
        |      THEN (CAST(1 AS BIGINT) << bit) END), 0) AS BIGINT) AS lo
        |  FROM fm f LEFT JOIN bits ON bits.doc_id = f.doc_id
        |    AND bits.fid = f.fid
        |  GROUP BY f.doc_id, f.fid),
        |vh AS (SELECT DISTINCT doc_id, hi, lo FROM hash),
        |census AS (SELECT hi, lo FROM vh GROUP BY hi, lo
        |  HAVING count(*) BETWEEN 2 AND 64),
        |idx AS (SELECT vh.doc_id, vh.hi, vh.lo FROM vh
        |  JOIN census USING (hi, lo)),
        |pr AS (SELECT x.doc_id AS a, y.doc_id AS b
        |  FROM idx x JOIN idx y ON x.hi = y.hi AND x.lo = y.lo
        |    AND x.doc_id < y.doc_id
        |  GROUP BY 1, 2),
        |edges AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
        |reach(id, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
        |asg AS (SELECT id, min(r) AS rep FROM reach GROUP BY id)
        |SELECT coalesce(asg.rep, v.doc_id) AS rep,
        |  count(*)::BIGINT AS n_members
        |FROM v LEFT JOIN asg ON asg.id = v.doc_id
        |GROUP BY 1 ORDER BY rep""".stripMargin,
    // m19: m16's closed-form pair replay + closure + singleton census
    "m19_audio_dup_clusters" ->
      """WITH RECURSIVE au AS (SELECT doc_id AS id FROM documents
        |  WHERE doc_id % 3 = 1),
        |w AS (SELECT id, unnest([0, 1, 2]) AS wi FROM au),
        |sm AS (SELECT id, wi, unnest(range(0, 64)) AS i FROM w),
        |sv AS (SELECT id, wi, (i // 8)::INT AS band,
        |    CASE WHEN wi = 0 THEN 0
        |      ELSE abs((((CASE WHEN wi = 1 THEN id ELSE id + 3 END) * 37
        |        + i * 13) % 4001) - 2000) END AS a
        |  FROM sm),
        |bd AS (SELECT id, wi, band,
        |    least(127, (sum(a) // 8) >> 4) AS q
        |  FROM sv GROUP BY 1, 2, 3),
        |fp AS (SELECT id, wi, CAST(sum(q << (8 * band)) AS BIGINT) AS fp
        |  FROM bd GROUP BY 1, 2),
        |cf AS (SELECT DISTINCT id, fp FROM fp),
        |census AS (SELECT fp FROM cf GROUP BY fp
        |  HAVING count(*) BETWEEN 2 AND 16),
        |idx AS (SELECT cf.id, cf.fp FROM cf JOIN census USING (fp)),
        |pr AS (SELECT x.id AS a, y.id AS b
        |  FROM idx x JOIN idx y ON x.fp = y.fp AND x.id < y.id
        |  GROUP BY 1, 2),
        |edges AS (SELECT a, b FROM pr UNION SELECT b, a FROM pr),
        |reach(id, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
        |asg AS (SELECT id, min(r) AS rep FROM reach GROUP BY id)
        |SELECT coalesce(asg.rep, au.id) AS rep,
        |  count(*)::BIGINT AS n_members
        |FROM au LEFT JOIN asg ON asg.id = au.id
        |GROUP BY 1 ORDER BY rep""".stripMargin,
    // m13: the SAME closed-form sample formula as m09 — FLAC is lossless,
    // so the staged→decoded statistics replay exactly, plus the rate
    // (8000 + (doc_id % 4) * 4000, carried through STREAMINFO)
    "m13_flac_ingest" ->
      """WITH au AS (SELECT doc_id, (doc_id % 50 + 20)::INT AS n,
        |    (8000 + (doc_id % 4) * 4000)::BIGINT AS rate
        |  FROM documents WHERE doc_id % 3 = 1),
        |sm AS (SELECT doc_id, n, rate,
        |    ((doc_id*37 + unnest(range(0, n))*13) % 4001) - 2000 AS s
        |  FROM au)
        |SELECT doc_id AS media_id, CAST(max(rate) AS BIGINT) AS sample_rate,
        | CAST(max(n) AS BIGINT) AS n_samples,
        | CAST(max(abs(s)) AS BIGINT) AS peak_abs,
        | CAST(sum(CASE WHEN abs(s) >= 32767 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_clipped,
        | CAST(sum(s * s) AS BIGINT) AS sum_sq
        |FROM sm GROUP BY doc_id ORDER BY media_id""".stripMargin,
    // m08: pixel byte i = (doc_id*31 + i) % 256; gray = floor((r+g+b)/3);
    // 3x3 Sobel over interior (empty for w<3 or h<3 -> coalesce 0)
    "m08_sobel_energy" ->
      """WITH imgs AS (SELECT doc_id, ((doc_id % 5) + 1)::INT AS w,
        |    ((doc_id % 4) + 2)::INT AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |ptx AS (SELECT doc_id, w, h, unnest(range(1, w - 1))::INT AS x
        |  FROM imgs),
        |pts AS (SELECT doc_id, w, h, x, unnest(range(1, h - 1))::INT AS y
        |  FROM ptx),
        |nb AS (SELECT p.doc_id, p.x, p.y, o.dx, o.dy,
        |    (((p.doc_id*31 + 3*((p.y+o.dy)*p.w + (p.x+o.dx))) % 256
        |     + (p.doc_id*31 + 3*((p.y+o.dy)*p.w + (p.x+o.dx)) + 1) % 256
        |     + (p.doc_id*31 + 3*((p.y+o.dy)*p.w + (p.x+o.dx)) + 2) % 256)
        |     // 3) AS g
        |  FROM pts p, (VALUES (-1,-1),(0,-1),(1,-1),(-1,0),(0,0),(1,0),
        |    (-1,1),(0,1),(1,1)) AS o(dx,dy)),
        |sb AS (SELECT doc_id, x, y,
        |    sum(g * CASE WHEN dx = -1 AND dy = 0 THEN -2
        |      WHEN dx = 1 AND dy = 0 THEN 2
        |      WHEN dx = -1 THEN -1 WHEN dx = 1 THEN 1 ELSE 0 END) AS gx,
        |    sum(g * CASE WHEN dy = -1 AND dx = 0 THEN -2
        |      WHEN dy = 1 AND dx = 0 THEN 2
        |      WHEN dy = -1 THEN -1 WHEN dy = 1 THEN 1 ELSE 0 END) AS gy
        |  FROM nb GROUP BY 1, 2, 3),
        |e AS (SELECT doc_id, CAST(sum(abs(gx) + abs(gy)) AS BIGINT) AS energy
        |  FROM sb GROUP BY 1)
        |SELECT i.doc_id AS media_id, i.w, i.h,
        |  coalesce(e.energy, 0) AS edge_energy
        |FROM imgs i LEFT JOIN e USING (doc_id) ORDER BY media_id""".stripMargin,
    // m11: dims replay closed-form from the synthetic meta formula; the
    // tolerance booleans are pinned TRUE per image (the gate computed
    // the actual Hamming/mean deltas in-plan — t15/t16 discipline)
    "m11_jpeg_ingest" ->
      """SELECT doc_id AS media_id, ((doc_id % 5) + 1)::INT AS w,
        | ((doc_id % 4) + 2)::INT AS h, TRUE AS dhash_ok, TRUE AS mean_ok
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY media_id""".stripMargin,
    // m12: frame count replays from the synthetic stream formula
    // ((doc_id % 4) + 2 frames), decoded frame widths replay closed-form
    // (frame j = ppmFromId(doc_id + j) => w = (doc_id+j) % 5 + 1 — dims
    // survive the lossy roundtrip exactly); tolerance booleans pinned
    // TRUE per media (the m11 discipline)
    "m12_mjpeg_ingest" ->
      """WITH v AS (SELECT doc_id, ((doc_id % 4) + 2)::BIGINT AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT doc_id, n, unnest(range(0, n)) AS j FROM v)
        |SELECT doc_id AS media_id, count(*)::BIGINT AS n_frames,
        |  CAST(sum((doc_id + j) % 5 + 1) AS BIGINT) AS sum_w,
        |  TRUE AS dims_ok, TRUE AS dhash_ok, TRUE AS mean_ok
        |FROM f GROUP BY doc_id ORDER BY media_id""".stripMargin,
    // m10: per-image dHash + Sobel replayed from the synthetic pixel
    // formula (m05's hash CTEs + m08's convolution CTEs, joined per doc)
    // — the gate's bytes took the PNG encode->decode roundtrip, so a
    // hash match proves the JDK codec path is pixel-exact
    "m10_png_ingest" ->
      """WITH m AS (SELECT doc_id, (doc_id % 5) + 1 AS w, (doc_id % 4) + 2 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |g AS (SELECT m.doc_id, ys.y, xs.x,
        |    (((m.doc_id*31 + 3*(((ys.y*m.h)//8)*m.w + (xs.x*m.w)//9)) % 256)
        |     + ((m.doc_id*31 + 3*(((ys.y*m.h)//8)*m.w + (xs.x*m.w)//9) + 1) % 256)
        |     + ((m.doc_id*31 + 3*(((ys.y*m.h)//8)*m.w + (xs.x*m.w)//9) + 2) % 256)
        |    ) // 3 AS gv
        |  FROM m
        |  CROSS JOIN generate_series(0, 7) AS ys(y)
        |  CROSS JOIN generate_series(0, 8) AS xs(x)),
        |b AS (SELECT doc_id, y, x, gv,
        |    lead(gv) OVER (PARTITION BY doc_id, y ORDER BY x) AS nxt
        |  FROM g),
        |bits AS (SELECT doc_id, y*8 + x AS bit FROM b
        |         WHERE x < 8 AND nxt > gv),
        |hash AS (SELECT m.doc_id,
        |    CAST(coalesce(sum(CASE WHEN bit >= 32
        |      THEN (CAST(1 AS BIGINT) << (bit - 32)) END), 0) AS BIGINT) AS phash_hi,
        |    CAST(coalesce(sum(CASE WHEN bit < 32
        |      THEN (CAST(1 AS BIGINT) << bit) END), 0) AS BIGINT) AS phash_lo
        |  FROM m LEFT JOIN bits ON bits.doc_id = m.doc_id
        |  GROUP BY m.doc_id),
        |ptx AS (SELECT doc_id, w, h, unnest(range(1, w - 1))::INT AS x
        |  FROM m),
        |pts AS (SELECT doc_id, w, h, x, unnest(range(1, h - 1))::INT AS y
        |  FROM ptx),
        |nb AS (SELECT p.doc_id, p.x, p.y, o.dx, o.dy,
        |    (((p.doc_id*31 + 3*((p.y+o.dy)*p.w + (p.x+o.dx))) % 256
        |     + (p.doc_id*31 + 3*((p.y+o.dy)*p.w + (p.x+o.dx)) + 1) % 256
        |     + (p.doc_id*31 + 3*((p.y+o.dy)*p.w + (p.x+o.dx)) + 2) % 256)
        |     // 3) AS g
        |  FROM pts p, (VALUES (-1,-1),(0,-1),(1,-1),(-1,0),(0,0),(1,0),
        |    (-1,1),(0,1),(1,1)) AS o(dx,dy)),
        |sb AS (SELECT doc_id, x, y,
        |    sum(g * CASE WHEN dx = -1 AND dy = 0 THEN -2
        |      WHEN dx = 1 AND dy = 0 THEN 2
        |      WHEN dx = -1 THEN -1 WHEN dx = 1 THEN 1 ELSE 0 END) AS gx,
        |    sum(g * CASE WHEN dy = -1 AND dx = 0 THEN -2
        |      WHEN dy = 1 AND dx = 0 THEN 2
        |      WHEN dy = -1 THEN -1 WHEN dy = 1 THEN 1 ELSE 0 END) AS gy
        |  FROM nb GROUP BY 1, 2, 3),
        |e AS (SELECT doc_id, CAST(sum(abs(gx) + abs(gy)) AS BIGINT) AS energy
        |  FROM sb GROUP BY 1)
        |SELECT m.doc_id AS media_id, hash.phash_hi, hash.phash_lo,
        |  coalesce(e.energy, 0) AS edge_energy
        |FROM m JOIN hash ON hash.doc_id = m.doc_id
        |LEFT JOIN e ON e.doc_id = m.doc_id
        |ORDER BY media_id""".stripMargin,
    "m05_image_phash" ->
      """WITH m AS (SELECT doc_id, (doc_id % 5) + 1 AS w, (doc_id % 4) + 2 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |g AS (SELECT m.doc_id, ys.y, xs.x,
        |    (((m.doc_id*31 + 3*(((ys.y*m.h)//8)*m.w + (xs.x*m.w)//9)) % 256)
        |     + ((m.doc_id*31 + 3*(((ys.y*m.h)//8)*m.w + (xs.x*m.w)//9) + 1) % 256)
        |     + ((m.doc_id*31 + 3*(((ys.y*m.h)//8)*m.w + (xs.x*m.w)//9) + 2) % 256)
        |    ) // 3 AS gv
        |  FROM m
        |  CROSS JOIN generate_series(0, 7) AS ys(y)
        |  CROSS JOIN generate_series(0, 8) AS xs(x)),
        |b AS (SELECT doc_id, y, x, gv,
        |    lead(gv) OVER (PARTITION BY doc_id, y ORDER BY x) AS nxt
        |  FROM g),
        |bits AS (SELECT doc_id, y*8 + x AS bit FROM b
        |         WHERE x < 8 AND nxt > gv),
        |hash AS (SELECT m.doc_id,
        |    CAST(coalesce(sum(CASE WHEN bit >= 32
        |      THEN (CAST(1 AS BIGINT) << (bit - 32)) END), 0) AS BIGINT) AS phash_hi,
        |    CAST(coalesce(sum(CASE WHEN bit < 32
        |      THEN (CAST(1 AS BIGINT) << bit) END), 0) AS BIGINT) AS phash_lo
        |  FROM m LEFT JOIN bits ON bits.doc_id = m.doc_id
        |  GROUP BY m.doc_id)
        |SELECT phash_hi, phash_lo, count(*) AS n, min(doc_id) AS min_id
        |FROM hash GROUP BY 1, 2
        |ORDER BY n DESC, phash_hi, phash_lo""".stripMargin,
    "st07_stream_cdc" ->
      """WITH log AS (SELECT o_custkey AS custkey, o_orderdate AS seq_ts,
        |    o_orderkey AS seq_id,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
        |    o_orderstatus AS status, o_totalprice AS price
        |  FROM orders),
        |r AS (SELECT *, row_number() OVER (PARTITION BY custkey
        |        ORDER BY seq_ts DESC, seq_id DESC, op DESC) AS rn FROM log)
        |SELECT custkey, seq_id AS last_orderkey, status,
        |  round(price, 2) AS price
        |FROM r WHERE rn = 1 AND op <> 'D' ORDER BY custkey""".stripMargin,
    "u08_forget_keys" ->
      """WITH f AS (SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0)
        |SELECT
        |  (SELECT count(*) FROM events e
        |     WHERE e.user_id NOT IN (SELECT user_id FROM f)) AS ev_rows,
        |  (SELECT count(DISTINCT e.user_id) FROM events e
        |     WHERE e.user_id NOT IN (SELECT user_id FROM f)) AS ev_users,
        |  (SELECT count(*) FROM orders o
        |     WHERE o.o_custkey NOT IN (SELECT user_id FROM f)) AS ord_rows,
        |  CAST(0 AS BIGINT) AS ev_residue,
        |  CAST(0 AS BIGINT) AS ord_residue""".stripMargin,
    "u07_time_travel" ->
      """WITH o AS (SELECT o_custkey AS custkey, o_orderkey AS seq_id,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    ntile(3) OVER (ORDER BY o_orderkey) AS f
        |  FROM orders),
        |v(version) AS (VALUES (0), (1), (2)),
        |pref AS (SELECT v.version, o.* FROM o JOIN v ON o.f <= v.version + 1),
        |r AS (SELECT *, row_number() OVER (PARTITION BY version, custkey
        |    ORDER BY seq_id DESC) AS rn FROM pref)
        |SELECT CAST(version AS BIGINT) AS version, count(*) AS n_live,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(custkey) AS BIGINT) AS key_checksum
        |FROM r WHERE rn = 1 AND op <> 'D'
        |GROUP BY version ORDER BY version""".stripMargin,
    "t21_pmi_collocations" ->
      """WITH t AS (SELECT string_split(text,' ') AS l FROM documents),
        |u AS (SELECT unnest(l) AS w FROM t),
        |uni AS (SELECT w, count(*) AS cu FROM u GROUP BY 1),
        |nt AS (SELECT sum(cu)::DOUBLE AS n_tok FROM uni),
        |b AS (SELECT unnest(list_transform(generate_series(1, len(l)-1),
        |        i -> struct_pack(w1 := l[i], w2 := l[i+1]))) AS p
        |      FROM t WHERE len(l) >= 2),
        |cb AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS cb FROM b GROUP BY 1, 2),
        |nb AS (SELECT sum(cb)::DOUBLE AS n_bg FROM cb)
        |SELECT cb.w1 || ' ' || cb.w2 AS bigram, cb.cb AS n,
        |  round(floor(ln((cb.cb / nb.n_bg) /
        |    ((u1.cu / nt.n_tok) * (u2.cu / nt.n_tok))) * 1e12 + 0.5) / 1e12, 4)
        |    AS pmi
        |FROM cb JOIN uni u1 ON u1.w = cb.w1 JOIN uni u2 ON u2.w = cb.w2
        |CROSS JOIN nt CROSS JOIN nb
        |WHERE cb.cb >= 5
        |ORDER BY pmi DESC, bigram LIMIT 25""".stripMargin)
}
