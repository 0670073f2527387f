package graft

import org.apache.spark.sql.SparkSession

/** Distributed-mirror run — the moral equivalent of the reference's
  * `_dist` test suite (each test runs on a thread pool AND a
  * constellation process pool, e.g. /root/reference/tests/csv_dist.rs):
  * run a representative query subset on a REAL multi-JVM standalone
  * cluster, then on local[4], and assert collected results are identical.
  *
  * Multi-JVM executors catch what local[n] structurally cannot: closure
  * serialization (local mode never serializes closures), Kryo round-trips
  * of custom Aggregator buffers across a real exchange, codegen
  * reference-object shipping (`addReferenceObj` state of the native
  * expressions), and custom SparkPlan `doExecute` under remote task
  * scheduling.
  *
  * Representative set (one per risk class):
  *  - q01_tpch_agg         plain scan + partial/final agg
  *  - sk02_most_frequent_exact  custom Aggregator, Kryo buffer across exchange
  *  - sk08_group_sub_sink  nested sketch sinks under groupBy
  *  - d02_minhash_lsh      dedup: persists, native minhash/shingle exprs, self-join
  *  - q27_asof_native      custom LogicalPlan/Strategy/SparkPlan doExecute
  *  - t03_lang_id          CountInSetExpression reference objects in codegen
  *  - m01_multimodal_features  mapPartitions binary decoders
  *  - t16_bpe_contract     driver-trained model closure-shipped to executors
  *                         (the UDF captures the merge-rank Map — local mode
  *                         never serializes it)
  *  - q40_tpch_q21_agg     window stats over a rollup under remote exchange
  *  - q49_tpch_q11         ReusedExchange: the threshold branch replays the
  *                         aggregate's shuffle files on a remote executor
  *  - g01_pagerank         per-iteration localCheckpoint: RDD blocks live ON
  *                         the remote executors, every iteration re-reads
  *                         them across the wire (local mode keeps them
  *                         in-process)
  *  - a08_pq_contract      driver-trained PQ codebooks compiled into the
  *                         plan as literals (multi-MB task binaries
  *                         broadcast to real executors) + argmin codegen
  *  - t20_dsir             Gumbel race over broadcast one-row totals
  *
  * Usage (note: the `local-cluster[...]` master does NOT work against
  * the /opt/spark distribution layout; a real standalone master/worker
  * does):
  * {{{
  *   sbt -batch package
  *   /opt/spark/sbin/start-master.sh -h 127.0.0.1 -p 7077
  *   /opt/spark/sbin/start-worker.sh spark://127.0.0.1:7077 -c 4 -m 4g
  *   SPARK_GRAFT_JARS=target/scala-2.13/<jar> \
  *     sbt -batch "runMain graft.ClusterMirror spark://127.0.0.1:7077"
  * }}}
  * Prints one `MIRROR <query> match=true|false` line per query and exits
  * non-zero on any mismatch.
  */
object ClusterMirror {

  val mirrorSet: Seq[String] = Seq(
    "q01_tpch_agg", "sk02_most_frequent_exact", "sk08_group_sub_sink",
    "d02_minhash_lsh", "q27_asof_native", "t03_lang_id",
    "m01_multimodal_features", "t16_bpe_contract", "q40_tpch_q21_agg",
    "q49_tpch_q11", "g01_pagerank", "a08_pq_contract", "t20_dsir",
    // round-7 risk classes:
    //  c03: higher-order lambda (aggregate over collect_list window
    //       buffers) compiled + executed on remote executors
    //  sk16: Kryo HLL sketches as DATA between stages (flatMap explode
    //        of sketch objects across a real exchange, reduceGroups merge)
    //  c08: multi-join funnel fold under remote shuffle partitioning
    "c03_ewma", "sk16_hll_sliding", "c08_funnel",
    //  q58: typed mapGroups lambdas + case-class Encoder closure-shipped
    //  p17: raise_error guard expressions + global prefix-sum window
    "q58_typed_dataset", "p17_budget_backfill",
    // round-8 risk classes:
    //  sk18: Kryo Theta (java.util.TreeSet state) partial-merged across
    //        a REAL exchange, then joinWith + executor-side set algebra
    //  d22: native jaro_winkler codegen + blocked self-join on remote
    //       executors; u10: executor-side parquet FOOTER reads through
    //       the shipped SerializableConf + driver-pruned multi-file scan
    "sk18_theta_churn", "d22_entity_resolution", "u10_data_skipping",
    //  u13: interval-predicate left join with null-filled struct payloads
    //       (pit_match) through a remote exchange
    "u13_pit_join",
    // round-9 risk classes:
    //  d12: the heaviest dedup machinery across a REAL exchange — hashed
    //       gram explosion, gram-keyed count shuffle, semi-join back, and
    //       the gaps-and-islands span merge (window over a remote
    //       repartition); proves the ExactSubstr shape row-identical
    //       under multi-JVM scheduling
    "d12_dup_spans",
    //  sk21: BINARY sketch shards as exchanged DATA — HllBytesRawAgg's
    //        Kryo HLL buffers partial-merge across one real exchange,
    //        the 258-byte exports then travel a SECOND exchange as
    //        Array[Byte] rows into the merge-estimate rollup
    "sk21_hll_sketch_table",
    // round-10 risk classes:
    //  q64: AsofJoinExec's NEAREST mode — the one direction that reads
    //       BOTH candidates (consumed backward + peeked forward head)
    //       from a single merge pass; q27 mirrors only backward, so the
    //       direction logic was previously unproven across real
    //       executor JVMs and remote sort/exchange satisfaction
    "q64_asof_nearest",
    //  sk26: TopFreq (heavy-hitter) Kryo buffers partial-merged across
    //        a REAL exchange, then the byte-stable shard exports travel
    //        a SECOND exchange as Array[Byte] rows into the
    //        merge-bytes rollup — sk21's risk class for the newest
    //        sketch family and its new codec
    "sk26_topk_sketch_table",
    //  t19b: the prefix-sum ntile — per-(partition, class) offset maps
    //        BROADCAST into mapPartitions closures + TaskContext
    //        partition ids on remote executors (local mode never ships
    //        the broadcast or the closure state)
    "t19b_ccnet_buckets_scalable",
    // round-11 risk classes — the STREAMING family on real executors
    // (every st* gate had only ever run local[n]; the state store's
    // delta files, Kryo sketch buffers, and session-window state now
    // cross real JVM boundaries through the shared checkpoint location
    // EventStreams.runStagedStream pins on the job filesystem):
    //  st04: HLL Kryo buffers in the streaming state store, merged
    //        across micro-batch boundaries by remote executors
    "st04_stream_hll_contract",
    //  st09: session-window state (merging windows) carried across
    //        batches in executor-side state stores
    "st09_stream_session",
    //  st16: TopFreq (heavy-hitter) buffers in the state store + the
    //        byte-stable shard exports leaving the streaming query as
    //        Array[Byte] rows into the merge-bytes rollup
    "st16_stream_topk_shards",
    //  sk28: Kryo GkQuantile buffers (ArrayBuffer tuple state + a
    //        non-flushed insert buffer) partial-merged across a REAL
    //        exchange — the quantile family's serialization round-trip
    //        local[n] never exercises
    "sk28_gk_quantiles_contract",
    // round-12 risk classes:
    //  sk29: the udaf() path (UserDefinedAggregator, not toColumn) —
    //        ScalaAggregator closure + Kryo GK buffers KEYED by group
    //        across a real exchange, then the estimates broadcast back
    //        into the rank-interval join on remote executors
    "sk29_gk_quantiles_by_key",
    //  m10: the JDK ImageIO codec INSIDE worker JVMs — PNG plugin
    //       discovery + headless AWT raster code runs on the daemons
    //       (local mode inherits the driver's initialized JVM; a real
    //       executor initializes its own), batched in mapPartitions
    "m10_png_ingest",
    // round-13 risk classes:
    //  m11: the JPEG plugin registry + compression-param write path on
    //       real executor JVMs (a LOSSY codec: the gate's tolerance
    //       booleans must come out identical bits on a worker daemon's
    //       own ImageIO/AWT initialization, not just the driver's)
    "m11_jpeg_ingest",
    //  t34: the unigram Viterbi UDF's per-task TaskMemo — a closure
    //       carrying @transient lazy mutable state plus the broadcast
    //       piece table, deserialized fresh per REMOTE task (local mode
    //       never round-trips the closure; a serialization bug would
    //       surface as an NPE or a shared-map race only on daemons)
    "t34_unigram_tokens",
    // round-14 risk classes:
    //  m13: the pure-Scala FLAC bit-serial codec on remote executor
    //       JVMs — MSB-first bit reader/writer, sign extension, CRC-8/16
    //       and Rice zigzag folds are exactly the endianness/sign bug
    //       class that only surfaces when encode and decode run in
    //       DIFFERENT worker JVMs on bytes that crossed an exchange
    "m13_flac_ingest",
    //  m12: the MJPEG segment walker + per-frame JDK JPEG decode inside
    //       worker JVMs, joined per (media_id, frame_idx) across a real
    //       exchange — frame boundaries computed on one executor must
    //       match decodes performed on another
    "m12_mjpeg_ingest",
    //  st18: the FLAC codec UNDER the streaming engine on real daemons —
    //        executor-side encode staging, per-micro-batch decode in a
    //        streaming query, and the complete-mode aggregate's state
    //        store merging across batches in separate worker JVMs
    "st18_stream_flac_qc",
    //  m15: iterative min-label connected components (duplicateClusters'
    //       localCheckpoint-per-round loop) on REAL executors — the CC
    //       family's checkpoint blocks had only ever lived in the local
    //       JVM; here every round re-reads them across the wire, plus
    //       the banded-hash self-join and the signed→unsigned rep map
    "m15_image_neardup",
    // round-12 risk classes:
    //  m16: audioFingerprints' RDD-created DataFrame (createDataFrame
    //       over a mapPartitions decode) feeding the fingerprint-keyed
    //       self-join — fingerprint longs as join keys across a REAL
    //       exchange, after a FLAC/WAV decode that ran in a different
    //       worker JVM than the join; plus the binding hotKeyPrune cap
    //  p25: the full multimodal curation COMPOSITION on real executors —
    //       two checkpointed normalize passes (PNG batch codec + FLAC
    //       bit-serial), per-branch dedup machinery, keep-best windows
    //       and the final union all inside one job graph; proves the
    //       front doors compose when every seam crosses the wire
    "m16_audio_neardup", "p25_multimodal_curation",
    //  st19: a driver-trained tokenizer model (vocab Set + TaskMemo
    //        @transient state) closure-shipped into STREAMING tasks on
    //        real daemons — t34 proves the memo closure on batch tasks,
    //        st04-18 prove the state store; this row proves the
    //        composition (model closures deserialized per micro-batch
    //        task in separate worker JVMs)
    "st19_stream_wordpiece",
    //  st20: the foreachBatch INGEST path on real daemons — per-trigger
    //        index appends where the store scan, the broadcast of the
    //        batch's bands, the jaccard verify joins and the
    //        report-before-segments disk barrier all execute on remote
    //        executors against a SHARED store directory; every earlier
    //        streaming row used the state store, none used foreachBatch
    "st20_stream_lsh_ingest",
    //  st21: streamed audio-dedup ingest on real JVMs — binary clip
    //        DECODE inside foreachBatch actions on remote executors
    //        (st20 ships text shingles; no earlier streaming row runs a
    //        codec in the ingest path), broadcast fingerprint probes
    //        against a shared on-disk store, the report-before-segment
    //        disk barrier across executor filesystems
    "st21_stream_audio_ingest",
    //  m19: the audio CLUSTER front on real JVMs — fingerprint longs
    //       through a remote exchange INTO the warm-started CC dispatch
    //       (probe labels + quotient contraction + star rounds all
    //       cross executor boundaries) and back out through the
    //       singleton-coalescing assign join; m16 mirrors the pair
    //       front only, and no earlier row exercises the round-13
    //       warm-start path on separate JVMs
    "m19_audio_dup_clusters",
    //  t38: byte-level BPE — the 256-entry byte→char map and the rank
    //       map ship inside BOTH the distributed trainer's Dataset
    //       lambdas (Vector[String] symbol rows Kryo-exchanged across a
    //       real shuffle each of the 48 rounds) and the tokenCount UDF
    //       closure (TaskMemo @transient rebuild per remote task); the
    //       other tokenizer rows ship word-keyed state, none ship
    //       byte-alphabet tables through executor JVMs
    "t38_bytebpe_tokens",
    // round-14 risk classes:
    //  st23: streamed IVF ingest on real JVMs — the frozen centroid
    //        matrix ships as plan LITERALS into assignCells' fused
    //        argmax expression inside foreachBatch actions on remote
    //        executors (st20/st21 ship shingles/codecs; no earlier
    //        streaming row compiles multi-KB float literals into a
    //        remote micro-batch plan), then the probe's partition-dir
    //        pruned scan + centroid broadcast cross a real exchange
    "st23_stream_ivf_ingest",
    // round-15 risk class:
    //  st24: segment-store COMPACTION between appends, probed on real
    //        JVMs — the fold's staged rewrite + marker swap run
    //        driver-side, but the post-fold store is then PROBED from
    //        remote executors: the probed-cell literal list must prune
    //        the REWRITTEN batch=base/cell= partition dirs in remote
    //        FileSourceScans (no earlier row reads a compacted store
    //        across executor JVMs), composed with the frozen-centroid
    //        literal plan st23 pins
    "st24_compact_ivf_probe",
    // round-16 risk class:
    //  st27: TAKEDOWN interleaved with live streamed ingest on real
    //        JVMs — the rewrite-swap renames and the anti-join
    //        retraction had never crossed executor boundaries: the
    //        driver-side FS protocol (stage → COMMIT → per-segment
    //        delete-then-rename under the new lease) interleaves with
    //        REMOTE-executor reads of the store being swapped (later
    //        triggers' appends scan the cleansed store from worker
    //        JVMs, and the removal anti-joins themselves execute
    //        remotely) — exactly the driver-FS-vs-remote-reader race
    //        class the mirror exists for
    "st27_stream_lsh_takedown")

  /** Collect a query's result as row-strings, order-normalized. */
  private def snapshot(spark: SparkSession, name: String, sfDir: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    val out = df.collect().map(_.toString).sorted.toSeq
    spark.catalog.clearCache() // dedup queries persist internals
    out
  }

  def main(args: Array[String]): Unit = {
    val master = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "spark://127.0.0.1:7077"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"

    // pass 1: the real cluster (separate executor JVMs)
    val jars = sys.env.get("SPARK_GRAFT_JARS")
    require(jars.nonEmpty,
      "set SPARK_GRAFT_JARS=<path to the packaged graft jar> — remote " +
        "executors need the classes shipped, or every task dies with " +
        "ClassNotFoundException (use tools/cluster_mirror.sh)")
    val b = GraftSession.builder(master, 8)
    val clustered = jars.fold(b)(j => b.config("spark.jars", j)).getOrCreate()
    clustered.sparkContext.setLogLevel("WARN")
    require(!clustered.sparkContext.isLocal, s"master $master is not a cluster")
    val onCluster = mirrorSet.map(q => q -> snapshot(clustered, q, sfDir)).toMap
    clustered.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    // pass 2: local mode, fresh session in the same JVM
    val local = GraftSession.builder("local[4]", 8).getOrCreate()
    local.sparkContext.setLogLevel("WARN")
    val results = mirrorSet.map { q =>
      val l = snapshot(local, q, sfDir)
      val ok = l == onCluster(q)
      println(s"MIRROR $q match=$ok rows=${l.size}")
      if (!ok) {
        val c = onCluster(q)
        (l.toSet -- c.toSet).take(3).foreach(r => println(s"  local-only: $r"))
        (c.toSet -- l.toSet).take(3).foreach(r => println(s"  cluster-only: $r"))
      }
      ok
    }
    local.stop()
    println(s"MIRROR_TOTAL ${results.count(identity)}/${results.size} matched")
    if (!results.forall(identity)) sys.exit(1)
  }
}
