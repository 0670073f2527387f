package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events stream.
  *
  * The reference has no event-time streaming (SURVEY.md §1.1: "streaming"
  * there means sketch algorithms), so this module EXCEEDS the reference:
  * watermarked windowed aggregation and stateful sessionization, designed
  * so the same transformations run in batch mode (`DataFrame` in,
  * `DataFrame` out — Spark unifies the two).
  *
  * Scale notes: state is keyed by (window, event_type) / user_id and
  * bounded by the watermark — state store size is O(active keys), not
  * O(stream length); sessionization state is one small Session per active
  * user.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Watermarked sliding-window aggregation; works on a streaming OR batch
    * DataFrame with (ts, event_type, value). */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Drive [[windowedAgg]] as a REAL streaming query and return the final
    * result table: the input is staged as `nFiles` parquet files of
    * contiguous ascending time ranges, read back with
    * `maxFilesPerTrigger=1` + `Trigger.AvailableNow` (one file per
    * micro-batch, so the watermark advances across ≥ nFiles batches and
    * windowed state must merge across batch boundaries), Complete-mode
    * memory sink. Ascending file order means the watermark only ever
    * trails the data — no honest row arrives late — so the result must
    * equal the batch windowed aggregation exactly; the st03 gate
    * hash-verifies that against a relational replay. File order is made
    * deterministic by staging to explicit names with strictly increasing
    * modification times (FileStreamSource orders by (modTime, path)).
    * Late-DROP behavior (rows beyond the watermark discarded) is
    * spec-verified in StreamingSpec, not here: a gate must be
    * deterministic, and drop timing depends on micro-batch boundaries. */
  def windowedAggStreamed(spark: SparkSession, events: DataFrame,
      stageDir: String, nFiles: Int = 3,
      sinkName: String = "st03_sink"): DataFrame =
    runStagedStream(spark, events, stageDir, nFiles, sinkName)(windowedAgg(_))

  /** Stage `events` as `nFiles` parquet files of contiguous ascending
    * time ranges and run `agg` over them as a REAL streaming query:
    * `maxFilesPerTrigger=1` + `Trigger.AvailableNow` (one file per
    * micro-batch, so state must merge across ≥ nFiles batch
    * boundaries), Complete-mode memory sink, returned as the sink
    * table. File order is deterministic: explicit names with strictly
    * increasing modification times (FileStreamSource orders by
    * (modTime, path)). Shared by st03 (windowed agg) and st04 (sketch
    * aggregator state). */
  def runStagedStream(spark: SparkSession, events: DataFrame,
      stageDir: String, nFiles: Int, sinkName: String,
      outputMode: String = "complete")
      (agg: DataFrame => DataFrame): DataFrame = {
    val inDir = stageAscendingFiles(events, stageDir, nFiles)
    spark.catalog.dropTempView(sinkName)
    // EXPLICIT checkpoint location on the job filesystem (not the
    // driver-private /tmp default): the state store's delta/snapshot
    // files are written by EXECUTORS and read back on later
    // micro-batches, so the path must be shared between the driver and
    // every executor JVM — the property the ClusterMirror streaming rows
    // prove against a real standalone worker (separate executor
    // processes, same store). A fresh suffix per run keeps AvailableNow
    // from short-circuiting on a previous run's source log; the dir is
    // deleted after termination (the memory sink already holds the
    // materialized result, so the state is disposable).
    val ckpt = new java.io.File(
      s"$stageDir/ckpt/${sinkName}_${System.nanoTime()}")
    val q = agg(
        spark.readStream.schema(events.schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir.getAbsolutePath))
      .writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    // finally: a failing query must not leak its checkpoint tree — the
    // nanoTime suffix means no later run would ever reclaim it
    try q.awaitTermination()
    finally rm(ckpt)
    spark.table(sinkName)
  }

  /** Drive an arbitrary per-micro-batch ACTION over staged ascending
    * files — the foreachBatch INGEST shape (stateful side effects per
    * trigger: index appends, store upserts) next to
    * [[runStagedStream]]'s aggregate shape. One file per micro-batch
    * (`maxFilesPerTrigger=1` + AvailableNow), so `action` sees the
    * files in staged order with batch ids 0..nFiles-1; an action that
    * is idempotent in the batch id (the [[graft.dedup.Dedup
    * .appendToLshIndex]] contract) therefore gets exactly-once ingest
    * semantics on retry — Structured Streaming replays a failed
    * micro-batch under the SAME id. */
  def runStagedForeachBatch(spark: SparkSession, events: DataFrame,
      stageDir: String, nFiles: Int)
      (action: (DataFrame, Long) => Unit): Unit = {
    val inDir = stageAscendingFiles(events, stageDir, nFiles)
    val ckpt = new java.io.File(
      s"$stageDir/ckpt/fb_${System.nanoTime()}")
    val q = spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir.getAbsolutePath)
      .writeStream
      .foreachBatch((df: org.apache.spark.sql.Dataset[
        org.apache.spark.sql.Row], id: Long) => action(df.toDF(), id))
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    try q.awaitTermination()
    finally rm(ckpt)
  }

  /** Exact streaming deduplication + per-type profile: drop repeated
    * `event_id`s (exactly-once semantics over an at-least-once feed —
    * THE standard ingest-dedup step), then count the survivors per
    * event type with integer-exact min/max id bounds. Works on a
    * streaming or batch frame with (event_id, ts, event_type).
    *
    * Streaming shape: `dropDuplicates` keeps one state-store entry per
    * key and suppresses later copies — duplicates arriving in DIFFERENT
    * micro-batches are caught because the state persists across batch
    * boundaries (the st05 gate stages copies of the same events into
    * separate files precisely to force that path). State here is
    * unbounded-by-design for the deterministic gate; production feeds
    * bound it with `dropDuplicatesWithinWatermark` once duplicates have
    * a known arrival horizon (spec-covered in StreamingSpec — drop
    * TIMING under a watermark depends on micro-batch boundaries, which
    * a deterministic gate must not).
    *
    * Output is integer-only (counts and id bounds, no floating sums),
    * so stream == batch == external replay exactly. */
  def dedupCountsByType(df: DataFrame): DataFrame =
    df.dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))

  /** Drive [[dedupCountsByType]] as a REAL streaming query over staged
    * ascending files — one micro-batch per file, so the dedup state
    * must carry across batch boundaries to suppress the later copies. */
  def dedupCountsStreamed(spark: SparkSession, events: DataFrame,
      stageDir: String, nFiles: Int = 3,
      sinkName: String = "st05_sink"): DataFrame =
    runStagedStream(spark, events, stageDir, nFiles, sinkName)(
      dedupCountsByType(_))

  /** Stage `events` as `nFiles` parquet files of contiguous ascending
    * time ranges under `stageDir/in`, named 01.parquet.. with strictly
    * increasing modification times (FileStreamSource orders by
    * (modTime, path)); returns the staging directory. */
  def stageAscendingFiles(events: DataFrame, stageDir: String,
      nFiles: Int, exactChop: Boolean = false): java.io.File = {
    val inDir = new java.io.File(s"$stageDir/in")
    if (inDir.exists()) inDir.listFiles().foreach(_.delete())
    inDir.mkdirs()
    // persist: the loop below filters `ranked` once per file. Default
    // file assignment is a RANGE partitioning on ts (parallel exchange):
    // the ntile form sorted the whole corpus in ONE task and dominated
    // st17's staged-pages cost a decade up. Range boundaries come from
    // the partitioner's SAMPLING (equal ranges, not equal counts) —
    // fine for every chop-INVARIANT stream pipeline (all st* gates by
    // design), but callers whose chop IS semantics (cdcApplyVersioned:
    // a version snapshot per file, replayed by u07's ntile oracle) pass
    // `exactChop = true` for the deterministic equal-count split.
    val ranked =
      if (exactChop) {
        import org.apache.spark.sql.expressions.Window
        events.withColumn("fidx",
          ntile(nFiles).over(Window.orderBy(col("ts"))))
      } else
        events.repartitionByRange(nFiles, col("ts"))
          .withColumn("fidx", spark_partition_id() + 1)
    val persisted = ranked.persist()
    try {
      (1 to nFiles).foreach { i =>
        val part = s"$stageDir/stage_$i"
        persisted.filter(col("fidx") === i).drop("fidx").coalesce(1)
          .write.mode("overwrite").parquet(part)
        // rows < nFiles leaves trailing ntile buckets empty, and an empty
        // single-partition write may emit no part file — tolerate the
        // empty bucket (skip it) instead of throwing on .head
        new java.io.File(part).listFiles()
          .filter(_.getName.endsWith(".parquet")).headOption.foreach { src =>
            val dst = new java.io.File(inDir, f"$i%02d.parquet")
            java.nio.file.Files.move(src.toPath, dst.toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            dst.setLastModified(1700000000000L + i * 60000L)
          }
      }
    } finally persisted.unpersist()
    inDir
  }

  /** Streamed approx-distinct users per event type: the HyperLogLog
    * sketch aggregator's Kryo buffer rides the streaming state store and
    * merges across micro-batch boundaries. HLL register merge is a
    * pointwise max — commutative, associative, idempotent — so the
    * streamed estimate is BIT-IDENTICAL to the batch aggregation of the
    * same data regardless of how rows split into micro-batches; the st04
    * gate enforces that equality plus the 3σ accuracy envelope. */
  def hllDistinctStreamed(spark: SparkSession, events: DataFrame,
      stageDir: String, nFiles: Int = 3, sinkName: String = "st04_sink",
      b: Int = 12): DataFrame =
    runStagedStream(spark, events, stageDir, nFiles, sinkName)(
      hllUsersPerType(_, b))

  /** The per-event-type HLL distinct-users aggregation — ONE definition
    * shared by the streamed form above, st04's batch twin, and the
    * StreamingSpec parity test, so sketch parameters cannot silently
    * diverge between the sides being compared. Works on a streaming or
    * batch frame with (event_type, user_id). */
  def hllUsersPerType(df: DataFrame, b: Int = 12): DataFrame = {
    import df.sparkSession.implicits._
    import graft.aggregators.SketchAggregators.HllDistinct
    df.select(col("event_type"), col("user_id")).as[(String, Long)]
      .groupByKey(_._1)
      .agg(new HllDistinct[(String, Long)](b, _._2).toColumn.name("approx_users"))
      .toDF("event_type", "approx_users")
  }

  /** 3σ relative-error envelope for an HLL with 2^b registers. */
  def hll3Sigma(b: Int): Double = 3 * 1.04 / math.sqrt((1 << b).toDouble)

  /** Streamed theta distinct: the KMV sketch buffer rides the streaming
    * state store per event_type and merges across micro-batch
    * boundaries. Theta merge (bounded insert of distinct values) is
    * commutative, associative, idempotent — so the streamed sketch is
    * BIT-identical to the batch build on any batch split; and because
    * the estimate is a pure integer function of md5 prefixes, the st14
    * gate is fully HASH-verified against a relational DuckDB replay
    * (stronger than st04's boolean contract for HLL). */
  def thetaDistinctStreamed(spark: SparkSession, events: DataFrame,
      stageDir: String, nFiles: Int = 3, sinkName: String = "st14_sink",
      k: Int = 128): DataFrame =
    runStagedStream(spark, events, stageDir, nFiles, sinkName)(
      thetaUsersPerType(_, k))

  /** Per-event-type theta distinct-users estimate over 48-bit md5
    * prefixes (salt `:th14`) — ONE definition shared by the streamed
    * form, the batch twin, and the gate (same discipline as
    * [[hllUsersPerType]]). */
  def thetaUsersPerType(df: DataFrame, k: Int = 128): DataFrame = {
    import df.sparkSession.implicits._
    import graft.aggregators.SketchAggregators.ThetaDistinct
    val hv = conv(substring(
      md5(concat(col("user_id").cast("string"), lit(":th14"))), 1, 12),
      16, 10).cast("long")
    df.select(col("event_type"), hv.as("v")).as[(String, Long)]
      .groupByKey(_._1)
      .agg(new ThetaDistinct[(String, Long)](k, 48, _._2).toColumn.name("est"))
      .toDF("event_type", "est_raw")
      .select(col("event_type"),
        (floor(col("est_raw") * 10000 + lit(0.5)) / 10000).as("est_users"))
  }

  /** Streamed content fingerprint: [[graft.operators.Maintenance
    * .contentFingerprint]]'s mod-2³¹−1 term sum folded micro-batch by
    * micro-batch through the state store — continuous replica validation
    * of an ingest feed (compare against the source system's one-pass
    * value). Addition is commutative/associative, so the streamed value
    * is IDENTICAL to the batch build on any chopping, and the integer
    * arithmetic replays in DuckDB — st15 is hash-verified end to end. */
  def fingerprintStreamed(spark: SparkSession, events: DataFrame,
      stageDir: String, cols: Seq[String], nFiles: Int = 3,
      sinkName: String = "st15_sink"): DataFrame =
    runStagedStream(spark, events, stageDir, nFiles, sinkName)(
      graft.operators.Maintenance.contentFingerprint(_, cols))

  /** Streamed heavy hitters: the Top(+CMS) `MostFrequent` sketch buffer
    * rides the streaming state store as a GLOBAL typed aggregate and
    * merges across micro-batch boundaries. In the exact regime (tracking
    * capacity ≥ distinct keys — event_type here) the merged sketch IS
    * the exact count table whatever the batch split, so stream == batch
    * == external replay and the st06 gate hash-verifies it; st04 proved
    * the same law for HLL state, this proves it for the Top/CMS family. */
  def topTypesStreamed(spark: SparkSession, events: DataFrame,
      stageDir: String, nFiles: Int = 3,
      sinkName: String = "st06_sink"): DataFrame =
    runStagedStream(spark, events, stageDir, nFiles, sinkName)(topEventTypes(_))

  /** Top event types by count via the `MostFrequent` sketch aggregator —
    * ONE definition shared by the streamed form, the batch twin, and the
    * gate (same discipline as [[hllUsersPerType]]). */
  def topEventTypes(df: DataFrame, n: Int = 10): DataFrame = {
    import df.sparkSession.implicits._
    import graft.aggregators.SketchAggregators.MostFrequent
    val agg = new MostFrequent[String, String](n, 0.99, 0.002, identity)
    df.select(col("event_type")).as[String]
      .select(agg.toColumn.name("top")).toDF("top")
      .select(explode(col("top")).as("kv"))
      .select(col("kv._1").as("event_type"), col("kv._2").as("n"))
  }

  /** Per-(event_type, day) heavy-hitter SHARDS in the byte-stable
    * TopFreq export format ([[graft.sketch.TopFreq.toBytes]]) — ONE
    * definition shared by the sk26 batch sketch-table gate and the
    * streamed st16 form, so shard shape cannot silently diverge between
    * the sides being compared (same discipline as [[hllUsersPerType]]).
    * Works on a streaming or batch frame with (event_type, ts, user_id). */
  def topFreqUserShards(df: DataFrame, n: Int = 50, depth: Int = 4,
      width: Int = 2048): DataFrame = {
    import df.sparkSession.implicits._
    import graft.aggregators.SketchAggregators.TopFreqBytesAgg
    df.select(col("event_type"), col("ts").cast("date").cast("string").as("day"),
        col("user_id"))
      .as[(String, String, Long)]
      .groupByKey(t => (t._1, t._2))
      .agg(new TopFreqBytesAgg[(String, String, Long), Long](n, depth, width, _._3)
        .toColumn.name("sk"))
      .map { case ((typ, day), sk) => (typ, day, sk) }
      .toDF("event_type", "day", "sk")
  }

  /** Streamed heavy-hitter sketch-TABLE write: the per-(type, day)
    * TopFreq buffers ride the streaming state store, merge across
    * micro-batch boundaries, and finish as the SAME byte-stable export
    * format the batch sketch table writes — so a streaming ingest and a
    * batch backfill can feed ONE table of shards. The st16 gate rolls
    * the STREAMED shards up with the batch merge-bytes aggregator and
    * hash-verifies the ranked top-n against exact SQL: the whole
    * stream → sketch-table → answer path on one format (st04/st14
    * proved the state-store merge law for HLL/theta; this proves the
    * PERSISTED-FORMAT contract for the heavy-hitter family). */
  def topFreqShardsStreamed(spark: SparkSession, events: DataFrame,
      stageDir: String, nFiles: Int = 3,
      sinkName: String = "st16_sink"): DataFrame =
    runStagedStream(spark, events, stageDir, nFiles, sinkName)(
      topFreqUserShards(_))

  /** Session-window aggregation via Spark's native `session_window` —
    * the DECLARATIVE sessionization (vs [[sessionize]]'s explicit state
    * machine): events within `gap` of each other merge into one window
    * per user; the engine's session-window state operator does the
    * merging, including across micro-batch boundaries in streaming mode.
    *
    * Semantics note (vs [[sessionizeBatch]]): a new session starts when
    * the inter-event gap is >= `gap` (window overlap is half-open), and
    * the emitted `end` is last_event_ts + gap — both replayed exactly by
    * the st09 oracle. Values are summed as integer cents so stream ==
    * batch == external replay bit-exactly. One definition serves
    * streaming and batch frames (Spark unifies the two). */
  def sessionWindowAgg(df: DataFrame, gap: String = "30 minutes"): DataFrame =
    df.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("cents"))
      .select(col("user_id"),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"),
        col("n_events"), col("cents"))

  /** Drive [[sessionWindowAgg]] as a REAL streaming query over staged
    * ascending files: one micro-batch per file, so sessions spanning a
    * file boundary exist only if the engine's session-window state
    * merges across batches — the law the st09 gate hash-verifies against
    * a relational gaps-and-islands replay. Complete-mode memory sink
    * (append would hold back sessions until the watermark passes them;
    * the final table must contain every session). */
  def sessionWindowStreamed(spark: SparkSession, events: DataFrame,
      stageDir: String, nFiles: Int = 3,
      sinkName: String = "st09_sink"): DataFrame =
    runStagedStream(spark, events, stageDir, nFiles, sinkName)(
      sessionWindowAgg(_))

  /** Drive [[attributionJoin]] as a REAL stream-stream self-join: the
    * staged event files are read as ONE stream, filtered into the click
    * and purchase sides (each with its own watermark), and inner-joined
    * on (user, time-range). Append mode — stream-stream joins emit
    * matches eagerly and support no other mode; with ascending staging
    * nothing arrives late, so the joined set must equal the stateless
    * batch join exactly (st10 shares st02's oracle modulo aggregation).
    * State is purged by the watermarks as the join condition allows —
    * the bounded-state contract that makes this viable on an unbounded
    * feed. */
  def attributionJoinStreamed(spark: SparkSession, events: DataFrame,
      stageDir: String, nFiles: Int = 3, horizonMinutes: Int = 60,
      sinkName: String = "st10_sink"): DataFrame =
    runStagedStream(spark, events, stageDir, nFiles, sinkName,
      outputMode = "append")(attributionJoin(_, horizonMinutes = horizonMinutes))

  /** Gap-based sessionization with flatMapGroupsWithState: a session
    * closes when a later event for the same user arrives more than
    * `gapMinutes` after it (event-time gap split). With
    * `ProcessingTimeTimeout` idle sessions are additionally flushed by
    * timeout; the `NoTimeout` default keeps them in state, which makes
    * batch-driven tests deterministic (a timeout re-arm otherwise
    * generates empty batches forever and processAllAvailable never
    * settles). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[Session] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout

    def fn(userId: Long, rows: Iterator[Event],
        state: GroupState[Session]): Iterator[Session] = {
      val gapMs = gapMinutes * 60000L
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var out = List.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts.getTime - s.end.getTime <= gapMs =>
            cur = Some(s.copy(end = e.ts, n_events = s.n_events + 1,
              total_value = s.total_value + e.value))
          case Some(s) =>
            out ::= s
            cur = Some(Session(userId, e.ts, e.ts, 1L, e.value))
          case None =>
            cur = Some(Session(userId, e.ts, e.ts, 1L, e.value))
        }
      }
      cur match {
        case Some(s) if state.hasTimedOut =>
          state.remove(); out ::= s
        case Some(s) =>
          state.update(s)
          if (useTimeout) state.setTimeoutDuration(gapMs)
        case None => if (state.hasTimedOut) state.remove()
      }
      out.reverseIterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
  }

  /** Drive [[sessionize]] — the EXPLICIT flatMapGroupsWithState machine —
    * as a REAL streaming query over staged ascending files. Only
    * gap-CLOSED sessions emit (each user's trailing session stays in
    * state forever under NoTimeout), and a session closes when a later
    * event arrives regardless of which micro-batch carries it, so the
    * emitted set is chop-invariant and equals "every session except each
    * user's last" — exactly what the st13 oracle replays. Feed
    * millisecond-truncated timestamps: the state machine compares
    * `Timestamp.getTime` (ms), so sub-ms input would make the gap test
    * diverge from a µs-exact relational replay. */
  def sessionizeStreamed(spark: SparkSession, events: DataFrame,
      stageDir: String, nFiles: Int = 3,
      sinkName: String = "st13_sink"): DataFrame =
    runStagedStream(spark, events, stageDir, nFiles, sinkName,
      outputMode = "append") { df =>
      import df.sparkSession.implicits._
      sessionize(df.as[Event]).toDF()
    }

  /** Batch twin of [[sessionize]]: the same gap-split semantics as a pure
    * declarative gaps-and-islands plan (lag → new-session flag → running
    * sum → per-session aggregate) — one shuffle on user_id, fully inside
    * Catalyst, replayable by any SQL engine (the st01 gate query
    * hash-verifies it against a DuckDB gaps-and-islands oracle).
    *
    * Equivalence contract (asserted in StreamingSpec): this emits EVERY
    * session including each user's trailing one, while the
    * flatMapGroupsWithState form emits only gap-closed sessions (the
    * trailing session stays in state awaiting more events/timeout).
    * Gap comparison is in exact integer microseconds on both sides.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60000000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess", when(col("prev_ts").isNull ||
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > gapUs, 1L)
        .otherwise(0L))
      .withColumn("sess_no", sum(col("new_sess")).over(w))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(min(col("ts")).as("start"), max(col("ts")).as("end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .drop("sess_no")
  }

  /** Streaming exact-dedup on id columns — the streaming twin of the
    * batch `dropDuplicates` dedup stage in the curation pipeline.
    *
    * Uses `dropDuplicatesWithinWatermark`: the dedup state store only
    * keeps ids inside the watermark horizon, so state is bounded by
    * (arrival rate × watermark) instead of growing with the stream —
    * the property that makes streaming ingest-dedup viable at 100 TB/day.
    * Duplicates arriving later than `watermark` after the first copy are
    * NOT caught (that is the documented contract of watermarked dedup);
    * widen the watermark to widen the guarantee. Batch input degrades to
    * plain `dropDuplicates` so one code path serves both modes. */
  def dedupEvents(events: DataFrame, idCols: Seq[String] = Seq("event_id"),
      watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)
    else events.dropDuplicates(idCols)

  /** Streaming near-dup document filter: dedup on the digest of the
    * NORMALIZED text (lowercase, punctuation stripped, whitespace
    * collapsed — `TextFunctions.normalize`), so case/punctuation/spacing
    * variants of the same document are dropped as they arrive. The same
    * watermark-bounded-state contract as [[dedupEvents]]; batch input
    * degrades to a plain digest dropDuplicates. This is the streaming
    * twin of the curation pipeline's dedup stage (p01). */
  def dedupDocsNormalized(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", watermark: String = "2 hours"): DataFrame = {
    val keyed = docs.withColumn("__norm_digest",
      md5(graft.functions.TextFunctions.normalize(col(textCol))))
    val deduped =
      if (docs.isStreaming)
        keyed.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark("__norm_digest")
      else keyed.dropDuplicates("__norm_digest")
    deduped.drop("__norm_digest")
  }

  /** Streaming NEAR-dup document filter keyed on the 64-bit SimHash of
    * the normalized token stream: documents whose signatures collide
    * exactly within the watermark horizon are dropped as they arrive.
    *
    * This is the streaming analog of `Dedup.simhashPairs` restricted to
    * hamming distance 0 — banded candidate joins are not expressible in
    * a single watermarked streaming stage (a stateful self-join over 4
    * band keys would need multi-key state Spark's dedup operator doesn't
    * provide), but distance-0 collisions already catch the
    * near-identical boilerplate that dominates streaming ingest, with
    * the same bounded-state contract as [[dedupEvents]]. Batch input
    * degrades to a plain signature dropDuplicates. The SimHash is the
    * native codegen'd expression — no UDF in the stream. */
  def dedupDocsSimhash(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", watermark: String = "2 hours"): DataFrame = {
    val keyed = docs.withColumn("__simhash",
      graft.dedup.Dedup.simhash(
        graft.functions.TextFunctions.normalize(col(textCol))))
    val deduped =
      if (docs.isStreaming)
        keyed.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark("__simhash")
      else keyed.dropDuplicates("__simhash")
    deduped.drop("__simhash")
  }

  /** Stream-stream interval join (click→purchase attribution): each late
    * ("purchase") event joins the same user's early ("click") events from
    * the preceding `horizonMinutes`.
    *
    * In streaming mode both sides carry watermarks and the time-range
    * join condition bounds the state Spark must hold — the canonical
    * Structured Streaming stream-stream join shape (early side retained
    * for horizon+watermark, late side for its watermark; state is purged
    * as the watermark advances, so state size tracks the event RATE, not
    * history). Inner joins emit matches eagerly as both sides arrive, so
    * stream and batch agree on content (StreamingSpec asserts equality);
    * the watermark only governs state cleanup. Batch input plans the same
    * join stateless, which is what the st02 gate query hash-verifies.
    *
    * Reference has no streaming joins (amadeus-core/src/pipe.rs composes
    * batch pipes only) — this exceeds it. */
  def attributionJoin(events: DataFrame, earlyType: String = "click",
      lateType: String = "purchase", horizonMinutes: Int = 60): DataFrame = {
    val early0 = events.filter(col("event_type") === earlyType)
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
        col("user_id").as("click_user"))
    val late0 = events.filter(col("event_type") === lateType)
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id"), col("value"))
    val (early, late) =
      if (events.isStreaming)
        // early side must stay joinable for the full lookback horizon
        // beyond its watermark; the late side only needs its own slack
        (early0.withWatermark("click_ts", s"${2 * horizonMinutes} minutes"),
          late0.withWatermark("purchase_ts", "30 minutes"))
      else (early0, late0)
    late.join(early,
        col("click_user") === col("user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") -
            expr(s"INTERVAL $horizonMinutes MINUTES"))
      .drop("click_user")
  }

  /** Streaming read of an events parquet directory (schema-first, as
    * readStream requires). */
  /** Continuous near-dup ingest: every micro-batch of a document stream is
    * appended to a persistent MinHash-LSH index store
    * ([[graft.dedup.Dedup.appendToLshIndex]]), writing the batch's verified
    * near-dup pairs (new↔old and new↔new) under `indexPath/pairs/batch=e<N>`
    * before the store gains the batch — the production shape for deduping
    * an ingest firehose against an ever-growing corpus without ever
    * re-scanning it (the store side is scanned once per batch, unshuffled;
    * the batch side is broadcast).
    *
    * `foreachBatch` is the standard boundary for streaming writes that
    * need batch-only logic (multi-pass joins against a mutable store).
    * Effectively-once ingest comes from the store's idempotent batch
    * segments keyed by the streaming epoch id: a replayed epoch overwrites
    * its OWN `meta/bands/pairs` segments and its plan-time `batch=` filter
    * excludes them from "old", so re-processing never double-counts.
    */
  def lshIngest(docs: DataFrame, indexPath: String,
      idCol: String = "doc_id", textCol: String = "text",
      threshold: Double = 0.8)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        graft.dedup.Dedup.appendToLshIndex(batch.sparkSession, indexPath,
          batch.toDF(), idCol, textCol, s"e$epochId", threshold = threshold)
        ()
    }

  /** Continuous vector-index ingest: every micro-batch of an embedding
    * stream is appended to a bucketed IVF table under FROZEN centroids
    * ([[graft.ann.Ann.appendToIvfIndex]]) — the streaming face of the
    * a11 maintenance law: assignment is a pure function of (vector,
    * centroids), so the index after any chopping equals the one-shot
    * build (StreamingSpec asserts probe equality). Same foreachBatch
    * boundary as [[lshIngest]]. */
  def ivfIngest(vectors: DataFrame, table: String,
      cents: Array[Array[Float]], idCol: String = "vec_id",
      vecCol: String = "embedding")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vectors.writeStream.outputMode("append").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ann.Ann.appendToIvfIndex(batch.toDF(), idCol, vecCol, table, cents)
        ()
    }

  /** Streaming CDC materialization: a changelog stream is folded into a
    * per-key snapshot store, one micro-batch at a time. Each batch merges
    * into the store via [[graft.operators.Maintenance.latestPerKey]] —
    * winners (including delete tombstones) per key — which is a max under
    * a total order and therefore batch-size-invariant: the final store
    * equals one-shot [[graft.operators.Maintenance.applyChangelog]] over
    * the whole history regardless of how the stream was chopped (the st07
    * gate stages the log as multiple files precisely to force cross-batch
    * merges). Tombstones stay in the store so a later batch cannot
    * resurrect a deleted key with an older sequence; the returned frame
    * filters them.
    *
    * Store shape at scale: one row per live-or-tombstoned key (bounded by
    * key cardinality, not log length); each merge shuffles store+batch
    * once on the key. The store is swapped atomically (write to `.next`,
    * rename) so a crashed epoch never leaves a half-written store.
    */
  def cdcApplyStreamed(spark: SparkSession, log: DataFrame, stageDir: String,
      keyCols: Seq[String], seqCols: Seq[String], opCol: String,
      deleteOp: String = "D", nFiles: Int = 3): DataFrame = {
    import graft.operators.Maintenance
    foldIntoStore(spark, log, stageDir, nFiles) { (prior, batch) =>
      Maintenance.latestPerKey(prior.fold(batch)(_ unionByName batch),
        keyCols, seqCols, opCol)
    }.filter(col(opCol) =!= deleteOp)
  }

  /** Streaming incremental aggregation: each micro-batch's grouped sums
    * are merged into a persistent aggregate store via
    * [[graft.operators.Maintenance.mergeGroupedSums]] — the streaming
    * face of the materialized-view refresh (u03's law driven by a real
    * stream). Sums/counts are self-mergeable, so the final store equals
    * the one-shot aggregate over the whole input regardless of batch
    * boundaries. Store is group-cardinality-sized; use exact (long)
    * measure columns. */
  def incrementalAggStreamed(spark: SparkSession, rows: DataFrame,
      stageDir: String, keyCols: Seq[String], sumCols: Seq[String],
      nFiles: Int = 3): DataFrame =
    foldIntoStore(spark, rows, stageDir, nFiles) { (prior, batch) =>
      // raw batch measures and prior partial sums share the (key, sums)
      // shape once projected, so one grouped sum over the union IS the
      // merge (extra staging columns like ts are dropped here)
      val cols = (keyCols ++ sumCols).map(col)
      prior.fold(batch.select(cols: _*))(
          _.select(cols: _*) unionByName batch.select(cols: _*))
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col(sumCols.head)).as(sumCols.head),
          sumCols.tail.map(c => sum(col(c)).as(c)): _*)
    }

  /** Stream-STATIC enrichment join — the most common production join
    * shape: every micro-batch of the event stream joins a static
    * dimension frame (no state, no watermark; the dimension is re-read
    * per batch by the planner, which is how slowly-refreshed dims get
    * picked up), then folds into a per-segment aggregate. Complete-mode
    * memory sink; integer cents keep the result engine-exact. Stream
    * must equal the stateless batch join exactly — the st12 gate
    * replays it. */
  def enrichedCountsStreamed(spark: SparkSession, events: DataFrame,
      dim: DataFrame, stageDir: String, nFiles: Int = 3,
      sinkName: String = "st12_sink"): DataFrame =
    runStagedStream(spark, events, stageDir, nFiles, sinkName) { st =>
      st.join(dim, "user_id")
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("cents"))
    }

  /** Incrementally-maintained SKETCH materialized view: a per-hour HLL
    * distinct-users table kept fresh by a real stream — each micro-batch
    * builds its hours' sketches and register-max-merges them into the
    * parquet-backed store ([[graft.operators.SketchViews]] byte form).
    * HLL merge is associative/commutative/idempotent, so the final store
    * is BIT-identical to the one-shot batch build regardless of how the
    * stream was chopped (the st11 gate enforces byte equality), and the
    * store answers sliding-window questions via
    * [[graft.operators.SketchViews.slidingDistinct]]-style merges
    * without ever rescanning history. Store size: one 2^b-byte row per
    * hour — the aggregate-store shape of [[incrementalAggStreamed]] with
    * sketch state instead of sums. */
  def hourlySketchViewStreamed(spark: SparkSession, events: DataFrame,
      stageDir: String, nFiles: Int = 3, b: Int = 12): DataFrame = {
    import graft.aggregators.SketchAggregators.HllSketchAgg
    import graft.operators.SketchViews
    import graft.sketch.HyperLogLog
    // ts is retained for the staging order (stageAscendingFiles chops by
    // it); the merge below only reads (h, id)
    val input = events.select(col("ts"),
      unix_micros(date_trunc("hour", col("ts"))).as("h"),
      col("user_id").cast("long").as("id"))
    foldIntoStore(spark, input, stageDir, nFiles) { (prior, batch) =>
      val s = batch.sparkSession
      import s.implicits._
      val batchSk = batch.select(col("h"), col("id")).as[(Long, Long)]
        .groupByKey(_._1)
        .agg(new HllSketchAgg[(Long, Long)](b, _._2).toColumn)
        .map { case (h, sk) => (h, SketchViews.sketchToBytes(sk)) }
        .toDF("h", "sk")
      prior.fold(batchSk)(_ unionByName batchSk)
        .as[(Long, Array[Byte])]
        .groupByKey(_._1)
        .reduceGroups { (a, c) =>
          (a._1, SketchViews.sketchToBytes(
            SketchViews.sketchFromBytes(a._2)
              .merge(SketchViews.sketchFromBytes(c._2))))
        }
        .map { case (h, (_, sk)) => (h, sk) }
        .toDF("h", "sk")
    }
  }

  /** Time-traveling CDC store: like [[cdcApplyStreamed]], but every
    * epoch's post-merge store is ALSO archived as `store_v<epoch>` —
    * the snapshot-log shape (Delta/Iceberg "VERSION AS OF") built from
    * plain directories. `asOfVersion(stageDir, k)` reads the store as it
    * stood after epoch k; the u07 gate proves each version equals the
    * one-shot apply of the changelog PREFIX that had streamed in by
    * then (replayable because the staging chop is an ntile over a
    * UNIQUE ts). Version directories are immutable once written; a
    * replayed epoch overwrites its own version only — idempotent. */
  def cdcApplyVersioned(spark: SparkSession, log: DataFrame, stageDir: String,
      keyCols: Seq[String], seqCols: Seq[String], opCol: String,
      nFiles: Int = 3): DataFrame = {
    import graft.operators.Maintenance
    foldIntoStore(spark, log, stageDir, nFiles, archiveVersions = true,
      exactChop = true) { (prior, batch) =>
        Maintenance.latestPerKey(prior.fold(batch)(_ unionByName batch),
          keyCols, seqCols, opCol)
    }
  }

  /** Read a [[cdcApplyVersioned]] store as of epoch `version`. */
  def asOfVersion(spark: SparkSession, stageDir: String, version: Long): DataFrame =
    spark.read.parquet(s"$stageDir/store_v$version")

  /** Shared store-fold runner: stage `input` as ascending files, stream
    * them with one file per micro-batch, and per epoch rebuild the store
    * as `merge(prior-store, batch)`, swapping the store directory
    * atomically (write `.next`, rename) so a crashed epoch never leaves
    * a half-written store. `merge` must be associative-in-batches
    * (a max/latest or a grouped sum) and defines the store schema.
    * `archiveVersions` additionally snapshots each epoch's store as
    * `store_v<epoch>` for time travel. */
  private def foldIntoStore(spark: SparkSession, input: DataFrame,
      stageDir: String, nFiles: Int, archiveVersions: Boolean = false,
      exactChop: Boolean = false)
      (merge: (Option[DataFrame], DataFrame) => DataFrame): DataFrame = {
    val inDir = stageAscendingFiles(input, stageDir, nFiles, exactChop)
    val storeDir = new java.io.File(s"$stageDir/store")
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmTree)
      f.delete(); ()
    }
    if (storeDir.exists()) rmTree(storeDir)
    val q = spark.readStream.schema(input.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir.getAbsolutePath)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        val s = batch.sparkSession
        val prior =
          if (storeDir.exists()) Some(s.read.parquet(storeDir.getAbsolutePath))
          else None
        val next = new java.io.File(s"$stageDir/store.next")
        merge(prior, batch.toDF())
          .write.mode("overwrite").parquet(next.getAbsolutePath)
        if (archiveVersions)
          // snapshot-log entry: re-written (not renamed) so the live
          // store swap below stays atomic; a replayed epoch overwrites
          // only its own version
          s.read.parquet(next.getAbsolutePath).write.mode("overwrite")
            .parquet(s"$stageDir/store_v$epochId")
        if (storeDir.exists()) rmTree(storeDir)
        if (!next.renameTo(storeDir))
          sys.error(s"store swap failed: $next -> $storeDir")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(storeDir.getAbsolutePath)
  }

  /** File stream over the generated events table. The on-disk `ts` shape
    * has varied across testdata generations (TIMESTAMP(NANOS) → LongType
    * under `nanosAsLong`; naive micros → TIMESTAMP_NTZ), so probe the
    * batch schema once on the driver and normalize to strict
    * TimestampType exactly like [[graft.Tables.events]] — watermarks
    * reject anything else. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val probed = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream.schema(probed).parquet(dir)
    probed("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
