package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming behavior: streaming windowed agg must agree with
  * the batch run of the same transformation; sessionization must split on
  * gaps. */
class StreamingSpec extends AnyFunSuite with CacheHygiene {

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  import spark.implicits._

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("st18 FLAC stream QC is chop-invariant and equals the batch decode") {
    import org.apache.spark.sql.functions._
    import graft.multimodal.{Flac, Multimodal}
    val media = Multimodal
      .mediaFromDocuments(Tables.documents(spark, "/root/testdata/sf0.001"))
      .filter(col("kind") === "audio")
      .select(col("media_id"), col("bytes"))
    val staged = Multimodal.transcodeToFlac(media, blockSize = 64)
      .select(col("media_id").cast("timestamp").as("ts"),
        col("media_id"), col("bytes"))
    def pipeline(df: org.apache.spark.sql.DataFrame) = {
      val nOf = udf((b: Array[Byte]) =>
        Flac.decodeSamples(b).map(_._2.length.toLong).getOrElse(-1L))
      val rOf = udf((b: Array[Byte]) =>
        Flac.decodeSamples(b).map(_._1.toLong).getOrElse(-1L))
      df.select(rOf(col("bytes")).as("sample_rate"), nOf(col("bytes")).as("n"))
        .groupBy(col("sample_rate"))
        .agg(count(lit(1)).as("n_clips"), sum(col("n")).as("n_samples"))
    }
    def run(nFiles: Int) = graft.streaming.EventStreams.runStagedStream(
        spark, staged, s"target/qtmp/st18spec_$nFiles", nFiles,
        s"st18spec_sink_$nFiles")(pipeline)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val one = run(1)
    val three = run(3)
    val batch = pipeline(staged)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(one == batch && three == batch,
      s"streamed FLAC QC must be chop-invariant and batch-equal:\n1=$one\n3=$three\nb=$batch")
    assert(batch.nonEmpty && !batch.exists(_._1 == -1L),
      "every staged clip must decode (no -1 rate bucket)")
  }

  test("streaming windowed agg == batch windowed agg on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val events = (0 until 300).map { i =>
      Event(i.toLong, ts(i), i % 10, if (i % 3 == 0) "click" else "view", i * 0.5)
    }
    val stream = MemoryStream[Event]
    stream.addData(events)
    val q = EventStreams.windowedAgg(stream.toDF(), "1 hour", "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("win_out")
      .orderBy("bucket", "event_type").collect().toSeq
    val batch = EventStreams.windowedAgg(events.toDF(), "1 hour", "1 hour")
      .orderBy("bucket", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("sessionize splits on gap and aggregates within sessions (batch drive)") {
    val events = Seq(
      Event(1, ts(0), 7, "a", 1.0),
      Event(2, ts(10), 7, "a", 2.0),   // same session (gap 10 < 30)
      Event(3, ts(100), 7, "a", 4.0),  // new session (gap 90)
      Event(4, ts(105), 7, "a", 8.0),
      Event(5, ts(0), 8, "b", 1.5))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(events)
    val q = EventStreams.sessionize(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // only sessions closed by a later event in the same batch are emitted;
    // user 7's first session closes when event 3 arrives
    val closed = spark.table("sess_out").as[Session].collect().toSeq
    assert(closed.contains(Session(7, ts(0), ts(10), 2, 3.0)),
      s"expected closed first session, got $closed")
  }

  test("sessionizeBatch == streaming closed sessions + one trailing session per user") {
    val events = Seq(
      Event(1, ts(0), 7, "a", 1.0),
      Event(2, ts(10), 7, "a", 2.0),   // same session (gap 10 < 30)
      Event(3, ts(100), 7, "a", 4.0),  // new session (gap 90)
      Event(4, ts(105), 7, "a", 8.0),
      Event(5, ts(0), 8, "b", 1.5))
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    stream.addData(events)
    val q = EventStreams.sessionize(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_twin_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val closed = spark.table("sess_twin_out").as[Session].collect().toSet
    val batch = EventStreams.sessionizeBatch(events.toDF(), gapMinutes = 30)
      .select(col("user_id"), col("start"), col("end"), col("n_events"), col("total_value"))
      .as[Session].collect().toSet
    // every gap-closed streaming session appears identically in the batch
    // twin, and the batch twin adds exactly the per-user trailing sessions
    assert(closed.subsetOf(batch), s"closed=$closed not within batch=$batch")
    assert(batch == closed ++ Set(
      Session(7, ts(100), ts(105), 2, 12.0),
      Session(8, ts(0), ts(0), 1, 1.5)))
  }

  test("streaming dedup drops in-watermark duplicates; batch twin agrees") {
    implicit val sqlCtx = spark.sqlContext
    val base = (0 until 100).map { i =>
      Event(i.toLong % 40, ts(i % 120), i % 5, "e", 1.0) // ids repeat: 40 distinct
    }
    val stream = MemoryStream[Event]
    stream.addData(base)
    val q = EventStreams.dedupEvents(stream.toDF(), Seq("event_id"), "2 hours")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dedup_out")
    assert(streamed.count() == 40)
    assert(streamed.select("event_id").distinct().count() == 40)
    val batch = EventStreams.dedupEvents(base.toDF(), Seq("event_id"))
    assert(batch.count() == 40)
  }

  test("streaming normalized dedup drops case/punct/space variants") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, ts(0), "Hello,   World!"),
      (2L, ts(1), "hello world"),        // normalized twin of 1
      (3L, ts(2), "HELLO WORLD"),        // another twin
      (4L, ts(3), "a different document"),
      (5L, ts(4), "a, different - document")) // twin of 4
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    stream.addData(docs)
    val q = EventStreams.dedupDocsNormalized(
        stream.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "2 hours")
      .writeStream.format("memory").queryName("norm_dedup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("norm_dedup_out")
    assert(kept.count() == 2, s"expected 2 distinct docs, got ${kept.count()}")
    assert(!kept.columns.contains("__norm_digest"))
    val batch = EventStreams.dedupDocsNormalized(
      docs.toDF("doc_id", "ts", "text"), "text", "ts")
    assert(batch.count() == 2)
  }

  test("streaming simhash near-dup filter drops signature-colliding docs") {
    implicit val sqlCtx = spark.sqlContext
    // identical token streams after normalization -> same simhash; a
    // genuinely different text -> different signature survives
    val docs = Seq(
      (1L, ts(0), "The quick brown fox jumps over the lazy dog"),
      (2L, ts(1), "the QUICK brown fox... jumps over the lazy dog!"), // near-dup
      (3L, ts(2), "an entirely unrelated piece of text about sparks"),
      (4L, ts(3), "The quick brown fox jumps over the lazy dog")) // exact dup
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    stream.addData(docs)
    val q = EventStreams.dedupDocsSimhash(
        stream.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "2 hours")
      .writeStream.format("memory").queryName("simhash_dedup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val kept = spark.table("simhash_dedup_out")
    assert(kept.count() == 2, s"expected 2 docs after near-dup filter, got ${kept.count()}")
    assert(!kept.columns.contains("__simhash"))
    // batch twin agrees
    assert(EventStreams.dedupDocsSimhash(
      docs.toDF("doc_id", "ts", "text"), "text", "ts").count() == 2)
  }

  test("stream-stream interval join emits exactly the batch join's rows") {
    implicit val sqlCtx = spark.sqlContext
    // clicks at minutes 0,30,61,100; purchases at 65 and 200:
    //  - purchase@65 attributes to clicks@30 (35m ago) and @61 (4m ago),
    //    NOT @0 (65m > 1h horizon)
    //  - purchase@200 attributes to nothing (click@100 is 100m old)
    //  - user 9's click never joins user 1's purchases
    val events = Seq(
      Event(1, ts(0), 1, "click", 0.0),
      Event(2, ts(30), 1, "click", 0.0),
      Event(3, ts(61), 1, "click", 0.0),
      Event(4, ts(100), 1, "click", 0.0),
      Event(5, ts(65), 1, "purchase", 9.99),
      Event(6, ts(200), 1, "purchase", 5.0),
      Event(7, ts(64), 9, "click", 0.0))
    val stream = MemoryStream[Event]
    stream.addData(events)
    val q = EventStreams.attributionJoin(stream.toDF(), horizonMinutes = 60)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val cols = Seq("purchase_id", "click_id", "purchase_ts", "click_ts",
      "user_id", "value")
    val streamed = spark.table("attr_out")
      .select(cols.map(col): _*).collect().toSet
    val batch = EventStreams.attributionJoin(events.toDF(), horizonMinutes = 60)
      .select(cols.map(col): _*).collect().toSet
    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    assert(batch.map(r => (r.getLong(0), r.getLong(1))) == Set((5L, 2L), (5L, 3L)))
  }

  test("file-based readStream over events parquet drives the same agg") {
    val q = EventStreams.windowedAgg(
        EventStreams.readEventStream(spark, "/root/testdata/sf0.001"),
        "1 hour", "1 hour", "2 hours")
      .writeStream.format("memory").queryName("file_out")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("file_out")
    val batch = EventStreams.windowedAgg(
      Tables.events(spark, "/root/testdata/sf0.001"), "1 hour", "1 hour")
    assert(got.count() == batch.count())
    assert(got.agg(sum("n")).head().getLong(0) ==
      Tables.events(spark, "/root/testdata/sf0.001").count())
  }

  test("windowedAggStreamed: >= 3 micro-batches, result equals batch agg exactly") {
    val d = "/root/testdata/sf0.001"
    val e = Tables.events(spark, d)
      .select(org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("value"))
    val streamed = EventStreams.windowedAggStreamed(spark, e,
        "target/qtmp/st03_spec_stage", nFiles = 3, sinkName = "st03_spec_sink")
      .collect().map(_.toString).sorted.toSeq
    val batch = EventStreams.windowedAgg(e, "1 hour", "1 hour")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch,
      s"streamed(${streamed.size}) != batch(${batch.size})")
    assert(streamed.nonEmpty)
    // three staged files must exist with strictly increasing mod times
    val files = new java.io.File("target/qtmp/st03_spec_stage/in").listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 3)
    assert(files.map(_.lastModified()).sliding(2).forall(p => p(0) < p(1)))
  }

  test("hllDistinctStreamed: sketch state store merge is bit-identical to batch") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("user_id"), col("event_type"))
    val streamed = EventStreams.hllDistinctStreamed(spark, e,
        "target/qtmp/st04_spec_stage", nFiles = 3, sinkName = "st04_spec_sink")
      .as[(String, Long)].collect().sorted.toSeq
    val batch = EventStreams.hllUsersPerType(e)
      .as[(String, Long)].collect().sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed $streamed != batch $batch")
  }

  test("thetaDistinctStreamed: KMV state merge equals batch on any split") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("user_id"), col("event_type"))
    val batch = EventStreams.thetaUsersPerType(e, 64)
      .as[(String, Double)].collect().sorted.toSeq
    // two different micro-batch splits must both equal the batch build —
    // theta merge is order/packaging-independent
    Seq(2, 5).foreach { n =>
      val streamed = EventStreams.thetaDistinctStreamed(spark, e,
          s"target/qtmp/st14_spec_stage_$n", nFiles = n,
          sinkName = s"st14_spec_sink_$n", k = 64)
        .as[(String, Double)].collect().sorted.toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"nFiles=$n: streamed $streamed != batch $batch")
    }
  }

  test("topTypesStreamed: Top/CMS state store merge equals batch exactly") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("event_type"))
    val streamed = EventStreams.topTypesStreamed(spark, e,
        "target/qtmp/st06_spec_stage", nFiles = 3, sinkName = "st06_spec_sink")
      .as[(String, Long)].collect().sorted.toSeq
    val batch = EventStreams.topEventTypes(e)
      .as[(String, Long)].collect().sorted.toSeq
    val exact = e.groupBy("event_type").count()
      .as[(String, Long)].collect().sorted.toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"streamed $streamed != batch $batch")
    assert(streamed == exact, s"sketch regime not exact: $streamed vs $exact")
  }

  test("topFreqShardsStreamed: streamed shards share the batch tracked prefix and rollup answer") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    import graft.aggregators.SketchAggregators.{contramap, TopFreqMergeTopNAgg}
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("ts"), col("user_id"))
    def rollup(shards: org.apache.spark.sql.DataFrame) =
      shards.as[(String, String, Array[Byte])].groupByKey(_._1)
        .agg(contramap((t: (String, String, Array[Byte])) => t._3,
          new TopFreqMergeTopNAgg[Long](50, 4, 2048)).toColumn.name("top"))
        .collect().toMap
    val batchShards = EventStreams.topFreqUserShards(e)
    val streamedShards = EventStreams.topFreqShardsStreamed(spark, e,
      "target/qtmp/st16_spec_stage", nFiles = 3, sinkName = "st16_spec_sink")
    // the CMS tail is fed per partial buffer (first arrivals), so full
    // shard BYTES may differ between chopping layouts — but the TRACKED
    // section (header + ranked exact entries) must be byte-identical,
    // and the rollup answer must match exactly in the exact regime
    def prefixes(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String, Array[Byte])].collect()
        .map { case (t, day, sk) =>
          val m = java.nio.ByteBuffer.wrap(sk, 15, 4).getInt
          (t, day) -> (sk.take(19 + 20 * m).toSeq) }
        .toMap
    val bp = prefixes(batchShards); val sp = prefixes(streamedShards)
    assert(bp.keySet == sp.keySet && bp.keySet.nonEmpty)
    bp.foreach { case (k, pre) =>
      assert(sp(k) == pre, s"tracked prefix differs for shard $k") }
    assert(rollup(batchShards) == rollup(streamedShards),
      "streamed shard table must answer identically to the batch one")
  }

  test("checkpointed restart: resumes from committed offsets, no duplicate windows") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.Trigger
    // the production crash/redeploy story: append-mode parquet sink +
    // checkpoint. Run 1 sees 2 of 3 staged files and finalizes the
    // watermark-closed windows; run 2 (a NEW query over the same
    // checkpoint) must process ONLY the third file, never re-emit run 1's
    // windows, and everything emitted must match the batch aggregation.
    val base = "target/qtmp/st_ckpt"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete()
    }
    rmrf(new java.io.File(base))
    val e = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), col("event_type"), col("value"))
    val in = EventStreams.stageAscendingFiles(e, s"$base/stage", 3)
    // hide the last file from run 1 (keep its modTime for ordering)
    val f3 = new java.io.File(in, "03.parquet")
    val mt3 = f3.lastModified()
    val hidden = new java.io.File(base, "hidden.parquet")
    java.nio.file.Files.move(f3.toPath, hidden.toPath)
    def runOnce(): Unit = {
      val q = EventStreams.windowedAgg(
          spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", "1").parquet(in.getAbsolutePath))
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    val after1 = spark.read.parquet(s"$base/out").count()
    assert(after1 > 0, "run 1 should finalize some watermark-closed windows")
    java.nio.file.Files.move(hidden.toPath, f3.toPath)
    f3.setLastModified(mt3)
    runOnce()
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() > after1,
      "restart should finalize further windows from the third file")
    // exactly-once: no (bucket, event_type) emitted twice across runs
    val dupes = out.groupBy(col("bucket"), col("event_type"))
      .count().filter(col("count") > 1).count()
    assert(dupes == 0, s"$dupes duplicate windows across restart")
    // every emitted row agrees with the batch aggregation bit-for-bit
    val batch = EventStreams.windowedAgg(e)
    val mismatched = out.join(batch, Seq("bucket", "event_type", "n", "sum_value"),
      "left_anti").count()
    assert(mismatched == 0, s"$mismatched emitted rows disagree with batch")
  }

  test("streaming LSH ingest: micro-batched appends equal one-shot batch dedup") {
    import graft.dedup.Dedup
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, d)
    val dir = "target/qtmp/lsh_stream_idx"
    // base corpus indexed in batch; its internal pairs via the one-shot op
    val base = docs.filter(col("doc_id") % 3 === 0)
    Dedup.buildLshIndex(base, "doc_id", "text", dir)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").as[(Long, Long)].collect().toSet
    val basePairs = pairSet(Dedup.minhashLshPairs(base, "doc_id", "text", threshold = 0.8))
    // remaining docs arrive as two stream micro-batches (epochs e0, e1)
    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.lshIngest(
      stream.toDF().toDF("doc_id", "text"), dir).start()
    def batchOf(m: Int) = docs.filter(col("doc_id") % 3 === m)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    try {
      stream.addData(batchOf(1)); q.processAllAvailable()
      stream.addData(batchOf(2)); q.processAllAvailable()
    } finally q.stop()
    val streamedPairs = pairSet(spark.read.parquet(s"$dir/pairs"))
    val oneShot = pairSet(Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.8))
    assert(oneShot.nonEmpty, "fixture should contain near-dup pairs")
    assert(basePairs ++ streamedPairs == oneShot,
      s"missing=${oneShot -- basePairs -- streamedPairs} " +
        s"extra=${(basePairs ++ streamedPairs) -- oneShot}")
  }

  test("dropDuplicatesWithinWatermark: redelivery inside the horizon is suppressed") {
    // the bounded-state production form of st05's dropDuplicates: state
    // for a key may be dropped once the watermark passes ts + delay, so
    // only redelivery INSIDE the horizon is guaranteed suppressed —
    // which is what an at-least-once feed actually produces
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = stream.toDF().toDF("event_id", "ts", "event_type")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("ddww_sink")
      .outputMode("append").start()
    try {
      stream.addData(Seq((1L, ts(600), "click"), (2L, ts(601), "view")))
      q.processAllAvailable()
      // batch 2: event 1 redelivered 10 min later + a fresh event 3
      stream.addData(Seq((1L, ts(610), "click"), (3L, ts(611), "view")))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("ddww_sink").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L),
      s"expected each id exactly once, got $ids")
  }

  test("stageAscendingFiles tolerates rows < nFiles (empty trailing buckets)") {
    // 2 rows into 5 ntile buckets leaves 3 empty; staging must skip
    // them (not throw) and the staged stream must still deliver all rows
    val base = "target/qtmp/st_small"
    val two = spark.range(2).select(
      (lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).cast("long") +
        col("id") * 3600).cast("timestamp").as("ts"),
      col("id").as("user_id"))
    val in = EventStreams.stageAscendingFiles(two, base, 5)
    // this Spark version writes a (valid, empty) part file for an empty
    // bucket — also fine; the guard is against .head throwing when a
    // version emits none. Either way every staged file must be readable.
    val staged = in.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(staged.nonEmpty && staged.length <= 5,
      s"expected <=5 staged files, got ${staged.length}")
    assert(spark.read.parquet(in.getAbsolutePath).count() == 2,
      "staged files must hold every input row")
  }

  test("cdcApplyStreamed: any micro-batch chopping equals one-shot batch apply") {
    // latest-wins is a max, so the store fold must be invariant to how
    // the changelog is split into files/batches — chop it 3 ways
    val log = (1 to 120).map { i =>
      (i.toLong % 11,
        java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 00:00:00"),
        i.toLong, if (i % 6 == 0) "D" else "U", s"v$i")
    }.toDF("k", "ts", "seq", "op", "v")
    val expect = graft.operators.Maintenance
      .applyChangelog(log, Seq("k"), Seq("ts", "seq"), "op")
      .select("k", "v").as[(Long, String)].collect().toMap
    for (nFiles <- Seq(1, 3, 7)) {
      val got = EventStreams.cdcApplyStreamed(spark, log,
          s"target/qtmp/st_cdc_$nFiles", Seq("k"), Seq("ts", "seq"), "op",
          nFiles = nFiles)
        .select("k", "v").as[(Long, String)].collect().toMap
      assert(got == expect, s"nFiles=$nFiles diverged from batch apply")
    }
  }

  test("incrementalAggStreamed: any chopping equals the one-shot aggregate") {
    val rows = (1 to 90).map { i =>
      ((i % 8).toLong,
        java.sql.Timestamp.valueOf(f"2024-02-${i % 28 + 1}%02d 00:00:00"),
        1L, i.toLong)
    }.toDF("k", "ts", "n", "s")
    val expect = rows.groupBy("k").agg(sum("n").as("n"), sum("s").as("s"))
      .as[(Long, Long, Long)].collect().toSet
    for (nFiles <- Seq(1, 4)) {
      val got = EventStreams.incrementalAggStreamed(spark, rows,
          s"target/qtmp/st_agg_$nFiles", Seq("k"), Seq("n", "s"), nFiles = nFiles)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expect, s"nFiles=$nFiles diverged from one-shot agg")
    }
  }

  test("cdcApplyStreamed: tombstone in an earlier batch blocks an older late row") {
    // staging order (ts) is decoupled from the CDC sequence (seq): the
    // DELETE at seq 10 arrives in batch 1, then an out-of-order UPDATE
    // with OLDER seq 5 arrives in a later batch. Without tombstones in
    // the store the late row would resurrect key 1; with them it must
    // stay deleted.
    val log = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10L, "D", ""),
      (1L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 5L, "U", "old"),
      (2L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 1L, "U", "live"))
      .toDF("k", "ts", "seq", "op", "v")
    val got = EventStreams.cdcApplyStreamed(spark, log,
        "target/qtmp/st_cdc_tomb", Seq("k"), Seq("seq"), "op",
        nFiles = 3)
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "live"))
  }

  test("ivfIngest: streamed appends probe identically to the one-shot build") {
    import graft.ann.Ann
    val rnd = new scala.util.Random(11)
    val emb = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        (if (j == (i % 4) * 2) 5f else 0f) + rnd.nextFloat() * 0.2f).toSeq,
        new java.sql.Timestamp(1700000000000L + i * 1000L))
    }.toDF("vec_id", "embedding", "ts")
    val base = emb.filter(col("vec_id") < 100)
    val feed = emb.filter(col("vec_id") >= 100)
    val cents = Ann.buildIvfIndex(base, "vec_id", "embedding",
      "graft_ivf_stream_t", nLists = 8, seed = 7L)
    // stream the second half in 4 micro-batches
    val inDir = EventStreams.stageAscendingFiles(feed,
      "target/qtmp/st_ivf_ingest", 4)
    val q = EventStreams.ivfIngest(
        spark.readStream.schema(feed.schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir.getAbsolutePath),
        "graft_ivf_stream_t", cents)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    Ann.buildIvfIndexFrom(emb, "vec_id", "embedding",
      "graft_ivf_stream_ref", cents)
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val streamed = Ann.ivfTopKIndexed(spark, "graft_ivf_stream_t", cents,
      queries, k = 5).collect().toSet
    val rebuilt = Ann.ivfTopKIndexed(spark, "graft_ivf_stream_ref", cents,
      queries, k = 5).collect().toSet
    assert(streamed == rebuilt && streamed.nonEmpty)
  }

  test("IVF segment store: append==rebuild, batchId re-ingest idempotent") {
    import graft.ann.Ann
    val rnd = new scala.util.Random(23)
    val emb = (0 until 160).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        (if (j == (i % 4) * 2) 5f else 0f) + rnd.nextFloat() * 0.2f).toSeq)
    }.toDF("vec_id", "embedding")
    val base = emb.filter(col("vec_id") < 100)
    val feed = emb.filter(col("vec_id") >= 100)
    val cents = Ann.trainCentroidsReplay(base, "vec_id", "embedding",
      nLists = 4, iters = 3, initIdx = Seq(0, 25, 50, 75))
    val path = "target/qtmp/st_ivf_store"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(new java.io.File(path))
    Ann.buildIvfStore(base, "vec_id", "embedding", path, cents)
    Ann.appendToIvfStore(feed, "vec_id", "embedding", path, cents, "b0")
    val queries = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val appended = Ann.ivfTopKStore(spark, path, cents, queries, k = 5)
      .collect().toSet
    // probing the segment store == probing a one-shot bucketed rebuild
    // under the same frozen centroids (assignment is pure)
    Ann.buildIvfIndexFrom(emb, "vec_id", "embedding",
      "graft_ivf_store_ref", cents)
    val rebuilt = Ann.ivfTopKIndexed(spark, "graft_ivf_store_ref", cents,
      queries, k = 5).collect().toSet
    assert(appended == rebuilt && appended.nonEmpty,
      "segment-store probe drifted from the bucketed rebuild")
    // a REPLAYED trigger re-runs the same batchId: the segment is
    // overwritten, not duplicated — exactly-once under epoch replay
    Ann.appendToIvfStore(feed, "vec_id", "embedding", path, cents, "b0")
    val total = spark.read.parquet(s"$path/vecs").count()
    assert(total == 160L, s"re-ingest duplicated rows: $total")
    assert(Ann.ivfTopKStore(spark, path, cents, queries, k = 5)
      .collect().toSet == rebuilt)
    intercept[IllegalArgumentException] {
      Ann.appendToIvfStore(feed, "vec_id", "embedding", path, cents, "base")
    }
  }

  test("cdcApplyVersioned: versions archive per epoch; final == live store") {
    val log = (1 to 60).map { i =>
      (new java.sql.Timestamp(1700000000000L + i * 1000L), i.toLong % 7,
        i.toLong, if (i % 5 == 0) "D" else "U", s"v$i")
    }.toDF("ts", "k", "seq", "op", "v")
    val stage = "target/qtmp/st_ttrav"
    val live = EventStreams.cdcApplyVersioned(spark, log, stage,
        Seq("k"), Seq("seq"), "op", nFiles = 4)
    val dirs = new java.io.File(stage).listFiles()
      .filter(_.getName.startsWith("store_v")).map(_.getName).sorted
    assert(dirs.toSeq == Seq("store_v0", "store_v1", "store_v2", "store_v3"))
    val finalV = EventStreams.asOfVersion(spark, stage, 3)
      .select("k", "seq", "op").as[(Long, Long, String)].collect().toSet
    assert(finalV == live.select("k", "seq", "op")
      .as[(Long, Long, String)].collect().toSet)
    // version 0 holds only the first file's winners: max seq <= 15
    val v0max = EventStreams.asOfVersion(spark, stage, 0)
      .agg(max(col("seq"))).as[Long].head()
    assert(v0max <= 15, s"v0 contains future rows (max seq $v0max)")
  }

  test("hourlySketchViewStreamed: any chopping yields the bit-identical store") {
    val base = java.sql.Timestamp.valueOf("2024-05-01 00:00:00").getTime
    val ev = (0 until 400).map { i =>
      (new java.sql.Timestamp(base + (i % 9) * 3600000L + i * 777L),
        (i % 53).toLong)
    }.toDF("ts", "user_id")
    def run(nFiles: Int) = EventStreams.hourlySketchViewStreamed(spark, ev,
        s"target/qtmp/st_skview_$nFiles", nFiles = nFiles)
      .as[(Long, Array[Byte])].collect()
      .map { case (h, sk) => h -> sk.toSeq }.toMap
    val one = run(1)
    val five = run(5)
    assert(one.keySet == five.keySet && one.keySet.size == 9)
    one.foreach { case (h, sk) =>
      assert(five(h) == sk, s"hour $h store bytes diverged with chopping")
    }
    // round-trip law: bytes -> sketch -> bytes is the identity
    import graft.operators.SketchViews
    one.values.foreach { sk =>
      assert(SketchViews.sketchToBytes(
        SketchViews.sketchFromBytes(sk.toArray)).toSeq == sk)
    }
    // cross-component composability: the STREAMED store's shard bytes
    // feed the sk21 sketch-table rollup aggregators directly (one
    // serialized format repo-wide) — merged estimate equals the sketch
    // built over all events in one pass
    import graft.aggregators.SketchAggregators.HllMergeEstimateAgg
    val b = SketchViews.sketchFromBytes(one.values.head.toArray).b
    val rolled = one.values.map(_.toArray).toSeq.toDS()
      .select(new HllMergeEstimateAgg(b).toColumn).head()
    val direct = new graft.sketch.HyperLogLog(b)
    ev.select("user_id").as[Long].collect().foreach(direct.add)
    assert(rolled == direct.estimateReplayable,
      "streamed shard bytes must merge to the one-pass sketch estimate")
  }

  test("sessionWindowStreamed: sessions spanning file boundaries merge in state") {
    // user 1: events at minutes 0,10,20,30,40 — ONE session (gaps 10min),
    // deliberately chopped into 5 files so every gap crosses a micro-batch
    // boundary; user 2: minutes 0 and 120 — two sessions.
    val ev = (Seq(0, 10, 20, 30, 40).map(m => (ts(m), 1L, 1.0)) ++
      Seq((ts(0), 2L, 2.0), (ts(120), 2L, 2.0))).toDF("ts", "user_id", "value")
    val got = EventStreams.sessionWindowStreamed(spark, ev,
        "target/qtmp/st_sess_win", nFiles = 5)
      .select("user_id", "n_events", "cents")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 5L, 500L), (2L, 1L, 200L), (2L, 1L, 200L)))
    // the streamed result equals the batch session_window aggregation
    val batch = EventStreams.sessionWindowAgg(ev)
      .select("user_id", "start", "end", "n_events", "cents")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Long)]
      .collect().toSet
    val streamed = EventStreams.sessionWindowStreamed(spark, ev,
        "target/qtmp/st_sess_win2", nFiles = 3)
      .select("user_id", "start", "end", "n_events", "cents")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long, Long)]
      .collect().toSet
    assert(streamed == batch)
    // end = last event + gap
    val u1 = batch.find(_._1 == 1L).get
    assert(u1._3.getTime - ts(40).getTime == 30 * 60000L)
  }

  test("attributionJoinStreamed: streamed self-join rows == batch join rows") {
    val ev = (Seq(
      (1L, ts(0), 7L, "click", 0.0), (2L, ts(30), 7L, "click", 0.0),
      (3L, ts(50), 7L, "purchase", 9.0),   // joins clicks at 0 and 30
      (4L, ts(200), 7L, "purchase", 5.0),  // no click in lookback
      (5L, ts(190), 8L, "click", 0.0),
      (6L, ts(210), 8L, "purchase", 3.0))) // cross-file pair for user 8
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val batch = EventStreams.attributionJoin(ev)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    val streamed = EventStreams.attributionJoinStreamed(spark, ev,
        "target/qtmp/st_attr_join", nFiles = 3)
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(batch == Set((3L, 1L), (3L, 2L), (6L, 5L)))
    assert(streamed == batch)
  }
}
