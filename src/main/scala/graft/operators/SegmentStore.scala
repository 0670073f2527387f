package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance for the streamed-ingest SEGMENT stores (LSH `meta/bands/
  * pairs`, audio `fps/pairs`, IVF `vecs` — plus their `capstats`/
  * `dropped` observability sub-stores): every trigger appends one
  * `batch=<id>` directory per sub-store forever, which at 100 TB is the
  * classic small-files death — a year of 1-minute triggers is ~500k
  * directories whose listing alone dominates every probe's planning.
  * [[compactSegmentStore]] folds all segments up to a watermark into a
  * single rewritten `batch=base` segment, preserving probe results
  * EXACTLY (probes read the union over segments; a fold is
  * union-preserving) and preserving inner partition directories (the
  * IVF `cell=` dirs keep their partition-pruning role inside the new
  * base).
  *
  * Crash-safety is the u06 write-then-swap discipline extended with a
  * COMMIT marker so a crashed compaction is RE-ENTRANT:
  *
  *  1. STAGE — the folded rows of every sub-store are written under
  *     `<path>/.compact/stage/<sub>` (a dot-directory: invisible to
  *     Spark's file listing, so concurrent probes never see a
  *     half-written fold);
  *  2. COMMIT — `<path>/.compact/COMMIT` records, per sub-store, the
  *     exact segment ids being folded. Until this file exists, a crash
  *     leaves the store untouched (recovery just deletes the stage);
  *  3. SWAP — per sub-store: delete the folded `batch=<id>` dirs
  *     (including the old base), rename the staged dir to
  *     `batch=base`; then delete the marker. Every step is idempotent
  *     given the marker (deletes are exists-guarded; a staged dir
  *     already renamed is skipped), so re-running [[compactSegmentStore]]
  *     — or just calling it again later — finishes a crashed swap
  *     before doing anything new.
  *
  * Concurrency contract: compaction is a single-writer maintenance
  * operation, ENFORCED (round 16) by an exclusive lease file — a
  * second concurrent compaction/takedown fails loudly instead of
  * clobbering the first one's stage (see [[withLease]]; stale leases
  * from crashed writers are overridden after a TTL). Run it from the
  * stream's own foreachBatch (or between triggers) — the swap window
  * is not atomic across sub-stores, so a probe racing the swap can
  * observe a partially-folded store (the lease serializes WRITERS, not
  * readers). What is guaranteed is that the store is exactly-equal
  * before and after, and that a crash anywhere leaves it recoverable
  * to exactly-equal.
  *
  * Only fold segments that will never be REPLAYED: the streamed appends
  * are idempotent per `batchId` via whole-segment overwrite, and a
  * folded batch no longer has its own segment to overwrite — compact
  * strictly below the stream's committed watermark (`upTo` = a batch id
  * every epoch of which is durably committed).
  */
object SegmentStore {

  /** `mode` is "fold" (compaction: staged sub renamed in as the new
    * `batch=base`) or "rewrite" (takedown: every staged `batch=<id>`
    * renamed in over its deleted original). `emptied` lists, per sub,
    * the rewrite-mode segment ids whose rows were ALL removed — the only
    * deletes that may run unconditionally, because a missing staged dir
    * for any other id means its rename already happened (crash-recovery
    * must then leave the renamed data alone). */
  private[graft] case class Plan(mode: String,
      subs: Seq[(String, Seq[String])],
      emptied: Map[String, Seq[String]] = Map.empty)

  /** Fold every `batch=<id>` segment with `id ≤ upTo` (natural order:
    * digit runs compare numerically, so `b2 < b10`) plus the current
    * `base` into a rewritten `batch=base`, in every sub-store of
    * `path` that is segment-laid-out. Re-entrant: finishes a previously
    * crashed compaction first. No-op when nothing besides `base` folds. */
  def compactSegmentStore(spark: SparkSession, path: String,
      upTo: String, leaseStaleMs: Long = 3600000L): Unit = {
    val fs = fileSystem(spark, path)
    withLease(fs, path, leaseStaleMs) {
      recover(spark, path)
      stage(spark, fs, path, upTo).foreach(swap(fs, path, _))
    }
  }

  /** Single-writer enforcement (round 16 — the contract used to live
    * only in a scaladoc): maintenance ops run under an exclusive lease
    * file `<path>/.compact.lease`, created with `overwrite = false` so
    * a second concurrent writer fails LOUDLY instead of silently
    * clobbering the first one's stage mid-protocol. The lease is a
    * sibling of `.compact` (not inside it — staging deletes that dir).
    * A writer that died without releasing leaves the lease behind; it
    * goes STALE after `staleMs` (judged by file modification time) and
    * the next writer overrides it — crashed-op recovery then proceeds
    * through the normal marker protocol. On HDFS the create is atomic;
    * on a raw local FS `create(overwrite = false)` is exists-THEN-create,
    * which two writer THREADS in one JVM can thread (both pass the
    * check, both "hold" the lease, and the loser's stage delete clobbers
    * the winner's in-flight write — caught live by the race spec on a
    * slow host), so same-JVM acquisition goes through an atomic
    * `putIfAbsent` on a process-wide table first. Two real JVMs on one
    * raw local disk keep the documented TOCTOU residue (HDFS and object
    * stores with atomic create don't). The probe-vs-swap read race is
    * unchanged and stays documented: a manifest-based listing is a
    * larger redesign. */
  /** Per-acquisition token (r17, advisor finding): the map value is an
    * identity-distinct token, not a bare timestamp — a holder that
    * overruns `staleMs` and is reclaimed by another thread must not
    * release the RECLAIMER's lease in its `finally` (conditional
    * `remove(key, token)`; the lease file carries the token too, so the
    * file delete is equally conditional). */
  private final class LeaseTok(val at: Long) {
    val id: Long = leaseIds.incrementAndGet()
    def stamp: String = s"$at:$id"
  }
  private val leaseIds = new java.util.concurrent.atomic.AtomicLong(0L)
  private val jvmLeases =
    new java.util.concurrent.ConcurrentHashMap[String, LeaseTok]()

  private[graft] def withLease[T](fs: FileSystem, path: String,
      staleMs: Long)(body: => T): T = {
    val lease = new Path(s"$path/.compact.lease")
    val key = fs.makeQualified(lease).toString
    def loudlyHeld(cause: Throwable): Nothing = throw new IllegalStateException(
      s"another maintenance op holds the lease on $path " +
        s"($lease): compaction/takedown are single-writer. If that " +
        s"writer crashed, the lease goes stale after ${staleMs} ms " +
        "and the next call recovers it.", cause)
    // same-JVM writers race atomically here (putIfAbsent), never on the
    // non-atomic local-FS create below; stale in-process entries (a
    // writer killed without its finally — fatal JVM errors only) age out
    // on the same clock as the lease file
    val tok = new LeaseTok(System.currentTimeMillis)
    val prev = jvmLeases.putIfAbsent(key, tok)
    if (prev != null) {
      if (System.currentTimeMillis - prev.at <= staleMs)
        loudlyHeld(null)
      else if (!jvmLeases.replace(key, prev, tok)) loudlyHeld(null)
    }
    try {
      if (fs.exists(lease)) {
        val age = System.currentTimeMillis -
          fs.getFileStatus(lease).getModificationTime
        if (age > staleMs) fs.delete(lease, false)
      }
      try {
        val out = fs.create(lease, false)
        out.write(s"${tok.stamp}\n".getBytes("UTF-8"))
        out.close()
      } catch {
        case e: java.io.IOException =>
          if (fs.exists(lease)) loudlyHeld(e) else throw e
      }
    } catch { case t: Throwable => jvmLeases.remove(key, tok); throw t }
    try body finally {
      // release ONLY what this acquisition still owns: if the holder
      // overran staleMs and a reclaimer replaced the entry (and lease
      // file), deleting unconditionally would re-open the double-writer
      // window for a third thread while the reclaimer is mid-body
      try {
        if (jvmLeases.get(key) eq tok) {
          val ours =
            try {
              val in = fs.open(lease)
              val buf = new Array[Byte](64)
              val n = math.max(in.read(buf), 0)
              in.close()
              new String(buf, 0, n, "UTF-8").trim == tok.stamp
            } catch { case _: java.io.IOException => false }
          if (ours) fs.delete(lease, false)
        }
      } finally jvmLeases.remove(key, tok)
    }
  }

  /** Natural (digit-run-aware) `a ≤ b`: the segment ids of streamed
    * ingest are epoch counters rendered as strings (`b2`, `b10`), where
    * plain lexicographic order would fold the wrong set. */
  private[graft] def naturalLeq(a: String, b: String): Boolean = {
    def split(s: String): List[String] =
      "\\d+|\\D+".r.findAllIn(s).toList
    def cmp(x: List[String], y: List[String]): Int = (x, y) match {
      case (Nil, Nil) => 0
      case (Nil, _)   => -1
      case (_, Nil)   => 1
      case (a0 :: at, b0 :: bt) =>
        val c =
          if (a0.head.isDigit && b0.head.isDigit)
            BigInt(a0).compare(BigInt(b0))
          else a0.compareTo(b0)
        if (c != 0) c else cmp(at, bt)
    }
    cmp(split(a), split(b)) <= 0
  }

  private def fileSystem(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Segment-laid-out sub-stores of `path`: direct child dirs holding at
    * least one `batch=` dir. */
  private def listSubs(fs: FileSystem, path: String): Seq[String] = {
    val root = new Path(path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
      .filter(st => fs.listStatus(st.getPath)
        .exists(c => c.isDirectory && c.getPath.getName.startsWith("batch=")))
      .map(_.getPath.getName).sorted
  }

  private def listBatchIds(fs: FileSystem, sub: Path): Seq[String] =
    fs.listStatus(sub).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=")).sorted

  /** Inner partition-directory columns of one segment (e.g. `cell` for
    * the IVF store): the chain of `k=` components below `batch=<id>`,
    * read off one leaf path so the staged rewrite partitions the same
    * way and probes keep their directory pruning. */
  private def innerPartitionCols(fs: FileSystem, seg: Path): Seq[String] = {
    def walk(p: Path, acc: Vector[String]): Vector[String] = {
      val kids = fs.listStatus(p).filter(st => st.isDirectory &&
        st.getPath.getName.contains("=") &&
        !st.getPath.getName.startsWith("."))
      if (kids.isEmpty) acc
      else walk(kids.head.getPath,
        acc :+ kids.head.getPath.getName.takeWhile(_ != '='))
    }
    walk(seg, Vector.empty)
  }

  /** Steps 1–2: write the folded rows of every sub-store under
    * `.compact/stage/` and record the fold in the COMMIT marker.
    * Returns None (and leaves no trace) when nothing besides `base`
    * would fold anywhere. */
  private[graft] def stage(spark: SparkSession, fs: FileSystem,
      path: String, upTo: String): Option[Plan] = {
    val folds = listSubs(fs, path).map { sub =>
      val ids = listBatchIds(fs, new Path(s"$path/$sub"))
      sub -> ids.filter(id => id == "base" || naturalLeq(id, upTo))
    }
    if (!folds.exists(_._2.exists(_ != "base"))) return None
    val stageRoot = new Path(s"$path/.compact/stage")
    fs.delete(new Path(s"$path/.compact"), true)
    folds.foreach { case (sub, ids) =>
      if (ids.nonEmpty) {
        val first = new Path(s"$path/$sub/batch=${ids.head}")
        val inner = innerPartitionCols(fs, first)
        val df = spark.read.parquet(s"$path/$sub")
          .filter(col("batch").isin(ids: _*)).drop("batch")
        val w = df.write.mode("overwrite")
        (if (inner.nonEmpty) w.partitionBy(inner: _*) else w)
          .parquet(s"$stageRoot/$sub")
      }
    }
    // the marker is the commit point: crash before it ⇒ recovery deletes
    // the stage and the store is untouched; crash after it ⇒ recovery
    // finishes the swap from exactly this record
    val out = fs.create(new Path(s"$path/.compact/COMMIT"), true)
    out.write(folds.map { case (sub, ids) =>
      s"$sub\t${ids.mkString(",")}" }.mkString("\n").getBytes("UTF-8"))
    out.close()
    Some(Plan("fold", folds))
  }

  /** REMOVE rows whose `idCols` values appear in `removeIds` (one-column
    * frame) from every segment of the listed sub-stores — the
    * right-to-be-forgotten / takedown maintenance op for the dedup and
    * ANN stores: PII, copyright, or poisoning removals must reach not
    * just the corpus but the INDEX state built from it. Each
    * `batch=<id>` segment is rewritten minus the matching rows
    * (anti-join per listed column — a pairs table drops a row when
    * EITHER endpoint is removed), under the same stage → COMMIT →
    * swap protocol as [[compactSegmentStore]], so a crashed takedown
    * is re-entrant; a segment whose rows are all removed disappears.
    *
    * `capstatsFrom = Some((srcSub, keyCols))` recomputes the store's
    * `capstats/batch=<id>` rows EXACTLY from the rewritten `srcSub`
    * segments (s = rows, k = distinct keyCols), so census-derived caps
    * stay truthful after mass removals instead of drifting stale.
    *
    * `dropped/` segments are NOT touched by default — they are
    * append-TIME observability logs (what a historical trigger declined
    * to pair), not current state, and they carry no doc ids. They DO
    * carry content-derived aggregate keys (minhash band values,
    * perceptual fingerprints) with counts; a strict right-to-be-
    * forgotten deployment that classifies those as derived personal
    * data can pass `purgeDropped = true`: the removed docs' keys are
    * read from the PRE-rewrite `capstatsFrom` postings sub and every
    * dropped-census row matching one is rewritten away — conservative
    * over-purge (a key shared between a removed doc and survivors is
    * purged too, trading a little observability for the privacy-safe
    * direction). Pair REPORTS already emitted for removed docs ARE
    * always retracted (the pairs sub-store lists both endpoint
    * columns), so a post-takedown probe over the store equals a
    * one-shot over the surviving corpus — the d27/m20/a13 gates
    * hash-verify exactly that. Same single-writer contract as
    * compaction. */
  def removeFromSegmentStore(spark: SparkSession, path: String,
      removeIds: org.apache.spark.sql.DataFrame,
      idCols: Map[String, Seq[String]],
      capstatsFrom: Option[(String, Seq[String])] = None,
      leaseStaleMs: Long = 3600000L,
      purgeDropped: Boolean = false): Unit = {
    val fs = fileSystem(spark, path)
    withLease(fs, path, leaseStaleMs) {
      recover(spark, path)
      stageRemove(spark, fs, path, removeIds, idCols, capstatsFrom,
          purgeDropped)
        .foreach(swap(fs, path, _))
    }
  }

  private[graft] def stageRemove(spark: SparkSession, fs: FileSystem,
      path: String, removeIds: org.apache.spark.sql.DataFrame,
      idCols: Map[String, Seq[String]],
      capstatsFrom: Option[(String, Seq[String])],
      purgeDropped: Boolean = false): Option[Plan] = {
    require(!purgeDropped || capstatsFrom.isDefined,
      "purgeDropped needs capstatsFrom: the removed keys are read from " +
        "its postings sub and matched on its key columns")
    capstatsFrom.foreach { case (src, _) =>
      require(idCols.contains(src),
        s"capstatsFrom source '$src' must be one of the rewritten subs") }
    val ids = removeIds
      .select(col(removeIds.columns.head).as("__rid"))
      .filter(col("__rid").isNotNull).distinct()
    val present = listSubs(fs, path)
    val subs = idCols.keys.toSeq.sorted.filter(present.contains)
    if (subs.isEmpty) return None
    val stageRoot = new Path(s"$path/.compact/stage")
    fs.delete(new Path(s"$path/.compact"), true)
    val entries = subs.map { sub =>
      val segIds = listBatchIds(fs, new Path(s"$path/$sub"))
      val inner = innerPartitionCols(fs,
        new Path(s"$path/$sub/batch=${segIds.head}"))
      // anti-join per listed column: the row dies when ANY matches.
      // The removal-set side is left unhinted — takedown sets are
      // usually broadcast-sized and AQE picks that up at runtime, but
      // a court-order-sized sweep degrades to a shuffle join instead
      // of OOMing the driver (the round-15 broadcast-gate discipline)
      val df = idCols(sub).foldLeft(spark.read.parquet(s"$path/$sub")) {
        (d, c) => d.join(ids, d(c) === ids("__rid"), "left_anti") }
      df.write.mode("overwrite")
        .partitionBy("batch" +: inner: _*).parquet(s"$stageRoot/$sub")
      val stagedIds = listBatchIds(fs, new Path(s"$stageRoot/$sub"))
      if (stagedIds.isEmpty) {
        // every row of this sub was removed: a sub dir with zero batch=
        // dirs would make later reads throw unable-to-infer-schema, so
        // keep one empty schema-bearing segment (written flat — the
        // inner cols ride in the file schema of the empty frame)
        df.drop("batch").limit(0).coalesce(1).write.mode("overwrite")
          .parquet(s"$stageRoot/$sub/batch=${segIds.head}")
      }
      sub -> segIds
    }
    // ids with no staged replacement (all rows removed) — the only
    // deletes swap() may run unconditionally on a re-drive
    val emptied = entries.map { case (sub, segIds) =>
      val stagedIds = listBatchIds(fs, new Path(s"$stageRoot/$sub"))
      sub -> segIds.filterNot(stagedIds.contains)
    }.filter(_._2.nonEmpty).toMap
    // recompute capstats EXACTLY from the rewritten source segments
    val capEntry = capstatsFrom.map { case (src, keyCols) =>
      import spark.implicits._
      val capDir = new Path(s"$path/capstats")
      // pre-capstats stores (built before the census machinery) have no
      // capstats dir: recompute fresh over empty prevIds rather than
      // letting listStatus throw
      val prevIds =
        if (fs.exists(capDir)) listBatchIds(fs, capDir) else Seq.empty[String]
      spark.read.parquet(s"$stageRoot/$src")
        .groupBy(col("batch"))
        .agg(count(lit(1)).as("s"),
          count_distinct(struct(keyCols.map(col): _*)).as("k"))
        .collect().foreach { r =>
          Seq((r.getLong(1), r.getLong(2))).toDF("s", "k")
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$stageRoot/capstats/batch=${r.getString(0)}")
        }
      "capstats" -> prevIds
    }
    // optional dropped-census purge: rows whose content-derived key
    // (band hash / fingerprint) was contributed by a removed doc are
    // rewritten away — keys read from the PRE-rewrite postings sub, so
    // the match is exact even though dropped rows carry no doc ids
    val droppedEntry = capstatsFrom.collect {
      case (src, keyCols)
          if purgeDropped && listSubs(fs, path).contains("dropped") =>
        val removedKeys = spark.read.parquet(s"$path/$src")
          .join(ids, col(idCols(src).head) === ids("__rid"), "left_semi")
          .select(keyCols.map(col): _*).distinct()
        val prevIds = listBatchIds(fs, new Path(s"$path/dropped"))
        val df = spark.read.parquet(s"$path/dropped")
          .join(removedKeys, keyCols, "left_anti")
        df.write.mode("overwrite").partitionBy("batch")
          .parquet(s"$stageRoot/dropped")
        val stagedIds = listBatchIds(fs, new Path(s"$stageRoot/dropped"))
        if (stagedIds.isEmpty)
          df.drop("batch").limit(0).coalesce(1).write.mode("overwrite")
            .parquet(s"$stageRoot/dropped/batch=${prevIds.head}")
        "dropped" -> prevIds
    }
    // capstats segments whose source batch vanished get no staged row —
    // they too must be recorded as emptied (unconditional delete)
    val capEmptied = (capEntry.toSeq ++ droppedEntry.toSeq).flatMap { case (sub, prevIds) =>
      val stagedSub = new Path(s"$stageRoot/$sub")
      val stagedIds =
        if (fs.exists(stagedSub)) listBatchIds(fs, stagedSub)
        else Seq.empty[String]
      val gone = prevIds.filterNot(stagedIds.contains)
      if (gone.nonEmpty) Seq(sub -> gone) else Seq.empty
    }.toMap
    val plan = Plan("rewrite", entries ++ capEntry.toSeq ++ droppedEntry.toSeq,
      emptied ++ capEmptied)
    val out = fs.create(new Path(s"$path/.compact/COMMIT"), true)
    out.write((s"mode\trewrite\n" + plan.subs.map { case (sub, segIds) =>
      val gone = plan.emptied.getOrElse(sub, Seq.empty)
      s"$sub\t${segIds.mkString(",")}\t${gone.mkString(",")}"
    }.mkString("\n")).getBytes("UTF-8"))
    out.close()
    Some(plan)
  }

  /** Step 3: delete the replaced segments, rename the staged data in,
    * drop the marker. Idempotent given the marker — and crucially the
    * deletes are CONDITIONED on the staged copy still existing: once a
    * sub's (fold) or segment's (rewrite) rename has happened, its staged
    * dir is gone, and re-driving the swap after a crash in that window
    * must NOT re-delete what the rename just installed (re-deleting
    * `batch=base` with no staged copy left would lose the fold — only
    * rewrite-mode `emptied` segments, which have no staged replacement
    * by construction, keep unconditional deletes). */
  private[graft] def swap(fs: FileSystem, path: String, plan: Plan): Unit = {
    plan.subs.foreach { case (sub, ids) =>
      val staged = new Path(s"$path/.compact/stage/$sub")
      if (plan.mode == "fold") {
        // staged gone ⇒ this sub's delete+rename already completed on a
        // previous drive (or nothing was staged for it) — skip entirely
        if (fs.exists(staged)) {
          ids.foreach { id =>
            val seg = new Path(s"$path/$sub/batch=$id")
            if (fs.exists(seg)) fs.delete(seg, true)
          }
          // _SUCCESS markers inside the staged dir are harmless (hidden
          // from Spark's listing); the rename is the visible instant
          if (!fs.rename(staged, new Path(s"$path/$sub/batch=base")))
            throw new java.io.IOException(
              s"compaction swap: rename failed for $sub (crashed midway? " +
                "re-run compactSegmentStore to recover)")
        }
      } else {
        // rewrite mode: per-segment delete-then-rename, each conditioned
        // on its staged batch dir existing; only the recorded `emptied`
        // segments (all rows removed ⇒ no staged replacement) are
        // deleted unconditionally
        plan.emptied.getOrElse(sub, Seq.empty).foreach { id =>
          val seg = new Path(s"$path/$sub/batch=$id")
          if (fs.exists(seg)) fs.delete(seg, true)
        }
        if (fs.exists(staged)) {
          fs.listStatus(staged)
            .filter(st => st.isDirectory &&
              st.getPath.getName.startsWith("batch="))
            .foreach { st =>
              val name = st.getPath.getName
              val seg = new Path(s"$path/$sub/$name")
              if (fs.exists(seg)) fs.delete(seg, true)
              if (!fs.rename(st.getPath, seg))
                throw new java.io.IOException(
                  s"takedown swap: rename failed for $sub/$name" +
                    " (crashed midway? re-run to recover)")
            }
        }
      }
    }
    fs.delete(new Path(s"$path/.compact"), true)
  }

  /** Auto-compaction policy for the streamed appends (round 16 — st26
    * proved the interleaved fold; production wants it DEFAULT-able):
    * when `dataSub` holds more than `maxSegments` `batch=` dirs, fold
    * everything up to the naturally-LARGEST segment id that is neither
    * `base` nor `excludeBatch` (the trigger's own batch — not yet
    * durable: Structured Streaming may replay it under the same id,
    * and a folded batch has no segment left to overwrite; every EARLIER
    * micro-batch has committed its epoch, so folding it is safe — the
    * st26 watermark contract). Called from inside the appends AFTER
    * their own segments are durable; monotone batch ids (the streaming
    * shape) are assumed — an out-of-order manual id newer than the
    * current trigger would be folded with the rest. */
  def autoCompact(spark: SparkSession, path: String, dataSub: String,
      excludeBatch: String, maxSegments: Int): Unit = {
    require(maxSegments >= 2,
      s"compactEvery must leave room for base + the live batch, got $maxSegments")
    val fs = fileSystem(spark, path)
    val sub = new Path(s"$path/$dataSub")
    if (!fs.exists(sub)) return
    val ids = listBatchIds(fs, sub)
    if (ids.length <= maxSegments) return
    val prior = ids.filterNot(id => id == "base" || id == excludeBatch)
    if (prior.nonEmpty)
      compactSegmentStore(spark, path,
        prior.reduce((a, b) => if (naturalLeq(a, b)) b else a))
  }

  /** Observability over a segment store — the operational primitive
    * that makes cap drops and compaction debt VISIBLE without
    * spelunking directories: one row per sub-store family with its
    * segment count (compaction debt), row and byte totals, plus the
    * store-wide capstats sums / the CURRENT census-derived append cap
    * on the `capstats` row and the total dropped-key census on the
    * `dropped` row.
    *
    * Cost shape: one driver-side listing per sub (segment-count-
    * bounded — the quantity this query exists to watch) and one
    * footer-only `count()` per sub (parquet row counts come from file
    * metadata, no column data is read). Maintenance-cadence, like the
    * compaction it monitors. The d29 gate hash-verifies every column
    * except `n_bytes` against a DuckDB recompute over the SAME parquet
    * files (bytes are filesystem facts DuckDB cannot see; asserted
    * positive in the gate instead). */
  def storeStats(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val fs = fileSystem(spark, path)
    val subs = listSubs(fs, path)
    val base = subs.map { sub =>
      val subPath = new Path(s"$path/$sub")
      val nSegs = listBatchIds(fs, subPath).length.toLong
      val nBytes = fs.getContentSummary(subPath).getLength
      val nRows = spark.read.parquet(subPath.toString).count()
      (sub, nSegs, nRows, nBytes)
    }
    val capSums = if (subs.contains("capstats")) {
      val r = spark.read.parquet(s"$path/capstats")
        .agg(coalesce(sum(col("s")), lit(0L)).as("s"),
          coalesce(sum(col("k")), lit(0L)).as("k")).head()
      Some((r.getLong(0), r.getLong(1)))
    } else None
    val droppedSum = if (subs.contains("dropped"))
      Some(spark.read.parquet(s"$path/dropped")
        .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0))
    else None
    base.toDF("sub", "n_segments", "n_rows", "n_bytes")
      .withColumn("s_sum", when(col("sub") === "capstats",
        capSums.map(c => lit(c._1)).getOrElse(lit(null))).cast("long"))
      .withColumn("k_sum", when(col("sub") === "capstats",
        capSums.map(c => lit(c._2)).getOrElse(lit(null))).cast("long"))
      .withColumn("derived_cap", when(col("sub") === "capstats",
        capSums.map(c => lit(graft.dedup.Census.derivedCap(c._1, c._2)))
          .getOrElse(lit(null))).cast("long"))
      .withColumn("dropped_n_sum", when(col("sub") === "dropped",
        droppedSum.map(lit(_)).getOrElse(lit(null))).cast("long"))
      .orderBy(col("sub"))
  }

  /** Finish (or discard) a crashed compaction: with a COMMIT marker the
    * recorded swap is re-driven to completion; without one the
    * half-written stage is deleted and the store is untouched. Called
    * automatically by [[compactSegmentStore]]. */
  private[graft] def recover(spark: SparkSession, path: String): Unit = {
    val fs = fileSystem(spark, path)
    val marker = new Path(s"$path/.compact/COMMIT")
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val text = new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
      in.close()
      val lines = text.split("\n").toSeq.filter(_.nonEmpty)
      val (mode, rest) = lines.headOption match {
        case Some(l) if l.startsWith("mode\t") =>
          (l.stripPrefix("mode\t"), lines.tail)
        case _ => ("fold", lines) // pre-round-15 markers carried no mode
      }
      val parsed = rest.map { line =>
        val fields = line.split("\t", 3)
        def csv(i: Int): Seq[String] =
          if (fields.length > i) fields(i).split(",").toSeq.filter(_.nonEmpty)
          else Seq.empty
        (fields(0), csv(1), csv(2))
      }
      val emptied = parsed.collect {
        case (sub, _, gone) if gone.nonEmpty => sub -> gone }.toMap
      swap(fs, path, Plan(mode, parsed.map(p => p._1 -> p._2), emptied))
    } else fs.delete(new Path(s"$path/.compact"), true)
  }
}
