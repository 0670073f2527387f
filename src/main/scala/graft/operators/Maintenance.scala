package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance operators — the operational side of running a
  * 100 TB corpus: ingest and per-partition writes accumulate small
  * files, and small files destroy scan parallelism economics (one task
  * per file, driver listing cost, row-group fragmentation).
  *
  * The reference has no table maintenance at all (its `Destination`
  * trait is unimplemented — SURVEY §2.1); this is north-star surface.
  */
object Maintenance {

  final case class CompactionStats(
      inputFiles: Long, inputBytes: Long, outputFiles: Int, rows: Long)

  /** Compact a parquet directory into ~`targetFileMB` files.
    *
    * The requested file count is sized from the directory's on-disk
    * (compressed) bytes. By default the rewrite uses `coalesce` (narrow —
    * each output task reads a set of input files, no shuffle); note
    * `coalesce` can only LOWER the partition count, so the actual output
    * may have fewer files than requested (and file sizes drift from the
    * target when compression ratios vary). Pass `shuffle = true` to
    * `repartition` instead when input files are size-skewed and evenly
    * sized outputs matter more than avoiding one shuffle.
    * `CompactionStats.outputFiles` reports the file count ACTUALLY
    * written (listed post-write), not the request.
    *
    * Writes to `outDir` (overwrite) rather than in place: compaction
    * into the live directory is not atomic on plain filesystems — the
    * swap is the caller's (or the table format's) job.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetFileMB: Int = 512, shuffle: Boolean = false): CompactionStats = {
    require(targetFileMB > 0)
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val summary = fs.getContentSummary(path)
    val nOut = math.max(1,
      math.ceil(summary.getLength.toDouble / (targetFileMB * 1024L * 1024L)).toInt)
    val df = spark.read.parquet(inDir)
    val sized = if (shuffle) df.repartition(nOut) else df.coalesce(nOut)
    sized.write.mode(SaveMode.Overwrite).parquet(outDir)
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val written = fs.listStatus(outPath)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    CompactionStats(summary.getFileCount, summary.getLength, written,
      spark.read.parquet(outDir).count())
  }

  /** Rewrite `df` as `nFiles` parquet files Z-order-clustered on two
    * numeric columns, so parquet min/max stats prune point/range scans
    * on EITHER column (the Delta/Iceberg OPTIMIZE ZORDER effect, built
    * from plain Spark pieces).
    *
    * Each coordinate is rank-scaled through sampled quantiles: one
    * distributed `approxQuantile` pass per REWRITE (both columns in a
    * single call) yields ~1k sorted boundaries per column, and the
    * codegen'd [[graft.plans.RankBucketsExpression]] binary-searches
    * each value into its bucket. Rank scaling makes the curve robust to
    * skewed value distributions (equal-width scaling would collapse a
    * heavy-tailed column into a few cells), and the quantile sketch
    * keeps it distributed — no `percent_rank()` global window, whose
    * single-partition sort is exactly the scale cliff this operator
    * exists to avoid. Rows then route through `repartitionByRange` +
    * `sortWithinPartitions` on the codegen'd
    * [[graft.plans.ZOrder2Expression]] Morton code, and the write drops
    * the helper column.
    *
    * This is a LAYOUT operator: the rewritten table must contain exactly
    * the input rows (gate-verified by z01's aggregate replay); the
    * clustering benefit is asserted separately in MaintenanceSpec by
    * measuring per-file min/max spans of both columns.
    */
  def zorderParquet(df: DataFrame, colA: String, colB: String,
      outDir: String, nFiles: Int = 8, buckets: Int = 1024): Unit = {
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val Array(boundsA, boundsB) = df.stat.approxQuantile(
      Array(colA, colB), probs, 1.0 / (4 * buckets))
    def rankBits(c: String, bounds: Array[Double]): Column =
      graft.plans.RankBucketsExpression.rankBuckets(col(c), bounds)
    val z = df
      .withColumn("__z", graft.plans.ZOrder2Expression.zorder2(
        rankBits(colA, boundsA), rankBits(colB, boundsB)))
    z.repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(outDir)
  }

  /** Snapshot merge (upsert): the CDC-compaction pattern for plain
    * parquet tables — `updates` rows win over `base` rows sharing the
    * same key; base rows without an update survive; brand-new keys
    * append. Equivalent to SQL `MERGE INTO ... WHEN MATCHED UPDATE WHEN
    * NOT MATCHED INSERT` materialized as a fresh snapshot.
    *
    * Plan shape: one left-anti join (base ⟕̸ updates on the key) + union.
    * The anti join shuffles on the key (or broadcasts when `updates` is
    * small — Catalyst picks, AQE re-picks at runtime), and the union is
    * free. No driver-side state; scales as one join at any size. The
    * caller owns the atomic directory swap, as with [[compactParquet]].
    */
  def mergeSnapshot(base: DataFrame, updates: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "mergeSnapshot needs at least one key column")
    base.join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(updates)
  }

  /** Semantic diff of two table snapshots by key: one row per
    * differing key with `change` ∈ `A` (added in `next`), `R`
    * (removed), `C` (compared values changed) — the regression-diff
    * primitive for pipeline outputs: run yesterday's and today's
    * curation, diff, review the DELTA instead of re-eyeballing the
    * table (gate u18 hash-verifies the change classification against a
    * full-outer value replay).
    *
    * 100 TB shape: both sides project to (key, xxhash64 of the
    * compared columns) BEFORE the full-outer join, so the exchange
    * moves 8-byte digests instead of rows, and unchanged keys drop
    * right after the join. The digest hashes `to_json(struct(...))`,
    * not the bare columns — `xxhash64(a, b)` SKIPS nulls, so
    * (null, "x") and ("x", null) would collide as "same"; the JSON
    * form keeps the null PATTERN in the hashed bytes
    * (MaintenanceSpec pins that trap). Requires key uniqueness per
    * side — enforce upstream with [[latestPerKey]]. A digest collision
    * needs a real 2⁻⁶⁴ xxhash64 collision on the same key (the d07
    * hashed-gram argument).
    *
    * Keys join NULL-SAFELY (`<=>`): a row whose key column is null
    * matches its counterpart and is COMPARED, instead of surfacing as a
    * spurious A+R pair (plain `=` never matches null). Null-safe
    * equality is still an equi-join key for Catalyst — same
    * shuffle-or-broadcast plan. The key-uniqueness precondition now
    * covers null keys too: a side with SEVERAL null-keyed rows violates
    * it, and (unlike under plain `=`, where duplicate nulls were inert)
    * the null-safe join would cross-multiply them — enforce uniqueness
    * upstream with [[latestPerKey]], which treats null as one key. */
  def diffSnapshots(base: DataFrame, next: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diffSnapshots needs at least one key column")
    require(compareCols.nonEmpty, "diffSnapshots needs compare columns")
    def proj(df: DataFrame, pre: String, d: String) = df.select(
      keyCols.map(k => col(k).as(pre + k)) :+
      xxhash64(to_json(struct(compareCols.map(col): _*))).as(d): _*)
    val l = proj(base, "__l_", "__bd")
    val r = proj(next, "__r_", "__nd")
    val cond = keyCols.map(k => l(s"__l_$k") <=> r(s"__r_$k")).reduce(_ && _)
    l.join(r, cond, "full_outer")
      .withColumn("change",
        when(col("__bd").isNull, lit("A"))
          .when(col("__nd").isNull, lit("R"))
          .when(col("__bd") =!= col("__nd"), lit("C")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(k =>
        coalesce(col(s"__l_$k"), col(s"__r_$k")).as(k)) :+ col("change"): _*)
  }

  /** Apply a CDC changelog to produce the current snapshot: for each key,
    * the row with the highest (seqCols) sequence wins; if that winner's
    * `opCol` is `deleteOp` the key is absent from the result. This is the
    * changelog-compaction step every lakehouse MERGE/upsert pipeline runs
    * (Delta CDF apply, Hudi compaction, Kafka topic materialization).
    *
    * Plan shape: ONE shuffle keyed by `keyCols` feeding a single
    * WindowGroupLimit-able row_number — no join, no driver state. At
    * 100 TB the changelog shuffles once on its natural key; AQE handles
    * skewed hot keys. Ties on the full sequence are broken deterministically
    * by `opCol` descending ('U' > 'D': an update and delete carrying the
    * same sequence resolves to the update — document-stable, not
    * arrival-order-dependent).
    */
  def applyChangelog(log: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String], opCol: String,
      deleteOp: String = "D"): DataFrame =
    latestPerKey(log, keyCols, seqCols, opCol).filter(col(opCol) =!= deleteOp)

  /** Incremental maintenance of a grouped-sum aggregate: merge a base
    * aggregate with the aggregate of a delta without rescanning the base
    * data — the materialized-view refresh step (sums and counts are the
    * self-mergeable aggregates; avg/stddev derive from them). Both inputs
    * are (keyCols, sumCols…) frames; absent keys on either side
    * contribute zero.
    *
    * Plan shape: union + ONE partial/final aggregate keyed by keyCols —
    * map-side combine collapses each side to its group count before the
    * exchange, so the shuffle moves |base groups| + |delta groups| rows,
    * never raw data. At 100 TB the base never gets rescanned: refresh
    * cost is bounded by the delta and the group cardinality. Use exact
    * types (longs / integer cents) for cross-engine replay — float sums
    * would re-associate. */
  def mergeGroupedSums(base: DataFrame, delta: DataFrame,
      keyCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "mergeGroupedSums needs at least one key column")
    require(sumCols.nonEmpty, "mergeGroupedSums needs at least one sum column")
    val cols = keyCols ++ sumCols
    base.select(cols.map(col): _*).unionByName(delta.select(cols.map(col): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** The winner row per key under the (seqCols, opCol-desc) order,
    * KEEPING delete tombstones — the mergeable intermediate for
    * incremental/streaming changelog application: because "latest" is a
    * max under a total order, `latestPerKey(prior-winners ∪ new-rows)`
    * equals `latestPerKey` over the full history, so a store holding one
    * winner (or tombstone) per key can absorb batches of any size.
    * [[applyChangelog]] is this followed by dropping tombstones. */
  def latestPerKey(log: DataFrame, keyCols: Seq[String],
      seqCols: Seq[String], opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "latestPerKey needs at least one key column")
    require(seqCols.nonEmpty, "latestPerKey needs at least one sequence column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(seqCols.map(c => col(c).desc) :+ col(opCol).desc: _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Layout-invariant CONTENT fingerprint of a table — the integrity
    * primitive for replication / migration / compaction validation at
    * scale: "does the copy hold exactly the same rows", answerable in
    * ONE aggregate pass on each side with no sort and no row transfer.
    *
    * Per row: 48-bit md5 prefix of the `|`-joined column values (nulls
    * as an explicit `\\N` sentinel so null/empty don't collide), reduced
    * mod 2³¹−1; fingerprint = Σ mod 2³¹−1. Addition commutes, so ANY
    * partitioning, row order, or file layout yields the same value —
    * and the arithmetic is plain integers, so any engine with md5
    * reproduces it exactly (u12 hash-verifies vs DuckDB). Multiset
    * semantics: duplicate rows each count.
    *
    * Overflow-safe by accumulating in DECIMAL(38,0): terms < 2³¹ summed
    * as raw Longs would silently wrap past ~2³²–2³³ total rows
    * (reachable at the 100 TB target) and break the exact cross-engine
    * replay this operator exists for; a decimal(38,0) sum is exact to
    * ~10²⁹ rows, and past that it fails VISIBLY (null under the
    * session's ANSI-off config, an error under ANSI) instead of
    * silently wrapping to a plausible-looking wrong fingerprint. One
    * aggregate — also what keeps the streamed form
    * ([[graft.streaming.EventStreams.fingerprintStreamed]]) a single
    * stateful operator. The decimal cost is per-partial-merge, not
    * per-row — md5 dominates the per-row work. */
  def contentFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "contentFingerprint needs at least one column")
    val p = 2147483647L // 2^31 - 1
    val joined = concat_ws("|",
      cols.map(c => coalesce(col(c).cast("string"), lit("\\N"))): _*)
    val term = pmod(conv(substring(md5(joined), 1, 12), 16, 10).cast("long"), lit(p))
    df.select(term.cast("decimal(38,0)").as("t"))
      .agg(pmod(sum(col("t")), lit(p).cast("decimal(38,0)"))
          .cast("long").as("content_fp"),
        count(lit(1)).as("n_rows"))
  }
}
