package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The census/cap discipline shared by every pair generator in the
  * engine (text LSH, image dHash bands, video frame hashes, audio
  * fingerprints): any key whose bucket would square a join is MEASURED
  * first and either capped (explicit), uncapped (0), or capped at a
  * census-derived default (-1) — never trusted to be well-behaved at
  * 100 TB. Moved here (round 15) from `graft.multimodal.Multimodal` so
  * the dedup-side streamed append ([[Dedup.appendToLshIndex]]) shares
  * one implementation with the media paths instead of growing a twin.
  *
  * Also home of the STORE-WIDE cap statistics for the streamed-append
  * family (round-15 ADVICE fix): a census-derived default computed over
  * a single batch's keys drifts with batch composition — one
  * degenerate-heavy micro-batch inflates the mean bucket size and
  * RAISES the cap exactly when the protection matters. Every segment
  * store therefore persists a one-row `capstats/batch=<id>` frame
  * `(s = band/fingerprint rows, k = distinct keys)` next to its data
  * segments; at append time the -1 cap derives from the SUM over all
  * segments plus the incoming batch. `Σ per-batch distinct keys`
  * over-counts keys appearing in several batches, so the store-wide
  * mean `s/k` is an UNDER-estimate of the true mean bucket size and the
  * derived cap is conservative — it can only drop MORE hot keys than
  * the exact statistic would (each drop visible in the persisted
  * dropped census), never fewer: the inflate-the-cap failure mode is
  * structurally gone.
  */
private[graft] object Census {

  /** Split a `(key…, n)` bucket census into (kept keys, dropped census).
    *
    * Cap regimes — `cap > 0`: explicit bound; `cap == 0`: uncapped
    * (only singleton buckets pruned — they generate no pairs in any
    * regime); `cap == -1`: census-derived default
    * `max(256, 32 × mean bucket size)` over THIS census — callers with
    * a store-wide statistic should resolve -1 to an explicit bound via
    * [[derivedCap]] BEFORE calling (see the object scaladoc for why).
    * The 256 floor keeps the auto cap from ever binding on gate-scale
    * corpora (every bucket ≤ 256 passes), so correctness oracles stay
    * cap-free unless they opt in.
    *
    * Returns (kept keys, dropped census `(key…, n, cap)`) — the dropped
    * frame is the observability contract: empty ⇒ no loss; non-empty ⇒
    * each row names a degenerate key to handle upstream. */
  def hotKeyPrune(census: DataFrame, keyCols: Seq[String],
      cap: Long): (DataFrame, DataFrame) = {
    val withCap =
      if (cap > 0) census.withColumn("cap", lit(cap))
      else if (cap == 0L) census.withColumn("cap", lit(Long.MaxValue))
      else {
        val capDf = census
          .agg(sum(col("n")).as("s"), count(lit(1)).as("k"))
          .select(greatest(lit(256L),
            lit(32L) * expr("(s + k - 1) div k")).as("cap"))
        census.crossJoin(broadcast(capDf))
      }
    (withCap.filter(col("n").between(2, col("cap")))
       .select(keyCols.map(col): _*),
     withCap.filter(col("n") > col("cap")))
  }

  /** The census-derived default cap over store-wide totals:
    * `max(256, 32 × ceil(s/k))`. */
  def derivedCap(s: Long, k: Long): Long =
    if (k <= 0L) 256L else math.max(256L, 32L * ((s + k - 1) / k))

  /** Persist one batch's cap statistics (`s` rows, `k` distinct keys)
    * as the store's `capstats/batch=<id>` segment — overwritten on
    * re-ingest of the same batchId, so the store-wide sums stay
    * idempotent under streaming epoch replay. */
  def writeCapStats(spark: SparkSession, storePath: String,
      batchId: String, s: Long, k: Long): Unit = {
    import spark.implicits._
    Seq((s, k)).toDF("s", "k")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$storePath/capstats/batch=$batchId")
  }

  /** Store-wide `(Σ s, Σ k)` over every capstats segment EXCEPT
    * `excludeBatch` (the batch being re-ingested must not count its own
    * previous attempt). None ⇒ the store predates capstats (built
    * before round 15) — callers fall back to the batch-restricted
    * census derive, documented at each call site. The read is one
    * driver-side aggregate over one tiny row per batch. */
  def readCapStats(spark: SparkSession, storePath: String,
      excludeBatch: String): Option[(Long, Long)] = {
    val dir = new org.apache.hadoop.fs.Path(s"$storePath/capstats")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) None
    else {
      val row = spark.read.parquet(dir.toString)
        .filter(col("batch") =!= excludeBatch)
        .agg(coalesce(sum(col("s")), lit(0L)).as("s"),
          coalesce(sum(col("k")), lit(0L)).as("k")).head()
      Some((row.getLong(0), row.getLong(1)))
    }
  }
}
