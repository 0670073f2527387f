package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, leakage-free train/validation/test assignment — the
  * split step every training-data pipeline runs last. Assignment is a
  * pure function of (key, salt): stable across runs, engines, partition
  * layouts and cluster sizes, so a re-run never migrates a document
  * across splits (the classic eval-leak). Salting gives independent
  * re-splits without touching the data.
  *
  * Mechanism: the first two hex chars of `md5(key || ':' || salt)` form
  * a uniform bucket in [0, 256). Fixed-length lowercase hex compares
  * lexicographically exactly as it compares numerically, so the split
  * predicate is a plain string comparison — narrow, codegen'd, and
  * replayable verbatim by any engine with md5 (the DuckDB oracle
  * hash-verifies it).
  *
  * Leakage note: pass the DOCUMENT id for document-level splits, or a
  * coarser key (url domain, cluster representative from
  * [[graft.dedup.Dedup.duplicateClusters]]) to keep near-duplicate
  * families in one split — splitting finer than your dedup granularity
  * re-opens the leak dedup closed.
  */
object Splits {

  /** Bucket threshold as a two-hex-char string: pct of 256, clamped.
    * 256 (a 100% threshold) must sort ABOVE every 2-char hex bucket —
    * f"%02x" would render it "100", which sorts below "ff" ('1' < 'f')
    * and silently misassigned any 100%-boundary split — so it maps to
    * "g0" ('g' > 'f' beats all of "00".."ff"). */
  private def hexThreshold(pctTimes256: Int): String =
    if (pctTimes256 >= 256) "g0"
    else f"${math.max(0, pctTimes256)}%02x"

  /** Split label column for `key`: "train" | "val" | "test" with
    * approximately trainPct/valPct/(100-trainPct-valPct) proportions
    * (granularity 1/256 ≈ 0.4%). */
  def splitLabel(key: Column, salt: String,
      trainPct: Int = 90, valPct: Int = 5): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages train=$trainPct val=$valPct")
    val b = substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 2)
    val tEnd = hexThreshold(math.round(256.0 * trainPct / 100).toInt)
    val vEnd = hexThreshold(math.round(256.0 * (trainPct + valPct) / 100).toInt)
    when(b < tEnd, "train").when(b < vEnd, "val").otherwise("test")
  }

  /** df plus a `split` column assigned by `keyCol`. */
  def assign(df: DataFrame, keyCol: String, salt: String,
      trainPct: Int = 90, valPct: Int = 5): DataFrame =
    df.withColumn("split", splitLabel(col(keyCol), salt, trainPct, valPct))

  /** Deterministic global training order: sort key = md5(key || salt).
    * A different salt per epoch gives independent reshuffles of the
    * whole corpus with zero RNG state — the reshuffle-per-epoch step
    * between [[assign]] and sequence packing. Engine-replayable like the
    * split (the p09 gate hash-verifies the order against DuckDB).
    * Sorting globally is one range exchange; at 100 TB feed this to
    * `repartitionByRange(...).sortWithinPartitions(...)` and let writers
    * emit ordered shards instead of asking for a single total order. */
  def shuffleOrder(key: Column, salt: String): Column =
    md5(concat(key.cast("string"), lit(":" + salt)))
}
