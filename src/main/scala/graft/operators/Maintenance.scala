package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}

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
}
