package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data-skipping statistics + metadata-pruned scans — the
  * Delta/Iceberg "data skipping" pattern on plain parquet directories.
  *
  * At 100 TB a table is tens of thousands of files; a predicate that
  * touches 1% of the key range should open ~1% of them. Spark's scan
  * already skips ROW GROUPS via parquet footer pushdown, but it still
  * has to LIST and OPEN every file to do so. This operator hoists the
  * same min/max/null-count stats into a queryable FILE-level table built
  * once at ingest (footers only — a few KB of I/O per file, never the
  * data pages, distributed over executors), so planning can drop whole
  * files before the scan starts. Stats rows are file-count-sized: tiny,
  * broadcastable, cheap to keep fresh by appending rows for new files.
  *
  * Pruning is strictly a PERFORMANCE decision: a file is dropped only
  * when its stats PROVE no row can match (max < lo or min > hi); files
  * with absent stats are conservatively kept, and [[prunedRead]] always
  * re-applies the predicate, so results are exact by construction
  * (gate u10 hash-matches the full-scan oracle; the file-count
  * reduction is asserted in MaintenanceSpec).
  */
object DataSkipping {

  /** Hadoop Configuration is not Serializable; standard write/readFields
    * envelope so executors receive the session's file-system conf. */
  private final class SerializableConf(@transient var conf: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject(); conf = new Configuration(false); conf.readFields(in)
    }
  }

  /** One stats row per (file, requested column):
    * `(file, col, n_rows, null_count, min_num, max_num, min_str, max_str)`.
    *
    * Numeric/timestamp columns fill `min_num`/`max_num` (doubles —
    * exact for |v| ≤ 2^53, which covers keys, dates-as-micros through
    * year ~2255, and any stats use where 1-ulp slack is irrelevant to a
    * CONSERVATIVE prune); UTF8 binary columns fill `min_str`/`max_str`.
    * Columns whose chunks carry no stats yield nulls in all four —
    * [[prunedRead]] keeps those files. Footers are read on EXECUTORS
    * (one task per file batch); nothing data-sized moves anywhere.
    */
  /** Total row count from parquet FOOTERS alone — no data IO, no Spark
    * job: the O(files) census an auto dispatcher wants. Footers are read
    * on the driver (a directory is tens of files; each footer is a few
    * KB of metadata), so a regime pick costs milliseconds where a
    * `count()` would re-scan the fact per invocation. */
  def footerRowCount(spark: SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    // RECURSIVE listing: partitioned layouts (dir/part=x/part-*.parquet)
    // keep every data file one level down — a top-level-only walk would
    // return a silently wrong count for them. Hidden paths ('_'/'.'
    // prefixed: _temporary, _SUCCESS, .crc) are skipped to match Spark's
    // hiddenFileFilter — a leftover failed-write directory must not
    // inflate the census relative to what spark.read.parquet(dir) sees.
    def hidden(name: String): Boolean =
      name.startsWith("_") || name.startsWith(".")
    def walk(p: Path): Seq[Path] = fs.listStatus(p).toSeq.flatMap { st =>
      if (hidden(st.getPath.getName)) Seq.empty
      else if (st.isDirectory) walk(st.getPath)
      else if (st.getPath.getName.endsWith(".parquet")) Seq(st.getPath)
      else Seq.empty
    }
    val files = walk(new Path(dir))
    require(files.nonEmpty, s"footerRowCount: no parquet files under $dir")
    files.map { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        var n = 0L
        val it = reader.getFooter.getBlocks.iterator()
        while (it.hasNext) n += it.next().getRowCount
        n
      } finally reader.close()
    }.sum
  }

  def collectFileStats(spark: SparkSession, dir: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "collectFileStats: need at least one column")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(dir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted.toSeq
    require(files.nonEmpty, s"collectFileStats: no parquet files under $dir")
    collectFileStatsForFiles(spark, files, cols)
  }

  /** Executor-side footer walk for one batch of file paths. */
  private def statsForPaths(paths: Iterator[String], sc: SerializableConf,
      wanted: Set[String]): Iterator[(String, String, Long, Long,
      Option[Double], Option[Double], Option[String], Option[String])] = {
    val conf = sc.conf
    paths.flatMap { p =>
          val reader = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(p), conf))
          try {
            val blocks = reader.getFooter.getBlocks
            val nRows = {
              var n = 0L; val it = blocks.iterator()
              while (it.hasNext) n += it.next().getRowCount
              n
            }
            // per requested column: fold chunk stats across row groups
            wanted.toSeq.sorted.map { c =>
              var nulls = 0L
              var haveAll = true
              var minN = Double.PositiveInfinity; var maxN = Double.NegativeInfinity
              var minS: String = null; var maxS: String = null
              var isNum = false; var isStr = false
              val bit = blocks.iterator()
              while (bit.hasNext) {
                val block = bit.next()
                val cit = block.getColumns.iterator()
                while (cit.hasNext) {
                  val chunk = cit.next()
                  if (chunk.getPath.toDotString == c) {
                    val st = chunk.getStatistics
                    if (st == null || st.isEmpty) haveAll = false
                    else {
                      nulls += st.getNumNulls
                      if (st.hasNonNullValue) {
                        chunk.getPrimitiveType.getPrimitiveTypeName match {
                          case PrimitiveTypeName.INT64 | PrimitiveTypeName.INT32 |
                               PrimitiveTypeName.FLOAT | PrimitiveTypeName.DOUBLE =>
                            isNum = true
                            val lo = (st.genericGetMin: Any) match {
                              case n: Number => n.doubleValue()
                            }
                            val hi = (st.genericGetMax: Any) match {
                              case n: Number => n.doubleValue()
                            }
                            if (lo < minN) minN = lo
                            if (hi > maxN) maxN = hi
                          case PrimitiveTypeName.BINARY =>
                            isStr = true
                            val lo = (st.genericGetMin: Any) match {
                              case b: Binary => b.toStringUsingUTF8
                            }
                            val hi = (st.genericGetMax: Any) match {
                              case b: Binary => b.toStringUsingUTF8
                            }
                            if (minS == null || lo < minS) minS = lo
                            if (maxS == null || hi > maxS) maxS = hi
                          case _ => haveAll = false // INT96 etc: no prune basis
                        }
                      }
                      // all-null chunk: stats valid, no min/max contribution
                    }
                  }
                }
              }
              (p, c, nRows, nulls,
                if (haveAll && isNum) Some(minN) else None,
                if (haveAll && isNum) Some(maxN) else None,
                if (haveAll && isStr) Option(minS) else None,
                if (haveAll && isStr) Option(maxS) else None)
            }.iterator
          } finally reader.close()
        }
  }

  /** Incremental stats maintenance: footer stats for files under `dir`
    * that have no row in `existing` yet, unioned with `existing` — the
    * O(new files) daily-ingest refresh (same shape as the LSH index
    * append: never re-reads footers already indexed). Files deleted from
    * disk but still present in `existing` are dropped from the result,
    * so the stats table never claims files a scan would fail to open.
    * `appendFileStats(dir, cols, empty)` ≡ `collectFileStats` row-for-row
    * (MaintenanceSpec). */
  def appendFileStats(spark: SparkSession, dir: String, cols: Seq[String],
      existing: DataFrame): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val onDisk = fs.listStatus(new Path(dir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSet
    val known = existing.select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet
    val fresh = (onDisk -- known).toSeq.sorted
    val kept = existing.filter(col("file").isin(onDisk.toSeq: _*))
    val out =
      if (fresh.isEmpty) kept
      else kept.unionByName(collectFileStatsForFiles(spark, fresh, cols))
    // a stats TABLE must outlive its source files: materialize eagerly
    // (file-count-sized, tiny) so later evaluations never re-open footers
    // of files that have since been deleted or rewritten
    out.localCheckpoint(true)
  }

  /** Footer-stats core over an explicit file list (shared by
    * [[collectFileStats]] and [[appendFileStats]]). */
  private def collectFileStatsForFiles(spark: SparkSession,
      files: Seq[String], cols: Seq[String]): DataFrame = {
    require(files.nonEmpty && cols.nonEmpty)
    import spark.implicits._
    val sc = new SerializableConf(spark.sparkContext.hadoopConfiguration)
    val wanted = cols.toSet
    spark.createDataset(files)
      .repartition(math.min(files.size, 64))
      .mapPartitions(paths => statsForPaths(paths, sc, wanted))
      .toDF("file", "col", "n_rows", "null_count",
        "min_num", "max_num", "min_str", "max_str")
  }

  /** ONE collect of `column`'s (file, min, max) stats rows — shared by
    * [[pruneFilesNum]] and [[prunedFileSelection]] so the prune rule
    * exists exactly once and the stats plan is evaluated exactly once
    * per read. */
  private def columnStats(stats: DataFrame, column: String)
      : Array[(String, Option[Double], Option[Double])] =
    stats.filter(col("col") === column)
      .select(col("file"), col("min_num"), col("max_num"))
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))

  /** THE prune rule: can this stats row's file contain a value in
    * [lo, hi]? Conservative — missing/partial stats admit the file. */
  private def admitsRange(minNum: Option[Double], maxNum: Option[Double],
      lo: Double, hi: Double): Boolean =
    minNum.isEmpty || maxNum.isEmpty || (minNum.get <= hi && maxNum.get >= lo)

  /** Files whose stats CANNOT rule out a row with `column` in [lo, hi].
    * Conservative: files with missing/partial stats are kept. */
  def pruneFilesNum(stats: DataFrame, column: String,
      lo: Double, hi: Double): Seq[String] = {
    require(lo <= hi, s"empty range [$lo, $hi]")
    columnStats(stats, column)
      .filter { case (_, mn, mx) => admitsRange(mn, mx, lo, hi) }
      .map(_._1).distinct.sorted.toSeq
  }

  /** File selection for a metadata-pruned scan of `dir`, guarded
    * against a stats table that does not cover the directory:
    *  - files on disk with NO stats row (written after the last
    *    [[appendFileStats]] run) are always kept — a stale stats table
    *    degrades to a slower scan, never a wrong one;
    *  - if the stats table has no row at all for `column`, there is no
    *    prune basis and EVERY file is kept (same contract).
    * Returns (files to open, total parquet files on disk) so callers
    * can report the skipping ratio. */
  def prunedFileSelection(spark: SparkSession, dir: String, stats: DataFrame,
      column: String, lo: Double, hi: Double): (Seq[String], Int) = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.listStatus(new Path(dir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSet
    // coverage must be judged per COLUMN: a file whose stats rows cover
    // only OTHER columns has no prune basis for this one and must be
    // kept (a mixed-column stats table would otherwise silently drop
    // it). An empty covered set then also handles the
    // column-never-collected case: everything is kept.
    // ONE collect of this column's (file, min, max) rows serves both the
    // covered set and the keep decision — evaluating the stats plan
    // twice doubled the planning cost of every pruned scan (two Spark
    // jobs per read when stats come from appendFileStats unions). The
    // keep decision is the SAME admitsRange rule pruneFilesNum applies.
    require(lo <= hi, s"empty range [$lo, $hi]")
    val rows = columnStats(stats, column)
    val covered = rows.map(_._1).toSet
    val keep = rows.filter { case (_, mn, mx) => admitsRange(mn, mx, lo, hi) }
      .map(_._1).toSet
    val chosen = onDisk.filter(f => !covered.contains(f) || keep.contains(f))
    (chosen.toSeq.sorted, onDisk.size)
  }

  /** Metadata-pruned scan: open only files whose stats cannot rule out
    * `column ∈ [lo, hi]` (per [[prunedFileSelection]] — unknown files
    * conservatively kept), then re-apply the exact predicate (pruning is
    * performance; the filter is correctness). Returns an empty frame
    * with the stats-known schema if every file was provably pruned. */
  def prunedRead(spark: SparkSession, dir: String, stats: DataFrame,
      column: String, lo: Double, hi: Double): DataFrame = {
    val (chosen, _) = prunedFileSelection(spark, dir, stats, column, lo, hi)
    if (chosen.isEmpty) spark.read.parquet(dir).filter(lit(false))
    else spark.read.parquet(chosen: _*)
      .filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }
}
