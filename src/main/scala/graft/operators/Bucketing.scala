package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: co-located fact⋈fact joins with NO exchange.
  *
  * At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
  * sides. Writing both tables bucketed+sorted by the join key makes the
  * join a zero-shuffle sort-merge over matching buckets: each task reads
  * bucket i of both tables. The price is paid once at write time and
  * amortized over every subsequent join/aggregation on that key — the
  * right trade for repeatedly-joined curated tables (e.g. a training
  * corpus keyed by document id).
  *
  * BucketingSpec asserts the join plan contains no ShuffleExchange.
  */
object Bucketing {

  /** Write df as a bucketed+sorted managed table (session catalog). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a prior session's orphaned managed-table location (catalog entry
    // gone, directory left behind) blocks CREATE with
    // LOCATION_ALREADY_EXISTS — clear it before writing
    val loc = new org.apache.hadoop.fs.Path(spark.sessionState.catalog
      .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Append to an existing bucketed table with the SAME bucket spec —
    * new files land in the right buckets, so bucket pruning and
    * exchange-free joins keep working across appends (the incremental
    * ingest path for [[writeBucketed]] tables). */
  def appendBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit = {
    df.write.mode("append")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. When both are bucketed
    * into the same bucket count on the join key, Catalyst plans a
    * sort-merge join with NO Exchange on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
