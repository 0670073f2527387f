package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish test tables (TESTDATA.md).
  *
  * One parquet file per table under the scale-factor directory. Reads are
  * plain `spark.read.parquet` so Catalyst keeps predicate pushdown, column
  * pruning and partition discovery on every downstream query.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Plain parquet read + timestamp normalization: generated data has
    * carried either TIMESTAMP(NANOS) (surfacing as LongType under
    * `nanosAsLong`, converted in [[events]]) or naive micros
    * (isAdjustedToUTC=false → TIMESTAMP_NTZ in Spark 4). Strict-TIMESTAMP
    * consumers (`unix_micros`, stream watermarks) reject NTZ, so cast any
    * NTZ column to TimestampType — the session is pinned to UTC, making
    * the cast wall-clock-preserving and oracle-identical. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("timestamp")))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark lacks; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as LongType
    * nanos — convert (integral div, no double precision loss) to micros
    * TimestampType so downstream time functions behave normally. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val df = load(s, d, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
