package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CloudFront access-log source — capability parity with the reference's
  * `Cloudfront` connector (/root/reference/amadeus-aws/src/cloudfront.rs:
  * 23-141; row type :144-168; field parse :177-260).
  *
  * Format (public AWS docs): W3C-style TSV, `#`-prefixed header comments,
  *
  * Spark-first design: `spark.read.text` streams and splits the (possibly
  * .gz) files in parallel; the 22-field split is a single projection of
  * native column expressions — no UDF, fully codegen'd, filters on the
  * produced columns still prune row groups of downstream parquet
  * materializations. S3 hosting ≅ `s3a://` paths (free via Hadoop FS).
  */
object Cloudfront {

  /** the reference's CloudfrontRow columns (cloudfront.rs:144-168) */
  val columns: Seq[(String, DataType)] = Seq(
    "time" -> TimestampType,          // date + time
    "edge_location" -> StringType,
    "response_bytes" -> LongType,     // u64 → widened, see SchemaMapper
    "remote_ip" -> StringType,
    "method" -> StringType,
    "host" -> StringType,
    "url" -> StringType,              // cs-uri-stem
    "status" -> IntegerType,          // Option<u16>
    "referer" -> StringType,
    "user_agent" -> StringType,
    "query_string" -> StringType,
    "cookie" -> StringType,
    "result_type" -> StringType,
    "request_id" -> StringType,
    "host_header" -> StringType,
    "protocol" -> StringType,
    "request_bytes" -> LongType,
    "time_taken" -> DoubleType,
    "forwarded_for" -> StringType,
    "ssl_protocol" -> StringType,
    "ssl_cipher" -> StringType,
    "response_result_type" -> StringType)

  /** Read raw logs (dir or glob; .gz transparent) into the typed frame.
    * `-` sentinel → null, URL-encoded fields decoded (reference decodes
    * user_agent/cookie %-escapes). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path)
      .filter(!col("value").startsWith("#"))         // skip comment headers
    val f = split(col("value"), "\t")
    def s(i: Int) = { val c = f.getItem(i); when(c === "-", null).otherwise(c) }
    raw.select(
      to_timestamp(concat_ws(" ", f.getItem(0), f.getItem(1)),
        "yyyy-MM-dd HH:mm:ss").as("time"),
      s(2).as("edge_location"),
      s(3).cast(LongType).as("response_bytes"),
      s(4).as("remote_ip"),
      s(5).as("method"),
      s(6).as("host"),
      s(7).as("url"),
      when(f.getItem(8) === "000", null).otherwise(f.getItem(8).cast(IntegerType)).as("status"),
      s(9).as("referer"),
      url_decode_safe(s(10)).as("user_agent"),
      s(11).as("query_string"),
      url_decode_safe(s(12)).as("cookie"),
      s(13).as("result_type"),
      s(14).as("request_id"),
      s(15).as("host_header"),
      s(16).as("protocol"),
      s(17).cast(LongType).as("request_bytes"),
      s(18).cast(DoubleType).as("time_taken"),
      s(19).as("forwarded_for"),
      s(20).as("ssl_protocol"),
      s(21).as("ssl_cipher"),
      s(22).as("response_result_type"))
  }

  /** url_decode throws on malformed input pre-4.0; try_url_decode keeps
    * the pipeline total like the reference's lossy decode. */
  private def url_decode_safe(c: org.apache.spark.sql.Column) =
    coalesce(try_url_decode(c), c)
}
