package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive) record source — capability parity with the
  * reference's CommonCrawl connector
  * (/root/reference/amadeus-commoncrawl/src/lib.rs:50-131; nom parser
  * src/parser.rs), which yields `Webpage { url, content }` records.
  *
  * Spark-first design: instead of a hand-rolled streaming parser, records
  * are split in parallel by `spark.read.text` with the WARC version
  * marker as the line separator — each task parses only its records
  * (narrow, no shuffle). Header extraction is native `regexp_extract`.
  * The reference's HTTP-resumable fetch of crawl segments is out of scope
  * in a zero-egress container; pointing this at `s3a://commoncrawl/...`
  * paths is the production path.
  */
object Warc {

  /** Parse WARC files into (warc_type, url, content_length, content). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val records = spark.read
      .option("lineSep", "WARC/1.0\r\n")
      .text(path)
      .filter(length(trim(col("value"))) > 0)
    // record = headers CRLFCRLF body
    val headers = regexp_extract(col("value"), "(?s)^(.*?)\r\n\r\n", 1)
    val body = regexp_extract(col("value"), "(?s)\r\n\r\n(.*)$", 1)
    records.select(
        regexp_extract(headers, "WARC-Type:\\s*(\\S+)", 1).as("warc_type"),
        regexp_extract(headers, "WARC-Target-URI:\\s*(\\S+)", 1).as("url"),
        regexp_extract(headers, "Content-Length:\\s*(\\d+)", 1)
          .cast("long").as("content_length"),
        rtrim(body, "\r\n").as("content"))
      .filter(col("warc_type") =!= "")
  }

  /** Webpage shape of the reference (amadeus-types http.rs:25-40):
    * response records only, (url, content). */
  def webpages(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(col("warc_type") === "response")
      .select(col("url"), col("content"))

  /** Test/demo fixture: serialize (url, content) rows into WARC format. */
  def toWarcString(records: Seq[(String, String)]): String =
    records.map { case (url, content) =>
      s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Target-URI: $url\r\n" +
        s"Content-Length: ${content.getBytes("UTF-8").length}\r\n" +
        s"\r\n$content\r\n\r\n"
    }.mkString

  private def rtrim(c: org.apache.spark.sql.Column, chars: String) =
    regexp_replace(c, s"[$chars]+$$", "")
}
