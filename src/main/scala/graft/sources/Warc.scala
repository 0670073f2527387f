package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** WARC (Web ARChive) record source — capability parity with the
  * reference's CommonCrawl connector
  * (/root/reference/amadeus-commoncrawl/src/lib.rs:50-131; nom parser
  * src/parser.rs), which yields `Webpage { url, content }` records.
  *
  * Spark-first design: `binaryFile` hands each WARC file to one task
  * (CommonCrawl `.warc.gz` is non-splittable anyway — per-record gzip
  * members), and a length-delimited byte parser walks the records using
  * each header's `Content-Length` to slice the body EXACTLY — a body that
  * itself contains the `WARC/1.0\r\n` marker cannot mis-split a record,
  * matching the reference's length-delimited nom parser. Gzip input
  * (single- or multi-member, the CommonCrawl layout) is detected by magic
  * bytes and inflated in the task. The reference's HTTP-resumable fetch of
  * crawl segments is out of scope in a zero-egress container; pointing
  * this at `s3a://commoncrawl/...` paths is the production path.
  */
object Warc {

  final case class WarcRecord(
      warc_type: String, url: String, content_length: Option[Long],
      content: String)

  private val Marker = "WARC/1.0\r\n".getBytes("US-ASCII")
  private val HdrEnd = "\r\n\r\n".getBytes("US-ASCII")

  /** Parse WARC files into (warc_type, url, content_length, content). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(bytes => parseRecords(gunzipIfNeeded(bytes)))
      .filter(_.warc_type.nonEmpty)
      .toDF()
  }

  /** Webpage shape of the reference (amadeus-types http.rs:25-40):
    * response records only, (url, content). */
  def webpages(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .filter(col("warc_type") === "response")
      .select(col("url"), col("content"))

  /** Length-delimited record walk. `Content-Length` (bytes) slices each
    * body exactly; records lacking it fall back to next-marker splitting
    * with the inter-record CRLFCRLF trimmed. Headers are ISO-8859-1 per
    * the WARC spec; bodies decode as UTF-8 (lossy on binary payloads). */
  def parseRecords(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = indexOf(bytes, Marker, 0)
    while (pos >= 0) {
      val hdrStart = pos + Marker.length
      val hdrEnd = indexOf(bytes, HdrEnd, hdrStart)
      if (hdrEnd < 0) pos = -1
      else {
        val headers = new String(bytes, hdrStart, hdrEnd - hdrStart, "ISO-8859-1")
        val bodyStart = hdrEnd + HdrEnd.length
        val cl = hdr(headers, "Content-Length").flatMap(_.toLongOption)
        cl match {
          case Some(n) =>
            val end = math.min(bodyStart + n, bytes.length.toLong).toInt
            out += record(headers, cl, new String(bytes, bodyStart, end - bodyStart, "UTF-8"))
            pos = indexOf(bytes, Marker, end)
          case None =>
            val next = indexOf(bytes, Marker, bodyStart)
            val end = if (next < 0) bytes.length else next
            val body = new String(bytes, bodyStart, end - bodyStart, "UTF-8")
            out += record(headers, None, body.replaceAll("[\r\n]+$", ""))
            pos = next
        }
      }
    }
    out.toSeq
  }

  private def record(headers: String, cl: Option[Long], body: String) =
    WarcRecord(
      hdr(headers, "WARC-Type").getOrElse(""),
      hdr(headers, "WARC-Target-URI").getOrElse(""),
      cl, body)

  private def hdr(headers: String, name: String): Option[String] =
    s"(?im)^$name:\\s*(.+?)\\s*$$".r.findFirstMatchIn(headers).map(_.group(1))

  /** CommonCrawl `.warc.gz` is a sequence of gzip members (one per
    * record); GZIPInputStream consumes concatenated members natively. */
  def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try in.readAllBytes() finally in.close()
    } else bytes

  /** Byte-array Knuth-style scan (no JDK helper for this). */
  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Test/demo fixture: serialize (url, content) rows into WARC format. */
  def toWarcString(records: Seq[(String, String)]): String =
    records.map { case (url, content) =>
      s"WARC/1.0\r\n" +
        s"WARC-Type: response\r\n" +
        s"WARC-Target-URI: $url\r\n" +
        s"Content-Length: ${content.getBytes("UTF-8").length}\r\n" +
        s"\r\n$content\r\n\r\n"
    }.mkString
}
