package graft

import graft.functions.{NetFunctions, TimeFunctions}
import graft.sources.{Cloudfront, Jdbc, SchemaMapper, Warc}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Connector + scalar-function behavior: golden-count parses in the style
  * of the reference's connector tests (SURVEY.md §5.1). */
class SourceSpec extends AnyFunSuite with CacheHygiene {

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  import spark.implicits._

  test("cloudfront: parses fields, '-' -> null, %-decode, comment skip") {
    val dir = "target/qtmp/test_cf"
    val lines = Seq(
      "#Version: 1.0",
      "#Fields: date time x-edge-location ...",
      "2019-12-04\t21:02:31\tLAX1\t392\t192.0.2.100\tGET\td111.cf.net\t/index.html\t200\t-\t" +
        "Mozilla%2F5.0%20(Windows)\tq=1\t-\tHit\treqid1\thost1\thttps\t23\t0.001\t-\tTLSv1.2\tECDHE-RSA\tHit",
      "2019-12-04\t21:02:32\tLAX1\t0\t198.51.100.9\tHEAD\td111.cf.net\t/x.gif\t000\t-\t-\t-\t-\t" +
        "Error\treqid2\thost1\thttp\t10\t0.5\t-\t-\t-\tError")
    spark.createDataset(lines).coalesce(1).write.mode("overwrite").text(dir)
    val rows = Cloudfront.read(spark, dir).orderBy("request_id").collect()
    assert(rows.length == 2)
    val r1 = rows(0)
    assert(r1.getAs[String]("edge_location") == "LAX1")
    assert(r1.getAs[Long]("response_bytes") == 392L)
    assert(r1.getAs[Int]("status") == 200)
    assert(r1.getAs[String]("user_agent") == "Mozilla/5.0 (Windows)") // %-decoded
    assert(r1.getAs[String]("referer") == null)                        // '-' -> null
    assert(r1.getAs[Double]("time_taken") == 0.001)
    assert(r1.getAs[java.sql.Timestamp]("time").toString.startsWith("2019-12-04 21:02:31"))
    val r2 = rows(1)
    assert(r2.isNullAt(r2.fieldIndex("status")), "000 status must be null") // like reference Option<u16>
    assert(r2.getAs[String]("ssl_protocol") == null)
  }

  test("warc: record split + header extract + webpage filter") {
    val dir = "target/qtmp/test_warc"
    val warc = Warc.toWarcString(Seq(
      ("https://a.example/1", "hello world content"),
      ("https://b.example/2", "second page\nwith newline"))) +
      // a non-response record that webpages() must drop
      "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\ninfo\r\n\r\n"
    spark.createDataset(Seq(warc)).coalesce(1).write.mode("overwrite").text(dir)
    val all = Warc.read(spark, dir).collect()
    assert(all.length == 3)
    val pages = Warc.webpages(spark, dir).orderBy("url").collect()
    assert(pages.length == 2)
    assert(pages(0).getString(0) == "https://a.example/1")
    assert(pages(0).getString(1) == "hello world content")
    assert(pages(1).getString(1).contains("with newline"))
  }

  test("warc: length-delimited parse survives a body containing the marker") {
    // the failure mode of marker-splitting parsers: an HTTP payload that
    // embeds the record separator. Content-Length slicing must keep the
    // record whole and byte-exact (incl. gzip and multibyte content).
    val evil = "prefix WARC/1.0\r\n fake-header: x\r\n\r\n suffix — ü文"
    val warc = Warc.toWarcString(Seq(
      ("https://a.example/evil", evil),
      ("https://a.example/after", "still parsed")))
    val parsed = Warc.parseRecords(warc.getBytes("UTF-8"))
    assert(parsed.length == 2, s"record mis-split: ${parsed.map(_.url)}")
    assert(parsed(0).content == evil)
    assert(parsed(1).content == "still parsed")
    // gzip path: concatenated members, as CommonCrawl lays records out
    val bos = new java.io.ByteArrayOutputStream()
    Seq(Warc.toWarcString(Seq(("https://g.example/1", evil))),
        Warc.toWarcString(Seq(("https://g.example/2", "two")))).foreach { s =>
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(s.getBytes("UTF-8")); gz.finish()
    }
    val viaGz = Warc.parseRecords(Warc.gunzipIfNeeded(bos.toByteArray))
    assert(viaGz.map(_.content) == Seq(evil, "two"))
  }

  test("jdbc: Table/Query forms wire through to the JDBC source") {
    // no DB in this container: reaching the driver-resolution error proves
    // the option plumbing; the rest is a Spark built-in
    val e = intercept[Exception] {
      Jdbc.read(spark, "jdbc:postgresql://nohost:5/db", Jdbc.Table("t"))
    }
    val msg = String.valueOf(e.getMessage) + String.valueOf(e.getCause)
    assert(msg.contains("driver") || msg.contains("Driver") || msg.contains("connect"),
      s"unexpected failure: $msg")
  }

  test("jdbc: LIVE partitioned parallel read against embedded Derby") {
    // the one Jdbc feature s07 doesn't cover: split reads via
    // (partitionColumn, lower, upper, numPartitions) — mandatory at scale
    val url = "jdbc:derby:target/qtmp/derby_part_test;create=true"
    val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
    val data = (0L until 200L).map(i => (i, s"name_$i", i * 1.5))
    Jdbc.write(data.toDF("id", "name", "score"), url, "part_read_t",
      mode = "overwrite", props = props)
    val part = Jdbc.read(spark, url, Jdbc.Table("part_read_t"), props,
      partitioning = Some(Jdbc.Partitioning("id", 0L, 200L, 4)))
    assert(part.rdd.getNumPartitions == 4, "partitioned read did not split")
    val got = part.select(col("id"), col("name"), col("score"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(got == data, "partitioned read lost or duplicated rows")
  }

  test("malformed CSV: FAILFAST throws on the first bad row (Result unwrap)") {
    // the third parser mode of the s11 gate — ≅ the reference's
    // .unwrap() on a Result row; PERMISSIVE/DROPMALFORMED are gate-hashed
    val dir = "target/qtmp/failfast_csv"
    Seq(("1", "10.5"), ("2", "corrupt"), ("3", "30.0"))
      .toDF("k", "v").write.mode("overwrite").csv(dir)
    val e = intercept[Exception] {
      spark.read.schema("k LONG, v DOUBLE")
        .option("mode", "FAILFAST").csv(dir).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.getMessage != null &&
      (c.getMessage.contains("Malformed") || c.getMessage.contains("FAILFAST"))),
      s"expected a malformed-record failure, got: $e")
    // and the same data under DROPMALFORMED keeps exactly the good rows
    val kept = spark.read.schema("k LONG, v DOUBLE")
      .option("mode", "DROPMALFORMED").csv(dir)
      .as[(Long, Double)].collect().toSet
    assert(kept == Set((1L, 10.5), (3L, 30.0)))
  }

  test("schema mapper: unsigned widening + round-trip naming") {
    assert(SchemaMapper.toSpark("u64") == DecimalType(20, 0))
    assert(SchemaMapper.toSpark("u32") == LongType)
    assert(SchemaMapper.toSpark("u8") == ShortType)
    assert(SchemaMapper.fromSpark(DecimalType(20, 0)) == "u64")
    assert(SchemaMapper.fromSpark(SchemaMapper.group(
      "a" -> LongType, "b" -> ArrayType(StringType, containsNull = false)))
      == "group<a:i64,b:list<string>>")
    // u64 max round-trips through Decimal(20,0)
    val big = BigDecimal("18446744073709551615")
    val df = Seq(big).toDF("v").select(col("v").cast(DecimalType(20, 0)).as("v"))
    assert(df.head().getDecimal(0).toString == "18446744073709551615")
  }

  test("time functions: truncate_minutes and parts match JVM truth") {
    val ts = java.sql.Timestamp.valueOf("2024-03-05 14:37:44")
    val df = Seq(ts).toDF("ts")
    val got = df.select(
      TimeFunctions.truncateMinutes(col("ts"), 15).as("t15"),
      TimeFunctions.yearOf(col("ts")), TimeFunctions.monthOf(col("ts")),
      TimeFunctions.dayOf(col("ts")), TimeFunctions.hourOf(col("ts")),
      TimeFunctions.minuteOf(col("ts")), TimeFunctions.secondOf(col("ts"))).head()
    assert(got.getTimestamp(0) == java.sql.Timestamp.valueOf("2024-03-05 14:30:00"))
    assert((1 to 6).map(got.getInt) == Seq(2024, 3, 5, 14, 37, 44))
  }

  test("net functions: url parts and IP validation") {
    val df = Seq(
      ("https://sub.example.com/a/b?x=1&y=2", "10.0.0.1"),
      ("not a url", "999.1.1.1"),
      ("ftp://files.example.org/pub", "::1")).toDF("url", "ip")
    val got = df.select(
      NetFunctions.urlHost(col("url")).as("host"),
      NetFunctions.isValidUrl(col("url")).as("vu"),
      NetFunctions.isIpAddr(col("ip")).as("vip"),
      NetFunctions.ipv4ToLong(col("ip")).as("ipl")).collect()
    assert(got(0).getString(0) == "sub.example.com" && got(0).getBoolean(1))
    assert(got(0).getBoolean(2) && got(0).getLong(3) == 167772161L)
    assert(!got(1).getBoolean(1) && !got(1).getBoolean(2))
    assert(got(2).getString(0) == "files.example.org")
    assert(got(2).getBoolean(2)) // ::1 is valid ipv6
  }

  test("canonicalizeUrl: case, www, default ports, utm, param order, fragment, trailing slash") {
    val cases = Seq(
      // scheme+host lowered, www./:443 stripped, utm dropped, params sorted, #frag dropped
      ("HTTPS://WWW.Example.COM:443/Docs/1?utm_source=rss&b=2&a=1#frag",
        "https://example.com/Docs/1?a=1&b=2"),
      // http default port; trailing slash stripped
      ("http://example.com:80/path/", "http://example.com/path"),
      // NON-default port kept; :80 NOT stripped for https
      ("https://example.com:80/x", "https://example.com:80/x"),
      // no query, no path
      ("https://Example.com", "https://example.com"),
      // only utm params -> no query at all
      ("https://example.com/a?utm_source=x&utm_medium=y", "https://example.com/a"),
      // malformed -> null
      ("not a url", null),
      ("", null))
    val got = cases.map(_._1).toDF("url")
      .select(NetFunctions.canonicalizeUrl(col("url"))).collect().map(_.getString(0))
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"canonicalizeUrl($in) = $g, want $want")
    }
    // host of the canonical form feeds blocklists/per-domain caps
    val h = Seq("HTTPS://WWW.Example.COM:443/x").toDF("url")
      .select(NetFunctions.canonicalHost(col("url"))).head().getString(0)
    assert(h == "example.com", s"canonicalHost = $h")
  }

  test("featureHash: range, determinism, spread; xxhash64 twin in range") {
    import graft.functions.TextFunctions.{featureHash, featureHash64}
    val df = (1 to 200).map(i => s"f$i").toDF("s")
    val b = df.select(featureHash(col("s"), 32).as("b"),
      featureHash64(col("s"), 32).as("b64"))
    val (lo, hi, lo64, hi64) = b.agg(min("b"), max("b"), min("b64"), max("b64"))
      .as[(Long, Long, Long, Long)].head()
    assert(lo >= 0 && hi < 32 && lo64 >= 0 && hi64 < 32)
    // deterministic: same inputs, same buckets across runs
    val one = df.select(featureHash(col("s"), 32)).as[Long].collect().toSeq
    val two = df.select(featureHash(col("s"), 32)).as[Long].collect().toSeq
    assert(one == two)
    // 200 features over 32 buckets: expect near-full occupancy
    assert(b.select("b").distinct().count() >= 28)
  }
}
