package graft.operators

import graft.Tables
import graft.functions.{NetFunctions, TimeFunctions}
import graft.sources.{Cloudfront, Warc}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/connector + scalar-function coverage (SURVEY.md §2.1, §2.4):
  * CSV/JSON round-trips (read AND write — writers exceed the reference,
  * whose Destination trait is unimplemented), partitioned-directory
  * discovery, CloudFront log parsing, WARC splitting, JSON passthrough
  * extraction, time and URL scalar functions.
  *
  * Round-trip queries write deterministic derived data under target/ and
  * read it back, so the oracle can verify against the original parquet.
  */
object SourceQueries {

  type Q = (SparkSession, String) => DataFrame

  private def tmp(sfDir: String, name: String): String =
    s"target/qtmp/${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}/$name"

  val queries: Map[String, Q] = Map(
    // -- CSV source+sink round-trip (amadeus-serde csv.rs; headerless,
    //    schema-first like the reference) --------------------------------
    "s01_csv_roundtrip" -> ((s, d) => {
      val dir = tmp(d, "csv")
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_returnflag"))
        .write.mode("overwrite").csv(dir)
      s.read.schema("l_orderkey LONG, l_partkey LONG, l_quantity DOUBLE, l_returnflag STRING")
        .csv(dir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // -- newline-JSON source+sink round-trip (amadeus-serde json.rs) -----
    "s02_json_roundtrip" -> ((s, d) => {
      val dir = tmp(d, "json")
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
        .write.mode("overwrite").json(dir)
      s.read.schema("o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE, o_orderstatus STRING")
        .json(dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // -- partitioned directory discovery (ParquetDirectory; key=value
    //    dirs become partition columns, pruned on filter) ----------------
    "s03_partitioned_dir" -> ((s, d) => {
      val dir = tmp(d, "part_orders")
      Tables.orders(s, d).write.mode("overwrite")
        .partitionBy("o_orderstatus").parquet(dir)
      s.read.parquet(dir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy(col("o_orderstatus"))
    }),

    // -- CloudFront access logs (amadeus-aws cloudfront.rs) --------------
    "s04_cloudfront_logs" -> ((s, d) => {
      val dir = tmp(d, "cf_logs")
      // orderBy before limit: the fixture subset must be deterministic so
      // the DuckDB oracle can re-derive it from orders directly
      val lines = Tables.orders(s, d).orderBy("o_orderkey").limit(2000).collect().map { r =>
        val k = r.getLong(0)
        val ip = s"10.${k % 256}.${(k / 256) % 256}.${k % 100}"
        val st = Seq(200, 200, 200, 404, 304)((k % 5).toInt)
        s"2019-12-0${k % 9 + 1}\t0${k % 10}:00:0${k % 10}\tSFO5-C1\t${100 + k % 900}\t$ip\tGET\t" +
          s"d111.cf.net\t/obj/${k % 50}\t$st\t-\tMozilla%2F5.0\t-\t-\tHit\treq$k\thost.example\t" +
          s"https\t${50 + k % 50}\t0.0${k % 9 + 1}\t-\tTLSv1.2\tECDHE\tHit"
      }
      import s.implicits._
      s.createDataset(Seq("#Version: 1.0", "#Fields: date time ...") ++ lines)
        .coalesce(1).write.mode("overwrite").text(dir)
      Cloudfront.read(s, dir)
        .groupBy(col("status"), col("result_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("response_bytes")), 2).as("bytes"),
          round(avg(col("time_taken")), 4).as("avg_time"))
        .orderBy(col("status"), col("result_type"))
    }),

    // -- WARC / CommonCrawl webpages (amadeus-commoncrawl) ---------------
    "s05_warc_webpages" -> ((s, d) => {
      val dir = tmp(d, "warc")
      // orderBy before limit: deterministic subset, so the oracle can
      // re-derive the aggregate from documents directly
      val docs = Tables.documents(s, d).orderBy("doc_id").limit(200).collect()
      val warc = Warc.toWarcString(docs.map(r =>
        (s"https://example.com/doc/${r.getLong(0)}", r.getString(1))).toSeq)
      import s.implicits._
      s.createDataset(Seq(warc)).coalesce(1).write.mode("overwrite").text(dir)
      Warc.webpages(s, dir)
        .select(NetFunctions.urlHost(col("url")).as("host"),
          length(col("content")).as("len"))
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_pages"), sum(col("len")).as("total_chars"))
        .orderBy(col("host"))
    }),

    // -- s15: the reference user's END-TO-END crawl pipeline — WARC bytes
    // → Warc.webpages (the reference's CommonCrawl → Webpage records) →
    // htmlExtract main content. s05 proves the WARC parse round-trips;
    // this gate proves the EXTRACTION composes on top of it: the staged
    // pages carry t31's full HTML (nav/script/footer boilerplate), the
    // content must survive the WARC record framing byte-for-byte, and
    // the extracted text digests must match DuckDB replaying staging +
    // extraction straight from the documents table. ---------------------
    "s15_warc_html_pipeline" -> ((s, d) => {
      val dir = tmp(d, "warc_html")
      val docs = Tables.documents(s, d).orderBy("doc_id").limit(200)
        .select(col("doc_id"), PipelineQueries.stagedHtml.as("html")).collect()
      val warc = Warc.toWarcString(docs.map(r =>
        (s"https://example.com/doc/${r.getLong(0)}", r.getString(1))).toSeq)
      import s.implicits._
      s.createDataset(Seq(warc)).coalesce(1).write.mode("overwrite").text(dir)
      Warc.webpages(s, dir)
        .select(regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long")
            .as("doc_id"),
          graft.functions.TextFunctions.htmlExtract(col("content")).as("content"))
        .select(col("doc_id"),
          length(col("content")).cast("long").as("content_len"),
          md5(col("content")).as("content_digest"))
        .orderBy(col("doc_id"))
    }),

    // -- LIVE JDBC round-trip (Postgres-connector parity, exercised
    //    against a real database): Derby embedded ships in
    //    /opt/spark/jars, so this runs Jdbc.write -> CREATE TABLE +
    //    INSERTs -> Jdbc.read back through BOTH select forms (Table and
    //    Query — reference PostgresSelect::{Table,Query},
    //    amadeus-postgres/src/lib.rs:71-86). The oracle recomputes the
    //    same aggregate from the customer parquet, so a hash match proves
    //    the DB round-trip is lossless. ----------------------------------
    "s07_jdbc_roundtrip" -> ((s, d) => {
      val url = s"jdbc:derby:${tmp(d, "derbydb")};create=true"
      val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")
      graft.sources.Jdbc.write(
        Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")),
        url, "graft_customer", mode = "overwrite", props = props)
      val viaTable = graft.sources.Jdbc.read(s, url,
        graft.sources.Jdbc.Table("graft_customer"), props)
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      // Spark's Derby dialect quote-creates lowercase column names, so the
      // pushed-down query must quote them (Derby folds unquoted to upper)
      val viaQuery = graft.sources.Jdbc.read(s, url,
        graft.sources.Jdbc.Query(
          """SELECT "c_mktsegment", "c_acctbal" FROM graft_customer"""), props)
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("c_acctbal")), 2).as("sum_bal"))
      viaTable.join(viaQuery, Seq("c_mktsegment"))
        .orderBy(col("c_mktsegment"))
    }),

    // -- ORC source+sink round-trip: the second columnar format Spark
    //    ships natively (predicate pushdown + column pruning like
    //    parquet). Write part as ORC, read it back, aggregate; the oracle
    //    recomputes from the original parquet, so a hash match proves the
    //    ORC write→read path is lossless. --------------------------------
    "s08_orc_roundtrip" -> ((s, d) => {
      val dir = tmp(d, "orc")
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_retailprice"))
        .write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("p_size")).as("sum_size"),
          round(sum(col("p_retailprice")), 2).as("sum_price"))
        .orderBy(col("p_brand"))
    }),

    // -- malformed-record handling: the Spark mirror of the reference's
    //    per-row Result<T, E> surface (every typed amadeus source yields
    //    Result<Row, Error> — consumers unwrap, drop, or inspect). A CSV
    //    is staged with a deterministically corrupted numeric field on
    //    every 7th order (o_orderkey % 7 == 0 → "corrupt"), then read
    //    back under the parser modes: PERMISSIVE keeps Err rows as
    //    nulls + _corrupt_record (≅ inspecting the Result), DROPMALFORMED
    //    silently drops them (≅ filter_map(Result::ok)); FAILFAST
    //    (≅ unwrap, throws on first Err) is spec-verified in SourceSpec
    //    since a gate can't hash an exception. The oracle replays all
    //    counts and the good-row cents sum from the clean table. ---------
    "s11_malformed_records" -> ((s, d) => {
      val dir = tmp(d, "badcsv")
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, lit("corrupt"))
            .otherwise(col("o_totalprice").cast("string")).as("o_totalprice"))
        .write.mode("overwrite").csv(dir)
      val perm = s.read
        .schema("o_orderkey LONG, o_totalprice DOUBLE, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(dir)
        .agg(count(lit(1)).as("n_total"),
          count(when(col("_corrupt_record").isNotNull, 1)).as("n_corrupt"),
          sum(when(col("_corrupt_record").isNull,
            round(col("o_totalprice") * 100).cast("long"))).as("good_cents"))
      // FOOTGUN, deliberately exercised: under DROPMALFORMED a count
      // that doesn't need the fallible column never parses it (CSV
      // column pruning), so nothing is dropped — a bare count(*), and
      // even a sum the optimizer later prunes away, both report all
      // 15000 rows "surviving" (measured). The drop only happens when
      // the conversion reaches the OUTPUT, so the gate emits the
      // dropped-side cents sum as a column — which must also equal the
      // PERMISSIVE side's good_cents, making the two modes' agreement
      // part of the hash.
      val dropped = s.read.schema("o_orderkey LONG, o_totalprice DOUBLE")
        .option("mode", "DROPMALFORMED").csv(dir)
        .agg(count(lit(1)).as("n_dropmalformed_rows"),
          sum(round(col("o_totalprice") * 100).cast("long"))
            .as("dropped_good_cents"))
      perm.crossJoin(dropped)
        .select(col("n_total"), col("n_corrupt"),
          col("n_dropmalformed_rows"), col("good_cents"),
          col("dropped_good_cents"))
    }),

    // -- parquet schema evolution: a 100 TB corpus is never written in
    //    one sitting — files accumulate across schema versions. Stage
    //    the first half of documents WITHOUT the n_chars column (v1) and
    //    the second half with it (v2), read the directory with
    //    mergeSchema: v1 rows surface n_chars as NULL, v2 rows keep
    //    theirs, nothing is dropped or coerced. The oracle replays the
    //    doc_id split from the clean table. Spark reconciles the union
    //    schema per file at scan time — no rewrite of the v1 files, the
    //    operational property that matters at corpus scale. -------------
    "s12_schema_evolution" -> ((s, d) => {
      val dir = tmp(d, "schema_evo")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      // parity split: exactly half the corpus lands in each schema
      // version at ANY scale factor (an absolute doc_id threshold would
      // silently degrade to a sliver of v1 files on bigger corpora)
      docs.filter(col("doc_id") % 2 === 0).drop("n_chars")
        .write.mode("overwrite").parquet(s"$dir/v1")
      docs.filter(col("doc_id") % 2 =!= 0)
        .write.mode("overwrite").parquet(s"$dir/v2")
      s.read.option("mergeSchema", "true").parquet(s"$dir/v1", s"$dir/v2")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          count(col("n_chars")).as("n_with_chars"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    }),

    // -- Hive-style partitioned WRITE + partition-pruned read: the layout
    //    every 100 TB corpus uses (partition by coarse key, prune at plan
    //    time). Write documents partitioned by lang, read back with a
    //    lang filter — the filter becomes a PartitionFilter (asserted in
    //    PlanSpec: only matching directories are LISTED, non-matching
    //    partitions are never opened), and the oracle recomputes from the
    //    original table so the hash proves the layout is lossless. -------
    // -- schema-evolving UNION: a v1 frame (no `source` column) unions a
    //    v2 frame via unionByName(allowMissingColumns) — missing columns
    //    null-fill; the in-memory face of s12's on-disk evolution -------
    "u09_union_evolution" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val v1 = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val v2 = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("source"))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("source").isNull.cast("long")).as("n_v1_rows"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    }),

    // -- line-oriented text source: one line per document written with
    //    the text sink, read back with spark.read.text — the raw-corpus
    //    ingestion format (reference LocalFile line shape) --------------
    "s15_text_roundtrip" -> ((s, d) => {
      val dir = tmp(d, "s15_text")
      Tables.documents(s, d).select(col("text"))
        .coalesce(2).write.mode("overwrite").text(dir)
      s.read.text(dir)
        .agg(count(lit(1)).as("n_lines"),
          sum(length(col("value"))).as("sum_chars"),
          sum(size(split(col("value"), " "))).as("sum_tokens"))
    }),

    // -- dynamic partition overwrite: rewriting ONE partition must leave
    //    every other partition untouched (partitionOverwriteMode=dynamic;
    //    static semantics would wipe the table down to 'en'). The final
    //    state — en rows shifted, others original — is fully replayed. --
    "u06_dynamic_overwrite" -> ((s, d) => {
      val dir = tmp(d, "u06_dyn")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      docs.write.mode("overwrite").partitionBy("lang").parquet(dir)
      docs.filter(col("lang") === "en")
        .withColumn("n_chars", col("n_chars") + 1000)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang").parquet(dir)
      s.read.parquet(dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    }),

    // -- query-attached metrics (Dataset.observe): pipeline counters
    //    collected DURING the pass, no second scan — the monitoring hook
    //    a production curation job exports; values replayed exactly -----
    "p18_observed_metrics" -> ((s, d) => {
      import s.implicits._
      val obs = org.apache.spark.sql.Observation()
      val kept = Tables.documents(s, d)
        .observe(obs, count(lit(1)).as("rows_in"),
          sum(col("n_chars")).as("chars_in"))
        .filter(col("n_chars") >= 300)
      val row = kept
        .agg(count(lit(1)).as("rows_kept"), sum(col("n_chars")).as("chars_kept"))
        .head()
      val m = obs.get
      Seq((m("rows_in").asInstanceOf[Long], m("chars_in").asInstanceOf[Long],
        row.getLong(0), row.getLong(1)))
        .toDF("rows_in", "chars_in", "rows_kept", "chars_kept")
    }),

    // -- compressed-codec round-trip: gzip JSON written and read back
    //    transparently (the Spark codec path the reference's flate2
    //    decompression maps to); oracle recomputes from the original ----
    "s14_gzip_roundtrip" -> ((s, d) => {
      val dir = tmp(d, "s14_gz")
      val cols = Seq("doc_id", "lang", "n_chars")
      Tables.documents(s, d).select(cols.map(col): _*)
        .coalesce(2).write.mode("overwrite")
        .option("compression", "gzip").json(dir)
      s.read.schema("doc_id BIGINT, lang STRING, n_chars BIGINT").json(dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("id_checksum"))
        .orderBy(col("lang"))
    }),

    // -- small-files compaction as a GATE: a 40-file fragmented table is
    //    rewritten into byte-sized outputs; content checksums must match
    //    the original table and the file count must actually shrink ------
    "z03_compaction" -> ((s, d) => {
      import graft.operators.Maintenance
      val frag = tmp(d, "z03_frag"); val comp = tmp(d, "z03_comp")
      Tables.documents(s, d).repartition(40)
        .write.mode("overwrite").parquet(frag)
      val stats = Maintenance.compactParquet(s, frag, comp)
      s.read.parquet(comp)
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_checksum"),
          sum(col("n_chars")).as("sum_chars"))
        .select(col("n_docs"), col("id_checksum"), col("sum_chars"),
          lit(stats.outputFiles < stats.inputFiles).as("files_reduced"))
    }),

    // -- binaryFile source: raw media files on disk read as (path,
    //    length, content) rows — the ingestion shape for image/audio
    //    corpora (one file per asset, id in the filename). Staged from
    //    the synthetic PPM generator, decoded with the REAL P6 decoder;
    //    the oracle replays header length + pixel stats closed-form.
    //    Driver-side staging is gate plumbing only: production points
    //    binaryFile at an object store and never collects. --------------
    "s13_binary_files" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val media = Multimodal.mediaFromDocuments(Tables.documents(s, d))
        .filter(col("kind") === "image")
      val dir = new java.io.File(tmp(d, "s13_files"))
      if (dir.exists()) dir.listFiles().foreach(_.delete())
      dir.mkdirs()
      media.select(col("media_id"), col("bytes")).collect().foreach { r =>
        java.nio.file.Files.write(
          new java.io.File(dir, f"img_${r.getLong(0)}%06d.ppm").toPath,
          r.getAs[Array[Byte]](1))
      }
      val bf = s.read.format("binaryFile").load(dir.getAbsolutePath)
        .select(
          regexp_extract(col("path"), "img_(\\d+)\\.ppm", 1).cast("long")
            .as("media_id"),
          lit("image").as("kind"), col("length"), col("content").as("bytes"))
      Multimodal.extractFeatures(bf.select("media_id", "kind", "bytes"))
        .join(bf.select("media_id", "length"), "media_id")
        .select(col("media_id"), col("length"),
          element_at(col("features"), 1).cast("long").as("w"),
          element_at(col("features"), 2).cast("long").as("h"),
          element_at(col("features"), 6).cast("long").as("sum_rgb"),
          element_at(col("features"), 7).cast("long").as("px_min"),
          element_at(col("features"), 8).cast("long").as("px_max"))
        .orderBy(col("media_id"))
    }),

    "s09_partitioned_write" -> ((s, d) => {
      val dir = tmp(d, "docs_by_lang")
      Tables.documents(s, d)
        .write.mode("overwrite").partitionBy("lang").parquet(dir)
      s.read.parquet(dir)
        .filter(col("lang").isin("en", "de"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    }),

    // -- object-store scheme round-trip: the s09 shape executed through
    //    the `s3m://` mock FileSystem (zero-egress stand-in for s3a) —
    //    scheme resolution, bucket-URI qualification, committer renames,
    //    key=value partition discovery and pruning all flow through the
    //    FileSystem seam exactly as against S3; only byte transport is
    //    local. Oracle recomputes from the ORIGINAL table, so the hash
    //    proves the through-scheme layout is lossless. ---------------------
    "s10_object_store_roundtrip" -> ((s, d) => {
      val hc = s.sparkContext.hadoopConfiguration
      hc.set("fs.s3m.impl", classOf[graft.sources.S3MockFileSystem].getName)
      hc.set("fs.s3m.impl.disable.cache", "true")
      val local = new java.io.File(tmp(d, "s3m_store")).getAbsolutePath
      val dir = s"s3m://gate-bucket$local"
      Tables.documents(s, d)
        .write.mode("overwrite").partitionBy("lang").parquet(dir)
      s.read.parquet(dir)
        .filter(col("lang").isin("en", "de")) // partition-pruning filter
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    }),

    // -- Z-order layout round-trip: rewrite lineitem clustered on the
    //    Morton curve of (l_partkey, l_suppkey), read it back, aggregate.
    //    The oracle recomputes from the ORIGINAL table, so a hash match
    //    proves the layout rewrite is lossless — the contract any
    //    OPTIMIZE-style operator must satisfy. Clustering QUALITY
    //    (per-file min/max narrowing on both columns) is asserted in
    //    MaintenanceSpec, not here. ---------------------------------------
    "z01_zorder_roundtrip" -> ((s, d) => {
      val dir = tmp(d, "zorder")
      Maintenance.zorderParquet(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity")),
        "l_partkey", "l_suppkey", dir, nFiles = 8)
      s.read.parquet(dir)
        .groupBy((col("l_partkey") % 10).as("pk_mod"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("pk_mod"))
    }),

    // -- z-order clustering CONTRACT, gate-enforced: after the rewrite,
    //    the mean per-file min/max span of BOTH clustered columns must be
    //    well under the column's full range — the measurable property
    //    that makes parquet stats prune filters on either column. Columns
    //    chosen independent (l_suppkey is derived from l_partkey in
    //    TPC-H, so that pair would confound the measurement). -------------
    "z02_zorder_contract" -> ((s, d) => {
      val dir = tmp(d, "zorder_c")
      Maintenance.zorderParquet(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", dir, nFiles = 16)
      val rng = Tables.lineitem(s, d).agg(
        (max("l_orderkey") - min("l_orderkey")).cast("double").as("ra"),
        (max("l_partkey") - min("l_partkey")).cast("double").as("rb")).head()
      s.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max("l_orderkey") - min("l_orderkey")).cast("double").as("sa"),
          (max("l_partkey") - min("l_partkey")).cast("double").as("sb"))
        .agg((avg(col("sa")) < rng.getDouble(0) * 0.7).as("orderkey_clustered"),
          (avg(col("sb")) < rng.getDouble(1) * 0.7).as("partkey_clustered"))
    }),

    // -- snapshot merge (upsert): updates win by key, unmatched base
    //    survives, new keys append — MERGE INTO materialized as a fresh
    //    snapshot; the oracle replays the anti-join + union in SQL. -------
    "u01_snapshot_merge" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val base = orders.filter(col("o_orderkey") % 3 =!= 0)
      val updates = orders.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      Maintenance.mergeSnapshot(base, updates, Seq("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // -- JSON passthrough type + extraction (Value::Json ≅ get_json) -----
    "s06_json_extract" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(avg(col("k")), 4).as("avg_k"))
        .orderBy(col("event_type"))),

    // -- time scalar functions (time.rs; truncate_minutes + parts) -------
    // -- MapType surface: build a map column, explode it, read through
    //    map_keys/element_at — the dynamic key-value shape (the
    //    reference's Value::Map); values derive from plain columns so
    //    the replay needs no map support on the oracle side -------------
    "f04_map_functions" -> ((s, d) => {
      val m = Tables.documents(s, d).select(col("doc_id"),
        map_from_arrays(
          array(lit("lang"), lit("src"), lit("len")),
          array(col("lang"), col("source"), col("n_chars").cast("string")))
          .as("meta"))
      m.select(col("doc_id"), size(map_keys(col("meta"))).as("n_keys"),
          explode(col("meta")).as(Seq("k", "v")))
        .filter(col("k") =!= "len")
        .groupBy(col("k"), col("v"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          min(col("n_keys")).as("n_keys"))
        .orderBy(col("k"), col("v"))
    }),

    // -- hashing-trick featurizer: lang/source tags bucketed into 32
    //    dims; per-bucket load + distinct-feature (collision) census.
    //    md5-derived buckets are a pure function of the feature, so any
    //    engine replays them; xxhash64 twin is spec-verified. ------------
    "f03_feature_hash" -> ((s, d) => {
      import graft.functions.TextFunctions.featureHash
      Tables.documents(s, d)
        .select(explode(array(
          concat(lit("lang="), col("lang")),
          concat(lit("src="), col("source")))).as("feat"))
        .select(col("feat"), featureHash(col("feat"), 32).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          count_distinct(col("feat")).as("n_features"))
        .orderBy(col("bucket"))
    }),

    "f01_time_parts" -> ((s, d) =>
      Tables.events(s, d)
        .select(TimeFunctions.truncateMinutes(col("ts"), 360).as("bucket6h"),
          TimeFunctions.hourOf(col("ts")).as("h"))
        .groupBy(col("bucket6h"))
        .agg(count(lit(1)).as("n"), min(col("h")).as("min_hour"), max(col("h")).as("max_hour"))
        .orderBy(col("bucket6h"))),

    // -- URL scalar functions (Url value type) ---------------------------
    "f02_url_functions" -> ((s, d) =>
      Tables.documents(s, d)
        .select(concat(lit("https://"), col("source"), lit(".example.com/docs/"),
          col("doc_id"), lit("?lang="), col("lang")).as("url"))
        .select(NetFunctions.urlHost(col("url")).as("host"),
          NetFunctions.urlQueryParam(col("url"), "lang").as("lang"),
          NetFunctions.isValidUrl(col("url")).cast("int").as("valid"))
        .groupBy(col("host"), col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("valid")).as("n_valid"))
        .orderBy(col("host"), col("lang")))
  )

  val oracles: Map[String, String] = Map(
    "s01_csv_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "s02_json_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice),2) AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "s03_partitioned_dir" ->
      """SELECT o_orderstatus, count(*) AS n, count(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // re-derives the WARC fixture aggregate from documents — verifying
    // render -> length-delimited parse -> url/content round-trip. All
    // fixture urls share one host; content survives byte-exact (the
    // parser slices by Content-Length), so char counts must agree.
    "s05_warc_webpages" ->
      """WITH d AS (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 200)
        |SELECT 'example.com' AS host, count(*) AS n_pages,
        | CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    // s15: t31's staging + extraction replay over the ordered 200-doc
    // subset the WARC was rendered from
    "s15_warc_html_pipeline" ->
      ("WITH base AS (SELECT doc_id, lang, text FROM documents ORDER BY doc_id LIMIT 200),\n" +
        PipelineQueries.stagedHtmlSqlCte("base") + ",\n" +
        PipelineQueries.htmlExtractSqlCtes + "\n" +
        """SELECT doc_id, CAST(length(content) AS BIGINT) AS content_len,
          | md5(content) AS content_digest
          |FROM ex ORDER BY doc_id""".stripMargin),
    // re-derives the log fixture's field formulas straight from orders —
    // verifying the whole parse path (fixture render -> TSV split ->
    // sentinel/cast -> aggregate) against an independent computation
    "s04_cloudfront_logs" ->
      """WITH k2 AS (SELECT o_orderkey AS k FROM orders ORDER BY o_orderkey LIMIT 2000),
        |d AS (SELECT k,
        |  CASE (k % 5) WHEN 3 THEN 404 WHEN 4 THEN 304 ELSE 200 END AS status,
        |  'Hit' AS result_type,
        |  100 + k % 900 AS response_bytes,
        |  ('0.0' || (k % 9 + 1))::DOUBLE AS time_taken
        | FROM k2)
        |SELECT status, result_type, count(*) AS n,
        | CAST(sum(response_bytes) AS BIGINT) AS bytes,
        | round(avg(time_taken), 4) AS avg_time
        |FROM d GROUP BY status, result_type ORDER BY status, result_type""".stripMargin,
    "s07_jdbc_roundtrip" ->
      """SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal),2) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "s08_orc_roundtrip" ->
      """SELECT p_brand, count(*) AS n, CAST(sum(p_size) AS BIGINT) AS sum_size,
        | round(sum(p_retailprice),2) AS sum_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "s12_schema_evolution" ->
      """SELECT lang, count(*) AS n_docs,
        | count(*) FILTER (WHERE doc_id % 2 <> 0) AS n_with_chars,
        | CAST(sum(CASE WHEN doc_id % 2 <> 0 THEN n_chars END) AS BIGINT)
        |   AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "s11_malformed_records" ->
      """SELECT count(*) AS n_total,
        | count(*) FILTER (WHERE o_orderkey % 7 = 0) AS n_corrupt,
        | count(*) FILTER (WHERE o_orderkey % 7 <> 0) AS n_dropmalformed_rows,
        | CAST(sum(CASE WHEN o_orderkey % 7 <> 0
        |   THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS BIGINT)
        |   AS good_cents,
        | CAST(sum(CASE WHEN o_orderkey % 7 <> 0
        |   THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS BIGINT)
        |   AS dropped_good_cents
        |FROM orders""".stripMargin,
    "u09_union_evolution" ->
      """SELECT lang, count(*) AS n,
        | CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_v1_rows,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "s15_text_roundtrip" ->
      """SELECT count(*) AS n_lines,
        | CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        | CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
        |FROM documents""".stripMargin,
    "u06_dynamic_overwrite" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(CASE WHEN lang = 'en' THEN n_chars + 1000
        |   ELSE n_chars END) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "p18_observed_metrics" ->
      """SELECT count(*) AS rows_in,
        | CAST(sum(n_chars) AS BIGINT) AS chars_in,
        | CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS rows_kept,
        | CAST(sum(CASE WHEN n_chars >= 300 THEN n_chars END) AS BIGINT)
        |   AS chars_kept
        |FROM documents""".stripMargin,
    "s14_gzip_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | CAST(sum(doc_id) AS BIGINT) AS id_checksum
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "z03_compaction" ->
      """SELECT count(*) AS n_docs,
        | CAST(sum(doc_id) AS BIGINT) AS id_checksum,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        | TRUE AS files_reduced
        |FROM documents""".stripMargin,
    // header "P6\n<w> <h>\n255\n" is 11 bytes at single-digit dims;
    // pixel byte i of image id is (id*31 + i) % 256
    "s13_binary_files" ->
      """WITH m AS (SELECT doc_id, (doc_id % 5) + 1 AS w, (doc_id % 4) + 2 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |px0 AS (SELECT doc_id, unnest(generate_series(0, w*h*3 - 1)) AS i
        |  FROM m),
        |px AS (SELECT doc_id, (doc_id*31 + i) % 256 AS v FROM px0)
        |SELECT m.doc_id AS media_id,
        | CAST(11 + m.w*m.h*3 AS BIGINT) AS length,
        | CAST(m.w AS BIGINT) AS w, CAST(m.h AS BIGINT) AS h,
        | CAST(sum(px.v) AS BIGINT) AS sum_rgb,
        | CAST(min(px.v) AS BIGINT) AS px_min,
        | CAST(max(px.v) AS BIGINT) AS px_max
        |FROM m JOIN px ON px.doc_id = m.doc_id
        |GROUP BY m.doc_id, m.w, m.h ORDER BY media_id""".stripMargin,
    "s09_partitioned_write" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang IN ('en','de')
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // s10 recomputes the s09 shape from the original table: a hash match
    // proves the s3m:// write+partitioned read round-trip is lossless
    "s10_object_store_roundtrip" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang IN ('en','de')
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // z01 aggregates the REWRITTEN table; recomputing from the original
    // lineitem proves the z-order rewrite lost/duplicated nothing
    "z01_zorder_roundtrip" ->
      """SELECT l_partkey % 10 AS pk_mod, count(*) AS n,
        | round(sum(l_quantity),2) AS sum_qty,
        | CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
        |FROM lineitem GROUP BY pk_mod ORDER BY pk_mod""".stripMargin,
    "z02_zorder_contract" ->
      "SELECT TRUE AS orderkey_clustered, TRUE AS partkey_clustered",
    "u01_snapshot_merge" ->
      """WITH base AS (SELECT * FROM orders WHERE o_orderkey % 3 != 0),
        |u AS (SELECT * REPLACE (o_totalprice * 2 AS o_totalprice)
        |      FROM orders WHERE o_orderkey % 2 = 0),
        |m AS (SELECT * FROM base
        |      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM u)
        |      UNION ALL SELECT * FROM u)
        |SELECT o_orderstatus, count(*) AS n,
        | round(sum(o_totalprice),2) AS sum_price
        |FROM m GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "s06_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | round(avg(CAST(props->>'$.k' AS INT)), 4) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "f04_map_functions" ->
      """WITH kv AS (
        |  SELECT doc_id, 'lang' AS k, lang AS v FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'src' AS k, source AS v FROM documents)
        |SELECT k, v, count(*) AS n, min(doc_id) AS min_id,
        |  CAST(3 AS INT) AS n_keys
        |FROM kv GROUP BY k, v ORDER BY k, v""".stripMargin,
    "f03_feature_hash" ->
      """WITH f AS (
        |  SELECT unnest(['lang=' || lang, 'src=' || source]) AS feat
        |  FROM documents),
        |b AS (SELECT feat,
        |    CAST(('0x' || substr(md5(feat || ':fh'), 1, 12)) AS BIGINT) % 32
        |      AS bucket
        |  FROM f)
        |SELECT bucket, count(*) AS n,
        |  count(DISTINCT feat) AS n_features
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "f01_time_parts" ->
      """SELECT to_timestamp(floor(epoch(ts)/21600)*21600)::TIMESTAMP AS bucket6h,
        | count(*) AS n, min(hour(ts)) AS min_hour, max(hour(ts)) AS max_hour
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "f02_url_functions" ->
      """SELECT source || '.example.com' AS host, lang,
        | count(*) AS n, count(*) AS n_valid
        |FROM documents GROUP BY 1, 2 ORDER BY host, lang""".stripMargin
  )
}
