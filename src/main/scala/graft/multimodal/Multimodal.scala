package graft.multimodal

import graft.functions.Hashing
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, plus batched decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The decode step is STUBBED: this container has no codec libraries, so
  * `decodeStub` produces a deterministic fake feature vector keyed on the
  * bytes. Everything around it — schema, per-partition batching, the
  * operator signatures, partitioning behavior — is the real Spark plumbing
  * a production pipeline would keep while swapping the stub for an actual
  * codec (e.g. via JNI or a Pandas-UDF sidecar on PySpark clusters).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),    // image|audio|video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType))))))

  final val FeatureDim = 8

  /** STUB decoder — deterministic fake: a real implementation would parse
    * the container format and decode pixels/samples here. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    val base = Hashing.hashBytes(bytes, 0x6D6DL)
    var i = 0
    while (i < FeatureDim) {
      out(i) = ((Hashing.hashLong(base, i.toLong) >>> 40).toInt.toFloat / (1 << 24).toFloat)
      i += 1
    }
    out
  }

  /** STUB resize — a real impl would rescale pixels; the fake re-hashes
    * with the target dims so output depends on (bytes, w, h). */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val h0 = Hashing.hashBytes(bytes, w.toLong << 32 | h.toLong)
    val out = new Array[Byte](16)
    var i = 0
    while (i < 16) { out(i) = (Hashing.hashLong(h0, i.toLong) & 0xff).toByte; i += 1 }
    out
  }

  /** Deterministic frame sampling indices for video: every `stride`-th
    * frame capped at `maxFrames` — pure plan-side arithmetic. */
  def frameSampleIndices(nFrames: Int, stride: Int, maxFrames: Int): Seq[Int] =
    (0 until nFrames by stride).take(maxFrames)

  /** Batched feature extraction over the binary column: mapPartitions with
    * an explicit batch shape (grouped iterator) — the JVM analog of
    * mapInPandas batches, so a codec that amortizes per-batch setup slots
    * in without plan changes. Narrow op: no shuffle, preserves
    * partitioning. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val idIdx = media.schema.fieldIndex("media_id")
    val kindIdx = media.schema.fieldIndex("kind")
    val bytesIdx = media.schema.fieldIndex("bytes")
    val rdd = media.rdd.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch: real codecs initialize once per batch here
        batch.iterator.map { r =>
          val feats = decodeStub(r.getAs[Array[Byte]](bytesIdx))
          Row(r.getLong(idIdx), r.getString(kindIdx), feats.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Build a media table from a text corpus (test harness: bytes = utf-8
    * text, metadata derived deterministically). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        (pmod(col("doc_id"), lit(640)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 16).cast("int").as("height"),
        lit(16000).cast("int").as("sample_rate"),
        (pmod(col("doc_id"), lit(300)) + 1).cast("int").as("n_frames")).as("meta"))
}
