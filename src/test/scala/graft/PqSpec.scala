package graft

import graft.ann.{Ann, Pq}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization behavior: codebook determinism, encode/decode
  * shape, reconstruction quality, and ADC recall vs brute force — the
  * spec twins of the a08 gate contract. */
class PqSpec extends AnyFunSuite with CacheHygiene {

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sfDir = "/root/testdata/sf0.01"
  // the a08 gate config: 64-dim fp32 (256 B) -> 8 byte codes = 32x
  val M = 8
  val K = 64

  lazy val emb = Tables.embeddings(spark, sfDir)
  lazy val cb = Pq.trainCodebooks(emb, "embedding", M, K)

  test("codebooks: deterministic under seed, right shape") {
    val cb2 = Pq.trainCodebooks(emb, "embedding", M, K)
    assert(cb.length == M && cb.forall(_.length == K))
    assert(cb.forall(_.forall(_.length == 64 / M)))
    assert(cb.map(_.map(_.toSeq).toSeq).toSeq == cb2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("encode: m codes, each in [0, k)") {
    val codes = emb.select(Pq.encode(col("embedding"), cb).as("c"))
      .select(size(col("c")).as("m"),
        array_min(col("c")).as("lo"), array_max(col("c")).as("hi"))
      .agg(min("m"), max("m"), min("lo"), max("hi")).head
    assert(codes.getInt(0) == M && codes.getInt(1) == M)
    assert(codes.getInt(2) >= 0 && codes.getInt(3) < K)
  }

  test("decode(encode): full-dim reconstruction, positive mean cosine") {
    val rc = emb.agg(avg(Ann.cosine(col("embedding"),
      Pq.decode(Pq.encode(col("embedding"), cb), cb))).as("rc")).head.getDouble(0)
    info(f"mean reconstruction cosine (m=$M k=$K): $rc%.4f")
    assert(rc >= 0.75, s"reconstruction cosine $rc below the a08 gate threshold")
  }

  test("adc recall@10 vs brute force") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"))
    val bf = pairs(Ann.bruteForceTopK(emb, "vec_id", "embedding", col("vec_id") < 5, 10))
    val adc = pairs(Pq.adcTopK(emb, "vec_id", "embedding", col("vec_id") < 5, cb, 10))
    val total = bf.count().toDouble
    val hit = bf.join(adc, Seq("query_id", "neighbor_id"), "left_semi").count()
    info(f"adc recall@10 (m=$M k=$K): ${hit / total}%.3f")
    assert(hit / total >= 0.4, s"recall ${hit / total} below the a08 gate threshold")
  }

  test("ivf-pq: recall@10 vs brute force, bounded candidate set") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id"))
    val bf = pairs(Ann.bruteForceTopK(emb, "vec_id", "embedding", col("vec_id") < 5, 10))
    val ivfpq = pairs(Pq.ivfPqTopK(emb, "vec_id", "embedding", col("vec_id") < 5, 10))
    val total = bf.count().toDouble
    val hit = bf.join(ivfpq, Seq("query_id", "neighbor_id"), "left_semi").count()
    info(f"ivf-pq recall@10 (nLists=16 nProbe=4 m=$M k=$K): ${hit / total}%.3f")
    assert(hit / total >= 0.2, s"recall ${hit / total} below the a09 gate threshold")
  }

  test("config sweep (diagnostic)") {
    for ((m, k) <- Seq((8, 16), (16, 64))) {
      val c = Pq.trainCodebooks(emb, "embedding", m, k)
      val rc = emb.agg(avg(Ann.cosine(col("embedding"),
        Pq.decode(Pq.encode(col("embedding"), c), c))).as("rc")).head.getDouble(0)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select(col("query_id"), col("neighbor_id"))
      val bf = pairs(Ann.bruteForceTopK(emb, "vec_id", "embedding", col("vec_id") < 5, 10))
      val adc = pairs(Pq.adcTopK(emb, "vec_id", "embedding", col("vec_id") < 5, c, 10))
      val total = bf.count().toDouble
      val hit = bf.join(adc, Seq("query_id", "neighbor_id"), "left_semi").count()
      info(f"m=$m k=$k: recon=$rc%.4f recall=${hit / total}%.3f")
    }
  }
}
