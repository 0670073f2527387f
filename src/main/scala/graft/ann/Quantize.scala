package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization: symmetric int8 scalar quantization (SQ8) of
  * `array<float>` embedding columns — the standard 4× storage/bandwidth
  * compression for large vector corpora (100 TB of fp32 embeddings becomes
  * 25 TB of int8 + one fp scale per vector, with ~0.4%·‖v‖∞ max error).
  *
  * All arithmetic is double-precision with `floor(x/scale + 0.5)` as the
  * rounding step: floor is IEEE-exact and engine-independent, so another
  * engine (the DuckDB oracle) replaying the same formula over the same
  * floats produces bit-identical results — which is what lets e01 be
  * hash-verified rather than tolerance-checked.
  *
  * Declarative higher-order functions (interpreted, not codegen'd): right
  * for the one-time storage pass this models. A hot-loop variant would
  * follow the [[graft.plans.CosineSimilarityExpression]] native pattern.
  *
  * Exceeds the reference (no vector ops there); pairs with [[Ann]] for
  * quantized-corpus ANN.
  */
object Quantize {

  /** Per-vector symmetric scale: max|x|/127, floored at 1e-12 so zero
    * vectors quantize to zeros instead of dividing by zero. */
  def sq8Scale(vec: Column): Column =
    greatest(aggregate(vec, lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double")))), lit(1e-12)) / 127.0

  /** Quantize to int8 codes given the vector's scale. Codes stay in
    * [-127, 127] by construction (|x|/scale ≤ 127). */
  def sq8Quantize(vec: Column, scale: Column): Column =
    transform(vec, x =>
      floor(x.cast("double") / scale + 0.5).cast("byte"))

  /** Reconstruct float values from codes. */
  def sq8Dequantize(codes: Column, scale: Column): Column =
    transform(codes, q => (q.cast("double") * scale).cast("float"))

  /** Max absolute reconstruction error for one vector (≤ scale/2). */
  def sq8MaxError(vec: Column, scale: Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => {
      val xd = x.cast("double")
      greatest(acc, abs(xd - floor(xd / scale + 0.5) * scale))
    })

  /** Mean absolute reconstruction error for one vector. */
  def sq8MeanError(vec: Column, scale: Column): Column = {
    val s = aggregate(vec, lit(0.0), (acc, x) => {
      val xd = x.cast("double")
      acc + abs(xd - floor(xd / scale + 0.5) * scale)
    })
    s / size(vec)
  }

  /** L2 norm of a float-array column (double accumulation). */
  def l2Norm(vec: Column): Column =
    sqrt(aggregate(vec, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** L2-normalize a float-array column — the pre-index step that turns
    * cosine into dot product (IVF/PQ codebooks then train on the unit
    * sphere). Zero vectors pass through unchanged. Narrow, codegen'd. */
  def l2Normalize(vec: Column): Column = {
    val n = l2Norm(vec)
    when(n > 0, transform(vec, x => (x.cast("double") / n).cast("float")))
      .otherwise(vec)
  }

  /** Mean-center a float-array column against the corpus mean vector:
    * one d-sized aggregate (posexplode → per-index avg, collected — d
    * doubles on the driver regardless of corpus size), then a narrow
    * subtract against the literal mean. Centering removes the "hubness"
    * offset before PCA/whitening. Returns (centeredDf, meanVector). */
  def meanCenter(df: org.apache.spark.sql.DataFrame, vecCol: String)
      : (org.apache.spark.sql.DataFrame, Array[Double]) = {
    val spark = df.sparkSession
    val mean = df.select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy(col("i")).agg(avg(col("x")).as("m"))
      .orderBy(col("i")).collect().map(_.getDouble(1))
    val lits = typedlit(mean.toSeq)
    val centered = df.withColumn(vecCol,
      zip_with(col(vecCol), lits, (x, m) => (x.cast("double") - m).cast("float")))
    (centered, mean)
  }
}
