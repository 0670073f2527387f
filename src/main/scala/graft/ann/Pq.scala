package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"): split each d-dim vector into `m` contiguous
  * subvectors and quantize each against its own k-codeword codebook. A
  * 64-dim fp32 embedding (256 B) becomes m bytes (m=8, k≤256 → 32×
  * compression) — THE memory-bound ANN representation at 100 TB, where
  * SQ8's 4× ([[Quantize]]) still doesn't fit RAM.
  *
  * Division of labor (same as the IVF paths in [[Ann]]):
  *  - codebook training: plain-L2 Lloyd k-means per subspace on a bounded
  *    driver sample — m·k·subDim·iters flops of driver CPU, zero Spark
  *    jobs, deterministic under `seed`;
  *  - encoding: per subspace, argmin over k literal centroids computed as
  *    argmax of (dot(sub, c) − ‖c‖²/2) — the native codegen'd
  *    [[graft.plans.DotProductExpression]] per codeword, fused in
  *    whole-stage codegen exactly like `Ann.assignCells`. No UDF, no
  *    model broadcast: the codebooks compile into the plan as literals;
  *  - search: asymmetric distance — the query stays full-precision and
  *    scores against RECONSTRUCTED corpus vectors (decode = m literal
  *    array lookups + concat, narrow). Numerically identical to the
  *    classic per-query ADC lookup-table sum, expressed relationally so
  *    the optimizer sees one scan + TakeOrderedAndProject per query.
  */
object Pq {

  /** Per-subspace codebooks: `m` × `k` × (d/m) floats.
    * Sample = first maxTrainRows/nParts rows of every partition (spread
    * across the corpus, no prior count job — `Ann.trainCentroids`'s
    * scheme). */
  def trainCodebooks(emb: DataFrame, vecCol: String, m: Int, k: Int,
      seed: Long = 42, iters: Int = 10,
      maxTrainRows: Long = 4096): Array[Array[Array[Float]]] = {
    require(m >= 1 && k >= 2, s"need m>=1 subspaces, k>=2 codewords; got m=$m k=$k")
    val vecOnly = emb.select(col(vecCol))
    val nParts = math.max(1, vecOnly.rdd.getNumPartitions)
    val perPart = math.max(1, (maxTrainRows / nParts).toInt)
    val sample = vecOnly.rdd.mapPartitions(_.take(perPart))
      .map(_.getSeq[Float](0).toArray).collect()
    require(sample.nonEmpty, "pq training sample is empty")
    val d = sample(0).length
    require(d % m == 0, s"dim $d not divisible into m=$m subspaces")
    val sd = d / m
    Array.tabulate(m) { j =>
      lloydL2(sample.map(v => java.util.Arrays.copyOfRange(v, j * sd, (j + 1) * sd)),
        k, iters, seed + j)
    }
  }

  /** Plain-L2 Lloyd k-means on a driver array (vs `Ann.sphericalKMeans`,
    * which normalizes — PQ subvectors are NOT unit vectors, so euclidean
    * residuals are the right objective). Deterministic under `seed`. */
  private def lloydL2(sample: Array[Array[Float]], k: Int, iters: Int,
      seed: Long): Array[Array[Float]] = {
    val dim = sample(0).length
    val rnd = new scala.util.Random(seed)
    var cents = rnd.shuffle(sample.indices.toVector).take(k).map(sample).toArray
    def d2(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val t = a(i).toDouble - b(i); s += t * t; i += 1 }
      s
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Int](cents.length)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < cents.length) {
          val dd = d2(v, cents(c)); if (dd < bestD) { bestD = dd; best = c }; c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) sample(rnd.nextInt(sample.length))
        else sums(c).map(x => (x / counts(c)).toFloat)
      }.toArray
      it += 1
    }
    cents
  }

  /** PQ code for `vec`: array<int> of length m, code_j = index of the
    * nearest (L2) codeword in subspace j. argmin ‖s−c‖² = argmax
    * (s·c − ‖c‖²/2), so each subspace is k fused dot products against
    * literal centroids + array_position(array_max) — all codegen'd. */
  def encode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column = {
    val sd = codebooks(0)(0).length
    val subCodes = codebooks.indices.map { j =>
      val sub = slice(vec, j * sd + 1, sd)
      val scores = array(codebooks(j).map { c =>
        val half = c.map(x => x.toDouble * x).sum / 2.0
        graft.plans.DotProductExpression.dot(sub, typedlit(c.toSeq)) - lit(half)
      }: _*)
      (array_position(scores, array_max(scores)) - 1).cast("int")
    }
    array(subCodes: _*)
  }

  /** Reconstruction from PQ codes: concat of the m looked-up codewords
    * (literal array-of-arrays per subspace, element_at by code). */
  def decode(codes: Column, codebooks: Array[Array[Array[Float]]]): Column =
    concat(codebooks.indices.map { j =>
      element_at(typedlit(codebooks(j).map(_.toSeq).toSeq),
        element_at(codes, j + 1) + 1)
    }: _*)

  /** IVF-PQ (the composed architecture of Jégou et al. 2011 §IV, minus
    * residual re-centering — codebooks are shared across cells): coarse
    * spherical-k-means cells bound WHICH vectors are scored (probe the
    * nProbe nearest cells, skip the rest) and PQ codes bound WHAT is
    * read per vector (m bytes, not 4d). This is the memory-AND-compute
    * shape of a 100 TB vector corpus: per query batch, ~nProbe/nLists of
    * the corpus is touched, at 32× fewer bytes per vector.
    *
    * Plan: cell assignment + encode→decode are one narrow codegen'd
    * projection over the corpus; the probed (query, cell) set broadcasts;
    * scoring is asymmetric (full-precision query vs reconstructed
    * candidate); exact top-k per query closes. The corpus never
    * shuffles. Pair with `Ann.buildIvfIndex`-style cell bucketing to
    * also prune the SCAN at build time (a05's shape).
    */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
      querySelector: Column, k: Int,
      nLists: Int = 16, nProbe: Int = 4, m: Int = 8, kCodes: Int = 64,
      seed: Long = 42L, maxTrainRows: Long = 20000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = emb.sparkSession
    import spark.implicits._
    val withVec = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cents = Ann.trainCentroids(withVec, nLists, seed, maxTrainRows)
    val cb = trainCodebooks(emb, vecCol, m, kCodes, seed, maxTrainRows = maxTrainRows)
    val assigned = Ann.assignCells(withVec, cents)
      .select(col("id"), col("cell"),
        decode(encode(col("vec"), cb), cb).as("vec"))
    val centDf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cell", "centroid")
    val queries = withVec.filter(querySelector)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("centroid_cos").desc, col("cell"))
    val probed = queries.crossJoin(broadcast(centDf))
      .withColumn("centroid_cos", Ann.cosine(col("qvec"), col("centroid")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qvec"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        Ann.cosine(col("qvec"), col("vec")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Asymmetric-distance top-k: full-precision queries scored against the
    * PQ-reconstructed corpus — encode→decode fused in one narrow
    * projection (codes never materialize unless the caller stores them),
    * then the exact top-k machinery. Same broadcast-queries /
    * corpus-unshuffled plan as `Ann.bruteForceTopK`. */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String,
      querySelector: Column, codebooks: Array[Array[Array[Float]]],
      k: Int): DataFrame = {
    val recon = emb.select(col(idCol),
      decode(encode(col(vecCol), codebooks), codebooks).as(vecCol))
    // queries keep full precision (the "asymmetric" in ADC)
    val q = emb.filter(querySelector)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    import org.apache.spark.sql.expressions.Window
    val scored = recon.join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        Ann.cosine(col("qvec"), col(vecCol)).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }
}
