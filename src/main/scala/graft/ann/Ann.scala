package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, same semantics:
  *  - brute-force: exact cosine top-k via a broadcast join of the (small)
  *    query set against the corpus — one scan, no shuffle of the corpus,
  *    `TakeOrderedAndProject` per query. This is the correctness baseline
  *    and is also the right plan at 100 TB when |queries| is small.
  *  - LSH-bucketed: random-hyperplane signatures; corpus shuffled once on
  *    band buckets; queries probe only their buckets. Approximate, scales
  *    to large query sets (corpus×corpus self-join stays bucket-local).
  *
  * Cosine is a native column expression (zip_with + aggregate → codegen),
  * no UDF in the hot path.
  */
object Ann {

  /** cosine similarity between two array<float> columns, computed in
    * double precision, null-safe for zero vectors.
    *
    * Native codegen'd Catalyst expression (one fused loop inside
    * whole-stage codegen); `cosineHof` below is the declarative
    * higher-order-function form it replaced — kept as the parity witness
    * (PlanExprSpec asserts bit-identical results). */
  def cosine(a: Column, b: Column): Column =
    graft.plans.CosineSimilarityExpression.cosineSim(a, b)

  /** Declarative zip_with/aggregate cosine. Same semantics as `cosine`,
    * but higher-order functions evaluate interpreted (no whole-stage
    * codegen) and materialize the product array — reference only. */
  def cosineHof(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot / (na * nb))
  }

  /** Exact top-k neighbors for each query id.
    * @param emb    corpus: (idCol, vecCol)
    * @param querySelector predicate choosing query rows from the corpus
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      querySelector: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = emb.filter(querySelector)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = emb
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Matryoshka-style two-stage top-k (Kusupati et al. 2022, "Matryoshka
    * representation learning"): score EVERY candidate on only the first
    * `prefixDims` dimensions (MRL-trained embeddings concentrate
    * information in the prefix), keep a `rerankDepth` shortlist per
    * query, then rerank just the shortlist with the full vector. Reads
    * `prefixDims/dim` of the float math per candidate; the full-width
    * cosine runs on `rerankDepth` rows per query instead of the corpus.
    *
    * With `rerankDepth ≥ corpus size` the shortlist is everything and
    * the result EQUALS [[bruteForceTopK]] exactly (a12 gate-enforces
    * that identity plus a shallow-depth recall floor). Same plan shape
    * as bruteForce: queries broadcast, corpus unshuffled, per-query
    * WindowGroupLimit — narrower arithmetic, not a different topology.
    */
  def prefixRerankTopK(emb: DataFrame, idCol: String, vecCol: String,
      querySelector: Column, k: Int, prefixDims: Int,
      rerankDepth: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(prefixDims >= 1, s"prefixDims=$prefixDims must be >= 1")
    require(rerankDepth >= k, s"rerankDepth=$rerankDepth below k=$k")
    val q = emb.filter(querySelector)
      .select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        slice(col(vecCol), 1, prefixDims).as("qpre"))
    val coarse = emb
      .select(col(idCol).as("neighbor_id"),
        col(vecCol).as("nvec"), slice(col(vecCol), 1, prefixDims).as("npre"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("qvec"), col("nvec"),
        cosine(col("qpre"), col("npre")).as("coarse"))
    val wc = Window.partitionBy(col("query_id"))
      .orderBy(col("coarse").desc, col("neighbor_id"))
    val shortlist = coarse.withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= rerankDepth)
    val wf = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    shortlist
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qvec"), col("nvec")).as("cos"))
      .withColumn("rn", row_number().over(wf)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** nBits-bit random-hyperplane signature of a float-array column.
    * Kept ONLY as the parity witness for the native codegen'd
    * [[graft.plans.HyperplaneSignatureExpression]] that replaced it in
    * the hot path (PlanExprSpec asserts bit-identical signatures): the
    * UDF boxes each row into Seq[Float] and evaluates interpreted. */
  def signatureUdf(nBits: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (vec: Seq[Float]) =>
      var sig = 0L
      var p = 0
      while (p < nBits) {
        var dot = 0.0
        var j = 0
        while (j < vec.length) {
          dot += vec(j) * graft.plans.HyperplaneSignatureExpression.planeComponent(p, j)
          j += 1
        }
        if (dot > 0) sig |= (1L << p)
        p += 1
      }
      sig
    }

  /** Native codegen'd signature column (the hot-path form). */
  def signature(vec: Column, nBits: Int): Column =
    graft.plans.HyperplaneSignatureExpression.hyperplaneSig(vec, nBits)

  /** Driver-local spherical k-means (Lloyd's on unit vectors, cosine
    * metric) over a bounded sample — the IVF trainer. k·dim·iters flops
    * on ≤ maxTrainRows rows: microseconds of driver CPU, ZERO Spark jobs
    * (the MLlib form this replaced launched several jobs per iteration
    * and dominated a03's runtime). Deterministic under `seed`.
    *
    * `initIdx` (the forced-replay regime, gate a03b) picks the initial
    * centroids by EXPLICIT sample index instead of the seeded shuffle:
    * init is a pluggable strategy in any k-means, and an explicit list
    * lets a SQL oracle replay the whole training without simulating
    * java.util.Random. Production callers leave it None. */
  private[ann] def sphericalKMeans(sample: Array[Array[Float]], k: Int,
      iters: Int, seed: Long,
      initIdx: Option[Seq[Int]] = None): Array[Array[Float]] = {
    require(sample.nonEmpty, "ivf training sample is empty")
    val dim = sample(0).length
    def normalized(v: Array[Float]): Array[Float] = {
      var n2 = 0.0; var i = 0
      while (i < v.length) { n2 += v(i).toDouble * v(i); i += 1 }
      val n = math.sqrt(n2)
      if (n == 0.0) v else v.map(x => (x / n).toFloat)
    }
    val unit = sample.map(normalized)
    val rnd = new scala.util.Random(seed)
    var cents = initIdx match {
      case Some(idx) =>
        require(idx.length == k, s"initIdx needs $k indices, got ${idx.length}")
        idx.map(unit).toArray
      case None => rnd.shuffle(unit.indices.toVector).take(k).map(unit).toArray
    }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
      s
    }
    var it = 0
    while (it < iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Int](cents.length)
      unit.foreach { v =>
        var best = 0; var bestD = Double.MinValue; var c = 0
        while (c < cents.length) {
          val d = dot(v, cents(c)); if (d > bestD) { bestD = d; best = c }; c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      cents = cents.indices.map { c =>
        if (counts(c) == 0) {
          // Forced-replay regime (explicit initIdx): every trainer
          // decision must be oracle-replayable, and an RNG re-seed is
          // not — fail loudly instead of silently diverging from the
          // SQL replay (whose sum over an empty cell would NaN out).
          // Production (seeded-shuffle init) keeps the re-seed.
          if (initIdx.isDefined) throw new IllegalStateException(
            s"k-means replay regime: cell $c emptied at iteration $it — " +
              "the explicit-init replay contract requires no empty cells; " +
              "pick different initIdx")
          unit(rnd.nextInt(unit.length)) // re-seed empty cell
        }
        else normalized(sums(c).map(_.toFloat))
      }.toArray
      it += 1
    }
    cents
  }

  /** Bounded driver-side training sample + spherical k-means: first
    * maxTrainRows/nParts rows of EVERY partition — spread across the
    * corpus with no prior count() job. Shared by the IVF paths and
    * [[semDedup]]. Expects the vector column to be named `vec`. */
  private[ann] def trainCentroids(withVec: DataFrame, nLists: Int,
      seed: Long, maxTrainRows: Long, iters: Int = 10,
      initIdx: Option[Seq[Int]] = None): Array[Array[Float]] = {
    val vecOnly = withVec.select("vec")
    val nParts = math.max(1, vecOnly.rdd.getNumPartitions)
    val perPart = math.max(1, math.min(Int.MaxValue.toLong,
      maxTrainRows / nParts).toInt)
    val sample = vecOnly.rdd.mapPartitions(_.take(perPart))
      .map(_.getSeq[Float](0).toArray).collect()
    sphericalKMeans(sample, nLists, iters, seed, initIdx)
  }

  /** Nearest-centroid cell assignment: argmax over nLists fused cosine
    * evaluations against literal centroid arrays — narrow,
    * whole-stage-codegen'd, no model broadcast. */
  private[ann] def assignCells(withVec: DataFrame,
      cents: Array[Array[Float]]): DataFrame = {
    val centCols = cents.map(c => cosine(col("vec"), typedlit(c.toSeq)))
    val cosArr = array(centCols: _*)
    withVec.withColumn("cell",
      (array_position(cosArr, array_max(cosArr)) - 1).cast("int"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): drop documents whose
    * embeddings are near-identical to a kept document. The corpus is
    * clustered into `nLists` Voronoi cells (spherical k-means on a
    * bounded driver sample — same trainer as IVF), pairs are compared
    * ONLY within a cell (the paper's key trick: semantic dups land in the
    * same cluster, so the n² comparison shrinks to Σ cell²), duplicate
    * groups are closed over connected components, and each group keeps
    * its minimum id.
    *
    * Scale shape: assignment is one narrow codegen'd pass; the within-cell
    * self-join shuffles the corpus once keyed by cell and is quadratic
    * only inside a cell (nLists scales with corpus size in production —
    * the paper uses ~10⁵ clusters for LAION — keeping cells bounded).
    * `maxCell` is the belt-and-braces guard for data skew nLists can't
    * fix (boilerplate embeddings collapsing into one Voronoi cell): cells
    * above it are excluded from pair generation — their docs keep=true,
    * exactly like [[graft.dedup.Dedup.minhashLshPairs]]'s maxBucket (docs
    * that degenerate are exact dups, caught upstream far cheaper).
    * Nothing corpus-sized is cached: both self-join sides share one
    * canonical plan (exchange reuse), and the keep-join reads only ids.
    *
    * @return (idCol, keep) for every input row — keep=false means a more
    *         senior near-identical document exists.
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String, tau: Double,
      nLists: Int = 16, seed: Long = 42L, maxTrainRows: Long = 20000L,
      maxCell: Long = 0L): DataFrame = {
    val withVec = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cents = trainCentroids(withVec, nLists, seed, maxTrainRows)
    val assigned = assignCells(withVec, cents)
    val paired =
      if (maxCell > 0) {
        // cell census on the same key the self-join shuffles on — the
        // aggregate reuses that partitioning (cf. minhashLshPairs)
        val ok = assigned.groupBy(col("cell"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n").between(2, maxCell)).select(col("cell"))
        assigned.join(ok, Seq("cell"))
      } else assigned
    val l = paired.select(col("cell"), col("id").as("a"), col("vec").as("va"))
    val r = paired.select(col("cell"), col("id").as("b"), col("vec").as("vb"))
    val pairs = l.join(r, Seq("cell")).filter(col("a") < col("b"))
      .select(col("a"), col("b"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= tau)
    // duplicate groups may chain across pairs (a~b, b~c): close them and
    // keep each group's minimum id, exactly like text dedup
    val reps = graft.dedup.Dedup.duplicateClusters(pairs.select(col("a"), col("b")))
      .withColumnRenamed("doc_id", "id")
    withVec.select(col("id")).join(reps, Seq("id"), "left_outer")
      .select(col("id").as(idCol),
        (col("rep").isNull || col("rep") === col("id")).as("keep"))
  }

  /** IVF (inverted-file) approximate top-k: cluster the corpus into
    * `nLists` Voronoi cells (spherical k-means — the cosine-metric
    * variant, matching the cosine ranking), search only the `nProbe`
    * cells nearest to each query, exact cosine re-rank inside them.
    *
    * Scale shape: train on a driver-bounded sample with zero Spark jobs,
    * assignment is ONE narrow codegen'd pass over the corpus (an
    * argmax-of-16-fused-cosines expression against literal centroids —
    * no MLlib model broadcast, no ml-vector conversion), and the probe
    * join shuffles corpus rows once keyed by cell id — each query scans
    * ~nProbe/nLists of the data.
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
      querySelector: Column, k: Int,
      nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      maxTrainRows: Long = 20000L): DataFrame = {
    val withVec = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cents = trainCentroids(withVec, nLists, seed, maxTrainRows)
    ivfProbeRerank(assignCells(withVec, cents), cents, querySelector, k, nProbe)
  }

  /** Forced-replay regime of [[ivfTopK]] (the sk03c/sk05b discipline):
    * the training corpus is staged as ONE partition in id order and the
    * k-means init is an EXPLICIT list of sample indices, so the bounded
    * sample, every Lloyd's iteration (argmax is first-max-wins, sums
    * accumulate in sample order, re-normalization round-trips through
    * float32 — all IEEE-pinned), the cell assignment, the probe set and
    * the rerank are fully deterministic: a SQL oracle replays the whole
    * IVF structure value-for-value (gate a03b). Production [[ivfTopK]]
    * keeps the partition-planned sample + seeded-shuffle init; its
    * recall is gated by a04/a05. NOT a scale shape — the one-partition
    * stage exists to pin arrival order, exactly like sk03c's. */
  def ivfTopKReplay(emb: DataFrame, idCol: String, vecCol: String,
      querySelector: Column, k: Int, nLists: Int, nProbe: Int,
      iters: Int, initIdx: Seq[Int]): DataFrame = {
    val withVec = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cents = trainCentroidsReplay(emb, idCol, vecCol, nLists, iters, initIdx)
    ivfProbeRerank(assignCells(withVec, cents), cents, querySelector, k, nProbe)
  }

  /** The forced-replay centroid trainer as a standalone seam: the
    * training corpus staged as ONE partition in id order, explicit init
    * indices, every Lloyd's iteration IEEE-pinned (see [[ivfTopKReplay]]).
    * Exists so oracle-replayable gates can FREEZE a deterministic cell
    * geometry and hand it to the index builders (st23 trains on the
    * base corpus, then streams appends under the frozen centroids). */
  def trainCentroidsReplay(emb: DataFrame, idCol: String, vecCol: String,
      nLists: Int, iters: Int, initIdx: Seq[Int]): Array[Array[Float]] = {
    val withVec = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .repartition(1).sortWithinPartitions(col("id"))
    trainCentroids(withVec, nLists, seed = 0L,
      maxTrainRows = Int.MaxValue.toLong, iters, Some(initIdx))
  }

  /** Shared probe+rerank tail of the in-plan IVF regimes: nProbe nearest
    * cells per query (broadcast centroid table), candidates only from
    * probed cells, exact cosine re-rank. */
  private def ivfProbeRerank(assigned: DataFrame, cents: Array[Array[Float]],
      querySelector: Column, k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window

    val spark = assigned.sparkSession
    import spark.implicits._
    val centDf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cell", "centroid")
    val queries = assigned.filter(querySelector)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("centroid_cos").desc, col("cell"))
    val probed = queries.crossJoin(broadcast(centDf))
      .withColumn("centroid_cos", cosine(col("qvec"), col("centroid")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qvec"), col("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qvec"), col("vec")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  /** Large-scale kNN JOIN — the BOTH-SIDES-LARGE variant of [[ivfTopK]]:
    * when the query set is itself a big table (joining two embedding
    * corpora, batch-scoring a day's documents against an index), the
    * query side cannot be broadcast. Both sides get cell keys — corpus
    * rows their nearest centroid, query rows their top-`nProbe`
    * centroids (a NARROW codegen'd array_sort over nLists fused cosines;
    * no per-query window, no shuffle) — and meet in ONE shuffle join
    * co-partitioned by cell. Per-query top-k runs as a rank window with
    * a partial WindowGroupLimit below the exchange, so the post-join
    * exchange moves O(k) rows per (query, probed cell).
    *
    * At 100 TB: corpus shuffles once keyed by cell (or never, if it is
    * already bucketed by cell — [[buildIvfIndex]]), queries shuffle
    * nProbe× their size, and nothing is broadcast but the centroid
    * literals compiled into the plan.
    */
  def knnJoin(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String, k: Int,
      nLists: Int = 16, nProbe: Int = 4, seed: Long = 42L,
      maxTrainRows: Long = 20000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nProbe >= 1 && nProbe <= nLists, s"nProbe=$nProbe out of [1,$nLists]")
    val c = corpus.select(col(corpusId).as("id"), col(corpusVec).as("vec"))
    val cents = trainCentroids(c, nLists, seed, maxTrainRows)
    val assigned = assignCells(c, cents)
    val q0 = queries.select(col(queryId).as("query_id"),
      col(queryVec).as("qvec"))
    val centCos = cents.zipWithIndex.map { case (cent, i) =>
      struct(cosine(col("qvec"), typedlit(cent.toSeq)).as("cos"),
        lit(i).as("cell"))
    }
    val probed = q0
      .withColumn("pc",
        explode(slice(reverse(array_sort(array(centCos: _*))), 1, nProbe)))
      .select(col("query_id"), col("qvec"), col("pc.cell").as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probed.join(assigned, Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qvec"), col("vec")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** Persistent IVF index: train centroids, assign cells, and write the
    * corpus as a table BUCKETED BY CELL — the build-once/probe-many
    * production shape. Probing with [[ivfTopKIndexed]] then prunes at the
    * bucket level: an `cell IN (...)` filter on a bucketed table makes
    * Spark read ONLY the probed cells' files (SelectedBucketsCount in the
    * scan), so each query batch touches ~nProbe/nLists of the index
    * bytes — no re-assignment scan, no shuffle of the corpus at query
    * time. Returns the centroids (tiny; persist them next to the table).
    */
  def buildIvfIndex(emb: DataFrame, idCol: String, vecCol: String,
      table: String, nLists: Int = 16, seed: Long = 42L,
      maxTrainRows: Long = 20000L): Array[Array[Float]] = {
    val withVec = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val cents = trainCentroids(withVec, nLists, seed, maxTrainRows)
    val assigned = assignCells(withVec, cents)
    graft.operators.Bucketing.writeBucketed(assigned, table, "cell", nLists)
    cents
  }

  /** Incremental IVF index maintenance: assign a NEW batch of vectors
    * with the index's EXISTING centroids (no retrain — cell geometry is
    * frozen, so old entries never move) and append it to the bucketed
    * table. O(batch) work per ingest; probes see old and new vectors
    * identically because assignment is a pure function of (vector,
    * centroids) — the a11 gate enforces probe(build(A) ++ append(B)) ==
    * probe(build-with-same-centroids(A∪B)) exactly. Retrain + full
    * rebuild only when drift degrades recall (the d10 LSH-index
    * discipline, applied to the vector index). */
  def appendToIvfIndex(emb: DataFrame, idCol: String, vecCol: String,
      table: String, cents: Array[Array[Float]]): Unit = {
    val withVec = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val assigned = assignCells(withVec, cents)
    graft.operators.Bucketing.appendBucketed(assigned, table, "cell",
      cents.length)
  }

  /** (Re)build an IVF table from GIVEN frozen centroids — the full-
    * rebuild reference the a11 append contract compares against, and the
    * path for rebuilding an index under an unchanged cell geometry
    * (compaction) without touching assignment. */
  def buildIvfIndexFrom(emb: DataFrame, idCol: String, vecCol: String,
      table: String, cents: Array[Array[Float]]): Unit = {
    val withVec = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    graft.operators.Bucketing.writeBucketed(assignCells(withVec, cents),
      table, "cell", cents.length)
  }

  /** Probe a [[buildIvfIndex]] table: per-query nProbe nearest cells via
    * the (tiny) centroid set, one bucket-pruned scan of the index
    * restricted to the union of probed cells, exact cosine re-rank
    * inside them. The probed-cell union is bounded by queries×nProbe
    * (driver-side, small by contract — ANN probing is a small-query-set
    * operation; large query sets belong on [[lshTopK]]'s corpus-shuffle
    * path). */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
      cents: Array[Array[Float]], queries: DataFrame, k: Int,
      nProbe: Int = 4): DataFrame =
    probeStored(spark, spark.table(table), cents, queries, k, nProbe)

  /** Probe tail shared by the bucketed-table ([[ivfTopKIndexed]]) and
    * partition-dir ([[ivfTopKStore]]) index layouts: nProbe nearest
    * cells per query via the (tiny, broadcast) centroid table, the
    * index scan restricted to the probed cells' LITERAL list — bucket
    * pruning on a bucketed table, partition-dir pruning on a
    * `cell=`-partitioned store; either way each query batch reads
    * ~nProbe/nLists of the index bytes — then exact cosine re-rank. */
  private def probeStored(spark: org.apache.spark.sql.SparkSession,
      idx0: DataFrame, cents: Array[Array[Float]], queries: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val centDf = cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }
      .toSeq.toDF("cell", "centroid")
    val q = queries.select(col("query_id"), col("qvec"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("centroid_cos").desc, col("cell"))
    val probed = q.crossJoin(broadcast(centDf))
      .withColumn("centroid_cos", cosine(col("qvec"), col("centroid")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qvec"), col("cell"))
    // literal cell list => bucket/partition pruning on the index scan
    val cells = probed.select("cell").distinct().as[Int].collect().sorted
    val idx = idx0.filter(col("cell").isin(cells.map(Int.box): _*))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    idx.join(broadcast(probed), Seq("cell"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qvec"), col("vec")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }

  // ---- streamed IVF ingest store ---------------------------------------

  /** Persistent IVF store in the st20/st21 SEGMENT layout — the
    * streaming-ingest twin of [[buildIvfIndex]]'s catalog table. Rows
    * land under `path/vecs/batch=<id>/cell=<c>/`, so
    *  - probes prune at the partition-DIRECTORY level on `cell`
    *    (the same ~nProbe/nLists byte fraction bucket pruning buys),
    *  - each streamed append OVERWRITES exactly its own `batch=<id>`
    *    segment — Structured Streaming replays a failed trigger under
    *    the same micro-batch id, so re-ingest is idempotent (the
    *    exactly-once discipline [[graft.dedup.Dedup.appendToLshIndex]]
    *    and `appendToAudioIndex` pin; a bucketed catalog table has no
    *    per-batch segment to overwrite, which is why the streamed form
    *    uses dirs).
    * Cell geometry is FROZEN in `cents` (assignment is a pure function
    * of (vector, centroids)), so build + appends in any batch order
    * equal a one-shot assignment of the union — st23 hash-verifies that
    * against the a03b-style closed-form replay. */
  def buildIvfStore(emb: DataFrame, idCol: String, vecCol: String,
      path: String, cents: Array[Array[Float]]): Unit = {
    val withVec = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    assignCells(withVec, cents)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/vecs/batch=base")
  }

  /** Append a vector batch to a [[buildIvfStore]] store under its
    * FROZEN centroids: assignment is one narrow codegen'd pass over the
    * batch (O(batch) per trigger — the store is neither read nor
    * shuffled), and the write overwrites the batch's own segment
    * (idempotent on `batchId`). */
  def appendToIvfStore(emb: DataFrame, idCol: String, vecCol: String,
      path: String, cents: Array[Array[Float]], batchId: String,
      compactEvery: Int = 0): Unit = {
    require(batchId.matches("[A-Za-z0-9_-]+") && batchId != "base",
      s"batchId must be a fresh [A-Za-z0-9_-]+ segment name, got '$batchId'")
    val withVec = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    assignCells(withVec, cents)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/vecs/batch=$batchId")
    // auto-compaction AFTER this batch's segment is durable: folds
    // strictly below the live batch (the st26 watermark contract)
    if (compactEvery > 0)
      graft.operators.SegmentStore.autoCompact(emb.sparkSession, path,
        "vecs", batchId, compactEvery)
  }

  /** Right-to-be-forgotten over a [[buildIvfStore]] store: removed
    * vec_ids leave every `batch=/cell=` segment (cell dirs and their
    * pruning preserved — the rewrite partitions by the same inner
    * cols); cell GEOMETRY stays frozen (no retrain — assignment is a
    * pure function of (vector, centroids), so survivors keep their
    * cells and probes stay closed-form replayable). Gate a13. */
  def removeFromIvfStore(spark: org.apache.spark.sql.SparkSession,
      path: String, removeIds: org.apache.spark.sql.DataFrame): Unit =
    graft.operators.SegmentStore.removeFromSegmentStore(spark, path,
      removeIds, idCols = Map("vecs" -> Seq("id")))

  /** Probe a [[buildIvfStore]] store — [[ivfTopKIndexed]]'s semantics
    * over the segment layout; the probed-cell literal list prunes
    * `cell=` partition directories across every batch segment. */
  def ivfTopKStore(spark: org.apache.spark.sql.SparkSession, path: String,
      cents: Array[Array[Float]], queries: DataFrame, k: Int,
      nProbe: Int = 4): DataFrame =
    probeStored(spark, spark.read.parquet(s"$path/vecs").drop("batch"),
      cents, queries, k, nProbe)

  /** LSH approximate top-k: candidates share at least one signature band
    * with the query; exact cosine re-ranking on candidates only. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
      querySelector: Column, k: Int,
      nBits: Int = 16, bands: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bits = nBits / bands
    val withSig = emb.select(col(idCol).as("id"), col(vecCol).as("vec"),
      signature(col(vecCol), nBits).as("sig"))
    def banded(df: DataFrame) = df.select(col("id"), col("vec"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * bits)
            .bitwiseAND(lit((1L << bits) - 1)).as("h"))): _*)).as("bh"))
      .select(col("id"), col("vec"), col("bh.band"), col("bh.h"))
    val corpus = banded(withSig)
    val queries = banded(withSig.filter(querySelector))
      .withColumnRenamed("id", "query_id").withColumnRenamed("vec", "qvec")
    // score BEFORE the distinct: a pair surfacing in b bands re-computes
    // the (fused, codegen'd) cosine b≤4 times map-side, but the dedup
    // exchange then carries three scalars per candidate instead of both
    // full embedding vectors as grouping keys — the shuffle is what hurts
    // at corpus scale, not the dot product. cos is deterministic per
    // pair, so distinct on (query_id, neighbor_id, cos) == distinct pairs.
    val cand = corpus.join(broadcast(queries),
        Seq("band", "h")).filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        cosine(col("qvec"), col("vec")).as("cos"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"))
  }
}
