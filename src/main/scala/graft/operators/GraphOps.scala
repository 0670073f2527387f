package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality over DataFrames — the page-quality signal web-scale
  * curation pipelines compute over the crawl graph (CommonCrawl publishes
  * exactly these: harmonic centrality + PageRank per host) and feed into
  * quality-weighted sampling ([[Splits.weightedSample]]).
  *
  * Reference anchor: amadeus has no graph surface; this extends the
  * "beyond the reference" LLM-pipeline block (SURVEY §2 extension) the same
  * way [[LanguageModel]] does.
  *
  * Spark-first shape: the power iteration is plain relational algebra —
  * edges ⋈ ranks on src, one sum-by-dst aggregate, a one-row dangling-mass
  * frame crossed in as a broadcast — so Catalyst keeps every per-iteration
  * stage map-side combined and AQE-sized. GraphX exists, but its RDD core
  * gives up whole-stage codegen and columnar shuffle for no semantic gain
  * at fixed iteration counts.
  */
object GraphOps {

  /** Lineage truncation for the iterative ops. Default
    * (`checkpointDir = None`) is `localCheckpoint`: blocks live on
    * executors only — fastest, and right for `local[n]` where executor
    * loss means the JVM is gone anyway. On a REAL cluster an executor
    * loss mid-iteration makes a localCheckpointed partition
    * unrecoverable and kills the job, so long multi-hour graph jobs
    * should pass a fault-tolerant `checkpointDir` (HDFS / object
    * store): the iteration frames are then written there via reliable
    * `checkpoint()` and survive any executor loss. Results are
    * IDENTICAL in both modes (GraphSpec pins it) — this is purely a
    * fault-tolerance/performance trade. */
  private def truncate(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    if (checkpointDir.isDefined) {
      // persist before a reliable checkpoint: eager checkpoint() runs a
      // count job AND a separate write job — unpersisted, the frame
      // would be computed twice per iteration
      val cached = df.persist()
      val out = cached.checkpoint()
      cached.unpersist()
      out
    } else df.localCheckpoint()

  /** One `setCheckpointDir` per operator call (Spark appends a UUID
    * subdirectory, so repeated calls don't collide). */
  private def prepareCheckpointDir(df: DataFrame,
      checkpointDir: Option[String]): Unit =
    checkpointDir.foreach(df.sparkSession.sparkContext.setCheckpointDir)

  /** Standard damped PageRank with uniform dangling-mass redistribution,
    * a FIXED number of power iterations (fixed, not convergence-tested,
    * so a replaying engine computes the identical sequence):
    *
    *   r₀(v)    = 1/N
    *   rᵢ₊₁(v) = (1−d)/N + d·( Σ_{(u,v)∈E} rᵢ(u)/outdeg(u) + Dᵢ/N )
    *
    * where Dᵢ = Σ over dangling nodes (no out-edges) of rᵢ. Ranks sum to
    * 1 every iteration. Each iteration's ranks are floor-rounded to 12
    * decimals so last-ulp FP differences cannot compound across
    * iterations between engines (sum-order error per iteration is
    * ~1e-16, four orders below the rounding quantum — the repo-wide
    * convention of t11/d12).
    *
    * Plan at 100 TB: iterative lineage MUST be truncated — the rank
    * recurrence references the previous iteration's frame three times
    * (contribution join, dangling mass, node outer join), so a fully
    * lazy composition re-expands ~3^i subtrees (measured: 81 scans /
    * 206 exchanges at 3 iterations). With `materialize` (default) the
    * deduplicated edge list and each iteration's node-sized rank table
    * are `localCheckpoint`ed: one real scan of `edges`, then every
    * iteration is ONE map-side-combined shuffle keyed by dst over the
    * checkpointed edge list plus two one-row broadcasts (N, dangling
    * mass) — exactly MLlib/GraphX's per-iteration materialization
    * discipline, relationally. Checkpoint blocks are node-sized (not
    * registered in the CacheManager; the ContextCleaner reclaims them
    * once unreachable). `materialize = false` keeps the composition
    * fully lazy for plan-inspection tests. On a real cluster pass
    * `checkpointDir` (see [[truncate]]) to make each iteration's
    * materialization survive executor loss.
    *
    * @return (node, rank) for every node appearing as src or dst
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, damping: Double = 0.85,
      materialize: Boolean = true,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    require(damping > 0.0 && damping < 1.0, s"damping=$damping outside (0,1)")
    prepareCheckpointDir(edges, checkpointDir)
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val e = if (materialize) truncate(e0, checkpointDir) else e0
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nN = nodes.agg(count(lit(1)).cast("double").as("n"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).cast("double").as("deg"))
    def r12(c: org.apache.spark.sql.Column) =
      floor(c * 1e12 + lit(0.5)) / 1e12
    var ranks = nodes.crossJoin(broadcast(nN))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
    var i = 0
    while (i < iterations) {
      val contrib = e.join(deg, Seq("src"))
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
      val dang = ranks
        .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left_outer")
        .crossJoin(broadcast(nN)).crossJoin(broadcast(dang))
        .select(col("node"),
          r12((lit(1.0) - damping) / col("n")
            + lit(damping) * (coalesce(col("contrib"), lit(0.0))
              + col("dm") / col("n"))).as("rank"))
      i += 1
      if (materialize) ranks = truncate(ranks, checkpointDir)
    }
    ranks
  }

  /** PERSONALIZED PageRank: the random walk teleports to the `seeds`
    * (uniformly) instead of to every node — relevance "from the
    * perspective of" a seed set, the standard related-entity /
    * recommendation signal on a link graph:
    *
    *   r₀ = v ;  rᵢ₊₁(u) = (1−d)·v(u) + d·( Σ contrib + Dᵢ·v(u) )
    *
    * with v uniform over seeds, 0 elsewhere (dangling mass returns to
    * the seeds — the walk restarts there). Same fixed-iteration,
    * per-iteration-1e-12-rounded, checkpoint-truncated discipline as
    * [[pageRank]]; mass stays 1 over the seeds' reachable set. Seeds
    * must exist in the graph — missing seeds would silently leak reset
    * mass, so they fail loudly instead.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: Seq[Long], iterations: Int = 3, damping: Double = 0.85,
      materialize: Boolean = true,
      checkpointDir: Option[String] = None): DataFrame = {
    require(seeds.nonEmpty, "personalizedPageRank needs at least one seed")
    require(iterations >= 1, s"iterations=$iterations must be >= 1")
    require(damping > 0.0 && damping < 1.0, s"damping=$damping outside (0,1)")
    prepareCheckpointDir(edges, checkpointDir)
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val e = if (materialize) truncate(e0, checkpointDir) else e0
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val distinctSeeds = seeds.distinct
    val present = nodes.filter(col("node").isInCollection(distinctSeeds)).count()
    require(present == distinctSeeds.size,
      s"personalizedPageRank: ${distinctSeeds.size - present} seed(s) not in the graph")
    val deg = e.groupBy(col("src")).agg(count(lit(1)).cast("double").as("deg"))
    def r12(c: org.apache.spark.sql.Column) =
      floor(c * 1e12 + lit(0.5)) / 1e12
    def v = when(col("node").isInCollection(distinctSeeds),
      lit(1.0 / distinctSeeds.size)).otherwise(lit(0.0))
    var ranks = nodes.select(col("node"), v.as("rank"))
    var i = 0
    while (i < iterations) {
      val contrib = e.join(deg, Seq("src"))
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") / col("deg")).as("contrib"))
      val dang = ranks
        .join(deg.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left_outer")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          r12(lit(1.0 - damping) * v
            + lit(damping) * (coalesce(col("contrib"), lit(0.0))
              + col("dm") * v)).as("rank"))
      i += 1
      if (materialize) ranks = truncate(ranks, checkpointDir)
    }
    ranks
  }

  /** In/out degree per node over the deduplicated edge set — the cheap
    * centrality (one aggregate each side, one outer merge). */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val outD = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val inD = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    outD.join(inD, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Per-node triangle participation over the UNDIRECTED simple graph
    * induced by the edge list (direction dropped, self-loops and
    * multi-edges removed).
    *
    * The classic two-join relational form — the same shape Cohen's
    * MapReduce triangle enumeration and every SQL-on-graph engine use:
    * canonicalize each edge to (lo, hi) with lo < hi, join wedges
    * (a<b)⋈(b<c) on the middle node, then close each wedge against the
    * edge set on (a, c). Ordering every traversal low→high enumerates
    * each triangle exactly once with no candidate duplication.
    *
    * Plan at 100 TB: both joins are plain equi-joins Catalyst shuffles
    * on the wedge key — partial-agg'd, AQE-sized, no driver state. The
    * worst case is a high-degree hub exploding the wedge join; the
    * standard mitigation (orientation by degree — point every edge at
    * the higher-degree endpoint, bounding wedge fan-out by arboricity)
    * composes here as a pre-step by re-canonicalizing on
    * (degree, node) instead of node id. Node ids here are small longs;
    * per-triangle traffic is 3×8 bytes.
    *
    * Returns (node, triangles) for every node in ≥1 triangle.
    */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val ab = e.select(col("lo").as("a"), col("hi").as("b"))
    val bc = e.select(col("lo").as("b"), col("hi").as("c"))
    val ac = e.select(col("lo").as("a"), col("hi").as("c"))
    val tri = ab.join(bc, "b").join(ac, Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }

  /** Average neighbor degree per node (undirected simple graph) — the
    * assortativity signal: hubs connected to hubs vs hubs feeding
    * leaves. Two keyed aggregates + one broadcastable degree join. */
  def avgNeighborDegree(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val adj = e.select(col("lo").as("node"), col("hi").as("nbr"))
      .union(e.select(col("hi").as("node"), col("lo").as("nbr")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    adj.join(deg.select(col("node").as("nbr"), col("deg").as("nbr_deg")), "nbr")
      .groupBy(col("node"))
      .agg(count(lit(1)).as("deg"), sum(col("nbr_deg")).as("sum_nbr_deg"))
      .select(col("node"), col("deg"),
        round(floor(col("sum_nbr_deg").cast("double") / col("deg") * lit(1e12)
          + lit(0.5)) / lit(1e12), 6).as("avg_nbr_deg"))
  }

  /** Neighbor-set Jaccard similarity per node pair — the classic
    * link-prediction / entity-similarity feature: two nodes are similar
    * when they share neighbors (common-neighbors / union-of-neighbors on
    * the undirected simple graph).
    *
    * Shape: ONE wedge self-join keyed by the shared neighbor (each
    * common neighbor contributes exactly one pair occurrence) followed
    * by a pair-keyed count — both map-side combined. Pair fan-out per
    * shared neighbor is deg², so hubs dominate cost: `maxDegree > 0`
    * excludes nodes above the cap from WEDGE CENTERS (their own pairs),
    * while Jaccard denominators always use true degrees. A star hub's
    * neighbors legitimately share it, so capping only bounds the
    * quadratic term — the standard similarity-join skew guard, same
    * spirit as minhashLshPairs' `maxBucket`.
    *
    * Returns (u, v, common, jaccard) for u < v with ≥1 shared neighbor.
    */
  def neighborJaccard(edges: DataFrame, srcCol: String, dstCol: String,
      maxDegree: Int = 0): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val adj = e.select(col("lo").as("node"), col("hi").as("nbr"))
      .union(e.select(col("hi").as("node"), col("lo").as("nbr")))
    val deg = adj.groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // wedge centers: the shared-neighbor side; capping drops hub CENTERS
    val centers =
      if (maxDegree > 0) {
        val ok = deg.filter(col("deg") <= maxDegree)
          .select(col("node").as("_center_ok"))
        adj.join(ok, adj("nbr") === col("_center_ok"))
          .select(adj("node"), adj("nbr"))
      } else adj
    val a = centers.select(col("nbr").as("w"), col("node").as("u"))
    val b = centers.select(col("nbr").as("w"), col("node").as("v"))
    val common = a.join(b, "w").filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("common"))
    common
      .join(deg.select(col("node").as("u"), col("deg").as("deg_u")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("deg_v")), "v")
      .select(col("u"), col("v"), col("common"),
        (col("common").cast("double") /
          (col("deg_u") + col("deg_v") - col("common"))).as("jaccard"))
  }

  /** k-core subgraph (Seidman 1983): iteratively peel nodes of degree
    * < k until every survivor has ≥ k surviving neighbors — the dense
    * "engagement core" a recommender or community detector keys on.
    *
    * Edges are canonicalized (undirected, deduped, self-loops dropped)
    * first. Each peel round is two node-keyed aggregates + two
    * anti-joins — everything keyed, nothing corpus-global; rounds needed
    * = peel depth, which is small for real degree distributions (a
    * pathological chain peels one node per round — `maxIters` throws
    * loudly rather than returning a non-core silently, same discipline
    * as [[graft.dedup.Dedup.duplicateClusters]]). Peeling is idempotent
    * at the fixpoint, so an oracle may replay MORE rounds than Spark
    * ran and still match exactly.
    *
    * @return surviving `(node, degree)` — degree WITHIN the core
    */
  def kCore(edges0: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIters: Int = 20, checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    prepareCheckpointDir(edges0, checkpointDir)
    var edges = edges0
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct().persist()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val deg = edges.select(col("a").as("n"))
        .unionAll(edges.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      val bad = deg.filter(col("d") < k).select(col("n")).persist()
      if (bad.count() == 0L) converged = true
      else {
        val next = edges
          .join(bad.withColumnRenamed("n", "a"), Seq("a"), "left_anti")
          .join(bad.withColumnRenamed("n", "b"), Seq("b"), "left_anti")
          .persist()
        next.count() // materialize before dropping the parent
        edges.unpersist()
        edges = next
      }
      bad.unpersist()
      i += 1
    }
    if (!converged) {
      edges.unpersist()
      throw new IllegalStateException(
        s"kCore did not converge after $maxIters peel rounds; raise maxIters")
    }
    // truncate the peel-chain lineage (same discipline as pageRank's
    // checkpointed iterations): without this, evaluating the result
    // re-runs every anti-join round from scratch after the unpersist
    val core = truncate(edges, checkpointDir)
    edges.unpersist()
    core.select(col("a").as("node"))
      .unionAll(core.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
  }
}
