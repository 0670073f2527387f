package graft

import graft.operators.GraphOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PageRank + degree centrality: closed-form checks on a tiny graph,
  * conservation + dangling-mass properties, and plan shape. */
class GraphSpec extends AnyFunSuite with CacheHygiene {

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  import spark.implicits._

  // a -> b, a -> c, b -> c; c dangles (no out-edges)
  def tiny = Seq(("a", "b"), ("a", "c"), ("b", "c")).toDF("s", "t")

  test("one iteration matches the closed form (incl. dangling mass)") {
    // N=3, r0 = 1/3 each; dangling = c (1/3)
    // contrib: b <- a/2 = 1/6 ; c <- a/2 + b = 1/6 + 1/3 = 1/2
    // r1(v) = 0.05 + 0.85*(contrib + (1/3)/3)
    val got = GraphOps.pageRank(tiny, "s", "t", iterations = 1)
      .as[(String, Double)].collect().toMap
    def expect(contrib: Double) =
      math.floor((0.05 + 0.85 * (contrib + 1.0 / 9)) * 1e12 + 0.5) / 1e12
    assert(math.abs(got("a") - expect(0.0)) < 1e-12)
    assert(math.abs(got("b") - expect(1.0 / 6)) < 1e-12)
    assert(math.abs(got("c") - expect(0.5)) < 1e-12)
  }

  test("ranks are a probability distribution every run") {
    for (iters <- Seq(1, 3, 5)) {
      val ranks = GraphOps.pageRank(tiny, "s", "t", iterations = iters)
        .agg(sum("rank"), min("rank")).as[(Double, Double)].head()
      assert(math.abs(ranks._1 - 1.0) < 1e-9, s"iters=$iters sum=${ranks._1}")
      assert(ranks._2 > 0.0)
    }
  }

  test("sink node accumulates the most rank") {
    val got = GraphOps.pageRank(tiny, "s", "t", iterations = 5)
      .orderBy(col("rank").desc).as[(String, Double)].collect()
    assert(got.head._1 == "c")
  }

  test("duplicate edges do not double-count") {
    val dup = tiny.union(tiny)
    val a = GraphOps.pageRank(tiny, "s", "t", 3).as[(String, Double)].collect().toMap
    val b = GraphOps.pageRank(dup, "s", "t", 3).as[(String, Double)].collect().toMap
    assert(a == b)
  }

  test("partition-layout independence") {
    val a = GraphOps.pageRank(tiny.repartition(1), "s", "t", 3)
      .as[(String, Double)].collect().toMap
    val b = GraphOps.pageRank(tiny.repartition(16), "s", "t", 3)
      .as[(String, Double)].collect().toMap
    assert(a == b)
  }

  test("reliable-checkpoint mode is result-identical to localCheckpoint mode") {
    // cluster deployments pass checkpointDir so iteration frames survive
    // executor loss; the numbers must not depend on the mode
    val dir = "target/qtmp/spec/graph_ckpt"
    val a = GraphOps.pageRank(tiny, "s", "t", 3)
      .as[(String, Double)].collect().toMap
    val b = GraphOps.pageRank(tiny, "s", "t", 3, checkpointDir = Some(dir))
      .as[(String, Double)].collect().toMap
    assert(a == b)
    val pa = GraphOps.personalizedPageRank(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "t"),
      "s", "t", seeds = Seq(1L), iterations = 3)
      .as[(Long, Double)].collect().toMap
    val pb = GraphOps.personalizedPageRank(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "t"),
      "s", "t", seeds = Seq(1L), iterations = 3, checkpointDir = Some(dir))
      .as[(Long, Double)].collect().toMap
    assert(pa == pb)
    val kEdges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("s", "t")
    val ka = GraphOps.kCore(kEdges, "s", "t", k = 2)
      .as[(Long, Long)].collect().toSet
    val kb = GraphOps.kCore(kEdges, "s", "t", k = 2, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toSet
    assert(ka == kb && ka == Set((1L, 2L), (2L, 2L), (3L, 2L)))
    // the reliable files actually landed in the requested directory
    assert(new java.io.File(dir).exists, "checkpoint dir never created")
  }

  test("degrees: full outer over sources and sinks") {
    val got = GraphOps.degrees(tiny, "s", "t")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 2L, 0L), ("b", 1L, 1L), ("c", 0L, 2L)))
  }

  // K4 on {1,2,3,4}: C(4,3) = 4 triangles, every node in exactly 3
  def k4 = (for {
    i <- 1 to 4; j <- 1 to 4 if i != j
  } yield (i.toLong, j.toLong)).toDF("s", "t")

  test("triangles: K4 closed form") {
    val got = GraphOps.triangles(k4, "s", "t")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: direction, multi-edges and self-loops are ignored") {
    // same undirected simple graph as tiny (a-b, a-c, b-c) = 1 triangle,
    // expressed with reversed dups and a self-loop
    val messy = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
      ("b", "c"), ("b", "b")).toDF("s", "t")
    val got = GraphOps.triangles(messy, "s", "t")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("triangles: triangle-free graphs yield no rows") {
    // star K1,3 and a 4-cycle both have wedges but no closure
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "t")
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "t")
    assert(GraphOps.triangles(star, "s", "t").count() == 0)
    assert(GraphOps.triangles(cycle, "s", "t").count() == 0)
  }

  test("triangles: partition-layout independence") {
    val a = GraphOps.triangles(k4.repartition(1), "s", "t")
      .as[(Long, Long)].collect().toMap
    val b = GraphOps.triangles(k4.repartition(16), "s", "t")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("personalizedPageRank: mass conserved, seeds dominate, loud on bad seed") {
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 2L))
      .toDF("s", "t")
    val r = GraphOps.personalizedPageRank(e, "s", "t", seeds = Seq(0L),
        iterations = 5)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"mass ${r.values.sum}")
    // teleportation concentrates rank near the seed: node 0 and its
    // 1-step successor outrank the far side of the cycle
    assert(r(0L) > r(4L) && r(1L) > r(4L), r.toString)
    intercept[IllegalArgumentException] {
      GraphOps.personalizedPageRank(e, "s", "t", seeds = Seq(99L))
    }
  }

  test("neighborJaccard: 4-cycle closed form — opposite corners identical") {
    // a-b-c-d-a: nbrs(a)={b,d}, nbrs(c)={b,d} → jaccard(a,c)=1; adjacent
    // corners share nothing
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")).toDF("s", "t")
    val got = GraphOps.neighborJaccard(cyc, "s", "t")
      .select("u", "v", "common", "jaccard")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map(("a", "c") -> ((2L, 1.0)), ("b", "d") -> ((2L, 1.0))))
  }

  test("neighborJaccard: maxDegree excludes hub centers, keeps true degrees") {
    // star: h—x1..x5 plus x1—x2. Uncapped: all (xi,xj) pairs share h.
    val star = (1 to 5).map(i => ("h", s"x$i")) :+ (("x1", "x2"))
    val df = star.toDF("s", "t")
    val full = GraphOps.neighborJaccard(df, "s", "t")
      .as[(String, String, Long, Double)].collect()
    assert(full.count(r => r._1.startsWith("x") && r._2.startsWith("x")) == 10)
    val capped = GraphOps.neighborJaccard(df, "s", "t", maxDegree = 4)
      .as[(String, String, Long, Double)].collect()
    // hub (deg 5) no longer generates the quadratic xi-xj pairs...
    assert(capped.count(r => r._1.startsWith("x") && r._2.startsWith("x")) == 0)
    // ...but pairs THROUGH low-degree centers survive, with true degrees:
    // center x1 (nbrs h,x2) yields (h,x2): common=1, deg(h)=5, deg(x2)=2
    val hx2 = capped.find(r => r._1 == "h" && r._2 == "x2").get
    assert(hx2._3 == 1L && math.abs(hx2._4 - 1.0 / 6) < 1e-12)
  }

  test("neighborJaccard: direction/dup/self-loop invariance + partitioning") {
    val messy = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("a", "a")).toDF("s", "t")
    val clean = Seq(("a", "b"), ("b", "c")).toDF("s", "t")
    def run(df: org.apache.spark.sql.DataFrame, p: Int) =
      GraphOps.neighborJaccard(df.repartition(p), "s", "t")
        .as[(String, String, Long, Double)].collect().toSet
    assert(run(messy, 1) == run(clean, 8))
  }

  test("kCore: cascade peeling, chain depth, convergence guard") {
    import spark.implicits._
    // 5-clique (ids 0-4, every node degree 4) + pendant chain 4-10-11-12:
    // 2-core = the clique alone after the chain cascades away (3 rounds);
    // nodes 10..12 each peel only after their outer neighbor goes
    val clique = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val chain = Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val edges = (clique ++ chain).toDF("src", "dst")
    val core2 = GraphOps.kCore(edges, "src", "dst", k = 2)
      .as[(Long, Long)].collect().sorted
    assert(core2.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(core2.forall(_._2 == 4L), s"clique degrees: ${core2.toSeq}")
    // k=5 exceeds the clique: empty core, no crash
    assert(GraphOps.kCore(edges, "src", "dst", k = 5).count() == 0L)
    // k=1 keeps everything (after self-loop/dup cleanup)
    val dirty = edges.unionAll(Seq((3L, 3L), (1L, 0L)).toDF("src", "dst"))
    assert(GraphOps.kCore(dirty, "src", "dst", k = 1).count() == 8L)
    // a chain longer than maxIters peels one node per round per side ->
    // must throw loudly, not return a partial core
    val longChain = (0L until 12L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalStateException](
      GraphOps.kCore(longChain, "src", "dst", k = 2, maxIters = 3).count())
  }
}
