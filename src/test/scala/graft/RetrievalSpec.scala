package graft

import graft.operators.Retrieval
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 + RRF hybrid retrieval: hand-computed goldens on a tiny corpus,
  * ranking properties, and the query-sized-shuffle plan claim. */
class RetrievalSpec extends AnyFunSuite with CacheHygiene {

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  import spark.implicits._

  // 4 docs, dl = 2/2/4/2, avgdl = 2.5
  def corpus = Seq(
    (0L, "cat dog"),
    (1L, "cat cat"),
    (2L, "dog fish bird fish"),
    (3L, "bird bird")).toDF("doc_id", "text")

  test("bm25: hand-computed golden (tf saturation, idf, length norm)") {
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq(0L -> Seq("cat")), k = 4)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // cat: df=2, N=4 -> idf = ln(1 + 2.5/2.5) = ln 2
    val idf = math.log(2.0)
    def s(tf: Int, dl: Int): Double = {
      val raw = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 2.5))
      val r = math.floor(raw * 1e12 + 0.5) / 1e12 // per-term == sum for 1 term
      BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.keySet == Set(0L, 1L)) // only docs containing 'cat'
    assert(math.abs(got(1L) - s(2, 2)) < 1e-9) // tf=2 beats tf=1 at same dl
    assert(math.abs(got(0L) - s(1, 2)) < 1e-9)
    assert(got(1L) > got(0L))
  }

  test("bm25: longer docs are penalized at equal tf") {
    val docs = Seq((0L, "cat dog"), (1L, "cat dog bird fish fish fish"))
      .toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq(0L -> Seq("cat")), k = 2)
      .select("doc_id", "rk").as[(Long, Int)].collect().toMap
    assert(got(0L) == 1 && got(1L) == 2)
  }

  test("bm25: rarer terms dominate (idf ordering)") {
    // 'rare' in 1 of 4 docs, 'common' in 3 of 4 — doc matching only
    // 'rare' must outrank doc matching only 'common' at equal tf/dl
    val docs = Seq((0L, "rare pad"), (1L, "common pad"),
      (2L, "common x"), (3L, "common y")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq(0L -> Seq("rare", "common")), k = 4)
      .filter(col("doc_id").isin(0L, 1L))
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(got(0L) > got(1L))
  }

  test("bm25: multi-query isolation and k cap") {
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq(0L -> Seq("cat"), 1L -> Seq("bird")), k = 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 1L -> 3L))
  }

  test("bm25: corpus aggregates are query-term-sized (filter under the agg)") {
    // the token stream must be filtered to query terms BEFORE the
    // tf/df shuffles — assert the filter sits below every aggregate
    val plan = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq(0L -> Seq("cat")), k = 2).queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    def aggsHaveFilterBelow(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
      p.foreach {
        case a: Aggregate if a.toString.contains("explode") =>
          assert(a.collectFirst {
            case f: Filter if f.condition.toString.contains("IN") ||
              f.condition.toString.contains("cat") => f
          }.nonEmpty, s"token aggregate not pruned to query terms:\n$a")
        case _ => ()
      }
    aggsHaveFilterBelow(plan)
  }

  test("bm25: partition-layout independence") {
    val a = Retrieval.bm25TopK(corpus.repartition(1), "doc_id", "text",
      Seq(0L -> Seq("cat", "dog")), k = 4)
      .select("doc_id", "rk").as[(Long, Int)].collect().toMap
    val b = Retrieval.bm25TopK(corpus.repartition(16), "doc_id", "text",
      Seq(0L -> Seq("cat", "dog")), k = 4)
      .select("doc_id", "rk").as[(Long, Int)].collect().toMap
    assert(a == b && a.nonEmpty)
  }

  // hybrid: 1 query doc + 4 candidates where lexical and dense disagree
  def hybridCorpus = Seq(
    // (id, text, vec): doc 0 is the query
    (0L, "a b c d", Array(1f, 0f)),
    (1L, "a b c x", Array(0f, 1f)),  // lexical best (3/5), dense worst
    (2L, "x y z w", Array(1f, 0.1f)), // dense best (cos~1), lexical worst
    (3L, "a b x y", Array(0.5f, 0.5f)), // middle on both
    (4L, "a x y z", Array(0.6f, 0.45f))).toDF("id", "text", "vec")

  test("rrf: fuses disagreeing rankers; convexity favors a strong best rank") {
    val got = Retrieval.rrfHybridTopK(hybridCorpus, "id", "text", "vec",
        querySelector = col("id") === 0, k = 4)
      .select("doc_id", "rk", "r_lex", "r_dense")
      .as[(Long, Int, Int, Int)].collect()
      .map { case (d, rk, rl, rd) => d -> (rk, rl, rd) }.toMap
    // lexical: jacc 1=3/5 > 3=2/6 > 4=1/7 > 2=0
    assert(got(1L)._2 == 1 && got(2L)._2 == 4)
    // dense: cos 2 > 4 > 3 > 1
    assert(got(2L)._3 == 1 && got(1L)._3 == 4)
    // fusion: 1/(60+r) is convex, so the (1,4) pairs 1 and 2 score
    // 1/61+1/64 ≈ .032018, ABOVE the (2,3) pairs 3 and 4 at
    // 1/62+1/63 ≈ .032002; each pair ties internally, broken by id
    assert(got(1L)._1 == 1 && got(2L)._1 == 2)
    assert(got(3L)._1 == 3 && got(4L)._1 == 4)
  }

  test("rrf: query doc excluded from its own candidates") {
    val ids = Retrieval.rrfHybridTopK(hybridCorpus, "id", "text", "vec",
        querySelector = col("id") === 0, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(0L) && ids == Set(1L, 2L, 3L, 4L))
  }

  test("ndcg: perfect ranking scores 1, reversal scores the closed form") {
    val rels = Seq((0L, 10L, 3), (0L, 11L, 2), (0L, 12L, 1))
      .toDF("query_id", "doc_id", "rel")
    val perfect = Seq((0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L))
      .toDF("query_id", "rk", "doc_id")
    val reversed = Seq((0L, 1, 12L), (0L, 2, 11L), (0L, 3, 10L))
      .toDF("query_id", "rk", "doc_id")
    def ndcg(r: org.apache.spark.sql.DataFrame): Double =
      Retrieval.ndcgAtK(r, rels, 3).select("ndcg").as[Double].head()
    assert(ndcg(perfect) == 1.0)
    def d(rel: Int, pos: Int): Double = {
      val raw = rel / (math.log(pos + 1.0) / math.log(2.0))
      math.floor(raw * 1e12 + 0.5) / 1e12
    }
    def r12d(x: Double): Double = math.floor(x * 1e12 + 0.5) / 1e12
    val expect = BigDecimal(r12d(r12d(d(1, 1) + d(2, 2) + d(3, 3)) /
        r12d(d(3, 1) + d(2, 2) + d(1, 3))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(ndcg(reversed) - expect) < 1e-12)
  }

  test("ndcg: missing a high-relevance pool doc is penalized; zero pool -> 0") {
    val rels = Seq((0L, 10L, 3), (0L, 11L, 1), (1L, 20L, 0))
      .toDF("query_id", "doc_id", "rel")
    // ranking for q0 misses doc 10 entirely; q1's pool has no relevance
    val ranked = Seq((0L, 1, 11L), (0L, 2, 99L), (1L, 1, 20L))
      .toDF("query_id", "rk", "doc_id")
    val got = Retrieval.ndcgAtK(ranked, rels, 2)
      .as[(Long, Double)].collect().toMap
    assert(got(0L) > 0 && got(0L) < 0.5, s"missed top doc should halve nDCG, got ${got(0L)}")
    assert(got(1L) == 0.0)
  }

  test("rrAndRecallAtK: closed-form ranks, missing hits, pool recall") {
    val ranked = Seq(
      (0L, 1, 10L), (0L, 2, 11L), (0L, 3, 12L),  // q0: relevant at rank 1
      (1L, 1, 20L), (1L, 2, 21L), (1L, 3, 22L),  // q1: first relevant rank 3
      (2L, 1, 30L))                              // q2: nothing relevant
      .toDF("query_id", "rk", "doc_id")
    val rels = Seq(
      (0L, 10L, 2), (0L, 12L, 1),     // pool q0: 2 relevant, both in top-3
      (1L, 22L, 1), (1L, 99L, 3),     // pool q1: 2 relevant, 1 retrieved
      (2L, 98L, 1),                   // pool q2: 1 relevant, 0 retrieved
      (1L, 21L, 0))                   // rel=0 is NOT relevant
      .toDF("query_id", "doc_id", "rel")
    val got = graft.operators.Retrieval.rrAndRecallAtK(ranked, rels, k = 3)
      .as[(Long, Double, Double)].collect()
      .map { case (q, rr, rc) => q -> ((rr, rc)) }.toMap
    assert(got == Map(
      0L -> ((1.0, 1.0)), 1L -> ((0.333333, 0.5)), 2L -> ((0.0, 0.0))))
  }

  test("rrf: partition-layout independence") {
    val a = Retrieval.rrfHybridTopK(hybridCorpus.repartition(1), "id", "text",
      "vec", col("id") === 0, k = 4)
      .select("doc_id", "rk").as[(Long, Int)].collect().toMap
    val b = Retrieval.rrfHybridTopK(hybridCorpus.repartition(16), "id", "text",
      "vec", col("id") === 0, k = 4)
      .select("doc_id", "rk").as[(Long, Int)].collect().toMap
    assert(a == b && a.size == 4)
  }
}
