package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval over the document corpus: BM25 lexical scoring and hybrid
  * (lexical + dense) rank fusion — the query side of a training-data /
  * RAG pipeline, sitting on the same corpus statistics as [[graft.functions.TextFunctions]]
  * (TF-IDF, t10) and the ANN surface ([[graft.ann.Ann]]).
  *
  * Reference anchor: amadeus has no retrieval surface; this extends the
  * "beyond the reference" LLM-pipeline block (SURVEY §2 extension) the
  * same way [[LanguageModel]] and [[GraphOps]] do.
  *
  * Spark-first shape, sized for a 100 TB corpus:
  *   - the query set is tiny and BROADCAST; the corpus is scanned ONCE,
  *     narrowly — tokens are filtered to query terms *before* any shuffle,
  *     so every aggregate downstream of the scan is query-vocabulary-sized,
  *     never corpus-vocabulary-sized;
  *   - document length rides the token stream (carried through the tf
  *     groupBy as `first(dl)`) instead of re-joining the corpus;
  *   - corpus-level scalars (N, avgdl) are a one-row broadcast cross join;
  *   - the final per-query top-k is a window over |hits| rows (docs that
  *     share ≥1 term with the query), not over the corpus.
  *
  * Determinism across engines (DuckDB oracle replay): per-term
  * contributions and per-doc sums are floor-rounded to 1e-12 (the
  * repo-wide t11/d12/g01 convention) so FP sum-order differences cannot
  * flip a rank; ranks tie-break on doc id.
  */
object Retrieval {

  /** Floor-round to 12 decimals — quantum four orders above double
    * sum-order noise, identical in DuckDB (`floor(x*1e12+0.5)/1e12`). */
  private def r12(c: Column): Column = floor(c * 1e12 + lit(0.5)) / 1e12

  /** Okapi BM25 top-k per query.
    *
    * score(q, D) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    * with the Lucene-style non-negative idf(t) = ln(1 + (N−df+0.5)/(df+0.5)).
    *
    * @param docs    corpus (idCol: long, textCol: whitespace-tokenized text)
    * @param queries (query_id, term) pairs — small, broadcast
    * @param k       results per query
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(queries.nonEmpty, "queries must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._

    val qTerms = queries.flatMap { case (qid, ts) => ts.distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val termSet = queries.flatMap(_._2).distinct

    val toks = docs.select(col(idCol).as("id"),
        size(split(col(textCol), " ")).as("dl"),
        explode(split(col(textCol), " ")).as("term"))
    // corpus-level scalars: one tiny aggregate, broadcast into every row
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      (sum(size(split(col(textCol), " "))).cast("double") /
        count(lit(1))).as("avgdl"))
    // filter to query terms BEFORE the shuffle: everything wide from here
    // on is query-vocabulary-sized
    val hits = toks.filter(col("term").isin(termSet: _*))
    val tf = hits.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfreq = hits.groupBy(col("term"))
      .agg(count_distinct(col("id")).as("df"))

    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(dfreq), "term")
      .join(broadcast(qTerms), "term")
      .crossJoin(broadcast(stats))
      .groupBy(col("query_id"), col("id").as("doc_id"))
      .agg(r12(sum(r12(contrib))).as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }

  /** nDCG@k of a ranking against a graded relevance column — the standard
    * retrieval-quality metric, closing the loop on [[bm25TopK]] /
    * [[rrfHybridTopK]] (index → retrieve → fuse → EVALUATE).
    *
    * DCG@k = Σ_{i≤k} rel_i / log2(i+1) over the ranking's order; IDCG@k
    * is the same sum over the top-k relevances of the FULL candidate
    * pool (`rels`), so a ranking that misses a high-relevance doc is
    * penalized. nDCG = DCG/IDCG (0 when IDCG = 0).
    *
    * Inputs: `ranked` (query_id, rk, doc_id) — the per-query ranking;
    * `rels` (query_id, doc_id, rel) — graded relevance over the pool.
    * Shuffles are ranking-sized + one per-query window over the pool for
    * the ideal ordering; per-position terms are floor-rounded at 1e-12
    * (repo convention) so engine sum order cannot move the metric.
    */
  def ndcgAtK(ranked: DataFrame, rels: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    def gain(relC: Column, posC: Column): Column =
      r12(relC.cast("double") / (log(posC.cast("double") + 1.0) / log(lit(2.0))))
    val dcg = ranked.filter(col("rk") <= k)
      .join(rels, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"),
        gain(coalesce(col("rel"), lit(0)), col("rk")).as("g"))
      .groupBy(col("query_id")).agg(r12(sum(col("g"))).as("dcg"))
    val ideal = rels
      .withColumn("irk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("rel").desc, col("doc_id"))))
      .filter(col("irk") <= k && col("rel") > 0)
      .select(col("query_id"), gain(col("rel"), col("irk")).as("g"))
      .groupBy(col("query_id")).agg(r12(sum(col("g"))).as("idcg"))
    dcg.join(ideal, Seq("query_id"), "left")
      .select(col("query_id"),
        round(when(coalesce(col("idcg"), lit(0.0)) === 0.0, 0.0)
          .otherwise(r12(col("dcg") / col("idcg"))), 6).as("ndcg"))
  }

  /** Mean-reciprocal-rank + recall@k evaluation per query: rr = 1/rank
    * of the FIRST relevant (rel > 0) result in the top-k (0 when none),
    * recall@k = relevant retrieved / total relevant in the pool. The
    * companions to [[ndcgAtK]] — together the standard retrieval-eval
    * triple. Shapes: one join of the (top-k) ranking to the relevance
    * pool plus one pool-side aggregate, both keyed by query — eval cost
    * scales with |queries|·k, never the corpus. */
  def rrAndRecallAtK(ranked: DataFrame, rels: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val hits = ranked.filter(col("rk") <= k)
      .join(rels.filter(col("rel") > 0), Seq("query_id", "doc_id"))
    val perQ = hits.groupBy(col("query_id"))
      .agg(min(col("rk")).as("first_rel_rk"), count(lit(1)).as("n_retrieved"))
    val pool = rels.filter(col("rel") > 0)
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_relevant"))
    pool.join(perQ, Seq("query_id"), "left")
      .select(col("query_id"),
        round(coalesce(lit(1.0) / col("first_rel_rk"), lit(0.0)), 6).as("rr"),
        round(coalesce(col("n_retrieved"), lit(0L)).cast("double") /
          col("n_relevant"), 6).as("recall_at_k"))
  }

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009):
    * a lexical ranking (token-set Jaccard to the query document) and a
    * dense ranking (embedding cosine) are fused as
    * Σ 1/(c + rank), c = 60 — the standard fusion behind hybrid
    * BM25+vector search.
    *
    * Queries are corpus rows selected by `querySelector` (their own text
    * and embedding become the query); candidates are all other rows. The
    * exact form scores |queries|·|corpus| pairs — at 100 TB the candidate
    * set per ranker is first pruned (LSH buckets for lexical
    * ([[graft.dedup.Dedup.minhashLshPairs]]), IVF cells for dense
    * ([[graft.ann.Ann.ivfTopK]])); RRF only ever sees the per-ranker
    * top lists, so the fusion itself is query-count-sized at any scale.
    *
    * @param corpus (idCol, textCol, vecCol) — documents joined with their
    *               embeddings
    */
  def rrfHybridTopK(corpus: DataFrame, idCol: String, textCol: String,
      vecCol: String, querySelector: Column, k: Int,
      c: Int = 60): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tokSet = array_distinct(split(col(textCol), " "))
    val base = corpus.select(col(idCol).as("id"), tokSet.as("toks"),
      col(vecCol).as("vec"))
    val q = base.filter(querySelector)
      .select(col("id").as("query_id"), col("toks").as("q_toks"),
        col("vec").as("q_vec"))
    val cand = base.join(broadcast(q), col("id") =!= col("query_id"))

    val inter = size(array_intersect(col("toks"), col("q_toks"))).cast("double")
    val union = (size(col("toks")) + size(col("q_toks"))).cast("double") -
      size(array_intersect(col("toks"), col("q_toks")))
    val scored = cand.select(col("query_id"), col("id"),
      (inter / union).as("jacc"),
      graft.ann.Ann.cosine(col("vec"), col("q_vec")).as("cos"))

    val byQ = Window.partitionBy(col("query_id"))
    val lexRank = row_number().over(byQ.orderBy(col("jacc").desc, col("id")))
    val denseRank = row_number().over(byQ.orderBy(col("cos").desc, col("id")))
    val fused = scored
      .withColumn("r_lex", lexRank)
      .withColumn("r_dense", denseRank)
      .withColumn("rrf",
        r12(lit(1.0) / (lit(c) + col("r_lex")) +
            lit(1.0) / (lit(c) + col("r_dense"))))
    fused
      .withColumn("rk", row_number().over(
        byQ.orderBy(col("rrf").desc, col("id"))))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("id").as("doc_id"),
        round(col("rrf"), 6).as("rrf"), col("r_lex"), col("r_dense"))
  }
}
