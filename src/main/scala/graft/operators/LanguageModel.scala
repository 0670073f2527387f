package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * "perplexity filter" quality signal (Wenzek et al. 2020 score CommonCrawl
  * with a KenLM 5-gram model; the distributed re-expression trains an
  * add-one-smoothed bigram model on the corpus itself and scores each
  * document by its average bigram log-likelihood). Low-likelihood documents
  * are gibberish/boilerplate candidates; the score is threshold-filtered
  * exactly like [[graft.functions.TextFunctions.qualityScore]].
  *
  * Reference anchor: amadeus has no LM surface; this is part of the
  * "beyond the reference" LLM-pipeline block (SURVEY §2 extension).
  *
  * Scale shape (the part that must survive 100 TB):
  *  - bigram generation is NARROW — `transform(sequence(...))` inside
  *    whole-stage codegen, no shuffle;
  *  - model training is two count aggregates with map-side combine: the
  *    (w1,w2) table collapses to vocabulary² (in practice ≪ corpus) before
  *    the exchange, and the history table derives from the *counted*
  *    bigram table, not the corpus;
  *  - scoring joins the corpus bigram stream to the two count tables on
  *    gram keys (Catalyst broadcasts them when they fit — they're
  *    vocabulary-sized) and the vocab-size scalar crosses in as a
  *    broadcast of one row;
  *  - `hashTokens` is the 100 TB switch: project `xxhash64` of the tokens
  *    before any exchange so shuffles move 8-byte longs, not words.
  *    Counts — and therefore scores — are unchanged up to 2⁻⁶⁴-scale
  *    collisions (spec-verified equal on the test corpus).
  */
object LanguageModel {

  /** Per-document average bigram log-likelihood under an add-one-smoothed
    * bigram model trained on `df` itself:
    *
    *   score(doc) = avg over bigrams (w1,w2) of
    *                ln( (c(w1,w2) + 1) / (c_hist(w1) + V) )
    *
    * where c_hist(w1) = Σ_w2 c(w1,w2) (occurrences of w1 as a history)
    * and V = corpus distinct-token count. Documents with fewer than two
    * tokens have no bigrams and are absent from the result (callers
    * left-join and default, as [[duplicateSpanStats]] does for spans).
    *
    * The returned `ll` is floor-rounded to 4 decimals (IEEE-stable
    * half-up, replayable by any engine); `n_bigrams` is the count the
    * average runs over.
    */
  def bigramLogLikelihood(df: DataFrame, idCol: String, textCol: String,
      hashTokens: Boolean = false): DataFrame = {
    def key(c: Column): Column = if (hashTokens) xxhash64(c) else c
    val toks = df.select(col(idCol).as("id"), split(col(textCol), " ").as("t"))
    val bg = toks.select(col("id"),
      explode(when(size(col("t")) >= 2,
        transform(sequence(lit(0), size(col("t")) - 2),
          i => struct(element_at(col("t"), i + 1).as("w1"),
            element_at(col("t"), i + 2).as("w2"))))
        .otherwise(array())).as("b"))
      .select(col("id"), key(col("b.w1")).as("w1"), key(col("b.w2")).as("w2"))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val ch = cb.groupBy(col("w1")).agg(sum(col("cb")).as("ch"))
    val v = toks.select(explode(col("t")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    bg.join(cb, Seq("w1", "w2")).join(ch, Seq("w1")).crossJoin(broadcast(v))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (floor(avg(log((col("cb") + lit(1.0)) / (col("ch") + col("v"))))
          * 10000 + lit(0.5)) / 10000).as("ll"))
      .select(col("id").as(idCol), col("n_bigrams"), col("ll"))
  }
}
