package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus distribution drift — KL and Jensen–Shannon divergence between
  * two snapshots' token (or category) distributions. The monitoring
  * number a training-data pipeline alerts on: "this week's crawl no
  * longer looks like last week's" before a model gets trained on it.
  *
  * Estimator: add-one smoothing over the JOINT vocabulary, so both
  * distributions are strictly positive on the same support and
  * KL(P‖Q) = Σ p·ln(p/q) is finite in both directions;
  * JS = ½·KL(P‖M) + ½·KL(Q‖M) with M = (P+Q)/2 — symmetric, bounded by
  * ln 2.
  *
  * Determinism: per-term contributions are quantized to integer
  * PICO-nats (⌊x·10¹² + 0.5⌋ as BIGINT) and summed exactly, so the
  * reduction is order-independent — same value on any partitioning, any
  * engine (the t26 oracle replays it term-for-term in DuckDB; a last-ulp
  * `ln` difference moves one pico-unit, 8 orders below the rounded
  * output).
  *
  * 100 TB plan: two vocabulary-sized count aggregates (map-side
  * combined), one full-outer join of the count tables, totals as
  * broadcast scalars, one final exact-integer aggregate. No corpus-sized
  * shuffle; the token explode is narrow.
  */
object Drift {

  /** Per-term pico-nat contribution of `p·ln(p/q)`. */
  private def picoKl(p: org.apache.spark.sql.Column,
      q: org.apache.spark.sql.Column) =
    floor(p * log(p / q) * lit(1e12) + lit(0.5)).cast("long")

  /** One-row drift summary between token distributions of `a` and `b`:
    * `(n_tokens_a, n_tokens_b, vocab, kl_ab, kl_ba, js)` (nats, 4dp).
    * Tokens are whitespace-split from `textCol`. */
  def tokenDrift(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    val toks = (df: DataFrame) => df
      .select(explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    categoryDriftFromCounts(toks(a), toks(b))
  }

  /** Drift between two categorical distributions given as count tables
    * `(tok, c)`. Exposed separately so callers can drift over sources,
    * languages, URL domains, … without re-tokenizing. */
  def categoryDriftFromCounts(ca: DataFrame, cb: DataFrame): DataFrame = {
    val j = ca.select(col("tok"), col("c").as("ca"))
      .join(cb.select(col("tok"), col("c").as("cb")), Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = j.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    val p = (col("ca") + lit(1L)).cast("double") /
      (col("na") + col("v")).cast("double")
    val q = (col("cb") + lit(1L)).cast("double") /
      (col("nb") + col("v")).cast("double")
    val m = (p + q) / lit(2.0)
    j.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"), col("v"),
        picoKl(p, q).as("kab"), picoKl(q, p).as("kba"),
        (picoKl(p, m) + picoKl(q, m)).as("kjs2"))
      .groupBy(col("na"), col("nb"), col("v"))
      .agg(sum(col("kab")).as("sab"), sum(col("kba")).as("sba"),
        sum(col("kjs2")).as("sjs2"))
      .select(col("na").as("n_tokens_a"), col("nb").as("n_tokens_b"),
        col("v").as("vocab"),
        round(col("sab").cast("double") / lit(1e12), 4).as("kl_ab"),
        round(col("sba").cast("double") / lit(1e12), 4).as("kl_ba"),
        round(col("sjs2").cast("double") / lit(2e12), 4).as("js"))
  }
}
