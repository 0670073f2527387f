package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Mutual information between two categorical columns — the column-
    * dependency profiler ("does source determine lang?") that guides
    * stratification and leakage checks before training splits. Returns
    * one row: `(n, n_x, n_y, h_x, h_y, mi)` in nats, with
    * MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) over observed cells and H the
    * marginal entropies (MI ≤ min(H)). Per-cell terms are pico-quantized
    * and summed exactly — order-independent, engine-replayable (p24).
    *
    * Plan: one joint count aggregate (cell-cardinality-sized), margins
    * derived FROM the joint table, total as a broadcast scalar. */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val pico = (c: Column) => floor(c * lit(1e12) + lit(0.5)).cast("long")
    val joint = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("cxy"))
    val mx = joint.groupBy(col("x")).agg(sum(col("cxy")).as("cx"))
    val my = joint.groupBy(col("y")).agg(sum(col("cxy")).as("cy"))
    val tot = joint.agg(sum(col("cxy")).as("n"))
    val miP = joint.join(mx, "x").join(my, "y").crossJoin(broadcast(tot))
      .select(pico(col("cxy").cast("double") / col("n") *
        log(col("cxy").cast("double") * col("n") /
          (col("cx").cast("double") * col("cy")))).as("t"))
      .agg(sum(col("t")).as("smi"))
    def entropyP(m: DataFrame, c: String) = m.crossJoin(broadcast(tot))
      .select(pico(col(c).cast("double") / col("n") *
        log(col("n").cast("double") / col(c))).as("t"))
      .agg(sum(col("t")).as(s"s$c"), count(lit(1)).as(s"n$c"))
    val hx = entropyP(mx, "cx"); val hy = entropyP(my, "cy")
    tot.crossJoin(hx).crossJoin(hy).crossJoin(miP)
      .select(col("n"), col("ncx").as("n_x"), col("ncy").as("n_y"),
        round(col("scx").cast("double") / lit(1e12), 4).as("h_x"),
        round(col("scy").cast("double") / lit(1e12), 4).as("h_y"),
        round(col("smi").cast("double") / lit(1e12), 4).as("mi"))
  }

  /** Zipf rank–frequency fit — OLS of ln(count) on ln(rank) over the
    * top-N vocabulary: slope (≈ −1 for natural language; far shallower
    * for templated/synthetic text — a cheap corpus-health signal next to
    * [[tokenDrift]]), intercept, and R². One vocabulary-sized count
    * aggregate; the rank window sorts only the vocabulary table (and
    * only its top N rows feed the fit). Per-term OLS moments are
    * quantized to integer pico-units and summed exactly — the t27 gate
    * replays the fit term-for-term. */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 200): DataFrame = {
    require(topN >= 3, s"topN=$topN too small for a 2-parameter fit")
    val counts = df.select(explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val ranked = counts
      .withColumn("r", row_number().over(Window.orderBy(col("c").desc, col("tok"))))
      .filter(col("r") <= topN)
    val x = log(col("r").cast("double"))
    val y = log(col("c").cast("double"))
    val pico = (c: Column) => floor(c * lit(1e12) + lit(0.5)).cast("long")
    val d = (c: Column) => c.cast("double") / lit(1e12)
    val agg = ranked
      .select(pico(x).as("px"), pico(y).as("py"), pico(x * y).as("pxy"),
        pico(x * x).as("pxx"), pico(y * y).as("pyy"))
      .agg(count(lit(1)).as("n"), sum(col("px")).as("sx"),
        sum(col("py")).as("sy"), sum(col("pxy")).as("sxy"),
        sum(col("pxx")).as("sxx"), sum(col("pyy")).as("syy"))
    val n = col("n").cast("double")
    val sx = d(col("sx")); val sy = d(col("sy")); val sxy = d(col("sxy"))
    val sxx = d(col("sxx")); val syy = d(col("syy"))
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    agg.select(col("n").as("n_terms"),
      round(cov / varx, 4).as("slope"),
      round((sy - cov / varx * sx) / n, 4).as("intercept"),
      round(cov * cov / (varx * vary), 4).as("r2"))
  }
}
