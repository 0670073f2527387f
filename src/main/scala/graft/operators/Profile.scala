package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass table profiling — the "what is in this table" primitive of
  * data exploration and ingest QA: per column, row/null/distinct counts
  * and the value range, as ONE long-format frame `(col_name, n_rows,
  * n_null, n_distinct, min_value, max_value)`.
  *
  * Shape at scale: ONE aggregate over one scan. The multi-column
  * DISTINCT aggregates compile to Catalyst's Expand strategy (row
  * fan-out = #profiled columns, partial-aggregated map-side before the
  * single exchange), and the wide 1-row result is unpivoted driver-free
  * with `stack`. For corpora where exact per-column distincts are too
  * hot, [[profileApprox]] swaps in HLL estimates — same single-scan
  * plan, no Expand, constant memory (the u15 gate hash-verifies the
  * exact form against DuckDB; the approx twin carries the usual ±3σ
  * spec).
  */
object Profile {

  private def esc(s: String) = "`" + s.replace("`", "``") + "`"

  /** Column names flow into a `stack(...)` selectExpr as string
    * literals; quotes would silently corrupt the generated SQL, so
    * refuse them up front (backticks are escaped, quotes are not
    * representable in a Spark SQL single-quoted literal portably). */
  private def checkNames(cols: Seq[String]): Unit =
    cols.foreach(c => require(!c.contains("'") && !c.contains("\\"),
      s"profile: column name '$c' contains a quote/backslash"))

  /** Shared body — [[profile]] and [[profileApprox]] differ ONLY in the
    * distinct aggregate, so they stay schema-identical twins. */
  private def profileWith(df: DataFrame, cols: Seq[String],
      distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    checkNames(cols)
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        distinctAgg(c).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', ${esc(s"${c}__nn")}, ${esc(s"${c}__nd")}, " +
        s"${esc(s"${c}__min")}, ${esc(s"${c}__max")}"
    }.mkString(", ")
    wide.selectExpr("__n",
        s"stack(${cols.size}, $stackArgs) AS (col_name, __nn, n_distinct, min_value, max_value)")
      .select(col("col_name"), col("__n").as("n_rows"),
        (col("__n") - col("__nn")).as("n_null"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(col(c)))

  /** [[profile]] with HLL++ distinct estimates (5% rsd — the standard
    * profiling accuracy; a tighter rsd inflates the per-column register
    * buffer quadratically and with it the partial-agg row) — no Expand
    * fan-out, constant memory per column; the scale form. */
  def profileApprox(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), 0.05))
}
