package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (expectations) compiled into ONE
  * aggregate pass — the Deequ/Great-Expectations capability a corpus
  * pipeline needs for schema-drift and contract enforcement, expressed
  * Spark-first.
  *
  * Every row-level check is a boolean Column; `run` folds all of them
  * into a single `agg` (conditional sums), so N checks over 100 TB cost
  * one scan and one partial→final aggregation — adding a check is free.
  * Uniqueness cannot be a row predicate; it rides the same pass as
  * `count(*) - approx/exact distinct` terms. Output is long-form
  * `(check, violations, n_rows)` so downstream alerting can threshold per
  * check.
  *
  * The reference has no data-quality surface (north-star extension);
  * the single-pass folding mirrors how its tuple sinks fuse multiple
  * aggregations into one traversal (amadeus-core/src/pipe.rs tuple
  * impls) — here Catalyst does the fusing.
  */
object Checks {

  /** A named row-level expectation: `holds` must be true for every row;
    * null counts as a violation unless the check itself handles null. */
  final case class Check(name: String, holds: Column)

  def notNull(c: String): Check =
    Check(s"${c}_not_null", col(c).isNotNull)

  /** Inclusive numeric range; nulls violate (range implies presence). */
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"${c}_in_range", col(c).isNotNull && col(c) >= lo && col(c) <= hi)

  /** Value in an allowed set; nulls violate. */
  def inSet(c: String, allowed: Seq[String]): Check =
    Check(s"${c}_in_set", col(c).isin(allowed: _*))

  /** Full-match against a regex; nulls violate. */
  def matches(c: String, regex: String): Check =
    Check(s"${c}_matches", col(c).rlike(regex))

  /** Column-length bound for strings (e.g. doc length contracts). */
  def maxLength(c: String, n: Int): Check =
    Check(s"${c}_max_len", col(c).isNotNull && length(col(c)) <= n)

  /** Run row checks + key-uniqueness checks in ONE aggregate pass over
    * `df`. For each row check the violation count is a conditional sum;
    * for each uniqueness check it is `count(*) - count(distinct key)`
    * (0 ⇔ key unique; `count(distinct)` ignores NULL in both Spark and
    * SQL, so null keys count toward the tally — pair with [[notNull]]
    * to attribute them separately). Returns long-form
    * (check, violations, n_rows). */
  def run(df: DataFrame, checks: Seq[Check],
      uniqueKeys: Seq[String] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueKeys.nonEmpty, "no checks given")
    val rowAggs = checks.map(k =>
      sum(when(!coalesce(k.holds, lit(false)), 1L).otherwise(0L)).as(k.name))
    val uniqAggs = uniqueKeys.map(c =>
      (count(lit(1)) - countDistinct(col(c))).as(s"${c}_unique"))
    val total = count(lit(1)).as("__rows")
    val aggs = rowAggs ++ uniqAggs :+ total
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val names = checks.map(_.name) ++ uniqueKeys.map(c => s"${c}_unique")
    val stacked = names.map(n => s"'$n', `$n`").mkString(", ")
    wide.selectExpr(
        s"stack(${names.size}, $stacked) AS (check, violations)",
        "__rows AS n_rows")
      .select(col("check"), col("violations"), col("n_rows"))
  }

  /** Attrition funnel: for an ordered pipeline of filter stages, report
    * how many rows survive each CUMULATIVE prefix of stages — the
    * per-stage yield report every curation run publishes ("started 100 TB,
    * language-ID kept 61%, quality kept 43%, dedup kept 38%…").
    *
    * The naive form runs the pipeline N times (once per prefix); this
    * folds all N survival counts into ONE aggregate pass — each stage's
    * survivors are a conditional sum over the AND of its prefix, so the
    * whole funnel costs one scan at any corpus size, same as [[run]].
    * Output rows are ordered by pipeline position: (stage_idx, stage,
    * n_in, n_kept) where n_in is the previous stage's n_kept (the corpus
    * size for stage 1).
    */
  def attritionFunnel(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "no stages given")
    val cum = stages.scanLeft(lit(true)) { case (acc, (_, p)) =>
      acc && coalesce(p, lit(false))
    }.tail
    val aggs = count(lit(1)).as("__n0") +:
      cum.zipWithIndex.map { case (p, i) =>
        sum(when(p, 1L).otherwise(0L)).as(s"__n${i + 1}")
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = stages.zipWithIndex.map { case ((name, _), i) =>
      s"${i + 1}L, '$name', coalesce(`__n$i`, 0L), coalesce(`__n${i + 1}`, 0L)"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${stages.size}, $stacked) AS (stage_idx, stage, n_in, n_kept)")
  }

  /** Poisson(1) cumulative cutoffs for the bootstrap inverse-CDF draw.
    * Inlined literals (not computed at runtime) so any replaying engine
    * can use the exact same doubles. */
  private val poissonCdf1: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253)

  /** Poisson bootstrap confidence interval for a per-group mean — the
    * standard way to put error bars on corpus metrics WITHOUT a second
    * pass or a fixed-n resample: each row enters replica b with weight
    * ~ Poisson(1) (the large-n limit of sampling n-of-n with
    * replacement), drawn deterministically from md5(id, b, salt) via the
    * inverse CDF, so the whole computation is a pure function of the
    * data — re-runs and external replays agree bit-for-bit.
    *
    * `valueCol` must be an integer column: replica sums are then exact
    * longs and each replica mean is ONE double division — no
    * order-dependent float accumulation anywhere.
    *
    * CI bounds are explicit order statistics of the `replicas` means
    * (rank floor(B·α/2)+1 and B−floor(B·α/2), ties broken by replica
    * id) — a deterministic empirical interval, not an interpolating
    * percentile estimator.
    *
    * Scale: the explode multiplies the scan by B before the group×replica
    * aggregate (map-side combined, `groups·B` rows after). For 100 TB
    * metrics run B ≤ ~50, or bootstrap a stratified subsample ("bag of
    * little bootstraps", Kleiner et al. 2014) — the operator composes
    * with [[graft.operators.Splits]] samplers for exactly that.
    */
  def bootstrapMeanCI(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, replicas: Int = 40, alpha: Double = 0.05,
      salt: String = "boot"): DataFrame = {
    require(replicas >= 4, s"replicas=$replicas too few for a CI")
    require(alpha > 0 && alpha < 1, s"alpha=$alpha outside (0,1)")
    // integral metric enforced at build time: a silent cast("long") on a
    // double column would truncate values instead of failing loudly
    val vType = df.schema(valueCol).dataType
    require(Seq("long", "int", "integer", "short", "byte", "bigint")
      .contains(vType.typeName) || vType.typeName.startsWith("decimal"),
      s"bootstrapMeanCI needs an integer valueCol for exact replica sums; " +
        s"$valueCol is ${vType.typeName} — pre-round to integer units (cents)")
    import org.apache.spark.sql.expressions.Window
    // built against the post-rename columns ("id", "b") below
    val u = Splits.mdUniform(
      concat(col("id").cast("string"), lit("#"), col("b").cast("string")),
      salt)
    val w = poissonCdf1.zipWithIndex
      .foldRight(lit(poissonCdf1.size): Column) { case ((c, k), rest) =>
        when(col("u") < lit(c), lit(k)).otherwise(rest)
      }
    val rep = df
      .select(col(groupCol).as("grp"), col(idCol).as("id"),
        col(valueCol).cast("long").as("v"))
      .select(col("grp"), col("id"), col("v"),
        explode(sequence(lit(0), lit(replicas - 1))).as("b"))
      .withColumn("u", u)
      .withColumn("w", w.cast("long"))
    val means = rep.groupBy(col("grp"), col("b"))
      .agg(sum(col("w") * col("v")).as("swv"), sum(col("w")).as("sw"))
      .withColumn("mean_b",
        when(col("sw") > 0, col("swv").cast("double") / col("sw")))
    val rk = Window.partitionBy(col("grp")).orderBy(col("mean_b"), col("b"))
    val loIdx = math.floor(replicas * alpha / 2).toInt + 1
    val hiIdx = replicas - math.floor(replicas * alpha / 2).toInt
    val bounds = means.withColumn("rn", row_number().over(rk))
      .groupBy(col("grp")).agg(
        max(when(col("rn") === loIdx, col("mean_b"))).as("ci_lo"),
        max(when(col("rn") === hiIdx, col("mean_b"))).as("ci_hi"))
    val point = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        (sum(col(valueCol).cast("long")).cast("double") / count(lit(1)))
          .as("mean"))
    point.join(bounds, "grp")
      .select(col("grp").as(groupCol), col("n"), col("mean"),
        col("ci_lo"), col("ci_hi"))
  }

  /** Benford first-significant-digit profile — the forensic data-quality
    * check for "naturally grown" monetary/size columns (fabricated or
    * truncated feeds drift from log10(1+1/d); flag before training on
    * the batch). The digit is taken from the CENTS integer's decimal
    * string — exact, engine-identical (a log10-based digit flips at
    * power-of-ten boundaries on libm ulps). Non-positive values are
    * excluded (Benford is defined on positive magnitudes).
    *
    * One map-side-combined 9-bucket aggregate; nothing driver-sized.
    * Returns per digit 1..9: `n`, observed frequency, Benford
    * expectation (4dp), and the χ² contribution `(n−e)²/e` (4dp) so a
    * caller can threshold the total. */
  def benfordProfile(df: DataFrame, valueCol: String): DataFrame = {
    val cents = floor(col(valueCol) * 100 + lit(0.5)).cast("long")
    val digits = df.select(cents.as("cents")).filter(col("cents") > 0)
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = digits.agg(sum(col("n")).as("total"))
    digits.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total"), 4).as("obs_p"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 4).as("benford_p"),
        round(pow(col("n").cast("double")
            - col("total") * log10(lit(1.0) + lit(1.0) / col("digit")), 2)
          / (col("total") * log10(lit(1.0) + lit(1.0) / col("digit"))), 4)
          .as("chi2_part"))
      .orderBy(col("digit"))
  }
}
