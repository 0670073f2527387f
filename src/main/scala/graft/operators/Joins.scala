package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins the reference lacks entirely (SURVEY.md §2.2 "joins
  * NOT present: no ... range/as-of joins"), built by composing Spark
  * primitives — tier (a) of the custom-operator preference order: the
  * semantics ARE expressible with built-ins, so no custom SparkPlan is
  * warranted.
  *
  * Scale design:
  *  - asofJoinBackward: ONE shuffle (hash partition by key), then a
  *    per-key sort inside the window — no range fan-out, no n×m pairing.
  *    Hot-key skew is the caveat (windows aren't AQE-split); salt the key
  *    upstream if a single key exceeds an executor.
  *  - rangeJoinBucketed: right rows shuffle once keyed by (key, bucket);
  *    left rows duplicate into at most ceil(range/width)+1 buckets —
  *    bounded fan-out instead of per-key cross products.
  */
object Joins {

  /** Backward as-of join: for each left row, the latest right row of the
    * same key with `rightTime <= leftTime`. Right rows at the exact left
    * timestamp match (DuckDB `ASOF JOIN ... ON r.t <= l.t` semantics);
    * a NULL time on either side never matches (SQL NULL-comparison
    * semantics, identical to the native operator's).
    *
    * @return left columns + `asof` struct column (null when no match)
    *         containing `rightPayload` fields of the matched right row
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightPayload: Seq[String]): DataFrame = {
    val rpay = struct((rightTime +: rightPayload).distinct.map(col): _*)
    val rNorm = right.select(col(key).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"), rpay.as("__rpay"))
    val rpayType = rNorm.schema("__rpay").dataType
    val lNorm = left.select(col(key).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"), struct(left.columns.map(col): _*).as("__lpay"))
      .withColumn("__rpay", lit(null).cast(rpayType))
    val unioned = lNorm.select("__k", "__t", "__side", "__rpay", "__lpay")
      .unionByName(rNorm.withColumn("__lpay",
        lit(null).cast(lNorm.schema("__lpay").dataType))
        .select("__k", "__t", "__side", "__rpay", "__lpay"))
    // right (side 0) sorts before left (side 1) at equal __t, so an
    // exactly-simultaneous right row is visible to the left row
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // SQL `r.t <= l.t` NULL semantics, matching the native AsofJoinExec:
    // a NULL time on either side never matches — the window's null-first
    // ordering would otherwise pair null-time rows with each other
    val rawAsof = last(col("__rpay"), ignoreNulls = true).over(w)
    val asofCol = when(col("__t").isNotNull &&
      rawAsof(rightTime).isNotNull, rawAsof)
    unioned
      .withColumn("asof", asofCol)
      .filter(col("__side") === 1)
      .select(col("__lpay.*"), col("asof"))
  }

  /** Backward as-of join via the native [[graft.plans.AsofJoinExec]]
    * operator — same contract and output schema as [[asofJoinBackward]]
    * (left columns + nullable `asof` struct of rightTime + payload), but
    * planned as a sort-merge pass: each side shuffles and sorts
    * independently instead of sorting the union through one window, and
    * the output keeps the left side's (key, time) partitioning/order for
    * downstream reuse. Requires [[graft.GraftExtensions]] on the session;
    * otherwise self-installs through `spark.experimental.extraStrategies`.
    *
    * Tie/null semantics match asofJoinBackward (see [[graft.plans.AsofJoin]]
    * scaladoc); select the needed columns upstream — the optimizer does
    * not prune through a custom node.
    *
    * pandas `merge_asof` parity knobs (q62/q63/q64 gates):
    * @param direction "backward" (latest right ≤ left time — default),
    *   "forward" (earliest right ≥ left time), or "nearest" (whichever
    *   is closer; ties to backward, null times never win) — all the
    *   same one-pass merge, nearest simply reads both the consumed
    *   backward candidate and the unconsumed forward head.
    * @param tolerance maximum |left − right| time gap for a match, in
    *   the RAW units of the time column (µs for timestamps). A match
    *   outside the bound degrades to the null struct — the feature-store
    *   staleness guard ("use the last price, but never one older than
    *   10 minutes").
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
    import org.apache.spark.sql.types.{StructField, StructType}
    import graft.plans.{AsofJoin, AsofJoinStrategy}
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.sessionState.planner.strategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // self-join safety: re-alias the right side when it shares attribute
    // ids with the left (the analyzer's DeduplicateRelations does not
    // know this node)
    val rPlan: LogicalPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"column '$n' not in [${p.output.map(_.name).mkString(", ")}]"))
    val payloadAttrs = (rightTime +: rightPayload).distinct.map(attr(rPlan, _))
    val structT = StructType(payloadAttrs.map(a => StructField(a.name, a.dataType, a.nullable)))
    val asofAttr = AttributeReference("asof", structT)()
    org.apache.spark.sql.graft.SqlBridge.ofRows(spark,
      AsofJoin(lPlan, rPlan, Seq(attr(lPlan, key)), Seq(attr(rPlan, key)),
        attr(lPlan, leftTime), attr(rPlan, rightTime), payloadAttrs, asofAttr,
        direction, tolerance))
  }

  /** Range join: pairs (l, r) with equal key and
    * `r.time ∈ [l.time - before, l.time + after)`. Bucketed: bounded
    * duplication of left rows, one shuffle of each side.
    *
    * @return left columns + `range_match` struct (inner semantics: only
    *         matching pairs; one output row per pair)
    */
  def rangeJoinBucketed(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, beforeSec: Long, afterSec: Long,
      rightPayload: Seq[String]): DataFrame = {
    val widthSec = math.max(1L, beforeSec + afterSec)
    val rpay = struct((rightTime +: rightPayload).distinct.map(col): _*)
    val r = right.select(col(key).as("__k"),
      floor(unix_timestamp(col(rightTime)) / widthSec).as("__b"),
      col(rightTime).as("__rt"), rpay.as("range_match"))
    val lt = unix_timestamp(col(leftTime))
    val bLo = floor((lt - beforeSec) / widthSec)
    val bHi = floor((lt + afterSec) / widthSec)
    val l = left
      .withColumn("__b", explode(sequence(bLo, bHi)))
      .withColumn("__k", col(key))
    l.join(r, Seq("__k", "__b"))
      .filter(col("__rt") >= col(leftTime) - expr(s"INTERVAL $beforeSec SECOND") &&
        col("__rt") < col(leftTime) + expr(s"INTERVAL $afterSec SECOND"))
      .drop("__k", "__b", "__rt")
  }

  /** Reference implementation of the range join as a plain equi-join +
    * filter (for equivalence testing and small dimensions). */
  def rangeJoinPlain(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, beforeSec: Long, afterSec: Long,
      rightPayload: Seq[String]): DataFrame = {
    val rpay = struct((rightTime +: rightPayload).distinct.map(col): _*)
    val r = right.select(col(key).as("__k"), col(rightTime).as("__rt"),
      rpay.as("range_match"))
    left.join(r, col(key) === col("__k") &&
        col("__rt") >= col(leftTime) - expr(s"INTERVAL $beforeSec SECOND") &&
        col("__rt") < col(leftTime) + expr(s"INTERVAL $afterSec SECOND"))
      .drop("__k", "__rt")
  }

  /** POINT-IN-TIME join against an SCD2 version table — the feature-store
    * correctness primitive: each fact at time t sees the dimension
    * version with `valid_from <= t < valid_to` (open-ended current
    * version matches everything from its valid_from on), and NEVER a
    * later one — the temporal-leakage bug PIT joins exist to prevent.
    * Facts before the key's first version keep null attributes
    * (left_outer), surfaced rather than dropped.
    *
    * Versions of one key are non-overlapping by [[graft.operators
    * .Analytics.scd2]] construction, so each fact matches AT MOST one
    * version — the join cannot fan out. Plan: equi-join on the key
    * (keyed shuffle or broadcast for dimension-sized tables; Catalyst
    * picks) with the interval predicate as a residual filter.
    *
    * @param dim SCD2 frame with `valid_from`/`valid_to` (null = current)
    */
  def pitJoin(facts: DataFrame, dim: DataFrame, key: String,
      factTs: String, dimPayload: Seq[String]): DataFrame = {
    val d = dim.select(col(key).as("__k"), col("valid_from").as("__vf"),
      col("valid_to").as("__vt"),
      struct(dimPayload.map(col): _*).as("pit_match"))
    facts.join(d,
        facts(key) === col("__k") &&
          col(factTs) >= col("__vf") &&
          (col("__vt").isNull || col(factTs) < col("__vt")),
        "left_outer")
      .drop("__k", "__vf", "__vt")
  }
}
