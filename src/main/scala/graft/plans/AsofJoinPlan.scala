package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Backward as-of join as a first-class operator — tier (c) of the
  * custom-operator preference order: logical node + planner strategy +
  * physical `SparkPlan`, registered through `SparkSessionExtensions`
  * ([[graft.GraftExtensions]]).
  *
  * The reference engine has no as-of join at all (SURVEY.md §2.2); Spark
  * itself only reaches the semantics via the pandas-on-Spark
  * `RewriteAsOfJoin` optimizer rule, which expands to an inner join
  * producing EVERY (left, right-earlier) candidate pair and then a
  * `min_by` aggregate — per-key quadratic intermediate, a 100 TB cliff
  * when keys repeat often. The composed alternative in
  * `graft.operators.Joins.asofJoinBackward` (union + running `last()`
  * window) is linear but sorts the CONCATENATION of both inputs in one
  * window and carries every left row through the window state.
  *
  * This operator instead plans like a sort-merge join:
  *
  *  - each side is hash-partitioned on the key and sorted by
  *    (key, time) INDEPENDENTLY — two smaller, spillable external sorts
  *    instead of one sort of the union;
  *  - one streaming merge pass per partition holds exactly ONE candidate
  *    right row in memory (the latest with `r.time <= l.time`), emitting
  *    each left row once — no candidate-pair blow-up, no window buffer;
  *  - output preserves the left side's partitioning and (key, time)
  *    order, so a downstream per-key aggregate or window reuses the
  *    exchange (`outputPartitioning`/`outputOrdering` are declared).
  *
  * Semantics (DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND r.t <= l.t`):
  * left-outer; equal instants match; among equal right times the
  * sort-order-last wins (unspecified tie, same as the window twin); null
  * keys group together (window-partitionBy semantics, NOT SQL equality);
  * null right times sort first and thus never beat a real match.
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightPayload: Seq[Attribute],
    asofAttr: AttributeReference)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ asofAttr

  override def producedAttributes: AttributeSet = AttributeSet(asofAttr :: Nil)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] into [[AsofJoinExec]]; injected via
  * `ext.injectPlannerStrategy` (and `spark.experimental.extraStrategies`
  * as the no-extensions fallback in `Joins.asofJoinNative`). */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, payload, attr) =>
      AsofJoinExec(lk, rk, lt, rt, payload, attr, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge backward as-of join. Children are required hash-clustered
  * on the join keys and sorted by (keys, time); `EnsureRequirements`
  * inserts the exchanges/sorts (and AQE may satisfy them from reused
  * stages). The merge is a single forward pass over both sorted streams:
  * right rows are consumed at most once across the whole partition, and
  * only the current candidate (projected to the payload struct, not the
  * full row) is retained.
  */
case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightPayload: Seq[Attribute],
    asofAttr: AttributeReference,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofAttr

  override def producedAttributes: AttributeSet = AttributeSet(asofAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    // locals only — the closure must not capture the SparkPlan
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val payload = rightPayload
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
      val structProj = UnsafeProjection.create(Seq(CreateStruct(payload)), rOut)
      val resultProj = UnsafeProjection.create(out, lOut :+ (asofAttr: Attribute))
      val joined = new JoinedRow
      val nullStruct = new GenericInternalRow(1)
      val rBuf = rIter.buffered
      var candKey: UnsafeRow = null
      var candStruct: UnsafeRow = null
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTs = lTimeProj(lRow)
        var frontier = true
        while (frontier && rBuf.hasNext) {
          val rRow = rBuf.head
          val kc = keyOrd.compare(rKeyProj(rRow), lKey)
          if (kc < 0) {
            rBuf.next() // key already passed by the left stream: discard
          } else if (kc == 0 && timeOrd.compare(rTimeProj(rRow), lTs) <= 0) {
            // newest right row so far for this key at or before lTs
            candKey = rKeyProj(rRow).copy()
            candStruct = structProj(rRow).copy()
            rBuf.next()
          } else frontier = false
        }
        val matched = candKey != null && keyOrd.compare(candKey, lKey) == 0
        if (matched) numMatched += 1
        numOutputRows += 1
        resultProj(joined(lRow, if (matched) candStruct else nullStruct))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
