package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** As-of join (backward / forward / nearest, optional tolerance) as a
  * first-class operator — tier (c) of the
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
  * a NULL TIME on either side never matches, in every direction — SQL
  * comparison semantics, where `r.t <= l.t` over a NULL yields NULL
  * (null-time right rows are still consumed by the merge in time-sort
  * order, they just cannot become the reported match).
  */
case class AsofJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightPayload: Seq[Attribute],
    asofAttr: AttributeReference,
    direction: String = "backward",
    tolerance: Option[Long] = None)
  extends BinaryNode {

  require(direction == "backward" || direction == "forward" ||
    direction == "nearest",
    s"asof direction '$direction' (want backward|forward|nearest)")
  require(tolerance.forall(_ > 0), s"asof tolerance must be positive")

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
    case AsofJoin(l, r, lk, rk, lt, rt, payload, attr, dir, tol) =>
      AsofJoinExec(lk, rk, lt, rt, payload, attr,
        planLater(l), planLater(r), dir, tol) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join (all three directions share the single
  * forward merge pass — see doExecute). Children are required hash-clustered
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
    right: SparkPlan,
    direction: String = "backward",
    tolerance: Option[Long] = None)
  extends BinaryExecNode {

  // the merge compares left and right times with ONE ordering (and the
  // tolerance/nearest arithmetic with one unit), so the axes must be the
  // SAME type — a DateType-vs-TimestampType pair would compare days
  // against micros. Fail at plan time, not mid-task.
  require(leftTime.dataType == rightTime.dataType,
    s"asof time columns must share a type, got " +
      s"${leftTime.dataType.simpleString}/${rightTime.dataType.simpleString}")
  // tolerance/nearest arithmetic additionally needs a long-backed axis
  // (timestamps are epoch micros internally; longs/ints raw)
  if (tolerance.isDefined || direction == "nearest") {
    import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType, DateType}
    val ok = Set[org.apache.spark.sql.types.DataType](
      IntegerType, LongType, TimestampType, DateType)
    require(ok.contains(leftTime.dataType),
      s"asof tolerance requires an integer/timestamp time axis, got " +
        s"${leftTime.dataType.simpleString}")
  }

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
    val dir = direction
    val tol = tolerance
    val lIsInt = lTime.dataType == org.apache.spark.sql.types.IntegerType ||
      lTime.dataType == org.apache.spark.sql.types.DateType
    val rIsInt = rTime.dataType == org.apache.spark.sql.types.IntegerType ||
      rTime.dataType == org.apache.spark.sql.types.DateType
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
      // tolerance arithmetic: raw units of the time column (µs for
      // timestamps); a NULL time on either side can't satisfy a bound.
      // subtractExact: a raw-long axis whose span exceeds 2⁶³ (sentinel
      // values like Long.MinValue) fails LOUDLY instead of wrapping into
      // a spurious within-tolerance match
      def lTs(row: InternalRow): Long = if (lIsInt) row.getInt(0) else row.getLong(0)
      def rTs(row: InternalRow): Long = if (rIsInt) row.getInt(0) else row.getLong(0)
      def gap(a: Long, b: Long): Long = java.lang.Math.subtractExact(a, b)
      if (dir == "backward" || dir == "nearest") {
        // "nearest" rides the SAME consume-up-to-lT loop: the backward
        // candidate is whatever was consumed, the forward candidate is
        // the unconsumed head — both sides of the left row in one pass
        val nearest = dir == "nearest"
        var candKey: UnsafeRow = null
        var candStruct: UnsafeRow = null
        var candTsVal = 0L
        var candTsNull = true
        lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          val lT = lTimeProj(lRow)
          var frontier = true
          while (frontier && rBuf.hasNext) {
            val rRow = rBuf.head
            val kc = keyOrd.compare(rKeyProj(rRow), lKey)
            if (kc < 0) {
              rBuf.next() // key already passed by the left stream: discard
            } else if (kc == 0 && timeOrd.compare(rTimeProj(rRow), lT) <= 0) {
              // newest right row so far for this key at or before lT
              candKey = rKeyProj(rRow).copy()
              candStruct = structProj(rRow).copy()
              val rT = rTimeProj(rRow)
              candTsNull = rT.isNullAt(0)
              if (!candTsNull) candTsVal = rTs(rT)
              rBuf.next()
            } else frontier = false
          }
          val lNull = lT.isNullAt(0)
          // SQL `r.t <= l.t` NULL semantics (DuckDB ASOF agrees): a NULL
          // time on EITHER side never matches. Without the two null
          // gates a NULL-time left row would consume and match a
          // NULL-time right candidate through the sort ordering's
          // natural null-first EQUALITY — an undocumented divergence
          // from every SQL replay of this operator (r6 verdict item 2).
          val backOk = candKey != null && keyOrd.compare(candKey, lKey) == 0 &&
            !candTsNull && !lNull &&
            tol.forall(t => gap(lTs(lT), candTsVal) <= t)
          val result =
            if (!nearest) {
              if (backOk) numMatched += 1
              joined(lRow, if (backOk) candStruct else nullStruct)
            } else {
              val fwdOk = rBuf.hasNext && !lNull && {
                val rRow = rBuf.head
                keyOrd.compare(rKeyProj(rRow), lKey) == 0 && {
                  val rT = rTimeProj(rRow)
                  !rT.isNullAt(0) && tol.forall(t => gap(rTs(rT), lTs(lT)) <= t)
                }
              }
              val backGap = if (backOk) gap(lTs(lT), candTsVal) else Long.MaxValue
              val fwdGap =
                if (fwdOk) gap(rTs(rTimeProj(rBuf.head)), lTs(lT))
                else Long.MaxValue
              val useBack = backOk && backGap <= fwdGap // tie -> backward
              if (backOk || fwdOk) numMatched += 1
              joined(lRow,
                if (useBack) candStruct
                else if (fwdOk) structProj(rBuf.head)
                else nullStruct)
            }
          numOutputRows += 1
          resultProj(result)
        }
      } else { // forward: earliest right row with rT >= lT (within tol)
        lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          val lT = lTimeProj(lRow)
          var scan = true
          while (scan && rBuf.hasNext) {
            val rRow = rBuf.head
            val kc = keyOrd.compare(rKeyProj(rRow), lKey)
            // rows of earlier keys, or same key strictly before lT, can
            // never match this or any later left row — discard; the
            // candidate itself is only PEEKED (it may serve later lefts)
            if (kc < 0 || (kc == 0 && timeOrd.compare(rTimeProj(rRow), lT) < 0))
              rBuf.next()
            else scan = false
          }
          // a NULL left time never matches forward ("no instant to be
          // at-or-after" — q63's `c.ts >= p.ts` oracle semantics); null
          // right times sorted first and were discarded by the scan
          val matched = rBuf.hasNext && !lT.isNullAt(0) && {
            val rRow = rBuf.head
            keyOrd.compare(rKeyProj(rRow), lKey) == 0 && {
              val rT = rTimeProj(rRow)
              !rT.isNullAt(0) &&
                tol.forall(t => gap(rTs(rT), lTs(lT)) <= t)
            }
          }
          if (matched) numMatched += 1
          numOutputRows += 1
          resultProj(joined(lRow,
            if (matched) structProj(rBuf.head) else nullStruct))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
