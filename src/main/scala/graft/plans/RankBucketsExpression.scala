package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Map a double to its quantile bucket via binary search over sorted
  * boundaries — the distributed-safe replacement for a global
  * `percent_rank()` window (which moves ALL data to one partition).
  *
  * The boundaries come from one `approxQuantile` pass (Greenwald-Khanna,
  * distributed, driver receives only ~1k doubles per column), so the
  * mapping is skew-robust the way rank scaling is — a heavy-tailed
  * column still spreads across all buckets — without any single-
  * partition stage. Used by `Maintenance.zorderParquet` to scale
  * coordinates before Morton interleaving.
  *
  * Tier (b) native expression: the search runs inside whole-stage
  * codegen via the shared [[ZOrder.bucketOf]] helper (same code path as
  * interpreted eval, so parity is structural).
  */
case class RankBucketsExpression(child: Expression, boundaries: Seq[Double])
    extends UnaryExpression {

  require(boundaries.nonEmpty, "rank_buckets needs at least one boundary")

  @transient private lazy val bounds: Array[Double] = boundaries.toArray

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rank_buckets requires double input, got ${child.dataType.simpleString(10)}")

  override def nullSafeEval(input: Any): Any =
    ZOrder.bucketOf(bounds, input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val zo = ZOrder.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val arr = ctx.addReferenceObj("rankBounds", bounds, "double[]")
    defineCodeGen(ctx, ev, v => s"$zo.bucketOf($arr, $v)")
  }

  override protected def withNewChildInternal(newChild: Expression): RankBucketsExpression =
    copy(child = newChild)
  override def prettyName: String = "rank_buckets"
}

object RankBucketsExpression {

  /** Column API; `boundaries` must be sorted ascending. */
  def rankBuckets(c: Column, boundaries: Array[Double]): Column =
    SqlBridge.column(RankBucketsExpression(
      SqlBridge.expression(c.cast("double")), boundaries.toSeq))
}
