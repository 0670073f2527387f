package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression computing cosine similarity between two
  * `array<float>` (or `array<double>`) columns in double precision.
  *
  * Motivation (the "(b) custom Expression" tier): the declarative form —
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)` — uses
  * higher-order functions, which Catalyst evaluates per-row with lambda
  * variable binding and NO whole-stage codegen, and which materialize the
  * zipped product array. This expression emits one fused loop straight
  * into generated code: no intermediate array, no lambda dispatch, stays
  * inside the WholeStageCodegen span. On ANN scoring (corpus × queries
  * cosine evaluations, the hot path of similarity search at 100 TB) this
  * is the difference between memory-bandwidth-bound and
  * allocation-bound.
  *
  * Semantics are IDENTICAL to the declarative form it replaces
  * (asserted element-wise in PlanExprSpec):
  *  - null array, length mismatch, or null element → null
  *    (what zip_with null-padding + null product propagation yields)
  *  - either vector all-zero → 0.0
  *  - else Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), accumulated sequentially in input
  *    order in doubles → bit-identical to the fold it replaces.
  *
  * Reference behavior anchor: the reference scores similarity driver-side
  * (amadeus has no vector ops); this is part of the north-star extension
  * surface (SURVEY §2 "Beyond the reference").
  */
case class CosineSimilarityExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double> inputs, got " +
        s"${left.dataType.simpleString(10)}, ${right.dataType.simpleString(10)}")

  private def isFloat(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val xf = isFloat(left); val yf = isFloat(right)
    var dot = 0.0; var na2 = 0.0; var nb2 = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na2 += xv * xv; nb2 += yv * yv
      i += 1
    }
    val na = math.sqrt(na2); val nb = math.sqrt(nb2)
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getX = if (isFloat(left)) "getFloat" else "getDouble"
    val getY = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na2 = ctx.freshName("na2")
      val nb2 = ctx.freshName("nb2")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na2 = 0.0; double $nb2 = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xv = (double) $x.$getX($i);
         |    double $yv = (double) $y.$getY($i);
         |    $dot += $xv * $yv; $na2 += $xv * $xv; $nb2 += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    double $na = java.lang.Math.sqrt($na2);
         |    double $nb = java.lang.Math.sqrt($nb2);
         |    ${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / ($na * $nb);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

object CosineSimilarityExpression {

  /** SQL + Column registration: SELECT cosine_sim(a.embedding, b.embedding).
    * No-op when GraftExtensions already injected the function. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "cosine_sim", exprs => CosineSimilarityExpression(exprs(0), exprs(1)),
        "built-in")

  /** Column API (registers on the active session, idempotent). */
  def cosineSim(a: Column, b: Column): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)
  }
}
