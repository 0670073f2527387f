package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression counting how many elements of an
  * `array<string>` column are members of a fixed string set (with
  * multiplicity — each occurrence counts).
  *
  * Replaces `size(filter(tokens, t => t.isInCollection(set)))` in the
  * stopword-ratio path of quality scoring: ArrayFilter is a higher-order
  * function (interpreted lambda per element, no whole-stage codegen) and
  * `isInCollection` re-evaluates a 15-way In per token; and
  * `array_intersect` is not a substitute because it drops duplicate
  * occurrences. Here the set is hashed once per expression instance
  * (UTF8String keys, no per-row allocation) and membership is one probe
  * per token inside the codegen span. Profiled at sf0.1: stopword ratio
  * 0.31s → the scan floor (~0.12s).
  *
  * Parity with the HOF form is asserted in PlanExprSpec.
  */
case class CountInSetExpression(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"count_in_set requires array<string>, got ${other.simpleString(10)}")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    CountInSetExpression.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = CountInSetExpression.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $obj.count($arr, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSetExpression =
    copy(child = newChild)
  override def prettyName: String = "count_in_set"
}

object CountInSetExpression {

  /** Occurrence count of set members in the token array (nulls skipped). */
  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    var n = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  /** Registry builder: the word set arrives as a foldable array literal
    * (count_in_set(tokens, array('the','a',...))). */
  def builder(exprs: Seq[Expression]): Expression = {
    val arr = exprs(1).eval().asInstanceOf[ArrayData]
    val words = (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
    CountInSetExpression(exprs(0), words)
  }

  /** SQL + Column registration. No-op when GraftExtensions already
    * injected the function. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("count_in_set")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "count_in_set", builder, "built-in")

  /** Column API (registers on the active session, idempotent). */
  def countInSet(tokens: Column, words: Seq[String]): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    org.apache.spark.sql.functions.call_function("count_in_set", tokens,
      org.apache.spark.sql.functions.array(
        words.map(org.apache.spark.sql.functions.lit): _*))
  }
}
