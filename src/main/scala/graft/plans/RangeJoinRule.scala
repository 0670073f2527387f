package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule lowering point-in-interval inner joins to bucketed
  * equi-joins — tier (c) of the custom-operator preference order: a
  * whole-operator semantic Spark's planner genuinely lacks.
  *
  * Spark plans a join whose only condition is `p BETWEEN lo AND hi`
  * (no equality conjunct) as BroadcastNestedLoopJoin or CartesianProduct
  * — O(n·m) pair evaluation, the classic 100 TB cliff. This rule
  * rewrites such joins into the shape of
  * `graft.operators.Joins.rangeJoinBucketed`:
  *
  *  - point side gains `floor(p / w)` as a join key (one value per row)
  *  - interval side explodes `sequence(floor(lo/w), floor(hi/w))`
  *    (bounded fan-out: ceil(interval/w)+1 replicas per row)
  *  - equi-join on the bucket, original predicate kept as the exact
  *    filter
  *
  * Every matching pair shares exactly ONE bucket (the point's), so no
  * deduplication is needed and inner-join multiplicity is preserved.
  *
  * Opt-in: fires only when `spark.graft.rangeJoin.bucketWidth` is set
  * positive — bucket width is a data-dependent choice (≈ the typical
  * interval length, in the point column's units: numeric value, or
  * seconds for timestamps), so it stays a user decision, like DuckDB's
  * IEJoin thresholds or the range-join hints in other engines. The rule
  * is idempotent (the rewritten join has an equality conjunct, which
  * disqualifies it from matching again) and safe under the fixed-point
  * operator-optimization batch it is injected into.
  *
  * Caveats, documented not hidden: intervals spanning ≫ width generate
  * proportionally many replicas (pick a width near the p99 interval
  * length); values must stay within double precision (|x| < 2⁵²,
  * true for unix seconds and micros).
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  /** Runtime cap on replicas per interval row (0 disables). A degenerate
    * interval spanning ≫ width would otherwise fan out into
    * ceil(span/width)+1 replicas — an executor OOM or max-array-length
    * crash with no hint of the cause. Exceeding the cap raises an
    * actionable error naming this conf and the width conf instead. */
  val MaxBucketsKey = "spark.graft.rangeJoin.maxBucketsPerRow"

  private def width: Double =
    try conf.getConfString(WidthKey, "0").toDouble catch { case _: NumberFormatException => 0.0 }

  private def maxBuckets: Long =
    try conf.getConfString(MaxBucketsKey, "8192").toLong catch { case _: NumberFormatException => 8192L }

  /** Some(true) if e references only `l`'s output, Some(false) if only
    * `r`'s; None for literals, mixed, or empty references. */
  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  private def rangeComparable(t: DataType): Boolean = t match {
    case _: NumericType | TimestampType | TimestampNTZType | DateType => true
    case _ => false
  }

  /** (point, bound, pointSideIsLeft, isLowerBound) readings of one
    * inequality conjunct, both orientations. */
  private def boundsOf(e: Expression, l: LogicalPlan, r: LogicalPlan)
      : Seq[(Expression, Expression, Boolean, Boolean)] = {
    def mk(p: Expression, b: Expression, lower: Boolean) =
      for {
        ps <- sideOf(p, l, r).toSeq
        bs <- sideOf(b, l, r).toSeq
        if ps != bs && rangeComparable(p.dataType) && rangeComparable(b.dataType)
      } yield (p, b, ps, lower)
    e match {
      // a >= b: a lower-bounded by b; b upper-bounded by a
      case GreaterThanOrEqual(a, b) => mk(a, b, lower = true) ++ mk(b, a, lower = false)
      case GreaterThan(a, b)        => mk(a, b, lower = true) ++ mk(b, a, lower = false)
      case LessThanOrEqual(a, b)    => mk(a, b, lower = false) ++ mk(b, a, lower = true)
      case LessThan(a, b)           => mk(a, b, lower = false) ++ mk(b, a, lower = true)
      case _ => Nil
    }
  }

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Bucket id of a value. `exact=true` (all-integral join columns,
    * whole width): sign-correct integer floor division —
    * (p − pmod(p,w)) div w, exact for the full long range. Otherwise:
    * floor of double division (documented |x| < 2⁵² caveat for
    * fractional widths / timestamp seconds). The flag is decided ONCE
    * per join from all three expressions — mixing paths between the
    * point and interval sides would misalign buckets. */
  private def bucket(e: Expression, w: Double, exact: Boolean): Expression =
    if (exact) {
      val wl = Literal(w.toLong, LongType)
      val p = Cast(e, LongType)
      // numerator is an exact multiple of w, so truncating div == floor
      IntegralDivide(Subtract(p, Pmod(p, wl)), wl)
    } else Floor(Divide(Cast(e, DoubleType), Literal(w, DoubleType)))

  def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if cond.deterministic =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEquiKey = conjuncts.exists {
          case EqualTo(a, b) =>
            (sideOf(a, left, right), sideOf(b, left, right)) match {
              case (Some(x), Some(y)) => x != y
              case _ => false
            }
          case EqualNullSafe(a, b) =>
            (sideOf(a, left, right), sideOf(b, left, right)) match {
              case (Some(x), Some(y)) => x != y
              case _ => false
            }
          case _ => false
        }
        if (hasEquiKey) j // hash-joinable already; range conjuncts stay filters
        else {
          val bounds = conjuncts.flatMap(c => boundsOf(c, left, right))
          // a point expr with both a lower and an upper bound from the other side
          val candidate = bounds.collectFirst {
            case (p, lo, ps, true) if bounds.exists {
              case (p2, _, ps2, false) => ps2 == ps && p2.semanticEquals(p)
              case _ => false
            } =>
              val hi = bounds.collectFirst {
                case (p2, b2, ps2, false) if ps2 == ps && p2.semanticEquals(p) => b2
              }.get
              (p, lo, hi, ps)
          }
          candidate match {
            case None => j
            case Some((p, lo, hi, pointOnLeft)) =>
              val (pSide, iSide) = if (pointOnLeft) (left, right) else (right, left)
              val exact = w.isWhole && w <= Long.MaxValue.toDouble &&
                Seq(p, lo, hi).forall(e => isIntegral(e.dataType))
              val pAlias = Alias(bucket(p, w, exact), "__graft_bucket")()
              val pProj = Project(pSide.output :+ pAlias, pSide)
              val bLo = bucket(lo, w, exact)
              val bHi = bucket(hi, w, exact)
              // guard inverted/null intervals: empty bucket list, no fan-out
              // Sequence is TimeZoneAwareExpression: unresolved until the
              // session tz is pinned, even for integral sequences
              val emptyBuckets =
                Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false))
              val seq = Sequence(bLo, bHi, None, Some(conf.sessionLocalTimeZone))
              val mb = maxBuckets
              // runtime fan-out cap: a row whose interval spans more than
              // maxBuckets buckets raises an actionable error instead of
              // exploding toward an OOM/max-array-length crash
              val guarded =
                if (mb <= 0) seq
                else If(LessThanOrEqual(Subtract(bHi, bLo), Literal(mb)),
                  seq,
                  Cast(RaiseError(Literal(
                    s"graft range-join rewrite: an interval spans more than $mb " +
                      s"buckets of width $w; raise $WidthKey toward the p99 " +
                      s"interval length or adjust $MaxBucketsKey")),
                    ArrayType(LongType, containsNull = false)))
              val buckets = If(LessThanOrEqual(bLo, bHi), guarded, emptyBuckets)
              val gAttr = AttributeReference("__graft_bucket_g", LongType, nullable = false)()
              val gen = Generate(Explode(buckets), Nil, outer = false, None, Seq(gAttr), iSide)
              val newCond = And(EqualTo(pAlias.toAttribute, gAttr), cond)
              val rewritten =
                if (pointOnLeft) Join(pProj, gen, Inner, Some(newCond), hint)
                else Join(gen, pProj, Inner, Some(newCond), hint)
              Project(j.output, rewritten)
          }
        }
    }
  }
}
