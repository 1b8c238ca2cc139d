package org.apache.spark.sql.graftx

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: plan a pure range-condition inner join as a bucketed
  * equi-join instead of a nested loop.
  *
  * A join whose only cross-side predicates are interval bounds —
  * `p >= lo AND p < hi` with the point on one side and both bounds on the
  * other — has no equi-key, so Spark falls back to
  * BroadcastNestedLoopJoin: O(|L|·|R|) comparisons and a broadcast of one
  * whole side. This rule rewrites the logical plan to the grid form of
  * [[graft.operators.RangeJoin]]: points get `floor(p/g)` as a join key,
  * intervals explode over the bucket range `floor(lo/g)..floor(hi/g)`, and
  * the join becomes a plain shuffled equi-join on the bucket refined by the
  * ORIGINAL condition — O(|L| + |R|·span/g + matches), no broadcast of a
  * fact-sized table, and hot time ranges spread across buckets.
  *
  * Opt-in and scoped deliberately:
  *  - fires only when `spark.graft.rangeJoin.granularity` is set to a
  *    positive long on the SAME scale as the bound columns (a wrong-scale
  *    grid is correct but useless — one bucket or 10⁶ buckets per interval);
  *  - inner joins only, batch only, LONG-typed point/bounds only;
  *  - bails if ANY cross-side equality conjunct exists (Spark already has a
  *    shuffle key then — also what makes the rewrite idempotent, since the
  *    rewritten join carries a bucket equality);
  *  - extra conjuncts ride along unchanged inside the refined condition.
  *
  * The rewrite never changes results: a point lives in exactly one bucket,
  * an interval visits each spanned bucket once, so (key-match ⊆ bucket-match)
  * and the exact predicate re-applied on top keeps inner-join multiplicity
  * identical. Empty/NULL-bounded intervals are filtered before the explode
  * (NULL bounds can never satisfy the original condition either).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val GranularityKey = "spark.graft.rangeJoin.granularity"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = conf.getConfString(GranularityKey, "0")
    val g = scala.util.Try(raw.toLong).getOrElse {
      logWarning(s"$GranularityKey='$raw' is not a long — range-join rewrite disabled")
      0L
    }
    if (g <= 0) plan
    else plan.transform {
      case j @ Join(_, _, Inner, Some(_), _) if !j.isStreaming =>
        rewrite(j, g).getOrElse(j)
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x         => Seq(x)
  }

  /** Some(true) if `e` evaluates purely on `l`, Some(false) purely on `r`. */
  private def side(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] =
    if (e.references.isEmpty || !e.deterministic) None
    else if (e.references.subsetOf(l.outputSet)) Some(true)
    else if (e.references.subsetOf(r.outputSet)) Some(false)
    else None

  /** `c` as (greater, lesser) when it is a long-typed inequality between one
    * left-only and one right-only expression — `a >= b` → (a, b),
    * `a <= b` → (b, a); strictness is irrelevant for bucket CONTAINMENT
    * (the exact predicate is re-applied after the bucket join).
    */
  private def asBound(
      c: Expression,
      l: LogicalPlan,
      r: LogicalPlan): Option[(Expression, Expression)] = {
    val pair = c match {
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case GreaterThan(a, b)        => Some((a, b))
      case LessThanOrEqual(a, b)    => Some((b, a))
      case LessThan(a, b)           => Some((b, a))
      case _                        => None
    }
    pair.filter { case (a, b) =>
      a.dataType == LongType && b.dataType == LongType &&
        ((side(a, l, r), side(b, l, r)) match {
          case (Some(sa), Some(sb)) => sa != sb
          case _                    => false
        })
    }
  }

  private def rewrite(j: Join, g: Long): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j
    val cs = conjuncts(cond)
    // any cross-side equality → Spark has an equi-key already; also the
    // idempotence guard (our own rewrite adds one)
    val hasCrossEq = cs.exists {
      case EqualTo(a, b) =>
        (side(a, left, right), side(b, left, right)) match {
          case (Some(x), Some(y)) => x != y
          case _                  => false
        }
      case EqualNullSafe(a, b) =>
        (side(a, left, right), side(b, left, right)) match {
          case (Some(x), Some(y)) => x != y
          case _                  => false
        }
      case _ => false
    }
    if (hasCrossEq) return None

    val bounds = cs.flatMap(asBound(_, left, right))
    // one lower and one upper bound on the SAME point expression, with both
    // bound expressions on the other side: (point, lo) says point ≥(=) lo,
    // (hi, point) says point ≤(=) hi
    val candidates = for {
      (p1, lo) <- bounds
      (hi, p2) <- bounds
      if p1.semanticEquals(p2)
      pSide <- side(p1, left, right).toSeq
      loSide <- side(lo, left, right).toSeq
      if loSide != pSide && side(hi, left, right).contains(loSide)
    } yield (p1, lo, hi, pSide)
    val (p, lo, hi, pointOnLeft) = candidates.headOption.getOrElse(return None)

    val (pointPlan, ivPlan) = if (pointOnLeft) (left, right) else (right, left)

    // exact long floor-division: e div g, minus 1 when a negative e doesn't
    // divide evenly (div truncates toward zero, buckets need floor). A
    // double floor (the obvious floor(e/g)) silently mis-buckets
    // |values| > 2^53 — fine for epoch micros, not for arbitrary user
    // longs, and a wrong bucket here means MISSING join rows, not an
    // error. This form is overflow-free under ANSI for every long (g > 0,
    // and the -1 adjustment only applies when |div| < 2^63/g).
    def bucketOf(e: Expression): Expression =
      Subtract(
        IntegralDivide(e, Literal(g)),
        If(
          And(Not(EqualTo(Remainder(e, Literal(g)), Literal(0L))),
            LessThan(e, Literal(0L))),
          Literal(1L), Literal(0L)))

    // point side: one bucket per row
    val pAlias = Alias(bucketOf(p), "_rj_bucket_p")()
    val pointProj = Project(pointPlan.output :+ pAlias, pointPlan)

    // interval side: drop empty/NULL intervals, explode the spanned buckets.
    // floor(hi/g) (not (hi-1)/g) is a ≤1-bucket superset that stays correct
    // for both strict and non-strict upper bounds — the exact predicate
    // below filters it.
    val ivFiltered = Filter(LessThanOrEqual(lo, hi), ivPlan)
    val seq = new Sequence(
      bucketOf(lo), bucketOf(hi), None, Some(conf.sessionLocalTimeZone))
    val bucketAttr = AttributeReference(
      "_rj_bucket_iv", LongType,
      nullable = seq.dataType.asInstanceOf[ArrayType].containsNull)()
    val ivGen = Generate(
      Explode(seq), unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(bucketAttr), child = ivFiltered)

    val (newLeft, newRight, bL, bR) =
      if (pointOnLeft) (pointProj, ivGen, pAlias.toAttribute, bucketAttr)
      else (ivGen, pointProj, bucketAttr, pAlias.toAttribute)
    val bucketed = Join(
      newLeft, newRight, Inner, Some(And(EqualTo(bL, bR), cond)), hint)
    Some(Project(j.output, bucketed))
  }
}
