package graft.sources

import java.nio.file.Paths

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

/** COST-BASED broadcast from log metadata (conf-gated by
  * `spark.graft.statsBroadcast.enabled`, default off — the same discipline
  * as the other injected rules): joins where one side is a FILTERED log
  * table whose post-filter output is provably small get a BROADCAST hint,
  * even though Spark's size-only estimate (filters don't shrink
  * `sizeInBytes` without CBO column stats) would have planned a shuffle.
  *
  * The estimate composes three metadata sources, all manifest-sized reads:
  *
  *  - live row count / live bytes at the scan's pinned version
  *    ([[TableLog.metadataCount]] / [[TableLog.liveBytes]]);
  *  - the NDV sidecar ([[TableLog.buildNdvIndex]], KMV-style sketch via
  *    `approx_count_distinct`): an equality conjunct on a covered column
  *    multiplies selectivity by 1/ndv, an IN by |values|/ndv — uncovered
  *    columns and any other predicate shape contribute nothing
  *    (conservative: estimates only ever shrink on evidence);
  *  - the session's `autoBroadcastJoinThreshold` as the decision line.
  *
  * The hint is attached only when the UNFILTERED side would NOT broadcast
  * (bytes > threshold) and the filtered estimate falls under it — so the
  * rule can only flip plans its evidence supports, and Spark's own planning
  * is untouched everywhere else. A wrong NDV can cost performance (a big
  * broadcast), never correctness — the join itself still evaluates exactly.
  *
  * 100 TB: this is the difference between shuffling a 100 TB fact against
  * a date-filtered dimension and broadcasting the 2 MB filter result — the
  * decision Spark cannot make without column stats, made here from
  * sidecars the log already maintains.
  */
object StatsBroadcastRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.statsBroadcast.enabled", "false").toBoolean)
      return plan
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return plan
    // (path, version) → live bytes, memoized per rule application: the
    // operator-optimization batch runs to fixed point, and a Files.size
    // per live file per side per join per iteration is real planning cost
    // on wide tables.
    val byteCache = scala.collection.mutable.Map.empty[(String, Long), Option[Long]]
    plan.transformUp {
      case j @ Join(l, r, jt, _, hint) if hint == JoinHint.NONE =>
        val le = estimate(l, byteCache)
        val re = estimate(r, byteCache)
        def qualifies(e: Option[Est]): Boolean =
          e.exists(x => x.estBytes <= threshold && x.plainBytes > threshold)
        val pickLeft = qualifies(le) && canBuildLeft(jt) &&
          (!qualifies(re) || !canBuildRight(jt) ||
            le.get.estBytes <= re.get.estBytes)
        val pickRight = !pickLeft && qualifies(re) && canBuildRight(jt)
        if (pickLeft)
          j.copy(hint = JoinHint(Some(HintInfo(strategy = Some(BROADCAST))), None))
        else if (pickRight)
          j.copy(hint = JoinHint(None, Some(HintInfo(strategy = Some(BROADCAST)))))
        else j
    }
  }

  private def canBuildRight(jt: JoinType): Boolean = jt match {
    case _: InnerLike | LeftOuter | LeftSemi | LeftAnti | _: ExistenceJoin => true
    case _ => false
  }
  private def canBuildLeft(jt: JoinType): Boolean = jt match {
    case _: InnerLike | RightOuter => true
    case _ => false
  }

  private final case class Est(plainBytes: Long, estBytes: Long)

  /** unwrap attribute-only Projects and Filters down to a log scan; the
    * filters stay visible even post-pushdown because the scan keeps EVERY
    * pushed predicate residual
    */
  private def estimate(
      p: LogicalPlan,
      byteCache: scala.collection.mutable.Map[(String, Long), Option[Long]]): Option[Est] = {
    def walk(n: LogicalPlan, conds: Seq[Expression]): Option[(String, Long, Seq[Expression])] =
      n match {
        case r: DataSourceV2Relation => r.table match {
          case t: GraftLogTable => Some((t.logPath, t.logVersion, conds))
          case _ => None
        }
        case r: DataSourceV2ScanRelation => r.scan match {
          case s: GraftLogScan if s.getClass == classOf[GraftLogScan] =>
            Some((s.logPath, s.logVersion, conds))
          case _ => None
        }
        case Filter(c, child) => walk(child, splitAnd(c) ++ conds)
        case Project(list, child) if list.forall(_.isInstanceOf[AttributeReference]) =>
          walk(child, conds)
        case _ => None
      }
    walk(p, Nil).flatMap { case (path, v, conds) =>
      // a referenced file can vanish mid-plan (concurrent vacuum of the
      // pinned version): missing evidence → no hint, never a planning error
      val bytes = byteCache.getOrElseUpdate((path, v),
        scala.util.Try(TableLog.liveBytes(path, v)).toOption)
      bytes.map { b =>
        val sel = conds.map(selectivity(path, _)).product
        Est(b, math.max(1L, math.ceil(b * sel).toLong))
      }
    }
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitAnd(a) ++ splitAnd(b)
    case other => Seq(other)
  }

  private def norm(p: String): String =
    Paths.get(p).toAbsolutePath.normalize.toString

  private def selectivity(path: String, cond: Expression): Double = {
    def ndv(a: Attribute): Option[Long] =
      TableLog.ndvFor(norm(path), a.name).map(_._2).filter(_ > 0)
    cond match {
      case EqualTo(a: AttributeReference, _: Literal) =>
        ndv(a).map(n => 1.0 / n).getOrElse(1.0)
      case EqualTo(_: Literal, a: AttributeReference) =>
        ndv(a).map(n => 1.0 / n).getOrElse(1.0)
      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        ndv(a).map(n => math.min(1.0, vs.length.toDouble / n)).getOrElse(1.0)
      case _ => 1.0
    }
  }
}
