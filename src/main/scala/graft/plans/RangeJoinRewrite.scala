package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Logical-plan rewrite for band (interval) joins — the optimization
  * Spark lacks natively: an inner join whose condition is ONLY
  * `point >= lo AND point <= hi` has no equi key, so the planner falls
  * back to BroadcastNestedLoopJoin (or a cartesian product when
  * neither side broadcasts) — O(|L|·|R|) and a guaranteed driver/OOM
  * incident at fact scale. The standard fix (public: time-bucketed
  * interval joins as in Flink's interval join and Databricks' range
  * join optimization) buckets both sides by a fixed width: the point
  * side lands in ONE bucket, the interval side fans out to the
  * buckets it covers, and the join becomes a shuffled EQUI join on
  * bucket id with the exact band predicate as a residual filter.
  * Every qualifying (l, r) pair meets in exactly one bucket (the
  * point's), so no dedup is needed; trunc-division is monotone, so
  * membership survives any sign of the epoch values.
  *
  * The rule fires only when the rewrite is the plan you'd want:
  *   - inner join, condition is exactly the two band conjuncts
  *     (anything with an equi conjunct already hash-joins — declined;
  *     this also makes the rewrite self-terminating);
  *   - the user asked for a shuffle join (`.hint("merge")` — Spark
  *     silently ignores that hint on a band join today), OR both
  *     sides' size estimates exceed the broadcast threshold (the
  *     regime where the fallback is catastrophic).
  *
  * Registered via [[graft.GraftExtensions]] (`injectOptimizerRule`);
  * `spark.graft.rangeJoin.enabled=false` turns it off,
  * `spark.graft.rangeJoin.bucketWidthUs` sizes the bucket (default
  * 1 h — intervals spanning b buckets fan out b+1 rows, so pick the
  * width near the p99 interval length).
  */
case class RangeJoinRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    session.conf.get("spark.graft.rangeJoin.enabled", "true").toBoolean
  private def widthUs: Long =
    session.conf.get("spark.graft.rangeJoin.bucketWidthUs", "3600000000").toLong

  private def asUs(e: Expression): Option[Expression] = e.dataType match {
    case TimestampType => Some(UnixMicros(e))
    case LongType      => Some(e)
    case IntegerType   => Some(Cast(e, LongType))
    case _             => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  /** (point, lower, upper) if the two conjuncts form a band over a
    * common point expression.
    */
  private def bandOf(c1: Expression, c2: Expression): Option[(Expression, Expression, Expression)] = {
    // normalize each comparison to (smaller, larger)
    def asLe(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(a, b)    => Some((a, b))
      case LessThan(a, b)           => Some((a, b))
      case GreaterThanOrEqual(a, b) => Some((b, a))
      case GreaterThan(a, b)        => Some((b, a))
      case _                        => None
    }
    for {
      (lo1, hi1) <- asLe(c1)
      (lo2, hi2) <- asLe(c2)
      res <- if (hi1.semanticEquals(lo2)) Some((hi1, lo1, hi2))      // lo1 <= p <= hi2
             else if (hi2.semanticEquals(lo1)) Some((hi2, lo2, hi1)) // lo2 <= p <= hi1
             else None
    } yield res
  }

  private def wantsShuffle(hint: JoinHint): Boolean =
    Seq(hint.leftHint, hint.rightHint).flatten
      .exists(_.strategy.contains(SHUFFLE_MERGE))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    val thr = session.sessionState.conf.autoBroadcastJoinThreshold
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if conjuncts(cond).length == 2 &&
            bandOf(conjuncts(cond)(0), conjuncts(cond)(1)).exists {
              case (p, lo, hi) =>
                (asUs(p) ++ asUs(lo) ++ asUs(hi)).size == 3 && {
                  val pointLeft = p.references.subsetOf(left.outputSet) &&
                    (lo.references ++ hi.references).subsetOf(right.outputSet)
                  val pointRight = p.references.subsetOf(right.outputSet) &&
                    (lo.references ++ hi.references).subsetOf(left.outputSet)
                  pointLeft || pointRight
                }
            } &&
            (wantsShuffle(hint) ||
              (thr >= 0 && j.left.stats.sizeInBytes > thr && j.right.stats.sizeInBytes > thr) ||
              thr < 0) =>
        val Some((p, lo, hi)) = bandOf(conjuncts(cond)(0), conjuncts(cond)(1))
        val pointOnLeft = p.references.subsetOf(left.outputSet)
        val (pointPlan, boundPlan) = if (pointOnLeft) (left, right) else (right, left)
        val w = Literal(widthUs, LongType)
        val pb = Alias(IntegralDivide(asUs(p).get, w), "__graft_pb")()
        val pointProj = Project(pointPlan.output :+ pb, pointPlan)
        val loB = IntegralDivide(asUs(lo).get, w)
        val hiB = IntegralDivide(asUs(hi).get, w)
        // Sequence is TimeZoneAware — without an explicit zone it stays
        // unresolved and the optimizer's plan validation rejects it
        val seq = Sequence(loB, hiB, Some(Literal(1L, LongType)),
          Some(session.sessionState.conf.sessionLocalTimeZone))
        val safeSeq = If(
          And(IsNotNull(loB), And(IsNotNull(hiB), LessThanOrEqual(loB, hiB))),
          seq,
          Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
        val rb = AttributeReference("__graft_rb", LongType, nullable = false)()
        val boundGen = Generate(Explode(safeSeq), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(rb), child = boundPlan)
        val (newLeft, newRight) =
          if (pointOnLeft) (pointProj, boundGen) else (boundGen, pointProj)
        val newCond = And(EqualTo(pb.toAttribute, rb), cond)
        Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
