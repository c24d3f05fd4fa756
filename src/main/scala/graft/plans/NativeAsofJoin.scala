package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Native physical as-of join — the whole-operator rung of the
  * extension ladder (custom `LogicalPlan` + `Rule` + `SparkStrategy` +
  * `SparkPlan`, all registered through `SparkSessionExtensions`).
  *
  * [[graft.operators.AsofJoin]] composes the operator from union +
  * window — one shuffle carrying BOTH sides through one state-bearing
  * window pass. This native exec instead co-partitions the two inputs
  * (each shuffled only on its own key, each sorted (key, time)) and
  * streams a two-pointer merge per partition: O(1) state (ONE
  * buffered right row), no union row inflation, no window machinery,
  * and the left side's partitioning is preserved for downstream
  * operators. Semantics: LEFT OUTER most-recent-at-or-before — for
  * each left row, the latest right row with equal key and
  * rightTime <= leftTime; ties at equal time take the later right row
  * in (key, time) sort order, so callers keep the right side unique
  * per (key, time) for determinism (same contract as the composed
  * operator and DuckDB's ASOF).
  *
  * SQL surface: `l.join(r, expr("graft_asof(lk, rk, lt, rt)"), "left")`
  * — the marker function resolves in analysis, [[AsofRewrite]] turns
  * the marked join into [[AsofJoinNode]] in the optimizer, and
  * [[AsofStrategy]] plans [[AsofJoinExec]].
  */
case class AsofMarker(leftKey: Expression, rightKey: Expression,
                      leftTime: Expression, rightTime: Expression)
    extends Expression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(leftKey, rightKey, leftTime, rightTime)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    AsofMarker(c(0), c(1), c(2), c(3))
}

case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsofJoinNode =
    copy(left = l, right = r)
}

/** Replaces a LEFT OUTER join whose condition is exactly the
  * `graft_asof` marker with the dedicated node. Sides are matched to
  * the marker's arguments (swapped arguments are normalized).
  */
case class AsofRewrite(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Join(l, r, LeftOuter, Some(m: AsofMarker), _) =>
      val straight = m.leftKey.references.subsetOf(l.outputSet) &&
        m.rightKey.references.subsetOf(r.outputSet) &&
        m.leftTime.references.subsetOf(l.outputSet) &&
        m.rightTime.references.subsetOf(r.outputSet)
      val swapped = m.leftKey.references.subsetOf(r.outputSet) &&
        m.rightKey.references.subsetOf(l.outputSet) &&
        m.leftTime.references.subsetOf(r.outputSet) &&
        m.rightTime.references.subsetOf(l.outputSet)
      if (straight) AsofJoinNode(l, r, m.leftKey, m.rightKey, m.leftTime, m.rightTime)
      else if (swapped) AsofJoinNode(l, r, m.rightKey, m.leftKey, m.rightTime, m.leftTime)
      else throw new IllegalArgumentException(
        "graft_asof(leftKey, rightKey, leftTime, rightTime): key/time pairs must come from opposite join sides")
  }
}

class AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Co-partitioned, co-sorted streaming merge. EnsureRequirements
  * supplies one hash shuffle per side (on that side's OWN key — at
  * 100 TB each side moves once, and bucketed/pre-partitioned inputs
  * move zero bytes) plus the (key, time) sort; the merge itself holds
  * exactly one buffered right row.
  */
case class AsofJoinExec(leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsofJoinExec =
    copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val lk = leftKey; val lt = leftTime; val rk = rightKey; val rt = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rProj = UnsafeProjection.create(Seq(rk, rt), rOut)
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _   // right lookahead (unconsumed)
        private var rHeadK: Any = _
        private var rHeadT: Any = _
        private var prevMatch: InternalRow = _ // latest consumed right row (copy)
        private var prevKey: Any = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val kt = lProj(l)
          val joined =
            if (kt.isNullAt(0) || kt.isNullAt(1)) joiner(l, nullRight)
            else {
              // projection buffers are reused — copy non-primitive values out
              val curK = InternalRow.copyValue(kt.get(0, keyType))
              val curT = InternalRow.copyValue(kt.get(1, timeType))
              advance(curK, curT)
              if (prevMatch != null && keyOrd.compare(prevKey, curK) == 0)
                joiner(l, prevMatch)
              else joiner(l, nullRight)
            }
          toUnsafe(joined)
        }

        /** Consume right rows that are at-or-before (curK, curT); stop
          * at the first row beyond it. Rows with a smaller key can
          * never match this or any later left row (both sides ascend).
          */
        private def advance(curK: Any, curT: Any): Unit = {
          while (true) {
            if (rHead == null) {
              var loaded = false
              while (!loaded && rIter.hasNext) {
                val r = rIter.next()
                val kt = rProj(r)
                if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
                  rHead = r.copy()
                  rHeadK = InternalRow.copyValue(kt.get(0, keyType))
                  rHeadT = InternalRow.copyValue(kt.get(1, timeType))
                  loaded = true
                }
              }
              if (!loaded) return
            }
            val ck = keyOrd.compare(rHeadK, curK)
            if (ck < 0) rHead = null // stale key — drop, keep scanning
            else if (ck == 0 && timeOrd.compare(rHeadT, curT) <= 0) {
              prevMatch = rHead
              prevKey = rHeadK
              rHead = null
            } else return
          }
        }
      }
    }
  }
}
