package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, GlobalLimit, HintInfo, LocalLimit, LocalRelation, LogicalPlan, OneRowRelation, Join => LogicalJoin, Filter => LogicalFilter, Range => LogicalRange}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Mechanical plan-convention audit over EVERY registered query (the
  * r4 verdict's ask: the discipline "no unpartitioned window over an
  * unbounded grain, no CartesianProduct, no unbounded nested-loop
  * join, no unbounded broadcast" was asserted in prose but audited
  * only through ~batch 29 — this sweep asserts it by walking the
  * physical plan tree of all of them).
  *
  * Conventions checked (AQE off so the static plan is judged):
  *  - CartesianProduct: never allowed (a broadcast-able cross of two
  *    bounded aggregates plans as BroadcastNestedLoopJoin instead).
  *  - BroadcastNestedLoopJoin: allowed only when the broadcast side is
  *    BOUNDED — its subtree contains a group-less aggregate (≤1 row),
  *    a Limit, or a row-bounded local relation; anything else is a
  *    data-sized nested loop and fails.
  *  - Unpartitioned Window / WindowGroupLimit: allowed only when the
  *    window's input is already an AGGREGATED grain (an aggregate
  *    node below caps the row count at the group count — the
  *    per-shard offset tables, per-nation/per-day grains) or a Limit.
  *    A global window directly over a raw scan is the scale-killer
  *    this repo's ShardedRank exists to avoid.
  *  - An explicit BROADCAST join HINT on an unbounded subtree of a
  *    RAW fact-table scan (lineitem, orders, events, documents,
  *    embeddings — tables that scale with the corpus): fails. Checked
  *    on the OPTIMIZED LOGICAL plan's JoinHint, not on physical
  *    BroadcastExchange nodes — at test scale the optimizer
  *    auto-broadcasts tiny fact scans from size stats, which is
  *    correct and self-reverting at 100 TB (stats grow, the plan
  *    flips to a shuffle join); only a HINT pins the broadcast at
  *    every scale. Hinting nation/region/supplier/part/customer dims
  *    or any aggregated/limited/key-capped derivation is the
  *    intended pattern.
  *
  * Output: one line per violation (query, rule, node), a per-rule
  * summary, and a JSON dump for PLANS.md's appendix. Streaming-staged
  * queries (ev*s_*) are skipped: their "plan" at this layer is the
  * memory-sink scan; their shapes are pinned by the streaming specs.
  */
object PlanSweep {

  private val factTables =
    Seq("lineitem", "orders", "events", "documents", "embeddings")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only: Set[String] = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val skip = "ev\\d+s_.*".r
    var audited = 0
    val violations = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val errors = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val wanted = (only.isEmpty || only(name)) && skip.findFirstIn(name).isEmpty
      if (wanted) {
        try {
          val qe = fn(spark, sfDir).queryExecution
          audited += 1
          violations ++= audit(name, qe.executedPlan)
          violations ++= auditHints(name, qe.optimizedPlan)
          spark.catalog.clearCache()
        } catch {
          case e: Throwable => errors += name -> String.valueOf(e.getMessage).take(120)
        }
      }
    }
    println(s"\n[plansweep] audited=$audited violations=${violations.size} errors=${errors.size}")
    violations.foreach { case (q, rule, node) => println(s"[plansweep] VIOLATION $q $rule :: $node") }
    errors.foreach { case (q, m) => println(s"[plansweep] ERROR $q :: $m") }
    val json = {
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ")
      val vs = violations.map { case (q, r, n) =>
        s"""{"query":"${esc(q)}","rule":"${esc(r)}","node":"${esc(n)}"}"""
      }.mkString("[", ",", "]")
      val es = errors.map { case (q, m) => s""""${esc(q)}":"${esc(m)}"""" }.mkString("{", ",", "}")
      s"""{"audited":$audited,"violations":$vs,"errors":$es}"""
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_SWEEP_OUT", "/tmp/plan_sweep.json")), json)
    spark.stop()
  }

  /** All convention violations in one query's physical plan. */
  def audit(name: String, plan: SparkPlan): Seq[(String, String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    plan.foreach {
      case c: CartesianProductExec =>
        out += ((name, "cartesian_product", c.simpleStringWithNodeId()))
      case j: BroadcastNestedLoopJoinExec =>
        val broadcastSide = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
          case _ => j.right
        }
        if (!bounded(broadcastSide))
          out += ((name, "unbounded_bnlj", j.simpleStringWithNodeId()))
      case w: WindowExec if w.partitionSpec.isEmpty =>
        if (!bounded(w.child))
          out += ((name, "global_window_raw_grain",
            w.child.treeString.linesIterator.take(8).mkString(" | ").take(400)))
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
        if (!bounded(w.child))
          out += ((name, "global_window_raw_grain", w.simpleStringWithNodeId()))
      case _ => ()
    }
    out.toSeq
  }

  /** Broadcast-HINT violations on the optimized logical plan: a
    * `broadcast(...)` hint pinning an unbounded raw-fact subtree.
    */
  def auditHints(name: String, plan: LogicalPlan): Seq[(String, String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    def check(hint: Option[HintInfo], side: LogicalPlan, label: String): Unit =
      if (hint.exists(_.strategy.contains(BROADCAST)) &&
          !logicalBounded(side) && logicalRawFact(side))
        out += ((name, "hinted_broadcast_raw_fact",
          s"$label :: ${side.treeString.linesIterator.take(4).mkString(" | ").take(300)}"))
    plan.foreach {
      case j: LogicalJoin =>
        check(j.hint.leftHint, j.left, "left")
        check(j.hint.rightHint, j.right, "right")
      case _ => ()
    }
    out.toSeq
  }

  /** Logical twin of [[bounded]]. */
  private def logicalBounded(p: LogicalPlan): Boolean = {
    var found = false
    p.foreach {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit | _: LocalRelation |
           _: OneRowRelation | _: LogicalRange => found = true
      case f: LogicalFilter if keyRangeBounded(f.condition) => found = true
      case _ => ()
    }
    found
  }

  /** The logical subtree reads one of the corpus-scaling fact tables. */
  private def logicalRawFact(p: LogicalPlan): Boolean = {
    var found = false
    p.foreach {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          if (fs.location.rootPaths.exists(rp =>
            factTables.exists(t => rp.toString.contains(s"$t.parquet")))) found = true
        case _ => ()
      }
      case _ => ()
    }
    found
  }

  /** Subtree row count is capped by something other than the corpus
    * size: an aggregate (group count ≤ grain), any Limit, or a
    * driver-side local relation (literal/collected model tables).
    */
  private def bounded(p: SparkPlan): Boolean = {
    var found = false
    p.foreach {
      case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => found = true
      // ReusedExchange is a LEAF — resolve to the original subtree it
      // shares (a window above a reused day-grain aggregate is bounded)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        if (bounded(r.child)) found = true
      case n if n.nodeName.contains("Limit") || n.nodeName.contains("TakeOrdered") => found = true
      // driver-side bounded sources: literal tables, localCheckpoint'ed
      // small grains (Scan ExistingRDD), parameter grids (Range),
      // single-row relations
      case n if n.nodeName.contains("LocalTableScan") || n.nodeName.contains("ExistingRDD") ||
        n.nodeName.contains("OneRowRelation") || n.nodeName == "Range" => found = true
      // a literal RANGE/EQUALITY predicate on a dense unique key caps
      // the row count by the literal, not the corpus (the v2-style
      // query-set filter `vec_id < 10`: ≤10 rows at ANY scale). A
      // modulo/hash sample does NOT qualify — it scales with the data.
      case f: org.apache.spark.sql.execution.FilterExec
        if keyRangeBounded(f.condition) => found = true
      case _ => ()
    }
    found
  }

  /** Dense unique keys whose literal upper bound caps row count. */
  private val denseKeys = Set("vec_id", "doc_id")

  private def keyRangeBounded(
      cond: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def keyed(e: Expression): Boolean = e match {
      case a: AttributeReference => denseKeys(a.name)
      case Cast(c, _, _, _) => keyed(c)
      case _ => false
    }
    cond.exists {
      case LessThan(k, _: Literal) => keyed(k)
      case LessThanOrEqual(k, _: Literal) => keyed(k)
      case GreaterThan(_: Literal, k) => keyed(k)
      case GreaterThanOrEqual(_: Literal, k) => keyed(k)
      case EqualTo(k, _: Literal) => keyed(k)
      case EqualTo(_: Literal, k) => keyed(k)
      case In(k, vs) => keyed(k) && vs.forall(_.isInstanceOf[Literal])
      case _ => false
    }
  }

}
