package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, DupNgrams, IntSqrt, RollingHash, SortedOverlap}

/** Engine extension point: registers graft's native Catalyst
  * expressions with the session so they are callable from SQL and
  * resolvable by name anywhere a plan is parsed.
  *
  * Enable with `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_overlap"),
      new ExpressionInfo(classOf[SortedOverlap].getCanonicalName, "graft_overlap"),
      (children: Seq[Expression]) => SortedOverlap(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_isqrt"),
      new ExpressionInfo(classOf[IntSqrt].getCanonicalName, "graft_isqrt"),
      (children: Seq[Expression]) => IntSqrt(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_rollhash"),
      new ExpressionInfo(classOf[RollingHash].getCanonicalName, "graft_rollhash"),
      (children: Seq[Expression]) => RollingHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dupgrams"),
      new ExpressionInfo(classOf[DupNgrams].getCanonicalName, "graft_dupgrams"),
      (children: Seq[Expression]) => DupNgrams(children.head, children(1))))
    // Spark's Bloom-filter sketch aggregate + membership probe exist in
    // catalyst but are not in the public function registry (they're
    // planted by the runtime-filter rule); expose them so the explicit
    // sketch-prefilter pattern (j7) is writable as a query
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]
          .getCanonicalName, "graft_bloom_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]
          .getCanonicalName, "graft_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
    // band-join → bucketed equi-join rewrite (plans.RangeJoinRewrite):
    // the whole-plan rung of the extension ladder — a Rule[LogicalPlan]
    // for semantics the built-in planner can only express as a
    // nested-loop join
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRewrite(session))
    // native as-of join (plans.NativeAsofJoin): marker function →
    // logical node (optimizer rule) → custom SparkStrategy → physical
    // co-partitioned streaming merge
    ext.injectFunction((
      FunctionIdentifier("graft_asof"),
      new ExpressionInfo(classOf[graft.plans.AsofMarker].getCanonicalName, "graft_asof"),
      (children: Seq[Expression]) =>
        graft.plans.AsofMarker(children(0), children(1), children(2), children(3))))
    ext.injectOptimizerRule(session => graft.plans.AsofRewrite(session))
    ext.injectPlannerStrategy(_ => new graft.plans.AsofStrategy)
  }
}
