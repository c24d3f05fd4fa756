package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Meta-test for the plan-convention sweep: a detector that silently
  * stops firing would let "audited=582 violations=0" go vacuous, so
  * each rule is fed a deliberately-violating plan and must fire, plus
  * a conventional plan as the negative control. (AQE is disabled per
  * plan build, matching PlanSweep's own session — under AQE the
  * executedPlan root is an unfinalized AdaptiveSparkPlanExec.)
  */
class PlanSweepDetectorSpec extends SparkSpec {

  private def events = Tables.events(spark, sf())
  private def nation = Tables.nation(spark, sf())

  // both audit passes, like PlanSweep.main: physical conventions on the
  // executed plan, broadcast-hint discipline on the optimized logical plan
  private def rules(df: => DataFrame): Set[String] = {
    val before = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val qe = df.queryExecution
      (PlanSweep.audit("probe", qe.executedPlan) ++
        PlanSweep.auditHints("probe", qe.optimizedPlan)).map(_._2).toSet
    } finally spark.conf.set("spark.sql.adaptive.enabled", before)
  }

  test("cartesian_product fires on a forced cartesian of two raw scans") {
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(rules(events.crossJoin(nation)).contains("cartesian_product"))
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("unbounded_bnlj fires when the broadcast side is a raw fact scan") {
    // crossJoin broadcasts the smaller side; force the FACT side under
    // the threshold check by broadcasting it explicitly
    assert(rules(nation.crossJoin(broadcast(events))).contains("unbounded_bnlj"))
  }

  test("global_window_raw_grain fires on an unpartitioned window over a raw scan") {
    val df = events.withColumn("rn", row_number().over(Window.orderBy(col("ts"))))
    assert(rules(df).contains("global_window_raw_grain"))
  }

  test("hinted_broadcast_raw_fact fires on a broadcast() hint pinning the fact side") {
    val df = nation.join(broadcast(events),
      col("n_nationkey") === col("user_id") % 25)
    assert(rules(df).contains("hinted_broadcast_raw_fact"))
  }

  test("an optimizer-chosen broadcast of a tiny fact scan does NOT fire (stats self-revert at scale)") {
    // no hint: at sf0.001 the optimizer broadcasts events from size
    // stats, which is the right plan at this size and flips to a
    // shuffle join when stats grow — not a violation
    val df = nation.join(events, col("n_nationkey") === col("user_id") % 25)
    assert(!rules(df).contains("hinted_broadcast_raw_fact"))
  }

  test("a hinted broadcast of an AGGREGATED fact derivation does NOT fire") {
    val perUser = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val df = nation.join(broadcast(perUser), col("n_nationkey") === col("user_id") % 25)
    assert(!rules(df).contains("hinted_broadcast_raw_fact"))
  }

  test("negative control: the conventional shapes pass clean") {
    // aggregate-then-global-window (the per-shard offset shape) and a
    // broadcast DIM join are the repo's standing conventions
    val agg = events.groupBy(col("user_id") % 10).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(Window.orderBy(col("n"))))
    assert(rules(agg).isEmpty)
    val dimJoin = events.join(broadcast(nation), col("user_id") % 25 === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
    assert(rules(dimJoin).isEmpty)
  }
}
