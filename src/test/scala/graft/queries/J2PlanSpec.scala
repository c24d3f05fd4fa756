package graft.queries

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** j2's registered plan must be the engine's real 1:M shape: explode
  * over an already-nested source. A collect_list in the measured plan
  * would mean re-assembling arrays per key — memory-unbounded on a
  * skewed parent (the r1/r2 demo caveat this replaces).
  */
class J2PlanSpec extends SparkSpec {

  test("j2 plan has no collect_list and round-trips lineitem exactly") {
    val df = SparkEntry.queries("j2_explode_child_table")(spark, sf())
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("collect_list"), plan.take(500))
    assert(plan.toLowerCase.contains("generate"), "explode must drive the plan")

    val got = df.groupBy().agg(count(lit(1)).as("n"),
        sum(xxhash64(col("l_orderkey"), col("l_linenumber"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("h"))
      .collect()(0)
    val li = Tables.lineitem(spark, sf())
    val want = li.groupBy().agg(count(lit(1)).as("n"),
        sum(xxhash64(col("l_orderkey"), col("l_linenumber"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("h"))
      .collect()(0)
    assert(got == want, s"exploded rows must equal the flat child table: $got vs $want")
  }
}
