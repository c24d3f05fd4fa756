package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the ninth frontier batch. */
class Frontier9QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("u21 sharded prefix max equals the single-window global prefix max") {
    import org.apache.spark.sql.expressions.Window
    val d = sf("sf0.01")
    val sharded = run("u21_watermark_sizing", d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // single unpartitioned window (fine at spec scale) as the referee
    val o = graft.Tables.events(spark, d)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("arr_us", col("ts_us") + (col("event_id") % 7) * lit(120000000L))
    val w = Window.orderBy(col("arr_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = o.withColumn("late_us", max(col("ts_us")).over(w) - col("ts_us"))
      .select(
        when(col("late_us") === 0, "a_on_time")
          .when(col("late_us") < 60000000L, "b_under_1m")
          .when(col("late_us") < 600000000L, "c_under_10m")
          .when(col("late_us") < 3600000000L, "d_under_1h")
          .otherwise("e_over_1h").as("bucket"),
        col("late_us"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), max("late_us").as("mx")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sharded == ref)
    assert(sharded.size > 1, "delay model must produce real lateness")
  }

  test("u21 plan has no unpartitioned window over the event stream") {
    val plan = run("u21_watermark_sizing").queryExecution.executedPlan.toString
    // the only Window without partitionBy runs on the 32-row shard table;
    // the event-stream window must carry the shard partition key
    val windows = plan.split("\n").filter(_.contains("Window "))
    assert(windows.exists(_.contains("shard#")), "event-stream window must be shard-partitioned")
  }

  test("j7 bloom prefilter preserves the exact join result and prunes the scan") {
    val d = sf("sf0.01")
    val got = run("j7_bloom_prefilter_join", d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dims = graft.Tables.customer(spark, d).filter(col("c_acctbal") < 0)
      .select(col("c_custkey"))
    val plain = graft.Tables.orders(spark, d)
      .join(dims, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == plain)
    // the prefilter itself must pass every true key (no false negatives)
    val plan = run("j7_bloom_prefilter_join", d).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom probe missing from the plan")
  }
}
