package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the seventy-seventh frontier batch. */
class Frontier77QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a138 raking: post-fit column margins match the week-1 targets closely") {
    val rows = run("a138_raking").collect()
    assert(rows.length == 35) // 5 types x 7 weekdays
    val total = rows.map(_.getLong(2)).sum.toDouble
    // after the final column step, event-type margins equal the week-1
    // shares up to the per-cell floor quantization
    val w1 = graft.Tables.events(spark, sf("sf0.01"))
      .filter(dayofmonth(col("ts").cast("date")) <= 7)
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val w1n = w1.values.sum.toDouble
    rows.groupBy(_.getString(0)).foreach { case (et, g) =>
      val share = g.map(_.getLong(2)).sum / total
      val target = w1(et) / w1n
      assert(math.abs(share - target) < 0.001, s"$et: $share vs $target")
    }
    rows.foreach(r => assert(r.getLong(2) > 0))
  }

  test("v46 filtered search: pre-filter dominates post-filter everywhere") {
    val rows = run("v46_filtered_search").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (pre, post, postN) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(pre <= 5 && post <= 5 && postN <= 5)
      assert(post <= postN, "hits bounded by returned results")
      // post-filter can only lose results relative to pre-filter
      assert(post <= pre, s"query ${r.getLong(0)}: post $post > pre $pre")
    }
    // the filter (1 of 10 labels) must starve post-filter somewhere
    assert(rows.exists(r => r.getLong(3) < 5),
      "post-filtering a selective predicate should under-fill k somewhere")
  }

  test("u62 cascade preview: totals reconcile with direct joins") {
    val rows = run("u62_cascade_delete_preview").collect()
    val doomed = graft.Tables.customer(spark, sf("sf0.01"))
      .filter(col("c_custkey") % 50 === 0)
    assert(rows.map(_.getLong(1)).sum == doomed.count())
    val orders = graft.Tables.orders(spark, sf("sf0.01"))
      .join(doomed, col("o_custkey") === col("c_custkey"))
    assert(rows.map(_.getLong(2)).sum == orders.count())
    assert(rows.map(_.getLong(3)).sum ==
      graft.Tables.lineitem(spark, sf("sf0.01"))
        .join(orders.select(col("o_orderkey").as("ok")), col("l_orderkey") === col("ok"))
        .count())
  }
}
