package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the seventy-ninth frontier batch. */
class Frontier79QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("q32 eager aggregation: lineitems never cross the dimension joins") {
    val df = graft.SparkEntry.queries("q32_eager_aggregation")(spark, sf("sf0.01"))
    val rows = df.collect()
    assert(rows.length == 25)
    // semantic identity vs the naive formulation
    val naive = graft.Tables.lineitem(spark, sf("sf0.01"))
      .join(graft.Tables.orders(spark, sf("sf0.01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.customer(spark, sf("sf0.01")),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.nation(spark, sf("sf0.01")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count_distinct(col("o_orderkey")).as("n"),
        sum(floor(col("l_extendedprice") * 100).cast("long")).as("r"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (n, rev) = naive(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == rev)
    }
    // plan shape: the order-grain partial aggregate sits below the
    // customer/nation joins — dims broadcast onto the compacted side
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("t75 dedup savings: tiers are monotone (looser tier removes more)") {
    val rows = run("t75_dedup_savings").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val nDocs = graft.Tables.documents(spark, sf("sf0.01")).count()
    // exact keeps everything distinct (corpus has no byte-identical dups
    // at this scale) and prefix48 collapses the planted families
    assert(rows("exact")._1 + rows("exact")._2 == nDocs)
    assert(rows("normalized")._1 <= rows("exact")._1)
    assert(rows("prefix48")._1 <= rows("normalized")._1 ||
      rows("prefix48")._2 >= rows("normalized")._2)
    assert(rows("prefix48")._2 > 0, "planted prefix families must collapse")
  }

  test("v48 recall curve: monotone non-increasing in k is NOT required, " +
      "but bounds and totals must hold") {
    val rows = run("v48_recall_curve").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 3, 5, 10))
    rows.foreach { r =>
      val (hits, want, rec) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hits <= want)
      assert(rec == hits * 1000 / want)
      assert(want == r.getInt(0) * 10, "10 queries x k truth slots")
    }
    // the index finds at least something at every k
    assert(rows.forall(_.getLong(1) > 0))
  }
}
