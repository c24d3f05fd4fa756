package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the forty-eighth frontier batch. */
class Frontier48QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a104 ablation: six variants; moments subtraction matches a direct recount") {
    val rows = run("a104_group_ablation").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getString(0)).contains("all"))
    val nAll = rows.find(_.getString(0) == "all").get.getLong(1)
    // each ablated variant drops exactly that group's rows
    val counts = graft.Tables.events(spark, sf("sf0.01"))
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.filter(_.getString(0) != "all").foreach { r =>
      assert(r.getLong(1) == nAll - counts(r.getString(0)),
        s"${r.getString(0)}: n mismatch")
    }
    // r^2 in [-1e6, 1e6]
    rows.foreach(r => if (!r.isNullAt(2))
      assert(math.abs(r.getLong(2)) <= 1000000L))
  }

  test("u40 bitmap index: popcount algebra equals direct predicate counts") {
    val r = run("u40_bitmap_index").collect()(0)
    val (nA, nB, nAnd, nOr) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nAnd == r.getLong(5), "AND via bitmaps == direct count")
    assert(nOr == r.getLong(6), "OR via bitmaps == direct count")
    assert(nAnd + nOr == nA + nB, "inclusion-exclusion holds in bit space")
    val nPurch = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "purchase").count()
    assert(nA == nPurch, "bitmap A popcount == row count of its predicate")
  }

  test("j11 allocation: conserves the header total exactly; shares proportional") {
    val rows = run("j11_revenue_allocation").collect()
    val byOrder = rows.groupBy(_.getLong(0))
    val totals = graft.Tables.orders(spark, sf("sf0.01"))
      .select(col("o_orderkey"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 100)
          .cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byOrder.foreach { case (ok, g) =>
      assert(g.map(_.getLong(2)).sum == totals(ok),
        s"order $ok: allocation does not conserve the total")
    }
    // every line of every order allocated
    val nLines = graft.Tables.lineitem(spark, sf("sf0.01")).count()
    assert(rows.length == nLines)
  }
}
