package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the twenty-fourth frontier batch. */
class Frontier24QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a66 revenue retention: GRR <= NRR-with-churn bound and GRR <= 1-ish identities") {
    val rows = run("a66_revenue_retention").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (prior, retained, nextRev) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(retained <= prior, "gross retention can never exceed prior revenue")
      assert(retained <= nextRev, "retained (min) is bounded by the cohort's next-week revenue")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getDouble(5) >= r.getDouble(4) - 1e-9, "NRR >= GRR by construction")
    }
  }

  test("a68 mutual information: non-negative and bounded by the min marginal entropy") {
    val rows = run("a68_mutual_information").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val mi = r.getDouble(2)
      assert(mi >= -1e-6, s"${r.getString(0)}: MI must be non-negative, got $mi")
      assert(mi < 3.5, s"${r.getString(0)}: MI $mi above any plausible entropy bound")
    }
    // independence sanity: event_type vs weekday is near-independent in
    // the generator → MI close to zero
    val ev = rows.find(_.getString(0) == "event_type|weekday").get.getDouble(2)
    assert(ev < 0.05, s"event_type|weekday MI should be near zero, got $ev")
  }

  test("ev52 backtest: three models over the same days; seasonal beats naive on a weekly series") {
    val rows = run("ev52_forecast_backtest").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet == Set("naive", "seasonal_naive", "drift"))
    val ns = rows.values.map(_._1).toSet
    assert(ns.size == 1, "all models backtest over the identical day set")
    rows.values.foreach { case (_, mae) => assert(mae >= 0.0) }
  }
}
