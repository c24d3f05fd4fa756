package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the thirty-seventh frontier batch. */
class Frontier37QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("u33 DPP join: result covers only the three audit days") {
    val rows = run("u33_dpp_join").collect()
    val flat = graft.Tables.events(spark, sf("sf0.01"))
    val d0 = flat.agg(min(col("ts").cast("date"))).collect()(0).getDate(0)
    val expected = flat
      .filter(col("ts").cast("date") <= date_add(lit(d0), 2))
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every error-day <= d0+2 is a real day, so the join keeps exactly those days
    rows.foreach(r => assert(r.getLong(1) == expected(r.getString(0))))
  }

  test("a89 capture-recapture: overlap bounds and estimator ordering") {
    val r = run("a89_capture_recapture").collect()(0)
    val (n1, n2, m, nTrue) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(m <= math.min(n1, n2))
    assert(nTrue >= math.max(n1, n2))
    if (m > 0) {
      val lp = r.getDouble(4)
      // LP estimate is at least the union lower bound n1 + n2 - m
      assert(lp >= (n1 + n2 - m) - 1e-6)
      // Chapman <= LP always (bias correction shrinks)
      assert(r.getLong(5) <= lp + 1e-6)
    }
  }

  test("a90 odds ratio: table conserves users; OR/RR relationship sane") {
    val r = run("a90_odds_ratio").collect()(0)
    val total = r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3)
    val users = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id")).distinct().count()
    assert(total == users)
    if (!r.isNullAt(4) && !r.isNullAt(5)) {
      val (or, rr) = (r.getDouble(4), r.getDouble(5))
      // OR is farther from 1 than RR (standard inequality)
      assert((or - 1.0) * (rr - 1.0) >= -1e-9, "OR and RR must agree in direction")
    }
  }

  test("c37 temperature mix: allocation conserves the budget exactly") {
    val rows = run("c37_temperature_mix").collect()
    assert(rows.length == 20)
    assert(rows.map(_.getLong(3)).sum == 100000L, "Hamilton apportionment must conserve")
    // sqrt damping: allocation ordering follows token ordering
    val byTokens = rows.sortBy(_.getLong(1))
    val allocs = byTokens.map(_.getLong(3))
    assert(allocs.zip(allocs.tail).forall { case (a, b) => a <= b + 1 },
      "near-monotone in inventory (ties may flip by 1 via remainders)")
  }
}
