package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the twenty-eighth frontier batch. */
class Frontier28QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a75 Theil index is non-negative and bounded by ln(n)") {
    val r = run("a75_theil_index").collect()(0)
    val (n, theil) = (r.getLong(0), r.getDouble(1))
    assert(n > 0)
    assert(theil >= -1e-6, s"Theil must be non-negative, got $theil")
    assert(theil <= math.log(n.toDouble) + 1e-6, s"Theil $theil above ln($n)")
  }

  test("a76 Wilson intervals contain p_hat and stay inside [0,1]") {
    val rows = run("a76_wilson_ci").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(lo >= -1e-9 && hi <= 1.0 + 1e-9, s"interval [$lo,$hi] outside [0,1]")
      assert(lo <= p + 1e-9 && p <= hi + 1e-9, s"p_hat $p outside [$lo,$hi]")
      assert(hi - lo > 0, "interval must have positive width")
    }
  }

  test("c29 budget plan: allocations feasible, budget conserved up to rounding") {
    val rows = run("c29_token_budget_plan").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1), "allocation cannot exceed inventory")
      assert(r.getLong(3) <= r.getLong(2), "granted bounded by asked")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
    }
    val totalAlloc = rows.map(_.getLong(4)).sum
    // never over budget; close to it unless the whole corpus is smaller
    assert(totalAlloc <= 1000000L)
    val inventory = rows.map(_.getLong(1)).sum
    if (inventory >= 1000000L)
      assert(totalAlloc > 900000L, s"only $totalAlloc of the 1M budget allocated")
  }
}
