package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the third frontier batch. */
class Frontier3QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("ev31 streak invariants: longest <= active_days, streaks partition the days") {
    val rows = run("ev31_activity_streaks").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (active, longest, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(longest <= active)
      assert(n >= 1 && longest * n >= active) // n streaks of <= longest cover all days
    }
  }

  test("ev30 bounce rate is in [0,1] and bounces <= sessions") {
    val rows = run("ev30_session_bounce").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("a33 Gini is in [0,1) and matches the O(n^2) mean-absolute-difference form") {
    val row = run("a33_gini_revenue").head
    val gini = row.getDouble(2)
    assert(gini >= 0.0 && gini < 1.0)
    // independent formulation: G = sum_{i,j} |x_i - x_j| / (2 n^2 mu)
    val d = sf("sf0.01")
    val rev = graft.Tables.orders(spark, d).groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4))
        * lit(10000)).cast("long")).as("x"))
    val xs = rev.select("x").collect().map(_.getLong(0))
    val n = xs.length.toDouble
    val mu = xs.map(BigDecimal(_)).sum / n
    val mad = (for (a <- xs; b <- xs) yield (BigDecimal(a) - BigDecimal(b)).abs).sum
    val giniRef = (mad / (2 * n * n * mu)).toDouble
    assert(math.abs(gini - giniRef) < 1e-9, s"$gini vs $giniRef")
  }

  test("a34 FD profile: key-determined FDs have zero violations, known-violated ones do not") {
    val rows = run("a34_fd_profile").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows("nation: n_nationkey->n_regionkey") == 0L) // unique key LHS
    assert(rows("customer: c_nationkey->c_mktsegment") > 0L)
  }

  test("a35 trend decomposition is consistent: S = concordant - discordant, parts sum to pairs") {
    val r = run("a35_trend_test").head
    val (pairs, s, c, dd, t) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(s == c - dd)
    assert(c + dd + t == pairs)
  }
}
