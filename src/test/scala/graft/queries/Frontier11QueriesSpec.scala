package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the eleventh frontier batch. */
class Frontier11QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a44 rho is in [-1,1]; a perfectly sorted series gives rho = 1") {
    val rows = run("a44_spearman_trend").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0))
    // closed-form sanity: identical permutations -> d2 = 0 -> rho = 1
    val n = 5L
    assert(1 - (6.0 * 0) / (n * (n * n - 1)) == 1.0)
  }

  test("ev40 underwater totals are consistent with w9 drawdown positivity") {
    val uw = run("ev40_time_underwater").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dd = run("w9_max_drawdown").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    uw.foreach { case (user, (mx, tot)) =>
      assert(mx <= tot)
      // a user with any underwater event must have a positive max drawdown
      if (tot > 0) assert(dd(user) > 0.0)
      if (tot == 0) assert(dd(user) == 0.0)
    }
  }

  test("t35 entropy is positive and bounded by log of the bigram alphabet") {
    val rows = run("t35_bigram_entropy").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val h = r.getDouble(1)
      assert(h > 0.0)
      assert(h < math.log(27.0 * 27.0 * 2)) // lower+space+punct alphabet bound
    }
  }
}
