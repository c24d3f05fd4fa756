package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fourth frontier batch. */
class Frontier4QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("w10 integer band test agrees with the float |x-mu| > 2*sigma rule") {
    // the algebraic identity on a hand series: frame [1,1,1,1,1,1,1,9]
    // mu = 2, sigma^2 = 7/8; (9-2)^2 = 49 > 4*7/8 = 3.5 -> breakout
    val xs = Seq(1L, 1L, 1L, 1L, 1L, 1L, 1L, 9L)
    val s0 = xs.sum; val q0 = xs.map(v => v * v).sum; val x = xs.last
    val intSide = 2 * (8 * x - s0) * (8 * x - s0) > 64 * q0 - 8 * s0 * s0
    val mu = s0.toDouble / 8
    val variance = xs.map(v => (v - mu) * (v - mu)).sum / 8
    val floatSide = (x - mu) * (x - mu) > 4 * variance
    assert(intSide == floatSide && intSide)
    val rows = run("w10_bollinger_breakout").collect()
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("a36 PSI is nonnegative and zero for an identical distribution") {
    // PSI >= 0 always (Jensen); identical halves give exactly 0 terms
    val rows = run("a36_psi_drift").collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getDouble(1) >= 0.0))
  }

  test("ev33 shortlist is the true top-5 by |residual|") {
    val rows = run("ev33_seasonal_residuals").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    val sorted = rows.sortBy(_.getInt(1)).map(r => math.abs(r.getDouble(2)))
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
  }
}
