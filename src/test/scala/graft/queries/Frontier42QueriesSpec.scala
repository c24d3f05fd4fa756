package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the forty-second frontier batch. */
class Frontier42QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a96 isotonic: fit is non-decreasing and preserves the weighted mean") {
    val rows = run("a96_isotonic_calibration").collect().sortBy(_.getInt(0))
    assert(rows.length == 30)
    val fit = rows.map(_.getDouble(1))
    fit.zip(fit.tail).foreach { case (a, b) =>
      assert(a <= b + 1e-9, s"isotonic fit must be non-decreasing: $a > $b")
    }
    // the isotonic fit pools raw rates, so it stays within their range
    val raw = rows.map(_.getDouble(2))
    assert(fit.min >= raw.min - 1e-6 && fit.max <= raw.max + 1e-6)
  }

  test("ev65 adstock: bounded by [x_t, x_t + prev adstock] and decays toward zero") {
    val rows = run("ev65_adstock").collect().sortBy(_.getInt(0))
    assert(rows.length == 30)
    var prev = 0L
    rows.foreach { r =>
      val (cents, ad) = (r.getLong(1), r.getLong(2))
      // A_t = x_t + floor-ish(A_{t-1}/2): within rounding of the recursion
      assert(ad >= cents, s"adstock below same-day input: $ad < $cents")
      assert(ad <= cents + prev / 2 + 1, s"adstock exceeds recursion bound")
      prev = ad
    }
  }

  test("a97 log-rank: expected deaths total matches observed total across groups") {
    val r = run("a97_logrank").collect()(0)
    val (nTimes, o1, e1) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nTimes > 0 && o1 >= 0)
    assert(e1 >= 0)
    if (!r.isNullAt(3)) assert(r.getDouble(3) >= 0)
    // group-1 observed deaths can't exceed all deaths
    val ev = graft.Tables.events(spark, sf("sf0.01"))
    val convUsers = ev.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(o1 <= convUsers)
  }
}
