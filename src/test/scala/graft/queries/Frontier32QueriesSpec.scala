package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the thirty-second frontier batch. */
class Frontier32QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a81 tau-b: pair classes partition the pair space; tau in [-1,1]") {
    val r = run("a81_kendall_tau").collect()(0)
    val (n0, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(c + d <= n0)
    if (!r.isNullAt(5)) {
      val tau = r.getDouble(5)
      assert(tau >= -1.0 - 1e-9 && tau <= 1.0 + 1e-9)
    }
    // n0 = C(days, 2)
    val days = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("ts").cast("date")).distinct().count()
    assert(n0 == days * (days - 1) / 2)
  }

  test("t45 JS divergence is non-negative and bounded by ln 2") {
    val r = run("t45_js_divergence").collect()(0)
    val (nTerms, js) = (r.getLong(0), r.getDouble(1))
    assert(nTerms > 0)
    assert(js >= -1e-6, s"JS must be non-negative, got $js")
    assert(js <= math.log(2.0) + 1e-6, s"JS $js above ln2")
  }

  test("a82 Durbin-Watson sits in (0,4) on the detrended series") {
    val r = run("a82_durbin_watson").collect()(0)
    assert(r.getLong(0) > 2)
    if (!r.isNullAt(1)) {
      val dw = r.getDouble(1)
      assert(dw > 0.0 && dw < 4.0, s"DW out of range: $dw")
    }
  }

  test("v23 hubness: occurrence mass equals 3 per query and vectors conserve") {
    val rows = run("v23_hubness").collect()
    val nVecs = graft.Tables.embeddings(spark, sf("sf0.01")).count()
    assert(rows.map(_.getLong(1)).sum == nVecs)
    // every vector issues exactly 3 neighbor slots (labels have > 3 members)
    val slotMass = rows.map(r => r.getLong(0) * r.getLong(1)).sum
    assert(slotMass == nVecs * 3,
      s"occurrence mass $slotMass != ${nVecs * 3} (3 slots per query)")
  }
}
