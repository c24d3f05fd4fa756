package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guard for the thirty-first frontier batch. */
class Frontier31QueriesSpec extends SparkSpec {

  test("a80 Benford: all nine digits, counts conserve, chi2 consistent") {
    val rows = graft.SparkEntry.queries("a80_benford_conformance")(spark, sf("sf0.01"))
      .collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == (1 to 9))
    val observed = rows.map(_.getLong(1)).sum
    val total = graft.Tables.orders(spark, sf("sf0.01"))
      .filter(col("o_totalprice") > 0).count()
    assert(observed == total)
    // expected masses sum to ~N (Benford probs sum to 1)
    val expSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(expSum - total) < total * 1e-4)
    // one chi2 value, matches a direct recompute from the rows
    val chi2s = rows.map(_.getDouble(3)).distinct
    assert(chi2s.length == 1 && chi2s.head >= 0)
    val direct = rows.map { r =>
      val o = r.getLong(1).toDouble; val e = r.getDouble(2)
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(chi2s.head - direct) < math.max(1e-4, direct * 1e-5))
  }
}
