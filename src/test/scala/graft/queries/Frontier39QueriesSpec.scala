package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the thirty-ninth frontier batch. */
class Frontier39QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a92 SPRT: LLR matches the closed form k*c1 + m*c2; decision consistent") {
    val r = run("a92_sprt").collect()(0)
    val ev = graft.Tables.events(spark, sf("sf0.01"))
    val k = ev.filter(col("event_type") === "purchase").count()
    val m = ev.count() - k
    assert(r.getLong(1) == k * 182321L + m * -10583L, "final LLR closed form")
    val decision = r.getString(2)
    assert(Set("accept_h1", "accept_h0", "continue")(decision))
    if (decision == "continue") assert(r.isNullAt(3))
    else assert(!r.isNullAt(3))
  }

  test("t50 source similarity: symmetric-triangle row count and cosine bounds") {
    val rows = run("t50_source_similarity").collect()
    assert(rows.length == 20 * 19 / 2)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0)
      val c = r.getDouble(3)
      assert(c >= 0.0 && c <= 1.0 + 1e-9, s"cosine out of bounds: $c")
    }
  }

  test("u35 column profile: keys are unique so distinct == rows for o_orderkey") {
    val rows = run("u35_column_profile").collect()
      .map(r => r.getString(0) -> r).toMap
    val n = graft.Tables.orders(spark, sf("sf0.01")).count()
    assert(rows.size == 5)
    rows.values.foreach(r => assert(r.getLong(1) == n && r.getLong(2) == 0))
    assert(rows("o_orderkey").getLong(3) == n, "primary key must be all-distinct")
    assert(rows("o_orderstatus").getLong(3) <= 3)
  }

  test("f6 try functions: null accounting matches the dirty-data synthesis") {
    val r = run("f6_try_functions").collect()(0)
    val keys = graft.Tables.orders(spark, sf("sf0.01"))
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val n = keys.length
    assert(r.getLong(0) == n)
    // denom is zero when key % 7 == 0 (explicit) OR key % 5 == 0 (modulus)
    assert(r.getLong(1) == keys.count(k => k % 7 == 0 || k % 5 == 0), "div-by-zero nulls")
    assert(r.getLong(2) == keys.count(_ % 5 == 0), "parse nulls")
    assert(r.getLong(3) == keys.filter(_ % 5 != 0).sum, "parsed sum")
  }
}
