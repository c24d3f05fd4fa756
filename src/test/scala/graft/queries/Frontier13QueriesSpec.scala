package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the thirteenth frontier batch. */
class Frontier13QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a46 Lorenz curve is convex-monotone, ends at 1, and shares sum to 1") {
    val rows = run("a46_lorenz_curve").collect().sortBy(_.getInt(0))
    assert(rows.length == 10)
    val shares = rows.map(_.getDouble(2))
    val cums = rows.map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    assert(math.abs(cums.last - 1.0) < 1e-12)
    // ascending-revenue deciles: shares nondecreasing (sorted order)
    shares.zip(shares.tail).foreach { case (a, b) => assert(b >= a - 1e-12) }
    cums.zip(cums.tail).foreach { case (a, b) => assert(b >= a) }
  }

  test("t36 dedup impact conserves documents and tokens") {
    val rows = run("t36_dedup_impact").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // docs_after <= docs_before
      assert(r.getLong(4) <= r.getLong(3)) // tokens_after <= tokens_before
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 1.0)
    }
    // per-hash keepers: total docs_after == distinct md5 count (keeper
    // attribution is per-source of the keeper doc)
    val docsAfter = rows.map(_.getLong(2)).sum
    val distinctTexts = graft.Tables.documents(spark, sf("sf0.01"))
      .select(md5(col("text"))).distinct().count()
    assert(docsAfter == distinctTexts)
  }
}
