package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the twenty-ninth frontier batch. */
class Frontier29QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a78 runs test: run count within [1, n], expectation formula consistent") {
    val r = run("a78_runs_test").collect()(0)
    val (runs, np, nm) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(runs >= 1 && runs <= np + nm)
    val expected = 1.0 + 2.0 * (np * nm).toDouble / (np + nm).toDouble
    assert(math.abs(r.getDouble(3) - expected) < 1e-5)
    if (!r.isNullAt(4)) {
      val z = r.getDouble(4)
      assert(!z.isNaN && !z.isInfinite)
      // generator revenue is iid around its median → no extreme z
      assert(math.abs(z) < 5.0, s"runs z-statistic implausibly extreme: $z")
    }
  }

  test("c30 shard balance: sizes conserve and md5 is near-uniform on this population") {
    val r = run("c30_shard_balance").collect()(0)
    assert(r.getLong(0) <= 64)
    val meanCalc = r.getDouble(3)
    val total = graft.Tables.documents(spark, sf("sf0.01")).count()
    assert(math.abs(meanCalc * r.getLong(0) - total) < 1.0)
    assert(r.getLong(1) <= r.getLong(2))
    // a cryptographic hash over thousands of keys: imbalance stays modest
    assert(r.getDouble(4) >= 1.0 && r.getDouble(4) < 3.0)
  }

  test("v22 outliers: two-sigma rule flags a minority; flag equals driver recompute") {
    val rows = run("v22_embedding_outliers").collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.Tables.embeddings(spark, sf("sf0.01")).count())
    rows.foreach { r =>
      // Chebyshev: > 2 sigma can never exceed 1/4 of the mass
      assert(r.getDouble(3) <= 0.25 + 1e-9,
        s"label ${r.getInt(0)}: ${r.getDouble(3)} breaks the Chebyshev bound")
    }
    // driver recompute for one label
    val emb = graft.Tables.embeddings(spark, sf("sf0.01"))
      .filter(col("label") === 0)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 10000.0).toLong).toArray)
    val n = BigInt(emb.length)
    val sums = Array.tabulate(64)(j => emb.map(v => BigInt(v(j))).sum)
    val ds = emb.map { v =>
      (0 until 64).map(j => { val t = n * BigInt(v(j)) - sums(j); t * t }).sum
    }
    val s1 = ds.sum; val s2 = ds.map(x => x * x).sum
    val flagged = ds.count(di => {
      val lhs = n * di - s1
      lhs > 0 && lhs * lhs > BigInt(4) * (n * s2 - s1 * s1)
    })
    assert(rows.find(_.getInt(0) == 0).get.getLong(2) == flagged)
  }
}
