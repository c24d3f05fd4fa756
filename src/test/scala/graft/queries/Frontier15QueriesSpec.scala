package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fifteenth frontier batch. */
class Frontier15QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("v18 power iteration: unit-normalized, deterministic, aligned with the spectrum") {
    val rows = run("v18_power_iteration").collect()
    assert(rows.length == 64)
    val v = rows.sortBy(_.getInt(0)).map(_.getLong(1))
    // L-inf normalization: max |v| is exactly 1e9 (the normalization fixes it)
    assert(v.map(math.abs).max == 1000000000L)
    v.foreach(x => assert(math.abs(x) <= 1000000000L))
    // deterministic re-run (integer arithmetic — must be bit-identical)
    val v2 = run("v18_power_iteration").collect().sortBy(_.getInt(0)).map(_.getLong(1))
    assert(v.sameElements(v2))
    // the direction is a genuine eigen-direction estimate: its Rayleigh
    // quotient must dominate a fixed arbitrary direction's (dim 1)
    val emb = graft.Tables.embeddings(spark, sf("sf0.01"))
      .select(col("embedding")).collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val vd = v.map(_.toDouble)
    def rayleigh(dir: Array[Double]): Double = {
      val nrm = math.sqrt(dir.map(x => x * x).sum)
      val u = dir.map(_ / nrm)
      emb.map(row => { val d = row.zip(u).map { case (a, b) => a * b }.sum; d * d }).sum
    }
    val e1 = Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0)
    assert(rayleigh(vd) >= rayleigh(e1))
  }

  test("a47 RFM segments partition all ordering customers into valid quintiles") {
    val rows = run("a47_rfm_segments").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(r.getInt(0), r.getInt(1), r.getInt(2)).foreach(q => assert(q >= 1 && q <= 5))
      assert(r.getLong(3) > 0)
    }
    val nCustomers = rows.map(_.getLong(3)).sum
    val expected = graft.Tables.orders(spark, sf("sf0.01"))
      .select(col("o_custkey")).distinct().count()
    assert(nCustomers == expected)
    // each quintile dimension individually holds ~n/5 customers (exact
    // equal-count buckets by the closed form: sizes differ by at most 1)
    val byR = rows.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(3)).sum).toMap
    assert(byR.keySet == Set(1, 2, 3, 4, 5))
    assert(byR.values.max - byR.values.min <= 1)
  }
}
