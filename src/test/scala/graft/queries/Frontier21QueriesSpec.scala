package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the twenty-first frontier batch. */
class Frontier21QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a60 lift chart: gains monotone to 1.0, lift weighted-averages to 1") {
    val rows = run("a60_decile_lift").collect().sortBy(_.getInt(0))
    assert(rows.length == 10)
    val gains = rows.map(_.getDouble(4))
    gains.zip(gains.tail).foreach { case (a, b) => assert(b >= a) }
    assert(math.abs(gains.last - 1.0) < 1e-9)
    // users split into equal-count deciles
    assert(rows.map(_.getLong(1)).max - rows.map(_.getLong(1)).min <= 1)
    // Σ n_resp = total responders; overall lift is 1 by construction
    val totalResp = rows.map(_.getLong(2)).sum
    val totalUsers = rows.map(_.getLong(1)).sum
    val overall = totalResp.toDouble / totalUsers
    val weighted = rows.map(r => r.getDouble(3) * r.getLong(1)).sum / totalUsers
    assert(math.abs(weighted - overall) < 1e-6)
  }

  test("u26 erasure report: erased + remaining = total, cohort consistent across tables") {
    val rows = run("u26_erasure_impact").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows.keySet == Set("customer", "orders", "events"))
    rows.values.foreach { case (t, e, r) => assert(e + r == t) }
    // the customer-side cohort count equals the deterministic md5 rule
    val expected = graft.Tables.customer(spark, sf("sf0.01"))
      .filter(substring(md5(col("c_custkey").cast("string")), 1, 1) === "0").count()
    assert(rows("customer")._2 == expected)
    // erased orders only belong to erased customers
    val ordersOfSubjects = graft.Tables.orders(spark, sf("sf0.01"))
      .join(graft.Tables.customer(spark, sf("sf0.01"))
        .filter(substring(md5(col("c_custkey").cast("string")), 1, 1) === "0"),
        col("o_custkey") === col("c_custkey")).count()
    assert(rows("orders")._2 == ordersOfSubjects)
  }

  test("u25 rebalance plan: buckets contiguous and nondecreasing, splits only when oversized") {
    val rows = run("u25_rebalance_plan").collect().sortBy(_.getDate(0).getTime)
    assert(rows.nonEmpty)
    val buckets = rows.map(_.getLong(2))
    buckets.zip(buckets.tail).foreach { case (a, b) => assert(b >= a) }
    rows.foreach { r =>
      val (rowsIn, split, action) = (r.getLong(1), r.getLong(3), r.getString(4))
      assert(split >= 1)
      if (action == "split") assert(split > 1)
      if (split > 1) assert(action == "split")
    }
  }
}
