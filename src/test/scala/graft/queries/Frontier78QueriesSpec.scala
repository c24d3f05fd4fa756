package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the seventy-eighth frontier batch. */
class Frontier78QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("u63 WAP: all audits pass on the clean corpus; verdict is publish") {
    val r = run("u63_write_audit_publish").collect()(0)
    assert(r.getLong(0) == 30)
    (1 to 4).foreach(i => assert(r.getInt(i) == 1, s"audit $i failed"))
    assert(r.getLong(5) >= 0 && r.getLong(5) < 1000000007L)
    assert(r.getInt(6) == 1, "verdict should be publish")
  }

  test("v47 bit balance: median threshold always at least as balanced") {
    val rows = run("v47_bit_balance").collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val (z, m) = (r.getLong(2), r.getLong(3))
      assert(z >= 0 && z <= 1000 && m >= 0 && m <= 1000)
      // the exact median split is within 1 element of perfect balance,
      // so its permille imbalance is at most ~1 (n=1000 at sf0.01)
      assert(m <= 2, s"dim ${r.getInt(0)}: median imbalance $m")
      assert(m <= z + 2, "median threshold cannot be worse than zero threshold")
    }
    // at least some dims are skewed at threshold zero (else the sweep
    // would be pointless on this corpus)
    assert(rows.exists(_.getLong(2) > 50))
  }

  test("ev91 first-session share: conservation and bounds") {
    val rows = run("ev91_first_session_share").collect()
    val nUsers = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nUsers)
    val totalPurchases = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100).cast("long"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(3)).sum == totalPurchases)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3))
      if (!r.isNullAt(4))
        assert(r.getLong(4) == r.getLong(2) * 1000 / r.getLong(3))
    }
  }
}
