package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the twelfth frontier batch. */
class Frontier12QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a45 clustering coefficient is in [0,1] and triangle count matches a18") {
    val r = run("a45_clustering_coeff").head
    val c = r.getDouble(3)
    assert(c >= 0.0 && c <= 1.0)
    // each triangle touches 3 nodes, so a18's per-node counts sum to
    // exactly 3x the global triangle count (same edge definition)
    val perNodeSum = run("a18_triangle_count")
      .agg(sum(col("n_triangles"))).head.getLong(0)
    assert(perNodeSum == 3 * r.getLong(1), s"$perNodeSum vs 3*${r.getLong(1)}")
  }

  test("u23 subject-access counts equal direct per-table filters") {
    val d = sf("sf0.01")
    val rows = run("u23_subject_access").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val subj = graft.Tables.customer(spark, d).filter(col("c_acctbal") < 0)
      .select(col("c_custkey"))
    assert(rows("customer") == subj.count())
    val orders = graft.Tables.orders(spark, d)
      .join(subj, col("o_custkey") === col("c_custkey"))
    assert(rows("orders") == orders.count())
    val li = graft.Tables.lineitem(spark, d)
      .join(orders.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"))
    assert(rows("lineitem") == li.count())
  }
}
