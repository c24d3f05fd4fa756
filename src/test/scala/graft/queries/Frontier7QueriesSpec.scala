package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the seventh frontier batch. */
class Frontier7QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("t33 pairs are disjoint, length-ordered, within-block") {
    val rows = run("t33_contrastive_pairs").collect()
    assert(rows.nonEmpty)
    val ids = rows.flatMap(r => Seq(r.getLong(3), r.getLong(4)))
    assert(ids.distinct.length == ids.length, "a doc appears in at most one pair")
    rows.foreach(r => assert(r.getLong(5) >= 0L, "id_b is the longer (or equal) doc"))
  }

  test("a40 survival is monotone nonincreasing in duration and within (0,1]") {
    val rows = run("a40_survival_km").collect()
      .sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, s) => assert(s >= 0.0 && s <= 1.0) }
    rows.zip(rows.tail).foreach { case ((_, a), (_, b)) => assert(b <= a + 1e-12) }
  }

  test("u19 reconciliation counts every order exactly once") {
    val total = run("u19_consistency_audit").collect().map(_.getLong(2)).sum
    val orders = graft.Tables.orders(spark, sf("sf0.01")).count()
    assert(total == orders)
  }
}
