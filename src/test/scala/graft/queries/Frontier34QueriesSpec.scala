package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the thirty-fourth frontier batch. */
class Frontier34QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("t47 TextRank: 10 ranked terms, rank mass conserved around 1e9 per node") {
    val rows = run("t47_textrank").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to 10))
    // nano-unit ranks are positive and ordered with the rank column
    val byRn = rows.sortBy(_.getInt(2))
    val ranks = byRn.map(_.getLong(1))
    assert(ranks.forall(_ > 0))
    assert(ranks.toSeq == ranks.sorted(Ordering[Long].reverse).toSeq)
  }

  test("ev58 decayed value: newest-week purchases carry 16x the weight of 4-week-old ones") {
    val rows = run("ev58_decayed_value").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (units16, n, dollars) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(units16 >= 0 && n > 0)
      // dollars is the exact truncated units16·25 div 4 scaled by 1e-4
      assert(math.abs(dollars - (units16 * 25 / 4) / 10000.0) < 1e-12)
    }
    // total decayed value can't exceed total raw purchase value x16/1600
    val rawCents = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100).cast("long"))).collect()(0).getLong(0)
    val totalUnits = rows.map(_.getLong(1)).sum
    assert(totalUnits <= rawCents * 16)
  }

  test("a86 Friedman: chi2 non-negative; rank identity holds (sum R2 = n*k*(k+1))") {
    val r = run("a86_friedman").collect()(0)
    val (n, k) = (r.getLong(0), r.getLong(1))
    assert(n == 30 && k == 5)
    assert(r.getDouble(2) >= -1e-9)
    if (!r.isNullAt(3)) assert(r.getDouble(3) >= r.getDouble(2) - 1e-9,
      "tie correction can only inflate chi2")
  }

  test("c34 k-anonymity: every released class has n >= 5 except the residue; counts conserve") {
    val rows = run("c34_k_anonymity").collect()
    val total = graft.Tables.customer(spark, sf("sf0.01")).count()
    assert(rows.map(_.getLong(2)).sum == total, "released counts must conserve")
    rows.filter(_.getInt(3) < 2).foreach(r =>
      assert(r.getLong(2) >= 5, s"level ${r.getInt(3)} class below k: $r"))
    // level-1 rows generalize segment only
    rows.filter(_.getInt(3) == 1).foreach(r => assert(r.getString(1) == "*"))
  }

  test("v25 cosine histogram: stride sample covers every vector exactly once") {
    val rows = run("v25_cosine_histogram").collect()
    val n = graft.Tables.embeddings(spark, sf("sf0.01")).count()
    assert(rows.map(_.getLong(1)).sum == n, "one pair per vector (997 stride cycle)")
    assert(rows.forall(r => r.getInt(0) >= -10 && r.getInt(0) <= 10))
  }
}
