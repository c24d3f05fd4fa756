package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the sixty-second frontier batch. */
class Frontier62QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("w18 pivot heatmap: 7x6 grid conserves the event count") {
    val rows = run("w18_pivot_heatmap").collect()
    assert(rows.length == 7)
    assert(rows.map(_.getInt(0)).sorted.toSeq == (0 to 6))
    val total = rows.map(r => (1 to 6).map(r.getLong).sum).sum
    assert(total == graft.Tables.events(spark, sf("sf0.01")).count())
  }

  test("v34 matryoshka curve: recall is monotone in prefix dims; full = 1000") {
    val rows = run("v34_mrl_quality").collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == Seq(8, 16, 32, 64))
    rows.foreach { r =>
      assert(r.getLong(1) == 10, "ten queries")
      assert(r.getLong(2) <= 50, "overlap bounded by 5 per query")
    }
    assert(rows.last.getLong(3) == 1000, "full-dim ranking recalls itself")
    // longer prefixes should not lose recall on this corpus (allow one
    // tie-induced wobble of a single hit)
    val recalls = rows.map(_.getLong(3))
    recalls.zip(recalls.tail).foreach { case (a, b) =>
      assert(b >= a - 20, s"recall curve dropped: $a -> $b")
    }
  }

  test("a121 TOST: verdict agrees with a double-precision reference") {
    val r = run("a121_tost_equivalence").collect()(0)
    val (n1, k1, n2, k2) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n1 > 0 && n2 > 0 && k1 <= n1 && k2 <= n2)
    val (p1, p2) = (k1.toDouble / n1, k2.toDouble / n2)
    val diff = p1 - p2
    assert(r.getLong(4) == ((BigInt(k1) * n2 - BigInt(k2) * n1) * 1000 /
      (BigInt(n1) * n2)).toLong)
    val pbar = (k1 + k2).toDouble / (n1 + n2)
    val se = math.sqrt(pbar * (1 - pbar) * (1.0 / n1 + 1.0 / n2))
    val eqRef = (diff + 0.02) / se > 1.6449 && (diff - 0.02) / se < -1.6449
    // 2.706 ≈ 1.6449² — allow the crit-constant rounding only at the
    // knife edge; this corpus is far from it
    assert((r.getInt(5) == 1) == eqRef)
  }
}
