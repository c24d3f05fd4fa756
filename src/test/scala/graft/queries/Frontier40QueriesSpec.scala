package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fortieth frontier batch. */
class Frontier40QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("v29 MMR: 3 distinct picks per query; scores non-increasing; pos-1 is top relevance") {
    val rows = run("v29_mmr_rerank").collect()
    assert(rows.length == 30)
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_.getInt(1))
      assert(sorted.map(_.getLong(2)).distinct.length == 3, "picks must be distinct")
      // MMR scores can only fall as the penalty set grows
      val scores = sorted.map(_.getDouble(3))
      assert(scores(0) >= scores(1) - 1e-9 && scores(1) >= scores(2) - 1e-9,
        s"scores must be non-increasing: ${scores.toSeq}")
    }
  }

  test("v29 MMR diversifies: pick set differs from plain top-3 for at least one query") {
    val mmr = run("v29_mmr_rerank").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val knn = run("v2_knn_brute").collect()
      .filter(_.getInt(2) <= 3)
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // v2 ranks against the whole corpus incl. other queries; compare only
    // queries whose top-3 are all in the shared corpus side (id >= 10)
    val comparable = knn.filter(_._2.forall(_ >= 10))
    assert(comparable.nonEmpty)
    val diverged = comparable.exists { case (q, top3) => mmr(q) != top3 }
    assert(diverged, "MMR with lambda=0.5 should reorder at least one query's picks")
  }

  test("a93 kappa: bounded by [-1,1] and consistent with p_o, p_e") {
    val r = run("a93_cohens_kappa").collect()(0)
    val (po, pe, kappa) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(po >= 0 && po <= 1 && pe > 0 && pe < 1)
    assert(kappa <= 1.0 + 1e-9 && kappa >= -1.0 - 1e-9)
    assert(math.abs(kappa - (po - pe) / (1 - pe)) < 1e-4)
  }

  test("a94 McNemar: cells conserve users; continuity correction shrinks chi2") {
    val r = run("a94_mcnemar").collect()(0)
    val users = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id")).distinct().count()
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) + r.getLong(3) == users)
    if (!r.isNullAt(4)) {
      assert(r.getDouble(4) >= 0)
      assert(r.getDouble(5) <= r.getDouble(4) + 1e-9)
    }
  }
}
