package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fifty-first frontier batch. */
class Frontier51QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("t53 matmul: two topics per doc, ordered; projection is linear in tf") {
    val rows = run("t53_doc_topic_matmul").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val nDocs = graft.Tables.documents(spark, sf("sf0.01")).count()
    assert(byDoc.size == nDocs)
    byDoc.values.foreach { g =>
      assert(g.map(_.getInt(3)).sorted.toSeq == Seq(1, 2))
      val s = g.sortBy(_.getInt(3)).map(_.getLong(2))
      assert(s(0) >= s(1), "rank 1 score >= rank 2 score")
    }
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) <= 7))
    // weights live in [-100, 100]: |score| <= 100 * doc token count
    val tokCaps = graft.Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach(r =>
      assert(math.abs(r.getLong(2)) <= 100L * tokCaps(r.getLong(0))))
  }

  test("ev69 interval union: per-user active time bounded and conserved") {
    val rows = run("ev69_interval_union").collect()
    val nUsers = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nUsers)
    // every user is active at least one 30-min window and at most
    // n_events x 30 min; totals bound the per-bucket sums
    val winUs = 1800000000L
    val nEvents = graft.Tables.events(spark, sf("sf0.01")).count()
    val total = rows.map(_.getLong(2)).sum
    assert(total >= nUsers * winUs, "each user covers >= one window")
    assert(total <= nEvents * winUs, "union <= sum of intervals")
    rows.foreach { r =>
      val (h, n, s) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(s >= h * 3600000000L * n && s < (h + 1) * 3600000000L * n)
    }
  }

  test("j12 linkage: block pair counts exact; decisions partition the pairs") {
    val rows = run("j12_linkage_score").collect()
    val sizes = graft.Tables.customer(spark, sf("sf0.01"))
      .groupBy(col("c_nationkey")).count().collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    rows.foreach { r =>
      val nk = r.getLong(0)
      val m = sizes(nk)
      assert(r.getLong(1) == m * (m - 1) / 2, s"block $nk pair count")
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == r.getLong(1),
        s"block $nk decisions partition")
    }
    // a pair agreeing on all three fields scores 1504077+2079442+2197224
    // = 5780743 >= match threshold; disagreeing on all three scores
    // -6781744 <= nonmatch threshold — both decisions reachable
    assert(rows.map(_.getLong(4)).sum > 0, "some nonmatches exist")
  }
}
