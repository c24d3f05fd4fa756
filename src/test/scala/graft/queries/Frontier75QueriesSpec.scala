package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the seventy-fifth frontier batch. */
class Frontier75QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a134 QTE: order statistics match driver-side sorted arrays") {
    val rows = run("a134_quantile_effect").collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == Seq(25, 50, 75))
    val u = graft.Tables.events(spark, sf("sf0.01"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val t = u.filter(_._1 % 2 == 1).sortBy(p => (p._2, p._1)).map(_._2)
    val c = u.filter(_._1 % 2 == 0).sortBy(p => (p._2, p._1)).map(_._2)
    rows.foreach { r =>
      val q = r.getInt(0)
      def os(xs: Array[Long]): Long = xs((q * xs.length + 99) / 100 - 1)
      assert(r.getLong(1) == os(t) && r.getLong(2) == os(c))
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2))
    }
  }

  test("u58 deletion vectors: reconcile against a direct predicate filter") {
    val rows = run("u58_deletion_vectors").collect()
    val li = graft.Tables.lineitem(spark, sf("sf0.01"))
    val n = li.count()
    assert(rows.map(_.getLong(2)).sum == n)
    val directDeleted = li.filter(
      (col("l_orderkey") * 31 + col("l_linenumber")) % 20 === 0).count()
    assert(rows.map(_.getLong(3)).sum == directDeleted)
    val directVisible = li.filter(
        (col("l_orderkey") * 31 + col("l_linenumber")) % 20 =!= 0)
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(rows.map(_.getLong(4)).sum == directVisible)
  }

  test("a135 IRV: per-round ballot conservation and correct eliminations") {
    val rows = run("a135_irv_rounds").collect()
    val users = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id")).distinct().count()
    val byRound = rows.groupBy(_.getInt(0))
    assert(byRound.keySet == Set(1, 2, 3))
    byRound.foreach { case (k, g) =>
      assert(g.map(_.getLong(2)).sum == users, s"round $k conserves ballots")
      assert(g.count(_.getInt(3) == 1) == 1, s"round $k eliminates exactly one")
      // the eliminated candidate has the minimum tally (ties by name)
      val el = g.find(_.getInt(3) == 1).get
      val minV = g.map(_.getLong(2)).min
      assert(el.getLong(2) == minV ||
        g.filter(_.getLong(2) == minV).map(_.getString(1)).min == el.getString(1))
      // candidates shrink by one each round
      assert(g.length == 5 - (k - 1))
    }
    // eliminated candidates never reappear
    val e1 = byRound(1).find(_.getInt(3) == 1).get.getString(1)
    val e2 = byRound(2).find(_.getInt(3) == 1).get.getString(1)
    assert(!byRound(2).exists(_.getString(1) == e1))
    assert(!byRound(3).exists(r => r.getString(1) == e1 || r.getString(1) == e2))
  }
}
