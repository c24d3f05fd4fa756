package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the forty-third frontier batch. */
class Frontier43QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a98 Bradley-Terry: strengths order with win counts; ranks a permutation") {
    val rows = run("a98_bradley_terry").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to 5))
    rows.foreach(r => assert(r.getLong(2) > 0, "strengths stay positive"))
    // the team with the most wins gets the highest strength
    val byWins = rows.maxBy(_.getLong(1))
    val byPi = rows.maxBy(_.getLong(2))
    assert(byWins.getString(0) == byPi.getString(0),
      "max-wins team should carry max BT strength in a near-balanced schedule")
  }

  test("a99 weighted median: half the weight sits at or below the median") {
    val r = run("a99_weighted_median").collect()(0)
    val (nUsers, tw, med) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val u = graft.Tables.events(spark, sf("sf0.01")).groupBy(col("user_id"))
      .agg(count(lit(1)).as("w"),
        sum(floor(col("value") * 100).cast("long")).as("r")).collect()
    assert(nUsers == u.length)
    assert(tw == u.map(_.getLong(1)).sum)
    val below = u.filter(_.getLong(2) <= med).map(_.getLong(1)).sum
    val above = u.filter(_.getLong(2) >= med).map(_.getLong(1)).sum
    assert(below >= (tw + 1) / 2, "at least half the weight at or below")
    assert(above >= tw / 2, "at least half the weight at or above")
  }

  test("u37 LOO target encoding: excluding self moves the mean the right way") {
    val rows = run("u37_target_encoding").collect()
    val n = graft.Tables.orders(spark, sf("sf0.01")).count()
    assert(rows.length == n)
    // reconstruct one nation's mean and check a sample row's LOO identity
    val o = graft.Tables.orders(spark, sf("sf0.01"))
      .join(graft.Tables.customer(spark, sf("sf0.01")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        col("c_nationkey").cast("long").as("nation"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 100)
          .cast("long").as("cents")).collect()
    val byNation = o.groupBy(_.getLong(1))
    val check = rows.take(50)
    check.foreach { r =>
      val key = r.getLong(0)
      val row = o.find(_.getLong(0) == key).get
      val grp = byNation(row.getLong(1))
      val s = grp.map(_.getLong(2)).sum
      val cnt = grp.length
      if (cnt > 1) {
        val expect = (BigInt(s - row.getLong(2)) * 1000000 / (cnt - 1)).toLong
        assert(r.getLong(2) == expect, s"LOO mismatch for order $key")
      }
    }
  }
}
