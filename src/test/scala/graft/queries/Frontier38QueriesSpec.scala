package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the thirty-eighth frontier batch. */
class Frontier38QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a91 Venn bitmask: users conserve; n_types matches popcount of mask") {
    val rows = run("a91_venn_bitmask").collect()
    val users = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(2)).sum == users)
    rows.foreach { r =>
      assert(r.getInt(1) == Integer.bitCount(r.getInt(0)))
      assert(r.getInt(0) >= 1 && r.getInt(0) <= 31)
    }
  }

  test("w13 Haar energy: level coefficient counts halve; Parseval bound holds") {
    val rows = run("w13_haar_energy").collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == (1 to 5))
    assert(rows.map(_.getLong(1)).toSeq == Seq(15L, 8L, 4L, 2L, 1L))
    rows.foreach(r => assert(r.getLong(2) >= 0))
    // total detail energy (scaled back per level) cannot exceed 32x signal energy
    val daily = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "purchase")
      .groupBy(col("ts").cast("date"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("c"))
      .collect().map(_.getLong(1))
    val sigE = daily.map(c => (BigInt(c) * BigInt(c))).sum
    val detE = rows.map(r => BigInt(r.getLong(2)) * BigInt(1000000)).sum
    assert(detE <= sigE * 32)
  }

  test("u34 hash chain: heads are distinct across users and lengths conserve") {
    val rows = run("u34_hash_chain").collect()
    val evCount = graft.Tables.events(spark, sf("sf0.01")).count()
    assert(rows.map(_.getLong(1)).sum == evCount)
    // md5 chains with distinct inputs collide with negligible probability
    assert(rows.map(_.getString(2)).distinct.length == rows.length)
    assert(rows.forall(_.getString(2).matches("[0-9a-f]{32}")))
  }

  test("v28 cluster eta2: ratio in [0,1] and components consistent") {
    val r = run("v28_cluster_eta2").collect()(0)
    assert(r.getLong(0) == 64)
    val (ssb, sst, eta2) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(ssb >= -1e-9 && sst > 0)
    assert(ssb <= sst + 1e-6)
    assert(eta2 >= 0.0 && eta2 <= 1.0)
    assert(math.abs(eta2 - ssb / sst) < 1e-4)
  }
}
