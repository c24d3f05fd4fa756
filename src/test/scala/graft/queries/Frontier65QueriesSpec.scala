package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the sixty-fifth frontier batch. */
class Frontier65QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a124 Kruskal-Wallis: H non-negative-ish and bounded; 5 groups daily") {
    val rows = run("a124_kruskal_wallis").collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      assert(r.getInt(2) == 5, "five event types each day")
      val h = r.getLong(3)
      // floor quantization can push H a hair below 0; the ceiling is
      // H <= N-1 (attained when groups are perfectly separated)
      assert(h >= -2000000 && h <= (r.getLong(1) - 1) * 1000000)
      assert((r.getInt(4) == 1) == (h > 9487729L))
    }
  }

  test("ev76 circadian peak: windows really are the per-user 4h argmax") {
    val rows = run("ev76_circadian_peak").collect()
    val nUsers = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id")).distinct().count()
    assert(rows.length == nUsers)
    val hist = graft.Tables.events(spark, sf("sf0.01"))
      .groupBy(col("user_id"), hour(col("ts")).as("h")).count().collect()
      .groupBy(_.getLong(0))
      .map { case (u, g) =>
        u -> g.map(r => r.getInt(1) -> r.getLong(2)).toMap
      }
    rows.take(100).foreach { r =>
      val (u, s0, n) = (r.getLong(0), r.getInt(1), r.getLong(2))
      val h = hist(u)
      def winCount(s: Int): Long =
        (0 until 4).map(o => h.getOrElse((s + o) % 24, 0L)).sum
      assert(winCount(s0) == n)
      (0 until 24).foreach { s =>
        val c = winCount(s)
        assert(c < n || (c == n && s >= s0), s"user $u start $s beats $s0")
      }
    }
  }

  test("u48 z-order: both layouts chunk everything; z-order skips more") {
    // sf0.1: 5000 docs → 5 chunks per layout (sf0.01 fits in one chunk,
    // where no layout can differentiate)
    val rows = run("u48_zorder_effectiveness", sf("sf0.1")).collect()
    assert(rows.length == 2)
    val nat = rows.find(_.getString(0) == "natural").get
    val z = rows.find(_.getString(0) == "zorder").get
    assert(nat.getLong(1) == z.getLong(1), "same chunk count")
    assert(nat.getLong(2) <= nat.getLong(1) && z.getLong(2) <= z.getLong(1))
    // n_chars is uncorrelated with doc_id, so natural-order zone maps
    // are useless (every chunk spans the band); Morton order clusters
    // the n_chars dimension and must skip strictly more
    assert(z.getLong(2) < nat.getLong(2),
      s"zorder ${z.getLong(2)} should scan fewer chunks than natural ${nat.getLong(2)}")
    rows.foreach(r => assert(r.getLong(3) == r.getLong(2) * 1000 / r.getLong(1)))
  }
}
