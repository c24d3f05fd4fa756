package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the sixth frontier batch. */
class Frontier6QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("v17 triplets: pos is same-label minimum, neg is cross-label maximum") {
    val rows = run("v17_triplet_mining").collect()
    assert(rows.length == 8)
    val emb = graft.Tables.embeddings(spark, sf("sf0.01"))
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (anchor, pos, neg) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(emb(pos) == emb(anchor), "hardest positive must share the anchor label")
      assert(emb(neg) != emb(anchor), "hardest negative must differ in label")
      assert(r.getDouble(2) <= r.getDouble(4) + 2.0) // cosines in [-1,1]
    }
  }

  test("a39 chi2 is nonnegative and cells = segments x priorities") {
    val r = run("a39_chi2_independence").head
    assert(r.getLong(0) == 25) // 5 segments x 5 priorities
    assert(r.getDouble(1) >= 0.0)
  }

  test("ev36 throttle emits at most one alert per (user, 6h bucket) and conserves totals") {
    val first = run("ev36_alert_throttle").collect()
    val keys = first.map(r => (r.getLong(0), r.getTimestamp(1)))
    assert(keys.distinct.length == keys.length)
    // conservation: first alerts + suppressed == total breakouts (w10)
    val totalAlerts = first.length + first.map(_.getLong(3)).sum
    val w10 = run("w10_bollinger_breakout").collect().map(_.getLong(2)).sum
    assert(totalAlerts == w10, s"$totalAlerts vs $w10")
  }
}
