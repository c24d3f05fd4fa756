package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the twentieth frontier batch. */
class Frontier20QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("w12 decomposition reconstructs the series exactly and seasonal sums to ~0") {
    val rows = run("w12_seasonal_decompose").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val x = r.getLong(1).toDouble / 100.0 * 100.0 // cents
      val recon = (r.getDouble(2) + r.getDouble(3) + r.getDouble(4)) * 100.0 / 100.0
      assert(math.abs(recon * 1.0 - r.getLong(1) / 1.0) < 1e-4 * math.max(1.0, math.abs(x)),
        s"trend+seasonal+residual must reconstruct x: $recon vs ${r.getLong(1)}")
    }
    // weekday seasonal components average out near zero across the series
    val seasonalMean = rows.map(_.getDouble(3)).sum / rows.length
    val scale = rows.map(_.getLong(1)).max.toDouble
    assert(math.abs(seasonalMean) < 0.05 * scale)
  }

  test("a58 Cliff's delta matches the brute-force pair count") {
    val r = run("a58_cliffs_delta").collect()(0)
    val (na, nb, delta) = (r.getLong(0), r.getLong(1), r.getDouble(3))
    assert(delta >= -1.0 && delta <= 1.0)
    // brute force on the same samples
    val v = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "purchase")
      .select(floor(col("value") * 100).cast("long").as("x"),
        when(expr("datediff(cast(ts as date), date'2024-01-01') % 7") >= 5, 0)
          .otherwise(1).as("s1")).collect()
    val a = v.filter(_.getInt(1) == 1).map(_.getLong(0))
    val b = v.filter(_.getInt(1) == 0).map(_.getLong(0))
    assert(a.length == na && b.length == nb)
    val bSorted = b.sorted
    def countBelow(x: Long): Long = {
      var lo = 0; var hi = bSorted.length
      while (lo < hi) { val mid = (lo + hi) / 2; if (bSorted(mid) < x) lo = mid + 1 else hi = mid }
      lo.toLong
    }
    def countBelowEq(x: Long): Long = {
      var lo = 0; var hi = bSorted.length
      while (lo < hi) { val mid = (lo + hi) / 2; if (bSorted(mid) <= x) lo = mid + 1 else hi = mid }
      lo.toLong
    }
    val wins = a.map(countBelow).sum
    val losses = a.map(x => bSorted.length - countBelowEq(x)).sum
    val expected = (wins - losses).toDouble / (na.toDouble * nb.toDouble)
    assert(math.abs(delta - expected) < 1e-12, s"$delta vs brute $expected")
  }

  test("a59 A/B arms partition users; z is finite and near zero on a uniform split") {
    val r = run("a59_ab_conversion_z").collect()(0)
    val nUsers = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id")).distinct().count()
    assert(r.getLong(0) + r.getLong(1) == nUsers)
    assert(r.getLong(2) <= r.getLong(0) && r.getLong(3) <= r.getLong(1))
    // non-degenerate conversion at this scale → z defined, and the md5
    // split is independent of behavior → no real effect
    assert(!r.isNullAt(6), "pooled variance should be non-degenerate at sf0.01")
    val z = r.getDouble(6)
    assert(!z.isNaN && !z.isInfinite)
    assert(math.abs(z) < 4.0, s"uniform split should not show a strong effect, z=$z")
  }

  test("t40 code detection: counts conserve and fractions bounded") {
    val rows = run("t40_code_detection").collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs == graft.Tables.documents(spark, sf("sf0.01")).count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }
}
