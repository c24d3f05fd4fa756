package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fifty-fourth frontier batch. */
class Frontier54QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("w15 Holt: engine states match an independent BigInt reference fold") {
    val rows = run("w15_holt_smoothing").collect()
    assert(rows.length == 30)
    // independent reference: exact BigInt recurrence over the day series
    val daily = graft.Tables.events(spark, sf("sf0.01"))
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"))
      .orderBy(col("day")).collect()
      .map(r => (r.getDate(0).toString, BigInt(r.getLong(1))))
    var (l, b, p) = (BigInt(0), BigInt(0), BigInt(0))
    daily.zip(rows.sortBy(_.getDate(0).toString)).foreach { case ((day, x), r) =>
      if (p == 0) { l = 4 * x; b = 0; p = 4 }
      else { val l2 = 2 * p * x + 2 * l + 2 * b; b = p * x - l + 3 * b; l = l2; p = 4 * p }
      assert(r.getDate(0).toString == day)
      def micro(v: BigInt): Long =
        (if (v >= 0) v * 1000000 / p else -((-v) * 1000000 / p)).toLong
      assert(r.getLong(1) == micro(l), s"$day level")
      assert(r.getLong(2) == micro(b), s"$day trend")
      assert(r.getLong(3) == micro(l + b), s"$day forecast")
    }
    // the level smooths: after day 1 it is never exactly the raw value
    // unless the series is locally constant — just sanity-bound it
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("a113 MH: cells partition user-days; pooled OR within crude OR range") {
    val rows = run("a113_mantel_haenszel").collect()
    assert(rows.length == 3)
    val userDays = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id"), col("ts").cast("date")).distinct().count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4)).sum
      == userDays)
    // one shared MH estimate; it lies within [min, max] of the crude ORs
    // (MH is a convex combination of stratum ORs with weights b*c/n)
    val mh = rows.map(_.getLong(6)).distinct
    assert(mh.length == 1)
    val crude = rows.filter(!_.isNullAt(5)).map(_.getLong(5))
    assert(crude.nonEmpty)
    assert(mh.head >= crude.min - 1 && mh.head <= crude.max + 1)
  }

  test("a114 KS: D bounds, monotone-consistent significance") {
    val rows = run("a114_ks_test").collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val (n1, n2, d, dm) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(d >= 0 && d <= n1 * n2)
      assert(dm == d * 1000000 / (n1 * n2))
      assert(dm <= 1000000)
      val sig = BigInt(1000000) * BigInt(d) * BigInt(d) >
        BigInt(1844164) * BigInt(n1 + n2) * BigInt(n1) * BigInt(n2)
      assert((r.getInt(5) == 1) == sig)
    }
  }
}
