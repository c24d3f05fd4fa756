package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the seventy-third frontier batch. */
class Frontier73QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a133 Krippendorff: ratings conserve; alpha near 0 for independent raters") {
    val r = run("a133_krippendorff").collect()(0)
    val (n, n0, n1, p) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n0 + n1 == 3 * n, "every doc gets exactly three ratings")
    assert(p <= 2 * n, "at most 2 disagreeing pairs per unit (m=3, binary)")
    // three independent hash-ish raters: alpha should hover near 0
    val alpha = r.getLong(4) / 1e6
    assert(alpha > -0.25 && alpha < 0.25, s"alpha $alpha")
  }

  test("w21 underwater: longest run verified against a sequential replay") {
    val rows = run("w21_underwater_duration").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "purchase", floor(col("value") * 100).cast("long"))
          .otherwise(-floor(col("value") * 100).cast("long")).as("flow"))
      .collect().groupBy(_.getLong(0))
    ev.foreach { case (u, g) =>
      var eq = 0L; var peak = Long.MinValue
      var run = 0L; var best = 0L; var total = 0L
      g.sortBy(r => (r.getTimestamp(1).getTime, r.getTimestamp(1).getNanos,
        r.getLong(2))).foreach { r =>
        eq += r.getLong(3)
        peak = math.max(peak, eq)
        if (eq < peak) { run += 1; total += 1; best = math.max(best, run) }
        else run = 0
      }
      if (total > 0) {
        val (mx, tot) = rows(u)
        assert(mx == best && tot == total, s"user $u")
      } else assert(!rows.contains(u))
    }
  }

  test("q29 NOT IN trap: zero rows through NOT IN, true complement via EXISTS") {
    val r = run("q29_not_in_trap").collect()(0)
    assert(r.getLong(2) > 0, "the subquery really contains a NULL")
    assert(r.getLong(0) == 0, "NOT IN against a NULL-bearing set returns nothing")
    val users = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id")).distinct().count()
    val errUsers = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "error" && col("user_id") % 100 =!= 7)
      .select(col("user_id")).distinct().count()
    assert(r.getLong(1) == users - errUsers, "NOT EXISTS counts the complement")
  }
}
