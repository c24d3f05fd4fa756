package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the seventy-sixth frontier batch. */
class Frontier76QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a137 balance: parity arms over the same population are balanced") {
    val rows = run("a137_covariate_balance").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("n_clicks", "n_events", "n_views"))
    rows.foreach { r =>
      assert(r.getLong(2) > 0, "covariates vary")
      // a parity split over one population: |SMD| stays well below 1
      // (sf0.01 has only 150 users, so sampling noise reaches ~0.4)
      assert(math.abs(r.getLong(3)) < 1000000, s"${r.getString(0)} SMD^2 too big")
      assert((r.getInt(4) == 1) == (math.abs(r.getLong(3)) < 10000))
    }
  }

  test("v45 Rocchio: 3 hits per query; feedback keeps some original hits") {
    val rows = run("v45_rocchio_prf").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10 && byQ.values.forall(_.length == 3))
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
      val sc = sorted.map(_.getLong(3))
      assert(sc.zip(sc.tail).forall { case (a, b) => a >= b })
    }
    // PRF pulls toward the original top-3's neighborhood: across all
    // queries at least a third of expanded hits were original hits
    val keep = rows.count(_.getInt(4) == 1)
    assert(keep >= rows.length / 3, s"only $keep/${rows.length} kept")
  }

  test("ev88 abandonment: session counts reconcile with the sessionizer") {
    val rows = run("ev88_abandonment").collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(2) * 1000 / r.getLong(1))
    }
    // driver-side replay on one dimension: total sessions
    val ev = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"))
      .collect().groupBy(_.getLong(0))
    val totalSessions = ev.values.map { g =>
      val ts = g.sortBy(r => (r.getLong(1), r.getLong(2))).map(_.getLong(1))
      1 + ts.zip(ts.tail).count { case (a, b) => b - a > 1800000000L }
    }.sum
    assert(rows.map(_.getLong(1)).sum == totalSessions)
  }
}
