package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the twenty-seventh frontier batch. */
class Frontier27QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a74 ECE is in [0,1] and matches a direct recomputation from t20's bins") {
    val r = run("a74_expected_calibration").collect()(0)
    val (nBins, ece) = (r.getLong(0), r.getDouble(1))
    assert(nBins >= 1 && nBins <= 10)
    assert(ece >= 0.0 && ece <= 1.0)
    // recompute from the t20 reliability bins
    val bins = run("t20_calibration").collect()
      .map(r2 => (r2.getLong(1), r2.getDouble(2), r2.getDouble(3)))
    val total = bins.map(_._1).sum.toDouble
    val direct = bins.map { case (n, conf, acc) => math.abs(acc - conf) * n }.sum / total
    assert(math.abs(ece - direct) < 1e-6, s"$ece vs direct $direct")
  }

  test("ev54 tolerance: attributed view is the latest prior view within 1h, else null") {
    val rows = run("ev54_asof_tolerance").collect()
    val ev = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
    val views = ev.filter(_.getString(2) == "view")
      .groupBy(_.getLong(1)).view.mapValues(_.map(r => (r.getLong(3), r.getLong(0)))).toMap
    val buys = ev.filter(_.getString(2) == "purchase")
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    rows.foreach { r =>
      val (uid, bus) = buys(r.getLong(0))
      val prior = views.getOrElse(uid, Array.empty[(Long, Long)])
        .filter(_._1 <= bus)
      val expect = prior.sortBy(v => (-v._1, -v._2)).headOption
        .filter { case (vus, _) => bus - vus <= 3600000000L }.map(_._2)
      val got = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(got == expect, s"purchase ${r.getLong(0)}: $got vs $expect")
    }
  }

  test("t44 duplication matrix is symmetric-free, non-empty, and fingerprint-bounded") {
    val rows = run("t44_cross_source_dups").collect()
    assert(rows.nonEmpty, "the corpus has cross-source shared openings at this scale")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs must be unordered (a < b)")
      assert(r.getLong(2) >= 1)
    }
    // total cells bounded by shared-fingerprint population x pair fan-out
    val dupFps = graft.Tables.documents(spark, sf("sf0.01"))
      .select(md5(array_join(slice(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"), 1, 16), " ")).as("h"),
        col("source")).distinct()
      .groupBy(col("h")).count().filter(col("count") >= 2).count()
    assert(rows.map(_.getLong(2)).sum <= dupFps * 190,
      "cross-source cells exceed the per-fingerprint pair bound")
  }
}
