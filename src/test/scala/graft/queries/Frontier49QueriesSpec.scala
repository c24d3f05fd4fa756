package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the forty-ninth frontier batch. */
class Frontier49QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a105 lead-lag: 15 lags, r2 bounded, rank permutation ordered by |r2|") {
    val rows = run("a105_lead_lag").collect()
    assert(rows.length == 15)
    assert(rows.map(_.getInt(0)).sorted.toSeq == (0 to 14))
    // signed r² in micro units is bounded by ±1e6
    rows.foreach(r => if (!r.isNullAt(2))
      assert(math.abs(r.getLong(2)) <= 1000000L))
    // strength_rank is a 1..15 permutation, descending in |r2|
    val ranked = rows.sortBy(_.getInt(3))
    assert(ranked.map(_.getInt(3)).toSeq == (1 to 15))
    val strengths = ranked.map(r => if (r.isNullAt(2)) -1L else math.abs(r.getLong(2)))
    assert(strengths.zip(strengths.tail).forall { case (a, b) => a >= b })
    // lag 0 joins every day to itself: n_days = number of distinct days
    val nDays = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("ts").cast("date")).distinct().count()
    assert(rows.find(_.getInt(0) == 0).get.getLong(1) == nDays)
  }

  test("a108 Simpson detector: pooled row present, signs consistent with rates") {
    val rows = run("a108_simpsons_paradox").collect()
    val strata = rows.map(_.getString(0)).toSet
    assert(strata == Set("low", "mid", "high", "pooled"))
    // one shared verdict value on every row
    assert(rows.map(_.getInt(6)).toSet.size == 1)
    // sgn agrees with the micro-rate comparison wherever both rates exist
    rows.foreach { r =>
      if (!r.isNullAt(3) && !r.isNullAt(4)) {
        val (rt, rc, sgn) = (r.getLong(3), r.getLong(4), r.getInt(5))
        if (sgn > 0) assert(rt >= rc)
        if (sgn < 0) assert(rt <= rc)
      }
    }
    // stratum populations sum to the pooled population
    val pooled = rows.find(_.getString(0) == "pooled").get
    val parts = rows.filter(_.getString(0) != "pooled")
    assert(parts.map(_.getLong(1)).sum == pooled.getLong(1))
    assert(parts.map(_.getLong(2)).sum == pooled.getLong(2))
  }

  test("ev68 quiet users: bands partition the user base; permille consistent") {
    val rows = run("ev68_quiet_users").collect()
    assert(rows.nonEmpty && rows.length <= 3)
    rows.foreach { r =>
      val (n, q, pm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(q <= n)
      assert(pm == q * 1000 / n)
    }
    // only users with >= 2 events (a defined median gap) are counted
    val eligible = graft.Tables.events(spark, sf("sf0.01"))
      .groupBy(col("user_id")).count().filter(col("count") >= 2).count()
    assert(rows.map(_.getLong(1)).sum == eligible)
  }
}
