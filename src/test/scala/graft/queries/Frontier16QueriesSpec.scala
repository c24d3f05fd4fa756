package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantic guards for the sixteenth frontier batch. */
class Frontier16QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("j9 grid-blocked overlap join equals the brute-force range join") {
    val got = run("j9_interval_overlap")
    got.cache()
    try {
      val rows = got.collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(4) >= 0, "overlap must be non-negative"))
      // brute force over the same derived interval sets: rebuild bounds
      // and join on the raw predicate with no blocking
      val wU = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ev = graft.Tables.events(spark, sf("sf0.01"))
      val sbounds = ev.select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("new_sess",
          when(lag(col("ts"), 1).over(wU).isNull ||
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wU)) > 1800000000L,
            1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(wU).cast("long"))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(min(unix_micros(col("ts"))).as("s_us"), max(unix_micros(col("ts"))).as("e_us"))
      val wB = Window.partitionBy(col("bday")).orderBy(col("ts"), col("event_id"))
      val bbounds = ev.filter(col("event_type") === "error")
        .select(col("ts").cast("date").as("bday"), col("ts"), col("event_id"))
        .withColumn("new_burst",
          when(lag(col("ts"), 1).over(wB).isNull ||
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wB)) > 600000000L,
            1).otherwise(0))
        .withColumn("burst_seq", sum(col("new_burst")).over(wB).cast("long"))
        .groupBy(col("bday"), col("burst_seq"))
        .agg(min(unix_micros(col("ts"))).as("b_s"), max(unix_micros(col("ts"))).as("b_e"))
      val brute = sbounds.crossJoin(bbounds)
        .filter(col("s_us") <= col("b_e") && col("b_s") <= col("e_us"))
        .select(col("user_id"), col("sess_id"), col("bday").as("burst_day"),
          col("burst_seq"),
          (least(col("e_us"), col("b_e")) - greatest(col("s_us"), col("b_s")))
            .as("overlap_us"))
      assert(got.exceptAll(brute).count() == 0 && brute.exceptAll(got).count() == 0)
    } finally got.unpersist()
  }

  test("a48 HITS: top authority units normalized, deterministic, degree-consistent") {
    val rows = run("a48_hits_authority").collect()
    assert(rows.length == 20)
    val units = rows.map(_.getLong(1))
    assert(units.max == 1000000000L, "top authority carries the L-inf unit")
    units.zip(units.tail).foreach { case (a, b) => assert(a >= b) }
    // bit-identical re-run (pure integer recurrence)
    val rows2 = run("a48_hits_authority").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).sameElements(
      rows2.map(r => (r.getLong(0), r.getLong(1)))))
  }

  test("a52 cohort LTV: cumulative within cohort, total equals corpus purchase cents") {
    val rows = run("a52_cohort_ltv").collect()
    assert(rows.nonEmpty)
    // per cohort: cum_cents nondecreasing in age
    rows.groupBy(_.getDate(0)).foreach { case (_, rs) =>
      val byAge = rs.sortBy(_.getInt(1))
      byAge.zip(byAge.tail).foreach { case (a, b) =>
        assert(b.getLong(3) >= a.getLong(3))
      }
    }
    // final cumulative per cohort sums to total purchase cents
    val lastPerCohort = rows.groupBy(_.getDate(0))
      .map { case (_, rs) => rs.maxBy(_.getInt(1)).getLong(3) }.sum
    val total = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100).cast("long"))).collect()(0).getLong(0)
    assert(lastPerCohort == total)
  }
}
