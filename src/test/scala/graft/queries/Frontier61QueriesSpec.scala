package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the sixty-first frontier batch. */
class Frontier61QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("u45 restatement: delta = 7 x restated facts per day; views reconcile") {
    val rows = run("u45_restatement_ledger").collect()
    assert(rows.length == 30)
    val perDay = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "purchase" && col("event_id") % 10 === 0)
      .groupBy(col("ts").cast("date").as("day")).count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    rows.foreach { r =>
      val day = r.getDate(0).toString
      val restated = perDay.getOrElse(day, 0L)
      assert(r.getLong(4) == 7 * restated,
        s"$day: each correction adds exactly 7 cents")
      assert(r.getLong(3) == r.getLong(2) + r.getLong(4))
    }
  }

  test("v33 centroid drift: bounded, near-aligned labels score high") {
    val rows = run("v33_centroid_drift").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      if (!r.isNullAt(2)) assert(math.abs(r.getLong(2)) <= 1000000L)
    }
    // label counts sum to the corpus
    assert(rows.map(_.getLong(1)).sum ==
      graft.Tables.embeddings(spark, sf("sf0.01")).count())
  }

  test("ev75 click bursts: every episode has >= 1 flagged click, windows valid") {
    val rows = run("ev75_click_bursts").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1)
      assert(r.getLong(4) >= r.getLong(3), "episode end >= start")
    }
    // episodes per user are 1..k consecutive
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      assert(g.map(_.getLong(1)).sorted.toSeq == (1 to g.length).map(_.toLong))
    }
    // every flagged click truly has >= 3 clicks in its trailing 6 h:
    // recompute for the episode-starting clicks
    val clicks = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("t")).collect()
      .groupBy(_.getLong(0)).map { case (u, g) => u -> g.map(_.getLong(1)).sorted }
    rows.foreach { r =>
      val (u, first) = (r.getLong(0), r.getLong(3))
      val ts = clicks(u)
      val inWin = ts.count(t => t >= first - 21600000000L && t <= first)
      assert(inWin >= 3, s"user $u episode start $first has only $inWin in window")
    }
  }
}
