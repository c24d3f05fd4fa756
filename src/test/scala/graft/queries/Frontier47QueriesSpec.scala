package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the forty-seventh frontier batch. */
class Frontier47QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a103 Markov attribution: removing a channel never helps conversion") {
    val rows = run("a103_markov_attribution").collect()
    assert(rows.length == 5)
    val full = rows.find(_.getString(0) == "full").get
    assert(full.isNullAt(2), "full variant has no removal effect")
    val pFull = full.getLong(1)
    assert(pFull > 0 && pFull <= 1000000000L)
    rows.filter(_.getString(0) != "full").foreach { r =>
      // removal redirects transitions to NULL — conversion mass can only drop
      // (up to nano-truncation slack across 8 rounds)
      assert(r.getLong(1) <= pFull + 8, s"${r.getString(0)}: removal raised conversion")
      assert(!r.isNullAt(2))
    }
  }

  test("t52 negative sampling: draws are deterministic, in-vocab, and 2 per pair") {
    val rows = run("t52_negative_sampling").collect()
    assert(rows.nonEmpty)
    val perPair = rows.groupBy(r => (r.getLong(0), r.getInt(1)))
    perPair.foreach { case (_, g) =>
      assert(g.map(_.getInt(2)).sorted.toSeq == Seq(1, 2), "exactly j=1,2 negatives")
      assert(g.map(_.getString(3)).distinct.length == 1, "same center per pair")
    }
    // negatives come from the corpus vocabulary
    val vocab = graft.Tables.documents(spark, sf("sf0.01"))
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .distinct().collect().map(_.getString(0)).toSet
    rows.take(500).foreach(r => assert(vocab(r.getString(5)),
      s"negative '${r.getString(5)}' not in vocab"))
    // determinism: re-run yields the same multiset
    val again = run("t52_negative_sampling").collect()
    assert(again.map(_.toString).sorted.toSeq == rows.map(_.toString).sorted.toSeq)
  }

  test("ev67 peak concurrency: peak bounded by intervals; a driver sweep agrees") {
    val rows = run("ev67_peak_concurrency").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(1) >= 1 && r.getLong(1) <= r.getLong(3)))
    // recompute one day's sweep on the driver
    val day = rows.head.getDate(0)
    val evs = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("ts").cast("date") === lit(day))
      .select(unix_micros(col("ts")).as("s"), col("event_id")).collect()
    val dayEnd = java.time.LocalDate.parse(day.toString)
      .plusDays(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
    val bounds = evs.flatMap { e =>
      val s0 = e.getLong(0)
      Seq((s0, 1), (math.min(s0 + 900000000L, dayEnd), -1))
    }.sortBy { case (t, dl) => (t, dl) }
    var cur = 0; var peak = 0
    bounds.foreach { case (_, dl) => cur += dl; peak = math.max(peak, cur) }
    assert(rows.head.getLong(1) == peak.toLong,
      s"driver sweep peak $peak vs query ${rows.head.getLong(1)} on $day")
  }
}
