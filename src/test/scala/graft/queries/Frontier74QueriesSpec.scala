package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the seventy-fourth frontier batch (ev86s). */
class Frontier74QueriesSpec extends SparkSpec {

  test("ev86s interval merge: matches a sequential replay; intervals disjoint") {
    val rows = graft.SparkEntry.queries("ev86s_stream_interval_merge")(
        spark, sf("sf0.01")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // disjoint and ordered per user, each at least one window long
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2)
      sorted.foreach { case (_, s, e) => assert(e - s >= 1800000000L) }
      sorted.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(1)._2 > w(0)._3, "closed intervals are disjoint")
      }
    }
    // sequential replay
    val ev = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"))
      .collect().groupBy(_.getLong(0))
    val replay = ev.toSeq.flatMap { case (u, g) =>
      var start = -1L; var end = -1L
      val out = Seq.newBuilder[(Long, Long, Long)]
      g.sortBy(r => (r.getLong(1), r.getLong(2))).foreach { r =>
        val t = r.getLong(1)
        if (start < 0) { start = t; end = t + 1800000000L }
        else if (t <= end) end = math.max(end, t + 1800000000L)
        else { out += ((u, start, end)); start = t; end = t + 1800000000L }
      }
      out.result() // the final open interval never emits
    }.toSet
    assert(rows.toSet == replay)
  }
}
