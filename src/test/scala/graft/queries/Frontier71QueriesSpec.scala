package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the seventy-first frontier batch. */
class Frontier71QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("ev82 time-to-convert: quantiles replicate a sorted-gaps reference") {
    val rows = run("ev82_time_to_convert").collect()
    assert(rows.nonEmpty)
    val ev = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().groupBy(_.getLong(0))
    val gaps = ev.toSeq.flatMap { case (_, g) =>
      val s = g.filter(_.getString(1) == "signup").map(_.getLong(2))
      if (s.isEmpty) None
      else {
        val s0 = s.min
        val p = g.filter(r => r.getString(1) == "purchase" && r.getLong(2) >= s0)
          .map(_.getLong(2))
        Some((s0 / 604800000000L, if (p.isEmpty) None else Some(p.min - s0)))
      }
    }.toSeq.groupBy(_._1)
    rows.foreach { r =>
      val wk = r.getLong(0)
      val coh = gaps(wk)
      assert(r.getLong(1) == coh.length)
      val conv = coh.flatMap(_._2).sorted
      assert(r.getLong(2) == conv.length)
      val m = conv.length
      val med2 = if (m % 2 == 1) 2 * conv(m / 2) else conv(m / 2 - 1) + conv(m / 2)
      assert(r.getLong(3) == med2)
      assert(r.getLong(4) == conv((9 * m + 9) / 10 - 1))
    }
  }

  test("v41 stale index: recall never exceeds 1000; fresh truth is the ceiling") {
    val rows = run("v41_stale_index_recall").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(1) <= 5 && r.getLong(2) == r.getLong(1) * 1000 / 5)
    }
    // the stale index cannot return vec_id % 10 == 0 vectors, so any
    // query whose true top-5 contains one MUST lose recall; the mean
    // should still be well above zero (banding keeps near neighbors)
    val mean = rows.map(_.getLong(1)).sum / (5.0 * rows.length)
    assert(mean > 0.1 && mean <= 1.0)
  }

  test("t66 augmentation: counts and fingerprint replicate a driver replay") {
    val rows = run("t66_text_augment").collect()
    val docs = graft.Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    def roll(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    rows.take(60).foreach { r =>
      val t = docs(r.getLong(0))
      val hs = t.zipWithIndex.map { case (tok, i0) =>
        (roll(tok) * ((i0 + 1) * 2654435L + 1)) % 1000000007L
      }
      val kept = t.zip(hs).flatMap { case (tok, h) =>
        if (h % 10 == 0) Seq.empty
        else if (h % 17 == 0) Seq(tok, tok) else Seq(tok)
      }
      assert(r.getLong(1) == t.length)
      assert(r.getLong(2) == hs.count(_ % 10 == 0))
      assert(r.getLong(3) == hs.count(h => h % 10 != 0 && h % 17 == 0))
      assert(r.getLong(4) == kept.length)
      assert(r.getLong(5) == roll(kept.mkString(" ")))
    }
  }
}
