package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the twenty-second frontier batch. */
class Frontier22QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("u27 field merge takes each field's own latest non-null contributor") {
    val rows = run("u27_field_merge").collect()
    assert(rows.nonEmpty)
    // reference: per user, value of the latest purchase / latest click
    val ev = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents")).collect()
    val byUser = ev.groupBy(_.getLong(0))
    rows.foreach { r =>
      val u = r.getLong(0)
      val evs = byUser(u)
      def latest(t: String): Option[Long] =
        evs.filter(_.getString(2) == t).sortBy(-_.getLong(1)).headOption.map(_.getLong(3))
      assert(Option(if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)))
        .map(_.toLong) == latest("purchase"), s"user $u purchase")
      assert(Option(if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2)))
        .map(_.toLong) == latest("click"), s"user $u click")
      assert(r.getLong(3) == evs.length)
    }
  }

  test("a62 Simpson detector: slopes finite, pooled constant, flip consistent") {
    val rows = run("a62_simpson_flip").collect()
    assert(rows.nonEmpty)
    val pooled = rows.map(_.getDouble(3)).distinct
    assert(pooled.length == 1)
    rows.foreach { r =>
      val (seg, pool, flip) = (r.getDouble(2), r.getDouble(3), r.getBoolean(4))
      assert(!seg.isNaN && !pool.isNaN)
      // flip flag consistent with the rounded slopes' signs (rounding
      // can zero a slope; only assert when both are clearly signed)
      if (math.abs(seg) > 1e-5 && math.abs(pool) > 1e-5)
        assert(flip == (seg * pool < 0))
    }
  }

  test("c24 dataset cards: counts conserve, rates bounded, modal lang is real") {
    val rows = run("c24_dataset_card").collect()
    assert(rows.nonEmpty)
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs == graft.Tables.documents(spark, sf("sf0.01")).count())
    val langs = graft.Tables.documents(spark, sf("sf0.01"))
      .select(col("lang")).distinct().collect().map(_.getString(0)).toSet
    rows.foreach { r =>
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) < 1.0) // dup_rate
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0) // short_frac
      assert(r.getLong(4) >= 1 && langs.contains(r.getString(5)))
      assert(r.getDouble(3) > 0) // mean tokens
    }
  }
}
