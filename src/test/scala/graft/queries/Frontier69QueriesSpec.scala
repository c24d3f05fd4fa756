package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the sixty-ninth frontier batch. */
class Frontier69QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("w20 weekday anomaly: flags replicate a driver-side median/MAD check") {
    val rows = run("w20_weekday_anomaly").collect()
    assert(rows.length == 30)
    val byDow = rows.groupBy(_.getInt(1))
    byDow.foreach { case (_, g) =>
      val xs = g.map(_.getLong(2)).sorted
      val m = xs.length
      val med2 = if (m % 2 == 1) 2 * xs(m / 2) else xs(m / 2 - 1) + xs(m / 2)
      assert(g.forall(_.getLong(3) == med2))
      val devs = g.map(r => math.abs(2 * r.getLong(2) - med2)).sorted
      val mad4 = if (m % 2 == 1) 2 * devs(m / 2) else devs(m / 2 - 1) + devs(m / 2)
      assert(g.forall(_.getLong(4) == mad4))
      g.foreach { r =>
        val dev2 = math.abs(2 * r.getLong(2) - med2)
        assert((r.getInt(5) == 1) == (2 * dev2 > 3 * mad4))
      }
    }
  }

  test("c45 balanced batches: early batches hold one doc per language") {
    val rows = run("c45_balanced_batches").collect().sortBy(_.getLong(0))
    val nLangs = graft.Tables.documents(spark, sf("sf0.01"))
      .select(col("lang")).distinct().count()
    val minClassSize = graft.Tables.documents(spark, sf("sf0.01"))
      .groupBy(col("lang")).count().collect().map(_.getLong(1)).min
    // every batch below the smallest class size is perfectly balanced
    rows.filter(_.getLong(0) < minClassSize).foreach { r =>
      assert(r.getLong(1) == nLangs && r.getLong(2) == nLangs && r.getInt(3) == 1)
    }
    // conservation: batch items sum to the corpus
    assert(rows.map(_.getLong(1)).sum ==
      graft.Tables.documents(spark, sf("sf0.01")).count())
  }

  test("q26 null semantics: three-valued-logic identities hold") {
    val r = run("q26_null_semantics").collect()(0)
    val (n, na, nb) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (eq, nse, df) = (r.getLong(3), r.getLong(4), r.getLong(5))
    assert(nse + df == n, "null-safe eq and distinct-from partition all rows")
    assert(eq <= nse, "plain = can only lose null=null matches")
    // rows where both are null: a null iff type='error' and b null iff id%5=0
    val bothNull = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "error" && col("event_id") % 5 === 0).count()
    assert(nse == eq + bothNull)
    assert(na < n && nb < n)
    assert(r.getLong(6) == 4, "NULLIF removed 'error' from the domain")
  }
}
