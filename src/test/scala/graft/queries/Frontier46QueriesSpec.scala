package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the forty-sixth frontier batch. */
class Frontier46QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("f7 business days: kernel agrees with a JVM-side day walk on a sample") {
    val rows = run("f7_business_days").collect()
    def bdays(a: java.time.LocalDate, b: java.time.LocalDate): Long = {
      val (lo, hi) = if (a.isBefore(b) || a.isEqual(b)) (a, b) else (b, a)
      var d = lo; var n = 0L
      while (d.isBefore(hi)) {
        if (d.getDayOfWeek.getValue <= 5) n += 1
        d = d.plusDays(1)
      }
      if (a.isAfter(b)) -n else n
    }
    rows.take(200).foreach { r =>
      val od = r.getDate(1).toLocalDate
      val ship = r.getDate(3).toLocalDate
      assert(r.getLong(4) == bdays(od, ship),
        s"kernel bdays ${r.getLong(4)} vs walk ${bdays(od, ship)} for $od -> $ship")
      // promised date: the 10th business day STRICTLY AFTER od — count
      // weekdays in (od, promised], not the [od, promised) bdays metric
      // (the two differ when od falls on a weekend)
      val promised = r.getDate(2).toLocalDate
      var d = od.plusDays(1); var n = 0
      while (!d.isAfter(promised)) {
        if (d.getDayOfWeek.getValue <= 5) n += 1
        d = d.plusDays(1)
      }
      assert(n == 10 && promised.getDayOfWeek.getValue <= 5,
        s"promised $promised is not the 10th business day after $od (walk: $n)")
    }
  }

  test("u39 golden record: one row per customer; rules verified on a sample") {
    val rows = run("u39_golden_record").collect()
    val nCust = graft.Tables.orders(spark, sf("sf0.01"))
      .select(col("o_custkey")).distinct().count()
    assert(rows.length == nCust)
    val orders = graft.Tables.orders(spark, sf("sf0.01")).collect()
    val byCust = orders.groupBy(_.getLong(1))
    rows.take(100).foreach { r =>
      val grp = byCust(r.getLong(0))
      assert(r.getLong(3) == grp.length, "n_obs = observation count")
      val latest = grp.maxBy(o => (o.getTimestamp(4).getTime, o.getLong(0)))
      assert(r.getString(1) == latest.getString(2), "RECENCY rule for status")
      val mode = grp.groupBy(_.getString(5)).toSeq
        .maxBy { case (p, g) => (g.length, -p.head.toInt) }
      assert(grp.count(_.getString(5) == r.getString(2)) >= grp.count(_.getString(5) == mode._1) ||
        r.getString(2) == mode._1, "FREQUENCY rule picks a maximal-count priority")
    }
  }

  test("v30 item-item CF: top-3 per item, scores bounded and symmetric-consistent") {
    val rows = run("v30_item_item_cf").collect()
    val perItem = rows.groupBy(_.getLong(0))
    perItem.foreach { case (_, g) =>
      assert(g.length <= 3)
      assert(g.map(_.getInt(4)).sorted.toSeq == (1 to g.length))
      // cos^2 <= 1 in micro units
      g.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000000))
      // ranks ordered by score desc
      val sorted = g.sortBy(_.getInt(4))
      sorted.sliding(2).filter(_.length == 2).foreach { w =>
        assert(w(0).getLong(3) >= w(1).getLong(3))
      }
    }
    // co-occurrence counts are symmetric: c(item,neighbor) appears with the
    // same c when roles swap (if the swapped pair also ranks top-3)
    val cMap = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cMap.foreach { case ((i, j), c) =>
      cMap.get((j, i)).foreach(c2 => assert(c2 == c, s"asymmetric count for $i,$j"))
    }
  }
}
