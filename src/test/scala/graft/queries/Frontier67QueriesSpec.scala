package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the sixty-seventh frontier batch. */
class Frontier67QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a126 CUPED: matches a double-precision reference; r2 bounded") {
    val r = run("a126_cuped").collect()(0)
    val (nT, nC) = (r.getLong(0), r.getLong(1))
    val u = graft.Tables.events(spark, sf("sf0.01"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase" &&
          dayofmonth(col("ts").cast("date")) <= 15,
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase" &&
          dayofmonth(col("ts").cast("date")) > 15,
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    assert(nT + nC == u.length)
    val t = u.filter(_._1 % 2 == 1); val c0 = u.filter(_._1 % 2 == 0)
    val rawRef = t.map(_._3).sum.toDouble / t.length -
      c0.map(_._3).sum.toDouble / c0.length
    assert(math.abs(r.getLong(2) / 1e6 - rawRef) < 0.01)
    val n = u.length.toDouble
    val (sx, sy) = (u.map(_._2).sum.toDouble, u.map(_._3).sum.toDouble)
    val cov = u.map(p => p._2.toDouble * p._3).sum * n - sx * sy
    val vx = u.map(p => p._2.toDouble * p._2).sum * n - sx * sx
    val theta = cov / vx
    val dx = t.map(_._2).sum.toDouble / t.length - c0.map(_._2).sum.toDouble / c0.length
    val cupedRef = rawRef - theta * dx
    assert(math.abs(r.getLong(3) / 1e6 - cupedRef) < 0.01,
      s"${r.getLong(3) / 1e6} vs $cupedRef")
    assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000000)
  }

  test("a127 RD: bandwidth respected; placebo jump smaller or comparable") {
    val rows = run("a127_reg_discontinuity").collect()
    assert(rows.length == 2)
    val main = rows.find(_.getLong(0) == 66).get
    val placebo = rows.find(_.getLong(0) == 54).get
    Seq(main, placebo).foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
      if (!r.isNullAt(3)) assert(math.abs(r.getLong(3)) <= 1000000)
    }
    // the band only admits users within +-8 of the cutoff
    val u = graft.Tables.events(spark, sf("sf0.01"))
      .groupBy(col("user_id")).count().collect().map(_.getLong(1))
    val inBand = u.count(r0 => r0 >= 58 && r0 < 74)
    assert(main.getLong(1) + main.getLong(2) == inBand)
  }

  test("w19 LOCF: fill counts match a per-user sequential replay") {
    val rows = run("w19_locf_fill").collect()
    val ev = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).as("p"))
      .collect()
      .groupBy(_.getLong(0))
    var expect = Map.empty[String, (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    ev.values.foreach { g =>
      var lastP: Option[Long] = None
      g.sortBy(r => (r.getTimestamp(2).getTime, r.getLong(1))).foreach { r =>
        if (!r.isNullAt(4)) lastP = Some(r.getLong(4))
        val t = r.getString(3)
        val (n, nf, s) = expect(t)
        expect += t -> (n + 1, nf + (if (lastP.isDefined) 1 else 0),
          s + lastP.getOrElse(0L))
      }
    }
    rows.foreach { r =>
      val (n, nf, s) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == nf)
      assert(r.isNullAt(3) && s == 0 || r.getLong(3) == s)
    }
  }
}
