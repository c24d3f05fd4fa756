package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fifth frontier batch. */
class Frontier5QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a37 mode is the true per-group argmax and median nation has the cume property") {
    val rows = run("a37_grouped_mode").collect()
    assert(rows.length == 5)
    val g = graft.Tables.customer(spark, sf("sf0.01"))
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    rows.foreach { r =>
      val seg = r.getString(0)
      val inSeg = g.filter(_._1 == seg)
      val maxN = inSeg.map(_._3).max
      assert(r.getLong(2) == maxN)
      // mode tie-break: smallest nation among argmax
      assert(r.getInt(1) == inSeg.filter(_._3 == maxN).map(_._2).min)
    }
  }

  test("u16 gap audit counts exactly the orderkeys with no lineitems") {
    val missing = run("u16_id_gap_audit").collect().map(_.getLong(3)).sum
    val d = sf("sf0.01")
    val truth = graft.Tables.orders(spark, d).select(col("o_orderkey"))
      .join(graft.Tables.lineitem(spark, d).select(col("l_orderkey")).distinct(),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .count()
    // identical iff the lineitem keyspace spans the full orders range
    // (it does at every sf: min=0 key has lineitems, max key too)
    assert(missing == truth, s"$missing vs $truth")
  }

  test("ev35 peaks strictly exceed both calendar neighbors") {
    import org.apache.spark.sql.types.DecimalType
    val d = sf("sf0.01")
    val peaks = run("ev35_peak_days").collect().map(_.getDate(0).toString).toSet
    val daily = graft.Tables.orders(spark, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum((col("o_totalprice").cast(DecimalType(18, 4)) * lit(10000))
        .cast("long")).as("x"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    peaks.foreach { p =>
      val day = java.time.LocalDate.parse(p)
      assert(daily(day) > daily(day.minusDays(1)) && daily(day) > daily(day.plusDays(1)))
    }
    assert(peaks.nonEmpty)
  }

  test("a38 weekday indexes average to ~1 weighted by day counts") {
    val rows = run("a38_weekday_index").collect()
    assert(rows.map(_.getInt(0)).sorted.toSeq == (1 to 7))
    val weighted = rows.map(r => r.getDouble(2) * r.getLong(1)).sum /
      rows.map(_.getLong(1)).sum
    assert(math.abs(weighted - 1.0) < 1e-9)
  }
}
