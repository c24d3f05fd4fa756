package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the tenth frontier batch. */
class Frontier10QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a42 sharded-prefix KS equals the single-window ECDF supremum") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val d = sf("sf0.01")
    val r = run("a42_ks_test", d).head
    val (n1, n2, maxGap) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    // referee: one unpartitioned window at spec scale
    val v = graft.Tables.events(spark, d)
      .filter(col("event_type").isin("click", "view"))
      .select((col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long").as("x"),
        when(col("event_type") === "click", 1).otherwise(0).as("s1"))
    val g = v.groupBy(col("x"))
      .agg(count(when(col("s1") === 1, 1)).as("d1"),
        count(when(col("s1") === 0, 1)).as("d2"))
    val w = Window.orderBy(col("x")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = g.withColumn("c1", sum(col("d1")).over(w))
      .withColumn("c2", sum(col("d2")).over(w))
    val gap = c.agg(max(abs(lit(n2) * col("c1") - lit(n1) * col("c2")))).head.getLong(0)
    assert(maxGap == gap)
  }

  test("a43 U statistic matches the brute-force pair count (U = wins + ties/2)") {
    import org.apache.spark.sql.types.DecimalType
    val d = sf("sf0.001")
    val r = run("a43_rank_sum_u", d).head
    val v = graft.Tables.events(spark, d)
      .filter(col("event_type").isin("click", "view"))
      .select((col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long").as("x"),
        (col("event_type") === "click").as("isC"))
      .collect().map(row => (row.getLong(0), row.getBoolean(1)))
    val clicks = v.filter(_._2).map(_._1)
    val views = v.filterNot(_._2).map(_._1)
    // U1 doubled = 2*#(click > view) + #(click == view)
    var u2 = 0L
    for (c <- clicks; w <- views) {
      if (c > w) u2 += 2 else if (c == w) u2 += 1
    }
    assert(r.getLong(3) == u2, s"${r.getLong(3)} vs $u2")
    assert(r.getLong(0) == clicks.length && r.getLong(1) == views.length)
  }

  test("t34 pass@k bounds: pass@1 <= pass@5 <= 1, exact when all or none correct") {
    val rows = run("t34_pass_at_k").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c, p1) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(p1 >= 0.0 && p1 <= 1.0)
      if (!r.isNullAt(4)) {
        val p5 = r.getDouble(4)
        assert(p5 >= p1 - 1e-12 && p5 <= 1.0)
        if (c == 0) assert(p5 == 0.0)
        if (c == n) assert(p5 == 1.0)
      } else assert(n < 5)
    }
  }

  test("u22 digest detects a single dropped input row") {
    val rows = run("u22_lineage_digest").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // recompute with one order removed: exactly the affected nation's
    // digest changes, every other digest is unchanged
    val d = sf("sf0.01")
    val victim = graft.Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_custkey")).head
    val dims = graft.Tables.customer(spark, d).select(col("c_custkey"), col("c_nationkey"))
      .join(graft.Tables.nation(spark, d).select(col("n_nationkey"), col("n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val victimNation = dims.filter(col("c_custkey") === victim.getLong(1))
      .head.getString(1)
    val altered = graft.Tables.orders(spark, d)
      .filter(col("o_orderkey") =!= victim.getLong(0))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .select(col("n_name"),
        graft.functions.TextFunctions
          .rollingFingerprint(col("o_orderkey").cast("string")).as("kh"))
      .groupBy(col("n_name"))
      .agg((sum(col("kh")) % lit(2305843009213693951L)).as("digest"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    altered.foreach { case (nation, dig) =>
      if (nation == victimNation) assert(dig != rows(nation))
      else assert(dig == rows(nation))
    }
  }
}
