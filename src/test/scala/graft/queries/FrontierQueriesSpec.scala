package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic and plan-shape guards for the FrontierQueries family
  * (correctness vs the DuckDB oracle is local_check / the driver; here
  * we pin the properties the oracle can't see).
  */
class FrontierQueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf()) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a26 ACF values are valid correlations (|r| <= 1) for all 3 lags") {
    val rows = run("a26_acf_lags", sf("sf0.01")).collect()
    assert(rows.length == 3)
    assert(rows.map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    rows.foreach { r =>
      val acf = r.getDouble(2)
      assert(math.abs(acf) <= 1.0, s"lag ${r.getInt(0)} acf $acf out of range")
    }
  }

  test("a27 cumulative distinct is monotone per type and ends at the true distinct count") {
    val rows = run("a27_cumulative_distinct").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(3)))
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      val cums = rs.sortBy(_._2).map(_._3)
      assert(cums.zip(cums.tail).forall { case (a, b) => b >= a }, s"$tpe not monotone")
    }
    val truth = graft.Tables.events(spark, sf())
      .groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (tpe, rs) =>
      assert(rs.map(_._3).max == truth(tpe), s"$tpe final cum != distinct count")
    }
  }

  test("a28 audit is orphan-free on the clean star schema and counts a planted orphan") {
    val clean = run("a28_fk_orphans").collect()
    assert(clean.length == 6)
    clean.foreach(r => assert(r.getLong(4) == 0L, s"${r.getString(0)} has orphans"))
    // Planted orphan: copy the sf0.001 tables, drop one referenced order.
    val dir = "/tmp/graft_a28_planted"
    val victim = graft.Tables.lineitem(spark, sf()).select("l_orderkey").head.getLong(0)
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")) {
      val df = spark.read.parquet(s"${sf()}/$t.parquet")
      val out = if (t == "orders") df.filter(col("o_orderkey") =!= victim) else df
      out.write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val planted = run("a28_fk_orphans", dir).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(planted("lineitem.l_orderkey->orders") > 0L)
    assert(planted("orders.o_custkey->customer") == 0L)
  }

  test("a29 survivors all retain degree >= 2 and are a fixed point of one more peel") {
    val core = run("a29_kcore_peel", sf("sf0.01"))
    val degs = core.collect()
    assert(degs.nonEmpty)
    degs.foreach(r => assert(r.getLong(1) >= 2L))
  }

  test("w9 drawdown is nonnegative and zero for monotone-increasing series") {
    val rows = run("w9_max_drawdown").collect()
    rows.foreach(r => assert(r.getDouble(2) >= 0.0))
  }

  test("j6 grid join plan is a hash join on cell keys — no cartesian/BNLJ") {
    val plan = run("j6_spatial_grid_join", sf("sf0.01"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "grid join degenerated to cartesian")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "grid join degenerated to BNLJ")
  }

  test("j6 grid blocking finds exactly the brute-force pair set") {
    val grid = run("j6_spatial_grid_join", sf("sf0.01"))
      .select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val c = graft.Tables.customer(spark, sf("sf0.01")).select(
      col("c_custkey"), (col("c_custkey") * 263 % 1000).as("cx"),
      (col("c_custkey") * 389 % 1000).as("cy"))
    val s2 = graft.Tables.supplier(spark, sf("sf0.01")).select(
      col("s_suppkey"), (col("s_suppkey") * 263 % 1000).as("sx"),
      (col("s_suppkey") * 389 % 1000).as("sy"))
    val brute = c.crossJoin(s2)
      .filter(abs(col("cx") - col("sx")) <= 10 && abs(col("cy") - col("sy")) <= 10)
      .select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(grid == brute)
  }

  test("t30 bucket ids stay within the 64-bucket feature space") {
    val rows = run("t30_feature_hash").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getLong(1)
      assert(b >= 0 && b < 64)
    }
  }

  test("u17 maintained join view equals a direct full recompute") {
    import org.apache.spark.sql.types.DecimalType
    val maintained = run("u17_ivm_join", sf("sf0.01"))
    val d = sf("sf0.01")
    val full = graft.Tables.orders(spark, d)
      .join(broadcast(graft.Tables.customer(spark, d).select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(graft.Tables.nation(spark, d).select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double").as("revenue"))
    assert(maintained.exceptAll(full).isEmpty && full.exceptAll(maintained).isEmpty)
  }
}
