package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fourteenth frontier batch. */
class Frontier14QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("f5 variant shred conserves events and matches string-path extraction") {
    val rows = run("f5_variant_shred").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val events = graft.Tables.events(spark, sf("sf0.01"))
    assert(total == events.count())
    // variant byte-offset access must agree with string-reparse access
    val mismatch = events.select(
      variant_get(parse_json(col("props")), "$.k", "int").as("a"),
      get_json_object(col("props"), "$.k").cast("int").as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatch == 0)
  }

  test("j8 lateral top-k equals the window formulation and decorrelates") {
    val got = run("j8_lateral_topk")
    // per-nation top-2 via the window formulation
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_name"))
    val want = graft.Tables.customer(spark, sf("sf0.01"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .join(graft.Tables.nation(spark, sf("sf0.01")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"), col("c_acctbal"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    // decorrelation: no per-outer-row re-execution — the plan must not
    // contain a nested-loop join carrying the LIMIT inside
    val plan = got.queryExecution.optimizedPlan.toString
    assert(!plan.contains("LateralJoin"), "lateral subquery should decorrelate")
  }

  test("ev41 paths: per-session prefix bounded at 3 and counts conserve sessions") {
    val rows = run("ev41_event_paths").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    rows.foreach { r =>
      val hops = r.getString(0).split(">")
      assert(hops.length >= 1 && hops.length <= 3)
    }
    // top-10 ordering is (n DESC, path ASC)
    val pairs = rows.map(r => (r.getLong(1), r.getString(0)))
    pairs.zip(pairs.tail).foreach { case ((n1, p1), (n2, p2)) =>
      assert(n1 > n2 || (n1 == n2 && p1 < p2))
    }
  }
}
