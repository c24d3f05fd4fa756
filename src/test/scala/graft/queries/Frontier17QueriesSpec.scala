package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the seventeenth frontier batch. */
class Frontier17QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a51 rolling correlation stays in [-1, 1] and covers full frames only") {
    val rows = run("a51_rolling_corr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(3)) {
        val c = r.getDouble(3)
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      }
    }
    // rn >= 7 filter: days emitted = observed days - 6
    val nDays = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("ts").cast("date")).distinct().count()
    assert(rows.length == nDays - 6)
  }

  test("v19 JL projection: deterministic, zero-shuffle, distances roughly preserved") {
    val df = run("v19_random_projection")
    // plan: no Exchange — the projection is scan-stage per-row algebra
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    val rows = df.collect()
    assert(rows.length % 16 == 0 && rows.nonEmpty)
    // JL property on a fixed sample: relative pairwise-distance
    // distortion of the scaled projection is bounded (sanity band —
    // 16 dims is a coarse sketch)
    val byVec = rows.groupBy(_.getLong(0)).view
      .mapValues(rs => rs.sortBy(_.getInt(1)).map(_.getLong(2).toDouble)).toMap
    val emb = graft.Tables.embeddings(spark, sf("sf0.01"))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble * 1e6).toArray).toMap
    val ids = emb.keys.toArray.sorted.take(12)
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ratios = for {
      i <- ids.indices; jj <- (i + 1) until ids.length
      dOrig = dist(emb(ids(i)), emb(ids(jj))) if dOrig > 0
      // Rademacher +-1 entries: E[||proj||^2] = k * ||x||^2 → scale by sqrt(k)
      dProj = dist(byVec(ids(i)).toArray, byVec(ids(jj)).toArray) / math.sqrt(16.0)
    } yield dProj / dOrig
    val mean = ratios.sum / ratios.size
    assert(mean > 0.5 && mean < 2.0, s"gross distance distortion: mean ratio $mean")
  }

  test("u24 discovers the true FKs at 1.0 and reports partial containment for decoys") {
    val rows = run("u24_fk_discovery").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.length == 7)
    val byPair = rows.map(r => (r._1, r._2) -> r._5).toMap
    assert(byPair(("lineitem.l_partkey", "part.p_partkey")) == 1.0)
    assert(byPair(("lineitem.l_suppkey", "supplier.s_suppkey")) == 1.0)
    assert(byPair(("orders.o_custkey", "customer.c_custkey")) == 1.0)
    assert(byPair(("customer.c_nationkey", "nation.n_nationkey")) == 1.0)
    // decoy: 25 nation keys vs 5 region keys — containment must be partial
    val decoy = byPair(("customer.c_nationkey", "region.r_regionkey"))
    assert(decoy > 0.0 && decoy < 1.0)
  }
}
