package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fifty-ninth frontier batch. */
class Frontier59QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("u43 keyset page: exactly rows 101-150 of the global order") {
    val rows = run("u43_keyset_pagination").collect()
    assert(rows.length == 50)
    // reference: offset/limit over a full sort must agree
    val ref = graft.Tables.lineitem(spark, sf("sf0.01"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .limit(150).collect().drop(100)
      .map(r => (r.getAs[Any](10).toString, r.getLong(0), r.getInt(3)))
    val got = rows.map(r => (r.getAs[Any](0).toString, r.getLong(1), r.getInt(2)))
    assert(got.toSeq == ref.toSeq)
    // the plan stays top-k: no global Sort without a limit
    val p = graft.SparkEntry.queries("u43_keyset_pagination")(spark, sf("sf0.01"))
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("c41 systematic resample: ~100 picks, one per stride crossing") {
    val rows = run("c41_systematic_resample").collect()
    assert(rows.length >= 99 && rows.length <= 101, s"${rows.length} picks")
    // pick indices strictly increase with cum and are distinct per crossing
    val byIdx = rows.map(_.getLong(3))
    assert(byIdx.distinct.length >= byIdx.length - 1,
      "a doc spanning multiple strides may absorb consecutive indices")
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1)))
    // determinism across runs
    val again = run("c41_systematic_resample").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == again.map(_.getLong(0)).sorted.toSeq)
    // heavier docs are proportionally likelier: the sample's mean weight
    // exceeds the corpus mean (size-biased sampling)
    val meanAll = graft.Tables.documents(spark, sf("sf0.01"))
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val meanPicked = rows.map(_.getLong(1)).sum.toDouble / rows.length
    assert(meanPicked > meanAll * 0.95, s"$meanPicked vs $meanAll")
  }

  test("u44 dict planner: exact stats; low-cardinality columns win") {
    val rows = run("u44_dict_encoding_planner").collect()
    assert(rows.length == 3)
    val o = graft.Tables.orders(spark, sf("sf0.01"))
    val n = o.count()
    rows.foreach { r =>
      assert(r.getLong(1) == n)
      assert(r.getLong(2) <= r.getLong(3), "distinct <= total bytes sanity")
      val bits = r.getLong(4)
      assert((1L << bits) >= r.getLong(2), "2^bits covers the dictionary")
      if (bits > 1) assert((1L << (bits - 1)) < r.getLong(2))
    }
    val status = rows.find(_.getString(0) == "o_orderstatus").get
    assert(status.getLong(2) <= 3, "orderstatus has tiny cardinality")
    assert(status.getLong(6) < 1000, "dictionary encoding wins for orderstatus")
  }
}
