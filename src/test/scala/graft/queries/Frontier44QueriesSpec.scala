package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the forty-fourth frontier batch. */
class Frontier44QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a100 HLL: estimate lands within the theoretical error envelope") {
    val rows = run("a100_hll_sketch").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (nExact, hllMilli) = (r.getLong(1), r.getLong(2))
      // 1.04/sqrt(256) = 6.5% standard error; allow 4 sigma
      val est = hllMilli / 1000.0
      assert(math.abs(est - nExact) <= 0.26 * nExact + 8,
        s"${r.getString(0)}: est $est vs exact $nExact outside 4-sigma HLL envelope")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 256, "zero-register count sane")
    }
  }

  test("u38 rendezvous: all docs assigned; resize moves ~1/9 of keys, never more") {
    val rows = run("u38_rendezvous_shards").collect()
    val nDocs = graft.Tables.documents(spark, sf("sf0.01")).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "every doc assigned to one shard")
    assert(rows.map(_.getLong(0)).sorted.toSeq == (0L to 7L), "all 8 shards populated")
    val moved = rows.map(_.getLong(2)).sum
    // HRW guarantee: only keys whose NEW shard (8) wins move; E[moved] = n/9
    assert(moved.toDouble / nDocs < 0.2, s"moved $moved of $nDocs — HRW should move ~1/9")
    assert(moved > 0, "a resize that moves nothing is wrong")
    // balance: max shard within 2x of min (md5 is uniform)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max < 2 * sizes.min, "rendezvous placement should be near-uniform")
  }

  test("ev66 CEP: pattern counts agree with a driver-side recount on a sample") {
    val r = run("ev66_cep_regex").collect()(0)
    val nUsers = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id")).distinct().count()
    assert(r.getLong(0) == nUsers)
    assert(r.getLong(1) <= r.getLong(2), "users with >=1 match <= total matches")
    assert(r.getLong(3) <= r.getLong(4))
    // driver recount of the funnel pattern over raw journeys
    val journeys = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c"))
      .groupBy(col("user_id"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(ts, event_id, c))), x -> x.c), '')")
        .as("j"))
      .collect().map(_.getString(1))
    val re = "vc*p".r
    val total = journeys.map(j => re.findAllMatchIn(j).size.toLong).sum
    assert(r.getLong(2) == total, "regexp_count equals JVM-side non-overlapping count")
  }
}
