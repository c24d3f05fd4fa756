package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fifty-second frontier batch. */
class Frontier52QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("m8 phash: exact duplicate prefixes land at hamming 0; pairs ordered") {
    val rows = run("m8_phash_neardup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs are canonical (a < b)")
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 6)
    }
    // docs sharing a 48-char text prefix share the asset payload prefix
    // bit-for-bit, so their signatures are identical => hamming 0 and
    // every band collides => the pair MUST be found
    val docs = graft.Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id"), substring(col("text"), 1, 48).as("p"))
      .filter(length(col("p")) >= 48)
    val expectedZero = docs.as("a").join(docs.as("b"),
        col("a.p") === col("b.p") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val zeroFound = rows.filter(_.getInt(2) == 0)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expectedZero.subsetOf(zeroFound),
      s"missing ${expectedZero.diff(zeroFound).size} exact-prefix pairs")
    // no duplicate pairs despite the 4-band fan-out
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("ev70 journey distance: bands cover all users; sums consistent") {
    val rows = run("ev70_journey_distance").collect()
    val nUsers = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nUsers)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), "min <= max")
      assert(r.getLong(4) >= r.getLong(2) * r.getLong(1), "sum >= n*min")
      assert(r.getLong(4) <= r.getLong(3) * r.getLong(1), "sum <= n*max")
    }
    // canonical is 22 chars: distance >= jlen - 22 for long journeys,
    // and <= max(jlen, 22); bands are permille/250 so 0..4
    rows.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) <= 4))
  }

  test("a111 cube: the four grouping levels are mutually consistent") {
    val rows = run("a111_cube_rollup").collect()
    val byGid = rows.groupBy(_.getLong(2))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    val grand = byGid(3L)
    assert(grand.length == 1 && grand.head.isNullAt(0) && grand.head.isNullAt(1))
    val total = grand.head.getLong(3)
    // every partial level re-sums to the grand total
    assert(byGid(0L).map(_.getLong(3)).sum == total)
    assert(byGid(1L).map(_.getLong(3)).sum == total) // linestatus rolled up
    assert(byGid(2L).map(_.getLong(3)).sum == total) // returnflag rolled up
    assert(byGid(0L).map(_.getLong(4)).sum == grand.head.getLong(4))
    assert(byGid(0L).map(_.getLong(5)).sum == grand.head.getLong(5))
  }
}
