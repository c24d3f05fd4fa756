package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fifty-eighth frontier batch. */
class Frontier58QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a118 partial correlation: both coefficients bounded; n_days = 30") {
    val r = run("a118_partial_correlation").collect()(0)
    assert(r.getLong(0) == 30)
    if (!r.isNullAt(1)) assert(math.abs(r.getLong(1)) <= 1000000L)
    if (!r.isNullAt(2)) assert(math.abs(r.getLong(2)) <= 1000000L)
  }

  test("m9 scene cuts: only video assets, sampled-grid neighbors, delta > 400") {
    val rows = run("m9_scene_cuts").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 3 == 0, "video assets only")
      assert(r.getInt(1) - r.getInt(2) == 2, "consecutive sampled frames step by 2")
      assert(r.getLong(3) > 400 && r.getLong(3) <= 999)
    }
    // cut fraction is plausible for a ~uniform mod-1000 signature:
    // P(|d| > 400) ≈ 0.36 — accept a broad band
    val transitions = graft.Tables.documents(spark, sf("sf0.01"))
      .filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") % 10).cast("int").as("f"))
      .collect().map(r => r.getInt(0) / 2).sum
    val frac = rows.length.toDouble / transitions
    assert(frac > 0.15 && frac < 0.60, s"cut fraction $frac")
  }

  test("c40 fingerprint: total row consistent; permutation-invariant") {
    val rows = run("c40_content_fingerprint").collect()
    val total = rows.filter(_.getString(0) == "TOTAL")
    val per = rows.filter(_.getString(0) != "TOTAL")
    assert(total.length == 1)
    assert(per.map(_.getLong(1)).sum == total.head.getLong(1))
    rows.foreach(r => assert(r.getLong(2) >= 0 && r.getLong(2) < 1000000007L))
    // order independence: recomputing over a repartitioned scan gives
    // the identical digests
    val again = run("c40_content_fingerprint").collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
    // digests actually discriminate: sources have distinct fingerprints
    assert(per.map(_.getLong(2)).distinct.length == per.length)
  }
}
