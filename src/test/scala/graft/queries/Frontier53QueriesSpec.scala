package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fifty-third frontier batch. */
class Frontier53QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("t54 blocklist: one row per doc; severity consistent with hit counts") {
    val rows = run("t54_blocklist_scan").collect()
    val nDocs = graft.Tables.documents(spark, sf("sf0.01")).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val (hits, sev, npat) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // severities are 1..3 per hit
      assert(sev >= hits && sev <= 3 * hits)
      assert(npat <= 6 && (npat == 0) == (hits == 0))
      val v = r.getString(4)
      if (sev >= 40) assert(v == "block")
      else if (sev >= 15) assert(v == "flag") else assert(v == "pass")
    }
    // the corpus vocabulary contains the patterns: some docs hit
    assert(rows.exists(_.getLong(1) > 0))
  }

  test("a112 Mann-Whitney: U bounds, symmetry identity, z2 magnitude sane") {
    val rows = run("a112_mann_whitney").collect()
    assert(rows.length == 30) // one row per corpus day
    rows.foreach { r =>
      val (n1, n2, u2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(u2 >= 0 && u2 <= 2 * n1 * n2, "0 <= U <= n1*n2 (2x units)")
      // purchase and click volumes both present every day in this corpus
      assert(n1 > 0 && n2 > 0)
      if (!r.isNullAt(4)) {
        val z2 = r.getLong(4)
        // |z| beyond 20 would mean a broken variance term
        assert(math.abs(z2) <= 400L * 1000000L)
        assert((r.getInt(5) == 1) == (math.abs(z2) > 3841600L))
      }
    }
  }

  test("ev71s quota: at most 5 per (user, hour); seqs are 1..k prefixes") {
    val rows = run("ev71s_stream_quota").collect()
    val byCell = rows.groupBy(r => (r.getLong(0), r.getLong(2)))
    byCell.values.foreach { g =>
      assert(g.length <= 5)
      assert(g.map(_.getLong(3)).sorted.toSeq == (1 to g.length).map(_.toLong))
    }
    // admitted = min(5, cell size) summed over the true cell histogram
    val cells = graft.Tables.events(spark, sf("sf0.01"))
      .groupBy(col("user_id"), expr("unix_micros(ts) div 3600000000"))
      .count().collect().map(_.getLong(2))
    assert(rows.length == cells.map(c => math.min(5L, c)).sum)
  }
}
