package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the thirty-sixth frontier batch. */
class Frontier36QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a88 two-way ANOVA: SS components are non-negative and decompose the total") {
    val r = run("a88_twoway_anova").collect()(0)
    val (ssA, ssB, ssAB, ssE) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(ssA >= -1e-6 && ssB >= -1e-6 && ssE >= -1e-6)
    // SSA + SSB + SSAB = SSCells >= max(SSA, SSB) in the sequential scheme
    val ssCells = ssA + ssB + ssAB
    assert(ssCells >= math.max(ssA, ssB) - 1e-6)
    assert(!r.getDouble(5).isNaN)
  }

  test("ev61 Lindley: at rho=1 some arrivals wait; W bounds hold") {
    val rows = run("ev61_queue_lindley").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (n, wMax, nWait, wMean) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(wMax >= 0 && wMean >= 0 && wMean <= wMax)
      assert(nWait <= n)
      // mean service = mean gap means the queue is critical: waiting occurs
      assert(nWait > 0, "rho=1 queue with no waiting arrival is implausible")
    }
  }

  test("v27 Davies-Bouldin: per-cluster rows complete; db_i >= pairwise lower bound") {
    val rows = run("v27_davies_bouldin").collect()
    assert(rows.length == 10)
    val total = graft.Tables.embeddings(spark, sf("sf0.01")).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0, "scatter must be positive")
      assert(r.getDouble(3) > 0.0, "DB index term must be positive")
    }
  }

  test("u32 zone-map pruning: monotone in tau; scanned+matched consistent") {
    val rows = run("u32_zonemap_prune").collect().sortBy(_.getDouble(0))
    assert(rows.length == 5)
    val pruned = rows.map(_.getLong(2))
    val matched = rows.map(_.getLong(4))
    // higher tau can only prune MORE files and match FEWER rows
    assert(pruned.toSeq == pruned.sorted.toSeq)
    assert(matched.toSeq == matched.sorted.reverse.toSeq)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3) || r.getLong(3) == 0,
        "matched rows must lie inside scanned rows")
    }
  }
}
