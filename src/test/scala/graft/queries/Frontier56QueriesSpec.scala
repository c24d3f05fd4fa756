package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fifty-sixth frontier batch. */
class Frontier56QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a116 boosting: three rounds, gains non-negative, split semantics hold") {
    val rows = run("a116_boosted_stumps").collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val n = graft.Tables.events(spark, sf("sf0.01")).count()
    rows.foreach { r =>
      val (f, t) = (r.getInt(1), r.getLong(2))
      assert(f == 0 || f == 1)
      if (f == 0) assert(t >= 0 && t <= 23) else assert(t >= 0 && t <= 6)
      assert(r.getLong(5) >= 0, "variance reduction is non-negative")
      assert(r.getLong(6) + r.getLong(7) == n, "split partitions the corpus")
      assert(r.getLong(6) > 0 && r.getLong(7) > 0)
    }
    // boosting fits residuals: round-1 gain is the largest (greedy)
    assert(rows(0).getLong(5) >= rows(1).getLong(5))
    // leaf values are bounded by the raw cent range
    rows.foreach(r => assert(math.abs(r.getLong(3)) <= 100000L
      && math.abs(r.getLong(4)) <= 100000L))
  }

  test("c39 k-fold: 5 folds per stratum, zero leaks, plausible balance") {
    val rows = run("c39_kfold_audit").collect()
    assert(rows.length == 5)
    val n = graft.Tables.events(spark, sf("sf0.01")).count()
    assert(rows.map(_.getLong(2)).sum == n)
    rows.foreach { r =>
      assert(r.getLong(1) == 5, "every stratum uses all 5 folds")
      assert(r.getLong(4) == 0, "a deterministic hash cannot leak ids")
      // md5 is uniform: imbalance stays well under the stratum size
      assert(r.getLong(3) < r.getLong(2) / 5)
    }
    // determinism: a second run yields the identical assignment
    val again = run("c39_kfold_audit").collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }
}
