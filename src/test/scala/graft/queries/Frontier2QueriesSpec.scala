package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the second frontier batch (oracle bit-exactness
  * is local_check / the driver).
  */
class Frontier2QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a31 CUSUM drift is nonnegative and ranked 1..5") {
    val rows = run("a31_cusum_drift").collect()
    assert(rows.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    rows.foreach(r => assert(r.getDouble(2) >= 0.0))
    // telescoped max(0, ...) recursion equals the explicit recurrence
    // on a hand-built series: x = [10, 2, 2, 10, 10], mean = 6.8
    // c_t = 5*x_t - 34 -> [16,-24,-24,16,16]; P=[16,-8,-32,-16,0]
    // S_t = P_t - min(0, min P_<=t) = [16,0,0,16,32]
    val p = Seq(16L, -8L, -32L, -16L, 0L)
    val expected = Seq(16L, 0L, 0L, 16L, 32L)
    val got = p.zipWithIndex.map { case (pt, i) =>
      pt - math.min(0L, p.take(i + 1).min)
    }
    assert(got == expected)
  }

  test("a32 skyline equals the brute-force NOT EXISTS set") {
    val sky = run("a32_pareto_front").collect()
      .map(r => r.getLong(0)).toSet
    val parts = graft.Tables.part(spark, sf("sf0.01"))
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
    val brute = parts.as("p").join(parts.as("q"),
        col("q.p_size") <= col("p.p_size") &&
          col("q.p_retailprice") <= col("p.p_retailprice") &&
          (col("q.p_size") < col("p.p_size") ||
            col("q.p_retailprice") < col("p.p_retailprice")),
        "left_anti")
      .select(col("p.p_partkey")).collect().map(_.getLong(0)).toSet
    assert(sky == brute)
    assert(sky.nonEmpty)
  }

  test("t31 RAKE output contains no stopwords and scores >= 1") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is")
    val rows = run("t31_rake_keywords").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(!stop.contains(r.getString(0)))
      assert(r.getDouble(3) >= 1.0) // degree >= freq always (phrase len >= 1)
    }
  }

  test("c16 replication audit is consistent (factor*orig == after, majority factor 1)") {
    val rows = run("c16_class_balance").collect()
    val maxN = rows.map(_.getLong(1)).max
    rows.foreach { r =>
      val (n, f, after) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(f == maxN / n)
      assert(after == n * f)
      assert(after <= maxN)
      if (n == maxN) assert(f == 1L)
    }
  }

  test("v15 drift is nonnegative and both parity halves are populated") {
    val rows = run("v15_embedding_drift").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0)
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }
}
