package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the sixty-eighth frontier batch. */
class Frontier68QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("m10 segments: audio assets only, contiguous hot frames, no overlap") {
    val rows = run("m10_energy_segments").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 3 == 2, "audio assets only")
      val (f, l, n) = (r.getInt(2), r.getInt(3), r.getLong(4))
      assert(l - f + 1 == n, "segments are contiguous frame runs")
    }
    // per asset: segments ordered and disjoint with >=1 frame gaps
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1 to g.length).map(_.toLong))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getInt(2) > a.getInt(3) + 1)
        case _ =>
      }
    }
  }

  test("a128 Brier decomposition: BS identity holds within floor slack") {
    val rows = run("a128_brier_decomposition").collect()
    assert(rows.length == 3)
    val n = rows.map(_.getLong(1)).sum
    // weighted REL - RES + UNC ≈ Brier score of the binned forecaster;
    // each term floors once per bin → slack ≤ bins/n in micro units
    val rel = rows.map(r => r.getLong(4)).sum / 1e6 / n
    val res = rows.map(r => r.getLong(5)).sum / 1e6 / n
    val unc = rows.head.getLong(6) / 1e6
    val bs = rel - res + unc
    assert(bs >= -0.001 && bs <= 0.26, s"BS out of range: $bs")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000)
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000)
    }
  }

  test("v39 int2 recall: full overlap bound; quantization keeps most hits") {
    val rows = run("v39_int2_recall").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 5)
      assert(r.getLong(2) == r.getLong(1) * 1000 / 5)
    }
    // 2-bit codes should keep a solid share of the exact top-5 overall
    val mean = rows.map(_.getLong(1)).sum.toDouble / (5 * rows.length)
    assert(mean >= 0.3, s"mean recall $mean suspiciously low")
  }
}
