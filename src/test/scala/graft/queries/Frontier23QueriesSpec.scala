package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the twenty-third frontier batch. */
class Frontier23QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a63 CCF: lag 0 matches the full-frame Pearson identity, n shrinks with lag") {
    val rows = run("a63_ccf_leadlag").collect().sortBy(_.getInt(0))
    assert(rows.length == 8)
    val ns = rows.map(_.getLong(1))
    ns.zip(ns.tail).foreach { case (a, b) => assert(b == a - 1) }
    rows.foreach { r =>
      if (!r.isNullAt(2)) assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }

  test("t41 template detector: conserves docs, flags only real clusters") {
    val rows = run("t41_template_detect").collect()
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs == graft.Tables.documents(spark, sf("sf0.01")).count())
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 1)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // cross-check one number: total docs in clusters of size >= 3
    val fp = graft.Tables.documents(spark, sf("sf0.01"))
      .select(md5(array_join(slice(
        expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"), 1, 8), " ")).as("fp"))
      .groupBy(col("fp")).count().filter(col("count") >= 3)
      .agg(sum(col("count"))).collect()(0)
    val expected = if (fp.isNullAt(0)) 0L else fp.getLong(0)
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("a64 power analysis: required n grows as baseline rate shrinks toward zero") {
    val rows = run("a64_power_analysis").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(4)) {
        assert(r.getLong(4) > 0)
        // detecting a 10% relative lift needs far more than the pilot n
        // unless the baseline is huge — sanity: n_required >= 100
        assert(r.getLong(4) >= 100, s"${r.getString(0)}: n=${r.getLong(4)}")
      }
    }
    // monotonicity in the formula: lower p1 → larger n_required (check
    // across segments where p1 differs materially)
    val defined = rows.filter(r => !r.isNullAt(4))
      .map(r => (r.getDouble(3), r.getLong(4))).sortBy(_._1)
    defined.sliding(2).foreach {
      case Array((p1a, na), (p1b, nb)) =>
        if (p1b - p1a > 0.02) assert(nb <= na)
      case _ =>
    }
  }
}
