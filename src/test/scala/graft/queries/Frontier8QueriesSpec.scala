package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the eighth frontier batch. */
class Frontier8QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a41 ANOVA decomposition: SSB + SSW equals total SS (within rounding)") {
    import org.apache.spark.sql.types.DecimalType
    val r = run("a41_anova_f").head
    val (ssb, ssw) = (r.getDouble(2), r.getDouble(3))
    assert(r.getDouble(4) >= 0.0)
    val v = graft.Tables.events(spark, sf("sf0.01"))
      .select((col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long").as("x"))
    val xs = v.collect().map(_.getLong(0).toDouble)
    val mu = xs.sum / xs.length
    val sst = xs.map(x => (x - mu) * (x - mu)).sum
    assert(math.abs((ssb + ssw) - sst) / sst < 1e-9, s"${ssb + ssw} vs $sst")
  }

  test("u20 salt plan: factor covers the count at the 8-row budget") {
    val rows = run("u20_skew_planner").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, f, needs) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      assert(f * 8 >= n && (f - 1) * 8 < n)
      assert(needs == (n > 8))
    }
  }

  test("ev38 histogram covers every consecutive gap exactly once") {
    val total = run("ev38_dwell_histogram").collect().map(_.getLong(1)).sum
    val ev = graft.Tables.events(spark, sf("sf0.01"))
    val users = ev.groupBy("user_id").count().count()
    assert(total == ev.count() - users) // n-1 gaps per user
  }
}
