package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the forty-first frontier batch. */
class Frontier41QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("ev64 position attribution: every conversion's credit sums to exactly 10000 bp") {
    // recompute per-conversion credit sums from the raw join
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables.events(spark, sf("sf0.01"))
    val windowUs = 24L * 3600 * 1000000
    val conv = ev.filter(col("event_type") === "purchase").select(
      col("user_id"), col("event_id").as("conv_id"),
      (unix_micros(col("ts")) - windowUs).as("lo_us"),
      unix_micros(col("ts")).as("hi_us"))
    val tch = ev.filter(col("event_type").isin("view", "click", "signup")).select(
      col("user_id"), col("event_id").as("touch_id"), unix_micros(col("ts")).as("p_us"))
    val r = graft.operators.RangeJoin.pointInInterval(tch, conv, Seq("user_id"),
      "p_us", "lo_us", "hi_us", bucketWidth = windowUs)
    val wf = Window.partitionBy(col("conv_id")).orderBy(col("p_us"), col("touch_id"))
    val wn = Window.partitionBy(col("conv_id"))
    val credit = r.withColumn("rf", row_number().over(wf))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("bp",
        when(col("n") === 1, 10000L).when(col("n") === 2, 5000L)
          .when(col("rf") === 1 || col("rf") === col("n"), 4000L)
          .otherwise(expr("2000 div (n - 2)")
            + when(col("rf") === 2, expr("2000 % (n - 2)")).otherwise(0L)))
      .groupBy(col("conv_id")).agg(sum(col("bp")).as("total"))
    val bad = credit.filter(col("total") =!= 10000L).count()
    assert(bad == 0, s"$bad conversions do not conserve 10000 bp")
    // and the registered aggregate's shares sum to 1
    val rows = run("ev64_position_attribution").collect()
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
  }

  test("u36 bloom plan: bits/key ratio lands within 1 bit of 9.585") {
    val rows = run("u36_bloom_plan").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (n, bits, bytes) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bits >= n * 9 && bits <= n * 10 + 1)
      assert(bytes == (bits + 7) / 8)
      assert(r.getInt(4) == 7)
    }
  }

  test("a95 gini stump: gains bounded by parent impurity; ranks are a permutation") {
    val rows = run("a95_gini_stump").collect()
    assert(rows.length == 9)
    assert(rows.map(_.getInt(4)).sorted.toSeq == (1 to 9))
    rows.foreach { r =>
      val gain = r.getDouble(3)
      assert(gain >= -1e-9 && gain <= 0.5 + 1e-9, s"gini gain out of range: $gain")
    }
    val n = graft.Tables.events(spark, sf("sf0.01")).count()
    rows.foreach(r => assert(r.getLong(1) + r.getLong(2) == n))
  }

  test("w14 derivatives: telescoping identity — d1 sums to last-first") {
    val rows = run("w14_discrete_derivatives").collect().sortBy(_.getDate(0).toString)
    assert(rows.length == 30)
    val cents = rows.map(_.getLong(1))
    val d1s = rows.drop(1).map(_.getLong(2))
    assert(d1s.sum == cents.last - cents.head)
    // d2 = diff of d1
    val d2s = rows.drop(2).map(_.getLong(3))
    assert(d2s.toSeq == d1s.zip(d1s.tail).map { case (a, b) => b - a }.toSeq)
  }
}
