package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the sixtieth frontier batch. */
class Frontier60QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("v32 dim pruning: 64 dims, rank permutation, exactly 16 kept") {
    val rows = run("v32_dim_pruning").collect()
    assert(rows.length == 64)
    assert(rows.map(_.getInt(0)).sorted.toSeq == (0 until 64))
    assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to 64))
    assert(rows.count(_.getInt(4) == 1) == 16)
    // keep flag agrees with the rank
    rows.foreach(r => assert((r.getInt(4) == 1) == (r.getInt(3) <= 16)))
    // ranks are variance-descending
    val byRank = rows.sortBy(_.getInt(3)).map(_.getLong(2))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("j14 cascade: every CRM record resolves; tiers split by key parity") {
    val rows = run("j14_match_cascade").collect()
    val n = graft.Tables.customer(spark, sf("sf0.01")).count()
    assert(rows.length == n, "every CRM record finds a match")
    rows.foreach { r =>
      val (bId, aId, method) = (r.getLong(0), r.getLong(1), r.getString(2))
      val origKey = bId - 1000000L
      if (origKey % 2 == 0) {
        assert(method == "exact" && aId == origKey && r.getInt(3) == 0)
      } else {
        assert(method == "fuzzy" && r.getInt(3) == 1)
        // '#'→'-' mutation is distance 1 only from the true entity
        assert(aId == origKey, s"fuzzy match resolved $bId to $aId")
      }
    }
  }

  test("q23 correlated scalar: decorrelated plan; counts match a window twin") {
    val df = run("q23_correlated_scalar")
    val rows = df.collect()
    assert(rows.length == 25)
    // decorrelation: the optimized plan contains no correlated subquery
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("scalar-subquery"), opt)
    // window-based reference
    import org.apache.spark.sql.expressions.Window
    val c = graft.Tables.customer(spark, sf("sf0.01"))
      .select(col("c_nationkey"), floor(col("c_acctbal") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("c_nationkey"))
    val ref = c.withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("cents")).over(w))
      .filter(col("cents") * col("n") > col("s"))
      .groupBy(col("c_nationkey")).count().collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    rows.foreach(r => assert(ref(r.getAs[Number](0).longValue) == r.getLong(1)))
  }
}
