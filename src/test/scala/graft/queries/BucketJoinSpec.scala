package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables — the 100 TB fact⋈fact shape.
  *
  * Big joins shuffle on their keys unless the data is already laid out
  * by them. Writing both sides bucketed by the join key into the
  * warehouse (`bucketBy` + `saveAsTable`) lets Spark's bucketed-scan
  * rule prove co-partitioning, so the SortMergeJoin runs with ZERO
  * Exchange — each task reads bucket i of both tables. At 100 TB this
  * converts the nightly fact-to-fact join from a full-corpus shuffle
  * into a local merge per bucket; the one-time bucketed write is
  * amortized across every downstream join on the same key.
  */
class BucketJoinSpec extends SparkSpec {

  test("bucketed fact-to-fact join plans with no shuffle exchange") {
    val s = spark
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_wh").toString
    val d = sf()
    val before = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Tables.orders(s, d).write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").mode("overwrite")
        .saveAsTable("orders_b")
      Tables.lineitem(s, d).write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").mode("overwrite")
        .saveAsTable("lineitem_b")

      // force SMJ (broadcast would also avoid the shuffle, but the
      // point is the co-located merge that survives when BOTH sides
      // are too big to broadcast)
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("orders_b")
        .join(s.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("l_quantity"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      // same result as the plain (shuffling) parquet join
      val expected = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(18,2)")))
        .collect().head.toString
      val got = joined
        .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(18,2)")))
        .collect().head.toString
      assert(got == expected)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    }
  }
}
