package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ShardedRank must equal the single-window global row_number bit for
  * bit, and the registered vocabulary queries (t15/t18/t21) must plan
  * with NO unpartitioned window over the vocabulary — the 100 TB
  * requirement (a web-corpus vocab is 10M+ terms; one task must never
  * see all of it).
  */
class ShardedRankSpec extends SparkSpec {

  import spark.implicits._

  test("withRank equals the global window row_number on skewed data with freq ties") {
    // Zipf-ish: many terms share low freqs (ties broken by term), a few
    // dominate — the worst case for range-boundary tie handling.
    val tf = (1 to 5000).map(i => (f"term_$i%05d", math.max(1L, 10000L / i)))
      .toDF("term", "freq")
    val expected = tf.select(col("term"),
        row_number().over(Window.orderBy(col("freq").desc, col("term"))).as("r"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val got = ShardedRank.withRank(tf, "r", col("freq").desc, col("term"))
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("r")).toMap
    assert(got.size == expected.size)
    expected.foreach { case (t, r) =>
      assert(got(t) == r.toLong, s"term $t: sharded ${got(t)} vs window $r")
    }
  }

  test("withRank survives fewer rows than shards and an empty input") {
    val tiny = Seq(("a", 3L), ("b", 1L)).toDF("term", "freq")
    val r = ShardedRank.withRank(tiny, "r", col("freq").desc, col("term"))
      .collect().map(x => x.getAs[String]("term") -> x.getAs[Long]("r")).toMap
    assert(r == Map("a" -> 1L, "b" -> 2L))
    val empty = Seq.empty[(String, Long)].toDF("term", "freq")
    assert(ShardedRank.withRank(empty, "r", col("freq").desc, col("term")).count() == 0)
  }

  test("t15/t18/t21 plan with no unpartitioned window over the vocabulary") {
    Seq("t15_vocab_build", "t18_tokenize_ids", "t21_zipf_fit").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf()).queryExecution.executedPlan.toString
      val windows = plan.linesIterator.filter(_.contains("Window ")).toSeq
      assert(windows.nonEmpty, s"$q: expected the sharded-rank windows in\n$plan")
      windows.foreach { w =>
        // Every window must involve the bounded __shard key: the local
        // rank partitions BY it; the offsets window orders OVER the
        // per-shard count table (≤ shuffle-partitions rows). A global
        // vocab window would order by freq/term with no __shard.
        assert(w.contains("__shard"), s"$q: unpartitioned vocab window: $w")
      }
    }
  }

  test("t15 sharded output equals the reference single-window ranking") {
    val out = SparkEntry.queries("t15_vocab_build")(spark, sf())
    val tf = graft.Tables.documents(spark, sf())
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val ref = tf.select(col("term"),
      row_number().over(Window.orderBy(col("freq").desc, col("term")))
        .cast("int").as("token_id"), col("freq"))
    assert(out.exceptAll(ref).count() == 0 && ref.exceptAll(out).count() == 0)
  }
}
