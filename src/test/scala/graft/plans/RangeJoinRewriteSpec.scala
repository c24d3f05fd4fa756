package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The band-join → bucketed equi-join optimizer rule: semantics must
  * be EXACTLY the naive nested-loop join's, and the plan must switch
  * from BroadcastNestedLoopJoin to a shuffled equi join when asked.
  */
class RangeJoinRewriteSpec extends SparkSpec {

  private def clicksAndWindows = {
    val ev = Tables.events(spark, sf())
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts"))
    val wins = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"),
        (col("ts") - expr("INTERVAL 5 MINUTES")).as("lo"),
        (col("ts") + expr("INTERVAL 5 MINUTES")).as("hi"))
    (clicks, wins)
  }

  test("merge-hinted band join rewrites to an equi join with identical rows") {
    val (clicks, wins) = clicksAndWindows
    val band = col("ts") >= col("lo") && col("ts") <= col("hi")
    val naive = clicks.join(wins, band)
      .select(col("click_id"), col("err_id")).collect().map(_.toString).sorted
    val rewritten = clicks.join(wins.hint("merge"), band)
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffled equi join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = rewritten.select(col("click_id"), col("err_id"))
      .collect().map(_.toString).sorted
    assert(got.length > 0 && got.sameElements(naive),
      s"rows differ: naive=${naive.length} rewritten=${got.length}")
  }

  test("un-hinted broadcast-size band join keeps its nested-loop plan") {
    val (clicks, wins) = clicksAndWindows
    val plan = clicks.join(wins, col("ts") >= col("lo") && col("ts") <= col("hi"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("long-typed bands, null and inverted intervals match the naive join") {
    import spark.implicits._
    val pts = Seq(1L -> 5L, 2L -> 55L, 3L -> 120L).toDF("pid", "v")
    val ivs = Seq(
      (10L, Some(0L), Some(10L)),     // covers 5
      (11L, Some(50L), Some(60L)),    // covers 55
      (12L, Some(60L), Some(50L)),    // inverted — matches nothing
      (13L, None, Some(100L)),        // null lo — matches nothing
      (14L, Some(100L), None)         // null hi — matches nothing
    ).toDF("iid", "lo", "hi")
    val band = col("v") >= col("lo") && col("v") <= col("hi")
    val naive = pts.join(ivs, band).select("pid", "iid")
      .collect().map(_.toString).sorted
    val rewritten = pts.join(ivs.hint("merge"), band)
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = rewritten.select("pid", "iid").collect().map(_.toString).sorted
    assert(got.sameElements(naive), s"naive=${naive.mkString(",")} got=${got.mkString(",")}")
  }

  test("bucket-grid boundaries and strict bands match the naive join, either sign") {
    import spark.implicits._
    // width 10 puts every interesting value ON or AROUND a bucket
    // line; negative values exercise trunc-division's double-width
    // bucket at zero (monotone, so membership still holds — the
    // residual filter removes the extra candidates)
    val wKey = "spark.graft.rangeJoin.bucketWidthUs"
    val prev = spark.conf.getOption(wKey)
    spark.conf.set(wKey, "10")
    try {
      val pts = Seq(-20L, -10L, -1L, 0L, 1L, 9L, 10L, 11L, 20L)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "v")
      val ivs = Seq(
        (100L, 0L, 10L),    // both endpoints exactly on grid lines
        (101L, 10L, 20L),   // adjacent grid-aligned interval
        (102L, -10L, 0L),   // negative, grid-aligned
        (103L, -15L, -5L),  // negative, straddles a grid line
        (104L, 1L, 9L)      // strictly inside one bucket
      ).toDF("iid", "lo", "hi")
      for ((name, band) <- Seq(
        "inclusive" -> (col("v") >= col("lo") && col("v") <= col("hi")),
        "strict"    -> (col("v") >  col("lo") && col("v") <  col("hi")),
        "half-open" -> (col("v") >= col("lo") && col("v") <  col("hi")))) {
        val naive = pts.join(ivs, band).select("pid", "iid")
          .collect().map(_.toString).sorted
        val rewritten = pts.join(ivs.hint("merge"), band)
        val plan = rewritten.queryExecution.executedPlan.toString
        assert(plan.contains("__graft_pb"), s"$name band must rewrite:\n$plan")
        val got = rewritten.select("pid", "iid").collect().map(_.toString).sorted
        assert(got.sameElements(naive),
          s"$name band diverges at grid boundaries: naive=${naive.mkString(",")} got=${got.mkString(",")}")
      }
    } finally prev match {
      case Some(v) => spark.conf.set(wKey, v)
      case None => spark.conf.unset(wKey)
    }
  }

  test("spark.graft.rangeJoin.enabled=false disables the rewrite") {
    import spark.implicits._
    val key = "spark.graft.rangeJoin.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try {
      val pts = Seq(1L -> 5L).toDF("pid", "v")
      val ivs = Seq((10L, 0L, 10L)).toDF("iid", "lo", "hi")
      val plan = pts.join(ivs.hint("merge"),
          col("v") >= col("lo") && col("v") <= col("hi"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_pb"), s"kill switch must stop the rewrite:\n$plan")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("joins with an equi conjunct are left alone") {
    import spark.implicits._
    val pts = Seq((1L, "a", 5L)).toDF("pid", "k", "v")
    val ivs = Seq(("a", 0L, 10L)).toDF("k2", "lo", "hi")
    val plan = pts.join(ivs.hint("merge"),
        col("k") === col("k2") && col("v") >= col("lo") && col("v") <= col("hi"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_pb"), s"equi band join must not be rewritten:\n$plan")
  }
}
