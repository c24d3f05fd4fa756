package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The native as-of exec must agree row-for-row with the composed
  * union+window operator, survive nulls and unmatched keys, and plan
  * as the custom exec with one shuffle per side.
  */
class NativeAsofSpec extends SparkSpec {

  private def inputs = {
    val ord = Tables.orders(spark, sf())
      .groupBy(col("o_custkey"), col("o_orderdate").cast("timestamp").as("ot"))
      .agg(max(col("o_orderkey")).as("last_orderkey"))
    val ev = Tables.events(spark, sf()).select(col("event_id"), col("user_id"), col("ts"))
    (ev, ord)
  }

  test("native as-of equals the composed union+window operator on real data") {
    val (ev, ord) = inputs
    val native = ev.join(ord, expr("graft_asof(user_id, o_custkey, ts, ot)"), "left")
      .select(col("event_id"), col("user_id"), col("last_orderkey"))
      .collect().map(_.toString).sorted
    val composed = graft.operators.AsofJoin.asofLeft(ev, ord,
        leftKey = "user_id", leftTime = "ts",
        rightKey = "o_custkey", rightTime = "ot",
        payload = Seq("last_orderkey"))
      .select(col("event_id"), col("user_id"), col("last_orderkey"))
      .collect().map(_.toString).sorted
    assert(native.length === composed.length)
    assert(native.sameElements(composed))
  }

  test("plans as AsofJoinExec with one exchange per side") {
    val (ev, ord) = inputs
    val p = ev.join(ord, expr("graft_asof(user_id, o_custkey, ts, ot)"), "left")
      .queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("SortMergeJoin"), p)
  }

  test("nulls, unmatched keys, exact-time ties") {
    import spark.implicits._
    val l = Seq(
      (1L, java.lang.Long.valueOf(10L), java.lang.Long.valueOf(100L)),
      (2L, java.lang.Long.valueOf(10L), java.lang.Long.valueOf(50L)),  // before any right row
      (3L, java.lang.Long.valueOf(20L), java.lang.Long.valueOf(100L)), // key with no right rows
      (4L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(100L)), // null key
      (5L, java.lang.Long.valueOf(10L), null.asInstanceOf[java.lang.Long]),  // null time
      (6L, java.lang.Long.valueOf(10L), java.lang.Long.valueOf(80L))   // exact tie with right t=80
    ).toDF("id", "k", "t")
    val r = Seq(
      (10L, 60L, "a"),
      (10L, 80L, "b"),
      (10L, 90L, "c"),
      (30L, 10L, "z")
    ).toDF("rk", "rt", "v")
    val got = l.join(r, expr("graft_asof(k, rk, t, rt)"), "left")
      .select(col("id"), col("v")).collect()
      .map(row => row.getLong(0) -> Option(row.getString(1))).toMap
    assert(got == Map(
      1L -> Some("c"), // latest <= 100
      2L -> None,      // nothing <= 50
      3L -> None,      // no right rows for key 20
      4L -> None,      // null key
      5L -> None,      // null time
      6L -> Some("b")  // tie at t=80 matches
    ), got.toString)
  }

  test("duplicate right (key, time) rows never multiply left rows") {
    import spark.implicits._
    // As-of is a LOOKUP, not a relational join: even when the right side
    // violates the documented unique-(key,time) contract, each left row
    // must produce exactly ONE output row, carrying one of the duplicate
    // payloads (which one is unspecified — the contract callers rely on
    // is the row-count invariant).
    val l = Seq((1L, 10L, 100L), (2L, 10L, 70L), (3L, 10L, 85L)).toDF("id", "k", "t")
    val r = Seq((10L, 80L, "a"), (10L, 80L, "b"), (10L, 80L, "c"), (10L, 60L, "z"))
      .toDF("rk", "rt", "v")
    val out = l.join(r, expr("graft_asof(k, rk, t, rt)"), "left")
      .select(col("id"), col("v")).collect()
    assert(out.length === 3, "one output row per left row, always")
    val byId = out.map(row => row.getLong(0) -> Option(row.getString(1))).toMap
    assert(Set("a", "b", "c").contains(byId(1L).get)) // latest <= 100 is one of the t=80 dups
    assert(byId(2L) === Some("z"))                    // only t=60 is <= 70
    assert(Set("a", "b", "c").contains(byId(3L).get)) // tie boundary: 80 <= 85
  }

  test("empty right side null-pads every left row; all-null right times ditto") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (2L, 20L, 50L)).toDF("id", "k", "t")
    val empty = Seq.empty[(Long, Long, String)].toDF("rk", "rt", "v")
    val out1 = l.join(empty, expr("graft_asof(k, rk, t, rt)"), "left")
      .select(col("id"), col("v")).collect()
    assert(out1.length === 2 && out1.forall(_.isNullAt(1)))
    val nullTimes = Seq((java.lang.Long.valueOf(10L), null.asInstanceOf[java.lang.Long], "x"))
      .toDF("rk", "rt", "v")
    val out2 = l.join(nullTimes, expr("graft_asof(k, rk, t, rt)"), "left")
      .select(col("id"), col("v")).collect()
    assert(out2.length === 2 && out2.forall(_.isNullAt(1)),
      "null right times are unmatched state, not wildcard matches")
  }

  test("string keys merge correctly across partitions") {
    import spark.implicits._
    val l = (1 to 200).map(i => (s"k${i % 7}", i.toLong, i)).toDF("k", "t", "id")
    val r = (0 to 100).map(i => (s"k${i % 7}", (i * 2).toLong, s"p$i")).toDF("rk", "rt", "v")
    val native = l.join(r, expr("graft_asof(k, rk, t, rt)"), "left")
      .select(col("id"), col("v")).collect().map(_.toString).sorted
    // brute-force reference: greatest rt <= t per key (unique (rk, rt) here)
    val bestPerRow = l.as("l").join(r.as("r"),
        col("l.k") === col("r.rk") && col("r.rt") <= col("l.t"), "left")
      .groupBy(col("l.id")).agg(max(struct(col("r.rt"), col("r.v"))).as("m"))
      .select(col("id"), col("m.v").as("v")).collect().map(_.toString).sorted
    assert(native.sameElements(bestPerRow))
  }
}
