package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Pins watermark semantics at the EXACT boundary — the companion to
  * SessionBoundarySpec's gap rule, for the staged `ev*s` queries whose
  * oracles assume every window below the final flush is emitted
  * exactly once.
  *
  * Two rules under test (append mode, tumbling 10-minute windows,
  * zero watermark delay so the arithmetic is exact):
  *
  *  1. EMISSION: a window is finalized and emitted in the first batch
  *     whose STARTING watermark is >= the window end (Spark's eviction
  *     predicate is `window.end <= watermark` — end EQUAL to the
  *     watermark already evicts; the window does not linger until the
  *     watermark strictly passes it).
  *  2. LATE DROP: once a window is evicted, a late row falling into it
  *     is dropped — it neither resurrects the window nor double-emits
  *     it. This is the contract that makes the staged upsert queries'
  *     keep-latest merges deterministic: an emitted (user, window) key
  *     can never be emitted again.
  *
  * The watermark advances BETWEEN batches (batch N runs with the
  * watermark computed from batch N-1's max event time) — but with
  * `spark.sql.streaming.noDataMicroBatches.enabled` (default true)
  * the engine immediately runs one extra EMPTY batch whenever the
  * advance could change results, so `processAllAvailable()` after one
  * addData already reflects that batch's watermark: no trailing
  * trigger event is needed (empirically confirmed here — an earlier
  * draft of this spec assumed a trailing batch was required and the
  * no-data batch emitted the window first).
  */
class WatermarkBoundarySpec extends SparkSpec {

  // anchor ALIGNED to a 10-minute window boundary (1700000400 % 600 == 0)
  // so ts(0)/ts(600) are exact window starts
  private val base = 1700000400000L
  private def ts(sec: Long): Timestamp = new Timestamp(base + sec * 1000L)

  private def windowed(df: org.apache.spark.sql.DataFrame) =
    df.withWatermark("ts", "0 seconds")
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("start"), col("n"))

  test("window with end EXACTLY equal to the watermark is emitted (end <= wm evicts)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long)]
    val q = windowed(mem.toDF().toDF("ts", "v"))
      .writeStream.format("memory").queryName("wmb_exact")
      .outputMode(OutputMode.Append).start()
    try {
      // window A = [0, 600). Event at 300s. Watermark after batch: 300s
      // < A.end, so nothing can be final yet.
      mem.addData((ts(300), 1L)); q.processAllAvailable()
      assert(spark.table("wmb_exact").isEmpty,
        "nothing may emit while the watermark trails the window end")
      // Event at EXACTLY 600s. Watermark advances to 600s == A.end and
      // the no-data batch runs. NO further input: whether A appears now
      // pins the eviction comparator.
      mem.addData((ts(600), 1L)); q.processAllAvailable()
      val emitted = spark.table("wmb_exact").select("start")
        .collect().map(_.getTimestamp(0)).toSet
      assert(emitted == Set(ts(0)),
        s"window [0,600) with end == watermark must be emitted (end <= wm evicts) " +
          s"and [600,1200) must stay open; got $emitted")
    } finally q.stop()
  }

  test("late row into an evicted window is dropped, never re-emitted") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long)]
    val q = windowed(mem.toDF().toDF("ts", "v"))
      .writeStream.format("memory").queryName("wmb_late")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((ts(300), 1L)); q.processAllAvailable()   // A=[0,600), n=1
      mem.addData((ts(600), 1L)); q.processAllAvailable()   // wm -> 600
      mem.addData((ts(1200), 1L)); q.processAllAvailable()  // A emitted here
      val afterEmit = spark.table("wmb_late")
        .filter(col("start") === lit(ts(0))).collect()
      assert(afterEmit.map(_.getLong(1)).toSeq == Seq(1L))
      // LATE: a row at 299s targets evicted window A. One more trigger
      // batch drains any effect it could have.
      mem.addData((ts(299), 1L)); q.processAllAvailable()
      mem.addData((ts(2000), 1L)); q.processAllAvailable()
      val rows = spark.table("wmb_late")
        .filter(col("start") === lit(ts(0))).collect()
      assert(rows.map(_.getLong(1)).toSeq == Seq(1L),
        s"evicted window must not re-emit or change count; got ${rows.toSeq}")
      val dropped = q.recentProgress.map(_.stateOperators.map(_.numRowsDroppedByWatermark).sum).sum
      assert(dropped >= 1L, "the late row must be counted as dropped by the watermark")
    } finally q.stop()
  }

  test("session window with end EXACTLY equal to the watermark is emitted") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, Long)]
    val q = mem.toDF().toDF("ts", "uid")
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("uid"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("start"), col("uid"), col("n"))
      .writeStream.format("memory").queryName("wmb_session")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1 at t=0 opens session [0, 600); nothing can close it yet
      mem.addData((ts(0), 1L)); q.processAllAvailable()
      assert(spark.table("wmb_session").isEmpty)
      // user 2 at EXACTLY t=600 drives the watermark to 600 == user 1's
      // session end — the tumbling-window eviction rule (end <= wm)
      // must hold for the session-window operator too
      mem.addData((ts(600), 2L)); q.processAllAvailable()
      val got = spark.table("wmb_session").select("start", "uid", "n")
        .as[(Timestamp, Long, Long)].collect().toSet
      assert(got == Set((ts(0), 1L, 1L)),
        s"session [0,600) with end == watermark must emit, user 2's stays open; got $got")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: dup inside the horizon dropped, key beyond it re-emits") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String)]
    val q = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "600 seconds")
      .dropDuplicatesWithinWatermark("k")
      .select("k")
      .writeStream.format("memory").queryName("wmb_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      // two A's 10s apart — well inside the 600s horizon: one emission
      mem.addData((ts(0), "A"), (ts(10), "A")); q.processAllAvailable()
      // B at t=1800 drives the watermark to 1200; A's dedup state
      // (expires at 0 + 600 <= 1200) is evicted
      mem.addData((ts(1800), "B")); q.processAllAvailable()
      // A recurs far beyond the horizon: the state-evicting variant
      // MUST re-emit it — the documented at-least-once contract that
      // distinguishes it from unbounded dropDuplicates (ev5s)
      mem.addData((ts(1790), "A")); q.processAllAvailable()
      val got = spark.table("wmb_dedup").as[String].collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == Map("A" -> 2, "B" -> 1),
        s"expected A twice (horizon-evicted) and B once; got $got")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark EXACT ticks: eviction INCLUSIVE (expiry <= wm), admission STRICT (ts > wm)") {
    // The seventh row of the polarity table, measured at exact
    // equality: with delay 600, key A at t=0 has dedup-state expiry
    // 600; driving the watermark to EXACTLY 600 evicts it (a recurrence
    // at t=700 re-emits), so eviction is INCLUSIVE — the same side as
    // windowed-agg eviction and tWS timers. A FRESH key arriving at
    // ts == wm exactly is late-DROPPED before the operator sees it, so
    // admission is STRICT — the same side as stream-stream join
    // admission. The two rules are again one policy seen from both
    // sides: state with expiry <= wm is safe to evict precisely
    // because any duplicate that should have matched it
    // (ts <= first + delay = expiry <= wm) is late-dropped first.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String)]
    val q = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "600 seconds")
      .dropDuplicatesWithinWatermark("k")
      .select("k")
      .writeStream.format("memory").queryName("wmb_dedup_tick")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData((ts(0), "A")); q.processAllAvailable()    // state expiry = 600
      mem.addData((ts(1200), "D")); q.processAllAvailable() // wm -> 1200 - 600 = 600 exactly
      // E at ts == wm (fresh key): admission probe
      // A at ts = 700 > wm: eviction probe (expiry 600 == wm)
      mem.addData((ts(600), "E"), (ts(700), "A")); q.processAllAvailable()
      val got = spark.table("wmb_dedup_tick").as[String].collect().toSeq
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == Map("A" -> 2, "D" -> 1),
        s"expected A re-emitted (inclusive eviction) and E late-dropped (strict admission); got $got")
    } finally q.stop()
  }
}
