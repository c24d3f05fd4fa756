package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

final case class FmgwsEvent(user: Long, ts: Timestamp)
final case class FmgwsOut(user: Long, what: String)

/** Pins flatMapGroupsWithState EVENT-TIME TIMEOUT polarity — the sixth
  * watermark-boundary pin, and the counterpart to TimerBoundarySpec:
  * the two state APIs the engine's two sessionizers use do NOT agree
  * at equality.
  *
  *   fMGWS setTimeoutTimestamp(T):  times out at wm >  T  (STRICT)
  *   tWS   registerTimer(T):        fires     at wm >= T  (INCLUSIVE)
  *
  * So `sessionizeWithTimers` closes an idle session one watermark tick
  * earlier than `sessionize` for the same nominal expiry. The two stay
  * output-equivalent anyway, and the argument is worth recording
  * because it is what the +1 s margin actually buys:
  * both arm T = last + gap + 1 s; at the earliest closing tick
  * (wm == T, timer path) an event that could still EXTEND the session
  * must satisfy floorSec(ts) - floorSec(last) <= gap, i.e.
  * ts < last + (gap+1) s = T = wm — and any input with ts < wm is
  * late-dropped before the operator sees it, while ts == wm floors to
  * gap+1 and opens a NEW session instead. Early-close is therefore
  * unobservable; without the margin (T = last + gap) it would not be.
  *
  * Rules pinned (0-second delay):
  *  1. No timeout while wm < T, and NONE at wm == T (strict — the
  *     asymmetry with tWS timers).
  *  2. Timeout fires on the first batch with wm > T.
  *  3. hasTimedOut and new-input handling are mutually exclusive per
  *     invocation (the timeout path sees no rows).
  */
class FmgwsTimeoutBoundarySpec extends SparkSpec {
  private val base = 1700000400000L
  private def ts(sec: Long): Timestamp = new Timestamp(base + sec * 1000L)

  test("EventTimeTimeout is strict: wm == timeout holds, wm > timeout fires") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[FmgwsEvent]
    val out = src.toDS()
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.user)
      .flatMapGroupsWithState[Long, FmgwsOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[FmgwsEvent], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val sawRows = rows.nonEmpty // rule 3: timeout path sees no input
            state.remove()
            Iterator(FmgwsOut(user, if (sawRows) "timeout_with_rows" else "timeout"))
          } else {
            rows.foreach { e =>
              if (!state.exists) {
                state.update(1L)
                state.setTimeoutTimestamp(e.ts.getTime + 100000L) // T = ts + 100 s
              }
            }
            Iterator.empty
          }
      }
    val q = out.writeStream.format("memory").queryName("fmgws_boundary")
      .outputMode(OutputMode.Append).start()
    def rows(): Set[(Long, String)] =
      spark.table("fmgws_boundary").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    try {
      // u1@0 arms its timeout at T = 100 s. wm after the batch: 0.
      src.addData(FmgwsEvent(1L, ts(0)))
      q.processAllAvailable()
      assert(rows().isEmpty, s"no timeout while wm < T: ${rows()}")

      // advance wm to EXACTLY 100: STRICT — still no timeout. This is
      // where transformWithState's registerTimer(100s) already fires.
      src.addData(FmgwsEvent(99L, ts(100)))
      q.processAllAvailable()
      assert(rows().isEmpty,
        s"EventTimeTimeout must NOT fire at wm == T (strict): ${rows()}")

      // wm -> 101 > 100: u1 times out, and its invocation saw no rows.
      src.addData(FmgwsEvent(98L, ts(101)))
      q.processAllAvailable()
      assert(rows() == Set((1L, "timeout")),
        s"timeout fires on the first advance strictly past T: ${rows()}")

      // sweep: 99's T=200 and 98's T=201 both fire at wm 300.
      src.addData(FmgwsEvent(97L, ts(300)))
      q.processAllAvailable()
      assert(rows() == Set((1L, "timeout"), (99L, "timeout"), (98L, "timeout")),
        s"exactly one timeout per key: ${rows()}")
    } finally q.stop()
  }
}
