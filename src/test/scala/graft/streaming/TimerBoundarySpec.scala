package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import java.sql.Timestamp

final case class TimerProbeEvent(user: Long, ts: Timestamp)
final case class TimerFire(user: Long, expiryMs: Long, wmAtFireMs: Long)

/** One-shot processor: the first event per key arms an event-time
  * timer at ts + 100 s and records nothing else; the fire emits the
  * expiry and the watermark observed inside handleExpiredTimer.
  */
class TimerProbeProcessor extends StatefulProcessor[Long, TimerProbeEvent, TimerFire] {
  @transient private var armed: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[TimerProbeEvent],
                               tv: TimerValues): Iterator[TimerFire] = {
    rows.foreach { e =>
      if (!armed.exists()) {
        val expiry = e.ts.getTime + 100000L
        armed.update(expiry)
        getHandle.registerTimer(expiry)
      }
    }
    Iterator.empty
  }
  override def handleExpiredTimer(key: Long, tv: TimerValues,
                                  info: ExpiredTimerInfo): Iterator[TimerFire] =
    Iterator(TimerFire(key, info.getExpiryTimeInMs(), tv.getCurrentWatermarkInMs()))
}

/** Pins EVENT-TIME TIMER fire semantics (transformWithState) — the
  * fifth watermark-boundary pin. The family now has both polarities
  * measured, and they are NOT uniform:
  *
  *   inclusive at equality          strict at equality
  *   ─────────────────────          ──────────────────
  *   window eviction end <= wm      join input admission ts > wm
  *   timer fire    expiry <= wm     outer pad flush      ts < wm
  *
  * The split is principled: the INCLUSIVE pair are "this moment can no
  *  longer grow" events (a window ending at wm, a timer due at wm —
  * event times strictly below wm are final, and both window-end and
  * timer-expiry are exclusive upper bounds of the interval they watch),
  * while the STRICT pair guard state that an equality row could still
  * touch. ev15s' SessionProcessor (+1 s timer margin) and any future
  * timer-driven operator depend on the inclusive rule: a timer due
  * exactly at the watermark fires in the first no-data batch, it does
  * not wait one more advance.
  *
  * Rules pinned (0-second delay, RocksDB provider — required by
  * transformWithState):
  *  1. A timer at T does not fire while wm < T.
  *  2. It fires as soon as wm == T (equality fires), and
  *     `tv.getCurrentWatermarkInMs()` inside handleExpiredTimer is the
  *     watermark that triggered the fire.
  *  3. A fire is exactly-once — later advances never replay it.
  */
class TimerBoundarySpec extends SparkSpec {
  private val base = 1700000400000L
  private def ts(sec: Long): Timestamp = new Timestamp(base + sec * 1000L)

  test("event-time timers fire at wm == expiry (inclusive), exactly once") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val src = MemoryStream[TimerProbeEvent]
      val out = src.toDS()
        .withWatermark("ts", "0 seconds")
        .groupByKey(_.user)
        .transformWithState(new TimerProbeProcessor, TimeMode.EventTime(), OutputMode.Append())
      val q = out.writeStream.format("memory").queryName("timer_boundary")
        .outputMode(OutputMode.Append).start()
      def rows(): Set[(Long, Long, Long)] =
        spark.table("timer_boundary").collect().map(r =>
          (r.getLong(0), (r.getLong(1) - base) / 1000, (r.getLong(2) - base) / 1000)).toSet
      try {
        // u1@0 arms its timer at 100 s. wm after the batch: 0 < 100.
        src.addData(TimerProbeEvent(1L, ts(0)))
        q.processAllAvailable()
        assert(rows().isEmpty, s"timer must not fire while wm < expiry: ${rows()}")

        // dummy key advances wm to EXACTLY 100: u1's timer fires, and
        // the watermark it observes is 100 (rule 2).
        src.addData(TimerProbeEvent(99L, ts(100)))
        q.processAllAvailable()
        assert(rows() == Set((1L, 100L, 100L)),
          s"timer at T must fire when wm == T (inclusive): ${rows()}")

        // a further advance must not replay u1's fire (rule 3).
        src.addData(TimerProbeEvent(98L, ts(101)))
        q.processAllAvailable()
        assert(rows() == Set((1L, 100L, 100L)),
          s"timer fires are exactly-once: ${rows()}")

        // sweep to 201: the dummies' own timers (200, 201) both fire —
        // 201 == wm re-confirms equality-fires on a fresh key.
        src.addData(TimerProbeEvent(97L, ts(201)))
        q.processAllAvailable()
        assert(rows() == Set((1L, 100L, 100L), (99L, 200L, 201L), (98L, 201L, 201L)),
          s"due timers fire on the advance that reaches them: ${rows()}")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }
}
