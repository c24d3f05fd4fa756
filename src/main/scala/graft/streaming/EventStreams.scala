package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface (SURVEY §2.10): the reference's only
  * streaming semantic is the monthly IRS refresh (new filings appear in
  * the S3 index; `README.md:84-86`), realized here as an incremental
  * file-source job; the windowed/sessionized operators are the
  * analytics-layer extension over the `events` stream.
  *
  * All transforms are identical Column algebra to their batch twins
  * (`ev1_hourly_rollup` in RelationalQueries) — same code runs batch
  * and streaming, which is the point of declaring plans in DataFrame
  * algebra.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double, props: String)
  final case class Session(user_id: Long, n_events: Long, start: java.sql.Timestamp,
                           end: java.sql.Timestamp, total_value: Double)

  /** Tumbling-window rollup with watermark — late events beyond 1 hour
    * are dropped, state is bounded (required at 100 TB/day rates).
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("w.start").as("hour_bucket"), col("event_type"), col("n"), col("total_value"))

  /** Hopping(sliding)-window rollup — each event lands in
    * duration/slide overlapping windows (window() is the built-in
    * generator for exactly this). Same watermark/state posture as the
    * tumbling hourlyRollup; state scales with the number of OPEN
    * windows × event types, bounded by the watermark.
    */
  def hoppingRollup(events: DataFrame, duration: String = "1 hour",
                    slide: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), duration, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("event_type"), col("n"), col("total_value"))

  /** OHLC candle downsample as a STREAMING aggregation — the streaming
    * twin of the batch ev23 resample: per (event_type, 6-hour window)
    * open/high/low/close/volume, where open/close are `min_by`/`max_by`
    * on the TOTAL order (ts, event_id) so ties never make the candle
    * nondeterministic. Ordered-selection aggregates carry one
    * (value, key) pair per open window as state — the same bounded
    * footprint as a sum, closed by the watermark like any windowed agg.
    */
  def ohlcBars(events: DataFrame, duration: String = "6 hours"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("volume"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))

  /** Stream-stream interval join — the streaming twin of the batch
    * `ev4_range_join` (operators.RangeJoin): clicks that fall inside a
    * per-user window opened by each error event. Spark's stream-stream
    * join needs BOTH watermarks plus the time-range condition so it can
    * prove when buffered state expires: an error row is held at most
    * `windowMinutes` + the watermark delay, then evicted — bounded
    * state at any rate. The same plan runs on batch frames (watermark
    * is a no-op there), which is how the spec twins it.
    *
    * `joinType = "left_outer"` adds the emit-on-expiry semantic: a
    * click whose join state expires unmatched is released with a NULL
    * err_id — which is why outer stream-stream joins REQUIRE the
    * watermark (the engine must prove no future match can arrive
    * before it may emit the NULL row). Inner emits matches eagerly;
    * outer emission is watermark-driven by construction.
    */
  def errorWindowJoin(clicks: DataFrame, errors: DataFrame,
                      windowMinutes: Int, watermark: String = "10 minutes",
                      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
    val e = errors.withWatermark("ts", watermark)
      .select(col("user_id").as("err_user"), col("event_id").as("err_id"),
        col("ts").as("err_ts"))
    val joined = c.join(e,
        col("user_id") === col("err_user") &&
          col("ts") >= col("err_ts") &&
          col("ts") < col("err_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
        joinType)
    // left_semi exposes only the left side's columns: each click emits
    // AT MOST ONCE, the first time any in-window error lands (state
    // marks it emitted; watermark expiry silently drops never-matched
    // clicks — no NULL row, unlike the outer modes)
    if (joinType == "left_semi")
      joined.select(col("user_id"), col("click_id"), col("ts"))
    else joined
      // full_outer also emits right-side-unmatched rows, whose LEFT
      // user_id is NULL — surface the key from whichever side is
      // present (inner/left plans are unchanged: their left key is
      // always populated)
      .select((if (joinType == "full_outer") coalesce(col("user_id"), col("err_user"))
               else col("user_id")).as("user_id"),
        col("click_id"), col("err_id"))
  }

  /** Stream-static enrichment join — the OTHER streaming join flavor
    * (errorWindowJoin is stream-stream): each micro-batch hash-joins
    * the event stream against a static dimension, broadcast when
    * small. No watermark and NO streaming state at all — the static
    * side is re-planned per micro-batch — which is why dimension
    * enrichment should always be stream-to-static, never a
    * stream-stream join that buffers the dimension as keyed state.
    * Refresh caveat (DimSnapshotSpec): the static side's FILE LISTING
    * snapshots at query start — appended dim files are invisible and
    * an in-place overwrite fails the stream; refresh = restart onto
    * the checkpoint (or a time-versioned dim via streamAsofEnrich).
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
                    streamKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(streamKey) === col(dimKey))

  /** CHAINED stateful aggregations in one streaming query: a 5-minute
    * tumbling pre-aggregate feeding an hourly rollup of those buckets
    * (`window(window_col, ...)` — multiple-stateful-operator support).
    * This is the streaming shape of every rollup cube: the fine-grain
    * agg bounds the coarse one's input to #buckets rows instead of raw
    * events, and BOTH levels' state is evicted by the single upstream
    * watermark as it propagates through the pipeline. The inner window
    * duration divides the outer, so outer assignment (from the inner
    * window's span) equals start-based bucketing — what the batch
    * oracle computes with integer-µs arithmetic.
    */
  def chainedRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "5 minutes").as("w5"), col("event_type"))
      .agg(count(lit(1)).as("n5"),
        sum(col("value").cast(DecimalType(18, 2))).as("v5"))
      .groupBy(window(col("w5"), "1 hour").as("w"), col("event_type"))
      .agg(sum(col("n5")).as("n"), count(lit(1)).as("n_buckets"),
        max(col("n5")).as("max_bucket_n"),
        sum(col("v5")).cast("double").as("total_value"))
      .select(col("w.start").as("hour_bucket"), col("event_type"),
        col("n"), col("n_buckets"), col("max_bucket_n"), col("total_value"))

  /** Open-session aggregate — the ONLY per-key state the streaming
    * sessionizer keeps. O(1) per user regardless of session length;
    * a hot key costs the same as a cold one (the 100 TB requirement —
    * holding raw events in state would be unbounded). Timestamps are
    * kept whole (µs precision survives); the value sum accumulates in
    * exact cents so the emitted total matches the batch twin's
    * DECIMAL(18,2) arithmetic bit-for-bit.
    */
  final case class OpenSession(n: Long, start: java.sql.Timestamp,
                               last: java.sql.Timestamp, sumCents: Long)

  /** Gap-based sessionization with typed state
    * (`flatMapGroupsWithState`): a session closes after `gapMinutes`
    * of inactivity per user. Event-time timeout + aggregate-only state
    * keep memory bounded. The gap compares floor-second epochs —
    * identical to the batch twin's `unix_timestamp` rule, so stream
    * and batch segment identically.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapSec = gapMinutes * 60L

    def cents(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP).movePointRight(2).longValueExact()
    def emit(userId: Long, s: OpenSession): Session =
      Session(userId, s.n, s.start, s.last,
        java.math.BigDecimal.valueOf(s.sumCents, 2).doubleValue)
    def epochSec(t: java.sql.Timestamp): Long = t.toInstant.getEpochSecond

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, incoming: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(emit(userId, s))
          } else {
            // within one micro-batch the group's events fit an iterator
            // sort; across batches only the aggregate survives
            val sorted = incoming.toArray.sortBy(e => (e.ts.getTime, e.ts.getNanos))
            var open = state.getOption.orNull
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              open = open match {
                case null => OpenSession(1L, e.ts, e.ts, cents(e.value))
                case s if epochSec(e.ts) - epochSec(s.last) <= gapSec =>
                  OpenSession(s.n + 1, s.start, e.ts, s.sumCents + cents(e.value))
                case s =>
                  closed += emit(userId, s)
                  OpenSession(1L, e.ts, e.ts, cents(e.value))
              }
            }
            if (open != null) {
              state.update(open)
              // +1s margin: the gap rule floors to seconds, the timeout
              // clock doesn't — never time out a continuable session.
              // NB the margin is also what keeps this sessionizer
              // output-equivalent to sessionizeWithTimers despite the
              // APIs' polarity split (timeout fires at wm > T, timers
              // at wm >= T — FmgwsTimeoutBoundarySpec).
              state.setTimeoutTimestamp(open.last.getTime + gapSec * 1000L + 1000L)
            }
            closed.result().iterator
          }
      }
  }

  final case class RunningCount(user_id: Long, event_id: Long, running_n: Long)

  /** Per-user running event counter on the transformWithState API
    * (Spark 4's arbitrary-state v2: typed state handles, timers, TTL —
    * the successor to flatMapGroupsWithState, RocksDB-backed). State is
    * ONE long per user (the O(1)-per-key discipline of [[sessionize]]);
    * per micro-batch the group's rows are sorted by event time so the
    * emitted running_n equals the batch row_number regardless of
    * arrival interleaving within the batch.
    */
  class RunningCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, RunningCount] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[RunningCount] = {
      var c = if (count.exists()) count.get() else 0L
      val out = rows.toArray
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
        .map { e => c += 1; RunningCount(key, e.event_id, c) }
      count.update(c)
      out.iterator
    }
  }

  def runningCounts(events: Dataset[Event]): Dataset[RunningCount] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new RunningCountProcessor, TimeMode.None(), OM.Append())
  }

  final case class BollFlag(user_id: Long, event_id: Long, breakout: Boolean)
  /** Per-user trailing frame for the streaming Bollinger monitor:
    * event count + the last ≤7 values in 1e-4-dollar units (oldest
    * first) — O(1) state per key, the same discipline as sessions.
    */
  final case class BollState(n: Long, win: Array[Long])

  /** Streaming Bollinger-band breakout detection on transformWithState:
    * the stateful twin of the batch w10 operator. For each event with a
    * full trailing frame (8th-onward per user) the alert test is the
    * sqrt-free integer identity 2·(8x−S)² > 64·Q − 8·S² over the
    * frame's exact integer units — so the STREAMING alert set is
    * bit-identical to the batch window formulation, which is the
    * oracle. Values quantize exactly like Spark's
    * cast(value AS DECIMAL(18,4))·10⁴ (HALF_UP at scale 4).
    */
  class BollingerProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, BollFlag] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[BollState] = _
    private def units(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(4, java.math.RoundingMode.HALF_UP).movePointRight(4).longValueExact()
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[BollState]("boll",
        org.apache.spark.sql.Encoders.product[BollState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[BollFlag] = {
      var s = if (st.exists()) st.get() else BollState(0L, Array.empty[Long])
      val out = Seq.newBuilder[BollFlag]
      rows.toArray
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
        .foreach { e =>
          val x = units(e.value)
          val n = s.n + 1
          if (n >= 8) {
            val frame = s.win.takeRight(7) :+ x
            var sum = 0L; var q = 0L
            frame.foreach { v => sum += v; q += v * v }
            val dev = 8L * x - sum
            out += BollFlag(key, e.event_id, 2L * dev * dev > 64L * q - 8L * sum * sum)
          }
          s = BollState(n, (s.win :+ x).takeRight(7))
        }
      st.update(s)
      out.result().iterator
    }
  }

  def bollingerFlags(events: Dataset[Event]): Dataset[BollFlag] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new BollingerProcessor, TimeMode.None(), OM.Append())
  }

  /** Open session + its registered timer expiry (timers must be
    * DELETED when a session extends, so the expiry travels in state).
    */
  final case class TimedSession(n: Long, start: java.sql.Timestamp,
                                last: java.sql.Timestamp, sumCents: Long,
                                timerMs: Long)

  /** Gap sessionization on the transformWithState TIMER surface —
    * same semantics as [[sessionize]] (floor-second gap rule, exact
    * cents), but idle sessions close via `handleExpiredTimer` when the
    * EVENT-TIME watermark passes last + gap (the v2 replacement for
    * GroupStateTimeout.EventTimeTimeout). Each extension deletes the
    * previous timer and registers the new expiry — state stays one
    * aggregate + one timer per user.
    */
  class SessionProcessor(gapMinutes: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, Session] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState, ExpiredTimerInfo}
    private val gapSec = gapMinutes * 60L
    @transient private var open: ValueState[TimedSession] = _

    private def cents(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP).movePointRight(2).longValueExact()
    private def emit(userId: Long, s: TimedSession): Session =
      Session(userId, s.n, s.start, s.last,
        java.math.BigDecimal.valueOf(s.sumCents, 2).doubleValue)
    private def epochSec(t: java.sql.Timestamp): Long = t.toInstant.getEpochSecond

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[TimedSession]("open",
        org.apache.spark.sql.Encoders.product[TimedSession], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[Session] = {
      val sorted = rows.toArray.sortBy(e => (e.ts.getTime, e.ts.getNanos))
      var cur: TimedSession = if (open.exists()) open.get() else null
      if (cur != null) getHandle.deleteTimer(cur.timerMs)
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        cur = cur match {
          case null => TimedSession(1L, e.ts, e.ts, cents(e.value), 0L)
          case s if epochSec(e.ts) - epochSec(s.last) <= gapSec =>
            TimedSession(s.n + 1, s.start, e.ts, s.sumCents + cents(e.value), 0L)
          case s =>
            closed += emit(key, s)
            TimedSession(1L, e.ts, e.ts, cents(e.value), 0L)
        }
      }
      if (cur != null) {
        // +1s margin: the gap rule floors to seconds, the timer doesn't
        val expiry = cur.last.getTime + gapSec * 1000L + 1000L
        open.update(cur.copy(timerMs = expiry))
        getHandle.registerTimer(expiry)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[Session] = {
      if (!open.exists()) return Iterator.empty
      val s = open.get()
      if (s.timerMs != info.getExpiryTimeInMs()) return Iterator.empty // stale timer
      open.clear()
      Iterator(emit(key, s))
    }
  }

  def sessionizeWithTimers(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events.withWatermark("ts", "1 hour")
      .as[Event]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes), TimeMode.EventTime(), OM.Append())
  }

  /** Batch-mode twin of sessionize for oracle checking: same gap
    * semantics via a window-function plan (lag + cumulative session id)
    * — the standard scalable batch sessionization (one shuffle by user).
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .drop("session_seq")
  }

  final case class QuotaOut(user_id: Long, event_id: Long,
                            hour_bucket: Long, seq: Long)

  /** Streaming per-(user, hour) admission quota on the transformWithState
    * MAP-state surface (the one typed state handle the other processors
    * don't exercise): state is hour-bucket → admitted-count, so a user's
    * state stays O(#active hours) and a bucket's counter is one map
    * entry — the shape a RocksDB-backed rate limiter keeps at scale.
    * Rows sort by event time within the micro-batch (RunningCount's
    * discipline) so admission order equals the batch row_number oracle
    * regardless of arrival interleaving.
    */
  class QuotaThrottleProcessor(k: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, QuotaOut] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, MapState}
    @transient private var quota: MapState[Long, Long] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      quota = getHandle.getMapState[Long, Long]("quota",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    private def hourBucket(ts: java.sql.Timestamp): Long = {
      val us = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
      Math.floorDiv(us, 3600000000L)
    }
    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[QuotaOut] = {
      val out = Seq.newBuilder[QuotaOut]
      rows.toArray
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
        .foreach { e =>
          val h = hourBucket(e.ts)
          val c = (if (quota.containsKey(h)) quota.getValue(h) else 0L) + 1L
          quota.updateValue(h, c)
          if (c <= k) out += QuotaOut(key, e.event_id, h, c)
        }
      out.result().iterator
    }
  }

  def quotaThrottle(events: Dataset[Event], k: Long): Dataset[QuotaOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new QuotaThrottleProcessor(k), TimeMode.None(), OM.Append())
  }

  final case class AsofOut(user_id: Long, event_id: Long,
                           fact_cents: Long, dim_cents: Option[Long])
  final case class DimState(ts_us: Long, event_id: Long, cents: Long)

  /** Streaming backward AS-OF enrichment — the CDC pattern a streaming
    * engine needs beside the equi stream-static join (ev16s): dimension
    * updates (signup events, carrying a value) and facts (purchases)
    * arrive on ONE stream; each fact leaves enriched with the dimension
    * value as of its own event time. State per user is the single
    * latest dimension row (streaming SCD1). Within a micro-batch rows
    * process in (ts, dim-before-fact, event_id) order, so a dimension
    * update at a fact's exact timestamp applies to it — the `<=`
    * convention of a batch ASOF join, which is the oracle.
    */
  class StreamAsofProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, AsofOut] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var dim: ValueState[DimState] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      dim = getHandle.getValueState[DimState]("dim",
        org.apache.spark.sql.Encoders.product[DimState], TTLConfig.NONE)
    private def us(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    private def cents(v: Double): Long = math.floor(v * 100).toLong
    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[AsofOut] = {
      val out = Seq.newBuilder[AsofOut]
      rows.toArray
        .sortBy(e => (us(e.ts), if (e.event_type == "signup") 0 else 1, e.event_id))
        .foreach { e =>
          if (e.event_type == "signup") {
            val t = us(e.ts)
            val cur = if (dim.exists()) dim.get() else null
            // last-writer-wins at equal ts = max event_id (the oracle
            // dedupes the dim side the same way)
            if (cur == null || t > cur.ts_us ||
                (t == cur.ts_us && e.event_id > cur.event_id))
              dim.update(DimState(t, e.event_id, cents(e.value)))
          } else if (e.event_type == "purchase") {
            val cur = if (dim.exists()) dim.get() else null
            out += AsofOut(key, e.event_id, cents(e.value),
              Option(cur).map(_.cents))
          }
        }
      out.result().iterator
    }
  }

  def streamAsofEnrich(events: Dataset[Event]): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events.filter(e => e.event_type == "signup" || e.event_type == "purchase")
      .groupByKey(_.user_id)
      .transformWithState(new StreamAsofProcessor, TimeMode.None(), OM.Append())
  }

  final case class CepMatch(user_id: Long, end_event_id: Long, match_idx: Long)
  final case class CepState(progress: Int, matches: Long)

  /** Streaming complex-event processing: detect NON-OVERLAPPING
    * view → click → purchase subsequences per user (gaps allowed;
    * after a match the automaton resets — the greedy CEP semantics of
    * the batch regex operator). State per user is one (progress ∈
    * {0,1,2}, match count) pair; rows sort by event time within the
    * micro-batch so the match set equals a sequential replay.
    */
  class CepProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, CepMatch] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[CepState] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CepState]("cep",
        org.apache.spark.sql.Encoders.product[CepState], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[CepMatch] = {
      var s = if (st.exists()) st.get() else CepState(0, 0L)
      val out = Seq.newBuilder[CepMatch]
      rows.toArray
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
        .foreach { e =>
          e.event_type match {
            case "view" if s.progress == 0 => s = s.copy(progress = 1)
            case "click" if s.progress == 1 => s = s.copy(progress = 2)
            case "purchase" if s.progress == 2 =>
              s = CepState(0, s.matches + 1)
              out += CepMatch(key, e.event_id, s.matches)
            case _ => ()
          }
        }
      st.update(s)
      out.result().iterator
    }
  }

  def streamCep(events: Dataset[Event]): Dataset[CepMatch] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new CepProcessor, TimeMode.None(), OM.Append())
  }

  final case class MergedInterval(user_id: Long, seg_start_us: Long,
                                  seg_end_us: Long)
  final case class OpenInterval(start_us: Long, end_us: Long)

  /** Streaming interval merging: every event opens a fixed 30-minute
    * window; overlapping/touching windows coalesce in a one-interval
    * ValueState and a merged interval EMITS when the next event opens
    * a disjoint one. The final interval of each key stays open at
    * stream end by definition (no event closes it) — the honest
    * streaming semantics; the batch oracle mirrors it by dropping each
    * user's last merged interval.
    */
  class IntervalMergeProcessor(winUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, MergedInterval] {
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var cur: ValueState[OpenInterval] = _
    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[OpenInterval]("cur",
        org.apache.spark.sql.Encoders.product[OpenInterval], TTLConfig.NONE)
    private def us(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 tv: TimerValues): Iterator[MergedInterval] = {
      var s = if (cur.exists()) cur.get() else null
      val out = Seq.newBuilder[MergedInterval]
      rows.toArray
        .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
        .foreach { e =>
          val t = us(e.ts)
          if (s == null) s = OpenInterval(t, t + winUs)
          else if (t <= s.end_us) s = s.copy(end_us = math.max(s.end_us, t + winUs))
          else {
            out += MergedInterval(key, s.start_us, s.end_us)
            s = OpenInterval(t, t + winUs)
          }
        }
      if (s != null) cur.update(s)
      out.result().iterator
    }
  }

  def streamIntervalMerge(events: Dataset[Event], winUs: Long): Dataset[MergedInterval] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode => OM, TimeMode}
    events.groupByKey(_.user_id)
      .transformWithState(new IntervalMergeProcessor(winUs), TimeMode.None(), OM.Append())
  }
}

/** The monthly-refresh semantic (SURVEY §2.10): incremental ingest of
  * newly-landed files with exactly-once file tracking. Batch cadence +
  * streaming bookkeeping = `Trigger.AvailableNow` — processes what's
  * new, then stops; re-run on the next IRS data release.
  */
object Refresh {

  def incrementalParquet(spark: SparkSession, landingDir: String,
                         schema: org.apache.spark.sql.types.StructType,
                         outDir: String, checkpointDir: String): Unit = {
    val q = spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The 990 engine's monthly refresh: newly-landed XML returns are
    * parsed with the concordance-derived sparse schema and appended to
    * the parquet core table, exactly-once per file. Transform runs the
    * same Column algebra as the batch build (`Core.build`).
    */
  def incrementalReturns(spark: SparkSession, landingGlob: String,
                         schema: org.apache.spark.sql.types.StructType,
                         outDir: String, checkpointDir: String): Unit = {
    import org.apache.spark.sql.functions.input_file_name
    val parsed = spark.readStream
      .format("xml")
      .schema(schema)
      .option("rowTag", "Return")
      .load(landingGlob)
      .withColumn("source_url", input_file_name())
    val q = graft.engine.Core.build(parsed)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Monthly refresh into the RAW staging table (the rawpq
    * architecture): newly-landed XML appends its parsed nested rows to
    * the TAXYR-partitioned raw parquet, exactly-once per file. Every
    * derived table can then be rebuilt (or year-sliced) from the raw
    * table with partition pruning — the parse is never repeated.
    */
  def incrementalRawStaging(spark: SparkSession, landingGlob: String,
                            schema: org.apache.spark.sql.types.StructType,
                            rawDir: String, checkpointDir: String): Unit = {
    import org.apache.spark.sql.functions.{input_file_name, lit, regexp_replace}
    import graft.engine.{Extract, Rules}
    val parsed = spark.readStream
      .format("xml")
      .schema(schema)
      .option("rowTag", "Return")
      .load(landingGlob)
      .withColumn("source_url", input_file_name())
    val withYear = parsed.withColumn("TAXYR", Rules.taxYear(
      regexp_replace(Extract.scalar(parsed, Seq(
        "/Return/ReturnHeader/TaxPeriodEndDt",
        "/Return/ReturnHeader/TaxPeriodEndDate")), lit("-"), lit(""))).cast("string"))
    val q = withYear.writeStream
      .format("parquet")
      .partitionBy("TAXYR")
      .option("path", rawDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
