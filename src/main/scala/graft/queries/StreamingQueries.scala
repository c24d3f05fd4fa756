package graft.queries

import graft.Tables
import graft.streaming.{EventStreams, StreamStage}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable registrations of the STREAMING operators: each
  * query runs the real Structured Streaming code (watermarked window
  * aggregation, `flatMapGroupsWithState` sessionization, stream-stream
  * interval join) over a staged file source via [[StreamStage]] and
  * returns the sink table. The DuckDB oracles are the SAME SQL as the
  * batch twins ev1/ev2/ev4 — stream results must equal batch results
  * bit-for-bit once every window/session is flushed.
  */
object StreamingQueries {

  private val FlushType = "__flush__"

  private def flushRow(spark: SparkSession, id: Long, iso: String): DataFrame = {
    import spark.implicits._
    Seq(EventStreams.Event(id, java.sql.Timestamp.valueOf(iso), -1L, FlushType, 0.0, "{}"))
      .toDF()
  }

  private def staged(spark: SparkSession, dir: String, name: String,
                     extraConfs: Map[String, String] = Map.empty)
                    (transform: DataFrame => DataFrame): DataFrame = {
    // flush 1 rides INSIDE the bulk batch (intra-batch data is never
    // late, and the watermark updates from the batch max) so it pushes
    // the watermark past all real data after batch 1; the second flush
    // file forms batch 2, whose processing emits every window/session
    // the new watermark closed. Two batches total.
    val bulk = Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .unionByName(flushRow(spark, -1L, "2100-01-01 00:00:00"))
    // all three streaming queries stage the same events bulk: share
    // one staged input per sf dir, keyed by the source file's mtime so
    // regenerated testdata re-stages
    val src = new java.io.File(dir, "events.parquet")
    val key = s"$dir:${src.lastModified}:${src.length}"
    StreamStage.run(spark, name,
      s"$stageRoot/${new java.io.File(dir).getName}", bulk,
      Seq(flushRow(spark, -2L, "2100-02-01 00:00:00")),
      shufflePartitions = Some(StreamStage.benchParts), reuseKey = Some(key),
      extraConfs = extraConfs)(transform)
  }

  // Scaffolding location + state partition count are bench-local
  // deployment defaults, centralized in StreamStage (r5 optimization):
  // tmpfs scaffolding unless GRAFT_STREAM_DURABLE=1, GRAFT_STREAM_PARTS
  // state partitions (default 8 — the r5 A/B measured 1 as ~15% slower;
  // outputs are spec-pinned bit-identical across partition counts).
  private def stageRoot: String = StreamStage.stageRoot

  def defs: Seq[QueryDef] = Seq(

    // ---- streaming CDC apply: foreachBatch MERGE maintenance -------------
    // The fourth streaming sink pattern beside append aggregation,
    // stateful transforms, and stream-stream joins: each micro-batch
    // MERGEs into a versioned keyed table (read current → upsert →
    // publish next version), the exact loop a Delta/Iceberg MERGE
    // runs in production CDC pipelines. The keep-latest merge
    // (max by ts, event_id per user) is associative across batches,
    // so the maintained table after three micro-batches equals the
    // batch latest-per-key over all events — which is the oracle.
    // No watermark, no flush rows: correctness comes from merge
    // associativity, not state-store eviction.
    QueryDef.sql(
      "ev21s_stream_upsert",
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      val src = new java.io.File(d, "events.parquet")
      val key = s"$d:${src.lastModified}:${src.length}"
      val keepLatest = (current: Option[DataFrame], batch: DataFrame) => {
        val all = current.map(_.unionByName(batch)).getOrElse(batch)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        all.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
      }
      StreamStage.runUpsert(s, "ev21s_tbl",
          s"$stageRoot/upsert_${new java.io.File(d).getName}",
          bulk = ev.filter(col("event_id") % 3 === 0),
          deltas = Seq(ev.filter(col("event_id") % 3 === 1),
                       ev.filter(col("event_id") % 3 === 2)),
          reuseKey = Some(key))(keepLatest)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
    },

    // Watermarked tumbling-window rollup — streaming twin of ev1
    QueryDef.sql(
      "ev1s_hourly_rollup_stream",
      """SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin) { (s, d) =>
      // flush rows are excluded on the SINK table, not inside the
      // streaming plan: a filter on a grouping column would be pushed
      // below withWatermark and the flush would never advance it
      staged(s, d, "ev1s_out")(EventStreams.hourlyRollup)
        .filter(col("event_type") =!= FlushType)
    },

    // flatMapGroupsWithState sessionization — streaming twin of ev2
    QueryDef.sql(
      "ev2s_sessionize_stream",
      """WITH lagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
        |                 THEN 1 ELSE 0 END AS new_session FROM lagged),
        |numbered AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM flagged)
        |SELECT user_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM numbered GROUP BY user_id, session_seq""".stripMargin) { (s, d) =>
      staged(s, d, "ev2s_out") { src =>
        import s.implicits._
        EventStreams.sessionize(src.as[EventStreams.Event], gapMinutes = 30)
          .select(col("user_id"), col("n_events"),
            col("start").as("session_start"), col("end").as("session_end"),
            col("total_value"))
      }.filter(col("user_id") >= 0) // sink-side: keep flush users out of the plan
    },

    // Streaming deduplication — state-store dropDuplicates. The output
    // (one row per distinct key) is a SET, so it equals the batch
    // DISTINCT regardless of arrival order — exactly the property that
    // makes streaming dedup safe to re-run from a checkpoint. State is
    // one entry per key (bounded by key cardinality, not stream
    // length); when keys can recur beyond a known horizon,
    // dropDuplicatesWithinWatermark is the state-evicting variant.
    QueryDef.sql(
      "ev5s_stream_dedup",
      "SELECT DISTINCT user_id, event_type FROM events") { (s, d) =>
      staged(s, d, "ev5s_out")(src =>
        src.withWatermark("ts", "400 days")
          .dropDuplicates("user_id", "event_type")
          .select(col("user_id"), col("event_type")))
        .filter(col("user_id") >= 0) // sink-side: keep flush rows out of the plan
    },

    // Hopping(sliding)-window rollup — streaming twin of ev9
    QueryDef.sql(
      "ev9s_hopping_rollup_stream",
      """WITH x AS (
        |  SELECT e.event_type, e.value,
        |    make_timestamp((epoch_us(e.ts) // 1800000000 - i.i) * 1800000000)
        |      AS win_start
        |  FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS i) i)
        |SELECT win_start,
        |  win_start + INTERVAL 1 HOUR AS win_end,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM x GROUP BY win_start, event_type""".stripMargin) { (s, d) =>
      staged(s, d, "ev9s_out")(src => EventStreams.hoppingRollup(src))
        .filter(col("event_type") =!= FlushType)
    },

    // Stream-stream LEFT OUTER interval join — the emit-on-expiry
    // semantic on top of ev4s: a click whose buffered state expires
    // unmatched is released with a NULL err_id, which only the
    // WATERMARK can authorize (no future error can still match). The
    // flush rows must flow through BOTH sides' watermark nodes here —
    // unlike the inner join, where matches emit eagerly and flushes
    // only drive state cleanup — so each side's filter admits them and
    // the sink drops the flush users.
    QueryDef.sql(
      "ev10s_left_outer_join_stream",
      """WITH err AS (
        |  SELECT user_id, event_id AS err_id, ts AS lo
        |  FROM events WHERE event_type = 'error'),
        |clk AS (
        |  SELECT user_id, event_id AS click_id, ts
        |  FROM events WHERE event_type = 'click')
        |SELECT c.user_id, c.click_id, e.err_id
        |FROM clk c LEFT JOIN err e
        |  ON c.user_id = e.user_id
        | AND c.ts >= e.lo AND c.ts < e.lo + INTERVAL 4 HOUR""".stripMargin) { (s, d) =>
      staged(s, d, "ev10s_out")(src =>
        EventStreams.errorWindowJoin(
          src.filter(col("event_type") === "click" || col("event_type") === FlushType),
          src.filter(col("event_type") === "error" || col("event_type") === FlushType),
          windowMinutes = 240, joinType = "left_outer"))
        .filter(col("user_id") >= 0)
    },

    // FULL-outer stream-stream interval join — completes the join-mode
    // matrix (ev4s inner, ev10s left-outer): BOTH buffers now emit on
    // expiry, so an error no click ever lands in surfaces as
    // (user, NULL, err_id) and an unmatched click as (user, click_id,
    // NULL) — each released only when its side's watermark proves no
    // future partner can arrive. The join key must be COALESCED across
    // sides (right-unmatched rows have a NULL left key). Flush rows
    // ride both inputs (they advance both watermarks) and leave as
    // user_id < 0 — unmatched or flush×flush-matched — dropped at the
    // sink.
    QueryDef.sql(
      "ev20s_full_outer_join_stream",
      """WITH err AS (
        |  SELECT user_id, event_id AS err_id, ts AS lo
        |  FROM events WHERE event_type = 'error'),
        |clk AS (
        |  SELECT user_id, event_id AS click_id, ts
        |  FROM events WHERE event_type = 'click')
        |SELECT COALESCE(c.user_id, e.user_id) AS user_id, c.click_id, e.err_id
        |FROM clk c FULL JOIN err e
        |  ON c.user_id = e.user_id
        | AND c.ts >= e.lo AND c.ts < e.lo + INTERVAL 4 HOUR""".stripMargin) { (s, d) =>
      staged(s, d, "ev20s_out")(src =>
        EventStreams.errorWindowJoin(
          src.filter(col("event_type") === "click" || col("event_type") === FlushType),
          src.filter(col("event_type") === "error" || col("event_type") === FlushType),
          windowMinutes = 240, joinType = "full_outer"))
        .filter(col("user_id") >= 0)
    },

    // Built-in session_window under streaming state — the session-merge
    // state store (sessions start per event, merge when they overlap),
    // a THIRD stateful mechanism beside windowed agg (ev1s/ev9s) and
    // flatMapGroupsWithState (ev2s). Same oracle as the batch twin
    // ev12: sessions merge when window start <= session end, so a new
    // session opens only when the gap STRICTLY exceeds 30 min (µs);
    // session end = last event + gap.
    QueryDef.sql(
      "ev12s_session_window_stream",
      """WITH lagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |    THEN 1 ELSE 0 END AS new_session FROM lagged),
        |numbered AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM flagged)
        |SELECT user_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM numbered GROUP BY user_id, session_seq""".stripMargin) { (s, d) =>
      staged(s, d, "ev12s_out")(src =>
        src.withWatermark("ts", "1 hour")
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .cast("double").as("total_value"))
          .select(col("user_id"), col("n_events"),
            col("w.start").as("session_start"), col("w.end").as("session_end"),
            col("total_value")))
        .filter(col("user_id") >= 0)
    },

    // COMPOSED pipeline: stream-static enrich (stateless broadcast
    // join) → session window (stateful, watermarked) → foreachBatch
    // upsert keeping each user's LATEST session — the enrich→
    // sessionize→upsert chain a real deployment runs as ONE streaming
    // query, not three. The watermark node sits BEFORE the join so the
    // flush rows (user_id < 0, never in the dimension) still advance
    // it even though the join drops them; the keep-latest merge is
    // associative across micro-batches (sessions are emitted exactly
    // once, session_start is unique per user), so the final table is
    // independent of how the watermark slices emissions into batches —
    // which is what lets the batch oracle check it bit-for-bit.
    QueryDef.sql(
      "ev112s_enrich_session_upsert",
      """WITH e AS (
        |  SELECT ev.user_id, ev.event_id, ev.ts, ev.value,
        |    c.c_mktsegment AS segment
        |  FROM events ev JOIN customer c ON ev.user_id = c.c_custkey),
        |lagged AS (
        |  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS prev_ts
        |  FROM e),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |    THEN 1 ELSE 0 END AS new_session FROM lagged),
        |numbered AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM flagged),
        |sessions AS (
        |  SELECT user_id, min(segment) AS segment,
        |    CAST(COUNT(*) AS BIGINT) AS n_events,
        |    MIN(ts) AS session_start,
        |    MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |  FROM numbered GROUP BY user_id, session_seq)
        |SELECT user_id, segment, n_events, session_start, session_end, total_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY session_start DESC) AS rn FROM sessions)
        |WHERE rn = 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val srcFile = new java.io.File(d, "events.parquet")
      val key = s"$d:${srcFile.lastModified}:${srcFile.length}"
      val bulk = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .unionByName(flushRow(s, -1L, "2100-01-01 00:00:00"))
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
      val keepLatest = (current: Option[DataFrame], batch: DataFrame) => {
        val all = current.map(_.unionByName(batch)).getOrElse(batch)
        val w = Window.partitionBy(col("user_id")).orderBy(col("session_start").desc)
        all.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      }
      StreamStage.runTransformUpsert(s, "ev112s_tbl",
          s"$stageRoot/${new java.io.File(d).getName}", bulk,
          Seq(flushRow(s, -2L, "2100-02-01 00:00:00")),
          shufflePartitions = Some(StreamStage.benchParts), reuseKey = Some(key)) { stream =>
        stream.withWatermark("ts", "1 hour")
          .join(broadcast(dim), col("user_id") === col("c_custkey"))
          .groupBy(session_window(col("ts"), "30 minutes").as("w"),
            col("user_id"), col("segment"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
              .cast("double").as("total_value"))
          .select(col("user_id"), col("segment"), col("n_events"),
            col("w.start").as("session_start"), col("w.end").as("session_end"),
            col("total_value"))
      }(keepLatest)
        .select(col("user_id"), col("segment"), col("n_events"),
          col("session_start"), col("session_end"), col("total_value"))
    },

    // transformWithState (arbitrary-state v2) — per-user running event
    // counter with ONE long of typed ValueState per key, RocksDB-backed
    // (the API requires the RocksDB provider; set per-run and
    // restored). Rows are sorted by event time inside each micro-batch,
    // so the emitted running_n equals the batch row_number — which is
    // exactly what the oracle computes.
    QueryDef.sql(
      "ev13s_running_count_stream",
      """SELECT user_id, event_id,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
        |    AS running_n
        |FROM events""".stripMargin) { (s, d) =>
      staged(s, d, "ev13s_out", extraConfs = Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) { src =>
        import s.implicits._
        EventStreams.runningCounts(src.as[EventStreams.Event]).toDF()
      }.filter(col("user_id") >= 0)
    },

    // transformWithState TIMERS — sessionization where idle sessions
    // close via handleExpiredTimer when the event-time watermark
    // passes last + gap (the v2 replacement for EventTimeTimeout).
    // Same oracle as ev2/ev2s: the timer path must produce the exact
    // same sessions as flatMapGroupsWithState's timeout path.
    QueryDef.sql(
      "ev15s_session_timers_stream",
      """WITH lagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
        |                 THEN 1 ELSE 0 END AS new_session FROM lagged),
        |numbered AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM flagged)
        |SELECT user_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM numbered GROUP BY user_id, session_seq""".stripMargin) { (s, d) =>
      staged(s, d, "ev15s_out", extraConfs = Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) { src =>
        import s.implicits._
        EventStreams.sessionizeWithTimers(src.as[EventStreams.Event], gapMinutes = 30)
          .select(col("user_id"), col("n_events"),
            col("start").as("session_start"), col("end").as("session_end"),
            col("total_value"))
      }.filter(col("user_id") >= 0)
    },

    // State-EVICTING streaming dedup — dropDuplicatesWithinWatermark.
    // ev5s's dropDuplicates keeps one state entry per key FOREVER
    // (right when keys never recur past a horizon is unknowable);
    // this variant evicts a key's state once the watermark passes its
    // event time + delay — the bounded-state posture for infinite
    // streams whose duplicates arrive close together (retries, at-
    // least-once upstreams). Here every duplicate arrives in the bulk
    // batch, inside the horizon, so the emitted set equals batch
    // DISTINCT exactly — which is what the oracle checks.
    QueryDef.sql(
      "ev11s_stream_dedup_within_wm",
      "SELECT DISTINCT user_id, event_type FROM events") { (s, d) =>
      staged(s, d, "ev11s_out")(src =>
        src.withWatermark("ts", "400 days")
          .dropDuplicatesWithinWatermark("user_id", "event_type")
          .select(col("user_id"), col("event_type")))
        .filter(col("user_id") >= 0) // sink-side: keep flush rows out of the plan
    },

    // Stream-stream interval join — streaming twin of ev4
    QueryDef.sql(
      "ev4s_error_window_join_stream",
      """WITH err AS (
        |  SELECT user_id, event_id AS err_id, ts AS lo
        |  FROM events WHERE event_type = 'error'),
        |clk AS (
        |  SELECT user_id, event_id AS click_id, ts
        |  FROM events WHERE event_type = 'click')
        |SELECT c.user_id, c.click_id, e.err_id
        |FROM clk c JOIN err e
        |  ON c.user_id = e.user_id
        | AND c.ts >= e.lo AND c.ts < e.lo + INTERVAL 4 HOUR""".stripMargin) { (s, d) =>
      staged(s, d, "ev4s_out")(src =>
        EventStreams.errorWindowJoin(
          src.filter(col("event_type") === "click"),
          src.filter(col("event_type") === "error"),
          windowMinutes = 240))
    },

    // Stream-STATIC enrichment join — the stateless streaming join
    // flavor (the other nine queries are stateful): each micro-batch
    // hash-joins the event stream against the static customer
    // dimension, broadcast per batch; no watermark, no state store
    // (EventStreamsSpec pins stateOperators.isEmpty on the progress).
    // Flush rows carry user_id < 0, which never matches the dimension,
    // so the inner join drops them inside the plan — no sink filter
    // needed for them (kept anyway for uniformity).
    QueryDef.sql(
      "ev16s_enrich_dim_stream",
      """SELECT e.event_id, e.user_id, c.c_mktsegment AS segment
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey""".stripMargin) { (s, d) =>
      staged(s, d, "ev16s_out")(src =>
        EventStreams.enrichWithDim(src, Tables.customer(s, d),
            streamKey = "user_id", dimKey = "c_custkey")
          .select(col("event_id"), col("user_id"),
            col("c_mktsegment").as("segment")))
        .filter(col("user_id") >= 0)
    },

    // CHAINED stateful operators — two windowed aggregations in ONE
    // streaming query (5-min pre-agg → hourly rollup of the buckets),
    // the multiple-stateful-operator pipeline shape. One watermark
    // drives eviction AND emission cascade through both stores: the
    // flush advances it past the data, the fine agg emits its closed
    // buckets, and the coarse agg — fed those emissions in the same
    // micro-batch — closes its hours against the same watermark.
    // Oracle: start-based integer-µs bucketing at both grains (inner
    // duration divides outer, so span-based assignment is identical).
    QueryDef.sql(
      "ev19s_chained_windows_stream",
      """WITH b AS (
        |  SELECT epoch_us(ts) // 300000000 AS b5, event_type,
        |    CAST(count(*) AS BIGINT) AS n5,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS v5
        |  FROM events GROUP BY 1, 2)
        |SELECT make_timestamp(b5 // 12 * 3600000000) AS hour_bucket,
        |  event_type,
        |  CAST(SUM(n5) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_buckets,
        |  CAST(max(n5) AS BIGINT) AS max_bucket_n,
        |  CAST(SUM(v5) AS DOUBLE) AS total_value
        |FROM b GROUP BY 1, 2""".stripMargin) { (s, d) =>
      staged(s, d, "ev19s_out")(EventStreams.chainedRollup)
        .filter(col("event_type") =!= FlushType)
    },

    // Streaming OHLC candles — ordered-selection aggregates (min_by /
    // max_by on the (ts, event_id) total order) running inside a
    // watermarked window aggregation, the resample loop a metrics
    // store runs on live ticks. The oracle pins open/close via
    // row_number over the SAME total order, so stream == batch
    // bit-for-bit once the watermark closes each candle.
    QueryDef.sql(
      "ev23s_ohlc_stream",
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 21600000000 AS bucket, value,
        |    row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 21600000000
        |                       ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 21600000000
        |                       ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT make_timestamp(bucket * 21600000000) AS win_start, event_type,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  CAST(count(*) AS BIGINT) AS volume
        |FROM e GROUP BY 1, 2""".stripMargin) { (s, d) =>
      staged(s, d, "ev23s_out")(src => EventStreams.ohlcBars(src))
        .filter(col("event_type") =!= FlushType)
    },

    // Streaming Bollinger breakouts — a trailing per-key FRAME as
    // transformWithState (count + last-7 ring in one ValueState,
    // RocksDB-backed), the live twin of batch w10. The sqrt-free
    // integer band test makes the streaming ALERT SET bit-identical to
    // the batch window formulation, which is the oracle — the property
    // a paging monitor actually needs (same alerts online as in the
    // backfill).
    QueryDef.sql(
      "ev34s_stream_bollinger",
      """WITH v AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS x
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, x,
        |    CAST(sum(x) OVER w AS BIGINT) AS s,
        |    CAST(sum(x * x) OVER w AS BIGINT) AS q,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
        |  FROM v
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id,
        |  2 * (8 * x - s) * (8 * x - s) > 64 * q - 8 * s * s AS breakout
        |FROM f WHERE rk >= 8""".stripMargin) { (s, d) =>
      staged(s, d, "ev34s_out", extraConfs = Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) { src =>
        import s.implicits._
        EventStreams.bollingerFlags(src.as[EventStreams.Event]).toDF()
      }.filter(col("user_id") >= 0)
    },

    // Streaming admission quota — transformWithState MAP state (the
    // typed handle the other processors don't exercise): per user, a
    // RocksDB-backed hour-bucket → admitted-count map; only the first
    // 5 events per (user, hour) pass. In-batch rows sort by event time
    // (RunningCount's discipline), so the admitted set and sequence
    // numbers are bit-identical to the batch row_number oracle.
    QueryDef.sql(
      "ev71s_stream_quota",
      """SELECT user_id, event_id,
        |  CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
        |  CAST(seq AS BIGINT) AS seq
        |FROM (
        |  SELECT user_id, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, epoch_us(ts) // 3600000000
        |      ORDER BY ts, event_id) AS seq
        |  FROM events)
        |WHERE seq <= 5""".stripMargin) { (s, d) =>
      staged(s, d, "ev71s_out", extraConfs = Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) { src =>
        import s.implicits._
        EventStreams.quotaThrottle(src.as[EventStreams.Event], k = 5L).toDF()
      }.filter(col("user_id") >= 0)
    },

    // Streaming backward AS-OF enrichment — dimension updates (signups)
    // and facts (purchases) on one stream; each fact exits carrying the
    // dimension value as of its own event time, from a one-row-per-key
    // SCD1 ValueState. The oracle is DuckDB's native ASOF LEFT JOIN
    // with the same `<=` and equal-ts last-writer conventions.
    QueryDef.sql(
      "ev73s_stream_asof",
      """WITH s0 AS (
        |  SELECT user_id, ts, event_id, CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'signup'),
        |s AS (
        |  SELECT * FROM s0 QUALIFY
        |    row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
        |p AS (
        |  SELECT user_id, ts, event_id, CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, p.event_id, p.cents AS fact_cents, s.cents AS dim_cents
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND s.ts <= p.ts""".stripMargin) { (s, d) =>
      staged(s, d, "ev73s_out", extraConfs = Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) { src =>
        import s.implicits._
        EventStreams.streamAsofEnrich(src.as[EventStreams.Event]).toDF()
      }.filter(col("user_id") >= 0)
    },

    // Streaming CEP — a greedy non-overlapping view→click→purchase
    // automaton per user in ONE ValueState (progress + match count).
    // The oracle replays the same state machine as a per-user ordered
    // list fold in DuckDB — sequential semantics a window function
    // can't express, bit-exact against the streaming state store.
    QueryDef.sql(
      "ev81s_stream_cep",
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |-- recursion = the greedy automaton itself: from the previous
        |-- match end, take the first view, first click after it, first
        |-- purchase after that. (A list_reduce formulation mis-executes
        |-- in DuckDB when the lambda branches on the accumulator across
        |-- many rows — and segfaults with list-valued struct state — so
        |-- the oracle recurses instead.)
        |m(user_id, k, pos, end_event_id) AS (
        |  SELECT user_id, 0, 0::BIGINT, NULL::BIGINT
        |  FROM (SELECT DISTINCT user_id FROM ev)
        |  UNION ALL
        |  SELECT m.user_id, m.k + 1, nxt.p_rn, nxt.p_id
        |  FROM m, LATERAL (
        |    SELECT p.rn AS p_rn, p.event_id AS p_id
        |    FROM ev p
        |    WHERE p.user_id = m.user_id AND p.event_type = 'purchase'
        |      AND p.rn > (SELECT min(c.rn) FROM ev c
        |                  WHERE c.user_id = m.user_id AND c.event_type = 'click'
        |                    AND c.rn > (SELECT min(v.rn) FROM ev v
        |                                WHERE v.user_id = m.user_id
        |                                  AND v.event_type = 'view'
        |                                  AND v.rn > m.pos))
        |    ORDER BY p.rn LIMIT 1) nxt)
        |SELECT user_id, end_event_id, CAST(k AS BIGINT) AS match_idx
        |FROM m WHERE k > 0 ORDER BY user_id, match_idx""".stripMargin) { (s, d) =>
      staged(s, d, "ev81s_out", extraConfs = Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) { src =>
        import s.implicits._
        EventStreams.streamCep(src.as[EventStreams.Event]).toDF()
      }.filter(col("user_id") >= 0)
        .select(col("user_id"), col("end_event_id"), col("match_idx"))
    },

    // Streaming interval merging — ev69's batch sweep, live: a closed
    // merged interval emits the moment the next event opens a disjoint
    // window. Fixed-length windows over monotonically sorted events
    // make the merge rule a pure gap test, so the batch oracle is the
    // strict-gap sessionizer minus each user's final (still-open)
    // interval.
    QueryDef.sql(
      "ev86s_stream_interval_merge",
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |      OR lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      THEN 1 ELSE 0 END AS new_seg
        |  FROM events),
        |seg AS (
        |  SELECT user_id, t,
        |    CAST(sum(new_seg) OVER (PARTITION BY user_id ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS seg_id
        |  FROM e),
        |m AS (
        |  SELECT user_id, seg_id,
        |    CAST(min(t) AS BIGINT) AS seg_start_us,
        |    CAST(max(t) + 1800000000 AS BIGINT) AS seg_end_us
        |  FROM seg GROUP BY 1, 2),
        |last AS (SELECT user_id, max(seg_id) AS last_seg FROM m GROUP BY 1)
        |SELECT m.user_id, m.seg_start_us, m.seg_end_us
        |FROM m JOIN last ON m.user_id = last.user_id
        |WHERE m.seg_id < last.last_seg
        |ORDER BY m.user_id, m.seg_start_us""".stripMargin) { (s, d) =>
      staged(s, d, "ev86s_out", extraConfs = Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) { src =>
        import s.implicits._
        EventStreams.streamIntervalMerge(src.as[EventStreams.Event],
          winUs = 1800000000L).toDF()
      }.filter(col("user_id") >= 0)
        .select(col("user_id"), col("seg_start_us"), col("seg_end_us"))
    },

    // Stream-stream LEFT SEMI interval join — the last join mode
    // (ev4s inner, ev10s left-outer, ev20s full-outer): "did any error
    // land within the window" as existence, not enumeration. Each
    // click emits AT MOST ONCE — on its first match the state store
    // marks it emitted, so a second in-window error produces no
    // duplicate — and never-matched clicks are silently dropped when
    // the watermark expires their buffered state (no NULL release).
    // Matches emit eagerly like the inner mode, so flush rows need not
    // enter the join; they would only drive state cleanup.
    QueryDef.sql(
      "ev100s_semi_join_stream",
      """WITH err AS (
        |  SELECT user_id, ts AS lo
        |  FROM events WHERE event_type = 'error'),
        |clk AS (
        |  SELECT user_id, event_id AS click_id, ts
        |  FROM events WHERE event_type = 'click')
        |SELECT c.user_id, c.click_id, c.ts
        |FROM clk c WHERE EXISTS (
        |  SELECT 1 FROM err e WHERE e.user_id = c.user_id
        |    AND c.ts >= e.lo AND c.ts < e.lo + INTERVAL 4 HOUR)""".stripMargin) { (s, d) =>
      staged(s, d, "ev100s_out")(src =>
        EventStreams.errorWindowJoin(
          src.filter(col("event_type") === "click"),
          src.filter(col("event_type") === "error"),
          windowMinutes = 240, joinType = "left_semi"))
    }
  )
}
