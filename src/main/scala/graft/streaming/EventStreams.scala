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

  /** Gap-based sessionization with typed state
    * (`mapGroupsWithState`-family): a session closes after `gapMinutes`
    * of inactivity per user. Event-time timeout keeps state bounded.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, incoming: Iterator[Event], state: GroupState[List[Event]]) =>
          if (state.hasTimedOut) {
            val evs = state.get
            state.remove()
            Iterator(toSession(userId, evs))
          } else {
            val all = (state.getOption.getOrElse(Nil) ++ incoming.toList).sortBy(_.ts.getTime)
            // close any sessions fully separated by the gap; retain the live tail
            val (closed, open) = splitSessions(all, gapMs)
            state.update(open)
            state.setTimeoutTimestamp(open.last.ts.getTime + gapMs)
            closed.map(evs => toSession(userId, evs)).iterator
          }
      }
  }

  private def splitSessions(sorted: List[Event], gapMs: Long): (List[List[Event]], List[Event]) = {
    val groups = sorted.foldLeft(List.empty[List[Event]]) {
      case (Nil, e) => List(List(e))
      case (cur :: done, e) if e.ts.getTime - cur.head.ts.getTime <= gapMs =>
        (e :: cur) :: done
      case (acc, e) => List(e) :: acc
    }.map(_.reverse).reverse
    (groups.init, groups.last)
  }

  private def toSession(userId: Long, evs: List[Event]): Session =
    Session(userId, evs.length.toLong, evs.head.ts, evs.last.ts, evs.map(_.value).sum)

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
}
