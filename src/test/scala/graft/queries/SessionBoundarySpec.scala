package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the session_window merge rule at the EXACT gap boundary.
  *
  * Spark merges two sessions when the new event's window start is
  * <= the current session's end (UpdatingSessionsIterator opens a new
  * session only when start > end). With a 30-minute gap, an event
  * arriving exactly 30 minutes after the previous one lands exactly ON
  * the session end — and therefore MERGES. The ev12/ev12s oracles must
  * use the strict rule (gap > 30 min opens a session), not >=, or any
  * corpus containing an exact-gap pair would falsely flag Spark.
  */
class SessionBoundarySpec extends SparkSpec {

  import spark.implicits._

  private def sessions(times: Seq[String]) = {
    val df = times.map(t => (1L, java.sql.Timestamp.valueOf(t))).toDF("user_id", "ts")
    df.groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("string").as("start"),
        col("w.end").cast("string").as("end"), col("n"))
      .collect().sortBy(_.getString(0)).toSeq
  }

  test("events exactly 30 minutes apart merge into ONE session") {
    val rows = sessions(Seq("2024-01-01 10:00:00", "2024-01-01 10:30:00"))
    assert(rows.length == 1, s"expected one merged session, got $rows")
    assert(rows.head == Row("2024-01-01 10:00:00", "2024-01-01 11:00:00", 2L))
  }

  test("events one microsecond past the gap split into TWO sessions") {
    val rows = sessions(Seq("2024-01-01 10:00:00", "2024-01-01 10:30:00.000001"))
    assert(rows.length == 2, s"expected two sessions, got $rows")
    assert(rows.map(_.getLong(2)) == Seq(1L, 1L))
  }

  test("oracle strict-gap rule reproduces the exact-boundary merge") {
    // The DuckDB oracle in ev12/ev12s opens a new session iff
    // epoch_us(ts) - epoch_us(prev) > 1_800_000_000. Evaluate that
    // rule in Spark over the boundary fixture and check it yields the
    // same session count as the native operator on both sides of it.
    def oracleSessions(times: Seq[String]): Long = {
      val df = times.map(t => (1L, java.sql.Timestamp.valueOf(t))).toDF("user_id", "ts")
      df.selectExpr("user_id", "ts",
          "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts")
        .selectExpr("user_id",
          "CASE WHEN prev_ts IS NULL OR unix_micros(ts) - unix_micros(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS ns")
        .agg(sum("ns")).as[Long].head()
    }
    val atGap = Seq("2024-01-01 10:00:00", "2024-01-01 10:30:00")
    val pastGap = Seq("2024-01-01 10:00:00", "2024-01-01 10:30:00.000001")
    assert(oracleSessions(atGap) == sessions(atGap).length.toLong)
    assert(oracleSessions(pastGap) == sessions(pastGap).length.toLong)
  }
}
