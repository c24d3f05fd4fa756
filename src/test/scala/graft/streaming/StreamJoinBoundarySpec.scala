package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Pins STREAM-STREAM RANGE-JOIN semantics at the exact watermark
  * boundary — the third member of the boundary family
  * (SessionBoundarySpec's gap rule, WatermarkBoundarySpec's `end <= wm`
  * window eviction). The staged join queries (ev4s/ev10s/ev20s and the
  * composed pipelines) run inner or outer joins with a range condition
  * `e.ts BETWEEN c.ts AND c.ts + horizon`; their oracles assume every
  * in-horizon pair is emitted exactly once, which holds as long as no
  * input arrives at-or-behind the watermark. The rules at the boundary,
  * measured empirically (0-second watermark delay, 10-minute horizon):
  *
  *  1. INCLUSIVE UPPER BOUND: a probe row at EXACTLY c.ts + horizon
  *     joins (BETWEEN keeps both endpoints through the streaming-state
  *     machinery, not just the batch expression).
  *  2. INPUT ADMISSION IS STRICTLY `ts > wm` — one tick STRICTER than
  *     the windowed-agg side, which admits ts == wm. A probe at
  *     exactly the watermark is dropped BEFORE the join even when a
  *     matching row is provably still buffered (verified against a
  *     left row whose horizon extends past the watermark). Spark drops
  *     any input that could only ever match state it is entitled to
  *     evict, and with a range condition that entitlement is computed
  *     from `ts <= wm`, not `ts < wm`.
  *  3. STATE WHOSE HORIZON IS STILL OPEN SURVIVES: a probe at ts > wm
  *     joins a left row buffered many batches earlier, as long as
  *     probe.ts is inside that row's horizon.
  *  4. Rule 2 is exactly what makes horizon-end eviction SAFE: a left
  *     row with cts + horizon <= wm is evictable because any probe
  *     that could still match it (ets <= cts + horizon <= wm) is
  *     late-dropped by rule 2 first. The two rules are one policy
  *     seen from both sides; neither can be loosened alone.
  *
  * The global watermark is min(left wm, right wm) — both sides carry
  * dummy keys to advance their side's watermark without touching the
  * pairs under test.
  */
class StreamJoinBoundarySpec extends SparkSpec {

  private val base = 1700000400000L
  private def ts(sec: Long): Timestamp = new Timestamp(base + sec * 1000L)

  test("range-join boundary: inclusive upper bound; ts<=wm late-dropped; open-horizon state survives") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Timestamp)]
    val errors = MemoryStream[(Long, Timestamp, Long)]

    val c = clicks.toDF().toDF("user", "cts").withWatermark("cts", "0 seconds")
    val e = errors.toDF().toDF("euser", "ets", "code").withWatermark("ets", "0 seconds")
    val joined = c.join(e,
      col("user") === col("euser") &&
        col("ets") >= col("cts") &&
        col("ets") <= col("cts") + expr("interval 10 minutes"))
      .select(col("user"), col("cts"), col("ets"), col("code"))

    val q = joined.writeStream.format("memory").queryName("ssj_boundary")
      .outputMode(OutputMode.Append).start()
    def rows(): Set[(Long, Long, Long, Long)] =
      spark.table("ssj_boundary").collect().map(r =>
        (r.getLong(0), (r.getTimestamp(1).getTime - base) / 1000,
          (r.getTimestamp(2).getTime - base) / 1000, r.getLong(3))).toSet
    try {
      // batch 1: two left rows under test — u1 @ 0 (horizon end 600)
      // and u2 @ 100 (horizon end 700) — plus dummies that will carry
      // each side's watermark. wm after batch: 0.
      clicks.addData((1L, ts(0)), (2L, ts(100)), (99L, ts(0)))
      errors.addData((98L, ts(0), 0L))
      q.processAllAvailable()
      assert(rows().isEmpty, s"nothing matches yet: ${rows()}")

      // batch 2 (runs with wm = 0): probe at EXACTLY cts + 600s.
      // Pins rule 1 — the inclusive upper endpoint joins.
      errors.addData((1L, ts(600), 7L))
      clicks.addData((99L, ts(600)))
      q.processAllAvailable()
      assert(rows() == Set((1L, 0L, 600L, 7L)),
        s"probe at exactly cts+horizon must join (BETWEEN inclusive): ${rows()}")

      // The no-data batch has advanced the global watermark to 600
      // (both sides saw ts 600). batch 3 runs with wm == 600: probes
      // at ts == wm against BOTH left rows. u2@100's horizon end (700)
      // is beyond the watermark, so its state is provably buffered —
      // yet neither probe joins: input admission is strictly ts > wm.
      // Pins rule 2 (and with it rule 4's eviction safety argument).
      errors.addData((1L, ts(600), 8L), (2L, ts(600), 10L))
      q.processAllAvailable()
      assert(rows() == Set((1L, 0L, 600L, 7L)),
        s"probe at ts == wm must be late-dropped even with live state: ${rows()}")

      // batch 4 (wm = 600): probe at 601 > wm, inside u2's horizon —
      // joins state buffered three batches earlier. Pins rule 3.
      errors.addData((2L, ts(601), 11L))
      q.processAllAvailable()
      assert(rows() == Set((1L, 0L, 600L, 7L), (2L, 100L, 601L, 11L)),
        s"ts > wm probe must join still-open buffered state: ${rows()}")

      // batch 5 (wm = 600): probe at 599 < wm — late a fortiori.
      errors.addData((2L, ts(599), 12L))
      q.processAllAvailable()
      assert(rows() == Set((1L, 0L, 600L, 7L), (2L, 100L, 601L, 11L)),
        s"ts < wm probe must be late-dropped: ${rows()}")
    } finally q.stop()
  }
}
