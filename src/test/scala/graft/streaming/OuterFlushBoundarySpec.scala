package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Pins OUTER stream-stream join NULL-pad flush timing — the fourth
  * member of the watermark-boundary family (SessionBoundarySpec,
  * WatermarkBoundarySpec, StreamJoinBoundarySpec). ev10s/ev20s' oracles
  * treat "unmatched" as a batch-side anti-join; streaming emits those
  * rows only on watermark advance, so the exact flush tick is the
  * semantic seam. Measured rules (0-second delay so arithmetic is
  * exact; condition `cts >= ets AND cts < ets + 10 min`, i.e. a click
  * matches errors in the 10 minutes at-or-before it):
  *
  *  1. STRICT FLUSH: an unmatched left row emits its NULL-padded row
  *     when the watermark passes STRICTLY above its event time
  *     (cts < wm); at wm == cts it is still held. Note the one-tick
  *     conservatism: by the admission rule (StreamJoinBoundarySpec
  *     rule 2, inputs admitted only at ts > wm) a matching error at
  *     wm == cts can no longer arrive — the row is provably
  *     unmatchable — but Spark's state eviction is `ts < stateWm`
  *     strict, so the pad waits for the next advance. Oracles built on
  *     "flush everything <= horizon" would be one tick early.
  *  2. MATCH SUPPRESSES PAD: a left row that joined eagerly never
  *     re-emits as a NULL pad when its state later expires.
  *  3. FLUSH IS EXACTLY-ONCE: subsequent watermark advances do not
  *     re-emit prior pads.
  */
class OuterFlushBoundarySpec extends SparkSpec {

  private val base = 1700000400000L
  private def ts(sec: Long): Timestamp = new Timestamp(base + sec * 1000L)

  test("left-outer flush: strict cts < wm; matched rows never pad; pads emit once") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val errors = MemoryStream[(Long, Long, Timestamp)]
    val c = clicks.toDF().toDF("user", "click_id", "cts").withWatermark("cts", "0 seconds")
    val e = errors.toDF().toDF("euser", "err_id", "ets").withWatermark("ets", "0 seconds")
    val joined = c.join(e,
      col("user") === col("euser") &&
        col("cts") >= col("ets") &&
        col("cts") < col("ets") + expr("interval 10 minutes"), "left_outer")
      .select(col("user"), col("click_id"), col("err_id"))

    val q = joined.writeStream.format("memory").queryName("ssj_outer_boundary")
      .outputMode(OutputMode.Append).start()
    def rows(): Set[(Long, Long, Any)] =
      spark.table("ssj_outer_boundary").collect().map(r =>
        (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2))).toSet
    try {
      // u1@100 never matches; u2@100 will match eagerly; 99@0 is the
      // early row whose pad proves flushing works at all.
      clicks.addData((1L, 11L, ts(100)), (2L, 21L, ts(100)), (99L, 91L, ts(0)))
      errors.addData((98L, 81L, ts(0)))
      q.processAllAvailable()
      assert(rows().isEmpty, s"nothing emits before any match or flush: ${rows()}")

      // batch 2 (wm = 0 during the batch): u2 matches eagerly; both
      // sides' max event time reaches 100, so the trailing no-data
      // batch runs the state machinery at wm = 100 — which flushes
      // 99@0 (0 < 100) but must HOLD u1@100 (equality).
      errors.addData((2L, 82L, ts(100)), (97L, 83L, ts(100)))
      clicks.addData((99L, 92L, ts(100)))
      q.processAllAvailable()
      assert(rows() == Set((2L, 21L, 82L), (99L, 91L, null)),
        s"eager match + pad for cts < wm only; wm == cts must hold: ${rows()}")

      // another batch at the same watermark: still held (rule 1).
      errors.addData((96L, 84L, ts(100)))
      q.processAllAvailable()
      assert(rows() == Set((2L, 21L, 82L), (99L, 91L, null)),
        s"wm unchanged, no new pads: ${rows()}")

      // advance both sides to 101 → wm = 101 > 100: u1@100 and the
      // 99@100 dummy click flush; u2@100 does NOT pad (rule 2).
      errors.addData((96L, 85L, ts(101)))
      clicks.addData((99L, 93L, ts(101)))
      q.processAllAvailable()
      assert(rows() == Set((2L, 21L, 82L), (99L, 91L, null),
        (99L, 92L, null), (1L, 11L, null)),
        s"strict flush at wm > cts, matched row never pads: ${rows()}")

      // advance again → no duplicates of earlier pads (rule 3), only
      // the 99@101 dummy's own pad joins the set.
      errors.addData((96L, 86L, ts(102)))
      clicks.addData((99L, 94L, ts(102)))
      q.processAllAvailable()
      assert(rows() == Set((2L, 21L, 82L), (99L, 91L, null),
        (99L, 92L, null), (1L, 11L, null), (99L, 93L, null)),
        s"pads are exactly-once across advances: ${rows()}")
    } finally q.stop()
  }
}
