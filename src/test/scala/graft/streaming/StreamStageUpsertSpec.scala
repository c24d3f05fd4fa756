package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The property that makes ev21s's batch oracle valid: the foreachBatch
  * MERGE result must not depend on micro-batch boundaries (keep-latest
  * is associative), and each micro-batch must publish a new table
  * version.
  */
class StreamStageUpsertSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  private val keepLatest = (current: Option[DataFrame], batch: DataFrame) => {
    val all = current.map(_.unionByName(batch)).getOrElse(batch)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    all.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  test("runUpsert result is independent of micro-batch boundaries") {
    import spark.implicits._
    val events = Seq(
      (1L, ts(0), 10L, "a", 1.0),
      (2L, ts(5), 10L, "b", 2.0),   // later ts wins for user 10
      (3L, ts(3), 20L, "a", 3.0),
      (4L, ts(3), 20L, "b", 4.0),   // same ts: higher event_id wins
      (5L, ts(9), 30L, "c", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")

    def result(dir: String, bulk: DataFrame, deltas: Seq[DataFrame]): Set[(Long, Long)] =
      StreamStage.runUpsert(spark, s"upsert_spec_${dir.hashCode.abs}",
          s"/tmp/graft_upsert_spec/$dir", bulk, deltas)(keepLatest)
        .select("user_id", "event_id")
        .as[(Long, Long)].collect().toSet

    val oneBatch = result("one", events, Seq.empty)
    val threeBatches = result("three",
      events.filter(col("event_id") <= 2),
      Seq(events.filter(col("event_id") === 3 || col("event_id") === 4),
        events.filter(col("event_id") === 5)))

    val expected = Set((10L, 2L), (20L, 4L), (30L, 5L))
    assert(oneBatch == expected)
    assert(threeBatches == expected)
    // three micro-batches published three table versions
    assert(new java.io.File("/tmp/graft_upsert_spec/three")
      .listFiles.map(_.getName).count(_.startsWith("tbl_")) == 1)
    assert(new java.io.File(
      s"/tmp/graft_upsert_spec/three/tbl_upsert_spec_${"three".hashCode.abs}")
      .listFiles.map(_.getName).count(_.startsWith("v")) == 3)
  }
}
