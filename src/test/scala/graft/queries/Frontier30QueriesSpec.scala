package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the thirtieth frontier batch. */
class Frontier30QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("ev55 TWA sits inside the user's value range; durations span the user horizon") {
    val rows = run("ev55_time_weighted_avg").collect()
    assert(rows.nonEmpty)
    val ranges = graft.Tables.events(spark, sf("sf0.01"))
      .groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    rows.foreach { r =>
      val (lo, hi, span) = ranges(r.getLong(0))
      val twa = r.getDouble(3)
      assert(twa >= lo / 1.0 - 0.011 && twa <= hi + 0.011,
        s"user ${r.getLong(0)}: TWA $twa outside [$lo,$hi]")
      assert(r.getLong(2) == span, "total segment time must equal the user's event span")
    }
  }

  test("ev56 occupancy shares sum to 1 and cover every state with segments") {
    val rows = run("ev56_state_occupancy").collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
    val totalUs = rows.map(_.getLong(2)).sum
    val spanSum = graft.Tables.events(spark, sf("sf0.01"))
      .groupBy(col("user_id"))
      .agg((max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span"))
      .agg(sum(col("span"))).collect()(0).getLong(0)
    assert(totalUs == spanSum, "occupancy must conserve total user-time")
  }

  test("c31 epoch shuffles: different orders per epoch, stable on re-run") {
    val rows = run("c31_epoch_shuffle").collect().sortBy(_.getInt(0))
    assert(rows.length == 3)
    val nDocs = graft.Tables.documents(spark, sf("sf0.01")).count()
    rows.foreach(r => assert(r.getLong(1) == nDocs))
    // epochs produce genuinely different permutations
    val checksums = rows.map(_.getLong(2))
    assert(checksums.distinct.length == 3, "epoch salt must change the order")
    // deterministic across runs (ShardedRank boundaries pinned)
    val again = run("c31_epoch_shuffle").collect().sortBy(_.getInt(0)).map(_.getLong(2))
    assert(checksums.sameElements(again))
  }
}
