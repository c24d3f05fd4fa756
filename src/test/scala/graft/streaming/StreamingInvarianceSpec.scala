package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming twin of the batch partitioning-invariance sweep: the
  * number of state-store instances (= shuffle partitions) is a
  * cluster-layout choice, and results must not depend on it. Each
  * stateful shape — windowed aggregation, flatMapGroupsWithState
  * sessionization, transformWithState running counts (RocksDB) — is
  * run over the real sf0.001 events at 1 shuffle partition (all keys
  * in one state store) and at 7 (keys scattered), and the outputs
  * must be identical sets.
  */
class StreamingInvarianceSpec extends SparkSpec {

  private val FlushType = "__flush__"

  private def flushRow(id: Long, iso: String): DataFrame = {
    import spark.implicits._
    Seq(EventStreams.Event(id, Timestamp.valueOf(iso), -1L, FlushType, 0.0, "{}"))
      .toDF()
  }

  private def bulk: DataFrame =
    Tables.events(spark, sf())
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .unionByName(flushRow(-1L, "2100-01-01 00:00:00"))

  private def run(name: String, parts: Int,
                  extraConfs: Map[String, String] = Map.empty)
                 (transform: DataFrame => DataFrame): Set[Row] =
    StreamStage.run(spark, s"${name}_p$parts",
      s"/tmp/graft_stream_invariance/${name}_p$parts", bulk,
      Seq(flushRow(-2L, "2100-02-01 00:00:00")),
      shufflePartitions = Some(parts),
      extraConfs = extraConfs)(transform)
      .filter(col("user_id").isNull || col("user_id") >= 0)
      .collect().toSet

  private def invariant(name: String,
                        extraConfs: Map[String, String] = Map.empty)
                       (transform: DataFrame => DataFrame): Unit = {
    val one = run(name, 1, extraConfs)(transform)
    val seven = run(name, 7, extraConfs)(transform)
    assert(one.nonEmpty, s"$name produced no rows")
    assert(one == seven,
      s"$name differs between 1 and 7 shuffle partitions: " +
        s"only@1=${(one -- seven).take(3)} only@7=${(seven -- one).take(3)}")
  }

  test("windowed aggregation is shuffle-partition invariant") {
    invariant("inv_rollup") { src =>
      // hourlyRollup has no user_id column; tag one in for the shared
      // flush filter (flush windows carry only the flush event type)
      EventStreams.hourlyRollup(src)
        .withColumn("user_id", when(col("event_type") === FlushType, -1L)
          .otherwise(0L))
    }
  }

  test("flatMapGroupsWithState sessionization is shuffle-partition invariant") {
    invariant("inv_sessionize") { src =>
      import spark.implicits._
      EventStreams.sessionize(src.as[EventStreams.Event], 30).toDF()
    }
  }

  test("transformWithState running counts are shuffle-partition invariant (RocksDB)") {
    val rocksdb = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    invariant("inv_running", rocksdb) { src =>
      import spark.implicits._
      EventStreams.runningCounts(src.as[EventStreams.Event]).toDF()
    }
  }
}
