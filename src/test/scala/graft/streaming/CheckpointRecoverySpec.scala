package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import java.sql.Timestamp

/** Checkpoint recovery is the production semantics everything else
  * rides on: a 100 TB/day pipeline WILL lose a driver mid-batch, and
  * the contract is that restarting from the checkpoint yields exactly
  * the output an uninterrupted run would have produced — no lost
  * windows, no double-applied batches. This spec kills a stateful
  * windowed aggregation mid-stream (both before and after the sink
  * write — the latter is the hard half of exactly-once, where the
  * output exists but the commit log says it doesn't), resumes from
  * the same checkpoint, and asserts bit-equality with an
  * uninterrupted run and with the batch oracle.
  *
  * The state-recovery crux: the second window's events are split
  * across the pre-kill and post-kill micro-batches, so its count is
  * only reachable if the aggregation state store restores from the
  * checkpoint — losing state would undercount it, replaying from
  * offset 0 would overcount everything.
  */
class CheckpointRecoverySpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  // real events: the second window [22:20,22:30) is split across
  // f0 (event 3) and f1 (events 4, 5) — the batches on either side
  // of the kill — so its count is correct only with restored state
  private def events = {
    import spark.implicits._
    Seq(
      (1L, ts(1), 10L, 2.0),    // f0, window [22:10,22:20)
      (2L, ts(4), 20L, 3.0),    // f0, window [22:10,22:20)
      (3L, ts(12), 10L, 5.0),   // f0, window [22:20,22:30)
      (4L, ts(7), 30L, 7.0),    // f1, window [22:20,22:30)
      (5L, ts(15), 20L, 11.0))  // f1, window [22:20,22:30)
      .toDF("event_id", "ts", "user_id", "value")
  }

  private def flush(minute: Int) = {
    import spark.implicits._
    Seq((999L, ts(minute), 999L, 0.0))
      .toDF("event_id", "ts", "user_id", "value")
  }

  // no pre-agg filter: Catalyst pushes deterministic filters BELOW
  // withWatermark, which would drop the flush rows before they ever
  // advance the watermark (the sink-side-exclusion rule every ev*s
  // query follows) — flush windows are dropped in the merge instead
  private val transform: DataFrame => DataFrame = src =>
    src.withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).cast("double").as("total"))
      .select(col("w.start").as("win_start"), col("n"), col("total"))

  // insert-only union: the merge most sensitive to duplicate emission;
  // flush-row windows (far future) are excluded here, on materialized
  // micro-batch output, where a filter can't reach the streaming plan
  private val insertOnly = (current: Option[DataFrame], batch: DataFrame) => {
    val real = batch.filter(col("win_start") < ts(30))
    current.map(_.unionByName(real)).getOrElse(real)
  }

  // tumbling windows align to the epoch: starts 22:10:00 / 22:20:00
  private val w0 = new Timestamp(1699999800000L)
  private val w1 = new Timestamp(1700000400000L)
  private def expected: Set[(Timestamp, Long, Double)] =
    Set((w0, 2L, 5.0), (w1, 3L, 23.0))

  private def collect(df: DataFrame): Set[(Timestamp, Long, Double)] = {
    import spark.implicits._
    df.select("win_start", "n", "total").as[(Timestamp, Long, Double)]
      .collect().toSet
  }

  private def bulk = events.filter(col("event_id") <= 3)
  private def deltas = Seq(
    events.filter(col("event_id") > 3), // batch 1 — the kill point
    flush(60), flush(120))              // advance watermark, then emit

  /** Non-vacuity probe: delete the BULK input file after the kill, so a
    * run that silently restarted from offset 0 instead of resuming the
    * checkpoint CANNOT reproduce the expected output — batch 0's rows
    * are only reachable through the restored state store (its windows
    * are still unemitted at the kill: the watermark hasn't advanced).
    * Returns the pre-resume mtime of offsets/0 so callers can assert
    * the original offset log survived the resumed run untouched.
    */
  private def dropBulkFile(dir: String, name: String): java.nio.file.attribute.FileTime = {
    val f0 = java.nio.file.Paths.get(dir, "in", "f0.parquet")
    assert(java.nio.file.Files.deleteIfExists(f0), s"expected staged bulk at $f0")
    java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(dir, s"ckpt_$name", "offsets", "0"))
  }

  private def offsets0Mtime(dir: String, name: String): java.nio.file.attribute.FileTime =
    java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(dir, s"ckpt_$name", "offsets", "0"))

  test("kill before the sink write, resume from checkpoint") {
    val dir = "/tmp/graft_recovery_spec/before"
    val thrown = intercept[StreamingQueryException] {
      StreamStage.runRecoverableUpsert(spark, "rec_before", dir,
        bulk, deltas, shufflePartitions = Some(2),
        failAtBatch = Some(1L))(transform)(insertOnly)
    }
    assert(thrown.getMessage.contains("injected failure before batch 1"))
    val mtime0 = dropBulkFile(dir, "rec_before")
    val resumed = StreamStage.runRecoverableUpsert(spark, "rec_before", dir,
      bulk, deltas, shufflePartitions = Some(2),
      resume = true)(transform)(insertOnly)
    assert(collect(resumed) == expected)
    assert(offsets0Mtime(dir, "rec_before") == mtime0,
      "resume rewrote the pre-kill offset log — that's a fresh replay, not recovery")
  }

  test("kill after the sink write, resume replays idempotently") {
    val dir = "/tmp/graft_recovery_spec/after"
    val thrown = intercept[StreamingQueryException] {
      StreamStage.runRecoverableUpsert(spark, "rec_after", dir,
        bulk, deltas, shufflePartitions = Some(2),
        failAtBatch = Some(1L), failAfterWrite = true)(transform)(insertOnly)
    }
    assert(thrown.getMessage.contains("injected failure after writing batch 1"))
    // v2 exists on disk; the commit log says batch 1 never happened
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "tbl_rec_after", "v2")))
    val mtime0 = dropBulkFile(dir, "rec_after")
    val resumed = StreamStage.runRecoverableUpsert(spark, "rec_after", dir,
      bulk, deltas, shufflePartitions = Some(2),
      resume = true)(transform)(insertOnly)
    // insert-only merge: any double-application would double a count
    assert(collect(resumed) == expected)
    assert(offsets0Mtime(dir, "rec_after") == mtime0,
      "resume rewrote the pre-kill offset log — that's a fresh replay, not recovery")
  }

  test("session-window state restores across a kill under the RocksDB provider") {
    import spark.implicits._
    val rocksdb = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // user 10's session spans the kill (events in f0 AND f1, 8 min
    // apart under a 10-min gap): one merged session is only reachable
    // if the RocksDB store restores the open partial session
    val f0 = Seq((1L, ts(1), 10L, 1.0), (2L, ts(2), 20L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    val f1 = Seq((3L, ts(9), 10L, 1.0), (4L, ts(30), 20L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    val sessionize: DataFrame => DataFrame = src =>
      src.withWatermark("ts", "5 minutes")
        .groupBy(session_window(col("ts"), "10 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("win_start"), col("user_id"), col("n"))
    val sessMerge = (current: Option[DataFrame], batch: DataFrame) => {
      val real = batch.filter(col("win_start") < ts(60))
      current.map(_.unionByName(real)).getOrElse(real)
    }
    val dir = "/tmp/graft_recovery_spec/session"
    val thrown = intercept[StreamingQueryException] {
      StreamStage.runRecoverableUpsert(spark, "rec_sess", dir,
        f0, Seq(f1, flush(120), flush(240)), shufflePartitions = Some(2),
        failAtBatch = Some(1L), failAfterWrite = true,
        extraConfs = rocksdb)(sessionize)(sessMerge)
    }
    assert(thrown.getMessage.contains("injected failure after writing batch 1"))
    dropBulkFile(dir, "rec_sess") // user 10's partial session now lives ONLY in RocksDB state
    val resumed = StreamStage.runRecoverableUpsert(spark, "rec_sess", dir,
      f0, Seq(f1, flush(120), flush(240)), shufflePartitions = Some(2),
      resume = true, extraConfs = rocksdb)(sessionize)(sessMerge)
    val got = resumed.select("win_start", "user_id", "n")
      .as[(Timestamp, Long, Long)].collect().toSet
    assert(got == Set((ts(1), 10L, 2L), (ts(2), 20L, 1L), (ts(30), 20L, 1L)))
  }

  test("resume under a DIFFERENT session shuffle-partition count keeps the checkpointed layout") {
    // Operational pin: the state-store partition count is fixed at the
    // FIRST run (Spark records spark.sql.shuffle.partitions in the
    // checkpoint's offset log and restores it for stateful queries).
    // Resuming with a different session setting must neither rescale
    // state (which would orphan keys) nor change the output — the
    // "bigger cluster after a restart" scenario. Rescaling state
    // requires a NEW checkpoint (a fresh backfill), never a conf edit.
    val dir = "/tmp/graft_recovery_spec/rescale"
    val thrown = intercept[StreamingQueryException] {
      StreamStage.runRecoverableUpsert(spark, "rec_rescale", dir,
        bulk, deltas, shufflePartitions = Some(2),
        failAtBatch = Some(1L), failAfterWrite = true)(transform)(insertOnly)
    }
    assert(thrown.getMessage.contains("injected failure after writing batch 1"))
    dropBulkFile(dir, "rec_rescale")
    val resumed = StreamStage.runRecoverableUpsert(spark, "rec_rescale", dir,
      bulk, deltas, shufflePartitions = Some(7), // ignored: checkpoint wins
      resume = true)(transform)(insertOnly)
    assert(collect(resumed) == expected)
    // the state directory layout proves the checkpointed count was kept:
    // state/0/<partition> directories exist for 0 and 1 only, not 2..6
    val stateOp = java.nio.file.Paths.get(dir, "ckpt_rec_rescale", "state", "0")
    val parts = java.nio.file.Files.list(stateOp).toArray.map(_.toString)
      .map(p => p.substring(p.lastIndexOf('/') + 1))
      .filter(_.forall(_.isDigit)).map(_.toInt).sorted.toSeq
    assert(parts == Seq(0, 1), s"state partitions after resume-at-7: $parts")
    // and the offset log's recorded conf is the ORIGINAL 2, end to end
    val lastOffsets = java.nio.file.Files.list(
        java.nio.file.Paths.get(dir, "ckpt_rec_rescale", "offsets"))
      .toArray.map(_.toString).filter(p => p.substring(p.lastIndexOf('/') + 1).forall(_.isDigit))
      .sorted.last
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(lastOffsets))
    assert(txt.contains("\"spark.sql.shuffle.partitions\":\"2\""), txt)
  }

  test("uninterrupted run matches the recovered runs and the batch oracle") {
    val dir = "/tmp/graft_recovery_spec/clean"
    val clean = StreamStage.runRecoverableUpsert(spark, "rec_clean", dir,
      bulk, deltas, shufflePartitions = Some(2))(transform)(insertOnly)
    assert(collect(clean) == expected)
    // batch oracle over the same real events
    val oracle = events
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).cast("double").as("total"))
      .select(col("w.start").as("win_start"), col("n"), col("total"))
    assert(collect(oracle) == expected)
  }

  test("COMPOSED pipeline (enrich -> session window -> keep-latest upsert) recovers from a kill") {
    import spark.implicits._
    // the ev112s production shape under fault injection: a broadcast
    // dim enrich feeding a session-window aggregate feeding a
    // keep-latest merge. The hard case compounds: user 10's session
    // spans the kill (open RocksDB session state must restore), AND
    // the merge is keep-latest rather than insert-only, so a replayed
    // batch that misread the table version would resurrect a stale
    // "latest" row rather than just double a count.
    val rocksdb = Map(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val dim = Seq((10L, "A"), (20L, "B")).toDF("d_user", "segment")
    val f0 = Seq((1L, ts(1), 10L, 1.0), (2L, ts(2), 10L, 1.0), (3L, ts(3), 20L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    val f1 = Seq((4L, ts(9), 10L, 1.0), (5L, ts(30), 20L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    val compose: DataFrame => DataFrame = src =>
      src.withWatermark("ts", "5 minutes")
        .join(broadcast(dim), col("user_id") === col("d_user"))
        .groupBy(session_window(col("ts"), "10 minutes").as("w"),
          col("user_id"), col("segment"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("segment"),
          col("w.start").as("session_start"), col("n"))
    // keep the LATEST session per user (flush users never join the dim,
    // so no sink-side flush exclusion is even needed here)
    val keepLatest = (current: Option[DataFrame], batch: DataFrame) => {
      import org.apache.spark.sql.expressions.Window
      val all = current.map(_.unionByName(batch)).getOrElse(batch)
      val w = Window.partitionBy(col("user_id")).orderBy(col("session_start").desc)
      all.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
    }
    val expectedSess = Set(
      (10L, "A", ts(1), 3L),   // one session spanning the kill: events 1,2,4
      (20L, "B", ts(30), 1L))  // the LATER of user 20's two sessions

    val dir = "/tmp/graft_recovery_spec/composed"
    val thrown = intercept[StreamingQueryException] {
      StreamStage.runRecoverableUpsert(spark, "rec_comp", dir,
        f0, Seq(f1, flush(120), flush(240)), shufflePartitions = Some(2),
        failAtBatch = Some(1L), failAfterWrite = true,
        extraConfs = rocksdb)(compose)(keepLatest)
    }
    assert(thrown.getMessage.contains("injected failure after writing batch 1"))
    dropBulkFile(dir, "rec_comp") // the spanning session is only reachable via restored state
    val resumed = StreamStage.runRecoverableUpsert(spark, "rec_comp", dir,
      f0, Seq(f1, flush(120), flush(240)), shufflePartitions = Some(2),
      resume = true, extraConfs = rocksdb)(compose)(keepLatest)
    val got = resumed.select("user_id", "segment", "session_start", "n")
      .as[(Long, String, Timestamp, Long)].collect().toSet
    assert(got == expectedSess, s"recovered composed pipeline diverged: $got")

    // uninterrupted twin must agree bit-for-bit
    val clean = StreamStage.runRecoverableUpsert(spark, "rec_comp_clean",
      "/tmp/graft_recovery_spec/composed_clean",
      f0, Seq(f1, flush(120), flush(240)), shufflePartitions = Some(2),
      extraConfs = rocksdb)(compose)(keepLatest)
    val cleanGot = clean.select("user_id", "segment", "session_start", "n")
      .as[(Long, String, Timestamp, Long)].collect().toSet
    assert(cleanGot == got, s"clean=$cleanGot recovered=$got")
  }
}
