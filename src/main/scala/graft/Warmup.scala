package graft

import org.apache.spark.sql.SparkSession

/** Untimed session warmup shared by Bench and QueryTime.
  *
  * Two one-time costs would otherwise land on whichever query runs
  * first: parquet file-listing/footer reads (absorbed by the first
  * scan of each table) and the Structured Streaming machinery
  * (micro-batch execution classes, state-store provider init, sink
  * bookkeeping — ~3 s of JVM class loading absorbed by the first
  * ev*s query). Both are session start-up, not query work, so they
  * run here before the timed loop.
  */
object Warmup {

  def run(spark: SparkSession, sfDir: String, streaming: Boolean = true): Unit = {
    Tables.all.foreach { t =>
      // the typed accessor, not the generic loader: events.parquet needs
      // the nanos-as-long flag, so a generic read of it fails and the
      // table would silently stay cold
      try {
        val df = if (t == "events") Tables.events(spark, sfDir)
                 else Tables.load(spark, sfDir, t)
        df.count()
      } catch { case _: Throwable => () }
    }
    // storage-layout staging (bucketed catalog tables, partitioned
    // events) is corpus prep, not query work — run it untimed so
    // u13/u14's measured numbers are the read path only
    try queries.ScaleQueries.warmStaging(spark, sfDir)
    catch { case _: Throwable => () }
    // every other marker-keyed stageOnce artifact: CONSTRUCTING these
    // queries runs their staging block (the write happens at plan-build
    // time, before any action), so building and discarding the plan
    // pre-stages the artifact untimed. Only batch queries appear here —
    // a staged STREAMING query executes its whole job at construction,
    // which is the measured thing, so those stay out.
    stagedBatchQueries.foreach { name =>
      try SparkEntry.queries.get(name).foreach(fn => fn(spark, sfDir))
      catch { case _: Throwable => () }
    }
    // the near-dup pair table (shared by d6/d7/c3/er1) stages through a
    // helper, not at a single query's construction — warm it directly
    try queries.TextQueries.stagedNearDupPairs(spark, sfDir)
    catch { case _: Throwable => () }
    if (streaming) streamingEngine(spark)
  }

  /** Batch queries whose construction runs a Staging.stageOnce write
    * (grep: stageOnce call sites minus ScaleQueries, which warms via
    * warmStaging, minus streaming — a staged STREAMING query executes
    * its whole job at construction, so those stay out).
    */
  private val stagedBatchQueries = Seq(
    "j2_explode_child_table", // /tmp/graft_j2_nested
    "u7_merge_schema",        // /tmp/graft_u7_snapshots
    "u10_snapshot_diff",      // /tmp/graft_u10_snapshots
    "u12_incremental_agg",    // /tmp/graft_u12_agg
    "u17_ivm_join",           // /tmp/graft_u17_ivm
    "u49_ivm_distinct")       // /tmp/graft_u49_ivm

  /** One-row stateful streaming query over a FILE source — the exact
    * machinery the measured ev*s queries use (FileStreamSource log,
    * MicroBatchExecution, HDFS-backed state store, append-mode
    * watermark bookkeeping, memory sink) — so the first measured
    * streaming query pays only its own micro-batches.
    */
  private def streamingEngine(spark: SparkSession): Unit = {
    var dirs = Seq.empty[java.nio.file.Path]
    try {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.streaming.Trigger
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_warmup_src")
      val ckpt = java.nio.file.Files.createTempDirectory("graft_warmup_ckpt")
      val ckpt2 = java.nio.file.Files.createTempDirectory("graft_warmup_ckpt2")
      dirs = Seq(dir, ckpt, ckpt2)
      val one = Seq((java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 1L))
        .toDF("ts", "v")
      one.coalesce(1).write.mode("overwrite").parquet(dir.toString)
      val q = spark.readStream.schema(one.schema).parquet(dir.toString)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("v")).count()
        .writeStream.format("memory").queryName("graft_warmup_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // stream-stream join state machinery loads its own classes
      // (SymmetricHashJoinStateManager and friends) — boot those too
      val src = spark.readStream.schema(one.schema).parquet(dir.toString)
      val l = src.withWatermark("ts", "1 hour")
        .select(col("v").as("lv"), col("ts").as("lts"))
      val r = src.withWatermark("ts", "1 hour")
        .select(col("v").as("rv"), col("ts").as("rts"))
      val q2 = l.join(r,
          col("lv") === col("rv") && col("lts") >= col("rts") &&
            col("lts") < col("rts") + org.apache.spark.sql.functions.expr("INTERVAL 1 MINUTE"),
          "left_outer")
        .writeStream.format("memory").queryName("graft_warmup_join")
        .outputMode("append")
        .option("checkpointLocation", ckpt2.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q2.awaitTermination()
      // ev13s/ev15s run under the RocksDB state-store provider (the
      // transformWithState API requires it). The two warmups above
      // boot only the default HDFS-backed store, so the RocksDB
      // native-library + class loading would otherwise land on the
      // first timed transformWithState query. Re-run the tiny
      // stateful query with the provider switched, then restore it.
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(provKey)
      val ckpt3 = java.nio.file.Files.createTempDirectory("graft_warmup_ckpt3")
      dirs = dirs :+ ckpt3
      try {
        spark.conf.set(provKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val q3 = spark.readStream.schema(one.schema).parquet(dir.toString)
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("v")).count()
          .writeStream.format("memory").queryName("graft_warmup_rocksdb")
          .outputMode("append")
          .option("checkpointLocation", ckpt3.toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q3.awaitTermination()
      } finally {
        prev match {
          case Some(v) => spark.conf.set(provKey, v)
          case None => spark.conf.unset(provKey)
        }
      }
    } catch { case _: Throwable => () }
    finally {
      // leave nothing behind: drop the memory-sink tables and the temp dirs
      Seq("graft_warmup_stream", "graft_warmup_join", "graft_warmup_rocksdb")
        .foreach(t => try spark.catalog.dropTempView(t) catch { case _: Throwable => () })
      dirs.foreach { p =>
        try {
          val s = java.nio.file.Files.walk(p)
          try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => java.nio.file.Files.delete(f))
          finally s.close()
        } catch { case _: Throwable => () }
      }
    }
  }
}
