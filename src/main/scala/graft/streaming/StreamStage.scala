package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Path, Paths}

/** Drives a Structured Streaming transform over a STAGED file source so
  * the result is a plain DataFrame the correctness harness can compare
  * against a batch oracle — the actual watermark / stateful code runs,
  * not its batch twin.
  *
  * Batch layout (admission-controlled with `maxFilesPerTrigger = 1`):
  *   batch 1   one bulk file — every real event. Nothing is late
  *             (the watermark is unset during the first batch), so
  *             stream results can equal batch results exactly.
  *   batch 2+  one single-row "flush" file per batch, with event times
  *             far past the real data. Each flush batch first advances
  *             the watermark, and the NEXT batch emits windows/sessions
  *             the new watermark closed — hence two flushes: one to
  *             advance, one to trigger emission of everything real.
  * File order is forced twice over (names f0<f1<f2 AND stepped mtimes)
  * so either FileStreamSource ordering policy yields the same batches.
  */
object StreamStage {

  /** Bench-local defaults for staged streaming runs (r5 optimization).
    *
    * `benchParts`: state/shuffle partition count for the staged
    * queries. One state-store instance is loaded and committed per
    * shuffle partition PER MICRO-BATCH (fixed cost), but the bulk
    * micro-batch carries the whole staged corpus (real work that
    * wants parallelism). Measured at sf0.1 over all 24 queries ×3
    * runs: 1 partition is ~15% SLOWER than 8 (the 3-row StreamFloor
    * hides the bulk batch) and 8 ≈ the optimum; outputs are
    * spec-pinned bit-identical across partition counts. A cluster run
    * sizes this to the key space — override with GRAFT_STREAM_PARTS.
    *
    * `stageRoot`: staged source + checkpoint scaffolding. The bench
    * host's /tmp is a real disk; scaffolding defaults to tmpfs
    * (/dev/shm) when present (measured ≈ neutral — fsync is not the
    * floor — but it keeps bench scaffolding off the data disk).
    * Production checkpoints live on durable storage — set
    * GRAFT_STREAM_DURABLE=1 to force the on-disk path.
    */
  def benchParts: Int =
    sys.env.get("GRAFT_STREAM_PARTS").map(_.toInt).getOrElse(8)

  def stageRoot: String =
    if (!sys.env.get("GRAFT_STREAM_DURABLE").contains("1") &&
        new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_stream_stage"
    else "/tmp/graft_stream_stage"

  def run(spark: SparkSession, name: String, stageDir: String,
          bulk: DataFrame, flushes: Seq[DataFrame],
          shufflePartitions: Option[Int] = None,
          reuseKey: Option[String] = None,
          extraConfs: Map[String, String] = Map.empty,
          outputMode: String = "append")
         (transform: DataFrame => DataFrame): DataFrame = {
    val inDir = ensureStaged(stageDir, bulk, flushes, reuseKey)
    // the checkpoint is per-query and always fresh (a reused one would
    // make AvailableNow skip the staged files as already-processed)
    val ckptDir = Paths.get(stageDir, s"ckpt_$name")
    deleteRecursively(ckptDir)

    val schema = spark.read.parquet(inDir.toString).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir.toString)
    // every stateful operator keeps one state-store instance per
    // shuffle partition PER MICRO-BATCH — on a staged local run that
    // fixed cost dwarfs the data, so callers may bound it (a cluster
    // run sizes it to the key space instead)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    shufflePartitions.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    // per-run session confs (e.g. the RocksDB state store provider
    // transformWithState requires), restored afterwards
    val beforeExtra = extraConfs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    extraConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = transform(src).writeStream
        .format("memory").queryName(name)
        .outputMode(outputMode)
        .option("checkpointLocation", ckptDir.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", before)
      beforeExtra.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    spark.table(name)
  }

  /** Drives a `foreachBatch` MERGE over the staged source — the
    * streaming-CDC-apply pattern: each micro-batch is merged into a
    * versioned keyed table (read current → merge → write next version
    * → publish), exactly the maintenance loop a Delta/Iceberg MERGE
    * runs at scale, with parquet version directories standing in for
    * the table format's transaction log. The merge function MUST be
    * associative in the batch dimension (merge(merge(t,a),b) ==
    * merge(t, a∪b)) so the result is independent of micro-batch
    * boundaries — which is what lets a batch oracle check it.
    * Returns the final published table version.
    */
  def runUpsert(spark: SparkSession, name: String, stageDir: String,
                bulk: DataFrame, deltas: Seq[DataFrame],
                reuseKey: Option[String] = None)
               (merge: (Option[DataFrame], DataFrame) => DataFrame): DataFrame = {
    val inDir = ensureStaged(stageDir, bulk, deltas, reuseKey)
    val ckptDir = Paths.get(stageDir, s"ckpt_$name")
    deleteRecursively(ckptDir)
    val tblRoot = Paths.get(stageDir, s"tbl_$name")
    deleteRecursively(tblRoot)

    val schema = spark.read.parquet(inDir.toString).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir.toString)
    val version = new java.util.concurrent.atomic.AtomicInteger(0)
    val applyBatch = (batch: DataFrame, _: Long) => {
      val cur = version.get()
      val current =
        if (cur == 0) None
        else Some(spark.read.parquet(tblRoot.resolve(s"v$cur").toString))
      merge(current, batch).write.mode("overwrite")
        .parquet(tblRoot.resolve(s"v${cur + 1}").toString)
      version.incrementAndGet()
      ()
    }
    val q = src.writeStream
      .foreachBatch(applyBatch)
      .option("checkpointLocation", ckptDir.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(tblRoot.resolve(s"v${version.get()}").toString)
  }

  /** Drives a STATEFUL transform into a `foreachBatch` MERGE sink —
    * the composed pipeline shape a real deployment runs (enrich →
    * session window → upsert), where the merge consumes the
    * transform's append-mode emissions rather than raw source rows
    * (which is what [[runUpsert]] does). Same staged-source mechanics
    * as [[run]] (bulk + flush files, one per micro-batch); the merge
    * function must be associative across batch boundaries so the
    * final table is independent of how the watermark slices the
    * emissions into micro-batches.
    */
  def runTransformUpsert(spark: SparkSession, name: String, stageDir: String,
                         bulk: DataFrame, flushes: Seq[DataFrame],
                         shufflePartitions: Option[Int] = None,
                         reuseKey: Option[String] = None)
                        (transform: DataFrame => DataFrame)
                        (merge: (Option[DataFrame], DataFrame) => DataFrame): DataFrame = {
    val inDir = ensureStaged(stageDir, bulk, flushes, reuseKey)
    val ckptDir = Paths.get(stageDir, s"ckpt_$name")
    deleteRecursively(ckptDir)
    val tblRoot = Paths.get(stageDir, s"tbl_$name")
    deleteRecursively(tblRoot)

    val schema = spark.read.parquet(inDir.toString).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir.toString)
    val version = new java.util.concurrent.atomic.AtomicInteger(0)
    val applyBatch = (batch: DataFrame, _: Long) => {
      val cur = version.get()
      val current =
        if (cur == 0) None
        else Some(spark.read.parquet(tblRoot.resolve(s"v$cur").toString))
      merge(current, batch).write.mode("overwrite")
        .parquet(tblRoot.resolve(s"v${cur + 1}").toString)
      version.incrementAndGet()
      ()
    }
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    shufflePartitions.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    try {
      val q = transform(src).writeStream
        .foreachBatch(applyBatch)
        .option("checkpointLocation", ckptDir.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", before)
    }
    spark.read.parquet(tblRoot.resolve(s"v${version.get()}").toString)
  }

  /** The RECOVERABLE twin of [[runTransformUpsert]]: version
    * directories are keyed by Spark's own BATCH ID instead of a
    * driver-local counter, which is the textbook exactly-once
    * `foreachBatch` contract — batch B reads `v{B}` (the state every
    * application of batch B−1 left behind) and overwrites `v{B+1}`,
    * so replaying an uncommitted batch after a crash re-derives the
    * same output instead of double-applying it. That makes the sink
    * safe to resume from the streaming checkpoint: source offsets,
    * the watermark, and the aggregation state store all restore from
    * `ckpt_<name>`, and the table picks up at the version the last
    * COMMITTED batch published.
    *
    * Fault injection (spec hook): `failAtBatch` throws inside
    * `foreachBatch` at that batch id — with `failAfterWrite=false`
    * before anything is read or written (clean replay), with `true`
    * after `v{B+1}` is fully written but before the batch commits
    * (the hard case: output exists, the commit log says it doesn't,
    * and only idempotent keying saves the replay).
    *
    * `resume = true` keeps the checkpoint and table versions from a
    * previous (failed) invocation instead of starting fresh.
    */
  def runRecoverableUpsert(spark: SparkSession, name: String, stageDir: String,
                           bulk: DataFrame, flushes: Seq[DataFrame],
                           shufflePartitions: Option[Int] = None,
                           reuseKey: Option[String] = None,
                           resume: Boolean = false,
                           failAtBatch: Option[Long] = None,
                           failAfterWrite: Boolean = false,
                           extraConfs: Map[String, String] = Map.empty)
                          (transform: DataFrame => DataFrame)
                          (merge: (Option[DataFrame], DataFrame) => DataFrame): DataFrame = {
    // resume MUST NOT touch the staged layout: ensureStaged without a
    // matching reuse key wipes the whole stage dir — checkpoint and
    // table versions included — which would turn "resume from the
    // checkpoint" into a silent fresh replay (exactly the failure the
    // recovery specs exist to rule out; they prove non-vacuity by
    // deleting the bulk input file before resuming)
    val inDir =
      if (resume) {
        val d = Paths.get(stageDir, "in")
        require(Files.exists(d), s"resume=true but no staged input at $d")
        d
      } else ensureStaged(stageDir, bulk, flushes, reuseKey)
    val ckptDir = Paths.get(stageDir, s"ckpt_$name")
    val tblRoot = Paths.get(stageDir, s"tbl_$name")
    if (!resume) { deleteRecursively(ckptDir); deleteRecursively(tblRoot) }
    Files.createDirectories(tblRoot)

    val schema = spark.read.parquet(inDir.toString).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir.toString)
    val applyBatch = (batch: DataFrame, batchId: Long) => {
      if (failAtBatch.contains(batchId) && !failAfterWrite)
        throw new RuntimeException(s"injected failure before batch $batchId")
      val current =
        if (batchId == 0L) None
        else Some(spark.read.parquet(tblRoot.resolve(s"v$batchId").toString))
      merge(current, batch).write.mode("overwrite")
        .parquet(tblRoot.resolve(s"v${batchId + 1}").toString)
      if (failAtBatch.contains(batchId) && failAfterWrite)
        throw new RuntimeException(s"injected failure after writing batch $batchId")
      ()
    }
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    shufflePartitions.foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    val beforeExtra = extraConfs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    extraConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = transform(src).writeStream
        .foreachBatch(applyBatch)
        .option("checkpointLocation", ckptDir.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", before)
      beforeExtra.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    spark.read.parquet(tblRoot.resolve(s"v${latestVersion(tblRoot)}").toString)
  }

  /** Highest committed version under a batchId-keyed table root. */
  def latestVersion(tblRoot: Path): Long = {
    val names = listDir(tblRoot).map(_.getFileName.toString)
    names.collect { case n if n.startsWith("v") => n.drop(1).toLong }.max
  }

  /** Stage bulk + follow-up files as an admission-controlled file
    * source (one file per micro-batch), reused across queries via the
    * caller's source-version key.
    */
  private def ensureStaged(stageDir: String, bulk: DataFrame,
                           followUps: Seq[DataFrame],
                           reuseKey: Option[String]): Path = {
    val inDir = Paths.get(stageDir, "in")
    val marker = Paths.get(stageDir, "_STAGED_OK")
    // multiple queries over the same source share one staged input;
    // the caller's key must change when the source does (e.g. source
    // file mtimes), so a regenerated corpus re-stages
    val reusable = reuseKey.exists(k =>
      Files.exists(marker) && Files.readString(marker) == k)
    if (!reusable) {
      deleteRecursively(Paths.get(stageDir))
      bulk.coalesce(1).write.parquet(inDir.toString)
      renameParts(inDir, known = Set.empty, to = "f0.parquet")
      followUps.zipWithIndex.foldLeft(Set("f0.parquet")) { case (known, (f, i)) =>
        f.coalesce(1).write.mode("append").parquet(inDir.toString)
        known + renameParts(inDir, known, s"f${i + 1}.parquet")
      }
      val t0 = System.currentTimeMillis() - 3600000L
      (0 to followUps.length).foreach { i =>
        Files.setLastModifiedTime(inDir.resolve(s"f$i.parquet"),
          java.nio.file.attribute.FileTime.fromMillis(t0 + i * 60000L))
      }
      reuseKey.foreach(k => Files.writeString(marker, k))
    }
    inDir
  }

  /** Rename the just-written part file to a stable ordered name. */
  private def renameParts(dir: Path, known: Set[String], to: String): String = {
    val added = listDir(dir).filter { p =>
      val n = p.getFileName.toString
      n.startsWith("part-") && n.endsWith(".parquet") && !known(n)
    }
    require(added.length == 1, s"expected one new part file, got ${added.length}")
    Files.move(added.head, dir.resolve(to))
    to
  }

  /** `Files.list` with the stream closed (it holds a directory fd). */
  private def listDir(dir: Path): Array[Path] = {
    val s = Files.list(dir)
    try s.toArray.map(_.asInstanceOf[Path]) finally s.close()
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally s.close()
    }
}
