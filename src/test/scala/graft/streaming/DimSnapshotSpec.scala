package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException}

/** Pins the STREAM-STATIC enrich dimension-refresh semantics — the
  * operational seam of [[graft.streaming.EventStreams.enrichWithDim]].
  * The static side is re-PLANNED per micro-batch, but its FILE LISTING
  * is resolved once at query start, so "just rewrite the dim parquet
  * under the running stream" does something worse than either staleness
  * or freshness:
  *
  *  1. APPENDED dim files are INVISIBLE to a running stream — the
  *     listing snapshot keeps serving exactly the query-start file
  *     set; new keys silently miss. No error, no refresh.
  *  2. An in-place OVERWRITE (which deletes the listed files) KILLS
  *     the stream: FAILED_READ_FILE.FILE_NOT_EXIST on the next
  *     micro-batch. Not stale data — an outage.
  *
  * Operational consequence, pinned here so nobody re-learns it in
  * production: refreshing a broadcast dim requires (a) restarting the
  * query (checkpoint makes that cheap and exactly-once), (b) writing
  * dim versions to NEW directories and restarting onto the new path,
  * or (c) modeling the dim as a time-versioned STREAM and using the
  * AS-OF enrich (`streamAsofEnrich`), which is what the engine's
  * SCD-style queries do.
  */
class DimSnapshotSpec extends SparkSpec {

  test("appended dim files are invisible to a running stream (listing snapshot)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dim-append").toFile.getPath
    Seq((1L, "OLD")).toDF("k", "v").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val src = MemoryStream[Long]
    val out = src.toDF().toDF("k2").join(dim, col("k2") === col("k"))
      .select(col("k2"), col("v"))
    val q = out.writeStream.format("memory").queryName("dim_append")
      .outputMode(OutputMode.Append).start()
    def rows(): Set[(Long, String)] =
      spark.table("dim_append").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    try {
      src.addData(1L)
      q.processAllAvailable()
      assert(rows() == Set((1L, "OLD")))
      // append a NEW file with key 2 — the running stream's listing
      // snapshot predates it
      Seq((2L, "NEW")).toDF("k", "v").write.mode("append").parquet(dimDir)
      src.addData(1L, 2L)
      q.processAllAvailable()
      assert(rows() == Set((1L, "OLD")),
        s"appended dim rows must be invisible to the listing snapshot: ${rows()}")
    } finally q.stop()

    // a FRESH query (restart) sees the appended rows — the refresh
    // pattern is restart-onto-checkpoint, not in-place mutation
    val dim2 = spark.read.parquet(dimDir)
    val src2 = MemoryStream[Long]
    val out2 = src2.toDF().toDF("k2").join(dim2, col("k2") === col("k"))
      .select(col("k2"), col("v"))
    val q2 = out2.writeStream.format("memory").queryName("dim_append2")
      .outputMode(OutputMode.Append).start()
    try {
      src2.addData(1L, 2L)
      q2.processAllAvailable()
      val got = spark.table("dim_append2").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "OLD"), (2L, "NEW")), got.toString)
    } finally q2.stop()
  }

  test("in-place dim overwrite kills the running stream (outage, not staleness)") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dim-ow").toFile.getPath
    Seq((1L, "OLD")).toDF("k", "v").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val src = MemoryStream[Long]
    val out = src.toDF().toDF("k2").join(dim, col("k2") === col("k"))
      .select(col("k2"), col("v"))
    val q = out.writeStream.format("memory").queryName("dim_overwrite")
      .outputMode(OutputMode.Append).start()
    try {
      src.addData(1L)
      q.processAllAvailable()
      // overwrite deletes the files the running plan's listing holds
      Seq((1L, "NEW")).toDF("k", "v").write.mode("overwrite").parquet(dimDir)
      src.addData(1L)
      val thrown = intercept[StreamingQueryException] { q.processAllAvailable() }
      assert(thrown.getMessage.contains("FILE_NOT_EXIST")
        || thrown.getMessage.contains("FAILED_READ_FILE"),
        s"expected FAILED_READ_FILE, got: ${thrown.getMessage.take(200)}")
    } finally q.stop()
  }
}
