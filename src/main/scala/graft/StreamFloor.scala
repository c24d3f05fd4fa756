package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: pins the fixed cost of one staged streaming run — the
  * micro-batch machinery floor that no data-size optimization can cut.
  * Runs the SAME tiny (3-row) windowed aggregation through the
  * StreamStage harness N times after a full warmup; the steady-state
  * per-run time IS the harness floor (query start/stop, per-batch
  * re-planning, offset/commit WAL, state-store instances, progress).
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // per-batch timing breakdown (batchId -> durationMs map) when FLOOR_PROGRESS=1
    if (sys.env.get("FLOOR_PROGRESS").contains("1"))
      spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          println(s"[floor-batch] id=${e.progress.batchId} rows=${e.progress.numInputRows} " +
            new java.util.TreeMap[String, java.lang.Long](e.progress.durationMs))
      })
    Warmup.run(spark, "/root/testdata/sf0.001")
    val bulk = Seq(
      (java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 1L),
      (java.sql.Timestamp.valueOf("2020-01-01 00:10:00"), 2L),
      (java.sql.Timestamp.valueOf("2020-01-01 01:10:00"), 1L)).toDF("ts", "v")
    val flush = Seq((java.sql.Timestamp.valueOf("2100-01-01 00:00:00"), -1L)).toDF("ts", "v")
    (1 to n).foreach { i =>
      val dir = "/tmp/graft_stream_floor/shared"
      val t0 = System.nanoTime()
      val out = graft.streaming.StreamStage.run(spark, s"floor$i", dir, bulk, Seq(flush),
        shufflePartitions = Some(sys.env.getOrElse("FLOOR_PARTS","8").toInt), reuseKey = Some("floor")) { src =>
        src.withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour"), col("v")).count()
      }
      val cnt = out.count()
      println(f"[floor] run$i ${(System.nanoTime() - t0) / 1e9}%6.2f s rows=$cnt")
    }
    spark.stop()
  }
}
