package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import EventStreams._

  private def ts(minute: Int): Timestamp = new Timestamp(1700000000000L + minute * 60000L)

  test("hourlyRollup over a MemoryStream matches the batch twin") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0, "{}"),
      Event(2, ts(10), 2, "click", 2.0, "{}"),
      Event(3, ts(65), 1, "view", 3.0, "{}"),
      Event(4, ts(70), 2, "click", 4.0, "{}"))

    val mem = MemoryStream[Event]
    val q = hourlyRollup(mem.toDF())
      .writeStream.format("memory").queryName("rollup_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(events: _*)
    q.processAllAvailable()
    // watermark advances with data; emit final windows by adding a far-future event
    mem.addData(Event(99, ts(600), 9, "late", 0.0, "{}"))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("rollup_out")
      .select("hour_bucket", "event_type", "n", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = hourlyRollup(events.toDF())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(batch.subsetOf(streamed ++ batch) && streamed.intersect(batch).nonEmpty)
    assert(streamed.exists(_._2 == "click"))
  }

  test("chainedRollup runs TWO stateful operators and matches the batch twin") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.5, "{}"),   // hour 0, bucket 0
      Event(2, ts(3), 2, "click", 2.25, "{}"),  // hour 0, bucket 0
      Event(3, ts(17), 1, "click", 4.0, "{}"),  // hour 0, bucket 3
      Event(4, ts(65), 2, "view", 8.0, "{}"),   // hour 1
      Event(5, ts(70), 1, "click", 16.0, "{}")) // hour 1

    val mem = MemoryStream[Event]
    val q = chainedRollup(mem.toDF())
      .writeStream.format("memory").queryName("chained_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(events: _*)
    q.processAllAvailable()
    mem.addData(Event(99, ts(600), 9, "flush", 0.0, "{}"))
    q.processAllAvailable()
    val progress = q.lastProgress
    q.stop()

    // the pipeline must hold BOTH aggregation state stores
    assert(progress.stateOperators.length == 2,
      progress.stateOperators.map(_.operatorName).mkString(","))

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))
    val streamed = spark.table("chained_out")
      .filter($"event_type" =!= "flush").collect().map(key).toSet
    val batch = chainedRollup(events.toDF()).collect().map(key).toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    // 5-min pre-agg really fed the hour: the click hour holds 3 events
    // spread over 3 distinct buckets (n_buckets would be meaningless
    // if the outer agg saw raw events instead of inner windows)
    assert(batch.exists(r => r._2 == "click" && r._3 == 3L && r._4 == 3L))
  }

  test("stream-static enrichWithDim matches the batch join and keeps no state") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0, "{}"),
      Event(2, ts(1), 2, "view", 2.0, "{}"),
      Event(3, ts(2), 3, "click", 3.0, "{}"), // user 3 not in dim → dropped
      Event(4, ts(3), 1, "purchase", 4.0, "{}"))
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("uid", "tier")

    val mem = MemoryStream[Event]
    val q = enrichWithDim(mem.toDF(), dim, "user_id", "uid")
      .select($"event_id", $"tier")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(events: _*)
    q.processAllAvailable()
    val progress = q.lastProgress
    q.stop()

    val streamed = spark.table("enrich_out")
      .as[(Long, String)].collect().toSet
    val batch = enrichWithDim(events.toDF(), dim, "user_id", "uid")
      .select($"event_id", $"tier").as[(Long, String)].collect().toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, "gold"), (2L, "basic"), (4L, "gold")))
    // no stateful operator: the join buffers nothing between batches
    assert(progress == null || progress.stateOperators.isEmpty)
  }

  test("stream-stream errorWindowJoin matches the batch twin") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = Seq(
      Event(10, ts(1), 1, "click", 0, "{}"),   // inside err@0 window
      Event(11, ts(40), 1, "click", 0, "{}"),  // outside (30-min window)
      Event(12, ts(1), 2, "click", 0, "{}"))   // other user: no error
    val errors = Seq(Event(90, ts(0), 1, "error", 0, "{}"))

    val cm = MemoryStream[Event]; val em = MemoryStream[Event]
    val q = EventStreams.errorWindowJoin(cm.toDF(), em.toDF(), windowMinutes = 30)
      .writeStream.format("memory").queryName("ewj_out")
      .outputMode(OutputMode.Append).start()
    cm.addData(clicks: _*); em.addData(errors: _*)
    q.processAllAvailable()
    // push watermark past every window so all joinable state resolves
    cm.addData(Event(99, ts(600), 7, "click", 0, "{}")) // distinct users so the
    em.addData(Event(98, ts(600), 8, "error", 0, "{}")) // pushers don't self-join
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ewj_out")
      .select("user_id", "click_id", "err_id")
      .as[(Long, Long, Long)].collect().toSet
    val batch = EventStreams.errorWindowJoin(clicks.toDF(), errors.toDF(), 30)
      .as[(Long, Long, Long)].collect().toSet
    assert(batch == Set((1L, 10L, 90L)))
    assert(streamed == batch)
  }

  test("FULL-outer errorWindowJoin emits unmatched rows from BOTH sides") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val clicks = Seq(
      Event(10, ts(1), 1, "click", 0, "{}"),   // matches err@0
      Event(11, ts(40), 1, "click", 0, "{}"),  // outside window → left-unmatched
      Event(12, ts(1), 2, "click", 0, "{}"))   // user 2 has no error → left-unmatched
    val errors = Seq(
      Event(90, ts(0), 1, "error", 0, "{}"),
      Event(91, ts(0), 3, "error", 0, "{}"))   // user 3 never clicks → RIGHT-unmatched

    val cm = MemoryStream[Event]; val em = MemoryStream[Event]
    val q = EventStreams.errorWindowJoin(cm.toDF(), em.toDF(),
        windowMinutes = 30, joinType = "full_outer")
      .writeStream.format("memory").queryName("ewj_full_out")
      .outputMode(OutputMode.Append).start()
    cm.addData(clicks: _*); em.addData(errors: _*)
    q.processAllAvailable()
    // watermark advance authorizes BOTH sides' expiry emissions
    cm.addData(Event(99, ts(600), 7, "click", 0, "{}"))
    em.addData(Event(98, ts(600), 8, "error", 0, "{}"))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ewj_full_out")
      .filter($"user_id" < 7) // drop the watermark pushers' own expiry rows
      .select("user_id", "click_id", "err_id")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    val batch = EventStreams.errorWindowJoin(clicks.toDF(), errors.toDF(),
        30, joinType = "full_outer")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    val expected = Set[(Long, Option[Long], Option[Long])](
      (1L, Some(10L), Some(90L)),        // matched
      (1L, Some(11L), None),             // click outside the window
      (2L, Some(12L), None),             // user with no error
      (3L, None, Some(91L)))             // error with no click — the full-outer addition
    assert(batch == expected, s"batch=$batch")
    assert(streamed == expected, s"streamed=$streamed")
  }

  test("sessionizeBatch splits on the inactivity gap") {
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 1, "a", 1.0, "{}"),
      Event(2, ts(5), 1, "a", 2.0, "{}"),
      Event(3, ts(60), 1, "a", 3.0, "{}"),   // 55-min gap → new session
      Event(4, ts(62), 1, "a", 4.0, "{}"),
      Event(5, ts(0), 2, "a", 5.0, "{}")).toDF()
    val got = sessionizeBatch(events, gapMinutes = 30)
      .select(col("user_id"), col("n_events"), col("total_value"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 3.0), (1L, 2L, 7.0), (2L, 1L, 5.0)))
  }

  test("streaming sessionize emits closed sessions that match the batch twin") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 1, "a", 1.0, "{}"),
      Event(2, ts(5), 1, "a", 2.0, "{}"),
      Event(3, ts(60), 1, "a", 3.0, "{}"))  // closes session 1

    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(events: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sessions_out")
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(got.contains((1L, 2L, 3.0)), s"closed first session expected, got $got")
  }

  test("streamAsofEnrich tie semantics: dim at the fact's exact ts applies; last writer wins") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // transformWithState requires the RocksDB provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Event]
      val q = streamAsofEnrich(mem.toDS())
        .writeStream.format("memory").queryName("asof_tie_out")
        .outputMode(OutputMode.Append).start()
      // batch 1 — ALL at the same timestamp: two signups (higher
      // event_id wins the tie) and a purchase whose event_id sits
      // BETWEEN them (ordering is (ts, dim-before-fact, id), not id)
      mem.addData(
        Event(1, ts(5), 1, "signup", 10.0, "{}"),
        Event(3, ts(5), 1, "signup", 20.0, "{}"),
        Event(2, ts(5), 1, "purchase", 99.0, "{}"),
        Event(6, ts(5), 2, "purchase", 5.0, "{}")) // other user: no dim
      q.processAllAvailable()
      // batch 2 — a fact in a LATER batch at the dim's exact ts still
      // matches it (the stored state is the `<=` match)
      mem.addData(Event(7, ts(5), 1, "purchase", 50.0, "{}"))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("asof_tie_out")
        .as[AsofOut].collect().map(o => o.event_id -> o.dim_cents).toMap
      assert(got(2L) == Some(2000L)) // tie: signup id 3 (20.00) wins over id 1
      assert(got(6L) == None)        // no dim for user 2 — never cross-user
      assert(got(7L) == Some(2000L)) // equal-ts match across batches
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("Refresh.incrementalReturns: XML monthly refresh appends only new filings") {
    import graft.engine.{Core, SchemaBuild}
    val tmp = java.nio.file.Files.createTempDirectory("graft-990-refresh").toFile
    val landing = new java.io.File(tmp, "landing"); landing.mkdirs()
    val out = new java.io.File(tmp, "out")
    val ckpt = new java.io.File(tmp, "ckpt")
    val schema = SchemaBuild.sparseSchema(Nil, SchemaBuild.headerPaths ++ Core.declaredPaths)

    def land(n: Int, offset: Int): Unit = (0 until n).foreach { i =>
      val ein = f"${200000000 + offset + i}%09d"
      java.nio.file.Files.writeString(
        new java.io.File(landing, s"${ein}_public.xml").toPath,
        graft.engine.EngineBench.synthDoc(ein, post2013 = i % 2 == 0,
          ez = i % 3 == 0, gross = 1000L + i, members = 1, seed = i))
    }
    land(5, 0)
    Refresh.incrementalReturns(spark, landing.getPath, schema, out.getPath, ckpt.getPath)
    assert(spark.read.parquet(out.getPath).count() == 5)

    land(3, 100) // the next monthly release
    Refresh.incrementalReturns(spark, landing.getPath, schema, out.getPath, ckpt.getPath)
    val core = spark.read.parquet(out.getPath)
    assert(core.count() == 8, "only the 3 new filings are appended")
    assert(core.columns.contains("GROSSRECEIPTS"))
  }

  test("Refresh.incrementalRawStaging appends year-partitioned raw rows; tables derive from raw") {
    import graft.engine.{Core238, SchemaBuild}
    val tmp = java.nio.file.Files.createTempDirectory("graft-raw-refresh").toFile
    val landing = new java.io.File(tmp, "landing"); landing.mkdirs()
    val raw = new java.io.File(tmp, "raw")
    val ckpt = new java.io.File(tmp, "ckpt")
    val schema = SchemaBuild.sparseSchema(Nil,
      SchemaBuild.headerPaths ++ Core238.declaredPaths)

    def land(n: Int, offset: Int, post2013: Boolean): Unit = (0 until n).foreach { i =>
      val ein = f"${300000000 + offset + i}%09d"
      java.nio.file.Files.writeString(
        new java.io.File(landing, s"${ein}_public.xml").toPath,
        graft.engine.EngineBench.synthDoc(ein, post2013 = post2013,
          ez = false, gross = 1000L + i, members = 1, seed = i))
    }
    land(4, 0, post2013 = true)   // TAXYR 2013 (period 2014-xx, pre-Dec rule)
    Refresh.incrementalRawStaging(spark, landing.getPath, schema, raw.getPath, ckpt.getPath)
    land(3, 100, post2013 = false) // TAXYR 2011/2012 era spellings
    Refresh.incrementalRawStaging(spark, landing.getPath, schema, raw.getPath, ckpt.getPath)

    // a refresh tick with NOTHING new landed is a no-op, not an error
    // (production fires on a timer, not on arrival) — and must neither
    // duplicate already-staged rows nor disturb the checkpoint
    Refresh.incrementalRawStaging(spark, landing.getPath, schema, raw.getPath, ckpt.getPath)

    val rawDf = spark.read.parquet(raw.getPath)
    assert(rawDf.count() == 7, "second run appends only the 3 new filings; empty tick adds none")
    // year partitions exist on disk (partition pruning unit)
    val parts = raw.listFiles().filter(_.isDirectory).map(_.getName).filter(_.startsWith("TAXYR="))
    assert(parts.length >= 2, s"expected >=2 TAXYR partitions, got ${parts.mkString(",")}")
    // the curated core derives from the raw table without re-parsing XML
    val core = Core238.build(rawDf.drop("TAXYR"))
    assert(core.count() == 7)
    assert(core.select("EIN").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().forall(_.startsWith("3")))
    // GRAFT_YEARS-style scoping is PARTITION PRUNING in the scan: a
    // TAXYR filter must reach the scan's PartitionFilters and the
    // pruned plan must touch only that partition's files
    val pruned = rawDf.filter(org.apache.spark.sql.functions.col("TAXYR") === "2013")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("TAXYR"), plan)
    // files actually READ at execution (inputFiles is pre-pruning
    // relation metadata): only the 2013 partition's
    val readFiles = pruned
      .select(org.apache.spark.sql.functions.input_file_name().as("f"))
      .distinct().collect().map(_.getString(0))
    assert(readFiles.nonEmpty && readFiles.forall(_.contains("TAXYR=2013")),
      readFiles.mkString(", "))
    assert(rawDf.inputFiles.exists(!_.contains("TAXYR=2013")))
  }

  test("Refresh.incrementalParquet ingests only new files across runs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-refresh").toFile
    val landing = new java.io.File(tmp, "landing"); landing.mkdirs()
    val out = new java.io.File(tmp, "out")
    val ckpt = new java.io.File(tmp, "ckpt")

    val ev = Tables.events(spark, sf())
    val schema = ev.schema
    ev.limit(10).write.parquet(landing.getPath + "/batch1")
    // file-source needs a flat glob of files; use the dir of parquet parts
    val landingGlob = landing.getPath + "/*/part-*.parquet"

    Refresh.incrementalParquet(spark, landingGlob, schema, out.getPath, ckpt.getPath)
    val n1 = spark.read.parquet(out.getPath).count()
    assert(n1 == 10)

    ev.limit(25).write.mode("append").parquet(landing.getPath + "/batch2")
    Refresh.incrementalParquet(spark, landingGlob, schema, out.getPath, ckpt.getPath)
    val n2 = spark.read.parquet(out.getPath).count()
    assert(n2 == 35, s"second run must append only the new files (got $n2)")
  }
}
