package graft.queries

import graft.{SparkSpec, Tables}
import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The registered streaming queries must equal their batch twins
  * row-for-row (the driver's DuckDB oracle IS the batch SQL — any
  * watermark leak, dropped session, or double-rounding drift fails
  * here first).
  */
class StreamingQueriesSpec extends SparkSpec {

  private def q(name: String): (org.apache.spark.sql.SparkSession, String) => DataFrame =
    StreamingQueries.defs.find(_.name == name).get.fn

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  test("ev1s streaming rollup == batch rollup") {
    val streamed = q("ev1s_hourly_rollup_stream")(spark, sf())
    val batch = EventStreams.hourlyRollup(Tables.events(spark, sf()))
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("ev2s streaming sessionize == batch sessionize") {
    val streamed = q("ev2s_sessionize_stream")(spark, sf())
    val batch = EventStreams.sessionizeBatch(Tables.events(spark, sf()), gapMinutes = 30)
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("ev4s streaming interval join == batch range join") {
    val streamed = q("ev4s_error_window_join_stream")(spark, sf())
    val ev = Tables.events(spark, sf())
    val err = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("u"), col("event_id").as("err_id"), col("ts").as("lo"))
    val clk = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts"))
    val batch = clk.join(err,
        col("user_id") === col("u") && col("ts") >= col("lo") &&
          col("ts") < col("lo") + expr("INTERVAL 4 HOURS"))
      .select(col("user_id"), col("click_id"), col("err_id"))
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("ev16s stream-static enrichment == batch broadcast join") {
    val streamed = q("ev16s_enrich_dim_stream")(spark, sf())
    val ev = Tables.events(spark, sf())
    val batch = ev.join(Tables.customer(spark, sf()),
        col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_mktsegment").as("segment"))
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }

  test("ev34s Bollinger frame state survives micro-batch boundaries") {
    // the registered query delivers all data in ONE micro-batch; here
    // the corpus arrives split in two (then a flush file), so every
    // user's trailing ring buffer must carry across batches. With
    // maxFilesPerTrigger=1 each file is its own micro-batch.
    import graft.streaming.StreamStage
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    import spark.implicits._
    val ev = Tables.events(spark, sf())
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val median = ev.agg(expr("percentile_approx(event_id, 0.5)")).head.get(0)
      .toString.toDouble.toLong
    val first = ev.filter(col("event_id") <= median)
    val second = ev.filter(col("event_id") > median)
    val streamed = StreamStage.run(spark, "ev34s_split",
      "/tmp/graft_stream_stage_split", first, Seq(second),
      shufflePartitions = Some(4),
      reuseKey = Some(s"${sf()}:split:$median"),
      extraConfs = Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")) { src =>
      EventStreams.bollingerFlags(src.as[EventStreams.Event]).toDF()
    }
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val frame = w.rowsBetween(-7, Window.currentRow)
    val x = (col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long")
    val f = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("event_id"), x.as("x"))
      .withColumn("s", sum(col("x")).over(frame))
      .withColumn("q", sum(col("x") * col("x")).over(frame))
      .withColumn("rk", row_number().over(w))
    val dev = lit(8) * col("x") - col("s")
    val batch = f.filter(col("rk") >= 8)
      .select(col("user_id"), col("event_id"),
        (lit(2) * dev * dev > lit(64) * col("q") - lit(8) * col("s") * col("s"))
          .as("breakout"))
    assert(canon(streamed) == canon(batch))
  }

  test("ev34s streaming Bollinger alerts == batch window formulation") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val streamed = q("ev34s_stream_bollinger")(spark, sf())
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val frame = w.rowsBetween(-7, Window.currentRow)
    val x = (col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long")
    val f = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("event_id"), x.as("x"))
      .withColumn("s", sum(col("x")).over(frame))
      .withColumn("q", sum(col("x") * col("x")).over(frame))
      .withColumn("rk", row_number().over(w))
    val dev = lit(8) * col("x") - col("s")
    val batch = f.filter(col("rk") >= 8)
      .select(col("user_id"), col("event_id"),
        (lit(2) * dev * dev > lit(64) * col("q") - lit(8) * col("s") * col("s"))
          .as("breakout"))
    assert(canon(streamed) == canon(batch))
    assert(streamed.count() > 0)
  }
}
