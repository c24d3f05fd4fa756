package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Ninth frontier batch: the watermark-sizing lateness audit (a
  * two-phase SHARDED PREFIX MAX — completing the distributed-scan
  * family next to c4/c7's prefix sums and ShardedRank's prefix
  * counts) and an explicit Bloom-prefiltered join.
  */
object Frontier9Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- U21: watermark sizing from observed lateness ----------------------
    // "How late is late data?" — the number that sizes every streaming
    // watermark. Arrival time models a deterministic network delay
    // (ts + (event_id mod 7)·2 min — the corpus itself is generated in
    // time order, so arrival = generation would be degenerately
    // on-time); lateness of an event = (max event-time ARRIVED so far)
    // − (its event time). The running max over arrival order is a
    // GLOBAL prefix scan — the scale-killer if done as one
    // unpartitioned window — so it runs two-phase: 32 arithmetic
    // shards over the arrival range (bounds from a broadcast one-row
    // aggregate), a PARTITIONED local running max, and a prefix max
    // over the 32-row shard-summary table broadcast back (max is
    // associative, so shard-prefix ∨ local-prefix ≡ the global prefix
    // exactly). Readout: lateness histogram + max — i.e. "a 10-minute
    // watermark would drop N events".
    QueryDef.sql(
      "u21_watermark_sizing",
      """WITH o AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us,
        |    epoch_us(ts) + (event_id % 7) * 120000000 AS arr_us
        |  FROM events),
        |r AS (
        |  SELECT event_id, ts_us,
        |    CAST(max(ts_us) OVER (ORDER BY arr_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seen_max
        |  FROM o),
        |l AS (SELECT seen_max - ts_us AS late_us FROM r),
        |b AS (
        |  SELECT CASE WHEN late_us = 0 THEN 'a_on_time'
        |              WHEN late_us < 60000000 THEN 'b_under_1m'
        |              WHEN late_us < 600000000 THEN 'c_under_10m'
        |              WHEN late_us < 3600000000 THEN 'd_under_1h'
        |              ELSE 'e_over_1h' END AS bucket, late_us
        |  FROM l)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(late_us) AS BIGINT) AS max_late_us
        |FROM b GROUP BY bucket""".stripMargin) { (s, d) =>
      val o = Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
        .withColumn("arr_us",
          col("ts_us") + (col("event_id") % 7) * lit(120000000L))
      val st = o.agg(min(col("arr_us")).as("lo"), max(col("arr_us")).as("hi"))
      // arithmetic sharding: 32 contiguous arrival ranges; shard width
      // from the broadcast bounds so the shard count stays 32 at any
      // scale (ranges may be unevenly filled; correctness unaffected)
      val sharded = o.crossJoin(broadcast(st))
        .withColumn("shard",
          expr("(arr_us - lo) div (((hi - lo) div 32) + 1)"))
      val wLocal = Window.partitionBy(col("shard")).orderBy(col("arr_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = sharded.withColumn("local_max", max(col("ts_us")).over(wLocal))
      // 32-row shard summary; the only unpartitioned window runs here
      val wShard = Window.orderBy(col("shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = sharded.groupBy(col("shard")).agg(max(col("ts_us")).as("shard_max"))
        .withColumn("prior_max", max(col("shard_max")).over(wShard))
        .select(col("shard"), col("prior_max"))
      val late = local.join(broadcast(offsets), "shard")
        .select((greatest(col("local_max"), coalesce(col("prior_max"), col("local_max")))
          - col("ts_us")).as("late_us"))
      late.select(
          when(col("late_us") === 0, "a_on_time")
            .when(col("late_us") < 60000000L, "b_under_1m")
            .when(col("late_us") < 600000000L, "c_under_10m")
            .when(col("late_us") < 3600000000L, "d_under_1h")
            .otherwise("e_over_1h").as("bucket"),
          col("late_us"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_events"), max(col("late_us")).as("max_late_us"))
    },

    // ---- J7: explicit Bloom-prefiltered join -------------------------------
    // The sketch-prefilter pattern spelled out (vs the AQE-injected
    // runtime filter RuntimeFilterSpec pins): build a Bloom filter
    // over the small side's keys (catalyst's BloomFilterAggregate,
    // exposed as graft_bloom_agg — it is not in the public registry),
    // ship the ONE sketch to the fact scan as a literal (the
    // driver-side-model-as-one-literal discipline of the IVF/k-means
    // operators; might_contain requires a foldable sketch), prefilter
    // with graft_might_contain, then finish with the exact join.
    // False positives survive the prefilter but die in the join, so
    // the RESULT is exactly the plain join result (the oracle); only
    // the plan differs — at 100 TB the prefilter drops non-matching
    // fact rows before the shuffle instead of after it.
    QueryDef.sql(
      "j7_bloom_prefilter_join",
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_acctbal < 0
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      val dims = Tables.customer(s, d)
        .filter(col("c_acctbal") < 0)
        .select(col("c_custkey"))
      val sketchBytes = dims
        .agg(call_function("graft_bloom_agg",
          col("c_custkey").cast("long"), lit(100000L), lit(800000L)).as("bf"))
        .head.getAs[Array[Byte]](0)
      val prefiltered = Tables.orders(s, d)
        .filter(call_function("graft_might_contain",
          lit(sketchBytes), col("o_custkey").cast("long")))
      prefiltered.join(broadcast(dims), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }
  )
}
