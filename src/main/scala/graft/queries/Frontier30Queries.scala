package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Thirtieth frontier batch: time-weighted averages, state-occupancy
  * accounting, and reproducible multi-epoch shuffle schedules.
  */
object Frontier30Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- EV55: time-weighted average -----------------------------------------
    // Monitoring/finance semantics: a reading holds until the next one,
    // so the honest mean weights each value by how long it was current.
    // Per user: Σ value·duration / Σ duration with exact integer-µs
    // durations from ONE lead over the user-partitioned order and
    // cents-quantized values — the weighted sum is an exact
    // DECIMAL(38,0) of cent·µs products; one division at the end.
    // The last reading per user carries no duration (no lead) and
    // drops — the standard open-interval convention.
    QueryDef.sql(
      "ev55_time_weighted_avg",
      """WITH seq AS (
        |  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS cents,
        |    epoch_us(ts) AS us,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_us
        |  FROM events),
        |seg AS (
        |  SELECT user_id, cents, next_us - us AS dur_us
        |  FROM seq WHERE next_us IS NOT NULL)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(CAST(dur_us AS HUGEINT)) AS BIGINT) AS total_us,
        |  round(CAST(sum(CAST(cents AS HUGEINT) * dur_us) AS DOUBLE)
        |    / (CAST(sum(CAST(dur_us AS HUGEINT)) AS DOUBLE) * 100.0), 6)
        |    AS twa_dollars
        |FROM seg GROUP BY user_id""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val wU = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val seq = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"),
          unix_micros(col("ts")).as("us"))
        .withColumn("next_us", lead(col("us"), 1).over(wU))
      val seg = seq.filter(col("next_us").isNotNull)
        .select(col("user_id"), col("cents"), (col("next_us") - col("us")).as("dur_us"))
      seg.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_segments"),
          sum(col("dur_us").cast(dec)).cast("long").as("total_us"),
          round(sum(col("cents").cast(dec) * col("dur_us")).cast("double")
            / (sum(col("dur_us").cast(dec)).cast("double") * 100.0), 6)
            .as("twa_dollars"))
    },

    // ---- EV56: state-occupancy accounting ------------------------------------
    // Telemetry's "time in state": each event puts its user in a state
    // (the event type) until the next event; the report is exact µs
    // occupancy per state across all users, with shares. The same
    // single-lead machinery as ev55 — durations never materialize per
    // state first, one partial-agg shuffle on the bounded state key.
    QueryDef.sql(
      "ev56_state_occupancy",
      """WITH seq AS (
        |  SELECT event_type AS state, epoch_us(ts) AS us,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_us
        |  FROM events),
        |seg AS (
        |  SELECT state, next_us - us AS dur_us
        |  FROM seq WHERE next_us IS NOT NULL),
        |tot AS (SELECT CAST(sum(CAST(dur_us AS HUGEINT)) AS BIGINT) AS t FROM seg)
        |SELECT state,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(sum(CAST(dur_us AS HUGEINT)) AS BIGINT) AS occupancy_us,
        |  round(CAST(sum(CAST(dur_us AS HUGEINT)) AS DOUBLE) / CAST(t AS DOUBLE), 6)
        |    AS share
        |FROM seg CROSS JOIN tot GROUP BY state, t""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val wU = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val seq = Tables.events(s, d)
        .select(col("event_type").as("state"), col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("next_us", lead(col("us"), 1).over(wU))
      val seg = seq.filter(col("next_us").isNotNull)
        .select(col("state"), (col("next_us") - col("us")).as("dur_us"))
      val tot = seg.agg(sum(col("dur_us").cast(dec)).cast("long").as("t"))
      seg.crossJoin(broadcast(tot))
        .groupBy(col("state"), col("t"))
        .agg(count(lit(1)).as("n_segments"),
          sum(col("dur_us").cast(dec)).cast("long").as("occupancy_us"))
        .select(col("state"), col("n_segments"), col("occupancy_us"),
          round(col("occupancy_us").cast("double") / col("t").cast("double"), 6)
            .as("share"))
    },

    // ---- C31: multi-epoch shuffle schedule -----------------------------------
    // Training runs shuffle the corpus DIFFERENTLY each epoch but must
    // be reproducible on any cluster. Epoch e's order is
    // md5(doc_id || ':' || e) — c7's deterministic permutation with an
    // epoch salt — and the schedule audit emits, per epoch, an exact
    // order checksum (Σ pos·doc_id mod 2^61−1) plus the first document,
    // so a re-run on different hardware can assert order identity
    // without shipping the permutation. Ranks come from the same
    // two-phase sharded shape as c7 via ShardedRank; the modular
    // checksum is an order-independent aggregate of position-weighted
    // terms (each term exact, the sum associative in the modulus).
    QueryDef.sql(
      "c31_epoch_shuffle",
      """WITH epochs AS (SELECT unnest(generate_series(0, 2)) AS epoch),
        |keyed AS (
        |  SELECT e.epoch, d.doc_id,
        |    md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR)) AS h
        |  FROM documents d CROSS JOIN epochs e),
        |ranked AS (
        |  SELECT epoch, doc_id,
        |    row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS pos
        |  FROM keyed)
        |SELECT epoch,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(pos AS HUGEINT) * doc_id) % 2305843009213693951 AS BIGINT)
        |    AS order_checksum,
        |  CAST(min(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS first_doc
        |FROM ranked GROUP BY epoch""".stripMargin) { (s, d) =>
      import s.implicits._
      val dec = DecimalType(38, 0)
      // one ShardedRank (range shards + broadcast offsets, no
      // unpartitioned window) per epoch — the epoch count is a bounded
      // configuration constant, the corpus never flows through one task
      val ranked = (0 to 2).map { e =>
        val keyed = Tables.documents(s, d).select(col("doc_id"))
          .withColumn("epoch", lit(e))
          .withColumn("h",
            md5(concat(col("doc_id").cast("string"), lit(s":$e"))))
        graft.operators.ShardedRank.withRank(keyed, "pos", col("h"), col("doc_id"))
      }.reduce(_.unionByName(_))
      ranked.groupBy(col("epoch"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("pos").cast(dec) * col("doc_id"))
            % 2305843009213693951L).cast("long").as("order_checksum"),
          min(when(col("pos") === 1, col("doc_id"))).cast("long").as("first_doc"))
    }
  )
}
