package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.ShardedRank

/** Twenty-first frontier batch: model-evaluation lift/gains chart,
  * GDPR erasure impact report, and a partition rebalancing planner.
  */
object Frontier21Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A60: decile lift / gains chart ------------------------------------
    // The scoring-model evaluation readout: users rank by a predictor
    // (click volume), land in equal-count deciles (ShardedRank + the
    // c12 closed form — no unpartitioned window over users), and each
    // decile reports response rate, cumulative gains and lift against
    // the base rate. Response = a59's high-value conversion. Counts
    // are exact; the cumulative runs over the 10-row decile grain;
    // every ratio divides once, round 6.
    QueryDef.sql(
      "a60_decile_lift",
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS score,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150.0
        |      THEN 1 ELSE 0 END) AS responded
        |  FROM events GROUP BY 1),
        |n AS (SELECT count(*) AS n, CAST(sum(responded) AS BIGINT) AS total_resp FROM u),
        |rk AS (
        |  SELECT responded,
        |    row_number() OVER (ORDER BY score DESC, user_id) AS i
        |  FROM u),
        |dec AS (
        |  SELECT CAST(((i - 1) * 10) // n AS INTEGER) + 1 AS decile,
        |    CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(responded) AS BIGINT) AS n_resp
        |  FROM rk CROSS JOIN n GROUP BY 1),
        |cum AS (
        |  SELECT decile, n_users, n_resp,
        |    CAST(sum(n_resp) OVER (ORDER BY decile) AS BIGINT) AS cum_resp
        |  FROM dec)
        |SELECT decile, n_users, n_resp,
        |  round(CAST(n_resp AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS resp_rate,
        |  round(CAST(cum_resp AS DOUBLE) / CAST(total_resp AS DOUBLE), 6) AS gains,
        |  round((CAST(n_resp AS DOUBLE) / CAST(n_users AS DOUBLE))
        |    / (CAST(total_resp AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS lift
        |FROM cum CROSS JOIN n""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(count(when(col("event_type") === "click", 1)).as("score"),
          max(when(col("event_type") === "purchase" && col("value") > 150.0, 1)
            .otherwise(0)).as("responded"))
      val n = u.agg(count(lit(1)).as("n"), sum(col("responded")).as("total_resp"))
      val rk = ShardedRank.withRank(u, "i", col("score").desc, col("user_id"))
      val dec = rk.crossJoin(broadcast(n))
        .select(expr("cast(((i - 1) * 10) div n as int) + 1").as("decile"),
          col("responded"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"), sum(col("responded")).as("n_resp"))
      val wD = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dec.withColumn("cum_resp", sum(col("n_resp")).over(wD))
        .crossJoin(broadcast(n))
        .select(col("decile"), col("n_users"), col("n_resp"),
          round(col("n_resp").cast("double") / col("n_users").cast("double"), 6)
            .as("resp_rate"),
          round(col("cum_resp").cast("double") / col("total_resp").cast("double"), 6)
            .as("gains"),
          round((col("n_resp").cast("double") / col("n_users").cast("double"))
            / (col("total_resp").cast("double") / col("n").cast("double")), 6).as("lift"))
    },

    // ---- U26: GDPR erasure impact report ------------------------------------
    // u23 is the read side (subject access); this is the write-side
    // planning pass an erasure request triggers: for a deterministic
    // subject cohort (md5 first hex '0' ≈ 1/16 of customers), count
    // affected rows per table, and verify the post-erasure remainder
    // carries zero subject rows. One conditional-aggregate scan per
    // table against the broadcast subject set — no row-level deletion
    // is simulated row-by-row anywhere; the remainder check is the
    // same aggregate with the predicate inverted (it must be, for the
    // erased+remaining=total identity the spec pins to hold exactly).
    QueryDef.sql(
      "u26_erasure_impact",
      """WITH subjects AS (
        |  SELECT c_custkey AS k FROM customer
        |  WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) = '0')
        |SELECT 'customer' AS table_name,
        |  CAST(count(*) AS BIGINT) AS rows_total,
        |  CAST(count(*) FILTER (WHERE k IS NOT NULL) AS BIGINT) AS rows_erased,
        |  CAST(count(*) FILTER (WHERE k IS NULL) AS BIGINT) AS rows_remaining
        |FROM customer LEFT JOIN subjects ON c_custkey = k
        |UNION ALL
        |SELECT 'orders',
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE k IS NOT NULL) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE k IS NULL) AS BIGINT)
        |FROM orders LEFT JOIN subjects ON o_custkey = k
        |UNION ALL
        |SELECT 'events',
        |  CAST(count(*) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE k IS NOT NULL) AS BIGINT),
        |  CAST(count(*) FILTER (WHERE k IS NULL) AS BIGINT)
        |FROM events LEFT JOIN subjects ON user_id = k""".stripMargin) { (s, d) =>
      val subjects = Tables.customer(s, d)
        .filter(substring(md5(col("c_custkey").cast("string")), 1, 1) === "0")
        .select(col("c_custkey").as("k"))
      def report(df: DataFrame, name: String, key: String): DataFrame =
        df.join(broadcast(subjects), df(key) === col("k"), "left")
          .agg(count(lit(1)).as("rows_total"),
            count(col("k")).as("rows_erased"),
            count(when(col("k").isNull, 1)).as("rows_remaining"))
          .select(lit(name).as("table_name"), col("rows_total"),
            col("rows_erased"), col("rows_remaining"))
      report(Tables.customer(s, d), "customer", "c_custkey")
        .unionByName(report(Tables.orders(s, d), "orders", "o_custkey"))
        .unionByName(report(Tables.events(s, d), "events", "user_id"))
    },

    // ---- U25: partition rebalancing planner ---------------------------------
    // The OPTIMIZE planning pass for a day-partitioned table: given
    // per-day row counts, assign each day a target bucket via the
    // cumulative-rows closed form (floor(cum_before / target)) —
    // contiguous small days coalesce into one bucket, oversized days
    // get a split factor ceil(rows/target). Pure integer arithmetic
    // over the calendar-bounded day axis; the plan (not the data)
    // is the output, exactly like u20's salt planner.
    QueryDef.sql(
      "u25_rebalance_plan",
      """WITH days AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS rows_in
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(rows_in) AS BIGINT) AS total,
        |    CAST((sum(rows_in) + 31) // 32 AS BIGINT) AS target
        |  FROM days),
        |cum AS (
        |  SELECT day, rows_in,
        |    CAST(COALESCE(sum(rows_in) OVER
        |      (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before
        |  FROM days)
        |SELECT c.day, c.rows_in,
        |  CAST(c.cum_before // t.target AS BIGINT) AS bucket,
        |  CAST((c.rows_in + t.target - 1) // t.target AS BIGINT) AS split_factor,
        |  CASE WHEN c.rows_in > t.target THEN 'split'
        |       WHEN c.cum_before // t.target =
        |            (c.cum_before + c.rows_in - 1) // t.target THEN 'coalesce'
        |       ELSE 'keep' END AS action
        |FROM cum c CROSS JOIN tot t""".stripMargin) { (s, d) =>
      val days = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("rows_in"))
      val tot = days.agg(sum(col("rows_in")).as("total"),
        expr("(sum(rows_in) + 31) div 32").as("target"))
      val wD = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      days.withColumn("cum_before", coalesce(sum(col("rows_in")).over(wD), lit(0L)))
        .crossJoin(broadcast(tot))
        .select(col("day"), col("rows_in"),
          expr("cum_before div target").as("bucket"),
          expr("(rows_in + target - 1) div target").as("split_factor"),
          when(col("rows_in") > col("target"), "split")
            .when(expr("cum_before div target") ===
              expr("(cum_before + rows_in - 1) div target"), "coalesce")
            .otherwise("keep").as("action"))
    }
  )
}
