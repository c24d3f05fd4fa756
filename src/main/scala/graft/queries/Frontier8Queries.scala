package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Eighth frontier batch: one-way ANOVA with exact-integer group
  * moments, a data-driven skew-salting planner (the prep step for
  * j4-style salted joins), and engagement dwell-time histograms.
  */
object Frontier8Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A41: one-way ANOVA F statistic ------------------------------------
    // Does mean event value differ across event types? SSW and SSB
    // decompose into per-group terms over exact integer moments
    // (S_g = Σx, Q_g = Σx², n_g): SSW_g = Q_g − S_g²/n_g and
    // SSB_g = n_g·(S_g/n_g − S/n)² = (n·S_g − n_g·S)²/(n·n_g·n)·...
    // — every term is ONE division of exact cross-multiplied integers,
    // folded in group order; F assembles from the folded sums with
    // exact integer degrees of freedom. One conditional-aggregate scan
    // builds all group moments; the global moment broadcasts back.
    QueryDef.sql(
      "a41_anova_f",
      """WITH v AS (
        |  SELECT event_type AS g,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS x
        |  FROM events),
        |gm AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(x) AS BIGINT) AS s_g,
        |    CAST(sum(x * x) AS BIGINT) AS q_g
        |  FROM v GROUP BY 1),
        |tm AS (
        |  SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(s_g) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM gm),
        |terms AS (
        |  SELECT g, n, k,
        |    CAST(q_g AS DOUBLE) - CAST(s_g AS DOUBLE) * CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE)
        |      AS ssw_g,
        |    CAST((n * s_g - n_g * s) AS DOUBLE) * CAST((n * s_g - n_g * s) AS DOUBLE)
        |      / (CAST(n_g AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS ssb_g
        |  FROM gm CROSS JOIN tm),
        |folded AS (
        |  SELECT max(n) AS n, max(k) AS k,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(ssw_g ORDER BY g)),
        |      (a, b) -> a + b) AS ssw,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(ssb_g ORDER BY g)),
        |      (a, b) -> a + b) AS ssb
        |  FROM terms)
        |SELECT CAST(k AS INTEGER) AS n_groups, CAST(n AS BIGINT) AS n_obs,
        |  round(ssb, 2) AS ss_between, round(ssw, 2) AS ss_within,
        |  round((ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)), 6)
        |    AS f_stat
        |FROM folded""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .select(col("event_type").as("g"),
          (col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long").as("x"))
      val gm = v.groupBy(col("g"))
        .agg(count(lit(1)).as("n_g"), sum(col("x")).as("s_g"),
          sum(col("x") * col("x")).as("q_g"))
      val tm = gm.agg(sum(col("n_g")).as("n"), sum(col("s_g")).as("s"),
        count(lit(1)).as("k"))
      val dev = col("n") * col("s_g") - col("n_g") * col("s")
      val terms = gm.crossJoin(broadcast(tm))
        .select(col("g"), col("n"), col("k"),
          (col("q_g").cast("double")
            - col("s_g").cast("double") * col("s_g").cast("double") / col("n_g").cast("double"))
            .as("ssw_g"),
          (dev.cast("double") * dev.cast("double")
            / (col("n_g").cast("double") * col("n").cast("double") * col("n").cast("double")))
            .as("ssb_g"))
      val folded = terms.agg(max(col("n")).as("n"), max(col("k")).as("k"),
        aggregate(transform(sort_array(collect_list(struct(col("g"), col("ssw_g")))),
          x => x.getField("ssw_g")), lit(0.0), (a, b) => a + b).as("ssw"),
        aggregate(transform(sort_array(collect_list(struct(col("g"), col("ssb_g")))),
          x => x.getField("ssb_g")), lit(0.0), (a, b) => a + b).as("ssb"))
      folded.select(col("k").cast("int").as("n_groups"), col("n").as("n_obs"),
        round(col("ssb"), 2).as("ss_between"), round(col("ssw"), 2).as("ss_within"),
        round((col("ssb") / (col("k") - 1).cast("double"))
          / (col("ssw") / (col("n") - col("k")).cast("double")), 6).as("f_stat"))
    },

    // ---- U20: skew-salting planner -----------------------------------------
    // The prep pass a salted join (j4) needs at 100 TB: from the key
    // histogram, emit the salt plan — keys whose row count exceeds the
    // per-task budget get salt_factor = ceil(count / budget); everyone
    // else passes unsalted (factor 1). Pure integer planning off one
    // partial-agg shuffle; the emitted plan is exactly the broadcast
    // input a salted-join rewrite consumes. The budget is a config
    // knob — at production scale it's rows-per-task (e.g. 1M); here 8
    // rows so the synthetic key histogram exercises factors > 1.
    QueryDef.sql(
      "u20_skew_planner",
      """WITH h AS (
        |  SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM orders GROUP BY 1)
        |SELECT key, n_rows,
        |  CAST((n_rows + 7) // 8 AS BIGINT) AS salt_factor,
        |  n_rows > 8 AS needs_salt
        |FROM h WHERE n_rows > 4""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_custkey").as("key"))
        .agg(count(lit(1)).as("n_rows"))
        .filter(col("n_rows") > 4)
        .select(col("key"), col("n_rows"),
          expr("(n_rows + 7) div 8").as("salt_factor"),
          (col("n_rows") > 8).as("needs_salt"))
    },

    // ---- EV38: dwell-time histogram ----------------------------------------
    // Engagement readout: the gap between a user's consecutive events,
    // bucketed on a pseudo-log scale (<1 min, <10 min, <1 h, <6 h,
    // ≥6 h) via exact integer thresholds on the microsecond lag diff.
    // One window sort per user partition shared with every other
    // per-user series op; the histogram is a 5-row aggregate.
    QueryDef.sql(
      "ev38_dwell_histogram",
      """WITH lagged AS (
        |  SELECT user_id,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |                                          ORDER BY ts, event_id)) AS gap_us
        |  FROM events),
        |b AS (
        |  SELECT CASE WHEN gap_us < 60000000 THEN 'a_under_1m'
        |              WHEN gap_us < 600000000 THEN 'b_under_10m'
        |              WHEN gap_us < 3600000000 THEN 'c_under_1h'
        |              WHEN gap_us < 21600000000 THEN 'd_under_6h'
        |              ELSE 'e_over_6h' END AS bucket,
        |    gap_us
        |  FROM lagged WHERE gap_us IS NOT NULL)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_gaps,
        |  CAST(min(gap_us) AS BIGINT) AS min_us, CAST(max(gap_us) AS BIGINT) AS max_us
        |FROM b GROUP BY bucket""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val lagged = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .filter(col("gap_us").isNotNull)
      lagged.select(
          when(col("gap_us") < 60000000L, "a_under_1m")
            .when(col("gap_us") < 600000000L, "b_under_10m")
            .when(col("gap_us") < 3600000000L, "c_under_1h")
            .when(col("gap_us") < 21600000000L, "d_under_6h")
            .otherwise("e_over_6h").as("bucket"),
          col("gap_us"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_us")).as("min_us"), max(col("gap_us")).as("max_us"))
    }
  )
}
