package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Twenty-fourth frontier batch: net/gross revenue retention, mutual
  * information, and a naive-forecaster backtest harness.
  */
object Frontier24Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A66: revenue retention accounting (GRR / NRR) ----------------------
    // The SaaS ledger in money: week-over-week, how much of last
    // week's revenue came back (gross), and how much including
    // expansion (net)? Per (user, week) revenue in exact cents; each
    // consecutive-week user pair classifies as retained (min of the
    // two weeks' revenue = gross), expansion (growth on retained
    // users) or churn; GRR = retained / prior, NRR = this-week
    // revenue of prior-week users / prior. Integer week indexes; one
    // self-join on (user, week+1) — a user-keyed hash join, never a
    // window over the stream; ratios divide once, round 6.
    QueryDef.sql(
      "a66_revenue_retention",
      """WITH uw AS (
        |  SELECT user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS w,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |paired AS (
        |  SELECT a.w AS prior_w, a.cents AS prior_c,
        |    COALESCE(b.cents, 0) AS next_c
        |  FROM uw a LEFT JOIN uw b
        |    ON b.user_id = a.user_id AND b.w = a.w + 1),
        |led AS (
        |  SELECT prior_w,
        |    CAST(sum(prior_c) AS BIGINT) AS prior_rev,
        |    CAST(sum(least(prior_c, next_c)) AS BIGINT) AS retained_rev,
        |    CAST(sum(next_c) AS BIGINT) AS next_rev_of_cohort
        |  FROM paired GROUP BY 1)
        |SELECT CAST(prior_w AS BIGINT) AS week_idx, prior_rev, retained_rev,
        |  next_rev_of_cohort,
        |  round(CAST(retained_rev AS DOUBLE) / CAST(prior_rev AS DOUBLE), 6) AS grr,
        |  round(CAST(next_rev_of_cohort AS DOUBLE) / CAST(prior_rev AS DOUBLE), 6) AS nrr
        |FROM led WHERE prior_rev > 0""".stripMargin) { (s, d) =>
      val uw = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"),
          expr("datediff(cast(ts as date), date'2024-01-01') div 7").as("w"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
      val b = uw.select(col("user_id").as("b_uid"), col("w").as("b_w"),
        col("cents").as("b_cents"))
      val paired = uw.join(b,
          col("b_uid") === col("user_id") && col("b_w") === col("w") + 1, "left")
        .select(col("w").as("prior_w"), col("cents").as("prior_c"),
          coalesce(col("b_cents"), lit(0L)).as("next_c"))
      paired.groupBy(col("prior_w"))
        .agg(sum(col("prior_c")).as("prior_rev"),
          sum(least(col("prior_c"), col("next_c"))).as("retained_rev"),
          sum(col("next_c")).as("next_rev_of_cohort"))
        .filter(col("prior_rev") > 0)
        .select(col("prior_w").cast("long").as("week_idx"), col("prior_rev"),
          col("retained_rev"), col("next_rev_of_cohort"),
          round(col("retained_rev").cast("double") / col("prior_rev").cast("double"), 6)
            .as("grr"),
          round(col("next_rev_of_cohort").cast("double")
            / col("prior_rev").cast("double"), 6).as("nrr"))
    },

    // ---- A68: mutual information between categorical columns ----------------
    // a57 profiles single columns; MI asks how much one column tells
    // you about another — here event_type vs weekday and, separately,
    // documents lang vs source (a 2-row report). The a57 discipline
    // scales to the joint grain: each cell's p·ln(p_ij/(p_i·p_j))
    // rounds to 8 dp and sums as DECIMAL (order-independent); counts
    // and marginals broadcast onto the joint-cell stream; one final
    // negationless sum, round 6.
    QueryDef.sql(
      "a68_mutual_information", {
        def mi(pairName: String, joint: String): String =
          s"""SELECT '$pairName' AS pair_name,
             |  CAST(count(*) AS BIGINT) AS n_cells,
             |  round(CAST(sum(term) AS DOUBLE), 6) AS mi_nats
             |FROM (
             |  SELECT CAST(round(
             |      (CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) *
             |      ln((CAST(c AS DOUBLE) * CAST(t AS DOUBLE))
             |        / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))), 8)
             |    AS DECIMAL(18,8)) AS term
             |  FROM (
             |    SELECT j.a, j.b, j.c, ma.ca, mb.cb, tt.t
             |    FROM ($joint) j
             |    JOIN (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM ($joint) GROUP BY 1) ma
             |      USING (a)
             |    JOIN (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM ($joint) GROUP BY 1) mb
             |      USING (b)
             |    CROSS JOIN (SELECT CAST(sum(c) AS BIGINT) AS t FROM ($joint)) tt))""".stripMargin
        val evJoint =
          """SELECT event_type AS a,
            |  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS b,
            |  CAST(count(*) AS BIGINT) AS c
            |FROM events GROUP BY 1, 2""".stripMargin
        val docJoint =
          """SELECT lang AS a, source AS b, CAST(count(*) AS BIGINT) AS c
            |FROM documents GROUP BY 1, 2""".stripMargin
        mi("event_type|weekday", evJoint) + "\nUNION ALL\n" + mi("lang|source", docJoint)
      }) { (s, d) =>
      def mi(pairName: String, joint: DataFrame): DataFrame = {
        val ma = joint.groupBy(col("a")).agg(sum(col("c")).as("ca"))
        val mb = joint.groupBy(col("b")).agg(sum(col("c")).as("cb"))
        val tt = joint.agg(sum(col("c")).as("t"))
        val withM = joint.join(broadcast(ma), Seq("a")).join(broadcast(mb), Seq("b"))
          .crossJoin(broadcast(tt))
        val term = round(
          (col("c").cast("double") / col("t").cast("double")) *
            log((col("c").cast("double") * col("t").cast("double"))
              / (col("ca").cast("double") * col("cb").cast("double"))), 8)
          .cast(DecimalType(18, 8))
        withM.select(term.as("term"))
          .agg(count(lit(1)).as("n_cells"),
            round(sum(col("term")).cast("double"), 6).as("mi_nats"))
          .select(lit(pairName).as("pair_name"), col("n_cells"), col("mi_nats"))
      }
      val evJoint = Tables.events(s, d)
        .groupBy(col("event_type").as("a"),
          expr("datediff(cast(ts as date), date'2024-01-01') % 7").as("b"))
        .agg(count(lit(1)).as("c"))
      val docJoint = Tables.documents(s, d)
        .groupBy(col("lang").as("a"), col("source").as("b"))
        .agg(count(lit(1)).as("c"))
      mi("event_type|weekday", evJoint)
        .unionByName(mi("lang|source", docJoint))
    },

    // ---- EV52: naive-forecaster backtest ------------------------------------
    // The forecast-evaluation harness: three zero-parameter baselines
    // (naive = yesterday, seasonal-naive = same weekday last week,
    // drift = yesterday + mean historic step) backtested over the
    // daily revenue series. Errors stay exact integer cents for naive
    // and seasonal (lag columns); drift's fractional step is
    // CENTS-SCALED: err·(t−1) = |x_t·(t−1) − x_{t−1}·(t−1) −
    // (x_{t−1} − x_1)| is exact — one division per day at the end.
    // MAE per model in one rollup; day-axis windows calendar-bounded.
    QueryDef.sql(
      "ev52_forecast_backtest",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |idx AS (
        |  SELECT day, x,
        |    row_number() OVER (ORDER BY day) AS t,
        |    lag(x, 1) OVER (ORDER BY day) AS x1,
        |    lag(x, 7) OVER (ORDER BY day) AS x7,
        |    first_value(x) OVER (ORDER BY day) AS x_first
        |  FROM daily),
        |err AS (
        |  SELECT t, x,
        |    abs(x - x1) AS e_naive,
        |    abs(x - x7) AS e_seasonal,
        |    CAST(abs((x - x1) * (t - 1) - (x1 - x_first)) AS BIGINT) AS e_drift_scaled
        |  FROM idx WHERE x7 IS NOT NULL AND t > 1)
        |SELECT 'naive' AS model,
        |  CAST(count(*) AS BIGINT) AS n_days,
        |  round(CAST(sum(e_naive) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 100.0), 6)
        |    AS mae_dollars
        |FROM err
        |UNION ALL
        |SELECT 'seasonal_naive', CAST(count(*) AS BIGINT),
        |  round(CAST(sum(e_seasonal) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 100.0), 6)
        |FROM err
        |UNION ALL
        |SELECT 'drift', CAST(count(*) AS BIGINT),
        |  round(CAST(sum(CAST(round(
        |      CAST(e_drift_scaled AS DOUBLE) / CAST(t - 1 AS DOUBLE), 4)
        |    AS DECIMAL(18,4))) AS DOUBLE)
        |    / (CAST(count(*) AS DOUBLE) * 100.0), 6)
        |FROM err""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"))
      val wD = Window.orderBy(col("day"))
      val idx = daily
        .withColumn("t", row_number().over(wD))
        .withColumn("x1", lag(col("x"), 1).over(wD))
        .withColumn("x7", lag(col("x"), 7).over(wD))
        .withColumn("x_first", first(col("x")).over(
          Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)))
      val err = idx.filter(col("x7").isNotNull && col("t") > 1)
        .select(col("t"), col("x"),
          abs(col("x") - col("x1")).as("e_naive"),
          abs(col("x") - col("x7")).as("e_seasonal"),
          abs((col("x") - col("x1")) * (col("t") - 1) - (col("x1") - col("x_first")))
            .cast("long").as("e_drift_scaled"))
      def row(model: String, maeExpr: org.apache.spark.sql.Column): DataFrame =
        err.agg(count(lit(1)).as("n_days"), maeExpr.as("mae_dollars"))
          .select(lit(model).as("model"), col("n_days"), col("mae_dollars"))
      row("naive",
        round(sum(col("e_naive")).cast("double") / (count(lit(1)).cast("double") * 100.0), 6))
        .unionByName(row("seasonal_naive",
          round(sum(col("e_seasonal")).cast("double")
            / (count(lit(1)).cast("double") * 100.0), 6)))
        .unionByName(row("drift",
          // per-day drift errors quantize to DECIMAL(18,4) BEFORE the sum —
          // a raw double Σ would be association-order-dependent
          round(sum(round(col("e_drift_scaled").cast("double")
              / (col("t") - 1).cast("double"), 4).cast(DecimalType(18, 4)))
            .cast("double") / (count(lit(1)).cast("double") * 100.0), 6)))
    }
  )
}
