package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Third frontier batch: product-analytics session metrics (streaks,
  * bounce rate), inequality and trend statistics in exact integer
  * arithmetic (Gini via ShardedRank, Mann-Kendall), and
  * functional-dependency profiling — all under the DuckDB hash gate.
  */
object Frontier3Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- EV31: longest consecutive-day activity streak --------------------
    // Gaps-and-islands: within a user's distinct active days, day −
    // row_number() is constant exactly on consecutive runs, so the
    // whole streak computation is one dedup shuffle + one partitioned
    // window + one re-aggregate — no self-join, no recursion. The
    // window partitions by user (bounded by a user's own history, never
    // by corpus size).
    QueryDef.sql(
      "ev31_activity_streaks",
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |grp AS (
        |  SELECT user_id, day,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS INTEGER) AS anchor
        |  FROM act),
        |runs AS (
        |  SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS len
        |  FROM grp GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
        |  CAST(max(len) AS BIGINT) AS longest_streak,
        |  CAST(count(*) AS BIGINT) AS n_streaks
        |FROM runs GROUP BY user_id""".stripMargin) { (s, d) =>
      val act = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val grp = act.withColumn("anchor",
        date_sub(col("day"), row_number().over(w).cast("int")))
      val runs = grp.groupBy(col("user_id"), col("anchor"))
        .agg(count(lit(1)).as("len"))
      runs.groupBy(col("user_id"))
        .agg(sum(col("len")).as("active_days"),
          max(col("len")).as("longest_streak"),
          count(lit(1)).as("n_streaks"))
    },

    // ---- EV30: session bounce rate by entry event --------------------------
    // Sessionize (strict 30-min gap, ev2's rule), take each session's
    // ENTRY event type on the total order (ts, event_id), and report
    // per entry type: sessions, single-event bounces, and the bounce
    // rate as ONE division of exact integers. Shape: one shuffle+sort
    // per user partition shared by the lag and the running session id,
    // then two partial-agg shuffles on shrinking grains.
    QueryDef.sql(
      "ev30_session_bounce",
      """WITH lagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS BIGINT) AS sess_id
        |  FROM lagged),
        |rn AS (
        |  SELECT user_id, sess_id, event_type,
        |    row_number() OVER (PARTITION BY user_id, sess_id
        |                       ORDER BY ts, event_id) AS rk
        |  FROM sess),
        |per AS (
        |  SELECT user_id, sess_id,
        |    max(CASE WHEN rk = 1 THEN event_type END) AS entry_type,
        |    CAST(count(*) AS BIGINT) AS len
        |  FROM rn GROUP BY 1, 2)
        |SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(count(*) FILTER (WHERE len = 1) AS BIGINT) AS n_bounces,
        |  CAST(count(*) FILTER (WHERE len = 1) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS bounce_rate
        |FROM per GROUP BY entry_type""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val lagged = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("new_sess",
          when(lag(col("ts"), 1).over(w).isNull ||
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L,
            1).otherwise(0))
      val sess = lagged.withColumn("sess_id",
        sum(col("new_sess")).over(w).cast("long"))
      val wSess = Window.partitionBy(col("user_id"), col("sess_id"))
        .orderBy(col("ts"), col("event_id"))
      val per = sess.withColumn("rk", row_number().over(wSess))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(max(when(col("rk") === 1, col("event_type"))).as("entry_type"),
          count(lit(1)).as("len"))
      per.groupBy(col("entry_type"))
        .agg(count(lit(1)).as("n_sessions"),
          count(when(col("len") === 1, 1)).as("n_bounces"))
        .withColumn("bounce_rate",
          col("n_bounces").cast("double") / col("n_sessions").cast("double"))
    },

    // ---- A33: Gini coefficient of customer revenue ------------------------
    // Inequality audit over per-customer lifetime revenue. The rank-sum
    // formula G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i) needs a GLOBAL
    // total-order rank — the one thing a naive window can't do at
    // scale. [[graft.operators.ShardedRank]] supplies it with no
    // unpartitioned window (range-shard + local row_number + broadcast
    // shard offsets). Everything is integer 1e-4-dollar units in
    // DECIMAL(38,0) (HUGEINT in the oracle — i·x_i sums exceed BIGINT
    // at sf0.1 already), and the coefficient is ONE division.
    QueryDef.sql(
      "a33_gini_revenue",
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS HUGEINT) AS x
        |  FROM orders GROUP BY 1),
        |rk AS (
        |  SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey) AS HUGEINT) AS i
        |  FROM rev),
        |st AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(i * x) AS six
        |  FROM rk)
        |SELECT CAST(n AS BIGINT) AS n_customers,
        |  CAST(sx AS DOUBLE) / 10000 AS total_revenue,
        |  CAST(2 * six - (n + 1) * sx AS DOUBLE) / CAST(n * sx AS DOUBLE) AS gini
        |FROM st""".stripMargin) { (s, d) =>
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 4)) * lit(10000))
          .cast("long")).as("x"))
      val ranked = graft.operators.ShardedRank
        .withRank(rev, "i", col("x"), col("o_custkey"))
        .select(col("x").cast(DecimalType(38, 0)).as("x"),
          col("i").cast(DecimalType(38, 0)).as("i"))
      val st = ranked.agg(
        count(lit(1)).cast(DecimalType(38, 0)).as("n"),
        sum(col("x")).cast(DecimalType(38, 0)).as("sx"),
        sum(col("i") * col("x")).cast(DecimalType(38, 0)).as("six"))
      st.select(
        col("n").cast("long").as("n_customers"),
        (col("sx").cast("double") / lit(10000)).as("total_revenue"),
        ((lit(2) * col("six") - (col("n") + lit(1)) * col("sx")).cast("double")
          / (col("n") * col("sx")).cast("double")).as("gini"))
    },

    // ---- A34: functional-dependency profiler ------------------------------
    // Metanome-style candidate-FD checking (the data-profiling pass a
    // warehouse build runs before trusting "X determines Y"): for each
    // candidate LHS→RHS, the violating groups are LHS groups with >1
    // distinct RHS. One partial-agg shuffle per candidate on its LHS;
    // nothing is collected — the profile is the aggregate. Pairs with
    // a28's referential audit as the schema-quality suite.
    QueryDef.sql(
      "a34_fd_profile",
      """WITH cand AS (
        |  SELECT 'orders: o_custkey->o_orderpriority' AS fd, o_custkey AS lhs,
        |    o_orderpriority AS rhs FROM orders
        |  UNION ALL
        |  SELECT 'customer: c_nationkey->c_mktsegment', c_nationkey, c_mktsegment
        |  FROM customer
        |  UNION ALL
        |  SELECT 'lineitem: l_partkey->l_suppkey', l_partkey, CAST(l_suppkey AS VARCHAR)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'nation: n_nationkey->n_regionkey', n_nationkey, CAST(n_regionkey AS VARCHAR)
        |  FROM nation),
        |g AS (
        |  SELECT fd, lhs, CAST(count(DISTINCT rhs) AS BIGINT) AS n_rhs
        |  FROM cand GROUP BY 1, 2)
        |SELECT fd, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(count(*) FILTER (WHERE n_rhs > 1) AS BIGINT) AS violating_groups,
        |  CAST(count(*) FILTER (WHERE n_rhs > 1) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS violation_rate
        |FROM g GROUP BY fd""".stripMargin) { (s, d) =>
      def check(fd: String, df: DataFrame, lhs: String, rhs: Column): DataFrame =
        df.select(col(lhs).as("lhs"), rhs.as("rhs"))
          .groupBy(col("lhs")).agg(count_distinct(col("rhs")).as("n_rhs"))
          .agg(count(lit(1)).as("n_groups"),
            count(when(col("n_rhs") > 1, 1)).as("violating_groups"))
          .select(lit(fd).as("fd"), col("n_groups"), col("violating_groups"),
            (col("violating_groups").cast("double") / col("n_groups").cast("double"))
              .as("violation_rate"))
      Seq(
        check("orders: o_custkey->o_orderpriority",
          Tables.orders(s, d), "o_custkey", col("o_orderpriority")),
        check("customer: c_nationkey->c_mktsegment",
          Tables.customer(s, d), "c_nationkey", col("c_mktsegment")),
        check("lineitem: l_partkey->l_suppkey",
          Tables.lineitem(s, d), "l_partkey", col("l_suppkey").cast("string")),
        check("nation: n_nationkey->n_regionkey",
          Tables.nation(s, d), "n_nationkey", col("n_regionkey").cast("string"))
      ).reduce(_ unionByName _)
    },

    // ---- A35: Mann-Kendall trend test -------------------------------------
    // Nonparametric monotone-trend statistic over the daily revenue
    // series: S = Σ_{i<j} sign(x_j − x_i). Pairwise over DAYS — the
    // O(days²) pair space is calendar-bounded (5.8M pairs for a
    // 2,400-day series), independent of fact cardinality, and all
    // comparisons are exact integer units, so the statistic (and the
    // concordant/discordant/tie decomposition) hash-matches exactly.
    QueryDef.sql(
      "a35_trend_test",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)
        |    AS BIGINT) AS s_stat,
        |  CAST(count(*) FILTER (WHERE b.x > a.x) AS BIGINT) AS concordant,
        |  CAST(count(*) FILTER (WHERE b.x < a.x) AS BIGINT) AS discordant,
        |  CAST(count(*) FILTER (WHERE b.x = a.x) AS BIGINT) AS ties
        |FROM daily a JOIN daily b ON a.day < b.day""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 4)) * lit(10000))
          .cast("long")).as("x"))
      val a = daily.select(col("day").as("aday"), col("x").as("ax"))
      val b = daily.select(col("day").as("bday"), col("x").as("bx"))
      a.join(b, col("aday") < col("bday"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("bx") > col("ax"), 1L).when(col("bx") < col("ax"), -1L)
            .otherwise(0L)).as("s_stat"),
          count(when(col("bx") > col("ax"), 1)).as("concordant"),
          count(when(col("bx") < col("ax"), 1)).as("discordant"),
          count(when(col("bx") === col("ax"), 1)).as("ties"))
    }
  )
}
