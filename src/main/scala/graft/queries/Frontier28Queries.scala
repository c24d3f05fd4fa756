package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Twenty-eighth frontier batch: Theil inequality index, Wilson score
  * intervals, and the pretraining token-budget allocation plan.
  */
object Frontier28Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A75: Theil index ----------------------------------------------------
    // The decomposable inequality measure next to a33's Gini and a46's
    // Lorenz curve: T = Σ (x_i/X)·ln(x_i·n/X) over customer revenue.
    // Per-customer revenue stays exact integer units; each term rounds
    // to 8 dp and sums as DECIMAL (the a57/a68 discipline — a raw
    // double Σ over customers would be association-order-dependent at
    // any scale). One partial-agg shuffle on the customer key, the
    // (n, X) totals broadcast back onto the term scan.
    QueryDef.sql(
      "a75_theil_index",
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)) AS BIGINT)
        |      AS x
        |  FROM orders GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS total
        |  FROM rev),
        |terms AS (
        |  SELECT CAST(round(
        |      (CAST(x AS DOUBLE) / CAST(total AS DOUBLE)) *
        |      ln(CAST(x AS DOUBLE) * CAST(n AS DOUBLE) / CAST(total AS DOUBLE)), 8)
        |    AS DECIMAL(20,8)) AS term, n, total
        |  FROM rev CROSS JOIN tot WHERE x > 0)
        |SELECT max(n) AS n_customers,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS theil
        |FROM terms""".stripMargin) { (s, d) =>
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 4)) * 100).cast("long")).as("x"))
      val tot = rev.agg(count(lit(1)).as("n"), sum(col("x")).as("total"))
      val share = col("x").cast("double") / col("total").cast("double")
      val lnArg = col("x").cast("double") * col("n").cast("double") / col("total").cast("double")
      rev.crossJoin(broadcast(tot)).filter(col("x") > 0)
        .select(round(share * log(lnArg), 8).cast(DecimalType(20, 8)).as("term"), col("n"))
        .agg(max(col("n")).as("n_customers"),
          round(sum(col("term")).cast("double"), 6).as("theil"))
    },

    // ---- A76: Wilson score intervals -----------------------------------------
    // The confidence interval that behaves at extreme rates (the
    // normal-approximation CI from a59 breaks near 0 and 1): per
    // market segment, the 95% Wilson interval for the high-value
    // conversion rate. Counts exact; the closed form runs with the
    // fixed z²=3.841459 literal and pinned op order; three rounded
    // outputs per segment.
    QueryDef.sql(
      "a76_wilson_ci",
      """WITH u AS (
        |  SELECT c.c_mktsegment AS segment, e.user_id,
        |    max(CASE WHEN e.event_type = 'purchase' AND e.value > 150.0
        |      THEN 1 ELSE 0 END) AS conv
        |  FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |  GROUP BY 1, 2),
        |seg AS (
        |  SELECT segment, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(conv) AS BIGINT) AS k
        |  FROM u GROUP BY 1)
        |SELECT segment, n, k,
        |  round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_hat,
        |  round(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |      + 3.841459 / (2.0 * CAST(n AS DOUBLE))
        |      - 1.959964 * sqrt(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |          + 3.841459 / (4.0 * CAST(n AS DOUBLE))) / CAST(n AS DOUBLE)))
        |    / (1.0 + 3.841459 / CAST(n AS DOUBLE)), 6) AS ci_low,
        |  round(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |      + 3.841459 / (2.0 * CAST(n AS DOUBLE))
        |      + 1.959964 * sqrt(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |          + 3.841459 / (4.0 * CAST(n AS DOUBLE))) / CAST(n AS DOUBLE)))
        |    / (1.0 + 3.841459 / CAST(n AS DOUBLE)), 6) AS ci_high
        |FROM seg""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .join(Tables.customer(s, d), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("user_id"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 150.0, 1)
          .otherwise(0)).as("conv"))
      val seg = u.groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
      val nD = col("n").cast("double")
      val p = col("k").cast("double") / nD
      val z2 = lit(3.841459)
      val z = lit(1.959964)
      val centre = p + z2 / (lit(2.0) * nD)
      val half = z * sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * nD)) / nD)
      val denom = lit(1.0) + z2 / nD
      seg.select(col("segment"), col("n"), col("k"),
        round(p, 6).as("p_hat"),
        round((centre - half) / denom, 6).as("ci_low"),
        round((centre + half) / denom, 6).as("ci_high"))
    },

    // ---- C29: token-budget allocation plan ----------------------------------
    // The pretraining data-mixing planner: given per-source token
    // inventories and c5's target mixture weights, allocate a 1M-token
    // budget — each source gets min(inventory, weight-share of budget)
    // in integer tokens, the leftover redistributes to unconstrained
    // sources proportionally in a second exact-integer pass, and the
    // plan reports the sampling rate each source should run at. Pure
    // integer arithmetic at the bounded source grain (one partial-agg
    // shuffle over documents, then plan algebra on ≤ sources rows).
    QueryDef.sql(
      "c29_token_budget_plan",
      """WITH inv AS (
        |  SELECT source,
        |    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |w AS (
        |  SELECT source, tokens,
        |    CASE WHEN length(source) = 4 THEN 1 ELSE 4 END AS weight
        |  FROM inv),
        |tw AS (SELECT CAST(sum(weight) AS BIGINT) AS total_w FROM w),
        |ask AS (
        |  SELECT source, tokens, weight,
        |    CAST((1000000 * weight) // total_w AS BIGINT) AS asked
        |  FROM w CROSS JOIN tw),
        |capped AS (
        |  SELECT source, tokens, weight, asked,
        |    least(tokens, asked) AS granted,
        |    (tokens > asked) AS unconstrained
        |  FROM ask),
        |pool AS (
        |  SELECT CAST(sum(asked - granted) AS BIGINT) AS leftover,
        |    CAST(sum(CASE WHEN unconstrained THEN weight ELSE 0 END) AS BIGINT) AS uw
        |  FROM capped)
        |SELECT c.source, c.tokens AS inventory, c.asked, c.granted,
        |  CAST(c.granted + CASE WHEN c.unconstrained AND uw > 0
        |    THEN (leftover * c.weight) // uw ELSE 0 END AS BIGINT) AS final_alloc,
        |  round(CAST(c.granted + CASE WHEN c.unconstrained AND uw > 0
        |      THEN (leftover * c.weight) // uw ELSE 0 END AS DOUBLE)
        |    / CAST(c.tokens AS DOUBLE), 6) AS sample_rate
        |FROM capped c CROSS JOIN pool""".stripMargin) { (s, d) =>
      val inv = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
          .as("tokens"))
      val w = inv.withColumn("weight",
        when(length(col("source")) === 4, 1L).otherwise(4L))
      val tw = w.agg(sum(col("weight")).as("total_w"))
      val ask = w.crossJoin(broadcast(tw))
        .withColumn("asked", expr("(1000000 * weight) div total_w"))
      val capped = ask
        .withColumn("granted", least(col("tokens"), col("asked")))
        .withColumn("unconstrained", col("tokens") > col("asked"))
      val pool = capped.agg(
        sum(col("asked") - col("granted")).as("leftover"),
        sum(when(col("unconstrained"), col("weight")).otherwise(0L)).as("uw"))
      val bonus = when(col("unconstrained") && col("uw") > 0,
        expr("(leftover * weight) div uw")).otherwise(0L)
      capped.crossJoin(broadcast(pool))
        .select(col("source"), col("tokens").as("inventory"), col("asked"),
          col("granted"),
          (col("granted") + bonus).cast("long").as("final_alloc"),
          round((col("granted") + bonus).cast("double") / col("tokens").cast("double"), 6)
            .as("sample_rate"))
    }
  )
}
