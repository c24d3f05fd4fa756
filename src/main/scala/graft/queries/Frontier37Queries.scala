package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Thirty-seventh frontier batch: dynamic partition pruning, capture–
  * recapture population estimation, odds/risk ratios, temperature-
  * weighted mixture apportionment.
  */
object Frontier37Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- U33: dynamic partition pruning (runtime scan restriction) ---------
    // The companion to u14's STATIC pruning: here the pruned day set is
    // only known at RUNTIME (it comes from the dim side of a join), so
    // Catalyst injects a DynamicPruningExpression on the partition
    // column — the fact scan waits for the broadcast of audit days and
    // then reads ONLY those partition directories. At 100 TB this is
    // the difference between scanning a decade of partitions and the
    // three the dim selects. Plan pinned in PlanShapeSpec
    // (dynamicpruning on the staged scan). Oracle recomputes from the
    // flat table with the same day arithmetic.
    QueryDef.sql(
      "u33_dpp_join",
      """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        |dim AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day
        |  FROM events CROSS JOIN d0
        |  WHERE event_type = 'error' AND CAST(ts AS DATE) <= d0 + 2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events JOIN dim ON CAST(ts AS DATE) = dim.day
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val (dir, day0) = ScaleQueries.partitionedEvents(s, d)
      // audit-day dim: a literal selective predicate (the staging marker
      // day is known at plan time) → DPP injects the runtime filter on
      // the fact side's partition column.
      val dim = Tables.events(s, d).filter(col("event_type") === "error")
        .select(to_date(col("ts")).as("day"))
        .filter(col("day") <= date_add(lit(day0).cast("date"), 2))
        .distinct()
        .select(col("day").cast("string").as("event_date"))
      s.read.parquet(dir)
        .join(dim, "event_date")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total"))
    },

    // ---- A89: capture–recapture corpus-size estimate -----------------------
    // The ecology estimator, pointed at data pipelines: how many users
    // exist in total, given two observation windows (week 1 and
    // week 2) and their overlap? Lincoln–Petersen N̂ = n₁n₂/m and the
    // bias-corrected Chapman variant — the latter in pure truncated
    // INTEGER arithmetic, the former one double division of exact
    // counts. The same arithmetic estimates true dedup-cluster counts
    // from two crawl snapshots. Three distinct-count shuffles at the
    // user grain, then scalar algebra.
    QueryDef.sql(
      "a89_capture_recapture",
      """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        |w1 AS (SELECT DISTINCT user_id FROM events CROSS JOIN d0
        |  WHERE datediff('day', d0, CAST(ts AS DATE)) BETWEEN 0 AND 6),
        |w2 AS (SELECT DISTINCT user_id FROM events CROSS JOIN d0
        |  WHERE datediff('day', d0, CAST(ts AS DATE)) BETWEEN 7 AND 13),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM w1 JOIN w2 USING (user_id)),
        |c AS (SELECT CAST((SELECT count(*) FROM w1) AS BIGINT) AS n1,
        |  CAST((SELECT count(*) FROM w2) AS BIGINT) AS n2,
        |  (SELECT m FROM m) AS m,
        |  CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT) AS n_true)
        |SELECT n1, n2, m, n_true,
        |  CASE WHEN m > 0 THEN round(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
        |    / CAST(m AS DOUBLE), 6) ELSE NULL END AS lincoln_petersen,
        |  CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) AS chapman
        |FROM c""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val d0 = ev.agg(min(col("ts").cast("date")).as("d0"))
      val withAge = ev.crossJoin(broadcast(d0))
        .select(col("user_id"), datediff(col("ts").cast("date"), col("d0")).as("age"))
      val w1 = withAge.filter(col("age").between(0, 6)).select(col("user_id")).distinct()
      val w2 = withAge.filter(col("age").between(7, 13)).select(col("user_id")).distinct()
      val n1 = w1.agg(count(lit(1)).as("n1"))
      val n2 = w2.agg(count(lit(1)).as("n2"))
      val m = w1.join(w2, "user_id").agg(count(lit(1)).as("m"))
      val nTrue = ev.agg(countDistinct(col("user_id")).as("n_true"))
      n1.crossJoin(broadcast(n2)).crossJoin(broadcast(m)).crossJoin(broadcast(nTrue))
        .select(col("n1"), col("n2"), col("m"), col("n_true"),
          when(col("m") > 0, round(col("n1").cast("double") * col("n2").cast("double")
            / col("m").cast("double"), 6)).otherwise(lit(null)).as("lincoln_petersen"),
          expr("(n1 + 1) * (n2 + 1) div (m + 1) - 1").cast("long").as("chapman"))
    },

    // ---- A90: odds ratio / relative risk (2×2 epidemiology table) ----------
    // Does clicking associate with purchasing, per user? The 2×2 table
    // (exposed = any click, outcome = any purchase) gives the odds
    // ratio ad/bc, the risk ratio, and the log-OR standard error
    // √(1/a+1/b+1/c+1/d) — the numbers behind every retrospective
    // cohort readout. One user-grain conditional aggregate builds the
    // table; everything after is scalar arithmetic on exact counts
    // (reciprocal sums in fixed a→d order).
    QueryDef.sql(
      "a90_odds_ratio",
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS exposed,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS outcome
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT
        |    CAST(count(*) FILTER (WHERE exposed = 1 AND outcome = 1) AS BIGINT) AS a,
        |    CAST(count(*) FILTER (WHERE exposed = 1 AND outcome = 0) AS BIGINT) AS b,
        |    CAST(count(*) FILTER (WHERE exposed = 0 AND outcome = 1) AS BIGINT) AS c,
        |    CAST(count(*) FILTER (WHERE exposed = 0 AND outcome = 0) AS BIGINT) AS d
        |  FROM u)
        |SELECT a, b, c, d,
        |  CASE WHEN b * c > 0 THEN
        |    round(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
        |      / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)), 6) ELSE NULL END AS odds_ratio,
        |  CASE WHEN c > 0 AND a + b > 0 AND c + d > 0 THEN
        |    round((CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
        |      / (CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE)), 6) ELSE NULL END
        |    AS risk_ratio,
        |  CASE WHEN a > 0 AND b > 0 AND c > 0 AND d > 0 THEN
        |    round(sqrt(1.0 / CAST(a AS DOUBLE) + 1.0 / CAST(b AS DOUBLE)
        |      + 1.0 / CAST(c AS DOUBLE) + 1.0 / CAST(d AS DOUBLE)), 6) ELSE NULL END
        |    AS se_log_or
        |FROM t""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d).groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("exposed"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("outcome"))
      val t = u.agg(
        count(when(col("exposed") === 1 && col("outcome") === 1, 1)).as("a"),
        count(when(col("exposed") === 1 && col("outcome") === 0, 1)).as("b"),
        count(when(col("exposed") === 0 && col("outcome") === 1, 1)).as("c"),
        count(when(col("exposed") === 0 && col("outcome") === 0, 1)).as("d"))
      val (a, b, c0, d0) = (col("a").cast("double"), col("b").cast("double"),
        col("c").cast("double"), col("d").cast("double"))
      t.select(col("a"), col("b"), col("c"), col("d"),
        when(col("b") * col("c") > 0, round(a * d0 / (b * c0), 6))
          .otherwise(lit(null)).as("odds_ratio"),
        when(col("c") > 0 && col("a") + col("b") > 0 && col("c") + col("d") > 0,
          round((a / (a + b)) / (c0 / (c0 + d0)), 6)).otherwise(lit(null))
          .as("risk_ratio"),
        when(col("a") > 0 && col("b") > 0 && col("c") > 0 && col("d") > 0,
          round(sqrt(lit(1.0) / a + lit(1.0) / b + lit(1.0) / c0 + lit(1.0) / d0), 6))
          .otherwise(lit(null)).as("se_log_or"))
    },

    // ---- C37: temperature-weighted mixture apportionment -------------------
    // The multilingual-mixing recipe: sample sources proportional to
    // tokens^α (α = ½ here — √ is IEEE-correctly-rounded in BOTH
    // engines, unlike pow(x, 0.7), so the quantized integer weights
    // are portable), then split a 100k-token budget by the largest-
    // remainder (Hamilton) method: floor shares from exact integer
    // division, leftovers to the largest remainders. Conservation is
    // exact — Σalloc = budget — and the remainder ranking is a
    // SOURCE-bounded window.
    QueryDef.sql(
      "c37_temperature_mix",
      """WITH inv AS (
        |  SELECT source,
        |    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |w AS (SELECT source, tokens,
        |  CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000000) AS BIGINT) AS wq
        |  FROM inv),
        |tot AS (SELECT CAST(sum(wq) AS BIGINT) AS tw, CAST(count(*) AS BIGINT) AS k
        |  FROM w),
        |sh AS (
        |  SELECT source, tokens, wq,
        |    (100000 * wq) // tw AS fl, (100000 * wq) % tw AS rem, tw, k
        |  FROM w CROSS JOIN tot),
        |lo AS (SELECT CAST(100000 - sum(fl) AS BIGINT) AS leftover FROM sh),
        |rk AS (
        |  SELECT source, tokens, wq, fl, leftover,
        |    row_number() OVER (ORDER BY rem DESC, source) AS rr
        |  FROM sh CROSS JOIN lo)
        |SELECT source, tokens, wq,
        |  CAST(fl + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM rk""".stripMargin) { (s, d) =>
      val inv = Tables.documents(s, d).groupBy(col("source"))
        .agg(sum(size(expr("regexp_extract_all(text, '\\\\S+', 0)"))).as("tokens"))
      val w = inv.select(col("source"), col("tokens"),
        floor(sqrt(col("tokens").cast("double")) * 1000000).cast("long").as("wq"))
      val tot = w.agg(sum(col("wq")).as("tw"), count(lit(1)).as("k"))
      val sh = w.crossJoin(broadcast(tot))
        .select(col("source"), col("tokens"), col("wq"),
          expr("(100000 * wq) div tw").as("fl"),
          expr("(100000 * wq) % tw").as("rem"))
      val lo = sh.agg((lit(100000L) - sum(col("fl"))).as("leftover"))
      // source-bounded remainder ranking (k sources by configuration)
      val rk = sh.crossJoin(broadcast(lo))
        .withColumn("rr", row_number().over(Window.orderBy(col("rem").desc, col("source"))))
      rk.select(col("source"), col("tokens"), col("wq"),
        (col("fl") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
          .cast("long").as("alloc"))
    }
  )
}
