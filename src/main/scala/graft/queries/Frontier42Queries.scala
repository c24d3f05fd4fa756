package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Forty-second frontier batch: isotonic regression by minimax,
  * exact-dyadic adstock carryover, and the log-rank survival test.
  */
object Frontier42Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A96: isotonic regression (weighted, minimax form) -----------------
    // Probability calibration's workhorse: the best NON-DECREASING fit
    // to the daily conversion-rate curve. The sequential PAVA loop is
    // replaced by the closed minimax characterization
    //   fit_i = max_{j≤i} min_{k≥i} wavg(j..k)
    // which at the CALENDAR grain is a bounded triple grid (30³/6
    // interval-anchor rows — fixed by the month, not the data).
    // Interval averages are single divisions of exact integer prefix
    // sums rounded to 8 dp before any min/max comparison, so both
    // engines pool identically.
    QueryDef.sql(
      "a96_isotonic_calibration",
      """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        |daily AS (
        |  SELECT datediff('day', d0, CAST(ts AS DATE)) AS idx,
        |    CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS p,
        |    CAST(count(*) AS BIGINT) AS e
        |  FROM events CROSS JOIN d0 GROUP BY 1),
        |iv AS (
        |  SELECT a.idx AS j, b.idx AS k,
        |    round(CAST(sum(c.p) AS DOUBLE) / CAST(sum(c.e) AS DOUBLE), 8) AS avg
        |  FROM daily a JOIN daily b ON a.idx <= b.idx
        |  JOIN daily c ON c.idx BETWEEN a.idx AND b.idx
        |  GROUP BY 1, 2),
        |mn AS (
        |  SELECT iv.j, i.idx AS i, min(iv.avg) AS m
        |  FROM iv JOIN daily i ON iv.j <= i.idx AND i.idx <= iv.k
        |  GROUP BY 1, 2),
        |fit AS (SELECT i, max(m) AS fit FROM mn WHERE j <= i GROUP BY 1)
        |SELECT f.i AS day_idx, round(f.fit, 6) AS iso_rate,
        |  round(CAST(d.p AS DOUBLE) / CAST(d.e AS DOUBLE), 6) AS raw_rate
        |FROM fit f JOIN daily d ON f.i = d.idx""".stripMargin) { (s, d) =>
      val d0 = Tables.events(s, d).agg(min(col("ts").cast("date")).as("d0"))
      val daily = Tables.events(s, d).crossJoin(broadcast(d0))
        .groupBy(datediff(col("ts").cast("date"), col("d0")).as("idx"))
        .agg(count(when(col("event_type") === "purchase", 1)).as("p"),
          count(lit(1)).as("e"))
        .localCheckpoint(true) // feeds three self-joins; pin one evaluation
      val b = daily.select(col("idx").as("k"))
      val c = daily.select(col("idx").as("c_idx"), col("p").as("cp"), col("e").as("ce"))
      val iv = daily.select(col("idx").as("j")).join(b, col("j") <= col("k"))
        .join(c, col("c_idx").between(col("j"), col("k")))
        .groupBy(col("j"), col("k"))
        .agg(round(sum(col("cp")).cast("double") / sum(col("ce")).cast("double"), 8)
          .as("avg"))
      val anchors = daily.select(col("idx").as("i"))
      val mn = iv.join(anchors, col("j") <= col("i") && col("i") <= col("k"))
        .groupBy(col("j"), col("i")).agg(min(col("avg")).as("m"))
      val fit = mn.filter(col("j") <= col("i"))
        .groupBy(col("i")).agg(max(col("m")).as("fit"))
      fit.join(daily.select(col("idx").as("i"), col("p"), col("e")), "i")
        .select(col("i").as("day_idx"), round(col("fit"), 6).as("iso_rate"),
          round(col("p").cast("double") / col("e").cast("double"), 6).as("raw_rate"))
    },

    // ---- EV65: adstock carryover (geometric decay, exact dyadic) -----------
    // Marketing's adstock: A_t = x_t + ½·A_{t−1}. The recursion
    // telescopes to A_t = Σ x_k·2^(k−t), so with the prefix sum
    // S_t = Σ x_k·2^k (DECIMAL(38,0) — day-index shifts grow fast)
    // the whole carryover series is ONE calendar-bounded prefix window
    // and an exact integer right-shift: A_t = S_t div 2^t. No floats,
    // no iteration — the same dyadic trick as ev58, extended from a
    // snapshot to the full series. (DuckDB: HUGEINT division — its
    // DECIMAL `//` rounds before flooring, the w13 gotcha.)
    QueryDef.sql(
      "ev65_adstock",
      """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        |daily AS (
        |  SELECT datediff('day', d0, CAST(ts AS DATE)) AS idx,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents
        |  FROM events CROSS JOIN d0 GROUP BY 1),
        |pfx AS (
        |  SELECT idx, cents,
        |    sum(CAST(cents AS DECIMAL(38,0)) * CAST(CAST(1 AS BIGINT) << idx
        |      AS DECIMAL(19,0))) OVER (ORDER BY idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |  FROM daily)
        |SELECT idx AS day_idx, cents,
        |  CAST(CAST(s AS HUGEINT) // (CAST(1 AS BIGINT) << idx) AS BIGINT)
        |    AS adstock_cents
        |FROM pfx""".stripMargin) { (s, d) =>
      val d0 = Tables.events(s, d).agg(min(col("ts").cast("date")).as("d0"))
      val daily = Tables.events(s, d).crossJoin(broadcast(d0))
        .groupBy(datediff(col("ts").cast("date"), col("d0")).as("idx"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("cents"))
      // calendar-bounded prefix
      val w = Window.orderBy(col("idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .withColumn("s", sum(col("cents").cast(DecimalType(38, 0))
          * expr("shiftleft(cast(1 as bigint), cast(idx as int))")
            .cast(DecimalType(19, 0))).over(w))
        .select(col("idx").as("day_idx"), col("cents"),
          expr("s div shiftleft(cast(1 as bigint), cast(idx as int))").cast("long")
            .as("adstock_cents"))
    },

    // ---- A97: log-rank test (survival-curve comparison) --------------------
    // a40 drew one KM curve; this TESTS two — do week-1 joiners
    // convert faster than later joiners? At each day-offset: at-risk
    // and death counts per cohort (exact integers from one user-grain
    // pass), hypergeometric expectation and variance per time (fixed-
    // order doubles from BIGINTs, rounded 8, ordered-fold over the
    // ≤31 distinct times), then the one-df χ². The time grain is
    // calendar-bounded — the whole test is two tiny folds after the
    // user aggregate.
    QueryDef.sql(
      "a97_logrank",
      """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0,
        |  max(CAST(ts AS DATE)) AS dmax FROM events),
        |u AS (
        |  SELECT user_id,
        |    min(datediff('day', d0, CAST(ts AS DATE))) AS first_day,
        |    min(CASE WHEN event_type = 'purchase'
        |      THEN datediff('day', d0, CAST(ts AS DATE)) END) AS conv_day,
        |    max(datediff('day', d0, dmax)) AS last_day
        |  FROM events CROSS JOIN d0 GROUP BY user_id),
        |subj AS (
        |  SELECT CASE WHEN first_day <= 6 THEN 1 ELSE 2 END AS grp,
        |    CASE WHEN conv_day IS NOT NULL AND conv_day >= first_day
        |      THEN conv_day - first_day ELSE last_day - first_day END AS t,
        |    CASE WHEN conv_day IS NOT NULL AND conv_day >= first_day
        |      THEN 1 ELSE 0 END AS died
        |  FROM u),
        |times AS (SELECT DISTINCT t FROM subj WHERE died = 1),
        |tab AS (
        |  SELECT tm.t,
        |    CAST(count(*) FILTER (WHERE s.grp = 1 AND s.t >= tm.t) AS BIGINT) AS n1,
        |    CAST(count(*) FILTER (WHERE s.t >= tm.t) AS BIGINT) AS n,
        |    CAST(count(*) FILTER (WHERE s.grp = 1 AND s.t = tm.t AND s.died = 1)
        |      AS BIGINT) AS d1,
        |    CAST(count(*) FILTER (WHERE s.t = tm.t AND s.died = 1) AS BIGINT) AS dt
        |  FROM times tm CROSS JOIN subj s GROUP BY 1),
        |terms AS (
        |  SELECT t, d1,
        |    round(CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE), 8)
        |      AS e1,
        |    CASE WHEN n > 1 THEN
        |      round(CAST(dt AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (1.0 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
        |        * CAST(n - dt AS DOUBLE) / CAST(n - 1 AS DOUBLE), 8)
        |    ELSE 0.0 END AS v
        |  FROM tab WHERE n > 0),
        |fold AS (
        |  SELECT CAST(sum(d1) AS BIGINT) AS o1,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(e1 ORDER BY t)),
        |      (a, b) -> a + b) AS e1s,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(v ORDER BY t)),
        |      (a, b) -> a + b) AS vs,
        |    CAST(count(*) AS BIGINT) AS n_times
        |  FROM terms)
        |SELECT n_times, o1 AS observed_1, round(e1s, 6) AS expected_1,
        |  CASE WHEN vs > 0 THEN
        |    round((CAST(o1 AS DOUBLE) - e1s) * (CAST(o1 AS DOUBLE) - e1s) / vs, 6)
        |  ELSE NULL END AS chi2
        |FROM fold""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val d0 = ev.agg(min(col("ts").cast("date")).as("d0"),
        max(col("ts").cast("date")).as("dmax"))
      val u = ev.crossJoin(broadcast(d0)).groupBy(col("user_id"))
        .agg(min(datediff(col("ts").cast("date"), col("d0"))).as("first_day"),
          min(when(col("event_type") === "purchase",
            datediff(col("ts").cast("date"), col("d0")))).as("conv_day"),
          max(datediff(col("dmax"), col("d0"))).as("last_day"))
      val died = col("conv_day").isNotNull && col("conv_day") >= col("first_day")
      val subj = u.select(
        when(col("first_day") <= 6, 1).otherwise(2).as("grp"),
        when(died, col("conv_day") - col("first_day"))
          .otherwise(col("last_day") - col("first_day")).as("t"),
        when(died, 1).otherwise(0).as("died"))
        .localCheckpoint(true) // feeds the times grid twice
      val times = subj.filter(col("died") === 1).select(col("t").as("tt")).distinct()
      val tab = subj.crossJoin(broadcast(times))
        .groupBy(col("tt"))
        .agg(count(when(col("grp") === 1 && col("t") >= col("tt"), 1)).as("n1"),
          count(when(col("t") >= col("tt"), 1)).as("n"),
          count(when(col("grp") === 1 && col("t") === col("tt")
            && col("died") === 1, 1)).as("d1"),
          count(when(col("t") === col("tt") && col("died") === 1, 1)).as("dt"))
      val p1 = col("n1").cast("double") / col("n").cast("double")
      val terms = tab.filter(col("n") > 0).select(col("tt").as("t"), col("d1"),
        round(col("dt").cast("double") * p1, 8).as("e1"),
        when(col("n") > 1,
          round(col("dt").cast("double") * p1 * (lit(1.0) - p1)
            * (col("n") - col("dt")).cast("double")
            / (col("n") - 1).cast("double"), 8)).otherwise(0.0).as("v"))
      def fold(c: Column): Column =
        aggregate(transform(sort_array(collect_list(struct(col("t"), c.as("x")))),
          r => r.getField("x")), lit(0.0), (a, b) => a + b)
      val f = terms.agg(sum(col("d1")).as("o1"), fold(col("e1")).as("e1s"),
        fold(col("v")).as("vs"), count(lit(1)).as("n_times"))
      val dev = col("o1").cast("double") - col("e1s")
      f.select(col("n_times"), col("o1").as("observed_1"),
        round(col("e1s"), 6).as("expected_1"),
        when(col("vs") > 0, round(dev * dev / col("vs"), 6)).otherwise(lit(null))
          .as("chi2"))
    }
  )
}
