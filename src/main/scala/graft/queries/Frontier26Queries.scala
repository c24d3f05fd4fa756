package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Twenty-sixth frontier batch: exact single-changepoint detection,
  * behavioral bot detection, and Cramér's V effect size.
  */
object Frontier26Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A71: single changepoint (binary segmentation, exact) --------------
    // "When did the metric shift?" — the best split k of the daily
    // revenue series minimizes SSE₁+SSE₂. With prefix sums p=Σ₁x,
    // q=Σ₁x², the candidate cost telescopes to
    //   cost(k)·n₁·n₂-scaled: (T−p)²·n₁ + p²·n₂ − ... — here each
    // side's n·SSE = n·Σx² − (Σx)² stays an EXACT integer, and the
    // comparable total cost(k) = SSE₁ + SSE₂ =
    //   (n₁Q₁−P₁²)/n₁ + (n₂Q₂−P₂²)/n₂ — two exact-integer rationals
    // whose double sum (fixed op order) is the deterministic sort
    // key; ties break on the earlier day. Day-grain prefix sums ride
    // one calendar-bounded running window; the argmin is rn=1.
    QueryDef.sql(
      "a71_changepoint",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |pre AS (
        |  SELECT day, x,
        |    row_number() OVER (ORDER BY day) AS k,
        |    CAST(sum(CAST(x AS HUGEINT)) OVER (ORDER BY day) AS HUGEINT) AS p,
        |    CAST(sum(CAST(x AS HUGEINT) * x) OVER (ORDER BY day) AS HUGEINT) AS q
        |  FROM daily),
        |tot AS (
        |  SELECT CAST(max(k) AS HUGEINT) AS n, max(p) AS tp, max(q) AS tq
        |  FROM pre),
        |cand AS (
        |  SELECT day, k,
        |    CAST(k * q - p * p AS DOUBLE) / CAST(k AS DOUBLE)
        |      + CAST((n - k) * (tq - q) - (tp - p) * (tp - p) AS DOUBLE)
        |        / CAST(n - k AS DOUBLE) AS cost,
        |    CAST(p AS DOUBLE) / CAST(k * 100 AS DOUBLE) AS mean_before,
        |    CAST(tp - p AS DOUBLE) / CAST((n - k) * 100 AS DOUBLE) AS mean_after
        |  FROM pre CROSS JOIN tot WHERE k < n)
        |SELECT day AS split_day, CAST(k AS BIGINT) AS k,
        |  round(cost, 4) AS sse_total,
        |  round(mean_before, 6) AS mean_before_dollars,
        |  round(mean_after, 6) AS mean_after_dollars
        |FROM (SELECT *, row_number() OVER (ORDER BY cost, day) AS rn FROM cand)
        |WHERE rn = 1""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"))
      val wD = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pre = daily
        .withColumn("k", row_number().over(Window.orderBy(col("day"))).cast(dec))
        .withColumn("p", sum(col("x").cast(dec)).over(wD))
        .withColumn("q", sum(col("x").cast(dec) * col("x")).over(wD))
      val tot = pre.agg(max(col("k")).as("n"), max(col("p")).as("tp"),
        max(col("q")).as("tq"))
      val cand = pre.crossJoin(broadcast(tot)).filter(col("k") < col("n"))
        .select(col("day"), col("k"),
          ((col("k") * col("q") - col("p") * col("p")).cast("double")
            / col("k").cast("double")
            + ((col("n") - col("k")) * (col("tq") - col("q"))
              - (col("tp") - col("p")) * (col("tp") - col("p"))).cast("double")
              / (col("n") - col("k")).cast("double")).as("cost"),
          (col("p").cast("double") / (col("k") * 100).cast("double")).as("mean_before"),
          ((col("tp") - col("p")).cast("double")
            / ((col("n") - col("k")) * 100).cast("double")).as("mean_after"))
      val wC = Window.orderBy(col("cost"), col("day"))
      cand.withColumn("rn", row_number().over(wC)).filter(col("rn") === 1)
        .select(col("day").as("split_day"), col("k").cast("long").as("k"),
          round(col("cost"), 4).as("sse_total"),
          round(col("mean_before"), 6).as("mean_before_dollars"),
          round(col("mean_after"), 6).as("mean_after_dollars"))
    },

    // ---- EV53: behavioral bot detection -------------------------------------
    // Humans are bursty; scripts are metronomes. Per user, the
    // inter-event gap series yields exact integer-µs moments
    // (n, Σg, Σg²); the coefficient-of-variation test flags users
    // whose n·Σg² − (Σg)² (the n²·variance, exact) falls below
    // (0.5·Σg)² — i.e. CV < 0.5 — COMPARED ENTIRELY IN INTEGERS
    // (cross-multiplied, no division in the verdict). The report
    // ships counts + the flagged cohort's share; per-user windows
    // partition on user_id.
    QueryDef.sql(
      "ev53_bot_detection",
      """WITH gaps AS (
        |  SELECT user_id,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER w) AS g
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |per_user AS (
        |  SELECT user_id, CAST(count(g) AS BIGINT) AS n,
        |    CAST(sum(CAST(g AS HUGEINT)) AS HUGEINT) AS sg,
        |    CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS sgg
        |  FROM gaps WHERE g IS NOT NULL GROUP BY 1),
        |verdict AS (
        |  SELECT user_id, n,
        |    (n >= 20 AND 4 * (n * sgg - sg * sg) < sg * sg) AS is_bot
        |  FROM per_user)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(count(*) FILTER (WHERE is_bot) AS BIGINT) AS n_bots,
        |  round(CAST(count(*) FILTER (WHERE is_bot) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS bot_frac,
        |  CAST(min(CASE WHEN is_bot THEN user_id END) AS BIGINT) AS first_bot_id
        |FROM verdict""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val wU = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gaps = Tables.events(s, d)
        .select(col("user_id"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wU))).as("g"))
        .filter(col("g").isNotNull)
      val perUser = gaps.groupBy(col("user_id"))
        .agg(count(col("g")).as("n"),
          sum(col("g").cast(dec)).as("sg"),
          sum(col("g").cast(dec) * col("g")).as("sgg"))
      val verdict = perUser.select(col("user_id"), col("n"),
        (col("n") >= 20 &&
          lit(4) * (col("n") * col("sgg") - col("sg") * col("sg"))
            < col("sg") * col("sg")).as("is_bot"))
      verdict.agg(count(lit(1)).as("n_users"),
        count(when(col("is_bot"), 1)).as("n_bots"),
        round(count(when(col("is_bot"), 1)).cast("double")
          / count(lit(1)).cast("double"), 6).as("bot_frac"),
        min(when(col("is_bot"), col("user_id"))).cast("long").as("first_bot_id"))
    },

    // ---- A72: Cramér's V ----------------------------------------------------
    // The effect size a39's chi² lacks: V = sqrt(χ²/(N·min(r−1,c−1)))
    // for segment×priority. χ² accumulates a39's way — each cell term
    // (O·N − r·c)²/(N·r·c) rounds to 8 dp and sums as DECIMAL
    // (order-independent) — then one sqrt, round 6.
    QueryDef.sql(
      "a72_cramers_v",
      """WITH ct AS (
        |  SELECT c_mktsegment AS seg, o_orderpriority AS pri,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rm AS (SELECT seg, CAST(sum(o) AS BIGINT) AS r FROM ct GROUP BY 1),
        |cm AS (SELECT pri, CAST(sum(o) AS BIGINT) AS c FROM ct GROUP BY 1),
        |nn AS (
        |  SELECT CAST(sum(o) AS BIGINT) AS n,
        |    CAST((SELECT count(*) FROM rm) AS BIGINT) AS nr,
        |    CAST((SELECT count(*) FROM cm) AS BIGINT) AS nc
        |  FROM ct),
        |terms AS (
        |  SELECT CAST(round(
        |      CAST((ct.o * n - r * c) * (ct.o * n - r * c) AS DOUBLE)
        |        / CAST(n * r * c AS DOUBLE), 8) AS DECIMAL(20,8)) AS term,
        |    n, nr, nc
        |  FROM ct JOIN rm ON ct.seg = rm.seg JOIN cm ON ct.pri = cm.pri CROSS JOIN nn)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS chi2,
        |  round(sqrt(CAST(sum(term) AS DOUBLE)
        |    / CAST(max(n) * least(max(nr) - 1, max(nc) - 1) AS DOUBLE)), 6) AS cramers_v
        |FROM terms""".stripMargin) { (s, d) =>
      val ct = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("o"))
      val rm = ct.groupBy(col("seg")).agg(sum(col("o")).as("r"))
      val cm = ct.groupBy(col("pri")).agg(sum(col("o")).as("c"))
      val nn = ct.agg(sum(col("o")).as("n")).crossJoin(
          rm.agg(count(lit(1)).as("nr"))).crossJoin(
          cm.agg(count(lit(1)).as("nc")))
      val terms = ct.join(broadcast(rm), Seq("seg")).join(broadcast(cm), Seq("pri"))
        .crossJoin(broadcast(nn))
        .select(round(
          ((col("o") * col("n") - col("r") * col("c"))
            * (col("o") * col("n") - col("r") * col("c"))).cast("double")
            / (col("n") * col("r") * col("c")).cast("double"), 8)
          .cast(DecimalType(20, 8)).as("term"),
          col("n"), col("nr"), col("nc"))
      terms.agg(count(lit(1)).as("n_cells"),
        round(sum(col("term")).cast("double"), 6).as("chi2"),
        round(sqrt(sum(col("term")).cast("double")
          / (max(col("n")) * least(max(col("nr")) - 1, max(col("nc")) - 1))
            .cast("double")), 6).as("cramers_v"))
    }
  )
}
