package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Fifty-fourth frontier batch: exact Holt double-exponential smoothing,
  * Mantel–Haenszel stratified odds ratio, exact two-sample KS test.
  */
object Frontier54Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- W15: Holt double-exponential smoothing, EXACT ----------------------
    // Level+trend smoothing (α=β=½) — a SEQUENTIAL recurrence that
    // iterative float math could never oracle (w7's lesson, squared:
    // TWO coupled recurrences). Multiplying through by 4ᵗ turns both
    // into integer arithmetic: L_t = 2P·x + 2L + 2B, B_t = P·x − L + 3B,
    // P_t = 4P (so l = L/P, b = B/P exactly). The day series folds as a
    // sorted list with a 3-slot DECIMAL(38,0) accumulator — bit-exact in
    // any engine; 4³⁰·cents ≈ 10²⁵ sits far inside DECIMAL(38). Per-day
    // states come from prefix folds (bounded: T = calendar days, the
    // KM/w7 bounded-grain discipline); micro units divide only at
    // output. Forecast(t+1) = l + b.
    QueryDef.sql(
      "w15_holt_smoothing",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS HUGEINT) AS x
        |  FROM events GROUP BY 1),
        |arr AS (
        |  SELECT list(x ORDER BY day) AS xs, list(day ORDER BY day) AS days,
        |    CAST(count(*) AS INT) AS t
        |  FROM daily),
        |states AS (
        |  SELECT unnest(list_transform(range(1, t + 1), i -> {
        |      'day': days[i],
        |      'st': list_reduce(list_prepend([CAST(0 AS HUGEINT), 0, 0],
        |          list_transform(xs[1:i], v -> [v, v, v])),
        |        (acc, e) -> CASE WHEN acc[3] = 0
        |          THEN [4 * e[1], CAST(0 AS HUGEINT), CAST(4 AS HUGEINT)]
        |          ELSE [2 * acc[3] * e[1] + 2 * acc[1] + 2 * acc[2],
        |                acc[3] * e[1] - acc[1] + 3 * acc[2],
        |                4 * acc[3]] END)
        |    })) AS u
        |  FROM arr)
        |SELECT u.day AS day,
        |  CAST(u.st[1] * 1000000 // u.st[3] AS BIGINT) AS level_cents_micro,
        |  CAST(CASE WHEN u.st[2] >= 0 THEN u.st[2] * 1000000 // u.st[3]
        |       ELSE -((-u.st[2]) * 1000000 // u.st[3]) END AS BIGINT)
        |    AS trend_cents_micro,
        |  CAST(CASE WHEN u.st[1] + u.st[2] >= 0
        |       THEN (u.st[1] + u.st[2]) * 1000000 // u.st[3]
        |       ELSE -((-(u.st[1] + u.st[2])) * 1000000 // u.st[3]) END AS BIGINT)
        |    AS forecast_cents_micro
        |FROM states ORDER BY day""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L))
          .cast("decimal(38,0)").as("x"))
      val arr = daily.agg(
        transform(array_sort(collect_list(struct(col("day"), col("x")))),
          e => e.getField("x")).as("xs"),
        sort_array(collect_list(col("day"))).as("days"),
        count(lit(1)).cast("int").as("t"))
      // prefix folds: state after i days = fold over xs[1..i]; the
      // truncated-floor division of a NEGATIVE trend must floor toward
      // zero identically in both engines, hence the sign-split output
      val states = arr.select(explode(expr(
        """transform(sequence(1, t), i -> struct(
          |  element_at(days, i) as day,
          |  aggregate(slice(xs, 1, i),
          |    array(cast(0 as decimal(38,0)), cast(0 as decimal(38,0)),
          |          cast(0 as decimal(38,0))),
          |    (acc, v) -> IF(acc[2] = 0,
          |      array(cast(4 * v as decimal(38,0)), cast(0 as decimal(38,0)),
          |            cast(4 as decimal(38,0))),
          |      array(cast(2 * acc[2] * v + 2 * acc[0] + 2 * acc[1] as decimal(38,0)),
          |            cast(acc[2] * v - acc[0] + 3 * acc[1] as decimal(38,0)),
          |            cast(4 * acc[2] as decimal(38,0))))) as st))""".stripMargin))
        .as("r"))
      states.select(col("r.day").as("day"),
        expr("cast(r.st[0] * 1000000 div r.st[2] as bigint)").as("level_cents_micro"),
        expr("""cast(IF(r.st[1] >= 0, r.st[1] * 1000000 div r.st[2],
                -((-r.st[1]) * 1000000 div r.st[2])) as bigint)""")
          .as("trend_cents_micro"),
        expr("""cast(IF(r.st[0] + r.st[1] >= 0,
                  (r.st[0] + r.st[1]) * 1000000 div r.st[2],
                  -((-(r.st[0] + r.st[1])) * 1000000 div r.st[2])) as bigint)""")
          .as("forecast_cents_micro"))
        .orderBy(col("day"))
    },

    // ---- A113: Mantel–Haenszel pooled odds ratio ----------------------------
    // a108 detects Simpson's paradox; Mantel–Haenszel answers the next
    // question — what is the confounder-adjusted effect? OR_MH =
    // Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ), made EXACT by multiplying through by
    // Πnⱼ (3 strata, Π ≤ ~10¹⁰): each term becomes aᵢdᵢ·(Π div nᵢ),
    // an integer since nᵢ | Π. The strata product folds from a
    // collect_list (commutative integer product — order-free, unlike
    // the float products the KM batch had to sort). Output: per-stratum
    // 2×2 cells + crude OR, with the pooled MH estimate broadcast onto
    // every row (a108's verdict discipline).
    QueryDef.sql(
      "a113_mantel_haenszel",
      """WITH pu AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_ev,
        |    CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS INT)
        |      AS treated,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT)
        |      AS conv
        |  FROM events GROUP BY 1, 2),
        |cells AS (
        |  SELECT CASE WHEN n_ev <= 1 THEN 'one'
        |      WHEN n_ev <= 2 THEN 'two' ELSE 'many' END AS stratum,
        |    CAST(count(*) FILTER (WHERE treated = 1 AND conv = 1) AS BIGINT) AS a,
        |    CAST(count(*) FILTER (WHERE treated = 1 AND conv = 0) AS BIGINT) AS b,
        |    CAST(count(*) FILTER (WHERE treated = 0 AND conv = 1) AS BIGINT) AS c,
        |    CAST(count(*) FILTER (WHERE treated = 0 AND conv = 0) AS BIGINT) AS d
        |  FROM pu GROUP BY 1),
        |tot AS (
        |  SELECT list_reduce(list(CAST(a + b + c + d AS HUGEINT)), (x, y) -> x * y)
        |    AS p
        |  FROM cells),
        |mh AS (
        |  SELECT CAST(CASE WHEN
        |      (SELECT sum(c2.b * c2.c * (t.p // (c2.a + c2.b + c2.c + c2.d)))
        |        FROM cells c2, tot t) > 0 THEN
        |      (SELECT sum(c2.a * c2.d * (t.p // (c2.a + c2.b + c2.c + c2.d)))
        |        FROM cells c2, tot t) * 1000000
        |      // (SELECT sum(c2.b * c2.c * (t.p // (c2.a + c2.b + c2.c + c2.d)))
        |        FROM cells c2, tot t) END AS BIGINT) AS or_mh_micro)
        |SELECT c.stratum, c.a, c.b, c.c, c.d,
        |  CAST(CASE WHEN c.b * c.c > 0 THEN (c.a * c.d * 1000000) // (c.b * c.c)
        |    END AS BIGINT) AS or_crude_micro,
        |  m.or_mh_micro
        |FROM cells c CROSS JOIN mh m ORDER BY c.stratum""".stripMargin) { (s, d) =>
      val pu = Tables.events(s, d)
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_ev"),
          max(when(col("event_type") === "click", 1).otherwise(0)).as("treated"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      val cells = pu.groupBy(
          when(col("n_ev") <= 1, "one").when(col("n_ev") <= 2, "two")
            .otherwise("many").as("stratum"))
        .agg(count(when(col("treated") === 1 && col("conv") === 1, 1)).as("a"),
          count(when(col("treated") === 1 && col("conv") === 0, 1)).as("b"),
          count(when(col("treated") === 0 && col("conv") === 1, 1)).as("c"),
          count(when(col("treated") === 0 && col("conv") === 0, 1)).as("d"))
        .localCheckpoint(true) // 3-row crumb feeding product + per-stratum output
      val mh = cells
        .agg(aggregate(collect_list((col("a") + col("b") + col("c") + col("d"))
            .cast("decimal(38,0)")), lit(1L).cast("decimal(38,0)"),
            (acc, n) => (acc * n).cast("decimal(38,0)")).as("p"),
          collect_list(struct(col("a"), col("b"), col("c"), col("d"))).as("cs"))
        .select(
          (expr("""aggregate(cs, cast(0 as decimal(38,0)),
                 (acc, e) -> cast(acc + e.a * e.d * (p div (e.a + e.b + e.c + e.d))
                             as decimal(38,0)))""")
            * 1000000L).as("num"),
          expr("""aggregate(cs, cast(0 as decimal(38,0)),
                (acc, e) -> cast(acc + e.b * e.c * (p div (e.a + e.b + e.c + e.d))
                            as decimal(38,0)))""")
            .as("den"))
        .select(expr("cast(IF(den > 0, num div den, NULL) as bigint)")
          .as("or_mh_micro"))
      cells.crossJoin(broadcast(mh))
        .select(col("stratum"), col("a"), col("b"), col("c"), col("d"),
          when(col("b") * col("c") > 0,
            expr("(a * d * 1000000) div (b * c)")).cast("long").as("or_crude_micro"),
          col("or_mh_micro"))
        .orderBy(col("stratum"))
    },

    // ---- A114: exact two-sample Kolmogorov–Smirnov test ---------------------
    // a112's rank test compares locations; KS compares whole CDFs —
    // D = max|F̂₁ − F̂₂|, exact by cross-multiplication (the a110 EMD
    // trick at the max instead of the sum): D_scaled = max|cum₁·n₂ −
    // cum₂·n₁| over pooled distinct values. Significance (α=0.05,
    // c=1.358) squares away the sqrt: 10⁶·D² > 1.358²·10⁶·(n₁+n₂)·n₁n₂
    // — all BIGINT at day grain. One day-partitioned cumulative window
    // over value-grain counts; everything else crumb algebra.
    QueryDef.sql(
      "a114_ks_test",
      """WITH v AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |cnt AS (
        |  SELECT day, cents,
        |    CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS c1,
        |    CAST(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS c2
        |  FROM v GROUP BY 1, 2),
        |cum AS (
        |  SELECT day,
        |    CAST(sum(c1) OVER w AS BIGINT) AS cum1,
        |    CAST(sum(c2) OVER w AS BIGINT) AS cum2,
        |    CAST(sum(c1) OVER (PARTITION BY day) AS BIGINT) AS n1,
        |    CAST(sum(c2) OVER (PARTITION BY day) AS BIGINT) AS n2
        |  FROM cnt WINDOW w AS (PARTITION BY day ORDER BY cents)),
        |ks AS (
        |  SELECT day, max(n1) AS n1, max(n2) AS n2,
        |    max(abs(cum1 * n2 - cum2 * n1)) AS d_scaled
        |  FROM cum GROUP BY 1)
        |SELECT day, n1, n2, CAST(d_scaled AS BIGINT) AS d_scaled,
        |  CAST((d_scaled * 1000000) // (n1 * n2) AS BIGINT) AS d_micro,
        |  CAST(1000000 * CAST(d_scaled AS HUGEINT) * d_scaled >
        |    1844164 * CAST(n1 + n2 AS HUGEINT) * n1 * n2 AS INT) AS significant
        |FROM ks ORDER BY day""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("ts").cast("date").as("day"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("grp"),
          floor(col("value") * 100).cast("long").as("cents"))
      val cnt = v.groupBy(col("day"), col("cents"))
        .agg(count(when(col("grp") === 1, 1)).as("c1"),
          count(when(col("grp") === 0, 1)).as("c2"))
      val byDay = Window.partitionBy(col("day"))
      val cum = cnt.select(col("day"),
        sum(col("c1")).over(byDay.orderBy(col("cents"))).as("cum1"),
        sum(col("c2")).over(byDay.orderBy(col("cents"))).as("cum2"),
        sum(col("c1")).over(byDay).as("n1"),
        sum(col("c2")).over(byDay).as("n2"))
      cum.groupBy(col("day"))
        .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
          max(abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
            .as("d_scaled"))
        .select(col("day"), col("n1"), col("n2"),
          col("d_scaled").cast("long").as("d_scaled"),
          expr("cast((d_scaled * 1000000) div (n1 * n2) as bigint)").as("d_micro"),
          (lit(1000000L) * col("d_scaled").cast("decimal(38,0)") * col("d_scaled") >
            lit(1844164L) * (col("n1") + col("n2")).cast("decimal(38,0)") *
              col("n1") * col("n2"))
            .cast("int").as("significant"))
        .orderBy(col("day"))
    }
  )
}
