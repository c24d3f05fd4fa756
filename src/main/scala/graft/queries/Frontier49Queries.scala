package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Forty-ninth frontier batch: cross-correlation lead–lag finder,
  * Simpson's-paradox detector, quiet-user absence detection.
  */
object Frontier49Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A105: cross-correlation lead–lag finder -----------------------------
    // "Do clicks lead purchases, and by how many days?" — the
    // cross-series sibling of the ACF: corr(purchase_cents[t],
    // clicks[t−ℓ]) for ℓ = 0..14, each lag an exact-moment
    // computation over the day-grain join (a104's signed-r²·10⁶
    // discipline: sqrt eliminated by squaring, DECIMAL(38,0) moments,
    // degenerate-variance guard). The corpus collapses to ONE day-grain
    // table before any lag algebra — 15 lags cost 15 crumb-joins, not
    // 15 scans. best-lag ranking rides along (|r²| DESC, lag ASC).
    QueryDef.sql(
      "a105_lead_lag",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS pc,
        |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS ck
        |  FROM events GROUP BY 1),
        |lags AS (SELECT unnest(generate_series(0, 14)) AS lag),
        |joined AS (
        |  SELECT l.lag, a.pc AS x, b.ck AS y
        |  FROM lags l
        |  JOIN daily a ON true
        |  JOIN daily b ON b.day = a.day - CAST(l.lag AS INT)),
        |mom AS (
        |  SELECT lag, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        |  FROM joined GROUP BY 1),
        |scored AS (
        |  SELECT lag, CAST(n AS BIGINT) AS n_days,
        |    n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS den1, n * syy - sy * sy AS den2
        |  FROM mom),
        |final AS (
        |  SELECT CAST(lag AS INT) AS lag, n_days,
        |    CAST(CASE WHEN den1 > 0 AND den2 > 0 THEN
        |      (CASE WHEN num >= 0 THEN 1 ELSE -1 END)
        |        * ((num * num * 1000000) // (den1 * den2))
        |      ELSE NULL END AS BIGINT) AS r2_signed_micro
        |  FROM scored)
        |SELECT lag, n_days, r2_signed_micro,
        |  CAST(row_number() OVER (ORDER BY abs(coalesce(r2_signed_micro, -1)) DESC,
        |    lag) AS INT) AS strength_rank
        |FROM final""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
            floor(col("value") * 100).cast("long")).otherwise(0L)).as("pc"),
          count(when(col("event_type") === "click", 1)).as("ck"))
        .localCheckpoint(true) // day-grain crumb table reused by all 15 lags
      val lags = s.range(0, 15).select(col("id").cast("int").as("lag"))
      val b = daily.select(col("day").as("bday"), col("ck").as("y"))
      val joined = daily.crossJoin(broadcast(lags))
        .join(b, col("bday") === expr("date_sub(day, lag)"))
        .select(col("lag"), col("pc").cast(dec).as("x"), col("y").cast(dec).as("y"))
      val mom = joined.groupBy(col("lag"))
        .agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
      val scored = mom.select(col("lag"), col("n").cast("long").as("n_days"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den1"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("den2"))
      val fin = scored.select(col("lag"), col("n_days"),
        when(col("den1") > 0 && col("den2") > 0,
          when(col("num") >= 0, 1).otherwise(-1)
            * expr("(num * num * 1000000) div (den1 * den2)"))
          .otherwise(lit(null)).cast("long").as("r2_signed_micro"))
      fin.withColumn("strength_rank",
        row_number().over(Window.orderBy(
          abs(coalesce(col("r2_signed_micro"), lit(-1L))).desc, col("lag")))
          .cast("int"))
    },

    // ---- A108: Simpson's-paradox detector ------------------------------------
    // The analytics landmine, detected exactly: does "signed-up users
    // convert better" hold in the pooled population but FLIP inside
    // every activity stratum? Rate comparisons are cross-multiplied
    // (sign(conv_t·n_c − conv_c·n_t)) so no division touches the
    // verdict; strata are fixed activity bands (≤60 / 61–72 / ≥73
    // events — no ntile, no unpartitioned window); the paradox flag
    // requires a nonzero pooled sign with every populated stratum
    // zero-or-opposite. One user-grain shuffle, then crumb algebra.
    QueryDef.sql(
      "a108_simpsons_paradox",
      """WITH pu AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
        |    CAST(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS INT)
        |      AS treated,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT)
        |      AS conv
        |  FROM events GROUP BY 1),
        |bands AS (
        |  SELECT CASE WHEN n_ev <= 60 THEN 'low'
        |    WHEN n_ev <= 72 THEN 'mid' ELSE 'high' END AS stratum,
        |    treated, conv
        |  FROM pu),
        |cells AS (
        |  SELECT stratum,
        |    CAST(count(*) FILTER (WHERE treated = 1) AS BIGINT) AS n_t,
        |    CAST(sum(conv) FILTER (WHERE treated = 1) AS BIGINT) AS c_t,
        |    CAST(count(*) FILTER (WHERE treated = 0) AS BIGINT) AS n_c,
        |    CAST(sum(conv) FILTER (WHERE treated = 0) AS BIGINT) AS c_c
        |  FROM bands GROUP BY 1
        |  UNION ALL
        |  SELECT 'pooled',
        |    CAST(count(*) FILTER (WHERE treated = 1) AS BIGINT),
        |    CAST(sum(conv) FILTER (WHERE treated = 1) AS BIGINT),
        |    CAST(count(*) FILTER (WHERE treated = 0) AS BIGINT),
        |    CAST(sum(conv) FILTER (WHERE treated = 0) AS BIGINT)
        |  FROM bands),
        |signed AS (
        |  SELECT stratum, n_t, n_c,
        |    CAST(CASE WHEN n_t > 0 THEN (c_t * 1000000) // n_t END AS BIGINT)
        |      AS rate_t_micro,
        |    CAST(CASE WHEN n_c > 0 THEN (c_c * 1000000) // n_c END AS BIGINT)
        |      AS rate_c_micro,
        |    CAST(CASE WHEN n_t = 0 OR n_c = 0 THEN 0
        |      WHEN c_t * n_c > c_c * n_t THEN 1
        |      WHEN c_t * n_c < c_c * n_t THEN -1 ELSE 0 END AS INT) AS sgn
        |  FROM cells),
        |verdict AS (
        |  SELECT CAST(
        |    max(CASE WHEN stratum = 'pooled' THEN sgn END) <> 0
        |    AND max(CASE WHEN stratum = 'pooled' THEN sgn END)
        |      * max(CASE WHEN stratum <> 'pooled' THEN sgn END) <= 0
        |    AND max(CASE WHEN stratum = 'pooled' THEN sgn END)
        |      * min(CASE WHEN stratum <> 'pooled' THEN sgn END) <= 0
        |    AS INT) AS paradox
        |  FROM signed)
        |SELECT s.stratum, s.n_t, s.n_c, s.rate_t_micro, s.rate_c_micro, s.sgn,
        |  v.paradox
        |FROM signed s CROSS JOIN verdict v""".stripMargin) { (s, d) =>
      val pu = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ev"),
          max(when(col("event_type") === "signup", 1).otherwise(0)).as("treated"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      val bands = pu.select(
        when(col("n_ev") <= 60, "low").when(col("n_ev") <= 72, "mid")
          .otherwise("high").as("stratum"),
        col("treated"), col("conv"))
        .localCheckpoint(true) // feeds per-stratum and pooled branches
      def cells(df: DataFrame, label: Column, by: Seq[Column]): DataFrame =
        df.groupBy(by: _*).agg(
          count(when(col("treated") === 1, 1)).as("n_t"),
          sum(when(col("treated") === 1, col("conv")).otherwise(0)).cast("long").as("c_t"),
          count(when(col("treated") === 0, 1)).as("n_c"),
          sum(when(col("treated") === 0, col("conv")).otherwise(0)).cast("long").as("c_c"))
          .withColumn("stratum", label)
      val perStratum = cells(bands, col("stratum"), Seq(col("stratum")))
      val pooled = cells(bands, lit("pooled"), Seq.empty)
      val signedDf = perStratum.select(col("stratum"), col("n_t"), col("c_t"),
          col("n_c"), col("c_c"))
        .unionByName(pooled.select(col("stratum"), col("n_t"), col("c_t"),
          col("n_c"), col("c_c")))
        .select(col("stratum"), col("n_t"), col("n_c"),
          when(col("n_t") > 0, expr("c_t * 1000000 div n_t")).cast("long")
            .as("rate_t_micro"),
          when(col("n_c") > 0, expr("c_c * 1000000 div n_c")).cast("long")
            .as("rate_c_micro"),
          when(col("n_t") === 0 || col("n_c") === 0, 0)
            .when(col("c_t") * col("n_c") > col("c_c") * col("n_t"), 1)
            .when(col("c_t") * col("n_c") < col("c_c") * col("n_t"), -1)
            .otherwise(0).cast("int").as("sgn"))
        .localCheckpoint(true) // 4-row crumb feeding the verdict + output
      val verdict = signedDf.agg(
        (max(when(col("stratum") === "pooled", col("sgn"))) =!= 0
          && max(when(col("stratum") === "pooled", col("sgn")))
            * max(when(col("stratum") =!= "pooled", col("sgn"))) <= 0
          && max(when(col("stratum") === "pooled", col("sgn")))
            * min(when(col("stratum") =!= "pooled", col("sgn"))) <= 0)
          .cast("int").as("paradox"))
      signedDf.crossJoin(broadcast(verdict))
    },

    // ---- EV68: quiet-user (absence) detection ---------------------------------
    // Churn's leading indicator is silence: a user whose time since
    // their LAST event exceeds 3× their own median inter-event gap.
    // The per-user median gap is the exact middle-rank form (w8/a21
    // discipline) kept in integers by comparing 2·silence > 3·med2
    // where med2 = the SUM of the two middle gaps — cross-multiplied,
    // no division anywhere. "Now" is the corpus max timestamp. Gaps
    // ride per-user windows (bounded grain); the report buckets users
    // by the a108 activity bands.
    QueryDef.sql(
      "ev68_quiet_users",
      """WITH mx AS (SELECT max(epoch_us(ts)) AS now_us FROM events),
        |gaps AS (
        |  SELECT user_id,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER w) AS g,
        |    row_number() OVER w AS seq
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |gstats AS (
        |  SELECT user_id, CAST(count(g) AS BIGINT) AS m
        |  FROM gaps WHERE g IS NOT NULL GROUP BY 1),
        |ranked AS (
        |  SELECT g.user_id, g.g,
        |    row_number() OVER (PARTITION BY g.user_id ORDER BY g.g, g.seq) AS rk,
        |    s.m
        |  FROM gaps g JOIN gstats s ON g.user_id = s.user_id
        |  WHERE g.g IS NOT NULL),
        |med AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN rk = (m + 1) // 2 OR rk = (m + 2) // 2
        |      THEN g ELSE 0 END) AS BIGINT)
        |      * (CASE WHEN (m + 1) // 2 = (m + 2) // 2 THEN 2 ELSE 1 END) AS med2
        |  FROM ranked GROUP BY user_id, m),
        |lastev AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
        |    max(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY 1),
        |flags AS (
        |  SELECT l.user_id,
        |    CASE WHEN l.n_ev <= 60 THEN 'low'
        |      WHEN l.n_ev <= 72 THEN 'mid' ELSE 'high' END AS band,
        |    CAST(2 * (x.now_us - l.last_us) > 3 * m.med2 AS INT) AS quiet
        |  FROM lastev l JOIN med m ON l.user_id = m.user_id CROSS JOIN mx x)
        |SELECT band, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(quiet) AS BIGINT) AS n_quiet,
        |  CAST((sum(quiet) * 1000) // count(*) AS BIGINT) AS quiet_permille
        |FROM flags GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gaps = ev.select(col("user_id"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("g"),
          row_number().over(w).as("seq"))
        .filter(col("g").isNotNull)
        .localCheckpoint(true) // feeds counts + ranked medians
      val gstats = gaps.groupBy(col("user_id")).agg(count(lit(1)).as("m"))
      val ranked = gaps.join(gstats, "user_id")
        .withColumn("rk", row_number().over(Window.partitionBy(col("user_id"))
          .orderBy(col("g"), col("seq"))))
      val med = ranked.groupBy(col("user_id"), col("m"))
        .agg(sum(when(col("rk") === expr("(m + 1) div 2")
            || col("rk") === expr("(m + 2) div 2"), col("g")).otherwise(0L))
          .as("s2"))
        .select(col("user_id"),
          (col("s2") * when(expr("(m + 1) div 2 = (m + 2) div 2"), 2).otherwise(1))
            .cast("long").as("med2"))
      val lastev = ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ev"), max(unix_micros(col("ts"))).as("last_us"))
      val mx = ev.agg(max(unix_micros(col("ts"))).as("now_us"))
      lastev.join(med, "user_id").crossJoin(broadcast(mx))
        .select(
          when(col("n_ev") <= 60, "low").when(col("n_ev") <= 72, "mid")
            .otherwise("high").as("band"),
          (lit(2) * (col("now_us") - col("last_us")) > lit(3) * col("med2"))
            .cast("int").as("quiet"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_users"), sum(col("quiet")).cast("long").as("n_quiet"),
          expr("sum(quiet) * 1000 div count(*)").cast("long").as("quiet_permille"))
        .orderBy(col("band"))
    }
  )
}
