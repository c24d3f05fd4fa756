package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Forty-first frontier batch: position-based attribution, Bloom-filter
  * capacity planning, Gini decision stump, discrete derivatives.
  */
object Frontier41Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- EV64: position-based (U-shaped) multi-touch attribution -----------
    // ev17 answered first/last; this splits conversion credit 40/20/40
    // across the whole journey in EXACT integer basis points: solo
    // touch 10000, pair 5000/5000, longer journeys 4000 to each
    // endpoint and 2000 across the middles by integer division with
    // the remainder pinned to the EARLIEST middle — so every
    // conversion's credit sums to exactly 10000 (spec-checked). The
    // touch↔conversion association reuses the bucketized range join
    // (one shuffle on (user, bucket)); position windows partition per
    // conversion.
    QueryDef.sql(
      "ev64_position_attribution",
      """WITH conv AS (
        |  SELECT user_id, event_id AS conv_id, epoch_us(ts) AS hi,
        |    epoch_us(ts) - 86400000000 AS lo
        |  FROM events WHERE event_type = 'purchase'),
        |tch AS (
        |  SELECT user_id, event_id AS touch_id, event_type AS channel,
        |    epoch_us(ts) AS p
        |  FROM events WHERE event_type IN ('view', 'click', 'signup')),
        |r AS (
        |  SELECT c.conv_id, t.channel, t.touch_id, t.p
        |  FROM conv c JOIN tch t
        |    ON c.user_id = t.user_id AND t.p >= c.lo AND t.p < c.hi),
        |pos AS (
        |  SELECT conv_id, channel,
        |    row_number() OVER (PARTITION BY conv_id ORDER BY p, touch_id) AS rf,
        |    count(*) OVER (PARTITION BY conv_id) AS n
        |  FROM r),
        |bp AS (
        |  SELECT channel,
        |    CASE WHEN n = 1 THEN 10000
        |         WHEN n = 2 THEN 5000
        |         WHEN rf = 1 OR rf = n THEN 4000
        |         ELSE 2000 // (n - 2)
        |           + CASE WHEN rf = 2 THEN 2000 % (n - 2) ELSE 0 END END AS credit
        |  FROM pos),
        |agg AS (
        |  SELECT channel, CAST(count(*) AS BIGINT) AS n_touches,
        |    CAST(sum(credit) AS BIGINT) AS credit_bp
        |  FROM bp GROUP BY 1),
        |tot AS (SELECT CAST(sum(credit_bp) AS BIGINT) AS t FROM agg)
        |SELECT channel, n_touches, credit_bp,
        |  round(CAST(credit_bp AS DOUBLE) / CAST(t AS DOUBLE), 6) AS credit_share
        |FROM agg CROSS JOIN tot""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val windowUs = 24L * 3600 * 1000000
      val conv = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("event_id").as("conv_id"),
        (unix_micros(col("ts")) - windowUs).as("lo_us"),
        unix_micros(col("ts")).as("hi_us"))
      val tch = ev.filter(col("event_type").isin("view", "click", "signup")).select(
        col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"), unix_micros(col("ts")).as("p_us"))
      val r = graft.operators.RangeJoin.pointInInterval(tch, conv, Seq("user_id"),
          "p_us", "lo_us", "hi_us", bucketWidth = windowUs)
        .select(col("conv_id"), col("channel"), col("touch_id"), col("p_us"))
      val wf = Window.partitionBy(col("conv_id")).orderBy(col("p_us"), col("touch_id"))
      val wn = Window.partitionBy(col("conv_id"))
      val pos = r.withColumn("rf", row_number().over(wf))
        .withColumn("n", count(lit(1)).over(wn))
      val credit = when(col("n") === 1, 10000L)
        .when(col("n") === 2, 5000L)
        .when(col("rf") === 1 || col("rf") === col("n"), 4000L)
        .otherwise(expr("2000 div (n - 2)")
          + when(col("rf") === 2, expr("2000 % (n - 2)")).otherwise(0L))
      val agg = pos.select(col("channel"), credit.as("credit"))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touches"), sum(col("credit")).as("credit_bp"))
      val tot = agg.agg(sum(col("credit_bp")).as("t"))
      agg.crossJoin(broadcast(tot))
        .select(col("channel"), col("n_touches"), col("credit_bp"),
          round(col("credit_bp").cast("double") / col("t").cast("double"), 6)
            .as("credit_share"))
    },

    // ---- U36: Bloom-filter capacity planner --------------------------------
    // The sizing pass before j7's runtime Bloom pruning: for each key
    // domain, the bits and hash count a 1%-FPR filter needs. The
    // irrational constant −ln p/ln²2 is PRECOMPUTED into the integer
    // literal 9585059 micro-bits/key (no libm in the data path, the
    // a92 discipline), so bits = ⌈n·9.585059⌉ and bytes = ⌈bits/8⌉ are
    // exact ceiling divisions; k = 7 hashes for p = 1%. One distinct-
    // count per domain.
    QueryDef.sql(
      "u36_bloom_plan",
      """WITH domains AS (
        |  SELECT 'orders.custkey' AS domain,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_keys FROM orders
        |  UNION ALL SELECT 'lineitem.partkey',
        |    CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'lineitem.orderkey',
        |    CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'events.user_id',
        |    CAST(count(DISTINCT user_id) AS BIGINT) FROM events)
        |SELECT domain, n_keys,
        |  CAST((n_keys * 9585059 + 999999) // 1000000 AS BIGINT) AS bits_needed,
        |  CAST(((n_keys * 9585059 + 999999) // 1000000 + 7) // 8 AS BIGINT)
        |    AS bytes_needed,
        |  CAST(7 AS INT) AS k_hashes
        |FROM domains""".stripMargin) { (s, d) =>
      val domains = Tables.orders(s, d)
        .agg(countDistinct(col("o_custkey")).as("n_keys"))
        .select(lit("orders.custkey").as("domain"), col("n_keys"))
        .unionByName(Tables.lineitem(s, d)
          .agg(countDistinct(col("l_partkey")).as("n_keys"))
          .select(lit("lineitem.partkey").as("domain"), col("n_keys")))
        .unionByName(Tables.lineitem(s, d)
          .agg(countDistinct(col("l_orderkey")).as("n_keys"))
          .select(lit("lineitem.orderkey").as("domain"), col("n_keys")))
        .unionByName(Tables.events(s, d)
          .agg(countDistinct(col("user_id")).as("n_keys"))
          .select(lit("events.user_id").as("domain"), col("n_keys")))
      domains.select(col("domain"), col("n_keys"),
        expr("(n_keys * 9585059 + 999999) div 1000000").cast("long").as("bits_needed"),
        expr("((n_keys * 9585059 + 999999) div 1000000 + 7) div 8").cast("long")
          .as("bytes_needed"),
        lit(7).cast("int").as("k_hashes"))
    },

    // ---- A95: Gini decision stump (best single threshold) ------------------
    // The first split a gradient-boosted tree would make: which value
    // threshold best separates purchases from the rest? Nine literal
    // candidate thresholds (at production scale: equi-depth boundaries
    // from c12), each scored by Gini impurity reduction from EXACT
    // class counts — the 2×2 per-threshold table is nine conditional
    // aggregates in ONE scan; gains are fixed-order doubles rounded to
    // 8 before the threshold-bounded rank picks the winner.
    QueryDef.sql(
      "a95_gini_stump",
      """WITH taus AS (SELECT * FROM (VALUES (50.0), (100.0), (150.0), (200.0),
        |  (250.0), (300.0), (350.0), (400.0), (450.0)) AS t(tau)),
        |cells AS (
        |  SELECT tau,
        |    CAST(count(*) FILTER (WHERE value <= tau AND event_type = 'purchase')
        |      AS BIGINT) AS lp,
        |    CAST(count(*) FILTER (WHERE value <= tau AND event_type <> 'purchase')
        |      AS BIGINT) AS ln,
        |    CAST(count(*) FILTER (WHERE value > tau AND event_type = 'purchase')
        |      AS BIGINT) AS rp,
        |    CAST(count(*) FILTER (WHERE value > tau AND event_type <> 'purchase')
        |      AS BIGINT) AS rn
        |  FROM events CROSS JOIN taus GROUP BY 1),
        |g AS (
        |  SELECT tau, lp, ln, rp, rn,
        |    lp + ln AS nl, rp + rn AS nr, lp + ln + rp + rn AS n,
        |    lp + rp AS p, ln + rn AS q
        |  FROM cells),
        |scored AS (
        |  SELECT tau, nl, nr,
        |    round(
        |      (1.0 - (CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
        |            * (CAST(p AS DOUBLE) / CAST(n AS DOUBLE))
        |          - (CAST(q AS DOUBLE) / CAST(n AS DOUBLE))
        |            * (CAST(q AS DOUBLE) / CAST(n AS DOUBLE)))
        |      - CASE WHEN nl > 0 THEN (CAST(nl AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (1.0 - (CAST(lp AS DOUBLE) / CAST(nl AS DOUBLE))
        |               * (CAST(lp AS DOUBLE) / CAST(nl AS DOUBLE))
        |             - (CAST(ln AS DOUBLE) / CAST(nl AS DOUBLE))
        |               * (CAST(ln AS DOUBLE) / CAST(nl AS DOUBLE))) ELSE 0.0 END
        |      - CASE WHEN nr > 0 THEN (CAST(nr AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (1.0 - (CAST(rp AS DOUBLE) / CAST(nr AS DOUBLE))
        |               * (CAST(rp AS DOUBLE) / CAST(nr AS DOUBLE))
        |             - (CAST(rn AS DOUBLE) / CAST(nr AS DOUBLE))
        |               * (CAST(rn AS DOUBLE) / CAST(nr AS DOUBLE))) ELSE 0.0 END, 8)
        |      AS gain
        |  FROM g)
        |SELECT tau, nl AS n_left, nr AS n_right, gain,
        |  CAST(row_number() OVER (ORDER BY gain DESC, tau) AS INT) AS rank
        |FROM scored""".stripMargin) { (s, d) =>
      val taus = s.range(1, 10).select((col("id") * 50).cast("double").as("tau"))
      val cells = Tables.events(s, d).crossJoin(broadcast(taus))
        .groupBy(col("tau"))
        .agg(
          count(when(col("value") <= col("tau")
            && col("event_type") === "purchase", 1)).as("lp"),
          count(when(col("value") <= col("tau")
            && col("event_type") =!= "purchase", 1)).as("ln"),
          count(when(col("value") > col("tau")
            && col("event_type") === "purchase", 1)).as("rp"),
          count(when(col("value") > col("tau")
            && col("event_type") =!= "purchase", 1)).as("rn"))
      val g = cells.select(col("tau"), col("lp"), col("ln"), col("rp"), col("rn"),
        (col("lp") + col("ln")).as("nl"), (col("rp") + col("rn")).as("nr"),
        (col("lp") + col("ln") + col("rp") + col("rn")).as("n"),
        (col("lp") + col("rp")).as("p"), (col("ln") + col("rn")).as("q"))
      def gini(a: Column, b: Column, tot: Column): Column = {
        val pa = a.cast("double") / tot.cast("double")
        val pb = b.cast("double") / tot.cast("double")
        lit(1.0) - pa * pa - pb * pb
      }
      val nD = col("n").cast("double")
      val gain = round(gini(col("p"), col("q"), col("n"))
        - when(col("nl") > 0,
            (col("nl").cast("double") / nD) * gini(col("lp"), col("ln"), col("nl")))
          .otherwise(0.0)
        - when(col("nr") > 0,
            (col("nr").cast("double") / nD) * gini(col("rp"), col("rn"), col("nr")))
          .otherwise(0.0), 8)
      val scored = g.select(col("tau"), col("nl").as("n_left"), col("nr").as("n_right"),
        gain.as("gain"))
      // threshold-bounded rank (9 rows by construction)
      scored.withColumn("rank",
        row_number().over(Window.orderBy(col("gain").desc, col("tau"))).cast("int"))
    },

    // ---- W14: discrete derivatives of the revenue series -------------------
    // Velocity and acceleration of daily revenue: first and second
    // differences in exact integer cents from two calendar-grain lag
    // windows, plus the inflection marker (sign change of the first
    // difference) that peak/trough detectors consume. The primitive
    // under ev35's peak days and a71's changepoint, exposed directly.
    QueryDef.sql(
      "w14_discrete_derivatives",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents
        |  FROM events GROUP BY 1),
        |dd AS (
        |  SELECT day, cents,
        |    cents - lag(cents) OVER (ORDER BY day) AS d1,
        |    cents - 2 * lag(cents) OVER (ORDER BY day)
        |      + lag(cents, 2) OVER (ORDER BY day) AS d2
        |  FROM daily)
        |SELECT day, cents, d1, d2,
        |  CASE WHEN d1 IS NOT NULL AND lag(d1) OVER (ORDER BY day) IS NOT NULL
        |    AND sign(d1) <> sign(lag(d1) OVER (ORDER BY day)) THEN 1 ELSE 0 END
        |    AS inflection
        |FROM dd""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("cents"))
      // calendar-bounded windows
      val w = Window.orderBy(col("day"))
      val dd = daily.select(col("day"), col("cents"),
        (col("cents") - lag(col("cents"), 1).over(w)).as("d1"),
        (col("cents") - lit(2) * lag(col("cents"), 1).over(w)
          + lag(col("cents"), 2).over(w)).as("d2"))
      dd.withColumn("inflection",
        when(col("d1").isNotNull && lag(col("d1"), 1).over(w).isNotNull
          && signum(col("d1")) =!= signum(lag(col("d1"), 1).over(w)), 1)
          .otherwise(0))
    }
  )
}
