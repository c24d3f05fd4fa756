package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Twentieth frontier batch: additive seasonal decomposition in
  * sevenths-units, Cliff's delta effect size over sharded prefix sums,
  * a deterministic A/B conversion z-test, and code detection for
  * corpus curation.
  */
object Frontier20Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- W12: seasonal decomposition (trend + weekly seasonal + residual) --
    // STL-lite: centered 7-day moving average as trend, per-weekday
    // mean of the detrended series as seasonal, remainder as residual.
    // The float trick: everything multiplies through by 7 — trend7 is
    // the INTEGER window sum, detrended7 = 7x − trend7 stays exact,
    // the seasonal mean is one division of exact integers — so the
    // only doubles are three final single divisions and one
    // subtraction, identical-op-order in both engines, no rounding
    // needed. Weekday = days-since-anchor % 7 (no engine DOW
    // conventions). Day-axis windows are calendar-bounded.
    QueryDef.sql(
      "w12_seasonal_decompose",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS dow,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |tr AS (
        |  SELECT day, dow, x,
        |    CAST(sum(x) OVER w AS BIGINT) AS trend7,
        |    count(*) OVER w AS nw
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (
        |  SELECT day, dow, x, trend7, 7 * x - trend7 AS det7
        |  FROM tr WHERE nw = 7),
        |seas AS (
        |  SELECT dow, CAST(sum(det7) AS BIGINT) AS s7sum,
        |    CAST(count(*) AS BIGINT) AS s7n
        |  FROM det GROUP BY 1)
        |SELECT d.day, d.x AS x_cents,
        |  CAST(d.trend7 AS DOUBLE) / 7.0 AS trend,
        |  CAST(s.s7sum AS DOUBLE) / (CAST(s.s7n AS DOUBLE) * 7.0) AS seasonal,
        |  CAST(d.det7 AS DOUBLE) / 7.0
        |    - CAST(s.s7sum AS DOUBLE) / (CAST(s.s7n AS DOUBLE) * 7.0) AS residual
        |FROM det d JOIN seas s USING (dow)""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"),
          expr("datediff(cast(ts as date), date'2024-01-01') % 7").as("dow"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"))
      val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
      val det = daily
        .withColumn("trend7", sum(col("x")).over(w))
        .withColumn("nw", count(lit(1)).over(w))
        .filter(col("nw") === 7)
        .withColumn("det7", lit(7) * col("x") - col("trend7"))
      val seas = det.groupBy(col("dow"))
        .agg(sum(col("det7")).as("s7sum"), count(lit(1)).as("s7n"))
      val seasonal = col("s7sum").cast("double") / (col("s7n").cast("double") * 7.0)
      det.join(broadcast(seas), Seq("dow"))
        .select(col("day"), col("x").as("x_cents"),
          (col("trend7").cast("double") / 7.0).as("trend"),
          seasonal.as("seasonal"),
          (col("det7").cast("double") / 7.0 - seasonal).as("residual"))
    },

    // ---- A58: Cliff's delta (ordinal effect size) ---------------------------
    // How much do weekday and weekend purchase amounts really differ?
    // Cliff's δ = (#(a>b) − #(a<b)) / (n_a·n_b) needs, for every
    // value, how many opposite-sample values sit strictly below — the
    // a42/a43 value-grain cumulative, computed with the same SHARDED
    // prefix sums (range shards + partitioned local running sums +
    // broadcast shard offsets; boundaries pinned by localCheckpoint).
    // 2U = Σ d_a·(2·below_b + ties_b) is an exact integer; δ is one
    // division. Completes the effect-size story next to a43's
    // significance (U test): a43 says "is it real", this says "is it
    // big".
    QueryDef.sql(
      "a58_cliffs_delta",
      """WITH v AS (
        |  SELECT CAST(floor(value * 100) AS BIGINT) AS x,
        |    CASE WHEN date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 >= 5
        |      THEN 0 ELSE 1 END AS s1
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT x, CAST(count(*) FILTER (WHERE s1 = 1) AS BIGINT) AS da,
        |    CAST(count(*) FILTER (WHERE s1 = 0) AS BIGINT) AS db
        |  FROM v GROUP BY x),
        |c AS (
        |  SELECT x, da, db,
        |    CAST(sum(db) OVER (ORDER BY x) AS BIGINT) AS cb
        |  FROM g),
        |n AS (SELECT CAST(sum(da) AS BIGINT) AS n_a, CAST(sum(db) AS BIGINT) AS n_b FROM g),
        |u AS (
        |  SELECT CAST(sum(da * (2 * (cb - db) + db)) AS BIGINT) AS u2 FROM c)
        |SELECT n_a, n_b, u2,
        |  CAST(u2 - n_a * n_b AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS delta
        |FROM n CROSS JOIN u""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(floor(col("value") * 100).cast("long").as("x"),
          when(expr("datediff(cast(ts as date), date'2024-01-01') % 7") >= 5, 0)
            .otherwise(1).as("s1"))
      val g = v.groupBy(col("x"))
        .agg(count(when(col("s1") === 1, 1)).as("da"),
          count(when(col("s1") === 0, 1)).as("db"))
      val shards = 32
      val ranged = g.repartitionByRange(shards, col("x"))
        .withColumn("__shard", spark_partition_id())
        .localCheckpoint(true)
      val wLocal = Window.partitionBy(col("__shard")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = ranged.withColumn("lb", sum(col("db")).over(wLocal))
      val wShard = Window.orderBy(col("__shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = ranged.groupBy(col("__shard"))
        .agg(sum(col("db")).as("bsum"))
        .withColumn("ob", coalesce(sum(col("bsum")).over(wShard), lit(0L)))
        .select(col("__shard"), col("ob"))
      val c = local.join(broadcast(offsets), "__shard")
        .select(col("x"), col("da"), col("db"), (col("lb") + col("ob")).as("cb"))
      val n = g.agg(sum(col("da")).as("n_a"), sum(col("db")).as("n_b"))
      val u = c.agg(sum(col("da") * (lit(2) * (col("cb") - col("db")) + col("db"))).as("u2"))
      n.crossJoin(broadcast(u))
        .select(col("n_a"), col("n_b"), col("u2"),
          ((col("u2") - col("n_a") * col("n_b")).cast("double")
            / (col("n_a") * col("n_b")).cast("double")).as("delta"))
    },

    // ---- A59: two-proportion A/B conversion z-test --------------------------
    // The experimentation readout: users split deterministically by
    // md5(user_id) parity into arms A/B, conversion = reached a
    // high-value purchase (> $150 — "reached a purchase" converts at
    // 100% here, which degenerates the pooled variance to 0); pooled
    // two-proportion z with exact integer counts, fixed-order float
    // ops, round 6, NULL when the pooled variance is degenerate (ANSI
    // double division by zero THROWS in Spark — the guard is
    // semantics, not decoration). With a real assignment column the
    // same plan applies unchanged — the md5 split makes the demo
    // reproducible under any partitioning.
    QueryDef.sql(
      "a59_ab_conversion_z",
      """WITH u AS (
        |  SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150.0
        |      THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY 1, 2),
        |arms AS (
        |  SELECT
        |    CAST(count(*) FILTER (WHERE arm = 'A') AS BIGINT) AS n_a,
        |    CAST(count(*) FILTER (WHERE arm = 'B') AS BIGINT) AS n_b,
        |    CAST(sum(converted) FILTER (WHERE arm = 'A') AS BIGINT) AS conv_a,
        |    CAST(sum(converted) FILTER (WHERE arm = 'B') AS BIGINT) AS conv_b
        |  FROM u)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS p_a,
        |  round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS p_b,
        |  CASE WHEN conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b THEN
        |    round((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |         - CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |        * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
        |  ELSE NULL END AS z
        |FROM arms""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
            .otherwise("B").as("arm"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 150.0, 1)
          .otherwise(0)).as("converted"))
      val arms = u.agg(
        count(when(col("arm") === "A", 1)).as("n_a"),
        count(when(col("arm") === "B", 1)).as("n_b"),
        sum(when(col("arm") === "A", col("converted"))).as("conv_a"),
        sum(when(col("arm") === "B", col("converted"))).as("conv_b"))
      val pa = col("conv_a").cast("double") / col("n_a").cast("double")
      val pb = col("conv_b").cast("double") / col("n_b").cast("double")
      val pp = (col("conv_a") + col("conv_b")).cast("double") /
        (col("n_a") + col("n_b")).cast("double")
      arms.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
        round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
        when(col("conv_a") + col("conv_b") > 0 &&
            col("conv_a") + col("conv_b") < col("n_a") + col("n_b"),
          round((pa - pb) / sqrt(pp * (lit(1.0) - pp) *
            (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double"))), 6))
          .otherwise(lit(null)).as("z"))
    },

    // ---- T40: code detection (curation signal) ------------------------------
    // The is-this-code classifier every web-corpus pipeline runs
    // before language-model training: per-document structural signals
    // (brace/semicolon density, indented-line share, keyword hits) as
    // pure scan-stage Column algebra (t24's shape), rolled up per
    // source with one rounded fraction. Signals are integer counts;
    // the two ratios divide exactly once each.
    QueryDef.sql(
      "t40_code_detection",
      """WITH sig AS (
        |  SELECT source,
        |    len(text) - len(replace(text, '{', '')) AS braces,
        |    len(text) - len(replace(text, ';', '')) AS semis,
        |    len(regexp_extract_all(text, '(?:^|\n)(?:    |\t)')) AS indented,
        |    CASE WHEN regexp_matches(text, '(def |function |class |import |return )')
        |      THEN 1 ELSE 0 END AS kw,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS toks
        |  FROM documents),
        |verdict AS (
        |  SELECT source, toks,
        |    CASE WHEN (braces >= 2 AND semis >= 2) OR (kw = 1 AND indented >= 2)
        |      THEN 1 ELSE 0 END AS is_code
        |  FROM sig)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(is_code) AS BIGINT) AS n_code,
        |  round(CAST(sum(is_code) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS code_frac,
        |  CAST(sum(CASE WHEN is_code = 1 THEN toks ELSE 0 END) AS BIGINT) AS code_tokens
        |FROM verdict GROUP BY source""".stripMargin) { (s, d) =>
      val sig = Tables.documents(s, d).select(
        col("source"),
        (length(col("text")) - length(regexp_replace(col("text"), "\\{", ""))).as("braces"),
        (length(col("text")) - length(regexp_replace(col("text"), ";", ""))).as("semis"),
        size(expr("regexp_extract_all(text, '(?:^|\\n)(?:    |\\t)', 0)")).as("indented"),
        when(col("text").rlike("(def |function |class |import |return )"), 1)
          .otherwise(0).as("kw"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("toks"))
      val verdict = sig.select(col("source"), col("toks"),
        when((col("braces") >= 2 && col("semis") >= 2) ||
          (col("kw") === 1 && col("indented") >= 2), 1).otherwise(0).as("is_code"))
      verdict.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("is_code")).as("n_code"),
          round(sum(col("is_code")).cast("double") / count(lit(1)).cast("double"), 6)
            .as("code_frac"),
          sum(when(col("is_code") === 1, col("toks")).otherwise(0L)).as("code_tokens"))
    }
  )
}
