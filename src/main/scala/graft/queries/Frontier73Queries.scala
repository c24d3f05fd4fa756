package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions

/** Seventy-third frontier batch: Krippendorff's alpha, underwater
  * duration, the NOT IN null trap.
  */
object Frontier73Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A133: Krippendorff's alpha (3 raters, nominal) ----------------------
    // Cohen's kappa (already in suite) stops at two raters;
    // Krippendorff's alpha is the eval-ops agreement metric for rater
    // PANELS. Three deterministic "raters" label each doc (md5 bit,
    // length parity, rolling-hash bit); with binary nominal data and
    // m=3 the whole statistic collapses to integers: α·10⁶ = 10⁶ −
    // P·(3n−1)·10⁶ div (2·N₀·N₁), where P = Σ_u n_u0·n_u1 is the
    // within-unit disagreeing-pair count. One doc-grain pass, crumbs.
    QueryDef.sql(
      "a133_krippendorff",
      """WITH r AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(text), 1, 2))::BIGINT % 2 AS r1,
        |    CAST(n_chars % 2 AS BIGINT) AS r2,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split_regex(text, ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (a, x) -> (a * 31 + x) % 1000000007) % 2 AS r3
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, r1 + r2 + r3 AS ones FROM r),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum((3 - ones) * ones) AS BIGINT) AS p_dis,
        |    CAST(sum(ones) AS BIGINT) AS n1,
        |    CAST(sum(3 - ones) AS BIGINT) AS n0
        |  FROM u)
        |SELECT n, n0, n1, p_dis,
        |  CAST(CASE WHEN n0 > 0 AND n1 > 0 THEN
        |    1000000 - (p_dis * (3 * n - 1) * 1000000) // (2 * n0 * n1)
        |    END AS BIGINT) AS alpha_micro
        |FROM agg""".stripMargin) { (s, d) =>
      val r = Tables.documents(s, d).select(col("doc_id"),
        (conv(substring(md5(col("text")), 1, 2), 16, 10).cast("long") % 2).as("r1"),
        (col("n_chars") % 2).cast("long").as("r2"),
        (TextFunctions.rollingFingerprint(col("text")) % 2).as("r3"))
      val u = r.select(col("doc_id"), (col("r1") + col("r2") + col("r3")).as("ones"))
      val agg = u.agg(count(lit(1)).as("n"),
        sum((lit(3) - col("ones")) * col("ones")).cast("long").as("p_dis"),
        sum(col("ones")).cast("long").as("n1"),
        sum(lit(3) - col("ones")).cast("long").as("n0"))
      agg.select(col("n"), col("n0"), col("n1"), col("p_dis"),
        when(col("n0") > 0 && col("n1") > 0,
          lit(1000000L) -
            expr("(p_dis * (3 * n - 1) * 1000000) div (2 * n0 * n1)"))
          .cast("long").as("alpha_micro"))
    },

    // ---- W21: underwater duration (drawdown length) --------------------------
    // Max drawdown DEPTH is already in the suite; risk desks also ask
    // for the longest UNDERWATER stretch — how many steps equity spent
    // below its running peak. Equity = prefix sum of signed flows
    // (purchases +, errors −) per user; underwater rows form islands
    // under the consecutive-sequence gap rule; the report is each
    // user's longest island and total underwater steps. One user
    // window chain, all integer.
    QueryDef.sql(
      "w21_underwater_duration",
      """WITH f AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT)
        |      ELSE -CAST(floor(value * 100) AS BIGINT) END AS flow
        |  FROM events WHERE event_type IN ('purchase', 'error')),
        |eq0 AS (
        |  SELECT user_id, event_id,
        |    CAST(sum(flow) OVER w AS BIGINT) AS equity,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
        |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |eq AS (
        |  SELECT user_id, event_id, equity, seq,
        |    CAST(max(equity) OVER (PARTITION BY user_id ORDER BY seq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
        |  FROM eq0),
        |uw AS (
        |  SELECT user_id, seq,
        |    seq - row_number() OVER (PARTITION BY user_id ORDER BY seq) AS isl
        |  FROM eq WHERE equity < peak),
        |runs AS (
        |  SELECT user_id, isl, CAST(count(*) AS BIGINT) AS run_len
        |  FROM uw GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(max(run_len) AS BIGINT) AS max_underwater,
        |  CAST(sum(run_len) AS BIGINT) AS total_underwater
        |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val f = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "error"))
        .select(col("user_id"), col("ts"), col("event_id"),
          when(col("event_type") === "purchase",
            floor(col("value") * 100).cast("long"))
            .otherwise(-floor(col("value") * 100).cast("long")).as("flow"))
      val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wf = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val eq = f
        .withColumn("equity", sum(col("flow")).over(wf))
        .withColumn("peak", max(col("equity")).over(wf))
        .withColumn("seq", row_number().over(wo))
      val uw = eq.filter(col("equity") < col("peak"))
        .withColumn("isl", col("seq") - row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("seq"))))
      uw.groupBy(col("user_id"), col("isl"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("user_id"))
        .agg(max(col("run_len")).cast("long").as("max_underwater"),
          sum(col("run_len")).cast("long").as("total_underwater"))
        .orderBy(col("user_id"))
    },

    // ---- Q29: the NOT IN null trap -------------------------------------------
    // The most-shipped SQL bug in existence, pinned: NOT IN against a
    // subquery whose result contains a NULL returns ZERO rows (UNKNOWN
    // is not TRUE), while NOT EXISTS and anti-joins return the real
    // complement. One hash-gated row records all three counts so an
    // engine/optimizer change that shifts three-valued-logic handling
    // fails loudly.
    QueryDef.sql(
      "q29_not_in_trap",
      """WITH probe AS (
        |  SELECT DISTINCT user_id FROM events),
        |sub AS (
        |  SELECT CASE WHEN user_id % 100 = 7 THEN NULL ELSE user_id END AS uid
        |  FROM events WHERE event_type = 'error'),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_not_in FROM probe
        |      WHERE user_id NOT IN (SELECT uid FROM sub)),
        |b AS (SELECT CAST(count(*) AS BIGINT) AS n_not_exists FROM probe p
        |      WHERE NOT EXISTS (SELECT 1 FROM sub s WHERE s.uid = p.user_id)),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n_null_in_sub FROM sub
        |      WHERE uid IS NULL)
        |SELECT a.n_not_in, b.n_not_exists, c.n_null_in_sub
        |FROM a, b, c""".stripMargin) { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("q29_events")
      s.sql(
        """WITH probe AS (
          |  SELECT DISTINCT user_id FROM q29_events),
          |sub AS (
          |  SELECT CASE WHEN user_id % 100 = 7 THEN NULL ELSE user_id END AS uid
          |  FROM q29_events WHERE event_type = 'error'),
          |a AS (SELECT CAST(count(*) AS BIGINT) AS n_not_in FROM probe
          |      WHERE user_id NOT IN (SELECT uid FROM sub)),
          |b AS (SELECT CAST(count(*) AS BIGINT) AS n_not_exists FROM probe p
          |      WHERE NOT EXISTS (SELECT 1 FROM sub s WHERE s.uid = p.user_id)),
          |c AS (SELECT CAST(count(*) AS BIGINT) AS n_null_in_sub FROM sub
          |      WHERE uid IS NULL)
          |SELECT a.n_not_in, b.n_not_exists, c.n_null_in_sub
          |FROM a, b, c""".stripMargin)
    }
  )
}
