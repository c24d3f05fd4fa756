package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Twenty-seventh frontier batch: expected calibration error, as-of
  * join with staleness tolerance, and the cross-source duplication
  * matrix.
  */
object Frontier27Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A74: expected calibration error ------------------------------------
    // t20 draws the reliability diagram; ECE compresses it to the one
    // number model cards report: Σ_b (n_b/N)·|acc_b − conf_b|. Bin
    // accuracy and confidence are single divisions of exact integers
    // (6-dp scores sum as DECIMAL); each bin's weighted gap rounds to
    // 8 dp and sums as DECIMAL over the ≤10-row bin grain — a raw
    // double Σ would be association-order-dependent even here.
    QueryDef.sql(
      "a74_expected_calibration",
      s"""WITH ${CurationQueries.QualityF},
        |sc AS (
        |  SELECT (lang = 'en') AS pos,
        |    round(1.0 / (1.0 + exp(-(${CurationQueries.QualityZ}))), 6) AS score
        |  FROM f),
        |bins AS (
        |  SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS conf,
        |    CAST(count(*) FILTER (WHERE pos) AS DOUBLE) / count(*) AS acc
        |  FROM sc GROUP BY bin),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM bins),
        |terms AS (
        |  SELECT CAST(round(abs(acc - conf) * CAST(n AS DOUBLE), 8)
        |    AS DECIMAL(24,8)) AS term
        |  FROM bins)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM bins) AS n_bins,
        |  round(CAST(sum(term) AS DOUBLE) / CAST(max(total) AS DOUBLE), 6) AS ece
        |FROM terms CROSS JOIN tot""".stripMargin) { (s, d) =>
      val sc = Tables.documents(s, d).select(
        (col("lang") === "en").as("pos"),
        graft.functions.TextFunctions.qualityScore6(col("text")).as("score"))
      val bins = sc.groupBy(least(floor(col("score") * 10), lit(9)).cast("int").as("bin"))
        .agg(count(lit(1)).as("n"),
          (sum(col("score").cast(DecimalType(18, 6))).cast("double") / count(lit(1)))
            .as("conf"),
          (sum(when(col("pos"), 1L).otherwise(0L)).cast("double") / count(lit(1)))
            .as("acc"))
      val tot = bins.agg(sum(col("n")).as("total"), count(lit(1)).as("n_bins"))
      bins.select(round(abs(col("acc") - col("conf")) * col("n").cast("double"), 8)
          .cast(DecimalType(24, 8)).as("term"))
        .crossJoin(broadcast(tot))
        .agg(max(col("n_bins")).as("n_bins"),
          round(sum(col("term")).cast("double") / max(col("total")).cast("double"), 6)
            .as("ece"))
    },

    // ---- EV54: as-of join with staleness tolerance --------------------------
    // ClickHouse/QuestDB-style `ASOF ... TOLERANCE`: every purchase
    // finds the user's most recent prior view, but a match older than
    // 1 hour is rejected (NULL) — the attribution lookback as a join
    // property. Spark side composes the AsofJoin operator (union +
    // ONE per-key window, the ev3 posture) carrying the matched time
    // in the payload; the tolerance is a scan-stage null-out on both
    // engines, so NULL semantics of the no-match and stale-match cases
    // coincide exactly.
    QueryDef.sql(
      "ev54_asof_tolerance",
      """WITH views AS (
        |  SELECT user_id, ts, MAX(event_id) AS view_id
        |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
        |buys AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |matched AS (
        |  SELECT b.event_id, b.user_id, b.ts, v.view_id, v.ts AS vts
        |  FROM buys b ASOF LEFT JOIN views v
        |    ON b.user_id = v.user_id AND b.ts >= v.ts)
        |SELECT event_id, user_id,
        |  CASE WHEN vts IS NOT NULL
        |        AND epoch_us(ts) - epoch_us(vts) <= 3600000000
        |    THEN view_id ELSE NULL END AS attributed_view_id
        |FROM matched""".stripMargin) { (s, d) =>
      val views = Tables.events(s, d)
        .filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("view_id"))
        .withColumn("vts", col("ts"))
      val buys = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val matched = graft.operators.AsofJoin.asofLeft(
        buys, views, "user_id", "ts", "user_id", "ts",
        payload = Seq("view_id", "vts"))
      matched.select(col("event_id"), col("user_id"),
        when(col("vts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("vts")) <= 3600000000L,
          col("view_id")).otherwise(lit(null)).as("attributed_view_id"))
    },

    // ---- T44: cross-source duplication matrix -------------------------------
    // Who syndicates whom? For every unordered source pair, how many
    // distinct 16-token opening fingerprints (t41's template identity,
    // which — unlike full-text md5 — survives trailing edits) appear
    // in both. The join runs at the (fingerprint, source) grain —
    // per-fingerprint fan-out is bounded by the number of sources, so
    // candidates are C(sources,2) per fingerprint, never
    // corpus-quadratic. Counts are exact distinct fingerprints.
    QueryDef.sql(
      "t44_cross_source_dups",
      """WITH hs AS (
        |  SELECT DISTINCT
        |    md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[1:16], ' '))
        |      AS h,
        |    source
        |  FROM documents)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val hs = Tables.documents(s, d)
        .select(md5(array_join(slice(
          expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"), 1, 16), " ")).as("h"),
          col("source")).distinct()
      val b = hs.select(col("h"), col("source").as("source_b"))
      hs.join(b, Seq("h")).filter(col("source") < col("source_b"))
        .groupBy(col("source").as("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_shared"))
    }
  )
}
