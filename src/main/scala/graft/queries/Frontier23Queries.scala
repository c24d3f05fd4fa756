package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Twenty-third frontier batch: lead-lag cross-correlation, boilerplate
  * template detection, and A/B sample-size (power) analysis.
  */
object Frontier23Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A63: lead-lag cross-correlation ------------------------------------
    // At which lag does click volume best track purchase revenue?
    // The CCF over lags 0..7: for each lag the day series self-joins
    // on day+lag (a tiny calendar-bounded join — the lag axis is an
    // 8-row literal dimension), then a51's exact-moment Pearson per
    // lag: all five sums are DECIMAL/HUGEINT-exact over integer
    // cents/counts, one division + one sqrt + round 6 per lag.
    QueryDef.sql(
      "a63_ccf_leadlag",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y,
        |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |lags AS (SELECT unnest(generate_series(0, 7)) AS lag),
        |pairs AS (
        |  SELECT l.lag, a.x, b.y
        |  FROM daily a CROSS JOIN lags l
        |  JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)),
        |mom AS (
        |  SELECT lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        |  FROM pairs GROUP BY 1)
        |SELECT lag, n,
        |  CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
        |    THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |           * CAST(n * syy - sy * sy AS DOUBLE)), 6)
        |    ELSE NULL END AS ccf
        |FROM mom""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(
          sum(when(col("event_type") === "purchase",
            floor(col("value") * 100).cast("long")).otherwise(0L)).as("y"),
          count(when(col("event_type") === "click", 1)).as("x"))
      val lags = { import s.implicits._; (0 to 7).toDF("lag") }
      val a = daily.select(col("day"), col("x"))
      val b = daily.select(col("day").as("bday"), col("y"))
      val pairs = a.crossJoin(broadcast(lags))
        .join(b, col("bday") === date_add(col("day"), col("lag")))
      val mom = pairs.groupBy(col("lag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum(col("x").cast(dec) * col("y")).as("sxy"),
          sum(col("x").cast(dec) * col("x")).as("sxx"),
          sum(col("y").cast(dec) * col("y")).as("syy"))
      val dx = col("n") * col("sxx") - col("sx") * col("sx")
      val dy = col("n") * col("syy") - col("sy") * col("sy")
      val num = col("n") * col("sxy") - col("sx") * col("sy")
      mom.select(col("lag"), col("n"),
        when(dx * dy > 0,
          round(num.cast("double") / sqrt(dx.cast("double") * dy.cast("double")), 6))
          .otherwise(lit(null)).as("ccf"))
    },

    // ---- T41: boilerplate template detection --------------------------------
    // Web corpora are full of templated pages (headers, navboxes,
    // licence blurbs). Detector: documents sharing the SAME first-8-
    // token fingerprint form a template cluster; clusters with ≥ 3
    // members are boilerplate candidates. One md5 over the token
    // prefix at the scan, one partial-agg shuffle on the fingerprint,
    // and a per-source rollup of the affected share — the d1 shape at
    // prefix grain. Spark's slice/array_join and DuckDB's list ops
    // produce the identical prefix string.
    QueryDef.sql(
      "t41_template_detect",
      """WITH fp AS (
        |  SELECT source, doc_id,
        |    md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[1:8], ' '))
        |      AS prefix_fp
        |  FROM documents),
        |clusters AS (
        |  SELECT prefix_fp, CAST(count(*) AS BIGINT) AS cluster_size
        |  FROM fp GROUP BY 1),
        |flagged AS (
        |  SELECT f.source, f.doc_id, c.cluster_size
        |  FROM fp f JOIN clusters c USING (prefix_fp))
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) FILTER (WHERE cluster_size >= 3) AS BIGINT) AS n_templated,
        |  CAST(max(cluster_size) AS BIGINT) AS max_cluster,
        |  round(CAST(count(*) FILTER (WHERE cluster_size >= 3) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS templated_frac
        |FROM flagged GROUP BY source""".stripMargin) { (s, d) =>
      val fp = Tables.documents(s, d)
        .select(col("source"), col("doc_id"),
          md5(array_join(slice(
            expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"), 1, 8), " "))
            .as("prefix_fp"))
      val clusters = fp.groupBy(col("prefix_fp"))
        .agg(count(lit(1)).as("cluster_size"))
      fp.join(clusters, Seq("prefix_fp"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("cluster_size") >= 3, 1)).as("n_templated"),
          max(col("cluster_size")).as("max_cluster"),
          round(count(when(col("cluster_size") >= 3, 1)).cast("double")
            / count(lit(1)).cast("double"), 6).as("templated_frac"))
    },

    // ---- A64: A/B sample-size (power) analysis ------------------------------
    // a59 tests an experiment after the fact; this answers the design
    // question — how many users per arm does each market segment need
    // to detect a 10% relative conversion lift at α=0.05, power 0.8?
    // Baseline rates come from the data (exact counts, one division);
    // the classical two-proportion formula runs with fixed z literals
    // (1.959964, 0.841621) and fixed op order; round 6. Segments join
    // via the events→customer key (a true FK per u24); one partial-agg
    // shuffle on the bounded segment key.
    QueryDef.sql(
      "a64_power_analysis",
      """WITH u AS (
        |  SELECT e.user_id, c.c_mktsegment AS segment,
        |    max(CASE WHEN e.event_type = 'purchase' AND e.value > 150.0
        |      THEN 1 ELSE 0 END) AS converted
        |  FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |  GROUP BY 1, 2),
        |seg AS (
        |  SELECT segment, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(converted) AS BIGINT) AS n_conv
        |  FROM u GROUP BY 1)
        |SELECT segment, n_users, n_conv,
        |  round(CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS p1,
        |  CASE WHEN n_conv > 0 AND n_conv < n_users THEN
        |    CAST(ceil(
        |      power(1.959964 * sqrt(2.0 * (CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
        |          * (1.0 - CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)))
        |        + 0.841621 * sqrt(
        |            (CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
        |              * (1.0 - CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE))
        |          + (CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) * 1.1)
        |              * (1.0 - CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) * 1.1)), 2)
        |      / power(CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) * 0.1, 2))
        |    AS BIGINT)
        |  ELSE NULL END AS n_required
        |FROM seg""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .join(Tables.customer(s, d), col("user_id") === col("c_custkey"))
        .groupBy(col("user_id"), col("c_mktsegment").as("segment"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 150.0, 1)
          .otherwise(0)).as("converted"))
      val seg = u.groupBy(col("segment"))
        .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
      val p1 = col("n_conv").cast("double") / col("n_users").cast("double")
      val p2 = p1 * 1.1
      val nReq = ceil(
        pow(lit(1.959964) * sqrt(lit(2.0) * p1 * (lit(1.0) - p1))
          + lit(0.841621) * sqrt(p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2)), 2)
          / pow(p1 * 0.1, 2)).cast("long")
      seg.select(col("segment"), col("n_users"), col("n_conv"),
        round(p1, 6).as("p1"),
        when(col("n_conv") > 0 && col("n_conv") < col("n_users"), nReq)
          .otherwise(lit(null)).as("n_required"))
    }
  )
}
