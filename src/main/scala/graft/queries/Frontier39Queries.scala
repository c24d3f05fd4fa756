package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Thirty-ninth frontier batch: SPRT sequential testing, source
  * similarity matrix, generic column profiling, ANSI try_* surface.
  */
object Frontier39Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A92: sequential probability ratio test (SPRT) ---------------------
    // Wald's always-valid A/B monitor: is the purchase rate 5% (H0) or
    // 6% (H1)? Each event contributes a CONSTANT log-likelihood-ratio
    // increment, so the whole sequential procedure is one prefix sum:
    // L_D = k_D·c1 + m_D·c2 in integer micro-nats (c1 = ⌊ln(.06/.05)
    // ·10⁶⌋ = 182321, c2 = ⌊ln(.94/.95)·10⁶⌋ = −10583 — precomputed
    // literals, so no cross-engine libm in the data path), crossing
    // A = ⌊ln 19·10⁶⌋ = 2944438 accepts H1, B = −2944439 accepts H0.
    // Day-grain prefix over the calendar-bounded rollup; first
    // crossing via conditional MINs, everything exact integers.
    QueryDef.sql(
      "a92_sprt",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS k,
        |    CAST(count(*) FILTER (WHERE event_type <> 'purchase') AS BIGINT) AS m
        |  FROM events GROUP BY 1),
        |pfx AS (
        |  SELECT day,
        |    CAST(sum(k * 182321 + m * (-10583)) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS llr
        |  FROM daily),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    min(CASE WHEN llr >= 2944438 THEN day END) AS first_h1,
        |    min(CASE WHEN llr <= -2944439 THEN day END) AS first_h0,
        |    max(CASE WHEN day = (SELECT max(day) FROM pfx) THEN llr END)
        |      AS final_llr
        |  FROM pfx)
        |SELECT n_days, final_llr AS final_llr_micro,
        |  CASE
        |    WHEN first_h1 IS NOT NULL AND (first_h0 IS NULL OR first_h1 <= first_h0)
        |      THEN 'accept_h1'
        |    WHEN first_h0 IS NOT NULL THEN 'accept_h0'
        |    ELSE 'continue' END AS decision,
        |  CASE
        |    WHEN first_h1 IS NOT NULL AND (first_h0 IS NULL OR first_h1 <= first_h0)
        |      THEN first_h1
        |    WHEN first_h0 IS NOT NULL THEN first_h0
        |    ELSE NULL END AS decision_day
        |FROM agg""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(when(col("event_type") === "purchase", 1)).as("k"),
          count(when(col("event_type") =!= "purchase", 1)).as("m"))
      // calendar-bounded prefix
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pfx = daily.withColumn("llr",
        sum(col("k") * 182321L + col("m") * -10583L).over(w))
      val lastDay = pfx.agg(max(col("day")).as("last_day"))
      val agg = pfx.crossJoin(broadcast(lastDay)).agg(
        count(lit(1)).as("n_days"),
        min(when(col("llr") >= 2944438L, col("day"))).as("first_h1"),
        min(when(col("llr") <= -2944439L, col("day"))).as("first_h0"),
        max(when(col("day") === col("last_day"), col("llr"))).as("final_llr"))
      val h1Wins = col("first_h1").isNotNull &&
        (col("first_h0").isNull || col("first_h1") <= col("first_h0"))
      agg.select(col("n_days"), col("final_llr").as("final_llr_micro"),
        when(h1Wins, "accept_h1")
          .when(col("first_h0").isNotNull, "accept_h0")
          .otherwise("continue").as("decision"),
        when(h1Wins, col("first_h1"))
          .when(col("first_h0").isNotNull, col("first_h0"))
          .otherwise(lit(null)).as("decision_day"))
    },

    // ---- T50: source-similarity matrix (TF cosine over exact counts) -------
    // Which sources publish the same kind of text? Cosine similarity
    // between source term-frequency vectors — the numerator and both
    // norms are EXACT integer dot products of count vectors (one
    // shared-term join on the source-pair grain), so the only float is
    // the final sqrt, rounded at 6. Source-pair space is configuration
    // -bounded (20×19/2); the term join is the data-sized pass.
    QueryDef.sql(
      "t50_source_similarity",
      """WITH tf AS (
        |  SELECT source, term, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |    FROM documents) GROUP BY 1, 2),
        |nrm AS (SELECT source, CAST(sum(c * c) AS BIGINT) AS n2 FROM tf GROUP BY 1),
        |dots AS (
        |  SELECT a.source AS src_a, b.source AS src_b,
        |    CAST(sum(a.c * b.c) AS BIGINT) AS dot
        |  FROM tf a JOIN tf b ON a.term = b.term AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, dot,
        |  round(CAST(dot AS DOUBLE)
        |    / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)), 6) AS cosine
        |FROM dots JOIN nrm na ON src_a = na.source
        |JOIN nrm nb ON src_b = nb.source""".stripMargin) { (s, d) =>
      val tf = Tables.documents(s, d)
        .select(col("source"),
          explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("term"))
        .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
      val nrm = tf.groupBy(col("source")).agg(sum(col("c") * col("c")).as("n2"))
      val b = tf.select(col("source").as("src_b"), col("term"), col("c").as("cb"))
      val dots = tf.select(col("source").as("src_a"), col("term"), col("c").as("ca"))
        .join(b, Seq("term"))
        .filter(col("src_a") < col("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(sum(col("ca") * col("cb")).as("dot"))
      dots
        .join(broadcast(nrm.select(col("source").as("src_a"), col("n2").as("na"))), "src_a")
        .join(broadcast(nrm.select(col("source").as("src_b"), col("n2").as("nb"))), "src_b")
        .select(col("src_a"), col("src_b"), col("dot"),
          round(col("dot").cast("double")
            / sqrt(col("na").cast("double") * col("nb").cast("double")), 6)
            .as("cosine"))
    },

    // ---- U35: generic column profiler --------------------------------------
    // The first query every warehouse tool runs on an unknown table:
    // per column — rows, nulls, distincts, lexicographic min/max (as
    // strings, so ONE output schema covers every type). Long-form via
    // an explicit stack of the orders columns: the profile is k
    // conditional aggregates in a single pass + one distinct-count
    // pass per column over the column-bounded long form; no generic
    // reflection needed to keep the plan columnar.
    QueryDef.sql(
      "u35_column_profile",
      """WITH lf AS (
        |  SELECT 'o_orderkey' AS col_name, CAST(o_orderkey AS VARCHAR) AS v FROM orders
        |  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
        |  UNION ALL SELECT 'o_totalprice', CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |    AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders)
        |SELECT col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) FILTER (WHERE v IS NULL) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
        |  min(v) AS min_str, max(v) AS max_str
        |FROM lf GROUP BY 1""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val lf = o.select(lit("o_orderkey").as("col_name"),
          col("o_orderkey").cast("string").as("v"))
        .unionByName(o.select(lit("o_custkey").as("col_name"),
          col("o_custkey").cast("string").as("v")))
        .unionByName(o.select(lit("o_orderstatus").as("col_name"),
          col("o_orderstatus").as("v")))
        .unionByName(o.select(lit("o_totalprice").as("col_name"),
          col("o_totalprice").cast(DecimalType(18, 2)).cast("string").as("v")))
        .unionByName(o.select(lit("o_orderpriority").as("col_name"),
          col("o_orderpriority").as("v")))
      lf.groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("v").isNull, 1)).as("n_null"),
          countDistinct(col("v")).as("n_distinct"),
          min(col("v")).as("min_str"), max(col("v")).as("max_str"))
    },

    // ---- F6: ANSI-safe try_* arithmetic surface ----------------------------
    // ANSI mode is ON engine-wide (the STATE gotcha: 1/0 THROWS), so
    // the try_* family is how a pipeline survives dirty data without
    // turning ANSI off: try_divide → NULL on zero, try_cast → NULL on
    // malformed input, try_add → NULL on overflow. Exercised over a
    // synthesized dirty column (every 7th value divides by zero, every
    // 5th string is non-numeric) with exact per-group NULL accounting
    // the oracle mirrors through CASE guards.
    QueryDef.sql(
      "f6_try_functions",
      """WITH v AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 0.0 ELSE CAST(o_orderkey % 5 AS DOUBLE)
        |      END AS denom,
        |    CASE WHEN o_orderkey % 5 = 0 THEN 'x' || CAST(o_orderkey AS VARCHAR)
        |      ELSE CAST(o_orderkey AS VARCHAR) END AS numstr
        |  FROM orders),
        |t AS (
        |  SELECT o_orderkey,
        |    CASE WHEN denom = 0.0 THEN NULL
        |      ELSE CAST(o_orderkey AS DOUBLE) / denom END AS q,
        |    try_cast(numstr AS BIGINT) AS parsed
        |  FROM v)
        |SELECT
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (WHERE q IS NULL) AS BIGINT) AS n_div_null,
        |  CAST(count(*) FILTER (WHERE parsed IS NULL) AS BIGINT) AS n_parse_null,
        |  CAST(sum(parsed) AS BIGINT) AS sum_parsed,
        |  round(CAST(sum(CAST(q AS DECIMAL(28,6))) AS DOUBLE), 4) AS sum_q
        |FROM t""".stripMargin) { (s, d) =>
      val v = Tables.orders(s, d).select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, 0.0)
          .otherwise((col("o_orderkey") % 5).cast("double")).as("denom"),
        when(col("o_orderkey") % 5 === 0,
          concat(lit("x"), col("o_orderkey").cast("string")))
          .otherwise(col("o_orderkey").cast("string")).as("numstr"))
      val t = v.select(col("o_orderkey"),
        try_divide(col("o_orderkey").cast("double"), col("denom")).as("q"),
        expr("try_cast(numstr AS BIGINT)").as("parsed"))
      t.agg(count(lit(1)).as("n"),
        count(when(col("q").isNull, 1)).as("n_div_null"),
        count(when(col("parsed").isNull, 1)).as("n_parse_null"),
        sum(col("parsed")).as("sum_parsed"),
        round(sum(col("q").cast(DecimalType(28, 6))).cast("double"), 4).as("sum_q"))
    }
  )
}
