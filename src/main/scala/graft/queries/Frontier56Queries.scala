package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Fifty-sixth frontier batch: gradient-boosted decision stumps under the
  * hash gate, deterministic stratified k-fold audit.
  */
object Frontier56Queries {

  /** Floor division that is identical in Spark and DuckDB for negative
    * numerators (Spark's `div` truncates toward zero, DuckDB's `//`
    * floors — the w15 sign-split, factored).
    */
  private def fdiv(num: String, den: String): String =
    s"IF($num >= 0, $num div $den, -((-($num) + $den - 1) div $den))"

  val defs: Seq[QueryDef] = Seq(

    // ---- A116: gradient-boosted stumps, exact --------------------------------
    // Three boosting rounds fit ENTIRELY in plan space and land under
    // the hash gate — iterative distributed ML that two engines
    // reproduce bit-for-bit. Each round: (1) ONE scan partial-aggregates
    // residual sums per feature cell (24 hour cells + 7 weekday cells —
    // the cells, not the rows, cross the wire); (2) candidate splits
    // come from prefix sums over the cell crumbs; (3) the best split
    // (max variance-reduction S²_L/n_L + S²_R/n_R, floor-quantized to
    // whole cents² — deterministic in any engine) rides back onto the
    // next scan as a broadcast 1-row model. Leaf values are exact
    // FLOOR-division means (sign-split so both engines floor alike);
    // residuals therefore stay integers round over round. No collect —
    // the "fitted model" is three chained broadcast crumbs.
    QueryDef.sql(
      "a116_boosted_stumps", {
        // one round of the oracle, parameterized by the residual expr
        def round(k: Int, resid: String): String =
          s"""cells$k AS (
             |  SELECT f, g, CAST(sum(r) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
             |  FROM (SELECT CASE WHEN f = 0 THEN h ELSE w END AS g, f, r
             |        FROM (SELECT h, w, $resid AS r FROM base$k) b0,
             |             (SELECT unnest([0, 1]) AS f) ff) cc
             |  GROUP BY 1, 2),
             |cand$k AS (
             |  SELECT f, g AS t,
             |    CAST(sum(s) OVER wp AS BIGINT) AS sl,
             |    CAST(sum(n) OVER wp AS BIGINT) AS nl,
             |    CAST(sum(s) OVER wf AS BIGINT) AS stot,
             |    CAST(sum(n) OVER wf AS BIGINT) AS ntot
             |  FROM cells$k
             |  WINDOW wp AS (PARTITION BY f ORDER BY g),
             |         wf AS (PARTITION BY f)),
             |best$k AS (
             |  SELECT f, t, sl, nl, stot - sl AS sr, ntot - nl AS nr,
             |    (CAST(sl AS HUGEINT) * sl // nl
             |     + CAST(stot - sl AS HUGEINT) * (stot - sl) // (ntot - nl)
             |     - CAST(stot AS HUGEINT) * stot // ntot) AS gain
             |  FROM cand$k WHERE nl > 0 AND ntot - nl > 0
             |  QUALIFY row_number() OVER (ORDER BY gain DESC, f, t) = 1),
             |model$k AS (
             |  SELECT f, t,
             |    CAST(CASE WHEN sl >= 0 THEN sl // nl
             |         ELSE -((-sl + nl - 1) // nl) END AS BIGINT) AS vl,
             |    CAST(CASE WHEN sr >= 0 THEN sr // nr
             |         ELSE -((-sr + nr - 1) // nr) END AS BIGINT) AS vr,
             |    CAST(gain AS BIGINT) AS gain, nl, nr
             |  FROM best$k),
             |base${k + 1} AS (
             |  SELECT b.h, b.w,
             |    b.r - (CASE WHEN (m.f = 0 AND b.h <= m.t)
             |                  OR (m.f = 1 AND b.w <= m.t)
             |                THEN m.vl ELSE m.vr END) AS r
             |  FROM (SELECT h, w, $resid AS r FROM base$k) b CROSS JOIN model$k m)"""
            .stripMargin
        s"""WITH raw AS (
           |  SELECT CAST(hour(ts) AS BIGINT) AS h,
           |    CAST(dayofweek(ts) AS BIGINT) AS w, -- DuckDB: Sunday = 0

           |    CAST(floor(value * 100) AS BIGINT) AS x
           |  FROM events),
           |g0 AS (SELECT CAST(sum(x) AS BIGINT) AS sx, CAST(count(*) AS BIGINT) AS n
           |       FROM raw),
           |base1 AS (
           |  SELECT h, w, x - (SELECT sx // n FROM g0) AS r0 FROM raw),
           |${round(1, "r0")},
           |${round(2, "r")},
           |${round(3, "r")}
           |SELECT 1 AS round, f, t, vl, vr, gain, nl, nr FROM model1
           |UNION ALL SELECT 2, f, t, vl, vr, gain, nl, nr FROM model2
           |UNION ALL SELECT 3, f, t, vl, vr, gain, nl, nr FROM model3
           |ORDER BY 1""".stripMargin
      }) { (s, d) =>
      val raw = Tables.events(s, d).select(
          hour(col("ts")).cast("long").as("h"),
          (dayofweek(col("ts")) - 1).cast("long").as("w"),
          floor(col("value") * 100).cast("long").as("x"))
        .localCheckpoint(true) // three boosting scans share one staging
      val g0 = raw.agg(sum(col("x")).cast("long").as("sx"),
        count(lit(1)).as("n0"))
      val base1 = raw.crossJoin(broadcast(g0))
        .select(col("h"), col("w"),
          (col("x") - expr("sx div n0")).as("r")) // sx >= 0: div == floor
      def fitRound(base: DataFrame): (DataFrame, DataFrame) = {
        val cells = base
          .select(col("h"), col("w"), col("r"),
            explode(array(lit(0), lit(1))).as("f"))
          .select(col("f"), when(col("f") === 0, col("h")).otherwise(col("w")).as("g"),
            col("r"))
          .groupBy(col("f"), col("g"))
          .agg(sum(col("r")).cast("long").as("s"), count(lit(1)).as("n"))
        val wp = Window.partitionBy(col("f")).orderBy(col("g"))
        val wf = Window.partitionBy(col("f"))
        val cand = cells.select(col("f"), col("g").as("t"),
            sum(col("s")).over(wp).cast("long").as("sl"),
            sum(col("n")).over(wp).cast("long").as("nl"),
            sum(col("s")).over(wf).cast("long").as("stot"),
            sum(col("n")).over(wf).cast("long").as("ntot"))
          .filter(col("nl") > 0 && col("ntot") - col("nl") > 0)
          .select(col("f"), col("t"), col("sl"), col("nl"),
            (col("stot") - col("sl")).as("sr"), (col("ntot") - col("nl")).as("nr"),
            expr("""cast(sl as decimal(38,0)) * sl div nl
                  + cast(stot - sl as decimal(38,0)) * (stot - sl) div (ntot - nl)
                  - cast(stot as decimal(38,0)) * stot div ntot""").cast("long")
              .as("gain"))
        val best = cand
          .withColumn("rk", row_number().over(
            Window.orderBy(col("gain").desc, col("f"), col("t"))))
          .filter(col("rk") === 1) // 31-row crumb — the global window is the model argmax
          .select(col("f"), col("t"),
            expr(fdiv("sl", "nl")).cast("long").as("vl"),
            expr(fdiv("sr", "nr")).cast("long").as("vr"),
            col("gain"), col("nl"), col("nr"))
        val next = base.crossJoin(broadcast(best.select(
            col("f").as("mf"), col("t").as("mt"),
            col("vl").as("mvl"), col("vr").as("mvr"))))
          .select(col("h"), col("w"),
            (col("r") - when((col("mf") === 0 && col("h") <= col("mt")) ||
                (col("mf") === 1 && col("w") <= col("mt")),
              col("mvl")).otherwise(col("mvr"))).as("r"))
        (best, next)
      }
      val (m1, b2) = fitRound(base1)
      val (m2, b3) = fitRound(b2)
      val (m3, _) = fitRound(b3)
      def tag(m: DataFrame, k: Int): DataFrame =
        m.select(lit(k).as("round"), col("f"), col("t"), col("vl"), col("vr"),
          col("gain"), col("nl"), col("nr"))
      tag(m1, 1).unionByName(tag(m2, 2)).unionByName(tag(m3, 3))
        .orderBy(col("round"))
    },

    // ---- C39: deterministic stratified k-fold audit -------------------------
    // Cross-validation plumbing with the reproducibility guarantee
    // training infra needs: fold = md5(event_id) mod 5 (the c5/c20
    // coin — stable under any cluster layout or row order), stratified
    // reporting per event_type, with the balance check (max−min fold
    // size per stratum) and leakage check (an id is in exactly one
    // fold — trivially true of a deterministic hash, surfaced as a
    // per-stratum distinct-vs-total equality) landing in the result.
    QueryDef.sql(
      "c39_kfold_audit",
      """WITH f AS (
        |  SELECT event_type,
        |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 5
        |      AS INT) AS fold,
        |    event_id
        |  FROM events),
        |sz AS (
        |  SELECT event_type, fold, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT event_id) AS BIGINT) AS n_ids
        |  FROM f GROUP BY 1, 2)
        |SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_folds,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(max(n) - min(n) AS BIGINT) AS imbalance,
        |  CAST(sum(CASE WHEN n = n_ids THEN 0 ELSE 1 END) AS BIGINT) AS leaks
        |FROM sz GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val f = Tables.events(s, d).select(col("event_type"),
        (conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 5).cast("int").as("fold"),
        col("event_id"))
      val sz = f.groupBy(col("event_type"), col("fold"))
        .agg(count(lit(1)).as("n"), count_distinct(col("event_id")).as("n_ids"))
      sz.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_folds"), sum(col("n")).cast("long").as("n_rows"),
          (max(col("n")) - min(col("n"))).cast("long").as("imbalance"),
          sum(when(col("n") === col("n_ids"), 0).otherwise(1)).cast("long")
            .as("leaks"))
        .orderBy(col("event_type"))
    }
  )
}
