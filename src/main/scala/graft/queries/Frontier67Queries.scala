package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Sixty-seventh frontier batch: CUPED variance reduction, sharp
  * regression discontinuity, LOCF forward-fill.
  */
object Frontier67Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A126: CUPED-adjusted treatment effect ------------------------------
    // The experimentation-platform workhorse: shrink metric variance
    // with the PRE-period covariate (θ = cov(X,Y)/var(X), Ŷ = Y −
    // θ(X−X̄)). Everything lands in integers: θ enters the adjusted
    // delta only as the rational C/V, so Δ_adj·V·n_T·n_C is an exact
    // product sum, and the variance-reduction ratio is a16's r² =
    // C²·10⁶ div (V_x·V_y). X = days 1–15 purchase cents per user,
    // Y = days 16–30; arms split by the a125 parity coin. One user
    // aggregate, then crumb algebra in DECIMAL(38,0).
    QueryDef.sql(
      "a126_cuped",
      """WITH u AS (
        |  SELECT user_id, CAST(user_id % 2 AS INT) AS t,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      AND day(CAST(ts AS DATE)) <= 15
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      AND day(CAST(ts AS DATE)) > 15
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |    CAST(sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nt,
        |    CAST(sum(CASE WHEN t = 1 THEN x ELSE 0 END) AS HUGEINT) AS sxt,
        |    CAST(sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS HUGEINT) AS syt
        |  FROM u),
        |c AS (
        |  SELECT n, nt, n - nt AS nc, sxt, syt, sx - sxt AS sxc, sy - syt AS syc,
        |    n * sxy - sx * sy AS cov, n * sxx - sx * sx AS vx,
        |    n * syy - sy * sy AS vy
        |  FROM m)
        |SELECT CAST(nt AS BIGINT) AS n_treat, CAST(nc AS BIGINT) AS n_control,
        |  CAST((syt * nc - syc * nt) * 1000000 // (nt * nc) AS BIGINT)
        |    AS raw_delta_micro,
        |  CAST(CASE WHEN vx > 0 THEN
        |    ((syt * nc - syc * nt) * vx - cov * (sxt * nc - sxc * nt)) * 1000000
        |      // (nt * nc * vx) END AS BIGINT) AS cuped_delta_micro,
        |  CAST(CASE WHEN vx > 0 AND vy > 0 THEN
        |    (cov * cov * 1000000) // (vx * vy) END AS BIGINT)
        |    AS var_reduction_micro
        |FROM c""".stripMargin) { (s, d) =>
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val u = Tables.events(s, d)
        .groupBy(col("user_id"), (col("user_id") % 2).cast("int").as("t"))
        .agg(
          sum(when(col("event_type") === "purchase" &&
              dayofmonth(col("ts").cast("date")) <= 15,
            floor(col("value") * 100).cast("long")).otherwise(0L)).cast("long").as("x"),
          sum(when(col("event_type") === "purchase" &&
              dayofmonth(col("ts").cast("date")) > 15,
            floor(col("value") * 100).cast("long")).otherwise(0L)).cast("long").as("y"))
      val m = u.agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"),
        sum(when(col("t") === 1, 1L).otherwise(0L)).cast(dec).as("nt"),
        sum(when(col("t") === 1, col("x")).otherwise(0L)).cast(dec).as("sxt"),
        sum(when(col("t") === 1, col("y")).otherwise(0L)).cast(dec).as("syt"))
      val c = m.select(col("n"), col("nt"), (col("n") - col("nt")).as("nc"),
        col("sxt"), col("syt"), (col("sx") - col("sxt")).as("sxc"),
        (col("sy") - col("syt")).as("syc"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("cov"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("vx"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("vy"))
      c.select(col("nt").cast("long").as("n_treat"),
        col("nc").cast("long").as("n_control"),
        expr("cast((syt * nc - syc * nt) * 1000000 div (nt * nc) as bigint)")
          .as("raw_delta_micro"),
        when(col("vx") > 0, expr(
          """((syt * nc - syc * nt) * vx - cov * (sxt * nc - sxc * nt)) * 1000000
             div (nt * nc * vx)""")).cast("long").as("cuped_delta_micro"),
        when(col("vx") > 0 && col("vy") > 0,
          expr("(cov * cov * 1000000) div (vx * vy)")).cast("long")
          .as("var_reduction_micro"))
    },

    // ---- A127: sharp regression discontinuity -------------------------------
    // The third causal design beside DiD (a125) and CUPED (a126):
    // users crossing an activity cutoff "get the feature"; the local
    // jump in conversion at the cutoff — means inside a ±8 bandwidth,
    // cross-multiplied — estimates the effect. A placebo cutoff 12
    // events lower must show ~no jump, and ships in the same result
    // row (the falsification check reviewers ask for first). One
    // user aggregate; two banded crumb aggregates.
    QueryDef.sql(
      "a127_reg_discontinuity",
      """WITH u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS r,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM events GROUP BY 1),
        |est AS (
        |  SELECT c.cutoff,
        |    CAST(count(*) FILTER (WHERE u.r >= c.cutoff) AS BIGINT) AS n_above,
        |    CAST(sum(conv) FILTER (WHERE u.r >= c.cutoff) AS BIGINT) AS k_above,
        |    CAST(count(*) FILTER (WHERE u.r < c.cutoff) AS BIGINT) AS n_below,
        |    CAST(sum(conv) FILTER (WHERE u.r < c.cutoff) AS BIGINT) AS k_below
        |  FROM u, (SELECT unnest([66, 54]) AS cutoff) c
        |  WHERE u.r >= c.cutoff - 8 AND u.r < c.cutoff + 8
        |  GROUP BY 1)
        |SELECT CAST(cutoff AS BIGINT) AS cutoff, n_above, n_below,
        |  CAST(CASE WHEN n_above > 0 AND n_below > 0 THEN
        |    (k_above * n_below - k_below * n_above) * 1000000
        |      // (n_above * n_below) END AS BIGINT) AS jump_micro
        |FROM est ORDER BY cutoff DESC""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("r"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      val est = u
        .crossJoin(broadcast(Seq(66L, 54L).toDF_(s, "cutoff")))
        .filter(col("r") >= col("cutoff") - 8 && col("r") < col("cutoff") + 8)
        .groupBy(col("cutoff"))
        .agg(count(when(col("r") >= col("cutoff"), 1)).as("n_above"),
          sum(when(col("r") >= col("cutoff"), col("conv")).otherwise(0L))
            .cast("long").as("k_above"),
          count(when(col("r") < col("cutoff"), 1)).as("n_below"),
          sum(when(col("r") < col("cutoff"), col("conv")).otherwise(0L))
            .cast("long").as("k_below"))
      est.select(col("cutoff").cast("long").as("cutoff"), col("n_above"),
          col("n_below"),
          when(col("n_above") > 0 && col("n_below") > 0,
            expr("""(k_above * n_below - k_below * n_above) * 1000000
                    div (n_above * n_below)""")).cast("long").as("jump_micro"))
        .orderBy(col("cutoff").desc)
    },

    // ---- W19: LOCF forward-fill (IGNORE NULLS windows) ----------------------
    // Last-observation-carried-forward imputation — the time-series
    // cleaning op and the IGNORE NULLS window surface in one: every
    // event carries the user's most recent purchase value (and its
    // age in events) via last_value(..., ignoreNulls) over the
    // unbounded-preceding frame. Summarized per event type so the
    // result stays compact. One user-partitioned window.
    QueryDef.sql(
      "w19_locf_fill",
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) END AS pcents
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, event_type,
        |    last_value(pcents IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |  FROM e)
        |SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(filled) AS BIGINT) AS n_filled,
        |  CAST(sum(filled) AS BIGINT) AS sum_filled_cents
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
        col("ts"), col("event_type"),
        when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).as("pcents"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val f = e.withColumn("filled",
        last(col("pcents"), ignoreNulls = true).over(w))
      f.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), count(col("filled")).as("n_filled"),
          sum(col("filled")).cast("long").as("sum_filled_cents"))
        .orderBy(col("event_type"))
    }
  )

  /** Tiny literal-DataFrame helper (Seq.toDF needs implicits). */
  implicit private class SeqDf(val xs: Seq[Long]) {
    def toDF_(s: SparkSession, name: String): DataFrame = {
      import s.implicits._
      xs.toDF(name)
    }
  }
}
