package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Fourth frontier batch: monitoring/alerting shapes — Bollinger-band
  * breakouts with the sqrt eliminated by integer algebra, population-
  * stability-index feature drift, and seasonal-naive anomaly
  * shortlists. The common trick: every threshold test that classically
  * needs μ, σ, or a ratio is multiplied through until both sides are
  * exact integers, so alert SETS (not just scores) hash-match the
  * oracle exactly.
  */
object Frontier4Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- W10: Bollinger breakout flags without sqrt ------------------------
    // Classic alert: |x − μ| > 2σ over a trailing w=8 frame. Multiply
    // through by w²·w: with S = Σx_i and Q = Σx_i² over the frame (both
    // exact BIGINT window sums of integer units),
    //   (x−μ)² > 4σ²  ⟺  2·(8x−S)² > 64·Q − 8·S²
    // — a pure integer comparison, no sqrt, no division, no float
    // anywhere. Two shared-frame window sums per user partition; only
    // full frames (rk >= 8) are evaluated.
    QueryDef.sql(
      "w10_bollinger_breakout",
      """WITH v AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS x
        |  FROM events),
        |f AS (
        |  SELECT user_id, x,
        |    CAST(sum(x) OVER w AS BIGINT) AS s,
        |    CAST(sum(x * x) OVER w AS BIGINT) AS q,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
        |  FROM v
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        |SELECT user_id,
        |  CAST(count(*) FILTER (WHERE rk >= 8) AS BIGINT) AS n_frames,
        |  CAST(count(*) FILTER (WHERE rk >= 8
        |    AND 2 * (8 * x - s) * (8 * x - s) > 64 * q - 8 * s * s) AS BIGINT)
        |    AS n_breakouts
        |FROM f GROUP BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val frame = w.rowsBetween(-7, Window.currentRow)
      val x = (col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long")
      val f = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), x.as("x"))
        .withColumn("s", sum(col("x")).over(frame))
        .withColumn("q", sum(col("x") * col("x")).over(frame))
        .withColumn("rk", row_number().over(w))
      val dev = lit(8) * col("x") - col("s")
      f.groupBy(col("user_id"))
        .agg(count(when(col("rk") >= 8, 1)).as("n_frames"),
          count(when(col("rk") >= 8 &&
            lit(2) * dev * dev > lit(64) * col("q") - lit(8) * col("s") * col("s"), 1))
            .as("n_breakouts"))
    },

    // ---- A36: PSI feature-drift monitor ------------------------------------
    // Population Stability Index of the `value` feature between the
    // first and second half of the observation window, per event type:
    // psi = Σ_bins (p_i − q_i)·ln(p_i/q_i), fixed 50-unit bins with
    // add-one smoothing (no ln(0)). Counts are exact integers off ONE
    // conditional-aggregate scan; every (p_i, q_i) is an exact-integer
    // ratio so both engines feed ln identical doubles; the 11-term sum
    // folds in bin order and rounds to 6 dp (the repo's libm-ulp
    // convention). Deployment meaning: psi > 0.2 = retrain trigger.
    QueryDef.sql(
      "a36_psi_drift",
      """WITH bounds AS (
        |  SELECT CAST(min(CAST(ts AS DATE)) AS DATE)
        |    + CAST((date_diff('day', min(CAST(ts AS DATE)),
        |                      max(CAST(ts AS DATE))) + 1) // 2 AS INTEGER) AS split_day
        |  FROM events),
        |b AS (
        |  SELECT event_type,
        |    CAST(least(floor(value / 50), 9) AS INTEGER) AS bin,
        |    CASE WHEN CAST(ts AS DATE) < split_day THEN 0 ELSE 1 END AS period
        |  FROM events CROSS JOIN bounds),
        |cnt AS (
        |  SELECT event_type, bin,
        |    CAST(count(*) FILTER (WHERE period = 0) + 1 AS BIGINT) AS ca,
        |    CAST(count(*) FILTER (WHERE period = 1) + 1 AS BIGINT) AS cb
        |  FROM b GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(cb) AS BIGINT) AS tb
        |  FROM cnt GROUP BY 1),
        |terms AS (
        |  SELECT c.event_type, c.bin,
        |    (CAST(ca AS DOUBLE)/CAST(ta AS DOUBLE) - CAST(cb AS DOUBLE)/CAST(tb AS DOUBLE))
        |      * ln((CAST(ca AS DOUBLE)/CAST(ta AS DOUBLE))
        |            / (CAST(cb AS DOUBLE)/CAST(tb AS DOUBLE))) AS term
        |  FROM cnt c JOIN tot t ON c.event_type = t.event_type)
        |SELECT event_type,
        |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(term ORDER BY bin)), (a, b) -> a + b), 6) AS psi
        |FROM terms GROUP BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val bounds = ev.agg(
        date_add(min(col("ts").cast("date")),
          ((datediff(max(col("ts").cast("date")), min(col("ts").cast("date"))) + 1) / 2)
            .cast("int")).as("split_day"))
      val b = ev.crossJoin(broadcast(bounds))
        .select(col("event_type"),
          least(floor(col("value") / 50), lit(9L)).cast("int").as("bin"),
          when(col("ts").cast("date") < col("split_day"), 0).otherwise(1).as("period"))
      val cnt = b.groupBy(col("event_type"), col("bin"))
        .agg((count(when(col("period") === 0, 1)) + 1).as("ca"),
          (count(when(col("period") === 1, 1)) + 1).as("cb"))
      val tot = cnt.groupBy(col("event_type"))
        .agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
      val terms = cnt.join(tot, "event_type")
        .select(col("event_type"), col("bin"), {
          val p = col("ca").cast("double") / col("ta").cast("double")
          val q = col("cb").cast("double") / col("tb").cast("double")
          ((p - q) * log(p / q)).as("term")
        })
      terms.groupBy(col("event_type"))
        .agg(round(aggregate(
          transform(sort_array(collect_list(struct(col("bin"), col("term")))),
            x => x.getField("term")),
          lit(0.0), (acc, t) => acc + t), 6).as("psi"))
    },

    // ---- EV33: seasonal-naive anomaly shortlist ----------------------------
    // Forecast each day's revenue by the same weekday last week
    // (x̂_t = x_{t−7}); the 5 largest absolute residuals are the
    // anomaly shortlist an on-call gets paged with. Day-grain exact
    // integers; the join is day = day−7 (calendar equi-join, no
    // window); the only division is the final dollar readout.
    QueryDef.sql(
      "ev33_seasonal_residuals",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT a.day, a.x - b.x AS resid
        |  FROM daily a JOIN daily b ON b.day = a.day - 7),
        |rk AS (
        |  SELECT day, resid,
        |    row_number() OVER (ORDER BY abs(resid) DESC, day) AS rn
        |  FROM r)
        |SELECT day, CAST(rn AS INTEGER) AS rn,
        |  CAST(resid AS DOUBLE) / 10000 AS residual_dollars
        |FROM rk WHERE rn <= 5""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 4)) * lit(10000))
          .cast("long")).as("x"))
      val a = daily.select(col("day"), col("x"))
      val b = daily.select(col("day").as("bday"), col("x").as("bx"))
      val r = a.join(b, col("bday") === date_sub(col("day"), 7))
        .select(col("day"), (col("x") - col("bx")).as("resid"))
      // top-5 global: 5 rows survive per map task (WindowGroupLimit);
      // the ranked set is day-grain (calendar-bounded)
      r.withColumn("rn", row_number().over(Window.orderBy(abs(col("resid")).desc, col("day"))))
        .filter(col("rn") <= 5)
        .select(col("day"), col("rn").cast("int").as("rn"),
          (col("resid").cast("double") / lit(10000)).as("residual_dollars"))
    }
  )
}
