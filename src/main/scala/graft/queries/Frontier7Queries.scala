package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Seventh frontier batch: deterministic contrastive-pair construction
  * for dual-encoder training, Kaplan-Meier survival with censoring
  * (the churn curve), and a cross-table reconciliation audit.
  */
object Frontier7Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- T33: deterministic contrastive pair construction ------------------
    // Dual-encoder training batches need positive pairs WITHOUT random
    // sampling (reproducible epochs, resumable shards): within each
    // (source, lang) block, rank docs on the (n_chars, doc_id) total
    // order and pair rank 2k−1 with 2k — adjacent ranks give
    // length-matched positives, the leftover odd doc drops. One
    // partitioned window, pairing by integer arithmetic on the rank
    // (join on pair_id = (rk+1) div 2), no self-join over content.
    QueryDef.sql(
      "t33_contrastive_pairs",
      """WITH rk AS (
        |  SELECT source, lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source, lang
        |                       ORDER BY n_chars, doc_id) AS r
        |  FROM documents),
        |p AS (SELECT source, lang, doc_id, n_chars, (r + 1) // 2 AS pair_id,
        |             r % 2 AS side
        |      FROM rk)
        |SELECT a.source, a.lang, a.pair_id,
        |  a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(b.n_chars - a.n_chars AS BIGINT) AS len_gap
        |FROM (SELECT * FROM p WHERE side = 1) a
        |JOIN (SELECT * FROM p WHERE side = 0) b
        |  ON a.source = b.source AND a.lang = b.lang AND a.pair_id = b.pair_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("source"), col("lang"))
        .orderBy(col("n_chars"), col("doc_id"))
      val rk = Tables.documents(s, d)
        .select(col("source"), col("lang"), col("doc_id"), col("n_chars"))
        .withColumn("r", row_number().over(w))
      val p = rk.select(col("source"), col("lang"), col("doc_id"), col("n_chars"),
        expr("(r + 1) div 2").as("pair_id"), (col("r") % 2).as("side"))
      val a = p.filter(col("side") === 1)
        .select(col("source"), col("lang"), col("pair_id"),
          col("doc_id").as("id_a"), col("n_chars").as("na"))
      val b = p.filter(col("side") === 0)
        .select(col("source"), col("lang"), col("pair_id"),
          col("doc_id").as("id_b"), col("n_chars").as("nb"))
      a.join(b, Seq("source", "lang", "pair_id"))
        .select(col("source"), col("lang"), col("pair_id"), col("id_a"), col("id_b"),
          (col("nb") - col("na")).cast("long").as("len_gap"))
    },

    // ---- A40: Kaplan-Meier time-to-conversion curve (censored) ------------
    // Survival analysis of days from a user's FIRST event to their
    // FIRST purchase; users who never purchase are right-censored at
    // their last observed day. The KM estimator
    // S(t) = Π_{t_i <= t} (1 − d_i/n_i) multiplies exact rationals in
    // duration order — both engines fold identical doubles in the same
    // order, round-6 absorbing the last-ulp; risk counts n_i come from
    // a suffix sum over the duration-grain table (bounded by the
    // calendar, not by users).
    QueryDef.sql(
      "a40_survival_km",
      """WITH f AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS first_day,
        |    max(CAST(ts AS DATE)) AS last_day
        |  FROM events GROUP BY user_id),
        |p AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS first_purchase
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
        |obs AS (
        |  SELECT CASE WHEN first_purchase IS NULL
        |              THEN date_diff('day', first_day, last_day)
        |              ELSE date_diff('day', first_day, first_purchase) END AS dur,
        |    CASE WHEN first_purchase IS NULL THEN 0 ELSE 1 END AS died
        |  FROM f LEFT JOIN p USING (user_id)),
        |g AS (
        |  SELECT dur, CAST(count(*) AS BIGINT) AS n_at,
        |    CAST(sum(died) AS BIGINT) AS d
        |  FROM obs GROUP BY dur),
        |r AS (
        |  SELECT dur, d,
        |    CAST(sum(n_at) OVER (ORDER BY dur DESC) AS BIGINT) AS n_risk
        |  FROM g),
        |st AS (SELECT dur, CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS step
        |       FROM r),
        |s AS (
        |  SELECT a.dur, a.d, a.n_risk,
        |    list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
        |      list(b.step ORDER BY b.dur)), (x, y) -> x * y) AS surv_raw
        |  FROM r a JOIN st b ON b.dur <= a.dur
        |  GROUP BY a.dur, a.d, a.n_risk)
        |SELECT dur AS duration_days, n_risk, d AS n_deaths,
        |  round(surv_raw, 6) AS survival
        |FROM s WHERE d > 0""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val f = ev.groupBy(col("user_id"))
        .agg(min(col("ts").cast("date")).as("first_day"),
          max(col("ts").cast("date")).as("last_day"))
      val p = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(min(col("ts").cast("date")).as("first_purchase"))
      val obs = f.join(p, Seq("user_id"), "left")
        .select(
          when(col("first_purchase").isNull,
            datediff(col("last_day"), col("first_day")))
            .otherwise(datediff(col("first_purchase"), col("first_day"))).as("dur"),
          when(col("first_purchase").isNull, 0L).otherwise(1L).as("died"))
      val g = obs.groupBy(col("dur"))
        .agg(count(lit(1)).as("n_at"), sum(col("died")).as("d"))
      // duration-grain table (bounded): suffix-sum risk set + ordered
      // cumulative product of the per-step survival fractions
      val wDesc = Window.orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAsc = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = g.withColumn("n_risk", sum(col("n_at")).over(wDesc))
      val s2 = r.withColumn("step",
          (col("n_risk") - col("d")).cast("double") / col("n_risk").cast("double"))
        .withColumn("surv_raw",
          aggregate(
            transform(sort_array(collect_list(struct(col("dur"), col("step"))).over(wAsc)),
              x => x.getField("step")),
            lit(1.0), (acc, t) => acc * t))
      s2.filter(col("d") > 0)
        .select(col("dur").as("duration_days"), col("n_risk"), col("d").as("n_deaths"),
          round(col("surv_raw"), 6).as("survival"))
    },

    // ---- U19: cross-table reconciliation audit -----------------------------
    // Does the order header total reconcile with its line items? The
    // audit every finance warehouse runs nightly. Differences stay in
    // exact integer units; the readout buckets them by sign and
    // decimal magnitude via STRING LENGTH of the absolute difference
    // (pure integer/string ops — no log10 float at the boundary).
    // Shape: one partial-agg shuffle on l_orderkey, one join to the
    // header, one tiny aggregate on (sign, magnitude).
    QueryDef.sql(
      "u19_consistency_audit",
      """WITH l AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT)
        |      AS line_units
        |  FROM lineitem GROUP BY 1),
        |j AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
        |      - coalesce(line_units, 0) AS diff
        |  FROM orders LEFT JOIN l ON o_orderkey = l_orderkey),
        |b AS (
        |  SELECT CASE WHEN diff > 0 THEN 1 WHEN diff < 0 THEN -1 ELSE 0 END AS sign,
        |    CASE WHEN diff = 0 THEN 0 ELSE len(CAST(abs(diff) AS VARCHAR)) END AS magnitude
        |  FROM j)
        |SELECT CAST(sign AS INTEGER) AS sign, CAST(magnitude AS INTEGER) AS magnitude,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM b GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice").cast(DecimalType(18, 4)) * lit(10000))
          .cast("long")).as("line_units"))
      val j = Tables.orders(s, d)
        .join(l, col("o_orderkey") === col("l_orderkey"), "left")
        .select(((col("o_totalprice").cast(DecimalType(18, 4)) * lit(10000)).cast("long")
          - coalesce(col("line_units"), lit(0L))).as("diff"))
      j.select(
          when(col("diff") > 0, 1).when(col("diff") < 0, -1).otherwise(0).as("sign"),
          when(col("diff") === 0, 0)
            .otherwise(length(abs(col("diff")).cast("string"))).as("magnitude"))
        .groupBy(col("sign"), col("magnitude"))
        .agg(count(lit(1)).as("n_orders"))
        .select(col("sign").cast("int").as("sign"),
          col("magnitude").cast("int").as("magnitude"), col("n_orders"))
    }
  )
}
