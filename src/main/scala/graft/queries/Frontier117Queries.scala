package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-seventeenth frontier batch: causal/econ/storage — IPW average
  * treatment effect with stratum propensities as exact rationals,
  * GSP vs VCG position-auction payments (the overpayment theorem made
  * visible on real bidder data), and a learned-index error-bound audit
  * (per-shard OLS of key→rank in exact rational arithmetic, the epsilon
  * a PGM/RMI index would have to carry).
  */
object Frontier117Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A186: inverse-propensity-weighted ATE ---------------------------------
    // a113 adjusted an odds ratio; IPW adjusts a mean difference. Per
    // user-day: treated = clicked, outcome = purchase cents. Propensity
    // within activity strata is the exact rational t_s/n_s, so each
    // stratum contributes Y1·n/t − Y0·n/(n−t) micro-cents via one
    // truncating division, and the pooled ATE divides by N once. The
    // naive (confounded) difference rides along for contrast — the
    // stratum rows show WHY they disagree (activity confounds both
    // treatment and outcome). Two aggregations, one broadcast back.
    QueryDef.sql(
      "a186_ipw_ate",
      """WITH pu AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n_ev,
        |    CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS INT)
        |      AS treated,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS y
        |  FROM events GROUP BY 1, 2),
        |cells AS (
        |  SELECT CASE WHEN n_ev <= 1 THEN 'one'
        |      WHEN n_ev <= 2 THEN 'two' ELSE 'many' END AS stratum,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(treated) AS BIGINT) AS t,
        |    CAST(sum(CASE WHEN treated = 1 THEN y ELSE 0 END) AS BIGINT) AS y1,
        |    CAST(sum(CASE WHEN treated = 0 THEN y ELSE 0 END) AS BIGINT) AS y0
        |  FROM pu GROUP BY 1),
        |terms AS (
        |  SELECT stratum, n, t, y1, y0,
        |    CAST(t * 1000000 // n AS BIGINT) AS e_micro,
        |    CAST(CASE WHEN t = 0 OR t = n THEN 0
        |      ELSE (CAST(y1 AS HUGEINT) * n * 1000000) // t
        |         - (CAST(y0 AS HUGEINT) * n * 1000000) // (n - t) END AS HUGEINT)
        |      AS term
        |  FROM cells),
        |pooled AS (
        |  SELECT CAST(sum(term) // sum(n) AS BIGINT) AS ate_ipw_micro,
        |    CAST((CAST(sum(y1) AS HUGEINT) * 1000000) // greatest(sum(t), 1)
        |      - (CAST(sum(y0) AS HUGEINT) * 1000000)
        |        // greatest(sum(n) - sum(t), 1) AS BIGINT) AS ate_naive_micro
        |  FROM terms)
        |SELECT t.stratum, t.n, t.t, t.y1, t.y0, t.e_micro,
        |  CAST(t.term // t.n AS BIGINT) AS stratum_ate_micro,
        |  p.ate_ipw_micro, p.ate_naive_micro
        |FROM terms t CROSS JOIN pooled p
        |ORDER BY t.stratum""".stripMargin) { (s, d) =>
      val pu = Tables.events(s, d)
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).cast("long").as("n_ev"),
          max(when(col("event_type") === "click", 1).otherwise(0)).as("treated"),
          sum(when(col("event_type") === "purchase",
            floor(col("value") * 100).cast("long")).otherwise(0L))
            .cast("long").as("y"))
      val cells = pu.groupBy(
          when(col("n_ev") <= 1, "one").when(col("n_ev") <= 2, "two")
            .otherwise("many").as("stratum"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("treated")).cast("long").as("t"),
          sum(when(col("treated") === 1, col("y")).otherwise(0L)).cast("long")
            .as("y1"),
          sum(when(col("treated") === 0, col("y")).otherwise(0L)).cast("long")
            .as("y0"))
      val terms = cells.select(col("stratum"), col("n"), col("t"),
        col("y1"), col("y0"),
        expr("t * 1000000 div n").cast("long").as("e_micro"),
        expr("""cast(case when t = 0 or t = n then 0
          | else (cast(y1 as decimal(38,0)) * n * 1000000) div t
          |    - (cast(y0 as decimal(38,0)) * n * 1000000) div (n - t) end
          | as decimal(38,0))""".stripMargin).as("term"))
      val pooled = terms.agg(
        expr("cast(sum(term) div sum(n) as bigint)").as("ate_ipw_micro"),
        expr("""cast((cast(sum(y1) as decimal(38,0)) * 1000000)
          |  div greatest(sum(t), 1)
          |  - (cast(sum(y0) as decimal(38,0)) * 1000000)
          |    div greatest(sum(n) - sum(t), 1) as bigint)""".stripMargin)
          .as("ate_naive_micro"))
      terms.crossJoin(broadcast(pooled))
        .select(col("stratum"), col("n"), col("t"), col("y1"), col("y0"),
          col("e_micro"),
          expr("cast(term div n as bigint)").as("stratum_ate_micro"),
          col("ate_ipw_micro"), col("ate_naive_micro"))
        .orderBy(col("stratum"))
    },

    // ---- A187: GSP vs VCG position-auction payments ----------------------------
    // Five ad slots with baked CTRs (1000/600/350/200/100 milli-clicks);
    // bidders are each nation's top-5 suppliers bidding their revenue
    // cents. GSP charges the next bid per click; VCG charges the
    // externality Σ_{j>i} bid_j·(ctr_{j-1}−ctr_j) / ctr_i — a window
    // sum over the FOLLOWING frame, one truncating division per slot.
    // The overpay column is the classic GSP ≥ VCG gap. One shuffle for
    // the per-supplier aggregate; the ranking window is per-nation.
    QueryDef.sql(
      "a187_gsp_vcg",
      """WITH rev AS (
        |  SELECT s.s_nationkey AS nk, s.s_suppkey AS sk,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS bid
        |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT nk, sk, bid,
        |    row_number() OVER (PARTITION BY nk ORDER BY bid DESC, sk ASC)
        |      AS slot
        |  FROM rev QUALIFY slot <= 5),
        |ctr AS (
        |  SELECT r.nk, r.sk, r.bid, r.slot,
        |    [1000, 600, 350, 200, 100][r.slot] AS ctr_m,
        |    CASE WHEN r.slot = 1 THEN 0
        |      ELSE [1000, 600, 350, 200, 100][r.slot - 1]
        |         - [1000, 600, 350, 200, 100][r.slot] END AS drop_m
        |  FROM ranked r),
        |pay AS (
        |  SELECT nk, sk, bid, slot, ctr_m,
        |    coalesce(lead(bid) OVER (PARTITION BY nk ORDER BY slot), 0)
        |      AS gsp_click,
        |    coalesce(sum(bid * drop_m) OVER (PARTITION BY nk ORDER BY slot
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS v_total
        |  FROM ctr)
        |SELECT n.n_name AS nation, CAST(p.slot AS INT) AS slot, p.bid,
        |  p.gsp_click AS gsp_click_cents,
        |  CAST(p.v_total // p.ctr_m AS BIGINT) AS vcg_click_cents,
        |  CAST((p.gsp_click - p.v_total // p.ctr_m) * 1000
        |    // greatest(p.v_total // p.ctr_m, 1) AS BIGINT) AS overpay_permille
        |FROM pay p JOIN nation n ON n.n_nationkey = p.nk
        |ORDER BY nation, slot""".stripMargin) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("s_nationkey").as("nk"), col("s_suppkey").as("sk"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long"))
          .cast("long").as("bid"))
      val ranked = rev.withColumn("slot", row_number().over(
          Window.partitionBy(col("nk")).orderBy(col("bid").desc, col("sk").asc)))
        .filter(col("slot") <= 5)
      val ctrs = array(lit(1000L), lit(600L), lit(350L), lit(200L), lit(100L))
      val ctr = ranked.select(col("nk"), col("sk"), col("bid"), col("slot"),
        element_at(ctrs, col("slot")).as("ctr_m"),
        when(col("slot") === 1, 0L)
          .otherwise(element_at(ctrs, col("slot") - 1)
            - element_at(ctrs, col("slot"))).as("drop_m"))
      val w = Window.partitionBy(col("nk")).orderBy(col("slot"))
      val pay = ctr.select(col("nk"), col("sk"), col("bid"), col("slot"),
        col("ctr_m"),
        coalesce(lead(col("bid"), 1).over(w), lit(0L)).as("gsp_click"),
        coalesce(sum(col("bid") * col("drop_m")).over(
          w.rowsBetween(1, Window.unboundedFollowing)), lit(0L)).as("v_total"))
      pay.join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))),
          Seq("nk"))
        .select(col("nation"), col("slot").cast("int").as("slot"), col("bid"),
          col("gsp_click").as("gsp_click_cents"),
          expr("v_total div ctr_m").cast("long").as("vcg_click_cents"),
          expr("(gsp_click - v_total div ctr_m) * 1000" +
            " div greatest(v_total div ctr_m, 1)").cast("long")
            .as("overpay_permille"))
        .orderBy(col("nation"), col("slot"))
    },

    // ---- U89: learned-index error-bound audit -----------------------------------
    // A PGM/RMI-style learned index replaces a B-tree node with a
    // linear model key→position plus an error bound epsilon. Per range
    // shard of o_orderkey: exact-rational OLS (slope = (nΣkp−ΣkΣp)/
    // (nΣk²−(Σk)²) carried as DECIMAL numerator/denominator, ONE
    // truncating division per prediction), then the max over/under
    // prediction error — the epsilon the index would binary-search
    // within. Ranks come from a per-shard window (never global); the
    // shard stats broadcast back onto the scan.
    QueryDef.sql(
      "u89_learned_index",
      """WITH mk AS (SELECT CAST(max(o_orderkey) AS BIGINT) AS mx FROM orders),
        |pos AS (
        |  SELECT CAST(o_orderkey * 8 // (m.mx + 1) AS BIGINT) AS shard,
        |    o_orderkey AS k,
        |    CAST(row_number() OVER (
        |      PARTITION BY o_orderkey * 8 // (m.mx + 1)
        |      ORDER BY o_orderkey) - 1 AS BIGINT) AS p
        |  FROM orders CROSS JOIN mk m),
        |st AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(k AS HUGEINT)) AS HUGEINT) AS sk,
        |    CAST(sum(CAST(p AS HUGEINT)) AS HUGEINT) AS sp,
        |    CAST(sum(CAST(k AS HUGEINT) * p) AS HUGEINT) AS skp,
        |    CAST(sum(CAST(k AS HUGEINT) * k) AS HUGEINT) AS skk
        |  FROM pos GROUP BY 1),
        |fit AS (
        |  SELECT shard, n,
        |    n * skp - sk * sp AS num,
        |    n * skk - sk * sk AS den,
        |    sp AS sp, sk AS sk
        |  FROM st),
        |err AS (
        |  SELECT p.shard, f.n,
        |    CAST(f.num * 1000000 // f.den AS BIGINT) AS slope_micro,
        |    p.p * 1000000
        |      - ((f.sp * f.den - f.num * f.sk) * 1000000 // (f.n * f.den)
        |         + (f.num * p.k * 1000000) // f.den) AS e
        |  FROM pos p JOIN fit f ON f.shard = p.shard)
        |SELECT shard, CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(slope_micro) AS BIGINT) AS slope_micro,
        |  CAST(max(e) AS BIGINT) AS max_over_micro,
        |  CAST(min(e) AS BIGINT) AS max_under_micro,
        |  CAST(greatest(max(e), -min(e)) AS BIGINT) AS eps_micro
        |FROM err GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val mk = Tables.orders(s, d)
        .agg(max(col("o_orderkey")).cast("long").as("mx"))
      val pos = Tables.orders(s, d).crossJoin(broadcast(mk))
        .select(expr("o_orderkey * 8 div (mx + 1)").as("shard"),
          col("o_orderkey").as("k"))
        .withColumn("p", (row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("k"))) - 1).cast("long"))
      val st = pos.groupBy(col("shard"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("k").cast("decimal(38,0)")).as("sk"),
          sum(col("p").cast("decimal(38,0)")).as("sp"),
          sum(col("k").cast("decimal(38,0)") * col("p")).as("skp"),
          sum(col("k").cast("decimal(38,0)") * col("k")).as("skk"))
      val fit = st.select(col("shard"), col("n"),
        expr("cast(n * skp - sk * sp as decimal(38,0))").as("num"),
        expr("cast(n * skk - sk * sk as decimal(38,0))").as("den"),
        col("sp"), col("sk"))
      val err = pos.join(broadcast(fit), Seq("shard"))
        .select(col("shard"), col("n"),
          expr("cast(num * 1000000 div den as bigint)").as("slope_micro"),
          expr("""p * 1000000
            | - ((sp * den - num * sk) * 1000000 div (n * den)
            |    + (num * k * 1000000) div den)""".stripMargin).as("e"))
      err.groupBy(col("shard"))
        .agg(max(col("n")).cast("long").as("n"),
          max(col("slope_micro")).cast("long").as("slope_micro"),
          max(col("e")).cast("long").as("max_over_micro"),
          min(col("e")).cast("long").as("max_under_micro"),
          greatest(max(col("e")), -min(col("e"))).cast("long").as("eps_micro"))
        .orderBy(col("shard"))
    }
  )
}
