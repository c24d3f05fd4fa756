package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-second frontier batch: quantile regression by exact pinball
  * loss, Cronbach's alpha reliability, and the cluster-sampling design
  * effect.
  */
object Frontier102Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A162: quantile regression via the exact pinball-loss curve ----------
    // The tau = 0.9 constant fit per brand, derived the way a loss
    // surface should be: the pinball loss at EVERY observed price
    // falls out of one per-brand cumulative window — at sorted rank k,
    // loss = (k*c - S_k) + 9*((T - S_k) - (n-k)*c), all integer cents
    // (x10 scale absorbs tau). No candidate-times-value pairing: the
    // prefix sum IS the loss curve, O(n) per brand. Duplicated values
    // agree between their rank rows (an x = c point contributes zero
    // to either side), so the argmin is well-defined; the median's
    // loss rides along as the contrast — how much worse the L1-optimal
    // point does under asymmetric cost.
    QueryDef.sql(
      "a162_quantile_pinball",
      """WITH v AS (
        |  SELECT p.p_brand,
        |    CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS c,
        |    l.l_orderkey, l.l_linenumber
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |w AS (
        |  SELECT p_brand, c,
        |    row_number() OVER pb AS k,
        |    sum(c) OVER pb AS sk,
        |    count(*) OVER (PARTITION BY p_brand) AS n,
        |    sum(c) OVER (PARTITION BY p_brand) AS t
        |  FROM v WINDOW pb AS (PARTITION BY p_brand ORDER BY c, l_orderkey,
        |    l_linenumber)),
        |losses AS (
        |  SELECT p_brand, c, k, n,
        |    (k * c - sk) + 9 * ((t - sk) - (n - k) * c) AS loss
        |  FROM w),
        |best AS (
        |  SELECT p_brand, n, c AS q90_cents, loss AS loss_q90
        |  FROM (SELECT p_brand, n, c, loss,
        |      row_number() OVER (PARTITION BY p_brand ORDER BY loss, c) AS rn
        |    FROM losses) WHERE rn = 1),
        |med AS (
        |  SELECT p_brand, loss AS loss_median
        |  FROM losses WHERE k = (n + 1) // 2)
        |SELECT b.p_brand, CAST(b.n AS BIGINT) AS n,
        |  b.q90_cents, CAST(b.loss_q90 AS BIGINT) AS loss_q90,
        |  CAST(m.loss_median AS BIGINT) AS loss_median,
        |  CAST(m.loss_median * 1000 // b.loss_q90 AS BIGINT) AS excess_permille
        |FROM best b JOIN med m ON b.p_brand = m.p_brand
        |ORDER BY b.p_brand""".stripMargin) { (s, d) =>
      val v = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), floor(col("l_extendedprice") * 100).cast("long")
          .as("c"), col("l_orderkey"), col("l_linenumber"))
      val pb = Window.partitionBy(col("p_brand"))
        .orderBy(col("c"), col("l_orderkey"), col("l_linenumber"))
      val pbAll = Window.partitionBy(col("p_brand"))
      val w = v
        .withColumn("k", row_number().over(pb).cast("long"))
        .withColumn("sk", sum(col("c")).over(pb))
        .withColumn("n", count(lit(1)).over(pbAll))
        .withColumn("t", sum(col("c")).over(pbAll))
      val losses = w.select(col("p_brand"), col("c"), col("k"), col("n"),
        ((col("k") * col("c") - col("sk")) +
          lit(9) * ((col("t") - col("sk")) - (col("n") - col("k")) * col("c")))
          .as("loss"))
        .localCheckpoint(true) // argmin and the median row both read it
      val best = losses
        .withColumn("rn", row_number().over(Window.partitionBy(col("p_brand"))
          .orderBy(col("loss"), col("c"))))
        .filter(col("rn") === 1)
        .select(col("p_brand"), col("n"), col("c").as("q90_cents"),
          col("loss").as("loss_q90"))
      val med = losses.filter(col("k") === expr("(n + 1) div 2"))
        .select(col("p_brand"), col("loss").as("loss_median"))
      best.join(med, Seq("p_brand"))
        .select(col("p_brand"), col("n").cast("long").as("n"), col("q90_cents"),
          col("loss_q90").cast("long").as("loss_q90"),
          col("loss_median").cast("long").as("loss_median"),
          expr("cast(loss_median * 1000 div loss_q90 as bigint)")
            .as("excess_permille"))
        .orderBy(col("p_brand"))
    },

    // ---- A163: Cronbach's alpha -----------------------------------------------
    // Scale reliability for a 4-item instrument: each 1995 customer's
    // quarterly order counts are the items; alpha asks whether the
    // four quarters measure one underlying propensity. With population
    // variances every term is the integer n*sum(x^2) - sum(x)^2, so
    // alpha = (k/(k-1)) * (B - A) / B is one sign-aware division in
    // micro units — no float variance ever computed. One pivot
    // aggregate per customer, one moment aggregate, everything else is
    // scalar algebra on a single row.
    QueryDef.sql(
      "a163_cronbach_alpha",
      """WITH items AS (
        |  SELECT o_custkey,
        |    CAST(count(*) FILTER (WHERE extract(quarter FROM
        |      CAST(o_orderdate AS DATE)) = 1) AS BIGINT) AS x1,
        |    CAST(count(*) FILTER (WHERE extract(quarter FROM
        |      CAST(o_orderdate AS DATE)) = 2) AS BIGINT) AS x2,
        |    CAST(count(*) FILTER (WHERE extract(quarter FROM
        |      CAST(o_orderdate AS DATE)) = 3) AS BIGINT) AS x3,
        |    CAST(count(*) FILTER (WHERE extract(quarter FROM
        |      CAST(o_orderdate AS DATE)) = 4) AS BIGINT) AS x4
        |  FROM orders
        |  WHERE extract(year FROM CAST(o_orderdate AS DATE)) = 1995
        |  GROUP BY 1),
        |mo AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x1*x1) AS BIGINT) AS q1,
        |    CAST(sum(x2) AS BIGINT) AS s2, CAST(sum(x2*x2) AS BIGINT) AS q2,
        |    CAST(sum(x3) AS BIGINT) AS s3, CAST(sum(x3*x3) AS BIGINT) AS q3,
        |    CAST(sum(x4) AS BIGINT) AS s4, CAST(sum(x4*x4) AS BIGINT) AS q4,
        |    CAST(sum(x1+x2+x3+x4) AS BIGINT) AS st,
        |    CAST(sum((x1+x2+x3+x4)*(x1+x2+x3+x4)) AS BIGINT) AS qt
        |  FROM items),
        |ab AS (
        |  SELECT n,
        |    (n*q1 - s1*s1) + (n*q2 - s2*s2) + (n*q3 - s3*s3) + (n*q4 - s4*s4)
        |      AS a,
        |    n*qt - st*st AS b
        |  FROM mo)
        |SELECT n AS n_customers, CAST(4 AS BIGINT) AS k_items,
        |  CAST(a AS BIGINT) AS sum_item_var_num, CAST(b AS BIGINT) AS total_var_num,
        |  CAST(CASE WHEN b = 0 THEN 0
        |    WHEN b - a >= 0 THEN (4 * (b - a) * 1000000) // (3 * b)
        |    ELSE -((4 * (a - b) * 1000000) // (3 * b)) END AS BIGINT)
        |    AS alpha_micro
        |FROM ab""".stripMargin) { (s, d) =>
      val items = Tables.orders(s, d)
        .filter(year(col("o_orderdate")) === 1995)
        .groupBy(col("o_custkey"))
        .agg(
          sum(when(quarter(col("o_orderdate")) === 1, 1).otherwise(0)).cast("long")
            .as("x1"),
          sum(when(quarter(col("o_orderdate")) === 2, 1).otherwise(0)).cast("long")
            .as("x2"),
          sum(when(quarter(col("o_orderdate")) === 3, 1).otherwise(0)).cast("long")
            .as("x3"),
          sum(when(quarter(col("o_orderdate")) === 4, 1).otherwise(0)).cast("long")
            .as("x4"))
      val mo = items.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x1") * col("x1")).as("q1"),
        sum(col("x2")).as("s2"), sum(col("x2") * col("x2")).as("q2"),
        sum(col("x3")).as("s3"), sum(col("x3") * col("x3")).as("q3"),
        sum(col("x4")).as("s4"), sum(col("x4") * col("x4")).as("q4"),
        sum(col("x1") + col("x2") + col("x3") + col("x4")).as("st"),
        sum((col("x1") + col("x2") + col("x3") + col("x4")) *
          (col("x1") + col("x2") + col("x3") + col("x4"))).as("qt"))
      mo.select(col("n"),
          ((col("n") * col("q1") - col("s1") * col("s1")) +
            (col("n") * col("q2") - col("s2") * col("s2")) +
            (col("n") * col("q3") - col("s3") * col("s3")) +
            (col("n") * col("q4") - col("s4") * col("s4"))).as("a"),
          (col("n") * col("qt") - col("st") * col("st")).as("b"))
        .select(col("n").as("n_customers"), lit(4L).as("k_items"),
          col("a").cast("long").as("sum_item_var_num"),
          col("b").cast("long").as("total_var_num"),
          expr("""cast(case when b = 0 then 0
            when b - a >= 0 then (4 * (b - a) * 1000000) div (3 * b)
            else -((4 * (a - b) * 1000000) div (3 * b)) end as bigint)""")
            .as("alpha_micro"))
    },

    // ---- A166: cluster-sampling design effect ---------------------------------
    // Surveys that sample whole nations instead of individual
    // customers pay a variance penalty of DEFF = 1 + (m-1)*rho. The
    // intraclass correlation comes from the one-way ANOVA decomposition
    // over balance DOLLARS with cluster means quantized to integer
    // milli-units (the grid that keeps 150k-customer sums inside
    // DECIMAL(38,0) where the exact rational form would need the
    // product of all cluster sizes). rho and DEFF are each one
    // sign-aware division; the effective sample size is what a
    // nation-clustered survey of N customers is really worth.
    QueryDef.sql(
      "a166_design_effect",
      """WITH base AS (
        |  SELECT c_nationkey AS cl,
        |    CAST(floor(c_acctbal) AS BIGINT) + 1000 AS x
        |  FROM customer),
        |g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |  CAST(sum(x) AS HUGEINT) AS s FROM base),
        |cm AS (
        |  SELECT cl, CAST(count(*) AS HUGEINT) AS nj,
        |    (CAST(sum(x) AS HUGEINT) * 1000) // CAST(count(*) AS HUGEINT) AS mj
        |  FROM base GROUP BY cl),
        |gm AS (SELECT (s * 1000) // n AS m FROM g),
        |ssb AS (
        |  SELECT CAST(sum(cm.nj * (cm.mj - gm.m) * (cm.mj - gm.m)) AS HUGEINT)
        |    AS v, CAST(count(*) AS HUGEINT) AS k
        |  FROM cm, gm),
        |ssw AS (
        |  SELECT CAST(sum((b.x * 1000 - cm.mj) * (b.x * 1000 - cm.mj))
        |    AS HUGEINT) AS v
        |  FROM base b JOIN cm ON b.cl = cm.cl),
        |parts AS (
        |  SELECT g.n, ssb.k, ssb.v AS sb, ssw.v AS sw,
        |    ssb.k * (ssb.v * (g.n - ssb.k) - ssw.v * (ssb.k - 1)) AS rho_num,
        |    ssb.k * ssb.v * (g.n - ssb.k) + (g.n - ssb.k) * ssw.v * (ssb.k - 1)
        |      AS rho_den
        |  FROM g, ssb, ssw),
        |rho AS (
        |  SELECT n, k,
        |    CASE WHEN rho_den = 0 THEN 0
        |      WHEN rho_num >= 0 THEN (rho_num * 1000000) // rho_den
        |      ELSE -((-rho_num * 1000000) // rho_den) END AS rho_micro
        |  FROM parts),
        |deff AS (
        |  SELECT n, k, rho_micro,
        |    CASE WHEN rho_micro >= 0
        |      THEN 1000000 + ((n - k) * rho_micro) // k
        |      ELSE 1000000 - ((n - k) * (-rho_micro)) // k END AS deff_micro
        |  FROM rho)
        |SELECT CAST(n AS BIGINT) AS n_customers, CAST(k AS BIGINT) AS k_clusters,
        |  CAST((n * 1000) // k AS BIGINT) AS avg_cluster_milli,
        |  CAST(rho_micro AS BIGINT) AS icc_micro,
        |  CAST(deff_micro AS BIGINT) AS deff_micro,
        |  CAST((n * 1000000) // deff_micro AS BIGINT) AS effective_n
        |FROM deff""".stripMargin) { (s, d) =>
      // +1000 shifts balances nonnegative: variance is shift-invariant and
      // every quotient stays floor==truncate safe across engines
      val base = Tables.customer(s, d)
        .select(col("c_nationkey").as("cl"),
          (floor(col("c_acctbal")).cast("long") + 1000).as("x"))
        .localCheckpoint(true) // moments, cluster means and SSW all read it
      val g = base.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("s"))
      val cm = base.groupBy(col("cl"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("nj"),
          expr("cast((cast(sum(x) as decimal(38,0)) * 1000) div count(1) as decimal(38,0))")
            .as("mj"))
      val gm = g.select(expr("cast((s * 1000) div n as decimal(38,0))").as("m"),
        col("n"))
      val ssb = cm.crossJoin(broadcast(gm))
        .agg(sum(col("nj") * (col("mj") - col("m")) * (col("mj") - col("m")))
          .cast("decimal(38,0)").as("sb"),
          count(lit(1)).cast("decimal(38,0)").as("k"))
      val ssw = base.join(broadcast(cm.select(col("cl"), col("mj"))), Seq("cl"))
        .agg(sum((col("x") * 1000 - col("mj")) * (col("x") * 1000 - col("mj")))
          .cast("decimal(38,0)").as("sw"))
      g.crossJoin(broadcast(ssb)).crossJoin(broadcast(ssw))
        .select(col("n"), col("k"), col("sb"), col("sw"),
          (col("k") * (col("sb") * (col("n") - col("k")) -
            col("sw") * (col("k") - 1))).as("rho_num"),
          (col("k") * col("sb") * (col("n") - col("k")) +
            (col("n") - col("k")) * col("sw") * (col("k") - 1)).as("rho_den"))
        .select(col("n"), col("k"),
          expr("""case when rho_den = 0 then cast(0 as decimal(38,0))
            when rho_num >= 0 then (rho_num * 1000000) div rho_den
            else -(((-rho_num) * 1000000) div rho_den) end""").as("rho_micro"))
        .select(col("n"), col("k"), col("rho_micro"),
          expr("""case when rho_micro >= 0
            then 1000000 + ((n - k) * rho_micro) div k
            else 1000000 - ((n - k) * (-rho_micro)) div k end""")
            .as("deff_micro"))
        .select(col("n").cast("long").as("n_customers"),
          col("k").cast("long").as("k_clusters"),
          expr("cast((n * 1000) div k as bigint)").as("avg_cluster_milli"),
          col("rho_micro").cast("long").as("icc_micro"),
          col("deff_micro").cast("long").as("deff_micro"),
          expr("cast((n * 1000000) div deff_micro as bigint)")
            .as("effective_n"))
    }
  )
}
