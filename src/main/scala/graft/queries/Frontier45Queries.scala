package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Forty-fifth frontier batch: exact Shapley-value channel attribution,
  * depth-2 binary-segmentation changepoints, randomized-response
  * privacy with deterministic noise.
  */
object Frontier45Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A101: exact Shapley-value attribution ------------------------------
    // Game-theoretic credit assignment done EXACTLY: the four
    // non-purchase channels (click=1, error=2, signup=4, view=8) form
    // coalitions; a user's coalition is the bitmask of channels they
    // touched, and v(S) is that cohort's conversion rate in truncated
    // micro-units (empty cohorts contribute v=0 — stated convention,
    // identical both sides). φ_i = Σ_{S∌i} |S|!(3−|S|)!/4!·(v(S∪i)−v(S))
    // multiplied through by 24 → integer weights [6,2,2,6] by |S|,
    // one final div 24. The scale shape: users collapse to ≤16 mask
    // rows in ONE map-side-combinable shuffle; the coalition algebra
    // (16×4 joins on mask|bit) runs on broadcast crumbs. Efficiency
    // check (Σφ vs v(full)−v(∅)) ships in the output.
    QueryDef.sql(
      "a101_shapley_attribution",
      """WITH per_user AS (
        |  SELECT user_id,
        |    CAST(sum(CASE event_type WHEN 'click' THEN 1 ELSE 0 END) > 0 AS INT)
        |      + 2 * CAST(sum(CASE event_type WHEN 'error' THEN 1 ELSE 0 END) > 0 AS INT)
        |      + 4 * CAST(sum(CASE event_type WHEN 'signup' THEN 1 ELSE 0 END) > 0 AS INT)
        |      + 8 * CAST(sum(CASE event_type WHEN 'view' THEN 1 ELSE 0 END) > 0 AS INT)
        |      AS mask,
        |    CAST(sum(CASE event_type WHEN 'purchase' THEN 1 ELSE 0 END) > 0 AS INT)
        |      AS conv
        |  FROM events GROUP BY 1),
        |cohort AS (
        |  SELECT mask, CAST(count(*) AS BIGINT) AS users,
        |    CAST(sum(conv) AS BIGINT) AS convs
        |  FROM per_user GROUP BY 1),
        |v AS (
        |  SELECT t.m AS mask,
        |    coalesce((c.convs * 1000000) // c.users, 0) AS v_micro
        |  FROM range(0, 16) t(m) LEFT JOIN cohort c ON t.m = c.mask),
        |ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
        |  ('signup', 4), ('view', 8)) AS t(channel, bit)),
        |contrib AS (
        |  SELECT ch.channel,
        |    CASE bit_count(s.mask) WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
        |      ELSE 6 END * (si.v_micro - s.v_micro) AS wdelta
        |  FROM ch JOIN v s ON (s.mask & ch.bit) = 0
        |  JOIN v si ON si.mask = (s.mask | ch.bit)),
        |phi AS (
        |  SELECT channel,
        |    CAST(CASE WHEN sum(wdelta) >= 0 THEN sum(wdelta) // 24
        |      ELSE -((-sum(wdelta)) // 24) END AS BIGINT) AS phi_micro
        |  FROM contrib GROUP BY 1),
        |eff AS (
        |  SELECT max(CASE WHEN mask = 15 THEN v_micro END)
        |    - max(CASE WHEN mask = 0 THEN v_micro END) AS total_gain
        |  FROM v)
        |SELECT p.channel, p.phi_micro,
        |  CAST(e.total_gain AS BIGINT) AS total_gain_micro
        |FROM phi p CROSS JOIN eff e""".stripMargin) { (s, d) =>
      import s.implicits._
      val perUser = Tables.events(s, d).groupBy(col("user_id"))
        .agg(
          (max(when(col("event_type") === "click", 1).otherwise(0))
            + max(when(col("event_type") === "error", 1).otherwise(0)) * 2
            + max(when(col("event_type") === "signup", 1).otherwise(0)) * 4
            + max(when(col("event_type") === "view", 1).otherwise(0)) * 8).as("mask"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      val cohort = perUser.groupBy(col("mask"))
        .agg(count(lit(1)).as("users"), sum(col("conv")).cast("long").as("convs"))
      val allMasks = s.range(0, 16).select(col("id").cast("int").as("mask"))
      val v = allMasks.join(broadcast(cohort), Seq("mask"), "left")
        .select(col("mask"),
          coalesce(expr("convs * 1000000 div users"), lit(0L)).as("v_micro"))
        .localCheckpoint(true) // feeds three joins below
      val ch = Seq(("click", 1), ("error", 2), ("signup", 4), ("view", 8))
        .toDF("channel", "bit")
      val sNoI = v.select(col("mask").as("smask"), col("v_micro").as("vs"))
      val sWithI = v.select(col("mask").as("simask"), col("v_micro").as("vsi"))
      val contrib = broadcast(ch).join(broadcast(sNoI),
          expr("(smask & bit) = 0"))
        .join(broadcast(sWithI), expr("simask = (smask | bit)"))
        .select(col("channel"),
          (when(expr("bit_count(smask)").isin(0, 3), lit(6)).otherwise(lit(2))
            * (col("vsi") - col("vs"))).as("wdelta"))
      val phi = contrib.groupBy(col("channel"))
        .agg(sum(col("wdelta")).as("sw"))
        // truncate toward zero to match DuckDB's // on the negated value
        .select(col("channel"),
          when(col("sw") >= 0, expr("sw div 24"))
            .otherwise(-expr("(-sw) div 24")).cast("long").as("phi_micro"))
      val eff = v.agg(
        (max(when(col("mask") === 15, col("v_micro")))
          - max(when(col("mask") === 0, col("v_micro")))).as("total_gain"))
      phi.crossJoin(broadcast(eff))
        .select(col("channel"), col("phi_micro"),
          col("total_gain").cast("long").as("total_gain_micro"))
    },

    // ---- A102: depth-2 binary segmentation (three changepoints) -------------
    // a71 found THE shift; real series have several. Depth-2 binary
    // segmentation re-runs the exact-SSE argmin inside each half of
    // the root split: segment-local prefix sums come FREE from the
    // global ones (P(a..k] = p_k − p_a), so the second level reuses
    // the same scan — no re-aggregation. Costs stay the a71 shape
    // (two exact-integer rationals per candidate, double-summed in
    // fixed op order; ties → earlier day) and each level's argmin is
    // one bounded day-grain window. Emits root/left/right splits.
    QueryDef.sql(
      "a102_binary_segmentation",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |pre AS (
        |  SELECT day, x,
        |    row_number() OVER (ORDER BY day) AS k,
        |    CAST(sum(CAST(x AS HUGEINT)) OVER (ORDER BY day) AS HUGEINT) AS p,
        |    CAST(sum(CAST(x AS HUGEINT) * x) OVER (ORDER BY day) AS HUGEINT) AS q
        |  FROM daily),
        |tot AS (SELECT CAST(max(k) AS HUGEINT) AS n, max(p) AS tp, max(q) AS tq
        |  FROM pre),
        |root AS (
        |  SELECT k AS rk, day AS rday FROM (
        |    SELECT day, k, row_number() OVER (ORDER BY
        |      CAST(k * q - p * p AS DOUBLE) / CAST(k AS DOUBLE)
        |      + CAST((n - k) * (tq - q) - (tp - p) * (tp - p) AS DOUBLE)
        |        / CAST(n - k AS DOUBLE), day) AS rn
        |    FROM pre CROSS JOIN tot WHERE k < n) WHERE rn = 1),
        |seg AS (
        |  SELECT 'left' AS side, CAST(0 AS HUGEINT) AS lo, rk AS hi,
        |    CAST(0 AS HUGEINT) AS po, CAST(0 AS HUGEINT) AS qo FROM root
        |  UNION ALL
        |  SELECT 'right', rk, n, p, q
        |  FROM root JOIN pre ON pre.k = root.rk CROSS JOIN tot),
        |child AS (
        |  SELECT side, day, k, row_number() OVER (PARTITION BY side ORDER BY
        |      CAST((k - lo) * (q - qo) - (p - po) * (p - po) AS DOUBLE)
        |        / CAST(k - lo AS DOUBLE)
        |      + CAST((hi - k) * (qh - q) - (ph - p) * (ph - p) AS DOUBLE)
        |        / CAST(hi - k AS DOUBLE), day) AS rn
        |  FROM (SELECT s.*, pre.day, pre.k, pre.p, pre.q,
        |          hp.p AS ph, hp.q AS qh
        |        FROM seg s
        |        JOIN pre ON pre.k > s.lo AND pre.k < s.hi
        |        JOIN pre hp ON hp.k = s.hi))
        |SELECT side AS segment, day AS split_day, CAST(k AS BIGINT) AS k
        |FROM (SELECT 'root' AS side, rday AS day, rk AS k FROM root
        |      UNION ALL
        |      SELECT side, day, CAST(k AS HUGEINT) FROM child WHERE rn = 1)
        |ORDER BY segment""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"))
      val wD = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pre = daily
        .withColumn("k", row_number().over(Window.orderBy(col("day"))).cast(dec))
        .withColumn("p", sum(col("x").cast(dec)).over(wD))
        .withColumn("q", sum(col("x").cast(dec) * col("x")).over(wD))
        .localCheckpoint(true) // day-grain table reused by both levels
      val tot = pre.agg(max(col("k")).as("n"), max(col("p")).as("tp"),
        max(col("q")).as("tq"))
      def cost(k: Column, p: Column, q: Column,
               lo: Column, po: Column, qo: Column,
               hi: Column, ph: Column, qh: Column): Column =
        ((k - lo) * (q - qo) - (p - po) * (p - po)).cast("double") /
          (k - lo).cast("double") +
          ((hi - k) * (qh - q) - (ph - p) * (ph - p)).cast("double") /
            (hi - k).cast("double")
      val zero = lit(0).cast(dec)
      val rootCand = pre.crossJoin(broadcast(tot)).filter(col("k") < col("n"))
        .withColumn("rn", row_number().over(Window.orderBy(
          cost(col("k"), col("p"), col("q"), zero, zero, zero,
            col("n"), col("tp"), col("tq")), col("day"))))
        .filter(col("rn") === 1)
        .select(col("k").as("rk"), col("day").as("rday"),
          col("p").as("rp"), col("q").as("rq"))
      val root = rootCand.crossJoin(broadcast(tot)).localCheckpoint(true)
      val seg = root.select(lit("left").as("side"), zero.as("lo"), col("rk").as("hi"),
          zero.as("po"), zero.as("qo"), col("rp").as("ph"), col("rq").as("qh"))
        .unionByName(root.select(lit("right").as("side"), col("rk").as("lo"),
          col("n").as("hi"), col("rp").as("po"), col("rq").as("qo"),
          col("tp").as("ph"), col("tq").as("qh")))
      val child = pre.join(broadcast(seg),
          col("k") > col("lo") && col("k") < col("hi"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("side"))
          .orderBy(cost(col("k"), col("p"), col("q"),
            col("lo"), col("po"), col("qo"),
            col("hi"), col("ph"), col("qh")), col("day"))))
        .filter(col("rn") === 1)
        .select(col("side").as("segment"), col("day").as("split_day"),
          col("k").cast("long").as("k"))
      root.select(lit("root").as("segment"), col("rday").as("split_day"),
          col("rk").cast("long").as("k"))
        .unionByName(child)
        .orderBy(col("segment"))
    },

    // ---- C38: randomized response (local differential privacy) --------------
    // The privacy mechanism a 100 TB user-data pipeline actually
    // ships: each user's sensitive bit (did they purchase?) is
    // reported FLIPPED with probability q = 1/4, and the population
    // rate is debiased as π̂ = (p̂ − q)/(1 − 2q) = 2·p̂ − 1/2. The
    // flip coin is two md5 bits — deterministic, so the whole
    // mechanism sits under the hash gate while remaining a faithful
    // ε = ln(3) randomized-response instance. Everything is exact
    // integer micro-units; the true rate rides along as the
    // gate-scale luxury a production run would not see.
    QueryDef.sql(
      "c38_randomized_response",
      """WITH per_user AS (
        |  SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT)
        |      AS truth,
        |    CAST(('0x' || substr(md5('rr:' || CAST(user_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 4 = 0 AS INT) AS flip
        |  FROM events GROUP BY 1),
        |rep AS (
        |  SELECT user_id, truth,
        |    CASE WHEN flip = 1 THEN 1 - truth ELSE truth END AS reported
        |  FROM per_user),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(truth) AS BIGINT) AS true_count,
        |    CAST(sum(reported) AS BIGINT) AS reported_count
        |  FROM rep)
        |SELECT n_users, true_count, reported_count,
        |  CAST(2 * ((reported_count * 1000000) // n_users) - 500000 AS BIGINT)
        |    AS pi_hat_micro,
        |  CAST((true_count * 1000000) // n_users AS BIGINT) AS true_micro
        |FROM agg""".stripMargin) { (s, d) =>
      val perUser = Tables.events(s, d).groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("truth"))
        .withColumn("flip",
          (expr("CAST(conv(substring(md5(concat('rr:', CAST(user_id AS STRING))), 1, 8), 16, 10) AS BIGINT)")
            % 4 === 0).cast("int"))
        .withColumn("reported",
          when(col("flip") === 1, lit(1) - col("truth")).otherwise(col("truth")))
      perUser.agg(count(lit(1)).as("n_users"),
          sum(col("truth")).cast("long").as("true_count"),
          sum(col("reported")).cast("long").as("reported_count"))
        .select(col("n_users"), col("true_count"), col("reported_count"),
          (lit(2) * expr("reported_count * 1000000 div n_users") - 500000)
            .cast("long").as("pi_hat_micro"),
          expr("true_count * 1000000 div n_users").cast("long").as("true_micro"))
    }
  )
}
