package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-seventh frontier batch: Banzhaf voting power, secretary-rule
  * optimal stopping replay, and per-user contribution capping.
  */
object Frontier107Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A172: Banzhaf power index ---------------------------------------------
    // Weighted voting among the five regions, weight = order count,
    // quota = strict majority of total weight. With five players the
    // full 2^5 coalition lattice is enumerated outright (a 32-row
    // cross join, not an approximation): player i's Banzhaf count is
    // the number of coalitions where i is CRITICAL (coalition wins
    // with i, loses without), and the index normalizes by the total
    // swing count in micro-units. Voting power is famously NOT
    // proportional to weight — this computes the exact gap.
    QueryDef.sql(
      "a172_banzhaf_power",
      """WITH w AS (
        |  SELECT r.r_regionkey AS rk, r.r_name,
        |    CAST(count(*) AS BIGINT) AS wt
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  JOIN region r ON n.n_regionkey = r.r_regionkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(wt) AS BIGINT) AS t FROM w),
        |coal AS (SELECT unnest(generate_series(0, 31)) AS s),
        |cw AS (
        |  SELECT c.s, CAST(sum(CASE WHEN (c.s >> w.rk) & 1 = 1
        |    THEN w.wt ELSE 0 END) AS BIGINT) AS cwt
        |  FROM coal c CROSS JOIN w
        |  GROUP BY 1),
        |swing AS (
        |  SELECT w.rk, w.r_name, w.wt,
        |    CAST(sum(CASE WHEN (cw.s >> w.rk) & 1 = 1
        |      AND 2 * cw.cwt > t.t
        |      AND 2 * (cw.cwt - w.wt) <= t.t THEN 1 ELSE 0 END) AS BIGINT)
        |      AS swings
        |  FROM w CROSS JOIN tot t JOIN cw ON true
        |  GROUP BY 1, 2, 3),
        |stot AS (SELECT CAST(sum(swings) AS BIGINT) AS st FROM swing)
        |SELECT s.r_name, s.wt AS weight,
        |  CAST(s.wt * 1000000 // t.t AS BIGINT) AS weight_share_micro,
        |  s.swings,
        |  CAST(s.swings * 1000000 // st.st AS BIGINT) AS banzhaf_micro
        |FROM swing s CROSS JOIN tot t CROSS JOIN stot st
        |ORDER BY r_name""".stripMargin) { (s, d) =>
      val w = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_regionkey").as("rk"), col("r_name"))
        .agg(count(lit(1)).cast("long").as("wt"))
        .localCheckpoint(true) // 5 rows; totals, lattice and swings read it
      val tot = w.agg(sum(col("wt")).cast("long").as("t"))
      val coal = s.range(0, 32).select(col("id").cast("int").as("s"))
      val cw = coal.crossJoin(broadcast(w))
        .groupBy(col("s"))
        .agg(sum(when(expr("(s >> rk) & 1 = 1"), col("wt")).otherwise(0L))
          .cast("long").as("cwt"))
      val swing = w.crossJoin(broadcast(tot)).crossJoin(broadcast(cw))
        .groupBy(col("rk"), col("r_name"), col("wt"))
        .agg(sum(when(
          expr("(s >> rk) & 1 = 1") &&
            col("cwt") * 2 > col("t") &&
            (col("cwt") - col("wt")) * 2 <= col("t"), 1L).otherwise(0L))
          .cast("long").as("swings"))
      val stot = swing.agg(sum(col("swings")).cast("long").as("st"))
      swing.crossJoin(broadcast(tot)).crossJoin(broadcast(stot))
        .select(col("r_name"), col("wt").as("weight"),
          expr("wt * 1000000 div t").cast("long").as("weight_share_micro"),
          col("swings"),
          expr("swings * 1000000 div st").cast("long").as("banzhaf_micro"))
        .orderBy(col("r_name"))
    },

    // ---- EV99: secretary-problem stopping rule replay --------------------------
    // Replays the classic optimal-stopping policy on every user's real
    // event sequence: skip the first ceil(r*n) observations, note their
    // maximum, then accept the first later value that beats it (or the
    // final event if none does). One pass per threshold r computes the
    // policy's success rate at picking the sequence's true maximum —
    // the 37% rule's 1/e guarantee, audited on observed data instead
    // of assumed-random arrival order. Everything is per-user windows;
    // no cross-user state.
    QueryDef.sql(
      "ev99_secretary_replay",
      """WITH seq AS (
        |  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS cents,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS pos,
        |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,
        |    max(CAST(floor(value * 100) AS BIGINT))
        |      OVER (PARTITION BY user_id) AS best
        |  FROM events),
        |rs AS (SELECT unnest([100, 250, 370, 500]) AS r_permille),
        |probe AS (
        |  SELECT s.user_id, r.r_permille, s.pos, s.cents, s.n, s.best,
        |    (s.n * r.r_permille + 999) // 1000 AS k
        |  FROM seq s CROSS JOIN rs r),
        |thresh AS (
        |  SELECT user_id, r_permille, max(CASE WHEN pos <= k THEN cents END)
        |    AS bar, min(k) AS k, min(n) AS n, min(best) AS best
        |  FROM probe GROUP BY 1, 2),
        |accept AS (
        |  SELECT p.user_id, p.r_permille,
        |    min(CASE WHEN p.pos > t.k AND p.cents > t.bar THEN p.pos END)
        |      AS acc_pos
        |  FROM probe p JOIN thresh t
        |    ON t.user_id = p.user_id AND t.r_permille = p.r_permille
        |  GROUP BY 1, 2),
        |outcome AS (
        |  SELECT t.user_id, t.r_permille,
        |    CASE WHEN a.acc_pos IS NULL THEN lastv.cents ELSE pickv.cents END
        |      AS picked, t.best
        |  FROM thresh t
        |  JOIN accept a ON a.user_id = t.user_id
        |    AND a.r_permille = t.r_permille
        |  JOIN probe lastv ON lastv.user_id = t.user_id
        |    AND lastv.r_permille = t.r_permille AND lastv.pos = t.n
        |  LEFT JOIN probe pickv ON pickv.user_id = t.user_id
        |    AND pickv.r_permille = t.r_permille AND pickv.pos = a.acc_pos)
        |SELECT CAST(r_permille AS INT) AS r_permille,
        |  CAST(count(*) AS BIGINT) AS trials,
        |  CAST(sum(CASE WHEN picked = best THEN 1 ELSE 0 END) AS BIGINT)
        |    AS successes,
        |  CAST(sum(CASE WHEN picked = best THEN 1 ELSE 0 END) * 1000
        |    // count(*) AS BIGINT) AS success_permille
        |FROM outcome
        |GROUP BY 1 ORDER BY r_permille""".stripMargin) { (s, d) =>
      val wUser = Window.partitionBy(col("user_id"))
      val seq0 = Tables.events(s, d)
        .select(col("user_id"),
          floor(col("value") * 100).cast("long").as("cents"),
          row_number().over(wUser.orderBy(col("ts"), col("event_id"))).as("pos"))
        .select(col("user_id"), col("cents"), col("pos"),
          count(lit(1)).over(wUser).cast("long").as("n"),
          max(col("cents")).over(wUser).as("best"))
        .localCheckpoint(true) // fanned out across four thresholds
      val rs = s.range(0, 4).select(
        element_at(array(lit(100), lit(250), lit(370), lit(500)),
          col("id").cast("int") + 1).as("r_permille"))
      val probe = seq0.crossJoin(broadcast(rs))
        .withColumn("k", expr("(n * r_permille + 999) div 1000"))
      val thresh = probe.groupBy(col("user_id"), col("r_permille"))
        .agg(max(when(col("pos") <= col("k"), col("cents"))).as("bar"),
          min(col("k")).as("k"), min(col("n")).as("n"),
          min(col("best")).as("best"))
      val accept = probe.join(
          thresh.select(col("user_id").as("tu"), col("r_permille").as("tr"),
            col("bar"), col("k").as("tk")),
          col("tu") === col("user_id") && col("tr") === col("r_permille"))
        .groupBy(col("user_id"), col("r_permille"))
        .agg(min(when(col("pos") > col("tk") && col("cents") > col("bar"),
          col("pos"))).as("acc_pos"))
      val outcome = thresh
        .join(accept, Seq("user_id", "r_permille"))
        .join(probe.select(col("user_id").as("lu"), col("r_permille").as("lr"),
          col("pos").as("lpos"), col("cents").as("last_cents")),
          col("lu") === col("user_id") && col("lr") === col("r_permille") &&
            col("lpos") === col("n"))
        .join(probe.select(col("user_id").as("pu"), col("r_permille").as("pr"),
          col("pos").as("ppos"), col("cents").as("pick_cents")),
          col("pu") === col("user_id") && col("pr") === col("r_permille") &&
            col("ppos") === col("acc_pos"), "left")
        .select(col("r_permille"),
          when(col("acc_pos").isNull, col("last_cents"))
            .otherwise(col("pick_cents")).as("picked"),
          col("best"))
      outcome.groupBy(col("r_permille"))
        .agg(count(lit(1)).cast("long").as("trials"),
          sum(when(col("picked") === col("best"), 1L).otherwise(0L))
            .cast("long").as("successes"))
        .select(col("r_permille").cast("int").as("r_permille"), col("trials"),
          col("successes"),
          expr("successes * 1000 div trials").cast("long")
            .as("success_permille"))
        .orderBy(col("r_permille"))
    },

    // ---- C57: per-user contribution capping ------------------------------------
    // The differential-privacy preprocessing step: bound each user's
    // contribution to every aggregate at cap k before adding noise.
    // For caps 1/4/16 this reports, per event type, the capped count
    // beside the true count and the utility loss in permille — the
    // exact price of each sensitivity bound, computed from one
    // (user, type) aggregation fanned across the three caps.
    QueryDef.sql(
      "c57_contribution_capping",
      """WITH uc AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |caps AS (SELECT unnest([1, 4, 16]) AS cap)
        |SELECT c.cap, u.event_type,
        |  CAST(sum(u.cnt) AS BIGINT) AS true_count,
        |  CAST(sum(least(u.cnt, CAST(c.cap AS BIGINT))) AS BIGINT)
        |    AS capped_count,
        |  CAST((sum(u.cnt) - sum(least(u.cnt, CAST(c.cap AS BIGINT))))
        |    * 1000 // sum(u.cnt) AS BIGINT) AS loss_permille
        |FROM uc u CROSS JOIN caps c
        |GROUP BY 1, 2
        |ORDER BY cap, event_type""".stripMargin) { (s, d) =>
      val uc = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      val caps = s.range(0, 3).select(
        element_at(array(lit(1), lit(4), lit(16)), col("id").cast("int") + 1)
          .as("cap"))
      uc.crossJoin(broadcast(caps))
        .groupBy(col("cap"), col("event_type"))
        .agg(sum(col("cnt")).cast("long").as("true_count"),
          sum(least(col("cnt"), col("cap").cast("long"))).cast("long")
            .as("capped_count"))
        .select(col("cap"), col("event_type"), col("true_count"),
          col("capped_count"),
          expr("(true_count - capped_count) * 1000 div true_count")
            .cast("long").as("loss_permille"))
        .orderBy(col("cap"), col("event_type"))
    }
  )
}
