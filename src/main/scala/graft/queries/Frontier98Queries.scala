package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.ShardedRank

/** Ninety-eighth frontier batch: the peeking problem quantified on A/A
  * experiments, sorted-neighborhood record-linkage blocking, and a
  * count-min sketch with its overcount audited against exact counts.
  */
object Frontier98Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A152: the peeking problem, quantified on A/A data --------------------
    // Twenty pseudo-experiments are run on the SAME null data: each
    // user is assigned an arm by md5 parity (an A/A test — any
    // "significant" result is a false positive by construction). The
    // naive dashboard checks a two-proportion z-test after EVERY event
    // (|z| > 2, n >= 30); the disciplined one tests once at the fixed
    // horizon. The z-test is cross-multiplied to exact integers —
    // z^2 > 4 on a fair coin is (2k-n)^2 > 4n — so the crossing set is
    // bit-reproducible. Peeking turns a nominal ~5% error rate into
    // the majority of experiments "winning"; the fixed-horizon column
    // is the honest rate. Scale: one cumulative window partitioned by
    // experiment (20 shards), no global ordering.
    QueryDef.sql(
      "a152_peeking_fp_audit",
      """WITH obs AS (
        |  SELECT e.exp_id,
        |    CAST(('0x' || substr(md5(CAST(ev.user_id AS VARCHAR) || ':' ||
        |      CAST(e.exp_id AS VARCHAR)), 1, 4)) AS BIGINT) % 2 AS arm,
        |    ev.ts, ev.event_id
        |  FROM events ev
        |  CROSS JOIN (SELECT unnest(generate_series(0, 19)) AS exp_id) e),
        |walk AS (
        |  SELECT exp_id,
        |    CAST(sum(arm) OVER (PARTITION BY exp_id ORDER BY ts, event_id)
        |      AS BIGINT) AS k,
        |    CAST(count(*) OVER (PARTITION BY exp_id ORDER BY ts, event_id)
        |      AS BIGINT) AS n
        |  FROM obs),
        |per_exp AS (
        |  SELECT exp_id,
        |    max(CASE WHEN n >= 30 AND (2*k - n)*(2*k - n) > 4*n
        |             THEN 1 ELSE 0 END) AS peek_hit,
        |    max(CASE WHEN n = (SELECT count(*) FROM events)
        |              AND (2*k - n)*(2*k - n) > 4*n THEN 1 ELSE 0 END) AS fixed_hit
        |  FROM walk GROUP BY exp_id),
        |pol AS (
        |  SELECT 'peek_every_event' AS policy, CAST(sum(peek_hit) AS BIGINT)
        |    AS n_flagged FROM per_exp
        |  UNION ALL
        |  SELECT 'fixed_horizon', CAST(sum(fixed_hit) AS BIGINT) FROM per_exp)
        |SELECT policy, CAST(20 AS BIGINT) AS n_experiments, n_flagged,
        |  CAST(n_flagged * 1000 // 20 AS BIGINT) AS fp_permille
        |FROM pol ORDER BY policy""".stripMargin) { (s, d) =>
      val nEvents = Tables.events(s, d).agg(count(lit(1)).as("n_total"))
      val obs = Tables.events(s, d)
        .crossJoin(broadcast(s.range(0, 20).toDF("exp_id")))
        .select(col("exp_id"),
          (conv(substring(md5(concat(col("user_id").cast("string"), lit(":"),
            col("exp_id").cast("string"))), 1, 4), 16, 10).cast("long") % 2)
            .as("arm"),
          col("ts"), col("event_id"))
      val w = Window.partitionBy(col("exp_id")).orderBy(col("ts"), col("event_id"))
      val walk = obs
        .withColumn("k", sum(col("arm")).over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(w).cast("long"))
      val perExp = walk.crossJoin(broadcast(nEvents))
        .groupBy(col("exp_id"))
        .agg(
          max(when(col("n") >= 30 &&
            (lit(2) * col("k") - col("n")) * (lit(2) * col("k") - col("n")) >
              lit(4) * col("n"), 1).otherwise(0)).as("peek_hit"),
          max(when(col("n") === col("n_total") &&
            (lit(2) * col("k") - col("n")) * (lit(2) * col("k") - col("n")) >
              lit(4) * col("n"), 1).otherwise(0)).as("fixed_hit"))
      val pol = perExp.agg(sum(col("peek_hit")).cast("long").as("n_flagged"))
        .select(lit("peek_every_event").as("policy"), col("n_flagged"))
        .unionByName(perExp.agg(sum(col("fixed_hit")).cast("long").as("n_flagged"))
          .select(lit("fixed_horizon").as("policy"), col("n_flagged")))
      pol.select(col("policy"), lit(20L).as("n_experiments"), col("n_flagged"),
          expr("cast(n_flagged * 1000 div 20 as bigint)").as("fp_permille"))
        .orderBy(col("policy"))
    },

    // ---- J19: sorted-neighborhood blocking ------------------------------------
    // The third classic entity-resolution blocking scheme (after LSH
    // d3 and key-blocking j17): sort all records by name, compare only
    // records within a window of w = 5 ranks. The global sort rank
    // comes from ShardedRank (range-partition + broadcast offsets — no
    // single-partition window), and the "window" becomes a self-join
    // on rank div w against the same and the next bucket, so neighbor
    // pairs stay co-partitioned at any scale. The audit reports the
    // candidate-pair budget and what the window actually caught:
    // same-first-token pairs and levenshtein-near names.
    QueryDef.sql(
      "j19_sorted_neighborhood",
      """WITH rk AS (
        |  SELECT p_partkey, p_name,
        |    row_number() OVER (ORDER BY p_name, p_partkey) AS r
        |  FROM part),
        |cand AS (
        |  SELECT a.p_name AS name_a, b.p_name AS name_b
        |  FROM rk a JOIN rk b
        |    ON b.r > a.r AND b.r <= a.r + 5),
        |scored AS (
        |  SELECT CASE WHEN split_part(name_a, ' ', 1) = split_part(name_b, ' ', 1)
        |              THEN 1 ELSE 0 END AS same_first,
        |    CASE WHEN levenshtein(name_a, name_b) <= 8 THEN 1 ELSE 0 END AS near
        |  FROM cand)
        |SELECT CAST(5 AS BIGINT) AS window_w,
        |  (SELECT CAST(count(*) AS BIGINT) FROM part) AS n_records,
        |  CAST(count(*) AS BIGINT) AS n_candidates,
        |  CAST(sum(same_first) AS BIGINT) AS n_same_first_token,
        |  CAST(sum(near) AS BIGINT) AS n_near_names,
        |  CAST(sum(near) * 1000 // count(*) AS BIGINT) AS precision_permille
        |FROM scored""".stripMargin) { (s, d) =>
      val w = 5
      val nRecs = Tables.part(s, d).agg(count(lit(1)).as("n_records"))
      val rk = ShardedRank.withRank(
        Tables.part(s, d).select(col("p_partkey"), col("p_name")),
        "r", col("p_name").asc, col("p_partkey"))
        .select(col("p_name"), col("r"), expr(s"r div $w").as("b"))
        .localCheckpoint(true) // both join sides read the ranked table
      val left = rk.select(col("p_name").as("name_a"), col("r").as("ra"),
        col("b").as("ba"))
      // a candidate pair with gap <= w lives in the same bucket or spans
      // one boundary — join each left bucket to itself and its successor
      val right = rk.select(col("p_name").as("name_b"), col("r").as("rb"),
        explode(array(col("b"), col("b") - 1)).as("ba"))
      val cand = left.join(right, Seq("ba"))
        .filter(col("rb") > col("ra") && col("rb") <= col("ra") + w)
      val scored = cand.select(
        when(split(col("name_a"), " ").getItem(0) ===
          split(col("name_b"), " ").getItem(0), 1).otherwise(0).as("same_first"),
        // banded levenshtein returns -1 above the threshold — demand [0, 8]
        when(levenshtein(col("name_a"), col("name_b"), 9).between(0, 8), 1)
          .otherwise(0).as("near"))
      scored.agg(count(lit(1)).as("n_candidates"),
          sum(col("same_first")).cast("long").as("n_same_first_token"),
          sum(col("near")).cast("long").as("n_near_names"))
        .crossJoin(broadcast(nRecs))
        .select(lit(5L).as("window_w"), col("n_records"), col("n_candidates"),
          col("n_same_first_token"), col("n_near_names"),
          expr("cast(n_near_names * 1000 div n_candidates as bigint)")
            .as("precision_permille"))
    },

    // ---- A159: count-min sketch with exact overcount audit --------------------
    // The frequency sketch the HLL (a100) and KMV (a145) family was
    // missing: d = 4 hash rows x w = 64 counters, each counter the sum
    // of every key hashing into it, point estimate = min over rows.
    // Unlike probabilistic sketches the CM estimate is a deterministic
    // function of the data, so the whole thing sits under the hash
    // gate: for the ten heaviest users the query reports the exact
    // count beside the sketch estimate and the collision overcount in
    // permille (always >= 1000 — CM errors are one-sided). The sketch
    // build is one groupBy over (row, bucket); the probe broadcasts
    // 256 counters back onto the key table.
    QueryDef.sql(
      "a159_countmin_sketch",
      """WITH truec AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS true_cnt
        |  FROM events GROUP BY user_id),
        |keyed AS (
        |  SELECT t.user_id, t.true_cnt, s.seed,
        |    CAST(('0x' || substr(md5(CAST(s.seed AS VARCHAR) || ':' ||
        |      CAST(t.user_id AS VARCHAR)), 1, 4)) AS BIGINT) % 64 AS bucket
        |  FROM truec t
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS seed) s),
        |cm AS (
        |  SELECT seed, bucket, CAST(sum(true_cnt) AS BIGINT) AS counter
        |  FROM keyed GROUP BY seed, bucket),
        |est AS (
        |  SELECT k.user_id, k.true_cnt,
        |    min(c.counter) AS cm_est
        |  FROM keyed k JOIN cm c ON k.seed = c.seed AND k.bucket = c.bucket
        |  GROUP BY k.user_id, k.true_cnt)
        |SELECT user_id, true_cnt, cm_est,
        |  CAST(cm_est * 1000 // true_cnt AS BIGINT) AS overcount_permille
        |FROM est
        |ORDER BY true_cnt DESC, user_id LIMIT 10""".stripMargin) { (s, d) =>
      val truec = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("true_cnt"))
        .localCheckpoint(true) // sketch build and probe both read it
      val keyed = truec
        .crossJoin(broadcast(s.range(0, 4).toDF("seed")))
        .select(col("user_id"), col("true_cnt"), col("seed"),
          (conv(substring(md5(concat(col("seed").cast("string"), lit(":"),
            col("user_id").cast("string"))), 1, 4), 16, 10).cast("long") % 64)
            .as("bucket"))
      val cm = keyed.groupBy(col("seed"), col("bucket"))
        .agg(sum(col("true_cnt")).cast("long").as("counter"))
      val est = keyed.join(broadcast(cm), Seq("seed", "bucket"))
        .groupBy(col("user_id"), col("true_cnt"))
        .agg(min(col("counter")).as("cm_est"))
      est.select(col("user_id"), col("true_cnt"), col("cm_est"),
          expr("cast(cm_est * 1000 div true_cnt as bigint)")
            .as("overcount_permille"))
        .orderBy(col("true_cnt").desc, col("user_id")).limit(10)
    }
  )
}
