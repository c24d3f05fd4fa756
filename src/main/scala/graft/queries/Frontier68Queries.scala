package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.multimodal.Multimodal

/** Sixty-eighth frontier batch: audio energy segmentation, Brier score
  * decomposition, 2-bit quantization recall curve.
  */
object Frontier68Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- M10: audio energy segmentation (VAD shape) -------------------------
    // The step after m5's frame features: merge consecutive over-
    // threshold frames into SEGMENTS (voice-activity detection's
    // output shape). "Energy" stays exact by comparing the SUM of
    // squared samples against 32·τ² (no RMS division, no sqrt);
    // segments form with the island rule over the frame index (a gap
    // in passing frames closes a segment). Asset-partitioned windows
    // only; emits one row per segment.
    QueryDef.sql(
      "m10_energy_segments",
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    printf('W:%d;H:%d;F:%d;',
        |      CAST(doc_id % 64 + 16 AS BIGINT),
        |      CAST((doc_id * 7) % 64 + 16 AS BIGINT),
        |      CAST(doc_id % 10 + 1 AS BIGINT)) || substring(text, 1, 128) AS m
        |  FROM documents WHERE doc_id % 3 = 2),
        |c AS (
        |  SELECT asset_id,
        |    list_transform(string_split_regex(
        |      regexp_replace(m, '^W:[0-9]+;H:[0-9]+;F:[0-9]+;', ''), ''),
        |      ch -> ascii(ch)) AS codes
        |  FROM a),
        |w AS (
        |  SELECT asset_id, codes,
        |    unnest(generate_series(0, (len(codes) - 32) // 16)) AS widx
        |  FROM c WHERE len(codes) >= 32),
        |en AS (
        |  SELECT asset_id, CAST(widx AS INT) AS widx,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(codes[widx * 16 + 1 : widx * 16 + 32],
        |        x -> CAST(x AS BIGINT) * x)), (p, q) -> p + q) AS ssq
        |  FROM w),
        |hot AS (
        |  SELECT asset_id, widx,
        |    CASE WHEN widx - lag(widx) OVER (PARTITION BY asset_id ORDER BY widx)
        |      > 1 OR lag(widx) OVER (PARTITION BY asset_id ORDER BY widx) IS NULL
        |      THEN 1 ELSE 0 END AS new_seg
        |  FROM en WHERE ssq > 32 * 99 * 99),
        |seg AS (
        |  SELECT asset_id, widx,
        |    CAST(sum(new_seg) OVER (PARTITION BY asset_id ORDER BY widx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS seg_id
        |  FROM hot)
        |SELECT asset_id, seg_id,
        |  CAST(min(widx) AS INT) AS first_frame, CAST(max(widx) AS INT) AS last_frame,
        |  CAST(count(*) AS BIGINT) AS n_frames
        |FROM seg GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val base = Multimodal.syntheticAssets(Tables.documents(s, d))
        .filter(col("media_type") === "audio")
        .select(col("asset_id"),
          expr("transform(split(regexp_replace(cast(media as string), '^W:[0-9]+;H:[0-9]+;F:[0-9]+;', ''), ''), ch -> ascii(ch))")
            .as("codes0"))
        .select(col("asset_id"), expr("filter(codes0, x -> x > 0)").as("codes"))
        .filter(size(col("codes")) >= 32)
        .localCheckpoint(true) // pin before the per-frame fan-out (m8's lesson)
      val en = base
        .select(col("asset_id"), col("codes"),
          explode(expr("sequence(0, (size(codes) - 32) div 16)")).as("widx"))
        .select(col("asset_id"), col("widx").cast("int").as("widx"),
          expr("""aggregate(slice(codes, widx * 16 + 1, 32),
                cast(0 as bigint), (p, q) -> p + cast(q as bigint) * q)""").as("ssq"))
      val wo = Window.partitionBy(col("asset_id")).orderBy(col("widx"))
      val hot = en.filter(col("ssq") > 32L * 99 * 99)
        .withColumn("new_seg",
          when(col("widx") - lag(col("widx"), 1).over(wo) > 1 ||
            lag(col("widx"), 1).over(wo).isNull, 1).otherwise(0))
      hot.withColumn("seg_id", sum(col("new_seg"))
          .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
        .groupBy(col("asset_id"), col("seg_id"))
        .agg(min(col("widx")).cast("int").as("first_frame"),
          max(col("widx")).cast("int").as("last_frame"),
          count(lit(1)).as("n_frames"))
        .orderBy(col("asset_id"), col("seg_id"))
    },

    // ---- A128: Brier score decomposition ------------------------------------
    // t20 checks calibration; the Brier DECOMPOSITION says WHY a
    // forecaster scores what it scores: BS = reliability − resolution
    // + uncertainty. Forecasts are first-half per-activity-band base
    // rates (integer rationals kⱼ/nⱼ); outcomes are second-half
    // conversions. Every term lands on the common grid N·Πnⱼ-free:
    // per-bin terms scale by the bin's own denominator only, so
    // micro-unit floors happen once per bin (documented quantization,
    // identical in both engines). One user-half aggregate, bin crumbs.
    QueryDef.sql(
      "a128_brier_decomposition",
      """WITH uh AS (
        |  SELECT user_id,
        |    CAST(count(CASE WHEN day(CAST(ts AS DATE)) <= 15 THEN 1 END)
        |      AS BIGINT) AS n1,
        |    CAST(max(CASE WHEN event_type = 'purchase'
        |      AND day(CAST(ts AS DATE)) <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(max(CASE WHEN event_type = 'purchase'
        |      AND day(CAST(ts AS DATE)) > 15 THEN 1 ELSE 0 END) AS BIGINT) AS c2
        |  FROM events GROUP BY 1),
        |b AS (
        |  SELECT CASE WHEN n1 <= 30 THEN 0 WHEN n1 <= 36 THEN 1 ELSE 2 END
        |    AS bin, c1, c2
        |  FROM uh),
        |fit AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS nb,
        |    CAST(sum(c1) AS BIGINT) AS k1,
        |    CAST(sum(c2) AS BIGINT) AS k2
        |  FROM b GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(nb) AS BIGINT) AS n, CAST(sum(k2) AS BIGINT) AS k
        |  FROM fit),
        |terms AS (
        |  SELECT f.bin, f.nb, f.k1, f.k2,
        |    CAST((f.k1 * 1000) // f.nb AS BIGINT) AS forecast_permille,
        |    -- reliability: nb*(p_b - o_b)^2 on the per-bin grid nb^2
        |    CAST(((f.k1 - f.k2) * (f.k1 - f.k2) * 1000000) // f.nb AS BIGINT)
        |      AS rel_term_micro,
        |    -- resolution: nb*(o_b - o)^2, cross-multiplied by N
        |    CAST(((f.k2 * t.n - t.k * f.nb) * (f.k2 * t.n - t.k * f.nb) * 1000000)
        |      // (f.nb * t.n * t.n) AS BIGINT) AS res_term_micro
        |  FROM fit f CROSS JOIN tot t)
        |SELECT bin, nb, forecast_permille,
        |  CAST((k2 * 1000) // nb AS BIGINT) AS outcome_permille,
        |  rel_term_micro, res_term_micro,
        |  (SELECT CAST((t.k * (t.n - t.k) * 1000000) // (t.n * t.n) AS BIGINT)
        |   FROM tot t) AS uncertainty_micro
        |FROM terms ORDER BY bin""".stripMargin) { (s, d) =>
      val uh = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(when(dayofmonth(col("ts").cast("date")) <= 15, 1)).as("n1"),
          max(when(col("event_type") === "purchase" &&
            dayofmonth(col("ts").cast("date")) <= 15, 1L).otherwise(0L)).as("c1"),
          max(when(col("event_type") === "purchase" &&
            dayofmonth(col("ts").cast("date")) > 15, 1L).otherwise(0L)).as("c2"))
      val b = uh.select(
        when(col("n1") <= 30, 0).when(col("n1") <= 36, 1).otherwise(2).as("bin"),
        col("c1"), col("c2"))
      val fit = b.groupBy(col("bin"))
        .agg(count(lit(1)).as("nb"), sum(col("c1")).cast("long").as("k1"),
          sum(col("c2")).cast("long").as("k2"))
        .localCheckpoint(true) // bins feed both the totals and the terms
      val tot = fit.agg(sum(col("nb")).cast("long").as("n"),
        sum(col("k2")).cast("long").as("k"))
      fit.crossJoin(broadcast(tot))
        .select(col("bin"), col("nb"),
          expr("cast((k1 * 1000) div nb as bigint)").as("forecast_permille"),
          expr("cast((k2 * 1000) div nb as bigint)").as("outcome_permille"),
          expr("cast(((k1 - k2) * (k1 - k2) * 1000000) div nb as bigint)")
            .as("rel_term_micro"),
          expr("""cast(((k2 * n - k * nb) * (k2 * n - k * nb) * 1000000)
                div (nb * n * n) as bigint)""").as("res_term_micro"),
          expr("cast((k * (n - k) * 1000000) div (n * n) as bigint)")
            .as("uncertainty_micro"))
        .orderBy(col("bin"))
    },

    // ---- V39: 2-bit quantization recall curve -------------------------------
    // How much retrieval survives 2-bit codes? Corpus vectors quantize
    // to 4 levels by FIXED thresholds (−0.1/0/0.1 — portable floors,
    // no training); scoring is the asymmetric form (float query ×
    // dequantized level, exact in 10⁻¹-scaled integers because levels
    // are multiples of 0.15); the top-5 overlap against the exact
    // ranking is deterministic end-to-end — an oracle-checked recall
    // number for a 16× compression. One pair pass serves both ranks.
    QueryDef.sql(
      "v39_int2_recall",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*c.emb[i])),
        |      (x,y) -> x+y) AS dot_exact,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(q.emb)+1),
        |        i -> q.emb[i] * (CASE WHEN c.emb[i] < -0.1 THEN -0.225
        |          WHEN c.emb[i] < 0.0 THEN -0.075
        |          WHEN c.emb[i] < 0.1 THEN 0.075 ELSE 0.225 END))),
        |      (x,y) -> x+y) AS dot_q
        |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |te AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, rank() OVER (PARTITION BY query_id
        |      ORDER BY dot_exact DESC, neighbor_id) AS r FROM pairs) WHERE r <= 5),
        |tq AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, rank() OVER (PARTITION BY query_id
        |      ORDER BY dot_q DESC, neighbor_id) AS r FROM pairs) WHERE r <= 5)
        |SELECT t.query_id,
        |  CAST(count(e2.neighbor_id) AS BIGINT) AS n_overlap,
        |  CAST(count(e2.neighbor_id) * 1000 // 5 AS BIGINT) AS recall_permille
        |FROM tq t LEFT JOIN te e2
        |  ON t.query_id = e2.query_id AND t.neighbor_id = e2.neighbor_id
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import graft.operators.VectorOps
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), VectorOps.toDouble(col("embedding")).as("q_emb"))
      val c = emb.select(col("vec_id").as("neighbor_id"),
        VectorOps.toDouble(col("embedding")).as("n_emb"))
      val pairs = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          VectorOps.dot(col("q_emb"), col("n_emb")).as("dot_exact"),
          expr("""aggregate(zip_with(q_emb, n_emb, (a, b) ->
                a * (CASE WHEN b < -0.1D THEN -0.225D WHEN b < 0.0D THEN -0.075D
                     WHEN b < 0.1D THEN 0.075D ELSE 0.225D END)),
              cast(0.0 as double), (x, y) -> x + y)""").as("dot_q"))
        .localCheckpoint(true) // one pair pass serves both rankings
      val byQ = Window.partitionBy(col("query_id"))
      val te = pairs.withColumn("r",
          rank().over(byQ.orderBy(col("dot_exact").desc, col("neighbor_id"))))
        .filter(col("r") <= 5).select(col("query_id"), col("neighbor_id"))
      val tq = pairs.withColumn("r",
          rank().over(byQ.orderBy(col("dot_q").desc, col("neighbor_id"))))
        .filter(col("r") <= 5)
        .select(col("query_id"), col("neighbor_id").as("qn"))
      tq.join(te.withColumnRenamed("neighbor_id", "en"),
          tq("query_id") === te("query_id") && col("qn") === col("en"), "left")
        .groupBy(tq("query_id"))
        .agg(count(col("en")).as("n_overlap"),
          expr("cast(count(en) * 1000 div 5 as bigint)").as("recall_permille"))
        .orderBy(tq("query_id"))
    }
  )
}
