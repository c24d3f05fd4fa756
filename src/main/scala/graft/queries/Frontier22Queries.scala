package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Twenty-second frontier batch: field-level CDC merge, a Simpson's
  * paradox detector, and per-source dataset cards.
  */
object Frontier22Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- U27: field-level CDC merge ----------------------------------------
    // u8/u9 merge whole rows (last-writer-wins); real CDC streams often
    // carry PARTIAL updates — each version fills some fields and
    // leaves the rest NULL. The read-side merge takes, per key, the
    // latest NON-NULL value per field. Spark side: ONE partial-agg
    // shuffle computes every field at once via
    // max(when(f IS NOT NULL, struct(version, f))) — the struct max
    // orders by version first, so each field independently selects its
    // own latest contributor. The oracle proves the same semantics
    // with one rank-window per field. Version = event_id (unique,
    // monotone with arrival in this derivation).
    QueryDef.sql(
      "u27_field_merge",
      """WITH upd AS (
        |  SELECT user_id, event_id AS version,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) END AS f_purchase,
        |    CASE WHEN event_type = 'click'
        |      THEN CAST(floor(value * 100) AS BIGINT) END AS f_click
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |pa AS (
        |  SELECT user_id, f_purchase FROM (
        |    SELECT user_id, f_purchase,
        |      row_number() OVER (PARTITION BY user_id ORDER BY version DESC) AS rn
        |    FROM upd WHERE f_purchase IS NOT NULL) WHERE rn = 1),
        |cl AS (
        |  SELECT user_id, f_click FROM (
        |    SELECT user_id, f_click,
        |      row_number() OVER (PARTITION BY user_id ORDER BY version DESC) AS rn
        |    FROM upd WHERE f_click IS NOT NULL) WHERE rn = 1),
        |n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_versions FROM upd GROUP BY 1)
        |SELECT n.user_id, pa.f_purchase AS latest_purchase_cents,
        |  cl.f_click AS latest_click_cents, n.n_versions
        |FROM n LEFT JOIN pa USING (user_id) LEFT JOIN cl USING (user_id)""".stripMargin) {
      (s, d) =>
      val upd = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("user_id"), col("event_id").as("version"),
          when(col("event_type") === "purchase",
            floor(col("value") * 100).cast("long")).as("f_purchase"),
          when(col("event_type") === "click",
            floor(col("value") * 100).cast("long")).as("f_click"))
      upd.groupBy(col("user_id"))
        .agg(
          max(when(col("f_purchase").isNotNull,
            struct(col("version").as("v"), col("f_purchase").as("f"))))
            .getField("f").as("latest_purchase_cents"),
          max(when(col("f_click").isNotNull,
            struct(col("version").as("v"), col("f_click").as("f"))))
            .getField("f").as("latest_click_cents"),
          count(lit(1)).as("n_versions"))
        .select(col("user_id"), col("latest_purchase_cents"),
          col("latest_click_cents"), col("n_versions"))
    },

    // ---- A62: Simpson's paradox detector -----------------------------------
    // Does the price/quantity relationship within each return-flag
    // segment contradict the pooled relationship? Per-segment and
    // pooled OLS slopes from the SAME exact integer sufficient
    // statistics (a17's discipline: quantity and price quantize at
    // the scan, all five moments are DECIMAL-exact, the slope is one
    // rounded division), plus the sign-flip verdict. One partial-agg
    // shuffle on the segment key; the pooled row is the broadcast
    // 1-row aggregate.
    QueryDef.sql(
      "a62_simpson_flip",
      """WITH q AS (
        |  SELECT l_returnflag AS seg,
        |    CAST(floor(l_quantity) AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |seg AS (
        |  SELECT seg, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        |  FROM q GROUP BY 1),
        |pooled AS (
        |  SELECT CAST(sum(n) AS HUGEINT) AS pn,
        |    CAST(sum(sx) AS HUGEINT) AS psx, CAST(sum(sy) AS HUGEINT) AS psy,
        |    CAST(sum(sxy) AS HUGEINT) AS psxy, CAST(sum(sxx) AS HUGEINT) AS psxx
        |  FROM seg)
        |SELECT s.seg, s.n,
        |  round(CAST(s.n * s.sxy - s.sx * s.sy AS DOUBLE)
        |    / CAST(s.n * s.sxx - s.sx * s.sx AS DOUBLE), 6) AS seg_slope,
        |  round(CAST(p.pn * p.psxy - p.psx * p.psy AS DOUBLE)
        |    / CAST(p.pn * p.psxx - p.psx * p.psx AS DOUBLE), 6) AS pooled_slope,
        |  (CAST(s.n * s.sxy - s.sx * s.sy AS DOUBLE)
        |    * CAST(p.pn * p.psxy - p.psx * p.psy AS DOUBLE) < 0) AS sign_flip
        |FROM seg s CROSS JOIN pooled p""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val q = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("seg"),
          floor(col("l_quantity")).cast("long").as("x"),
          floor(col("l_extendedprice") * 100).cast("long").as("y"))
      val seg = q.groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
          sum(col("x").cast(dec) * col("y")).as("sxy"),
          sum(col("x").cast(dec) * col("x")).as("sxx"))
      val pooled = seg.agg(
        sum(col("n").cast(dec)).as("pn"),
        sum(col("sx")).as("psx"), sum(col("sy")).as("psy"),
        sum(col("sxy")).as("psxy"), sum(col("sxx")).as("psxx"))
      val segNum = col("n") * col("sxy") - col("sx") * col("sy")
      val segDen = col("n") * col("sxx") - col("sx") * col("sx")
      val pNum = col("pn") * col("psxy") - col("psx") * col("psy")
      val pDen = col("pn") * col("psxx") - col("psx") * col("psx")
      seg.crossJoin(broadcast(pooled))
        .select(col("seg"), col("n"),
          round(segNum.cast("double") / segDen.cast("double"), 6).as("seg_slope"),
          round(pNum.cast("double") / pDen.cast("double"), 6).as("pooled_slope"),
          (segNum.cast("double") * pNum.cast("double") < 0).as("sign_flip"))
    },

    // ---- C24: dataset cards ------------------------------------------------
    // The per-source summary a training-data release ships: document
    // and token volume, language spread with the modal language
    // (pinned ties: count DESC, lang ASC), exact-duplicate rate, and
    // the short-document share. Each statistic is one pass over the
    // documents scan; the card assembles by joining source-grain
    // aggregates — at 100 TB each input is already one partial-agg
    // shuffle on the (bounded) source key.
    QueryDef.sql(
      "c24_dataset_card",
      """WITH base AS (
        |  SELECT source, lang, md5(text) AS h,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS toks
        |  FROM documents),
        |per_source AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(toks) AS BIGINT) AS total_tokens,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(count(DISTINCT h) AS BIGINT) AS n_unique,
        |    CAST(count(*) FILTER (WHERE toks < 50) AS BIGINT) AS n_short
        |  FROM base GROUP BY 1),
        |lang_counts AS (
        |  SELECT source, lang, count(*) AS c FROM base GROUP BY 1, 2),
        |top_lang AS (
        |  SELECT source, lang AS modal_lang FROM (
        |    SELECT source, lang,
        |      row_number() OVER (PARTITION BY source ORDER BY c DESC, lang) AS rn
        |    FROM lang_counts) WHERE rn = 1)
        |SELECT p.source, p.n_docs, p.total_tokens,
        |  round(CAST(p.total_tokens AS DOUBLE) / CAST(p.n_docs AS DOUBLE), 6)
        |    AS mean_tokens,
        |  p.n_langs, t.modal_lang,
        |  round(1.0 - CAST(p.n_unique AS DOUBLE) / CAST(p.n_docs AS DOUBLE), 6)
        |    AS dup_rate,
        |  round(CAST(p.n_short AS DOUBLE) / CAST(p.n_docs AS DOUBLE), 6) AS short_frac
        |FROM per_source p JOIN top_lang t USING (source)""".stripMargin) { (s, d) =>
      val base = Tables.documents(s, d)
        .select(col("source"), col("lang"), md5(col("text")).as("h"),
          graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("toks"))
      val perSource = base.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("h")).as("n_unique"),
          count(when(col("toks") < 50, 1)).as("n_short"))
      val wL = Window.partitionBy(col("source")).orderBy(col("c").desc, col("lang"))
      val topLang = base.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(wL)).filter(col("rn") === 1)
        .select(col("source"), col("lang").as("modal_lang"))
      perSource.join(topLang, Seq("source"))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          round(col("total_tokens").cast("double") / col("n_docs").cast("double"), 6)
            .as("mean_tokens"),
          col("n_langs"), col("modal_lang"),
          round(lit(1.0) - col("n_unique").cast("double") / col("n_docs").cast("double"), 6)
            .as("dup_rate"),
          round(col("n_short").cast("double") / col("n_docs").cast("double"), 6)
            .as("short_frac"))
    }
  )
}
