package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Fifty-eighth frontier batch: exact partial correlation, video
  * scene-cut detection, content-addressable dataset fingerprints.
  */
object Frontier58Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A118: partial correlation, exact -----------------------------------
    // "Do purchases track clicks once you CONTROL for views?" — the
    // confounder-adjusted correlation r_xy·z = (r_xy − r_xz·r_yz) /
    // √((1−r²_xz)(1−r²_yz)). Substituting each r with its integer
    // moment form C/√(V·V) collapses the whole expression to
    // (C_xy·V_z − C_xz·C_yz) / √((V_x V_z − C²_xz)(V_y V_z − C²_yz)) —
    // so the a104 signed-square trick lands it in pure integers:
    // sign·num²·10⁶ div (d1·d2). Day grain bounds every product inside
    // DECIMAL(38,0)/HUGEINT. One day aggregate, one 30-row crumb.
    QueryDef.sql(
      "a118_partial_correlation",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS HUGEINT) AS x,
        |    CAST(count(*) FILTER (WHERE event_type = 'click') AS HUGEINT) AS y,
        |    CAST(count(*) FILTER (WHERE event_type = 'view') AS HUGEINT) AS z
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
        |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(z * z) AS szz,
        |    sum(x * y) AS sxy, sum(x * z) AS sxz, sum(y * z) AS syz
        |  FROM daily),
        |c AS (
        |  SELECT CAST(n AS BIGINT) AS n_days,
        |    n * sxy - sx * sy AS cxy, n * sxz - sx * sz AS cxz,
        |    n * syz - sy * sz AS cyz,
        |    n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy,
        |    n * szz - sz * sz AS vz
        |  FROM m),
        |p AS (
        |  SELECT n_days,
        |    cxy * vz - cxz * cyz AS num,
        |    vx * vz - cxz * cxz AS d1, vy * vz - cyz * cyz AS d2,
        |    cxy, cxz, cyz, vx, vy, vz
        |  FROM c)
        |SELECT n_days,
        |  CAST(CASE WHEN vx > 0 AND vy > 0 AND vz > 0 THEN
        |    (CASE WHEN cxy >= 0 THEN 1 ELSE -1 END)
        |    * ((cxy * cxy * 1000000) // (vx * vy)) END AS BIGINT)
        |    AS r2_xy_micro,
        |  CAST(CASE WHEN d1 > 0 AND d2 > 0 THEN
        |    (CASE WHEN num >= 0 THEN 1 ELSE -1 END)
        |    * ((num * num * 1000000) // (d1 * d2)) END AS BIGINT)
        |    AS r2_xy_given_z_micro
        |FROM p""".stripMargin) { (s, d) =>
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
            floor(col("value") * 100).cast("long")).otherwise(0L)).cast(dec).as("x"),
          count(when(col("event_type") === "click", 1)).cast(dec).as("y"),
          count(when(col("event_type") === "view", 1)).cast(dec).as("z"))
      val m = daily.agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
        sum(col("z") * col("z")).as("szz"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("z")).as("sxz"),
        sum(col("y") * col("z")).as("syz"))
      val c = m.select(col("n").cast("long").as("n_days"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("cxy"),
        (col("n") * col("sxz") - col("sx") * col("sz")).as("cxz"),
        (col("n") * col("syz") - col("sy") * col("sz")).as("cyz"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("vx"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("vy"),
        (col("n") * col("szz") - col("sz") * col("sz")).as("vz"))
      val p = c.select(col("n_days"),
        (col("cxy") * col("vz") - col("cxz") * col("cyz")).as("num"),
        (col("vx") * col("vz") - col("cxz") * col("cxz")).as("d1"),
        (col("vy") * col("vz") - col("cyz") * col("cyz")).as("d2"),
        col("cxy"), col("vx"), col("vy"), col("vz"))
      p.select(col("n_days"),
        when(col("vx") > 0 && col("vy") > 0 && col("vz") > 0,
          when(col("cxy") >= 0, 1).otherwise(-1)
            * expr("(cxy * cxy * 1000000) div (vx * vy)")).cast("long")
          .as("r2_xy_micro"),
        when(col("d1") > 0 && col("d2") > 0,
          when(col("num") >= 0, 1).otherwise(-1)
            * expr("(num * num * 1000000) div (d1 * d2)")).cast("long")
          .as("r2_xy_given_z_micro"))
    },

    // ---- M9: video scene-cut detection --------------------------------------
    // The standard frame-pipeline op after sampling (m3): a per-frame
    // feature, consecutive-frame deltas, and a cut wherever the delta
    // clears a threshold. The stub codec makes the per-frame feature a
    // portable fold (payload rolling hash mixed MULTIPLICATIVELY with
    // the frame index, mod 1000 — additive suffix mixing left
    // consecutive deltas degenerate), so the WHOLE pipeline — grid,
    // features, sequential deltas — is oracle-checked. Scale: the frame
    // grid is a generator (no shuffle); deltas ride one asset window.
    QueryDef.sql(
      "m9_scene_cuts",
      """WITH g AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, CAST(doc_id % 10 AS BIGINT), 2)) AS fi,
        |    printf('W:%d;H:%d;F:%d;',
        |      CAST(doc_id % 64 + 16 AS BIGINT),
        |      CAST((doc_id * 7) % 64 + 16 AS BIGINT),
        |      CAST(doc_id % 10 + 1 AS BIGINT)) || substring(text, 1, 128) AS m
        |  FROM documents WHERE doc_id % 3 = 0),
        |f AS (
        |  SELECT doc_id AS asset_id, CAST(fi AS INT) AS fidx,
        |    (list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split_regex(m, ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007)
        |     * (fi * 265443576 + 1)) % 1000000007 % 1000 AS sig
        |  FROM g),
        |dl AS (
        |  SELECT asset_id, fidx AS frame_idx, sig,
        |    lag(fidx) OVER w AS prev_idx,
        |    abs(sig - lag(sig) OVER w) AS delta
        |  FROM f WINDOW w AS (PARTITION BY asset_id ORDER BY fidx))
        |SELECT asset_id, frame_idx, prev_idx, CAST(delta AS BIGINT) AS delta
        |FROM dl WHERE delta > 400
        |ORDER BY asset_id, frame_idx""".stripMargin) { (s, d) =>
      import graft.functions.TextFunctions
      val assets = graft.multimodal.Multimodal.syntheticAssets(Tables.documents(s, d))
        .filter(col("media_type") === "video")
      val g = assets.select(col("asset_id"), col("media"),
        explode(expr("sequence(0, cast(asset_id % 10 as int), 2)")).as("frame_idx"))
      val f = g.select(col("asset_id"), col("frame_idx").cast("int").as("frame_idx"),
        ((TextFunctions.rollingFingerprint(col("media").cast("string"))
          * (col("frame_idx") * lit(265443576L) + 1)) % 1000000007L % 1000)
          .as("sig"))
      val w = Window.partitionBy(col("asset_id")).orderBy(col("frame_idx"))
      f.select(col("asset_id"), col("frame_idx"),
          lag(col("frame_idx"), 1).over(w).as("prev_idx"),
          abs(col("sig") - lag(col("sig"), 1).over(w)).as("delta"))
        .filter(col("delta") > 400)
        .select(col("asset_id"), col("frame_idx"), col("prev_idx"),
          col("delta").cast("long").as("delta"))
        .orderBy(col("asset_id"), col("frame_idx"))
    },

    // ---- C40: content-addressable dataset fingerprints ----------------------
    // Dataset versioning without moving data: an order-independent
    // corpus digest (Σ over docs of the first 60 md5 bits, mod p) per
    // source plus the corpus total — equal fingerprints ⇒ equal
    // content, on any engine, under any row order or partitioning.
    // This is the cheap equality check replication/migration pipelines
    // run before and after a copy. One aggregate; digests ship as
    // integers, never texts.
    QueryDef.sql(
      "c40_content_fingerprint",
      """WITH h AS (
        |  SELECT source,
        |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS hv
        |  FROM documents),
        |per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(CAST(sum(CAST(hv AS HUGEINT)) AS HUGEINT) % 1000000007
        |      AS BIGINT) AS fingerprint
        |  FROM h GROUP BY 1)
        |SELECT source, n_docs, fingerprint FROM per
        |UNION ALL
        |SELECT 'TOTAL', CAST(count(*) AS BIGINT),
        |  CAST(CAST(sum(CAST(hv AS HUGEINT)) AS HUGEINT) % 1000000007 AS BIGINT)
        |FROM h
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val h = Tables.documents(s, d).select(col("source"),
          conv(substring(md5(col("text")), 1, 15), 16, 10).cast("long").as("hv"))
        .localCheckpoint(true) // per-source and total read the same digests
      val per = h.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          pmod(sum(col("hv").cast(dec)), lit(1000000007L).cast(dec))
            .cast("long").as("fingerprint"))
      val tot = h.agg(count(lit(1)).as("n_docs"),
          pmod(sum(col("hv").cast(dec)), lit(1000000007L).cast(dec))
            .cast("long").as("fingerprint"))
        .select(lit("TOTAL").as("source"), col("n_docs"), col("fingerprint"))
      per.unionByName(tot).orderBy(col("source"))
    }
  )
}
