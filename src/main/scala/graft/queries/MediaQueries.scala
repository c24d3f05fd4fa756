package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal pipeline surface: binary media columns + typed meta over
  * the synthetic asset table derived from `documents`. Decode and
  * frame-sampling cross the partition boundary (rows-only checks);
  * meta-only transforms stay SQL-expressible and get DuckDB oracles.
  */
object MediaQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- decode pass (mapPartitions batch plumbing; stub codec) -------
    // The stub codec reads the deterministic "W:w;H:h;F:f;" header the
    // synthetic assets embed, so the decoded meta IS SQL-derivable —
    // a real oracle checks the whole mapPartitions round trip.
    QueryDef.sql(
      "m1_media_decode",
      """SELECT doc_id AS asset_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'video'
        |       WHEN 1 THEN 'image' ELSE 'audio' END AS media_type,
        |  CAST(doc_id % 64 + 16 AS INTEGER) AS decoded_width,
        |  CAST((doc_id * 7) % 64 + 16 AS INTEGER) AS decoded_height,
        |  TRUE AS decode_ok
        |FROM documents""".stripMargin) { (s, d) =>
      Multimodal.withDecodedMeta(Multimodal.syntheticAssets(Tables.documents(s, d)))
        .select(col("asset_id"), col("media_type"),
          col("decoded_width"), col("decoded_height"), col("decode_ok"))
    },

    // ---- meta-only resize (pure Column algebra; exact oracle) ---------
    QueryDef.sql(
      "m2_media_resize",
      """WITH assets AS (
        |  SELECT doc_id AS asset_id,
        |    CAST(doc_id % 64 + 16 AS INT) AS w,
        |    CAST((doc_id * 7) % 64 + 16 AS INT) AS h
        |  FROM documents)
        |SELECT asset_id,
        |  CAST(floor(w * least(1.0, CAST(32 AS DOUBLE) / greatest(w, h))) AS INT) AS resized_width,
        |  CAST(floor(h * least(1.0, CAST(32 AS DOUBLE) / greatest(w, h))) AS INT) AS resized_height
        |FROM assets""".stripMargin) { (s, d) =>
      Multimodal.resize(Multimodal.syntheticAssets(Tables.documents(s, d)), maxDim = 32)
        .select(col("asset_id"), col("resized_width"), col("resized_height"))
    },

    // ---- video frame sampling (generator shape over binary) -----------
    // n_frames = doc_id % 10 + 1 and frames step by 2 from 0, so the
    // flatMap generator twins a lateral generate_series
    QueryDef.sql(
      "m3_frame_sample",
      """WITH g AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, CAST(doc_id % 10 AS BIGINT), 2)) AS gs
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id AS asset_id, CAST(gs AS INTEGER) AS frame_idx,
        |  CAST(doc_id % 64 + 16 AS INTEGER) AS width,
        |  CAST((doc_id * 7) % 64 + 16 AS INTEGER) AS height
        |FROM g""".stripMargin) { (s, d) =>
      val assets = Multimodal.syntheticAssets(Tables.documents(s, d))
      Multimodal.sampleFrames(assets.filter(col("media_type") === "video"), everyN = 2)
    },

    // ---- codegen'd featurization of binary payloads -------------------
    // Per-dim scalar columns (f0..f7) rather than one array<double>
    // (scalars sort/prune; ndarray cells don't). The registered query
    // uses the fingerprint featurizer so every dim has a DuckDB twin
    // (t4's fold) — the xxhash64 fast path stays spec-checked.
    QueryDef.sql(
      "m4_media_features", {
        val fp = (expr: String) =>
          s"""CAST(list_reduce(
             |    list_prepend(CAST(0 AS BIGINT),
             |      list_transform(string_split_regex($expr, ''),
             |        c -> CAST(ascii(c) AS BIGINT))),
             |    (acc, x) -> (acc * 31 + x) % 1000000007) AS DOUBLE) / 1000000007.0""".stripMargin
        val dims = (0 until 8).map(i => s"  ${fp(s"m || '$i'")} AS f$i").mkString(",\n")
        s"""WITH a AS (
           |  SELECT doc_id AS asset_id,
           |    printf('W:%d;H:%d;F:%d;',
           |      CAST(doc_id % 64 + 16 AS BIGINT),
           |      CAST((doc_id * 7) % 64 + 16 AS BIGINT),
           |      CAST(doc_id % 10 + 1 AS BIGINT)) || substring(text, 1, 128) AS m
           |  FROM documents)
           |SELECT asset_id,
           |$dims
           |FROM a""".stripMargin
      }) { (s, d) =>
      val dimCols = (0 until 8).map(i =>
        Multimodal.fingerprintFeature(col("media"), i).as(s"f$i"))
      Multimodal.syntheticAssets(Tables.documents(s, d))
        .select(col("asset_id") +: dimCols: _*)
    },

    // ---- windowed audio features (frame/hop analysis) -----------------
    // RMS energy, zero-crossing rate, and peak per 32-sample window at
    // hop 16 over the audio payload byte stream — the frame grid every
    // audio featurizer runs. The whole pass is generator + codegen
    // folds on the scan (no shuffle); the stub "samples" are ascii
    // codes of the payload, so the grid, slices, and fold arithmetic
    // all have exact DuckDB twins.
    QueryDef.sql(
      "m5_audio_windows",
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
        |s AS (
        |  SELECT asset_id, CAST(widx AS INT) AS widx,
        |    codes[widx * 16 + 1 : widx * 16 + 32] AS wc
        |  FROM w)
        |SELECT asset_id, widx,
        |  round(sqrt(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(wc, x -> CAST(x AS BIGINT) * x)), (a, b) -> a + b)
        |    AS DOUBLE) / 32), 6) AS rms,
        |  CAST(list_reduce(list_prepend(0, list_transform(range(1, 32),
        |      i -> CASE WHEN (wc[i] >= 128) <> (wc[i + 1] >= 128)
        |                THEN 1 ELSE 0 END)), (a, b) -> a + b) AS INT) AS zc,
        |  CAST(list_reduce(wc, (a, b) -> greatest(a, b)) AS INT) AS peak
        |FROM s""".stripMargin) { (s, d) =>
      Multimodal.audioWindows(
        Multimodal.syntheticAssets(Tables.documents(s, d))
          .filter(col("media_type") === "audio"))
    },

    // ---- perceptual-hash image dedup (aHash over decoded pixels) ------
    // The image-side near-dup signal: 62-bit mean-threshold hash per
    // asset plus the size of its exact-hash bucket (the blocking key a
    // hamming-band pass would join on). Division-free threshold and
    // MSB-first integer pack give the hash an exact DuckDB twin; the
    // bucket count is a window over the phash partition key (scales —
    // never a global window).
    QueryDef.sql(
      "m6_phash_dedup",
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    printf('W:%d;H:%d;F:%d;',
        |      CAST(doc_id % 64 + 16 AS BIGINT),
        |      CAST((doc_id * 7) % 64 + 16 AS BIGINT),
        |      CAST(doc_id % 10 + 1 AS BIGINT)) || substring(text, 1, 128) AS m
        |  FROM documents WHERE doc_id % 3 = 1),
        |c AS (
        |  SELECT asset_id,
        |    list_transform(string_split_regex(
        |      regexp_replace(m, '^W:[0-9]+;H:[0-9]+;F:[0-9]+;', ''), ''),
        |      ch -> CAST(ascii(ch) AS BIGINT))[1:62] AS cs
        |  FROM a),
        |s AS (
        |  SELECT asset_id, cs, CAST(len(cs) AS BIGINT) AS n,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), cs), (a, b) -> a + b) AS sm
        |  FROM c),
        |h AS (
        |  SELECT asset_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(cs, x -> CASE WHEN x * n > sm
        |        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
        |      (a, b) -> a * 2 + b) AS phash
        |  FROM s)
        |SELECT asset_id, phash,
        |  CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS n_same
        |FROM h""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val assets = Multimodal.syntheticAssets(Tables.documents(s, d))
        .filter(col("media_type") === "image")
      Multimodal.withPerceptualHash(assets)
        .select(col("asset_id"), col("phash"),
          count(lit(1)).over(Window.partitionBy(col("phash")))
            .cast("long").as("n_same"))
    },

    // ---- scene-change detection (frame-diff cuts) ---------------------
    // Per video asset: for every consecutive 16-sample frame pair, the
    // integer sum of absolute sample differences, flagged as a cut
    // above a fixed threshold. All-integer per-row algebra → exact
    // DuckDB twin; the codec boundary is the same honest stub as
    // m1–m6.
    QueryDef.sql(
      "m7_scene_change",
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    printf('W:%d;H:%d;F:%d;',
        |      CAST(doc_id % 64 + 16 AS BIGINT),
        |      CAST((doc_id * 7) % 64 + 16 AS BIGINT),
        |      CAST(doc_id % 10 + 1 AS BIGINT)) || substring(text, 1, 128) AS m
        |  FROM documents WHERE doc_id % 3 = 0),
        |c AS (
        |  SELECT asset_id,
        |    list_transform(string_split_regex(
        |      regexp_replace(m, '^W:[0-9]+;H:[0-9]+;F:[0-9]+;', ''), ''),
        |      ch -> CAST(ascii(ch) AS BIGINT)) AS cs
        |  FROM a),
        |n AS (SELECT asset_id, cs, len(cs) // 16 AS nf FROM c),
        |b AS (
        |  SELECT asset_id, cs, unnest(range(1, nf)) AS b
        |  FROM n WHERE nf >= 2),
        |d AS (
        |  SELECT asset_id, CAST(b AS INTEGER) AS boundary,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(0, 16),
        |        j -> abs(cs[CAST((b - 1) * 16 + j + 1 AS INTEGER)]
        |               - cs[CAST(b * 16 + j + 1 AS INTEGER)]))),
        |      (x, y) -> x + y) AS diff
        |  FROM b)
        |SELECT asset_id, boundary, diff, (diff > 512) AS is_cut
        |FROM d""".stripMargin) { (s, d) =>
      Multimodal.sceneChanges(
        Multimodal.syntheticAssets(Tables.documents(s, d))
          .filter(col("media_type") === "video"))
    }
  )
}
