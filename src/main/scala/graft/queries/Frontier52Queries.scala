package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Fifty-second frontier batch: perceptual-hash near-dup join, journey
  * edit-distance scoring, CUBE multi-level aggregation.
  */
object Frontier52Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- M8: perceptual-hash near-duplicate media join ----------------------
    // The image-dedup canon (aHash): threshold each "pixel" against the
    // asset mean → a 48-bit signature → LSH over 4×12-bit bands →
    // verify candidates by Hamming distance (bit_count of xor). The
    // mean test is exact (48·code ≥ Σcodes — no division); the stub
    // codec's byte stream is the ascii codes of the payload (m5's
    // discipline), so the whole hash is SQL-derivable and the join is
    // ORACLE-CHECKED — rare for a perceptual pipeline. Scale shape:
    // signatures are one map-side fold (no shuffle); candidates are
    // band-bucket-bounded (never all-pairs); verify is bitwise algebra.
    QueryDef.sql(
      "m8_phash_neardup",
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    printf('W:%d;H:%d;F:%d;',
        |      CAST(doc_id % 64 + 16 AS BIGINT),
        |      CAST((doc_id * 7) % 64 + 16 AS BIGINT),
        |      CAST(doc_id % 10 + 1 AS BIGINT)) || substring(text, 1, 128) AS m
        |  FROM documents),
        |c AS (
        |  SELECT asset_id,
        |    list_transform(string_split_regex(
        |      regexp_replace(m, '^W:[0-9]+;H:[0-9]+;F:[0-9]+;', ''), ''),
        |      ch -> ascii(ch)) AS codes
        |  FROM a),
        |s AS (
        |  SELECT asset_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 49),
        |        i -> CASE WHEN CAST(codes[i] AS BIGINT) * 48 >=
        |            list_reduce(list_prepend(CAST(0 AS BIGINT),
        |              list_transform(codes[1:48], x -> CAST(x AS BIGINT))),
        |              (p, q) -> p + q)
        |          THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE CAST(0 AS BIGINT) END)),
        |      (p, q) -> p + q) AS sig
        |  FROM c WHERE len(codes) >= 48),
        |bands AS (
        |  SELECT asset_id, sig, unnest(generate_series(0, 3)) AS k
        |  FROM s),
        |cand AS (
        |  SELECT DISTINCT a.asset_id AS id_a, b.asset_id AS id_b,
        |    a.sig AS sig_a, b.sig AS sig_b
        |  FROM bands a JOIN bands b
        |    ON a.k = b.k
        |    AND (a.sig >> CAST(a.k * 12 AS INT)) & 4095
        |      = (b.sig >> CAST(b.k * 12 AS INT)) & 4095
        |    AND a.asset_id < b.asset_id)
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
        |FROM cand
        |WHERE bit_count(xor(sig_a, sig_b)) <= 6
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val codes = Multimodal.syntheticAssets(Tables.documents(s, d))
        .select(col("asset_id"),
          expr("transform(split(regexp_replace(cast(media as string), '^W:[0-9]+;H:[0-9]+;F:[0-9]+;', ''), ''), ch -> ascii(ch))")
            .as("codes0"))
        // split('') emits a trailing "" whose ascii is 0 — harmless
        // beyond position 48, which is all the signature reads
        .filter(expr("size(filter(codes0, x -> x > 0)) >= 48"))
        .select(col("asset_id"), expr("slice(codes0, 1, 48)").as("codes"))
        .withColumn("total",
          expr("aggregate(codes, cast(0 as bigint), (p, q) -> p + cast(q as bigint))"))
      // localCheckpoint: Catalyst inlines the codes/total projections
      // into the fold, re-evaluating the 128-char split PER BIT (the
      // element_at-in-transform O(n²) trap) — and the self-join would
      // pay it on both sides. The signature table is tiny; pin it.
      val sigs = codes.select(col("asset_id"),
        expr("""aggregate(transform(sequence(1, 48),
            i -> IF(cast(element_at(codes, i) as bigint) * 48 >= total,
                    shiftleft(cast(1 as bigint), i - 1), cast(0 as bigint))),
          cast(0 as bigint), (p, q) -> p + q)""").as("sig"))
        .localCheckpoint(true)
      val bands = sigs.select(col("asset_id"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("k"))
        .withColumn("band", expr("shiftright(sig, cast(k * 12 as int)) & 4095"))
      val a = bands.select(col("k"), col("band"), col("asset_id").as("id_a"), col("sig").as("sig_a"))
      val b = bands.select(col("k"), col("band"), col("asset_id").as("id_b"), col("sig").as("sig_b"))
      // verify BEFORE dedup: the popcount filter is a per-row function of
      // the candidate, so filter∘distinct ≡ distinct∘filter — but the
      // cheap bitwise test shrinks the distinct's shuffle by ~100×
      val cand = a.join(b, Seq("k", "band")).filter(col("id_a") < col("id_b"))
        .withColumn("hamming", expr("cast(bit_count(sig_a ^ sig_b) as int)"))
        .filter(col("hamming") <= 6)
      cand.select(col("id_a"), col("id_b"), col("hamming")).distinct()
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- EV70: journey deviation (edit distance to a canonical path) --------
    // UX analytics: how far does each user's event journey stray from
    // the designed funnel? Journeys become initial-letter strings in
    // strict (ts, event_id) order; deviation = levenshtein against the
    // canonical "s vcvcvc…p" path (Spark and DuckDB implement identical
    // Wagner–Fischer costs — pinned by earlier fuzzy-join batches). The
    // report buckets users by distance-per-event permille bands. Scale:
    // one user-grain sort_array aggregate, then row-wise column algebra
    // against a LITERAL — no pair join anywhere.
    QueryDef.sql(
      "ev70_journey_distance",
      """WITH j AS (
        |  SELECT user_id,
        |    string_agg(CASE event_type WHEN 'signup' THEN 's'
        |      WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |      WHEN 'purchase' THEN 'p' ELSE 'e' END, ''
        |      ORDER BY ts, event_id) AS journey
        |  FROM events GROUP BY 1),
        |d AS (
        |  SELECT user_id, length(journey) AS jlen,
        |    CAST(levenshtein(journey, 's' || repeat('vc', 10) || 'p') AS BIGINT)
        |      AS dist
        |  FROM j)
        |SELECT CAST((dist * 1000 // jlen) // 250 AS BIGINT) AS dev_band,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(min(dist) AS BIGINT) AS min_dist,
        |  CAST(max(dist) AS BIGINT) AS max_dist,
        |  CAST(sum(dist) AS BIGINT) AS sum_dist
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ini = when(col("event_type") === "signup", "s")
        .when(col("event_type") === "view", "v")
        .when(col("event_type") === "click", "c")
        .when(col("event_type") === "purchase", "p").otherwise("e")
      val j = Tables.events(s, d)
        .select(col("user_id"), struct(col("ts"), col("event_id"), ini.as("ini")).as("st"))
        .groupBy(col("user_id"))
        .agg(concat_ws("", transform(array_sort(collect_list(col("st"))),
          x => x.getField("ini"))).as("journey"))
      val canonical = "s" + "vc" * 10 + "p"
      val dd = j.select(col("user_id"), length(col("journey")).as("jlen"),
        levenshtein(col("journey"), lit(canonical)).cast("long").as("dist"))
      dd.groupBy(expr("(dist * 1000 div jlen) div 250").cast("long").as("dev_band"))
        .agg(count(lit(1)).as("n_users"), min(col("dist")).as("min_dist"),
          max(col("dist")).as("max_dist"), sum(col("dist")).cast("long").as("sum_dist"))
        .orderBy(col("dev_band"))
    },

    // ---- A111: CUBE multi-level aggregation ---------------------------------
    // The remaining member of the grouping-sets family (a5 covered
    // ROLLUP): one pass emits all four grouping combinations of
    // (returnflag, linestatus) via the Expand operator — the warehouse
    // answer to "N dashboard tiles, one scan". grouping_id()
    // disambiguates the NULL-as-total rows from genuine NULLs. Scale:
    // Expand multiplies rows ×4 BEFORE partial aggregation, so the
    // shuffle still carries only group cells, never raw rows.
    QueryDef.sql(
      "a111_cube_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_price_cents
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY 3, 1, 2""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("long")).cast("long").as("sum_qty"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).cast("long")
            .as("sum_price_cents"))
        .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
          col("n_rows"), col("sum_qty"), col("sum_price_cents"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    }
  )
}
