package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions

/** Seventy-second frontier batch: matched-basket price index, padding
  * waste audit, caption-to-frame alignment.
  */
object Frontier72Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A132: Laspeyres matched-basket price index --------------------------
    // The econ-retail staple: price a FIXED base-period basket at each
    // month's prices — inflation with the mix effect removed. Per-part
    // unit prices are revenue/quantity rationals, floor-quantized once
    // per (part, month) at micro-cents (deterministic in both
    // engines); the index is the ratio of two basket sums in permille.
    // Only parts traded in BOTH months enter (matched basket). One
    // part-month aggregate, a self-join on the base month, crumbs.
    QueryDef.sql(
      "a132_price_index",
      """WITH pm AS (
        |  SELECT l_partkey, CAST(strftime(CAST(l_shipdate AS DATE), '%Y-%m')
        |      AS VARCHAR) AS ym,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS e_cents,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |base AS (SELECT min(ym) AS ym0 FROM pm),
        |b AS (
        |  SELECT pm.l_partkey, pm.e_cents AS e0, pm.q AS q0
        |  FROM pm, base WHERE pm.ym = base.ym0),
        |t AS (
        |  SELECT pm.ym, pm.l_partkey,
        |    CAST((CAST(pm.e_cents AS HUGEINT) * b.q0 * 1000000) // pm.q AS BIGINT)
        |      AS cur_micro,
        |    CAST((CAST(b.e0 AS HUGEINT) * b.q0 * 1000000) // b.q0 AS BIGINT)
        |      AS base_micro
        |  FROM pm JOIN b USING (l_partkey))
        |SELECT ym, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(CAST(sum(CAST(cur_micro AS HUGEINT)) AS HUGEINT) * 1000
        |    // sum(CAST(base_micro AS HUGEINT)) AS BIGINT) AS index_permille
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val pm = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"),
          date_format(col("l_shipdate").cast("date"), "yyyy-MM").as("ym"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).cast("long")
          .as("e_cents"),
          sum(col("l_quantity").cast("long")).cast("long").as("q"))
        .localCheckpoint(true) // base basket and monthly pricing share the pass
      val base = pm.agg(min(col("ym")).as("ym0"))
      val b = pm.crossJoin(broadcast(base)).filter(col("ym") === col("ym0"))
        .select(col("l_partkey"), col("e_cents").as("e0"), col("q").as("q0"))
      val t = pm.join(broadcast(b), "l_partkey")
        .select(col("ym"), col("l_partkey"),
          expr("cast((cast(e_cents as decimal(38,0)) * q0 * 1000000) div q as bigint)")
            .as("cur_micro"),
          expr("cast((cast(e0 as decimal(38,0)) * q0 * 1000000) div q0 as bigint)")
            .as("base_micro"))
      t.groupBy(col("ym"))
        .agg(count(lit(1)).as("n_parts"),
          expr("cast(sum(cast(cur_micro as decimal(38,0))) * 1000 " +
            "div sum(cast(base_micro as decimal(38,0))) as bigint)")
            .as("index_permille"))
        .orderBy(col("ym"))
    },

    // ---- C48: padding-waste batching audit -----------------------------------
    // The LLM-training efficiency lever: batches pad to their longest
    // member, so arrival-order batching burns compute on padding while
    // length-sorted batching doesn't. Both strategies batch 8 docs;
    // ranks come from ShardedRank (no single-partition window); waste
    // = Σ_batch (8·max − Σlen) in tokens, exact. The A/B lands in one
    // result row per strategy — the number that justifies a bucketed
    // sampler.
    QueryDef.sql(
      "c48_padding_waste",
      """WITH d AS (
        |  SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '\S+'))
        |    AS BIGINT) AS toks
        |  FROM documents),
        |arrival AS (
        |  SELECT 'arrival' AS strategy,
        |    (row_number() OVER (ORDER BY doc_id) - 1) // 8 AS batch, toks
        |  FROM d),
        |sorted_b AS (
        |  SELECT 'sorted' AS strategy,
        |    (row_number() OVER (ORDER BY toks, doc_id) - 1) // 8 AS batch, toks
        |  FROM d),
        |batches AS (
        |  SELECT strategy, batch, CAST(count(*) AS BIGINT) AS n,
        |    CAST(max(toks) AS BIGINT) AS mx, CAST(sum(toks) AS BIGINT) AS tot
        |  FROM (SELECT * FROM arrival UNION ALL SELECT * FROM sorted_b)
        |  GROUP BY 1, 2)
        |SELECT strategy, CAST(count(*) AS BIGINT) AS n_batches,
        |  CAST(sum(tot) AS BIGINT) AS total_tokens,
        |  CAST(sum(n * mx - tot) AS BIGINT) AS padding_waste,
        |  CAST(sum(n * mx - tot) * 1000 // sum(n * mx) AS BIGINT)
        |    AS waste_permille
        |FROM batches GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import graft.operators.ShardedRank
      val dd = Tables.documents(s, d).select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("toks"))
        .localCheckpoint(true) // both strategies rank the same lengths
      val arrival = ShardedRank.withRank(dd, "rk", col("doc_id"))
        .select(lit("arrival").as("strategy"),
          expr("(rk - 1) div 8").as("batch"), col("toks"))
      val sortedB = ShardedRank.withRank(dd, "rk", col("toks"), col("doc_id"))
        .select(lit("sorted").as("strategy"),
          expr("(rk - 1) div 8").as("batch"), col("toks"))
      arrival.unionByName(sortedB)
        .groupBy(col("strategy"), col("batch"))
        .agg(count(lit(1)).as("n"), max(col("toks")).as("mx"),
          sum(col("toks")).cast("long").as("tot"))
        .groupBy(col("strategy"))
        .agg(count(lit(1)).as("n_batches"), sum(col("tot")).cast("long")
          .as("total_tokens"),
          sum(col("n") * col("mx") - col("tot")).cast("long").as("padding_waste"),
          expr("cast(sum(n * mx - tot) * 1000 div sum(n * mx) as bigint)")
            .as("waste_permille"))
        .orderBy(col("strategy"))
    },

    // ---- M11: caption-to-frame alignment -------------------------------------
    // The multimodal glue op: map each 16-token caption chunk of an
    // audio asset onto its proportional span of the frame timeline
    // (the arithmetic shape of forced alignment — chunk k of K covers
    // frames ⌊k·F/K⌋ .. ⌊(k+1)·F/K⌋−1, exactly partitioning the frame
    // grid). All integer; one generator per asset, no shuffle beyond
    // the output sort.
    QueryDef.sql(
      "m11_caption_align",
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    len(regexp_extract_all(lower(text), '\S+')) AS toks,
        |    (len(printf('W:%d;H:%d;F:%d;',
        |      CAST(doc_id % 64 + 16 AS BIGINT),
        |      CAST((doc_id * 7) % 64 + 16 AS BIGINT),
        |      CAST(doc_id % 10 + 1 AS BIGINT)) || substring(text, 1, 128)) -
        |     len(printf('W:%d;H:%d;F:%d;',
        |      CAST(doc_id % 64 + 16 AS BIGINT),
        |      CAST((doc_id * 7) % 64 + 16 AS BIGINT),
        |      CAST(doc_id % 10 + 1 AS BIGINT)))) AS plen
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT asset_id, toks, (plen - 32) // 16 + 1 AS nf,
        |    (toks + 15) // 16 AS nk
        |  FROM a WHERE plen >= 32 AND toks >= 1),
        |ch AS (
        |  SELECT asset_id, toks, nf, nk, unnest(generate_series(0, nk - 1)) AS k
        |  FROM f)
        |SELECT asset_id, CAST(k AS INT) AS chunk_idx,
        |  CAST(least(16, toks - k * 16) AS BIGINT) AS n_tokens,
        |  CAST((k * nf) // nk AS INT) AS start_frame,
        |  CAST(((k + 1) * nf) // nk - 1 AS INT) AS end_frame
        |FROM ch ORDER BY asset_id, chunk_idx""".stripMargin) { (s, d) =>
      val a = graft.multimodal.Multimodal.syntheticAssets(Tables.documents(s, d))
        .filter(col("media_type") === "audio")
        .join(Tables.documents(s, d).select(col("doc_id").as("asset_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("toks")), "asset_id")
        .select(col("asset_id"), col("toks"),
          expr("""length(regexp_replace(cast(media as string),
                '^W:[0-9]+;H:[0-9]+;F:[0-9]+;', ''))""").cast("long").as("plen"))
      val f = a.filter(col("plen") >= 32 && col("toks") >= 1)
        .select(col("asset_id"), col("toks"),
          expr("(plen - 32) div 16 + 1").as("nf"),
          expr("(toks + 15) div 16").as("nk"))
      f.select(col("asset_id"), col("toks"), col("nf"), col("nk"),
          explode(expr("sequence(0, cast(nk - 1 as int))")).as("k"))
        .select(col("asset_id"), col("k").cast("int").as("chunk_idx"),
          least(lit(16L), col("toks") - col("k") * 16).cast("long").as("n_tokens"),
          expr("cast((k * nf) div nk as int)").as("start_frame"),
          expr("cast(((k + 1) * nf) div nk - 1 as int)").as("end_frame"))
        .orderBy(col("asset_id"), col("chunk_idx"))
    }
  )
}
