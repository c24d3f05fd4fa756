package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Thirty-eighth frontier batch: Venn bitmask segmentation, Haar
  * wavelet energy in exact integers, tamper-evident hash chains, and
  * cluster η² on the embedding space.
  */
object Frontier38Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A91: behavioral Venn segmentation via bitmask ---------------------
    // Which combinations of the five event types does each user
    // exhibit? The set-algebra answer (all 2⁵−1 Venn regions) without
    // 31 self-joins: fold each user's type set into ONE integer
    // bitmask (bit i = type i present), then a single groupBy over the
    // mask. This is the scale idiom for cohort set algebra — the whole
    // Venn diagram in two keyed aggregates. Region populations are
    // exact integers; the mask→names map is derived in both engines
    // from the same bit tests.
    QueryDef.sql(
      "a91_venn_bitmask",
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      + max(CASE WHEN event_type = 'error' THEN 2 ELSE 0 END)
        |      + max(CASE WHEN event_type = 'purchase' THEN 4 ELSE 0 END)
        |      + max(CASE WHEN event_type = 'signup' THEN 8 ELSE 0 END)
        |      + max(CASE WHEN event_type = 'view' THEN 16 ELSE 0 END) AS INT)
        |      AS mask
        |  FROM events GROUP BY 1)
        |SELECT mask,
        |  CAST(bit_count(mask) AS INT) AS n_types,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM u GROUP BY 1""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d).groupBy(col("user_id"))
        .agg((max(when(col("event_type") === "click", 1).otherwise(0))
          + max(when(col("event_type") === "error", 2).otherwise(0))
          + max(when(col("event_type") === "purchase", 4).otherwise(0))
          + max(when(col("event_type") === "signup", 8).otherwise(0))
          + max(when(col("event_type") === "view", 16).otherwise(0))).cast("int")
          .as("mask"))
      u.groupBy(col("mask"))
        .agg(count(lit(1)).as("n_users"))
        .select(col("mask"), bit_count(col("mask")).cast("int").as("n_types"),
          col("n_users"))
    },

    // ---- W13: Haar wavelet energy decomposition ----------------------------
    // Which time scale carries the revenue variance — daily noise,
    // weekly rhythm, or the month trend? Unnormalized Haar detail
    // coefficients need NO recursion: the level-k coefficient of block
    // b is (sum of first 2^(k−1) days) − (sum of last 2^(k−1) days),
    // so each level is one conditional aggregate keyed by day-index
    // arithmetic — five levels over a 32-slot padded calendar, all in
    // exact integer cents, energies floor-scaled to BIGINT at the end.
    // The classic O(n) pyramid becomes 5 parallel scans of a 30-row
    // day table.
    QueryDef.sql(
      "w13_haar_energy",
      """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        |daily AS (
        |  SELECT datediff('day', d0, CAST(ts AS DATE)) AS idx,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents
        |  FROM events CROSS JOIN d0 GROUP BY 1),
        |lv AS (SELECT * FROM (VALUES (1), (2), (3), (4), (5)) AS t(level)),
        |co AS (
        |  SELECT level, idx // (1 << level) AS block,
        |    CAST(sum(CASE WHEN (idx // (1 << (level - 1))) % 2 = 0
        |      THEN cents ELSE -cents END) AS BIGINT) AS coeff
        |  FROM daily CROSS JOIN lv GROUP BY 1, 2)
        |SELECT level, CAST(count(*) AS BIGINT) AS n_coeffs,
        |  CAST(CAST(sum(CAST(coeff AS DECIMAL(19,0)) * CAST(coeff AS DECIMAL(19,0)))
        |    AS HUGEINT) // 1000000 AS BIGINT) AS energy_m
        |FROM co GROUP BY 1""".stripMargin) { (s, d) =>
      val d0 = Tables.events(s, d).agg(min(col("ts").cast("date")).as("d0"))
      val daily = Tables.events(s, d).crossJoin(broadcast(d0))
        .groupBy(datediff(col("ts").cast("date"), col("d0")).as("idx"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("cents"))
      val lv = s.range(1, 6).select(col("id").cast("int").as("level"))
      val co = daily.crossJoin(broadcast(lv))
        .groupBy(col("level"), expr("idx div (1 << level)").as("block"))
        .agg(sum(when(expr("(idx div (1 << (level - 1))) % 2") === 0, col("cents"))
          .otherwise(-col("cents"))).as("coeff"))
      co.groupBy(col("level"))
        .agg(count(lit(1)).as("n_coeffs"),
          expr("CAST(sum(CAST(coeff AS DECIMAL(19,0)) * CAST(coeff AS DECIMAL(19,0))) div 1000000 AS BIGINT)")
            .as("energy_m"))
    },

    // ---- U34: append-only ledger hash chain --------------------------------
    // Tamper-evidence for event logs: per user, the position-dependent
    // chain H_n = md5(H_{n−1} ‖ event_id ‖ type) — any insertion,
    // deletion, or reorder changes the head. Unlike u22's ORDER-
    // INDEPENDENT lineage digests, the chain pins the sequence itself.
    // The sequential fold runs inside one per-user ordered array fold
    // (events per user are bounded); the corpus-level shape is one
    // keyed shuffle. Chain heads are hex strings — bit-exact across
    // engines.
    QueryDef.sql(
      "u34_hash_chain",
      """WITH seq AS (
        |  SELECT user_id,
        |    list(event_id || ':' || event_type ORDER BY ts, event_id) AS items
        |  FROM events GROUP BY 1)
        |SELECT user_id, CAST(len(items) AS BIGINT) AS chain_len,
        |  list_reduce(list_prepend('genesis', items),
        |    (acc, x) -> md5(acc || '|' || x)) AS chain_head
        |FROM seq""".stripMargin) { (s, d) =>
      val seq = Tables.events(s, d).groupBy(col("user_id"))
        .agg(transform(
          sort_array(collect_list(struct(col("ts"), col("event_id"),
            concat_ws(":", col("event_id"), col("event_type")).as("item")))),
          x => x.getField("item")).as("items"))
      seq.select(col("user_id"), size(col("items")).cast("long").as("chain_len"),
        aggregate(col("items"), lit("genesis"),
          (acc, x) => md5(concat(acc, lit("|"), x))).as("chain_head"))
    },

    // ---- V28: cluster η² (variance explained by labels) --------------------
    // How much of the embedding variance do the labels explain? The
    // multivariate ANOVA ratio η² = SSB/SST summed over dimensions —
    // the one-number answer to "are these labels geometric clusters or
    // arbitrary tags". Quantized integer moments per (label, dim) and
    // per dim (the v15/v27 discipline), each dimension's contribution
    // a fixed-order double from exact BIGINTs, folded in dim order
    // (a41), ONE division at the end. Two partial-agg shuffles over
    // the (label·dim)-bounded grain.
    QueryDef.sql(
      "v28_cluster_eta2",
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
        |  FROM embeddings),
        |dims AS (
        |  SELECT label, unnest(range(1, len(q) + 1)) AS dim, unnest(q) AS qv
        |  FROM e),
        |cd AS (
        |  SELECT label, dim, CAST(count(*) AS BIGINT) AS n_c,
        |    CAST(sum(qv) AS BIGINT) AS s_c
        |  FROM dims GROUP BY 1, 2),
        |gd AS (
        |  SELECT dim, CAST(sum(n_c) AS BIGINT) AS n, CAST(sum(s_c) AS BIGINT) AS s,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)
        |        ORDER BY label)), (a, b) -> a + b) AS sb_term
        |  FROM cd GROUP BY dim),
        |qd AS (
        |  SELECT dim,
        |    CAST(sum(CAST(qv AS DECIMAL(19,0)) * CAST(qv AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS q2
        |  FROM dims GROUP BY 1),
        |terms AS (
        |  SELECT gd.dim,
        |    sb_term - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |      AS ssb_d,
        |    CAST(q2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS sst_d
        |  FROM gd JOIN qd ON gd.dim = qd.dim),
        |fin AS (
        |  SELECT
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(ssb_d ORDER BY dim)),
        |      (a, b) -> a + b) AS ssb,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(sst_d ORDER BY dim)),
        |      (a, b) -> a + b) AS sst,
        |    CAST(count(*) AS BIGINT) AS n_dims
        |  FROM terms)
        |SELECT n_dims, round(ssb / 1e12, 6) AS ssb_units,
        |  round(sst / 1e12, 6) AS sst_units,
        |  round(ssb / sst, 6) AS eta2
        |FROM fin""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 1000000).cast("long")).as("q"))
      val dims = e.select(col("label"), posexplode(col("q")).as(Seq("pos", "qv")))
        .select(col("label"), (col("pos") + 1).as("dim"), col("qv"))
      val cd = dims.groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n_c"), sum(col("qv")).as("s_c"))
      val gd = cd.groupBy(col("dim"))
        .agg(sum(col("n_c")).as("n"), sum(col("s_c")).as("s"),
          aggregate(transform(sort_array(collect_list(struct(col("label"),
            (col("s_c").cast("double") * col("s_c").cast("double")
              / col("n_c").cast("double")).as("t")))),
            x => x.getField("t")), lit(0.0), (a, b) => a + b).as("sb_term"))
      val qd = dims.groupBy(col("dim"))
        .agg(sum(col("qv").cast(DecimalType(19, 0)) * col("qv").cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0)).as("q2"))
      val gg = col("s").cast("double") * col("s").cast("double") / col("n").cast("double")
      val terms = gd.join(qd, "dim")
        .select(col("dim"), (col("sb_term") - gg).as("ssb_d"),
          (col("q2").cast("double") - gg).as("sst_d"))
      val fin = terms.agg(
        aggregate(transform(sort_array(collect_list(struct(col("dim"),
          col("ssb_d").as("v")))), x => x.getField("v")), lit(0.0), (a, b) => a + b)
          .as("ssb"),
        aggregate(transform(sort_array(collect_list(struct(col("dim"),
          col("sst_d").as("v")))), x => x.getField("v")), lit(0.0), (a, b) => a + b)
          .as("sst"),
        count(lit(1)).as("n_dims"))
      fin.select(col("n_dims"), round(col("ssb") / 1e12, 6).as("ssb_units"),
        round(col("sst") / 1e12, 6).as("sst_units"),
        round(col("ssb") / col("sst"), 6).as("eta2"))
    }
  )
}
