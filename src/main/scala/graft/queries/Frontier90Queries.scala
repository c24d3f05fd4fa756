package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Ninetieth frontier batch: shift-share decomposition, late-arriving
  * dimension reconciliation, curation filter waterfall.
  */
object Frontier90Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A147: shift-share growth decomposition -------------------------------
    // The regional economist's question: how much of each nation's
    // year-over-year revenue growth is the national tide, how much is
    // its SEGMENT MIX, and how much is genuine local competitiveness?
    // Classic shift-share: Δ_n = r₀ₙ·g + Σ_s r₀ₙₛ·(g_s−g) +
    // Σ_s r₀ₙₛ·(g_ns−g_s). Rates stay RATIONAL — each term multiplies
    // through to exact wide-integer products (HUGEINT / DECIMAL(38,0))
    // with one truncating division — and the honest residual column
    // carries what truncation cost, so the ledger still reconciles to
    // the exact actual delta.
    QueryDef.sql(
      "a147_shift_share",
      """WITH f AS (
        |  SELECT c.c_nationkey AS nk, c.c_mktsegment AS seg,
        |    CAST(year(CAST(o.o_orderdate AS DATE)) AS INT) AS yr,
        |    CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2, 3),
        |my AS (SELECT max(yr) AS y FROM f),
        |cell AS (
        |  SELECT nk, seg,
        |    CAST(sum(CASE WHEN yr = my.y - 2 THEN cents ELSE 0 END) AS BIGINT) AS r0,
        |    CAST(sum(CASE WHEN yr = my.y - 1 THEN cents ELSE 0 END) AS BIGINT) AS r1
        |  FROM f CROSS JOIN my GROUP BY 1, 2),
        |segt AS (SELECT seg, CAST(sum(r0) AS BIGINT) AS s0,
        |  CAST(sum(r1) AS BIGINT) AS s1 FROM cell GROUP BY 1),
        |tot AS (SELECT CAST(sum(r0) AS BIGINT) AS t0,
        |  CAST(sum(r1) AS BIGINT) AS t1 FROM cell),
        |terms AS (
        |  SELECT c.nk,
        |    CAST(sum(c.r1 - c.r0) AS BIGINT) AS delta,
        |    CAST(sum(CAST(c.r0 AS HUGEINT) * (t.t1 - t.t0) // t.t0) AS BIGINT)
        |      AS national,
        |    CAST(sum(CAST(c.r0 AS HUGEINT) *
        |      (CAST(s.s1 AS HUGEINT) * t.t0 - CAST(s.s0 AS HUGEINT) * t.t1)
        |      // (CAST(s.s0 AS HUGEINT) * t.t0)) AS BIGINT) AS mix,
        |    CAST(sum(CAST(c.r0 AS HUGEINT) *
        |      (CAST(c.r1 AS HUGEINT) * s.s0 - CAST(c.r0 AS HUGEINT) * s.s1)
        |      // (CAST(c.r0 AS HUGEINT) * s.s0)) AS BIGINT) AS competitive
        |  FROM cell c JOIN segt s ON s.seg = c.seg CROSS JOIN tot t
        |  WHERE c.r0 > 0 AND s.s0 > 0
        |  GROUP BY 1)
        |SELECT CAST(nk AS INT) AS nation, delta AS actual_delta_cents,
        |  national AS national_cents, mix AS mix_cents,
        |  competitive AS competitive_cents,
        |  CAST(delta - national - mix - competitive AS BIGINT) AS residual_cents
        |FROM terms ORDER BY 1""".stripMargin) { (s, d) =>
      val f = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
          year(col("o_orderdate").cast("date")).cast("int").as("yr"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).cast("long")
          .as("cents"))
      val my = f.agg(max(col("yr")).as("y"))
      val cell = f.crossJoin(broadcast(my))
        .groupBy(col("nk"), col("seg"))
        .agg(sum(when(col("yr") === col("y") - 2, col("cents")).otherwise(0L))
          .cast("long").as("r0"),
          sum(when(col("yr") === col("y") - 1, col("cents")).otherwise(0L))
            .cast("long").as("r1"))
        .localCheckpoint(true) // segment totals, grand totals, terms read it
      val segt = cell.groupBy(col("seg"))
        .agg(sum(col("r0")).cast("long").as("s0"), sum(col("r1")).cast("long").as("s1"))
      val tot = cell.agg(sum(col("r0")).cast("long").as("t0"),
        sum(col("r1")).cast("long").as("t1"))
      cell.join(broadcast(segt), "seg").crossJoin(broadcast(tot))
        .filter(col("r0") > 0 && col("s0") > 0)
        .groupBy(col("nk"))
        .agg(sum(col("r1") - col("r0")).cast("long").as("delta"),
          sum(expr("cast(r0 as decimal(38,0)) * (t1 - t0) div t0")).cast("long")
            .as("national"),
          sum(expr("""cast(r0 as decimal(38,0)) *
            (cast(s1 as decimal(38,0)) * t0 - cast(s0 as decimal(38,0)) * t1)
            div (cast(s0 as decimal(38,0)) * t0)""")).cast("long").as("mix"),
          sum(expr("""cast(r0 as decimal(38,0)) *
            (cast(r1 as decimal(38,0)) * s0 - cast(r0 as decimal(38,0)) * s1)
            div (cast(r0 as decimal(38,0)) * s0)""")).cast("long").as("competitive"))
        .select(col("nk").cast("int").as("nation"),
          col("delta").as("actual_delta_cents"),
          col("national").as("national_cents"), col("mix").as("mix_cents"),
          col("competitive").as("competitive_cents"),
          (col("delta") - col("national") - col("mix") - col("competitive"))
            .cast("long").as("residual_cents"))
        .orderBy(col("nation"))
    },

    // ---- U69: late-arriving dimension reconciliation --------------------------
    // The streaming-warehouse headache: facts land before their
    // dimension rows. Phase 1 attributes orders against the EARLY dim
    // snapshot (custkey % 50 ≠ 0), parking misses under the inferred
    // 'UNKNOWN' member; when the LATE dim rows arrive, a correction
    // pass re-attributes exactly the parked facts — negative
    // corrections drain 'UNKNOWN', positive ones credit the real
    // segment. The incremental ledger (phase 1 ⊕ corrections) is
    // certified against the direct full join.
    QueryDef.sql(
      "u69_late_arriving_dim",
      """SELECT c.c_mktsegment AS segment,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val facts = Tables.orders(s, d)
        .select(col("o_custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .localCheckpoint(true) // phase-1 join and the correction pass
      val dim = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      val early = dim.filter(col("c_custkey") % 50 =!= 0)
      val late = dim.filter(col("c_custkey") % 50 === 0)
      val phase1 = facts
        .join(broadcast(early), col("o_custkey") === col("c_custkey"), "left")
        .select(coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
          col("cents"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).cast("long").as("rev_cents"))
      // correction pass: only the parked facts re-attribute
      val parked = facts
        .join(broadcast(late), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("cents"))
      val corrections = parked
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).cast("long").as("rev_cents"))
        .unionByName(parked.agg(
          (-count(lit(1))).as("n_orders"),
          (-sum(col("cents"))).cast("long").as("rev_cents"))
          .withColumn("segment", lit("UNKNOWN"))
          .select(col("segment"), col("n_orders"), col("rev_cents")))
      phase1.unionByName(corrections)
        .groupBy(col("segment"))
        .agg(sum(col("n_orders")).cast("long").as("n_orders"),
          sum(col("rev_cents")).cast("long").as("rev_cents"))
        .filter(col("n_orders") > 0) // UNKNOWN drains to zero and drops
        .orderBy(col("segment"))
    },

    // ---- C52: curation filter waterfall ---------------------------------------
    // The attrition table every dataset paper prints: gates applied IN
    // ORDER (min length → min tokens → repetition cap → word-shape
    // sanity), each stage reporting how many survivors it saw, passed,
    // and dropped — so the marginal bite of each rule is visible, not
    // just the final keep rate. Flags compute in one pass over the
    // corpus; the waterfall is a 4-row unpivot of cumulative
    // conjunctions.
    QueryDef.sql(
      "c52_filter_waterfall",
      """WITH t AS (
        |  SELECT doc_id, n_chars,
        |    regexp_extract_all(lower(text), '\S+') AS toks
        |  FROM documents),
        |fl AS (
        |  SELECT doc_id,
        |    CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS g1,
        |    CASE WHEN len(toks) >= 40 THEN 1 ELSE 0 END AS g2,
        |    CASE WHEN mf * 1000 <= 200 * len(toks) THEN 1 ELSE 0 END AS g3,
        |    CASE WHEN charsum * 1000 >= 3000 * len(toks)
        |          AND charsum * 1000 <= 12000 * len(toks) THEN 1 ELSE 0 END AS g4
        |  FROM (
        |    SELECT doc_id, n_chars, toks,
        |      (SELECT max(c) FROM (
        |        SELECT CAST(count(*) AS BIGINT) AS c
        |        FROM unnest(toks) AS u(tk) GROUP BY tk)) AS mf,
        |      CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(toks, x -> CAST(length(x) AS BIGINT))),
        |        (a, b) -> a + b) AS BIGINT) AS charsum
        |    FROM t)),
        |stages AS (
        |  SELECT 1 AS stage, 'min_chars_200' AS gate,
        |    CAST(count(*) AS BIGINT) AS n_in, CAST(sum(g1) AS BIGINT) AS n_pass
        |  FROM fl
        |  UNION ALL
        |  SELECT 2, 'min_tokens_40', CAST(sum(g1) AS BIGINT),
        |    CAST(sum(g1 * g2) AS BIGINT) FROM fl
        |  UNION ALL
        |  SELECT 3, 'repetition_cap', CAST(sum(g1 * g2) AS BIGINT),
        |    CAST(sum(g1 * g2 * g3) AS BIGINT) FROM fl
        |  UNION ALL
        |  SELECT 4, 'word_shape', CAST(sum(g1 * g2 * g3) AS BIGINT),
        |    CAST(sum(g1 * g2 * g3 * g4) AS BIGINT) FROM fl)
        |SELECT stage, gate, n_in, n_pass,
        |  CAST(n_in - n_pass AS BIGINT) AS n_drop,
        |  CAST(CASE WHEN n_in > 0 THEN (n_in - n_pass) * 1000 // n_in
        |    ELSE 0 END AS BIGINT) AS drop_permille
        |FROM stages ORDER BY stage""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          TextFunctions.tokens(col("text")).as("toks"))
      val base = t.select(col("doc_id"), col("n_chars"),
          size(col("toks")).cast("long").as("ntok"),
          expr("""aggregate(transform(toks, x -> cast(length(x) as bigint)),
            cast(0 as bigint), (a, b) -> a + b)""").as("charsum"), col("toks"))
      val mf = base.select(col("doc_id"), explode(col("toks")).as("tk"))
        .groupBy(col("doc_id"), col("tk")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("mf"))
      val tf = base.drop("toks").join(mf, Seq("doc_id"), "left")
        .withColumn("mf", coalesce(col("mf"), lit(0L)))
      val fl = tf.select(col("doc_id"),
          when(col("n_chars") >= 200, 1).otherwise(0).as("g1"),
          when(col("ntok") >= 40, 1).otherwise(0).as("g2"),
          when(col("mf") * 1000 <= col("ntok") * 200, 1).otherwise(0).as("g3"),
          when(col("charsum") * 1000 >= col("ntok") * 3000 &&
            col("charsum") * 1000 <= col("ntok") * 12000, 1).otherwise(0).as("g4"))
        .localCheckpoint(true) // four waterfall stages read one flag pass
      def stage(n: Int, gate: String, inExpr: String, passExpr: String): DataFrame =
        fl.agg(expr(inExpr).cast("long").as("n_in"),
          expr(passExpr).cast("long").as("n_pass"))
          .select(lit(n).as("stage"), lit(gate).as("gate"), col("n_in"), col("n_pass"))
      stage(1, "min_chars_200", "count(1)", "sum(g1)")
        .unionByName(stage(2, "min_tokens_40", "sum(g1)", "sum(g1 * g2)"))
        .unionByName(stage(3, "repetition_cap", "sum(g1 * g2)", "sum(g1 * g2 * g3)"))
        .unionByName(stage(4, "word_shape", "sum(g1 * g2 * g3)", "sum(g1 * g2 * g3 * g4)"))
        .select(col("stage"), col("gate"), col("n_in"), col("n_pass"),
          (col("n_in") - col("n_pass")).cast("long").as("n_drop"),
          expr("cast(CASE WHEN n_in > 0 THEN (n_in - n_pass) * 1000 div n_in ELSE 0 END as bigint)")
            .as("drop_permille"))
        .orderBy(col("stage"))
    }
  )
}
