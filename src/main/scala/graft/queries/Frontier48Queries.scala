package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Forty-eighth frontier batch: leave-one-group-out data valuation,
  * bitmap-index boolean algebra, exact header-to-line allocation.
  */
object Frontier48Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A104: leave-one-group-out data valuation ----------------------------
    // "Which source is carrying the signal?" — the global
    // value↔weekday correlation recomputed WITHOUT each event_type,
    // entirely from sufficient statistics: per-group exact moments
    // (n, Σx, Σy, Σx², Σy², Σxy as DECIMAL sums), leave-one-out =
    // global − group, so N ablations cost ONE scan — the whole point
    // at 100 TB, where re-scanning per ablation would be N× the work.
    // The correlation ships as signed r²·10⁶ with the sqrt eliminated
    // by squaring (the w10/v30 trick): sign(num)·num²·10⁶ div
    // (den₁·den₂), every operand an exact integer, degenerate
    // variances guarded (the a59 lesson). x = ⌊value⌋ dollars and
    // y = weekday keep every product inside DECIMAL(38,0) at sf1+.
    QueryDef.sql(
      "a104_group_ablation",
      """WITH base AS (
        |  SELECT event_type,
        |    CAST(floor(value) AS BIGINT) AS x,
        |    CAST(isodow(CAST(ts AS DATE)) - 1 AS BIGINT) AS y
        |  FROM events),
        |grp AS (
        |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x * x) AS HUGEINT) AS sxx,
        |    CAST(sum(y * y) AS HUGEINT) AS syy,
        |    CAST(sum(x * y) AS HUGEINT) AS sxy
        |  FROM base GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n) AS HUGEINT) AS n, CAST(sum(sx) AS HUGEINT) AS sx,
        |    CAST(sum(sy) AS HUGEINT) AS sy, CAST(sum(sxx) AS HUGEINT) AS sxx,
        |    CAST(sum(syy) AS HUGEINT) AS syy, CAST(sum(sxy) AS HUGEINT) AS sxy
        |  FROM grp),
        |variants AS (
        |  SELECT 'all' AS ablated, n, sx, sy, sxx, syy, sxy FROM tot
        |  UNION ALL
        |  SELECT g.event_type, t.n - g.n, t.sx - g.sx, t.sy - g.sy,
        |    t.sxx - g.sxx, t.syy - g.syy, t.sxy - g.sxy
        |  FROM grp g CROSS JOIN tot t),
        |scored AS (
        |  SELECT ablated, CAST(n AS BIGINT) AS n,
        |    n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS den1, n * syy - sy * sy AS den2
        |  FROM variants)
        |SELECT ablated, n,
        |  CAST(CASE WHEN den1 > 0 AND den2 > 0 THEN
        |    (CASE WHEN num >= 0 THEN 1 ELSE -1 END)
        |      * ((num * num * 1000000) // (den1 * den2))
        |    ELSE NULL END AS BIGINT) AS r2_signed_micro
        |FROM scored ORDER BY ablated""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val base = Tables.events(s, d).select(col("event_type"),
        floor(col("value")).cast("long").as("x"),
        weekday(col("ts").cast("date")).cast("long").as("y"))
      val grp = base.groupBy(col("event_type"))
        .agg(count(lit(1)).cast(dec).as("n"),
          sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
          sum(col("x") * col("x")).cast(dec).as("sxx"),
          sum(col("y") * col("y")).cast(dec).as("syy"),
          sum(col("x") * col("y")).cast(dec).as("sxy"))
        .localCheckpoint(true) // one scan; feeds total + all ablations
      val tot = grp.agg(sum(col("n")).as("n"), sum(col("sx")).as("sx"),
        sum(col("sy")).as("sy"), sum(col("sxx")).as("sxx"),
        sum(col("syy")).as("syy"), sum(col("sxy")).as("sxy"))
      val all = tot.select(lit("all").as("ablated"), col("n"), col("sx"),
        col("sy"), col("sxx"), col("syy"), col("sxy"))
      val loo = grp.crossJoin(broadcast(tot.select(
          col("n").as("tn"), col("sx").as("tsx"), col("sy").as("tsy"),
          col("sxx").as("tsxx"), col("syy").as("tsyy"), col("sxy").as("tsxy"))))
        .select(col("event_type").as("ablated"),
          (col("tn") - col("n")).as("n"), (col("tsx") - col("sx")).as("sx"),
          (col("tsy") - col("sy")).as("sy"), (col("tsxx") - col("sxx")).as("sxx"),
          (col("tsyy") - col("syy")).as("syy"), (col("tsxy") - col("sxy")).as("sxy"))
      all.unionByName(loo)
        .select(col("ablated"), col("n").cast("long").as("n"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("den1"),
          (col("n") * col("syy") - col("sy") * col("sy")).as("den2"))
        .select(col("ablated"), col("n"),
          when(col("den1") > 0 && col("den2") > 0,
            when(col("num") >= 0, 1).otherwise(-1)
              * expr("(num * num * 1000000) div (den1 * den2)"))
            .otherwise(lit(null)).cast("long").as("r2_signed_micro"))
        .orderBy(col("ablated"))
    },

    // ---- U40: bitmap index build + boolean algebra ---------------------------
    // The OLAP indexing structure itself: per predicate, rows collapse
    // to one 32-bit word per 32-row bucket (word = bit_or of
    // 1 << rowid%32 — OR, not SUM, so no ANSI overflow at bit 31+),
    // and boolean queries become bitwise AND/OR + popcount over the
    // word tables — the index is ~n/32 rows and predicate combination
    // never re-touches the fact table. Direct-predicate counts ride
    // along to prove the algebra (count(AND) + count(OR) =
    // count(A) + count(B) — inclusion-exclusion in bit space).
    QueryDef.sql(
      "u40_bitmap_index",
      """WITH a AS (
        |  SELECT event_id // 32 AS bucket,
        |    CAST(bit_or(1::BIGINT << CAST(event_id % 32 AS INT)) AS BIGINT) AS w
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |b AS (
        |  SELECT event_id // 32 AS bucket,
        |    CAST(bit_or(1::BIGINT << CAST(event_id % 32 AS INT)) AS BIGINT) AS w
        |  FROM events WHERE value > 400.0 GROUP BY 1),
        |joined AS (
        |  SELECT coalesce(a.w, 0) AS wa, coalesce(b.w, 0) AS wb
        |  FROM a FULL OUTER JOIN b ON a.bucket = b.bucket),
        |bits AS (
        |  SELECT CAST(sum(bit_count(wa)) AS BIGINT) AS n_a,
        |    CAST(sum(bit_count(wb)) AS BIGINT) AS n_b,
        |    CAST(sum(bit_count(wa & wb)) AS BIGINT) AS n_and,
        |    CAST(sum(bit_count(wa | wb)) AS BIGINT) AS n_or,
        |    CAST(count(*) AS BIGINT) AS n_buckets
        |  FROM joined),
        |direct AS (
        |  SELECT CAST(count(*) FILTER (WHERE event_type = 'purchase'
        |      AND value > 400.0) AS BIGINT) AS d_and,
        |    CAST(count(*) FILTER (WHERE event_type = 'purchase'
        |      OR value > 400.0) AS BIGINT) AS d_or
        |  FROM events)
        |SELECT n_a, n_b, n_and, n_or, n_buckets, d_and, d_or
        |FROM bits CROSS JOIN direct""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      def bitmap(pred: Column): DataFrame = ev.filter(pred)
        .groupBy(expr("event_id div 32").as("bucket"))
        .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(event_id % 32 AS INT)))")
          .as("w"))
      val a = bitmap(col("event_type") === "purchase")
        .select(col("bucket"), col("w").as("wa"))
      val b = bitmap(col("value") > 400.0)
        .select(col("bucket"), col("w").as("wb"))
      val joined = a.join(b, Seq("bucket"), "full_outer")
        .select(coalesce(col("wa"), lit(0L)).as("wa"),
          coalesce(col("wb"), lit(0L)).as("wb"))
      val bits = joined.agg(
        sum(bit_count(col("wa"))).cast("long").as("n_a"),
        sum(bit_count(col("wb"))).cast("long").as("n_b"),
        sum(bit_count(expr("wa & wb"))).cast("long").as("n_and"),
        sum(bit_count(expr("wa | wb"))).cast("long").as("n_or"),
        count(lit(1)).as("n_buckets"))
      val direct = ev.agg(
        count(when(col("event_type") === "purchase" && col("value") > 400.0, 1))
          .as("d_and"),
        count(when(col("event_type") === "purchase" || col("value") > 400.0, 1))
          .as("d_or"))
      bits.crossJoin(broadcast(direct))
    },

    // ---- J11: exact header-to-line allocation (largest remainder) -----------
    // The warehouse allocation op: spread each order's header total
    // across its lines proportionally to extended price so that the
    // parts sum EXACTLY to the whole — base share T·wᵢ div W plus a
    // largest-remainder (Hamilton) top-up ranked by T·wᵢ mod W with
    // the line number breaking ties. One orderkey-partitioned window
    // over a bounded grain (≤17 lines/order); conservation
    // Σ alloc = T holds bit-exactly by construction.
    QueryDef.sql(
      "j11_revenue_allocation",
      """WITH l AS (
        |  SELECT l_orderkey AS ok, l_linenumber AS ln,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS w
        |  FROM lineitem),
        |o AS (
        |  SELECT o_orderkey AS ok,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS t
        |  FROM orders),
        |tw AS (SELECT ok, CAST(sum(w) AS BIGINT) AS tw FROM l GROUP BY 1),
        |shares AS (
        |  SELECT l.ok, l.ln, o.t, (o.t * l.w) // w.tw AS base,
        |    (o.t * l.w) % w.tw AS rem
        |  FROM l JOIN o ON l.ok = o.ok JOIN tw w ON l.ok = w.ok),
        |short AS (
        |  SELECT ok, CAST(t - sum(base) AS BIGINT) AS missing
        |  FROM shares GROUP BY ok, t),
        |ranked AS (
        |  SELECT s.ok, s.ln, s.base, sh.missing,
        |    row_number() OVER (PARTITION BY s.ok ORDER BY s.rem DESC, s.ln) AS rk
        |  FROM shares s JOIN short sh ON s.ok = sh.ok)
        |SELECT ok AS orderkey, CAST(ln AS INT) AS linenumber,
        |  CAST(base + CASE WHEN rk <= missing THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc_cents
        |FROM ranked""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d).select(col("l_orderkey").as("ok"),
        col("l_linenumber").as("ln"),
        (col("l_extendedprice").cast(DecimalType(18, 4)) * 100).cast("long").as("w"))
      val o = Tables.orders(s, d).select(col("o_orderkey").as("ok"),
        (col("o_totalprice").cast(DecimalType(18, 4)) * 100).cast("long").as("t"))
      val tw = l.groupBy(col("ok")).agg(sum(col("w")).as("tw"))
      val shares = l.join(o, "ok").join(tw, "ok")
        .select(col("ok"), col("ln"), col("t"),
          expr("(t * w) div tw").as("base"), expr("(t * w) % tw").as("rem"))
      val short = shares.groupBy(col("ok"), col("t"))
        .agg((col("t") - sum(col("base"))).cast("long").as("missing"))
        .select(col("ok"), col("missing"))
      shares.join(short, "ok")
        .withColumn("rk", row_number().over(Window.partitionBy(col("ok"))
          .orderBy(col("rem").desc, col("ln"))))
        .select(col("ok").as("orderkey"), col("ln").cast("int").as("linenumber"),
          (col("base") + when(col("rk") <= col("missing"), 1).otherwise(0))
            .cast("long").as("alloc_cents"))
    }
  )
}
