package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Hundred-twentieth frontier batch: ratio-to-parent over a ROLLUP
  * lattice (the MDX staple), a randomization test whose "permutations"
  * are hash bits — resampling inference with zero randomness — and the
  * year-over-year calendar-alignment trap measured (same-month vs
  * 364-day weekday-aligned comparison).
  */
object Frontier120Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A191: ratio-to-parent on the region→nation→segment rollup -------------
    // One ROLLUP aggregation produces the whole hierarchy; each level
    // then joins its parent level (null-pattern discrimination — the
    // raw keys are never null, so rollup nulls are unambiguous) and
    // reports its share of the parent in permille. This is the
    // share-of-parent drilldown every BI tool ships, expressed as one
    // shuffle plus three self-joins of a 200-row lattice.
    QueryDef.sql(
      "a191_ratio_to_parent",
      """WITH base AS (
        |  SELECT r.r_name AS region, n.n_name AS nation,
        |    c.c_mktsegment AS segment,
        |    CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders o
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey),
        |lat AS (
        |  SELECT region, nation, segment, CAST(sum(cents) AS BIGINT) AS rev
        |  FROM base GROUP BY ROLLUP (region, nation, segment)),
        |l0 AS (SELECT rev FROM lat
        |  WHERE region IS NULL AND nation IS NULL AND segment IS NULL),
        |l1 AS (SELECT region, rev FROM lat
        |  WHERE region IS NOT NULL AND nation IS NULL AND segment IS NULL),
        |l2 AS (SELECT region, nation, rev FROM lat
        |  WHERE nation IS NOT NULL AND segment IS NULL),
        |l3 AS (SELECT region, nation, segment, rev FROM lat
        |  WHERE segment IS NOT NULL)
        |SELECT * FROM (
        |  SELECT 1 AS lvl, a.region, '' AS nation, '' AS segment, a.rev,
        |    p.rev AS parent_rev, CAST(a.rev * 1000 // p.rev AS BIGINT)
        |      AS share_permille
        |  FROM l1 a CROSS JOIN l0 p
        |  UNION ALL
        |  SELECT 2, a.region, a.nation, '', a.rev, p.rev,
        |    CAST(a.rev * 1000 // p.rev AS BIGINT)
        |  FROM l2 a JOIN l1 p ON p.region = a.region
        |  UNION ALL
        |  SELECT 3, a.region, a.nation, a.segment, a.rev, p.rev,
        |    CAST(a.rev * 1000 // p.rev AS BIGINT)
        |  FROM l3 a JOIN l2 p ON p.region = a.region AND p.nation = a.nation)
        |ORDER BY lvl, region, nation, segment""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.nation(s, d), col("n_nationkey") === col("c_nationkey"))
        .join(Tables.region(s, d), col("r_regionkey") === col("n_regionkey"))
        .select(col("r_name").as("region"), col("n_name").as("nation"),
          col("c_mktsegment").as("segment"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val lat = base.rollup(col("region"), col("nation"), col("segment"))
        .agg(sum(col("cents")).cast("long").as("rev"))
        .localCheckpoint(true) // all four level slices read the lattice
      val l0 = lat.filter(col("region").isNull && col("nation").isNull
        && col("segment").isNull).select(col("rev"))
      val l1 = lat.filter(col("region").isNotNull && col("nation").isNull
        && col("segment").isNull).select(col("region"), col("rev"))
      val l2 = lat.filter(col("nation").isNotNull && col("segment").isNull)
        .select(col("region"), col("nation"), col("rev"))
      val l3 = lat.filter(col("segment").isNotNull)
        .select(col("region"), col("nation"), col("segment"), col("rev"))
      val r1 = l1.crossJoin(broadcast(l0.withColumnRenamed("rev", "parent_rev")))
        .select(lit(1).as("lvl"), col("region"), lit("").as("nation"),
          lit("").as("segment"), col("rev"), col("parent_rev"),
          expr("rev * 1000 div parent_rev").cast("long").as("share_permille"))
      val r2 = l2.join(l1.select(col("region"),
          col("rev").as("parent_rev")), Seq("region"))
        .select(lit(2).as("lvl"), col("region"), col("nation"),
          lit("").as("segment"), col("rev"), col("parent_rev"),
          expr("rev * 1000 div parent_rev").cast("long").as("share_permille"))
      val r3 = l3.join(l2.select(col("region"), col("nation"),
          col("rev").as("parent_rev")), Seq("region", "nation"))
        .select(lit(3).as("lvl"), col("region"), col("nation"), col("segment"),
          col("rev"), col("parent_rev"),
          expr("rev * 1000 div parent_rev").cast("long").as("share_permille"))
      r1.unionByName(r2).unionByName(r3)
        .orderBy(col("lvl"), col("region"), col("nation"), col("segment"))
    },

    // ---- A192: randomization test from hash bits --------------------------------
    // A two-sample test of urgent-vs-other order value, where the 32
    // null-hypothesis reassignments are BITS OF A HASH — md5's 60-bit
    // slice gives every order 32 independent coin flips, so the
    // "permutation" distribution is fully deterministic and the
    // p-value is exact integer arithmetic. One scan; the 32 replicates
    // ride an explode over a 32-row grid (each replicate a conditional
    // sum), never 32 scans.
    QueryDef.sql(
      "a192_permutation_test",
      """WITH o AS (
        |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS y,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS treated,
        |    ('0x' || substr(md5('perm:' || CAST(o_orderkey AS VARCHAR)), 1, 15))
        |      ::BIGINT AS h
        |  FROM orders),
        |obs AS (
        |  SELECT CAST((CAST(sum(CASE WHEN treated = 1 THEN y END) AS HUGEINT)
        |      * 1000000) // sum(treated)
        |    - (CAST(sum(CASE WHEN treated = 0 THEN y END) AS HUGEINT) * 1000000)
        |      // (count(*) - sum(treated)) AS BIGINT) AS obs_micro
        |  FROM o),
        |reps AS (
        |  SELECT b.b,
        |    CAST(count(*) FILTER (WHERE ((h >> b.b) & 1) =1) AS BIGINT) AS n1,
        |    CAST(count(*) FILTER (WHERE ((h >> b.b) & 1) =0) AS BIGINT) AS n0,
        |    CAST(sum(y) FILTER (WHERE ((h >> b.b) & 1) =1) AS BIGINT) AS s1,
        |    CAST(sum(y) FILTER (WHERE ((h >> b.b) & 1) =0) AS BIGINT) AS s0
        |  FROM o CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) b
        |  GROUP BY 1),
        |stats AS (
        |  SELECT b, n1, n0,
        |    CAST((CAST(s1 AS HUGEINT) * 1000000) // n1
        |      - (CAST(s0 AS HUGEINT) * 1000000) // n0 AS BIGINT) AS stat_micro
        |  FROM reps),
        |p AS (
        |  SELECT CAST((1 + count(*) FILTER (WHERE abs(s.stat_micro)
        |      >= abs(x.obs_micro))) * 1000 // 33 AS BIGINT) AS p_permille
        |  FROM stats s CROSS JOIN obs x)
        |SELECT s.b, s.n1, s.n0, s.stat_micro, x.obs_micro,
        |  CAST(CASE WHEN abs(s.stat_micro) >= abs(x.obs_micro)
        |    THEN 1 ELSE 0 END AS INT) AS exceeds,
        |  p.p_permille
        |FROM stats s CROSS JOIN obs x CROSS JOIN p
        |ORDER BY s.b""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d).select(
        floor(col("o_totalprice") * 100).cast("long").as("y"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0).as("treated"),
        conv(substring(md5(concat(lit("perm:"),
          col("o_orderkey").cast("string"))), 1, 15), 16, 10)
          .cast("long").as("h"))
        .localCheckpoint(true) // observed stat + 32 replicates share it
      val obs = o.agg(
        expr("""cast((cast(sum(case when treated = 1 then y end)
          |    as decimal(38,0)) * 1000000) div sum(treated)
          |  - (cast(sum(case when treated = 0 then y end)
          |    as decimal(38,0)) * 1000000) div (count(*) - sum(treated))
          |  as bigint)""".stripMargin).as("obs_micro"))
      val grid = s.range(0, 32).select(col("id").cast("int").as("b"))
      val reps = o.crossJoin(broadcast(grid))
        .groupBy(col("b"))
        .agg(count(when(expr("(h >> b) & 1") === 1, 1)).cast("long").as("n1"),
          count(when(expr("(h >> b) & 1") === 0, 1)).cast("long").as("n0"),
          sum(when(expr("(h >> b) & 1") === 1, col("y"))).cast("long").as("s1"),
          sum(when(expr("(h >> b) & 1") === 0, col("y"))).cast("long").as("s0"))
      val stats = reps.select(col("b"), col("n1"), col("n0"),
        expr("""cast((cast(s1 as decimal(38,0)) * 1000000) div n1
          |  - (cast(s0 as decimal(38,0)) * 1000000) div n0
          |  as bigint)""".stripMargin).as("stat_micro"))
        .crossJoin(broadcast(obs))
        .localCheckpoint(true) // p-value and per-replicate rows share it
      val p = stats.agg(
        expr("""cast((1 + count(case when abs(stat_micro) >= abs(obs_micro)
          |  then 1 end)) * 1000 div 33 as bigint)""".stripMargin)
          .as("p_permille"))
      stats.crossJoin(broadcast(p))
        .select(col("b"), col("n1"), col("n0"), col("stat_micro"),
          col("obs_micro"),
          when(abs(col("stat_micro")) >= abs(col("obs_micro")), 1)
            .otherwise(0).cast("int").as("exceeds"),
          col("p_permille"))
        .orderBy(col("b"))
    },

    // ---- W37: YoY calendar-alignment audit ---------------------------------------
    // Monthly revenue growth computed two ways: the naive same-calendar-
    // month comparison (key − 12) and the weekday-aligned 364-day shift
    // (the retail convention — 52 whole weeks keeps weekday mix
    // constant). The delta column measures the calendar artifact the
    // naive comparison injects. Daily grain aggregates once; the
    // aligned window is a small range join of 84 months against ~2500
    // days.
    QueryDef.sql(
      "w37_yoy_alignment",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |monthly AS (
        |  SELECT CAST(date_trunc('month', day) AS DATE) AS mstart,
        |    year(day) * 12 + month(day) AS mkey,
        |    CAST(sum(cents) AS BIGINT) AS rev,
        |    CAST(count(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1, 2),
        |aligned AS (
        |  SELECT m.mkey, CAST(sum(d.cents) AS BIGINT) AS rev_aligned
        |  FROM monthly m JOIN daily d
        |    ON d.day >= m.mstart - CAST(364 AS INT)
        |   AND d.day < CAST(m.mstart + INTERVAL 1 MONTH AS DATE)
        |     - CAST(364 AS INT)
        |  GROUP BY 1)
        |SELECT m.mstart, m.rev,
        |  p.rev AS rev_naive_ly, a.rev_aligned,
        |  CAST((m.rev - p.rev) * 1000 // p.rev AS BIGINT)
        |    AS growth_naive_permille,
        |  CAST((m.rev - a.rev_aligned) * 1000 // a.rev_aligned AS BIGINT)
        |    AS growth_aligned_permille,
        |  CAST((m.rev - p.rev) * 1000 // p.rev
        |    - (m.rev - a.rev_aligned) * 1000 // a.rev_aligned AS BIGINT)
        |    AS calendar_artifact_permille
        |FROM monthly m
        |JOIN monthly p ON p.mkey = m.mkey - 12
        |JOIN aligned a ON a.mkey = m.mkey
        |WHERE a.rev_aligned > 0
        |ORDER BY m.mstart""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).cast("long")
          .as("cents"))
        .localCheckpoint(true) // monthly rollup + aligned range join share it
      val monthly = daily
        .groupBy(trunc(col("day"), "month").as("mstart"),
          (year(col("day")) * 12 + month(col("day"))).as("mkey"))
        .agg(sum(col("cents")).cast("long").as("rev"),
          count(lit(1)).cast("long").as("n_days"))
      val aligned = monthly.select(col("mkey"), col("mstart"))
        .join(daily,
          col("day") >= date_sub(col("mstart"), 364)
            && col("day") < date_sub(add_months(col("mstart"), 1), 364))
        .groupBy(col("mkey"))
        .agg(sum(col("cents")).cast("long").as("rev_aligned"))
      monthly.as("m")
        .join(monthly.select(col("mkey").as("pkey"),
          col("rev").as("rev_naive_ly")), col("pkey") === col("mkey") - 12)
        .join(aligned, Seq("mkey"))
        .filter(col("rev_aligned") > 0)
        .select(col("mstart"), col("rev"), col("rev_naive_ly"),
          col("rev_aligned"),
          expr("(rev - rev_naive_ly) * 1000 div rev_naive_ly").cast("long")
            .as("growth_naive_permille"),
          expr("(rev - rev_aligned) * 1000 div rev_aligned").cast("long")
            .as("growth_aligned_permille"),
          expr("(rev - rev_naive_ly) * 1000 div rev_naive_ly" +
            " - (rev - rev_aligned) * 1000 div rev_aligned").cast("long")
            .as("calendar_artifact_permille"))
        .orderBy(col("mstart"))
    }
  )
}
