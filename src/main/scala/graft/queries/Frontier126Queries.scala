package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-twenty-sixth frontier batch: the Datafly/Incognito
  * generalization lattice for k-anonymity (pick the minimal
  * generalization that actually reaches k), the mean-excess table from
  * extreme-value theory (the empirical plot behind every tail-risk GPD
  * fit, exact in cents), and prefix-autocomplete statistics over the
  * token stream.
  */
object Frontier126Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- C62: k-anonymity generalization lattice ---------------------------------
    // Quasi-identifiers (order date, customer geography) generalize
    // along two ladders: day→month→year and nation→region. All six
    // lattice nodes are evaluated in ONE fan-out scan (explode over the
    // node list), each scored by its smallest equivalence class and the
    // row-share needing suppression at k=5; a node is MINIMAL-safe when
    // it reaches k but each one-step-less-general neighbor does not —
    // the exact output of an Incognito sweep.
    QueryDef.sql(
      "c62_generalization_lattice",
      """WITH base AS (
        |  SELECT CAST(o.o_orderdate AS DATE) AS day,
        |    strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS mon,
        |    CAST(year(o.o_orderdate) AS VARCHAR) AS yr,
        |    n.n_name AS nat, r.r_name AS reg
        |  FROM orders o
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey),
        |fan0 AS (
        |  SELECT unnest([
        |    {'di': 0, 'gi': 0, 'qd': CAST(day AS VARCHAR), 'qg': nat},
        |    {'di': 1, 'gi': 0, 'qd': mon, 'qg': nat},
        |    {'di': 2, 'gi': 0, 'qd': yr, 'qg': nat},
        |    {'di': 0, 'gi': 1, 'qd': CAST(day AS VARCHAR), 'qg': reg},
        |    {'di': 1, 'gi': 1, 'qd': mon, 'qg': reg},
        |    {'di': 2, 'gi': 1, 'qd': yr, 'qg': reg}]) AS u
        |  FROM base),
        |cls AS (
        |  SELECT u.di AS di, u.gi AS gi, u.qd AS qd, u.qg AS qg,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM fan0 GROUP BY 1, 2, 3, 4),
        |nodes AS (
        |  SELECT di, gi, CAST(count(*) AS BIGINT) AS n_classes,
        |    CAST(min(k) AS BIGINT) AS k_min,
        |    CAST(sum(k) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS suppressed
        |  FROM cls GROUP BY 1, 2),
        |flagged AS (
        |  SELECT di, gi, n_classes, k_min, suppressed,
        |    CAST(suppressed * 1000 // n_rows AS BIGINT) AS suppress_permille,
        |    CASE WHEN k_min >= 5 THEN 1 ELSE 0 END AS safe
        |  FROM nodes)
        |SELECT f.di, f.gi, f.n_classes, f.k_min, f.suppressed,
        |  f.suppress_permille, CAST(f.safe AS INT) AS safe,
        |  CAST(CASE WHEN f.safe = 1
        |    AND coalesce(pd.safe, 0) = 0 AND coalesce(pg.safe, 0) = 0
        |    THEN 1 ELSE 0 END AS INT) AS minimal_safe
        |FROM flagged f
        |LEFT JOIN flagged pd ON pd.di = f.di - 1 AND pd.gi = f.gi
        |LEFT JOIN flagged pg ON pg.di = f.di AND pg.gi = f.gi - 1
        |ORDER BY f.di, f.gi""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.nation(s, d), col("n_nationkey") === col("c_nationkey"))
        .join(Tables.region(s, d), col("r_regionkey") === col("n_regionkey"))
        .select(col("o_orderdate").cast("date").cast("string").as("day"),
          date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
          year(col("o_orderdate")).cast("string").as("yr"),
          col("n_name").as("nat"), col("r_name").as("reg"))
      val fan = base.select(explode(array(
        struct(lit(0).as("di"), lit(0).as("gi"), col("day").as("qd"),
          col("nat").as("qg")),
        struct(lit(1).as("di"), lit(0).as("gi"), col("mon").as("qd"),
          col("nat").as("qg")),
        struct(lit(2).as("di"), lit(0).as("gi"), col("yr").as("qd"),
          col("nat").as("qg")),
        struct(lit(0).as("di"), lit(1).as("gi"), col("day").as("qd"),
          col("reg").as("qg")),
        struct(lit(1).as("di"), lit(1).as("gi"), col("mon").as("qd"),
          col("reg").as("qg")),
        struct(lit(2).as("di"), lit(1).as("gi"), col("yr").as("qd"),
          col("reg").as("qg")))).as("u"))
      val cls = fan.groupBy(col("u.di").as("di"), col("u.gi").as("gi"),
          col("u.qd").as("qd"), col("u.qg").as("qg"))
        .agg(count(lit(1)).cast("long").as("k"))
      val nodes = cls.groupBy(col("di"), col("gi"))
        .agg(count(lit(1)).cast("long").as("n_classes"),
          min(col("k")).cast("long").as("k_min"),
          sum(col("k")).cast("long").as("n_rows"),
          sum(when(col("k") < 5, col("k")).otherwise(0L)).cast("long")
            .as("suppressed"))
      val flagged = nodes.select(col("di"), col("gi"), col("n_classes"),
        col("k_min"), col("suppressed"),
        expr("suppressed * 1000 div n_rows").cast("long")
          .as("suppress_permille"),
        when(col("k_min") >= 5, 1).otherwise(0).as("safe"))
        .localCheckpoint(true) // self-joined twice for lattice parents
      flagged.as("f")
        .join(flagged.select(col("di").as("pdi"), col("gi").as("pgi"),
          col("safe").as("safe_d")).as("pd"),
          col("pdi") === col("f.di") - 1 && col("pgi") === col("f.gi"), "left")
        .join(flagged.select(col("di").as("qdi"), col("gi").as("qgi"),
          col("safe").as("safe_g")).as("pg"),
          col("qdi") === col("f.di") && col("qgi") === col("f.gi") - 1, "left")
        .select(col("f.di").as("di"), col("f.gi").as("gi"), col("n_classes"),
          col("k_min"), col("suppressed"), col("suppress_permille"),
          col("safe").cast("int").as("safe"),
          when(col("safe") === 1
            && coalesce(col("safe_d"), lit(0)) === 0
            && coalesce(col("safe_g"), lit(0)) === 0, 1).otherwise(0)
            .cast("int").as("minimal_safe"))
        .orderBy(col("di"), col("gi"))
    },

    // ---- W41: mean-excess table (extreme-value theory) ---------------------------
    // The empirical mean-excess function e(u) = E[X−u | X>u] at exact
    // order-statistic thresholds (p50/p75/p90/p95 of lineitem revenue
    // cents, ShardedRank — no global window): the linearity of e(u) in
    // u is the operational test for a generalized-Pareto tail, so the
    // table IS the diagnostic. Exact integer means via one division per
    // threshold.
    QueryDef.sql(
      "w41_mean_excess",
      """WITH x AS (
        |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
        |r AS (
        |  SELECT v, row_number() OVER (ORDER BY v) AS rk FROM x),
        |th AS (
        |  SELECT q.q AS q_permille, max(r.v) AS u
        |  FROM (SELECT unnest([500, 750, 900, 950]) AS q) q
        |  CROSS JOIN n
        |  JOIN r ON r.rk = (q.q * n.n + 999) // 1000
        |  GROUP BY 1),
        |ex AS (
        |  SELECT t.q_permille, t.u,
        |    CAST(count(*) AS BIGINT) AS n_exceed,
        |    CAST(sum(x.v - t.u) AS BIGINT) AS excess_sum
        |  FROM th t JOIN x ON x.v > t.u
        |  GROUP BY 1, 2)
        |SELECT q_permille, u AS threshold_cents, n_exceed,
        |  CAST(excess_sum // greatest(n_exceed, 1) AS BIGINT)
        |    AS mean_excess_cents
        |FROM ex ORDER BY q_permille""".stripMargin) { (s, d) =>
      import graft.operators.ShardedRank
      val x = Tables.lineitem(s, d)
        .select(floor(col("l_extendedprice") * 100).cast("long").as("v"))
      val ranked = ShardedRank.withRank(x, "rk", col("v").asc)
        .localCheckpoint(true)
      val n = ranked.agg(count(lit(1)).cast("long").as("n"))
      val qs = s.range(0, 4).select(
        element_at(array(lit(500), lit(750), lit(900), lit(950)),
          col("id").cast("int") + 1).as("q_permille"))
      val th = broadcast(qs).crossJoin(broadcast(n))
        .withColumn("target", expr("(q_permille * n + 999) div 1000"))
        .join(ranked, col("rk") === col("target"))
        .groupBy(col("q_permille")).agg(max(col("v")).as("u"))
      val ex = broadcast(th).join(x, col("v") > col("u"))
        .groupBy(col("q_permille"), col("u"))
        .agg(count(lit(1)).cast("long").as("n_exceed"),
          sum(col("v") - col("u")).cast("long").as("excess_sum"))
      ex.select(col("q_permille"), col("u").as("threshold_cents"),
        col("n_exceed"),
        expr("excess_sum div greatest(n_exceed, 1)").cast("long")
          .as("mean_excess_cents"))
        .orderBy(col("q_permille"))
    },

    // ---- T92: prefix-autocomplete statistics --------------------------------------
    // The search-box question: for each 2-character prefix, what is the
    // top completion and how dominant is it? Term frequencies aggregate
    // once; prefixes group them again; the top completion is a
    // per-prefix window (bounded fan-in). Prefixes below 10 occurrences
    // drop — the suggest-index size/coverage trade made visible.
    QueryDef.sql(
      "t92_prefix_autocomplete",
      """WITH tf AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |        FROM documents)
        |  WHERE length(term) >= 2 GROUP BY 1),
        |pf AS (
        |  SELECT substr(term, 1, 2) AS pfx, term, f,
        |    row_number() OVER (PARTITION BY substr(term, 1, 2)
        |      ORDER BY f DESC, term ASC) AS rn,
        |    sum(f) OVER (PARTITION BY substr(term, 1, 2)) AS pfx_f,
        |    count(*) OVER (PARTITION BY substr(term, 1, 2)) AS n_terms
        |  FROM tf)
        |SELECT pfx, CAST(pfx_f AS BIGINT) AS prefix_freq,
        |  CAST(n_terms AS BIGINT) AS n_completions,
        |  term AS top_completion, f AS top_freq,
        |  CAST(f * 1000 // pfx_f AS BIGINT) AS top_share_permille
        |FROM pf WHERE rn = 1 AND pfx_f >= 10
        |ORDER BY pfx""".stripMargin) { (s, d) =>
      val tf = Tables.documents(s, d)
        .select(explode(graft.functions.TextFunctions.tokens(col("text")))
          .as("term"))
        .filter(length(col("term")) >= 2)
        .groupBy(col("term")).agg(count(lit(1)).cast("long").as("f"))
      val wP = Window.partitionBy(substring(col("term"), 1, 2))
      val pf = tf
        .withColumn("pfx", substring(col("term"), 1, 2))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("pfx")).orderBy(col("f").desc,
            col("term").asc)))
        .withColumn("pfx_f", sum(col("f")).over(
          Window.partitionBy(col("pfx"))))
        .withColumn("n_terms", count(lit(1)).over(
          Window.partitionBy(col("pfx"))))
      pf.filter(col("rn") === 1 && col("pfx_f") >= 10)
        .select(col("pfx"), col("pfx_f").cast("long").as("prefix_freq"),
          col("n_terms").cast("long").as("n_completions"),
          col("term").as("top_completion"), col("f").as("top_freq"),
          expr("f * 1000 div pfx_f").cast("long").as("top_share_permille"))
        .orderBy(col("pfx"))
    }
  )
}
