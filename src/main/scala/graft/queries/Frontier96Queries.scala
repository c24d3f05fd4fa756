package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Ninety-sixth frontier batch: boilerplate LCP detection, Kendall's W
  * concordance, consistent-cut export audit.
  */
object Frontier96Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- T80: boilerplate detection via the LCP min/max trick -----------------
    // Per-source boilerplate headers without comparing every document:
    // the longest common prefix of a SET of strings equals the LCP of
    // just its lexicographic MIN and MAX — so two string aggregates
    // per source replace an all-pairs comparison, and one bounded fold
    // finds the first diverging character. Reported savings =
    // prefix_len·(n−1): what stripping the boilerplate reclaims.
    QueryDef.sql(
      "t80_boilerplate_lcp",
      """WITH mm AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    min(text) AS mn, max(text) AS mx
        |  FROM documents GROUP BY 1),
        |lcp AS (
        |  SELECT source, n_docs,
        |    CAST(list_reduce(list_prepend(0,
        |      range(1, CAST(least(length(mn), length(mx)) AS BIGINT) + 1)),
        |      (acc, i) -> CASE WHEN acc = i - 1
        |        AND substr(mn, CAST(i AS INT), 1) = substr(mx, CAST(i AS INT), 1)
        |        THEN i ELSE acc END) AS BIGINT) AS lcp_len,
        |    mn
        |  FROM mm)
        |SELECT source, n_docs, lcp_len,
        |  md5(substr(mn, 1, CAST(lcp_len AS INT))) AS prefix_md5,
        |  CAST(lcp_len * (n_docs - 1) AS BIGINT) AS saved_bytes
        |FROM lcp ORDER BY source""".stripMargin) { (s, d) =>
      val mm = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), min(col("text")).as("mn"),
          max(col("text")).as("mx"))
      val lcp = mm.select(col("source"), col("n_docs"), col("mn"),
        expr("""cast(CASE WHEN least(length(mn), length(mx)) > 0 THEN
            aggregate(sequence(1, least(length(mn), length(mx))), 0,
              (acc, i) -> IF(acc = i - 1
                AND substring(mn, i, 1) = substring(mx, i, 1), i, acc))
          ELSE 0 END as bigint)""").as("lcp_len"))
      lcp.select(col("source"), col("n_docs"), col("lcp_len"),
          md5(expr("substring(mn, 1, cast(lcp_len as int))")).as("prefix_md5"),
          (col("lcp_len") * (col("n_docs") - 1)).cast("long").as("saved_bytes"))
        .orderBy(col("source"))
    },

    // ---- A149: Kendall's W (multi-ranker concordance) -------------------------
    // Three independent league tables rank the nations — total
    // revenue, order count, and average order value. Do they agree?
    // Kendall's coefficient of concordance from the rank sums,
    // entirely in integers: W_micro = 3·Σ(2Rᵢ − m(n+1))²·10⁶ div
    // (m²(n³−n)) (the ×4-cleared form of 12S/(m²(n³−n))). Ranks are
    // tie-broken by nation key, documented; the window partitions by
    // ranker over the 25-row league table.
    QueryDef.sql(
      "a149_kendall_w",
      """WITH base AS (
        |  SELECT c.c_nationkey AS nk,
        |    CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1),
        |metrics AS (
        |  SELECT nk, 'revenue' AS ranker, rev AS v FROM base
        |  UNION ALL SELECT nk, 'orders', cnt FROM base
        |  UNION ALL SELECT nk, 'avg_value', rev // cnt FROM base),
        |rk AS (
        |  SELECT nk, ranker,
        |    CAST(row_number() OVER (PARTITION BY ranker ORDER BY v DESC, nk)
        |      AS BIGINT) AS r
        |  FROM metrics),
        |rs AS (SELECT nk, CAST(sum(r) AS BIGINT) AS rsum FROM rk GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rs),
        |s4 AS (
        |  SELECT CAST(sum((2 * rs.rsum - 3 * (nn.n + 1)) *
        |    (2 * rs.rsum - 3 * (nn.n + 1))) AS BIGINT) AS s4, max(nn.n) AS n
        |  FROM rs CROSS JOIN nn)
        |SELECT n AS n_items, CAST(3 AS BIGINT) AS n_rankers, s4 AS s4_stat,
        |  CAST(3 * s4 * 1000000 // (9 * (n * n * n - n)) AS BIGINT) AS w_micro
        |FROM s4""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).cast("long")
          .as("rev"), count(lit(1)).as("cnt"))
        .localCheckpoint(true) // three ranker views read one rollup
      val metrics = base.select(col("nk"), lit("revenue").as("ranker"),
          col("rev").as("v"))
        .unionByName(base.select(col("nk"), lit("orders").as("ranker"),
          col("cnt").as("v")))
        .unionByName(base.select(col("nk"), lit("avg_value").as("ranker"),
          expr("rev div cnt").as("v")))
      val rk = metrics.withColumn("r", row_number().over(Window
        .partitionBy(col("ranker")).orderBy(col("v").desc, col("nk"))).cast("long"))
      val rs = rk.groupBy(col("nk")).agg(sum(col("r")).cast("long").as("rsum"))
        .localCheckpoint(true) // count and the deviation sum read it
      val nn = rs.agg(count(lit(1)).as("n"))
      rs.crossJoin(broadcast(nn))
        .agg(sum((col("rsum") * 2 - (col("n") + 1) * 3) *
          (col("rsum") * 2 - (col("n") + 1) * 3)).cast("long").as("s4"),
          max(col("n")).as("n"))
        .select(col("n").as("n_items"), lit(3L).as("n_rankers"),
          col("s4").as("s4_stat"),
          expr("cast(3 * s4 * 1000000 div (9 * (n * n * n - n)) as bigint)")
            .as("w_micro"))
    },

    // ---- U75: consistent-cut export audit -------------------------------------
    // Exporting a multi-table snapshot "as of day T" is only
    // consistent if no exported order is still accumulating line items
    // past the cut. For three candidate cuts (T = max date − 0/30/60
    // days): orders in the export, orders fully shipped by T, and the
    // in-flight permille — the number that picks how far back a clean
    // snapshot boundary has to sit.
    QueryDef.sql(
      "u75_consistent_cut",
      """WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS md FROM orders),
        |ord AS (
        |  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS od,
        |    max(CAST(l.l_shipdate AS DATE)) AS last_ship
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |cuts AS (SELECT unnest([0, 30, 60]) AS k),
        |audit AS (
        |  SELECT c.k,
        |    CAST(count(*) AS BIGINT) AS n_exported,
        |    CAST(sum(CASE WHEN o.last_ship <= mx.md - c.k THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_complete
        |  FROM ord o CROSS JOIN mx CROSS JOIN cuts c
        |  WHERE o.od <= mx.md - c.k
        |  GROUP BY 1)
        |SELECT CAST(k AS INT) AS cut_days_back, n_exported, n_complete,
        |  CAST(n_exported - n_complete AS BIGINT) AS n_inflight,
        |  CAST((n_exported - n_complete) * 1000 // n_exported AS BIGINT)
        |    AS inflight_permille
        |FROM audit ORDER BY 1""".stripMargin) { (s, d) =>
      val mx = Tables.orders(s, d)
        .agg(max(col("o_orderdate").cast("date")).as("md"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))
        .join(Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_shipdate").cast("date").as("sd")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("od"))
        .agg(max(col("sd")).as("last_ship"))
        .localCheckpoint(true) // three cuts read one per-order rollup
      val cuts = { import s.implicits._; Seq(0, 30, 60).toDF("k") }
      ord.crossJoin(broadcast(mx)).crossJoin(broadcast(cuts))
        .filter(col("od") <= expr("date_sub(md, k)"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_exported"),
          sum(when(col("last_ship") <= expr("date_sub(md, k)"), 1).otherwise(0))
            .cast("long").as("n_complete"))
        .select(col("k").cast("int").as("cut_days_back"), col("n_exported"),
          col("n_complete"),
          (col("n_exported") - col("n_complete")).cast("long").as("n_inflight"),
          expr("cast((n_exported - n_complete) * 1000 div n_exported as bigint)")
            .as("inflight_permille"))
        .orderBy(col("cut_days_back"))
    }
  )
}
