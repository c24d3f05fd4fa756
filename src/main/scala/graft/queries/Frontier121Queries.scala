package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-twenty-first frontier batch: multiple-testing control
  * (Benjamini–Hochberg over 25 per-nation chi-square tests with the
  * tail CDF baked as a permille table), an Iceberg-style partition-spec
  * evolution planner scoring candidate layouts against a fixed query
  * workload, and Borda/Copeland rank aggregation across four metric
  * rankings (the social-choice answer to "which nation is best").
  */
object Frontier121Queries {

  /** chi²(1df) survival·1000 at stat buckets of width 0.5 (centers
    * 0.25, 0.75, …, 19.75): erfc(sqrt(x/2)) baked, a178-style. */
  private val Chi2Tail: Seq[Int] = Seq(
    617, 386, 264, 186, 134, 97, 71, 53, 39, 29, 22, 16, 12, 9, 7, 5, 4,
    3, 2, 2, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  val defs: Seq[QueryDef] = Seq(

    // ---- A193: Benjamini–Hochberg FDR over per-nation chi-square tests ----------
    // 25 simultaneous 2x2 independence tests (urgent priority vs
    // high-value order), each reduced to the exact integer statistic
    // n(ad−bc)²/(row·col products) in milli, mapped to a p-value
    // through the baked chi² tail table, then BH at α=0.1: reject
    // ranks 1..k where k = max{i : p_i·m ≤ 100·i}. The ranking window
    // is bounded by the hypothesis count (25), never the data.
    QueryDef.sql(
      "a193_bh_fdr",
      s"""WITH cells AS (
        |  SELECT c.c_nationkey AS nk,
        |    CAST(count(*) FILTER (WHERE o.o_orderpriority IN
        |      ('1-URGENT', '2-HIGH') AND o.o_totalprice > 250000.0) AS BIGINT)
        |      AS a,
        |    CAST(count(*) FILTER (WHERE o.o_orderpriority IN
        |      ('1-URGENT', '2-HIGH') AND o.o_totalprice <= 250000.0) AS BIGINT)
        |      AS b,
        |    CAST(count(*) FILTER (WHERE o.o_orderpriority NOT IN
        |      ('1-URGENT', '2-HIGH') AND o.o_totalprice > 250000.0) AS BIGINT)
        |      AS c,
        |    CAST(count(*) FILTER (WHERE o.o_orderpriority NOT IN
        |      ('1-URGENT', '2-HIGH') AND o.o_totalprice <= 250000.0) AS BIGINT)
        |      AS d
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1),
        |stats AS (
        |  SELECT nk, a, b, c, d,
        |    CAST(CASE WHEN (a+b) * (c+d) * (a+c) * (b+d) = 0 THEN 0
        |      ELSE (CAST(a+b+c+d AS HUGEINT)
        |          * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
        |          * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c) * 1000)
        |        // (CAST(a+b AS HUGEINT) * (c+d) * (a+c) * (b+d)) END AS BIGINT)
        |      AS stat_milli
        |  FROM cells),
        |pv AS (
        |  SELECT nk, stat_milli,
        |    [${Chi2Tail.mkString(", ")}]
        |      [CAST(least(stat_milli // 500, 39) AS INT) + 1] AS p_milli
        |  FROM stats),
        |ranked AS (
        |  SELECT nk, stat_milli, p_milli,
        |    row_number() OVER (ORDER BY p_milli ASC, nk ASC) AS bh_rank,
        |    count(*) OVER () AS m
        |  FROM pv),
        |k AS (
        |  SELECT coalesce(max(bh_rank) FILTER (WHERE p_milli * m <= 100 * bh_rank),
        |    0) AS kmax
        |  FROM ranked)
        |SELECT n.n_name AS nation, r.stat_milli, r.p_milli,
        |  CAST(r.bh_rank AS BIGINT) AS bh_rank,
        |  CAST(100 * r.bh_rank // r.m AS BIGINT) AS bh_cutoff_milli,
        |  CAST(CASE WHEN r.bh_rank <= kk.kmax THEN 1 ELSE 0 END AS INT)
        |    AS rejected
        |FROM ranked r CROSS JOIN k kk
        |JOIN nation n ON n.n_nationkey = r.nk
        |ORDER BY nation""".stripMargin) { (s, d) =>
      val table = s"array(${Chi2Tail.mkString(", ")})"
      val cells = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .withColumn("urg", col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .withColumn("hi", col("o_totalprice") > 250000.0)
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(when(col("urg") && col("hi"), 1)).cast("long").as("a"),
          count(when(col("urg") && !col("hi"), 1)).cast("long").as("b"),
          count(when(!col("urg") && col("hi"), 1)).cast("long").as("c"),
          count(when(!col("urg") && !col("hi"), 1)).cast("long").as("d"))
      val stats = cells.withColumn("stat_milli", expr(
        """cast(case when (a+b) * (c+d) * (a+c) * (b+d) = 0 then 0
          |  else (cast(a+b+c+d as decimal(38,0))
          |      * (cast(a as decimal(38,0)) * d - cast(b as decimal(38,0)) * c)
          |      * (cast(a as decimal(38,0)) * d - cast(b as decimal(38,0)) * c)
          |      * 1000)
          |    div (cast(a+b as decimal(38,0)) * (c+d) * (a+c) * (b+d)) end
          |  as bigint)""".stripMargin))
      val pv = stats.select(col("nk"), col("stat_milli"),
        expr(s"element_at($table," +
          " cast(least(stat_milli div 500, 39) as int) + 1)").as("p_milli"))
      val ranked = pv
        .withColumn("bh_rank", row_number().over(
          Window.orderBy(col("p_milli").asc, col("nk").asc))) // 25 hypotheses
        .withColumn("m", count(lit(1)).over(
          Window.partitionBy()))
        .localCheckpoint(true)
      val k = ranked.agg(coalesce(max(when(
        col("p_milli") * col("m") <= lit(100) * col("bh_rank"),
        col("bh_rank"))), lit(0)).as("kmax"))
      ranked.crossJoin(broadcast(k))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))),
          Seq("nk"))
        .select(col("nation"), col("stat_milli"), col("p_milli"),
          col("bh_rank").cast("long").as("bh_rank"),
          expr("100 * bh_rank div m").cast("long").as("bh_cutoff_milli"),
          when(col("bh_rank") <= col("kmax"), 1).otherwise(0).cast("int")
            .as("rejected"))
        .orderBy(col("nation"))
    },

    // ---- U92: partition-spec evolution planner -----------------------------------
    // Iceberg's question: which partition spec should this table evolve
    // to, given the query workload? Four candidate specs (day, month,
    // nation, month+nation) are scored against five canonical
    // predicates by actual rows scanned: a partition is scanned iff ANY
    // row in it matches (min/max pruning idealized to containment),
    // and the cost is the partition's FULL row count. Small-file counts
    // ride along — the spec that prunes best may also fragment worst,
    // which is exactly the trade. One scan; specs fan out in an
    // explode; two grouped aggregations.
    QueryDef.sql(
      "u92_partition_evolution",
      """WITH rows_ AS (
        |  SELECT CAST(o.o_orderdate AS DATE) AS day,
        |    strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS mon,
        |    c.c_nationkey AS nk,
        |    CASE WHEN CAST(o.o_orderdate AS DATE) = DATE '1995-06-15'
        |      THEN 1 ELSE 0 END AS m1,
        |    CASE WHEN CAST(o.o_orderdate AS DATE) >= DATE '1995-01-01'
        |      AND CAST(o.o_orderdate AS DATE) < DATE '1995-04-01'
        |      THEN 1 ELSE 0 END AS m2,
        |    CASE WHEN c.c_nationkey = 7 THEN 1 ELSE 0 END AS m3,
        |    CASE WHEN c.c_nationkey = 7
        |      AND strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') = '1995-06'
        |      THEN 1 ELSE 0 END AS m4,
        |    1 AS m5
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |fan0 AS (
        |  SELECT unnest([
        |    {'spec': 'day', 'pkey': CAST(day AS VARCHAR)},
        |    {'spec': 'month', 'pkey': mon},
        |    {'spec': 'nation', 'pkey': CAST(nk AS VARCHAR)},
        |    {'spec': 'month_nation', 'pkey': mon || ':' || CAST(nk AS VARCHAR)}])
        |    AS u,
        |    m1, m2, m3, m4, m5
        |  FROM rows_),
        |parts AS (
        |  SELECT u.spec AS spec, u.pkey AS pkey,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    max(m1) AS q1, max(m2) AS q2, max(m3) AS q3, max(m4) AS q4,
        |    max(m5) AS q5
        |  FROM fan0 GROUP BY 1, 2),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rows_),
        |fan2 AS (
        |  SELECT spec, n_rows,
        |    unnest([{'q': 'q1_day', 'hit': q1}, {'q': 'q2_quarter', 'hit': q2},
        |      {'q': 'q3_nation', 'hit': q3}, {'q': 'q4_nation_month', 'hit': q4},
        |      {'q': 'q5_full', 'hit': q5}]) AS w
        |  FROM parts),
        |agg AS (
        |  SELECT spec, w.q AS query,
        |    CAST(sum(CASE WHEN w.hit = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS partitions_scanned,
        |    CAST(sum(CASE WHEN w.hit = 1 THEN n_rows ELSE 0 END) AS BIGINT)
        |      AS rows_scanned
        |  FROM fan2 GROUP BY 1, 2),
        |meta AS (
        |  SELECT spec, CAST(count(*) AS BIGINT) AS n_partitions,
        |    CAST(count(*) FILTER (WHERE n_rows < 100) AS BIGINT) AS small_parts
        |  FROM parts GROUP BY 1)
        |SELECT a.spec, a.query, m.n_partitions, m.small_parts,
        |  a.partitions_scanned, a.rows_scanned,
        |  CAST(a.rows_scanned * 1000 // t.n AS BIGINT) AS scan_frac_permille
        |FROM agg a JOIN meta m ON m.spec = a.spec CROSS JOIN tot t
        |ORDER BY a.spec, a.query""".stripMargin) { (s, d) =>
      val rows = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("o_orderdate").cast("date").as("day"),
          date_format(col("o_orderdate"), "yyyy-MM").as("mon"),
          col("c_nationkey").as("nk"))
        .withColumn("m1",
          when(col("day") === to_date(lit("1995-06-15")), 1).otherwise(0))
        .withColumn("m2", when(col("day") >= to_date(lit("1995-01-01"))
          && col("day") < to_date(lit("1995-04-01")), 1).otherwise(0))
        .withColumn("m3", when(col("nk") === 7, 1).otherwise(0))
        .withColumn("m4",
          when(col("nk") === 7 && col("mon") === "1995-06", 1).otherwise(0))
        .withColumn("m5", lit(1))
      val fan = rows.select(explode(array(
        struct(lit("day").as("spec"), col("day").cast("string").as("pkey")),
        struct(lit("month").as("spec"), col("mon").as("pkey")),
        struct(lit("nation").as("spec"), col("nk").cast("string").as("pkey")),
        struct(lit("month_nation").as("spec"),
          concat(col("mon"), lit(":"), col("nk").cast("string")).as("pkey"))))
        .as("u"), col("m1"), col("m2"), col("m3"), col("m4"), col("m5"))
      val parts = fan.groupBy(col("u.spec").as("spec"), col("u.pkey").as("pkey"))
        .agg(count(lit(1)).cast("long").as("n_rows"),
          max(col("m1")).as("q1"), max(col("m2")).as("q2"),
          max(col("m3")).as("q3"), max(col("m4")).as("q4"),
          max(col("m5")).as("q5"))
        .localCheckpoint(true) // per-query costs + spec metadata share it
      val tot = rows.agg(count(lit(1)).cast("long").as("n"))
      val fan2 = parts.select(col("spec"), col("n_rows"), explode(array(
        struct(lit("q1_day").as("q"), col("q1").as("hit")),
        struct(lit("q2_quarter").as("q"), col("q2").as("hit")),
        struct(lit("q3_nation").as("q"), col("q3").as("hit")),
        struct(lit("q4_nation_month").as("q"), col("q4").as("hit")),
        struct(lit("q5_full").as("q"), col("q5").as("hit")))).as("w"))
      val agg = fan2.groupBy(col("spec"), col("w.q").as("query"))
        .agg(sum(when(col("w.hit") === 1, 1).otherwise(0)).cast("long")
          .as("partitions_scanned"),
          sum(when(col("w.hit") === 1, col("n_rows")).otherwise(0L))
            .cast("long").as("rows_scanned"))
      val meta = parts.groupBy(col("spec"))
        .agg(count(lit(1)).cast("long").as("n_partitions"),
          count(when(col("n_rows") < 100, 1)).cast("long").as("small_parts"))
      agg.join(meta, Seq("spec")).crossJoin(broadcast(tot))
        .select(col("spec"), col("query"), col("n_partitions"),
          col("small_parts"), col("partitions_scanned"), col("rows_scanned"),
          expr("rows_scanned * 1000 div n").cast("long")
            .as("scan_frac_permille"))
        .orderBy(col("spec"), col("query"))
    },

    // ---- A196: Borda and Copeland rank aggregation --------------------------------
    // Four single-metric rankings of the 25 nations (revenue, order
    // count, customer count, average order value) rarely agree; social
    // choice gives two canonical consensus rules. Borda sums (n − rank)
    // across metrics; Copeland scores pairwise majorities (2 points a
    // win, 1 a tie) over the 300 nation pairs. All ranking windows are
    // bounded by the nation count; the pairwise table is a 625-row
    // self-join of a broadcast aggregate.
    QueryDef.sql(
      "a196_borda_copeland",
      """WITH m AS (
        |  SELECT c.c_nationkey AS nk,
        |    CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_cust
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1),
        |r AS (
        |  SELECT nk,
        |    row_number() OVER (ORDER BY rev DESC, nk ASC) AS r_rev,
        |    row_number() OVER (ORDER BY n_orders DESC, nk ASC) AS r_ord,
        |    row_number() OVER (ORDER BY n_cust DESC, nk ASC) AS r_cust,
        |    row_number() OVER (ORDER BY rev * 1000000 // n_orders DESC, nk ASC)
        |      AS r_avg,
        |    count(*) OVER () AS nn
        |  FROM m),
        |cope AS (
        |  SELECT a.nk,
        |    CAST(sum(CASE WHEN
        |        (CASE WHEN a.r_rev < b.r_rev THEN 1 ELSE 0 END)
        |      + (CASE WHEN a.r_ord < b.r_ord THEN 1 ELSE 0 END)
        |      + (CASE WHEN a.r_cust < b.r_cust THEN 1 ELSE 0 END)
        |      + (CASE WHEN a.r_avg < b.r_avg THEN 1 ELSE 0 END) > 2
        |      THEN 2 WHEN
        |        (CASE WHEN a.r_rev < b.r_rev THEN 1 ELSE 0 END)
        |      + (CASE WHEN a.r_ord < b.r_ord THEN 1 ELSE 0 END)
        |      + (CASE WHEN a.r_cust < b.r_cust THEN 1 ELSE 0 END)
        |      + (CASE WHEN a.r_avg < b.r_avg THEN 1 ELSE 0 END) = 2
        |      THEN 1 ELSE 0 END) AS BIGINT) AS copeland_halves
        |  FROM r a JOIN r b ON b.nk <> a.nk
        |  GROUP BY 1)
        |SELECT n.n_name AS nation,
        |  CAST(r.r_rev AS BIGINT) AS r_rev, CAST(r.r_ord AS BIGINT) AS r_ord,
        |  CAST(r.r_cust AS BIGINT) AS r_cust, CAST(r.r_avg AS BIGINT) AS r_avg,
        |  CAST(4 * r.nn - r.r_rev - r.r_ord - r.r_cust - r.r_avg AS BIGINT)
        |    AS borda,
        |  c.copeland_halves
        |FROM r JOIN cope c ON c.nk = r.nk
        |JOIN nation n ON n.n_nationkey = r.nk
        |ORDER BY nation""".stripMargin) { (s, d) =>
      val m = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey").as("nk"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).cast("long")
          .as("rev"),
          count(lit(1)).cast("long").as("n_orders"),
          countDistinct(col("c_custkey")).cast("long").as("n_cust"))
      val r = m.select(col("nk"),
        row_number().over(Window.orderBy(col("rev").desc, col("nk").asc))
          .as("r_rev"), // 25-row aggregate: windows bounded by nation count
        row_number().over(Window.orderBy(col("n_orders").desc, col("nk").asc))
          .as("r_ord"),
        row_number().over(Window.orderBy(col("n_cust").desc, col("nk").asc))
          .as("r_cust"),
        row_number().over(Window.orderBy(
          expr("rev * 1000000 div n_orders").desc, col("nk").asc)).as("r_avg"),
        count(lit(1)).over(Window.partitionBy()).as("nn"))
        .localCheckpoint(true) // self-joined for Copeland
      val wins = expr(
        """(case when a.r_rev < b.r_rev then 1 else 0 end)
          | + (case when a.r_ord < b.r_ord then 1 else 0 end)
          | + (case when a.r_cust < b.r_cust then 1 else 0 end)
          | + (case when a.r_avg < b.r_avg then 1 else 0 end)""".stripMargin)
      // broadcast the 25-row side explicitly: r roots in a
      // localCheckpoint (no size stats), so the non-equi self-join
      // would otherwise plan as CartesianProduct instead of a bounded
      // BNLJ
      val cope = r.as("a").join(broadcast(r.as("b")), col("b.nk") =!= col("a.nk"))
        .groupBy(col("a.nk").as("nk"))
        .agg(sum(when(wins > 2, 2).when(wins === 2, 1).otherwise(0))
          .cast("long").as("copeland_halves"))
      r.join(cope, Seq("nk"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))),
          Seq("nk"))
        .select(col("nation"), col("r_rev").cast("long").as("r_rev"),
          col("r_ord").cast("long").as("r_ord"),
          col("r_cust").cast("long").as("r_cust"),
          col("r_avg").cast("long").as("r_avg"),
          expr("4 * nn - r_rev - r_ord - r_cust - r_avg").cast("long")
            .as("borda"),
          col("copeland_halves"))
        .orderBy(col("nation"))
    }
  )
}
