package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Hundred-sixth frontier batch: bounded-hop betweenness centrality,
  * delete-1 jackknife error bars for a ratio estimator, and a log2-bin
  * quantile sketch audited against exact order statistics.
  */
object Frontier106Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A170: bounded-hop betweenness centrality ------------------------------
    // Brandes-style betweenness restricted to shortest paths of length
    // <= 3 on the thresholded nation trade graph (top half of flows by
    // cents, ties broken on keys, so the graph is deterministic).
    // Shortest-path COUNTS come from integer matrix powers — sigma_d =
    // A^d masked to pairs whose distance is exactly d — and each
    // interior node's credit is sigma(s,v)*sigma(v,t)/sigma(s,t),
    // quantized to micro-units with one integral division per (s,t,v)
    // triple. No per-node BFS: three self-joins of a 25-node adjacency
    // list compute every path count at once.
    QueryDef.sql(
      "a170_betweenness",
      """WITH flow AS (
        |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE s.s_nationkey <> c.c_nationkey
        |  GROUP BY 1, 2),
        |ranked AS MATERIALIZED (
        |  SELECT src, dst,
        |    row_number() OVER (ORDER BY cents DESC, src, dst) AS rk,
        |    CAST((SELECT count(*) FROM flow) AS BIGINT) AS m
        |  FROM flow),
        |e AS MATERIALIZED (SELECT src AS u, dst AS v FROM ranked WHERE rk <= m // 4),
        |a2 AS MATERIALIZED (
        |  SELECT e1.u AS u, e2.v AS v, CAST(count(*) AS BIGINT) AS paths
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |  WHERE e1.u <> e2.v
        |  GROUP BY 1, 2),
        |a3 AS MATERIALIZED (
        |  SELECT a.u AS u, e.v AS v, CAST(sum(a.paths) AS BIGINT) AS paths
        |  FROM a2 a JOIN e ON e.u = a.v
        |  WHERE a.u <> e.v
        |  GROUP BY 1, 2),
        |sig AS MATERIALIZED (
        |  SELECT u, v, 1 AS d, CAST(1 AS BIGINT) AS sigma FROM e
        |  UNION ALL
        |  SELECT a2.u, a2.v, 2, a2.paths FROM a2
        |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = a2.u AND e.v = a2.v)
        |  UNION ALL
        |  SELECT a3.u, a3.v, 3, a3.paths FROM a3
        |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = a3.u AND e.v = a3.v)
        |    AND NOT EXISTS (SELECT 1 FROM a2 WHERE a2.u = a3.u AND a2.v = a3.v)),
        |credit AS (
        |  SELECT l.v AS node,
        |    CAST(sum(l.sigma * r.sigma * 1000000 // st.sigma) AS BIGINT)
        |      AS bc_micro
        |  FROM sig l
        |  JOIN sig r ON r.u = l.v
        |  JOIN sig st ON st.u = l.u AND st.v = r.v
        |    AND st.d = l.d + r.d
        |  WHERE l.v <> st.u AND l.v <> st.v
        |  GROUP BY 1)
        |SELECT n.n_name, c.bc_micro
        |FROM credit c JOIN nation n ON n.n_nationkey = c.node
        |WHERE c.bc_micro > 0
        |ORDER BY n_name""".stripMargin) { (s, d) =>
      val flow = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).cast("long")
          .as("cents"))
        .localCheckpoint(true) // tiny (<= n^2 rows); rank + count read it
      // Top quarter of flows by weight: nation-pair adjacency is bounded
      // by n^2 = 625 rows, so the unpartitioned rank window is over an
      // aggregate, not data.
      val m = flow.agg(count(lit(1)).cast("long").as("m"))
      val e = flow
        .withColumn("rk", row_number().over(
          Window.orderBy(col("cents").desc, col("src"), col("dst"))))
        .crossJoin(broadcast(m))
        .filter(col("rk") <= expr("m div 4"))
        .select(col("src").as("u"), col("dst").as("v"))
        .localCheckpoint(true) // feeds three matrix powers + masks
      val a2 = e.as("e1").join(e.as("e2"), col("e2.u") === col("e1.v"))
        .filter(col("e1.u") =!= col("e2.v"))
        .groupBy(col("e1.u").as("u"), col("e2.v").as("v"))
        .agg(count(lit(1)).cast("long").as("paths"))
      val a3 = a2.as("a").join(e.as("e3"), col("e3.u") === col("a.v"))
        .filter(col("a.u") =!= col("e3.v"))
        .groupBy(col("a.u").as("u"), col("e3.v").as("v"))
        .agg(sum(col("a.paths")).cast("long").as("paths"))
      val s1 = e.select(col("u"), col("v"), lit(1).as("d"),
        lit(1L).as("sigma"))
      val s2 = a2.join(e.withColumnRenamed("u", "eu").withColumnRenamed("v", "ev"),
          col("eu") === col("u") && col("ev") === col("v"), "left_anti")
        .select(col("u"), col("v"), lit(2).as("d"), col("paths").as("sigma"))
      val s12 = s1.unionByName(s2)
      val s3 = a3.join(s12.select(col("u").as("pu"), col("v").as("pv")),
          col("pu") === col("u") && col("pv") === col("v"), "left_anti")
        .select(col("u"), col("v"), lit(3).as("d"), col("paths").as("sigma"))
      val sig = s12.unionByName(s3).localCheckpoint(true)
      val lhs = sig.select(col("u").as("ls"), col("v").as("node"),
        col("d").as("ld"), col("sigma").as("lsig"))
      val rhs = sig.select(col("u").as("rnode"), col("v").as("rt"),
        col("d").as("rd"), col("sigma").as("rsig"))
      val credit = lhs.join(rhs, col("rnode") === col("node"))
        .join(sig.select(col("u").as("ss"), col("v").as("st"),
          col("d").as("sd"), col("sigma").as("ssig")),
          col("ss") === col("ls") && col("st") === col("rt") &&
            col("sd") === col("ld") + col("rd"))
        .filter(col("node") =!= col("ss") && col("node") =!= col("st"))
        .groupBy(col("node"))
        .agg(sum(expr("lsig * rsig * 1000000 div ssig")).cast("long")
          .as("bc_micro"))
      credit.filter(col("bc_micro") > 0)
        .join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("node"))
        .select(col("n_name"), col("bc_micro"))
        .orderBy(col("n_name"))
    },

    // ---- A171: delete-1 jackknife for a ratio estimator ------------------------
    // Error bars for revenue-per-unit (a RATIO of two sums, where the
    // textbook s^2/n formula does not apply) by the jackknife: each
    // row's leave-one-out ratio theta_(i) = (Sy - y_i)/(Sx - x_i) is
    // computed in closed form from the broadcast group totals — one
    // scan, no n-fold recomputation — quantized to milli-units, and
    // SE^2_jack = (n-1)/n * sum (theta_(i) - mean)^2 folds into exact
    // integer moments (DECIMAL sums of t and t^2).
    QueryDef.sql(
      "a171_jackknife_ratio",
      """WITH x AS (
        |  SELECT s.s_nationkey AS nk,
        |    CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS y,
        |    CAST(floor(l.l_quantity) AS BIGINT) AS xq
        |  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        |tot AS (
        |  SELECT nk, CAST(sum(y) AS BIGINT) AS sy, CAST(sum(xq) AS BIGINT)
        |    AS sx, CAST(count(*) AS BIGINT) AS n
        |  FROM x GROUP BY 1),
        |t AS (
        |  SELECT x.nk, (tot.sy - x.y) * 1000 // (tot.sx - x.xq) AS t
        |  FROM x JOIN tot ON tot.nk = x.nk),
        |mom AS (
        |  SELECT nk, CAST(count(*) AS BIGINT) AS n,
        |    sum(t) AS s1, sum(t * t) AS s2
        |  FROM t GROUP BY 1)
        |SELECT nn.n_name, mom.n AS n_items,
        |  CAST(tot.sy * 1000 // tot.sx AS BIGINT) AS theta_milli,
        |  CAST((mom.n - 1) * (mom.n * mom.s2 - mom.s1 * mom.s1)
        |    // (mom.n * mom.n * mom.n) AS BIGINT) AS jack_se2_milli2
        |FROM mom JOIN tot ON tot.nk = mom.nk
        |JOIN nation nn ON nn.n_nationkey = mom.nk
        |ORDER BY n_name""".stripMargin) { (s, d) =>
      val x = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("nk"),
          floor(col("l_extendedprice") * 100).cast("long").as("y"),
          floor(col("l_quantity")).cast("long").as("xq"))
      val tot = x.groupBy(col("nk"))
        .agg(sum(col("y")).cast("long").as("sy"),
          sum(col("xq")).cast("long").as("sx"),
          count(lit(1)).cast("long").as("n"))
      val t = x.join(broadcast(tot), Seq("nk"))
        .select(col("nk"),
          expr("(sy - y) * 1000 div (sx - xq)").as("t"))
      val mom = t.groupBy(col("nk"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("t").cast(DecimalType(38, 0))).as("s1"),
          sum((col("t") * col("t")).cast(DecimalType(38, 0))).as("s2"))
      mom.join(broadcast(tot.select(col("nk"), col("sy"), col("sx"))), Seq("nk"))
        .join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("nk"))
        .select(col("n_name"), col("n").as("n_items"),
          expr("sy * 1000 div sx").cast("long").as("theta_milli"),
          expr("((n - 1) * (n * s2 - s1 * s1)) div (n * n * n)").cast("long")
            .as("jack_se2_milli2"))
        .orderBy(col("n_name"))
    },

    // ---- U81: log2-bin quantile sketch with exact error audit ------------------
    // A DDSketch-flavoured quantile sketch with gamma = 2: every value
    // lands in bucket bit_length(cents+1), a pure integer computed as
    // length(bin(x)) in BOTH engines (no floating log2 at bucket
    // boundaries). The sketch answers p50/p90/p99 per event type from
    // the bucket histogram's cumulative counts (the window runs over
    // <= 64 buckets per group); the audit joins back the EXACT
    // discrete quantile and reports the relative error, which the
    // bucket geometry bounds at 1000 permille.
    QueryDef.sql(
      "u81_quantile_sketch",
      """WITH v AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100) AS BIGINT) + 1 AS cents
        |  FROM events),
        |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |      FROM v GROUP BY 1),
        |hist AS (
        |  SELECT event_type, CAST(length(bin(cents)) AS INT) AS b,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM v GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, b, cnt,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY b) AS cum
        |  FROM hist),
        |qs AS (SELECT unnest([500, 900, 990]) AS q_permille),
        |targets AS (
        |  SELECT n.event_type, qs.q_permille,
        |    (n.n * qs.q_permille + 999) // 1000 AS target, n.n
        |  FROM n CROSS JOIN qs),
        |sk AS (
        |  SELECT t.event_type, t.q_permille,
        |    min(c.b) AS qbin
        |  FROM targets t JOIN cum c ON c.event_type = t.event_type
        |    AND c.cum >= t.target
        |  GROUP BY 1, 2),
        |exact AS (
        |  SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rk
        |  FROM v),
        |ex AS (
        |  SELECT t.event_type, t.q_permille, e.cents AS exact_cents
        |  FROM targets t JOIN exact e ON e.event_type = t.event_type
        |    AND e.rk = t.target)
        |SELECT sk.event_type, CAST(sk.q_permille AS INT) AS q_permille,
        |  CAST(ex.exact_cents AS BIGINT) AS exact_cents,
        |  CAST(((CAST(1 AS BIGINT) << sk.qbin)
        |    + (CAST(1 AS BIGINT) << (sk.qbin - 1))) // 2 AS BIGINT)
        |    AS sketch_cents,
        |  CAST(abs(((CAST(1 AS BIGINT) << sk.qbin)
        |    + (CAST(1 AS BIGINT) << (sk.qbin - 1))) // 2 - ex.exact_cents)
        |    * 1000 // ex.exact_cents AS BIGINT) AS rel_err_permille
        |FROM sk JOIN ex ON ex.event_type = sk.event_type
        |  AND ex.q_permille = sk.q_permille
        |ORDER BY sk.event_type, sk.q_permille""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .select(col("event_type"),
          (floor(col("value") * 100).cast("long") + 1).as("cents"))
        .localCheckpoint(true) // histogram, counts and exact ranks read it
      val n = v.groupBy(col("event_type")).agg(count(lit(1)).cast("long").as("n"))
      val hist = v.groupBy(col("event_type"),
          length(bin(col("cents"))).cast("int").as("b"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      val cum = hist.withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("event_type")).orderBy(col("b"))))
      val qs = s.range(0, 3).select(
        element_at(array(lit(500), lit(900), lit(990)), col("id").cast("int") + 1)
          .as("q_permille"))
      val targets = n.crossJoin(broadcast(qs))
        .select(col("event_type"), col("q_permille"),
          expr("(n * q_permille + 999) div 1000").as("target"), col("n"))
      val sk = targets.join(cum.withColumnRenamed("event_type", "ce"),
          col("ce") === col("event_type") && col("cum") >= col("target"))
        .groupBy(col("event_type"), col("q_permille"))
        .agg(min(col("b")).as("qbin"))
      val exact = v.withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("cents"))))
      val ex = targets.join(exact.withColumnRenamed("event_type", "ee"),
          col("ee") === col("event_type") && col("rk") === col("target"))
        .select(col("event_type"), col("q_permille"),
          col("cents").as("exact_cents"))
      sk.join(ex, Seq("event_type", "q_permille"))
        .select(col("event_type"), col("q_permille").cast("int").as("q_permille"),
          col("exact_cents").cast("long").as("exact_cents"),
          expr("cast((shiftleft(cast(1 as bigint), qbin) + " +
            "shiftleft(cast(1 as bigint), qbin - 1)) div 2 as bigint)")
            .as("sketch_cents"),
          expr("cast(abs((shiftleft(cast(1 as bigint), qbin) + " +
            "shiftleft(cast(1 as bigint), qbin - 1)) div 2 - exact_cents) " +
            "* 1000 div exact_cents as bigint)").as("rel_err_permille"))
        .orderBy(col("event_type"), col("q_permille"))
    }
  )
}
