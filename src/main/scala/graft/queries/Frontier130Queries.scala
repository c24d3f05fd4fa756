package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-thirtieth frontier batch: the panel-data within estimator
  * (nation fixed effects) exposing omitted-variable bias against pooled
  * OLS, connected components of the mutual-kNN graph (operator
  * composition: exact quantized distances → kNN windows → the
  * DupComponents label propagator), and the dyad census of the trade
  * digraph.
  */
object Frontier130Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A202: within estimator vs pooled OLS (fixed effects) --------------------
    // Monthly panel (nation × month): revenue on order count. Pooled
    // OLS mixes between-nation and within-nation variation; the within
    // estimator demeans per nation — algebraically Σᵢ(nᵢΣxy − ΣxΣy)/nᵢ
    // over Σᵢ(nᵢΣx² − (Σx)²)/nᵢ, each group term cleared by ONE
    // truncating ×1000 division before summation. The bias column is
    // the textbook omitted-variable gap, measured. Two grouped
    // aggregations; no window at all.
    QueryDef.sql(
      "a202_within_estimator",
      """WITH panel AS (
        |  SELECT c.c_nationkey AS nk,
        |    strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS ym,
        |    CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2),
        |g AS (
        |  SELECT nk, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        |  FROM panel GROUP BY 1),
        |w AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(sum(n) AS BIGINT) AS n_obs,
        |    CAST(sum((n * sxy - sx * sy) * 1000 // n) AS HUGEINT) AS wnum,
        |    CAST(sum((n * sxx - sx * sx) * 1000 // n) AS HUGEINT) AS wden
        |  FROM g),
        |p AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS nn,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        |  FROM panel)
        |SELECT w.n_obs, w.n_groups,
        |  CAST((p.nn * p.sxy - p.sx * p.sy) * 1000
        |    // (p.nn * p.sxx - p.sx * p.sx) AS BIGINT) AS pooled_slope_milli,
        |  CAST(w.wnum * 1000 // w.wden AS BIGINT) AS within_slope_milli,
        |  CAST((p.nn * p.sxy - p.sx * p.sy) * 1000
        |      // (p.nn * p.sxx - p.sx * p.sx)
        |    - w.wnum * 1000 // w.wden AS BIGINT) AS bias_milli
        |FROM w CROSS JOIN p""".stripMargin) { (s, d) =>
      val panel = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey").as("nk"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).cast("long").as("x"),
          sum(floor(col("o_totalprice") * 100).cast("long")).cast("long")
            .as("y"))
        .localCheckpoint(true) // within + pooled aggregates share it
      val g = panel.groupBy(col("nk"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("x")).cast("decimal(38,0)").as("sx"),
          sum(col("y")).cast("decimal(38,0)").as("sy"),
          sum(col("x").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)")
            .as("sxy"),
          sum(col("x").cast("decimal(38,0)") * col("x")).cast("decimal(38,0)")
            .as("sxx"))
      val w = g.agg(count(lit(1)).cast("long").as("n_groups"),
        sum(col("n")).cast("long").as("n_obs"),
        sum(expr("(n * sxy - sx * sy) * 1000 div n")).cast("decimal(38,0)")
          .as("wnum"),
        sum(expr("(n * sxx - sx * sx) * 1000 div n")).cast("decimal(38,0)")
          .as("wden"))
      val p = panel.agg(count(lit(1)).cast("decimal(38,0)").as("nn"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)")
          .as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).cast("decimal(38,0)")
          .as("sxx"))
      w.crossJoin(broadcast(p))
        .select(col("n_obs"), col("n_groups"),
          expr("cast((nn * sxy - sx * sy) * 1000" +
            " div (nn * sxx - sx * sx) as bigint)").as("pooled_slope_milli"),
          expr("cast(wnum * 1000 div wden as bigint)").as("within_slope_milli"),
          expr("cast((nn * sxy - sx * sy) * 1000 div (nn * sxx - sx * sx)" +
            " - wnum * 1000 div wden as bigint)").as("bias_milli"))
    },

    // ---- V59: mutual-kNN graph connected components --------------------------------
    // The cluster skeleton ANN graphs are built on: exact quantized L2
    // over a hash-sampled corpus, k=5 neighbors per node (partitioned
    // windows), MUTUAL edges only, then the DupComponents broadcast
    // label propagator. The oracle recomputes the same components with
    // a recursive CTE — different algorithm, same labels. Output: the
    // component-size histogram plus the isolated-node count. The CTE
    // is LINEAR (one self-reference): the mutual edge list is
    // symmetrized into `edges` first, because DuckDB rejects a
    // recursive member that references the CTE twice (the r4 err row).
    QueryDef.sql(
      "v59_knn_components",
      """WITH RECURSIVE q AS (
        |  SELECT vec_id AS id,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
        |  FROM embeddings WHERE vec_id % 7 = 0),
        |dist AS (
        |  SELECT a.id AS ia, b.id AS ib,
        |    list_reduce(list_transform(range(1, len(a.v) + 1),
        |      i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])), (x, y) -> x + y)
        |      AS d2
        |  FROM q a JOIN q b ON b.id <> a.id),
        |knn AS (
        |  SELECT ia, ib FROM (
        |    SELECT ia, ib, row_number() OVER (PARTITION BY ia
        |      ORDER BY d2 ASC, ib ASC) AS rn
        |    FROM dist) WHERE rn <= 5),
        |mutual AS (
        |  SELECT least(k1.ia, k1.ib) AS a, greatest(k1.ia, k1.ib) AS b
        |  FROM knn k1 JOIN knn k2 ON k2.ia = k1.ib AND k2.ib = k1.ia
        |  WHERE k1.ia < k1.ib),
        |edges AS (
        |  SELECT a AS src, b AS dst FROM mutual
        |  UNION SELECT b AS src, a AS dst FROM mutual),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach AS (
        |  SELECT id, id AS lab FROM nodes
        |  UNION
        |  SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id, min(lab) AS comp FROM reach GROUP BY 1),
        |sizes AS (
        |  SELECT comp, CAST(count(*) AS BIGINT) AS sz FROM comp GROUP BY 1),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_components,
        |    CAST(sum(sz) AS BIGINT) AS n_connected FROM sizes),
        |sampled AS (SELECT CAST(count(*) AS BIGINT) AS n_sampled FROM q)
        |SELECT s.sz AS comp_size,
        |  CAST(count(*) AS BIGINT) AS n_comps,
        |  t.n_components, sa.n_sampled - t.n_connected AS isolated_nodes
        |FROM sizes s CROSS JOIN tot t CROSS JOIN sampled sa
        |GROUP BY 1, 3, 4 ORDER BY 1""".stripMargin) { (s, d) =>
      val q = Tables.embeddings(s, d).filter(col("vec_id") % 7 === 0)
        .select(col("vec_id").as("id"),
          expr("transform(embedding, x -> cast(floor(cast(x as double)" +
            " * 1000000) as bigint))").as("v"))
        .localCheckpoint(true)
      // r6 opt: the checkpointed sample is ONE partition, so the
      // all-pairs zip_with fold (n² 64-dim L2 rows, the query's real
      // compute) would run inside a single task. Spread the probe side
      // (guarded; build side stays broadcast) — per-row distances are
      // partition-invariant and the kNN window re-partitions by ia.
      val dist = broadcast(q.select(col("id").as("ia"), col("v").as("va")))
        .join(graft.operators.Spread.by(
            q.select(col("id").as("ib"), col("v").as("vb")), col("ib")),
          col("ib") =!= col("ia"))
        .select(col("ia"), col("ib"),
          expr("aggregate(zip_with(va, vb, (x, y) -> (x - y) * (x - y))," +
            " 0L, (a, b) -> a + b)").as("d2"))
      val knn = dist.withColumn("rn", row_number().over(
          Window.partitionBy(col("ia")).orderBy(col("d2").asc, col("ib").asc)))
        .filter(col("rn") <= 5).select(col("ia"), col("ib"))
        .localCheckpoint(true)
      val mutual = knn.as("k1")
        .join(knn.as("k2"), col("k2.ia") === col("k1.ib")
          && col("k2.ib") === col("k1.ia"))
        .filter(col("k1.ia") < col("k1.ib"))
        .select(col("k1.ia").as("id_a"), col("k1.ib").as("id_b"))
      val comp = graft.operators.DupComponents.components(s, mutual)
      val sizes = comp.groupBy(col("comp"))
        .agg(count(lit(1)).cast("long").as("sz"))
      val tot = sizes.agg(count(lit(1)).cast("long").as("n_components"),
        sum(col("sz")).cast("long").as("n_connected"))
      val sampled = q.agg(count(lit(1)).cast("long").as("n_sampled"))
      sizes.groupBy(col("sz").as("comp_size"))
        .agg(count(lit(1)).cast("long").as("n_comps"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(sampled))
        .select(col("comp_size"), col("n_comps"), col("n_components"),
          (col("n_sampled") - col("n_connected")).as("isolated_nodes"))
        .orderBy(col("comp_size"))
    },

    // ---- A203: dyad census and reciprocity of the trade digraph ---------------------
    // The top-3-partner digraph's dyads classified mutual / asymmetric
    // / null over all 300 nation pairs, with reciprocity 2M/(2M+A) —
    // the first-order structural signature next to a164's triads. One
    // aggregation over a self-joined 75-edge table.
    QueryDef.sql(
      "a203_dyad_census",
      """WITH tr AS (
        |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE s.s_nationkey <> c.c_nationkey
        |  GROUP BY 1, 2),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst, row_number() OVER (PARTITION BY src
        |      ORDER BY cents DESC, dst ASC) AS rn
        |    FROM tr) WHERE rn <= 3),
        |nn AS (SELECT CAST(count(DISTINCT n_nationkey) AS BIGINT) AS n
        |  FROM nation),
        |dy AS (
        |  SELECT least(a.src, a.dst) AS u, greatest(a.src, a.dst) AS v,
        |    CAST(count(*) AS BIGINT) AS arcs
        |  FROM e a GROUP BY 1, 2)
        |SELECT
        |  CAST(count(*) FILTER (WHERE arcs = 2) AS BIGINT) AS mutual,
        |  CAST(count(*) FILTER (WHERE arcs = 1) AS BIGINT) AS asymmetric,
        |  CAST(max(n.n) * (max(n.n) - 1) // 2
        |    - count(*) AS BIGINT) AS null_dyads,
        |  CAST(count(*) FILTER (WHERE arcs = 2) * 2000
        |    // greatest(count(*) FILTER (WHERE arcs = 2) * 2
        |      + count(*) FILTER (WHERE arcs = 1), 1) AS BIGINT)
        |    AS reciprocity_permille
        |FROM dy CROSS JOIN nn n""".stripMargin) { (s, d) =>
      val tr = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).cast("long")
          .as("cents"))
      val e = tr.withColumn("rn", row_number().over(
          Window.partitionBy(col("src"))
            .orderBy(col("cents").desc, col("dst").asc)))
        .filter(col("rn") <= 3).select(col("src"), col("dst"))
      val nn = Tables.nation(s, d)
        .agg(countDistinct(col("n_nationkey")).cast("long").as("n"))
      val dy = e.groupBy(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .agg(count(lit(1)).cast("long").as("arcs"))
      dy.crossJoin(broadcast(nn))
        .agg(count(when(col("arcs") === 2, 1)).cast("long").as("mutual"),
          count(when(col("arcs") === 1, 1)).cast("long").as("asymmetric"),
          expr("cast(max(n) * (max(n) - 1) div 2 - count(*) as bigint)")
            .as("null_dyads"),
          expr("""cast(count(case when arcs = 2 then 1 end) * 2000
            |  div greatest(count(case when arcs = 2 then 1 end) * 2
            |    + count(case when arcs = 1 then 1 end), 1) as bigint)
            |""".stripMargin).as("reciprocity_permille"))
    }
  )
}
