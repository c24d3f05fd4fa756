package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Ninety-ninth frontier batch: three graph analyses the centrality
  * family (d7 PageRank, a48 HITS, a22 BFS, a29 k-core, a18/a45
  * triangles) was missing — synchronous label propagation, degree
  * assortativity, and modularity of a labeled partition. All three run
  * on the same co-purchase graph those queries use: parts linked when
  * they appear in >= 2 common orders.
  */
object Frontier99Queries {

  /** Undirected co-purchase edges, both orientations (so every node
    * appears as src and per-node aggregates need no union).
    */
  private def undirected(s: SparkSession, d: String): DataFrame = {
    // r6 opt: aggregate-before-join pair build (PairGraph, see a18)
    val e0 = graft.operators.PairGraph.groupPairs(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey")
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      .select(col("src"), col("dst"))
    e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  private val edgeCte =
    """op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e0 AS (
      |  SELECT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM op a JOIN op b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |und AS (
      |  SELECT src, dst FROM e0
      |  UNION ALL SELECT dst, src FROM e0)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- A160: synchronous label propagation (3 rounds) -----------------------
    // Community detection without a modularity objective: every node
    // starts as its own community and repeatedly adopts the label most
    // common among its neighbors (ties to the smallest label — that
    // tie-break is what makes synchronous LPA deterministic and
    // therefore hash-checkable, where the usual randomized-order LPA
    // is not). Three unrolled rounds; the readout is the ten largest
    // communities. Per round: one shuffle join of the edge list with
    // the (small) label table + one partial-agg argmax — the d7 loop
    // shape, localCheckpointed so lineage stays flat.
    QueryDef.sql(
      "a160_label_propagation",
      s"""WITH $edgeCte,
        |l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM und),
        |c1 AS (
        |  SELECT u.src AS id, l.lbl, CAST(count(*) AS BIGINT) AS cnt
        |  FROM und u JOIN l0 l ON u.dst = l.id GROUP BY 1, 2),
        |l1 AS (
        |  SELECT id, lbl FROM (
        |    SELECT id, lbl,
        |      row_number() OVER (PARTITION BY id ORDER BY cnt DESC, lbl) AS rn
        |    FROM c1) WHERE rn = 1),
        |c2 AS (
        |  SELECT u.src AS id, l.lbl, CAST(count(*) AS BIGINT) AS cnt
        |  FROM und u JOIN l1 l ON u.dst = l.id GROUP BY 1, 2),
        |l2 AS (
        |  SELECT id, lbl FROM (
        |    SELECT id, lbl,
        |      row_number() OVER (PARTITION BY id ORDER BY cnt DESC, lbl) AS rn
        |    FROM c2) WHERE rn = 1),
        |c3 AS (
        |  SELECT u.src AS id, l.lbl, CAST(count(*) AS BIGINT) AS cnt
        |  FROM und u JOIN l2 l ON u.dst = l.id GROUP BY 1, 2),
        |l3 AS (
        |  SELECT id, lbl FROM (
        |    SELECT id, lbl,
        |      row_number() OVER (PARTITION BY id ORDER BY cnt DESC, lbl) AS rn
        |    FROM c3) WHERE rn = 1)
        |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members
        |FROM l3 GROUP BY lbl
        |ORDER BY n_members DESC, community LIMIT 10""".stripMargin) { (s, d) =>
      val und = undirected(s, d).localCheckpoint(true) // read once per round
      var labels = und.select(col("src").as("id")).distinct()
        .withColumn("lbl", col("id"))
      // r6 (advice): the broadcast is now GATED on a measured bound
      // (PageRank's posture) instead of assumed — nodes ≤ edge rows, and
      // counting the checkpointed edge list is free of shuffles; above
      // the bound the per-round join degrades to the plain shuffle join.
      val hint: DataFrame => DataFrame =
        if (und.count() <= 4000000L) broadcast else identity
      for (_ <- 1 to 3) {
        // r5 opt: labels is one row per NODE (bounded by the part
        // count, ≪ edges) — broadcast it so the checkpointed edge list
        // is never shuffled per round (same posture as PageRank's
        // broadcastNodeLimit; a shuffle join is the >4M-node fallback).
        val counted = und
          .join(hint(labels.select(col("id").as("dst"), col("lbl"))), Seq("dst"))
          .groupBy(col("src").as("id"), col("lbl"))
          .agg(count(lit(1)).as("cnt"))
        // argmax by (cnt desc, lbl asc): max of struct(cnt, -lbl)
        labels = counted
          .groupBy(col("id"))
          .agg(max(struct(col("cnt"), (-col("lbl")).as("neg"))).as("m"))
          .select(col("id"), (-col("m.neg")).as("lbl"))
          .localCheckpoint(true)
      }
      labels.groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy(col("n_members").desc, col("community")).limit(10)
    },

    // ---- A167: degree assortativity -----------------------------------------
    // Do popular products co-sell with other popular products? The
    // degree-correlation coefficient over edge endpoints answers it.
    // Because the edge list carries both orientations, the two
    // endpoint-degree marginals are identical, the Pearson den is a
    // perfect square, and the square root cancels — r is a RATIO OF
    // INTEGERS (n*Sxy - Sx^2) / (n*Sxx - Sx^2), reported sign-aware in
    // micro units with DECIMAL(38,0) sums so hub-heavy graphs can't
    // overflow. One broadcast of the per-node degree table onto the
    // edges, one aggregate — no shuffle beyond the degree groupBy.
    QueryDef.sql(
      "a167_degree_assortativity",
      s"""WITH $edgeCte,
        |deg AS (
        |  SELECT src AS id, CAST(count(*) AS BIGINT) AS dg
        |  FROM und GROUP BY src),
        |ex AS (
        |  SELECT ds.dg AS x, dd.dg AS y
        |  FROM und u JOIN deg ds ON u.src = ds.id JOIN deg dd ON u.dst = dd.id),
        |mo AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx,
        |    CAST(sum(x * y) AS HUGEINT) AS sxy,
        |    CAST(sum(x * x) AS HUGEINT) AS sxx
        |  FROM ex),
        |rt AS (
        |  SELECT CAST(n AS BIGINT) AS n_endpoints,
        |    n * sxy - sx * sx AS num, n * sxx - sx * sx AS den
        |  FROM mo)
        |SELECT n_endpoints,
        |  CAST(CASE WHEN den = 0 THEN 0
        |    WHEN num >= 0 THEN (num * 1000000) // den
        |    ELSE -((-num * 1000000) // den) END AS BIGINT) AS assortativity_micro
        |FROM rt""".stripMargin) { (s, d) =>
      val und = undirected(s, d)
      val deg = und.groupBy(col("src").as("id"))
        .agg(count(lit(1)).cast("long").as("dg"))
      val ex = und
        .join(broadcast(deg.select(col("id").as("src"), col("dg").as("x"))),
          Seq("src"))
        .join(broadcast(deg.select(col("id").as("dst"), col("dg").as("y"))),
          Seq("dst"))
      ex.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).cast("decimal(38,0)").as("sx"),
          sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"),
          sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"))
        .select(col("n").cast("long").as("n_endpoints"),
          (col("n") * col("sxy") - col("sx") * col("sx")).as("num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
        .select(col("n_endpoints"),
          when(col("den") === 0, lit(0L))
            .otherwise(expr("""cast(case when num >= 0
              then (num * 1000000) div den
              else -(((-num) * 1000000) div den) end as bigint)"""))
            .cast("long").as("assortativity_micro"))
    },

    // ---- A168: modularity of the brand partition ------------------------------
    // How well do catalog brands explain the co-purchase structure?
    // Newman modularity of the partition-by-brand, exactly:
    // Q = sum_c (e_c/m - (d_c/2m)^2) put on the common denominator
    // 4m^2, so every community contributes the INTEGER 4m*e2_c - d_c^2
    // (e2_c counts both orientations of intra-brand edges) and
    // Q_micro is one sign-aware division at the end. Per-brand rows
    // expose which brands hold their customers together; the __total__
    // row is Q itself. Degrees broadcast onto edges; everything else
    // is two aggregates.
    QueryDef.sql(
      "a168_brand_modularity",
      s"""WITH $edgeCte,
        |lab AS (SELECT p_partkey AS id, p_brand AS community FROM part),
        |m AS (SELECT CAST(count(*) AS HUGEINT) // 2 AS m_edges FROM und),
        |dc AS (
        |  SELECT l.community, CAST(count(*) AS HUGEINT) AS d_c
        |  FROM und u JOIN lab l ON u.src = l.id GROUP BY 1),
        |ec AS (
        |  SELECT ls.community, CAST(count(*) AS HUGEINT) AS e2_c
        |  FROM und u JOIN lab ls ON u.src = ls.id JOIN lab ld ON u.dst = ld.id
        |  WHERE ls.community = ld.community GROUP BY 1),
        |contrib AS (
        |  SELECT dc.community,
        |    CAST(coalesce(ec.e2_c, 0) AS BIGINT) // 2 AS internal_edges,
        |    CAST(dc.d_c AS BIGINT) AS degree_sum,
        |    2 * (SELECT m_edges FROM m) * coalesce(ec.e2_c, 0) - dc.d_c * dc.d_c
        |      AS num
        |  FROM dc LEFT JOIN ec ON dc.community = ec.community),
        |den AS (SELECT 4 * m_edges * m_edges AS dd FROM m),
        |rows_ AS (
        |  SELECT community, internal_edges, degree_sum, num FROM contrib
        |  UNION ALL
        |  SELECT '__total__', CAST(sum(internal_edges) AS BIGINT),
        |    CAST(sum(degree_sum) AS BIGINT), sum(num)
        |  FROM contrib)
        |SELECT community, internal_edges, degree_sum,
        |  CAST(CASE WHEN num >= 0 THEN (num * 1000000) // dd
        |    ELSE -((-num * 1000000) // dd) END AS BIGINT) AS q_micro
        |FROM rows_, den ORDER BY community""".stripMargin) { (s, d) =>
      val und = undirected(s, d).localCheckpoint(true) // feeds m, dc and ec
      val lab = Tables.part(s, d)
        .select(col("p_partkey").as("id"), col("p_brand").as("community"))
      val mEdges = und.agg(expr("cast((count(1) div 2) as decimal(38,0))")
        .as("m_edges"))
      val srcLab = broadcast(lab.select(col("id").as("src"),
        col("community").as("c_src")))
      val dstLab = broadcast(lab.select(col("id").as("dst"),
        col("community").as("c_dst")))
      val dc = und.join(srcLab, Seq("src"))
        .groupBy(col("c_src").as("community"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("d_c"))
      val ec = und.join(srcLab, Seq("src")).join(dstLab, Seq("dst"))
        .filter(col("c_src") === col("c_dst"))
        .groupBy(col("c_src").as("community"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("e2_c"))
      val contrib = dc.join(ec, Seq("community"), "left")
        .crossJoin(broadcast(mEdges))
        .select(col("community"),
          expr("cast(coalesce(e2_c, 0) as bigint) div 2").as("internal_edges"),
          col("d_c").cast("long").as("degree_sum"),
          (lit(2) * col("m_edges") * coalesce(col("e2_c"), lit(0)) -
            col("d_c") * col("d_c")).cast("decimal(38,0)").as("num"))
        .localCheckpoint(true) // per-brand rows and the total row read it
      val total = contrib.agg(
          sum(col("internal_edges")).cast("long").as("internal_edges"),
          sum(col("degree_sum")).cast("long").as("degree_sum"),
          sum(col("num")).cast("decimal(38,0)").as("num"))
        .select(lit("__total__").as("community"), col("internal_edges"),
          col("degree_sum"), col("num"))
      contrib.unionByName(total)
        .crossJoin(broadcast(mEdges
          .select((lit(4) * col("m_edges") * col("m_edges"))
            .cast("decimal(38,0)").as("dd"))))
        .select(col("community"), col("internal_edges"), col("degree_sum"),
          expr("""cast(case when num >= 0 then (num * 1000000) div dd
            else -(((-num) * 1000000) div dd) end as bigint)""").as("q_micro"))
        .orderBy(col("community"))
    }
  )
}
