package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Eightieth frontier batch: k-center coreset selection, weighted
  * shortest paths, semi-join reduction certification.
  */
object Frontier80Queries {

  // squared L2 between quantized BIGINT coordinate lists (DuckDB side)
  private def dd(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 65), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), (x, y) -> x + y)"

  /** Eight unrolled greedy rounds: each round's CTE picks the point
    * farthest from the chosen set (ORDER BY md DESC, vec_id LIMIT 1),
    * then relaxes every point's min-distance against it.
    */
  private val kcenterOracle: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (SELECT vec_id, list_transform(range(1, 65),
      |    i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)) AS q
      |  FROM embeddings),
      |c1 AS (SELECT vec_id AS cid, q FROM e ORDER BY vec_id LIMIT 1),
      |p1 AS (SELECT e.vec_id, e.q, ${dd("e.q", "c1.q")} AS md
      |  FROM e CROSS JOIN c1),
      |r1 AS (SELECT 1 AS rnd, (SELECT cid FROM c1) AS center_id,
      |  max(md) AS radius_sq FROM p1)""".stripMargin
    for (r <- 2 to 8) {
      val p = r - 1
      sb ++= s""",
        |c$r AS (SELECT vec_id AS cid, q FROM p$p ORDER BY md DESC, vec_id LIMIT 1),
        |p$r AS (SELECT p.vec_id, p.q, least(p.md, ${dd("p.q", s"c$r.q")}) AS md
        |  FROM p$p p CROSS JOIN c$r),
        |r$r AS (SELECT $r AS rnd, (SELECT cid FROM c$r) AS center_id,
        |  max(md) AS radius_sq FROM p$r)""".stripMargin
    }
    sb ++= "\nSELECT CAST(rnd AS INT) AS sel_round, CAST(center_id AS BIGINT) AS center_id, "
    sb ++= "CAST(radius_sq AS BIGINT) AS radius_sq FROM ("
    sb ++= (1 to 8).map(r => s"SELECT * FROM r$r").mkString(" UNION ALL ")
    sb ++= ") ORDER BY sel_round"
    sb.toString
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- V49: greedy k-center coreset selection -------------------------------
    // Diversity-first data selection: the Gonzalez greedy 2-approximation
    // for k-center, picking 8 maximally-spread embeddings — the coreset /
    // seed-selection primitive a curation pipeline uses to cover an
    // embedding space with a fixed labeling budget. Coordinates are
    // quantized to integer micro-units so every distance, argmax, and
    // covering radius is exact integer arithmetic — a greedy ITERATIVE
    // selection under the hash gate. Each round is one broadcast of a
    // single center row against the point set (never a shuffle of the
    // corpus), with per-round localCheckpoint lineage truncation —
    // the d7/PageRank posture, so the loop survives 100× the points.
    QueryDef.sql("v49_kcenter_coreset", kcenterOracle) { (s, d) =>
      def d2(a: Column, b: Column): Column = {
        val pair = zip_with(a, b, (x, y) => (x - y) * (x - y))
        aggregate(pair, lit(0L), (acc, v) => acc + v)
      }
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * lit(1e6)).cast("long")).as("q"))
        .localCheckpoint(true) // 8 greedy rounds re-read the quantized points
      var cent = e.orderBy(col("vec_id")).limit(1)
        .select(col("vec_id").as("cid"), col("q").as("cq"))
        .localCheckpoint(true)
      var pts = e.crossJoin(broadcast(cent.select(col("cq"))))
        .select(col("vec_id"), col("q"), d2(col("q"), col("cq")).as("md"))
        .localCheckpoint(true)
      def radiusRow(r: Int, c: DataFrame): DataFrame =
        pts.agg(max(col("md")).as("radius_sq"))
          .crossJoin(broadcast(c.select(col("cid").cast("long").as("center_id"))))
          .select(lit(r).cast("int").as("sel_round"), col("center_id"),
            col("radius_sq").cast("long").as("radius_sq"))
      var rows = Seq(radiusRow(1, cent))
      for (r <- 2 to 8) {
        cent = pts.orderBy(col("md").desc, col("vec_id")).limit(1)
          .select(col("vec_id").as("cid"), col("q").as("cq"))
          .localCheckpoint(true) // used by both the relax pass and the ledger row
        pts = pts.crossJoin(broadcast(cent.select(col("cq"))))
          .select(col("vec_id"), col("q"),
            least(col("md"), d2(col("q"), col("cq"))).as("md"))
          .localCheckpoint(true)
        rows = rows :+ radiusRow(r, cent)
      }
      rows.reduce(_ unionByName _).orderBy(col("sel_round"))
    },

    // ---- A140: weighted shortest paths (Bellman-Ford, min-plus) ---------------
    // Cheapest trade route between nations: edges are (customer nation →
    // supplier nation) with the MINIMUM observed line-item price in
    // cents — derived from the full fact table in one shuffle — then
    // four Bellman-Ford relaxation rounds from nation 0 in the integer
    // min-plus semiring. The distance table is one row per nation, so
    // every relaxation is a broadcast join against the (tiny, pinned)
    // edge list; the oracle walks all ≤4-hop paths with a recursive
    // CTE. Iterative weighted graph traversal, bit-exact cross-engine.
    QueryDef.sql(
      "a140_weighted_sssp",
      """WITH RECURSIVE edges AS (
        |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
        |    CAST(min(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  GROUP BY 1, 2),
        |paths(node, cost, depth) AS (
        |  SELECT CAST(0 AS INT), CAST(0 AS BIGINT), 0
        |  UNION ALL
        |  SELECT e.dst, p.cost + e.w, p.depth + 1
        |  FROM paths p JOIN edges e ON e.src = p.node
        |  WHERE p.depth < 4)
        |SELECT CAST(node AS INT) AS node, CAST(min(cost) AS BIGINT) AS cost_cents
        |FROM paths GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val edges = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").as("src"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey").as("dst"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("src"), col("dst"))
        .agg(min(col("cents")).cast("long").as("w"))
        .localCheckpoint(true) // nations² edges, re-read every relaxation round
      var dist: DataFrame = {
        import s.implicits._
        Seq((0, 0L)).toDF("node", "cost")
      }
      for (_ <- 1 to 4) {
        val relaxed = edges.join(broadcast(dist), col("src") === col("node"))
          .select(col("dst").as("node"), (col("cost") + col("w")).as("cost"))
        dist = dist.unionByName(relaxed)
          .groupBy(col("node")).agg(min(col("cost")).as("cost"))
          .localCheckpoint(true)
      }
      dist.select(col("node").cast("int").as("node"),
          col("cost").cast("long").as("cost_cents"))
        .orderBy(col("node"))
    },

    // ---- Q33: semi-join reduction certification -------------------------------
    // The classic distributed rewrite (SDD-1): instead of shipping the
    // full fact table into a 3-way join, ship only the qualifying ORDER
    // KEYS to the fact — a broadcast LEFT SEMI prune — and join the
    // already-reduced fact back to the (broadcast) dimension for its
    // attributes. The registered plan IS the reduced one: the fact is
    // never shuffled (both joins broadcast; only the final 5-group agg
    // exchanges), while the oracle states the naive join-then-filter
    // formulation — the hash gate certifies the rewrite.
    QueryDef.sql(
      "q33_semi_join_reduction",
      """SELECT o.o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val custKeys = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ordKeys = Tables.orders(s, d)
        .join(broadcast(custKeys), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_orderpriority"))
        .localCheckpoint(true) // computed once: prunes the fact AND carries attrs
      Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long").as("cents"))
        .join(broadcast(ordKeys.select(col("o_orderkey"))),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .join(broadcast(ordKeys), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("cents")).cast("long").as("revenue_cents"))
        .orderBy(col("o_orderpriority"))
    }
  )
}
