package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Twelfth frontier batch: global graph clustering coefficient and the
  * GDPR subject-access report (the read-side sibling of u15's
  * erasure audit).
  */
object Frontier12Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A45: global clustering coefficient --------------------------------
    // C = 3·triangles / open-triads over the part co-purchase graph
    // (a18/a22/a29's edge set). Triangles count by the oriented
    // two-hop join (each triangle once, a18's plan); triads are pure
    // degree arithmetic Σ d(d−1)/2 — one partial-agg shuffle. Both
    // counts exact integers; C is ONE division. Degrees come from the
    // symmetric edge list; the triangle join orients src<mid<dst so
    // no triangle is double-counted.
    QueryDef.sql(
      "a45_clustering_coeff",
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM op a JOIN op b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS d FROM (
        |    SELECT src AS id FROM e0 UNION ALL SELECT dst FROM e0)
        |  GROUP BY id),
        |tri AS (
        |  SELECT CAST(count(*) AS BIGINT) AS triangles
        |  FROM e0 ab JOIN e0 bc ON ab.dst = bc.src
        |             JOIN e0 ac ON ac.src = ab.src AND ac.dst = bc.dst),
        |tr AS (
        |  SELECT CAST(sum(d * (d - 1)) AS BIGINT) / 2 AS triads,
        |    CAST(count(*) AS BIGINT) AS n_nodes
        |  FROM deg)
        |SELECT n_nodes, triangles, CAST(triads AS BIGINT) AS triads,
        |  CASE WHEN triads = 0 THEN CAST(0.0 AS DOUBLE)
        |       ELSE CAST(3 * triangles AS DOUBLE) / CAST(triads AS DOUBLE) END
        |    AS clustering_coeff
        |FROM tri CROSS JOIN tr""".stripMargin) { (s, d) =>
      // r6 opt: aggregate-before-join pair build (PairGraph, see a18)
      val e0 = graft.operators.PairGraph.groupPairs(
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey")
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("m")).filter(col("m") >= 2)
        .select(col("src"), col("dst"))
        .localCheckpoint(true)
      val deg = e0.select(col("src").as("id"))
        .union(e0.select(col("dst").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("d"))
      val tri = e0.as("ab")
        .join(e0.as("bc"), col("ab.dst") === col("bc.src"))
        .join(e0.as("ac"), col("ac.src") === col("ab.src") &&
          col("ac.dst") === col("bc.dst"))
        .agg(count(lit(1)).as("triangles"))
      val tr = deg.agg(
        (sum(col("d") * (col("d") - 1)) / 2).cast("long").as("triads"),
        count(lit(1)).as("n_nodes"))
      tri.crossJoin(broadcast(tr))
        .select(col("n_nodes"), col("triangles"), col("triads"),
          when(col("triads") === 0, lit(0.0))
            .otherwise((lit(3) * col("triangles")).cast("double")
              / col("triads").cast("double")).as("clustering_coeff"))
    },

    // ---- U23: GDPR subject-access report -----------------------------------
    // "Give me everything you hold about customer X" — the read-side
    // sibling of u15's erasure audit: for each table touching the
    // subject set (negative-balance customers here), the row count and
    // an exact lineage digest of the held keys. Each table is ONE
    // conditional-aggregate pass against the broadcast subject list —
    // the same one-scan-per-table shape the erasure propagation uses,
    // so access and erasure audits share cost structure.
    QueryDef.sql(
      "u23_subject_access",
      """WITH subj AS (
        |  SELECT c_custkey FROM customer WHERE c_acctbal < 0),
        |c AS (
        |  SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(CAST(sum(c_custkey) AS BIGINT) % 1000000007 AS BIGINT) AS key_digest
        |  FROM customer JOIN subj USING (c_custkey)),
        |o AS (
        |  SELECT 'orders', CAST(count(*) AS BIGINT),
        |    CAST(CAST(sum(o_orderkey) AS BIGINT) % 1000000007 AS BIGINT)
        |  FROM orders JOIN subj ON o_custkey = c_custkey),
        |l AS (
        |  SELECT 'lineitem', CAST(count(*) AS BIGINT),
        |    CAST(CAST(sum(l_orderkey * 7 + l_linenumber) AS BIGINT) % 1000000007 AS BIGINT)
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |    JOIN subj ON o_custkey = c_custkey)
        |SELECT * FROM c UNION ALL SELECT * FROM o UNION ALL SELECT * FROM l""".stripMargin) { (s, d) =>
      val subj = broadcast(Tables.customer(s, d)
        .filter(col("c_acctbal") < 0).select(col("c_custkey")))
      val c = Tables.customer(s, d)
        .join(subj, Seq("c_custkey"))
        .agg(count(lit(1)).as("n_rows"),
          (sum(col("c_custkey")) % 1000000007L).as("key_digest"))
        .select(lit("customer").as("tbl"), col("n_rows"), col("key_digest"))
      val o = Tables.orders(s, d)
        .join(subj, col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).as("n_rows"),
          (sum(col("o_orderkey")) % 1000000007L).as("key_digest"))
        .select(lit("orders").as("tbl"), col("n_rows"), col("key_digest"))
      val subjOrders = Tables.orders(s, d)
        .join(subj, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"))
      val l = Tables.lineitem(s, d)
        .join(subjOrders, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n_rows"),
          (sum(col("l_orderkey") * 7 + col("l_linenumber")) % 1000000007L).as("key_digest"))
        .select(lit("lineitem").as("tbl"), col("n_rows"), col("key_digest"))
      c.unionByName(o).unionByName(l)
    }
  )
}
