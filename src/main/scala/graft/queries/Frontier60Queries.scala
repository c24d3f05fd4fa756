package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Sixtieth frontier batch: embedding dead-dimension pruning, two-stage
  * entity-match cascade, correlated scalar subqueries.
  */
object Frontier60Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- V32: embedding dead-dimension pruning ------------------------------
    // Vector-store compaction: dimensions whose variance is ~zero carry
    // no retrieval signal — find them exactly and plan the projection.
    // Per-dimension variance uses v15's portable quantization
    // (floor(v·10⁶) — a pure IEEE product+floor, identical in any
    // engine) and the integer moment form n·Σq² − (Σq)²; the keep set
    // is the top-16 dims by variance. One posexplode + one (dim)
    // aggregate — dimension-major stats at corpus scale cost one
    // shuffle of 64 cells.
    QueryDef.sql(
      "v32_dim_pruning",
      """WITH q AS (
        |  SELECT u.i AS dim,
        |    CAST(floor(CAST(u.v AS DOUBLE) * 1000000) AS BIGINT) AS qv
        |  FROM embeddings e,
        |    LATERAL (SELECT unnest(e.embedding) AS v,
        |             generate_subscripts(e.embedding, 1) - 1 AS i) u),
        |m AS (
        |  SELECT dim, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(CAST(qv AS HUGEINT)) AS HUGEINT) AS s,
        |    CAST(sum(CAST(qv AS HUGEINT) * qv) AS HUGEINT) AS ss
        |  FROM q GROUP BY 1),
        |v AS (
        |  SELECT CAST(dim AS INT) AS dim, CAST(n AS BIGINT) AS n,
        |    CAST((n * ss - s * s) // (n * (n - 1)) AS BIGINT) AS var_micro2
        |  FROM m)
        |SELECT dim, n, var_micro2,
        |  CAST(rnk AS INT) AS var_rank,
        |  CAST(rnk <= 16 AS INT) AS keep
        |FROM (SELECT *, row_number() OVER (ORDER BY var_micro2 DESC, dim) AS rnk
        |      FROM v)
        |ORDER BY dim""".stripMargin) { (s, d) =>
      val q = Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("dim"),
          floor(col("v").cast("double") * 1000000).cast("long").as("qv"))
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val m = q.groupBy(col("dim"))
        .agg(count(lit(1)).cast(dec).as("n"),
          sum(col("qv").cast(dec)).as("s"),
          sum(col("qv").cast(dec) * col("qv")).as("ss"))
      val v = m.select(col("dim").cast("int").as("dim"),
        col("n").cast("long").as("n"),
        expr("cast((n * ss - s * s) div (n * (n - 1)) as bigint)").as("var_micro2"))
      // 64-row crumb: the unpartitioned rank window is dimension-bounded
      v.withColumn("rnk", row_number().over(
          Window.orderBy(col("var_micro2").desc, col("dim"))))
        .select(col("dim"), col("n"), col("var_micro2"),
          col("rnk").cast("int").as("var_rank"),
          (col("rnk") <= 16).cast("int").as("keep"))
        .orderBy(col("dim"))
    },

    // ---- J14: two-stage entity-match cascade --------------------------------
    // Production entity resolution is a CASCADE: exact key match first
    // (cheap, bulk), then a fuzzy pass over ONLY the remainder. The
    // "CRM" side derives deterministically from customers (even keys
    // unchanged → exact tier; odd keys mutate '#'→'-' → distance-1
    // fuzzy tier). Stage 2 is an anti-join of stage 1's hits, nation-
    // blocked, levenshtein ≤ 1, best-match-wins (min distance, min
    // key — a rank window). The shape to notice at scale: the fuzzy
    // join only ever sees the exact tier's LEFTOVERS.
    QueryDef.sql(
      "j14_match_cascade",
      """WITH crm AS (
        |  SELECT c_custkey + 1000000 AS b_id, c_nationkey AS b_nk,
        |    CASE WHEN c_custkey % 2 = 0 THEN c_name
        |         ELSE replace(c_name, '#', '-') END AS b_name
        |  FROM customer),
        |exact AS (
        |  SELECT b.b_id, a.c_custkey AS a_id, 'exact' AS method, 0 AS dist
        |  FROM crm b JOIN customer a ON b.b_name = a.c_name),
        |rest AS (
        |  SELECT b.* FROM crm b ANTI JOIN exact e ON b.b_id = e.b_id),
        |fuzzy AS (
        |  SELECT b_id, a_id, 'fuzzy' AS method, dist FROM (
        |    SELECT b.b_id, a.c_custkey AS a_id,
        |      levenshtein(b.b_name, a.c_name) AS dist,
        |      row_number() OVER (PARTITION BY b.b_id
        |        ORDER BY levenshtein(b.b_name, a.c_name), a.c_custkey) AS rn
        |    FROM rest b JOIN customer a ON b.b_nk = a.c_nationkey
        |    WHERE levenshtein(b.b_name, a.c_name) <= 1)
        |  WHERE rn = 1)
        |SELECT b_id, a_id, method, CAST(dist AS INT) AS dist FROM exact
        |UNION ALL
        |SELECT b_id, a_id, method, CAST(dist AS INT) FROM fuzzy
        |ORDER BY b_id""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      val crm = cust.select((col("c_custkey") + 1000000L).as("b_id"),
        col("c_nationkey").as("b_nk"),
        when(col("c_custkey") % 2 === 0, col("c_name"))
          .otherwise(regexp_replace(col("c_name"), "#", "-")).as("b_name"))
      val exact = crm.join(cust, col("b_name") === col("c_name"))
        .select(col("b_id"), col("c_custkey").as("a_id"),
          lit("exact").as("method"), lit(0).as("dist"))
      val rest = crm.join(exact.select(col("b_id")), Seq("b_id"), "left_anti")
      val fuzzy = rest
        // suffix blocking is LOSSLESS at threshold 1 here: the CRM
        // mutation edits position 9, so any additional difference in
        // the last 8 chars already puts a pair past distance 1 — the
        // block key only discards pairs the verify would reject
        .join(cust, col("b_nk") === col("c_nationkey") &&
          expr("right(b_name, 8)") === expr("right(c_name, 8)"))
        // banded edit distance: bails out past the threshold instead of
        // filling the full DP matrix for pairs that miss
        .withColumn("dist", levenshtein(col("b_name"), col("c_name"), 1))
        .filter(col("dist") >= 0 && col("dist") <= 1)
        .withColumn("rn", row_number().over(Window.partitionBy(col("b_id"))
          .orderBy(col("dist"), col("c_custkey"))))
        .filter(col("rn") === 1)
        .select(col("b_id"), col("c_custkey").as("a_id"),
          lit("fuzzy").as("method"), col("dist").cast("int").as("dist"))
      exact.withColumn("dist", col("dist").cast("int"))
        .unionByName(fuzzy)
        .orderBy(col("b_id"))
    },

    // ---- Q23: correlated scalar subqueries ----------------------------------
    // The decorrelation surface the TPC-H sweep didn't pin: per-row
    // correlated scalar subqueries ("customers above their own
    // nation's average balance"), with the average comparison
    // CROSS-MULTIPLIED (cents·n > Σcents) so both engines compare
    // exact integers instead of a float mean. Catalyst must rewrite
    // both subqueries into ONE aggregated join — the plan contains no
    // per-row subquery execution.
    QueryDef.sql(
      "q23_correlated_scalar",
      """SELECT c.c_nationkey AS nationkey,
        |  CAST(count(*) AS BIGINT) AS n_above_avg
        |FROM customer c
        |WHERE CAST(floor(c.c_acctbal * 100) AS BIGINT)
        |    * (SELECT count(*) FROM customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |  > (SELECT sum(CAST(floor(c3.c_acctbal * 100) AS BIGINT))
        |     FROM customer c3 WHERE c3.c_nationkey = c.c_nationkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("q23_customer")
      s.sql(
        """SELECT c.c_nationkey AS nationkey,
          |  CAST(count(*) AS BIGINT) AS n_above_avg
          |FROM q23_customer c
          |WHERE CAST(floor(c.c_acctbal * 100) AS BIGINT)
          |    * (SELECT count(*) FROM q23_customer c2
          |       WHERE c2.c_nationkey = c.c_nationkey)
          |  > (SELECT sum(CAST(floor(c3.c_acctbal * 100) AS BIGINT))
          |     FROM q23_customer c3 WHERE c3.c_nationkey = c.c_nationkey)
          |GROUP BY 1 ORDER BY 1""".stripMargin)
    }
  )
}
