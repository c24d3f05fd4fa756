package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions

/** Sixty-third frontier batch: Cochran's Q repeated-measures test,
  * pairwise-free exact medoids, keyword-in-context concordance.
  */
object Frontier63Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A122: Cochran's Q test ---------------------------------------------
    // The repeated-measures sibling of McNemar (which this suite
    // already has for k=2): did conversion behavior change across the
    // month's four weeks, per user? Q has the clean integer closed
    // form (k−1)(k·ΣCⱼ² − N²) / (k·N − ΣRᵢ²) — numerator from week
    // totals, denominator from per-user row totals — so the statistic
    // ships as exact micro units and significance is the χ²₍₃₎
    // comparison. One user-week aggregate, two crumb reductions.
    QueryDef.sql(
      "a122_cochran_q",
      """WITH uw AS (
        |  SELECT user_id, CAST((day(CAST(ts AS DATE)) - 1) // 7 AS INT) AS wk,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv
        |  FROM events WHERE day(CAST(ts AS DATE)) <= 28
        |  GROUP BY 1, 2),
        |dense AS (
        |  SELECT u.user_id, k.wk, coalesce(w.conv, 0) AS conv
        |  FROM (SELECT DISTINCT user_id FROM uw) u
        |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS wk) k
        |  LEFT JOIN uw w ON u.user_id = w.user_id AND k.wk = w.wk),
        |rows_t AS (
        |  SELECT user_id, CAST(sum(conv) AS BIGINT) AS r FROM dense GROUP BY 1),
        |cols_t AS (
        |  SELECT wk, CAST(sum(conv) AS BIGINT) AS c FROM dense GROUP BY 1),
        |agg AS (
        |  SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM rows_t) AS n_users,
        |    (SELECT CAST(sum(c) AS BIGINT) FROM cols_t) AS n,
        |    (SELECT CAST(sum(c * c) AS BIGINT) FROM cols_t) AS sc2,
        |    (SELECT CAST(sum(r * r) AS BIGINT) FROM rows_t) AS sr2,
        |    (SELECT max(CASE WHEN wk = 0 THEN c END) FROM cols_t) AS c0,
        |    (SELECT max(CASE WHEN wk = 1 THEN c END) FROM cols_t) AS c1,
        |    (SELECT max(CASE WHEN wk = 2 THEN c END) FROM cols_t) AS c2,
        |    (SELECT max(CASE WHEN wk = 3 THEN c END) FROM cols_t) AS c3)
        |SELECT n_users, c0, c1, c2, c3,
        |  CAST(CASE WHEN 4 * n - sr2 > 0 THEN
        |    (3 * (4 * sc2 - n * n) * 1000000) // (4 * n - sr2)
        |    END AS BIGINT) AS q_micro,
        |  CAST(coalesce(CASE WHEN 4 * n - sr2 > 0 THEN
        |    (3 * (4 * sc2 - n * n) * 1000000) // (4 * n - sr2) > 7814728
        |    END, FALSE) AS INT) AS significant
        |FROM agg""".stripMargin) { (s, d) =>
      val uw = Tables.events(s, d)
        .filter(dayofmonth(col("ts").cast("date")) <= 28)
        .groupBy(col("user_id"),
          expr("(day(cast(ts as date)) - 1) div 7").cast("int").as("wk"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      val users = uw.select(col("user_id")).distinct()
      val dense = users
        .crossJoin(broadcast(s.range(0, 4).select(col("id").cast("int").as("wk"))))
        .join(uw, Seq("user_id", "wk"), "left")
        .select(col("user_id"), col("wk"), coalesce(col("conv"), lit(0L)).as("conv"))
        .localCheckpoint(true) // row totals and week totals share one grid
      val rowsT = dense.groupBy(col("user_id")).agg(sum(col("conv")).as("r"))
      val colsT = dense.groupBy(col("wk")).agg(sum(col("conv")).as("c"))
      val rAgg = rowsT.agg(count(lit(1)).as("n_users"),
        sum(col("r") * col("r")).cast("long").as("sr2"))
      val cAgg = colsT.agg(sum(col("c")).cast("long").as("n"),
        sum(col("c") * col("c")).cast("long").as("sc2"),
        max(when(col("wk") === 0, col("c"))).cast("long").as("c0"),
        max(when(col("wk") === 1, col("c"))).cast("long").as("c1"),
        max(when(col("wk") === 2, col("c"))).cast("long").as("c2"),
        max(when(col("wk") === 3, col("c"))).cast("long").as("c3"))
      rAgg.crossJoin(broadcast(cAgg))
        .select(col("n_users"), col("c0"), col("c1"), col("c2"), col("c3"),
          when(lit(4) * col("n") - col("sr2") > 0,
            expr("(3 * (4 * sc2 - n * n) * 1000000) div (4 * n - sr2)"))
            .cast("long").as("q_micro"))
        .withColumn("significant",
          coalesce(col("q_micro") > 7814728L, lit(false)).cast("int"))
    },

    // ---- V35: exact medoids without the pairwise pass -----------------------
    // The duplicate-family/canonical-representative selector: the
    // medoid minimizes Σⱼ‖xᵢ−xⱼ‖², which expands to n·‖xᵢ‖² − 2·xᵢ·S +
    // Σⱼ‖xⱼ‖² (S = coordinate sum) — so the O(n²·d) pairwise scan
    // collapses to per-row algebra against broadcast label sums.
    // Quantized coordinates (10³ floor) keep every term an exact
    // integer. One explode aggregate + one argmin window per label.
    QueryDef.sql(
      "v35_label_medoids",
      """WITH q AS (
        |  SELECT e.vec_id, e.label, u.i AS dim,
        |    CAST(floor(CAST(u.v AS DOUBLE) * 1000) AS BIGINT) AS qv
        |  FROM embeddings e,
        |    LATERAL (SELECT unnest(e.embedding) AS v,
        |             generate_subscripts(e.embedding, 1) - 1 AS i) u),
        |pv AS (
        |  SELECT vec_id, label,
        |    CAST(sum(qv * qv) AS BIGINT) AS ssq
        |  FROM q GROUP BY 1, 2),
        |ls AS (
        |  SELECT label, dim, CAST(sum(qv) AS BIGINT) AS s FROM q GROUP BY 1, 2),
        |lagg AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(ssq) AS BIGINT) AS tot_ssq
        |  FROM pv GROUP BY 1),
        |dots AS (
        |  SELECT v.vec_id, v.label, CAST(sum(v.qv * l.s) AS BIGINT) AS dot
        |  FROM q v JOIN ls l ON v.label = l.label AND v.dim = l.dim
        |  GROUP BY 1, 2),
        |cost AS (
        |  SELECT p.vec_id, p.label,
        |    a.n * p.ssq - 2 * d.dot + a.tot_ssq AS c
        |  FROM pv p JOIN dots d ON p.vec_id = d.vec_id
        |  JOIN lagg a ON p.label = a.label)
        |SELECT CAST(label AS INT) AS label, vec_id AS medoid_id,
        |  CAST(c AS BIGINT) AS sum_sq_dist
        |FROM (SELECT *, row_number() OVER (PARTITION BY label
        |        ORDER BY c, vec_id) AS rn FROM cost)
        |WHERE rn = 1 ORDER BY label""".stripMargin) { (s, d) =>
      val q = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("vec_id"), col("label"), col("dim"),
          floor(col("v").cast("double") * 1000).cast("long").as("qv"))
        .localCheckpoint(true) // per-vector and per-label stats share the pass
      val pv = q.groupBy(col("vec_id"), col("label"))
        .agg(sum(col("qv") * col("qv")).cast("long").as("ssq"))
      val ls = q.groupBy(col("label"), col("dim"))
        .agg(sum(col("qv")).cast("long").as("s"))
      val lagg = pv.groupBy(col("label"))
        .agg(count(lit(1)).as("n"), sum(col("ssq")).cast("long").as("tot_ssq"))
      val dots = q.join(broadcast(ls), Seq("label", "dim"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("qv") * col("s")).cast("long").as("dot"))
      val cost = pv.join(dots, Seq("vec_id", "label"))
        .join(broadcast(lagg), "label")
        .select(col("vec_id"), col("label"),
          (col("n") * col("ssq") - lit(2) * col("dot") + col("tot_ssq")).as("c"))
      cost.withColumn("rn", row_number().over(
          Window.partitionBy(col("label")).orderBy(col("c"), col("vec_id"))))
        .filter(col("rn") === 1)
        .select(col("label").cast("int").as("label"), col("vec_id").as("medoid_id"),
          col("c").cast("long").as("sum_sq_dist"))
        .orderBy(col("label"))
    },

    // ---- T60: keyword-in-context (KWIC) concordance -------------------------
    // The corpus-linguistics workhorse: every occurrence of a query
    // term with its ±2-token context window. Positions come from a
    // filtered index sequence over the token array (no self-join, no
    // shuffle — pure per-row array algebra on the scan); the context
    // slice clamps at document edges. Output is (doc, position,
    // context) — the exact shape a concordance UI pages through.
    QueryDef.sql(
      "t60_kwic",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t
        |  FROM documents),
        |hits AS (
        |  SELECT doc_id, t,
        |    unnest(list_filter(range(1, len(t) + 1), i -> t[i] = 'spark')) AS pos
        |  FROM toks)
        |SELECT doc_id, CAST(pos AS INT) AS pos,
        |  array_to_string(t[greatest(1, pos - 2):least(len(t), pos + 2)], ' ')
        |    AS context
        |FROM hits ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      toks.select(col("doc_id"), col("t"),
          explode(expr("filter(sequence(1, size(t)), i -> element_at(t, i) = 'spark')"))
            .as("pos"))
        .select(col("doc_id"), col("pos").cast("int").as("pos"),
          expr("""concat_ws(' ', slice(t, greatest(1, pos - 2),
                  least(size(t), pos + 2) - greatest(1, pos - 2) + 1))""")
            .as("context"))
        .orderBy(col("doc_id"), col("pos"))
    }
  )
}
