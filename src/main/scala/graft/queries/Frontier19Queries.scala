package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Nineteenth frontier batch: leakage-safe train/test splitting,
  * user-lifecycle growth accounting, and categorical entropy profiling.
  */
object Frontier19Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- C20: leakage-safe (group-aware) split ----------------------------
    // c6 splits per document — which LEAKS near-duplicates across the
    // train/test boundary. The leakage-safe variant keys the split on
    // the near-dup COMPONENT (c3/d6's staged ≥0.8 pair graph → hash-min
    // components; singletons key on themselves), so an entire duplicate
    // cluster always lands on one side. Same md5-prefix thresholds as
    // c6; the component table (≪ corpus) joins back by broadcast-shaped
    // left join. The spec pins the invariant c6 can't give: no group
    // spans two splits.
    QueryDef.sql(
      "c20_group_split",
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE) >= 0.8),
        |e AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, root) AS (
        |  SELECT DISTINCT src, src FROM e
        |  UNION
        |  SELECT e.dst, r.root FROM reach r JOIN e ON e.src = r.id),
        |comp AS (SELECT id, min(root) AS c FROM reach GROUP BY id),
        |keyed AS (
        |  SELECT d.doc_id, COALESCE(comp.c, d.doc_id) AS group_key
        |  FROM documents d LEFT JOIN comp ON comp.id = d.doc_id)
        |SELECT doc_id, group_key,
        |  CASE WHEN substr(md5(CAST(group_key AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |       WHEN substr(md5(CAST(group_key AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM keyed""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val pairs = TextQueries.stagedNearDupPairs(s, d).filter(col("jaccard") >= 0.8)
      val comp = graft.operators.DupComponents.components(s, pairs)
      val keyed = docs.select(col("doc_id"))
        .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("group_key"))
      val h = substring(md5(col("group_key").cast("string")), 1, 2)
      keyed.select(col("doc_id"), col("group_key"),
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test").as("split"))
    },

    // ---- EV47: user-lifecycle growth accounting ---------------------------
    // The weekly new / retained / resurrected / churned ledger. Weeks
    // are integer indexes (days-since-anchor div 7 — no engine week-
    // boundary conventions in the hash path). Each user's distinct
    // active weeks order through a per-user lag: first week → new,
    // gap 1 → retained, gap > 1 → resurrected; a churn row emits at
    // week+1 whenever the next active week isn't adjacent (bounded to
    // the observed horizon via the broadcast max). All per-user
    // windows partition on user_id; the ledger is one partial-agg
    // rollup on (week, state).
    QueryDef.sql(
      "ev47_lifecycle_states",
      """WITH wk AS (
        |  SELECT DISTINCT user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS w
        |  FROM events),
        |mx AS (SELECT max(w) AS max_w FROM wk),
        |lagged AS (
        |  SELECT user_id, w,
        |    lag(w) OVER (PARTITION BY user_id ORDER BY w) AS prev_w,
        |    lead(w) OVER (PARTITION BY user_id ORDER BY w) AS next_w
        |  FROM wk),
        |states AS (
        |  SELECT w, CASE WHEN prev_w IS NULL THEN 'new'
        |                 WHEN w - prev_w = 1 THEN 'retained'
        |                 ELSE 'resurrected' END AS state
        |  FROM lagged
        |  UNION ALL
        |  SELECT w + 1, 'churned'
        |  FROM lagged CROSS JOIN mx
        |  WHERE (next_w IS NULL OR next_w > w + 1) AND w + 1 <= max_w)
        |SELECT CAST(w AS BIGINT) AS week_idx, state,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM states GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val wk = Tables.events(s, d)
        .select(col("user_id"),
          expr("datediff(cast(ts as date), date'2024-01-01') div 7").as("w"))
        .distinct()
      val mx = wk.agg(max(col("w")).as("max_w"))
      val wU = Window.partitionBy(col("user_id")).orderBy(col("w"))
      val lagged = wk
        .withColumn("prev_w", lag(col("w"), 1).over(wU))
        .withColumn("next_w", lead(col("w"), 1).over(wU))
      val active = lagged.select(col("w"),
        when(col("prev_w").isNull, "new")
          .when(col("w") - col("prev_w") === 1, "retained")
          .otherwise("resurrected").as("state"))
      val churned = lagged.crossJoin(broadcast(mx))
        .filter((col("next_w").isNull || col("next_w") > col("w") + 1) &&
          col("w") + 1 <= col("max_w"))
        .select((col("w") + 1).as("w"), lit("churned").as("state"))
      active.unionByName(churned)
        .groupBy(col("w").cast("long").as("week_idx"), col("state"))
        .agg(count(lit(1)).as("n_users"))
    },

    // ---- A57: categorical entropy profile ---------------------------------
    // Schema-profiling companion to u24: Shannon entropy (and its
    // normalized form) for seven categorical columns across five
    // tables — the "is this column informative or near-constant"
    // readout. Discipline: counts are exact; each group's p·ln(p)
    // rounds to 8 dp and sums as DECIMAL (order-independent — a raw
    // double Σ would be association-order-dependent); one final
    // negation/division pair, round 6. Per column: one partial-agg
    // shuffle on the (bounded) category space.
    QueryDef.sql(
      "a57_column_entropy", {
        def one(tbl: String, colName: String): String =
          s"""SELECT '$tbl.$colName' AS column_name,
             |  CAST(count(*) AS BIGINT) AS n_distinct,
             |  CAST(sum(c) AS BIGINT) AS n_rows,
             |  round(-CAST(sum(term) AS DOUBLE), 6) AS entropy
             |FROM (
             |  SELECT c, CAST(round(
             |      (CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)) *
             |      ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)), 8)
             |    AS DECIMAL(18,8)) AS term
             |  FROM (
             |    SELECT c, sum(c) OVER () AS tot
             |    FROM (SELECT CAST($colName AS VARCHAR) AS v, CAST(count(*) AS BIGINT) AS c
             |          FROM $tbl GROUP BY 1)))""".stripMargin
        Seq(
          one("events", "event_type"), one("orders", "o_orderstatus"),
          one("orders", "o_orderpriority"), one("customer", "c_mktsegment"),
          one("documents", "lang"), one("documents", "source"),
          one("part", "p_brand")
        ).mkString("", "\nUNION ALL\n", "")
      }) { (s, d) =>
      def one(df: DataFrame, tbl: String, colName: String): DataFrame = {
        val counts = df.groupBy(col(colName).cast("string").as("v"))
          .agg(count(lit(1)).as("c"))
        val tot = counts.agg(sum(col("c")).as("n"))
        val p = col("c").cast("double") / col("n").cast("double")
        counts.crossJoin(broadcast(tot))
          .select(col("c"), col("n"), round(p * log(p), 8).cast(DecimalType(18, 8)).as("term"))
          .agg(count(lit(1)).as("n_distinct"), sum(col("c")).as("n_rows"),
            round(-sum(col("term")).cast("double"), 6).as("entropy"))
          .select(lit(s"$tbl.$colName").as("column_name"),
            col("n_distinct"), col("n_rows"), col("entropy"))
      }
      Seq(
        one(Tables.events(s, d), "events", "event_type"),
        one(Tables.orders(s, d), "orders", "o_orderstatus"),
        one(Tables.orders(s, d), "orders", "o_orderpriority"),
        one(Tables.customer(s, d), "customer", "c_mktsegment"),
        one(Tables.documents(s, d), "documents", "lang"),
        one(Tables.documents(s, d), "documents", "source"),
        one(Tables.part(s, d), "part", "p_brand")
      ).reduce(_.unionByName(_))
    }
  )
}
