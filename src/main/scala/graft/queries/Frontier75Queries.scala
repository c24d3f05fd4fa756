package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Seventy-fifth frontier batch: quantile treatment effects, deletion
  * vectors, instant-runoff preference rounds.
  */
object Frontier75Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A134: quantile treatment effects ------------------------------------
    // Mean effects (a125/a126) hide distributional shifts; QTE reports
    // the treatment−control gap at p25/p50/p75. Each quantile is the
    // exact ceil(q·n) order statistic per arm (type-1 — no
    // interpolation, no engine-specific percentile), pulled through
    // one rank window per arm. Same parity arms as the rest of the
    // causal suite.
    QueryDef.sql(
      "a134_quantile_effect",
      """WITH u AS (
        |  SELECT user_id, CAST(user_id % 2 AS INT) AS t,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT t, x,
        |    row_number() OVER (PARTITION BY t ORDER BY x, user_id) AS rk,
        |    CAST(count(*) OVER (PARTITION BY t) AS BIGINT) AS n
        |  FROM u),
        |qs AS (
        |  SELECT q.q, r.t, max(r.x) AS v
        |  FROM r JOIN (SELECT unnest([25, 50, 75]) AS q) q
        |    ON r.rk = (q.q * r.n + 99) // 100
        |  GROUP BY 1, 2)
        |SELECT CAST(a.q AS INT) AS quantile,
        |  CAST(a.v AS BIGINT) AS treat_cents,
        |  CAST(b.v AS BIGINT) AS control_cents,
        |  CAST(a.v - b.v AS BIGINT) AS effect_cents
        |FROM qs a JOIN qs b ON a.q = b.q AND a.t = 1 AND b.t = 0
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"), (col("user_id") % 2).cast("int").as("t"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).cast("long").as("x"))
      val r = u.withColumn("rk", row_number().over(
          Window.partitionBy(col("t")).orderBy(col("x"), col("user_id"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("t"))))
      val qs = r.crossJoin(broadcast(Seq(25, 50, 75).toDF_(s, "q")))
        .filter(col("rk") === expr("(q * n + 99) div 100"))
        .groupBy(col("q"), col("t")).agg(max(col("x")).as("v"))
      val a = qs.filter(col("t") === 1).select(col("q"), col("v").as("tv"))
      val b = qs.filter(col("t") === 0).select(col("q").as("qb"), col("v").as("cv"))
      a.join(b, col("q") === col("qb"))
        .select(col("q").cast("int").as("quantile"),
          col("tv").cast("long").as("treat_cents"),
          col("cv").cast("long").as("control_cents"),
          (col("tv") - col("cv")).cast("long").as("effect_cents"))
        .orderBy(col("quantile"))
    },

    // ---- U58: deletion vectors (merge-on-read soft deletes) -----------------
    // The lakehouse mechanism behind DML without rewrites: deletes land
    // as per-file position bitmaps; reads apply them with an
    // array_contains filter against the broadcast DV table. Positions
    // and the delete predicate are deterministic; the audit reconciles
    // row counts and visible revenue per file group — exactly what a
    // table-format conformance test checks. DV arrays stay file-sized
    // (bounded), never corpus-sized.
    QueryDef.sql(
      "u58_deletion_vectors",
      """WITH base AS (
        |  SELECT l_orderkey // 512 AS file_id,
        |    (l_orderkey % 512) * 8 + l_linenumber AS pos,
        |    CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
        |    (l_orderkey * 31 + l_linenumber) % 20 = 0 AS deleted
        |  FROM lineitem),
        |dv AS (
        |  SELECT file_id, list_sort(list(pos)) AS dv_positions
        |  FROM base WHERE deleted GROUP BY 1),
        |read_path AS (
        |  SELECT b.file_id, b.pos, b.cents,
        |    CASE WHEN dv.dv_positions IS NOT NULL
        |      AND list_contains(dv.dv_positions, b.pos) THEN 1 ELSE 0 END AS dead
        |  FROM base b LEFT JOIN dv USING (file_id))
        |SELECT file_id // 64 AS file_group,
        |  CAST(count(DISTINCT file_id) AS BIGINT) AS n_files,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(dead) AS BIGINT) AS n_deleted,
        |  CAST(sum(CASE WHEN dead = 0 THEN cents ELSE 0 END) AS BIGINT)
        |    AS visible_cents
        |FROM read_path GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val base = Tables.lineitem(s, d).select(
          expr("l_orderkey div 512").as("file_id"),
          ((col("l_orderkey") % 512) * 8 + col("l_linenumber")).as("pos"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"),
          ((col("l_orderkey") * 31 + col("l_linenumber")) % 20 === 0).as("deleted"))
        .localCheckpoint(true) // the DV build and the read path share the scan
      val dv = base.filter(col("deleted"))
        .groupBy(col("file_id"))
        .agg(sort_array(collect_list(col("pos"))).as("dv_positions"))
      val readPath = base.join(broadcast(dv), Seq("file_id"), "left")
        .select(col("file_id"), col("cents"),
          when(col("dv_positions").isNotNull &&
            array_contains(col("dv_positions"), col("pos")), 1).otherwise(0)
            .as("dead"))
      readPath.groupBy(expr("file_id div 64").as("file_group"))
        .agg(count_distinct(col("file_id")).as("n_files"),
          count(lit(1)).as("n_rows"), sum(col("dead")).cast("long").as("n_deleted"),
          sum(when(col("dead") === 0, col("cents")).otherwise(0L)).cast("long")
            .as("visible_cents"))
        .orderBy(col("file_group"))
    },

    // ---- A135: instant-runoff preference rounds ------------------------------
    // Ranked-choice tabulation as relational algebra: each user's
    // ballot ranks the five event types by engagement (count desc,
    // name); each IRV round tallies first surviving preferences,
    // eliminates the minimum (ties → name order), and transfers
    // ballots — three rounds unrolled as crumb joins against the
    // per-user preference arrays. Output: every round's tally with
    // the eliminated candidate flagged.
    QueryDef.sql(
      "a135_irv_rounds", {
        def tally(k: Int, excl: String): String =
          s"""t$k AS (
             |  SELECT list_filter(prefs, p -> $excl)[1] AS cand,
             |    CAST(count(*) AS BIGINT) AS votes
             |  FROM ballots${if (k > 1) (1 until k).map(i => s", e$i").mkString("")
                else ""}
             |  GROUP BY 1),
             |e$k AS (
             |  SELECT cand AS el$k FROM t$k
             |  QUALIFY row_number() OVER (ORDER BY votes, cand) = 1)"""
            .stripMargin
        s"""WITH pc AS (
           |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
           |  FROM events GROUP BY 1, 2),
           |ballots AS (
           |  SELECT user_id,
           |    list(event_type ORDER BY n DESC, event_type) AS prefs
           |  FROM pc GROUP BY 1),
           |${tally(1, "true")},
           |${tally(2, "p <> e1.el1")},
           |${tally(3, "p <> e1.el1 AND p <> e2.el2")}
           |SELECT 1 AS round, cand, votes,
           |  CAST(cand = (SELECT el1 FROM e1) AS INT) AS eliminated FROM t1
           |UNION ALL
           |SELECT 2, cand, votes, CAST(cand = (SELECT el2 FROM e2) AS INT) FROM t2
           |UNION ALL
           |SELECT 3, cand, votes, CAST(cand = (SELECT el3 FROM e3) AS INT) FROM t3
           |ORDER BY 1, 2""".stripMargin
      }) { (s, d) =>
      val pc = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
      val ballots = pc
        .groupBy(col("user_id"))
        .agg(transform(array_sort(collect_list(
            struct((-col("n")).as("nn"), col("event_type").as("et")))),
          e => e.getField("et")).as("prefs"))
        .localCheckpoint(true) // three tabulation rounds reuse the ballots
      def round(excluded: Seq[DataFrame]): (DataFrame, DataFrame) = {
        val withExcl = excluded.zipWithIndex
          .foldLeft(ballots)((df, ei) => df.crossJoin(broadcast(ei._1)))
        val exclPred = if (excluded.isEmpty) "true"
          else (1 to excluded.size).map(i => s"p != el$i").mkString(" AND ")
        val t = withExcl
          .select(expr(s"element_at(filter(prefs, p -> $exclPred), 1)").as("cand"))
          .groupBy(col("cand")).agg(count(lit(1)).as("votes"))
        val e = t.withColumn("rn",
            row_number().over(Window.orderBy(col("votes"), col("cand"))))
          .filter(col("rn") === 1)
          .select(col("cand").as(s"el${excluded.size + 1}"))
        (t, e)
      }
      val (t1, e1) = round(Seq.empty)
      val (t2, e2) = round(Seq(e1))
      val (t3, e3) = round(Seq(e1, e2))
      def tag(t: DataFrame, e: DataFrame, k: Int, elCol: String): DataFrame =
        t.crossJoin(broadcast(e))
          .select(lit(k).as("round"), col("cand"), col("votes"),
            (col("cand") === col(elCol)).cast("int").as("eliminated"))
      tag(t1, e1, 1, "el1").unionByName(tag(t2, e2, 2, "el2"))
        .unionByName(tag(t3, e3, 3, "el3"))
        .orderBy(col("round"), col("cand"))
    }
  )

  implicit private class SeqDf(val xs: Seq[Int]) {
    def toDF_(s: SparkSession, name: String): DataFrame = {
      import s.implicits._
      xs.toDF(name)
    }
  }
}
