package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.VectorOps

/** Fortieth frontier batch: MMR diversity re-ranking, Cohen's κ
  * agreement, McNemar's paired test.
  */
object Frontier40Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- V29: maximal marginal relevance re-ranking ------------------------
    // The diversity pass every RAG retriever runs after similarity
    // search: greedily pick 3 of the top-8 shortlist maximizing
    // λ·relevance − (1−λ)·max-similarity-to-already-picked (λ = ½).
    // Greedy selection is inherently sequential, but with FIXED k the
    // three rounds unroll into plan space: shortlist → argmax →
    // penalized argmax → penalized argmax, each a per-query rank
    // window over the (query × 8)-bounded candidate set, with the
    // 8×8 within-shortlist similarity matrix computed once. Every
    // cosine rounds to 8 dp BEFORE comparison (the STATE tie
    // discipline), so both engines pick identical chains.
    QueryDef.sql(
      "v29_mmr_rerank",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |    (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |rel AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS cid, n.emb AS c_emb, n.nrm AS c_nrm,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(q.emb) + 1), i -> q.emb[i] * n.emb[i])),
        |      (x, y) -> x + y) / (q.nrm * n.nrm), 8) AS rel
        |  FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id >= 10),
        |cand AS (
        |  SELECT query_id, cid, c_emb, c_nrm, rel FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rel DESC, cid) AS rk FROM rel) WHERE rk <= 8),
        |sims AS (
        |  SELECT a.query_id, a.cid AS ca, b.cid AS cb,
        |    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(a.c_emb) + 1), i -> a.c_emb[i] * b.c_emb[i])),
        |      (x, y) -> x + y) / (a.c_nrm * b.c_nrm), 8) AS sim
        |  FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.cid <> b.cid),
        |s1 AS (
        |  SELECT query_id, cid, rel AS score FROM (
        |    SELECT query_id, cid, rel, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rel DESC, cid) AS rn FROM cand) WHERE rn = 1),
        |p2 AS (
        |  SELECT c.query_id, c.cid,
        |    0.5 * c.rel - 0.5 * s.sim AS score
        |  FROM cand c JOIN s1 ON c.query_id = s1.query_id AND c.cid <> s1.cid
        |  JOIN sims s ON s.query_id = c.query_id AND s.ca = c.cid AND s.cb = s1.cid),
        |s2 AS (
        |  SELECT query_id, cid, score FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, cid) AS rn FROM p2) WHERE rn = 1),
        |p3 AS (
        |  SELECT c.query_id, c.cid,
        |    0.5 * c.rel - 0.5 * greatest(sa.sim, sb.sim) AS score
        |  FROM cand c
        |  JOIN s1 ON c.query_id = s1.query_id AND c.cid <> s1.cid
        |  JOIN s2 ON c.query_id = s2.query_id AND c.cid <> s2.cid
        |  JOIN sims sa ON sa.query_id = c.query_id AND sa.ca = c.cid AND sa.cb = s1.cid
        |  JOIN sims sb ON sb.query_id = c.query_id AND sb.ca = c.cid AND sb.cb = s2.cid),
        |s3 AS (
        |  SELECT query_id, cid, score FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, cid) AS rn FROM p3) WHERE rn = 1)
        |SELECT query_id, CAST(1 AS INT) AS pos, cid, round(score, 6) AS score FROM s1
        |UNION ALL
        |SELECT query_id, CAST(2 AS INT), cid, round(score, 6) FROM s2
        |UNION ALL
        |SELECT query_id, CAST(3 AS INT), cid, round(score, 6) FROM s3""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("emb"))
        .withColumn("nrm", VectorOps.l2Norm(col("emb")))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("emb").as("q_emb"), col("nrm").as("q_nrm"))
      val c = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("cid"), col("emb").as("c_emb"), col("nrm").as("c_nrm"))
      val rel = c.crossJoin(broadcast(q))
        .select(col("query_id"), col("cid"), col("c_emb"), col("c_nrm"),
          round(VectorOps.cosinePre(col("q_emb"), col("c_emb"), col("q_nrm"),
            col("c_nrm")), 8).as("rel"))
      val wq = Window.partitionBy(col("query_id")).orderBy(col("rel").desc, col("cid"))
      val cand = rel.withColumn("rk", row_number().over(wq)).filter(col("rk") <= 8)
        .drop("rk").localCheckpoint(true)
      val cb = cand.select(col("query_id"), col("cid").as("cb_id"),
        col("c_emb").as("b_emb"), col("c_nrm").as("b_nrm"))
      val sims = cand.join(cb, Seq("query_id"))
        .filter(col("cid") =!= col("cb_id"))
        .select(col("query_id"), col("cid").as("ca"), col("cb_id").as("cb"),
          round(VectorOps.cosinePre(col("c_emb"), col("b_emb"), col("c_nrm"),
            col("b_nrm")), 8).as("sim"))
        .localCheckpoint(true)
      val s1 = cand.withColumn("rn", row_number().over(wq)).filter(col("rn") === 1)
        .select(col("query_id"), col("cid"), col("rel").as("score"))
      val p2 = cand.select(col("query_id"), col("cid"), col("rel"))
        .join(s1.select(col("query_id"), col("cid").as("s1_id")), "query_id")
        .filter(col("cid") =!= col("s1_id"))
        .join(sims.select(col("query_id"), col("ca").as("cid"),
          col("cb").as("s1_id"), col("sim")), Seq("query_id", "cid", "s1_id"))
        .select(col("query_id"), col("cid"),
          (lit(0.5) * col("rel") - lit(0.5) * col("sim")).as("score"))
      val wScore = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("cid"))
      val s2 = p2.withColumn("rn", row_number().over(wScore)).filter(col("rn") === 1)
        .select(col("query_id"), col("cid"), col("score"))
      val p3 = cand.select(col("query_id"), col("cid"), col("rel"))
        .join(s1.select(col("query_id"), col("cid").as("s1_id")), "query_id")
        .join(s2.select(col("query_id"), col("cid").as("s2_id")), "query_id")
        .filter(col("cid") =!= col("s1_id") && col("cid") =!= col("s2_id"))
        .join(sims.select(col("query_id"), col("ca").as("cid"),
          col("cb").as("s1_id"), col("sim").as("sim1")), Seq("query_id", "cid", "s1_id"))
        .join(sims.select(col("query_id"), col("ca").as("cid"),
          col("cb").as("s2_id"), col("sim").as("sim2")), Seq("query_id", "cid", "s2_id"))
        .select(col("query_id"), col("cid"),
          (lit(0.5) * col("rel")
            - lit(0.5) * greatest(col("sim1"), col("sim2"))).as("score"))
      val s3 = p3.withColumn("rn", row_number().over(wScore)).filter(col("rn") === 1)
        .select(col("query_id"), col("cid"), col("score"))
      s1.select(col("query_id"), lit(1).as("pos"), col("cid"),
          round(col("score"), 6).as("score"))
        .unionByName(s2.select(col("query_id"), lit(2).as("pos"), col("cid"),
          round(col("score"), 6).as("score")))
        .unionByName(s3.select(col("query_id"), lit(3).as("pos"), col("cid"),
          round(col("score"), 6).as("score")))
    },

    // ---- A93: Cohen's κ (label vs heuristic language agreement) ------------
    // How much does t3's marker heuristic agree with the declared lang
    // BEYOND chance? κ = (p_o − p_e)/(1 − p_e) from the confusion
    // matrix of (declared, predicted) — observed agreement on the
    // diagonal, expected agreement from the marginal products. All
    // counts exact; κ is one fixed-order double expression. The
    // confusion grain is class-bounded (≤ 5×4 cells).
    QueryDef.sql(
      "a93_cohens_kappa",
      """WITH scored AS (
        |  SELECT lang AS a,
        |    CASE WHEN c_en >= c_fr AND c_en >= c_es AND c_en >= c_de THEN 'en'
        |         WHEN c_fr >= c_es AND c_fr >= c_de THEN 'fr'
        |         WHEN c_es >= c_de THEN 'es'
        |         ELSE 'de' END AS b
        |  FROM (
        |    SELECT lang,
        |      len(list_filter(string_split(text,' '), w -> w IN ('the','a','and'))) AS c_en,
        |      len(list_filter(string_split(text,' '), w -> w IN ('le','la','et'))) AS c_fr,
        |      len(list_filter(string_split(text,' '), w -> w IN ('el','los','y'))) AS c_es,
        |      len(list_filter(string_split(text,' '), w -> w IN ('der','und','die'))) AS c_de
        |    FROM documents)),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM scored),
        |agree AS (SELECT CAST(count(*) AS BIGINT) AS d FROM scored WHERE a = b),
        |ra AS (SELECT a AS cls, CAST(count(*) AS BIGINT) AS na FROM scored GROUP BY 1),
        |rb AS (SELECT b AS cls, CAST(count(*) AS BIGINT) AS nb FROM scored GROUP BY 1),
        |pe AS (
        |  SELECT CAST(sum(ra.na * rb.nb) AS BIGINT) AS cross_sum
        |  FROM ra JOIN rb ON ra.cls = rb.cls)
        |SELECT n, d AS n_agree,
        |  round(CAST(d AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_o,
        |  round(CAST(cross_sum AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
        |    AS p_e,
        |  round((CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
        |      - CAST(cross_sum AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |    / (1.0 - CAST(cross_sum AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) AS kappa
        |FROM n CROSS JOIN agree CROSS JOIN pe""".stripMargin) { (s, d) =>
      def hits(ws: String*) =
        size(filter(split(col("text"), " "), w => w.isin(ws.map(x => x: Any): _*)))
      val scored = Tables.documents(s, d).select(col("lang").as("a"),
          hits("the", "a", "and").as("c_en"), hits("le", "la", "et").as("c_fr"),
          hits("el", "los", "y").as("c_es"), hits("der", "und", "die").as("c_de"))
        .select(col("a"),
          when(col("c_en") >= col("c_fr") && col("c_en") >= col("c_es")
            && col("c_en") >= col("c_de"), "en")
            .when(col("c_fr") >= col("c_es") && col("c_fr") >= col("c_de"), "fr")
            .when(col("c_es") >= col("c_de"), "es")
            .otherwise("de").as("b"))
      val n = scored.agg(count(lit(1)).as("n"))
      val agree = scored.filter(col("a") === col("b")).agg(count(lit(1)).as("d"))
      val ra = scored.groupBy(col("a").as("cls")).agg(count(lit(1)).as("na"))
      val rb = scored.groupBy(col("b").as("cls")).agg(count(lit(1)).as("nb"))
      val pe = ra.join(rb, "cls").agg(sum(col("na") * col("nb")).as("cross_sum"))
      val nD = col("n").cast("double")
      val po = col("d").cast("double") / nD
      val peD = col("cross_sum").cast("double") / (nD * nD)
      n.crossJoin(broadcast(agree)).crossJoin(broadcast(pe))
        .select(col("n"), col("d").as("n_agree"),
          round(po, 6).as("p_o"), round(peD, 6).as("p_e"),
          round((po - peD) / (lit(1.0) - peD), 6).as("kappa"))
    },

    // ---- A94: McNemar's paired test (week-over-week conversion) ------------
    // The PAIRED counterpart to a39's independence χ²: did individual
    // users flip purchasing state between week 1 and week 2? Only the
    // discordant cells matter: χ² = (b−c)²/(b+c), plus the continuity-
    // corrected variant. One user-grain conditional aggregate, exact
    // integer cells, one division.
    QueryDef.sql(
      "a94_mcnemar",
      """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        |u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase'
        |      AND datediff('day', d0, CAST(ts AS DATE)) BETWEEN 0 AND 6
        |      THEN 1 ELSE 0 END) AS w1,
        |    max(CASE WHEN event_type = 'purchase'
        |      AND datediff('day', d0, CAST(ts AS DATE)) BETWEEN 7 AND 13
        |      THEN 1 ELSE 0 END) AS w2
        |  FROM events CROSS JOIN d0 GROUP BY 1),
        |t AS (
        |  SELECT
        |    CAST(count(*) FILTER (WHERE w1 = 1 AND w2 = 1) AS BIGINT) AS a,
        |    CAST(count(*) FILTER (WHERE w1 = 1 AND w2 = 0) AS BIGINT) AS b,
        |    CAST(count(*) FILTER (WHERE w1 = 0 AND w2 = 1) AS BIGINT) AS c,
        |    CAST(count(*) FILTER (WHERE w1 = 0 AND w2 = 0) AS BIGINT) AS d
        |  FROM u)
        |SELECT a, b, c, d,
        |  CASE WHEN b + c > 0 THEN
        |    round(CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE), 6)
        |  ELSE NULL END AS chi2,
        |  CASE WHEN b + c > 0 THEN
        |    round(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
        |      / CAST(b + c AS DOUBLE), 6)
        |  ELSE NULL END AS chi2_cc
        |FROM t""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val d0 = ev.agg(min(col("ts").cast("date")).as("d0"))
      val u = ev.crossJoin(broadcast(d0)).groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "purchase"
            && datediff(col("ts").cast("date"), col("d0")).between(0, 6), 1)
            .otherwise(0)).as("w1"),
          max(when(col("event_type") === "purchase"
            && datediff(col("ts").cast("date"), col("d0")).between(7, 13), 1)
            .otherwise(0)).as("w2"))
      val t = u.agg(
        count(when(col("w1") === 1 && col("w2") === 1, 1)).as("a"),
        count(when(col("w1") === 1 && col("w2") === 0, 1)).as("b"),
        count(when(col("w1") === 0 && col("w2") === 1, 1)).as("c"),
        count(when(col("w1") === 0 && col("w2") === 0, 1)).as("d"))
      val bc = col("b") + col("c")
      t.select(col("a"), col("b"), col("c"), col("d"),
        when(bc > 0, round(((col("b") - col("c")) * (col("b") - col("c")))
          .cast("double") / bc.cast("double"), 6)).otherwise(lit(null)).as("chi2"),
        when(bc > 0, round(((abs(col("b") - col("c")) - 1)
          * (abs(col("b") - col("c")) - 1)).cast("double") / bc.cast("double"), 6))
          .otherwise(lit(null)).as("chi2_cc"))
    }
  )
}
