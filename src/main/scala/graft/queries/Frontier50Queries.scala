package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.VectorOps

/** Fiftieth frontier batch: reciprocal-rank-fusion retrieval, split-
  * conformal coverage audit, unpivot/melt reshaping, t-closeness EMD.
  */
object Frontier50Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- V31: reciprocal-rank fusion of two retrieval signals -------------
    // The standard way to combine lexical and semantic retrieval without
    // score calibration: RRF(d) = Σ_systems 1/(60 + rank_s(d)). Here the
    // two systems are cosine (normalized) and raw dot product (MIPS) over
    // the same query set — they disagree exactly where vector norms vary,
    // so the fusion is non-trivial. Contributions are exact integers
    // (10⁹ div (60+rank)); a neighbor outside a system's top-20 gets 0.
    // Scale shape: the pair scan is ONE broadcast(queries) pass computing
    // both scores; both rank windows share the query_id partitioning (one
    // shuffle, WindowGroupLimit bounds shipped rows); fusion is a crumb
    // aggregate over ≤40 rows/query.
    QueryDef.sql(
      "v31_rrf_fusion",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*n.emb[i])), (a,b) -> a+b)
        |      AS dot,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*n.emb[i])), (a,b) -> a+b)
        |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*q.emb[i])), (a,b) -> a+b))
        |     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(n.emb)+1), i -> n.emb[i]*n.emb[i])), (a,b) -> a+b)))
        |      AS cosine
        |  FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id <> q.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    rank() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS r_cos,
        |    rank() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS r_dot
        |  FROM pairs),
        |contrib AS (
        |  SELECT query_id, neighbor_id,
        |    CAST(CASE WHEN r_cos <= 20 THEN 1000000000 // (60 + r_cos) ELSE 0 END
        |      + CASE WHEN r_dot <= 20 THEN 1000000000 // (60 + r_dot) ELSE 0 END
        |      AS BIGINT) AS rrf_score
        |  FROM ranked WHERE r_cos <= 20 OR r_dot <= 20)
        |SELECT query_id, neighbor_id, rrf_score,
        |  CAST(fused_rank AS INT) AS fused_rank
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY rrf_score DESC, neighbor_id) AS fused_rank
        |  FROM contrib) WHERE fused_rank <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), VectorOps.toDouble(col("embedding")).as("q_emb"))
        .withColumn("q_nrm", VectorOps.l2Norm(col("q_emb")))
      val c = emb
        .select(col("vec_id").as("neighbor_id"), VectorOps.toDouble(col("embedding")).as("n_emb"))
        .withColumn("n_nrm", VectorOps.l2Norm(col("n_emb")))
      val pairs = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          VectorOps.dot(col("q_emb"), col("n_emb")).as("dot"),
          VectorOps.cosinePre(col("q_emb"), col("n_emb"), col("q_nrm"), col("n_nrm"))
            .as("cosine"))
      val byQ = Window.partitionBy(col("query_id"))
      val ranked = pairs
        .withColumn("r_cos", rank().over(byQ.orderBy(col("cosine").desc, col("neighbor_id"))))
        .withColumn("r_dot", rank().over(byQ.orderBy(col("dot").desc, col("neighbor_id"))))
      val contrib = ranked.filter(col("r_cos") <= 20 || col("r_dot") <= 20)
        .select(col("query_id"), col("neighbor_id"),
          (when(col("r_cos") <= 20, expr("1000000000 div (60 + r_cos)")).otherwise(0L)
            + when(col("r_dot") <= 20, expr("1000000000 div (60 + r_dot)")).otherwise(0L))
            .cast("long").as("rrf_score"))
      contrib.withColumn("fused_rank",
          row_number().over(byQ.orderBy(col("rrf_score").desc, col("neighbor_id"))).cast("int"))
        .filter(col("fused_rank") <= 5)
    },

    // ---- A109: split-conformal prediction coverage audit -------------------
    // The distribution-free ML-ops check: calibrate a 90% interval on a
    // held-out split, then measure empirical coverage on the rest. The
    // split is the deterministic md5 coin (c5/c20 discipline); the point
    // prediction is the calibration group mean kept EXACT by multiplying
    // residuals through by n_cal (|n·x − Σ|, the a104 trick — no division
    // touches the ranked quantity); q̂ is the ⌈0.9(n+1)⌉-th order
    // statistic via the middle-rank window (w8/a21 discipline). Coverage
    // lands as an integer permille. Scale: one user-grain shuffle per
    // split, a per-group rank window, crumb joins after.
    QueryDef.sql(
      "a109_conformal_coverage",
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 1 ELSE 0 END AS is_cal
        |  FROM events),
        |cal AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
        |    CAST(sum(cents) AS BIGINT) AS sum_cal
        |  FROM ev WHERE is_cal = 1 GROUP BY 1),
        |calres AS (
        |  SELECT e.event_type, abs(c.n_cal * e.cents - c.sum_cal) AS r, e.event_id,
        |    c.n_cal
        |  FROM ev e JOIN cal c USING (event_type) WHERE e.is_cal = 1),
        |qhat AS (
        |  SELECT event_type, r AS q_hat FROM (
        |    SELECT event_type, r, n_cal,
        |      row_number() OVER (PARTITION BY event_type ORDER BY r, event_id) AS rk
        |    FROM calres)
        |  WHERE rk = least((9 * (n_cal + 1) + 9) // 10, n_cal)),
        |test AS (
        |  SELECT e.event_type,
        |    CAST(abs(c.n_cal * e.cents - c.sum_cal) <= q.q_hat AS INT) AS covered
        |  FROM ev e JOIN cal c USING (event_type) JOIN qhat q USING (event_type)
        |  WHERE e.is_cal = 0)
        |SELECT t.event_type, c.n_cal, CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(q.q_hat AS BIGINT) AS q_hat,
        |  CAST(sum(t.covered) AS BIGINT) AS n_covered,
        |  CAST((sum(t.covered) * 1000) // count(*) AS BIGINT) AS coverage_permille
        |FROM test t JOIN cal c USING (event_type) JOIN qhat q USING (event_type)
        |GROUP BY 1, 2, 4 ORDER BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("cents"),
          when(substring(md5(col("event_id").cast("string")), 1, 1) < "8", 1)
            .otherwise(0).as("is_cal"))
        .localCheckpoint(true) // both splits read the same coin flips
      val cal = ev.filter(col("is_cal") === 1).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_cal"), sum(col("cents")).cast("long").as("sum_cal"))
      val calres = ev.filter(col("is_cal") === 1).join(broadcast(cal), "event_type")
        .select(col("event_type"), abs(col("n_cal") * col("cents") - col("sum_cal")).as("r"),
          col("event_id"), col("n_cal"))
      val qhat = calres
        .withColumn("rk", row_number().over(Window.partitionBy(col("event_type"))
          .orderBy(col("r"), col("event_id"))))
        .filter(col("rk") === least(expr("(9 * (n_cal + 1) + 9) div 10"), col("n_cal")))
        .select(col("event_type"), col("r").as("q_hat"))
      ev.filter(col("is_cal") === 0)
        .join(broadcast(cal), "event_type").join(broadcast(qhat), "event_type")
        .select(col("event_type"), col("n_cal"), col("q_hat"),
          (abs(col("n_cal") * col("cents") - col("sum_cal")) <= col("q_hat"))
            .cast("int").as("covered"))
        .groupBy(col("event_type"), col("n_cal"), col("q_hat"))
        .agg(count(lit(1)).as("n_test"), sum(col("covered")).cast("long").as("n_covered"),
          expr("sum(covered) * 1000 div count(*)").cast("long").as("coverage_permille"))
        .select(col("event_type"), col("n_cal"), col("n_test"), col("q_hat"),
          col("n_covered"), col("coverage_permille"))
        .orderBy(col("event_type"))
    },

    // ---- U41: unpivot / melt (wide → long reshaping) ------------------------
    // The missing half of the pivot pair: Spark's native Dataset.unpivot
    // (the UNPIVOT/MELT relational operator, an Expand node — NOT a union
    // of N scans) against DuckDB's UNPIVOT. Measures are cast to one type
    // (BIGINT) up front as the operator requires. Scale shape: one
    // group-by shuffle builds the wide table; the melt itself is a
    // map-side Expand — zero additional shuffles, rows×measures output.
    QueryDef.sql(
      "u41_unpivot_melt",
      """WITH agg AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS sum_price_cents,
        |    CAST(count(*) AS BIGINT) AS n_rows
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, measure, val
        |FROM (UNPIVOT agg ON sum_qty, sum_price_cents, n_rows
        |      INTO NAME measure VALUE val)
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val agg = Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("long")).cast("long").as("sum_qty"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).cast("long")
            .as("sum_price_cents"),
          count(lit(1)).as("n_rows"))
      agg.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price_cents"), col("n_rows")),
          "measure", "val")
        .orderBy(col("l_returnflag"), col("measure"))
    },

    // ---- A110: t-closeness privacy audit (ordered-attribute EMD) -----------
    // k-anonymity's sibling (a previous batch): does any quasi-identifier
    // group's SENSITIVE-value distribution stray too far from the global
    // one? For an ordered attribute the Earth-Mover's Distance has the
    // closed form EMD = (1/(K−1))·Σₖ|P̂cum(k) − Q̂cum(k)| — computed here
    // entirely in integers by cross-multiplying the two CDFs through
    // N·N_g (|cum_g·N − cum_all·N_g|) before the single division into
    // micro units. Bands are fixed price buckets; the band grid is
    // densified (group × 0..K−1) so missing cells count as zeros.
    // Scale shape: one orders-grain aggregate; everything after is
    // K-row-per-group crumb algebra with bounded windows.
    QueryDef.sql(
      "a110_t_closeness",
      """WITH b AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(least(7, CAST(floor(o_totalprice / 75000) AS BIGINT)) AS INT) AS band
        |  FROM orders),
        |cnt AS (
        |  SELECT grp, band, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
        |grid AS (
        |  SELECT g.grp, CAST(k.band AS INT) AS band
        |  FROM (SELECT DISTINCT grp FROM cnt) g,
        |       (SELECT unnest(generate_series(0, 7)) AS band) k),
        |dens AS (
        |  SELECT g.grp, g.band, coalesce(c.c, 0) AS c
        |  FROM grid g LEFT JOIN cnt c ON g.grp = c.grp AND g.band = c.band),
        |cum AS (
        |  SELECT grp, band,
        |    CAST(sum(c) OVER (PARTITION BY grp ORDER BY band) AS BIGINT) AS cum_g,
        |    CAST(sum(c) OVER (PARTITION BY grp) AS BIGINT) AS n_g
        |  FROM dens),
        |gl AS (
        |  SELECT band, CAST(sum(c) AS BIGINT) AS cg FROM dens GROUP BY 1),
        |gcum AS (
        |  SELECT band, CAST(sum(cg) OVER (ORDER BY band) AS BIGINT) AS cum_all,
        |    CAST(sum(cg) OVER () AS BIGINT) AS n_all
        |  FROM gl)
        |SELECT c.grp, max(c.n_g) AS n_g,
        |  CAST(sum(CASE WHEN c.band < 7
        |      THEN abs(c.cum_g * g.n_all - g.cum_all * c.n_g) ELSE 0 END)
        |    * 1000000 // (max(c.n_g) * max(g.n_all) * 7) AS BIGINT) AS emd_micro,
        |  CAST(sum(CASE WHEN c.band < 7
        |      THEN abs(c.cum_g * g.n_all - g.cum_all * c.n_g) ELSE 0 END)
        |    * 1000000 // (max(c.n_g) * max(g.n_all) * 7) > 100000 AS INT)
        |    AS t_violation
        |FROM cum c JOIN gcum g USING (band)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val b = Tables.orders(s, d).select(col("o_orderpriority").as("grp"),
        least(lit(7), floor(col("o_totalprice") / 75000).cast("long")).cast("int")
          .as("band"))
      val cnt = b.groupBy(col("grp"), col("band")).agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // K×G crumb feeding group grid + global CDF
      val grid = cnt.select(col("grp")).distinct()
        .crossJoin(broadcast(s.range(0, 8).select(col("id").cast("int").as("band"))))
      val dens = grid.join(cnt, Seq("grp", "band"), "left")
        .select(col("grp"), col("band"), coalesce(col("c"), lit(0L)).as("c"))
      val wg = Window.partitionBy(col("grp"))
      val cum = dens.select(col("grp"), col("band"),
        sum(col("c")).over(wg.orderBy(col("band"))).cast("long").as("cum_g"),
        sum(col("c")).over(wg).cast("long").as("n_g"))
      val glob = dens.groupBy(col("band")).agg(sum(col("c")).cast("long").as("cg"))
      // 8-row global CDF: the unpartitioned window is a deliberate crumb
      val gcum = glob.select(col("band"),
        sum(col("cg")).over(Window.orderBy(col("band"))).cast("long").as("cum_all"),
        sum(col("cg")).over(Window.partitionBy()).cast("long").as("n_all"))
      val num = sum(when(col("band") < 7,
        abs(col("cum_g") * col("n_all") - col("cum_all") * col("n_g")))
        .otherwise(0L))
      cum.join(broadcast(gcum), "band")
        .groupBy(col("grp"))
        .agg(max(col("n_g")).as("n_g"),
          expr("sum(CASE WHEN band < 7 THEN abs(cum_g * n_all - cum_all * n_g) " +
            "ELSE 0 END) * 1000000 div (max(n_g) * max(n_all) * 7)")
            .cast("long").as("emd_micro"))
        .select(col("grp"), col("n_g"), col("emd_micro"),
          (col("emd_micro") > 100000).cast("int").as("t_violation"))
        .orderBy(col("grp"))
    }
  )
}
