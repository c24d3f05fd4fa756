package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Seventy-sixth frontier batch: covariate balance table, Rocchio
  * pseudo-relevance feedback, abandonment sessions.
  */
object Frontier76Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A137: covariate balance (standardized mean differences) ------------
    // The table every experiment readout starts with: are the arms
    // balanced on pre-treatment covariates? SMD² ships signed in micro
    // units with Δ and the pooled variance EACH floor-quantized once
    // (Δ_micro² div D_micro — the two-stage quantization keeps every
    // product inside BIGINT at any corpus size, unlike the
    // single-fraction form whose numerator breaks 10³⁸). |SMD| < 0.1
    // is the conventional "balanced" verdict and lands as a flag.
    QueryDef.sql(
      "a137_covariate_balance",
      """WITH u AS (
        |  SELECT user_id, CAST(user_id % 2 AS INT) AS t,
        |    CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS v,
        |    CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS c,
        |    CAST(count(*) AS BIGINT) AS e
        |  FROM events GROUP BY 1, 2),
        |lf AS (
        |  SELECT t, 'n_views' AS covariate, v AS x FROM u
        |  UNION ALL SELECT t, 'n_clicks', c FROM u
        |  UNION ALL SELECT t, 'n_events', e FROM u),
        |m AS (
        |  SELECT covariate, t, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s,
        |    CAST(sum(x * x) AS BIGINT) AS ss
        |  FROM lf GROUP BY 1, 2),
        |w AS (
        |  SELECT a.covariate,
        |    a.n AS nt, a.s AS st, a.ss AS sst,
        |    b.n AS nc, b.s AS sc, b.ss AS ssc
        |  FROM m a JOIN m b ON a.covariate = b.covariate
        |    AND a.t = 1 AND b.t = 0),
        |q AS (
        |  SELECT covariate, nt, nc,
        |    (st * nc - sc * nt) * 1000000 // (nt * nc) AS delta_micro,
        |    ((nt * sst - st * st) * 1000000 // (nt * (nt - 1))
        |     + (nc * ssc - sc * sc) * 1000000 // (nc * (nc - 1))) // 2
        |      AS pooled_var_micro
        |  FROM w)
        |SELECT covariate, CAST(delta_micro AS BIGINT) AS delta_micro,
        |  CAST(pooled_var_micro AS BIGINT) AS pooled_var_micro,
        |  CAST(CASE WHEN pooled_var_micro > 0 THEN
        |    (CASE WHEN delta_micro >= 0 THEN 1 ELSE -1 END)
        |    * ((delta_micro * delta_micro) // pooled_var_micro)
        |    END AS BIGINT) AS smd2_signed_micro,
        |  CAST(coalesce(abs((CASE WHEN delta_micro >= 0 THEN 1 ELSE -1 END)
        |    * ((delta_micro * delta_micro) // pooled_var_micro)) < 10000, FALSE)
        |    AS INT) AS balanced
        |FROM q ORDER BY covariate""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"), (col("user_id") % 2).cast("int").as("t"))
        .agg(count(when(col("event_type") === "view", 1)).as("v"),
          count(when(col("event_type") === "click", 1)).as("c"),
          count(lit(1)).as("e"))
        .localCheckpoint(true) // three covariates fan out of one pass
      val lf = u.select(col("t"), lit("n_views").as("covariate"), col("v").as("x"))
        .unionByName(u.select(col("t"), lit("n_clicks").as("covariate"),
          col("c").as("x")))
        .unionByName(u.select(col("t"), lit("n_events").as("covariate"),
          col("e").as("x")))
      val m = lf.groupBy(col("covariate"), col("t"))
        .agg(count(lit(1)).as("n"), sum(col("x")).cast("long").as("s"),
          sum(col("x") * col("x")).cast("long").as("ss"))
      val a = m.filter(col("t") === 1).select(col("covariate"), col("n").as("nt"),
        col("s").as("st"), col("ss").as("sst"))
      val b = m.filter(col("t") === 0).select(col("covariate").as("cb"),
        col("n").as("nc"), col("s").as("sc"), col("ss").as("ssc"))
      val q = a.join(b, col("covariate") === col("cb"))
        .select(col("covariate"), col("nt"), col("nc"),
          expr("(st * nc - sc * nt) * 1000000 div (nt * nc)").as("delta_micro"),
          expr("""((nt * sst - st * st) * 1000000 div (nt * (nt - 1))
                + (nc * ssc - sc * sc) * 1000000 div (nc * (nc - 1))) div 2""")
            .as("pooled_var_micro"))
      q.select(col("covariate"), col("delta_micro").cast("long").as("delta_micro"),
          col("pooled_var_micro").cast("long").as("pooled_var_micro"),
          when(col("pooled_var_micro") > 0,
            when(col("delta_micro") >= 0, 1).otherwise(-1).cast("long")
              * expr("(delta_micro * delta_micro) div pooled_var_micro"))
            .cast("long").as("smd2_signed_micro"))
        .withColumn("balanced",
          coalesce(abs(col("smd2_signed_micro")) < 10000L, lit(false)).cast("int"))
        .orderBy(col("covariate"))
    },

    // ---- V45: Rocchio pseudo-relevance feedback ------------------------------
    // Classic IR query expansion, exactly: retrieve top-3 by dot
    // product, move the query toward their centroid (q' ∝ 6q + Σtop3 —
    // multiplying through by 3 keeps every coordinate an integer in
    // 10⁻³ quantized units), re-retrieve with q'. Both retrieval
    // passes rank pure BIGINT dot products, so the whole feedback loop
    // is hash-gated. The report: the expanded top-3 and how much it
    // overlaps the original.
    QueryDef.sql(
      "v45_rocchio_prf",
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding,
        |    v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT)) AS q
        |  FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS nid, b.q AS nq,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, len(a.q)+1), i -> a.q[i]*b.q[i])),
        |      (x,y) -> x+y) AS dot
        |  FROM e a JOIN e b ON a.vec_id < 10 AND b.vec_id <> a.vec_id),
        |top1 AS (
        |  SELECT query_id, nid, nq FROM (
        |    SELECT *, rank() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, nid) AS r FROM pairs) WHERE r <= 3),
        |cdim AS (
        |  SELECT t.query_id, u.i AS dim, CAST(sum(u.v) AS BIGINT) AS sv
        |  FROM top1 t,
        |    LATERAL (SELECT unnest(t.nq) AS v,
        |             generate_subscripts(t.nq, 1) AS i) u
        |  GROUP BY 1, 2),
        |q2dim AS (
        |  SELECT c.query_id, c.dim, 6 * q0.q[CAST(c.dim AS INT)] + c.sv AS q2
        |  FROM cdim c JOIN e q0 ON q0.vec_id = c.query_id),
        |bdim AS (
        |  SELECT b.vec_id AS nid, u.i AS dim, u.v AS bv
        |  FROM e b,
        |    LATERAL (SELECT unnest(b.q) AS v,
        |             generate_subscripts(b.q, 1) AS i) u),
        |pairs2 AS (
        |  SELECT q.query_id, b.nid, CAST(sum(q.q2 * b.bv) AS BIGINT) AS dot2
        |  FROM q2dim q JOIN bdim b USING (dim)
        |  WHERE b.nid <> q.query_id
        |  GROUP BY 1, 2),
        |top2 AS (
        |  SELECT query_id, nid, dot2, r FROM (
        |    SELECT *, rank() OVER (PARTITION BY query_id
        |      ORDER BY dot2 DESC, nid) AS r FROM pairs2) WHERE r <= 3)
        |SELECT t2.query_id, CAST(t2.r AS INT) AS rnk, t2.nid AS neighbor_id,
        |  CAST(t2.dot2 AS BIGINT) AS score,
        |  CAST(t1.nid IS NOT NULL AS INT) AS was_in_original_top3
        |FROM top2 t2 LEFT JOIN top1 t1
        |  ON t2.query_id = t1.query_id AND t2.nid = t1.nid
        |ORDER BY t2.query_id, rnk""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d).select(col("vec_id"),
          expr("transform(embedding, v -> cast(floor(cast(v as double) * 1000) as bigint))")
            .as("q"))
        .localCheckpoint(true) // quantized once; both passes + centroid reuse it
      val qset = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("q").as("q0"))
      val pairs = e.select(col("vec_id").as("nid"), col("q").as("nq"))
        .join(broadcast(qset), col("nid") =!= col("query_id"))
        .select(col("query_id"), col("nid"), col("nq"),
          expr("aggregate(zip_with(q0, nq, (a, b) -> a * b), cast(0 as bigint), (x, y) -> x + y)")
            .as("dot"))
      val top1 = pairs.withColumn("r", rank().over(
          Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("nid"))))
        .filter(col("r") <= 3).select(col("query_id"), col("nid"), col("nq"))
        .localCheckpoint(true) // feeds the centroid and the overlap flag
      val cdim = top1
        .select(col("query_id"), posexplode(col("nq")).as(Seq("d0", "v")))
        .groupBy(col("query_id"), (col("d0") + 1).as("dim"))
        .agg(sum(col("v")).cast("long").as("sv"))
      val q0dim = qset
        .select(col("query_id"), posexplode(col("q0")).as(Seq("d0", "qv")))
        .select(col("query_id"), (col("d0") + 1).as("dim"), col("qv"))
      val q2dim = cdim.join(q0dim, Seq("query_id", "dim"))
        .select(col("query_id"), col("dim"),
          (lit(6) * col("qv") + col("sv")).as("q2"))
      val bdim = e
        .select(col("vec_id").as("nid"), posexplode(col("q")).as(Seq("d0", "bv")))
        .select(col("nid"), (col("d0") + 1).as("dim"), col("bv"))
      val pairs2 = bdim.join(broadcast(q2dim), Seq("dim"))
        .filter(col("nid") =!= col("query_id"))
        .groupBy(col("query_id"), col("nid"))
        .agg(sum(col("q2") * col("bv")).cast("long").as("dot2"))
      val top2 = pairs2.withColumn("r", rank().over(
          Window.partitionBy(col("query_id")).orderBy(col("dot2").desc, col("nid"))))
        .filter(col("r") <= 3)
      top2.join(top1.select(col("query_id").as("q1"), col("nid").as("n1")),
          top2("query_id") === col("q1") && top2("nid") === col("n1"), "left")
        .select(top2("query_id"), col("r").cast("int").as("rnk"),
          col("nid").as("neighbor_id"), col("dot2").cast("long").as("score"),
          col("n1").isNotNull.cast("int").as("was_in_original_top3"))
        .orderBy(top2("query_id"), col("rnk"))
    },

    // ---- EV88: abandonment sessions -------------------------------------------
    // The product metric behind every checkout funnel: sessions (30-min
    // gap rule, the house sessionizer) that CLICK but never PURCHASE.
    // Reported per session-start day with an abandonment permille. One
    // user window for session ids, one session aggregate, one day
    // rollup.
    QueryDef.sql(
      "ev88_abandonment",
      """WITH l AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |      OR lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      THEN 1 ELSE 0 END AS ns
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, event_type,
        |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM l),
        |agg AS (
        |  SELECT user_id, sid, CAST(min(ts) AS TIMESTAMP) AS start_ts,
        |    CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS INT)
        |      AS has_click,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT)
        |      AS has_purchase
        |  FROM sess GROUP BY 1, 2)
        |SELECT CAST(start_ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(count(CASE WHEN has_click = 1 AND has_purchase = 0 THEN 1 END)
        |    AS BIGINT) AS n_abandoned,
        |  CAST(count(CASE WHEN has_click = 1 AND has_purchase = 0 THEN 1 END)
        |    * 1000 // count(*) AS BIGINT) AS abandon_permille
        |FROM agg GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val l = Tables.events(s, d)
        .withColumn("ns",
          when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(wo)
            > 1800000000L ||
            lag(unix_micros(col("ts")), 1).over(wo).isNull, 1).otherwise(0))
      val sess = l.withColumn("sid", sum(col("ns"))
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val agg = sess.groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts")).as("start_ts"),
          max(when(col("event_type") === "click", 1).otherwise(0)).as("has_click"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("has_purchase"))
      agg.groupBy(col("start_ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          count(when(col("has_click") === 1 && col("has_purchase") === 0, 1))
            .as("n_abandoned"),
          expr("""cast(count(CASE WHEN has_click = 1 AND has_purchase = 0
                THEN 1 END) * 1000 div count(*) as bigint)""")
            .as("abandon_permille"))
        .orderBy(col("day"))
    }
  )
}
