package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Thirty-second frontier batch: Kendall's τ-b, Jensen-Shannon
  * divergence, Durbin-Watson, and embedding hubness.
  */
object Frontier32Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A81: Kendall's τ-b between two daily series ------------------------
    // The rank correlation that a44's Spearman can't give when ties
    // are real: clicks vs purchase revenue at the day grain, all
    // C(n,2) day pairs classified concordant / discordant / x-tied /
    // y-tied in exact integers (the a35 pair-space shape —
    // calendar-bounded), then
    //   τ-b = (C−D)/sqrt((n₀−Tx)·(n₀−Ty))
    // with one sqrt and round 6 at the very end.
    QueryDef.sql(
      "a81_kendall_tau",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |pairs AS (
        |  SELECT a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |cls AS (
        |  SELECT
        |    CAST(count(*) AS BIGINT) AS n0,
        |    CAST(count(*) FILTER (WHERE (bx - ax) * (by - ay) > 0) AS BIGINT) AS c,
        |    CAST(count(*) FILTER (WHERE (bx - ax) * (by - ay) < 0) AS BIGINT) AS d,
        |    CAST(count(*) FILTER (WHERE bx = ax) AS BIGINT) AS tx,
        |    CAST(count(*) FILTER (WHERE by = ay) AS BIGINT) AS ty
        |  FROM pairs)
        |SELECT n0, c, d, tx, ty,
        |  CASE WHEN (n0 - tx) * (n0 - ty) > 0 THEN
        |    round(CAST(c - d AS DOUBLE)
        |      / sqrt(CAST((n0 - tx) * (n0 - ty) AS DOUBLE)), 6)
        |  ELSE NULL END AS tau_b
        |FROM cls""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(when(col("event_type") === "click", 1)).as("x"),
          sum(when(col("event_type") === "purchase",
            floor(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
      val b = daily.select(col("day").as("bday"), col("x").as("bx"), col("y").as("by"))
      val pairs = daily.join(b, col("day") < col("bday"))
      val cls = pairs.agg(
        count(lit(1)).as("n0"),
        count(when((col("bx") - col("x")) * (col("by") - col("y")) > 0, 1)).as("c"),
        count(when((col("bx") - col("x")) * (col("by") - col("y")) < 0, 1)).as("d"),
        count(when(col("bx") === col("x"), 1)).as("tx"),
        count(when(col("by") === col("y"), 1)).as("ty"))
      cls.select(col("n0"), col("c"), col("d"), col("tx"), col("ty"),
        when((col("n0") - col("tx")) * (col("n0") - col("ty")) > 0,
          round((col("c") - col("d")).cast("double")
            / sqrt(((col("n0") - col("tx")) * (col("n0") - col("ty"))).cast("double")), 6))
          .otherwise(lit(null)).as("tau_b"))
    },

    // ---- T45: Jensen-Shannon divergence between sources ----------------------
    // How different are two sources' vocabularies, symmetrically and
    // boundedly? JS(p,q) = ½KL(p‖m) + ½KL(q‖m), m = (p+q)/2, over the
    // union vocabulary of src0 and src1 (count floor ≥ 2 in the pooled
    // table prunes the tail). Probabilities are single divisions of
    // exact counts; each term rounds to 8 dp and sums as DECIMAL (the
    // a57/a68 discipline); absent-term contributions are exactly
    // p·ln(2) by construction and go through the same rounded path.
    QueryDef.sql(
      "t45_js_divergence",
      """WITH tok AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |tc AS (
        |  SELECT term,
        |    CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS ca,
        |    CAST(count(*) FILTER (WHERE source = 'src1') AS BIGINT) AS cb
        |  FROM tok GROUP BY 1 HAVING count(*) >= 2),
        |tot AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS ta, CAST(sum(cb) AS BIGINT) AS tb FROM tc),
        |terms AS (
        |  SELECT CAST(round(
        |      0.5 * (CASE WHEN ca > 0 THEN
        |        (CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
        |          * ln((CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE))
        |            / ((CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)
        |              + CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE)) / 2.0)) ELSE 0.0 END)
        |      + 0.5 * (CASE WHEN cb > 0 THEN
        |        (CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))
        |          * ln((CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))
        |            / ((CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)
        |              + CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE)) / 2.0)) ELSE 0.0 END), 8)
        |    AS DECIMAL(20,8)) AS term
        |  FROM tc CROSS JOIN tot)
        |SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS js_nats
        |FROM terms""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .filter(col("source").isin("src0", "src1"))
        .select(col("source"),
          explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("term"))
      val tc = tok.groupBy(col("term"))
        .agg(count(when(col("source") === "src0", 1)).as("ca"),
          count(when(col("source") === "src1", 1)).as("cb"))
        .filter(col("ca") + col("cb") >= 2)
      val tot = tc.agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
      val p = col("ca").cast("double") / col("ta").cast("double")
      val q = col("cb").cast("double") / col("tb").cast("double")
      val m = (p + q) / 2.0
      val term = round(
        lit(0.5) * when(col("ca") > 0, p * log(p / m)).otherwise(0.0)
          + lit(0.5) * when(col("cb") > 0, q * log(q / m)).otherwise(0.0), 8)
        .cast(DecimalType(20, 8))
      tc.crossJoin(broadcast(tot))
        .select(term.as("term"))
        .agg(count(lit(1)).as("n_terms"),
          round(sum(col("term")).cast("double"), 6).as("js_nats"))
    },

    // ---- A82: Durbin-Watson on the detrended series --------------------------
    // Are the residuals around the 7-day trend serially correlated?
    // DW = Σ(d_t − d_{t−1})² / Σd_t² over w12's detrended-by-7 series
    // — det7 = 7x − trend7 is an EXACT integer, so both sums are exact
    // HUGEINT/DECIMAL and the statistic is one division, round 6.
    // DW ≈ 2 means independent residuals; < 1 or > 3 flags structure
    // the trend missed.
    QueryDef.sql(
      "a82_durbin_watson",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |tr AS (
        |  SELECT day, x,
        |    CAST(sum(x) OVER w AS BIGINT) AS trend7, count(*) OVER w AS nw
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (
        |  SELECT day, 7 * x - trend7 AS d7 FROM tr WHERE nw = 7),
        |lagged AS (
        |  SELECT d7, lag(d7) OVER (ORDER BY day) AS prev FROM det),
        |sums AS (
        |  SELECT
        |    CAST(sum(CAST(d7 AS HUGEINT) * d7) AS HUGEINT) AS ss,
        |    CAST(sum(CASE WHEN prev IS NOT NULL
        |      THEN CAST(d7 - prev AS HUGEINT) * (d7 - prev) ELSE 0 END) AS HUGEINT)
        |      AS sd
        |  FROM lagged)
        |SELECT CAST((SELECT count(*) FROM det) AS BIGINT) AS n_days,
        |  CASE WHEN ss > 0
        |    THEN round(CAST(sd AS DOUBLE) / CAST(ss AS DOUBLE), 6)
        |    ELSE NULL END AS dw
        |FROM sums""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"))
      val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
      val det = daily
        .withColumn("trend7", sum(col("x")).over(w))
        .withColumn("nw", count(lit(1)).over(w))
        .filter(col("nw") === 7)
        .select(col("day"), (lit(7) * col("x") - col("trend7")).as("d7"))
      val lagged = det.withColumn("prev", lag(col("d7"), 1).over(Window.orderBy(col("day"))))
      val sums = lagged.agg(
        sum(col("d7").cast(dec) * col("d7")).as("ss"),
        sum(when(col("prev").isNotNull,
          (col("d7") - col("prev")).cast(dec) * (col("d7") - col("prev")))
          .otherwise(lit(BigDecimal(0)).cast(dec))).as("sd"),
        count(lit(1)).as("n_days"))
      sums.select(col("n_days"),
        when(col("ss") > 0,
          round(col("sd").cast("double") / col("ss").cast("double"), 6))
          .otherwise(lit(null)).as("dw"))
    },

    // ---- V23: embedding hubness audit ----------------------------------------
    // High-dimensional pathology check: do a few "hub" vectors appear
    // in everyone's neighbor lists? Top-3 same-label neighbors by
    // EXACT integer dot product (1e6-quantized — no float in the
    // ranking, unlike v6's cosine), then the k-occurrence histogram:
    // how many vectors appear in 0, 1, 2… other vectors' top-3. Pair
    // space is label-blocked (the v6 posture); the rank is a
    // partitioned WindowGroupLimit per query.
    QueryDef.sql(
      "v23_hubness",
      """WITH q AS (
        |  SELECT vec_id, label, dim,
        |    CAST(floor(CAST(embedding[dim] AS DOUBLE) * 1000000.0) AS BIGINT) AS qd
        |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS dim)),
        |dots AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    CAST(sum(a.qd * b.qd) AS BIGINT) AS dot
        |  FROM q a JOIN q b
        |    ON a.label = b.label AND a.dim = b.dim AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2),
        |top3 AS (
        |  SELECT neighbor_id FROM (
        |    SELECT neighbor_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id)
        |        AS rn
        |    FROM dots) WHERE rn <= 3),
        |occ AS (
        |  SELECT e.vec_id, CAST(COALESCE(t.k, 0) AS BIGINT) AS k
        |  FROM embeddings e LEFT JOIN (
        |    SELECT neighbor_id, count(*) AS k FROM top3 GROUP BY 1) t
        |    ON t.neighbor_id = e.vec_id)
        |SELECT k AS n_times_neighbor, CAST(count(*) AS BIGINT) AS n_vectors
        |FROM occ GROUP BY 1""".stripMargin) { (s, d) =>
      // r5 opt: the top-3 window below needs hashpartitioning(query_id)
      // anyway — pre-partition the probe side by vec_id (the same key
      // through the alias) so the interpreted dot-product fold runs
      // across cores instead of inside the single-row-group scan task.
      // Same exchange count; the heavy projection changes sides.
      val q = graft.operators.Spread.by(Tables.embeddings(s, d), col("vec_id"))
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0d) as bigint))")
            .as("qv"))
      val b = Tables.embeddings(s, d)
        .select(col("label"), col("vec_id").as("neighbor_id"),
          expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0d) as bigint))")
            .as("bqv"))
      val dots = q.join(b, Seq("label"))
        .filter(col("vec_id") =!= col("neighbor_id"))
        .select(col("vec_id").as("query_id"), col("neighbor_id"),
          aggregate(zip_with(col("qv"), col("bqv"), (x, y) => x * y),
            lit(0L), (acc, v) => acc + v).as("dot"))
      val wQ = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("neighbor_id"))
      val top3 = dots.withColumn("rn", row_number().over(wQ)).filter(col("rn") <= 3)
        .select(col("neighbor_id"))
      val occ = Tables.embeddings(s, d).select(col("vec_id"))
        .join(top3.groupBy(col("neighbor_id")).agg(count(lit(1)).as("k")),
          col("vec_id") === col("neighbor_id"), "left")
        .select(coalesce(col("k"), lit(0L)).as("k"))
      occ.groupBy(col("k").as("n_times_neighbor")).agg(count(lit(1)).as("n_vectors"))
    }
  )
}
