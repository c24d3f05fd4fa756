package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions

/** Seventy-first frontier batch: time-to-conversion quantiles, stale
  * vector-index recall audit, deterministic text augmentation.
  */
object Frontier71Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- EV82: time-to-conversion quantiles by cohort ------------------------
    // "How long from first signup to first purchase, by signup week?"
    // — the funnel-latency report. First-touch pairs come from one
    // min-aggregate each; gaps are integer µs; p50/p90 are exact
    // order statistics (the w8 middle-rank for the median, the a109
    // ceil-rank for p90) over per-cohort rank windows. Unconverted
    // users count in the cohort but not the quantiles (right-censoring
    // made explicit, not imputed).
    QueryDef.sql(
      "ev82_time_to_convert",
      """WITH su AS (
        |  SELECT user_id, min(ts) AS s_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts
        |  FROM events e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= su.s_ts
        |  GROUP BY 1),
        |g AS (
        |  SELECT su.user_id,
        |    CAST(epoch_us(su.s_ts) // 604800000000 AS BIGINT) AS cohort_week,
        |    CAST(epoch_us(pu.p_ts) - epoch_us(su.s_ts) AS BIGINT) AS gap_us
        |  FROM su LEFT JOIN pu ON su.user_id = pu.user_id),
        |r AS (
        |  SELECT cohort_week, gap_us,
        |    row_number() OVER (PARTITION BY cohort_week ORDER BY gap_us, user_id)
        |      AS rk,
        |    CAST(count(gap_us) OVER (PARTITION BY cohort_week) AS BIGINT) AS m
        |  FROM g WHERE gap_us IS NOT NULL),
        |q AS (
        |  SELECT cohort_week, m,
        |    CAST(sum(CASE WHEN rk = (m + 1) // 2 OR rk = (m + 2) // 2
        |      THEN gap_us ELSE 0 END)
        |      * (CASE WHEN (m + 1) // 2 = (m + 2) // 2 THEN 2 ELSE 1 END)
        |      AS BIGINT) AS p50_us_x2,
        |    CAST(max(CASE WHEN rk = (9 * m + 9) // 10 THEN gap_us END) AS BIGINT)
        |      AS p90_us
        |  FROM r GROUP BY 1, 2),
        |coh AS (
        |  SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(count(gap_us) AS BIGINT) AS n_converted
        |  FROM g GROUP BY 1)
        |SELECT c.cohort_week, c.n_users, c.n_converted, q.p50_us_x2, q.p90_us
        |FROM coh c JOIN q USING (cohort_week)
        |ORDER BY c.cohort_week""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(su, "user_id").filter(col("ts") >= col("s_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
      val g = su.join(pu, Seq("user_id"), "left")
        .select(col("user_id"),
          expr("unix_micros(s_ts) div 604800000000").as("cohort_week"),
          (unix_micros(col("p_ts")) - unix_micros(col("s_ts"))).as("gap_us"))
        .localCheckpoint(true) // cohort sizes and quantiles share the pairs
      val r = g.filter(col("gap_us").isNotNull)
        .withColumn("rk", row_number().over(Window.partitionBy(col("cohort_week"))
          .orderBy(col("gap_us"), col("user_id"))))
        .withColumn("m", count(col("gap_us"))
          .over(Window.partitionBy(col("cohort_week"))))
      val q = r.groupBy(col("cohort_week"), col("m"))
        .agg((sum(when(col("rk") === expr("(m + 1) div 2")
            || col("rk") === expr("(m + 2) div 2"), col("gap_us")).otherwise(0L))
          * when(expr("(m + 1) div 2 = (m + 2) div 2"), 2).otherwise(1))
          .cast("long").as("p50_us_x2"),
          max(when(col("rk") === expr("(9 * m + 9) div 10"), col("gap_us")))
            .cast("long").as("p90_us"))
      val coh = g.groupBy(col("cohort_week"))
        .agg(count(lit(1)).as("n_users"), count(col("gap_us")).as("n_converted"))
      coh.join(q.drop("m"), "cohort_week")
        .select(col("cohort_week"), col("n_users"), col("n_converted"),
          col("p50_us_x2"), col("p90_us"))
        .orderBy(col("cohort_week"))
    },

    // ---- V41: stale-index recall audit ---------------------------------------
    // The vector-ops freshness question: an index built BEFORE the last
    // 10% of vectors landed serves queries against the full corpus —
    // how much recall does staleness cost? Index = d13's deterministic
    // sign-LSH bands over the 90% snapshot; truth = exact top-5 over
    // everything. The whole audit is deterministic → hash-gated, per
    // query. New vectors are invisible to the index BY CONSTRUCTION,
    // so recall loss is exactly the staleness penalty.
    QueryDef.sql(
      "v41_stale_index_recall",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 10),
        |stale AS (SELECT * FROM e WHERE vec_id % 10 <> 0),
        |sigs AS (
        |  SELECT vec_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 49),
        |        i -> CASE WHEN CAST(emb[i] AS DOUBLE) >= 0
        |          THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE CAST(0 AS BIGINT) END)),
        |      (a, b) -> a + b) AS sig
        |  FROM e),
        |qb AS (
        |  SELECT s.vec_id, s.sig, k.k,
        |    (s.sig >> CAST(k.k * 6 AS INT)) & 63 AS band
        |  FROM sigs s, (SELECT unnest(generate_series(0, 7)) AS k) k),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS cand_id
        |  FROM qb a JOIN qb b ON a.k = b.k AND a.band = b.band
        |  WHERE a.vec_id < 10 AND b.vec_id % 10 <> 0 AND b.vec_id <> a.vec_id),
        |scored AS (
        |  SELECT c.query_id, c.cand_id,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*s.emb[i])),
        |      (x,y) -> x+y) AS dot
        |  FROM cand c JOIN e q ON q.vec_id = c.query_id
        |  JOIN e s ON s.vec_id = c.cand_id),
        |pred AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT *, rank() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, cand_id) AS r FROM scored) WHERE r <= 5),
        |truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(a.emb)+1), i -> a.emb[i]*b.emb[i])),
        |        (x,y) -> x+y) AS dot,
        |      rank() OVER (PARTITION BY a.vec_id ORDER BY
        |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(a.emb)+1), i -> a.emb[i]*b.emb[i])),
        |          (x,y) -> x+y) DESC, b.vec_id) AS r
        |    FROM e a JOIN e b ON a.vec_id < 10 AND b.vec_id <> a.vec_id)
        |  WHERE r <= 5)
        |SELECT t.query_id,
        |  CAST(count(p.cand_id) AS BIGINT) AS n_hit,
        |  CAST(count(p.cand_id) * 1000 // 5 AS BIGINT) AS recall_permille
        |FROM truth t LEFT JOIN pred p
        |  ON t.query_id = p.query_id AND t.neighbor_id = p.cand_id
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import graft.operators.VectorOps
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("emb"))
      val sigs = e.select(col("vec_id"),
        expr("""aggregate(transform(sequence(1, 48),
            i -> IF(cast(element_at(emb, i) as double) >= 0,
                    shiftleft(cast(1 as bigint), i - 1), cast(0 as bigint))),
          cast(0 as bigint), (a, b) -> a + b)""").as("sig"))
        .localCheckpoint(true)
      val qb = sigs.select(col("vec_id"), col("sig"),
          explode(sequence(lit(0), lit(7))).as("k"))
        .withColumn("band", expr("shiftright(sig, cast(k * 6 as int)) & 63"))
      val qa = qb.filter(col("vec_id") < 10)
        .select(col("k"), col("band"), col("vec_id").as("query_id"))
      val sb = qb.filter(col("vec_id") % 10 =!= 0)
        .select(col("k"), col("band"), col("vec_id").as("cand_id"))
      val cand = qa.join(sb, Seq("k", "band"))
        .filter(col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id")).distinct()
      val qe = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
      val scored = cand.join(broadcast(qe), "query_id")
        .join(e.select(col("vec_id").as("cand_id"), col("emb").as("c_emb")), "cand_id")
        .select(col("query_id"), col("cand_id"),
          VectorOps.dot(col("q_emb"), col("c_emb")).as("dot"))
      val pred = scored.withColumn("r", rank().over(
          Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("cand_id"))))
        .filter(col("r") <= 5).select(col("query_id"), col("cand_id"))
      val truth = e.select(col("vec_id").as("neighbor_id"), col("emb").as("n_emb"))
        .join(broadcast(qe), col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          VectorOps.dot(col("q_emb"), col("n_emb")).as("dot"))
        .withColumn("r", rank().over(
          Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("neighbor_id"))))
        .filter(col("r") <= 5).select(col("query_id"), col("neighbor_id"))
      truth.join(pred.withColumnRenamed("cand_id", "pn"),
          truth("query_id") === pred("query_id") && col("neighbor_id") === col("pn"),
          "left")
        .groupBy(truth("query_id"))
        .agg(count(col("pn")).as("n_hit"),
          expr("cast(count(pn) * 1000 div 5 as bigint)").as("recall_permille"))
        .orderBy(truth("query_id"))
    },

    // ---- T66: deterministic text augmentation --------------------------------
    // Training-data augmentation without an RNG: token dropout (hash %
    // 10 = 0) and duplication (hash % 17 = 0), keyed by the portable
    // rolling hash MIXED with the position (so repeated words augment
    // independently). The augmented SEQUENCE itself is pinned by
    // fingerprinting the rejoined text through the same rolling hash —
    // cross-engine equality of the fingerprint proves byte-equal
    // augmented output, not just matching counts. Map-only.
    QueryDef.sql(
      "t66_text_augment",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, t,
        |    list_transform(range(1, len(t) + 1),
        |      i -> (list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(string_split_regex(t[i], ''),
        |            c -> CAST(ascii(c) AS BIGINT))),
        |          (a, x) -> (a * 31 + x) % 1000000007)
        |        * (i * 2654435 + 1)) % 1000000007) AS hs
        |  FROM toks),
        |aug AS (
        |  SELECT doc_id,
        |    len(t) AS n_orig,
        |    len(list_filter(range(1, len(t) + 1), i -> hs[i] % 10 = 0)) AS n_dropped,
        |    len(list_filter(range(1, len(t) + 1),
        |      i -> hs[i] % 10 <> 0 AND hs[i] % 17 = 0)) AS n_duped,
        |    flatten(list_transform(range(1, len(t) + 1),
        |      i -> CASE WHEN hs[i] % 10 = 0 THEN []::VARCHAR[]
        |        WHEN hs[i] % 17 = 0 THEN [t[i], t[i]] ELSE [t[i]] END)) AS at
        |  FROM h)
        |SELECT doc_id, CAST(n_orig AS BIGINT) AS n_orig,
        |  CAST(n_dropped AS BIGINT) AS n_dropped,
        |  CAST(n_duped AS BIGINT) AS n_duped,
        |  CAST(len(at) AS BIGINT) AS n_aug,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split_regex(array_to_string(at, ' '), ''),
        |      c -> CAST(ascii(c) AS BIGINT))),
        |    (a, x) -> (a * 31 + x) % 1000000007) AS aug_fingerprint
        |FROM aug ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      val h = toks.withColumn("hs", expr(
        """transform(sequence(1, size(t)),
          i -> (aggregate(split(element_at(t, i), ''), cast(0 as bigint),
                  (a, x) -> (a * 31 + ascii(x)) % 1000000007L)
                * (i * 2654435L + 1)) % 1000000007L)"""))
        .localCheckpoint(true) // hashes feed counts and the rebuilt sequence
      val aug = h.select(col("doc_id"),
        size(col("t")).cast("long").as("n_orig"),
        expr("cast(size(filter(sequence(1, size(t)), i -> element_at(hs, i) % 10 = 0)) as bigint)")
          .as("n_dropped"),
        expr("""cast(size(filter(sequence(1, size(t)),
              i -> element_at(hs, i) % 10 != 0 AND element_at(hs, i) % 17 = 0)) as bigint)""")
          .as("n_duped"),
        expr("""flatten(transform(sequence(1, size(t)),
              i -> IF(element_at(hs, i) % 10 = 0, cast(array() as array<string>),
                   IF(element_at(hs, i) % 17 = 0,
                      array(element_at(t, i), element_at(t, i)),
                      array(element_at(t, i))))))""").as("at"))
      aug.select(col("doc_id"), col("n_orig"), col("n_dropped"), col("n_duped"),
          size(col("at")).cast("long").as("n_aug"),
          TextFunctions.rollingFingerprint(concat_ws(" ", col("at")))
            .as("aug_fingerprint"))
        .orderBy(col("doc_id"))
    }
  )
}
