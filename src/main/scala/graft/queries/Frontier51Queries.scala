package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions

/** Fifty-first frontier batch: hashed sparse matrix projection,
  * interval-union active time, Fellegi–Sunter record-linkage scoring.
  */
object Frontier51Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- T53: sparse×dense matmul via the hashing trick ---------------------
    // The distributed linear-algebra staple: project the sparse doc-term
    // matrix onto 8 dense "topic" columns. The projection matrix is never
    // materialized, broadcast, or even stored — weight(term, k) derives
    // from the portable rolling hash (t30's), so the whole matmul is
    // explode → (doc,term) partial-agg → ×8 fan-out → (doc,topic)
    // partial-agg: two bounded shuffles at any corpus size and ZERO
    // driver-side model state (the hashing-trick answer to shipping a
    // V×K matrix when V is a web-scale vocabulary). Integer weights in
    // [−100,100] keep every dot product exact. Top-2 topics per doc ride
    // a WindowGroupLimit rank.
    QueryDef.sql(
      "t53_doc_topic_matmul",
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY 1, 2),
        |h AS (
        |  SELECT doc_id, term, tf,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split_regex(term, ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007) AS th
        |  FROM tf),
        |fan AS (
        |  SELECT doc_id, CAST(k.k AS INT) AS topic,
        |    tf * (((th * (2 * k.k + 1) + 1000003 * k.k) % 1000000007) % 201 - 100)
        |      AS contrib
        |  FROM h, (SELECT unnest(generate_series(0, 7)) AS k) k),
        |score AS (
        |  SELECT doc_id, topic, CAST(sum(contrib) AS BIGINT) AS score
        |  FROM fan GROUP BY 1, 2)
        |SELECT doc_id, topic, score, CAST(rnk AS INT) AS rnk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, topic) AS rnk
        |  FROM score) WHERE rnk <= 2""".stripMargin) { (s, d) =>
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .withColumn("th", TextFunctions.rollingFingerprint(col("term")))
      val fan = tf.select(col("doc_id"), col("tf"), col("th"),
          explode(sequence(lit(0), lit(7))).as("topic"))
        .select(col("doc_id"), col("topic").cast("int").as("topic"),
          (col("tf") * (((col("th") * (lit(2) * col("topic") + 1) +
            lit(1000003L) * col("topic")) % 1000000007L) % 201L - 100L)).as("contrib"))
      val score = fan.groupBy(col("doc_id"), col("topic"))
        .agg(sum(col("contrib")).cast("long").as("score"))
      score.withColumn("rnk", row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("topic"))).cast("int"))
        .filter(col("rnk") <= 2)
    },

    // ---- EV69: interval-union active time (billing sweep) -------------------
    // "How long was each user actually active?" — every event opens a
    // 30-minute window; overlaps must not double-bill. The classic sweep:
    // +1/−1 boundary deltas, a per-user running count, and covered time
    // = Σ segment lengths where the count is positive. Start boundaries
    // sort before end boundaries at the same instant (delta DESC) so
    // touching intervals merge; equal-(t,delta) tie permutations cannot
    // change any segment contribution (zero-length inside a tie block).
    // All integer µs. Scale: one user-partitioned window — no global
    // ordering anywhere; the hour-bucket rollup is a crumb aggregate.
    QueryDef.sql(
      "ev69_interval_union",
      """WITH b AS (
        |  SELECT user_id, epoch_us(ts) AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts) + 1800000000, -1 FROM events),
        |sw AS (
        |  SELECT user_id, t, delta,
        |    sum(delta) OVER (PARTITION BY user_id ORDER BY t, delta DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
        |    lead(t) OVER (PARTITION BY user_id ORDER BY t, delta DESC) AS nxt
        |  FROM b),
        |act AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN run > 0 AND nxt IS NOT NULL THEN nxt - t
        |      ELSE 0 END) AS BIGINT) AS active_us
        |  FROM sw GROUP BY 1)
        |SELECT CAST(active_us // 3600000000 AS BIGINT) AS active_hours,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(active_us) AS BIGINT) AS sum_active_us
        |FROM act GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val b = ev.select(col("user_id"), unix_micros(col("ts")).as("t"), lit(1).as("delta"))
        .unionAll(ev.select(col("user_id"),
          (unix_micros(col("ts")) + 1800000000L).as("t"), lit(-1).as("delta")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("delta").desc)
      val sw = b
        .withColumn("run", sum(col("delta"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("nxt", lead(col("t"), 1).over(w))
      val act = sw.groupBy(col("user_id"))
        .agg(sum(when(col("run") > 0 && col("nxt").isNotNull, col("nxt") - col("t"))
          .otherwise(0L)).cast("long").as("active_us"))
      act.groupBy(expr("active_us div 3600000000").cast("long").as("active_hours"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("active_us")).cast("long").as("sum_active_us"))
        .orderBy(col("active_hours"))
    },

    // ---- J12: Fellegi–Sunter record-linkage scoring -------------------------
    // Probabilistic entity resolution, the a92-SPRT way: per-field
    // match/unmatch log-odds ship as FIXED integer micro-nat literals
    // (a configured F-S model — ln(m/u) precomputed once, the standard
    // production deployment), so the pair score is an exact integer sum
    // and the match/possible/nonmatch decision is a pure integer
    // comparison. Candidate pairs are nation-BLOCKED (never all-pairs);
    // fields: market segment (+ln(0.9/0.2)=+1504077 / ln(0.1/0.8)=
    // −2079442), balance within $500 (+ln(0.8/0.1)=+2079442 /
    // ln(0.2/0.9)=−1504077), name last digit (+ln(0.9/0.1)=+2197224 /
    // ln(0.1/0.9)=−2197225). Scale: block-bounded candidates, column
    // algebra, one crumb aggregate per block.
    QueryDef.sql(
      "j12_linkage_score",
      """WITH c AS (
        |  SELECT c_custkey AS k, c_nationkey AS nk, c_mktsegment AS seg,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
        |    right(c_name, 1) AS pd
        |  FROM customer),
        |pairs AS (
        |  SELECT a.nk,
        |    CASE WHEN a.seg = b.seg THEN 1504077 ELSE -2079442 END
        |    + CASE WHEN abs(a.cents - b.cents) <= 50000 THEN 2079442
        |        ELSE -1504077 END
        |    + CASE WHEN a.pd = b.pd THEN 2197224 ELSE -2197225 END AS score
        |  FROM c a JOIN c b ON a.nk = b.nk AND a.k < b.k)
        |SELECT CAST(nk AS BIGINT) AS nationkey,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(*) FILTER (WHERE score >= 3000000) AS BIGINT) AS n_match,
        |  CAST(count(*) FILTER (WHERE score > -3000000 AND score < 3000000)
        |    AS BIGINT) AS n_possible,
        |  CAST(count(*) FILTER (WHERE score <= -3000000) AS BIGINT) AS n_nonmatch
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).select(col("c_custkey").as("k"),
        col("c_nationkey").as("nk"), col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") * 100).cast("long").as("cents"),
        expr("right(c_name, 1)").as("pd"))
      val a = c.select(col("k").as("ak"), col("nk"), col("seg").as("aseg"),
        col("cents").as("ac"), col("pd").as("apd"))
      val b = c.select(col("k").as("bk"), col("nk").as("bnk"), col("seg").as("bseg"),
        col("cents").as("bc"), col("pd").as("bpd"))
      val score =
        when(col("aseg") === col("bseg"), 1504077L).otherwise(-2079442L) +
        when(abs(col("ac") - col("bc")) <= 50000L, 2079442L).otherwise(-1504077L) +
        when(col("apd") === col("bpd"), 2197224L).otherwise(-2197225L)
      a.join(b, col("nk") === col("bnk") && col("ak") < col("bk"))
        .select(col("nk").as("nationkey"), score.as("score"))
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n_pairs"),
          count(when(col("score") >= 3000000L, 1)).as("n_match"),
          count(when(col("score") > -3000000L && col("score") < 3000000L, 1))
            .as("n_possible"),
          count(when(col("score") <= -3000000L, 1)).as("n_nonmatch"))
        .select(col("nationkey").cast("long"), col("n_pairs"), col("n_match"),
          col("n_possible"), col("n_nonmatch"))
        .orderBy(col("nationkey"))
    }
  )
}
