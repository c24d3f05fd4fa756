package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{ShardedRank, VectorOps}

/** Thirty-fifth frontier batch: compaction planning, retrieval-quality
  * metrics (MRR / nDCG), RFM segment migration, term burstiness, and
  * inter-arrival Poisson diagnostics.
  */
object Frontier35Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- U31: small-file compaction planner --------------------------------
    // The table-maintenance planner every lake needs: from day-grain
    // partition stats (rows + exact byte estimate from octet_length),
    // assign each day to a compaction group where the EXCLUSIVE byte
    // prefix crosses the 256 KB target — i.e. group g holds the days
    // whose predecessor-cumsum lies in [g·T, (g+1)·T). Pure integer
    // planning over the calendar grain: one partial-agg shuffle to
    // day stats, a calendar-bounded prefix window, zero row-level data
    // movement. At production scale T is 128 MB and the groups feed a
    // rewrite job directly.
    QueryDef.sql(
      "u31_compaction_plan",
      """WITH stats AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CAST(strlen(props) + 64 AS BIGINT)) AS BIGINT) AS bytes
        |  FROM events GROUP BY 1),
        |pfx AS (
        |  SELECT day, n_rows, bytes,
        |    CAST(coalesce(sum(bytes) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS bytes_before
        |  FROM stats)
        |SELECT day, n_rows, bytes,
        |  CAST(bytes_before // 262144 AS INT) AS compaction_group
        |FROM pfx""".stripMargin) { (s, d) =>
      val stats = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n_rows"),
          sum((octet_length(col("props")) + 64).cast("long")).as("bytes"))
      // calendar-bounded prefix (≤ 366 rows/year by construction)
      val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, -1)
      stats
        .withColumn("bytes_before", coalesce(sum(col("bytes")).over(w), lit(0L)))
        .select(col("day"), col("n_rows"), col("bytes"),
          expr("bytes_before div 262144").cast("int").as("compaction_group"))
    },

    // ---- V26: retrieval-quality metrics (MRR + nDCG@5) ---------------------
    // The evaluation harness for every retrieval op in the v-family:
    // exact cosine top-5 (v2's deterministic brute path) scored
    // against label relevance. Reciprocal rank is 1/first-relevant-
    // rank (an exact small-integer reciprocal); DCG terms are
    // rel_i · 1/log2(i+1) with each log-derived weight rounded to 8 dp
    // (libm 1-ulp discipline) and folded in rank order; IDCG re-folds
    // the same weights over the ideal prefix. Per-query rows — no
    // cross-query float aggregation to go nondeterministic.
    QueryDef.sql(
      "v26_retrieval_metrics",
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
        |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |    (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, q.label AS q_label,
        |    n.vec_id AS neighbor_id, n.label AS n_label,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(q.emb) + 1), i -> q.emb[i] * n.emb[i])),
        |      (x, y) -> x + y) / (q.nrm * n.nrm) AS cosine
        |  FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id >= 10),
        |topk AS (
        |  SELECT query_id, CASE WHEN q_label = n_label THEN 1 ELSE 0 END AS rel, rnk
        |  FROM (SELECT *, rank() OVER (PARTITION BY query_id
        |          ORDER BY cosine DESC, neighbor_id) AS rnk FROM pairs)
        |  WHERE rnk <= 5),
        |agg AS (
        |  SELECT query_id, list(rel ORDER BY rnk) AS rels,
        |    min(CASE WHEN rel = 1 THEN rnk END) AS first_rel,
        |    CAST(sum(rel) AS BIGINT) AS n_rel
        |  FROM topk GROUP BY 1)
        |SELECT query_id, coalesce(CAST(first_rel AS INT), 0) AS first_rel_rank, n_rel,
        |  CASE WHEN first_rel IS NULL THEN 0.0
        |    ELSE 1.0 / CAST(first_rel AS DOUBLE) END AS rr,
        |  CASE WHEN n_rel = 0 THEN 0.0 ELSE round(
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(rels) + 1),
        |        i -> CAST(rels[i] AS DOUBLE)
        |          * round(1.0 / (ln(CAST(i + 1 AS DOUBLE)) / ln(2.0)), 8))),
        |      (a, b) -> a + b)
        |    / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, n_rel + 1),
        |        p -> round(1.0 / (ln(CAST(p + 1 AS DOUBLE)) / ln(2.0)), 8))),
        |      (a, b) -> a + b), 6) END AS ndcg
        |FROM agg""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val knn = VectorOps.knnBrute(
        emb.filter(col("vec_id") < 10), emb.filter(col("vec_id") >= 10), k = 5)
      val labels = emb.select(col("vec_id"), col("label"))
      // query-side labels inherit the key-capped vec_id < 10 bound;
      // the neighbor side is corpus-sized, so the BOUNDED accumulating
      // frame (<= queries*k rows) carries the broadcast hint instead
      val topk = broadcast(knn
        .join(broadcast(labels.select(col("vec_id").as("query_id"),
          col("label").as("q_label"))), "query_id"))
        .join(labels.select(col("vec_id").as("neighbor_id"),
          col("label").as("n_label")), "neighbor_id")
        .select(col("query_id"),
          when(col("q_label") === col("n_label"), 1).otherwise(0).as("rel"),
          col("rnk"))
      val agg = topk.groupBy(col("query_id"))
        .agg(
          transform(sort_array(collect_list(struct(col("rnk"), col("rel")))),
            x => x.getField("rel")).as("rels"),
          min(when(col("rel") === 1, col("rnk"))).as("first_rel"),
          sum(col("rel")).as("n_rel"))
      def w2(p: Column): Column =
        round(lit(1.0) / (log(p.cast("double") + 1.0) / log(lit(2.0))), 8)
      val dcg = aggregate(
        zip_with(col("rels"), sequence(lit(1), size(col("rels"))),
          (r, i) => r.cast("double") * w2(i)),
        lit(0.0), (a, b) => a + b)
      val idcg = aggregate(transform(sequence(lit(1), col("n_rel").cast("int")),
        p => w2(p)), lit(0.0), (a, b) => a + b)
      agg.select(col("query_id"),
        coalesce(col("first_rel").cast("int"), lit(0)).as("first_rel_rank"),
        col("n_rel"),
        when(col("first_rel").isNull, 0.0)
          .otherwise(lit(1.0) / col("first_rel").cast("double")).as("rr"),
        when(col("n_rel") === 0, 0.0).otherwise(round(dcg / idcg, 6)).as("ndcg"))
    },

    // ---- EV59: RFM segment migration (first half → second half) ------------
    // Which value tier did each user move to? Monetary quintiles
    // computed INDEPENDENTLY per month-half (a47's ShardedRank + the
    // closed-form ((rk−1)·5) div n — no ntile, no unpartitioned
    // window), then the full-outer user join gives the 6×6 migration
    // matrix (quintile 0 = absent that half). The matrix itself is
    // 36 bounded cells; everything upstream is partial-agg shuffles.
    QueryDef.sql(
      "ev59_segment_migration",
      """WITH anchor AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        |pe AS (
        |  SELECT user_id,
        |    CASE WHEN datediff('day', d0, CAST(ts AS DATE)) < 15 THEN 0 ELSE 1 END
        |      AS half,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events CROSS JOIN anchor WHERE event_type = 'purchase'),
        |cu AS (SELECT half, user_id, CAST(sum(cents) AS BIGINT) AS cents
        |  FROM pe GROUP BY 1, 2),
        |n AS (SELECT half, CAST(count(*) AS BIGINT) AS n FROM cu GROUP BY 1),
        |rk AS (
        |  SELECT cu.half, user_id,
        |    row_number() OVER (PARTITION BY cu.half ORDER BY cents DESC, user_id)
        |      AS rk, n.n
        |  FROM cu JOIN n ON cu.half = n.half),
        |q AS (SELECT half, user_id, CAST(((rk - 1) * 5) // n AS INT) + 1 AS quintile
        |  FROM rk),
        |m AS (
        |  SELECT coalesce(a.user_id, b.user_id) AS user_id,
        |    coalesce(a.quintile, 0) AS q_first, coalesce(b.quintile, 0) AS q_second
        |  FROM (SELECT user_id, quintile FROM q WHERE half = 0) a
        |  FULL OUTER JOIN (SELECT user_id, quintile FROM q WHERE half = 1) b
        |    ON a.user_id = b.user_id)
        |SELECT q_first, q_second, CAST(count(*) AS BIGINT) AS n_users
        |FROM m GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val anchor = Tables.events(s, d).agg(min(col("ts").cast("date")).as("d0"))
      val pe = Tables.events(s, d).filter(col("event_type") === "purchase")
        .crossJoin(broadcast(anchor))
        .select(col("user_id"),
          when(datediff(col("ts").cast("date"), col("d0")) < 15, 0).otherwise(1)
            .as("half"),
          floor(col("value") * 100).cast("long").as("cents"))
      // r5 opt: cu feeds both half-rankings and the quintile-count table
      // — checkpoint once so the events scan + per-user aggregate run
      // once instead of once per consumer (ShardedRank persists only
      // its own filtered slice).
      val cu = pe.groupBy(col("half"), col("user_id")).agg(sum(col("cents")).as("cents"))
        .localCheckpoint(true)
      val n = cu.groupBy(col("half")).agg(count(lit(1)).as("n"))
      def half(h: Int): DataFrame = {
        val part = cu.filter(col("half") === h)
        ShardedRank.withRank(part, "rk", col("cents").desc, col("user_id"))
          .crossJoin(broadcast(n.filter(col("half") === h).select(col("n"))))
          .select(col("user_id"),
            (expr("((rk - 1) * 5) div n").cast("int") + 1).as(s"q$h"))
      }
      val m = half(0).join(half(1), Seq("user_id"), "full_outer")
        .select(coalesce(col("q0"), lit(0)).as("q_first"),
          coalesce(col("q1"), lit(0)).as("q_second"))
      m.groupBy(col("q_first"), col("q_second")).agg(count(lit(1)).as("n_users"))
    },

    // ---- T48: term burstiness (Fano factor) --------------------------------
    // Content words burst (a doc that mentions them mentions them
    // often); function words spread evenly. The Fano factor
    // Var/mean of per-document counts — zeros included via the
    // moment identity Var·N = Σc² − cf²/N — separates them with no
    // per-doc explosion beyond the token scan: Σc² and cf are exact
    // BIGINT moments per term, N is a broadcast scalar, and
    // Fano = (N·Σc² − cf²) / (N·cf) is one fixed-order double
    // expression. Vocabulary-bounded output.
    QueryDef.sql(
      "t48_burstiness",
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |dc AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |tm AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(c) AS BIGINT) AS cf,
        |    CAST(sum(c * c) AS BIGINT) AS c2
        |  FROM dc GROUP BY 1)
        |SELECT term, df, cf,
        |  round((CAST(n_docs AS DOUBLE) * CAST(c2 AS DOUBLE)
        |      - CAST(cf AS DOUBLE) * CAST(cf AS DOUBLE))
        |    / (CAST(n_docs AS DOUBLE) * CAST(cf AS DOUBLE)), 6) AS fano
        |FROM tm CROSS JOIN n WHERE cf >= 50""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val tok = docs.select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("term"))
      val dc = tok.groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("c"))
      val tm = dc.groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("c")).as("cf"),
          sum(col("c") * col("c")).as("c2"))
      tm.crossJoin(broadcast(n)).filter(col("cf") >= 50)
        .select(col("term"), col("df"), col("cf"),
          round((col("n_docs").cast("double") * col("c2").cast("double")
            - col("cf").cast("double") * col("cf").cast("double"))
            / (col("n_docs").cast("double") * col("cf").cast("double")), 6).as("fano"))
    },

    // ---- EV60: inter-arrival exponential fit (Poisson diagnostic) ----------
    // Is each event stream Poisson? The exponential-MLE rate is just
    // n/Σgap, and the squared coefficient of variation of the gaps —
    // CV² = n·Σg²/(Σg)² − 1 — is 1 for exponential arrivals, <1 for
    // regular (bot-like) traffic, >1 for bursty. Gaps are exact
    // integer microseconds from one PARTITIONED lag per type; Σg² goes
    // through DECIMAL(38,0) (a month-long gap squared overflows
    // BIGINT), and the mean gap is reported as a truncated integer —
    // divisions of exact integers only, no round-half exposure.
    QueryDef.sql(
      "ev60_interarrival_fit",
      """WITH s AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts))
        |      OVER (PARTITION BY event_type ORDER BY ts, event_id) AS g
        |  FROM events),
        |gaps AS (SELECT event_type, g FROM s WHERE g IS NOT NULL),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |    CAST(sum(g) AS BIGINT) AS sg,
        |    CAST(sum(CAST(g AS DECIMAL(19,0)) * CAST(g AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS sg2
        |  FROM gaps GROUP BY 1)
        |SELECT event_type, n_gaps,
        |  CAST(sg // n_gaps AS BIGINT) AS mean_gap_us,
        |  round(CAST(n_gaps AS DOUBLE) * CAST(sg2 AS DOUBLE)
        |    / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) - 1.0, 6) AS cv2
        |FROM m""".stripMargin) { (s, d) =>
      val wT = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      val ep = unix_micros(col("ts"))
      val gaps = Tables.events(s, d)
        .select(col("event_type"), (ep - lag(ep, 1).over(wT)).as("g"))
        .filter(col("g").isNotNull)
      val m = gaps.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"), sum(col("g")).as("sg"),
          sum(col("g").cast(DecimalType(19, 0)) * col("g").cast(DecimalType(19, 0)))
            .cast(DecimalType(38, 0)).as("sg2"))
      m.select(col("event_type"), col("n_gaps"),
        expr("sg div n_gaps").cast("long").as("mean_gap_us"),
        round(col("n_gaps").cast("double") * col("sg2").cast("double")
          / (col("sg").cast("double") * col("sg").cast("double")) - 1.0, 6).as("cv2"))
    }
  )
}
