package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Thirty-third frontier batch: binary-quantized Hamming retrieval,
  * Theil–Sen robust trend, Heaps'-law vocabulary growth, Markov
  * next-event prediction, and Brown–Forsythe variance homogeneity.
  */
object Frontier33Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- V24: binary quantization + Hamming top-k --------------------------
    // The 1-bit storage tier below v13's int4: sign-bit codes packed
    // 32 dims per BIGINT word (two words for the 64-dim corpus; 32-bit
    // words keep every packed value positive, sidestepping the
    // engine-specific 1<<63 sign-bit edge in BOTH engines). Unlike the
    // recall-bounded ANN rows (v3/v5), Hamming retrieval over sign
    // codes is FULLY deterministic — code words, distances, and the
    // per-query top-5 all hash-check. Packing is scan-stage Column
    // algebra (aggregate over a 32-element sequence → one long per
    // word); search is bit_count(xor) — exactly the SIMD-friendly
    // shape a 100 TB vector store runs, with the 16× smaller code
    // table the only thing shuffled.
    QueryDef.sql(
      "v24_binary_hamming",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |c AS (SELECT vec_id,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(0, 32),
        |      i -> CASE WHEN emb[i + 1] >= 0 THEN (CAST(1 AS BIGINT) << i)
        |           ELSE CAST(0 AS BIGINT) END)), (a, b) -> a + b) AS BIGINT) AS w0,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(32, 64),
        |      i -> CASE WHEN emb[i + 1] >= 0 THEN (CAST(1 AS BIGINT) << (i - 32))
        |           ELSE CAST(0 AS BIGINT) END)), (a, b) -> a + b) AS BIGINT) AS w1
        |  FROM e),
        |q AS (SELECT vec_id AS query_id, w0 AS qw0, w1 AS qw1 FROM c WHERE vec_id < 10),
        |db AS (SELECT vec_id AS neighbor_id, w0, w1 FROM c WHERE vec_id >= 10),
        |d AS (SELECT query_id, neighbor_id,
        |  CAST(bit_count(xor(qw0, w0)) + bit_count(xor(qw1, w1)) AS INT) AS hamming
        |  FROM q CROSS JOIN db)
        |SELECT query_id, neighbor_id, hamming, CAST(rn AS INT) AS rn FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY hamming, neighbor_id) AS rn
        |  FROM d) WHERE rn <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
      def word(lo: Int): org.apache.spark.sql.Column =
        aggregate(sequence(lit(lo), lit(lo + 31)), lit(0L),
          (a, i) => a + when(element_at(col("emb"), i + 1) >= 0,
            call_function("shiftleft", lit(1L), i - lit(lo))).otherwise(lit(0L)))
      val codes = emb.select(col("vec_id"), word(0).as("w0"), word(32).as("w1"))
      val q = codes.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("w0").as("qw0"), col("w1").as("qw1"))
      val db = codes.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("neighbor_id"), col("w0"), col("w1"))
      val ham = (bit_count(col("qw0").bitwiseXOR(col("w0")))
        + bit_count(col("qw1").bitwiseXOR(col("w1")))).cast("int")
      // broadcast the ≤10-row QUERY side explicitly — left alone the
      // planner picked BuildRight and shipped the corpus-sized code
      // table to every task (the one real violation the r5 PlanSweep
      // found)
      val pairs = broadcast(q).crossJoin(db)
        .select(col("query_id"), col("neighbor_id"), ham.as("hamming"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("hamming"), col("neighbor_id"))
      pairs.withColumn("rn", row_number().over(w).cast("int")).filter(col("rn") <= 5)
    },

    // ---- A83: Theil–Sen robust slope on the daily revenue series -----------
    // The outlier-proof trend estimator a17's OLS isn't: the median of
    // all C(n,2) pairwise slopes of (day index, purchase cents). The
    // pair space is CALENDAR-bounded — C(30,2)=435 here, ≤ C(366,2)
    // per year no matter how many raw events feed the daily rollup —
    // so the global rank window ranks a fixed-grain set, not the data.
    // Each slope is ONE division of exact integers (cents / days);
    // the median is middle-rank selection (sum of ≤ 2 doubles / their
    // count), never engine interpolation.
    QueryDef.sql(
      "a83_theil_sen",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |idx AS (SELECT CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS x, y
        |  FROM daily),
        |pairs AS (
        |  SELECT a.x AS ax, CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
        |  FROM idx a JOIN idx b ON a.x < b.x),
        |r AS (SELECT slope,
        |  row_number() OVER (ORDER BY slope, ax) AS rn,
        |  count(*) OVER () AS n FROM pairs)
        |SELECT CAST(max(n) AS BIGINT) AS n_pairs,
        |  round(sum(slope) FILTER (WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2)
        |    / count(*) FILTER (WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2), 6)
        |    AS sen_slope_cents_per_day
        |FROM r""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
      val idx = daily.select(
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long").as("x"), col("y"))
      val b = idx.select(col("x").as("bx"), col("y").as("by"))
      val pairs = idx.join(b, col("x") < col("bx"))
        .select(col("x").as("ax"),
          ((col("by") - col("y")).cast("double")
            / (col("bx") - col("x")).cast("double")).as("slope"))
      // Calendar-bounded global rank (≤ C(366,2) rows/year by construction).
      val r = pairs
        .withColumn("rn", row_number().over(Window.orderBy(col("slope"), col("ax"))))
        .crossJoin(broadcast(pairs.agg(count(lit(1)).as("n"))))
      val mid = col("rn") === expr("(n + 1) div 2") || col("rn") === expr("(n + 2) div 2")
      r.agg(max(col("n")).as("n_pairs"),
        round(sum(when(mid, col("slope"))) / count(when(mid, 1)), 6)
          .as("sen_slope_cents_per_day"))
    },

    // ---- T46: Heaps'-law vocabulary-growth fit -----------------------------
    // How fast does the vocabulary grow as the corpus grows — the
    // number a tokenizer-budget plan (c29) needs before committing a
    // vocab size. V(n) = K·n^β fitted by OLS on (ln n, ln V) at 20
    // FIXED-GRAIN checkpoints: docs bucket by doc_id range (integer
    // div against a broadcast max — no global row window over docs),
    // per-bucket token counts and first-occurrence vocab counts
    // prefix-sum over the 20-row bucket grain only. Logs round to 8 dp
    // (absorbing libm's 1-ulp), then the four OLS moments fold in
    // bucket order (the a41 ordered-fold discipline) so double sums
    // are order-deterministic; β and ln K are single fixed-order
    // expressions rounded at the very end.
    QueryDef.sql(
      "t46_heaps_law",
      """WITH mx AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS m FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |tb AS (SELECT least(19, CAST((doc_id * 20) // m AS INT)) AS bucket, term
        |  FROM tok CROSS JOIN mx),
        |tc AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tok FROM tb GROUP BY 1),
        |fv AS (SELECT term, min(bucket) AS fb FROM tb GROUP BY 1),
        |nv AS (SELECT fb AS bucket, CAST(count(*) AS BIGINT) AS n_new FROM fv GROUP BY 1),
        |cum AS (
        |  SELECT tc.bucket,
        |    CAST(sum(tc.n_tok) OVER (ORDER BY tc.bucket) AS BIGINT) AS cum_tok,
        |    CAST(sum(coalesce(nv.n_new, 0)) OVER (ORDER BY tc.bucket) AS BIGINT) AS cum_voc
        |  FROM tc LEFT JOIN nv ON tc.bucket = nv.bucket),
        |pts AS (
        |  SELECT bucket, round(ln(CAST(cum_tok AS DOUBLE)), 8) AS xl,
        |    round(ln(CAST(cum_voc AS DOUBLE)), 8) AS yl
        |  FROM cum WHERE cum_tok > 0 AND cum_voc > 0),
        |mom AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(xl ORDER BY bucket)),
        |      (a, b) -> a + b) AS sx,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(yl ORDER BY bucket)),
        |      (a, b) -> a + b) AS sy,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(xl * yl ORDER BY bucket)),
        |      (a, b) -> a + b) AS sxy,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(xl * xl ORDER BY bucket)),
        |      (a, b) -> a + b) AS sxx
        |  FROM pts)
        |SELECT n AS n_points,
        |  round((CAST(n AS DOUBLE) * sxy - sx * sy)
        |    / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS beta,
        |  round((sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
        |    / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx) / CAST(n AS DOUBLE), 6)
        |    AS ln_k
        |FROM mom""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val mx = docs.agg((max(col("doc_id")) + 1).cast("long").as("m"))
      val tok = docs
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("term"))
      val tb = tok.crossJoin(broadcast(mx))
        .select(least(lit(19), expr("(doc_id * 20) div m").cast("int")).as("bucket"),
          col("term"))
      val tc = tb.groupBy(col("bucket")).agg(count(lit(1)).as("n_tok"))
      val nv = tb.groupBy(col("term")).agg(min(col("bucket")).as("fb"))
        .groupBy(col("fb").as("bucket")).agg(count(lit(1)).as("n_new"))
      // Bucket grain is fixed at 20 rows by construction — windows here
      // order a constant-size set, not the corpus.
      val wb = Window.orderBy(col("bucket"))
      val cum = tc.join(nv, Seq("bucket"), "left")
        .select(col("bucket"),
          sum(col("n_tok")).over(wb).as("cum_tok"),
          sum(coalesce(col("n_new"), lit(0L))).over(wb).as("cum_voc"))
      val pts = cum.filter(col("cum_tok") > 0 && col("cum_voc") > 0)
        .select(col("bucket"),
          round(log(col("cum_tok").cast("double")), 8).as("xl"),
          round(log(col("cum_voc").cast("double")), 8).as("yl"))
      def fold(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        aggregate(transform(sort_array(collect_list(struct(col("bucket"), c.as("v")))),
          x => x.getField("v")), lit(0.0), (a, b) => a + b)
      val mom = pts.agg(count(lit(1)).as("n"),
        fold(col("xl")).as("sx"), fold(col("yl")).as("sy"),
        fold(col("xl") * col("yl")).as("sxy"), fold(col("xl") * col("xl")).as("sxx"))
      val nD = col("n").cast("double")
      val beta = (nD * col("sxy") - col("sx") * col("sy")) /
        (nD * col("sxx") - col("sx") * col("sx"))
      mom.select(col("n").as("n_points"), round(beta, 6).as("beta"),
        round((col("sy") - beta * col("sx")) / nD, 6).as("ln_k"))
    },

    // ---- EV57: Markov next-event prediction --------------------------------
    // ev8 built the transition matrix; this closes the loop into a
    // PREDICTOR and its evaluation — the "what does a user do next"
    // baseline model. Per current type: argmax next type (deterministic
    // lexicographic tie-break), and the accuracy that first-order
    // predictor achieves on the observed transitions (its own training
    // set — the standard in-sample Markov baseline). Consecutive pairs
    // come from one partitioned lead() over (ts, event_id); everything
    // after is exact-integer counts plus ONE division.
    QueryDef.sql(
      "ev57_markov_predict",
      """WITH seq AS (
        |  SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |trans AS (
        |  SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT cur, CAST(sum(n) AS BIGINT) AS n_total FROM trans GROUP BY 1),
        |pred AS (
        |  SELECT cur, nxt AS predicted_next, n AS n_correct FROM (
        |    SELECT *, row_number() OVER (PARTITION BY cur ORDER BY n DESC, nxt) AS pr
        |    FROM trans) WHERE pr = 1)
        |SELECT p.cur AS cur_type, p.predicted_next, t.n_total, p.n_correct,
        |  round(CAST(p.n_correct AS DOUBLE) / CAST(t.n_total AS DOUBLE), 6) AS accuracy
        |FROM pred p JOIN tot t ON p.cur = t.cur""".stripMargin) { (s, d) =>
      val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val seq = Tables.events(s, d)
        .select(col("event_type").as("cur"), lead(col("event_type"), 1).over(wSeq).as("nxt"))
      val trans = seq.filter(col("nxt").isNotNull)
        .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
      val tot = trans.groupBy(col("cur")).agg(sum(col("n")).as("n_total"))
      val wPred = Window.partitionBy(col("cur")).orderBy(col("n").desc, col("nxt"))
      val pred = trans.withColumn("pr", row_number().over(wPred)).filter(col("pr") === 1)
        .select(col("cur"), col("nxt").as("predicted_next"), col("n").as("n_correct"))
      pred.join(tot, "cur")
        .select(col("cur").as("cur_type"), col("predicted_next"), col("n_total"),
          col("n_correct"),
          round(col("n_correct").cast("double") / col("n_total").cast("double"), 6)
            .as("accuracy"))
    },

    // ---- A85: Brown–Forsythe variance-homogeneity test ---------------------
    // The precondition check a41's ANOVA silently assumes: are the
    // group variances equal? Brown–Forsythe (Levene with the median
    // center — the robust variant) over value-by-event_type. The group
    // median stays EXACT by carrying 2×median as an integer (sum of
    // the two middle ranks; doubled single middle when n is odd), so
    // Z = |2x − med2| is a BIGINT and the one-way ANOVA over Z runs in
    // exact integer moments (Z² sums as DECIMAL(38,0) — BIGINT would
    // overflow past ~10⁸ rows/group) before a single fixed-order
    // double expression per group, folded in group order (a41's
    // discipline), yields W.
    QueryDef.sql(
      "a85_brown_forsythe",
      """WITH v AS (
        |  SELECT event_type AS g, event_id,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS x
        |  FROM events),
        |r AS (SELECT g, x,
        |  row_number() OVER (PARTITION BY g ORDER BY x, event_id) AS rn,
        |  count(*) OVER (PARTITION BY g) AS n_g FROM v),
        |med AS (
        |  SELECT g,
        |    CAST(sum(x) FILTER (WHERE rn = (n_g + 1) // 2 OR rn = (n_g + 2) // 2)
        |      * (CASE WHEN (n_g + 1) // 2 = (n_g + 2) // 2 THEN 2 ELSE 1 END)
        |      AS BIGINT) AS med2
        |  FROM r GROUP BY g, n_g),
        |z AS (SELECT v.g, abs(2 * v.x - m.med2) AS z
        |  FROM v JOIN med m ON v.g = m.g),
        |gm AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n_g, CAST(sum(z) AS BIGINT) AS t_g,
        |    CAST(sum(CAST(z * z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS q_g
        |  FROM z GROUP BY 1),
        |tm AS (SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(t_g) AS BIGINT) AS t,
        |  CAST(count(*) AS BIGINT) AS k FROM gm),
        |terms AS (
        |  SELECT g, n, k,
        |    CAST(q_g AS DOUBLE) - CAST(t_g AS DOUBLE) * CAST(t_g AS DOUBLE)
        |      / CAST(n_g AS DOUBLE) AS ssw_g,
        |    CAST(n * t_g - n_g * t AS DOUBLE) * CAST(n * t_g - n_g * t AS DOUBLE)
        |      / (CAST(n_g AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS ssb_g
        |  FROM gm CROSS JOIN tm),
        |folded AS (
        |  SELECT max(n) AS n, max(k) AS k,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(ssw_g ORDER BY g)),
        |      (a, b) -> a + b) AS ssw,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(ssb_g ORDER BY g)),
        |      (a, b) -> a + b) AS ssb
        |  FROM terms)
        |SELECT CAST(k AS INTEGER) AS n_groups, CAST(n AS BIGINT) AS n_obs,
        |  round((ssb / CAST(k - 1 AS DOUBLE)) / (ssw / CAST(n - k AS DOUBLE)), 6)
        |    AS w_stat
        |FROM folded""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .select(col("event_type").as("g"), col("event_id"),
          (col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long").as("x"))
      val wR = Window.partitionBy(col("g")).orderBy(col("x"), col("event_id"))
      val wN = Window.partitionBy(col("g"))
      val r = v.select(col("g"), col("x"),
        row_number().over(wR).as("rn"), count(lit(1)).over(wN).as("n_g"))
      val lo = expr("(n_g + 1) div 2")
      val hi = expr("(n_g + 2) div 2")
      val med = r.groupBy(col("g"), col("n_g"))
        .agg((sum(when(col("rn") === lo || col("rn") === hi, col("x")))
          * when(lo === hi, 2).otherwise(1)).cast("long").as("med2"))
        .select(col("g"), col("med2"))
      val z = v.join(broadcast(med), "g").select(col("g"),
        abs(lit(2) * col("x") - col("med2")).as("z"))
      val gm = z.groupBy(col("g")).agg(count(lit(1)).as("n_g"),
        sum(col("z")).as("t_g"),
        sum((col("z") * col("z")).cast(DecimalType(38, 0))).as("q_g"))
      val tm = gm.agg(sum(col("n_g")).as("n"), sum(col("t_g")).as("t"),
        count(lit(1)).as("k"))
      val dev = col("n") * col("t_g") - col("n_g") * col("t")
      val terms = gm.crossJoin(broadcast(tm))
        .select(col("g"), col("n"), col("k"),
          (col("q_g").cast("double")
            - col("t_g").cast("double") * col("t_g").cast("double")
              / col("n_g").cast("double")).as("ssw_g"),
          (dev.cast("double") * dev.cast("double")
            / (col("n_g").cast("double") * col("n").cast("double")
              * col("n").cast("double"))).as("ssb_g"))
      val folded = terms.agg(max(col("n")).as("n"), max(col("k")).as("k"),
        aggregate(transform(sort_array(collect_list(struct(col("g"), col("ssw_g")))),
          x => x.getField("ssw_g")), lit(0.0), (a, b) => a + b).as("ssw"),
        aggregate(transform(sort_array(collect_list(struct(col("g"), col("ssb_g")))),
          x => x.getField("ssb_g")), lit(0.0), (a, b) => a + b).as("ssb"))
      folded.select(col("k").cast("int").as("n_groups"), col("n").as("n_obs"),
        round((col("ssb") / (col("k") - 1).cast("double"))
          / (col("ssw") / (col("n") - col("k")).cast("double")), 6).as("w_stat"))
    }
  )
}
