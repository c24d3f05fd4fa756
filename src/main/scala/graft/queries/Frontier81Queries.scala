package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions

/** Eighty-first frontier batch: Naive Bayes text classification,
  * multi-window burn-rate alerting, monetary-unit audit sampling.
  */
object Frontier81Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- T76: multinomial Naive Bayes classifier ------------------------------
    // The classic generative text classifier, trained and scored in
    // pure relational algebra: add-one-smoothed per-(lang, term)
    // log-likelihoods plus a log-prior, per-document class scores as
    // sorted folds (order-independent under any partitioning), argmax
    // with a deterministic tie-break on the class name — reported as
    // the lang-confusion matrix. Smoothing means UNSEEN (lang, term)
    // pairs still contribute ln(1/(N_c+V)): the likelihood grid is the
    // vocab × class cross with coalesced zero counts, built from one
    // token shuffle. Each ln rounds to 8 decimals (the lone 1-ulp
    // risk); identical fold order makes the doubles — and therefore
    // the argmax — bit-identical cross-engine.
    QueryDef.sql(
      "t76_naive_bayes",
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents),
        |cls AS (
        |  SELECT lang AS c, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |prior AS (
        |  SELECT c, round(ln(CAST(n_docs AS DOUBLE) /
        |    (SELECT CAST(count(*) AS DOUBLE) FROM documents)), 8) AS logprior
        |  FROM cls),
        |ct AS (
        |  SELECT lang AS c, term, CAST(count(*) AS BIGINT) AS cnt
        |  FROM tok GROUP BY 1, 2),
        |nc AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS n_tok FROM ct GROUP BY 1),
        |vocab AS (SELECT DISTINCT term FROM tok),
        |vv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
        |grid AS (
        |  SELECT nc.c, vo.term,
        |    round(ln(CAST(coalesce(ct.cnt, 0) + 1 AS DOUBLE) /
        |      CAST(nc.n_tok + vv.v AS DOUBLE)), 8) AS logp
        |  FROM vocab vo CROSS JOIN nc CROSS JOIN vv
        |  LEFT JOIN ct ON ct.c = nc.c AND ct.term = vo.term),
        |dt AS (
        |  SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY 1, 2, 3),
        |score AS (
        |  SELECT d.doc_id, d.lang AS actual, g.c,
        |    p.logprior + list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_sort(list(CAST(d.tf AS DOUBLE) * g.logp))), (a, b) -> a + b)
        |      AS sc
        |  FROM dt d JOIN grid g ON g.term = d.term
        |  JOIN prior p ON p.c = g.c
        |  GROUP BY d.doc_id, d.lang, g.c, p.logprior),
        |pred AS (
        |  SELECT doc_id, actual, c AS predicted
        |  FROM (SELECT doc_id, actual, c,
        |          row_number() OVER (PARTITION BY doc_id
        |            ORDER BY sc DESC, c) AS rn
        |        FROM score)
        |  WHERE rn = 1)
        |SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
        |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      // r5 opt: spread the single-row-group documents scan so the two
      // tokenize+explode passes (ct and dt) run across cores instead of
      // inside one scan task.
      val docs = graft.operators.Spread.by(Tables.documents(s, d), col("doc_id"))
      val tok = docs.select(col("doc_id"), col("lang"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      val nAll = docs.agg(count(lit(1)).cast("double").as("n_all"))
      val prior = docs.groupBy(col("lang").as("c")).agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(nAll))
        .select(col("c"),
          round(log(col("n_docs").cast("double") / col("n_all")), 8).as("logprior"))
      val ct = tok.groupBy(col("lang").as("c"), col("term"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true) // feeds class totals AND the smoothing grid
      val nc = ct.groupBy(col("c")).agg(sum(col("cnt")).as("n_tok"))
      val vocab = ct.select(col("term")).distinct()
      val vv = vocab.agg(count(lit(1)).as("v"))
      val grid = vocab.crossJoin(broadcast(nc)).crossJoin(broadcast(vv))
        .join(ct.withColumnRenamed("c", "cc").withColumnRenamed("term", "tt"),
          col("c") === col("cc") && col("term") === col("tt"), "left")
        .select(col("c"), col("term"),
          round(log((coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
            (col("n_tok") + col("v")).cast("double")), 8).as("logp"))
      val dt = tok.groupBy(col("doc_id"), col("lang"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val score = dt.join(grid, "term")
        .join(broadcast(prior), "c")
        .groupBy(col("doc_id"), col("lang").as("actual"), col("c"), col("logprior"))
        .agg(aggregate(sort_array(collect_list(col("tf").cast("double") * col("logp"))),
          lit(0.0), (a, v) => a + v).as("lik"))
        .select(col("doc_id"), col("actual"), col("c"),
          (col("logprior") + col("lik")).as("sc"))
      score
        .withColumn("rn", row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("sc").desc, col("c"))))
        .filter(col("rn") === 1)
        .groupBy(col("actual"), col("c").as("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("actual"), col("predicted"))
    },

    // ---- EV92: multi-window error-budget burn rate ----------------------------
    // The SRE paging rule: alert when BOTH a short (1h) and a long (6h)
    // error-ratio window burn the budget — the two-window conjunction
    // that suppresses blips (short-only) and stale pages (long-only).
    // Hours are integer bucket ids (µs div 3600e6), the 6h trailing
    // window is a bounded 6-way fan-out join on those ids — no range
    // join, no unpartitioned window — and ratios are exact integer
    // permille.
    QueryDef.sql(
      "ev92_burn_rate",
      """WITH hourly AS (
        |  SELECT epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr_id,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS errs,
        |    CAST(count(*) AS BIGINT) AS tot
        |  FROM events GROUP BY 1),
        |agg6 AS (
        |  SELECT h.hr_id,
        |    CAST(sum(g.errs) AS BIGINT) AS errs_6h,
        |    CAST(sum(g.tot) AS BIGINT) AS tot_6h
        |  FROM hourly h JOIN hourly g
        |    ON g.hr_id BETWEEN h.hr_id - 5 AND h.hr_id
        |  GROUP BY 1)
        |SELECT h.hr_id,
        |  h.errs AS errs_1h, h.tot AS tot_1h,
        |  CAST(h.errs * 1000 // h.tot AS BIGINT) AS ratio_1h_permille,
        |  a.errs_6h, a.tot_6h,
        |  CAST(a.errs_6h * 1000 // a.tot_6h AS BIGINT) AS ratio_6h_permille,
        |  CASE WHEN h.errs * 1000 // h.tot > 210
        |         AND a.errs_6h * 1000 // a.tot_6h > 205 THEN 'page'
        |       WHEN a.errs_6h * 1000 // a.tot_6h > 205 THEN 'ticket'
        |       ELSE 'ok' END AS severity
        |FROM hourly h JOIN agg6 a ON h.hr_id = a.hr_id
        |ORDER BY h.hr_id""".stripMargin) { (s, d) =>
      val hourly = Tables.events(s, d)
        .groupBy(expr("unix_micros(date_trunc('HOUR', ts)) div 3600000000")
          .as("hr_id"))
        .agg(sum(when(col("event_type") === "error", 1).otherwise(0)).cast("long")
          .as("errs"),
          count(lit(1)).as("tot"))
        .localCheckpoint(true) // calendar-bounded; read by both window grains
      val agg6 = hourly
        .select(col("hr_id").as("src_hr"), col("errs"), col("tot"),
          explode(sequence(lit(0), lit(5))).as("k"))
        .select((col("src_hr") + col("k")).as("hr_id"), col("errs"), col("tot"))
        .join(hourly.select(col("hr_id")), Seq("hr_id"), "left_semi")
        .groupBy(col("hr_id"))
        .agg(sum(col("errs")).cast("long").as("errs_6h"),
          sum(col("tot")).cast("long").as("tot_6h"))
      val r1 = expr("errs * 1000 div tot")
      val r6 = expr("errs_6h * 1000 div tot_6h")
      hourly.join(agg6, "hr_id")
        .select(col("hr_id"),
          col("errs").as("errs_1h"), col("tot").as("tot_1h"),
          r1.cast("long").as("ratio_1h_permille"),
          col("errs_6h"), col("tot_6h"),
          r6.cast("long").as("ratio_6h_permille"),
          when(r1 > 210 && r6 > 205, "page")
            .when(r6 > 205, "ticket").otherwise("ok").as("severity"))
        .orderBy(col("hr_id"))
    },

    // ---- U64: monetary-unit (PPS systematic) audit sample ---------------------
    // The financial-audit sampling standard: every CENT is a sampling
    // unit, so an order's selection probability is proportional to its
    // value, and items larger than the sampling interval are certain
    // (and can be hit multiple times — the hits column). The global
    // cumulative-cents prefix sum uses the two-phase shard-offset
    // shape (deterministic key-sample boundaries, per-shard window,
    // broadcast offsets) — the only unpartitioned window runs over the
    // 32-row shard table, never the data.
    QueryDef.sql(
      "u64_monetary_unit_sample",
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |cum AS (
        |  SELECT o_orderkey, cents,
        |    CAST(sum(cents) OVER (ORDER BY o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
        |  FROM o),
        |tot AS (
        |  SELECT CAST(sum(cents) AS BIGINT) AS total,
        |    CAST(sum(cents) // 100 AS BIGINT) AS itv,
        |    CAST(sum(cents) // 100 // 2 AS BIGINT) AS st
        |  FROM o),
        |np AS (
        |  SELECT c.o_orderkey, c.cents,
        |    CASE WHEN c.c > t.st
        |      THEN (c.c - t.st + t.itv - 1) // t.itv ELSE 0 END AS np_hi,
        |    CASE WHEN c.c - c.cents > t.st
        |      THEN (c.c - c.cents - t.st + t.itv - 1) // t.itv ELSE 0 END AS np_lo
        |  FROM cum c CROSS JOIN tot t)
        |SELECT o_orderkey, cents, CAST(np_hi - np_lo AS BIGINT) AS hits
        |FROM np WHERE np_hi > np_lo
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), floor(col("o_totalprice") * 100).cast("long")
          .as("cents"))
      // two-phase global prefix sum (ShardedRank.withPrefixSum:
      // deterministic shard boundaries, per-shard cumsum + broadcast
      // offsets — no checkpoint, no unpartitioned window over the data)
      val tot = o.agg(sum(col("cents")).as("total"))
        .select(expr("total div 100").as("itv"))
        .select(col("itv"), expr("itv div 2").as("st"))
      graft.operators.ShardedRank
        .withPrefixSum(o, "c", col("cents"), col("o_orderkey"))
        .crossJoin(broadcast(tot))
        .select(col("o_orderkey"), col("cents"),
          expr("CASE WHEN c > st THEN (c - st + itv - 1) div itv ELSE 0 END")
            .as("np_hi"),
          expr("CASE WHEN c - cents > st THEN (c - cents - st + itv - 1) div itv ELSE 0 END")
            .as("np_lo"))
        .filter(col("np_hi") > col("np_lo"))
        .select(col("o_orderkey"), col("cents"),
          (col("np_hi") - col("np_lo")).cast("long").as("hits"))
        .orderBy(col("o_orderkey"))
    }
  )
}
