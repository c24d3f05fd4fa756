package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions

/** Hundred-first frontier batch: longest-repeated-n-gram profile,
  * rank-biased overlap between two league tables, and a leave-one-out
  * naive-Bayes memorization audit.
  */
object Frontier101Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- T81: longest repeated n-gram profile ---------------------------------
    // The suffix-array question ("what is the longest substring this
    // document repeats?") answered with counting instead of suffix
    // sorting: for each n <= 12 a document repeats SOME n-gram iff its
    // n-gram list has fewer distinct elements than elements — no gram
    // ever ships off the executor, no pair of windows is compared. The
    // corpus histogram of per-doc maxima separates natural prose
    // (short maxima) from template/boilerplate text (long runs) and is
    // the diagnostic a dedup pipeline (d8/d10 substring spans) reads
    // before choosing its span threshold.
    QueryDef.sql(
      "t81_longest_repeat",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t
        |  FROM documents),
        |gr AS (
        |  SELECT doc_id, nn.n,
        |    CASE WHEN len(t) >= nn.n THEN
        |      len(list_transform(range(1, len(t) - nn.n + 2),
        |        i -> array_to_string(t[i:i+nn.n-1], ' ')))
        |      - len(list_distinct(list_transform(range(1, len(t) - nn.n + 2),
        |        i -> array_to_string(t[i:i+nn.n-1], ' '))))
        |    ELSE 0 END AS dup
        |  FROM toks CROSS JOIN (SELECT unnest(generate_series(1, 12)) AS n) nn),
        |per AS (
        |  SELECT doc_id, max(CASE WHEN dup > 0 THEN n ELSE 0 END) AS longest
        |  FROM gr GROUP BY 1)
        |SELECT CAST(longest AS BIGINT) AS longest_repeat,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
      // dup = |grams| − |distinct grams| via the native hash-set pass
      // (functions.DupNgrams): the transform + array_distinct twin is
      // CodegenFallback-interpreted and pairwise-quadratic per row —
      // same exact value (L < n yields 0, matching the CASE guard in
      // the SQL), one codegen'd call per (doc, n)
      val gr = toks.crossJoin(broadcast(s.range(1, 13).toDF("n")))
        .select(col("doc_id"), col("n"),
          graft.functions.DupNgrams.dupNgramsNative(col("t"), col("n"))
            .as("dup"))
      gr.groupBy(col("doc_id"))
        .agg(max(when(col("dup") > 0, col("n")).otherwise(0L)).as("longest"))
        .groupBy(col("longest").cast("long").as("longest_repeat"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("longest_repeat"))
    },

    // ---- A157: rank-biased overlap of two league tables -----------------------
    // Kendall's tau/W (a81, a149) weight every rank equally; search
    // and recommender evaluation wants TOP-weighted agreement. RBO
    // with p = 1/2 is the rare rank metric that is exactly rational:
    // the weight of depth d is 2^-d, so on the common denominator
    // 2520 * 2^10 every depth contributes the integer
    // ov_d * (2520/d) * 2^(10-d), and the truncated-at-10 RBO is one
    // division by 2520 * 1023. Compared here: brands ranked by revenue
    // vs by units moved — the cumulative column shows how agreement
    // builds (or doesn't) down the leaderboard. Brand dimension is
    // bounded, so the rank windows are bounded too.
    QueryDef.sql(
      "a157_rank_biased_overlap",
      """WITH base AS (
        |  SELECT p.p_brand,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev,
        |    CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1),
        |rk AS (
        |  SELECT p_brand,
        |    row_number() OVER (ORDER BY rev DESC, p_brand) AS ra,
        |    row_number() OVER (ORDER BY qty DESC, p_brand) AS rb
        |  FROM base),
        |ov AS (
        |  SELECT dd.d, CAST(count(rk.p_brand) AS BIGINT) AS overlap
        |  FROM (SELECT unnest(generate_series(1, 10)) AS d) dd
        |  LEFT JOIN rk ON rk.ra <= dd.d AND rk.rb <= dd.d
        |  GROUP BY 1),
        |terms AS (
        |  SELECT d, overlap,
        |    overlap * (2520 // d) * (1 << (10 - CAST(d AS INT))) AS term
        |  FROM ov)
        |SELECT CAST(d AS BIGINT) AS depth, overlap,
        |  CAST(CAST(sum(term) OVER (ORDER BY d) AS BIGINT) * 1000000
        |    // (2520 * 1023) AS BIGINT) AS rbo_upto_micro
        |FROM terms ORDER BY depth""".stripMargin) { (s, d) =>
      val base = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).cast("long")
          .as("rev"),
          sum(floor(col("l_quantity")).cast("long")).cast("long").as("qty"))
      // brand dimension is bounded (~25): the unpartitioned rank windows
      // run over a broadcast-sized table by construction
      val rk = base
        .withColumn("ra", row_number().over(Window.orderBy(col("rev").desc,
          col("p_brand"))))
        .withColumn("rb", row_number().over(Window.orderBy(col("qty").desc,
          col("p_brand"))))
      val ov = broadcast(s.range(1, 11).toDF("d"))
        .join(rk, col("ra") <= col("d") && col("rb") <= col("d"), "left")
        .groupBy(col("d"))
        .agg(count(col("p_brand")).as("overlap"))
      val terms = ov.select(col("d"), col("overlap"),
        expr("overlap * (2520 div d) * shiftleft(1, 10 - cast(d as int))")
          .as("term"))
      terms.select(col("d").cast("long").as("depth"), col("overlap"),
          expr("""cast(cast(sum(term) over (order by d) as bigint) * 1000000
            div (2520 * 1023) as bigint)""").as("rbo_upto_micro"))
        .orderBy(col("depth"))
    },

    // ---- T82: leave-one-out memorization audit --------------------------------
    // Data-valuation for the t76 naive-Bayes classifier: a document is
    // "memorized" when the model classifies it correctly WITH its own
    // tokens in the training counts but flips once they are removed —
    // the classic leave-one-out self-influence test, computable in
    // closed form for NB because removing a document just subtracts
    // its term frequencies from its class's counters (no retraining).
    // Both scores share one term-contribution table; the LOO branch
    // adjusts count, class mass and prior only where c = actual. Same
    // numeric discipline as t76: each ln rounds to 8 decimals and the
    // per-class sum folds in sorted order, so the two argmaxes are
    // bit-identical cross-engine. High memorized_permille = the class
    // is won by this document's own idiosyncratic vocabulary — the
    // training-data signal a dedup/contamination pass wants surfaced.
    QueryDef.sql(
      "t82_loo_memorization",
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(regexp_extract_all(lower(text), '\S+'))
        |    AS term
        |  FROM documents),
        |dt AS (
        |  SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY 1, 2, 3),
        |dlen AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS len FROM dt GROUP BY 1),
        |cls AS (SELECT lang AS c, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |ct AS (SELECT lang AS c, term, CAST(count(*) AS BIGINT) AS cnt
        |  FROM tok GROUP BY 1, 2),
        |nc AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS n_tok FROM ct GROUP BY 1),
        |vv AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM tok),
        |contrib AS (
        |  SELECT d.doc_id, d.lang AS actual, nc.c,
        |    CAST(d.tf AS DOUBLE) * round(ln(
        |      CAST(coalesce(ct.cnt, 0) + 1 AS DOUBLE) /
        |      CAST(nc.n_tok + vv.v AS DOUBLE)), 8) AS lp_full,
        |    CAST(d.tf AS DOUBLE) * round(ln(
        |      CAST(coalesce(ct.cnt, 0)
        |        - (CASE WHEN nc.c = d.lang THEN d.tf ELSE 0 END) + 1 AS DOUBLE) /
        |      CAST(nc.n_tok
        |        - (CASE WHEN nc.c = d.lang THEN dl.len ELSE 0 END) + vv.v
        |        AS DOUBLE)), 8) AS lp_loo
        |  FROM dt d
        |  JOIN dlen dl ON dl.doc_id = d.doc_id
        |  CROSS JOIN nc CROSS JOIN vv
        |  LEFT JOIN ct ON ct.c = nc.c AND ct.term = d.term),
        |score AS (
        |  SELECT doc_id, actual, c,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(lp_full))),
        |      (a, b) -> a + b) AS s_full,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(lp_loo))),
        |      (a, b) -> a + b) AS s_loo
        |  FROM contrib GROUP BY 1, 2, 3),
        |tot AS (
        |  SELECT s.doc_id, s.actual, s.c,
        |    s.s_full + round(ln(CAST(cl.n_docs AS DOUBLE) / CAST(nn.n AS DOUBLE)),
        |      8) AS f_full,
        |    s.s_loo + CASE
        |      WHEN cl.n_docs - (CASE WHEN s.c = s.actual THEN 1 ELSE 0 END) = 0
        |        THEN CAST(-1000000000 AS DOUBLE)
        |      ELSE round(ln(
        |        CAST(cl.n_docs - (CASE WHEN s.c = s.actual THEN 1 ELSE 0 END)
        |          AS DOUBLE) / CAST(nn.n - 1 AS DOUBLE)), 8) END AS f_loo
        |  FROM score s JOIN cls cl ON cl.c = s.c CROSS JOIN nn),
        |pred AS (
        |  SELECT doc_id, actual,
        |    max(CASE WHEN rn_full = 1 THEN c END) AS p_full,
        |    max(CASE WHEN rn_loo = 1 THEN c END) AS p_loo
        |  FROM (SELECT doc_id, actual, c,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY f_full DESC, c)
        |        AS rn_full,
        |      row_number() OVER (PARTITION BY doc_id ORDER BY f_loo DESC, c)
        |        AS rn_loo
        |    FROM tot)
        |  GROUP BY 1, 2)
        |SELECT actual AS lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN p_full = actual THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_full_correct,
        |  CAST(sum(CASE WHEN p_loo = actual THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_loo_correct,
        |  CAST(sum(CASE WHEN p_full = actual AND p_loo <> actual
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_memorized,
        |  CAST(sum(CASE WHEN p_full = actual AND p_loo <> actual
        |    THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
        |    AS memorized_permille
        |FROM pred GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      val dt = tok.groupBy(col("doc_id"), col("lang"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dlen = dt.groupBy(col("doc_id")).agg(sum(col("tf")).as("len"))
      val cls = Tables.documents(s, d).groupBy(col("lang").as("c"))
        .agg(count(lit(1)).as("n_docs"))
      val nn = Tables.documents(s, d).agg(count(lit(1)).as("n"))
      val ct = tok.groupBy(col("lang").as("c"), col("term"))
        .agg(count(lit(1)).as("cnt"))
      val nc = ct.groupBy(col("c")).agg(sum(col("cnt")).as("n_tok"))
      val vv = tok.agg(countDistinct(col("term")).as("v"))
      val contrib = dt
        .join(dlen, Seq("doc_id"))
        .crossJoin(broadcast(nc)).crossJoin(broadcast(vv))
        .join(ct.withColumnRenamed("cnt", "cnt0"), Seq("c", "term"), "left")
        .select(col("doc_id"), col("lang").as("actual"), col("c"),
          expr("""cast(tf as double) * round(ln(
              cast(coalesce(cnt0, 0)
                - (case when c = lang then tf else 0 end) + 1 as double) /
              cast(n_tok - (case when c = lang then len else 0 end) + v
                as double)), 8)""").as("lp_loo"),
          expr("""cast(tf as double) * round(ln(
              cast(coalesce(cnt0, 0) + 1 as double) /
              cast(n_tok + v as double)), 8)""").as("lp_full"))
      val score = contrib.groupBy(col("doc_id"), col("actual"), col("c"))
        .agg(expr("""aggregate(array_sort(collect_list(lp_full)),
            cast(0.0 as double), (a, b) -> a + b)""").as("s_full"),
          expr("""aggregate(array_sort(collect_list(lp_loo)),
            cast(0.0 as double), (a, b) -> a + b)""").as("s_loo"))
      val tot = score.join(broadcast(cls), Seq("c")).crossJoin(broadcast(nn))
        .select(col("doc_id"), col("actual"), col("c"),
          expr("""s_full + round(ln(cast(n_docs as double) / cast(n as double)),
            8)""").as("f_full"),
          expr("""s_loo + case
            when n_docs - (case when c = actual then 1 else 0 end) = 0
              then cast(-1000000000 as double)
            else round(ln(
              cast(n_docs - (case when c = actual then 1 else 0 end) as double)
              / cast(n - 1 as double)), 8) end""").as("f_loo"))
      val byDoc = Window.partitionBy(col("doc_id"))
      val pred = tot
        .withColumn("rn_full",
          row_number().over(byDoc.orderBy(col("f_full").desc, col("c"))))
        .withColumn("rn_loo",
          row_number().over(byDoc.orderBy(col("f_loo").desc, col("c"))))
        .groupBy(col("doc_id"), col("actual"))
        .agg(max(when(col("rn_full") === 1, col("c"))).as("p_full"),
          max(when(col("rn_loo") === 1, col("c"))).as("p_loo"))
      pred.groupBy(col("actual").as("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("p_full") === col("actual"), 1).otherwise(0)).cast("long")
            .as("n_full_correct"),
          sum(when(col("p_loo") === col("actual"), 1).otherwise(0)).cast("long")
            .as("n_loo_correct"),
          sum(when(col("p_full") === col("actual") &&
            col("p_loo") =!= col("actual"), 1).otherwise(0)).cast("long")
            .as("n_memorized"))
        .select(col("lang"), col("n_docs"), col("n_full_correct"),
          col("n_loo_correct"), col("n_memorized"),
          expr("cast(n_memorized * 1000 div n_docs as bigint)")
            .as("memorized_permille"))
        .orderBy(col("lang"))
    }
  )
}
