package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-twenty-eighth frontier batch: the German-tank serial-number
  * estimator audited month by month against the true population, a
  * "did you mean" suggester over rare bigrams (banded Levenshtein with
  * first-word blocking), and Chao1 species-richness with Good-Turing
  * coverage per document source.
  */
object Frontier128Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A199: German-tank estimator audit ---------------------------------------
    // Each ship-month observes a sample of part serial numbers; the
    // UMVU estimator N̂ = m(1 + 1/k) − 1 guesses the catalog size from
    // the sample max m and distinct count k. Audited against the true
    // max partkey: the error column shows the estimator converging as
    // monthly sample size grows — estimation theory on real keys, two
    // grouped aggregates and a broadcast of the one-row truth.
    QueryDef.sql(
      "a199_german_tank",
      """WITH obs AS (
        |  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS ym,
        |    CAST(max(l_partkey) AS BIGINT) AS m,
        |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS k
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(max(p_partkey) AS BIGINT) AS n_true FROM part)
        |SELECT o.ym, o.k, o.m,
        |  CAST(o.m + o.m // o.k - 1 AS BIGINT) AS n_est,
        |  t.n_true,
        |  CAST((o.m + o.m // o.k - 1 - t.n_true) * 1000 // t.n_true AS BIGINT)
        |    AS err_permille
        |FROM obs o CROSS JOIN t ORDER BY o.ym""".stripMargin) { (s, d) =>
      val obs = Tables.lineitem(s, d)
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ym"))
        .agg(max(col("l_partkey")).cast("long").as("m"),
          countDistinct(col("l_partkey")).cast("long").as("k"))
      val t = Tables.part(s, d).agg(max(col("p_partkey")).cast("long")
        .as("n_true"))
      obs.crossJoin(broadcast(t))
        .select(col("ym"), col("k"), col("m"),
          expr("m + m div k - 1").cast("long").as("n_est"),
          col("n_true"),
          expr("(m + m div k - 1 - n_true) * 1000 div n_true").cast("long")
            .as("err_permille"))
        .orderBy(col("ym"))
    },

    // ---- T93: "did you mean" over rare trigrams -------------------------------------
    // Query-log hygiene: singleton trigrams get matched to a FREQUENT
    // trigram (adaptive threshold — max(4, 2× the mean type frequency),
    // so the dictionary is non-empty at every corpus size) within edit
    // distance 3, candidates blocked by the first two words so the
    // distance join never goes quadratic (the j5/j14 discipline),
    // distances via the banded levenshtein(s, t, 3). Suggestion = most
    // frequent candidate, ties lexicographic.
    QueryDef.sql(
      "t93_spell_correct",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ts
        |  FROM documents),
        |tg0 AS (
        |  SELECT unnest(list_transform(range(1, len(ts) - 1),
        |    i -> ts[i] || '_' || ts[i + 1] || '_' || ts[i + 2])) AS tg
        |  FROM toks),
        |tf AS (SELECT tg, CAST(count(*) AS BIGINT) AS f FROM tg0 GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS types,
        |  CAST(sum(f) AS BIGINT) AS insts FROM tf),
        |rare AS (
        |  SELECT tg, f, regexp_replace(tg, '_[^_]*$', '') AS pre
        |  FROM tf WHERE f = 1),
        |dict AS (
        |  SELECT tg AS cand, f AS cf, regexp_replace(tg, '_[^_]*$', '') AS pre
        |  FROM tf CROSS JOIN n
        |  WHERE f >= greatest(4, (2 * insts) // types)),
        |cand AS (
        |  SELECT r.tg, r.f, d.cand, d.cf
        |  FROM rare r JOIN dict d ON d.pre = r.pre
        |  WHERE levenshtein(r.tg, d.cand) <= 3),
        |best AS (
        |  SELECT tg, f, cand, cf,
        |    row_number() OVER (PARTITION BY tg ORDER BY cf DESC, cand ASC)
        |      AS rn,
        |    CAST(count(*) OVER (PARTITION BY tg) AS BIGINT) AS n_candidates
        |  FROM cand)
        |SELECT tg AS rare_trigram, f AS rare_freq, cand AS suggestion,
        |  cf AS suggestion_freq, n_candidates
        |FROM best WHERE rn = 1 ORDER BY tg""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(graft.functions.TextFunctions.tokens(col("text")).as("ts"))
      // guard: sequence(1, n) with n <= 0 yields a DESCENDING array
      val tg0 = toks.select(explode(expr(
        "IF(size(ts) >= 3, transform(sequence(1, size(ts) - 2)," +
          " i -> concat(element_at(ts, i), '_', element_at(ts, i + 1)," +
          " '_', element_at(ts, i + 2))), array())")).as("tg"))
      val tf = tg0.groupBy(col("tg")).agg(count(lit(1)).cast("long").as("f"))
        .localCheckpoint(true) // rare + dict slices share it
      val n = tf.agg(count(lit(1)).cast("long").as("types"),
        sum(col("f")).cast("long").as("insts"))
      val rare = tf.filter(col("f") === 1)
        .withColumn("pre", regexp_replace(col("tg"), "_[^_]*$", ""))
      val dict = tf.crossJoin(broadcast(n))
        .filter(col("f") >= greatest(lit(4L), expr("(2 * insts) div types")))
        .select(col("tg").as("cand"), col("f").as("cf"),
          regexp_replace(col("tg"), "_[^_]*$", "").as("pre"))
      // banded levenshtein returns -1 past the threshold — a bare <= 3
      // would admit every pruned pair
      val cand = rare.join(dict, Seq("pre"))
        .filter(levenshtein(col("tg"), col("cand"), 3).between(0, 3))
      val best = cand
        .withColumn("rn", row_number().over(Window.partitionBy(col("tg"))
          .orderBy(col("cf").desc, col("cand").asc)))
        .withColumn("n_candidates", count(lit(1)).over(
          Window.partitionBy(col("tg"))).cast("long"))
      best.filter(col("rn") === 1)
        .select(col("tg").as("rare_trigram"), col("f").as("rare_freq"),
          col("cand").as("suggestion"), col("cf").as("suggestion_freq"),
          col("n_candidates"))
        .orderBy(col("tg"))
    },

    // ---- A200: Chao1 richness + Good-Turing coverage per source --------------------
    // How much vocabulary has each source NOT shown yet? Chao1's
    // bias-corrected Ŝ = S + f1(f1−1)/(2(f2+1)) from the count-of-counts
    // table, beside Good-Turing sample coverage 1 − f1/N — the two
    // numbers a corpus curator reads before deciding whether more data
    // from a source adds diversity. Exact integer arithmetic
    // throughout; two grouped aggregations.
    QueryDef.sql(
      "a200_chao1",
      """WITH tok AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT source, term, CAST(count(*) AS BIGINT) AS f
        |  FROM tok GROUP BY 1, 2),
        |cc AS (
        |  SELECT source,
        |    CAST(count(*) AS BIGINT) AS s_obs,
        |    CAST(sum(f) AS BIGINT) AS n_tokens,
        |    CAST(count(*) FILTER (WHERE f = 1) AS BIGINT) AS f1,
        |    CAST(count(*) FILTER (WHERE f = 2) AS BIGINT) AS f2
        |  FROM tf GROUP BY 1)
        |SELECT source, n_tokens, s_obs, f1, f2,
        |  CAST(s_obs * 1000 + f1 * (f1 - 1) * 1000 // (2 * (f2 + 1)) AS BIGINT)
        |    AS chao1_milli,
        |  CAST(1000 - f1 * 1000 // n_tokens AS BIGINT) AS coverage_permille
        |FROM cc ORDER BY source""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("source"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      val tf = tok.groupBy(col("source"), col("term"))
        .agg(count(lit(1)).cast("long").as("f"))
      val cc = tf.groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("s_obs"),
          sum(col("f")).cast("long").as("n_tokens"),
          count(when(col("f") === 1, 1)).cast("long").as("f1"),
          count(when(col("f") === 2, 1)).cast("long").as("f2"))
      cc.select(col("source"), col("n_tokens"), col("s_obs"), col("f1"),
        col("f2"),
        expr("s_obs * 1000 + f1 * (f1 - 1) * 1000 div (2 * (f2 + 1))")
          .cast("long").as("chao1_milli"),
        expr("1000 - f1 * 1000 div n_tokens").cast("long")
          .as("coverage_permille"))
        .orderBy(col("source"))
    }
  )
}
