package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions

/** Fifty-seventh frontier batch: Cochran–Armitage dose-response trend
  * test, n-gram corpus novelty curve. (The batch's third member, ev73s
  * streaming as-of enrichment, registers in StreamingQueries.)
  */
object Frontier57Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A117: Cochran–Armitage trend test ----------------------------------
    // "Does conversion increase WITH activity level?" — the ordered
    // sibling of the chi-square independence test: doses are that
    // day's activity bands (1 / 2 / ≥3 events, scores 0/1/2), response
    // is conversion. Centering is cross-multiplied (T_N = N·Σwa −
    // A·Σwn), the variance closed form stays in integers, and the
    // statistic ships as the a104-style signed z²·10⁶ = T_N²(N−1)·10⁶
    // div (A(N−A)(NΣw²n − (Σwn)²)) — DECIMAL(38,0) carries the
    // products at day grain. One user-day aggregate, then crumbs.
    QueryDef.sql(
      "a117_trend_test",
      """WITH pu AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id,
        |    CAST(count(*) AS BIGINT) AS n_ev,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT)
        |      AS conv
        |  FROM events GROUP BY 1, 2),
        |dose AS (
        |  SELECT day,
        |    CAST(CASE WHEN n_ev <= 1 THEN 0 WHEN n_ev <= 2 THEN 1 ELSE 2 END
        |      AS BIGINT) AS w,
        |    conv
        |  FROM pu),
        |agg AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(conv) AS BIGINT) AS a_tot,
        |    CAST(sum(w * conv) AS BIGINT) AS swa,
        |    CAST(sum(w) AS BIGINT) AS swn,
        |    CAST(sum(w * w) AS BIGINT) AS sw2n
        |  FROM dose GROUP BY 1)
        |SELECT day, n, a_tot,
        |  CAST(n * swa - a_tot * swn AS BIGINT) AS t_n,
        |  CAST(CASE WHEN a_tot > 0 AND a_tot < n
        |      AND n * sw2n - swn * swn > 0 THEN
        |    (CASE WHEN n * swa - a_tot * swn >= 0 THEN 1 ELSE -1 END)
        |    * ((CAST(n * swa - a_tot * swn AS HUGEINT)
        |        * (n * swa - a_tot * swn) * (n - 1) * 1000000)
        |       // (CAST(a_tot AS HUGEINT) * (n - a_tot)
        |          * (n * sw2n - swn * swn)))
        |    END AS BIGINT) AS z2_signed_micro
        |FROM agg ORDER BY day""".stripMargin) { (s, d) =>
      val pu = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"), col("user_id"))
        .agg(count(lit(1)).as("n_ev"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      val dose = pu.select(col("day"),
        when(col("n_ev") <= 1, 0L).when(col("n_ev") <= 2, 1L).otherwise(2L).as("w"),
        col("conv"))
      val agg = dose.groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).cast("long").as("a_tot"),
          sum(col("w") * col("conv")).cast("long").as("swa"),
          sum(col("w")).cast("long").as("swn"),
          sum(col("w") * col("w")).cast("long").as("sw2n"))
      agg.select(col("day"), col("n"), col("a_tot"),
          (col("n") * col("swa") - col("a_tot") * col("swn")).cast("long").as("t_n"),
          when(col("a_tot") > 0 && col("a_tot") < col("n") &&
              col("n") * col("sw2n") - col("swn") * col("swn") > 0,
            when(col("n") * col("swa") - col("a_tot") * col("swn") >= 0, 1)
              .otherwise(-1).cast("long") *
              expr("""(cast(n * swa - a_tot * swn as decimal(38,0))
                       * (n * swa - a_tot * swn) * (n - 1) * 1000000)
                      div (cast(a_tot as decimal(38,0)) * (n - a_tot)
                           * (n * sw2n - swn * swn))"""))
            .cast("long").as("z2_signed_micro"))
        .orderBy(col("day"))
    },

    // ---- T56: n-gram corpus novelty curve -----------------------------------
    // Corpus-growth diagnostics: what fraction of each document's
    // 5-grams has never appeared in any EARLIER document (by doc_id)?
    // A redundancy-saturating corpus shows novelty decaying toward 0 —
    // the signal that more crawling buys no new text. Grams travel as
    // the portable rolling hash (never the strings), first-occurrence
    // is one min-aggregate per gram, and attribution is a semi-join
    // back to doc grain. Two bounded shuffles at any corpus size.
    QueryDef.sql(
      "t56_ngram_novelty",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split_regex(g, ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007) AS gh
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
        |      i -> array_to_string(t[i:i+4], ' '))) AS g
        |    FROM toks WHERE len(t) >= 5)),
        |firsts AS (
        |  SELECT gh, CAST(min(doc_id) AS BIGINT) AS first_doc
        |  FROM grams GROUP BY 1),
        |nov AS (
        |  SELECT g.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(count(*) FILTER (WHERE f.first_doc = g.doc_id) AS BIGINT)
        |      AS n_novel
        |  FROM grams g JOIN firsts f USING (gh)
        |  GROUP BY 1)
        |SELECT doc_id, n_grams, n_novel,
        |  CAST((n_novel * 1000) // n_grams AS BIGINT) AS novelty_permille
        |FROM nov ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 5)
      val grams = toks
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(t) - 4), i -> concat_ws(' ', slice(t, i, 5)))"))
          .as("g"))
        .select(col("doc_id"), TextFunctions.rollingFingerprint(col("g")).as("gh"))
        .distinct()
      val firsts = grams.groupBy(col("gh")).agg(min(col("doc_id")).as("first_doc"))
      grams.join(firsts, "gh")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          expr("(n_novel * 1000) div n_grams").cast("long").as("novelty_permille"))
        .orderBy(col("doc_id"))
    }
  )
}
