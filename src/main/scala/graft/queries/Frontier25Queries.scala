package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Twenty-fifth frontier batch: exact nearest-centroid classification
  * and sentence-level corpus statistics.
  */
object Frontier25Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- V20: nearest-centroid classifier evaluation ------------------------
    // The confusion matrix of a nearest-class-mean classifier — and it
    // hash-checks bit-exact, which float centroid math never would.
    // Trick: with quantized vectors q and per-label integer sum
    // vectors s_l (count n_l), squared distance to the mean compares
    // as the RATIONAL (−2·n_l·(q·s_l) + s_l·s_l) / n_l² — numerator
    // and denominator are exact integers (DECIMAL/HUGEINT), and the
    // one float division of two exact integers is IEEE-identical in
    // both engines, so the argmin (tie-break: label ASC) agrees
    // everywhere. Scale shape: the 10-row centroid table broadcasts;
    // scoring is scan-stage algebra + one rank per vector.
    QueryDef.sql(
      "v20_centroid_classify",
      """WITH q AS (
        |  SELECT vec_id, label, dim,
        |    CAST(floor(CAST(embedding[dim] AS DOUBLE) * 1000000.0) AS BIGINT) AS qd
        |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS dim)),
        |cent AS (
        |  SELECT label AS clabel, dim, CAST(sum(qd) AS HUGEINT) AS sd
        |  FROM q GROUP BY 1, 2),
        |cmeta AS (
        |  SELECT c.clabel, CAST(n.n AS HUGEINT) AS n,
        |    CAST(sum(c.sd * c.sd) AS HUGEINT) AS ss
        |  FROM cent c JOIN (SELECT label, count(DISTINCT vec_id) AS n
        |                    FROM q GROUP BY 1) n ON n.label = c.clabel
        |  GROUP BY 1, 2),
        |dots AS (
        |  SELECT q.vec_id, q.label, c.clabel,
        |    CAST(sum(CAST(q.qd AS HUGEINT) * c.sd) AS HUGEINT) AS dot
        |  FROM q JOIN cent c ON c.dim = q.dim
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT d.vec_id, d.label, d.clabel,
        |    CAST(-2 * m.n * d.dot + m.ss AS DOUBLE) / CAST(m.n * m.n AS DOUBLE)
        |      AS score
        |  FROM dots d JOIN cmeta m USING (clabel)),
        |pred AS (
        |  SELECT label, clabel AS predicted FROM (
        |    SELECT label, clabel,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY score, clabel) AS rn
        |    FROM scored) WHERE rn = 1)
        |SELECT label, predicted, CAST(count(*) AS BIGINT) AS n
        |FROM pred GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val q = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0d) as bigint))")
            .as("qv"))
      // centroid sum vectors as arrays (dim-ordered), plus n and s·s
      val cent = q
        .select(col("label").as("clabel"), posexplode(col("qv")).as(Seq("pos", "qd")))
        .groupBy(col("clabel"), col("pos"))
        .agg(sum(col("qd").cast(dec)).as("sd"))
        .groupBy(col("clabel"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("sd")))),
          e => e.getField("sd")).as("sv"))
      val meta = q.groupBy(col("label").as("clabel"))
        .agg(countDistinct(col("vec_id")).cast(dec).as("n"))
      val centroids = cent.join(meta, "clabel")
        .withColumn("ss",
          aggregate(col("sv"), lit(BigDecimal(0)).cast(dec), (acc, x) => acc + x * x))
      val scored = q.crossJoin(broadcast(centroids))
        .withColumn("dot",
          aggregate(zip_with(col("qv"), col("sv"), (a, b) => a.cast(dec) * b),
            lit(BigDecimal(0)).cast(dec), (acc, x) => acc + x))
        .withColumn("score",
          (lit(-2) * col("n") * col("dot") + col("ss")).cast("double")
            / (col("n") * col("n")).cast("double"))
      val wV = Window.partitionBy(col("vec_id")).orderBy(col("score"), col("clabel"))
      scored.withColumn("rn", row_number().over(wV)).filter(col("rn") === 1)
        .groupBy(col("label"), col("clabel").as("predicted"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- T42: sentence-level corpus statistics ------------------------------
    // The readability-adjacent profile t26 doesn't give: per language,
    // how long do sentences run? Sentences split on [.!?]+ at the
    // scan; per-doc sentence and word counts stay integers, and the
    // per-language means are single divisions of exact integer totals
    // (never means-of-means). One partial-agg shuffle on the bounded
    // lang key.
    QueryDef.sql(
      "t42_sentence_stats",
      """WITH per_doc AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split_regex(text, '[.!?]+'),
        |      s -> length(trim(s)) > 0)) AS BIGINT) AS n_sent,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words
        |  FROM documents)
        |SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_sent) AS BIGINT) AS total_sentences,
        |  round(CAST(sum(n_sent) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS sentences_per_doc,
        |  CASE WHEN sum(n_sent) > 0
        |    THEN round(CAST(sum(n_words) AS DOUBLE) / CAST(sum(n_sent) AS DOUBLE), 6)
        |    ELSE NULL END AS words_per_sentence,
        |  CAST(max(n_sent) AS BIGINT) AS max_sentences
        |FROM per_doc GROUP BY lang""".stripMargin) { (s, d) =>
      val perDoc = Tables.documents(s, d).select(
        col("lang"),
        size(filter(split(col("text"), "[.!?]+"),
          sEl => length(trim(sEl)) > 0)).cast("long").as("n_sent"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_words"))
      perDoc.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_sent")).as("total_sentences"),
          round(sum(col("n_sent")).cast("double") / count(lit(1)).cast("double"), 6)
            .as("sentences_per_doc"),
          when(sum(col("n_sent")) > 0,
            round(sum(col("n_words")).cast("double") / sum(col("n_sent")).cast("double"), 6))
            .otherwise(lit(null)).as("words_per_sentence"),
          max(col("n_sent")).as("max_sentences"))
    }
  )
}
