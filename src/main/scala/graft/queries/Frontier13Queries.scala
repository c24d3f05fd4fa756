package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Thirteenth frontier batch: the Lorenz concentration curve (Gini's
  * graphical companion) and the dedup-impact report every corpus
  * curation run publishes.
  */
object Frontier13Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A46: Lorenz curve (revenue concentration by customer decile) -----
    // "The top 10% of customers drive X% of revenue." Customers rank
    // by revenue through ShardedRank (global total order, no
    // unpartitioned window), land in 10 equal-count rank buckets, and
    // each decile reports its exact revenue share — cumulative shares
    // are cross-multiplied integer ratios, ONE division each. The
    // curve integrates to a33's Gini (spec cross-checks the top
    // decile against the rank-sum formula's concentration).
    QueryDef.sql(
      "a46_lorenz_curve",
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |rk AS (
        |  SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i,
        |    (SELECT count(*) FROM rev) AS n
        |  FROM rev),
        |dec AS (
        |  SELECT CAST(((i - 1) * 10) // n AS INTEGER) + 1 AS decile,
        |    CAST(count(*) AS BIGINT) AS n_customers,
        |    CAST(sum(x) AS BIGINT) AS rev_units
        |  FROM rk GROUP BY 1),
        |tot AS (SELECT CAST(sum(rev_units) AS BIGINT) AS total FROM dec),
        |cum AS (
        |  SELECT decile, n_customers, rev_units,
        |    CAST(sum(rev_units) OVER (ORDER BY decile) AS BIGINT) AS cum_units
        |  FROM dec)
        |SELECT decile, n_customers,
        |  CAST(rev_units AS DOUBLE) / CAST(total AS DOUBLE) AS share,
        |  CAST(cum_units AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
        |FROM cum CROSS JOIN tot""".stripMargin) { (s, d) =>
      val rev = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 4)) * lit(10000))
          .cast("long")).as("x"))
      val n = rev.agg(count(lit(1)).as("n"))
      val rk = graft.operators.ShardedRank.withRank(rev, "i", col("x"), col("o_custkey"))
      val dec = rk.crossJoin(broadcast(n))
        .select(expr("cast(((i - 1) * 10) div n as int) + 1").as("decile"), col("x"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"), sum(col("x")).as("rev_units"))
      val tot = dec.agg(sum(col("rev_units")).as("total"))
      // decile-grain (10 rows) cumulative — bounded window
      val w = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dec.withColumn("cum_units", sum(col("rev_units")).over(w))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n_customers"),
          (col("rev_units").cast("double") / col("total").cast("double")).as("share"),
          (col("cum_units").cast("double") / col("total").cast("double")).as("cum_share"))
    },

    // ---- T36: dedup-impact report ------------------------------------------
    // The before/after curation readout: per source, documents and
    // tokens before exact dedup, after (md5 keeper = min doc_id, d1's
    // policy), and the exact token-reduction ratio. One scan computes
    // doc-grain stats; the keeper set is a semi-join against the d1
    // group table; reductions are single divisions of exact integers.
    QueryDef.sql(
      "t36_dedup_impact",
      """WITH t AS (
        |  SELECT source, doc_id, md5(text) AS h,
        |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS toks
        |  FROM documents),
        |keep AS (
        |  SELECT min(doc_id) AS keeper FROM t GROUP BY h)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS docs_before,
        |  CAST(count(*) FILTER (WHERE keeper IS NOT NULL) AS BIGINT) AS docs_after,
        |  CAST(sum(toks) AS BIGINT) AS tokens_before,
        |  CAST(sum(toks) FILTER (WHERE keeper IS NOT NULL) AS BIGINT) AS tokens_after,
        |  1 - CAST(sum(toks) FILTER (WHERE keeper IS NOT NULL) AS DOUBLE)
        |    / CAST(sum(toks) AS DOUBLE) AS token_reduction
        |FROM t LEFT JOIN keep ON t.doc_id = keep.keeper
        |GROUP BY source""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("source"), col("doc_id"), md5(col("text")).as("h"),
          graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("toks"))
      val keep = t.groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
        .select(col("keeper"))
      val flagged = t.join(keep, t("doc_id") === keep("keeper"), "left")
      flagged.groupBy(col("source"))
        .agg(count(lit(1)).as("docs_before"),
          count(when(col("keeper").isNotNull, 1)).as("docs_after"),
          sum(col("toks")).as("tokens_before"),
          sum(when(col("keeper").isNotNull, col("toks"))).as("tokens_after"))
        .withColumn("token_reduction",
          lit(1) - col("tokens_after").cast("double") / col("tokens_before").cast("double"))
    }
  )
}
