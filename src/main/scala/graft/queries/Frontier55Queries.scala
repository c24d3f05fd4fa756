package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Fifty-fifth frontier batch: normalization-uplift dedup audit, grouped
  * Spearman rank correlation, Hampel outlier filter.
  */
object Frontier55Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- T55: normalization-uplift dedup audit ------------------------------
    // Raw exact-dedup (d1) misses near-identical docs that differ only
    // in case/punctuation/whitespace. This is the curation A/B every
    // pipeline runs before committing to a normalizer: canonicalize
    // (lower → strip non-alnum → collapse runs → trim) and report, per
    // source, how many extra duplicates normalization surfaces. Dup
    // counting ships md5 digests, never texts (d8's discipline). One
    // source-grain shuffle; both distinct-counts ride the same pass.
    QueryDef.sql(
      "t55_normalized_dedup",
      """WITH n AS (
        |  SELECT doc_id, source,
        |    md5(text) AS raw_h,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |      ' +', ' ', 'g'))) AS norm_h
        |  FROM documents)
        |SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) - count(DISTINCT raw_h) AS BIGINT) AS raw_dups,
        |  CAST(count(*) - count(DISTINCT norm_h) AS BIGINT) AS norm_dups,
        |  CAST(count(DISTINCT raw_h) - count(DISTINCT norm_h) AS BIGINT)
        |    AS uplift
        |FROM n GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val n = Tables.documents(s, d).select(col("doc_id"), col("source"),
        md5(col("text")).as("raw_h"),
        md5(trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", " "), " +", " "))).as("norm_h"))
      n.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          (count(lit(1)) - count_distinct(col("raw_h"))).as("raw_dups"),
          (count(lit(1)) - count_distinct(col("norm_h"))).as("norm_dups"),
          (count_distinct(col("raw_h")) - count_distinct(col("norm_h")))
            .as("uplift"))
        .orderBy(col("source"))
    },

    // ---- A115: grouped Spearman rank correlation ----------------------------
    // The monotone-association sibling of a16's Pearson: rho = Pearson
    // over MIDRANKS, kept exact by doubling ranks (a112's 2·midrank =
    // 2·min_rank + ties − 1) and shipping the a104-style signed rho²
    // in micro units — n⁴-scale moment products ride DECIMAL(38,0).
    // Here: does spend correlate with time-of-day, per event type?
    // Two rank windows share the group partitioning (one shuffle);
    // moments are one crumb aggregate.
    QueryDef.sql(
      "a115_spearman",
      """WITH v AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS x,
        |    epoch_us(ts) % 86400000000 AS y
        |  FROM events),
        |r AS (
        |  SELECT event_type,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY x)
        |      + count(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
        |    2 * rank() OVER (PARTITION BY event_type ORDER BY y)
        |      + count(*) OVER (PARTITION BY event_type, y) - 1 AS ry
        |  FROM v),
        |mom AS (
        |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(rx) AS HUGEINT) AS sx, CAST(sum(ry) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy,
        |    CAST(sum(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy
        |  FROM r GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    (CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END)
        |    * (((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000)
        |       // ((n * sxx - sx * sx) * (n * syy - sy * sy)))
        |    END AS BIGINT) AS rho2_signed_micro
        |FROM mom ORDER BY event_type""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d).select(col("event_type"),
        floor(col("value") * 100).cast("long").as("x"),
        (unix_micros(col("ts")) % 86400000000L).as("y"))
      val byT = Window.partitionBy(col("event_type"))
      val r = v.select(col("event_type"),
        (lit(2) * rank().over(byT.orderBy(col("x")))
          + count(lit(1)).over(Window.partitionBy(col("event_type"), col("x"))) - 1)
          .cast("decimal(38,0)").as("rx"),
        (lit(2) * rank().over(byT.orderBy(col("y")))
          + count(lit(1)).over(Window.partitionBy(col("event_type"), col("y"))) - 1)
          .cast("decimal(38,0)").as("ry"))
      val mom = r.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
          sum(col("rx") * col("rx")).as("sxx"),
          sum(col("ry") * col("ry")).as("syy"),
          sum(col("rx") * col("ry")).as("sxy"))
      mom.select(col("event_type"), col("n").cast("long").as("n"),
          when((col("n") * col("sxx") - col("sx") * col("sx")) > 0 &&
               (col("n") * col("syy") - col("sy") * col("sy")) > 0,
            when(col("n") * col("sxy") - col("sx") * col("sy") >= 0, 1).otherwise(-1)
              * expr("""((n * sxy - sx * sy) * (n * sxy - sx * sy) * 1000000)
                        div ((n * sxx - sx * sx) * (n * syy - sy * sy))"""))
            .cast("long").as("rho2_signed_micro"))
        .orderBy(col("event_type"))
    },

    // ---- W16: Hampel outlier filter (rolling median ± 3·MAD) ----------------
    // The robust despiker every sensor/metrics pipeline runs: a value
    // is an outlier when it strays more than 3 MADs from its local
    // median over a centered 9-point frame. BOTH medians are exact
    // middle-ranks of the 9-element frame array (bounded frame → the
    // sort is per-row constant work, the w8/a21 discipline without a
    // second window), and the test |x−med| > 3·MAD is pure integers.
    // Scale: one user-partitioned window; emits only the flagged rows.
    QueryDef.sql(
      "w16_hampel_outliers",
      """WITH v AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(floor(value * 100) AS BIGINT) AS x
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, x,
        |    list(x) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 4 PRECEDING AND 4 FOLLOWING) AS frame
        |  FROM v),
        |m AS (
        |  SELECT user_id, event_id, x, frame,
        |    list_sort(frame)[5] AS med
        |  FROM f WHERE len(frame) = 9),
        |h AS (
        |  SELECT user_id, event_id, x, med,
        |    list_sort(list_transform(frame, z -> abs(z - med)))[5] AS mad
        |  FROM m)
        |SELECT user_id, event_id, x, med, mad
        |FROM h WHERE abs(x - med) > 3 * mad
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, 4)
      val f = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          floor(col("value") * 100).cast("long").as("x"))
        .withColumn("frame", collect_list(col("x")).over(w))
        .filter(size(col("frame")) === 9)
      val m = f.withColumn("med", expr("array_sort(frame)[4]"))
        .withColumn("mad",
          expr("array_sort(transform(frame, z -> abs(z - med)))[4]"))
      m.filter(abs(col("x") - col("med")) > lit(3) * col("mad"))
        .select(col("user_id"), col("event_id"), col("x"), col("med"), col("mad"))
        .orderBy(col("user_id"), col("event_id"))
    }
  )
}
