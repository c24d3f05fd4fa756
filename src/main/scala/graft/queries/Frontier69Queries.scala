package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Sixty-ninth frontier batch: weekday-seasonal anomaly days, balanced
  * mini-batch composition, NULL-semantics surface.
  */
object Frontier69Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- W20: weekday-seasonal anomaly days ---------------------------------
    // "Was Tuesday weird FOR A TUESDAY?" — each day's revenue compares
    // against its own weekday's median ± 3·MAD. Both medians are exact
    // middle-rank sums over the weekday's ≤5 samples (array_sort of a
    // collected list — the frame is CALENDAR-bounded, so the per-group
    // sort is constant work, w16's discipline); the flag test scales
    // through doubled units (2·dev2 > 3·mad4) so no division ever runs.
    QueryDef.sql(
      "w20_weekday_anomaly",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(dayofweek(ts) AS INT) AS dow,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |med AS (
        |  SELECT dow, list_sort(list(x)) AS xs, CAST(count(*) AS BIGINT) AS m
        |  FROM daily GROUP BY 1),
        |m2 AS (
        |  SELECT dow, m,
        |    CASE WHEN m % 2 = 1 THEN 2 * xs[CAST((m + 1) // 2 AS INT)]
        |         ELSE xs[CAST(m // 2 AS INT)] + xs[CAST(m // 2 + 1 AS INT)] END
        |      AS med2,
        |    xs
        |  FROM med),
        |dev AS (
        |  SELECT d.day, d.dow, d.x, m2.med2, m2.m,
        |    abs(2 * d.x - m2.med2) AS dev2
        |  FROM daily d JOIN m2 USING (dow)),
        |madt AS (
        |  SELECT dow, list_sort(list(dev2)) AS ds, CAST(count(*) AS BIGINT) AS m
        |  FROM dev GROUP BY 1),
        |mad4 AS (
        |  SELECT dow,
        |    CASE WHEN m % 2 = 1 THEN 2 * ds[CAST((m + 1) // 2 AS INT)]
        |         ELSE ds[CAST(m // 2 AS INT)] + ds[CAST(m // 2 + 1 AS INT)] END
        |      AS mad4
        |  FROM madt)
        |SELECT d.day, d.dow, d.x AS total_cents, d.med2, f.mad4,
        |  CAST(2 * d.dev2 > 3 * f.mad4 AS INT) AS is_anomaly
        |FROM dev d JOIN mad4 f USING (dow)
        |ORDER BY d.day""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"),
          (dayofweek(col("ts")) - 1).cast("int").as("dow"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).cast("long").as("x"))
        .localCheckpoint(true) // day rows feed the medians and the flags
      def middle2(listCol: String, mCol: String): org.apache.spark.sql.Column =
        expr(s"""IF($mCol % 2 = 1, 2 * element_at($listCol, cast(($mCol + 1) div 2 as int)),
               element_at($listCol, cast($mCol div 2 as int))
               + element_at($listCol, cast($mCol div 2 + 1 as int)))""")
      val m2 = daily.groupBy(col("dow"))
        .agg(sort_array(collect_list(col("x"))).as("xs"), count(lit(1)).as("m"))
        .select(col("dow"), middle2("xs", "m").as("med2"))
      val dev = daily.join(broadcast(m2), "dow")
        .withColumn("dev2", abs(lit(2) * col("x") - col("med2")))
      val mad4 = dev.groupBy(col("dow"))
        .agg(sort_array(collect_list(col("dev2"))).as("ds"), count(lit(1)).as("m"))
        .select(col("dow"), middle2("ds", "m").as("mad4"))
      dev.join(broadcast(mad4), "dow")
        .select(col("day"), col("dow"), col("x").as("total_cents"),
          col("med2"), col("mad4"),
          (lit(2) * col("dev2") > lit(3) * col("mad4")).cast("int").as("is_anomaly"))
        .orderBy(col("day"))
    },

    // ---- C45: class-balanced mini-batch composition -------------------------
    // Training plumbing: compose batches that hold exactly one document
    // per language, in a deterministic shuffled order (md5) — the
    // round-robin interleave that keeps every mini-batch class-balanced
    // without sampling. batch = the document's rank WITHIN its class;
    // the audit reports per-batch size and distinct-class count (full
    // batches must hold every class exactly once). One class-
    // partitioned rank window; the md5 order is cluster-stable.
    QueryDef.sql(
      "c45_balanced_batches",
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS batch_id
        |  FROM documents)
        |SELECT CAST(batch_id AS BIGINT) AS batch_id,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_classes,
        |  CAST(count(*) = count(DISTINCT lang) AS INT) AS balanced
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val r = Tables.documents(s, d).select(col("doc_id"), col("lang"),
        (row_number().over(Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))) - 1)
          .as("batch_id"))
      r.groupBy(col("batch_id").cast("long").as("batch_id"))
        .agg(count(lit(1)).as("n_items"),
          count_distinct(col("lang")).as("n_classes"),
          (count(lit(1)) === count_distinct(col("lang"))).cast("int").as("balanced"))
        .orderBy(col("batch_id"))
    },

    // ---- Q26: NULL-semantics surface ----------------------------------------
    // The three-valued-logic corners every engine must agree on:
    // null-rejecting equality (=), null-safe equality (<=> / IS NOT
    // DISTINCT FROM), IS DISTINCT FROM, NULLIF-generated nulls, and
    // null-aware counting — exercised over derived nullable columns
    // and counted in one pass. Disagreement here silently corrupts
    // every anti-join and dedup downstream, which is why it gets its
    // own hash-gated row.
    QueryDef.sql(
      "q26_null_semantics",
      """WITH t AS (
        |  SELECT NULLIF(event_type, 'error') AS a,
        |    CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_type END AS b
        |  FROM events)
        |SELECT
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(a) AS BIGINT) AS n_a_nonnull,
        |  CAST(count(b) AS BIGINT) AS n_b_nonnull,
        |  CAST(count(CASE WHEN a = b THEN 1 END) AS BIGINT) AS n_eq,
        |  CAST(count(CASE WHEN a IS NOT DISTINCT FROM b THEN 1 END) AS BIGINT)
        |    AS n_nullsafe_eq,
        |  CAST(count(CASE WHEN a IS DISTINCT FROM b THEN 1 END) AS BIGINT)
        |    AS n_distinct_from,
        |  CAST(count(DISTINCT a) AS BIGINT) AS n_distinct_a
        |FROM t""".stripMargin) { (s, d) =>
      val t = Tables.events(s, d).select(
        nullif(col("event_type"), lit("error")).as("a"),
        when(col("event_id") % 5 === 0, lit(null: String))
          .otherwise(col("event_type")).as("b"))
      t.agg(count(lit(1)).as("n_rows"),
        count(col("a")).as("n_a_nonnull"),
        count(col("b")).as("n_b_nonnull"),
        count(when(col("a") === col("b"), 1)).as("n_eq"),
        count(when(col("a") <=> col("b"), 1)).as("n_nullsafe_eq"),
        count(when(!(col("a") <=> col("b")), 1)).as("n_distinct_from"),
        count_distinct(col("a")).as("n_distinct_a"))
    }
  )
}
