package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Fourteenth frontier batch: the Spark-4-native semi-structured path
  * (VARIANT shredding), correlated LATERAL top-k, and session path
  * mining — three surfaces a reference user would reach for that the
  * registered surface didn't yet cover.
  */
object Frontier14Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- F5: VARIANT shredding --------------------------------------------
    // Spark 4's binary-variant path for semi-structured columns: the
    // JSON string parses ONCE into the VARIANT encoding at the scan
    // stage, and every downstream `variant_get` is a byte-offset field
    // access — no per-extraction string reparse, which is the 100 TB
    // difference vs get_json_object chains (f3). The shredded field
    // feeds a normal partial-agg rollup; value sums go through DECIMAL
    // so the hash is order-independent.
    QueryDef.sql(
      "f5_variant_shred",
      """SELECT CAST(json_extract(props, '$.k') AS INT) // 10 AS k_bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events
        |GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(
          variant_get(parse_json(col("props")), "$.k", "int").as("k"),
          col("user_id"), col("value"))
        .groupBy(expr("k div 10").as("k_bucket"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total"))
    },

    // ---- J8: correlated LATERAL top-k -------------------------------------
    // The "for each group, its top rows" shape written the way an
    // analyst writes it — a correlated LATERAL subquery with ORDER BY
    // + LIMIT — executed by Spark's lateral-join decorrelation rather
    // than a hand-rolled window. Both engines run the SAME SQL shape
    // (DuckDB executes LATERAL natively), so this pins Spark's
    // decorrelation output against an independent implementation.
    // Tie-break (c_acctbal DESC, c_name) is total, so the top-2 set is
    // deterministic. Scale: the outer side here is a dimension; for a
    // large outer the same query decorrelates to a partitioned rank —
    // no per-row re-execution (PlanShape guarded in the spec).
    QueryDef.sql(
      "j8_lateral_topk",
      """SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin) { (s, d) =>
      Tables.nation(s, d).createOrReplaceTempView("nation")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      s.sql(
        """SELECT n.n_name, t.c_name, t.c_acctbal
          |FROM nation n, LATERAL (
          |  SELECT c_name, c_acctbal FROM customer c
          |  WHERE c.c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin)
    },

    // ---- EV41: session path mining ----------------------------------------
    // Top-10 opening event-type paths (first 3 events per session):
    // the product-analytics "how do sessions start" readout. Sessions
    // use the strict >30 min gap rule shared with ev12/ev30; the first
    // 3 events are selected by a PARTITIONED row_number (user, session)
    // — the per-group state is bounded at 3 rows BEFORE the path
    // aggregate, so no session's full event list is ever materialized.
    // Path strings concatenate in rank order via a 3-element
    // sort_array fold; the final top-10 is TakeOrdered on the total
    // order (n DESC, path ASC).
    QueryDef.sql(
      "ev41_event_paths",
      """WITH lagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS BIGINT) AS sess_id
        |  FROM lagged),
        |rn AS (
        |  SELECT user_id, sess_id, event_type,
        |    row_number() OVER (PARTITION BY user_id, sess_id
        |                       ORDER BY ts, event_id) AS rk
        |  FROM sess),
        |paths AS (
        |  SELECT user_id, sess_id,
        |    string_agg(event_type, '>' ORDER BY rk) AS path
        |  FROM rn WHERE rk <= 3 GROUP BY 1, 2)
        |SELECT path, CAST(count(*) AS BIGINT) AS n
        |FROM paths GROUP BY path
        |ORDER BY n DESC, path LIMIT 10""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val lagged = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("new_sess",
          when(lag(col("ts"), 1).over(w).isNull ||
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800000000L,
            1).otherwise(0))
      val sess = lagged.withColumn("sess_id",
        sum(col("new_sess")).over(w).cast("long"))
      val wSess = Window.partitionBy(col("user_id"), col("sess_id"))
        .orderBy(col("ts"), col("event_id"))
      val firstK = sess.withColumn("rk", row_number().over(wSess))
        .filter(col("rk") <= 3)
      val paths = firstK.groupBy(col("user_id"), col("sess_id"))
        .agg(array_join(
          transform(sort_array(collect_list(struct(col("rk"), col("event_type")))),
            e => e.getField("event_type")), ">").as("path"))
      paths.groupBy(col("path")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(10)
    }
  )
}
