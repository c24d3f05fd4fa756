package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Seventy-eighth frontier batch: write-audit-publish gate, binarization
  * balance sweep, first-session revenue share.
  */
object Frontier78Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- U63: write-audit-publish gate ---------------------------------------
    // The deployment pattern for derived tables: write to staging,
    // AUDIT (row count inside expected bounds, zero null keys, content
    // fingerprint), publish only when every audit passes. The audits
    // run as one pass over the staged daily-revenue table; the verdict
    // row is what a WAP orchestrator would branch on — and the
    // fingerprint makes "what got published" attestable (c40/c46).
    QueryDef.sql(
      "u63_write_audit_publish",
      """WITH staged AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS revenue_cents,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1),
        |audits AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) BETWEEN 28 AND 31 AS INT) AS rowcount_ok,
        |    CAST(count(*) = count(day) AS INT) AS keys_ok,
        |    CAST(count(*) = count(DISTINCT day) AS INT) AS unique_ok,
        |    CAST(min(revenue_cents) >= 0 AS INT) AS range_ok,
        |    CAST(CAST(sum(CAST(('0x' || substr(md5(
        |        CAST(day AS VARCHAR) || ':' || CAST(revenue_cents AS VARCHAR)),
        |        1, 15))::BIGINT AS HUGEINT)) AS HUGEINT) % 1000000007 AS BIGINT)
        |      AS fingerprint
        |  FROM staged)
        |SELECT n_rows, rowcount_ok, keys_ok, unique_ok, range_ok, fingerprint,
        |  CAST(rowcount_ok = 1 AND keys_ok = 1 AND unique_ok = 1
        |    AND range_ok = 1 AS INT) AS publish
        |FROM audits""".stripMargin) { (s, d) =>
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val staged = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).cast("long")
          .as("revenue_cents"),
          count(lit(1)).as("n_events"))
      val audits = staged.agg(count(lit(1)).as("n_rows"),
        (count(lit(1)).between(28, 31)).cast("int").as("rowcount_ok"),
        (count(lit(1)) === count(col("day"))).cast("int").as("keys_ok"),
        (count(lit(1)) === count_distinct(col("day"))).cast("int").as("unique_ok"),
        (min(col("revenue_cents")) >= 0).cast("int").as("range_ok"),
        pmod(sum(conv(substring(md5(concat(col("day").cast("string"), lit(":"),
          col("revenue_cents").cast("string"))), 1, 15), 16, 10).cast(dec)),
          lit(1000000007L).cast(dec)).cast("long").as("fingerprint"))
      audits.withColumn("publish",
        (col("rowcount_ok") === 1 && col("keys_ok") === 1 &&
          col("unique_ok") === 1 && col("range_ok") === 1).cast("int"))
    },

    // ---- V47: binarization balance sweep --------------------------------------
    // Sign-LSH (d13/v41/v46) thresholds every dimension at zero — but
    // skewed dimensions give skewed bits, and skewed bits waste index
    // entropy. Per dimension: the zero-threshold imbalance vs the
    // MEDIAN-threshold imbalance (exact middle-rank over a per-dim rank
    // window). The report quantifies how much balance a learned
    // threshold buys — the audit behind ITQ-style binarization.
    QueryDef.sql(
      "v47_bit_balance",
      """WITH q AS (
        |  SELECT u.i AS dim,
        |    CAST(floor(CAST(u.v AS DOUBLE) * 1000000) AS BIGINT) AS qv
        |  FROM embeddings e,
        |    LATERAL (SELECT unnest(e.embedding) AS v,
        |             generate_subscripts(e.embedding, 1) - 1 AS i) u),
        |r AS (
        |  SELECT dim, qv,
        |    row_number() OVER (PARTITION BY dim ORDER BY qv) AS rk,
        |    CAST(count(*) OVER (PARTITION BY dim) AS BIGINT) AS n
        |  FROM q),
        |med AS (
        |  SELECT dim, CAST(max(CASE WHEN rk = (n + 1) // 2 THEN qv END) AS BIGINT)
        |    AS med_qv
        |  FROM r GROUP BY 1),
        |bal AS (
        |  SELECT q.dim, max(m.med_qv) AS med_qv,
        |    CAST(count(CASE WHEN q.qv >= 0 THEN 1 END) AS BIGINT) AS ones_zero_thr,
        |    CAST(count(CASE WHEN q.qv > m.med_qv THEN 1 END) AS BIGINT)
        |      AS ones_med_thr,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM q JOIN med m USING (dim) GROUP BY 1)
        |SELECT CAST(dim AS INT) AS dim, med_qv,
        |  CAST(abs(2 * ones_zero_thr - n) * 1000 // n AS BIGINT)
        |    AS imbalance_zero_permille,
        |  CAST(abs(2 * ones_med_thr - n) * 1000 // n AS BIGINT)
        |    AS imbalance_med_permille
        |FROM bal ORDER BY dim""".stripMargin) { (s, d) =>
      val q = Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("dim"),
          floor(col("v").cast("double") * 1000000).cast("long").as("qv"))
        .localCheckpoint(true) // the median pass and the balance pass share it
      val r = q.withColumn("rk", row_number().over(
          Window.partitionBy(col("dim")).orderBy(col("qv"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("dim"))))
      val med = r.groupBy(col("dim"))
        .agg(max(when(col("rk") === expr("(n + 1) div 2"), col("qv")))
          .cast("long").as("med_qv"))
      val bal = q.join(broadcast(med), "dim")
        .groupBy(col("dim"))
        .agg(max(col("med_qv")).as("med_qv"),
          count(when(col("qv") >= 0, 1)).as("ones_zero_thr"),
          count(when(col("qv") > col("med_qv"), 1)).as("ones_med_thr"),
          count(lit(1)).as("n"))
      bal.select(col("dim").cast("int").as("dim"), col("med_qv"),
          expr("abs(2 * ones_zero_thr - n) * 1000 div n").cast("long")
            .as("imbalance_zero_permille"),
          expr("abs(2 * ones_med_thr - n) * 1000 div n").cast("long")
            .as("imbalance_med_permille"))
        .orderBy(col("dim"))
    },

    // ---- EV91: first-session revenue share -------------------------------------
    // The acquisition question: how much of a user's revenue lands in
    // their FIRST session? Sessions come from the house 30-min gap
    // rule; the report splits each user's purchase cents into
    // first-session vs later and rolls up by the user's first-seen
    // day. One user window for session ids, crumbs after.
    QueryDef.sql(
      "ev91_first_session_share",
      """WITH l AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |      OR lag(epoch_us(ts)) OVER
        |        (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      THEN 1 ELSE 0 END AS ns
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts, event_type, cents,
        |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
        |  FROM l),
        |pu AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS first_day,
        |    CAST(sum(CASE WHEN sid = 1 AND event_type = 'purchase'
        |      THEN cents ELSE 0 END) AS BIGINT) AS first_cents,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN cents ELSE 0 END) AS BIGINT) AS total_cents
        |  FROM sess GROUP BY 1)
        |SELECT first_day, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(first_cents) AS BIGINT) AS first_session_cents,
        |  CAST(sum(total_cents) AS BIGINT) AS total_cents,
        |  CAST(CASE WHEN sum(total_cents) > 0 THEN
        |    sum(first_cents) * 1000 // sum(total_cents) END AS BIGINT)
        |    AS first_share_permille
        |FROM pu GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val l = Tables.events(s, d)
        .withColumn("cents", floor(col("value") * 100).cast("long"))
        .withColumn("ns",
          when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(wo)
            > 1800000000L ||
            lag(unix_micros(col("ts")), 1).over(wo).isNull, 1).otherwise(0))
      val sess = l.withColumn("sid", sum(col("ns"))
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val pu = sess.groupBy(col("user_id"))
        .agg(min(col("ts")).cast("date").as("first_day"),
          sum(when(col("sid") === 1 && col("event_type") === "purchase",
            col("cents")).otherwise(0L)).cast("long").as("first_cents"),
          sum(when(col("event_type") === "purchase", col("cents")).otherwise(0L))
            .cast("long").as("total_cents"))
      pu.groupBy(col("first_day"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("first_cents")).cast("long").as("first_session_cents"),
          sum(col("total_cents")).cast("long").as("total_cents"),
          when(sum(col("total_cents")) > 0,
            expr("sum(first_cents) * 1000 div sum(total_cents)"))
            .cast("long").as("first_share_permille"))
        .orderBy(col("first_day"))
    }
  )
}
