package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Ninety-second frontier batch: bitemporal as-at reconstruction, trace
  * sampling policy comparison, histogram-based asset matching.
  */
object Frontier92Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- U71: bitemporal as-of / as-at reconstruction -------------------------
    // Two time axes at once: VALID time (when the order exists —
    // o_orderdate) and TRANSACTION time (when we learned each shipped
    // increment — l_shipdate). The ledger holds every order's running
    // shipped value as (vt, tt, amount) versions; the query answers
    // "what did we BELIEVE on day T about orders valid by day V" —
    // latest tt ≤ T per order via one bounded per-order window, vt ≤ V
    // as a plain pushable filter. T = max ship − 60d, V = T − 30d.
    QueryDef.sql(
      "u71_bitemporal_asat",
      """WITH mx AS (SELECT max(CAST(l_shipdate AS DATE)) AS ms FROM lineitem),
        |ledger AS (
        |  SELECT o.o_orderkey, o.o_orderpriority,
        |    CAST(o.o_orderdate AS DATE) AS vt, sub.tt, sub.amt
        |  FROM orders o JOIN (
        |    SELECT l_orderkey, tt,
        |      CAST(sum(day_cents) OVER (PARTITION BY l_orderkey ORDER BY tt
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS amt
        |    FROM (
        |      SELECT l_orderkey, CAST(l_shipdate AS DATE) AS tt,
        |        CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |          AS day_cents
        |      FROM lineitem GROUP BY 1, 2)) sub
        |    ON sub.l_orderkey = o.o_orderkey),
        |asat AS (
        |  SELECT l.o_orderkey, l.o_orderpriority, l.amt
        |  FROM (
        |    SELECT l.*, row_number() OVER (PARTITION BY l.o_orderkey
        |      ORDER BY l.tt DESC) AS rn
        |    FROM ledger l CROSS JOIN mx
        |    WHERE l.tt <= mx.ms - 60 AND l.vt <= mx.ms - 90) l
        |  WHERE l.rn = 1)
        |SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(amt) AS BIGINT) AS believed_cents
        |FROM asat GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val mx = Tables.lineitem(s, d)
        .agg(max(col("l_shipdate").cast("date")).as("ms"))
      val sub = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"), col("l_shipdate").cast("date").as("tt"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).cast("long")
          .as("day_cents"))
        .withColumn("amt", sum(col("day_cents")).over(Window
          .partitionBy(col("l_orderkey")).orderBy(col("tt"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      val ledger = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate").cast("date").as("vt"))
        .join(sub, col("l_orderkey") === col("o_orderkey"))
      ledger.crossJoin(broadcast(mx))
        .filter(col("tt") <= date_sub(col("ms"), 60) &&
          col("vt") <= date_sub(col("ms"), 90))
        .withColumn("rn", row_number().over(Window.partitionBy(col("o_orderkey"))
          .orderBy(col("tt").desc)))
        .filter(col("rn") === 1)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("amt")).cast("long").as("believed_cents"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- EV96: trace sampling policy comparison -------------------------------
    // The observability budget decision: HEAD sampling (hash the
    // session id, keep 10%) is cheap but blind; TAIL sampling (keep
    // sessions with an error or ≥10 min duration) needs buffering but
    // sees what matters. Sessionize once, score each session's md5
    // coin flip and its tail triggers, and emit one row per policy:
    // sessions kept, events kept, and — the number that decides the
    // argument — what fraction of ERROR sessions each policy retains.
    QueryDef.sql(
      "ev96_trace_sampling",
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |      OR lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |se AS (
        |  SELECT user_id, t, event_type,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM e),
        |sess AS (
        |  SELECT user_id, sid,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(max(t) - min(t) AS BIGINT) AS dur,
        |    CAST(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS has_err,
        |    CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#' ||
        |      CAST(sid AS VARCHAR)), 1, 4))::BIGINT % 100 < 10
        |      THEN 1 ELSE 0 END AS head_keep
        |  FROM se GROUP BY user_id, sid),
        |tagged AS (
        |  SELECT *, CASE WHEN has_err = 1 OR dur >= 600000000 THEN 1 ELSE 0 END
        |    AS tail_keep
        |  FROM sess),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_sess,
        |    CAST(sum(has_err) AS BIGINT) AS n_err
        |  FROM tagged)
        |SELECT p.policy,
        |  CAST(p.kept AS BIGINT) AS sessions_kept,
        |  CAST(p.kept * 1000 // t.n_sess AS BIGINT) AS keep_permille,
        |  CAST(p.ev AS BIGINT) AS events_kept,
        |  CAST(p.err AS BIGINT) AS error_sessions_kept,
        |  CAST(CASE WHEN t.n_err > 0 THEN p.err * 1000 // t.n_err ELSE 0 END
        |    AS BIGINT) AS error_coverage_permille
        |FROM (
        |  SELECT 'head_10pct' AS policy, sum(head_keep) AS kept,
        |    sum(head_keep * n_events) AS ev, sum(head_keep * has_err) AS err
        |  FROM tagged
        |  UNION ALL
        |  SELECT 'tail_errors', sum(tail_keep), sum(tail_keep * n_events),
        |    sum(tail_keep * has_err) FROM tagged) p
        |CROSS JOIN tot t ORDER BY p.policy""".stripMargin) { (s, d) =>
      val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts)").as("t"), col("ts"))
        .withColumn("new_s",
          when(col("t") - lag(col("t"), 1).over(wUser) > 1800000000L, 1)
            .when(lag(col("t"), 1).over(wUser).isNull, 1).otherwise(0))
      val sess = e
        .withColumn("sid", sum(col("new_s")).over(Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("t")) - min(col("t"))).cast("long").as("dur"),
          max(when(col("event_type") === "error", 1).otherwise(0)).cast("long")
            .as("has_err"))
        .withColumn("head_keep",
          when(conv(substring(md5(concat(col("user_id").cast("string"), lit("#"),
            col("sid").cast("string"))), 1, 4), 16, 10).cast("long") % 100 < 10, 1)
            .otherwise(0))
        .withColumn("tail_keep",
          when(col("has_err") === 1 || col("dur") >= 600000000L, 1).otherwise(0))
        .localCheckpoint(true) // both policies and the totals read it
      val tot = sess.agg(count(lit(1)).as("n_sess"),
        sum(col("has_err")).cast("long").as("n_err"))
      def policy(name: String, keep: String): DataFrame =
        sess.agg(sum(col(keep)).as("kept"),
          sum(col(keep) * col("n_events")).as("ev"),
          sum(col(keep) * col("has_err")).as("err"))
          .select(lit(name).as("policy"), col("kept"), col("ev"), col("err"))
      policy("head_10pct", "head_keep")
        .unionByName(policy("tail_errors", "tail_keep"))
        .crossJoin(broadcast(tot))
        .select(col("policy"),
          col("kept").cast("long").as("sessions_kept"),
          expr("cast(kept * 1000 div n_sess as bigint)").as("keep_permille"),
          col("ev").cast("long").as("events_kept"),
          col("err").cast("long").as("error_sessions_kept"),
          expr("cast(CASE WHEN n_err > 0 THEN err * 1000 div n_err ELSE 0 END as bigint)")
            .as("error_coverage_permille"))
        .orderBy(col("policy"))
    },

    // ---- M13: color-histogram asset matching ----------------------------------
    // Retrieval that survives re-encoding: each "image" (stub codec
    // sample stream) reduces to a 16-bin intensity histogram, and
    // queries match by chi-square-style distance — Σ (a−b)²·1000 div
    // (a+b+1) per bin, all integer. Query set = assets with id ≤ 30;
    // the candidate scan broadcasts the 10 query histograms, so
    // matching is one pass over the corpus regardless of scale.
    QueryDef.sql(
      "m13_histogram_match",
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    list_transform(range(0, 16), b -> CAST(len(list_filter(
        |      list_transform(string_split_regex(substring(text, 1, 128), ''),
        |        ch -> ascii(ch)),
        |      c -> c // 16 = b)) AS BIGINT)) AS hist
        |  FROM documents WHERE doc_id % 3 = 0),
        |q AS (SELECT asset_id AS qid, hist AS qh FROM a WHERE asset_id <= 30),
        |scored AS (
        |  SELECT q.qid, c.asset_id AS cid,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 17),
        |        i -> (q.qh[i] - c.hist[i]) * (q.qh[i] - c.hist[i]) * 1000
        |          // (q.qh[i] + c.hist[i] + 1))), (x, y) -> x + y) AS BIGINT)
        |      AS dist
        |  FROM q JOIN a c ON c.asset_id <> q.qid),
        |best AS (
        |  SELECT qid, cid, dist,
        |    row_number() OVER (PARTITION BY qid ORDER BY dist, cid) AS rn
        |  FROM scored)
        |SELECT qid AS query_id, cid AS match_id, dist AS dist_milli
        |FROM best WHERE rn = 1 ORDER BY query_id""".stripMargin) { (s, d) =>
      val a = Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("asset_id"),
          expr("""transform(sequence(0, 15), b -> cast(size(filter(
            transform(split(substring(text, 1, 128), ''), ch -> ascii(ch)),
            c -> c div 16 = b)) as bigint))""").as("hist"))
        .localCheckpoint(true) // query set and candidate scan read it
      val q = a.filter(col("asset_id") <= 30)
        .select(col("asset_id").as("qid"), col("hist").as("qh"))
      a.select(col("asset_id").as("cid"), col("hist"))
        .crossJoin(broadcast(q))
        .filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"),
          expr("""cast(aggregate(zip_with(qh, hist,
            (x, y) -> (x - y) * (x - y) * 1000 div (x + y + 1)),
            cast(0 as bigint), (acc, v) -> acc + v) as bigint)""").as("dist"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("dist"), col("cid"))))
        .filter(col("rn") === 1)
        .select(col("qid").as("query_id"), col("cid").as("match_id"),
          col("dist").as("dist_milli"))
        .orderBy(col("query_id"))
    }
  )
}
