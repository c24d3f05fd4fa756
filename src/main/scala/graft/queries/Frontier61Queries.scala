package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Sixty-first frontier batch: bitemporal restatement ledger, embedding
  * source-centroid drift, click-burst detection.
  */
object Frontier61Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- U45: bitemporal restatement ledger ---------------------------------
    // Finance-grade reporting: corrections arrive late (here every 10th
    // purchase restates to cents+7, a deterministic stand-in for a CDC
    // correction feed), and the ledger must answer BOTH "what did we
    // report?" (original values) and "what is true now?" (latest
    // version per fact) — plus the per-day restatement delta auditors
    // reconcile. Version resolution is one keyed max; both views and
    // the delta ride a single day-grain aggregate.
    QueryDef.sql(
      "u45_restatement_ledger",
      """WITH facts AS (
        |  SELECT event_id, CAST(ts AS DATE) AS day, 1 AS version,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT event_id, CAST(ts AS DATE), 2,
        |    CAST(floor(value * 100) AS BIGINT) + 7
        |  FROM events WHERE event_type = 'purchase' AND event_id % 10 = 0),
        |latest AS (
        |  SELECT event_id, day, cents FROM (
        |    SELECT *, row_number() OVER (PARTITION BY event_id
        |      ORDER BY version DESC) AS rn FROM facts) WHERE rn = 1),
        |rep AS (
        |  SELECT day, CAST(sum(cents) AS BIGINT) AS reported_cents,
        |    CAST(count(*) AS BIGINT) AS n_facts
        |  FROM facts WHERE version = 1 GROUP BY 1),
        |cur AS (
        |  SELECT day, CAST(sum(cents) AS BIGINT) AS current_cents,
        |    CAST(count(*) AS BIGINT) AS n_restated_in
        |  FROM latest GROUP BY 1)
        |SELECT r.day, r.n_facts, r.reported_cents, c.current_cents,
        |  CAST(c.current_cents - r.reported_cents AS BIGINT) AS restatement_cents
        |FROM rep r JOIN cur c USING (day) ORDER BY r.day""".stripMargin) { (s, d) =>
      val p = Tables.events(s, d).filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts").cast("date").as("day"),
          floor(col("value") * 100).cast("long").as("cents"))
        .localCheckpoint(true) // originals + corrections derive from one pass
      val facts = p.withColumn("version", lit(1))
        .unionByName(p.filter(col("event_id") % 10 === 0)
          .withColumn("cents", col("cents") + 7).withColumn("version", lit(2)))
      val latest = facts.withColumn("rn", row_number().over(
          Window.partitionBy(col("event_id")).orderBy(col("version").desc)))
        .filter(col("rn") === 1)
      val rep = facts.filter(col("version") === 1).groupBy(col("day"))
        .agg(sum(col("cents")).cast("long").as("reported_cents"),
          count(lit(1)).as("n_facts"))
      val cur = latest.groupBy(col("day"))
        .agg(sum(col("cents")).cast("long").as("current_cents"))
      rep.join(cur, "day")
        .select(col("day"), col("n_facts"), col("reported_cents"),
          col("current_cents"),
          (col("current_cents") - col("reported_cents")).cast("long")
            .as("restatement_cents"))
        .orderBy(col("day"))
    },

    // ---- V33: embedding source-centroid drift -------------------------------
    // Corpus monitoring for vector stores: does any label's centroid
    // drift from the global centroid? cos²(centroid_g, centroid_all)
    // is EXACT in integers because centroids enter the cosine only
    // through their (integer) coordinate SUMS — the count denominators
    // cancel: cos² = (Σa·Σb)² / (|Σa|²·|Σb|²). Coordinates quantize at
    // 10³ (v15's portable floor) so 64-dim sum products stay inside
    // DECIMAL(38,0)/HUGEINT. One dimension-exploded aggregate; the
    // cosine algebra runs on label-count-sized crumbs.
    QueryDef.sql(
      "v33_centroid_drift",
      """WITH q AS (
        |  SELECT e.label, u.i AS dim,
        |    CAST(floor(CAST(u.v AS DOUBLE) * 1000) AS BIGINT) AS qv
        |  FROM embeddings e,
        |    LATERAL (SELECT unnest(e.embedding) AS v,
        |             generate_subscripts(e.embedding, 1) - 1 AS i) u),
        |g AS (
        |  SELECT label, dim, CAST(sum(qv) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM q GROUP BY 1, 2),
        |al AS (
        |  SELECT dim, CAST(sum(s) AS BIGINT) AS sa FROM g GROUP BY 1),
        |dots AS (
        |  SELECT g.label, max(g.n) AS n_vecs,
        |    CAST(sum(CAST(g.s AS HUGEINT) * a.sa) AS HUGEINT) AS dot,
        |    CAST(sum(CAST(g.s AS HUGEINT) * g.s) AS HUGEINT) AS na,
        |    CAST(sum(CAST(a.sa AS HUGEINT) * a.sa) AS HUGEINT) AS nb
        |  FROM g JOIN al a USING (dim) GROUP BY 1)
        |SELECT CAST(label AS INT) AS label, CAST(n_vecs AS BIGINT) AS n_vecs,
        |  CAST(CASE WHEN na > 0 AND nb > 0 THEN
        |    (CASE WHEN dot >= 0 THEN 1 ELSE -1 END)
        |    * ((dot * dot * 1000000) // (na * nb)) END AS BIGINT)
        |    AS cos2_signed_micro
        |FROM dots ORDER BY label""".stripMargin) { (s, d) =>
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val q = Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .select(col("label"), col("dim"),
          floor(col("v").cast("double") * 1000).cast("long").as("qv"))
      val g = q.groupBy(col("label"), col("dim"))
        .agg(sum(col("qv")).cast("long").as("s"), count(lit(1)).as("n"))
        .localCheckpoint(true) // label sums feed both the global sums and the dots
      val al = g.groupBy(col("dim")).agg(sum(col("s")).cast("long").as("sa"))
      val dots = g.join(broadcast(al), "dim")
        .groupBy(col("label"))
        .agg(max(col("n")).as("n_vecs"),
          sum(col("s").cast(dec) * col("sa")).as("dot"),
          sum(col("s").cast(dec) * col("s")).as("na"),
          sum(col("sa").cast(dec) * col("sa")).as("nb"))
      dots.select(col("label").cast("int").as("label"),
          col("n_vecs").cast("long").as("n_vecs"),
          when(col("na") > 0 && col("nb") > 0,
            when(col("dot") >= 0, 1).otherwise(-1)
              * expr("(dot * dot * 1000000) div (na * nb)"))
            .cast("long").as("cos2_signed_micro"))
        .orderBy(col("label"))
    },

    // ---- EV75: click-burst detection ----------------------------------------
    // The engagement-anomaly signal: ≥3 clicks by one user inside a
    // 6-hour window (this corpus's click density makes 6 h the "burst"
    // scale; a web UI would use 5 s — only the constant changes). The
    // trailing count is a RANGE-frame window over integer microseconds
    // (event-time range frames at µs grain — w4's frame spec covered
    // only ms); overlapping flagged rows collapse into EPISODES with
    // the gap rule (> window since the previous flagged click opens a
    // new episode — the u11/ev12 session discipline). One user window.
    QueryDef.sql(
      "ev75_click_bursts",
      """WITH c AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t
        |  FROM events WHERE event_type = 'click'),
        |f AS (
        |  SELECT user_id, event_id, t,
        |    CAST(count(*) OVER (PARTITION BY user_id ORDER BY t
        |      RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n5s
        |  FROM c),
        |flagged AS (
        |  SELECT user_id, event_id, t,
        |    CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
        |        > 21600000000 OR lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
        |        IS NULL THEN 1 ELSE 0 END AS new_ep
        |  FROM f WHERE n5s >= 3),
        |ep AS (
        |  SELECT user_id, t, event_id,
        |    CAST(sum(new_ep) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ep_id
        |  FROM flagged)
        |SELECT user_id, ep_id,
        |  CAST(count(*) AS BIGINT) AS n_burst_clicks,
        |  CAST(min(t) AS BIGINT) AS first_us, CAST(max(t) AS BIGINT) AS last_us
        |FROM ep GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d).filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
      val wr = Window.partitionBy(col("user_id")).orderBy(col("t"))
        .rangeBetween(-21600000000L, 0L)
      val wo = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      val f = c.withColumn("n5s", count(lit(1)).over(wr)).filter(col("n5s") >= 3)
      val flagged = f.withColumn("new_ep",
        when(col("t") - lag(col("t"), 1).over(wo) > 21600000000L ||
          lag(col("t"), 1).over(wo).isNull, 1).otherwise(0))
      val ep = flagged.withColumn("ep_id", sum(col("new_ep"))
        .over(wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"))
      ep.groupBy(col("user_id"), col("ep_id"))
        .agg(count(lit(1)).as("n_burst_clicks"),
          min(col("t")).cast("long").as("first_us"),
          max(col("t")).cast("long").as("last_us"))
        .orderBy(col("user_id"), col("ep_id"))
    }
  )
}
