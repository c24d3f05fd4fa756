package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Fifty-third frontier batch: weighted blocklist safety scan, exact
  * tie-corrected Mann–Whitney U drift test. (The batch's third member,
  * ev71s streaming quota on MapState, registers in StreamingQueries.)
  */
object Frontier53Queries {

  // severity-weighted content blocklist: (pattern, severity)
  private val Blocklist = Seq(("slow", 3), ("error", 3), ("skew", 2),
    ("spill", 2), ("shuffle", 1), ("broadcast", 1))

  val defs: Seq[QueryDef] = Seq(

    // ---- T54: severity-weighted blocklist scan ------------------------------
    // The brand-safety / policy gate every curation pipeline runs: N
    // weighted substring patterns, per-document hit counts, a severity
    // score, and a block/flag/pass verdict. The dictionary is a literal
    // fan-out (explode over a 6-row array — the broadcast-dictionary
    // shape; a 10⁵-entry production list would ship the same way), the
    // match is one codegen'd regexp_count per (doc, pattern), and the
    // verdict is a crumb aggregate back to doc grain. One shuffle.
    QueryDef.sql(
      "t54_blocklist_scan", {
        val cases = Blocklist.map { case (p, sev) =>
          s"SELECT '$p' AS pat, $sev AS sev"
        }.mkString(" UNION ALL ")
        s"""WITH pats AS ($cases),
           |hits AS (
           |  SELECT d.doc_id, p.pat, p.sev,
           |    CAST(len(regexp_extract_all(lower(d.text), p.pat)) AS BIGINT) AS n
           |  FROM documents d CROSS JOIN pats p),
           |sc AS (
           |  SELECT doc_id,
           |    CAST(sum(n) AS BIGINT) AS n_hits,
           |    CAST(sum(n * sev) AS BIGINT) AS severity,
           |    CAST(count(*) FILTER (WHERE n > 0) AS BIGINT) AS n_patterns
           |  FROM hits GROUP BY 1)
           |SELECT doc_id, n_hits, severity, n_patterns,
           |  CASE WHEN severity >= 40 THEN 'block'
           |       WHEN severity >= 15 THEN 'flag' ELSE 'pass' END AS verdict
           |FROM sc""".stripMargin
      }) { (s, d) =>
      val pats = Blocklist.map { case (p, sev) => struct(lit(p).as("pat"), lit(sev).as("sev")) }
      val hits = Tables.documents(s, d)
        .select(col("doc_id"), lower(col("text")).as("t"),
          explode(array(pats: _*)).as("p"))
        .select(col("doc_id"), col("p.sev").as("sev"),
          regexp_count(col("t"), col("p.pat")).cast("long").as("n"))
      hits.groupBy(col("doc_id"))
        .agg(sum(col("n")).cast("long").as("n_hits"),
          sum(col("n") * col("sev")).cast("long").as("severity"),
          count(when(col("n") > 0, 1)).as("n_patterns"))
        .select(col("doc_id"), col("n_hits"), col("severity"), col("n_patterns"),
          when(col("severity") >= 40, "block")
            .when(col("severity") >= 15, "flag").otherwise("pass").as("verdict"))
    },

    // ---- A112: daily Mann–Whitney U (exact, tie-corrected) ------------------
    // The nonparametric two-sample drift test, bit-exact: do purchase
    // and click values come from the same distribution each day? Ranks
    // are midranks kept integral by DOUBLING (2·midrank = 2·min_rank +
    // ties − 1), so U, its centering, and the tie-corrected variance
    // are exact integers; the z-statistic ships as the a104-style
    // signed z²·10⁶ with the square root eliminated by squaring —
    // DECIMAL(38,0) carries the n³-scale products. Day-partitioned
    // rank windows (bounded grain), crumb algebra after; significance
    // is the integer comparison z²·10⁶ > 1.96²·10⁶.
    QueryDef.sql(
      "a112_mann_whitney",
      """WITH v AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
        |    CAST(floor(value * 100) AS BIGINT) AS cents, event_id
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |r AS (
        |  SELECT day, grp, cents,
        |    CAST(rank() OVER (PARTITION BY day ORDER BY cents) AS BIGINT) AS mn,
        |    CAST(count(*) OVER (PARTITION BY day, cents) AS BIGINT) AS t
        |  FROM v),
        |agg AS (
        |  SELECT day,
        |    CAST(count(*) FILTER (WHERE grp = 1) AS BIGINT) AS n1,
        |    CAST(count(*) FILTER (WHERE grp = 0) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN grp = 1 THEN 2 * mn + t - 1 ELSE 0 END) AS BIGINT)
        |      AS r1_2
        |  FROM r GROUP BY 1),
        |ties AS (
        |  SELECT day, CAST(sum(t * t * t - t) AS BIGINT) AS tsum
        |  FROM (SELECT DISTINCT day, cents, t FROM r) GROUP BY 1),
        |sc AS (
        |  SELECT a.day, a.n1, a.n2,
        |    a.r1_2 - a.n1 * (a.n1 + 1) AS u2,
        |    a.r1_2 - a.n1 * (a.n1 + 1) - a.n1 * a.n2 AS d2,
        |    a.n1 + a.n2 AS n, t.tsum
        |  FROM agg a JOIN ties t USING (day)),
        |z AS (
        |  SELECT day, n1, n2, CAST(u2 AS BIGINT) AS u2,
        |    CAST(CASE WHEN n1 > 0 AND n2 > 0
        |        AND (n * n * n - n) - tsum > 0 THEN
        |      (CASE WHEN d2 >= 0 THEN 1 ELSE -1 END)
        |      * ((CAST(d2 AS HUGEINT) * d2 * 3 * n * (n - 1) * 1000000)
        |         // (CAST(n1 AS HUGEINT) * n2
        |            * ((CAST(n AS HUGEINT) * n * n - n) - tsum)))
        |      ELSE NULL END AS BIGINT) AS z2_signed_micro
        |  FROM sc)
        |SELECT day, n1, n2, u2, z2_signed_micro,
        |  CAST(coalesce(abs(z2_signed_micro) > 3841600, FALSE) AS INT)
        |    AS significant
        |FROM z ORDER BY day""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val v = Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("ts").cast("date").as("day"),
          when(col("event_type") === "purchase", 1).otherwise(0).as("grp"),
          floor(col("value") * 100).cast("long").as("cents"), col("event_id"))
      val r = v
        .withColumn("mn", rank().over(Window.partitionBy(col("day"))
          .orderBy(col("cents"))).cast("long"))
        .withColumn("t", count(lit(1)).over(Window.partitionBy(col("day"), col("cents")))
          .cast("long"))
        .localCheckpoint(true) // feeds both the rank sums and the tie terms
      val agg = r.groupBy(col("day"))
        .agg(count(when(col("grp") === 1, 1)).as("n1"),
          count(when(col("grp") === 0, 1)).as("n2"),
          sum(when(col("grp") === 1, lit(2) * col("mn") + col("t") - 1).otherwise(0L))
            .cast("long").as("r1_2"))
      val ties = r.select(col("day"), col("cents"), col("t")).distinct()
        .groupBy(col("day"))
        .agg(sum(col("t") * col("t") * col("t") - col("t")).cast("long").as("tsum"))
      val sc = agg.join(ties, "day")
        .select(col("day"), col("n1"), col("n2"),
          (col("r1_2") - col("n1") * (col("n1") + 1)).as("u2"),
          (col("r1_2") - col("n1") * (col("n1") + 1) - col("n1") * col("n2")).as("d2"),
          (col("n1") + col("n2")).as("n"), col("tsum"))
      sc.select(col("day"), col("n1"), col("n2"), col("u2").cast("long").as("u2"),
          when(col("n1") > 0 && col("n2") > 0 &&
              (col("n") * col("n") * col("n") - col("n")) - col("tsum") > 0,
            when(col("d2") >= 0, 1).otherwise(-1).cast("long") *
              expr(s"""(cast(d2 as decimal(38,0)) * d2 * 3 * n * (n - 1) * 1000000)
                       div (cast(n1 as decimal(38,0)) * n2
                            * ((cast(n as decimal(38,0)) * n * n - n) - tsum))"""))
            .otherwise(lit(null)).cast("long").as("z2_signed_micro"))
        .withColumn("significant",
          coalesce(abs(col("z2_signed_micro")) > 3841600L, lit(false)).cast("int"))
        .orderBy(col("day"))
    }
  )
}
