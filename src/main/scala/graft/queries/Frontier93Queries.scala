package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Ninety-third frontier batch: Markov absorption probabilities, sketch
  * mergeability certification, exact NPV discounting.
  */
object Frontier93Queries {

  /** Four unrolled value-iteration rounds over the transition counts. */
  private val absorbOracle: String = {
    def round(prev: String, out: String): String =
      s"""$out AS (
        |  SELECT t.f AS state,
        |    CAST((coalesce(pw.c, 0) * 1000000 + coalesce(agg.acc, 0)) // t.tot
        |      AS BIGINT) AS h
        |  FROM tot t
        |  LEFT JOIN (SELECT f, c FROM tr WHERE tt = 'purchase') pw ON pw.f = t.f
        |  LEFT JOIN (
        |    SELECT tr.f, CAST(sum(tr.c * p.h) AS BIGINT) AS acc
        |    FROM tr JOIN $prev p ON p.state = tr.tt
        |    GROUP BY 1) agg ON agg.f = t.f)""".stripMargin
    s"""WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |      OR lag(epoch_us(ts)) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |se AS (
      |  SELECT user_id, t, event_id, event_type,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e),
      |steps AS (
      |  SELECT event_type AS f,
      |    coalesce(lead(event_type) OVER (PARTITION BY user_id, sid
      |      ORDER BY t, event_id), 'END') AS tt
      |  FROM se),
      |tr AS (
      |  SELECT f, tt, CAST(count(*) AS BIGINT) AS c
      |  FROM steps WHERE f <> 'purchase' GROUP BY 1, 2),
      |tot AS (SELECT f, CAST(sum(c) AS BIGINT) AS tot FROM tr GROUP BY 1),
      |h0 AS (SELECT f AS state, CAST(0 AS BIGINT) AS h FROM tot),
      |${round("h0", "h1")},
      |${round("h1", "h2")},
      |${round("h2", "h3")},
      |${round("h3", "h4")}
      |SELECT h4.state, h4.h AS conv4_micro, t.tot AS out_transitions
      |FROM h4 JOIN tot t ON t.f = h4.state
      |ORDER BY h4.state""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- EV97: Markov absorption probability (bounded horizon) ----------------
    // "From this state, what's the chance the session converts within
    // 4 more steps?" — the absorbing-chain value iteration h ←
    // (c(s→purchase)·10⁶ + Σ c(s→s')·h(s')) div out(s), run 4 rounds
    // in integer micro-probabilities. Transition counts come from one
    // sessionized lag pass over the events (session end is an explicit
    // END absorber); the iteration itself runs on the tiny state
    // table. The per-state conversion horizon is the number product
    // and lifecycle teams route interventions on.
    QueryDef.sql("ev97_absorption_prob", absorbOracle) { (s, d) =>
      val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          expr("unix_micros(ts)").as("t"), col("ts"))
        .withColumn("new_s",
          when(col("t") - lag(col("t"), 1).over(wUser) > 1800000000L, 1)
            .when(lag(col("t"), 1).over(wUser).isNull, 1).otherwise(0))
      val se = e
        .withColumn("sid", sum(col("new_s")).over(Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val steps = se
        .withColumn("tt", coalesce(lead(col("event_type"), 1)
          .over(Window.partitionBy(col("user_id"), col("sid"))
            .orderBy(col("t"), col("event_id"))), lit("END")))
        .select(col("event_type").as("f"), col("tt"))
      val tr = steps.filter(col("f") =!= "purchase")
        .groupBy(col("f"), col("tt")).agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // the 4-round iteration re-reads the counts
      val tot = tr.groupBy(col("f")).agg(sum(col("c")).cast("long").as("tot"))
        .localCheckpoint(true)
      val pw = tr.filter(col("tt") === "purchase")
        .select(col("f"), col("c").as("cw"))
      var h = tot.select(col("f").as("state"), lit(0L).as("h"))
      for (_ <- 1 to 4) {
        val acc = tr.join(broadcast(h), col("state") === col("tt"))
          .groupBy(col("f")).agg(sum(col("c") * col("h")).cast("long").as("acc"))
        h = tot
          .join(broadcast(pw), Seq("f"), "left")
          .join(broadcast(acc), Seq("f"), "left")
          .select(col("f").as("state"),
            expr("cast((coalesce(cw, 0) * 1000000 + coalesce(acc, 0)) div tot as bigint)")
              .as("h"))
          .localCheckpoint(true)
      }
      h.join(broadcast(tot), col("state") === col("f"))
        .select(col("state"), col("h").as("conv4_micro"),
          col("tot").as("out_transitions"))
        .orderBy(col("state"))
    },

    // ---- U72: sketch mergeability certification -------------------------------
    // The property that makes sketches distributed-aggregation-safe:
    // merging per-partition KMV sketches must equal sketching the
    // whole dataset. Build a 256-value KMV per ORDER MONTH (per-group
    // window top-k — parallel across partitions), merge by keeping the
    // 256 smallest of the union, and set it beside the monolithic
    // sketch: identical θ, identical estimate — certified by the hash
    // gate, not by trust.
    QueryDef.sql(
      "u72_sketch_merge",
      """WITH h AS (
        |  SELECT DISTINCT
        |    CAST(year(CAST(o_orderdate AS DATE)) AS INT) * 100 +
        |      CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS ym,
        |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT AS hv
        |  FROM orders),
        |per AS (
        |  SELECT ym, hv FROM (
        |    SELECT ym, hv, row_number() OVER (PARTITION BY ym ORDER BY hv) AS rn
        |    FROM h) WHERE rn <= 256),
        |nm AS (SELECT CAST(count(DISTINCT ym) AS BIGINT) AS n_months FROM per),
        |merged AS (
        |  SELECT hv FROM (SELECT DISTINCT hv FROM per) ORDER BY hv LIMIT 256),
        |mono AS (
        |  SELECT hv FROM (SELECT DISTINCT hv FROM h) ORDER BY hv LIMIT 256),
        |cm AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(max(hv) AS BIGINT) AS th
        |  FROM merged),
        |co AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(max(hv) AS BIGINT) AS th
        |  FROM mono),
        |diff AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_diff FROM (
        |    SELECT hv FROM merged EXCEPT SELECT hv FROM mono))
        |SELECT nm.n_months, cm.th AS theta_merged, co.th AS theta_mono,
        |  CAST(CASE WHEN cm.n < 256 THEN cm.n
        |    ELSE (cm.n - 1) * 281474976710656 // cm.th END AS BIGINT) AS est_merged,
        |  CAST(CASE WHEN co.n < 256 THEN co.n
        |    ELSE (co.n - 1) * 281474976710656 // co.th END AS BIGINT) AS est_mono,
        |  CAST(CASE WHEN diff.n_diff = 0 AND cm.n = co.n THEN 1 ELSE 0 END
        |    AS BIGINT) AS sketches_identical
        |FROM nm CROSS JOIN cm CROSS JOIN co CROSS JOIN diff""".stripMargin) { (s, d) =>
      val h = Tables.orders(s, d)
        .select((year(col("o_orderdate").cast("date")).cast("int") * 100 +
          month(col("o_orderdate").cast("date")).cast("int")).as("ym"),
          conv(substring(md5(col("o_custkey").cast("string")), 1, 12), 16, 10)
            .cast("long").as("hv"))
        .distinct()
        .localCheckpoint(true) // per-month sketches and the monolith read it
      val per = h
        .withColumn("rn", row_number().over(Window.partitionBy(col("ym"))
          .orderBy(col("hv"))))
        .filter(col("rn") <= 256)
        .select(col("ym"), col("hv"))
        .localCheckpoint(true)
      val nm = per.agg(count_distinct(col("ym")).as("n_months"))
      val merged = per.select(col("hv")).distinct().orderBy(col("hv")).limit(256)
        .localCheckpoint(true)
      val mono = h.select(col("hv")).distinct().orderBy(col("hv")).limit(256)
        .localCheckpoint(true)
      val cm = merged.agg(count(lit(1)).as("nmg"), max(col("hv")).as("thm"))
      val co = mono.agg(count(lit(1)).as("nmo"), max(col("hv")).as("tho"))
      val diff = merged.exceptAll(mono).agg(count(lit(1)).as("n_diff"))
      nm.crossJoin(broadcast(cm)).crossJoin(broadcast(co)).crossJoin(broadcast(diff))
        .select(col("n_months"),
          col("thm").as("theta_merged"), col("tho").as("theta_mono"),
          expr("CASE WHEN nmg < 256 THEN nmg ELSE (nmg - 1) * 281474976710656 div thm END")
            .cast("long").as("est_merged"),
          expr("CASE WHEN nmo < 256 THEN nmo ELSE (nmo - 1) * 281474976710656 div tho END")
            .cast("long").as("est_mono"),
          when(col("n_diff") === 0 && col("nmg") === col("nmo"), 1L).otherwise(0L)
            .as("sketches_identical"))
    },

    // ---- W25: exact NPV customer valuation ------------------------------------
    // Discounted cash flow without floating point: at a 10% annual
    // rate, an order y years after the base year is worth
    // cents·10ʸ div 11ʸ — exact integer powers (y ≤ 6, so both
    // engines' power() doubles are exact integers below 2⁵³ before the
    // cast). Nominal and NPV revenue per nation land side by side:
    // the finance view of the customer base, bit-reproducible.
    QueryDef.sql(
      "w25_customer_npv",
      """WITH base AS (
        |  SELECT min(CAST(year(CAST(o_orderdate AS DATE)) AS INT)) AS y0
        |  FROM orders),
        |o AS (
        |  SELECT o_custkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(year(CAST(o_orderdate AS DATE)) AS INT) - base.y0 AS y
        |  FROM orders CROSS JOIN base),
        |npv AS (
        |  SELECT o_custkey, cents,
        |    cents * CAST(power(10, y) AS BIGINT) // CAST(power(11, y) AS BIGINT)
        |      AS npv_cents
        |  FROM o)
        |SELECT c.c_nationkey AS nation,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(n.cents) AS BIGINT) AS nominal_cents,
        |  CAST(sum(n.npv_cents) AS BIGINT) AS npv_cents
        |FROM npv n JOIN customer c ON n.o_custkey = c.c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d)
        .agg(min(year(col("o_orderdate").cast("date")).cast("int")).as("y0"))
      val o = Tables.orders(s, d)
        .select(col("o_custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          year(col("o_orderdate").cast("date")).cast("int").as("yy"))
        .crossJoin(broadcast(base))
        .select(col("o_custkey"), col("cents"), (col("yy") - col("y0")).as("y"))
        .select(col("o_custkey"), col("cents"),
          expr("cents * cast(power(10, y) as bigint) div cast(power(11, y) as bigint)")
            .as("npv_cents"))
      o.join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("cents")).cast("long").as("nominal_cents"),
          sum(col("npv_cents")).cast("long").as("npv_cents"))
        .select(col("nation").cast("int").as("nation"), col("n_orders"),
          col("nominal_cents"), col("npv_cents"))
        .orderBy(col("nation"))
    }
  )
}
