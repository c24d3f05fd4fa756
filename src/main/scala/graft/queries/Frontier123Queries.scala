package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Hundred-twenty-third frontier batch: business-hour SLA clocks in
  * closed form (no calendar grid join — the cumulative-business-hours
  * function makes elapsed time a subtraction, the shape that survives
  * 100 TB), a reactive autoscaler replayed as an integer fold against
  * real hourly load, and exact arc price-elasticity per brand with the
  * ratio-of-rationals cleared to one integer division.
  */
object Frontier123Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- EV108: business-hours SLA clock ----------------------------------------
    // Hours-to-convert (signup → first purchase) measured on the 9–17
    // Mon–Fri business clock. The trick is the prefix function
    // F(t) = weeks·40 + weekday_part + clamp(hour−9, 0, 8): elapsed
    // business hours = F(b) − F(a), pure per-row arithmetic — versus
    // the naive hour-grid range join that explodes at scale. Output:
    // conversion histograms on both clocks, exposing how much of the
    // "latency" is nights and weekends.
    QueryDef.sql(
      "ev108_sla_business_hours",
      """WITH su AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (
        |  SELECT e.user_id, min(e.ts) AS t1
        |  FROM events e JOIN su ON su.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > su.t0
        |  GROUP BY 1),
        |pairs AS (
        |  SELECT su.user_id, su.t0, pu.t1,
        |    (epoch_us(pu.t1) - epoch_us(su.t0)) // 3600000000 AS raw_hours
        |  FROM su JOIN pu ON pu.user_id = su.user_id),
        |f AS (
        |  SELECT user_id, raw_hours,
        |    (date_diff('day', DATE '1970-01-05', CAST(t1 AS DATE)) // 7) * 40
        |      + least(date_diff('day', DATE '1970-01-05', CAST(t1 AS DATE)) % 7,
        |          5) * 8
        |      + CASE WHEN date_diff('day', DATE '1970-01-05', CAST(t1 AS DATE))
        |          % 7 < 5
        |        THEN least(greatest(hour(t1) - 9, 0), 8) ELSE 0 END
        |    - ((date_diff('day', DATE '1970-01-05', CAST(t0 AS DATE)) // 7) * 40
        |      + least(date_diff('day', DATE '1970-01-05', CAST(t0 AS DATE)) % 7,
        |          5) * 8
        |      + CASE WHEN date_diff('day', DATE '1970-01-05', CAST(t0 AS DATE))
        |          % 7 < 5
        |        THEN least(greatest(hour(t0) - 9, 0), 8) ELSE 0 END)
        |      AS biz_hours
        |  FROM pairs)
        |SELECT least(biz_hours // 8, 9) AS biz_day_bucket,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(raw_hours) AS BIGINT) AS raw_hours_total,
        |  CAST(sum(biz_hours) AS BIGINT) AS biz_hours_total,
        |  CAST(sum(biz_hours) * 1000 // greatest(sum(raw_hours), 1) AS BIGINT)
        |    AS biz_share_permille
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(su, Seq("user_id"))
        .filter(col("ts") > col("t0"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      def bizF(t: String): String =
        s"""(datediff(cast($t as date), date'1970-01-05') div 7) * 40
           | + least(datediff(cast($t as date), date'1970-01-05') % 7, 5) * 8
           | + (case when datediff(cast($t as date), date'1970-01-05') % 7 < 5
           |    then least(greatest(hour($t) - 9, 0), 8) else 0 end)""".stripMargin
      val pairs = su.join(pu, Seq("user_id"))
        .withColumn("raw_hours",
          expr("(unix_micros(t1) - unix_micros(t0)) div 3600000000"))
        .withColumn("biz_hours", expr(s"(${bizF("t1")}) - (${bizF("t0")})"))
      pairs.groupBy(expr("least(biz_hours div 8, 9)").as("biz_day_bucket"))
        .agg(count(lit(1)).cast("long").as("n_users"),
          sum(col("raw_hours")).cast("long").as("raw_hours_total"),
          sum(col("biz_hours")).cast("long").as("biz_hours_total"))
        .withColumn("biz_share_permille",
          expr("biz_hours_total * 1000 div greatest(raw_hours_total, 1)")
            .cast("long"))
        .orderBy(col("biz_day_bucket"))
    },

    // ---- U94: reactive autoscaler replay -----------------------------------------
    // An 80/30-threshold autoscaler with a 2-tick cooldown replayed
    // against real hourly event load: node capacity derives from the
    // measured mean (so the replay is meaningful at every sf), and the
    // state [nodes, cooldown, violations, node_hours] folds hour by
    // hour. Day-end checkpoints are prefix folds; the ideal column
    // (ceil(load/C) summed) prices the autoscaler's lag against a
    // clairvoyant scaler.
    QueryDef.sql(
      "u94_autoscaler_replay",
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hr, CAST(count(*) AS BIGINT) AS load
        |  FROM events GROUP BY 1),
        |cap AS (
        |  SELECT greatest(CAST(sum(load) // count(*) // 4 AS BIGINT), 1) AS c
        |  FROM hourly),
        |arr AS (
        |  SELECT list(load ORDER BY hr) AS ls, list(hr ORDER BY hr) AS hrs,
        |    CAST(count(*) AS INT) AS t, max(c.c) AS c
        |  FROM hourly CROSS JOIN cap c),
        |marks AS (
        |  SELECT c, unnest(list_transform(
        |    list_filter(range(1, t + 1), i -> i = t
        |      OR CAST(hrs[i + 1] AS DATE) <> CAST(hrs[i] AS DATE)), i -> {
        |      'day': CAST(hrs[i] AS DATE),
        |      'st': list_reduce(list_prepend([CAST(1 AS BIGINT), 0, 0, 0],
        |          list_transform(ls[1:i], v -> [v, v, v, v])),
        |        (acc, e) -> [
        |          greatest(least(acc[1]
        |            + CASE WHEN acc[2] = 0 AND e[1] * 1000 > acc[1] * c * 800
        |              THEN 1
        |              WHEN acc[2] = 0 AND e[1] * 1000 < acc[1] * c * 300
        |                AND acc[1] > 1 THEN -1 ELSE 0 END, 64), 1),
        |          CASE WHEN acc[2] = 0 AND (e[1] * 1000 > acc[1] * c * 800
        |              OR (e[1] * 1000 < acc[1] * c * 300 AND acc[1] > 1))
        |            THEN 2 ELSE greatest(acc[2] - 1, 0) END,
        |          acc[3] + CASE WHEN e[1] > acc[1] * c THEN 1 ELSE 0 END,
        |          acc[4] + acc[1]]),
        |      'ideal': list_reduce(list_prepend(CAST(0 AS BIGINT),
        |          list_transform(ls[1:i], v -> (v + c - 1) // c)),
        |        (a, b) -> a + b)
        |    })) AS u
        |  FROM arr)
        |SELECT u.day AS day, CAST(c AS BIGINT) AS node_capacity,
        |  CAST(u.st[1] AS BIGINT) AS nodes_end,
        |  CAST(u.st[3] AS BIGINT) AS violations_cum,
        |  CAST(u.st[4] AS BIGINT) AS node_hours_cum,
        |  CAST(u.ideal AS BIGINT) AS ideal_node_hours_cum,
        |  CAST(u.st[4] * 1000 // greatest(u.ideal, 1) AS BIGINT)
        |    AS overprovision_permille
        |FROM marks ORDER BY day""".stripMargin) { (s, d) =>
      val hourly = Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).cast("long").as("load"))
      val cap = hourly.agg(
        greatest(expr("sum(load) div count(*) div 4").cast("long"), lit(1L))
          .as("c"))
      val arr = hourly.crossJoin(broadcast(cap)).groupBy(col("c"))
        .agg(
          transform(array_sort(collect_list(struct(col("hr"), col("load")))),
            e => e.getField("load")).as("ls"),
          sort_array(collect_list(col("hr"))).as("hrs"),
          count(lit(1)).cast("int").as("t"))
      val marks = arr.select(col("c"), explode(expr(
        """transform(
          |  filter(sequence(1, t), i -> i = t
          |    OR cast(element_at(hrs, i + 1) as date)
          |      <> cast(element_at(hrs, i) as date)),
          |  i -> struct(
          |    cast(element_at(hrs, i) as date) as day,
          |    aggregate(slice(ls, 1, i), array(1L, 0L, 0L, 0L),
          |      (acc, v) -> array(
          |        greatest(least(acc[0]
          |          + CASE WHEN acc[1] = 0 AND v * 1000 > acc[0] * c * 800
          |            THEN 1L
          |            WHEN acc[1] = 0 AND v * 1000 < acc[0] * c * 300
          |              AND acc[0] > 1 THEN -1L ELSE 0L END, 64L), 1L),
          |        CASE WHEN acc[1] = 0 AND (v * 1000 > acc[0] * c * 800
          |            OR (v * 1000 < acc[0] * c * 300 AND acc[0] > 1))
          |          THEN 2L ELSE greatest(acc[1] - 1, 0L) END,
          |        acc[2] + CASE WHEN v > acc[0] * c THEN 1L ELSE 0L END,
          |        acc[3] + acc[0])) as st,
          |    aggregate(slice(ls, 1, i), 0L,
          |      (a, v) -> a + (v + c - 1) div c) as ideal))""".stripMargin))
        .as("u"))
      marks.select(col("u.day").as("day"),
        col("c").cast("long").as("node_capacity"),
        expr("u.st[0]").cast("long").as("nodes_end"),
        expr("u.st[2]").cast("long").as("violations_cum"),
        expr("u.st[3]").cast("long").as("node_hours_cum"),
        col("u.ideal").cast("long").as("ideal_node_hours_cum"),
        expr("u.st[3] * 1000 div greatest(u.ideal, 1)").cast("long")
          .as("overprovision_permille"))
        .orderBy(col("day"))
    },

    // ---- A197: exact arc price-elasticity per brand -------------------------------
    // Arc elasticity ((Q2−Q1)/(Q̄))/((P2−P1)/(P̄)) between the two
    // halves of the timeline, with P = revenue/quantity kept as a
    // rational so the whole ratio clears to
    // (Q2−Q1)(E1Q2 + E2Q1) / ((Q1+Q2)(E2Q1 − E1Q2)) — one integer
    // division, exact. One scan, one grouped aggregate; the two-period
    // split is a conditional sum, not two scans.
    QueryDef.sql(
      "a197_arc_elasticity",
      """WITH b AS (
        |  SELECT p.p_brand AS brand,
        |    CAST(sum(CASE WHEN l.l_shipdate < TIMESTAMP '1995-06-01'
        |      THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q1,
        |    CAST(sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1995-06-01'
        |      THEN CAST(l.l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q2,
        |    CAST(sum(CASE WHEN l.l_shipdate < TIMESTAMP '1995-06-01'
        |      THEN CAST(floor(l.l_extendedprice * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS e1,
        |    CAST(sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1995-06-01'
        |      THEN CAST(floor(l.l_extendedprice * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS e2
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  GROUP BY 1)
        |SELECT brand, q1, q2,
        |  CAST(e1 * 100 // greatest(q1, 1) AS BIGINT) AS p1_cents,
        |  CAST(e2 * 100 // greatest(q2, 1) AS BIGINT) AS p2_cents,
        |  CAST(CASE WHEN q1 = 0 OR q2 = 0
        |      OR CAST(e2 AS HUGEINT) * q1 - CAST(e1 AS HUGEINT) * q2 = 0 THEN 0
        |    ELSE (CAST(q2 - q1 AS HUGEINT)
        |        * (CAST(e1 AS HUGEINT) * q2 + CAST(e2 AS HUGEINT) * q1) * 1000)
        |      // ((q1 + q2)
        |        * (CAST(e2 AS HUGEINT) * q1 - CAST(e1 AS HUGEINT) * q2)) END
        |    AS BIGINT) AS elasticity_milli
        |FROM b ORDER BY brand""".stripMargin) { (s, d) =>
      val b = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(
          sum(when(col("l_shipdate") < lit("1995-06-01").cast("timestamp"),
            col("l_quantity").cast("long")).otherwise(0L)).cast("long").as("q1"),
          sum(when(col("l_shipdate") >= lit("1995-06-01").cast("timestamp"),
            col("l_quantity").cast("long")).otherwise(0L)).cast("long").as("q2"),
          sum(when(col("l_shipdate") < lit("1995-06-01").cast("timestamp"),
            floor(col("l_extendedprice") * 100).cast("long")).otherwise(0L))
            .cast("long").as("e1"),
          sum(when(col("l_shipdate") >= lit("1995-06-01").cast("timestamp"),
            floor(col("l_extendedprice") * 100).cast("long")).otherwise(0L))
            .cast("long").as("e2"))
      b.select(col("brand"), col("q1"), col("q2"),
        expr("e1 * 100 div greatest(q1, 1)").cast("long").as("p1_cents"),
        expr("e2 * 100 div greatest(q2, 1)").cast("long").as("p2_cents"),
        expr("""cast(case when q1 = 0 or q2 = 0
          |    or cast(e2 as decimal(38,0)) * q1 - cast(e1 as decimal(38,0)) * q2
          |      = 0 then 0
          |  else (cast(q2 - q1 as decimal(38,0))
          |      * (cast(e1 as decimal(38,0)) * q2
          |         + cast(e2 as decimal(38,0)) * q1) * 1000)
          |    div ((q1 + q2)
          |      * (cast(e2 as decimal(38,0)) * q1
          |         - cast(e1 as decimal(38,0)) * q2)) end
          |  as bigint)""".stripMargin).as("elasticity_milli"))
        .orderBy(col("brand"))
    }
  )
}
