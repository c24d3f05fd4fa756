package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Ninety-fourth frontier batch: chain-ladder development projection,
  * SCD2 interval integrity audit, peak prominence detection.
  */
object Frontier94Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A148: chain-ladder development projection ----------------------------
    // The actuarial loss-triangle method, on the order→ship lag: each
    // order-month cohort's shipped value develops over month ages into
    // a run-off triangle; volume-weighted development factors
    // f_a = ΣC(·,a+1)/ΣC(·,a) come from the complete part of the
    // triangle, and each open cohort's ULTIMATE is its latest
    // diagonal pushed through the remaining factors — a sequential
    // rational fold kept exact with a DECIMAL accumulator (acc·num
    // div den per step, factors applied in age order). IBNR = ultimate
    // − observed: the reserve the triangle implies.
    QueryDef.sql(
      "a148_chain_ladder",
      """WITH li AS (
        |  SELECT o.o_orderkey,
        |    CAST(year(CAST(o.o_orderdate AS DATE)) AS INT) * 12 +
        |      CAST(month(CAST(o.o_orderdate AS DATE)) AS INT) AS cm,
        |    CAST(year(CAST(l.l_shipdate AS DATE)) AS INT) * 12 +
        |      CAST(month(CAST(l.l_shipdate AS DATE)) AS INT) AS sm,
        |    CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |inc AS (
        |  SELECT cm AS cohort, sm - cm AS age, CAST(sum(cents) AS BIGINT) AS v
        |  FROM li WHERE sm >= cm GROUP BY 1, 2),
        |mx AS (SELECT max(cohort + age) AS maxym, max(age) AS maxage FROM inc),
        |cum AS (
        |  SELECT cohort, age,
        |    CAST(sum(v) OVER (PARTITION BY cohort ORDER BY age
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
        |  FROM inc),
        |fac AS (
        |  SELECT a.age AS fage,
        |    CAST(sum(b.c) AS BIGINT) AS num, CAST(sum(a.c) AS BIGINT) AS den
        |  FROM cum a JOIN cum b ON b.cohort = a.cohort AND b.age = a.age + 1
        |  CROSS JOIN mx
        |  WHERE a.cohort + a.age + 1 <= mx.maxym
        |  GROUP BY 1),
        |latest AS (
        |  SELECT cohort, max(age) AS obs_age FROM cum GROUP BY 1),
        |lv AS (
        |  SELECT l.cohort, l.obs_age, c.c AS latest_c
        |  FROM latest l JOIN cum c ON c.cohort = l.cohort AND c.age = l.obs_age),
        |ult AS (
        |  SELECT lv.cohort, lv.obs_age, lv.latest_c,
        |    CAST(list_reduce(list_prepend(
        |      {'n': CAST(lv.latest_c AS HUGEINT), 'd': CAST(1 AS HUGEINT)},
        |      list({'n': CAST(f.num AS HUGEINT), 'd': CAST(f.den AS HUGEINT)}
        |        ORDER BY f.fage)),
        |      (acc, x) -> {'n': acc.n * x.n // x.d, 'd': CAST(1 AS HUGEINT)}).n
        |      AS BIGINT) AS ultimate
        |  FROM lv LEFT JOIN fac f ON f.fage >= lv.obs_age
        |  GROUP BY lv.cohort, lv.obs_age, lv.latest_c)
        |SELECT CAST(cohort AS INT) AS cohort, CAST(obs_age AS INT) AS obs_age,
        |  latest_c AS latest_cents,
        |  CAST(coalesce(ultimate, latest_c) AS BIGINT) AS ultimate_cents,
        |  CAST(coalesce(ultimate, latest_c) - latest_c AS BIGINT) AS ibnr_cents
        |FROM ult ORDER BY cohort""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"),
          (year(col("l_shipdate").cast("date")).cast("int") * 12 +
            month(col("l_shipdate").cast("date")).cast("int")).as("sm"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
        .join(Tables.orders(s, d)
          .select(col("o_orderkey"),
            (year(col("o_orderdate").cast("date")).cast("int") * 12 +
              month(col("o_orderdate").cast("date")).cast("int")).as("cm")),
          col("l_orderkey") === col("o_orderkey"))
      val inc = li.filter(col("sm") >= col("cm"))
        .groupBy(col("cm").as("cohort"), (col("sm") - col("cm")).as("age"))
        .agg(sum(col("cents")).cast("long").as("v"))
      val cum = inc
        .withColumn("c", sum(col("v")).over(Window.partitionBy(col("cohort"))
          .orderBy(col("age"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
        .localCheckpoint(true) // factors, diagonal, and fold read the triangle
      val mx = cum.agg(max(col("cohort") + col("age")).as("maxym"))
      val fac = cum.alias("a")
        .join(cum.select(col("cohort").as("bc"), col("age").as("ba"), col("c").as("bcv")),
          col("bc") === col("cohort") && col("ba") === col("age") + 1)
        .crossJoin(broadcast(mx))
        .filter(col("cohort") + col("age") + 1 <= col("maxym"))
        .groupBy(col("age").as("fage"))
        .agg(sum(col("bcv")).cast("long").as("num"), sum(col("c")).cast("long").as("den"))
      val latest = cum.groupBy(col("cohort")).agg(max(col("age")).as("obs_age"))
      val lv = latest
        .join(cum.select(col("cohort"), col("age"), col("c").as("latest_c")),
          Seq("cohort"))
        .filter(col("age") === col("obs_age"))
        .select(col("cohort"), col("obs_age"), col("latest_c"))
      val ult = lv
        .join(broadcast(fac), col("fage") >= col("obs_age"), "left")
        .groupBy(col("cohort"), col("obs_age"), col("latest_c"))
        .agg(expr("""cast(aggregate(
          transform(array_sort(collect_list(struct(fage, num, den))), x -> x),
          cast(latest_c as decimal(38,0)),
          (acc, x) -> cast((acc * x.num) div x.den as decimal(38,0))) as bigint)""")
          .as("ultimate"))
      ult.select(col("cohort").cast("int").as("cohort"),
          col("obs_age").cast("int").as("obs_age"),
          col("latest_c").as("latest_cents"),
          coalesce(col("ultimate"), col("latest_c")).cast("long").as("ultimate_cents"),
          (coalesce(col("ultimate"), col("latest_c")) - col("latest_c")).cast("long")
            .as("ibnr_cents"))
        .orderBy(col("cohort"))
    },

    // ---- U73: SCD2 interval integrity audit -----------------------------------
    // The audit that catches a broken dimension loader: session
    // intervals get deterministic PLANTED corruption (every 7th
    // version loses its end date — a missed close; every 11th gets its
    // end extended 40 minutes — an overlap), then the audit counts
    // what a correct SCD2 table must never contain: multiple open
    // versions per key, successor overlaps, and dangling opens — per
    // defect class, with the per-user lead window doing the adjacency
    // check.
    QueryDef.sql(
      "u73_scd2_integrity",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |      OR lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT user_id, sid, CAST(min(t) AS BIGINT) AS st, CAST(max(t) AS BIGINT) AS en
        |  FROM (SELECT user_id, t,
        |          sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
        |            ROWS UNBOUNDED PRECEDING) AS sid
        |        FROM e)
        |  GROUP BY user_id, sid),
        |corrupted AS (
        |  SELECT user_id, sid, st,
        |    CASE WHEN sid % 7 = 0 THEN NULL
        |         WHEN sid % 11 = 0 THEN en + 2400000000
        |         ELSE en END AS en
        |  FROM sess),
        |adj AS (
        |  SELECT user_id, sid, st, en,
        |    lead(st) OVER (PARTITION BY user_id ORDER BY st, sid) AS nxt_st
        |  FROM corrupted),
        |flags AS (
        |  SELECT user_id,
        |    CASE WHEN en IS NULL AND nxt_st IS NOT NULL THEN 1 ELSE 0 END
        |      AS open_mid,
        |    CASE WHEN en IS NOT NULL AND nxt_st IS NOT NULL AND en > nxt_st
        |      THEN 1 ELSE 0 END AS overlap,
        |    CASE WHEN en IS NULL THEN 1 ELSE 0 END AS open_any
        |  FROM adj)
        |SELECT CAST(count(*) AS BIGINT) AS n_intervals,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(open_mid) AS BIGINT) AS mid_stream_opens,
        |  CAST(sum(overlap) AS BIGINT) AS successor_overlaps,
        |  CAST(sum(open_any) AS BIGINT) AS open_versions
        |FROM flags""".stripMargin) { (s, d) =>
      val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val e = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("t"), col("ts"), col("event_id"))
        .withColumn("new_s",
          when(col("t") - lag(col("t"), 1).over(wUser) > 1800000000L, 1)
            .when(lag(col("t"), 1).over(wUser).isNull, 1).otherwise(0))
      val sess = e
        .withColumn("sid", sum(col("new_s")).over(Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("t")).as("st"), max(col("t")).as("en"))
      val corrupted = sess.select(col("user_id"), col("sid"), col("st"),
        when(col("sid") % 7 === 0, lit(null).cast("long"))
          .when(col("sid") % 11 === 0, col("en") + 2400000000L)
          .otherwise(col("en")).as("en"))
      val adj = corrupted
        .withColumn("nxt_st", lead(col("st"), 1).over(Window
          .partitionBy(col("user_id")).orderBy(col("st"), col("sid"))))
      adj.select(col("user_id"),
          when(col("en").isNull && col("nxt_st").isNotNull, 1).otherwise(0)
            .as("open_mid"),
          when(col("en").isNotNull && col("nxt_st").isNotNull &&
            col("en") > col("nxt_st"), 1).otherwise(0).as("overlap"),
          when(col("en").isNull, 1).otherwise(0).as("open_any"))
        .agg(count(lit(1)).as("n_intervals"),
          count_distinct(col("user_id")).as("n_users"),
          sum(col("open_mid")).cast("long").as("mid_stream_opens"),
          sum(col("overlap")).cast("long").as("successor_overlaps"),
          sum(col("open_any")).cast("long").as("open_versions"))
    },

    // ---- W26: peak detection with prominence ----------------------------------
    // Alerting-grade peak detection on the daily revenue series: a day
    // is a PEAK when it strictly exceeds its three neighbors on each
    // side (full neighborhood required), and its prominence is the
    // drop to the higher of the two flanking minima — computed with a
    // bounded ±3-day fan-out join on integer day ids, so there is no
    // unpartitioned window anywhere.
    QueryDef.sql(
      "w26_peak_prominence",
      """WITH daily AS (
        |  SELECT epoch_us(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP))
        |      // 86400000000 AS day_id,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev
        |  FROM orders GROUP BY 1),
        |nb AS (
        |  SELECT d.day_id, d.rev,
        |    CAST(count(*) AS BIGINT) AS n_nb,
        |    CAST(max(CASE WHEN n.day_id < d.day_id THEN n.rev END) AS BIGINT)
        |      AS max_l,
        |    CAST(max(CASE WHEN n.day_id > d.day_id THEN n.rev END) AS BIGINT)
        |      AS max_r,
        |    CAST(min(CASE WHEN n.day_id < d.day_id THEN n.rev END) AS BIGINT)
        |      AS min_l,
        |    CAST(min(CASE WHEN n.day_id > d.day_id THEN n.rev END) AS BIGINT)
        |      AS min_r
        |  FROM daily d JOIN daily n
        |    ON n.day_id BETWEEN d.day_id - 3 AND d.day_id + 3
        |    AND n.day_id <> d.day_id
        |  GROUP BY 1, 2)
        |SELECT day_id, rev AS rev_cents,
        |  CAST(rev - greatest(min_l, min_r) AS BIGINT) AS prominence_cents
        |FROM nb
        |WHERE n_nb = 6 AND rev > max_l AND rev > max_r
        |ORDER BY day_id""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(expr("unix_micros(cast(cast(o_orderdate as date) as timestamp)) div 86400000000")
          .as("day_id"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).cast("long").as("rev"))
        .localCheckpoint(true) // both sides of the neighborhood fan-out
      val nb = daily
        .select(col("day_id").as("src"), col("rev").as("nrev"),
          explode(sequence(lit(-3), lit(3))).as("k"))
        .filter(col("k") =!= 0)
        .select((col("src") + col("k")).as("day_id"), col("nrev"),
          (col("k") < 0).as("isr")) // neighbor offset sign relative to center
        .join(daily, Seq("day_id"))
        .groupBy(col("day_id"), col("rev"))
        .agg(count(lit(1)).as("n_nb"),
          max(when(col("isr") === false, col("nrev"))).as("max_l"),
          max(when(col("isr") === true, col("nrev"))).as("max_r"),
          min(when(col("isr") === false, col("nrev"))).as("min_l"),
          min(when(col("isr") === true, col("nrev"))).as("min_r"))
      nb.filter(col("n_nb") === 6 && col("rev") > col("max_l") &&
          col("rev") > col("max_r"))
        .select(col("day_id"), col("rev").as("rev_cents"),
          (col("rev") - greatest(col("min_l"), col("min_r"))).cast("long")
            .as("prominence_cents"))
        .orderBy(col("day_id"))
    }
  )
}
