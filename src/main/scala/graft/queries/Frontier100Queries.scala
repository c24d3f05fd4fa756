package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.ShardedRank

/** Hundredth frontier batch: Croston's intermittent-demand forecast in
  * telescoped integers, SAX symbolic motif mining over discretized
  * event series, and an (s,S) replenishment-policy replay folded per
  * part.
  */
object Frontier100Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- W31: Croston's method for intermittent demand ------------------------
    // Spare-parts forecasting: most days sell nothing, so a plain EWMA
    // drifts to zero between demands. Croston smooths demand SIZE and
    // demand INTERVAL separately (alpha = 1/2) and forecasts their
    // ratio. The w7/w15 trick applies twice: with alpha = 1/2 each
    // EWMA telescopes to an integer weighted sum (weights 1, 1, 2, 4,
    // ... over the event index), the two power-of-two denominators
    // divide out in the ratio, and the per-day rate is one exact
    // division. The horizon is the last 20 demand events per part —
    // the bound that keeps the weights in BIGINT at any history
    // length (a 100-TB ledger included); one partitioned window, no
    // global sort.
    QueryDef.sql(
      "w31_croston_intermittent",
      """WITH daily AS (
        |  SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS z
        |  FROM lineitem GROUP BY 1, 2),
        |capped AS (
        |  SELECT l_partkey, day, z,
        |    count(*) OVER (PARTITION BY l_partkey) AS n_total
        |  FROM (
        |    SELECT l_partkey, day, z,
        |      row_number() OVER (PARTITION BY l_partkey ORDER BY day DESC)
        |        AS rd
        |    FROM daily) WHERE rd <= 20),
        |idx AS (
        |  SELECT l_partkey, n_total, z,
        |    row_number() OVER (PARTITION BY l_partkey ORDER BY day) AS i,
        |    count(*) OVER (PARTITION BY l_partkey) AS n,
        |    CAST(day - lag(day) OVER (PARTITION BY l_partkey ORDER BY day)
        |      AS BIGINT) AS q
        |  FROM capped),
        |folded AS (
        |  SELECT l_partkey, max(n_total) AS n_demand_days,
        |    CAST(sum(z * (CASE WHEN i = 1 THEN 1 ELSE 1 << (i - 2) END))
        |      AS BIGINT) AS wz,
        |    CAST(sum(CASE WHEN i >= 2
        |      THEN q * (CASE WHEN i = 2 THEN 1 ELSE 1 << (i - 3) END)
        |      ELSE 0 END) AS BIGINT) AS wq
        |  FROM idx GROUP BY l_partkey HAVING max(n) >= 3)
        |SELECT l_partkey, CAST(n_demand_days AS BIGINT) AS n_demand_days,
        |  CAST(wz * 1000 // (2 * wq) AS BIGINT) AS croston_rate_milli
        |FROM folded
        |ORDER BY n_demand_days DESC, l_partkey LIMIT 15""".stripMargin) { (s, d) =>
      val daily = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"), col("l_shipdate").as("day"))
        .agg(sum(floor(col("l_quantity")).cast("long")).as("z"))
      val byPart = Window.partitionBy(col("l_partkey"))
      val capped = daily
        .withColumn("rd", row_number().over(byPart.orderBy(col("day").desc)))
        .filter(col("rd") <= 20)
        .withColumn("n_total", count(lit(1)).over(byPart))
      val idx = capped
        .withColumn("i", row_number().over(byPart.orderBy(col("day"))))
        .withColumn("n", count(lit(1)).over(byPart))
        .withColumn("q",
          datediff(col("day"), lag(col("day"), 1).over(byPart.orderBy(col("day"))))
            .cast("long"))
      val folded = idx.groupBy(col("l_partkey"))
        .agg(max(col("n_total")).as("n_demand_days"),
          expr("""cast(sum(z * (case when i = 1 then 1
            else shiftleft(cast(1 as bigint), cast(i - 2 as int)) end))
            as bigint)""").as("wz"),
          expr("""cast(sum(case when i >= 2
            then q * (case when i = 2 then 1
              else shiftleft(cast(1 as bigint), cast(i - 3 as int)) end)
            else 0 end) as bigint)""").as("wq"),
          max(col("n")).as("nc"))
        .filter(col("nc") >= 3)
      folded.select(col("l_partkey"),
          col("n_demand_days").cast("long").as("n_demand_days"),
          expr("cast(wz * 1000 div (2 * wq) as bigint)").as("croston_rate_milli"))
        .orderBy(col("n_demand_days").desc, col("l_partkey")).limit(15)
    },

    // ---- W28: SAX motif mining ------------------------------------------------
    // Symbolic Aggregate approXimation, rank-discretized: every event
    // value maps to one of three equi-depth symbols via its global
    // rank (ShardedRank — deterministic where Gaussian breakpoints
    // would be irrational), each user's event stream becomes a symbol
    // string, and motifs are the 4-grams that recur most across the
    // fleet. This is the scalable skeleton of matrix-profile motif
    // discovery: identical words are candidate motifs, and no pair of
    // windows is ever compared directly — counting replaces the
    // quadratic scan.
    QueryDef.sql(
      "w28_sax_motifs",
      """WITH ev AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |rk AS (
        |  SELECT user_id, ts, event_id,
        |    row_number() OVER (ORDER BY cents, event_id) AS r,
        |    count(*) OVER () AS n
        |  FROM ev),
        |sym AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(((r - 1) * 3) // n AS BIGINT) AS s
        |  FROM rk),
        |words AS (
        |  SELECT CAST(s AS VARCHAR) ||
        |    CAST(lead(s, 1) OVER w AS VARCHAR) ||
        |    CAST(lead(s, 2) OVER w AS VARCHAR) ||
        |    CAST(lead(s, 3) OVER w AS VARCHAR) AS word,
        |    user_id,
        |    lead(s, 3) OVER w AS s3
        |  FROM sym
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT word, CAST(count(*) AS BIGINT) AS support,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM words WHERE s3 IS NOT NULL
        |GROUP BY word ORDER BY support DESC, word LIMIT 10""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"))
      val n = ev.agg(count(lit(1)).as("n"))
      val rk = ShardedRank.withRank(ev, "r", col("cents").asc, col("event_id"))
      val sym = rk.crossJoin(broadcast(n))
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("cast(((r - 1) * 3) div n as bigint)").as("s"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val words = sym
        .withColumn("s1", lead(col("s"), 1).over(w))
        .withColumn("s2", lead(col("s"), 2).over(w))
        .withColumn("s3", lead(col("s"), 3).over(w))
        .filter(col("s3").isNotNull)
        .select(concat(col("s").cast("string"), col("s1").cast("string"),
          col("s2").cast("string"), col("s3").cast("string")).as("word"),
          col("user_id"))
      words.groupBy(col("word"))
        .agg(count(lit(1)).as("support"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("support").desc, col("word")).limit(10)
    },

    // ---- W32: (s,S) replenishment-policy replay -------------------------------
    // Inventory control closed-loop: every part starts at S = 100
    // units; each day's demand draws it down (sales capped at stock —
    // the shortfall is a stockout), and whenever stock falls below
    // s = 20 a replenishment snaps it back to S. The control loop is
    // inherently SEQUENTIAL, so it runs as an integer fold over each
    // part's ordered demand list (the w15/a148 HOF shape — per-part
    // lists are order-count bounded, the fold never leaves the
    // executor). The brand ledger reports orders placed, units short,
    // and the exact fill rate the policy achieved.
    QueryDef.sql(
      "w32_ss_inventory_replay",
      """WITH daily AS (
        |  SELECT l_partkey, l_shipdate AS day,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS dq
        |  FROM lineitem GROUP BY 1, 2),
        |folded AS (
        |  SELECT l_partkey,
        |    list_reduce(
        |      list_prepend([CAST(100 AS BIGINT), 0, 0, 0],
        |        list_transform(list(dq ORDER BY day), v -> [v, 0, 0, 0])),
        |      (acc, e) -> CASE
        |        WHEN acc[1] - least(acc[1], e[1]) < 20 THEN
        |          [CAST(100 AS BIGINT), acc[2] + 1,
        |           acc[3] + least(acc[1], e[1]),
        |           acc[4] + e[1] - least(acc[1], e[1])]
        |        ELSE
        |          [acc[1] - least(acc[1], e[1]), acc[2],
        |           acc[3] + least(acc[1], e[1]),
        |           acc[4] + e[1] - least(acc[1], e[1])] END) AS st
        |  FROM daily GROUP BY l_partkey),
        |pp AS (
        |  SELECT p.p_brand, f.st[2] AS orders_placed, f.st[3] AS units_sold,
        |    f.st[4] AS units_short
        |  FROM folded f JOIN part p ON f.l_partkey = p.p_partkey)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(orders_placed) AS BIGINT) AS orders_placed,
        |  CAST(sum(units_sold) AS BIGINT) AS units_sold,
        |  CAST(sum(units_short) AS BIGINT) AS units_short,
        |  CAST(sum(units_sold) * 1000 // (sum(units_sold) + sum(units_short))
        |    AS BIGINT) AS fill_permille
        |FROM pp GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val daily = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"), col("l_shipdate").as("day"))
        .agg(sum(floor(col("l_quantity")).cast("long")).as("dq"))
      val folded = daily.groupBy(col("l_partkey"))
        .agg(expr(
          """aggregate(
            |  transform(array_sort(collect_list(struct(day, dq))),
            |    e -> e.dq),
            |  array(cast(100 as bigint), cast(0 as bigint),
            |        cast(0 as bigint), cast(0 as bigint)),
            |  (acc, v) -> IF(acc[0] - least(acc[0], v) < 20,
            |    array(cast(100 as bigint), acc[1] + 1,
            |          acc[2] + least(acc[0], v),
            |          acc[3] + v - least(acc[0], v)),
            |    array(acc[0] - least(acc[0], v), acc[1],
            |          acc[2] + least(acc[0], v),
            |          acc[3] + v - least(acc[0], v))))""".stripMargin).as("st"))
      val pp = folded
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("st").getItem(1).as("orders_placed"),
          col("st").getItem(2).as("units_sold"),
          col("st").getItem(3).as("units_short"))
      pp.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("orders_placed")).cast("long").as("orders_placed"),
          sum(col("units_sold")).cast("long").as("units_sold"),
          sum(col("units_short")).cast("long").as("units_short"))
        .select(col("p_brand"), col("n_parts"), col("orders_placed"),
          col("units_sold"), col("units_short"),
          expr("""cast(units_sold * 1000 div (units_sold + units_short)
            as bigint)""").as("fill_permille"))
        .orderBy(col("p_brand"))
    }
  )
}
