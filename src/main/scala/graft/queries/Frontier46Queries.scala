package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Forty-sixth frontier batch: closed-form business-day arithmetic,
  * golden-record survivorship merge, item-item collaborative filtering.
  */
object Frontier46Queries {

  // Weekdays in [d, d+rem) for rem = 0..6, indexed dow*7 + rem + 1
  // (dow 0=Mon..6=Sun). Precomputed once — the calendar kernel is a
  // 49-entry integer table, not a calendar-table scan.
  private val bdayTab: String =
    "0,1,2,3,4,5,5,0,1,2,3,4,4,4,0,1,2,3,3,3,4,0,1,2,2,2,3,4,0,1,1,1,2,3,4,0,0,0,1,2,3,4,0,0,1,2,3,4,5"
  // Calendar days to reach the 10th business day strictly after d,
  // indexed by dow(d)+1.
  private val add10Tab: String = "14,14,14,14,14,13,12"

  val defs: Seq[QueryDef] = Seq(

    // ---- F7: business-day arithmetic, closed form ---------------------------
    // SLA math without a calendar dimension table: business days
    // between order and first ship = 5·⌊Δ/7⌋ + kernel[dow, Δ mod 7]
    // (49-entry precomputed table), and the 10-business-day promise
    // date is d + add10[dow] — both pure per-row integer expressions,
    // ZERO joins/shuffles beyond the orderkey aggregate. Weekday
    // convention pinned to 0=Mon (Spark weekday(); DuckDB isodow−1).
    // The synthetic ship dates are uncorrelated with order dates, so
    // Δ is SIGNED: the kernel always runs on (least, greatest) —
    // non-negative operands only, the a101 div discipline — and the
    // sign is re-applied (bdays(a,b) = −bdays(b,a)).
    QueryDef.sql(
      "f7_business_days",
      s"""WITH firstship AS (
        |  SELECT l_orderkey, CAST(min(l_shipdate) AS DATE) AS ship
        |  FROM lineitem GROUP BY 1),
        |o AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od, ship,
        |    isodow(CAST(o_orderdate AS DATE)) - 1 AS dow,
        |    isodow(least(CAST(o_orderdate AS DATE), ship)) - 1 AS dow2,
        |    date_diff('day', least(CAST(o_orderdate AS DATE), ship),
        |      greatest(CAST(o_orderdate AS DATE), ship)) AS delta2,
        |    CASE WHEN ship >= CAST(o_orderdate AS DATE) THEN 1 ELSE -1 END AS sgn
        |  FROM orders JOIN firstship ON o_orderkey = l_orderkey)
        |SELECT o_orderkey, od AS order_date,
        |  od + CAST([$add10Tab][dow + 1] AS INT) AS promised_date,
        |  ship AS first_ship,
        |  CAST(sgn * (5 * (delta2 // 7) + [$bdayTab][dow2 * 7 + (delta2 % 7) + 1])
        |    AS BIGINT) AS bdays_to_ship,
        |  CAST(sgn * (5 * (delta2 // 7) + [$bdayTab][dow2 * 7 + (delta2 % 7) + 1])
        |    > 10 AS INT) AS late
        |FROM o""".stripMargin) { (s, d) =>
      val firstship = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(min(col("l_shipdate").cast("date")).as("ship"))
      Tables.orders(s, d)
        .join(firstship, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"),
          col("ship"))
        .withColumn("dow", weekday(col("od")))
        .withColumn("dow2", weekday(least(col("od"), col("ship"))))
        .withColumn("delta2",
          datediff(greatest(col("od"), col("ship")), least(col("od"), col("ship"))))
        .withColumn("sgn", when(col("ship") >= col("od"), 1).otherwise(-1))
        .select(col("o_orderkey"), col("od").as("order_date"),
          expr(s"date_add(od, element_at(array($add10Tab), dow + 1))")
            .as("promised_date"),
          col("ship").as("first_ship"),
          expr(s"CAST(sgn * (5 * (delta2 div 7) + element_at(array($bdayTab), dow2 * 7 + (delta2 % 7) + 1)) AS BIGINT)")
            .as("bdays_to_ship"),
          expr(s"CAST(sgn * (5 * (delta2 div 7) + element_at(array($bdayTab), dow2 * 7 + (delta2 % 7) + 1)) > 10 AS INT)")
            .as("late"))
    },

    // ---- U39: golden-record survivorship merge ------------------------------
    // The MDM step after dedup clustering (d6): collapse each
    // customer's order observations into one golden record with
    // field-level survivorship rules — RECENCY for status (latest
    // order, orderkey tie-break), FREQUENCY for priority (mode,
    // lexicographic tie-break), MAX for spend, MIN/MAX for the seen
    // range. Both rule families are partitioned windows over the
    // custkey grain — one shuffle, no self-joins; at 100 TB each rule
    // is a map-side-combinable aggregate or a bounded per-key window.
    QueryDef.sql(
      "u39_golden_record",
      """WITH obs AS (
        |  SELECT o_custkey AS cust, o_orderstatus AS status,
        |    o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS od,
        |    o_orderkey AS ok,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |latest AS (
        |  SELECT cust, status AS status_latest FROM (
        |    SELECT cust, status,
        |      row_number() OVER (PARTITION BY cust ORDER BY od DESC, ok DESC) AS rn
        |    FROM obs) WHERE rn = 1),
        |freq AS (
        |  SELECT cust, prio AS prio_mode FROM (
        |    SELECT cust, prio,
        |      row_number() OVER (PARTITION BY cust
        |        ORDER BY count(*) DESC, prio) AS rn
        |    FROM obs GROUP BY cust, prio) WHERE rn = 1),
        |base AS (
        |  SELECT cust, CAST(count(*) AS BIGINT) AS n_obs,
        |    CAST(max(cents) AS BIGINT) AS max_spend_cents,
        |    min(od) AS first_seen, max(od) AS last_seen
        |  FROM obs GROUP BY 1)
        |SELECT b.cust AS custkey, l.status_latest, f.prio_mode, b.n_obs,
        |  b.max_spend_cents, b.first_seen, b.last_seen
        |FROM base b JOIN latest l ON b.cust = l.cust
        |JOIN freq f ON b.cust = f.cust""".stripMargin) { (s, d) =>
      val obs = Tables.orders(s, d).select(
        col("o_custkey").as("cust"), col("o_orderstatus").as("status"),
        col("o_orderpriority").as("prio"),
        col("o_orderdate").cast("date").as("od"), col("o_orderkey").as("ok"),
        (col("o_totalprice").cast(DecimalType(18, 4)) * 100).cast("long").as("cents"))
      val latest = obs
        .withColumn("rn", row_number().over(Window.partitionBy(col("cust"))
          .orderBy(col("od").desc, col("ok").desc)))
        .filter(col("rn") === 1)
        .select(col("cust"), col("status").as("status_latest"))
      val freq = obs.groupBy(col("cust"), col("prio"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("cust"))
          .orderBy(col("c").desc, col("prio"))))
        .filter(col("rn") === 1)
        .select(col("cust"), col("prio").as("prio_mode"))
      val base = obs.groupBy(col("cust"))
        .agg(count(lit(1)).as("n_obs"), max(col("cents")).as("max_spend_cents"),
          min(col("od")).as("first_seen"), max(col("od")).as("last_seen"))
      base.join(latest, "cust").join(freq, "cust")
        .select(col("cust").as("custkey"), col("status_latest"), col("prio_mode"),
          col("n_obs"), col("max_spend_cents"), col("first_seen"), col("last_seen"))
    },

    // ---- V30: item-item collaborative filtering ------------------------------
    // "Customers who bought X also bought": co-occurrence counts from
    // the order-part basket self-join (order sizes are bounded, so the
    // pair space is |orders|·size² — never all-pairs over the
    // catalog), scored by exact cosine² in micro-units
    // (c²·10⁶ div (n₁·n₂) — the sqrt eliminated by squaring, the w10
    // trick), top-3 neighbors per item via one partitioned
    // WindowGroupLimit. Ranking ties break on the neighbor key.
    QueryDef.sql(
      "v30_item_item_cf",
      """WITH basket AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |ni AS (SELECT pk, CAST(count(*) AS BIGINT) AS n FROM basket GROUP BY 1),
        |pairs AS (
        |  SELECT a.pk AS p1, b.pk AS p2, CAST(count(*) AS BIGINT) AS c
        |  FROM basket a JOIN basket b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2),
        |bi AS (
        |  SELECT p1 AS item, p2 AS neighbor, c FROM pairs
        |  UNION ALL SELECT p2, p1, c FROM pairs),
        |scored AS (
        |  SELECT item, neighbor, c,
        |    CAST(c * c * 1000000 // (n1.n * n2.n) AS BIGINT) AS cos2_micro
        |  FROM bi JOIN ni n1 ON bi.item = n1.pk
        |  JOIN ni n2 ON bi.neighbor = n2.pk)
        |SELECT item, neighbor, c, cos2_micro, CAST(rn AS INT) AS rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY item
        |    ORDER BY cos2_micro DESC, neighbor) AS rn FROM scored)
        |WHERE rn <= 3""".stripMargin) { (s, d) =>
      val basket = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
        .localCheckpoint(true) // feeds the self-join and the item norms
      val ni = basket.groupBy(col("pk")).agg(count(lit(1)).as("n"))
      val b2 = basket.select(col("ok"), col("pk").as("pk2"))
      val pairs = basket.join(b2, Seq("ok"))
        .filter(col("pk") < col("pk2"))
        .groupBy(col("pk").as("p1"), col("pk2").as("p2"))
        .agg(count(lit(1)).as("c"))
      val both = pairs.select(col("p1").as("item"), col("p2").as("neighbor"), col("c"))
        .unionByName(pairs.select(col("p2").as("item"), col("p1").as("neighbor"), col("c")))
      val n1 = ni.select(col("pk").as("item"), col("n").as("na"))
      val n2 = ni.select(col("pk").as("neighbor"), col("n").as("nb"))
      val scored = both.join(n1, "item").join(n2, "neighbor")
        .select(col("item"), col("neighbor"), col("c"),
          expr("c * c * 1000000 div (na * nb)").as("cos2_micro"))
      scored
        .withColumn("rn", row_number().over(Window.partitionBy(col("item"))
          .orderBy(col("cos2_micro").desc, col("neighbor"))))
        .filter(col("rn") <= 3)
        .select(col("item"), col("neighbor"), col("c"), col("cos2_micro"),
          col("rn").cast("int").as("rank"))
    }
  )
}
