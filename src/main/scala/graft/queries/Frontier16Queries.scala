package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Sixteenth frontier batch: interval-interval overlap join via grid
  * blocking, HITS hubs/authorities in fixed-point integers, and the
  * cohort lifetime-value matrix.
  */
object Frontier16Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- J9: interval overlap join (grid-blocked) --------------------------
    // RangeJoin covers point-in-interval; this is the interval×interval
    // case — which user sessions overlap a platform error burst.
    // Sessions are the strict >30 min gap intervals per user; bursts
    // are runs of error events with <10 min spacing, sessionized
    // WITHIN each day (day-partitioned window — bursts don't cross
    // midnight by definition, so no global-stream scan exists
    // anywhere in the plan). The join explodes both interval sets onto
    // a 1 h µs-grid, hash-joins on the cell, dedups candidate pairs,
    // and verifies the exact overlap predicate — candidates are
    // density-bounded (intervals per cell), never quadratic. The
    // oracle is DuckDB's brute-force range-predicate join.
    QueryDef.sql(
      "j9_interval_overlap",
      """WITH ev AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
        |      AS sess_id,
        |    ts FROM ev),
        |sbounds AS (
        |  SELECT user_id, sess_id,
        |    min(epoch_us(ts)) AS s_us, max(epoch_us(ts)) AS e_us
        |  FROM sess GROUP BY 1, 2),
        |err AS (
        |  SELECT CAST(ts AS DATE) AS bday, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
        |      THEN 1 ELSE 0 END AS new_burst
        |  FROM events WHERE event_type = 'error'
        |  WINDOW w AS (PARTITION BY CAST(ts AS DATE) ORDER BY ts, event_id)),
        |burst AS (
        |  SELECT bday,
        |    CAST(sum(new_burst) OVER (PARTITION BY bday ORDER BY ts, event_id) AS BIGINT)
        |      AS burst_seq,
        |    ts FROM err),
        |bbounds AS (
        |  SELECT bday, burst_seq,
        |    min(epoch_us(ts)) AS b_s, max(epoch_us(ts)) AS b_e
        |  FROM burst GROUP BY 1, 2)
        |SELECT s.user_id, s.sess_id, b.bday AS burst_day, b.burst_seq,
        |  least(s.e_us, b.b_e) - greatest(s.s_us, b.b_s) AS overlap_us
        |FROM sbounds s JOIN bbounds b
        |  ON s.s_us <= b.b_e AND b.b_s <= s.e_us""".stripMargin) { (s, d) =>
      val wU = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sessRows = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("new_sess",
          when(lag(col("ts"), 1).over(wU).isNull ||
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wU)) > 1800000000L,
            1).otherwise(0))
        .withColumn("sess_id", sum(col("new_sess")).over(wU).cast("long"))
      val sbounds = sessRows.groupBy(col("user_id"), col("sess_id"))
        .agg(min(unix_micros(col("ts"))).as("s_us"), max(unix_micros(col("ts"))).as("e_us"))
      val wB = Window.partitionBy(col("bday")).orderBy(col("ts"), col("event_id"))
      val burstRows = Tables.events(s, d)
        .filter(col("event_type") === "error")
        .select(col("ts").cast("date").as("bday"), col("ts"), col("event_id"))
        .withColumn("new_burst",
          when(lag(col("ts"), 1).over(wB).isNull ||
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wB)) > 600000000L,
            1).otherwise(0))
        .withColumn("burst_seq", sum(col("new_burst")).over(wB).cast("long"))
      val bbounds = burstRows.groupBy(col("bday"), col("burst_seq"))
        .agg(min(unix_micros(col("ts"))).as("b_s"), max(unix_micros(col("ts"))).as("b_e"))
      // 1 h grid cells; a candidate pair appears once per shared cell →
      // distinct before the exact verify
      val cellUs = 3600000000L
      val sCells = sbounds.withColumn("cell",
        explode(sequence(expr(s"s_us div $cellUs"), expr(s"e_us div $cellUs"))))
      val bCells = bbounds.withColumn("cell",
        explode(sequence(expr(s"b_s div $cellUs"), expr(s"b_e div $cellUs"))))
      sCells.join(bCells, "cell")
        .select(col("user_id"), col("sess_id"), col("bday").as("burst_day"),
          col("burst_seq"), col("s_us"), col("e_us"), col("b_s"), col("b_e"))
        .distinct()
        .filter(col("s_us") <= col("b_e") && col("b_s") <= col("e_us"))
        .select(col("user_id"), col("sess_id"), col("burst_day"), col("burst_seq"),
          (least(col("e_us"), col("b_e")) - greatest(col("s_us"), col("b_s")))
            .as("overlap_us"))
    },

    // ---- A48: HITS hubs/authorities (fixed-point integer) ------------------
    // Kleinberg's mutual-reinforcement recurrence over the bipartite
    // customer→part purchase graph: a = A^T h, h = A a, normalized per
    // half-round. Same exact-arithmetic discipline as d7/v18: scores
    // live in 1e9 L∞ units, sums are exact DECIMAL(38,0)/HUGEINT, and
    // the normalization divides positive integers — the whole
    // iteration hash-checks bit-exact. Scale shape per half-round: the
    // edge list (checkpointed once) never reshuffles — the score table
    // (one row per customer or part, ≪ edges) broadcasts onto it,
    // followed by one partial-agg shuffle on the opposite key.
    QueryDef.sql(
      "a48_hits_authority",
      """WITH e AS (
        |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |a1r AS (SELECT p, CAST(count(*) AS HUGEINT) * 1000000000 AS sv FROM e GROUP BY p),
        |a1 AS (SELECT p, (sv * 1000000000) // (SELECT max(sv) FROM a1r) AS v FROM a1r),
        |h1r AS (SELECT c, CAST(SUM(a1.v) AS HUGEINT) AS sv
        |        FROM e JOIN a1 USING (p) GROUP BY c),
        |h1 AS (SELECT c, (sv * 1000000000) // (SELECT max(sv) FROM h1r) AS v FROM h1r),
        |a2r AS (SELECT p, CAST(SUM(h1.v) AS HUGEINT) AS sv
        |        FROM e JOIN h1 USING (c) GROUP BY p),
        |a2 AS (SELECT p, (sv * 1000000000) // (SELECT max(sv) FROM a2r) AS v FROM a2r)
        |SELECT p AS p_partkey, CAST(v AS BIGINT) AS a_unit
        |FROM a2 ORDER BY v DESC, p LIMIT 20""".stripMargin) { (s, d) =>
      def normalize(df: DataFrame, key: String): DataFrame = {
        val mx = df.agg(max(col("sv")).as("mx"))
        df.crossJoin(broadcast(mx))
          .select(col(key), expr("(sv * 1000000000) div mx").as("v"))
      }
      val edges = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
        .localCheckpoint(true)
      // h0 ≡ 1e9 → a1 raw is just deg(p)·1e9
      val a1 = normalize(
        edges.groupBy(col("p"))
          .agg((count(lit(1)).cast(DecimalType(38, 0)) * 1000000000L).as("sv")), "p")
      val h1 = normalize(
        edges.join(broadcast(a1), "p")
          .groupBy(col("c")).agg(sum(col("v").cast(DecimalType(38, 0))).as("sv")), "c")
      val a2 = normalize(
        edges.join(broadcast(h1), "c")
          .groupBy(col("p")).agg(sum(col("v").cast(DecimalType(38, 0))).as("sv")), "p")
      a2.select(col("p").as("p_partkey"), col("v").as("a_unit"))
        .orderBy(col("a_unit").desc, col("p_partkey")).limit(20)
    },

    // ---- A52: cohort lifetime value ---------------------------------------
    // The growth-analytics LTV matrix: users cohort by first-seen day,
    // purchase revenue accumulates over cohort age, and each cell
    // reports cumulative revenue per cohort user. Revenue quantizes at
    // the scan (floor(value·100) — exact IEEE product + floor, the
    // portable unit trick from v15), cumulates as exact BIGINT cents
    // through a PARTITIONED (per-cohort) running window over the
    // bounded age axis, and divides exactly once per cell. Ages with
    // no purchases don't emit rows (sparse matrix — same grouping both
    // engines).
    QueryDef.sql(
      "a52_cohort_ltv",
      """WITH first_seen AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |  FROM events GROUP BY 1),
        |cohort_size AS (
        |  SELECT cohort_day, CAST(count(*) AS BIGINT) AS n_users
        |  FROM first_seen GROUP BY 1),
        |buys AS (
        |  SELECT f.cohort_day,
        |    date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS age_day,
        |    CAST(floor(e.value * 100) AS BIGINT) AS cents
        |  FROM events e JOIN first_seen f ON e.user_id = f.user_id
        |  WHERE e.event_type = 'purchase'),
        |cell AS (
        |  SELECT cohort_day, age_day, CAST(sum(cents) AS BIGINT) AS day_cents
        |  FROM buys GROUP BY 1, 2),
        |cum AS (
        |  SELECT cohort_day, age_day, day_cents,
        |    CAST(sum(day_cents) OVER (PARTITION BY cohort_day ORDER BY age_day)
        |      AS BIGINT) AS cum_cents
        |  FROM cell)
        |SELECT c.cohort_day, c.age_day, s.n_users, c.cum_cents,
        |  CAST(c.cum_cents AS DOUBLE) / (CAST(s.n_users AS DOUBLE) * 100.0)
        |    AS ltv_per_user
        |FROM cum c JOIN cohort_size s USING (cohort_day)""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val firstSeen = ev.groupBy(col("user_id"))
        .agg(min(col("ts").cast("date")).as("cohort_day"))
      val cohortSize = firstSeen.groupBy(col("cohort_day"))
        .agg(count(lit(1)).as("n_users"))
      val buys = ev.filter(col("event_type") === "purchase")
        .join(firstSeen, "user_id")
        .select(col("cohort_day"),
          datediff(col("ts").cast("date"), col("cohort_day")).as("age_day"),
          floor(col("value") * 100).cast("long").as("cents"))
      val cell = buys.groupBy(col("cohort_day"), col("age_day"))
        .agg(sum(col("cents")).as("day_cents"))
      val wC = Window.partitionBy(col("cohort_day")).orderBy(col("age_day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cell.withColumn("cum_cents", sum(col("day_cents")).over(wC))
        .join(broadcast(cohortSize), "cohort_day")
        .select(col("cohort_day"), col("age_day"), col("n_users"), col("cum_cents"),
          (col("cum_cents").cast("double") / (col("n_users").cast("double") * 100.0))
            .as("ltv_per_user"))
    }
  )
}
