package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-twenty-fifth frontier batch: Cohen's d effect size driven by
  * the new native graft_isqrt expression (the oracle reproduces it with
  * the SQL correction ladder — cross-checking the codegen path against
  * portable arithmetic), and Kadane's maximum-subarray as pure window
  * algebra (best contiguous revenue window per nation, with the
  * argmax/argmin walk recovering the window bounds deterministically).
  */
object Frontier125Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A198: Cohen's d with native exact isqrt ---------------------------------
    // Standardized mean difference (urgent/high vs other orders) per
    // market segment: pooled variance and the squared effect size stay
    // exact rationals cleared to two truncating divisions; the two
    // square roots go through graft_isqrt (native BigInteger.sqrt in
    // codegen). The DuckDB oracle has no such function — it uses the
    // floor(sqrt(double)) ±2 ladder, valid here because both radicands
    // sit far below the ladder's 1e21 precision ceiling. One grouped
    // aggregation; everything after is per-group arithmetic.
    QueryDef.sql(
      "a198_cohens_d",
      """WITH g AS (
        |  SELECT c.c_mktsegment AS seg,
        |    CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS t,
        |    CAST(floor(o.o_totalprice * 100) AS BIGINT) AS x
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |cells AS (
        |  SELECT seg,
        |    CAST(count(*) FILTER (WHERE t = 1) AS BIGINT) AS n1,
        |    CAST(count(*) FILTER (WHERE t = 0) AS BIGINT) AS n2,
        |    CAST(sum(x) FILTER (WHERE t = 1) AS HUGEINT) AS s1,
        |    CAST(sum(x) FILTER (WHERE t = 0) AS HUGEINT) AS s2,
        |    CAST(sum(CAST(x AS HUGEINT) * x) FILTER (WHERE t = 1) AS HUGEINT)
        |      AS q1,
        |    CAST(sum(CAST(x AS HUGEINT) * x) FILTER (WHERE t = 0) AS HUGEINT)
        |      AS q2
        |  FROM g GROUP BY 1),
        |ab AS (
        |  SELECT seg, n1, n2, s1, s2,
        |    ((q1 * n1 - s1 * s1) * n2 + (q2 * n2 - s2 * s2) * n1)
        |      // (n1 * n2 * (n1 + n2 - 2)) AS bb,
        |    s1 * n2 - s2 * n1 AS diff
        |  FROM cells WHERE n1 >= 2 AND n2 >= 2),
        |d2 AS (
        |  SELECT seg, n1, n2, s1, s2, bb, diff,
        |    CASE WHEN bb = 0 THEN 0
        |      ELSE (diff * diff * 1000000)
        |        // (CAST(n1 AS HUGEINT) * n1 * n2 * n2 * bb) END AS d2_micro
        |  FROM ab),
        |r AS (
        |  SELECT seg, n1, n2, s1, s2, bb, diff, d2_micro,
        |    CAST(floor(sqrt(CAST(bb AS DOUBLE))) AS BIGINT) AS sb0,
        |    CAST(floor(sqrt(CAST(d2_micro AS DOUBLE))) AS BIGINT) AS sd0
        |  FROM d2)
        |SELECT seg, n1, n2,
        |  CAST(s1 // n1 AS BIGINT) AS mean1_cents,
        |  CAST(s2 // n2 AS BIGINT) AS mean2_cents,
        |  CAST(sb0 + CASE
        |    WHEN CAST(sb0 + 2 AS HUGEINT) * (sb0 + 2) <= bb THEN 2
        |    WHEN CAST(sb0 + 1 AS HUGEINT) * (sb0 + 1) <= bb THEN 1
        |    WHEN CAST(sb0 AS HUGEINT) * sb0 <= bb THEN 0
        |    WHEN CAST(sb0 - 1 AS HUGEINT) * (sb0 - 1) <= bb THEN -1
        |    ELSE -2 END AS BIGINT) AS pooled_sd_cents,
        |  CAST((CASE WHEN diff < 0 THEN -1 ELSE 1 END) * (sd0 + CASE
        |    WHEN CAST(sd0 + 2 AS HUGEINT) * (sd0 + 2) <= d2_micro THEN 2
        |    WHEN CAST(sd0 + 1 AS HUGEINT) * (sd0 + 1) <= d2_micro THEN 1
        |    WHEN CAST(sd0 AS HUGEINT) * sd0 <= d2_micro THEN 0
        |    WHEN CAST(sd0 - 1 AS HUGEINT) * (sd0 - 1) <= d2_micro THEN -1
        |    ELSE -2 END) AS BIGINT) AS d_milli
        |FROM r ORDER BY seg""".stripMargin) { (s, d) =>
      val g = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_mktsegment").as("seg"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0).as("t"),
          floor(col("o_totalprice") * 100).cast("long").as("x"))
      val cells = g.groupBy(col("seg")).agg(
        count(when(col("t") === 1, 1)).cast("long").as("n1"),
        count(when(col("t") === 0, 1)).cast("long").as("n2"),
        sum(when(col("t") === 1, col("x"))).cast("decimal(38,0)").as("s1"),
        sum(when(col("t") === 0, col("x"))).cast("decimal(38,0)").as("s2"),
        sum(when(col("t") === 1,
          col("x").cast("decimal(38,0)") * col("x"))).cast("decimal(38,0)")
          .as("q1"),
        sum(when(col("t") === 0,
          col("x").cast("decimal(38,0)") * col("x"))).cast("decimal(38,0)")
          .as("q2"))
      val ab = cells.filter(col("n1") >= 2 && col("n2") >= 2)
        .select(col("seg"), col("n1"), col("n2"), col("s1"), col("s2"),
          expr("((q1 * n1 - s1 * s1) * n2 + (q2 * n2 - s2 * s2) * n1)" +
            " div (n1 * n2 * (n1 + n2 - 2))").as("bb"),
          expr("s1 * n2 - s2 * n1").as("diff"))
      val d2 = ab.withColumn("d2_micro", expr(
        """case when bb = 0 then 0L
          | else (diff * diff * 1000000)
          |   div (cast(n1 as decimal(38,0)) * n1 * n2 * n2 * bb) end
          |""".stripMargin))
      d2.select(col("seg"), col("n1"), col("n2"),
        expr("cast(s1 div n1 as bigint)").as("mean1_cents"),
        expr("cast(s2 div n2 as bigint)").as("mean2_cents"),
        expr("graft_isqrt(cast(bb as decimal(38,0)))").as("pooled_sd_cents"),
        expr("(case when diff < 0 then -1L else 1L end)" +
          " * graft_isqrt(cast(d2_micro as decimal(38,0)))").as("d_milli"))
        .orderBy(col("seg"))
    },

    // ---- W40: Kadane maximum revenue window as window algebra --------------------
    // The best contiguous run of daily net revenue (returns subtract)
    // per supplier nation: max subarray = max over t of
    // prefix(t) − min(0, min prefix before t) — Kadane without a fold,
    // just two partitioned windows. The window BOUNDS come back via a
    // deterministic argmax/argmin walk (earliest best end, earliest
    // matching prefix, next trading day), all small per-nation joins.
    // Oracle window sums are CAST to BIGINT: DuckDB's sum(BIGINT) OVER
    // returns HUGEINT, which lands in the driver's compare as float64
    // and hash-diverges from Spark's int64 (the r4 red row).
    QueryDef.sql(
      "w40_kadane_window",
      """WITH daily AS (
        |  SELECT s.s_nationkey AS nk, CAST(l.l_shipdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)
        |      * CASE WHEN l.l_returnflag = 'R' THEN -1 ELSE 1 END) AS BIGINT)
        |      AS net
        |  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  GROUP BY 1, 2),
        |pre0 AS (
        |  SELECT nk, day, net,
        |    CAST(sum(net) OVER (PARTITION BY nk ORDER BY day) AS BIGINT)
        |      AS prefix
        |  FROM daily),
        |pre AS (
        |  SELECT nk, day, net, prefix,
        |    least(CAST(0 AS BIGINT), coalesce(CAST(min(prefix) OVER (
        |      PARTITION BY nk ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
        |      CAST(0 AS BIGINT))) AS mneeded
        |  FROM pre0),
        |best AS (
        |  SELECT nk, day AS end_day, prefix - mneeded AS best_cents, mneeded
        |  FROM (
        |    SELECT *, row_number() OVER (PARTITION BY nk
        |      ORDER BY prefix - mneeded DESC, day ASC) AS rn
        |    FROM pre) WHERE rn = 1),
        |fd AS (SELECT nk, min(day) AS first_day FROM daily GROUP BY 1),
        |tp AS (
        |  SELECT b.nk, min(p.day) AS tprime
        |  FROM best b JOIN pre p ON p.nk = b.nk
        |    AND p.day < b.end_day AND p.prefix = b.mneeded
        |  GROUP BY 1),
        |st AS (
        |  SELECT t.nk, min(p.day) AS start_after
        |  FROM tp t JOIN pre p ON p.nk = t.nk AND p.day > t.tprime
        |  GROUP BY 1)
        |SELECT n.n_name AS nation, b.best_cents,
        |  CASE WHEN b.mneeded = 0 THEN f.first_day ELSE s.start_after END
        |    AS start_day,
        |  b.end_day
        |FROM best b
        |JOIN fd f ON f.nk = b.nk
        |LEFT JOIN st s ON s.nk = b.nk
        |JOIN nation n ON n.n_nationkey = b.nk
        |ORDER BY nation""".stripMargin) { (s, d) =>
      val daily = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("s_nationkey").as("nk"), col("l_shipdate").cast("date")
          .as("day"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")
          * when(col("l_returnflag") === "R", -1).otherwise(1))
          .cast("long").as("net"))
      val wOrd = Window.partitionBy(col("nk")).orderBy(col("day"))
      val pre = daily
        .withColumn("prefix", sum(col("net")).over(wOrd))
        .withColumn("mneeded", least(lit(0L), coalesce(
          min(col("prefix")).over(wOrd.rowsBetween(Window.unboundedPreceding,
            -1)), lit(0L))))
        .localCheckpoint(true) // best row + the two argmin walks share it
      val best = pre
        .withColumn("rn", row_number().over(Window.partitionBy(col("nk"))
          .orderBy((col("prefix") - col("mneeded")).desc, col("day").asc)))
        .filter(col("rn") === 1)
        .select(col("nk"), col("day").as("end_day"),
          (col("prefix") - col("mneeded")).as("best_cents"), col("mneeded"))
      val fd = daily.groupBy(col("nk")).agg(min(col("day")).as("first_day"))
      val tp = best.join(pre.select(col("nk"), col("day"), col("prefix")),
          Seq("nk"))
        .filter(col("day") < col("end_day") && col("prefix") === col("mneeded"))
        .groupBy(col("nk")).agg(min(col("day")).as("tprime"))
      val st = tp.join(pre.select(col("nk"), col("day")), Seq("nk"))
        .filter(col("day") > col("tprime"))
        .groupBy(col("nk")).agg(min(col("day")).as("start_after"))
      best.join(fd, Seq("nk")).join(st, Seq("nk"), "left")
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))),
          Seq("nk"))
        .select(col("nation"), col("best_cents"),
          when(col("mneeded") === 0, col("first_day"))
            .otherwise(col("start_after")).as("start_day"),
          col("end_day"))
        .orderBy(col("nation"))
    }
  )
}
