package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Fifth frontier batch: ordered-set aggregates with pinned ties,
  * sequence-gap auditing without windows, and the day-of-week
  * seasonality / local-extrema readouts that finish the time-series
  * diagnostic family.
  */
object Frontier5Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A37: grouped mode + discrete percentile (ordered-set aggs) -------
    // Spark's mode() is tie-nondeterministic, so the portable form is
    // the explicit (count DESC, value ASC) rank — pinned ties, same in
    // both engines. percentile_disc is the SMALLEST value whose cume
    // count reaches p·n (pure integer threshold on a counted-value
    // table — never interpolation). Everything runs on the (group,
    // value) aggregate grain: two shuffles total, no row-level window.
    QueryDef.sql(
      "a37_grouped_mode",
      """WITH g AS (
        |  SELECT c_mktsegment, c_nationkey, CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2),
        |m AS (
        |  SELECT c_mktsegment, c_nationkey, n,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY n DESC, c_nationkey) AS rk
        |  FROM g),
        |cum AS (
        |  SELECT c_mktsegment, c_nationkey, n,
        |    CAST(sum(n) OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey)
        |      AS BIGINT) AS cum_n,
        |    CAST(sum(n) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS tot
        |  FROM g)
        |SELECT m.c_mktsegment,
        |  m.c_nationkey AS mode_nation, m.n AS mode_count,
        |  p.c_nationkey AS median_nation
        |FROM (SELECT * FROM m WHERE rk = 1) m
        |JOIN (
        |  SELECT c_mktsegment, min(c_nationkey) AS c_nationkey
        |  FROM cum WHERE 2 * cum_n >= tot GROUP BY c_mktsegment) p
        |  ON m.c_mktsegment = p.c_mktsegment""".stripMargin) { (s, d) =>
      val g = Tables.customer(s, d)
        .groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"))
      val wMode = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("n").desc, col("c_nationkey"))
      val m = g.withColumn("rk", row_number().over(wMode)).filter(col("rk") === 1)
        .select(col("c_mktsegment"), col("c_nationkey").as("mode_nation"),
          col("n").as("mode_count"))
      val wCum = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_nationkey"))
      val wTot = Window.partitionBy(col("c_mktsegment"))
      val p = g
        .withColumn("cum_n", sum(col("n")).over(wCum))
        .withColumn("tot", sum(col("n")).over(wTot))
        .filter(lit(2) * col("cum_n") >= col("tot"))
        .groupBy(col("c_mktsegment"))
        .agg(min(col("c_nationkey")).as("median_nation"))
      m.join(p, "c_mktsegment")
        .select(col("c_mktsegment"), col("mode_nation"), col("mode_count"),
          col("median_nation"))
    },

    // ---- U16: sequence-gap audit (missing ids, no window, no gen) ---------
    // "Are any ids missing?" over [min, max] — the exactly-once
    // acceptance check for ingest pipelines. The scalable shape: bucket
    // ids by id div 1000; expected-per-bucket is pure arithmetic
    // against the broadcast (min, max) — intersection of the bucket's
    // range with the global range — so the whole audit is ONE
    // partial-agg shuffle on the bucket key. No generate_series
    // materializing the id space, no sort, no window.
    QueryDef.sql(
      "u16_id_gap_audit",
      """WITH st AS (
        |  SELECT min(l_orderkey) AS lo, max(l_orderkey) AS hi FROM lineitem),
        |b AS (
        |  SELECT l_orderkey // 1000 AS bucket,
        |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS present
        |  FROM lineitem GROUP BY 1),
        |e AS (
        |  SELECT bucket, present,
        |    least((bucket + 1) * 1000 - 1, hi) - greatest(bucket * 1000, lo) + 1
        |      AS expected
        |  FROM b CROSS JOIN st)
        |SELECT bucket, CAST(expected AS BIGINT) AS expected, present,
        |  CAST(expected - present AS BIGINT) AS missing
        |FROM e WHERE expected - present > 0""".stripMargin) { (s, d) =>
      val o = Tables.lineitem(s, d)
      val st = o.agg(min(col("l_orderkey")).as("lo"), max(col("l_orderkey")).as("hi"))
      val b = o.groupBy(expr("l_orderkey div 1000").as("bucket"))
        .agg(count_distinct(col("l_orderkey")).as("present"))
      b.crossJoin(broadcast(st))
        .withColumn("expected",
          least((col("bucket") + 1) * 1000 - 1, col("hi"))
            - greatest(col("bucket") * 1000, col("lo")) + 1)
        .filter(col("expected") - col("present") > 0)
        .select(col("bucket"), col("expected").cast("long").as("expected"),
          col("present"), (col("expected") - col("present")).cast("long").as("missing"))
    },

    // ---- EV35: local-extrema peak days ------------------------------------
    // Days whose revenue exceeds BOTH calendar neighbors (plateaus
    // excluded by strict >) — the "what spiked?" readout. Neighbor
    // lookup is a calendar equi-join on day±1 (day-grain table), not a
    // window; days missing a neighbor don't qualify. Integer units,
    // one division for the readout.
    QueryDef.sql(
      "ev35_peak_days",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1)
        |SELECT a.day, CAST(a.x AS DOUBLE) / 10000 AS revenue
        |FROM daily a JOIN daily p ON p.day = a.day - 1
        |             JOIN daily n ON n.day = a.day + 1
        |WHERE a.x > p.x AND a.x > n.x""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 4)) * lit(10000))
          .cast("long")).as("x"))
      val p = daily.select(col("day").as("pday"), col("x").as("px"))
      val n = daily.select(col("day").as("nday"), col("x").as("nx"))
      daily
        .join(p, col("pday") === date_sub(col("day"), 1))
        .join(n, col("nday") === date_add(col("day"), 1))
        .filter(col("x") > col("px") && col("x") > col("nx"))
        .select(col("day"), (col("x").cast("double") / lit(10000)).as("revenue"))
    },

    // ---- A38: day-of-week seasonality index -------------------------------
    // Per weekday: avg daily revenue vs the all-days average, as an
    // index (1.0 = no weekday effect). Both averages are rationals of
    // exact integers; the index is computed as ONE division of exact
    // cross-multiplied integers (sum_d · n_all vs sum_all · n_d) so no
    // intermediate mean ever exists as a float. ISO weekday numbers
    // pin the same day naming in both engines.
    QueryDef.sql(
      "a38_weekday_index",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |dw AS (
        |  SELECT isodow(day) AS dow, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(x) AS BIGINT) AS sum_x
        |  FROM daily GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_days) AS BIGINT) AS n_all, CAST(sum(sum_x) AS BIGINT) AS sum_all
        |  FROM dw)
        |SELECT CAST(dow AS INTEGER) AS dow, n_days,
        |  CAST(sum_x * n_all AS DOUBLE) / CAST(sum_all * n_days AS DOUBLE) AS idx
        |FROM dw CROSS JOIN tot""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 4)) * lit(10000))
          .cast("long")).as("x"))
      val dw = daily.groupBy(dayofweek(col("day")).as("dow0"))
        .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sum_x"))
        // Spark dayofweek: 1=Sunday..7=Saturday -> ISO 1=Monday..7=Sunday
        .withColumn("dow", when(col("dow0") === 1, 7).otherwise(col("dow0") - 1))
        .drop("dow0")
      val tot = dw.agg(sum(col("n_days")).as("n_all"), sum(col("sum_x")).as("sum_all"))
      dw.crossJoin(broadcast(tot))
        .select(col("dow").cast("int").as("dow"), col("n_days"),
          ((col("sum_x") * col("n_all")).cast("double")
            / (col("sum_all") * col("n_days")).cast("double")).as("idx"))
    }
  )
}
