package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Hundred-thirteenth frontier batch: the exact integer square root
  * (floor(sqrt(double)) + a ±2 ladder of integer corrections — identical
  * in both engines because IEEE sqrt is correctly rounded and the error
  * budget is < 2 ulps for inputs below 1e21) unlocks the sqrt-needing
  * statistics that were previously off-limits under the hash gate:
  * Matthews correlation and friends over a real confusion matrix, and
  * p-chart control limits with per-period sample sizes. Plus an
  * external-sort pass planner pricing spill I/O from real table bytes.
  */
object Frontier113Queries {

  /** Exact integer sqrt of a non-negative DECIMAL(38,0)/BIGINT column
    * named `v`, given `s0` = floor(sqrt(cast(v as double))). The ±2
    * correction ladder is exact while |sqrt error| < 2, which holds for
    * v < ~1e21 (double rep error of v maps to < 1 ulp of sqrt(v)). */
  private def isqrtExpr(v: String, s0: String): Column = expr(
    s"""$s0 + CASE
       |  WHEN cast($s0 + 2 as decimal(38,0)) * cast($s0 + 2 as decimal(38,0)) <= $v THEN 2
       |  WHEN cast($s0 + 1 as decimal(38,0)) * cast($s0 + 1 as decimal(38,0)) <= $v THEN 1
       |  WHEN cast($s0 as decimal(38,0)) * cast($s0 as decimal(38,0)) <= $v THEN 0
       |  WHEN cast($s0 - 1 as decimal(38,0)) * cast($s0 - 1 as decimal(38,0)) <= $v THEN -1
       |  ELSE -2 END""".stripMargin)

  /** The same correction ladder in DuckDB dialect (HUGEINT). */
  private def isqrtSql(v: String, s0: String): String =
    s"""$s0 + CASE
       |    WHEN CAST($s0 + 2 AS HUGEINT) * CAST($s0 + 2 AS HUGEINT) <= $v THEN 2
       |    WHEN CAST($s0 + 1 AS HUGEINT) * CAST($s0 + 1 AS HUGEINT) <= $v THEN 1
       |    WHEN CAST($s0 AS HUGEINT) * CAST($s0 AS HUGEINT) <= $v THEN 0
       |    WHEN CAST($s0 - 1 AS HUGEINT) * CAST($s0 - 1 AS HUGEINT) <= $v THEN -1
       |    ELSE -2 END""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- A180: confusion-matrix suite with exact-isqrt Matthews corr ----------
    // Binary classifier audit per market segment: pred = high-ticket
    // order (totalprice > 250k, ~the median), truth = urgent/high
    // priority. Precision/recall/F1/balanced-accuracy/Youden-J are pure
    // rationals in permille; MCC's sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN))
    // — a product up to ~5e20, HUGEINT/DECIMAL territory — goes through
    // the exact isqrt, so the one metric that "needs a float sqrt" is
    // bit-reproducible. One shuffle (the groupBy); the join broadcasts
    // customer at gate scale and hash-shuffles at 100 TB.
    QueryDef.sql(
      "a180_confusion_suite",
      s"""WITH j AS (
        |  SELECT c.c_mktsegment AS seg,
        |    CASE WHEN o.o_totalprice > 250000.0 THEN 1 ELSE 0 END AS pred,
        |    CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS truth
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |cm AS (
        |  SELECT seg,
        |    CAST(count(*) FILTER (WHERE pred = 1 AND truth = 1) AS BIGINT) AS tp,
        |    CAST(count(*) FILTER (WHERE pred = 1 AND truth = 0) AS BIGINT) AS fp,
        |    CAST(count(*) FILTER (WHERE pred = 0 AND truth = 1) AS BIGINT) AS fn,
        |    CAST(count(*) FILTER (WHERE pred = 0 AND truth = 0) AS BIGINT) AS tn
        |  FROM j GROUP BY 1),
        |d AS (
        |  SELECT seg, tp, fp, fn, tn,
        |    CAST(tp + fp AS HUGEINT) * CAST(tp + fn AS HUGEINT)
        |      * CAST(tn + fp AS HUGEINT) * CAST(tn + fn AS HUGEINT) AS den2
        |  FROM cm),
        |r AS (
        |  SELECT *, CAST(floor(sqrt(CAST(den2 AS DOUBLE))) AS BIGINT) AS s0
        |  FROM d),
        |s AS (SELECT *, ${isqrtSql("den2", "s0")} AS isq FROM r)
        |SELECT seg, tp, fp, fn, tn,
        |  CAST(tp * 1000 // greatest(tp + fp, 1) AS BIGINT) AS precision_permille,
        |  CAST(tp * 1000 // greatest(tp + fn, 1) AS BIGINT) AS recall_permille,
        |  CAST(2000 * tp // greatest(2 * tp + fp + fn, 1) AS BIGINT) AS f1_permille,
        |  CAST((tp * (tn + fp) + tn * (tp + fn)) * 500
        |    // greatest((tp + fn) * (tn + fp), 1) AS BIGINT) AS bal_acc_permille,
        |  CAST((tp * (tn + fp) + tn * (tp + fn)) * 1000
        |    // greatest((tp + fn) * (tn + fp), 1) - 1000 AS BIGINT) AS youden_permille,
        |  CAST(CASE WHEN den2 = 0 THEN 0
        |    ELSE (tp * tn - fp * fn) * 1000 // greatest(isq, 1) END AS BIGINT)
        |    AS mcc_permille
        |FROM s ORDER BY seg""".stripMargin) { (s, d) =>
      val j = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          when(col("o_totalprice") > 250000.0, 1).otherwise(0).as("pred"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0).as("truth"))
      val cm = j.groupBy(col("seg")).agg(
        count(when(col("pred") === 1 && col("truth") === 1, 1)).cast("long").as("tp"),
        count(when(col("pred") === 1 && col("truth") === 0, 1)).cast("long").as("fp"),
        count(when(col("pred") === 0 && col("truth") === 1, 1)).cast("long").as("fn"),
        count(when(col("pred") === 0 && col("truth") === 0, 1)).cast("long").as("tn"))
      val den = cm.withColumn("den2",
        expr("cast(tp + fp as decimal(19,0)) * cast(tp + fn as decimal(19,0))" +
          " * cast(tn + fp as decimal(19,0)) * cast(tn + fn as decimal(19,0))"))
        .withColumn("s0", floor(sqrt(col("den2").cast("double"))).cast("long"))
        .withColumn("isq", isqrtExpr("den2", "s0"))
      den.select(col("seg"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("tp * 1000 div greatest(tp + fp, 1)").cast("long")
          .as("precision_permille"),
        expr("tp * 1000 div greatest(tp + fn, 1)").cast("long")
          .as("recall_permille"),
        expr("2000 * tp div greatest(2 * tp + fp + fn, 1)").cast("long")
          .as("f1_permille"),
        expr("(tp * (tn + fp) + tn * (tp + fn)) * 500" +
          " div greatest((tp + fn) * (tn + fp), 1)").cast("long")
          .as("bal_acc_permille"),
        expr("(tp * (tn + fp) + tn * (tp + fn)) * 1000" +
          " div greatest((tp + fn) * (tn + fp), 1) - 1000").cast("long")
          .as("youden_permille"),
        expr("case when den2 = 0 then 0" +
          " else (tp * tn - fp * fn) * 1000 div greatest(isq, 1) end")
          .cast("long").as("mcc_permille"))
        .orderBy(col("seg"))
    },

    // ---- W33: p-chart SPC with variable-n exact control limits ----------------
    // Monthly defect proportion (returned lineitems) against 3-sigma
    // p-chart limits p̄ ± 3·sqrt(p̄(1-p̄)/n_t). The out-of-control flag
    // never touches a sqrt: cross-multiplying by n_t²N² turns the test
    // into (d_t·N - D·n_t)² > 9·D·(N-D)·n_t, exact in HUGEINT/DECIMAL.
    // The displayed band width uses the exact isqrt. Two aggregations
    // and a broadcast of the one-row global — no extra shuffle.
    QueryDef.sql(
      "w33_pchart_spc",
      s"""WITH m AS (
        |  SELECT strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS ym,
        |    CAST(count(*) AS BIGINT) AS n_t,
        |    CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS d_t
        |  FROM lineitem GROUP BY 1),
        |g AS (
        |  SELECT CAST(sum(n_t) AS BIGINT) AS nn, CAST(sum(d_t) AS BIGINT) AS dd
        |  FROM m),
        |x AS (
        |  SELECT m.ym, m.n_t, m.d_t, g.nn, g.dd,
        |    CAST(g.dd AS HUGEINT) * (g.nn - g.dd) * m.n_t AS v
        |  FROM m CROSS JOIN g),
        |r AS (
        |  SELECT *, CAST(floor(sqrt(CAST(v AS DOUBLE))) AS BIGINT) AS s0
        |  FROM x),
        |s AS (SELECT *, ${isqrtSql("v", "s0")} AS isq FROM r)
        |SELECT ym, n_t, d_t,
        |  CAST(d_t * 1000 // n_t AS BIGINT) AS p_permille,
        |  CAST(dd * 1000 // nn AS BIGINT) AS center_permille,
        |  CAST(3000 * isq // (nn * n_t) AS BIGINT) AS band_permille,
        |  CAST(CASE WHEN CAST(d_t * nn - dd * n_t AS HUGEINT)
        |      * CAST(d_t * nn - dd * n_t AS HUGEINT)
        |      > 9 * CAST(dd AS HUGEINT) * (nn - dd) * n_t
        |    THEN 1 ELSE 0 END AS INT) AS out_of_control
        |FROM s ORDER BY ym""".stripMargin) { (s, d) =>
      val m = Tables.lineitem(s, d)
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ym"))
        .agg(count(lit(1)).cast("long").as("n_t"),
          count(when(col("l_returnflag") === "R", 1)).cast("long").as("d_t"))
      val g = m.agg(sum(col("n_t")).cast("long").as("nn"),
        sum(col("d_t")).cast("long").as("dd"))
      val x = m.crossJoin(broadcast(g))
        .withColumn("v", expr("cast(dd as decimal(38,0)) * (nn - dd) * n_t"))
        .withColumn("s0", floor(sqrt(col("v").cast("double"))).cast("long"))
        .withColumn("isq", isqrtExpr("v", "s0"))
      x.select(col("ym"), col("n_t"), col("d_t"),
        expr("d_t * 1000 div n_t").cast("long").as("p_permille"),
        expr("dd * 1000 div nn").cast("long").as("center_permille"),
        expr("3000 * isq div (nn * n_t)").cast("long").as("band_permille"),
        expr("case when cast(d_t * nn - dd * n_t as decimal(38,0))" +
          " * cast(d_t * nn - dd * n_t as decimal(38,0))" +
          " > 9 * cast(dd as decimal(38,0)) * (nn - dd) * n_t" +
          " then 1 else 0 end").cast("int").as("out_of_control"))
        .orderBy(col("ym"))
    },

    // ---- U86: external-sort pass planner --------------------------------------
    // Prices a full sort of each base table under six (memory budget,
    // merge fan-in) scenarios from REAL byte estimates (fixed column
    // widths + measured varchar lengths): initial runs = ceil(B/M),
    // merge passes = min k with F^k >= runs (log-free — F is a power of
    // two, so F^k is a shift, and k comes off a 12-row grid join), and
    // spill I/O = 2B(1+passes) read+write vs a single streamed read
    // when the table fits. The same arithmetic sizes a Spark
    // spark.sql.shuffle.partitions / executor-memory trade at 100 TB.
    QueryDef.sql(
      "u86_sort_pass_planner",
      """WITH sizes AS (
        |  SELECT 'lineitem' AS tbl, CAST(count(*) * 88
        |    + sum(length(l_returnflag) + length(l_linestatus)) AS BIGINT) AS bytes
        |  FROM lineitem
        |  UNION ALL SELECT 'orders', CAST(count(*) * 40
        |    + sum(length(o_orderstatus) + length(o_orderpriority)) AS BIGINT)
        |  FROM orders
        |  UNION ALL SELECT 'customer', CAST(count(*) * 32
        |    + sum(length(c_name) + length(c_mktsegment)) AS BIGINT) FROM customer
        |  UNION ALL SELECT 'part', CAST(count(*) * 32
        |    + sum(length(p_name) + length(p_brand) + length(p_type)) AS BIGINT)
        |  FROM part
        |  UNION ALL SELECT 'supplier', CAST(count(*) * 24
        |    + sum(length(s_name)) AS BIGINT) FROM supplier),
        |scen AS (
        |  SELECT CAST(m.mem AS BIGINT) AS mem_bytes, f.fbits,
        |    CAST(1 AS BIGINT) << f.fbits AS fanin
        |  FROM (SELECT unnest([8388608, 67108864, 1073741824]) AS mem) m
        |  CROSS JOIN (SELECT unnest([3, 5]) AS fbits) f),
        |base AS (
        |  SELECT s.tbl, s.bytes, c.mem_bytes, c.fanin, c.fbits,
        |    CAST((s.bytes + c.mem_bytes - 1) // c.mem_bytes AS BIGINT) AS runs0
        |  FROM sizes s CROSS JOIN scen c),
        |mp AS (
        |  SELECT b.tbl, b.mem_bytes, b.fanin,
        |    CAST(min(k.k) AS BIGINT) AS merge_passes
        |  FROM base b
        |  JOIN (SELECT unnest(generate_series(1, 12)) AS k) k
        |    ON (CAST(1 AS BIGINT) << (b.fbits * k.k)) >= b.runs0
        |  WHERE b.runs0 > 1 GROUP BY 1, 2, 3)
        |SELECT b.tbl, b.mem_bytes, b.fanin, b.bytes, b.runs0,
        |  coalesce(m.merge_passes, 0) AS merge_passes,
        |  CAST(CASE WHEN b.runs0 <= 1 THEN b.bytes
        |    ELSE 2 * b.bytes * (1 + m.merge_passes) END AS BIGINT) AS io_bytes
        |FROM base b LEFT JOIN mp m
        |  ON m.tbl = b.tbl AND m.mem_bytes = b.mem_bytes AND m.fanin = b.fanin
        |ORDER BY b.tbl, b.mem_bytes, b.fanin""".stripMargin) { (s, d) =>
      def sized(df: DataFrame, tbl: String, fixed: Int, strs: Seq[String]) =
        df.agg((count(lit(1)) * fixed +
          sum(strs.map(c => length(col(c))).reduce(_ + _))).cast("long")
          .as("bytes"))
          .select(lit(tbl).as("tbl"), col("bytes"))
      val sizes = sized(Tables.lineitem(s, d), "lineitem", 88,
        Seq("l_returnflag", "l_linestatus"))
        .unionByName(sized(Tables.orders(s, d), "orders", 40,
          Seq("o_orderstatus", "o_orderpriority")))
        .unionByName(sized(Tables.customer(s, d), "customer", 32,
          Seq("c_name", "c_mktsegment")))
        .unionByName(sized(Tables.part(s, d), "part", 32,
          Seq("p_name", "p_brand", "p_type")))
        .unionByName(sized(Tables.supplier(s, d), "supplier", 24,
          Seq("s_name")))
      val mems = s.createDataFrame(Seq(
        Tuple1(8388608L), Tuple1(67108864L), Tuple1(1073741824L)))
        .toDF("mem_bytes")
      val fbs = s.createDataFrame(Seq(Tuple1(3), Tuple1(5))).toDF("fbits")
      val scen = mems.crossJoin(fbs)
        .withColumn("fanin", expr("cast(1 as bigint) << fbits"))
      val base = sizes.crossJoin(broadcast(scen))
        .withColumn("runs0", expr("(bytes + mem_bytes - 1) div mem_bytes"))
      val kgrid = s.range(1, 13).select(col("id").cast("int").as("k"))
      val mp = base.filter(col("runs0") > 1)
        .join(broadcast(kgrid),
          expr("(cast(1 as bigint) << (fbits * k)) >= runs0"))
        .groupBy(col("tbl"), col("mem_bytes"), col("fanin"))
        .agg(min(col("k")).cast("long").as("merge_passes"))
      base.join(mp, Seq("tbl", "mem_bytes", "fanin"), "left")
        .select(col("tbl"), col("mem_bytes"), col("fanin"), col("bytes"),
          col("runs0"),
          coalesce(col("merge_passes"), lit(0L)).as("merge_passes"),
          expr("cast(case when runs0 <= 1 then bytes" +
            " else 2 * bytes * (1 + merge_passes) end as bigint)")
            .as("io_bytes"))
        .orderBy(col("tbl"), col("mem_bytes"), col("fanin"))
    }
  )
}
