package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Ninety-fifth frontier batch: priority sampling, inclusion-dependency
  * mining, value-at-risk with expected shortfall.
  */
object Frontier95Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- C53: priority sampling (Duffield-Lund-Thorup) ------------------------
    // Weighted sampling WITH an unbiased total estimator: each order
    // gets priority q = w·65536 div (h16+1) (w = cents, h16 a 16-bit
    // md5 coin), the k = 64 highest priorities form the sample, the
    // (k+1)-th priority is the threshold τ, and Σ max(w, τ) over the
    // sample estimates the population total. Everything is integer;
    // the row reports the estimate NEXT TO the exact total and the
    // permille error — the audit that justifies replacing a full scan
    // with a 64-row sample.
    QueryDef.sql(
      "c53_priority_sample",
      """WITH o AS (
        |  SELECT o_orderkey, CAST(floor(o_totalprice * 100) AS BIGINT) AS w,
        |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT AS h16
        |  FROM orders),
        |pr AS (
        |  SELECT o_orderkey, w, w * 65536 // (h16 + 1) AS q FROM o),
        |topk AS (
        |  SELECT o_orderkey, w, q,
        |    row_number() OVER (ORDER BY q DESC, o_orderkey) AS rn
        |  FROM pr),
        |tau AS (
        |  SELECT coalesce(max(CASE WHEN rn = 65 THEN q END), 0) AS t
        |  FROM topk WHERE rn <= 65),
        |est AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(greatest(tk.w, ta.t)) AS BIGINT) AS est_total
        |  FROM topk tk CROSS JOIN tau ta WHERE tk.rn <= 64),
        |ex AS (SELECT CAST(sum(w) AS BIGINT) AS exact_total,
        |  CAST(count(*) AS BIGINT) AS n_pop FROM o)
        |SELECT ex.n_pop, est.k, ex.exact_total, est.est_total,
        |  CAST(abs(est.est_total - ex.exact_total) * 1000 // ex.exact_total
        |    AS BIGINT) AS err_permille
        |FROM est CROSS JOIN ex""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), floor(col("o_totalprice") * 100).cast("long").as("w"),
          conv(substring(md5(col("o_orderkey").cast("string")), 1, 4), 16, 10)
            .cast("long").as("h16"))
        .localCheckpoint(true) // sample and exact total read one hashing pass
      val pr = o.select(col("o_orderkey"), col("w"),
        expr("w * 65536 div (h16 + 1)").as("q"))
      val topk = pr.orderBy(col("q").desc, col("o_orderkey")).limit(65)
        .withColumn("rn", row_number().over(Window.orderBy(col("q").desc,
          col("o_orderkey")))) // 65-row bounded window
        .localCheckpoint(true)
      val tau = topk.agg(coalesce(max(when(col("rn") === 65, col("q"))), lit(0L))
        .as("t"))
      val est = topk.filter(col("rn") <= 64)
        .crossJoin(broadcast(tau))
        .agg(count(lit(1)).as("k"),
          sum(greatest(col("w"), col("t"))).cast("long").as("est_total"))
      val ex = o.agg(sum(col("w")).cast("long").as("exact_total"),
        count(lit(1)).as("n_pop"))
      est.crossJoin(broadcast(ex))
        .select(col("n_pop"), col("k"), col("exact_total"), col("est_total"),
          expr("cast(abs(est_total - exact_total) * 1000 div exact_total as bigint)")
            .as("err_permille"))
    },

    // ---- U74: inclusion-dependency (foreign-key) mining -----------------------
    // Schema archaeology on an undocumented lake: for each candidate
    // column pair, how much of the child's distinct value set is
    // CONTAINED in the parent? 1000‰ inclusion nominates a foreign
    // key; the deliberately-reversed pair shows partial containment
    // (not every customer has ordered). Each pair costs two distinct
    // aggregations and one semi-join on pre-deduplicated keys.
    QueryDef.sql(
      "u74_inclusion_mining",
      """WITH pairs AS (
        |  SELECT 'orders.o_custkey' AS child_col, 'customer.c_custkey' AS parent_col,
        |    (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS n_child,
        |    (SELECT CAST(count(*) AS BIGINT) FROM
        |      (SELECT DISTINCT o_custkey FROM orders)
        |      WHERE o_custkey IN (SELECT c_custkey FROM customer)) AS n_in
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey', 'orders.o_orderkey',
        |    (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM
        |      (SELECT DISTINCT l_orderkey FROM lineitem)
        |      WHERE l_orderkey IN (SELECT o_orderkey FROM orders))
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey', 'supplier.s_suppkey',
        |    (SELECT CAST(count(DISTINCT l_suppkey) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM
        |      (SELECT DISTINCT l_suppkey FROM lineitem)
        |      WHERE l_suppkey IN (SELECT s_suppkey FROM supplier))
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey', 'part.p_partkey',
        |    (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem),
        |    (SELECT CAST(count(*) AS BIGINT) FROM
        |      (SELECT DISTINCT l_partkey FROM lineitem)
        |      WHERE l_partkey IN (SELECT p_partkey FROM part))
        |  UNION ALL
        |  SELECT 'customer.c_nationkey', 'nation.n_nationkey',
        |    (SELECT CAST(count(DISTINCT c_nationkey) AS BIGINT) FROM customer),
        |    (SELECT CAST(count(*) AS BIGINT) FROM
        |      (SELECT DISTINCT c_nationkey FROM customer)
        |      WHERE c_nationkey IN (SELECT n_nationkey FROM nation))
        |  UNION ALL
        |  SELECT 'customer.c_custkey', 'orders.o_custkey',
        |    (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer),
        |    (SELECT CAST(count(*) AS BIGINT) FROM
        |      (SELECT DISTINCT c_custkey FROM customer)
        |      WHERE c_custkey IN (SELECT o_custkey FROM orders)))
        |SELECT child_col, parent_col, n_child, n_in,
        |  CAST(n_in * 1000 // n_child AS BIGINT) AS inclusion_permille,
        |  CAST(CASE WHEN n_in = n_child THEN 1 ELSE 0 END AS BIGINT) AS is_fk
        |FROM pairs ORDER BY child_col""".stripMargin) { (s, d) =>
      // r5 opt: one pass per pair — a left join against the distinct
      // parent (itself distinct, so no row multiplication) lets ONE
      // aggregate produce both counts (count(*) = n_child,
      // count(match-marker) = n_in). The old shape checkpointed the
      // child distinct eagerly and ran semi-join + count + crossJoin +
      // broadcast per pair: 6 eager jobs and 4 extra plan branches
      // each, all pure scheduling overhead.
      def pair(childCol: String, parentCol: String,
               child: DataFrame, parent: DataFrame): DataFrame = {
        val cd = child.distinct()
        val pj = parent.distinct().withColumn("__hit", lit(1))
        cd.join(pj, cd.columns.zip(parent.columns)
          .map { case (a, b) => cd(a) === pj(b) }.reduce(_ && _), "left")
          .agg(count(lit(1)).as("n_child"), count(col("__hit")).as("n_in"))
          .select(lit(childCol).as("child_col"), lit(parentCol).as("parent_col"),
            col("n_child"), col("n_in"))
      }
      val rows = Seq(
        pair("orders.o_custkey", "customer.c_custkey",
          Tables.orders(s, d).select(col("o_custkey")),
          Tables.customer(s, d).select(col("c_custkey"))),
        pair("lineitem.l_orderkey", "orders.o_orderkey",
          Tables.lineitem(s, d).select(col("l_orderkey")),
          Tables.orders(s, d).select(col("o_orderkey"))),
        pair("lineitem.l_suppkey", "supplier.s_suppkey",
          Tables.lineitem(s, d).select(col("l_suppkey")),
          Tables.supplier(s, d).select(col("s_suppkey"))),
        pair("lineitem.l_partkey", "part.p_partkey",
          Tables.lineitem(s, d).select(col("l_partkey")),
          Tables.part(s, d).select(col("p_partkey"))),
        pair("customer.c_nationkey", "nation.n_nationkey",
          Tables.customer(s, d).select(col("c_nationkey")),
          Tables.nation(s, d).select(col("n_nationkey"))),
        pair("customer.c_custkey", "orders.o_custkey",
          Tables.customer(s, d).select(col("c_custkey")),
          Tables.orders(s, d).select(col("o_custkey"))))
      rows.reduce(_ unionByName _)
        .select(col("child_col"), col("parent_col"), col("n_child"), col("n_in"),
          expr("cast(n_in * 1000 div n_child as bigint)").as("inclusion_permille"),
          when(col("n_in") === col("n_child"), 1L).otherwise(0L).as("is_fk"))
        .orderBy(col("child_col"))
    },

    // ---- W27: historical VaR and expected shortfall ---------------------------
    // Risk desk arithmetic on the revenue stream: day-over-day revenue
    // deltas (consecutive calendar days only), the 95% value-at-risk
    // as an EXACT order statistic (rank ⌈0.05·n⌉ of the sorted
    // deltas — never interpolation), and expected shortfall as the
    // exact integer mean of the tail at or below it. The ranking
    // window runs over the day-grain table — bounded by the calendar,
    // not the row count.
    QueryDef.sql(
      "w27_var_es",
      """WITH daily AS (
        |  SELECT epoch_us(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP))
        |      // 86400000000 AS day_id,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |delta AS (
        |  SELECT a.day_id, CAST(a.rev - b.rev AS BIGINT) AS dl
        |  FROM daily a JOIN daily b ON b.day_id = a.day_id - 1),
        |rk AS (
        |  SELECT day_id, dl,
        |    row_number() OVER (ORDER BY dl, day_id) AS r,
        |    count(*) OVER () AS n
        |  FROM delta),
        |cut AS (SELECT CAST((5 * max(n) + 99) // 100 AS BIGINT) AS rstar,
        |  CAST(max(n) AS BIGINT) AS n FROM rk)
        |SELECT c.n AS n_days,
        |  CAST(max(CASE WHEN r.r = c.rstar THEN r.dl END) AS BIGINT) AS var95_cents,
        |  CAST(sum(CASE WHEN r.r <= c.rstar THEN r.dl END)
        |    // c.rstar AS BIGINT) AS es_cents,
        |  CAST(min(r.dl) AS BIGINT) AS worst_cents
        |FROM rk r CROSS JOIN cut c
        |GROUP BY c.n, c.rstar""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(expr("unix_micros(cast(cast(o_orderdate as date) as timestamp)) div 86400000000")
          .as("day_id"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).cast("long").as("rev"))
        .localCheckpoint(true) // both sides of the consecutive-day join
      val delta = daily.alias("a")
        .join(daily.select((col("day_id") + 1).as("day_id"), col("rev").as("prev")),
          Seq("day_id"))
        .select(col("day_id"), (col("a.rev") - col("prev")).cast("long").as("dl"))
      // calendar-bounded table (≤ #days rows): the global rank window is
      // bounded by the calendar, never by the fact row count
      val rk = delta
        .withColumn("r", row_number().over(Window.orderBy(col("dl"), col("day_id"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .localCheckpoint(true)
      val cut = rk.agg(expr("cast((5 * max(n) + 99) div 100 as bigint)").as("rstar"),
        max(col("n")).cast("long").as("nn"))
      rk.crossJoin(broadcast(cut))
        .groupBy(col("nn"), col("rstar"))
        .agg(max(when(col("r") === col("rstar"), col("dl"))).cast("long")
          .as("var95_cents"),
          expr("cast(sum(CASE WHEN r <= rstar THEN dl END) div rstar as bigint)")
            .as("es_cents"),
          min(col("dl")).cast("long").as("worst_cents"))
        .select(col("nn").as("n_days"), col("var95_cents"), col("es_cents"),
          col("worst_cents"))
    }
  )
}
