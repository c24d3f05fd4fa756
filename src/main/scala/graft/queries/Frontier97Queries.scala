package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.ShardedRank

/** Ninety-seventh frontier batch: regression-to-the-mean quantifier,
  * join fan-out audit, second-price auction comparison.
  */
object Frontier97Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A150: regression-to-the-mean quantifier ------------------------------
    // The illusion every "top performers got worse" dashboard sells:
    // rank users by FIRST-half activity (ShardedRank — the global
    // ranking shape that survives web-scale user tables), take the top
    // decile, and compare their second-half activity to everyone
    // else's. The rtm_permille column (period-2 as permille of
    // period-1) quantifies the pull toward the mean that selection on
    // noise guarantees — before anyone credits an intervention.
    QueryDef.sql(
      "a150_regression_to_mean",
      """WITH bounds AS (
        |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN epoch_us(ts) < b.mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS p1,
        |    CAST(sum(CASE WHEN epoch_us(ts) >= b.mid THEN 1 ELSE 0 END) AS BIGINT)
        |      AS p2
        |  FROM events CROSS JOIN bounds b
        |  GROUP BY user_id HAVING sum(CASE WHEN epoch_us(ts) < b.mid THEN 1
        |    ELSE 0 END) >= 1),
        |rk AS (
        |  SELECT user_id, p1, p2,
        |    row_number() OVER (ORDER BY p1 DESC, user_id) AS r,
        |    count(*) OVER () AS n
        |  FROM u),
        |grp AS (
        |  SELECT CASE WHEN r * 10 <= n THEN 'top_decile' ELSE 'rest' END AS grp,
        |    p1, p2
        |  FROM rk),
        |all_ AS (SELECT 'all' AS grp, p1, p2 FROM u)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(p1) * 1000 // count(*) AS BIGINT) AS p1_mean_milli,
        |  CAST(sum(p2) * 1000 // count(*) AS BIGINT) AS p2_mean_milli,
        |  CAST(sum(p2) * 1000 // sum(p1) AS BIGINT) AS rtm_permille
        |FROM (SELECT * FROM grp UNION ALL SELECT * FROM all_)
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val bounds = Tables.events(s, d)
        .agg(expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("mid"))
      val u = Tables.events(s, d)
        .crossJoin(broadcast(bounds))
        .groupBy(col("user_id"))
        .agg(sum(when(expr("unix_micros(ts)") < col("mid"), 1).otherwise(0))
          .cast("long").as("p1"),
          sum(when(expr("unix_micros(ts)") >= col("mid"), 1).otherwise(0))
            .cast("long").as("p2"))
        .filter(col("p1") >= 1)
        .localCheckpoint(true) // ranking, groups, and the 'all' row read it
      val nn = u.agg(count(lit(1)).as("n"))
      val rk = ShardedRank.withRank(u, "r", col("p1").desc, col("user_id"))
      val grp = rk.crossJoin(broadcast(nn))
        .select(when(col("r") * 10 <= col("n"), "top_decile").otherwise("rest")
          .as("grp"), col("p1"), col("p2"))
      val allRows = u.select(lit("all").as("grp"), col("p1"), col("p2"))
      grp.unionByName(allRows)
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_users"),
          expr("cast(sum(p1) * 1000 div count(1) as bigint)").as("p1_mean_milli"),
          expr("cast(sum(p2) * 1000 div count(1) as bigint)").as("p2_mean_milli"),
          expr("cast(sum(p2) * 1000 div sum(p1) as bigint)").as("rtm_permille"))
        .orderBy(col("grp"))
    },

    // ---- J18: join fan-out audit ----------------------------------------------
    // The silent killer of dashboards: joining a header total through
    // a 1:N child table multiplies it. For three production joins the
    // audit reports the measured fan-out factor AND the damage — the
    // header-total summed naively through the join beside the true
    // total, with inflation in permille. The N:1 dimension joins
    // certify at exactly 1000‰; the 1:N join shows what the innocent
    // SUM actually returned.
    QueryDef.sql(
      "j18_join_fanout_audit",
      """WITH t1 AS (
        |  SELECT 'orders_x_lineitem' AS join_name,
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders) AS rows_left,
        |    CAST(count(*) AS BIGINT) AS rows_out,
        |    CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS naive_cents,
        |    (SELECT CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |     FROM orders) AS true_cents
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |t2 AS (
        |  SELECT 'orders_x_customer',
        |    (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT),
        |    (SELECT CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |     FROM orders)
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |t3 AS (
        |  SELECT 'lineitem_x_part',
        |    (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |    CAST(count(*) AS BIGINT),
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT),
        |    (SELECT CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |     FROM lineitem)
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        |SELECT join_name, rows_left, rows_out,
        |  CAST(rows_out * 1000 // rows_left AS BIGINT) AS fanout_milli,
        |  naive_cents, true_cents,
        |  CAST(naive_cents * 1000 // true_cents AS BIGINT) AS inflation_permille
        |FROM (SELECT * FROM t1 UNION ALL SELECT * FROM t2 UNION ALL
        |      SELECT * FROM t3)
        |ORDER BY join_name""".stripMargin) { (s, d) =>
      def audit(name: String, left: DataFrame, joined: DataFrame,
                naive: org.apache.spark.sql.Column, trueSum: DataFrame): DataFrame = {
        val l = left.agg(count(lit(1)).as("rows_left"))
        val j = joined.agg(count(lit(1)).as("rows_out"),
          sum(naive).cast("long").as("naive_cents"))
        l.crossJoin(broadcast(j)).crossJoin(broadcast(trueSum))
          .select(lit(name).as("join_name"), col("rows_left"), col("rows_out"),
            col("naive_cents"), col("true_cents"))
      }
      val oCents = floor(col("o_totalprice") * 100).cast("long")
      val lCents = floor(col("l_extendedprice") * 100).cast("long")
      val oTrue = Tables.orders(s, d).agg(sum(oCents).cast("long").as("true_cents"))
        .localCheckpoint(true)
      val lTrue = Tables.lineitem(s, d).agg(sum(lCents).cast("long").as("true_cents"))
      val t1 = audit("orders_x_lineitem", Tables.orders(s, d),
        Tables.orders(s, d).join(Tables.lineitem(s, d)
          .select(col("l_orderkey")), col("l_orderkey") === col("o_orderkey")),
        oCents, oTrue)
      val t2 = audit("orders_x_customer", Tables.orders(s, d),
        Tables.orders(s, d).join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"))), col("o_custkey") === col("c_custkey")),
        oCents, oTrue)
      val t3 = audit("lineitem_x_part", Tables.lineitem(s, d),
        Tables.lineitem(s, d).join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey")),
        lCents, lTrue)
      t1.unionByName(t2).unionByName(t3)
        .select(col("join_name"), col("rows_left"), col("rows_out"),
          expr("cast(rows_out * 1000 div rows_left as bigint)").as("fanout_milli"),
          col("naive_cents"), col("true_cents"),
          expr("cast(naive_cents * 1000 div true_cents as bigint)")
            .as("inflation_permille"))
        .orderBy(col("join_name"))
    },

    // ---- A151: second-price auction revenue comparison ------------------------
    // Mechanism design on the order book: treat each part's line items
    // as sealed bids; a first-price auction collects the top bid, a
    // Vickrey (second-price) auction collects the runner-up. Per-part
    // top-2 comes from one bounded window; the per-brand ledger shows
    // the revenue the incentive-compatible mechanism gives up — the
    // discount_permille an ads-infrastructure team quotes.
    QueryDef.sql(
      "a151_second_price",
      """WITH bids AS (
        |  SELECT l.l_partkey, p.p_brand,
        |    CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS bid,
        |    l.l_orderkey, l.l_linenumber
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |top2 AS (
        |  SELECT l_partkey, p_brand, bid, rn FROM (
        |    SELECT l_partkey, p_brand, bid,
        |      row_number() OVER (PARTITION BY l_partkey
        |        ORDER BY bid DESC, l_orderkey, l_linenumber) AS rn
        |    FROM bids) WHERE rn <= 2),
        |auc AS (
        |  SELECT l_partkey, p_brand,
        |    max(CASE WHEN rn = 1 THEN bid END) AS first_p,
        |    max(CASE WHEN rn = 2 THEN bid END) AS second_p
        |  FROM top2 GROUP BY 1, 2
        |  HAVING max(CASE WHEN rn = 2 THEN bid END) IS NOT NULL)
        |SELECT p_brand, CAST(count(*) AS BIGINT) AS n_auctions,
        |  CAST(sum(first_p) AS BIGINT) AS first_price_cents,
        |  CAST(sum(second_p) AS BIGINT) AS second_price_cents,
        |  CAST((sum(first_p) - sum(second_p)) * 1000 // sum(first_p) AS BIGINT)
        |    AS discount_permille
        |FROM auc GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val bids = Tables.lineitem(s, d)
        .select(col("l_partkey"), floor(col("l_extendedprice") * 100).cast("long")
          .as("bid"), col("l_orderkey"), col("l_linenumber"))
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      val top2 = bids
        .withColumn("rn", row_number().over(Window.partitionBy(col("l_partkey"))
          .orderBy(col("bid").desc, col("l_orderkey"), col("l_linenumber"))))
        .filter(col("rn") <= 2)
      val auc = top2.groupBy(col("l_partkey"), col("p_brand"))
        .agg(max(when(col("rn") === 1, col("bid"))).as("first_p"),
          max(when(col("rn") === 2, col("bid"))).as("second_p"))
        .filter(col("second_p").isNotNull)
      auc.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_auctions"),
          sum(col("first_p")).cast("long").as("first_price_cents"),
          sum(col("second_p")).cast("long").as("second_price_cents"))
        .select(col("p_brand"), col("n_auctions"), col("first_price_cents"),
          col("second_price_cents"),
          expr("""cast((first_price_cents - second_price_cents) * 1000
            div first_price_cents as bigint)""").as("discount_permille"))
        .orderBy(col("p_brand"))
    }
  )
}
