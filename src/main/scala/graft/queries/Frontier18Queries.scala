package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Eighteenth frontier batch: level-3 frequent itemsets, power-law
  * degree diagnostics, and corpus-comparative distinctive terms.
  */
object Frontier18Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A53: frequent triple itemsets (Apriori level 3) -------------------
    // a19 stops at pairs; the level-3 pass enumerates per-order item
    // triples (a<b<c — each triple exactly once) through two
    // basket-bounded self-joins, floors support at 2, and scores
    // triple lift sup·N²/(n_a·n_b·n_c) — one double division, round 6.
    // Enumeration cost is C(basket,3) per order — bounded by basket
    // size, linear in orders, never corpus-quadratic; for pathological
    // basket sizes the Apriori prune (restrict to frequent-pair
    // members before enumeration) composes in front of the same plan.
    QueryDef.sql(
      "a53_triple_itemsets",
      """WITH basket AS (
        |  SELECT DISTINCT l_orderkey AS o, l_partkey AS item FROM lineitem),
        |item_n AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM basket GROUP BY 1),
        |tot AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM basket),
        |tri AS (
        |  SELECT b1.item AS a, b2.item AS b, b3.item AS c,
        |    CAST(count(*) AS BIGINT) AS support
        |  FROM basket b1
        |  JOIN basket b2 ON b1.o = b2.o AND b1.item < b2.item
        |  JOIN basket b3 ON b2.o = b3.o AND b2.item < b3.item
        |  GROUP BY 1, 2, 3 HAVING count(*) >= 2)
        |SELECT t.a, t.b, t.c, t.support,
        |  round(CAST(t.support AS DOUBLE) * CAST(n_orders AS DOUBLE)
        |      * CAST(n_orders AS DOUBLE)
        |    / (CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE) * CAST(nc.n AS DOUBLE)), 6)
        |    AS lift
        |FROM tri t
        |JOIN item_n na ON na.item = t.a
        |JOIN item_n nb ON nb.item = t.b
        |JOIN item_n nc ON nc.item = t.c
        |CROSS JOIN tot""".stripMargin) { (s, d) =>
      val basket = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("item"))
        .distinct()
      val itemN = basket.groupBy(col("item")).agg(count(lit(1)).as("n"))
      val tot = basket.agg(countDistinct(col("o")).as("n_orders"))
      // r6 opt: aggregate-before-join (PairGraph's discipline, triple
      // variant) — the two chained basket self-joins on the order key
      // (4 exchanges + 2 SMJs) become ONE exchange collecting each
      // order's sorted item set and a C(n,3) ordered-triple explode;
      // a < b < c from the sort, same (order, triple) multiset.
      val tri = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("item"))
        .groupBy(col("o")).agg(sort_array(collect_set(col("item"))).as("items"))
        .select(explode(expr(
          "flatten(flatten(transform(items, (x, i) -> " +
            "transform(slice(items, i + 2, size(items)), (y, j) -> " +
            "transform(slice(items, i + j + 3, size(items)), " +
            "z -> named_struct('a', x, 'b', y, 'c', z))))))")).as("t"))
        .groupBy(col("t.a").as("a"), col("t.b").as("b"), col("t.c").as("c"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
      tri
        .join(itemN.select(col("item").as("a"), col("n").as("na")), Seq("a"))
        .join(itemN.select(col("item").as("b"), col("n").as("nb")), Seq("b"))
        .join(itemN.select(col("item").as("c"), col("n").as("nc")), Seq("c"))
        .crossJoin(broadcast(tot))
        .select(col("a"), col("b"), col("c"), col("support"),
          round(col("support").cast("double") * col("n_orders").cast("double")
              * col("n_orders").cast("double")
            / (col("na").cast("double") * col("nb").cast("double")
              * col("nc").cast("double")), 6).as("lift"))
    },

    // ---- A54: power-law degree diagnostics ---------------------------------
    // Is the co-purchase graph heavy-tailed? Part degrees (distinct
    // customers per part) roll up into a degree histogram with exact
    // CCDF shares, plus the continuous-MLE exponent
    // alpha = 1 + n / Σ ln(d / 0.5) (d_min = 1) computed the t21 way:
    // per-degree ln rounded to 8 dp (absorbs libm ulp), summed
    // DECIMAL-exact, ONE final division, round 6. The CCDF window runs
    // over the DEGREE grain — bounded by distinct degree values, not
    // by nodes.
    QueryDef.sql(
      "a54_degree_powerlaw",
      """WITH e AS (
        |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |deg AS (SELECT p, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
        |hist AS (SELECT d, CAST(count(*) AS BIGINT) AS n_nodes FROM deg GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_nodes) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(ln(CAST(d AS DOUBLE) / 0.5), 8) AS DECIMAL(28,8))
        |      * n_nodes) AS DECIMAL(38,8)) AS lnsum
        |  FROM hist),
        |ccdf AS (
        |  SELECT d, n_nodes,
        |    CAST(sum(n_nodes) OVER (ORDER BY d DESC) AS BIGINT) AS n_at_least
        |  FROM hist)
        |SELECT c.d AS degree, c.n_nodes,
        |  CAST(c.n_at_least AS DOUBLE) / CAST(t.n AS DOUBLE) AS ccdf,
        |  round(1.0 + CAST(t.n AS DOUBLE) / CAST(t.lnsum AS DOUBLE), 6) AS alpha
        |FROM ccdf c CROSS JOIN tot t""".stripMargin) { (s, d) =>
      val deg = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
        .groupBy(col("p")).agg(count(lit(1)).as("d"))
      val hist = deg.groupBy(col("d")).agg(count(lit(1)).as("n_nodes"))
      val tot = hist.agg(
        sum(col("n_nodes")).as("n"),
        sum(round(log(col("d").cast("double") / 0.5), 8).cast(DecimalType(28, 8))
          * col("n_nodes")).as("lnsum"))
      val wD = Window.orderBy(col("d").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.withColumn("n_at_least", sum(col("n_nodes")).over(wD))
        .crossJoin(broadcast(tot))
        .select(col("d").as("degree"), col("n_nodes"),
          (col("n_at_least").cast("double") / col("n").cast("double")).as("ccdf"),
          round(lit(1.0) + col("n").cast("double") / col("lnsum").cast("double"), 6)
            .as("alpha"))
    },

    // ---- T37: distinctive terms per source ---------------------------------
    // Which vocabulary characterizes each source? Corpus-comparative
    // lift (c_s/T_s)/(c/T) = c_s·T/(c·T_s) — all counts exact
    // integers, ONE double division, round 6 BEFORE ranking so both
    // engines order ties identically; top-5 per source via the
    // partitioned rank (WindowGroupLimit ships only candidate rows).
    // The c_s ≥ 5 floor prunes the long tail before the join; term
    // totals join by shuffle (web-scale vocab doesn't broadcast — the
    // t23 posture).
    QueryDef.sql(
      "t37_distinctive_terms",
      """WITH tok AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |src_term AS (
        |  SELECT source, term, CAST(count(*) AS BIGINT) AS c_s
        |  FROM tok GROUP BY 1, 2 HAVING count(*) >= 5),
        |src_tot AS (SELECT source, CAST(count(*) AS BIGINT) AS t_s FROM tok GROUP BY 1),
        |term_tot AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tok),
        |scored AS (
        |  SELECT st.source, st.term, st.c_s,
        |    round(CAST(st.c_s AS DOUBLE) * CAST(t AS DOUBLE)
        |      / (CAST(tt.c AS DOUBLE) * CAST(so.t_s AS DOUBLE)), 6) AS lift
        |  FROM src_term st
        |  JOIN term_tot tt USING (term)
        |  JOIN src_tot so USING (source)
        |  CROSS JOIN tot),
        |ranked AS (
        |  SELECT source, term, c_s, lift,
        |    row_number() OVER (PARTITION BY source ORDER BY lift DESC, term) AS rk
        |  FROM scored)
        |SELECT source, term, c_s, lift, rk
        |FROM ranked WHERE rk <= 5""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("source"),
          explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("term"))
      val srcTerm = tok.groupBy(col("source"), col("term"))
        .agg(count(lit(1)).as("c_s")).filter(col("c_s") >= 5)
      val srcTot = tok.groupBy(col("source")).agg(count(lit(1)).as("t_s"))
      val termTot = tok.groupBy(col("term")).agg(count(lit(1)).as("c"))
      val tot = tok.agg(count(lit(1)).as("t"))
      val scored = srcTerm
        .join(termTot, Seq("term"))
        .join(broadcast(srcTot), Seq("source"))
        .crossJoin(broadcast(tot))
        .select(col("source"), col("term"), col("c_s"),
          round(col("c_s").cast("double") * col("t").cast("double")
            / (col("c").cast("double") * col("t_s").cast("double")), 6).as("lift"))
      val wS = Window.partitionBy(col("source"))
        .orderBy(col("lift").desc, col("term"))
      scored.withColumn("rk", row_number().over(wS)).filter(col("rk") <= 5)
    }
  )
}
