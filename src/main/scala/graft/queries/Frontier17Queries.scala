package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Seventeenth frontier batch: rolling cross-series correlation,
  * Johnson-Lindenstrauss random projection in exact integers, and
  * inclusion-dependency (foreign-key) discovery.
  */
object Frontier17Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A51: rolling 7-day cross-series correlation -----------------------
    // Does purchase revenue track click volume? Daily grain (exact
    // cents / counts), then a 7-row rolling Pearson where all five
    // moments are exact HUGEINT/DECIMAL window sums — the only floats
    // are one final division and one sqrt, with round(6) absorbing the
    // ulp. The rolling windows run over the DAY axis: calendar-bounded
    // (a14/a46 convention), never corpus-bounded. Emitted only where
    // the full 7-day frame exists.
    QueryDef.sql(
      "a51_rolling_corr",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |win AS (
        |  SELECT day, x, y,
        |    row_number() OVER (ORDER BY day) AS rn,
        |    CAST(sum(CAST(x AS HUGEINT)) OVER w AS HUGEINT) AS sx,
        |    CAST(sum(CAST(y AS HUGEINT)) OVER w AS HUGEINT) AS sy,
        |    CAST(sum(CAST(x AS HUGEINT) * x) OVER w AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(y AS HUGEINT) * y) OVER w AS HUGEINT) AS syy,
        |    CAST(sum(CAST(x AS HUGEINT) * y) OVER w AS HUGEINT) AS sxy
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, x AS x_cents, y AS y_clicks,
        |  CASE WHEN (7 * sxx - sx * sx) * (7 * syy - sy * sy) > 0
        |    THEN round(CAST(7 * sxy - sx * sy AS DOUBLE) /
        |      sqrt(CAST(7 * sxx - sx * sx AS DOUBLE) * CAST(7 * syy - sy * sy AS DOUBLE)), 6)
        |    ELSE NULL END AS corr7
        |FROM win WHERE rn >= 7""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(
          sum(when(col("event_type") === "purchase",
            floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"),
          count(when(col("event_type") === "click", 1)).as("y"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      val rnW = Window.orderBy(col("day"))
      val win = daily
        .withColumn("rn", row_number().over(rnW))
        .withColumn("sx", sum(col("x").cast(dec)).over(w))
        .withColumn("sy", sum(col("y").cast(dec)).over(w))
        .withColumn("sxx", sum((col("x").cast(dec) * col("x"))).over(w))
        .withColumn("syy", sum((col("y").cast(dec) * col("y"))).over(w))
        .withColumn("sxy", sum((col("x").cast(dec) * col("y"))).over(w))
      val dx = lit(7) * col("sxx") - col("sx") * col("sx")
      val dy = lit(7) * col("syy") - col("sy") * col("sy")
      val num = lit(7) * col("sxy") - col("sx") * col("sy")
      win.filter(col("rn") >= 7)
        .select(col("day"), col("x").as("x_cents"), col("y").as("y_clicks"),
          when(dx * dy > 0,
            round(num.cast("double") / sqrt(dx.cast("double") * dy.cast("double")), 6))
            .otherwise(lit(null)).as("corr7"))
    },

    // ---- V19: Johnson-Lindenstrauss random projection ----------------------
    // 64 → 16 dims through a pseudo-random ±1 matrix derived from an
    // integer LCG on (i, j) — no random state, no stored matrix, no
    // shuffle: the projection is pure per-row codegen (nested
    // higher-order folds over the quantized vector), identical in both
    // engines because everything is integer arithmetic. The JL
    // distance-preservation property is pinned in the spec; here the
    // oracle hash-checks every projected coordinate exactly.
    QueryDef.sql(
      "v19_random_projection",
      """WITH idx AS (SELECT unnest(generate_series(1, 64)) AS i),
        |jdx AS (SELECT unnest(generate_series(1, 16)) AS j),
        |q AS (
        |  SELECT vec_id, i,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT) AS qi
        |  FROM embeddings CROSS JOIN idx)
        |SELECT vec_id, j,
        |  CAST(SUM(qi * (CASE WHEN ((i * 1103515245 + j * 12345) % 97) % 2 = 0
        |                      THEN 1 ELSE -1 END)) AS BIGINT) AS v_unit
        |FROM q CROSS JOIN jdx
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0d) as bigint))")
            .as("q"))
        .select(col("vec_id"),
          posexplode(expr(
            """transform(sequence(1, 16), j ->
              |  aggregate(
              |    zip_with(q, sequence(1, 64), (qv, i) ->
              |      qv * (case when ((i * 1103515245L + j * 12345L) % 97) % 2 = 0
              |            then 1L else -1L end)),
              |    0L, (acc, x) -> acc + x))""".stripMargin))
            .as(Seq("pos", "v_unit")))
        .select(col("vec_id"), (col("pos") + 1).as("j"), col("v_unit"))
    },

    // ---- U24: inclusion-dependency (FK) discovery --------------------------
    // a28 audits DECLARED foreign keys; this one DISCOVERS them — the
    // schema-profiling pass run on an undocumented warehouse. For each
    // candidate (child.col ⊆ parent.col) pair, distinct child values
    // semi-join the distinct parent key set and the containment
    // fraction decides. Scale shape per pair: one partial-agg distinct
    // on the child column, parent key sets broadcast (dimension-sized);
    // fact→fact candidates would shuffle on the key instead — same
    // algebra. True FKs land at 1.0; decoy pairs report their actual
    // (partial) containment instead of a boolean guess.
    QueryDef.sql(
      "u24_fk_discovery", {
        def pair(childTbl: String, childCol: String, parentTbl: String,
                 parentCol: String): String =
          s"""SELECT '$childTbl.$childCol' AS child_col,
             |  '$parentTbl.$parentCol' AS parent_col,
             |  CAST(count(*) AS BIGINT) AS n_child_distinct,
             |  CAST(count(p.k) AS BIGINT) AS n_contained,
             |  CAST(count(p.k) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS containment
             |FROM (SELECT DISTINCT CAST($childCol AS BIGINT) AS k FROM $childTbl) c
             |LEFT JOIN (SELECT DISTINCT CAST($parentCol AS BIGINT) AS k FROM $parentTbl) p
             |  USING (k)""".stripMargin
        Seq(
          pair("lineitem", "l_partkey", "part", "p_partkey"),
          pair("lineitem", "l_suppkey", "supplier", "s_suppkey"),
          pair("orders", "o_custkey", "customer", "c_custkey"),
          pair("customer", "c_nationkey", "nation", "n_nationkey"),
          pair("customer", "c_nationkey", "region", "r_regionkey"),
          pair("part", "p_size", "nation", "n_nationkey"),
          pair("events", "user_id", "customer", "c_custkey")
        ).mkString("", "\nUNION ALL\n", "")
      }) { (s, d) =>
      def pairDf(child: DataFrame, childName: String, childCol: String,
                 parent: DataFrame, parentName: String, parentCol: String): DataFrame = {
        val c = child.select(col(childCol).cast("long").as("k")).distinct()
        val p = parent.select(col(parentCol).cast("long").as("k")).distinct()
        c.join(broadcast(p.withColumn("hit", lit(1))), Seq("k"), "left")
          .agg(count(lit(1)).as("n_child_distinct"), count(col("hit")).as("n_contained"))
          .select(
            lit(s"$childName.$childCol").as("child_col"),
            lit(s"$parentName.$parentCol").as("parent_col"),
            col("n_child_distinct"), col("n_contained"),
            (col("n_contained").cast("double") / col("n_child_distinct").cast("double"))
              .as("containment"))
      }
      val li = Tables.lineitem(s, d); val pt = Tables.part(s, d)
      val sp = Tables.supplier(s, d); val or = Tables.orders(s, d)
      val cu = Tables.customer(s, d); val na = Tables.nation(s, d)
      val re = Tables.region(s, d); val ev = Tables.events(s, d)
      Seq(
        pairDf(li, "lineitem", "l_partkey", pt, "part", "p_partkey"),
        pairDf(li, "lineitem", "l_suppkey", sp, "supplier", "s_suppkey"),
        pairDf(or, "orders", "o_custkey", cu, "customer", "c_custkey"),
        pairDf(cu, "customer", "c_nationkey", na, "nation", "n_nationkey"),
        pairDf(cu, "customer", "c_nationkey", re, "region", "r_regionkey"),
        pairDf(pt, "part", "p_size", na, "nation", "n_nationkey"),
        pairDf(ev, "events", "user_id", cu, "customer", "c_custkey")
      ).reduce(_.unionByName(_))
    }
  )
}
