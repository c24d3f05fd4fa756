package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Sixty-second frontier batch: native pivot heatmap, matryoshka
  * retrieval-quality curve, TOST equivalence test.
  */
object Frontier62Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- W18: calendar heatmap via the native pivot operator ----------------
    // The reshaping sibling of u41's unpivot: RelationalGroupedDataset
    // .pivot with an EXPLICIT value list (the at-scale discipline — an
    // unlisted pivot runs a blocking distinct scan to discover columns
    // first), producing the day-of-week × hour-bucket activity matrix
    // every ops dashboard draws. One aggregate; the pivot is partial-
    // aggregated map-side like any groupBy.
    QueryDef.sql(
      "w18_pivot_heatmap", {
        val cols = (0 until 24 by 4).map(h =>
          s"CAST(coalesce(sum(CASE WHEN hour(ts) >= $h AND hour(ts) < ${h + 4} " +
            s"THEN 1 ELSE 0 END), 0) AS BIGINT) AS h$h").mkString(",\n  ")
        s"""SELECT CAST(dayofweek(ts) AS INT) AS dow,
           |  $cols
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
      }) { (s, d) =>
      Tables.events(s, d)
        .select(dayofweek(col("ts")).cast("int").as("dow0"),
          (floor(hour(col("ts")) / 4) * 4).cast("int").as("hb"))
        .groupBy(col("dow0"))
        .pivot("hb", (0 until 24 by 4))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("dow0").as("dow") +:
          (0 until 24 by 4).map(h => col(h.toString).cast("long").as(s"h$h")): _*)
        // Spark dayofweek is 1-based (Sunday=1); DuckDB is 0-based
        .withColumn("dow", (col("dow") - 1).cast("int"))
        .orderBy(col("dow"))
    },

    // ---- V34: matryoshka retrieval-quality curve ----------------------------
    // The eval behind v9's two-stage design choice: how much of the
    // exact top-5 does a prefix-truncated cosine keep at 8/16/32/64
    // dims? Both rankings are deterministic strict-left-fold cosines
    // with rank-window ties (v2/v9's discipline), so overlap@5 is
    // ORACLE-CHECKED — a recall curve with no sampling error. The
    // corpus pair scan runs ONCE; all four prefix scores come from the
    // same fold pass (prefixes share work; shorter prefixes cost no
    // extra scan).
    QueryDef.sql(
      "v34_mrl_quality", {
        def cosSql(n: String) =
          s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |  list_transform(range(1, $n + 1), i -> q.emb[i]*c.emb[i])), (a,b) -> a+b)
             |/ (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |    list_transform(range(1, $n + 1), i -> q.emb[i]*q.emb[i])), (a,b) -> a+b))
             | * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             |    list_transform(range(1, $n + 1), i -> c.emb[i]*c.emb[i])), (a,b) -> a+b)))"""
            .stripMargin
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
           |pairs AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    ${cosSql("len(q.emb)")} AS cos_full,
           |    ${cosSql("8")} AS cos_8, ${cosSql("16")} AS cos_16,
           |    ${cosSql("32")} AS cos_32
           |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
           |topf AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT *, rank() OVER (PARTITION BY query_id
           |      ORDER BY cos_full DESC, neighbor_id) AS r FROM pairs) WHERE r <= 5),
           |lv AS (
           |  SELECT p.query_id, p.neighbor_id, d.dims,
           |    CASE d.dims WHEN 8 THEN p.cos_8 WHEN 16 THEN p.cos_16
           |      WHEN 32 THEN p.cos_32 ELSE p.cos_full END AS c
           |  FROM pairs p, (SELECT unnest([8, 16, 32, 64]) AS dims) d),
           |topp AS (
           |  SELECT dims, query_id, neighbor_id FROM (
           |    SELECT *, rank() OVER (PARTITION BY dims, query_id
           |      ORDER BY c DESC, neighbor_id) AS r FROM lv) WHERE r <= 5),
           |ov AS (
           |  SELECT t.dims, t.query_id,
           |    CAST(count(f.neighbor_id) AS BIGINT) AS n_overlap
           |  FROM topp t LEFT JOIN topf f
           |    ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
           |  GROUP BY 1, 2)
           |SELECT CAST(dims AS INT) AS prefix_dims,
           |  CAST(count(*) AS BIGINT) AS n_queries,
           |  CAST(sum(n_overlap) AS BIGINT) AS total_overlap,
           |  CAST(sum(n_overlap) * 1000 // (count(*) * 5) AS BIGINT)
           |    AS recall_permille
           |FROM ov GROUP BY 1 ORDER BY 1""".stripMargin
      }) { (s, d) =>
      import graft.operators.VectorOps
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), VectorOps.toDouble(col("embedding")).as("q_emb"))
      val c = emb.select(col("vec_id").as("neighbor_id"),
        VectorOps.toDouble(col("embedding")).as("n_emb"))
      def cosPre(n: Int): org.apache.spark.sql.Column = {
        val (a, b) =
          if (n == 64) (col("q_emb"), col("n_emb"))
          else (expr(s"slice(q_emb, 1, $n)"), expr(s"slice(n_emb, 1, $n)"))
        VectorOps.cosine(a, b)
      }
      val pairs = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosPre(64).as("cos_full"), cosPre(8).as("cos_8"),
          cosPre(16).as("cos_16"), cosPre(32).as("cos_32"))
        .localCheckpoint(true) // one pair pass feeds all four rankings
      val byQ = Window.partitionBy(col("query_id"))
      val topf = pairs.withColumn("r",
          rank().over(byQ.orderBy(col("cos_full").desc, col("neighbor_id"))))
        .filter(col("r") <= 5).select(col("query_id"), col("neighbor_id"))
      val lv = pairs.select(col("query_id"), col("neighbor_id"),
          explode(array(lit(8), lit(16), lit(32), lit(64))).as("dims"),
          col("cos_8"), col("cos_16"), col("cos_32"), col("cos_full"))
        .withColumn("c", when(col("dims") === 8, col("cos_8"))
          .when(col("dims") === 16, col("cos_16"))
          .when(col("dims") === 32, col("cos_32")).otherwise(col("cos_full")))
      val topp = lv.withColumn("r", rank().over(
          Window.partitionBy(col("dims"), col("query_id"))
            .orderBy(col("c").desc, col("neighbor_id"))))
        .filter(col("r") <= 5)
        .select(col("dims"), col("query_id"), col("neighbor_id"))
      val ov = topp.join(topf.withColumnRenamed("neighbor_id", "f_nid"),
          topp("query_id") === topf("query_id") &&
            col("neighbor_id") === col("f_nid"), "left")
        .groupBy(col("dims"), topp("query_id"))
        .agg(count(col("f_nid")).as("n_overlap"))
      ov.groupBy(col("dims").cast("int").as("prefix_dims"))
        .agg(count(lit(1)).as("n_queries"),
          sum(col("n_overlap")).cast("long").as("total_overlap"),
          expr("sum(n_overlap) * 1000 div (count(*) * 5)").cast("long")
            .as("recall_permille"))
        .orderBy(col("prefix_dims"))
    },

    // ---- A121: TOST equivalence test ----------------------------------------
    // Significance tests detect differences; shipping a refactor needs
    // the OPPOSITE guarantee — that any difference is inside a margin.
    // Two one-sided z-tests (TOST) on daily conversion rates between
    // the month's halves, margin δ = 2 percentage points, both tails
    // cross-multiplied to exact integers (a59's discipline squared:
    // each one-sided statistic keeps its sign, significance is the z²
    // comparison): equivalent ⇔ BOTH (Δ+δ)·z-test rejects below AND
    // (Δ−δ)-test rejects above. One user-day aggregate, then crumbs.
    QueryDef.sql(
      "a121_tost_equivalence",
      """WITH pu AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT)
        |      AS conv
        |  FROM events GROUP BY 1, 2),
        |halves AS (
        |  SELECT CASE WHEN day(day) <= 15 THEN 1 ELSE 2 END AS half,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS k
        |  FROM pu GROUP BY 1),
        |w AS (
        |  SELECT max(CASE WHEN half = 1 THEN n END) AS n1,
        |    max(CASE WHEN half = 1 THEN k END) AS k1,
        |    max(CASE WHEN half = 2 THEN n END) AS n2,
        |    max(CASE WHEN half = 2 THEN k END) AS k2
        |  FROM halves),
        |sc AS (
        |  -- Delta and delta-margin on the common per-mille grid
        |  -- D = n1*n2*1000: Delta*D = (k1*n2 - k2*n1)*1000; margin*D =
        |  -- 20*n1*n2 (margin = 0.02)
        |  SELECT n1, k1, n2, k2,
        |    CAST(k1 AS HUGEINT) * n2 * 1000 - CAST(k2 AS HUGEINT) * n1 * 1000
        |      AS dnum,
        |    CAST(20 AS HUGEINT) * n1 * n2 AS dmargin
        |  FROM w),
        |z AS (
        |  SELECT n1, k1, n2, k2, dnum,
        |    dnum + dmargin AS a_num, dnum - dmargin AS b_num
        |  FROM sc)
        |-- one-sided rejection at alpha=0.05 (z*2 = 2.706): with pooled
        |-- SE^2 = pbar(1-pbar)(1/n1+1/n2), (Delta+-margin)^2 > 2.706*SE^2
        |-- cross-multiplies to x^2*K*1000 > 2706*km*(K-km)*n1*n2*10^6
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(k1 AS BIGINT) AS k1,
        |  CAST(n2 AS BIGINT) AS n2, CAST(k2 AS BIGINT) AS k2,
        |  CAST(dnum // (CAST(n1 AS HUGEINT) * n2) AS BIGINT) AS diff_permille,
        |  CAST(a_num > 0
        |    AND a_num * a_num * (n1 + n2) * 1000
        |      > CAST(2706 AS HUGEINT) * (k1 + k2) * ((n1 + n2) - (k1 + k2))
        |        * n1 * n2 * 1000000
        |    AND b_num < 0
        |    AND b_num * b_num * (n1 + n2) * 1000
        |      > CAST(2706 AS HUGEINT) * (k1 + k2) * ((n1 + n2) - (k1 + k2))
        |        * n1 * n2 * 1000000
        |    AS INT) AS equivalent
        |FROM z""".stripMargin) { (s, d) =>
      val pu = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"), col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"))
      val halves = pu.groupBy(
          when(dayofmonth(col("day")) <= 15, 1).otherwise(2).as("half"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).cast("long").as("k"))
      val w = halves.agg(
        max(when(col("half") === 1, col("n"))).as("n1"),
        max(when(col("half") === 1, col("k"))).as("k1"),
        max(when(col("half") === 2, col("n"))).as("n2"),
        max(when(col("half") === 2, col("k"))).as("k2"))
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val sc = w.select(col("n1"), col("k1"), col("n2"), col("k2"),
        (col("k1").cast(dec) * col("n2") * 1000L
          - col("k2").cast(dec) * col("n1") * 1000L).as("dnum"),
        (lit(20L).cast(dec) * col("n1") * col("n2")).as("dmargin"))
      val z = sc.select(col("n1"), col("k1"), col("n2"), col("k2"), col("dnum"),
        (col("dnum") + col("dmargin")).as("a_num"),
        (col("dnum") - col("dmargin")).as("b_num"))
      def reject(x: org.apache.spark.sql.Column) =
        x * x * (col("n1") + col("n2")) * 1000L >
          lit(2706L).cast(dec) * (col("k1") + col("k2")) *
            ((col("n1") + col("n2")) - (col("k1") + col("k2"))) *
            col("n1") * col("n2") * 1000000L
      z.select(col("n1").cast("long").as("n1"), col("k1").cast("long").as("k1"),
        col("n2").cast("long").as("n2"), col("k2").cast("long").as("k2"),
        expr("cast(dnum div (cast(n1 as decimal(38,0)) * n2) as bigint)")
          .as("diff_permille"),
        (col("a_num") > 0 && reject(col("a_num")) &&
          col("b_num") < 0 && reject(col("b_num")))
          .cast("int").as("equivalent"))
    }
  )
}
