package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Eighty-second frontier batch: simplified silhouette, mutual-information
  * feature ranking, outer-join elimination certification.
  */
object Frontier82Queries {

  private def dd(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, 65), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), (x, y) -> x + y)"

  val defs: Seq[QueryDef] = Seq(

    // ---- V50: simplified silhouette (cluster cohesion vs separation) ----------
    // The labeling-quality readout k-means pipelines print: per point,
    // squared distance to the OWN label centroid (a²) vs the nearest
    // OTHER centroid (b²), silhouette s = (b²−a²)/max(a²,b²) — the
    // "simplified" (centroid-based) variant, which needs points ×
    // k centroids instead of all pairs, i.e. the only formulation
    // that survives web-scale corpora. Coordinates and centroids are
    // integer micro-units (centroid = coordinate-sum div n, exact and
    // engine-identical), so a², b², and the permille silhouette are
    // pure integer arithmetic under the hash gate.
    QueryDef.sql(
      "v50_simplified_silhouette",
      s"""WITH e AS (
        |  SELECT vec_id, label, list_transform(range(1, 65),
        |    i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)) AS q
        |  FROM embeddings),
        |ld AS (
        |  SELECT label, i.i AS dim,
        |    CAST(sum(q[i.i]) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
        |  FROM e, (SELECT unnest(generate_series(1, 64)) AS i) i
        |  GROUP BY 1, 2),
        |cent AS (
        |  SELECT label AS clabel, list(CAST(s // n AS BIGINT) ORDER BY dim) AS cq
        |  FROM ld GROUP BY 1),
        |pd AS (
        |  SELECT e.vec_id, e.label,
        |    min(CASE WHEN e.label = c.clabel THEN ${dd("e.q", "c.cq")} END) AS a2,
        |    min(CASE WHEN e.label <> c.clabel THEN ${dd("e.q", "c.cq")} END) AS b2
        |  FROM e CROSS JOIN cent c GROUP BY 1, 2),
        |sil AS (
        |  SELECT label,
        |    (b2 - a2) * 1000 // greatest(a2, b2, 1) AS s
        |  FROM pd)
        |SELECT CAST(label AS INT) AS label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(s) // count(*) AS BIGINT) AS mean_sil_permille,
        |  CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_misplaced
        |FROM sil GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      def d2(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"),
            x => floor(x.cast("double") * lit(1e6)).cast("long")).as("q"))
        .localCheckpoint(true) // centroids and distances read one quantize pass
      val ld = e.select(col("label"), posexplode(col("q")).as(Seq("p", "v")))
        .groupBy(col("label"), (col("p") + 1).as("dim"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      val cent = ld.select(col("label").as("clabel"),
          struct(col("dim"), expr("s div n").cast("long").as("c")).as("dc"))
        .groupBy(col("clabel"))
        .agg(expr("transform(array_sort(collect_list(dc)), x -> x.c)").as("cq"))
      val pd = e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("label"), col("clabel"),
          d2(col("q"), col("cq")).as("d2"))
        .groupBy(col("vec_id"), col("label"))
        .agg(min(when(col("label") === col("clabel"), col("d2"))).as("a2"),
          min(when(col("label") =!= col("clabel"), col("d2"))).as("b2"))
      pd.select(col("label"),
          expr("(b2 - a2) * 1000 div greatest(a2, b2, 1)").as("s"))
        .groupBy(col("label").cast("int").as("label"))
        .agg(count(lit(1)).as("n"),
          expr("cast(sum(s) div count(1) as bigint)").as("mean_sil_permille"),
          sum(when(col("s") < 0, 1).otherwise(0)).cast("long").as("n_misplaced"))
        .orderBy(col("label"))
    },

    // ---- A141: mutual-information feature ranking -----------------------------
    // Filter-method feature selection: how much does each binarized
    // embedding dimension (sign bit) tell you about the class label?
    // MI(bit; label) = Σ (n_bl/n)·ln(n_bl·n / (n_b·n_l)) over observed
    // cells — all counts integer-exact from one posexplode shuffle,
    // each ln rounded to 8 decimals, the ≤20-term sum folded in sorted
    // order so the doubles agree bit-for-bit cross-engine.
    QueryDef.sql(
      "a141_info_gain",
      """WITH b AS (
        |  SELECT vec_id, label, i.i AS dim,
        |    CASE WHEN CAST(embedding[i.i] AS DOUBLE) >= 0 THEN 1 ELSE 0 END AS bit
        |  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) i),
        |cell AS (
        |  SELECT dim, bit, label, CAST(count(*) AS BIGINT) AS n_bl
        |  FROM b GROUP BY 1, 2, 3),
        |mb AS (SELECT dim, bit, CAST(sum(n_bl) AS BIGINT) AS n_b
        |  FROM cell GROUP BY 1, 2),
        |ml AS (SELECT dim, label, CAST(sum(n_bl) AS BIGINT) AS n_l
        |  FROM cell GROUP BY 1, 2),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
        |terms AS (
        |  SELECT c.dim,
        |    round(ln(CAST(c.n_bl * nn.n AS DOUBLE) /
        |      CAST(mb.n_b * ml.n_l AS DOUBLE)), 8) *
        |      (CAST(c.n_bl AS DOUBLE) / CAST(nn.n AS DOUBLE)) AS t
        |  FROM cell c
        |  JOIN mb ON mb.dim = c.dim AND mb.bit = c.bit
        |  JOIN ml ON ml.dim = c.dim AND ml.label = c.label
        |  CROSS JOIN nn)
        |SELECT CAST(dim AS INT) AS dim,
        |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_sort(list(t))), (a, b) -> a + b), 6) AS mi_nats
        |FROM terms GROUP BY dim ORDER BY dim""".stripMargin) { (s, d) =>
      val b = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("p", "v")))
        .select(col("vec_id"), col("label"), (col("p") + 1).as("dim"),
          when(col("v").cast("double") >= 0, 1).otherwise(0).as("bit"))
      val cell = b.groupBy(col("dim"), col("bit"), col("label"))
        .agg(count(lit(1)).as("n_bl"))
        .localCheckpoint(true) // margins and terms read one counting pass
      val mb = cell.groupBy(col("dim"), col("bit")).agg(sum(col("n_bl")).as("n_b"))
      val ml = cell.groupBy(col("dim"), col("label")).agg(sum(col("n_bl")).as("n_l"))
      val nn = Tables.embeddings(s, d).agg(count(lit(1)).as("n"))
      cell
        .join(mb, Seq("dim", "bit"))
        .join(ml, Seq("dim", "label"))
        .crossJoin(broadcast(nn))
        .select(col("dim"),
          (round(log((col("n_bl") * col("n")).cast("double") /
            (col("n_b") * col("n_l")).cast("double")), 8) *
            (col("n_bl").cast("double") / col("n").cast("double"))).as("t"))
        .groupBy(col("dim").cast("int").as("dim"))
        .agg(round(aggregate(sort_array(collect_list(col("t"))), lit(0.0),
          (a, v) => a + v), 6).as("mi_nats"))
        .orderBy(col("dim"))
    },

    // ---- Q34: outer-join elimination certification ----------------------------
    // The registered query is written with two LEFT JOINs — but the
    // WHERE predicates on the right-side columns are null-rejecting,
    // so Catalyst's EliminateOuterJoin provably converts both to INNER
    // joins (pinned by PlanShapeSpec), unlocking broadcast placement
    // and join reordering a left-outer plan would forbid. The oracle
    // states the outer formulation verbatim; the hash gate certifies
    // the rewrite's semantic identity.
    QueryDef.sql(
      "q34_outer_join_elim",
      """SELECT n.n_name,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents
        |FROM orders o
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_acctbal > 0 AND n.n_name IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal")),
          col("o_custkey") === col("c_custkey"), "left")
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"), "left")
        .filter(col("c_acctbal") > 0 && col("n_name").isNotNull)
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("cents")).cast("long").as("rev_cents"))
        .orderBy(col("n_name"))
    }
  )
}
