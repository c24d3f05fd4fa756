package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Eighty-eighth frontier batch: KNN-Shapley data valuation,
  * overdispersion audit, dedup keeper churn.
  */
object Frontier88Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- V54: exact KNN-Shapley data valuation --------------------------------
    // Which training points actually earn their keep? For a K-NN
    // classifier the Shapley value of every training point has a
    // closed-form O(n log n) recurrence (sort by distance to the test
    // point, then s_i = s_{i+1} + (1[y_i=y] − 1[y_{i+1}=y])/max(i,K)):
    // the data-valuation primitive that otherwise needs exponential
    // retraining. Distances are quantized integers, every rational
    // term becomes exact micro-units via integer div, and the
    // recurrence collapses to a REVERSE cumulative window sum —
    // associative integer addition, so engine-internal frame order
    // can't skew it. Test points: vec_id < 10; value = summed over
    // tests, K = 5.
    QueryDef.sql(
      "v54_knn_shapley",
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(range(1, 65),
        |    i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT)) AS q
        |  FROM embeddings),
        |pairs AS (
        |  SELECT t.vec_id AS tid, t.label AS ty, n.vec_id AS nid, n.label AS ny,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 65),
        |        i -> (t.q[i] - n.q[i]) * (t.q[i] - n.q[i]))), (x, y) -> x + y) AS d2
        |  FROM e t JOIN e n ON t.vec_id < 10 AND n.vec_id >= 10),
        |ranked AS (
        |  SELECT tid, nid,
        |    CASE WHEN ny = ty THEN 1 ELSE 0 END AS eq,
        |    row_number() OVER (PARTITION BY tid ORDER BY d2, nid) AS r,
        |    count(*) OVER (PARTITION BY tid) AS n
        |  FROM pairs),
        |terms AS (
        |  SELECT tid, nid, r, n, eq,
        |    lead(eq) OVER (PARTITION BY tid ORDER BY r) AS eq_next
        |  FROM ranked),
        |scored AS (
        |  SELECT tid, nid, r, n, eq,
        |    CASE WHEN eq_next IS NULL THEN CAST(0 AS BIGINT)
        |      ELSE CAST((eq - eq_next) * 1000000000000 //
        |        greatest(r, 5) AS BIGINT) END AS term
        |  FROM terms),
        |cum AS (
        |  SELECT tid, nid,
        |    CAST(sum(term) OVER (PARTITION BY tid ORDER BY r
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |      AS tailsum
        |  FROM scored),
        |base AS (
        |  SELECT tid, CAST(eq * 1000000000000 // n AS BIGINT) AS b
        |  FROM scored WHERE r = n)
        |SELECT c.nid AS vec_id,
        |  CAST(sum(c.tailsum + b.b) AS BIGINT) AS shapley_micro
        |FROM cum c JOIN base b ON b.tid = c.tid
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      def d2(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"),
            x => floor(x.cast("double") * lit(1e6)).cast("long")).as("q"))
        .localCheckpoint(true) // test and train sides read one quantize pass
      val tests = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("tid"), col("label").as("ty"), col("q").as("tq"))
      val train = e.filter(col("vec_id") >= 10)
        .select(col("vec_id").as("nid"), col("label").as("ny"), col("q").as("nq"))
      val wT = Window.partitionBy(col("tid"))
      val ranked = train.crossJoin(broadcast(tests))
        .select(col("tid"), col("nid"),
          when(col("ny") === col("ty"), 1).otherwise(0).as("eq"),
          d2(col("tq"), col("nq")).as("d2"))
        .withColumn("r", row_number().over(wT.orderBy(col("d2"), col("nid"))))
        .withColumn("n", count(lit(1)).over(wT))
      val terms = ranked
        .withColumn("eq_next", lead(col("eq"), 1).over(wT.orderBy(col("r"))))
        .withColumn("term",
          when(col("eq_next").isNull, lit(0L))
            .otherwise(expr("cast((eq - eq_next) * 1000000000000 div greatest(r, 5) as bigint)")))
        .localCheckpoint(true) // tail sums and the base row read it
      val cum = terms
        .withColumn("tailsum", sum(col("term")).over(wT.orderBy(col("r"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      val base = terms.filter(col("r") === col("n"))
        .select(col("tid"), expr("cast(eq * 1000000000000 div n as bigint)").as("b"))
      cum.join(broadcast(base), "tid")
        .groupBy(col("nid").as("vec_id"))
        .agg(sum(col("tailsum") + col("b")).cast("long").as("shapley_micro"))
        .orderBy(col("vec_id"))
    },

    // ---- A144: overdispersion audit (variance-to-mean ratio) ------------------
    // Is per-user daily activity Poisson, or burstier? The index of
    // dispersion s²/x̄ over (user, day) activity cells — conditional
    // on activity, documented — computed entirely from integer moment
    // sums: vmr_milli = (n·Σx² − S²)·1000 div ((n−1)·S). The verdict
    // column is the capacity-model routing decision (negative-binomial
    // vs Poisson) a traffic simulator needs.
    QueryDef.sql(
      "a144_overdispersion",
      """WITH cells AS (
        |  SELECT event_type, user_id, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
        |  FROM cells GROUP BY 1)
        |SELECT event_type, n,
        |  CAST(s * 1000 // n AS BIGINT) AS mean_milli,
        |  CAST((n * q - s * s) * 1000 // ((n - 1) * s) AS BIGINT) AS vmr_milli,
        |  CASE WHEN (n * q - s * s) * 1000 // ((n - 1) * s) > 1500
        |         THEN 'overdispersed'
        |       WHEN (n * q - s * s) * 1000 // ((n - 1) * s) < 667
        |         THEN 'underdispersed'
        |       ELSE 'poisson-ish' END AS verdict
        |FROM m WHERE n > 1 AND s > 0
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val cells = Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val m = cells.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).cast("long").as("s"),
          sum(col("c") * col("c")).cast("long").as("q"))
      val vmr = expr("(n * q - s * s) * 1000 div ((n - 1) * s)")
      m.filter(col("n") > 1 && col("s") > 0)
        .select(col("event_type"), col("n"),
          expr("cast(s * 1000 div n as bigint)").as("mean_milli"),
          vmr.cast("long").as("vmr_milli"),
          when(vmr > 1500, "overdispersed")
            .when(vmr < 667, "underdispersed")
            .otherwise("poisson-ish").as("verdict"))
        .orderBy(col("event_type"))
    },

    // ---- C51: dedup keeper churn under an arriving batch ----------------------
    // Incremental dedup is not "dedup again": when a new batch lands
    // (doc_id % 10 = 7), each exact-hash family either appears for the
    // first time, absorbs batch members under its existing keeper, or
    // has its keeper DISPLACED (a batch doc wins min-doc_id). The
    // churn ledger — families and batch docs per outcome — is what an
    // incremental pipeline must reconcile instead of rewriting the
    // corpus.
    QueryDef.sql(
      "c51_dedup_churn",
      """WITH d AS (
        |  SELECT doc_id, md5(text) AS h,
        |    CASE WHEN doc_id % 10 = 7 THEN 1 ELSE 0 END AS is_batch
        |  FROM documents),
        |fam AS (
        |  SELECT h,
        |    CAST(min(doc_id) AS BIGINT) AS keeper_all,
        |    CAST(min(CASE WHEN is_batch = 0 THEN doc_id END) AS BIGINT)
        |      AS keeper_old,
        |    CAST(sum(is_batch) AS BIGINT) AS n_batch,
        |    CAST(count(*) AS BIGINT) AS n_docs
        |  FROM d GROUP BY h),
        |cls AS (
        |  SELECT h, n_batch, n_docs,
        |    CASE WHEN keeper_old IS NULL THEN 'new_family'
        |         WHEN n_batch = 0 THEN 'untouched'
        |         WHEN keeper_all < keeper_old THEN 'keeper_displaced'
        |         ELSE 'absorbed' END AS status
        |  FROM fam)
        |SELECT status, CAST(count(*) AS BIGINT) AS n_families,
        |  CAST(sum(n_batch) AS BIGINT) AS n_batch_docs,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val dd = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("text")).as("h"),
          when(col("doc_id") % 10 === 7, 1).otherwise(0).as("is_batch"))
      val fam = dd.groupBy(col("h"))
        .agg(min(col("doc_id")).cast("long").as("keeper_all"),
          min(when(col("is_batch") === 0, col("doc_id"))).cast("long")
            .as("keeper_old"),
          sum(col("is_batch")).cast("long").as("n_batch"),
          count(lit(1)).as("n_docs"))
      fam.select(col("n_batch"), col("n_docs"),
          when(col("keeper_old").isNull, "new_family")
            .when(col("n_batch") === 0, "untouched")
            .when(col("keeper_all") < col("keeper_old"), "keeper_displaced")
            .otherwise("absorbed").as("status"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_families"),
          sum(col("n_batch")).cast("long").as("n_batch_docs"),
          sum(col("n_docs")).cast("long").as("n_docs"))
        .orderBy(col("status"))
    }
  )
}
