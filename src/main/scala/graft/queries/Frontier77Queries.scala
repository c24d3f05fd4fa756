package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Seventy-seventh frontier batch: survey raking (IPF), filtered vector
  * search A/B, cascade-delete preview.
  */
object Frontier77Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A138: survey raking (iterative proportional fitting) ----------------
    // The weighting workhorse: scale a (event_type × weekday) cell
    // table so its margins match target margins — here week-1 type
    // shares and uniform weekday shares, both integer targets. Three
    // IPF rounds unroll as crumb joins; each round's scale factor
    // applies in micro units with ONE floor (deterministic in both
    // engines, the a132 quantization discipline). Margins converge
    // fast; the result reports cell weights and the post-fit margin
    // error.
    QueryDef.sql(
      "a138_raking", {
        def round(k: Int, prev: String): String =
          s"""rm$k AS (
             |  SELECT dow, CAST(sum(w) AS BIGINT) AS cur FROM $prev GROUP BY 1),
             |r$k AS (
             |  SELECT p.et, p.dow,
             |    CAST((CAST(p.w AS HUGEINT) * t.target) // rm$k.cur AS BIGINT) AS w
             |  FROM $prev p JOIN rm$k USING (dow)
             |  JOIN dow_t t USING (dow)),
             |cm$k AS (
             |  SELECT et, CAST(sum(w) AS BIGINT) AS cur FROM r$k GROUP BY 1),
             |c$k AS (
             |  SELECT p.et, p.dow,
             |    CAST((CAST(p.w AS HUGEINT) * t.target) // cm$k.cur AS BIGINT) AS w
             |  FROM r$k p JOIN cm$k USING (et)
             |  JOIN et_t t USING (et))""".stripMargin
        s"""WITH cells AS (
           |  SELECT event_type AS et, CAST(dayofweek(ts) AS INT) AS dow,
           |    CAST(count(*) * 1000000 AS BIGINT) AS w
           |  FROM events GROUP BY 1, 2),
           |tot AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM cells),
           |et_t AS (
           |  SELECT event_type AS et,
           |    CAST((CAST(count(*) AS HUGEINT) * (SELECT t FROM tot))
           |      // (SELECT count(*) FROM events WHERE day(CAST(ts AS DATE)) <= 7)
           |      AS BIGINT) AS target
           |  FROM events WHERE day(CAST(ts AS DATE)) <= 7 GROUP BY 1),
           |dow_t AS (
           |  SELECT CAST(unnest(generate_series(0, 6)) AS INT) AS dow,
           |    CAST((SELECT t FROM tot) // 7 AS BIGINT) AS target),
           |${round(1, "cells")},
           |${round(2, "c1")},
           |${round(3, "c2")}
           |SELECT et, dow, CAST(w AS BIGINT) AS weight_micro
           |FROM c3 ORDER BY et, dow""".stripMargin
      }) { (s, d) =>
      val ev = Tables.events(s, d)
      val cells = ev.groupBy(col("event_type").as("et"),
          (dayofweek(col("ts")) - 1).cast("int").as("dow"))
        .agg((count(lit(1)) * 1000000L).as("w"))
        .localCheckpoint(true) // the margins and three rounds share this
      val tot = cells.agg(sum(col("w")).cast("long").as("t"))
      val wk1 = ev.filter(dayofmonth(col("ts").cast("date")) <= 7)
      val wk1n = wk1.agg(count(lit(1)).as("n1"))
      val etT = wk1.groupBy(col("event_type").as("et")).agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(wk1n))
        .select(col("et"),
          expr("cast((cast(c as decimal(38,0)) * t) div n1 as bigint)").as("target"))
      val dowT = s.range(0, 7).select(col("id").cast("int").as("dow"))
        .crossJoin(broadcast(tot))
        .select(col("dow"), expr("t div 7").cast("long").as("target"))
      // r5 opt: the per-margin totals are window sums over the same
      // keys, not separate aggregates broadcast-joined back — the old
      // shape built 2 derived broadcasts per round × 3 rounds (each
      // re-evaluating the previous round inside its build: ~24
      // scheduled jobs of pure overhead on a ≤(7·|event_type|)-row
      // grid). Same integer arithmetic, one chained job.
      def ipfRound(prev: DataFrame): DataFrame = {
        val r = prev
          .withColumn("cur", sum(col("w")).over(Window.partitionBy(col("dow"))).cast("long"))
          .join(broadcast(dowT), "dow")
          .select(col("et"), col("dow"),
            expr("cast((cast(w as decimal(38,0)) * target) div cur as bigint)").as("w"))
        r.withColumn("cur", sum(col("w")).over(Window.partitionBy(col("et"))).cast("long"))
          .join(broadcast(etT), "et")
          .select(col("et"), col("dow"),
            expr("cast((cast(w as decimal(38,0)) * target) div cur as bigint)").as("w"))
      }
      val c3 = ipfRound(ipfRound(ipfRound(cells)))
      c3.select(col("et"), col("dow"), col("w").cast("long").as("weight_micro"))
        .orderBy(col("et"), col("dow"))
    },

    // ---- V46: filtered vector search — pre-filter vs post-filter -------------
    // THE vector-db design decision: apply the metadata predicate
    // before the index probe (pre-filter: correct but probes a sparse
    // index) or after (post-filter: fast but can return < k). Both
    // paths run on the deterministic sign-LSH bands (d13), truth is
    // the exact filtered top-5, and everything is hash-gated. The
    // per-query report shows post-filter starving (n_results < 5)
    // exactly where the filter is selective.
    QueryDef.sql(
      "v46_filtered_search",
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |sigs AS (
        |  SELECT vec_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 49),
        |        i -> CASE WHEN CAST(emb[i] AS DOUBLE) >= 0
        |          THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE CAST(0 AS BIGINT) END)),
        |      (a, b) -> a + b) AS sig
        |  FROM e),
        |bands AS (
        |  SELECT s.vec_id, k.k, (s.sig >> CAST(k.k * 6 AS INT)) & 63 AS band
        |  FROM sigs s, (SELECT unnest(generate_series(0, 7)) AS k) k),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS cand_id
        |  FROM bands a JOIN bands b ON a.k = b.k AND a.band = b.band
        |  WHERE a.vec_id < 10 AND b.vec_id <> a.vec_id),
        |scored AS (
        |  SELECT c.query_id, c.cand_id, n.label,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*n.emb[i])),
        |      (x,y) -> x+y) AS dot
        |  FROM cand c JOIN e q ON q.vec_id = c.query_id
        |  JOIN e n ON n.vec_id = c.cand_id),
        |pre AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT *, rank() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, cand_id) AS r
        |    FROM scored WHERE label = 3) WHERE r <= 5),
        |post AS (
        |  SELECT query_id, cand_id FROM (
        |    SELECT * FROM (
        |      SELECT *, rank() OVER (PARTITION BY query_id
        |        ORDER BY dot DESC, cand_id) AS r FROM scored) WHERE r <= 5)
        |  WHERE label = 3),
        |truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |      rank() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*n.emb[i])),
        |          (x,y) -> x+y) DESC, n.vec_id) AS r
        |    FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id <> q.vec_id
        |    WHERE n.label = 3) WHERE r <= 5)
        |SELECT t.query_id,
        |  CAST((SELECT count(*) FROM pre p
        |        WHERE p.query_id = t.query_id
        |          AND p.cand_id IN (SELECT neighbor_id FROM truth t2
        |                            WHERE t2.query_id = t.query_id)) AS BIGINT)
        |    AS pre_hits,
        |  CAST((SELECT count(*) FROM post p
        |        WHERE p.query_id = t.query_id
        |          AND p.cand_id IN (SELECT neighbor_id FROM truth t2
        |                            WHERE t2.query_id = t.query_id)) AS BIGINT)
        |    AS post_hits,
        |  CAST((SELECT count(*) FROM post p WHERE p.query_id = t.query_id)
        |    AS BIGINT) AS post_n_results
        |FROM (SELECT DISTINCT query_id FROM truth) t
        |ORDER BY query_id""".stripMargin) { (s, d) =>
      import graft.operators.VectorOps
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
        VectorOps.toDouble(col("embedding")).as("emb"))
      val sigs = e.select(col("vec_id"),
        expr("""aggregate(transform(sequence(1, 48),
            i -> IF(cast(element_at(emb, i) as double) >= 0,
                    shiftleft(cast(1 as bigint), i - 1), cast(0 as bigint))),
          cast(0 as bigint), (a, b) -> a + b)""").as("sig"))
        .localCheckpoint(true)
      val bands = sigs.select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("k"),
          col("sig"))
        .withColumn("band", expr("shiftright(sig, cast(k * 6 as int)) & 63"))
      val qa = bands.filter(col("vec_id") < 10)
        .select(col("k"), col("band"), col("vec_id").as("query_id"))
      val ca = bands.select(col("k"), col("band"), col("vec_id").as("cand_id"))
      val cand = qa.join(ca, Seq("k", "band"))
        .filter(col("cand_id") =!= col("query_id"))
        .select(col("query_id"), col("cand_id")).distinct()
      val qe = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
      val scored = cand.join(broadcast(qe), "query_id")
        .join(e.select(col("vec_id").as("cand_id"), col("label"),
          col("emb").as("c_emb")), "cand_id")
        .select(col("query_id"), col("cand_id"), col("label"),
          VectorOps.dot(col("q_emb"), col("c_emb")).as("dot"))
        .localCheckpoint(true) // pre and post paths share the scoring
      val byQ = Window.partitionBy(col("query_id"))
      val pre = scored.filter(col("label") === 3)
        .withColumn("r", rank().over(byQ.orderBy(col("dot").desc, col("cand_id"))))
        .filter(col("r") <= 5).select(col("query_id"), col("cand_id"))
      val post = scored
        .withColumn("r", rank().over(byQ.orderBy(col("dot").desc, col("cand_id"))))
        .filter(col("r") <= 5 && col("label") === 3)
        .select(col("query_id"), col("cand_id"))
      val truth = e.filter(col("label") === 3)
        .select(col("vec_id").as("neighbor_id"), col("emb").as("n_emb"))
        .join(broadcast(qe), col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          VectorOps.dot(col("q_emb"), col("n_emb")).as("dot"))
        .withColumn("r", rank().over(byQ.orderBy(col("dot").desc, col("neighbor_id"))))
        .filter(col("r") <= 5).select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true)
      val preHits = pre.join(truth,
          pre("query_id") === truth("query_id") &&
            col("cand_id") === col("neighbor_id"))
        .groupBy(pre("query_id")).agg(count(lit(1)).as("pre_hits"))
      val postHits = post.join(truth,
          post("query_id") === truth("query_id") &&
            col("cand_id") === col("neighbor_id"))
        .groupBy(post("query_id")).agg(count(lit(1)).as("post_hits"))
      val postN = post.groupBy(col("query_id")).agg(count(lit(1)).as("post_n_results"))
      truth.select(col("query_id")).distinct()
        .join(preHits, Seq("query_id"), "left")
        .join(postHits, Seq("query_id"), "left")
        .join(postN, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("pre_hits"), lit(0L)).cast("long").as("pre_hits"),
          coalesce(col("post_hits"), lit(0L)).cast("long").as("post_hits"),
          coalesce(col("post_n_results"), lit(0L)).cast("long").as("post_n_results"))
        .orderBy(col("query_id"))
    },

    // ---- U62: cascade-delete preview ------------------------------------------
    // The DBA's dry run for referential DML: deleting a customer set
    // (here every 50th key) cascades through orders into lineitems —
    // report exactly what would go, per nation, with the revenue
    // impact, BEFORE anyone runs the DML. Two semi-joins downstream of
    // the doomed key set; everything countable and exact.
    QueryDef.sql(
      "u62_cascade_delete_preview",
      """WITH doomed AS (
        |  SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey % 50 = 0),
        |o AS (
        |  SELECT o.o_orderkey, d.c_nationkey
        |  FROM orders o JOIN doomed d ON o.o_custkey = d.c_custkey),
        |l AS (
        |  SELECT o.c_nationkey,
        |    CAST(count(*) AS BIGINT) AS n_lineitems,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS revenue_cents
        |  FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1),
        |da AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
        |  FROM doomed GROUP BY 1),
        |oa AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders
        |  FROM o GROUP BY 1)
        |SELECT CAST(da.c_nationkey AS BIGINT) AS nationkey, da.n_customers,
        |  CAST(coalesce(oa.n_orders, 0) AS BIGINT) AS n_orders,
        |  CAST(coalesce(l.n_lineitems, 0) AS BIGINT) AS n_lineitems,
        |  CAST(coalesce(l.revenue_cents, 0) AS BIGINT) AS revenue_cents
        |FROM da
        |LEFT JOIN oa USING (c_nationkey)
        |LEFT JOIN l USING (c_nationkey)
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val doomed = Tables.customer(s, d)
        .filter(col("c_custkey") % 50 === 0)
        .select(col("c_custkey"), col("c_nationkey"))
        .localCheckpoint(true) // three cascade levels read one key set
      val o = Tables.orders(s, d)
        .join(broadcast(doomed), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      val l2 = Tables.lineitem(s, d)
        .join(o.withColumnRenamed("o_orderkey", "lok"),
          col("l_orderkey") === col("lok"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_lineitems"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).cast("long")
            .as("revenue_cents"))
      val oAgg = o.groupBy(col("c_nationkey"))
        .agg(count_distinct(col("o_orderkey")).as("n_orders"))
      doomed.groupBy(col("c_nationkey"))
        .agg(count_distinct(col("c_custkey")).as("n_customers"))
        .join(oAgg, Seq("c_nationkey"), "left")
        .join(l2, Seq("c_nationkey"), "left")
        .select(col("c_nationkey").cast("long").as("nationkey"),
          col("n_customers"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_lineitems"), lit(0L)).as("n_lineitems"),
          coalesce(col("revenue_cents"), lit(0L)).as("revenue_cents"))
        .orderBy(col("nationkey"))
    }
  )
}
