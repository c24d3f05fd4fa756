package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions

/** Seventy-ninth frontier batch: eager-aggregation rewrite, dedup
  * savings ledger, recall@k curve.
  */
object Frontier79Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- Q32: eager aggregation (partial agg below the join) -----------------
    // The classic optimizer rewrite, proven as data: revenue per
    // nation computed by pre-aggregating lineitem to order grain
    // BEFORE the orders⋈customer joins — the shuffle carries order
    // rows, not lineitems. The registered plan IS the rewritten one;
    // the oracle is the naive join-then-aggregate formulation, so the
    // hash gate certifies the rewrite's semantic identity (the thing
    // an optimizer must prove before applying it).
    QueryDef.sql(
      "q32_eager_aggregation",
      """SELECT n.n_name,
        |  CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      // eager aggregation: lineitem collapses to order grain first
      val perOrder = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).cast("long")
          .as("ord_cents"))
      val dims = broadcast(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name")))
      perOrder
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(dims, col("o_custkey") === col("c_custkey"))
        .groupBy(col("n_name"))
        .agg(count_distinct(col("o_orderkey")).as("n_orders"),
          sum(col("ord_cents")).cast("long").as("revenue_cents"))
        .orderBy(col("n_name"))
    },

    // ---- T75: dedup savings ledger --------------------------------------------
    // The curation budget meeting in one table: how many documents and
    // tokens does each dedup tier remove? Exact text equality, the
    // t55 normalized form, and 48-char-prefix families (m8's planted
    // signal) each keep one representative per family; tokens are
    // exact counts. The ledger shows the marginal yield of each
    // successively looser tier — the number that decides how much
    // dedup compute a pipeline buys.
    QueryDef.sql(
      "t75_dedup_savings",
      """WITH d AS (
        |  SELECT doc_id, text,
        |    CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS toks,
        |    md5(text) AS h_exact,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |      ' +', ' ', 'g'))) AS h_norm,
        |    md5(substring(text, 1, 48)) AS h_prefix
        |  FROM documents),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(toks) AS BIGINT) AS n_toks
        |  FROM d),
        |tiers AS (
        |  SELECT 'exact' AS tier, CAST(count(*) AS BIGINT) AS kept_docs,
        |    CAST(sum(toks) AS BIGINT) AS kept_toks
        |  FROM (SELECT min_by(toks, doc_id) AS toks FROM d GROUP BY h_exact)
        |  UNION ALL
        |  SELECT 'normalized', CAST(count(*) AS BIGINT), CAST(sum(toks) AS BIGINT)
        |  FROM (SELECT min_by(toks, doc_id) AS toks FROM d GROUP BY h_norm)
        |  UNION ALL
        |  SELECT 'prefix48', CAST(count(*) AS BIGINT), CAST(sum(toks) AS BIGINT)
        |  FROM (SELECT min_by(toks, doc_id) AS toks FROM d GROUP BY h_prefix))
        |SELECT t.tier, t.kept_docs, t.kept_toks,
        |  CAST(tot.n_docs - t.kept_docs AS BIGINT) AS removed_docs,
        |  CAST((tot.n_toks - t.kept_toks) * 1000 // tot.n_toks AS BIGINT)
        |    AS token_savings_permille
        |FROM tiers t CROSS JOIN tot ORDER BY t.tier""".stripMargin) { (s, d) =>
      val dd = Tables.documents(s, d).select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("toks"),
          md5(col("text")).as("h_exact"),
          md5(trim(regexp_replace(regexp_replace(lower(col("text")),
            "[^a-z0-9 ]", " "), " +", " "))).as("h_norm"),
          md5(substring(col("text"), 1, 48)).as("h_prefix"))
        .localCheckpoint(true) // three tiers read one hashing pass
      val tot = dd.agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).cast("long").as("n_toks"))
      def tier(name: String, h: String): DataFrame =
        dd.groupBy(col(h))
          .agg(min_by(col("toks"), col("doc_id")).as("toks"))
          .agg(count(lit(1)).as("kept_docs"),
            sum(col("toks")).cast("long").as("kept_toks"))
          .withColumn("tier", lit(name))
      tier("exact", "h_exact")
        .unionByName(tier("normalized", "h_norm"))
        .unionByName(tier("prefix48", "h_prefix"))
        .crossJoin(broadcast(tot))
        .select(col("tier"), col("kept_docs"), col("kept_toks"),
          (col("n_docs") - col("kept_docs")).cast("long").as("removed_docs"),
          expr("(n_toks - kept_toks) * 1000 div n_toks").cast("long")
            .as("token_savings_permille"))
        .orderBy(col("tier"))
    },

    // ---- V48: recall@k curve for the deterministic index ----------------------
    // One number (recall@5) hides the shape; the CURVE — recall at
    // k = 1, 3, 5, 10 — is what an index tuning session reads. Both
    // the banded candidates and the exact truth rankings come from
    // single passes (v41's machinery); the k sweep is a 4-way fan-out
    // over the same two rank columns. Hash-gated end to end.
    QueryDef.sql(
      "v48_recall_curve",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
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
        |  SELECT c.query_id, c.cand_id,
        |    rank() OVER (PARTITION BY c.query_id ORDER BY
        |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*n.emb[i])),
        |        (x,y) -> x+y) DESC, c.cand_id) AS pr
        |  FROM cand c JOIN e q ON q.vec_id = c.query_id
        |  JOIN e n ON n.vec_id = c.cand_id),
        |truth AS (
        |  SELECT query_id, neighbor_id, tr FROM (
        |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |      rank() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*n.emb[i])),
        |          (x,y) -> x+y) DESC, n.vec_id) AS tr
        |    FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id <> q.vec_id)
        |  WHERE tr <= 10),
        |sweep AS (
        |  SELECT k.kk, t.query_id,
        |    CAST(count(s.cand_id) AS BIGINT) AS hits,
        |    CAST(count(*) AS BIGINT) AS want
        |  FROM truth t
        |  CROSS JOIN (SELECT unnest([1, 3, 5, 10]) AS kk) k
        |  LEFT JOIN scored s ON s.query_id = t.query_id
        |    AND s.cand_id = t.neighbor_id AND s.pr <= k.kk
        |  WHERE t.tr <= k.kk
        |  GROUP BY 1, 2)
        |SELECT CAST(kk AS INT) AS k,
        |  CAST(sum(hits) AS BIGINT) AS total_hits,
        |  CAST(sum(want) AS BIGINT) AS total_want,
        |  CAST(sum(hits) * 1000 // sum(want) AS BIGINT) AS recall_permille
        |FROM sweep GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      import graft.operators.VectorOps
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("emb"))
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
        .join(e.select(col("vec_id").as("cand_id"), col("emb").as("c_emb")), "cand_id")
        .select(col("query_id"), col("cand_id"),
          VectorOps.dot(col("q_emb"), col("c_emb")).as("dot"))
        .withColumn("pr", rank().over(Window.partitionBy(col("query_id"))
          .orderBy(col("dot").desc, col("cand_id"))))
        .select(col("query_id"), col("cand_id"), col("pr"))
      val truth = e.select(col("vec_id").as("neighbor_id"), col("emb").as("n_emb"))
        .join(broadcast(qe), col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          VectorOps.dot(col("q_emb"), col("n_emb")).as("dot"))
        .withColumn("tr", rank().over(Window.partitionBy(col("query_id"))
          .orderBy(col("dot").desc, col("neighbor_id"))))
        .filter(col("tr") <= 10)
        .select(col("query_id"), col("neighbor_id"), col("tr"))
        .localCheckpoint(true) // the 4-way k sweep reads the same rankings
      val ks = Seq(1, 3, 5, 10)
      val sweep = truth
        .crossJoin(broadcast(ks.toDF_(s, "kk")))
        .filter(col("tr") <= col("kk"))
        .join(scored.select(col("query_id").as("sq"), col("cand_id"), col("pr")),
          col("query_id") === col("sq") &&
            col("neighbor_id") === col("cand_id") && col("pr") <= col("kk"),
          "left")
        .groupBy(col("kk"), col("query_id"))
        .agg(count(col("cand_id")).as("hits"), count(lit(1)).as("want"))
      sweep.groupBy(col("kk").cast("int").as("k"))
        .agg(sum(col("hits")).cast("long").as("total_hits"),
          sum(col("want")).cast("long").as("total_want"),
          expr("cast(sum(hits) * 1000 div sum(want) as bigint)")
            .as("recall_permille"))
        .orderBy(col("k"))
    }
  )

  implicit private class SeqDf(val xs: Seq[Int]) {
    def toDF_(s: SparkSession, name: String): DataFrame = {
      import s.implicits._
      xs.toDF(name)
    }
  }
}
