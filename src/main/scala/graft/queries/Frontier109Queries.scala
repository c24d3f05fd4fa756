package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Hundred-ninth frontier batch: histogram cardinality-estimation audit,
  * widest-path routing on the max-min semiring, and stopword discovery
  * from document-frequency flatness.
  */
object Frontier109Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- U83: join cardinality estimation audit --------------------------------
    // The optimizer's bread-and-butter estimate — |R join S| from
    // bucketed key histograms under the uniformity assumption,
    // est_b = n_b^2 / d_b for the lineitem self-join on partkey —
    // audited against the EXACT join size computed as sum(cnt_k^2)
    // without materializing the join. Three bucket widths expose the
    // Jensen gap: the skewier the per-key counts inside a bucket, the
    // worse the uniform estimate undershoots, which is precisely why
    // engines escalate from histograms to distinct-count sketches.
    QueryDef.sql(
      "u83_cardinality_estimate",
      """WITH k AS (
        |  SELECT l_partkey AS pk, CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1),
        |actual AS (
        |  SELECT CAST(sum(cnt * cnt) AS BIGINT) AS act FROM k),
        |widths AS (SELECT unnest([64, 512, 4096]) AS w),
        |bucketed AS (
        |  SELECT w.w, k.pk // w.w AS b,
        |    CAST(sum(k.cnt) AS BIGINT) AS n_b,
        |    CAST(count(*) AS BIGINT) AS d_b
        |  FROM k CROSS JOIN widths w
        |  GROUP BY 1, 2),
        |est AS (
        |  SELECT w, CAST(sum(n_b * n_b // d_b) AS BIGINT) AS est,
        |    CAST(count(*) AS BIGINT) AS n_buckets
        |  FROM bucketed GROUP BY 1)
        |SELECT CAST(e.w AS INT) AS bucket_width, e.n_buckets,
        |  e.est AS estimated, a.act AS actual,
        |  CAST((e.est - a.act) * 1000 // a.act AS BIGINT) AS err_permille
        |FROM est e CROSS JOIN actual a
        |ORDER BY bucket_width""".stripMargin) { (s, d) =>
      val k = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("pk"))
        .agg(count(lit(1)).cast("long").as("cnt"))
        .localCheckpoint(true) // exact answer AND all three histograms read it
      val actual = k.agg(sum(col("cnt") * col("cnt")).cast("long").as("act"))
      val widths = s.range(0, 3).select(
        element_at(array(lit(64), lit(512), lit(4096)), col("id").cast("int") + 1)
          .as("w"))
      val bucketed = k.crossJoin(broadcast(widths))
        .groupBy(col("w"), expr("pk div w").as("b"))
        .agg(sum(col("cnt")).cast("long").as("n_b"),
          count(lit(1)).cast("long").as("d_b"))
      val est = bucketed.groupBy(col("w"))
        .agg(sum(expr("n_b * n_b div d_b")).cast("long").as("est"),
          count(lit(1)).cast("long").as("n_buckets"))
      est.crossJoin(broadcast(actual))
        .select(col("w").cast("int").as("bucket_width"), col("n_buckets"),
          col("est").as("estimated"), col("act").as("actual"),
          expr("(est - act) * 1000 div act").cast("long").as("err_permille"))
        .orderBy(col("bucket_width"))
    },

    // ---- A175: widest-path routing (max-min semiring) --------------------------
    // Bottleneck capacities on the nation trade graph: the widest
    // <=3-hop route between two nations maximizes the MINIMUM edge
    // capacity along the way — matrix "multiplication" over the
    // (max, min) semiring, the third semiring in the suite after
    // counting (a170: +,*) and shortest hops (a140: min,+). Two
    // rounds of a 25-node capacity join; the output keeps the pairs
    // where multi-hop routing strictly beats the direct link — the
    // capacity-arbitrage routes a flow planner would exploit.
    QueryDef.sql(
      "a175_widest_path",
      """WITH cap AS MATERIALIZED (
        |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cap
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE s.s_nationkey <> c.c_nationkey
        |  GROUP BY 1, 2),
        |w2 AS MATERIALIZED (
        |  SELECT a.src, b.dst,
        |    CAST(max(least(a.cap, b.cap)) AS BIGINT) AS cap
        |  FROM cap a JOIN cap b ON b.src = a.dst
        |  WHERE a.src <> b.dst
        |  GROUP BY 1, 2),
        |w2b AS MATERIALIZED (
        |  SELECT src, dst, CAST(max(cap) AS BIGINT) AS cap
        |  FROM (SELECT src, dst, cap FROM cap
        |        UNION ALL SELECT src, dst, cap FROM w2)
        |  GROUP BY 1, 2),
        |w3 AS MATERIALIZED (
        |  SELECT a.src, b.dst,
        |    CAST(max(least(a.cap, b.cap)) AS BIGINT) AS cap
        |  FROM w2b a JOIN cap b ON b.src = a.dst
        |  WHERE a.src <> b.dst
        |  GROUP BY 1, 2),
        |best AS (
        |  SELECT w.src, w.dst, w.cap AS widest3,
        |    coalesce(c.cap, 0) AS direct
        |  FROM w3 w LEFT JOIN cap c ON c.src = w.src AND c.dst = w.dst)
        |SELECT ns.n_name AS src_nation, nd.n_name AS dst_nation,
        |  b.direct AS direct_cents, b.widest3 AS widest3_cents,
        |  CAST(b.widest3 * 1000 // greatest(b.direct, 1) AS BIGINT)
        |    AS uplift_permille
        |FROM best b
        |JOIN nation ns ON ns.n_nationkey = b.src
        |JOIN nation nd ON nd.n_nationkey = b.dst
        |WHERE b.widest3 > b.direct
        |ORDER BY src_nation, dst_nation""".stripMargin) { (s, d) =>
      val cap = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).cast("long")
          .as("cap"))
        .localCheckpoint(true) // <= n^2 rows feeding every semiring round
      val w2 = cap.as("a")
        .join(cap.as("b"), col("b.src") === col("a.dst"))
        .filter(col("a.src") =!= col("b.dst"))
        .groupBy(col("a.src").as("src"), col("b.dst").as("dst"))
        .agg(max(least(col("a.cap"), col("b.cap"))).cast("long").as("cap"))
      val w2b = cap.select(col("src"), col("dst"), col("cap"))
        .unionByName(w2)
        .groupBy(col("src"), col("dst"))
        .agg(max(col("cap")).as("cap"))
      val w3 = w2b.as("a")
        .join(cap.as("b2"), col("b2.src") === col("a.dst"))
        .filter(col("a.src") =!= col("b2.dst"))
        .groupBy(col("a.src").as("src"), col("b2.dst").as("dst"))
        .agg(max(least(col("a.cap"), col("b2.cap"))).cast("long").as("cap"))
      val best = w3.select(col("src"), col("dst"), col("cap").as("widest3"))
        .join(cap.select(col("src"), col("dst"), col("cap").as("dcap")),
          Seq("src", "dst"), "left")
        .select(col("src"), col("dst"), col("widest3"),
          coalesce(col("dcap"), lit(0L)).as("direct"))
      best.filter(col("widest3") > col("direct"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("sk"), col("n_name").as("src_nation"))),
          col("sk") === col("src"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("dk"), col("n_name").as("dst_nation"))),
          col("dk") === col("dst"))
        .select(col("src_nation"), col("dst_nation"),
          col("direct").as("direct_cents"), col("widest3").as("widest3_cents"),
          expr("widest3 * 1000 div greatest(direct, 1)").cast("long")
            .as("uplift_permille"))
        .orderBy(col("src_nation"), col("dst_nation"))
    },

    // ---- T85: stopword discovery from distribution flatness --------------------
    // A term is a stopword candidate when it appears in nearly every
    // document AND spreads evenly across sources. Evenness is measured
    // by the Gini-Simpson impurity of the term's source distribution,
    // 1 - sum(p_s^2), kept exact as (cf^2 - sum(cnt_s^2)) * 1000 //
    // cf^2 — no entropy logarithm, so the score is bit-reproducible.
    // The full vocabulary is emitted here (it is bounded in this
    // corpus); a web-scale run floors on doc-frequency first, which
    // bounds the output without changing any retained row.
    QueryDef.sql(
      "t85_stopword_gini",
      """WITH docs AS (
        |  SELECT doc_id, source, unnest(list_distinct(
        |    regexp_extract_all(lower(text), '\S+'))) AS term
        |  FROM documents),
        |alltok AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |       FROM docs GROUP BY 1),
        |src AS (SELECT term, source, CAST(count(*) AS BIGINT) AS cnt
        |        FROM alltok GROUP BY 1, 2),
        |gin AS (
        |  SELECT term, CAST(sum(cnt) AS BIGINT) AS cf,
        |    CAST(sum(cnt * cnt) AS BIGINT) AS ss
        |  FROM src GROUP BY 1)
        |SELECT df.term, df.df, g.cf,
        |  CAST(df.df * 1000 // nd.n_docs AS BIGINT) AS df_permille,
        |  CAST((g.cf * g.cf - g.ss) * 1000 // (g.cf * g.cf) AS BIGINT)
        |    AS gini_permille,
        |  CAST(CASE WHEN df.df * 1000 // nd.n_docs >= 800
        |    AND (g.cf * g.cf - g.ss) * 1000 // (g.cf * g.cf) >= 600
        |    THEN 1 ELSE 0 END AS INT) AS is_stopword
        |FROM df JOIN gin g ON g.term = df.term CROSS JOIN nd
        |ORDER BY df.term""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(array_distinct(TextFunctions.tokens(col("text")))).as("term"))
      val alltok = Tables.documents(s, d)
        .select(col("source"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
      val nd = Tables.documents(s, d).agg(count(lit(1)).cast("long").as("n_docs"))
      val df = docs.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
      val src = alltok.groupBy(col("term"), col("source"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      val gin = src.groupBy(col("term"))
        .agg(sum(col("cnt")).cast("long").as("cf"),
          sum(col("cnt") * col("cnt")).cast("long").as("ss"))
      df.join(gin, Seq("term")).crossJoin(broadcast(nd))
        .select(col("term"), col("df"), col("cf"),
          expr("df * 1000 div n_docs").cast("long").as("df_permille"),
          expr("(cf * cf - ss) * 1000 div (cf * cf)").cast("long")
            .as("gini_permille"),
          when(expr("df * 1000 div n_docs") >= 800 &&
            expr("(cf * cf - ss) * 1000 div (cf * cf)") >= 600, 1)
            .otherwise(0).cast("int").as("is_stopword"))
        .orderBy(col("term"))
    }
  )
}
