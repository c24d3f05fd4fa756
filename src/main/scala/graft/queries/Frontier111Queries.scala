package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Hundred-eleventh frontier batch: synchronous label-propagation
  * communities, inverted-index posting-gap compression sizing (Elias
  * gamma / delta / varbyte), and a Benford first-digit audit.
  */
object Frontier111Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A177: synchronous label propagation -----------------------------------
    // Community detection by iterated neighbor vote (Raghavan et al.,
    // 2007) on the symmetrized nation trade graph: each node adopts
    // the label carrying the largest total edge weight among its
    // neighbors' CURRENT labels; ties break to the smallest label so
    // three synchronous rounds are fully deterministic (the classic
    // async/random variant is not oracle-able). Pure neighbor vote —
    // a node's own label only persists by coming back through its
    // neighbors, which is what makes the label fronts move. Each
    // round is one broadcast-sized join + argmax; the edge list is
    // checkpointed once and never reshuffles.
    QueryDef.sql(
      "a177_label_propagation",
      """WITH dir AS (
        |  SELECT s.s_nationkey AS a, c.c_nationkey AS b,
        |    CAST(count(*) AS BIGINT) AS w
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE s.s_nationkey <> c.c_nationkey
        |  GROUP BY 1, 2),
        |e AS MATERIALIZED (
        |  SELECT a, b, CAST(sum(w) AS BIGINT) AS w
        |  FROM (SELECT a, b, w FROM dir
        |        UNION ALL SELECT b AS a, a AS b, w FROM dir)
        |  GROUP BY 1, 2),
        |l0 AS (SELECT DISTINCT a AS node, a AS lbl FROM e),
        |v1 AS (
        |  SELECT e.a AS node, l.lbl, CAST(sum(e.w) AS BIGINT) AS vw
        |  FROM e JOIN l0 l ON l.node = e.b GROUP BY 1, 2),
        |l1 AS MATERIALIZED (
        |  SELECT node, lbl FROM (
        |    SELECT node, lbl, row_number() OVER
        |      (PARTITION BY node ORDER BY vw DESC, lbl) AS rn
        |    FROM v1) WHERE rn = 1),
        |v2 AS (
        |  SELECT e.a AS node, l.lbl, CAST(sum(e.w) AS BIGINT) AS vw
        |  FROM e JOIN l1 l ON l.node = e.b GROUP BY 1, 2),
        |l2 AS MATERIALIZED (
        |  SELECT node, lbl FROM (
        |    SELECT node, lbl, row_number() OVER
        |      (PARTITION BY node ORDER BY vw DESC, lbl) AS rn
        |    FROM v2) WHERE rn = 1),
        |v3 AS (
        |  SELECT e.a AS node, l.lbl, CAST(sum(e.w) AS BIGINT) AS vw
        |  FROM e JOIN l2 l ON l.node = e.b GROUP BY 1, 2),
        |l3 AS (
        |  SELECT node, lbl FROM (
        |    SELECT node, lbl, row_number() OVER
        |      (PARTITION BY node ORDER BY vw DESC, lbl) AS rn
        |    FROM v3) WHERE rn = 1)
        |SELECT n.n_name AS nation,
        |  CAST(l1.lbl AS BIGINT) AS label_r1,
        |  CAST(l2.lbl AS BIGINT) AS label_r2,
        |  CAST(l3.lbl AS BIGINT) AS label_r3,
        |  CAST(count(*) OVER (PARTITION BY l3.lbl) AS BIGINT) AS community_size
        |FROM l3
        |JOIN l2 ON l2.node = l3.node
        |JOIN l1 ON l1.node = l3.node
        |JOIN nation n ON n.n_nationkey = l3.node
        |ORDER BY nation""".stripMargin) { (s, d) =>
      val dir = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").as("a"), col("c_nationkey").as("b"))
        .agg(count(lit(1)).cast("long").as("w"))
      val e = dir.unionByName(
          dir.select(col("b").as("a"), col("a").as("b"), col("w")))
        .groupBy(col("a"), col("b")).agg(sum(col("w")).cast("long").as("w"))
        .localCheckpoint(true) // <= n^2 rows feeding all three vote rounds
      val l0 = e.select(col("a").as("node"), col("a").as("lbl")).distinct()
      def round(labels: DataFrame): DataFrame = {
        val votes = e
          .join(labels.select(col("node").as("b"), col("lbl")), Seq("b"))
          .groupBy(col("a").as("node"), col("lbl"))
          .agg(sum(col("w")).cast("long").as("vw"))
        votes
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("node"))
              .orderBy(col("vw").desc, col("lbl"))))
          .filter(col("rn") === 1).select(col("node"), col("lbl"))
          .localCheckpoint(true) // 25 rows; truncate the iterative lineage
      }
      val l1 = round(l0)
      val l2 = round(l1)
      val l3 = round(l2)
      l3.select(col("node"), col("lbl").as("lbl3"))
        .join(l2.select(col("node"), col("lbl").as("lbl2")), Seq("node"))
        .join(l1.select(col("node"), col("lbl").as("lbl1")), Seq("node"))
        .withColumn("community_size",
          count(lit(1)).over(Window.partitionBy(col("lbl3"))).cast("long"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("node"), col("n_name").as("nation"))),
          Seq("node"))
        .select(col("nation"), col("lbl1").cast("long").as("label_r1"),
          col("lbl2").cast("long").as("label_r2"),
          col("lbl3").cast("long").as("label_r3"), col("community_size"))
        .orderBy(col("nation"))
    },

    // ---- T87: posting-gap compression sizing -----------------------------------
    // The inverted-index storage question: docid posting lists per
    // term, delta-gapped within each source, priced under Elias gamma
    // (2*floor(log2 g)+1 bits), Elias delta (floor(log2 g) + gamma of
    // the length), and varbyte (8 bits per started 7-bit group) —
    // every length derived from length(bin(g)), so the sizing is
    // exact integer arithmetic with no logarithm. The raw baseline is
    // ceil(log2 n_docs) bits per posting. Gamma wins on gap-1-heavy
    // common terms, varbyte on sparse terms — the per-source census
    // shows the crossover an index format has to straddle.
    QueryDef.sql(
      "t87_gap_encoding",
      """WITH dpos AS (
        |  SELECT source, doc_id, row_number() OVER
        |    (PARTITION BY source ORDER BY doc_id) AS pos
        |  FROM documents),
        |nd AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents
        |  GROUP BY 1),
        |post AS (
        |  SELECT DISTINCT source, term, pos FROM (
        |    SELECT d.source, dpos.pos, unnest(list_distinct(
        |      regexp_extract_all(lower(d.text), '\S+'))) AS term
        |    FROM documents d
        |    JOIN dpos ON dpos.source = d.source AND dpos.doc_id = d.doc_id)),
        |gaps AS (
        |  SELECT source, term,
        |    pos - coalesce(lag(pos) OVER
        |      (PARTITION BY source, term ORDER BY pos), 0) AS g
        |  FROM post),
        |bits AS (
        |  SELECT source, g,
        |    CAST(length(bin(g)) AS BIGINT) AS bl,
        |    CAST(length(bin(CAST(length(bin(g)) AS BIGINT))) AS BIGINT) AS bll
        |  FROM gaps)
        |SELECT b.source, nd.n_docs,
        |  CAST(count(*) AS BIGINT) AS postings,
        |  CAST(sum(2 * (b.bl - 1) + 1) AS BIGINT) AS gamma_bits,
        |  CAST(sum((b.bl - 1) + 2 * (b.bll - 1) + 1) AS BIGINT) AS delta_bits,
        |  CAST(sum(8 * ((b.bl + 6) // 7)) AS BIGINT) AS varbyte_bits,
        |  CAST(count(*) * (CASE WHEN nd.n_docs = 1 THEN 1
        |    ELSE CAST(length(bin(nd.n_docs - 1)) AS BIGINT) END) AS BIGINT)
        |    AS raw_bits,
        |  CAST(count(*) FILTER (WHERE b.g = 1) * 1000 // count(*) AS BIGINT)
        |    AS gap1_permille
        |FROM bits b JOIN nd ON nd.source = b.source
        |GROUP BY b.source, nd.n_docs
        |ORDER BY b.source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val dpos = docs.select(col("source"), col("doc_id"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      val nd = docs.groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"))
      val post = docs
        .select(col("source"), col("doc_id"),
          explode(array_distinct(TextFunctions.tokens(col("text")))).as("term"))
        .join(dpos, Seq("source", "doc_id"))
        .select(col("source"), col("term"), col("pos")).distinct()
      val gaps = post.withColumn("g",
        col("pos") - coalesce(lag(col("pos"), 1).over(
          Window.partitionBy(col("source"), col("term")).orderBy(col("pos"))),
          lit(0)))
      val bits = gaps.select(col("source"),
          col("g"), length(bin(col("g"))).cast("long").as("bl"))
        .withColumn("bll", length(bin(col("bl"))).cast("long"))
      bits.join(broadcast(nd), Seq("source"))
        .groupBy(col("source"), col("n_docs"))
        .agg(count(lit(1)).cast("long").as("postings"),
          sum(lit(2) * (col("bl") - 1) + 1).cast("long").as("gamma_bits"),
          sum((col("bl") - 1) + lit(2) * (col("bll") - 1) + 1).cast("long")
            .as("delta_bits"),
          sum(lit(8) * expr("(bl + 6) div 7")).cast("long").as("varbyte_bits"),
          (count(lit(1)) *
            when(col("n_docs") === 1, 1L)
              .otherwise(length(bin(col("n_docs") - 1)).cast("long")).cast("long"))
            .cast("long").as("raw_bits"),
          expr("count(case when g = 1 then 1 end) * 1000 div count(1)")
            .cast("long").as("gap1_permille"))
        .select(col("source"), col("n_docs"), col("postings"), col("gamma_bits"),
          col("delta_bits"), col("varbyte_bits"), col("raw_bits"),
          col("gap1_permille"))
        .orderBy(col("source"))
    },

    // ---- A178: Benford first-digit audit ---------------------------------------
    // The fraud-screening classic: first significant digits of
    // amounts spanning orders of magnitude should follow
    // P(d) = log10(1 + 1/d). The law's permille weights are baked as
    // integer constants (301, 176, ..., 46 — they sum to exactly
    // 1000), so observed-vs-expected deviation and the per-flag total
    // variation distance are pure integer arithmetic on the exact
    // cent-denominated prices — no runtime logarithm, bit-identical
    // in both engines.
    QueryDef.sql(
      "a178_benford",
      """WITH v AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(substr(CAST(CAST(floor(l_extendedprice * 100) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS BIGINT) AS d
        |  FROM lineitem),
        |cnt AS (
        |  SELECT flag, d, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |tot AS (SELECT flag, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
        |dev AS (
        |  SELECT c.flag, c.d, c.c, t.n,
        |    CAST(c.c * 1000 // t.n AS BIGINT) AS obs_permille,
        |    CAST([301,176,125,97,79,67,58,51,46][c.d] AS BIGINT) AS exp_permille
        |  FROM cnt c JOIN tot t ON t.flag = c.flag)
        |SELECT flag, CAST(d AS INT) AS first_digit, c AS cnt,
        |  obs_permille, exp_permille,
        |  obs_permille - exp_permille AS dev_permille,
        |  CAST(sum(abs(obs_permille - exp_permille))
        |    OVER (PARTITION BY flag) // 2 AS BIGINT) AS tvd_permille
        |FROM dev
        |ORDER BY flag, first_digit""".stripMargin) { (s, d) =>
      val benford = array(Seq(301, 176, 125, 97, 79, 67, 58, 51, 46)
        .map(x => lit(x.toLong)): _*)
      val v = Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
        substring(floor(col("l_extendedprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("long").as("d"))
      val cnt = v.groupBy(col("flag"), col("d"))
        .agg(count(lit(1)).cast("long").as("c"))
      val tot = cnt.groupBy(col("flag")).agg(sum(col("c")).cast("long").as("n"))
      cnt.join(broadcast(tot), Seq("flag"))
        .select(col("flag"), col("d"), col("c"), col("n"),
          expr("c * 1000 div n").cast("long").as("obs_permille"),
          element_at(benford, col("d").cast("int")).as("exp_permille"))
        .select(col("flag"), col("d").cast("int").as("first_digit"),
          col("c").as("cnt"), col("obs_permille"), col("exp_permille"),
          (col("obs_permille") - col("exp_permille")).as("dev_permille"),
          expr("sum(abs(obs_permille - exp_permille)) " +
            "over (partition by flag) div 2").cast("long")
            .as("tvd_permille"))
        .orderBy(col("flag"), col("first_digit"))
    }
  )
}
