package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Ninety-first frontier batch: CKA representation similarity, Merkle
  * root attestation, code-switch detection.
  */
object Frontier91Queries {

  /** Ten unrolled Merkle levels over the 1024 bucket digests. */
  private val merkleOracle: String = {
    val sb = new StringBuilder
    sb ++= """WITH rows_ AS (
      |  SELECT o_orderkey % 1024 AS b,
      |    md5(CAST(o_orderkey AS VARCHAR) || ':' ||
      |      CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR)) AS rh
      |  FROM orders),
      |nrows AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM rows_),
      |l0 AS (
      |  SELECT b AS idx, md5(string_agg(rh, '' ORDER BY rh)) AS h
      |  FROM rows_ GROUP BY b),
      |nleaf AS (SELECT CAST(count(*) AS BIGINT) AS n_leaves FROM l0)""".stripMargin
    for (l <- 1 to 10) {
      val p = l - 1
      sb ++= s""",
        |l$l AS (
        |  SELECT idx // 2 AS idx, md5(string_agg(h, '' ORDER BY idx)) AS h
        |  FROM l$p GROUP BY idx // 2)""".stripMargin
    }
    sb ++= """
      |SELECT l10.h AS merkle_root, nleaf.n_leaves, nrows.n_rows
      |FROM l10 CROSS JOIN nleaf CROSS JOIN nrows""".stripMargin
    sb.toString
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- V55: linear CKA representation similarity ----------------------------
    // The interpretability community's standard "do two representations
    // agree?" metric: linear Centered Kernel Alignment between
    // embedding VIEWS (first 32 dims, last 32 dims, full 64). All
    // centered cross-covariance entries are exact wide integers
    // (E_ab = n²P_ab − n·S_a·S_b from one 64×64 moment pass — the
    // same second-moment machinery that kills pair enumeration in
    // MMD), every Frobenius block-sum is exact, and only the final
    // ratio touches doubles (one cast per operand, round 6).
    QueryDef.sql(
      "v55_cka_similarity",
      """WITH e AS (
        |  SELECT vec_id, list_transform(range(1, 65),
        |    i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)) AS q
        |  FROM embeddings),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
        |p AS (
        |  SELECT i.i,
        |    CAST(sum(q[(i.i - 1) // 64 + 1] * q[(i.i - 1) % 64 + 1]) AS BIGINT) AS pv
        |  FROM e, (SELECT unnest(generate_series(1, 4096)) AS i) i
        |  GROUP BY 1),
        |sums AS (
        |  SELECT j.j, CAST(sum(q[j.j]) AS BIGINT) AS sv
        |  FROM e, (SELECT unnest(generate_series(1, 64)) AS j) j
        |  GROUP BY 1),
        |ee AS (
        |  SELECT (p.i - 1) // 64 + 1 AS a, (p.i - 1) % 64 + 1 AS b,
        |    CAST(nn.n AS HUGEINT) * nn.n * p.pv
        |      - CAST(nn.n AS HUGEINT) * sa.sv * sb.sv AS ev
        |  FROM p
        |  JOIN sums sa ON sa.j = (p.i - 1) // 64 + 1
        |  JOIN sums sb ON sb.j = (p.i - 1) % 64 + 1
        |  CROSS JOIN nn),
        |blocks AS (
        |  SELECT
        |    sum(CASE WHEN a <= 32 AND b <= 32 THEN ev * ev END) AS saa,
        |    sum(CASE WHEN a > 32 AND b > 32 THEN ev * ev END) AS sbb,
        |    sum(CASE WHEN a <= 32 AND b > 32 THEN ev * ev END) AS sab,
        |    sum(ev * ev) AS sff,
        |    sum(CASE WHEN b <= 32 THEN ev * ev END) AS sfa,
        |    sum(CASE WHEN b > 32 THEN ev * ev END) AS sfb
        |  FROM ee)
        |SELECT pair, round(num / (sqrt(d1) * sqrt(d2)), 6) AS cka FROM (
        |  SELECT 'halfA_vs_halfB' AS pair, CAST(sab AS DOUBLE) AS num,
        |    CAST(saa AS DOUBLE) AS d1, CAST(sbb AS DOUBLE) AS d2 FROM blocks
        |  UNION ALL
        |  SELECT 'full_vs_halfA', CAST(sfa AS DOUBLE), CAST(sff AS DOUBLE),
        |    CAST(saa AS DOUBLE) FROM blocks
        |  UNION ALL
        |  SELECT 'full_vs_halfB', CAST(sfb AS DOUBLE), CAST(sff AS DOUBLE),
        |    CAST(sbb AS DOUBLE) FROM blocks)
        |ORDER BY pair""".stripMargin) { (s, d) =>
      // r5 opt: spread the single-row-group scan by vec_id BEFORE the
      // checkpoint — both dim²-element posexplode passes below read the
      // checkpointed partitioning, so without this they serialize on
      // one core (integer sums: results partition-invariant).
      val e = graft.operators.Spread.by(Tables.embeddings(s, d), col("vec_id"))
        .select(col("vec_id"),
          transform(col("embedding"),
            x => floor(x.cast("double") * lit(1000)).cast("long")).as("q"))
        .localCheckpoint(true) // moments and column sums read one quantize pass
      val nn = e.agg(count(lit(1)).as("n"))
      val p = e
        .select(posexplode(expr("flatten(transform(q, x -> transform(q, y -> x * y)))"))
          .as(Seq("p0", "v")))
        .groupBy((col("p0") + 1).as("i"))
        .agg(sum(col("v")).cast("long").as("pv"))
      val sums = e
        .select(posexplode(col("q")).as(Seq("j0", "v")))
        .groupBy((col("j0") + 1).as("j"))
        .agg(sum(col("v")).cast("long").as("sv"))
      val ee = p
        .withColumn("a", expr("(i - 1) div 64 + 1"))
        .withColumn("b", expr("(i - 1) % 64 + 1"))
        .join(broadcast(sums.select(col("j").as("a"), col("sv").as("sa"))), "a")
        .join(broadcast(sums.select(col("j").as("b"), col("sv").as("sb"))), "b")
        .crossJoin(broadcast(nn))
        .select(col("a"), col("b"),
          expr("""cast(n as decimal(38,0)) * n * pv
            - cast(n as decimal(38,0)) * sa * sb""").as("ev"))
      val blocks = ee.agg(
        sum(when(col("a") <= 32 && col("b") <= 32, expr("ev * ev"))).as("saa"),
        sum(when(col("a") > 32 && col("b") > 32, expr("ev * ev"))).as("sbb"),
        sum(when(col("a") <= 32 && col("b") > 32, expr("ev * ev"))).as("sab"),
        sum(expr("ev * ev")).as("sff"),
        sum(when(col("b") <= 32, expr("ev * ev"))).as("sfa"),
        sum(when(col("b") > 32, expr("ev * ev"))).as("sfb"))
        .localCheckpoint(true) // three output rows read one block pass
      def rowOf(pair: String, num: String, d1: String, d2: String): DataFrame =
        blocks.select(lit(pair).as("pair"),
          round(col(num).cast("double") /
            (sqrt(col(d1).cast("double")) * sqrt(col(d2).cast("double"))), 6)
            .as("cka"))
      rowOf("halfA_vs_halfB", "sab", "saa", "sbb")
        .unionByName(rowOf("full_vs_halfA", "sfa", "sff", "saa"))
        .unionByName(rowOf("full_vs_halfB", "sfb", "sff", "sbb"))
        .orderBy(col("pair"))
    },

    // ---- U70: Merkle root attestation -----------------------------------------
    // The tamper-evident fingerprint a data-sharing contract pins: row
    // hashes roll into 1024 order-independent bucket digests (sorted
    // string_agg under md5), then TEN fixed tree levels — each parent
    // the md5 of its children's digests in index order — produce one
    // root. Bucketing bounds the tree at any scale (the per-level
    // shuffle shrinks 2×each round); odd/missing siblings promote
    // deterministically through the same concat rule on both engines.
    QueryDef.sql("u70_merkle_root", merkleOracle) { (s, d) =>
      val rows = Tables.orders(s, d)
        .select((col("o_orderkey") % 1024).as("b"),
          md5(concat(col("o_orderkey").cast("string"), lit(":"),
            floor(col("o_totalprice") * 100).cast("long").cast("string"))).as("rh"))
        .localCheckpoint(true) // leaf digests and the row count read it
      val nrows = rows.agg(count(lit(1)).as("n_rows"))
      var level = rows
        .groupBy(col("b").as("idx"))
        .agg(md5(concat_ws("",
          expr("transform(array_sort(collect_list(rh)), x -> x)"))).as("h"))
        .localCheckpoint(true)
      val nleaf = level.agg(count(lit(1)).as("n_leaves"))
      for (_ <- 1 to 10) {
        level = level
          .select(expr("idx div 2").as("idx"), struct(col("idx"), col("h")).as("ih"))
          .groupBy(col("idx"))
          .agg(md5(concat_ws("",
            expr("transform(array_sort(collect_list(ih)), x -> x.h)"))).as("h"))
          .localCheckpoint(true)
      }
      level.select(col("h").as("merkle_root"))
        .crossJoin(broadcast(nleaf)).crossJoin(broadcast(nrows))
    },

    // ---- T78: code-switch detection -------------------------------------------
    // Mixed-language documents poison monolingual training shards but
    // pass whole-document language ID. Split each document at the
    // midpoint, classify each half independently with the t3 marker
    // rule, and report per labeled language how many documents
    // disagree between halves — the curation signal that routes a doc
    // to a mixed-language shard instead of silently diluting one.
    QueryDef.sql(
      "t78_code_switch",
      """WITH halves AS (
        |  SELECT doc_id, lang,
        |    substring(text, 1, CAST(length(text) // 2 AS INT)) AS h1,
        |    substring(text, CAST(length(text) // 2 AS INT) + 1) AS h2
        |  FROM documents),
        |cls AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN e1 >= f1 AND e1 >= s1 AND e1 >= d1 THEN 'en'
        |         WHEN f1 >= s1 AND f1 >= d1 THEN 'fr'
        |         WHEN s1 >= d1 THEN 'es' ELSE 'de' END AS p1,
        |    CASE WHEN e2 >= f2 AND e2 >= s2 AND e2 >= d2 THEN 'en'
        |         WHEN f2 >= s2 AND f2 >= d2 THEN 'fr'
        |         WHEN s2 >= d2 THEN 'es' ELSE 'de' END AS p2
        |  FROM (
        |    SELECT doc_id, lang,
        |      len(list_filter(string_split(h1, ' '), w -> w IN ('the','a','and'))) AS e1,
        |      len(list_filter(string_split(h1, ' '), w -> w IN ('le','la','et'))) AS f1,
        |      len(list_filter(string_split(h1, ' '), w -> w IN ('el','los','y'))) AS s1,
        |      len(list_filter(string_split(h1, ' '), w -> w IN ('der','und','die'))) AS d1,
        |      len(list_filter(string_split(h2, ' '), w -> w IN ('the','a','and'))) AS e2,
        |      len(list_filter(string_split(h2, ' '), w -> w IN ('le','la','et'))) AS f2,
        |      len(list_filter(string_split(h2, ' '), w -> w IN ('el','los','y'))) AS s2,
        |      len(list_filter(string_split(h2, ' '), w -> w IN ('der','und','die'))) AS d2
        |    FROM halves))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN p1 <> p2 THEN 1 ELSE 0 END) AS BIGINT) AS n_switched,
        |  CAST(sum(CASE WHEN p1 <> p2 THEN 1 ELSE 0 END) * 1000 // count(*)
        |    AS BIGINT) AS switch_permille
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      def hits(c: org.apache.spark.sql.Column, ws: String*) =
        size(filter(split(c, " "), w => w.isin(ws.map(x => x: Any): _*))).cast("long")
      def pred(e: org.apache.spark.sql.Column, f: org.apache.spark.sql.Column,
               sp: org.apache.spark.sql.Column, de: org.apache.spark.sql.Column) =
        when(e >= f && e >= sp && e >= de, "en")
          .when(f >= sp && f >= de, "fr")
          .when(sp >= de, "es").otherwise("de")
      val halves = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          expr("substring(text, 1, cast(length(text) div 2 as int))").as("h1"),
          expr("substring(text, cast(length(text) div 2 as int) + 1)").as("h2"))
      val cls = halves.select(col("doc_id"), col("lang"),
        pred(hits(col("h1"), "the", "a", "and"), hits(col("h1"), "le", "la", "et"),
          hits(col("h1"), "el", "los", "y"), hits(col("h1"), "der", "und", "die"))
          .as("p1"),
        pred(hits(col("h2"), "the", "a", "and"), hits(col("h2"), "le", "la", "et"),
          hits(col("h2"), "el", "los", "y"), hits(col("h2"), "der", "und", "die"))
          .as("p2"))
      cls.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("p1") =!= col("p2"), 1).otherwise(0)).cast("long")
            .as("n_switched"))
        .select(col("lang"), col("n_docs"), col("n_switched"),
          expr("cast(n_switched * 1000 div n_docs as bigint)").as("switch_permille"))
        .orderBy(col("lang"))
    }
  )
}
