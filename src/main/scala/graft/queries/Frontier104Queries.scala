package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-fourth frontier batch: deferred-acceptance matching,
  * tournament triad census, and team-draft interleaving evaluation.
  */
object Frontier104Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- J20: deferred acceptance (3 unrolled rounds) -------------------------
    // Two-sided matching on the observed supply relation: suppliers
    // rank parts by revenue earned, parts rank suppliers by quantity
    // delivered. Three rounds of the simultaneous-proposal variant
    // (round r: every still-free supplier proposes to its r-th choice;
    // each part holds the best-ranked proposer seen so far, bumping
    // its previous hold). Every tie breaks on keys, so the whole
    // mechanism is deterministic and hash-checkable — the same
    // fixed-round unrolling that made PageRank (d7) and label
    // propagation (a160) oracle-able. The blocking-pair audit at the
    // end counts depth<=3 pairs that would defect — the stability
    // deficit of stopping after three rounds.
    QueryDef.sql(
      "j20_deferred_acceptance",
      """WITH ps AS (
        |  SELECT l_suppkey AS s, l_partkey AS p,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |prefs AS (
        |  SELECT s, p, row_number() OVER (PARTITION BY s ORDER BY rev DESC, p)
        |    AS rs
        |  FROM ps),
        |prefp AS (
        |  SELECT s, p, row_number() OVER (PARTITION BY p ORDER BY qty DESC, s)
        |    AS rp
        |  FROM ps),
        |c1 AS (
        |  SELECT f.s, f.p, pp.rp FROM prefs f JOIN prefp pp
        |    ON pp.s = f.s AND pp.p = f.p
        |  WHERE f.rs = 1),
        |h1 AS (
        |  SELECT s, p, rp FROM (
        |    SELECT s, p, rp, row_number() OVER (PARTITION BY p ORDER BY rp) AS a
        |    FROM c1) WHERE a = 1),
        |p2 AS (
        |  SELECT f.s, f.p, pp.rp FROM prefs f JOIN prefp pp
        |    ON pp.s = f.s AND pp.p = f.p
        |  WHERE f.rs = 2 AND f.s NOT IN (SELECT s FROM h1)),
        |c2 AS (SELECT * FROM h1 UNION ALL SELECT * FROM p2),
        |h2 AS (
        |  SELECT s, p, rp FROM (
        |    SELECT s, p, rp, row_number() OVER (PARTITION BY p ORDER BY rp) AS a
        |    FROM c2) WHERE a = 1),
        |p3 AS (
        |  SELECT f.s, f.p, pp.rp FROM prefs f JOIN prefp pp
        |    ON pp.s = f.s AND pp.p = f.p
        |  WHERE f.rs = 3 AND f.s NOT IN (SELECT s FROM h2)),
        |c3 AS (SELECT * FROM h2 UNION ALL SELECT * FROM p3),
        |h3 AS (
        |  SELECT s, p, rp FROM (
        |    SELECT s, p, rp, row_number() OVER (PARTITION BY p ORDER BY rp) AS a
        |    FROM c3) WHERE a = 1),
        |cand AS (
        |  SELECT f.s, f.p, f.rs, pp.rp
        |  FROM prefs f JOIN prefp pp ON pp.s = f.s AND pp.p = f.p
        |  WHERE f.rs <= 3),
        |smatch AS (
        |  SELECT h.s, f.rs AS rs_cur FROM h3 h
        |  JOIN prefs f ON f.s = h.s AND f.p = h.p),
        |pmatch AS (SELECT p, rp AS rp_cur FROM h3),
        |blocking AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM cand c
        |  LEFT JOIN smatch sm ON sm.s = c.s
        |  LEFT JOIN pmatch pm ON pm.p = c.p
        |  WHERE (sm.rs_cur IS NULL OR c.rs < sm.rs_cur)
        |    AND (pm.rp_cur IS NULL OR c.rp < pm.rp_cur))
        |SELECT metric, value FROM (
        |  SELECT 'r1_matched' AS metric, CAST(count(*) AS BIGINT) AS value
        |    FROM h1
        |  UNION ALL SELECT 'r2_matched', CAST(count(*) AS BIGINT) FROM h2
        |  UNION ALL SELECT 'r3_matched', CAST(count(*) AS BIGINT) FROM h3
        |  UNION ALL SELECT 'unmatched_after_r3',
        |    (SELECT CAST(count(DISTINCT s) AS BIGINT) FROM ps)
        |      - (SELECT CAST(count(*) AS BIGINT) FROM h3)
        |  UNION ALL SELECT 'blocking_pairs_depth3', n FROM blocking)
        |ORDER BY metric""".stripMargin) { (s, d) =>
      val ps = Tables.lineitem(s, d)
        .groupBy(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).cast("long")
          .as("rev"),
          sum(floor(col("l_quantity")).cast("long")).cast("long").as("qty"))
        .localCheckpoint(true) // prefs, prefp and the supplier count read it
      // r5 opt: both preference ranks as CHAINED windows on one frame —
      // exchange by s → rank rs → exchange by p → rank rp — instead of
      // two window branches re-joined on (s, p), which cost a third
      // exchange plus a sort-merge join over the full pair table.
      // Identical values: the two windows are independent.
      val ranked = ps
        .withColumn("rs", row_number().over(
          Window.partitionBy(col("s")).orderBy(col("rev").desc, col("p"))))
        .withColumn("rp", row_number().over(
          Window.partitionBy(col("p")).orderBy(col("qty").desc, col("s"))))
        .select(col("s"), col("p"), col("rs"), col("rp"))
        .localCheckpoint(true) // each round and the blocking audit read it
      val prefs = ranked // (s, p, rs[, rp]) — the audit reads rs off it
      def hold(cand: DataFrame): DataFrame = cand
        .withColumn("a", row_number().over(
          Window.partitionBy(col("p")).orderBy(col("rp"))))
        .filter(col("a") === 1).select(col("s"), col("p"), col("rp"))
      val c1 = ranked.filter(col("rs") === 1).select(col("s"), col("p"), col("rp"))
      val h1 = hold(c1).localCheckpoint(true)
      val p2 = ranked.filter(col("rs") === 2)
        .join(broadcast(h1.select(col("s"))), Seq("s"), "left_anti")
        .select(col("s"), col("p"), col("rp"))
      val h2 = hold(h1.unionByName(p2)).localCheckpoint(true)
      val p3 = ranked.filter(col("rs") === 3)
        .join(broadcast(h2.select(col("s"))), Seq("s"), "left_anti")
        .select(col("s"), col("p"), col("rp"))
      val h3 = hold(h2.unionByName(p3)).localCheckpoint(true)
      val cand = ranked.filter(col("rs") <= 3)
      val smatch = h3.join(prefs.select(col("s"), col("p"), col("rs")),
        Seq("s", "p")).select(col("s"), col("rs").as("rs_cur"))
      val pmatch = h3.select(col("p"), col("rp").as("rp_cur"))
      val blocking = cand
        .join(smatch, Seq("s"), "left")
        .join(pmatch, Seq("p"), "left")
        .filter((col("rs_cur").isNull || col("rs") < col("rs_cur")) &&
          (col("rp_cur").isNull || col("rp") < col("rp_cur")))
        .agg(count(lit(1)).as("n"))
      val nSupp = ps.select(col("s")).distinct().agg(count(lit(1)).as("ns"))
      def metric(name: String, df: DataFrame): DataFrame =
        df.select(lit(name).as("metric"), col(df.columns.head).cast("long")
          .as("value"))
      metric("r1_matched", h1.agg(count(lit(1))))
        .unionByName(metric("r2_matched", h2.agg(count(lit(1)))))
        .unionByName(metric("r3_matched", h3.agg(count(lit(1)))))
        .unionByName(metric("unmatched_after_r3",
          nSupp.crossJoin(broadcast(h3.agg(count(lit(1)).as("nm"))))
            .select((col("ns") - col("nm")).as("v"))))
        .unionByName(metric("blocking_pairs_depth3", blocking))
        .orderBy(col("metric"))
    },

    // ---- A164: tournament triad census ----------------------------------------
    // Are pairwise "who beats whom" relations transitive? Nations play
    // a complete round-robin: i beats j when i's suppliers shipped
    // more cents to j's customers than the reverse (ties break to the
    // smaller key, keeping the tournament complete and deterministic).
    // The cyclic-triad count then needs NO triangle enumeration:
    // cyclic = C(n,3) - sum_i C(outdeg_i, 2) — Landau's identity turns
    // a cubic join into one out-degree aggregate. Rock-paper-scissors
    // trade cycles, counted exactly.
    QueryDef.sql(
      "a164_triad_census",
      """WITH flow AS (
        |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE s.s_nationkey <> c.c_nationkey
        |  GROUP BY 1, 2),
        |nk AS (SELECT DISTINCT n_nationkey AS k FROM nation),
        |pairs AS (
        |  SELECT a.k AS i, b.k AS j,
        |    coalesce(f1.cents, 0) AS ij, coalesce(f2.cents, 0) AS ji
        |  FROM nk a JOIN nk b ON a.k < b.k
        |  LEFT JOIN flow f1 ON f1.src = a.k AND f1.dst = b.k
        |  LEFT JOIN flow f2 ON f2.src = b.k AND f2.dst = a.k),
        |beats AS (
        |  SELECT CASE WHEN ij > ji THEN i WHEN ji > ij THEN j ELSE i END
        |    AS winner
        |  FROM pairs),
        |deg AS (
        |  SELECT winner, CAST(count(*) AS BIGINT) AS outdeg
        |  FROM beats GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nk),
        |agg AS (
        |  SELECT nn.n,
        |    nn.n * (nn.n - 1) * (nn.n - 2) // 6 AS total_triads,
        |    (SELECT CAST(sum(outdeg * (outdeg - 1) // 2) AS BIGINT) FROM deg)
        |      AS transitive
        |  FROM nn)
        |SELECT CAST(n AS BIGINT) AS n_nations,
        |  CAST(total_triads AS BIGINT) AS n_triads,
        |  CAST(total_triads - transitive AS BIGINT) AS n_cyclic,
        |  CAST((total_triads - transitive) * 1000 // total_triads AS BIGINT)
        |    AS cyclic_permille
        |FROM agg""".stripMargin) { (s, d) =>
      val flow = Tables.lineitem(s, d)
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
          .as("cents"))
      val nk = Tables.nation(s, d).select(col("n_nationkey").as("k")).distinct()
      val pairs = nk.as("a").join(nk.as("b"), col("a.k") < col("b.k"))
        .select(col("a.k").as("i"), col("b.k").as("j"))
        .join(broadcast(flow.select(col("src").as("i"), col("dst").as("j"),
          col("cents").as("ij"))), Seq("i", "j"), "left")
        .join(broadcast(flow.select(col("dst").as("i"), col("src").as("j"),
          col("cents").as("ji"))), Seq("i", "j"), "left")
        .select(col("i"), col("j"), coalesce(col("ij"), lit(0L)).as("ij"),
          coalesce(col("ji"), lit(0L)).as("ji"))
      val beats = pairs.select(
        when(col("ij") > col("ji"), col("i"))
          .when(col("ji") > col("ij"), col("j"))
          .otherwise(col("i")).as("winner"))
      val deg = beats.groupBy(col("winner"))
        .agg(count(lit(1)).cast("long").as("outdeg"))
      val trans = deg.agg(sum(expr("outdeg * (outdeg - 1) div 2")).cast("long")
        .as("transitive"))
      val nn = nk.agg(count(lit(1)).cast("long").as("n"))
      nn.crossJoin(broadcast(trans))
        .select(col("n").as("n_nations"),
          expr("n * (n - 1) * (n - 2) div 6").as("n_triads"),
          col("transitive"))
        .select(col("n_nations"), col("n_triads"),
          (col("n_triads") - col("transitive")).as("n_cyclic"),
          expr("""cast((n_triads - transitive) * 1000 div n_triads
            as bigint)""").as("cyclic_permille"))
    },

    // ---- V56: team-draft interleaving -----------------------------------------
    // Online ranker comparison without an A/B split: ranker A (brands
    // by revenue) and ranker B (brands by units) alternate picks —
    // each side drafts its best not-yet-shown brand — and the
    // interleaved list is served once. The strict-alternation draft is
    // a 20-step sequential construction, folded with the w15 HOF
    // pattern (the pick list is the state; each step filters its
    // team's ranking against it). "Clicks" are the deterministic
    // relevance proxy 'brand in both top-10s'; the cumulative click
    // columns read off which ranker the interleaving experiment
    // credits.
    QueryDef.sql(
      "v56_team_draft_interleave",
      """WITH base AS (
        |  SELECT p.p_brand,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS rev,
        |    CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1),
        |la AS (SELECT list(p_brand ORDER BY rev DESC, p_brand) AS a FROM base),
        |lb AS (SELECT list(p_brand ORDER BY qty DESC, p_brand) AS b FROM base),
        |drafted AS (
        |  SELECT list_reduce(
        |    list_prepend(CAST([] AS VARCHAR[]), list_transform(range(1, 21),
        |      i -> [CAST(i AS VARCHAR)])),
        |    (acc, e) -> list_append(acc,
        |      CASE WHEN CAST(e[1] AS INT) % 2 = 1
        |        THEN list_filter(la.a, x -> NOT list_contains(acc, x))[1]
        |        ELSE list_filter(lb.b, x -> NOT list_contains(acc, x))[1] END))
        |    AS picks
        |  FROM la, lb),
        |rel AS (
        |  SELECT p_brand,
        |    CASE WHEN row_number() OVER (ORDER BY rev DESC, p_brand) <= 10
        |      AND row_number() OVER (ORDER BY qty DESC, p_brand) <= 10
        |    THEN 1 ELSE 0 END AS relevant
        |  FROM base),
        |serp AS (
        |  SELECT u.pos, u.brand,
        |    CASE WHEN u.pos % 2 = 1 THEN 'A' ELSE 'B' END AS team,
        |    r.relevant
        |  FROM (SELECT unnest(picks) AS brand,
        |          unnest(generate_series(1, len(picks))) AS pos
        |        FROM drafted) u
        |  JOIN rel r ON r.p_brand = u.brand)
        |SELECT CAST(pos AS BIGINT) AS pos, brand, team,
        |  CAST(relevant AS BIGINT) AS relevant,
        |  CAST(sum(CASE WHEN team = 'A' THEN relevant ELSE 0 END)
        |    OVER (ORDER BY pos) AS BIGINT) AS cum_clicks_a,
        |  CAST(sum(CASE WHEN team = 'B' THEN relevant ELSE 0 END)
        |    OVER (ORDER BY pos) AS BIGINT) AS cum_clicks_b
        |FROM serp ORDER BY pos""".stripMargin) { (s, d) =>
      val base = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).cast("long")
          .as("rev"),
          sum(floor(col("l_quantity")).cast("long")).cast("long").as("qty"))
        .localCheckpoint(true) // both rank lists and the relevance set read it
      val lists = base.agg(
        expr("""transform(array_sort(collect_list(struct(-rev as nr,
          p_brand))), e -> e.p_brand)""").as("a"),
        expr("""transform(array_sort(collect_list(struct(-qty as nq,
          p_brand))), e -> e.p_brand)""").as("b"))
      val drafted = lists.select(expr(
        """aggregate(sequence(1, 20), cast(array() as array<string>),
          |  (acc, i) -> array_append(acc,
          |    IF(i % 2 = 1,
          |      element_at(filter(a, x -> NOT array_contains(acc, x)), 1),
          |      element_at(filter(b, x -> NOT array_contains(acc, x)), 1))))
          |""".stripMargin).as("picks"))
      val rel = base
        .withColumn("ra", row_number().over(Window.orderBy(col("rev").desc,
          col("p_brand"))))
        .withColumn("rb", row_number().over(Window.orderBy(col("qty").desc,
          col("p_brand"))))
        .select(col("p_brand"),
          when(col("ra") <= 10 && col("rb") <= 10, 1).otherwise(0).as("relevant"))
      val serp = drafted.select(posexplode(col("picks")).as(Seq("pos0", "brand")))
        .select((col("pos0") + 1).as("pos"), col("brand"))
        .join(broadcast(rel), col("brand") === col("p_brand"))
        .select(col("pos"), col("brand"),
          when(col("pos") % 2 === 1, "A").otherwise("B").as("team"),
          col("relevant"))
      serp.select(col("pos").cast("long").as("pos"), col("brand"), col("team"),
          col("relevant").cast("long").as("relevant"),
          expr("""cast(sum(case when team = 'A' then relevant else 0 end)
            over (order by pos) as bigint)""").as("cum_clicks_a"),
          expr("""cast(sum(case when team = 'B' then relevant else 0 end)
            over (order by pos) as bigint)""").as("cum_clicks_b"))
        .orderBy(col("pos"))
    }
  )
}
