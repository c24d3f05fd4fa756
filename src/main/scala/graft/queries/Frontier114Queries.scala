package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-fourteenth frontier batch: graph suite — Borůvka maximum
  * spanning tree where the ORACLE solves the same problem with a
  * completely different algorithm (the cut property via recursive
  * reachability over strictly-heavier edges), bounded-hop harmonic
  * centrality on the sparse top-3-partner digraph, and the alpha-miner
  * footprint matrix from process mining.
  */
object Frontier114Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A184: Borůvka maximum spanning tree vs a cut-property oracle ----------
    // The trade backbone: the unique max-weight spanning forest of the
    // symmetrized nation trade graph (weights made distinct by folding
    // the node pair into the low digits: ew = cents*1e6 + u*1000 + v).
    // Spark runs 5 rounds of Borůvka — each component picks its
    // heaviest incident edge (one tiny row_number window), components
    // contract by pointer-doubling the best-neighbor map to its
    // mutual-pair 2-cycle and rooting at the smaller label — the
    // textbook parallel MST, every round a handful of joins over
    // <=25-row broadcast tables after ONE aggregation of the fact
    // table. The oracle never runs Borůvka: by the cut property an
    // edge is in the max-ST iff its endpoints are NOT connected using
    // strictly heavier edges alone, a recursive-CTE reachability per
    // candidate edge. Two algorithms, one unique tree — a far stronger
    // check than replaying the same recurrence on both sides.
    QueryDef.sql(
      "a184_max_spanning_tree",
      """WITH RECURSIVE pairs AS (
        |  SELECT s.s_nationkey AS sn, c.c_nationkey AS cn,
        |    CAST(floor(l.l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE s.s_nationkey <> c.c_nationkey),
        |und AS (
        |  SELECT least(sn, cn) AS u, greatest(sn, cn) AS v,
        |    CAST(sum(cents) AS BIGINT) AS w
        |  FROM pairs GROUP BY 1, 2),
        |cand AS (
        |  SELECT u, v, w, w * 1000000 + u * 1000 + v AS ew FROM und),
        |dir AS (
        |  SELECT u AS src, v AS dst, ew FROM cand
        |  UNION ALL SELECT v, u, ew FROM cand),
        |reach AS (
        |  SELECT c.ew AS id, c.u AS node FROM cand c
        |  UNION
        |  SELECT r.id, d.dst FROM reach r
        |  JOIN dir d ON d.src = r.node AND d.ew > r.id)
        |SELECT ns.n_name AS src_nation, nd.n_name AS dst_nation,
        |  c.w AS trade_cents
        |FROM cand c
        |JOIN nation ns ON ns.n_nationkey = c.u
        |JOIN nation nd ON nd.n_nationkey = c.v
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM reach r WHERE r.id = c.ew AND r.node = c.v)
        |ORDER BY src_nation, dst_nation""".stripMargin) { (s, d) =>
      val pairs = Tables.lineitem(s, d).as("l")
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey"))
        .select(col("s_nationkey").as("sn"), col("c_nationkey").as("cn"),
          floor(col("l_extendedprice") * 100).cast("long").as("cents"))
      val und = pairs
        .groupBy(least(col("sn"), col("cn")).as("u"),
          greatest(col("sn"), col("cn")).as("v"))
        .agg(sum(col("cents")).cast("long").as("w"))
        .withColumn("ew", expr("w * 1000000 + u * 1000 + v"))
        .localCheckpoint(true) // every Borůvka round reads this 300-row table
      val dir = und.select(col("u").as("src"), col("v").as("dst"),
          col("ew"), col("u"), col("v"))
        .unionByName(und.select(col("v").as("src"), col("u").as("dst"),
          col("ew"), col("u"), col("v")))
      var comp = und.select(explode(array(col("u"), col("v"))).as("node"))
        .distinct().withColumn("c", col("node")).localCheckpoint(true)
      var mstParts = List.empty[DataFrame]
      // Driver-controlled rounds over <=25-row metadata tables (the
      // DupComponents pattern): exit as soon as no cross-component edge
      // remains. Every intermediate is localCheckpointed — rebuilt
      // uncheckpointed self-join towers trigger pathological analyzer
      // times even on empty inputs (measured: 40 s for a 0-row join).
      var done = false
      var round = 0
      while (!done && round < 6) {
        round += 1
        val e2 = dir
          .join(comp.select(col("node").as("src"), col("c").as("csrc")), Seq("src"))
          .join(comp.select(col("node").as("dst"), col("c").as("cdst")), Seq("dst"))
          .filter(col("csrc") =!= col("cdst"))
        val best = e2
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("csrc")).orderBy(col("ew").desc)))
          .filter(col("rn") === 1)
          .select(col("csrc").as("c"), col("cdst").as("n"), col("u"), col("v"))
          .localCheckpoint(true) // <=25 rows; truncates the round's lineage
        // r5 opt: the best-edge map is bounded by the NATION domain
        // (<=25 rows of metadata), so the pointer chase runs on the
        // driver — the k-means-model shape — instead of 5 eager
        // self-join localCheckpoints per round (the old tower was ~40
        // scheduled jobs of pure overhead for the whole query). The
        // driver fold below is the EXACT semantics of the former
        // DataFrame pointer doubling: 5 rounds of n' = m(m(c)) with
        // dead-end fallback, then the mutual-pair 2-cycle collapse.
        val bmRows = best.select(col("c").cast("long"), col("n").cast("long"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
        if (bmRows.isEmpty) done = true
        else {
          mstParts ::= best.select(col("u"), col("v"))
          val bm = bmRows.toMap
          var m = bm
          for (_ <- 1 to 5) // pointer doubling: lands on the mutual-pair 2-cycle
            m = m.map { case (c0, n0) => c0 -> m.getOrElse(n0, n0) }
          val rootRows = m.toSeq.flatMap { case (c0, n0) =>
            bm.get(n0).map(b => (c0, math.min(n0, b)))
          }
          import s.implicits._
          val root = rootRows.toDF("c", "root")
          comp = comp.as("cp")
            .join(broadcast(root.as("rt")), col("cp.c") === col("rt.c"), "left")
            .select(col("cp.node").as("node"),
              coalesce(col("rt.root"), col("cp.c")).as("c"))
            .localCheckpoint(true)
        }
      }
      val mst =
        if (mstParts.isEmpty) und.filter(lit(false)).select(col("u"), col("v"))
        else mstParts.reduce(_ unionByName _).distinct()
      val nat = Tables.nation(s, d)
      mst.join(und.select(col("u"), col("v"), col("w")), Seq("u", "v"))
        .join(broadcast(nat.select(col("n_nationkey").as("u"),
          col("n_name").as("src_nation"))), Seq("u"))
        .join(broadcast(nat.select(col("n_nationkey").as("v"),
          col("n_name").as("dst_nation"))), Seq("v"))
        .select(col("src_nation"), col("dst_nation"), col("w").as("trade_cents"))
        .orderBy(col("src_nation"), col("dst_nation"))
    },

    // ---- A185: bounded-hop harmonic centrality on the top-3-partner graph ------
    // Harmonic centrality sums 1/d over reachable peers — multiplied
    // through by lcm(1,2,3)=6 it is a pure integer (6/3/2 per hop
    // count), so the bounded-radius variant is hash-gate exact. The
    // graph is deliberately sparse (each nation keeps only its top-3
    // export destinations, ties broken by nation key) so 1/2/3-hop
    // distances actually vary. Three bounded expansions of a 75-edge
    // broadcast table; min-distance dedup via groupBy.
    QueryDef.sql(
      "a185_harmonic_centrality",
      """WITH tr AS (
        |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
        |    CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE s.s_nationkey <> c.c_nationkey
        |  GROUP BY 1, 2),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src
        |        ORDER BY cents DESC, dst ASC) AS rn
        |    FROM tr) WHERE rn <= 3),
        |d2 AS (
        |  SELECT DISTINCT a.src, b.dst FROM e a JOIN e b ON b.src = a.dst
        |  WHERE a.src <> b.dst),
        |d3 AS (
        |  SELECT DISTINCT a.src, b.dst FROM d2 a JOIN e b ON b.src = a.dst
        |  WHERE a.src <> b.dst),
        |dist AS (
        |  SELECT src, dst, CAST(min(d) AS INT) AS d FROM (
        |    SELECT src, dst, 1 AS d FROM e
        |    UNION ALL SELECT src, dst, 2 FROM d2
        |    UNION ALL SELECT src, dst, 3 FROM d3)
        |  GROUP BY 1, 2)
        |SELECT n.n_name AS nation,
        |  CAST(count(*) AS BIGINT) AS reach3,
        |  CAST(sum(CASE d WHEN 1 THEN 6 WHEN 2 THEN 3 ELSE 2 END) AS BIGINT)
        |    AS harmonic6
        |FROM dist t JOIN nation n ON n.n_nationkey = t.src
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val tr = Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey"))
        .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .agg(sum(floor(col("l_extendedprice") * 100).cast("long"))
          .cast("long").as("cents"))
      val e = tr.withColumn("rn", row_number().over(
          Window.partitionBy(col("src"))
            .orderBy(col("cents").desc, col("dst").asc)))
        .filter(col("rn") <= 3).select(col("src"), col("dst"))
        .localCheckpoint(true) // 75-edge graph read by all three expansions
      val d2 = e.as("a").join(e.as("b"), col("a.dst") === col("b.src"))
        .filter(col("a.src") =!= col("b.dst"))
        .select(col("a.src").as("src"), col("b.dst").as("dst")).distinct()
      val d3 = d2.as("a").join(e.as("b"), col("a.dst") === col("b.src"))
        .filter(col("a.src") =!= col("b.dst"))
        .select(col("a.src").as("src"), col("b.dst").as("dst")).distinct()
      val dist = e.select(col("src"), col("dst"), lit(1).as("d"))
        .unionByName(d2.withColumn("d", lit(2)))
        .unionByName(d3.withColumn("d", lit(3)))
        .groupBy(col("src"), col("dst")).agg(min(col("d")).cast("int").as("d"))
      dist.join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("src"), col("n_name").as("nation"))),
          Seq("src"))
        .groupBy(col("nation"))
        .agg(count(lit(1)).cast("long").as("reach3"),
          sum(when(col("d") === 1, 6).when(col("d") === 2, 3).otherwise(2))
            .cast("long").as("harmonic6"))
        .orderBy(col("nation"))
    },

    // ---- EV101: alpha-miner footprint matrix -----------------------------------
    // Process discovery's first artifact: the directly-follows
    // relation over per-user event sequences (ordered by ts with
    // event_id tie-break) classified into the alpha-algorithm
    // footprint — a→b (causal), a←b, a||b (both directions observed),
    // a#b (never adjacent) — for every ordered activity pair, with the
    // supporting directly-follows counts. One window pass for the
    // successors, one aggregation, one 25-cell grid join.
    QueryDef.sql(
      "ev101_footprint_matrix",
      """WITH seq AS (
        |  SELECT event_type AS a,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS b
        |  FROM events),
        |df AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS cnt
        |  FROM seq WHERE b IS NOT NULL GROUP BY 1, 2),
        |acts AS (SELECT DISTINCT event_type AS act FROM events),
        |grid AS (
        |  SELECT x.act AS a, y.act AS b FROM acts x CROSS JOIN acts y)
        |SELECT g.a, g.b,
        |  coalesce(f.cnt, 0) AS ab_cnt,
        |  coalesce(r.cnt, 0) AS ba_cnt,
        |  CASE
        |    WHEN f.cnt IS NOT NULL AND r.cnt IS NOT NULL THEN '||'
        |    WHEN f.cnt IS NOT NULL THEN '->'
        |    WHEN r.cnt IS NOT NULL THEN '<-'
        |    ELSE '#' END AS relation
        |FROM grid g
        |LEFT JOIN df f ON f.a = g.a AND f.b = g.b
        |LEFT JOIN df r ON r.a = g.b AND r.b = g.a
        |ORDER BY g.a, g.b""".stripMargin) { (s, d) =>
      val seq = Tables.events(s, d)
        .select(col("event_type").as("a"),
          lead(col("event_type"), 1).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts"), col("event_id"))).as("b"))
      val df = seq.filter(col("b").isNotNull)
        .groupBy(col("a"), col("b")).agg(count(lit(1)).cast("long").as("cnt"))
        .localCheckpoint(true) // read twice (forward + reverse probe)
      val acts = Tables.events(s, d).select(col("event_type").as("act")).distinct()
      val grid = acts.as("x").crossJoin(acts.as("y"))
        .select(col("x.act").as("a"), col("y.act").as("b"))
      grid
        .join(broadcast(df.select(col("a"), col("b"), col("cnt").as("fcnt"))),
          Seq("a", "b"), "left")
        .join(broadcast(df.select(col("a").as("b"), col("b").as("a"),
          col("cnt").as("rcnt"))), Seq("a", "b"), "left")
        .select(col("a"), col("b"),
          coalesce(col("fcnt"), lit(0L)).as("ab_cnt"),
          coalesce(col("rcnt"), lit(0L)).as("ba_cnt"),
          when(col("fcnt").isNotNull && col("rcnt").isNotNull, "||")
            .when(col("fcnt").isNotNull, "->")
            .when(col("rcnt").isNotNull, "<-")
            .otherwise("#").as("relation"))
        .orderBy(col("a"), col("b"))
    }
  )
}
