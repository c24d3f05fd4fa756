package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-eighth frontier batch: run-length-encoding layout planner
  * and the friendship paradox on the trade graph. (The batch's third
  * member, ev100s_semi_join_stream, lives in StreamingQueries with the
  * rest of the staged streaming family.)
  */
object Frontier108Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- U82: run-length-encoding layout planner -------------------------------
    // Completes the physical-layout pricing trio (u44 dictionary, u79
    // varint-delta): how many RLE runs does each low-cardinality
    // lineitem column have under the time layout (sorted by shipdate,
    // orderkey, linenumber) vs its self-sorted ideal (= one run per
    // distinct value)? Run counting never uses a global window: runs
    // are counted INSIDE each shipdate partition, and the cross-date
    // stitches are reconciled on the per-date first/last value table,
    // whose size is bounded by the date domain. total_runs =
    // sum(within-date runs) - (adjacent date pairs whose boundary
    // values collide).
    QueryDef.sql(
      "u82_rle_planner",
      """WITH lf AS (
        |  SELECT l_shipdate AS d, l_orderkey AS ok, l_linenumber AS ln,
        |    c.colname, c.val
        |  FROM lineitem,
        |  LATERAL (SELECT * FROM (VALUES
        |    ('l_returnflag', l_returnflag),
        |    ('l_linestatus', l_linestatus),
        |    ('qty_bucket', CAST(CAST(floor(l_quantity) AS BIGINT) // 10
        |       AS VARCHAR))) AS t(colname, val)) c),
        |marked AS (
        |  SELECT colname, d, val,
        |    CASE WHEN lag(val) OVER (PARTITION BY colname, d
        |      ORDER BY ok, ln, val) IS DISTINCT FROM val THEN 1 ELSE 0 END
        |      AS b,
        |    row_number() OVER (PARTITION BY colname, d ORDER BY ok, ln, val)
        |      AS rf,
        |    row_number() OVER (PARTITION BY colname, d ORDER BY ok DESC,
        |      ln DESC, val DESC) AS rl
        |  FROM lf),
        |within AS (
        |  SELECT colname, d, CAST(sum(b) AS BIGINT) AS runs_d,
        |    CAST(count(*) AS BIGINT) AS n_d
        |  FROM marked GROUP BY 1, 2),
        |edges AS (
        |  SELECT colname, d,
        |    max(CASE WHEN rf = 1 THEN val END) AS first_val,
        |    max(CASE WHEN rl = 1 THEN val END) AS last_val
        |  FROM marked WHERE rf = 1 OR rl = 1
        |  GROUP BY 1, 2),
        |stitch AS (
        |  SELECT colname, CASE WHEN last_val =
        |      lead(first_val) OVER (PARTITION BY colname ORDER BY d)
        |    THEN 1 ELSE 0 END AS coll
        |  FROM edges),
        |stitch2 AS (
        |  SELECT colname, CAST(sum(coll) AS BIGINT) AS collisions
        |  FROM stitch GROUP BY 1),
        |dv AS (
        |  SELECT colname, CAST(count(DISTINCT val) AS BIGINT) AS n_distinct
        |  FROM lf GROUP BY 1)
        |SELECT w.colname,
        |  CAST(sum(w.n_d) AS BIGINT) AS n_rows,
        |  CAST(sum(w.runs_d) AS BIGINT) - min(s.collisions)
        |    AS runs_time_layout,
        |  min(dv.n_distinct) AS runs_self_sorted,
        |  CAST((CAST(sum(w.runs_d) AS BIGINT) - min(s.collisions)) * 1000
        |    // sum(w.n_d) AS BIGINT) AS runs_permille
        |FROM within w
        |JOIN stitch2 s ON s.colname = w.colname
        |JOIN dv ON dv.colname = w.colname
        |GROUP BY w.colname
        |ORDER BY w.colname""".stripMargin) { (s, d) =>
      // r5 opt: spread the single-row-group lineitem scan so the 3-way
      // column explode (1.8M rows at sf0.1) and the checkpointed frame
      // it feeds are parallel rather than one scan task. r6: guarded —
      // skipped when the scan already has parallelism (Spread.by).
      val lf = graft.operators.Spread.by(Tables.lineitem(s, d), col("l_orderkey"))
        .select(col("l_shipdate").as("d"), col("l_orderkey").as("ok"),
          col("l_linenumber").as("ln"),
          explode(array(
            struct(lit("l_returnflag").as("colname"),
              col("l_returnflag").as("val")),
            struct(lit("l_linestatus").as("colname"),
              col("l_linestatus").as("val")),
            struct(lit("qty_bucket").as("colname"),
              expr("cast(floor(l_quantity) div 10 as string)").as("val"))))
            .as("c"))
        .select(col("d"), col("ok"), col("ln"),
          col("c.colname").as("colname"), col("c.val").as("val"))
        .localCheckpoint(true) // run marking AND distinct counting read it
      // (ok, ln) is NOT unique in the synthetic lineitem — val joins
      // the sort key so the layout (and hence the run count) is
      // deterministic across engines
      val wAsc = Window.partitionBy(col("colname"), col("d"))
        .orderBy(col("ok"), col("ln"), col("val"))
      val wDesc = Window.partitionBy(col("colname"), col("d"))
        .orderBy(col("ok").desc, col("ln").desc, col("val").desc)
      val marked = lf.select(col("colname"), col("d"), col("val"),
        when(not(lag(col("val"), 1).over(wAsc) <=> col("val")), 1L)
          .otherwise(0L).as("b"),
        row_number().over(wAsc).as("rf"),
        row_number().over(wDesc).as("rl"))
      val within = marked.groupBy(col("colname"), col("d"))
        .agg(sum(col("b")).cast("long").as("runs_d"),
          count(lit(1)).cast("long").as("n_d"))
      val edges = marked.filter(col("rf") === 1 || col("rl") === 1)
        .groupBy(col("colname"), col("d"))
        .agg(max(when(col("rf") === 1, col("val"))).as("first_val"),
          max(when(col("rl") === 1, col("val"))).as("last_val"))
      // the per-date edge table is bounded by the date domain, so this
      // per-column window is over an aggregate, not data
      val wDates = Window.partitionBy(col("colname")).orderBy(col("d"))
      val stitch = edges.select(col("colname"),
          when(col("last_val") === lead(col("first_val"), 1).over(wDates), 1L)
            .otherwise(0L).as("coll"))
        .groupBy(col("colname"))
        .agg(sum(col("coll")).cast("long").as("collisions"))
      val dv = lf.groupBy(col("colname"))
        .agg(countDistinct(col("val")).cast("long").as("n_distinct"))
      within.groupBy(col("colname"))
        .agg(sum(col("n_d")).cast("long").as("n_rows"),
          sum(col("runs_d")).cast("long").as("runs_raw"))
        .join(stitch, Seq("colname"))
        .join(dv, Seq("colname"))
        .select(col("colname"), col("n_rows"),
          (col("runs_raw") - col("collisions")).as("runs_time_layout"),
          col("n_distinct").as("runs_self_sorted"),
          expr("(runs_raw - collisions) * 1000 div n_rows").cast("long")
            .as("runs_permille"))
        .orderBy(col("colname"))
    },

    // ---- A174: the friendship paradox ------------------------------------------
    // "Your friends have more friends than you": on the symmetrized
    // top-half trade graph, each nation's degree is compared with the
    // exact mean degree of its neighbors (milli-units, one integral
    // division per node). The per-edge degree lookup is one broadcast
    // join of the degree table back onto the edge list — the same
    // never-shuffle-the-edges shape as d7/a48 — and the closing
    // summary is implicit: paradox=1 rows dominate whenever the degree
    // distribution is skewed.
    QueryDef.sql(
      "a174_friendship_paradox",
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
        |ranked AS MATERIALIZED (
        |  SELECT src, dst,
        |    row_number() OVER (ORDER BY cents DESC, src, dst) AS rk,
        |    CAST((SELECT count(*) FROM flow) AS BIGINT) AS m
        |  FROM flow),
        |und AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM ranked WHERE rk <= m // 2),
        |sym AS MATERIALIZED (
        |  SELECT a AS u, b AS v FROM und
        |  UNION ALL SELECT b AS u, a AS v FROM und),
        |deg AS MATERIALIZED (
        |  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
        |nb AS (
        |  SELECT s.u, CAST(sum(d2.deg) AS BIGINT) AS nbsum
        |  FROM sym s JOIN deg d2 ON d2.u = s.v
        |  GROUP BY 1)
        |SELECT n.n_name, d.deg AS degree,
        |  CAST(nb.nbsum * 1000 // d.deg AS BIGINT) AS mean_neighbor_deg_milli,
        |  CAST(CASE WHEN nb.nbsum * 1000 // d.deg > d.deg * 1000
        |    THEN 1 ELSE 0 END AS INT) AS paradox
        |FROM deg d
        |JOIN nb ON nb.u = d.u
        |JOIN nation n ON n.n_nationkey = d.u
        |ORDER BY n_name""".stripMargin) { (s, d) =>
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
        .localCheckpoint(true) // <= n^2 rows; rank and count both read it
      val m = flow.agg(count(lit(1)).cast("long").as("m"))
      val und = flow
        .withColumn("rk", row_number().over(
          Window.orderBy(col("cents").desc, col("src"), col("dst"))))
        .crossJoin(broadcast(m))
        .filter(col("rk") <= expr("m div 2"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val sym = und.select(col("a").as("u"), col("b").as("v"))
        .unionByName(und.select(col("b").as("u"), col("a").as("v")))
        .localCheckpoint(true) // degree table and neighbor sums read it
      val deg = sym.groupBy(col("u")).agg(count(lit(1)).cast("long").as("deg"))
      val nb = sym.join(broadcast(deg.select(col("u").as("v2"),
          col("deg").as("vdeg"))), col("v2") === col("v"))
        .groupBy(col("u"))
        .agg(sum(col("vdeg")).cast("long").as("nbsum"))
      deg.join(nb, Seq("u"))
        .join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("u"))
        .select(col("n_name"), col("deg").as("degree"),
          expr("nbsum * 1000 div deg").cast("long")
            .as("mean_neighbor_deg_milli"),
          when(expr("nbsum * 1000 div deg") > col("deg") * 1000, 1)
            .otherwise(0).cast("int").as("paradox"))
        .orderBy(col("n_name"))
    }
  )
}
