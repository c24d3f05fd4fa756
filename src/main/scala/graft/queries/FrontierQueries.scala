package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Round-4 frontier operators: time-series diagnostics (exact
  * autocorrelation, max drawdown), warehouse audits (referential
  * integrity, cumulative-distinct), graph peeling (k-core), spatial
  * grid joins, maximum-inner-product retrieval, feature hashing, and
  * incremental JOIN-view maintenance.
  *
  * Numeric discipline follows the repo convention: iterative or
  * variance-like float math is re-expressed as EXACT integer/decimal
  * recurrences (multiply through by n to avoid the mean division; keep
  * everything in integer units until ONE final division), so the whole
  * family sits under the bit-exact DuckDB hash gate rather than a
  * tolerance compare. Reference analog: the 990 pipeline's audit
  * passes (orphan EINs across crosswalk tables, year-over-year totals)
  * — same operators, generic tables.
  */
object FrontierQueries {

  /** Symmetric co-purchase edge set over parts (a18/a22's definition):
    * two parts are adjacent when they appear together in >= 2 orders.
    */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    // r6 opt: aggregate-before-join pair build (PairGraph, see a18)
    val e0 = graft.operators.PairGraph.groupPairs(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey")
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("m")).filter(col("m") >= 2)
      .select(col("src"), col("dst"))
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- A26: exact lag-k autocorrelation of the daily revenue series ----
    // ACF is normally mean-centered float math — un-oracle-able once
    // sums reorder. Multiplying the centered term through by n makes
    // every centered value an exact integer (c_t = n·x_t − S, with x_t
    // the day total in 1e-4 dollar units), so numerator and denominator
    // are exact integer sums and the ACF is ONE division. Spark carries
    // them as DECIMAL(38,0); the oracle as HUGEINT. Scale shape: the
    // day-grain series is calendar-bounded, so after the one partial-agg
    // shuffle building it, the lag self-join and the stats broadcast are
    // O(days), independent of fact cardinality.
    QueryDef.sql(
      "a26_acf_lags",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS HUGEINT) AS x
        |  FROM orders GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS HUGEINT) AS n, CAST(sum(x) AS HUGEINT) AS s_tot FROM daily),
        |c AS (SELECT day, n * x - s_tot AS c FROM daily CROSS JOIN st),
        |den AS (SELECT sum(c * c) AS den FROM c),
        |lags AS (SELECT unnest([1, 2, 3]) AS lag),
        |num AS (
        |  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs, sum(a.c * b.c) AS num
        |  FROM c a CROSS JOIN lags l JOIN c b ON b.day = a.day + l.lag
        |  GROUP BY l.lag)
        |SELECT CAST(lag AS INTEGER) AS lag, n_pairs,
        |  CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS acf
        |FROM num CROSS JOIN den""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 4)) * lit(10000))
          .cast(DecimalType(20, 0))).cast(DecimalType(20, 0)).as("x"))
      val st = daily.agg(
        count(lit(1)).cast(DecimalType(20, 0)).as("n"),
        sum(col("x")).cast(DecimalType(20, 0)).as("s_tot"))
      val c = daily.crossJoin(broadcast(st))
        .select(col("day"),
          (col("n") * col("x") - col("s_tot")).cast(DecimalType(38, 0)).as("c"))
      val den = c.agg(sum(col("c") * col("c")).cast(DecimalType(38, 0)).as("den"))
      val lags = Seq(1, 2, 3)
        .foldLeft(Option.empty[DataFrame]) { (acc, k) =>
          val one = c.select(lit(k).as("lag"), col("day"), col("c"))
          Some(acc.fold(one)(_.union(one)))
        }.get
      val num = lags.as("a")
        .join(c.select(col("day").as("bday"), col("c").as("bc")),
          col("bday") === date_add(col("a.day"), col("lag")))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("a.c") * col("bc")).cast(DecimalType(38, 0)).as("num"))
      num.crossJoin(broadcast(den))
        .select(col("lag").cast("int").as("lag"), col("n_pairs"),
          (col("num").cast("double") / col("den").cast("double")).as("acf"))
    },

    // ---- A27: cumulative distinct users (running count-distinct) ---------
    // `count(DISTINCT u) OVER (ORDER BY day)` does not exist in Spark
    // and would be quadratic anyway. The scalable rewrite: distinct
    // collapses to first-seen day per (type, user) — ONE partial-agg
    // shuffle over the raw data — then the running sum of first-seen
    // counts runs on the calendar-bounded (type, day) grain. The window
    // partitions by event_type and holds O(days) rows per partition,
    // never O(users).
    QueryDef.sql(
      "a27_cumulative_distinct",
      """WITH f AS (
        |  SELECT event_type, user_id, min(CAST(ts AS DATE)) AS f_day
        |  FROM events GROUP BY 1, 2),
        |nu AS (
        |  SELECT event_type, f_day AS day, CAST(count(*) AS BIGINT) AS new_users
        |  FROM f GROUP BY 1, 2),
        |days AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events)
        |SELECT d.event_type, d.day,
        |  CAST(coalesce(nu.new_users, 0) AS BIGINT) AS new_users,
        |  CAST(sum(coalesce(nu.new_users, 0))
        |    OVER (PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS cum_users
        |FROM days d LEFT JOIN nu
        |  ON nu.event_type = d.event_type AND nu.day = d.day""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val f = ev.groupBy(col("event_type"), col("user_id"))
        .agg(min(col("ts").cast("date")).as("f_day"))
      val nu = f.groupBy(col("event_type"), col("f_day").as("day"))
        .agg(count(lit(1)).as("new_users"))
      val days = ev.select(col("event_type"), col("ts").cast("date").as("day")).distinct()
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      days.join(nu, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("new_users"), lit(0L)).as("new_users"))
        .withColumn("cum_users", sum(col("new_users")).over(w))
    },

    // ---- A28: referential-integrity audit over every FK edge -------------
    // The warehouse-build acceptance check (the reference validates the
    // same way across its crosswalk tables: every child key must
    // resolve to a parent row). Each edge is ONE pass: left join onto
    // the parent's distinct keys, then a conditional aggregate — rows,
    // null FKs, distinct FKs, orphans — so no edge scans its child
    // twice. Dimension parents broadcast; the lineitem→orders edge
    // shuffles on the key like any fact-fact join.
    QueryDef.sql(
      "a28_fk_orphans",
      """WITH chk AS (
        |  SELECT 'lineitem.l_orderkey->orders' AS edge, l_orderkey AS fk,
        |    o_orderkey AS pk
        |  FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders)
        |    ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey->part', l_partkey, p_partkey
        |  FROM lineitem LEFT JOIN (SELECT DISTINCT p_partkey FROM part)
        |    ON l_partkey = p_partkey
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey->supplier', l_suppkey, s_suppkey
        |  FROM lineitem LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier)
        |    ON l_suppkey = s_suppkey
        |  UNION ALL
        |  SELECT 'orders.o_custkey->customer', o_custkey, c_custkey
        |  FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer)
        |    ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT 'customer.c_nationkey->nation', c_nationkey, n_nationkey
        |  FROM customer LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation)
        |    ON c_nationkey = n_nationkey
        |  UNION ALL
        |  SELECT 'supplier.s_nationkey->nation', s_nationkey, n_nationkey
        |  FROM supplier LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation)
        |    ON s_nationkey = n_nationkey)
        |SELECT edge, CAST(count(*) AS BIGINT) AS child_rows,
        |  CAST(count(*) FILTER (WHERE fk IS NULL) AS BIGINT) AS null_fk,
        |  CAST(count(DISTINCT fk) AS BIGINT) AS distinct_fk,
        |  CAST(count(*) FILTER (WHERE fk IS NOT NULL AND pk IS NULL) AS BIGINT)
        |    AS orphan_rows
        |FROM chk GROUP BY edge""".stripMargin) { (s, d) =>
      def audit(edge: String, child: DataFrame, fk: String,
                parent: DataFrame, pk: String, bcast: Boolean): DataFrame = {
        val pkeys0 = parent.select(col(pk)).distinct()
        val pkeys = if (bcast) broadcast(pkeys0) else pkeys0
        child.select(col(fk).as("fk"))
          .join(pkeys.withColumnRenamed(pk, "pk"), col("fk") === col("pk"), "left")
          .agg(
            count(lit(1)).as("child_rows"),
            count(when(col("fk").isNull, 1)).as("null_fk"),
            count_distinct(col("fk")).as("distinct_fk"),
            count(when(col("fk").isNotNull && col("pk").isNull, 1)).as("orphan_rows"))
          .select(lit(edge).as("edge"), col("child_rows"), col("null_fk"),
            col("distinct_fk"), col("orphan_rows"))
      }
      val li = Tables.lineitem(s, d)
      Seq(
        audit("lineitem.l_orderkey->orders", li, "l_orderkey",
          Tables.orders(s, d), "o_orderkey", bcast = false),
        audit("lineitem.l_partkey->part", li, "l_partkey",
          Tables.part(s, d), "p_partkey", bcast = true),
        audit("lineitem.l_suppkey->supplier", li, "l_suppkey",
          Tables.supplier(s, d), "s_suppkey", bcast = true),
        audit("orders.o_custkey->customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey", bcast = true),
        audit("customer.c_nationkey->nation", Tables.customer(s, d), "c_nationkey",
          Tables.nation(s, d), "n_nationkey", bcast = true),
        audit("supplier.s_nationkey->nation", Tables.supplier(s, d), "s_nationkey",
          Tables.nation(s, d), "n_nationkey", bcast = true)
      ).reduce(_ unionByName _)
    },

    // ---- A29: k-core peel (k=2, 4 rounds) over the co-purchase graph -----
    // Community-structure prefilter: iteratively drop nodes with degree
    // < 2 until (here) 4 fixed rounds — all set algebra over integer
    // ids, so the whole peel is oracle-able via an identically-unrolled
    // DuckDB twin (like d7/a22, iterative-but-exact). Scale shape: per
    // round one shuffle join of the checkpointed edge list against the
    // shrinking node set (broadcast while it fits) + one partial-agg
    // degree count; the edge list is checkpointed ONCE and filtered,
    // never recomputed from the fact table.
    QueryDef.sql(
      "a29_kcore_peel",
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM op a JOIN op b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |n1 AS (SELECT src AS id FROM e GROUP BY src HAVING count(*) >= 2),
        |n2 AS (SELECT e.src AS id FROM e
        |       JOIN n1 a ON e.src = a.id JOIN n1 b ON e.dst = b.id
        |       GROUP BY e.src HAVING count(*) >= 2),
        |n3 AS (SELECT e.src AS id FROM e
        |       JOIN n2 a ON e.src = a.id JOIN n2 b ON e.dst = b.id
        |       GROUP BY e.src HAVING count(*) >= 2),
        |n4 AS (SELECT e.src AS id FROM e
        |       JOIN n3 a ON e.src = a.id JOIN n3 b ON e.dst = b.id
        |       GROUP BY e.src HAVING count(*) >= 2)
        |SELECT e.src AS part_id, CAST(count(*) AS BIGINT) AS core_deg
        |FROM e JOIN n4 a ON e.src = a.id JOIN n4 b ON e.dst = b.id
        |GROUP BY e.src""".stripMargin) { (s, d) =>
      val edges = coPurchaseEdges(s, d).localCheckpoint(true)
      var nodes = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2).select(col("src").as("id"))
        .localCheckpoint(true)
      for (_ <- 2 to 4) {
        nodes = edges
          .join(broadcast(nodes.withColumnRenamed("id", "src")), "src")
          .join(broadcast(nodes.withColumnRenamed("id", "dst")), "dst")
          .groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= 2).select(col("src").as("id"))
          .localCheckpoint(true)
      }
      edges
        .join(broadcast(nodes.withColumnRenamed("id", "src")), "src")
        .join(broadcast(nodes.withColumnRenamed("id", "dst")), "dst")
        .groupBy(col("src").as("part_id"))
        .agg(count(lit(1)).as("core_deg"))
    },

    // ---- W9: max drawdown per user (running-max minus running-sum) -------
    // The risk metric over a cumulative series: both running aggregates
    // share ONE window sort per user partition, the series is exact
    // integer 1e-4-dollar units, and the dollar readout is ONE division
    // of an exact integer — so an inherently order-sensitive metric
    // stays under the hash gate. Total order (ts, event_id) pins ties.
    QueryDef.sql(
      "w9_max_drawdown",
      """WITH v AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS units
        |  FROM events),
        |c0 AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(sum(units) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS BIGINT) AS cum
        |  FROM v),
        |c AS (
        |  SELECT user_id, cum,
        |    CAST(max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS BIGINT) AS peak
        |  FROM c0),
        |g AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(max(peak - cum) AS BIGINT) AS dd_units
        |  FROM c GROUP BY user_id)
        |SELECT user_id, n_events,
        |  CAST(dd_units AS DOUBLE) / 10000 AS max_drawdown
        |FROM g""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val units = (col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long")
      val c = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), units.as("units"))
        .withColumn("cum", sum(col("units")).over(w))
        .withColumn("peak", max(col("cum")).over(w))
      c.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(col("peak") - col("cum")).as("dd_units"))
        .select(col("user_id"), col("n_events"),
          (col("dd_units").cast("double") / lit(10000)).as("max_drawdown"))
    },

    // ---- V14: maximum-inner-product top-k (MIPS) --------------------------
    // Recommendation-retrieval semantics: rank by RAW dot product (no
    // normalization — magnitude matters for learned user/item factors).
    // Same strict-left-fold arithmetic as v2, queries broadcast, per-
    // query top-k via rank window (WindowGroupLimit ships <= k rows per
    // map task). The norm-augmentation reduction to cosine ANN (add a
    // sqrt(M²-|x|²) dimension) is the documented scale path on top of
    // v3/v5's bucketing.
    QueryDef.sql(
      "v14_mips_topk",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS item_id,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*n.emb[i])), (a,b) -> a+b)
        |      AS score
        |  FROM e q JOIN e n ON q.vec_id < 8 AND n.vec_id <> q.vec_id)
        |SELECT query_id, item_id, rnk, score FROM (
        |  SELECT *, rank() OVER (PARTITION BY query_id ORDER BY score DESC, item_id) AS rnk
        |  FROM pairs) WHERE rnk <= 3""".stripMargin) { (s, d) =>
      import graft.operators.VectorOps
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), VectorOps.toDouble(col("embedding")).as("q_emb"))
      val c = emb.select(col("vec_id").as("item_id"), VectorOps.toDouble(col("embedding")).as("n_emb"))
      val pairs = c.join(broadcast(q), col("item_id") =!= col("query_id"))
        .select(col("query_id"), col("item_id"),
          VectorOps.dot(col("q_emb"), col("n_emb")).as("score"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("item_id"))
      pairs.withColumn("rnk", rank().over(w)).filter(col("rnk") <= 3)
        .select(col("query_id"), col("item_id"), col("rnk"), col("score"))
    },

    // ---- T30: feature hashing (hashing-trick vectorizer) ------------------
    // The fixed-width featurizer for linear/quality models at corpus
    // scale: token -> bucket via the portable polynomial rolling hash
    // (t4's), 64 buckets, counts per (source, bucket). No vocabulary is
    // built or broadcast — that is the POINT of the hashing trick (cf.
    // t15's vocab path, which needs the sharded rank): the feature
    // space is fixed a priori, so the whole featurization is one
    // explode + one partial-agg shuffle at any corpus size. n_terms
    // reports bucket collision load (distinct terms per bucket).
    QueryDef.sql(
      "t30_feature_hash",
      """WITH tok AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents),
        |b AS (
        |  SELECT source, term,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split_regex(term, ''), c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007) % 64 AS bucket
        |  FROM tok)
        |SELECT source, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(count(DISTINCT term) AS BIGINT) AS n_terms
        |FROM b GROUP BY 1, 2""".stripMargin) { (s, d) =>
      import graft.functions.TextFunctions
      Tables.documents(s, d)
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("term"))
        .select(col("source"), col("term"),
          (TextFunctions.rollingFingerprint(col("term")) % 64).as("bucket"))
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_tokens"), count_distinct(col("term")).as("n_terms"))
    },

    // ---- U17: incremental JOIN-view maintenance ---------------------------
    // Extends u12 from aggregates to a JOIN view (revenue per nation
    // over orders |><| customer |><| nation): the stored partials of
    // the 90% "historical" base are read back pre-aggregated, only the
    // 10% delta batch scans raw and joins the (broadcast) dims — the
    // delta-join algebra dV = dF |><| D folded into the stored state.
    // DECIMAL partials keep ⊕ exact, so stored ⊕ delta is bit-equal to
    // the oracle's full recompute. At 100 TB this is the difference
    // between scanning one day and scanning ten years.
    QueryDef.sql(
      "u17_ivm_join",
      """SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin) { (s, d) =>
      val dims = broadcast(
        Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
          .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name")))
      def partials(orders: DataFrame): DataFrame =
        orders.join(dims, col("o_custkey") === col("c_custkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 4))).as("v"))
      val stageDir = s"/tmp/graft_u17_ivm/${new java.io.File(d).getName}"
      Staging.stageOnce(stageDir, Staging.sourceKey(d, "orders")) {
        partials(Tables.orders(s, d).filter(col("o_orderkey") % 10 =!= 0))
          .write.mode("overwrite").parquet(s"$stageDir/stored")
      }
      val stored = s.read.parquet(s"$stageDir/stored")
      val delta = partials(Tables.orders(s, d).filter(col("o_orderkey") % 10 === 0))
      stored.unionByName(delta)
        .groupBy(col("n_name"))
        .agg(sum(col("n")).as("n_orders"), sum(col("v")).cast("double").as("revenue"))
    },

    // ---- J6: grid-blocked spatial proximity join --------------------------
    // Point-in-radius (Chebyshev <= 10) join between derived customer
    // and supplier coordinates. The blocking canon for 2D: cell size =
    // threshold, build side keyed by ITS cell, probe side fans out to
    // the 3x3 neighborhood — each build point lands in exactly one
    // probe cell, so candidates need no dedup and the candidate count
    // is density-bounded, never |C|x|S|. The oracle is the brute-force
    // quadratic join; the plan must contain a hash join on cell, no
    // cartesian. Coordinates are pure integer arithmetic on the keys
    // (portable, deterministic).
    QueryDef.sql(
      "j6_spatial_grid_join",
      """WITH cpt AS (
        |  SELECT c_custkey, (c_custkey * 263) % 1000 AS cx, (c_custkey * 389) % 1000 AS cy
        |  FROM customer),
        |spt AS (
        |  SELECT s_suppkey, (s_suppkey * 263) % 1000 AS sx, (s_suppkey * 389) % 1000 AS sy
        |  FROM supplier)
        |SELECT c_custkey, s_suppkey, cx, cy, sx, sy,
        |  CAST(greatest(abs(cx - sx), abs(cy - sy)) AS BIGINT) AS cheb
        |FROM cpt JOIN spt
        |  ON abs(cx - sx) <= 10 AND abs(cy - sy) <= 10""".stripMargin) { (s, d) =>
      val cell = 10
      val cpt = Tables.customer(s, d).select(col("c_custkey"),
        (col("c_custkey") * 263 % 1000).as("cx"), (col("c_custkey") * 389 % 1000).as("cy"))
      val spt = Tables.supplier(s, d).select(col("s_suppkey"),
        (col("s_suppkey") * 263 % 1000).as("sx"), (col("s_suppkey") * 389 % 1000).as("sy"))
        .withColumn("cellx", floor(col("sx") / cell))
        .withColumn("celly", floor(col("sy") / cell))
      val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
        struct(lit(dx).as("dx"), lit(dy).as("dy")))): _*)
      val probes = cpt
        .withColumn("o", explode(offsets))
        .select(col("c_custkey"), col("cx"), col("cy"),
          (floor(col("cx") / cell) + col("o.dx")).as("cellx"),
          (floor(col("cy") / cell) + col("o.dy")).as("celly"))
      probes.join(spt, Seq("cellx", "celly"))
        .filter(abs(col("cx") - col("sx")) <= 10 && abs(col("cy") - col("sy")) <= 10)
        .select(col("c_custkey"), col("s_suppkey"),
          col("cx"), col("cy"), col("sx"), col("sy"),
          greatest(abs(col("cx") - col("sx")), abs(col("cy") - col("sy")))
            .cast("long").as("cheb"))
    }
  )
}
