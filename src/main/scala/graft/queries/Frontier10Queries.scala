package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Tenth frontier batch: the two-sample Kolmogorov-Smirnov test with
  * the ECDF gap maximized in exact integers over sharded prefix sums,
  * and a group-level lineage digest for aggregate provenance.
  */
object Frontier10Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A42: two-sample Kolmogorov-Smirnov test ---------------------------
    // Does the `value` distribution differ between 'click' and 'view'
    // events? D = sup |F1 − F2| over the pooled support. Cross-
    // multiplied, the supremum is max |n2·c1(v) − n1·c2(v)| over
    // exact integer cumulative counts — found BEFORE any division, so
    // the argmax is exact; D itself is ONE division at the end. The
    // cumulative counts over the value-grain table (data-sized!) run
    // as sharded prefix sums: range-shard by value, partitioned local
    // cumsum, 32-row offset table broadcast back — the same
    // no-global-window discipline as u21/c4/c7/ShardedRank.
    QueryDef.sql(
      "a42_ks_test",
      """WITH v AS (
        |  SELECT CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS x,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS s1
        |  FROM events WHERE event_type IN ('click', 'view')),
        |g AS (
        |  SELECT x, CAST(count(*) FILTER (WHERE s1 = 1) AS BIGINT) AS d1,
        |    CAST(count(*) FILTER (WHERE s1 = 0) AS BIGINT) AS d2
        |  FROM v GROUP BY x),
        |c AS (
        |  SELECT x,
        |    CAST(sum(d1) OVER (ORDER BY x) AS BIGINT) AS c1,
        |    CAST(sum(d2) OVER (ORDER BY x) AS BIGINT) AS c2
        |  FROM g),
        |n AS (SELECT CAST(sum(d1) AS BIGINT) AS n1, CAST(sum(d2) AS BIGINT) AS n2 FROM g),
        |gap AS (
        |  SELECT max(abs(n2 * c1 - n1 * c2)) AS max_gap
        |  FROM c CROSS JOIN n)
        |SELECT n1, n2, max_gap,
        |  CAST(max_gap AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS ks_d
        |FROM n CROSS JOIN gap""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select((col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long").as("x"),
          when(col("event_type") === "click", 1).otherwise(0).as("s1"))
      val g = v.groupBy(col("x"))
        .agg(count(when(col("s1") === 1, 1)).as("d1"),
          count(when(col("s1") === 0, 1)).as("d2"))
      // sharded prefix sums over the value grain. localCheckpoint pins
      // the range boundaries: `ranged` feeds BOTH the local ranks and
      // the offset table, and the range partitioner samples its
      // boundaries from the (nondeterministically ordered) shuffle
      // output — two separate evaluations can land different
      // boundaries, silently skewing every cumulative count (seen
      // live: a43 at sf0.1 diverged by 0.8% before the pin).
      val shards = 32
      val ranged = g.repartitionByRange(shards, col("x"))
        .withColumn("__shard", spark_partition_id())
        .localCheckpoint(true)
      val wLocal = Window.partitionBy(col("__shard")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = ranged
        .withColumn("l1", sum(col("d1")).over(wLocal))
        .withColumn("l2", sum(col("d2")).over(wLocal))
      val wShard = Window.orderBy(col("__shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = ranged.groupBy(col("__shard"))
        .agg(sum(col("d1")).as("s1sum"), sum(col("d2")).as("s2sum"))
        .withColumn("o1", coalesce(sum(col("s1sum")).over(wShard), lit(0L)))
        .withColumn("o2", coalesce(sum(col("s2sum")).over(wShard), lit(0L)))
        .select(col("__shard"), col("o1"), col("o2"))
      val c = local.join(broadcast(offsets), "__shard")
        .select(col("x"), (col("l1") + col("o1")).as("c1"), (col("l2") + col("o2")).as("c2"))
      val n = g.agg(sum(col("d1")).as("n1"), sum(col("d2")).as("n2"))
      val gap = c.crossJoin(broadcast(n))
        .agg(max(abs(col("n2") * col("c1") - col("n1") * col("c2"))).as("max_gap"))
      n.crossJoin(broadcast(gap))
        .select(col("n1"), col("n2"), col("max_gap"),
          (col("max_gap").cast("double") / (col("n1") * col("n2")).cast("double"))
            .as("ks_d"))
    },

    // ---- A43: Wilcoxon/Mann-Whitney rank-sum test --------------------------
    // The nonparametric two-sample test that needs only RANKS — with
    // ties handled by midranks, which stay integers when DOUBLED
    // (2·midrank of a tied block ending at cumulative count c with
    // size k is 2c − k + 1). The doubled rank sum R1×2 = Σ d1·(2c−k+1)
    // and U1×2 = R1×2 − n1(n1+1) are exact integers; cumulative counts
    // reuse a42's value-grain prefix (here via the same shard
    // discipline at scale — at the registered grain one partial-agg
    // shuffle + bounded windows). Completes the test suite next to
    // a42 (KS), a39 (chi²), a41 (ANOVA), a25 (z).
    QueryDef.sql(
      "a43_rank_sum_u",
      """WITH v AS (
        |  SELECT CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS x,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS s1
        |  FROM events WHERE event_type IN ('click', 'view')),
        |g AS (
        |  SELECT x, CAST(count(*) FILTER (WHERE s1 = 1) AS BIGINT) AS d1,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM v GROUP BY x),
        |c AS (
        |  SELECT x, d1, k, CAST(sum(k) OVER (ORDER BY x) AS BIGINT) AS c
        |  FROM g),
        |n AS (
        |  SELECT CAST(sum(d1) AS BIGINT) AS n1,
        |    CAST(sum(k) - sum(d1) AS BIGINT) AS n2
        |  FROM g),
        |r AS (SELECT CAST(sum(d1 * (2 * c - k + 1)) AS BIGINT) AS r1x2 FROM c)
        |SELECT n1, n2, r1x2,
        |  CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u1x2,
        |  CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2 AS u1
        |FROM n CROSS JOIN r""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .select((col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long").as("x"),
          when(col("event_type") === "click", 1).otherwise(0).as("s1"))
      val g = v.groupBy(col("x"))
        .agg(count(when(col("s1") === 1, 1)).as("d1"), count(lit(1)).as("k"))
      // same sharded-prefix shape as a42 over the value grain (same
      // localCheckpoint boundary pin — see a42)
      val ranged = g.repartitionByRange(32, col("x"))
        .withColumn("__shard", spark_partition_id())
        .localCheckpoint(true)
      val wLocal = Window.partitionBy(col("__shard")).orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = ranged.withColumn("lc", sum(col("k")).over(wLocal))
      val wShard = Window.orderBy(col("__shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = ranged.groupBy(col("__shard")).agg(sum(col("k")).as("ks"))
        .withColumn("off", coalesce(sum(col("ks")).over(wShard), lit(0L)))
        .select(col("__shard"), col("off"))
      val c = local.join(broadcast(offsets), "__shard")
        .select(col("x"), col("d1"), col("k"), (col("lc") + col("off")).as("c"))
      val n = g.agg(sum(col("d1")).as("n1"), (sum(col("k")) - sum(col("d1"))).as("n2"))
      val r = c.agg(sum(col("d1") * (lit(2) * col("c") - col("k") + 1)).as("r1x2"))
      n.crossJoin(broadcast(r))
        .select(col("n1"), col("n2"), col("r1x2"),
          (col("r1x2") - col("n1") * (col("n1") + 1)).as("u1x2"),
          ((col("r1x2") - col("n1") * (col("n1") + 1)).cast("double") / lit(2)).as("u1"))
    },

    // ---- T34: pass@k evaluation aggregation --------------------------------
    // THE LLM-eval metric: with n samples per task of which c are
    // correct, pass@k = 1 − C(n−c,k)/C(n,k) — the unbiased estimator
    // (Codex paper). The binomial ratio telescopes to
    // Π_{i<k} (n−c−i)/(n−i); cross-multiplied it's ONE division of two
    // exact integer products (k = 5 here, so 5 factors — bounded).
    // Tasks = users, samples = their events, "correct" = value > 200.
    // One partial-agg shuffle on the task key; no per-sample state.
    QueryDef.sql(
      "t34_pass_at_k",
      """WITH t AS (
        |  SELECT user_id AS task_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) FILTER (WHERE value > 200) AS BIGINT) AS c
        |  FROM events GROUP BY 1)
        |SELECT task_id, n, c,
        |  CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS pass_at_1,
        |  CASE WHEN n < 5 THEN NULL
        |       WHEN n - c < 5 THEN CAST(1.0 AS DOUBLE)
        |       ELSE 1 - CAST((n-c) * (n-c-1) * (n-c-2) * (n-c-3) * (n-c-4) AS DOUBLE)
        |              / CAST(n * (n-1) * (n-2) * (n-3) * (n-4) AS DOUBLE)
        |  END AS pass_at_5
        |FROM t""".stripMargin) { (s, d) =>
      val t = Tables.events(s, d)
        .groupBy(col("user_id").as("task_id"))
        .agg(count(lit(1)).as("n"), count(when(col("value") > 200, 1)).as("c"))
      val m = col("n") - col("c")
      val num = m * (m - 1) * (m - 2) * (m - 3) * (m - 4)
      val den = col("n") * (col("n") - 1) * (col("n") - 2) * (col("n") - 3) * (col("n") - 4)
      t.select(col("task_id"), col("n"), col("c"),
        (col("c").cast("double") / col("n").cast("double")).as("pass_at_1"),
        when(col("n") < 5, lit(null).cast("double"))
          .when(m < 5, lit(1.0))
          .otherwise(lit(1) - num.cast("double") / den.cast("double")).as("pass_at_5"))
    },

    // ---- U22: group lineage digest -----------------------------------------
    // Aggregate provenance: alongside each revenue-per-nation group,
    // an order-independent digest of the EXACT input key set
    // (sum of rolling-hash(o_orderkey) mod 2^61−1) — recompute the
    // group tomorrow and a digest mismatch tells you WHICH group's
    // inputs changed without storing row-level lineage. The hash is
    // the portable polynomial fold (graft_rollhash; ascii-fold twin in
    // the oracle), summed modularly so partial aggregation and AQE
    // re-plans cannot change it. One broadcast-dim join + one
    // partial-agg shuffle.
    QueryDef.sql(
      "u22_lineage_digest",
      """WITH h AS (
        |  SELECT n.n_name,
        |    CAST(o.o_totalprice AS DECIMAL(18,4)) AS price,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |        list_transform(string_split_regex(CAST(o.o_orderkey AS VARCHAR), ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (acc, x) -> (acc * 31 + x) % 1000000007) AS kh
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey)
        |SELECT n_name, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(price) AS DOUBLE) AS revenue,
        |  CAST(SUM(kh) % 2305843009213693951 AS BIGINT) AS lineage_digest
        |FROM h GROUP BY n_name""".stripMargin) { (s, d) =>
      val dims = broadcast(
        Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
          .join(broadcast(Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name")))
      Tables.orders(s, d)
        .join(dims, col("o_custkey") === col("c_custkey"))
        .select(col("n_name"),
          col("o_totalprice").cast(DecimalType(18, 4)).as("price"),
          graft.functions.TextFunctions
            .rollingFingerprint(col("o_orderkey").cast("string")).as("kh"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("price")).cast("double").as("revenue"),
          (sum(col("kh")) % lit(2305843009213693951L)).as("lineage_digest"))
    }
  )
}
