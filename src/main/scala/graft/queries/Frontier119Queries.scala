package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-nineteenth frontier batch: an LSM-tree write-amplification
  * ledger replayed as an integer fold over real daily ingest, Elo
  * ratings over a real match sequence with the logistic curve baked as
  * a 40-entry permille table (the a178 discipline: transcendental
  * functions become literal lookup tables), and a Merkle-tree
  * anti-entropy diff narrowing a snapshot comparison to the leaves that
  * actually changed.
  */
object Frontier119Queries {

  /** Logistic expectation table for Elo: E·1000 at rating-diff bucket
    * centers −975, −925, …, +975 (bucket = (clamp(diff)+1000) div 50).
    */
  private val EloTable: Seq[Int] = Seq(
    4, 5, 6, 9, 11, 15, 20, 27, 35, 46, 61, 80, 104, 133, 170, 215, 267,
    327, 394, 464, 536, 606, 673, 733, 785, 830, 867, 896, 920, 939, 954,
    965, 973, 980, 985, 989, 991, 994, 995, 996)

  val defs: Seq[QueryDef] = Seq(

    // ---- U90: LSM leveled-compaction write-amplification ledger -----------------
    // Leveled LSM replay over real daily ingest bytes (orders priced at
    // measured row widths): L0 flushes into L1 when it exceeds 4 MB;
    // level i spills its FULL contents into i+1 when it exceeds
    // 4 MB·10^i (rewriting both), the classic 10x-fanout model. The
    // state [l0..l3, written, ingested] folds day by day in pure BIGINT
    // arithmetic — year-end checkpoints are prefix folds, and the
    // write-amplification permille column is the number a storage
    // engineer actually tunes against.
    QueryDef.sql(
      "u90_lsm_write_amp",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(count(*) * 40
        |      + sum(length(o_orderstatus) + length(o_orderpriority)) AS BIGINT)
        |      AS bytes
        |  FROM orders GROUP BY 1),
        |arr AS (
        |  SELECT list(bytes ORDER BY day) AS bs, list(day ORDER BY day) AS days,
        |    CAST(count(*) AS INT) AS t
        |  FROM daily),
        |marks AS (
        |  SELECT unnest(list_transform(
        |    list_filter(range(1, t + 1),
        |      i -> i = t OR year(days[i + 1]) <> year(days[i])), i -> {
        |      'day': days[i], 'i': i,
        |      'st': list_reduce(list_prepend(
        |          [CAST(0 AS BIGINT), 0, 0, 0, 0, 0],
        |          list_transform(bs[1:i], v -> [v, v, v, v, v, v])),
        |        (acc, e) -> CASE
        |          WHEN acc[1] + e[1] > 4194304 AND acc[2] + acc[1] + e[1] > 41943040
        |            AND acc[3] + acc[2] + acc[1] + e[1] > 419430400 THEN
        |            [0, 0, 0, acc[4] + acc[3] + acc[2] + acc[1] + e[1],
        |             acc[5] + 3 * (acc[1] + e[1]) + 2 * acc[2] + acc[3]
        |               + acc[4] + acc[3] + acc[2] + acc[1] + e[1],
        |             acc[6] + e[1]]
        |          WHEN acc[1] + e[1] > 4194304 AND acc[2] + acc[1] + e[1] > 41943040
        |            THEN
        |            [0, 0, acc[3] + acc[2] + acc[1] + e[1], acc[4],
        |             acc[5] + 2 * (acc[1] + e[1]) + acc[2]
        |               + acc[3] + acc[2] + acc[1] + e[1],
        |             acc[6] + e[1]]
        |          WHEN acc[1] + e[1] > 4194304 THEN
        |            [0, acc[2] + acc[1] + e[1], acc[3], acc[4],
        |             acc[5] + acc[1] + e[1] + acc[2] + acc[1] + e[1],
        |             acc[6] + e[1]]
        |          ELSE [acc[1] + e[1], acc[2], acc[3], acc[4],
        |             acc[5] + e[1], acc[6] + e[1]] END)
        |    })) AS u
        |  FROM arr)
        |SELECT u.day AS day, CAST(u.st[1] AS BIGINT) AS l0_bytes,
        |  CAST(u.st[2] AS BIGINT) AS l1_bytes,
        |  CAST(u.st[3] AS BIGINT) AS l2_bytes,
        |  CAST(u.st[4] AS BIGINT) AS l3_bytes,
        |  CAST(u.st[5] AS BIGINT) AS written_bytes,
        |  CAST(u.st[6] AS BIGINT) AS ingested_bytes,
        |  CAST(u.st[5] * 1000 // u.st[6] AS BIGINT) AS write_amp_permille
        |FROM marks ORDER BY day""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg((count(lit(1)) * 40 +
          sum(length(col("o_orderstatus")) + length(col("o_orderpriority"))))
          .cast("long").as("bytes"))
      val arr = daily.agg(
        transform(array_sort(collect_list(struct(col("day"), col("bytes")))),
          e => e.getField("bytes")).as("bs"),
        sort_array(collect_list(col("day"))).as("days"),
        count(lit(1)).cast("int").as("t"))
      val marks = arr.select(explode(expr(
        """transform(
          |  filter(sequence(1, t), i -> i = t
          |    OR year(element_at(days, i + 1)) <> year(element_at(days, i))),
          |  i -> struct(
          |  element_at(days, i) as day,
          |  aggregate(slice(bs, 1, i),
          |    array(0L, 0L, 0L, 0L, 0L, 0L),
          |    (acc, v) -> CASE
          |      WHEN acc[0] + v > 4194304 AND acc[1] + acc[0] + v > 41943040
          |        AND acc[2] + acc[1] + acc[0] + v > 419430400 THEN
          |        array(0L, 0L, 0L, acc[3] + acc[2] + acc[1] + acc[0] + v,
          |          acc[4] + 3 * (acc[0] + v) + 2 * acc[1] + acc[2]
          |            + acc[3] + acc[2] + acc[1] + acc[0] + v,
          |          acc[5] + v)
          |      WHEN acc[0] + v > 4194304 AND acc[1] + acc[0] + v > 41943040 THEN
          |        array(0L, 0L, acc[2] + acc[1] + acc[0] + v, acc[3],
          |          acc[4] + 2 * (acc[0] + v) + acc[1]
          |            + acc[2] + acc[1] + acc[0] + v,
          |          acc[5] + v)
          |      WHEN acc[0] + v > 4194304 THEN
          |        array(0L, acc[1] + acc[0] + v, acc[2], acc[3],
          |          acc[4] + acc[0] + v + acc[1] + acc[0] + v,
          |          acc[5] + v)
          |      ELSE array(acc[0] + v, acc[1], acc[2], acc[3],
          |        acc[4] + v, acc[5] + v) END) as st))""".stripMargin))
        .as("r"))
      val ye = marks.select(col("r.day").as("day"), col("r.st").as("st"))
      ye.select(col("day"),
        expr("st[0]").as("l0_bytes"), expr("st[1]").as("l1_bytes"),
        expr("st[2]").as("l2_bytes"), expr("st[3]").as("l3_bytes"),
        expr("st[4]").as("written_bytes"), expr("st[5]").as("ingested_bytes"),
        expr("st[4] * 1000 div st[5]").cast("long").as("write_amp_permille"))
        .orderBy(col("day"))
    },

    // ---- A190: Elo ratings over a real match sequence ---------------------------
    // Each day the two top-revenue nations "play"; the higher revenue
    // wins. Ratings update R += K(S − E) with K=32 and E from the baked
    // 40-bucket logistic permille table — the whole 25-rating state
    // vector folds through the day-ordered match list via
    // transform-inside-aggregate, one deterministic integer step per
    // match. Output: final rating per nation beside its raw win/loss
    // record (Elo re-weights wins by opponent strength — the two
    // columns disagree exactly where scheduling was unbalanced).
    QueryDef.sql(
      "a190_elo_ratings",
      s"""WITH drev AS (
        |  SELECT CAST(o.o_orderdate AS DATE) AS day, c.c_nationkey AS nk,
        |    CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2),
        |top2 AS (
        |  SELECT day, nk, cents,
        |    row_number() OVER (PARTITION BY day ORDER BY cents DESC, nk ASC)
        |      AS rn
        |  FROM drev QUALIFY rn <= 2),
        |matches AS (
        |  SELECT w.day, w.nk AS wk, l.nk AS lk
        |  FROM top2 w JOIN top2 l ON l.day = w.day AND l.rn = 2
        |  WHERE w.rn = 1),
        |marr AS (
        |  SELECT list([wk, lk] ORDER BY day) AS ms, CAST(count(*) AS INT) AS t
        |  FROM matches),
        |fold AS (
        |  SELECT list_reduce(list_prepend(
        |      list_transform(range(0, 25), x -> CAST(1500 AS BIGINT)), ms),
        |    (acc, m) -> list_transform(range(0, 25), j ->
        |      CASE WHEN j = m[1] THEN acc[j + 1]
        |          + (32 * (1000 - [${EloTable.mkString(", ")}]
        |            [least(greatest((acc[m[1] + 1] - acc[m[2] + 1] + 1000)
        |              // 50, 0), 39) + 1])) // 1000
        |        WHEN j = m[2] THEN acc[j + 1]
        |          - (32 * (1000 - [${EloTable.mkString(", ")}]
        |            [least(greatest((acc[m[1] + 1] - acc[m[2] + 1] + 1000)
        |              // 50, 0), 39) + 1])) // 1000
        |        ELSE acc[j + 1] END)) AS ratings
        |  FROM marr),
        |rec AS (
        |  SELECT nk, CAST(sum(w) AS BIGINT) AS wins,
        |    CAST(sum(l) AS BIGINT) AS losses
        |  FROM (SELECT wk AS nk, 1 AS w, 0 AS l FROM matches
        |    UNION ALL SELECT lk, 0, 1 FROM matches)
        |  GROUP BY 1),
        |er AS (
        |  SELECT unnest(generate_series(0, 24)) AS nk)
        |SELECT n.n_name AS nation,
        |  CAST(f.ratings[e.nk + 1] AS BIGINT) AS elo,
        |  coalesce(r.wins, 0) AS wins, coalesce(r.losses, 0) AS losses
        |FROM er e CROSS JOIN fold f
        |JOIN nation n ON n.n_nationkey = e.nk
        |LEFT JOIN rec r ON r.nk = e.nk
        |ORDER BY nation""".stripMargin) { (s, d) =>
      val drev = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .groupBy(col("o_orderdate").cast("date").as("day"),
          col("c_nationkey").as("nk"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).cast("long")
          .as("cents"))
      val top2 = drev.withColumn("rn", row_number().over(
          Window.partitionBy(col("day"))
            .orderBy(col("cents").desc, col("nk").asc)))
        .filter(col("rn") <= 2)
      val matches = top2.filter(col("rn") === 1)
        .select(col("day"), col("nk").as("wk"))
        .join(top2.filter(col("rn") === 2)
          .select(col("day"), col("nk").as("lk")), Seq("day"))
        .localCheckpoint(true) // feeds the fold AND the win/loss record
      val marr = matches.agg(
        transform(array_sort(collect_list(
          struct(col("day"), col("wk"), col("lk")))),
          e => array(e.getField("wk"), e.getField("lk"))).as("ms"))
      val table = s"array(${EloTable.mkString("L, ")}L)"
      val fold = marr.select(expr(
        s"""aggregate(ms,
          |  transform(sequence(0, 24), x -> cast(1500 as bigint)),
          |  (acc, m) -> transform(sequence(0, 24), j ->
          |    CASE WHEN j = m[0] THEN acc[j]
          |        + (32 * (1000 - element_at($table,
          |          cast(least(greatest((acc[cast(m[0] as int)]
          |              - acc[cast(m[1] as int)] + 1000)
          |            div 50, 0L), 39L) as int) + 1))) div 1000
          |      WHEN j = m[1] THEN acc[j]
          |        - (32 * (1000 - element_at($table,
          |          cast(least(greatest((acc[cast(m[0] as int)]
          |              - acc[cast(m[1] as int)] + 1000)
          |            div 50, 0L), 39L) as int) + 1))) div 1000
          |      ELSE acc[j] END))""".stripMargin).as("ratings"))
      val rec = matches.select(col("wk").as("nk"), lit(1L).as("w"), lit(0L).as("l"))
        .unionByName(matches.select(col("lk").as("nk"), lit(0L).as("w"),
          lit(1L).as("l")))
        .groupBy(col("nk"))
        .agg(sum(col("w")).cast("long").as("wins"),
          sum(col("l")).cast("long").as("losses"))
      val er = s.range(0, 25).select(col("id").as("nk"))
      er.crossJoin(broadcast(fold))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))),
          Seq("nk"))
        .join(rec, Seq("nk"), "left")
        .select(col("nation"),
          expr("element_at(ratings, cast(nk as int) + 1)").cast("long").as("elo"),
          coalesce(col("wins"), lit(0L)).as("wins"),
          coalesce(col("losses"), lit(0L)).as("losses"))
        .orderBy(col("nation"))
    },

    // ---- U91: Merkle-tree anti-entropy diff --------------------------------------
    // Two order snapshots (the live table and a replica where every
    // 997th key drifted) compared the way Dynamo/Cassandra repair does:
    // per-bucket digests at two tree levels (64 coarse / 4096 fine
    // buckets, xxhash64 XOR-folded so the digest is order-independent),
    // descending only into buckets whose digests disagree. The output
    // counts compared vs differing buckets per level and the leaf rows
    // a repair would ship — versus the full-scan row count the tree
    // avoided.
    QueryDef.sql(
      "u91_merkle_diff",
      """WITH a AS (
        |  SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders),
        |b AS (
        |  SELECT k, CASE WHEN k % 997 = 0 THEN v + 1 ELSE v END AS v FROM a),
        |ha AS (
        |  SELECT k % 4096 AS fine, k % 64 AS coarse,
        |    hash(CAST(k AS VARCHAR) || ':' || CAST(v AS VARCHAR)) AS h
        |  FROM a),
        |hb AS (
        |  SELECT k % 4096 AS fine, k % 64 AS coarse,
        |    hash(CAST(k AS VARCHAR) || ':' || CAST(v AS VARCHAR)) AS h
        |  FROM b),
        |ca AS (SELECT coarse, bit_xor(h) AS dig, count(*) AS n
        |  FROM ha GROUP BY 1),
        |cb AS (SELECT coarse, bit_xor(h) AS dig FROM hb GROUP BY 1),
        |cdiff AS (
        |  SELECT ca.coarse FROM ca JOIN cb ON cb.coarse = ca.coarse
        |  WHERE ca.dig <> cb.dig),
        |fa AS (SELECT fine, coarse, bit_xor(h) AS dig, count(*) AS n
        |  FROM ha GROUP BY 1, 2),
        |fb AS (SELECT fine, coarse, bit_xor(h) AS dig FROM hb GROUP BY 1, 2),
        |fdiff AS (
        |  SELECT fa.fine, fa.n FROM fa
        |  JOIN fb ON fb.fine = fa.fine
        |  JOIN cdiff c ON c.coarse = fa.coarse
        |  WHERE fa.dig <> fb.dig)
        |SELECT CAST(64 AS BIGINT) AS coarse_buckets,
        |  CAST((SELECT count(*) FROM cdiff) AS BIGINT) AS coarse_differing,
        |  CAST((SELECT count(*) FROM fa JOIN cdiff c ON c.coarse = fa.coarse)
        |    AS BIGINT) AS fine_compared,
        |  CAST((SELECT count(*) FROM fdiff) AS BIGINT) AS fine_differing,
        |  CAST((SELECT sum(n) FROM fdiff) AS BIGINT) AS leaf_rows_shipped,
        |  CAST((SELECT count(*) FROM a) AS BIGINT) AS full_scan_rows""".stripMargin) { (s, d) =>
      val a = Tables.orders(s, d).select(col("o_orderkey").as("k"),
        floor(col("o_totalprice") * 100).cast("long").as("v"))
      val b = a.select(col("k"),
        when(col("k") % 997 === 0, col("v") + 1).otherwise(col("v")).as("v"))
      def hashed(df: DataFrame) = df.select(
        (col("k") % 4096).as("fine"), (col("k") % 64).as("coarse"),
        xxhash64(concat(col("k").cast("string"), lit(":"),
          col("v").cast("string"))).as("h"))
      val ha = hashed(a).localCheckpoint(true) // both levels read it
      val hb = hashed(b).localCheckpoint(true)
      val ca = ha.groupBy(col("coarse"))
        .agg(expr("bit_xor(h)").as("dig"), count(lit(1)).as("n"))
      val cb = hb.groupBy(col("coarse")).agg(expr("bit_xor(h)").as("dig"))
      val cdiff = ca.join(cb.withColumnRenamed("dig", "dig_b"), Seq("coarse"))
        .filter(col("dig") =!= col("dig_b")).select(col("coarse"))
        .localCheckpoint(true)
      val fa = ha.groupBy(col("fine"), col("coarse"))
        .agg(expr("bit_xor(h)").as("dig"), count(lit(1)).as("n"))
      val fb = hb.groupBy(col("fine"), col("coarse"))
        .agg(expr("bit_xor(h)").as("dig"))
      val fineCompared = fa.join(broadcast(cdiff), Seq("coarse"))
      val fdiff = fineCompared
        .join(fb.select(col("fine"), col("dig").as("dig_b")), Seq("fine"))
        .filter(col("dig") =!= col("dig_b"))
      val n = a.agg(count(lit(1)).cast("long").as("full_scan_rows"))
      cdiff.agg(count(lit(1)).cast("long").as("coarse_differing"))
        .crossJoin(fineCompared.agg(count(lit(1)).cast("long")
          .as("fine_compared")))
        .crossJoin(fdiff.agg(count(lit(1)).cast("long").as("fine_differing"),
          sum(col("n")).cast("long").as("leaf_rows_shipped")))
        .crossJoin(broadcast(n))
        .select(lit(64L).as("coarse_buckets"), col("coarse_differing"),
          col("fine_compared"), col("fine_differing"),
          col("leaf_rows_shipped"), col("full_scan_rows"))
    }
  )
}
