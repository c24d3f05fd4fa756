package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Sixty-fifth frontier batch: Kruskal–Wallis k-sample test, circadian
  * peak-window inference, Z-order layout effectiveness audit.
  */
object Frontier65Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A124: Kruskal–Wallis k-sample rank test ----------------------------
    // a112 compares two samples; Kruskal–Wallis asks whether ANY of the
    // five event types' value distributions differ, per day. Midranks
    // double to integers (the a112 trick); Σ R²ⱼ/nⱼ stays exact by
    // multiplying through by Π nⱼ (each nⱼ divides Π); H lands in
    // micro units as H = 3·Σ(R2ⱼ²·(Π div nⱼ))·10⁶ div (N(N+1)·Π)
    // − 3(N+1)·10⁶ (12/4 = 3 absorbs the rank doubling; classical
    // uncorrected-for-ties H — identical in both engines). Significance
    // is χ²₍₄₎ = 9.488. Day-partitioned rank windows; crumbs after.
    QueryDef.sql(
      "a124_kruskal_wallis",
      """WITH v AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS x
        |  FROM events),
        |r AS (
        |  SELECT day, event_type,
        |    2 * rank() OVER (PARTITION BY day ORDER BY x)
        |      + count(*) OVER (PARTITION BY day, x) - 1 AS r2
        |  FROM v),
        |g AS (
        |  SELECT day, event_type, CAST(count(*) AS BIGINT) AS n_g,
        |    CAST(sum(r2) AS BIGINT) AS r2sum
        |  FROM r GROUP BY 1, 2),
        |pr AS (
        |  SELECT day, CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k,
        |    list_reduce(list(CAST(n_g AS HUGEINT)), (a, b) -> a * b) AS prod
        |  FROM g GROUP BY day),
        |hn AS (
        |  SELECT g.day,
        |    CAST(sum(CAST(g.r2sum AS HUGEINT) * g.r2sum * (p.prod // g.n_g))
        |      AS HUGEINT) AS hnum_part
        |  FROM g JOIN pr p USING (day) GROUP BY g.day),
        |h AS (
        |  SELECT p.day, p.n, p.k,
        |    CAST((3 * hn.hnum_part * 1000000) // (p.n * (p.n + 1) * p.prod)
        |      - 3 * (p.n + 1) * 1000000 AS BIGINT) AS h_micro
        |  FROM pr p JOIN hn USING (day))
        |SELECT day, n, CAST(k AS INT) AS k, h_micro,
        |  CAST(h_micro > 9487729 AS INT) AS significant
        |FROM h ORDER BY day""".stripMargin) { (s, d) =>
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val v = Tables.events(s, d).select(col("ts").cast("date").as("day"),
        col("event_type"), floor(col("value") * 100).cast("long").as("x"))
      val r = v.select(col("day"), col("event_type"),
        (lit(2) * rank().over(Window.partitionBy(col("day")).orderBy(col("x")))
          + count(lit(1)).over(Window.partitionBy(col("day"), col("x"))) - 1)
          .as("r2"))
      val g = r.groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n_g"), sum(col("r2")).cast("long").as("r2sum"))
      val dd = g.groupBy(col("day"))
        .agg(sum(col("n_g")).cast("long").as("n"), count(lit(1)).as("k"),
          aggregate(collect_list(col("n_g").cast(dec)),
            lit(1L).cast(dec), (a, b) => (a * b).cast(dec)).as("prod"),
          collect_list(struct(col("n_g"), col("r2sum"))).as("cells"))
        .select(col("day"), col("n"), col("k"), col("prod"),
          expr("""aggregate(cells, cast(0 as decimal(38,0)),
                (acc, c) -> cast(acc + cast(c.r2sum as decimal(38,0)) * c.r2sum
                  * (prod div c.n_g) as decimal(38,0)))""").as("hnum_part"))
      dd.select(col("day"), col("n"), col("k").cast("int").as("k"),
          (expr("(3 * hnum_part * 1000000) div (n * (n + 1) * prod)")
            - lit(3) * (col("n") + 1) * 1000000L).cast("long").as("h_micro"))
        .withColumn("significant", (col("h_micro") > 9487729L).cast("int"))
        .orderBy(col("day"))
    },

    // ---- EV76: circadian peak-window inference ------------------------------
    // Per-user behavioral profiling: which CIRCULAR 4-hour window of
    // the day holds the most activity? All 24 wrap-around windows fan
    // out from one hour-of-day histogram (24 cells per user — the
    // fan-out multiplies cells, not events); the argmax breaks ties on
    // the earlier start. Circularity = modular hour arithmetic, no
    // special-casing midnight. One user-hour aggregate + a bounded
    // rank window.
    QueryDef.sql(
      "ev76_circadian_peak",
      """WITH hh AS (
        |  SELECT user_id, CAST(hour(ts) AS BIGINT) AS h,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |win AS (
        |  SELECT u.user_id, w.s,
        |    CAST(coalesce(sum(CASE WHEN (hh.h - w.s + 24) % 24 < 4
        |      THEN hh.n END), 0) AS BIGINT) AS n_win
        |  FROM (SELECT DISTINCT user_id FROM hh) u
        |  CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS s) w
        |  LEFT JOIN hh ON hh.user_id = u.user_id
        |  GROUP BY 1, 2)
        |SELECT user_id, CAST(s AS INT) AS peak_start_hour, n_win AS peak_events
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY n_win DESC, s) AS rn FROM win)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      val hh = Tables.events(s, d)
        .groupBy(col("user_id"), hour(col("ts")).cast("long").as("h"))
        .agg(count(lit(1)).as("n"))
      val win = hh
        .crossJoin(broadcast(s.range(0, 24).select(col("id").as("s"))))
        .groupBy(col("user_id"), col("s"))
        .agg(coalesce(sum(when((col("h") - col("s") + 24) % 24 < 4, col("n"))),
          lit(0L)).as("n_win"))
      win.withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
          .orderBy(col("n_win").desc, col("s"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("s").cast("int").as("peak_start_hour"),
          col("n_win").as("peak_events"))
        .orderBy(col("user_id"))
    },

    // ---- U48: Z-order layout effectiveness audit ----------------------------
    // The lakehouse question after c11 writes a Z-ordered table: how
    // much scan skipping does the layout actually buy? Chunk the
    // corpus into 1000-row "files" under (a) natural doc_id order and
    // (b) Morton order on (n_chars, doc_id % 1024); per chunk keep the
    // n_chars min/max zone map; a band predicate (n_chars BETWEEN 100
    // AND 150) then counts survivable chunks. The verdict — scanned
    // chunks under each layout — is the number a table optimizer
    // weighs before rewriting. Chunk ids come from ShardedRank's
    // two-phase machinery — no single-partition window at any size.
    QueryDef.sql(
      "u48_zorder_effectiveness",
      """WITH src AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS a,
        |    CAST(doc_id % 1024 AS BIGINT) AS b
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, a, b,
        |    list_reduce(list_transform(range(0, 10),
        |      i -> (((a >> i) & 1) << (2 * i + 1)) + (((b >> i) & 1) << (2 * i))),
        |      (x, y) -> x + y) AS z
        |  FROM src),
        |nat AS (
        |  SELECT 'natural' AS layout,
        |    (row_number() OVER (ORDER BY doc_id) - 1) // 1000 AS chunk, a
        |  FROM m),
        |zord AS (
        |  SELECT 'zorder' AS layout,
        |    (row_number() OVER (ORDER BY z, doc_id) - 1) // 1000 AS chunk, a
        |  FROM m),
        |chunks AS (
        |  SELECT layout, chunk, min(a) AS lo, max(a) AS hi
        |  FROM (SELECT * FROM nat UNION ALL SELECT * FROM zord)
        |  GROUP BY 1, 2)
        |SELECT layout, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(*) FILTER (WHERE hi >= 100 AND lo <= 150) AS BIGINT)
        |    AS chunks_scanned,
        |  CAST(count(*) FILTER (WHERE hi >= 100 AND lo <= 150) * 1000
        |    // count(*) AS BIGINT) AS scan_permille
        |FROM chunks GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val src = Tables.documents(s, d).select(col("doc_id"),
        col("n_chars").cast("long").as("a"), (col("doc_id") % 1024).as("b"))
      val m = src.withColumn("z", expr(
        """aggregate(transform(sequence(0, 9),
          i -> shiftleft((a >> i) & 1, 2 * i + 1) + shiftleft((b >> i) & 1, 2 * i)),
          cast(0 as bigint), (x, y) -> x + y)"""))
        .localCheckpoint(true) // both layouts chunk the same Morton codes
      // two-phase sharded ranks (no single-partition window); the total
      // orders are deterministic, so chunk ids equal the oracle's flat
      // row_number formulation exactly
      import graft.operators.ShardedRank
      val nat = ShardedRank.withRank(m, "rk", col("doc_id"))
        .select(lit("natural").as("layout"),
          expr("(rk - 1) div 1000").as("chunk"), col("a"))
      val zord = ShardedRank.withRank(m, "rk", col("z"), col("doc_id"))
        .select(lit("zorder").as("layout"),
          expr("(rk - 1) div 1000").as("chunk"), col("a"))
      nat.unionByName(zord)
        .groupBy(col("layout"), col("chunk"))
        .agg(min(col("a")).as("lo"), max(col("a")).as("hi"))
        .groupBy(col("layout"))
        .agg(count(lit(1)).as("n_chunks"),
          count(when(col("hi") >= 100 && col("lo") <= 150, 1)).as("chunks_scanned"),
          expr("count(CASE WHEN hi >= 100 AND lo <= 150 THEN 1 END) * 1000 " +
            "div count(*)").cast("long").as("scan_permille"))
        .orderBy(col("layout"))
    }
  )
}
