package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-twenty-ninth frontier batch: operating-point selection on the
  * ROC curve (Youden-optimal threshold from exact decile thresholds),
  * two-level median-cut palette quantization on the stub pixel stream,
  * and the turning-point test for serial randomness in exact integer
  * arithmetic.
  */
object Frontier129Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A201: Youden-optimal threshold sweep --------------------------------------
    // a180 scored ONE operating point; this sweeps the nine exact decile
    // thresholds of the score (order statistics via ShardedRank) and
    // reports sensitivity/specificity/Youden-J per threshold, flagging
    // the J-maximizing one — threshold selection as a query, one scan
    // for the confusion sums per threshold (a 9-row broadcast fan-out,
    // not nine scans).
    QueryDef.sql(
      "a201_youden_threshold",
      """WITH x AS (
        |  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS y
        |  FROM orders),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM x),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM x),
        |th AS (
        |  SELECT q.q AS decile, max(r.v) AS thr
        |  FROM (SELECT unnest(generate_series(1, 9)) AS q) q
        |  CROSS JOIN n JOIN r ON r.rk = (q.q * n.n + 9) // 10
        |  GROUP BY 1),
        |cm AS (
        |  SELECT t.decile, t.thr,
        |    CAST(count(*) FILTER (WHERE x.v > t.thr AND x.y = 1) AS BIGINT)
        |      AS tp,
        |    CAST(count(*) FILTER (WHERE x.v > t.thr AND x.y = 0) AS BIGINT)
        |      AS fp,
        |    CAST(count(*) FILTER (WHERE x.v <= t.thr AND x.y = 1) AS BIGINT)
        |      AS fn,
        |    CAST(count(*) FILTER (WHERE x.v <= t.thr AND x.y = 0) AS BIGINT)
        |      AS tn
        |  FROM th t CROSS JOIN x GROUP BY 1, 2),
        |j AS (
        |  SELECT decile, thr, tp, fp, fn, tn,
        |    CAST(tp * 1000 // greatest(tp + fn, 1) AS BIGINT) AS sens_permille,
        |    CAST(tn * 1000 // greatest(tn + fp, 1) AS BIGINT) AS spec_permille,
        |    CAST(tp * 1000 // greatest(tp + fn, 1)
        |      + tn * 1000 // greatest(tn + fp, 1) - 1000 AS BIGINT)
        |      AS youden_permille
        |  FROM cm)
        |SELECT decile, thr AS threshold_cents, tp, fp, fn, tn,
        |  sens_permille, spec_permille, youden_permille,
        |  CAST(CASE WHEN row_number() OVER (
        |    ORDER BY youden_permille DESC, decile ASC) = 1
        |    THEN 1 ELSE 0 END AS INT) AS is_optimal
        |FROM j ORDER BY decile""".stripMargin) { (s, d) =>
      import graft.operators.ShardedRank
      val x = Tables.orders(s, d).select(
        floor(col("o_totalprice") * 100).cast("long").as("v"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0).as("y"))
        .localCheckpoint(true) // ranked thresholds + confusion sums share it
      val n = x.agg(count(lit(1)).cast("long").as("n"))
      val ranked = ShardedRank.withRank(x.select(col("v")), "rk",
        col("v").asc)
      val qs = s.range(1, 10).select(col("id").as("q"))
      val th = broadcast(qs).crossJoin(broadcast(n))
        .withColumn("target", expr("(q * n + 9) div 10"))
        .join(ranked, col("rk") === col("target"))
        .groupBy(col("q").as("decile")).agg(max(col("v")).as("thr"))
      val cm = broadcast(th).crossJoin(x)
        .groupBy(col("decile"), col("thr"))
        .agg(
          count(when(col("v") > col("thr") && col("y") === 1, 1)).cast("long")
            .as("tp"),
          count(when(col("v") > col("thr") && col("y") === 0, 1)).cast("long")
            .as("fp"),
          count(when(col("v") <= col("thr") && col("y") === 1, 1)).cast("long")
            .as("fn"),
          count(when(col("v") <= col("thr") && col("y") === 0, 1)).cast("long")
            .as("tn"))
      val j = cm.select(col("decile"), col("thr"), col("tp"), col("fp"),
        col("fn"), col("tn"),
        expr("tp * 1000 div greatest(tp + fn, 1)").cast("long")
          .as("sens_permille"),
        expr("tn * 1000 div greatest(tn + fp, 1)").cast("long")
          .as("spec_permille"),
        expr("tp * 1000 div greatest(tp + fn, 1)" +
          " + tn * 1000 div greatest(tn + fp, 1) - 1000").cast("long")
          .as("youden_permille"))
      j.withColumn("is_optimal",
        when(row_number().over(Window.orderBy(col("youden_permille").desc,
          col("decile").asc)) === 1, 1).otherwise(0).cast("int")) // 9 rows
        .select(col("decile"), col("thr").as("threshold_cents"), col("tp"),
          col("fp"), col("fn"), col("tn"), col("sens_permille"),
          col("spec_permille"), col("youden_permille"), col("is_optimal"))
        .orderBy(col("decile"))
    },

    // ---- M17: two-level median-cut palette -------------------------------------------
    // The classic palette quantizer on 96 stub pixels per image asset:
    // sort, cut at the median, cut each half at ITS median (on 1-D
    // data the two levels are the quartile boundaries), palette = the
    // four bucket means in milli, error = Σ(24·v − S_bucket)² exactly
    // (the ×576-scaled SSE — no division ever rounds). All array
    // algebra on the scan; no shuffle beyond the final ORDER BY.
    QueryDef.sql(
      "m17_median_cut",
      """WITH px AS (
        |  SELECT doc_id AS asset_id,
        |    list_sort(list_transform(
        |      string_split_regex(substring(text, 1, 96), ''),
        |      ch -> CAST(ascii(ch) AS BIGINT))) AS sp
        |  FROM documents WHERE doc_id % 3 = 1 AND length(text) >= 96),
        |bk AS (
        |  SELECT asset_id, sp,
        |    [list_reduce(sp[1:24], (a, b) -> a + b),
        |     list_reduce(sp[25:48], (a, b) -> a + b),
        |     list_reduce(sp[49:72], (a, b) -> a + b),
        |     list_reduce(sp[73:96], (a, b) -> a + b)] AS sums
        |  FROM px),
        |err AS (
        |  SELECT asset_id, sums,
        |    list_reduce(list_transform(range(1, 97),
        |      i -> (24 * sp[i] - sums[(i - 1) // 24 + 1])
        |         * (24 * sp[i] - sums[(i - 1) // 24 + 1])),
        |      (a, b) -> a + b) AS sse576
        |  FROM bk)
        |SELECT asset_id,
        |  CAST(sums[1] * 1000 // 24 AS BIGINT) AS p1_milli,
        |  CAST(sums[2] * 1000 // 24 AS BIGINT) AS p2_milli,
        |  CAST(sums[3] * 1000 // 24 AS BIGINT) AS p3_milli,
        |  CAST(sums[4] * 1000 // 24 AS BIGINT) AS p4_milli,
        |  CAST(sse576 AS BIGINT) AS sse_x576
        |FROM err ORDER BY asset_id""".stripMargin) { (s, d) =>
      val px = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(3)) === 1 && length(col("text")) >= 96)
        .select(col("doc_id").as("asset_id"),
          expr("array_sort(transform(filter(split(substring(text, 1, 96), '')," +
            " c -> length(c) > 0), c -> cast(ascii(c) as bigint)))").as("sp"))
      val bk = px.withColumn("sums", expr(
        """array(aggregate(slice(sp, 1, 24), 0L, (a, b) -> a + b),
          |  aggregate(slice(sp, 25, 24), 0L, (a, b) -> a + b),
          |  aggregate(slice(sp, 49, 24), 0L, (a, b) -> a + b),
          |  aggregate(slice(sp, 73, 24), 0L, (a, b) -> a + b))""".stripMargin))
      val err = bk.withColumn("sse576", expr(
        """aggregate(transform(sequence(1, 96),
          |  i -> (24 * element_at(sp, i)
          |      - element_at(sums, cast((i - 1) div 24 + 1 as int)))
          |    * (24 * element_at(sp, i)
          |      - element_at(sums, cast((i - 1) div 24 + 1 as int)))),
          |  0L, (a, b) -> a + b)""".stripMargin))
      err.select(col("asset_id"),
        expr("sums[0] * 1000 div 24").cast("long").as("p1_milli"),
        expr("sums[1] * 1000 div 24").cast("long").as("p2_milli"),
        expr("sums[2] * 1000 div 24").cast("long").as("p3_milli"),
        expr("sums[3] * 1000 div 24").cast("long").as("p4_milli"),
        col("sse576").cast("long").as("sse_x576"))
        .orderBy(col("asset_id"))
    },

    // ---- W43: turning-point test for serial randomness --------------------------------
    // Is each nation's daily revenue series serially random? Count
    // local extrema T (lag/lead windows); under randomness
    // E[T] = 2(n−2)/3 and Var[T] = (16n−29)/90, so the squared z-score
    // clears to (3T−2n+4)²·10000 / (9·(16n−29)/10) — kept as one exact
    // division in milli. Rejection at z² > 3.841 (95%). Per-nation
    // windows only.
    QueryDef.sql(
      "w43_turning_points",
      """WITH daily AS (
        |  SELECT c.c_nationkey AS nk, CAST(o.o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS v
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2),
        |tp AS (
        |  SELECT nk, day, v,
        |    lag(v) OVER (PARTITION BY nk ORDER BY day) AS pv,
        |    lead(v) OVER (PARTITION BY nk ORDER BY day) AS nv
        |  FROM daily),
        |cnt AS (
        |  SELECT nk, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) FILTER (WHERE pv IS NOT NULL AND nv IS NOT NULL
        |      AND ((v > pv AND v > nv) OR (v < pv AND v < nv))) AS BIGINT) AS t
        |  FROM tp GROUP BY 1)
        |SELECT n2.n_name AS nation, c.n, c.t,
        |  CAST(2000 * (c.n - 2) // 3 AS BIGINT) AS expected_milli,
        |  CAST((3 * c.t - 2 * c.n + 4) * (3 * c.t - 2 * c.n + 4) * 10000
        |    // (9 * (16 * c.n - 29) // 10) AS BIGINT) AS z2_milli,
        |  CAST(CASE WHEN (3 * c.t - 2 * c.n + 4) * (3 * c.t - 2 * c.n + 4)
        |      * 10000 // (9 * (16 * c.n - 29) // 10) > 3841
        |    THEN 1 ELSE 0 END AS INT) AS nonrandom
        |FROM cnt c JOIN nation n2 ON n2.n_nationkey = c.nk
        |ORDER BY nation""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey").as("nk"),
          col("o_orderdate").cast("date").as("day"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).cast("long")
          .as("v"))
      val w = Window.partitionBy(col("nk")).orderBy(col("day"))
      val tp = daily
        .withColumn("pv", lag(col("v"), 1).over(w))
        .withColumn("nv", lead(col("v"), 1).over(w))
      val cnt = tp.groupBy(col("nk"))
        .agg(count(lit(1)).cast("long").as("n"),
          count(when(col("pv").isNotNull && col("nv").isNotNull
            && ((col("v") > col("pv") && col("v") > col("nv"))
              || (col("v") < col("pv") && col("v") < col("nv"))), 1))
            .cast("long").as("t"))
      cnt.join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))),
          Seq("nk"))
        .select(col("nation"), col("n"), col("t"),
          expr("2000 * (n - 2) div 3").cast("long").as("expected_milli"),
          expr("(3 * t - 2 * n + 4) * (3 * t - 2 * n + 4) * 10000" +
            " div (9 * (16 * n - 29) div 10)").cast("long").as("z2_milli"),
          expr("""case when (3 * t - 2 * n + 4) * (3 * t - 2 * n + 4) * 10000
            |  div (9 * (16 * n - 29) div 10) > 3841
            |  then 1 else 0 end""".stripMargin).cast("int").as("nonrandom"))
        .orderBy(col("nation"))
    }
  )
}
