package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Thirty-sixth frontier batch: two-way ANOVA, Lindley queueing
  * recursion, Davies–Bouldin cluster quality, zone-map prune planning.
  */
object Frontier36Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A88: two-way factorial ANOVA (weekday × event type) ---------------
    // Does value depend on weekday, on event type, and do the factors
    // INTERACT? Sequential weighted-means decomposition (the Type-I
    // convention — documented, since unbalanced cells make Type I/II/
    // III differ): SSA, SSB from margin moments, SSAB from cell
    // moments minus the mains, SSE from Σx². Every T²/n lands as one
    // fixed-order double from exact BIGINT moments and folds in
    // factor-level order (a41's discipline — margins are 7/5/35-row
    // bounded sets). Σx² goes through DECIMAL(38,0): cents² sums
    // overflow BIGINT past ~10⁸ rows.
    QueryDef.sql(
      "a88_twoway_anova",
      """WITH v AS (
        |  SELECT dayofweek(CAST(ts AS DATE)) AS a, event_type AS b,
        |    CAST(floor(value * 100) AS BIGINT) AS x
        |  FROM events),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS g,
        |    CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS q
        |  FROM v),
        |ma AS (SELECT a, CAST(count(*) AS BIGINT) AS n_a, CAST(sum(x) AS BIGINT) AS t_a
        |  FROM v GROUP BY 1),
        |mb AS (SELECT b, CAST(count(*) AS BIGINT) AS n_b, CAST(sum(x) AS BIGINT) AS t_b
        |  FROM v GROUP BY 1),
        |mc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_c, CAST(sum(x) AS BIGINT) AS t_c
        |  FROM v GROUP BY 1, 2),
        |fa AS (SELECT CAST(count(*) AS BIGINT) AS ka,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(CAST(t_a AS DOUBLE) * CAST(t_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |      ORDER BY a)), (x, y) -> x + y) AS sa FROM ma),
        |fb AS (SELECT CAST(count(*) AS BIGINT) AS kb,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(CAST(t_b AS DOUBLE) * CAST(t_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |      ORDER BY b)), (x, y) -> x + y) AS sb FROM mb),
        |fc AS (SELECT CAST(count(*) AS BIGINT) AS kc,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(CAST(t_c AS DOUBLE) * CAST(t_c AS DOUBLE) / CAST(n_c AS DOUBLE)
        |      ORDER BY a, b)), (x, y) -> x + y) AS sc FROM mc),
        |fin AS (
        |  SELECT n, ka, kb, kc,
        |    sa - CAST(g AS DOUBLE) * CAST(g AS DOUBLE) / CAST(n AS DOUBLE) AS ss_a,
        |    sb - CAST(g AS DOUBLE) * CAST(g AS DOUBLE) / CAST(n AS DOUBLE) AS ss_b,
        |    sc - CAST(g AS DOUBLE) * CAST(g AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (sa - CAST(g AS DOUBLE) * CAST(g AS DOUBLE) / CAST(n AS DOUBLE))
        |      - (sb - CAST(g AS DOUBLE) * CAST(g AS DOUBLE) / CAST(n AS DOUBLE)) AS ss_ab,
        |    CAST(q AS DOUBLE) - sc AS ss_err
        |  FROM tot CROSS JOIN fa CROSS JOIN fb CROSS JOIN fc)
        |SELECT n AS n_obs, round(ss_a, 2) AS ss_a, round(ss_b, 2) AS ss_b,
        |  round(ss_ab, 2) AS ss_ab, round(ss_err, 2) AS ss_err,
        |  round((ss_ab / CAST((ka - 1) * (kb - 1) AS DOUBLE))
        |    / (ss_err / CAST(n - kc AS DOUBLE)), 6) AS f_interaction
        |FROM fin""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .select(dayofweek(col("ts").cast("date")).as("a"), col("event_type").as("b"),
          floor(col("value") * 100).cast("long").as("x"))
      val tot = v.agg(count(lit(1)).as("n"), sum(col("x")).as("g"),
        sum(col("x").cast(DecimalType(19, 0)) * col("x").cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0)).as("q"))
      def fold(df: DataFrame, keys: Seq[Column], t: Column, n: Column,
               kName: String, sName: String): DataFrame = {
        val term = t.cast("double") * t.cast("double") / n.cast("double")
        df.agg(count(lit(1)).as(kName),
          aggregate(transform(sort_array(collect_list(struct(keys :+ term.as("v"): _*))),
            x => x.getField("v")), lit(0.0), (x, y) => x + y).as(sName))
      }
      val ma = v.groupBy(col("a")).agg(count(lit(1)).as("n_a"), sum(col("x")).as("t_a"))
      val mb = v.groupBy(col("b")).agg(count(lit(1)).as("n_b"), sum(col("x")).as("t_b"))
      val mc = v.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("n_c"), sum(col("x")).as("t_c"))
      val fa = fold(ma, Seq(col("a")), col("t_a"), col("n_a"), "ka", "sa")
      val fb = fold(mb, Seq(col("b")), col("t_b"), col("n_b"), "kb", "sb")
      val fc = fold(mc, Seq(col("a"), col("b")), col("t_c"), col("n_c"), "kc", "sc")
      val gg = col("g").cast("double") * col("g").cast("double") / col("n").cast("double")
      val ssA = col("sa") - gg
      val ssB = col("sb") - gg
      val ssAB = col("sc") - gg - ssA - ssB
      val ssE = col("q").cast("double") - col("sc")
      tot.crossJoin(broadcast(fa)).crossJoin(broadcast(fb)).crossJoin(broadcast(fc))
        .select(col("n").as("n_obs"), round(ssA, 2).as("ss_a"), round(ssB, 2).as("ss_b"),
          round(ssAB, 2).as("ss_ab"), round(ssE, 2).as("ss_err"),
          round((ssAB / ((col("ka") - 1) * (col("kb") - 1)).cast("double"))
            / (ssE / (col("n") - col("kc")).cast("double")), 6).as("f_interaction"))
    },

    // ---- EV61: Lindley queue recursion (waiting-time simulation) -----------
    // What if each event stream fed a single server whose service time
    // equals the stream's own mean inter-arrival gap (utilization
    // ρ = 1 — the critical regime)? The Lindley recursion
    // W_n = max(0, W_{n−1} + S − g_n) telescopes to prefix-sum minus
    // running-min (exactly a31's CUSUM trick), so the sequential-
    // looking simulation is two PARTITIONED windows over exact
    // integer microseconds — no iteration, no floats anywhere.
    QueryDef.sql(
      "ev61_queue_lindley",
      """WITH g AS (
        |  SELECT event_type,
        |    epoch_us(ts) - lag(epoch_us(ts))
        |      OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap,
        |    ts, event_id
        |  FROM events),
        |gaps AS (SELECT event_type, gap, ts, event_id FROM g WHERE gap IS NOT NULL),
        |svc AS (SELECT event_type,
        |  CAST(sum(gap) // count(*) AS BIGINT) AS s_us FROM gaps GROUP BY 1),
        |x AS (
        |  SELECT gaps.event_type, s_us, s_us - gap AS xn, ts, event_id
        |  FROM gaps JOIN svc ON gaps.event_type = svc.event_type),
        |p AS (
        |  SELECT event_type, s_us,
        |    CAST(sum(xn) OVER (PARTITION BY event_type ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pn,
        |    ts, event_id
        |  FROM x),
        |w AS (
        |  SELECT event_type, s_us,
        |    pn - least(CAST(0 AS BIGINT), min(pn)
        |      OVER (PARTITION BY event_type ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS wn
        |  FROM p)
        |SELECT event_type, max(s_us) AS s_us, CAST(count(*) AS BIGINT) AS n_arrivals,
        |  CAST(max(wn) AS BIGINT) AS w_max_us,
        |  CAST(count(*) FILTER (WHERE wn > 0) AS BIGINT) AS n_waiting,
        |  CAST(sum(wn) // count(*) AS BIGINT) AS w_mean_us
        |FROM w GROUP BY 1""".stripMargin) { (s, d) =>
      val wT = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
      val ep = unix_micros(col("ts"))
      val gaps = Tables.events(s, d)
        .select(col("event_type"), (ep - lag(ep, 1).over(wT)).as("gap"),
          col("ts"), col("event_id"))
        .filter(col("gap").isNotNull)
      val svc = gaps.groupBy(col("event_type"))
        .agg(expr("sum(gap) div count(*)").cast("long").as("s_us"))
      val x = gaps.join(broadcast(svc), "event_type")
        .select(col("event_type"), col("s_us"), (col("s_us") - col("gap")).as("xn"),
          col("ts"), col("event_id"))
      val run = wT.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val p = x.withColumn("pn", sum(col("xn")).over(run))
      val w = p.withColumn("wn",
        col("pn") - least(lit(0L), min(col("pn")).over(run)))
      w.groupBy(col("event_type"))
        .agg(max(col("s_us")).as("s_us"), count(lit(1)).as("n_arrivals"),
          max(col("wn")).as("w_max_us"),
          count(when(col("wn") > 0, 1)).as("n_waiting"),
          expr("sum(wn) div count(*)").cast("long").as("w_mean_us"))
    },

    // ---- V27: Davies–Bouldin cluster-quality index -------------------------
    // Are the label clusters actually separated in embedding space?
    // Davies–Bouldin needs only per-cluster scatter and centroid
    // distances — one pass for moments plus a CLUSTER-bounded pair
    // space, unlike silhouette's all-pairs. Exactness: components
    // quantize to integer micro-units (floor(x·1e6) — pure IEEE
    // product+floor, the v15 discipline), centroids stay RATIONAL
    // (sums + counts, never divided), and every distance multiplies
    // through by the denominators so the radicand is an exact DECIMAL
    // integer; the one sqrt per distance rounds to 8 dp before the
    // bounded per-cluster folds.
    QueryDef.sql(
      "v27_davies_bouldin",
      """WITH e AS (
        |  SELECT vec_id, label,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
        |  FROM embeddings),
        |ns AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |dims AS (
        |  SELECT label, unnest(range(1, len(q) + 1)) AS dim,
        |    unnest(q) AS qv
        |  FROM e),
        |cent AS (SELECT label, dim, CAST(sum(qv) AS BIGINT) AS sq
        |  FROM dims GROUP BY 1, 2),
        |pd AS (
        |  SELECT ev.vec_id, ev.label,
        |    round(sqrt(CAST(list_reduce(list_prepend(CAST(0 AS DECIMAL(38,0)),
        |      list_transform(range(1, len(ev.q) + 1),
        |        i -> CAST(ns.n * ev.q[i] - cl.sqs[i] AS DECIMAL(19,0))
        |           * CAST(ns.n * ev.q[i] - cl.sqs[i] AS DECIMAL(19,0)))),
        |      (a, b) -> a + b) AS DOUBLE))
        |      / (CAST(ns.n AS DOUBLE) * 1000000.0), 8) AS dist
        |  FROM e ev
        |  JOIN (SELECT label, list(CAST(sq AS BIGINT) ORDER BY dim) AS sqs
        |        FROM cent GROUP BY 1) cl ON ev.label = cl.label
        |  JOIN ns ON ev.label = ns.label),
        |scat AS (
        |  SELECT label,
        |    round(CAST(sum(CAST(dist AS DECIMAL(38,8))) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE), 6) AS s_i
        |  FROM pd GROUP BY 1),
        |cl2 AS (SELECT c.label, n, list(CAST(sq AS BIGINT) ORDER BY dim) AS sqs
        |  FROM cent c JOIN ns ON c.label = ns.label GROUP BY c.label, n),
        |cd AS (
        |  SELECT a.label AS la, b.label AS lb,
        |    round(sqrt(CAST(list_reduce(list_prepend(CAST(0 AS DECIMAL(38,0)),
        |      list_transform(range(1, len(a.sqs) + 1),
        |        i -> CAST(b.n * a.sqs[i] - a.n * b.sqs[i] AS DECIMAL(19,0))
        |           * CAST(b.n * a.sqs[i] - a.n * b.sqs[i] AS DECIMAL(19,0)))),
        |      (x, y) -> x + y) AS DOUBLE))
        |      / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE) * 1000000.0), 8) AS d_ij
        |  FROM cl2 a JOIN cl2 b ON a.label <> b.label),
        |r AS (
        |  SELECT cd.la AS label,
        |    max((sa.s_i + sb.s_i) / cd.d_ij) AS db_i
        |  FROM cd JOIN scat sa ON cd.la = sa.label JOIN scat sb ON cd.lb = sb.label
        |  GROUP BY 1)
        |SELECT r.label, ns.n, scat.s_i, round(r.db_i, 6) AS db_i
        |FROM r JOIN scat ON r.label = scat.label JOIN ns ON r.label = ns.label""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"),
            x => floor(x.cast("double") * 1000000).cast("long")).as("q"))
      val ns = e.groupBy(col("label")).agg(count(lit(1)).as("n"))
      val cent = e.select(col("label"), posexplode(col("q")).as(Seq("pos", "qv")))
        .groupBy(col("label"), (col("pos") + 1).as("dim")).agg(sum(col("qv")).as("sq"))
      val cl = cent.groupBy(col("label"))
        .agg(transform(sort_array(collect_list(struct(col("dim"), col("sq")))),
          x => x.getField("sq")).as("sqs"))
      def radicand(nA: Column, qArr: Column, sArr: Column): Column =
        aggregate(
          zip_with(qArr, sArr,
            (qi, si) => (nA * qi - si).cast(DecimalType(19, 0))
              * (nA * qi - si).cast(DecimalType(19, 0))),
          lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 0)), (a, b) => a + b)
      val pd = e.join(broadcast(cl), "label").join(broadcast(ns), "label")
        .select(col("label"),
          round(sqrt(radicand(col("n"), col("q"), col("sqs")).cast("double"))
            / (col("n").cast("double") * 1000000.0), 8).as("dist"))
      val scat = pd.groupBy(col("label"))
        .agg(round(sum(col("dist").cast(DecimalType(38, 8))).cast("double")
          / count(lit(1)).cast("double"), 6).as("s_i"))
      val cl2 = cl.join(ns, "label")
      val a = cl2.select(col("label").as("la"), col("n").as("na"), col("sqs").as("qa"))
      val b = cl2.select(col("label").as("lb"), col("n").as("nb"), col("sqs").as("qb"))
      val cd = a.join(b, col("la") =!= col("lb"))
        .select(col("la"), col("lb"),
          round(sqrt(aggregate(
            zip_with(col("qa"), col("qb"),
              (ai, bi) => (col("nb") * ai - col("na") * bi).cast(DecimalType(19, 0))
                * (col("nb") * ai - col("na") * bi).cast(DecimalType(19, 0))),
            lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 0)), (x, y) => x + y)
            .cast("double"))
            / (col("na").cast("double") * col("nb").cast("double") * 1000000.0), 8)
            .as("d_ij"))
      val sa = scat.select(col("label").as("la"), col("s_i").as("sa"))
      val sb = scat.select(col("label").as("lb"), col("s_i").as("sb"))
      val r = cd.join(broadcast(sa), "la").join(broadcast(sb), "lb")
        .groupBy(col("la").as("label"))
        .agg(max((col("sa") + col("sb")) / col("d_ij")).as("db_i"))
      r.join(scat, "label").join(ns, "label")
        .select(col("label"), col("n"), col("s_i"), round(col("db_i"), 6).as("db_i"))
    },

    // ---- U32: zone-map prune estimator -------------------------------------
    // How much scan does a predicate save, given day-grain zone maps
    // (min/max/count — exactly what parquet footers carry)? For each
    // candidate threshold: files whose max ≤ τ prune entirely; the
    // rows-scanned / rows-matched ratio is the I/O efficiency the
    // optimizer would see. Day stats are one partial-agg pass; the
    // threshold table is a 5-row literal grid; matched counts are 5
    // conditional aggregates in the SAME pass — no per-threshold scan.
    QueryDef.sql(
      "u32_zonemap_prune",
      """WITH zone AS (
        |  SELECT CAST(ts AS DATE) AS day, max(value) AS mx,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |taus AS (SELECT * FROM (VALUES (100.0), (200.0), (300.0), (400.0), (500.0))
        |  AS t(tau)),
        |zs AS (
        |  SELECT tau, CAST(count(*) AS BIGINT) AS n_files,
        |    CAST(count(*) FILTER (WHERE mx <= tau) AS BIGINT) AS n_pruned,
        |    CAST(coalesce(sum(cnt) FILTER (WHERE mx > tau), 0) AS BIGINT)
        |      AS rows_scanned
        |  FROM zone CROSS JOIN taus GROUP BY 1),
        |mt AS (
        |  SELECT tau, CAST(count(*) FILTER (WHERE value > tau) AS BIGINT)
        |    AS rows_matched
        |  FROM events CROSS JOIN taus GROUP BY 1)
        |SELECT zs.tau, n_files, n_pruned, rows_scanned, rows_matched,
        |  CASE WHEN rows_scanned > 0 THEN
        |    round(CAST(rows_matched AS DOUBLE) / CAST(rows_scanned AS DOUBLE), 6)
        |  ELSE NULL END AS scan_efficiency
        |FROM zs JOIN mt ON zs.tau = mt.tau""".stripMargin) { (s, d) =>
      val zone = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(max(col("value")).as("mx"), count(lit(1)).as("cnt"))
      val taus = s.range(1, 6).select((col("id") * 100).cast("double").as("tau"))
      val zs = zone.crossJoin(broadcast(taus)).groupBy(col("tau"))
        .agg(count(lit(1)).as("n_files"),
          count(when(col("mx") <= col("tau"), 1)).as("n_pruned"),
          coalesce(sum(when(col("mx") > col("tau"), col("cnt"))), lit(0L))
            .as("rows_scanned"))
      val mt = Tables.events(s, d).crossJoin(broadcast(taus)).groupBy(col("tau"))
        .agg(count(when(col("value") > col("tau"), 1)).as("rows_matched"))
      zs.join(mt, "tau")
        .select(col("tau"), col("n_files"), col("n_pruned"), col("rows_scanned"),
          col("rows_matched"),
          when(col("rows_scanned") > 0,
            round(col("rows_matched").cast("double")
              / col("rows_scanned").cast("double"), 6)).otherwise(lit(null))
            .as("scan_efficiency"))
    }
  )
}
