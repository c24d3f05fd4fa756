package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions.tokens
import graft.operators.ShardedRank

/** Forty-seventh frontier batch: Markov removal-effect attribution,
  * skip-gram negative sampling, per-day peak concurrency.
  */
object Frontier47Queries {

  // Eight unrolled absorption rounds: v_{k+1}[s] = Σ_t (v_k[t]·p) div 1e9,
  // per-term truncation INSIDE the sum so every intermediate stays a
  // BIGINT (mass ≤ 1e9, p ≤ 1e9 → product ≤ 1e18).
  private val mkIters: String = (1 to 8).map { k =>
    s"""r$k AS (
       |  SELECT v.variant, t.dst AS state,
       |    CAST(sum((v.mass * t.p) // 1000000000) AS BIGINT) AS mass
       |  FROM r${k - 1} v JOIN trans t
       |    ON v.variant = t.variant AND v.state = t.frm
       |  GROUP BY 1, 2)""".stripMargin
  }.mkString(",\n")

  val defs: Seq[QueryDef] = Seq(

    // ---- A103: Markov removal-effect attribution ----------------------------
    // The attribution model ev17's position rules can't express: build
    // the first-order journey chain (START → channels → CONV/NULL,
    // purchase absorbing, per-user paths truncated at first purchase),
    // then for each channel REMOVE it (transitions into it become
    // losses) and measure how much conversion the chain loses — the
    // removal effect. Absorption probabilities are iterative, normally
    // un-oracle-able; eight unrolled rounds of vector×matrix in
    // truncated integer nano-units (the a98/d7 discipline, absorbing
    // states as p=1e9 self-loops) make every round bit-reproducible.
    // Scale: the corpus collapses to a ≤42-row transition table in one
    // user-grain shuffle + one count aggregate; the chain algebra runs
    // on broadcast crumbs. Horizon-8 conversion mass is the metric.
    QueryDef.sql(
      "a103_markov_attribution",
      s"""WITH ord AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |fp AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'purchase' THEN rn END) AS f
        |  FROM ord GROUP BY 1),
        |pre AS (
        |  SELECT o.user_id, o.event_type AS ch, o.rn,
        |    (f.f IS NOT NULL) AS conv
        |  FROM ord o JOIN fp f ON o.user_id = f.user_id
        |  WHERE o.rn < coalesce(f.f, 2147483647)),
        |steps AS (
        |  SELECT ch AS frm,
        |    coalesce(lead(ch) OVER (PARTITION BY user_id ORDER BY rn),
        |      CASE WHEN conv THEN 'CONV' ELSE 'NULL' END) AS dst
        |  FROM pre),
        |firstch AS (
        |  SELECT user_id, arg_min(ch, rn) AS ch0 FROM pre GROUP BY 1),
        |starts AS (
        |  SELECT 'START' AS frm,
        |    coalesce(p.ch0, CASE WHEN f.f IS NOT NULL THEN 'CONV' ELSE 'NULL' END)
        |      AS dst
        |  FROM fp f LEFT JOIN firstch p ON f.user_id = p.user_id),
        |edges AS (
        |  SELECT frm, dst, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT frm, dst FROM steps UNION ALL SELECT frm, dst FROM starts)
        |  GROUP BY 1, 2),
        |variants AS (SELECT * FROM (VALUES ('full', '~none~'), ('click', 'click'),
        |  ('error', 'error'), ('signup', 'signup'), ('view', 'view'))
        |  AS t(variant, removed)),
        |vcounts AS (
        |  SELECT v.variant, e.frm,
        |    CASE WHEN e.dst = v.removed THEN 'NULL' ELSE e.dst END AS dst,
        |    CAST(sum(e.c) AS BIGINT) AS c
        |  FROM edges e CROSS JOIN variants v
        |  WHERE e.frm <> v.removed GROUP BY 1, 2, 3),
        |tots AS (
        |  SELECT variant, frm, CAST(sum(c) AS BIGINT) AS t
        |  FROM vcounts GROUP BY 1, 2),
        |trans AS (
        |  SELECT vc.variant, vc.frm, vc.dst, (vc.c * 1000000000) // tt.t AS p
        |  FROM vcounts vc JOIN tots tt
        |    ON vc.variant = tt.variant AND vc.frm = tt.frm
        |  UNION ALL
        |  SELECT v.variant, a.st, a.st, CAST(1000000000 AS BIGINT)
        |  FROM variants v CROSS JOIN (VALUES ('CONV'), ('NULL')) a(st)),
        |r0 AS (SELECT variant, 'START' AS state,
        |  CAST(1000000000 AS BIGINT) AS mass FROM variants),
        |$mkIters,
        |convm AS (
        |  SELECT variant,
        |    coalesce(max(CASE WHEN state = 'CONV' THEN mass END), 0) AS pconv
        |  FROM r8 GROUP BY 1),
        |basem AS (SELECT pconv AS pfull FROM convm WHERE variant = 'full')
        |SELECT c.variant, CAST(c.pconv AS BIGINT) AS p_conv_nano,
        |  CAST(CASE WHEN c.variant = 'full' THEN NULL
        |    ELSE 1000 - (c.pconv * 1000) // b.pfull END AS BIGINT)
        |    AS removal_permille
        |FROM convm c CROSS JOIN basem b""".stripMargin) { (s, d) =>
      import s.implicits._
      val ord = Tables.events(s, d)
        .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))))
        .select(col("user_id"), col("event_type"), col("rn"))
      val fp = ord.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "purchase", col("rn"))).as("f"))
      val pre = ord.join(fp, "user_id")
        .filter(col("rn") < coalesce(col("f"), lit(Int.MaxValue)))
        .select(col("user_id"), col("event_type").as("ch"), col("rn"),
          col("f").isNotNull.as("conv"))
      val steps = pre.select(col("ch").as("frm"),
        coalesce(lead(col("ch"), 1).over(Window.partitionBy(col("user_id"))
            .orderBy(col("rn"))),
          when(col("conv"), "CONV").otherwise("NULL")).as("dst"))
      val firstch = pre.groupBy(col("user_id")).agg(min_by(col("ch"), col("rn")).as("ch0"))
      val starts = fp.join(firstch, Seq("user_id"), "left")
        .select(lit("START").as("frm"),
          coalesce(col("ch0"), when(col("f").isNotNull, "CONV").otherwise("NULL"))
            .as("dst"))
      val edges = steps.unionByName(starts)
        .groupBy(col("frm"), col("dst")).agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // crumb table feeding the 5-variant fan-out
      val variants = Seq(("full", "~none~"), ("click", "click"), ("error", "error"),
        ("signup", "signup"), ("view", "view")).toDF("variant", "removed")
      val vcounts = edges.crossJoin(broadcast(variants))
        .filter(col("frm") =!= col("removed"))
        .groupBy(col("variant"), col("frm"),
          when(col("dst") === col("removed"), "NULL").otherwise(col("dst")).as("dst"))
        .agg(sum(col("c")).as("c"))
      val tots = vcounts.groupBy(col("variant"), col("frm")).agg(sum(col("c")).as("t"))
      val selfLoops = variants.crossJoin(Seq("CONV", "NULL").toDF("st"))
        .select(col("variant"), col("st").as("frm"), col("st").as("dst"),
          lit(1000000000L).as("p"))
      val trans = vcounts.join(tots, Seq("variant", "frm"))
        .select(col("variant"), col("frm"), col("dst"),
          expr("c * 1000000000 div t").as("p"))
        .unionByName(selfLoops)
        .localCheckpoint(true) // ≤ ~50 rows; pins the plan for 8 rounds
      var v = variants.select(col("variant"), lit("START").as("state"),
        lit(1000000000L).as("mass"))
      // r5 opt: the mass vector is ≤ ~30 rows and trans ≤ ~50 — the old
      // per-round localCheckpoint made every round 3 eager jobs (24 jobs
      // of pure scheduling for 8 rounds). trans is checkpointed once
      // above, so the 8 chained broadcast joins all REUSE one
      // BroadcastExchange and the whole walk collapses into a single
      // job; each round's agg shuffles ~30 rows.
      (1 to 8).foreach { _ =>
        v = v.select(col("variant").as("vvariant"), col("state").as("vstate"),
            col("mass"))
          .join(broadcast(trans), col("vvariant") === col("variant")
            && col("vstate") === col("frm"))
          .groupBy(col("variant"), col("dst").as("state"))
          .agg(sum(expr("(mass * p) div 1000000000")).as("mass"))
      }
      val convm = v.groupBy(col("variant"))
        .agg(coalesce(max(when(col("state") === "CONV", col("mass"))), lit(0L))
          .as("pconv"))
      val basem = convm.filter(col("variant") === "full")
        .select(col("pconv").as("pfull"))
      convm.crossJoin(broadcast(basem))
        .select(col("variant"), col("pconv").cast("long").as("p_conv_nano"),
          when(col("variant") === "full", lit(null))
            .otherwise(lit(1000) - expr("pconv * 1000 div pfull")).cast("long")
            .as("removal_permille"))
    },

    // ---- T52: skip-gram pairs + deterministic negative sampling -------------
    // word2vec-style training data: adjacent-token (center, context)
    // positives from a 5% doc subsample, and for each positive two
    // negatives drawn type-uniformly from the FULL corpus vocabulary by
    // an md5 coin — negative_j = vocab token at rank
    // (h(doc:pos:j) mod V) + 1. The vocabulary rank is ShardedRank
    // (freq DESC, term) — the two-phase global row_number with NO
    // unpartitioned window — so the whole generator would run at
    // web-corpus vocab sizes; the oracle takes the naive global-window
    // route. Every draw is deterministic → full hash-gate coverage of
    // a sampling operator.
    QueryDef.sql(
      "t52_negative_sampling",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ts
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(generate_series(1, len(ts))) AS p, ts
        |  FROM toks),
        |flat AS (SELECT doc_id, p - 1 AS pos, ts[p] AS tok FROM tok),
        |vocab AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM flat GROUP BY 1),
        |ranked AS (
        |  SELECT tok, row_number() OVER (ORDER BY freq DESC, tok) AS rank
        |  FROM vocab),
        |vtot AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
        |pos AS (
        |  SELECT doc_id, pos, tok AS center,
        |    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS context
        |  FROM flat WHERE doc_id % 20 = 0),
        |pairs AS (SELECT * FROM pos WHERE context IS NOT NULL),
        |drawn AS (
        |  SELECT p.doc_id, p.pos, j.j, p.center, p.context,
        |    ('0x' || substr(md5(CAST(p.doc_id AS VARCHAR) || ':'
        |      || CAST(p.pos AS VARCHAR) || ':' || CAST(j.j AS VARCHAR)), 1, 8))
        |      ::BIGINT % v + 1 AS r
        |  FROM pairs p CROSS JOIN (VALUES (1), (2)) j(j) CROSS JOIN vtot)
        |SELECT d.doc_id, CAST(d.pos AS INT) AS pos, CAST(d.j AS INT) AS j,
        |  d.center, d.context, rk.tok AS negative
        |FROM drawn d JOIN ranked rk ON d.r = rk.rank""".stripMargin) { (s, d) =>
      val flat = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "tok")))
      val vocab = flat.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      val ranked = ShardedRank.withRank(vocab, "rank",
        col("freq").desc, col("tok"))
      val vtot = vocab.agg(count(lit(1)).as("v"))
      val pairs = flat.filter(col("doc_id") % 20 === 0)
        .withColumn("context", lead(col("tok"), 1)
          .over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
        .filter(col("context").isNotNull)
        .select(col("doc_id"), col("pos"), col("tok").as("center"), col("context"))
      val drawn = pairs
        .select(col("*"), explode(array(lit(1), lit(2))).as("j"))
        .crossJoin(broadcast(vtot))
        .withColumn("r",
          expr("CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', CAST(pos AS STRING), ':', CAST(j AS STRING))), 1, 8), 16, 10) AS BIGINT) % v + 1"))
      drawn.join(ranked.select(col("tok").as("negative"), col("rank")),
          col("r") === col("rank"))
        .select(col("doc_id"), col("pos").cast("int").as("pos"),
          col("j").cast("int").as("j"), col("center"), col("context"),
          col("negative"))
    },

    // ---- EV67: per-day peak concurrency (interval sweep) --------------------
    // "How many sessions were open at once?" — each event opens a
    // 15-minute activity interval (clipped at midnight so the sweep
    // stays day-local); the classic +1/−1 boundary sweep with a
    // running sum gives exact concurrency, with ends sorting before
    // starts at the same instant (half-open intervals) and event_id
    // breaking residual ties. The running sum partitions by DAY —
    // bounded grain, never an unpartitioned window — and the peak +
    // first time it is attained come from one more day-grain
    // aggregate. All boundary math in integer epoch-µs.
    QueryDef.sql(
      "ev67_peak_concurrency",
      """WITH iv AS (
        |  SELECT CAST(ts AS DATE) AS day, event_id,
        |    epoch_us(ts) AS s,
        |    least(epoch_us(ts) + 900000000,
        |      epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP) + INTERVAL 1 DAY))
        |      AS e
        |  FROM events),
        |bounds AS (
        |  SELECT day, s AS t, 1 AS delta, event_id FROM iv
        |  UNION ALL
        |  SELECT day, e AS t, -1 AS delta, event_id FROM iv),
        |sweep AS (
        |  SELECT day, t,
        |    sum(delta) OVER (PARTITION BY day ORDER BY t, delta, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
        |  FROM bounds),
        |peaks AS (SELECT day, CAST(max(cur) AS BIGINT) AS peak FROM sweep GROUP BY 1),
        |pk_at AS (
        |  SELECT s.day, CAST(min(s.t) AS BIGINT) AS peak_at_us
        |  FROM sweep s JOIN peaks p ON s.day = p.day AND s.cur = p.peak
        |  GROUP BY 1),
        |n AS (SELECT day, CAST(count(*) AS BIGINT) AS n_intervals FROM iv GROUP BY 1)
        |SELECT p.day, p.peak, a.peak_at_us, n.n_intervals
        |FROM peaks p JOIN pk_at a ON p.day = a.day JOIN n ON p.day = n.day""".stripMargin) { (s, d) =>
      val iv = Tables.events(s, d).select(
        col("ts").cast("date").as("day"), col("event_id"),
        unix_micros(col("ts")).as("s"),
        least(unix_micros(col("ts")) + 900000000L,
          unix_micros(date_add(col("ts").cast("date"), 1).cast("timestamp"))).as("e"))
        .localCheckpoint(true) // feeds both boundary branches + the count
      val bounds = iv.select(col("day"), col("s").as("t"), lit(1).as("delta"), col("event_id"))
        .unionByName(iv.select(col("day"), col("e").as("t"), lit(-1).as("delta"), col("event_id")))
      val sweep = bounds.withColumn("cur",
        sum(col("delta")).over(Window.partitionBy(col("day"))
          .orderBy(col("t"), col("delta"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val peaks = sweep.groupBy(col("day")).agg(max(col("cur")).cast("long").as("peak"))
      val at = sweep.join(peaks.select(col("day"), col("peak")), Seq("day"))
        .filter(col("cur") === col("peak"))
        .groupBy(col("day")).agg(min(col("t")).cast("long").as("peak_at_us"))
      val n = iv.groupBy(col("day")).agg(count(lit(1)).as("n_intervals"))
      peaks.join(at, "day").join(n, "day")
        .select(col("day"), col("peak"), col("peak_at_us"), col("n_intervals"))
    }
  )
}
