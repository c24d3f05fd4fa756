package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.VectorOps

/** Thirty-fourth frontier batch: TextRank keywords, dyadic-exact decayed
  * customer value, Friedman test with tie correction, k-anonymity
  * generalization audit, and a cosine-similarity histogram.
  */
object Frontier34Queries {

  // The d7 fixed-point PageRank recurrence unrolled for DuckDB, over
  // STRING node ids (terms): rank' = 0.15 + 0.85·Σ in-rank/deg in
  // nano-units with integer DIV arithmetic — bit-reproducible across
  // engines, which float PageRank is not.
  private val textrankIters: String = (1 to 5).map { k =>
    s"""r$k AS (
       |  SELECT dd.id,
       |    CAST(150000000 + (CAST(coalesce(sc.total, 0) AS BIGINT) // 20) * 17 AS BIGINT)
       |      AS rank_nano
       |  FROM deg dd LEFT JOIN (
       |    SELECT e.d AS id, sum(r.rank_nano // dg.deg) AS total
       |    FROM e JOIN r${k - 1} r ON e.s = r.id JOIN deg dg ON dg.id = e.s
       |    GROUP BY e.d) sc ON sc.id = dd.id)""".stripMargin
  }.mkString(",\n")

  val defs: Seq[QueryDef] = Seq(

    // ---- T47: TextRank keyword extraction ----------------------------------
    // The classic graph-based keyworder: adjacency co-occurrence edges
    // between consecutive tokens, PageRank over the term graph, top-10
    // terms. Reuses the d7 fixed-point integer recurrence (the ONLY
    // way an iterative centrality is hash-checkable cross-engine) via
    // graft.operators.PageRank — same operator, new graph. Edge build
    // is one scan (bigrams synthesized in array space — no posexplode
    // shuffle), dedup'd to the distinct co-occurrence set; the final
    // top-10 window ranks the VOCABULARY (bounded), not the corpus.
    QueryDef.sql(
      "t47_textrank",
      s"""WITH t AS (
         |  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
         |t2 AS (SELECT toks FROM t WHERE len(toks) >= 2),
         |bgl AS (SELECT list_transform(range(1, len(toks)),
         |    i -> struct_pack(lo := least(toks[i], toks[i + 1]),
         |                     hi := greatest(toks[i], toks[i + 1]))) AS bgs FROM t2),
         |bg AS (SELECT DISTINCT b.lo AS lo, b.hi AS hi
         |  FROM (SELECT unnest(bgs) AS b FROM bgl) WHERE b.lo <> b.hi),
         |e AS (SELECT lo AS s, hi AS d FROM bg UNION ALL SELECT hi, lo FROM bg),
         |deg AS (SELECT s AS id, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY s),
         |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS rank_nano FROM deg),
         |$textrankIters
         |SELECT term, rank_nano, rn FROM (
         |  SELECT id AS term, rank_nano,
         |    CAST(row_number() OVER (ORDER BY rank_nano DESC, id) AS INT) AS rn
         |  FROM r5) WHERE rn <= 10""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").as("toks"))
        .filter(size(col("toks")) >= 2)
      val bigrams = toks.select(explode(transform(
        sequence(lit(1), size(col("toks")) - 1),
        i => struct(
          least(element_at(col("toks"), i), element_at(col("toks"), i + 1)).as("lo"),
          greatest(element_at(col("toks"), i), element_at(col("toks"), i + 1)).as("hi"))))
        .as("b"))
      val edges = bigrams.select(col("b.lo").as("id_a"), col("b.hi").as("id_b"))
        .filter(col("id_a") =!= col("id_b")).distinct()
      val ranks = graft.operators.PageRank.ranks(s, edges, iters = 5)
      // vocabulary-bounded global top-10 (t8's precedent)
      val w = Window.orderBy(col("rank_nano").desc, col("term"))
      ranks.select(col("id").as("term"), col("rank_nano"))
        .withColumn("rn", row_number().over(w).cast("int")).filter(col("rn") <= 10)
    },

    // ---- EV58: recency-decayed customer value (exact dyadic weights) -------
    // The "how valuable is this user NOW" score behind churn targeting:
    // purchase cents decayed with a 7-day half-life. Decay steps at the
    // WEEK grain keep every weight a dyadic rational (2^(4-age_weeks)
    // sixteenths), so per-user scores accumulate as exact BIGINTs — no
    // float exp(), no order-dependence — with ONE final division.
    // Events older than 4 half-lives truncate to weight 0 (documented;
    // keeps the shift non-negative at any corpus span). One partial-agg
    // shuffle on user_id; the anchor day is a broadcast one-row agg.
    QueryDef.sql(
      "ev58_decayed_value",
      """WITH anchor AS (SELECT max(CAST(ts AS DATE)) AS a_day FROM events),
        |p AS (
        |  SELECT user_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    datediff('day', CAST(ts AS DATE), a_day) // 7 AS age_w
        |  FROM events CROSS JOIN anchor WHERE event_type = 'purchase'),
        |u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN age_w > 4 THEN 0
        |      ELSE cents * (CAST(1 AS BIGINT) << (4 - age_w)) END) AS BIGINT)
        |      AS units16,
        |    CAST(count(*) AS BIGINT) AS n_purchases
        |  FROM p GROUP BY 1)
        |SELECT user_id, units16, n_purchases,
        |  CAST((units16 * 25) // 4 AS DOUBLE) / 10000.0 AS decayed_dollars
        |FROM u""".stripMargin) { (s, d) =>
      val anchor = Tables.events(s, d).agg(max(col("ts").cast("date")).as("a_day"))
      val p = Tables.events(s, d).filter(col("event_type") === "purchase")
        .crossJoin(broadcast(anchor))
        .select(col("user_id"),
          floor(col("value") * 100).cast("long").as("cents"),
          expr("datediff(a_day, cast(ts as date)) div 7").as("age_w"))
      p.groupBy(col("user_id"))
        .agg(sum(when(col("age_w") > 4, 0L)
            .otherwise(col("cents") * call_function("shiftleft", lit(1L),
              (lit(4) - col("age_w")).cast("int")))).as("units16"),
          count(lit(1)).as("n_purchases"))
        // dollars truncated to 1e-4: units16/1600 hits exact .xxxx5
        // decimals that doubles can't carry, and round() there splits
        // engines (STATE gotcha) — so scale in INTEGER space
        // (units16·25 div 4 = exact 1e-4-dollar units) and divide once.
        .select(col("user_id"), col("units16"), col("n_purchases"),
          (expr("(units16 * 25) div 4").cast("double") / 10000.0).as("decayed_dollars"))
    },

    // ---- A86: Friedman test with tie correction ----------------------------
    // The repeated-measures cousin of a41: do the 5 event types differ,
    // blocking by DAY (30 blocks)? Within-block ranks stay exact by
    // carrying 2×midrank as an integer (2·minrank + ties − 1), so the
    // rank sums R2_j, their squares, and the tie term Σ(t³−t) are all
    // BIGINTs; χ² = 3·ΣR2²/(nk(k+1)) − 3n(k+1) and its tie-corrected
    // variant are single fixed-order double expressions rounded at the
    // end. Windows partition by DAY (5 rows each) — never global.
    QueryDef.sql(
      "a86_friedman",
      """WITH cell AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type AS trt,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |days AS (SELECT DISTINCT day FROM cell),
        |trts AS (SELECT DISTINCT trt FROM cell),
        |grid AS (
        |  SELECT d.day, t.trt, coalesce(c.x, 0) AS x
        |  FROM days d CROSS JOIN trts t
        |  LEFT JOIN cell c ON c.day = d.day AND c.trt = t.trt),
        |rk AS (
        |  SELECT day, trt, x,
        |    2 * rank() OVER (PARTITION BY day ORDER BY x)
        |      + count(*) OVER (PARTITION BY day, x) - 1 AS mr2
        |  FROM grid),
        |rs AS (SELECT trt, CAST(sum(mr2) AS BIGINT) AS r2 FROM rk GROUP BY 1),
        |ties AS (
        |  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tsum FROM (
        |    SELECT CAST(count(*) AS BIGINT) AS t FROM grid GROUP BY day, x)),
        |dims AS (
        |  SELECT CAST(count(DISTINCT day) AS BIGINT) AS n,
        |    CAST(count(DISTINCT trt) AS BIGINT) AS k FROM grid),
        |s2 AS (SELECT CAST(sum(r2 * r2) AS BIGINT) AS s2 FROM rs)
        |SELECT n AS n_blocks, k AS n_treatments,
        |  round(3.0 * CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
        |      * CAST(k + 1 AS DOUBLE))
        |    - 3.0 * CAST(n AS DOUBLE) * CAST(k + 1 AS DOUBLE), 6) AS chi2,
        |  CASE WHEN CAST(n * k * (k * k - 1) - tsum AS DOUBLE) > 0 THEN
        |    round((3.0 * CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
        |        * CAST(k + 1 AS DOUBLE))
        |      - 3.0 * CAST(n AS DOUBLE) * CAST(k + 1 AS DOUBLE))
        |      / (1.0 - CAST(tsum AS DOUBLE) / CAST(n * k * (k * k - 1) AS DOUBLE)), 6)
        |  ELSE NULL END AS chi2_tie_adj
        |FROM dims CROSS JOIN s2 CROSS JOIN ties""".stripMargin) { (s, d) =>
      val cell = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"), col("event_type").as("trt"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("x"))
      val days = cell.select(col("day")).distinct()
      val trts = cell.select(col("trt")).distinct()
      val grid = days.crossJoin(broadcast(trts))
        .join(cell, Seq("day", "trt"), "left")
        .select(col("day"), col("trt"), coalesce(col("x"), lit(0L)).as("x"))
      val wDay = Window.partitionBy(col("day")).orderBy(col("x"))
      val wTie = Window.partitionBy(col("day"), col("x"))
      val rk = grid.select(col("day"), col("trt"), col("x"),
        (lit(2) * rank().over(wDay) + count(lit(1)).over(wTie) - 1).as("mr2"))
      val rs = rk.groupBy(col("trt")).agg(sum(col("mr2")).as("r2"))
      val s2 = rs.agg(sum(col("r2") * col("r2")).as("s2"))
      val ties = grid.groupBy(col("day"), col("x")).agg(count(lit(1)).as("t"))
        .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
      val dims = grid.agg(countDistinct(col("day")).as("n"),
        countDistinct(col("trt")).as("k"))
      val nD = col("n").cast("double")
      val kD = col("k").cast("double")
      val chi2 = lit(3.0) * col("s2").cast("double") / (nD * kD * (col("k") + 1).cast("double")) -
        lit(3.0) * nD * (col("k") + 1).cast("double")
      val denom = (col("n") * col("k") * (col("k") * col("k") - 1)).cast("double")
      dims.crossJoin(broadcast(s2)).crossJoin(broadcast(ties))
        .select(col("n").as("n_blocks"), col("k").as("n_treatments"),
          round(chi2, 6).as("chi2"),
          when(denom - col("tsum").cast("double") > 0,
            round(chi2 / (lit(1.0) - col("tsum").cast("double") / denom), 6))
            .otherwise(lit(null)).as("chi2_tie_adj"))
    },

    // ---- C34: k-anonymity generalization audit -----------------------------
    // The privacy gate before releasing a quasi-identifier table: each
    // (nation, segment) equivalence class with ≥ k members releases at
    // level 0; smaller classes generalize to (nation, *) and release
    // at level 1 if the rollup reaches k; the residue pools into
    // (*, *). Pure exact-integer class accounting — two partial-agg
    // shuffles over the dimension grain, nothing row-level leaves the
    // scan. k = 5 (a config knob at production scale).
    QueryDef.sql(
      "c34_k_anonymity",
      """WITH cls AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS nation, c_mktsegment AS segment,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM customer GROUP BY 1, 2),
        |lvl0 AS (SELECT nation, segment, n FROM cls WHERE n >= 5),
        |small AS (SELECT nation, segment, n FROM cls WHERE n < 5),
        |roll1 AS (SELECT nation, CAST(sum(n) AS BIGINT) AS n FROM small GROUP BY 1),
        |lvl1 AS (SELECT nation, '*' AS segment, n FROM roll1 WHERE n >= 5),
        |resid AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM roll1 WHERE n < 5)
        |SELECT nation, segment, n, CAST(0 AS INT) AS level FROM lvl0
        |UNION ALL
        |SELECT nation, segment, n, CAST(1 AS INT) FROM lvl1
        |UNION ALL
        |SELECT '*', '*', n, CAST(2 AS INT) FROM resid WHERE n > 0""".stripMargin) { (s, d) =>
      val cls = Tables.customer(s, d)
        .groupBy(col("c_nationkey").cast("string").as("nation"),
          col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"))
      val lvl0 = cls.filter(col("n") >= 5)
        .select(col("nation"), col("segment"), col("n"), lit(0).as("level"))
      val roll1 = cls.filter(col("n") < 5)
        .groupBy(col("nation")).agg(sum(col("n")).as("n"))
      val lvl1 = roll1.filter(col("n") >= 5)
        .select(col("nation"), lit("*").as("segment"), col("n"), lit(1).as("level"))
      val resid = roll1.filter(col("n") < 5).agg(sum(col("n")).as("n"))
        .filter(col("n") > 0)
        .select(lit("*").as("nation"), lit("*").as("segment"), col("n"),
          lit(2).as("level"))
      lvl0.unionByName(lvl1).unionByName(resid)
    },

    // ---- V25: cosine-similarity histogram (embedding-space diagnostic) -----
    // Is the embedding space collapsing? The distribution of pairwise
    // cosines over a DETERMINISTIC stride sample — each vector paired
    // with (id + 997) mod N — gives O(N) coverage with zero RNG and
    // zero all-pairs blowup (997 is prime, so the stride is a single
    // N-cycle: every vector appears exactly once on each side). Strict
    // left-fold cosines (the v2 discipline) land in decile bins by
    // floor — bin edges, counts, and bounds all hash-check.
    QueryDef.sql(
      "v25_cosine_histogram",
      """WITH mx AS (SELECT CAST(max(vec_id) + 1 AS BIGINT) AS m FROM embeddings),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))),
        |    (a, b) -> a + b)) AS nrm
        |  FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS ida, b.vec_id AS idb,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(a.emb) + 1), i -> a.emb[i] * b.emb[i])),
        |      (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
        |  FROM e a CROSS JOIN mx JOIN e b ON b.vec_id = (a.vec_id + 997) % m),
        |binned AS (SELECT CAST(floor(cosine * 10) AS INT) AS bin FROM pairs)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs
        |FROM binned GROUP BY 1""".stripMargin) { (s, d) =>
      val raw = Tables.embeddings(s, d)
      val mx = raw.agg((max(col("vec_id")) + 1).cast("long").as("m"))
      val e = raw.select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("emb"))
        .withColumn("nrm", VectorOps.l2Norm(col("emb")))
      val b = e.select(col("vec_id").as("idb"), col("emb").as("b_emb"),
        col("nrm").as("b_nrm"))
      val pairs = e.crossJoin(broadcast(mx))
        .join(b, col("idb") === (col("vec_id") + 997) % col("m"))
        .select(VectorOps.cosinePre(col("emb"), col("b_emb"), col("nrm"), col("b_nrm"))
          .as("cosine"))
      pairs.select(floor(col("cosine") * 10).cast("int").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n_pairs"))
    }
  )
}
