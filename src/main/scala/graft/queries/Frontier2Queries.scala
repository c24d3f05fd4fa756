package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Second frontier batch: drift/changepoint detection (CUSUM telescoped
  * to window algebra), Pareto skyline via domain-bounded prefix minima,
  * RAKE keyword extraction, deterministic class-balance oversampling,
  * and embedding-distribution drift — each bit-exact vs a DuckDB twin.
  */
object Frontier2Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A31: CUSUM drift detection over the daily revenue series --------
    // The page-Hinkley/CUSUM recurrence S_t = max(0, S_{t-1} + (x_t -
    // ref)) is iterative — but it telescopes EXACTLY to S_t = P_t -
    // min(0, min_{j<=t} P_j) where P is the prefix sum of centered
    // residuals. With residuals in integer units (c_t = n·x_t - S, the
    // a26 trick), both the prefix sum and the running min are exact
    // BIGINT window aggregates over the calendar-bounded day grain, and
    // the dollar readout is ONE division of exact integers. Top-5 drift
    // days by (drift desc, day) — integer ordering, no float rank.
    QueryDef.sql(
      "a31_cusum_drift",
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s_tot FROM daily),
        |c AS (SELECT day, n * x - s_tot AS c, n FROM daily CROSS JOIN st),
        |p AS (
        |  SELECT day, n,
        |    CAST(sum(c) OVER (ORDER BY day) AS BIGINT) AS pfx
        |  FROM c),
        |cu AS (
        |  SELECT day, n, pfx,
        |    CAST(least(CAST(0 AS BIGINT), min(pfx) OVER (ORDER BY day)) AS BIGINT) AS floor_p
        |  FROM p),
        |r AS (
        |  SELECT day, pfx - floor_p AS cusum, n,
        |    row_number() OVER (ORDER BY pfx - floor_p DESC, day) AS rk
        |  FROM cu)
        |SELECT day, CAST(rk AS INTEGER) AS rk,
        |  CAST(cusum AS DOUBLE) / CAST(n * 10000 AS DOUBLE) AS drift_dollars
        |FROM r WHERE rk <= 5""".stripMargin) { (s, d) =>
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 4)) * lit(10000))
          .cast("long")).as("x"))
      val st = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s_tot"))
      // day-grain series: the unpartitioned windows below run over a
      // calendar-bounded row count (one row per day), independent of
      // fact cardinality — the same bounded-grain argument as ev26/a27.
      // (At a scale where even days overflow one task, the c4/c7
      // shard-offset prefix sum applies unchanged.)
      val wOrd = Window.orderBy(col("day"))
      val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = daily.crossJoin(broadcast(st))
        .select(col("day"), (col("n") * col("x") - col("s_tot")).as("c"), col("n"))
      val p = c.withColumn("pfx", sum(col("c")).over(wCum))
      val cu = p.withColumn("floor_p", least(lit(0L), min(col("pfx")).over(wCum)))
      val r = cu.select(col("day"), (col("pfx") - col("floor_p")).as("cusum"), col("n"))
        .withColumn("rk", row_number().over(Window.orderBy(col("cusum").desc, col("day"))))
      r.filter(col("rk") <= 5)
        .select(col("day"), col("rk").cast("int").as("rk"),
          (col("cusum").cast("double") / (col("n") * lit(10000)).cast("double"))
            .as("drift_dollars"))
    },

    // ---- A32: Pareto skyline (non-dominated parts) ------------------------
    // Multi-objective filter: parts where no other part is <= on BOTH
    // (size, price) and < on at least one. The naive plan is an O(n²)
    // NOT EXISTS self-join (the oracle); the scalable plan exploits the
    // BOUNDED size domain: one partial-agg shuffle builds min-price per
    // size, a tiny window over the ~50-row size table yields the
    // strictly-smaller-size prefix minimum, and the skyline test is a
    // broadcast join + filter on the fact scan. p is non-dominated iff
    // price == minPrice(size' <= size) and minPrice(size' < size) >
    // price (ties at the same (size, price) all survive — neither
    // strictly dominates the other).
    QueryDef.sql(
      "a32_pareto_front",
      """SELECT p.p_partkey, p.p_size, p.p_retailprice
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_size <= p.p_size AND q.p_retailprice <= p.p_retailprice
        |    AND (q.p_size < p.p_size OR q.p_retailprice < p.p_retailprice))""".stripMargin) { (s, d) =>
      val parts = Tables.part(s, d)
        .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      val m = parts.groupBy(col("p_size").as("sz"))
        .agg(min(col("p_retailprice")).as("min_at"))
      val wLe = Window.orderBy(col("sz")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wLt = Window.orderBy(col("sz")).rowsBetween(Window.unboundedPreceding, -1)
      val pref = m
        .withColumn("min_le", min(col("min_at")).over(wLe))
        .withColumn("min_lt", min(col("min_at")).over(wLt))
      parts.join(broadcast(pref), col("p_size") === col("sz"))
        .filter(col("p_retailprice") === col("min_le") &&
          (col("min_lt").isNull || col("min_lt") > col("p_retailprice")))
        .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
    },

    // ---- T31: RAKE keyword extraction -------------------------------------
    // Rapid Automatic Keyword Extraction: candidate phrases are maximal
    // token runs between stopwords; word score = degree/frequency where
    // degree sums the lengths of every phrase the word occurs in. All
    // counts are integers off ONE explode pipeline (phrase split →
    // word explode → two partial aggs); the score is one exact-integer
    // division, and the top-20 ranking orders by that deterministic
    // double with a word tie-break.
    QueryDef.sql(
      "t31_rake_keywords",
      """WITH ph AS (
        |  SELECT doc_id, trim(p) AS phrase
        |  FROM (SELECT doc_id,
        |          unnest(string_split(regexp_replace(lower(text),
        |            '\b(the|a|of|and|to|in|is)\b', '|', 'g'), '|')) AS p
        |        FROM documents)
        |  WHERE trim(p) <> ''),
        |w AS (
        |  SELECT regexp_extract_all(phrase, '\S+') AS words,
        |    CAST(len(regexp_extract_all(phrase, '\S+')) AS BIGINT) AS plen
        |  FROM ph),
        |x AS (SELECT unnest(words) AS word, plen FROM w),
        |sc AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS freq,
        |    CAST(sum(plen) AS BIGINT) AS degree
        |  FROM x GROUP BY word),
        |r AS (
        |  SELECT word, freq, degree,
        |    CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE) AS score,
        |    row_number() OVER (ORDER BY CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE) DESC, word) AS rk
        |  FROM sc WHERE freq >= 5)
        |SELECT word, freq, degree, score, CAST(rk AS INTEGER) AS rk
        |FROM r WHERE rk <= 20""".stripMargin) { (s, d) =>
      val ph = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(regexp_replace(lower(col("text")),
            "\\b(the|a|of|and|to|in|is)\\b", "|"), "\\|")).as("p"))
        .select(col("doc_id"), trim(col("p")).as("phrase"))
        .filter(col("phrase") =!= "")
      val words = regexp_extract_all(col("phrase"), lit("\\S+"), lit(0))
      val x = ph.select(words.as("words"), size(words).cast("long").as("plen"))
        .select(explode(col("words")).as("word"), col("plen"))
      val sc = x.groupBy(col("word"))
        .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
        .filter(col("freq") >= 5)
        .withColumn("score", col("degree").cast("double") / col("freq").cast("double"))
      // top-20 global rank: 20 rows survive per map task (WindowGroupLimit)
      sc.withColumn("rk", row_number().over(Window.orderBy(col("score").desc, col("word"))))
        .filter(col("rk") <= 20)
        .select(col("word"), col("freq"), col("degree"), col("score"),
          col("rk").cast("int").as("rk"))
    },

    // ---- C16: deterministic class-balance oversampling --------------------
    // Minority-class replication to the majority count: each doc of
    // class L replicated floor(maxN / n_L) times — deterministic
    // integer replication via sequence-explode, never a random sampler,
    // so the rebalanced corpus is reproducible run-to-run (the property
    // a training pipeline needs for resumable epochs). Output is the
    // per-class audit: original count, replication factor, rebalanced
    // count, and the exact id-sum checksum of the replicated set.
    QueryDef.sql(
      "c16_class_balance",
      """WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_orig,
        |    CAST(sum(doc_id) AS BIGINT) AS id_sum
        |  FROM documents GROUP BY lang),
        |mx AS (SELECT max(n_orig) AS max_n FROM n)
        |SELECT lang, n_orig,
        |  CAST(max_n // n_orig AS BIGINT) AS rep_factor,
        |  CAST(n_orig * (max_n // n_orig) AS BIGINT) AS n_after,
        |  CAST(id_sum * (max_n // n_orig) AS BIGINT) AS id_checksum
        |FROM n CROSS JOIN mx""".stripMargin) { (s, d) =>
      val n = Tables.documents(s, d).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_orig"), sum(col("doc_id")).as("id_sum"))
      val mx = n.agg(max(col("n_orig")).as("max_n"))
      // the replicated corpus itself (sequence-explode); the registered
      // result audits it exactly via counts + id checksum so the oracle
      // can hash-check without shipping the blown-up corpus
      val rep = n.crossJoin(broadcast(mx))
        .withColumn("rep_factor", expr("max_n div n_orig"))
      rep.select(col("lang"), col("n_orig"), col("rep_factor"),
        (col("n_orig") * col("rep_factor")).as("n_after"),
        (col("id_sum") * col("rep_factor")).as("id_checksum"))
    },

    // ---- V15: embedding-distribution drift monitor ------------------------
    // Per label, split the corpus into two halves (vec_id parity) and
    // report the squared L2 distance between half centroids — the
    // production drift alarm between yesterday's and today's embedding
    // batches. Components quantize to integer 1e-9 units via
    // floor(v·1e9) — a pure IEEE product + floor, bit-identical in both
    // engines (a double→DECIMAL cast is NOT: the engines disagree on
    // the half-point at the 9th decimal — seen live at sf0.1) — so
    // per-(label, half, dim) sums are exact BIGINTs; each per-dim mean
    // is double division of exact operands; the over-dims square-sum
    // folds in dim order on both engines. Shape: one explode
    // (posexplode of the vector) + one partial-agg shuffle on (label,
    // dim) with the two halves as conditional aggregates — no second
    // corpus scan, no collect.
    QueryDef.sql(
      "v15_embedding_drift",
      """WITH comp AS (
        |  SELECT label, vec_id % 2 AS half, d.i AS dim,
        |    CAST(floor(CAST(d.v AS DOUBLE) * 1000000000) AS BIGINT) AS q
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(range(1, len(embedding)+1)) AS i,
        |             unnest(embedding) AS v) d),
        |sums AS (
        |  SELECT label, dim,
        |    CAST(sum(q) FILTER (WHERE half = 0) AS BIGINT) AS s0,
        |    CAST(count(*) FILTER (WHERE half = 0) AS BIGINT) AS n0,
        |    CAST(sum(q) FILTER (WHERE half = 1) AS BIGINT) AS s1,
        |    CAST(count(*) FILTER (WHERE half = 1) AS BIGINT) AS n1
        |  FROM comp GROUP BY 1, 2),
        |terms AS (
        |  SELECT label, dim, n0, n1,
        |    (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / 1000000000 AS diff
        |  FROM sums),
        |folded AS (
        |  SELECT label, max(n0) AS n_even, max(n1) AS n_odd,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(diff * diff ORDER BY dim)), (a, b) -> a + b) AS drift_sq
        |  FROM terms GROUP BY label)
        |SELECT label, n_even, n_odd, drift_sq FROM folded""".stripMargin) { (s, d) =>
      val comp = Tables.embeddings(s, d)
        .select(col("label"), (col("vec_id") % 2).as("half"),
          posexplode(col("embedding")).as(Seq("dim0", "v")))
        .select(col("label"), col("half"), (col("dim0") + 1).as("dim"),
          floor(col("v").cast("double") * lit(1000000000L)).as("q"))
      val sums = comp.groupBy(col("label"), col("dim"))
        .agg(
          sum(when(col("half") === 0, col("q"))).as("s0"),
          count(when(col("half") === 0, 1)).as("n0"),
          sum(when(col("half") === 1, col("q"))).as("s1"),
          count(when(col("half") === 1, 1)).as("n1"))
      val terms = sums.select(col("label"), col("dim"), col("n0"), col("n1"),
        ((col("s0").cast("double") / col("n0").cast("double")
          - col("s1").cast("double") / col("n1").cast("double")) / lit(1000000000))
          .as("diff"))
      terms.groupBy(col("label"))
        .agg(max(col("n0")).as("n_even"), max(col("n1")).as("n_odd"),
          aggregate(
            transform(sort_array(collect_list(struct(col("dim"), col("diff")))),
              x => x.getField("diff")),
            lit(0.0), (acc, t) => acc + t * t).as("drift_sq"))
    }
  )
}
