package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus-curation operators a large-scale training-data pipeline
  * needs beyond dedup/mixing: deterministic train/val/test splitting,
  * deterministic global shuffle, token-window chunking, PII scrubbing,
  * and lexical-diversity profiling. All hash-based determinism uses
  * md5 (cross-engine: identical hex in Spark and DuckDB), never
  * rand() — every op is reproducible on any cluster layout and
  * restartable mid-job.
  */
object CurationQueries {

  /** DuckDB rendering of `TextFunctions.qualityLogit` — the pinned op
    * order is load-bearing for bit-exactness, so it lives in ONE place
    * and is interpolated into every oracle that scores documents
    * (t12, t19, t20).
    */
  private[queries] val QualityF: String =
    """f AS (
      |  SELECT doc_id, source, lang,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS nt,
      |    CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |      / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS atl,
      |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE)
      |      / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS sw
      |  FROM documents)""".stripMargin

  private[queries] val QualityZ: String = "-1.5 + 0.02 * nt + 0.8 * sw - 0.1 * atl"

  val defs: Seq[QueryDef] = Seq(

    // ---- deterministic train/val/test split ----------------------------
    // Split assignment by a KEYED hash (doc_id + source), not by
    // position or rand(): a document keeps its split when the corpus is
    // re-sharded, re-ordered, or incrementally extended — the property
    // training pipelines need so eval sets never bleed into train
    // between runs. Thresholds compare the first two md5 hex chars
    // (256 uniform buckets): < 'cc' (204) ≈ 80% train, < 'e6' (230)
    // ≈ 10% val, rest test. Pure scan-stage projection — no shuffle.
    QueryDef.sql(
      "c6_split_assign",
      """SELECT doc_id, source,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 2) < 'cc' THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 2) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin) { (s, d) =>
      val h = substring(md5(concat(col("doc_id").cast("string"), lit(":"), col("source"))), 1, 2)
      Tables.documents(s, d).select(
        col("doc_id"), col("source"),
        when(h < "cc", "train").when(h < "e6", "val").otherwise("test").as("split"))
    },

    // ---- deterministic global shuffle (training-order permutation) ------
    // Assign every document its position in a pseudo-random but fully
    // reproducible global order (ORDER BY md5(doc_id)). Scale shape:
    // the global row_number is TWO-PHASE — a per-shard row_number over
    // 256 md5-prefix shards (parallel windows; the shard is a prefix of
    // the sort key, so shard-major order IS the global order) plus a
    // 256-row shard-offset table joined back by broadcast. No
    // single-partition window ever runs; same trick as c4's prefix sum.
    QueryDef.sql(
      "c7_shuffle_order",
      """SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |    AS shuffle_pos
        |FROM documents""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val t = Tables.documents(s, d).select(
          col("doc_id"), md5(col("doc_id").cast("string")).as("k"))
        .withColumn("shard", substring(col("k"), 1, 2))
      val wLocal = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
      val local = t.withColumn("lrn", row_number().over(wLocal).cast("long"))
      val wShard = Window.orderBy(col("shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = t.groupBy(col("shard")).agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum(col("cnt")).over(wShard), lit(0L)))
        .select(col("shard"), col("off"))
      local.join(broadcast(offsets), "shard")
        .select(col("doc_id"), (col("off") + col("lrn")).as("shuffle_pos"))
    },

    // ---- token-window chunking (context-length preprocessing) -----------
    // Split each document into 32-token windows with stride 24 (8-token
    // overlap) — the standard fixed-context chunking step before
    // tokenized training or embedding indexing. One posexplode over a
    // per-row computed start list; everything else is per-row slice
    // algebra in the scan stage. Output grows ~n_tokens/stride per doc,
    // never quadratic.
    QueryDef.sql(
      "c8_chunk_documents",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents),
        |st AS (
        |  SELECT doc_id, t, unnest(range(1, len(t)+1, 24)) AS s
        |  FROM toks WHERE len(t) >= 1)
        |SELECT doc_id,
        |  CAST((s - 1) // 24 AS INT) AS chunk_id,
        |  CAST(len(t[s:s+31]) AS INT) AS n_chunk_tokens,
        |  array_to_string(t[s:s+31], ' ') AS chunk_text
        |FROM st""".stripMargin) { (s, d) =>
      val window = 32
      val stride = 24
      val staged = Tables.documents(s, d)
        .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 1)
      staged
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(1), size(col("t")), lit(stride))).as("s"))
        .select(
          col("doc_id"),
          ((col("s") - 1) / stride).cast("int").as("chunk_id"),
          size(slice(col("t"), col("s"), lit(window))).cast("int").as("n_chunk_tokens"),
          array_join(slice(col("t"), col("s"), lit(window)), " ").as("chunk_text"))
    },

    // ---- PII scrub (redaction before training) ---------------------------
    // Regex redaction over semi-structured event payloads: emails and
    // digit runs are replaced with typed placeholders, and per-row match
    // counts are kept for audit. Patterns stay in the RE2 ∩ Java-regex
    // common subset so Spark and DuckDB agree byte-for-byte. Pure
    // scan-stage string algebra — no shuffle, fully codegen'd.
    QueryDef.sql(
      "t10_pii_scrub",
      """SELECT event_id,
        |  regexp_replace(
        |    regexp_replace(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]+', '<NUM>', 'g') AS props_redacted,
        |  CAST(len(regexp_extract_all(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_num_runs
        |FROM events""".stripMargin) { (s, d) =>
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      Tables.events(s, d).select(
        col("event_id"),
        regexp_replace(regexp_replace(col("props"), email, "<EMAIL>"),
          "[0-9]+", "<NUM>").as("props_redacted"),
        size(expr(s"regexp_extract_all(props, '$email', 0)")).cast("int").as("n_emails"),
        size(expr("regexp_extract_all(props, '[0-9]+', 0)")).cast("int").as("n_num_runs"))
    },

    // ---- quality-model inference (logistic classifier, zero UDF) --------
    // The learned-filter step of a curation pipeline (CCNet/fastText
    // style): score = sigmoid(w·x + b) over per-document features,
    // expressed entirely as codegen'd Column algebra — model weights
    // are literals in the plan, so classifier inference runs inside
    // whole-stage codegen over the scan at 100 TB with no UDF, no
    // Python, no model server. z is bit-exact cross-engine (fixed op
    // order); exp() may differ by 1 ulp between libm and Math.exp, so
    // the score is rounded to 6 decimals (same discipline as t9's ln).
    QueryDef.sql(
      "t12_quality_model",
      s"""WITH $QualityF,
         |z AS (
         |  SELECT doc_id, $QualityZ AS z FROM f)
         |SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 6) AS quality_score,
         |  (1.0 / (1.0 + exp(-z)) >= 0.5) AS keep
         |FROM z""".stripMargin) { (s, d) =>
      val score = lit(1.0) / (lit(1.0) +
        exp(-graft.functions.TextFunctions.qualityLogit(col("text"))))
      Tables.documents(s, d).select(
        col("doc_id"),
        round(score, 6).as("quality_score"),
        (score >= 0.5).as("keep"))
    },

    // ---- model evaluation: grouped ROC-AUC (midrank Mann–Whitney) -------
    // Evaluates the t12 quality classifier against a pseudo-label
    // (lang = 'en') per source — the distributed model-eval step after
    // any learned-filter training. Exact midrank AUC: rank rows within
    // each source by the ROUNDED score (the t9/t14 discipline — both
    // engines order ties identically), replace ties with their average
    // rank (a per-(source, score) window), then
    // AUC = (Σ midrank⁺ − np(np+1)/2) / (np·nn). Midranks are exact
    // halves, so their double sum is order-independent — deterministic
    // under any partitioning. All windows are PARTITIONED by source
    // (never global); at 100 TB each group ranks independently.
    QueryDef.sql(
      "t19_auc_by_source",
      s"""WITH $QualityF,
        |sc AS (
        |  SELECT doc_id, source, (lang = 'en') AS pos,
        |    round(1.0 / (1.0 + exp(-($QualityZ))), 6) AS score
        |  FROM f),
        |rn AS (
        |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS rn
        |  FROM sc),
        |mid AS (
        |  SELECT *, avg(CAST(rn AS DOUBLE)) OVER (PARTITION BY source, score) AS midrank
        |  FROM rn),
        |agg AS (
        |  SELECT source,
        |    CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS np,
        |    CAST(count(*) FILTER (WHERE NOT pos) AS BIGINT) AS nn,
        |    sum(CASE WHEN pos THEN midrank ELSE 0.0 END) AS srp
        |  FROM mid GROUP BY source)
        |SELECT source, np, nn,
        |  round((srp - CAST(np AS DOUBLE) * (CAST(np AS DOUBLE) + 1) / 2)
        |    / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS auc
        |FROM agg WHERE np > 0 AND nn > 0""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val sc = Tables.documents(s, d).select(
        col("doc_id"), col("source"), (col("lang") === "en").as("pos"),
        graft.functions.TextFunctions.qualityScore6(col("text")).as("score"))
      val wRank = Window.partitionBy(col("source")).orderBy(col("score"), col("doc_id"))
      val wTies = Window.partitionBy(col("source"), col("score"))
      val mid = sc.withColumn("rn", row_number().over(wRank))
        .withColumn("midrank", avg(col("rn").cast("double")).over(wTies))
      val np = col("np").cast("double")
      mid.groupBy("source")
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
          sum(when(col("pos"), 0L).otherwise(1L)).as("nn"),
          sum(when(col("pos"), col("midrank")).otherwise(lit(0.0))).as("srp"))
        .filter(col("np") > 0 && col("nn") > 0)
        .select(col("source"), col("np"), col("nn"),
          round((col("srp") - np * (np + 1) / 2) / (np * col("nn").cast("double")), 6)
            .as("auc"))
    },

    // ---- model evaluation: calibration bins (reliability diagram) -------
    // The companion diagnostic to t19: decile-binned predicted score vs
    // observed positive rate. Bin ids are integer math off the ROUNDED
    // score; the mean score per bin sums exactly in DECIMAL(18,6)
    // (scores are 6-dp by construction). One partial-agg shuffle over
    // ≤ 10 bins.
    QueryDef.sql(
      "t20_calibration",
      s"""WITH $QualityF,
        |sc AS (
        |  SELECT doc_id, (lang = 'en') AS pos,
        |    round(1.0 / (1.0 + exp(-($QualityZ))), 6) AS score
        |  FROM f)
        |SELECT CAST(least(floor(score * 10), 9) AS INT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS mean_score,
        |  CAST(count(*) FILTER (WHERE pos) AS DOUBLE) / count(*) AS frac_pos
        |FROM sc GROUP BY bin""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val sc = Tables.documents(s, d).select(
        (col("lang") === "en").as("pos"),
        graft.functions.TextFunctions.qualityScore6(col("text")).as("score"))
      sc.groupBy(least(floor(col("score") * 10), lit(9)).cast("int").as("bin"))
        .agg(count(lit(1)).as("n"),
          (sum(col("score").cast(DecimalType(18, 6))).cast("double") / count(lit(1)))
            .as("mean_score"),
          (sum(when(col("pos"), 1L).otherwise(0L)).cast("double") / count(lit(1)))
            .as("frac_pos"))
    },

    // ---- unigram LM scoring (pseudo-perplexity quality filter) ----------
    // The LM-based curation signal: score each document by its average
    // token log-probability under a unigram model estimated from the
    // corpus itself, and report pseudo-perplexity exp(-avg_logp).
    // Two-pass shape: corpus term frequencies (one partial-agg
    // shuffle) become a per-term logp table joined back by BROADCAST —
    // a unigram vocabulary fits executor memory even for web-scale
    // corpora (fall back to a shuffle join only past that). Numerics:
    // per-term logp rounds to 8 decimals (ln is the one 1-ulp risk),
    // the per-doc sum folds over SORTED values (v4's trick — exact
    // under any partitioning), and ppl rounds to 6 to absorb exp's ulp.
    QueryDef.sql(
      "t13_unigram_logprob",
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents),
        |cf AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY term),
        |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM cf),
        |lp AS (SELECT term, round(ln(CAST(c AS DOUBLE) / total), 8) AS logp
        |       FROM cf CROSS JOIN tot),
        |dt AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok
        |       GROUP BY doc_id, term),
        |ds AS (
        |  SELECT d.doc_id,
        |    CAST(sum(d.tf) AS BIGINT) AS n_tokens,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_sort(list(CAST(d.tf AS DOUBLE) * l.logp))), (a,b) -> a+b) AS sum_logp
        |  FROM dt d JOIN lp l USING (term) GROUP BY d.doc_id)
        |SELECT doc_id, n_tokens,
        |  sum_logp / CAST(n_tokens AS DOUBLE) AS avg_logp,
        |  round(exp(-(sum_logp / CAST(n_tokens AS DOUBLE))), 6) AS ppl
        |FROM ds""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      val cf = tok.groupBy("term").agg(count(lit(1)).as("c"))
      val tot = cf.agg(sum(col("c")).cast("double").as("total"))
      val lp = cf.crossJoin(broadcast(tot))
        .select(col("term"), round(log(col("c").cast("double") / col("total")), 8).as("logp"))
      val dt = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val avg = col("sum_logp") / col("n_tokens").cast("double")
      dt.join(broadcast(lp), "term")
        .groupBy("doc_id")
        .agg(
          sum(col("tf")).as("n_tokens"),
          aggregate(sort_array(collect_list(col("tf").cast("double") * col("logp"))),
            lit(0.0), (a, v) => a + v).as("sum_logp"))
        .select(col("doc_id"), col("n_tokens"),
          avg.as("avg_logp"),
          round(exp(-avg), 6).as("ppl"))
    },

    // ---- bigram LM scoring (conditional-logprob quality filter) ----------
    // t13's order-sensitive sibling: score each document by its average
    // add-one-smoothed bigram log-probability ln((C(a,b)+1)/(C(a)+V))
    // under a model estimated from the corpus itself — the signal that
    // separates fluent text from bag-of-words scramble, which unigram
    // ppl cannot. Scale shape: bigram counts are ONE partial-agg
    // shuffle (the Generate is linear — 1 bigram per token), context
    // counts reuse them, and the per-doc score join keys on the bigram
    // pair; unlike t13's broadcast-able unigram vocab this stays a
    // shuffle join by design (a web corpus' bigram table does not fit
    // an executor). Numerics: counts are integers (exact), each ln
    // rounds to 8, the per-doc sum folds over SORTED values (order-
    // independent under any partitioning), ppl rounds to 6.
    QueryDef.sql(
      "t23_bigram_logprob",
      """WITH tok AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i] AS a, t[i+1] AS b
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |        FROM tok WHERE len(t) >= 2)),
        |cb AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY a, b),
        |ca AS (SELECT a, CAST(sum(c) AS BIGINT) AS ctx FROM cb GROUP BY a),
        |vv AS (SELECT CAST(count(DISTINCT x.term) AS BIGINT) AS v
        |       FROM (SELECT unnest(t) AS term FROM tok) x),
        |lp AS (
        |  SELECT cb.a, cb.b,
        |    round(ln(CAST(cb.c + 1 AS DOUBLE) / CAST(ca.ctx + vv.v AS DOUBLE)), 8)
        |      AS logp
        |  FROM cb JOIN ca USING (a) CROSS JOIN vv),
        |dt AS (SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS tf
        |       FROM bg GROUP BY doc_id, a, b),
        |ds AS (
        |  SELECT d.doc_id,
        |    CAST(sum(d.tf) AS BIGINT) AS n_bigrams,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_sort(list(CAST(d.tf AS DOUBLE) * l.logp))), (x,y) -> x+y)
        |      AS sum_logp
        |  FROM dt d JOIN lp l ON d.a = l.a AND d.b = l.b GROUP BY d.doc_id)
        |SELECT doc_id, n_bigrams,
        |  sum_logp / CAST(n_bigrams AS DOUBLE) AS avg_logp,
        |  round(exp(-(sum_logp / CAST(n_bigrams AS DOUBLE))), 6) AS ppl
        |FROM ds""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), graft.functions.TextFunctions.tokens(col("text")).as("t"))
      val bg = tok.filter(size(col("t")) >= 2)
        .select(col("doc_id"), col("t"), explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
        .select(col("doc_id"), element_at(col("t"), col("i")).as("a"),
          element_at(col("t"), col("i") + 1).as("b"))
      val cb = bg.groupBy("a", "b").agg(count(lit(1)).as("c"))
      val ca = cb.groupBy("a").agg(sum(col("c")).as("ctx"))
      val vv = tok.select(explode(col("t")).as("term"))
        .agg(countDistinct(col("term")).as("v"))
      val lp = cb.join(ca, "a").crossJoin(broadcast(vv))
        .select(col("a"), col("b"),
          round(log((col("c") + lit(1L)).cast("double") /
            (col("ctx") + col("v")).cast("double")), 8).as("logp"))
      val dt = bg.groupBy("doc_id", "a", "b").agg(count(lit(1)).as("tf"))
      val avg = col("sum_logp") / col("n_bigrams").cast("double")
      dt.join(lp, Seq("a", "b"))
        .groupBy("doc_id")
        .agg(
          sum(col("tf")).as("n_bigrams"),
          aggregate(sort_array(collect_list(col("tf").cast("double") * col("logp"))),
            lit(0.0), (x, y) => x + y).as("sum_logp"))
        .select(col("doc_id"), col("n_bigrams"),
          avg.as("avg_logp"),
          round(exp(-avg), 6).as("ppl"))
    },

    // ---- lexical diversity (type-token ratio + hapax count) --------------
    // Quality signal complementing t2/t7: vocabulary richness per
    // document. Shaped for scale: one explode → one (doc_id, term)
    // partial-aggregated shuffle → one doc_id aggregate, instead of the
    // per-row O(n_tokens²) nested-loop a naive array formulation costs.
    QueryDef.sql(
      "t11_lexical_diversity",
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_types,
        |  CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
        |  CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS ttr
        |FROM tf GROUP BY doc_id""".stripMargin) { (s, d) =>
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      tf.groupBy("doc_id").agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        (count(lit(1)).cast("double") / sum(col("c")).cast("double")).as("ttr"))
    },

    // ---- length-bucketed batch planning (padding-efficiency audit) -------
    // Batching step for fixed-shape training kernels: docs are bucketed
    // to the next power-of-two token length, each 4096-token batch holds
    // floor(4096/bucket) docs, and the padding fraction quantifies wasted
    // compute per bucket. The bucket ladder is integer CASE algebra (no
    // log2 — float-free, so both engines agree exactly); everything
    // downstream is integer math off ONE partial-aggregated groupBy.
    QueryDef.sql(
      "c9_length_buckets",
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_tokens,
        |    CASE WHEN n_tokens <= 32 THEN 32
        |         WHEN n_tokens <= 64 THEN 64
        |         WHEN n_tokens <= 128 THEN 128
        |         WHEN n_tokens <= 256 THEN 256
        |         ELSE 512 END AS bucket
        |  FROM t),
        |g AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens
        |  FROM b GROUP BY bucket)
        |SELECT CAST(bucket AS INT) AS bucket, n_docs,
        |  CAST(4096 // bucket AS BIGINT) AS docs_per_batch,
        |  CAST((n_docs + (4096 // bucket) - 1) // (4096 // bucket) AS BIGINT) AS n_batches,
        |  total_tokens,
        |  round(1.0 - CAST(total_tokens AS DOUBLE)
        |        / (CAST((n_docs + (4096 // bucket) - 1) // (4096 // bucket) AS DOUBLE) * 4096.0), 6)
        |    AS pad_frac
        |FROM g""".stripMargin) { (s, d) =>
      val cap = 4096L
      val t = Tables.documents(s, d).select(col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens"))
      val bucket = when(col("n_tokens") <= 32, 32L)
        .when(col("n_tokens") <= 64, 64L)
        .when(col("n_tokens") <= 128, 128L)
        .when(col("n_tokens") <= 256, 256L)
        .otherwise(512L)
      val g = t.withColumn("bucket", bucket)
        .groupBy("bucket").agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
      val dpb = expr(s"$cap DIV bucket")
      val nBatches = expr(s"(n_docs + ($cap DIV bucket) - 1) DIV ($cap DIV bucket)")
      g.select(
        col("bucket").cast("int").as("bucket"), col("n_docs"),
        dpb.as("docs_per_batch"),
        nBatches.as("n_batches"),
        col("total_tokens"),
        round(lit(1.0) - col("total_tokens").cast("double") /
          (nBatches.cast("double") * lit(4096.0)), 6).as("pad_frac"))
    },

    // ---- Z-order (Morton) clustering key --------------------------------
    // Data-LAYOUT operator: functions.ZOrder interleaves two join/filter
    // keys into one clustering value; writing the table
    // repartitionByRange(zval) + sortWithinPartitions makes parquet
    // min/max stats prune box predicates on EITHER key (ZOrderSpec
    // measures the skipping on real files; Delta/Iceberg Z-ORDER, as a
    // plain Column tree). The oracle recomputes the interleave with the
    // same mask-and-shift doublings — pure integer bitwise arithmetic,
    // bit-identical cross-engine. Scan-stage projection, zero shuffle.
    QueryDef.sql(
      "c11_zorder_key",
      """WITH t0 AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    l_partkey & 2147483647 AS x, l_suppkey & 2147483647 AS y
        |  FROM lineitem),
        |t1 AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  (x | (x << 16)) & 281470681808895 AS x,
        |  (y | (y << 16)) & 281470681808895 AS y FROM t0),
        |t2 AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  (x | (x << 8)) & 71777214294589695 AS x,
        |  (y | (y << 8)) & 71777214294589695 AS y FROM t1),
        |t3 AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  (x | (x << 4)) & 1085102592571150095 AS x,
        |  (y | (y << 4)) & 1085102592571150095 AS y FROM t2),
        |t4 AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  (x | (x << 2)) & 3689348814741910323 AS x,
        |  (y | (y << 2)) & 3689348814741910323 AS y FROM t3),
        |t5 AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  (x | (x << 1)) & 6148914691236517205 AS x,
        |  (y | (y << 1)) & 6148914691236517205 AS y FROM t4)
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  x | (y << 1) AS zval
        |FROM t5""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        graft.functions.ZOrder.interleave(col("l_partkey"), col("l_suppkey"))
          .as("zval"))
    },

    // ---- proportional quota sampling (largest-remainder allocation) -----
    // Draw a fixed budget of N=200 documents allocated across sources
    // in exact proportion to their sizes via the Hamilton /
    // largest-remainder method: base_s = (N·c_s) div T seats, the
    // N − Σbase leftovers go to the largest remainders (ties broken by
    // source name), and each source contributes its alloc_s
    // smallest-md5 documents — fully deterministic, no RNG. All
    // allocation arithmetic is integer (no float shares to drift).
    // Scale shape: the allocation table is |sources| rows (tiny,
    // broadcast); the per-source pick is a row_number window
    // partitioned by source — bounded per source, and a skewed source
    // falls back to c7's shard-offset rank with the algebra unchanged.
    QueryDef.sql(
      "c14_quota_sample",
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM c),
        |a AS (
        |  SELECT source, cnt, (200 * cnt) // tot AS base, (200 * cnt) % tot AS rem
        |  FROM c CROSS JOIN t),
        |l AS (SELECT CAST(200 - sum(base) AS BIGINT) AS leftover FROM a),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM a),
        |al AS (
        |  SELECT source,
        |    base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc
        |  FROM r CROSS JOIN l),
        |rk AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS prk
        |  FROM documents)
        |SELECT rk.doc_id, rk.source, CAST(rk.prk AS BIGINT) AS pick_rank
        |FROM rk JOIN al USING (source)
        |WHERE rk.prk <= al.alloc""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val c = docs.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      val t = c.agg(sum(col("cnt")).as("tot"))
      val a = c.crossJoin(broadcast(t))
        .select(col("source"), col("cnt"),
          expr("(200 * cnt) div tot").as("base"),
          expr("(200 * cnt) % tot").as("rem"))
      val lo = a.agg((lit(200L) - sum(col("base"))).as("leftover"))
      val alloc = a
        .withColumn("rk",
          row_number().over(Window.orderBy(col("rem").desc, col("source"))).cast("long"))
        .crossJoin(broadcast(lo))
        .select(col("source"),
          (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .as("alloc"))
      val prk = docs.select(col("doc_id"), col("source"),
        row_number().over(Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id")))
          .cast("long").as("pick_rank"))
      prk.join(broadcast(alloc), "source")
        .filter(col("pick_rank") <= col("alloc"))
        .select(col("doc_id"), col("source"), col("pick_rank"))
    }
  )
}
