package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis + deduplication surface over the `documents` table —
  * the training-data-pipeline operators (token counting, quality
  * scoring, language-ID, fingerprinting, exact / blocked-Jaccard /
  * MinHash-LSH / SimHash dedup).
  *
  * Everything is built from codegen'd `functions._` expressions (no
  * UDFs): at 100 TB these run inside whole-stage codegen directly over
  * the parquet scan, and the dedup joins are blocked (lang, LSH band,
  * SimHash band) so no O(n²) cross join ever materializes.
  */
object TextQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- token counting ---------------------------------------------
    QueryDef.sql(
      "t1_token_count",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens,
        |  CAST(length(text) AS INT) AS n_chars_actual
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        length(col("text")).cast("int").as("n_chars_actual"))
    },

    // ---- BPE-ish pre-tokenization count ------------------------------
    QueryDef.sql(
      "t5_bpe_token_count",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_ws_tokens
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        bpeishTokenCount(col("text")).as("n_bpe_tokens"),
        tokenCount(col("text")).as("n_ws_tokens"))
    },

    // ---- quality scoring --------------------------------------------
    QueryDef.sql(
      "t2_quality_score",
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |    / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS avg_token_len,
        |  CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE)
        |    / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS stopword_ratio,
        |  CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INT) AS n_punct
        |FROM documents""".stripMargin) { (s, d) =>
      val toks = tokenCount(col("text")).cast("double")
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).cast("int").as("n_chars"),
        tokenCount(col("text")).as("n_tokens"),
        (length(regexp_replace(col("text"), " ", "")).cast("double") / toks).as("avg_token_len"),
        (size(filter(split(col("text"), " "), w => w.isin("the", "a"))).cast("double") / toks).as("stopword_ratio"),
        size(expr("regexp_extract_all(text, '[.,;:!?]', 0)")).cast("int").as("n_punct"))
    },

    // ---- language-ID (marker-token heuristic, deterministic argmax) --
    QueryDef.sql(
      "t3_langid_markers",
      """WITH scored AS (
        |  SELECT doc_id, lang AS lang_label,
        |    len(list_filter(string_split(text,' '), w -> w IN ('the','a','and'))) AS c_en,
        |    len(list_filter(string_split(text,' '), w -> w IN ('le','la','et'))) AS c_fr,
        |    len(list_filter(string_split(text,' '), w -> w IN ('el','los','y'))) AS c_es,
        |    len(list_filter(string_split(text,' '), w -> w IN ('der','und','die'))) AS c_de
        |  FROM documents)
        |SELECT doc_id, lang_label,
        |  CASE WHEN c_en >= c_fr AND c_en >= c_es AND c_en >= c_de THEN 'en'
        |       WHEN c_fr >= c_es AND c_fr >= c_de THEN 'fr'
        |       WHEN c_es >= c_de THEN 'es'
        |       ELSE 'de' END AS lang_pred
        |FROM scored""".stripMargin) { (s, d) =>
      def hits(ws: String*) =
        size(filter(split(col("text"), " "), w => w.isin(ws.map(x => x: Any): _*))).cast("bigint")
      val scored = Tables.documents(s, d).select(
        col("doc_id"), col("lang").as("lang_label"),
        hits("the", "a", "and").as("c_en"), hits("le", "la", "et").as("c_fr"),
        hits("el", "los", "y").as("c_es"), hits("der", "und", "die").as("c_de"))
      scored.select(
        col("doc_id"), col("lang_label"),
        when(col("c_en") >= col("c_fr") && col("c_en") >= col("c_es") && col("c_en") >= col("c_de"), "en")
          .when(col("c_fr") >= col("c_es") && col("c_fr") >= col("c_de"), "fr")
          .when(col("c_es") >= col("c_de"), "es")
          .otherwise("de").as("lang_pred"))
    },

    // ---- document fingerprint (polynomial rolling hash) ---------------
    QueryDef.sql(
      "t4_fingerprint",
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split_regex(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
        |FROM documents""".stripMargin) { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"), rollingFingerprint(col("text")).as("fingerprint"))
    },

    // ---- exact dedup (hash-groupBy) ------------------------------------
    QueryDef.sql(
      "d1_dedup_exact",
      """SELECT md5(text) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_id
        |FROM documents GROUP BY md5(text)""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_id"))
    },

    // ---- n-gram (token-set) Jaccard near-dup ----------------------------
    // Adaptive exact similarity join (operators.JaccardJoin): on a
    // large vocabulary (the 100 TB corpus shape) candidates come from
    // rare-token prefix filtering (AllPairs/PPJoin), so the candidate
    // space is collision-bounded even though the semantic block key
    // (lang) has ~5 values; on a tiny vocabulary — where no rare
    // prefix exists and the true pair set is dense — bitmap popcount
    // within blocks. Same result set and bit-identical jaccard under
    // both plans; oracle is the pairwise formulation.
    QueryDef.sql(
      "d2_jaccard_blocked",
      """WITH t AS (
        |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE) AS jaccard
        |FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE) >= 0.5""".stripMargin) { (s, d) =>
      graft.operators.JaccardJoin.pairs(Tables.documents(s, d),
        idCol = "doc_id", blockCol = "lang", textCol = "text", threshold = 0.5)
    },

    // ---- composed curation pipeline: exact-dedup keeper + quality gate --
    // The end-to-end training-data flow (dedup → filter → emit) as one
    // declarative plan: one shuffle for the keeper window, filters
    // evaluated in the same stage as the scan.
    QueryDef.sql(
      "c1_curation_pipeline",
      """WITH h AS (
        |  SELECT doc_id, lang, md5(text) AS th,
        |    len(regexp_extract_all(text, '\S+')) AS n_tokens
        |  FROM documents),
        |k AS (
        |  SELECT *, row_number() OVER (PARTITION BY th ORDER BY doc_id) AS rn FROM h)
        |SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens
        |FROM k WHERE rn = 1 AND n_tokens >= 5""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val h = Tables.documents(s, d).select(
        col("doc_id"), col("lang"), md5(col("text")).as("th"),
        tokenCount(col("text")).as("n_tokens"))
      val w = Window.partitionBy(col("th")).orderBy(col("doc_id"))
      h.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("n_tokens") >= 5)
        .select(col("doc_id"), col("lang"), col("n_tokens"))
    },

    // ---- deterministic stratified sample ------------------------------
    // Per-class fixed-size sampling for training-data curation: order
    // each stratum by a cross-engine hash (md5) and keep the first N —
    // reproducible on any cluster layout (unlike rand()-based
    // sampleBy), restartable, and bit-exactly oracle-checkable.
    // Scale note: rank-filter-over-window is NOT a full per-stratum
    // sort at 100 TB — Catalyst inserts partial+final WindowGroupLimit
    // (verified in the plan), so each map task ships at most N rows
    // per stratum into the one shuffle.
    QueryDef.sql(
      "c2_stratified_sample",
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r WHERE rn <= 50""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 50).drop("rn")
    },

    // ---- Benchmark-contamination check ---------------------------------
    // The training-data hygiene op: count each candidate document's
    // distinct 5-gram overlaps with an evaluation-benchmark set (here a
    // deterministic stand-in slice, doc_id % 19 == 0). 100 TB shape:
    // eval suites are small by nature, so the benchmark n-gram set is
    // BROADCAST — the corpus side never shuffles.
    QueryDef.sql(
      "t6_contamination",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents),
        |ng AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(t) - 4, 0) + 1),
        |    i -> array_to_string(t[i:i+4], ' ')))) AS g
        |  FROM toks),
        |bench AS (SELECT DISTINCT g FROM ng WHERE doc_id % 19 = 0),
        |eval AS (SELECT doc_id, g FROM ng WHERE doc_id % 19 <> 0)
        |SELECT e.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_ngrams,
        |  CAST(count(b.g) AS BIGINT) AS n_contaminated,
        |  (count(b.g) > 0) AS contaminated
        |FROM eval e LEFT JOIN bench b ON e.g = b.g
        |GROUP BY e.doc_id""".stripMargin) { (s, d) =>
      val k = 5
      val staged = Tables.documents(s, d)
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("t"))
      val m = size(col("t")) - (k - 1)
      val grams = when(m >= 1,
          transform(sequence(lit(1), m), i => array_join(slice(col("t"), i, lit(k)), " ")))
        .otherwise(array().cast("array<string>"))
      val ng = staged.select(col("doc_id"), explode(array_distinct(grams)).as("g"))
      val bench = ng.filter(col("doc_id") % 19 === 0).select("g").distinct()
      ng.filter(col("doc_id") % 19 =!= 0)
        .join(broadcast(bench.withColumn("hit", lit(1))), Seq("g"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_ngrams"), count(col("hit")).as("n_contaminated"))
        .withColumn("contaminated", col("n_contaminated") > 0)
    },

    // ---- Intra-document repetition score -------------------------------
    // Quality signal: fraction of repeated 3-grams inside a document
    // (1 - distinct/total). Pure per-row Column algebra — no shuffle.
    QueryDef.sql(
      "t7_repetition",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, list_transform(range(1, greatest(len(t) - 2, 0) + 1),
        |    i -> array_to_string(t[i:i+2], ' ')) AS grams
        |  FROM toks)
        |SELECT doc_id,
        |  CAST(len(grams) AS BIGINT) AS n_3grams,
        |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
        |  CASE WHEN len(grams) > 0
        |       THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE)
        |       ELSE 0.0 END AS rep_ratio
        |FROM g""".stripMargin) { (s, d) =>
      val k = 3
      val staged = Tables.documents(s, d)
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("t"))
      val m = size(col("t")) - (k - 1)
      val grams = when(m >= 1,
          transform(sequence(lit(1), m), i => array_join(slice(col("t"), i, lit(k)), " ")))
        .otherwise(array().cast("array<string>"))
      staged.select(col("doc_id"), grams.as("grams"))
        .select(col("doc_id"),
          size(col("grams")).cast("long").as("n_3grams"),
          size(array_distinct(col("grams"))).cast("long").as("n_distinct"),
          when(size(col("grams")) > 0,
            lit(1.0) - size(array_distinct(col("grams"))).cast("double") /
              size(col("grams")).cast("double"))
            .otherwise(lit(0.0)).as("rep_ratio"))
    },

    // ---- Corpus term statistics: top-k terms per language ---------------
    // The tokenizer-training / corpus-profiling stat. Plan: map-side
    // partial counts → one shuffle on (lang, term) → WindowGroupLimit
    // pushes the top-k bound below the sort, so map tasks ship at most
    // k rows per group — never a full per-language sort at 100 TB.
    QueryDef.sql(
      "t8_top_terms",
      """WITH tok AS (
        |  SELECT lang, unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents),
        |cnt AS (
        |  SELECT lang, term, count(*) AS n FROM tok GROUP BY lang, term),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rn
        |  FROM cnt)
        |SELECT lang, term, CAST(n AS BIGINT) AS n, CAST(rn AS INT) AS rank
        |FROM r WHERE rn <= 20""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val cnt = Tables.documents(s, d)
        .select(col("lang"), explode(split(lower(col("text")), "\\s+")).as("term"))
        .groupBy("lang", "term").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("term"))
      cnt.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 20)
        .select(col("lang"), col("term"), col("n"), col("rank").cast("int").as("rank"))
    },

    // ---- Near-dup clustering: pairs → connected components --------------
    // Completes the dedup pipeline: pairwise near-dups (the blocked
    // Jaccard join) become clusters via hash-min label propagation
    // (operators.DupComponents); component = min doc_id. The oracle
    // recomputes the same fixpoint with a recursive CTE.
    QueryDef.sql(
      "d6_dup_components",
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS DOUBLE) >= 0.7),
        |e AS (
        |  SELECT id_a AS src, id_b AS dst FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, root) AS (
        |  SELECT DISTINCT src, src FROM e
        |  UNION
        |  SELECT e.dst, r.root FROM reach r JOIN e ON e.src = r.id)
        |SELECT id AS doc_id, min(root) AS component
        |FROM reach GROUP BY id""".stripMargin) { (s, d) =>
      val pairs = graft.operators.JaccardJoin.pairs(Tables.documents(s, d),
        idCol = "doc_id", blockCol = "lang", textCol = "text", threshold = 0.7)
      graft.operators.DupComponents.components(s, pairs)
        .select(col("id").as("doc_id"), col("comp").as("component"))
    },

    // ---- MinHash + LSH near-dup (banding) — not SQL-expressible ---------
    QueryDef.rowsOnly("d3_minhash_lsh") { (s, d) =>
      graft.operators.MinHashLSH.nearDuplicates(
        Tables.documents(s, d), textCol = "text", idCol = "doc_id",
        numHashes = 32, bands = 8, shingleSize = 3, jaccardThreshold = 0.35)
    },

    // ---- SimHash near-dup (64-bit, banded hamming) — not SQL-expressible
    QueryDef.rowsOnly("d4_simhash") { (s, d) =>
      graft.operators.SimHash.signatures(Tables.documents(s, d), "text", "doc_id")
    }
  )
}
