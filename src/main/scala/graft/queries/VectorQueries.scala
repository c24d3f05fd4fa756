package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.operators.VectorOps

/** Similarity-search surface over the `embeddings` table. The DuckDB
  * oracles mirror the exact fold order of [[VectorOps.dot]]
  * (`list_reduce` over an index range with a 0.0 seed) so doubles match
  * bit-for-bit.
  */
object VectorQueries {

  private val dotSelf =
    """list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |  list_transform(range(1, len(emb)+1), i -> emb[i]*emb[i])), (a,b) -> a+b)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- L2 norms ------------------------------------------------------
    QueryDef.sql(
      "v1_embedding_norms",
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
         |SELECT vec_id, sqrt($dotSelf) AS l2_norm FROM e""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("emb"))
      e.select(col("vec_id"), VectorOps.l2Norm(col("emb")).as("l2_norm"))
    },

    // ---- brute-force cosine top-k (baseline exact ANN) ------------------
    QueryDef.sql(
      "v2_knn_brute",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*n.emb[i])), (a,b) -> a+b)
        |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*q.emb[i])), (a,b) -> a+b))
        |     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(n.emb)+1), i -> n.emb[i]*n.emb[i])), (a,b) -> a+b))) AS cosine
        |  FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, rnk, cosine FROM (
        |  SELECT *, rank() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        |  FROM pairs) WHERE rnk <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      VectorOps.knnBrute(emb.filter(col("vec_id") < 10), emb, k = 5)
    },

    // ---- LSH-bucketed ANN (approximate; the 100 TB path) ----------------
    QueryDef.rowsOnly("v3_ann_lsh") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      VectorOps.annLsh(emb.filter(col("vec_id") < 50), emb, k = 5)
    },

    // ---- Matryoshka two-stage retrieval (truncate → exact rerank) --------
    // Coarse-score with the first 8 dimensions (1/8 of the vector
    // bytes), keep a 20-deep shortlist per query, rerank that exactly
    // at full dimension. Unlike v3/v5 this two-stage pipeline is fully
    // deterministic — both stages are rank windows over strict-left-
    // fold cosines — so the whole retrieval is ORACLE-CHECKED, not
    // recall-bounded. Both engines fold the same order → identical
    // doubles → identical shortlists → identical final ranking.
    QueryDef.sql(
      "v9_matryoshka",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    q.emb AS q_emb, n.emb AS n_emb,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, 9), i -> q.emb[i]*n.emb[i])), (a,b) -> a+b)
        |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, 9), i -> q.emb[i]*q.emb[i])), (a,b) -> a+b))
        |     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, 9), i -> n.emb[i]*n.emb[i])), (a,b) -> a+b)))
        |      AS cosine_trunc
        |  FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id <> q.vec_id),
        |short AS (
        |  SELECT * FROM (
        |    SELECT *, rank() OVER (PARTITION BY query_id
        |      ORDER BY cosine_trunc DESC, neighbor_id) AS srnk
        |    FROM pairs) WHERE srnk <= 20),
        |rer AS (
        |  SELECT query_id, neighbor_id, cosine_trunc,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(q_emb)+1), i -> q_emb[i]*n_emb[i])), (a,b) -> a+b)
        |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(q_emb)+1), i -> q_emb[i]*q_emb[i])), (a,b) -> a+b))
        |     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(n_emb)+1), i -> n_emb[i]*n_emb[i])), (a,b) -> a+b)))
        |      AS cosine
        |  FROM short)
        |SELECT query_id, neighbor_id, rnk, cosine, cosine_trunc FROM (
        |  SELECT *, rank() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        |  FROM rer) WHERE rnk <= 5""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      VectorOps.matryoshkaSearch(emb.filter(col("vec_id") < 10), emb,
        k = 5, shortlist = 20, prefixDims = 8)
    },

    // ---- IVF ANN: k-means cells + nprobe probing ------------------------
    QueryDef.rowsOnly("v5_ann_ivf") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.operators.IvfIndex.search(emb.filter(col("vec_id") < 20), emb,
        k = 5, numCells = 16, nprobe = 4)
    },

    // ---- IVF-PQ + ADC + exact re-rank (production ANN pipeline) -----------
    // The full compressed-retrieval stack: coarse cell probe → ADC
    // shortlist over 4-byte PQ codes (no embedding bytes in the scan)
    // → exact cosine re-rank of k·refine candidates. Recall and
    // re-rank exactness quantified in IvfIndexSpec; rows-only (the
    // k-means/PQ models are not SQL-expressible).
    QueryDef.rowsOnly("v11_ivfpq_search") { (s, d) =>
      val emb = Tables.embeddings(s, d)
      graft.operators.IvfIndex.ivfpqSearch(emb.filter(col("vec_id") < 20), emb,
        k = 5, numCells = 16, nprobe = 4, m = 8, codebookK = 16, refine = 4)
    },

    // ---- embedding whitening (per-dimension standardization) -------------
    // The preprocessing step before PQ/IVF training: every dimension is
    // centered and scaled by its corpus std. Moments are order-
    // independent: each value is quantized to DECIMAL(20,8) (and its
    // square to DECIMAL(30,12)) before summation — exact under any
    // partitioning, mirrorable in any engine (v4's sorted-fold trick
    // collects a whole column per group, fine for label-bounded groups
    // but memory-unbounded for global per-dim stats; quantized decimal
    // sums are the scan-shaped alternative). The 64-row stats table
    // broadcasts back onto the sample projection; z output rounds to 6.
    QueryDef.sql(
      "v10_whiten",
      """WITH vals AS (
        |  SELECT vec_id,
        |    unnest(range(1, len(embedding) + 1)) AS dim,
        |    unnest(list_transform(range(1, len(embedding) + 1),
        |      i -> CAST(embedding[i] AS DOUBLE))) AS v
        |  FROM embeddings),
        |st AS (
        |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(v AS DECIMAL(20,8))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(v * v AS DECIMAL(30,12))) AS DOUBLE) AS s2
        |  FROM vals GROUP BY dim)
        |SELECT vec_id, CAST(vals.dim AS INT) AS dim,
        |  round((v - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS whitened
        |FROM vals JOIN st ON vals.dim = st.dim
        |WHERE vec_id < 10 AND vals.dim <= 8
        |  AND s2 / n - (s1 / n) * (s1 / n) > 0""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val vals = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(VectorOps.toDouble(col("embedding"))).as(Seq("p", "v")))
        .select(col("vec_id"), (col("p") + 1).as("dim"), col("v"))
      val st = vals.groupBy("dim").agg(
        count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(20, 8))).cast("double").as("s1"),
        sum((col("v") * col("v")).cast(DecimalType(30, 12))).cast("double").as("s2"))
      val mean = col("s1") / col("n")
      val variance = col("s2") / col("n") - mean * mean
      vals.filter(col("vec_id") < 10 && col("dim") <= 8)
        .join(broadcast(st), "dim")
        .filter(variance > 0)
        .select(col("vec_id"), col("dim").cast("int").as("dim"),
          round((col("v") - mean) / sqrt(variance), 6).as("whitened"))
    },

    // ---- per-label centroids (deterministic sorted-fold mean) -----------
    // Double sums are order-dependent; sorting the per-group values and
    // folding sequentially makes the mean bit-reproducible under any
    // partitioning, and lets the oracle mirror the exact op order.
    QueryDef.sql(
      "v4_label_centroids",
      """SELECT label, CAST(dim AS INT) AS dim,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_sort(list(CAST(val AS DOUBLE)))),
        |              (a,b) -> a+b) / COUNT(*) AS dim_mean
        |FROM (
        |  SELECT label,
        |    unnest(range(1, len(embedding)+1)) AS dim,
        |    unnest(list_transform(range(1, len(embedding)+1), i -> embedding[i])) AS val
        |  FROM embeddings)
        |GROUP BY label, CAST(dim AS INT)""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .groupBy(col("label"), (col("pos") + 1).cast("int").as("dim"))
        .agg((aggregate(sort_array(collect_list(col("val").cast("double"))), lit(0.0),
          (acc, v) => acc + v) / count(lit(1))).as("dim_mean"))
    },

    // ---- k-NN join (top-k neighbors for EVERY row, label-blocked) --------
    // The batch companion to v2 (which ranks a small query set against
    // the corpus): every vector gets its 3 nearest same-label
    // neighbors. Scale shape: the join is blocked on label so no
    // cross-block pairs materialize, norms are computed once per row
    // before the join, and the top-k filter is a rank window on the
    // pair stream — WindowGroupLimit bounds what map tasks ship. At
    // corpus scale the label comes from a coarse quantizer (v5's IVF
    // cells); the plan shape is identical.
    QueryDef.sql(
      "v6_knn_join",
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.label AS label,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(a.emb)+1), i -> a.emb[i]*b.emb[i])), (x,y) -> x+y)
        |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(a.emb)+1), i -> a.emb[i]*a.emb[i])), (x,y) -> x+y))
        |     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(b.emb)+1), i -> b.emb[i]*b.emb[i])), (x,y) -> x+y))) AS cosine
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id)
        |SELECT query_id, neighbor_id, label, rnk, cosine FROM (
        |  SELECT *, rank() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        |  FROM pairs) WHERE rnk <= 3""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), VectorOps.toDouble(col("embedding")).as("emb"))
        .withColumn("nrm", VectorOps.l2Norm(col("emb")))
      val a = e.select(col("vec_id").as("query_id"), col("label"),
        col("emb").as("emb_a"), col("nrm").as("nrm_a"))
      val b = e.select(col("vec_id").as("neighbor_id"), col("label").as("lbl_b"),
        col("emb").as("emb_b"), col("nrm").as("nrm_b"))
      val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
      a.join(b, col("label") === col("lbl_b") && col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("label"),
          VectorOps.cosinePre(col("emb_a"), col("emb_b"), col("nrm_a"), col("nrm_b")).as("cosine"))
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
        .select(col("query_id"), col("neighbor_id"), col("label"), col("rnk"), col("cosine"))
    },

    // ---- embedding near-dup pairs (cosine >= tau, label-blocked) ---------
    QueryDef.sql(
      "d5_embedding_neardup",
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(a.emb)+1), i -> a.emb[i]*b.emb[i])), (x,y) -> x+y)
        |  / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(a.emb)+1), i -> a.emb[i]*a.emb[i])), (x,y) -> x+y))
        |   * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(b.emb)+1), i -> b.emb[i]*b.emb[i])), (x,y) -> x+y))) AS cosine
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(range(1, len(a.emb)+1), i -> a.emb[i]*b.emb[i])), (x,y) -> x+y)
        |  / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(a.emb)+1), i -> a.emb[i]*a.emb[i])), (x,y) -> x+y))
        |   * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(b.emb)+1), i -> b.emb[i]*b.emb[i])), (x,y) -> x+y))) >= 0.4""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"), VectorOps.toDouble(col("embedding")).as("emb"))
        .withColumn("nrm", VectorOps.l2Norm(col("emb")))
      val a = e.select(col("vec_id").as("id_a"), col("label").as("lbl_a"),
        col("emb").as("emb_a"), col("nrm").as("nrm_a"))
      val b = e.select(col("vec_id").as("id_b"), col("label").as("lbl_b"),
        col("emb").as("emb_b"), col("nrm").as("nrm_b"))
      a.join(b, col("lbl_a") === col("lbl_b") && col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          VectorOps.cosinePre(col("emb_a"), col("emb_b"), col("nrm_a"), col("nrm_b")).as("cosine"))
        .filter(col("cosine") >= 0.4)
    },

    // ---- semantic dedup (SemDeDup: IVF-cell-blocked near-dup pairs) ------
    // Unlike d5 (blocked on a given label), the blocking key here is
    // LEARNED: k-means cells from the embeddings themselves — the shape
    // that works when no natural block column exists. Approximate
    // (cross-cell pairs missed; recall spec in IvfIndexSpec), found
    // pairs exact-cosine verified.
    QueryDef.rowsOnly("d9_semantic_dedup") { (s, d) =>
      graft.operators.IvfIndex.semanticNearDup(
        Tables.embeddings(s, d), tau = 0.4, numCells = 16)
    },

    // ---- product quantization (IVF-PQ codebook compression) --------------
    // The 16×-beyond-scalar compression step: m=8 subspace codebooks
    // (k=16 centroids each, driver-side Lloyd fit), codes + per-row
    // reconstruction-error audit as one scan-stage projection.
    // k-means is not SQL-expressible → rows-only; determinism and
    // reconstruction-vs-global-mean bounds are pinned in IvfIndexSpec.
    QueryDef.rowsOnly("v8_pq") { (s, d) =>
      graft.operators.IvfIndex.productQuantize(
        Tables.embeddings(s, d), m = 8, k = 16)
    },

    // ---- int8 scalar quantization (embedding compression for ANN) --------
    // The standard 4×-compression step before serving/indexing vectors
    // at scale: per-dimension global [min,max] → codes in 0..255 →
    // reconstruction error audit. Scale shape: the per-dim ranges are a
    // 64-row aggregate broadcast back onto the long-form stream (one
    // explode, one partial-agg shuffle for ranges, one for the per-row
    // rollup); the quantize/dequantize math is pure codegen'd Column
    // algebra. code_sum bit-checks the integer codes; mse is an exact
    // decimal sum of identically-ordered double ops (floor, not
    // round(), so no half-even ambiguity; x*x, not pow()).
    QueryDef.sql(
      "v7_quantize",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |lf AS (SELECT vec_id, unnest(range(1, len(emb)+1)) AS dim, unnest(emb) AS val FROM e),
        |mm AS (SELECT dim, min(val) AS minv, max(val) AS maxv FROM lf GROUP BY dim),
        |q AS (
        |  SELECT vec_id, val, minv, maxv,
        |    CASE WHEN maxv > minv
        |         THEN CAST(floor((val - minv) / (maxv - minv) * 255.0 + 0.5) AS INT)
        |         ELSE 0 END AS code
        |  FROM lf JOIN mm USING (dim)),
        |r AS (
        |  SELECT vec_id, code,
        |    (minv + CAST(code AS DOUBLE) / 255.0 * (maxv - minv) - val)
        |    * (minv + CAST(code AS DOUBLE) / 255.0 * (maxv - minv) - val) AS err
        |  FROM q)
        |SELECT vec_id, CAST(count(*) AS INT) AS n_dims,
        |  CAST(sum(CAST(code AS BIGINT)) AS BIGINT) AS code_sum,
        |  round(CAST(sum(CAST(err AS DECIMAL(38,30))) AS DOUBLE) / count(*), 12) AS mse
        |FROM r GROUP BY vec_id""".stripMargin) { (s, d) =>
      val lf = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(VectorOps.toDouble(col("embedding")))
          .as(Seq("pos", "val")))
        .select(col("vec_id"), (col("pos") + 1).as("dim"), col("val"))
      val mm = lf.groupBy("dim").agg(min(col("val")).as("minv"), max(col("val")).as("maxv"))
      val code = when(col("maxv") > col("minv"),
        floor((col("val") - col("minv")) / (col("maxv") - col("minv")) * lit(255.0) + lit(0.5))
          .cast("int")).otherwise(0)
      val deq = col("minv") + col("code").cast("double") / lit(255.0) *
        (col("maxv") - col("minv"))
      lf.join(broadcast(mm), "dim")
        .withColumn("code", code)
        .withColumn("err", (deq - col("val")) * (deq - col("val")))
        .groupBy("vec_id").agg(
          count(lit(1)).cast("int").as("n_dims"),
          sum(col("code").cast("long")).as("code_sum"),
          round(sum(col("err").cast(DecimalType(38, 30))).cast("double") / count(lit(1)), 12)
            .as("mse"))
    },

    // ---- V12: kNN majority-vote classification ---------------------------
    // The standard label-transfer pass over an embedded corpus (weak
    // labeling, quality-tier propagation): exact cosine top-5 among the
    // labeled pool (vec_id >= 10), then a deterministic majority vote
    // (count DESC, label ASC). Every stage is a rank window with a
    // unique tie-break, so unlike recall-bounded ANN the whole
    // classification is oracle-checked. Scale shape: the vote is a
    // per-query aggregate over ≤ k rows riding the existing
    // WindowGroupLimit top-k — no extra shuffle beyond knnBrute's.
    QueryDef.sql(
      "v12_knn_classify",
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        |           FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, n.label,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*n.emb[i])), (a,b) -> a+b)
        |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(q.emb)+1), i -> q.emb[i]*q.emb[i])), (a,b) -> a+b))
        |     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(n.emb)+1), i -> n.emb[i]*n.emb[i])), (a,b) -> a+b))) AS cosine
        |  FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id >= 10),
        |knn AS (
        |  SELECT query_id, neighbor_id, label FROM (
        |    SELECT *, rank() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS rnk
        |    FROM pairs) WHERE rnk <= 5),
        |votes AS (
        |  SELECT query_id, label, CAST(count(*) AS BIGINT) AS n_votes
        |  FROM knn GROUP BY 1, 2)
        |SELECT query_id, label AS predicted_label, n_votes FROM (
        |  SELECT *, rank() OVER (PARTITION BY query_id
        |    ORDER BY n_votes DESC, label) AS vr
        |  FROM votes) WHERE vr = 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
      val knn = VectorOps.knnBrute(
        emb.filter(col("vec_id") < 10),
        emb.filter(col("vec_id") >= 10), k = 5)
      val labels = emb.select(col("vec_id").as("neighbor_id"), col("label"))
      // broadcast the BOUNDED side: knn is <= queries*k rows at any
      // corpus size, while labels is corpus-sized (hinting labels was
      // the v24 bug class — caught by PlanSweep's hint rule)
      val votes = broadcast(knn).join(labels, "neighbor_id")
        .groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("n_votes"))
      val vr = Window.partitionBy(col("query_id"))
        .orderBy(col("n_votes").desc, col("label"))
      votes.withColumn("vr", rank().over(vr)).filter(col("vr") === 1)
        .select(col("query_id"), col("label").as("predicted_label"), col("n_votes"))
    },

    // ---- V13: int4 quantization (nibble packing) --------------------------
    // The 8×-compression storage tier below v7's int8: symmetric
    // per-vector scale (max |x|), 4-bit codes in [-8, 7] via
    // deterministic floor (never round-half, whose tie behavior is
    // engine-specific), two codes packed per byte. 64 dims → 32 bytes.
    // All integer arithmetic plus one fixed-order double expression
    // per element, so codes, packed bytes, AND reconstruction error
    // are oracle-checked. Scale shape: pure scan-stage Column algebra.
    QueryDef.sql(
      "v13_int4_quantize",
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |s AS (SELECT vec_id, emb,
        |  list_reduce(list_transform(emb, x -> abs(x)), (a, b) -> greatest(a, b))
        |    AS scale FROM e),
        |q AS (SELECT vec_id, emb, scale,
        |  CASE WHEN scale = 0 THEN list_transform(emb, x -> 0)
        |       ELSE list_transform(emb,
        |         x -> greatest(-8, least(7, CAST(floor(x / scale * 8) AS INT))))
        |  END AS qv FROM s),
        |p AS (SELECT vec_id, emb, scale, qv,
        |  list_transform(range(0, 32),
        |    j -> (qv[j * 2 + 1] + 8) * 16 + (qv[j * 2 + 2] + 8)) AS packed
        |  FROM q)
        |SELECT vec_id,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), packed), (a, b) -> a + b)
        |    AS BIGINT) AS code_sum,
        |  array_to_string(packed[1:8], ',') AS first8,
        |  round(list_reduce(list_transform(range(1, len(emb) + 1),
        |      i -> abs(CAST(qv[i] AS DOUBLE) * scale / 8 - emb[i])),
        |    (a, b) -> greatest(a, b)), 6) AS max_err
        |FROM p""".stripMargin) { (s, d) =>
      val emb = VectorOps.toDouble(col("embedding"))
      val scale = array_max(transform(emb, x => abs(x)))
      val base = Tables.embeddings(s, d)
        .select(col("vec_id"), emb.as("emb"), scale.as("scale"))
      val qv = when(col("scale") === 0, transform(col("emb"), _ => lit(0)))
        .otherwise(transform(col("emb"),
          x => greatest(lit(-8), least(lit(7),
            floor(x / col("scale") * 8).cast("int")))))
      val withQ = base.withColumn("qv", qv)
      val packed = transform(sequence(lit(0), lit(31)),
        j => (element_at(col("qv"), j * 2 + 1) + 8) * 16
          + (element_at(col("qv"), j * 2 + 2) + 8))
      withQ.withColumn("packed", packed)
        .select(col("vec_id"),
          aggregate(col("packed"), lit(0L), (a, x) => a + x).as("code_sum"),
          array_join(transform(slice(col("packed"), 1, 8), _.cast("string")), ",")
            .as("first8"),
          round(array_max(zip_with(col("qv"), col("emb"),
            (q, x) => abs(q.cast("double") * col("scale") / 8 - x))), 6)
            .as("max_err"))
    }
  )
}
