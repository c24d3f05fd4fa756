package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Embedding-vector operators: cosine similarity, brute-force k-NN, and
  * a random-hyperplane-LSH bucketed ANN variant for scale.
  *
  * Arithmetic is a strict left-fold in double precision
  * (`aggregate(zip_with(...))`) so results are bit-reproducible and an
  * external oracle can mirror the exact operation order. No UDFs.
  */
object VectorOps {

  /** Elementwise double-cast of a float-array column. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** dot(a, b) as a sequential left fold: 0.0 + a1*b1 + a2*b2 + ...
    * Implemented by the native codegen'd [[graft.functions.DotProduct]]
    * (fused loop, no intermediate array); the built-in equivalent is
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — same fold order,
    * bit-identical doubles, ~2× slower.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dotNative(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine from precomputed norms: at scale, norms are computed once
    * per ROW before the pair join (O(n·d)), not once per PAIR
    * (O(n²·d)). Same op order as [[cosine]] → bit-identical doubles.
    */
  def cosinePre(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Brute-force top-k cosine neighbors for each query row.
    * The query side is expected to be small (broadcast); the corpus scan
    * stays distributed and the per-query top-k is a window over the
    * (query x corpus-partition) pairs.
    */
  def knnBrute(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), toDouble(col("embedding")).as("q_emb"))
      .withColumn("q_nrm", l2Norm(col("q_emb")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), toDouble(col("embedding")).as("n_emb"))
      .withColumn("n_nrm", l2Norm(col("n_emb")))
    val pairs = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("q_emb"), col("n_emb"), col("q_nrm"), col("n_nrm")).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    pairs.withColumn("rnk", rank().over(w)).filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cosine"))
  }

  /** Matryoshka two-stage retrieval: shortlist by cosine over the
    * first `prefixDims` dimensions (MRL-style embeddings front-load
    * information, so a truncated prefix is a usable coarse scorer),
    * then exact full-dimension rerank of the per-query shortlist.
    *
    * Scale shape: the stage-1 pair scan touches `prefixDims/d` of the
    * vector bytes (with dimension-major storage it reads 8 of 64
    * columns); stage 2 reranks only `shortlist` rows per query. Both
    * top-k bounds are rank windows (WindowGroupLimit ships ≤ k rows
    * per query per map task). Exact arithmetic discipline as knnBrute
    * — strict left folds — so an oracle can mirror both stages.
    */
  def matryoshkaSearch(queries: DataFrame, corpus: DataFrame, k: Int,
                       shortlist: Int = 20, prefixDims: Int = 8): DataFrame = {
    // stage 1 carries ONLY (ids, truncated cosine) through the pair
    // stream and its rank window — projecting the full vectors onto
    // every pair row would copy ~d doubles per pair just to keep them
    // alive past the window; instead the full embeddings join back
    // onto the ≤ shortlist·|Q| surviving rows for the exact rerank
    val qPre = queries.select(col("vec_id").as("query_id"),
        slice(toDouble(col("embedding")), 1, prefixDims).as("q_pre"))
      .withColumn("q_pnrm", l2Norm(col("q_pre")))
    val cPre = corpus.select(col("vec_id").as("neighbor_id"),
        slice(toDouble(col("embedding")), 1, prefixDims).as("n_pre"))
      .withColumn("n_pnrm", l2Norm(col("n_pre")))
    val stage1 = cPre.join(broadcast(qPre), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(col("q_pre"), col("n_pre"), col("q_pnrm"), col("n_pnrm")).as("cosine_trunc"))
    val w1 = Window.partitionBy(col("query_id")).orderBy(col("cosine_trunc").desc, col("neighbor_id"))
    val short = stage1.withColumn("srnk", rank().over(w1)).filter(col("srnk") <= shortlist)

    val qFull = queries.select(col("vec_id").as("query_id"), toDouble(col("embedding")).as("q_emb"))
      .withColumn("q_nrm", l2Norm(col("q_emb")))
    val cFull = corpus.select(col("vec_id").as("neighbor_id"), toDouble(col("embedding")).as("n_emb"))
      .withColumn("n_nrm", l2Norm(col("n_emb")))
    val w2 = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    short
      .join(broadcast(qFull), "query_id")
      .join(cFull, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("cosine_trunc"),
        cosinePre(col("q_emb"), col("n_emb"), col("q_nrm"), col("n_nrm")).as("cosine"))
      .withColumn("rnk", rank().over(w2)).filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cosine"), col("cosine_trunc"))
  }

  /** Deterministic random-hyperplane signature (`planes` rows of ±1
    * weights, seeded): bit p = [dot(plane_p, v) > 0].
    */
  def hyperplaneSignature(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(typedlit(p), v) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Deterministic ±1 hyperplanes from a fixed seed. */
  def makePlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(if (rng.nextBoolean()) 1.0 else -1.0))
  }

  /** LSH-bucketed ANN: only candidates sharing the query's hyperplane
    * bucket are scored — the scale path where brute force is too wide.
    * Recall < 1 by construction (approximate).
    */
  def annLsh(queries: DataFrame, corpus: DataFrame, k: Int,
             numPlanes: Int = 12, dim: Int = 64): DataFrame = {
    val planes = makePlanes(numPlanes, dim)
    def withSig(df: DataFrame, idAs: String, embAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), toDouble(col("embedding")).as(embAs))
        .withColumn("bucket", hyperplaneSignature(col(embAs), planes))
    val q = withSig(queries, "query_id", "q_emb")
    val c = withSig(corpus, "neighbor_id", "n_emb")
    val pairs = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("n_emb")).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    pairs.withColumn("rnk", rank().over(w)).filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cosine"))
  }
}
