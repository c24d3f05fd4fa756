package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IVF (inverted-file) approximate nearest neighbor: k-means-lite
  * centroids → corpus partitioned into cells → queries probe the
  * `nprobe` nearest cells only.
  *
  * All stages are DataFrame algebra: centroid assignment is a
  * broadcast-join argmin (centroids are small by construction), Lloyd
  * refinement is a groupBy mean, and the search joins query×cell on
  * the cell id — the corpus side shuffles once at index build, then
  * every query touches `nprobe / k` of the data. The 100 TB shape:
  * the cell id becomes the table's partition key and probing is
  * partition pruning.
  *
  * Deterministic: seeds are the k smallest vec_ids, iterations fixed.
  */
object IvfIndex {

  /** (centroid_id, centroid array<double>) after `iters` Lloyd steps. */
  def centroids(corpus: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    val emb = corpus.select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("emb"))
    var cents = emb.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("centroid_id"), col("emb").as("centroid"))
    (0 until iters).foreach { _ =>
      val assigned = assign(emb, cents)
      cents = assigned.join(emb, "vec_id")
        .select(col("centroid_id"), posexplode(col("emb")).as(Seq("dim", "v")))
        .groupBy(col("centroid_id"), col("dim")).agg(avg(col("v")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dims"))
        .select(col("centroid_id"), transform(col("dims"), d => d.getField("m")).as("centroid"))
    }
    cents
  }

  /** Nearest-centroid assignment: broadcast the centroids, argmin by
    * L2 distance (rank window over the small k-way expansion).
    */
  private def assign(emb: DataFrame, cents: DataFrame): DataFrame = {
    val d2 = dist2(col("emb"), col("centroid"))
    val w = Window.partitionBy(col("vec_id")).orderBy(d2, col("centroid_id"))
    emb.join(broadcast(cents))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"))
  }

  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Top-k cosine neighbors per query, probing the `nprobe` nearest
    * cells. Approximate: recall depends on k/nprobe.
    */
  def search(queries: DataFrame, corpus: DataFrame, k: Int,
             numCells: Int = 16, nprobe: Int = 4, iters: Int = 2): DataFrame = {
    val cents = centroids(corpus, numCells, iters)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val emb = corpus.select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("emb"))
    val cells = assign(emb, cents).join(emb, "vec_id")
      .select(col("centroid_id"), col("vec_id").as("neighbor_id"), col("emb").as("n_emb"))
      .withColumn("n_nrm", VectorOps.l2Norm(col("n_emb")))

    // queries probe their nprobe nearest centroids
    val q = queries.select(col("vec_id").as("query_id"), VectorOps.toDouble(col("embedding")).as("q_emb"))
      .withColumn("q_nrm", VectorOps.l2Norm(col("q_emb")))
    val wq = Window.partitionBy(col("query_id")).orderBy(dist2(col("q_emb"), col("centroid")), col("centroid_id"))
    val probes = q.join(broadcast(cents))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("q_nrm"), col("centroid_id"))

    val pairs = cells.join(probes, Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosinePre(col("q_emb"), col("n_emb"), col("q_nrm"), col("n_nrm")).as("cosine"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    pairs.withColumn("rnk", rank().over(w)).filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("cosine"))
  }
}
