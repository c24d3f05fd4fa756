package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step
  * that turns pairwise dedup output into CLUSTERS (pick one keeper per
  * component, drop the rest).
  *
  * Algorithm: hash-min label propagation. Every node starts labeled
  * with its own id; each round propagates the minimum label across
  * edges until no label changes. Rounds needed = graph diameter —
  * near-dup clusters are dense (families of variants), so this
  * converges in 2–4 rounds in practice; `maxIters` bounds pathological
  * chains. This is the standard Pregel-style shape: per-round work is
  * one shuffle join + one min-aggregate, all data-parallel; only the
  * LOOP and its convergence test (a scalar aggregate) run on the
  * driver, like any iterative fixpoint (k-means, PageRank).
  *
  * Each round's state is `localCheckpoint`ed: iterative DataFrame
  * algorithms MUST truncate lineage, or the logical plan nests one
  * level per round and planning/explain costs grow exponentially
  * (observed: OOM building the AQE plan string by round 8). On a
  * cluster with an HDFS checkpoint dir, `checkpoint` gives the same
  * truncation plus fault tolerance.
  *
  * Convergence test: hash-min labels only ever DECREASE, so the label
  * sum strictly decreases every non-converged round — one scalar
  * aggregate over the new state replaces a join against the previous
  * state.
  *
  * 100 TB posture: state per round is one (node, label) table — no
  * collected adjacency, no per-component materialization. For graphs
  * with billion-edge scale you would switch to the large-star/
  * small-star contraction variant; the round structure is identical.
  */
object DupComponents {

  /** (id, comp) for every node in `pairs` (id_a, id_b); the component
    * label is the minimum node id in the component.
    */
  def components(spark: SparkSession, pairs: DataFrame,
                 maxIters: Int = 20): DataFrame = {
    // Eager localCheckpoint: materializes once and truncates lineage so
    // every round's plan is O(1) regardless of iteration count.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var comp = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    // Decimal sum: ids are longs and ANSI mode throws on long overflow.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(comp)
    var converged = prevSum == null // empty graph: nothing to propagate
    var iters = 0
    while (!converged && iters < maxIters) {
      val next = edges
        .join(comp.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("comp"))
        .union(comp)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint(true)
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      comp.unpersist(blocking = false)
      comp = next
      iters += 1
    }
    edges.unpersist(blocking = false)
    comp
  }
}
