package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Power-iteration PageRank over an undirected pair graph — the
  * centrality step of a dedup pipeline (pick the most-linked variant
  * of a duplicate family as its canonical representative, rather than
  * min-id) and the second Pregel-shaped iterative operator beside
  * [[DupComponents]] (same loop discipline: per-round join + aggregate,
  * localCheckpoint lineage truncation, driver only runs the loop).
  *
  * DETERMINISM: iterative FLOAT algorithms are unverifiable across
  * engines — double sums are order-dependent and even `round(x, 12)`
  * differs between libm-style and BigDecimal-style implementations,
  * and iteration amplifies a 1-ulp divergence. So the recurrence is
  * FIXED-POINT: ranks are BIGINT nano-units (r₀ = 10⁹),
  *
  *   c(u)  = r(u) DIV deg(u)                    (integer floor div)
  *   r'(v) = 0.15·10⁹ + (Σ c(u) DIV 20) · 17    (0.85 = 17/20)
  *
  * — every step is integer arithmetic with identical semantics in any
  * engine (the DuckDB oracle unrolls the same five blocks with `//`).
  * Quantization error vs true PageRank is ≤ a few nano-units per round
  * — irrelevant for ranking, decisive for verifiability. The
  * contribution sum runs as DECIMAL(38,0) (exact past 2⁶³; a hub fed
  * by a billion nodes cannot overflow the aggregate).
  *
  * Scale shape: deg(source) is joined onto the edge list ONCE before
  * the loop (it never changes); each round is one join of the weighted
  * edges against the rank table + one partial-aggregated shuffle on
  * destination. The rank table has one row per NODE (≪ edges on dedup
  * graphs), broadcast below `broadcastNodeLimit` so the edge list
  * never shuffles — above it, the plain shuffle join is the right
  * posture (and the loop structure is unchanged).
  */
object PageRank {

  val Unit: Long = 1000000000L // 1.0 in nano-units

  def ranks(spark: SparkSession, pairs: DataFrame, iters: Int = 5,
            broadcastNodeLimit: Long = 4000000L): DataFrame = {
    // ONE edge materialization: the bare (s, d) list. deg(s) is loop-
    // invariant but lives in the (small, per-NODE) rank table instead
    // of being joined onto the edge list — the 2-column edge blocks are
    // the only per-round scan. (Callers with an expensive upstream pair
    // plan should checkpoint it first; the union below evaluates
    // `pairs` twice while building this checkpoint.)
    val edges = pairs.select(col("id_a").as("s"), col("id_b").as("d"))
      .union(pairs.select(col("id_b").as("s"), col("id_a").as("d")))
      .localCheckpoint(true)
    // r5 opt: deg is loop-invariant but was a LAZY plan over the edge
    // list, so every round's update join re-ran the full edge
    // aggregation inside its lineage (iters extra edge-wide passes).
    // Checkpoint the per-node degree table once.
    val deg = edges.groupBy(col("s").as("id")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    var r = deg.select(col("id"), col("deg"), lit(Unit).as("rank_nano"))
    val nodes = deg.count()
    val hint: DataFrame => DataFrame =
      if (nodes <= broadcastNodeLimit) broadcast else identity
    for (i <- 1 to iters) {
      val prev = r
      val contrib = edges
        .join(hint(r.select(col("id").as("s"), col("deg"), col("rank_nano"))), "s")
        .select(col("d").as("id"), expr("rank_nano DIV deg").as("c"))
        .groupBy("id")
        .agg(sum(col("c").cast(DecimalType(38, 0))).as("total"))
      // r5 opt: contrib is per-node too — under the same node bound it
      // broadcasts into the update join, so the round is ONE shuffle
      // (the contribution aggregate) instead of shuffle + sort-merge
      // join of two node tables; the checkpointed deg table is the
      // stream side. Per-round checkpoint still truncates lineage.
      r = deg
        .join(hint(contrib), Seq("id"), "left")
        .select(col("id"), col("deg"),
          (lit(150000000L) +
            expr("CAST(coalesce(total, 0) AS DECIMAL(38,0)) DIV 20").cast("long") * 17L)
            .as("rank_nano"))
        .localCheckpoint(true)
      // r6 (advice): drop the previous round's checkpoint cache once the
      // new table is materialized, or `iters` node-table caches stay
      // pinned for the whole loop (round 1's `r` is the uncached deg
      // projection — unpersisting it is a no-op).
      if (i > 1) prev.unpersist(blocking = false)
    }
    edges.unpersist(blocking = false)
    r.select(col("id"), col("rank_nano"))
  }
}
