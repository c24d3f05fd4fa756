package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global `row_number()` over a total order WITHOUT an unpartitioned
  * window — the distributed ranking shape every vocabulary-scale
  * consumer (t15/t18/t21) needs at web-corpus size, where the ranked
  * set (10M+ distinct terms) cannot flow through one task.
  *
  * Mechanics (same two-phase trick as c4/c7's prefix sums, but with
  * RANGE sharding because the sort key here isn't a hash we can
  * prefix):
  *
  *  1. `repartitionByRange(shards, key...)` — every key in shard i
  *     sorts before every key in shard i+1, so shard-major order IS
  *     the global order. The exchange is one extra shuffle of the
  *     (small, pre-aggregated) ranked set, not of the corpus.
  *  2. A PARTITIONED window (`partitionBy(shard)`) computes local
  *     row numbers — parallel across shards.
  *  3. Per-shard counts prefix-sum into offsets; the only
  *     unpartitioned window runs over the SHARD-COUNT table (at most
  *     `shards` rows — bounded by configuration, not by data), which
  *     then broadcasts back onto the sharded rows.
  *
  * Requires the `order` key to be a total order (no ties across rows)
  * — true for (freq DESC, term) after a term-level aggregation —
  * otherwise rank assignment at shard boundaries would be ambiguous.
  * Range bounds come from Spark's sampling; they affect only WHERE
  * shard boundaries fall, never the rank values themselves.
  */
object ShardedRank {

  /** Adds `rankCol` (LongType, 1-based, dense global row_number in
    * `order`) to `df`. `shards` defaults to the session shuffle
    * parallelism.
    */
  def withRank(df: DataFrame, rankCol: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val shards = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // localCheckpoint pins the sampled range boundaries: `ranged`
    // feeds both the local row_numbers and the offset table, and the
    // range partitioner samples from nondeterministically-ordered
    // shuffle output — two evaluations may place boundaries
    // differently, which would misalign offsets against local ranks
    // (observed in the a42/a43 prefix-sum twins at sf0.1).
    val ranged = df.repartitionByRange(shards, order: _*)
      .withColumn("__shard", spark_partition_id())
      .localCheckpoint(true)
    val wLocal = Window.partitionBy(col("__shard")).orderBy(order: _*)
    val local = ranged.withColumn("__lrn", row_number().over(wLocal).cast("long"))
    // Offsets: one row per non-empty shard; the unpartitioned window is
    // bounded by `shards`, never by the data.
    val wShard = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__shard")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wShard), lit(0L)))
      .select(col("__shard"), col("__off"))
    local.join(broadcast(offsets), "__shard")
      .withColumn(rankCol, col("__off") + col("__lrn"))
      .drop("__shard", "__lrn", "__off")
  }
}
