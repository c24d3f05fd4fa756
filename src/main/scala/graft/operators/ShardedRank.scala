package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftinterop.ColumnInterop

/** Global `row_number()` over a total order WITHOUT an unpartitioned
  * window — the distributed ranking shape every vocabulary-scale
  * consumer (t15/t18/t21) needs at web-corpus size, where the ranked
  * set (10M+ distinct terms) cannot flow through one task.
  *
  * Mechanics (same two-phase trick as c4/c7's prefix sums, but with
  * RANGE sharding because the sort key here isn't a hash we can
  * prefix):
  *
  *  1. Shard boundaries are computed EXPLICITLY from a deterministic
  *     hash-sample of the order keys (collected to the driver, sorted,
  *     evenly spaced) — not from `repartitionByRange`'s random-seeded
  *     sampler. The shard id is then a pure EXPRESSION of the row's
  *     key values, so every re-evaluation of the plan assigns the same
  *     shard to the same row and the offset table can never misalign
  *     with the local ranks (the a43 nondeterminism class). This
  *     replaces the r4 fix — an eager full-width `localCheckpoint` of
  *     the ranged stage — with a checkpoint-free plan: the only extra
  *     work is one count + one column-pruned sample scan (both served
  *     from the persisted input), instead of writing every column of
  *     the ranked set to block storage.
  *  2. A PARTITIONED window (`partitionBy(__shard)`) computes local
  *     row numbers — parallel across shards.
  *  3. Per-shard counts prefix-sum into offsets; the only
  *     unpartitioned window runs over the SHARD-COUNT table (at most
  *     `shards` rows — bounded by configuration, not by data), which
  *     then broadcasts back onto the sharded rows.
  *
  * Requires the `order` key to be a total order (no ties across rows)
  * — true for (freq DESC, term) after a term-level aggregation —
  * otherwise rank assignment inside a shard would be ambiguous.
  * Boundary quality affects only shard BALANCE, never rank values: an
  * empty sample degrades to one shard, still correct.
  *
  * Caching contract: the input (and, for [[withRanks]], each level's
  * accumulator) is `persist()`ed and NOT unpersisted — the persisted
  * frame feeds the boundary sample, the offsets aggregate, and the
  * windowed pass, all of which execute after this method returns.
  * Long-lived sessions issuing many rankings should
  * `spark.catalog.clearCache()` between queries (Bench does).
  */
object ShardedRank {

  /** Adds `rankCol` (LongType, 1-based, dense global row_number in
    * `order`) to `df`. `shards` defaults to the session shuffle
    * parallelism.
    */
  def withRank(df: DataFrame, rankCol: String, order: Column*): DataFrame =
    twoPhase(df, order, count(lit(1)), row_number().over(_).cast("long"), rankCol)

  /** Adds `outCol` = the global INCLUSIVE prefix sum of `value` in
    * `order` — the other consumer of the same sharded discipline
    * (c41's systematic resampler, a186's weight line): per-shard
    * running sums plus broadcast shard offsets, no unpartitioned
    * window over the data.
    */
  def withPrefixSum(df: DataFrame, outCol: String, value: Column,
                    order: Column*): DataFrame =
    twoPhase(df, order, sum(value), w => sum(value).over(w), outCol)

  /** Several global rankings over the SAME input (the RFM shape:
    * recency/frequency/monetary quintiles each need their own total
    * order) sharing ONE persisted base and ONE count. A fold of
    * `withRank` calls pays a cache materialization + count per level —
    * at corpus scale that is k extra passes for k rankings; here the
    * per-level work is exactly the intrinsic part (one boundary
    * sample, one shuffle + partitioned window, one broadcast offsets
    * join), with the offsets aggregated from the narrow persisted base
    * rather than the widening accumulator.
    */
  def withRanks(df: DataFrame, specs: (String, Seq[Column])*): DataFrame = {
    if (specs.isEmpty) return df
    val input = df.persist()
    val n = input.count()
    specs.zipWithIndex.foldLeft(input: DataFrame) {
      case (acc0, ((rankCol, order), i)) =>
        // each level's accumulator persists too (lazily — materialized
        // by its own window pass), or level k would re-execute all k-1
        // earlier window shuffles inside its lineage; what the shared
        // base saves vs chained withRank is the per-level count job
        // and the offsets aggregation over the widening frame
        val acc = if (i == 0) acc0 else acc0.persist()
        val keys = order.map(parse)
        val shardCol = s"__shard$i"
        val shardExpr = shardExprFor(input, n, keys)
        val offsets = input.withColumn(shardCol, shardExpr)
          .groupBy(col(shardCol)).agg(count(lit(1)).as("__cnt"))
          .withColumn("__off", coalesce(sum(col("__cnt")).over(
            Window.orderBy(col(shardCol))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col(shardCol), col("__off"))
        val wLocal = Window.partitionBy(col(shardCol)).orderBy(order: _*)
        acc.withColumn(shardCol, shardExpr)
          .withColumn("__lacc", row_number().over(wLocal).cast("long"))
          .join(broadcast(offsets), shardCol)
          .withColumn(rankCol, col("__off") + col("__lacc"))
          .drop(shardCol, "__lacc", "__off")
    }
  }

  /** Shared two-phase shape: deterministic shard assignment, a local
    * windowed accumulator per shard, per-shard totals prefix-summed
    * into broadcast offsets. `perShard` aggregates one shard's total
    * contribution; `localOver` accumulates within a shard.
    */
  private def twoPhase(df: DataFrame, order: Seq[Column],
                       perShard: Column,
                       localOver: org.apache.spark.sql.expressions.WindowSpec => Column,
                       outCol: String): DataFrame = {
    val sharded = withShard(df, order)
    val wLocal = Window.partitionBy(col("__shard")).orderBy(order: _*)
    val local = sharded.withColumn("__lacc", localOver(wLocal))
    // Offsets: one row per non-empty shard; the unpartitioned window is
    // bounded by `shards`, never by the data.
    val wShard = Window.orderBy(col("__shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy(col("__shard")).agg(perShard.as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wShard), lit(0L)))
      .select(col("__shard"), col("__off"))
    local.join(broadcast(offsets), "__shard")
      .withColumn(outCol, col("__off") + col("__lacc"))
      .drop("__shard", "__lacc", "__off")
  }

  /** Deterministic shard assignment: explicit boundaries from a
    * hash-sample of the order keys, applied as a pure expression of
    * the row's key values.
    */
  private def withShard(df: DataFrame, order: Seq[Column]): DataFrame = {
    val keys = order.map(parse)
    // persist is a PERF hint only (one computation of an expensive
    // upstream feeds count + sample + both downstream branches);
    // correctness survives eviction/recompute because the shard id is
    // a deterministic function of the row's key values
    val input = df.persist()
    val n = input.count()
    input.withColumn("__shard", shardExprFor(input, n, keys))
  }

  /** The shard-id expression for one ranking: sample boundaries from
    * `input` (expected persisted; the sample is a column-pruned cache
    * scan), return a pure expression of the key values usable on ANY
    * frame carrying those key columns.
    */
  private def shardExprFor(input: DataFrame, n: Long,
                           keys: Seq[(Column, Boolean, Boolean)]): Column = {
    val shards = input.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "32").toInt
    val keyCols = keys.map(_._1)
    val m = math.max(1L, n / (shards.toLong * 64)) // ~64 samples per shard
    val sampled = input
      .filter(pmod(xxhash64(keyCols: _*), lit(m)) === 0)
      .select(keyCols: _*)
      .collect()
      .map(r => keys.indices.map(r.get))
    val ord = new Ordering[Seq[Any]] {
      def compare(a: Seq[Any], b: Seq[Any]): Int =
        keys.indices.iterator
          .map(i => cmpVal(a(i), b(i), keys(i)._2, keys(i)._3))
          .find(_ != 0).getOrElse(0)
    }
    val sorted = sampled.sorted(ord)
    val boundaries: Seq[Seq[Any]] =
      if (sorted.isEmpty) Seq.empty
      else (1 until shards)
        .map(i => sorted(((i.toLong * sorted.length) / shards).toInt))
        .distinct
    if (boundaries.isEmpty) lit(0)
    else boundaries.map(b => when(geBoundary(keys, b), 1).otherwise(0))
      .reduce(_ + _)
  }

  /** (key expression, ascending, nulls-first) from a possibly
    * `.asc`/`.desc`-wrapped Column — read off the ColumnNode via the
    * graftinterop bridge (the converters are private[sql] in Spark 4).
    */
  private def parse(c: Column): (Column, Boolean, Boolean) =
    ColumnInterop.parseOrder(c)

  /** Driver-side comparator matching Spark's sort semantics for one
    * level: direction + explicit null ordering.
    */
  private def cmpVal(a: Any, b: Any, asc: Boolean, nullsFirst: Boolean): Int =
    (a == null, b == null) match {
      case (true, true)  => 0
      case (true, false) => if (nullsFirst) -1 else 1
      case (false, true) => if (nullsFirst) 1 else -1
      case _ =>
        val c = a.asInstanceOf[Comparable[Any]].compareTo(b)
        if (asc) c else -c
    }

  /** Row key tuple sorts at-or-after the boundary tuple (lexicographic
    * over the order levels, honoring direction and null ordering).
    */
  private def geBoundary(keys: Seq[(Column, Boolean, Boolean)],
                         b: Seq[Any]): Column = {
    def lvlGt(k: Column, v: Any, asc: Boolean, nullsFirst: Boolean): Column =
      if (v == null) {
        if (nullsFirst) k.isNotNull // null smallest: any value sorts after it
        else lit(false)             // null largest: nothing sorts after it
      } else {
        val cmp = if (asc) k > lit(v) else k < lit(v)
        if (nullsFirst) cmp         // null k → null → false under when()
        else k.isNull || cmp        // null k sorts after every value
      }
    def lvlEq(k: Column, v: Any): Column =
      if (v == null) k.isNull else k === lit(v)
    def ge(i: Int): Column =
      if (i == keys.length) lit(true)
      else {
        val (k, asc, nf) = keys(i)
        lvlGt(k, b(i), asc, nf) || (lvlEq(k, b(i)) && ge(i + 1))
      }
    ge(0)
  }
}
