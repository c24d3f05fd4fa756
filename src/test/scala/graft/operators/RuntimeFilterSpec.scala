package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime re-optimization features the 100 TB posture leans on, pinned
  * by plan assertion so a Spark upgrade or conf drift can't silently
  * disable them:
  *
  *  - **Runtime Bloom-filter join pruning**: when a shuffle join's
  *    build side is small and selective, Catalyst injects a
  *    `BloomFilterMightContain` onto the probe side's scan, discarding
  *    non-joining rows BEFORE the shuffle — at scale this is the
  *    difference between shuffling 100 TB and shuffling the matching
  *    fraction.
  *  - **AQE skew-join splitting**: a skewed shuffle partition is split
  *    into advisory-sized slices at runtime (the automatic counterpart
  *    of the manual `SaltedJoin`); the final adaptive plan marks the
  *    join `isSkewJoin=true`.
  *
  * Both run with per-test conf set/restore against the shared session.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs[T](confs: (String, String)*)(body: => T): T = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
      // parquet relations (with stats) — the injection rule keys off scans
      (1L to 100000L).toDF("k").withColumn("payload", col("k") * 2)
        .write.mode("overwrite").parquet(s"$dir/fact")
      (1L to 50L).toDF("k").write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("k") % 5 === 0)
      val joined = fact.join(dim, "k")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"no bloom filter injected:\n$plan")
      assert(joined.count() == 10) // 50/5 matching keys, one fact row each
    }
  }

  test("AQE splits a skewed join partition (isSkewJoin in the final plan)") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "24KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "24KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // one hot key (~90% of rows) + a uniform tail
      val left = spark.range(0, 200000)
        .select(when(col("id") % 10 =!= 0, 0L).otherwise(col("id")).as("k"),
          concat(lit("x"), col("id")).as("pad"))
      val right = (0L to 20L).toDF("k").withColumn("r", col("k") + 1)
      val joined = left.join(right, "k")
      // execute THIS DataFrame's own queryExecution (count() would plan
      // and run a separate aggregate query, leaving this one unexecuted
      // and its adaptive plan non-final)
      // 180,001 rows join k=0 (the hot key) + one row each for k=10, 20
      assert(joined.collect().length == 180003)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isSkewJoin=true") || finalPlan.contains("skew=true"),
        s"no skew-join split in the final adaptive plan:\n$finalPlan")
    }
  }
}
