package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-salting for equi-joins — the manual complement to AQE
  * skew handling, for when the hot keys are known or detectable (e.g.
  * stopword tokens in similarity joins, celebrity users in event
  * streams).
  *
  * Left (large, skewed) side: each row gets a random-but-deterministic
  * salt in [0, buckets). Right (smaller) side: each row is replicated
  * `buckets` times, once per salt value. Joining on (key, salt) splits
  * one hot key's row group across `buckets` reducers. Join results are
  * identical to the unsalted join (every left row still meets every
  * matching right row exactly once).
  */
object SaltedJoin {

  /** Deterministic pseudo-random salt from arbitrary columns (stable
    * across retries/re-plans — required for reproducible output).
    */
  def salt(buckets: Int, seedCols: Column*): Column =
    pmod(xxhash64(seedCols: _*), lit(buckets.toLong)).cast("int")

  def innerSalted(left: DataFrame, right: DataFrame, key: String,
                  buckets: Int, leftSeed: Seq[String]): DataFrame = {
    require(buckets > 0)
    val l = left.withColumn("__salt", salt(buckets, leftSeed.map(left(_)): _*))
    val r = right
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
