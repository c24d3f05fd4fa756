package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Layout guard for the r5 "Class 1" scan-stage parallelization sites
  * (r6 optimization round): a single-file / one-row-group input scans
  * as ONE task, so any heavy projection before the first exchange
  * serializes on one core. The r5 round fixed that with unconditional
  * `repartition(defaultParallelism, key)` at seven query sites; this
  * helper gives those sites the same guard the operator-level fixes
  * (IvfIndex.spread, JaccardJoin.stage) already had:
  *
  *  - when the plan already scans with parallelism (any production
  *    multi-row-group layout: partitions x 2 >= defaultParallelism),
  *    the extra exchange is skipped entirely;
  *  - `spark.graft.spread=off` disables it outright — the interleaved
  *    same-JVM A/B switch (GRAFT_OPT_ALTCONF) used to prove the
  *    exchange is a win at full core count, per the r5 verdict.
  *
  * Keys must make the downstream computation partition-invariant
  * (true at every call site: integer sums, per-row projections, or a
  * window keyed on the same column).
  */
object Spread {
  def by(df: DataFrame, key: Column): DataFrame = {
    val sess = df.sparkSession
    if (sess.conf.get("spark.graft.spread", "on") == "off") return df
    val p = sess.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions * 2 >= p) df
    else df.repartition(p, key)
  }
}
