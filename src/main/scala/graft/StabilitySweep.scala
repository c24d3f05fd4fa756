package graft

import org.apache.spark.sql.SparkSession

/** Partitioning-invariance audit: every registered batch query runs
  * TWICE — once at the session defaults (32 shuffle partitions,
  * default scan splits) and once with a deliberately different
  * physical layout (7 shuffle partitions, 256 KB scan splits) — and
  * the two result sets must be IDENTICAL, bit for bit.
  *
  * Why this matters more than the oracle gate alone: the DuckDB
  * compare proves the values are right under ONE partitioning. A
  * 1000-executor cluster re-partitions everything — different split
  * boundaries, different shuffle fan-in, different per-partition
  * accumulation order. Any float summed in arrival order, any
  * `first`/tie-broken-by-partition pick, any sampled boundary that
  * feeds values (the a43 class this repo's ShardedRank redesign
  * removed) produces answers that CHANGE with the cluster width. This
  * sweep is the mechanical check that none do: the repo's discipline
  * (DECIMAL-quantized sums, total-order ranks, deterministic shard
  * boundaries) is asserted over the whole surface, not per-query.
  *
  * Streaming-staged queries (ev*s) are skipped: their results are
  * micro-batch-sliced by design and their determinism contract
  * (merge associativity) is pinned by the streaming specs instead.
  *
  * Usage: runMain graft.StabilitySweep [sfDir] [query...]
  */
object StabilitySweep {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only: Set[String] = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val skip = "ev\\d+s_.*".r
    var audited = 0
    val diffs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val errors = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val wanted = (only.isEmpty || only(name)) && skip.findFirstIn(name).isEmpty
      if (wanted) {
        try {
          val d = check(spark, fn, sfDir)
          audited += 1
          d.foreach(detail => diffs += name -> detail)
        } catch {
          case e: Throwable => errors += name -> String.valueOf(e.getMessage).take(120)
        }
      }
    }
    println(s"\n[stability] audited=$audited diffs=${diffs.size} errors=${errors.size}")
    diffs.foreach { case (q, d) => println(s"[stability] DIFF $q :: $d") }
    errors.foreach { case (q, m) => println(s"[stability] ERROR $q :: $m") }
    spark.stop()
  }

  /** One query under both layouts; Some(detail) when the two result
    * sets differ. Public so StabilitySweepDetectorSpec can prove the
    * harness DETECTS layout dependence (a conf that silently stopped
    * applying would make the whole sweep vacuously green).
    */
  def check(spark: SparkSession,
            fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            sfDir: String): Option[String] = {
    val a = canon(fn(spark, sfDir))
    spark.catalog.clearCache()
    val beforeParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "262144")
    val b =
      try canon(fn(spark, sfDir))
      finally {
        spark.conf.set("spark.sql.shuffle.partitions", beforeParts)
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        spark.catalog.clearCache()
      }
    if (a == b) None
    else {
      val firstDiff = a.zip(b).indexWhere { case (x, y) => x != y }
      Some(
        if (a.length != b.length) s"rows ${a.length} vs ${b.length}"
        else s"row $firstDiff: ${a(firstDiff).take(120)} vs ${b(firstDiff).take(120)}")
    }
  }

  /** Canonical sorted row-string form; Double/Float stringify uniquely
    * per bit pattern, so string equality is bit equality.
    */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect()
      .map(_.toSeq.map {
        case null => "\u0000"
        case a: Array[_] => a.mkString("[", ",", "]")
        case v => v.toString
      }.mkString("\u0001"))
      .sorted.toSeq
}
