package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries from SparkEntry against a given sf dir.
  * Usage: runMain graft.QueryTime <sfDir> <name...> (no names = all).
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: file listing/footers off the timed path; the streaming-
    // engine warmup (~3 s) only when a streaming query is being timed
    Warmup.run(spark, sfDir,
      streaming = names.exists(_.matches("ev\\d+s_.*")))
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[qt] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$cnt")
    }
    spark.stop()
  }
}
