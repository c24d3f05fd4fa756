package graft

import org.apache.spark.sql.SparkSession

/** Local smoke of the driver's t1 contract: SparkEntry.entry(spark) on
  * sf0.001 must return rows > 0. Exits nonzero otherwise.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(20, truncate = false)
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
