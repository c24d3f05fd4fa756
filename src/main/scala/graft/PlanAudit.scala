package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named queries —
  * used to keep the posture promises (PushedFilters reach the scan,
  * dims broadcast, WholeStageCodegen spans wide). See PLANS.md.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_pricing_summary", "q3_shipping_priority", "p1_filter_isin", "j1_semi_join")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
