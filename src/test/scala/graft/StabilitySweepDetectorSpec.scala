package graft

import org.apache.spark.sql.functions._

/** Differ-detects meta-test for the partitioning-invariance sweep: if
  * the second layout's confs silently stopped applying (or the canon
  * compare regressed), every query would trivially "pass" — so a
  * deliberately layout-dependent query must DIFF, and a registered
  * conventional query must not. Same rationale as
  * PlanSweepDetectorSpec, which caught exactly this class of dead
  * detector in the plan sweep.
  */
class StabilitySweepDetectorSpec extends SparkSpec {

  test("a layout-dependent query diffs between the two layouts") {
    // The vacuity risk in this harness is the harness itself: if the
    // second layout's confs silently stopped being applied, or the
    // canon compare stopped comparing, everything would pass. A probe
    // that EMITS the layout confs proves both in one shot: run A and
    // run B must see different values, and the compare must flag it.
    // (A pure Spark-level probe is not constructible at test scale:
    // AQE coalesces the tiny 4-vs-7 shuffle contrast to one partition,
    // and the 256 KB scan-split lever is absorbed by single-row-group
    // files — so the detectable difference IS the conf visibility.)
    val probe = (s: org.apache.spark.sql.SparkSession, d: String) =>
      s.range(1).toDF("id").select(
        lit(s.conf.get("spark.sql.shuffle.partitions")).as("parts"),
        lit(s.conf.getOption("spark.sql.files.maxPartitionBytes")
          .getOrElse("unset")).as("split"))
    assert(StabilitySweep.check(spark, probe, sf()).isDefined,
      "the sweep failed to apply/compare the second layout's confs")
  }

  test("a registered conventional query does not diff") {
    assert(StabilitySweep.check(spark, SparkEntry.queries("q1_pricing_summary"), sf()).isEmpty)
  }
}
