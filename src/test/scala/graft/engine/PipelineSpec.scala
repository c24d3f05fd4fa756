package graft.engine

import graft.SparkSpec

/** Pipeline end-to-end over the fixture corpus: every reference output
  * family must be present — core, 1:M child tables, crosswalk 1:1
  * tables, schedule-presence flags (R:2522-2620) and the FAIL_LIST
  * quarantine analogue (R:4966-5101).
  */
class PipelineSpec extends SparkSpec {

  private def fixtureDir: String = getClass.getResource("/xml").getPath

  private def concordance: Seq[ConcordanceEntry] = {
    def many(v: String, x: String) =
      ConcordanceEntry(v, x, "text", "MANY", "PART-VII-01", "PC", Nil, None)
    def one(v: String, x: String) =
      ConcordanceEntry(v, x, "text", "ONE", "PART-VII-00", "PC", Nil, None)
    Seq(
      many("DTK_NAME", "/Return/ReturnData/IRS990/Form990PartVIISectionAGrp/PersonNm"),
      many("DTK_NAME", "/Return/ReturnData/IRS990/Form990PartVIISectionA/NamePerson"),
      one("COMP_GT_150K", "/Return/ReturnData/IRS990/CompensationFromOtherSrcsInd"),
      one("NUM_GT_100K", "/Return/ReturnData/IRS990/IndivRcvdGreaterThan100KCnt"))
  }

  test("build emits core, children, 1:1 tables, presence flags and quarantine") {
    val out = Pipeline.build(spark, fixtureDir, concordance)
    assert(out.core.count() == 7)
    assert(out.children.keySet == Set("PART-VII-01"))
    assert(out.tableOnes.keySet == Set("PART-VII-00"))
    // 1:1 table: one row per document, headers + declared vars
    val t00 = out.tableOnes("PART-VII-00")
    assert(t00.count() == 7)
    assert(t00.columns.toSeq ==
      TableBuild.headerNames ++ Seq("COMP_GT_150K", "NUM_GT_100K"))
    // presence: doc 1 files Schedule N, doc 2 does not (P4 fixtures)
    val flags = out.presence.select("EIN", "SCHEDN")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(flags("100000001") && !flags("100000002"))
    assert(out.presence.columns.count(_.startsWith("SCHED")) == 16) // A..O + R
    assert(out.failed.count() == 0)
  }

  test("writeAll writes every output family, including the empty quarantine") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pipeline").toFile
    Pipeline.writeAll(Pipeline.build(spark, fixtureDir, concordance), dir.getPath)
    for (t <- Seq("core", "core238", "PART-VII-01", "PART-VII-00",
                  "schedule_presence", "failed")) {
      assert(new java.io.File(dir, t).isDirectory, s"missing $t")
    }
    // the curated core layout rides along the pipeline build
    val c238 = spark.read.parquet(s"${dir.getPath}/core238")
    assert(c238.columns.length == 237 && c238.count() == 7)
    assert(spark.read.parquet(s"${dir.getPath}/schedule_presence").count() == 7)
    // empty quarantine still reads back with its schema
    assert(spark.read.parquet(s"${dir.getPath}/failed").count() == 0)
  }

  test("writeAll csv flag writes headered CSV alongside parquet (R:5130-5163)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pipeline-csv").toFile
    Pipeline.writeAll(Pipeline.build(spark, fixtureDir, concordance), dir.getPath, csv = true)
    for (t <- Seq("core", "core238", "PART-VII-01", "schedule_presence")) {
      assert(new java.io.File(dir, s"$t.csv").isDirectory, s"missing $t.csv")
    }
    val csv = spark.read.option("header", "true").csv(s"${dir.getPath}/core238.csv")
    assert(csv.columns.length == 237 && csv.count() == 7)
  }
}
