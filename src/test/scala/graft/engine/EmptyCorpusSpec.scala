package graft.engine

import graft.SparkSpec

/** Degenerate-corpus operational pins: a year partition with no
  * filings yet (the refresh loop's day-one state) and a corpus where
  * EVERY document is malformed (a bad upstream drop). Both must build
  * cleanly — empty tables and a complete fail list respectively —
  * because at 100 TB the pipeline runs per-year/per-partition and the
  * empty and all-bad partitions are routine, not exceptional.
  */
class EmptyCorpusSpec extends SparkSpec {

  test("zero-document corpus: build completes with every table empty, writeAll still writes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-corpus")
    val out = Pipeline.build(spark, dir.toString, EngineBench.demoConcordance)
    assert(out.core.count() == 0)
    assert(out.core238.count() == 0)
    assert(out.presence.count() == 0)
    assert(out.failed.count() == 0)
    out.children.foreach { case (t, df) => assert(df.count() == 0, s"child $t not empty") }
    out.tableOnes.foreach { case (t, df) => assert(df.count() == 0, s"1:1 $t not empty") }
    // the sink contract holds on emptiness: every table directory
    // exists and reads back as zero rows (downstream jobs glob these)
    val outDir = java.nio.file.Files.createTempDirectory("graft-empty-out")
    Pipeline.writeAll(out, outDir.toString)
    assert(spark.read.parquet(s"$outDir/core").count() == 0)
    assert(spark.read.parquet(s"$outDir/failed").count() == 0)
  }

  test("all-corrupt corpus: every document quarantines, clean tables empty, build completes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-allbad-corpus")
    val n = 20
    val salted = EngineBench.genCorpus(dir.toString, n, saltEvery = 1) // every doc truncated
    assert(salted == n)
    val out = Pipeline.build(spark, dir.toString, EngineBench.demoConcordance)
    assert(out.failed.count() == n.toLong, "every malformed doc must reach the fail list")
    assert(out.core.count() == 0, "no malformed doc may leak into core")
    assert(out.presence.count() == 0)
  }
}
