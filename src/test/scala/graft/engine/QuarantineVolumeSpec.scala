package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quarantine at VOLUME (r4 verdict ask #7): the per-quirk classes are
  * proven by AdversarialXmlSpec; this exercises the FAIL_LIST contract
  * over a salted corpus — ~1% of 2,000 generated returns truncated —
  * and asserts the build COMPLETES with the quarantine table matching
  * the salt exactly: same count, same file set, no malformed rows
  * leaking into any derived table (the reference retries/skips
  * FAIL_LIST docs, never emits them,
  * `build_efile_database_functions.R:5047-5101`).
  */
class QuarantineVolumeSpec extends SparkSpec {

  test("1%-salted 2k-doc corpus: build completes, FAIL_LIST == salt set") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quarantine-vol")
    val n = 2000
    val saltEvery = 100
    val salted = EngineBench.genCorpus(dir.toString, n, saltEvery)
    assert(salted == n / saltEvery)

    val out = Pipeline.build(spark, dir.toString, EngineBench.demoConcordance)

    // the quarantine table IS the salt set — by name, not just count
    val failedFiles = out.failed.select(col("source_url")).collect()
      .map(r => new java.io.File(new java.net.URI(r.getString(0)).getPath).getName)
      .toSet
    val expected = (0 until n)
      .filter(i => i % saltEvery == saltEvery - 1)
      .map(i => f"${100000000L + i}%09d_public.xml")
      .toSet
    assert(failedFiles == expected,
      s"quarantine mismatch: extra=${failedFiles -- expected} missing=${expected -- failedFiles}")

    // no quarantined document leaks into the clean tables, and every
    // clean document arrives: core has exactly n - salted rows with
    // exactly the non-salted EINs at the boundary positions
    assert(out.core.count() == (n - salted).toLong)
    val coreEins = out.core.select(col("EIN")).collect().map(_.getString(0)).toSet
    assert(!coreEins.contains(f"${100000000L + saltEvery - 1}%09d")) // salted
    assert(coreEins.contains(f"${100000000L + saltEvery}%09d"))      // clean neighbor
    // child + presence tables build only from clean parses
    assert(out.presence.count() == (n - salted).toLong)

    // FAIL_LIST at volume: joining the quarantine back to a synthetic
    // index returns exactly the salted docs' index rows (the
    // reference's FAIL_LIST.csv shape), none of the clean ones
    import spark.implicits._
    val index = (0 until n).map { i =>
      val ein = f"${100000000L + i}%09d"
      (ein, "201412", "990", s"https://s3/${ein}_public.xml", s"ORG $i", ein)
    }.toDF("EIN", "TaxPeriod", "FormType", "URL", "OrganizationName", "ObjectId")
    val fl = Ingest.failList(index, out.failed)
    val flEins = fl.select(col("EIN")).collect().map(_.getString(0)).toSet
    val expectedEins = (0 until n).filter(i => i % saltEvery == saltEvery - 1)
      .map(i => f"${100000000L + i}%09d").toSet
    assert(flEins == expectedEins,
      s"failList mismatch: extra=${flEins -- expectedEins} missing=${expectedEins -- flEins}")
    assert(fl.columns.toSet == index.columns.toSet)
  }
}
