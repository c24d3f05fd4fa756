package graft.engine

import graft.SparkSpec

/** Compatibility with the reference's REAL concordance CSVs (read-only
  * inputs from /root/reference, same format a reference user would
  * bring): the metadata layer must digest all 328 rows and the table
  * builders must run against our fixture corpus driven purely by that
  * metadata — no hand-written extraction code.
  */
class RealConcordanceSpec extends SparkSpec {

  private val refDir = new java.io.File("/root/reference/BUILD_SCRIPTS")

  private def loadRef(name: String): Seq[ConcordanceEntry] = {
    assume(refDir.isDirectory, "reference checkout not present")
    Concordance.readCsv(spark, new java.io.File(refDir, name).getPath)
  }

  test("parses all 207 Part VII rows with normalized names") {
    val entries = loadRef("ConcordancePartVII.csv")
    assert(entries.size >= 200)
    assert(entries.forall(e => e.variable == e.variable.toUpperCase))
    assert(entries.forall(e => e.xpath.startsWith("/Return/")))
  }

  test("groupPaths on the real DTK table finds both era group spellings") {
    val entries = loadRef("ConcordancePartVII.csv")
    val groups = Concordance.groupPaths(entries, "F9-P07-TABLE-01-DTK-COMPENSATION")
    val names = groups.map(_.last).toSet
    assert(names.contains("Form990PartVIISectionAGrp"))
    assert(names.contains("Form990PartVIISectionA"))
  }

  test("varMap maps era leaf spellings of the same variable together") {
    val entries = loadRef("ConcordancePartVII.csv")
    val vmap = Concordance.varMap(entries, "F9-P07-TABLE-01-DTK-COMPENSATION")
    assert(vmap("PersonNm") == vmap("NamePerson"),
      "both era leaves must map to one canonical variable")
  }

  test("oneToMany driven by the REAL concordance builds the DTK table from fixtures") {
    val entries = loadRef("ConcordancePartVII.csv")
    val parsed = Ingest.readReturns(spark, getClass.getResource("/xml").getPath)
    val dtk = TableBuild.oneToMany(parsed, entries, "F9-P07-TABLE-01-DTK-COMPENSATION")
    val nameVar = Concordance.varMap(entries, "F9-P07-TABLE-01-DTK-COMPENSATION")("PersonNm")
    val rows = dtk.select("EIN", nameVar).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.length == 4, s"2 members x 2 PC docs, got ${rows.length}")
    assert(rows.contains(("100000001", "JANE DOE")))  // post-2013 era
    assert(rows.contains(("100000002", "JOHN SMITH"))) // pre-2013 era
  }

  test("contractor table (5 era spellings, one at extra depth) from the REAL crosswalk") {
    val entries = loadRef("ConcordancePartVII.csv")
    val parsed = Ingest.readReturns(spark, getClass.getResource("/xml").getPath)
    val t = TableBuild.oneToMany(parsed, entries, "F9-P07-TABLE-02-CONTXR-COMPENSATION")
    val vmap = Concordance.varMap(entries, "F9-P07-TABLE-02-CONTXR-COMPENSATION")
    val comp = vmap("CompensationAmt")
    val biz = vmap("BusinessNameLine1")
    val person = vmap("PersonNm")
    val rows = t.select(org.apache.spark.sql.functions.col("EIN"),
        org.apache.spark.sql.functions.col(biz),
        org.apache.spark.sql.functions.col(person),
        org.apache.spark.sql.functions.col(comp)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(rows == Set(
      ("100000001", "ACME CLEANING LLC", null, "150000"),   // ContractorCompensationGrp era
      ("100000001", "BRIGHT AUDIT LLP", null, "110000"),
      ("100000002", "OLDTIME LEGAL PC", null, "80000"),     // SectionB-wrapped era (sunk prefix)
      ("100000002", "CLASSIC BOOKS CPA", null, "70000"),
      ("100000003", null, "SOLO PLUMBER", "60000")))        // EZ era
  }

  test("Sched J 1:M compensation table from the REAL crosswalk spans both eras") {
    val entries = loadRef("ConcordanceSchedJ.csv")
    val parsed = Ingest.readReturns(spark, getClass.getResource("/xml").getPath)
    val t01 = TableBuild.oneToMany(parsed, entries, "SJ-P02-T01-COMPENSATION")
    val vmap = Concordance.varMap(entries, "SJ-P02-T01-COMPENSATION")
    val nameVar = vmap("PersonNm")
    val baseVar = vmap("BaseCompensationFilingOrgAmt")
    assert(vmap("NamePerson") == nameVar, "era leaves map to one variable")
    assert(vmap("BaseCompensationFilingOrg") == baseVar)
    val rows = t01.select("EIN", nameVar, baseVar).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows == Set(
      ("100000001", "JANE DOE", "100000"),   // post-2013 era group
      ("100000001", "SAM CFO", "90000"),
      ("100000002", "JOHN SMITH", "45000"))) // pre-2013 era group
  }

  test("Sched J concordance: 1:1 checklist table builds (sparse corpus, fixed schema)") {
    val entries = loadRef("ConcordanceSchedJ.csv")
    val parsed = Ingest.readReturns(spark, getClass.getResource("/xml").getPath)
    val t00 = TableBuild.oneToOne(parsed, entries, "SJ-P01-T00-CHECKLIST")
    // fixtures carry no Schedule J → all-variable columns exist, all null
    val varCols = t00.columns.filterNot(TableBuild.headerNames.contains)
    assert(varCols.length >= 20, s"expected the full checklist width, got ${varCols.length}")
    assert(t00.count() == 7)
  }
}
