package graft.engine

import graft.SparkSpec

/** The engine must digest the complete 9,731-row master crosswalk —
  * the exact artifact a reference user would bring — and drive
  * extraction from it with no hand-written code.
  */
class MasterConcordanceSpec extends SparkSpec {

  private val masterPath = "/root/reference/MASTER_CONCORDANCE_V0.csv"

  private lazy val master: Seq[ConcordanceEntry] = {
    assume(new java.io.File(masterPath).isFile, "reference checkout not present")
    Concordance.readCsv(spark, masterPath)
  }

  test("parses all master rows with the V0 dialect (FORM-PART as table key)") {
    assert(master.size > 9000, s"got ${master.size}")
    assert(master.forall(_.xpath.startsWith("/Return")))
    assert(master.exists(_.rdbTable.startsWith("F9-PART-")))
  }

  test("sparse schema over the full master crosswalk builds and is deep") {
    val schema = SchemaBuild.sparseSchema(master)
    val returnData = schema("ReturnData").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    // master spans 990/EZ/PF + schedules — the pruned tree is wide at
    // ReturnData but still only declared subtrees
    assert(returnData.size > 10, s"ReturnData children: ${returnData.size}")
    assert(returnData.fieldNames.contains("IRS990"))
  }

  test("master-driven extraction: GROSSRECEIPTS variable extracts from fixtures") {
    val gr = master.filter(e =>
      e.xpath == "/Return/ReturnData/IRS990/GrossReceiptsAmt" ||
        e.xpath == "/Return/ReturnData/IRS990/GrossReceipts")
    assume(gr.nonEmpty, "master lacks the gross-receipts xpaths")
    val varName = gr.head.variable
    val variants = master.filter(_.variable == varName).map(_.xpath)
    val parsed = Ingest.readReturns(spark, getClass.getResource("/xml").getPath)
    val got = parsed.select(
        TableBuild.headerCols(parsed).head, // EIN
        Extract.scalar(parsed, variants).as(varName))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("100000001") == "500000")
  }

  test("990PF scope: master-driven AFS table extracts from the PF fixture") {
    val afs = master.filter(e => e.scope == "PF" &&
      e.xpath.startsWith("/Return/ReturnData/AccountingFeesSchedule/"))
    assume(afs.nonEmpty)
    val table = afs.head.rdbTable
    val parsed = Ingest.readReturns(spark, getClass.getResource("/xml").getPath)
    val t = TableBuild.oneToOne(parsed, master, table)
    // era-split variables: pre-2013 AccountingFees/Category vs 2013+
    // AccountingFeesDetail/CategoryTxt — each fixture era feeds its own
    val preVar = master.find(e => e.rdbTable == table &&
      e.xpath.endsWith("AccountingFees/Category")).get.variable
    val postVar = master.find(e => e.rdbTable == table &&
      e.xpath.endsWith("AccountingFeesDetail/CategoryTxt")).get.variable
    val byEin = t.collect().map(r => r.getAs[String]("EIN") -> r).toMap
    // declared-ONE policy over a repeated group: first occurrence
    assert(byEin("100000005").getAs[String](postVar) == "AUDIT")
    assert(byEin("100000007").getAs[String](preVar) == "BOOKKEEPING")
  }

  test("era-variant xpaths of one master variable resolve by coalesce across fixtures") {
    // find a variable with BOTH a pre-2013 and post-2013 spelling that
    // our fixtures carry: the 990 name line
    val nameVars = master.filter(_.xpath.contains("BusinessNameLine1"))
    assert(nameVars.nonEmpty)
  }

  test("FULL master-driven core: every F9 variable as one 2,300+-column projection") {
    val parsed = Ingest.readReturns(spark, getClass.getResource("/xml").getPath)
    val t0 = System.nanoTime()
    val core = TableBuild.wideTable(parsed, master, _.startsWith("F9-PART-"))
    val rows = core.collect()
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"width=${core.columns.length} plan+exec=${sec}%.1fs")
    assert(core.columns.length > 2000, s"got ${core.columns.length}")
    assert(rows.length == 7)
    val grVar = master.find(_.xpath == "/Return/ReturnData/IRS990/GrossReceiptsAmt").get.variable
    val alpha = rows.find(_.getAs[String]("EIN") == "100000001").get
    assert(alpha.getAs[String](grVar) == "500000")
  }

  test("master-driven WIDE table: F9-PART-00 builds as one projection") {
    val parsed = Ingest.readReturns(spark, getClass.getResource("/xml").getPath)
    val t = TableBuild.oneToOne(parsed, master, "F9-PART-00")
    val varCols = t.columns.filterNot(TableBuild.headerNames.contains)
    assert(varCols.length >= 90, s"part-00 width from master: ${varCols.length}")
    assert(t.count() == 7)
    // spot value through the metadata path
    val grVar = master.find(_.xpath == "/Return/ReturnData/IRS990/GrossReceiptsAmt")
    grVar.foreach { e =>
      val got = t.filter(org.apache.spark.sql.functions.col("EIN") === "100000001")
        .select(e.variable).head().getString(0)
      assert(got == "500000")
    }
  }
}
