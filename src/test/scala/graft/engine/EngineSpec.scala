package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** End-to-end engine tests over the seven canonical fixture shapes
  * (2012/2014 × 990/990EZ/990PF spanning the 2013 schema break, plus a
  * 2013 middle-era doc — BUILD_SCRIPTS/README.md:39-50) with Schedule
  * N/J repeating groups on both sides of the break.
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDir: String =
    getClass.getResource("/xml").getPath

  private lazy val parsed: DataFrame =
    Ingest.readReturns(spark, fixtureDir).cache()

  private lazy val core: Map[String, Map[String, Any]] = {
    val df = Core.build(parsed)
    df.collect().map { r =>
      r.getAs[String]("EIN") -> df.columns.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
    }.toMap
  }

  test("parses all seven fixture documents with no corrupt records") {
    assert(parsed.count() == 7)
    assert(Ingest.failed(parsed).count() == 0)
  }

  test("header extraction: EIN, era-coalesced NAME, FORMTYPE, OBJECT_ID") {
    assert(core.keySet == Set("100000001", "100000002", "100000003",
      "100000004", "100000005", "100000006", "100000007"))
    assert(core("100000001")("NAME") == "ALPHA ARTS FOUNDATION")  // post-2013 spelling
    assert(core("100000002")("NAME") == "BETA HEALTH TRUST")      // pre-2013 spelling
    assert(core("100000001")("FORMTYPE") == "990")
    assert(core("100000003")("FORMTYPE") == "990EZ")
    assert(core("100000001")("OBJECT_ID") == "990_2014_100000001")
  }

  test("R7 TAXYR: December fiscal year-end keeps the year, others shift back") {
    assert(core("100000001")("TAXYR") == "2014") // ends 2014-12
    assert(core("100000002")("TAXYR") == "2012") // ends 2013-06 → 2012
  }

  test("E2+R1 GROSSRECEIPTS: 4-way era/form coalesce with zeroALL") {
    assert(core("100000001")("GROSSRECEIPTS") == "500000")
    assert(core("100000002")("GROSSRECEIPTS") == "750000")
    assert(core("100000003")("GROSSRECEIPTS") == "95000")
    assert(core("100000004")("GROSSRECEIPTS") == "42000")
  }

  test("E5+R6 FORMORG checkbox collapse") {
    assert(core("100000001")("FORMORG") == "Corporation")
    assert(core("100000002")("FORMORG") == "Trust")
    assert(core("100000003")("FORMORG") == "Association")
    assert(core("100000004")("FORMORG") == "Corporation")
  }

  test("R6 ACCTMETHOD collapse across eras; both-checked pastes Accrual then Cash") {
    assert(core("100000001")("ACCTMETHOD") == "Accrual")
    assert(core("100000002")("ACCTMETHOD") == "Cash")
    assert(core("100000006")("ACCTMETHOD") == "AccrualCash") // reference paste order :671
  }

  test("E4 DOMICILE across era spellings; zero matches paste to \"\" like R") {
    assert(core("100000001")("DOMICILE") == "NY") // LegalDomicileStateCd
    assert(core("100000002")("DOMICILE") == "CA") // StateLegalDomicile
    // EZ filer has no DOMICILE xpath: R's paste(collapse) of nothing
    // is "" — not NA (R:528)
    assert(core("100000003")("DOMICILE") == "")
  }

  test("PROFFEES: PC zeroPC'd fee-group sum; EZ falls back to consolidated field; zeroALL") {
    assert(core("100000001")("PROFFEES") == 15000.0) // 12000 + 3000 (Grp/TotalAmt)
    assert(core("100000002")("PROFFEES") == 5000.0)  // pre-2013 …/Total
    assert(core("100000003")("PROFFEES") == 2500.0)  // EZ consolidated fallback
    assert(core("100000004")("PROFFEES") == 0.0)     // all missing → zeroALL
  }

  test("R3 sourceOrSum: EZ reads its field directly; PC sums zeroPC'd parts") {
    assert(core("100000003")("EXPEVENTS") == 4000.0)
    assert(core("100000004")("EXPEVENTS") == 1500.0)
    assert(core("100000001")("EXPEVENTS") == 0.0) // PC, no event fields → 0+0
  }

  test("R2 zeroPC: defaults only on 990, leaves EZ null") {
    assert(core("100000001")("VOTINGMEMBERS") == "9")
    assert(core("100000002")("VOTINGMEMBERS") == "7")  // pre-2013 NbrVotingMembersGoverningBody
    assert(core("100000003")("VOTINGMEMBERS") == null) // EZ — rule must not touch
  }

  test("typed view casts the stringly layer") {
    val t = Core.typedView(Core.build(parsed))
    val row = t.filter($"EIN" === "100000001").head()
    assert(row.getAs[Long]("GROSSRECEIPTS") == 500000L)
    assert(row.getAs[Int]("TAXYR") == 2014)
  }

  // ---- 1:M child table (Part VII) via metadata-driven explode --------
  private lazy val partViiConcordance: Seq[ConcordanceEntry] = {
    def e(variable: String, xpath: String) = ConcordanceEntry(
      variable, xpath, "text", "MANY", "PART-VII-01", "PC", Nil, None)
    Seq(
      e("DTK_NAME", "/Return/ReturnData/IRS990/Form990PartVIISectionAGrp/PersonNm"),
      e("DTK_NAME", "/Return/ReturnData/IRS990/Form990PartVIISectionA/NamePerson"),
      e("DTK_TITLE", "/Return/ReturnData/IRS990/Form990PartVIISectionAGrp/TitleTxt"),
      e("DTK_TITLE", "/Return/ReturnData/IRS990/Form990PartVIISectionA/Title"),
      e("DTK_AVG_HOURS", "/Return/ReturnData/IRS990/Form990PartVIISectionAGrp/AverageHoursPerWeekRt"),
      e("DTK_AVG_HOURS", "/Return/ReturnData/IRS990/Form990PartVIISectionA/AverageHoursPerWeek"),
      e("DTK_COMP_ORG", "/Return/ReturnData/IRS990/Form990PartVIISectionAGrp/ReportableCompFromOrgAmt"),
      e("DTK_COMP_ORG", "/Return/ReturnData/IRS990/Form990PartVIISectionA/ReportableCompFromOrganization"))
  }

  test("G1 groupPaths finds both era spellings of the repeating group") {
    val got = Concordance.groupPaths(partViiConcordance, "PART-VII-01").toSet
    assert(got == Set(
      Seq("ReturnData", "IRS990", "Form990PartVIISectionAGrp"),
      Seq("ReturnData", "IRS990", "Form990PartVIISectionA")))
  }

  test("G2-G5 oneToMany explodes both eras with parent keys replicated") {
    val child = TableBuild.oneToMany(parsed, partViiConcordance, "PART-VII-01")
    val rows = child.collect().map(r =>
      (r.getAs[String]("EIN"), r.getAs[String]("DTK_NAME"),
        r.getAs[String]("DTK_TITLE"), r.getAs[String]("DTK_COMP_ORG")))
    assert(rows.length == 4) // 2 members × 2 PC docs; EZ docs contribute none
    assert(rows.contains(("100000001", "JANE DOE", "PRESIDENT", "120000")))
    assert(rows.contains(("100000002", "JOHN SMITH", "TREASURER", "50000")))
    assert(rows.contains(("100000002", "MARY JONES", "SECRETARY", "0")))
    // parent keys replicated onto every child row (J2)
    val byEin = rows.groupBy(_._1)
    assert(byEin("100000001").length == 2 && byEin("100000002").length == 2)
  }

  test("P4 schedule presence flags") {
    val flags = TableBuild.schedulePresence(parsed, Seq("N"))
      .select("EIN", "SCHEDN").as[(String, Boolean)].collect().toMap
    assert(flags("100000001") === true)
    assert(flags("100000002") === false)
  }

  test("Sched N 1:M table from the liquidation repeating group") {
    def e(v: String, x: String) = ConcordanceEntry(v, x, "text", "MANY", "SCHED-N-01", "PC", Nil, None)
    val conc = Seq(
      e("LIQ_DESC", "/Return/ReturnData/IRS990ScheduleN/LiquidationOfAssetsDetail/AssetsDistriOrExpnssPaidDesc"),
      e("LIQ_DATE", "/Return/ReturnData/IRS990ScheduleN/LiquidationOfAssetsDetail/DistributionDt"),
      e("LIQ_FMV", "/Return/ReturnData/IRS990ScheduleN/LiquidationOfAssetsDetail/FairMarketValueOfAssetAmt"))
    val t = TableBuild.oneToMany(parsed, conc, "SCHED-N-01")
    val rows = t.collect().map(r => (r.getAs[String]("EIN"), r.getAs[String]("LIQ_DESC"), r.getAs[String]("LIQ_FMV")))
    assert(rows.toSet == Set(
      ("100000001", "CASH TO SUCCESSOR", "25000"),
      ("100000001", "EQUIPMENT DONATED", "8000")))
  }

  test("2013 middle-era NAME variant (BusinessName/BusinessNameLine1) coalesces") {
    assert(core("100000006")("NAME") == "ZETA COMMUNITY FUND")
    assert(core("100000006")("GROSSRECEIPTS") == "310000")
  }

  test("990PF doc: headers extract; non-PF fields are null, not errors") {
    assert(core("100000005")("NAME") == "EPSILON FAMILY FOUNDATION")
    assert(core("100000005")("FORMTYPE") == "990PF")
    assert(core("100000005")("TOTALREVCURRENT") == null)
    assert(core("100000005")("GROSSRECEIPTS") == "0") // zeroALL default
  }

  test("PF 1:M table: AccountingFeesSchedule across the 2013 break") {
    // real era divergence (MASTER_CONCORDANCE_V0): pre-2013 repeats
    // AccountingFees/Category|Amount, 2013+ AccountingFeesDetail/
    // CategoryTxt|Amt — distinct groups AND distinct leaves
    def e(v: String, x: String) = ConcordanceEntry(v, x, "text", "MANY", "AFS-01", "PF", Nil, None)
    val conc = Seq(
      e("ACCOFEESCATE", "/Return/ReturnData/AccountingFeesSchedule/AccountingFees/Category"),
      e("ACCOFEESCATE", "/Return/ReturnData/AccountingFeesSchedule/AccountingFeesDetail/CategoryTxt"),
      e("ACCOFEESAMOU", "/Return/ReturnData/AccountingFeesSchedule/AccountingFees/Amount"),
      e("ACCOFEESAMOU", "/Return/ReturnData/AccountingFeesSchedule/AccountingFeesDetail/Amt"),
      e("ACFEADNEINNC", "/Return/ReturnData/AccountingFeesSchedule/AccountingFees/AdjustedNetIncome"),
      e("ACFEADNEINNC", "/Return/ReturnData/AccountingFeesSchedule/AccountingFeesDetail/AdjustedNetIncomeAmt"))
    val t = TableBuild.oneToMany(parsed, conc, "AFS-01")
    val rows = t.collect().map(r =>
      (r.getAs[String]("EIN"), r.getAs[String]("ACCOFEESCATE"), r.getAs[String]("ACCOFEESAMOU")))
    assert(rows.toSet == Set(
      ("100000005", "AUDIT", "7500"),        // post-2013 PF doc
      ("100000005", "TAX PREP", "2500"),
      ("100000007", "BOOKKEEPING", "1200"))) // pre-2013 PF doc
  }

  test("Sched N table 03: supplemental info across both era groups (R:4010-4133)") {
    // reference roots //Form990ScheduleNPartIII|//SupplementalInformationDetail;
    // each era's leaves are SEPARATE reference variables (no coalesce)
    def e(v: String, x: String) = ConcordanceEntry(v, x, "text", "MANY", "SCHED-N-03", "PZ", Nil, None)
    val conc = Seq(
      e("SECNSUPPLEMENTALINFO", "/Return/ReturnData/IRS990ScheduleN/Form990ScheduleNPartIII/Explanation"),
      e("SECNIDENTIFIER", "/Return/ReturnData/IRS990ScheduleN/Form990ScheduleNPartIII/Identifier"),
      e("SECNRETURNREF", "/Return/ReturnData/IRS990ScheduleN/Form990ScheduleNPartIII/ReturnReference"),
      e("SECNLINEREFEXPLAIN", "/Return/ReturnData/IRS990ScheduleN/SupplementalInformationDetail/ExplanationTxt"),
      e("SECNLINEREF", "/Return/ReturnData/IRS990ScheduleN/SupplementalInformationDetail/FormAndLineReferenceDesc"))
    val t = TableBuild.oneToMany(parsed, conc, "SCHED-N-03")
    val rows = t.collect().map(r => (r.getAs[String]("EIN"),
      r.getAs[String]("SECNLINEREF"), r.getAs[String]("SECNLINEREFEXPLAIN"),
      r.getAs[String]("SECNIDENTIFIER"), r.getAs[String]("SECNSUPPLEMENTALINFO"))).toSet
    assert(rows == Set(
      ("100000001", "PART I LINE 2", "OFFICERS JOINED SUCCESSOR ORG", null, null),
      ("100000001", "PART II LINE 1", "REMAINING ASSETS TRANSFERRED", null, null),
      ("100000004", null, null, "SUPP-1", "WOUND DOWN AND GAVE EQUIPMENT TO PARTNER PANTRY")))
  }

  test("pre-2013 990PF doc: headers + era spellings") {
    assert(core("100000007")("NAME") == "ETA LEGACY TRUST")
    assert(core("100000007")("FORMTYPE") == "990PF")
    assert(core("100000007")("TAXYR") == "2012")
  }

  test("Sched N table 02: dispositions across both era groups AND era leaf names") {
    // reference roots //DispositionOfAssetsDetail|//DispositionTable
    // with per-era leaf spellings (R:3595-3640)
    def e(v: String, x: String) = ConcordanceEntry(v, x, "text", "MANY", "SCHED-N-02", "PZ", Nil, None)
    val conc = Seq(
      e("DISPASSETDESCRIP", "/Return/ReturnData/IRS990ScheduleN/DispositionOfAssetsDetail/AssetsDistriOrExpnssPaidDesc"),
      e("DISPASSETDESCRIP", "/Return/ReturnData/IRS990ScheduleN/DispositionTable/DescriptionOfAsset"),
      e("DISPASSETDATE", "/Return/ReturnData/IRS990ScheduleN/DispositionOfAssetsDetail/DistributionDt"),
      e("DISPASSETDATE", "/Return/ReturnData/IRS990ScheduleN/DispositionTable/DateOfDistribution"),
      e("DISPASSETFMV", "/Return/ReturnData/IRS990ScheduleN/DispositionOfAssetsDetail/FairMarketValueOfAssetAmt"),
      e("DISPASSETFMV", "/Return/ReturnData/IRS990ScheduleN/DispositionTable/FairMarketValue"))
    val t = TableBuild.oneToMany(parsed, conc, "SCHED-N-02")
    val rows = t.collect().map(r => (r.getAs[String]("EIN"),
      r.getAs[String]("DISPASSETDESCRIP"), r.getAs[String]("DISPASSETFMV"))).toSet
    assert(rows == Set(
      ("100000001", "VAN SOLD", "12000"),           // post-2013 era
      ("100000004", "KITCHEN EQUIPMENT", "3000"),   // pre-2013 era
      ("100000004", "DELIVERY BIKE", "400")))
  }

  test("E6 objectIdFromUrl strips prefix and suffix") {
    val got = Seq("https://s3.amazonaws.com/irs-form-990/201403169349300505_public.xml")
      .toDF("u").select(Extract.objectIdFromUrl($"u")).as[String].head()
    assert(got == "201403169349300505")
  }

  test("staged normalizedGroupArray path matches oneToMany on era-divergent tables") {
    // the FullBuild staging path (ONE canonical array per 1:M table,
    // exploded off the cache) must be row-identical to the reference
    // path (per-era explode + unionByName)
    import org.apache.spark.sql.functions.col
    def e(v: String, x: String, t: String) = ConcordanceEntry(v, x, "text", "MANY", t, "PZ", Nil, None)
    val conc = Seq(
      e("DISPASSETDESCRIP", "/Return/ReturnData/IRS990ScheduleN/DispositionOfAssetsDetail/AssetsDistriOrExpnssPaidDesc", "SCHED-N-02"),
      e("DISPASSETDESCRIP", "/Return/ReturnData/IRS990ScheduleN/DispositionTable/DescriptionOfAsset", "SCHED-N-02"),
      e("DISPASSETFMV", "/Return/ReturnData/IRS990ScheduleN/DispositionOfAssetsDetail/FairMarketValueOfAssetAmt", "SCHED-N-02"),
      e("DISPASSETFMV", "/Return/ReturnData/IRS990ScheduleN/DispositionTable/FairMarketValue", "SCHED-N-02"),
      e("ACCOFEESCATE", "/Return/ReturnData/AccountingFeesSchedule/AccountingFees/Category", "AFS-01"),
      e("ACCOFEESAMOU", "/Return/ReturnData/AccountingFeesSchedule/AccountingFees/Amount", "AFS-01"))
    for (t <- Seq("SCHED-N-02", "AFS-01")) {
      val canonical = TableBuild.canonicalVars(conc, t)
      val arr = TableBuild.normalizedGroupArray(parsed, conc, t)
      assert(arr.isDefined, s"$t group should resolve")
      val staged = parsed.select(TableBuild.headerCols(parsed) :+ arr.get.as("G"): _*)
      val viaStaged = TableBuild.childFromNormalized(staged, col("G"), canonical)
      val viaUnion = TableBuild.oneToMany(parsed, conc, t)
      assert(viaStaged.columns.toSeq == viaUnion.columns.toSeq)
      assert(viaStaged.collect().map(_.toSeq).toSet == viaUnion.collect().map(_.toSeq).toSet)
    }
  }

  test("index read: dedup + TaxYear derivation (S1/P3/R7)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-index").toFile
    val f = new java.io.File(dir, "index_2014.json")
    val json =
      """[{"EIN":"100000001","TaxPeriod":"201412","FormType":"990","URL":"https://x/201403169349300505_public.xml","OrganizationName":"ALPHA","ObjectId":"201403169349300505"},
        |{"EIN":"100000001","TaxPeriod":"201412","FormType":"990","URL":"https://x/201403169349300505_public.xml","OrganizationName":"ALPHA","ObjectId":"201403169349300505"},
        |{"EIN":"100000002","TaxPeriod":"201306","FormType":"990","URL":"https://x/2_public.xml","OrganizationName":"BETA","ObjectId":"2"}]""".stripMargin
    java.nio.file.Files.writeString(f.toPath, json)
    val idx = Ingest.readIndex(spark, f.getPath)
    assert(idx.count() == 2) // dup removed
    val byEin = idx.collect().map(r => r.getAs[String]("EIN") -> r.getAs[Int]("TaxYear")).toMap
    assert(byEin("100000001") == 2014)
    assert(byEin("100000002") == 2012)
  }
}
