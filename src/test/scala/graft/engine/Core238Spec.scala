package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** The curated CORE-238 parity table over the XML fixtures: layout,
  * per-variable rules, collapses, conditional sums, and the documented
  * reference quirks (build_efile_database_functions.R:2768-2850).
  */
class Core238Spec extends SparkSpec {

  private def fixtureDir: String = getClass.getResource("/xml").getPath

  private lazy val parsed: DataFrame =
    Ingest.readReturns(spark, fixtureDir).cache()

  private lazy val core: Map[String, Map[String, Any]] = {
    val df = Core238.build(parsed)
    val cols = df.columns
    df.collect().map { r =>
      r.getAs[String]("EIN") -> cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap
    }.toMap
  }

  test("layout: 237 distinct columns in reference namedList order") {
    val cols = Core238.build(parsed).columns
    assert(cols.length == 237)
    assert(cols.distinct.length == 237)
    assert(cols.take(13).toSeq == Seq("EIN", "NAME", "DBA", "FISYR", "STATE", "ADDRESS",
      "CITY", "ZIP", "STYEAR", "ENDYEAR", "TAXPREP", "FORMTYPE", "AMMENDED"))
    assert(cols.takeRight(2).toSeq == Seq("LOBNTFILING", "LOBNTAFFIL"))
  }

  test("header + basic info extract across eras") {
    assert(core("100000001")("NAME") == "ALPHA ARTS FOUNDATION")
    assert(core("100000002")("NAME") == "BETA HEALTH TRUST")
    assert(core("100000001")("GROSSRECEIPTS") == "500000")
    assert(core("100000005")("GROSSRECEIPTS") == "0") // PF: absent → zeroALL
    assert(core("100000001")("DOMICILE") == "NY")
    assert(core("100000002")("DOMICILE") == "CA")
    assert(core("100000003")("DOMICILE") == "") // EZ: PC-only field, paste(empty) = ""
  }

  test("checkbox collapses: FORMORG, ACCTMETHOD (paste order), EXEMPTSTATUS") {
    assert(core("100000001")("FORMORGCORP") == "Corporation")
    assert(core("100000001")("FORMORG") == "Corporation")
    assert(core("100000002")("FORMORG") == "Trust")
    assert(core("100000003")("FORMORG") == "Association")
    assert(core("100000006")("ACCTMETHOD") == "AccrualCash") // both boxes, Accrual first
    assert(core("100000001")("EXEMPT501C3") == "501c3")
    assert(core("100000001")("EXEMPTSTATUS") == "501c3")
    assert(core("100000002")("EXEMPTSTATUS") == null) // nothing checked
  }

  test("PUBLICSHARE keeps positional commas exactly like the reference paste") {
    assert(core("100000001")("PUBLICSHARE") == "Own Website,,Upon Request,")
    assert(core("100000002")("PUBLICSHARE") == null) // ",,," → NA
  }

  test("PROFEESINDEP conditional sum: PC sums zeroPC'd fees, EZ falls back, PF zeroALLs") {
    assert(core("100000001")("FEESMGMT") == "12000")
    assert(core("100000001")("FEESACCT") == "0") // missing on PC → zeroPC
    assert(core("100000001")("PROFEESINDEP") == "15000")
    assert(core("100000002")("PROFEESINDEP") == "5000") // pre-2013 …/Total
    assert(core("100000003")("PROFEESINDEP") == "2500") // EZ consolidated field
    assert(core("100000004")("PROFEESINDEP") == "0")    // EZ, field absent → zeroALL
    assert(core("100000005")("PROFEESINDEP") == "0")    // PF → zeroALL
    assert(core("100000005")("FEESMGMT") == null)       // zeroPC must not touch PF
  }

  test("EXPGAMINGFNDEVENTS / CASHINV conditional sums across forms") {
    assert(core("100000003")("EXPGAMINGFNDEVENTS") == "4000") // EZ direct
    assert(core("100000001")("EXPGAMINGFNDEVENTS") == "0")    // PC: 0 + 0
    assert(core("100000001")("CASHINVBEGYEAR") == "25000")    // 20000 + 5000
    assert(core("100000001")("CASHINVENDYEAR") == "33000")    // 26000 + 7000
    assert(core("100000003")("CASHINVBEGYEAR") == "0")        // EZ field absent → zeroALL
  }

  test("schedule presence flags") {
    assert(core("100000001")("SCHEDN") == true)
    assert(core("100000001")("SCHEDJ") == true)
    assert(core("100000001")("SCHEDA") == false)
    assert(core("100000004")("SCHEDN") == true)
    assert(core("100000005")("SCHEDN") == false)
  }

  test("reference quirk reproduced: MEMBERBENPRIOR reads the GRANTSPAID prior xpaths") {
    // R:1147 pastes V_990PGP* (grants) after defining V_990PBP* (benefits)
    assert(core("100000001")("GRANTSPAIDPRIOR") == "1111")
    assert(core("100000001")("MEMBERBENPRIOR") == "1111")
  }

  test("URL carries the source document url") {
    assert(core("100000001")("URL").asInstanceOf[String].endsWith("990_2014_100000001_public.xml"))
  }
}
