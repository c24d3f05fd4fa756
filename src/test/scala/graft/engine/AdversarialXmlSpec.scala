package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Era-faithful real-world XML quirks the clean generator grammar never
  * produces, run through the REAL Pipeline (sparse schema → PERMISSIVE
  * parse → extract → rules → Core238). The reference's own correctness
  * practice is smoke-running canonical real documents spanning the 2013
  * schema break (`BUILD_SCRIPTS/README.md:39,44-50`); the sandbox has
  * no network, so these reconstruct the quirk classes instead:
  *
  *  - namespace-PREFIXED elements (`<efile:Return>`) — pre-`xml_ns_strip`
  *    shape; without `ignoreNamespace=true` Spark finds no row tag and
  *    the document silently VANISHES (worse than quarantine)
  *  - UTF-8 BOM before the declaration
  *  - mixed content (stray text between child elements)
  *  - duplicate scalar nodes (the R fan-out quirk, SURVEY §7): policy
  *    is FIRST match + violation log, vs Spark's default last-match
  *  - comments + CDATA around and inside values
  *  - entity references, named + numeric
  *  - xsi:nil="true" / empty elements (<X/>): R8's length-0→NA is a
  *    NODE-SET test — an ABSENT path is NA, but a present-but-empty
  *    element is xml_text == "" in the reference
  *    (`build_efile_database_functions.R:560`), and checkbox recodes
  *    key on node PRESENCE (length of xml_find_all), so an empty
  *    checkbox element still counts as checked
  *  - truncated document → quarantine, never an abort
  */
class AdversarialXmlSpec extends SparkSpec {

  private def doc2014(ein: String, name: String, gross: Long): String =
    s"""<?xml version="1.0" encoding="utf-8"?>
       |<Return returnVersion="2014v5.0" xmlns="http://www.irs.gov/efile">
       |  <ReturnHeader>
       |    <ReturnTypeCd>990</ReturnTypeCd>
       |    <TaxPeriodEndDt>2014-12-31</TaxPeriodEndDt>
       |    <Filer><EIN>$ein</EIN>
       |      <BusinessName><BusinessNameLine1Txt>$name</BusinessNameLine1Txt></BusinessName>
       |    </Filer>
       |  </ReturnHeader>
       |  <ReturnData><IRS990><GrossReceiptsAmt>$gross</GrossReceiptsAmt></IRS990></ReturnData>
       |</Return>""".stripMargin

  test("quirk corpus: every malformation parses, extracts first-match, or quarantines") {
    val dir = java.nio.file.Files.createTempDirectory("graft-adversarial").toFile
    def put(n: String, body: String): Unit =
      java.nio.file.Files.write(new java.io.File(dir, n).toPath, body.getBytes("UTF-8"))

    // 1. namespace-prefixed, post-2013 era
    put("prefixed_public.xml",
      """<?xml version="1.0"?>
        |<efile:Return xmlns:efile="http://www.irs.gov/efile" returnVersion="2014v5.0">
        |  <efile:ReturnHeader>
        |    <efile:ReturnTypeCd>990</efile:ReturnTypeCd>
        |    <efile:TaxPeriodEndDt>2014-12-31</efile:TaxPeriodEndDt>
        |    <efile:Filer><efile:EIN>400000001</efile:EIN>
        |      <efile:BusinessName><efile:BusinessNameLine1Txt>PREFIXED ORG</efile:BusinessNameLine1Txt></efile:BusinessName>
        |    </efile:Filer>
        |  </efile:ReturnHeader>
        |  <efile:ReturnData><efile:IRS990><efile:GrossReceiptsAmt>111</efile:GrossReceiptsAmt></efile:IRS990></efile:ReturnData>
        |</efile:Return>""".stripMargin)
    // 2. BOM + PRE-2013 era spellings (the other side of the break)
    java.nio.file.Files.write(new java.io.File(dir, "bom_public.xml").toPath,
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        """<?xml version="1.0"?>
          |<Return returnVersion="2012v2.1" xmlns="http://www.irs.gov/efile">
          |  <ReturnHeader>
          |    <ReturnType>990</ReturnType>
          |    <TaxPeriodEndDate>2012-12-31</TaxPeriodEndDate>
          |    <Filer><EIN>400000002</EIN>
          |      <Name><BusinessNameLine1>BOM ORG</BusinessNameLine1></Name>
          |    </Filer>
          |  </ReturnHeader>
          |  <ReturnData><IRS990><GrossReceipts>222</GrossReceipts></IRS990></ReturnData>
          |</Return>""".stripMargin.getBytes("UTF-8"))
    // 3. mixed content: stray text around the children
    put("mixed_public.xml",
      """<?xml version="1.0"?>
        |<Return returnVersion="2014v5.0" xmlns="http://www.irs.gov/efile">
        |  <ReturnHeader>filed on paper first
        |    <ReturnTypeCd>990</ReturnTypeCd>
        |    <TaxPeriodEndDt>2014-12-31</TaxPeriodEndDt>
        |    <Filer><EIN>400000003</EIN>
        |      <BusinessName><BusinessNameLine1Txt>MIXED ORG</BusinessNameLine1Txt></BusinessName>
        |    </Filer>
        |  </ReturnHeader>
        |  <ReturnData><IRS990>see attachment<GrossReceiptsAmt>333</GrossReceiptsAmt></IRS990></ReturnData>
        |</Return>""".stripMargin)
    // 4. duplicate scalar EIN (R fan-out quirk): first match must win
    put("dupein_public.xml",
      """<?xml version="1.0"?>
        |<Return returnVersion="2014v5.0" xmlns="http://www.irs.gov/efile">
        |  <ReturnHeader>
        |    <ReturnTypeCd>990</ReturnTypeCd>
        |    <TaxPeriodEndDt>2014-12-31</TaxPeriodEndDt>
        |    <Filer><EIN>400000004</EIN><EIN>999999999</EIN>
        |      <BusinessName><BusinessNameLine1Txt>DUP ORG</BusinessNameLine1Txt></BusinessName>
        |    </Filer>
        |  </ReturnHeader>
        |  <ReturnData><IRS990><GrossReceiptsAmt>444</GrossReceiptsAmt></IRS990></ReturnData>
        |</Return>""".stripMargin)
    // 5. comments and CDATA
    put("cdata_public.xml",
      """<?xml version="1.0"?>
        |<!-- transmission wrapper comment -->
        |<Return returnVersion="2014v5.0" xmlns="http://www.irs.gov/efile">
        |  <ReturnHeader>
        |    <ReturnTypeCd>990</ReturnTypeCd>
        |    <TaxPeriodEndDt>2014-12-31</TaxPeriodEndDt>
        |    <Filer><EIN>400000005</EIN>
        |      <BusinessName><BusinessNameLine1Txt><![CDATA[CDATA & SONS]]></BusinessNameLine1Txt></BusinessName>
        |    </Filer>
        |  </ReturnHeader>
        |  <!-- data follows -->
        |  <ReturnData><IRS990><GrossReceiptsAmt>555</GrossReceiptsAmt></IRS990></ReturnData>
        |</Return>""".stripMargin)
    // 6. truncated → quarantine
    put("truncated_public.xml",
      "<?xml version=\"1.0\"?><Return><ReturnHeader><Filer><EIN>400000006")
    put("clean_public.xml", doc2014("400000007", "CLEAN ORG", 777))
    // 7. entity references: named (&amp; &lt; &apos;) and numeric
    // (&#201; = É) — the "SMITH &amp; JONES" class real filings hit
    put("entities_public.xml",
      """<?xml version="1.0"?>
        |<Return returnVersion="2014v5.0" xmlns="http://www.irs.gov/efile">
        |  <ReturnHeader>
        |    <ReturnTypeCd>990</ReturnTypeCd>
        |    <TaxPeriodEndDt>2014-12-31</TaxPeriodEndDt>
        |    <Filer><EIN>400000008</EIN>
        |      <BusinessName><BusinessNameLine1Txt>SMITH &amp; JONES &#201;COLE &lt;O&apos;BRIEN&gt;</BusinessNameLine1Txt></BusinessName>
        |    </Filer>
        |  </ReturnHeader>
        |  <ReturnData><IRS990><GrossReceiptsAmt>888</GrossReceiptsAmt></IRS990></ReturnData>
        |</Return>""".stripMargin)

    // 8. nil / empty elements: the element EXISTS but carries no text.
    // Reference semantics (NOT the same as R8's absent-path→NA):
    // xml_text of a present-but-empty node is "", and checkbox recodes
    // test node-set length, so an empty checkbox element is CHECKED.
    // The doc must parse clean — never quarantine.
    put("nil_public.xml",
      """<?xml version="1.0"?>
        |<Return returnVersion="2014v5.0" xmlns="http://www.irs.gov/efile"
        |        xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance">
        |  <ReturnHeader>
        |    <ReturnTypeCd>990</ReturnTypeCd>
        |    <TaxPeriodEndDt>2014-12-31</TaxPeriodEndDt>
        |    <Filer><EIN>400000009</EIN>
        |      <BusinessName><BusinessNameLine1Txt/></BusinessName>
        |    </Filer>
        |  </ReturnHeader>
        |  <ReturnData><IRS990>
        |    <GrossReceiptsAmt xsi:nil="true"/>
        |    <TypeOfOrganizationCorpInd/>
        |  </IRS990></ReturnData>
        |</Return>""".stripMargin)

    // 9. attribute-carrying scalar (real filings attach
    // referenceDocumentId to amount elements) — the value must still
    // extract; the attribute is metadata, not the payload
    put("attr_public.xml",
      """<?xml version="1.0"?>
        |<Return returnVersion="2014v5.0" xmlns="http://www.irs.gov/efile">
        |  <ReturnHeader>
        |    <ReturnTypeCd>990</ReturnTypeCd>
        |    <TaxPeriodEndDt>2014-12-31</TaxPeriodEndDt>
        |    <Filer><EIN>400000010</EIN>
        |      <BusinessName><BusinessNameLine1Txt>ATTR ORG</BusinessNameLine1Txt></BusinessName>
        |    </Filer>
        |  </ReturnHeader>
        |  <ReturnData><IRS990>
        |    <GrossReceiptsAmt referenceDocumentId="RD-001">1010</GrossReceiptsAmt>
        |  </IRS990></ReturnData>
        |</Return>""".stripMargin)

    val out = Pipeline.build(spark, dir.getPath, concordance = Nil)
    val core = out.core.collect().map(r =>
      r.getAs[String]("EIN") -> r).toMap

    // every quirk doc except the truncation lands in core
    assert(core.keySet == Set("400000001", "400000002", "400000003",
      "400000004", "400000005", "400000007", "400000008", "400000009",
      "400000010"), core.keySet)
    assert(out.failed.collect().map(_.getString(0)).exists(_.contains("truncated")))

    // prefixed + BOM + mixed + cdata extract their payloads
    assert(core("400000001").getAs[String]("GROSSRECEIPTS") == "111")
    assert(core("400000001").getAs[String]("NAME") == "PREFIXED ORG")
    assert(core("400000002").getAs[String]("GROSSRECEIPTS") == "222")
    assert(core("400000002").getAs[String]("NAME") == "BOM ORG")
    assert(core("400000003").getAs[String]("GROSSRECEIPTS") == "333")
    assert(core("400000005").getAs[String]("NAME") == "CDATA & SONS")
    assert(core("400000008").getAs[String]("NAME") == "SMITH & JONES ÉCOLE <O'BRIEN>")
    assert(core("400000008").getAs[String]("GROSSRECEIPTS") == "888")

    // present-but-empty ≠ absent: value fields come out "" (reference
    // xml_text semantics), NOT null — null is reserved for absent
    // paths (R8). xsi:nil parses identically under the sparse schema.
    assert(core("400000009").getAs[String]("GROSSRECEIPTS") == "",
      s"xsi:nil value must be '' (present-but-empty), got ${core("400000009").getAs[String]("GROSSRECEIPTS")}")
    assert(core("400000009").getAs[String]("NAME") == "",
      s"empty-element value must be '' (present-but-empty), got ${core("400000009").getAs[String]("NAME")}")
    // checkbox recode keys on node PRESENCE (R: length(xml_find_all)),
    // so the empty checkbox element still labels
    assert(core("400000009").getAs[String]("FORMORG") == "Corporation",
      s"empty checkbox element must count as checked, got ${core("400000009").getAs[String]("FORMORG")}")
    // contrast: a doc WITHOUT the element at all stays null (R8)
    assert(core("400000001").getAs[String]("FORMORG") == null)

    // attribute-carrying scalar: payload extracts, attribute ignored
    assert(core("400000010").getAs[String]("GROSSRECEIPTS") == "1010",
      s"attributed amount must extract its text payload, got ${core("400000010").getAs[String]("GROSSRECEIPTS")}")

    // duplicate-scalar policy: FIRST match (document order), not
    // Spark's default last-match — and the violation is logged
    assert(core.contains("400000004"), "first EIN must key the row")
    val viol = Ingest.duplicateScalars(
      Pipeline.parse(spark, dir.getPath, Nil).cache()).collect()
    assert(viol.length == 1, viol.mkString("; "))
    assert(viol.head.getAs[String]("xpath").endsWith("Filer/EIN"))
    assert(viol.head.getAs[Int]("n_matches") == 2)
    assert(viol.head.getAs[String]("first_match") == "400000004")
    assert(viol.head.getAs[String]("source_url").contains("dupein"))

    // the full curated core builds over the quirk corpus too
    val c238 = out.core238
    assert(c238.count() == 9)
    assert(c238.columns.contains("GROSSRECEIPTS"))
  }

  test("DOCTYPE documents quarantine — DTD disallowed, external entities never resolved") {
    // XXE-shaped input: a DOCTYPE with an internal entity plus an
    // external SYSTEM entity. The parser's secure default refuses ANY
    // DTD (even internal-only), so both documents land in quarantine
    // — the engine must never resolve the external reference, never
    // abort the build, and never leak a partially-parsed row into
    // core. (Real e-file returns carry no DTDs; quarantine is the
    // correct fate, same as truncation.)
    val dir = java.nio.file.Files.createTempDirectory("graft-doctype").toFile
    def put(n: String, body: String): Unit =
      java.nio.file.Files.write(new java.io.File(dir, n).toPath, body.getBytes("UTF-8"))
    put("doctype_xxe_public.xml",
      """<?xml version="1.0"?>
        |<!DOCTYPE Return [<!ENTITY co "COMPANY"> <!ENTITY xxe SYSTEM "file:///etc/hostname">]>
        |<Return returnVersion="2014v5.0" xmlns="http://www.irs.gov/efile">
        |  <ReturnHeader>
        |    <ReturnTypeCd>990</ReturnTypeCd>
        |    <TaxPeriodEndDt>2014-12-31</TaxPeriodEndDt>
        |    <Filer><EIN>500000001</EIN>
        |      <BusinessName><BusinessNameLine1Txt>ACME &co; &xxe;</BusinessNameLine1Txt></BusinessName>
        |    </Filer>
        |  </ReturnHeader>
        |  <ReturnData><IRS990><GrossReceiptsAmt>123</GrossReceiptsAmt></IRS990></ReturnData>
        |</Return>""".stripMargin)
    put("doctype_internal_public.xml",
      """<?xml version="1.0"?>
        |<!DOCTYPE Return [<!ENTITY co "COMPANY">]>
        |<Return returnVersion="2014v5.0" xmlns="http://www.irs.gov/efile">
        |  <ReturnHeader>
        |    <ReturnTypeCd>990</ReturnTypeCd>
        |    <TaxPeriodEndDt>2014-12-31</TaxPeriodEndDt>
        |    <Filer><EIN>500000002</EIN>
        |      <BusinessName><BusinessNameLine1Txt>ACME &co;</BusinessNameLine1Txt></BusinessName>
        |    </Filer>
        |  </ReturnHeader>
        |  <ReturnData><IRS990><GrossReceiptsAmt>456</GrossReceiptsAmt></IRS990></ReturnData>
        |</Return>""".stripMargin)
    put("clean_public.xml", doc2014("500000003", "CLEAN ORG", 999))

    val out = Pipeline.build(spark, dir.getPath, concordance = Nil)
    val coreEins = out.core.collect().map(_.getAs[String]("EIN")).toSet
    assert(coreEins == Set("500000003"),
      s"DOCTYPE docs must not reach core: $coreEins")
    val failed = out.failed.collect().map(_.getString(0))
    assert(failed.count(_.contains("doctype")) == 2,
      s"both DOCTYPE docs must quarantine by name: ${failed.mkString(";")}")
  }

  test("pre/post-2013 suffix variants coalesce to the same columns in one corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-era").toFile
    java.nio.file.Files.write(new java.io.File(dir, "new_public.xml").toPath,
      doc2014("500000001", "NEW ERA", 1000).getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(dir, "old_public.xml").toPath,
      """<?xml version="1.0"?>
        |<Return returnVersion="2012v2.1" xmlns="http://www.irs.gov/efile">
        |  <ReturnHeader>
        |    <ReturnType>990</ReturnType>
        |    <TaxPeriodEndDate>2012-06-30</TaxPeriodEndDate>
        |    <Filer><EIN>500000002</EIN><Name><BusinessNameLine1>OLD ERA</BusinessNameLine1></Name></Filer>
        |  </ReturnHeader>
        |  <ReturnData><IRS990><GrossReceipts>2000</GrossReceipts></IRS990></ReturnData>
        |</Return>""".stripMargin.getBytes("UTF-8"))
    val out = Pipeline.build(spark, dir.getPath, Nil)
    val rows = out.core.collect().map(r => r.getAs[String]("EIN") ->
      (r.getAs[String]("GROSSRECEIPTS"), r.getAs[String]("TAXYR"))).toMap
    assert(rows("500000001") == (("1000", "2014")))
    // June fiscal-year end → tax year is the PRIOR year (R7 rule)
    assert(rows("500000002") == (("2000", "2011")))
  }
}
