package graft.engine

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Engine throughput benchmark vs BASELINE.md: the reference processes
  * ≈2–5 documents/second (433k docs in 1–2 days, single R process,
  * `BUILD_SCRIPTS/README.md:256-258`). This main generates N synthetic
  * returns (deterministic variations of the four fixture shapes, both
  * eras, both forms), then times the full build — parse → core +
  * Part VII child table → partitioned parquet — and prints docs/sec.
  *
  * Usage: runMain graft.engine.EngineBench [nDocs] [workDir]
  */
object EngineBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val work = if (args.length > 1) args(1) else "/tmp/graft_engine_bench"
    // key the corpus dir by (n, salt): genCorpus writes exactly n files,
    // so reusing one dir across different-sized runs would leave the
    // prior run's tail files in place and silently inflate the corpus
    // (observed: a 5k salted run after a 10k run parsed 10k docs)
    val saltEvery = sys.env.getOrElse("GRAFT_SALT_EVERY", "0").toInt
    val corpusDir = s"$work/corpus_${n}_s$saltEvery"
    val outDir = s"$work/out"

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.maxFields", "4000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Ingest.tuneSmallFileSplits(spark)

    // --- corpus generation (not timed): deterministic, bundled into
    // few large multi-doc files? No — the reference corpus is one XML
    // per return; we replicate that (small-files posture included).
    // GRAFT_SALT_EVERY=k malforms every k-th document (truncation) to
    // exercise the quarantine path at volume — the build must complete
    // and the FAIL_LIST row count must equal the salt count.
    val t0gen = System.nanoTime()
    val salted = genCorpus(corpusDir, n, saltEvery)
    val genSec = (System.nanoTime() - t0gen) / 1e9

    // --- the timed build: parse once -> core + DTK child table -> parquet
    val concordance = demoConcordance
    val t0 = System.nanoTime()
    val out = Pipeline.build(spark, corpusDir, concordance)
    Pipeline.writeAll(out, outDir)
    val nCore = spark.read.parquet(s"$outDir/core").count()
    val nChild = spark.read.parquet(s"$outDir/PART-VII-01").count()
    val buildSec = (System.nanoTime() - t0) / 1e9

    val docsPerSec = n / buildSec
    println(f"[engine-bench] docs=$n gen=${genSec}%.1fs build=${buildSec}%.1fs " +
      f"throughput=${docsPerSec}%.0f docs/s core_rows=$nCore child_rows=$nChild " +
      f"(reference: 2-5 docs/s single-process)")
    if (saltEvery > 0) {
      val quarantined = spark.read.parquet(s"$outDir/failed").count()
      println(s"[engine-bench] salted=$salted quarantined=$quarantined " +
        s"match=${salted.toLong == quarantined}")
    }
    spark.stop()
  }

  /** Writes the deterministic synthetic corpus (era/form mix as in the
    * timed bench). When `saltEvery` > 0, every saltEvery-th document is
    * malformed — truncated mid-element, so the row tag is found but the
    * parse fails and PERMISSIVE mode quarantines the document (the
    * reference's FAIL_LIST semantics,
    * `build_efile_database_functions.R:5096-5101`; a missing row tag
    * would instead drop the file silently). Returns the malformed count.
    */
  def genCorpus(corpusDir: String, n: Int, saltEvery: Int = 0): Int = {
    Files.createDirectories(Paths.get(corpusDir))
    var salted = 0
    (0 until n).foreach { i =>
      val ein = f"${100000000L + i}%09d"
      val era = i % 2 == 0          // post-2013 vs pre-2013
      val ez = i % 3 == 0           // form mix
      val gross = 1000L + (i * 37L) % 900000L
      val members = 1 + i % 4
      val whole = synthDoc(ein, era, ez, gross, members, i)
      val malform = saltEvery > 0 && i % saltEvery == saltEvery - 1
      val xml =
        if (malform) { salted += 1; whole.substring(0, whole.length * 3 / 5) }
        else whole
      Files.writeString(Paths.get(s"$corpusDir/${ein}_public.xml"), xml)
    }
    salted
  }

  def demoConcordance: Seq[ConcordanceEntry] = {
    def pv(v: String, x: String) = ConcordanceEntry(v, x, "text", "MANY", "PART-VII-01", "PC", Nil, None)
    Seq(
      pv("DTK_NAME", "/Return/ReturnData/IRS990/Form990PartVIISectionAGrp/PersonNm"),
      pv("DTK_NAME", "/Return/ReturnData/IRS990/Form990PartVIISectionA/NamePerson"),
      pv("DTK_TITLE", "/Return/ReturnData/IRS990/Form990PartVIISectionAGrp/TitleTxt"),
      pv("DTK_TITLE", "/Return/ReturnData/IRS990/Form990PartVIISectionA/Title"),
      pv("DTK_COMP_ORG", "/Return/ReturnData/IRS990/Form990PartVIISectionAGrp/ReportableCompFromOrgAmt"),
      pv("DTK_COMP_ORG", "/Return/ReturnData/IRS990/Form990PartVIISectionA/ReportableCompFromOrganization"))
  }

  def synthDoc(ein: String, post2013: Boolean, ez: Boolean,
               gross: Long, members: Int, seed: Int): String =
    synthDoc(ein, post2013, if (ez) "990EZ" else "990", gross, members, seed)

  /** Form-typed variant: "990" | "990EZ" | "990PF". PF docs carry an
    * IRS990PF core slice plus a repeating AccountingFeesSchedule
    * (master rows FORM=AFS), exercising the PF build path.
    */
  def synthDoc(ein: String, post2013: Boolean, form: String,
               gross: Long, members: Int, seed: Int): String = {
    val ez = form == "990EZ"
    val month = 1 + seed % 12
    val header =
      if (post2013)
        s"""<ReturnHeader><ReturnTypeCd>$form</ReturnTypeCd>
           |<TaxPeriodEndDt>2014-${f(month)}-28</TaxPeriodEndDt>
           |<Filer><EIN>$ein</EIN><BusinessName><BusinessNameLine1Txt>ORG $ein</BusinessNameLine1Txt></BusinessName></Filer>
           |</ReturnHeader>""".stripMargin
      else
        s"""<ReturnHeader><ReturnType>$form</ReturnType>
           |<TaxPeriodEndDate>2012-${f(month)}-28</TaxPeriodEndDate>
           |<Filer><EIN>$ein</EIN><Name><BusinessNameLine1>ORG $ein</BusinessNameLine1></Name></Filer>
           |</ReturnHeader>""".stripMargin
    val grTag = (post2013, ez) match {
      case (true, _)  => s"<GrossReceiptsAmt>$gross</GrossReceiptsAmt>"
      case (false, _) => s"<GrossReceipts>$gross</GrossReceipts>"
    }
    val body =
      if (form == "990PF") {
        // AFS era break (master): pre-2013 AccountingFees/Category|Amount,
        // 2013+ AccountingFeesDetail/CategoryTxt|Amt
        val fees = (0 until 1 + seed % 3).map { k =>
          if (post2013)
            s"""<AccountingFeesDetail><CategoryTxt>CAT$k</CategoryTxt><Amt>${500L * (k + 1)}</Amt>
               |<AdjustedNetIncomeAmt>${100L * k}</AdjustedNetIncomeAmt></AccountingFeesDetail>""".stripMargin
          else
            s"""<AccountingFees><Category>CAT$k</Category><Amount>${500L * (k + 1)}</Amount>
               |<AdjustedNetIncome>${100L * k}</AdjustedNetIncome></AccountingFees>""".stripMargin
        }.mkString("\n")
        s"""<IRS990PF><AddressChangeInd>X</AddressChangeInd>
           |<AnalysisIncomeProducingActy><DividendsAndIntFromSecPartVII>
           |<ExclusionAmount>${gross / 4}</ExclusionAmount>
           |</DividendsAndIntFromSecPartVII></AnalysisIncomeProducingActy></IRS990PF>
           |<AccountingFeesSchedule>$fees</AccountingFeesSchedule>""".stripMargin
      } else if (ez) {
        // pre-2013 EZ schema spells the field TotalRevenue (no Amt suffix)
        val rev = if (post2013) s"<TotalRevenueAmt>${gross / 2}</TotalRevenueAmt>"
                  else s"<TotalRevenue>${gross / 2}</TotalRevenue>"
        s"<IRS990EZ>$grTag$rev</IRS990EZ>"
      } else {
        val grp = (0 until members).map { m =>
          if (post2013)
            s"""<Form990PartVIISectionAGrp><PersonNm>P$m OF $ein</PersonNm><TitleTxt>T$m</TitleTxt>
               |<ReportableCompFromOrgAmt>${1000 * (m + 1)}</ReportableCompFromOrgAmt></Form990PartVIISectionAGrp>""".stripMargin
          else
            s"""<Form990PartVIISectionA><NamePerson>P$m OF $ein</NamePerson><Title>T$m</Title>
               |<ReportableCompFromOrganization>${1000 * (m + 1)}</ReportableCompFromOrganization></Form990PartVIISectionA>""".stripMargin
        }.mkString("\n")
        val rev = if (post2013) s"<CYTotalRevenueAmt>${gross / 2}</CYTotalRevenueAmt>"
                  else s"<TotalRevenueCurrentYear>${gross / 2}</TotalRevenueCurrentYear>"
        s"<IRS990>$grTag$rev\n$grp</IRS990>"
      }
    s"""<?xml version="1.0" encoding="utf-8"?>
       |<Return returnVersion="${if (post2013) "2014v5.0" else "2012v2.1"}" xmlns="http://www.irs.gov/efile">
       |$header
       |<ReturnData>$body</ReturnData>
       |</Return>""".stripMargin
  }

  private def f(m: Int): String = f"$m%02d"
}
