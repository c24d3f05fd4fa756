package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The CORE table slice (SURVEY §7 minimum end-to-end slice): header
  * keys + representative fields from every extraction/rule family, all
  * as one projection over the shared parsed scan.
  *
  * Each column cites the reference site whose SEMANTICS it reproduces
  * (`build_efile_database_functions.R`): GROSSRECEIPTS `:484-490`
  * (4-variant coalesce + zeroALL), TOTREVCURRENT/TOTEXPCURRENT PC+EZ
  * unions, FORMORG checkbox collapse `:553-621`, ACCTMETHOD `:630-671`,
  * DOMICILE multi-value `:519-528`, PROFEESINDEP-style fee sum
  * `:1290-1305`, VOTINGMEMBERS `:1654-1668`.
  *
  * Every xpath the builder touches is declared in [[P]], so
  * `declaredPaths` can feed [[SchemaBuild.sparseSchema]] — the scan
  * then parses exactly these subtrees and nothing else.
  */
object Core {

  /** Path constants (era variants in coalesce order). */
  object P {
    val grossReceipts = Seq(
      "/Return/ReturnData/IRS990/GrossReceiptsAmt",
      "/Return/ReturnData/IRS990/GrossReceipts",
      "/Return/ReturnData/IRS990EZ/GrossReceiptsAmt",
      "/Return/ReturnData/IRS990EZ/GrossReceipts")
    val totRev = Seq(
      "/Return/ReturnData/IRS990/CYTotalRevenueAmt",
      "/Return/ReturnData/IRS990/TotalRevenueCurrentYear",
      "/Return/ReturnData/IRS990EZ/TotalRevenueAmt",
      "/Return/ReturnData/IRS990EZ/TotalRevenue")
    val totExp = Seq(
      "/Return/ReturnData/IRS990/CYTotalExpensesAmt",
      "/Return/ReturnData/IRS990/TotalExpensesCurrentYear",
      "/Return/ReturnData/IRS990EZ/TotalExpensesAmt",
      "/Return/ReturnData/IRS990EZ/TotalExpenses")
    // Reference spellings `:553-598`: PC and EZ share TypeOfOrganization*.
    val orgCorp = Seq(
      "/Return/ReturnData/IRS990/TypeOfOrganizationCorpInd",
      "/Return/ReturnData/IRS990/TypeOfOrganizationCorporation",
      "/Return/ReturnData/IRS990EZ/TypeOfOrganizationCorpInd",
      "/Return/ReturnData/IRS990EZ/TypeOfOrganizationCorporation")
    val orgTrust = Seq(
      "/Return/ReturnData/IRS990/TypeOfOrganizationTrustInd",
      "/Return/ReturnData/IRS990/TypeOfOrganizationTrust",
      "/Return/ReturnData/IRS990EZ/TypeOfOrganizationTrustInd",
      "/Return/ReturnData/IRS990EZ/TypeOfOrganizationTrust")
    val orgAssoc = Seq(
      "/Return/ReturnData/IRS990/TypeOfOrganizationAssocInd",
      "/Return/ReturnData/IRS990/TypeOfOrganizationAssociation",
      "/Return/ReturnData/IRS990EZ/TypeOfOrganizationAssocInd",
      "/Return/ReturnData/IRS990EZ/TypeOfOrganizationAssociation")
    val acctCash = Seq(
      "/Return/ReturnData/IRS990/MethodOfAccountingCashInd",
      "/Return/ReturnData/IRS990/MethodOfAccountingCash",
      "/Return/ReturnData/IRS990EZ/MethodOfAccountingCashInd",
      "/Return/ReturnData/IRS990EZ/MethodOfAccountingCash")
    val acctAccrual = Seq(
      "/Return/ReturnData/IRS990/MethodOfAccountingAccrualInd",
      "/Return/ReturnData/IRS990/MethodOfAccountingAccrual",
      "/Return/ReturnData/IRS990EZ/MethodOfAccountingAccrualInd",
      "/Return/ReturnData/IRS990EZ/MethodOfAccountingAccrual")
    val domicile = Seq( // `:524-525`
      "/Return/ReturnData/IRS990/LegalDomicileStateCd",
      "/Return/ReturnData/IRS990/StateLegalDomicile")
    // Fees are nested group totals on PC (`:1215-1216` ff.)
    val feesMgmt = Seq(
      "/Return/ReturnData/IRS990/FeesForServicesManagementGrp/TotalAmt",
      "/Return/ReturnData/IRS990/FeesForServicesManagement/Total")
    val feesLegal = Seq(
      "/Return/ReturnData/IRS990/FeesForServicesLegalGrp/TotalAmt",
      "/Return/ReturnData/IRS990/FeesForServicesLegal/Total")
    val feesAcct = Seq(
      "/Return/ReturnData/IRS990/FeesForServicesAccountingGrp/TotalAmt",
      "/Return/ReturnData/IRS990/FeesForServicesAccounting/Total")
    // EZ consolidated contractor fees — PROFEESINDEP all-NA fallback `:1293-1303`
    val ezProfFees = Seq(
      "/Return/ReturnData/IRS990EZ/FeesAndOtherPymtToIndCntrctAmt",
      "/Return/ReturnData/IRS990EZ/FeesAndOthPymtToIndContractors")
    val ezEventExp = Seq(
      "/Return/ReturnData/IRS990EZ/SpecialEventsDirectExpensesAmt",
      "/Return/ReturnData/IRS990EZ/SpecialEventsDirectExpenses")
    val pcFundraisingExp = Seq( // `:1023-1024`
      "/Return/ReturnData/IRS990/FundraisingDirectExpensesAmt",
      "/Return/ReturnData/IRS990/FundraisingDirectExpenses")
    val pcGamingExp = Seq(
      "/Return/ReturnData/IRS990/GamingDirectExpensesAmt",
      "/Return/ReturnData/IRS990/GamingDirectExpenses")
    val votingMembers = Seq( // `:776-777`
      "/Return/ReturnData/IRS990/VotingMembersGoverningBodyCnt",
      "/Return/ReturnData/IRS990/NbrVotingMembersGoverningBody")

    val all: Seq[String] =
      grossReceipts ++ totRev ++ totExp ++ orgCorp ++ orgTrust ++ orgAssoc ++
        acctCash ++ acctAccrual ++ domicile ++ feesMgmt ++ feesLegal ++
        feesAcct ++ ezProfFees ++ ezEventExp ++ pcFundraisingExp ++
        pcGamingExp ++ votingMembers
  }

  /** Every xpath this builder reads — input for sparse-schema synthesis. */
  def declaredPaths: Seq[String] = P.all

  def build(df: DataFrame): DataFrame = {
    val ft = TableBuild.formType(df)
    def s(xpaths: Seq[String]): Column = Extract.scalar(df, xpaths)

    val grossReceipts = Rules.zeroAll(s(P.grossReceipts))
    val totRev = s(P.totRev)
    val totExp = s(P.totExp)

    // E5 checkbox recodes → R6 collapse (order matches reference :618-621)
    val formOrg = Rules.checkboxCollapse(Seq(
      Rules.checkboxLabel(s(P.orgAssoc), "Association"),
      Rules.checkboxLabel(s(P.orgCorp), "Corporation"),
      Rules.checkboxLabel(s(P.orgTrust), "Trust")))

    // Reference pastes ACCTACCRUAL then ACCTCASH (`:671`) — both-checked
    // docs must collapse to "AccrualCash", not "CashAccrual".
    val acctMethod = Rules.checkboxCollapse(Seq(
      Rules.checkboxLabel(s(P.acctAccrual), "Accrual"),
      Rules.checkboxLabel(s(P.acctCash), "Cash")))

    // E4 multi-value collapse (DOMICILE :519-528)
    val domicile = Extract.multiValue(df, P.domicile)

    // PROFEESINDEP `:1290-1305`: PC fee parts are zeroPC'd then NA-skip
    // summed; when ALL parts are NA (EZ docs — zeroPC leaves them null)
    // fall back to the EZ consolidated field; zeroALL the result.
    val profFees = coalesce(
      Rules.naSum(Seq(P.feesMgmt, P.feesLegal, P.feesAcct)
        .map(p => Rules.zeroPC(s(p), ft))),
      s(P.ezProfFees).cast("double"),
      lit(0.0))

    // R3 conditional source-or-sum (EZ direct field vs PC sum); the PC
    // parts are zeroPC'd and the result zeroALL'd per EXPGAMINGFNDEVENTS
    // `:1014-1044`.
    val eventExp = coalesce(
      Rules.sourceOrSum(ft, s(P.ezEventExp),
        Seq(P.pcFundraisingExp, P.pcGamingExp).map(p => Rules.zeroPC(s(p), ft))),
      lit(0.0))

    val votingMembers = Rules.zeroPC(s(P.votingMembers), ft)

    df.select(TableBuild.headerCols(df) ++ Seq(
      grossReceipts.as("GROSSRECEIPTS"),
      totRev.as("TOTALREVCURRENT"),
      totExp.as("TOTALEXPCURRENT"),
      formOrg.as("FORMORG"),
      acctMethod.as("ACCTMETHOD"),
      domicile.as("DOMICILE"),
      profFees.as("PROFFEES"),
      eventExp.as("EXPEVENTS"),
      votingMembers.as("VOTINGMEMBERS")): _*)
  }

  /** Typed analytic view over the stringly-typed parity layer
    * (SURVEY §1.2: keep strings at extraction, cast in a view).
    */
  def typedView(core: DataFrame): DataFrame =
    core.select(
      col("EIN"), col("NAME"), col("TAXYR").cast("int").as("TAXYR"),
      col("FORMTYPE"), col("OBJECT_ID"),
      col("GROSSRECEIPTS").cast("long").as("GROSSRECEIPTS"),
      col("TOTALREVCURRENT").cast("long").as("TOTALREVCURRENT"),
      col("TOTALEXPCURRENT").cast("long").as("TOTALEXPCURRENT"),
      col("FORMORG"), col("ACCTMETHOD"), col("DOMICILE"),
      col("PROFFEES").cast("double").as("PROFFEES"),
      col("EXPEVENTS").cast("double").as("EXPEVENTS"),
      col("VOTINGMEMBERS").cast("int").as("VOTINGMEMBERS"))
}
