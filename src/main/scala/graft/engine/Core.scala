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
  */
object Core {

  def build(df: DataFrame): DataFrame = {
    val ft = TableBuild.formType(df)

    def s(xpaths: String*): Column = Extract.scalar(df, xpaths)

    val grossReceipts = Rules.zeroAll(s(
      "/Return/ReturnData/IRS990/GrossReceiptsAmt",
      "/Return/ReturnData/IRS990/GrossReceipts",
      "/Return/ReturnData/IRS990EZ/GrossReceiptsAmt",
      "/Return/ReturnData/IRS990EZ/GrossReceipts"))

    val totRev = s(
      "/Return/ReturnData/IRS990/CYTotalRevenueAmt",
      "/Return/ReturnData/IRS990/TotalRevenueCurrentYear",
      "/Return/ReturnData/IRS990EZ/TotalRevenueAmt",
      "/Return/ReturnData/IRS990EZ/TotalRevenue")

    val totExp = s(
      "/Return/ReturnData/IRS990/CYTotalExpensesAmt",
      "/Return/ReturnData/IRS990/TotalExpensesCurrentYear",
      "/Return/ReturnData/IRS990EZ/TotalExpensesAmt",
      "/Return/ReturnData/IRS990EZ/TotalExpenses")

    // E5 checkbox recodes → R6 collapse (order matches reference :618-621)
    val orgCorp = Rules.checkboxLabel(s(
      "/Return/ReturnData/IRS990/OrganizationCorporationInd",
      "/Return/ReturnData/IRS990/OrganizationCorporation",
      "/Return/ReturnData/IRS990EZ/TypeOfOrganizationCorpInd",
      "/Return/ReturnData/IRS990EZ/TypeOfOrganizationCorporation"), "Corporation")
    val orgTrust = Rules.checkboxLabel(s(
      "/Return/ReturnData/IRS990/OrganizationTrustInd",
      "/Return/ReturnData/IRS990/OrganizationTrust",
      "/Return/ReturnData/IRS990EZ/TypeOfOrganizationTrustInd",
      "/Return/ReturnData/IRS990EZ/TypeOfOrganizationTrust"), "Trust")
    val orgAssoc = Rules.checkboxLabel(s(
      "/Return/ReturnData/IRS990/OrganizationAssociationInd",
      "/Return/ReturnData/IRS990/OrganizationAssociation",
      "/Return/ReturnData/IRS990EZ/TypeOfOrganizationAssocInd",
      "/Return/ReturnData/IRS990EZ/TypeOfOrganizationAssociation"), "Association")
    val formOrg = Rules.checkboxCollapse(Seq(orgAssoc, orgCorp, orgTrust))

    val acctCash = Rules.checkboxLabel(s(
      "/Return/ReturnData/IRS990/MethodOfAccountingCashInd",
      "/Return/ReturnData/IRS990/MethodOfAccountingCash",
      "/Return/ReturnData/IRS990EZ/MethodOfAccountingCashInd",
      "/Return/ReturnData/IRS990EZ/MethodOfAccountingCash"), "Cash")
    val acctAccrual = Rules.checkboxLabel(s(
      "/Return/ReturnData/IRS990/MethodOfAccountingAccrualInd",
      "/Return/ReturnData/IRS990/MethodOfAccountingAccrual",
      "/Return/ReturnData/IRS990EZ/MethodOfAccountingAccrualInd",
      "/Return/ReturnData/IRS990EZ/MethodOfAccountingAccrual"), "Accrual")
    val acctMethod = Rules.checkboxCollapse(Seq(acctCash, acctAccrual))

    // E4 multi-value collapse (DOMICILE :519-528)
    val domicile = Extract.multiValue(df, Seq(
      "/Return/ReturnData/IRS990/StateLegalDomicileCd",
      "/Return/ReturnData/IRS990/StateLegalDomicile"))

    // R4-style fee sum for PC (zeroPC semantics on parts)
    val profFees = Rules.naSum(Seq(
      s("/Return/ReturnData/IRS990/FeesForServicesManagementAmt",
        "/Return/ReturnData/IRS990/FeesForServicesManagement"),
      s("/Return/ReturnData/IRS990/FeesForServicesLegalAmt",
        "/Return/ReturnData/IRS990/FeesForServicesLegal"),
      s("/Return/ReturnData/IRS990/FeesForServicesAccountingAmt",
        "/Return/ReturnData/IRS990/FeesForServicesAccounting")))

    // R3 conditional source-or-sum (EZ direct field vs PC sum)
    val eventExp = Rules.sourceOrSum(ft,
      s("/Return/ReturnData/IRS990EZ/SpecialEventsDirectExpensesAmt",
        "/Return/ReturnData/IRS990EZ/SpecialEventsDirectExpenses"),
      Seq(
        s("/Return/ReturnData/IRS990/FundraisingDirectExpensesAmt",
          "/Return/ReturnData/IRS990/DirectExpenses"),
        s("/Return/ReturnData/IRS990/GamingDirectExpensesAmt",
          "/Return/ReturnData/IRS990/GamingDirectExpenses")))

    val votingMembers = Rules.zeroPC(s(
      "/Return/ReturnData/IRS990/VotingMembersGoverningBodyCnt",
      "/Return/ReturnData/IRS990/VotingMembersGoverningBody"), ft)

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
