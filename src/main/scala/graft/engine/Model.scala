package graft.engine

/** Data model for the 990-efiler engine (SURVEY.md §1).
  *
  * Reference realizations: index data.frame
  * (`build_efile_database_functions.R:54-89`, dictionary
  * `Build-Efiler-Index.md:7-21`) and concordance crosswalk rows
  * (`MASTER_CONCORDANCE_V0.csv`, `BUILD_SCRIPTS/ConcordancePartVII.csv`).
  */

/** One filing in the yearly index (one row per return on S3). */
final case class IndexEntry(
    EIN: String,
    TaxPeriod: String,        // YYYYMM
    DLN: String,
    FormType: String,         // 990 | 990EZ | 990PF
    URL: String,
    OrganizationName: String,
    SubmittedOn: String,
    ObjectId: String,
    LastUpdated: String,
    TaxYear: Int)             // derived (R7 December rule)

/** One row of the master concordance: an era-specific xpath spelling of
  * a canonical variable.
  *
  * `xpath` is absolute from the document root (`/Return/...`);
  * `versions` lists the XSD versions where this spelling is valid
  * (era-exclusive across rows of the same variable — the basis for
  * version coalescing, SURVEY §2.3 E2).
  */
final case class ConcordanceEntry(
    variable: String,          // canonical VARIABLE_NAME (upper-cased)
    xpath: String,
    dataType: String,          // text | numeric | boolean
    cardinality: String,       // ONE | MANY
    rdbTable: String,          // target output table
    scope: String,             // PC | EZ | PZ | PF
    versions: Seq[String],
    productionRule: Option[String]) {

  /** Path segments below the row tag (`Return`), attributes marked. */
  def segments: Seq[String] =
    xpath.stripPrefix("/").stripPrefix("Return/").split("/").toSeq

  def isAttribute: Boolean = segments.lastOption.exists(_.startsWith("@"))
}
